"""LLM-data-pipeline queries: dedup, similarity search, text analysis,
multimodal — over the `documents` and `embeddings` tables.

These are the beyond-the-reference operators the engine adds for
training-data pipelines at 100 TB (BASELINE.json north star). Each has
a DuckDB oracle where the computation is engine-agnostic; hash-based
candidate generation (LSH/SimHash) is oracle-checked through its
*verified* output where recall is provably ~1, rows-only otherwise.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from contacts_etl_phase21_spark.io import load, widen
from contacts_etl_phase21_spark.operators import dedup as dd
from contacts_etl_phase21_spark.operators import similarity_search as ann
from contacts_etl_phase21_spark.operators import text_analysis as ta
from contacts_etl_phase21_spark.operators.multimodal import (
    extract_features, resize_images, sample_frames, with_binary_payload,
)
from contacts_etl_phase21_spark.plans.registry import (
    cents_oracle, e6_oracle, query, scale_cents, scale_e6,
)

# Shared DuckDB fragments -----------------------------------------------------

_DUCK_SHINGLES = """
        toks AS (
            SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
        ),
        sh AS (
            SELECT doc_id,
                   list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                  for i in range(1, len(w) - 1)]) AS s
            FROM toks
        )
"""

_DUCK_JACCARD_PAIRS = f"""
        WITH {_DUCK_SHINGLES},
        pairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   ROUND(len(list_intersect(a.s, b.s)) * 1.0
                         / len(list_distinct(list_concat(a.s, b.s))), 6) AS jaccard
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        )
        SELECT doc_a, doc_b, jaccard FROM pairs WHERE jaccard >= 0.8
"""


@query(
    "dd_exact_fingerprint_groups",
    survey="LLM-dedup(exact)",
    doc="Exact duplicate groups by order-insensitive content fingerprint "
        "(md5 of sorted distinct token set) — hash-groupBy, one shuffle, "
        "catches token-reordered copies.",
    oracle="""
        WITH fp AS (
            SELECT doc_id,
                   md5(array_to_string(list_sort(list_distinct(
                       regexp_split_to_array(trim(lower(text)), '\\s+'))), ' ')) AS fingerprint
            FROM documents
        )
        SELECT fingerprint,
               COUNT(*) AS group_size,
               array_to_string(list_sort(list(doc_id)), '|') AS members
        FROM fp GROUP BY fingerprint HAVING COUNT(*) > 1
    """,
)
def dd_exact_fingerprint_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    groups = dd.exact_duplicates(
        docs, "doc_id", ta.content_fingerprint(F.col("text")))
    return groups.select(
        "fingerprint", "group_size",
        F.array_join(F.transform("members", lambda m: m.cast("string")), "|")
        .alias("members"))


@query(
    "dd_jaccard_near_dups",
    survey="LLM-dedup(ngram-jaccard)",
    doc="EXACT word-3-gram Jaccard ≥ 0.8 pairs via inverted-index "
        "self-join (explode shingles → equi-join → per-pair overlap). No "
        "cartesian product; the only shuffles are on shingle and pair key.",
    oracle=e6_oracle(_DUCK_JACCARD_PAIRS, "jaccard"),
)
def dd_jaccard_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return scale_e6(
        dd.jaccard_near_duplicates(docs, "doc_id", "text", n=3, threshold=0.8),
        "jaccard")


@query(
    "dd_minhash_lsh_verified",
    survey="LLM-dedup(minhash-lsh)",
    doc="MinHash(64)+LSH(16 bands) candidates verified with exact "
        "Jaccard ≥ 0.8 — the 100 TB dedup path. P(miss) ≈ (1-j⁴)¹⁶ "
        "< 1e-3 at j=0.8, so the verified output equals the exact pair "
        "set and shares its oracle; the all-corpus work is one equi-join "
        "on band buckets.",
    oracle=e6_oracle(_DUCK_JACCARD_PAIRS, "jaccard"),
)
def dd_minhash_lsh_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return scale_e6(
        dd.minhash_lsh_pairs(docs, "doc_id", "text",
                             n=3, num_hashes=64, bands=16, threshold=0.8),
        "jaccard")


# DuckDB twin of functions/similarity._hash64: md5(f"{seed}:{tok}") first
# 8 bytes little-endian → UBIGINT (byte-reversed hex substrings).
_DUCK_HASH64 = ("('0x'||" + "||".join(
    f"substr(m,{i},2)" for i in range(15, 0, -2)) + ")::UBIGINT")

_DUCK_SIMHASH_PAIRS = f"""
        WITH t AS (
            SELECT doc_id,
                   unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
            FROM documents
        ),
        h AS (
            SELECT doc_id, {_DUCK_HASH64} AS h64
            FROM (SELECT doc_id, md5('0:'||tok) AS m FROM t)
        ),
        bits AS (
            SELECT doc_id, b,
                   CASE WHEN SUM(CASE WHEN (h64 >> b) & 1 = 1
                                      THEN 1 ELSE -1 END) > 0
                        THEN 1::UBIGINT ELSE 0::UBIGINT END AS v
            FROM h CROSS JOIN (SELECT unnest(range(64)) AS b)
            GROUP BY doc_id, b
        ),
        fp AS (SELECT doc_id, bit_or(v << b) AS f FROM bits GROUP BY doc_id)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(bit_count(xor(a.f, b.f)) AS INT) AS hamming
        FROM fp a JOIN fp b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.f, b.f)) <= 3
"""


@query(
    "dd_simhash_near_dups",
    survey="LLM-dedup(simhash)",
    doc="SimHash-64 near-dup pairs (hamming ≤ 3) blocked by 16-bit "
        "chunks (pigeonhole guarantee: hamming ≤ 3 over 4 chunks ⇒ ≥1 "
        "chunk identical, so recall is exactly 1) — pandas-UDF "
        "fingerprint, chunk equi-join. The oracle recomputes the md5 "
        "SimHash bit-for-bit in SQL and takes the quadratic "
        "hamming ≤ 3 pair set.",
    oracle=_DUCK_SIMHASH_PAIRS,
)
def dd_simhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return dd.simhash_pairs(docs, "doc_id", "text", max_hamming=3)


@query(
    "dd_embedding_cosine_near_dups",
    survey="LLM-dedup(embedding-cosine)",
    doc="Embedding-cosine near-dup pairs (cosine >= 0.45): exact "
        "all-pairs via block-matrix self-join — chunk the corpus, join "
        "the chunk-level upper triangle, one vectorized numpy matmul "
        "per chunk pair (BLAS, not per-pair interpreted dots). At "
        "100 TB the LSH-bucketed tier generates candidates and this "
        "kernel verifies within buckets.",
    oracle=e6_oracle("""
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                            CAST(b.embedding AS DOUBLE[])),
                     6) AS cosine
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                     CAST(b.embedding AS DOUBLE[])) >= 0.45
        ORDER BY vec_a, vec_b
    """, "cosine"),
)
def dd_embedding_cosine_near_dups(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return scale_e6(
        dd.embedding_cosine_pairs(emb, "vec_id", "embedding",
                                  threshold=0.45, n_chunks=8)
        .orderBy("vec_a", "vec_b"),
        "cosine")


_SEMANTIC_CELL_ORACLE = e6_oracle("""
        WITH emb AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        cents AS (
            SELECT vec_id AS cell, v AS cv FROM emb ORDER BY vec_id LIMIT 8
        ),
        cassign AS (
            SELECT vec_id, v, cell FROM (
                SELECT e.vec_id, e.v, c.cell,
                       ROW_NUMBER() OVER (PARTITION BY e.vec_id
                           ORDER BY list_cosine_similarity(e.v, c.cv) DESC,
                                    c.cell ASC) AS cr
                FROM emb e CROSS JOIN cents c
            ) WHERE cr = 1
        )
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               ROUND(list_cosine_similarity(a.v, b.v), 6) AS cosine
        FROM cassign a JOIN cassign b
          ON a.cell = b.cell AND a.vec_id < b.vec_id
        WHERE ROUND(list_cosine_similarity(a.v, b.v), 6) >= 0.45
        ORDER BY vec_a, vec_b
    """, "cosine")


@query(
    "dd_semantic_near_dups",
    survey="LLM-dedup(semantic)",
    doc="SemDeDup-style semantic near-dup pairs (r06): coarse-cell "
        "candidate generation (row-local assignment over inlined "
        "first-8 centroids, self-equi-join on cell) + exact cosine "
        "verify at >= 0.45 — embedding-space dedup restricted to "
        "within-cluster pairs, the web-scale shape (Abbas et al. "
        "2023); Σ|cell|² bounds the pair work vs the all-pairs "
        "exact tier dd_embedding_cosine_near_dups. The first-n "
        "quantizer keeps assignment relational, so the oracle "
        "reproduces cells, candidates and verification in SQL; the "
        "within-cell recall vs the exact tier is test-measured.",
    oracle=_SEMANTIC_CELL_ORACLE,
)
def dd_semantic_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return scale_e6(
        dd.semantic_near_duplicates(emb, threshold=0.45, n_cells=8)
        .orderBy("vec_a", "vec_b"),
        "cosine")


@query(
    "dd_semantic_blas_tier",
    survey="LLM-dedup(semantic-blas)",
    doc="The PRODUCTION SemDeDup physical plan (r07, operators/dedup."
        "semantic_near_duplicates_blas) hash-checked against the SAME "
        "SQL the relational tier answers: broadcast-GEMM cell "
        "assignment + per-cell blocked-BLAS upper triangle via "
        "applyInPandas, run here on the oracle's first-n centroids "
        "(quantizer='first'). The relational row pins the semantics; "
        "this row pins that the 10⁶-vector plan (BASELINE r07 s1 "
        "probe: 12× cheaper than exact at 10⁵, Σ|cell|² bounded) "
        "computes the identical pair set.",
    oracle=_SEMANTIC_CELL_ORACLE,
)
def dd_semantic_blas_tier(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return scale_e6(
        dd.semantic_near_duplicates_blas(emb, threshold=0.45, n_cells=8,
                                         quantizer="first")
        .orderBy("vec_a", "vec_b"),
        "cosine")


@query(
    "dd_semdedup_prune",
    survey="LLM-dedup(semdedup-prune)",
    doc="Graph→decision consumer (r10): keep/drop decisions from the "
        "self-KNN graph — threshold the graph's edges at cosine >= "
        "0.45, connected components of the eps-graph (min-label "
        "propagation, the e5 machinery), keep the MIN id per "
        "component. The graph here is knn_graph_ivf at n_probe=1 on "
        "the oracle's first-8 cells, whose eps-edges are EXACTLY "
        "dd_semantic_near_dups' pair set (k=16 ≫ the measured max "
        "eps-degree of 2, so top-k never truncates an eps-edge — "
        "test-asserted); the DuckDB twin rebuilds cells, pairs, and "
        "components with the e5-style recursive CTE. Every eps "
        "re-sweep after a graph build is a filter + propagation — "
        "no similarity recompute.",
    oracle="""
        WITH RECURSIVE
        emb AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        cents AS (
            SELECT vec_id AS cell, v AS cv FROM emb ORDER BY vec_id LIMIT 8
        ),
        cassign AS (
            SELECT vec_id, v, cell FROM (
                SELECT e.vec_id, e.v, c.cell,
                       ROW_NUMBER() OVER (PARTITION BY e.vec_id
                           ORDER BY list_cosine_similarity(e.v, c.cv) DESC,
                                    c.cell ASC) AS cr
                FROM emb e CROSS JOIN cents c
            ) WHERE cr = 1
        ),
        pairs AS (
            SELECT a.vec_id AS va, b.vec_id AS vb
            FROM cassign a JOIN cassign b
              ON a.cell = b.cell AND a.vec_id < b.vec_id
            WHERE ROUND(list_cosine_similarity(a.v, b.v), 6) >= 0.45
        ),
        sym AS (SELECT va AS src, vb AS dst FROM pairs
                UNION SELECT vb, va FROM pairs),
        reach(id, root) AS (
            SELECT vec_id, vec_id FROM embeddings
            UNION
            SELECT s.dst, r.root FROM reach r JOIN sym s ON s.src = r.id),
        comp AS (SELECT id, MIN(root) AS component FROM reach GROUP BY id)
        SELECT id AS vec_id, component, (id = component) AS keep
        FROM comp ORDER BY vec_id
    """,
)
def dd_semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    graph = ann.knn_graph_ivf(emb, k=16, n_cells=8, n_probe=1,
                              quantizer="first")
    return dd.semdedup_prune(graph, 0.45,
                             vertices=emb.select("vec_id")) \
        .orderBy("vec_id")


@query(
    "dd_semdedup_prune_greedy",
    survey="LLM-dedup(semdedup-prune-greedy)",
    doc="The literal greedy keep rule over the same eps-graph: scan "
        "ids ascending, drop a doc iff an already-KEPT neighbor is "
        ">= eps (lexicographically-first maximal independent set — "
        "keeps BOTH ends of a 3-chain where the component rule keeps "
        "one). Distributed as monotone status propagation (decisions "
        "flow small→large id only). Greedy MIS is non-monotone "
        "recursion (kept(v) = NOT EXISTS kept smaller neighbor), "
        "which recursive SQL cannot express — rows-only here by "
        "necessity; the decision set is pinned row-for-row against a "
        "sequential Python reference in tests "
        "(test_semdedup_prune_greedy_matches_sequential).",
    oracle=None,
)
def dd_semdedup_prune_greedy(spark: SparkSession, sf_dir: str
                             ) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    graph = ann.knn_graph_ivf(emb, k=16, n_cells=8, n_probe=1,
                              quantizer="first")
    return dd.semdedup_prune_greedy(graph, 0.45,
                                    vertices=emb.select("vec_id")) \
        .orderBy("vec_id")


@query(
    "ta_rolling_fingerprint",
    survey="LLM-text(fingerprint)",
    doc="Order-sensitive document fingerprint: Rabin-Karp polynomial "
        "rolling hash over the character stream (base 131 mod 1e9+7) — "
        "one streaming pass, no tokenization; pure fold on both "
        "engines. Complements the order-insensitive md5 token-set "
        "fingerprint (dd_exact_fingerprint_groups).",
    oracle="""
        SELECT doc_id,
               list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                       list_transform(string_split(text, ''),
                                      c -> CAST(ascii(c) AS BIGINT))),
                   (acc, x) -> (acc * 131 + x) % 1000000007)
                   AS roll_hash
        FROM documents ORDER BY doc_id
    """,
)
def ta_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        ta.rolling_hash_fingerprint(F.col("text")).alias("roll_hash")) \
        .orderBy("doc_id")


_DUCK_WINNOW = """
        codes AS (
            SELECT doc_id,
                   list_transform(string_split(text, ''),
                                  c -> CAST(ascii(c) AS BIGINT)) AS cs
            FROM documents),
        kh AS (
            SELECT doc_id,
                   CASE WHEN len(cs) >= 8 THEN
                       [list_reduce(list_prepend(CAST(0 AS BIGINT),
                                                 cs[i:i+7]),
                                    (a, x) -> (a * 131 + x) % 1000000007)
                        for i in range(1, len(cs) - 6)]
                   ELSE [] END AS kh
            FROM codes),
        fp AS (
            SELECT doc_id,
                   CASE WHEN len(kh) >= 4 THEN
                       list_sort(list_distinct(
                           [list_min(kh[j:j+3])
                            for j in range(1, len(kh) - 2)]))
                   WHEN len(kh) > 0 THEN [list_min(kh)]
                   ELSE [] END AS fps
            FROM kh)
"""


@query(
    "ta_winnow_fingerprints",
    survey="LLM-text(winnow)",
    doc="Winnowing fingerprint sets (MOSS): rolling hashes of char "
        "8-grams, min per window of 4 — any shared substring of length "
        ">= 11 yields a shared fingerprint at O(L/w) fingerprints/doc. "
        "Arrow-batched numpy Horner kernel (the nested-HOF formulation "
        "runs interpreted and is ~10^4x slower).",
    oracle=f"""
        WITH {_DUCK_WINNOW}
        SELECT doc_id, CAST(len(fps) AS INT) AS n_fp,
               array_to_string(fps, '|') AS fp_str
        FROM fp ORDER BY doc_id
    """,
)
def ta_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from contacts_etl_phase21_spark.operators.text_analysis import (
        with_winnow_fingerprints,
    )

    docs = load(spark, sf_dir, "documents")
    fp = with_winnow_fingerprints(docs, "doc_id", "text", k=8, w=4)
    return (fp.select(
        F.col("doc").alias("doc_id"),
        F.size("fingerprints").alias("n_fp"),
        F.array_join(F.transform("fingerprints",
                                 lambda x: x.cast("string")), "|")
        .alias("fp_str"))
        .orderBy("doc_id"))


@query(
    "dd_winnow_overlap_pairs",
    survey="LLM-dedup(winnow)",
    doc="Shared-content pairs via winnowing fingerprints: drop "
        "stop-fingerprints (document frequency > 5), inverted-index "
        "join on the rare ones, keep pairs sharing >= 3 — the "
        "plagiarism/boilerplate-detection tier; join cost is linear in "
        "corpus size after the df cap.",
    oracle=f"""
        WITH {_DUCK_WINNOW},
        posting AS (SELECT doc_id, unnest(fps) AS f FROM fp),
        dfc AS (SELECT f FROM posting
                GROUP BY f HAVING COUNT(DISTINCT doc_id) <= 5),
        rare AS (SELECT p.doc_id, p.f FROM posting p JOIN dfc USING (f)),
        pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                         COUNT(*) AS shared
                  FROM rare a JOIN rare b
                    ON a.f = b.f AND a.doc_id < b.doc_id
                  GROUP BY 1, 2)
        SELECT doc_a, doc_b, CAST(shared AS BIGINT) AS shared
        FROM pairs WHERE shared >= 3 ORDER BY doc_a, doc_b
    """,
)
def dd_winnow_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return dd.winnow_overlap_pairs(docs, "doc_id", "text",
                                   k=8, w=4, max_df=5, min_shared=3) \
        .orderBy("doc_a", "doc_b")


@query(
    "ann_brute_topk",
    survey="LLM-similarity-search(brute)",
    doc="Exact cosine top-10 for the first 10 vectors as queries: "
        "broadcast queries × one streaming pass over the corpus; "
        "deterministic rank tiebreak on (rounded cosine desc, vec_id).",
    oracle=e6_oracle("""
        WITH q AS (
            SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS q_vec
            FROM embeddings WHERE vec_id < 10
        ),
        scored AS (
            SELECT q.query_id, e.vec_id,
                   ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.q_vec), 6) AS cosine
            FROM embeddings e CROSS JOIN q
        )
        SELECT query_id, rank, vec_id, cosine FROM (
            SELECT query_id, vec_id, cosine,
                   CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                         ORDER BY cosine DESC, vec_id ASC) AS INT) AS rank
            FROM scored
        ) WHERE rank <= 10
    """, "cosine"),
)
def ann_brute_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding")
    return scale_e6(
        ann.brute_force_topk(emb, queries, k=10).withColumn(
            "rank", F.col("rank").cast("int")),
        "cosine")


# DuckDB twin of similarity_search.hyperplane_bucket: the plane weights
# are a pure integer mix of (bit, component), so the bucket id is exactly
# reproducible in SQL (i is 1-based in DuckDB list lambdas → i-1).
_DUCK_LSH_BUCKET = "(" + " + ".join(
    f"(CASE WHEN list_sum(list_transform(v, (x, i) -> x * "
    f"(CAST((({b} * 1000003 + (i - 1) * 7919) % 104729) AS DOUBLE)"
    f" / 104729.0 - 0.5))) >= 0 THEN {1 << b} ELSE 0 END)"
    for b in range(8)) + ")"

_DUCK_LSH_TOPK = f"""
        WITH emb AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        bucketed AS (
            SELECT vec_id, v, {_DUCK_LSH_BUCKET} AS bucket FROM emb
        ),
        q AS (
            SELECT vec_id AS query_id, v AS qv, bucket
            FROM bucketed WHERE vec_id < 10
        ),
        scored AS (
            SELECT q.query_id, c.vec_id,
                   ROUND(list_cosine_similarity(c.v, q.qv), 6) AS cosine
            FROM bucketed c JOIN q ON c.bucket = q.bucket
        )
        SELECT query_id, rank, vec_id, cosine FROM (
            SELECT query_id, vec_id, cosine,
                   CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                         ORDER BY cosine DESC, vec_id ASC) AS INT) AS rank
            FROM scored
        ) WHERE rank <= 10
"""


@query(
    "ann_lsh_topk",
    survey="LLM-similarity-search(lsh)",
    doc="Sign-LSH bucketed ANN top-10 (8 fixed pseudo-random "
        "hyperplanes → 256 buckets, exact rerank within bucket) — the "
        "scale path; recall vs brute force reported in tests/bench. "
        "The plane weights are a deterministic integer mix, so the "
        "oracle reproduces the bucketing exactly in SQL.",
    oracle=e6_oracle(_DUCK_LSH_TOPK, "cosine"),
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding")
    return scale_e6(ann.lsh_topk(emb, queries, k=10, dim=64, bits=8),
                    "cosine")


_DUCK_IVF_TOPK = """
        WITH emb AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        cents AS (
            SELECT vec_id AS cell, v AS cv FROM emb ORDER BY vec_id LIMIT 16
        ),
        cassign AS (
            SELECT vec_id, v, cell FROM (
                SELECT e.vec_id, e.v, c.cell,
                       ROW_NUMBER() OVER (PARTITION BY e.vec_id
                           ORDER BY list_cosine_similarity(e.v, c.cv) DESC,
                                    c.cell ASC) AS cr
                FROM emb e CROSS JOIN cents c
            ) WHERE cr = 1
        ),
        qassign AS (
            SELECT query_id, qv, cell FROM (
                SELECT e.vec_id AS query_id, e.v AS qv, c.cell,
                       ROW_NUMBER() OVER (PARTITION BY e.vec_id
                           ORDER BY list_cosine_similarity(e.v, c.cv) DESC,
                                    c.cell ASC) AS cr
                FROM emb e CROSS JOIN cents c WHERE e.vec_id < 10
            ) WHERE cr <= 4
        ),
        scored AS (
            SELECT q.query_id, a.vec_id,
                   ROUND(list_cosine_similarity(a.v, q.qv), 6) AS cosine
            FROM cassign a JOIN qassign q USING (cell)
        )
        SELECT query_id, rank, vec_id, cosine FROM (
            SELECT query_id, vec_id, cosine,
                   CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                         ORDER BY cosine DESC, vec_id ASC) AS INT) AS rank
            FROM scored
        ) WHERE rank <= 10
"""


@query(
    "ann_ivf_topk",
    survey="LLM-similarity-search(ivf)",
    doc="IVF ANN top-10: corpus coarse-quantized into 16 cells "
        "(deterministic first-16-by-id centroids), queries probe their "
        "4 nearest cells, exact rerank within — at scale the corpus is "
        "partitioned by cell so a query reads n_probe/n_cells of the "
        "data. The quantizer is fully relational, so the oracle "
        "reproduces cell assignment, probing and rerank in SQL.",
    oracle=e6_oracle(_DUCK_IVF_TOPK, "cosine"),
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding")
    return scale_e6(ann.ivf_topk(emb, queries, k=10, n_cells=16, n_probe=4),
                    "cosine")


@query(
    "ta_language_id",
    survey="LLM-text(langid)",
    doc="Rule-based language ID: per-language stopword-marker hit "
        "counts, argmax with fixed precedence, 'und' when no markers.",
    oracle="""
        WITH h AS (
            SELECT doc_id, lang,
                   len(regexp_extract_all(lower(text), '\\b(the|a|of|and|to)\\b')) AS h_en,
                   len(regexp_extract_all(lower(text), '\\b(el|la|de|que|los)\\b')) AS h_es,
                   len(regexp_extract_all(lower(text), '\\b(der|die|das|und|ist)\\b')) AS h_de,
                   len(regexp_extract_all(lower(text), '\\b(le|la|les|et|est)\\b')) AS h_fr,
                   len(regexp_extract_all(lower(text), '\\b(的|是|了|在|我)\\b')) AS h_zh
            FROM documents
        )
        SELECT doc_id, lang,
               CASE WHEN GREATEST(h_en, h_es, h_de, h_fr, h_zh) = 0 THEN 'und'
                    WHEN h_en = GREATEST(h_en, h_es, h_de, h_fr, h_zh) THEN 'en'
                    WHEN h_es = GREATEST(h_en, h_es, h_de, h_fr, h_zh) THEN 'es'
                    WHEN h_de = GREATEST(h_en, h_es, h_de, h_fr, h_zh) THEN 'de'
                    WHEN h_fr = GREATEST(h_en, h_es, h_de, h_fr, h_zh) THEN 'fr'
                    ELSE 'zh' END AS predicted_lang
        FROM h
    """,
)
def ta_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", "lang",
        ta.predict_language(F.col("text")).alias("predicted_lang"))


@query(
    "ta_quality_scores",
    survey="LLM-text(quality)",
    doc="Gopher-style quality signals (length, punct ratio, stopword "
        "ratio, mean word length) + composite 0-100 score — pure column "
        "arithmetic, whole-stage codegen over the corpus.",
    oracle=e6_oracle("""
        WITH s AS (
            SELECT doc_id,
                   length(text) AS n_chars,
                   len(string_split(trim(text), ' ')) AS n_tokens,
                   len(regexp_extract_all(text, '[^\\w\\s]')) AS n_punct,
                   len(regexp_extract_all(lower(text), '\\b(the|a|of|and|to)\\b')) AS n_stop,
                   length(replace(trim(text), ' ', '')) AS n_nonspace
            FROM documents
        )
        SELECT doc_id,
               CAST(n_tokens AS INT) AS n_tokens,
               ROUND(n_punct * 1.0 / n_chars, 4) AS punct_ratio,
               ROUND(n_stop * 1.0 / n_tokens, 4) AS stopword_ratio,
               ROUND(n_nonspace * 1.0 / n_tokens, 4) AS mean_word_len,
               CAST(
                 (CASE WHEN n_tokens BETWEEN 10 AND 1000 THEN 40 ELSE 0 END) +
                 (CASE WHEN ROUND(n_nonspace * 1.0 / n_tokens, 4) BETWEEN 2.0 AND 12.0
                       THEN 30 ELSE 0 END) +
                 (CASE WHEN ROUND(n_stop * 1.0 / n_tokens, 4) > 0 THEN 20 ELSE 0 END) +
                 (CASE WHEN ROUND(n_punct * 1.0 / n_chars, 4) <= 0.2 THEN 10 ELSE 0 END)
               AS INT) AS quality
        FROM s
    """, "punct_ratio", "stopword_ratio", "mean_word_len"),
)
def ta_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r11 (guide §2.5 input skew / §1.4): the plan is Scan → Project
    # with no exchange, so ALL the per-doc regex work runs in the
    # scan's tasks — and the local single-row-group file scans as ONE
    # task. widen() round-robins the text across cores first (no-op at
    # 100 TB where the scan is already wide). Measured interleaved at
    # sf0.1: noop 1.021 → 0.540s median; count-mode cost of the added
    # tiny exchange +0.035s.
    docs = widen(load(spark, sf_dir, "documents"))
    s = ta.quality_signals(F.col("text"))
    return scale_e6(
        docs.select(
            "doc_id",
            s["n_tokens"].cast("int").alias("n_tokens"),
            s["punct_ratio"].alias("punct_ratio"),
            s["stopword_ratio"].alias("stopword_ratio"),
            s["mean_word_len"].alias("mean_word_len"),
            ta.quality_score(F.col("text")).alias("quality")),
        "punct_ratio", "stopword_ratio", "mean_word_len")


@query(
    "ta_token_counts",
    survey="LLM-text(tokens)",
    doc="Whitespace token count + BPE-ish regex token count "
        "(alpha runs / digit runs / single punctuation).",
    oracle="""
        SELECT doc_id,
               CAST(len(string_split(trim(text), ' ')) AS INT) AS ws_tokens,
               CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))
                    AS INT) AS bpe_tokens
        FROM documents
    """,
)
def ta_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        ta.whitespace_token_count(F.col("text")).cast("int").alias("ws_tokens"),
        ta.bpe_ish_token_count(F.col("text")).cast("int").alias("bpe_tokens"))


@query(
    "sp_hash_sample_stratified",
    survey="LLM-sampling",
    doc="Deterministic stratified corpus sampling: per-language keep "
        "rates applied through a Knuth multiplicative id hash — no "
        "RNG, reproducible across runs/engines/partitionings, filter "
        "pushes to the scan (no shuffle). The oracle recomputes the "
        "exact same row set arithmetically.",
    oracle="""
        SELECT doc_id, lang FROM documents
        WHERE ((doc_id % 2147483648) * 2654435761) % 1000 <
              CASE WHEN lang = 'en' THEN 80
                   WHEN lang = 'de' THEN 300 ELSE 1000 END
        ORDER BY doc_id
    """,
)
def sp_hash_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    from contacts_etl_phase21_spark.operators.sampling import (
        stratified_sample,
    )

    docs = load(spark, sf_dir, "documents")
    return stratified_sample(
        docs.select("doc_id", "lang"), "doc_id", "lang",
        {"en": 80, "de": 300}, default_permille=1000).orderBy("doc_id")


@query(
    "sp_pack_sequences",
    survey="LLM-sampling(pack)",
    doc="Context-window packing: within each language, documents in "
        "id order are prefix-sum-binned into packs of ~2048 whitespace "
        "tokens (pack = floor(tokens_before/budget)) — one window "
        "shuffle on the partition key, no global ordering bottleneck. "
        "Oracle is the identical SQL window.",
    oracle="""
        WITH t AS (
            SELECT doc_id, lang,
                   len(string_split(trim(text), ' ')) AS n_tokens
            FROM documents
        )
        SELECT lang, doc_id, CAST(n_tokens AS INT) AS n_tokens,
               CAST(FLOOR(COALESCE(SUM(n_tokens) OVER (
                        PARTITION BY lang ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) / 2048) AS INT) AS pack_id
        FROM t ORDER BY lang, doc_id
    """,
)
def sp_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from contacts_etl_phase21_spark.operators.sampling import pack_sequences

    docs = load(spark, sf_dir, "documents")
    return pack_sequences(
        docs, "lang", "doc_id",
        ta.whitespace_token_count(F.col("text")).cast("int"),
        budget=2048).orderBy("lang", "doc_id")


@query(
    "mm_decode_features",
    survey="LLM-multimodal",
    doc="Binary-payload decode pipeline: documents → opaque binary "
        "column + metadata → mapInPandas feature extraction (stubbed "
        "deterministic decode — codecs absent; Spark plumbing real). "
        "Oracle recomputes the deterministic double from the bytes.",
    oracle=e6_oracle("""
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
               CAST(octet_length(encode(text)) % 10 + 1 AS INT) AS n_frames,
               ROUND(ascii(substr(text, 1, 1)) / 255.0, 6) AS feat0
        FROM documents
    """, "feat0"),
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    feats = extract_features(with_binary_payload(docs), fake=True)
    return scale_e6(
        feats.select(
            "doc_id", "byte_len", "n_frames",
            F.round(F.element_at("feature", 1), 6).alias("feat0")),
        "feat0")


@query(
    "mm_resize_images",
    survey="LLM-multimodal(resize)",
    doc="Binary resize pipeline: payload -> mapInPandas -> resized "
        "binary column + output metadata (stubbed deterministic "
        "truncate-to-W*H; plumbing real). Oracle recomputes the "
        "metadata from the text bytes.",
    oracle="""
        SELECT doc_id,
               CAST(16 AS INT) AS out_w, CAST(16 AS INT) AS out_h,
               CAST(LEAST(octet_length(encode(text)), 256) AS BIGINT)
                   AS out_len
        FROM documents ORDER BY doc_id
    """,
)
def mm_resize_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    resized = resize_images(with_binary_payload(docs), 16, 16, fake=True)
    return resized.select("doc_id", "out_w", "out_h", "out_len") \
        .orderBy("doc_id")


@query(
    "mm_frame_samples",
    survey="LLM-multimodal(frames)",
    doc="Frame sampling as a UDTF-shaped mapInPandas: each payload "
        "expands to one row per sampled frame (every 2nd of "
        "byte_len%10+1 stub frames) with a deterministic arithmetic "
        "signature — data-dependent output cardinality, the explode "
        "shape a video pipeline needs.",
    oracle="""
        SELECT doc_id, CAST(u.idx AS INT) AS frame_idx,
               CAST((octet_length(encode(text)) * 131 + u.idx) % 997
                    AS BIGINT) AS frame_sig
        FROM documents,
             LATERAL (SELECT unnest(range(0,
                          octet_length(encode(text)) % 10 + 1, 2)) AS idx) u
        ORDER BY doc_id, frame_idx
    """,
)
def mm_frame_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    frames = sample_frames(with_binary_payload(docs), every_k=2, fake=True)
    return frames.orderBy("doc_id", "frame_idx")


# --------------------------------------------------------------------------
# mm real-codec tier: deterministic payload synthesis → REAL pure-Python
# codec (stdlib wave / hand-rolled P6 parser) → integer projections. The
# oracles recompute the expected values arithmetically from the synthesis
# formulas WITHOUT touching the binary, so a bug anywhere in the
# encode→decode→transform loop is a hash mismatch.
# --------------------------------------------------------------------------


@query(
    "mm_wav_decode_real",
    survey="LLM-multimodal(audio)",
    doc="REAL WAV round trip: per doc, synthesize (d%5+1)*4 int16 "
        "samples with sample_i = (d*7+i*13)%2003-1001, encode to RIFF "
        "via stdlib wave, decode back (multimodal.decode_wav), emit "
        "frame count + integer sample sums. Oracle recomputes the sums "
        "from the formula — int-exact.",
    oracle="""
        WITH s AS (
            SELECT doc_id, (doc_id % 5 + 1) * 4 AS n FROM documents
        ),
        samp AS (
            SELECT s.doc_id, s.n,
                   ((s.doc_id * 7 + i.i * 13) % 2003 - 1001) AS v
            FROM s JOIN (SELECT unnest(range(20)) AS i) i ON i.i < s.n
        )
        SELECT doc_id, CAST(MAX(n) AS INT) AS n_frames,
               CAST(SUM(v) AS BIGINT) AS sum_samples,
               CAST(SUM(v * v) AS BIGINT) AS sum_sq
        FROM samp GROUP BY doc_id ORDER BY doc_id
    """,
)
def mm_wav_decode_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    from contacts_etl_phase21_spark.operators.multimodal import (
        synth_wav_payloads, wav_stats,
    )

    docs = load(spark, sf_dir, "documents")
    return wav_stats(synth_wav_payloads(docs)).orderBy("doc_id")


def _ppm_avg4(ox: int, c: int) -> str:
    """SQL for the box-filtered output byte at (ox, 0) channel c of the
    4x2→2x1 resize; input byte i = (doc_id*31 + i*17) % 256."""
    terms = " + ".join(
        f"((doc_id * 31 + {((dy * 4 + ox * 2 + dx) * 3 + c)} * 17) % 256)"
        for dy in range(2) for dx in range(2))
    return f"CAST(FLOOR(({terms}) / 4) AS INT)"


@query(
    "mm_ppm_resize_real",
    survey="LLM-multimodal(image)",
    doc="REAL image resize round trip: per doc, synthesize a 4x2 P6 "
        "image (byte_i = (d*31+i*17)%256), box-filter to 2x1 with the "
        "pure-Python codec (decode_ppm → integer pixel-area mean → "
        "encode_ppm → decode again), emit the six resized RGB bytes as "
        "scalar columns p0..p5 (registry rule: query outputs are "
        "scalar-typed — the driver canonicalizes via pandas sort, which "
        "cannot hash list cells). Oracle computes each output byte "
        "arithmetically.",
    oracle=f"""
        SELECT doc_id, 2 AS out_w, 1 AS out_h,
               {", ".join(f"{_ppm_avg4(i // 3, i % 3)} AS p{i}"
                          for i in range(6))}
        FROM documents ORDER BY doc_id
    """,
)
def mm_ppm_resize_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from contacts_etl_phase21_spark.operators.multimodal import (
        ppm_resize_pixels, synth_ppm_payloads,
    )

    docs = load(spark, sf_dir, "documents")
    resized = ppm_resize_pixels(
        synth_ppm_payloads(docs, w=4, h=2), out_w=2, out_h=1)
    return resized.select(
        "doc_id", "out_w", "out_h",
        *[F.col("pixels")[i].alias(f"p{i}") for i in range(6)],
    ).orderBy("doc_id")


@query(
    "mm_ppm_frames_real",
    survey="LLM-multimodal(video)",
    doc="REAL frame sampling: per doc, a 3-frame concatenated-P6 "
        "sequence (frame f byte_i = (d*31+f*101+i*17)%256) is split on "
        "parsed frame boundaries, every 2nd frame kept (idx 0, 2), "
        "fingerprinted as sum(pixel bytes) % 997. Oracle recomputes "
        "both signatures from the formula.",
    oracle="""
        SELECT d.doc_id, CAST(f.f AS INT) AS frame_idx,
               CAST(SUM((d.doc_id * 31 + f.f * 101 + i.i * 17) % 256) % 997
                    AS BIGINT) AS frame_sig
        FROM documents d
        CROSS JOIN (SELECT unnest([0, 2]) AS f) f
        CROSS JOIN (SELECT unnest(range(24)) AS i) i
        GROUP BY d.doc_id, f.f ORDER BY d.doc_id, frame_idx
    """,
)
def mm_ppm_frames_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    from contacts_etl_phase21_spark.operators.multimodal import (
        ppm_frame_samples, synth_ppm_payloads,
    )

    docs = load(spark, sf_dir, "documents")
    return ppm_frame_samples(
        synth_ppm_payloads(docs, w=4, h=2, frames=3), every_k=2) \
        .orderBy("doc_id", "frame_idx")


@query(
    "ann_range_search",
    survey="LLM-similarity-search(range)",
    doc="Cosine range search: all corpus vectors within similarity >= "
        "0.3 of each query — the radius-query companion to top-k; same "
        "broadcast-queries x streamed-corpus plan, no window needed.",
    oracle=e6_oracle("""
        WITH q AS (
            SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS q_vec
            FROM embeddings WHERE vec_id < 5
        )
        SELECT q.query_id, e.vec_id,
               ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                            q.q_vec), 6) AS cosine
        FROM embeddings e CROSS JOIN q
        WHERE ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                           q.q_vec), 6) >= 0.3
        ORDER BY query_id, vec_id
    """, "cosine"),
)
def ann_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import broadcast

    from contacts_etl_phase21_spark.operators.similarity_search import (
        _dot, cosine_from_norms, norm2_col,
    )

    emb = load(spark, sf_dir, "embeddings")
    q = broadcast(emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_vec"),
        norm2_col(F.col("embedding")).alias("__qn2")))
    return scale_e6(
        emb.select("vec_id", "embedding",
                   norm2_col(F.col("embedding")).alias("__n2"))
        .crossJoin(q)
        .select("query_id", "vec_id",
                F.round(cosine_from_norms(
                    _dot(F.col("embedding"), F.col("q_vec")),
                    F.col("__n2"), F.col("__qn2")), 6).alias("cosine"))
        .filter(F.col("cosine") >= 0.3)
        .orderBy("query_id", "vec_id"),
        "cosine")


@query(
    "agg_rollup_pricing",
    survey="A-ext(rollup)",
    doc="ROLLUP grouping sets over lineitem status flags — beyond the "
        "reference's aggregation surface (SURVEY notes it has none); "
        "Spark expands the sets map-side, one shuffle.",
    oracle=cents_oracle("""
        SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
               COALESCE(l_linestatus, 'ALL') AS linestatus,
               COUNT(*) AS n,
               ROUND(SUM(l_extendedprice), 2) AS total_price
        FROM lineitem
        GROUP BY ROLLUP(l_returnflag, l_linestatus)
        ORDER BY returnflag, linestatus
    """, "total_price"),
)
def agg_rollup_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load(spark, sf_dir, "lineitem")
    return scale_cents(
        lineitem
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"),
             F.round(F.sum("l_extendedprice"), 2).alias("total_price"))
        .select(F.coalesce("l_returnflag", F.lit("ALL"))
                .alias("returnflag"),
                F.coalesce("l_linestatus", F.lit("ALL"))
                .alias("linestatus"), "n", "total_price")
        .orderBy("returnflag", "linestatus"),
        "total_price")


# PII scrub ------------------------------------------------------------------

# The synthesized PII suffix (documents.text is clean word salad, so the
# corpus is seeded deterministically from doc_id; even ids get one of
# each PII kind, odd ids none). Both engines build the IDENTICAL string.
_PII_ORACLE_TEXT = """
        CASE WHEN doc_id % 2 = 0 THEN
            substr(text, 1, 40) || ' contact user' || CAST(doc_id AS VARCHAR)
            || '@mail.example.com or (555) 010-'
            || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
            || ' ip 10.' || CAST(doc_id % 200 AS VARCHAR) || '.0.'
            || CAST(doc_id % 250 AS VARCHAR)
            || ' ssn ' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
            || '-' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
            || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        ELSE substr(text, 1, 40) END
"""


def _pii_oracle() -> str:
    from contacts_etl_phase21_spark.operators.pii import PII_RULES

    counts = ",\n               ".join(
        f"CAST(len(regexp_extract_all(t, '{pat}')) AS INT) AS n_{kind}"
        for kind, pat, _ in PII_RULES)
    redacted = "t"
    for _, pat, token in PII_RULES:
        redacted = f"regexp_replace({redacted}, '{pat}', '{token}', 'g')"
    return f"""
        WITH seeded AS (
            SELECT doc_id, {_PII_ORACLE_TEXT} AS t FROM documents
        )
        SELECT doc_id,
               {counts},
               {redacted} AS redacted
        FROM seeded
        ORDER BY doc_id
    """


@query(
    "ta_pii_scrub",
    survey="LLM-text(pii-scrub),F4,F6",
    doc="PII detection + typed redaction over documents "
        "(operators/pii.py): email / IPv4 / SSN / phone counts and the "
        "sequentially redacted text, all JVM-regex column expressions "
        "fused into the scan projection — the pre-tokenization scrub "
        "pass of a pretraining pipeline. The regex family mirrors the "
        "reference's contact-harvesting patterns (normalization.py "
        "email/phone tiers) applied corpus-side. Patterns are "
        "Java/RE2-portable and the oracle is GENERATED from the same "
        "PII_RULES tuple, so Spark and DuckDB provably scrub with "
        "identical rules in identical order.",
    oracle=_pii_oracle(),
)
def ta_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    from contacts_etl_phase21_spark.operators.pii import scrub_documents

    docs = load(spark, sf_dir, "documents")
    did = F.col("doc_id")
    suffix = F.concat(
        F.lit(" contact user"), did.cast("string"),
        F.lit("@mail.example.com or (555) 010-"),
        F.lpad((did % 10000).cast("string"), 4, "0"),
        F.lit(" ip 10."), (did % 200).cast("string"), F.lit(".0."),
        (did % 250).cast("string"),
        F.lit(" ssn "), F.lpad((did % 1000).cast("string"), 3, "0"),
        F.lit("-"), F.lpad((did % 100).cast("string"), 2, "0"),
        F.lit("-"), F.lpad((did % 10000).cast("string"), 4, "0"))
    seeded = docs.select(
        "doc_id",
        F.when(did % 2 == 0,
               F.concat(F.substring("text", 1, 40), suffix))
        .otherwise(F.substring("text", 1, 40)).alias("text"))
    return scrub_documents(seeded, "doc_id", "text").orderBy("doc_id")


# Repetition scores ----------------------------------------------------------


@query(
    "ta_repetition_scores",
    survey="LLM-text(repetition)",
    doc="Gopher-style repetition filters (Rae et al. 2021 §A1.1): "
        "duplicate-token fraction and top-bigram fraction per document "
        "(operators/text_analysis.repetition_scores). Token counts are "
        "scan-projection column algebra; bigram counting is one "
        "map-side-combined shuffle on (doc, bigram) — no global "
        "structure, survives 100 TB unchanged.",
    oracle=e6_oracle("""
        WITH t AS (
            SELECT doc_id,
                   regexp_split_to_array(trim(lower(text)), '\\s+') AS w
            FROM documents
        ),
        base AS (
            SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
                   CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct, w
            FROM t
        ),
        bgc AS (
            SELECT doc_id, bigram, COUNT(*) AS c
            FROM (SELECT doc_id,
                         unnest([w[i] || ' ' || w[i+1]
                                 for i in range(1, len(w))]) AS bigram
                  FROM base)
            GROUP BY doc_id, bigram
        ),
        top AS (
            SELECT doc_id, MAX(c) AS top_bigram_count, SUM(c) AS n_bigrams
            FROM bgc GROUP BY doc_id
        )
        SELECT b.doc_id AS doc, n_tokens,
               ROUND(1.0 - n_distinct * 1.0 / n_tokens, 6)
                   AS dup_token_frac,
               CAST(COALESCE(top_bigram_count, 0) AS BIGINT)
                   AS top_bigram_count,
               ROUND(COALESCE(top_bigram_count * 1.0 / n_bigrams, 0.0), 6)
                   AS top_bigram_frac
        FROM base b LEFT JOIN top USING (doc_id)
        ORDER BY doc
    """, "dup_token_frac", "top_bigram_frac"),
)
def ta_repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return scale_e6(ta.repetition_scores(docs, "doc_id", "text").orderBy("doc"),
                    "dup_token_frac", "top_bigram_frac")


# Training-shard assignment --------------------------------------------------


@query(
    "sp_shard_assign",
    survey="LLM-sample(shard)",
    doc="Deterministic training-shard assignment + per-shard balance "
        "audit (operators/sampling.assign_shards): shard = md5(id) "
        "first-8-hex mod 64, an engine-portable uniform hash "
        "(independent of the Knuth sampling hash so shard and sample "
        "selections never correlate). The stats aggregation IS the "
        "balance check a 100 TB export runs before writing "
        "partitionBy(shard) — one map-side-combined shuffle.",
    oracle="""
        SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                   % 64 AS shard,
               COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               CAST(SUM(len(regexp_split_to_array(trim(text), '\\s+')))
                   AS BIGINT) AS total_tokens
        FROM documents
        GROUP BY shard
        ORDER BY shard
    """,
)
def sp_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    from contacts_etl_phase21_spark.operators.sampling import assign_shards

    docs = load(spark, sf_dir, "documents")
    return (assign_shards(docs, "doc_id", 64)
            .groupBy("shard")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_chars").alias("total_chars"),
                 F.sum(ta.whitespace_token_count(F.col("text")).cast("long"))
                 .alias("total_tokens"))
            .orderBy("shard"))


# Dedup keep-first (end-to-end) ----------------------------------------------


@query(
    "dd_dedup_keep_first",
    survey="LLM-dedup(keep-first),E5",
    doc="End-to-end corpus dedup with canonical keep-first semantics "
        "(operators/dedup.dedup_keep_first): MinHash+LSH verified "
        "pairs → connected components (the ER engine's min-label "
        "propagation) → keep the min-id representative per duplicate "
        "group. One row per doc: (doc_id, keep_id, kept); "
        "filter kept=1 is the deduped corpus. The oracle computes the "
        "exact-Jaccard pair set and its transitive closure with a "
        "recursive CTE — a full cross-engine check of the iterative "
        "components loop, not just the pair stage.",
    oracle="""
        WITH RECURSIVE
        toks AS (
            SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
        ),
        sh AS (
            SELECT doc_id,
                   list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                  for i in range(1, len(w) - 1)]) AS s
            FROM toks
        ),
        pairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE ROUND(len(list_intersect(a.s, b.s)) * 1.0
                        / len(list_distinct(list_concat(a.s, b.s))), 6)
                  >= 0.8
        ),
        edges AS (
            SELECT doc_a AS src, doc_b AS dst FROM pairs
            UNION SELECT doc_b, doc_a FROM pairs
        ),
        reach(src, dst) AS (
            SELECT src, dst FROM edges
            UNION
            SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
        ),
        rep AS (SELECT src AS doc_id, MIN(dst) AS mn FROM reach GROUP BY src)
        SELECT d.doc_id,
               CAST(COALESCE(LEAST(r.mn, d.doc_id), d.doc_id) AS BIGINT)
                   AS keep_id,
               CAST(CASE WHEN COALESCE(LEAST(r.mn, d.doc_id), d.doc_id)
                              = d.doc_id THEN 1 ELSE 0 END AS INT) AS kept
        FROM documents d LEFT JOIN rep r USING (doc_id)
        ORDER BY d.doc_id
    """,
)
def dd_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return dd.dedup_keep_first(docs, "doc_id", "text").orderBy("doc_id")


# Shared split CTE (r10 s2): exact-Jaccard pairs -> recursive-CTE
# closure -> min-id component -> md5('split:'||group) % 10 buckets.
# Used by sp_leakage_safe_split (the assignment itself) and
# sp_split_leakage_report (the audit over it). Tokenizes with
# regexp_split_to_array '\\s+' to match with_hashed_shingles' \\s+
# split exactly (r10 advisory — the same divergence class the r09
# tfidf fix closed; string_split on a literal space only matches on
# single-spaced corpora).
_DUCK_SPLIT_CTE = """
        toks AS (
            SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
            FROM documents
        ),
        sh AS (
            SELECT doc_id,
                   list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                  for i in range(1, len(w) - 1)]) AS s
            FROM toks
        ),
        pairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE ROUND(len(list_intersect(a.s, b.s)) * 1.0
                        / len(list_distinct(list_concat(a.s, b.s))), 6)
                  >= 0.8
        ),
        edges AS (
            SELECT doc_a AS src, doc_b AS dst FROM pairs
            UNION SELECT doc_b, doc_a FROM pairs
        ),
        reach(src, dst) AS (
            SELECT src, dst FROM edges
            UNION
            SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
        ),
        rep AS (SELECT src AS doc_id, MIN(dst) AS mn FROM reach GROUP BY src),
        grp AS (
            SELECT d.doc_id,
                   CAST(COALESCE(LEAST(r.mn, d.doc_id), d.doc_id)
                        AS BIGINT) AS group_id
            FROM documents d LEFT JOIN rep r USING (doc_id)
        ),
        splits AS (
            SELECT doc_id, group_id, bucket,
                   CASE WHEN bucket < 8 THEN 'train'
                        WHEN bucket < 9 THEN 'val'
                        ELSE 'test' END AS split
            FROM (SELECT doc_id, group_id,
                         CAST(CAST(('0x' || substr(md5('split:'
                                  || CAST(group_id AS VARCHAR)), 1, 8))
                              AS BIGINT) % 10 AS INT) AS bucket
                  FROM grp)
        )
"""


@query(
    "sp_leakage_safe_split",
    survey="LLM-sampling(leakage-safe-split),E5",
    doc="Group-aware train/val/test split (r10, operators/sampling."
        "leakage_safe_split): near-duplicate documents are forced into "
        "the SAME split — the eval-integrity guard against the "
        "corpus's own held-out set (decontamination's sibling). "
        "Components come from the certified dedup spine (exact-set "
        "pre-collapse → LSH verified pairs → connected components → "
        "linear expansion); the split is a pure projection on the "
        "component: ('0x'||md5('split:'||group)[1:8]) % 10 buckets, "
        "8/1/1. The 'split:' prefix decorrelates from shard_id's bare "
        "md5 window (a singleton's group IS its doc id). The oracle "
        "recomputes exact-Jaccard pairs + recursive-CTE closure + the "
        "identical md5 arithmetic — the components ITERATION is "
        "value-checked, not just the bucket math.",
    oracle=f"""
        WITH RECURSIVE {_DUCK_SPLIT_CTE}
        SELECT doc_id, group_id, bucket, split
        FROM splits ORDER BY doc_id
    """,
)
def sp_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from contacts_etl_phase21_spark.operators.sampling import (
        leakage_safe_split,
    )

    docs = load(spark, sf_dir, "documents")
    return leakage_safe_split(docs, "doc_id", "text").orderBy("doc_id")


@query(
    "sp_split_leakage_report",
    survey="LLM-sampling(split-leakage-audit)",
    doc="Residual token-level leakage audit over the leakage-safe "
        "split (r10 s2, operators/sampling.split_leakage_report): per "
        "eval split, how many docs share any token 8-gram with ANY "
        "train doc and the mean leaked-gram fraction — the group-aware "
        "split stops near-duplicates; this measures the boilerplate "
        "n-grams that remain (line dedup / span removal are the "
        "fixes). Train gram set is corpus-scale, so the probe is an "
        "honest shuffle equi-join on the gram hash, not a broadcast. "
        "BIGINT DIV arithmetic end to end; the oracle recomputes the "
        "recursive split AND the string-gram overlap.",
    oracle=f"""
        WITH RECURSIVE {_DUCK_SPLIT_CTE},
        g AS (
            SELECT doc_id,
                   list_distinct([array_to_string(
                       w[i:least(i + 7, len(w))], ' ')
                       for i in range(1, greatest(len(w) - 7, 1) + 1)])
                       AS grams
            FROM toks
        ),
        tg AS (
            SELECT DISTINCT unnest(g.grams) AS gg
            FROM g JOIN splits USING (doc_id) WHERE split = 'train'
        ),
        ev AS (
            SELECT g.doc_id, unnest(g.grams) AS gg
            FROM g JOIN splits s USING (doc_id) WHERE s.split <> 'train'
        ),
        lk AS (
            SELECT doc_id, COUNT(*) AS n_leaked
            FROM ev JOIN tg USING (gg) GROUP BY doc_id
        ),
        per_doc AS (
            SELECT s.split, len(g.grams) AS n_grams,
                   COALESCE(l.n_leaked, 0) AS n_leaked
            FROM g JOIN splits s USING (doc_id)
            LEFT JOIN lk l ON g.doc_id = l.doc_id
            WHERE s.split <> 'train'
        )
        SELECT split,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN n_leaked > 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS leaked_docs,
               CAST(SUM(n_leaked * 1000000 // n_grams) // COUNT(*)
                    AS BIGINT) AS mean_leak_e6
        FROM per_doc GROUP BY split ORDER BY split
    """,
)
def sp_split_leakage_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from contacts_etl_phase21_spark.operators.sampling import (
        leakage_safe_split, split_leakage_report,
    )

    docs = load(spark, sf_dir, "documents")
    splits = leakage_safe_split(docs, "doc_id", "text")
    return split_leakage_report(docs, splits, "doc_id", "text", n=8) \
        .orderBy("split")


@query(
    "sp_split_leakage_offenders",
    survey="LLM-sampling(split-leakage-offenders)",
    doc="Top offending grams behind the residual split leakage (r11, "
        "operators/sampling.split_leakage_offenders): the audit's "
        "actionable tail — WHICH token 8-grams cross train↔eval and "
        "how many docs each reaches, ranked by eval-doc count with a "
        "full deterministic tiebreak so the LIMIT is oracle-exact. "
        "Join + counts key on xxhash64(gram) (8-byte shuffle keys); "
        "gram text rides only the eval-side aggregate. The oracle "
        "recomputes the recursive split AND the ranked string-gram "
        "overlap. Registered at n=3 (the corpus's shingle scale — "
        "the 8-gram audit is leak-free on these tables, which would "
        "make the row a trivial 0-row hash; production audits run "
        "the report's n).",
    oracle=f"""
        WITH RECURSIVE {_DUCK_SPLIT_CTE},
        g AS (
            SELECT doc_id,
                   list_distinct([array_to_string(
                       w[i:least(i + 2, len(w))], ' ')
                       for i in range(1, greatest(len(w) - 2, 1) + 1)])
                       AS grams
            FROM toks
        ),
        tg AS (
            SELECT unnest(g.grams) AS gram, g.doc_id
            FROM g JOIN splits USING (doc_id) WHERE split = 'train'
        ),
        tc AS (
            SELECT gram, COUNT(DISTINCT doc_id) AS n_train_docs
            FROM tg GROUP BY gram
        ),
        ev AS (
            SELECT unnest(g.grams) AS gram, g.doc_id
            FROM g JOIN splits s USING (doc_id) WHERE s.split <> 'train'
        ),
        ec AS (
            SELECT gram, COUNT(DISTINCT doc_id) AS n_eval_docs
            FROM ev GROUP BY gram
        )
        SELECT ec.gram AS gram,
               CAST(n_eval_docs AS BIGINT) AS n_eval_docs,
               CAST(n_train_docs AS BIGINT) AS n_train_docs
        FROM ec JOIN tc USING (gram)
        ORDER BY n_eval_docs DESC, n_train_docs DESC, gram ASC
        LIMIT 20
    """,
)
def sp_split_leakage_offenders(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    from contacts_etl_phase21_spark.operators.sampling import (
        leakage_safe_split, split_leakage_offenders,
    )

    docs = load(spark, sf_dir, "documents")
    splits = leakage_safe_split(docs, "doc_id", "text")
    return split_leakage_offenders(docs, splits, "doc_id", "text",
                                   n=3, top=20)


# Decontamination -------------------------------------------------------------


@query(
    "dd_decontaminate_ngrams",
    survey="LLM-dedup(decontaminate)",
    doc="Benchmark decontamination (operators/decontamination.py): "
        "train docs (doc_id % 10 != 0) are flagged when they share any "
        "token 8-gram with the eval set (doc_id % 10 == 0). Eval "
        "n-grams are deduped and BROADCAST (benchmarks are tiny vs the "
        "corpus), so the corpus-side check is a broadcast hash join in "
        "the scan — the corpus is never shuffled. n_hits counts the "
        "doc's distinct contaminated n-grams (hashed token windows; "
        "string-equal modulo 64-bit collisions, same documented "
        "equivalence as the MinHash tier).",
    oracle="""
        WITH toks AS (
            SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
        ),
        g AS (
            SELECT doc_id,
                   list_distinct([array_to_string(
                       w[i:least(i + 7, len(w))], ' ')
                       for i in range(1, greatest(len(w) - 7, 1) + 1)]) AS grams
            FROM toks
        ),
        ev AS (
            SELECT DISTINCT unnest(grams) AS gg FROM g WHERE doc_id % 10 = 0
        ),
        tr AS (
            SELECT doc_id, unnest(grams) AS gg FROM g WHERE doc_id % 10 <> 0
        ),
        hits AS (
            SELECT tr.doc_id, COUNT(*) AS n_hits
            FROM tr JOIN ev USING (gg) GROUP BY tr.doc_id
        )
        SELECT d.doc_id,
               CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
               CAST(CASE WHEN COALESCE(h.n_hits, 0) > 0 THEN 1 ELSE 0 END
                    AS INT) AS contaminated
        FROM documents d LEFT JOIN hits h USING (doc_id)
        WHERE d.doc_id % 10 <> 0
        ORDER BY d.doc_id
    """,
)
def dd_decontaminate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from contacts_etl_phase21_spark.operators.decontamination import (
        contamination_flags,
    )

    docs = load(spark, sf_dir, "documents")
    ev = docs.filter(F.col("doc_id") % 10 == 0)
    train = docs.filter(F.col("doc_id") % 10 != 0)
    return contamination_flags(train, ev, "doc_id", "text", n=8) \
        .orderBy("doc_id")


@query(
    "dd_contamination_by_eval",
    survey="LLM-dedup(decontaminate-report)",
    doc="Per-EVAL-doc leakage report (r07, operators/decontamination."
        "contamination_by_eval): for each benchmark doc (doc_id%10=0), "
        "how many train docs share any token 8-gram with it and how "
        "many distinct grams leak — the eval-integrity view (flags say "
        "what to DROP; this says which eval numbers to DISTRUST). "
        "Same broadcast shape as dd_decontaminate_ngrams: the (eval, "
        "gram) frame broadcasts, the corpus never shuffles; distinct "
        "gram counts are hash-based (64-bit-collision equivalence, as "
        "documented for the MinHash tier).",
    oracle="""
        WITH toks AS (
            SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
        ),
        g AS (
            SELECT doc_id,
                   list_distinct([array_to_string(
                       w[i:least(i + 7, len(w))], ' ')
                       for i in range(1, greatest(len(w) - 7, 1) + 1)]) AS grams
            FROM toks
        ),
        evg AS (
            SELECT doc_id AS eval_id, unnest(grams) AS gg
            FROM g WHERE doc_id % 10 = 0
        ),
        trg AS (
            SELECT doc_id AS train_id, unnest(grams) AS gg
            FROM g WHERE doc_id % 10 <> 0
        ),
        hits AS (
            SELECT e.eval_id,
                   COUNT(DISTINCT t.train_id) AS n_train_docs,
                   COUNT(DISTINCT t.gg) AS n_shared_grams
            FROM evg e JOIN trg t USING (gg) GROUP BY e.eval_id
        )
        SELECT d.doc_id AS eval_id,
               CAST(COALESCE(h.n_train_docs, 0) AS BIGINT) AS n_train_docs,
               CAST(COALESCE(h.n_shared_grams, 0) AS BIGINT)
                   AS n_shared_grams
        FROM documents d LEFT JOIN hits h ON d.doc_id = h.eval_id
        WHERE d.doc_id % 10 = 0
        ORDER BY eval_id
    """,
)
def dd_contamination_by_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from contacts_etl_phase21_spark.operators.decontamination import (
        contamination_by_eval,
    )

    docs = load(spark, sf_dir, "documents")
    ev = docs.filter(F.col("doc_id") % 10 == 0)
    train = docs.filter(F.col("doc_id") % 10 != 0)
    return contamination_by_eval(train, ev, "doc_id", "text",
                                 n=8).orderBy("eval_id")


# Weighted epoch mixing -------------------------------------------------------


@query(
    "sp_epoch_mix",
    survey="LLM-sampling(mix)",
    doc="Deterministic weighted training mix with oversampling "
        "(operators/sampling.epoch_mix): per-language epoch weights "
        "(en 0.7, de 1.5, es 2.3, zh 3.5, default 1.0); each doc "
        "appears floor(w) times plus a Knuth-hash-selected fractional "
        "copy, tagged with a 1-based epoch number. Pure scan-side "
        "generator — no shuffle, no RNG; the oracle regenerates the "
        "same multiset arithmetically.",
    oracle="""
        WITH w AS (
            SELECT doc_id, lang,
                   CASE WHEN lang = 'en' THEN 700
                        WHEN lang = 'de' THEN 1500
                        WHEN lang = 'es' THEN 2300
                        WHEN lang = 'zh' THEN 3500 ELSE 1000 END AS wt,
                   ((doc_id % 2147483648) * 2654435761) % 1000 AS hb
            FROM documents
        ),
        n AS (
            SELECT doc_id, lang,
                   wt // 1000
                   + CASE WHEN hb < wt % 1000 THEN 1 ELSE 0 END AS n_copies
            FROM w
        )
        SELECT doc_id, lang, CAST(epoch AS INT) AS epoch FROM (
            SELECT doc_id, lang,
                   unnest(generate_series(1, n_copies)) AS epoch
            FROM n WHERE n_copies >= 1
        )
        ORDER BY doc_id, epoch
    """,
)
def sp_epoch_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from contacts_etl_phase21_spark.operators.sampling import epoch_mix

    docs = load(spark, sf_dir, "documents")
    return (epoch_mix(docs.select("doc_id", "lang"), "doc_id", "lang",
                      {"en": 700, "de": 1500, "es": 2300, "zh": 3500})
            .select("doc_id", "lang", "epoch")
            .orderBy("doc_id", "epoch"))


# Quantized ANN ---------------------------------------------------------------


@query(
    "ann_quantized_topk",
    survey="LLM-similarity-search(int8)",
    doc="Exact top-10 over int8-quantized embeddings "
        "(similarity_search.quantized_topk): per-vector symmetric "
        "quantization (scale = max|x|/127, floor(x/s + 0.5)), integer "
        "dot products with precomputed integer norms, one double "
        "division at the end — the 4x-smaller memory tier for 100 TB "
        "embedding stores. All pairwise math is exact int64, so the "
        "oracle reproduces every score bit-identically.",
    oracle=e6_oracle("""
        WITH emb AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        sc AS (
            SELECT vec_id, v,
                   greatest(list_max(list_transform(v, x -> abs(x))) / 127.0,
                            1e-12) AS s
            FROM emb
        ),
        qv AS (
            SELECT vec_id,
                   [CAST(floor(v[i] / s + 0.5) AS BIGINT)
                    for i in range(1, len(v) + 1)] AS q
            FROM sc
        ),
        qn AS (
            SELECT vec_id, q,
                   list_sum([q[i] * q[i]
                             for i in range(1, len(q) + 1)]) AS qnorm
            FROM qv
        ),
        qq AS (
            SELECT vec_id AS query_id, q AS q_q, qnorm AS qnorm_q
            FROM qn WHERE vec_id < 10
        ),
        scored AS (
            SELECT qq.query_id, c.vec_id,
                   ROUND(CAST(list_sum([c.q[i] * qq.q_q[i]
                                        for i in range(1, len(c.q) + 1)])
                              AS DOUBLE)
                         / sqrt(CAST(c.qnorm AS DOUBLE)
                                * CAST(qq.qnorm_q AS DOUBLE)), 6) AS qcosine
            FROM qn c CROSS JOIN qq
        )
        SELECT query_id, rank, vec_id, qcosine FROM (
            SELECT query_id, vec_id, qcosine,
                   CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                         ORDER BY qcosine DESC, vec_id ASC) AS INT) AS rank
            FROM scored
        ) WHERE rank <= 10
    """, "qcosine"),
)
def ann_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding")
    return scale_e6(ann.quantized_topk(emb, queries, k=10), "qcosine")


# Vocabulary induction --------------------------------------------------------


@query(
    "ta_vocab_topk",
    survey="LLM-text(vocab)",
    doc="Corpus vocabulary induction (text_analysis.vocab_topk): the "
        "100 most frequent whitespace tokens with occurrence and "
        "document frequencies, rank-ordered — the counting pass behind "
        "tokenizer training. One token-explode groupBy (map-side "
        "combined, countDistinct expanded to a partial-distinct) and a "
        "TakeOrdered top-k; the rank window sees only k rows.",
    oracle="""
        WITH toks AS (
            SELECT doc_id, unnest(string_split(trim(text), ' ')) AS token
            FROM documents
        ),
        counts AS (
            SELECT token, COUNT(*) AS n_occurrences,
                   COUNT(DISTINCT doc_id) AS n_docs
            FROM toks GROUP BY token
        )
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY n_occurrences DESC,
                                       token ASC) AS INT) AS rank,
               token, n_occurrences, n_docs
        FROM counts ORDER BY rank LIMIT 100
    """,
)
def ta_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return ta.vocab_topk(docs, "doc_id", "text", k=100)


# End-to-end corpus curation -------------------------------------------------


@query(
    "curate_corpus",
    survey="LLM-curation(end-to-end)",
    doc="The COMPOSED training-data curation pipeline "
        "(operators/curation.py): quality filter (score >= 90) -> "
        "8-gram benchmark decontamination vs the eval slice "
        "(doc_id % 10 == 0) -> MinHash-LSH keep-first dedup -> "
        "per-language stratified downsampling (en 600 / de 800 "
        "permille) -> md5 shard assignment. One row per surviving "
        "doc: (doc_id, lang, shard). The oracle recomputes every "
        "stage in SQL — quality formula, clamped n-gram overlap, "
        "exact-Jaccard pairs + recursive-CTE closure restricted to "
        "the clean subset, Knuth-hash sampling, md5 shards — so the "
        "whole composition (including stage ORDER) is value-checked "
        "cross-engine. Note the dedup stage's oracle equivalence is "
        "probabilistic for pairs near j = 0.8: the LSH candidate "
        "stage has P(miss) = (1-j^4)^16 < 1e-3 at the threshold "
        "(not exactly 0); no miss occurs on the driver tables.",
    oracle="""
        WITH RECURSIVE
        s AS (
            SELECT doc_id, lang, text,
                   length(text) AS n_chars,
                   len(string_split(trim(text), ' ')) AS n_tokens,
                   len(regexp_extract_all(text, '[^\\w\\s]')) AS n_punct,
                   len(regexp_extract_all(lower(text),
                       '\\b(the|a|of|and|to)\\b')) AS n_stop,
                   length(replace(trim(text), ' ', '')) AS n_nonspace
            FROM documents WHERE doc_id % 10 <> 0
        ),
        qual AS (
            SELECT doc_id, lang, text FROM s WHERE
              (CASE WHEN n_tokens BETWEEN 10 AND 1000 THEN 40 ELSE 0 END)
            + (CASE WHEN ROUND(n_nonspace * 1.0 / n_tokens, 4)
                         BETWEEN 2.0 AND 12.0 THEN 30 ELSE 0 END)
            + (CASE WHEN ROUND(n_stop * 1.0 / n_tokens, 4) > 0
                    THEN 20 ELSE 0 END)
            + (CASE WHEN ROUND(n_punct * 1.0 / n_chars, 4) <= 0.2
                    THEN 10 ELSE 0 END) >= 90
        ),
        wq AS (
            SELECT doc_id, lang, string_split(trim(text), ' ') AS w
            FROM qual
        ),
        gq AS (
            SELECT doc_id,
                   list_distinct([array_to_string(
                       w[i:least(i + 7, len(w))], ' ')
                       for i in range(1, greatest(len(w) - 7, 1) + 1)])
                       AS grams
            FROM wq
        ),
        ev AS (
            SELECT DISTINCT unnest(
                list_distinct([array_to_string(
                    w[i:least(i + 7, len(w))], ' ')
                    for i in range(1, greatest(len(w) - 7, 1) + 1)])) AS gg
            FROM (SELECT string_split(trim(text), ' ') AS w
                  FROM documents WHERE doc_id % 10 = 0)
        ),
        contaminated AS (
            SELECT DISTINCT g.doc_id
            FROM (SELECT doc_id, unnest(grams) AS gg FROM gq) g
            JOIN ev USING (gg)
        ),
        clean AS (
            SELECT doc_id, lang, w FROM wq
            WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
        ),
        sh3 AS (
            SELECT doc_id, lang,
                   list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                  for i in range(1, len(w) - 1)]) AS s3
            FROM clean
        ),
        pairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM sh3 a JOIN sh3 b ON a.doc_id < b.doc_id
            WHERE ROUND(len(list_intersect(a.s3, b.s3)) * 1.0
                        / len(list_distinct(list_concat(a.s3, b.s3))), 6)
                  >= 0.8
        ),
        edges AS (
            SELECT doc_a AS src, doc_b AS dst FROM pairs
            UNION SELECT doc_b, doc_a FROM pairs
        ),
        reach(src, dst) AS (
            SELECT src, dst FROM edges
            UNION
            SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
        ),
        rep AS (SELECT src AS doc_id, MIN(dst) AS mn FROM reach GROUP BY src),
        kept AS (
            SELECT c.doc_id, c.lang FROM sh3 c LEFT JOIN rep r USING (doc_id)
            WHERE COALESCE(LEAST(r.mn, c.doc_id), c.doc_id) = c.doc_id
        ),
        sampled AS (
            SELECT doc_id, lang FROM kept
            WHERE ((doc_id % 2147483648) * 2654435761) % 1000 <
                  CASE WHEN lang = 'en' THEN 600
                       WHEN lang = 'de' THEN 800 ELSE 1000 END
        )
        SELECT doc_id, lang,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                    ::BIGINT % 8 AS BIGINT) AS shard
        FROM sampled ORDER BY doc_id
    """,
)
def curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from contacts_etl_phase21_spark.operators.curation import (
        curate_corpus as _curate,
    )

    docs = load(spark, sf_dir, "documents")
    ev = docs.filter(F.col("doc_id") % 10 == 0)
    train = docs.filter(F.col("doc_id") % 10 != 0)
    return _curate(train, ev, rates_permille={"en": 600, "de": 800})


@query(
    "ta_corpus_stats",
    survey="LLM-text(stats)",
    doc="Corpus report card: per-(lang, source) document/token/char "
        "counts and mean quality score — the audit table a curation "
        "run publishes beside its output. ONE groupBy over scan-side "
        "column arithmetic (map-side combined; 100 groups out of the "
        "shuffle regardless of corpus size). Registry rule: hashed "
        "outputs carry no raw doubles — mean quality is emitted as a "
        "scaled BIGINT (mean_quality_e4 = round(avg*10000)); the "
        "per-doc scores are integers so the double sum is exact and "
        "order-independent, making the rounding engine-portable. "
        "r07 ROOT CAUSE of the 3-round driver hash-red: this oracle's "
        "bare SUM(BIGINT) returns DuckDB HUGEINT (int128) — the ONLY "
        "two HUGEINT-emitting oracles in the 117-query registry were "
        "exactly the two red rows. DuckDB's pandas conversion renders "
        "HUGEINT as float64 ('123.0'); fetchall() gives int ('123'). "
        "The driver canonicalizes via pandas (its documented sort "
        "contract) — hash red, rows/schema green, follows the "
        "computation not the name, survives every fetchall-based "
        "value check. Fix: CAST(SUM(..) AS BIGINT); guard test "
        "tests/test_oracle_types.py pins the whole registry "
        "HUGEINT-free (PLANS.md r07).",
    oracle="""
        WITH s AS (
            SELECT lang, source,
                   length(text) AS n_chars,
                   len(string_split(trim(text), ' ')) AS n_tokens,
                   len(regexp_extract_all(text, '[^\\w\\s]')) AS n_punct,
                   len(regexp_extract_all(lower(text),
                       '\\b(the|a|of|and|to)\\b')) AS n_stop,
                   length(replace(trim(text), ' ', '')) AS n_nonspace
            FROM documents
        )
        SELECT lang, source,
               COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               CAST(ROUND(AVG(
                 (CASE WHEN n_tokens BETWEEN 10 AND 1000 THEN 40 ELSE 0 END)
               + (CASE WHEN ROUND(n_nonspace * 1.0 / n_tokens, 4)
                            BETWEEN 2.0 AND 12.0 THEN 30 ELSE 0 END)
               + (CASE WHEN ROUND(n_stop * 1.0 / n_tokens, 4) > 0
                       THEN 20 ELSE 0 END)
               + (CASE WHEN ROUND(n_punct * 1.0 / n_chars, 4) <= 0.2
                       THEN 10 ELSE 0 END)) * 10000, 0) AS BIGINT)
                 AS mean_quality_e4
        FROM s GROUP BY lang, source
        ORDER BY lang, source
    """,
)
def ta_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return (docs
            .groupBy("lang", "source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(ta.whitespace_token_count(F.col("text")).cast("long"))
                 .alias("total_tokens"),
                 F.sum(F.length("text").cast("long")).alias("total_chars"),
                 F.round(F.avg(ta.quality_score(F.col("text"))
                               .cast("double")) * 10000, 0)
                 .cast("long").alias("mean_quality_e4"))
            .orderBy("lang", "source"))


@query(
    "ta_corpus_report",
    survey="LLM-text(stats)",
    doc="Fresh-name twin of ta_corpus_stats (r06 diagnostic; the r06 "
        "stale-per-name-state theory was REFUTED when this twin went "
        "red identically). r07 root cause: both twins' oracles were "
        "the registry's only two emitting HUGEINT columns (bare "
        "SUM(BIGINT)), which DuckDB's pandas conversion renders as "
        "float64 ('123.0') while fetchall() gives int ('123') — the "
        "driver hashes through pandas, every value-level re-check "
        "used fetchall. Fixed with CAST(SUM(..) AS BIGINT) on both "
        "names; both kept inside the window so the r07 driver run "
        "confirms the diagnosis on the red set itself. See "
        "ta_corpus_stats doc + PLANS.md r07.",
    oracle="""
        WITH s AS (
            SELECT lang, source,
                   length(text) AS n_chars,
                   len(string_split(trim(text), ' ')) AS n_tokens,
                   len(regexp_extract_all(text, '[^\\w\\s]')) AS n_punct,
                   len(regexp_extract_all(lower(text),
                       '\\b(the|a|of|and|to)\\b')) AS n_stop,
                   length(replace(trim(text), ' ', '')) AS n_nonspace
            FROM documents
        )
        SELECT CAST(lang AS VARCHAR) AS lang,
               CAST(source AS VARCHAR) AS source,
               COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               CAST(ROUND(AVG(
                 (CASE WHEN n_tokens BETWEEN 10 AND 1000 THEN 40 ELSE 0 END)
               + (CASE WHEN ROUND(n_nonspace * 1.0 / n_tokens, 4)
                            BETWEEN 2.0 AND 12.0 THEN 30 ELSE 0 END)
               + (CASE WHEN ROUND(n_stop * 1.0 / n_tokens, 4) > 0
                       THEN 20 ELSE 0 END)
               + (CASE WHEN ROUND(n_punct * 1.0 / n_chars, 4) <= 0.2
                       THEN 10 ELSE 0 END)) * 10000, 0) AS BIGINT)
                 AS mean_quality_e4
        FROM s GROUP BY lang, source
        ORDER BY lang, source
    """,
)
def ta_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return (docs
            .groupBy(F.col("lang").cast("string").alias("lang"),
                     F.col("source").cast("string").alias("source"))
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(ta.whitespace_token_count(F.col("text")).cast("long"))
                 .alias("total_tokens"),
                 F.sum(F.length("text").cast("long")).alias("total_chars"),
                 F.round(F.avg(ta.quality_score(F.col("text"))
                               .cast("double")) * 10000, 0)
                 .cast("long").alias("mean_quality_e4"))
            .orderBy("lang", "source"))


@query(
    "ta_corpus_parts",
    survey="LLM-text(stats-diagnostic)",
    doc="Corpus-report component bisection (judge r06 task #1a): the "
        "same (lang, source) groupBy emitting the RAW regex/split "
        "component sums as exact BIGINTs — SUM of n_tokens, n_chars, "
        "n_punct, n_stop, n_nonspace — with zero ratio/round/avg "
        "arithmetic anywhere. Registered inside the driver window "
        "beside the (now HUGEINT-fixed) report rows: if a report row "
        "ever reds again while this greens, the divergence is in the "
        "mean arithmetic, not the regexes; if this reds, a regex or "
        "split flavor diverges in the driver environment. All sums "
        "CAST to BIGINT (the r07 no-HUGEINT registry rule).",
    oracle="""
        WITH s AS (
            SELECT lang, source,
                   length(text) AS n_chars,
                   len(string_split(trim(text), ' ')) AS n_tokens,
                   len(regexp_extract_all(text, '[^\\w\\s]')) AS n_punct,
                   len(regexp_extract_all(lower(text),
                       '\\b(the|a|of|and|to)\\b')) AS n_stop,
                   length(replace(trim(text), ' ', '')) AS n_nonspace
            FROM documents
        )
        SELECT lang, source,
               COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
               CAST(SUM(n_punct) AS BIGINT) AS sum_punct,
               CAST(SUM(n_stop) AS BIGINT) AS sum_stop,
               CAST(SUM(n_nonspace) AS BIGINT) AS sum_nonspace
        FROM s GROUP BY lang, source
        ORDER BY lang, source
    """,
)
def ta_corpus_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    raw = ta.quality_raw_counts(F.col("text"))
    return (docs
            .groupBy("lang", "source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(raw["n_tokens"].cast("long")).alias("sum_tokens"),
                 F.sum(raw["n_chars"].cast("long")).alias("sum_chars"),
                 F.sum(raw["n_punct"].cast("long")).alias("sum_punct"),
                 F.sum(raw["n_stop"].cast("long")).alias("sum_stop"),
                 F.sum(raw["n_nonspace"].cast("long"))
                 .alias("sum_nonspace"))
            .orderBy("lang", "source"))


@query(
    "ta_corpus_report_nore",
    survey="LLM-text(stats-diagnostic)",
    doc="Regex-free, double-free corpus report (judge r06 task #1b): "
        "the report's shape computed with NO regex and NO floating "
        "point anywhere — tokens by literal-space split, n_punct via "
        "explicit-ASCII-charset translate-length difference, n_stop "
        "by exact token membership, every gate an exact integer "
        "comparison (mean-word-len in [2,12] as 2*n_tok <= n_nonsp "
        "<= 12*n_tok; punct <= 0.2 as 5*n_punct <= n_chars), and the "
        "mean emitted as round-half-up exact integer arithmetic "
        "((20000*sum + n) div (2n)). The gate semantics deliberately "
        "differ from the regex form at boundary values (no ROUND "
        "before comparing) — this is its own query with its own "
        "oracle, immune to regex-flavor and float-rounding divergence "
        "by construction.",
    oracle="""
        WITH s AS (
            SELECT lang, source,
                   length(text) AS n_chars,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE len(string_split(trim(text), ' ')) END
                       AS n_tokens,
                   length(text) - length(translate(text,
                       '!"#$%&''()*+,-./:;<=>?@[\\]^_`{|}~', ''))
                       AS n_punct,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE len(list_filter(
                            string_split(lower(trim(text)), ' '),
                            t -> t IN ('the','a','of','and','to'))) END
                       AS n_stop,
                   length(replace(text, ' ', '')) AS n_nonspace
            FROM documents
        ),
        q AS (
            SELECT lang, source, n_tokens, n_chars,
                   (CASE WHEN n_tokens BETWEEN 10 AND 1000
                         THEN 40 ELSE 0 END)
                 + (CASE WHEN n_tokens > 0
                          AND n_nonspace >= 2 * n_tokens
                          AND n_nonspace <= 12 * n_tokens
                         THEN 30 ELSE 0 END)
                 + (CASE WHEN n_stop > 0 THEN 20 ELSE 0 END)
                 + (CASE WHEN 5 * n_punct <= n_chars
                         THEN 10 ELSE 0 END) AS score
            FROM s
        )
        SELECT lang, source,
               COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               CAST((20000 * CAST(SUM(score) AS BIGINT) + COUNT(*))
                    // (2 * COUNT(*)) AS BIGINT) AS mean_quality_e4
        FROM q GROUP BY lang, source
        ORDER BY lang, source
    """,
)
def ta_corpus_report_nore(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    t = F.trim(F.col("text"))
    n_chars = F.length("text")
    n_tokens = F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, " ")))
    punct_chars = '!"#$%&\'()*+,-./:;<=>?@[\\]^_`{|}~'
    n_punct = n_chars - F.length(F.translate(F.col("text"),
                                             punct_chars, ""))
    stopwords = ("the", "a", "of", "and", "to")
    n_stop = F.when(t == "", F.lit(0)).otherwise(
        F.size(F.filter(F.split(F.lower(t), " "),
                        lambda x: x.isin(*stopwords))))
    n_nonspace = F.length(F.translate(F.col("text"), " ", ""))
    score = (
        F.when((n_tokens >= 10) & (n_tokens <= 1000), 40).otherwise(0)
        + F.when((n_tokens > 0)
                 & (n_nonspace >= 2 * n_tokens)
                 & (n_nonspace <= 12 * n_tokens), 30).otherwise(0)
        + F.when(n_stop > 0, 20).otherwise(0)
        + F.when(5 * n_punct <= n_chars, 10).otherwise(0))
    return (docs
            .groupBy("lang", "source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(n_tokens.cast("long")).alias("total_tokens"),
                 F.sum(n_chars.cast("long")).alias("total_chars"),
                 F.sum(score.cast("long")).alias("sum_q"))
            .select("lang", "source", "n_docs", "total_tokens",
                    "total_chars",
                    F.expr("(20000 * sum_q + n_docs) div (2 * n_docs)")
                    .alias("mean_quality_e4"))
            .orderBy("lang", "source"))


@query(
    "ann_brute_blas_topk",
    survey="LLM-similarity-search(brute-blas)",
    doc="Exact cosine top-10 via the BLAS tier "
        "(similarity_search.brute_force_topk_blas): one numpy GEMM "
        "per Arrow batch against the broadcast query matrix, "
        "per-batch top-k in the kernel, global window over "
        "|batches|x|queries|xk candidates only. Same oracle as "
        "ann_brute_topk — two implementations (declarative zip_with "
        "vs vectorized mapInPandas), one cross-engine check.",
    oracle=e6_oracle("""
        WITH q AS (
            SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS q_vec
            FROM embeddings WHERE vec_id < 10
        ),
        scored AS (
            SELECT q.query_id, e.vec_id,
                   ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.q_vec), 6) AS cosine
            FROM embeddings e CROSS JOIN q
        )
        SELECT query_id, rank, vec_id, cosine FROM (
            SELECT query_id, vec_id, cosine,
                   CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                         ORDER BY cosine DESC, vec_id ASC) AS INT) AS rank
            FROM scored
        ) WHERE rank <= 10
    """, "cosine"),
)
def ann_brute_blas_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding")
    return scale_e6(ann.brute_force_topk_blas(emb, queries, k=10), "cosine")


def _pq_oracle(m: int = 8, d_sub: int = 8, n_codes: int = 32,
               k: int = 10) -> str:
    """DuckDB twin of similarity_search.pq_topk (quantizer='first').

    The chains are generated UNROLLED and left-associative so both
    engines accumulate the doubles in the identical order (a SQL SUM's
    accumulation order is engine-chosen; an unrolled a+b+...+h is
    not); everything downstream of the e6 roundings is exact int64
    (see the PQ section header in operators/similarity_search.py)."""
    # encode argmin key |c|² - 2⟨v,c⟩ (≡ argmin L2²; |v|² shared per
    # row) — matches pq_encode's skey formula term for term so the
    # compared doubles are bit-identical
    edot = " + ".join(
        f"e.v[b.sub*{d_sub}+{i}] * b.cv[{i}]"
        for i in range(1, d_sub + 1))
    bcn2 = " + ".join(
        f"b.cv[{i}] * b.cv[{i}]" for i in range(1, d_sub + 1))
    skey = f"({bcn2}) - 2 * ({edot})"
    dot = " + ".join(
        f"q.v[b.sub*{d_sub}+{i}] * b.cv[{i}]"
        for i in range(1, d_sub + 1))
    cn2 = " + ".join(f"cv[{i}] * cv[{i}]" for i in range(1, d_sub + 1))
    qn2 = " + ".join(
        "CAST(ROUND((" + " + ".join(
            f"v[{s * d_sub + i}] * v[{s * d_sub + i}]"
            for i in range(1, d_sub + 1)) + ") * 1000000, 0) AS BIGINT)"
        for s in range(m))
    score = ("s.num_e6 / SQRT(CAST(q2.qn2_e6 AS DOUBLE)"
             " * CAST(s.xn2_e6 AS DOUBLE))")
    return f"""
        WITH corpus AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        cbv AS (
            SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS code, v
            FROM (SELECT vec_id, v FROM corpus ORDER BY vec_id
                  LIMIT {n_codes})
        ),
        subs AS (SELECT UNNEST(range({m})) AS sub),
        cb AS (
            SELECT s.sub, c.code,
                   c.v[s.sub*{d_sub}+1 : s.sub*{d_sub}+{d_sub}] AS cv
            FROM cbv c CROSS JOIN subs s
        ),
        cbn AS (
            SELECT sub, code,
                   CAST(ROUND(({cn2}) * 1000000, 0) AS BIGINT) AS cn2_e6
            FROM cb
        ),
        enc AS (
            SELECT vec_id, sub, code FROM (
                SELECT e.vec_id, b.sub, b.code,
                       ROW_NUMBER() OVER (
                           PARTITION BY e.vec_id, b.sub
                           ORDER BY ({skey}) ASC, b.code ASC) AS rn
                FROM corpus e CROSS JOIN cb b
            ) WHERE rn = 1
        ),
        q AS (SELECT vec_id AS query_id, v FROM corpus WHERE vec_id < 10),
        adc AS (
            SELECT q.query_id, b.sub, b.code,
                   CAST(ROUND(({dot}) * 1000000, 0) AS BIGINT) AS dot_e6
            FROM q CROSS JOIN cb b
        ),
        qn AS (SELECT query_id, ({qn2}) AS qn2_e6 FROM q),
        scored AS (
            SELECT a.query_id, e.vec_id,
                   SUM(a.dot_e6) AS num_e6,
                   SUM(n.cn2_e6) AS xn2_e6
            FROM enc e
            JOIN adc a ON a.sub = e.sub AND a.code = e.code
            JOIN cbn n ON n.sub = e.sub AND n.code = e.code
            GROUP BY a.query_id, e.vec_id
        )
        SELECT query_id, rank, vec_id, pq_cosine FROM (
            SELECT s.query_id, s.vec_id,
                   ROUND({score}, 6) AS pq_cosine,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY s.query_id
                       ORDER BY ROUND({score}, 6) DESC,
                                s.vec_id ASC) AS INT) AS rank
            FROM scored s JOIN qn q2 USING (query_id)
        ) WHERE rank <= {k}
    """


def _ivfpq_oracle(n_cells: int = 8, n_probe: int = 2, m: int = 8,
                  d_sub: int = 8, n_codes: int = 16, k: int = 10,
                  corpus_pred: str = "TRUE",
                  query_pred: str = "vec_id < 10") -> str:
    """DuckDB twin of similarity_search.ivf_pq_topk_relational.

    Everything derives from the parquet in SQL: coarse centroids =
    first n_cells vectors, residuals = v - c elementwise, residual
    codebooks = residuals of the first n_codes rows sub-sliced. All
    double chains are unrolled left-associative to match the Spark
    side term for term; every cross-engine value is an e6 BIGINT, so
    the num/xn2 aggregations are exact integer sums (see the
    operator's docstring for the full parity argument)."""
    dim = m * d_sub
    cw2 = " + ".join(f"b.cw[{i}] * b.cw[{i}]"
                     for i in range(1, d_sub + 1))
    rdot = " + ".join(f"e.r[b.sub*{d_sub}+{i}] * b.cw[{i}]"
                      for i in range(1, d_sub + 1))
    skey = f"({cw2}) - 2 * ({rdot})"
    cvchain = " + ".join(f"cv[{i}] * cv[{i}]" for i in range(1, dim + 1))
    ccw_chain = " + ".join(f"c.cv[b.sub*{d_sub}+{i}] * b.cw[{i}]"
                           for i in range(1, d_sub + 1))
    qc_chain = " + ".join(f"q.qv[{i}] * c.cv[{i}]"
                          for i in range(1, dim + 1))
    qdot = " + ".join(f"q.qv[b.sub*{d_sub}+{i}] * b.cw[{i}]"
                      for i in range(1, d_sub + 1))
    qn2 = " + ".join(
        "CAST(ROUND((" + " + ".join(
            f"qv[{s * d_sub + i}] * qv[{s * d_sub + i}]"
            for i in range(1, d_sub + 1)) + ") * 1000000, 0) AS BIGINT)"
        for s in range(m))
    score = ("s.num_e6 / SQRT(CAST(n.qn2_e6 AS DOUBLE)"
             " * CAST(s.xn2_e6 AS DOUBLE))")
    return f"""
        WITH emb AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        corp AS (SELECT * FROM emb WHERE {corpus_pred}),
        cents AS (
            SELECT vec_id AS cell, v AS cv FROM corp ORDER BY vec_id
            LIMIT {n_cells}
        ),
        cassign AS (
            SELECT vec_id, v, cell FROM (
                SELECT e.vec_id, e.v, c.cell,
                       ROW_NUMBER() OVER (PARTITION BY e.vec_id
                           ORDER BY list_cosine_similarity(e.v, c.cv) DESC,
                                    c.cell ASC) AS cr
                FROM corp e CROSS JOIN cents c
            ) WHERE cr = 1
        ),
        resf AS (
            SELECT a.vec_id, a.cell,
                   list_transform(generate_series(1, {dim}),
                                  i -> a.v[i] - c.cv[i]) AS r
            FROM cassign a JOIN cents c ON c.cell = a.cell
        ),
        subs AS (SELECT UNNEST(range({m})) AS sub),
        rcb AS (
            SELECT s.sub, rr.code,
                   rr.r[s.sub*{d_sub}+1 : s.sub*{d_sub}+{d_sub}] AS cw
            FROM (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS code, r
                  FROM (SELECT vec_id, r FROM resf ORDER BY vec_id
                        LIMIT {n_codes})) rr
            CROSS JOIN subs s
        ),
        w2 AS (
            SELECT sub, code,
                   CAST(ROUND(({" + ".join(f"cw[{i}] * cw[{i}]"
                                           for i in range(1, d_sub + 1))})
                              * 1000000, 0) AS BIGINT) AS w2_e6
            FROM rcb
        ),
        enc AS (
            SELECT vec_id, cell, sub, code FROM (
                SELECT e.vec_id, e.cell, b.sub, b.code,
                       ROW_NUMBER() OVER (
                           PARTITION BY e.vec_id, b.sub
                           ORDER BY ({skey}) ASC, b.code ASC) AS rn
                FROM resf e CROSS JOIN rcb b
            ) WHERE rn = 1
        ),
        cn2 AS (
            SELECT cell,
                   CAST(ROUND(({cvchain}) * 1000000, 0) AS BIGINT)
                       AS cn2_e6
            FROM cents
        ),
        ccw AS (
            SELECT c.cell, b.sub, b.code,
                   CAST(ROUND(({ccw_chain}) * 1000000, 0) AS BIGINT)
                       AS ccw_e6
            FROM cents c CROSS JOIN rcb b
        ),
        qsrc AS (
            SELECT vec_id AS query_id, v AS qv FROM emb
            WHERE {query_pred}
        ),
        qassign AS (
            SELECT query_id, cell FROM (
                SELECT q.query_id, c.cell,
                       ROW_NUMBER() OVER (PARTITION BY q.query_id
                           ORDER BY list_cosine_similarity(q.qv, c.cv) DESC,
                                    c.cell ASC) AS cr
                FROM qsrc q CROSS JOIN cents c
            ) WHERE cr <= {n_probe}
        ),
        qc AS (
            SELECT q.query_id, a.cell,
                   CAST(ROUND(({qc_chain}) * 1000000, 0) AS BIGINT)
                       AS qc_e6
            FROM qsrc q
            JOIN qassign a ON a.query_id = q.query_id
            JOIN cents c ON c.cell = a.cell
        ),
        adc AS (
            SELECT q.query_id, b.sub, b.code,
                   CAST(ROUND(({qdot}) * 1000000, 0) AS BIGINT) AS dot_e6
            FROM qsrc q CROSS JOIN rcb b
        ),
        qn AS (SELECT query_id, ({qn2}) AS qn2_e6 FROM qsrc),
        scored AS (
            SELECT p.query_id, e.vec_id,
                   p.qc_e6 + SUM(a.dot_e6) AS num_e6,
                   n2.cn2_e6 + 2 * SUM(w.ccw_e6) + SUM(v2.w2_e6)
                       AS xn2_e6
            FROM enc e
            JOIN qc p ON p.cell = e.cell
            JOIN adc a ON a.query_id = p.query_id
                      AND a.sub = e.sub AND a.code = e.code
            JOIN ccw w ON w.cell = e.cell AND w.sub = e.sub
                      AND w.code = e.code
            JOIN w2 v2 ON v2.sub = e.sub AND v2.code = e.code
            JOIN cn2 n2 ON n2.cell = e.cell
            GROUP BY p.query_id, e.vec_id, p.qc_e6, n2.cn2_e6
        )
        SELECT query_id, rank, vec_id, pq_cosine FROM (
            SELECT s.query_id, s.vec_id,
                   ROUND({score}, 6) AS pq_cosine,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY s.query_id
                       ORDER BY ROUND({score}, 6) DESC,
                                s.vec_id ASC) AS INT) AS rank
            FROM scored s JOIN qn n USING (query_id)
        ) WHERE rank <= {k}
    """


@query(
    "ann_ivfpq_topk",
    survey="LLM-similarity-search(ivf-pq)",
    doc="Residual IVF-PQ (IVFADC) top-10, fully relational (r06): "
        "coarse cells prune the scan to n_probe/n_cells, PQ codes on "
        "the RESIDUAL x - centroid shrink each row ~32x, scoring "
        "stays cosine via exact-per-cell qc + integer ADC tables + "
        "the precomputed reconstruction norm "
        "(similarity_search.ivf_pq_topk_relational; "
        "ivf_pq_topk is the kmeans-trained production twin with "
        "exact rerank, measured in BASELINE.md r06). First-n "
        "quantizers keep centroid AND codebook derivable in SQL, so "
        "the oracle reproduces assignment, residuals, encoding, ADC "
        "and rerank end to end; all cross-engine values are e6 "
        "BIGINTs from identically-ordered chains.",
    oracle=e6_oracle(_ivfpq_oracle(), "pq_cosine"),
)
def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding")
    return scale_e6(
        ann.ivf_pq_topk_relational(emb, queries, k=10), "pq_cosine")


@query(
    "ann_pq_topk",
    survey="LLM-similarity-search(pq)",
    doc="Product-quantization ANN scan tier (r06, judge task #3): "
        "m=8 subspaces x 16 codes over the 64-dim embeddings — the "
        "~32x-smaller-scan tier after int8's 4x "
        "(similarity_search.pq_topk). Corpus encoded row-locally "
        "(zero exchanges); queries stay exact and broadcast "
        "e6-integer ADC lookup tables; scoring is m integer map "
        "lookups per pair, so the num/denominator sums are order-"
        "independent int64 and the final double formula is bit-"
        "identical in the DuckDB twin. quantizer='first' (codewords "
        "= first-16 corpus sub-vectors) keeps the whole chain "
        "SQL-derivable; the kmeans-trained variant is the recall "
        "tier the bench measures. Both hot sides run the broadcast-"
        "variable kernels (encode_kernel/table_kernel='blas'): the "
        "declarative inlined-literal twins are the oracle spec and "
        "stay equality-pinned in tests, but as the EXECUTED plan "
        "they exceed janino's 64 KB method limit (whole-stage "
        "codegen cannot split one giant expression) and silently "
        "de-fuse — the r06 codegen audit; plus the r06 plan-size "
        "lesson (32-code literals OOM'd a default-1g driver "
        "session). Kernels ship codebooks once per executor and "
        "reproduce the left-associative chains bit-for-bit.",
    oracle=e6_oracle(_pq_oracle(n_codes=16), "pq_cosine"),
)
def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding")
    return scale_e6(ann.pq_topk(emb, queries, k=10, n_codes=16,
                                encode_kernel="blas",
                                table_kernel="blas"),
                    "pq_cosine")


@query(
    "ta_encode_tokens",
    survey="LLM-text(encode)",
    doc="Dictionary token encoding — the corpus-to-training-ids step: "
        "tokens are mapped to their rank in the induced top-100 "
        "vocabulary (ta_vocab_topk), out-of-vocab -> 0. The vocab is "
        "a BROADCAST dictionary (vocabularies are ~100k entries at "
        "any corpus size), so encoding is a map-side join fused into "
        "the token explode — the corpus is never shuffled. Output is "
        "one (doc_id, pos, token_id) row per token (scalar-typed per "
        "the registry rule; a production sink would re-assemble "
        "arrays at write time).",
    oracle="""
        WITH toks AS (
            SELECT doc_id, string_split(trim(text), ' ') AS w
            FROM documents
        ),
        flat AS (
            SELECT doc_id, u['pos'] AS pos, u['tok'] AS tok FROM (
                SELECT doc_id,
                       unnest([{'pos': i, 'tok': w[i]}
                               for i in range(1, len(w) + 1)]) AS u
                FROM toks)
        ),
        counts AS (
            SELECT tok AS token, COUNT(*) AS n
            FROM flat GROUP BY tok
        ),
        ranked AS (
            SELECT token,
                   CAST(ROW_NUMBER() OVER (ORDER BY n DESC, token ASC)
                        AS INT) AS rank
            FROM counts ORDER BY rank LIMIT 100
        )
        SELECT f.doc_id, CAST(f.pos AS INT) AS pos,
               CAST(COALESCE(r.rank, 0) AS INT) AS token_id
        FROM flat f LEFT JOIN ranked r ON f.tok = r.token
        ORDER BY f.doc_id, f.pos
    """,
)
def ta_encode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import broadcast

    docs = load(spark, sf_dir, "documents")
    vocab = ta.vocab_topk(docs, "doc_id", "text", k=100) \
        .select("token", "rank")
    flat = docs.select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.col("text")), r"\s+"))
        .alias("pos0", "token"))
    return (flat.join(broadcast(vocab), "token", "left")
            .select("doc_id",
                    (F.col("pos0") + 1).cast("int").alias("pos"),
                    F.coalesce(F.col("rank"), F.lit(0)).cast("int")
                    .alias("token_id"))
            .orderBy("doc_id", "pos"))


@query(
    "sp_temperature_mix",
    survey="LLM-sampling(temperature)",
    doc="Temperature-scaled multilingual sampling (r06, XLM-R/mT5 mix "
        "step): per-language keep rates DERIVED from the corpus "
        "(rate_permille = floor(1000*sqrt(n_min/n_lang)), i.e. "
        "alpha=0.5), applied through the Knuth id hash. One tiny "
        "lang-count agg + a broadcast rates join — the corpus never "
        "shuffles. alpha is fixed at 0.5 so the rates ride only on "
        "IEEE-correctly-rounded sqrt/division and the oracle "
        "recomputes the exact row set.",
    oracle="""
        WITH counts AS (
            SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang
        ),
        rates AS (
            SELECT lang,
                   CAST(FLOOR(1000 * SQRT(
                        (SELECT MIN(n) FROM counts) * 1.0 / n))
                        AS BIGINT) AS rate_permille
            FROM counts
        )
        SELECT d.doc_id, d.lang, r.rate_permille
        FROM documents d JOIN rates r USING (lang)
        WHERE ((d.doc_id % 2147483648) * 2654435761) % 1000
              < r.rate_permille
        ORDER BY d.doc_id
    """,
)
def sp_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from contacts_etl_phase21_spark.operators.sampling import (
        temperature_mix,
    )

    docs = load(spark, sf_dir, "documents")
    return temperature_mix(
        docs.select("doc_id", "lang"), "doc_id", "lang") \
        .select("doc_id", "lang", "rate_permille").orderBy("doc_id")


@query(
    "ta_bpe_pair_counts",
    survey="LLM-text(bpe-stats)",
    doc="Iteration-0 BPE trainer statistics (r06): adjacent CHARACTER "
        "pairs weighted by word frequency over the one corpus-scale "
        "(word, count) aggregation — the fully-relational first pass "
        "of tokenizer training (operators/tokenizer_train.py). "
        "Top-20 by (count DESC, pair ASC); ties are totally ordered "
        "so the LIMIT boundary is deterministic on both engines.",
    oracle="""
        WITH w AS (
            SELECT unnest(string_split(trim(text), ' ')) AS word
            FROM documents
        ),
        wf AS (
            SELECT word, COUNT(*) AS cnt FROM w
            WHERE word <> '' GROUP BY word
        ),
        p AS (
            SELECT substr(word, i, 1) AS lft,
                   substr(word, i + 1, 1) AS rgt, cnt
            FROM (SELECT word, cnt,
                         unnest(range(1, length(word))) AS i
                  FROM wf WHERE length(word) >= 2)
        )
        SELECT lft, rgt, CAST(SUM(cnt) AS BIGINT) AS pair_count
        FROM p GROUP BY lft, rgt
        ORDER BY pair_count DESC, lft, rgt LIMIT 20
    """,
)
def ta_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from contacts_etl_phase21_spark.operators.tokenizer_train import (
        char_pair_counts, word_frequencies,
    )

    docs = load(spark, sf_dir, "documents")
    return (char_pair_counts(word_frequencies(docs))
            .orderBy(F.desc("pair_count"), "lft", "rgt").limit(20))


def _langid_model_oracle() -> str:
    """DuckDB twin of ta_language_id_model: trains the SAME char-3-gram
    naive-Bayes model from the SAME fixture rows (shipped inside the
    SQL as a VALUES list — the driver's DuckDB sees only the synthetic
    tables) and scores/argmaxes identically: integer terms
    floor(1e9·(c+1)/(c_lang+V)), misses (n_grams−n_hit)·miss(lang),
    ties (score DESC, lang ASC), 'und' for gramless docs."""
    from contacts_etl_phase21_spark.functions.langid_fixture import (
        langid_fixture_values,
    )

    return f"""
        WITH fixture(lang, sent) AS (VALUES {langid_fixture_values()}),
        fg AS (
            SELECT lang, substr(t, i, 3) AS g FROM (
                SELECT lang, lower(trim(sent)) AS t FROM fixture),
                unnest(range(1, greatest(length(t) - 2, 0) + 1)) AS u(i)
        ),
        cab AS (SELECT g, lang, COUNT(*) AS c FROM fg GROUP BY g, lang),
        clang AS (SELECT lang, SUM(c) AS c_lang FROM cab GROUP BY lang),
        v AS (SELECT COUNT(DISTINCT g) AS v FROM cab),
        model AS (
            SELECT g, lang,
                   CAST(FLOOR(1000000000.0 * (c + 1) / (c_lang + v))
                        AS BIGINT) AS term
            FROM cab JOIN clang USING (lang) CROSS JOIN v),
        missf AS (
            SELECT lang,
                   CAST(FLOOR(1000000000.0 / (c_lang + v)) AS BIGINT)
                       AS miss
            FROM clang CROSS JOIN v),
        dg AS (
            SELECT doc_id, substr(t, i, 3) AS g FROM (
                SELECT doc_id, lower(trim(text)) AS t FROM documents),
                unnest(range(1, greatest(length(t) - 2, 0) + 1)) AS u(i)
        ),
        ng AS (SELECT doc_id, COUNT(*) AS n_grams FROM dg GROUP BY doc_id),
        hits AS (
            SELECT doc_id, lang, COUNT(*) AS n_hit, SUM(term) AS hit_sum
            FROM dg JOIN model USING (g) GROUP BY doc_id, lang),
        grid AS (SELECT ng.doc_id, ng.n_grams, m.lang, m.miss
                 FROM ng CROSS JOIN missf m),
        scored AS (
            SELECT doc_id, lang,
                   CAST(COALESCE(hit_sum, 0)
                        + (n_grams - COALESCE(n_hit, 0)) * miss
                        AS BIGINT) AS score
            FROM grid LEFT JOIN hits USING (doc_id, lang)),
        pred AS (
            SELECT doc_id, lang AS predicted_lang, score AS score_e9
            FROM scored QUALIFY ROW_NUMBER() OVER (
                PARTITION BY doc_id ORDER BY score DESC, lang) = 1)
        SELECT d.doc_id,
               COALESCE(p.predicted_lang, 'und') AS predicted_lang,
               CAST(COALESCE(p.score_e9, 0) AS BIGINT) AS score_e9
        FROM documents d LEFT JOIN pred p USING (doc_id)
        ORDER BY d.doc_id
    """


@query(
    "ta_language_id_model",
    survey="LLM-text(langid-model)",
    doc="Model-based language ID (r08, judge #5): char-3-gram "
        "multinomial naive Bayes trained on the shipped multilingual "
        "fixture (functions/langid_fixture.py), integer-exact scoring "
        "in the bigram-LM design language — per-gram terms "
        "floor(1e9·(c+1)/(c_lang+V)) int64, unseen grams score the "
        "per-language smoothing floor, argmax ties (score DESC, lang "
        "ASC), 'und' for gramless docs. The bounded model broadcasts; "
        "corpus work is one gram explode + broadcast join + one "
        "(doc, lang) groupBy. Beats the tier-0 marker heuristic "
        "10/10 vs 6/10 on held-out fixture sentences (pinned in "
        "tests). Oracle trains the same model from the same fixture "
        "rows carried as a VALUES list.",
    oracle=_langid_model_oracle(),
)
def ta_language_id_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    from contacts_etl_phase21_spark.functions.langid_fixture import (
        LANGID_SENTENCES,
    )

    docs = load(spark, sf_dir, "documents")
    labeled = spark.createDataFrame(LANGID_SENTENCES,
                                    "lang STRING, sent STRING")
    return ta.language_id_model(docs, "doc_id", "text", labeled) \
        .orderBy("doc_id")


def _bpe_merges_oracle(n_merges: int, top_v: int,
                       final: str = "merges", top_k: int = 20) -> str:
    """Certificate oracle for the iterative BPE merge loop (r08 — the
    registry's last oracle-less computation that could have one; the
    f16/er closed-form precedent). DuckDB cannot run the driver-side
    loop, but the loop has a BOUNDED, KNOWN iteration count — so the
    oracle is the loop UNROLLED: n_merges chained MATERIALIZED CTEs,
    each computing step i's argmax pair (count DESC, pair ASC) from
    state i-1 and rewriting the symbol sequences for state i.
    MATERIALIZED is load-bearing: st_i references st_{i-1} twice
    (pair-count + rewrite), so inlined CTEs would expand the plan
    2^n_merges-fold.

    The greedy left-to-right merge application is expressed with plain
    string replace() over a marker encoding: every symbol is wrapped
    \\x01sym\\x02, and merging (l, r) replaces \\x01l\\x02\\x01r\\x02 with
    \\x01lr\\x02. replace() scans left-to-right, skips overlaps, and
    resumes AFTER each replacement — exactly BPE's greedy pass — and
    the paired markers make cross-symbol false matches impossible
    ('xa','b' never matches pattern 'a','b' because \\x01 must
    immediately precede the 'a'). Assumes corpus tokens contain no
    \\x01/\\x02 bytes (control chars; whitespace-split text never
    does). Equality with the Python trainer is pinned exhaustively in
    tests (same argmax, same tie order, same rewrite).

    Degenerate corpora (every word fused to one symbol before
    n_merges) are safe (r08 ADVICE): best_i joins in as LEFT JOIN ON
    TRUE, and when it is empty the COALESCEd search pattern falls back
    to '\\x01\\x01' — two adjacent open-markers, impossible in the
    alternating marker encoding — so replace() is a no-op and st_i
    carries st_{i-1} forward, matching bpe_merges_local's early break
    (the merges UNION simply has no row for that rank).

    final='merges' emits the learned merge list; final='encode' emits
    the top_k words' SEGMENTATIONS after all n_merges (the apply half
    — tokenizer_train.bpe_encode_expr's twin, reading the chain's
    final state instead of its argmax trail)."""
    o, c = chr(1), chr(2)
    ctes = [f"""
        w AS (SELECT unnest(string_split(trim(text), ' ')) AS word
              FROM documents),
        wf AS MATERIALIZED (
            SELECT word, COUNT(*) AS cnt FROM w WHERE word <> ''
            GROUP BY word ORDER BY cnt DESC, word LIMIT {top_v}),
        st0 AS MATERIALIZED (
            SELECT word,
                   [word[i] for i in range(1, len(word)+1)] AS syms, cnt
            FROM wf)"""]
    for i in range(1, n_merges + 1):
        p = i - 1
        ctes.append(f"""
        pc{i} AS (
            SELECT s.syms[j] AS lft, s.syms[j+1] AS rgt, SUM(s.cnt) AS c
            FROM (SELECT syms, cnt, unnest(range(1, len(syms))) AS j
                  FROM st{p} WHERE len(syms) >= 2) s
            GROUP BY lft, rgt),
        best{i} AS MATERIALIZED (
            SELECT lft, rgt, c FROM pc{i}
            ORDER BY c DESC, lft, rgt LIMIT 1),
        st{i} AS MATERIALIZED (
            SELECT word, string_split(o[2:len(o)-1], '{c}{o}') AS syms,
                   cnt
            FROM (SELECT w.word, replace(
                      '{o}' || array_to_string(w.syms, '{c}{o}') || '{c}',
                      COALESCE('{o}' || b.lft || '{c}{o}' || b.rgt
                               || '{c}', '{o}{o}'),
                      COALESCE('{o}' || b.lft || b.rgt || '{c}', '')
                      ) AS o, w.cnt
                  FROM st{p} w LEFT JOIN best{i} b ON TRUE))""")
    if final == "encode":
        return ("WITH " + ",".join(ctes) + f"""
        SELECT word, CAST(cnt AS BIGINT) AS cnt,
               CAST(len(syms) AS INT) AS n_tokens,
               array_to_string(syms, '|') AS tokens
        FROM st{n_merges} ORDER BY cnt DESC, word LIMIT {top_k}""")
    sel = "\n            UNION ALL ".join(
        f"SELECT {i} AS merge_rank, lft, rgt, lft || rgt AS merged, "
        f"CAST(c AS BIGINT) AS pair_count FROM best{i}"
        for i in range(1, n_merges + 1))
    return ("WITH " + ",".join(ctes)
            + f"\n        SELECT * FROM ({sel}) ORDER BY merge_rank")


@query(
    "ta_bpe_train_merges",
    survey="LLM-text(bpe-train)",
    doc="BPE tokenizer training (r06, Sennrich et al. 2016): ONE "
        "distributed (word, count) aggregation, then the merge loop "
        "runs driver-side on the bounded table with incremental pair "
        "counts — the shape real trainers (HF/SentencePiece) use; the "
        "corpus is scanned exactly once regardless of n_merges. "
        "r08: the loop gains a full certificate oracle — the bounded "
        "iteration unrolled into chained MATERIALIZED CTEs, each step "
        "re-deriving the argmax pair and greedily rewriting the "
        "symbol table (see _bpe_merges_oracle) — closing the "
        "registry's last oracle-less computation that can have one "
        "(er_full stays rows-only: uuid5).",
    oracle=_bpe_merges_oracle(30, 50_000),
)
def ta_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from contacts_etl_phase21_spark.operators.tokenizer_train import (
        train_bpe_merges,
    )

    docs = load(spark, sf_dir, "documents")
    return train_bpe_merges(spark, docs, n_merges=30).orderBy("merge_rank")


@query(
    "ta_bpe_encode_words",
    survey="LLM-text(bpe-encode)",
    doc="BPE ENCODE — the apply half of the tokenizer (r08): the top-20 "
        "corpus words segmented by the 30 learned merges, as pure "
        "column expressions (tokenizer_train.bpe_encode_expr: one "
        "regexp wraps chars in paired markers, then 30 codegen'd "
        "literal replaces — string replace's left-to-right overlap-"
        "skipping scan IS BPE's greedy merge pass). The oracle reuses "
        "the unrolled certificate chain and reads its FINAL state, so "
        "train and encode are checked against the same machinery.",
    oracle=_bpe_merges_oracle(30, 50_000, final="encode", top_k=20),
)
def ta_bpe_encode_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    from contacts_etl_phase21_spark.operators.tokenizer_train import (
        bpe_merges_local, encode_words, word_frequencies,
    )

    docs = load(spark, sf_dir, "documents")
    wf = word_frequencies(docs, top_v=50_000)
    pdf = wf.toPandas().sort_values(["cnt", "word"],
                                    ascending=[False, True])
    merges = bpe_merges_local(
        list(zip(pdf["word"].tolist(), pdf["cnt"].tolist())), 30)
    top = wf.orderBy(F.desc("cnt"), "word").limit(20)
    return encode_words(top, merges).orderBy(F.desc("cnt"), "word")


@query(
    "ta_bpe_encode_production",
    survey="LLM-text(bpe-encode-production)",
    doc="BPE ENCODE, production tier (r09, judge #1): the same top-20 "
        "segmentation as ta_bpe_encode_words but through the "
        "broadcast-merges mapInPandas encoder "
        "(tokenizer_train.encode_words_production) — the tier that "
        "survives ~32k-merge tokenizers, where bpe_encode_expr's "
        "chained replaces cannot codegen and scanning every word "
        "against every merge is ~2000x wasted work. The candidate-"
        "heap kernel visits only merges whose operand symbols occur "
        "in the word, in rank order (exact sequential semantics). "
        "Hash-checked against the SAME certificate-chain oracle as "
        "the expression tier, so both tiers are pinned to one "
        "ground truth.",
    oracle=_bpe_merges_oracle(30, 50_000, final="encode", top_k=20),
)
def ta_bpe_encode_production(spark: SparkSession, sf_dir: str) -> DataFrame:
    from contacts_etl_phase21_spark.operators.tokenizer_train import (
        bpe_merges_local, encode_words_production, word_frequencies,
    )

    docs = load(spark, sf_dir, "documents")
    wf = word_frequencies(docs, top_v=50_000)
    pdf = wf.toPandas().sort_values(["cnt", "word"],
                                    ascending=[False, True])
    merges = bpe_merges_local(
        list(zip(pdf["word"].tolist(), pdf["cnt"].tolist())), 30)
    top = wf.orderBy(F.desc("cnt"), "word").limit(20)
    return encode_words_production(top, merges) \
        .orderBy(F.desc("cnt"), "word")


@query(
    "j7_asof_point_in_time",
    survey="J-ext(asof),LLM-events(point-in-time)",
    doc="Distributed as-of join (r06, operators/asof.py): each "
        "purchase event picks up the most recent view (backward-"
        "inclusive, greatest (ts, event_id)) of the same user — the "
        "point-in-time-correct feature join (training rows at time t "
        "see only features with ts <= t; pandas merge_asof / DuckDB "
        "ASOF JOIN semantics). Plan is the two-pass union+carry over "
        "bounded (user, hour-bucket) partitions, never a theta-join "
        "and never one window per user; the oracle is the quadratic "
        "row_number reference with the identical total tie order.",
    oracle=e6_oracle("""
        WITH l AS (
            SELECT event_id, user_id,
                   epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
            FROM events WHERE event_type = 'purchase'
        ),
        r AS (
            SELECT event_id, user_id,
                   epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, value
            FROM events WHERE event_type = 'view'
        ),
        cand AS (
            SELECT l.event_id, r.event_id AS view_event_id,
                   r.ts_us AS view_ts_us, r.value AS view_value,
                   ROW_NUMBER() OVER (PARTITION BY l.event_id
                       ORDER BY r.ts_us DESC, r.event_id DESC) AS rn
            FROM l JOIN r ON l.user_id = r.user_id
                         AND r.ts_us <= l.ts_us
        )
        SELECT l.event_id, l.user_id, l.ts_us,
               c.view_event_id, c.view_ts_us,
               l.ts_us - c.view_ts_us AS gap_us,
               ROUND(c.view_value, 6) AS view_value
        FROM l LEFT JOIN cand c ON c.event_id = l.event_id AND c.rn = 1
        ORDER BY l.event_id
    """, "view_value"),
)
def j7_asof_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    from contacts_etl_phase21_spark.operators.asof import asof_join

    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase") \
        .select("event_id", "user_id", "ts")
    views = ev.filter(F.col("event_type") == "view") \
        .select("event_id", "user_id", "ts", "value")
    out = asof_join(purchases, views, "user_id", "ts",
                    ["value"], "event_id")
    return scale_e6(
        out.select(
            "event_id", "user_id",
            F.unix_micros("ts").alias("ts_us"),
            F.col("event_id_r").alias("view_event_id"),
            F.unix_micros("ts_r").alias("view_ts_us"),
            (F.unix_micros("ts") - F.unix_micros("ts_r")).alias("gap_us"),
            F.round("value_r", 6).alias("view_value"))
        .orderBy("event_id"),
        "view_value")


@query(
    "j8_range_interval_join",
    survey="J-ext(range),LLM-events(window-containment)",
    doc="Distributed range join (r06, operators/range_join.py): click "
        "events matched to the 10-minute error windows ([err.ts, "
        "err.ts+10min], same user) containing them, aggregated to "
        "per-click coverage (n_windows, first covering error id). A "
        "bare BETWEEN join plans as a nested-loop cartesian; here "
        "intervals explode into the coarse buckets they cover (span "
        "== window length -> <=2 buckets each) and the bucket "
        "equi-join enumerates each candidate pair exactly once. The "
        "oracle is the quadratic BETWEEN reference.",
    oracle="""
        WITH p AS (
            SELECT event_id, user_id,
                   epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
            FROM events WHERE event_type = 'click'
        ),
        i AS (
            SELECT event_id AS err_id, user_id,
                   epoch_us(CAST(ts AS TIMESTAMP)) AS s_us,
                   epoch_us(CAST(ts AS TIMESTAMP)) + 600000000 AS e_us
            FROM events WHERE event_type = 'error'
        )
        SELECT p.event_id, p.user_id,
               CAST(COUNT(i.err_id) AS BIGINT) AS n_windows,
               MIN(i.err_id) AS first_err_id
        FROM p LEFT JOIN i
          ON p.user_id = i.user_id AND p.ts_us BETWEEN i.s_us AND i.e_us
        GROUP BY p.event_id, p.user_id
        ORDER BY p.event_id
    """,
)
def j8_range_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from contacts_etl_phase21_spark.operators.range_join import range_join

    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click") \
        .select("event_id", "user_id", "ts")
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"), "user_id",
        F.col("ts").alias("w_start"),
        F.timestamp_micros(F.unix_micros("ts") + 600_000_000)
        .alias("w_end"))
    pairs = range_join(clicks, errors, "user_id", "ts",
                       "w_start", "w_end", bucket_span_us=600_000_000)
    agg = pairs.groupBy("event_id").agg(
        F.count(F.lit(1)).alias("__n"),
        F.min("i_err_id").alias("first_err_id"))
    return (clicks.join(agg, "event_id", "left")
            .select("event_id", "user_id",
                    F.coalesce(F.col("__n"), F.lit(0)).cast("bigint")
                    .alias("n_windows"),
                    "first_err_id")
            .orderBy("event_id"))


@query(
    "j10_interval_overlap_join",
    survey="J-ext(overlap),LLM-events(session-overlap)",
    doc="Interval-OVERLAP join (r07, operators/range_join."
        "interval_overlap_join): 5-minute click sessions matched to "
        "the 10-minute error windows they INTERSECT (same user), "
        "aggregated to per-click coverage. Completes the temporal-join "
        "family (as-of / range / overlap). Both interval sets explode "
        "into covered time buckets; each overlapping pair is claimed "
        "by exactly ONE canonical bucket (the one containing the "
        "overlap's start), so the bucket equi-join needs no post-join "
        "distinct. Oracle is the quadratic theta-join reference with "
        "IS NOT DISTINCT FROM on the key — pinning the operator's "
        "documented eqNullSafe grouping semantics (NULL keys form one "
        "group, as Window.partitionBy would) instead of masking them "
        "behind NULL-free synthetic keys (r07 ADVICE).",
    oracle="""
        WITH c AS (
            SELECT event_id, user_id,
                   epoch_us(CAST(ts AS TIMESTAMP)) AS s_us,
                   epoch_us(CAST(ts AS TIMESTAMP)) + 300000000 AS e_us
            FROM events WHERE event_type = 'click'
        ),
        e AS (
            SELECT event_id AS err_id, user_id,
                   epoch_us(CAST(ts AS TIMESTAMP)) AS s_us,
                   epoch_us(CAST(ts AS TIMESTAMP)) + 600000000 AS e_us
            FROM events WHERE event_type = 'error'
        )
        SELECT c.event_id, c.user_id,
               CAST(COUNT(e.err_id) AS BIGINT) AS n_overlaps,
               MIN(e.err_id) AS first_err_id
        FROM c LEFT JOIN e
          ON c.user_id IS NOT DISTINCT FROM e.user_id
         AND c.s_us <= e.e_us AND e.s_us <= c.e_us
        GROUP BY c.event_id, c.user_id
        ORDER BY c.event_id
    """,
)
def j10_interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from contacts_etl_phase21_spark.operators.range_join import (
        interval_overlap_join,
    )

    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id",
        F.col("ts").alias("c_start"),
        F.timestamp_micros(F.unix_micros("ts") + 300_000_000)
        .alias("c_end"))
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"), "user_id",
        F.col("ts").alias("w_start"),
        F.timestamp_micros(F.unix_micros("ts") + 600_000_000)
        .alias("w_end"))
    pairs = interval_overlap_join(clicks, errors, "user_id",
                                  "c_start", "c_end", "w_start", "w_end",
                                  bucket_span_us=600_000_000)
    agg = pairs.groupBy("event_id").agg(
        F.count(F.lit(1)).alias("__n"),
        F.min("r_err_id").alias("first_err_id"))
    return (clicks.join(agg, "event_id", "left")
            .select("event_id", "user_id",
                    F.coalesce(F.col("__n"), F.lit(0)).cast("bigint")
                    .alias("n_overlaps"),
                    "first_err_id")
            .orderBy("event_id"))


@query(
    "ta_distinct_profile",
    survey="LLM-text(cardinality)",
    doc="Per-language corpus cardinality profile (r06): exact distinct "
        "token count + total tokens via Spark's two-level partial "
        "aggregate (map-side distinct within partitions, one shuffle "
        "of surviving (lang, token) pairs). The 100 TB tier is "
        "approx_count_distinct (native HLL++, one pass, constant "
        "memory per group) — an ESTIMATE, so not hash-checkable; its "
        "documented rsd error bound vs this exact tier is pinned in "
        "tests/test_llm_ops.py instead.",
    oracle="""
        SELECT lang,
               CAST(COUNT(DISTINCT word) AS BIGINT) AS distinct_tokens,
               CAST(COUNT(*) AS BIGINT) AS total_tokens
        FROM (SELECT lang, unnest(string_split(trim(text), ' ')) AS word
              FROM documents) t
        WHERE word <> ''
        GROUP BY lang ORDER BY lang
    """,
)
def ta_distinct_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    words = (docs.select(
        "lang",
        F.explode(F.split(F.trim(F.col("text")), " ")).alias("word"))
        .filter(F.col("word") != ""))
    return (words.groupBy("lang")
            .agg(F.countDistinct("word").alias("distinct_tokens"),
                 F.count(F.lit(1)).alias("total_tokens"))
            .orderBy("lang"))


@query(
    "dd_duplicate_span_fraction",
    survey="LLM-dedup(substring-spans)",
    doc="Substring-level duplicate-span coverage per document (r06, "
        "Lee et al. 2022): overlapping 8-gram at every token "
        "position, grams in >=2 distinct docs mark their positions "
        "duplicated, output = per-doc duplicated-position fraction — "
        "the span-dedup signal the paper's suffix array produces, "
        "distributed as a gram groupBy + equi-join back (grams built "
        "row-locally with the short-doc sequence() guard). Spark "
        "shuffles xxhash64(gram) keys; the oracle joins gram strings "
        "— identical absent 64-bit collisions (the minhash shingle "
        "precedent).",
    oracle=e6_oracle("""
        WITH toks AS (
            SELECT doc_id, string_split(trim(text), ' ') AS w
            FROM documents
        ),
        grams AS (
            SELECT doc_id, i AS pos,
                   array_to_string(w[i:i+7], ' ') AS g
            FROM (SELECT doc_id, w, unnest(range(1, len(w) - 6)) AS i
                  FROM toks)
        ),
        dup AS (
            SELECT g FROM grams
            GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2
        ),
        cov AS (
            SELECT DISTINCT doc_id, cp FROM (
                SELECT gr.doc_id,
                       unnest(range(gr.pos, gr.pos + 8)) AS cp
                FROM grams gr JOIN dup USING (g))
        ),
        per_doc AS (
            SELECT doc_id, COUNT(*) AS dp FROM cov GROUP BY doc_id
        )
        SELECT t.doc_id, CAST(len(t.w) AS INT) AS n_tokens,
               CAST(COALESCE(p.dp, 0) AS INT) AS dup_positions,
               ROUND(COALESCE(p.dp, 0) * 1.0 / len(t.w), 6) AS dup_frac
        FROM toks t LEFT JOIN per_doc p USING (doc_id)
        ORDER BY t.doc_id
    """, "dup_frac"),
)
def dd_duplicate_span_fraction(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return scale_e6(
        dd.duplicate_span_fraction(docs, "doc_id", "text", k=8)
        .orderBy("doc_id"),
        "dup_frac")


@query(
    "dd_remove_duplicate_spans",
    survey="LLM-dedup(substring-removal)",
    doc="The REMOVAL half of Lee et al. 2022's exact-substring "
        "deduplication (r09): every token position covered by a "
        "cross-document duplicated 8-gram is DROPPED and the text "
        "reassembled in order — the corpus-rewriting step the paper "
        "runs with a suffix array, distributed as the span family's "
        "gram groupBy + coverage join plus ONE doc-keyed "
        "reconstruction shuffle (rewriting is inherently a corpus "
        "pass). Fully-covered docs come back as empty strings with "
        "kept_tokens 0 (dropping them is the caller's filter). The "
        "oracle rebuilds with string_agg ORDER BY position over "
        "non-covered tokens.",
    oracle="""
        WITH toks AS (
            SELECT doc_id, string_split(trim(text), ' ') AS w
            FROM documents
        ),
        grams AS (
            SELECT doc_id, i AS pos,
                   array_to_string(w[i:i+7], ' ') AS g
            FROM (SELECT doc_id, w, unnest(range(1, len(w) - 6)) AS i
                  FROM toks)
        ),
        dup AS (
            SELECT g FROM grams
            GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2
        ),
        cov AS (
            SELECT DISTINCT doc_id, cp FROM (
                SELECT gr.doc_id,
                       unnest(range(gr.pos, gr.pos + 8)) AS cp
                FROM grams gr JOIN dup USING (g))
        ),
        tok_rows AS (
            SELECT doc_id, i AS pos, w[i] AS tok
            FROM (SELECT doc_id, w, unnest(range(1, len(w) + 1)) AS i
                  FROM toks)
        ),
        kept AS (
            SELECT t.doc_id, t.pos, t.tok
            FROM tok_rows t LEFT JOIN cov c
              ON t.doc_id = c.doc_id AND t.pos = c.cp
            WHERE c.doc_id IS NULL
        ),
        rebuilt AS (
            SELECT doc_id, COUNT(*) AS kt,
                   string_agg(tok, ' ' ORDER BY pos) AS ct
            FROM kept GROUP BY doc_id
        )
        SELECT t.doc_id, CAST(len(t.w) AS INT) AS n_tokens,
               CAST(COALESCE(r.kt, 0) AS INT) AS kept_tokens,
               COALESCE(r.ct, '') AS cleaned_text
        FROM toks t LEFT JOIN rebuilt r USING (doc_id)
        ORDER BY t.doc_id
    """,
)
def dd_remove_duplicate_spans(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return dd.remove_duplicate_spans(docs, "doc_id", "text", k=8) \
        .orderBy("doc_id")


@query(
    "dd_dedup_lines",
    survey="LLM-dedup(line-keep-first)",
    doc="Cross-document line/paragraph dedup with keep-first semantics "
        "(r10, operators/dedup.dedup_lines_keep_first — the CCNet "
        "paragraph-hash move): a line occurring anywhere else in the "
        "corpus survives only at its first (doc, pos) occurrence; "
        "documents are reassembled in order. One map-side-combined "
        "min-struct groupBy on xxhash64(trim(line)) picks winners "
        "(8-byte shuffle keys — the line text never rides the "
        "corpus-scale shuffle), one equi-join back, one doc-keyed "
        "reconstruction shuffle. The driver corpus is single-spaced, "
        "so the row derives a newline-structured corpus first "
        "(non-overlapping 8-token chunks as lines) — identically on "
        "both engines; the oracle keys on the line STRINGS with a "
        "first-occurrence window and rebuilds via string_agg ORDER BY "
        "pos.",
    oracle="""
        WITH toks AS (
            SELECT doc_id, string_split(trim(text), ' ') AS w
            FROM documents
        ),
        lines AS (
            SELECT doc_id, i + 1 AS pos,
                   array_to_string(w[(i*8+1):(i*8+8)], ' ') AS line
            FROM (SELECT doc_id, w,
                         unnest(range(0, GREATEST(
                             CAST(ceil(len(w) / 8.0) AS INT), 1))) AS i
                  FROM toks)
        ),
        flags AS (
            SELECT doc_id, pos, line,
                   ROW_NUMBER() OVER (PARTITION BY trim(line)
                                      ORDER BY doc_id, pos) AS rn
            FROM lines
        ),
        rebuilt AS (
            SELECT doc_id, CAST(COUNT(*) AS INT) AS kept_lines,
                   string_agg(line, chr(10) ORDER BY pos) AS cleaned_text
            FROM flags WHERE rn = 1 GROUP BY doc_id
        ),
        base AS (
            SELECT doc_id,
                   GREATEST(CAST(ceil(len(w) / 8.0) AS INT), 1) AS n_lines
            FROM toks
        )
        SELECT b.doc_id, CAST(b.n_lines AS INT) AS n_lines,
               CAST(COALESCE(r.kept_lines, 0) AS INT) AS kept_lines,
               COALESCE(r.cleaned_text, '') AS cleaned_text
        FROM base b LEFT JOIN rebuilt r USING (doc_id)
        ORDER BY b.doc_id
    """,
)
def dd_dedup_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return dd.dedup_lines_keep_first(_relined(docs), "doc_id", "text") \
        .orderBy("doc_id")


def _relined(docs: DataFrame) -> DataFrame:
    """Newline-structured twin of the single-spaced driver corpus
    (non-overlapping 8-token chunks as lines) — derived identically by
    the DuckDB twins, the line family's shared fixture."""
    w = F.split(F.trim(F.col("text")), " ")
    nch = F.greatest(F.ceil(F.size(w) / F.lit(8)), F.lit(1)).cast("int")
    lined = F.array_join(
        F.transform(F.sequence(F.lit(0), nch - 1),
                    lambda i: F.array_join(
                        F.slice(w, i * 8 + 1, 8), " ")),
        "\n")
    return docs.select("doc_id", lined.alias("text"))


@query(
    "dd_cross_corpus_line_dedup",
    survey="LLM-dedup(line-cross-corpus)",
    doc="Line dedup of an arriving batch against the STORED corpus "
        "line index (r10 s2 — the line family's incremental production "
        "form): a batch line already anywhere in the indexed corpus "
        "(even doc_ids here) is removed from every batch doc (the "
        "corpus owns it); among the remainder keep-first by (doc, pos) "
        "within the batch (odd doc_ids). Batch lines anti-join the "
        "index on the 8-byte hash; election + rebuild run on "
        "batch-sized frames; corpus text is never read. The oracle "
        "recomputes both rules on the line strings.",
    oracle="""
        WITH toks AS (
            SELECT doc_id, string_split(trim(text), ' ') AS w
            FROM documents
        ),
        lines AS (
            SELECT doc_id, i + 1 AS pos,
                   array_to_string(w[(i*8+1):(i*8+8)], ' ') AS line
            FROM (SELECT doc_id, w,
                         unnest(range(0, GREATEST(
                             CAST(ceil(len(w) / 8.0) AS INT), 1))) AS i
                  FROM toks)
        ),
        corpus_keys AS (
            SELECT DISTINCT trim(line) AS key FROM lines
            WHERE doc_id % 2 = 0
        ),
        surv AS (
            SELECT b.doc_id, b.pos, b.line
            FROM lines b LEFT JOIN corpus_keys c
              ON trim(b.line) = c.key
            WHERE b.doc_id % 2 = 1 AND c.key IS NULL
        ),
        flags AS (
            SELECT doc_id, pos, line,
                   ROW_NUMBER() OVER (PARTITION BY trim(line)
                                      ORDER BY doc_id, pos) AS rn
            FROM surv
        ),
        rebuilt AS (
            SELECT doc_id, CAST(COUNT(*) AS INT) AS kept_lines,
                   string_agg(line, chr(10) ORDER BY pos) AS cleaned_text
            FROM flags WHERE rn = 1 GROUP BY doc_id
        ),
        base AS (
            SELECT doc_id,
                   GREATEST(CAST(ceil(len(w) / 8.0) AS INT), 1) AS n_lines
            FROM toks WHERE doc_id % 2 = 1
        )
        SELECT b.doc_id, CAST(b.n_lines AS INT) AS n_lines,
               CAST(COALESCE(r.kept_lines, 0) AS INT) AS kept_lines,
               COALESCE(r.cleaned_text, '') AS cleaned_text
        FROM base b LEFT JOIN rebuilt r USING (doc_id)
        ORDER BY b.doc_id
    """,
)
def dd_cross_corpus_line_dedup(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    docs = _relined(load(spark, sf_dir, "documents"))
    idx = dd.line_index(docs.filter(F.col("doc_id") % 2 == 0),
                        "doc_id", "text")
    out = dd.cross_corpus_line_dedup(
        docs.filter(F.col("doc_id") % 2 == 1), idx,
        "doc_id", "text").orderBy("doc_id")
    return dd._carry_cached(out, [idx])


@query(
    "ta_bigram_lm_scores",
    survey="LLM-text(lm-quality)",
    doc="LM-based quality scoring (r06, the CCNet shape with a "
        "distributed self-trained bigram model instead of KenLM): "
        "corpus-level transition counts -> per-doc average transition "
        "probability. Engine-exact without logs: per-transition terms "
        "are floor(1e6*c_ab/c_a) int64, so the per-doc sum is an "
        "order-independent integer and avg = floor(sum/n) is "
        "bit-identical in DuckDB (IEEE exact-rounds div/mul, NOT ln).",
    oracle="""
        WITH toks AS (
            SELECT doc_id, string_split(trim(text), ' ') AS w
            FROM documents
        ),
        bg AS (
            SELECT doc_id, w[i] AS lft, w[i] || ' ' || w[i+1] AS bigram
            FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i
                  FROM toks)
        ),
        cab AS (
            SELECT lft, bigram, COUNT(*) AS c_ab
            FROM bg GROUP BY lft, bigram
        ),
        ca AS (SELECT lft, SUM(c_ab) AS c_l FROM cab GROUP BY lft),
        -- top-M cap mirrors the Spark side's default top_m=1e6
        -- (r07 ADVICE: an uncapped oracle model would silently
        -- diverge on any corpus with >1M distinct bigrams); same
        -- (c_ab DESC, bigram ASC) total order, and the scoring join
        -- is LEFT with term 0 on miss — the capped semantics.
        model AS (
            SELECT bigram, term_e6 FROM (
                SELECT bigram, c_ab,
                       CAST(FLOOR(1000000.0 * c_ab / c_l) AS BIGINT)
                       AS term_e6
                FROM cab JOIN ca USING (lft)
                ORDER BY c_ab DESC, bigram LIMIT 1000000)
        ),
        scored AS (
            SELECT bg.doc_id, COUNT(*) AS n_bigrams,
                   SUM(COALESCE(m.term_e6, 0)) AS sum_e6
            FROM bg LEFT JOIN model m USING (bigram)
            GROUP BY bg.doc_id
        )
        SELECT t.doc_id,
               CAST(COALESCE(s.n_bigrams, 0) AS INT) AS n_bigrams,
               CAST(FLOOR(s.sum_e6 * 1.0 / s.n_bigrams) AS BIGINT)
               AS avg_p_e6
        FROM toks t LEFT JOIN scored s USING (doc_id)
        ORDER BY t.doc_id
    """,
)
def ta_bigram_lm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return ta.bigram_lm_scores(docs, "doc_id", "text").orderBy("doc_id")


@query(
    "sp_chunk_overlap",
    survey="LLM-sample(chunking)",
    doc="Sliding-window document chunking (r06, operators/sampling."
        "chunk_overlap): overlapping 64-token windows at stride 48 — "
        "the context-window prep for embedding models / long-doc "
        "training; consecutive chunks share 16 tokens, every token "
        "covered, final chunk may be short. Pure scan-side generator "
        "(row-local tokenize, sequence() of starts, one explode) — no "
        "shuffle, no Python, the epoch_mix plan family.",
    oracle="""
        WITH toks AS (
            SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
            FROM documents WHERE trim(text) <> ''
        ),
        starts AS (
            SELECT doc_id, w,
                   unnest(range(0, (len(w) + 47) // 48)) AS i
            FROM toks
        )
        SELECT doc_id, CAST(i AS INT) AS chunk_id,
               CAST(i * 48 AS INT) AS start_tok,
               CAST(LEAST(64, len(w) - i * 48) AS INT) AS n_chunk_toks,
               array_to_string(w[i*48 + 1 : LEAST(i*48 + 64, len(w))],
                               ' ') AS chunk_text
        FROM starts
        ORDER BY doc_id, chunk_id
    """,
)
def sp_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from contacts_etl_phase21_spark.operators.sampling import chunk_overlap

    docs = load(spark, sf_dir, "documents")
    return chunk_overlap(docs, "doc_id", "text", size=64, stride=48) \
        .orderBy("doc_id", "chunk_id")


@query(
    "ta_length_quantiles",
    survey="LLM-text(length-profile)",
    doc="Per-language EXACT token-length quantile profile (r06, "
        "operators/text_analysis.token_length_quantiles): p25/p50/"
        "p75/p95 whitespace-token counts plus min/max — the length "
        "distribution a curation run reads before choosing context "
        "budgets. Quantile = value at zero-based index "
        "(n-1)*q div 100 (discrete, integer-only; interpolation would "
        "ride on engine-divergent double rounding). Scale: corpus "
        "collapses map-side to a (lang, length) histogram bounded by "
        "max doc length; the cumulative window and rank probes run on "
        "that tiny frame, never a per-language window over documents. "
        "The one-pass 100 TB tier is percentile_approx (mergeable GK "
        "sketch) — an estimate, so it is rank-error-bound-tested vs "
        "this exact tier instead of oracle-gated.",
    oracle="""
        WITH lens AS (
            SELECT lang AS stratum,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE len(regexp_split_to_array(trim(text),
                                                       '\\s+')) END
                       AS n_tok
            FROM documents
        ),
        hist AS (
            SELECT stratum, n_tok, COUNT(*) AS c
            FROM lens GROUP BY stratum, n_tok
        ),
        cum AS (
            SELECT stratum, n_tok, c,
                   SUM(c) OVER (PARTITION BY stratum ORDER BY n_tok
                                ROWS UNBOUNDED PRECEDING) AS cum,
                   SUM(c) OVER (PARTITION BY stratum) AS n_docs
            FROM hist
        )
        SELECT stratum, CAST(n_docs AS BIGINT) AS n_docs,
               CAST(MIN(n_tok) AS BIGINT) AS min_tok,
               CAST(MIN(CASE WHEN cum >= ((n_docs - 1) * 25) // 100 + 1
                        THEN n_tok END) AS BIGINT) AS p25,
               CAST(MIN(CASE WHEN cum >= ((n_docs - 1) * 50) // 100 + 1
                        THEN n_tok END) AS BIGINT) AS p50,
               CAST(MIN(CASE WHEN cum >= ((n_docs - 1) * 75) // 100 + 1
                        THEN n_tok END) AS BIGINT) AS p75,
               CAST(MIN(CASE WHEN cum >= ((n_docs - 1) * 95) // 100 + 1
                        THEN n_tok END) AS BIGINT) AS p95,
               CAST(MAX(n_tok) AS BIGINT) AS max_tok
        FROM cum GROUP BY stratum, n_docs
        ORDER BY stratum
    """,
)
def ta_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    out = ta.token_length_quantiles(docs, "text", "lang")
    return (out.select("stratum", F.col("n_docs").cast("long"),
                       "min_tok", "p25", "p50", "p75", "p95", "max_tok")
            .orderBy("stratum"))


_DUCK_DSIR = """
        toks AS (
            SELECT doc_id, lang, string_split(trim(text), ' ') AS w
            FROM documents
        ),
        grams AS (
            SELECT doc_id, lang, w[i] AS g
            FROM (SELECT doc_id, lang, w,
                         unnest(range(1, len(w) + 1)) AS i FROM toks)
            UNION ALL
            SELECT doc_id, lang, w[i] || ' ' || w[i+1] AS g
            FROM (SELECT doc_id, lang, w,
                         unnest(range(1, len(w))) AS i FROM toks)
        ),
        gb AS (
            SELECT doc_id, lang,
                   ('0x' || substr(md5(g), 1, 8))::BIGINT % 4096 AS bucket
            FROM grams
        ),
        cnt AS (
            SELECT bucket, COUNT(*) AS c_r,
                   SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS c_t
            FROM gb GROUP BY bucket
        ),
        tot AS (SELECT SUM(c_r) AS n_r, SUM(c_t) AS n_t FROM cnt),
        ratio AS (
            SELECT bucket,
                   (1000000 * (c_t + 1) * (n_r + 4096))
                   // ((c_r + 1) * (n_t + 4096)) AS ratio_e6
            FROM cnt, tot
        ),
        scored AS (
            SELECT gb.doc_id, COUNT(*) AS n_grams,
                   SUM(r.ratio_e6) AS sum_e6
            FROM gb JOIN ratio r USING (bucket)
            GROUP BY gb.doc_id
        )
"""


@query(
    "sp_dsir_weights",
    survey="LLM-sample(dsir-importance)",
    doc="DSIR importance weights (r06, operators/importance.py; Xie "
        "et al. 2023 arXiv 2302.03169): every document scored by the "
        "mean target/raw likelihood ratio of its hashed unigram+bigram "
        "buckets — target domain here = lang='en', raw = the whole "
        "corpus. Engine-exact by construction: md5-prefix buckets "
        "(shard_id's portable hash — bucket identity changes counts, "
        "so xxhash64 would break the oracle), Laplace-smoothed ratios "
        "via INTEGER division only, arithmetic-mean score (no logs — "
        "ln is not IEEE-exactly-rounded; the bigram-LM precedent). "
        "Scale: gram counts collapse map-side to <=4096 bucket rows, "
        "the ratio table broadcasts back, one per-doc shuffle.",
    oracle="""
        WITH """ + _DUCK_DSIR + """
        SELECT d.doc_id, d.lang,
               CAST(COALESCE(s.n_grams, 0) AS INT) AS n_grams,
               CAST(COALESCE(s.sum_e6 // s.n_grams, 0) AS BIGINT)
                   AS score_e6
        FROM documents d LEFT JOIN scored s USING (doc_id)
        ORDER BY d.doc_id
    """,
)
def sp_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from contacts_etl_phase21_spark.operators.importance import (
        importance_weights,
    )

    docs = load(spark, sf_dir, "documents") \
        .withColumn("__is_target", F.col("lang") == "en")
    w = importance_weights(docs, "doc_id", "text", "__is_target",
                           n_buckets=4096)
    return (docs.select("doc_id", "lang").join(w, "doc_id")
            .select("doc_id", "lang", "n_grams", "score_e6")
            .orderBy("doc_id"))


@query(
    "sp_dsir_topk",
    survey="LLM-sample(dsir-select)",
    doc="DSIR top-k selection (operators/importance.dsir_select): keep "
        "the 100 most target-like documents by (score_e6 desc, doc_id "
        "asc) — the deterministic substitute for the paper's Gumbel "
        "resampling. Plans as TakeOrdered (per-partition top-k heaps, "
        "driver merges k*|parts| rows) — the corpus is never globally "
        "sorted; the rank window runs over the 100 survivors only.",
    oracle="""
        WITH """ + _DUCK_DSIR + """,
        ranked AS (
            SELECT ROW_NUMBER() OVER (ORDER BY s.sum_e6 // s.n_grams
                       DESC, s.doc_id ASC) AS sel_rank,
                   s.doc_id, s.n_grams, s.sum_e6 // s.n_grams AS sc
            FROM scored s
        )
        SELECT CAST(sel_rank AS INT) AS sel_rank, doc_id,
               CAST(n_grams AS INT) AS n_grams,
               CAST(sc AS BIGINT) AS score_e6
        FROM ranked WHERE sel_rank <= 100
        ORDER BY sel_rank
    """,
)
def sp_dsir_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from contacts_etl_phase21_spark.operators.importance import (
        dsir_select, importance_weights,
    )

    docs = load(spark, sf_dir, "documents") \
        .withColumn("__is_target", F.col("lang") == "en")
    w = importance_weights(docs, "doc_id", "text", "__is_target",
                           n_buckets=4096)
    return dsir_select(w, "doc_id", 100)


@query(
    "j9_asof_forward_within",
    survey="J-ext(asof-forward),LLM-events(attribution)",
    doc="Forward as-of join with tolerance (r06, operators/asof.py "
        "direction='forward'): each purchase picks up the NEXT view "
        "of the same user within 1 hour (smallest (ts, event_id) with "
        "view.ts >= purchase.ts) — the conversion-lag / attribution "
        "shape, pandas merge_asof direction='forward'. Same two-pass "
        "bounded-bucket plan as j7 mirrored (first-over-following "
        "windows, min-struct per bucket, carry from FOLLOWING "
        "buckets); NULL-ts lefts are guarded from inheriting the "
        "first real bucket's carry. Oracle is the quadratic "
        "row_number reference with the identical total tie order.",
    oracle=e6_oracle("""
        WITH l AS (
            SELECT event_id, user_id,
                   epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
            FROM events WHERE event_type = 'purchase'
        ),
        r AS (
            SELECT event_id, user_id,
                   epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, value
            FROM events WHERE event_type = 'view'
        ),
        cand AS (
            SELECT l.event_id, r.event_id AS next_view_id,
                   r.ts_us AS next_view_ts_us, r.value AS next_value,
                   ROW_NUMBER() OVER (PARTITION BY l.event_id
                       ORDER BY r.ts_us ASC, r.event_id ASC) AS rn
            FROM l JOIN r ON l.user_id = r.user_id
                         AND r.ts_us >= l.ts_us
                         AND r.ts_us - l.ts_us <= 3600000000
        )
        SELECT l.event_id, l.user_id, l.ts_us,
               c.next_view_id, c.next_view_ts_us,
               c.next_view_ts_us - l.ts_us AS lag_us,
               ROUND(c.next_value, 6) AS next_value
        FROM l LEFT JOIN cand c ON c.event_id = l.event_id AND c.rn = 1
        ORDER BY l.event_id
    """, "next_value"),
)
def j9_asof_forward_within(spark: SparkSession, sf_dir: str) -> DataFrame:
    from contacts_etl_phase21_spark.operators.asof import asof_join

    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase") \
        .select("event_id", "user_id", "ts")
    views = ev.filter(F.col("event_type") == "view") \
        .select("event_id", "user_id", "ts", "value")
    out = asof_join(purchases, views, "user_id", "ts",
                    ["value"], "event_id",
                    tolerance_us=3_600_000_000, direction="forward")
    return scale_e6(
        out.select(
            "event_id", "user_id",
            F.unix_micros("ts").alias("ts_us"),
            F.col("event_id_r").alias("next_view_id"),
            F.unix_micros("ts_r").alias("next_view_ts_us"),
            (F.unix_micros("ts_r") - F.unix_micros("ts"))
            .alias("lag_us"),
            F.round("value_r", 6).alias("next_value"))
        .orderBy("event_id"),
        "next_value")


@query(
    "sp_source_cap",
    survey="LLM-sample(source-cap)",
    doc="Per-source document quota (r06 s4, operators/sampling."
        "cap_per_source): keep at most 10 docs per source, chosen "
        "deterministically by a dedicated md5 window (digits 9-16 — "
        "independent of shard and sample hashes). Scale design is the "
        "hot-block-keys pattern applied to quotas: under-cap sources "
        "bypass every shuffle; over-cap sources are prefiltered by "
        "the uniform hash to ~1.5*cap expected survivors so the "
        "exact rank window holds ~1.5*cap rows per source at ANY "
        "map-task count; a relational fallback re-ranks any source "
        "the prefilter left short, so the result is exact-by-"
        "construction. Measured caveat (BASELINE.md r06 s4): "
        "WindowGroupLimit already map-side-limits a naive rank "
        "window to cap*n_map_tasks rows per source, so the naive "
        "plan is the right default below reducer-memory limits — "
        "this operator is the wide-cluster tier. The oracle is the "
        "naive single QUALIFY over the same (hash, id) order.",
    oracle="""
        SELECT doc_id, source, lang FROM (
            SELECT doc_id, source, lang,
                   ROW_NUMBER() OVER (
                       PARTITION BY source
                       ORDER BY ('0x' || substr(md5(CAST(doc_id AS
                           VARCHAR)), 9, 8))::BIGINT, doc_id) AS r
            FROM documents)
        WHERE r <= 10
        ORDER BY source, doc_id
    """,
)
def sp_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from contacts_etl_phase21_spark.operators.sampling import (
        cap_per_source,
    )

    docs = load(spark, sf_dir, "documents") \
        .select("doc_id", "source", "lang")
    return cap_per_source(docs, "doc_id", "source", cap=10) \
        .orderBy("source", "doc_id")


@query(
    "dd_snapshot_delta",
    survey="LLM-dedup(snapshot-delta)",
    doc="Incremental-crawl snapshot diff (r06 s4, operators/dedup."
        "snapshot_delta): every doc id classified added / removed / "
        "changed / unchanged between two synthetic snapshots (old = "
        "ids with id%10<8; new = ids with id%10>=2, text uppercased "
        "when id%7=0 — so all four classes appear). Content collapses "
        "to an md5 fingerprint in the scan; the only exchange is ONE "
        "full-outer equi-join on id between two (id, fp) projections "
        "— text never ships. This is the work-list an incremental "
        "100 TB pipeline feeds to tokenize/dedup/index so only "
        "added+changed docs re-process.",
    oracle="""
        WITH o AS (
            SELECT doc_id, md5(COALESCE(text, '')) AS old_fp FROM documents
            WHERE doc_id % 10 < 8
        ),
        n AS (
            SELECT doc_id,
                   md5(COALESCE(CASE WHEN doc_id % 7 = 0
                                     THEN upper(text)
                                     ELSE text END, '')) AS new_fp
            FROM documents WHERE doc_id % 10 >= 2
        )
        SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
               CASE WHEN o.doc_id IS NULL THEN 'added'
                    WHEN n.doc_id IS NULL THEN 'removed'
                    WHEN o.old_fp = n.new_fp THEN 'unchanged'
                    ELSE 'changed' END AS status,
               o.old_fp, n.new_fp
        FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
        ORDER BY doc_id
    """,
)
def dd_snapshot_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from contacts_etl_phase21_spark.operators.dedup import snapshot_delta

    docs = load(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 10 < 8) \
        .select("doc_id", "text")
    new = docs.filter(F.col("doc_id") % 10 >= 2).select(
        "doc_id",
        F.when(F.col("doc_id") % 7 == 0, F.upper(F.col("text")))
        .otherwise(F.col("text")).alias("text"))
    return snapshot_delta(old, new, "doc_id", "text") \
        .orderBy("doc_id")


@query(
    "sp_training_export",
    survey="LLM-sample(export-pipeline)",
    doc="Composed training-data EXPORT pipeline (r06 s4): chunk -> "
        "pack -> shard as ONE declarative program, the last mile "
        "after curate_corpus — overlapping 16-token windows at "
        "stride 12 (chunk_overlap, scan-side generator carrying lang "
        "via keep_cols), a composite chunk uid = doc_id*2^20 + "
        "chunk_id (chunk_uid: guarded against chunk_id overflow — "
        "the r06 *1024 form silently collided for >12k-token docs, "
        "and the oracle computed the SAME collision, so hashes could "
        "never catch it; r07 ADVICE), two-pass "
        "prefix-sum packing into 256-token context budgets per "
        "language (pack_sequences — bounded (lang, id-block) "
        "windows, never one task per language), and md5 shard "
        "assignment. Stage ORDER is part of the contract and the "
        "oracle recomputes the whole composition (range() chunks, "
        "naive global-window prefix sum, md5 shards) — equality "
        "proves the scale-safe plans match the naive SQL semantics "
        "end to end, the curate_corpus evidence pattern. At 100 TB "
        "the writer follows with repartition(n,'shard')."
        "write.partitionBy('shard') (the pinned sharded-write path).",
    oracle="""
        WITH toks AS (
            SELECT doc_id, lang,
                   regexp_split_to_array(trim(text), '\\s+') AS w
            FROM documents WHERE trim(text) <> ''
        ),
        chunks AS (
            SELECT doc_id, lang,
                   doc_id * 1048576 + i AS uid,
                   LEAST(16, len(w) - i * 12) AS n_tokens
            FROM (SELECT doc_id, lang, w,
                         unnest(range(0, (len(w) + 11) // 12)) AS i
                  FROM toks)
        ),
        packed AS (
            SELECT lang, uid, n_tokens,
                   COALESCE(SUM(n_tokens) OVER (
                       PARTITION BY lang ORDER BY uid
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS tokens_before
            FROM chunks
        )
        SELECT lang, uid, CAST(n_tokens AS INT) AS n_tokens,
               CAST(tokens_before // 256 AS INT) AS pack_id,
               CAST(('0x' || substr(md5(CAST(uid AS VARCHAR)), 1, 8))
                    ::BIGINT % 8 AS INT) AS shard
        FROM packed
        ORDER BY lang, uid
    """,
)
def sp_training_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    from contacts_etl_phase21_spark.operators.sampling import (
        chunk_overlap, chunk_uid, pack_sequences, shard_id,
    )

    docs = load(spark, sf_dir, "documents")
    chunks = chunk_overlap(docs, "doc_id", "text", size=16, stride=12,
                           keep_cols=["lang"]) \
        .withColumn("uid", chunk_uid(F.col("doc_id"), F.col("chunk_id")))
    packed = pack_sequences(chunks, "lang", "uid",
                            F.col("n_chunk_toks"), budget=256)
    return (packed
            .withColumn("shard",
                        shard_id(F.col("uid"), 8).cast("int"))
            .select("lang", "uid", "n_tokens", "pack_id", "shard")
            .orderBy("lang", "uid"))


@query(
    "sp_pack_rows",
    survey="LLM-sample(pack-materialize)",
    doc="Materialized training sequences (r06 s4, operators/sampling."
        "materialize_packs): the export pipeline's LAST step — every "
        "(lang, pack_id) bin's chunks concatenated in uid order into "
        "one sequence row (seq_text, n_chunks, sum_tokens). Chunk "
        "text rides pack_sequences' pass-1 block window via "
        "carry_cols (no corpus-scale re-join), then ONE shuffle on "
        "(lang, pack_id) assembles sequences — pack groups are "
        "bounded by construction (<= budget + one overflow chunk), "
        "so there is no hot-group risk at any corpus size. In-group "
        "order is sort_array over (uid, text) structs; the oracle's "
        "string_agg(... ORDER BY uid) is the same total order.",
    oracle="""
        WITH toks AS (
            SELECT doc_id, lang,
                   regexp_split_to_array(trim(text), '\\s+') AS w
            FROM documents WHERE trim(text) <> ''
        ),
        chunks AS (
            SELECT doc_id, lang,
                   doc_id * 1048576 + i AS uid,
                   LEAST(16, len(w) - i * 12) AS n_tokens,
                   array_to_string(
                       w[i*12 + 1 : LEAST(i*12 + 16, len(w))], ' ')
                       AS chunk_text
            FROM (SELECT doc_id, lang, w,
                         unnest(range(0, (len(w) + 11) // 12)) AS i
                  FROM toks)
        ),
        packed AS (
            SELECT lang, uid, n_tokens, chunk_text,
                   CAST(COALESCE(SUM(n_tokens) OVER (
                       PARTITION BY lang ORDER BY uid
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) // 256 AS INT) AS pack_id
            FROM chunks
        )
        SELECT lang, pack_id,
               CAST(COUNT(*) AS INT) AS n_chunks,
               CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
               string_agg(chunk_text, ' ' ORDER BY uid) AS seq_text
        FROM packed
        GROUP BY lang, pack_id
        ORDER BY lang, pack_id
    """,
)
def sp_pack_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from contacts_etl_phase21_spark.operators.sampling import (
        chunk_overlap, chunk_uid, materialize_packs,
    )

    docs = load(spark, sf_dir, "documents")
    chunks = chunk_overlap(docs, "doc_id", "text", size=16, stride=12,
                           keep_cols=["lang"]) \
        .withColumn("uid", chunk_uid(F.col("doc_id"), F.col("chunk_id")))
    return materialize_packs(chunks, "lang", "uid", "n_chunk_toks",
                             "chunk_text", budget=256) \
        .orderBy("lang", "pack_id")


@query(
    "ta_ccnet_buckets",
    survey="LLM-text(ccnet-buckets)",
    doc="CCNet head/middle/tail corpus split (r06 s4, operators/"
        "text_analysis.ccnet_buckets; Wenzek et al. 2020): every doc "
        "scored by the corpus bigram LM (the engine-exact KenLM "
        "stand-in, no logs anywhere) and bucketed by its per-language "
        "score terciles — the knob CCNet exposes for how much of the "
        "crawl to keep per language. Terciles are value-at-rank over "
        "the BINNED (lang, score-bin) histogram (bounded by "
        "1e6/bin_e6 rows per language, so the cumulative window "
        "never sees the corpus — CCNet itself uses histogram "
        "percentiles), threshold = MAX bin whose desc-cumulative "
        "count reaches floor((n-1)*q/100)+1; all integer, ties share "
        "a bucket, NULL scores land in 'tail' by rule on both "
        "engines.",
    oracle="""
        WITH toks AS (
            SELECT doc_id, lang, string_split(trim(text), ' ') AS w
            FROM documents
        ),
        bg AS (
            SELECT doc_id, w[i] AS lft, w[i] || ' ' || w[i+1] AS bigram
            FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i
                  FROM toks)
        ),
        cab AS (
            SELECT lft, bigram, COUNT(*) AS c_ab
            FROM bg GROUP BY lft, bigram
        ),
        ca AS (SELECT lft, SUM(c_ab) AS c_l FROM cab GROUP BY lft),
        -- top-M cap + LEFT scoring join: the Spark side's capped
        -- default, pinned here too (see ta_bigram_lm_scores).
        model AS (
            SELECT bigram, term_e6 FROM (
                SELECT bigram, c_ab,
                       CAST(FLOOR(1000000.0 * c_ab / c_l) AS BIGINT)
                       AS term_e6
                FROM cab JOIN ca USING (lft)
                ORDER BY c_ab DESC, bigram LIMIT 1000000)
        ),
        scored AS (
            SELECT bg.doc_id, COUNT(*) AS n_bigrams,
                   SUM(COALESCE(m.term_e6, 0)) AS sum_e6
            FROM bg LEFT JOIN model m USING (bigram)
            GROUP BY bg.doc_id
        ),
        sc AS (
            SELECT t.doc_id, t.lang,
                   CAST(FLOOR(s.sum_e6 * 1.0 / s.n_bigrams) AS BIGINT)
                       AS avg_p_e6
            FROM toks t LEFT JOIN scored s USING (doc_id)
        ),
        binned AS (
            SELECT doc_id, lang, avg_p_e6,
                   avg_p_e6 // 100 AS bin FROM sc
        ),
        hist AS (
            SELECT lang, bin, COUNT(*) AS c FROM binned
            WHERE bin IS NOT NULL GROUP BY lang, bin
        ),
        cum AS (
            SELECT lang, bin,
                   SUM(c) OVER (PARTITION BY lang ORDER BY bin DESC
                                ROWS UNBOUNDED PRECEDING) AS cm
            FROM hist
        ),
        tot AS (SELECT lang, SUM(c) AS n FROM hist GROUP BY lang),
        thr AS (
            SELECT c.lang,
                   MAX(CASE WHEN cm >= FLOOR((n-1)*33/100)+1
                            THEN bin END) AS t_head,
                   MAX(CASE WHEN cm >= FLOOR((n-1)*66/100)+1
                            THEN bin END) AS t_mid
            FROM cum c JOIN tot USING (lang) GROUP BY c.lang
        )
        SELECT b.doc_id, b.lang, b.avg_p_e6,
               CASE WHEN b.bin IS NULL THEN 'tail'
                    WHEN b.bin >= t.t_head THEN 'head'
                    WHEN b.bin >= t.t_mid THEN 'middle'
                    ELSE 'tail' END AS bucket
        FROM binned b LEFT JOIN thr t USING (lang)
        ORDER BY b.doc_id
    """,
)
def ta_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return ta.ccnet_buckets(docs, "doc_id", "text", "lang",
                            bin_e6=100).orderBy("doc_id")


# Corpus-refresh ring (r07 session 2) ------------------------------------------


@query(
    "ta_gopher_quality_flags",
    survey="LLM-text(gopher)",
    doc="The full Gopher quality-rule family (Rae et al. 2021, Appx "
        "A) per document: word-count bounds, mean-word-length bounds, "
        "symbol-to-word ratio, alphabetic-word fraction, distinct-"
        "stopword floor, bullet/ellipsis line fractions — each gate "
        "decided with INTEGER arithmetic (10*symbols < words, not a "
        "float compare) so pass/fail is exact cross-engine; ratios "
        "emitted e6/rounded for reporting. One projection over the "
        "scan, no shuffle, no Python (operators/text_analysis."
        "gopher_signals).",
    oracle=e6_oracle("""
        WITH g AS (
            SELECT doc_id,
                   string_split(trim(text), ' ') AS w,
                   len(string_split(trim(text), ' ')) AS n_words,
                   len(replace(trim(text), ' ', '')) AS nonspace,
                   len(text) - len(replace(text, '#', '')) AS n_hash,
                   (len(text) - len(replace(text, '...', ''))) // 3
                       AS n_ellipsis,
                   len(list_intersect(
                       list_distinct(string_split(lower(trim(text)), ' ')),
                       ['the','be','to','of','and','that','have','with']))
                       AS n_stop_distinct,
                   string_split(text, chr(10)) AS lines
            FROM documents
        ),
        g2 AS (
            SELECT doc_id, n_words, nonspace,
                   n_hash + n_ellipsis AS n_symbols, n_stop_distinct,
                   len(list_filter(w,
                       x -> regexp_matches(x, '[A-Za-z]'))) AS alpha_words,
                   len(lines) AS n_lines,
                   len(list_filter(lines,
                       l -> starts_with(ltrim(l), '-')
                            OR starts_with(ltrim(l), '*')
                            OR starts_with(ltrim(l), '•'))) AS bullet_lines,
                   len(list_filter(lines,
                       l -> ends_with(rtrim(l), '...'))) AS ellipsis_lines
            FROM g
        )
        SELECT doc_id,
               CAST(n_words AS INT) AS n_words,
               ROUND(nonspace * 1.0 / n_words, 4) AS mean_word_len,
               ROUND(n_symbols * 1.0 / n_words, 6) AS symbol_ratio,
               ROUND(alpha_words * 1.0 / n_words, 6) AS alpha_ratio,
               CAST(n_stop_distinct AS INT) AS n_stop_distinct,
               ROUND(bullet_lines * 1.0 / n_lines, 6) AS bullet_frac,
               ROUND(ellipsis_lines * 1.0 / n_lines, 6) AS ellipsis_frac,
               CAST(CASE WHEN n_words BETWEEN 50 AND 100000
                    THEN 1 ELSE 0 END AS INT) AS g_words,
               CAST(CASE WHEN n_words > 0 AND nonspace >= 3 * n_words
                          AND nonspace <= 10 * n_words
                    THEN 1 ELSE 0 END AS INT) AS g_mean_wlen,
               CAST(CASE WHEN 10 * n_symbols < n_words
                    THEN 1 ELSE 0 END AS INT) AS g_symbol,
               CAST(CASE WHEN n_words > 0
                          AND 5 * alpha_words >= 4 * n_words
                    THEN 1 ELSE 0 END AS INT) AS g_alpha,
               CAST(CASE WHEN n_stop_distinct >= 2
                    THEN 1 ELSE 0 END AS INT) AS g_stop,
               CAST(CASE WHEN 10 * bullet_lines <= 9 * n_lines
                    THEN 1 ELSE 0 END AS INT) AS g_bullet,
               CAST(CASE WHEN 10 * ellipsis_lines <= 3 * n_lines
                    THEN 1 ELSE 0 END AS INT) AS g_ellipsis,
               CAST(CASE WHEN n_words BETWEEN 50 AND 100000
                          AND n_words > 0 AND nonspace >= 3 * n_words
                          AND nonspace <= 10 * n_words
                          AND 10 * n_symbols < n_words
                          AND 5 * alpha_words >= 4 * n_words
                          AND n_stop_distinct >= 2
                          AND 10 * bullet_lines <= 9 * n_lines
                          AND 10 * ellipsis_lines <= 3 * n_lines
                    THEN 1 ELSE 0 END AS INT) AS pass_gopher
        FROM g2 ORDER BY doc_id
    """, "mean_word_len", "symbol_ratio", "alpha_ratio", "bullet_frac",
        "ellipsis_frac"),
)
def ta_gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    g = ta.gopher_signals(F.col("text"))
    cols = ["n_words", "mean_word_len", "symbol_ratio", "alpha_ratio",
            "n_stop_distinct", "bullet_frac", "ellipsis_frac",
            "g_words", "g_mean_wlen", "g_symbol", "g_alpha", "g_stop",
            "g_bullet", "g_ellipsis", "pass_gopher"]
    return scale_e6(
        docs.select("doc_id", *[g[c].alias(c) for c in cols])
            .orderBy("doc_id"),
        "mean_word_len", "symbol_ratio", "alpha_ratio", "bullet_frac",
        "ellipsis_frac")


@query(
    "dd_dedup_keep_best",
    survey="LLM-dedup(keep-best),E5,E6",
    doc="Near-dedup with QUALITY survivorship (operators/dedup."
        "dedup_keep_best): LSH pairs → connected components → keep the "
        "highest-n_chars doc per duplicate group (ties to min id) — "
        "the survivorship a curation pipeline wants when duplicates "
        "differ in quality and keep-first is an ingestion-order "
        "accident. vs keep_first: one extra groupBy on the component "
        "key (lexicographic struct argmax) + a |components|-row join "
        "back. Oracle recomputes exact-Jaccard transitive closure "
        "with a recursive CTE and the same argmax via ROW_NUMBER.",
    oracle="""
        WITH RECURSIVE
        toks AS (
            SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
        ),
        sh AS (
            SELECT doc_id,
                   list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                  for i in range(1, len(w) - 1)]) AS s
            FROM toks
        ),
        pairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE ROUND(len(list_intersect(a.s, b.s)) * 1.0
                        / len(list_distinct(list_concat(a.s, b.s))), 6)
                  >= 0.8
        ),
        edges AS (
            SELECT doc_a AS src, doc_b AS dst FROM pairs
            UNION SELECT doc_b, doc_a FROM pairs
        ),
        reach(src, dst) AS (
            SELECT src, dst FROM edges
            UNION
            SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
        ),
        rep AS (SELECT src AS doc_id, MIN(dst) AS mn FROM reach GROUP BY src),
        comp AS (
            SELECT d.doc_id,
                   COALESCE(LEAST(r.mn, d.doc_id), d.doc_id) AS comp,
                   d.n_chars
            FROM documents d LEFT JOIN rep r USING (doc_id)
        ),
        best AS (
            SELECT comp, doc_id AS keep_id FROM (
                SELECT comp, doc_id,
                       ROW_NUMBER() OVER (PARTITION BY comp
                           ORDER BY n_chars DESC, doc_id) AS rn
                FROM comp) WHERE rn = 1
        )
        SELECT c.doc_id, CAST(b.keep_id AS BIGINT) AS keep_id,
               CAST(CASE WHEN c.doc_id = b.keep_id THEN 1 ELSE 0 END
                    AS INT) AS kept
        FROM comp c JOIN best b USING (comp)
        ORDER BY c.doc_id
    """,
)
def dd_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return dd.dedup_keep_best(docs, "doc_id", "text",
                              "n_chars").orderBy("doc_id")


@query(
    "dd_cross_corpus_near_dups",
    survey="LLM-dedup(cross-corpus)",
    doc="Incremental cross-corpus near-dedup (operators/dedup."
        "cross_corpus_near_dups): flag NEW-batch docs (doc_id%5=0) "
        "near-duplicating any doc in the existing INDEX corpus (the "
        "rest) — the nightly-ingest dedupe-against-curated operation. "
        "LSH band-bucket equi-join between the sides (never a "
        "self-join); the new batch ≪ index so its buckets and shingle "
        "arrays BROADCAST and the index is probed in the scan. Same "
        "recall argument as dd_minhash_lsh_verified (P(miss) < 1e-3 "
        "at j=0.8), so the oracle is the exact cross-side Jaccard.",
    oracle=e6_oracle("""
        WITH toks AS (
            SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
        ),
        sh AS (
            SELECT doc_id,
                   list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                  for i in range(1, len(w) - 1)]) AS s
            FROM toks
        ),
        newb AS (SELECT * FROM sh WHERE doc_id % 5 = 0),
        idx AS (SELECT * FROM sh WHERE doc_id % 5 <> 0)
        SELECT * FROM (
            SELECT n.doc_id AS new_id, i.doc_id AS index_id,
                   ROUND(len(list_intersect(n.s, i.s)) * 1.0
                         / len(list_distinct(list_concat(n.s, i.s))), 6)
                       AS jaccard
            FROM newb n JOIN idx i ON 1 = 1
        ) WHERE jaccard >= 0.8
        ORDER BY new_id, index_id
    """, "jaccard"),
)
def dd_cross_corpus_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    new = docs.filter(F.col("doc_id") % 5 == 0)
    idx = docs.filter(F.col("doc_id") % 5 != 0)
    return scale_e6(
        dd.cross_corpus_near_dups(new, idx, "doc_id", "text")
          .orderBy("new_id", "index_id"),
        "jaccard")


@query(
    "sp_corpus_refresh",
    survey="LLM-pipeline(refresh)",
    doc="The corpus-refresh ring composed end-to-end, full SQL oracle "
        "(the curate_corpus pattern): tonight's batch (doc_id%5=0) → "
        "Gopher gates (word-count + mean-word-length + the stopword "
        "gate with a CORPUS-DERIVED list — r09, judge #7: the paper's "
        "English list zeroes synthetic corpora, so the refresh ring "
        "derives its 8 stopwords from the corpus's own vocab head "
        "(count DESC, word ASC over lowered tokens) at refresh time, "
        "one bounded aggregation) → drop docs near-duplicating the "
        "existing INDEX corpus (cross_corpus_near_dups, left_anti) → "
        "greedy token-budget selection of the best survivors. Every "
        "stage keeps its standalone scale shape; the oracle "
        "recomputes the whole composition including the derived "
        "stopword list (gates as integer arithmetic, dup set as "
        "exact cross-side Jaccard, selection as one QUALIFY window).",
    oracle="""
        WITH stopw AS (
            SELECT list(word) AS sw FROM (
                SELECT word FROM (
                    SELECT unnest(string_split(trim(lower(text)), ' '))
                        AS word
                    FROM documents) u
                WHERE word <> ''
                GROUP BY word ORDER BY COUNT(*) DESC, word LIMIT 8) t
        ),
        toks AS (
            SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
        ),
        sh AS (
            SELECT doc_id,
                   list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                  for i in range(1, len(w) - 1)]) AS s
            FROM toks
        ),
        gated AS (
            SELECT doc_id, n_chars, text,
                   len(string_split(trim(text), ' ')) AS n_words
            FROM documents, stopw
            WHERE doc_id % 5 = 0
              AND len(string_split(trim(text), ' '))
                  BETWEEN 50 AND 100000
              AND len(replace(trim(text), ' ', ''))
                  >= 3 * len(string_split(trim(text), ' '))
              AND len(replace(trim(text), ' ', ''))
                  <= 10 * len(string_split(trim(text), ' '))
              AND len(list_intersect(
                      list_distinct(string_split(lower(trim(text)), ' ')),
                      stopw.sw)) >= 2
        ),
        dup AS (
            SELECT DISTINCT n.doc_id
            FROM sh n JOIN sh i
              ON n.doc_id % 5 = 0 AND i.doc_id % 5 <> 0
            WHERE ROUND(len(list_intersect(n.s, i.s)) * 1.0
                        / len(list_distinct(list_concat(n.s, i.s))), 6)
                  >= 0.8
        )
        SELECT doc_id, n_chars,
               CAST(n_words AS BIGINT) AS n_tokens,
               CAST(SUM(n_words) OVER (ORDER BY n_chars DESC, doc_id)
                    AS BIGINT) AS cum_tokens
        FROM gated
        WHERE doc_id NOT IN (SELECT doc_id FROM dup)
        QUALIFY cum_tokens <= 2000
        ORDER BY doc_id
    """,
)
def sp_corpus_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from contacts_etl_phase21_spark.operators.sampling import (
        token_budget_select,
    )

    from contacts_etl_phase21_spark.operators.tokenizer_train import (
        word_frequencies,
    )

    docs = load(spark, sf_dir, "documents")
    new = docs.filter(F.col("doc_id") % 5 == 0)
    idx = docs.filter(F.col("doc_id") % 5 != 0)
    # Corpus-derived stopword list (r09, judge #7): the top-8 vocab
    # head over lowered tokens — ONE bounded aggregation (map-side
    # combined, 8 rows back) — stands in for the language-specific
    # paper list so g_stop is meaningful on any corpus.
    stop = tuple(
        r["word"] for r in word_frequencies(
            docs.select(F.lower(F.col("text")).alias("text")),
            top_v=8).collect())
    g = ta.gopher_signals(F.col("text"), stopwords=stop,
                          min_stop_distinct=2)
    # gated is persisted (r11, guide §5): it feeds BOTH the
    # cross-corpus pair builder and the anti-join's left side, and
    # the Gopher-gate regex scan would otherwise evaluate twice.
    gated = (new.select("doc_id", "text", "n_chars",
                        g["g_words"].alias("__gw"),
                        g["g_mean_wlen"].alias("__gm"),
                        g["g_stop"].alias("__gs"))
             .filter((F.col("__gw") == 1) & (F.col("__gm") == 1)
                     & (F.col("__gs") == 1))).persist()
    dups = dd.cross_corpus_near_dups(
        gated.select("doc_id", "text"), idx, "doc_id", "text")
    dup_ids = dups.select(F.col("new_id").alias("doc_id")).distinct()
    survivors = gated.join(dup_ids, "doc_id", "left_anti")
    return dd._carry_cached(
        token_budget_select(
            survivors, "doc_id", "n_chars",
            ta.whitespace_token_count(F.col("text")),
            budget=2_000).orderBy("doc_id"),
        [gated, *getattr(dups, "_cached_intermediates", ())])


@query(
    "sp_token_budget_select",
    survey="LLM-sampling(budget)",
    doc="Greedy token-budget corpus selection (operators/sampling."
        "token_budget_select): order docs by (n_chars DESC, doc_id) "
        "and keep the maximal prefix whose inclusive cumulative token "
        "count fits a 12k budget — fixed-compute training-run "
        "provisioning from a scored corpus. Two-pass prefix sum "
        "blocked on the bucketized SORT KEY (ascending block = "
        "descending rank), so no global single-reducer sort; the "
        "oracle is one QUALIFY window (CAST to BIGINT — window SUM is "
        "HUGEINT in DuckDB, the r07 hash-red lesson).",
    oracle="""
        SELECT doc_id, n_chars,
               CAST(len(string_split(trim(text), ' ')) AS BIGINT)
                   AS n_tokens,
               CAST(SUM(len(string_split(trim(text), ' ')))
                    OVER (ORDER BY n_chars DESC, doc_id) AS BIGINT)
                   AS cum_tokens
        FROM documents
        QUALIFY cum_tokens <= 12000
        ORDER BY doc_id
    """,
)
def sp_token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    from contacts_etl_phase21_spark.operators.sampling import (
        token_budget_select,
    )

    docs = load(spark, sf_dir, "documents")
    return token_budget_select(
        docs, "doc_id", "n_chars",
        ta.whitespace_token_count(F.col("text")),
        budget=12_000).orderBy("doc_id")


# Corpus self-KNN ground truth at k=5, shared by the exact and blocked
# tiers (n_probe = n_cells makes the blocked candidate set complete, so
# both hash against the same SQL).
_DUCK_KNN5 = """
        WITH scored AS (
            SELECT q.vec_id AS query_id, e.vec_id,
                   ROUND(list_cosine_similarity(
                       CAST(e.embedding AS DOUBLE[]),
                       CAST(q.embedding AS DOUBLE[])), 6) AS cosine
            FROM embeddings e JOIN embeddings q ON e.vec_id <> q.vec_id
        )
        SELECT query_id, rank, vec_id, cosine FROM (
            SELECT query_id, vec_id, cosine,
                   CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY cosine DESC, vec_id ASC) AS INT) AS rank
            FROM scored
        ) WHERE rank <= 5
"""


@query(
    "ta_tfidf_top_terms",
    survey="LLM-text-analysis(tfidf)",
    doc="Per-document TF-IDF keyword extraction: top-3 whitespace "
        "tokens per doc by the integer-exact rational score "
        "(tf * 1e6) div doc_freq — ln-free so the cross-engine hash "
        "is exact (the langid-NB trade). Explode → two map-side-"
        "combined groupBys → term join (zipf skew = AQE territory at "
        "corpus scale) → per-doc WindowGroupLimit. Oracle tokenizes "
        "with regexp_split_to_array '\\s+' — the exact twin of "
        "Spark's split(\\s+), so the row stays general beyond the "
        "single-spaced driver corpus (r09 ADVICE #3).",
    oracle="""
        WITH toks AS (
            SELECT doc_id,
                   unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
            FROM documents
        ),
        tf AS (
            SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
            FROM toks GROUP BY doc_id, term
        ),
        dfreq AS (
            SELECT term, CAST(COUNT(*) AS BIGINT) AS doc_freq
            FROM tf GROUP BY term
        ),
        scored AS (
            SELECT t.doc_id, t.term, t.tf, d.doc_freq,
                   CAST(t.tf * 1000000 // d.doc_freq AS BIGINT) AS score_e6
            FROM tf t JOIN dfreq d USING (term)
        )
        SELECT doc_id, rank, term, tf, doc_freq, score_e6 FROM (
            SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                           ORDER BY score_e6 DESC, term ASC) AS INT) AS rank
            FROM scored
        ) WHERE rank <= 3
    """,
)
def ta_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return ta.tfidf_top_terms(docs, "doc_id", "text", k=3)


@query(
    "sp_cluster_balanced_sample",
    survey="LLM-sampling(cluster-balanced)",
    doc="Embedding-cluster-balanced selection: nearest-centroid "
        "assignment (row-local, centroids inlined as a literal; "
        "round-6 cosine argmax so the SQL twin reproduces it exactly) "
        "then a deterministic Knuth-hash head of 10 rows per cluster "
        "(WindowGroupLimit) — the discovered-strata counterpart of "
        "sp_hash_sample_stratified. Seed centroids here are the first "
        "8 vectors by id so the oracle can rebuild them; production "
        "passes kmeans_centroids / train_ivfpq_params rows.",
    oracle="""
        WITH cents AS (
            SELECT vec_id AS cell, CAST(embedding AS DOUBLE[]) AS c_vec
            FROM embeddings WHERE vec_id < 8
        ),
        assigned AS (
            SELECT vec_id, cell FROM (
                SELECT e.vec_id, c.cell,
                       ROW_NUMBER() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY ROUND(list_cosine_similarity(
                                        CAST(e.embedding AS DOUBLE[]),
                                        c.c_vec), 6) DESC,
                                    c.cell ASC) AS rn
                FROM embeddings e CROSS JOIN cents c
            ) WHERE rn = 1
        )
        SELECT cell, rank, vec_id FROM (
            SELECT cell, vec_id,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY cell
                       ORDER BY ((vec_id % 2147483648) * 2654435761)
                                % 4294967296 ASC,
                                vec_id ASC) AS INT) AS rank
            FROM assigned
        ) WHERE rank <= 10
    """,
)
def sp_cluster_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from contacts_etl_phase21_spark.operators.sampling import (
        cluster_balanced_sample,
    )

    emb = load(spark, sf_dir, "embeddings")
    seeds = emb.filter(F.col("vec_id") < 8) \
        .select("vec_id", "embedding").collect()
    cent_rows = [(int(r["vec_id"]), [float(x) for x in r["embedding"]])
                 for r in seeds]
    return cluster_balanced_sample(emb, "vec_id", "embedding", cent_rows,
                                   per_cluster=10, rounded=True)


@query(
    "ann_knn_graph",
    survey="LLM-similarity-search(knn-graph)",
    doc="Exact corpus self-KNN graph (k=5 neighbors per vector, self "
        "excluded) — the adjacency list behind SemDeDup-style graph "
        "pruning and the recall ground truth for the blocked tier. "
        "Bounded-corpus tier: broadcasts the query side (which IS the "
        "corpus); the 100 TB plan is ann_knn_graph_blocked.",
    oracle=e6_oracle(_DUCK_KNN5, "cosine"),
)
def ann_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return scale_e6(
        ann.knn_graph(emb, k=5).withColumn(
            "rank", F.col("rank").cast("int")),
        "cosine")


@query(
    "ann_knn_graph_blocked",
    survey="LLM-similarity-search(knn-graph)",
    doc="Self-KNN through the IVF-blocked plan (cell equi-join of "
        "membership × probe lists — no corpus broadcast, the shape "
        "that rides the cell-partitioned index layout at 100 TB), "
        "run here at n_probe = n_cells so the candidate set is "
        "complete and the output hash-checks against the SAME exact "
        "oracle as ann_knn_graph; the n_probe < n_cells recall trade "
        "is test-pinned (tests/test_scale_patterns.py).",
    oracle=e6_oracle(_DUCK_KNN5, "cosine"),
)
def ann_knn_graph_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return scale_e6(
        ann.knn_graph_ivf(emb, k=5, n_cells=8, n_probe=8,
                          quantizer="first").withColumn(
            "rank", F.col("rank").cast("int")),
        "cosine")


@query(
    "ann_knn_graph_blas",
    survey="LLM-similarity-search(knn-graph)",
    doc="Self-KNN through the production per-cell blocked-GEMM kernel "
        "(knn_graph_ivf_blas: broadcast-matrix assignment, within-cell "
        "BLAS scoring with keep-ties top-k, only ~n*probe*k candidate "
        "rows reach the final window), at full probe on the 'first' "
        "quantizer so it hash-checks against the SAME exact oracle as "
        "the declarative tiers — the dd_semantic_blas_tier move: the "
        "physical plan you would run at 100 TB, certified on the "
        "oracle configuration.",
    oracle=e6_oracle(_DUCK_KNN5, "cosine"),
)
def ann_knn_graph_blas(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return scale_e6(
        ann.knn_graph_ivf_blas(emb, k=5, n_cells=8, n_probe=8,
                               quantizer="first"),
        "cosine")


@query(
    "ann_knn_graph_spill",
    survey="LLM-similarity-search(knn-graph)",
    doc="r10: the SOAR-style spill path (boundary vectors enrolled in "
        "their 2nd-nearest cell when the cosine margin < 0.3, "
        "candidate distinct() before the global window) at FULL "
        "probe, where the spilled candidate set is a superset that "
        "dedups back to the complete set — so it hash-checks against "
        "the SAME exact oracle. The recall-vs-scan payoff at partial "
        "probe is measured in BASELINE r10 (10⁵/64: 0.938 → 1.0 at "
        "probe 2; 10⁶/256: 0.511 → 0.722 at probe 2, with the "
        "measured cells-per-cluster selectivity lesson) and "
        "test-pinned monotone.",
    oracle=e6_oracle(_DUCK_KNN5, "cosine"),
)
def ann_knn_graph_spill(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return scale_e6(
        ann.knn_graph_ivf_blas(emb, k=5, n_cells=8, n_probe=8,
                               quantizer="first", spill_margin=0.3),
        "cosine")


@query(
    "ann_knn_graph_guarded",
    survey="LLM-similarity-search(knn-graph)",
    doc="r10: the max_cell degenerate-quantizer guard active (cells "
        "above 32 members/probers salt into hash sub-blocks, every "
        "pandas task bounded) on the same full-probe config — the "
        "first-8 cells of the driver corpus all exceed the cap, so "
        "every cell takes the salted (cell, mb, pb) path and the "
        "output still hash-checks against the exact oracle.",
    oracle=e6_oracle(_DUCK_KNN5, "cosine"),
)
def ann_knn_graph_guarded(spark: SparkSession, sf_dir: str
                          ) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return scale_e6(
        ann.knn_graph_ivf_blas(emb, k=5, n_cells=8, n_probe=8,
                               quantizer="first", max_cell=32),
        "cosine")


# Brute-force labeled hard-negative oracle, shared by the relational
# and GEMM-kernel tiers (full probe makes both candidate sets complete).
_DUCK_HARDNEG = """
        WITH scored AS (
            SELECT q.vec_id AS query_id, e.vec_id, e.label,
                   ROUND(list_cosine_similarity(
                       CAST(e.embedding AS DOUBLE[]),
                       CAST(q.embedding AS DOUBLE[])), 6) AS cosine
            FROM embeddings e JOIN embeddings q
              ON e.vec_id <> q.vec_id AND e.label <> q.label
        )
        SELECT query_id, rank, vec_id, label, cosine FROM (
            SELECT query_id, vec_id, label, cosine,
                   CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY cosine DESC, vec_id ASC) AS INT) AS rank
            FROM scored WHERE cosine < 0.98
        ) WHERE rank <= 5
"""


@query(
    "ann_hard_negatives",
    survey="LLM-similarity-search(hard-negatives)",
    doc="Hard-negative mining for contrastive/metric training (r10): "
        "per anchor the top-5 highest-cosine DIFFERENT-label vectors, "
        "with cosine >= 0.98 excluded BEFORE ranking (the SimCSE-style "
        "false-negative filter: an almost-identical cross-label pair "
        "is a labeling problem, not a hard negative). Same IVF-blocked "
        "plan as the self-KNN graph — label-mismatch + self filters "
        "evaluate in the cell equi-join's projection, so same-label "
        "candidates never reach the cosine — run at full probe so the "
        "candidate set is complete and the brute-force labeled oracle "
        "applies exactly.",
    oracle=e6_oracle(_DUCK_HARDNEG, "cosine"),
)
def ann_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return scale_e6(
        ann.hard_negatives(emb, m=5, n_cells=8, quantizer="first",
                           max_cos=0.98),
        "cosine")


@query(
    "ann_hard_negatives_blas",
    survey="LLM-similarity-search(hard-negatives)",
    doc="Hard-negative mining through the production per-cell GEMM "
        "kernel (r10 s2): knn_graph_ivf_blas with the exclude_label / "
        "max_cos kernel masks (same-label and over-band scores -> "
        "-inf BEFORE the top-m heap), labels joined back on the "
        "bounded candidate frame — run at full probe so it "
        "hash-checks against the SAME brute-force labeled oracle as "
        "the relational tier (the dd_semantic_blas_tier certification "
        "move).",
    oracle=e6_oracle(_DUCK_HARDNEG, "cosine"),
)
def ann_hard_negatives_blas(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return scale_e6(
        ann.hard_negatives(emb, m=5, n_cells=8, quantizer="first",
                           max_cos=0.98, kernel="blas"),
        "cosine")
