"""Scale-pattern evidence: salting equivalence and bucketed co-located
joins — the two shuffle-management techniques the 100 TB design leans
on beyond AQE."""

from __future__ import annotations

import pyspark.sql.functions as F

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
