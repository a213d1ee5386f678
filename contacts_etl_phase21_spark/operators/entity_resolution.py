"""Entity resolution as a Spark DataFrame program (SURVEY.md §2.4 E1-E10).

Pipeline shape (reference behavior: combine_contacts.py:1116-1426):

    prepare_for_matching  E1  blocking key + match-feature columns
    candidate_pairs       E2  blocked self-join, rid_l < rid_r
    score_pairs           E3  evidence score (column algebra + one
                              Arrow-batched name-similarity UDF)
    accepted_edges        E4  decision gates as boolean column algebra
    connected_components  E5  iterative min-label propagation
    merge_clusters        E6-E9 survivorship via applyInPandas over the
                              pure merge_core.merge_cluster
    build_lineage         E10 per-source-record provenance rows

Scale design:
- The only quadratic step is within a block (classic blocked similarity
  join); the self-join shuffles both sides on block_key once. Skewed
  keys (common surnames) are handled by AQE skew-join splitting
  (enabled in session.py); truly adversarial blocks can be salted
  upstream without changing semantics because scoring is per-pair.
- Connected components shuffles on id each round; contact-graph
  components are near-cliques (diameter ≤ ~3), so the loop converges in
  3-4 rounds. localCheckpoint cuts lineage per round (on a real cluster
  prefer spark.sparkContext.setCheckpointDir + checkpoint()).
- Survivorship groups by cluster_id (one shuffle); per-cluster work is
  O(cluster size), Arrow-batched, and clusters are small by
  construction, so applyInPandas is not a skew risk.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

from contacts_etl_phase21_spark.functions import merge_core
from contacts_etl_phase21_spark.functions.merge_core import DedupeConfig
from contacts_etl_phase21_spark.functions.similarity import seq_ratio
from contacts_etl_phase21_spark.functions.spark_cols import (
    udf_fold_text, udf_nickname_root,
)
from contacts_etl_phase21_spark.schemas import CONSOLIDATED_SCHEMA

# Ingest order mirrors the reference's loader order (linkedin, gmail,
# mac_vcf) so cluster fold order and pair orientation match.
_SOURCE_ORDER = {"linkedin": 0, "gmail": 1, "mac_vcf": 2}

# ---------------------------------------------------------------------------
# E1: blocking + match features
# ---------------------------------------------------------------------------


def _source_order_col() -> F.Column:
    expr = F.lit(3)
    for name, rank in _SOURCE_ORDER.items():
        expr = F.when(F.lower(F.col("source")) == name, F.lit(rank)) \
            .otherwise(expr)
    return expr


def prepare_for_matching(df: DataFrame) -> DataFrame:
    """Add rid (global ingest-order id), block_key (E1 coalesce chain:
    last_name → full_name → first email → first phone → unique blank),
    and the pure-column match features used by scoring."""
    nonblank = lambda c: F.nullif(c, F.lit(""))  # noqa: E731
    addr = F.filter(
        F.transform(
            F.coalesce("addresses", F.array()),
            lambda a: F.when(
                (F.trim(a["city"]) != "").cast("int")
                + (F.trim(a["state"]) != "").cast("int")
                + (F.trim(a["postal_code"]) != "").cast("int") >= 2,
                F.concat_ws("|", F.lower(F.trim(a["city"])),
                            F.lower(F.trim(a["state"])),
                            F.lower(F.trim(a["postal_code"]))))),
        lambda x: x.isNotNull())
    return (
        df
        .withColumn("rid", _source_order_col().cast("long") * F.lit(1 << 60)
                    + F.coalesce(
                        # numeric ids keep their ingest order, namespaced
                        # below bit 59 so they can never collide with the
                        # hash fallback; ids outside [0, 2^59) fall through
                        # to the hash branch instead of bleeding into the
                        # next source's range
                        F.when(
                            (F.expr("try_cast(source_row_id AS long)")
                             >= 0)
                            & (F.expr("try_cast(source_row_id AS long)")
                               < F.lit(1 << 59)),
                            F.expr("try_cast(source_row_id AS long)")),
                        # pmod (not abs%) is ANSI-safe at Long.MIN_VALUE;
                        # 59 bits pushes the birthday bound to ~2^29.5
                        # records per source — assert_unique_rids guards
                        # the residual risk
                        F.lit(1 << 59)
                        + F.pmod(F.xxhash64("source", "source_row_id"),
                                 F.lit(1 << 59))))
        .withColumn("_fold_last", udf_fold_text(F.col("last_name")))
        .withColumn("_fold_suffix", udf_fold_text(F.col("suffix")))
        # fold/root keys computed ONCE per record here, so pair scoring
        # (quadratic in block size) stays pure column algebra
        .withColumn("_fold_first", udf_fold_text(F.col("first_name")))
        .withColumn("_fold_nick", udf_fold_text(F.col("nickname")))
        .withColumn("_root_first", udf_nickname_root(F.col("first_name")))
        .withColumn("_root_nick", udf_nickname_root(F.col("nickname")))
        .withColumn("email_values", F.transform(
            F.coalesce("emails", F.array()), lambda e: e["value"]))
        .withColumn("phone_values", F.transform(
            F.coalesce("phones", F.array()), lambda p: p["value"]))
        .withColumn("addr_keys", addr)
        .withColumn("block_key", F.coalesce(
            nonblank(F.col("_fold_last")),
            nonblank(udf_fold_text(F.col("full_name"))),
            nonblank(udf_fold_text(F.get("email_values", 0))),
            nonblank(udf_fold_text(F.get("phone_values", 0))),
            F.concat(F.lit("__blank_"), F.col("rid").cast("string"))))
        # _py_trim (≡ Python str.strip), not F.trim: candidacy in the
        # decision gates uses Python-strip semantics, so a name of only
        # non-space whitespace (tab, NBSP, U+001C) must not count as a
        # candidate here either — keeps gate 1/2 aligned with
        # merge_core.first_name_candidates and the streaming path.
        # The regex trim runs HERE, once per record, and the quadratic
        # pair path reads the materialized columns — running it per
        # pair instead measured ~4x on the 10^6 cluster stage.
        .withColumn("_pt_first", _py_trim(F.col("first_name")))
        .withColumn("_pt_nick", _py_trim(F.col("nickname")))
        .withColumn("_lt_first", F.lower(F.col("_pt_first")))
        .withColumn("_lt_nick", F.lower(F.col("_pt_nick")))
        .withColumn("name_candidates", F.array_distinct(F.filter(
            F.array(F.col("_pt_first"), F.col("_pt_nick")),
            lambda x: x != "")))
        # candidate-key SETS: {fold key of each non-empty candidate} and
        # {root key of ...}. The pair-path existential cross-equality
        # (_any_cross_eq: 4 guarded comparisons × fold + × root, and the
        # accept gate references each twice) collapses to ONE
        # arrays_overlap per family — besides being cheaper, this keeps
        # the blocked-pair join's generated code under janino's 64 KB
        # method limit (the inlined 2×16-comparison form pushed the
        # whole-stage span over it and the stage fell back to
        # interpreted execution). Nulls are compacted away: a NULL key
        # never matched under `=` before either.
        .withColumn("_fold_keys", F.array_compact(F.array(
            F.when(F.col("_lt_first") != "", F.col("_fold_first")),
            F.when(F.col("_lt_nick") != "", F.col("_fold_nick")))))
        .withColumn("_root_keys", F.array_compact(F.array(
            F.when(F.col("_lt_first") != "", F.col("_root_first")),
            F.when(F.col("_lt_nick") != "", F.col("_root_nick")))))
    )


# ---------------------------------------------------------------------------
# E2: blocked candidate pairs
# ---------------------------------------------------------------------------

_PAIR_SIDES = (
    "rid", "source", "first_name", "nickname", "last_name", "suffix",
    "linkedin_url", "email_values", "phone_values", "addr_keys",
    "_fold_last", "_fold_suffix", "_fold_keys", "_root_keys",
    "_lt_first", "_lt_nick",
    "name_candidates", "block_key",
)


def duplicate_rids(prepared: DataFrame) -> DataFrame:
    """Colliding rids (two records silently treated as one in pairing /
    components / merge). Non-empty ⇒ abort."""
    return prepared.groupBy("rid").count().filter(F.col("count") > 1)


def assert_unique_rids(prepared: DataFrame) -> None:
    """Guard for the residual birthday risk of the hash-fallback rid
    branch (~2^29.5 records per source at 59 bits) — one cheap
    count-per-key aggregation, run against the cached clustered frame
    in the CLI pipeline."""
    dupes = duplicate_rids(prepared).limit(5).collect()
    if dupes:
        raise ValueError(
            f"rid collision for rids: {[r['rid'] for r in dupes]}")


def candidate_pairs(prepared: DataFrame) -> DataFrame:
    """Self-equi-join on block_key with rid ordering — all i<j pairs per
    block. Blank keys are unique so singletons never pair."""
    left = prepared.select(
        [F.col(c).alias(f"l_{c}") for c in _PAIR_SIDES])
    right = prepared.select(
        [F.col(c).alias(f"r_{c}") for c in _PAIR_SIDES])
    return left.join(
        right, (F.col("l_block_key") == F.col("r_block_key"))
        & (F.col("l_rid") < F.col("r_rid")))


def hot_block_keys(prepared: DataFrame,
                   min_block_size: int = 1000) -> list[str]:
    """Block keys whose member count exceeds min_block_size — the keys
    whose pair generation (|block|^2/2) dominates a reducer. The result
    is tiny by construction (collect of keys over the threshold only);
    feed it to candidate_pairs_salted(hot_keys=...) / cluster_records.

    AQE's skew-join splitting CANNOT fix this shape: it splits by
    shuffle-input partition size, and a hot block is small on input
    (|block| rows) while quadratic on OUTPUT — tools/bench_skew.py
    records the measured difference."""
    return [r["block_key"] for r in
            prepared.groupBy("block_key").count()
            .filter(F.col("count") > min_block_size)
            .select("block_key").collect()]


def candidate_pairs_salted(prepared: DataFrame, n_salt: int = 8,
                           hot_keys: list[str] | None = None) -> DataFrame:
    """candidate_pairs with explicit salting for adversarially hot
    block keys (beyond what AQE skew-splitting handles — AQE splits by
    shuffle-input size, and a hot block is input-small but
    output-quadratic).

    The left side gets a deterministic salt (rid % n_salt); the right
    side is REPLICATED to every salt; the join key becomes
    (block_key, salt). Each (i<j) pair still appears exactly once —
    at j's replica matching i's salt — but a hot block's pair
    generation is spread over n_salt reducers instead of one.

    hot_keys=None salts every block — replication multiplies the whole
    right side's shuffle volume by n_salt, acceptable for a corpus-wide
    skew sweep. With hot_keys (from hot_block_keys), ONLY those blocks
    take the salted path and the rest join plain — the 100 TB shape:
    replication cost is n_salt x |hot blocks|, not n_salt x corpus.
    Pair sets are identical either way (pinned in tests, incl. an
    adversarial hot-block fixture)."""
    def salted(df: DataFrame) -> DataFrame:
        left = df.select(
            [F.col(c).alias(f"l_{c}") for c in _PAIR_SIDES]) \
            .withColumn("_salt", (F.col("l_rid") % n_salt).cast("int"))
        right = df.select(
            [F.col(c).alias(f"r_{c}") for c in _PAIR_SIDES]) \
            .withColumn("_salt", F.explode(F.array(
                *[F.lit(s) for s in range(n_salt)])))
        return left.join(
            right, (F.col("l_block_key") == F.col("r_block_key"))
            & (F.col("l_rid") < F.col("r_rid"))
            & (left["_salt"] == right["_salt"])).drop("_salt")

    if hot_keys is None:
        return salted(prepared)
    # pairs form only within one block_key, so partitioning the corpus
    # by key set and unioning the per-partition pair sets is exact
    is_hot = F.col("block_key").isin(hot_keys)
    return salted(prepared.filter(is_hot)) \
        .unionByName(candidate_pairs(prepared.filter(~is_hot)))


# ---------------------------------------------------------------------------
# E3: pair scoring
# ---------------------------------------------------------------------------

def _best_first_sim(a1, a2, b1, b2) -> float:
    """max difflib ratio over the first/nickname candidate cross
    product, with an exact-lower-equality fast path (SequenceMatcher of
    identical strings is exactly 1.0, so the shortcut is parity-safe).
    Empty candidate list → reference fallback: ratio of the raw first
    names (1.0 for two empties — gate 1 vetoes those pairs later)."""
    ca = [v for v in dict.fromkeys(
        ((a1 or "").strip(), (a2 or "").strip())) if v]
    cb = [v for v in dict.fromkeys(
        ((b1 or "").strip(), (b2 or "").strip())) if v]
    if not ca or not cb:
        return seq_ratio(a1, b1)
    best = 0.0
    for x in ca:
        xl = x.lower()
        for y in cb:
            yl = y.lower()
            if xl == yl:
                return 1.0
            r = seq_ratio(xl, yl)
            if r > best:
                best = r
    return best


@pandas_udf(DoubleType())
def _udf_best_first_sim(l_first: pd.Series, l_nick: pd.Series,
                        r_first: pd.Series, r_nick: pd.Series) -> pd.Series:
    """Exact-path UDF: every row is a genuine pair (see _best_first_sim
    for semantics — NULL-NULL names fall back to ratio 1.0)."""
    return pd.Series([
        _best_first_sim(a1, a2, b1, b2)
        for a1, a2, b1, b2 in zip(l_first, l_nick, r_first, r_nick)])


@pandas_udf(DoubleType())
def _udf_best_first_sim_masked(needs: pd.Series, l_first: pd.Series,
                               l_nick: pd.Series, r_first: pd.Series,
                               r_nick: pd.Series) -> pd.Series:
    """accepted_edges_fast variant: rows with needs=False were decided
    from JVM bounds — their value is discarded by the CASE, so skip the
    difflib work (~0.1 µs guard exit vs µs of SequenceMatcher)."""
    return pd.Series([
        _best_first_sim(a1, a2, b1, b2) if n else 0.0
        for n, a1, a2, b1, b2 in zip(needs, l_first, l_nick,
                                     r_first, r_nick)])


# Python str.strip()'s whitespace set is (?U)\s (Unicode White_Space)
# PLUS the bidi-B separators U+001C-001F, which Java's (?U)\s omits.
_PY_WS = r"[\s\x1c-\x1f]+"


def _py_trim(c: F.Column) -> F.Column:
    """JVM-side equivalent of Python str.strip() on a string column."""
    return F.regexp_replace(F.coalesce(c, F.lit("")),
                            rf"(?U)^{_PY_WS}|{_PY_WS}$", "")


def _any_cross_eq(l_ne_a: F.Column, l_ne_b: F.Column,
                  r_ne_a: F.Column, r_ne_b: F.Column,
                  l_key_a: F.Column, l_key_b: F.Column,
                  r_key_a: F.Column, r_key_b: F.Column) -> F.Column:
    """Exists (x, y) in the candidate cross product with key(x)==key(y).

    Candidacy (the *_ne_* booleans) is the RAW Python-trimmed value
    being non-empty — mirroring merge_core.first_name_candidates / the
    reference's `if x and y` — NOT the derived key being non-empty: a
    name of only combining marks folds to '' yet still aligns
    ('' == '') in the pure core, so guarding on the key would make the
    batch path diverge from the pure-core/streaming paths on gate 2.
    Callers derive the booleans from the per-record materialized
    `_lt_first`/`_lt_nick` columns (prepare_for_matching) — the trim
    regex must NOT run here on the quadratic pair path."""
    return (l_ne_a & r_ne_a & (l_key_a == r_key_a)) \
        | (l_ne_a & r_ne_b & (l_key_a == r_key_b)) \
        | (l_ne_b & r_ne_a & (l_key_b == r_key_a)) \
        | (l_ne_b & r_ne_b & (l_key_b == r_key_b))


def _pair_signals(pairs: DataFrame,
                  cfg: DedupeConfig = DedupeConfig()) -> DataFrame:
    """The sim-independent pair signals as column algebra: alignment,
    nickname equivalence, channel overlaps, and the evidence score
    `ev` (= full score minus the 0.7·first_sim name term)."""
    nz = lambda c: F.coalesce(F.col(c), F.lit(""))  # noqa: E731
    # set-overlap form of the candidate cross-equality (see
    # prepare_for_matching _fold_keys/_root_keys): provably equal to
    # _any_cross_eq over the guarded scalar keys (pinned in
    # tests/test_scale_patterns.py), ~16× less generated code on the
    # pair path — the scalar form, inlined twice through the accept
    # gate, blew the blocked-pair join's whole-stage codegen past
    # janino's 64 KB method limit and the stage ran interpreted.
    align = F.arrays_overlap("l__fold_keys", "r__fold_keys")
    nick_eq = (F.arrays_overlap("l__root_keys", "r__root_keys")
               if cfg.nickname_equivalence else F.lit(False))
    return (
        pairs
        .withColumn("nick_eq", nick_eq)
        .withColumn("names_align", align)
        .withColumn("suffix_match",
                    (nz("l_suffix") != "")
                    & (F.lower(nz("l_suffix")) == F.lower(nz("r_suffix"))))
        .withColumn("emails_overlap",
                    F.arrays_overlap("l_email_values", "r_email_values"))
        .withColumn("phones_overlap",
                    F.arrays_overlap("l_phone_values", "r_phone_values"))
        .withColumn("addr_overlap",
                    F.arrays_overlap("l_addr_keys", "r_addr_keys"))
        .withColumn("linkedin_match",
                    (nz("l_linkedin_url") != "")
                    & (nz("l_linkedin_url") == nz("r_linkedin_url")))
        .withColumn("corroborators",
                    F.col("emails_overlap").cast("int")
                    + F.col("phones_overlap").cast("int")
                    + F.col("addr_overlap").cast("int")
                    + F.col("linkedin_match").cast("int"))
        .withColumn("ev",
                    F.when(F.col("suffix_match"), 0.1).otherwise(0.0)
                    + F.when(F.col("emails_overlap"), 1.0).otherwise(0.0)
                    + F.when(F.col("phones_overlap"), 1.0).otherwise(0.0)
                    + F.when(F.col("addr_overlap"), 0.5).otherwise(0.0)
                    + F.when(F.col("linkedin_match"), 0.8).otherwise(0.0))
    )


def score_pairs(pairs: DataFrame,
                cfg: DedupeConfig = DedupeConfig()) -> DataFrame:
    """MergeEvaluator.compute as column algebra. Name alignment and
    nickname equivalence compare fold/root keys computed once per record
    at prepare time — the only Python on the quadratic pair path is the
    difflib ratio itself (Arrow-batched, equality fast path)."""
    raw_sim = _udf_best_first_sim(
        F.col("l_first_name"), F.col("l_nickname"),
        F.col("r_first_name"), F.col("r_nickname"))
    return (
        _pair_signals(pairs, cfg)
        .withColumn("first_sim", F.greatest(
            raw_sim, F.when(F.col("nick_eq"), F.lit(0.96))
            .otherwise(F.lit(0.0))))
        .withColumn("score", 0.7 * F.col("first_sim") + F.col("ev"))
        .drop("ev")
    )


# ---------------------------------------------------------------------------
# E4: decision gates
# ---------------------------------------------------------------------------


def accepted_edges(scored: DataFrame,
                   cfg: DedupeConfig = DedupeConfig()) -> DataFrame:
    """Boolean column algebra mirroring merge_core.merge_ok →
    (src, dst) edge list."""
    has_corrob = F.col("corroborators") > 0
    ok = (F.col("score") >= cfg.merge_score_threshold) | (
        (F.col("first_sim") >= cfg.first_name_similarity_threshold)
        & (F.col("score") >= cfg.relaxed_merge_threshold))

    l_has_core = (F.size("l_name_candidates") > 0) \
        & (F.coalesce(F.col("l_last_name"), F.lit("")) != "")
    r_has_core = (F.size("r_name_candidates") > 0) \
        & (F.coalesce(F.col("r_last_name"), F.lit("")) != "")
    ok = ok & ~((~l_has_core | ~r_has_core) & ~has_corrob)

    both_named = (F.size("l_name_candidates") > 0) \
        & (F.size("r_name_candidates") > 0)
    name_level = (F.col("names_align") | F.col("nick_eq")
                  | F.col("emails_overlap") | F.col("linkedin_match"))
    ok = ok & ~(both_named & ~name_level)

    linkedin_side = (F.lower(F.coalesce("l_source", F.lit(""))) == "linkedin") \
        | (F.lower(F.coalesce("r_source", F.lit(""))) == "linkedin")
    strict = (F.col("l__fold_last") == F.col("r__fold_last")) \
        & (F.col("names_align") | F.col("nick_eq")) \
        & (F.col("l__fold_suffix") == F.col("r__fold_suffix"))
    ok = ok & ~(linkedin_side & ~F.col("emails_overlap") & ~strict)

    if cfg.require_corroborator:
        ok = ok & has_corrob
    return scored.filter(ok).select(F.col("l_rid").alias("src"),
                                    F.col("r_rid").alias("dst"))


def accepted_edges_fast(pairs: DataFrame,
                        cfg: DedupeConfig = DedupeConfig()) -> DataFrame:
    """accepted_edges ∘ score_pairs with the Arrow/difflib hop pruned
    to the pairs whose decision actually depends on the exact ratio.

    The accept gate is monotone in first_sim, so JVM-computable bounds
    decide most pairs outright:

    - LOWER bound: a case-insensitive candidate equality means the
      difflib fast path returns exactly 1.0; nickname-root equivalence
      boosts first_sim to >= 0.96. If the gate already passes at the
      lower bound, accept without the UDF.
    - UPPER bound: difflib's matched total is at most the LCS, and
      LCS = (|a|+|b| - indel_distance)/2 with indel >= levenshtein, so
      ratio <= 1 - lev(a,b)/(|a|+|b|). If the gate cannot pass even at
      the upper bound, reject without the UDF.

    Only the ambiguous remainder (near-miss names: lev small but not
    equal) pays the Arrow round-trip. On blocked contact data that is
    a few percent of pairs — the quadratic path becomes almost
    entirely whole-stage-codegen. Equivalence with the unpruned path
    is pinned in tests/test_scale_patterns.py.
    """
    sig = _pair_signals(pairs, cfg)

    def lt(c: str) -> F.Column:
        # the Python-strip-parity lowercase trim (_py_trim ∘ lower) is
        # materialized per RECORD in prepare_for_matching (_lt_first /
        # _lt_nick): the UDF's candidates use Python .strip(), which
        # removes tabs/newlines, Unicode whitespace (NBSP etc.) AND
        # U+001C-001F — a narrower trim here would make the upper
        # bound underestimate the true ratio and wrongly reject pairs
        # the exact path accepts. Re-running the trim regex here, per
        # pair, measured ~4x on the 10^6-record cluster stage.
        return F.col(c)

    combos = [(lt("l__lt_first"), lt("r__lt_first")),
              (lt("l__lt_first"), lt("r__lt_nick")),
              (lt("l__lt_nick"), lt("r__lt_first")),
              (lt("l__lt_nick"), lt("r__lt_nick"))]
    combo_eqs, combo_ubs = [], []
    for cl, cr in combos:
        both = (cl != "") & (cr != "")
        combo_eqs.append(both & (cl == cr))
        combo_ubs.append(
            F.when(both, 1.0 - F.levenshtein(cl, cr)
                   / (F.length(cl) + F.length(cr)))
            .otherwise(F.lit(0.0)))
    l_has = (lt("l__lt_first") != "") | (lt("l__lt_nick") != "")
    r_has = (lt("r__lt_first") != "") | (lt("r__lt_nick") != "")
    # fallback path (either candidate set empty): ratio of the RAW
    # lowercased first names — 1.0 for two empties, 0.0 one-sided
    fl = F.lower(F.coalesce(F.col("l_first_name"), F.lit("")))
    fr = F.lower(F.coalesce(F.col("r_first_name"), F.lit("")))
    fb_eq = fl == fr
    fb_ub = (F.when(fb_eq, F.lit(1.0))
             .when((fl == "") | (fr == ""), F.lit(0.0))
             .otherwise(1.0 - F.levenshtein(fl, fr)
                        / (F.length(fl) + F.length(fr))))
    use_fb = ~l_has | ~r_has
    cross_eq = F.when(use_fb, fb_eq) \
        .otherwise(combo_eqs[0] | combo_eqs[1] | combo_eqs[2] | combo_eqs[3])
    ub_raw = F.when(use_fb, fb_ub).otherwise(F.greatest(*combo_ubs))
    nick_lb = F.when(F.col("nick_eq"), F.lit(0.96)).otherwise(F.lit(0.0))
    lb = F.greatest(F.when(cross_eq, F.lit(1.0)).otherwise(F.lit(0.0)),
                    nick_lb)
    ub = F.greatest(ub_raw, lb)

    def gate(sim: F.Column) -> F.Column:
        score = 0.7 * sim + F.col("ev")
        return (score >= cfg.merge_score_threshold) | (
            (sim >= cfg.first_name_similarity_threshold)
            & (score >= cfg.relaxed_merge_threshold))

    # The categorical vetoes (accepted_edges' non-score clauses) are
    # sim-independent — factor them out so the whole decision at a
    # bound is ONE boolean.
    has_corrob = F.col("corroborators") > 0
    l_has_core = (F.size("l_name_candidates") > 0) \
        & (F.coalesce(F.col("l_last_name"), F.lit("")) != "")
    r_has_core = (F.size("r_name_candidates") > 0) \
        & (F.coalesce(F.col("r_last_name"), F.lit("")) != "")
    both_named = (F.size("l_name_candidates") > 0) \
        & (F.size("r_name_candidates") > 0)
    name_level = (F.col("names_align") | F.col("nick_eq")
                  | F.col("emails_overlap") | F.col("linkedin_match"))
    linkedin_side = \
        (F.lower(F.coalesce("l_source", F.lit(""))) == "linkedin") \
        | (F.lower(F.coalesce("r_source", F.lit(""))) == "linkedin")
    strict = (F.col("l__fold_last") == F.col("r__fold_last")) \
        & (F.col("names_align") | F.col("nick_eq")) \
        & (F.col("l__fold_suffix") == F.col("r__fold_suffix"))
    vetoes = ~((~l_has_core | ~r_has_core) & ~has_corrob) \
        & ~(both_named & ~name_level) \
        & ~(linkedin_side & ~F.col("emails_overlap") & ~strict)
    if cfg.require_corroborator:
        vetoes = vetoes & has_corrob

    # ONE pass — a filter+union split would re-execute the whole pair
    # join per branch. The UDF still runs over every row, but decided
    # rows ship an explicit needs=False flag plus NULL name inputs
    # (Arrow null bitmaps, no string payload) and the masked UDF skips
    # them in ~0.1 µs instead of difflib µs. The flag — not null-ness —
    # controls skipping, so genuinely NULL-named pairs that DO need the
    # ratio still get the reference fallback semantics.
    #
    # The FULL decision at each bound (gate ∧ vetoes) is computed
    # pre-UDF, and the final filter is `_acc_lb OR (needs AND
    # gate(udf_sim))` over those boolean columns plus the UDF output.
    # Shape matters as much as semantics here: Catalyst's logical
    # pushdown substitutes projected expressions into filter
    # conditions, and the previous formulation (filter over
    # first_sim/score columns, each expanding the _lb/_ub levenshtein
    # bound trees) inflated the post-join filter's generated code past
    # janino's 64 KB method limit — the whole pair stage silently fell
    # back to interpreted execution. With the decision folded into two
    # pre-UDF booleans the substituted condition stays small.
    # Equivalence with the unpruned path is pinned in
    # tests/test_scale_patterns.py; vetoed pairs now also skip the UDF
    # (they previously ran it and were rejected afterwards).
    sig = (sig.withColumn("_lb", lb).withColumn("_ub", ub)
           .withColumn("_acc_lb", gate(F.col("_lb")) & vetoes)
           .withColumn("_acc_ub", gate(F.col("_ub")) & vetoes))
    needs = F.col("_acc_ub") & ~F.col("_acc_lb")
    masked = [F.when(needs, F.col(c)) for c in
              ("l_first_name", "l_nickname", "r_first_name", "r_nickname")]
    raw_sim = _udf_best_first_sim_masked(needs, *masked)
    udf_sim = F.greatest(
        raw_sim, F.when(F.col("nick_eq"), F.lit(0.96)).otherwise(F.lit(0.0)))
    ok = F.col("_acc_lb") | (needs & gate(udf_sim))
    return sig.filter(ok).select(F.col("l_rid").alias("src"),
                                 F.col("r_rid").alias("dst"))


# ---------------------------------------------------------------------------
# E5: connected components
# ---------------------------------------------------------------------------


def _edge_checksum(edges: DataFrame) -> tuple[int, int]:
    row = edges.agg(
        F.count("*").alias("n"),
        # decimal accumulator: a long sum of 64-bit hashes overflows ANSI
        F.coalesce(F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")),
                   F.lit(0).cast("decimal(38,0)")).alias("h")
    ).collect()[0]
    return row["n"], row["h"]


def connected_components_star(vertices: DataFrame, edges: DataFrame,
                              max_iter: int = 40) -> DataFrame:
    """Alternating large-star / small-star connected components
    (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    O(log n) rounds regardless of graph diameter.

    Use this variant for adversarial topologies (long chains, huge
    sparse components); `connected_components` (min-label propagation,
    O(diameter) rounds) wins on the near-clique graphs contact ER
    produces. Both return (id, component = min id of the component).

    Per round: large-star connects every neighbor v > u to the min of
    u's neighborhood; small-star (edges oriented big→small) connects
    u's smaller neighbors to their min. Each is one groupBy + one
    self-join on the node id — shuffle-partitionable, no driver state.
    """
    # Materialize the input edges once: round 1 references `cur` several
    # times (symmetrize + neighborhood-min join) and would otherwise
    # re-execute the upstream edge plan for each reference.
    cur = edges.filter(F.col("src") != F.col("dst")).localCheckpoint()
    prev_sig = None
    for _ in range(max_iter):
        # ---- large-star
        sym = cur.union(cur.select(F.col("dst").alias("src"),
                                   F.col("src").alias("dst")))
        mins = sym.groupBy("src").agg(
            F.least(F.min("dst"), F.first("src")).alias("m"))
        cur = (sym.join(mins, "src")
               .where(F.col("dst") > F.col("src"))
               .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
               .where(F.col("src") != F.col("dst"))
               .distinct())
        # ---- small-star (orient big → small)
        oriented = cur.select(
            F.greatest("src", "dst").alias("src"),
            F.least("src", "dst").alias("dst")).distinct()
        mins = oriented.groupBy("src").agg(F.min("dst").alias("m"))
        # lazy checkpoint: _edge_checksum's collect materializes it —
        # one job per round instead of two
        cur = (oriented.join(mins, "src")
               .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
               .union(mins.select(F.col("src"), F.col("m").alias("dst")))
               .where(F.col("src") != F.col("dst"))
               .distinct().localCheckpoint(eager=False))
        sig = _edge_checksum(cur)
        if sig == prev_sig:
            break
        prev_sig = sig
    # converged: every edge points child → component root
    roots = cur.select(F.col("src").alias("id"),
                       F.col("dst").alias("component"))
    return (vertices.join(roots, "id", "left")
            .select("id", F.coalesce("component", "id").alias("component")))


def connected_components(vertices: DataFrame, edges: DataFrame,
                         max_iter: int = 25,
                         init_labels: DataFrame | None = None) -> DataFrame:
    """Min-label propagation: component = min rid reachable. Contact
    clusters are near-cliques, so this converges in a handful of rounds;
    each round is one shuffle on id. Returns (id, component).

    vertices: one column `id`; edges: (src, dst) undirected.

    init_labels (r11, optimization round — guide §2.4 "remove shuffles
    outright"): optional (id, component) seed covering every vertex.
    When the caller already knows, for each node, the id of SOME
    same-component node ≤ its own id (e.g. e5's star edges point at
    group minima, so least(id, group mins) is computable in the same
    window pass that builds the edges), seeding with it starts the
    propagation one hop ahead and provably converges to the same
    fixpoint: the final label is min over the component of the seed
    labels, and a valid seed's component-wide min IS the component min
    (the min node's own seed cannot go below itself). Each round saved
    is one full-graph shuffle + one driver round trip — measured 4 → 3
    rounds on the e5 graph with identical labels (sf0.1, pinned in
    tests). Default None keeps the classic id-seeded behavior for
    every other caller.
    """
    # The edge list is loop-invariant: materialize it ONCE — and BEFORE
    # symmetrizing. A union's two branches are separate subplans, so
    # checkpointing only the symmetrized union executes the whole
    # upstream edge pipeline (pair join + gate UDF + filter) TWICE.
    # Lazy checkpoint: both union branches reference the SAME marked
    # RDD, so the sym materialization below triggers exactly one
    # execution of the gate — no extra eager job.
    edges = edges.localCheckpoint(eager=False)
    sym = edges.union(edges.select(F.col("dst").alias("src"),
                                   F.col("src").alias("dst"))) \
        .localCheckpoint()
    cc = (init_labels.select("id", "component")
          if init_labels is not None
          else vertices.select(F.col("id"), F.col("id").alias("component")))
    cc = cc.localCheckpoint()
    # Convergence check: labels only ever decrease, so the component sum
    # is strictly monotone until fixpoint — one cheap aggregate per round
    # instead of a self-join diff.
    prev_sum = None
    for _ in range(max_iter):
        msgs = sym.join(cc, sym["dst"] == cc["id"]) \
            .select(sym["src"].alias("id"), F.col("component"))
        # lazy checkpoint: the convergence aggregate below is the
        # action that materializes it — ONE job per round, not two
        cc = cc.union(msgs).groupBy("id") \
            .agg(F.min("component").alias("component")) \
            .localCheckpoint(eager=False)
        # decimal accumulator: component labels are rids (up to ~2^62),
        # and a LongType sum overflows under ANSI mode at scale — same
        # hazard _edge_checksum guards against
        cur_sum = cc.agg(
            F.sum(F.col("component").cast("decimal(38,0)"))
        ).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return cc


def cluster_records(prepared: DataFrame,
                    cfg: DedupeConfig = DedupeConfig(),
                    eager: bool = False,
                    n_salt: int | None = None) -> DataFrame:
    """prepare_for_matching output → + cluster_id (min rid of the
    component). Composition of E2-E5; uses the bound-pruned gate path
    (accepted_edges_fast — same edge set, Python only on ambiguous
    near-miss names).

    `prepared` is persisted here: its six Arrow-UDF fold/root columns
    are consumed by the pair join (exchange-reused across l/r), the CC
    vertex set, and the final label join — without the persist the UDF
    chain re-executes per consumer (~2x the whole prepare cost at 10^6
    records). Same bounded-cache rationale as dedup's shingle persist:
    Spark dedupes the entry by analyzed plan and evicts LRU.

    eager=False (batch default) returns a lazy plan that references the
    cached `prepared`; one cache entry per distinct input plan, evicted
    LRU — fine for run-once pipelines. Long-lived sessions that call
    this repeatedly over growing inputs (the streaming
    reconcile_assignments compaction) pass eager=True: the labeled
    result is materialized via localCheckpoint and `prepared` is
    unpersisted before returning, so cache entries don't accumulate
    across invocations.

    n_salt switches pair generation to candidate_pairs_salted — same
    pair set (equivalence pinned in tests incl. an adversarial
    hot-block fixture), spread over n_salt reducers per block. Use
    when a profiled hot block exceeds what AQE skew-splitting handles
    (tools/bench_skew.py records the tradeoff)."""
    prepared = prepared.persist()
    pairs = (candidate_pairs_salted(prepared, n_salt) if n_salt
             else candidate_pairs(prepared))
    edges = accepted_edges_fast(pairs, cfg)
    cc = connected_components(
        prepared.select(F.col("rid").alias("id")), edges)
    labeled = prepared.join(cc, prepared["rid"] == cc["id"], "left") \
        .withColumn("cluster_id",
                    F.coalesce(F.col("component"), F.col("rid"))) \
        .drop("id", "component")
    if eager:
        labeled = labeled.localCheckpoint(eager=True)
        prepared.unpersist()
    return labeled


# ---------------------------------------------------------------------------
# E6-E9: survivorship merge
# ---------------------------------------------------------------------------

MERGED_SCHEMA = StructType(
    [StructField("cluster_id", LongType(), False)]
    + list(CONSOLIDATED_SCHEMA.fields))

_RECORD_FIELDS = (
    "source", "source_row_id", "source_timestamp", "first_name", "nickname",
    "last_name", "middle_name", "maiden_name", "prefix", "suffix",
    "suffix_professional", "company", "title", "department", "linkedin_url",
    "emails", "phones", "addresses", "invalid_emails", "non_standard_phones",
)
_LISTY = ("emails", "phones", "addresses", "invalid_emails",
          "non_standard_phones")


def merge_clusters(clustered: DataFrame,
                   cfg: DedupeConfig = DedupeConfig()) -> DataFrame:
    """Survivorship via collect_list + mapInPandas over the pure
    merge_core.merge_cluster — exact sequential semantics per cluster.

    Why not groupBy().applyInPandas: that spins up a pandas DataFrame
    per GROUP, and contact clusters are tiny (1-3 records) while there
    are millions of them — measured ~0.75 ms/cluster of pure overhead.
    collect_list does the same single shuffle but hands mapInPandas
    thousands of clusters per Arrow batch; the per-cluster cost is one
    plain-Python merge_cluster call. rid leads the struct so array_sort
    restores ingest order."""
    out_fields = [f.name for f in MERGED_SCHEMA.fields]
    country = cfg.default_phone_country
    rec_struct = F.struct(F.col("rid"),
                          *[F.col(c) for c in _RECORD_FIELDS])
    grouped = clustered.groupBy("cluster_id").agg(
        F.array_sort(F.collect_list(rec_struct)).alias("_records"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for cluster_id, packed in zip(pdf["cluster_id"],
                                          pdf["_records"]):
                records = []
                for row in packed:
                    rec = {}
                    for key, value in row.items():
                        if key == "rid":
                            continue
                        if key in _LISTY:
                            # channel arrays hold structs (→ dict);
                            # invalid_* arrays hold plain strings
                            rec[key] = ([dict(x) if isinstance(x, dict)
                                         else x for x in value]
                                        if value is not None else [])
                        else:
                            rec[key] = value if value is not None else ""
                    records.append(rec)
                merged = merge_core.merge_cluster(
                    records, default_country=country)
                merged["cluster_id"] = int(cluster_id)
                rows.append(tuple(merged.get(f) for f in out_fields))
            yield pd.DataFrame(rows, columns=out_fields)

    return grouped.mapInPandas(run, MERGED_SCHEMA)


# ---------------------------------------------------------------------------
# E10: lineage
# ---------------------------------------------------------------------------


def _render_phones(col: str) -> F.Column:
    return F.concat_ws("|", F.transform(
        F.coalesce(col, F.array()),
        lambda p: F.when(p["extension"] != "",
                         F.concat(p["value"], F.lit("x"), p["extension"]))
        .otherwise(p["value"])))


def build_lineage(clustered: DataFrame, contacts: DataFrame,
                  raw: DataFrame) -> DataFrame:
    """One provenance row per source record: normalized channel renders +
    the raw (pre-normalization) values, keyed to the merged contact.

    Joins: cluster→contact_id map (same cardinality as contacts, plain
    shuffle join on cluster_id) and raw records on (source,
    source_row_id) — both equi-joins Catalyst can reorder/broadcast."""
    idmap = contacts.select("cluster_id", "contact_id")
    raw_sel = raw.select(
        "source", "source_row_id",
        F.col("full_name").alias("_raw_full_name"),
        F.col("emails").alias("_raw_emails"),
        F.col("phones").alias("_raw_phones"))
    return (
        clustered.join(idmap, "cluster_id")
        .join(raw_sel, ["source", "source_row_id"], "left")
        .select(
            "contact_id", "source", "source_row_id",
            F.coalesce("_raw_full_name", F.col("full_name"))
            .alias("source_full_name"),
            F.col("prefix").alias("source_prefix"),
            F.col("company").alias("source_company"),
            F.col("title").alias("source_title"),
            F.concat_ws("|", F.transform(
                F.coalesce("emails", F.array()), lambda e: e["value"]))
            .alias("source_emails"),
            _render_phones("phones").alias("source_phones"),
            F.to_json(F.coalesce("addresses", F.array()))
            .alias("source_addresses_json"),
            F.concat_ws("|", F.transform(
                F.coalesce("_raw_emails", F.array()), lambda e: e["value"]))
            .alias("source_emails_raw"),
            _render_phones("_raw_phones").alias("source_phones_raw"),
        )
    )
