"""Streaming snapshot-delta classification — the online twin of
dedup.snapshot_delta: every ARRIVING document is classified against
the previous corpus snapshot (added / changed / unchanged) the moment
it lands, so downstream incremental stages (tokenize, dedup, index)
can route only added+changed work in flight instead of waiting for
the batch diff.

Design: the old snapshot compiles ONCE into a static (id, old_fp)
fingerprint index — persisted, at scale written bucketed by id — and
arrivals probe it with a stream-static LEFT equi-join on id: stateless
(stream-static joins keep no state store; the asof_enrich regime), so
the plan is an arrival-side projection + one broadcast/bucketed probe.

Documented semantic asymmetry vs the batch operator: 'removed' rows
are NOT observable online — a document that stopped arriving never
produces an arrival to classify, so the batch snapshot_delta (one
full-outer join) remains the periodic compactor that finds removals.
Same split as near-dup dedup (cheap-online / complete-offline).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def old_fingerprint_index(old: DataFrame, id_col: str,
                          text_col: str) -> DataFrame:
    """(id, old_fp) static probe side; persisted by the caller's
    lifecycle (one index, many micro-batches — the lsh_corpus_index
    contract). NULL text coalesces to '' exactly like the batch
    operator so the two tiers can never disagree on a fingerprint."""
    return (old.select(
        F.col(id_col),
        F.md5(F.coalesce(F.col(text_col), F.lit("")))
        .alias("old_fp")).persist())


def stream_snapshot_delta(arrivals: DataFrame, old_index: DataFrame,
                          id_col: str, text_col: str) -> DataFrame:
    """(id, status, old_fp, new_fp) per arrival — status is 'added'
    (no old row), 'changed' or 'unchanged'; never 'removed' (see the
    module docstring). Works identically on a batch frame, and on
    arrivals restricted to the new snapshot it equals the batch
    snapshot_delta minus its 'removed' rows (test-pinned)."""
    new_fp = F.md5(F.coalesce(F.col(text_col), F.lit("")))
    probe = arrivals.select(F.col(id_col), new_fp.alias("new_fp"))
    joined = probe.join(old_index, id_col, "left")
    status = (F.when(F.col("old_fp").isNull(), F.lit("added"))
              .when(F.col("old_fp") == F.col("new_fp"),
                    F.lit("unchanged"))
              .otherwise(F.lit("changed")))
    return joined.select(id_col, status.alias("status"),
                         "old_fp", "new_fp")
