"""Streaming ANN serving: arriving query vectors probe a static
IVF-PQ-encoded corpus (stream-static join on cell).

The online half of the similarity-search story: the corpus is encoded
ONCE into the IVF-PQ layout (cell + residual codes + norms — at 100 TB
written partitioned by cell, ~16 bytes/vector), and a 24/7 stream of
query vectors is served against it:

- the stream side is STATELESS row-local projection: coarse-probe
  assignment, exact per-cell ⟨q,c⟩, the dense ADC table and |q|² are
  the same expressions the batch tier uses
  (operators/similarity_search.ivfpq_relational_query_frame) — no
  stream-side shuffle before the join;
- the candidate join is a stream-static equi-join on cell against the
  persisted encoded corpus: each micro-batch reads only the cells its
  queries probe;
- per-query top-k runs in applyInPandasWithState keyed on query_id: a
  query's candidates all surface in its own micro-batch (the join
  emits them together), so the state function emits the top-k
  immediately and REMOVES the state — state occupancy is one key per
  in-flight query, not stream lifetime. A re-sent query_id is served
  again (at-least-once serving semantics).

Batch twin: the same transforms with a window top-k
(ivf_pq_topk_relational on the same corpus/query split) — the
registered query st_stream_ann_topk's oracle checks that twin
end-to-end in SQL, and tests/test_streaming.py pins stream-vs-batch
parity through readStream/availableNow.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from contacts_etl_phase21_spark.operators.similarity_search import (
    Codebooks, ivfpq_relational_index, ivfpq_relational_query_frame,
    ivfpq_relational_scored,
)


def ivfpq_serving_index(corpus: DataFrame, n_cells: int = 8, m: int = 8,
                        n_codes: int = 16, id_col: str = "vec_id",
                        vec_col: str = "embedding"):
    """Build + persist the static side once: (cent_rows, codebooks,
    encoded corpus). The persist matters — the static side of a
    stream-static join re-executes per micro-batch, and without it
    every batch would re-encode the corpus (same pitfall
    lsh_corpus_index documents). Caller owns the returned frame's
    lifecycle (unpersist when the stream stops)."""
    cent_rows, codebooks, enc = ivfpq_relational_index(
        corpus, n_cells, m, n_codes, id_col, vec_col)
    enc = enc.persist()
    enc.count()  # materialize before the first micro-batch
    return cent_rows, codebooks, enc


def stream_ann_topk(stream_queries: DataFrame,
                    cent_rows: list[tuple[int, list[float]]],
                    codebooks: Codebooks, enc: DataFrame,
                    k: int = 10, n_probe: int = 2,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding",
                    query_id_col: str = "query_id") -> DataFrame:
    """(query_id, rank, vec_id, pq_cosine) stream for arriving query
    vectors — works identically on a batch frame (the twin the oracle
    checks). See module docstring for the plan shape."""
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import (
        DoubleType, IntegerType, LongType, StructField, StructType,
    )

    qframe = ivfpq_relational_query_frame(
        stream_queries, cent_rows, codebooks, n_probe, query_id_col,
        vec_col)
    if not qframe.isStreaming:
        # batch twin (r12): pin the broadcast exactly as
        # ivf_pq_topk_relational does — the query frame is per-query
        # constants (cells + ADC tables), always the small side; the
        # pin skips AQE's plan-then-convert round trip. A streaming
        # side cannot be broadcast, so the serving path is untouched.
        qframe = F.broadcast(qframe)
    scored = ivfpq_relational_scored(enc, qframe, codebooks,
                                     query_id_col, id_col)

    out_schema = StructType([
        StructField(query_id_col, LongType()),
        StructField("rank", IntegerType()),
        StructField(id_col, LongType()),
        StructField("pq_cosine", DoubleType()),
    ])
    state_schema = StructType([StructField("served", IntegerType())])

    def topk_fn(key, pdfs, state):
        import pandas as pd

        frames = [p for p in pdfs if not p.empty]
        if not frames:
            state.remove()
            return
        allc = pd.concat(frames, ignore_index=True)
        top = (allc.sort_values(["pq_cosine", id_col],
                                ascending=[False, True])
               .head(k).reset_index(drop=True))
        top.insert(1, "rank", (top.index + 1).astype("int32"))
        state.remove()  # one key per in-flight query, then gone
        yield top[[query_id_col, "rank", id_col, "pq_cosine"]]

    if not scored.isStreaming:
        # batch twin path (r12, guide §4.1): the same per-query top-k
        # as a row_number window instead of groupBy+applyInPandas —
        # (pq_cosine desc, id asc) is a TOTAL order per query (ids are
        # unique), so the window rank equals the pandas sort rank
        # row-for-row, and the JVM WindowGroupLimit replaces an Arrow
        # round trip + an extra exchange/sort pair. The STREAMING path
        # below is untouched (windows are unbounded state on a
        # stream; the stateful top-k remains the serving form).
        from pyspark.sql import Window

        w = Window.partitionBy(query_id_col).orderBy(
            F.desc("pq_cosine"), F.asc(id_col))
        return (scored.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k)
                .select(query_id_col, "rank", id_col, "pq_cosine"))
    return scored.groupBy(query_id_col).applyInPandasWithState(
        topk_fn, out_schema, state_schema, "append",
        GroupStateTimeout.NoTimeout)
