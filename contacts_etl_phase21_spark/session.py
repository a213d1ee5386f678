"""SparkSession factory tuned for this engine.

Defaults are chosen for the local[N] test/bench environment but every
knob is the one you'd set on a real cluster:

- AQE on (runtime coalescing, skew-join splitting — matters for the
  blocked similarity self-join where common blocking keys skew).
- shuffle.partitions sized to cores locally; on a 1000-executor cluster
  this is overridden to ~2-3x total cores or left to AQE's coalescing.
- Arrow enabled so pandas UDFs / toPandas are vectorized batch transfers.
- maxPartitionBytes left at 128m: at 100 TB that yields ~800k input
  splits, which AQE coalesces post-shuffle; scans stay parallel.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if cpus:
        try:
            return max(1, int(cpus))
        except ValueError:
            pass
    return os.cpu_count() or 4


def get_spark(app_name: str = "contacts-etl-phase21-spark",
              master: str | None = None,
              shuffle_partitions: int | None = None,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults.

    extra_conf (r12, additive): caller-supplied settings applied on
    top of the defaults — bench.py uses it to enable the event log so
    per-query executor task-time can be reported (guide §1/§7.1)
    without changing any engine default."""
    cores = default_parallelism()
    master = master or f"local[{cores}]"
    shuffle_partitions = shuffle_partitions or max(cores, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # r11 (guide §2.5): AQE's parallelismFirst coalescing still
        # FLOORS post-shuffle partitions at minPartitionSize (default
        # 1m), which serializes byte-small but CPU-heavy reduce stages
        # — the ER pair-scoring stages (difflib pandas UDFs over a
        # few-MB pair frame) profiled at 2-4 tasks on 32 cores. 64k
        # keeps such stages at full parallelism; on a real cluster
        # partitions are orders of magnitude above either floor, so
        # the knob never binds there (parameterised for override).
        # Interleaved A/B on er_pipeline_resolved_closed_form:
        # 10.5/8.4s @1m vs 8.0/7.6s @64k.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
                os.environ.get("SPARK_GRAFT_AQE_MIN_PARTITION_SIZE",
                               "64k"))
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # r11 optimization round (guide §3.1/§4.3/§9), A/B-measured
        # locally neutral (headline set medians 11.22s default vs
        # 11.04s tuned, interleaved): allow the planner / AQE to pick
        # shuffled-hash join over sort-merge when a build side fits
        # (skips both sorts at cluster scale; locally every headline
        # join already broadcasts, hence the neutral reading), and
        # move scalar-UDF traffic to Arrow batches (no scalar UDFs
        # remain on hot paths — pinned by tests — so this is a guard
        # for future code, not a measured local win).
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
                "64m")
        .config("spark.sql.execution.pythonUDF.arrow.enabled", "true")
        # r12 NEGATIVE RESULT (recorded so it isn't re-tried):
        # excluding InferFiltersFromGenerate session-wide was measured
        # NEUTRAL-to-slightly-negative once the hot generator sites
        # gained persist barriers (eval_ngram_set /
        # contamination_by_eval) — the rule's harmful case (the
        # inferred size() filter re-evaluating a computed-array chain
        # below the widen exchange) is better fixed AT THE SITE with a
        # persist, which also stops the generator re-evaluation; the
        # blanket exclusion forfeits the rule's legitimate null/empty
        # pruning elsewhere (isolated A/B: sp_corpus_refresh 5.0/6.5s
        # with the rule vs 5.8/6.5s excluded).
        # guide §6: zstd parquet for engine-written artifacts (indexes,
        # interchange) — smaller at similar read speed; inputs under
        # $SPARK_GRAFT_SF_DIR are read-only and unaffected. The shuffle
        # codec stays lz4: §2.3 says measure before switching, and
        # local shuffles are KB-scale — no meaningful local signal
        # either way, so the default stands until a cluster measurement
        # exists.
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.sql.session.timeZone", "UTC")
        # testdata events.parquet carries TIMESTAMP(NANOS); read as long,
        # io.load converts to micros TimestampType.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
