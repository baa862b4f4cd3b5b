"""SparkSession factory tuned for this engine.

Local mode is a correctness/bench proxy for a multi-executor cluster; the
settings below are the ones that transfer (AQE, Arrow, shuffle partitions
sized to cores, UTC timezone for oracle comparison).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def num_partitions(df) -> int:
    """Partition count of a DataFrame's physical plan, via the JVM-side
    internal RDD. ``df.rdd`` builds the same plan but ALSO wraps it in a
    Python-deserializer RDD (~40% slower per probe, measured round 8);
    both report the identical partition count — the deserializer is a
    1:1 mapPartitions. Falls back to ``df.rdd`` if the internal handle
    is unavailable."""
    try:
        return df._jdf.queryExecution().toRdd().getNumPartitions()
    except Exception:
        return df.rdd.getNumPartitions()


def get_session(
    cores: int | None = None,
    app_name: str = "convert_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    master: str | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``cores=None`` -> ``local[*]``. ``shuffle_partitions`` defaults to the
    core count (local mode: the 200 default over-parallelizes small data and
    under-parallelizes big data; at cluster scale this is set per-job).
    ``master`` overrides the local[N] default (e.g.
    ``local-cluster[N,cores,mem_mb]`` for true multi-executor-JVM runs —
    the scaling bench's executor mode).
    """
    if cores is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        cores_str = env if env else "*"
    else:
        cores_str = str(cores)
    n_parts = shuffle_partitions or (int(cores_str) if cores_str != "*" else (os.cpu_count() or 8))

    builder = (
        SparkSession.builder.master(master or f"local[{cores_str}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n_parts))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 64k-row Arrow batches of wide text thrash the on-heap allocator at
        # high thread counts (measured 3.5x slowdown at local[32]); 16k rows
        # + off-heap Arrow buffers restore scaling
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "16384")
        .config("spark.memory.offHeap.enabled", "true")
        .config("spark.memory.offHeap.size", os.environ.get("SPARK_GRAFT_OFFHEAP", "16g"))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        # Netty's default direct-arena count starves the Arrow->Python
        # write path at high local thread counts (measured 6x slowdown of
        # pandas stages at local[32]; allocator lock contention). One arena
        # per task thread restores linear scaling.
        .config(
            "spark.driver.extraJavaOptions",
            "-Dio.netty.allocator.numDirectArenas=64 -Dio.netty.allocator.numHeapArenas=64",
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # let the planner pick shuffled-hash joins when the per-partition
        # build side fits (guide §9): the engine's candidate/dim join
        # sides are slim by design, and skipping the sort-merge sorts
        # measured a consistent win across the join-heavy suite (round
        # 8: dedup_incremental -26%, knn -35%, asof/revenue/quota -30%;
        # nothing regressed warm). Bucketed co-located joins pin their
        # SortMergeJoin shape explicitly via a MERGE hint (bucketing.py)
        # and are unaffected.
        .config("spark.sql.join.preferSortMergeJoin", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
