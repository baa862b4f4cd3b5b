"""Eager localCheckpoint bookkeeping for iterative operators.

The CC and PageRank loops eagerly localCheckpoint every round to
truncate lineage (components.py:143, graph.py). localCheckpoint persists
the materialized partitions in executor storage, and Spark offers no
public handle to release them from the DataFrame (``df.unpersist()`` is
a no-op for checkpoint storage — probed in tests/test_pagerank.py) — so
without bookkeeping a 50-round CC run over a TB-scale edge list holds
FIFTY generations of the edge list in executor memory/disk until the
session dies. These helpers track the RDD ids a checkpoint creates and
release superseded generations by id through the SparkContext's
persistent-RDD registry, keeping live checkpoint storage O(1) in rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def persistent_rdd_ids(spark: SparkSession) -> set[int]:
    return set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())


def eager_checkpoint(df: DataFrame) -> tuple[DataFrame, set[int]]:
    """localCheckpoint(eager=True) + the set of persistent-RDD ids the
    checkpoint created (single-threaded snapshot diff)."""
    spark = df.sparkSession
    before = persistent_rdd_ids(spark)
    out = df.localCheckpoint(eager=True)
    return out, persistent_rdd_ids(spark) - before


def release(spark: SparkSession, ids: set[int]) -> None:
    """Unpersist checkpoint RDDs by id. ONLY for superseded generations:
    a released checkpoint is unrecoverable (its DataFrame must never be
    used again)."""
    reg = spark.sparkContext._jsc.getPersistentRDDs()
    for rid in ids:
        rdd = reg.get(rid)
        if rdd is not None:
            rdd.unpersist()
