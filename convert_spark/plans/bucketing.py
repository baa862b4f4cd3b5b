"""Bucketed tile tables: co-located joins with NO shuffle (north_rule:
"broadcast() for small dims, repartition()/bucketing for co-located
joins").

A tile/cell keyed table written with ``bucketBy(n, cell_id)`` is
physically pre-partitioned by hash(cell_id) into a fixed bucket count;
two tables bucketed the SAME way join bucket-to-bucket — Catalyst plans a
SortMergeJoin with ZERO Exchange on either side (asserted in
tests/test_plans.py::TestBucketedJoin). At 100 TB this is the shape for
repeated joins against the same key space (points x tile dims, mention
rollups x polygon tags): pay one bucketed write, then every subsequent
join and groupBy on the bucket key is shuffle-free.

Bucketing requires the table catalog (``saveAsTable``); plain
``parquet(path)`` writes cannot carry the bucket spec. In this sandbox
the session catalog is in-memory, so bucket metadata lives for the
session — on a real deployment the Hive/Iceberg catalog persists it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    n_buckets: int = 32,
    keys: tuple[str, ...] = ("cell_id",),
    sort: bool = True,
    path: str | None = None,
) -> None:
    """Write ``df`` as a bucketed (and by default per-bucket sorted)
    parquet table. Sorting by the bucket key lets the co-located
    SortMergeJoin skip its per-bucket Sort too."""
    writer = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def cobucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: tuple[str, ...] = ("cell_id",),
    how: str = "inner",
    force_sortmerge: bool = False,
) -> DataFrame:
    """Join two identically-bucketed tables on their bucket keys — the
    plan must contain no Exchange (the whole point; see tests).

    ``force_sortmerge`` adds a MERGE join hint so the bucketed
    SortMergeJoin shape is planned even when one side is small enough
    for the session's auto-broadcast threshold — callers that assert
    the zero-Exchange property want the shape, not whatever AQE deems
    cheapest at test scale."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    if force_sortmerge:
        left, right = left.hint("merge"), right.hint("merge")
    return left.join(right, list(on), how)
