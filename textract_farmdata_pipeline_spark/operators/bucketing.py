"""Bucketed-table helpers: pre-shuffled storage for co-located joins.

At 100 TB the same fact↔fact join key recurs across workloads; paying
the shuffle once at write time (bucketBy) lets every later join/agg on
that key run shuffle-free — the physical plan shows SortMergeJoin with
NO Exchange under either bucketed side.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 32,
    path: str | None = None,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Persist ``df`` as a bucketed (optionally sorted) table.

    ``n_buckets`` should match the downstream join fan-out (and both
    sides of a co-located join must agree on it).  ``path`` makes the
    table external.
    """
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def joined_bucketed(
    spark: SparkSession, left_table: str, right_table: str, on: Sequence[str]
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — Catalyst
    recognizes the matching output partitioning and elides both
    Exchanges."""
    return spark.table(left_table).join(spark.table(right_table), list(on))


def count_shuffles(df: DataFrame) -> int:
    """Number of Exchange operators in the final physical plan (AQE
    re-plans; this inspects the executed/initial plan text)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange")
