"""Table sinks: partitioned parquet and bucketed tables.

The reference has no file sinks at all (everything goes over the ClickHouse
wire, SURVEY.md §2); an engine meant for 100 TB needs both of parquet's
physical-layout levers:

  * **Partitioning** (directory-level): queries filtering on the partition
    column prune whole directories before any I/O — the right axis for
    time/tenant retention and scan scoping.
  * **Bucketing** (file-level hash layout): two tables bucketed the same
    way on the join key join WITHOUT a shuffle — pre-paying the exchange
    once at write time. The right axis for the fact⋈fact joins that
    dominate a warehouse (here: the CDC replica bucketed by its merge key,
    joined to per-key history or dims).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """Directory-partitioned parquet. Beware high-cardinality partition
    columns (millions of tiny dirs kill the file listing — derive a
    day/hour column instead of partitioning by raw timestamp)."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Hash-bucketed managed table. Joins/aggregations keyed on
    bucket_cols between tables with the SAME bucket count read
    co-located — no Exchange in the plan (pinned by test_sinks.py).
    n_buckets is a layout contract: pick it once per subject area
    (cluster-cores × small factor) and keep it consistent."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort:
        w = w.sortBy(*bucket_cols)
    w.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
