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


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files: int = 2,
) -> int:
    """Compact a small-files parquet directory (e.g. the streaming event
    log, which accrues one file per micro-batch) into ~target-size files.

    The streaming small-files problem is the classic silent killer at
    scale: a year of 1-minute micro-batches is ~500k files whose listing
    and footer reads dominate query time. Compaction = read → coalesce to
    ceil(bytes/target) → rewrite to a temp dir → atomic-ish swap.

    Returns the new file count (or the current one if below min_files).
    Production notes: run per time-partition so compaction never rewrites
    the live head; a transactional format makes the swap actually atomic.
    """
    import math
    import os
    import shutil

    files = [
        f
        for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith("_")
    ]
    if len(files) < min_files:
        return len(files)
    total = sum(os.path.getsize(os.path.join(path, f)) for f in files)
    n_out = max(1, math.ceil(total / target_file_bytes))
    tmp = path.rstrip("/") + ".compact.tmp"
    spark.read.parquet(path).coalesce(n_out).write.mode("overwrite").parquet(tmp)
    old = path.rstrip("/") + ".compact.old"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return n_out


FORMATS = ("parquet", "orc", "json", "csv")


def write_format(df: DataFrame, path: str, fmt: str) -> None:
    """Write a table in any supported interchange format.

    Format guidance at scale: parquet/ORC are the only sane 100 TB rest
    formats (columnar, compressed, predicate-pushdown-able, typed). JSON
    and CSV exist for interchange with systems that need them — both are
    row-oriented text with no pushdown and (CSV especially) lossy types,
    so they are EXPORT formats, never the lake layout.
    """
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    w = df.write.mode("overwrite")
    if fmt == "csv":
        w = w.option("header", True)
    w.format(fmt).save(path)


def read_format(spark: SparkSession, path: str, fmt: str, schema=None) -> DataFrame:
    """Read any supported format back. For the text formats a declared
    schema is required to round-trip types (CSV stores everything as
    strings; JSON would re-infer by scanning — never infer on production
    paths, and inference is impossible on streams anyway)."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    r = spark.read
    if fmt in ("json", "csv"):
        if schema is None:
            raise ValueError(f"{fmt} read requires an explicit schema")
        r = r.schema(schema)
    if fmt == "csv":
        r = r.option("header", True)
    return r.format(fmt).load(path)
