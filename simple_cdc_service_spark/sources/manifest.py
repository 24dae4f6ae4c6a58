"""File-level statistics manifest and scan pruning [EXT].

The reference reads one Kafka topic and writes one table — it has no scan
planner at all. At 100 TB the scan planner IS the query time: a filter
that touches 1% of the key space should read ~1% of the files, which is
what Iceberg/Delta do with file-level min/max manifests. Parquet already
stores per-row-group min/max, but the engine must still OPEN every footer
(one object-store round trip per file) before it can skip; a manifest
table moves that metadata into ONE small table consulted at plan time.

This module builds that manifest with Spark itself:

  * `build_manifest` distributes the footer reads — the file list becomes
    a DataFrame, executors open footers with pyarrow (no row data read)
    and emit (file, column, min, max, rows). O(#files) metadata work with
    full cluster parallelism, exactly how Iceberg builds manifests.
  * `prune_files` evaluates an interval predicate against the manifest —
    a driver-side query over a tiny table, returning the file subset.
  * `read_pruned` reads ONLY the surviving files and re-applies the
    predicate (file stats are necessary, not sufficient).

Min/max pruning is only as good as the physical layout: files written in
key order have disjoint ranges (perfect pruning); files written in
arrival order all span the whole key range (no pruning). See layout.py
for the z-order writer that makes MULTI-column pruning work.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("file", T.StringType(), False),
        T.StructField("column", T.StringType(), False),
        T.StructField("min_val", T.DoubleType(), True),
        T.StructField("max_val", T.DoubleType(), True),
        T.StructField("n_rows", T.LongType(), False),
    ]
)


def build_manifest(
    spark: SparkSession, path: str, columns: list[str]
) -> DataFrame:
    """Distributed manifest build: one row per (file, numeric column)
    with file-level min/max folded over the parquet row-group stats.
    Executors read FOOTERS only (pyarrow metadata, no data pages)."""
    files = sorted(
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")
    )
    if not files:
        return spark.createDataFrame([], _MANIFEST_SCHEMA)
    fdf = spark.createDataFrame([(f,) for f in files], "file string").repartition(
        min(len(files), spark.sparkContext.defaultParallelism)
    )

    def footer_stats(batches):
        import pandas as pd
        import pyarrow.parquet as pq

        for pdf in batches:
            rows = []
            for fname in pdf["file"]:
                md = pq.ParquetFile(fname).metadata
                idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
                for col in columns:
                    lo, hi = None, None
                    for rg in range(md.num_row_groups):
                        st = md.row_group(rg).column(idx[col]).statistics
                        if st is None or not st.has_min_max:
                            lo, hi = None, None
                            break
                        mn, mx = float(st.min), float(st.max)
                        lo = mn if lo is None else min(lo, mn)
                        hi = mx if hi is None else max(hi, mx)
                    rows.append(
                        {
                            "file": fname,
                            "column": col,
                            "min_val": lo,
                            "max_val": hi,
                            "n_rows": md.num_rows,
                        }
                    )
            yield pd.DataFrame(rows)

    return fdf.mapInPandas(footer_stats, _MANIFEST_SCHEMA)


def prune_files(
    manifest: DataFrame, column: str, lo: float, hi: float
) -> list[str]:
    """Files whose [min, max] interval for ``column`` intersects
    [lo, hi]. Files with missing stats are kept (pruning must never drop
    rows). The manifest is tiny — this collect is O(#files) metadata."""
    rows = (
        manifest.filter(F.col("column") == column)
        .filter(
            F.col("min_val").isNull()
            | ((F.col("max_val") >= lo) & (F.col("min_val") <= hi))
        )
        .select("file")
        .collect()
    )
    return sorted(r.file for r in rows)


def read_pruned(
    spark: SparkSession,
    manifest: DataFrame,
    column: str,
    lo: float,
    hi: float,
    schema: T.StructType | None = None,
) -> DataFrame:
    """Read only the files surviving manifest pruning, then re-apply the
    exact predicate (stats admit false positives, never false negatives).
    Returns an empty-but-typed frame when nothing survives; pass
    ``schema`` to type that frame when the manifest itself may be empty
    (no files at all → no footer to borrow a schema from)."""
    files = prune_files(manifest, column, lo, hi)
    if not files:
        any_file = manifest.select("file").limit(1).collect()
        if not any_file:
            if schema is None:
                raise ValueError(
                    "read_pruned on an empty manifest needs an explicit "
                    "schema for the empty result frame"
                )
            return spark.createDataFrame([], schema)
        return (
            spark.read.parquet(any_file[0].file).filter(F.lit(False))
        )
    return spark.read.parquet(*files).filter(
        (F.col(column) >= lo) & (F.col(column) <= hi)
    )
