"""Physical layout: z-order clustering for multi-column scan pruning [EXT].

A linear sort makes file min/max ranges disjoint on ONE column — pruning
on any other column reads everything. Z-ordering interleaves the bits of
several columns into one clustering key, so a range predicate on ANY of
them maps to a bounded set of key ranges — every participating column
prunes, each a little worse than it would under its own dedicated sort.
This is Delta OPTIMIZE ZORDER BY / Iceberg sort-order rewrite; at 100 TB
it is the difference between "the time filter prunes but the user filter
scans everything" and both pruning.

Everything is JVM expressions (shift/mask/or inside whole-stage codegen);
the write is one range-shuffle by the z-key — the same cost as any sorted
write — so clustering is a pure layout decision, not an extra pass.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def scale_to_bits(col: Column, lo: float, hi: float, bits: int = 8) -> Column:
    """Map a numeric column linearly onto the integer grid [0, 2^bits).
    Bounds come from table stats (a prior 1-row aggregate at production
    scale); values outside clamp to the edge cells — pruning stays
    correct because clamping only widens file ranges, never drops rows."""
    cells = (1 << bits) - 1
    scaled = ((col.cast("double") - lo) / (hi - lo) * cells).cast("long")
    return F.greatest(F.lit(0), F.least(F.lit(cells), scaled))


def zorder_key(cols: list[Column], bits: int = 8) -> Column:
    """Interleave the low ``bits`` bits of each (already bit-scaled)
    column into one Morton key: bit i of column j lands at position
    i*ncols + j. Pure shift/mask/or — whole-stage-codegen eligible."""
    ncols = len(cols)
    terms = [
        F.shiftleft(F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1)), i * ncols + j)
        for j, c in enumerate(cols)
        for i in range(bits)
    ]
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: dict[str, tuple[float, float]],
    n_files: int = 16,
    bits: int = 8,
) -> None:
    """Write parquet clustered by the z-order of ``cols`` (column →
    (lo, hi) stat bounds): range-shuffle into ``n_files`` key ranges,
    sort within each, drop the key. One shuffle, same as any sorted
    write; the payoff is that a manifest over ANY of the z-columns
    prunes (see sources/manifest.py)."""
    z = zorder_key(
        [scale_to_bits(F.col(c), lo, hi, bits) for c, (lo, hi) in cols.items()],
        bits,
    )
    (
        df.withColumn("_zkey", z)
        .repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def write_linear(df: DataFrame, path: str, col: str, n_files: int = 16) -> None:
    """Baseline layout: range-sorted on a single column. Perfect pruning
    on that column, none on any other — the comparison point the z-order
    tests measure against."""
    (
        df.repartitionByRange(n_files, F.col(col))
        .sortWithinPartitions(col)
        .write.mode("overwrite")
        .parquet(path)
    )
