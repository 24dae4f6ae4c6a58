"""Skew-aware aggregation: two-stage salted aggregate.

When the group-key cardinality is far below the cluster's parallelism (or
one key is disproportionately hot), a plain groupBy lands whole key groups
on single reducers. Salting splits each key into ``salt_buckets`` synthetic
sub-keys, aggregates partially per (key, salt), then merges the partials —
the first shuffle fans out over key×salt, the second moves only
|keys|×|salt| pre-aggregated rows.

Note Spark's map-side partial aggregation already handles *moderate* skew
for algebraic aggregates; explicit salting is for the regime where even
the reduce-side per-key row count (one per map task) or the final
combine work is too much for one task — or for non-algebraic aggregates
(exact distinct, collect) where map-side combine can't reduce the data.
AQE's skew handling only splits *join* partitions, not aggregation keys,
so this pattern stays necessary at 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# Aggregates that decompose as partial → merge over the salted sub-groups.
_MERGEABLE = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-stage salted aggregation.

    aggs: output_name -> (fn, input_col) with fn in sum/count/min/max.

    The salt must spread a hot key's ROWS uniformly — hashing row CONTENT
    (xxhash64 over all columns) fails exactly in the canonical hot-key
    shape, counting byte-identical duplicate rows: every duplicate hashes
    to the same salt and still lands on one reducer. Instead the salt is
    ``monotonically_increasing_id() % buckets`` — a per-row position
    (partition-id ‖ in-partition counter), so identical rows get different
    salts. It is deterministic for a fixed input partitioning and only
    shapes the INTERMEDIATE split; the final merged aggregate is identical
    under any salt assignment (pinned by the oracle test).
    """
    salt = (F.monotonically_increasing_id() % salt_buckets).alias("__salt")
    partials = [
        _MERGEABLE[fn][0](F.col(col)).alias(f"__p_{out}") for out, (fn, col) in aggs.items()
    ]
    finals = [
        _MERGEABLE[fn][1](F.col(f"__p_{out}")).alias(out) for out, (fn, col) in aggs.items()
    ]
    stage1 = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(*partials)
    return stage1.groupBy(*keys).agg(*finals)
