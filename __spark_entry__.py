"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``simple_cdc_service_spark`` — this file only
adapts the registry to the driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from simple_cdc_service_spark.registry import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the CDC changelog collapse (reference raison d'être,
    kafka-consumer-service/main.py:47-93) on sf0.001."""
    return REGISTRY["cdc_snapshot"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    # oracle_setup-backed entries (Python-UDF / reference-implementation
    # oracles) are excluded: the driver runs these SQL strings on a vanilla
    # DuckDB connection with no UDFs registered. They are hash-checked by
    # tools/check_oracle.py instead (CORRECTNESS_FULL artifacts).
    return {
        name: spec.oracle
        for name, spec in REGISTRY.items()
        if spec.oracle is not None and spec.oracle_setup is None
    }
