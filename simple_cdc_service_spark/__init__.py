"""simple_cdc_service_spark — a PySpark-native engine with the query and
data-processing capabilities of the reference CDC pipeline
(`ilhamhanif/simple-cdc-service`), rebuilt Spark-first.

The reference is a MySQL → Debezium → Kafka → ClickHouse change-data-capture
pipeline whose core computation is: given a stream of Debezium change events
for a keyed table, maintain (a) an append-only raw event log and (b) an
exactly-synchronized materialized replica of the source table
(reference: kafka-consumer-service/main.py:20-93).

This package re-expresses that computation — plus the large-scale
training-data-pipeline extensions (dedup, similarity search, multimodal
columns, text analysis) — as declarative DataFrame plans that Catalyst can
optimize, designed for a 1000-executor cluster even though tests run on
local mode.

Layout:
    session.py     SparkSession factory (AQE, Arrow, UTC session tz)
    config.py      ChangeTableConfig — replaces the reference's hard-coded
                   table/key/column literals (main.py:29,52,57)
    schemas.py     explicit StructTypes (Debezium envelope, changelog, log)
    sources/       table loaders, changelog derivation + seeded generator
    operators/     cdc, relational, dedup, similarity, text, multimodal,
                   windows
    functions/     reusable Column-level helpers (vector math, hashing)
    streaming/     Structured Streaming pipelines (raw log sink, replica
                   merge via foreachBatch, streaming dedup)
    plans/         explain/plan-inspection helpers
"""

__version__ = "0.1.0"

# Public API — the operators a user of the reference pipeline would reach
# for first. (Submodules remain importable for the full surface.)
from .config import INVOICE, USER_VALUE, ChangeTableConfig  # noqa: E402,F401
from .operators.cdc import (  # noqa: E402,F401
    classify_op,
    collapse_changelog,
    consistency_diff,
    snapshot_from_envelopes,
    truncate_epoch_filter,
)
from .session import get_spark  # noqa: E402,F401
