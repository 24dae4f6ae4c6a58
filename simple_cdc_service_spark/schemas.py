"""Explicit schemas.

The reference ships the envelope schema inline in every Kafka message but
ignores it and hard-codes field access (main.py:49-51). On a stream we must
never infer schemas; everything here is a declared StructType
(SURVEY.md §1.2).
"""

from __future__ import annotations

from pyspark.sql import types as T


def row_schema(columns: dict[str, T.DataType]) -> T.StructType:
    """Schema of one table row (the `before`/`after` payload)."""
    return T.StructType([T.StructField(c, t, True) for c, t in columns.items()])


# The reference table's row type: both columns INT in MySQL
# (mysql/init-script/script.sql:4-5), UInt64 in ClickHouse
# (clickhouse/init-script/db-table-init.sql:13-14) → LongType (Spark has no
# unsigned; SURVEY.md §1.2).
INVOICE_ROW = row_schema({"order_id": T.LongType(), "invoice_number": T.LongType()})


def debezium_envelope_schema(row: T.StructType) -> T.StructType:
    """Debezium change-event envelope, payload part.

    Transcribed from the reference's example envelopes
    (kafka-consumer-service/example/insert.json:169-195): nullable
    ``before``/``after`` row structs (null-ness is the op discriminator the
    consumer actually branches on, main.py:49,54,75,88), the ``source``
    block with binlog coordinates (file/pos/row, insert.json:186-190), the
    op code ('c'/'u'/'d'/'t'/'r'), and ``ts_ms``.

    The inline ``schema`` half of the Kafka message is intentionally not
    modeled: the consumer ignores it (SURVEY.md §1.2) and at 100 TB you do
    not want to ship a schema description per record through the plan.
    """
    source = T.StructType(
        [
            T.StructField("version", T.StringType(), True),
            T.StructField("connector", T.StringType(), True),
            T.StructField("name", T.StringType(), True),
            T.StructField("ts_ms", T.LongType(), True),
            T.StructField("snapshot", T.StringType(), True),
            T.StructField("db", T.StringType(), True),
            T.StructField("sequence", T.StringType(), True),
            T.StructField("table", T.StringType(), True),
            T.StructField("server_id", T.LongType(), True),
            T.StructField("gtid", T.StringType(), True),
            T.StructField("file", T.StringType(), True),
            T.StructField("pos", T.LongType(), True),
            T.StructField("row", T.IntegerType(), True),
            T.StructField("thread", T.LongType(), True),
            T.StructField("query", T.StringType(), True),
        ]
    )
    transaction = T.StructType(
        [
            T.StructField("id", T.StringType(), True),
            T.StructField("total_order", T.LongType(), True),
            T.StructField("data_collection_order", T.LongType(), True),
        ]
    )
    return T.StructType(
        [
            T.StructField("before", row, True),
            T.StructField("after", row, True),
            T.StructField("source", source, True),
            T.StructField("op", T.StringType(), True),
            T.StructField("ts_ms", T.LongType(), True),
            T.StructField("transaction", transaction, True),
        ]
    )


INVOICE_ENVELOPE = debezium_envelope_schema(INVOICE_ROW)

# Kafka messages wrap the payload: {"schema": {...}, "payload": {...}}.
# We parse only payload (consumer behavior, main.py:49).
def kafka_message_schema(row: T.StructType) -> T.StructType:
    return T.StructType([T.StructField("payload", debezium_envelope_schema(row), True)])


# Raw event log, mirroring dev.kafka_message_log
# (clickhouse/init-script/db-table-init.sql:3-9): broker timestamp (ms) +
# the raw message string.
EVENT_LOG = T.StructType(
    [
        T.StructField("timestamp", T.LongType(), False),
        T.StructField("kafka_message", T.StringType(), False),
    ]
)
