"""Debezium schema-change event handling [REF, activated].

The reference ENABLES schema-change capture (`include.schema.changes:
"true"`, debezium-config-push.sh:21) but never consumes the events — the
consumer hard-codes its column list (main.py:52). Debezium publishes these
events on the connector-name topic (here `source`), one JSON envelope per
DDL, carrying the parsed post-DDL table structure in `tableChanges`
(shape per the public Debezium MySQL connector docs: databaseName, ddl,
tableChanges[].table.{primaryKeyColumnNames, columns[].{name, typeName,
position, optional}}).

Here they become first-class: parse the envelopes, reduce to the LATEST
structure per table (max_by over the stream position — same collapse
pattern as the data path), and derive the (ChangeTableConfig, row
StructType) pair the replica-merge sinks take. The merge itself already
tolerates evolution (unionByName(allowMissingColumns) backfills NULLs —
pipeline.py), so activating a new schema is: read this topic, rebuild the
config, restart the sink. At 100 TB that beats re-inferring schemas from
data (never infer on a stream) and removes the reference's hard-coded
column-list failure mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import ChangeTableConfig

# Debezium logical/JDBC type names → Spark types. Unlisted names fall back
# to StringType (lossless for replication; a warning column would flag it).
_TYPE_MAP = {
    "INT": T.LongType(),  # MySQL INT is UInt-capable upstream; Long is safe
    "INTEGER": T.LongType(),
    "TINYINT": T.IntegerType(),
    "SMALLINT": T.IntegerType(),
    "MEDIUMINT": T.IntegerType(),
    "BIGINT": T.LongType(),
    "FLOAT": T.DoubleType(),
    "DOUBLE": T.DoubleType(),
    "DECIMAL": T.DoubleType(),
    "VARCHAR": T.StringType(),
    "CHAR": T.StringType(),
    "TEXT": T.StringType(),
    "DATE": T.StringType(),
    "DATETIME": T.StringType(),
    "TIMESTAMP": T.StringType(),
    "BOOLEAN": T.BooleanType(),
    "TINYINT UNSIGNED": T.IntegerType(),
    "INT UNSIGNED": T.LongType(),
    "BIGINT UNSIGNED": T.LongType(),
    "BLOB": T.BinaryType(),
    "VARBINARY": T.BinaryType(),
}

_COLUMN = T.StructType(
    [
        T.StructField("name", T.StringType(), True),
        T.StructField("typeName", T.StringType(), True),
        T.StructField("position", T.IntegerType(), True),
        T.StructField("optional", T.BooleanType(), True),
    ]
)

_TABLE_CHANGE = T.StructType(
    [
        T.StructField("type", T.StringType(), True),  # CREATE / ALTER / DROP
        T.StructField("id", T.StringType(), True),  # "db"."table"
        T.StructField(
            "table",
            T.StructType(
                [
                    T.StructField(
                        "primaryKeyColumnNames", T.ArrayType(T.StringType()), True
                    ),
                    T.StructField("columns", T.ArrayType(_COLUMN), True),
                ]
            ),
            True,
        ),
    ]
)

SCHEMA_CHANGE_SCHEMA = T.StructType(
    [
        T.StructField(
            "payload",
            T.StructType(
                [
                    T.StructField("ts_ms", T.LongType(), True),
                    T.StructField("databaseName", T.StringType(), True),
                    T.StructField("ddl", T.StringType(), True),
                    T.StructField("tableChanges", T.ArrayType(_TABLE_CHANGE), True),
                ]
            ),
            True,
        )
    ]
)


def parse_schema_changes(kafka_df: DataFrame) -> DataFrame:
    """Kafka-shaped (offset, timestamp, value) → one row per table change:
    (offset, ts_ms, db, table_id, change_type, ddl, pk_columns, columns).
    Tombstones and malformed messages are dropped (same guards as the data
    path, sources/changelog.parse_envelopes)."""
    parsed = (
        kafka_df.filter(F.col("value").isNotNull())
        .withColumn("msg", F.from_json(F.col("value").cast("string"), SCHEMA_CHANGE_SCHEMA))
        .filter(F.col("msg.payload").isNotNull())
        .select(
            "offset",
            F.col("msg.payload.ts_ms").alias("ts_ms"),
            F.col("msg.payload.databaseName").alias("db"),
            F.col("msg.payload.ddl").alias("ddl"),
            F.explode(F.col("msg.payload.tableChanges")).alias("tc"),
        )
    )
    return parsed.select(
        "offset",
        "ts_ms",
        "db",
        F.col("tc.id").alias("table_id"),
        F.col("tc.type").alias("change_type"),
        "ddl",
        F.col("tc.table.primaryKeyColumnNames").alias("pk_columns"),
        F.col("tc.table.columns").alias("columns"),
    )


def latest_table_structures(changes: DataFrame) -> DataFrame:
    """Collapse the schema-change stream to the CURRENT structure per
    table: last change wins by offset (max_by — the same last-event-per-key
    collapse as the data replica), DROPs removed. Fully distributed."""
    last = (
        changes.groupBy("table_id")
        .agg(
            F.max_by(
                F.struct(
                    F.col("change_type"), F.col("pk_columns"), F.col("columns")
                ),
                F.col("offset"),
            ).alias("cur")
        )
        .select(
            "table_id",
            F.col("cur.change_type").alias("change_type"),
            F.col("cur.pk_columns").alias("pk_columns"),
            F.col("cur.columns").alias("columns"),
        )
    )
    return last.filter(F.col("change_type") != "DROP")


def spark_type_for(type_name: str) -> T.DataType:
    return _TYPE_MAP.get((type_name or "").upper(), T.StringType())


def config_from_structure(row) -> tuple[ChangeTableConfig, T.StructType]:
    """One latest_table_structures row → (ChangeTableConfig, row schema)
    for the replica-merge sinks. Table name is the unquoted last segment of
    the Debezium id ("db"."table"); key columns come from
    primaryKeyColumnNames; value columns are the rest in DDL position
    order."""
    name = row.table_id.replace('"', "").split(".")[-1]
    cols = sorted(row.columns, key=lambda c: c.position or 0)
    keys = tuple(row.pk_columns or ())
    values = tuple(c.name for c in cols if c.name not in keys)
    schema = T.StructType(
        [T.StructField(c.name, spark_type_for(c.typeName), True) for c in cols]
    )
    return (
        ChangeTableConfig(name=name, key_columns=keys, value_columns=values),
        schema,
    )


def table_configs_from_changes(
    kafka_df: DataFrame,
) -> dict[str, tuple[ChangeTableConfig, T.StructType]]:
    """End-to-end: schema-change topic frame → {table: (config, schema)} —
    the exact `tables` argument of start_multi_table_merge. The collapse is
    distributed; only the per-table STRUCTURES (a handful of rows) are
    collected to build driver-side configs."""
    rows = latest_table_structures(parse_schema_changes(kafka_df)).collect()
    out = {}
    for row in rows:
        cfg, schema = config_from_structure(row)
        out[cfg.name] = (cfg, schema)
    return out
