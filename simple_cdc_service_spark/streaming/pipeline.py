"""Structured Streaming rebuild of the reference consumer loop
(kafka-consumer-service/main.py:20-93).

The reference: one synchronous Python loop, `latest` offsets, no consumer
group — a restart silently drops everything (main.py:25-28). Here the same
dataflow is a checkpointed Structured Streaming job:

    readStream (Kafka or file-JSON in tests)
      ├─ sink 1: raw event log, append-only       (R4, main.py:42-45)
      └─ sink 2: foreachBatch replica merge       (R5-R11, main.py:47-93)

which upgrades delivery to effectively-exactly-once: offsets live in the
checkpoint, and the merge is idempotent per micro-batch (re-running a
failed batch rewrites the same state version).

Scale notes:
  * The replica merge below materializes state as versioned parquet
    (state/v{batchId}) with an anti-join + union — O(|state|) rewrite per
    batch. That is the correct *local* stand-in; the production sink is
    Delta/Iceberg MERGE where file-level key stats prune the rewrite to
    touched files. The collapse half (per-batch last-event-per-key) is the
    same max_by aggregate as the batch operator and carries all the same
    scale properties.
  * Kafka parallelism = topic partitions; OFFSETS ONLY ORDER WITHIN ONE
    PARTITION, so Kafka (partition, offset) is not a total order over a
    multi-partition topic. The batch-local collapse therefore orders by
    the Debezium binlog coordinates (source.file, source.pos, source.row)
    — a total order assigned by the single source database, valid however
    the events were partitioned in transit — with the Kafka offset as a
    fallback for sources that lack them (the file-JSON test stand-in).
    The reference gets ordering implicitly from a single-partition topic
    and one consumer (main.py:25-29); binlog coordinates are the explicit
    contract that survives scaling the topic out.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import ChangeTableConfig
from ..operators.cdc import classify_op
from ..schemas import INVOICE_ROW, kafka_message_schema

KAFKA_LIKE_SCHEMA = "offset long, timestamp long, value string"


def read_changelog_stream(spark: SparkSession, path: str) -> DataFrame:
    """Test-mode source: a directory of JSON-lines files with Kafka-shaped
    records (offset, timestamp, value). Swap for the real Kafka source with
    ``kafka_changelog_stream`` — everything downstream is identical."""
    return spark.readStream.schema(KAFKA_LIKE_SCHEMA).json(path)


def kafka_changelog_stream(
    spark: SparkSession, bootstrap: str, topic: str, starting: str = "earliest"
) -> DataFrame:
    """Production source (reference subscribes to source.dev.invoice,
    main.py:25-29 — but with `latest` and no group; we default to
    `earliest` + checkpointing so restarts replay instead of dropping).
    Not exercised in tests (no broker in the container); the returned frame
    has the same (offset, timestamp, value) shape as the test source, plus
    the Kafka partition. NB: (partition, offset) is NOT a total order — the
    merge orders by the Debezium binlog coordinates carried inside the
    envelope (see module docstring)."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", starting)
        .load()
    )
    return raw.select(
        F.col("partition"),
        F.col("offset"),
        F.unix_millis(F.col("timestamp")).alias("timestamp"),
        F.col("value").cast("string").alias("value"),
    )


def _parse(stream: DataFrame, row_schema) -> DataFrame:
    """Tombstone-filter + envelope decode (R2+R3), streaming-safe.

    Drops corrupt (unparseable) messages — without the payload-not-null
    guard a malformed record would classify as truncate and wipe the
    replica (see sources/changelog.parse_envelopes)."""
    return (
        stream.filter(F.col("value").isNotNull())
        .withColumn("msg", F.from_json(F.col("value"), kafka_message_schema(row_schema)))
        .filter(F.col("msg.payload").isNotNull())
        .select(
            "offset",
            "timestamp",
            F.col("value").alias("raw"),
            F.col("msg.payload.before").alias("before"),
            F.col("msg.payload.after").alias("after"),
            F.col("msg.payload.source.table").alias("source_table"),
            # Binlog coordinates: the cross-partition total order for the
            # merge (module docstring). NULL for sources without them.
            F.col("msg.payload.source.file").alias("source_file"),
            F.col("msg.payload.source.pos").alias("source_pos"),
            F.col("msg.payload.source.row").alias("source_row"),
        )
    )


def _order_coordinate() -> F.Column:
    """The changelog total-order coordinate: Debezium binlog position
    (file, pos, row) first — valid across Kafka partitions — with the
    Kafka offset both as a tiebreaker and as the fallback when the source
    carries no binlog metadata (file-JSON test stand-in, non-Debezium
    feeds). Struct comparison is lexicographic, so rows WITH coordinates
    order by them and coordinate-free streams degrade to offset order
    (the single-partition assumption the reference always makes)."""
    return F.struct(
        F.coalesce(F.col("source_file"), F.lit("")).alias("f"),
        F.coalesce(F.col("source_pos"), F.col("offset")).alias("p"),
        F.coalesce(F.col("source_row"), F.lit(0)).alias("r"),
        F.col("offset").alias("o"),
    )


def start_event_log_sink(
    stream: DataFrame,
    out_dir: str,
    checkpoint: str,
    trigger_available_now: bool = True,
    partition_by_day: bool = False,
):
    """Sink 1: append-only raw log (timestamp, kafka_message) — the
    dev.kafka_message_log table (clickhouse/init-script/db-table-init.sql:3-9).
    Pure projection, no shuffle. ``partition_by_day`` adds a derived
    log_date partition column — at scale that is what makes retention a
    directory delete and time-scoped replays a pruned scan (and it bounds
    compact_parquet_dir to closed partitions)."""
    log = stream.filter(F.col("value").isNotNull()).select(
        F.col("timestamp").cast("long").alias("timestamp"),
        F.col("value").alias("kafka_message"),
    )
    writer = log
    if partition_by_day:
        log = log.withColumn(
            "log_date", F.date_format(F.timestamp_millis(F.col("timestamp")), "yyyy-MM-dd")
        )
    writer = (
        log.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if partition_by_day:
        writer = writer.partitionBy("log_date")
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _state_versions(state_dir: str) -> list[int]:
    if not os.path.isdir(state_dir):
        return []
    out = []
    for d in os.listdir(state_dir):
        if d.startswith("v") and d[1:].isdigit() and os.path.exists(
            os.path.join(state_dir, d, "_SUCCESS")
        ):
            out.append(int(d[1:]))
    return sorted(out)


def read_replica(
    spark: SparkSession, state_dir: str, before: int | None = None
) -> DataFrame | None:
    """Current replica state (latest committed version), or None.
    ``before`` reads the latest version STRICTLY BELOW that batch id —
    what a batch-N merge must read so that re-running batch N (crash
    replay) derives from N's true predecessor, never from its own
    partially-committed output."""
    versions = _state_versions(state_dir)
    if before is not None:
        versions = [v for v in versions if v < before]
    if not versions:
        return None
    return spark.read.parquet(os.path.join(state_dir, f"v{versions[-1]}"))


def _batch_last_per_key(parsed: DataFrame, cfg: ChangeTableConfig):
    """Shared micro-batch collapse: envelope_changelog derivation (same as
    the batch snapshot — including the PK-changing-update explode into
    delete(before.key) + insert(after.key)), truncate-epoch filter, and
    last-event-per-key by the binlog-coordinate total order. Returns
    (batch_last, had_truncate, cached) with final deletes KEPT (they must
    erase existing state); ``cached`` is the persisted per-batch changelog
    the CALLER must unpersist after its last action. Persisting is the
    right call here and only here: a micro-batch is bounded (spills if
    not) and every batch runs ≥3 actions over this derivation
    (emptiness probe, truncate probe, merge write, optional agg) — without
    the cache the parse→explode pipeline re-runs for each."""
    from ..operators.cdc import envelope_changelog, truncate_epoch_filter

    changelog = envelope_changelog(
        parsed.withColumn("__ord", _order_coordinate()), cfg, passthrough_cols=("__ord",)
    ).persist()
    # One probe job for emptiness AND truncate presence (each separate
    # action costs fixed scheduling latency per micro-batch).
    probe = changelog.agg(
        F.count("*").alias("n"),
        F.sum((F.col(cfg.op_column) == "t").cast("int")).alias("nt"),
    ).collect()[0]
    if probe.n == 0:
        changelog.unpersist(blocking=False)
        return None, False, None
    had_truncate = (probe.nt or 0) > 0
    live = truncate_epoch_filter(changelog, cfg.op_column, "__ord")
    payload = F.struct(
        F.col(cfg.op_column).alias("__op"),
        *[F.col(c) for c in cfg.value_columns],
    )
    batch_last = (
        live.groupBy(*cfg.key_columns)
        .agg(F.max_by(payload, F.col("__ord")).alias("__last"))
        .select(
            *cfg.key_columns,
            F.col("__last.__op").alias("__op"),
            *[F.col(f"__last.{c}").alias(c) for c in cfg.value_columns],
        )
    )
    return batch_last, had_truncate, changelog


def read_agg(spark: SparkSession, state_dir: str, before: int | None = None):
    """Latest committed incremental-aggregate row (sum_value, n_keys) for
    a replica maintained with agg_col, or None."""
    agg_dir = os.path.join(state_dir, "agg")
    versions = _state_versions(agg_dir)
    if before is not None:
        versions = [v for v in versions if v < before]
    if not versions:
        return None
    rows = spark.read.parquet(os.path.join(agg_dir, f"v{versions[-1]}")).collect()
    return rows[0] if rows else None


def _merge_parsed_batch(
    parsed: DataFrame,
    cfg: ChangeTableConfig,
    state_dir: str,
    batch_id: int,
    agg_col: str | None = None,
) -> None:
    """One micro-batch of parsed envelopes → merged versioned state.
    Shared by the single-table and multi-table merge sinks.

    Crash-recovery replay: foreachBatch re-delivers batch N when the job
    died after the merge committed but before the checkpoint recorded it.
    v{N} already holding a _SUCCESS marker IS that case — without the guard
    read_replica() would return v{N} itself and the overwrite would delete
    the directory out from under the job reading it (FAILED_READ_FILE
    crash loop). Skipping is exactly idempotent: the committed version was
    derived from this same batch.

    ``agg_col`` turns on INCREMENTAL AGGREGATE MAINTENANCE (a streaming
    materialized view): alongside the state, a (sum_value, n_keys) row is
    kept at state_dir/agg/v{N}, updated by per-key DELTAS — upsert
    contributes (new − old), delete contributes (−old), truncate resets —
    so the aggregate is never recomputed from the full state. Per-batch
    cost is O(|batch| + one state lookup join), independent of the
    aggregate's history length. This is what the reference's consumers
    of the ClickHouse replica would run as a full re-aggregation per
    refresh; here the CDC stream maintains it exactly."""
    spark = parsed.sparkSession
    out = os.path.join(state_dir, f"v{batch_id}")
    # The last artifact written marks the whole batch committed: the agg
    # (when enabled) is written after the state, so its marker is the
    # commit point. A state-committed/agg-missing crash replays the batch,
    # which is safe: merges read before=batch_id, never their own output.
    commit_marker = (
        os.path.join(state_dir, "agg", f"v{batch_id}", "_SUCCESS")
        if agg_col
        else os.path.join(out, "_SUCCESS")
    )
    if os.path.exists(commit_marker):
        return
    batch_last, had_truncate, cached = _batch_last_per_key(parsed, cfg)
    if batch_last is None:
        return

    try:
        # before=batch_id: crash replay of batch N must merge onto N's true
        # predecessor, never onto N's own (possibly partial) output.
        current = (
            None if had_truncate else read_replica(spark, state_dir, before=batch_id)
        )
        upserts = batch_last.filter(F.col("__op") != "d").select(
            *cfg.key_columns, *cfg.value_columns
        )
        if current is not None:
            keys = batch_last.select(*cfg.key_columns)
            survivors = current.join(keys, list(cfg.key_columns), "left_anti")
            # allowMissingColumns: schema evolution. When the table config
            # grows a value column (Debezium schema-change events,
            # debezium-config-push.sh:21 — enabled but never consumed by the
            # reference), pre-evolution state rows simply carry NULL for the
            # new column instead of failing the union.
            new_state = survivors.unionByName(upserts, allowMissingColumns=True)
        else:
            new_state = upserts
        new_state.write.mode("overwrite").parquet(out)

        if agg_col is None:
            return
        # ---- incremental aggregate: old per-key values for TOUCHED keys only
        keys = list(cfg.key_columns)
        if current is not None:
            # __present is an explicit key-existence marker from the state
            # join. It must NOT be inferred from __old's nullness: schema
            # evolution (allowMissingColumns above) backfills NULL for the
            # new column on pre-evolution rows, so a present key can carry a
            # NULL agg value — inferring absence from that double-counts the
            # key on upsert (+1) and drops its delete (0), drifting n_keys.
            old_vals = current.select(
                *keys,
                F.col(agg_col).alias("__old"),
                F.lit(True).alias("__present"),
            )
            j = batch_last.join(old_vals, keys, "left")
        else:
            j = batch_last.withColumn(
                "__old", F.lit(None).cast("double")
            ).withColumn("__present", F.lit(None).cast("boolean"))
        is_del = F.col("__op") == "d"
        present = F.col("__present").isNotNull()
        old = F.coalesce(F.col("__old").cast("double"), F.lit(0.0))
        d_sum = F.when(is_del, -old).otherwise(F.col(agg_col).cast("double") - old)
        d_n = F.when(is_del, F.when(present, -1).otherwise(0)).otherwise(
            F.when(present, 0).otherwise(1)
        )
        deltas = j.agg(
            F.coalesce(F.sum(d_sum), F.lit(0.0)).alias("d_sum"),
            F.coalesce(F.sum(d_n), F.lit(0)).cast("long").alias("d_n"),
        ).collect()[0]
        base = None if had_truncate else read_agg(spark, state_dir, before=batch_id)
        base_sum = base.sum_value if base else 0.0
        base_n = base.n_keys if base else 0
        agg_out = os.path.join(state_dir, "agg", f"v{batch_id}")
        spark.createDataFrame(
            [(float(base_sum + deltas.d_sum), int(base_n + deltas.d_n))],
            "sum_value double, n_keys long",
        ).write.mode("overwrite").parquet(agg_out)
    finally:
        cached.unpersist(blocking=False)


def start_replica_merge(
    stream: DataFrame,
    cfg: ChangeTableConfig,
    state_dir: str,
    checkpoint: str,
    row_schema=INVOICE_ROW,
    trigger_available_now: bool = True,
    agg_col: str | None = None,
):
    """Sink 2: the replica, maintained by an idempotent per-batch merge.

    Per micro-batch (foreachBatch):
      1. classify + batch-local truncate-epoch + last-event-per-key
         (the same collapse_changelog plan as batch mode, but keeping
         final deletes so they can erase existing state);
      2. merge into current state: state rows whose key appears in the
         batch are dropped (anti join), surviving batch rows appended;
         a truncate in the batch wipes prior state entirely;
      3. write state version v{batchId} — re-running a batch after a crash
         rewrites the same version with the same content (idempotent), and
         readers only see versions with a _SUCCESS marker.

    Ordering contract: events for a key must not arrive in a LATER batch
    with an EARLIER binlog position — guaranteed when a key lives on one
    Kafka partition (Debezium keys by PK, so per-key order holds even on
    multi-partition topics). Within a batch, arrival order is irrelevant:
    the collapse orders by the binlog-coordinate total order
    (_order_coordinate), which is valid ACROSS partitions — offsets alone
    are not. PK-changing updates are handled as delete(before.key) +
    insert(after.key), identical to the batch snapshot path. If the source
    can violate cross-batch order, use start_stateful_replica, which
    tracks per-key max offset in state and skips stale events.
    """
    parsed_schema = row_schema

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        _merge_parsed_batch(
            _parse(batch_df, parsed_schema), cfg, state_dir, batch_id, agg_col=agg_col
        )

    writer = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_scd2(
    spark: SparkSession, state_dir: str, before: int | None = None
) -> DataFrame | None:
    """Latest committed SCD2 history version (see start_scd2_merge), or
    None. ``before`` has the same crash-replay contract as read_replica."""
    versions = _state_versions(state_dir)
    if before is not None:
        versions = [v for v in versions if v < before]
    if not versions:
        return None
    return spark.read.parquet(os.path.join(state_dir, f"v{versions[-1]}"))


def _merge_scd2_batch(
    parsed: DataFrame, cfg: ChangeTableConfig, state_dir: str, batch_id: int
) -> None:
    """One micro-batch of parsed envelopes → incrementally-maintained SCD2
    history (the streaming form of operators/cdc.scd2_history, with the
    same idempotent versioned-parquet protocol as the replica merge).

    Within the batch, versions and their closers come from the same
    lead() window the batch operator uses. Across batches, the only state
    rows that change are the OPEN versions of keys the batch touches:
    their valid_to becomes the key's FIRST in-batch event position (any
    op closes — an update supersedes, a delete terminates). Closed
    versions are immutable and pass through untouched, so per-batch cost
    is O(|batch| + one join against state) regardless of history length.
    A truncate in the batch wipes prior history entirely (only the live
    epoch is versioned — identical to the batch operator and R10).

    Replaying batches 1..N through this merge yields byte-identical
    history to running scd2_history over the concatenated changelog
    (pinned in test_streaming.py)."""
    from pyspark.sql.window import Window

    from ..operators.cdc import envelope_changelog, truncate_epoch_filter

    spark = parsed.sparkSession
    out = os.path.join(state_dir, f"v{batch_id}")
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return
    changelog = envelope_changelog(
        parsed.withColumn("__ord", _order_coordinate()), cfg, passthrough_cols=("__ord",)
    ).persist()
    try:
        probe = changelog.agg(
            F.count("*").alias("n"),
            F.sum((F.col(cfg.op_column) == "t").cast("int")).alias("nt"),
        ).collect()[0]
        if probe.n == 0:
            return
        had_truncate = (probe.nt or 0) > 0
        live = truncate_epoch_filter(changelog, cfg.op_column, "__ord")
        w = Window.partitionBy(*cfg.key_columns).orderBy("__ord")
        batch_versions = (
            live.select(
                *cfg.key_columns,
                *cfg.value_columns,
                F.col(cfg.op_column).alias("__op"),
                F.col("__ord").alias("valid_from"),
                F.lead("__ord").over(w).alias("valid_to"),
            )
            .filter(F.col("__op") != "d")
            .drop("__op")
            .withColumn("is_current", F.col("valid_to").isNull())
        )
        current = (
            None if had_truncate else read_scd2(spark, state_dir, before=batch_id)
        )
        if current is not None:
            closer = live.groupBy(*cfg.key_columns).agg(
                F.min("__ord").alias("__first")
            )
            keys = list(cfg.key_columns)
            touched_open = F.col("is_current") & F.col("__first").isNotNull()
            carried = (
                current.join(closer, keys, "left")
                .withColumn(
                    "valid_to",
                    F.when(touched_open, F.col("__first")).otherwise(
                        F.col("valid_to")
                    ),
                )
                .withColumn("is_current", F.col("is_current") & F.col("__first").isNull())
                .drop("__first")
            )
            new_state = carried.unionByName(
                batch_versions, allowMissingColumns=True
            )
        else:
            new_state = batch_versions
        new_state.write.mode("overwrite").parquet(out)
    finally:
        changelog.unpersist(blocking=False)


def start_scd2_merge(
    stream: DataFrame,
    cfg: ChangeTableConfig,
    state_dir: str,
    checkpoint: str,
    row_schema=INVOICE_ROW,
    trigger_available_now: bool = True,
):
    """SCD Type-2 history sink: the warehouse history table, maintained
    incrementally from the CDC stream (the streaming counterpart of the
    cdc_scd2 registry query). Same ordering contract and crash-replay
    idempotence as start_replica_merge; current versions of the history
    always equal the replica's state (pinned in tests)."""
    parsed_schema = row_schema

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        _merge_scd2_batch(_parse(batch_df, parsed_schema), cfg, state_dir, batch_id)

    writer = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_streaming_dedup(
    stream: DataFrame,
    out_dir: str,
    checkpoint: str,
    id_cols: list[str],
    ts_col: str = "event_time",
    watermark: str = "10 minutes",
    trigger_available_now: bool = True,
):
    """E2: streaming exact dedup with bounded state —
    dropDuplicatesWithinWatermark keeps each id only within the watermark
    horizon, so state size is O(events per watermark window), not O(stream).
    The CDC use: replayed Debezium events deduped by binlog coordinates."""
    deduped = stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(id_cols)
    writer = (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_windowed_counts(
    stream: DataFrame,
    out_dir: str,
    checkpoint: str,
    ts_col: str = "event_time",
    window: str = "1 hour",
    watermark: str = "2 hours",
    trigger_available_now: bool = True,
    slide: str | None = None,
):
    """E8 streaming form: watermarked tumbling-window counts, append mode
    (a window emits once it is below the watermark — late data beyond the
    watermark is dropped, the documented contrast to the reference's
    undefined late behavior, SURVEY.md §2). ``slide`` turns the windows
    sliding/hopping — each event feeds window/slide overlapping windows;
    state size grows by the same factor, watermarking unchanged."""
    win = (
        F.window(F.col(ts_col), window, slide)
        if slide
        else F.window(F.col(ts_col), window)
    )
    agg = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(win)
        .agg(F.count("*").alias("n"))
        .select(
            F.unix_millis(F.col("window.start")).alias("win_start"),
            F.col("n"),
        )
    )
    writer = (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_session_windows(
    stream: DataFrame,
    out_dir: str,
    checkpoint: str,
    ts_col: str = "event_time",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    trigger_available_now: bool = True,
):
    """E8 streaming session windows: gap-based sessions per key via the
    native session_window aggregation (state is merged session ranges, not
    raw events; a session emits once the watermark passes its close)."""
    agg = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap), F.col(key_col))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col(key_col),
            F.unix_millis(F.col("session_window.start")).alias("session_start"),
            F.unix_millis(F.col("session_window.end")).alias("session_end"),
            F.col("n_events"),
        )
    )
    writer = (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_stateful_replica(
    stream: DataFrame,
    out_dir: str,
    checkpoint: str,
    row_schema=INVOICE_ROW,
    trigger_available_now: bool = True,
):
    """E9: the replica as a CUSTOM STATEFUL OPERATOR — per-key running
    state via applyInPandasWithState instead of the foreachBatch merge.

    Each micro-batch emits one row per touched key with the post-batch
    state (latest value by offset, or a tombstone row when the latest event
    is a delete) — i.e. the update-mode changelog of the replica. State is
    one (offset, value, deleted) triple per key, checkpointed by Spark.

    Trade-off vs the foreachBatch MERGE (the default path): state lives in
    the streaming state store (fast key lookups, no target-table rewrite)
    but the queryable table must be derived from the emitted changelog;
    truncate events also cannot reach other keys' state from inside a
    per-key group — route streams with truncates through the foreachBatch
    path, which handles them exactly (test_streaming.py).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    parsed = _parse(stream, row_schema)
    cls = classify_op(F.col("before"), F.col("after"))
    flat = parsed.select(
        F.col("offset"),
        F.coalesce(F.col("after.order_id"), F.col("before.order_id")).alias("order_id"),
        F.col("after.invoice_number").alias("invoice_number"),
        cls.alias("op_class"),
    ).filter(F.col("op_class") != "truncate")

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        max_off, value, deleted = state.get if state.exists else (-1, None, False)
        for pdf in pdfs:
            pdf = pdf.sort_values("offset")
            for off, inv, op in zip(pdf["offset"], pdf["invoice_number"], pdf["op_class"]):
                if off <= max_off:
                    continue  # replayed/out-of-order duplicate: idempotent
                max_off = int(off)
                if op == "delete":
                    value, deleted = None, True
                else:
                    value, deleted = int(inv), False
        state.update((max_off, value, deleted))
        yield pd.DataFrame(
            [{"order_id": int(key[0]), "invoice_number": value, "is_deleted": deleted}]
        )

    out = flat.groupBy("order_id").applyInPandasWithState(
        update,
        outputStructType="order_id long, invoice_number long, is_deleted boolean",
        stateStructType="max_off long, invoice_number long, deleted boolean",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

    # The parquet file sink is append-only, while a stateful operator needs
    # update output mode — bridge with foreachBatch, appending each
    # micro-batch's state changelog.
    def append_batch(batch_df: DataFrame, _batch_id: int) -> None:
        batch_df.write.mode("append").parquet(out_dir)

    writer = (
        out.writeStream.foreachBatch(append_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_replica_bucketed(spark: SparkSession, state_dir: str) -> DataFrame | None:
    """Current state of the bucket-partitioned replica (all buckets)."""
    if not os.path.isdir(state_dir) or not any(
        d.startswith("bucket=") for d in os.listdir(state_dir)
    ):
        return None
    return spark.read.parquet(state_dir)


def start_replica_merge_bucketed(
    stream: DataFrame,
    cfg: ChangeTableConfig,
    state_dir: str,
    checkpoint: str,
    n_buckets: int = 16,
    row_schema=INVOICE_ROW,
    trigger_available_now: bool = True,
):
    """Replica merge with BOUNDED per-batch I/O: state is parquet
    partitioned by ``bucket = pmod(hash(key), n_buckets)`` and each
    micro-batch rewrites only the buckets containing touched keys
    (dynamic partition overwrite). With B total buckets and a batch
    touching k keys, the rewrite is O(state × min(k, B)/B) instead of
    O(state) — the plain-parquet approximation of what Delta/Iceberg
    MERGE does with file-level key statistics.

    Reads of untouched buckets are pruned away by the partition filter
    (bucket IN touched) — verified by test asserting untouched bucket
    files are byte-identical after a batch.

    Idempotency: re-running a batch re-derives the same touched-bucket
    contents (anti-join + union is idempotent) — even from a
    crash-interrupted overwrite, because survivors are computed from
    whatever generation each bucket holds and the batch's keys are
    re-applied on top.

    ATOMICITY WINDOW (the documented gap vs Delta/Iceberg MERGE, which is
    not installable in this container — NOTES.md): dynamic partition
    overwrite commits bucket directories one at a time, so a concurrent
    reader can observe bucket A post-batch and bucket B pre-batch. The
    window is bounded: (a) only buckets touched by the batch are ever
    mixed — untouched buckets are never rewritten (pinned by test); (b)
    within a bucket the swap is atomic at the directory-listing level
    (files are staged then moved); (c) a SINGLE-bucket batch — the common
    per-key-update case — is therefore fully atomic. Readers needing a
    consistent multi-bucket snapshot should read through the versioned
    merge (start_replica_merge), whose _SUCCESS-gated versions never serve
    a partial state; production swaps this sink for a transactional table
    format where the commit is one metadata operation.
    """

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        parsed = _parse(batch_df, row_schema)
        batch_last, had_truncate, cached = _batch_last_per_key(parsed, cfg)
        if batch_last is None:
            return
        try:
            bucket = F.pmod(
                F.hash(*[F.col(k) for k in cfg.key_columns]), F.lit(n_buckets)
            )
            batch_last = batch_last.withColumn("bucket", bucket)
            upserts = batch_last.filter(F.col("__op") != "d").select(
                *cfg.key_columns, *cfg.value_columns, "bucket"
            )
            if had_truncate:
                # State reset: must be a STATIC overwrite (every bucket dies,
                # not just buckets present in the post-truncate upserts).
                # Forced per-write because the merge path's dynamic mode would
                # otherwise leak in via session conf across micro-batches.
                upserts.write.mode("overwrite").option(
                    "partitionOverwriteMode", "static"
                ).partitionBy("bucket").parquet(state_dir)
                return
            current = read_replica_bucketed(spark, state_dir)
            if current is None:
                merged = upserts
            else:
                touched = [
                    r.bucket for r in batch_last.select("bucket").distinct().collect()
                ]
                # partition pruning: only touched buckets are read
                cur_touched = current.filter(F.col("bucket").isin(touched))
                keys = batch_last.select(*cfg.key_columns)
                survivors = cur_touched.join(keys, list(cfg.key_columns), "left_anti")
                merged = survivors.select(
                    *cfg.key_columns, *cfg.value_columns, "bucket"
                ).unionByName(upserts)
            # Per-write option, NOT session conf: mutating the session conf
            # here would persist into later micro-batches and silently turn
            # the truncate branch's full overwrite into a partial one.
            merged.write.mode("overwrite").option(
                "partitionOverwriteMode", "dynamic"
            ).partitionBy("bucket").parquet(state_dir)
        finally:
            cached.unpersist(blocking=False)

    writer = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ---------------------------------------------------------------------------
# Manifest store: versioned replica with FILE-LEVEL KEY STATISTICS
# (r10, VERDICT r9 #3 — the in-container stand-in for what Delta/Iceberg
# file stats do for MERGE, and the exact conclusion of the r9 bucketing
# negative: hash buckets spread hot keys across 100% of buckets, while
# min/max key ranges keep them in FEW files).
# ---------------------------------------------------------------------------


def _manifest_dir(state_dir: str) -> str:
    return os.path.join(state_dir, "manifest")


def _manifest_versions(state_dir: str) -> list[int]:
    import re

    d = _manifest_dir(state_dir)
    if not os.path.isdir(d):
        return []
    return sorted(
        int(m.group(1))
        for f in os.listdir(d)
        # negative versions are the RESERVED bootstrap range (v-1.json):
        # they sort before every foreachBatch micro-batch id, so a
        # bootstrapped store never collides with stream batch 0
        # (ADVICE r10)
        if (m := re.fullmatch(r"v(-?\d+)\.json", f))
    )


def _read_manifest(state_dir: str, version: int) -> dict:
    import json as _json

    with open(os.path.join(_manifest_dir(state_dir), f"v{version}.json")) as f:
        return _json.load(f)


def _latest_manifest(state_dir: str, before: int | None = None) -> dict | None:
    versions = _manifest_versions(state_dir)
    if before is not None:
        versions = [v for v in versions if v < before]
    if not versions:
        return None
    return _read_manifest(state_dir, versions[-1])


def _file_key_stats(path: str, key_col: str) -> tuple:
    """(rows, min, max, exact) for ``key_col`` from the parquet FOOTER —
    driver-side metadata only, no data pages. Parquet min/max statistics
    are VALID BOUNDS by spec even when truncated, so pruning against
    them can under-prune but never lose a key. ``exact=False`` (missing
    stats on a non-empty file) forces the file into every batch's
    touched set — conservative, never wrong."""
    import pyarrow.parquet as pq

    md = pq.read_metadata(path)
    idx = md.schema.to_arrow_schema().get_field_index(key_col)
    lo = hi = None
    ok = True
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(idx).statistics
        if st is None or not st.has_min_max:
            if md.row_group(rg).num_rows > 0:
                ok = False
            continue
        lo = st.min if lo is None else min(lo, st.min)
        hi = st.max if hi is None else max(hi, st.max)
    # stats must round-trip through the JSON manifest AND order-compare
    # against batch keys — non-JSON key types (timestamps, bytes) fall
    # back to always-touched rather than mis-compare
    if not (
        isinstance(lo, (int, float, str, type(None)))
        and isinstance(hi, (int, float, str, type(None)))
    ):
        return md.num_rows, None, None, False
    return md.num_rows, lo, hi, ok


def _any_key_in_range(sorted_keys: list, lo, hi) -> bool:
    """True iff any batch key falls inside [lo, hi] (bisect over the
    sorted batch key list — exact membership of the RANGE, so a file
    whose span contains no batch key is pruned even when batch keys
    straddle it)."""
    import bisect

    if lo is None or hi is None or not sorted_keys:
        return False
    i = bisect.bisect_left(sorted_keys, lo)
    return i < len(sorted_keys) and sorted_keys[i] <= hi


def read_replica_manifest(
    spark: SparkSession,
    state_dir: str,
    before: int | None = None,
    version: int | None = None,
) -> DataFrame | None:
    """Current state of the manifest store (latest committed manifest),
    or None. Untouched files are shared ACROSS versions by reference —
    reading version N touches only the files N's manifest lists.
    ``before`` has read_replica's crash-replay contract.

    ``version`` is TIME TRAVEL (r11): read the store exactly as of
    committed manifest version ``version`` (a micro-batch id, or the
    reserved bootstrap -1) — the Delta ``VERSION AS OF`` / Iceberg
    snapshot-id read, expressible here because every manifest is an
    immutable full file listing and untouched files are shared across
    versions by reference. The travel horizon is the vacuum retention
    window: ``vacuum_manifest_store(keep=k)`` deletes manifests (and
    then-unreferenced files) older than the newest ``k`` versions, so a
    vacuumed-away version raises KeyError naming what IS available.
    Compaction rewrites only the LATEST manifest (content-identical),
    so prior versions keep reading bit-identically after a compact.
    Mutually exclusive with ``before``."""
    if version is not None:
        if before is not None:
            raise ValueError("pass either before= or version=, not both")
        versions = _manifest_versions(state_dir)
        if version not in versions:
            raise KeyError(
                f"manifest version {version} not present in {state_dir} "
                f"(available: {versions} — older versions may have been "
                f"vacuumed; see vacuum_manifest_store keep=)"
            )
        m = _read_manifest(state_dir, version)
    else:
        m = _latest_manifest(state_dir, before=before)
    if m is None:
        return None
    paths = [os.path.join(state_dir, e["path"]) for e in m["files"]]
    if not paths:
        return spark.createDataFrame([], m["schema_ddl"])
    # read under the MANIFEST's schema, not per-file inference: a store
    # accretes files from many batches, and type widening (int→long on
    # upsert) or schema evolution (new value column) leaves older
    # untouched files narrower — the manifest records the widest schema
    # so far; parquet upcasts/null-fills the old files under it, where
    # mixed per-file inference refuses the read
    return spark.read.schema(m["schema_ddl"]).parquet(*paths)


def manifest_store_history(state_dir: str) -> list[dict]:
    """Commit history of a manifest store, oldest first — the Delta
    ``DESCRIBE HISTORY`` equivalent. One dict per retained committed
    version: version (micro-batch id; -1 = bootstrap), total_rows,
    n_files, files_touched (files rewritten by that batch's merge;
    0 for bootstrap/full writes), and compacted_from when a compaction
    has rewritten that version's file list. Driver-side metadata only —
    reads the manifest JSONs, never the data files."""
    out = []
    for v in _manifest_versions(state_dir):
        m = _read_manifest(state_dir, v)
        h = {
            "version": v,
            "total_rows": m["total_rows"],
            "n_files": len(m["files"]),
            "files_touched": m.get("files_touched", 0),
        }
        if "compacted_from" in m:
            h["compacted_from"] = m["compacted_from"]
        out.append(h)
    return out


def _merge_manifest_batch(
    parsed: DataFrame,
    cfg: ChangeTableConfig,
    state_dir: str,
    batch_id: int,
    target_rows_per_file: int,
) -> None:
    import glob as _glob
    import json as _json

    spark = parsed.sparkSession
    mdir = _manifest_dir(state_dir)
    manifest_path = os.path.join(mdir, f"v{batch_id}.json")
    # Idempotent crash replay: the manifest file IS the commit point —
    # a committed batch re-delivered by foreachBatch is skipped whole.
    if os.path.exists(manifest_path):
        return
    batch_last, had_truncate, cached = _batch_last_per_key(parsed, cfg)
    if batch_last is None:
        return
    key0 = cfg.key_columns[0]
    cols = [*cfg.key_columns, *cfg.value_columns]
    try:
        prev = (
            None
            if had_truncate
            else _latest_manifest(state_dir, before=batch_id)
        )
        upserts = batch_last.filter(F.col("__op") != "d").select(*cols)
        touched, untouched = [], []
        if prev is not None:
            # The batch's distinct first-key values, collected SORTED:
            # bounded by the micro-batch contract (a batch is small; the
            # store is what's big), and the price of EXACT file pruning.
            batch_keys = sorted(
                r[0] for r in batch_last.select(key0).distinct().collect()
            )
            for e in prev["files"]:
                if not e.get("exact", True) or _any_key_in_range(
                    batch_keys, e["min"], e["max"]
                ):
                    touched.append(e)
                else:
                    untouched.append(e)
        if touched:
            # prev manifest's schema: see read_replica_manifest — mixed-
            # vintage files read under the recorded widest schema
            cur = spark.read.schema(prev["schema_ddl"]).parquet(
                *[os.path.join(state_dir, e["path"]) for e in touched]
            )
            keys = batch_last.select(*cfg.key_columns)
            # broadcast anti join: the batch's key set broadcasts, the
            # touched-file rows never shuffle (same shape the r9 store-
            # scale bench probed on the versioned merge)
            survivors = cur.join(
                F.broadcast(keys), list(cfg.key_columns), "left_anti"
            )
            new_rows = survivors.unionByName(upserts, allowMissingColumns=True)
            # upsert mass sized by the batch's distinct key count (already
            # collected for pruning) — not the old `+= 1` placeholder,
            # which under-partitioned a giant batch into few touched
            # files (VERDICT r10 #5 nit)
            est_rows = sum(e["rows"] for e in touched) + len(batch_keys)
        else:
            # no prior files to carry: size by the batch itself (one
            # cheap count on the CACHED last-per-key frame)
            new_rows = upserts
            est_rows = max(1, batch_last.count())
        # Range-partition new files by the stats key so hot key ranges
        # stay CLUSTERED — the property that makes the next batch's
        # pruning effective. File count scales with the rewritten mass,
        # not the store.
        n_new = max(1, min(256, -(-est_rows // target_rows_per_file)))
        rel = os.path.join("data", f"v{batch_id}")
        out = os.path.join(state_dir, rel)
        new_rows.repartitionByRange(n_new, F.col(key0)).write.mode(
            "overwrite"
        ).parquet(out)
        entries = list(untouched)
        for p in sorted(_glob.glob(os.path.join(out, "*.parquet"))):
            rows, lo, hi, exact = _file_key_stats(p, key0)
            entries.append(
                {
                    "path": os.path.join(rel, os.path.basename(p)),
                    "rows": rows,
                    "min": lo,
                    "max": hi,
                    "exact": exact,
                }
            )
        # Widest-schema-so-far invariant (ADVICE r10): when pruning left
        # ``touched`` empty, new_rows is just this batch's upserts, whose
        # schema can be NARROWER than the previous manifest's recorded
        # one — recording it as-is would read the carried untouched files
        # under a narrower schema. Union the previous manifest's schema
        # with the batch's via Spark's own unionByName coercion (the same
        # widening the touched-path read performs).
        if prev is not None:
            widest = (
                spark.createDataFrame([], prev["schema_ddl"])
                .unionByName(new_rows.limit(0), allowMissingColumns=True)
                .schema
            )
        else:
            widest = new_rows.schema
        manifest = {
            "batch_id": batch_id,
            "key": key0,
            "schema_ddl": ", ".join(
                f"`{f.name}` {f.dataType.simpleString()}"
                for f in widest.fields
            ),
            "files": entries,
            "total_rows": sum(e["rows"] for e in entries),
            "files_total": len(prev["files"]) if prev else 0,
            "files_touched": len(touched),
        }
        os.makedirs(mdir, exist_ok=True)
        tmp = manifest_path + ".tmp"
        with open(tmp, "w") as f:
            _json.dump(manifest, f)
        os.replace(tmp, manifest_path)
    finally:
        cached.unpersist(blocking=False)


def bootstrap_manifest_store(
    df: DataFrame,
    cfg: ChangeTableConfig,
    state_dir: str,
    batch_id: int = -1,
    target_rows_per_file: int = 200_000,
) -> dict:
    """Materialize ``df`` (key+value columns) as manifest-store version
    ``batch_id`` — the initial-load path (and the bench scaffold for
    store-scale legs). Same file layout, stats, and atomic manifest
    commit as the streaming merge; returns the manifest.

    ``batch_id`` defaults to the RESERVED version -1 (ADVICE r10): a
    manifest at a non-negative version doubles as that micro-batch's
    commit marker, so bootstrapping at 0 and then streaming against a
    FRESH checkpoint would make _merge_manifest_batch treat the
    stream's first micro-batch (id 0) as already committed and silently
    drop its data. Negative versions sort below every foreachBatch id
    and can never be emitted by a stream, so bootstrap-then-stream is
    safe by construction. Pass a non-negative ``batch_id`` only to
    re-materialize a version the stream has genuinely already
    consumed."""
    import glob as _glob
    import json as _json

    key0 = cfg.key_columns[0]
    rel = os.path.join("data", f"v{batch_id}")
    out = os.path.join(state_dir, rel)
    n_rows = df.count()
    n_files = max(1, min(256, -(-n_rows // target_rows_per_file)))
    df.select(*cfg.key_columns, *cfg.value_columns).repartitionByRange(
        n_files, F.col(key0)
    ).write.mode("overwrite").parquet(out)
    entries = []
    for p in sorted(_glob.glob(os.path.join(out, "*.parquet"))):
        rows, lo, hi, exact = _file_key_stats(p, key0)
        entries.append(
            {
                "path": os.path.join(rel, os.path.basename(p)),
                "rows": rows,
                "min": lo,
                "max": hi,
                "exact": exact,
            }
        )
    manifest = {
        "batch_id": batch_id,
        "key": key0,
        "schema_ddl": ", ".join(
            f"`{c}` {df.schema[c].dataType.simpleString()}"
            for c in (*cfg.key_columns, *cfg.value_columns)
        ),
        "files": entries,
        "total_rows": sum(e["rows"] for e in entries),
        "files_total": 0,
        "files_touched": 0,
    }
    mdir = _manifest_dir(state_dir)
    os.makedirs(mdir, exist_ok=True)
    tmp = os.path.join(mdir, f"v{batch_id}.json.tmp")
    with open(tmp, "w") as f:
        _json.dump(manifest, f)
    os.replace(tmp, os.path.join(mdir, f"v{batch_id}.json"))
    return manifest


def start_replica_merge_manifest(
    stream: DataFrame,
    cfg: ChangeTableConfig,
    state_dir: str,
    checkpoint: str,
    row_schema=INVOICE_ROW,
    trigger_available_now: bool = True,
    target_rows_per_file: int = 200_000,
):
    """Sink 2c: replica merge over a MANIFEST STORE — versioned like
    start_replica_merge (atomic, _SUCCESS-equivalent commit, crash-replay
    idempotent) but with per-batch I/O bounded by FILE-LEVEL KEY
    STATISTICS instead of a full-store rewrite.

    Store layout:
      state_dir/data/v{B}/part-*.parquet   — files WRITTEN by batch B
      state_dir/manifest/v{B}.json         — the COMMIT: the list of
        files (from any prior batch) composing version B's state, each
        with (rows, min/max of the first key column).

    Per micro-batch: collapse to last-event-per-key (shared
    _batch_last_per_key), prune the previous manifest to files whose
    [min, max] key span contains at least one batch key (exact bisect
    over the batch's sorted key set — driver-side, O(|batch| log) ),
    anti-join ONLY those files' rows against the broadcast batch keys,
    and write survivors+upserts as new range-partitioned files; the
    untouched files carry into the new manifest BY REFERENCE. A hot-key
    feed (the realistic CDC shape) touches the few files its key range
    lives in — O(touched + batch) I/O; a uniform-key feed touches every
    file and degrades gracefully to exactly the flat versioned rewrite.
    Truncate wipes by dropping every reference (files become garbage for
    vacuum_manifest_store).

    vs start_replica_merge: same merge algebra (anti join + union,
    broadcast probe), same commit atomicity (one rename), same replay
    guard (committed manifest short-circuits) — only the I/O bound
    changes. vs start_replica_merge_bucketed: key-RANGE stats prune by
    what the batch actually touches, where hash buckets spread a
    high-entropy batch across 100% of partitions (the r9 negative:
    dynamic partition overwrite of 1024 dirs ran ~50x slower than the
    flat rewrite); and the commit here is one atomic rename, closing the
    bucketed sink's multi-directory atomicity window.

    This is the parquet-protocol approximation of Delta/Iceberg MERGE
    with data-file statistics (both publish this design publicly;
    delta-spark itself is not installable in this container — NOTES.md).
    """

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        _merge_manifest_batch(
            _parse(batch_df, row_schema),
            cfg,
            state_dir,
            batch_id,
            target_rows_per_file,
        )

    writer = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def vacuum_manifest_store(state_dir: str, keep: int = 3) -> list[str]:
    """Delete data files referenced by NO retained manifest (the newest
    ``keep`` versions are retained, older manifests deleted). Returns
    the deleted file paths. Safe order: manifests first, then files —
    a crash mid-vacuum leaves referenced files intact.

    Concurrent-merge safety (ADVICE r10): an in-flight merge writes its
    ``data/v{B}`` files BEFORE the manifest rename that commits them, so
    a naive "not referenced by any retained manifest" sweep could delete
    a batch's output in the commit window. Data directories with a
    version NEWER than the latest committed manifest are therefore
    skipped (the Delta-style retention check); within committed
    versions, a file is garbage only once no retained manifest
    references it. Do not run vacuum concurrently with a merge of a
    version <= the latest committed one (replays of committed versions
    are no-ops, so that window is only reachable by external
    manipulation of the manifest dir)."""
    import re

    versions = _manifest_versions(state_dir)
    if len(versions) <= keep:
        keep_versions = versions
    else:
        keep_versions = versions[-keep:]
    latest_committed = versions[-1] if versions else None
    live: set[str] = set()
    for v in keep_versions:
        for e in _read_manifest(state_dir, v)["files"]:
            live.add(e["path"])
    deleted = []
    for v in versions:
        if v not in keep_versions:
            os.remove(os.path.join(_manifest_dir(state_dir), f"v{v}.json"))
    data_root = os.path.join(state_dir, "data")
    if os.path.isdir(data_root):
        for d in os.listdir(data_root):
            m = re.fullmatch(r"v(-?\d+)", d)
            if m and (
                latest_committed is None or int(m.group(1)) > latest_committed
            ):
                # in-flight (uncommitted) batch output — not garbage yet
                continue
            sub = os.path.join(data_root, d)
            for fn in os.listdir(sub):
                rel = os.path.join("data", d, fn)
                if fn.endswith(".parquet") and rel not in live:
                    os.remove(os.path.join(state_dir, rel))
                    deleted.append(rel)
            if not any(f.endswith(".parquet") for f in os.listdir(sub)):
                import shutil

                shutil.rmtree(sub)
    return deleted


def compact_manifest_store(
    spark: SparkSession,
    state_dir: str,
    target_rows_per_file: int = 200_000,
    min_files: int = 8,
) -> dict | None:
    """Fold the store's SMALL files (rows < target/2) into
    target-sized range-partitioned files, committing by atomically
    REPLACING the latest manifest (r11, VERDICT r10 #5: every merge
    batch adds files — hot feeds rewrite few, so version chains grow
    without bound; vacuum reclaims superseded versions but nothing
    bounded the LIVE file count, and with it the per-batch
    footer-stats/pruning cost, until now).

    Mechanics: the latest manifest's small files are read under the
    recorded schema, repartitionByRange(key) into
    ceil(small_rows/target) files under ``data/c{V}_{k}`` (k = per-
    version compaction counter, so repeated compactions never collide),
    and the manifest at version V is atomically rewritten to reference
    (large files by reference) + (new compacted files). The version
    NUMBER is untouched — manifest versions stay exactly micro-batch
    commit markers (bootstrap -1, stream ids 0..), so _merge_manifest_
    batch's replay guard and the next batch's id are unaffected; the
    superseded small files become garbage for vacuum_manifest_store.
    Rows are merely rewritten (the store holds one row per key by the
    merge invariant), so replica content is bit-identical — pinned by
    the replay-equality test on a compacted store.

    No-op (returns None) when fewer than ``min_files`` small files
    exist. Like vacuum, must not run concurrently with a merge or
    another compaction (single-writer, the manifest-store contract).

    100 TB shape: a real deployment runs this as the Delta/Iceberg
    OPTIMIZE equivalent — off the hot path, bounded by the small-file
    mass (hot-feed batches write small files; the large base files are
    carried by reference and never reread)."""
    import glob as _glob
    import json as _json

    versions = _manifest_versions(state_dir)
    if not versions:
        return None
    v = versions[-1]
    m = _read_manifest(state_dir, v)
    key0 = m["key"]
    # 3/4 of target: merge rewrites naturally fragment into files a
    # shade under target (ceil split), and a half-target threshold
    # misses them; 3/4 catches real fragments while freshly compacted
    # ~target-sized files stay ineligible (no rewrite churn)
    thr = 3 * target_rows_per_file // 4
    small = [e for e in m["files"] if e["rows"] < thr]
    large = [e for e in m["files"] if e["rows"] >= thr]
    if len(small) < min_files:
        return None
    n_comp = sum(
        1
        for d in os.listdir(os.path.join(state_dir, "data"))
        if d.startswith(f"c{v}_")
    ) if os.path.isdir(os.path.join(state_dir, "data")) else 0
    rel = os.path.join("data", f"c{v}_{n_comp}")
    out = os.path.join(state_dir, rel)
    small_rows = sum(e["rows"] for e in small)
    n_new = max(1, min(256, -(-small_rows // target_rows_per_file)))
    (
        spark.read.schema(m["schema_ddl"])
        .parquet(*[os.path.join(state_dir, e["path"]) for e in small])
        .repartitionByRange(n_new, F.col(key0))
        .write.mode("overwrite")
        .parquet(out)
    )
    entries = list(large)
    for p in sorted(_glob.glob(os.path.join(out, "*.parquet"))):
        rows, lo, hi, exact = _file_key_stats(p, key0)
        entries.append(
            {
                "path": os.path.join(rel, os.path.basename(p)),
                "rows": rows,
                "min": lo,
                "max": hi,
                "exact": exact,
            }
        )
    new_m = dict(
        m,
        files=entries,
        total_rows=sum(e["rows"] for e in entries),
        compacted_from=len(small),
    )
    mpath = os.path.join(_manifest_dir(state_dir), f"v{v}.json")
    tmp = mpath + ".tmp"
    with open(tmp, "w") as f:
        _json.dump(new_m, f)
    os.replace(tmp, mpath)
    return new_m


def start_multi_table_merge(
    stream: DataFrame,
    tables: dict[str, tuple[ChangeTableConfig, "object"]],
    state_root: str,
    checkpoint: str,
    trigger_available_now: bool = True,
    store: str = "versioned",
    target_rows_per_file: int = 200_000,
):
    """Route a mixed multi-table changelog stream into per-table replicas.

    Debezium emits one topic per table; subscribing with a pattern
    (``subscribePattern: source.dev.*``) lands every table's envelopes in
    ONE stream, discriminated by ``payload.source.table``
    (reference naming convention README.md:295-297). Per micro-batch each
    configured table's slice is parsed with ITS OWN row schema and merged
    into its own state dir — one streaming query, N replicas, one
    checkpoint (table slices commit atomically per batch).

    ``tables``: table name → (ChangeTableConfig, row StructType).
    ``store``: "versioned" (full-rewrite versioned state, read with
    read_replica) or "manifest" (r11: the key-stats manifest store —
    per-table file pruning, bootstrap/compaction/vacuum all apply; read
    with read_replica_manifest). At N tables × big stores the manifest
    route is what survives: each table's batch slice touches only the
    files its keys live in, instead of N full rewrites per micro-batch.
    """
    if store not in ("versioned", "manifest"):
        raise ValueError(f"store must be 'versioned' or 'manifest', got {store!r}")

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        for name, (cfg, row_schema) in tables.items():
            parsed = _parse(batch_df, row_schema).filter(
                # truncate envelopes may omit the row images but always
                # carry source.table; route on it.
                F.col("source_table") == name
            )
            if store == "manifest":
                _merge_manifest_batch(
                    parsed,
                    cfg,
                    os.path.join(state_root, name),
                    batch_id,
                    target_rows_per_file,
                )
            else:
                _merge_parsed_batch(
                    parsed, cfg, os.path.join(state_root, name), batch_id
                )

    writer = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_imi_index_maintenance(
    stream: DataFrame,
    index_dir: str,
    checkpoint: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    trigger_available_now: bool = True,
):
    """Maintain a persisted IMI ANN index from a vector stream (r11 —
    the E4×E9 crossover): the first non-empty micro-batch BUILDS the
    index (trains codebooks, lays the corpus out cell-partitioned);
    every later batch is append_imi_index(batch_id=...) — assignment
    under the frozen grid, rows appended to the cell directories under
    the exactly-once two-phase protocol (stage → prefix-named move →
    meta commit; replays of committed batches short-circuit, crashed
    attempts self-clean by prefix). Serving (knn_imi_indexed) needs no
    coordination — it reads whatever cell directories exist.

    This is the streaming half of the 100 TB ANN story: the O(corpus)
    work (codebook training, full assignment) happens once; each batch
    pays O(batch) assignment + a per-cell append. Codebook drift is
    metered (meta.appended_rows vs trained_rows) and warned on once
    appends exceed the training base — at which point a scheduled
    rebuild (build_imi_index over the accumulated corpus) re-trains the
    grid, exactly like the manifest store's compaction runs off the hot
    path. Single-writer, like every store in this module."""
    from ..operators.similarity import append_imi_index, build_imi_index

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        vecs = batch_df.select(F.col(id_col), F.col(vec_col))
        meta_path = os.path.join(index_dir, "meta.json")
        if not os.path.exists(meta_path):
            # first batch: build IS the commit (meta is written once,
            # atomically, with the batch marker; a crash before it
            # leaves no meta → the replay rebuilds over the overwrite)
            build_imi_index(
                vecs,
                index_dir,
                vec_col=vec_col,
                id_col=id_col,
                _extra_meta={"committed_batches": [batch_id]},
            )
        else:
            append_imi_index(
                vecs, index_dir, vec_col=vec_col, id_col=id_col,
                batch_id=batch_id,
            )

    writer = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def vacuum_state(state_dir: str, keep: int = 3) -> list[int]:
    """Drop all but the newest ``keep`` committed state versions.

    The versioned-state merge accumulates one directory per micro-batch;
    older versions exist only for readers that started before the latest
    commit. Returns the removed version numbers. (The bucketed merge has
    no versions to vacuum — its garbage is handled by dynamic partition
    overwrite itself.)
    """
    import shutil

    versions = _state_versions(state_dir)
    doomed = versions[:-keep] if keep > 0 else versions
    for v in doomed:
        shutil.rmtree(os.path.join(state_dir, f"v{v}"))
    # incremental-agg versions (state_dir/agg/v*) age out on the same policy
    agg_dir = os.path.join(state_dir, "agg")
    for v in _state_versions(agg_dir)[:-keep] if keep > 0 else _state_versions(agg_dir):
        shutil.rmtree(os.path.join(agg_dir, f"v{v}"))
    return doomed


def start_enriched_log(
    stream: DataFrame,
    dim: DataFrame,
    key_col: str,
    out_dir: str,
    checkpoint: str,
    row_schema=INVOICE_ROW,
    trigger_available_now: bool = True,
):
    """Stream-static enrichment sink: each change event left-joined to a
    static dimension table on its (after-image, falling back to
    before-image for deletes) key, then appended as parquet — the
    standard 'decorate the CDC feed with reference data' pattern.

    Scale notes: the static side is explicitly broadcast — Structured
    Streaming re-plans the join every micro-batch, so a shuffle join here
    would re-shuffle the dimension per batch; a broadcast pins it to one
    exchange per batch and keeps the stream side map-only. The static
    frame is re-resolved each batch, so updating the dimension's backing
    files between batches is picked up without restarting the query (the
    supported Spark contract for stream-static joins). For dimensions too
    big to broadcast, pre-bucket both sides on the key instead.
    """
    parsed = _parse(stream, row_schema)
    ev = parsed.select(
        "offset",
        "timestamp",
        classify_op(F.col("before"), F.col("after")).alias("op_class"),
        F.coalesce(F.col(f"after.{key_col}"), F.col(f"before.{key_col}")).alias(key_col),
    )
    enriched = ev.join(F.broadcast(dim), key_col, "left")
    writer = (
        enriched.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    out_dir: str,
    checkpoint: str,
    key_col: str = "user_id",
    left_ts: str = "event_time",
    right_ts: str = "event_time",
    watermark: str = "1 hour",
    max_lag_seconds: int = 1800,
    trigger_available_now: bool = True,
):
    """Stream-stream interval join (the attribution shape: a right-side
    event joins a left-side event with the same key that happened at most
    ``max_lag_seconds`` earlier). The reference cannot express this at
    all — it applies one stream to a table; joining two live CDC/event
    feeds is the canonical Structured Streaming upgrade.

    Scale/state contract: BOTH sides are watermarked and the join
    condition carries an explicit event-time range, so Spark can expire
    buffered rows once they fall behind watermark + lag — state is
    O(events per horizon per key-partition), not O(stream). Without the
    time bound the state grows forever and Spark (correctly) refuses
    append mode. Right columns are prefixed ``r_`` so both sides keep
    their payloads without ambiguity; the join itself is one key shuffle
    per micro-batch, identical in shape to the batch equi-join."""
    l = left.withWatermark(left_ts, watermark)
    r = right.withWatermark(right_ts, watermark)
    r = r.select([F.col(c).alias(f"r_{c}") for c in r.columns])
    cond = (
        (F.col(key_col) == F.col(f"r_{key_col}"))
        & (F.col(f"r_{right_ts}") >= F.col(left_ts))
        & (
            F.col(f"r_{right_ts}")
            <= F.col(left_ts) + F.expr(f"INTERVAL {max_lag_seconds} SECONDS")
        )
    )
    joined = l.join(r, cond, "inner").drop(f"r_{key_col}")
    writer = (
        joined.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ---------------------------------------------------------------------------
# Streaming corpus admission: per-batch near-dup gate against the
# accumulated corpus — the LLM-training-data ingestion shape (nightly/
# continuous crawl drops) running on the same foreachBatch machinery as
# the CDC merges.
# ---------------------------------------------------------------------------


def _corpus_parts(corpus_dir: str, kind: str) -> list[str]:
    """Readable parts for a corpus side: the newest committed compaction
    base (if any) plus committed delta versions ABOVE its _THROUGH id —
    deltas at or below it are already folded in (and may linger only
    until the next vacuum), so they are skipped, never double-counted."""
    import glob

    base, through = _latest_base(corpus_dir, kind)
    parts = [base] if base else []
    for d in sorted(glob.glob(os.path.join(corpus_dir, kind, "v*"))):
        i = int(os.path.basename(d)[1:])
        if i > through and os.path.exists(
            os.path.join(corpus_dir, "sigs", f"v{i}", "_SUCCESS")
        ):
            parts.append(d)
    return parts


def read_corpus(spark: SparkSession, corpus_dir: str) -> DataFrame | None:
    """Committed corpus: newest compaction base + committed deltas (a
    batch's sig _SUCCESS marker is written LAST, so a delta is visible
    only when fully committed)."""
    parts = _corpus_parts(corpus_dir, "docs")
    if not parts:
        return None
    return spark.read.parquet(*parts)


def _read_sigs(spark: SparkSession, corpus_dir: str) -> DataFrame | None:
    parts = _corpus_parts(corpus_dir, "sigs")
    if not parts:
        return None
    return spark.read.parquet(*parts)


def probe_corpus_sigs(
    spark: SparkSession,
    corpus_dir: str,
    docs: DataFrame,
    n: int = 3,
    k: int = 8,
    bands: int = 4,
    family: str = "md5",
    shingled: DataFrame | None = None,
    banded: DataFrame | None = None,
    sigs: DataFrame | None = None,
) -> DataFrame | None:
    """Candidate (doc_id_new, dup_of) pairs: the incoming batch is
    shingled + signed fresh (O(batch) map work) and joined on (band, bv)
    against the accumulated signature store — compaction base plus
    committed deltas. The batch's band frame is the SMALL side, so AQE
    broadcasts it onto the store scan: the store side (the 100 TB-scaled
    side, base included post-compaction) never shuffles — pinned in
    test_sinks.py against a compacted+vacuumed layout. Returns None when
    no store exists yet (first batch). Pass ``sigs`` (e.g. the
    _cached_store frame) to skip the per-batch disk read."""
    from ..operators.dedup import minhash_banded, shingle_docs

    if sigs is None:
        sigs = _read_sigs(spark, corpus_dir)
    if sigs is None:
        return None
    if banded is not None:
        banded_in = banded.withColumnRenamed("doc_id", "doc_id_new")
    else:
        banded_in = minhash_banded(
            shingled if shingled is not None else shingle_docs(docs, n),
            k,
            bands,
            family=family,
        ).withColumnRenamed("doc_id", "doc_id_new")
    return (
        banded_in.join(sigs.withColumnRenamed("doc_id", "dup_of"), ["band", "bv"])
        .select("doc_id_new", "dup_of")
        .distinct()
    )


# ---------------------------------------------------------------------------
# Cross-batch store cache for admission (OPT-IN, see cache_store): the
# committed signature store and corpus docs served from executor storage
# (localCheckpoint = MEMORY_AND_DISK) instead of re-read from parquet
# every micro-batch. Keyed by corpus_dir; survives stream restarts within
# a SparkSession (the availableNow re-start harness included).
# Correctness does not depend on it: the cache key is the exact committed
# layout (base dir, delta ids, newest commit-marker mtime), so an
# external compaction, a foreign writer, or a recreated directory all
# miss and trigger a rebuild from disk — the cache can only ever serve
# frames content-equal to _read_sigs / read_corpus.
# ---------------------------------------------------------------------------

_STORE_CACHE: dict[str, dict] = {}


def _marker_mtime(corpus_dir: str, base, delta_ids):
    """Current on-disk mtime of the newest commit marker in the given
    layout (last delta's _SUCCESS, else the base's _THROUGH), or None if
    the layout is empty or the marker vanished (→ callers treat the
    cached legs as stale and rebuild)."""
    try:
        if delta_ids:
            return os.path.getmtime(
                os.path.join(corpus_dir, "sigs", f"v{delta_ids[-1]}", "_SUCCESS")
            )
        if base:
            return os.path.getmtime(os.path.join(base, "_THROUGH"))
    except OSError:
        return None
    return None


def _store_layout_key(corpus_dir: str):
    """(sigs base, committed delta ids, newest marker mtime) — changes on
    every commit, compaction, vacuum, or directory recreation."""
    base, through = _latest_base(corpus_dir, "sigs")
    deltas = _committed_versions(corpus_dir, through, "sigs")
    ids = tuple(i for i, _ in deltas)
    return base, ids, _marker_mtime(corpus_dir, base, ids)


def _cached_store(spark: SparkSession, corpus_dir: str):
    """(sigs, docs) DataFrames equal to the committed store, or
    (None, None) when no store exists. Frames are unions of
    lazily-localCheckpointed legs — first use scans parquet once, later
    batches read executor storage. The docs side caches TEXT, not
    shingle sets: verify shingles only the candidate-MATCHED rows each
    batch (bounded by collisions), so caching full-corpus shingle
    arrays would cost strictly more compute+memory than it saves —
    measured, NOTES r6; the win is eliminating the per-batch parquet
    scans of both sides.

    Memory honesty at 100 TB: legs spill to executor disk
    (MEMORY_AND_DISK); a deployment whose store exceeds cluster storage
    runs with cache_store=False and keeps the plain parquet probe —
    the cache is an optimization, never a correctness dependency."""
    key = _store_layout_key(corpus_dir)
    base, ids, _ = key
    if base is None and not ids:
        return None, None
    ent = _STORE_CACHE.get(corpus_dir)
    if ent is not None and ent["key"] == key:
        return ent["sigs"], ent["docs"]
    if (
        ent is not None
        and ent["key"][0] == base
        and set(ent["key"][1]) <= set(ids)
        and ent["key"][2] is not None
        # The cached legs are only reusable if the newest layout element
        # the cache already holds is BYTE-UNCHANGED on disk: a delta
        # rewritten in place (same version id, fresh _SUCCESS) must fall
        # through to the full rebuild, honoring the "foreign writer
        # always triggers a rebuild" contract (ADVICE r6).
        and _marker_mtime(corpus_dir, ent["key"][0], ent["key"][1]) == ent["key"][2]
    ):
        # commits landed since the cache entry (normally our own appends
        # already covered them; this path heals a miss) — top up the legs
        have = set(ent["key"][1])
        sig_legs, doc_legs = list(ent["sig_legs"]), list(ent["doc_legs"])
        new = [i for i in ids if i not in have]
    else:
        sig_legs, doc_legs = [], []
        new = list(ids)
        if base:
            sig_legs.append(spark.read.parquet(base).localCheckpoint(eager=False))
            doc_base, _ = _latest_base(corpus_dir, "docs")
            if doc_base:
                doc_legs.append(
                    spark.read.parquet(doc_base).localCheckpoint(eager=False)
                )
    for i in new:
        sig_legs.append(
            spark.read.parquet(
                os.path.join(corpus_dir, "sigs", f"v{i}")
            ).localCheckpoint(eager=False)
        )
        doc_legs.append(
            spark.read.parquet(
                os.path.join(corpus_dir, "docs", f"v{i}")
            ).localCheckpoint(eager=False)
        )
    return _store_cache_put(corpus_dir, key, sig_legs, doc_legs)


def _store_cache_put(corpus_dir: str, key, sig_legs, doc_legs):
    """Store legs under ``key``; collapse to one leg per side past 24
    (bounds both the union plan width and the per-leg storage entries;
    the collapse itself is one O(store) job every ~24 commits)."""
    from functools import reduce

    from pyspark.sql import DataFrame as _DF

    if len(sig_legs) > 24:
        sig_legs = [
            reduce(_DF.unionByName, sig_legs).localCheckpoint(eager=True)
        ]
        doc_legs = [reduce(_DF.unionByName, doc_legs).localCheckpoint(eager=True)]
    sigs = reduce(_DF.unionByName, sig_legs)
    docs = reduce(_DF.unionByName, doc_legs)
    _STORE_CACHE[corpus_dir] = {
        "key": key, "sigs": sigs, "docs": docs,
        "sig_legs": sig_legs, "doc_legs": doc_legs,
    }
    return sigs, docs


def _store_cache_append(corpus_dir: str, batch_id: int, sig_leg, doc_leg) -> None:
    """After a batch commits, extend the cache with the batch's own
    in-memory admitted frames (no disk round-trip). No-op when the cache
    entry is stale/absent — the next _cached_store syncs from disk."""
    ent = _STORE_CACHE.get(corpus_dir)
    if ent is None:
        return
    base, ids, _ = ent["key"]
    marker = os.path.join(corpus_dir, "sigs", f"v{batch_id}", "_SUCCESS")
    if not os.path.exists(marker):
        return
    key = (base, ids + (batch_id,), os.path.getmtime(marker))
    _store_cache_put(
        corpus_dir,
        key,
        list(ent["sig_legs"]) + [sig_leg.localCheckpoint(eager=False)],
        list(ent["doc_legs"]) + [doc_leg.localCheckpoint(eager=False)],
    )


def start_corpus_dedup_admission(
    stream: DataFrame,
    corpus_dir: str,
    checkpoint: str,
    n: int = 3,
    k: int = 8,
    bands: int = 4,
    threshold: float = 0.6,
    trigger_available_now: bool = True,
    family: str = "md5",
    quality_filter=None,
    cache_store: bool = False,
    fuse_probe: bool = False,
    allow_checkpoint_rebind: bool = False,
):
    """Streaming corpus admission with incremental near-dup gating.

    Per micro-batch of (doc_id, text):
      1. WITHIN-batch near-dups collapse first (MinHash-LSH + exact
         Jaccard; ONE survivor — the min doc_id — per CONNECTED
         COMPONENT of the verified-pair graph, via dup_clusters). This
         is deliberate cluster-representative semantics, the standard
         transitive policy for training-corpus dedup: on a chain a~b,
         b~c with a !~ c, the whole chain collapses to a (c is dropped
         even though its direct dup b was also dropped — transitivity
         treats the chain as one template family). The earlier
         pairwise-loser rule (drop greatest of each pair) reached the
         same result on chains but kept docs whose only smaller verified
         partner was itself dropped in e.g. (1,3),(2,3) — an accidental,
         undocumented middle ground between pairwise and cluster
         semantics; it is replaced, not documented, because
         one-survivor-per-cluster is the semantics the batch operators
         (dedup_clusters) already expose;
      2. survivors probe the accumulated signature store (banded MinHash
         over all previously ADMITTED docs) and verify exact Jaccard
         against only the candidate-matched corpus docs — per-batch cost
         O(batch + collisions), never O(corpus) (same asymmetry as
         operators.dedup.incremental_dedup_pairs);
      3. admitted docs land in corpus_dir/docs/v{batchId}, their
         signatures in corpus_dir/sigs/v{batchId} — the sig _SUCCESS is
         written last and is the batch's commit marker, so crash replay
         of a committed batch short-circuits (idempotent, same protocol
         as the CDC merge sinks).

    The version-dir signature layout trades the bucketed store's
    shuffle-free probe (persist_signature_store — the batch-mode path)
    for per-batch atomicity + replay idempotence, which streaming needs;
    AQE still broadcasts the small incoming band frame in the probe.

    ``family`` picks the MinHash hash family ("md5" default, "xxhash64"
    production — see minhash_banded) and MUST stay uniform for the
    lifetime of a corpus_dir: the probe signatures have to match the
    stored ones, so switching families on an existing store silently
    disables cross-batch dedup.

    ``quality_filter`` (optional, DataFrame -> DataFrame over
    (doc_id, text)) runs BEFORE any dedup work — rejected docs never pay
    for shingling, never enter the signature store, and never suppress a
    later GOOD near-duplicate (a rejected doc must not become a cluster
    representative). operators/text.filter_quality is the stock
    Gopher/C4 gate; any batch-safe transform fits.

    ``cache_store`` serves the committed signature store and corpus
    docs from executor storage across batches (and across availableNow
    restarts in the same session) instead of re-reading parquet every
    batch — see _cached_store for the layout-keyed invalidation
    contract. Default OFF by measurement: on local disk the OS page
    cache absorbs the re-read, and the cache's per-batch leg
    materializations measured 8-15% SLOWER at both 1× and 10× batch
    sizes (A/B in NOTES r6) — the steady-state floor is the fixed
    per-batch job count, not store I/O. Turn ON only when the store
    lives on genuinely slow/remote storage (object store with
    per-request latency) AND fits cluster storage memory; results are
    identical either way (pinned in tests).

    ``fuse_probe`` folds the within-batch collapse INTO the store probe:
    one banded candidate join of the batch against (batch ∪ store) and
    one Jaccard verify chain over the union, instead of a self-join +
    verify followed by a separate probe-join + verify. The batch band
    frame broadcasts once, the verify chain's four joins become two, and
    the split back into in-batch pairs (→ cluster losers) vs cross pairs
    (→ store dups) rides a source tag carried through the verify.
    Admitted set is IDENTICAL to the sequential path (pinned in tests):
    cross-verifying a doc that the in-batch collapse will drop is wasted
    verify rows, never a change to the final anti-join algebra. See
    BENCH_streaming_r07 for the measured A/B.

    ``allow_checkpoint_rebind``: a checkpoint is BOUND to its corpus_dir
    on first use and a fresh checkpoint may only start an empty corpus
    (_bind_checkpoint_to_corpus — refuses the silent-data-loss modes the
    r8 500k-store bench measured: a fresh checkpoint's batch ids restart
    at 0, so its batches are either skipped whole as phantom replays or
    written below the compaction base and vacuumed). Pass True ONLY for
    lost-checkpoint recovery where the source re-delivers
    previously-processed data — there the marker short-circuit is the
    idempotence you want."""
    from ..operators.dedup import (
        dup_cluster_losers_capped,
        jaccard_verify_pairs,
        minhash_banded,
        minhash_dedup_pairs,
        shingle_docs,
    )

    def handle(batch_df: DataFrame, batch_id: int):
        spark = batch_df.sparkSession
        marker = os.path.join(corpus_dir, "sigs", f"v{batch_id}", "_SUCCESS")
        if os.path.exists(marker):
            return
        docs = batch_df.select("doc_id", "text")
        if quality_filter is not None:
            # quality gate first: a rejected doc must neither enter the
            # store nor act as a dedup cluster representative
            docs = quality_filter(docs)
        docs = docs.localCheckpoint(eager=False)
        # shingle ONCE, band ONCE per batch: collapse, probe, verify, and
        # the final signature write all reuse these two checkpointed
        # frames (the r4 form re-shingled the batch four times and
        # re-signed it three times — measured as the dominant share of
        # the ~5-6s/batch fixed floor, NOTES r5). The checkpoints are
        # LAZY since r6: the losers collect below is the batch's first
        # action and materializes the whole docs→shingles→banded chain
        # in ONE job — eager staging spent three synchronous jobs on the
        # same work (7 → 4 jobs/batch measured; the fixed per-job
        # scheduling floor was the residual cost the r6 store-cache A/B
        # attributed the steady state to)
        sh = shingle_docs(docs, n).localCheckpoint(eager=False)
        banded = minhash_banded(sh, k, bands, family=family).localCheckpoint(
            eager=False
        )
        store_sigs = store_docs = None
        if cache_store:
            store_sigs, store_docs = _cached_store(spark, corpus_dir)
        sigs = store_sigs
        if fuse_probe and sigs is None:
            sigs = _read_sigs(spark, corpus_dir)
        if fuse_probe and sigs is not None:
            # FUSED collapse+probe (see docstring): one banded candidate
            # join of the batch against (batch ∪ store), one verify
            # chain, then split by the carried source tag — in-batch
            # pairs feed the cluster collapse, cross pairs the store
            # anti-join. Disjoint id spaces (store ids are prior
            # batches') make the union unambiguous without the tag; the
            # tag exists so the split is an O(1) filter, not a join.
            rhs = banded.select(
                F.col("doc_id").alias("dup_of"), "band", "bv",
                F.lit("batch").alias("src"),
            ).unionByName(
                sigs.select(
                    F.col("doc_id").alias("dup_of"), "band", "bv",
                    F.lit("store").alias("src"),
                )
            )
            cand_all = (
                banded.select(F.col("doc_id").alias("doc_id_new"), "band", "bv")
                .join(rhs, ["band", "bv"])
                .filter(
                    (F.col("src") == "store")
                    | (F.col("doc_id_new") < F.col("dup_of"))
                )
                .select("doc_id_new", "dup_of", "src")
                .distinct()
            )
            matched_ids = (
                cand_all.filter(F.col("src") == "store")
                .select(F.col("dup_of").alias("doc_id"))
                .distinct()
            )
            corpus = (
                store_docs
                if store_docs is not None
                else read_corpus(spark, corpus_dir)
            )
            sh_matched = shingle_docs(
                corpus.join(matched_ids, "doc_id", "left_semi"), n
            )
            verified = jaccard_verify_pairs(
                sh, sh.unionByName(sh_matched), cand_all, threshold,
                carry=("src",),
            ).localCheckpoint(eager=False)
            in_pairs = verified.filter(F.col("src") == "batch").select(
                F.col("doc_id").alias("doc_id_a"),
                F.col("dup_of").alias("doc_id_b"),
            )
            losers = dup_cluster_losers_capped(in_pairs)
            dupped = (
                verified.filter(F.col("src") == "store")
                .select("doc_id")
                .distinct()
            )
            docs = docs.join(losers, "doc_id", "left_anti").join(
                dupped, "doc_id", "left_anti"
            )
        else:
            # 1. within-batch collapse: one survivor (min id) PER
            # CONNECTED COMPONENT of the verified-pair graph —
            # cluster-representative semantics (see docstring). In-batch
            # components are candidate-bounded and tiny, so the losers
            # come from ONE collect + driver union-find (capped, falls
            # back to the distributed dup_clusters loop) instead of
            # paying label propagation's per-batch job count.
            pairs = minhash_dedup_pairs(
                docs, n=n, k=k, bands=bands, threshold=threshold, family=family,
                shingled=sh, banded=banded,
            )
            losers = dup_cluster_losers_capped(pairs)
            docs = docs.join(losers, "doc_id", "left_anti")
            sh_live = sh.join(losers, "doc_id", "left_anti")
            banded_live = banded.join(losers, "doc_id", "left_anti")
            # 2. cross-batch probe against the accumulated store; probe,
            # verify, and the admission anti-join stay one fused lazy plan
            # materialized by the pre-write checkpoint below. With
            # cache_store both store sides come from executor storage
            # (_cached_store) — the probe and the matched-docs verify read
            # skip their per-batch parquet scans; shingling still runs only
            # over candidate-MATCHED corpus rows (caching full-corpus
            # shingle sets measured strictly worse, NOTES r6).
            cand0 = probe_corpus_sigs(
                spark, corpus_dir, docs, n, k, bands, family, banded=banded_live,
                sigs=store_sigs,
            )
            if cand0 is not None:
                cand = cand0.localCheckpoint(eager=False)
                matched_ids = cand.select(F.col("dup_of").alias("doc_id")).distinct()
                corpus = (
                    store_docs
                    if store_docs is not None
                    else read_corpus(spark, corpus_dir)
                )
                sh_matched = shingle_docs(
                    corpus.join(matched_ids, "doc_id", "left_semi"), n
                )
                dupped = jaccard_verify_pairs(
                    sh_live, sh_matched, cand, threshold
                ).select(F.col("doc_id")).distinct()
                docs = docs.join(dupped, "doc_id", "left_anti")
        # 3. idempotent versioned append: docs first, sigs (+marker) last.
        # The docs write itself materializes the admission chain (probe →
        # verify → anti-join, all over the already-checkpointed staging
        # frames); the sigs semi-join then reads the admitted ids BACK
        # from the just-written parquet — replacing the former
        # checkpoint-then-write pair (2 jobs) with write-then-scan (the
        # read-back is a tiny fresh local file). Result frames are
        # byte-identical: the semi-join key set is the same admitted set
        # either way (pinned in test_streaming.py).
        docs_path = os.path.join(corpus_dir, "docs", f"v{batch_id}")
        sigs_path = os.path.join(corpus_dir, "sigs", f"v{batch_id}")
        docs.write.mode("overwrite").parquet(docs_path)
        admitted_ids = spark.read.parquet(docs_path).select("doc_id")
        banded.join(admitted_ids, "doc_id", "left_semi").write.mode(
            "overwrite"
        ).parquet(sigs_path)
        if cache_store:
            # extend the cache with the just-written admitted frames —
            # read back from parquet so the cached legs are scans, not
            # replays of this batch's verify chain
            _store_cache_append(
                corpus_dir,
                batch_id,
                spark.read.parquet(sigs_path),
                spark.read.parquet(docs_path),
            )

    _bind_checkpoint_to_corpus(checkpoint, corpus_dir, allow_checkpoint_rebind)
    writer = stream.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _bind_checkpoint_to_corpus(
    checkpoint: str, corpus_dir: str, allow_rebind: bool = False
) -> None:
    """Refuse the two SILENT-DATA-LOSS modes of a checkpoint/corpus
    mismatch (found by the r8 500k-store admission bench, which preloaded
    through one checkpoint and fed through another):

      * a FRESH checkpoint restarts micro-batch ids at 0, so against a
        corpus with committed versions its batch N collides with the
        existing v{N}: if v{N}'s sig marker survives, handle() treats the
        incoming batch as a crash REPLAY and silently drops it whole; if
        compaction already folded v{N} (marker vacuumed), the batch
        WRITES below the base's _THROUGH id — invisible to read_corpus
        and deleted by the next vacuum (measured: 9,999 admitted docs
        silently absent from the logical corpus);
      * a checkpoint bound to corpus A pointed at corpus B replays A's
        batch-id sequence against B's version history — same two
        failure shapes.

    The binding is a marker file inside the CHECKPOINT directory (the
    thing whose identity the batch ids belong to), written on first use:
    a checkpoint may only ever drive the corpus_dir it was born with,
    and a brand-new checkpoint may only start an EMPTY corpus. Restarts
    of the same (checkpoint, corpus) pair — the availableNow chunk
    harness, crash replay — see their own binding and pass. Exactly the
    guard-rail Delta's txn-appId/version pair provides for idempotent
    writers; parquet-protocol equivalent here.

    ``allow_rebind=True`` is the EXPLICIT recovery escape hatch for a
    lost/discarded checkpoint: it (re)writes the binding and accepts the
    old marker-skip semantics, which are only safe when the new stream's
    source re-delivers PREVIOUSLY-PROCESSED data (full source replay —
    committed versions short-circuit, nothing duplicates; writes that
    land below a compaction base are already-folded content and stay
    invisible by design). With genuinely NEW data in the re-delivered
    stream the id collision semantics apply — that is exactly the silent
    drop this guard exists to refuse, so rebind is an operator assertion,
    never a default."""
    import json as _json

    binding = os.path.join(checkpoint, "corpus_binding.json")
    # realpath, not abspath: the same corpus reached via a symlink or a
    # different cwd-relative spelling is the SAME identity — refusing it
    # would be fail-safe but needless operational friction (ADVICE r8).
    target = os.path.realpath(corpus_dir)

    def _write() -> None:
        os.makedirs(checkpoint, exist_ok=True)
        tmp = binding + ".tmp"
        with open(tmp, "w") as f:
            _json.dump({"corpus_dir": target}, f)
        os.replace(tmp, binding)

    if os.path.exists(binding):
        with open(binding) as f:
            bound = _json.load(f)["corpus_dir"]
        # Resolve the STORED spelling too: pre-r9 checkpoints wrote
        # abspath bindings, so one whose path contains a symlink
        # component would fail the identity check against today's
        # realpath spelling of the SAME directory (ADVICE r9 #4) —
        # realpath(stored) == realpath(asked) is the actual identity.
        if os.path.realpath(bound) != target:
            if allow_rebind:
                _write()
                return
            raise ValueError(
                f"checkpoint {checkpoint!r} is bound to corpus {bound!r} "
                f"but was asked to drive {target!r}: batch ids from one "
                "corpus' history replayed against another lose data "
                "silently (batches skipped as phantom replays or written "
                "below the compaction base). Use the corpus' own "
                "checkpoint, a new checkpoint with a new corpus_dir, or "
                "pass allow_checkpoint_rebind=True if this stream "
                "re-delivers previously-processed source data."
            )
        return
    has_committed = any(
        _latest_base(corpus_dir, kind)[0] is not None
        or _committed_versions(corpus_dir, -1, kind)
        for kind in ("docs", "sigs")
    )
    if has_committed and not allow_rebind:
        raise ValueError(
            f"corpus {target!r} already has committed versions but "
            f"checkpoint {checkpoint!r} is new: its micro-batch ids "
            "restart at 0 and collide with the existing version history "
            "(batches silently skipped as replays, or written below the "
            "compaction base and vacuumed). Resume with the checkpoint "
            "that built this corpus, start a fresh corpus_dir, or pass "
            "allow_checkpoint_rebind=True if this stream re-delivers "
            "previously-processed source data (lost-checkpoint recovery)."
        )
    _write()


def _latest_base(corpus_dir: str, kind: str) -> tuple[str | None, int]:
    """Newest committed compaction base for ``kind`` ('docs'|'sigs'):
    (path, through-batch-id), or (None, -1). A base is committed iff its
    directory rename completed — the _THROUGH file is written inside the
    temp dir BEFORE the atomic rename, so its presence plus the final
    name is the whole commit."""
    import glob

    best, through = None, -1
    for d in glob.glob(os.path.join(corpus_dir, kind, "base_v*")):
        name = os.path.basename(d)
        if name.endswith("_tmp"):
            continue
        t = int(name[len("base_v"):])
        if t > through and os.path.exists(os.path.join(d, "_THROUGH")):
            best, through = d, t
    return best, through


def _committed_versions(
    corpus_dir: str, above: int, kind: str = "docs"
) -> list[tuple[int, str]]:
    """Delta versions v{i} of ``kind`` with i > ``above`` whose batch
    committed (sig _SUCCESS marker). Enumerates the kind's OWN directory:
    after a crash between the docs and sigs base renames the two sides
    hold different delta sets (a later vacuum removes docs deltas the
    docs base absorbed while the sigs copies must survive), so deriving
    one side's fold list from the other's listing loses deltas."""
    import glob

    out = []
    for d in glob.glob(os.path.join(corpus_dir, kind, "v*")):
        i = int(os.path.basename(d)[1:])
        if i > above and os.path.exists(
            os.path.join(corpus_dir, "sigs", f"v{i}", "_SUCCESS")
        ):
            out.append((i, d))
    return sorted(out)


def compact_corpus(
    spark: SparkSession,
    corpus_dir: str,
    min_versions: int = 8,
    vacuum: bool = True,
) -> int:
    """Fold committed admission deltas into a single base per side — the
    LSM/Delta-checkpoint move that keeps read_corpus from unioning an
    ever-growing list of per-micro-batch directories (the streaming
    small-files problem; see compact_parquet_dir for the event-log
    flavor).

    Commit protocol (crash-safe at every step):
      1. write merged parquet + a _THROUGH marker into base_v{N}_tmp
         (N = highest merged batch id);
      2. os.rename to base_v{N} — atomic; this IS the commit;
      3. vacuum: delete merged delta dirs and older bases.
    Readers (read_corpus/_read_sigs) take the newest committed base plus
    only deltas ABOVE its _THROUGH id — so a crash after (2) but before
    (3) double-counts nothing: the stale deltas are ≤ N and skipped; the
    next compaction retries the vacuum. Returns the number of deltas
    folded (0 = below min_versions, nothing done)."""
    import shutil

    # Fold lists are derived PER KIND from that kind's own committed base:
    # after a crash between the docs rename and the sigs rename the docs
    # base is ahead of the sigs base, and reusing the docs-derived list for
    # sigs would exclude the sig deltas in (sigs_through, docs_through] —
    # once a new sigs base committed past them, readers would skip them and
    # vacuum would delete them (permanent signature loss). Each kind folds
    # everything above its OWN through, so the next compaction after a
    # crash heals the skew instead of baking it in.
    pending = {
        kind: _committed_versions(corpus_dir, _latest_base(corpus_dir, kind)[1], kind)
        for kind in ("docs", "sigs")
    }
    if max(len(v) for v in pending.values()) < min_versions:
        return 0
    for kind in ("docs", "sigs"):
        versions = pending[kind]
        if not versions:
            continue
        new_through = versions[-1][0]
        base, _ = _latest_base(corpus_dir, kind)
        parts = ([base] if base else []) + [p for _, p in versions]
        tmp = os.path.join(corpus_dir, kind, f"base_v{new_through}_tmp")
        final = os.path.join(corpus_dir, kind, f"base_v{new_through}")
        spark.read.parquet(*parts).write.mode("overwrite").parquet(tmp)
        with open(os.path.join(tmp, "_THROUGH"), "w") as f:
            f.write(str(new_through))
        if os.path.exists(final):
            shutil.rmtree(final)
        os.rename(tmp, final)  # the commit point
    if vacuum:
        vacuum_corpus(corpus_dir)
    return max(len(v) for v in pending.values())


def vacuum_corpus(corpus_dir: str) -> None:
    """Delete delta dirs already folded into the newest base, and bases
    older than the newest — safe to re-run any time (readers never look
    at either)."""
    import glob
    import shutil

    for kind in ("docs", "sigs"):
        newest, through = _latest_base(corpus_dir, kind)
        if newest is None:
            continue
        for d in glob.glob(os.path.join(corpus_dir, kind, "v*")):
            if int(os.path.basename(d)[1:]) <= through:
                shutil.rmtree(d, ignore_errors=True)
        for d in glob.glob(os.path.join(corpus_dir, kind, "base_v*")):
            name = os.path.basename(d)
            if name.endswith("_tmp") or (
                d != newest and int(name[len("base_v"):]) < through
            ):
                shutil.rmtree(d, ignore_errors=True)


def start_funnel_state(
    stream: DataFrame,
    out_dir: str,
    checkpoint: str,
    stages: "tuple[str, ...]" = ("signup", "view", "click", "purchase"),
    trigger_available_now: bool = True,
):
    """Incremental funnel maintenance (the streaming form of the
    funnel_conversion registry entry): each user's 4-slot stage machine
    lives in the streaming state store and is advanced by every micro-
    batch; each batch emits the post-batch slot vector for touched users
    (an update-mode changelog — latest emission per user IS the funnel
    state, so stage counts are one aggregate over it).

    Slots are SET-ONCE (a stage records the first qualifying event after
    the previous stage), so per-user state is 4 longs forever — no
    history accumulates, unlike sessionization state. Within a batch
    events are applied in (ts_ms, event_id) order; across batches the
    fold equals the batch operator when events arrive in event-time order
    (the CDC stand-in's contract — same assumption as the replica).
    An event-time-late stage event can under-fill a slot the batch
    operator would have filled; pinned equal under ordered replay in
    tests, and the honest fix for unordered feeds is a watermark-delayed
    re-sort upstream, not more state here.
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    n = len(stages)

    def update(key, pdfs, state: GroupState):
        slots = list(state.get) if state.exists else [None] * n
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts_ms", "event_id"])
            for ts, ty in zip(pdf["ts_ms"], pdf["event_type"]):
                for k, s in enumerate(stages):
                    if ty != s or slots[k] is not None:
                        continue
                    if k == 0 or (slots[k - 1] is not None and ts > slots[k - 1]):
                        slots[k] = int(ts)
                    break
        state.update(tuple(slots))
        row = {"user_id": int(key[0])}
        row.update({f"s{i + 1}": slots[i] for i in range(n)})
        yield pd.DataFrame([row])

    slot_cols = ", ".join(f"s{i + 1} long" for i in range(n))
    out = (
        stream.select("user_id", "ts_ms", "event_id", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=f"user_id long, {slot_cols}",
            stateStructType=slot_cols,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

    def append_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(out_dir)

    writer = (
        out.writeStream.foreachBatch(append_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_funnel_state(spark: SparkSession, out_dir: str, n_stages: int = 4) -> DataFrame:
    """Current funnel stage counts from the emitted changelog: latest
    emission per user (max batch_id wins), then one count per slot."""
    df = spark.read.parquet(out_dir)
    slot_cols = [f"s{i + 1}" for i in range(n_stages)]
    latest = (
        df.groupBy("user_id")
        .agg(
            F.max_by(F.struct(*slot_cols), F.col("batch_id")).alias("f")
        )
        .select("user_id", *[F.col(f"f.{c}").alias(c) for c in slot_cols])
    )
    return latest.agg(
        *[F.count(c).alias(f"n_{i + 1}") for i, c in enumerate(slot_cols)]
    )


# ---------------------------------------------------------------------------
# Incrementally-maintained corpus statistics (the corpus_stats registry
# entry as a streaming materialized view).
# ---------------------------------------------------------------------------


def _stats_versions(stats_dir: str) -> "list[int]":
    import glob

    out = []
    for d in glob.glob(os.path.join(stats_dir, "v*")):
        name = os.path.basename(d)
        if os.path.exists(os.path.join(d, "_SUCCESS")):
            out.append(int(name[1:]))
    return sorted(out)


def read_corpus_stats(
    spark: SparkSession, stats_dir: str, before: "int | None" = None
) -> "DataFrame | None":
    """Latest committed (lang, source)-grain stats, or None."""
    versions = _stats_versions(stats_dir)
    if before is not None:
        versions = [v for v in versions if v < before]
    if not versions:
        return None
    return spark.read.parquet(os.path.join(stats_dir, f"v{versions[-1]}"))


def rollup_corpus_stats(stats: DataFrame) -> DataFrame:
    """Per-language view of the (lang, source) MV: additive columns sum;
    provenance breadth (n_sources) = the source rows themselves — exact,
    because the MV keeps the finest grain that stays delta-foldable."""
    return stats.groupBy("lang").agg(
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.sum("n_chars").cast("long").alias("n_chars"),
        F.count("*").cast("long").alias("n_sources"),
    )


def start_corpus_stats_maintenance(
    doc_stream: DataFrame,
    stats_dir: str,
    checkpoint: str,
    trigger_available_now: bool = True,
):
    """corpus_stats as a DELTA-MAINTAINED materialized view: each admitted
    document batch folds its per-(lang, source) counts into the versioned
    stats table — per-batch cost is O(|batch| + |stats|), never a corpus
    rescan (the cdc_incremental_agg pattern applied to the curation
    pipeline's dashboard).

    Grain choice is the design point: (lang, source) is the FINEST grain
    at which every maintained column stays additive, so distinct-source
    breadth per language falls out exactly as the row count of the rollup
    — no approximate distinct, no state beyond the stats table itself.
    Distinct-TEXT counting (corpus_stats' n_unique_texts) is deliberately
    NOT here: exact distinct folding needs the per-doc fingerprint store,
    which is the admission signature store's job — a stats MV that
    pretended to fold it would drift on re-admitted duplicates.

    Crash safety mirrors the replica merge: v{N} with _SUCCESS
    short-circuits a replayed batch; the fold reads strictly
    before=batch_id so a replay merges onto N's true predecessor."""
    from ..functions import words

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        out = os.path.join(stats_dir, f"v{batch_id}")
        if os.path.exists(os.path.join(out, "_SUCCESS")):
            return  # replayed committed batch: idempotent skip
        deltas = (
            batch_df.select(
                "lang",
                "source",
                F.size(words(F.col("text"))).alias("__t"),
                F.length("text").alias("__c"),
            )
            .groupBy("lang", "source")
            .agg(
                F.count("*").cast("long").alias("n_docs"),
                F.sum("__t").cast("long").alias("n_tokens"),
                F.sum("__c").cast("long").alias("n_chars"),
            )
        )
        current = read_corpus_stats(spark, stats_dir, before=batch_id)
        if current is not None:
            merged = (
                current.unionByName(deltas)
                .groupBy("lang", "source")
                .agg(
                    F.sum("n_docs").cast("long").alias("n_docs"),
                    F.sum("n_tokens").cast("long").alias("n_tokens"),
                    F.sum("n_chars").cast("long").alias("n_chars"),
                )
            )
        else:
            merged = deltas
        merged.write.mode("overwrite").parquet(out)

    writer = (
        doc_stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
