from .metrics import ProgressRecorder, observed  # noqa: F401
from .pipeline import (  # noqa: F401
    kafka_changelog_stream,
    read_agg,
    read_changelog_stream,
    read_replica,
    read_replica_bucketed,
    start_enriched_log,
    start_event_log_sink,
    start_multi_table_merge,
    start_replica_merge,
    start_replica_merge_bucketed,
    start_session_windows,
    start_stateful_replica,
    start_stream_stream_join,
    start_streaming_dedup,
    start_windowed_counts,
    vacuum_state,
)
