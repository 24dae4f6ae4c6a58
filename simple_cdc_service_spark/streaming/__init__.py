from .pipeline import (  # noqa: F401
    read_changelog_stream,
    start_event_log_sink,
    start_replica_merge,
    start_streaming_dedup,
    start_windowed_counts,
    read_replica,
)
