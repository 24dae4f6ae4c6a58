"""Pipeline observability.

The reference has no metrics at all (its only signal is the consumer's
print loop, kafka-consumer-service/main.py:92-93). Two Spark-native
mechanisms replace it, both ZERO extra passes over the data:

* ``ProgressRecorder`` — a StreamingQueryListener appending one JSON line
  per micro-batch (batch id, input rows, process rate, durations) to a
  sidecar file. This is the per-batch heartbeat an operator pages on;
  at scale it feeds a metrics bus instead of a file.
* ``observed`` — batch-side ``DataFrame.observe``: named aggregate
  metrics (row counts, sums, null counts) collected AS the plan runs,
  piggybacking on the existing pass — never a second `.count()` job.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql.streaming import StreamingQueryListener


class ProgressRecorder(StreamingQueryListener):
    """Append micro-batch progress to ``path`` as JSON lines.

    Register with ``spark.streams.addListener(rec)``; remove with
    ``spark.streams.removeListener(rec)``. The callback runs on the
    driver's listener bus — keep it O(1) (a line append), never a Spark
    action."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        self._write({"event": "started", "id": str(event.id)})

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        self._write(
            {
                "event": "progress",
                "id": str(p.id),
                "batch_id": p.batchId,
                "num_input_rows": p.numInputRows,
                "process_rate": p.processedRowsPerSecond,
                "duration_ms": dict(p.durationMs or {}),
                # per stateful operator: state size and the late rows the
                # watermark silently discarded — the data-loss accounting the
                # reference (which drops ALL history on restart) never had.
                "state": [
                    {
                        "operator": getattr(s, "operatorName", None),
                        "rows_total": s.numRowsTotal,
                        "rows_updated": s.numRowsUpdated,
                        "dropped_by_watermark": s.numRowsDroppedByWatermark,
                    }
                    for s in (p.stateOperators or [])
                ],
            }
        )

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        self._write(
            {"event": "terminated", "id": str(event.id), "exception": event.exception}
        )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def _write(self, rec: dict) -> None:
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")


def observed(
    df: DataFrame, name: str, **metrics: Column
) -> tuple[DataFrame, Observation]:
    """Attach named observe() metrics to a batch DataFrame.

    Returns (df, observation); after ANY action on the returned frame,
    ``observation.get`` holds the metric values — computed inside the same
    job (Spark evaluates the aggregates on the rows streaming past the
    observe node), so data-quality counters cost no extra scan.
    """
    obs = Observation(name)
    return df.observe(obs, *[c.alias(n) for n, c in metrics.items()]), obs
