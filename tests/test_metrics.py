"""Observability: per-micro-batch progress recording and zero-extra-pass
batch metrics (the reference's only signal is a print loop)."""

import json
import os

from pyspark.sql import functions as F

from simple_cdc_service_spark.config import INVOICE
from simple_cdc_service_spark.sources.changelog import generate_envelopes
from simple_cdc_service_spark.streaming import read_changelog_stream, start_replica_merge
from simple_cdc_service_spark.streaming.metrics import ProgressRecorder, observed


class TestProgressRecorder:
    def test_progress_lines_written_per_batch(self, spark, tmp_path):
        msgs, _ = generate_envelopes(n=200, seed=5, truncate_every=None, key_space=80)
        src = str(tmp_path / "src")
        os.makedirs(src)
        with open(os.path.join(src, "a.json"), "w") as f:
            for i, m in enumerate(msgs):
                f.write(json.dumps({"offset": i, "timestamp": i, "value": m}) + "\n")
        metrics_path = str(tmp_path / "metrics.jsonl")
        rec = ProgressRecorder(metrics_path)
        spark.streams.addListener(rec)
        try:
            start_replica_merge(
                read_changelog_stream(spark, src), INVOICE,
                str(tmp_path / "state"), str(tmp_path / "ckpt"),
            ).awaitTermination()
            # the listener bus is asynchronous — progress events can land
            # after awaitTermination returns; poll briefly
            import time

            progress = []
            for _ in range(40):
                lines = [json.loads(l) for l in open(metrics_path)]
                progress = [l for l in lines if l["event"] == "progress"]
                if sum(p["num_input_rows"] for p in progress) >= len(msgs):
                    break
                time.sleep(0.25)
        finally:
            spark.streams.removeListener(rec)
        events = {l["event"] for l in lines}
        assert "started" in events
        assert progress and sum(p["num_input_rows"] for p in progress) == len(msgs)
        assert all("triggerExecution" in p["duration_ms"] for p in progress)


class TestObserve:
    def test_metrics_collected_in_same_job(self, spark):
        df = spark.range(0, 1000).withColumn(
            "v", F.when(F.col("id") % 10 == 0, None).otherwise(F.col("id"))
        )
        out, obs = observed(
            df.filter(F.col("id") >= 100),
            "dq",
            n_rows=F.count(F.lit(1)),
            n_null_v=F.sum(F.col("v").isNull().cast("int")),
        )
        assert out.count() == 900  # the action that materializes the metrics
        got = obs.get
        assert got["n_rows"] == 900
        assert got["n_null_v"] == 90
