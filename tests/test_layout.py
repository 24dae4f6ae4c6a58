"""Manifest pruning + z-order layout: the scan planner's file-skipping
contract. Pins (a) correctness — pruned reads return exactly the rows a
full-scan filter returns; (b) effectiveness — a z-ordered layout prunes
on BOTH clustering columns while a linear sort prunes only its own.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from simple_cdc_service_spark.sources.layout import write_linear, write_zordered
from simple_cdc_service_spark.sources.manifest import (
    build_manifest,
    prune_files,
    read_pruned,
)
from simple_cdc_service_spark.sources.tables import load_events

from conftest import SF_SMOKE

N_FILES = 16


@pytest.fixture(scope="module")
def layouts(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("layout")
    ev = load_events(spark, SF_SMOKE).select("event_id", "user_id", "value")
    stats = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("value"), F.max("value")
    ).collect()[0]
    bounds = {
        "user_id": (float(stats[0]), float(stats[1])),
        "value": (float(stats[2]), float(stats[3])),
    }
    lin = str(base / "linear")
    zord = str(base / "zorder")
    write_linear(ev, lin, "user_id", n_files=N_FILES)
    write_zordered(ev, zord, {c: bounds[c] for c in ("user_id", "value")}, n_files=N_FILES)
    return ev, bounds, lin, zord


def _mid_range(lo: float, hi: float, frac: float = 0.1) -> tuple[float, float]:
    mid = (lo + hi) / 2
    half = (hi - lo) * frac / 2
    return mid - half, mid + half


class TestManifestPruning:
    def test_pruned_read_matches_full_filter(self, spark, layouts):
        ev, bounds, lin, zord = layouts
        lo, hi = _mid_range(*bounds["user_id"])
        for path in (lin, zord):
            man = build_manifest(spark, path, ["user_id", "value"]).cache()
            got = sorted(
                r.event_id
                for r in read_pruned(spark, man, "user_id", lo, hi).collect()
            )
            want = sorted(
                r.event_id
                for r in ev.filter(
                    (F.col("user_id") >= lo) & (F.col("user_id") <= hi)
                ).collect()
            )
            assert got == want
            man.unpersist()

    def test_linear_layout_prunes_sort_column_only(self, spark, layouts):
        _, bounds, lin, _ = layouts
        man = build_manifest(spark, lin, ["user_id", "value"]).cache()
        n_files = man.select("file").distinct().count()
        u_files = prune_files(man, "user_id", *_mid_range(*bounds["user_id"]))
        v_files = prune_files(man, "value", *_mid_range(*bounds["value"]))
        man.unpersist()
        # sorted column: a 10% range hits a small fraction of the files
        assert len(u_files) <= n_files * 0.4
        # the other column: every file spans the whole range — no pruning
        assert len(v_files) == n_files

    def test_zorder_layout_prunes_both_columns(self, spark, layouts):
        _, bounds, _, zord = layouts
        man = build_manifest(spark, zord, ["user_id", "value"]).cache()
        n_files = man.select("file").distinct().count()
        u_files = prune_files(man, "user_id", *_mid_range(*bounds["user_id"]))
        v_files = prune_files(man, "value", *_mid_range(*bounds["value"]))
        man.unpersist()
        # both dimensions prune: each 10% range skips a real share of files
        assert len(u_files) <= n_files * 0.7
        assert len(v_files) <= n_files * 0.7

    def test_manifest_row_counts_cover_table(self, spark, layouts):
        ev, _, lin, _ = layouts
        man = build_manifest(spark, lin, ["user_id"])
        total = (
            man.filter(F.col("column") == "user_id")
            .agg(F.sum("n_rows"))
            .collect()[0][0]
        )
        assert total == ev.count()

    def test_empty_prune_returns_typed_empty(self, spark, layouts):
        _, bounds, lin, _ = layouts
        man = build_manifest(spark, lin, ["user_id"])
        hi = bounds["user_id"][1]
        df = read_pruned(spark, man, "user_id", hi + 10_000, hi + 20_000)
        assert df.count() == 0
        assert "user_id" in df.columns

    def test_empty_directory_and_empty_manifest(self, spark, tmp_path):
        """Zero parquet files → an empty (typed) manifest, and read_pruned
        over it returns an empty frame from the caller-supplied schema
        instead of raising."""
        from pyspark.sql import types as T

        empty_dir = str(tmp_path / "nothing")
        os.makedirs(empty_dir)
        man = build_manifest(spark, empty_dir, ["user_id"])
        assert man.count() == 0
        assert set(man.columns) == {"file", "column", "min_val", "max_val", "n_rows"}
        schema = T.StructType([T.StructField("user_id", T.LongType())])
        df = read_pruned(spark, man, "user_id", 0, 10, schema=schema)
        assert df.count() == 0 and df.columns == ["user_id"]
        with pytest.raises(ValueError):
            read_pruned(spark, man, "user_id", 0, 10)


class TestTsUnitSniffing:
    """events.ts unit detection: annotated footers use the declared unit;
    unannotated int64 is inferred from footer min/max stats and anything
    implausible fails loudly instead of silently assuming nanos (the
    driver has already varied the unit across rounds)."""

    def test_annotated_and_unannotated_units(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from simple_cdc_service_spark.sources.tables import _events_ts_to_ns_factor

        epoch_2025 = 1_750_000_000
        for unit, factor in (("s", 10**9), ("ms", 10**6), ("us", 10**3), ("ns", 1)):
            v = epoch_2025 * (10**9 // factor)
            # unannotated plain int64 → stats-based inference
            p = str(tmp_path / f"plain_{unit}.parquet")
            pq.write_table(pa.table({"ts": pa.array([v, v + 10], pa.int64())}), p)
            assert _events_ts_to_ns_factor(p) == factor, unit
        # annotated timestamp[us] → declared unit wins
        p = str(tmp_path / "annot.parquet")
        pq.write_table(
            pa.table({"ts": pa.array([epoch_2025 * 10**6], pa.timestamp("us"))}), p
        )
        assert _events_ts_to_ns_factor(p) == 10**3

    def test_implausible_range_raises(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq
        import pytest as _pytest

        from simple_cdc_service_spark.sources.tables import _events_ts_to_ns_factor

        p = str(tmp_path / "bad.parquet")
        pq.write_table(pa.table({"ts": pa.array([42, 99], pa.int64())}), p)
        with _pytest.raises(ValueError, match="refusing to guess"):
            _events_ts_to_ns_factor(p)
