"""Manifest-store replica merge (r10, VERDICT r9 #3): file-level key
statistics bound per-batch I/O — the parquet-protocol stand-in for
Delta/Iceberg MERGE data-file stats, and the r9 bucketing negative's
own conclusion (key-range stats prune what the batch touches; hash
buckets spread a high-entropy batch across 100% of partitions)."""

import json
import os

import pytest

from simple_cdc_service_spark.config import INVOICE
from simple_cdc_service_spark.sources.changelog import _envelope, generate_envelopes
from simple_cdc_service_spark.streaming import (
    bootstrap_manifest_store,
    read_changelog_stream,
    read_replica,
    read_replica_manifest,
    start_replica_merge,
    start_replica_merge_manifest,
    vacuum_manifest_store,
)

from test_streaming import _write_batch  # same harness


@pytest.fixture(scope="module")
def spark():
    from simple_cdc_service_spark.session import get_spark

    return get_spark("test-manifest-store")


class TestManifestMergeCorrectness:
    def test_matches_replay_and_versioned_merge(self, spark, tmp_path):
        """Two availableNow chunks through one checkpoint: the manifest
        replica must equal BOTH the sequential replay and the versioned
        merge's result on the identical feed (replica_exact)."""
        msgs, expected = generate_envelopes(
            n=600, seed=3, truncate_every=250, key_space=200
        )
        src = str(tmp_path / "src")
        state = str(tmp_path / "state")
        ckpt = str(tmp_path / "ckpt")
        vstate = str(tmp_path / "vstate")
        vckpt = str(tmp_path / "vckpt")

        _write_batch(src, "part1.json", msgs[:400], 0)
        start_replica_merge_manifest(
            read_changelog_stream(spark, src), INVOICE, state, ckpt,
            target_rows_per_file=50,
        ).awaitTermination()
        _write_batch(src, "part2.json", msgs[400:], 400)
        start_replica_merge_manifest(
            read_changelog_stream(spark, src), INVOICE, state, ckpt,
            target_rows_per_file=50,
        ).awaitTermination()
        got = {
            r.order_id: r.invoice_number
            for r in read_replica_manifest(spark, state).collect()
        }
        assert got == expected

        start_replica_merge(
            read_changelog_stream(spark, src), INVOICE, vstate, vckpt
        ).awaitTermination()
        ref = {
            r.order_id: r.invoice_number
            for r in read_replica(spark, vstate).collect()
        }
        assert got == ref

    def test_truncate_drops_all_references(self, spark, tmp_path):
        src = str(tmp_path / "src")
        state = str(tmp_path / "state")
        ckpt = str(tmp_path / "ckpt")
        b1 = [
            json.dumps(_envelope("c", None, {"order_id": 1, "invoice_number": 10}, 1, 1)),
            json.dumps(_envelope("c", None, {"order_id": 2, "invoice_number": 20}, 2, 2)),
        ]
        _write_batch(src, "b1.json", b1, 0)
        start_replica_merge_manifest(
            read_changelog_stream(spark, src), INVOICE, state, ckpt
        ).awaitTermination()
        assert read_replica_manifest(spark, state).count() == 2

        b2 = [
            json.dumps(_envelope("t", None, None, 3, 3)),
            json.dumps(_envelope("c", None, {"order_id": 9, "invoice_number": 90}, 4, 4)),
        ]
        _write_batch(src, "b2.json", b2, 2)
        start_replica_merge_manifest(
            read_changelog_stream(spark, src), INVOICE, state, ckpt
        ).awaitTermination()
        got = {
            r.order_id: r.invoice_number
            for r in read_replica_manifest(spark, state).collect()
        }
        assert got == {9: 90}

    def test_rerun_committed_batch_is_skipped(self, spark, tmp_path):
        """Crash replay: a committed manifest short-circuits the whole
        batch — no file rewritten, no manifest touched."""
        import glob

        from simple_cdc_service_spark.schemas import INVOICE_ROW
        from simple_cdc_service_spark.sources.changelog import envelopes_df
        from simple_cdc_service_spark.streaming.pipeline import (
            _merge_manifest_batch,
            _parse,
        )

        state = str(tmp_path / "state")
        msgs, expected = generate_envelopes(
            n=120, seed=7, truncate_every=50, key_space=40
        )
        parsed = _parse(envelopes_df(spark, msgs), INVOICE_ROW)
        _merge_manifest_batch(parsed, INVOICE, state, 0, 200_000)
        snap = {
            f: os.path.getmtime(f)
            for f in glob.glob(os.path.join(state, "**", "*"), recursive=True)
            if os.path.isfile(f)
        }
        _merge_manifest_batch(parsed, INVOICE, state, 0, 200_000)
        snap2 = {
            f: os.path.getmtime(f)
            for f in glob.glob(os.path.join(state, "**", "*"), recursive=True)
            if os.path.isfile(f)
        }
        assert snap == snap2
        got = {
            r.order_id: r.invoice_number
            for r in read_replica_manifest(spark, state).collect()
        }
        assert got == expected


class TestManifestPruning:
    def _bootstrap(self, spark, state, n=100_000, rows_per_file=5_000):
        df = spark.range(n).selectExpr(
            "id AS order_id", "CAST(id * 7 AS int) AS invoice_number"
        )
        m = bootstrap_manifest_store(
            df, INVOICE, state, batch_id=0, target_rows_per_file=rows_per_file
        )
        assert len(m["files"]) >= 15
        return m

    def test_hot_key_batch_touches_few_files(self, spark, tmp_path):
        """100 clustered keys against a 100k-row store in 20 range files:
        the merge must read <15% of files and carry the rest BY
        REFERENCE into the new manifest."""
        from simple_cdc_service_spark.schemas import INVOICE_ROW
        from simple_cdc_service_spark.sources.changelog import envelopes_df
        from simple_cdc_service_spark.streaming.pipeline import (
            _merge_manifest_batch,
            _parse,
            _read_manifest,
        )

        state = str(tmp_path / "state")
        m0 = self._bootstrap(spark, state)
        hot = [
            json.dumps(
                _envelope(
                    "u",
                    {"order_id": 50_000 + k, "invoice_number": 0},
                    {"order_id": 50_000 + k, "invoice_number": 999_000 + k},
                    100 + k,
                    100 + k,
                )
            )
            for k in range(100)
        ]
        parsed = _parse(envelopes_df(spark, hot), INVOICE_ROW)
        _merge_manifest_batch(parsed, INVOICE, state, 1, 5_000)
        m1 = _read_manifest(state, 1)
        assert m1["files_total"] == len(m0["files"])
        assert m1["files_touched"] / m1["files_total"] < 0.15
        # untouched files carried by reference: their v0 paths survive
        v0_paths = {e["path"] for e in m0["files"]}
        v1_paths = {e["path"] for e in m1["files"]}
        assert len(v0_paths & v1_paths) == m1["files_total"] - m1["files_touched"]
        # values merged exactly
        rep = read_replica_manifest(spark, state)
        assert rep.count() == 100_000
        got = {
            r.order_id: r.invoice_number
            for r in rep.filter("order_id >= 50000 AND order_id < 50100").collect()
        }
        assert got == {50_000 + k: 999_000 + k for k in range(100)}

    def test_uniform_batch_degrades_to_flat_rewrite(self, spark, tmp_path):
        """Keys spanning the whole range touch every file — graceful
        degradation to the versioned rewrite, still exact."""
        from simple_cdc_service_spark.schemas import INVOICE_ROW
        from simple_cdc_service_spark.sources.changelog import envelopes_df
        from simple_cdc_service_spark.streaming.pipeline import (
            _merge_manifest_batch,
            _parse,
            _read_manifest,
        )

        state = str(tmp_path / "state")
        self._bootstrap(spark, state)
        uni = [
            json.dumps(
                _envelope(
                    "u",
                    {"order_id": k * 997 % 100_000, "invoice_number": 0},
                    {"order_id": k * 997 % 100_000, "invoice_number": -k},
                    100 + k,
                    100 + k,
                )
            )
            for k in range(400)
        ]
        parsed = _parse(envelopes_df(spark, uni), INVOICE_ROW)
        _merge_manifest_batch(parsed, INVOICE, state, 1, 5_000)
        m1 = _read_manifest(state, 1)
        assert m1["files_touched"] / m1["files_total"] > 0.9
        assert read_replica_manifest(spark, state).count() == 100_000

    def test_deletes_erase_and_vacuum_reclaims(self, spark, tmp_path):
        from simple_cdc_service_spark.schemas import INVOICE_ROW
        from simple_cdc_service_spark.sources.changelog import envelopes_df
        from simple_cdc_service_spark.streaming.pipeline import (
            _merge_manifest_batch,
            _parse,
        )

        state = str(tmp_path / "state")
        self._bootstrap(spark, state, n=20_000, rows_per_file=1_000)
        dels = [
            json.dumps(
                _envelope(
                    "d", {"order_id": k, "invoice_number": 0}, None, 100 + k, 100 + k
                )
            )
            for k in range(500)
        ]
        parsed = _parse(envelopes_df(spark, dels), INVOICE_ROW)
        _merge_manifest_batch(parsed, INVOICE, state, 1, 1_000)
        rep = read_replica_manifest(spark, state)
        assert rep.count() == 19_500
        assert rep.filter("order_id < 500").count() == 0
        # vacuum with keep=1: v0 manifest dropped, its superseded data
        # files (the touched ones) deleted, the current state unharmed
        deleted = vacuum_manifest_store(state, keep=1)
        assert deleted, "superseded files should be reclaimed"
        assert read_replica_manifest(spark, state).count() == 19_500


class TestAdviceR10Fixes:
    """Regression pins for the ADVICE r10 findings: bootstrap/stream
    batch-id collision (medium), widest-schema manifest invariant, and
    vacuum vs in-flight batch output."""

    def test_bootstrap_then_stream_keeps_first_microbatch(self, spark, tmp_path):
        """The medium finding: bootstrap_manifest_store at its DEFAULT
        version then stream with a FRESH checkpoint — micro-batch 0 must
        be merged, not silently dropped as 'already committed'."""
        src = str(tmp_path / "src")
        state = str(tmp_path / "state")
        ckpt = str(tmp_path / "ckpt")
        base = spark.range(100).selectExpr(
            "id AS order_id", "id * 7 AS invoice_number"
        )
        m = bootstrap_manifest_store(base, INVOICE, state)
        assert m["batch_id"] == -1  # reserved, below any stream batch id
        b0 = [
            json.dumps(
                _envelope(
                    "u",
                    {"order_id": 5, "invoice_number": 35},
                    {"order_id": 5, "invoice_number": 999},
                    1, 1,
                )
            ),
            json.dumps(
                _envelope("c", None, {"order_id": 200, "invoice_number": 42}, 2, 2)
            ),
        ]
        _write_batch(src, "b0.json", b0, 0)
        start_replica_merge_manifest(
            read_changelog_stream(spark, src), INVOICE, state, ckpt
        ).awaitTermination()
        got = {
            r.order_id: r.invoice_number
            for r in read_replica_manifest(spark, state).collect()
        }
        assert got[5] == 999, "micro-batch 0 upsert lost (batch-id collision)"
        assert got[200] == 42
        assert len(got) == 101

    def test_manifest_schema_stays_widest_when_nothing_touched(self, spark, tmp_path):
        """A batch whose keys prune EVERY prior file must not narrow the
        recorded schema below the previous manifest's (here: bootstrap
        wrote bigint, the batch's rows parse as int)."""
        from pyspark.sql import types as T

        from simple_cdc_service_spark.config import ChangeTableConfig
        from simple_cdc_service_spark.schemas import row_schema
        from simple_cdc_service_spark.sources.changelog import envelopes_df
        from simple_cdc_service_spark.streaming.pipeline import (
            _latest_manifest,
            _merge_manifest_batch,
            _parse,
        )

        state = str(tmp_path / "state")
        cfg = ChangeTableConfig(
            name="narrow", key_columns=("order_id",),
            value_columns=("invoice_number",),
        )
        narrow_row = row_schema(
            {"order_id": T.LongType(), "invoice_number": T.IntegerType()}
        )
        base = spark.range(50).selectExpr(
            "id AS order_id", "id * 7 AS invoice_number"  # bigint value col
        )
        bootstrap_manifest_store(base, cfg, state)
        # keys far outside [0, 49]: every bootstrap file is pruned,
        # touched == [] and new_rows is ONLY the int-typed upserts
        batch = [
            json.dumps(
                _envelope("c", None, {"order_id": 10_000, "invoice_number": 1}, 1, 1)
            )
        ]
        parsed = _parse(envelopes_df(spark, batch), narrow_row)
        _merge_manifest_batch(parsed, cfg, state, 0, 200_000)
        ddl = _latest_manifest(state)["schema_ddl"]
        assert "bigint" in ddl and "invoice_number` int" not in ddl, ddl
        rep = read_replica_manifest(spark, state)
        assert rep.count() == 51
        assert rep.schema["invoice_number"].dataType.simpleString() == "bigint"

    def test_vacuum_spares_inflight_uncommitted_files(self, spark, tmp_path):
        """Data files of a version NEWER than the latest committed
        manifest are an in-flight batch's pre-commit output — vacuum
        must not delete them (ADVICE r10)."""
        state = str(tmp_path / "state")
        base = spark.range(1000).selectExpr(
            "id AS order_id", "id * 7 AS invoice_number"
        )
        bootstrap_manifest_store(base, INVOICE, state, target_rows_per_file=100)
        # simulate an in-flight merge: files written, manifest not yet
        # renamed into place
        inflight = os.path.join(state, "data", "v0")
        os.makedirs(inflight)
        with open(os.path.join(inflight, "part-00000.parquet"), "wb") as f:
            f.write(b"PAR1stub")
        deleted = vacuum_manifest_store(state, keep=1)
        assert deleted == []
        assert os.path.exists(os.path.join(inflight, "part-00000.parquet"))


class TestManifestCompaction:
    """compact_manifest_store (r11, VERDICT r10 #5): folds small files
    into target-sized range files by atomically rewriting the latest
    manifest; content bit-identical, versions untouched, superseded
    files reclaimable by vacuum."""

    def _feed(self, spark, src, state, ckpt, msgs, name, off):
        _write_batch(src, name, msgs, off)
        start_replica_merge_manifest(
            read_changelog_stream(spark, src), INVOICE, state, ckpt,
            target_rows_per_file=50,
        ).awaitTermination()

    def test_compaction_preserves_content_and_bounds_files(self, spark, tmp_path):
        from simple_cdc_service_spark.streaming import compact_manifest_store
        from simple_cdc_service_spark.streaming.pipeline import (
            _latest_manifest,
            _manifest_versions,
        )

        src = str(tmp_path / "src")
        state = str(tmp_path / "state")
        ckpt = str(tmp_path / "ckpt")
        msgs, expected = generate_envelopes(
            n=600, seed=5, truncate_every=None, key_space=300
        )
        # three micro-batches of small files (target 50 rows/file)
        self._feed(spark, src, state, ckpt, msgs[:200], "b0.json", 0)
        self._feed(spark, src, state, ckpt, msgs[200:400], "b1.json", 200)
        self._feed(spark, src, state, ckpt, msgs[400:], "b2.json", 400)
        before = read_replica_manifest(spark, state)
        rows_before = {
            r.order_id: r.invoice_number for r in before.collect()
        }
        assert rows_before == expected
        m_before = _latest_manifest(state)
        versions_before = _manifest_versions(state)

        m_after = compact_manifest_store(
            spark, state, target_rows_per_file=50_000, min_files=2
        )
        assert m_after is not None
        # fewer files, same version chain, identical content
        assert len(m_after["files"]) < len(m_before["files"])
        assert m_after["total_rows"] == m_before["total_rows"]
        assert _manifest_versions(state) == versions_before
        rows_after = {
            r.order_id: r.invoice_number
            for r in read_replica_manifest(spark, state).collect()
        }
        assert rows_after == rows_before

        # vacuum reclaims the superseded small files, content unharmed
        deleted = vacuum_manifest_store(state, keep=1)
        assert deleted
        rows_vac = {
            r.order_id: r.invoice_number
            for r in read_replica_manifest(spark, state).collect()
        }
        assert rows_vac == rows_before

    def test_stream_continues_after_compaction(self, spark, tmp_path):
        """Replay equality across a compaction: the next micro-batch
        merges against the compacted manifest; final state equals the
        never-compacted replay of the same feed."""
        from simple_cdc_service_spark.streaming import compact_manifest_store

        msgs, expected = generate_envelopes(
            n=400, seed=9, truncate_every=None, key_space=150
        )
        src = str(tmp_path / "src")
        state = str(tmp_path / "state")
        ckpt = str(tmp_path / "ckpt")
        self._feed(spark, src, state, ckpt, msgs[:200], "b0.json", 0)
        assert compact_manifest_store(
            spark, state, target_rows_per_file=50_000, min_files=2
        ) is not None
        self._feed(spark, src, state, ckpt, msgs[200:], "b1.json", 200)
        got = {
            r.order_id: r.invoice_number
            for r in read_replica_manifest(spark, state).collect()
        }
        assert got == expected

        # reference replay without compaction
        src2, state2, ckpt2 = (
            str(tmp_path / "src2"), str(tmp_path / "state2"), str(tmp_path / "ckpt2")
        )
        self._feed(spark, src2, state2, ckpt2, msgs[:200], "b0.json", 0)
        self._feed(spark, src2, state2, ckpt2, msgs[200:], "b1.json", 200)
        ref = {
            r.order_id: r.invoice_number
            for r in read_replica_manifest(spark, state2).collect()
        }
        assert got == ref

    def test_noop_below_min_files(self, spark, tmp_path):
        from simple_cdc_service_spark.streaming import compact_manifest_store

        state = str(tmp_path / "state")
        base = spark.range(100).selectExpr(
            "id AS order_id", "id * 7 AS invoice_number"
        )
        bootstrap_manifest_store(base, INVOICE, state)  # one file
        assert compact_manifest_store(spark, state, min_files=8) is None


class TestTimeTravel:
    def _feed(self, spark, tmp_path, chunks, **kw):
        src = str(tmp_path / "src")
        state = str(tmp_path / "state")
        ckpt = str(tmp_path / "ckpt")
        pos = 0
        for i, chunk in enumerate(chunks):
            _write_batch(src, f"part{i}.json", chunk, pos)
            pos += len(chunk)
            start_replica_merge_manifest(
                read_changelog_stream(spark, src), INVOICE, state, ckpt, **kw
            ).awaitTermination()
        return state

    def test_version_read_matches_versioned_replay(self, spark, tmp_path):
        """r11 time travel: read_replica_manifest(version=v) equals the
        flat versioned store's read_replica(before=v+1) at EVERY
        committed version on the identical feed — the Delta VERSION AS
        OF contract, pinned against the independently-implemented
        versioned merge rather than a replay of the same code."""
        from simple_cdc_service_spark.streaming import manifest_store_history

        msgs, _ = generate_envelopes(
            n=600, seed=11, truncate_every=250, key_space=150
        )
        chunks = [msgs[:200], msgs[200:450], msgs[450:]]
        state = self._feed(spark, tmp_path, chunks, target_rows_per_file=40)

        vsrc = str(tmp_path / "vsrc")
        vstate = str(tmp_path / "vstate")
        vckpt = str(tmp_path / "vckpt")
        pos = 0
        for i, chunk in enumerate(chunks):
            _write_batch(vsrc, f"part{i}.json", chunk, pos)
            pos += len(chunk)
            start_replica_merge(
                read_changelog_stream(spark, vsrc), INVOICE, vstate, vckpt
            ).awaitTermination()

        hist = manifest_store_history(state)
        versions = [h["version"] for h in hist]
        assert versions == [0, 1, 2]
        for v in versions:
            got = {
                r.order_id: r.invoice_number
                for r in read_replica_manifest(spark, state, version=v).collect()
            }
            want = {
                r.order_id: r.invoice_number
                for r in read_replica(spark, vstate, before=v + 1).collect()
            }
            assert got == want, f"version {v} diverges"
        # history stats are internally consistent with the reads
        for h, v in zip(hist, versions):
            assert h["total_rows"] == read_replica_manifest(
                spark, state, version=v
            ).count()

        with pytest.raises(ValueError):
            read_replica_manifest(spark, state, before=1, version=1)
        with pytest.raises(KeyError):
            read_replica_manifest(spark, state, version=99)

    def test_travel_survives_compaction_vacuum_sets_horizon(
        self, spark, tmp_path
    ):
        """Compaction rewrites only the LATEST manifest, so prior
        versions keep reading identically; vacuum(keep=k) is the travel
        horizon — dropped versions raise KeyError, retained ones still
        read (their files were kept live by the retained manifests)."""
        from simple_cdc_service_spark.streaming import (
            compact_manifest_store,
            manifest_store_history,
        )

        msgs, _ = generate_envelopes(n=600, seed=13, key_space=120)
        chunks = [msgs[:200], msgs[200:400], msgs[400:]]
        state = self._feed(spark, tmp_path, chunks, target_rows_per_file=30)

        before = {
            v: {
                r.order_id: r.invoice_number
                for r in read_replica_manifest(spark, state, version=v).collect()
            }
            for v in (0, 1, 2)
        }
        assert compact_manifest_store(
            spark, state, target_rows_per_file=30_000, min_files=2
        ) is not None
        for v in (0, 1, 2):
            after = {
                r.order_id: r.invoice_number
                for r in read_replica_manifest(spark, state, version=v).collect()
            }
            assert after == before[v], f"compaction changed version {v}"
        assert "compacted_from" in manifest_store_history(state)[-1]

        vacuum_manifest_store(state, keep=2)
        with pytest.raises(KeyError):
            read_replica_manifest(spark, state, version=0)
        for v in (1, 2):
            kept = {
                r.order_id: r.invoice_number
                for r in read_replica_manifest(spark, state, version=v).collect()
            }
            assert kept == before[v], f"vacuum broke retained version {v}"


class TestMultiTableManifest:
    def test_two_tables_one_stream_manifest_store(self, spark, tmp_path):
        """r11: start_multi_table_merge(store='manifest') routes each
        table's slice through the key-stats manifest merge — one stream,
        N pruned stores; replicas match the versioned route exactly."""
        import json as _json

        from pyspark.sql import types as T

        from simple_cdc_service_spark.config import ChangeTableConfig
        from simple_cdc_service_spark.schemas import INVOICE_ROW, row_schema
        from simple_cdc_service_spark.streaming.pipeline import (
            _latest_manifest,
            start_multi_table_merge,
        )

        def env(table, op, before, after, pos):
            return _json.dumps(
                {"payload": {"before": before, "after": after, "op": op,
                             "ts_ms": pos,
                             "source": {"table": table, "file": "b.1",
                                        "pos": pos, "row": 0}}}
            )

        PRODUCT_ROW = row_schema({"sku": T.LongType(), "price": T.LongType()})
        PRODUCT = ChangeTableConfig(
            name="product", key_columns=("sku",), value_columns=("price",),
            order_columns=("offset",),
        )
        msgs = [
            env("invoice", "c", None, {"order_id": 1, "invoice_number": 10}, 1),
            env("product", "c", None, {"sku": 7, "price": 99}, 2),
            env("invoice", "u", {"order_id": 1, "invoice_number": 10},
                {"order_id": 1, "invoice_number": 11}, 3),
            env("product", "d", {"sku": 7, "price": 99}, None, 4),
            env("product", "c", None, {"sku": 8, "price": 42}, 5),
        ]
        src = str(tmp_path / "src")
        _write_batch(src, "a.json", msgs, 0)
        tables = {
            "invoice": (INVOICE, INVOICE_ROW),
            "product": (PRODUCT, PRODUCT_ROW),
        }
        start_multi_table_merge(
            read_changelog_stream(spark, src), tables,
            str(tmp_path / "state"), str(tmp_path / "ckpt"),
            store="manifest",
        ).awaitTermination()

        inv_state = str(tmp_path / "state" / "invoice")
        prod_state = str(tmp_path / "state" / "product")
        inv = {r.order_id: r.invoice_number
               for r in read_replica_manifest(spark, inv_state).collect()}
        prod = {r.sku: r.price
                for r in read_replica_manifest(spark, prod_state).collect()}
        assert inv == {1: 11}
        assert prod == {8: 42}
        # each table commits its OWN manifest chain with its own key
        assert _latest_manifest(inv_state)["key"] == "order_id"
        assert _latest_manifest(prod_state)["key"] == "sku"

        with pytest.raises(ValueError):
            start_multi_table_merge(
                read_changelog_stream(spark, src), tables,
                str(tmp_path / "s2"), str(tmp_path / "c2"), store="bogus",
            )
