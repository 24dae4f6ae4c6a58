"""Round-11 pins: adaptive probe as knn_imi's DEFAULT path + loud
fixed-probe warning (VERDICT r10 #3), and engine-vs-oracle parity of
the IMI-regime knn_ivfpq mirror (VERDICT r10 #1) at test scale —
full-fidelity evidence is the sf1 check_oracle run."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def spark():
    from simple_cdc_service_spark.session import get_spark

    return get_spark("test-round11")


def _vec_pdf(n=500, dim=16, seed=11):
    import pandas as pd

    rng = np.random.RandomState(seed)
    return pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": [
                [float(x) for x in rng.uniform(-1, 1, size=dim)] for _ in range(n)
            ],
        }
    )


class TestKnnImiAdaptiveDefault:
    def test_default_nprobe_is_adaptive(self, spark):
        """Omitting nprobe must equal the explicit adaptive probe —
        the default-named path now carries the recall knob."""
        from simple_cdc_service_spark.operators.similarity import (
            adaptive_imi_khalf,
            adaptive_imi_nprobe,
            knn_imi,
        )

        pdf = _vec_pdf()
        df = spark.createDataFrame(pdf)
        corpus = df.filter("vec_id >= 5")
        queries = df.filter("vec_id < 5")
        k_half = adaptive_imi_khalf(495)
        a = knn_imi(corpus, queries, k=10).toPandas()
        b = knn_imi(
            corpus, queries, k=10, k_half=k_half,
            nprobe=adaptive_imi_nprobe(k_half * k_half),
        ).toPandas()
        key = ["query_id", "rank"]
        a = a.sort_values(key).reset_index(drop=True)
        b = b.sort_values(key).reset_index(drop=True)
        assert a.equals(b)

    def test_fixed_underprobe_warns(self, spark):
        """A fixed nprobe under a quarter of the grid is the measured
        2M-decade recall cliff — must warn loudly, before any work."""
        from simple_cdc_service_spark.operators.similarity import knn_imi

        df = spark.createDataFrame(_vec_pdf(n=60))
        with pytest.warns(UserWarning, match="probed fraction"):
            knn_imi(
                df.filter("vec_id >= 5"), df.filter("vec_id < 5"),
                k=5, k_half=20, nprobe=8,
            )

    def test_no_warning_at_committed_scales(self, spark):
        """nprobe=8 over a <=32-cell grid (every committed oracle
        scale) stays silent — the knn_imi registry entry's shape."""
        import warnings

        from simple_cdc_service_spark.operators.similarity import knn_imi

        df = spark.createDataFrame(_vec_pdf(n=60))
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            knn_imi(
                df.filter("vec_id >= 5"), df.filter("vec_id < 5"),
                k=5, k_half=4, nprobe=8,
            )

    def test_ivfpq_imi_underprobe_warns(self, spark, monkeypatch):
        """knn_ivfpq's IMI branch carries the same cliff warning."""
        from simple_cdc_service_spark.operators import similarity

        monkeypatch.setattr(
            similarity, "adaptive_coarse_shape", lambda n, **kw: ("imi", 20)
        )
        df = spark.createDataFrame(_vec_pdf(n=80))
        with pytest.warns(UserWarning, match="IMI cells"):
            similarity.knn_ivfpq(
                df.filter("vec_id >= 5"), df.filter("vec_id < 5"),
                k=5, nprobe=8,
            )


class TestIvfpqImiOracleParity:
    def test_engine_matches_imi_mirror(self, spark, monkeypatch):
        """Force the engine's coarse stage to IMI at test scale and
        compare against _expected_pq_result(imi_khalf=...) bit-for-bit
        — the parity the sf1 artifact asserts at 200k vectors
        (VERDICT r10 #1)."""
        import duckdb

        from simple_cdc_service_spark.functions.ref_oracle import (
            _expected_pq_result,
        )
        from simple_cdc_service_spark.operators import similarity

        pdf = _vec_pdf(n=600, dim=16, seed=23)
        k_half = 6  # 36 cells over 595 corpus vectors
        monkeypatch.setattr(
            similarity, "adaptive_coarse_shape", lambda n, **kw: ("imi", k_half)
        )
        df = spark.createDataFrame(pdf)
        got = (
            similarity.knn_ivfpq(
                df.filter("vec_id >= 5"), df.filter("vec_id < 5"),
                k=10, nprobe=8, m=8, ksub=16, rerank=50,
            )
            .toPandas()
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("embeddings", pdf)
        want = (
            _expected_pq_result(
                con,
                "SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 5",
                "SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5",
                k=10, m=8, ksub=16, rerank=50,
                imi_khalf=k_half, nprobe=8,
            )
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
        assert len(got) == len(want) > 0
        assert (got["neighbor_id"].to_numpy() == want["neighbor_id"].to_numpy()).all()
        assert (got["cos_sim"].to_numpy() == want["cos_sim"].to_numpy()).all()


class TestVerifyGateOnCellMass:
    """r11, VERDICT r10 #6: the in-bucket verify switch gates on the
    MEASURED shingle-cell mass (docs x mean set size, riding the
    factorize agg for free), not a raw doc count — few huge docs cross
    as early as many small ones. Calibration: VERIFY_GATE_AB_r11.json."""

    def _spy(self, monkeypatch):
        from simple_cdc_service_spark.operators import dedup

        calls = []
        real = dedup._minhash_verify_in_bucket

        def spy(*a, **kw):
            calls.append(1)
            return real(*a, **kw)

        monkeypatch.setattr(dedup, "_minhash_verify_in_bucket", spy)
        return calls

    def test_small_corpus_keeps_join_mode(self, spark, monkeypatch):
        from simple_cdc_service_spark.operators import dedup

        calls = self._spy(monkeypatch)
        df = spark.createDataFrame(
            [(i, f"alpha beta gamma delta w{i} z{i}") for i in range(50)],
            "doc_id long, text string",
        )
        dedup._FACTORIZE_DECISION_CACHE.clear()
        dedup.minhash_dedup_pairs(df, factorize=None).collect()
        assert calls == []  # tiny mass -> historical join plan

    def test_mass_not_doc_count_trips_the_gate(self, spark, monkeypatch):
        """Same 50 docs, but huge sets: with the gate constant scaled
        into test range, the MASS (50 docs x ~200 shingles) crosses
        where a doc-count gate would not."""
        from simple_cdc_service_spark.operators import dedup

        calls = self._spy(monkeypatch)
        monkeypatch.setattr(dedup, "_BUCKET_VERIFY_MIN_CELLS", 5_000)
        big = " ".join(f"tok{i}{j}" for j in range(220) for i in (1,))
        df = spark.createDataFrame(
            [(i, f"{big} uniq{i}") for i in range(50)],
            "doc_id long, text string",
        )
        dedup._FACTORIZE_DECISION_CACHE.clear()
        dedup.minhash_dedup_pairs(df, factorize=None).collect()
        assert calls, "50 docs x ~220 shingles = 11k cells > 5k gate"
        # control: same constant, small sets -> join mode
        calls.clear()
        small = spark.createDataFrame(
            [(i, f"a b c w{i}") for i in range(50)],
            "doc_id long, text string",
        )
        dedup._FACTORIZE_DECISION_CACHE.clear()
        dedup.minhash_dedup_pairs(small, factorize=None).collect()
        assert calls == []


class TestPersistedImiIndex:
    """r11 build/serve split: build_imi_index persists the corpus
    cell-partitioned; knn_imi_indexed turns probing into Catalyst
    partition pruning. Results bit-identical to in-memory knn_imi."""

    def _df(self, spark, n=400):
        return spark.createDataFrame(_vec_pdf(n=n, dim=16, seed=31))

    def test_serve_equals_in_memory(self, spark, tmp_path):
        from simple_cdc_service_spark.operators.similarity import (
            adaptive_imi_khalf,
            adaptive_imi_nprobe,
            build_imi_index,
            knn_imi,
            knn_imi_indexed,
        )

        df = self._df(spark)
        corpus = df.filter("vec_id >= 5")
        queries = df.filter("vec_id < 5")
        idx = str(tmp_path / "idx")
        meta = build_imi_index(corpus, idx)
        k_half = adaptive_imi_khalf(395)
        assert meta["k_half"] == k_half and meta["partition"] == "centroid_id"
        got = (
            knn_imi_indexed(spark, idx, queries, k=10)
            .toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
        )
        want = (
            knn_imi(
                corpus, queries, k=10, k_half=k_half,
                nprobe=adaptive_imi_nprobe(meta["cells"]),
            )
            .toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
        )
        assert got.equals(want) and len(got) > 0

    def test_bucketed_layout_equals_too(self, spark, tmp_path):
        """Grids past max_partition_dirs fold cells into 1024 directory
        buckets; the serve path adds the exact-cell filter on top."""
        from simple_cdc_service_spark.operators.similarity import (
            build_imi_index,
            knn_imi,
            knn_imi_indexed,
        )

        df = self._df(spark)
        corpus = df.filter("vec_id >= 5")
        queries = df.filter("vec_id < 5")
        idx = str(tmp_path / "idxb")
        meta = build_imi_index(corpus, idx, k_half=5, max_partition_dirs=4)
        assert meta["partition"] == "cell_bucket"
        got = (
            knn_imi_indexed(spark, idx, queries, k=10, nprobe=6)
            .toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
        )
        want = (
            knn_imi(corpus, queries, k=10, k_half=5, nprobe=6)
            .toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
        )
        assert got.equals(want) and len(got) > 0

    def test_probe_is_partition_pruning(self, spark, tmp_path):
        """The probed-cell filter must reach the scan as a
        PartitionFilter — directory pruning, not a post-scan filter."""
        import os

        from pyspark.sql import functions as F

        from simple_cdc_service_spark.operators.similarity import (
            build_imi_index,
        )

        df = self._df(spark)
        idx = str(tmp_path / "idxp")
        build_imi_index(df.filter("vec_id >= 5"), idx, k_half=4)
        dirs = [
            d for d in os.listdir(os.path.join(idx, "data"))
            if d.startswith("centroid_id=")
        ]
        assert len(dirs) > 4
        probed = [0, 1]
        scan = spark.read.parquet(os.path.join(idx, "data")).filter(
            F.col("centroid_id").isin(probed)
        )
        plan = scan._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "centroid_id" in plan.split(
            "PartitionFilters", 1
        )[1][:200]
        # and the pruned scan reads strictly fewer files than the layout
        all_files = sum(
            len(os.listdir(os.path.join(idx, "data", d))) for d in dirs
        )
        assert len(scan.inputFiles()) < all_files or len(scan.inputFiles()) <= len(probed)


class TestAppendImiIndex:
    """r11 incremental maintenance: the grid is frozen at build, so
    build(A)+append(B) must be EXACTLY build(A∪B, codebooks=cb_A)."""

    def _df(self, spark, n=400):
        return spark.createDataFrame(_vec_pdf(n=n, dim=16, seed=47))

    def test_append_equals_build_with_frozen_codebooks(self, spark, tmp_path):
        import numpy as np

        from simple_cdc_service_spark.operators.similarity import (
            append_imi_index,
            build_imi_index,
            knn_imi_indexed,
        )

        df = self._df(spark)
        base = df.filter("vec_id >= 5 and vec_id % 2 = 1")
        incr = df.filter("vec_id >= 5 and vec_id % 2 = 0")
        queries = df.filter("vec_id < 5")

        idx_a = str(tmp_path / "incr")
        m0 = build_imi_index(base, idx_a)
        m1 = append_imi_index(incr, idx_a)
        assert m1["n_rows"] == m0["n_rows"] + incr.count()
        assert m1["appended_rows"] == incr.count()
        assert m1["trained_rows"] == m0["n_rows"]
        # cells/k_half frozen by the append
        assert (m1["k_half"], m1["cells"]) == (m0["k_half"], m0["cells"])

        # reference: one-shot layout of the union under A's codebooks
        npz = np.load(f"{idx_a}/codebooks.npz")
        idx_b = str(tmp_path / "full")
        build_imi_index(
            df.filter("vec_id >= 5"), idx_b,
            k_half=m0["k_half"], codebooks=(npz["cb1"], npz["cb2"]),
        )
        got = sorted(map(tuple, knn_imi_indexed(spark, idx_a, queries, k=10).collect()))
        want = sorted(map(tuple, knn_imi_indexed(spark, idx_b, queries, k=10).collect()))
        assert got == want and len(got) > 0

    def test_append_creates_new_cell_dirs_and_serves_them(self, spark, tmp_path):
        import os

        from simple_cdc_service_spark.operators.similarity import (
            append_imi_index,
            build_imi_index,
            knn_imi_indexed,
        )

        df = self._df(spark)
        idx = str(tmp_path / "idx")
        build_imi_index(df.filter("vec_id >= 5 and vec_id < 50"), idx, k_half=4)
        dirs0 = set(os.listdir(os.path.join(idx, "data")))
        append_imi_index(df.filter("vec_id >= 50"), idx)
        dirs1 = set(os.listdir(os.path.join(idx, "data")))
        assert dirs1 >= dirs0  # appends only add directories
        # the served neighbor set reaches appended rows
        got = knn_imi_indexed(spark, idx, df.filter("vec_id < 5"), k=10)
        assert got.filter("neighbor_id >= 50").count() > 0

    def test_drift_warning_and_empty_paths(self, spark, tmp_path):
        import warnings

        from simple_cdc_service_spark.operators.similarity import (
            append_imi_index,
            build_imi_index,
        )

        df = self._df(spark)
        idx = str(tmp_path / "warn")
        build_imi_index(df.filter("vec_id >= 5 and vec_id < 105"), idx)
        # appending more rows than the training base warns (codebook drift)
        with pytest.warns(UserWarning, match="training base"):
            append_imi_index(df.filter("vec_id >= 105"), idx)
        # empty append is a no-op, no warning
        m_before = append_imi_index(df.filter("vec_id < 0"), idx)
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            m_after = append_imi_index(df.filter("vec_id < 0"), idx)
        assert m_after["n_rows"] == m_before["n_rows"]
        # append into an EMPTY index delegates to build (no codebooks yet)
        idx2 = str(tmp_path / "boot")
        build_imi_index(df.filter("vec_id < 0"), idx2)
        m = append_imi_index(df.filter("vec_id >= 5"), idx2)
        assert m["cells"] > 0 and m["n_rows"] == 395


class TestImiIndexMaintenance:
    """r11 streaming index maintenance: build on first batch, exactly-
    once appends after (stage -> b{B}-prefixed move -> meta commit)."""

    def _vec_rows(self, lo, hi, dim=16, seed=53):
        import numpy as np

        rng = np.random.RandomState(seed)
        all_vecs = rng.uniform(-1, 1, size=(hi, dim))
        return [
            {"vec_id": i, "embedding": [float(x) for x in all_vecs[i]]}
            for i in range(lo, hi)
        ]

    def test_stream_builds_then_appends_then_serves(self, spark, tmp_path):
        import json as _json
        import os

        from simple_cdc_service_spark.operators.similarity import (
            knn_imi_indexed,
        )
        from simple_cdc_service_spark.streaming import (
            start_imi_index_maintenance,
        )

        src = str(tmp_path / "src")
        idx = str(tmp_path / "idx")
        ckpt = str(tmp_path / "ckpt")
        os.makedirs(src)
        schema = "vec_id long, embedding array<double>"

        def feed(name, rows):
            with open(os.path.join(src, name), "w") as f:
                for r in rows:
                    f.write(_json.dumps(r) + "\n")
            start_imi_index_maintenance(
                spark.readStream.schema(schema).json(src), idx, ckpt
            ).awaitTermination()

        feed("c0.json", self._vec_rows(5, 150))
        with open(os.path.join(idx, "meta.json")) as f:
            m0 = _json.load(f)
        assert m0["committed_batches"] == [0] and m0["n_rows"] == 145
        feed("c1.json", self._vec_rows(150, 300))
        with open(os.path.join(idx, "meta.json")) as f:
            m1 = _json.load(f)
        assert m1["committed_batches"] == [0, 1]
        assert m1["n_rows"] == 295 and m1["appended_rows"] == 150
        # grid frozen by the append
        assert (m1["k_half"], m1["cells"]) == (m0["k_half"], m0["cells"])

        queries = spark.createDataFrame(
            [(r["vec_id"], r["embedding"]) for r in self._vec_rows(0, 5)],
            schema,
        )
        got = knn_imi_indexed(spark, idx, queries, k=10)
        assert got.count() == 50
        assert got.filter("neighbor_id >= 150").count() > 0  # appended rows serve

    def test_replay_and_crash_cleanup_are_exactly_once(self, spark, tmp_path):
        import glob
        import json as _json
        import os
        import shutil

        from simple_cdc_service_spark.operators.similarity import (
            append_imi_index,
            build_imi_index,
        )

        df = spark.createDataFrame(
            [(r["vec_id"], r["embedding"]) for r in self._vec_rows(5, 200)],
            "vec_id long, embedding array<double>",
        )
        idx = str(tmp_path / "idx")
        build_imi_index(df.filter("vec_id < 100"), idx)
        batch = df.filter("vec_id >= 100")
        m1 = append_imi_index(batch, idx, batch_id=7)
        files1 = sorted(glob.glob(os.path.join(idx, "data", "*", "b7-*.parquet")))
        assert files1 and m1["committed_batches"] == [7]
        # replay of a COMMITTED batch: whole call short-circuits
        m2 = append_imi_index(batch, idx, batch_id=7)
        assert m2["n_rows"] == m1["n_rows"]
        assert sorted(glob.glob(os.path.join(idx, "data", "*", "b7-*.parquet"))) == files1

        # crashed attempt: b8- files exist but meta never committed 8 —
        # the retry must remove them before re-appending (no duplicates)
        junk_dir = os.path.dirname(files1[0])
        shutil.copy(files1[0], os.path.join(junk_dir, "b8-999.parquet"))
        m3 = append_imi_index(batch.limit(10), idx, batch_id=8)
        assert m3["committed_batches"] == [7, 8]
        assert not glob.glob(os.path.join(idx, "data", "*", "b8-999.parquet"))
        total = spark.read.option("basePath", os.path.join(idx, "data")).parquet(
            os.path.join(idx, "data")
        ).count()
        assert total == m3["n_rows"]  # meta row count == physical rows


class TestRebuildImiIndex:
    def test_rebuild_equals_fresh_build_on_accumulated_corpus(
        self, spark, tmp_path
    ):
        """rebuild reads (id, v) back from the cells and re-trains — the
        codebook sample is selected by xxhash64(id) and v round-trips
        parquet exactly, so rebuild(build(A)+append(B)) must serve
        bit-identically to build(A∪B) directly."""
        from simple_cdc_service_spark.operators.similarity import (
            append_imi_index,
            build_imi_index,
            knn_imi_indexed,
            rebuild_imi_index,
        )

        df = spark.createDataFrame(_vec_pdf(n=300, dim=16, seed=61))
        corpus = df.filter("vec_id >= 5")
        queries = df.filter("vec_id < 5")
        grown = str(tmp_path / "grown")
        build_imi_index(corpus.filter("vec_id < 150"), grown)
        append_imi_index(corpus.filter("vec_id >= 150"), grown)
        rebuilt = str(tmp_path / "rebuilt")
        m = rebuild_imi_index(spark, grown, rebuilt)
        assert m["n_rows"] == 295 and m["appended_rows"] == 0
        fresh = str(tmp_path / "fresh")
        build_imi_index(corpus, fresh)
        got = sorted(map(tuple, knn_imi_indexed(spark, rebuilt, queries, k=10).collect()))
        want = sorted(map(tuple, knn_imi_indexed(spark, fresh, queries, k=10).collect()))
        assert got == want and len(got) > 0

    def test_rebuild_empty_index(self, spark, tmp_path):
        from simple_cdc_service_spark.operators.similarity import (
            build_imi_index,
            rebuild_imi_index,
        )

        df = spark.createDataFrame(_vec_pdf(n=10, dim=16, seed=61))
        empty = str(tmp_path / "empty")
        build_imi_index(df.filter("vec_id < 0"), empty)
        m = rebuild_imi_index(spark, empty, str(tmp_path / "e2"))
        assert m["cells"] == 0 and m["n_rows"] == 0

    def test_compaction_keeps_grid_and_serving_bit_identical(
        self, spark, tmp_path
    ):
        """retrain=False = compaction: small per-batch b{B}- files fold
        into one file per task group, codebooks/grid frozen, serving
        bit-identical, drift accounting carried."""
        import glob
        import os

        from simple_cdc_service_spark.operators.similarity import (
            append_imi_index,
            build_imi_index,
            knn_imi_indexed,
            rebuild_imi_index,
        )

        df = spark.createDataFrame(_vec_pdf(n=300, dim=16, seed=67))
        corpus = df.filter("vec_id >= 5")
        queries = df.filter("vec_id < 5")
        idx = str(tmp_path / "idx")
        build_imi_index(corpus.filter("vec_id < 100"), idx)
        for b, (lo, hi) in enumerate([(100, 170), (170, 240), (240, 300)]):
            append_imi_index(
                corpus.filter(f"vec_id >= {lo} and vec_id < {hi}"),
                idx, batch_id=b,
            )
        before = sorted(map(tuple, knn_imi_indexed(spark, idx, queries, k=10).collect()))
        n_files_before = len(glob.glob(os.path.join(idx, "data", "*", "*.parquet")))

        comp = str(tmp_path / "comp")
        m = rebuild_imi_index(spark, idx, comp, retrain=False)
        after = sorted(map(tuple, knn_imi_indexed(spark, comp, queries, k=10).collect()))
        assert after == before and len(after) > 0
        n_files_after = len(glob.glob(os.path.join(comp, "data", "*", "*.parquet")))
        assert n_files_after < n_files_before
        assert m["appended_rows"] == 200 and m["trained_rows"] == 95
        assert m["n_rows"] == 295


class TestImiIndexStats:
    def test_stats_track_layout_and_appends(self, spark, tmp_path):
        from simple_cdc_service_spark.operators.similarity import (
            append_imi_index,
            build_imi_index,
            imi_index_stats,
        )

        df = spark.createDataFrame(_vec_pdf(n=300, dim=16, seed=71))
        idx = str(tmp_path / "idx")
        build_imi_index(df.filter("vec_id >= 5 and vec_id < 200"), idx)
        s0 = imi_index_stats(idx)
        assert s0["n_rows"] == 195 and s0["appended_rows"] == 0
        assert s0["n_dirs"] <= s0["cells"]
        assert s0["rows_per_dir"]["min"] >= 1
        append_imi_index(df.filter("vec_id >= 200"), idx)
        s1 = imi_index_stats(idx)
        assert s1["n_rows"] == 295 and s1["appended_rows"] == 100
        assert s1["n_files"] > s0["n_files"]
        assert s1["mass_skew"] >= 1.0
        # footer row sum equals meta accounting (physical == logical)
        assert s1["n_rows"] == s1["trained_rows"] + s1["appended_rows"]


class TestSqlPipelineTwins:
    """r11 optimization round: the direct MinHash pipeline and the
    incremental band-probe are built as ONE SQL statement (driver-side
    analysis ran once per op before — ~0.45 s per invocation). These pin
    the SQL builders bit-identical to the reference Column
    implementations, including a giant bucket that exercises the
    chunked-triangular large path."""

    @staticmethod
    def _docs(spark, n=400, clone_every=7):
        import pandas as pd

        rows = []
        vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]
        for i in range(n):
            if i % clone_every == 0:
                words = ["dup", "dup", "cluster"] + [vocab[i % 3]] * 4
            else:
                words = [vocab[(i * 7 + j * 3) % 7] for j in range(9)]
            rows.append((i, " ".join(words)))
        return spark.createDataFrame(
            pd.DataFrame(rows, columns=["doc_id", "text"])
        )

    def test_minhash_sql_twin_matches_column_path(self, spark):
        from pyspark.sql import functions as F

        from simple_cdc_service_spark.operators.dedup import (
            _minhash_pairs_sql,
            jaccard_distinct,
            minhash_candidates,
            shingle_docs,
        )

        sh = shingle_docs(self._docs(spark), n=3)
        for family in ("md5", "xxhash64"):
            for threshold in (0.0, 0.5):
                cand = minhash_candidates(sh, 8, 4, "doc_id", family)
                a = sh.select(F.col("doc_id").alias("doc_id_a"), F.col("shingles").alias("__sh_a"))
                b = sh.select(F.col("doc_id").alias("doc_id_b"), F.col("shingles").alias("__sh_b"))
                col_out = a.join(cand, "doc_id_a").join(b, "doc_id_b").select(
                    "doc_id_a",
                    "doc_id_b",
                    F.round(jaccard_distinct(F.col("__sh_a"), F.col("__sh_b")), 4).alias("jaccard"),
                )
                if threshold > 0:
                    col_out = col_out.filter(F.col("jaccard") >= threshold)
                sql_out = _minhash_pairs_sql(sh, 8, 4, threshold, "doc_id", family)
                assert sql_out.columns == col_out.columns
                got = sorted(map(tuple, sql_out.collect()))
                want = sorted(map(tuple, col_out.collect()))
                assert got == want and len(got) > 0

    def test_minhash_sql_twin_chunked_giant_bucket(self, spark):
        """clone_every=1 makes EVERY doc identical -> one 120-member
        bucket per band; chunk=16 forces the chunked-triangular path in
        both implementations."""
        from pyspark.sql import functions as F

        from simple_cdc_service_spark.operators.dedup import (
            _minhash_pairs_sql,
            bucket_pairs,
            jaccard_distinct,
            minhash_banded,
            shingle_docs,
        )

        sh = shingle_docs(self._docs(spark, n=120, clone_every=1), n=3)
        cand = bucket_pairs(minhash_banded(sh, 8, 4, "doc_id", "md5"), id_col="doc_id", chunk=16)
        a = sh.select(F.col("doc_id").alias("doc_id_a"), F.col("shingles").alias("__sh_a"))
        b = sh.select(F.col("doc_id").alias("doc_id_b"), F.col("shingles").alias("__sh_b"))
        col_out = a.join(cand, "doc_id_a").join(b, "doc_id_b").select(
            "doc_id_a",
            "doc_id_b",
            F.round(jaccard_distinct(F.col("__sh_a"), F.col("__sh_b")), 4).alias("jaccard"),
        )
        sql_out = _minhash_pairs_sql(sh, 8, 4, 0.0, "doc_id", "md5", chunk=16)
        got = sorted(map(tuple, sql_out.collect()))
        want = sorted(map(tuple, col_out.collect()))
        assert got == want
        # clone_every=1 -> three 40-member clone groups (vocab[i % 3]);
        # each 40-member bucket > chunk=16 exercises the chunked path
        assert len(got) == 3 * (40 * 39 // 2)
        assert all(j == 1.0 for _, _, j in got)

    def test_incremental_sql_twin_matches_column_path(self, spark):
        from pyspark.sql import functions as F

        from simple_cdc_service_spark.operators.dedup import (
            _incremental_pairs_sql,
            jaccard_verify_pairs,
            minhash_banded,
            shingle_docs,
        )

        docs = self._docs(spark)
        sh_in = shingle_docs(docs.filter(F.col("doc_id") % 5 == 0), n=3)
        sh_corp = shingle_docs(docs.filter(F.col("doc_id") % 5 != 0), n=3)
        banded_in = minhash_banded(sh_in, 8, 4, "doc_id").select(
            F.col("doc_id").alias("doc_id_new"), "band", "bv"
        )
        banded_corp = minhash_banded(sh_corp, 8, 4, "doc_id").select(
            F.col("doc_id").alias("dup_of"), "band", "bv"
        )
        cand = banded_in.join(banded_corp, ["band", "bv"]).select("doc_id_new", "dup_of").distinct()
        col_out = jaccard_verify_pairs(sh_in, sh_corp, cand, 0.6, id_col="doc_id")
        sql_out = _incremental_pairs_sql(sh_in, sh_corp, 8, 4, 0.6, "doc_id")
        assert sql_out.columns == col_out.columns
        got = sorted(map(tuple, sql_out.collect()))
        want = sorted(map(tuple, col_out.collect()))
        assert got == want and len(got) > 0

    def test_shingle_docs_expr_matches_column_form(self, spark):
        from pyspark.sql import functions as F

        from simple_cdc_service_spark.functions import word_ngrams, words
        from simple_cdc_service_spark.operators.dedup import shingle_docs
        from simple_cdc_service_spark.sources.tables import spread

        docs = self._docs(spark)  # includes docs shorter than n after split? add one
        import pandas as pd
        short = spark.createDataFrame(pd.DataFrame([(9999, "one two")], columns=["doc_id", "text"]))
        docs = docs.unionByName(short)
        got = sorted(map(tuple, shingle_docs(docs, n=3).collect()))
        ref = sorted(map(tuple, spread(docs).select(
            F.col("doc_id"), word_ngrams(words(F.col("text")), 3).alias("shingles")
        ).collect()))
        assert got == ref

    def test_banded_sql_matches_reference_signature_columns(self, spark):
        """minhash_banded's expr-string signatures == the reference Column
        implementations (functions.minhash_signature / _xx) band-for-band."""
        from pyspark.sql import functions as F

        from simple_cdc_service_spark.functions import (
            minhash_signature,
            minhash_signature_xx,
        )
        from simple_cdc_service_spark.operators.dedup import (
            minhash_banded,
            shingle_docs,
        )

        sh = shingle_docs(self._docs(spark, n=150), n=3)
        k, bands, r = 8, 4, 2
        for family, ref in (
            ("md5", minhash_signature),
            ("xxhash64", minhash_signature_xx),
        ):
            got = sorted(map(tuple, minhash_banded(sh, k, bands, "doc_id", family).collect()))
            sig = sh.select("doc_id", ref(F.col("shingles"), k).alias("sig"))
            want = sorted(map(tuple, sig.select(
                "doc_id",
                F.explode(F.array(*[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.when(F.col("sig")[b * r].isNull(), F.lit(None).cast("string"))
                        .otherwise(F.concat_ws("|", *[F.col("sig")[b * r + j].cast("string") for j in range(r)]))
                        .alias("bv"),
                    )
                    for b in range(bands)
                ])).alias("bb"),
            ).select("doc_id", "bb.band", "bb.bv").collect()))
            assert got == want and len(got) == 150 * bands
