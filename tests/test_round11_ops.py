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
