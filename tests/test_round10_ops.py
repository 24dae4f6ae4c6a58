"""Round-10 pins: the partition-local LSH verify (VERDICT r9 #1), the
loader-spread opt-in A/B (VERDICT r9 #2, plan pins live in
test_round9_ops), and the four ADVICE r9 fixes (oracle regime switch,
structural spread() plan match, band-cap warning, realpath binding)."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark():
    from simple_cdc_service_spark.session import get_spark

    return get_spark("test-round10")


def _rand_vec_df(spark, n=400, dim=16, seed=7, dups=20):
    """Uniform vectors + planted near-exact duplicates (id >= 10_000)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    base = rng.uniform(-1, 1, size=(n, dim))
    rows = [(i, [float(x) for x in base[i]]) for i in range(n)]
    for j in range(dups):
        v = base[j] + rng.uniform(-1e-4, 1e-4, size=dim)
        rows.append((10_000 + j, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


class TestPartitionLocalCosinePairs:
    """_partition_local_cosine_pairs must be BIT-IDENTICAL to the
    cogroup-tiled kernel it replaced in the LSH verify — same pair set,
    same cos_raw doubles — including groups that span Arrow batch
    boundaries and groups larger than the tile."""

    def _banded(self, spark, df, bands=4, rbits=4, seed=42):
        """Small banded frame (id, band, bv, v, nrm) like the LSH
        kernel's output, built with plain expressions for the test."""
        import numpy as np

        from simple_cdc_service_spark.functions import as_double_array, norm

        dim = len(df.select("embedding").first()[0])
        planes = np.random.RandomState(seed).standard_normal((bands * rbits, dim))
        e = df.select(
            "vec_id", as_double_array(F.col("embedding")).alias("v")
        ).withColumn("nrm", norm(F.col("v")))
        out = None
        for t in range(bands):
            bits = [
                F.when(
                    sum(
                        F.col("v")[d] * float(planes[t * rbits + j][d])
                        for d in range(dim)
                    )
                    >= 0,
                    "1",
                ).otherwise("0")
                for j in range(rbits)
            ]
            b = e.select(
                "vec_id",
                F.lit(t).alias("band"),
                F.concat(*bits).alias("bv"),
                "v",
                "nrm",
            )
            out = b if out is None else out.unionByName(b)
        return out

    def test_bit_identical_to_cogroup_kernel(self, spark):
        from pyspark.sql.types import LongType

        from simple_cdc_service_spark.operators.dedup import (
            _partition_local_cosine_pairs,
            _tiled_cosine_pairs,
        )

        df = _rand_vec_df(spark)
        eb = self._banded(spark, df).localCheckpoint(eager=True)
        kw = dict(
            key_cols=["band", "bv"],
            id_col="vec_id",
            id_type=LongType(),
            loose=-2.0,  # keep EVERY within-bucket pair: strictest test
            tile=2048,
        )
        got = {
            (r.vec_id_a, r.vec_id_b, r.cos_raw)
            for r in _partition_local_cosine_pairs(eb, **kw).collect()
        }
        want = {
            (r.vec_id_a, r.vec_id_b, r.cos_raw)
            for r in _tiled_cosine_pairs(eb, **kw).collect()
        }
        assert got == want and len(got) > 0

    def test_tile_split_does_not_change_values(self, spark):
        """A group far larger than the tile produces the same doubles as
        tile=huge — the per-dimension fold is tile-invariant."""
        from pyspark.sql.types import LongType

        from simple_cdc_service_spark.operators.dedup import (
            _partition_local_cosine_pairs,
        )

        df = _rand_vec_df(spark, n=300, dups=0)
        eb = self._banded(spark, df, bands=1, rbits=0)  # rbits=0 → one bucket
        # rbits=0 gives an empty concat → single '' bucket for all rows
        kw = dict(
            key_cols=["band", "bv"],
            id_col="vec_id",
            id_type=LongType(),
            loose=-2.0,
        )
        small = {
            (r.vec_id_a, r.vec_id_b, r.cos_raw)
            for r in _partition_local_cosine_pairs(eb, tile=64, **kw).collect()
        }
        big = {
            (r.vec_id_a, r.vec_id_b, r.cos_raw)
            for r in _partition_local_cosine_pairs(eb, tile=100_000, **kw).collect()
        }
        assert small == big and len(small) == 300 * 299 // 2

    def test_group_spanning_arrow_batches(self, spark):
        """Force tiny Arrow batches so one bucket spans many batches —
        the kernel's cross-batch buffer must reassemble it (pairs
        between rows of different batches must appear)."""
        from pyspark.sql.types import LongType

        from simple_cdc_service_spark.operators.dedup import (
            _partition_local_cosine_pairs,
        )

        old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "37")
        try:
            df = _rand_vec_df(spark, n=250, dups=0)
            eb = self._banded(spark, df, bands=1, rbits=0)
            n_pairs = _partition_local_cosine_pairs(
                eb,
                key_cols=["band", "bv"],
                id_col="vec_id",
                id_type=LongType(),
                loose=-2.0,
                tile=2048,
            ).count()
            assert n_pairs == 250 * 249 // 2
        finally:
            if old is None:
                spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
            else:
                spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)

    def test_lsh_plan_has_single_post_banding_exchange(self, spark):
        """The r10 point: the LSH verify plan carries NO window, NO
        join, and exactly ONE hash exchange keyed on the bucket —
        vectors cross one post-banding shuffle instead of four."""
        from simple_cdc_service_spark.operators.dedup import (
            embedding_dup_pairs_lsh,
        )

        df = _rand_vec_df(spark)
        plan = (
            embedding_dup_pairs_lsh(df, threshold=0.98, n_rows=420)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Window" not in plan
        assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
        # one hashpartitioning on (band, bv) feeding the kernel; the
        # trailing distinct adds its own exchange over the tiny survivor
        # stream, which is fine
        assert plan.count("hashpartitioning(band") == 1

    def test_lsh_pairs_unchanged_vs_r9_semantics(self, spark):
        """End-to-end: planted near-dups found, pair set identical to
        the spec (every planted copy pairs with its source at the 0.98
        threshold; no random-pair false positives at n=400)."""
        from simple_cdc_service_spark.operators.dedup import (
            embedding_dup_pairs_lsh,
        )

        df = _rand_vec_df(spark)
        pairs = {
            (r.vec_id_a, r.vec_id_b)
            for r in embedding_dup_pairs_lsh(df, threshold=0.98).collect()
        }
        planted = {(j, 10_000 + j) for j in range(20)}
        assert planted <= pairs
        # non-planted survivors would be random uniform pairs at
        # cos >= 0.98 — essentially impossible at dim=16, n=400
        assert pairs == planted


class TestAdviceR9Fixes:
    def test_ivfk_oracle_mirrors_regime_switch(self):
        """Below the flat cap ref_knn_ivfk is the flat SQL view; the
        regime predicate mirrors adaptive_coarse_shape exactly."""
        import math

        from simple_cdc_service_spark.operators.similarity import (
            adaptive_coarse_shape,
        )

        for n in (100, 128 * 1024, 128 * 1024 + 1, 1024 * 1024 + 1, 5_000_000):
            kind, _ = adaptive_coarse_shape(n)
            mirror_flat = n <= 0 or math.ceil(n / 1024) <= 128
            assert (kind == "flat") == mirror_flat, n

    def test_past_cap_oracles_take_imi_path(self, tmp_path):
        """VERDICT r10 #1: past the flat cap setup_knn_ivfpq /
        setup_dedup_semantic no longer raise OracleOutOfScale — they
        register IMI-regime mirrors (ref_knn_ivfpq table;
        ref_sem_assign view over numpy cells), restoring hash coverage
        in the 131k+ window. Full-fidelity evidence is the sf1
        check_oracle run (CORRECTNESS_SF1 artifact); this pins the
        regime dispatch on a just-past-cap synthetic corpus."""
        import duckdb

        from simple_cdc_service_spark.functions.ref_oracle import (
            setup_dedup_semantic,
            setup_knn_ivfpq,
        )

        con = duckdb.connect()
        # just past the cap: ceil((140005-5)/1024) = 137 > 128 → IMI.
        # Deterministic pseudo-random dim-8 vectors from hash bits so
        # the mirrors exercise real argmins, not all-ties.
        con.execute(
            "CREATE VIEW embeddings AS SELECT range AS vec_id, "
            "[CAST(hash(range * 8 + j) % 1000 AS DOUBLE) / 1000.0 + 0.001 "
            " FOR j IN range(8)] AS embedding FROM range(140005)"
        )
        setup_knn_ivfpq(con)
        got = con.execute(
            "SELECT count(*), count(DISTINCT query_id) FROM ref_knn_ivfpq"
        ).fetchone()
        assert got[0] == 50 and got[1] == 5  # k=10 per query, 5 queries

        setup_dedup_semantic(con)
        asg = con.execute(
            "SELECT count(*), count(DISTINCT centroid_id) FROM ref_sem_assign"
        ).fetchone()
        # every union-frame row assigned, blocked into many IMI cells
        assert asg[0] == 140005 + 50
        assert asg[1] > 64

    def test_spread_footer_probe_not_fooled_by_sorted_path(self, spark, tmp_path):
        """ADVICE r9 #2: a file path containing 'Sorted' must NOT skip
        the footer probe (the old substring match did) — the single-
        row-group file still gets repartitioned."""
        import pandas as pd

        from simple_cdc_service_spark.sources.tables import spread

        d = tmp_path / "Sorted_corpusJoinWindow"
        d.mkdir()
        p = str(d / "one.parquet")
        pd.DataFrame({"doc_id": range(100_000), "x": range(100_000)}).to_parquet(
            p, index=False
        )
        out = spread(spark.read.parquet(p))
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        assert "Repartition" in plan

    def test_band_cap_truncation_warns(self):
        from simple_cdc_service_spark.operators.dedup import adaptive_lsh_params

        with pytest.warns(UserWarning, match="recall floor"):
            adaptive_lsh_params(50_000_000, 0.2)

    def test_realpath_binding_accepts_old_abspath_spelling(self, tmp_path):
        """ADVICE r9 #4: a pre-r9 checkpoint whose stored binding is an
        abspath THROUGH a symlink must still pass the identity check."""
        import json

        from simple_cdc_service_spark.streaming.pipeline import (
            _bind_checkpoint_to_corpus,
        )

        real = tmp_path / "corpus_real"
        real.mkdir()
        link = tmp_path / "corpus_link"
        os.symlink(real, link)
        ckpt = tmp_path / "ckpt"
        ckpt.mkdir()
        # old-style binding: abspath spelling that contains the symlink
        with open(ckpt / "corpus_binding.json", "w") as f:
            json.dump({"corpus_dir": str(link)}, f)
        # driving the real path must pass (same identity), not raise
        _bind_checkpoint_to_corpus(str(ckpt), str(real), allow_rebind=False)
        # a genuinely different corpus still refuses
        other = tmp_path / "other"
        other.mkdir()
        with pytest.raises(ValueError):
            _bind_checkpoint_to_corpus(str(ckpt), str(other), allow_rebind=False)


class TestTrap31SkewDetector:
    """VERDICT r9 #6: the scale sweep records per-stage max/mean task
    records and flags >8x — the plan gate cannot see row-group skew,
    the runtime metrics can."""

    def test_detector_fires_on_two_row_group_file(self, spark, tmp_path):
        import pandas as pd
        import pyarrow
        import pyarrow.parquet

        from tools.task_skew import max_stage_id, stage_skew

        p = str(tmp_path / "two_rg.parquet")
        pdf = pd.DataFrame(
            {"doc_id": range(400_000), "text": ["word " * 30] * 400_000}
        )
        pyarrow.parquet.write_table(
            pyarrow.Table.from_pandas(pdf), p, row_group_size=200_000
        )
        old = spark.conf.get("spark.sql.files.maxPartitionBytes")
        spark.conf.set("spark.sql.files.maxPartitionBytes", "65536")
        try:
            # 2 giant row groups, ~30 byte-range scan partitions: rows
            # materialize in 2 tasks, the rest read zero — the TRAP #31
            # shape. The detector must flag the scan stage.
            w = max_stage_id(spark)
            spark.read.parquet(p).agg(F.sum(F.length("text"))).collect()
            # min_straggler_sec=0 in the test: the synthetic file is
            # cheap to scan; production sweeps keep the 30 s duration
            # gate that separates TRAP #31 from a benign scan->exchange
            hits = stage_skew(
                spark, since_stage=w, floor_records=50_000,
                min_straggler_sec=0.0,
            )
            assert hits, "straggler scan not flagged"
            assert hits[0]["skew_ratio"] >= 8.0
            assert hits[0]["max_records"] == 200_000

            # many small row groups: the same scan parallelizes for
            # real — no flag.
            p2 = str(tmp_path / "many_rg.parquet")
            pyarrow.parquet.write_table(
                pyarrow.Table.from_pandas(pdf), p2, row_group_size=10_000
            )
            w2 = max_stage_id(spark)
            spark.read.parquet(p2).agg(F.sum(F.length("text"))).collect()
            assert (
                stage_skew(
                    spark, since_stage=w2, floor_records=50_000,
                    min_straggler_sec=0.0,
                )
                == []
            )
        finally:
            spark.conf.set("spark.sql.files.maxPartitionBytes", old)


class TestKnnImiMultiprobe:
    """VERDICT r9 #5: knn_imi_mp (nprobe=32) buys the recall back; the
    subgrid probe that makes it cheap is provably identical to the
    full-grid ranking (hash-matched in check_oracle for BOTH entries)."""

    def test_recall_at_least_088_vs_bruteforce(self, spark):
        from simple_cdc_service_spark.registry import REGISTRY

        sf = "/root/testdata/sf0.001"
        bf = {
            (r.query_id, r.neighbor_id)
            for r in REGISTRY["knn_bruteforce"].fn(spark, sf).collect()
        }
        mp = {
            (r.query_id, r.neighbor_id)
            for r in REGISTRY["knn_imi_mp"].fn(spark, sf).collect()
        }
        assert len(bf & mp) / len(bf) >= 0.88  # measured 1.00

    def test_subgrid_equals_full_grid_ranking(self, spark):
        """The multiprobe subgrid must pick the SAME cells as a full
        d1+d2 grid argsort — including ties (stable, lowest cell id).
        Ties are forced by duplicated centroids."""
        import numpy as np

        from simple_cdc_service_spark.operators.similarity import imi_assign

        # duplicated rows in each codebook force exact distance ties
        cb1 = np.array([[0.5, 0.1], [0.5, 0.1], [-0.3, 0.2], [0.9, -0.4]])
        cb2 = np.array([[0.2, -0.7], [0.2, -0.7], [0.1, 0.3]])
        rng = np.random.RandomState(11)
        rows = [
            (i, [float(x) for x in rng.uniform(-1, 1, 4)]) for i in range(40)
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        for probe in (2, 3, 5, 12):  # 12 = all cells
            got = {
                (r.vec_id, r.centroid_id)
                for r in imi_assign(df, cb1, cb2, nprobe=probe).collect()
            }
            # reference: full-grid stable argsort per vector (the oracle
            # formulation) over the SAME normalized distances
            import pandas as pd

            X = np.array([r[1] for r in rows])
            nrm = np.sqrt((X * X).sum(axis=1))
            Xn = X / nrm[:, None]
            want = set()
            for i in range(40):
                d1 = ((Xn[i, :2][None, :] - cb1) ** 2).sum(axis=1)
                d2 = ((Xn[i, 2:][None, :] - cb2) ** 2).sum(axis=1)
                g = (d1[:, None] + d2[None, :]).ravel()
                for t in np.argsort(g, kind="stable")[: min(probe, 12)]:
                    want.add((i, int(t)))
            assert got == want, f"probe={probe}"


class TestAdaptiveImiNprobe:
    """The fixed-nprobe recall cliff (VERDICT r9 #5, measured at the 2M
    uniform decade: nprobe=32 → recall 0.18; cells/4=512 → 0.90):
    knn_imi_mp probes max(32, cells/4), mirrored in the oracle."""

    def test_mirror_parity(self):
        from simple_cdc_service_spark.functions.ref_oracle import (
            _adaptive_imi_nprobe,
        )
        from simple_cdc_service_spark.operators.similarity import (
            adaptive_imi_nprobe,
        )

        for cells in (0, 16, 25, 128, 129, 2025, 4096 * 4096):
            assert adaptive_imi_nprobe(cells) == _adaptive_imi_nprobe(cells)

    def test_floor_probes_whole_grid_at_oracle_scales(self):
        """At every committed oracle scale the grid is <= 32 cells, so
        the adaptive probe covers EVERY cell — byte-identical to the
        old fixed nprobe=32 (the hash evidence is untouched)."""
        from simple_cdc_service_spark.operators.similarity import (
            adaptive_imi_khalf,
            adaptive_imi_nprobe,
        )

        for n in (200, 2_000, 20_000):  # sf0.001 / 0.01 / 0.1 corpora
            cells = adaptive_imi_khalf(n) ** 2
            assert cells <= 32
            assert adaptive_imi_nprobe(cells) >= cells

    def test_quarter_fraction_at_decade(self):
        from simple_cdc_service_spark.operators.similarity import (
            adaptive_imi_nprobe,
        )

        assert adaptive_imi_nprobe(2025) == 507  # 2M vectors: 45² cells


class TestMinhashBucketVerify:
    """VERDICT r9 #4: past 1M docs the direct-path minhash verify runs
    in-bucket (arrays per band membership) instead of joining arrays
    onto every candidate (the TB-scale exchange that filled the disk at
    the 5M-doc decade). Both modes must produce IDENTICAL output."""

    def _corpus(self, spark, n=300, seed=5, giant=False):
        import random

        rng = random.Random(seed)
        vocab = [f"w{i}" for i in range(40 if giant else 2000)]
        rows = []
        for i in range(n):
            k = rng.randint(4, 30)
            rows.append((i, " ".join(rng.choice(vocab) for _ in range(k))))
        # planted near-dups: doc i and 10_000+i differ by one appended word
        for i in range(15):
            rows.append((10_000 + i, rows[i][1] + " extra"))
        return spark.createDataFrame(rows, "doc_id long, text string")

    def _pairs(self, df, **kw):
        from simple_cdc_service_spark.operators.dedup import minhash_dedup_pairs

        return {
            (r.doc_id_a, r.doc_id_b, r.jaccard)
            for r in minhash_dedup_pairs(df, factorize=False, **kw).collect()
        }

    def test_bucket_verify_equals_join_verify(self, spark):
        df = self._corpus(spark)
        for thr in (0.0, 0.6):
            a = self._pairs(df, threshold=thr, verify="join")
            b = self._pairs(df, threshold=thr, verify="bucket")
            assert a == b and (len(a) > 0 if thr == 0.0 else True), thr

    def test_bucket_verify_with_giant_buckets(self, spark):
        """A 6-word vocabulary and short docs make whole band buckets
        collide massively; chunk=8 forces those through the TILED giant
        path (small buckets still stream) — output identical to the
        join verify, and the giant path is PROVEN to have run (max
        bucket size asserted > chunk)."""
        import random

        from pyspark.sql import functions as F

        from simple_cdc_service_spark.operators.dedup import (
            _minhash_verify_in_bucket,
            minhash_banded,
            shingle_docs,
        )

        rng = random.Random(9)
        vocab = ["a", "b", "c", "d", "e", "f"]
        rows = [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(4, 10))))
            for i in range(140)
        ]
        # 100 exact clones (distinct ids, one shingle set) — a single
        # 100-member bucket in EVERY band, far past chunk=8
        rows += [(500 + i, "x y z x y z w") for i in range(100)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        sh = shingle_docs(df)
        max_bucket = (
            minhash_banded(sh, 8, 4)
            .filter(F.col("bv").isNotNull())
            .groupBy("band", "bv")
            .count()
            .agg(F.max("count"))
            .first()[0]
        )
        assert max_bucket > 8, "corpus failed to produce a giant bucket"
        join_pairs = self._pairs(df, verify="join")
        bucket_pairs_out = {
            (r.doc_id_a, r.doc_id_b, r.jaccard)
            for r in _minhash_verify_in_bucket(
                sh, k=8, bands=4, threshold=0.0, id_col="doc_id",
                family="md5", chunk=8,
            ).collect()
        }
        assert bucket_pairs_out == join_pairs and len(join_pairs) > 100

    def test_gate_keeps_join_plan_below_1m_docs(self, spark):
        """Committed oracle scales stay on the byte-identical r9 plan:
        the verify JOIN (SortMergeJoin on candidate ids) must appear;
        the bucket path's mapInPandas must not."""
        from simple_cdc_service_spark.operators.dedup import minhash_dedup_pairs
        from simple_cdc_service_spark.sources.tables import load_table

        df = load_table(spark, "documents", "/root/testdata/sf0.001")
        plan = (
            minhash_dedup_pairs(df)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "MapInPandas" not in plan and "FlatMapCoGroupsInPandas" not in plan
