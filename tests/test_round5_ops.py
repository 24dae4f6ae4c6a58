"""Round-5 additions: interval-join density guard, pair-volume estimator,
wordpiece vocab hygiene, distributed gini equivalence."""

import pytest
from pyspark.sql import functions as F

from simple_cdc_service_spark.operators.temporal import (
    estimate_interval_join_pairs,
    interval_join_bucketed,
)
from simple_cdc_service_spark.operators.text import wordpiece_vocab
from simple_cdc_service_spark.registry import REGISTRY

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def tiny_pairs(spark):
    # 4 points in bucket 0, 2 in bucket 1; two intervals: [0,10) spans
    # bucket 0 only, [5,25) spans buckets 0 and 1 (width 20 → buckets
    # [0,20) and [20,40)... width is 10 below; see asserts)
    points = spark.createDataFrame(
        [(i, t) for i, t in enumerate([1, 3, 7, 9, 12, 18])], "pid long, ts long"
    )
    intervals = spark.createDataFrame(
        [(100, 0, 10), (200, 5, 25)], "iid long, lo long, hi long"
    )
    return points, intervals


class TestDensityGuard:
    def test_estimate_is_exact_candidate_volume(self, spark, tiny_pairs):
        points, intervals = tiny_pairs
        # width 10: point buckets = {0: ts 1,3,7,9 → 4 pts; 1: ts 12,18 → 2}
        # interval [0,10) → bucket 0; [5,25) → buckets 0,1,2
        # candidates = bucket0: 4 pts × 2 ivs + bucket1: 2 pts × 1 iv = 10
        est = estimate_interval_join_pairs(
            points, intervals, "ts", "lo", "hi", bucket_width=10
        )
        assert est == 10

    def test_guard_aborts_over_cap_and_names_alternatives(self, spark, tiny_pairs):
        points, intervals = tiny_pairs
        with pytest.raises(ValueError, match="interval_join_preagg"):
            interval_join_bucketed(
                points, intervals, "ts", "lo", "hi", 10, max_candidate_pairs=5
            )

    def test_guard_passes_under_cap_same_result(self, spark, tiny_pairs):
        points, intervals = tiny_pairs
        guarded = interval_join_bucketed(
            points, intervals, "ts", "lo", "hi", 10, max_candidate_pairs=10
        )
        bare = interval_join_bucketed(points, intervals, "ts", "lo", "hi", 10)
        key = ["pid", "iid"]
        assert sorted(map(tuple, guarded.select(key).collect())) == sorted(
            map(tuple, bare.select(key).collect())
        )

    def test_empty_inputs_estimate_zero(self, spark, tiny_pairs):
        points, intervals = tiny_pairs
        assert (
            estimate_interval_join_pairs(
                points.limit(0), intervals, "ts", "lo", "hi", 10
            )
            == 0
        )

    def test_registry_entry_runs_guarded(self, spark):
        # the registry form carries a 2B cap; sf0.001 is far under it
        df = REGISTRY["interval_join_bucketed"].fn(spark, SF)
        assert df.count() > 0


class TestWordpieceVocabHygiene:
    def test_vocab_has_no_empty_pieces(self, spark):
        docs = spark.createDataFrame(
            [(1, "hello world"), (2, "hola")], "doc_id long, text string"
        )
        vocab = wordpiece_vocab(docs, top_k=2)
        assert "" not in vocab
        assert "##" not in vocab
        assert "hello" in vocab and "##e" in vocab


class TestGiniDistributedEquivalence:
    def test_matches_naive_sorted_formula_on_skewed_input(self, spark, tmp_path):
        # hand-built skew: counts with heavy ties across log2 segments
        import numpy as np
        import pandas as pd

        rng = np.random.default_rng(7)
        counts = np.concatenate(
            [np.ones(50, dtype=int), rng.integers(1, 100, 60), [1000, 1000, 3]]
        )
        rows = []
        uid = 0
        for c in counts:
            rows.extend((uid, k) for k in range(int(c)))
            uid += 1
        pdf = pd.DataFrame(rows, columns=["user_id", "k"])
        pdf["ts"] = pd.Timestamp("2024-01-01")
        pdf["event_type"] = "x"
        pdf["value"] = 1.0
        pdf["event_id"] = range(len(pdf))
        p = str(tmp_path / "events.parquet")
        pdf.to_parquet(p)
        sf = str(tmp_path)
        r = REGISTRY["user_activity_gini"].fn(spark, sf).collect()[0]
        x = np.sort(counts)
        n, total = len(x), x.sum()
        gini = (2.0 * (np.arange(1, n + 1) * x).sum()) / (n * total) - (
            n + 1.0
        ) / n
        top = x[np.arange(1, n + 1) > n * 0.9].sum() / total
        assert r.n_users == n and r.n_events == total
        assert abs(r.gini - round(gini, 6)) <= 1e-9
        assert abs(r.top10pct_share - round(top, 6)) <= 1e-9


class TestCappedUnionFind:
    def _random_pairs(self, spark, seed, n_nodes=40, n_edges=35):
        import random

        rng = random.Random(seed)
        rows = [
            (rng.randrange(n_nodes), rng.randrange(n_nodes)) for _ in range(n_edges)
        ]
        rows = [(a, b) for a, b in rows if a != b]
        return spark.createDataFrame(rows, "doc_id_a long, doc_id_b long")

    @pytest.mark.parametrize("seed", [1, 2, 3, 4, 5])
    def test_losers_equal_dup_clusters(self, spark, seed):
        """Driver union-find must reproduce dup_clusters' non-representative
        set exactly (min-of-component survivor semantics) on random graphs
        with chains, cycles, and singleton edges."""
        from simple_cdc_service_spark.operators.dedup import (
            dup_cluster_losers_capped,
            dup_clusters,
        )

        pairs = self._random_pairs(spark, seed)
        expected = sorted(
            r.doc_id
            for r in dup_clusters(pairs)
            .filter(F.col("doc_id") != F.col("cluster_id"))
            .collect()
        )
        got = sorted(r.doc_id for r in dup_cluster_losers_capped(pairs).collect())
        assert got == expected

    def test_empty_pairs(self, spark):
        from simple_cdc_service_spark.operators.dedup import (
            dup_cluster_losers_capped,
        )

        pairs = spark.createDataFrame([], "doc_id_a long, doc_id_b long")
        assert dup_cluster_losers_capped(pairs).count() == 0

    def test_cap_falls_back_to_distributed(self, spark):
        from simple_cdc_service_spark.operators.dedup import (
            dup_cluster_losers_capped,
        )

        pairs = self._random_pairs(spark, 9, n_nodes=30, n_edges=25)
        # cap below the pair count forces the dup_clusters fallback path
        got = sorted(
            r.doc_id for r in dup_cluster_losers_capped(pairs, max_pairs=5).collect()
        )
        full = sorted(r.doc_id for r in dup_cluster_losers_capped(pairs).collect())
        assert got == full
