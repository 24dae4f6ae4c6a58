"""Every registered query must match its DuckDB oracle at sf0.001 — the
same gate the driver applies at sf0.01 (kept at the smoke scale here so the
full suite stays fast)."""

import duckdb
import pandas as pd
import pytest

from simple_cdc_service_spark.registry import REGISTRY
from simple_cdc_service_spark.sources.tables import TABLES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def oracle():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    yield con
    con.close()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


@pytest.mark.parametrize("name", [n for n, s in REGISTRY.items() if s.oracle])
def test_matches_oracle(spark, oracle, name):
    spec = REGISTRY[name]
    got = _norm(spec.fn(spark, SF_DIR).toPandas())
    if spec.oracle_setup is not None:
        spec.oracle_setup(oracle)
    want = _norm(oracle.execute(spec.oracle).df())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    for c in got.columns:
        a, b = got[c], want[c]
        assert (a.astype(str) == b.astype(str)).all(), f"column {c} differs"


@pytest.mark.parametrize("name", [n for n, s in REGISTRY.items() if not s.oracle])
def test_rows_only_runs(spark, name):
    df = REGISTRY[name].fn(spark, SF_DIR)
    assert df.count() >= 0


class TestApproxVariants:
    """Approximate operators are rows-only for the driver; their quality
    contract is pinned here against the exact implementations."""

    def test_approx_distinct_close_to_exact(self, spark):
        """The error-bound booleans the oracle asserts as literals must
        actually hold, and the exact counts must agree with the exact
        distinct_count query."""
        from simple_cdc_service_spark.registry import REGISTRY

        row = REGISTRY["approx_distinct"].fn(spark, SF_DIR).collect()[0]
        exact = REGISTRY["distinct_count"].fn(spark, SF_DIR).collect()[0]
        assert row.users_within_5pct and row.types_within_5pct
        assert row.exact_users == exact.n_users
        assert row.exact_types == exact.n_types

    def test_ml_minhash_recall_vs_exact(self, spark):
        from simple_cdc_service_spark.registry import REGISTRY

        exact = {
            (r.doc_id_a, r.doc_id_b)
            for r in REGISTRY["dedup_minhash"].fn(spark, SF_DIR).collect()
            if r.jaccard >= 0.65
        }
        ml = {
            (r.doc_id_a, r.doc_id_b)
            for r in REGISTRY["dedup_minhash_ml"].fn(spark, SF_DIR).collect()
        }
        if exact:
            assert len(exact & ml) / len(exact) >= 0.8

    def test_knn_ivf_recall_floor(self, spark):
        from simple_cdc_service_spark.registry import REGISTRY

        bf = {
            (r.query_id, r.neighbor_id)
            for r in REGISTRY["knn_bruteforce"].fn(spark, SF_DIR).collect()
        }
        ivf = {
            (r.query_id, r.neighbor_id)
            for r in REGISTRY["knn_ivf"].fn(spark, SF_DIR).collect()
        }
        # single-probe IVF on uniform random vectors: recall is modest by
        # design; the floor just catches total breakage (e.g. empty probe).
        assert len(bf & ivf) / len(bf) >= 0.2

    def test_knn_ivf_kmeans_recall_bar(self, spark):
        """KMeans centroids + multi-probe must clear a real recall bar
        (same cosine metric as bruteforce, so ≥ 0.8 is meaningful — unlike
        the deterministic-sample single-probe floor of 0.2)."""
        from simple_cdc_service_spark.registry import REGISTRY

        bf = {
            (r.query_id, r.neighbor_id)
            for r in REGISTRY["knn_bruteforce"].fn(spark, SF_DIR).collect()
        }
        ivf = {
            (r.query_id, r.neighbor_id)
            for r in REGISTRY["knn_ivf_kmeans"].fn(spark, SF_DIR).collect()
        }
        assert len(bf & ivf) / len(bf) >= 0.8

    def test_knn_lsh_ml_recall_floor(self, spark):
        from simple_cdc_service_spark.registry import REGISTRY

        bf = {
            (r.query_id, r.neighbor_id)
            for r in REGISTRY["knn_bruteforce"].fn(spark, SF_DIR).collect()
        }
        lsh = {
            (r.query_id, r.neighbor_id)
            for r in REGISTRY["knn_lsh_ml"].fn(spark, SF_DIR).collect()
        }
        # NB: bruteforce ranks by COSINE, the LSH path by EUCLIDEAN — on
        # unnormalized vectors the two top-k sets legitimately differ, so
        # the floor only guards against structural breakage (empty join,
        # bucket mismatch), not metric agreement.
        assert len(bf & lsh) / len(bf) >= 0.2

    def test_knn_pq_rerank_recall_bar(self, spark):
        """PQ ADC shortlist + exact rerank must clear a real recall bar.
        Uniform random vectors are PQ's worst case (no cluster structure:
        pure ADC tops out ~0.34 here); the rerank stage recovers to ~0.88
        at shortlist=100. Bar at 0.7 so codebook/LUT regressions show."""
        from simple_cdc_service_spark.registry import REGISTRY

        bf = {
            (r.query_id, r.neighbor_id)
            for r in REGISTRY["knn_bruteforce"].fn(spark, SF_DIR).collect()
        }
        pq = {
            (r.query_id, r.neighbor_id)
            for r in REGISTRY["knn_pq"].fn(spark, SF_DIR).collect()
        }
        assert len(bf & pq) / len(bf) >= 0.7

    def test_knn_ivfpq_recall_floor(self, spark):
        """IVF+PQ composition: recall is bounded by the IVF probe (uniform
        random vectors, IVF's worst case — nprobe=8 of 16 lists caps
        recall near the probed fraction) times the PQ shortlist. Measured
        0.5 at this sf, deterministic; floor at 0.45 so a probe-mask or
        codebook regression shows."""
        from simple_cdc_service_spark.registry import REGISTRY

        bf = {
            (r.query_id, r.neighbor_id)
            for r in REGISTRY["knn_bruteforce"].fn(spark, SF_DIR).collect()
        }
        ap = {
            (r.query_id, r.neighbor_id)
            for r in REGISTRY["knn_ivfpq"].fn(spark, SF_DIR).collect()
        }
        assert len(bf & ap) / len(bf) >= 0.45

    def test_knn_ivfpq_deterministic(self, spark):
        from simple_cdc_service_spark.registry import REGISTRY

        a = [tuple(r) for r in REGISTRY["knn_ivfpq"].fn(spark, SF_DIR).collect()]
        b = [tuple(r) for r in REGISTRY["knn_ivfpq"].fn(spark, SF_DIR).collect()]
        assert sorted(a) == sorted(b)

    def test_knn_pq_deterministic(self, spark):
        from simple_cdc_service_spark.registry import REGISTRY

        a = [tuple(r) for r in REGISTRY["knn_pq"].fn(spark, SF_DIR).collect()]
        b = [tuple(r) for r in REGISTRY["knn_pq"].fn(spark, SF_DIR).collect()]
        assert sorted(a) == sorted(b)

    def test_pandas_knn_agrees_with_expression_knn(self, spark):
        from simple_cdc_service_spark.registry import REGISTRY

        a = {
            (r.query_id, r.neighbor_id, r.nn_rank)
            for r in REGISTRY["knn_bruteforce"].fn(spark, SF_DIR).collect()
        }
        b = {
            (r.query_id, r.neighbor_id, r.nn_rank)
            for r in REGISTRY["knn_bruteforce_pandas"].fn(spark, SF_DIR).collect()
        }
        assert a == b

    def test_approx_percentiles_near_exact(self, spark):
        """The rank-window booleans the oracle asserts as literals must
        hold per group, and p50_exact must agree with the exact query."""
        from simple_cdc_service_spark.registry import REGISTRY

        exact = {r.event_type: r.p50
                 for r in REGISTRY["percentiles_value"].fn(spark, SF_DIR).collect()}
        for r in REGISTRY["approx_percentiles"].fn(spark, SF_DIR).collect():
            assert r.ok50 and r.ok99, r.event_type
            assert r.p50_exact == exact[r.event_type]

    def test_embedding_kmeans_covers_corpus_deterministically(self, spark):
        """Cluster summary: every vector lands in exactly one cluster
        (sizes sum to the corpus), clusters are within k, assignment is
        genuinely better than noise (mean cosine to own centroid > 0 on
        L2-normalized-ish data), and a re-run under the same seed is
        identical."""
        from simple_cdc_service_spark.registry import REGISTRY
        from simple_cdc_service_spark.sources.tables import load_table

        fn = REGISTRY["embedding_kmeans"].fn
        rows = fn(spark, SF_DIR).collect()
        n_corpus = load_table(spark, "embeddings", SF_DIR).count()
        assert sum(r.n_vecs for r in rows) == n_corpus
        assert 0 < len(rows) <= 8
        assert all(r.avg_cos_to_centroid > 0 for r in rows)
        again = fn(spark, SF_DIR).collect()
        assert [tuple(r) for r in rows] == [tuple(r) for r in again]

    def test_stratified_sample_bounds_and_determinism(self, spark):
        from simple_cdc_service_spark.registry import REGISTRY

        fn = REGISTRY["sample_stratified"].fn
        a = {r.event_type: r.n_sampled for r in fn(spark, SF_DIR).collect()}
        b = {r.event_type: r.n_sampled for r in fn(spark, SF_DIR).collect()}
        assert a == b  # fixed seed => deterministic
        assert "signup" not in a  # fraction 0.0
        totals = {
            r.event_type: r.n
            for r in REGISTRY["skew_salted_agg"].fn(spark, SF_DIR).collect()
        }
        assert a["error"] == totals["error"]  # fraction 1.0 keeps all
        assert 0 < a["click"] < totals["click"]


class TestSketchHeavyHitters:
    def test_cms_estimates_bound_exact_counts(self, spark):
        """Count-min never underestimates; with eps=0.1% the overestimate
        on this corpus must stay within eps * total_tokens."""
        ex = {r.token: r.freq for r in REGISTRY["heavy_hitters"].fn(spark, SF_DIR).collect()}
        sk = {
            r.token: r.est_freq
            for r in REGISTRY["heavy_hitters_sketch"].fn(spark, SF_DIR).collect()
        }
        assert set(sk) == set(ex) and len(ex) > 0
        total = sum(ex.values())
        for t, freq in ex.items():
            assert sk[t] >= freq
            assert sk[t] <= freq + max(2, 0.001 * total)
