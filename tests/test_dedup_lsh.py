"""LSH-bucket blocking as the production dedup path (no metadata-column
dependence): recall against exact all-pairs on a SKEWED corpus where every
document shares one metadata block (the case that breaks metadata
blocking — its quadratic term becomes the whole corpus), and planted-
duplicate recovery for the random-hyperplane embedding blocker."""

import pytest
from pyspark.sql import functions as F

from simple_cdc_service_spark.operators.dedup import (
    embedding_dup_pairs_lsh,
    ngram_jaccard_pairs,
)


def _skewed_docs(spark):
    """60 docs, ALL in one metadata block; 10 near-dup pairs planted by
    light word-level edits, the rest pairwise-dissimilar."""
    base = [
        f"the quick brown fox {i} jumps over the lazy dog near river {i} "
        f"while unique token{i} and marker{i} watch silently" for i in range(50)
    ]
    rows = [(i, "same_source", t) for i, t in enumerate(base)]
    # planted near-dups of docs 0..9: one word appended => jaccard >= 0.9
    for i in range(10):
        rows.append((100 + i, "same_source", base[i] + " tail"))
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


class TestNgramLSHBlocking:
    def test_matches_exact_on_single_block_corpus(self, spark):
        df = _skewed_docs(spark)
        # exact: metadata blocking degenerates to all-pairs here (single
        # block) — fine at 60 docs, the ground truth the LSH path must hit
        exact = {
            (r.doc_id_a, r.doc_id_b)
            for r in ngram_jaccard_pairs(df, threshold=0.9, block_col="source").collect()
        }
        assert exact, "planted near-dups must exist"
        lsh = {
            (r.doc_id_a, r.doc_id_b)
            for r in ngram_jaccard_pairs(df, threshold=0.9, block_col=None).collect()
        }
        # banding at (4 bands × 2 rows) catches jaccard≥0.9 pairs with
        # P ≈ 1-(1-0.9²)⁴ ≈ 0.9987 each; demand full recall on this corpus
        assert lsh == exact

    def test_no_metadata_column_needed(self, spark):
        df = _skewed_docs(spark).drop("source")
        pairs = ngram_jaccard_pairs(df, threshold=0.9, block_col=None)
        assert pairs.count() == 10


class TestEmbeddingLSHBlocking:
    def test_planted_duplicates_recovered(self, spark):
        import random

        rng = random.Random(7)
        dim = 16
        rows = [(i, [rng.gauss(0, 1) for _ in range(dim)]) for i in range(200)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        planted = df.filter(F.col("vec_id") < 20).select(
            (F.col("vec_id") + 1000).alias("vec_id"), "embedding"
        )
        pairs = embedding_dup_pairs_lsh(df.unionByName(planted), threshold=0.98)
        got = {(r.vec_id_a, r.vec_id_b) for r in pairs.collect()}
        # exact copies agree with every hyperplane sign -> always bucketed
        # together in every table: recall is 1.0 by construction
        assert {(i, i + 1000) for i in range(20)} <= got
        # precision: the filter guarantees every returned pair ≥ threshold
        assert all(r.cos_sim >= 0.98 for r in pairs.collect())

    def test_empty_corpus_returns_empty_pairs(self, spark):
        """An empty corpus must yield an empty pair frame, not a crash on
        the dimension probe; an explicit dim skips the probe entirely."""
        df = spark.createDataFrame([], "vec_id long, embedding array<double>")
        assert embedding_dup_pairs_lsh(df).count() == 0
        assert embedding_dup_pairs_lsh(df, dim=16).count() == 0

    def test_candidates_bounded_not_all_pairs(self, spark):
        """Random (dissimilar) vectors must produce near-zero candidate
        pairs — the blocker's job is to keep the quadratic term at the
        near-dup clusters only."""
        import random

        from simple_cdc_service_spark.operators.dedup import bucket_pairs  # noqa: F401

        rng = random.Random(11)
        rows = [(i, [rng.gauss(0, 1) for _ in range(16)]) for i in range(300)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        # inspect the candidate stage by running with threshold 0 high
        # bands: count of verified pairs at threshold=-1 == candidate count
        cand_pairs = embedding_dup_pairs_lsh(df, threshold=-1.0)
        n = cand_pairs.count()
        # all-pairs would be 300*299/2 = 44850; buckets must prune hard
        assert n < 4000, f"candidate explosion: {n}"


class TestIncrementalDedup:
    def test_flags_only_incoming_vs_corpus_collisions(self, spark):
        """Asymmetry contract: incoming docs matching a corpus doc are
        flagged (doc_id=incoming, dup_of=corpus); corpus-INTERNAL
        duplicates are not re-reported, and unique incoming docs pass."""
        from simple_cdc_service_spark.operators.dedup import (
            incremental_dedup_pairs,
        )

        mk = lambda i, extra: (  # noqa: E731
            i,
            f"the quick brown fox {extra} jumps over the lazy dog near "
            f"river bend {extra} while birds watch the water flow",
        )
        corpus_rows = [
            mk(1, "one"), mk(2, "two"), mk(3, "three"),
            # 4 and 5: corpus-internal near-identical pair
            (4, "shared corpus text about distributed systems and storage engines alpha"),
            (5, "shared corpus text about distributed systems and storage engines beta"),
        ]
        incoming_rows = [
            # 100: near-copy of corpus doc 3 (one word appended)
            (100, corpus_rows[2][1] + " tail"),
            # 101: unique
            (101, "completely different content on medieval falconry and its traditions today"),
        ]
        schema = "doc_id long, text string"
        corpus = spark.createDataFrame(corpus_rows, schema)
        incoming = spark.createDataFrame(incoming_rows, schema)
        got = incremental_dedup_pairs(corpus, incoming, threshold=0.5).collect()
        flagged = {(r.doc_id, r.dup_of) for r in got}
        assert (100, 3) in flagged
        assert all(r.doc_id in (100, 101) for r in got), "only incoming ids flagged"
        assert all(r.doc_id != 101 for r in got), "unique incoming doc must pass"
        assert (4, 5) not in flagged and (5, 4) not in flagged


class TestMinhashXxhashFamily:
    """xxhash64 MinHash family: same pipeline, cheaper signatures. Exact
    duplicates have identical shingle sets, hence identical signatures
    under ANY hash family — every planted exact-dup pair must surface in
    BOTH families' verified outputs, and the verified pair sets over a
    planted-dup corpus must agree exactly."""

    def _docs_with_exact_dups(self, spark):
        base = [
            f"document {i} charts the migration of cranes across the delta "
            f"with unique token{i} and landmark{i} recorded at dawn"
            for i in range(30)
        ]
        rows = [(i, t) for i, t in enumerate(base)]
        rows += [(200 + i, base[i]) for i in range(8)]  # exact dups of 0..7
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_pair_set_equality_on_planted_duplicates(self, spark):
        from simple_cdc_service_spark.operators.dedup import minhash_dedup_pairs

        docs = self._docs_with_exact_dups(spark)
        expected = {(i, 200 + i) for i in range(8)}
        got = {}
        for family in ("md5", "xxhash64"):
            pairs = minhash_dedup_pairs(
                docs, n=3, k=8, bands=4, threshold=0.99, family=family
            )
            got[family] = {(r.doc_id_a, r.doc_id_b) for r in pairs.collect()}
        assert got["md5"] == expected, got["md5"]
        assert got["xxhash64"] == expected, got["xxhash64"]

    def test_registry_entry_runs(self, spark):
        import __spark_entry__ as E

        df = E.queries()["dedup_minhash_fast"](spark, "/root/testdata/sf0.001")
        assert df.columns == ["doc_id_a", "doc_id_b", "jaccard"]
        assert df.count() >= 0


class TestSemanticDedup:
    """SemDeDup-style cluster-blocked embedding dedup: planted exact
    copies must all be recovered (identical vectors share a cluster),
    and the pair generation must stay cluster-bounded (no all-pairs)."""

    def test_planted_duplicates_recovered(self, spark):
        import __spark_entry__ as E

        df = E.queries()["dedup_semantic"](spark, "/root/testdata/sf0.001")
        got = {(r.vec_id_a, r.vec_id_b) for r in df.collect()}
        planted = {(i, 1_000_000 + i) for i in range(50)}
        assert planted <= got, planted - got

    def test_candidates_bounded_not_all_pairs(self, spark):
        from simple_cdc_service_spark.operators.dedup import semantic_dup_pairs

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        n = emb.count()
        # count pre-threshold candidate pairs by running with threshold=-1
        cand = semantic_dup_pairs(emb, threshold=-1.0, n_clusters=16).count()
        assert cand < n * (n - 1) / 2 * 0.5, (
            f"{cand} candidate pairs vs {n*(n-1)//2} all-pairs — clustering "
            "is not bounding the quadratic term"
        )

    def test_deterministic(self, spark):
        from simple_cdc_service_spark.operators.dedup import semantic_dup_pairs

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        a = sorted(map(tuple, semantic_dup_pairs(emb, 0.5).collect()))
        b = sorted(map(tuple, semantic_dup_pairs(emb, 0.5).collect()))
        assert a == b
