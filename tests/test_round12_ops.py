"""Round-12 pins (optimization round 2): persisted-index lifecycle is
per-session (VERDICT r11 #5), the table-handle memo degrades safely on
large/nested directories (VERDICT r11 #7 + ADVICE r11), and the SQL
fast paths survive hostile column names (ADVICE r11)."""

import os

import pytest


@pytest.fixture(scope="module")
def spark():
    from simple_cdc_service_spark.session import get_spark

    return get_spark("test-round12")


class TestSessionIndexDirLifecycle:
    """VERDICT r11 #5: a built ANN index must never be reachable from a
    previous process — the index home is a fresh mkdtemp per (session,
    corpus fingerprint), memoized only in process memory."""

    def test_same_session_same_key_is_stable(self, spark):
        from simple_cdc_service_spark.registry import _session_index_dir

        d1 = _session_index_dir(spark, "k1")
        d2 = _session_index_dir(spark, "k1")
        assert d1 == d2 and os.path.isdir(d1)

    def test_distinct_keys_get_distinct_dirs(self, spark):
        from simple_cdc_service_spark.registry import _session_index_dir

        assert _session_index_dir(spark, "ka") != _session_index_dir(spark, "kb")

    def test_fresh_process_state_gets_fresh_dir(self, spark):
        """Clearing the in-memory memo (= what a new process starts with)
        must yield a NEW empty directory even for an identical key: no
        on-disk path derivable from the key alone, so a previous
        process's build can never be picked up."""
        from simple_cdc_service_spark.registry import (
            _SESSION_INDEX_DIRS,
            _session_index_dir,
        )

        d1 = _session_index_dir(spark, "kproc")
        # leave a marker a stale-reuse bug would see
        with open(os.path.join(d1, "meta.json"), "w") as f:
            f.write("{}")
        saved = dict(_SESSION_INDEX_DIRS)
        try:
            _SESSION_INDEX_DIRS.clear()
            d2 = _session_index_dir(spark, "kproc")
            assert d2 != d1
            assert not os.path.exists(os.path.join(d2, "meta.json"))
        finally:
            _SESSION_INDEX_DIRS.clear()
            _SESSION_INDEX_DIRS.update(saved)

    def test_no_fingerprint_keyed_tmp_path_in_registry(self):
        """The old cross-process pattern (/tmp path keyed on the testdata
        fingerprint) must not come back in queries()-reachable code."""
        import simple_cdc_service_spark.registry as regmod

        src = open(regmod.__file__).read()
        assert "spark_graft_imi_index" not in src


class TestTableMemoDegradation:
    """VERDICT r11 #7 / ADVICE r11: the table-handle memo must SKIP
    caching (never serve a stale handle) for layouts its one-level
    fingerprint cannot see through."""

    def test_large_directory_skips_cache(self, tmp_path):
        from simple_cdc_service_spark.sources.tables import _path_fingerprint

        d = tmp_path / "many"
        d.mkdir()
        for i in range(300):
            (d / f"part-{i:05d}.parquet").write_bytes(b"x")
        assert _path_fingerprint(str(d)) is None

    def test_nested_directory_skips_cache(self, tmp_path):
        """A partitioned layout (subdirectories) can be rewritten below
        the first level without changing first-level mtimes — the memo
        must not cache it at all."""
        from simple_cdc_service_spark.sources.tables import _path_fingerprint

        d = tmp_path / "nested"
        (d / "dt=2024").mkdir(parents=True)
        (d / "dt=2024" / "part-0.parquet").write_bytes(b"x")
        assert _path_fingerprint(str(d)) is None

    def test_flat_small_directory_fingerprints(self, tmp_path):
        from simple_cdc_service_spark.sources.tables import _path_fingerprint

        d = tmp_path / "flat"
        d.mkdir()
        (d / "part-0.parquet").write_bytes(b"x")
        fp1 = _path_fingerprint(str(d))
        assert fp1 is not None
        (d / "part-0.parquet").write_bytes(b"xy")  # rewrite → new fingerprint
        assert _path_fingerprint(str(d)) != fp1

    def test_single_file_fingerprints(self, tmp_path):
        from simple_cdc_service_spark.sources.tables import _path_fingerprint

        f = tmp_path / "t.parquet"
        f.write_bytes(b"x")
        assert _path_fingerprint(str(f)) is not None


class TestHostileColumnNames:
    """ADVICE r11: the expr-string fast paths interpolate column names
    into SQL text — hostile names must either be handled identically to
    the Column path or routed around it, never mis-resolve silently."""

    def _banded(self, spark, id_name, band_name="band", bv_name="bv"):
        import pandas as pd

        rows = [(i, 0, "bucket-a" if i < 4 else "bucket-b") for i in range(8)]
        return spark.createDataFrame(
            pd.DataFrame(rows, columns=[id_name, band_name, bv_name])
        )

    @staticmethod
    def _expected_pairs():
        # two 4-member buckets -> C(4,2) pairs each, ids sorted
        out = []
        for base in (0, 4):
            ids = list(range(base, base + 4))
            out += [(a, b) for i, a in enumerate(ids) for b in ids[i + 1 :]]
        return sorted(out)

    def test_bucket_pairs_plain_names(self, spark):
        from simple_cdc_service_spark.operators.dedup import bucket_pairs

        got = sorted(
            map(tuple, bucket_pairs(self._banded(spark, "doc_id")).collect())
        )
        assert got == self._expected_pairs()

    def test_bucket_pairs_dotted_id_column(self, spark):
        """A dotted name previously either failed to parse or resolved as
        a field access inside collect_list — must now route through the
        normalized path and return the same pairs."""
        from simple_cdc_service_spark.operators.dedup import bucket_pairs

        got = sorted(
            map(
                tuple,
                bucket_pairs(
                    self._banded(spark, "doc.id"), id_col="doc.id"
                ).collect(),
            )
        )
        assert got == self._expected_pairs()

    def test_bucket_pairs_spacey_bv_column(self, spark):
        from simple_cdc_service_spark.operators.dedup import bucket_pairs

        got = sorted(
            map(
                tuple,
                bucket_pairs(
                    self._banded(spark, "doc_id", bv_name="b v"), bv_col="b v"
                ).collect(),
            )
        )
        assert got == self._expected_pairs()

    def test_bucket_pairs_keyword_id_column(self, spark):
        """`order` passes isidentifier() but is a SQL keyword — the
        backtick-quoted interpolation must still parse."""
        from simple_cdc_service_spark.operators.dedup import bucket_pairs

        got = sorted(
            map(
                tuple,
                bucket_pairs(
                    self._banded(spark, "order"), id_col="order"
                ).collect(),
            )
        )
        assert got == self._expected_pairs()

    def test_shingle_docs_text_col_named_i(self, spark):
        """ADVICE r11: with the old lambda var `i`, text_col='i' silently
        shingled the lambda INDEX instead of the text. Must now equal the
        reference Column implementation."""
        import pandas as pd

        from simple_cdc_service_spark.functions import word_ngrams, words
        from pyspark.sql import functions as F

        from simple_cdc_service_spark.operators.dedup import shingle_docs

        df = spark.createDataFrame(
            pd.DataFrame(
                {"doc_id": [1, 2], "i": ["a b c d", "w x y z"]}
            )
        )
        got = {
            r["doc_id"]: sorted(r["shingles"])
            for r in shingle_docs(df, n=3, text_col="i").collect()
        }
        want = {
            r["doc_id"]: sorted(r["shingles"])
            for r in df.select(
                "doc_id", word_ngrams(words(F.col("i")), 3).alias("shingles")
            ).collect()
        }
        assert got == want
        assert got[1] == ["a b c", "b c d"]

    def test_shingle_docs_keyword_text_col(self, spark):
        import pandas as pd

        from simple_cdc_service_spark.operators.dedup import shingle_docs

        df = spark.createDataFrame(
            pd.DataFrame({"doc_id": [1], "order": ["p q r s"]})
        )
        got = shingle_docs(df, n=3, text_col="order").collect()
        assert sorted(got[0]["shingles"]) == ["p q r", "q r s"]

    def test_minhash_pipeline_keyword_id_col(self, spark):
        """End-to-end: the SQL-twin pipeline gate passes `order` (an
        identifier) — the quoted SQL must parse and match the Column
        reference path."""
        import pandas as pd

        from pyspark.sql import functions as F

        from simple_cdc_service_spark.operators.dedup import (
            jaccard_distinct,
            minhash_candidates,
            minhash_dedup_pairs,
            shingle_docs,
        )

        rows = []
        for i in range(60):
            txt = "dup dup cluster common words here now" if i % 5 == 0 else (
                f"unique text number {i} with filler tokens {i * 7}"
            )
            rows.append((i, txt))
        df = spark.createDataFrame(pd.DataFrame(rows, columns=["order", "text"]))
        got = sorted(
            map(
                tuple,
                minhash_dedup_pairs(
                    df, n=3, threshold=0.5, id_col="order", factorize=False
                ).collect(),
            )
        )
        sh = shingle_docs(df, n=3, id_col="order")
        cand = minhash_candidates(sh, 8, 4, "order", "md5")
        a = sh.select(F.col("order").alias("doc_id_a"), F.col("shingles").alias("__sh_a"))
        b = sh.select(F.col("order").alias("doc_id_b"), F.col("shingles").alias("__sh_b"))
        want = sorted(
            map(
                tuple,
                a.join(cand, "doc_id_a")
                .join(b, "doc_id_b")
                .select(
                    "doc_id_a",
                    "doc_id_b",
                    F.round(
                        jaccard_distinct(F.col("__sh_a"), F.col("__sh_b")), 4
                    ).alias("jaccard"),
                )
                .filter(F.col("jaccard") >= 0.5)
                .collect(),
            )
        )
        assert got == want and len(got) > 0


class TestSqlEntryTwins:
    """r12: six headline entries are now built as one-statement SQL
    (guide §7.3 — one Catalyst analysis instead of an eager analysis per
    Dataset op). Each must stay bit-identical to the historical Column
    construction, rebuilt here verbatim as the reference."""

    SF = "/root/testdata/sf0.001"

    def _rows(self, df):
        return sorted(map(tuple, df.collect()))

    def test_knn_bruteforce_twin(self, spark):
        from pyspark.sql import functions as F

        from simple_cdc_service_spark.operators.similarity import knn_bruteforce
        from simple_cdc_service_spark.registry import REGISTRY
        from simple_cdc_service_spark.sources.tables import load_table

        emb = load_table(spark, "embeddings", self.SF)
        want = knn_bruteforce(
            emb.filter(F.col("vec_id") >= 5), emb.filter(F.col("vec_id") < 5), k=10
        ).select(
            "query_id", "neighbor_id",
            F.col("rank").cast("long").alias("nn_rank"), "cos_sim",
        )
        got = REGISTRY["knn_bruteforce"].fn(spark, self.SF)
        assert got.columns == want.columns
        assert [f.dataType for f in got.schema] == [f.dataType for f in want.schema]
        assert self._rows(got) == self._rows(want)

    def test_funnel_conversion_twin(self, spark):
        from pyspark.sql import functions as F

        from simple_cdc_service_spark.registry import REGISTRY
        from simple_cdc_service_spark.sources.tables import load_table

        e = load_table(spark, "events", self.SF).select(
            "user_id", F.unix_millis("ts").alias("ts_ms"), "event_id", "event_type"
        )
        nul = F.lit(None).cast("long")

        def merge(acc, ev):
            def take(slot, typ, prev):
                cond = (ev.event_type == typ) & prev.isNotNull() & (ev.ts_ms > prev)
                return F.coalesce(slot, F.when(cond, ev.ts_ms))

            return F.struct(
                F.coalesce(acc.s1, F.when(ev.event_type == "signup", ev.ts_ms)).alias("s1"),
                take(acc.s2, "view", acc.s1).alias("s2"),
                take(acc.s3, "click", acc.s2).alias("s3"),
                take(acc.s4, "purchase", acc.s3).alias("s4"),
            )

        per_user = (
            e.groupBy("user_id")
            .agg(F.array_sort(F.collect_list(F.struct("ts_ms", "event_id", "event_type"))).alias("seq"))
            .select(
                F.aggregate(
                    "seq",
                    F.struct(nul.alias("s1"), nul.alias("s2"), nul.alias("s3"), nul.alias("s4")),
                    merge,
                ).alias("f")
            )
        )
        want = per_user.agg(
            F.count("f.s1").alias("n_signup"),
            F.count("f.s2").alias("n_view"),
            F.count("f.s3").alias("n_click"),
            F.count("f.s4").alias("n_purchase"),
            F.round(F.count("f.s4") / F.nullif(F.count("f.s1").cast("double"), F.lit(0.0)), 4).alias("conversion"),
        )
        got = REGISTRY["funnel_conversion"].fn(spark, self.SF)
        assert got.columns == want.columns
        assert [f.dataType for f in got.schema] == [f.dataType for f in want.schema]
        assert self._rows(got) == self._rows(want)

    def test_q8_market_share_twin(self, spark):
        from pyspark.sql import functions as F

        from simple_cdc_service_spark.registry import REGISTRY
        from simple_cdc_service_spark.sources.tables import load_table

        t = lambda n: load_table(spark, n, self.SF)  # noqa: E731
        p = t("part").filter(F.col("p_type") == "PROMO").select("p_partkey")
        l = t("lineitem")
        s = t("supplier")
        o = t("orders").filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
        )
        c = t("customer")
        n = t("nation")
        r = t("region").filter(F.col("r_name") == "ASIA")
        n1 = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
            F.col("n_nationkey").alias("cust_nkey")
        )
        n2 = n.select(F.col("n_nationkey").alias("supp_nkey"), F.col("n_name").alias("supp_nation"))
        vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
        share = F.sum(
            F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(0.0).cast("decimal(18,4)")
        ).cast("double") / F.sum(F.col("volume").cast("decimal(18,4)")).cast("double")
        want = (
            l.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
            .join(p, F.col("p_partkey") == F.col("l_partkey"))
            .join(c, F.col("c_custkey") == F.col("o_custkey"))
            .join(F.broadcast(n1), F.col("cust_nkey") == F.col("c_nationkey"))
            .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
            .join(F.broadcast(n2), F.col("supp_nkey") == F.col("s_nationkey"))
            .select(F.year("o_orderdate").cast("long").alias("o_year"), vol.alias("volume"), "supp_nation")
            .groupBy("o_year")
            .agg(F.round(share, 4).alias("mkt_share"))
        )
        got = REGISTRY["q8_market_share"].fn(spark, self.SF)
        assert got.columns == want.columns
        assert [f.dataType for f in got.schema] == [f.dataType for f in want.schema]
        assert self._rows(got) == self._rows(want)

    def test_tfidf_top_terms_twin(self, spark):
        from pyspark.sql import functions as F
        from pyspark.sql.window import Window

        from simple_cdc_service_spark.registry import REGISTRY
        from simple_cdc_service_spark.sources.tables import load_table

        d = load_table(spark, "documents", self.SF)
        tok = d.select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("word"))
        tf = tok.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
        df = tok.groupBy("word").agg(F.countDistinct("doc_id").alias("df"))
        n_docs = d.agg(F.count("*").alias("__n_docs"))
        scored = (
            tf.join(F.broadcast(df), "word")
            .crossJoin(F.broadcast(n_docs))
            .select(
                "doc_id", "word",
                F.round(F.col("tf") * (F.log((F.col("__n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0), 4).alias("tfidf"),
            )
        )
        w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("word"))
        want = (
            scored.withColumn("term_rank", F.row_number().over(w).cast("long"))
            .filter(F.col("term_rank") <= 3)
            .select("doc_id", "word", "tfidf", "term_rank")
        )
        got = REGISTRY["tfidf_top_terms"].fn(spark, self.SF)
        assert got.columns == want.columns
        assert [f.dataType for f in got.schema] == [f.dataType for f in want.schema]
        assert self._rows(got) == self._rows(want)

    def test_unigram_logprob_twin(self, spark):
        from pyspark.sql import functions as F

        from simple_cdc_service_spark.functions import words
        from simple_cdc_service_spark.registry import REGISTRY
        from simple_cdc_service_spark.sources.tables import load_table

        d = load_table(spark, "documents", self.SF)
        toks = d.select("doc_id", F.explode(words(F.col("text"))).alias("tok"))
        vocab = toks.groupBy("tok").agg(F.count("*").alias("c")).localCheckpoint(eager=True)
        total = vocab.agg(F.sum("c").alias("total"))
        want = (
            toks.join(vocab, "tok")
            .crossJoin(F.broadcast(total))
            .groupBy("doc_id")
            .agg(
                F.count("*").cast("long").alias("n_tokens"),
                F.round(F.avg(-F.log(F.col("c") / F.col("total"))), 4).alias("avg_neg_logp"),
            )
        )
        got = REGISTRY["unigram_logprob"].fn(spark, self.SF)
        assert got.columns == want.columns
        assert [f.dataType for f in got.schema] == [f.dataType for f in want.schema]
        assert self._rows(got) == self._rows(want)

    def test_bigram_logprob_twin(self, spark):
        from pyspark.sql import functions as F

        from simple_cdc_service_spark.functions import words
        from simple_cdc_service_spark.registry import REGISTRY
        from simple_cdc_service_spark.sources.tables import load_table, spread

        d = load_table(spark, "documents", self.SF)
        ws = words(F.col("text"))
        d0 = spread(d.select("doc_id", ws.alias("ws"))).localCheckpoint(eager=True)
        pair = F.transform(
            F.sequence(F.lit(0), F.size("ws") - 2),
            lambda i: F.struct(
                F.element_at(F.col("ws"), (i + 1).cast("int")).alias("prev"),
                F.element_at(F.col("ws"), (i + 2).cast("int")).alias("cur"),
            ),
        )
        doc_pairs = (
            d0.filter(F.size("ws") >= 2)
            .select("doc_id", F.explode(pair).alias("b"))
            .groupBy("doc_id", F.col("b.prev").alias("prev"), F.col("b.cur").alias("cur"))
            .agg(F.count("*").alias("k"))
        )
        uni = d0.select(F.explode("ws").alias("tok")).groupBy("tok").agg(F.count("*").alias("c1"))
        bi = doc_pairs.groupBy("prev", "cur").agg(F.sum("k").alias("c2"))
        want = (
            doc_pairs.join(bi, ["prev", "cur"])
            .join(uni, doc_pairs["prev"] == uni["tok"])
            .groupBy("doc_id")
            .agg(
                F.sum("k").cast("long").alias("n_bigrams"),
                F.round(F.sum(F.col("k") * -F.log(F.col("c2") / F.col("c1"))) / F.sum("k"), 4).alias("avg_neg_logp"),
            )
        )
        got = REGISTRY["bigram_logprob"].fn(spark, self.SF)
        assert got.columns == want.columns
        assert [f.dataType for f in got.schema] == [f.dataType for f in want.schema]
        assert self._rows(got) == self._rows(want)


class TestSqlEntryTwinsBatch2:
    """r12 batch 2: cdc_snapshot / cdc_scd2 / q1 / q3 / q5 / q10 as
    one-statement SQL — bit-identical to the operator/Column reference
    (operators/cdc.py stays the Column implementation, so the cdc twins
    compare directly against it)."""

    SF = "/root/testdata/sf0.001"

    def _rows(self, df):
        return sorted(map(tuple, df.collect()))

    def _check(self, got, want):
        assert got.columns == want.columns
        assert [f.dataType for f in got.schema] == [f.dataType for f in want.schema]
        assert self._rows(got) == self._rows(want)

    def test_cdc_snapshot_twin(self, spark):
        from simple_cdc_service_spark.config import USER_VALUE
        from simple_cdc_service_spark.operators import cdc
        from simple_cdc_service_spark.registry import REGISTRY, _changelog

        want = cdc.collapse_changelog(_changelog(spark, self.SF), USER_VALUE)
        self._check(REGISTRY["cdc_snapshot"].fn(spark, self.SF), want)

    def test_cdc_scd2_twin(self, spark):
        from simple_cdc_service_spark.operators.cdc import scd2_history
        from simple_cdc_service_spark.registry import REGISTRY, _changelog

        want = scd2_history(
            _changelog(spark, self.SF),
            key_cols=("user_id",),
            value_cols=("last_value",),
            order_col="ev_offset",
            ts_col="ts_ms",
        )
        self._check(REGISTRY["cdc_scd2"].fn(spark, self.SF), want)

    def test_q1_twin(self, spark):
        from pyspark.sql import functions as F

        from simple_cdc_service_spark.registry import REGISTRY, _dsum
        from simple_cdc_service_spark.sources.tables import load_table, spread

        li = load_table(spark, "lineitem", self.SF)
        disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
        want = (
            spread(
                li.filter(
                    F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz")
                ).select(
                    "l_returnflag", "l_linestatus", "l_quantity",
                    "l_extendedprice", "l_discount", "l_tax",
                )
            )
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                _dsum(F.col("l_extendedprice"), 2).alias("sum_base_price"),
                _dsum(disc_price, 4).alias("sum_disc_price"),
                _dsum(disc_price * (1 + F.col("l_tax")), 6).alias("sum_charge"),
                F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
                F.round(
                    F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double")
                    / F.count(F.lit(1)), 2,
                ).alias("avg_price"),
                F.round(
                    F.sum(F.col("l_discount").cast("decimal(18,2)")).cast("double")
                    / F.count(F.lit(1)), 2,
                ).alias("avg_disc"),
                F.count("*").alias("count_order"),
            )
        )
        self._check(REGISTRY["q1_pricing_summary"].fn(spark, self.SF), want)

    def test_q3_twin(self, spark):
        from pyspark.sql import functions as F

        from simple_cdc_service_spark.registry import REGISTRY, _dsum
        from simple_cdc_service_spark.sources.tables import load_table

        c = load_table(spark, "customer", self.SF).filter(F.col("c_mktsegment") == "BUILDING")
        o = load_table(spark, "orders", self.SF).filter(
            F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")
        )
        l = load_table(spark, "lineitem", self.SF).filter(
            F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")
        )
        want = (
            c.join(o, F.col("c_custkey") == F.col("o_custkey"))
            .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("l_orderkey", "o_orderdate")
            .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
            .select(
                "l_orderkey", "revenue",
                F.date_format(F.col("o_orderdate"), "yyyy-MM-dd").alias("o_orderdate_str"),
            )
            .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
            .limit(10)
        )
        self._check(REGISTRY["q3_shipping_priority"].fn(spark, self.SF), want)

    def test_q5_twin(self, spark):
        from pyspark.sql import functions as F

        from simple_cdc_service_spark.registry import REGISTRY, _dsum
        from simple_cdc_service_spark.sources.tables import load_table

        r = load_table(spark, "region", self.SF).filter(F.col("r_name") == "ASIA")
        n = load_table(spark, "nation", self.SF)
        c = load_table(spark, "customer", self.SF)
        o = load_table(spark, "orders", self.SF).filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        )
        l = load_table(spark, "lineitem", self.SF)
        s = load_table(spark, "supplier", self.SF)
        want = (
            c.join(F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)),
                   F.col("c_nationkey") == F.col("n_nationkey"))
            .join(o, F.col("o_custkey") == F.col("c_custkey"))
            .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
            .join(
                s,
                (F.col("s_suppkey") == F.col("l_suppkey"))
                & (F.col("s_nationkey") == F.col("c_nationkey")),
            )
            .groupBy("n_name")
            .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
        )
        self._check(REGISTRY["q5_region_revenue"].fn(spark, self.SF), want)

    def test_q10_twin(self, spark):
        from pyspark.sql import functions as F

        from simple_cdc_service_spark.registry import REGISTRY, _dsum
        from simple_cdc_service_spark.sources.tables import load_table

        c = load_table(spark, "customer", self.SF)
        o = load_table(spark, "orders", self.SF).filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit("1996-07-01 00:00:00").cast("timestamp_ntz"))
        )
        l = load_table(spark, "lineitem", self.SF).filter(F.col("l_returnflag") == "R")
        n = load_table(spark, "nation", self.SF)
        want = (
            l.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
            .join(c, F.col("c_custkey") == F.col("o_custkey"))
            .join(F.broadcast(n), F.col("n_nationkey") == F.col("c_nationkey"))
            .groupBy("c_custkey", "c_name", "n_name")
            .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
            .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
            .limit(20)
        )
        self._check(REGISTRY["q10_returned_items"].fn(spark, self.SF), want)
