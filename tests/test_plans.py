"""Physical-plan assertions: the scale properties each operator was
designed around must actually appear in the plan Catalyst produces.
A change that keeps results correct but regresses the plan fails here."""

import pytest
from pyspark.sql import functions as F

from simple_cdc_service_spark.plans import (
    assert_in_plan,
    assert_not_in_plan,
    plan_string,
    scan_read_schema,
)
from simple_cdc_service_spark.registry import REGISTRY

SF = "/root/testdata/sf0.001"


def q(spark, name):
    return REGISTRY[name].fn(spark, SF)


class TestPushdownAndPruning:
    def test_filter_eq_pushes_both_predicates(self, spark):
        plan = plan_string(q(spark, "filter_eq"))
        assert "PushedFilters:" in plan
        assert "EqualTo(l_returnflag,R)" in plan
        assert "EqualTo(l_linenumber,1)" in plan

    def test_filter_eq_prunes_columns(self, spark):
        schemas = scan_read_schema(q(spark, "filter_eq"), "lineitem")
        assert len(schemas) == 1
        # 5 columns: 3 projected + 2 filter columns; the other 6 pruned
        assert schemas[0].count(":") == 5

    def test_media_catalog_reads_only_doc_id(self, spark):
        # payload/meta are synthesized; only doc_id should be scanned —
        # the "metadata queries never touch blobs" property.
        schemas = scan_read_schema(q(spark, "media_catalog"), "documents")
        assert schemas == ["struct<doc_id:bigint>"]

    def test_q1_date_filter_pushed(self, spark):
        plan = plan_string(q(spark, "q1_pricing_summary"))
        assert "PushedFilters:" in plan and "LessThanOrEqual(l_shipdate" in plan


class TestAggregation:
    def test_q1_partial_aggregation(self, spark):
        # partial_ marks map-side combine: the shuffle carries |groups|
        # rows per task, not |lineitem| rows.
        assert_in_plan(q(spark, "q1_pricing_summary"), "partial_sum", "partial_avg")

    def test_cdc_snapshot_no_sort(self, spark):
        # collapse is max_by hash agg — a Sort in this plan would mean the
        # window formulation snuck back in.
        plan = plan_string(q(spark, "cdc_snapshot"))
        assert "max_by" in plan
        assert "Sort " not in plan

    def test_count_star_never_scans_columns(self, spark):
        schemas = scan_read_schema(q(spark, "count_star"), "lineitem")
        assert schemas == ["struct<>"]


class TestJoins:
    def test_q5_broadcasts_small_dims(self, spark):
        assert_in_plan(q(spark, "q5_region_revenue"), "BroadcastHashJoin")

    def test_knn_broadcasts_queries(self, spark):
        assert_in_plan(q(spark, "knn_bruteforce"), "BroadcastNestedLoopJoin")

    def test_anti_semi_are_hash_joins(self, spark):
        for name in ("join_anti", "join_semi"):
            plan = plan_string(q(spark, name))
            assert "LeftAnti" in plan or "LeftSemi" in plan
            assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


class TestRound2Plans:
    def test_q8_pushes_filters_and_broadcasts_dims(self, spark):
        plan = plan_string(q(spark, "q8_market_share"))
        assert "EqualTo(p_type,PROMO)" in plan  # part pruned pre-join
        assert "GreaterThanOrEqual(o_orderdate" in plan  # date range pushed
        assert "BroadcastHashJoin" in plan  # nation/region never shuffled

    def test_q19_cnf_pushes_single_side_implications(self, spark):
        # The OR spans both tables, but Catalyst must still extract the
        # per-side implications: part gets the brand-set filter, lineitem
        # the quantity bounds — both BEFORE the join.
        plan = plan_string(q(spark, "q19_disjunctive_filters"))
        assert "PushedFilters:" in plan
        assert plan.count("Or(") >= 2  # disjunction reached both scans

    def test_dq_checks_is_single_plan_no_driver_scalar(self, spark):
        # The FK-orphan count must be part of the one aggregate, not a
        # separate .count() embedded as a literal.
        plan = plan_string(q(spark, "dq_checks"))
        assert "LeftOuter" in plan
        assert "partial_sum" in plan

    def test_q10_topk_is_take_ordered(self, spark):
        assert_in_plan(q(spark, "q10_returned_items"), "TakeOrderedAndProject")

    def test_minhash_verify_has_no_split_in_join_condition(self, spark):
        # The verify join must consume STAGED shingle arrays; a split()
        # inside the join condition means the ngram pipeline was re-inlined
        # (the interpreted-eval O(words^2) pathology).
        plan = plan_string(q(spark, "dedup_minhash"))
        for line in plan.splitlines():
            if "Join condition" in line:
                assert "split(" not in line

    def test_grouped_zscore_is_window_not_pandas(self, spark):
        plan = plan_string(q(spark, "grouped_zscore"))
        assert "Window" in plan
        assert "FlatMapGroupsInPandas" not in plan


class TestTopK:
    def test_topk_is_take_ordered_not_full_sort(self, spark):
        # TakeOrderedAndProject = per-partition heap + driver merge of k
        # rows; a global Exchange+Sort here would be the 100 TB mistake.
        assert_in_plan(q(spark, "topk_orders"), "TakeOrderedAndProject")
        assert_not_in_plan(q(spark, "topk_orders"), "rangepartitioning")


class TestCodegen:
    @pytest.mark.parametrize("name", ["q1_pricing_summary", "text_quality", "scalar_funcs"])
    def test_hot_paths_whole_stage_codegen(self, spark, name):
        # AQE plans only expose codegen stages once finalized — execute,
        # then inspect the formatted plan for "[codegen id : N]" tags.
        df = q(spark, name)
        df.collect()
        assert_in_plan(df, "[codegen id :")


class TestRound2LateAdditions:
    def test_q21_scans_lineitem_once(self, spark):
        # The EXISTS/NOT-EXISTS decorrelation must use window aggregates
        # over ONE derived frame; a groupBy + self-join formulation makes
        # Catalyst compute (and scan) the fact aggregate twice.
        plan = plan_string(q(spark, "q21_waiting_suppliers"))
        assert plan.count("lineitem.parquet") == 1

    def test_contamination_no_hof_in_filter(self, spark):
        # explode_outer keeps InferFiltersFromGenerate from substituting
        # the shingle HOF expression into a pre-shuffle filter (NOTES.md
        # trap #12): no Filter condition may contain the ngram pipeline.
        plan = plan_string(q(spark, "contamination_check"))
        for line in plan.splitlines():
            if line.strip().startswith("Condition"):
                assert "array_distinct" not in line
                assert "transform(" not in line

    def test_q16_exclusion_is_broadcast_anti(self, spark):
        plan = plan_string(q(spark, "q16_supplier_cnt"))
        assert "LeftAnti" in plan and "BroadcastHashJoin" in plan

    def test_q11_single_fact_shuffle(self, spark):
        # The nation totals must re-aggregate from the first aggregate,
        # not re-scan lineitem.
        plan = plan_string(q(spark, "q11_part_value_share"))
        assert plan.count("lineitem.parquet") == 1

    def test_pipeline_maponly_ops_have_no_exchange(self, spark):
        # repetition/mix-sample/PII are map-only curation passes — the
        # ONLY allowed Exchange is the documents loader's round-robin
        # spread (TRAP #31, r9: text pipelines must parallelize past the
        # corpus files' row-group count); any OTHER shuffle means one
        # snuck into a scan-speed op.
        for name in ("repetition_score", "domain_mix_sample", "pii_scrub"):
            plan = plan_string(q(spark, name))
            n_exchanges = plan.count("- Exchange (")
            assert n_exchanges <= 1, f"{name}: {n_exchanges} exchanges"
            if n_exchanges == 1:
                assert "RoundRobinPartitioning" in plan, name


class TestRuntimeFilters:
    def test_bloom_filter_prunes_fact_side(self, spark):
        """Runtime bloom-filter pushdown: a selective dim-side filter
        must produce a might_contain() guard on the fact scan, so at
        100 TB the shuffle carries only rows that can possibly join.
        Spark gates injection on estimated sizes (application side
        > 10 GB by default) — the thresholds here express 'always
        profitable at target scale'; the session defaults keep them
        stock. Pinned so a conf or plan regression that silently drops
        the runtime filter fails loudly."""
        old = {
            k: spark.conf.get(k, None)
            for k in (
                "spark.sql.autoBroadcastJoinThreshold",
                "spark.sql.adaptive.autoBroadcastJoinThreshold",
                "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            )
        }
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
            spark.conf.set(
                "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
                "0",
            )
            li = spark.read.parquet(f"{SF}/lineitem.parquet")
            orders = spark.read.parquet(f"{SF}/orders.parquet").filter(
                F.col("o_orderpriority") == "1-URGENT"
            )
            j = (
                li.join(orders, li.l_orderkey == orders.o_orderkey)
                .groupBy("o_orderpriority")
                .count()
            )
            plan = plan_string(j)
            assert "might_contain" in plan
            assert "bloom_filter_agg" in plan
        finally:
            for k, v in old.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)


class TestRound3Plans:
    def test_quality_outliers_broadcasts_stats(self, spark):
        """Median and MAD are 1-row aggregates joined back by broadcast —
        a shuffled join against a 1-row frame would be the scale mistake."""
        plan = plan_string(q(spark, "quality_outliers"))
        assert "BroadcastNestedLoopJoin" in plan
        assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan

    def test_window_sliding_expands_before_partial_agg(self, spark):
        """Sliding windows must Expand into the 4 window replicas BEFORE a
        partial aggregate: the shuffle then carries per-window partials,
        not raw events."""
        plan = plan_string(q(spark, "window_sliding"))
        assert "Expand" in plan
        assert "partial_count" in plan or "partial_sum" in plan

    def test_rolling_range_single_shuffle(self, spark):
        """RANGE-frame rolling agg: exactly one Exchange (the user_id
        hash partitioning); the frame scan itself is partition-local.
        Formatted plans print each node twice (tree + detail header)."""
        import re

        plan = plan_string(q(spark, "rolling_range_7d"))
        headers = re.findall(r"^\(\d+\) Exchange", plan, flags=re.M)
        assert len(headers) == 1, plan

    def test_kmeans_summary_assignment_is_map_only(self, spark):
        """Nearest-centroid assignment must not shuffle per-vector rows:
        no window/sort before the aggregate, and the only exchange is the
        k-row aggregate's."""
        plan = plan_string(q(spark, "embedding_kmeans"))
        assert "Window" not in plan

    def test_recursive_cte_batched_iteration_count(self, spark):
        """The recursion must advance 8 chain steps per loop iteration
        (UnionLoop count is dynamic, so pin the batching evidence: the
        recursive term joins the 8-wide chunk table — v8 present — and
        the loop node exists). A regression to one-step recursion would
        drop the vN columns and re-pay ~25 scheduling rounds."""
        plan = plan_string(q(spark, "recursive_cte"))
        assert "UnionLoop" in plan
        assert "v8#" in plan, "8-step batched recursive term expected"


class TestAQESkewJoin:
    def test_aqe_splits_skewed_partition(self, spark):
        """AQE skew-join handling: a hot join key whose shuffle partition
        dwarfs the others must be split at runtime (isSkew=true in the
        final adaptive plan). Thresholds are forced tiny so the behavior
        is observable at test scale — at 100 TB the defaults (256 MB)
        express the same policy. This is the no-manual-salting path;
        skew_salted_agg pins the explicit-salting alternative."""
        import pyspark.sql.functions as F

        keys = ("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
                "spark.sql.adaptive.advisoryPartitionSizeInBytes",
                "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
                "spark.sql.autoBroadcastJoinThreshold",
                "spark.sql.adaptive.autoBroadcastJoinThreshold")
        old = {k: spark.conf.get(k, None) for k in keys}
        try:
            spark.conf.set(keys[0], "32KB")
            spark.conf.set(keys[1], "16KB")
            spark.conf.set(keys[2], "2")
            spark.conf.set(keys[3], "-1")  # force a shuffle join
            spark.conf.set(keys[4], "-1")
            # one hot key (0) carrying ~100k rows, 99 cold keys
            left = spark.range(0, 110_000).select(
                F.when(F.col("id") < 100_000, F.lit(0))
                .otherwise(F.col("id") % 100)
                .alias("k"),
                F.col("id").alias("payload"),
            )
            right = spark.range(0, 100).select(F.col("id").alias("k"))
            # the bare join, no downstream agg: an aggregate reusing the
            # join's partitioning makes AQE skip the split (it would cost
            # an extra shuffle); the policy knob for that case is
            # forceOptimizeSkewedJoin, deliberately left default here.
            j = left.join(right, "k")
            j.collect()  # AQE decisions only exist after execution
            final = j._jdf.queryExecution().executedPlan().toString()
            assert "isSkew=true" in final or "skew=" in final, final[:2000]
        finally:
            for k, v in old.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)


class TestRound4Plans:
    def test_cdc_scd2_single_key_shuffle(self, spark):
        """The history derivation costs ONE shuffle on the key (the lead
        window); a second hashpartitioning exchange would mean the epoch
        filter or projection broke the single-pass shape."""
        plan = plan_string(q(spark, "cdc_scd2"))
        assert "lead(" in plan
        assert plan.count("hashpartitioning(user_id") == 1

    def test_cdc_scd2_asof_is_filter_not_recollapse(self, spark):
        """Time travel over the history must be an interval FILTER plus
        broadcast cutoff — never a re-aggregate of the changelog (no
        max_by collapse in this plan, unlike cdc_snapshot_asof)."""
        plan = plan_string(q(spark, "cdc_scd2_asof"))
        assert "max_by" not in plan
        assert "lead(" in plan and "cutoff" in plan.lower()

    def test_unigram_corpus_scanned_twice_total_from_vocab(self, spark):
        """The scoring plan reads documents ONCE (tokens); the vocab enters
        as the materialized checkpoint (scanned twice including the
        build), and the 1-row total re-aggregates the checkpoint, not the
        corpus."""
        plan = plan_string(q(spark, "unigram_logprob"))
        assert plan.count("documents.parquet") == 1
        assert "ExistingRDD" in plan or "Scan ExistingRDD" in plan

    def test_dedup_spans_left_join_probe(self, spark):
        """Unique grams never enter the join build side: the probe is a
        LEFT join against the nd>=2-filtered gram set."""
        plan = plan_string(q(spark, "dedup_spans"))
        assert "LeftOuter" in plan

    def test_dedup_spans_cut_mapside_rebuild(self, spark):
        """The cleaned text is rebuilt by a higher-order filter inside a
        projection (corpus tokens never shuffle): the HOF lambda and
        concat_ws sit ABOVE the covered-set join."""
        plan = plan_string(q(spark, "dedup_spans_cut"))
        assert "lambdafunction" in plan and "concat_ws" in plan
        # tokens are never exploded for the rebuild: every Generate in the
        # plan belongs to span discovery (8-gram transform) or coverage
        # expansion (sequence) — none explodes the raw token array
        gen_args = [
            line for line in plan.splitlines() if "explode" in line and "Arguments" in line
        ]
        assert gen_args, plan
        for line in gen_args:
            assert "transform(" in line or "sequence(" in line, line

    def test_embedding_dim_stats_partial_agg(self, spark):
        """Map-side combine: the shuffle carries n_dims partials per task,
        not n_vectors x n_dims rows."""
        assert_in_plan(
            q(spark, "embedding_dim_stats"), "partial_count", "partial_avg"
        )

    def test_quality_rules_two_shuffles(self, spark):
        """The whole rule stack costs exactly the two hash aggregates of
        the token pipeline — no per-rule re-scan. (Plus the documents
        loader's round-robin spread, r9 TRAP #31 — a third Exchange node
        but not an aggregate re-shuffle.)"""
        plan = plan_string(q(spark, "quality_rules"))
        assert plan.count("documents.parquet") == 1
        # formatted mode prints each node in the tree and again in the
        # detail section; "- Exchange (" matches only tree entries
        n_rr = 1 if "RoundRobinPartitioning" in plan else 0
        assert plan.count("- Exchange (") == 2 + n_rr

    def test_knn_filtered_hash_join_not_cross(self, spark):
        """The filter joins INTO the scoring: a broadcast HASH join on the
        label key, never the BroadcastNestedLoopJoin cross product of the
        unfiltered brute force."""
        plan = plan_string(q(spark, "knn_filtered"))
        assert "BroadcastHashJoin" in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_interval_join_bucketed_is_equi_join(self, spark):
        """The manufactured bucket key turns the keyless range predicate
        into a hash-joinable equi-join — never the quadratic
        BroadcastNestedLoopJoin Spark plans for a bare theta join."""
        plan = plan_string(q(spark, "interval_join_bucketed"))
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
        assert "Join" in plan

    def test_rollup_cascade_single_scan_shrinking_exchanges(self, spark):
        """The cascade reads raw events ONCE (hour level); day and week
        aggregate the previous level's output — one parquet scan, three
        aggregation exchanges."""
        plan = plan_string(q(spark, "rollup_cascade"))
        # tree form only — formatted mode re-lists each node in the detail
        # section, so count the tree marker, not the bare node name
        assert plan.count("- Scan parquet") == 1
        assert plan.count("- Exchange (") == 3


class TestRound4cPlans:
    def test_funnel_is_join_free(self, spark):
        """The one-shuffle fold formulation: no join anywhere (the oracle's
        k-join chain is exactly what this plan must NOT be)."""
        plan = plan_string(q(spark, "funnel_conversion"))
        assert "Join" not in plan
        assert "collect_list" in plan or "aggregate" in plan

    def test_ngram_top_uses_take_ordered(self, spark):
        """Top-k must be TakeOrderedAndProject (O(k) per partition), never
        a full global sort + limit."""
        assert_in_plan(q(spark, "ngram_top"), "TakeOrderedAndProject")

    def test_per_source_cap_rank_pushdown(self, spark):
        """rank <= N over a window must trigger WindowGroupLimit: each
        partition stops ranking after N rows instead of ranking all."""
        assert_in_plan(q(spark, "per_source_cap"), "WindowGroupLimit")

    def test_interval_preagg_no_nested_loop(self, spark):
        """Both the interior and the edge joins are equi-joins on the
        manufactured bucket key — a BroadcastNestedLoopJoin would mean
        the range predicate leaked into join planning."""
        assert_not_in_plan(q(spark, "interval_join_preagg"), "BroadcastNestedLoopJoin")

    def test_keyword_search_semi_join_and_no_window(self, spark):
        plan = plan_string(q(spark, "keyword_search"))
        assert "LeftSemi" in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_event_transitions_window_free(self, spark):
        """Transitions are built by a map-side HOF over the collected
        sequence — the lag()-window formulation would shuffle the corpus
        into a Window operator."""
        assert_not_in_plan(q(spark, "event_transitions"), "Window")

    def test_quality_deciles_window_free(self, spark):
        """Bucketing is broadcast-thresholds + HOF — an ntile() Window
        would single-partition the corpus."""
        plan = plan_string(q(spark, "quality_deciles"))
        assert "Window" not in plan
        assert "BroadcastExchange" in plan or "broadcast" in plan.lower()

    def test_gini_rank_is_segmented_not_global(self, spark):
        """The r4 form ranked all users in ONE unpartitioned row_number
        window (Spark's 'moving all data to a single partition' warning).
        The r5 form has no per-user rank at all: the only Window runs over
        the distinct-activity-level frame PARTITIONED BY the log2 segment,
        and the sole SinglePartition exchange feeds the broadcast 1-row
        totals aggregate (the allowlisted pattern)."""
        df = q(spark, "user_activity_gini")
        plan = plan_string(df, "simple")
        assert "row_number" not in plan
        assert "windowspecdefinition(seg" in plan  # partitioned window
        # every window in the plan is partitioned (no empty partition spec
        # directly followed by the order spec over n/user_id)
        assert "windowspecdefinition(n#" not in plan
        assert "windowspecdefinition(user_id" not in plan
