"""Query registry: every operator from SURVEY.md §2 as a named query with a
Spark implementation and (where SQL-expressible) a DuckDB oracle.

The driver contract (`__spark_entry__.py`) exposes ``queries()`` /
``oracle_sql()`` straight from this registry. Conventions that keep the
engine↔oracle comparison exact:

  * Every computed column is aliased identically on both sides (the driver
    sorts columns by name before hashing).
  * Double aggregates are ``round(..., 2)`` on BOTH sides — sums of doubles
    are order-dependent in the last bits; rounding makes the cross-engine
    comparison deterministic.
  * Timestamps never leave as raw timestamps: they are converted to epoch
    milliseconds (``unix_millis`` / ``epoch_ms``) — the machine runs UTC so
    the conversions agree.
  * Top-k queries always carry a deterministic tie-break on a unique key.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass, field

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .config import USER_VALUE
from .operators import cdc
from .sources.changelog import CHANGELOG_ORACLE_CTE, derive_changelog
from .sources.tables import load_table, spread


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None → driver does a rows-only check
    headline: bool = False  # include in bench.py
    # Optional per-oracle DuckDB-connection setup (register Python UDFs /
    # reference-implementation views the oracle SQL needs). Entries with a
    # setup are hash-checked by tools/check_oracle.py (CORRECTNESS_FULL
    # artifacts) but EXCLUDED from __spark_entry__.oracle_sql() — the
    # driver's gate runs plain SQL on a vanilla connection.
    oracle_setup: "Callable | None" = None


REGISTRY: dict[str, QuerySpec] = {}

# NOTE (r11 optimization round): a prepared-plan memo (returning the
# SAME DataFrame object for repeated invocations over unchanged inputs)
# was tried here and REVERTED: re-collecting one Dataset instance lets
# Spark skip its already-computed shuffle map stages (exchange reuse),
# so the "optimization" silently turned repeat bench runs into
# partial-result caching — exactly the cross-run intermediate reuse the
# bench must not do. Driver-side build cost is attacked structurally
# instead (fewer Dataset ops per pipeline, table-handle metadata memo
# in sources/tables.py — which only caches LISTING+SCHEMA, never an
# executable plan whose shuffles could be reused).


def register(
    name: str,
    oracle: str | None,
    headline: bool = False,
    oracle_setup: "Callable | None" = None,
):
    def deco(fn):
        # a duplicate name would silently shadow the earlier entry (dict
        # assignment) while keeping its position — fail loudly instead
        assert name not in REGISTRY, f"duplicate registry entry: {name}"
        REGISTRY[name] = QuerySpec(name, fn, oracle, headline, oracle_setup)
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, name, sf_dir)


# Per-SESSION home for persisted-index artifacts (VERDICT r11 #5: the
# build/serve split is the declared feature, but a built index must
# never survive-reuse state from a previous process — "intermediates
# persisted across runs keyed on the testdata" is the pattern the rules
# forbid). Keyed on (session identity, corpus fingerprint): within one
# session repeated invocations serve from the index they just built
# (the deployment's steady state, and what the in-session fingerprint
# legitimately memoizes), a source-file rewrite changes the fingerprint
# and forces a rebuild, and a NEW process always starts from an empty
# mkdtemp — no cross-process reuse is reachable from queries().
_SESSION_INDEX_DIRS: dict = {}


def _session_index_dir(spark: SparkSession, key: str) -> str:
    import tempfile

    sid = (id(spark), spark.sparkContext.applicationId)
    k = (sid, key)
    d = _SESSION_INDEX_DIRS.get(k)
    if d is None or not os.path.isdir(d):
        d = tempfile.mkdtemp(prefix="spark_graft_idx_")
        _SESSION_INDEX_DIRS[k] = d
    return d


def _dsum(col: Column, scale: int) -> Column:
    """Cross-engine-exact rounded money sum. The inputs are exact
    multiples of 10^-scale (2dp prices × 2dp rates …), so the per-row
    DECIMAL(18, scale) cast recovers the exact decimal value; DECIMAL
    accumulation is associative — no shuffle-order last-ulp wobble — and
    the half-up round to cents is exact decimal arithmetic on BOTH
    engines. A double sum instead rounds a ±1-ulp-noisy value that sits
    ON the .005 boundary one group in ten (exact-cents group sums end in
    half a cent with p=0.1), which is the cross-engine coin-flip the sf1
    sweep caught in q5 (NOTES r6). Oracle twin:
    CAST(round(sum(CAST(expr AS DECIMAL(18,scale))), 2) AS DOUBLE).
    Spark widens the accumulator to DECIMAL(28, scale) — 10^24 capacity,
    comfortably beyond any 100 TB group sum."""
    return F.round(F.sum(col.cast(f"decimal(18,{scale})")), 2).cast("double")


# ===========================================================================
# CDC queries [REF] — the reference's core computation over a changelog
# deterministically derived from the driver's `events` table
# (sources/changelog.py — mapping mirrored in CHANGELOG_ORACLE_CTE).
# ===========================================================================

_CH = f"WITH ch AS ({CHANGELOG_ORACLE_CTE})"


def _changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    return derive_changelog(_t(spark, sf_dir, "events")).withColumnRenamed(
        "val", "last_value"
    )


@register(
    "cdc_snapshot",
    oracle=f"""
    {_CH},
    live AS (
        SELECT ch.* FROM ch
        CROSS JOIN (SELECT coalesce(max(ev_offset), -1) AS t_off FROM ch WHERE op = 't') ep
        WHERE ch.ev_offset > ep.t_off AND ch.op <> 't'
    ),
    last AS (
        SELECT user_id,
               max_by(op, ev_offset) AS last_op,
               max_by(val, ev_offset) AS last_value
        FROM live GROUP BY user_id
    )
    SELECT user_id, last_value FROM last WHERE last_op <> 'd'
    """,
    headline=True,
)
def cdc_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R11 changelog collapse: replica state from the event stream
    (reference apply loop, main.py:47-93).

    Built as ONE SQL statement (r12, guide §7.3) — the text twin of
    derive_changelog → truncate_epoch_filter → collapse_changelog
    (operators/cdc.py stays the reference implementation for every other
    caller, incl. streaming). Same broadcast 1-row epoch, same primitive
    max_by buffers (partial+final HashAggregate, no sort); bit-identity
    pinned in tests."""
    from .sources.tables import table_view

    return spark.sql(_CDC_SNAPSHOT_SQL.format(v=table_view(spark, "events", sf_dir)))


# SQL text twin of derive_changelog (sources/changelog.py — in lockstep
# with CHANGELOG_ORACLE_CTE) with the entry's val→last_value rename.
_CDC_CH_CTE = """
ch AS (SELECT event_id AS ev_offset, user_id,
              CASE WHEN event_type = 'signup' THEN 'c'
                   WHEN event_type IN ('purchase', 'click') THEN 'u'
                   WHEN event_type = 'view' THEN 'd'
                   WHEN event_type = 'error' AND event_id % 500 = 0 THEN 't'
                   ELSE 'c' END AS op,
              round(value, 2) AS last_value, ts, ts_ms
       FROM {v})
"""

_CDC_SNAPSHOT_SQL = f"""
WITH {_CDC_CH_CTE.strip()},
ep AS (SELECT max(struct(ev_offset)) AS __t_off FROM ch WHERE op = 't'),
live AS (SELECT /*+ BROADCAST(ep) */ ch.user_id, ch.ev_offset, ch.op, ch.last_value
         FROM ch CROSS JOIN ep
         WHERE (ep.__t_off IS NULL OR struct(ch.ev_offset) > ep.__t_off) AND ch.op <> 't'),
last AS (SELECT user_id, max_by(last_value, ev_offset) AS last_value,
                max_by(ascii(op), ev_offset) AS __op_code
         FROM live GROUP BY user_id)
SELECT user_id, last_value FROM last WHERE __op_code <> 100
"""


@register(
    "cdc_event_log",
    oracle=f"""
    {_CH}
    SELECT ts_ms AS timestamp,
           '{{"op":"' || op || '","user_id":' || CAST(user_id AS VARCHAR) || '}}'
               AS kafka_message
    FROM ch
    """,
)
def cdc_event_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R4 append-only raw event log: broker timestamp + message string
    (main.py:42-45; log table clickhouse/init-script/db-table-init.sql:3-9)."""
    ch = derive_changelog(_t(spark, sf_dir, "events"))
    msg = F.concat(
        F.lit('{"op":"'),
        F.col("op"),
        F.lit('","user_id":'),
        F.col("user_id").cast("string"),
        F.lit("}"),
    )
    return cdc.event_log(ch, F.col("ts_ms"), msg)


@register(
    "cdc_op_classify",
    oracle=f"""
    {_CH}
    SELECT CASE op WHEN 'c' THEN 'insert' WHEN 'u' THEN 'update'
                   WHEN 'd' THEN 'delete' WHEN 't' THEN 'truncate' END AS op_class,
           count(*) AS n
    FROM ch GROUP BY 1
    """,
)
def cdc_op_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R5 op classification via before/after null-ness — reconstructs the
    consumer's 4-way branch (main.py:49,54,75,88) and counts each class.

    The changelog's op codes are first materialized into before/after
    structs (as a Debezium envelope would carry), then classified purely by
    null-ness, round-tripping the reference's discriminator logic.
    """
    ch = derive_changelog(_t(spark, sf_dir, "events"))
    row = F.struct(F.col("user_id"), F.col("val"))
    before = F.when(F.col("op").isin("u", "d"), row)
    after = F.when(F.col("op").isin("c", "u"), row)
    return (
        ch.withColumn("op_class", cdc.classify_op(before, after))
        .groupBy("op_class")
        .agg(F.count("*").alias("n"))
    )


@register(
    "cdc_consistency_diff",
    oracle="""
    SELECT CAST(NULL AS BIGINT) AS user_id,
           CAST(NULL AS DOUBLE) AS last_value,
           CAST(NULL AS VARCHAR) AS side
    WHERE false
    """,
)
def cdc_consistency_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R16 consistency check (tests/test_consistency.py:56-75 rebuilt as
    symmetric exceptAll): two independent snapshot implementations
    (max_by-aggregate vs window row_number) must agree exactly → empty."""
    ch = _changelog(spark, sf_dir)
    a = cdc.collapse_changelog(ch, USER_VALUE)
    b = cdc.collapse_changelog_window(ch, USER_VALUE)
    return cdc.consistency_diff(a, b)


# ===========================================================================
# Relational queries [REF R13-R17] + TPC-H-style exercises of the join/agg
# machinery (these are the scale-sensitive plans the bench tracks).
# ===========================================================================


@register("count_star", oracle="SELECT count(*) AS row_cnt FROM lineitem")
def count_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R13 COUNT(*) (tests/test_consistency.py:40-41)."""
    return _t(spark, sf_dir, "lineitem").agg(F.count("*").alias("row_cnt"))


@register(
    "project_sort",
    oracle="SELECT c_custkey, c_name FROM customer ORDER BY c_custkey",
)
def project_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R14+R15 projection + total sort (tests/test_consistency.py:58-59)."""
    return (
        _t(spark, sf_dir, "customer")
        .select("c_custkey", "c_name")
        .orderBy(F.col("c_custkey").asc())
    )


@register(
    "filter_eq",
    oracle="""
    SELECT l_orderkey, l_quantity, l_extendedprice
    FROM lineitem WHERE l_returnflag = 'R' AND l_linenumber = 1
    """,
)
def filter_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R17 equality + conjunctive predicates (main.py:77-83; sequencer.py:13).
    Both predicates push down to the parquet scan (verify: PushedFilters)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .filter((F.col("l_returnflag") == "R") & (F.col("l_linenumber") == 1))
        .select("l_orderkey", "l_quantity", "l_extendedprice")
    )


@register(
    "topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    """,
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sort-with-limit (top-k). Spark plans this as TakeOrderedAndProject —
    per-partition heap + driver merge of k rows, never a full sort."""
    return (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
    )


@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                      AS sum_qty,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_base_price,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_disc_price,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_charge,
           round(avg(l_quantity), 2)                                      AS avg_qty,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 2) AS avg_price,
           round(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*), 2)      AS avg_disc,
           count(*)                                                       AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    headline=True,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: the canonical partial-aggregation
    benchmark (map-side combine over 6 running sums; one shuffle of ~|groups|
    rows — the plan that must survive 100 TB unchanged).

    Date columns are TIMESTAMP_NTZ (parquet micros, not UTC-adjusted);
    comparisons use NTZ literals so no session-timezone cast sneaks in.

    Money sums/avgs accumulate in DECIMAL (the _dsum pattern, q11 / NOTES
    r6): per-row values are exact multiples of 10^-{2,4,6}, so the cast
    recovers the exact decimal, decimal addition is associative across
    shuffle orders, and the round-to-cents cannot sit on a noisy .005
    boundary — the class of flake the sf1 sweep caught in q5. Quantity
    is integral (doubles sum exactly); only the count divides the avg."""
    # Project to the 6 needed columns, then spread() (r11 optimization
    # round): the bench file is a single parquet row group, so the scan —
    # and with it the whole DECIMAL-heavy partial aggregation — runs in
    # ONE task (TRAP #31). spread() repartitions to the core count only
    # when the input has fewer row groups than cores (no-op on any real
    # multi-file deployment); the exchange carries the six pruned columns
    # once and buys 32-way partial aggregation. Interleaved A/B at sf0.1:
    # 1.236 → 0.986 s. Values are reorder-safe: money sums accumulate in
    # DECIMAL (associative), quantity is integral (exact in double),
    # counts are exact — the hash cannot move.
    #
    # r12 (guide §7.3): the filter+projection and the aggregate are each
    # ONE SQL statement around the spread() call (the repartition is a
    # materialization decision, so a single statement is impossible);
    # the ~35 py4j Column calls of the DECIMAL agg chain collapse into
    # one analysis. Bit-identity pinned in tests.
    from .operators.dedup import _run_pipeline_sql
    from .sources.tables import table_view

    v = table_view(spark, "lineitem", sf_dir)
    pre = spark.sql(
        f"SELECT l_returnflag, l_linestatus, l_quantity, l_extendedprice, l_discount, l_tax "
        f"FROM {v} WHERE l_shipdate <= TIMESTAMP_NTZ '1998-09-02 00:00:00'"
    )
    return _run_pipeline_sql(spread(pre), _Q1_AGG_SQL)


_Q1_AGG_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       cast(round(sum(cast(l_extendedprice AS decimal(18,2))), 2) AS double) AS sum_base_price,
       cast(round(sum(cast(l_extendedprice * (1 - l_discount) AS decimal(18,4))), 2) AS double) AS sum_disc_price,
       cast(round(sum(cast(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS decimal(18,6))), 2) AS double) AS sum_charge,
       round(avg(l_quantity), 2) AS avg_qty,
       round(cast(sum(cast(l_extendedprice AS decimal(18,2))) AS double) / count(1), 2) AS avg_price,
       round(cast(sum(cast(l_discount AS decimal(18,2))) AS double) / count(1), 2) AS avg_disc,
       count(*) AS count_order
FROM {v}
GROUP BY l_returnflag, l_linestatus
"""


@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate_str
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
    headline=True,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: selective dim filter → two joins → agg → top-k.
    At scale: filters reach the scans, the orders⋈lineitem join shuffles on
    orderkey, and AQE converts the filtered-customer side to broadcast when
    small enough. Tie-break on orderkey keeps top-10 deterministic.
    ONE SQL statement (r12, guide §7.3; bit-identity pinned in tests);
    date_format on NTZ formats the wall-clock value — tz-free."""
    from .sources.tables import table_view

    names = {t: table_view(spark, t, sf_dir) for t in ("customer", "orders", "lineitem")}
    return spark.sql(_Q3_SQL.format(**names))


_Q3_SQL = """
SELECT l_orderkey, revenue, date_format(o_orderdate, 'yyyy-MM-dd') AS o_orderdate_str
FROM (
  SELECT l.l_orderkey, o.o_orderdate,
         cast(round(sum(cast(l.l_extendedprice * (1 - l.l_discount) AS decimal(18,4))), 2) AS double) AS revenue
  FROM (SELECT * FROM {customer} WHERE c_mktsegment = 'BUILDING') c
  JOIN (SELECT * FROM {orders} WHERE o_orderdate < TIMESTAMP_NTZ '1998-01-01 00:00:00') o
    ON c.c_custkey = o.o_custkey
  JOIN (SELECT * FROM {lineitem} WHERE l_shipdate > TIMESTAMP_NTZ '1998-01-01 00:00:00') l
    ON l.l_orderkey = o.o_orderkey
  GROUP BY l.l_orderkey, o.o_orderdate)
ORDER BY revenue DESC, l_orderkey LIMIT 10
"""


@register(
    "q5_region_revenue",
    oracle="""
    SELECT n.n_name,
           CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
    FROM region r
    JOIN nation n   ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name
    """,
    headline=True,
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style: 6-table join. region/nation are broadcast explicitly
    (5 / 25 rows at any SF — never shuffle a fact table to join them);
    the big joins shuffle on their keys and AQE picks strategies for the
    mid-size dims. ONE SQL statement (r12, guide §7.3; bit-identity
    pinned in tests) — same join order, same broadcast hints."""
    from .sources.tables import table_view

    names = {
        t: table_view(spark, t, sf_dir)
        for t in ("region", "nation", "customer", "orders", "lineitem", "supplier")
    }
    return spark.sql(_Q5_SQL.format(**names))


_Q5_SQL = """
WITH nr AS (SELECT /*+ BROADCAST(r) */ n.n_nationkey, n.n_name
            FROM {nation} n
            JOIN (SELECT * FROM {region} WHERE r_name = 'ASIA') r
              ON n.n_regionkey = r.r_regionkey)
SELECT /*+ BROADCAST(nr) */ n_name,
       cast(round(sum(cast(l.l_extendedprice * (1 - l.l_discount) AS decimal(18,4))), 2) AS double) AS revenue
FROM {customer} c
JOIN nr ON c.c_nationkey = nr.n_nationkey
JOIN (SELECT * FROM {orders}
      WHERE o_orderdate >= TIMESTAMP_NTZ '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP_NTZ '1997-01-01 00:00:00') o
  ON o.o_custkey = c.c_custkey
JOIN {lineitem} l ON l.l_orderkey = o.o_orderkey
JOIN {supplier} s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
GROUP BY n_name
"""


# ===========================================================================
# Event-time windows [EXT E8] + window functions over the events stream.
# ===========================================================================


@register(
    "window_tumbling",
    oracle="""
    SELECT (epoch_ms(ts) // 3600000) * 3600000 AS win_start,
           event_type,
           count(*) AS n,
           CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2
    """,
    headline=True,
)
def window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E8 tumbling event-time window aggregation (batch form; the streaming
    form with watermark lives in streaming/pipeline.py).

    Uses F.window over the reconstructed timestamp — Spark's tumbling
    windows align to the epoch, so window.start equals the epoch-ms bucket
    the oracle computes with integer arithmetic; unix_millis on an
    epoch-constructed timestamp is timezone-free."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), _dsum(F.col("value"), 2).alias("sum_value"))
        .select(
            F.unix_millis(F.col("w.start")).alias("win_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@register(
    "window_sliding",
    oracle="""
    SELECT CAST((epoch_ms(ts) // 900000 - k) * 900000 AS BIGINT) AS win_start,
           event_type,
           count(*) AS n,
           CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_value
    FROM events CROSS JOIN (SELECT unnest(range(0, 4)) AS k)
    GROUP BY 1, 2
    """,
)
def window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E8 sliding (hopping) event-time window: 1-hour windows every 15
    minutes, so each event lands in duration/slide = 4 overlapping
    windows (the streaming form is the same F.window with a watermark).

    Spark expands the 4 window replicas BEFORE the shuffle (Expand node),
    so the aggregate still gets map-side partials — the shuffle carries
    4× partial rows, not 4× events; the oracle reproduces exactly that
    replication with an explicit k ∈ [0,4) cross join on the epoch-ms
    bucket arithmetic (every one of the 4 slide-aligned starts at or
    before ts is within 1 hour of it, so no filter is needed)."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), _dsum(F.col("value"), 2).alias("sum_value"))
        .select(
            F.unix_millis(F.col("w.start")).alias("win_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@register(
    "rolling_range_7d",
    oracle="""
    WITH e AS (SELECT event_id, user_id, epoch_ms(ts) AS ts_ms,
                      CAST(round(value * 100) AS BIGINT) AS cents
               FROM events)
    SELECT event_id, user_id, ts_ms,
           CAST(sum(cents) OVER w AS BIGINT) AS roll_sum_cents,
           CAST(count(*) OVER w AS BIGINT) AS roll_n
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms
                 RANGE BETWEEN 604800000 PRECEDING AND CURRENT ROW)
    """,
)
def rolling_range_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame rolling aggregate: per-user 7-day trailing sum/count,
    frame bounded by the event-time VALUE (ms), not row offsets — the
    shape ROWS frames can't express when events are irregularly spaced.

    The summed quantity is integer cents: a RANGE frame is a SET of rows,
    so float accumulation order inside it is engine-dependent — integer
    sums are order-free and hash-identical by construction. One shuffle
    on user_id; the frame scan is the standard two-pointer sliding sum
    within each ordered partition."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_ms")
        .rangeBetween(-604_800_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts_ms",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    ).select(
        "event_id",
        "user_id",
        "ts_ms",
        F.sum("cents").over(w).alias("roll_sum_cents"),
        F.count(F.lit(1)).over(w).alias("roll_n"),
    )


@register(
    "running_total",
    oracle="""
    SELECT event_id, user_id,
           round(sum(value) OVER (
               PARTITION BY user_id ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_value
    FROM events
    """,
)
def running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window function: per-user cumulative sum, frame-ordered by the unique
    event_id so the float accumulation order is identical in both engines."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        _t(spark, sf_dir, "events")
        .select(
            "event_id",
            "user_id",
            F.round(F.sum("value").over(w), 2).alias("running_value"),
        )
    )


@register(
    "sessionize",
    oracle="""
    WITH o AS (
        SELECT event_id, user_id, epoch_ms(ts) AS ts_ms, value,
               CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL
                         OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > 1800000
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)
    ),
    s AS (
        -- CAST: DuckDB windowed sum over ints yields HUGEINT; Spark yields
        -- BIGINT — keep the cross-engine schema identical.
        SELECT *, CAST(sum(new_sess) OVER (
            PARTITION BY user_id ORDER BY ts_ms, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        FROM o
    )
    SELECT user_id, session_id,
           count(*) AS n_events,
           CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_value,
           min(ts_ms) AS session_start,
           max(ts_ms) AS session_end
    FROM s GROUP BY user_id, session_id
    """,
)
def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E8 session windows (batch form): 30-min-gap sessionization via
    lag + cumulative flag — one shuffle on user_id, per-key sort, no
    cross-key state. All time math on epoch-ms longs so both engines see
    identical values. (Streaming form: session_window in streaming/.)"""
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    cum = (
        Window.partitionBy("user_id")
        .orderBy("ts_ms", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ev = _t(spark, sf_dir, "events")
    new_sess = F.when(
        F.lag("ts_ms").over(w).isNull()
        | (F.col("ts_ms") - F.lag("ts_ms").over(w) > 1_800_000),
        F.lit(1),
    ).otherwise(F.lit(0))
    return (
        ev.withColumn("new_sess", new_sess)
        .withColumn("session_id", F.sum("new_sess").over(cum))
        .groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            _dsum(F.col("value"), 2).alias("sum_value"),
            F.min("ts_ms").alias("session_start"),
            F.max("ts_ms").alias("session_end"),
        )
    )


# ===========================================================================
# Text analysis [EXT E6] over `documents`.
# ===========================================================================

_STOP_SQL = "('the','a','of','and','to','in','is','on','for')"


@register(
    "text_tokens",
    oracle=r"""
    SELECT doc_id,
           len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
           length(text) AS n_chars_actual
    FROM documents
    """,
)
def text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting — whitespace tokenizer (BPE-ish regex variant covered
    by the n-gram shingles in dedup). Map-only over the scan."""
    from .operators import text as T

    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        T.token_count(F.col("text")).alias("n_tokens"),
        F.length("text").alias("n_chars_actual"),
    )


@register(
    "text_quality",
    oracle=f"""
    WITH w AS (SELECT doc_id, text, string_split(lower(text), ' ') AS ws FROM documents)
    SELECT doc_id,
           length(text) AS n_chars,
           len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
           round((length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g'))) * 1.0
                 / nullif(length(text), 0), 4) AS punct_ratio,
           round(len(list_filter(ws, w -> w IN {_STOP_SQL})) * 1.0
                 / nullif(len(ws), 0), 4) AS stopword_ratio,
           round((length(text) - len(ws) + 1) * 1.0 / nullif(len(ws), 0), 4)
               AS mean_word_len
    FROM w
    """,
    headline=True,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length / punctuation / stopword signals (the cheap
    pre-filters of an LLM data pipeline). Pure codegen'd expressions."""
    from .operators import text as T

    d = _t(spark, sf_dir, "documents")
    cols = T.quality_columns(F.col("text"))
    return d.select("doc_id", *[c.alias(n) for n, c in cols.items()])


@register(
    "lang_id",
    oracle="""
    WITH w AS (SELECT doc_id, lang, string_split(lower(text), ' ') AS ws FROM documents),
    s AS (
        SELECT doc_id, lang,
            len(list_filter(ws, x -> x IN ('the','and','of','to','in','is')))      AS s_en,
            len(list_filter(ws, x -> x IN ('der','die','und','das','ist','nicht'))) AS s_de,
            len(list_filter(ws, x -> x IN ('el','la','los','de','que','y')))       AS s_es,
            len(list_filter(ws, x -> x IN ('le','la','les','et','est','des')))     AS s_fr,
            len(list_filter(ws, x -> x IN ('de','le','shi','bu','wo','ni')))       AS s_zh
        FROM w
    )
    SELECT doc_id, lang AS labeled_lang,
           CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
                WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
                WHEN s_es >= s_en AND s_es >= s_de AND s_es >= s_fr AND s_es >= s_zh THEN 'es'
                WHEN s_fr >= s_en AND s_fr >= s_de AND s_fr >= s_es AND s_fr >= s_zh THEN 'fr'
                ELSE 'zh' END AS predicted_lang
    FROM s
    """,
)
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language ID with deterministic argmax precedence
    (en>de>es>fr>zh on ties)."""
    from .operators import text as T

    d = spread(_t(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        T.predict_lang(F.col("text")).alias("predicted_lang"),
    )


@register(
    "doc_fingerprint",
    oracle="SELECT doc_id, md5(lower(text)) AS fp FROM documents",
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint (md5 of normalized text) — identical hex in
    every engine; the key for cheap exact near-canonical dedup."""
    from .operators import text as T

    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", T.fingerprint(F.col("text")).alias("fp"))


# ===========================================================================
# Deduplication [EXT E1/E3] over `documents` / `embeddings`.
# ===========================================================================


@register(
    "dedup_exact",
    oracle="""
    SELECT text, min(doc_id) AS doc_id, count(*) AS n_dups
    FROM documents GROUP BY text
    """,
)
def dedup_exact_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1 exact dedup: hash groupBy with deterministic representative
    (min id) — one shuffle, map-side partial agg; never a sort."""
    from .operators.dedup import dedup_exact

    return dedup_exact(_t(spark, sf_dir, "documents"))


@register(
    "dedup_minhash",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
    sh AS (SELECT doc_id,
                  list_distinct(CASE WHEN len(ws) >= 3
                       THEN list_transform(range(1, len(ws) - 1),
                                           i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
                       ELSE [] END) AS shingles
           FROM w),
    hx AS (SELECT doc_id, shingles,
                  list_transform(shingles, s -> md5('0|' || s)) AS h0,
                  list_transform(shingles, s -> md5('1|' || s)) AS h1
           FROM sh),
    mh AS (SELECT doc_id,
                  [list_min(list_transform(h0, x -> substr(x, 1, 8))),
                   list_min(list_transform(h0, x -> substr(x, 9, 8))),
                   list_min(list_transform(h0, x -> substr(x, 17, 8))),
                   list_min(list_transform(h0, x -> substr(x, 25, 8))),
                   list_min(list_transform(h1, x -> substr(x, 1, 8))),
                   list_min(list_transform(h1, x -> substr(x, 9, 8))),
                   list_min(list_transform(h1, x -> substr(x, 17, 8))),
                   list_min(list_transform(h1, x -> substr(x, 25, 8)))] AS sig
           FROM hx),
    banded AS (SELECT doc_id, bnd.band,
                      CASE WHEN sig[1] IS NULL THEN NULL
                           ELSE sig[CAST(bnd.band*2+1 AS INT)] || '|'
                                || sig[CAST(bnd.band*2+2 AS INT)] END AS bv
               FROM mh, (SELECT unnest(range(0, 4)) AS band) bnd),
    cand AS (SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
             FROM banded a JOIN banded b
               ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id)
    SELECT doc_id_a, doc_id_b,
           round(len(list_intersect(sa.shingles, sb.shingles)) * 1.0
                 / len(list_distinct(list_concat(sa.shingles, sb.shingles))), 4) AS jaccard
    FROM cand
    JOIN sh sa ON sa.doc_id = cand.doc_id_a
    JOIN sh sb ON sb.doc_id = cand.doc_id_b
    """,
    headline=True,
)
def dedup_minhash_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3 MinHash-LSH near-dup: 3-gram shingles → 8 md5-hash minima → 4
    bands of 2 → band-bucket self-join for candidates → true-Jaccard verify.
    MinHash minima are taken over hex STRINGS (byte order ≡ in every
    engine), avoiding any integer-conversion divergence."""
    from .operators.dedup import minhash_dedup_pairs

    return minhash_dedup_pairs(_t(spark, sf_dir, "documents"), n=3, k=8, bands=4)


def _xx64_setup(con) -> None:
    """Register the XXH64 reference (JVM-parity pinned in tests) as a
    DuckDB UDF so the xxhash64 hash family becomes oracle-replicable.
    Prefers the Arrow-vectorized numpy batch kernel
    (functions/xxh64_np.py — the sf1 sweeps hash millions of shingles/
    ids, and the per-call scalar UDF was the sweep's dominant cost);
    falls back to the per-call pure-Python scalar on DuckDBs without
    Arrow UDF support."""
    from .functions.xxh64_np import register_xx64_arrow

    if register_xx64_arrow(con):
        return
    from .functions.xxh64_py import spark_xxhash64_int_str

    try:
        con.create_function(
            "xx64", spark_xxhash64_int_str, ["INTEGER", "VARCHAR"], "BIGINT"
        )
    except Exception:  # noqa: BLE001 — already registered on this con
        pass


@register(
    "dedup_minhash_fast",
    # Mirrors the dedup_minhash md5 oracle with BIGINT xx64(i, s) minima —
    # xx64 is the pure-Python XXH64 UDF registered by _xx64_setup
    # (driver's vanilla gate still treats this entry as rows-only).
    oracle="""
    WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
    sh AS (SELECT doc_id,
                  list_distinct(CASE WHEN len(ws) >= 3
                       THEN list_transform(range(1, len(ws) - 1),
                                           i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
                       ELSE [] END) AS shingles
           FROM w),
    u AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
    -- hash DISTINCT shingles once, then join: xx64 is a pure function
    -- of s, so this is identical to hashing per occurrence — but the
    -- scalar-Python UDF runs 236k times instead of 39M at 10x bench
    -- scale (shared vocabulary: 29k distinct shingles across 4.9M
    -- occurrences), which cut this oracle from ~280s to seconds
    ds AS (SELECT DISTINCT s FROM u),
    hx AS (SELECT s, [xx64(0, s), xx64(1, s), xx64(2, s), xx64(3, s),
                      xx64(4, s), xx64(5, s), xx64(6, s), xx64(7, s)] AS hs
           FROM ds),
    mh AS (SELECT doc_id,
                  [min(hs[1]), min(hs[2]), min(hs[3]), min(hs[4]),
                   min(hs[5]), min(hs[6]), min(hs[7]), min(hs[8])] AS sig
           FROM u JOIN hx USING (s) GROUP BY doc_id),
    banded AS (SELECT doc_id, bnd.band,
                      CASE WHEN sig[1] IS NULL THEN NULL
                           ELSE sig[CAST(bnd.band*2+1 AS INT)] || '|'
                                || sig[CAST(bnd.band*2+2 AS INT)] END AS bv
               FROM mh, (SELECT unnest(range(0, 4)) AS band) bnd),
    cand AS (SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
             FROM banded a JOIN banded b
               ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id)
    SELECT doc_id_a, doc_id_b,
           round(len(list_intersect(sa.shingles, sb.shingles)) * 1.0
                 / len(list_distinct(list_concat(sa.shingles, sb.shingles))), 4) AS jaccard
    FROM cand
    JOIN sh sa ON sa.doc_id = cand.doc_id_a
    JOIN sh sb ON sb.doc_id = cand.doc_id_b
    """,
    headline=True,
    oracle_setup=_xx64_setup,
)
def dedup_minhash_fast_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3 MinHash-LSH near-dup, xxhash64 family — the production-bench
    variant of dedup_minhash. Identical pipeline shape (3-gram shingles →
    8 hash minima → 4 bands of 2 → bucket candidates → true-Jaccard
    verify) but signatures cost one JVM xxhash64 per (function,
    shingle) instead of md5 hex + substring minima — md5 is ~half of
    dedup_minhash's wall time and the whole signature cost at corpus
    scale (NOTES). Hash-checked since r5 via a pure-Python XXH64 DuckDB
    UDF with pinned JVM parity (functions/xxh64_py.py) — the driver's
    vanilla-SQL gate still sees it rows-only; the md5-family pair-set
    equivalence pin on planted exact duplicates stays as a second
    independent check."""
    from .operators.dedup import minhash_dedup_pairs

    return minhash_dedup_pairs(
        _t(spark, sf_dir, "documents"), n=3, k=8, bands=4, family="xxhash64"
    )


@register(
    "dedup_incremental",
    # Same md5-minhash banding as dedup_minhash, but candidates join the
    # INCOMING slice (doc_id % 5 = 0) against the CORPUS slice (others).
    oracle="""
    WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
    sh AS (SELECT doc_id,
                  list_distinct(CASE WHEN len(ws) >= 3
                       THEN list_transform(range(1, len(ws) - 1),
                                           i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
                       ELSE [] END) AS shingles
           FROM w),
    hx AS (SELECT doc_id, shingles,
                  list_transform(shingles, s -> md5('0|' || s)) AS h0,
                  list_transform(shingles, s -> md5('1|' || s)) AS h1
           FROM sh),
    mh AS (SELECT doc_id,
                  [list_min(list_transform(h0, x -> substr(x, 1, 8))),
                   list_min(list_transform(h0, x -> substr(x, 9, 8))),
                   list_min(list_transform(h0, x -> substr(x, 17, 8))),
                   list_min(list_transform(h0, x -> substr(x, 25, 8))),
                   list_min(list_transform(h1, x -> substr(x, 1, 8))),
                   list_min(list_transform(h1, x -> substr(x, 9, 8))),
                   list_min(list_transform(h1, x -> substr(x, 17, 8))),
                   list_min(list_transform(h1, x -> substr(x, 25, 8)))] AS sig
           FROM hx),
    banded AS (SELECT doc_id, bnd.band,
                      CASE WHEN sig[1] IS NULL THEN NULL
                           ELSE sig[CAST(bnd.band*2+1 AS INT)] || '|'
                                || sig[CAST(bnd.band*2+2 AS INT)] END AS bv
               FROM mh, (SELECT unnest(range(0, 4)) AS band) bnd),
    cand AS (SELECT DISTINCT i.doc_id AS doc_id, c.doc_id AS dup_of
             FROM banded i JOIN banded c
               ON i.band = c.band AND i.bv = c.bv
              AND i.doc_id % 5 = 0 AND c.doc_id % 5 <> 0)
    SELECT cand.doc_id, cand.dup_of,
           round(len(list_intersect(sa.shingles, sb.shingles)) * 1.0
                 / len(list_distinct(list_concat(sa.shingles, sb.shingles))), 4) AS jaccard
    FROM cand
    JOIN sh sa ON sa.doc_id = cand.doc_id
    JOIN sh sb ON sb.doc_id = cand.dup_of
    WHERE round(len(list_intersect(sa.shingles, sb.shingles)) * 1.0
                / len(list_distinct(list_concat(sa.shingles, sb.shingles))), 4) >= 0.6
    """,
    headline=True,
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental (new-batch vs existing-corpus) MinHash dedup — the
    nightly-crawl operator: only the incoming slice is signatured; the
    corpus side is the persisted banded-signature store. Here the corpus
    is documents with doc_id % 5 != 0 and the incoming batch is
    doc_id % 5 = 0, so the split is deterministic and oracle-replicable.

    Both sides are slices of ONE table, so the table is shingled and
    staged once and the slices are filters over the staged frame — one
    corpus map pass instead of two (r11 optimization round; identical
    output, A/B 0.69 → 0.62 s at sf0.1)."""
    from .operators.dedup import incremental_dedup_pairs, shingle_docs

    docs = _t(spark, sf_dir, "documents")
    sh_all = shingle_docs(docs, 3).localCheckpoint(eager=False)
    return incremental_dedup_pairs(
        docs.filter(F.col("doc_id") % 5 != 0),
        docs.filter(F.col("doc_id") % 5 == 0),
        n=3,
        k=8,
        bands=4,
        threshold=0.6,
        shingled_incoming=sh_all.filter(F.col("doc_id") % 5 == 0),
        shingled_corpus=sh_all.filter(F.col("doc_id") % 5 != 0),
    )


@register(
    "dedup_ngram_jaccard",
    # (source, word-set) factorized like the dedup_ngram_lsh oracle
    # (NOTES r6): jaccard is a set function and blocking is per source,
    # so the all-pairs intersect runs over one representative per
    # distinct set and pairs expand through membership (within-group
    # pairs are exactly 1.0). Identical output; the unfactorized form
    # ground through clone-clique squares at 10x bench scale.
    oracle="""
    WITH w AS (SELECT doc_id, source, list_distinct(string_split(lower(text), ' ')) AS ws
               FROM documents),
    keyed AS (SELECT doc_id, source, ws,
                     md5(source || chr(1) ||
                         list_aggregate(list_sort(ws), 'string_agg', chr(0))) AS k
              FROM w),
    grp AS (SELECT k, min(doc_id) AS rid, any_value(source) AS source,
                   any_value(ws) AS ws
            FROM keyed GROUP BY k),
    rep_pairs AS (
        SELECT a.k AS ka, b.k AS kb,
               round(len(list_intersect(a.ws, b.ws)) * 1.0
                     / len(list_distinct(list_concat(a.ws, b.ws))), 4) AS jaccard
        FROM grp a JOIN grp b ON a.source = b.source AND a.rid < b.rid
        -- length-ratio prune (implied by jaccard >= 0.95: min/max set
        -- size must be >= the threshold) mirrors the engine's O(1)
        -- join residual
        WHERE len(a.ws) >= 0.95 * len(b.ws) AND len(b.ws) >= 0.95 * len(a.ws)
          AND round(len(list_intersect(a.ws, b.ws)) * 1.0
                    / len(list_distinct(list_concat(a.ws, b.ws))), 4) >= 0.95),
    cross_pairs AS (
        SELECT least(x.doc_id, y.doc_id) AS doc_id_a,
               greatest(x.doc_id, y.doc_id) AS doc_id_b,
               p.jaccard
        FROM rep_pairs p
        JOIN keyed x ON x.k = p.ka
        JOIN keyed y ON y.k = p.kb),
    within_pairs AS (
        SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
               CAST(1.0 AS DOUBLE) AS jaccard
        FROM keyed a JOIN keyed b ON a.k = b.k AND a.doc_id < b.doc_id)
    SELECT * FROM cross_pairs UNION ALL SELECT * FROM within_pairs
    """,
)
def dedup_ngram_jaccard_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked word-set Jaccard dedup (block = source) — the oracle-
    replicable metadata-blocking mode; the production path with no
    metadata dependence is dedup_ngram_lsh (same verify math, LSH-bucket
    blocks)."""
    from .operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_t(spark, sf_dir, "documents"), threshold=0.95)


@register(
    "dedup_embedding",
    oracle="""
    WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    -- norm hoisted per ROW (sqrt of the same dot → bit-identical to the
    -- per-pair form; mirrors the engine's hoisting)
    en AS (SELECT vec_id, label, v, sqrt(list_dot_product(v, v)) AS nrm FROM e)
    SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
           round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS cos_sim
    FROM en a JOIN en b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) >= 0.4
    """,
)
def dedup_embedding_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup within blocks (label here; the
    metadata-free production path is dedup_embedding_lsh)."""
    from .operators.dedup import embedding_dup_pairs

    return embedding_dup_pairs(_t(spark, sf_dir, "embeddings"), threshold=0.4)


@register(
    "dedup_ngram_lsh",
    # Oracle replicates the n=1 (unigram-set) MinHash banding exactly —
    # same md5 hash family as dedup_minhash but k=32 / 4 bands of 8
    # (threshold-appropriate for 0.95; see ngram_jaccard_pairs). Hash
    # h_{4g+j}(s) = substr(md5(g || '|' || s), 8j+1, 8); band b's value
    # concatenates sig[b*8+1 .. b*8+8]. The oracle mirrors the engine's
    # SET-IDENTITY FACTORIZATION (provable identity, NOTES r6): docs
    # with identical shingle sets share signatures, buckets, and every
    # pairwise jaccard, so banding runs over one representative per
    # distinct set and pairs expand through group membership (within-
    # group pairs are exactly jaccard 1.0) — without this the banded
    # self-join enumerates 503M candidate rows at 10× bench scale.
    oracle="""
    WITH w AS (SELECT doc_id,
                      list_distinct(string_split(lower(text), ' ')) AS shingles
               FROM documents),
    keyed AS (SELECT doc_id, shingles,
                     CASE WHEN len(shingles) > 0
                          THEN md5(list_aggregate(list_sort(shingles),
                                                  'string_agg', chr(0)))
                     END AS k
              FROM w),
    reps AS (SELECT k, min(doc_id) AS rid, any_value(shingles) AS shingles
             FROM keyed WHERE k IS NOT NULL GROUP BY k),
    hx AS (SELECT rid, shingles,
                  [list_transform(shingles, s -> md5('0|' || s)),
                   list_transform(shingles, s -> md5('1|' || s)),
                   list_transform(shingles, s -> md5('2|' || s)),
                   list_transform(shingles, s -> md5('3|' || s)),
                   list_transform(shingles, s -> md5('4|' || s)),
                   list_transform(shingles, s -> md5('5|' || s)),
                   list_transform(shingles, s -> md5('6|' || s)),
                   list_transform(shingles, s -> md5('7|' || s))] AS hs
           FROM reps),
    mh AS (SELECT rid,
                  flatten(list_transform(hs, h ->
                      [list_min(list_transform(h, x -> substr(x, 1, 8))),
                       list_min(list_transform(h, x -> substr(x, 9, 8))),
                       list_min(list_transform(h, x -> substr(x, 17, 8))),
                       list_min(list_transform(h, x -> substr(x, 25, 8)))])) AS sig
           FROM hx),
    banded AS (SELECT rid, bnd.band,
                      CASE WHEN sig[1] IS NULL THEN NULL
                           ELSE list_aggregate(sig[CAST(bnd.band*8+1 AS INT)
                                                   : CAST(bnd.band*8+8 AS INT)],
                                               'string_agg', '|') END AS bv
               FROM mh, (SELECT unnest(range(0, 4)) AS band) bnd),
    cand AS (SELECT DISTINCT a.rid AS ra, b.rid AS rb
             FROM banded a JOIN banded b
               ON a.band = b.band AND a.bv = b.bv AND a.rid < b.rid),
    rep_pairs AS (
        SELECT ra, rb,
               round(len(list_intersect(sa.shingles, sb.shingles)) * 1.0
                     / len(list_distinct(list_concat(sa.shingles, sb.shingles))),
                     4) AS jaccard
        FROM cand
        JOIN reps sa ON sa.rid = cand.ra
        JOIN reps sb ON sb.rid = cand.rb
        -- length-ratio prune (implied by jaccard >= 0.95)
        WHERE len(sa.shingles) >= 0.95 * len(sb.shingles)
          AND len(sb.shingles) >= 0.95 * len(sa.shingles)
          AND round(len(list_intersect(sa.shingles, sb.shingles)) * 1.0
                    / len(list_distinct(list_concat(sa.shingles, sb.shingles))),
                    4) >= 0.95),
    cross_pairs AS (
        SELECT least(x.doc_id, y.doc_id) AS doc_id_a,
               greatest(x.doc_id, y.doc_id) AS doc_id_b,
               p.jaccard
        FROM rep_pairs p
        JOIN reps qa ON qa.rid = p.ra
        JOIN keyed x ON x.k = qa.k
        JOIN reps qb ON qb.rid = p.rb
        JOIN keyed y ON y.k = qb.k),
    within_pairs AS (
        SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
               CAST(1.0 AS DOUBLE) AS jaccard
        FROM keyed a JOIN keyed b ON a.k = b.k AND a.doc_id < b.doc_id
        WHERE a.k IS NOT NULL)
    SELECT * FROM cross_pairs UNION ALL SELECT * FROM within_pairs
    """,
)
def dedup_ngram_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-set Jaccard dedup with LSH-bucket blocking (block_col=None) —
    the production path with NO metadata-column dependence: the quadratic
    term is bounded by the largest LSH bucket (genuinely similar docs),
    not by the largest metadata block, which a skewed corpus makes the
    whole corpus. k=32 / 4 bands of 8 — the 0.95-threshold S-curve
    (r=2 banding measured corpus-quadratic; see ngram_jaccard_pairs +
    NOTES r6)."""
    from .operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), threshold=0.95, block_col=None
    )


def _ref_lsh_setup(con) -> None:
    from .functions.ref_oracle import setup_dedup_embedding_lsh

    setup_dedup_embedding_lsh(con)


@register(
    "dedup_embedding_lsh",
    # The RandomState(42) hyperplanes are registered as a DuckDB table by
    # oracle_setup (functions/ref_oracle.py); sign buckets, bucket pairs,
    # and cosine verification are pure SQL — list_dot_product shares the
    # engine's sequential fold (parity proven by knn_bruteforce).
    oracle="""
    WITH src AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
        UNION ALL
        SELECT vec_id + 1000000 AS vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings WHERE vec_id < 50),
    banded AS (
        SELECT vec_id, band,
               string_agg(CASE WHEN list_dot_product(v, p) >= 0
                               THEN '1' ELSE '0' END, '' ORDER BY j) AS bv
        FROM src CROSS JOIN ref_lsh_planes
        GROUP BY vec_id, band),
    cand AS (
        SELECT DISTINCT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b
        FROM banded a JOIN banded b
          ON a.band = b.band AND a.bv = b.bv AND a.vec_id < b.vec_id)
    SELECT vec_id_a, vec_id_b,
           round(list_dot_product(sa.v, sb.v)
                 / (sqrt(list_dot_product(sa.v, sa.v))
                    * sqrt(list_dot_product(sb.v, sb.v))), 6) AS cos_sim
    FROM cand
    JOIN src sa ON sa.vec_id = cand.vec_id_a
    JOIN src sb ON sb.vec_id = cand.vec_id_b
    WHERE round(list_dot_product(sa.v, sb.v)
                / (sqrt(list_dot_product(sa.v, sa.v))
                   * sqrt(list_dot_product(sb.v, sb.v))), 6) >= 0.98
    """,
    oracle_setup=_ref_lsh_setup,
)
def dedup_embedding_lsh_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup via random-hyperplane LSH blocking — the
    metadata-free production path. The driver corpus is uniform random (no
    true near-dups at a meaningful threshold), so the query plants exact
    duplicates (vec_id + 1_000_000) and must recover every planted pair at
    cos ≥ 0.98 — asserted in tests. Hash-checked since r6 via a
    registered-hyperplane oracle (functions/ref_oracle.py); still
    rows-only in the driver's vanilla-SQL gate. The LSH shape is
    scale-adaptive since r8 (adaptive_lsh_params: rbits grows with N so
    random buckets stay ~1k rows, bands re-solved for the historical
    recall floor; every corpus ≤ 262k vectors — all committed evidence —
    stays on the historical (8, 8), and the oracle_setup recomputes the
    identical shape from COUNT(*))."""
    from .operators.dedup import embedding_dup_pairs_lsh

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planted = emb.filter(F.col("vec_id") < 50).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), F.col("embedding")
    )
    return embedding_dup_pairs_lsh(emb.unionByName(planted), threshold=0.98)


def _ref_ivfpq_setup(con) -> None:
    from .functions.ref_oracle import setup_knn_ivfpq

    setup_knn_ivfpq(con)


@register(
    "knn_ivfpq",
    # Expected-result oracle: the full IVF+PQ pipeline (seeded centroids,
    # probe sets, codes, ADC shortlist, exact re-rank) re-run in
    # numpy/Python with the engine's exact op order and registered as a
    # table — functions/ref_oracle.py::_expected_pq_result.
    oracle="SELECT * FROM ref_knn_ivfpq",
    oracle_setup=_ref_ivfpq_setup,
)
def knn_ivfpq_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 production ANN composition: IVF coarse lists bound which vectors
    are scored (nprobe=8 of 16), PQ codes bound bytes per scored vector,
    exact cosine re-rank over the 50-candidate shortlist restores ranking.
    Hash-checked since r6 vs an independent numpy reference
    (functions/ref_oracle.py) in check_oracle; rows-only in the driver's
    vanilla gate; recall floor vs brute force stays pinned in tests."""
    from .operators.similarity import knn_ivfpq

    emb = _t(spark, sf_dir, "embeddings")
    return knn_ivfpq(
        emb.filter(F.col("vec_id") >= 5),
        emb.filter(F.col("vec_id") < 5),
        # n_centroids omitted -> scale-adaptive list count (r8): 16 at
        # sf <= 0.1 (unchanged hash evidence), ~N/1024 beyond
        k=10, nprobe=8, rerank=50,
    )


def _ref_ivfpq_hires_setup(con) -> None:
    from .functions.ref_oracle import setup_knn_ivfpq_hires

    setup_knn_ivfpq_hires(con)


@register(
    "knn_ivfpq_hires",
    oracle="SELECT * FROM ref_knn_ivfpq_hires",
    oracle_setup=_ref_ivfpq_hires_setup,
)
def knn_ivfpq_hires_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 IVFPQ tuned for CLUSTERED corpora (r11, the RECALL_CURVES_r11
    finding): on mixture-of-Gaussians embeddings the base entry's
    ksub=16/rerank=50 reads recall 0.12-0.36 regardless of probing —
    the ADC shortlist, not the probe set, is the bottleneck, because
    hundreds of same-cluster candidates sit inside the 4-bit codes'
    quantization noise. This entry is the measured repair: ksub=256
    (8-bit codes, FAISS-standard, IDENTICAL m-bytes/vector storage),
    rerank=200, and the adaptive probe under the IMI regime — measured
    0.86 recall at clustered 600k / 0.74 at 2M vs the base 0.32/0.12
    (exact-scoring knn_imi remains the recall ceiling at these scales;
    IVFPQ's niche is the memory-bound regime where full vectors don't
    fit). Hash-checked vs the parameterized numpy mirror in both coarse
    regimes."""
    from .operators.similarity import (
        adaptive_coarse_shape,
        adaptive_imi_nprobe,
        knn_ivfpq,
    )

    emb = _t(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") >= 5)
    kind, val = adaptive_coarse_shape(corpus.count())
    nprobe = 8 if kind == "flat" else adaptive_imi_nprobe(val * val)
    return knn_ivfpq(
        corpus,
        emb.filter(F.col("vec_id") < 5),
        k=10, nprobe=nprobe, ksub=256, rerank=200,
    )


def _ref_sem_setup(con) -> None:
    from .functions.ref_oracle import setup_dedup_semantic

    setup_dedup_semantic(con)


@register(
    "dedup_semantic",
    # The blocking assignment comes from the registered ref_sem_assign
    # view, which mirrors the engine's coarse regime (flat nearest-
    # centroid SQL within the cap — the unchanged r6-r10 algebra — or
    # numpy IMI cells past it, VERDICT r10 #1); the within-block cosine
    # pairing below is one SQL formulation over it either way, with the
    # shared fold order.
    oracle="""
    SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
           round(list_dot_product(a.v, b.v)
                 / (sqrt(list_dot_product(a.v, a.v))
                    * sqrt(list_dot_product(b.v, b.v))), 6) AS cos_sim
    FROM ref_sem_assign a JOIN ref_sem_assign b
      ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
    WHERE round(list_dot_product(a.v, b.v)
                / (sqrt(list_dot_product(a.v, a.v))
                   * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.98
    """,
    oracle_setup=_ref_sem_setup,
)
def dedup_semantic_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup: seeded k-means clusters block the
    pairwise cosine (quadratic term bounded by the largest cluster, not
    the corpus). Same planted-duplicate protocol as dedup_embedding_lsh:
    exact copies of vec_id < 50 at +1e6 must all be recovered at
    cos ≥ 0.98 — asserted in tests (an exact copy always lands in its
    original's cluster). Hash-checked since r6 via the registered
    centroid-reference oracle (functions/ref_oracle.py); rows-only in
    the driver's vanilla gate."""
    from .operators.dedup import semantic_dup_pairs

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planted = emb.filter(F.col("vec_id") < 50).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), F.col("embedding")
    )
    return semantic_dup_pairs(emb.unionByName(planted), threshold=0.98)


# ===========================================================================
# Similarity search [EXT E4].
# ===========================================================================

# SQL text twin of functions.dot — the same sequential left-fold
# (deterministic accumulation order, comparable across engines).
_DOT_SQL = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0.0D, (acc, x) -> acc + x)"
_COS_SQL = (
    f"{_DOT_SQL.format(a='qv', b='cv')} / "
    f"(sqrt({_DOT_SQL.format(a='qv', b='qv')}) * sqrt({_DOT_SQL.format(a='cv', b='cv')}))"
)

# One-statement twin of operators.similarity.knn_bruteforce over the
# vec_id<5 / >=5 split (r12, guide §7.3; bit-identity pinned in tests).
_KNN_BF_SQL = f"""
WITH c AS (SELECT vec_id AS neighbor_id, transform(embedding, x -> cast(x AS double)) AS cv
           FROM {{v}} WHERE vec_id >= 5),
q AS (SELECT vec_id AS query_id, transform(embedding, x -> cast(x AS double)) AS qv
      FROM {{v}} WHERE vec_id < 5),
scored AS (SELECT /*+ BROADCAST(q) */ query_id, neighbor_id, round({_COS_SQL}, 6) AS cos_sim
           FROM c CROSS JOIN q),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM scored)
SELECT query_id, neighbor_id, cast(rank AS bigint) AS nn_rank, cos_sim FROM r WHERE rank <= 10
"""


@register(
    "knn_bruteforce",
    oracle="""
    WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
    c AS (SELECT vec_id AS neighbor_id, v AS cv FROM e WHERE vec_id >= 5),
    scored AS (
        SELECT query_id, neighbor_id,
               round(list_dot_product(qv, cv)
                     / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))),
                     6) AS cos_sim
        FROM q CROSS JOIN c
    ),
    r AS (SELECT *, CAST(row_number() OVER (
              PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS nn_rank
          FROM scored)
    SELECT query_id, neighbor_id, nn_rank, cos_sim FROM r WHERE nn_rank <= 10
    """,
    headline=True,
)
def knn_bruteforce_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 exact cosine top-k: broadcast query set × corpus scan, per-query
    top-k reduction. The exact baseline the IVF variant is measured against.

    Built as ONE SQL statement over the stable table view (r12, guide
    §7.3): the Column build re-paid ~10 eagerly-analyzed Dataset ops +
    the aggregate-fold cosine's py4j chatter per invocation (~0.19 s of
    pure driver time at sf0.1; interleaved A/B build+exec 0.661 →
    0.429 s). Same operators, same plan (broadcast nested-loop cross
    join, window top-k); bit-identity vs operators.similarity
    .knn_bruteforce is pinned in tests, which stays the reference
    implementation for every composed caller."""
    from .sources.tables import table_view

    v = table_view(spark, "embeddings", sf_dir)
    return spark.sql(_KNN_BF_SQL.format(v=v))


@register(
    "knn_ivf",
    # The every-Nth centroid stand-in makes this IVF fully deterministic,
    # so the WHOLE pipeline is SQL-expressible: centroid grid → nearest-
    # centroid assignment (rank over UNROUNDED cosine — identical doubles
    # on both engines, same fold order as the hash-matched knn_bruteforce
    # oracle) → inverted-list equi-join → per-query top-k.
    oracle="""
    WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    corpus AS (SELECT vec_id, v FROM e WHERE vec_id >= 5),
    q AS (SELECT vec_id, v FROM e WHERE vec_id < 5),
    cents AS (SELECT vec_id // 100 AS centroid_id, v AS cv
              FROM corpus WHERE vec_id % 100 = 0),
    ca AS (SELECT vec_id AS neighbor_id, v AS cv2, centroid_id,
                  row_number() OVER (PARTITION BY vec_id ORDER BY
                      list_dot_product(v, cv)
                      / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(cv, cv)))
                      DESC, centroid_id) AS rn
           FROM corpus CROSS JOIN cents),
    qa AS (SELECT vec_id AS query_id, v AS qv, centroid_id,
                  row_number() OVER (PARTITION BY vec_id ORDER BY
                      list_dot_product(v, cv)
                      / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(cv, cv)))
                      DESC, centroid_id) AS rn
           FROM q CROSS JOIN cents),
    scored AS (SELECT query_id, neighbor_id,
                      round(list_dot_product(qv, cv2)
                            / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv2, cv2))),
                            6) AS cos_sim
               FROM (SELECT * FROM ca WHERE rn = 1) c
               JOIN (SELECT * FROM qa WHERE rn = 1) USING (centroid_id)),
    r AS (SELECT *, CAST(row_number() OVER (
              PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS INT) AS rank
          FROM scored)
    SELECT query_id, neighbor_id, rank, cos_sim FROM r WHERE rank <= 10
    """,
)
def knn_ivf_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 ORACLE-REPLICABLE STAND-IN — production is knn_ivf_kmeans.
    IVF single-probe approximate top-k over the deterministic every-Nth
    centroid grid: centroid count grows ∝ corpus, so assignment is
    O(N²/100) by design (45.8 s at sf10 vs knn_ivf_kmeans 12.5 s, gap
    widening per decade — SCALE100_FULL_r08). The grid's value is exact
    cross-engine verifiability: the every-Nth rule is engine-
    independent, so the full pipeline (assignment ranks compare
    UNROUNDED cosines — bit-identical doubles, the fold order both
    engines share) has an exact SQL oracle; recall-vs-bruteforce stays
    asserted in tests. Serve with knn_ivf_kmeans (adaptive capped list
    count), verified against its seeded numpy reference."""
    from .operators.similarity import knn_ivf

    emb = _t(spark, sf_dir, "embeddings")
    return knn_ivf(emb.filter(F.col("vec_id") >= 5), emb.filter(F.col("vec_id") < 5), k=10, every=100)


def _ref_ivfk_setup(con) -> None:
    from .functions.ref_oracle import setup_knn_ivf_kmeans

    setup_knn_ivf_kmeans(con)


@register(
    "knn_ivf_kmeans",
    # ref_knn_ivfk is registered by setup_knn_ivf_kmeans, which mirrors
    # the engine's adaptive_coarse_shape (ADVICE r9 #1): below the flat
    # cap it is a VIEW whose body is the same pure-SQL flat formulation
    # that has carried the hash evidence since r6 (ref_cents_ivf
    # cross-join + nprobe=8 — the SQL text moved verbatim into the setup
    # hook); past the cap (N > 131,072, flat_hi=128 since r10) it is
    # the numpy IMI expected
    # result, matching the engine's automatic knn_imi switch — so an
    # oracle run at ANY corpus size compares against the path the engine
    # actually takes instead of reporting a spurious mismatch.
    oracle="SELECT query_id, neighbor_id, rank, cos_sim FROM ref_knn_ivfk",
    oracle_setup=_ref_ivfk_setup,
)
def knn_ivf_kmeans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 scale path, production centroids: seeded KMeans-trained inverted
    lists with multi-probe. Hash-checked since r6 via the registered
    centroid-reference oracle (rows-only in the driver's vanilla gate);
    recall ≥ 0.8 vs knn_bruteforce pinned in tests — a materially higher
    bar than the deterministic-sample variant's floor. nprobe=8 of 16
    lists here because the test embeddings are UNIFORM random (no cluster
    structure, so true cosine neighbors scatter across lists — measured
    recall: 0.62 at nprobe=4, 0.88 at 8); real embedding corpora cluster
    and reach the same recall probing far fewer lists. The cost model is
    the point: each query scores nprobe/n_centroids of the corpus,
    tunable per workload. Past the flat cap (N > 131,072 — flat_hi=128
    since r10, still beyond every committed oracle scale) the coarse
    stage switches to the
    IMI grid (adaptive_coarse_shape; algebra hash-matched by the
    knn_imi entry) — the flat branch below the cap is byte-identical to
    r8."""
    from .operators.similarity import (
        adaptive_coarse_shape,
        kmeans_centroids,
        knn_imi,
        knn_ivf,
    )

    emb = _t(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") >= 5)
    queries = emb.filter(F.col("vec_id") < 5)
    # scale-adaptive list count (r8) + past-cap IMI switch (r9): 16 flat
    # lists at sf <= 0.1 (unchanged hash evidence), ~N/1024 to the cap,
    # IMI cells beyond — the oracle recomputes the same flat k (it never
    # runs past the cap; engine-only sweeps cover that decade)
    kind, val = adaptive_coarse_shape(corpus.count())
    if kind == "imi":
        return knn_imi(corpus, queries, k=10, k_half=val, nprobe=8)
    cents = kmeans_centroids(corpus, n_centroids=val, seed=42)
    return knn_ivf(corpus, queries, k=10, centroids=cents, nprobe=8)


def _ref_imi_setup(con) -> None:
    from .functions.ref_oracle import setup_knn_imi

    setup_knn_imi(con)


@register(
    "knn_imi",
    # Expected-result oracle: half-space codebooks, cell assignment,
    # exact-L2 cell probing, candidate cosines, and (round6 DESC, id)
    # ranking re-run in numpy with the engine's exact op order —
    # functions/ref_oracle.py::_expected_imi_result.
    oracle="SELECT * FROM ref_knn_imi",
    oracle_setup=_ref_imi_setup,
)
def knn_imi_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 next-decade coarse quantizer: inverted multi-index ANN
    (Babenko & Lempitsky 2012 — two half-space codebooks of k_half
    centroids whose product grid gives k_half² cells). The flat kmeans
    quantizer is cornered past its cap (N > 131,072 since r10 — and
    MEASURED 3-9x slower than IMI well before it): per-list mass grows
    ∝ N again, and raising the cap makes the O(N·k) assignment pass
    quadratic. IMI keeps per-cell mass at ~target while assignment
    scores only 2·k_half HALF-vectors per row — O(N·sqrt(cells)) — so
    the decade past the cap (2M+ vectors) stays linear-ish. This entry
    runs the IMI path at EVERY scale (k_half adaptive: 4 half-centroids
    = 16 cells at bench scale) so the algebra carries committed
    hash-match evidence; knn_ivf_kmeans/knn_ivfpq/dedup_semantic switch
    to this quantizer automatically past the flat cap
    (adaptive_coarse_shape). This entry PINS the fixed nprobe=8
    configuration (its oracle mirrors it); since r11 the knn_imi
    FUNCTION defaults to the adaptive probe, and a fixed probe under a
    quarter of the grid emits a loud UserWarning naming the measured
    2M-decade recall cliff (VERDICT r10 #3) — which this entry triggers
    past ~sf0.5, by design."""
    from .operators.similarity import knn_imi

    emb = _t(spark, sf_dir, "embeddings")
    return knn_imi(
        emb.filter(F.col("vec_id") >= 5), emb.filter(F.col("vec_id") < 5),
        k=10, nprobe=8,
    )


def _ref_imi_mp_setup(con) -> None:
    from .functions.ref_oracle import setup_knn_imi_mp

    setup_knn_imi_mp(con)


@register(
    "knn_imi_mp",
    oracle="SELECT * FROM ref_knn_imi_mp",
    oracle_setup=_ref_imi_mp_setup,
)
def knn_imi_mp_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 IMI with SCALE-ADAPTIVE MULTIPROBE — the recall knob VERDICT
    r9 #5 asked for: nprobe = max(32, cells/4) (adaptive_imi_nprobe), vs
    knn_imi's fixed 8. The r10 subgrid probe (imi_assign: per-half
    stable top-p prefilter, provably identical to the full-grid ranking)
    is what makes a 500-cell probe viable: ranking is O(k_half log +
    probe²) per query regardless of grid size, and candidates ∝
    nprobe·target stay far below the assignment pass that dominates the
    decade wall. Measured vs knn_bruteforce: recall 1.00 at sf0.001/
    sf0.1 (grid <= floor: probes every cell — byte-identical to fixed
    nprobe=32, so the committed hash evidence is untouched); at the 2M-
    vector UNIFORM decade (structureless worst case) 0.90 at 7.3s vs
    knn_imi's 0.12 at 6.3s — recall tracks the probed fraction there,
    and the docstring of adaptive_imi_nprobe records that trade. Oracle:
    same numpy mirror, nprobe mirrored from COUNT(*)."""
    from .operators.similarity import (
        adaptive_imi_khalf,
        adaptive_imi_nprobe,
        knn_imi,
    )

    emb = _t(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") >= 5)
    k_half = adaptive_imi_khalf(corpus.count())
    return knn_imi(
        corpus,
        emb.filter(F.col("vec_id") < 5),
        k=10,
        k_half=k_half,
        nprobe=adaptive_imi_nprobe(k_half * k_half),
    )


@register(
    "knn_imi_indexed",
    # Bit-identical to knn_imi_mp by construction (same k_half, seed,
    # adaptive nprobe; same assignment kernel and join/window tail; the
    # stored v doubles round-trip parquet exactly) — so the same numpy
    # expected-result mirror serves both entries.
    oracle="SELECT * FROM ref_knn_imi_mp",
    oracle_setup=_ref_imi_mp_setup,
)
def knn_imi_indexed_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 PERSISTED-INDEX serving path (r11): build_imi_index writes the
    corpus cell-partitioned on disk (codebooks + centroid_id=C parquet
    directories); knn_imi_indexed turns probing into Catalyst PARTITION
    PRUNING — the probed cells filter the partition column, so the scan
    plans only those directories and serving I/O is O(probed × per-cell
    mass), independent of corpus size. The build is cached per corpus
    fingerprint (file path + mtime + size) under /tmp, the serve path
    re-reads only the pruned layout — the build/serve split a real
    100 TB ANN deployment runs (FAISS-on-object-store shape, expressed
    as parquet partition layout + pruning). PartitionFilters presence
    is plan-pinned in tests; results hash-match the knn_imi_mp
    mirror."""
    from .operators.similarity import build_imi_index, knn_imi_indexed

    emb = _t(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") >= 5)
    queries = emb.filter(F.col("vec_id") < 5)
    src = os.path.join(sf_dir, "embeddings.parquet")
    try:
        st = os.stat(src)
        fp = f"{os.path.realpath(src)}|{st.st_mtime_ns}|{st.st_size}"
    except OSError:
        fp = f"{sf_dir}|unknown"
    # Per-session temp dir (fresh mkdtemp per process — VERDICT r11 #5):
    # the fingerprint only scopes the WITHIN-session build-once, and a
    # source rewrite mid-session forces a rebuild into a new dir.
    index_dir = _session_index_dir(spark, f"imi|{fp}")
    if not os.path.exists(os.path.join(index_dir, "meta.json")):
        build_imi_index(corpus, index_dir)
    return knn_imi_indexed(spark, index_dir, queries, k=10)


def _ref_imi_indexed_incr_setup(con) -> None:
    from .functions.ref_oracle import setup_knn_imi_indexed_incr

    setup_knn_imi_indexed_incr(con)


@register(
    "knn_imi_indexed_incr",
    oracle="SELECT * FROM ref_knn_imi_indexed_incr",
    oracle_setup=_ref_imi_indexed_incr_setup,
)
def knn_imi_indexed_incr_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 INCREMENTAL index maintenance (r11): build_imi_index on the
    odd vec_ids (codebooks trained and grid frozen there), then
    append_imi_index the even vec_ids — assignment under the frozen
    codebooks, rows appended into the cell directories — and serve the
    full corpus with knn_imi_indexed. The streaming-corpus shape: new
    data is absorbed by assignment-and-append (O(batch)), never an
    O(corpus) rebuild; codebook drift is metered in meta and warned on
    (append_imi_index docstring). Oracle: the SAME numpy expected-result
    mirror with train_sql = the odd subset (the grid freeze makes
    build(A)+append(B) ≡ assignment of A∪B under A-trained codebooks —
    also pinned as an engine-side equivalence in tests)."""
    from .operators.similarity import (
        append_imi_index,
        build_imi_index,
        knn_imi_indexed,
    )

    emb = _t(spark, sf_dir, "embeddings")
    base = emb.filter((F.col("vec_id") >= 5) & (F.col("vec_id") % 2 == 1))
    incr = emb.filter((F.col("vec_id") >= 5) & (F.col("vec_id") % 2 == 0))
    queries = emb.filter(F.col("vec_id") < 5)
    src = os.path.join(sf_dir, "embeddings.parquet")
    try:
        st = os.stat(src)
        fp = f"incr|{os.path.realpath(src)}|{st.st_mtime_ns}|{st.st_size}"
    except OSError:
        fp = f"incr|{sf_dir}|unknown"
    # Per-session temp dir (fresh mkdtemp per process — VERDICT r11 #5).
    index_dir = _session_index_dir(spark, fp)
    if not os.path.exists(os.path.join(index_dir, "meta.json")):
        import warnings

        build_imi_index(base, index_dir)
        with warnings.catch_warnings():
            # the even half can outnumber the odd training base by one
            # row — the drift warning is by-design noise at a 50/50
            # split, not a stale-codebook signal
            warnings.simplefilter("ignore", UserWarning)
            append_imi_index(incr, index_dir)
    return knn_imi_indexed(spark, index_dir, queries, k=10)


# ===========================================================================
# Aggregation/set/join coverage beyond the reference surface.
# ===========================================================================


@register(
    "distinct_count",
    oracle="""
    SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
    FROM events
    """,
)
def distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation over two columns.

    PLAN SHAPE (r9, caught by the plan gate's new Expand rule — the
    TRAP #29 family): two countDistinct columns in ONE .agg() plan via
    Catalyst's Expand strategy — every event row duplicated with a gid
    and shuffled on (user_id, event_type, gid), doubling the exchange
    volume. Same fix as approx_distinct (r8): each column gets its own
    single-distinct aggregate (two-phase partial dedup, map-side
    combine, no Expand) and the two 1-row results crossJoin (the
    allowed 1-row pattern). Two columnar scans beat one scan that
    doubles itself through the shuffle."""
    ev = _t(spark, sf_dir, "events")
    users = ev.agg(F.countDistinct("user_id").alias("n_users"))
    types = ev.agg(F.countDistinct("event_type").alias("n_types"))
    return users.crossJoin(types)


@register(
    "approx_distinct",
    oracle="""
    SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           CAST(count(DISTINCT event_type) AS BIGINT) AS exact_types,
           TRUE AS users_within_5pct,
           TRUE AS types_within_5pct
    FROM events
    """,
)
def approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5 HLL++ approximate distinct — sketches merge associatively so the
    plan is one map-side sketch + tiny final merge (the 100 TB way to count
    distincts). HLL estimates differ across engines by design, so the
    raw estimate is not oracle-comparable; instead the query emits the
    exact counts (hash-checked) plus |approx − exact| ≤ 5%·exact booleans
    — 5σ of the requested rsd=0.01, so the boolean is TRUE whenever the
    sketch meets its own published error bound, and the oracle can assert
    it as a literal.

    PLAN SHAPE (r8, flagged by the full-registry survival sweep at
    13.4×/decade): TWO count_distinct columns in ONE aggregate plan via
    Catalyst's Expand strategy — every event row triplicated with a gid,
    shuffled on (user_id, event_type, gid), and the HLL sketches carried
    PER (user, type, gid) GROUP through the exchange (50 s at 100× bench
    scale). Each column now gets its own single-distinct aggregate —
    Spark's two-phase partial-dedup plan, map-side combine, no Expand —
    and the two 1-row results crossJoin (the allowed 1-row pattern). Two
    scans of a columnar source beat one scan that triples and shuffles
    itself: scans are the cheap part at 100 TB, the Expand exchange is
    not."""
    within = lambda approx, exact: (  # noqa: E731
        F.abs(approx - exact) <= exact * F.lit(0.05)
    )
    ev = _t(spark, sf_dir, "events")
    users = ev.agg(
        F.count_distinct(F.col("user_id")).alias("exact_users"),
        F.approx_count_distinct("user_id", 0.01).alias("au"),
    )
    types = ev.agg(
        F.count_distinct(F.col("event_type")).alias("exact_types"),
        F.approx_count_distinct("event_type", 0.01).alias("at"),
    )
    return users.crossJoin(types).select(
        "exact_users",
        "exact_types",
        within(F.col("au"), F.col("exact_users")).alias("users_within_5pct"),
        within(F.col("at"), F.col("exact_types")).alias("types_within_5pct"),
    )


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join (customers with no orders). Plans as a broadcast/shuffled
    hash anti join — never a NOT IN crossJoin."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join (customers with ≥1 pending order) — the filter pushes into
    the build side before the join."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "set_ops",
    oracle="""
    SELECT 'err_not_signup' AS setop, user_id FROM (
        SELECT DISTINCT user_id FROM events WHERE event_type = 'error'
        EXCEPT
        SELECT DISTINCT user_id FROM events WHERE event_type = 'signup')
    UNION ALL
    SELECT 'err_and_purchase' AS setop, user_id FROM (
        SELECT DISTINCT user_id FROM events WHERE event_type = 'error'
        INTERSECT
        SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
    """,
)
def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT / INTERSECT (distinct semantics; the reference's R16 check is
    the EXCEPT ALL cousin, covered by cdc_consistency_diff)."""
    ev = _t(spark, sf_dir, "events")
    err = ev.filter(F.col("event_type") == "error").select("user_id").distinct()
    sig = ev.filter(F.col("event_type") == "signup").select("user_id").distinct()
    pur = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    return err.subtract(sig).withColumn("setop", F.lit("err_not_signup")).unionAll(
        err.intersect(pur).withColumn("setop", F.lit("err_and_purchase"))
    ).select("setop", "user_id")


@register(
    "rollup_revenue",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_base, count(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (subtotals + grand total in one pass —
    Spark expands to a single Expand + hash aggregate, not N scans)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(_dsum(F.col("l_extendedprice"), 2).alias("sum_base"), F.count("*").alias("n"))
    )


@register(
    "scalar_funcs",
    oracle="""
    SELECT p_partkey,
           upper(p_brand) AS brand_upper,
           substr(p_name, 1, 5) AS name_prefix,
           length(p_name) AS name_len,
           round(abs(p_retailprice - 1000.0), 2) AS price_dev,
           p_size % 7 AS size_mod,
           p_brand || '#' || p_type AS brand_type,
           contains(p_name, 'br') AS has_br
    FROM part
    """,
)
def scalar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar function library sample: string/math/predicate functions, all
    JVM built-ins inside one codegen stage."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.round(F.abs(F.col("p_retailprice") - 1000.0), 2).alias("price_dev"),
        (F.col("p_size") % 7).alias("size_mod"),
        F.concat(F.col("p_brand"), F.lit("#"), F.col("p_type")).alias("brand_type"),
        F.col("p_name").contains("br").alias("has_br"),
    )


@register(
    "date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT) AS yr,
           CAST(month(o_orderdate) AS BIGINT) AS mo,
           CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date
    FROM orders
    """,
)
def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function sample on NTZ timestamps — extraction and
    arithmetic are wall-clock (timezone-free) on both engines."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mo"),
        F.quarter("o_orderdate").cast("long").alias("qtr"),
        F.date_format(
            F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"), "yyyy-MM-dd"
        ).alias("due_date"),
    )


# ===========================================================================
# Multimodal columns [EXT E7].
# ===========================================================================


@register(
    "media_catalog",
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                WHEN doc_id % 3 = 1 THEN 'audio/wav'
                ELSE 'video/mp4' END AS mime,
           CAST(CASE WHEN doc_id % 3 = 2 THEN 4 ELSE 1 END AS INT) AS n_frames,
           CAST(octet_length(unhex(repeat(md5(CAST(doc_id AS VARCHAR)), 4))) AS INT)
               AS payload_len
    FROM documents
    """,
)
def media_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E7 media table plumbing: binary payload + typed metadata struct,
    synthesized deterministically (both engines derive identical bytes).
    Metadata-only projections never touch the payload column (parquet
    column pruning) — asserted by the plan test."""
    from .operators.multimodal import synthesize_media

    m = synthesize_media(_t(spark, sf_dir, "documents"))
    return m.select(
        "doc_id",
        F.col("meta.mime").alias("mime"),
        F.col("meta.n_frames").alias("n_frames"),
        F.length("payload").cast("int").alias("payload_len"),
    )


@register(
    "media_features",
    headline=True,
    # The payload is 4× the md5(doc_id) bytes (synthesize_media), so the
    # oracle re-derives every byte from the md5 hex string: histogram counts
    # are 4× the per-md5-byte counts and the mean/entropy are identical.
    oracle="""
    WITH h AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS hx FROM documents),
    b AS (
        SELECT doc_id,
               (strpos('0123456789abcdef', substring(hx, CAST(2 * i + 1 AS INT), 1)) - 1) * 16
               + (strpos('0123456789abcdef', substring(hx, CAST(2 * i + 2 AS INT), 1)) - 1)
                   AS byte
        FROM h CROSS JOIN (SELECT CAST(range AS INT) AS i FROM range(16)) g
    ),
    bins AS (
        SELECT doc_id, CAST(byte // 16 AS INT) AS bin, count(*) * 4 AS cnt
        FROM b GROUP BY 1, 2
    ),
    grid AS (
        SELECT d.doc_id, g.bin
        FROM (SELECT doc_id FROM documents) d
        CROSS JOIN (SELECT CAST(range AS INT) AS bin FROM range(16)) g
    ),
    hist AS (
        SELECT grid.doc_id, grid.bin, coalesce(bins.cnt, 0) AS cnt
        FROM grid LEFT JOIN bins ON grid.doc_id = bins.doc_id AND grid.bin = bins.bin
    ),
    hcsv AS (
        SELECT doc_id, string_agg(CAST(cnt AS VARCHAR), ',' ORDER BY bin)
                   AS histogram_csv
        FROM hist GROUP BY doc_id
    ),
    stats AS (
        SELECT doc_id, CAST(64 AS INT) AS n_bytes, avg(byte) AS byte_mean
        FROM b GROUP BY doc_id
    ),
    ent AS (
        SELECT doc_id, round(-sum((cnt / 64.0) * log2(cnt / 64.0)), 6) AS byte_entropy
        FROM hist WHERE cnt > 0 GROUP BY doc_id
    )
    SELECT s.doc_id, s.n_bytes, s.byte_mean, e.byte_entropy, c.histogram_csv
    FROM stats s JOIN ent e USING (doc_id) JOIN hcsv c USING (doc_id)
    """,
)
def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E7 Arrow-batched byte-level feature extraction (histogram/mean/
    entropy) over binary payloads via mapInPandas. The operator keeps the
    histogram as array<long>; this driver-facing query serializes it to a
    CSV string (the driver canonicalizes results through pandas, where an
    array column is unhashable). byte_mean is exact on both engines: sums
    of small ints are exact in float64 and the /64 divisor is a power of
    two, so no rounding is needed."""
    from .operators.multimodal import extract_features, synthesize_media

    from .sources.tables import spread

    feats = extract_features(synthesize_media(spread(_t(spark, sf_dir, "documents"))))
    return feats.select(
        "doc_id",
        "n_bytes",
        "byte_mean",
        "byte_entropy",
        F.array_join(
            F.transform(F.col("histogram"), lambda x: x.cast("string")), ","
        ).alias("histogram_csv"),
    )


@register(
    "media_frames",
    # payload = unhex(repeat(md5(doc_id), 4)) = 64 bytes; video docs
    # (doc_id % 3 == 2) split into 16-byte frames, every 2nd kept → frames
    # 0 and 2. Frame i's bytes are hex chars [32i+1, 32i+32] of the
    # repeated digest = the md5 hex itself (frame size == digest size).
    oracle="""
    SELECT doc_id,
           CAST(f AS INT) AS frame_idx,
           upper(md5(CAST(doc_id AS VARCHAR))) AS frame_hex
    FROM documents
    CROSS JOIN (SELECT unnest([0, 2]) AS f) frames
    WHERE doc_id % 3 = 2
    """,
)
def media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E7 frame sampling under the oracle gate: video payloads split into
    fixed-size frames, every 2nd kept, one row per frame (the explode
    shape a per-frame model consumes). Frames are emitted hex-encoded —
    binary columns can't cross the driver's pandas canonicalization.
    The 4× md5 payload makes every 16-byte frame equal the digest, which
    is what lets DuckDB reproduce the bytes exactly."""
    from .operators.multimodal import sample_frames, synthesize_media

    from .sources.tables import spread

    media = synthesize_media(spread(_t(spark, sf_dir, "documents"))).filter(
        F.col("meta.mime") == "video/mp4"
    )
    frames = sample_frames(media, frame_bytes=16, every=2)
    return frames.select(
        "doc_id",
        "frame_idx",
        F.hex(F.col("frame")).alias("frame_hex"),
    )


# ===========================================================================
# TF-IDF [EXT E6], CUBE, and pyspark.ml LSH variants.
# ===========================================================================


@register(
    "tfidf_top_terms",
    headline=True,
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word FROM documents
    ),
    tf AS (SELECT doc_id, word, count(*) AS tf FROM tok GROUP BY doc_id, word),
    df AS (SELECT word, count(DISTINCT doc_id) AS df FROM tok GROUP BY word),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.word,
               round(tf.tf * (ln((n.n_docs + 1.0) / (df.df + 1.0)) + 1.0), 4) AS tfidf
        FROM tf JOIN df USING (word) CROSS JOIN n
    ),
    ranked AS (
        SELECT *, CAST(row_number() OVER (
            PARTITION BY doc_id ORDER BY tfidf DESC, word) AS BIGINT) AS term_rank
        FROM scored
    )
    SELECT doc_id, word, tfidf, term_rank FROM ranked WHERE term_rank <= 3
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6 TF-IDF, fully declarative: explode → tf groupBy → df groupBy →
    smooth-idf join → per-doc top-3. The df side is tiny (vocabulary) and
    broadcast; the corpus size rides along as a broadcast 1-row aggregate
    (no separate .count() driver job — one plan, one submission); the
    only big shuffles are the two aggregations on (doc, word) / (word) —
    both with map-side partial aggregation.

    Built as ONE SQL statement (r12, guide §7.3): the ~8-op Column
    build re-paid an eager Catalyst analysis per op (~0.16 s of driver
    time per invocation at sf0.1; interleaved A/B build+exec 1.073 →
    0.784 s). Same operators, bit-identity pinned in tests. A df-from-tf
    restructure (stage tf, count rows per word) was A/B'd and REJECTED
    at this scale: 0.774 → 0.827 s — countDistinct's internal
    (word, doc_id) partial-agg already does the same work without the
    checkpoint barrier."""
    from .sources.tables import table_view

    v = table_view(spark, "documents", sf_dir)
    return spark.sql(_TFIDF_SQL.format(v=v))


# One-statement twin of the historical Column build (r12, guide §7.3;
# bit-identity pinned in tests).
_TFIDF_SQL = """
WITH tok AS (SELECT doc_id, explode(split(lower(text), ' ')) AS word FROM {v}),
tf AS (SELECT doc_id, word, count(*) AS tf FROM tok GROUP BY doc_id, word),
df AS (SELECT word, count(DISTINCT doc_id) AS df FROM tok GROUP BY word),
nd AS (SELECT count(*) AS __n_docs FROM {v}),
scored AS (SELECT /*+ BROADCAST(df, nd) */ doc_id, word,
                  round(tf * (ln((__n_docs + 1.0D) / (df + 1.0D)) + 1.0D), 4) AS tfidf
           FROM tf JOIN df USING (word) CROSS JOIN nd),
r AS (SELECT *, cast(row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, word) AS bigint) AS term_rank
      FROM scored)
SELECT doc_id, word, tfidf, term_rank FROM r WHERE term_rank <= 3
"""


@register(
    "cube_revenue",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_base, count(*) AS n
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (all 4 grouping combinations in one Expand +
    hash aggregate pass)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(_dsum(F.col("l_extendedprice"), 2).alias("sum_base"), F.count("*").alias("n"))
    )


@register("dedup_minhash_ml", oracle=None)
def dedup_minhash_ml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3 via pyspark.ml MinHashLSH (HashingTF term vectors →
    approxSimilarityJoin) — the library counterpart of the hand-rolled
    md5 MinHash pipeline (dedup_minhash). Rows-only: the ml hash family
    is seeded differently from any SQL oracle could replicate; recall
    against the exact pipeline is asserted in tests.

    DIAGNOSTIC, DENSITY-GUARDED (NOTES r6): MLlib's MinHashLSH has no
    AND-amplification — each of the 4 hash tables is a single MinHash
    (r=1), so P(candidate | j) = 1-(1-j)⁴ ≈ 4j even for unrelated docs
    sharing vocabulary. On a high-overlap corpus approxSimilarityJoin's
    candidate join approaches all-pairs (measured: exhausted ~80 GB of
    shuffle at 10× bench scale before dying). The guard estimates the
    bucket-pair count in one O(corpus) pass over the hashed keys (the
    interval_join density-estimator technique, temporal.py) and, past
    MAX_ML_CANDIDATES, deterministically thins docs by
    xxhash64(doc_id) % k — candidates shrink ~k², parity diagnostics
    stay valid on the sample. The PRODUCTION near-dup path is
    dedup_minhash / dedup_minhash_fast (banded r≥2 AND-amplification,
    no explosion by construction)."""
    from pyspark.ml.feature import HashingTF, MinHashLSH
    from pyspark.ml.functions import vector_to_array

    from .sources.tables import spread

    MAX_ML_CANDIDATES = 2_000_000
    d = spread(_t(spark, sf_dir, "documents"))
    # null-text docs have no tokens to hash (HashingTF throws on null
    # arrays) and nothing to dedup -- drop them at the boundary
    tokens = d.filter(F.col("text").isNotNull()).select(
        "doc_id", F.split(F.lower("text"), " ").alias("tokens")
    )
    tf = HashingTF(inputCol="tokens", outputCol="features", numFeatures=1 << 18)
    feats = tf.transform(tokens)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=4, seed=42)
    model = lsh.fit(feats)
    est_row = (
        model.transform(feats)
        .select(F.posexplode("hashes").alias("t", "h"))
        .select("t", vector_to_array(F.col("h"))[0].alias("hv"))
        .groupBy("t", "hv")
        .count()
        .agg(F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("est"))
        .first()
    )
    est = int(est_row["est"] or 0)
    if est > MAX_ML_CANDIDATES:
        import math

        k = math.ceil(math.sqrt(est / MAX_ML_CANDIDATES))
        feats = feats.filter(F.pmod(F.xxhash64("doc_id"), F.lit(k)) == 0)
    # distance threshold 0.35 ⇒ token-set jaccard ≥ 0.65; the corpus's
    # small shared vocabulary makes looser thresholds explode into
    # ~all-pairs output.
    pairs = model.approxSimilarityJoin(feats, feats, 0.35, distCol="jaccard_dist")
    return (
        pairs.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_id_a"),
            F.col("datasetB.doc_id").alias("doc_id_b"),
            F.round(1 - F.col("jaccard_dist"), 4).alias("jaccard"),
        )
    )


@register("knn_lsh_ml", oracle=None)
def knn_lsh_ml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 via pyspark.ml BucketedRandomProjectionLSH, ALL query vectors in
    ONE distributed job: approxSimilarityJoin band-joins the hashed query
    set against the hashed corpus (bucket-equality candidates, exact
    distance on candidates only), then a per-query window takes the top
    10. The earlier formulation looped approxNearestNeighbors over
    collect()ed queries — one Spark job and plan compilation PER query
    vector, a scale-killer for any real query set. Rows-only (seeded
    random projections); recall vs knn_bruteforce asserted in tests."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    emb = _t(spark, sf_dir, "embeddings")
    with_vec = emb.select("vec_id", array_to_vector(F.col("embedding")).alias("features"))
    corpus = with_vec.filter(F.col("vec_id") >= 5)
    queries = with_vec.filter(F.col("vec_id") < 5)
    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", bucketLength=0.5, numHashTables=4, seed=42
    )
    if corpus.limit(1).count() == 0:
        # MLlib fit requires >=1 row; empty corpus -> empty result
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, dist double"
        )
    model = lsh.fit(corpus)
    # Threshold is a post-candidate distance cut, not a candidate limit —
    # pass +inf-ish so the top-k window (not the cut) decides membership.
    pairs = model.approxSimilarityJoin(queries, corpus, float("1e18"), distCol="distCol")
    scored = pairs.select(
        F.col("datasetA.vec_id").alias("query_id"),
        F.col("datasetB.vec_id").alias("neighbor_id"),
        F.round(F.col("distCol"), 6).alias("dist"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("dist"), F.col("neighbor_id"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= 10)
        .drop("__rn")
    )


@register(
    "json_extract_props",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 90
    """,
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar JSON functions (the batch cousin of the envelope decode R3):
    extract a field from the events.props JSON string and filter on it.
    get_json_object is JVM-side Jackson — no Python in the loop."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return ev.select("event_id", k.alias("prop_k")).filter(F.col("prop_k") > 90)


@register(
    "skew_salted_agg",
    oracle="""
    SELECT event_type, count(*) AS n, CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_value
    FROM events GROUP BY event_type
    """,
)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-handling demo: events has only 5 event_type keys — a plain
    groupBy funnels the final combine into 5 reducer tasks; the salted
    two-stage version fans the first shuffle over 5×16 sub-keys and moves
    only 80 pre-aggregated rows in the second. Result is identical to the
    plain GROUP BY (the oracle)."""
    from .operators.skew import salted_agg

    out = salted_agg(
        _t(spark, sf_dir, "events"),
        keys=["event_type"],
        aggs={"n": ("count", "event_id"), "sum_value": ("sum", "value")},
        salt_buckets=16,
    )
    return out.select("event_type", "n", F.round("sum_value", 2).alias("sum_value"))


@register(
    "cdc_envelope_roundtrip",
    oracle=f"""
    {_CH},
    env AS (
        SELECT ev_offset,
               '{{"payload":{{"before":' ||
               CASE WHEN op IN ('u','d')
                    THEN '{{"order_id":' || CAST(user_id AS VARCHAR) ||
                         ',"invoice_number":' ||
                         CAST(CAST(round(val) AS BIGINT) AS VARCHAR) || '}}'
                    ELSE 'null' END ||
               ',"after":' ||
               CASE WHEN op IN ('c','u')
                    THEN '{{"order_id":' || CAST(user_id AS VARCHAR) ||
                         ',"invoice_number":' ||
                         CAST(CAST(round(val) AS BIGINT) AS VARCHAR) || '}}'
                    ELSE 'null' END ||
               ',"op":"' || op || '"}}}}' AS msg
        FROM ch
    ),
    parsed AS (
        SELECT ev_offset,
               CAST(json_extract_string(msg, '$.payload.before.order_id') AS BIGINT) AS b_k,
               CAST(json_extract_string(msg, '$.payload.after.order_id') AS BIGINT) AS a_k,
               CAST(json_extract_string(msg, '$.payload.after.invoice_number') AS BIGINT) AS a_v
        FROM env
    ),
    cl AS (
        SELECT ev_offset,
               CASE WHEN b_k IS NULL AND a_k IS NOT NULL THEN 'c'
                    WHEN b_k IS NOT NULL AND a_k IS NOT NULL THEN 'u'
                    WHEN b_k IS NOT NULL AND a_k IS NULL THEN 'd'
                    ELSE 't' END AS eop,
               coalesce(a_k, b_k) AS order_id,
               a_v
        FROM parsed
    ),
    live AS (
        SELECT cl.* FROM cl
        CROSS JOIN (SELECT coalesce(max(ev_offset), -1) AS t_off FROM cl WHERE eop = 't') ep
        WHERE cl.ev_offset > ep.t_off AND cl.eop <> 't'
    ),
    last AS (
        SELECT order_id,
               max_by(eop, ev_offset) AS last_op,
               max_by(a_v, ev_offset) AS invoice_number
        FROM live GROUP BY order_id
    )
    SELECT order_id, invoice_number FROM last WHERE last_op <> 'd'
    """,
)
def cdc_envelope_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL consumer path under the oracle gate: deterministic Debezium
    envelope JSON strings are built from the derived changelog, then parsed
    back with from_json over the declared schema (R3), classified by
    before/after null-ness (R5, the consumer's discriminator — the op field
    in the JSON is deliberately ignored, matching main.py:49-90), truncate-
    epoch filtered (R10) and collapsed (R11). Both engines construct
    byte-identical JSON and parse it with their own JSON machinery."""
    from .config import ChangeTableConfig
    from .operators.cdc import snapshot_from_envelopes
    from .sources.changelog import parse_envelopes

    ch = derive_changelog(_t(spark, sf_dir, "events"))
    k = F.col("user_id").cast("string")
    vi = F.round("val").cast("long").cast("string")
    row_json = F.concat(
        F.lit('{"order_id":'), k, F.lit(',"invoice_number":'), vi, F.lit("}")
    )
    before = F.when(F.col("op").isin("u", "d"), row_json).otherwise(F.lit("null"))
    after = F.when(F.col("op").isin("c", "u"), row_json).otherwise(F.lit("null"))
    msg = F.concat(
        F.lit('{"payload":{"before":'),
        before,
        F.lit(',"after":'),
        after,
        F.lit(',"op":"'),
        F.col("op"),
        F.lit('"}}'),
    )
    kafka_like = ch.select(
        F.col("ev_offset").alias("offset"),
        F.lit(0).cast("long").alias("timestamp"),
        msg.alias("value"),
    )
    cfg = ChangeTableConfig(
        name="invoice",
        key_columns=("order_id",),
        value_columns=("invoice_number",),
        order_columns=("offset",),
    )
    return snapshot_from_envelopes(parse_envelopes(kafka_like), cfg)


@register(
    "cdc_incremental_agg",
    oracle=f"""
    {_CH},
    live AS (
        SELECT ch.* FROM ch
        CROSS JOIN (SELECT coalesce(max(ev_offset), -1) AS t_off FROM ch WHERE op = 't') ep
        WHERE ch.ev_offset > ep.t_off AND ch.op <> 't'
    ),
    last AS (
        SELECT user_id,
               max_by(op, ev_offset) AS last_op,
               max_by(CAST(round(val) AS BIGINT), ev_offset) AS v
        FROM live GROUP BY user_id
    )
    SELECT CAST(coalesce(sum(v), 0) AS DOUBLE) AS sum_value,
           CAST(count(*) AS BIGINT) AS n_keys
    FROM last WHERE last_op <> 'd'
    """,
)
def cdc_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance (streaming materialized view)
    under the oracle gate: the changelog is replayed through the
    foreachBatch merge in TWO micro-batches with agg_col enabled, so the
    (sum, key-count) row is built purely from per-key deltas — upsert
    adds (new − old), delete subtracts old, truncate resets — across a
    batch boundary with truncates inside. The oracle recomputes the same
    aggregate directly from the collapsed snapshot: agreement proves the
    delta math exact (values are integers, so no float-order drift).
    Uses integer invoice values (round(val)) to keep both paths exact."""
    import tempfile

    from .config import ChangeTableConfig
    from .sources.changelog import parse_envelopes
    from .streaming.pipeline import _merge_parsed_batch, read_agg

    ch = derive_changelog(_t(spark, sf_dir, "events"))
    k = F.col("user_id").cast("string")
    vi = F.round("val").cast("long").cast("string")
    row_json = F.concat(
        F.lit('{"order_id":'), k, F.lit(',"invoice_number":'), vi, F.lit("}")
    )
    before = F.when(F.col("op").isin("u", "d"), row_json).otherwise(F.lit("null"))
    after = F.when(F.col("op").isin("c", "u"), row_json).otherwise(F.lit("null"))
    msg = F.concat(
        F.lit('{"payload":{"before":'),
        before,
        F.lit(',"after":'),
        after,
        F.lit(',"op":"'),
        F.col("op"),
        F.lit('"}}'),
    )
    kafka_like = ch.select(
        F.col("ev_offset").alias("offset"),
        F.lit(0).cast("long").alias("timestamp"),
        msg.alias("value"),
    )
    cfg = ChangeTableConfig(
        name="invoice",
        key_columns=("order_id",),
        value_columns=("invoice_number",),
        order_columns=("offset",),
    )
    mid = kafka_like.agg(F.expr("percentile(offset, 0.5)")).collect()[0][0] or 0
    parsed = parse_envelopes(kafka_like)
    state = tempfile.mkdtemp(prefix="cdc_inc_agg_")
    _merge_parsed_batch(parsed.filter(F.col("offset") <= mid), cfg, state, 0,
                        agg_col="invoice_number")
    _merge_parsed_batch(parsed.filter(F.col("offset") > mid), cfg, state, 1,
                        agg_col="invoice_number")
    agg = read_agg(spark, state)
    # empty changelog: no batch ever wrote an agg version -> the MV is the
    # empty-replica aggregate, matching the oracle's coalesce(sum, 0)/count
    sum_value = float(agg.sum_value) if agg else 0.0
    n_keys = int(agg.n_keys) if agg else 0
    return spark.createDataFrame(
        [(sum_value, n_keys)], "sum_value double, n_keys long"
    )


@register(
    "text_simhash",
    # 64-bit family: bits 1-32 = top bit of md5 hex digit i; bits 33-64 =
    # second bit (value & 4) of hex digit i-32 — one md5 per word serves
    # all 64 bits (mirrors operators/text.py::simhash_bits).
    oracle="""
    WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
    hx AS (SELECT doc_id, list_transform(ws, w -> md5(w)) AS hashed FROM w),
    bits AS (
        SELECT doc_id,
               list_aggregate(
                   list_transform(range(1, 65),
                       i -> CASE WHEN list_sum(list_transform(hashed,
                                h -> CASE WHEN (i <= 32 AND substr(h, CAST(i AS INT), 1)
                                          IN ('8','9','a','b','c','d','e','f'))
                                          OR (i > 32 AND substr(h, CAST(i - 32 AS INT), 1)
                                          IN ('4','5','6','7','c','d','e','f'))
                                     THEN 1 ELSE -1 END)) >= 0
                            THEN '1' ELSE '0' END),
                   'string_agg', '') AS simhash
        FROM hx
    )
    SELECT doc_id, simhash FROM bits
    """,
)
def text_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash document fingerprint (64-bit, md5-digit hash family; width
    rationale in simhash_bits) — the third near-dup scheme alongside
    MinHash-LSH and n-gram Jaccard. Bits are computed once per distinct
    word multiset on clone-heavy corpora (adaptive; see
    operators/text.py::simhash_docs — the fingerprint is a pure function
    of the multiset, so the output is identical either way)."""
    from .operators.text import simhash_docs

    return simhash_docs(_t(spark, sf_dir, "documents"))


@register(
    "dedup_simhash",
    # bits computed once per distinct word MULTISET (the simhash is a
    # pure function of it; word-shuffled clones share the multiset), and
    # hamming once per candidate — same oracle algebra as the factorized
    # minhash/clusters oracles (r6 lesson: oracles need the same scale
    # algebra as engines). sf1 check: 572 s → well under a minute.
    oracle="""
    WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
    keyed AS (SELECT doc_id,
                     md5(list_aggregate(list_sort(ws), 'string_agg', chr(0))) AS k
              FROM w),
    grp AS (SELECT k, any_value(ws) AS ws
            FROM keyed JOIN w USING (doc_id) GROUP BY k),
    hx AS (SELECT k, list_transform(ws, w -> md5(w)) AS hashed FROM grp),
    bits AS (
        SELECT k,
               list_aggregate(
                   list_transform(range(1, 65),
                       i -> CASE WHEN list_sum(list_transform(hashed,
                                h -> CASE WHEN (i <= 32 AND substr(h, CAST(i AS INT), 1)
                                          IN ('8','9','a','b','c','d','e','f'))
                                          OR (i > 32 AND substr(h, CAST(i - 32 AS INT), 1)
                                          IN ('4','5','6','7','c','d','e','f'))
                                     THEN 1 ELSE -1 END)) >= 0
                            THEN '1' ELSE '0' END),
                   'string_agg', '') AS simhash
        FROM hx
    ),
    docbits AS (SELECT doc_id, simhash FROM keyed JOIN bits USING (k)),
    banded AS (
        SELECT doc_id, simhash, unnest(range(0, 4)) AS band,
               substr(simhash, CAST(unnest(range(0, 4)) * 16 + 1 AS INT), 16) AS bv
        FROM docbits
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
               a.simhash AS sh_a, b.simhash AS sh_b
        FROM banded a JOIN banded b
          ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id
    ),
    scored AS (
        SELECT doc_id_a, doc_id_b,
               CAST(len(list_filter(range(1, 65),
                   i -> substr(sh_a, CAST(i AS INT), 1)
                        <> substr(sh_b, CAST(i AS INT), 1))) AS INT) AS hamming
        FROM cand
    )
    SELECT doc_id_a, doc_id_b, hamming FROM scored WHERE hamming <= 6
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs over the 64-bit fingerprint: 4 bands of 16
    bits block the candidates (bucket-pair pattern; pigeonhole guarantees
    recall for hamming < 4, LSH-probabilistic above), then exact
    hamming ≤ 6 verify. Width rationale (NOTES r6): at 32 bits the
    biased-bit corpus put 65% of docs into ONE 8-bit band bucket and 29%
    of ALL pairs under the threshold — both the candidate set and the
    TRUE OUTPUT were quadratic; at 64 bits the same threshold is a thin
    left-tail and band buckets are 65536-ary.

    FINGERPRINT-IDENTITY FACTORIZATION (third disease found by the 100×
    run, SCALE100 r7): the simhash is a pure function of the word
    multiset, so every word-shuffled clone shares the fingerprint —
    sf10's 24.8k-member clone group collided in all four bands and
    ground its ~307M hamming-0 pairs through single-task bucket
    explodes. Docs are therefore grouped by the fingerprint FIRST
    (16-byte groupBy, nearly free, no adaptivity needed): banding,
    bucketing and hamming verify run over one representative per
    distinct fingerprint, within-group pairs expand with hamming 0
    through the chunked bucket_pairs machinery, and cross-group rep
    pairs expand through membership. A distinct-fingerprint corpus
    degenerates to singleton groups and the identical rep-level
    pipeline.

    Verify path packs the 64 bits into two longs ONCE PER REP (map-side
    conv) so per-pair hamming is two xor+bit_count ops instead of a
    64-element string zip — same integer result the oracle computes
    from the strings."""
    from .operators.dedup import bucket_pairs

    base = text_simhash(spark, sf_dir)
    groups = base.groupBy("simhash").agg(
        F.min("doc_id").alias("__rid"), F.count("*").alias("__n")
    ).localCheckpoint(eager=False)
    rep = groups.select(F.col("__rid").alias("doc_id"), "simhash")
    sh = rep.select(
        "doc_id",
        F.conv(F.substring("simhash", 1, 32), 2, 10).cast("long").alias("h1"),
        F.conv(F.substring("simhash", 33, 32), 2, 10).cast("long").alias("h2"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.substring("simhash", b * 16 + 1, 16).alias("bv"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "h1", "h2", "bb.band", "bb.bv")
    buckets = (
        sh.groupBy("band", "bv")
        .agg(F.array_sort(F.collect_list(F.struct("doc_id", "h1", "h2"))).alias("ds"))
        .filter(F.size("ds") > 1)
    )
    # Two-stage explode (the bucket_pairs pattern, NOTES r6): one row per
    # (bucket, left index), then that row emits only its partners — peak
    # per-row memory O(bucket), never the O(bucket²) flattened pair array.
    # Rep-level buckets hold only DISTINCT fingerprints sharing 16 bits,
    # so the giant identical-fingerprint bucket cannot exist here.
    n = F.size(F.col("ds"))
    lefts = buckets.select("ds", F.explode(F.sequence(F.lit(0), n - 2)).alias("i"))
    partners = F.transform(
        F.sequence(F.col("i") + 1, F.size("ds") - 1),
        lambda j: F.element_at(F.col("ds"), (j + 1).cast("int")),
    )
    cand = (
        lefts.select(
            F.element_at(F.col("ds"), (F.col("i") + 1).cast("int")).alias("a"),
            F.explode(partners).alias("b"),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
            F.col("a.h1").alias("a1"),
            F.col("a.h2").alias("a2"),
            F.col("b.h1").alias("b1"),
            F.col("b.h2").alias("b2"),
        )
        .distinct()
    )
    rep_pairs = (
        cand.select(
            "doc_id_a",
            "doc_id_b",
            (
                F.bit_count(F.col("a1").bitwiseXOR(F.col("b1")))
                + F.bit_count(F.col("a2").bitwiseXOR(F.col("b2")))
            ).cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= 6)
    )
    mem = base.join(groups.select("simhash", "__rid"), "simhash").select(
        "__rid", "doc_id"
    )
    cross = (
        rep_pairs.join(
            mem.select(F.col("__rid").alias("doc_id_a"), F.col("doc_id").alias("__xa")),
            "doc_id_a",
        )
        .join(
            mem.select(F.col("__rid").alias("doc_id_b"), F.col("doc_id").alias("__xb")),
            "doc_id_b",
        )
        .select(
            F.least("__xa", "__xb").alias("doc_id_a"),
            F.greatest("__xa", "__xb").alias("doc_id_b"),
            "hamming",
        )
    )
    within = bucket_pairs(
        base.select("doc_id", F.lit(0).alias("band"), F.col("simhash").alias("bv")),
        dedup=False,  # one fingerprint group per doc: pairs already unique
    ).withColumn("hamming", F.lit(0).cast("int"))
    return cross.unionByName(within)


@register(
    "text_tokens_bpe",
    oracle=r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+'))
               AS INT) AS n_bpe_tokens,
           CAST(len(regexp_extract_all(lower(text), '[a-z]+')) AS INT) AS n_word_tokens
    FROM documents
    """,
)
def text_tokens_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish regex token counting (GPT-2-style pre-tokenizer shape:
    letter runs / digit runs / punctuation runs, each with optional leading
    space). The pattern sticks to constructs with identical semantics in
    Java regex (Spark) and RE2-ish (DuckDB)."""
    d = _t(spark, sf_dir, "documents")
    bpe = F.regexp_extract_all(
        F.col("text"), F.lit(" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"), F.lit(0)
    )
    word = F.regexp_extract_all(F.lower("text"), F.lit("[a-z]+"), F.lit(0))
    return d.select(
        "doc_id",
        F.size(bpe).alias("n_bpe_tokens"),
        F.size(word).alias("n_word_tokens"),
    )


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(round(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    headline=True,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style: the pure scan-bound query (all four predicates push
    to the parquet scan; zero shuffle beyond the 1-row final agg) — the
    bench's scan-path regression canary."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(_dsum(F.col("l_extendedprice") * F.col("l_discount"), 4).alias("revenue"))
    )


@register(
    "sql_subquery",
    oracle="""
    SELECT p.p_partkey, p.p_brand, round(p.p_retailprice, 2) AS price
    FROM part p
    WHERE p.p_retailprice > 1.05 * (
        SELECT avg(p2.p_retailprice) FROM part p2 WHERE p2.p_brand = p.p_brand)
    """,
)
def sql_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery through the SQL entry point (temp views +
    spark.sql): Catalyst decorrelates it into an aggregate + join — there
    is no per-row re-execution, which is exactly why the same text is safe
    at 100 TB. Also exercises the engine's SQL API surface."""
    _t(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(
        """
        SELECT p.p_partkey, p.p_brand, round(p.p_retailprice, 2) AS price
        FROM part p
        WHERE p.p_retailprice > 1.05 * (
            SELECT avg(p2.p_retailprice) FROM part p2 WHERE p2.p_brand = p.p_brand)
        """
    )


@register(
    "array_funcs",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           round(CAST(list_max(embedding) AS DOUBLE), 6) AS max_val,
           round(CAST(list_min(embedding) AS DOUBLE), 6) AS min_val,
           round(CAST(embedding[1] AS DOUBLE), 6) AS first_val,
           round(CAST(list_sum(list_transform(embedding[1:8],
                 x -> CAST(x AS DOUBLE))) AS DOUBLE), 6) AS head_sum,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_positive
    FROM embeddings
    """,
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array function library sample over the embedding column: size,
    min/max, subscript, slice-fold, filter-count — all JVM built-ins
    (the building blocks the vector ops compose from)."""
    e = _t(spark, sf_dir, "embeddings")
    head = F.slice(F.col("embedding"), 1, 8)
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.array_max("embedding").cast("double"), 6).alias("max_val"),
        F.round(F.array_min("embedding").cast("double"), 6).alias("min_val"),
        F.round(F.col("embedding")[0].cast("double"), 6).alias("first_val"),
        F.round(
            F.aggregate(head, F.lit(0.0), lambda a, x: a + x.cast("double")), 6
        ).alias("head_sum"),
        F.size(F.filter(F.col("embedding"), lambda x: x > 0)).alias("n_positive"),
    )


@register(
    "lateral_topk",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
    FROM customer c,
    LATERAL (SELECT o_orderkey, o_totalprice FROM orders
             WHERE o_custkey = c.c_custkey
             ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
    WHERE c.c_custkey <= 200
    """,
)
def lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (SQL API): each customer's top-2 orders
    by price. Catalyst decorrelates the per-row subquery into a
    window/rank over one orders shuffle — never an execute-per-row loop
    (the plan has exactly one join, pinned by the oracle agreeing with
    DuckDB's native LATERAL)."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer_v")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        FROM customer_v c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM orders_v
                 WHERE o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        WHERE c.c_custkey <= 200
        """
    )


@register(
    "grouping_sets_revenue",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_base,
           CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT)
               AS grp_id
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form rollup/cube desugar to)
    with grouping_id() disambiguating the NULL-as-total rows from genuine
    NULL keys — one Expand + single aggregation pass."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_v")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_base,
               CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT)
                   AS grp_id
        FROM lineitem_v
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


@register(
    "gap_fill_hours",
    oracle="""
    WITH b AS (
        SELECT user_id,
               epoch_ms(date_trunc('hour', ts)) AS hr_ms,
               count(*) AS n
        FROM events WHERE user_id <= 20 GROUP BY 1, 2
    ),
    spans AS (SELECT user_id, min(hr_ms) AS lo, max(hr_ms) AS hi FROM b GROUP BY user_id),
    grid AS (
        SELECT s.user_id, g.hr_ms
        FROM spans s,
        LATERAL (SELECT unnest(range(s.lo, s.hi + 1, 3600000)) AS hr_ms) g
    )
    SELECT grid.user_id, grid.hr_ms, coalesce(b.n, 0) AS n_events
    FROM grid LEFT JOIN b ON b.user_id = grid.user_id AND b.hr_ms = grid.hr_ms
    """,
)
def gap_fill_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling: per-user hourly event counts with MISSING
    HOURS materialized as zero rows (training pipelines need dense
    timelines for windowed features). The dense grid comes from
    sequence() + explode over each user's [min, max] span — generated
    distributedly next to the data, never a driver-side calendar; the
    left join back is one co-partitioned shuffle."""
    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("user_id") <= 20)
        .select("user_id", F.unix_millis(F.date_trunc("hour", F.col("ts"))).alias("hr_ms"))
    )
    counts = ev.groupBy("user_id", "hr_ms").agg(F.count("*").alias("n"))
    spans = counts.groupBy("user_id").agg(
        F.min("hr_ms").alias("lo"), F.max("hr_ms").alias("hi")
    )
    grid = spans.select(
        "user_id",
        F.explode(F.sequence(F.col("lo"), F.col("hi"), F.lit(3600000))).alias("hr_ms"),
    )
    return grid.join(counts, ["user_id", "hr_ms"], "left").select(
        "user_id", "hr_ms", F.coalesce(F.col("n"), F.lit(0)).alias("n_events")
    )


@register(
    "q4_order_priority",
    oracle="""
    SELECT o.o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
    GROUP BY o.o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-style: EXISTS subquery → left-semi join, then a tiny
    aggregation. The semi join build side carries only (orderkey,
    shipdate) — column pruning keeps the probe narrow."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-10-01 00:00:00").cast("timestamp_ntz"))
    )
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            l,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "q7_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
           CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-style: bidirectional nation-pair filter over a 6-table
    join; both nation dims broadcast, the disjunctive pair predicate
    applied after them so the big joins stay key-equi-joins."""
    s = _t(spark, sf_dir, "supplier")
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    return (
        s.join(l, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("n1_key") == F.col("s_nationkey"))
        .join(F.broadcast(n2), F.col("n2_key") == F.col("c_nationkey"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
                "revenue"
            )
        )
    )


@register(
    "q8_market_share",
    oracle="""
    WITH all_nations AS (
        SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
               l.l_extendedprice * (1 - l.l_discount) AS volume,
               n2.n_name AS supp_nation
        FROM part p
        JOIN lineitem l ON l.l_partkey = p.p_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
        JOIN region r   ON r.r_regionkey = n1.n_regionkey
        JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
        WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    SELECT o_year,
           round(CAST(sum(CAST(CASE WHEN supp_nation = 'NATION_3' THEN volume
                                    ELSE 0 END AS DECIMAL(18,4))) AS DOUBLE)
                 / CAST(sum(CAST(volume AS DECIMAL(18,4))) AS DOUBLE), 4) AS mkt_share
    FROM all_nations GROUP BY o_year
    """,
    headline=True,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-style national market share: 8-table star join (nation
    twice), conditional-sum ratio per order year. Plan shape: part is
    filtered THEN joined (the p_type predicate prunes the probe side
    before the fact shuffle), nation/region broadcast, the customer-side
    and supplier-side dims resolve via two independent broadcast joins —
    the only big shuffles are lineitem⋈orders and orders⋈customer.
    Both ratio legs sum in DECIMAL then cast to double (the _dsum
    pattern, unrounded): identical exact sums → identical ratio doubles.

    Built as ONE SQL statement over stable table views (r12, guide
    §7.3): the 7-op Column join chain re-paid an eager Catalyst
    analysis per op (~0.27 s of driver time per invocation at sf0.1;
    interleaved A/B build+exec 0.922 → 0.534 s). Same join order, same
    broadcast hints, bit-identity pinned in tests."""
    from .sources.tables import table_view

    names = {
        t: table_view(spark, t, sf_dir)
        for t in ("lineitem", "orders", "part", "customer", "supplier", "nation", "region")
    }
    return spark.sql(_Q8_SQL.format(**names))


# One-statement twin of the historical Column build (r12, guide §7.3;
# bit-identity pinned in tests): same join order, same broadcast hints
# on the two nation legs, same DECIMAL ratio legs.
_Q8_SQL = """
WITH n1 AS (SELECT n_nationkey AS cust_nkey FROM {nation} n
            JOIN {region} r ON n.n_regionkey = r.r_regionkey AND r.r_name = 'ASIA'),
n2 AS (SELECT n_nationkey AS supp_nkey, n_name AS supp_nation FROM {nation}),
base AS (
  SELECT /*+ BROADCAST(n1, n2) */
         cast(year(o.o_orderdate) AS bigint) AS o_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume,
         n2.supp_nation
  FROM {lineitem} l
  JOIN (SELECT * FROM {orders}
        WHERE o_orderdate >= TIMESTAMP_NTZ '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP_NTZ '1998-01-01 00:00:00') o
    ON o.o_orderkey = l.l_orderkey
  JOIN (SELECT p_partkey FROM {part} WHERE p_type = 'PROMO') p
    ON p.p_partkey = l.l_partkey
  JOIN {customer} c ON c.c_custkey = o.o_custkey
  JOIN n1 ON n1.cust_nkey = c.c_nationkey
  JOIN {supplier} s ON s.s_suppkey = l.l_suppkey
  JOIN n2 ON n2.supp_nkey = s.s_nationkey)
SELECT o_year,
       round(cast(sum(cast(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0.0D END AS decimal(18,4))) AS double)
             / cast(sum(cast(volume AS decimal(18,4))) AS double), 4) AS mkt_share
FROM base GROUP BY o_year
"""


@register(
    "q9_product_profit",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS profit
    FROM part p
    JOIN lineitem l ON l.l_partkey = p.p_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE contains(p.p_name, 'red')
    GROUP BY n.n_name, year(o.o_orderdate)
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-style product-type profit by nation and year. Adapted: the
    driver dataset has no partsupp table, so profit omits the
    ps_supplycost term (revenue only) — the join tree (part-filtered fact
    scan, supplier→nation broadcast chain, group by nation × year) is the
    Q9 shape. The p_name substring filter ('red' — this corpus's color vocabulary) cannot push to parquet as a
    range, but it still prunes before the first shuffle."""
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").contains("red"))
        .select("p_partkey")
    )
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey"), F.col("n_name").alias("nation")
    )
    return (
        l.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy("nation", F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
                "profit"
            )
        )
    )


@register(
    "q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
    headline=True,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-style returned-item ranking: filtered fact joins, revenue
    aggregate per customer, top-20 (TakeOrderedAndProject, never a full
    sort). Both filters (returnflag on lineitem, date range on orders)
    push to their parquet scans before any shuffle. ONE SQL statement
    (r12, guide §7.3; bit-identity pinned in tests)."""
    from .sources.tables import table_view

    names = {
        t: table_view(spark, t, sf_dir)
        for t in ("customer", "orders", "lineitem", "nation")
    }
    return spark.sql(_Q10_SQL.format(**names))


_Q10_SQL = """
SELECT /*+ BROADCAST(n) */ c.c_custkey, c.c_name, n.n_name,
       cast(round(sum(cast(l.l_extendedprice * (1 - l.l_discount) AS decimal(18,4))), 2) AS double) AS revenue
FROM (SELECT * FROM {lineitem} WHERE l_returnflag = 'R') l
JOIN (SELECT * FROM {orders}
      WHERE o_orderdate >= TIMESTAMP_NTZ '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP_NTZ '1996-07-01 00:00:00') o
  ON o.o_orderkey = l.l_orderkey
JOIN {customer} c ON c.c_custkey = o.o_custkey
JOIN {nation} n ON n.n_nationkey = c.c_nationkey
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c_custkey LIMIT 20
"""


@register(
    "q14_promo_revenue",
    oracle="""
    SELECT round(100.0 * CAST(sum(CAST(CASE WHEN p.p_type = 'PROMO'
                                  THEN l.l_extendedprice * (1 - l.l_discount)
                                  ELSE 0 END AS DECIMAL(18,4))) AS DOUBLE)
                 / CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                                 AS DECIMAL(18,4))) AS DOUBLE), 4) AS promo_pct
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-style promo revenue share: date-pruned fact scan joined
    to part, one conditional-sum ratio — a single-row global aggregate
    (partial aggregation leaves one row per task before the 1-row final
    reduce)."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp_ntz"))
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0)
    return (
        l.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(promo.cast("decimal(18,4)")).cast("double")
                / F.sum(rev.cast("decimal(18,4)")).cast("double"),
                4,
            ).alias("promo_pct")
        )
    )


@register(
    "q13_customer_distribution",
    oracle="""
    WITH c_orders AS (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey
    )
    SELECT c_count, count(*) AS custdist
    FROM c_orders GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-style customer order-count distribution: LEFT join keeps
    zero-order customers (count(o_orderkey) ignores the null-extended
    rows), then a second aggregation histograms the counts. Two shuffles
    total: custkey, then c_count — the second input is already one row
    per customer."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-style top supplier: quarterly revenue per supplier, keep
    the max (ties included — the scalar max is a 1-row broadcast joined
    back, never a driver round-trip or a sort of the whole aggregate)."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp_ntz"))
    )
    rev = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
            "total_revenue"
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("__mx"))
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("__mx"))
        .join(s, F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q17_small_quantity",
    oracle="""
    SELECT round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1'
      AND l.l_quantity < (
          SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
          WHERE l2.l_partkey = l.l_partkey)
    """,
)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-style small-quantity-order revenue: the correlated
    per-part average decorrelates into a groupBy(l_partkey) aggregate
    joined back to the fact — one extra key-shuffle instead of a
    re-executed subquery per row. The brand filter prunes the part probe
    side before both joins."""
    l = _t(spark, sf_dir, "lineitem")
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#1")
        .select("p_partkey")
    )
    avg_q = l.groupBy(F.col("l_partkey").alias("avg_pk")).agg(
        (0.2 * F.avg("l_quantity")).alias("qty_cut")
    )
    return (
        l.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(avg_q, F.col("avg_pk") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg(F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double") / 7.0, 2).alias("avg_yearly"))
    )


@register(
    "q18_large_volume_customer",
    oracle="""
    WITH big AS (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        HAVING sum(l_quantity) > 150
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice,
           round(sum(l.l_quantity), 2) AS total_qty
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 50
    """,
)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-style large-volume customers: group-by-HAVING subquery as
    a semi join (the big-order key set), then the detail join + re-agg and
    a top-50 TakeOrderedAndProject. The qualifying key set is aggregated
    BEFORE any wide join — the fact table is scanned twice but shuffled
    on the same key both times."""
    l = _t(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__q"))
        .filter(F.col("__q") > 150)
        .select("l_orderkey")
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        l.join(big.withColumnRenamed("l_orderkey", "big_key"),
               F.col("big_key") == F.col("l_orderkey"), "left_semi")
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(50)
    )


@register(
    "map_funcs",
    oracle="""
    SELECT event_id,
           CAST(len(json_keys(props)) AS INT) AS n_keys,
           array_to_string(list_sort(json_keys(props)), ',') AS keys_csv,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
    FROM events
    """,
)
def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType function coverage: JSON props parsed into a real
    map<string,string> column (from_json), then map_keys/size/element_at —
    the typed-map counterpart of the string-path json_extract_props. Keys
    are emitted SORTED (map iteration order is never part of a
    correctness contract)."""
    m = F.from_json(F.col("props"), "map<string,string>")
    return _t(spark, sf_dir, "events").select(
        "event_id",
        F.size(m).alias("n_keys"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_csv"),
        F.element_at(m, "k").cast("long").alias("k_val"),
    )


@register(
    "window_lead_lag",
    oracle="""
    SELECT event_id, user_id,
           lag(round(value, 2)) OVER w AS prev_value,
           lead(round(value, 2)) OVER w AS next_value,
           CAST(rank() OVER (PARTITION BY user_id ORDER BY round(value, 2) DESC,
                             event_id) AS BIGINT) AS value_rank,
           CAST(ntile(4) OVER w AS INT) AS quartile
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
    """,
)
def window_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function breadth: lag/lead over each user's event sequence,
    rank by value, ntile quartiles — one shuffle on user_id serves all
    four (two sort orders within the partition). Ordering keys are made
    total with the unique event_id so every function is deterministic."""
    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", F.round("value", 2).alias("v")
    )
    w = Window.partitionBy("user_id").orderBy("event_id")
    wr = Window.partitionBy("user_id").orderBy(F.col("v").desc(), F.col("event_id"))
    return ev.select(
        "event_id",
        "user_id",
        F.lag("v").over(w).alias("prev_value"),
        F.lead("v").over(w).alias("next_value"),
        F.rank().over(wr).cast("long").alias("value_rank"),
        F.ntile(4).over(w).alias("quartile"),
    )


@register(
    "q19_disjunctive_filters",
    oracle="""
    SELECT CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-style disjunctive mixed-table predicate: three OR'd
    brand/size/quantity branches spanning both join sides. Catalyst's CNF
    conversion extracts the single-side implications — the part scan gets
    (brand IN ...) AND (size <= 15), the lineitem scan gets quantity
    bounds — so both sides prune BEFORE the join even though no single
    branch is separable."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = l.join(p, F.col("p_partkey") == F.col("l_partkey"))
    b = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, smax)
        & F.col("l_quantity").between(qlo, qhi)
    )
    return (
        j.filter(b("Brand#1", 5, 1, 11) | b("Brand#2", 10, 10, 20) | b("Brand#3", 15, 20, 30))
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
                "revenue"
            )
        )
    )


@register(
    "q22_idle_customers",
    oracle="""
    WITH avg_bal AS (SELECT avg(c_acctbal) AS a FROM customer WHERE c_acctbal > 0)
    SELECT c.c_nationkey, count(*) AS numcust, CAST(round(sum(CAST(c.c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE) AS totacctbal
    FROM customer c CROSS JOIN avg_bal
    WHERE c.c_acctbal > avg_bal.a
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY c.c_nationkey
    """,
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-style sales-opportunity: above-average-balance customers
    with no RECENT orders (none since 2000), grouped by nation. The
    scalar average is a 1-row broadcast (never a per-row subquery); the
    NOT EXISTS is a left_anti join — at scale its build side is the
    date-filtered DISTINCT custkey projection, not the orders table."""
    c = _t(spark, sf_dir, "customer")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("__a"))
    o_keys = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp_ntz"))
        .select("o_custkey")
        .distinct()
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__a"))
        .join(o_keys, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            _dsum(F.col("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@register(
    "pivot_event_counts",
    oracle="""
    SELECT user_id,
           count(*) FILTER (WHERE event_type = 'click')    AS click,
           count(*) FILTER (WHERE event_type = 'error')    AS error,
           count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           count(*) FILTER (WHERE event_type = 'signup')   AS signup,
           count(*) FILTER (WHERE event_type = 'view')     AS "view"
    FROM events GROUP BY user_id
    """,
)
def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per-user counts of each event type as columns. An explicit
    value list keeps the plan single-pass (no extra distinct job to
    discover pivot values — the thing to never do at 100 TB)."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .count()
        .na.fill(0, ["click", "error", "purchase", "signup", "view"])
    )


@register(
    "knn_bruteforce_pandas",
    # Same oracle as knn_bruteforce: both engine paths compute exact cosine
    # top-k with identical round(...,6) and (cos desc, neighbor_id) tie-break,
    # so the SQL oracle is shared verbatim.
    oracle="""
    WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
    c AS (SELECT vec_id AS neighbor_id, v AS cv FROM e WHERE vec_id >= 5),
    scored AS (
        SELECT query_id, neighbor_id,
               round(list_dot_product(qv, cv)
                     / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))),
                     6) AS cos_sim
        FROM q CROSS JOIN c
    ),
    r AS (SELECT *, CAST(row_number() OVER (
              PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS nn_rank
          FROM scored)
    SELECT query_id, neighbor_id, nn_rank, cos_sim FROM r WHERE nn_rank <= 10
    """,
    headline=True,
)
def knn_bruteforce_pandas_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 exact top-k via Arrow-batched numpy matmul (the pandas-UDF
    counterpart of knn_bruteforce; same semantics, different engine path).
    Oracle-checked: identical rounding and tie-breaks to knn_bruteforce,
    so the same DuckDB SQL verifies both engine paths; exact agreement
    with the expression version is additionally asserted in tests."""
    from .operators.similarity import knn_bruteforce_pandas
    from .sources.tables import spread

    emb = _t(spark, sf_dir, "embeddings")
    res = knn_bruteforce_pandas(
        spread(emb.filter(F.col("vec_id") >= 5)), emb.filter(F.col("vec_id") < 5), k=10
    )
    return res.select(
        "query_id", "neighbor_id", F.col("rank").cast("long").alias("nn_rank"), "cos_sim"
    )


@register(
    "dedup_clusters",
    # Factorized closure (NOTES r6): jaccard is a function of the word
    # SET and blocking is per source, so docs sharing (source, set) are
    # interchangeable — the clone-clique edges that made the naive
    # transitive closure quadratic per clique (a 28-minute grinder at
    # 10x bench scale) collapse to group membership. The recursive CTE
    # walks the REPRESENTATIVE graph only; cluster_id = min reachable
    # rep id = min doc id of the component (each rid is its group's
    # min). Membership: a doc pairs iff its group has >= 2 members
    # (within-group jaccard is exactly 1.0) or its rep has a cross
    # edge. Identical output to the unfactorized closure.
    oracle="""
    WITH RECURSIVE w AS (SELECT doc_id, source, list_distinct(string_split(lower(text), ' ')) AS ws
               FROM documents),
    keyed AS (SELECT doc_id, source, ws,
                     md5(source || chr(1) ||
                         list_aggregate(list_sort(ws), 'string_agg', chr(0))) AS k
              FROM w),
    grp AS (SELECT k, min(doc_id) AS rid, count(*) AS n,
                   any_value(source) AS source, any_value(ws) AS ws
            FROM keyed GROUP BY k),
    rep_pairs AS (
        SELECT a.rid AS pa, b.rid AS pb
        FROM grp a JOIN grp b ON a.source = b.source AND a.rid < b.rid
        -- length-ratio prune (implied by jaccard >= 0.95) mirrors the
        -- engine's O(1) candidate filter
        WHERE len(a.ws) >= 0.95 * len(b.ws) AND len(b.ws) >= 0.95 * len(a.ws)
          AND round(len(list_intersect(a.ws, b.ws)) * 1.0
                    / len(list_distinct(list_concat(a.ws, b.ws))), 4) >= 0.95
    ),
    edges AS (SELECT pa AS a, pb AS b FROM rep_pairs
              UNION SELECT pb, pa FROM rep_pairs),
    reach AS (
        SELECT a, b FROM edges
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ),
    rep_label AS (SELECT a AS rid, least(a, min(b)) AS rc
                  FROM reach GROUP BY a)
    SELECT kk.doc_id, coalesce(rl.rc, g.rid) AS cluster_id
    FROM keyed kk
    JOIN grp g ON g.k = kk.k
    LEFT JOIN rep_label rl ON rl.rid = g.rid
    WHERE rl.rid IS NOT NULL OR g.n >= 2
    """,
)
def dedup_clusters_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup completion: near-dup pairs (blocked jaccard ≥ 0.95) →
    connected components → canonical representative (min doc id) per
    cluster. Since r7 the ENGINE walks the same (source, word-set)
    representative graph as the oracle when the adaptive decision says
    the corpus is clone-heavy (ngram_jaccard_clusters): label
    propagation over clone-clique edges is quadratic per clique (~760M
    directed edges at 100× bench scale), while the rep graph is ~4k
    nodes expanded through group membership. Distinct-set corpora keep
    the direct pairs → label-propagation path."""
    from .operators.dedup import ngram_jaccard_clusters

    return ngram_jaccard_clusters(_t(spark, sf_dir, "documents"), threshold=0.95)


@register(
    "asof_join_signup",
    headline=True,
    oracle="""
    WITH su AS (
        SELECT user_id, epoch_ms(ts) AS s_ms
        FROM events WHERE event_type = 'signup'
    ),
    su_d AS (SELECT user_id, s_ms FROM su GROUP BY user_id, s_ms),
    ev AS (
        SELECT event_id, user_id, epoch_ms(ts) AS e_ms
        FROM events WHERE event_type <> 'signup'
    )
    SELECT ev.event_id, ev.user_id,
           su_d.s_ms AS asof_signup_ms,
           ev.e_ms - su_d.s_ms AS ms_since_signup
    FROM ev ASOF LEFT JOIN su_d
      ON ev.user_id = su_d.user_id AND ev.e_ms > su_d.s_ms
    """,
)
def asof_join_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each non-signup event matched to the user's most recent
    STRICTLY-earlier signup. The oracle is DuckDB's native ASOF JOIN —
    cross-validating the union+carry-forward composition against a real
    as-of implementation."""
    from .operators.temporal import asof_join

    ev = _t(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") != "signup").select(
        "event_id", "user_id", F.col("ts_ms").alias("e_ms")
    )
    right = ev.filter(F.col("event_type") == "signup").select(
        "user_id", F.col("ts_ms").alias("e_ms"), F.col("ts_ms").alias("s_ms")
    )
    out = asof_join(left, right, key="user_id", ts="e_ms", right_cols=["s_ms"], strict=True)
    return out.select(
        "event_id",
        "user_id",
        F.col("asof_s_ms").alias("asof_signup_ms"),
        (F.col("e_ms") - F.col("asof_s_ms")).alias("ms_since_signup"),
    )


@register(
    "range_join_activity",
    oracle="""
    WITH su AS (
        SELECT event_id AS signup_id, user_id, epoch_ms(ts) AS s_ms
        FROM events WHERE event_type = 'signup'
    ),
    ev AS (SELECT user_id AS ek, epoch_ms(ts) AS e_ms FROM events)
    SELECT su.signup_id, su.user_id, su.s_ms,
           CAST(count(*) FILTER (WHERE ev.e_ms > su.s_ms
                                   AND ev.e_ms <= su.s_ms + 3600000) AS BIGINT)
               AS n_in_range
    FROM su LEFT JOIN ev ON ev.ek = su.user_id
    GROUP BY su.signup_id, su.user_id, su.s_ms
    """,
)
def range_join_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: per signup, count same-user events in the following
    hour — equi-hash-join on user anchors the plan, the time range is a
    filter, the count a partial-aggregated groupBy."""
    from .operators.temporal import range_join_count

    ev = _t(spark, sf_dir, "events")
    su = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"), "user_id", F.col("ts_ms").alias("s_ms")
    )
    return range_join_count(
        su,
        ev.select("user_id", "ts_ms"),
        key="user_id",
        anchor_ts="s_ms",
        event_ts="ts_ms",
        lo_offset=0,
        hi_offset=3_600_000,
        anchor_id="signup_id",
    )


@register(
    "stats_agg",
    oracle="""
    SELECT event_type,
           round(stddev_samp(value), 4) AS sd_value,
           round(var_samp(value), 4)    AS var_value,
           round(corr(value, CAST(user_id AS DOUBLE)), 4) AS corr_value_user,
           round(covar_pop(value, CAST(user_id AS DOUBLE)), 4) AS covar_value_user
    FROM events GROUP BY event_type
    """,
)
def stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate library: stddev/variance/corr/covar/skewness —
    all single-pass algebraic aggregates with map-side partials."""
    ev = _t(spark, sf_dir, "events")
    u = F.col("user_id").cast("double")
    return ev.groupBy("event_type").agg(
        F.round(F.stddev_samp("value"), 4).alias("sd_value"),
        F.round(F.var_samp("value"), 4).alias("var_value"),
        F.round(F.corr(F.col("value"), u), 4).alias("corr_value_user"),
        F.round(F.covar_pop(F.col("value"), u), 4).alias("covar_value_user"),
        # NB: skewness/kurtosis deliberately excluded from the oracle
        # contract - Spark reports population (g1) while DuckDB reports
        # bias-corrected sample (G1) skewness; same data, different
        # estimator. They are available via F.skewness/F.kurtosis.
    )


@register(
    "percentiles_value",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.25), 4) AS p25,
           round(quantile_cont(value, 0.50), 4) AS p50,
           round(quantile_cont(value, 0.75), 4) AS p75,
           round(quantile_cont(value, 0.99), 4) AS p99
    FROM events GROUP BY event_type
    """,
)
def percentiles_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT continuous percentiles (linear interpolation — identical
    definition in both engines). Exact percentile sorts per group; the
    approximate path for 100 TB is approx_percentiles below."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.25)), 4).alias("p25"),
        F.round(F.percentile("value", F.lit(0.50)), 4).alias("p50"),
        F.round(F.percentile("value", F.lit(0.75)), 4).alias("p75"),
        F.round(F.percentile("value", F.lit(0.99)), 4).alias("p99"),
    )


@register(
    "approx_percentiles",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.50), 4) AS p50_exact,
           TRUE AS ok50, TRUE AS ok99
    FROM events GROUP BY event_type
    """,
)
def approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles via percentile_approx (KLL-like sketch,
    mergeable → map-side partials; the scale path where exact percentile's
    per-group sort is unaffordable). Sketch outputs are engine-specific,
    so the raw estimate is not oracle-comparable; the query emits the
    exact p50 (hash-checked) plus rank-window booleans: the sketch's
    guarantee at accuracy=1000 is rank error ≤ 0.001·n, so the returned
    value must lie between the exact quantiles at q ± 0.005 (5× the
    guarantee — robust to ties) — assertable by the oracle as literals."""
    ev = _t(spark, sf_dir, "events")
    q = ev.groupBy("event_type").agg(
        F.round(F.percentile_approx("value", F.lit(0.5), F.lit(1000)), 4).alias("ap50"),
        F.round(F.percentile_approx("value", F.lit(0.99), F.lit(1000)), 4).alias("ap99"),
        F.round(F.percentile("value", F.lit(0.5)), 4).alias("p50_exact"),
        F.percentile("value", F.lit(0.495)).alias("lo50"),
        F.percentile("value", F.lit(0.505)).alias("hi50"),
        F.percentile("value", F.lit(0.985)).alias("lo99"),
        F.percentile("value", F.lit(0.995)).alias("hi99"),
    )
    eps = F.lit(1e-4)  # round(...,4) slack on the sketch output
    return q.select(
        "event_type",
        "p50_exact",
        ((F.col("ap50") >= F.col("lo50") - eps) & (F.col("ap50") <= F.col("hi50") + eps)).alias("ok50"),
        ((F.col("ap99") >= F.col("lo99") - eps) & (F.col("ap99") <= F.col("hi99") + eps)).alias("ok99"),
    )


@register(
    "quality_outliers",
    oracle=r"""
    WITH tok AS (SELECT doc_id,
                        CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
                            AS n_tokens
                 FROM documents),
    med AS (SELECT quantile_cont(n_tokens, 0.5) AS med FROM tok),
    mad AS (SELECT quantile_cont(abs(n_tokens - med), 0.5) AS mad FROM tok, med)
    SELECT doc_id, n_tokens,
           abs(n_tokens - med) > 3 * 1.4826 * mad AS is_outlier
    FROM tok, med, mad
    """,
    headline=True,
)
def quality_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust length-outlier flagging for curation: |tokens − median| >
    3·1.4826·MAD (the MAD-consistent sigma) marks docs whose length is
    anomalous under a robust scale estimate — unlike mean/std, one batch
    of pathological docs can't drag the threshold.

    Plan: token counts are map-only; the median and the MAD are two
    successive 1-row aggregates broadcast back over the corpus — two tiny
    shuffles and two broadcast joins regardless of corpus size (MAD needs
    the median first, so two passes is the honest minimum without a
    sketch; the approximate path would reuse percentile_approx). The
    (doc_id, n_tokens) frame is STAGED once: without it each of the three
    consumers re-reads the text column and re-tokenizes — three scans of
    the corpus's heaviest column instead of one plus two int-pair
    passes."""
    from .operators import text as T

    d = _t(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", T.token_count(F.col("text")).cast("long").alias("n_tokens")
    ).localCheckpoint(eager=False)
    med = tok.agg(F.percentile("n_tokens", F.lit(0.5)).alias("med"))
    with_med = tok.crossJoin(F.broadcast(med))
    mad = with_med.agg(
        F.percentile(F.abs(F.col("n_tokens") - F.col("med")), F.lit(0.5)).alias("mad")
    )
    return with_med.crossJoin(F.broadcast(mad)).select(
        "doc_id",
        "n_tokens",
        (
            F.abs(F.col("n_tokens") - F.col("med"))
            > F.lit(3) * F.lit(1.4826) * F.col("mad")
        ).alias("is_outlier"),
    )


def _ref_kmeans_setup(con) -> None:
    from .functions.ref_oracle import setup_embedding_kmeans

    setup_embedding_kmeans(con)


@register(
    "embedding_kmeans",
    # Full expected summary registered by the seeded-numpy reference
    # (functions/ref_oracle.py::setup_embedding_kmeans); the driver's
    # vanilla gate records this entry rows-only.
    oracle="""
    SELECT cluster_id, n_vecs, avg_cos_to_centroid
    FROM ref_embedding_kmeans ORDER BY cluster_id
    """,
    oracle_setup=_ref_kmeans_setup,
)
def embedding_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus clustering summary (domain discovery): seeded numpy-Lloyd
    centroids + map-only nearest-centroid assignment, aggregated to one
    row per cluster. Hash-checked since r7: training is driver-side
    seeded numpy (parity by construction), and the per-cluster mean
    cosine accumulates in EXACT decimal space (order-free sums — the
    former F.avg double fold was the one blocker keeping this entry
    rows-only). Determinism under a fixed seed and full corpus coverage
    are additionally pinned in tests."""
    from .operators.similarity import kmeans_cluster_summary

    return kmeans_cluster_summary(
        _t(spark, sf_dir, "embeddings"), n_clusters=8, seed=42
    )


_STRATA = {"click": 0.5, "error": 1.0, "purchase": 0.1, "signup": 0.0, "view": 0.25}
_STRATA_MOD = 1 << 20  # hash-space granularity for the keep thresholds


@register(
    "sample_stratified",
    # same hash rule in SQL via the xx64 Python UDF (_xx64_setup); the
    # driver's vanilla gate still records this entry rows-only
    oracle=f"""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_sampled
    FROM events
    WHERE (xx64(0, CAST(event_id AS VARCHAR)) % {_STRATA_MOD} + {_STRATA_MOD})
          % {_STRATA_MOD}
          < CASE event_type {' '.join(
              f"WHEN '{t}' THEN {int(f * _STRATA_MOD)}" for t, f in _STRATA.items()
          )} ELSE 0 END
    GROUP BY event_type
    """,
    oracle_setup=_xx64_setup,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified Bernoulli sample with per-event-type fractions, decided
    by a SEEDED HASH of the row id instead of an engine RNG — at 100 TB
    this is the sampling rule that survives production: the keep/drop
    decision is a pure function of the row, so it is reproducible across
    retries, repartitionings, engines, and incremental reruns (a row
    sampled today is sampled tomorrow), and two tables sampled by the
    same key stay JOINABLE. Spark's rand()/sampleBy is none of those —
    its draw depends on partition layout. Map-only: the hash predicate
    evaluates JVM-side per row (xxhash64 — no UDF, no shuffle before the
    tiny per-stratum count). Keep iff pmod(h, 2^20) < frac·2^20; strata
    with fraction 0 drop out entirely, fraction 1 keeps every row.
    Hash-checked since r5 via the pure-Python XXH64 DuckDB UDF (the r4
    sampleBy form was engine-specific by nature and rows-only)."""
    ev = _t(spark, sf_dir, "events")
    thresh = F.create_map(
        *[
            x
            for t, f in _STRATA.items()
            for x in (F.lit(t), F.lit(int(f * _STRATA_MOD)).cast("long"))
        ]
    )[F.col("event_type")]
    keep = (
        F.pmod(
            F.xxhash64(F.lit(0), F.col("event_id").cast("string")),
            F.lit(_STRATA_MOD),
        )
        < F.coalesce(thresh, F.lit(0))
    )
    return (
        ev.filter(keep)
        .groupBy("event_type")
        .agg(F.count("*").alias("n_sampled"))
    )


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH uc AS (SELECT l_partkey, l_suppkey, l_extendedprice / l_quantity AS cost
                FROM lineitem),
    mn AS (SELECT l_partkey, min(cost) AS mcost FROM uc GROUP BY l_partkey)
    SELECT DISTINCT p.p_partkey, uc.l_suppkey AS s_suppkey
    FROM part p
    JOIN mn ON mn.l_partkey = p.p_partkey
    JOIN uc ON uc.l_partkey = p.p_partkey AND uc.cost = mn.mcost
    WHERE p.p_size < 10
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-style: for each small part, the supplier(s) offering the
    minimum unit cost — the correlated-min pattern, planned as one
    grouped min + self-equality filter (window-free: the min is computed
    once per part and joined back, ties kept). Cross-engine equality of
    the min is exact because both engines derive it from identical IEEE
    divisions of identical stored doubles — no rounding before compare."""
    li = _t(spark, sf_dir, "lineitem")
    uc = li.select(
        "l_partkey",
        "l_suppkey",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("cost"),
    )
    mn = uc.groupBy("l_partkey").agg(F.min("cost").alias("mcost"))
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") < 10).select("p_partkey")
    return (
        p.join(mn, mn.l_partkey == F.col("p_partkey"))
        .join(
            uc.withColumnRenamed("l_partkey", "uc_partkey"),
            (F.col("uc_partkey") == F.col("p_partkey")) & (F.col("cost") == F.col("mcost")),
        )
        # NB: the cost itself stays OUT of the output — price/qty lands on
        # exact decimal-halfway points where Spark (shortest-decimal-string
        # HALF_UP) and DuckDB (binary-value rounding) round differently.
        # The min-cost SEMANTICS is still fully checked by which
        # (part, supplier) pairs match.
        .select("p_partkey", F.col("l_suppkey").alias("s_suppkey"))
        .distinct()
    )


@register(
    "dq_checks",
    oracle="""
    SELECT 'orders' AS tbl,
           count(*) AS n_rows,
           CAST(count(*) FILTER (WHERE o_orderkey IS NULL) AS BIGINT) AS n_null_key,
           CAST(count(*) FILTER (WHERE o_totalprice <= 0) AS BIGINT) AS n_nonpositive,
           CAST((SELECT count(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
               AS n_fk_orphans
    FROM orders
    """,
)
def dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality validation: null-rate, range, and referential-integrity
    checks emitted as one metrics row — the admission gate of a training-
    data pipeline. ONE plan, one job: the FK check is a left join against
    the (unique-key) dimension and the orphan count is a conditional
    aggregate over the unmatched rows — no separate .count() action (a
    driver round-trip per check would serialize the pipeline at scale)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select(F.col("c_custkey"))
    joined = o.join(c, o.o_custkey == c.c_custkey, "left")
    return joined.agg(
        F.lit("orders").alias("tbl"),
        F.count("*").alias("n_rows"),
        F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)).alias("n_null_key"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).alias("n_nonpositive"),
        F.sum(F.when(F.col("c_custkey").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_fk_orphans"),
    )


@register(
    "collect_values",
    oracle="""
    SELECT user_id,
           string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types_csv,
           CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
    FROM events GROUP BY user_id
    """,
)
def collect_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """List aggregation (collect_set) emitted as a SORTED joined string —
    deterministic across engines (raw collect_list order is partition-
    dependent and must never be part of a correctness contract)."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.array_join(F.array_sort(F.collect_set("event_type")), ",").alias("types_csv"),
            F.countDistinct("event_type").alias("n_types"),
        )
    )


@register(
    "join_full_outer",
    oracle="""
    WITH s AS (SELECT user_id, count(*) AS n_signup FROM events
               WHERE event_type = 'signup' GROUP BY user_id),
    e AS (SELECT user_id, count(*) AS n_error FROM events
          WHERE event_type = 'error' GROUP BY user_id)
    SELECT coalesce(s.user_id, e.user_id) AS user_id,
           coalesce(s.n_signup, 0) AS n_signup,
           coalesce(e.n_error, 0) AS n_error
    FROM s FULL OUTER JOIN e ON s.user_id = e.user_id
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two aggregates (users missing either side get
    zero-filled rows) — completes the join-type coverage
    (inner/left/semi/anti/cross/full)."""
    ev = _t(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_signup"))
        .withColumnRenamed("user_id", "s_uid")
    )
    e = (
        ev.filter(F.col("event_type") == "error")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_error"))
        .withColumnRenamed("user_id", "e_uid")
    )
    return s.join(e, s.s_uid == e.e_uid, "full_outer").select(
        F.coalesce(F.col("s_uid"), F.col("e_uid")).alias("user_id"),
        F.coalesce(F.col("n_signup"), F.lit(0)).alias("n_signup"),
        F.coalesce(F.col("n_error"), F.lit(0)).alias("n_error"),
    )


@register(
    "vec_normalize",
    oracle="""
    WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e)
    SELECT vec_id,
           round(nrm, 6) AS l2_norm,
           round(list_sum(list_transform(v, x -> x / nrm)), 6) AS unit_sum,
           CAST(len(list_filter(v, x -> abs(x) > 0.2)) AS INT) AS n_large
    FROM n
    """,
)
def vec_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector normalization metrics (training-data hygiene for embedding
    columns): L2 norm, the normalized-component sum, and an outlier-
    magnitude count — map-only expressions over the array column."""
    from .functions import as_double_array, dot

    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_array(F.col("embedding")).alias("v")
    )
    nrm = F.sqrt(dot(F.col("v"), F.col("v")))
    unit_sum = F.aggregate(
        F.col("v"), F.lit(0.0), lambda acc, x: acc + x / F.col("l2n")
    )
    return (
        e.withColumn("l2n", nrm)
        .select(
            "vec_id",
            F.round("l2n", 6).alias("l2_norm"),
            F.round(unit_sum, 6).alias("unit_sum"),
            F.size(F.filter(F.col("v"), lambda x: F.abs(x) > 0.2)).alias("n_large"),
        )
    )


@register(
    "grouped_zscore",
    oracle="""
    SELECT event_id, event_type,
           round((value - avg(value) OVER (PARTITION BY event_type))
                 / stddev_samp(value) OVER (PARTITION BY event_type), 4) AS z
    FROM events
    """,
)
def grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type z-score normalization, window formulation — the
    DEFAULT scale path. The per-type mean/stddev are window aggregates:
    one shuffle on event_type, rows stream through, and no group is ever
    materialized whole in one worker. This matters precisely when group
    cardinality is LOW (5 event types ⇒ each group is ~20% of the table
    — a grouped-map pandas version would hold that in one worker's
    memory; see grouped_zscore_pandas for that API-coverage variant)."""
    ev = _t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    w = Window.partitionBy("event_type")
    z = (F.col("value") - F.avg("value").over(w)) / F.stddev_samp("value").over(w)
    return ev.select("event_id", "event_type", F.round(z, 4).alias("z"))


@register(
    "grouped_zscore_pandas",
    oracle="""
    SELECT event_id, event_type,
           round((value - avg(value) OVER (PARTITION BY event_type))
                 / stddev_samp(value) OVER (PARTITION BY event_type), 4) AS z
    FROM events
    """,
)
def grouped_zscore_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas variant of grouped_zscore — API-coverage
    demo of the per-group pandas pattern (each group arrives as ONE pandas
    frame). Contract: group sizes must fit a single worker's memory; with
    low-cardinality keys like these 5 event types that is exactly what is
    violated at scale, so the window formulation (grouped_zscore) is the
    production path."""
    import pandas as pd

    ev = _t(spark, sf_dir, "events").select("event_id", "event_type", "value")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["value"].mean()
        sd = pdf["value"].std(ddof=1)
        out = pdf[["event_id", "event_type"]].copy()
        out["z"] = ((pdf["value"] - mu) / sd).round(4)
        return out

    return ev.groupBy("event_type").applyInPandas(
        zscore, "event_id long, event_type string, z double"
    )


@register(
    "udf_scalar_pandas",
    oracle="""
    SELECT event_id,
           round(1.0 / (1.0 + exp(-(value - 100.0) / 50.0)), 6) AS sigmoid_score
    FROM events
    """,
)
def udf_scalar_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar @pandas_udf (Arrow-vectorized series-to-series) — the user
    extension point the reference entirely lacks (SURVEY.md §2 'UDF/UDAF
    surface: none'). A built-in expression would beat it (and the oracle
    IS the built-in formula); the point is the registration surface."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def sigmoid(v: pd.Series) -> pd.Series:
        import numpy as np

        return (1.0 / (1.0 + np.exp(-(v - 100.0) / 50.0))).round(6)

    ev = _t(spark, sf_dir, "events")
    return ev.select("event_id", sigmoid(F.col("value")).alias("sigmoid_score"))


# ===========================================================================
# TPC-H completion: the five join shapes the q-series still lacked
# (Q11/Q12/Q16/Q20/Q21 analogues, adapted: the driver dataset has no
# partsupp and lineitem carries no shipmode/commit/receipt dates).
# ===========================================================================


@register(
    "q11_part_value_share",
    oracle="""
    WITH val AS (
        SELECT s.s_nationkey, l.l_partkey,
               sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4)))
                   AS value
        FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
        GROUP BY 1, 2
    ),
    tot AS (SELECT s_nationkey, sum(value) AS total,
                   CAST(count(*) AS BIGINT) AS n_parts FROM val GROUP BY 1)
    SELECT n.n_name AS nation, v.l_partkey AS partkey,
           CAST(round(v.value, 2) AS DOUBLE) AS value
    FROM val v
    JOIN tot t ON t.s_nationkey = v.s_nationkey
    JOIN nation n ON n.n_nationkey = v.s_nationkey
    WHERE v.value * t.n_parts > 3 * t.total
    """,
)
def q11_part_value_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-style: parts holding an outsized share of a nation's
    line-item value (Q11's HAVING sum > fraction * scalar-subquery total,
    adapted to lineitem value since there is no partsupp). The nation
    totals are a WINDOW sum over the (nationkey, partkey) aggregate — a
    groupBy + join-back would make Catalyst compute that aggregate (and
    scan the fact table) twice, since the DataFrame API has no CTE reuse.
    As planned: one fact scan, one aggregate shuffle, one narrow window
    repartition on nationkey. The threshold is RELATIVE — a part
    qualifies when its value exceeds 3x the nation's average part value
    (value * n_parts > 3 * total, all-integer/decimal arithmetic) — so
    the qualifying fraction is stable at any scale factor, unlike a
    fixed share-of-total cutoff whose output empties as the part count
    grows. The value is
    summed as DECIMAL(18,4): decimal addition is associative, so the sum
    (and its round-to-cents) is identical across engines and shuffle
    orders — the double-sum last-ulp wobble that plagues round(sum) at
    half-cent boundaries cannot occur."""
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    val = (
        l.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_nationkey", "l_partkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
            ).alias("value")
        )
    )
    w = Window.partitionBy("s_nationkey")
    return (
        val.withColumn("total", F.sum("value").over(w))
        .withColumn("n_parts", F.count("*").over(w))
        .filter(F.col("value") * F.col("n_parts") > 3 * F.col("total"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .select(
            "nation",
            F.col("l_partkey").alias("partkey"),
            F.round("value", 2).cast("double").alias("value"),
        )
    )


@register(
    "q12_late_priority",
    oracle="""
    SELECT l.l_linestatus AS linestatus,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    GROUP BY 1
    """,
)
def q12_late_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-style: late shipments (shipped > 60 days after order)
    split into high/low-priority counts per linestatus (linestatus stands
    in for the absent shipmode). The priority CASE is a conditional
    aggregate — one pass, no second join; the late predicate compares two
    NTZ timestamps so it is session-timezone-free on both engines."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority", "o_orderdate")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy(F.col("l_linestatus").alias("linestatus"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
    )


@register(
    "q16_supplier_cnt",
    oracle="""
    SELECT p.p_brand AS brand, p.p_type AS type, p.p_size AS size,
           CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#1' AND p.p_size < 25
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    """,
)
def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-style: distinct suppliers per (brand, type, size) for
    qualifying parts, excluding 'complaint' suppliers (negative acctbal
    stands in for the comment-string filter). The NOT IN subquery is a
    broadcast LEFT ANTI join — the exclusion list is tiny and never
    shuffles the fact side; count(DISTINCT) expands to the standard
    two-phase aggregate."""
    p = (
        _t(spark, sf_dir, "part")
        .filter((F.col("p_brand") != "Brand#1") & (F.col("p_size") < 25))
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    l = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        l.join(F.broadcast(bad), F.col("s_suppkey") == F.col("l_suppkey"), "left_anti")
        .join(p, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.col("p_type").alias("type"),
            F.col("p_size").alias("size"),
        )
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


@register(
    "q20_excess_quantity",
    oracle="""
    WITH pq AS (
        SELECT l.l_suppkey, l.l_partkey, sum(l.l_quantity) AS qty
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_name LIKE 'r%'
        GROUP BY 1, 2
    ),
    pavg AS (SELECT l_partkey, avg(qty) AS avg_qty FROM pq GROUP BY 1)
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
      AND s.s_suppkey IN (
          SELECT pq.l_suppkey FROM pq
          JOIN pavg ON pavg.l_partkey = pq.l_partkey
          WHERE pq.qty > 1.5 * pavg.avg_qty)
    """,
)
def q20_excess_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-style: suppliers in given nations who shipped an excess
    share of an 'r'-part (pair quantity > 1.5x that part's average pair
    quantity — availqty has no analogue here). The nested IN subqueries
    become a broadcast-joined aggregate + LEFT SEMI chain; l_quantity is
    integral, so the sums and the average are exact doubles and the
    threshold compare is engine-order-independent."""
    part_r = _t(spark, sf_dir, "part").filter(F.col("p_name").startswith("r")).select("p_partkey")
    l = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_quantity")
    pq = (
        l.join(F.broadcast(part_r), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    pavg = pq.groupBy("l_partkey").agg(F.avg("qty").alias("avg_qty")).withColumnRenamed(
        "l_partkey", "a_partkey"
    )
    excess = (
        pq.join(pavg, F.col("a_partkey") == F.col("l_partkey"))
        .filter(F.col("qty") > 1.5 * F.col("avg_qty"))
        .select("l_suppkey")
    )
    n = (
        _t(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3"))
        .select("n_nationkey")
    )
    s = _t(spark, sf_dir, "supplier")
    return (
        s.join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"), "left_semi")
        .join(excess, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
    WITH lo AS (
        SELECT l.l_orderkey, l.l_suppkey,
               max(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
                        THEN 1 ELSE 0 END) AS late
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey AND o.o_orderstatus = 'F'
        GROUP BY 1, 2
    ),
    stats AS (
        SELECT l_orderkey, count(*) AS n_supp, sum(late) AS n_late
        FROM lo GROUP BY 1
    )
    SELECT s.s_name AS s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM lo
    JOIN stats ON stats.l_orderkey = lo.l_orderkey
    JOIN supplier s ON s.s_suppkey = lo.l_suppkey
    WHERE lo.late = 1 AND stats.n_supp > 1 AND stats.n_late = 1
    GROUP BY 1
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-style: suppliers who were the SOLE late shipper on a
    multi-supplier finalized order (late = shipped > 90 days after order
    date). The textbook EXISTS / NOT EXISTS pair of correlated lineitem
    self-joins is decorrelated into one per-(order, supplier) aggregate;
    the per-order supplier/late counts are WINDOW aggregates over that
    same frame rather than a groupBy + self-join — a DataFrame self-join
    on a derived aggregate would make Catalyst compute (and scan) it
    twice, since the API has no CTE reuse. As written, lineitem is
    scanned once and shuffled twice ((orderkey, suppkey) aggregate, then
    orderkey window) — the plan that survives a 100x fact scale-up."""
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    lo = (
        l.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(
                    F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"), 1
                ).otherwise(0)
            ).alias("late")
        )
    )
    w = Window.partitionBy("l_orderkey")
    cand = lo.select(
        "l_orderkey",
        "l_suppkey",
        "late",
        F.count("*").over(w).alias("n_supp"),
        F.sum("late").over(w).alias("n_late"),
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        cand.filter((F.col("late") == 1) & (F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").cast("long").alias("numwait"))
    )


# ===========================================================================
# Training-data pipeline, part 2: contamination, repetition, mixture
# sampling, sequence packing, PII scrubbing — the curation stages a
# 100 TB pretraining pipeline runs after dedup.
# ===========================================================================


@register(
    "contamination_check",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
    g AS (SELECT doc_id,
                 list_distinct(list_transform(range(0, len(ws) - 2),
                     i -> ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3])) AS shingles
          FROM w WHERE len(ws) >= 3),
    bench AS (SELECT DISTINCT unnest(shingles) AS sh FROM g WHERE doc_id % 97 = 0),
    corpus AS (SELECT doc_id, unnest(shingles) AS sh FROM g WHERE doc_id % 97 <> 0)
    SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_shared
    FROM corpus c JOIN bench b ON b.sh = c.sh
    GROUP BY 1
    """,
    headline=True,
)
def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination scan: for every corpus document, the number
    of distinct word 3-grams it shares with a held-out benchmark set
    (here: doc_id % 97 == 0 stands in for the eval suite). The benchmark
    shingle set is distinct-ed and BROADCAST — at 100 TB the corpus side
    is a map-side hash-join probe followed by one aggregation on doc_id
    (map-side partial counts), so the only shuffle is proportional to the
    contaminated rows, never to the corpus. Real-text decontamination
    uses 8-13-grams (Pile / GPT-3 appendix); this corpus's vocabulary is
    ~40 words, so 3-grams give the equivalent selectivity — the n is a
    parameter of shingle_docs, not of the plan."""
    from .operators.dedup import shingle_docs

    # explode_outer, NOT explode: InferFiltersFromGenerate adds a
    # size(shingles) > 0 guard to a plain explode, and predicate pushdown
    # substitutes the whole shingle HOF expression into it and sinks it
    # below the spread() exchange — the entire shingling then runs twice,
    # interpreted, in the single pre-shuffle scan task (trap NOTES.md #8).
    # The outer variant infers no filter; empty-doc null rows simply
    # don't match the inner equi-join.
    sh = shingle_docs(_t(spark, sf_dir, "documents"), n=3)
    bench = (
        sh.filter(F.col("doc_id") % 97 == 0)
        .select(F.explode_outer("shingles").alias("sh"))
        .distinct()
    )
    corpus = sh.filter(F.col("doc_id") % 97 != 0).select(
        "doc_id", F.explode_outer("shingles").alias("sh")
    )
    return (
        corpus.join(F.broadcast(bench), "sh")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_shared"))
    )


@register(
    "repetition_score",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
    g AS (SELECT doc_id,
                 len(ws) - 2 AS total,
                 len(list_distinct(list_transform(range(0, len(ws) - 2),
                     i -> ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]))) AS uniq
          FROM w WHERE len(ws) >= 3)
    SELECT doc_id, CAST(total AS BIGINT) AS n_ngrams,
           round(1.0 - uniq * 1.0 / total, 4) AS rep_ratio
    FROM g
    """,
)
def repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition: 1 - (distinct word 3-grams / total word
    3-grams) — the boilerplate/spam signal used by quality filters
    (Gopher rules). Pure JVM higher-order functions over the scan: no
    shuffle, no Python, embarrassingly parallel at any scale."""
    from .functions import word_ngrams, words

    d = spread(_t(spark, sf_dir, "documents"))
    ws = words(F.col("text"))
    total = (F.size(ws) - F.lit(2)).cast("long")
    uniq = F.size(word_ngrams(ws, 3))
    return (
        d.filter(F.size(ws) >= 3)
        .select(
            "doc_id",
            total.alias("n_ngrams"),
            F.round(1.0 - uniq * 1.0 / total, 4).alias("rep_ratio"),
        )
    )


@register(
    "domain_mix_sample",
    oracle="""
    SELECT doc_id, source
    FROM documents
    WHERE (doc_id * 9973 + 13) % 100 <
          CASE WHEN CAST(substr(source, 4) AS INT) < 5 THEN 80
               WHEN CAST(substr(source, 4) AS INT) < 10 THEN 50
               ELSE 20 END
    """,
)
def domain_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic domain-mixture sampling: keep each document with a
    per-source quota (80% / 50% / 20% here) decided by a pure function of
    its id — so the sample is reproducible across engines, retries, and
    cluster sizes, unlike rand()-based sampling. Map-only (a filter over
    the scan, no shuffle); at 100 TB the same expression runs unchanged.
    The linear-congruential mix keeps the oracle exact; production would
    swap in xxhash64(doc_id) with the same mod-quota contract."""
    d = _t(spark, sf_dir, "documents")
    src_n = F.substring("source", 4, 10).cast("int")
    quota = F.when(src_n < 5, 80).when(src_n < 10, 50).otherwise(20)
    return d.filter((F.col("doc_id") * 9973 + 13) % 100 < quota).select("doc_id", "source")


@register(
    "pack_sequences",
    oracle="""
    WITH t AS (SELECT doc_id, source,
                      len(string_split(lower(text), ' ')) AS n_tokens
               FROM documents),
    c AS (SELECT doc_id, source, n_tokens,
                 sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                     ROWS UNBOUNDED PRECEDING) AS cum
          FROM t)
    SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST((cum - n_tokens) // 512 AS BIGINT) AS bin_id
    FROM c
    """,
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for training: assign documents to fixed-capacity
    context bins (512 tokens) by cumulative token count within each
    source, in doc_id order — contiguous-fill packing. One shuffle (the
    window on source); deterministic bin ids mean a restart repacks
    identically. At 100 TB: sub-partition the window key by (source, day)
    to bound per-partition state; first-fit-decreasing packs ~tighter but
    is inherently sequential — contiguous fill is the parallelizable
    compromise, and each bin is a contiguous doc_id run so a trainer
    reads a bin as a range scan."""
    from .functions import words

    d = _t(spark, sf_dir, "documents")
    n_tok = F.size(words(F.col("text"))).cast("long")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t = d.select("doc_id", "source", n_tok.alias("n_tokens"))
    cum = F.sum("n_tokens").over(w)
    return t.select(
        "doc_id",
        "source",
        "n_tokens",
        F.floor((cum - F.col("n_tokens")) / 512).cast("long").alias("bin_id"),
    )


@register(
    "pii_scrub",
    oracle=r"""
    WITH t AS (
        SELECT doc_id,
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@mail.example.com or +1555' || CAST(doc_id AS VARCHAR)
                   AS raw
        FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(raw, '[a-z0-9._]+@[a-z0-9.]+')) AS BIGINT)
               AS n_emails,
           CAST(len(regexp_extract_all(raw, '\+[0-9]{4,}')) AS BIGINT) AS n_phones,
           regexp_replace(regexp_replace(raw, '[a-z0-9._]+@[a-z0-9.]+', '<EMAIL>', 'g'),
                          '\+[0-9]{4,}', '<PHONE>', 'g') AS clean_text
    FROM t
    """,
)
def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction: count and replace email addresses and phone-number
    shapes with typed placeholder tokens. The corpus is synthetic word
    salad, so deterministic PII is injected first (both engines derive
    the identical raw text) and then scrubbed — exercising the real
    production path: regexp_count + regexp_replace, pure JVM, map-only,
    no shuffle. Patterns are kept in the regex subset where Java
    (Spark) and RE2 (DuckDB) agree; at 100 TB this runs at scan speed
    and is the template for any rule-based redaction pass."""
    d = _t(spark, sf_dir, "documents")
    raw = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.com or +1555"),
        F.col("doc_id").cast("string"),
    )
    email = r"[a-z0-9._]+@[a-z0-9.]+"
    phone = r"\+[0-9]{4,}"
    return d.select(
        "doc_id",
        F.regexp_count(raw, F.lit(email)).cast("long").alias("n_emails"),
        F.regexp_count(raw, F.lit(phone)).cast("long").alias("n_phones"),
        F.regexp_replace(F.regexp_replace(raw, email, "<EMAIL>"), phone, "<PHONE>").alias(
            "clean_text"
        ),
    )


@register(
    "cdc_snapshot_asof",
    oracle=f"""
    {_CH},
    cut AS (SELECT CAST(floor(max(ev_offset) / 2) AS BIGINT) AS cutoff FROM ch),
    past AS (SELECT ch.* FROM ch CROSS JOIN cut WHERE ch.ev_offset <= cut.cutoff),
    live AS (
        SELECT past.* FROM past
        CROSS JOIN (SELECT coalesce(max(ev_offset), -1) AS t_off
                    FROM past WHERE op = 't') ep
        WHERE past.ev_offset > ep.t_off AND past.op <> 't'
    ),
    last AS (
        SELECT user_id,
               max_by(op, ev_offset) AS last_op,
               max_by(val, ev_offset) AS last_value
        FROM live GROUP BY user_id
    )
    SELECT user_id, last_value FROM last WHERE last_op <> 'd'
    """,
)
def cdc_snapshot_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time snapshot (time travel): the replica state as of a
    changelog position — here the stream's midpoint offset — by
    collapsing only events at-or-before the cutoff. The cutoff is a
    broadcast 1-row aggregate cross-joined onto the stream (no driver
    scalar, no collect), and the truncate epoch is recomputed WITHIN the
    restricted prefix, so a truncate after the cutoff correctly does not
    erase the as-of state. This is the audit/recovery primitive a CDC
    replica needs ('what did the table look like at offset X') without
    storing per-offset snapshots — same plan shape as cdc_snapshot plus
    one broadcast."""
    ch = _changelog(spark, sf_dir)
    cut = ch.agg(F.floor(F.max("ev_offset") / 2).cast("long").alias("__cutoff"))
    past = (
        ch.crossJoin(F.broadcast(cut))
        .filter(F.col("ev_offset") <= F.col("__cutoff"))
        .drop("__cutoff")
    )
    return cdc.collapse_changelog(past, USER_VALUE)


@register(
    "curation_pipeline",
    oracle="""
    WITH w AS (SELECT doc_id, text, string_split(lower(text), ' ') AS ws
               FROM documents),
    g AS (SELECT doc_id, len(ws) AS n_tok, len(ws) - 2 AS total3,
                 CASE WHEN len(ws) >= 3
                      THEN len(list_distinct(list_transform(range(0, len(ws) - 2),
                           i -> ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3])))
                      ELSE 0 END AS uniq3
          FROM w),
    shing AS (SELECT doc_id,
                     list_distinct(list_transform(range(0, len(ws) - 2),
                         i -> ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3])) AS shingles
              FROM w WHERE len(ws) >= 3),
    bench AS (SELECT DISTINCT unnest(shingles) AS sh FROM shing WHERE doc_id % 97 = 0),
    cont AS (SELECT s.doc_id, count(*) AS n_shared
             FROM (SELECT doc_id, unnest(shingles) AS sh
                   FROM shing WHERE doc_id % 97 <> 0) s
             JOIN bench b ON b.sh = s.sh GROUP BY 1),
    dup AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS canon
            FROM documents),
    j AS (SELECT d.doc_id, g.n_tok, g.total3, g.uniq3, dup.canon,
                 coalesce(cont.n_shared, 0) AS n_shared
          FROM documents d
          JOIN g USING (doc_id)
          JOIN dup USING (doc_id)
          LEFT JOIN cont USING (doc_id))
    SELECT doc_id,
           CASE WHEN doc_id % 97 = 0 THEN 'benchmark'
                WHEN doc_id <> canon THEN 'duplicate'
                WHEN n_shared >= 3 THEN 'contaminated'
                WHEN n_tok < 15 THEN 'too_short'
                WHEN total3 > 0 AND (1.0 - uniq3 * 1.0 / total3) > 0.05
                     THEN 'repetitive'
                ELSE 'keep' END AS reason
    FROM j
    """,
)
def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation decision table: one row per document with the
    keep/drop verdict and the FIRST failing rule (benchmark holdout >
    exact-duplicate > benchmark contamination > too-short > repetitive) —
    the composition a real pretraining pipeline runs, as ONE declarative
    plan instead of N passes. Plan shape: map-only signal columns
    (tokens, repetition), one window on text for the canonical-duplicate
    id, and the broadcast contamination probe — the corpus is scanned
    once per physical input branch and never collected. Rule precedence
    is explicit so the output is deterministic regardless of evaluation
    order. Thresholds are calibrated to this synthetic corpus so every
    rule actually discriminates (real corpora would use e.g. Gopher's
    length/repetition bounds); the duplicate rule fires only when exact
    dups exist — this corpus has none, so its path is exercised by the
    window, not the data."""
    from .functions import word_ngrams, words
    from .operators.dedup import shingle_docs

    d = spread(_t(spark, sf_dir, "documents"))
    ws = words(F.col("text"))
    sh = shingle_docs(d, n=3)
    bench = (
        sh.filter(F.col("doc_id") % 97 == 0)
        .select(F.explode_outer("shingles").alias("sh"))
        .distinct()
    )
    cont = (
        sh.filter(F.col("doc_id") % 97 != 0)
        .select("doc_id", F.explode_outer("shingles").alias("sh"))
        .join(F.broadcast(bench), "sh")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared"))
        .withColumnRenamed("doc_id", "c_doc_id")
    )
    sig = d.select(
        "doc_id",
        "text",
        F.size(ws).alias("n_tok"),
        (F.size(ws) - 2).alias("total3"),
        F.when(F.size(ws) >= 3, F.size(word_ngrams(ws, 3))).otherwise(0).alias("uniq3"),
    ).withColumn("canon", F.min("doc_id").over(Window.partitionBy("text")))
    reason = (
        F.when(F.col("doc_id") % 97 == 0, "benchmark")
        .when(F.col("doc_id") != F.col("canon"), "duplicate")
        .when(F.col("n_shared") >= 3, "contaminated")
        .when(F.col("n_tok") < 15, "too_short")
        .when(
            (F.col("total3") > 0)
            & (1.0 - F.col("uniq3") * 1.0 / F.col("total3") > 0.05),
            "repetitive",
        )
        .otherwise("keep")
    )
    return (
        sig.join(cont, F.col("c_doc_id") == F.col("doc_id"), "left")
        .withColumn("n_shared", F.coalesce("n_shared", F.lit(0)))
        .select("doc_id", reason.alias("reason"))
    )


@register(
    "bpe_merge_candidates",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
    pairs AS (
        SELECT unnest(list_transform(range(0, len(ws) - 1),
                      i -> ws[i+1] || '+' || ws[i+2])) AS pair
        FROM w WHERE len(ws) >= 2
    )
    SELECT pair, CAST(count(*) AS BIGINT) AS freq
    FROM pairs GROUP BY pair
    ORDER BY freq DESC, pair ASC LIMIT 20
    """,
)
def bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary induction, iteration one: the 20 most frequent adjacent
    token pairs across the corpus — exactly the statistic each BPE merge
    step maximizes (here at word level; byte level is the same plan over
    a different split). One explode + one count aggregate with map-side
    partials, then TakeOrderedAndProject (per-partition heap, never a
    global sort); the (freq DESC, pair ASC) order is total, so the top-20
    set is deterministic across engines. The full BPE loop re-runs this
    job K times with the winning pair merged into the token stream — a
    driver-side loop of K Spark jobs, which is how distributed tokenizer
    training actually iterates. explode_outer, not explode: see
    NOTES.md trap #12."""
    from .functions import words

    d = spread(_t(spark, sf_dir, "documents"))
    ws = words(F.col("text"))
    pairs = F.when(
        F.size(ws) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(ws) - 2),
            lambda i: F.concat_ws(
                "+",
                F.element_at(ws, (i + 1).cast("int")),
                F.element_at(ws, (i + 2).cast("int")),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        d.select(F.explode_outer(pairs).alias("pair"))
        .filter(F.col("pair").isNotNull())
        .groupBy("pair")
        .agg(F.count("*").cast("long").alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("pair").asc())
        .limit(20)
    )


@register(
    "unpivot_metrics",
    oracle="""
    WITH a AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(len(string_split(lower(text), ' '))) AS BIGINT) AS n_tokens,
               CAST(sum(n_chars) AS BIGINT) AS n_chars
        FROM documents GROUP BY source
    )
    SELECT source, metric, value
    FROM a UNPIVOT (value FOR metric IN (n_docs, n_tokens, n_chars))
    """,
)
def unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): the per-source corpus report in long form — the
    inverse of pivot_event_counts, completing the reshape pair. One
    aggregate then an Expand node (each input row emits one row per
    metric, no shuffle beyond the groupBy); the long form is what
    metric stores and dashboards ingest."""
    from .functions import words

    d = _t(spark, sf_dir, "documents")
    a = d.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.size(words(F.col("text")))).cast("long").alias("n_tokens"),
        F.sum("n_chars").cast("long").alias("n_chars"),
    )
    return a.unpivot("source", ["n_docs", "n_tokens", "n_chars"], "metric", "value")


@register(
    "heavy_hitters",
    oracle="""
    WITH tok AS (SELECT unnest(string_split(lower(text), ' ')) AS token
                 FROM documents),
    cnt AS (SELECT token, CAST(count(*) AS BIGINT) AS freq FROM tok GROUP BY token),
    tot AS (SELECT sum(freq) AS total FROM cnt)
    SELECT c.token, c.freq
    FROM cnt c CROSS JOIN tot t
    WHERE c.freq * 200 >= t.total
    """,
)
def heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters: tokens with global frequency >= 0.5% of all
    tokens. One count aggregate with map-side partials; the counts frame
    is localCheckpoint-ed (it is O(vocabulary), tiny next to the corpus)
    so the 1-row total and the threshold filter both read the
    materialized counts instead of re-scanning the corpus — the same
    shared-subplan materialization dup_clusters uses. The threshold
    compare is pure integer arithmetic (freq * 200 >= total) — no float
    boundary to disagree on. The approximate companion is
    heavy_hitters_sketch (count-min)."""
    from .functions import words

    d = _t(spark, sf_dir, "documents")
    cnt = (
        d.select(F.explode_outer(words(F.col("text"))).alias("token"))
        .filter(F.col("token").isNotNull())
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("freq"))
        .localCheckpoint(eager=False)
    )
    tot = cnt.agg(F.sum("freq").alias("total"))
    return (
        cnt.crossJoin(F.broadcast(tot))
        .filter(F.col("freq") * 200 >= F.col("total"))
        .select("token", "freq")
    )


@register(
    "heavy_hitters_sketch",
    oracle=None,  # sketch estimates are implementation-defined; accuracy
    # vs the exact counts is pinned in tests/test_registry_oracle.py
)
def heavy_hitters_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy hitters: build ONE mergeable CMS over the
    token stream (eps=0.1%, conf=99%), then probe it for the candidate
    set. At 100 TB the sketch is the point: per-partition sketches merge
    associatively into a few-KB summary (one tiny shuffle), instead of
    shuffling |distinct tokens| count rows; probing is driver-side over
    the already-tiny candidate list. CMS overestimates (never under), so
    candidates come from the exact pass here and the estimate is checked
    >= truth in tests."""
    from .functions import words

    d = _t(spark, sf_dir, "documents")
    toks = d.select(F.explode_outer(words(F.col("text"))).alias("token")).filter(
        F.col("token").isNotNull()
    )
    # count_min_sketch is a SQL aggregate (binary output); probe via the
    # paired JVM-side CountMinSketch reader on the driver.
    sk = toks.agg(
        F.expr("hex(count_min_sketch(token, 0.001d, 0.99d, 42))").alias("sketch_hex")
    ).collect()[0].sketch_hex
    import io

    jvm = spark.sparkContext._jvm
    ba = bytes.fromhex(sk)
    jis = jvm.java.io.ByteArrayInputStream(ba)
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(jis)
    cand = [r.token for r in REGISTRY["heavy_hitters"].fn(spark, sf_dir).collect()]
    rows = [(t, int(cms.estimateCount(t))) for t in sorted(cand)]
    return spark.createDataFrame(rows, "token string, est_freq long")


def _jl_sign_sql(i: str, j: int) -> str:
    return (
        f"(CASE WHEN (({i} * 1103515245 + {j} * 12345) % 97) % 2 = 0 "
        f"THEN 1.0 ELSE -1.0 END)"
    )


def _jl_oracle(d: int = 64, k: int = 8) -> str:
    cols = ",\n           ".join(
        f"round(list_sum(list_transform(range(0, {d}), "
        f"i -> v[i+1] * {_jl_sign_sql('i', j)})) / sqrt({k}.0), 4) + 0.0 AS p{j}"
        for j in range(k)
    )
    return f"""
    WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings)
    SELECT vec_id,
           {cols}
    FROM e
    """


@register("embedding_project", oracle=_jl_oracle())
def embedding_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss dimensionality reduction: project 64-dim
    embeddings to 8 dims with a SEEDED Rademacher (+/-1) sign matrix
    derived from a pure (i, j) hash — no stored matrix, no randomness at
    run time, so any executor (or engine) regenerates the identical
    projection. This is the standard pre-LSH shrink for ANN at scale:
    map-only, no shuffle, and the sign arithmetic is exact integer math
    so both engines agree bit-for-bit before the final rounding. The
    fold order of the dot product is the array order on both sides,
    making the float sums identical, not merely close. k=8 here is the
    demo size; production picks k ~ O(log n / eps^2)."""
    import math

    from .functions import as_double_array

    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_array(F.col("embedding")).alias("v")
    )

    def sign(i, j: int):
        # i arrives as a 32-bit sequence element; widen before the big
        # multiplier or ANSI mode raises ARITHMETIC_OVERFLOW.
        return F.when(
            ((i.cast("long") * 1103515245 + j * 12345) % 97) % 2 == 0, 1.0
        ).otherwise(-1.0)

    def proj(j: int):
        acc = F.aggregate(
            F.sequence(F.lit(0), F.lit(63)),
            F.lit(0.0),
            lambda acc, i: acc + F.element_at(F.col("v"), (i + 1).cast("int")) * sign(i, j),
        )
        # + 0.0 canonicalizes IEEE -0.0 to 0.0 (string-compared by the
        # driver; the engines may round to differently-signed zeros)
        return (F.round(acc / math.sqrt(8.0), 4) + 0.0).alias(f"p{j}")

    return e.select("vec_id", *[proj(j) for j in range(8)])


@register(
    "global_shuffle",
    oracle="""
    WITH h AS (SELECT doc_id, md5(doc_id || ':42') AS skey FROM documents)
    SELECT doc_id, skey,
           CAST(row_number() OVER (ORDER BY skey, doc_id) AS BIGINT) AS shuffle_pos
    FROM h
    """,
)
def global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded deterministic global shuffle — the standard pre-training
    corpus randomization (break source/time locality before sequence
    packing). The shuffle key is md5(doc_id || ':' || seed): content-
    independent, uniform, reproducible on any engine with no stored
    permutation.

    The global position is assigned WITHOUT a single-partition window
    (the naive row_number() OVER (ORDER BY skey) would funnel 100 TB
    through one task): rows are bucketed by the first key byte (256
    uniform buckets), ranked within their bucket in parallel, and offset
    by the exclusive running total of bucket sizes — a 256-row broadcast.
    Because the bucket id is the skey prefix, bucket-major + in-bucket
    rank equals the global skey order exactly; the oracle states the
    plain global window and must match row-for-row."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":42"))).alias("skey"),
    )
    d = d.withColumn("bucket", F.conv(F.substring("skey", 1, 2), 16, 10).cast("int"))
    sizes = d.groupBy("bucket").agg(F.count("*").alias("n"))
    woff = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = sizes.select(
        "bucket", F.coalesce(F.sum("n").over(woff), F.lit(0)).alias("off")
    )
    wloc = Window.partitionBy("bucket").orderBy("skey", "doc_id")
    return (
        d.withColumn("local_rank", F.row_number().over(wloc))
        .join(F.broadcast(offsets), "bucket")
        .select(
            "doc_id",
            "skey",
            (F.col("off") + F.col("local_rank")).cast("long").alias("shuffle_pos"),
        )
    )


@register(
    "char_entropy",
    oracle="""
    WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents),
    cnt AS (SELECT doc_id, c, CAST(count(*) AS DOUBLE) AS k FROM ch GROUP BY doc_id, c),
    agg AS (SELECT doc_id, sum(k) AS n, sum(k * log2(k)) AS s FROM cnt GROUP BY doc_id)
    SELECT doc_id, round(log2(n) - s / n, 4) + 0.0 AS char_entropy
    FROM agg
    """,
)
def char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of the per-document character distribution — the
    classic cheap gibberish/boilerplate detector (natural prose sits
    ~4.0-4.5 bits; repeated padding or single-char runs collapse toward
    0). Entropy is computed as log2(n) - (sum k*log2 k)/n over INTEGER
    character counts, so both engines derive the float terms from exact
    ints; two hash aggregates, both with map-side partials, and the
    (doc, char) grid is bounded by |alphabet| per doc — no row blowup
    beyond the character explode itself, which is map-local."""
    d = spread(_t(spark, sf_dir, "documents"))
    cnt = (
        d.select("doc_id", F.explode(F.split(F.col("text"), "")).alias("c"))
        .groupBy("doc_id", "c")
        .agg(F.count("*").cast("double").alias("k"))
    )
    agg = cnt.groupBy("doc_id").agg(
        F.sum("k").alias("n"), F.sum(F.col("k") * F.log2("k")).alias("s")
    )
    return agg.select(
        "doc_id",
        (F.round(F.log2("n") - F.col("s") / F.col("n"), 4) + 0.0).alias("char_entropy"),
    )


@register(
    "sample_deterministic",
    oracle="""
    WITH r AS (SELECT doc_id, lang, md5(doc_id || '#7') AS skey FROM documents),
    rk AS (SELECT doc_id, lang,
                  CAST(row_number() OVER (PARTITION BY lang ORDER BY skey, doc_id)
                       AS BIGINT) AS sample_rank
           FROM r)
    SELECT lang, doc_id, sample_rank FROM rk WHERE sample_rank <= 20
    """,
)
def sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-k-per-group deterministic sample: rank each group by a
    seeded hash of the id and keep the first k — reservoir-sampling
    semantics (uniform within group, exactly k) but reproducible across
    engines, runs, and partitionings, unlike rand()-based sampling.
    One shuffle on the group key; the per-group window never sees more
    than its group. Companion to sample_stratified (rows-only,
    fraction-based): this one is the audit-grade path a training-data
    pipeline uses for fixed-size eval/holdout splits."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("#7"))).alias("skey"),
    )
    w = Window.partitionBy("lang").orderBy("skey", "doc_id")
    return (
        d.withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("sample_rank") <= 20)
        .select("lang", "doc_id", "sample_rank")
    )


@register(
    "fuzzy_pair_edit",
    oracle="""
    WITH p AS (
        SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
               CAST(levenshtein(substr(lower(a.text), 1, 80),
                                substr(lower(b.text), 1, 80)) AS BIGINT) AS edit_dist
        FROM documents a JOIN documents b
          ON a.source = b.source AND a.doc_id < b.doc_id
         AND abs(a.n_chars - b.n_chars) <= 40
    )
    SELECT doc_id_a, doc_id_b, edit_dist
    FROM p ORDER BY edit_dist, doc_id_a, doc_id_b LIMIT 20
    """,
)
def fuzzy_pair_edit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy matching: the 20 closest document pairs by
    Levenshtein distance over the normalized 80-char prefix, within
    (source, length-band) blocks. Levenshtein is O(len^2) per pair, so
    the block join (same source, |len diff| <= 40) bounds the quadratic
    work exactly like the jaccard/cosine dedup paths — never all-pairs;
    the prefix cap bounds the per-pair cost independently of document
    length. Global result is TakeOrderedAndProject (per-partition heaps)
    with a total (dist, id, id) order — deterministic across engines.

    Delegates to operators/dedup.py::fuzzy_pair_edit_topk — the r8 band
    join shape (length buckets in the equi-key, probe side exploded to
    its three neighbor buckets; sf1 546 → 25 s) PLUS the r9 DENSITY
    GUARD: argmin edit distance must score every banded pair (quadratic
    in block density BY CONTRACT), so the operator measures the banded
    mass first (O(corpus) bucket-count pass) and refuses past 1e8
    candidates, naming the production path — LSH candidate generation
    (dedup_ngram_lsh) with edit distance scored on candidates only.
    The sf10 replica (~1.45e9 banded pairs, 3675 s unguarded in
    SCALE100_FULL_r08) is now a designed abort, like
    interval_join_bucketed's; every committed bench scale <= sf1
    (<= 1.45e7 pairs) runs unchanged."""
    from .operators.dedup import fuzzy_pair_edit_topk

    return fuzzy_pair_edit_topk(_t(spark, sf_dir, "documents"), k=20)


def _ref_pq_setup(con) -> None:
    from .functions.ref_oracle import setup_knn_pq

    setup_knn_pq(con)


@register(
    "knn_pq",
    # Expected-result oracle: codebooks, codes, ADC shortlist, and exact
    # re-rank re-run in numpy/Python with the engine's exact op order —
    # functions/ref_oracle.py::_expected_pq_result.
    oracle="SELECT * FROM ref_knn_pq",
    oracle_setup=_ref_pq_setup,
)
def knn_pq_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 memory-bound scale path: product-quantization ANN (asymmetric
    distance over seeded per-subspace codebooks) with the standard exact
    rerank second stage over the ADC shortlist. Hash-checked since r6 vs
    an independent numpy reference (functions/ref_oracle.py) in
    check_oracle; rows-only in the driver's vanilla gate; recall vs
    knn_bruteforce stays pinned in tests. At 100 TB PQ is the variant
    that fits in memory — m bytes per vector instead of 4·d — and the
    rerank touches only O(queries × shortlist) full vectors."""
    from .operators.similarity import knn_pq

    emb = _t(spark, sf_dir, "embeddings")
    return knn_pq(
        emb.filter(F.col("vec_id") >= 5),
        emb.filter(F.col("vec_id") < 5),
        k=10,
        ksub=64,
        rerank=100,
    )


@register(
    "variant_extract",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
               AS sum_k,
           CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
               AS max_k
    FROM events GROUP BY event_type
    """,
)
def variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT path (Spark 4): parse_json once into the
    binary VARIANT encoding, then typed variant_get extraction — the
    engine-native path for schemaless event payloads, replacing repeated
    string re-parsing (get_json_object runs Jackson per call; a VARIANT
    column parses once and every subsequent get is a binary traversal,
    shredding-ready at the storage layer). The aggregate after the
    extract is an ordinary hash agg with map-side partials."""
    ev = _t(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json(F.col("props")), "$.k", "long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("k").cast("long").alias("sum_k"),
            F.max("k").cast("long").alias("max_k"),
        )
    )


_ORDER_CHAIN = """
    SELECT o_custkey, CAST(round(o_totalprice * 100) AS BIGINT) AS val_cents,
           CAST(row_number() OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS i
    FROM orders
"""

_RECURSIVE_DECAY = f"""
    WITH RECURSIVE acc AS (
        SELECT o_custkey, i, val_cents AS balance_cents
        FROM ({_ORDER_CHAIN}) ord WHERE i = 1
        UNION ALL
        SELECT o.o_custkey, o.i,
               (acc.balance_cents * 9) // 10 + o.val_cents AS balance_cents
        FROM acc JOIN ({_ORDER_CHAIN}) o
          ON o.o_custkey = acc.o_custkey AND o.i = acc.i + 1
    )
    SELECT o_custkey, i, balance_cents FROM acc
"""


@register("recursive_cte", oracle=_RECURSIVE_DECAY)
def recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 WITH RECURSIVE): per-customer exponentially
    decayed spend over each customer's order sequence — a multiplicative
    recurrence (balance = 0.9*prev + value) no window SUM expresses.

    Shaped for Spark's iterative execution: the recursion is FRONTIER-
    PARALLEL — iteration i advances EVERY customer's chain at once, so
    the iteration count is max orders-per-customer (~25 in TPC-H at ANY
    scale factor, since order count and customer count scale together),
    not O(rows). A month-spine variant measured 31 s at sf0.01 because
    80 single-row iterations each re-ran the corpus aggregate; here the
    chain table is staged + localCheckpoint-ed ONCE (Spark re-evaluates
    the recursive join subtree every iteration otherwise) and every
    iteration is one tiny hash join on the materialized 15 k-row spine.

    The recurrence runs in integer CENTS with floor division (Spark DIV,
    DuckDB //) — per-step float round() accumulated half-cent rounding
    disagreements between engines (296/15000 rows off by 0.01); integer
    arithmetic is bit-identical by construction.

    BATCHED recursion: one-step-per-iteration costs ~25 sequential
    scheduling rounds (the query is latency-bound, not data-bound — each
    round joins ~|customers| rows). Floor division makes the recurrence
    non-affine, so pointer-doubling can't compose steps exactly; instead
    each iteration advances B=8 steps at once against a pre-pivoted
    chunk table keyed by (custkey, base-position): the 8 floor steps are
    applied inline as nested integer expressions and all 8 positions are
    emitted in a packed array, exploded AFTER the recursion. Iteration
    count drops to ceil(maxchain/8) ≈ 4 at any TPC-H sf (chain length is
    orders-per-customer, scale-invariant). A partial final chunk emits
    its non-null prefix; its last position is not a chunk base, so the
    inner join finds no successor and the recursion stops naturally."""
    B = 8
    ord_chain = (
        _t(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("val_cents"),
            F.row_number()
            .over(
                Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
            )
            .cast("long")
            .alias("i"),
        )
    )
    # anchor rows (i=1) and the B-wide value chunks, both staged ONCE —
    # Spark re-evaluates the recursive join subtree every iteration, so
    # anything under it must be a materialized leaf, and few partitions:
    # each iteration handles ~|customers| rows, task count is the cost.
    anchor = ord_chain.filter(F.col("i") == 1).coalesce(1).localCheckpoint(eager=True)
    anchor.createOrReplaceTempView("order_chain_anchor")
    # Spark 4's recursion guard (spark.sql.cteRecursionRowLimit) defaults
    # to 1M ACCUMULATED rows — the recursion accumulates ~|customers| rows
    # per iteration, so at 100× bench scale (1.5M customers × ~5 chunked
    # iterations) the guard fires on a perfectly-converging query (r8
    # survival sweep). Derive the limit from the anchor: 16× headroom
    # over the ~ceil(25/8)+1 iterations chain length implies, keeping the
    # runaway-recursion protection proportionate instead of absolute.
    spark.conf.set(
        "spark.sql.cteRecursionRowLimit",
        str(max(1_000_000, 16 * anchor.count())),
    )
    chunks = (
        ord_chain.filter(F.col("i") > 1)
        .withColumn("base", F.expr(f"((i - 2) div {B}) * {B} + 1"))
        .groupBy("o_custkey", "base")
        .agg(
            *[
                F.max(
                    F.when(F.col("i") == F.col("base") + k, F.col("val_cents"))
                ).alias(f"v{k}")
                for k in range(1, B + 1)
            ]
        )
        .coalesce(1)
        .localCheckpoint(eager=True)
    )
    chunks.createOrReplaceTempView("order_chunks_mat")
    # nested floor-chain expressions: bal_k = bal_{k-1}*9 DIV 10 + v_k
    bal = "acc.balance_cents"
    cases = []
    for k in range(1, B + 1):
        bal = f"(({bal}) * 9 DIV 10 + c.v{k})"
        cases.append(
            f"CASE WHEN c.v{k} IS NOT NULL THEN "
            f"named_struct('pos', acc.i + {k}, 'bal', {bal}) END"
        )
    packed = "array_compact(array(" + ", ".join(cases) + "))"
    return spark.sql(
        f"""
        WITH RECURSIVE acc AS (
            SELECT o_custkey, i, val_cents AS balance_cents,
                   array(named_struct('pos', i, 'bal', val_cents)) AS emitted
            FROM order_chain_anchor
            UNION ALL
            SELECT o_custkey, base + size(pk) AS i,
                   element_at(pk, -1).bal AS balance_cents,
                   pk AS emitted
            FROM (
                SELECT acc.o_custkey AS o_custkey, acc.i AS base,
                       {packed} AS pk
                FROM acc JOIN order_chunks_mat c
                  ON c.o_custkey = acc.o_custkey AND c.base = acc.i
            )
        )
        SELECT o_custkey, e.pos AS i, e.bal AS balance_cents
        FROM acc LATERAL VIEW explode(emitted) t AS e
        """
    )


# ===========================================================================
# Round-4 additions: SCD2 history (CDC), unigram-LM scoring, exact-substring
# span dedup, Gopher/C4-style rule filter, per-dimension embedding stats.
# ===========================================================================


@register(
    "cdc_scd2",
    oracle=f"""
    {_CH},
    live AS (
        SELECT ch.* FROM ch
        CROSS JOIN (SELECT coalesce(max(ev_offset), -1) AS t_off
                    FROM ch WHERE op = 't') ep
        WHERE ch.ev_offset > ep.t_off AND ch.op <> 't'
    ),
    v AS (
        SELECT user_id, op, val AS last_value,
               ev_offset AS valid_from,
               lead(ev_offset) OVER w AS valid_to,
               ts_ms AS valid_from_ts,
               lead(ts_ms) OVER w AS valid_to_ts
        FROM live
        WINDOW w AS (PARTITION BY user_id ORDER BY ev_offset)
    )
    SELECT user_id, last_value, valid_from, valid_to,
           valid_from_ts, valid_to_ts,
           valid_to IS NULL AS is_current
    FROM v WHERE op <> 'd'
    """,
    headline=True,
)
def cdc_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 history: every version each key ever held, with its
    validity interval — the warehouse history table downstream of the
    reference's replica (same changelog the apply loop consumes,
    main.py:47-93, but keeping all states instead of the last). A delete
    closes the open version without emitting one; truncate epochs wipe
    history exactly like the snapshot (R10). One shuffle on the key for
    the lead() window — the same cost class as cdc_snapshot.

    Built as ONE SQL statement (r12, guide §7.3) — text twin of
    derive_changelog → truncate_epoch_filter → scd2_history
    (operators/cdc.py stays the reference implementation); bit-identity
    pinned in tests."""
    from .sources.tables import table_view

    return spark.sql(_CDC_SCD2_SQL.format(v=table_view(spark, "events", sf_dir)))


_CDC_SCD2_SQL = f"""
WITH {_CDC_CH_CTE.strip()},
ep AS (SELECT max(struct(ev_offset)) AS __t_off FROM ch WHERE op = 't'),
live AS (SELECT /*+ BROADCAST(ep) */ ch.user_id, ch.ev_offset, ch.op, ch.last_value, ch.ts_ms
         FROM ch CROSS JOIN ep
         WHERE (ep.__t_off IS NULL OR struct(ch.ev_offset) > ep.__t_off) AND ch.op <> 't'),
v2 AS (SELECT user_id, last_value,
              ev_offset AS valid_from,
              lead(ev_offset) OVER (PARTITION BY user_id ORDER BY ev_offset) AS valid_to,
              ts_ms AS valid_from_ts,
              lead(ts_ms) OVER (PARTITION BY user_id ORDER BY ev_offset) AS valid_to_ts,
              op AS __op
       FROM live)
SELECT user_id, last_value, valid_from, valid_to, valid_from_ts, valid_to_ts,
       valid_to IS NULL AS is_current
FROM v2 WHERE __op <> 'd'
"""


@register(
    "unigram_logprob",
    oracle="""
    WITH toks AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
                  FROM documents),
    v AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
    t AS (SELECT count(*) AS total FROM toks)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           round(avg(-ln(tok_c * 1.0 / total)), 4) AS avg_neg_logp
    FROM (SELECT toks.doc_id AS doc_id, v.c AS tok_c
          FROM toks JOIN v USING (tok)) j
    CROSS JOIN t
    GROUP BY doc_id
    """,
    headline=True,
)
def unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM quality score: train a unigram language model on the
    corpus itself (token → count / total), then score every document by
    its mean negative log-probability — the cheap statistical stand-in
    for the KenLM perplexity filter of CCNet/Gopher-style pipelines
    (high avg_neg_logp = rare-token-heavy = candidate for filtering).

    Two-pass, scale-shaped: (1) token counts via hash groupBy (map-side
    partial agg), materialized once with localCheckpoint — the vocab is
    |token types|, orders of magnitude smaller than the corpus; (2) tokens
    re-joined to the vocab on the token key and re-aggregated per document.
    The corpus is scanned exactly twice (the information-theoretic minimum
    for a corpus-trained model) — the 1-row total re-aggregates the SMALL
    vocab, not the corpus. The vocab join is left to AQE: at test scale it
    broadcasts, at web scale (100M+ token vocab) it becomes a shuffle join
    on the token — both correct, no code change. No Python anywhere.

    Built as TWO SQL statements around the vocab checkpoint (r12, guide
    §7.3 — the checkpoint is a materialization point, so one statement
    is impossible): vocab-count statement → localCheckpoint → scoring
    statement over (documents view, vocab view). Interleaved A/B
    build+exec 0.647 → 0.494 s; bit-identity pinned in tests."""
    from .operators.dedup import _run_pipeline_sql
    from .sources.tables import table_view

    v = table_view(spark, "documents", sf_dir)
    vocab = spark.sql(_UNIGRAM_VOCAB_SQL.format(v=v)).localCheckpoint(eager=True)
    return _run_pipeline_sql(vocab, _UNIGRAM_SCORE_SQL.replace("{docs}", v))


_UNIGRAM_VOCAB_SQL = """
SELECT tok, count(*) AS c
FROM (SELECT explode(split(lower(text), ' ')) AS tok FROM {v})
GROUP BY tok
"""

# {v} = the checkpointed vocab view, {docs} = the documents table view.
_UNIGRAM_SCORE_SQL = """
WITH toks AS (SELECT doc_id, explode(split(lower(text), ' ')) AS tok FROM {docs}),
total AS (SELECT sum(c) AS total FROM {v})
SELECT /*+ BROADCAST(total) */ doc_id,
       cast(count(*) AS bigint) AS n_tokens,
       round(avg(-ln(c / total)), 4) AS avg_neg_logp
FROM toks JOIN {v} USING (tok) CROSS JOIN total
GROUP BY doc_id
"""


@register(
    "dedup_spans",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
    s AS (SELECT doc_id,
                 unnest(list_transform(range(0, len(ws) - 7),
                     i -> array_to_string(list_slice(ws, i + 1, i + 8), ' '))) AS gram
          FROM w WHERE len(ws) >= 8),
    g AS (SELECT gram, count(DISTINCT doc_id) AS nd FROM s GROUP BY gram)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_spans,
           CAST(coalesce(count(*) FILTER (WHERE nd >= 2), 0) AS BIGINT) AS n_dup_spans,
           round(count(*) FILTER (WHERE nd >= 2) * 1.0 / count(*), 4) AS dup_fraction
    FROM s JOIN g USING (gram)
    GROUP BY doc_id
    """,
)
def dedup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplication profile (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better", at word
    8-gram granularity): for every document, the fraction of its token
    positions whose 8-word span also occurs in ANOTHER document. The
    suffix-array of the paper is replaced by the distributed-native
    equivalent — explode all spans (positions kept, unlike the distinct
    shingle sets of the MinHash family), count documents per span, join
    back, re-aggregate per doc. Shuffles on the span key and on doc_id
    only; span cardinality ~ corpus token count, so both shuffles are
    linear in corpus size — no all-pairs term anywhere. The join's build
    side is pre-filtered to DUPLICATED grams only (typically a few percent
    of all grams) and probed with a left join — unique grams never enter
    the join state, so the broadcast/shuffle side shrinks by ~the dup rate
    at any scale. Downstream use: cut documents with dup_fraction above a
    threshold, or feed the span list to a passage-level cutter.

    Two local decisions measured at sf1 (10× data): the span frame is
    consumed twice (gram counting + probe), so it is STAGED with
    localCheckpoint instead of recomputed; and the shingling scan is
    spread() to the core count first (a few MB of text is one parquet
    partition — one core shingling, 31 idle; NOTES trap #6). Together:
    33.7 → 7.0s at sf1."""
    from .functions import word_ngrams_all, words
    from .sources.tables import spread

    d = _t(spark, sf_dir, "documents")
    ws = words(F.col("text"))
    spans = (
        spread(d.filter(F.size(ws) >= 8))
        .select("doc_id", F.explode(word_ngrams_all(ws, 8)).alias("gram"))
        .localCheckpoint(eager=True)
    )
    g_dup = (
        spans.groupBy("gram")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
    )
    dup = F.when(F.col("nd").isNotNull(), 1).otherwise(0)
    return (
        spans.join(g_dup, "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_spans"),
            F.sum(dup).cast("long").alias("n_dup_spans"),
            F.round(F.sum(dup) / F.count("*"), 4).alias("dup_fraction"),
        )
    )


_STOP_RULES = ("the", "a", "of", "and", "to", "in", "is", "on", "for")
_STOP_RULES_SQL = "(" + ", ".join(f"'{w}'" for w in _STOP_RULES) + ")"


@register(
    "quality_rules",
    oracle=f"""
    WITH toks AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
                  FROM documents),
    c AS (SELECT doc_id, tok, count(*) AS n FROM toks GROUP BY doc_id, tok),
    a AS (SELECT doc_id,
                 CAST(sum(n) AS BIGINT) AS n_words,
                 round(sum(length(tok) * n) * 1.0 / sum(n), 4) AS mean_word_len,
                 CAST(coalesce(sum(n) FILTER (WHERE tok IN {_STOP_RULES_SQL}), 0)
                      AS BIGINT) AS n_stopwords,
                 round(max(n) * 1.0 / sum(n), 4) AS top_word_fraction
          FROM c GROUP BY doc_id)
    SELECT doc_id, n_words, mean_word_len, n_stopwords, top_word_fraction,
           n_words BETWEEN 20 AND 1000 AS ok_word_count,
           mean_word_len BETWEEN 3 AND 6 AS ok_mean_word_len,
           n_stopwords >= 2 AS ok_stopwords,
           top_word_fraction <= 0.15 AS ok_top_word,
           (n_words BETWEEN 20 AND 1000 AND mean_word_len BETWEEN 3 AND 6
            AND n_stopwords >= 2 AND top_word_fraction <= 0.15) AS passes
    FROM a
    """,
)
def quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style composite rule filter (Rae et al. 2021 §A1.1): word
    count bounds, mean word length bounds, minimum stopword evidence, and
    a top-word-dominance cap, each surfaced as a named boolean plus the
    conjunctive ``passes`` verdict. Everything derives from ONE token-level
    pipeline — explode → (doc, token) counts → per-doc aggregate — so the
    whole filter costs two hash shuffles regardless of how many rules are
    stacked; thresholds compare against the ROUNDED metrics so the
    booleans are bit-identical across engines. Per-rule booleans (rather
    than a pre-filtered corpus) are what a curation pipeline wants: rule
    hit-rates are monitorable and thresholds tunable without a re-scan.
    The same operators gate the streaming admission pipeline
    (operators/text.filter_quality -> start_corpus_dedup_admission);
    thresholds live in operators/text.py RULE_* constants, mirrored in
    the oracle SQL above."""
    from .operators.text import quality_rule_flags, quality_rule_metrics

    d = _t(spark, sf_dir, "documents")
    return quality_rule_flags(quality_rule_metrics(d))


@register(
    "embedding_dim_stats",
    oracle="""
    SELECT i AS dim,
           CAST(count(*) AS BIGINT) AS n,
           round(avg(x), 4) AS mean_x,
           round(stddev_samp(x), 4) AS std_x,
           round(min(x), 4) AS min_x,
           round(max(x), 4) AS max_x
    FROM (SELECT CAST(unnest(embedding) AS DOUBLE) AS x,
                 generate_subscripts(embedding, 1) AS i
          FROM embeddings) u
    GROUP BY i
    """,
)
def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension corpus statistics over the embedding column — the
    normalization / whitening / drift-monitoring pass every embedding
    pipeline runs before indexing (mean-centering for PQ, variance for
    dimension pruning). posexplode → hash aggregate on the dimension
    index: the shuffle carries exactly n_dims × n_partitions partial
    buffers (map-side combine collapses rows first), so at 100 TB the
    exchange is tiny regardless of corpus size. 1-indexed to match SQL
    ``generate_subscripts``."""
    e = _t(spark, sf_dir, "embeddings")
    u = e.select(F.posexplode("embedding").alias("i", "x")).select(
        (F.col("i") + 1).cast("long").alias("dim"),
        F.col("x").cast("double").alias("x"),
    )
    return u.groupBy("dim").agg(
        F.count("*").cast("long").alias("n"),
        F.round(F.avg("x"), 4).alias("mean_x"),
        F.round(F.stddev_samp("x"), 4).alias("std_x"),
        F.round(F.min("x"), 4).alias("min_x"),
        F.round(F.max("x"), 4).alias("max_x"),
    )


@register(
    "cdc_scd2_asof",
    oracle=f"""
    {_CH},
    ep AS (SELECT coalesce(max(ev_offset), -1) AS t_off FROM ch WHERE op = 't'),
    cut AS (SELECT CAST(floor((ep.t_off + mx.m) / 2) AS BIGINT) AS cutoff
            FROM ep CROSS JOIN (SELECT max(ev_offset) AS m FROM ch) mx),
    live AS (
        SELECT ch.* FROM ch CROSS JOIN ep
        WHERE ch.ev_offset > ep.t_off AND ch.op <> 't'
    ),
    v AS (
        SELECT user_id, op, val AS last_value,
               ev_offset AS valid_from,
               lead(ev_offset) OVER (PARTITION BY user_id ORDER BY ev_offset)
                   AS valid_to
        FROM live
    )
    SELECT user_id, last_value
    FROM v CROSS JOIN cut
    WHERE op <> 'd' AND valid_from <= cutoff
      AND (valid_to IS NULL OR valid_to > cutoff)
    """,
)
def cdc_scd2_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time lookup against the SCD2 HISTORY table: the replica
    state as of a changelog position is the set of versions whose validity
    interval spans the cutoff — one interval predicate over the already-
    materialized history, NO changelog re-collapse. This is why a
    warehouse keeps the SCD2 table: cdc_snapshot_asof re-derives the
    as-of state from raw events each time (full prefix scan + aggregate);
    here the same answer is a filter — at scale, a partition-pruned scan
    of the history table (partition by valid_from date, prune intervals
    that cannot span the cutoff). Cutoff = midpoint of the live epoch
    (history only exists after the last truncate, R10), broadcast as a
    1-row aggregate. Equality of the two formulations at the same cutoff
    is pinned in tests."""
    from .operators.cdc import scd2_history

    ch = _changelog(spark, sf_dir)
    hist = scd2_history(
        ch,
        key_cols=("user_id",),
        value_cols=("last_value",),
        order_col="ev_offset",
    )
    ep = ch.filter(F.col("op") == "t").agg(
        F.coalesce(F.max("ev_offset"), F.lit(-1)).alias("__t_off")
    )
    mx = ch.agg(F.max("ev_offset").alias("__m"))
    cut = ep.crossJoin(mx).select(
        F.floor((F.col("__t_off") + F.col("__m")) / 2).cast("long").alias("__cutoff")
    )
    return (
        hist.crossJoin(F.broadcast(cut))
        .filter(
            (F.col("valid_from") <= F.col("__cutoff"))
            & (F.col("valid_to").isNull() | (F.col("valid_to") > F.col("__cutoff")))
        )
        .select("user_id", "last_value")
    )


@register(
    "dedup_spans_cut",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
    s AS (SELECT doc_id, unnest(grams) AS gram,
                 generate_subscripts(grams, 1) - 1 AS pos
          FROM (SELECT doc_id,
                       list_transform(range(0, len(ws) - 7),
                           i -> array_to_string(list_slice(ws, i + 1, i + 8), ' '))
                           AS grams
                FROM w WHERE len(ws) >= 8)),
    g AS (SELECT gram FROM (SELECT gram, count(DISTINCT doc_id) AS nd
                            FROM s GROUP BY gram) WHERE nd >= 2),
    dp AS (SELECT DISTINCT s.doc_id,
                  unnest(range(s.pos, s.pos + 8)) AS idx
           FROM s JOIN g USING (gram)),
    toks AS (SELECT doc_id, unnest(ws) AS tok,
                    generate_subscripts(ws, 1) - 1 AS idx
             FROM w),
    kept AS (SELECT t.doc_id, t.idx, t.tok
             FROM toks t LEFT JOIN dp ON t.doc_id = dp.doc_id AND t.idx = dp.idx
             WHERE dp.idx IS NULL),
    a AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
                 string_agg(tok, ' ' ORDER BY idx) AS cleaned_text
          FROM kept GROUP BY doc_id)
    SELECT w.doc_id,
           CAST(len(w.ws) AS BIGINT) AS n_tokens,
           CAST(len(w.ws) AS BIGINT) - coalesce(a.n_kept, 0) AS n_removed,
           coalesce(a.cleaned_text, '') AS cleaned_text
    FROM w LEFT JOIN a USING (doc_id)
    """,
)
def dedup_spans_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup that actually CUTS (Lee et al. 2022): every
    token position covered by a cross-document-duplicated 8-word span is
    removed; the document survives with its unique content. Two-phase,
    scale-shaped:

      1. duplicated-position discovery — the dedup_spans pipeline (span
         explode → dup-gram set → join), then the covered index set per
         doc via ONE collect_set aggregate. Only DUPLICATED positions
         ever shuffle (the dup subset, not the corpus);
      2. map-side rebuild — the covered set joins back to the document
         row and a higher-order filter drops covered positions:
         the corpus tokens themselves never shuffle, the text is
         reassembled inside the scan's projection.

    The 2-parameter HOF lambda receives the ARRAY INDEX as its second
    argument — here that trap (NOTES #3) is the feature. Output is
    lowercase (the pipeline's canonical tokenization). Oracle rebuilds
    the same text via ordered string_agg over kept positions. Span frame
    staged + scan spread, same measured rationale as dedup_spans."""
    from .functions import word_ngrams_all, words
    from .sources.tables import spread

    d = _t(spark, sf_dir, "documents")
    ws = words(F.col("text"))
    spans = (
        spread(d.filter(F.size(ws) >= 8))
        .select("doc_id", F.posexplode(word_ngrams_all(ws, 8)).alias("pos", "gram"))
        .localCheckpoint(eager=True)
    )
    dup_grams = (
        spans.groupBy("gram")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("gram")
    )
    covered = (
        spans.join(dup_grams, "gram")
        .select(
            "doc_id",
            F.explode(F.sequence(F.col("pos"), F.col("pos") + 7)).alias("idx"),
        )
        .groupBy("doc_id")
        .agg(F.collect_set("idx").alias("__cov"))
    )
    cov = F.coalesce(F.col("__cov"), F.array().cast("array<int>"))
    kept = F.filter(ws, lambda x, i: ~F.array_contains(cov, i.cast("int")))
    return (
        d.join(covered, "doc_id", "left")
        .select(
            "doc_id",
            F.size(ws).cast("long").alias("n_tokens"),
            (F.size(ws) - F.size(kept)).cast("long").alias("n_removed"),
            F.concat_ws(" ", kept).alias("cleaned_text"),
        )
    )


@register(
    "train_val_split",
    oracle="""
    WITH s AS (SELECT doc_id, source,
                      CASE WHEN (doc_id * 9973 + 17) % 100 < 10 THEN 'test'
                           WHEN (doc_id * 9973 + 17) % 100 < 20 THEN 'val'
                           ELSE 'train' END AS split
               FROM documents)
    SELECT source, split, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(doc_id) AS BIGINT) AS min_doc_id
    FROM s GROUP BY source, split
    """,
)
def train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment: each document's split is a
    pure function of its id (LCG mix, 80/10/10), so the assignment is
    identical across engines, retries, repartitions, and later corpus
    versions — a NEW document never flips an OLD document's split, which
    rand()-based splitting cannot guarantee (the property that keeps eval
    sets uncontaminated as the corpus grows). Map-only decision + one
    aggregate for the per-(source, split) audit counts the pipeline
    monitors. Production would swap the LCG for xxhash64(doc_id) with the
    same mod-quota contract (kept LCG here for oracle exactness, same
    trade as domain_mix_sample)."""
    d = _t(spark, sf_dir, "documents")
    h = (F.col("doc_id") * 9973 + 17) % 100
    split = (
        F.when(h < 10, "test").when(h < 20, "val").otherwise("train").alias("split")
    )
    return (
        d.select("doc_id", "source", split)
        .groupBy("source", "split")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("doc_id").cast("long").alias("min_doc_id"),
        )
    )


@register(
    "bigram_logprob",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
    toks AS (SELECT doc_id, unnest(ws) AS tok FROM w),
    uni AS (SELECT tok, count(*) AS c1 FROM toks GROUP BY tok),
    bg AS (SELECT doc_id, unnest(list_transform(range(0, len(ws) - 1),
               i -> struct_pack(prev := ws[i + 1], cur := ws[i + 2]))) AS b
           FROM w WHERE len(ws) >= 2),
    pairs AS (SELECT doc_id, b.prev AS prev, b.cur AS cur FROM bg),
    bi AS (SELECT prev, cur, count(*) AS c2 FROM pairs GROUP BY prev, cur)
    SELECT p.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           round(avg(-ln(bi.c2 * 1.0 / uni.c1)), 4) AS avg_neg_logp
    FROM pairs p
    JOIN bi ON bi.prev = p.prev AND bi.cur = p.cur
    JOIN uni ON uni.tok = p.prev
    GROUP BY p.doc_id
    """,
    headline=True,
)
def bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM quality score: P(cur|prev) = count(prev,cur)/count(prev)
    estimated from the corpus itself; each document scored by the mean
    negative log-probability of its transitions. The step up from
    unigram_logprob that a perplexity filter actually needs: two documents
    with IDENTICAL token histograms but different word order score
    differently (repetitive/boilerplate word sequences are predictable →
    low score; scrambled text is not → high score) — pinned in tests.

    Scale shape: bigram pairs are built MAP-SIDE with a pure HOF over the
    token array (no window, no self-join — the classic lag() formulation
    would shuffle the whole corpus on doc_id first). The tokenized corpus
    is STAGED once (spread to the core count — a few MB of text is one
    parquet partition, NOTES trap #6 — then localCheckpoint) and consumed
    by both model passes; per-instance pair rows are collapsed to
    (doc, prev, cur, k) counts IMMEDIATELY, so the model join and the
    per-doc score run over distinct-pair rows, never raw instances, and
    the bigram table is derived from the same collapsed frame (no second
    explode). The per-doc mean is the k-weighted mean over distinct
    pairs — algebraically the instance mean. Measured at sf0.1: 8.3s →
    2.2s warm. MLE probabilities (no smoothing): every observed pair has
    c2 >= 1 by construction, so the log is always finite; an UNSEEN-pair
    query path would need the +1 smoothing documented here.

    r12 (guide §7.3 + §2.3/§3): built as ONE SQL statement over the
    staged token view, and the model is assembled BEFORE touching the
    pair stream — bi ⋈ uni on prev (both vocab²-bounded) first, then a
    single join of doc_pairs against the combined (prev, cur, c2, c1)
    model instead of two joins over the doc_pairs stream. Same inner-
    join semantics (every doc pair exists in bi; every prev exists in
    uni), same per-doc term multiset, so the k-weighted mean is
    unchanged (bit-identity pinned in tests). At 100 TB, when the model
    no longer broadcasts, the pair stream crosses ONE shuffle join
    instead of two. A doc_pairs localCheckpoint variant was A/B'd and
    REJECTED (1.36 → 1.64 s — the materialization barrier costs more
    than the saved duplicate explode at this scale)."""
    from .functions import words
    from .operators.dedup import _run_pipeline_sql
    from .sources.tables import spread

    d = _t(spark, sf_dir, "documents")
    ws = words(F.col("text"))
    d0 = spread(d.select("doc_id", ws.alias("ws"))).localCheckpoint(eager=True)
    return _run_pipeline_sql(d0, _BIGRAM_SQL)


_BIGRAM_SQL = """
WITH dp AS (
  SELECT doc_id, b.prev AS prev, b.cur AS cur, count(*) AS k
  FROM (SELECT doc_id,
               explode(transform(sequence(0, size(ws) - 2),
                   __si -> struct(element_at(ws, cast(__si + 1 as int)) AS prev,
                                  element_at(ws, cast(__si + 2 as int)) AS cur))) AS b
        FROM {v} WHERE size(ws) >= 2)
  GROUP BY doc_id, b.prev, b.cur),
uni AS (SELECT tok, count(*) AS c1
        FROM (SELECT explode(ws) AS tok FROM {v}) GROUP BY tok),
bi AS (SELECT prev, cur, sum(k) AS c2 FROM dp GROUP BY prev, cur),
model AS (SELECT bi.prev, bi.cur, bi.c2, uni.c1 FROM bi JOIN uni ON uni.tok = bi.prev)
SELECT doc_id, cast(sum(k) as bigint) AS n_bigrams,
       round(sum(k * -ln(c2 / c1)) / sum(k), 4) AS avg_neg_logp
FROM dp p JOIN model ON model.prev = p.prev AND model.cur = p.cur
GROUP BY doc_id
"""


@register(
    "knn_filtered",
    oracle="""
    WITH e AS (SELECT vec_id, label,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    q AS (SELECT vec_id AS query_id, label, v AS qv FROM e WHERE vec_id < 5),
    c AS (SELECT vec_id AS neighbor_id, label, v AS cv FROM e WHERE vec_id >= 5),
    scored AS (
        SELECT query_id, label, neighbor_id,
               round(list_dot_product(qv, cv)
                     / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))),
                     6) AS cos_sim
        FROM q JOIN c USING (label)
    ),
    r AS (SELECT *, CAST(row_number() OVER (
              PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS BIGINT)
              AS nn_rank
          FROM scored)
    SELECT query_id, label, neighbor_id, nn_rank, cos_sim FROM r WHERE nn_rank <= 10
    """,
)
def knn_filtered_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered/hybrid vector search: exact top-k restricted to corpus
    vectors sharing the query's label — metadata constraint joined INTO
    the scoring (pre-filter), not applied after (post-filter under-fills;
    pinned in tests). See operators/similarity.knn_filtered."""
    from .operators.similarity import knn_filtered

    emb = _t(spark, sf_dir, "embeddings")
    res = knn_filtered(
        emb.filter(F.col("vec_id") >= 5), emb.filter(F.col("vec_id") < 5), k=10
    )
    return res.select(
        "query_id",
        "label",
        "neighbor_id",
        F.col("rank").cast("long").alias("nn_rank"),
        "cos_sim",
    )


@register(
    "cdc_changelog_stats",
    oracle=f"""
    {_CH},
    per_key AS (SELECT op, user_id, count(*) AS depth FROM ch GROUP BY op, user_id)
    SELECT op,
           CAST(sum(depth) AS BIGINT) AS n_events,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(max(depth) AS BIGINT) AS max_events_per_key,
           round(avg(depth), 4) AS avg_events_per_key
    FROM per_key GROUP BY op
    """,
)
def cdc_changelog_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC feed observability: per-op event counts, touched-key
    cardinality, and per-key depth (max/avg) — the monitoring panel for a
    changelog (op-mix drift says the upstream workload changed; max
    events-per-key is the hot-key early warning for the collapse's
    shuffle skew). Two hash aggregates, second one op×key-sized; at
    100 TB this is the cheap side query run on the same scan as the
    merge."""
    ch = _changelog(spark, sf_dir)
    per_key = ch.groupBy("op", "user_id").agg(F.count("*").alias("depth"))
    return per_key.groupBy("op").agg(
        F.sum("depth").cast("long").alias("n_events"),
        F.count("*").cast("long").alias("n_keys"),
        F.max("depth").cast("long").alias("max_events_per_key"),
        F.round(F.avg("depth"), 4).alias("avg_events_per_key"),
    )


@register(
    "chunk_documents",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents)
    SELECT doc_id,
           CAST(i AS BIGINT) AS chunk_id,
           CAST(least(40, len(ws) - i * 30) AS BIGINT) AS n_chunk_tokens,
           array_to_string(list_slice(ws, i * 30 + 1, i * 30 + 40), ' ') AS chunk_text
    FROM w, LATERAL unnest(range(0, (len(ws) - 1) // 30 + 1)) AS t(i)
    """,
)
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size token chunking with overlap (window=40, stride=30) — the
    RAG-indexing / training-sequence chunking pass: every document becomes
    ceil-ish(n/stride) overlapping windows of tokens, each re-joined to
    text with its token count.

    Map-only: `sequence` generates chunk starts per row, a `transform`
    HOF slices the token array per start, one `explode` — no shuffle, no
    self-join, no window function. At 100 TB this is the ideal shape: the
    pass is embarrassingly parallel over input splits, output size is
    input × (window/stride) ≈ 1.33×, and Catalyst keeps the whole thing
    in one WholeStageCodegen stage over the scan. The final chunk is
    allowed to be short (least(window, n - start)); empty docs produce a
    single empty chunk, matching the SQL oracle's range(0, ..1)."""
    from .functions import words

    W, S = 40, 30
    d = _t(spark, sf_dir, "documents")
    ws = words(F.col("text"))
    n = F.size(ws)
    chunk = F.transform(
        F.sequence(F.lit(0), ((n - 1) / S).cast("int")),
        lambda i: F.struct(
            i.cast("long").alias("chunk_id"),
            F.least(F.lit(W), n - i * S).cast("long").alias("n_chunk_tokens"),
            F.concat_ws(" ", F.slice(ws, i * S + 1, W)).alias("chunk_text"),
        ),
    )
    return d.select("doc_id", F.explode(chunk).alias("c")).select(
        "doc_id", "c.chunk_id", "c.n_chunk_tokens", "c.chunk_text"
    )


@register(
    "interval_join_bucketed",
    oracle="""
    WITH e AS (SELECT event_id, epoch_ms(ts) AS ts_ms, user_id, event_type,
                      CAST(round(value * 100) AS BIGINT) AS cents FROM events),
    i AS (SELECT event_id AS incident_id, ts_ms AS lo, ts_ms + 600000 AS hi
          FROM e WHERE event_type = 'error')
    SELECT incident_id, CAST(lo AS BIGINT) AS incident_start_ms,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(sum(cents) AS BIGINT) AS sum_cents
    FROM i JOIN e ON e.ts_ms >= i.lo AND e.ts_ms < i.hi
    GROUP BY incident_id, lo
    """,
)
def interval_join_bucketed_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyless interval-containment join, bucketed: every error event
    opens a 10-minute platform-wide incident window; count the events
    (all users — no equi-key exists) landing in each window, plus
    distinct users and value (integer cents: a join result is a SET, so
    float accumulation order is engine-dependent; cents are order-free).

    DIAGNOSTIC / pair-enumerating form — NOT the recommended scale path.
    Candidate volume is density² (measured 33.5× wall at 10× data, NOTES
    sf1 table); use interval_join_preagg for count/sum and
    interval_join_distinct_hll for DISTINCT — both answer the same
    windows in O(corpus). This entry exists for consumers that genuinely
    need the (event, interval) rows, and it runs DENSITY-GUARDED: an
    O(corpus) bucket-count estimate aborts with the alternatives named
    when the pair volume exceeds the cap (2B here — generous enough for
    the sf1 sweep, a hard stop before a runaway cluster job).

    The oracle is the naive theta join (fine for DuckDB at sf0.01); the
    Spark side uses interval_join_bucketed, which manufactures a hashable
    bucket key so the plan is an equi-join, never the
    BroadcastNestedLoopJoin Spark would pick for a bare range predicate
    (pinned in test_plans.py). Bucket width = window width, so each
    interval lands on at most 2 buckets — 2× duplication buys a fully
    shuffled, AQE-balanceable join at any scale."""
    from .operators.temporal import interval_join_bucketed

    e = _t(spark, sf_dir, "events").select(
        "event_id",
        F.unix_millis("ts").alias("ts_ms"),
        "user_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    inc = e.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("incident_id"),
        F.col("ts_ms").alias("lo"),
        (F.col("ts_ms") + 600_000).alias("hi"),
    )
    pairs = interval_join_bucketed(
        e.select("ts_ms", "user_id", "cents"),
        inc,
        "ts_ms",
        "lo",
        "hi",
        600_000,
        max_candidate_pairs=2_000_000_000,
    )
    return pairs.groupBy("incident_id", "lo").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum("cents").alias("sum_cents"),
    ).select(
        "incident_id",
        F.col("lo").alias("incident_start_ms"),
        "n_events",
        "n_users",
        "sum_cents",
    )


@register(
    "user_event_sequences",
    oracle="""
    SELECT user_id,
           string_agg(event_type, ' ' ORDER BY epoch_ms(ts), event_id) AS seq,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events GROUP BY user_id
    """,
)
def user_event_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user time-ordered event-type sequences — the sequence-model /
    behavioral-training-data builder (each user's history becomes one
    training example).

    ONE shuffle: collect_list gathers per-user structs (ts, event_id,
    type), array_sort orders them INSIDE the executor (structs compare
    field-by-field, so (ts_ms, event_id) is the deterministic tiebreak),
    and a transform HOF projects the type sequence — no window function,
    no secondary sort-within-partitions machinery. At 100 TB per-user
    state is bounded by that user's event count; a production variant
    caps it with slice(sorted, 1, max_len) before the join — same plan
    shape. The string form (array_join) makes the result hashable
    cross-engine against DuckDB's ordered string_agg."""
    e = _t(spark, sf_dir, "events").select(
        "user_id", F.unix_millis("ts").alias("ts_ms"), "event_id", "event_type"
    )
    return e.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ts_ms", "event_id", "event_type"))),
                lambda s: s.event_type,
            ),
            " ",
        ).alias("seq"),
        F.count("*").cast("long").alias("n_events"),
    )


@register(
    "rollup_cascade",
    oracle="""
    SELECT CAST((epoch_ms(ts) // 604800000) * 604800000 AS BIGINT) AS week_start_ms,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
    FROM events GROUP BY 1, 2
    """,
)
def rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cascading temporal rollup (continuous-aggregate pattern): hour
    buckets from the raw events, DAY buckets from the hour aggregate,
    WEEK buckets from the day aggregate — each level consumes the level
    below, never the raw scan. Identical results to aggregating raw →
    week directly (sum is decomposable; the oracle does it directly),
    but the cascade is how a 100 TB system actually maintains
    multi-granularity dashboards: the hour level is the only pass over
    raw data, and each coarser level shuffles only the already-aggregated
    rows (monotonically shrinking exchanges — visible in the plan as
    three agg stages over ONE scan). In the streaming/incremental form
    the hour table is the cdc_incremental_agg-style delta-maintained MV
    and the coarser levels fold only changed hour buckets. All
    granularities are epoch-aligned fixed-width (hour/day/7-day week) —
    integer arithmetic, timezone-free, matching the oracle exactly;
    calendar months would need tz-aware date_trunc, deliberately avoided
    in the hashable contract. Integer cents keep every level's sum
    reassociation-safe."""
    H, D, W = 3_600_000, 86_400_000, 604_800_000
    e = _t(spark, sf_dir, "events").select(
        F.unix_millis("ts").alias("ts_ms"),
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    h = e.groupBy((F.col("ts_ms") / H).cast("long").alias("hb"), "event_type").agg(
        F.count("*").alias("n"), F.sum("cents").alias("c")
    )
    d = h.groupBy((F.col("hb") * H / D).cast("long").alias("db"), "event_type").agg(
        F.sum("n").alias("n"), F.sum("c").alias("c")
    )
    w = d.groupBy((F.col("db") * D / W).cast("long").alias("wb"), "event_type").agg(
        F.sum("n").cast("long").alias("n_events"),
        F.sum("c").cast("long").alias("sum_cents"),
    )
    return w.select(
        (F.col("wb") * W).alias("week_start_ms"), "event_type", "n_events", "sum_cents"
    )


@register(
    "ewma_decay",
    oracle="""
    WITH e AS (SELECT event_id, user_id, epoch_ms(ts) AS ts_ms, value,
                      min(epoch_ms(ts)) OVER (PARTITION BY user_id) AS t0
               FROM events)
    SELECT event_id, user_id, ts_ms,
           round(exp(-(ts_ms - t0) / 86400000.0)
                 * sum(value * exp((ts_ms - t0) / 86400000.0)) OVER w, 4)
               AS ewma_value
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def ewma_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially time-decayed activity score over IRREGULARLY spaced
    events (tau = 1 day): at each event, the sum of all prior values
    weighted by exp(-age/tau) — the standard recency-weighted feature for
    engagement/risk scoring, usually claimed to need a sequential
    recurrence (and hence a per-key UDF loop).

    The log-domain trick keeps it a plain windowed sum: EWMA_t =
    exp(-(t-t0)/tau) * Σ v_i·exp((t_i-t0)/tau) with t0 = the user's
    first event — one cumulative window sum + two map-side exps, fully
    JVM-side, one shuffle on user_id, no UDF, no recurrence. Numerical
    domain: the largest exponent is (user time span)/tau; doubles
    overflow past ~700 tau-units of span, so a deployment whose span/tau
    exceeds that must renormalize per coarse epoch (t0 per user-month
    with a multiplicative carry) or fall back to an applyInPandas
    recurrence — documented, not silently wrong: overflow yields inf,
    never a plausible-looking number. ROWS frame (not RANGE) with an
    event_id tiebreak: duplicate timestamps get distinct, deterministic
    prefix sums in both engines."""
    e = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", F.unix_millis("ts").alias("ts_ms"), "value"
    )
    tau_ms = 86_400_000.0
    t0w = Window.partitionBy("user_id")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_ms", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    e2 = e.withColumn("t0", F.min("ts_ms").over(t0w))
    return e2.select(
        "event_id",
        "user_id",
        "ts_ms",
        F.round(
            F.exp(-(F.col("ts_ms") - F.col("t0")) / tau_ms)
            * F.sum(
                F.col("value") * F.exp((F.col("ts_ms") - F.col("t0")) / tau_ms)
            ).over(w),
            4,
        ).alias("ewma_value"),
    )




# ===========================================================================
# Registry ordering: natural registration order, deliberately UN-curated.
#
# The external correctness gate samples a window of this registry in
# iteration order (dict = insertion order). An earlier round reordered the
# dict to pin a hand-picked set inside that window; that curated the
# audited sample (flagged by review), so the reorder is removed: the gate's
# window now falls wherever registration order puts it, and EVERY entry —
# inside the window or not — is verified each round by the full-registry
# sweep (`tools/check_oracle.py`, committed as CORRECTNESS_FULL_r{N}.json)
# and by `tools/verify_all.py`'s driver simulation over all entries.
# ===========================================================================


# ===========================================================================
# Round-4 continuation, block 6: behavioral analytics + corpus curation ops.
# ===========================================================================

# One-statement twin of the historical Column build of funnel_conversion
# (r12, guide §7.3; bit-identity pinned in tests): same collect_list →
# array_sort → aggregate() stage machine, same CASE/coalesce fold.
_FUNNEL_SQL = """
WITH e AS (SELECT user_id, unix_millis(ts) AS ts_ms, event_id, event_type FROM {v}),
per_user AS (
  SELECT aggregate(
           array_sort(collect_list(struct(ts_ms, event_id, event_type))),
           struct(cast(null AS bigint) AS s1, cast(null AS bigint) AS s2,
                  cast(null AS bigint) AS s3, cast(null AS bigint) AS s4),
           (acc, ev) -> struct(
             coalesce(acc.s1, CASE WHEN ev.event_type = 'signup' THEN ev.ts_ms END) AS s1,
             coalesce(acc.s2, CASE WHEN ev.event_type = 'view' AND acc.s1 IS NOT NULL AND ev.ts_ms > acc.s1 THEN ev.ts_ms END) AS s2,
             coalesce(acc.s3, CASE WHEN ev.event_type = 'click' AND acc.s2 IS NOT NULL AND ev.ts_ms > acc.s2 THEN ev.ts_ms END) AS s3,
             coalesce(acc.s4, CASE WHEN ev.event_type = 'purchase' AND acc.s3 IS NOT NULL AND ev.ts_ms > acc.s3 THEN ev.ts_ms END) AS s4)) AS f
  FROM e GROUP BY user_id)
SELECT count(f.s1) AS n_signup, count(f.s2) AS n_view, count(f.s3) AS n_click, count(f.s4) AS n_purchase,
       round(count(f.s4) / nullif(cast(count(f.s1) AS double), 0.0D), 4) AS conversion
FROM per_user
"""


@register(
    "funnel_conversion",
    oracle="""
    WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ts_ms FROM events),
    u1 AS (SELECT user_id, min(ts_ms) AS s1 FROM e
           WHERE event_type = 'signup' GROUP BY user_id),
    u2 AS (SELECT e.user_id, min(ts_ms) AS s2 FROM e JOIN u1 USING (user_id)
           WHERE event_type = 'view' AND ts_ms > s1 GROUP BY e.user_id),
    u3 AS (SELECT e.user_id, min(ts_ms) AS s3 FROM e JOIN u2 USING (user_id)
           WHERE event_type = 'click' AND ts_ms > s2 GROUP BY e.user_id),
    u4 AS (SELECT e.user_id, min(ts_ms) AS s4 FROM e JOIN u3 USING (user_id)
           WHERE event_type = 'purchase' AND ts_ms > s3 GROUP BY e.user_id)
    SELECT CAST((SELECT count(*) FROM u1) AS BIGINT) AS n_signup,
           CAST((SELECT count(*) FROM u2) AS BIGINT) AS n_view,
           CAST((SELECT count(*) FROM u3) AS BIGINT) AS n_click,
           CAST((SELECT count(*) FROM u4) AS BIGINT) AS n_purchase,
           round((SELECT count(*) FROM u4) * 1.0
                 / nullif((SELECT count(*) FROM u1), 0), 4) AS conversion
    """,
    headline=True,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequenced funnel analysis (signup → view → click → purchase): how
    many users reach each stage IN ORDER, where stage k counts only events
    strictly later than the user's stage-(k-1) time — the product-analytics
    staple (Amplitude/Mixpanel funnels).

    The textbook SQL formulation (the oracle) is k-1 self-joins, each a
    shuffle over the events table. The Spark side does the whole funnel in
    ONE shuffle: per-user events are gathered once
    (collect_list → array_sort, deterministic (ts, event_id) order), and a
    single aggregate() HOF folds the sorted array through the stage
    machine — stage k's slot is set by the first qualifying event after
    slot k-1, which over an ascending-ts array is exactly the min-ts
    semantics of the join chain. Per-user FOLD state is 4 longs regardless
    of history length; the final global rollup is a 1-row aggregate. The
    collected per-user array is bounded by that user's event count — a
    pathological mega-user gets capped with slice(sorted, 1, max_len)
    before the fold (same guard as user_event_sequences), or served by
    the streaming form (start_funnel_state), whose state is 4 longs with
    no array at all. At 100 TB: one exchange on user_id (AQE-balanceable),
    no join storm, and funnel depth extends by adding struct fields, not
    shuffles.

    Built as ONE SQL statement (r12, guide §7.3): the Column build of
    the fold lambda (nested whens × 4 stages) cost ~0.17 s of pure py4j
    chatter per invocation; the SQL text is the same machine verbatim
    (interleaved A/B build+exec 0.597 → 0.394 s, bit-identity pinned in
    tests)."""
    from .sources.tables import table_view

    v = table_view(spark, "events", sf_dir)
    return spark.sql(_FUNNEL_SQL.format(v=v))


@register(
    "ngram_top",
    oracle="""
    WITH w AS (SELECT string_split(lower(text), ' ') AS ws FROM documents),
    g AS (SELECT array_to_string(list_slice(ws, i + 1, i + 3), ' ') AS gram
          FROM w, LATERAL unnest(range(0, len(ws) - 2)) AS t(i)
          WHERE len(ws) >= 3),
    c AS (SELECT gram, count(*) AS n FROM g GROUP BY gram)
    SELECT gram, CAST(n AS BIGINT) AS n_occurrences
    FROM c ORDER BY n DESC, gram LIMIT 50
    """,
    headline=True,
)
def ngram_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-k n-gram frequencies (WIMBD-style "what's in my big
    data" analysis, n=3, k=50): the boilerplate/meme detector — a handful
    of trigrams with outsized counts is the signature of template text a
    curation pass should down-weight.

    Plan: staged token arrays (spread + localCheckpoint — a few MB of text
    is ONE parquet partition otherwise, NOTES trap #6), map-side trigram
    construction via a position HOF (word_ngrams_all — no self-join, no
    window), explode → partial-agg'd count (map-side combine shrinks the
    exchange to distinct grams per partition) → TakeOrderedAndProject for
    the global top-k (O(k) per partition, never a full sort). At 100 TB
    the exchange carries only distinct (gram, partial-count) pairs and the
    top-k never materializes the full distribution on one node."""
    from .functions import word_ngrams_all, words
    from .sources.tables import spread

    d = _t(spark, sf_dir, "documents")
    grams = (
        spread(d.select(words(F.col("text")).alias("ws")))
        .select(F.explode(word_ngrams_all(F.col("ws"), 3)).alias("gram"))
        .groupBy("gram")
        .agg(F.count("*").alias("n_occurrences"))
    )
    return grams.orderBy(F.desc("n_occurrences"), "gram").limit(50)


@register(
    "corpus_stats",
    oracle="""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len(string_split(lower(text), ' '))) AS BIGINT) AS n_tokens,
           CAST(sum(length(text)) AS BIGINT) AS n_chars,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(count(DISTINCT md5(lower(text))) AS BIGINT) AS n_unique_texts,
           round(avg(len(string_split(lower(text), ' '))), 4) AS avg_tokens
    FROM documents GROUP BY lang
    """,
)
def corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus overview — the first dashboard over any new
    crawl dump: volume (docs/tokens/chars), provenance breadth (distinct
    sources), and exact-dup pressure (distinct canonical fingerprints vs
    docs). One scan, one grouped aggregate; the two DISTINCTs expand to
    the standard Expand + partial-agg plan, each keyed by (lang, value) —
    mergeable and skew-safe because lang cardinality is tiny but the
    expanded keys are not. Fingerprint = md5(lower(text)), shared with
    doc_fingerprint/dedup_exact so the dup ratio here predicts exactly
    what dedup_exact will remove."""
    d = _t(spark, sf_dir, "documents")
    from .functions import words

    ws = words(F.col("text"))
    return (
        d.select(
            "lang",
            "source",
            F.size(ws).alias("n_toks"),
            F.length("text").alias("n_chars_1"),
            F.md5(F.lower(F.col("text"))).alias("fp"),
        )
        .groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_toks").cast("long").alias("n_tokens"),
            F.sum("n_chars_1").cast("long").alias("n_chars"),
            F.count_distinct("source").cast("long").alias("n_sources"),
            F.count_distinct("fp").cast("long").alias("n_unique_texts"),
            F.round(F.avg("n_toks"), 4).alias("avg_tokens"),
        )
    )


@register(
    "per_source_cap",
    oracle="""
    WITH h AS (SELECT doc_id, source,
                      (doc_id * 1103515245 + 12345) % 2147483648 AS hk
               FROM documents),
    r AS (SELECT doc_id, source,
                 CAST(row_number() OVER (PARTITION BY source ORDER BY hk, doc_id)
                      AS BIGINT) AS sample_rank
          FROM h)
    SELECT doc_id, source, sample_rank FROM r WHERE sample_rank <= 10
    """,
)
def per_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document cap (keep ≤ 10 docs per source, hash order) —
    the anti-over-representation pass every crawl-derived corpus runs
    (RefinedWeb/FineWeb-style per-domain quotas: one mega-domain must not
    dominate the training mix).

    Selection order is a pure LCG mix of doc_id — deterministic across
    engines, retries, and corpus growth *within* a source's surviving
    prefix (adding docs to a source reshuffles only ranks at the margin,
    never the hash itself; production swaps the LCG for xxhash64 with the
    same contract, kept LCG for oracle exactness — same trade as
    train_val_split). Plan: one exchange on source + in-partition rank;
    at 100 TB a WindowGroupLimit (rank-pushdown) stops each partition
    after 10 rows instead of ranking every doc, and a skewed mega-source
    salts into (source, doc_id-band) sub-keys with a per-band quota."""
    d = _t(spark, sf_dir, "documents")
    hk = (F.col("doc_id") * 1103515245 + 12345) % 2147483648
    w = Window.partitionBy("source").orderBy(hk.asc(), F.col("doc_id").asc())
    return (
        d.select("doc_id", "source")
        .withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("sample_rank") <= 10)
    )


@register(
    "keyword_search",
    oracle="""
    WITH toks AS (SELECT DISTINCT doc_id, unnest(string_split(lower(text), ' ')) AS tok
                  FROM documents),
    hits AS (SELECT doc_id FROM toks
             WHERE tok IN ('spark', 'merge', 'window')
             GROUP BY doc_id HAVING count(*) = 3)
    SELECT d.doc_id, d.source, CAST(d.n_chars AS BIGINT) AS n_chars
    FROM documents d JOIN hits USING (doc_id)
    """,
)
def keyword_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive keyword search (docs containing ALL of 'spark',
    'merge', 'window') in inverted-index shape: explode to (doc, token)
    postings, keep only query-term postings (the filter is pushed to the
    generator's output before any shuffle — the exchange carries query-
    term hits only, not the corpus), distinct per doc, and a HAVING
    count = |terms| intersection. The result then semi-joins the corpus
    row for display columns.

    This is deliberately NOT array_contains per term (which re-scans the
    token array per term and can't reuse a persisted posting table): at
    100 TB the posting frame IS the inverted index — computed once,
    bucket-written by token, every subsequent query becomes a bucket-
    pruned probe of its terms. The HAVING-count form extends to k-of-n
    and OR semantics without plan changes."""
    from .functions import words

    TERMS = ("spark", "merge", "window")
    d = _t(spark, sf_dir, "documents")
    postings = d.select("doc_id", F.explode(words(F.col("text"))).alias("tok")).filter(
        F.col("tok").isin(*TERMS)
    )
    hits = (
        postings.groupBy("doc_id")
        .agg(F.count_distinct("tok").alias("nt"))
        .filter(F.col("nt") == len(TERMS))
        .select("doc_id")
    )
    return d.join(hits, "doc_id", "left_semi").select(
        "doc_id", "source", F.col("n_chars").cast("long").alias("n_chars")
    )


@register(
    "text_normalize",
    oracle="""
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(lower(text), '[\\x00-\\x1f]', ' ', 'g'),
                               '\\s+', ' ', 'g')) AS norm_text,
           CAST(length(text) AS BIGINT) AS n_chars_raw,
           CAST(length(trim(regexp_replace(
                    regexp_replace(lower(text), '[\\x00-\\x1f]', ' ', 'g'),
                    '\\s+', ' ', 'g'))) AS BIGINT) AS n_chars_norm
    FROM documents
    """,
)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical text normalization — the first transform of every text
    pipeline: lowercase, control characters → space, whitespace runs
    collapsed, edges trimmed. Idempotent (normalize ∘ normalize =
    normalize — pinned in tests), so re-running a partially-normalized
    corpus is safe. Pure map-only column expressions: zero shuffle, the
    pass rides the corpus scan and stays inside WholeStageCodegen at any
    scale. DuckDB's regexp_replace needs the explicit 'g' flag to match
    Spark's replace-all default — the oracle carries it."""
    d = _t(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[\\x00-\\x1f]", " "),
            "\\s+",
            " ",
        )
    )
    return d.select(
        "doc_id",
        norm.alias("norm_text"),
        F.length("text").cast("long").alias("n_chars_raw"),
        F.length(norm).cast("long").alias("n_chars_norm"),
    )


@register(
    "histogram_tokens",
    oracle="""
    WITH t AS (SELECT least(len(string_split(lower(text), ' ')) // 10, 19) AS b
               FROM documents)
    SELECT CAST(b * 10 AS BIGINT) AS token_bucket_lo,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM t GROUP BY b
    """,
)
def histogram_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-length histogram (token count, width-10 buckets, top
    bucket open-ended): the length-distribution panel used to pick
    truncation/packing parameters and to spot crawler pathologies
    (a spike at tiny lengths = boilerplate fragments). Map-side bucket
    assignment + one 20-group aggregate — partial aggregation collapses
    each scan partition to ≤ 20 rows, so the exchange is constant-size
    regardless of corpus size."""
    from .functions import words

    d = _t(spark, sf_dir, "documents")
    b = F.least(F.floor(F.size(words(F.col("text"))) / 10), F.lit(19))
    return (
        d.select(b.alias("b"))
        .groupBy("b")
        .agg(F.count("*").cast("long").alias("n_docs"))
        .select((F.col("b") * 10).cast("long").alias("token_bucket_lo"), "n_docs")
    )


@register(
    "domain_reweight",
    oracle="""
    WITH cur AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
    tot AS (SELECT sum(n_docs) AS n_total FROM cur)
    SELECT lang, CAST(n_docs AS BIGINT) AS n_docs,
           round(n_docs * 1.0 / n_total, 6) AS corpus_share,
           CASE lang WHEN 'en' THEN 0.4 WHEN 'de' THEN 0.15 WHEN 'es' THEN 0.15
                     WHEN 'fr' THEN 0.15 WHEN 'zh' THEN 0.15 END AS target_share,
           round((CASE lang WHEN 'en' THEN 0.4 WHEN 'de' THEN 0.15
                            WHEN 'es' THEN 0.15 WHEN 'fr' THEN 0.15
                            WHEN 'zh' THEN 0.15 END)
                 / (n_docs * 1.0 / n_total), 6) AS weight,
           round(round((CASE lang WHEN 'en' THEN 0.4 WHEN 'de' THEN 0.15
                                  WHEN 'es' THEN 0.15 WHEN 'fr' THEN 0.15
                                  WHEN 'zh' THEN 0.15 END)
                       / (n_docs * 1.0 / n_total), 6) * n_docs, 2) AS expected_docs
    FROM cur CROSS JOIN tot
    """,
)
def domain_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain/language importance reweighting (the DoReMi/data-mixture
    step): given a TARGET mix over languages, emit per-language sampling
    weights = target_share / corpus_share, plus the expected post-sampling
    doc counts the weights imply. A doc-level sampler then draws each doc
    with probability ∝ its language's weight (pure function of (doc_id,
    weight) — same LCG contract as train_val_split).

    Plan: one grouped count + a broadcast 1-row total (the crossJoin is
    against a single-row aggregate — constant, never a real cartesian);
    everything after is map-side arithmetic on a |langs|-row frame. At
    100 TB the only corpus-sized work is the count aggregate."""
    TARGET = {"en": 0.4, "de": 0.15, "es": 0.15, "fr": 0.15, "zh": 0.15}
    d = _t(spark, sf_dir, "documents")
    tgt = F.create_map(*[F.lit(x) for kv in TARGET.items() for x in kv])
    cur = d.groupBy("lang").agg(F.count("*").alias("n_docs"))
    tot = cur.agg(F.sum("n_docs").alias("n_total"))
    share = F.col("n_docs") / F.col("n_total")
    weight = F.round(tgt[F.col("lang")] / share, 6)
    return cur.crossJoin(F.broadcast(tot)).select(
        "lang",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.round(share, 6).alias("corpus_share"),
        tgt[F.col("lang")].alias("target_share"),
        weight.alias("weight"),
        F.round(weight * F.col("n_docs"), 2).alias("expected_docs"),
    )


@register(
    "shard_plan",
    oracle="""
    WITH t AS (SELECT doc_id, len(string_split(lower(text), ' ')) AS n_tokens
               FROM documents),
    c AS (SELECT doc_id, n_tokens,
                 coalesce(CAST(sum(n_tokens) OVER (ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
                     AS tok_before
          FROM t)
    SELECT CAST(tok_before // 5000 AS BIGINT) AS shard_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           CAST(min(doc_id) AS BIGINT) AS first_doc_id,
           CAST(max(doc_id) AS BIGINT) AS last_doc_id
    FROM c GROUP BY 1
    """,
)
def shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget shard planning: assign documents, in deterministic
    doc_id order, to contiguous training shards of ~5000 tokens each
    (shard_id = prefix-token-count // budget) and report each shard's
    doc/token totals and id range — how a corpus becomes fixed-size
    training files with stable doc→shard assignment.

    The naive formulation is a GLOBAL cumulative window (ORDER BY with no
    partition — a single-partition sort, the oracle does exactly that and
    it is fine for DuckDB at sf0.01 but a non-starter at 100 TB). The
    Spark side computes the identical prefix sum hierarchically:
    1000-doc segments get per-segment totals (one small aggregate), the
    segment-level prefix runs over the segments frame (corpus/1000 rows —
    and recursable to another level if even that is large), and each
    row's prefix = its segment's offset + the within-segment cumulative
    window (partitionBy segment — fully parallel). Same numbers, no
    global sort."""
    from .functions import words

    BUDGET, SEG = 5000, 1000
    d = _t(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        (F.col("doc_id") / SEG).cast("long").alias("seg"),
        F.size(words(F.col("text"))).cast("long").alias("n_tokens"),
    )
    seg_tot = tok.groupBy("seg").agg(F.sum("n_tokens").alias("seg_tokens"))
    seg_off = seg_tot.select(
        "seg",
        F.coalesce(
            F.sum("seg_tokens").over(
                Window.orderBy("seg").rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("seg_before"),
    )
    inner = Window.partitionBy("seg").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    planned = (
        tok.join(F.broadcast(seg_off), "seg")
        .select(
            "doc_id",
            "n_tokens",
            (
                F.col("seg_before") + F.coalesce(F.sum("n_tokens").over(inner), F.lit(0))
            ).alias("tok_before"),
        )
    )
    return (
        planned.select(
            "doc_id", "n_tokens", (F.col("tok_before") / BUDGET).cast("long").alias("shard_id")
        )
        .groupBy("shard_id")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.min("doc_id").cast("long").alias("first_doc_id"),
            F.max("doc_id").cast("long").alias("last_doc_id"),
        )
    )


@register(
    "retrieval_mrr",
    oracle="""
    WITH e AS (SELECT vec_id, label,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    q AS (SELECT vec_id AS query_id, label AS q_label, v AS qv FROM e WHERE vec_id < 5),
    c AS (SELECT vec_id AS neighbor_id, label AS n_label, v AS cv FROM e WHERE vec_id >= 5),
    scored AS (
        SELECT query_id, q_label, neighbor_id, n_label,
               round(list_dot_product(qv, cv)
                     / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))),
                     6) AS cos_sim
        FROM q CROSS JOIN c
    ),
    r AS (SELECT *, row_number() OVER (
              PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rank
          FROM scored),
    topk AS (SELECT * FROM r WHERE rank <= 10),
    per_q AS (SELECT query_id,
                     min(CASE WHEN q_label = n_label THEN rank END) AS first_hit,
                     sum(CASE WHEN q_label = n_label THEN 1 ELSE 0 END) AS n_hits
              FROM topk GROUP BY query_id)
    SELECT CAST(count(*) AS BIGINT) AS n_queries,
           round(avg(coalesce(1.0 / first_hit, 0.0)), 6) AS mrr,
           round(avg(n_hits / 10.0), 6) AS mean_precision_at_10
    FROM per_q
    """,
)
def retrieval_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval evaluation as a query: score the exact top-10 neighbors
    of each held-out query against its label (label match = relevant) and
    report MRR and mean precision@10 — the eval harness an embedding/ANN
    pipeline runs after every index build, expressed as one DataFrame so
    it reuses the engine's own knn operator (any knn_* variant drops in;
    recall bars in tests already compare them the same way).

    Plan: knn_bruteforce (broadcast queries, per-partition local top-k),
    then the k×|queries|-row result — tiny by construction — is broadcast
    against the corpus labels; two 1-row aggregates finish. Nothing
    corpus-sized shuffles."""
    from .operators.similarity import knn_bruteforce

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    c = emb.filter(F.col("vec_id") >= 5)
    knn = knn_bruteforce(c, q, k=10)
    ql = q.select(F.col("vec_id").alias("query_id"), F.col("label").alias("q_label"))
    cl = c.select(F.col("vec_id").alias("neighbor_id"), F.col("label").alias("n_label"))
    j = cl.join(F.broadcast(knn.join(F.broadcast(ql), "query_id")), "neighbor_id")
    per_q = j.groupBy("query_id").agg(
        F.min(F.when(F.col("q_label") == F.col("n_label"), F.col("rank"))).alias(
            "first_hit"
        ),
        F.sum(F.when(F.col("q_label") == F.col("n_label"), 1).otherwise(0))
        .cast("long")
        .alias("n_hits"),
    )
    return per_q.agg(
        F.count("*").cast("long").alias("n_queries"),
        F.round(F.avg(F.coalesce(F.lit(1.0) / F.col("first_hit"), F.lit(0.0))), 6).alias(
            "mrr"
        ),
        F.round(F.avg(F.col("n_hits") / 10.0), 6).alias("mean_precision_at_10"),
    )


@register(
    "props_profile",
    oracle="""
    WITH kv AS (
        SELECT je.key AS key, je.value AS val
        FROM events, LATERAL (
            SELECT unnest(json_keys(props)) AS key,
                   json_extract_string(props, unnest(json_keys(props))) AS value
        ) je(key, value)
    )
    SELECT key,
           CASE WHEN regexp_matches(val, '^-?[0-9]+$') THEN 'integer'
                WHEN regexp_matches(val, '^-?[0-9]*\\.[0-9]+$') THEN 'double'
                ELSE 'string' END AS value_type,
           CAST(count(*) AS BIGINT) AS n_events
    FROM kv GROUP BY 1, 2
    """,
)
def props_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured payload profiling: key frequency × inferred value
    type over the events' JSON `props` — the schema-drift panel for an
    event feed (a new key appearing, or a key's type flipping
    integer→string, is the upstream-contract break an ingest pipeline
    must alarm on; complements sources/schema_changes.py which handles
    DECLARED Debezium schema changes).

    Map-side from_json to map<string,string> (no schema assumption beyond
    JSON-object-ness), explode entries, regex type sniff, one small
    aggregate keyed by (key, type) — cardinality = distinct keys × few
    types, so partial aggregation collapses the exchange to near-nothing
    at any scale."""
    ev = _t(spark, sf_dir, "events")
    kv = ev.select(
        F.explode(F.map_entries(F.from_json(F.col("props"), "map<string,string>"))).alias(
            "e"
        )
    ).select(
        F.col("e.key").alias("key"),
        F.when(F.col("e.value").rlike("^-?[0-9]+$"), "integer")
        .when(F.col("e.value").rlike("^-?[0-9]*\\.[0-9]+$"), "double")
        .otherwise("string")
        .alias("value_type"),
    )
    return kv.groupBy("key", "value_type").agg(
        F.count("*").cast("long").alias("n_events")
    )


@register(
    "retention_cohorts",
    oracle="""
    WITH e AS (SELECT user_id, epoch_ms(ts) AS ts_ms FROM events),
    f AS (SELECT user_id, min(ts_ms) AS t0 FROM e GROUP BY user_id),
    x AS (SELECT DISTINCT e.user_id,
                 (f.t0 // 604800000) * 604800000 AS cohort_week_ms,
                 (e.ts_ms // 604800000) - (f.t0 // 604800000) AS week_offset
          FROM e JOIN f USING (user_id))
    SELECT CAST(cohort_week_ms AS BIGINT) AS cohort_week_ms,
           CAST(week_offset AS BIGINT) AS week_offset,
           CAST(count(*) AS BIGINT) AS n_users
    FROM x GROUP BY 1, 2
    """,
    headline=True,
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by the epoch-aligned week of
    their FIRST event; cell (cohort, k) = distinct users of that cohort
    active k weeks later — the standard product-retention triangle.

    Plan: first-seen per user is one aggregate on user_id; the events
    re-join it ON THE SAME KEY (co-partitioned — the exchange from the
    aggregate is reused, no second full shuffle of the fact side); the
    (cohort, offset, user) distinct is the only remaining exchange and is
    bounded by distinct actives, not raw events. Weeks are fixed-width
    epoch arithmetic (timezone-free, matches the oracle exactly). At
    100 TB the first-seen frame is the thing to persist incrementally
    (it is append-only by definition: min(ts) never changes once a user
    exists — delta-maintain it like cdc_incremental_agg)."""
    W = 604_800_000
    e = _t(spark, sf_dir, "events").select("user_id", "ts_ms")
    first = e.groupBy("user_id").agg(F.min("ts_ms").alias("t0"))
    x = e.join(first, "user_id").select(
        "user_id",
        ((F.col("t0") / W).cast("long") * W).alias("cohort_week_ms"),
        ((F.col("ts_ms") / W).cast("long") - (F.col("t0") / W).cast("long")).alias(
            "week_offset"
        ),
    )
    return (
        x.distinct()
        .groupBy("cohort_week_ms", "week_offset")
        .agg(F.count("*").cast("long").alias("n_users"))
    )


@register(
    "event_transitions",
    oracle="""
    WITH e AS (SELECT user_id, epoch_ms(ts) AS ts_ms, event_id, event_type FROM events),
    s AS (SELECT user_id,
                 list_transform(
                     list_sort(list_zip(list(ts_ms), list(event_id), list(event_type))),
                     z -> z[3]) AS seq
          FROM e GROUP BY user_id),
    p AS (SELECT seq[i + 1] AS src, seq[i + 2] AS dst
          FROM s, LATERAL unnest(range(0, len(seq) - 1)) t(i)
          WHERE len(seq) >= 2),
    tr AS (SELECT src, dst, count(*) AS n FROM p GROUP BY src, dst),
    tot AS (SELECT src, sum(n) AS n_src FROM tr GROUP BY src)
    SELECT tr.src, tr.dst, CAST(tr.n AS BIGINT) AS n_transitions,
           round(tr.n * 1.0 / tot.n_src, 6) AS p_transition
    FROM tr JOIN tot USING (src)
    """,
)
def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams:
    P(next type | current type) with counts — the behavioral fingerprint
    (and the input to sequence-anomaly scoring; the event-type analogue
    of bigram_logprob's text model).

    ONE corpus shuffle: per-user ordered sequences via
    collect_list → array_sort (deterministic (ts, event_id) tiebreak,
    same shape as user_event_sequences), transitions built MAP-SIDE by a
    position HOF (no window, no self-join), then a |types|²-row count
    aggregate and a tiny normalizing join. Transition-matrix cardinality
    is independent of corpus size, so everything after the first exchange
    is constant-sized at any scale."""
    e = _t(spark, sf_dir, "events").select("user_id", "ts_ms", "event_id", "event_type")
    seq = e.groupBy("user_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("ts_ms", "event_id", "event_type"))),
            lambda s: s.event_type,
        ).alias("seq")
    )
    pair = F.transform(
        F.sequence(F.lit(0), F.size("seq") - 2),
        lambda i: F.struct(
            F.element_at(F.col("seq"), (i + 1).cast("int")).alias("src"),
            F.element_at(F.col("seq"), (i + 2).cast("int")).alias("dst"),
        ),
    )
    tr = (
        seq.filter(F.size("seq") >= 2)
        .select(F.explode(pair).alias("p"))
        .groupBy(F.col("p.src").alias("src"), F.col("p.dst").alias("dst"))
        .agg(F.count("*").alias("n"))
    )
    tot = tr.groupBy("src").agg(F.sum("n").alias("n_src"))
    return tr.join(tot, "src").select(
        "src",
        "dst",
        F.col("n").cast("long").alias("n_transitions"),
        F.round(F.col("n") / F.col("n_src"), 6).alias("p_transition"),
    )


@register(
    "dau_rolling",
    oracle="""
    WITH ud AS (SELECT DISTINCT user_id, epoch_ms(ts) // 86400000 AS day FROM events),
    dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY day),
    contrib AS (SELECT DISTINCT user_id, day + i AS day
                FROM ud, LATERAL unnest(range(0, 7)) t(i)),
    wau AS (SELECT day, count(*) AS wau FROM contrib GROUP BY day)
    SELECT CAST(dau.day * 86400000 AS BIGINT) AS day_ms,
           CAST(dau.dau AS BIGINT) AS dau,
           CAST(wau.wau AS BIGINT) AS wau
    FROM dau JOIN wau USING (day)
    """,
)
def dau_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU + trailing-7-day WAU per day — the rolling DISTINCT problem
    (windowed count_distinct is not decomposable, so no window frame can
    compute it). The scale-out trick: each (user, day) active pair
    CONTRIBUTES itself to the 7 days it keeps the user 'weekly active'
    for (explode of a 7-element sequence — map-side), then WAU is a plain
    distinct count per day. Shuffle volume is 7× the distinct
    (user, day) frame — already deduplicated, orders of magnitude below
    raw events — traded for decomposability; the alternative at extreme
    scale is merging per-day HLL sketches (approx_distinct's machinery)
    at 7× less shuffle but ±2% error, noted in-line. Emitted days are
    restricted to days with actual activity (semi-join on the DAU frame),
    so both engines enumerate the same day set."""
    D = 86_400_000
    e = _t(spark, sf_dir, "events").select(
        "user_id", (F.col("ts_ms") / D).cast("long").alias("day")
    )
    ud = e.distinct()
    dau = ud.groupBy("day").agg(F.count("*").cast("long").alias("dau"))
    contrib = ud.select(
        F.explode(F.sequence(F.col("day"), F.col("day") + 6)).alias("day"), "user_id"
    ).distinct()
    wau = contrib.groupBy("day").agg(F.count("*").cast("long").alias("wau"))
    return dau.join(wau, "day").select(
        (F.col("day") * D).alias("day_ms"), "dau", "wau"
    )


@register(
    "dau_rolling_hll",
    oracle="""
    WITH ud AS (SELECT DISTINCT user_id, epoch_ms(ts) // 86400000 AS day FROM events),
    contrib AS (SELECT DISTINCT user_id, day + i AS day
                FROM ud, LATERAL unnest(range(0, 7)) t(i)),
    wau AS (SELECT day, count(*) AS wau FROM contrib GROUP BY day),
    days AS (SELECT DISTINCT day FROM ud)
    SELECT CAST(wau.day * 86400000 AS BIGINT) AS day_ms,
           CAST(wau.wau AS BIGINT) AS wau_exact,
           TRUE AS hll_in_bound
    FROM wau JOIN days USING (day)
    """,
)
def dau_rolling_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day actives via MERGED DAILY HLL SKETCHES — the shape a
    100 TB deployment actually uses: one sketch per (day) is built from
    raw events (mergeable, tiny, persistable), and any trailing window is
    a UNION of 7 sketches — no re-touching of raw data, no 7× row
    amplification (contrast dau_rolling's exact contribute-forward
    explode). The estimate is checked IN-QUERY against the exact rolling
    distinct (same pattern as approx_distinct): the hashed output carries
    the exact value plus a boolean pinning |est − exact| ≤ 5%·exact, so
    the oracle (which cannot run datasketches) emits literal TRUE and the
    comparison still bites — a broken sketch path fails the hash-match.

    Plan: distinct (user, day) → per-day hll_sketch_agg (lgK=12 default,
    ±~1.6% rsd) → 7-day contribute-forward of the |days|-row sketch
    frame → hll_union_agg per day → estimate; exact side shares the
    distinct frame. Restricted to days with actual activity via a
    semi-join, matching the oracle's day set."""
    D = 86_400_000
    e = _t(spark, sf_dir, "events").select(
        "user_id", (F.col("ts_ms") / D).cast("long").alias("day")
    )
    ud = e.distinct()
    daily_sk = ud.groupBy("day").agg(F.hll_sketch_agg("user_id").alias("sk"))
    est = (
        daily_sk.select(
            F.explode(F.sequence(F.col("day"), F.col("day") + 6)).alias("day"), "sk"
        )
        .groupBy("day")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("wau_est"))
    )
    exact = (
        ud.select(
            F.explode(F.sequence(F.col("day"), F.col("day") + 6)).alias("day"),
            "user_id",
        )
        .distinct()
        .groupBy("day")
        .agg(F.count("*").cast("long").alias("wau_exact"))
    )
    days = ud.select("day").distinct()
    return (
        exact.join(est, "day")
        .join(days, "day", "left_semi")
        .select(
            (F.col("day") * D).alias("day_ms"),
            "wau_exact",
            (
                F.abs(F.col("wau_est") - F.col("wau_exact"))
                <= 0.05 * F.col("wau_exact")
            ).alias("hll_in_bound"),
        )
    )


@register(
    "cdc_before_image",
    oracle=f"""
    {_CH},
    live AS (
        SELECT ch.* FROM ch
        CROSS JOIN (SELECT coalesce(max(ev_offset), -1) AS t_off
                    FROM ch WHERE op = 't') ep
        WHERE ch.ev_offset > ep.t_off AND ch.op <> 't'
    ),
    v AS (
        SELECT user_id, op, val AS last_value, ev_offset AS valid_from,
               lead(ev_offset) OVER (PARTITION BY user_id ORDER BY ev_offset)
                   AS valid_to
        FROM live
    ),
    hist AS (SELECT * FROM v WHERE op <> 'd'),
    f AS (SELECT ev_offset AS event_offset, user_id, op FROM ch)
    SELECT f.event_offset, f.user_id, f.op,
           hist.last_value AS before_value,
           hist.valid_from AS before_since_offset
    FROM f JOIN hist ON f.user_id = hist.user_id
    WHERE hist.valid_from < f.event_offset
      AND (hist.valid_to IS NULL OR f.event_offset <= hist.valid_to)
    """,
)
def cdc_before_image(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reconstruct every change event's BEFORE image from the SCD2
    history — the ``payload.before`` field Debezium ships with each
    envelope (insert.json:4-163), recomputed from state: the version in
    effect immediately before the event applied is the unique interval
    with valid_from < offset ≤ valid_to (the event that closed a version
    IS that version's valid_to, so each event matches exactly one — a
    CDC audit: what state did each update overwrite, what value did each
    delete remove. Events whose user had no live prior version (first
    insert of a key, pre-truncate history) have no before image and drop
    out of the inner join.

    Plan: SCD2 history (one key-partitioned lead() window) joined to the
    changelog ON THE KEY with the interval predicate as the join filter —
    an equi-shuffle join both sides partitioned by user_id, never a
    BroadcastNestedLoopJoin (same co-partitioning class as the collapse);
    the ≤1-match guarantee keeps output ≤ input. Point-in-time dimension
    enrichment of an arbitrary fact table is this same plan with the
    fact's event time in place of the offset."""
    from .sources.changelog import derive_changelog

    scd2 = REGISTRY["cdc_scd2"].fn(spark, sf_dir)
    ch = derive_changelog(_t(spark, sf_dir, "events"))
    f = ch.select("ev_offset", "user_id", "op")
    return (
        f.join(scd2, "user_id")
        .filter(
            (F.col("valid_from") < F.col("ev_offset"))
            & (F.col("valid_to").isNull() | (F.col("ev_offset") <= F.col("valid_to")))
        )
        .select(
            F.col("ev_offset").alias("event_offset"),
            "user_id",
            "op",
            F.col("last_value").alias("before_value"),
            F.col("valid_from").alias("before_since_offset"),
        )
    )


@register(
    "quality_deciles",
    oracle="""
    WITH t AS (SELECT doc_id, len(string_split(lower(text), ' ')) AS n_toks
               FROM documents),
    thr AS (SELECT list_transform(
                quantile_cont(n_toks, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]),
                x -> round(x, 4)) AS thr
            FROM t),
    dec AS (SELECT doc_id, n_toks,
                   len(list_filter(thr.thr, x -> n_toks > x)) + 1 AS decile
            FROM t CROSS JOIN thr)
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(n_toks) AS BIGINT) AS min_tokens,
           CAST(max(n_toks) AS BIGINT) AS max_tokens
    FROM dec GROUP BY decile
    """,
)
def quality_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile bucketing by a computed score (token count here; any quality
    signal drops in): exact P10..P90 thresholds in ONE 1-row aggregate,
    broadcast to a map-side bucket assignment (count of thresholds below
    the value, via an array-filter HOF — no per-row join, no ntile()
    global window, which would single-partition the corpus). Thresholds
    are rounded to 4dp on both engines BEFORE comparison so the integer
    bucket decisions are bit-identical (Spark percentile and DuckDB
    quantile_cont share linear interpolation). At 100 TB swap the exact
    percentile for percentile_approx (t-digest, mergeable) — same plan,
    documented error; the assignment stage is unchanged."""
    from .functions import words

    d = _t(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.size(words(F.col("text"))).cast("long").alias("n_toks"))
    qs = [i / 10.0 for i in range(1, 10)]
    thr = toks.agg(
        F.transform(
            F.percentile("n_toks", F.array(*[F.lit(q) for q in qs])),
            lambda x: F.round(x, 4),
        ).alias("thr")
    )
    dec = toks.crossJoin(F.broadcast(thr)).select(
        "doc_id",
        "n_toks",
        (F.size(F.filter(F.col("thr"), lambda t: F.col("n_toks") > t)) + 1)
        .cast("long")
        .alias("decile"),
    )
    return dec.groupBy("decile").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.min("n_toks").cast("long").alias("min_tokens"),
        F.max("n_toks").cast("long").alias("max_tokens"),
    )


@register(
    "interval_join_preagg",
    oracle="""
    WITH e AS (SELECT event_id, epoch_ms(ts) AS ts_ms, event_type,
                      CAST(round(value * 100) AS BIGINT) AS cents FROM events),
    i AS (SELECT event_id AS incident_id, ts_ms AS lo, ts_ms + 600000 AS hi
          FROM e WHERE event_type = 'error')
    SELECT incident_id, CAST(lo AS BIGINT) AS incident_start_ms,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(cents) AS BIGINT) AS sum_cents
    FROM i JOIN e ON e.ts_ms >= i.lo AND e.ts_ms < i.hi
    GROUP BY incident_id, lo
    """,
)
def interval_join_preagg_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """interval_join_bucketed's aggregate-only sibling: the same incident
    windows, but count/sum computed from PRE-AGGREGATED fine buckets +
    exact edge correction — no (event, interval) pair enumeration. This
    is the answer to the sf1 scale check's one super-linear query: pair
    density² drops out of the cost for decomposable aggregates (DISTINCT
    consumers still need the enumerating form). Same oracle as
    interval_join_bucketed minus n_users; equality of the two Spark
    formulations is pinned in tests. See
    operators/temporal.interval_join_preagg for the bucket algebra."""
    from .operators.temporal import interval_join_preagg

    W = 600_000
    e = _t(spark, sf_dir, "events").select(
        "event_id",
        "ts_ms",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        "event_type",
    )
    inc = e.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("incident_id"),
        F.col("ts_ms").alias("lo"),
        (F.col("ts_ms") + W).alias("hi"),
    )
    res = interval_join_preagg(
        e.select("ts_ms", "cents"), inc, "ts_ms", "lo", "hi", 60_000, "cents"
    )
    return res.select(
        "incident_id",
        F.col("lo").alias("incident_start_ms"),
        "n_events",
        F.col("sum_value").alias("sum_cents"),
    )


@register(
    "session_stats",
    oracle="""
    WITH o AS (
        SELECT event_id, user_id, epoch_ms(ts) AS ts_ms,
               CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL
                         OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > 1800000
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)
    ),
    s AS (
        SELECT *, CAST(sum(new_sess) OVER (
            PARTITION BY user_id ORDER BY ts_ms, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        FROM o
    ),
    per AS (SELECT user_id, session_id, count(*) AS n_events,
                   max(ts_ms) - min(ts_ms) AS duration_ms
            FROM s GROUP BY user_id, session_id)
    SELECT CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           round(avg(n_events), 4) AS avg_events,
           CAST(max(n_events) AS BIGINT) AS max_events,
           round(avg(duration_ms), 4) AS avg_duration_ms,
           round(avg(CASE WHEN n_events = 1 THEN 1.0 ELSE 0.0 END), 4)
               AS single_event_fraction
    FROM per
    """,
)
def session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-quality panel over the sessionize operator (30-min
    inactivity gap): session counts, events-per-session, duration, and
    the single-event-session fraction (the bounce-rate analogue — a
    spike means the gap parameter or the event feed broke). Reuses the
    sessionize plan (one key-partitioned window pass) and adds a
    constant-size final rollup; the DISTINCT users count rides the same
    aggregate via Expand. At 100 TB this is the side output of the same
    scan that materializes the session table — never a second pass."""
    sess = REGISTRY["sessionize"].fn(spark, sf_dir)
    per = sess.select(
        "user_id",
        "n_events",
        (F.col("session_end") - F.col("session_start")).alias("duration_ms"),
    )
    return per.agg(
        F.count("*").cast("long").alias("n_sessions"),
        F.count_distinct("user_id").cast("long").alias("n_users"),
        F.round(F.avg("n_events"), 4).alias("avg_events"),
        F.max("n_events").cast("long").alias("max_events"),
        F.round(F.avg("duration_ms"), 4).alias("avg_duration_ms"),
        F.round(F.avg(F.when(F.col("n_events") == 1, 1.0).otherwise(0.0)), 4).alias(
            "single_event_fraction"
        ),
    )


@register(
    "interval_join_distinct_hll",
    oracle="""
    WITH e AS (SELECT event_id, epoch_ms(ts) AS ts_ms, user_id, event_type
               FROM events),
    i AS (SELECT event_id AS incident_id, ts_ms AS lo, ts_ms + 600000 AS hi
          FROM e WHERE event_type = 'error')
    SELECT incident_id, CAST(lo AS BIGINT) AS incident_start_ms,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users_exact,
           TRUE AS hll_in_bound
    FROM i JOIN e ON e.ts_ms >= i.lo AND e.ts_ms < i.hi
    GROUP BY incident_id, lo
    """,
)
def interval_join_distinct_hll_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Completes the interval-join triptych: enumerate for arbitrary
    consumers (interval_join_bucketed), pre-aggregate for count/sum
    (interval_join_preagg), and per-bucket HLL SKETCHES for DISTINCT —
    interior = union of contained buckets' sketches, edges sketched
    exactly; no (event, interval) pair ever materializes. The hashed
    output carries the exact distinct count (computed via the
    enumerating join here, the oracle via its theta join) plus an
    in-query |est − exact| ≤ 5% boolean — the oracle emits literal TRUE,
    so a broken sketch path fails the hash-match (the dau_rolling_hll /
    approx_distinct pattern). At 100 TB the per-bucket sketch table IS
    the index: tiny, mergeable, incrementally maintainable, and any
    ad-hoc interval's distinct is a few-row sketch union."""
    from .operators.temporal import interval_join_bucketed, interval_join_distinct_hll

    W = 600_000
    e = _t(spark, sf_dir, "events").select("event_id", "ts_ms", "user_id", "event_type")
    inc = e.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("incident_id"),
        F.col("ts_ms").alias("lo"),
        (F.col("ts_ms") + W).alias("hi"),
    )
    # WINDOW FACTORIZATION (r8 survival sweep): both the sketch estimate
    # and the exact distinct are pure functions of the WINDOW (lo, hi) —
    # incidents sharing a timestamp share every output value — so both
    # legs compute once per DISTINCT window and expand through the
    # incident → window membership join. At 100× bench scale the
    # replicas repeat timestamps and 2M incidents collapse to ~19.8k
    # windows: the per-incident form shipped ~2M sketch-carrying rows
    # through the interior union + a ~9.4B-row pair stream through the
    # exact distinct (JVM-OOM-dead at the default heap); factorized, the
    # whole entry is seconds. Same compute-per-equivalence-class algebra
    # as the dedup factorizations; distinct-window corpora pay only the
    # cheap dedup pass. The exact leg's early distinct (map-side partial
    # dedup, NULL users excluded to match count(DISTINCT)) replaces a
    # countDistinct whose Expand carried the full pair stream.
    win = inc.select("lo", "hi").distinct()
    est = interval_join_distinct_hll(
        e.select("ts_ms", "user_id"), win, "ts_ms", "lo", "hi", 60_000, "user_id"
    )
    pairs = interval_join_bucketed(e.select("ts_ms", "user_id"), win, "ts_ms", "lo", "hi", W)
    exact = (
        pairs.filter(F.col("user_id").isNotNull())
        .select("lo", "hi", "user_id")
        .distinct()
        .groupBy("lo", "hi")
        .agg(F.count("*").alias("n_users"))
    )
    per_window = exact.join(est, ["lo", "hi"])
    return inc.join(per_window, ["lo", "hi"]).select(
        "incident_id",
        F.col("lo").alias("incident_start_ms"),
        F.col("n_users").cast("long").alias("n_users_exact"),
        (
            F.abs(F.col("n_distinct_est") - F.col("n_users"))
            <= 0.05 * F.col("n_users")
        ).alias("hll_in_bound"),
    )


def _wordpiece_oracle_setup(con) -> None:
    """Register the expected wordpiece stats as a DuckDB view computed by
    an INDEPENDENT reference implementation (plain Python over the same
    parquet — written here, not imported from operators/text.py, so the
    check is engine-vs-reimplementation, never self-vs-self)."""
    from collections import Counter

    import pandas as pd

    docs = con.execute("SELECT doc_id, text FROM documents").df()
    wc: Counter = Counter()
    alphabet: set[str] = set()
    for t in docs["text"]:
        if t is None:
            continue
        lt = t.lower()
        alphabet.update(c for c in lt if c not in (" ", ""))
        wc.update(w for w in lt.split(" ") if w)
    top = sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    vocab = {w for w, _ in top} | alphabet | {"##" + c for c in alphabet}

    def encode_len(word: str) -> "tuple[int, bool]":
        # returns (n_pieces, is_unk) under greedy longest-match
        pieces = 0
        i, first = 0, True
        while i < len(word):
            j = next(
                (
                    j
                    for j in range(len(word), i, -1)
                    if (word[i:j] if first else "##" + word[i:j]) in vocab
                ),
                None,
            )
            if j is None:
                return 1, True
            pieces += 1
            i, first = j, False
        return pieces, False

    rows = []
    for did, t in zip(docs["doc_id"], docs["text"]):
        if t is None:
            rows.append((int(did), 0, 0, 0, None))
            continue
        ws = [w for w in t.lower().split(" ") if w]
        n_sub = n_unk = 0
        for w in ws:
            k, unk = encode_len(w)
            n_sub += k
            n_unk += unk
        rows.append(
            (
                int(did),
                len(ws),
                n_sub,
                n_unk,
                round(n_sub / len(ws), 4) if ws else None,
            )
        )
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "n_words", "n_subwords", "n_unk_words", "fertility"]
    )
    con.register("wordpiece_expected", pdf)


@register(
    "tokenize_wordpiece",
    oracle="""
    SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(n_words AS BIGINT) AS n_words,
           CAST(n_subwords AS BIGINT) AS n_subwords,
           CAST(n_unk_words AS BIGINT) AS n_unk_words,
           CAST(fertility AS DOUBLE) AS fertility
    FROM wordpiece_expected
    """,
    oracle_setup=_wordpiece_oracle_setup,
)
def tokenize_wordpiece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subword tokenization statistics under a WordPiece-style greedy
    longest-match tokenizer whose vocab is derived deterministically from
    the corpus itself (top-20 words + character alphabet in initial and
    '##'-continuation form): per-doc word/subword/[UNK] counts and the
    FERTILITY ratio (subwords per word) — the number that converts a
    corpus's word count into the sequence-length budget a training run
    actually consumes. Out-of-vocab words split into pieces (fertility
    > 1); out-of-alphabet words collapse to [UNK] (counted, never
    silently dropped).

    Hash-checked since r5 against an INDEPENDENT plain-Python reference
    implementation registered as a DuckDB view (no SQL expresses the
    iterative greedy loop; the driver's vanilla gate still sees this
    rows-only). The pytest pins stay — golden encodings, a round-trip
    property (stripping '##' reconstructs every non-UNK word), fertility
    bounds, determinism. Scale shape: two tiny vocab aggregates, then
    ONE Arrow-batched map over the corpus — no shuffle, closure-shipped
    vocab, O(batch) memory."""
    from .operators.text import wordpiece_stats, wordpiece_vocab

    d = spread(_t(spark, sf_dir, "documents"))
    vocab = wordpiece_vocab(d, top_k=20)
    return wordpiece_stats(d, vocab)


@register(
    "dedup_cluster_stats",
    # Same (source, word-set) factorized closure as dedup_clusters
    # (NOTES r6): the recursive walk covers representatives only, and
    # cluster sizes aggregate group COUNTS — no per-doc label row ever
    # materializes. Identical output to the unfactorized closure.
    oracle="""
    WITH RECURSIVE w AS (SELECT doc_id, source,
                                list_distinct(string_split(lower(text), ' ')) AS ws
               FROM documents),
    keyed AS (SELECT doc_id, source, ws,
                     md5(source || chr(1) ||
                         list_aggregate(list_sort(ws), 'string_agg', chr(0))) AS k
              FROM w),
    grp AS (SELECT k, min(doc_id) AS rid, count(*) AS n,
                   any_value(source) AS source, any_value(ws) AS ws
            FROM keyed GROUP BY k),
    rep_pairs AS (
        SELECT a.rid AS pa, b.rid AS pb
        FROM grp a JOIN grp b ON a.source = b.source AND a.rid < b.rid
        -- length-ratio prune (implied by jaccard >= 0.95) mirrors the
        -- engine's O(1) candidate filter
        WHERE len(a.ws) >= 0.95 * len(b.ws) AND len(b.ws) >= 0.95 * len(a.ws)
          AND round(len(list_intersect(a.ws, b.ws)) * 1.0
                    / len(list_distinct(list_concat(a.ws, b.ws))), 4) >= 0.95
    ),
    edges AS (SELECT pa AS a, pb AS b FROM rep_pairs
              UNION SELECT pb, pa FROM rep_pairs),
    reach AS (
        SELECT a, b FROM edges
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ),
    rep_label AS (SELECT a AS rid, least(a, min(b)) AS rc
                  FROM reach GROUP BY a),
    comp AS (SELECT coalesce(rl.rc, g.rid) AS cluster_id, g.n
             FROM grp g LEFT JOIN rep_label rl ON rl.rid = g.rid
             WHERE rl.rid IS NOT NULL OR g.n >= 2),
    sizes AS (SELECT cluster_id, sum(n) AS sz FROM comp GROUP BY cluster_id),
    hist AS (SELECT sz AS cluster_size, count(*) AS n_clusters FROM sizes GROUP BY sz),
    singles AS (
        SELECT 1 AS cluster_size,
               (SELECT count(*) FROM documents)
                   - coalesce((SELECT sum(n) FROM comp), 0) AS n_clusters
    )
    SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
           CAST(n_clusters AS BIGINT) AS n_clusters
    FROM hist
    UNION ALL
    SELECT CAST(cluster_size AS BIGINT), CAST(n_clusters AS BIGINT)
    FROM singles WHERE n_clusters > 0
    """,
)
def dedup_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster size distribution — the dedup dashboard number
    that sets expectations for corpus shrinkage (Σ (size−1)·n_clusters
    docs will be removed) and flags template explosions (one giant
    cluster = a boilerplate page mirrored everywhere). Singleton count =
    corpus − clustered docs (a cluster from pair edges always has
    size ≥ 2, so the size-1 row is unambiguous).

    Plan: the fused ngram_jaccard_clusters (SCALE100 r7 — sixth 100×
    disease: the previous pairs → dup_clusters form propagated labels
    over the FULL pair list, and the 121M clone-clique edges at sf10
    blew the label-propagation aggregate's memory; the fused operator's
    factorized path walks the (source, word-set) REPRESENTATIVE graph
    and expands through group membership, provably the same components —
    exactly what this entry's own oracle has done since r6), then two
    tiny aggregates and a 1-row arithmetic union; everything after the
    pair generation is cluster-count-sized."""
    from .operators.dedup import ngram_jaccard_clusters

    d = _t(spark, sf_dir, "documents")
    labeled = ngram_jaccard_clusters(d, threshold=0.95)
    hist = (
        labeled.groupBy("cluster_id")
        .agg(F.count("*").alias("sz"))
        .groupBy("sz")
        .agg(F.count("*").cast("long").alias("n_clusters"))
        .select(F.col("sz").cast("long").alias("cluster_size"), "n_clusters")
    )
    totals = d.agg(F.count("*").alias("n_docs")).crossJoin(
        F.broadcast(labeled.agg(F.count("*").alias("n_clustered")))
    )
    singles = totals.select(
        F.lit(1).cast("long").alias("cluster_size"),
        (F.col("n_docs") - F.col("n_clustered")).cast("long").alias("n_clusters"),
    ).filter(F.col("n_clusters") > 0)
    return hist.unionByName(singles)


@register(
    "user_activity_gini",
    oracle="""
    WITH pu AS (SELECT user_id, count(*) AS n FROM events GROUP BY user_id),
    r AS (SELECT *, row_number() OVER (ORDER BY n, user_id) AS i FROM pu),
    tot AS (SELECT count(*) AS nu, sum(n) AS te FROM r)
    SELECT CAST(tot.nu AS BIGINT) AS n_users,
           CAST(tot.te AS BIGINT) AS n_events,
           round((2.0 * sum(r.i * r.n)) / (tot.nu * tot.te)
                 - (tot.nu + 1.0) / tot.nu, 6) AS gini,
           round(sum(CASE WHEN r.i > tot.nu * 0.9 THEN r.n ELSE 0 END) * 1.0
                 / tot.te, 6) AS top10pct_share
    FROM r CROSS JOIN tot
    GROUP BY tot.nu, tot.te
    """,
)
def user_activity_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity-concentration diagnostic: exact Gini coefficient of
    events-per-user plus the top-decile share — the number that says
    whether per-key operators (collapse, funnel, sequences) face a
    uniform key space or a hot-key regime that needs salting/AQE skew
    handling. Gini = (2·Σ i·x_(i))/(n·Σx) − (n+1)/n over
    ascending-sorted per-user counts.

    Fully distributed ranking — NO per-user rank is ever materialized
    (the r4 form ran one global single-partition window over the user
    frame; this one has no SinglePartition exchange at all). Gini is
    tie-invariant, so users are grouped by activity level ``n``: a tie
    group of ``c`` users spanning ranks (o, o+c] contributes exactly
    n·(c·o + c(c+1)/2) to Σ i·x_(i), and the top-decile test
    i > nu·0.9 admits max(0, (o+c) − max(o, floor(nu·0.9))) of them
    (each worth n events) — identical doubles to the oracle's per-user
    CASE. The frame shrinks |events| → |users| → |distinct activity
    levels| (bounded by max events/user, ~10⁵ even at 100 TB); prefix
    offsets ``o`` over that frame distribute via floor(log2(n))
    segments — value-derived (deterministic) and order-aligned
    (n₁<n₂ ⟹ seg₁≤seg₂), ≤64 of them, so the cumulative count is a
    within-segment window plus a driver-side prefix-sum of the ≤64
    segment totals shipped back as a literal map. Spark forbids
    count(*) nested inside sum() (the oracle's correlated form), so
    the totals ride a broadcast crossJoin instead."""
    e = _t(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(F.count("*").alias("n"))
    per_n = per_user.groupBy("n").agg(F.count("*").alias("c")).withColumn(
        "seg", F.floor(F.log2("n")).cast("int")
    )
    seg_tot = {
        r["seg"]: r["t"]
        for r in per_n.groupBy("seg").agg(F.sum("c").alias("t")).collect()
    }
    off, acc = {}, 0
    for s in sorted(seg_tot):
        off[s] = acc
        acc += seg_tot[s]
    if off:
        # explicit casts: F.lit picks int vs bigint by magnitude and
        # create_map requires uniform key/value types
        off_expr = F.create_map(
            *[
                x
                for s, o in off.items()
                for x in (F.lit(s).cast("int"), F.lit(o).cast("long"))
            ]
        )[F.col("seg")]
    else:  # empty events: any expression works, zero rows flow through
        off_expr = F.lit(0).cast("long")
    w = (
        Window.partitionBy("seg")
        .orderBy("n")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = per_n.withColumn("cum", F.sum("c").over(w)).withColumn(
        "o", off_expr + F.col("cum") - F.col("c")
    )
    tot = per_n.agg(
        F.sum("c").alias("nu"), F.sum(F.col("n") * F.col("c")).alias("te")
    )
    j = ranked.crossJoin(F.broadcast(tot))
    # Σ i·x over the tie group; c·(c+1) is always even so DIV 2 is exact
    i_dot_x = F.col("n") * (
        F.col("c") * F.col("o") + F.expr("c * (c + 1) DIV 2")
    )
    thresh = F.floor(F.col("nu") * 0.9)  # i > nu·0.9 ⟺ i ≥ floor(nu·0.9)+1
    qual = F.greatest(
        F.lit(0).cast("long"),
        F.col("o") + F.col("c") - F.greatest(F.col("o"), thresh),
    )
    return j.groupBy("nu", "te").agg(
        F.round(
            (2.0 * F.sum(i_dot_x)) / (F.col("nu") * F.col("te"))
            - (F.col("nu") + 1.0) / F.col("nu"),
            6,
        ).alias("gini"),
        F.round(
            F.sum(F.col("n") * qual) / F.col("te"),
            6,
        ).alias("top10pct_share"),
    ).select(
        F.col("nu").cast("long").alias("n_users"),
        F.col("te").cast("long").alias("n_events"),
        "gini",
        "top10pct_share",
    )


@register(
    "seasonality_matrix",
    oracle="""
    SELECT CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
           CAST(hour(ts) AS BIGINT) AS hour,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
    FROM events GROUP BY 1, 2
    """,
)
def seasonality_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day × day-of-week activity matrix — the capacity-planning
    / anomaly-baseline panel (traffic shape repeats weekly; a cell far
    off its column's baseline is the alert). Map-side calendar
    extraction + one ≤168-group aggregate: partial aggregation collapses
    every scan partition to at most a week's worth of cells, so the
    exchange is constant-size at any scale. Integer cents keep the sums
    order-free; Spark's dayofweek (Sun=1) aligns to DuckDB's (Sun=0)
    via +1 in the oracle. Timestamps are UTC-interpreted on both
    engines (machine runs UTC — the registry's timestamp convention)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.select(
            F.dayofweek("ts").cast("long").alias("dow"),
            F.hour("ts").cast("long").alias("hour"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .groupBy("dow", "hour")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum("cents").cast("long").alias("sum_cents"),
        )
    )


@register(
    "curation_impact",
    oracle=f"""
    WITH toks AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
                  FROM documents),
    c AS (SELECT doc_id, tok, count(*) AS n FROM toks GROUP BY doc_id, tok),
    a AS (SELECT doc_id,
                 sum(n) AS n_words,
                 round(sum(length(tok) * n) * 1.0 / sum(n), 4) AS mean_word_len,
                 coalesce(sum(n) FILTER (WHERE tok IN {_STOP_RULES_SQL}), 0)
                     AS n_stopwords,
                 round(max(n) * 1.0 / sum(n), 4) AS top_word_fraction
          FROM c GROUP BY doc_id),
    s1 AS (SELECT d.doc_id, d.source, d.text FROM documents d JOIN a USING (doc_id)
           WHERE a.n_words BETWEEN 20 AND 1000
             AND a.mean_word_len BETWEEN 3 AND 6
             AND a.n_stopwords >= 2 AND a.top_word_fraction <= 0.15),
    s2 AS (SELECT * FROM s1 WHERE doc_id IN (
               SELECT min(doc_id) FROM s1 GROUP BY md5(lower(text)))),
    w2 AS (SELECT doc_id, source,
                  list_distinct(string_split(lower(text), ' ')) AS ws FROM s2),
    losers AS (SELECT DISTINCT b.doc_id
               FROM w2 a JOIN w2 b ON a.source = b.source AND a.doc_id < b.doc_id
               -- length-ratio prune (implied by jaccard >= 0.95)
               WHERE len(a.ws) >= 0.95 * len(b.ws) AND len(b.ws) >= 0.95 * len(a.ws)
                 AND round(len(list_intersect(a.ws, b.ws)) * 1.0
                           / len(list_distinct(list_concat(a.ws, b.ws))), 4) >= 0.95),
    s3 AS (SELECT * FROM s2 WHERE doc_id NOT IN (SELECT doc_id FROM losers)),
    s4 AS (SELECT * FROM (
               SELECT doc_id, row_number() OVER (
                   PARTITION BY source
                   ORDER BY (doc_id * 1103515245 + 12345) % 2147483648, doc_id) AS rn
               FROM s3) WHERE rn <= 10)
    SELECT * FROM (
        SELECT CAST(0 AS BIGINT) AS stage, 'raw' AS stage_name,
               CAST(count(*) AS BIGINT) AS n_docs FROM documents
        UNION ALL SELECT 1, 'quality_rules', CAST(count(*) AS BIGINT) FROM s1
        UNION ALL SELECT 2, 'exact_dedup', CAST(count(*) AS BIGINT) FROM s2
        UNION ALL SELECT 3, 'near_dedup', CAST(count(*) AS BIGINT) FROM s3
        UNION ALL SELECT 4, 'per_source_cap', CAST(count(*) AS BIGINT) FROM s4
    )
    """,
)
def curation_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation stack's survival funnel in ONE query: how many
    documents remain after each stage — Gopher/C4 quality rules → exact
    dedup (canonical-fingerprint min-id survivor) → near-dup removal
    (blocked jaccard ≥ 0.95, pairwise greater-id loser; the
    cluster-representative form is dedup_clusters — identical on
    cliques, stricter on chains, documented) → per-source cap (≤10, LCG
    order). This is the report a pipeline owner reads before committing
    a config change: each stage's marginal removal rate, composed from
    the SAME operator implementations the standalone entries use (one
    divergence would break the oracle hash).

    Scale shape: each stage consumes the previous survivor set — the
    quality metrics pipeline is the only full-corpus token pass;
    exact-dedup groups only quality survivors; the quadratic near-dup
    verify runs only inside (source)-blocks of exact-survivors; the cap
    windows only near-dup survivors. Five 1-row counts union at the
    end."""
    from .operators.dedup import ngram_jaccard_pairs
    from .operators.text import quality_rule_flags, quality_rule_metrics

    d = spread(_t(spark, sf_dir, "documents"))
    s1 = d.join(
        quality_rule_flags(quality_rule_metrics(d)).filter("passes").select("doc_id"),
        "doc_id",
        "left_semi",
    )
    keep2 = s1.groupBy(F.md5(F.lower(F.col("text"))).alias("fp")).agg(
        F.min("doc_id").alias("doc_id")
    )
    s2 = s1.join(keep2.select("doc_id"), "doc_id", "left_semi")
    losers = ngram_jaccard_pairs(s2, threshold=0.95).select(
        F.col("doc_id_b").alias("doc_id")
    )
    s3 = s2.join(losers, "doc_id", "left_anti")
    hk = (F.col("doc_id") * 1103515245 + 12345) % 2147483648
    w = Window.partitionBy("source").orderBy(hk.asc(), F.col("doc_id").asc())
    s4 = s3.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 10)

    def stage(i, name, df):
        return df.agg(
            F.lit(i).cast("long").alias("stage"),
            F.lit(name).alias("stage_name"),
            F.count("*").cast("long").alias("n_docs"),
        )

    return (
        stage(0, "raw", d)
        .unionByName(stage(1, "quality_rules", s1))
        .unionByName(stage(2, "exact_dedup", s2))
        .unionByName(stage(3, "near_dedup", s3))
        .unionByName(stage(4, "per_source_cap", s4))
    )
