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

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .config import USER_VALUE
from .operators import cdc
from .sources.changelog import CHANGELOG_ORACLE_CTE, derive_changelog
from .sources.tables import load_table


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None → driver does a rows-only check
    headline: bool = False  # include in bench.py


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, headline: bool = False):
    def deco(fn):
        REGISTRY[name] = QuerySpec(name, fn, oracle, headline)
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, name, sf_dir)


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
    (reference apply loop, main.py:47-93)."""
    return cdc.collapse_changelog(_changelog(spark, sf_dir), USER_VALUE)


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
           round(sum(l_extendedprice), 2)                                 AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)              AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 2)                                      AS avg_qty,
           round(avg(l_extendedprice), 2)                                 AS avg_price,
           round(avg(l_discount), 2)                                      AS avg_disc,
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
    comparisons use NTZ literals so no session-timezone cast sneaks in."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 2).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
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
    small enough. Tie-break on orderkey keeps top-10 deterministic."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")
    )
    l = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")
    )
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select(
            "l_orderkey",
            "revenue",
            # date_format on NTZ formats the wall-clock value — tz-free
            F.date_format(F.col("o_orderdate"), "yyyy-MM-dd").alias("o_orderdate_str"),
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_region_revenue",
    oracle="""
    SELECT n.n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
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
    mid-size dims."""
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
    )
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    return (
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
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


# ===========================================================================
# Event-time windows [EXT E8] + window functions over the events stream.
# ===========================================================================


@register(
    "window_tumbling",
    oracle="""
    SELECT (epoch_ms(ts) // 3600000) * 3600000 AS win_start,
           event_type,
           count(*) AS n,
           round(sum(value), 2) AS sum_value
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
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.unix_millis(F.col("w.start")).alias("win_start"),
            "event_type",
            "n",
            "sum_value",
        )
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
           round(sum(value), 2) AS sum_value,
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
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.min("ts_ms").alias("session_start"),
            F.max("ts_ms").alias("session_end"),
        )
    )
