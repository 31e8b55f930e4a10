"""Query registry: every operator exposed as (spark callable, oracle SQL).

This is the engine's public correctness surface. Each entry maps a name to
a Spark implementation ``(spark, sf_dir) -> DataFrame`` plus (where SQL-
expressible) an ANSI-SQL string DuckDB runs on the same parquet tables.
Column names are aliased identically on both sides — the driver's compare
sorts columns by name and hashes values.

Determinism rules used throughout:
- money aggregates go through DECIMAL (exact, associative) and are cast
  back to DOUBLE at the end — float sum order can't perturb the hash;
- every ratio/score is rounded; ranking windows always carry a unique
  tiebreaker column;
- timestamps stay in UTC (session timezone pinned in session.py).
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd  # noqa: F401 — pandas-UDF type hints resolve here

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions import text as tx
from .operators import _cache as op_cache
from .operators import asof as asof_mod
from .operators import dedup as dedup_mod
from .operators import graph as graph_mod
from .operators import multimodal as mm_mod
from .operators import similarity as sim_mod
from .operators import skew as skew_mod
from .sources.catalog import load_table

SparkQuery = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, SparkQuery] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: SparkQuery) -> SparkQuery:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def queries() -> dict[str, SparkQuery]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Relational core (SURVEY §2.8 — supplied by Spark, verified vs DuckDB)
# ---------------------------------------------------------------------------

_DEC = "DECIMAL(18,2)"
_DEC4 = "DECIMAL(18,4)"


@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(ROUND(SUM(CAST(l_quantity AS {_DEC})), 2) AS DOUBLE) AS sum_qty,
           CAST(ROUND(SUM(CAST(l_extendedprice AS {_DEC})), 2) AS DOUBLE) AS sum_base_price,
           CAST(ROUND(SUM(CAST(l_extendedprice AS {_DEC}) * CAST(1 - l_discount AS {_DEC4})), 2) AS DOUBLE) AS sum_disc_price,
           CAST(ROUND(SUM(CAST(l_extendedprice AS {_DEC}) * CAST(1 - l_discount AS DECIMAL(9,4)) * CAST(1 + l_tax AS DECIMAL(9,4))), 2) AS DOUBLE) AS sum_charge,
           ROUND(AVG(l_quantity), 6) AS avg_qty,
           ROUND(AVG(l_discount), 6) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: scan + filter + hash aggregate.
    Filter pushes to the parquet scan; partial aggregation is map-side."""
    li = _t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast(_DEC)  # noqa: E731
    dec4 = lambda e: e.cast(_DEC4)  # noqa: E731
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(dec("l_quantity")), 2).cast("double").alias("sum_qty"),
            F.round(F.sum(dec("l_extendedprice")), 2).cast("double").alias("sum_base_price"),
            F.round(
                F.sum(dec("l_extendedprice") * dec4(F.lit(1) - F.col("l_discount"))), 2
            )
            .cast("double")
            .alias("sum_disc_price"),
            # factor casts sized so the triple product is exactly
            # (18,2)×(9,4)×(9,4) → decimal(38,10): fits the 38-precision cap
            # in BOTH engines, so no mid-expression trimming can diverge
            F.round(
                F.sum(
                    dec("l_extendedprice")
                    * (F.lit(1) - F.col("l_discount")).cast("decimal(9,4)")
                    * (F.lit(1) + F.col("l_tax")).cast("decimal(9,4)")
                ),
                2,
            )
            .cast("double")
            .alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           CAST(ROUND(SUM(CAST(l_extendedprice AS {_DEC}) * CAST(1 - l_discount AS {_DEC4})), 2) AS DOUBLE) AS revenue,
           CAST(o_orderdate AS DATE) AS orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: selective dim filter → joins → agg → top-k.
    customer is small relative to lineitem — broadcast it; lineitem↔orders
    is the one real shuffle."""
    cutoff = F.lit("1995-03-15 00:00:00").cast("timestamp")
    cust = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    dec = F.col("l_extendedprice").cast(_DEC) * (
        F.lit(1) - F.col("l_discount")
    ).cast(_DEC4)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.round(F.sum(dec), 2).cast("double").alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").alias("orderdate"),
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n_name,
           CAST(ROUND(SUM(CAST(l_extendedprice AS {_DEC}) * CAST(1 - l_discount AS {_DEC4})), 2) AS DOUBLE) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style six-way join. All dims broadcast; the only large
    shuffle is lineitem↔orders."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    dec = F.col("l_extendedprice").cast(_DEC) * (
        F.lit(1) - F.col("l_discount")
    ).cast(_DEC4)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(dec), 2).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@register(
    "join_semi_customers_with_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    ORDER BY c_custkey
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "join_anti_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    ORDER BY c_custkey
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "join_outer_order_lineitem_counts",
    oracle="""
    SELECT o_orderkey, COUNT(l_orderkey) AS n_items
    FROM orders LEFT JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY o_orderkey ORDER BY o_orderkey
    """,
)
def join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left")
        .groupBy("o_orderkey")
        .agg(F.count("l_orderkey").alias("n_items"))
        .orderBy("o_orderkey")
    )


@register(
    "agg_rollup_nation_region",
    oracle=f"""
    SELECT COALESCE(r_name, 'ALL') AS region_name,
           COALESCE(CASE WHEN GROUPING(n_name) = 1 THEN NULL ELSE n_name END, 'ALL') AS nation_name,
           CAST(ROUND(SUM(CAST(c_acctbal AS {_DEC})), 2) AS DOUBLE) AS total_acctbal,
           COUNT(*) AS n_customers
    FROM customer JOIN nation ON c_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    ORDER BY region_name, nation_name
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    joined = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.round(F.sum(F.col("c_acctbal").cast(_DEC)), 2).cast("double").alias("total_acctbal"),
            F.count(F.lit(1)).alias("n_customers"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region_name"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation_name"),
            "total_acctbal",
            "n_customers",
        )
        .orderBy("region_name", "nation_name")
    )


@register(
    "agg_cube_priority_status",
    oracle=f"""
    SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
           COALESCE(o_orderstatus, 'ALL') AS status,
           COUNT(*) AS n_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS {_DEC})), 2) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY CUBE (o_orderpriority, o_orderstatus)
    ORDER BY priority, status
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum(F.col("o_totalprice").cast(_DEC)), 2).cast("double").alias("total_price"),
        )
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "n_orders",
            "total_price",
        )
        .orderBy("priority", "status")
    )


@register(
    "set_ops_nations",
    oracle="""
    WITH cn AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
         sn AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
    SELECT 'both' AS which, nationkey FROM (SELECT nationkey FROM cn INTERSECT SELECT nationkey FROM sn)
    UNION ALL
    SELECT 'customer_only' AS which, nationkey FROM (SELECT nationkey FROM cn EXCEPT SELECT nationkey FROM sn)
    ORDER BY which, nationkey
    """,
)
def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    cn = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    ).distinct()
    sn = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    ).distinct()
    both = cn.intersect(sn).select(F.lit("both").alias("which"), "nationkey")
    conly = cn.exceptAll(sn).select(
        F.lit("customer_only").alias("which"), "nationkey"
    )
    return both.unionAll(conly).orderBy("which", "nationkey")


@register(
    "window_topk_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
      FROM orders) t
    WHERE rk <= 3 ORDER BY o_custkey, rk
    """,
)
def window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.select(
            "o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rk")
        )
        .filter(F.col("rk") <= 3)
        .orderBy("o_custkey", "rk")
    )


@register(
    "window_running_total",
    oracle=f"""
    SELECT o_custkey, o_orderkey,
           CAST(ROUND(SUM(CAST(o_totalprice AS {_DEC}))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS running_total
    FROM orders ORDER BY o_custkey, o_orderkey
    """,
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum(F.col("o_totalprice").cast(_DEC)).over(w), 2).cast("double").alias("running_total"),
    ).orderBy("o_custkey", "o_orderkey")


@register(
    "window_lag_lead_order_gaps",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(date_diff('day', prev_date, o_orderdate) AS BIGINT) AS days_since_prev
    FROM (
      SELECT o_custkey, o_orderkey, o_orderdate,
             LAG(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_date
      FROM orders) t
    ORDER BY o_custkey, o_orderkey
    """,
)
def window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.datediff(
                F.col("o_orderdate"), F.lag("o_orderdate").over(w)
            ).cast("bigint").alias("days_since_prev"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "latest_event_per_user",
    oracle="""
    SELECT user_id, event_id, event_type, value FROM (
      SELECT user_id, event_id, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) t
    WHERE rn = 1 ORDER BY user_id
    """,
)
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's latest-version-per-key semantics (SURVEY §2.2 P5) as
    a general operator."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", "value")
        .orderBy("user_id")
    )


@register(
    "events_json_extraction",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
    FROM events
    GROUP BY event_type ORDER BY event_type
    """,
)
def events_json_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON shredding (the envelope-projection operator P1 generalized):
    get_json_object stays JVM-side."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.get_json_object("props", "$.k").cast("bigint"))
            .cast("bigint")
            .alias("sum_k"),
        )
        .orderBy("event_type")
    )


@register(
    "events_sessionize",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE OR
                  LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events)
    SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions
    FROM flagged GROUP BY user_id ORDER BY user_id
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via gap detection — lag + conditional sum."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    new_session = F.when(
        prev.isNull()
        | (F.col("ts").cast("long") - prev.cast("long") > 30 * 60),
        1,
    ).otherwise(0)
    return (
        ev.withColumn("new_session", new_session)
        .groupBy("user_id")
        .agg(F.sum("new_session").cast("bigint").alias("n_sessions"))
        .orderBy("user_id")
    )


@register(
    "events_tumbling_window",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           COUNT(*) AS n_events, ROUND(SUM(value), 4) AS sum_value
    FROM events GROUP BY 1, 2 ORDER BY window_start, event_type
    """,
)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch form of the streaming tumbling-window aggregation."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour").alias("w"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
        .orderBy("window_start", "event_type")
    )


@register(
    "pivot_event_counts",
    oracle="""
    SELECT user_id,
           CAST(COALESCE(SUM(CASE WHEN event_type = 'click' THEN 1 END), 0) AS BIGINT) AS click,
           CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 END), 0) AS BIGINT) AS purchase,
           CAST(COALESCE(SUM(CASE WHEN event_type = 'view' THEN 1 END), 0) AS BIGINT) AS view
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)
def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "purchase", "view"])
        .agg(F.count(F.lit(1)))
    )
    return out.select(
        "user_id",
        F.coalesce("click", F.lit(0)).cast("bigint").alias("click"),
        F.coalesce("purchase", F.lit(0)).cast("bigint").alias("purchase"),
        F.coalesce("view", F.lit(0)).cast("bigint").alias("view"),
    ).orderBy("user_id")


@register(
    "asof_join_purchase_before_click",
    oracle="""
    SELECT c.event_id, c.user_id, c.ts, p.ts AS purchase_ts, p.value AS purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id AND p.ts <= c.ts
    ORDER BY c.event_id
    """,
)
def asof_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click gets the user's most recent purchase at or
    before it. Union+window formulation (operators.asof) — one shuffle."""
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    out = asof_mod.asof_join(
        clicks, purchases, key="user_id", left_ts="ts", right_ts="ts",
        value_cols=["value"], suffix="_p",
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("ts_p").alias("purchase_ts"),
        F.col("value_p").alias("purchase_value"),
    ).orderBy("event_id")


@register(
    "range_join_events_within_hour",
    oracle="""
    SELECT a.event_id AS click_id, b.event_id AS purchase_id
    FROM (SELECT * FROM events WHERE event_type = 'click') a
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
      ON a.user_id = b.user_id
     AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
    ORDER BY click_id, purchase_id
    """,
)
def range_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-interval join, equi-blocked on user_id (hash join + filter,
    no cross product)."""
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase")
    out = asof_mod.range_join_within(
        clicks, purchases, key="user_id", left_ts="ts", right_ts="ts",
        lower_seconds=0, upper_seconds=3600,
    )
    return out.select(
        F.col("l.event_id").alias("click_id"), F.col("r.event_id").alias("purchase_id")
    ).orderBy("click_id", "purchase_id")


# ---------------------------------------------------------------------------
# Training-data pipeline operators (documents / embeddings)
# ---------------------------------------------------------------------------


@register(
    "dedup_exact_documents",
    oracle="""
    SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
           MIN(doc_id) AS doc_id, COUNT(*) AS dup_count
    FROM documents GROUP BY 1 ORDER BY fp
    """,
)
def dedup_exact_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return dedup_mod.exact_dedup(docs, "doc_id", "text").orderBy("fp")


@register(
    "dedup_ngram_jaccard_pairs",
    oracle="""
    WITH sh AS (
      SELECT doc_id, lang,
             list_distinct([list_aggregate(words[i:i+2], 'string_agg', ' ')
                            FOR i IN range(1, len(words) - 1)]) AS shingles
      FROM (SELECT doc_id, lang,
                   string_split_regex(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS words
            FROM documents)
      WHERE len(words) >= 3)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           ROUND(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
                 len(list_distinct(list_concat(a.shingles, b.shingles))), 6) AS jaccard
    FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
          len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.2
    ORDER BY id_a, id_b
    """,
)
def dedup_ngram_jaccard_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs, blocked by language."""
    docs = _t(spark, sf_dir, "documents")
    return dedup_mod.ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.2, block_col="lang"
    ).orderBy("id_a", "id_b")


# dedup_minhash_lsh_pairs / dedup_simhash_pairs are registered further down
# (next to their oracle builders) using the md5-portable hash so every stage
# is value-checked against DuckDB.


@register(
    "text_stats",
    oracle="""
    SELECT doc_id,
           CASE WHEN trim(text) = '' THEN 0
                ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens,
           len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]')) AS n_bpe_tokens,
           ROUND(CASE WHEN len(text) = 0 THEN 0.0
                 ELSE CAST(len(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE) / len(text) END, 6) AS punct_ratio,
           md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
    FROM documents ORDER BY doc_id
    """,
)
def text_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        tx.token_count(F.col("text")).cast("bigint").alias("n_tokens"),
        tx.bpe_token_estimate(F.col("text")).cast("bigint").alias("n_bpe_tokens"),
        F.round(tx.punct_ratio(F.col("text")), 6).alias("punct_ratio"),
        tx.fingerprint(F.col("text")).alias("fp"),
    ).orderBy("doc_id")


@register(
    "text_lang_id",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             [lower(w) FOR w IN (CASE WHEN trim(text) = '' THEN []
                                 ELSE string_split_regex(trim(text), '\\s+') END)] AS words
      FROM documents),
    hits AS (
      SELECT doc_id,
             len(list_filter(words, w -> list_contains(['der','die','und','das','ein'], w))) AS h_de,
             len(list_filter(words, w -> list_contains(['the','and','of','to','a'], w))) AS h_en,
             len(list_filter(words, w -> list_contains(['el','la','de','que','y'], w))) AS h_es,
             len(list_filter(words, w -> list_contains(['le','la','de','et','un'], w))) AS h_fr
      FROM toks)
    SELECT doc_id,
           CASE WHEN greatest(h_de, h_en, h_es, h_fr) = 0 THEN 'und'
                WHEN h_de = greatest(h_de, h_en, h_es, h_fr) THEN 'de'
                WHEN h_en = greatest(h_de, h_en, h_es, h_fr) THEN 'en'
                WHEN h_es = greatest(h_de, h_en, h_es, h_fr) THEN 'es'
                ELSE 'fr' END AS lang_guess
    FROM hits ORDER BY doc_id
    """,
)
def text_lang_id_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", tx.lang_id(F.col("text")).alias("lang_guess")
    ).orderBy("doc_id")


@register(
    "similarity_bruteforce_topk",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, embedding AS q_vec FROM embeddings WHERE vec_id < 5),
    scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             list_dot_product([CAST(x AS DOUBLE) FOR x IN q.q_vec],
                              [CAST(x AS DOUBLE) FOR x IN e.embedding]) /
             (sqrt(list_dot_product([CAST(x AS DOUBLE) FOR x IN q.q_vec],
                                    [CAST(x AS DOUBLE) FOR x IN q.q_vec])) *
              sqrt(list_dot_product([CAST(x AS DOUBLE) FOR x IN e.embedding],
                                    [CAST(x AS DOUBLE) FOR x IN e.embedding]))) AS cos
      FROM embeddings e CROSS JOIN q
      WHERE e.vec_id <> q.query_id)
    SELECT query_id, neighbor_id, rank, ROUND(cos, 6) AS cosine FROM (
      SELECT query_id, neighbor_id, cos,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
      FROM scored) t
    WHERE rank <= 3 ORDER BY query_id, rank
    """,
)
def similarity_bruteforce_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 5)
    return sim_mod.cosine_topk(emb, qs, k=3).orderBy("query_id", "rank")


@register("similarity_lsh_topk")  # oracle attached below (_lsh_topk_oracle)
def similarity_lsh_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    qs = emb.filter(F.col("vec_id") < 5)
    return sim_mod.lsh_topk(emb, qs, dim=dim, k=3).orderBy("query_id", "rank")


def _neardup_oracle(dim: int = 64, n_planes: int = 8, threshold: float = 0.9) -> str:
    """Full DuckDB oracle for hyperplane-bucketed embedding near-dup: the
    md5-derived hyperplanes are deterministic Python lists, so they embed
    as SQL literals; dot products are left-to-right ``list_reduce`` folds,
    which match Spark's ``F.aggregate`` fold bit-for-bit."""
    planes = sim_mod._hyperplanes(dim, n_planes, seed="neardup")
    plane_cols = ",\n             ".join(
        "[" + ", ".join(repr(x) for x in p) + "]::DOUBLE[] AS p" + str(i)
        for i, p in enumerate(planes)
    )

    def dot(vec: str, plane: str) -> str:
        return (
            f"list_reduce([CAST({vec}[i] AS DOUBLE) * {plane}[i] "
            f"FOR i IN range(1, len({vec})+1)], (acc, x) -> acc + x)"
        )

    def vdot(va: str, vb: str) -> str:
        return (
            f"list_reduce([CAST({va}[i] AS DOUBLE) * CAST({vb}[i] AS DOUBLE) "
            f"FOR i IN range(1, len({va})+1)], (acc, x) -> acc + x)"
        )

    bucket = " + ".join(
        f"(CASE WHEN {dot('v', f'p{i}')} >= 0 THEN {1 << i} ELSE 0 END)"
        for i in range(n_planes)
    )
    return f"""
    WITH planes AS (
      SELECT {plane_cols}),
    base AS (
      SELECT vec_id, embedding AS v,
             {bucket} AS bucket
      FROM embeddings, planes),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             ROUND({vdot('a.v', 'b.v')} /
                   (sqrt({vdot('a.v', 'a.v')}) * sqrt({vdot('b.v', 'b.v')})),
                   6) AS cosine
      FROM base a JOIN base b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
    SELECT id_a, id_b, cosine FROM pairs
    WHERE cosine >= CAST({threshold} AS DOUBLE)
    ORDER BY id_a, id_b
    """


@register("embedding_near_dup_pairs", oracle=_neardup_oracle(threshold=0.2))
def embedding_near_dup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH-bucketed cosine near-dup pairs, fully value-checked:
    the deterministic hyperplanes make the bucketing — not just the verify
    step — reproducible in the DuckDB oracle. Threshold 0.2 (not a
    production 0.9) because the synthetic embeddings are near-orthogonal —
    at 0.9 both engines return zero rows and the check proves nothing."""
    emb = _t(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    return sim_mod.embedding_near_dup_pairs(emb, dim=dim, threshold=0.2).orderBy(
        "id_a", "id_b"
    )


# ---------------------------------------------------------------------------
# Streaming (Structured Streaming; oracle = equivalent batch SQL)
# ---------------------------------------------------------------------------


@register(
    "streaming_tumbling_window",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           COUNT(*) AS n_events, ROUND(SUM(value), 4) AS sum_value
    FROM events GROUP BY 1, 2 ORDER BY window_start, event_type
    """,
)
def streaming_tumbling_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real Structured Streaming execution (availableNow drain into a
    memory sink); result equals the batch tumbling-window query."""
    import os as _os

    from .streaming import windowed_event_counts

    out = windowed_event_counts(
        spark, _os.path.join(sf_dir, "events.parquet"), window_duration="1 hour"
    )
    return out.orderBy("window_start", "event_type")


# ---------------------------------------------------------------------------
# Additional relational coverage (round 1 widening)
# ---------------------------------------------------------------------------


@register(
    "q6_revenue_forecast",
    oracle=f"""
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS {_DEC}) * CAST(l_discount AS {_DEC4})), 2) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1995-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style: pure scan + conjunctive filter + single aggregate —
    the filters all push to the parquet scan."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1994-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount").between(0.03, 0.07))
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(
            F.sum(F.col("l_extendedprice").cast(_DEC) * F.col("l_discount").cast(_DEC4)),
            2,
        )
        .cast("double")
        .alias("revenue")
    )


@register(
    "agg_stats_per_status",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n,
           ROUND(MIN(o_totalprice), 2) AS min_price,
           ROUND(MAX(o_totalprice), 2) AS max_price,
           ROUND(AVG(o_totalprice), 4) AS avg_price,
           ROUND(STDDEV_SAMP(o_totalprice), 4) AS sd_price
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def agg_stats_per_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
            F.round(F.stddev_samp("o_totalprice"), 4).alias("sd_price"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "percentiles_order_price",
    oracle="""
    SELECT o_orderpriority,
           ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
           ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def percentiles_order_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (linear interpolation) — Spark `percentile` and
    DuckDB `quantile_cont` share the interpolation rule."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "count_distinct_users",
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def count_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("event_type")
    )


@register(
    "orders_per_month",
    oracle="""
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month, COUNT(*) AS n_orders
    FROM orders GROUP BY 1 ORDER BY month
    """,
)
def orders_per_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.date_trunc("month", "o_orderdate").cast("date").alias("month")
        )
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("month")
    )


@register(
    "string_functions_parts",
    oracle="""
    SELECT p_brand,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN lower(p_name) LIKE '%green%' THEN 1 ELSE 0 END) AS BIGINT) AS n_green,
           MIN(upper(substr(p_type, 1, 5))) AS first_type
    FROM part GROUP BY p_brand ORDER BY p_brand
    """,
)
def string_functions_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    return (
        part.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.lower("p_name").like("%green%"), 1).otherwise(0)
            ).cast("bigint").alias("n_green"),
            F.min(F.upper(F.substring("p_type", 1, 5))).alias("first_type"),
        )
        .orderBy("p_brand")
    )


@register(
    "grouping_sets_orders",
    oracle="""
    SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
           COALESCE(o_orderstatus, 'ALL') AS status,
           COUNT(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
    ORDER BY priority, status
    """,
)
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("__gs_orders")
    return spark.sql(
        """
        SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
               COALESCE(o_orderstatus, 'ALL') AS status,
               COUNT(*) AS n
        FROM __gs_orders
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
        ORDER BY priority, status
        """
    )


@register(
    "word_count_top20",
    oracle="""
    SELECT w AS word, COUNT(*) AS n
    FROM (SELECT unnest(string_split_regex(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS w
          FROM documents) t
    WHERE w <> ''
    GROUP BY w ORDER BY n DESC, word LIMIT 20
    """,
)
def word_count_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classic: explode → count → top-k with deterministic tiebreak."""
    docs = _t(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(
            F.split(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "), " ")
        ).alias("word")
    ).filter(F.col("word") != "")
    return (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "word")
        .limit(20)
    )


@register(
    "text_quality_score",
    oracle="""
    WITH base AS (
      SELECT doc_id, text,
             CASE WHEN trim(text) = '' THEN []
                  ELSE [lower(w) FOR w IN string_split_regex(trim(text), '\\s+')] END AS words
      FROM documents),
    feats AS (
      SELECT doc_id,
             CASE WHEN len(words) = 0 THEN 0.0
                  ELSE CAST(len(list_filter(words, w -> list_contains(['the','and','of','to','a'], w))) AS DOUBLE) / len(words) END AS sw,
             CASE WHEN len(words) = 0 THEN 0.0
                  ELSE CAST(list_sum([CAST(len(w) AS BIGINT) FOR w IN words]) AS DOUBLE) / len(words) END AS mwl,
             CASE WHEN len(text) = 0 THEN 0.0
                  ELSE CAST(len(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE) / len(text) END AS punct,
             CASE WHEN len(text) = 0 THEN 0.0
                  ELSE CAST(len(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) / len(text) END AS dig
      FROM base)
    SELECT doc_id,
           ROUND(0.4 * least(sw * 4.0, 1.0)
               + 0.4 * (1.0 - least(abs(mwl - 5.0) / 5.0, 1.0))
               + 0.2 * (1.0 - least(punct + dig, 1.0)), 6) AS quality
    FROM feats ORDER BY doc_id
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", tx.quality_score(F.col("text")).alias("quality")
    ).orderBy("doc_id")


@register(
    "q17_correlated_subquery",
    oracle="""
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) / 7.0, 2) AS DOUBLE) AS avg_yearly
    FROM lineitem l1
    WHERE l_quantity < (SELECT 0.2 * AVG(l_quantity)
                        FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)
    """,
)
def q17_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-style correlated scalar subquery — Catalyst decorrelates
    it into an aggregate + join; expressed through the SQL surface to
    exercise the subquery planner."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("__q17_lineitem")
    return spark.sql(
        """
        SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) / 7.0, 2) AS DOUBLE) AS avg_yearly
        FROM __q17_lineitem l1
        WHERE l_quantity < (SELECT 0.2 * AVG(l_quantity)
                            FROM __q17_lineitem l2 WHERE l2.l_partkey = l1.l_partkey)
        """
    )


@register(
    "q7_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS cust_nation, CAST(year(l_shipdate) AS BIGINT) AS l_year,
           CAST(ROUND(SUM(CAST(l_extendedprice AS {_DEC}) * CAST(1 - l_discount AS {_DEC4})), 2) AS DOUBLE) AS revenue
    FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
    WHERE n2.n_name <> n1.n_name
    GROUP BY n1.n_name, year(l_shipdate)
    ORDER BY cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7-style cross-nation volume: fact-fact shuffle join + broadcast
    dims + date-part grouping."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    dec = F.col("l_extendedprice").cast(_DEC) * (
        F.lit(1) - F.col("l_discount")
    ).cast(_DEC4)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), cust.c_nationkey == n1.c_nkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n2), supp.s_nationkey == n2.s_nkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("cust_nation", F.year("l_shipdate").cast("bigint").alias("l_year"))
        .agg(F.round(F.sum(dec), 2).cast("double").alias("revenue"))
        .orderBy("cust_nation", "l_year")
    )


@register(
    "null_ordering_last_purchase",
    oracle="""
    SELECT c_custkey, last_purchase
    FROM (
      SELECT c_custkey, MAX(o_orderdate) AS last_purchase
      FROM customer LEFT JOIN orders ON o_custkey = c_custkey
      GROUP BY c_custkey)
    ORDER BY last_purchase DESC NULLS LAST, c_custkey
    LIMIT 50
    """,
)
def null_ordering_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit null ordering — Spark and DuckDB have opposite defaults
    (nulls first vs nulls last on DESC), so the direction is pinned."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.max("o_orderdate").alias("last_purchase"))
        .orderBy(F.col("last_purchase").desc_nulls_last(), "c_custkey")
        .limit(50)
    )


@register(
    "streaming_stateful_user_stats",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events,
           ROUND(SUM(value), 4) AS sum_value,
           MAX(ts) AS last_ts
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)
def streaming_stateful_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): the
    drained per-user running aggregates equal the batch groupBy answer."""
    import os as _os

    from .streaming.stateful import running_user_stats

    out = running_user_stats(spark, _os.path.join(sf_dir, "events.parquet"))
    return out.select(
        "user_id",
        F.col("n_events"),
        F.col("sum_value"),
        F.col("last_ts"),
    ).orderBy("user_id")


@register(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           CAST(ROUND(SUM(CAST(l_extendedprice AS {_DEC}) * CAST(1 - l_discount AS {_DEC4})), 2) AS DOUBLE) AS revenue,
           n_name
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10-style: returned-item revenue per customer, top-20."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = _t(spark, sf_dir, "nation")
    dec = F.col("l_extendedprice").cast(_DEC) * (
        F.lit(1) - F.col("l_discount")
    ).cast(_DEC4)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(dec), 2).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "q18_large_volume_customers",
    oracle="""
    SELECT c_custkey, big.o_orderkey AS o_orderkey,
           CAST(o_orderdate AS DATE) AS orderdate,
           ROUND(o_totalprice, 2) AS totalprice,
           ROUND(total_qty, 2) AS total_qty
    FROM (
      SELECT l_orderkey AS o_orderkey, SUM(l_quantity) AS total_qty
      FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 210) big
    JOIN orders ON big.o_orderkey = orders.o_orderkey
    JOIN customer ON o_custkey = c_custkey
    ORDER BY totalprice DESC, o_orderkey
    LIMIT 20
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18-style: HAVING aggregate feeding a join (aggregate pushdown side)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy(F.col("l_orderkey").alias("o_orderkey"))
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 210)
    )
    return (
        big.join(orders, "o_orderkey")
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
            F.round("total_qty", 2).alias("total_qty"),
        )
        .orderBy(F.col("totalprice").desc(), "o_orderkey")
        .limit(20)
    )


@register(
    "session_windows_native",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    numbered AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged)
    SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
    FROM numbered GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
)
def session_windows_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's native session_window aggregation (gap-merged sessions);
    the oracle reconstructs the same sessions via lag + cumulative sum
    (new session when the gap >= the timeout — session_window keeps an
    event only while it lands strictly inside [start, last + gap))."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id", F.col("w.start").alias("session_start"), "n_events"
        )
        .orderBy("user_id", "session_start")
    )


@register(
    "events_variant_shredding",
    oracle="""
    SELECT user_id,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)
def events_variant_shredding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured payloads via Spark 4's VARIANT type: parse_json once,
    then binary-encoded field access (no per-access JSON re-parse — the
    scale path for dynamic-schema columns, cf. the reference's schema-less
    dbObject payloads)."""
    ev = _t(spark, sf_dir, "events")
    v = ev.select("user_id", F.parse_json("props").alias("v")).select(
        "user_id", F.try_variant_get("v", "$.k", "bigint").alias("k")
    )
    return (
        v.groupBy("user_id")
        .agg(
            F.sum("k").cast("bigint").alias("sum_k"),
            F.max("k").cast("bigint").alias("max_k"),
        )
        .orderBy("user_id")
    )


@register(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1995-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4-style: EXISTS correlated on a date inequality → left-semi join."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-04-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    semi = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return (
        semi.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q12_shipmode_priority",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12-style conditional counting across a fact-fact join."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q14_promo_revenue_ratio",
    oracle=f"""
    SELECT ROUND(
             100.0 * CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
                        THEN CAST(l_extendedprice AS {_DEC}) * CAST(1 - l_discount AS {_DEC4})
                        ELSE CAST(0 AS DECIMAL(37,6)) END) AS DOUBLE)
                   / CAST(SUM(CAST(l_extendedprice AS {_DEC}) * CAST(1 - l_discount AS {_DEC4})) AS DOUBLE),
             6) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    """,
)
def q14_promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14-style conditional-revenue ratio (broadcast part join)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    disc = F.col("l_extendedprice").cast(_DEC) * (
        F.lit(1) - F.col("l_discount")
    ).cast(_DEC4)
    promo = F.when(
        F.col("p_type").like("PROMO%"), disc
    ).otherwise(F.lit(0).cast("decimal(37,6)"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(disc).cast("double"),
                6,
            ).alias("promo_revenue_pct")
        )
    )


@register(
    "window_function_breadth",
    oracle="""
    SELECT o_custkey, o_orderkey,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           NTILE(4) OVER w AS quartile,
           ROUND(FIRST_VALUE(o_totalprice) OVER w, 2) AS top_price,
           CAST(LEAD(o_orderkey) OVER w AS BIGINT) AS next_orderkey
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    ORDER BY o_custkey, rnk, o_orderkey
    """,
)
def window_function_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile / first_value / lead in one pass."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.first("o_totalprice").over(w), 2).alias("top_price"),
        F.lead("o_orderkey").over(w).cast("bigint").alias("next_orderkey"),
    ).orderBy("o_custkey", "rnk", "o_orderkey")


@register("winnowing_fingerprints_xxhash")  # xxhash64-valued: rows-only
# check; exact semantics verified in tests/test_operators.py vs a Python
# model. The driver-gated name `winnowing_fingerprints` is the md5-portable
# pipeline with a full DuckDB value oracle (see its registration below).
def winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (MOSS) fingerprint selection over the documents table."""
    docs = _t(spark, sf_dir, "documents")
    return dedup_mod.winnow_fingerprints(docs, "doc_id", "text").orderBy(
        "doc_id", "fingerprint"
    )


@register(
    "profile_lineitem",
    oracle="""
    SELECT 'l_quantity' AS col, COUNT(*) AS n,
           CAST(COUNT(*) - COUNT(l_quantity) AS BIGINT) AS nulls,
           COUNT(DISTINCT l_quantity) AS n_distinct,
           ROUND(MIN(l_quantity), 4) AS min_val, ROUND(MAX(l_quantity), 4) AS max_val
    FROM lineitem
    UNION ALL
    SELECT 'l_discount', COUNT(*),
           CAST(COUNT(*) - COUNT(l_discount) AS BIGINT),
           COUNT(DISTINCT l_discount),
           ROUND(MIN(l_discount), 4), ROUND(MAX(l_discount), 4)
    FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice', COUNT(*),
           CAST(COUNT(*) - COUNT(l_extendedprice) AS BIGINT),
           COUNT(DISTINCT l_extendedprice),
           ROUND(MIN(l_extendedprice), 4), ROUND(MAX(l_extendedprice), 4)
    FROM lineitem
    ORDER BY col
    """,
)
def profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-profiling: per-column null/distinct/min/max in ONE scan —
    aggregates for all profiled columns computed together, then unpivoted
    (the multi-scan UNION the oracle uses would read the table N times)."""
    li = _t(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_discount", "l_extendedprice"]
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            (F.count(F.lit(1)) - F.count(c)).cast("bigint").alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__nd"),
            F.round(F.min(c), 4).alias(f"{c}__min"),
            F.round(F.max(c), 4).alias(f"{c}__max"),
        ]
    wide = li.agg(*aggs)
    parts = [
        f"named_struct('col', '{c}', 'n', {c}__n, 'nulls', {c}__nulls, "
        f"'n_distinct', {c}__nd, 'min_val', {c}__min, 'max_val', {c}__max)"
        for c in cols
    ]
    return (
        wide.select(F.explode(F.expr(f"array({', '.join(parts)})")).alias("p"))
        .select("p.col", "p.n", "p.nulls", "p.n_distinct", "p.min_val", "p.max_val")
        .orderBy("col")
    )


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey) c_orders
    GROUP BY c_count ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13-style two-level aggregation over an outer join with a join-side
    predicate (the classic filtered-left-join trap: the filter belongs in
    the ON clause, not WHERE)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "q19_disjunctive_predicates",
    oracle=f"""
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS {_DEC}) * CAST(1 - l_discount AS {_DEC4})), 2) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1 AND l_quantity <= 30)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 25 AND l_quantity >= 10 AND l_quantity <= 40)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 35 AND l_quantity >= 20 AND l_quantity <= 50)
    """,
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19-style OR-of-ANDs across both join sides — Catalyst extracts the
    common per-side conjuncts and pushes them below the join."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 30))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 25)
           & F.col("l_quantity").between(10, 40))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 35)
           & F.col("l_quantity").between(20, 50))
    )
    dec = F.col("l_extendedprice").cast(_DEC) * (
        F.lit(1) - F.col("l_discount")
    ).cast(_DEC4)
    return j.filter(cond).agg(
        F.round(F.sum(dec), 2).cast("double").alias("revenue")
    )


@register(
    "q22_global_sales_opportunity",
    oracle="""
    WITH avg_bal AS (
      SELECT AVG(c_acctbal) AS a FROM customer WHERE c_acctbal > 0.0)
    SELECT substr(c_name, 10, 2) AS cntrycode,
           COUNT(*) AS numcust,
           CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE) AS totacctbal
    FROM customer, avg_bal
    WHERE c_acctbal > a
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY 1 ORDER BY cntrycode
    """,
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22-style: scalar-subquery threshold + anti join + substring group."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("a")
    )
    rich = cust.join(F.broadcast(avg_bal)).filter(F.col("c_acctbal") > F.col("a"))
    no_orders = rich.join(orders, rich.c_custkey == orders.o_custkey, "left_anti")
    return (
        no_orders.groupBy(F.substring("c_name", 10, 2).alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


@register(
    "q8_market_share",
    oracle=f"""
    SELECT o_year,
           ROUND(CAST(SUM(CASE WHEN nation = 'NATION_5' THEN volume
                          ELSE CAST(0 AS DECIMAL(37,6)) END) AS DOUBLE)
                 / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
             CAST(l_extendedprice AS {_DEC}) * CAST(1 - l_discount AS {_DEC4}) AS volume,
             n2.n_name AS nation
      FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
      WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        AND l_orderkey = o_orderkey AND o_custkey = c_custkey
        AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
        AND r_name = 'AMERICA' AND s_nationkey = n2.n_nationkey
        AND p_type = 'ECONOMY') all_nations
    GROUP BY o_year ORDER BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8-style national market share: an 8-table snowflake where every
    dimension (part, supplier, customer, nation x2, region) broadcasts and
    only the lineitem-orders join shuffles — one shuffle total at scale."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    part = _t(spark, sf_dir, "part")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    n1 = nation.alias("n1")
    n2 = nation.alias("n2")
    cust_america = (
        cust.join(F.broadcast(n1), cust.c_nationkey == F.col("n1.n_nationkey"))
        .join(F.broadcast(region),
              (F.col("n1.n_regionkey") == region.r_regionkey)
              & (region.r_name == "AMERICA"))
        .select("c_custkey")
    )
    supp_nat = supp.join(
        F.broadcast(n2), supp.s_nationkey == F.col("n2.n_nationkey")
    ).select("s_suppkey", F.col("n2.n_name").alias("nation"))
    vol = F.col("l_extendedprice").cast(_DEC) * (
        F.lit(1) - F.col("l_discount")
    ).cast(_DEC4)
    j = (
        li.join(F.broadcast(part.filter(F.col("p_type") == "ECONOMY")),
                li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust_america), orders.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(supp_nat), li.l_suppkey == F.col("s_suppkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            vol.alias("volume"),
            F.col("nation"),
        )
    )
    zero = F.lit(0).cast("decimal(37,6)")
    return (
        j.groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_5", F.col("volume"))
                      .otherwise(zero)).cast("double")
                / F.sum("volume").cast("double"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(ROUND(SUM(CAST(l_extendedprice AS {_DEC}) * CAST(1 - l_discount AS {_DEC4})), 2) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15-style top supplier: aggregate-then-argmax. The scalar max joins
    back as a broadcast, so the revenue aggregate is computed once and the
    argmax adds no extra shuffle of the fact table."""
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast(_DEC)
                      * (F.lit(1) - F.col("l_discount")).cast(_DEC4)),
                2,
            )
            .cast("double")
            .alias("total_revenue")
        )
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_rev"))
    return (
        revenue.join(F.broadcast(max_rev),
                     F.col("total_revenue") == F.col("max_rev"))
        .join(F.broadcast(supp), F.col("supplier_no") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier, lineitem l1, orders, nation
    WHERE s_suppkey = l1.l_suppkey
      AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND s_nationkey = n_nationkey
      AND n_name = 'NATION_3'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21-style sole-late-supplier (adapted: no commit/receipt dates in the
    schema, so "late" = shipped >60 days after order date). Spark-first
    rewrite: instead of the classic EXISTS + NOT EXISTS double self-join of
    lineitem (three shuffles of the fact table), one groupBy(l_orderkey)
    computes distinct-supplier and distinct-late-supplier counts — a single
    shuffle, with map-side partial aggregation."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    j = li.join(
        orders.filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate"),
        li.l_orderkey == F.col("o_orderkey"),
    )
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
    per_order = j.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(late, F.col("l_suppkey"))).alias("n_late_supp"),
        F.max(F.when(late, F.col("l_suppkey"))).alias("late_supp"),
        F.sum(F.when(late, 1).otherwise(0)).alias("late_rows"),
    )
    sole_late = per_order.filter(
        (F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)
    )
    supp_nat = supp.join(
        F.broadcast(nation.filter(F.col("n_name") == "NATION_3")),
        supp.s_nationkey == nation.n_nationkey,
    ).select("s_suppkey", "s_name")
    return (
        sole_late.join(F.broadcast(supp_nat),
                       F.col("late_supp") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("late_rows").cast("bigint").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


@register(
    "streaming_session_timeout",
    oracle="""
    WITH marked AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, value, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked
    )
    SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events, ROUND(SUM(value), 4) AS sum_value
    FROM sess
    GROUP BY user_id, sid
    HAVING MAX(ts) + INTERVAL 30 MINUTE < (SELECT MAX(ts) FROM events)
    ORDER BY user_id, session_start
    """,
)
def streaming_session_timeout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time-timeout session windows (applyInPandasWithState +
    EventTimeTimeout): state holds one open session per user; closed
    sessions emit in-batch, the trailing session emits when the no-data
    micro-batch advances the watermark past session_end + gap. With a
    0-second watermark delay the drained result is exactly the sessions
    whose end + 30min precedes the stream's max timestamp."""
    import os as _os

    from .streaming.stateful import session_windows_timeout

    out = session_windows_timeout(spark, _os.path.join(sf_dir, "events.parquet"))
    return out.select(
        "user_id", "session_start", "session_end", "n_events", "sum_value"
    ).orderBy("user_id", "session_start")


@register(
    "dataset_split_hash",
    oracle="""
    SELECT split, COUNT(*) AS n_docs, SUM(n_chars) AS total_chars
    FROM (
      SELECT n_chars,
             CASE WHEN b < 80 THEN 'train'
                  WHEN b < 90 THEN 'valid'
                  ELSE 'test' END AS split
      FROM (SELECT n_chars,
                   CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 100 AS b
            FROM documents) h) s
    GROUP BY split ORDER BY split
    """,
)
def dataset_split_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/valid/test assignment by md5(doc_id) bucket —
    the standard leakage-free dataset split: stable under reprocessing,
    no shuffle (a narrow projection), works identically at any scale."""
    docs = _t(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("long") % 100
    )
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "valid").otherwise("test")
    )
    return (
        docs.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("split")
    )


@register(
    "doc_repetition_3gram",
    oracle="""
    WITH w AS (
      SELECT doc_id,
             string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS ws
      FROM documents),
    g AS (
      SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS gram
      FROM w, UNNEST(range(1, greatest(len(ws) - 1, 1))) AS t(i))
    SELECT doc_id,
           COUNT(*) AS n_grams,
           1.0 - CAST(COUNT(DISTINCT gram) AS DOUBLE) / COUNT(*) AS dup_ratio
    FROM g GROUP BY doc_id
    ORDER BY dup_ratio DESC, doc_id LIMIT 20
    """,
)
def doc_repetition_3gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signal: fraction of duplicate word 3-grams
    per document, top-20 most repetitive. The ratio is a pure int/int
    double division (no rounding needed — bit-exact in any engine)."""
    docs = _t(spark, sf_dir, "documents")
    grams = docs.select(
        "doc_id", F.explode(dedup_mod.word_ngrams(F.col("text"), 3)).alias("gram")
    )
    return (
        grams.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            (
                F.lit(1.0)
                - F.countDistinct("gram").cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("dup_ratio"),
        )
        .orderBy(F.col("dup_ratio").desc(), "doc_id")
        .limit(20)
    )


@register(
    "pii_scrub_stats",
    oracle="""
    WITH aug AS (
      SELECT doc_id,
             text || ' contact: user' || CAST(doc_id AS VARCHAR)
                  || '@example.com or +1-555-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS s
      FROM documents),
    scrub AS (
      SELECT doc_id, s,
             regexp_replace(
               regexp_replace(s, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
               '\\+1-555-[0-9]{4}', '[PHONE]', 'g') AS clean
      FROM aug)
    SELECT CAST(SUM(len(regexp_extract_all(s, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))) AS BIGINT) AS emails_found,
           CAST(SUM(len(regexp_extract_all(s, '\\+1-555-[0-9]{4}'))) AS BIGINT) AS phones_found,
           CAST(SUM(len(clean)) AS BIGINT) AS scrubbed_len,
           CAST(SUM(CASE WHEN clean LIKE '%[EMAIL]%' AND clean LIKE '%[PHONE]%' THEN 1 ELSE 0 END) AS BIGINT) AS fully_scrubbed
    FROM scrub
    """,
)
def pii_scrub_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction over documents: email/phone regex scrub (JVM-side
    regexp_replace — codegen'd, no UDF). The fixture text has no PII, so
    deterministic synthetic contact strings are appended per doc and the
    scrub is verified to find and redact every one."""
    email_re = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    phone_re = r"\+1-555-[0-9]{4}"
    docs = _t(spark, sf_dir, "documents")
    s = F.concat(
        F.col("text"),
        F.lit(" contact: user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    aug = docs.select("doc_id", s.alias("s"))
    clean = F.regexp_replace(
        F.regexp_replace(F.col("s"), email_re, "[EMAIL]"), phone_re, "[PHONE]"
    )
    return aug.select(
        "s", clean.alias("clean")
    ).agg(
        F.sum(F.regexp_count("s", F.lit(email_re))).cast("bigint").alias("emails_found"),
        F.sum(F.regexp_count("s", F.lit(phone_re))).cast("bigint").alias("phones_found"),
        F.sum(F.length("clean")).cast("bigint").alias("scrubbed_len"),
        F.sum(
            F.when(
                F.col("clean").contains("[EMAIL]") & F.col("clean").contains("[PHONE]"),
                1,
            ).otherwise(0)
        ).cast("bigint").alias("fully_scrubbed"),
    )


@register(
    "c4_quality_filter",
    oracle="""
    WITH base AS (
      SELECT doc_id, text,
             CASE WHEN trim(text) = '' THEN []
                  ELSE [lower(w) FOR w IN string_split_regex(trim(text), '\\s+')] END AS words
      FROM documents),
    feats AS (
      SELECT doc_id, len(words) AS nw,
             CASE WHEN len(words) = 0 THEN 0.0
                  ELSE CAST(list_sum([CAST(len(w) AS BIGINT) FOR w IN words]) AS DOUBLE) / len(words) END AS mwl,
             CASE WHEN len(words) = 0 THEN 0.0
                  ELSE CAST(len(list_filter(words, w -> list_contains(['the','and','of','to','a'], w))) AS DOUBLE) / len(words) END AS sw
      FROM base),
    labeled AS (
      SELECT CASE WHEN nw < 20 THEN 'too_short'
                  WHEN sw < 0.02 THEN 'low_stopword'
                  WHEN mwl > 5.0 THEN 'long_words'
                  ELSE 'keep' END AS verdict
      FROM feats)
    SELECT verdict, COUNT(*) AS n_docs FROM labeled
    GROUP BY verdict ORDER BY verdict
    """,
)
def c4_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/Gopher-style quality filter cascade: first failing rule labels
    the document (too_short → low_stopword → long_words → keep). All
    signals are built-in column expressions — a narrow, shuffle-free
    projection until the tiny per-verdict count."""
    docs = _t(spark, sf_dir, "documents")
    low = F.transform(tx.tokens(F.col("text")), lambda w: F.lower(w))
    nw = F.size(low)
    mwl = tx.mean_word_len(F.col("text"))
    sw = tx.stopword_ratio(F.col("text"), "en")
    verdict = (
        F.when(nw < 20, "too_short")
        .when(sw < 0.02, "low_stopword")
        .when(mwl > 5.0, "long_words")
        .otherwise("keep")
    )
    return (
        docs.select(verdict.alias("verdict"))
        .groupBy("verdict")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("verdict")
    )


@register(
    "dedup_cluster_components",
    oracle="""
    WITH RECURSIVE
    sh AS (
      SELECT doc_id, lang,
             list_distinct([list_aggregate(words[i:i+2], 'string_agg', ' ')
                            FOR i IN range(1, len(words) - 1)]) AS shingles
      FROM (SELECT doc_id, lang,
                   string_split_regex(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS words
            FROM documents)
      WHERE len(words) >= 3),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
            len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.2),
    edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    reach(id, r) AS (
      SELECT src, src FROM edges
      UNION
      SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src),
    comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id)
    SELECT component AS cluster_id, COUNT(*) AS size
    FROM comp GROUP BY component
    ORDER BY size DESC, cluster_id
    """,
)
def dedup_cluster_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters: ngram-Jaccard pairs (>= 0.2, lang-blocked) fed
    into min-label-propagation connected components. Integer-only labels
    make the result bit-exact against DuckDB's recursive-CTE transitive
    closure. This is the dedup end-game: pick one representative per
    cluster instead of dropping pairwise."""
    from .streaming.stateful import _scoped_shuffle_partitions

    docs = _t(spark, sf_dir, "documents")
    pairs = dedup_mod.ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.2, block_col="lang"
    )
    # the label-propagation rounds execute eagerly inside the call; scope
    # the shuffle width so each round doesn't pay 200-partition overhead
    # on a gate-sized graph
    with _scoped_shuffle_partitions(spark, 32):
        comp = dedup_mod.connected_components(pairs, "id_a", "id_b")
        comp = comp.localCheckpoint(eager=True)
    return (
        comp.groupBy("component")
        .agg(F.count(F.lit(1)).alias("size"))
        .select(F.col("component").alias("cluster_id"), "size")
        .orderBy(F.col("size").desc(), "cluster_id")
    )


@register(
    "events_sliding_window",
    oracle="""
    SELECT window_start, COUNT(*) AS n_events, ROUND(SUM(value), 4) AS sum_value
    FROM (
      SELECT make_timestamp(CAST((floor(epoch(ts) / 1200) * 1200 - k * 1200) * 1000000 AS BIGINT)) AS window_start,
             value
      FROM events, UNNEST([0, 1, 2]) AS t(k)) w
    GROUP BY window_start ORDER BY window_start
    """,
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch form of the streaming sliding-window aggregation: 1-hour
    windows every 20 minutes (each event lands in exactly 3 overlapping
    windows — the oracle materializes them via UNNEST of the 3 offsets)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "20 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
        .orderBy("window_start")
    )


@register(
    "embedding_quantize_int8",
    oracle="""
    WITH v AS (
      SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS xs
      FROM embeddings),
    m AS (
      SELECT vec_id, xs, list_max([abs(x) FOR x IN xs]) AS maxabs FROM v)
    SELECT vec_id, maxabs,
           list_max([abs(x - round(x * (127.0 / maxabs)) / (127.0 / maxabs))
                     FOR x IN xs]) AS max_err
    FROM m WHERE maxabs > 0 ORDER BY vec_id LIMIT 50
    """,
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization round-trip: per-vector scale =
    127/max|x|, reconstruction error = max|x - round(x*scale)/scale|.
    Every arithmetic step is an element-wise IEEE double op (max is
    order-free), so the doubles compare bit-exact with no rounding."""
    emb = _t(spark, sf_dir, "embeddings")
    xs = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    maxabs = F.array_max(F.transform(F.col("xs"), F.abs))
    scale = F.lit(127.0) / F.col("maxabs")
    err = F.array_max(
        F.transform(
            F.col("xs"),
            lambda x: F.abs(x - F.round(x * scale) / scale),
        )
    )
    return (
        emb.select("vec_id", xs.alias("xs"))
        .withColumn("maxabs", maxabs)
        .filter(F.col("maxabs") > 0)
        .select("vec_id", "maxabs", err.alias("max_err"))
        .orderBy("vec_id")
        .limit(50)
    )


@register(
    "embedding_centroid_assign",
    oracle="""
    WITH c AS (SELECT vec_id AS centroid_id,
                      [CAST(x AS DOUBLE) FOR x IN embedding] AS cs
               FROM embeddings WHERE vec_id < 8),
    scored AS (
      SELECT e.vec_id, c.centroid_id,
             list_sum([(xs[i] - cs[i]) * (xs[i] - cs[i])
                       FOR i IN range(1, len(xs) + 1)]) AS dist
      FROM (SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS xs
            FROM embeddings) e
      CROSS JOIN c),
    assigned AS (
      SELECT vec_id, centroid_id,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY dist, centroid_id) AS rn
      FROM scored)
    SELECT centroid_id, COUNT(*) AS n_assigned
    FROM assigned WHERE rn = 1
    GROUP BY centroid_id ORDER BY centroid_id
    """,
)
def embedding_centroid_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid assignment (the Lloyd's/IVF inner step): 8 seed
    centroids broadcast against the full corpus, per-centroid population
    counts. Argmin is robust to sub-ULP distance differences, so the
    counts are engine-exact."""
    emb = _t(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    assigned = sim_mod.centroid_assign(emb, cents)
    return (
        assigned.groupBy("centroid_id")
        .agg(F.count(F.lit(1)).alias("n_assigned"))
        .orderBy("centroid_id")
    )


@register(
    "fuzzy_match_part_names",
    oracle="""
    SELECT levenshtein(a.p_name, b.p_name) AS dist, COUNT(*) AS n_pairs
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) BETWEEN 1 AND 4
    GROUP BY dist ORDER BY dist
    """,
)
def fuzzy_match_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy match (entity resolution): Levenshtein distance over
    same-brand part-name pairs, histogrammed by distance. Brand blocking
    keeps the pairwise join quadratic only within blocks — the standard
    trick that makes edit-distance matching feasible at scale."""
    part = _t(spark, sf_dir, "part")
    # collapse to distinct (brand, name) with multiplicities first: the
    # quadratic comparison then runs over distinct names per brand, not
    # rows, and each name-pair contributes c_a * c_b row-pairs. Distance
    # is symmetric, so ordering by name (not key) dedupes pairs; same-name
    # pairs have distance 0 and fall outside the [1, 4] band.
    g = part.groupBy(
        F.col("p_brand").alias("brand"), F.col("p_name").alias("name")
    ).agg(F.count(F.lit(1)).alias("c"))
    a = g.select("brand", F.col("name").alias("na"), F.col("c").alias("ca"))
    b = g.select("brand", F.col("name").alias("nb"), F.col("c").alias("cb"))
    dist = F.levenshtein("na", "nb")
    return (
        a.join(b, ["brand"])
        .filter(F.col("na") < F.col("nb"))
        .select(dist.alias("dist"), (F.col("ca") * F.col("cb")).alias("m"))
        .filter(F.col("dist").between(1, 4))
        .groupBy("dist")
        .agg(F.sum("m").cast("bigint").alias("n_pairs"))
        .orderBy("dist")
    )


@register(
    "full_outer_nation_reconciliation",
    oracle="""
    SELECT COALESCE(c.nk, s.nk) AS nationkey,
           COALESCE(n_cust, 0) AS n_cust,
           COALESCE(n_supp, 0) AS n_supp
    FROM (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY 1) c
    FULL OUTER JOIN
         (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier GROUP BY 1) s
      ON c.nk = s.nk
    ORDER BY nationkey
    """,
)
def full_outer_nation_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer reconciliation of two aggregates (the classic 'compare
    two systems' report): per-nation customer vs supplier counts, nulls
    zero-filled on both sides."""
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    c = cust.groupBy(F.col("c_nationkey").alias("nk_c")).agg(
        F.count(F.lit(1)).alias("n_cust")
    )
    s = supp.groupBy(F.col("s_nationkey").alias("nk_s")).agg(
        F.count(F.lit(1)).alias("n_supp")
    )
    return (
        c.join(s, c.nk_c == s.nk_s, "full_outer")
        .select(
            F.coalesce("nk_c", "nk_s").alias("nationkey"),
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
        .orderBy("nationkey")
    )


@register(
    "skew_salted_event_counts",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events, ROUND(SUM(value), 4) AS sum_value
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)
def skew_salted_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation (the hot-key answer at 100 TB): salt →
    partial agg → merge. The oracle is the plain GROUP BY — proving the
    salted rewrite computes the identical result."""
    ev = _t(spark, sf_dir, "events")
    out = skew_mod.salted_agg(
        ev,
        "user_id",
        {"n_events": ("count", "*"), "sum_value": ("sum", "value")},
    )
    return out.select(
        "user_id",
        F.col("n_events"),
        F.round("sum_value", 4).alias("sum_value"),
    ).orderBy("user_id")


@register(
    "text_tfidf_top_terms",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lower(w) AS term
      FROM (SELECT doc_id, UNNEST(string_split_regex(trim(text), '\\s+')) AS w
            FROM documents WHERE trim(text) <> '')),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
    df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             ROUND(tf.tf * (ln((n_docs + 1.0) / (df.df + 1.0)) + 1.0), 4) AS tfidf
      FROM tf JOIN df USING (term) CROSS JOIN n)
    SELECT doc_id, term, tfidf FROM (
      SELECT doc_id, term, tfidf,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, term) AS rn
      FROM scored WHERE doc_id < 30) t
    WHERE rn <= 3 ORDER BY doc_id, tfidf DESC, term
    """,
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF with smoothed idf (ln((N+1)/(df+1))+1), top-3 terms for the
    first 30 docs. Document frequency is computed over the WHOLE corpus
    before restricting output — the part people get wrong. All counting
    is JVM-side; one shuffle for tf, one for df (both map-side combined),
    idf joins back as a broadcast."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.filter(F.trim("text") != "").select(
        "doc_id",
        F.explode(F.split(F.trim("text"), r"\s+")).alias("w"),
    ).select("doc_id", F.lower("w").alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.filter(F.col("doc_id") < 30)
        .join(F.broadcast(dfreq), "term")
        .join(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf")
                * (F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0),
                4,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "term")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "tfidf")
        .orderBy("doc_id", F.col("tfidf").desc(), "term")
    )


@register(
    "events_date_dimensions",
    oracle="""
    SELECT CAST(EXTRACT(year FROM ts) AS INTEGER) AS y,
           CAST(EXTRACT(quarter FROM ts) AS INTEGER) AS q,
           CAST(EXTRACT(dow FROM ts) AS INTEGER) AS dow,
           CAST(EXTRACT(hour FROM ts) AS INTEGER) AS hr,
           COUNT(*) AS n_events
    FROM events GROUP BY 1, 2, 3, 4 ORDER BY 1, 2, 3, 4
    """,
)
def events_date_dimensions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-dimension extraction breadth: year/quarter/day-of-week/
    hour rollup. Day-of-week conventions differ between engines (Spark
    dayofweek is 1=Sunday, DuckDB dow is 0=Sunday) — pinned by shifting
    Spark's to the 0-based convention."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.year("ts").alias("y"),
            F.quarter("ts").alias("q"),
            (F.dayofweek("ts") - 1).alias("dow"),
            F.hour("ts").alias("hr"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy("y", "q", "dow", "hr")
    )


# ---------------------------------------------------------------------------
# Approximate sketches (SURVEY §2.8 "approx_count_distinct"; mergeable
# summaries are the only way distinct-counting survives 100 TB)
# ---------------------------------------------------------------------------


@register(
    "approx_sketches_events",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS hll_ok,
           TRUE AS ds_hll_ok,
           ROUND(quantile_cont(value, 0.5), 6) AS p50,
           TRUE AS p50_ok
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def approx_sketches_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch breadth: HyperLogLog++ (approx_count_distinct), Apache
    DataSketches HLL (hll_sketch_agg → hll_sketch_estimate, the mergeable
    cross-system format), and approx_percentile, each checked against the
    exact answer *inside the query* — the output carries a boolean
    "estimate within 5%" flag that the oracle pins to TRUE. Estimates are
    deterministic for fixed input, so the flag is hash-stable, while the
    query still fails loudly if a sketch drifts out of its error bound.
    At 100 TB the exact columns are dropped and only the sketches run:
    both are single-pass, mergeable, map-side-combinable aggregates."""
    ev = _t(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id", 0.02).alias("hll_est"),
        F.expr("hll_sketch_estimate(hll_sketch_agg(user_id))").alias("ds_est"),
        F.expr("percentile(value, 0.5D)").alias("p50_exact"),
        F.expr("approx_percentile(value, 0.5D, 10000)").alias("p50_est"),
    )
    tol = F.col("exact_users") * 0.05
    return agg.select(
        "event_type",
        "exact_users",
        (F.abs(F.col("hll_est") - F.col("exact_users")) <= tol).alias("hll_ok"),
        (F.abs(F.col("ds_est") - F.col("exact_users")) <= tol).alias("ds_hll_ok"),
        F.round("p50_exact", 6).alias("p50"),
        (
            F.abs(F.col("p50_est") - F.col("p50_exact"))
            <= F.greatest(F.abs(F.col("p50_exact")) * 0.05, F.lit(1e-9))
        ).alias("p50_ok"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Multimodal columns as first-class queries (operators/multimodal.py):
# binary payload + typed metadata, decoded via Arrow-batched mapInPandas.
# ---------------------------------------------------------------------------


def _media_from_documents(spark: SparkSession, sf_dir: str, media_type: str,
                          fmt: str, modulus: int, residue: int) -> DataFrame:
    """Deterministic media table derived from `documents`: text bytes act
    as the opaque payload (real pipelines carry JPEG/WAV bytes here), and
    the metadata struct is computed from doc_id so oracles can reproduce
    it. duration_ms = ((doc_id % 5) + 1) * 3000 for video rows."""
    docs = _t(spark, sf_dir, "documents").filter(
        (F.col("doc_id") % modulus) == residue
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            (((F.col("doc_id") % 5) + 1) * 3000).cast("long").alias("duration_ms"),
            F.lit(None).cast("string").alias("uri"),
        ).alias("meta"),
    )


@register(
    "multimodal_frame_sample",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(UNNEST(range(0, ((doc_id % 5) + 1) * 3000, 1000)) AS BIGINT)
             AS frame_ts_ms
    FROM documents WHERE doc_id % 3 = 0 ORDER BY 1, 2
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-timestamp sampling through the stubbed demuxer
    (operators/multimodal.frame_sample, mapInPandas). The fake demux emits
    a frame every 1000 ms across meta.duration_ms, which the oracle
    reproduces with range()+UNNEST — a full value-level check that the
    Arrow batch plumbing (struct access, row explosion, schema) is right,
    even though the real ffmpeg call is stubbed."""
    media = _media_from_documents(spark, sf_dir, "video", "mp4", 3, 0)
    return mm_mod.frame_sample(media, every_ms=1000).orderBy(
        "media_id", "frame_ts_ms"
    )


@register(
    "multimodal_image_features",
    oracle="""
    WITH lanes AS (
      SELECT doc_id, len(text) AS n_bytes,
             (SELECT COALESCE(SUM(ascii(substr(text, CAST(u.i AS INT) + 1, 1))), 0)
              FROM UNNEST(range(0, LEAST(len(text), 1024))) AS u(i)
              WHERE u.i % 8 = 0) % 997 AS lane0
      FROM documents WHERE doc_id % 3 = 1)
    SELECT CAST(doc_id % 8 AS BIGINT) AS bucket,
           COUNT(*) AS n_images,
           CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
           CAST(SUM(lane0) AS BIGINT) AS f0_lane_sum
    FROM lanes GROUP BY doc_id % 8 ORDER BY bucket
    """,
)
def multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image feature extraction over binary payloads (stubbed decoder,
    real mapInPandas plumbing): byte-budget repartition sizes decode
    tasks by payload bytes, then each Arrow batch yields an 8-float
    feature vector per image. The fake decode's lane accumulator is an
    incremental mod — equal to a plain sum mod 997 — so the oracle
    replays the byte loop with ascii(substr(...)) and the per-image
    float feature round-trips to its exact integer lane value
    (round(f * 997)); every aggregate is integer-exact."""
    media = mm_mod.media_repartition(
        _media_from_documents(spark, sf_dir, "image", "jpeg", 3, 1),
        target_bytes=8 * 1024 * 1024,
    )
    feats = mm_mod.image_features(media, fake=True)
    return (
        feats.groupBy((F.col("media_id") % 8).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.sum("n_bytes").cast("bigint").alias("total_bytes"),
            F.sum(
                F.round(F.element_at("features", 1) * 997).cast("bigint")
            )
            .cast("bigint")
            .alias("f0_lane_sum"),
        )
        .orderBy("bucket")
    )


@register(
    "multimodal_audio_features",
    oracle="""
    WITH clips AS (
      SELECT doc_id, len(text) AS n_bytes,
             (SELECT SUM((ascii(substr(text, CAST(u.i AS INT), 1)) - 128) *
                         (ascii(substr(text, CAST(u.i AS INT), 1)) - 128))
              FROM UNNEST(range(1, LEAST(len(text), 2048) + 1)) AS u(i))
               AS sumsq,
             LEAST(len(text), 2048) AS n
      FROM documents WHERE doc_id % 3 = 2 AND len(text) > 0)
    SELECT CAST(doc_id % 8 AS BIGINT) AS bucket,
           COUNT(*) AS n_clips,
           CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
           CAST(0 AS BIGINT) AS zc_total,
           ROUND(MAX(SQRT(CAST(sumsq AS DOUBLE) / n) /
                     CAST(128 AS DOUBLE)), 6) AS max_rms
    FROM clips GROUP BY doc_id % 8 ORDER BY bucket
    """,
)
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio RMS / zero-crossing extraction (stubbed codec, real Arrow
    batch plumbing), now fully value-checked: the fake PCM treats
    payload bytes as centered samples, so the oracle recomputes the
    per-clip RMS from ascii(substr(...)) byte reads (correctly-rounded
    SQRT on both sides) and zero crossings are provably 0 on ASCII
    payloads (every sample is negative — pinned, not skipped). MAX is
    the order-independent aggregate for the per-clip float."""
    media = _media_from_documents(spark, sf_dir, "audio", "wav", 3, 2)
    feats = mm_mod.audio_features(media, fake=True)
    return (
        feats.groupBy((F.col("media_id") % 8).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_clips"),
            F.sum("n_bytes").cast("bigint").alias("total_bytes"),
            F.sum("zero_crossings").cast("bigint").alias("zc_total"),
            F.round(F.max("rms"), 6).alias("max_rms"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# Streaming widening: stream-stream join, streaming dedup
# ---------------------------------------------------------------------------


@register(
    "streaming_stream_stream_join",
    oracle="""
    SELECT p.user_id, p.event_id AS purchase_id, c.event_id AS click_id
    FROM events p JOIN events c
      ON p.event_type = 'purchase' AND c.event_type = 'click'
     AND c.user_id = p.user_id
     AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
    ORDER BY 1, 2, 3
    """,
)
def streaming_stream_stream_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream inner join (purchase ← clicks within the
    previous hour), drained availableNow; equals the batch range join."""
    import os as _os

    from .streaming.incremental import stream_stream_join

    out = stream_stream_join(spark, _os.path.join(sf_dir, "events.parquet"))
    return out.orderBy("user_id", "purchase_id", "click_id")


@register(
    "streaming_dedup_distinct_keys",
    oracle="SELECT DISTINCT user_id, event_type FROM events ORDER BY 1, 2",
)
def streaming_dedup_distinct_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming DISTINCT via dropDuplicatesWithinWatermark — bounded
    per-key state instead of forever-growing dedup state."""
    import os as _os

    from .streaming.incremental import stream_dedup_keys

    out = stream_dedup_keys(spark, _os.path.join(sf_dir, "events.parquet"))
    return out.orderBy("user_id", "event_type")


# ---------------------------------------------------------------------------
# Window frames + calendar arithmetic widening
# ---------------------------------------------------------------------------


@register(
    "window_frames_breadth",
    oracle="""
    SELECT event_id, user_id,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))) OVER
                 (PARTITION BY user_id ORDER BY epoch_ms(ts)
                  RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW), 4) AS DOUBLE) AS sum_1h,
           ROUND(PERCENT_RANK() OVER wv, 6) AS pr,
           ROUND(CUME_DIST() OVER wv, 6) AS cd
    FROM events
    WINDOW wv AS (PARTITION BY user_id ORDER BY value, event_id)
    ORDER BY user_id, event_id
    """,
)
def window_frames_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over event-time (trailing 1-hour sum) plus
    percent_rank/cume_dist. The trailing sum runs on DECIMAL so both
    engines accumulate exactly regardless of frame iteration order; the
    frame bound is epoch-millis RANGE, the sliding-window idiom that
    needs no self-join."""
    ev = _t(spark, sf_dir, "events")
    w_range = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_millis("ts"))
        .rangeBetween(-3600000, 0)
    )
    w_rank = Window.partitionBy("user_id").orderBy("value", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.sum(F.col("value").cast("decimal(18,4)")).over(w_range), 4)
        .cast("double")
        .alias("sum_1h"),
        F.round(F.percent_rank().over(w_rank), 6).alias("pr"),
        F.round(F.cume_dist().over(w_rank), 6).alias("cd"),
    ).orderBy("user_id", "event_id")


@register(
    "orders_date_arithmetic",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate + INTERVAL 30 DAY AS TIMESTAMP) AS due_ts,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end,
           CAST(date_trunc('week', o_orderdate) AS TIMESTAMP) AS week_start,
           CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31')
                AS INTEGER) AS days_to_eoy,
           CAST(o_orderdate + INTERVAL 3 MONTH AS TIMESTAMP) AS plus3mo
    FROM orders WHERE o_orderkey % 100 = 0 ORDER BY o_orderkey
    """,
)
def orders_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar/interval arithmetic breadth: day/month interval addition
    (with end-of-month clamping), last_day, ISO week truncation (Monday
    start in both engines), and day diffs. All pure column expressions —
    codegen'd, no shuffle beyond the final sort."""
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    return orders.select(
        "o_orderkey",
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_ts"),
        F.last_day(F.to_date("o_orderdate")).alias("month_end"),
        F.date_trunc("week", "o_orderdate").alias("week_start"),
        F.datediff(F.lit("1998-12-31").cast("date"), F.to_date("o_orderdate"))
        .cast("int")
        .alias("days_to_eoy"),
        (F.col("o_orderdate") + F.expr("INTERVAL 3 MONTHS")).alias("plus3mo"),
    ).orderBy("o_orderkey")


@register(
    "array_agg_user_event_types",
    oracle="""
    SELECT user_id,
           list_sort(list_distinct(list(event_type))) AS types_seen,
           CAST(len(list_distinct(list(event_type))) AS INTEGER) AS n_types,
           list_sort(list_intersect(list_distinct(list(event_type)),
                                    ['click', 'purchase'])) AS funnel_types
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)
def array_agg_user_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-aggregate breadth: collect_set → sorted array, cardinality,
    array_intersect against a literal set. Arrays are sorted before
    emission so the value hash is order-stable; collect_set is a map-side
    combinable aggregate (no row explosion survives the shuffle)."""
    ev = _t(spark, sf_dir, "events")
    types = F.sort_array(F.collect_set("event_type"))
    return (
        ev.groupBy("user_id")
        .agg(
            types.alias("types_seen"),
            F.size(F.collect_set("event_type")).cast("int").alias("n_types"),
            F.sort_array(
                F.array_intersect(
                    F.collect_set("event_type"),
                    F.array(F.lit("click"), F.lit("purchase")),
                )
            ).alias("funnel_types"),
        )
        .orderBy("user_id")
    )


@register(
    "agg_regression_lineitem",
    oracle="""
    SELECT l_returnflag,
           ROUND(corr(l_extendedprice, l_quantity), 6) AS price_qty_corr,
           ROUND(covar_samp(l_extendedprice, l_quantity), 4) AS price_qty_covar,
           ROUND(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
           ROUND(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_regression_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate breadth: Pearson correlation, sample
    covariance, least-squares slope/intercept per group — all single-pass
    mergeable aggregates (Spark uses numerically-stable co-moment updates,
    so partial aggregation still applies at 100 TB)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.corr("l_extendedprice", "l_quantity"), 6).alias("price_qty_corr"),
            F.round(F.covar_samp("l_extendedprice", "l_quantity"), 4).alias(
                "price_qty_covar"
            ),
            F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("slope"),
            F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 4).alias(
                "intercept"
            ),
        )
        .orderBy("l_returnflag")
    )


_SQL_CTE_TOP_CUSTOMERS = """
WITH revenue AS (
    SELECT o_custkey,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS total_spend,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_custkey
), ranked AS (
    SELECT o_custkey, total_spend, n_orders,
           ROW_NUMBER() OVER (ORDER BY total_spend DESC, o_custkey) AS rn
    FROM revenue
)
SELECT r.rn, r.o_custkey, c.c_name, r.total_spend, r.n_orders
FROM ranked r JOIN customer c ON c.c_custkey = r.o_custkey
WHERE r.rn <= 25
ORDER BY r.rn
"""


@register("sql_cte_top_customers", oracle=_SQL_CTE_TOP_CUSTOMERS)
def sql_cte_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ad-hoc SQL surface itself (SURVEY §2.8 'SQL / expression
    language'): tables registered as temp views, then one multi-CTE ANSI
    query through spark.sql — the exact string DuckDB runs as the oracle.
    Catalyst plans the window top-k before the customer join, so the join
    input is 25 rows (broadcast), not the full customer table."""
    for t in ("orders", "customer"):
        _t(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_SQL_CTE_TOP_CUSTOMERS)


# ---------------------------------------------------------------------------
# Densification, bucketing, sampling, gap-fill (SURVEY §2.8 breadth +
# training-pipeline reproducibility ops)
# ---------------------------------------------------------------------------


@register(
    "orders_month_densify",
    oracle="""
    WITH b AS (
        SELECT CAST(date_trunc('month', MIN(o_orderdate)) AS DATE) AS lo,
               CAST(date_trunc('month', MAX(o_orderdate)) AS DATE) AS hi
        FROM orders
    ), cal AS (
        SELECT CAST(m AS DATE) AS month
        FROM b, UNNEST(generate_series(b.lo, b.hi, INTERVAL 1 MONTH)) AS t(m)
    ), mo AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
               COUNT(*) AS n_orders,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        FROM orders WHERE o_totalprice > 450000 GROUP BY 1
    )
    SELECT cal.month, COALESCE(mo.n_orders, 0) AS n_orders,
           CAST(ROUND(COALESCE(mo.rev, 0), 2) AS DOUBLE) AS revenue
    FROM cal LEFT JOIN mo USING (month)
    ORDER BY cal.month
    """,
)
def orders_month_densify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar densification (gap-filling): generate every month between
    the data's min/max order date with ``sequence`` + ``explode`` and
    left-join the (sparse) high-value monthly rollup, zero-filling months
    with no qualifying orders. Scale shape: the fact table is reduced by a
    map-side-combinable groupBy FIRST; the calendar axis is O(months) rows,
    so the final left join is a broadcast of two tiny dimensions — the 100
    TB scan happens exactly once."""
    orders = _t(spark, sf_dir, "orders")
    monthly = (
        orders.filter(F.col("o_totalprice") > 450000)
        .groupBy(F.date_trunc("month", "o_orderdate").cast("date").alias("month"))
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(_DEC)).alias("rev"),
        )
    )
    cal = (
        orders.agg(
            F.date_trunc("month", F.min("o_orderdate")).cast("date").alias("lo"),
            F.date_trunc("month", F.max("o_orderdate")).cast("date").alias("hi"),
        )
        .select(
            F.explode(
                F.sequence(F.col("lo"), F.col("hi"), F.expr("interval 1 month"))
            ).alias("month")
        )
    )
    return (
        cal.join(monthly, "month", "left")
        .select(
            "month",
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.round(F.coalesce(F.col("rev"), F.lit(0)), 2)
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("month")
    )


@register(
    "ntile_customer_spend_deciles",
    oracle="""
    WITH spend AS (
        SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
        FROM orders GROUP BY o_custkey
    ), tiled AS (
        SELECT spend,
               NTILE(10) OVER (ORDER BY spend DESC, o_custkey) AS decile
        FROM spend
    )
    SELECT decile, COUNT(*) AS n_customers,
           CAST(ROUND(SUM(spend), 2) AS DOUBLE) AS decile_spend,
           CAST(ROUND(MIN(spend), 2) AS DOUBLE) AS min_spend,
           CAST(ROUND(MAX(spend), 2) AS DOUBLE) AS max_spend
    FROM tiled GROUP BY decile ORDER BY decile
    """,
)
def ntile_customer_spend_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth bucketing with NTILE over exact decimal spend (unique
    tiebreak on custkey keeps the tile assignment deterministic). The
    global-ORDER window is the demonstration; at 100 TB the same deciles
    come from approx_percentile boundaries + a width_bucket-style map-only
    assignment — no global sort."""
    orders = _t(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast(_DEC)).alias("spend")
    )
    w = Window.orderBy(F.col("spend").desc(), F.col("o_custkey"))
    return (
        spend.withColumn("decile", F.ntile(10).over(w))
        .groupBy("decile")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("spend"), 2).cast("double").alias("decile_spend"),
            F.round(F.min("spend"), 2).cast("double").alias("min_spend"),
            F.round(F.max("spend"), 2).cast("double").alias("max_spend"),
        )
        .orderBy("decile")
    )


@register(
    "histogram_order_totals",
    oracle="""
    -- DuckDB has no width_bucket; all values lie inside [0, 500000) so the
    -- PostgreSQL bucket rule reduces to floor(v / width) + 1.
    SELECT CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT) + 1 AS bucket,
           COUNT(*) AS n_orders,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 / COUNT(*), 4) AS avg_price
    FROM orders GROUP BY 1 ORDER BY bucket
    """,
)
def histogram_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram via width_bucket — a pure map-side expression
    followed by an 11-group aggregate: the cheapest possible distribution
    profile of a 100 TB column (single scan, partial agg, no sort). The
    average goes through an exact decimal sum so both engines divide the
    same quantity."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.withColumn(
            "bucket",
            F.expr("width_bucket(o_totalprice, 0, 500000, 10)").cast("bigint"),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(
                F.sum(F.col("o_totalprice").cast(_DEC)).cast("double")
                / F.count("*"),
                4,
            ).alias("avg_price"),
        )
        .orderBy("bucket")
    )


@register(
    "deterministic_sample_orders",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_sampled,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS sum_total
    FROM orders
    WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) IN ('0', '1')
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def deterministic_sample_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible ~12.5% sample by content hash (first hex digit of
    md5(key)) — the sampling pattern a training pipeline needs: stable
    across runs, engines, partitionings, and cluster sizes, unlike
    ``df.sample`` whose output depends on partition layout. Map-only
    filter + partial agg; at 100 TB nothing shuffles but 5 groups."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.filter(
            F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1).isin(
                "0", "1"
            )
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_sampled"),
            F.round(F.sum(F.col("o_totalprice").cast(_DEC)), 2)
            .cast("double")
            .alias("sum_total"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "events_locf_gap_fill",
    oracle="""
    WITH c AS (
        SELECT event_type,
               LAST_VALUE(CASE WHEN event_type = 'purchase' THEN value END
                          IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS last_purchase_value
        FROM events
    )
    SELECT event_type, COUNT(*) AS n_events,
           COUNT(last_purchase_value) AS n_with_carry,
           ROUND(SUM(last_purchase_value), 4) AS sum_carried
    FROM c GROUP BY event_type ORDER BY event_type
    """,
)
def events_locf_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward: every event sees the most recent
    purchase value of its user (NULL before the first purchase) via
    ``last(..., ignorenulls=True)`` over a running ROWS frame with a
    deterministic (ts, event_id) order. The window partitions by user_id —
    one shuffle on the natural key, state bounded per user, no global
    sort; the standard time-series imputation shape."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = ev.withColumn(
        "last_purchase_value",
        F.last(
            F.when(F.col("event_type") == "purchase", F.col("value")),
            ignorenulls=True,
        ).over(w),
    )
    return (
        carried.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.count("last_purchase_value").alias("n_with_carry"),
            F.round(F.sum("last_purchase_value"), 4).alias("sum_carried"),
        )
        .orderBy("event_type")
    )


@register(
    "similarity_ivf_topk",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, embedding AS q_vec FROM embeddings WHERE vec_id < 5),
    scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             list_dot_product([CAST(x AS DOUBLE) FOR x IN q.q_vec],
                              [CAST(x AS DOUBLE) FOR x IN e.embedding]) /
             (sqrt(list_dot_product([CAST(x AS DOUBLE) FOR x IN q.q_vec],
                                    [CAST(x AS DOUBLE) FOR x IN q.q_vec])) *
              sqrt(list_dot_product([CAST(x AS DOUBLE) FOR x IN e.embedding],
                                    [CAST(x AS DOUBLE) FOR x IN e.embedding]))) AS cos
      FROM embeddings e CROSS JOIN q
      WHERE e.vec_id <> q.query_id)
    SELECT query_id, neighbor_id, rank, ROUND(cos, 6) AS cosine FROM (
      SELECT query_id, neighbor_id, cos,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
      FROM scored) t
    WHERE rank <= 3 ORDER BY query_id, rank
    """,
)
def similarity_ivf_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) ANN with nprobe = n_centroids, which makes the
    candidate set exhaustive — so the exact brute-force oracle applies and
    the whole IVF machinery (centroid sampling, list assignment, probe
    join, per-list rescoring) is verified end-to-end. Production recall/
    cost trades down by lowering nprobe; see ``similarity_lsh_topk`` for
    the rows-only approximate variant."""
    emb = _t(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 5)
    return sim_mod.ivf_topk(
        emb, qs, k=3, n_centroids=16, nprobe=16
    ).orderBy("query_id", "rank")


# ---------------------------------------------------------------------------
# Product-analytics shapes: funnel, cohort retention, per-user array algebra,
# LATERAL top-1 (SURVEY §2.8 breadth)
# ---------------------------------------------------------------------------


@register(
    "events_funnel_view_click_purchase",
    oracle="""
    WITH v AS (
        SELECT user_id, MIN(ts) AS first_view
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
        SELECT e.user_id, v.first_view, MIN(e.ts) AS first_click
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts > v.first_view
        GROUP BY e.user_id, v.first_view
    ), p AS (
        SELECT e.user_id, c.first_view, c.first_click, MIN(e.ts) AS first_purchase
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.first_click
        GROUP BY e.user_id, c.first_view, c.first_click
    )
    SELECT user_id, first_view, first_click, first_purchase
    FROM p ORDER BY user_id
    """,
)
def events_funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel analysis: users who did view -> click -> purchase in
    strict timestamp order, with the earliest qualifying time of each
    stage. Three filtered min-aggregates chained by user_id equi-joins —
    every shuffle is on the same key, so at 100 TB the stages co-partition
    (one exchange, reused) and each MIN is map-side partial; no window, no
    sort, no fact-sized intermediate."""
    ev = _t(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("first_view"))
        .groupBy("user_id", "first_view")
        .agg(F.min("ts").alias("first_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("first_click"))
        .groupBy("user_id", "first_view", "first_click")
        .agg(F.min("ts").alias("first_purchase"))
    )
    return p.select(
        "user_id", "first_view", "first_click", "first_purchase"
    ).orderBy("user_id")


@register(
    "events_cohort_retention",
    oracle="""
    WITH fm AS (
        SELECT user_id, CAST(MIN(ts) AS DATE) AS cohort_day
        FROM events GROUP BY user_id
    ), act AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS act_day
        FROM events
    )
    SELECT f.cohort_day,
           CAST(datediff('day', f.cohort_day, a.act_day) AS BIGINT)
             AS day_offset,
           COUNT(DISTINCT a.user_id) AS n_users
    FROM act a JOIN fm f ON a.user_id = f.user_id
    GROUP BY 1, 2 ORDER BY cohort_day, day_offset
    """,
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-active day,
    counted on each later day they return. The (user, day) activity set is
    deduped FIRST (shuffle carries one row per user-day, not per event),
    then joined to the per-user cohort on user_id — co-partitioned with
    the dedup — and the final distinct-count groups by the tiny (cohort,
    offset) key. day_offset is an exact integer date difference."""
    ev = _t(spark, sf_dir, "events")
    fm = ev.groupBy("user_id").agg(F.min("ts").cast("date").alias("cohort_day"))
    act = ev.select("user_id", F.col("ts").cast("date").alias("act_day")).distinct()
    return (
        act.join(fm, "user_id")
        .withColumn(
            "day_offset", F.datediff("act_day", "cohort_day").cast("bigint")
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("cohort_day", "day_offset")
    )


@register(
    "array_set_ops_user_event_types",
    oracle="""
    WITH s AS (
        SELECT user_id,
               list_sort(list_distinct(COALESCE(
                   list(event_type) FILTER (WHERE event_id % 2 = 0), [])))
                 AS even_types,
               list_sort(list_distinct(COALESCE(
                   list(event_type) FILTER (WHERE event_id % 2 = 1), [])))
                 AS odd_types
        FROM events GROUP BY user_id
    )
    SELECT user_id, even_types, odd_types,
           list_sort(list_intersect(even_types, odd_types)) AS common_types,
           list_sort(list_filter(even_types,
                                 x -> NOT list_contains(odd_types, x)))
             AS even_only_types
    FROM s ORDER BY user_id
    """,
)
def array_set_ops_user_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set algebra per key: the distinct event-type vocabularies of
    two deterministic halves of each user's stream (even/odd event_id) and
    their intersection / difference, all sorted so the array values are
    order-stable. One groupBy on the natural key; the set ops are JVM
    array expressions on already-aggregated rows — nothing re-shuffles."""
    ev = _t(spark, sf_dir, "events")
    even = F.array_sort(
        F.array_distinct(
            F.collect_list(
                F.when(F.col("event_id") % 2 == 0, F.col("event_type"))
            )
        )
    )
    odd = F.array_sort(
        F.array_distinct(
            F.collect_list(
                F.when(F.col("event_id") % 2 == 1, F.col("event_type"))
            )
        )
    )
    return (
        ev.groupBy("user_id")
        .agg(even.alias("even_types"), odd.alias("odd_types"))
        .select(
            "user_id",
            "even_types",
            "odd_types",
            F.array_sort(
                F.array_intersect("even_types", "odd_types")
            ).alias("common_types"),
            F.array_sort(F.array_except("even_types", "odd_types")).alias(
                "even_only_types"
            ),
        )
        .orderBy("user_id")
    )


_LATERAL_TOP_ORDER = """
SELECT c.c_custkey, c.c_name, t.o_orderkey, t.top_price
FROM customer c, LATERAL (
    SELECT o_orderkey, o_totalprice AS top_price
    FROM orders o
    WHERE o.o_custkey = c.c_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 1
) t
WHERE c.c_custkey < 100
ORDER BY c.c_custkey
"""


@register("lateral_top_order_per_customer", oracle=_LATERAL_TOP_ORDER)
def lateral_top_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (SQL-surface breadth): per customer,
    the single most expensive order, written as a lateral ORDER BY/LIMIT 1
    — the same ANSI text runs on both engines. Catalyst rewrites the
    lateral into a ranked join rather than executing per-row subqueries,
    so the plan is one shuffle + window, not N scans; semantically
    identical to the `window_topk_orders_per_customer` DataFrame variant."""
    for t in ("customer", "orders"):
        _t(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_LATERAL_TOP_ORDER)


# ---------------------------------------------------------------------------
# Co-occurrence, quantile bucket-join (the scale path of NTILE), rolling
# distinct window (SURVEY §2.8 breadth)
# ---------------------------------------------------------------------------


@register(
    "market_basket_brand_pairs",
    oracle="""
    WITH ob AS (
        SELECT DISTINCT l.l_orderkey, p.p_brand
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ), pairs AS (
        SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
               COUNT(*) AS n_orders
        FROM ob a JOIN ob b
          ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
        GROUP BY 1, 2
    )
    SELECT brand_a, brand_b, n_orders FROM (
        SELECT brand_a, brand_b, n_orders,
               ROW_NUMBER() OVER (ORDER BY n_orders DESC, brand_a, brand_b) AS rn
        FROM pairs) t
    WHERE rn <= 20 ORDER BY n_orders DESC, brand_a, brand_b
    """,
)
def market_basket_brand_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: the 20 brand pairs most often bought
    in the same order. The part dimension broadcasts into the fact scan,
    (order, brand) is deduped before the self-join so the pair fanout is
    bounded by brands-per-order (≤25), and the self-join co-partitions on
    l_orderkey — the one shuffle the fact pays. Top-20 is a tie-broken
    row_number so the result set is deterministic."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    ob = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    a = ob.alias("a")
    b = ob.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.p_brand") < F.col("b.p_brand")),
        )
        .groupBy(
            F.col("a.p_brand").alias("brand_a"),
            F.col("b.p_brand").alias("brand_b"),
        )
        .agg(F.count("*").alias("n_orders"))
    )
    w = Window.orderBy(F.col("n_orders").desc(), "brand_a", "brand_b")
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select("brand_a", "brand_b", "n_orders")
        .orderBy(F.col("n_orders").desc(), "brand_a", "brand_b")
    )


@register(
    "bucket_join_spend_quartiles",
    oracle="""
    WITH spend AS (
        SELECT o_custkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
        FROM orders GROUP BY o_custkey
    ), q AS (
        SELECT quantile_cont(spend, 0.25) AS q1,
               quantile_cont(spend, 0.50) AS q2,
               quantile_cont(spend, 0.75) AS q3
        FROM spend
    )
    SELECT CASE WHEN s.spend <= q.q1 THEN 1
                WHEN s.spend <= q.q2 THEN 2
                WHEN s.spend <= q.q3 THEN 3
                ELSE 4 END AS quartile,
           COUNT(*) AS n_customers,
           ROUND(SUM(s.spend), 2) AS total_spend
    FROM spend s CROSS JOIN q
    GROUP BY 1 ORDER BY quartile
    """,
)
def bucket_join_spend_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile bucketing the way it scales: compute the three quartile
    boundaries once (a tiny all-reduce), broadcast them against the
    per-customer spend, and assign buckets with a map-only CASE — no
    global sort, unlike NTILE (`ntile_customer_spend_deciles`). Spend is
    an exact decimal sum cast to double (< 2^53 cents, so the cast is
    exact) and both engines share the linear-interpolation percentile
    rule, so the boundaries are bit-identical."""
    orders = _t(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast(_DEC)).cast("double").alias("spend")
    )
    q = spend.agg(
        F.expr("percentile(spend, 0.25)").alias("q1"),
        F.expr("percentile(spend, 0.50)").alias("q2"),
        F.expr("percentile(spend, 0.75)").alias("q3"),
    )
    return (
        spend.crossJoin(F.broadcast(q))
        .withColumn(
            "quartile",
            F.when(F.col("spend") <= F.col("q1"), 1)
            .when(F.col("spend") <= F.col("q2"), 2)
            .when(F.col("spend") <= F.col("q3"), 3)
            .otherwise(4)
            .cast("int"),
        )
        .groupBy("quartile")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("spend"), 2).alias("total_spend"),
        )
        .orderBy("quartile")
    )


@register(
    "events_rolling_7day_distinct_users",
    oracle="""
    WITH ud AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ), days AS (
        SELECT DISTINCT day FROM ud
    )
    SELECT d.day, COUNT(DISTINCT u.user_id) AS n_users_7d
    FROM days d JOIN ud u ON u.day BETWEEN d.day - 6 AND d.day
    GROUP BY d.day ORDER BY d.day
    """,
)
def events_rolling_7day_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users — COUNT(DISTINCT) over a sliding range,
    which no window frame supports directly. The stream collapses to one
    row per (user, day) FIRST (the only fact-sized shuffle), then a tiny
    broadcast day-spine range-joins the deduped set; each day re-counts
    distinct users over its 7-day slice. At 100 TB the user-day dedup is
    the working set (~users x days), orders of magnitude smaller than
    events."""
    ev = _t(spark, sf_dir, "events")
    ud = ev.select("user_id", F.col("ts").cast("date").alias("day")).distinct()
    days = ud.select("day").distinct()
    d = days.alias("d")
    u = ud.alias("u")
    return (
        d.join(
            u,
            (F.col("u.day") >= F.date_sub(F.col("d.day"), 6))
            & (F.col("u.day") <= F.col("d.day")),
        )
        .groupBy(F.col("d.day").alias("day"))
        .agg(F.countDistinct("u.user_id").alias("n_users_7d"))
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# String aggregation + window-over-aggregate composition (final breadth)
# ---------------------------------------------------------------------------


@register(
    "listagg_nations_per_region",
    oracle="""
    SELECT r.r_name AS region,
           string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations,
           COUNT(*) AS n_nations
    FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name ORDER BY region
    """,
)
def listagg_nations_per_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LISTAGG/string_agg parity: comma-joined nation names per region,
    made order-deterministic by sorting inside the aggregate
    (array_sort(collect_list) -> array_join — Spark's collect order is
    partition-dependent, so the sort is mandatory, not cosmetic)."""
    region = _t(spark, sf_dir, "region")
    nation = _t(spark, sf_dir, "nation")
    return (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias(
                "nations"
            ),
            F.count("*").alias("n_nations"),
        )
        .orderBy("region")
    )


@register(
    "orders_mom_revenue_growth",
    oracle="""
    WITH m AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
                 AS revenue
        FROM orders GROUP BY 1
    )
    SELECT month, revenue,
           LAG(revenue) OVER (ORDER BY month) AS prev_revenue,
           ROUND((revenue - LAG(revenue) OVER (ORDER BY month))
                 / LAG(revenue) OVER (ORDER BY month) * 100, 4) AS pct_change
    FROM m ORDER BY month
    """,
)
def orders_mom_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth: window-over-aggregate composition
    — the fact collapses to one row per month first (map-side partial
    agg), then LAG runs on the O(months) series, so the 'global' window
    orders ~80 rows, not 100 TB. The percent change divides exact
    decimal-derived doubles, rounded on both engines."""
    orders = _t(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month")
    ).agg(
        F.round(F.sum(F.col("o_totalprice").cast(_DEC)), 2)
        .cast("double")
        .alias("revenue")
    )
    w = Window.orderBy("month")
    prev = F.lag("revenue").over(w)
    return (
        m.withColumn("prev_revenue", prev)
        .withColumn(
            "pct_change",
            F.round((F.col("revenue") - prev) / prev * 100, 4),
        )
        .orderBy("month")
    )


# ---------------------------------------------------------------------------
# TPC-H shapes 2/9/11/16/20 — adapted to this schema (no partsupp table:
# the part-supplier relationship is derived from lineitem, which preserves
# each query's characteristic operator shape: correlated argmin, profit
# expression over a snowflake, scalar-subquery threshold, NOT IN with
# grouped distinct counts, nested correlated quantity threshold).
# ---------------------------------------------------------------------------


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH eursupp AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    ), cost AS (
      SELECT l_partkey AS partkey, l_suppkey AS suppkey,
             ROUND(CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE)
                   / SUM(l_quantity), 4) AS supply_cost
      FROM lineitem JOIN eursupp ON s_suppkey = l_suppkey
      GROUP BY 1, 2
    ), mc AS (
      SELECT partkey, MIN(supply_cost) AS min_cost FROM cost GROUP BY 1
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name, supply_cost
    FROM cost
    JOIN mc ON cost.partkey = mc.partkey AND cost.supply_cost = mc.min_cost
    JOIN part ON p_partkey = cost.partkey
    JOIN eursupp ON s_suppkey = cost.suppkey
    WHERE p_size <= 15 AND p_type = 'STANDARD'
    ORDER BY s_acctbal DESC, s_name, p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2-style min-cost supplier (partsupp derived from lineitem: supply
    cost = per-(part,supplier) average unit price). The correlated
    MIN-subquery becomes a window MIN over partkey on the already-reduced
    (part,supplier) aggregate — lineitem shuffles once on the pair key;
    the window input is |part|x|supp-per-part|, orders of magnitude
    smaller than the fact. Part/supplier/nation/region filters broadcast
    into the scan before the aggregate so only qualifying rows shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    part_f = part.filter(
        (F.col("p_size") <= 15) & (F.col("p_type") == "STANDARD")
    ).select("p_partkey", "p_name")
    supp_eur = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(
            F.broadcast(region.filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cost = (
        li.join(F.broadcast(part_f), li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(supp_eur), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(
            F.round(
                F.round(F.sum(F.col("l_extendedprice").cast(_DEC)), 2).cast("double")
                / F.sum("l_quantity"),
                4,
            ).alias("supply_cost")
        )
    )
    w = Window.partitionBy("p_partkey")
    return (
        cost.withColumn("min_cost", F.min("supply_cost").over(w))
        .filter(F.col("supply_cost") == F.col("min_cost"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "supply_cost")
        .orderBy(F.col("s_acctbal").desc(), "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "q9_product_type_profit",
    oracle="""
    SELECT nation, o_year,
           CAST(ROUND(SUM(amount), 2) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n_name AS nation,
             EXTRACT(year FROM o_orderdate) AS o_year,
             CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,4))
               - CAST(l_quantity AS DECIMAL(18,2)) * CAST(p_retailprice AS DECIMAL(18,2))
                 * CAST(0.1 AS DECIMAL(3,1)) AS amount
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%red%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9-style product-type profit (supply cost proxied as 10% of
    p_retailprice since there is no partsupp). Snowflake with one fact-fact
    shuffle (lineitem-orders); part and supplier+nation broadcast. All
    money arithmetic stays in DECIMAL so the profit sum is exact and
    partition-order-independent."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    nation = _t(spark, sf_dir, "nation")
    part_red = part.filter(F.col("p_name").like("%red%")).select(
        "p_partkey", "p_retailprice"
    )
    supp_nat = supp.join(
        F.broadcast(nation), supp.s_nationkey == nation.n_nationkey
    ).select("s_suppkey", F.col("n_name").alias("nation"))
    amount = F.col("l_extendedprice").cast(_DEC) * (
        F.lit(1) - F.col("l_discount")
    ).cast(_DEC4) - F.col("l_quantity").cast(_DEC) * F.col("p_retailprice").cast(
        _DEC
    ) * F.lit(0.1).cast("decimal(3,1)")
    return (
        li.join(F.broadcast(part_red), li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(supp_nat), li.l_suppkey == F.col("s_suppkey"))
        .join(orders.select("o_orderkey", "o_orderdate"),
              li.l_orderkey == F.col("o_orderkey"))
        .select(
            "nation",
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount"), 2).cast("double").alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@register(
    "q11_important_inventory",
    oracle="""
    WITH pv AS (
      SELECT l_partkey AS partkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS value_dec
      FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_7'
      GROUP BY 1
    )
    SELECT partkey, CAST(value_dec AS DOUBLE) AS part_value
    FROM pv
    WHERE value_dec > (SELECT SUM(value_dec) * 0.001 FROM pv)
    ORDER BY part_value DESC, partkey
    """,
)
def q11_important_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11-style important inventory: per-part value for one nation's
    suppliers, kept only when above a fraction of the global total (the
    scalar subquery). The global total re-aggregates the per-part result
    (tiny) and broadcasts back — the fact table shuffles once. The
    threshold comparison runs in DECIMAL on both engines, so the > cut is
    exact — no float-boundary flakiness."""
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    supp_n7 = supp.join(
        F.broadcast(nation.filter(F.col("n_name") == "NATION_7")),
        supp.s_nationkey == nation.n_nationkey,
    ).select("s_suppkey")
    pv = (
        li.join(F.broadcast(supp_n7), li.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(F.col("l_extendedprice").cast(_DEC)).alias("value_dec"))
    )
    total = pv.agg(
        (F.sum("value_dec") * F.lit(0.001).cast("decimal(4,3)")).alias("threshold")
    )
    return (
        pv.join(F.broadcast(total), F.col("value_dec") > F.col("threshold"))
        .select("partkey", F.col("value_dec").cast("double").alias("part_value"))
        .orderBy(F.col("part_value").desc(), "partkey")
    )


@register(
    "q16_supplier_part_count",
    oracle="""
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q16_supplier_part_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16-style supplier counts per part descriptor (the 'complaints'
    exclusion becomes negative-balance suppliers). NOT IN compiles to a
    broadcast left-anti join (the excluded set is tiny); the part filter
    broadcasts into the lineitem scan; one shuffle for the distinct
    count."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    supp = _t(spark, sf_dir, "supplier")
    part_f = part.filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad_supp = supp.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(bad_supp), li.l_suppkey == F.col("s_suppkey"),
                "left_anti")
        .join(F.broadcast(part_f), li.l_partkey == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@register(
    "q20_excess_shippers",
    oracle="""
    WITH per AS (
      SELECT l_partkey AS pk, l_suppkey AS sk, SUM(l_quantity) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY 1, 2
    ), tot AS (
      SELECT pk, SUM(qty) AS total_qty FROM per GROUP BY 1
    )
    SELECT DISTINCT s_suppkey, s_name
    FROM per
    JOIN tot ON per.pk = tot.pk
    JOIN part ON p_partkey = per.pk AND p_name LIKE 'b%'
    JOIN supplier ON s_suppkey = per.sk
    JOIN nation ON n_nationkey = s_nationkey AND n_name = 'NATION_2'
    WHERE qty > 0.3 * total_qty
    ORDER BY s_suppkey
    """,
)
def q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20-style excess shippers: suppliers in one nation that shipped
    >30% of a qualifying part's 1996 volume (the classic nested
    correlated '0.5 * sum(qty)' threshold, with availqty replaced by the
    supplier's own shipped share). The correlated subquery becomes a
    window SUM over partkey on the (part,supplier) aggregate; the fact
    shuffles once on the pair key, the window reshuffles only the
    reduced aggregate. Part/supplier filters broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    part_b = part.filter(F.col("p_name").like("b%")).select("p_partkey")
    supp_n2 = supp.join(
        F.broadcast(nation.filter(F.col("n_name") == "NATION_2")),
        supp.s_nationkey == nation.n_nationkey,
    ).select("s_suppkey", "s_name")
    per = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        )
        .join(F.broadcast(part_b), li.l_partkey == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    w = Window.partitionBy("l_partkey")
    return (
        per.withColumn("total_qty", F.sum("qty").over(w))
        .filter(F.col("qty") > F.lit(0.3) * F.col("total_qty"))
        .join(F.broadcast(supp_n2), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name")
        .distinct()
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Sub-document dedup + corpus statistics (training-pipeline breadth)
# ---------------------------------------------------------------------------


@register(
    "chunk_dedup_20word",
    oracle="""
    WITH w AS (
      SELECT doc_id,
             string_split_regex(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')
               AS words
      FROM documents
    ), chunks AS (
      SELECT doc_id,
             md5(list_aggregate(words[i * 20 + 1 : i * 20 + 20], 'string_agg', ' '))
               AS chunk_hash
      FROM w, LATERAL (SELECT UNNEST(range(0, len(words) // 20)) AS i) g
    )
    SELECT chunk_hash, COUNT(*) AS n_occurrences,
           COUNT(DISTINCT doc_id) AS n_docs
    FROM chunks
    GROUP BY chunk_hash
    HAVING COUNT(*) > 1
    ORDER BY n_occurrences DESC, chunk_hash
    LIMIT 50
    """,
)
def chunk_dedup_20word(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document exact dedup (the Spark-expressible variant of
    suffix-array substring dedup a la Lee et al. 2022): documents are cut
    into complete non-overlapping 20-word chunks, each chunk is hashed,
    and chunks occurring more than once corpus-wide are surfaced. The
    chunking is a narrow projection (sequence + transform + slice, all
    codegen); only (hash, doc_id) pairs shuffle — 24 bytes per chunk
    regardless of document size, so the agg holds at 100 TB."""
    docs = _t(spark, sf_dir, "documents")
    words = F.split(
        F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "), " "
    )
    k = F.floor(F.size(words) / F.lit(20)).cast("int")
    chunk_hashes = F.transform(
        F.sequence(F.lit(0), k - 1),
        lambda i: F.md5(F.concat_ws(" ", F.slice(words, i * 20 + 1, 20))),
    )
    return (
        docs.filter(k > 0)
        .select(F.col("doc_id"), F.explode(chunk_hashes).alias("chunk_hash"))
        .groupBy("chunk_hash")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .filter(F.col("n_occurrences") > 1)
        .orderBy(F.col("n_occurrences").desc(), "chunk_hash")
        .limit(50)
    )


@register(
    "lexical_diversity_by_lang",
    oracle="""
    WITH tok AS (
      SELECT lang, UNNEST(string_split_regex(lower(trim(text)), '\\s+')) AS w
      FROM documents WHERE trim(text) <> ''
    )
    SELECT lang,
           COUNT(*) AS total_tokens,
           COUNT(DISTINCT w) AS distinct_tokens,
           ROUND(CAST(COUNT(DISTINCT w) AS DOUBLE) / COUNT(*), 6) AS type_token_ratio
    FROM tok
    GROUP BY lang
    ORDER BY lang
    """,
)
def lexical_diversity_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level type/token ratio per language: explode to one row per
    token, then count + distinct-count per lang. The explode is the
    scale hazard (tokens ~ 200x documents) but each row is (lang, word)
    — two short strings — and countDistinct rewrites to a two-stage
    partial aggregate, so the wide stage shuffles only distinct
    (lang, word) pairs, which is bounded by vocabulary size, not corpus
    size."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.filter(F.trim(F.col("text")) != "")
        .select(
            F.col("lang"),
            F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("w"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("total_tokens"),
            F.countDistinct("w").alias("distinct_tokens"),
        )
        .withColumn(
            "type_token_ratio",
            F.round(
                F.col("distinct_tokens").cast("double") / F.col("total_tokens"), 6
            ),
        )
        .orderBy("lang")
    )


@register(
    "dedup_rate_by_source",
    oracle="""
    SELECT source,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')))
             AS n_unique,
           ROUND(1.0 - CAST(COUNT(DISTINCT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))) AS DOUBLE)
                 / COUNT(*), 6) AS dup_rate
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source duplication-rate report (the go/no-go metric a crawl
    pipeline computes before choosing dedup strategy): docs vs distinct
    normalized fingerprints per source. Single hash-aggregate; the
    distinct count is again two-stage partial agg on (source, md5) —
    128 bits per distinct doc on the wire."""
    docs = _t(spark, sf_dir, "documents")
    fp = tx.fingerprint(F.col("text"))
    return (
        docs.select("source", fp.alias("fp"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("fp").alias("n_unique"),
        )
        .withColumn(
            "dup_rate",
            F.round(
                F.lit(1.0) - F.col("n_unique").cast("double") / F.col("n_docs"), 6
            ),
        )
        .orderBy("source")
    )


@register(
    "events_state_islands",
    oracle="""
    WITH marked AS (
      SELECT user_id, event_type, ts, event_id,
             CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                  THEN 1 ELSE 0 END AS chg
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), grp AS (
      SELECT user_id, event_type, ts,
             SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS island
      FROM marked
    )
    SELECT user_id, event_type, island,
           MIN(ts) AS island_start, MAX(ts) AS island_end,
           COUNT(*) AS run_length
    FROM grp
    GROUP BY user_id, event_type, island
    HAVING COUNT(*) >= 3
    ORDER BY user_id, island_start
    """,
)
def events_state_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands / run-length encoding of per-user state: each
    change of event_type starts a new island; islands are the SCD2-style
    [start, end] validity intervals. Both windows and the final groupBy
    partition on user_id, so after the first shuffle every later stage is
    shuffle-free (same-key partitioning reused) — the plan holds at
    billions of users because state never leaves its partition."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chg = F.when(
        ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type")), 1
    ).otherwise(0)
    grp = (
        ev.select("user_id", "event_type", "ts", "event_id")
        .withColumn("chg", chg)
        .withColumn(
            "island",
            F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    return (
        grp.groupBy("user_id", "event_type", "island")
        .agg(
            F.min("ts").alias("island_start"),
            F.max("ts").alias("island_end"),
            F.count(F.lit(1)).alias("run_length"),
        )
        .filter(F.col("run_length") >= 3)
        .orderBy("user_id", "island_start")
    )


@register(
    "udtf_bigram_top20",
    oracle="""
    WITH w AS (
      SELECT string_split_regex(lower(trim(text)), '\\s+') AS words
      FROM documents WHERE trim(text) <> ''
    ), b AS (
      SELECT UNNEST([words[i] || ' ' || words[i + 1]
                     FOR i IN range(1, len(words))]) AS bigram
      FROM w
    )
    SELECT bigram, COUNT(*) AS n
    FROM b GROUP BY bigram
    ORDER BY n DESC, bigram
    LIMIT 20
    """,
)
def udtf_bigram_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top bigrams via a Python UDTF (table function) — the user-facing
    UDTF surface of SURVEY §2.8. CAPABILITY DEMO: a UDTF runs row-at-a-
    time in Python workers; the hot-path formulation of this exact query
    is the codegen explode in word_count_top20 / chunk_dedup. Use a UDTF
    when per-row logic genuinely needs imperative Python AND yields a
    variable number of rows (parsers, tokenizers with state)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="bigram: string")
    class Bigrams:
        def eval(self, text: str):
            words = (text or "").lower().split()
            for a, b in zip(words, words[1:]):
                yield (a + " " + b,)

    spark.udtf.register("bigrams", Bigrams)
    docs = _t(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        """
        SELECT b.bigram, COUNT(*) AS n
        FROM _udtf_docs d, LATERAL bigrams(d.text) b
        GROUP BY b.bigram
        ORDER BY n DESC, bigram
        LIMIT 20
        """
    )


@register(
    "streaming_static_enrichment",
    oracle="""
    SELECT CAST(user_id % 5 AS INT) AS cohort,
           COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1 ORDER BY cohort
    """,
)
def streaming_static_enrichment_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static broadcast join: the event stream enriched with a
    static cohort dimension, aggregated per cohort under the event-time
    watermark. Zero streaming state for the join itself (the static side
    broadcasts into each micro-batch); the DECIMAL sum makes incremental
    accumulation equal the batch/oracle answer exactly."""
    import os as _os

    from .streaming.incremental import stream_static_enrichment

    dim = (
        _t(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .withColumn("cohort", (F.col("user_id") % 5).cast("int"))
    )
    out = stream_static_enrichment(
        spark, _os.path.join(sf_dir, "events.parquet"), dim
    )
    return out.select("cohort", "n_events", "sum_value").orderBy("cohort")


@register(
    "unigram_logprob_score",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             UNNEST(string_split_regex(lower(trim(text)), '\\s+')) AS w
      FROM documents WHERE trim(text) <> ''
    ), vocab AS (
      SELECT w, COUNT(*) AS cnt FROM tok GROUP BY w
    ), tot AS (
      SELECT SUM(cnt) AS n FROM vocab
    ), scored AS (
      SELECT t.doc_id,
             AVG(-ln(CAST(v.cnt AS DOUBLE) / (SELECT n FROM tot))) AS nll
      FROM tok t JOIN vocab v ON t.w = v.w
      GROUP BY t.doc_id
    )
    SELECT doc_id, ROUND(nll, 6) AS mean_nll
    FROM scored
    ORDER BY mean_nll DESC, doc_id
    LIMIT 25
    """,
)
def unigram_logprob_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-style quality scoring with a corpus-trained unigram LM:
    pass 1 aggregates corpus word counts (the 'training' job), pass 2
    scores each document by mean negative log-probability of its tokens
    — the standard 'surprising documents' filter when no neural LM is in
    the loop. The vocabulary broadcasts back into the scoring join
    (vocab is bounded, corpus is not), so the fact-side explode never
    shuffles: score = one broadcast-join + one doc_id aggregate."""
    docs = _t(spark, sf_dir, "documents")
    tok = docs.filter(F.trim(F.col("text")) != "").select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("w"),
    )
    vocab = tok.groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("n"))
    vocab_p = vocab.join(F.broadcast(total)).select(
        "w", (-F.log(F.col("cnt").cast("double") / F.col("n"))).alias("nll_w")
    )
    return (
        tok.join(F.broadcast(vocab_p), "w")
        .groupBy("doc_id")
        .agg(F.round(F.avg("nll_w"), 6).alias("mean_nll"))
        .orderBy(F.col("mean_nll").desc(), "doc_id")
        .limit(25)
    )


def _rp_weight_sql(d: int) -> str:
    # deterministic pseudo-random weight: exact integer arithmetic then one
    # division — bit-identical across engines
    return f"(CAST((({d} * 64 + (j - 1)) * 37) % 7 - 3 AS DOUBLE) / CAST(3 AS DOUBLE))"


_RP_ORACLE = "SELECT vec_id, " + ", ".join(
    f"""ROUND(list_reduce([CAST(embedding[j] AS DOUBLE) * {_rp_weight_sql(d)}
                 FOR j IN range(1, 65)], (a, b) -> a + b), 6) AS p{d}"""
    for d in range(4)
) + " FROM embeddings ORDER BY vec_id"


@register("embedding_random_projection", oracle=_RP_ORACLE)
def embedding_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss-style dimensionality reduction: project the
    64-dim embeddings onto 4 pseudo-random axes (deterministic integer-
    derived weights so the oracle reproduces them exactly). The whole
    projection is a narrow per-row fold (sequence → transform →
    aggregate, codegen'd) — no shuffle, no UDF; at 100 TB this is a
    map-only pass whose cost is the scan itself. The left-to-right fold
    order matches DuckDB's list_reduce, keeping the doubles bit-equal."""
    emb = _t(spark, sf_dir, "embeddings")
    projs = [
        F.round(
            F.expr(
                f"""aggregate(
                      transform(sequence(0, 63),
                        j -> CAST(element_at(embedding, j + 1) AS DOUBLE)
                             * (CAST(((({d} * 64 + j) * 37) % 7 - 3) AS DOUBLE)
                                / CAST(3 AS DOUBLE))),
                      0.0D, (a, x) -> a + x)"""
            ),
            6,
        ).alias(f"p{d}")
        for d in range(4)
    ]
    return emb.select("vec_id", *projs).orderBy("vec_id")


@register(
    "events_ewma_per_user",
    oracle="""
    WITH w AS (
      SELECT user_id, ts, value,
             list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS vs,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
    SELECT user_id, ts AS last_ts,
           ROUND(
             list_reduce([vs[i + 1] * power(0.5, len(vs) - 1 - i)
                          FOR i IN range(0, len(vs))], (a, b) -> a + b)
             / list_reduce([power(0.5, len(vs) - 1 - i)
                            FOR i IN range(0, len(vs))], (a, b) -> a + b),
             6) AS ewma
    FROM w WHERE rn = 1 ORDER BY user_id
    """,
)
def events_ewma_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average (finite 10-row window form,
    alpha = 0.5) of each user's value series, reported at their latest
    event. collect_list over the ordered frame keeps arrival order; the
    weighted fold is a codegen higher-order function. alpha = 0.5 makes
    every weight a power of two — exact in binary floating point — so the
    result is bit-identical across engines and partitionings. One
    user_id shuffle serves both windows."""
    ev = _t(spark, sf_dir, "events")
    wf = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-9, 0)
    wr = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    ewma = F.expr(
        """
        aggregate(transform(sequence(0, size(vs) - 1),
                    i -> element_at(vs, i + 1)
                         * power(0.5D, CAST(size(vs) - 1 - i AS DOUBLE))),
                  0.0D, (a, x) -> a + x)
        / aggregate(transform(sequence(0, size(vs) - 1),
                      i -> power(0.5D, CAST(size(vs) - 1 - i AS DOUBLE))),
                    0.0D, (a, x) -> a + x)
        """
    )
    return (
        ev.select(
            "user_id",
            "ts",
            F.collect_list("value").over(wf).alias("vs"),
            F.row_number().over(wr).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .select(
            "user_id", F.col("ts").alias("last_ts"), F.round(ewma, 6).alias("ewma")
        )
        .orderBy("user_id")
    )


@register(
    "stratified_sample_orders",
    oracle="""
    WITH h AS (
      SELECT o_orderkey, o_orderpriority, o_totalprice,
             CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15) AS BIGINT) % 100
               AS b
      FROM orders
    ), kept AS (
      SELECT * FROM h
      WHERE b < CASE o_orderpriority
                  WHEN '1-URGENT' THEN 50
                  WHEN '2-HIGH' THEN 25
                  ELSE 10 END
    )
    SELECT o_orderpriority,
           COUNT(*) AS n_sampled,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS sampled_revenue
    FROM kept
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def stratified_sample_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling: per-class keep rates (50% urgent
    / 25% high / 10% rest) by md5(key) bucket — the class-rebalancing
    primitive of training-data pipelines. Unlike sampleBy(), the hash
    gate is reproducible across runs and engines, survives reprocessing
    without leakage, and is a pure narrow filter (pushdown-friendly, no
    RNG state per partition)."""
    orders = _t(spark, sf_dir, "orders")
    bucket = (
        F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 15), 16, 10)
        .cast("long") % 100
    )
    rate = (
        F.when(F.col("o_orderpriority") == "1-URGENT", 50)
        .when(F.col("o_orderpriority") == "2-HIGH", 25)
        .otherwise(10)
    )
    return (
        orders.filter(bucket < rate)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.round(F.sum(F.col("o_totalprice").cast(_DEC)), 2)
            .cast("double")
            .alias("sampled_revenue"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "robust_stats_orders",
    oracle="""
    WITH med AS (
      SELECT o_orderpriority, median(o_totalprice) AS med_price,
             quantile_cont(o_totalprice, 0.25) AS q1,
             quantile_cont(o_totalprice, 0.75) AS q3
      FROM orders GROUP BY o_orderpriority
    )
    SELECT m.o_orderpriority,
           ROUND(m.med_price, 4) AS median_price,
           ROUND(m.q3 - m.q1, 4) AS iqr,
           ROUND(median(abs(o.o_totalprice - m.med_price)), 4) AS mad
    FROM orders o JOIN med m ON o.o_orderpriority = m.o_orderpriority
    GROUP BY m.o_orderpriority, m.med_price, m.q1, m.q3
    ORDER BY m.o_orderpriority
    """,
)
def robust_stats_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust dispersion statistics per group: median, IQR, and median
    absolute deviation. MAD is inherently two-pass (the deviations need
    the group median first); the per-group medians are a tiny aggregate
    that broadcasts back onto the fact scan, so the second pass adds no
    fact shuffle beyond the final per-group percentile. Exact
    percentiles (not approx) to stay bit-equal with the oracle —
    swap in percentile_approx at 100 TB when exactness isn't required."""
    orders = _t(spark, sf_dir, "orders")
    med = orders.groupBy("o_orderpriority").agg(
        F.expr("percentile(o_totalprice, 0.5D)").alias("med_price"),
        F.expr("percentile(o_totalprice, 0.25D)").alias("q1"),
        F.expr("percentile(o_totalprice, 0.75D)").alias("q3"),
    )
    return (
        orders.join(F.broadcast(med), "o_orderpriority")
        .groupBy("o_orderpriority", "med_price", "q1", "q3")
        .agg(
            F.expr("percentile(abs(o_totalprice - med_price), 0.5D)").alias("mad_raw")
        )
        .select(
            "o_orderpriority",
            F.round("med_price", 4).alias("median_price"),
            F.round(F.col("q3") - F.col("q1"), 4).alias("iqr"),
            F.round("mad_raw", 4).alias("mad"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "set_ops_multiset_event_types",
    oracle="""
    WITH l AS (SELECT event_type FROM events WHERE user_id % 2 = 0),
         r AS (SELECT event_type FROM events WHERE user_id % 2 = 1),
    i AS (SELECT event_type FROM l INTERSECT ALL SELECT event_type FROM r),
    e AS (SELECT event_type FROM l EXCEPT ALL SELECT event_type FROM r)
    SELECT 'common' AS which, event_type, COUNT(*) AS n FROM i GROUP BY 2
    UNION ALL
    SELECT 'left_surplus' AS which, event_type, COUNT(*) AS n FROM e GROUP BY 2
    ORDER BY which, event_type
    """,
)
def set_ops_multiset_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset set operations (INTERSECT ALL / EXCEPT ALL): per-type
    overlap between the even- and odd-user event streams with
    multiplicities preserved — intersectAll keeps min(countL, countR)
    copies, exceptAll keeps the left surplus. Both compile to a single
    aggregate-style shuffle on the compared columns (no join explosion)."""
    ev = _t(spark, sf_dir, "events")
    left = ev.filter(F.col("user_id") % 2 == 0).select("event_type")
    right = ev.filter(F.col("user_id") % 2 == 1).select("event_type")
    common = (
        left.intersectAll(right)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("common").alias("which"), "event_type", "n")
    )
    surplus = (
        left.exceptAll(right)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("left_surplus").alias("which"), "event_type", "n")
    )
    return common.unionAll(surplus).orderBy("which", "event_type")


@register(
    "argmax_customer_per_nation",
    oracle="""
    SELECT c_nationkey, c_name AS top_customer, c_acctbal AS top_acctbal
    FROM (
      SELECT c_nationkey, c_name, c_acctbal,
             row_number() OVER (PARTITION BY c_nationkey
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer) t
    WHERE rn = 1
    ORDER BY c_nationkey
    """,
)
def argmax_customer_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation argmax via the max_by aggregate with a composite
    (acctbal, -custkey) ordering struct — deterministic under ties. As an
    aggregate this is a single hash-shuffle with map-side partial
    combine; the equivalent row_number window (the oracle formulation)
    must SORT every partition, which at 100 TB is strictly more work for
    a top-1-per-group answer."""
    cust = _t(spark, sf_dir, "customer")
    key = F.struct(F.col("c_acctbal"), (-F.col("c_custkey")).alias("tb"))
    return (
        cust.groupBy("c_nationkey")
        .agg(
            F.max_by(F.col("c_name"), key).alias("top_customer"),
            F.max(key).getField("c_acctbal").alias("top_acctbal"),
        )
        .orderBy("c_nationkey")
    )


@register(
    "lineitem_unpivot_measures",
    oracle="""
    WITH u AS (
      UNPIVOT (SELECT l_quantity, l_extendedprice, l_discount, l_tax
               FROM lineitem)
      ON l_quantity, l_extendedprice, l_discount, l_tax
      INTO NAME measure VALUE v
    )
    SELECT measure,
           COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(v AS DECIMAL(18,4))), 4) AS DOUBLE) AS total,
           ROUND(MIN(v), 6) AS min_v,
           ROUND(MAX(v), 6) AS max_v
    FROM u
    GROUP BY measure
    ORDER BY measure
    """,
)
def lineitem_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long reshaping with the native unpivot/melt operator, then
    per-measure profiling. Unpivot is a zero-shuffle row-local transform
    (each input row yields |measures| output rows); the only shuffle is
    the 4-group aggregate. The DECIMAL(18,4) sum keeps the mixed-scale
    measures (quantities vs prices vs rates) exact on both engines."""
    li = _t(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ids=[],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="v",
    )
    return (
        long.groupBy("measure")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("v").cast("decimal(18,4)")), 4)
            .cast("double")
            .alias("total"),
            F.round(F.min("v"), 6).alias("min_v"),
            F.round(F.max("v"), 6).alias("max_v"),
        )
        .orderBy("measure")
    )


@register(
    "decontamination_8gram_overlap",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 100
               AS b,
             string_split_regex(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')
               AS words
      FROM documents
    ), grams AS (
      SELECT doc_id, b,
             UNNEST(list_distinct([list_aggregate(words[i:i+7], 'string_agg', ' ')
                                   FOR i IN range(1, len(words) - 6)])) AS g
      FROM d WHERE len(words) >= 8
    ),
    test_g AS (SELECT DISTINCT g FROM grams WHERE b < 5),
    hits AS (
      SELECT t.doc_id, t.g
      FROM grams t JOIN test_g ON t.g = test_g.g
      WHERE t.b >= 5
    )
    SELECT doc_id, COUNT(DISTINCT g) AS shared_8grams
    FROM hits
    GROUP BY doc_id
    HAVING COUNT(DISTINCT g) >= 3
    ORDER BY shared_8grams DESC, doc_id
    """,
)
def decontamination_8gram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (the GPT-3/Lee-et-al. n-gram protocol):
    flag training documents sharing >= 3 distinct 8-grams with the held-
    out slice (a deterministic 5% md5-bucket split, so the 'test set' is
    reproducible). The test side's distinct 8-grams are a bounded set
    that joins against the training side's inverted 8-gram index — the
    same Σ df² cost model as n-gram dedup, with AQE handling hot
    boilerplate grams. Swap the equi-join for a bloom-filter prefilter
    when the test set outgrows broadcast range."""
    docs = _t(spark, sf_dir, "documents")
    from .operators.dedup import word_ngrams

    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("long") % 100
    )
    grams = (
        docs.select(
            "doc_id",
            bucket.alias("b"),
            F.explode(F.array_distinct(word_ngrams(F.col("text"), 8))).alias("g"),
        )
    )
    test_g = grams.filter(F.col("b") < 5).select("g").distinct()
    return (
        grams.filter(F.col("b") >= 5)
        .join(test_g, "g")
        .groupBy("doc_id")
        .agg(F.countDistinct("g").alias("shared_8grams"))
        .filter(F.col("shared_8grams") >= 3)
        .orderBy(F.col("shared_8grams").desc(), "doc_id")
    )


@register(
    "domain_mixture_weights",
    oracle="""
    WITH tok AS (
      SELECT source, SUM(len(string_split_regex(lower(trim(text)), '\\s+'))) AS n_tokens
      FROM documents WHERE trim(text) <> ''
      GROUP BY source
    ), tot AS (SELECT SUM(n_tokens) AS total FROM tok),
    w AS (
      SELECT source, n_tokens,
             ROUND(CAST(n_tokens AS DOUBLE) / (SELECT total FROM tot), 6) AS share,
             sqrt(CAST(n_tokens AS DOUBLE) / (SELECT total FROM tot)) AS raw_w
      FROM tok
    )
    SELECT source, n_tokens, share,
           ROUND(raw_w / (SELECT SUM(raw_w) FROM w), 6) AS mix_weight
    FROM w
    ORDER BY source
    """,
)
def domain_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-smoothed domain sampling weights (alpha = 0.5, i.e.
    sqrt-share renormalized — the static mixture baseline from
    multilingual/DoReMi-style training): upweights small sources,
    downweights dominant ones. Per-source token totals are one partial-
    aggregated shuffle; the two scalar denominators broadcast back, so
    corpus size never concentrates on the driver."""
    docs = _t(spark, sf_dir, "documents")
    tok = (
        docs.filter(F.trim(F.col("text")) != "")
        .groupBy("source")
        .agg(
            F.sum(F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+")))
            .alias("n_tokens")
        )
    )
    total = tok.agg(F.sum("n_tokens").alias("total"))
    w = tok.join(F.broadcast(total)).select(
        "source",
        "n_tokens",
        F.round(F.col("n_tokens").cast("double") / F.col("total"), 6).alias("share"),
        F.sqrt(F.col("n_tokens").cast("double") / F.col("total")).alias("raw_w"),
    )
    denom = w.agg(F.sum("raw_w").alias("denom"))
    return (
        w.join(F.broadcast(denom))
        .select(
            "source",
            "n_tokens",
            "share",
            F.round(F.col("raw_w") / F.col("denom"), 6).alias("mix_weight"),
        )
        .orderBy("source")
    )


@register("sequence_packing_stats")  # imperative per-partition op: rows-only check
def sequence_packing_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack-level summary of first-fit-decreasing sequence packing
    (operators/packing.py): per pack, total fill and document count.
    Pack assignment depends on partition boundaries (packs never span
    partitions by design), so there is no engine-independent oracle —
    the invariants (every doc packed once, no pack over budget,
    determinism) are pinned by TestSequencePacking instead."""
    from .operators.packing import pack_documents

    docs = _t(spark, sf_dir, "documents")
    packed = pack_documents(docs, budget=256)
    return (
        packed.groupBy("pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("fill"),
        )
        .orderBy(F.col("fill").desc(), "pack_id")
    )


@register(
    "ansi_safe_arithmetic",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n,
           ROUND(AVG(l_extendedprice / nullif(l_quantity - 1, 0)), 4)
             AS avg_unit_price_excl_first,
           SUM(CASE WHEN l_quantity - 1 = 0 THEN 1 ELSE 0 END) AS div_by_zero_rows,
           SUM(CASE WHEN TRY_CAST(l_returnflag AS INT) IS NULL THEN 1 ELSE 0 END)
             AS uncastable_flags
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def ansi_safe_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe arithmetic under ANSI semantics: try_divide yields NULL
    (not an exception, not Inf) on zero denominators and try_cast NULL on
    malformed input — the production posture for dirty data at scale,
    where one poisoned row must not kill a 1000-executor stage. NULLs
    then flow through AVG/COUNT with standard skip semantics, and the
    poisoned-row counts are surfaced alongside."""
    li = _t(spark, sf_dir, "lineitem")
    denom = F.col("l_quantity") - 1
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.avg(F.try_divide(F.col("l_extendedprice"), denom)), 4
            ).alias("avg_unit_price_excl_first"),
            F.sum(F.when(denom == 0, 1).otherwise(0)).alias("div_by_zero_rows"),
            F.sum(
                F.when(F.expr("try_cast(l_returnflag AS INT)").isNull(), 1).otherwise(0)
            ).alias("uncastable_flags"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "events_topk_per_window",
    oracle="""
    WITH w AS (
      SELECT time_bucket(INTERVAL 1 DAY, ts) AS day, event_type,
             COUNT(*) AS n,
             CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1, 2
    )
    SELECT day, event_type, n, sum_value, rk FROM (
      SELECT day, event_type, n, sum_value,
             row_number() OVER (PARTITION BY day ORDER BY n DESC, event_type) AS rk
      FROM w) t
    WHERE rk <= 2
    ORDER BY day, rk
    """,
)
def events_topk_per_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k dimension values per tumbling time window (the dashboard
    staple): a day-bucket aggregate followed by a ranking window over the
    already-reduced (day, type) table — the rank input is |days|x|types|,
    so the sort is negligible no matter how large the raw stream. The
    window-start day bucket matches DuckDB's time_bucket exactly."""
    ev = _t(spark, sf_dir, "events")
    agg = (
        ev.groupBy(
            F.window("ts", "1 day").start.alias("day"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 4)
            .cast("double")
            .alias("sum_value"),
        )
    )
    w = Window.partitionBy("day").orderBy(F.col("n").desc(), "event_type")
    return (
        agg.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 2)
        .orderBy("day", "rk")
    )


@register(
    "graph_weighted_path_counts",
    oracle="""
    WITH edges AS (
      SELECT cn.n_nationkey AS src, sn.n_nationkey AS dst, COUNT(*) AS w
      FROM lineitem
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation cn ON cn.n_nationkey = c_nationkey
      JOIN nation sn ON sn.n_nationkey = s_nationkey
      GROUP BY 1, 2
    ),
    v0 AS (SELECT 0 AS node, CAST(1 AS BIGINT) AS paths),
    v1 AS (SELECT dst AS node, SUM(paths * w) AS paths
           FROM v0 JOIN edges ON v0.node = edges.src GROUP BY dst),
    v2 AS (SELECT dst AS node, SUM(paths * w) AS paths
           FROM v1 JOIN edges ON v1.node = edges.src GROUP BY dst),
    v3 AS (SELECT dst AS node, SUM(paths * w) AS paths
           FROM v2 JOIN edges ON v2.node = edges.src GROUP BY dst)
    SELECT node, paths FROM v3 ORDER BY paths DESC, node
    """,
)
def graph_weighted_path_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative graph computation: trade-weighted path counts of length 3
    from NATION_0 over the customer-nation → supplier-nation graph (the
    join-aggregate iteration underlying PageRank / Katz centrality,
    kept in exact BIGINT so the result is order-independent). The edge
    list is built once (the only fact-scale work); each iteration joins
    the 25-row frontier vector against it — at real graph scale the
    frontier broadcasts and each step is one partial-aggregated shuffle
    of the edge partitions, state never returns to the driver."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    edges = (
        li.select("l_orderkey", "l_suppkey")
        .join(orders.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust.select("c_custkey", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp.select("s_suppkey", "s_nationkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(
            F.col("c_nationkey").cast("long").alias("src"),
            F.col("s_nationkey").cast("long").alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    v = spark.createDataFrame([(0, 1)], "node long, paths long")
    for _ in range(3):
        v = (
            F.broadcast(v)
            .join(edges, F.col("node") == F.col("src"))
            .groupBy(F.col("dst").alias("next_node"))
            .agg(F.sum(F.col("paths") * F.col("w")).alias("paths"))
            .select(F.col("next_node").alias("node"), "paths")
        )
    return v.orderBy(F.col("paths").desc(), "node")


@register(
    "null_safe_dim_lookup",
    oracle="""
    WITH dim(prio_key, label, rate) AS (
      VALUES ('1-URGENT', 'expedite', 0.02),
             ('2-HIGH',   'priority', 0.01),
             (NULL,       'standard', 0.0)
    ), keyed AS (
      SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN o_orderpriority END AS prio_key,
             o_totalprice
      FROM orders
    )
    SELECT label,
           COUNT(*) AS n_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS revenue
    FROM keyed JOIN dim ON keyed.prio_key IS NOT DISTINCT FROM dim.prio_key
    GROUP BY label
    ORDER BY label
    """,
)
def null_safe_dim_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe dimension lookup: un-mapped priorities carry a NULL key
    that must still match the dimension's NULL 'default' row — the <=>
    (eqNullSafe) join, vs a plain equi-join silently dropping them. The
    three-row dimension broadcasts; null-safe equality keeps the join a
    hash join (it is still an equality predicate to Catalyst)."""
    orders = _t(spark, sf_dir, "orders")
    dim = spark.createDataFrame(
        [("1-URGENT", "expedite", 0.02), ("2-HIGH", "priority", 0.01),
         (None, "standard", 0.0)],
        "prio_key string, label string, rate double",
    )
    keyed = orders.select(
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
            F.col("o_orderpriority"),
        ).alias("prio_key"),
        "o_totalprice",
    )
    return (
        keyed.join(F.broadcast(dim),
                   keyed.prio_key.eqNullSafe(dim.prio_key))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum(F.col("o_totalprice").cast(_DEC)), 2)
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("label")
    )


@register(
    "revenue_concentration_pareto",
    oracle="""
    WITH rev AS (
      SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS r
      FROM orders GROUP BY 1
    ), c AS (
      SELECT r,
             SUM(r) OVER (ORDER BY r DESC, o_custkey ROWS UNBOUNDED PRECEDING)
               AS cum,
             ROW_NUMBER() OVER (ORDER BY r DESC, o_custkey) AS rn
      FROM rev
    ), t AS (SELECT SUM(r) AS total, COUNT(*) AS n FROM rev)
    SELECT CAST(th.threshold AS DOUBLE) AS threshold, MIN(c.rn) AS n_customers,
           ROUND(CAST(MIN(c.rn) AS DOUBLE) / (SELECT n FROM t) * 100, 4)
             AS pct_customers
    FROM (VALUES (0.50), (0.80), (0.95)) th(threshold)
    JOIN c ON c.cum >= (SELECT total FROM t) * th.threshold
    GROUP BY th.threshold
    ORDER BY th.threshold
    """,
)
def revenue_concentration_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration (Pareto): the smallest customer count whose
    cumulative revenue reaches 50/80/95% of the total. The fact collapses
    to one row per customer first, so the global cumulative window
    orders |customers| rows, not raw orders; the cumulative sum stays in
    DECIMAL so the threshold crossings are exact. The threshold table
    (3 rows) broadcast-joins against the cumulative curve."""
    orders = _t(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast(_DEC)).alias("r")
    )
    w = Window.orderBy(F.col("r").desc(), "o_custkey")
    c = rev.select(
        "r",
        F.sum("r").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        F.row_number().over(w).alias("rn"),
    )
    t = rev.agg(F.sum("r").alias("total"), F.count(F.lit(1)).alias("n"))
    from decimal import Decimal

    th = spark.createDataFrame(
        [(Decimal("0.50"),), (Decimal("0.80"),), (Decimal("0.95"),)],
        "threshold decimal(3,2)",
    )
    return (
        c.join(F.broadcast(t))
        .join(
            F.broadcast(th),
            # both sides DECIMAL: the crossing comparison is exact, like
            # the oracle's DECIMAL literal arithmetic
            F.col("cum") >= F.col("total") * F.col("threshold"),
        )
        .groupBy("threshold", "n")
        .agg(F.min("rn").alias("n_customers"))
        .select(
            F.col("threshold").cast("double").alias("threshold"),
            "n_customers",
            F.round(F.col("n_customers").cast("double") / F.col("n") * 100, 4)
            .alias("pct_customers"),
        )
        .orderBy("threshold")
    )


@register(
    "rollup_with_grouping_ids",
    oracle="""
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           GROUPING(o_orderstatus) + 2 * GROUPING(o_orderpriority) AS gid,
           COUNT(*) AS n_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS revenue
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY gid, status, priority
    """,
)
def rollup_with_grouping_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with GROUPING() indicator columns: the indicators
    disambiguate 'real NULL value' from 'subtotal row' — required for any
    consumer of hierarchical aggregates. One shuffle: Spark expands the
    rollup map-side and partially aggregates every grouping level before
    the exchange."""
    orders = _t(spark, sf_dir, "orders")
    gid = (
        F.grouping("o_orderstatus") + F.lit(2) * F.grouping("o_orderpriority")
    ).cast("int")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            gid.alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum(F.col("o_totalprice").cast(_DEC)), 2)
            .cast("double")
            .alias("revenue"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "gid",
            "n_orders",
            "revenue",
        )
        .orderBy("gid", "status", "priority")
    )


# ---------------------------------------------------------------------------
# Round 3: relational breadth + training-data pipeline additions
# ---------------------------------------------------------------------------


@register(
    "recursive_cte_supplier_chain",
    oracle="""
    WITH RECURSIVE chain(suppkey, root, depth) AS (
        SELECT s_suppkey, s_suppkey, 0 FROM supplier WHERE s_suppkey < 4
        UNION ALL
        SELECT s.s_suppkey, c.root, c.depth + 1
        FROM supplier s JOIN chain c ON CAST(FLOOR(s.s_suppkey / 2) AS BIGINT) = c.suppkey
        WHERE s.s_suppkey >= 4
    )
    SELECT root, depth, COUNT(*) AS n_nodes, MIN(suppkey) AS min_key,
           MAX(suppkey) AS max_key
    FROM chain GROUP BY root, depth ORDER BY root, depth
    """,
)
def recursive_cte_supplier_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 WITH RECURSIVE): transitive closure over an
    implicit binary-tree hierarchy (parent = suppkey/2). The reference has
    no hierarchy operator at all (SURVEY §2.8); this exercises Spark's
    iterative plan expansion — each recursion step is a self-join the
    optimizer plans independently, so depth scales without a driver loop."""
    _t(spark, sf_dir, "supplier").createOrReplaceTempView("supplier_rc")
    return spark.sql(
        """
        WITH RECURSIVE chain(suppkey, root, depth) AS (
            SELECT s_suppkey, s_suppkey, 0 FROM supplier_rc WHERE s_suppkey < 4
            UNION ALL
            SELECT s.s_suppkey, c.root, c.depth + 1
            FROM supplier_rc s JOIN chain c ON CAST(FLOOR(s.s_suppkey / 2) AS BIGINT) = c.suppkey
            WHERE s.s_suppkey >= 4
        )
        SELECT root, depth, COUNT(*) AS n_nodes, MIN(suppkey) AS min_key,
               MAX(suppkey) AS max_key
        FROM chain GROUP BY root, depth ORDER BY root, depth
        """
    )


@register(
    "bitwise_agg_line_flags",
    oracle="""
    WITH per_order AS (
        SELECT l_orderkey,
               BIT_OR(CASE WHEN l_linenumber <= 62 THEN CAST(POW(2, l_linenumber) AS BIGINT) ELSE 0 END) AS line_mask,
               BIT_AND(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS all_n,
               BIT_XOR(l_linenumber) AS parity
        FROM lineitem GROUP BY l_orderkey
    )
    SELECT line_mask, all_n, COUNT(*) AS n_orders,
           SUM(parity) AS parity_sum
    FROM per_order GROUP BY line_mask, all_n ORDER BY line_mask, all_n
    """,
)
def bitwise_agg_line_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregates (bit_or/bit_and/bit_xor): per-order line-number
    bitmask + all-returnflag-N indicator, then a distribution over masks.
    Bitmask aggregation is the classic compact-set encoding for feature
    flags at scale — associative, so map-side partial agg applies and the
    shuffle carries one long per order."""
    li = _t(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.bit_or(
            F.when(F.col("l_linenumber") <= 62, F.pow(F.lit(2), F.col("l_linenumber")).cast("bigint")).otherwise(F.lit(0))
        ).alias("line_mask"),
        F.bit_and(F.when(F.col("l_returnflag") == "N", 1).otherwise(0)).alias("all_n"),
        F.bit_xor("l_linenumber").alias("parity"),
    )
    return (
        per_order.groupBy("line_mask", "all_n")
        .agg(F.count(F.lit(1)).alias("n_orders"), F.sum("parity").alias("parity_sum"))
        .orderBy("line_mask", "all_n")
    )


@register(
    "global_shuffle_deterministic",
    oracle="""
    WITH shuffled AS (
        SELECT doc_id, n_chars,
               ROW_NUMBER() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR) || ':42'), doc_id) - 1 AS pos
        FROM documents
    )
    SELECT CAST(pos % 8 AS INT) AS shard,
           COUNT(*) AS n_docs, SUM(n_chars) AS total_chars,
           MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
    FROM shuffled GROUP BY shard ORDER BY shard
    """,
)
def global_shuffle_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle for training-data ordering: every doc
    gets a reproducible pseudo-random position (md5 of id + seed), then
    round-robin sharding. At 100 TB the md5 sort is a single range-
    partitioned sort (Spark samples boundaries); no driver-side state, and
    re-running with the same seed reproduces the exact epoch order —
    the property training pipelines need for resumable data loading."""
    docs = _t(spark, sf_dir, "documents")
    w = Window.orderBy(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":42"))), "doc_id")
    shuffled = docs.select(
        "doc_id", "n_chars", (F.row_number().over(w) - 1).alias("pos")
    )
    return (
        shuffled.groupBy((F.col("pos") % 8).cast("int").alias("shard"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("shard")
    )


@register(
    "curriculum_quality_bins",
    oracle="""
    WITH scored AS (
        SELECT doc_id, n_chars,
               LEN(string_split(text, ' ')) AS wc
        FROM documents WHERE text IS NOT NULL AND text <> ''
    ),
    binned AS (
        SELECT doc_id, n_chars, wc,
               NTILE(4) OVER (ORDER BY wc, doc_id) AS stage
        FROM scored
    )
    SELECT stage, COUNT(*) AS n_docs,
           MIN(wc) AS min_wc, MAX(wc) AS max_wc,
           SUM(n_chars) AS total_chars
    FROM binned GROUP BY stage ORDER BY stage
    """,
)
def curriculum_quality_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum binning: order documents by a difficulty proxy (word
    count) and split into 4 curriculum stages with NTILE. Training
    pipelines feed stages in order (easy→hard). The global NTILE is one
    range-partitioned sort; per-stage stats are a cheap reshuffle on the
    4-value stage key (AQE coalesces)."""
    docs = _t(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & (F.col("text") != "")
    )
    scored = docs.select(
        "doc_id", "n_chars", F.size(F.split(F.col("text"), " ")).alias("wc")
    )
    binned = scored.withColumn(
        "stage", F.ntile(4).over(Window.orderBy("wc", "doc_id"))
    )
    return (
        binned.groupBy("stage")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("wc").alias("min_wc"),
            F.max("wc").alias("max_wc"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("stage")
    )


@register(
    "token_length_histogram",
    oracle="""
    WITH wc AS (
        SELECT doc_id, LEN(string_split(text, ' ')) AS n_tokens
        FROM documents WHERE text IS NOT NULL AND text <> ''
    )
    SELECT CAST(FLOOR(LOG2(n_tokens)) AS INT) AS log2_bin,
           COUNT(*) AS n_docs,
           MIN(n_tokens) AS min_tokens, MAX(n_tokens) AS max_tokens
    FROM wc WHERE n_tokens > 0
    GROUP BY log2_bin ORDER BY log2_bin
    """,
)
def token_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-length histogram in log2 bins — the standard first look at a
    pretraining corpus (sequence-length budget planning). Entirely map-side
    until the tiny per-bin aggregate."""
    docs = _t(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & (F.col("text") != "")
    )
    wc = docs.select(
        "doc_id", F.size(F.split(F.col("text"), " ")).alias("n_tokens")
    ).filter(F.col("n_tokens") > 0)
    return (
        wc.groupBy(F.floor(F.log2("n_tokens")).cast("int").alias("log2_bin"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
        )
        .orderBy("log2_bin")
    )


@register(
    "filter_funnel_stats",
    oracle="""
    WITH staged AS (
        SELECT doc_id,
               (text IS NOT NULL AND text <> '') AS s1_nonempty,
               (text IS NOT NULL AND text <> '' AND LEN(string_split(text, ' ')) >= 20) AS s2_minlen,
               (text IS NOT NULL AND text <> '' AND LEN(string_split(text, ' ')) >= 20
                AND n_chars <= 10000) AS s3_maxchars,
               (text IS NOT NULL AND text <> '' AND LEN(string_split(text, ' ')) >= 20
                AND n_chars <= 10000
                AND CAST(n_chars AS DOUBLE) / LEN(string_split(text, ' ')) < 12.0) AS s4_avgwordlen
        FROM documents
    )
    SELECT COUNT(*) AS total,
           SUM(CASE WHEN s1_nonempty THEN 1 ELSE 0 END) AS pass_nonempty,
           SUM(CASE WHEN s2_minlen THEN 1 ELSE 0 END) AS pass_minlen,
           SUM(CASE WHEN s3_maxchars THEN 1 ELSE 0 END) AS pass_maxchars,
           SUM(CASE WHEN s4_avgwordlen THEN 1 ELSE 0 END) AS pass_avgwordlen,
           ROUND(SUM(CASE WHEN s4_avgwordlen THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6) AS final_pass_rate
    FROM staged
    """,
)
def filter_funnel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-funnel observability: how many documents survive each
    successive quality gate (nonempty → min length → max chars → avg word
    length). One pass, conditional aggregates — no per-stage rescans, which
    is the difference between 1× and 4× the 100 TB scan cost."""
    docs = _t(spark, sf_dir, "documents")
    wc = F.size(F.split(F.col("text"), " "))
    s1 = F.col("text").isNotNull() & (F.col("text") != "")
    s2 = s1 & (wc >= 20)
    s3 = s2 & (F.col("n_chars") <= 10000)
    s4 = s3 & ((F.col("n_chars").cast("double") / wc) < 12.0)
    cnt = lambda c: F.sum(F.when(c, 1).otherwise(0))  # noqa: E731
    return docs.agg(
        F.count(F.lit(1)).alias("total"),
        cnt(s1).alias("pass_nonempty"),
        cnt(s2).alias("pass_minlen"),
        cnt(s3).alias("pass_maxchars"),
        cnt(s4).alias("pass_avgwordlen"),
        F.round(cnt(s4) * F.lit(1.0) / F.count(F.lit(1)), 6).alias("final_pass_rate"),
    )


@register(
    "pretokenize_top_tokens",
    oracle="""
    WITH toks AS (
        SELECT UNNEST(regexp_extract_all(LOWER(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS tok
        FROM documents WHERE text IS NOT NULL
    )
    SELECT tok, COUNT(*) AS n
    FROM toks GROUP BY tok
    ORDER BY n DESC, tok LIMIT 20
    """,
)
def pretokenize_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-style pre-tokenization (runs of letters / digits / single
    punctuation) + global token frequency top-20 — the first step of
    tokenizer training. explode + groupBy with map-side partial agg; at
    100 TB the token vocabulary is tiny relative to the corpus so the
    shuffle is the distinct-token set, not the corpus."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = docs.select(
        F.explode(
            F.expr(r"regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)")
        ).alias("tok")
    )
    return (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "tok")
        .limit(20)
    )


@register(
    "events_anomaly_zscore",
    oracle="""
    WITH stats AS (
        SELECT event_type,
               AVG(value) AS mu,
               STDDEV_SAMP(value) AS sigma,
               COUNT(*) AS n
        FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           MAX(s.n) AS n_events,
           SUM(CASE WHEN ABS((e.value - s.mu) / s.sigma) > 2.0 THEN 1 ELSE 0 END) AS n_outliers,
           ROUND(MAX(ABS((e.value - s.mu) / s.sigma)), 4) AS max_abs_z
    FROM events e JOIN stats s ON e.event_type = s.event_type
    GROUP BY e.event_type ORDER BY e.event_type
    """,
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score anomaly counts per event type: two-pass (stats then score)
    expressed as an aggregate + broadcast-join back — the per-group stats
    table is tiny, so the second pass is shuffle-free. Rounding the max |z|
    keeps the hash stable across summation orders."""
    ev = _t(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"),
        F.stddev_samp("value").alias("sigma"),
        F.count(F.lit(1)).alias("n"),
    )
    z = F.abs((F.col("e.value") - F.col("s.mu")) / F.col("s.sigma"))
    return (
        ev.alias("e")
        .join(F.broadcast(stats.alias("s")), F.col("e.event_type") == F.col("s.event_type"))
        .groupBy(F.col("e.event_type").alias("event_type"))
        .agg(
            F.max("s.n").alias("n_events"),
            F.sum(F.when(z > 2.0, 1).otherwise(0)).alias("n_outliers"),
            F.round(F.max(z), 4).alias("max_abs_z"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Portable-hash dedup twins: the MinHash-LSH / SimHash / winnowing pipelines
# re-run with the md5-derived 60-bit hash (operators/dedup.py::hash64) so the
# ENTIRE pipeline — shingling, signature, banding, candidate join, verify —
# is reproducible in ANSI SQL and gets a full DuckDB value-hash oracle
# instead of a rows-only check. xxhash64 remains the production fast path;
# these twins pin the algorithm, the fast path pins the plan.
# ---------------------------------------------------------------------------

_MD5H = "CAST(concat('0x', substring(md5({col}), 1, 15)) AS BIGINT)"
_WORDS_SQL = (
    "string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')"
)


def _minhash_oracle_ctes(num_hashes: int = 64, bands: int = 16) -> str:
    """Shared CTE prefix for the md5-portable MinHash oracles: shingling,
    per-shingle hash, 64 XOR-permutation min signature columns, band
    bucketing, and distinct LSH candidate pairs."""
    rows = num_hashes // bands
    masks = dedup_mod._xor_params(num_hashes)
    mins = ",\n             ".join(
        f"MIN(xor(h, CAST({m} AS BIGINT))) AS m{i}" for i, m in enumerate(masks)
    )
    buckets = ",\n                     ".join(
        "concat_ws(',', " + ", ".join(f"m{b * rows + r}" for r in range(rows)) + ")"
        for b in range(bands)
    )
    return f"""docs_sh AS (
      SELECT doc_id,
             list_distinct([list_aggregate(words[i:i+2], 'string_agg', ' ')
                            FOR i IN range(1, len(words) - 1)]) AS sh
      FROM (SELECT doc_id, {_WORDS_SQL} AS words FROM documents)
      WHERE len(words) >= 3),
    hashes AS (
      SELECT doc_id, {_MD5H.format(col="s")} AS h
      FROM (SELECT doc_id, unnest(sh) AS s FROM docs_sh)),
    sig AS (
      SELECT doc_id,
             {mins}
      FROM hashes GROUP BY doc_id),
    banded AS (
      SELECT doc_id, unnest(range(0, {bands})) AS band,
             unnest([{buckets}]) AS bucket
      FROM sig),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id)"""


_JACCARD_SQL = (
    "ROUND(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /"
    " (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))), 6)"
)


def _minhash_portable_oracle(
    num_hashes: int = 64, bands: int = 16, threshold: float = 0.2
) -> str:
    return f"""
    WITH {_minhash_oracle_ctes(num_hashes, bands)},
    scored AS (
      SELECT c.id_a, c.id_b,
             {_JACCARD_SQL} AS jaccard
      FROM cand c
      JOIN docs_sh sa ON sa.doc_id = c.id_a
      JOIN docs_sh sb ON sb.doc_id = c.id_b)
    SELECT id_a, id_b, jaccard FROM scored
    WHERE jaccard >= {threshold}
    ORDER BY id_a, id_b
    """


@register("dedup_minhash_lsh_pairs", oracle=_minhash_portable_oracle())
@register("dedup_minhash_lsh_pairs_portable", oracle=_minhash_portable_oracle())
def dedup_minhash_portable_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs with the md5-portable hash — every stage
    (shingle hash, 64 XOR-permutation mins, 16-band bucketing, candidate
    self-join, exact-Jaccard verify) value-checked against DuckDB."""
    docs = _t(spark, sf_dir, "documents")
    return dedup_mod.minhash_lsh_pairs(
        docs, "doc_id", "text", n=3, num_hashes=64, bands=16, threshold=0.2,
        hash_fn="md5",
    ).orderBy("id_a", "id_b")


def _simhash_portable_oracle(max_hamming: int = 3, bands: int = 4) -> str:
    # md5-derived hashes are 60-bit, so signature bits 60..63 are always 0
    # (votes are all -1) — only bits 0..59 are generated here.
    votes = ",\n             ".join(
        f"SUM(CASE WHEN ((h >> {b}) & 1) = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(60)
    )
    sig = " +\n                 ".join(
        f"(CASE WHEN v{b} > 0 THEN CAST({2 ** b} AS BIGINT) ELSE 0 END)"
        for b in range(60)
    )
    chunk_bits = 64 // bands
    cvs = ", ".join(
        f"((simhash >> {i * chunk_bits}) & {(1 << chunk_bits) - 1})"
        for i in range(bands)
    )
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest({_WORDS_SQL}) AS tok FROM documents),
    hashed AS (
      SELECT doc_id, {_MD5H.format(col="tok")} AS h FROM toks),
    votes AS (
      SELECT doc_id,
             {votes}
      FROM hashed GROUP BY doc_id),
    sig AS (
      SELECT doc_id,
             {sig} AS simhash
      FROM votes),
    chunked AS (
      SELECT doc_id, simhash, unnest(range(0, {bands})) AS ci,
             unnest([{cvs}]) AS cv
      FROM sig),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
             a.simhash AS sig_a, b.simhash AS sig_b
      FROM chunked a JOIN chunked b
        ON a.ci = b.ci AND a.cv = b.cv AND a.doc_id < b.doc_id)
    SELECT id_a, id_b, CAST(bit_count(xor(sig_a, sig_b)) AS INT) AS hamming
    FROM cand
    WHERE bit_count(xor(sig_a, sig_b)) <= {max_hamming}
    ORDER BY id_a, id_b
    """


@register("dedup_simhash_pairs", oracle=_simhash_portable_oracle())
@register("dedup_simhash_pairs_portable", oracle=_simhash_portable_oracle())
def dedup_simhash_portable_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs with the md5-portable hash — per-token bit
    votes, 60-bit signature, 4-band pigeonhole blocking, and Hamming
    verification all value-checked against DuckDB."""
    docs = _t(spark, sf_dir, "documents")
    return dedup_mod.simhash_pairs(
        docs, "doc_id", "text", max_hamming=3, hash_fn="md5"
    ).orderBy("id_a", "id_b")


def _winnow_portable_oracle(k: int = 5, window: int = 4) -> str:
    return f"""
    WITH words AS (
      SELECT doc_id, {_WORDS_SQL} AS ws FROM documents),
    sh AS (
      SELECT doc_id,
             unnest(range(0, greatest(len(ws) - {k - 1}, 0))) AS pos,
             unnest([list_aggregate(ws[i+1:i+{k}], 'string_agg', ' ')
                     FOR i IN range(0, greatest(len(ws) - {k - 1}, 0))]) AS shingle
      FROM words),
    hashed AS (
      SELECT doc_id, pos, {_MD5H.format(col="shingle")} AS h FROM sh)
    SELECT DISTINCT doc_id,
           min(h) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN CURRENT ROW AND {window - 1} FOLLOWING)
             AS fingerprint
    FROM hashed
    ORDER BY doc_id, fingerprint
    """


@register("winnowing_fingerprints", oracle=_winnow_portable_oracle())
@register("winnowing_fingerprints_portable", oracle=_winnow_portable_oracle())
def winnowing_portable_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (MOSS) fingerprints with the md5-portable hash — k-gram
    rolling selection value-checked against a DuckDB window-min. The
    xxhash64-valued scale path stays available as
    ``winnowing_fingerprints_xxhash`` (rows-only: hash values are
    JVM-specific, semantics pinned in tests/test_operators.py)."""
    docs = _t(spark, sf_dir, "documents")
    return dedup_mod.winnow_fingerprints(
        docs, "doc_id", "text", hash_fn="md5"
    ).orderBy("doc_id", "fingerprint")


def _minhash_estimate_oracle(num_hashes: int = 64, bands: int = 16) -> str:
    matches = " + ".join(
        f"(CASE WHEN sa.m{i} = sb.m{i} THEN 1 ELSE 0 END)"
        for i in range(num_hashes)
    )
    return f"""
    WITH {_minhash_oracle_ctes(num_hashes, bands)},
    est AS (
      SELECT c.id_a, c.id_b,
             ROUND(CAST({matches} AS DOUBLE) /
                   CAST({num_hashes} AS DOUBLE), 6) AS est_jaccard
      FROM cand c
      JOIN sig sa ON sa.doc_id = c.id_a
      JOIN sig sb ON sb.doc_id = c.id_b),
    scored AS (
      SELECT e.id_a, e.id_b, e.est_jaccard,
             {_JACCARD_SQL} AS jaccard
      FROM est e
      JOIN docs_sh sa ON sa.doc_id = e.id_a
      JOIN docs_sh sb ON sb.doc_id = e.id_b)
    SELECT id_a, id_b, est_jaccard, jaccard,
           ROUND(ABS(est_jaccard - jaccard), 6) AS abs_err
    FROM scored
    ORDER BY id_a, id_b
    """


@register("dedup_minhash_estimate_pairs", oracle=_minhash_estimate_oracle())
def dedup_minhash_estimate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch calibration: signature-agreement Jaccard estimate vs exact
    Jaccard (+ absolute error) for every LSH candidate pair, md5-portable
    so the whole comparison is value-checked against DuckDB. This is the
    query you run on a sample to pick num_hashes/bands before a 100 TB
    dedup pass."""
    docs = _t(spark, sf_dir, "documents")
    return dedup_mod.minhash_estimate_pairs(
        docs, "doc_id", "text", n=3, num_hashes=64, bands=16, hash_fn="md5"
    ).orderBy("id_a", "id_b")


def _winnow_overlap_oracle(
    k: int = 5, window: int = 4, min_shared: int = 2
) -> str:
    return f"""
    WITH words AS (
      SELECT doc_id, {_WORDS_SQL} AS ws FROM documents),
    sh AS (
      SELECT doc_id,
             unnest(range(0, greatest(len(ws) - {k - 1}, 0))) AS pos,
             unnest([list_aggregate(ws[i+1:i+{k}], 'string_agg', ' ')
                     FOR i IN range(0, greatest(len(ws) - {k - 1}, 0))]) AS shingle
      FROM words),
    hashed AS (
      SELECT doc_id, pos, {_MD5H.format(col="shingle")} AS h FROM sh),
    fps AS (
      SELECT DISTINCT doc_id, fingerprint FROM (
        SELECT doc_id,
               min(h) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN CURRENT ROW AND {window - 1} FOLLOWING)
                 AS fingerprint
        FROM hashed)),
    counts AS (
      SELECT doc_id, COUNT(*) AS n FROM fps GROUP BY doc_id),
    shared AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared_fps
      FROM fps a JOIN fps b
        ON a.fingerprint = b.fingerprint AND a.doc_id < b.doc_id
      GROUP BY 1, 2
      HAVING COUNT(*) >= {min_shared})
    SELECT s.id_a, s.id_b, s.shared_fps,
           ROUND(CAST(s.shared_fps AS DOUBLE) /
                 CAST(least(ca.n, cb.n) AS DOUBLE), 6) AS overlap
    FROM shared s
    JOIN counts ca ON ca.doc_id = s.id_a
    JOIN counts cb ON cb.doc_id = s.id_b
    ORDER BY id_a, id_b
    """


@register("winnow_overlap_pairs", oracle=_winnow_overlap_oracle())
def winnow_overlap_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS-style document-pair overlap via shared winnowing fingerprints
    (overlap coefficient), md5-portable and fully value-checked."""
    docs = _t(spark, sf_dir, "documents")
    return dedup_mod.winnow_overlap_pairs(
        docs, "doc_id", "text", min_shared=2, hash_fn="md5"
    ).orderBy("id_a", "id_b")


@register(
    "bigram_lm_score",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w,
             unnest(range(1, len(string_split_regex(lower(trim(text)), '\\s+')) + 1)) AS pos
      FROM documents WHERE trim(text) <> ''),
    big AS (
      SELECT doc_id, w, w2 FROM (
        SELECT doc_id, w, pos,
               lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
        FROM tok)
      WHERE w2 IS NOT NULL),
    c12 AS (SELECT w, w2, COUNT(*) AS c12 FROM big GROUP BY 1, 2),
    c1 AS (SELECT w, COUNT(*) AS c1 FROM tok GROUP BY 1),
    v AS (SELECT COUNT(DISTINCT w) AS v FROM tok),
    scored AS (
      SELECT b.doc_id,
             -ln((CAST(c12.c12 AS DOUBLE) + CAST(0.5 AS DOUBLE)) /
                 (CAST(c1.c1 AS DOUBLE) +
                  CAST(0.5 AS DOUBLE) * CAST((SELECT v FROM v) AS DOUBLE))) AS nll
      FROM big b
      JOIN c12 ON b.w = c12.w AND b.w2 = c12.w2
      JOIN c1 ON b.w = c1.w)
    SELECT doc_id, ROUND(AVG(nll), 6) AS mean_nll, COUNT(*) AS n_bigrams
    FROM scored GROUP BY doc_id
    ORDER BY mean_nll DESC, doc_id
    LIMIT 25
    """,
)
def bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Add-k-smoothed bigram LM quality scoring: train bigram/context
    counts over the corpus (two hash aggregates), then score each doc by
    mean negative log P(w2|w1) with k=0.5 — the next step up from the
    unigram filter, catching locally-incoherent text the unigram model
    scores as fluent. Count tables broadcast into the scoring join
    (bounded vocab); the per-doc window for bigram formation partitions
    by doc_id so state stays bounded at any corpus size."""
    docs = _t(spark, sf_dir, "documents")
    tok = docs.filter(F.trim(F.col("text")) != "").select(
        "doc_id",
        F.posexplode(
            F.split(F.lower(F.trim(F.col("text"))), r"\s+")
        ).alias("pos", "w"),
    )
    w_ = Window.partitionBy("doc_id").orderBy("pos")
    big = tok.withColumn("w2", F.lead("w").over(w_)).filter(
        F.col("w2").isNotNull()
    )
    c12 = big.groupBy("w", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c1"))
    vsize = tok.select("w").distinct().agg(F.count(F.lit(1)).alias("v"))
    nll = -F.log(
        (F.col("c12").cast("double") + F.lit(0.5))
        / (F.col("c1").cast("double") + F.lit(0.5) * F.col("v").cast("double"))
    )
    return (
        big.join(c12, ["w", "w2"])
        .join(F.broadcast(c1), "w")
        .join(F.broadcast(vsize))
        .withColumn("nll", nll)
        .groupBy("doc_id")
        .agg(
            F.round(F.avg("nll"), 6).alias("mean_nll"),
            F.count(F.lit(1)).alias("n_bigrams"),
        )
        .orderBy(F.col("mean_nll").desc(), "doc_id")
        .limit(25)
    )


@register(
    "bpe_merge_candidates",
    oracle="""
    WITH tok AS (
      SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
      FROM documents),
    pairs AS (
      SELECT unnest([substring(w, i, 2) FOR i IN range(1, len(w))]) AS pair
      FROM tok WHERE len(w) >= 2)
    SELECT pair, COUNT(*) AS n
    FROM pairs GROUP BY pair
    ORDER BY n DESC, pair
    LIMIT 20
    """,
)
def bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First BPE merge-scoring round: corpus-wide adjacent character-pair
    frequencies inside words, top 20 — the aggregate a tokenizer-training
    pipeline computes once per merge. One explode + one hash aggregate
    with map-side partial aggregation; the pair key space is bounded
    (alphabet²), so the shuffle is tiny no matter the corpus size."""
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("w")
    ).filter(F.length("w") >= 2)
    pairs = tok.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "pair")
        .limit(20)
    )


@register(
    "events_rolling_corr_click_purchase",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS clicks,
             SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS purchases
      FROM events WHERE event_type IN ('click', 'purchase')
      GROUP BY 1),
    roll AS (
      SELECT day, clicks, purchases,
             COUNT(*) OVER w AS n,
             SUM(clicks) OVER w AS sx, SUM(purchases) OVER w AS sy,
             SUM(clicks * purchases) OVER w AS sxy,
             SUM(clicks * clicks) OVER w AS sxx,
             SUM(purchases * purchases) OVER w AS syy
      FROM daily
      WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
    SELECT day, clicks, purchases,
           CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
                THEN ROUND(CAST(n * sxy - sx * sy AS DOUBLE) /
                           sqrt(CAST(n * sxx - sx * sx AS DOUBLE) *
                                CAST(n * syy - sy * sy AS DOUBLE)), 6)
           END AS corr7
    FROM roll ORDER BY day
    """,
)
def events_rolling_corr_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day Pearson correlation between daily click and purchase
    volumes, computed from exact integer moment sums (n, Σx, Σy, Σxy,
    Σx², Σy²) with one final double division — bit-stable across
    partitionings, unlike a floating corr() fold. The single global
    window is fine at daily grain (one row per day); a per-entity variant
    would add partitionBy and keep state bounded."""
    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias(
                "clicks"
            ),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("purchases"),
        )
    )
    w = Window.orderBy("day").rowsBetween(-6, 0)
    n = F.count(F.lit(1)).over(w)
    sx = F.sum("clicks").over(w)
    sy = F.sum("purchases").over(w)
    sxy = F.sum(F.col("clicks") * F.col("purchases")).over(w)
    sxx = F.sum(F.col("clicks") * F.col("clicks")).over(w)
    syy = F.sum(F.col("purchases") * F.col("purchases")).over(w)
    varx = n * sxx - sx * sx
    vary = n * syy - sy * sy
    corr = F.when(
        (varx > 0) & (vary > 0),
        F.round(
            (n * sxy - sx * sy).cast("double")
            / F.sqrt(varx.cast("double") * vary.cast("double")),
            6,
        ),
    )
    return daily.select(
        "day", "clicks", "purchases", corr.alias("corr7")
    ).orderBy("day")


@register(
    "dedup_jaccard_prefix_filter",
    oracle="""
    WITH sh AS (
      SELECT doc_id,
             list_distinct([list_aggregate(words[i:i+2], 'string_agg', ' ')
                            FOR i IN range(1, len(words) - 1)]) AS sh
      FROM (SELECT doc_id,
                   string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS words
            FROM documents)
      WHERE len(words) >= 3),
    scored AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
                   (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))),
                   6) AS jaccard
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
    SELECT id_a, id_b, jaccard FROM scored
    WHERE jaccard >= 0.2
    ORDER BY id_a, id_b
    """,
)
def dedup_jaccard_prefix_filter_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PPJoin-style prefix-filtered exact Jaccard join. The oracle is the
    EXHAUSTIVE all-pairs computation, so this check proves the prefix
    filter loses no qualifying pair — the property that makes it safe to
    deploy at 100 TB where the exhaustive join is impossible."""
    docs = _t(spark, sf_dir, "documents")
    return dedup_mod.jaccard_prefix_filter_pairs(
        docs, "doc_id", "text", n=3, threshold=0.2
    ).orderBy("id_a", "id_b")


@register(
    "tfidf_cosine_pairs",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             unnest([list_aggregate(ws[i:i+2], 'string_agg', ' ')
                     FOR i IN range(1, len(ws) - 1)]) AS t
      FROM (SELECT doc_id,
                   string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS ws
            FROM documents WHERE trim(text) <> '')
      WHERE len(ws) >= 3),
    tf AS (SELECT doc_id, t, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
    dfreq AS (SELECT t, COUNT(*) AS df FROM tf GROUP BY 1),
    nd AS (SELECT COUNT(*) AS n FROM documents WHERE trim(text) <> ''),
    weights AS (
      SELECT tf.doc_id, tf.t,
             CAST(ROUND(CAST(tf.tf AS DOUBLE) *
                        ROUND(ln(CAST((SELECT n FROM nd) AS DOUBLE) /
                                 CAST(dfreq.df AS DOUBLE)), 6),
                        6) AS DECIMAL(18,6)) AS w
      FROM tf JOIN dfreq ON tf.t = dfreq.t
      WHERE CAST(dfreq.df AS DOUBLE) <=
            CAST(0.5 AS DOUBLE) * CAST((SELECT n FROM nd) AS DOUBLE)),
    norms AS (SELECT doc_id, SUM(w * w) AS norm_sq FROM weights GROUP BY 1),
    dots AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, SUM(a.w * b.w) AS dot
      FROM weights a JOIN weights b ON a.t = b.t AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    scored AS (
      SELECT d.id_a, d.id_b,
             ROUND(CAST(d.dot AS DOUBLE) /
                   sqrt(CAST(na.norm_sq AS DOUBLE) *
                        CAST(nb.norm_sq AS DOUBLE)), 6) AS cosine
      FROM dots d
      JOIN norms na ON na.doc_id = d.id_a
      JOIN norms nb ON nb.doc_id = d.id_b)
    SELECT id_a, id_b, cosine FROM scored
    WHERE cosine >= CAST(0.85 AS DOUBLE)
    ORDER BY id_a, id_b
    """,
)
def tfidf_cosine_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse TF-IDF cosine pair join with exact-decimal dot products —
    the sum order can't perturb the hash, so the whole IR-style
    similarity pipeline is value-checked against DuckDB. Terms are word
    3-grams (phrase overlap): the synthetic corpus has a ~31-word base
    vocabulary, so unigram dfs approach N and the inverted-index join
    degenerates to all-pairs; 3-gram dfs stay small (max 25 at sf0.1)."""
    docs = _t(spark, sf_dir, "documents")
    return sim_mod.tfidf_cosine_pairs(
        docs, "doc_id", "text", threshold=0.85, n=3
    ).orderBy("id_a", "id_b")


@register(
    "scd2_user_history",
    oracle="""
    SELECT user_id, event_id, event_type,
           ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
           CASE WHEN lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     IS NULL THEN 1 ELSE 0 END AS is_current
    FROM events
    WHERE user_id < 100
    ORDER BY user_id, valid_from, event_id
    """,
)
def scd2_user_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 build from a change log: each
    event opens a validity interval closed by the next event's timestamp
    (lead window, per-user partitions so state stays bounded), with the
    open-ended row flagged current. This is the standard
    changelog-to-dimension materialization a warehouse engine must own;
    event_id breaks timestamp ties deterministically."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 100)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    valid_to = F.lead("ts").over(w)
    return ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        valid_to.alias("valid_to"),
        F.when(valid_to.isNull(), 1).otherwise(0).alias("is_current"),
    ).orderBy("user_id", "valid_from", "event_id")


@register(
    "dq_expectations",
    oracle="""
    SELECT 'orders_rowcount_positive' AS check_name,
           CAST(0 AS BIGINT) AS violations, COUNT(*) AS total,
           CASE WHEN COUNT(*) > 0 THEN 1 ELSE 0 END AS pass
    FROM orders
    UNION ALL
    SELECT 'orders_custkey_not_null',
           CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           COUNT(*),
           CASE WHEN SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) = 0
                THEN 1 ELSE 0 END
    FROM orders
    UNION ALL
    SELECT 'orders_totalprice_positive',
           CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT),
           COUNT(*),
           CASE WHEN SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) = 0
                THEN 1 ELSE 0 END
    FROM orders
    UNION ALL
    SELECT 'orders_orderkey_unique',
           CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT),
           COUNT(*),
           CASE WHEN COUNT(*) = COUNT(DISTINCT o_orderkey) THEN 1 ELSE 0 END
    FROM orders
    UNION ALL
    SELECT 'lineitem_orderkey_fk',
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT),
           (SELECT COUNT(*) FROM lineitem),
           CASE WHEN (SELECT COUNT(*) FROM lineitem l
                      WHERE NOT EXISTS (SELECT 1 FROM orders o
                                        WHERE o.o_orderkey = l.l_orderkey)) = 0
                THEN 1 ELSE 0 END
    ORDER BY check_name
    """,
)
def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality expectation suite (rowcount, not-null, domain,
    uniqueness, referential integrity) evaluated as one unioned report —
    the contract-check pass a pipeline runs before promoting a snapshot.
    Each check is a single aggregate over one scan; the FK check is a
    left-anti join that broadcasts the key side when small and shuffles
    both sides on the key otherwise (AQE decides)."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")

    def chk(name, violations, total, passed):
        return (
            F.lit(name).alias("check_name"),
            violations.cast("bigint").alias("violations"),
            total.cast("bigint").alias("total"),
            passed.cast("int").alias("pass"),
        )

    n = F.count(F.lit(1))
    c1 = orders.agg(*chk("orders_rowcount_positive", F.lit(0), n,
                         F.when(n > 0, 1).otherwise(0)))
    null_ck = F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0))
    c2 = orders.agg(*chk("orders_custkey_not_null", null_ck, n,
                         F.when(null_ck == 0, 1).otherwise(0)))
    dom = F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0))
    c3 = orders.agg(*chk("orders_totalprice_positive", dom, n,
                         F.when(dom == 0, 1).otherwise(0)))
    dup = F.count(F.lit(1)) - F.countDistinct("o_orderkey")
    c4 = orders.agg(*chk("orders_orderkey_unique", dup, n,
                         F.when(dup == 0, 1).otherwise(0)))
    orphans = li.join(
        orders.select("o_orderkey"),
        li.l_orderkey == F.col("o_orderkey"),
        "left_anti",
    ).agg(F.count(F.lit(1)).alias("v"))
    li_total = li.agg(F.count(F.lit(1)).alias("t"))
    c5 = orphans.join(li_total).select(
        F.lit("lineitem_orderkey_fk").alias("check_name"),
        F.col("v").cast("bigint").alias("violations"),
        F.col("t").cast("bigint").alias("total"),
        F.when(F.col("v") == 0, 1).otherwise(0).cast("int").alias("pass"),
    )
    return c1.union(c2).union(c3).union(c4).union(c5).orderBy("check_name")


@register(
    "event_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events),
    pairs AS (
      SELECT event_type, next_type FROM seq WHERE next_type IS NOT NULL),
    counts AS (
      SELECT event_type, next_type, COUNT(*) AS n FROM pairs GROUP BY 1, 2),
    tot AS (
      SELECT event_type, SUM(n) AS row_total FROM counts GROUP BY 1)
    SELECT c.event_type, c.next_type, c.n,
           ROUND(CAST(c.n AS DOUBLE) / CAST(t.row_total AS DOUBLE), 6) AS p
    FROM counts c JOIN tot t ON c.event_type = t.event_type
    ORDER BY c.event_type, c.next_type
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences:
    lead window (per-user partitions) → pair counts → row-normalized
    probabilities. The divisor stays integer until one final double
    division, so p is bit-stable."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    counts = seq.groupBy("event_type", "next_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = counts.groupBy("event_type").agg(F.sum("n").alias("row_total"))
    return (
        counts.join(tot, "event_type")
        .select(
            "event_type",
            "next_type",
            "n",
            F.round(
                F.col("n").cast("double") / F.col("row_total").cast("double"), 6
            ).alias("p"),
        )
        .orderBy("event_type", "next_type")
    )


@register(
    "events_interval_overlap",
    oracle="""
    WITH iv AS (
      SELECT user_id, event_id, ts AS s, ts + INTERVAL 30 MINUTE AS e
      FROM events),
    pairs AS (
      SELECT a.user_id,
             least(epoch_us(a.e), epoch_us(b.e)) -
             greatest(epoch_us(a.s), epoch_us(b.s)) AS overlap_us
      FROM iv a JOIN iv b
        ON a.user_id = b.user_id
       AND a.s <= b.e AND b.s <= a.e
       AND a.event_id < b.event_id)
    SELECT user_id, COUNT(*) AS n_overlaps,
           MAX(overlap_us) AS max_overlap_us
    FROM pairs GROUP BY user_id
    ORDER BY user_id
    """,
)
def events_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap self-join: each event becomes a 30-minute activity
    interval; per user, count overlapping pairs and the longest overlap
    (exact microseconds — epoch integers, no float). The join equi-blocks
    on user_id with the overlap predicate as a residual filter."""
    ev = _t(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        "event_id",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("e"),
    )
    joined = asof_mod.interval_overlap_join(
        iv, iv, key="user_id", left_start="s", left_end="e",
        right_start="s", right_end="e",
    ).filter(F.col("l.event_id") < F.col("r.event_id"))
    overlap_us = F.least(
        F.unix_micros("l.e"), F.unix_micros("r.e")
    ) - F.greatest(F.unix_micros("l.s"), F.unix_micros("r.s"))
    return (
        joined.select(F.col("l.user_id").alias("user_id"), overlap_us.alias("o"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_overlaps"),
            F.max("o").alias("max_overlap_us"),
        )
        .orderBy("user_id")
    )


_PR_EDGES_DEFAULT = """
      SELECT DISTINCT o.o_custkey AS src, 1000000 + l.l_suppkey AS dst
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey"""

_PR_FINAL_DEFAULT = "SELECT node, rank AS rank_scaled FROM {prev} ORDER BY node"


def _pagerank_oracle(
    iterations: int = 5,
    edges_sql: str = _PR_EDGES_DEFAULT,
    final_sql: str = _PR_FINAL_DEFAULT,
) -> str:
    from .operators.graph import DAMPING_DEN, DAMPING_NUM, SCALE

    prev = "pr0"
    iters = []
    for i in range(1, iterations + 1):
        iters.append(f"""pr{i} AS (
      SELECT nd.node,
             CAST(({SCALE} * 15) // ({DAMPING_DEN} * (SELECT n FROM n)) +
                  COALESCE(c.s, 0) AS BIGINT) AS rank
      FROM nodes nd LEFT JOIN (
        SELECT u.dst AS node,
               SUM((p.rank * {DAMPING_NUM}) // ({DAMPING_DEN} * d.deg)) AS s
        FROM und u
        JOIN {prev} p ON u.src = p.node
        JOIN deg d ON d.src = u.src
        GROUP BY u.dst) c ON c.node = nd.node)""")
        prev = f"pr{i}"
    chain = ",\n    ".join(iters)
    final = final_sql.format(prev=prev)
    return f"""
    WITH edges0 AS ({edges_sql}),
    und AS (SELECT src, dst FROM edges0 UNION SELECT dst, src FROM edges0),
    deg AS (SELECT src, COUNT(*) AS deg FROM und GROUP BY src),
    nodes AS (SELECT DISTINCT src AS node FROM und),
    n AS (SELECT COUNT(*) AS n FROM nodes),
    pr0 AS (
      SELECT node, CAST({SCALE} // (SELECT n FROM n) AS BIGINT) AS rank
      FROM nodes),
    {chain}
    {final}
    """


@register("pagerank_customer_supplier", oracle=_pagerank_oracle())
def pagerank_customer_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the customer-supplier purchase graph (undirected
    bipartite; suppliers offset to 1000000+suppkey), 5 synchronous rounds
    in exact scaled-integer arithmetic — every iteration value-checked
    against a DuckDB unrolled-CTE replica. The iterative-join-aggregate
    shape is the Pregel pattern ported to DataFrames."""
    from .operators import graph as graph_mod

    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    edges = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("src"),
            (F.lit(1000000) + F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
    )
    return graph_mod.pagerank(edges, iterations=5).orderBy("node")


def _kmeans_oracle(k: int = 8, dim: int = 64, rounds: int = 1) -> str:
    """Round-unrolled DuckDB replica of operators/similarity.py::
    kmeans_lloyd — every Lloyd iteration (distance cross join, tie-broken
    assignment, integer-mean centroid update) replayed exactly."""
    per_round = []
    for r in range(1, rounds + 1):
        per_round.append(f"""dists{r} AS (
      SELECT q.vec_id, c.cid,
             list_reduce([(qv[i] - cv[i]) * (qv[i] - cv[i])
                          FOR i IN range(1, {dim + 1})],
                         (a, b) -> a + b) AS dist
      FROM q CROSS JOIN cents{r - 1} c),
    assign{r} AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY dist, cid) AS rn
        FROM dists{r})
      WHERE rn = 1),
    upd{r} AS (
      SELECT a.cid, e.pos,
             CAST(SUM(e.val) // COUNT(*) AS INT) AS cval
      FROM assign{r} a JOIN expl e USING (vec_id)
      GROUP BY a.cid, e.pos),
    cents{r} AS (
      SELECT cid, list(cval ORDER BY pos) AS cv FROM upd{r} GROUP BY cid)""")
    chain = ",\n    ".join(per_round)
    return f"""
    WITH q AS (
      SELECT vec_id,
             [GREATEST(CAST(ROUND(CAST(x AS DOUBLE) * 64, 0) AS INT) + 128, 0)
              FOR x IN embedding] AS qv
      FROM embeddings),
    cents0 AS (SELECT vec_id AS cid, qv AS cv FROM q WHERE vec_id < {k}),
    expl AS (
      SELECT vec_id, unnest(qv) AS val,
             unnest(range(1, {dim + 1})) AS pos
      FROM q),
    {chain},
    sizes AS (SELECT cid, COUNT(*) AS n_members FROM assign{rounds} GROUP BY cid)
    SELECT c.cid AS cluster_id, s.n_members, c.cv AS centroid
    FROM cents{rounds} c JOIN sizes s USING (cid)
    ORDER BY cluster_id
    """


@register("kmeans_lloyd_iteration", oracle=_kmeans_oracle(rounds=1))
def kmeans_lloyd_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One synchronous Lloyd (k-means) round in EXACT integer arithmetic
    (see operators/similarity.py::kmeans_lloyd) — value-checked against
    DuckDB; the float formulation could never be (sum order perturbs the
    last ulp)."""
    emb = _t(spark, sf_dir, "embeddings")
    return sim_mod.kmeans_lloyd(emb, k=8, rounds=1)


@register("kmeans_lloyd_3rounds", oracle=_kmeans_oracle(rounds=3))
def kmeans_lloyd_3rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three chained Lloyd rounds — the iterate-until-stable ML training
    loop as a DataFrame plan, every round replayed exactly by the DuckDB
    oracle. Two shuffles per round; centroids re-broadcast each round."""
    emb = _t(spark, sf_dir, "embeddings")
    return sim_mod.kmeans_lloyd(emb, k=8, rounds=3)


@register(
    "orders_benford_first_digit",
    oracle="""
    WITH digits AS (
      SELECT CAST(substring(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR), 1, 1) AS INT) AS d
      FROM orders WHERE o_totalprice > 0),
    n AS (SELECT COUNT(*) AS n FROM digits),
    obs AS (SELECT d, COUNT(*) AS observed FROM digits GROUP BY d)
    SELECT o.d AS first_digit, o.observed,
           ROUND(CAST((SELECT n FROM n) AS DOUBLE) *
                 log10(1 + CAST(1 AS DOUBLE) / o.d), 2) AS expected,
           ROUND(CAST(o.observed AS DOUBLE) /
                 CAST((SELECT n FROM n) AS DOUBLE), 6) AS observed_p
    FROM obs o
    ORDER BY first_digit
    """,
)
def orders_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals — the forensic DQ
    check for fabricated monetary data. Digit extraction goes through an
    exact DECIMAL(18,2) string so float formatting can't flip a leading
    digit; expected counts use the Benford distribution log10(1 + 1/d)."""
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    digits = orders.select(
        F.substring(
            F.col("o_totalprice").cast("decimal(18,2)").cast("string"), 1, 1
        )
        .cast("int")
        .alias("d")
    )
    n = digits.agg(F.count(F.lit(1)).alias("n"))
    return (
        digits.groupBy("d")
        .agg(F.count(F.lit(1)).alias("observed"))
        .join(F.broadcast(n))
        .select(
            F.col("d").alias("first_digit"),
            "observed",
            F.round(
                F.col("n").cast("double")
                * F.log10(F.lit(1) + F.lit(1).cast("double") / F.col("d")),
                2,
            ).alias("expected"),
            F.round(
                F.col("observed").cast("double") / F.col("n").cast("double"), 6
            ).alias("observed_p"),
        )
        .orderBy("first_digit")
    )


@register(
    "orders_revenue_max_drawdown",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY 1),
    dd AS (
      SELECT day, rev,
             MAX(rev) OVER (ORDER BY day
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS peak
      FROM daily)
    SELECT CAST(MIN(day) AS DATE) AS first_day,
           CAST(MAX(day) AS DATE) AS last_day,
           CAST(MAX(peak) AS DOUBLE) AS peak_revenue,
           CAST(MAX(peak - rev) AS DOUBLE) AS max_drawdown
    FROM dd
    """,
)
def orders_revenue_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of the daily revenue series: running peak minus
    current value, maximized — entirely in exact DECIMAL so the windowed
    fold is bit-stable; one final DOUBLE cast for the report. A daily
    pre-aggregate bounds the window input to one row per day at any
    scale."""
    orders = _t(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    dd = daily.withColumn("peak", F.max("rev").over(w))
    return dd.agg(
        F.min("day").alias("first_day"),
        F.max("day").alias("last_day"),
        F.max("peak").cast("double").alias("peak_revenue"),
        F.max(F.col("peak") - F.col("rev")).cast("double").alias("max_drawdown"),
    )


def _lsh_topk_oracle(
    k: int = 3, n_planes: int = 6, n_tables: int = 8, dim: int = 64
) -> str:
    """DuckDB replica of operators/similarity.py::lsh_topk — every stage
    (48 deterministic hyperplanes, per-table sign buckets, multiprobe
    bit-flip probing, candidate dedup, exact-cosine window top-k) is
    reproduced, so the APPROXIMATE index is value-checked exactly."""
    tables = [
        sim_mod._hyperplanes(dim, n_planes, seed=f"lsh{t}")
        for t in range(n_tables)
    ]
    plane_cols = ",\n             ".join(
        "[" + ", ".join(repr(x) for x in p) + f"]::DOUBLE[] AS p{t}_{i}"
        for t, tp in enumerate(tables)
        for i, p in enumerate(tp)
    )

    def dot(vec: str, plane: str) -> str:
        return (
            f"list_reduce([CAST({vec}[i] AS DOUBLE) * {plane}[i] "
            f"FOR i IN range(1, len({vec})+1)], (acc, x) -> acc + x)"
        )

    def vdot(va: str, vb: str) -> str:
        return (
            f"list_reduce([CAST({va}[i] AS DOUBLE) * CAST({vb}[i] AS DOUBLE) "
            f"FOR i IN range(1, len({va})+1)], (acc, x) -> acc + x)"
        )

    def bucket(vec: str, t: int) -> str:
        bits = " + ".join(
            f"(CASE WHEN {dot(vec, f'p{t}_{i}')} >= 0 THEN {1 << i} ELSE 0 END)"
            for i in range(n_planes)
        )
        return f"({bits} + {t << n_planes})"

    corpus_buckets = ",\n                     ".join(
        bucket("v", t) for t in range(n_tables)
    )
    qb_cols = ",\n             ".join(
        f"{bucket('v', t)} AS b{t}" for t in range(n_tables)
    )
    probe_list = []
    for t in range(n_tables):
        probe_list.append(f"b{t}")
        probe_list += [f"xor(b{t}, {1 << i})" for i in range(n_planes)]
    probes = ", ".join(probe_list)
    return f"""
    WITH planes AS (
      SELECT {plane_cols}),
    corpus AS (
      SELECT vec_id AS neighbor_id,
             unnest([{corpus_buckets}]) AS bucket
      FROM (SELECT vec_id, embedding AS v FROM embeddings), planes),
    qb AS (
      SELECT vec_id AS query_id,
             {qb_cols}
      FROM (SELECT vec_id, embedding AS v FROM embeddings WHERE vec_id < 5),
           planes),
    probes AS (
      SELECT query_id, unnest([{probes}]) AS bucket FROM qb),
    cand AS (
      SELECT DISTINCT p.query_id, c.neighbor_id
      FROM corpus c JOIN probes p ON c.bucket = p.bucket
      WHERE c.neighbor_id <> p.query_id),
    pairs AS (
      SELECT cd.query_id, cd.neighbor_id,
             qe.embedding AS qv, ne.embedding AS nv
      FROM cand cd
      JOIN embeddings qe ON qe.vec_id = cd.query_id
      JOIN embeddings ne ON ne.vec_id = cd.neighbor_id),
    scored AS (
      SELECT query_id, neighbor_id,
             {vdot("qv", "nv")} /
             (sqrt({vdot("qv", "qv")}) * sqrt({vdot("nv", "nv")})) AS cos
      FROM pairs),
    ranked AS (
      SELECT query_id, neighbor_id, cos,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cos DESC, neighbor_id) AS INT)
               AS rank
      FROM scored)
    SELECT query_id, neighbor_id, rank, ROUND(cos, 6) AS cosine
    FROM ranked WHERE rank <= {k}
    ORDER BY query_id, rank
    """


_ORACLES["similarity_lsh_topk"] = _lsh_topk_oracle()


@register(
    "streaming_late_data_drop",
    oracle="""
    WITH a AS (SELECT * FROM events
               WHERE ts < TIMESTAMP '2024-01-20' AND event_id % 2 = 0),
    b AS (SELECT * FROM events WHERE ts >= TIMESTAMP '2024-01-20'),
    c AS (SELECT * FROM events
          WHERE ts < TIMESTAMP '2024-01-10' AND event_id % 2 = 1),
    -- Spark's batch-3 late filter uses the watermark computed at the end
    -- of batch B (not batch A) — model exactly that
    wmb AS (SELECT epoch_ms(MAX(ts)) - 7200000 AS wm
            FROM (SELECT ts FROM a UNION ALL SELECT ts FROM b)),
    wmf AS (SELECT epoch_ms(MAX(ts)) - 7200000 AS wm
            FROM (SELECT ts FROM a UNION ALL SELECT ts FROM b
                  UNION ALL SELECT ts FROM c)),
    surv AS (
      SELECT ts, event_type FROM a
      UNION ALL SELECT ts, event_type FROM b
      UNION ALL SELECT ts, event_type FROM c
        WHERE epoch_ms(date_trunc('hour', ts) + INTERVAL 1 HOUR) >
              (SELECT wm FROM wmb)),
    agg AS (
      SELECT date_trunc('hour', ts) AS window_start, event_type,
             COUNT(*) AS n
      FROM surv GROUP BY 1, 2)
    SELECT window_start, event_type, n FROM agg
    WHERE epoch_ms(window_start + INTERVAL 1 HOUR) <= (SELECT wm FROM wmf)
    ORDER BY window_start, event_type
    """,
)
def streaming_late_data_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three deterministic micro-batches through a watermarked tumbling
    window in append mode: fresh data (batch B) advances the watermark
    ~10 days past the stragglers (batch C), so C is dropped entirely by
    the late-record filter — and the DuckDB oracle reproduces the
    watermark arithmetic, ms truncation and all. This pins the late-data
    contract, not just the happy path."""
    import os as _os

    from .streaming.incremental import late_data_window_counts

    out = late_data_window_counts(
        spark, _os.path.join(sf_dir, "events.parquet")
    )
    return out.orderBy("window_start", "event_type")


@register(
    "array_hof_breadth",
    oracle="""
    WITH arrs AS (
      SELECT l_orderkey, list_sort(list(l_quantity)) AS qs
      FROM lineitem GROUP BY l_orderkey HAVING COUNT(*) >= 4)
    SELECT l_orderkey,
           len(qs) AS n_items,
           CASE WHEN len(list_filter(qs, x -> x > 40)) > 0 THEN 1 ELSE 0 END AS any_gt40,
           CASE WHEN len(list_filter(qs, x -> NOT (x > 0))) = 0 THEN 1 ELSE 0 END AS all_pos,
           len(list_filter(qs, x -> x >= 25)) AS n_ge25,
           ROUND(list_reduce(list_transform(qs, x -> x * 2), (a, b) -> a + b), 2) AS sum_doubled,
           qs[1:3] AS first3,
           list_reverse(qs) AS reversed_qs,
           len(list_distinct(qs)) AS n_distinct
    FROM arrs
    ORDER BY l_orderkey
    LIMIT 100
    """,
)
def array_hof_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order-function breadth (exists / forall / filter /
    transform+aggregate / slice / reverse / distinct) over per-order
    quantity arrays. Arrays are sorted on construction so the fold order
    — and therefore every float sum — is identical in both engines."""
    li = _t(spark, sf_dir, "lineitem")
    arrs = (
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_list("l_quantity")).alias("qs"))
        .filter(F.size("qs") >= 4)
    )
    return arrs.select(
        "l_orderkey",
        F.size("qs").alias("n_items"),
        F.when(F.exists("qs", lambda x: x > 40), 1).otherwise(0).alias("any_gt40"),
        F.when(F.forall("qs", lambda x: x > 0), 1).otherwise(0).alias("all_pos"),
        F.size(F.filter("qs", lambda x: x >= 25)).alias("n_ge25"),
        F.round(
            F.aggregate(
                F.transform("qs", lambda x: x * 2),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            2,
        ).alias("sum_doubled"),
        F.slice("qs", 1, 3).alias("first3"),
        F.reverse("qs").alias("reversed_qs"),
        F.size(F.array_distinct("qs")).alias("n_distinct"),
    ).orderBy("l_orderkey").limit(100)


@register(
    "null_semantics_breadth",
    oracle="""
    WITH v AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 7 = 0 THEN NULL
                  ELSE CAST(o_totalprice AS DECIMAL(18,2)) END AS val
      FROM orders)
    SELECT COUNT(*) AS n_rows,
           COUNT(val) AS n_nonnull,
           CAST(COUNT(*) - COUNT(val) AS BIGINT) AS n_null,
           CAST(ROUND(SUM(val), 2) AS DOUBLE) AS sum_skips_null,
           CAST(MIN(val) AS DOUBLE) AS min_skips_null,
           SUM(CASE WHEN val IS NOT DISTINCT FROM NULL THEN 1 ELSE 0 END) AS nullsafe_eq_null,
           SUM(CASE WHEN (val > 100) IS NULL THEN 1 ELSE 0 END) AS cmp_null_is_unknown,
           SUM(CASE WHEN (val > 100 OR o_orderkey >= 0) THEN 1 ELSE 0 END) AS or_rescues_unknown,
           SUM(CASE WHEN COALESCE(val, 0) = 0 THEN 1 ELSE 0 END) AS coalesce_defaults,
           SUM(CASE WHEN NULLIF(o_orderkey % 7, 0) IS NULL THEN 1 ELSE 0 END) AS nullif_hits
    FROM v
    """,
)
def null_semantics_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI three-valued-logic pinning: COUNT(*) vs COUNT(col), aggregate
    NULL skipping, null-safe equality (<=>), UNKNOWN comparison results,
    OR rescuing UNKNOWN, COALESCE and NULLIF — one row of engine-semantics
    ground truth over a synthesized nullable column."""
    orders = _t(spark, sf_dir, "orders")
    val = F.when(
        F.col("o_orderkey") % 7 == 0, F.lit(None)
    ).otherwise(F.col("o_totalprice").cast("decimal(18,2)"))
    v = orders.select("o_orderkey", val.alias("val"))
    return v.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("val").alias("n_nonnull"),
        (F.count(F.lit(1)) - F.count("val")).cast("bigint").alias("n_null"),
        F.round(F.sum("val"), 2).cast("double").alias("sum_skips_null"),
        F.min("val").cast("double").alias("min_skips_null"),
        F.sum(
            F.when(F.col("val").eqNullSafe(F.lit(None)), 1).otherwise(0)
        ).alias("nullsafe_eq_null"),
        F.sum(
            F.when((F.col("val") > 100).isNull(), 1).otherwise(0)
        ).alias("cmp_null_is_unknown"),
        F.sum(
            F.when((F.col("val") > 100) | (F.col("o_orderkey") >= 0), 1).otherwise(0)
        ).alias("or_rescues_unknown"),
        F.sum(
            F.when(F.coalesce(F.col("val"), F.lit(0)) == 0, 1).otherwise(0)
        ).alias("coalesce_defaults"),
        F.sum(
            F.when(F.nullif(F.col("o_orderkey") % 7, F.lit(0)).isNull(), 1).otherwise(0)
        ).alias("nullif_hits"),
    )


def _hll_parts(p: int = 8):
    """Shared pieces of the exact-arithmetic HyperLogLog: md5-portable
    60-bit hash, low p bits pick the register, the next 53-p... (here:
    the remaining 52) bits feed the leading-zero rank via a generated
    integer CASE chain — no floats anywhere until the final estimate."""
    m = 1 << p
    wbits = 52  # 60-bit hash minus 8 register bits
    # rank = position of the highest set bit from the top of the 52-bit
    # field, 1-based; all-zero field -> wbits + 1
    cases = " ".join(
        f"WHEN w >= {1 << (wbits - r)} THEN {r}" for r in range(1, wbits + 1)
    )
    rank_sql = f"CASE {cases} ELSE {wbits + 1} END"
    alpha = 0.7213 / (1 + 1.079 / m)
    return m, wbits, rank_sql, alpha


def _hll_oracle(p: int = 8) -> str:
    m, wbits, rank_sql, alpha = _hll_parts(p)
    return f"""
    WITH h AS (
      SELECT CAST(concat('0x', substring(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
      FROM events),
    ranked AS (
      SELECT hv & {m - 1} AS bucket, (hv >> {p}) AS w FROM h),
    regs AS (
      SELECT bucket, MAX({rank_sql}) AS mj
      FROM ranked GROUP BY bucket),
    full_regs AS (
      SELECT t.b AS bucket, COALESCE(r.mj, 0) AS mj
      FROM (SELECT unnest(range(0, {m})) AS b) t
      LEFT JOIN regs r ON r.bucket = t.b),
    s AS (
      SELECT SUM(CAST(1 AS BIGINT) << ({wbits + 1} - mj)) AS inv_scaled,
             SUM(CASE WHEN mj = 0 THEN 1 ELSE 0 END) AS zeros
      FROM full_regs),
    est AS (
      SELECT ROUND(CASE WHEN raw <= {25 * m // 10} AND zeros > 0
                        THEN CAST({m} AS DOUBLE) *
                             ln(CAST({m} AS DOUBLE) / CAST(zeros AS DOUBLE))
                        ELSE raw END, 4) AS hll_estimate
      FROM (SELECT CAST({alpha!r} AS DOUBLE) * CAST({m * m} AS DOUBLE) *
                   CAST({1 << (wbits + 1)} AS DOUBLE) /
                   CAST(inv_scaled AS DOUBLE) AS raw,
                   zeros
            FROM s))
    SELECT e.hll_estimate,
           (SELECT COUNT(DISTINCT user_id) FROM events) AS exact_distinct,
           ROUND(ABS(e.hll_estimate -
                     (SELECT COUNT(DISTINCT user_id) FROM events)) /
                 (SELECT COUNT(DISTINCT user_id) FROM events), 4) AS rel_err
    FROM est e
    """


@register("hll_distinct_users", oracle=_hll_oracle())
def hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog from scratch in exact arithmetic, value-checked: the
    md5-portable hash picks a register (low 8 bits) and a 52-bit field
    whose leading-zero rank comes from a generated integer CASE chain;
    register maxes aggregate per bucket; the harmonic sum is EXACT
    (Σ2^-M_j scaled by 2^53 stays a BIGINT), so the one final double
    division is bit-identical in both engines. Output: estimate vs exact
    distinct with relative error — the mergeable-sketch building block
    for distributed distinct counting, here with a real correctness gate
    instead of 'close enough'."""
    p = 8
    m, wbits, rank_sql, alpha = _hll_parts(p)
    ev = _t(spark, sf_dir, "events")
    h = ev.select(
        F.expr(
            "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 15), 16, 10) AS BIGINT)"
        ).alias("hv")
    )
    ranked = h.select(
        (F.col("hv").bitwiseAND(F.lit(m - 1))).alias("bucket"),
        F.shiftright("hv", p).alias("w"),
    )
    regs = ranked.groupBy("bucket").agg(F.expr(f"MAX({rank_sql})").alias("mj"))
    full = (
        ev.sparkSession.range(m)
        .select(F.col("id").alias("bucket"))
        .join(regs, "bucket", "left")
        .select("bucket", F.coalesce("mj", F.lit(0)).alias("mj"))
    )
    s = full.agg(
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {wbits + 1} - mj)")).alias(
            "inv_scaled"
        ),
        F.sum(F.when(F.col("mj") == 0, 1).otherwise(0)).alias("zeros"),
    )
    exact = ev.agg(F.countDistinct("user_id").alias("exact_distinct"))
    raw = (
        F.lit(alpha)
        * F.lit(m * m).cast("double")
        * F.lit(1 << (wbits + 1)).cast("double")
        / F.col("inv_scaled").cast("double")
    )
    # linear-counting small-range correction: with V empty registers and
    # a raw estimate under 2.5m, m*ln(m/V) is the accurate regime
    est = F.round(
        F.when(
            (raw <= F.lit(25 * m // 10)) & (F.col("zeros") > 0),
            F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("zeros").cast("double")),
        ).otherwise(raw),
        4,
    )
    return (
        s.join(F.broadcast(exact))
        .select(
            est.alias("hll_estimate"),
            "exact_distinct",
            F.round(
                F.abs(est - F.col("exact_distinct"))
                / F.col("exact_distinct"),
                4,
            ).alias("rel_err"),
        )
    )


_PORTABLE_H = (
    "CAST(conv(substring(md5({x}), 1, 15), 16, 10) AS BIGINT)"  # Spark
)
_PORTABLE_H_DUCK = (
    "CAST(concat('0x', substring(md5({x}), 1, 15)) AS BIGINT)"  # DuckDB
)


@register(
    "cms_user_event_counts",
    oracle=f"""
    WITH buckets AS (
      SELECT r, {_PORTABLE_H_DUCK.format(x="concat(CAST(r AS VARCHAR), ':', CAST(user_id AS VARCHAR))")} & 255 AS bucket
      FROM events, (SELECT unnest(range(0, 4)) AS r)),
    counters AS (
      SELECT r, bucket, COUNT(*) AS c FROM buckets GROUP BY r, bucket),
    exact AS (
      SELECT user_id, COUNT(*) AS exact_n FROM events GROUP BY user_id
      ORDER BY exact_n DESC, user_id LIMIT 10),
    probes AS (
      SELECT e.user_id, e.exact_n, t.r,
             {_PORTABLE_H_DUCK.format(x="concat(CAST(t.r AS VARCHAR), ':', CAST(e.user_id AS VARCHAR))")} & 255 AS bucket
      FROM exact e, (SELECT unnest(range(0, 4)) AS r) t)
    SELECT p.user_id, p.exact_n, MIN(c.c) AS cms_estimate,
           CAST(MIN(c.c) - p.exact_n AS BIGINT) AS overcount
    FROM probes p JOIN counters c ON c.r = p.r AND c.bucket = p.bucket
    GROUP BY p.user_id, p.exact_n
    ORDER BY exact_n DESC, user_id
    """,
)
def cms_user_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch from scratch (4 rows x 256 counters, md5-portable
    row-salted hashes): per-user event-count estimates = min over rows —
    all integer, so the sketch AND its one-sided overcount guarantee
    (estimate >= exact, checked as a column) hash-match the DuckDB
    replica. The counter table is the mergeable map-side state a
    distributed heavy-hitters pass would combine."""
    ev = _t(spark, sf_dir, "events")
    rows = spark.range(4).select(F.col("id").cast("int").alias("r"))
    h = _PORTABLE_H.format(
        x="concat(CAST(r AS STRING), ':', CAST(user_id AS STRING))"
    )
    buckets = ev.crossJoin(F.broadcast(rows)).select(
        "r", F.expr(f"{h} & 255").alias("bucket")
    )
    counters = buckets.groupBy("r", "bucket").agg(F.count(F.lit(1)).alias("c"))
    exact = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.desc("exact_n"), "user_id")
        .limit(10)
    )
    probes = exact.crossJoin(F.broadcast(rows)).select(
        "user_id", "exact_n", "r", F.expr(f"{h} & 255").alias("bucket")
    )
    return (
        probes.join(counters, ["r", "bucket"])
        .groupBy("user_id", "exact_n")
        .agg(F.min("c").alias("cms_estimate"))
        .select(
            "user_id",
            "exact_n",
            "cms_estimate",
            (F.col("cms_estimate") - F.col("exact_n"))
            .cast("bigint")
            .alias("overcount"),
        )
        .orderBy(F.desc("exact_n"), "user_id")
    )


@register(
    "bloom_filter_customers",
    oracle=f"""
    WITH member AS (SELECT DISTINCT o_custkey AS k FROM orders),
    bits AS (
      SELECT DISTINCT {_PORTABLE_H_DUCK.format(x="concat(CAST(j AS VARCHAR), ':', CAST(k AS VARCHAR))")} & 8191 AS bit
      FROM member, (SELECT unnest(range(0, 4)) AS j)),
    non_member AS (
      -- shifted keys: disjoint from every real custkey by construction,
      -- so each probe is a true negative and fp_rate is measurable
      SELECT c_custkey + 1000000 AS k FROM customer),
    probe_bits AS (
      SELECT k, {_PORTABLE_H_DUCK.format(x="concat(CAST(j AS VARCHAR), ':', CAST(k AS VARCHAR))")} & 8191 AS bit
      FROM non_member, (SELECT unnest(range(0, 4)) AS j)),
    hits AS (
      SELECT p.k, COUNT(b.bit) AS n_set
      FROM probe_bits p LEFT JOIN bits b ON b.bit = p.bit
      GROUP BY p.k)
    SELECT (SELECT COUNT(*) FROM member) AS n_members,
           (SELECT COUNT(*) FROM bits) AS n_bits_set,
           COUNT(*) AS n_probes,
           SUM(CASE WHEN n_set = 4 THEN 1 ELSE 0 END) AS n_false_positives,
           ROUND(CAST(SUM(CASE WHEN n_set = 4 THEN 1 ELSE 0 END) AS DOUBLE) /
                 CAST(COUNT(*) AS DOUBLE), 6) AS fp_rate
    FROM hits
    """,
)
def bloom_filter_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom filter from scratch (8192 bits, 4 md5-portable salted
    hashes) built over customers-with-orders, probed with shifted keys
    that are non-members by construction — the measured false-positive
    rate is an exact integer computation, hash-checked against DuckDB.
    This is the join-pruning primitive (build on the small side, ship
    bits to the fact scan) that Spark's runtime bloom-filter injection
    automates."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    member = orders.select(F.col("o_custkey").alias("k")).distinct()
    js = spark.range(4).select(F.col("id").cast("int").alias("j"))
    h = _PORTABLE_H.format(x="concat(CAST(j AS STRING), ':', CAST(k AS STRING))")
    bits = (
        member.crossJoin(F.broadcast(js))
        .select(F.expr(f"{h} & 8191").alias("bit"))
        .distinct()
    )
    non_member = cust.select(
        (F.col("c_custkey") + 1000000).alias("k")
    )
    probe_bits = non_member.crossJoin(F.broadcast(js)).select(
        "k", F.expr(f"{h} & 8191").alias("bit")
    )
    hits = (
        probe_bits.join(bits.withColumnRenamed("bit", "sbit"),
                        probe_bits.bit == F.col("sbit"), "left")
        .groupBy("k")
        .agg(F.count("sbit").alias("n_set"))
    )
    n_members = member.agg(F.count(F.lit(1)).alias("n_members"))
    n_bits = bits.agg(F.count(F.lit(1)).alias("n_bits_set"))
    fp = F.sum(F.when(F.col("n_set") == 4, 1).otherwise(0))
    return (
        hits.agg(
            F.count(F.lit(1)).alias("n_probes"),
            fp.alias("n_false_positives"),
            F.round(
                fp.cast("double") / F.count(F.lit(1)).cast("double"), 6
            ).alias("fp_rate"),
        )
        .join(F.broadcast(n_members))
        .join(F.broadcast(n_bits))
        .select(
            "n_members", "n_bits_set", "n_probes", "n_false_positives", "fp_rate"
        )
    )


@register(
    "truncate_to_token_budget",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             CASE WHEN trim(text) = '' THEN []
                  ELSE string_split_regex(lower(trim(text)), '\\s+') END AS ws
      FROM documents)
    SELECT doc_id,
           len(ws) AS n_tokens,
           CASE WHEN len(ws) > 64 THEN 64 ELSE len(ws) END AS n_kept,
           CASE WHEN len(ws) > 64 THEN 1 ELSE 0 END AS truncated,
           array_to_string(ws[1:64], ' ') AS truncated_text
    FROM toks
    ORDER BY doc_id
    """,
)
def truncate_to_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document truncation to a 64-token budget — the sequence-length
    cap every training-data pipeline applies before packing. Token split,
    slice, and rejoin are pure narrow array ops (no shuffle, no UDF);
    the rebuilt text is hash-checked so boundary behavior (short docs,
    empty docs, exact-64 docs) is pinned."""
    docs = _t(spark, sf_dir, "documents")
    ws = F.when(
        F.trim(F.col("text")) == "", F.array().cast("array<string>")
    ).otherwise(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
    return docs.select(
        "doc_id",
        F.size(ws).alias("n_tokens"),
        F.least(F.size(ws), F.lit(64)).alias("n_kept"),
        F.when(F.size(ws) > 64, 1).otherwise(0).alias("truncated"),
        F.concat_ws(" ", F.slice(ws, 1, 64)).alias("truncated_text"),
    ).orderBy("doc_id")


@register(
    "dedup_retention_manifest",
    oracle="""
    WITH sh AS (
      SELECT doc_id,
             list_distinct([list_aggregate(words[i:i+2], 'string_agg', ' ')
                            FOR i IN range(1, len(words) - 1)]) AS sh
      FROM (SELECT doc_id,
                   string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS words
            FROM documents)
      WHERE len(words) >= 3),
    edges AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
                  (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))),
                  6) >= 0.2),
    und AS (SELECT id_a AS u, id_b AS v FROM edges
            UNION SELECT id_b, id_a FROM edges),
    comp AS (
      -- min-label propagation to fixpoint via recursive CTE
      WITH RECURSIVE walk(node, lbl) AS (
        SELECT u, LEAST(u, MIN(v)) FROM und GROUP BY u
        UNION
        SELECT w.node, LEAST(w.lbl, u2.lbl)
        FROM walk w JOIN und e ON e.u = w.node JOIN walk u2 ON u2.node = e.v
      )
      SELECT node, MIN(lbl) AS component FROM walk GROUP BY node),
    labeled AS (
      SELECT d.doc_id,
             COALESCE(c.component, d.doc_id) AS component
      FROM documents d LEFT JOIN comp c ON c.node = d.doc_id)
    SELECT doc_id, component,
           CASE WHEN doc_id = component THEN 'keep' ELSE 'drop' END AS action
    FROM labeled
    ORDER BY doc_id
    """,
)
def dedup_retention_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end dedup DECISION artifact: exact-Jaccard near-dup edges →
    connected components (min-label propagation) → keep the minimum doc
    id per component, drop the rest — the manifest a corpus-curation
    pipeline actually ships. Oracle: recursive-CTE label propagation in
    DuckDB."""
    docs = _t(spark, sf_dir, "documents")
    edges = dedup_mod.ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.2
    ).select("id_a", "id_b")
    comp = dedup_mod.connected_components(edges)
    labeled = docs.select("doc_id").join(
        comp, docs.doc_id == comp.id, "left"
    ).select(
        "doc_id",
        F.coalesce("component", F.col("doc_id")).alias("component"),
    )
    return labeled.select(
        "doc_id",
        "component",
        F.when(F.col("doc_id") == F.col("component"), "keep")
        .otherwise("drop")
        .alias("action"),
    ).orderBy("doc_id")


@register(
    "quantile_sketch_order_totals",
    oracle="""
    WITH binned AS (
      -- log2-spaced bins via integer doubling: bin = floor(log2(price))
      -- computed with a generated comparison chain (no libm)
      SELECT CASE """ + " ".join(
        f"WHEN o_totalprice >= {1 << b} THEN {b}" for b in range(30, -1, -1)
    ) + """ ELSE -1 END AS bin
      FROM orders),
    hist AS (SELECT bin, COUNT(*) AS c FROM binned GROUP BY bin),
    cum AS (
      SELECT bin, c,
             SUM(c) OVER (ORDER BY bin) AS cum_c,
             (SELECT SUM(c) FROM hist) AS total
      FROM hist),
    qs AS (
      SELECT q,
             MIN(CASE WHEN cum_c >= CAST(ceil(q * total) AS BIGINT)
                      THEN bin END) AS qbin
      FROM cum, (SELECT unnest([0.5, 0.95, 0.99]::DOUBLE[]) AS q)
      GROUP BY q)
    SELECT q, qbin,
           CAST(POW(CAST(2 AS DOUBLE), qbin) AS DOUBLE) AS bin_lower,
           CAST(POW(CAST(2 AS DOUBLE), qbin + 1) AS DOUBLE) AS bin_upper
    FROM qs
    ORDER BY q
    """,
)
def quantile_sketch_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketch: a log2-bucketed histogram (bins via an
    integer comparison chain, no libm) whose cumulative counts bracket
    any quantile within one power-of-two bin — the fixed-size,
    map-side-combinable state a distributed percentile pass merges. The
    q50/q95/q99 bin bounds are exact integer arithmetic; POW(2, n) is
    exact in doubles."""
    orders = _t(spark, sf_dir, "orders")
    cases = " ".join(
        f"WHEN o_totalprice >= {1 << b} THEN {b}" for b in range(30, -1, -1)
    )
    binned = orders.select(F.expr(f"CASE {cases} ELSE -1 END").alias("bin"))
    hist = binned.groupBy("bin").agg(F.count(F.lit(1)).alias("c"))
    total = hist.agg(F.sum("c").alias("total"))
    cum = hist.join(F.broadcast(total)).select(
        "bin",
        "c",
        F.sum("c").over(Window.orderBy("bin")).alias("cum_c"),
        "total",
    )
    qs = spark.createDataFrame([(0.5,), (0.95,), (0.99,)], "q double")
    return (
        cum.crossJoin(F.broadcast(qs))
        .groupBy("q")
        .agg(
            F.min(
                F.when(
                    F.col("cum_c")
                    >= F.ceil(F.col("q") * F.col("total")).cast("bigint"),
                    F.col("bin"),
                )
            ).alias("qbin")
        )
        .select(
            "q",
            "qbin",
            F.expr("CAST(POW(CAST(2 AS DOUBLE), qbin) AS DOUBLE)").alias("bin_lower"),
            F.expr("CAST(POW(CAST(2 AS DOUBLE), qbin + 1) AS DOUBLE)").alias("bin_upper"),
        )
        .orderBy("q")
    )


@register(
    "events_range_interval_window",
    oracle="""
    SELECT event_id, user_id, ts,
           COUNT(*) OVER w AS n_last_hour,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS sum_last_hour
    FROM events
    WHERE user_id < 20
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    ORDER BY user_id, ts, event_id
    """,
)
def events_range_interval_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-BETWEEN-INTERVAL window frames: per-user trailing-hour event
    count and value sum, frame bounded by event TIME rather than row
    count — the semantics rows-based frames cannot express when events
    arrive irregularly. The sum runs in DECIMAL so frame-internal order
    cannot perturb the hash."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    out = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.expr(
            "COUNT(*) OVER (PARTITION BY user_id ORDER BY ts "
            "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)"
        ).alias("n_last_hour"),
        F.expr(
            "CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER (PARTITION BY user_id ORDER BY ts "
            "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS DOUBLE)"
        ).alias("sum_last_hour"),
    )
    return out.orderBy("user_id", "ts", "event_id")


@register(
    "media_binary_stats",
    oracle="""
    WITH media AS (
      SELECT doc_id AS media_id, encode(text) AS payload, text
      FROM documents WHERE doc_id % 3 = 1),
    hexed AS (
      SELECT media_id, octet_length(payload) AS n_bytes,
             hex(payload) AS h, md5(text) AS payload_md5
      FROM media)
    SELECT media_id, n_bytes, payload_md5,
           substring(h, 1, 8) AS magic4,
           len(list_distinct([substring(h, 2*i - 1, 2)
                              FOR i IN range(1, len(h)//2 + 1)])) AS n_distinct_bytes
    FROM hexed
    ORDER BY media_id
    """,
)
def media_binary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary column analytics without any codec: payload size,
    content digest, leading-bytes 'magic number' signature, and distinct
    byte cardinality — all computed JVM-side on the binary column (hex +
    array ops) and hash-checked against DuckDB's blob functions. This is
    the triage pass (corrupt/truncated/miscontainer detection) that runs
    BEFORE expensive decode at 100 TB."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 1)
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    hexed = media.select(
        "media_id",
        F.length("payload").alias("n_bytes"),
        F.hex("payload").alias("h"),
        F.md5("payload").alias("payload_md5"),
    )
    return hexed.select(
        "media_id",
        "n_bytes",
        "payload_md5",
        F.substring("h", 1, 8).alias("magic4"),
        F.size(
            F.array_distinct(
                F.expr(
                    "transform(sequence(1, length(h) DIV 2), i -> substring(h, 2*i - 1, 2))"
                )
            )
        ).alias("n_distinct_bytes"),
    ).orderBy("media_id")


@register(
    "funnel_time_to_conversion",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
      FROM events GROUP BY user_id),
    conv AS (
      SELECT user_id,
             epoch_us(first_purchase) - epoch_us(first_view) AS latency_us
      FROM firsts
      WHERE first_view IS NOT NULL AND first_purchase IS NOT NULL
        AND first_purchase >= first_view)
    SELECT COUNT(*) AS n_converted,
           ROUND(quantile_cont(latency_us, 0.5) / CAST(1000000 AS DOUBLE), 2) AS p50_seconds,
           ROUND(quantile_cont(latency_us, 0.9) / CAST(1000000 AS DOUBLE), 2) AS p90_seconds,
           ROUND(MIN(latency_us) / CAST(1000000 AS DOUBLE), 2) AS min_seconds,
           ROUND(MAX(latency_us) / CAST(1000000 AS DOUBLE), 2) AS max_seconds
    FROM conv
    """,
)
def funnel_time_to_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-view to first-purchase latency distribution: conditional-min
    pivot per user (one aggregate), exact integer microsecond deltas,
    then interpolated percentiles — Spark `percentile` and DuckDB
    `quantile_cont` share the interpolation rule, and the inputs are
    exact integers so the interpolation arithmetic is bit-identical."""
    ev = _t(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("fv"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("fp"),
    )
    conv = firsts.filter(
        F.col("fv").isNotNull() & F.col("fp").isNotNull() & (F.col("fp") >= F.col("fv"))
    ).select((F.unix_micros("fp") - F.unix_micros("fv")).alias("latency_us"))
    div = "CAST(1000000 AS DOUBLE)"
    return conv.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.round(F.expr(f"percentile(latency_us, 0.5) / {div}"), 2).alias("p50_seconds"),
        F.round(F.expr(f"percentile(latency_us, 0.9) / {div}"), 2).alias("p90_seconds"),
        F.round(F.expr(f"MIN(latency_us) / {div}"), 2).alias("min_seconds"),
        F.round(F.expr(f"MAX(latency_us) / {div}"), 2).alias("max_seconds"),
    )


@register(
    "session_path_patterns",
    oracle="""
    WITH ordered AS (
      SELECT user_id,
             string_agg(substring(event_type, 1, 1), '' ORDER BY ts, event_id) AS path
      FROM events GROUP BY user_id)
    SELECT
      COUNT(*) AS n_users,
      SUM(len(regexp_extract_all(path, 'vc'))) AS view_click,
      SUM(len(regexp_extract_all(path, 'vp'))) AS view_purchase_direct,
      SUM(len(regexp_extract_all(path, 'vcp'))) AS view_click_purchase,
      SUM(CASE WHEN path LIKE '%p%' THEN 1 ELSE 0 END) AS users_with_purchase,
      SUM(len(regexp_extract_all(path, 'ee'))) AS error_bursts
    FROM ordered
    """,
)
def session_path_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral path mining: per-user event sequences collapsed to a
    first-letter path string (deterministic (ts, event_id) order), then
    regex pattern counts over the paths — the sequence-motif query
    (view→click→purchase funnels, error bursts) that is awkward as joins
    but one regexp over an ordered aggregation. Non-overlapping match
    semantics agree between Spark regexp_count and DuckDB
    regexp_extract_all."""
    ev = _t(spark, sf_dir, "events")
    ordered = ev.groupBy("user_id").agg(
        F.concat_ws(
            "",
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.struct("ts", "event_id", F.substring("event_type", 1, 1).alias("c"))
                    )
                ),
                lambda s: s["c"],
            ),
        ).alias("path")
    )
    return ordered.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.expr("regexp_count(path, 'vc')")).alias("view_click"),
        F.sum(F.expr("regexp_count(path, 'vp')")).alias("view_purchase_direct"),
        F.sum(F.expr("regexp_count(path, 'vcp')")).alias("view_click_purchase"),
        F.sum(F.when(F.col("path").contains("p"), 1).otherwise(0)).alias(
            "users_with_purchase"
        ),
        F.sum(F.expr("regexp_count(path, 'ee')")).alias("error_bursts"),
    )


def _bm25_oracle(terms=("scan", "hash", "customer"), k1=1.2, b=0.75, topn=15) -> str:
    score_cols = ",\n             ".join(
        f"""COALESCE(MAX(CASE WHEN tf.t = '{t}' THEN
               idf * (tf * CAST({k1 + 1} AS DOUBLE)) /
                     (tf + CAST({k1} AS DOUBLE) *
                      (CAST({1 - b} AS DOUBLE) + CAST({b} AS DOUBLE) *
                       dl / avgdl)) END), CAST(0 AS DOUBLE)) AS s{i}"""
        for i, t in enumerate(terms)
    )
    total = " + ".join(f"s{i}" for i in range(len(terms)))
    terms_sql = ", ".join(f"'{t}'" for t in terms)
    return f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS t
      FROM documents WHERE trim(text) <> ''),
    dl AS (SELECT doc_id, CAST(COUNT(*) AS DOUBLE) AS dl FROM tok GROUP BY doc_id),
    stats AS (
      SELECT CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl,
             CAST(COUNT(*) AS BIGINT) AS n FROM dl),
    tf AS (
      SELECT doc_id, t, CAST(COUNT(*) AS DOUBLE) AS tf FROM tok
      WHERE t IN ({terms_sql}) GROUP BY doc_id, t),
    dfreq AS (SELECT t, COUNT(*) AS df FROM tf GROUP BY t),
    idf AS (
      SELECT t, ROUND(ln((CAST((SELECT n FROM stats) AS DOUBLE) -
                          CAST(df AS DOUBLE) + CAST(0.5 AS DOUBLE)) /
                         (CAST(df AS DOUBLE) + CAST(0.5 AS DOUBLE)) +
                         CAST(1 AS DOUBLE)), 6) AS idf
      FROM dfreq),
    scored AS (
      SELECT tf.doc_id,
             {score_cols}
      FROM tf
      JOIN idf ON idf.t = tf.t
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN (SELECT avgdl FROM stats)
      GROUP BY tf.doc_id)
    SELECT doc_id, ROUND({total}, 6) AS bm25
    FROM scored
    ORDER BY bm25 DESC, doc_id
    LIMIT {topn}
    """


@register("bm25_search_topk", oracle=_bm25_oracle())
def bm25_search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval for a fixed 3-term query ('scan hash
    customer'), top-15. Per-term partial scores aggregate as conditional
    maxes and add in a FIXED order (not a float sum over a shuffled
    join), and idf is rounded before use — so the ranking function is
    bit-stable and the whole scorer hash-matches DuckDB. The tf table is
    pre-filtered to the query terms: at scale this is an inverted-index
    probe, not a corpus scan."""
    terms, k1, b, topn = ("scan", "hash", "customer"), 1.2, 0.75, 15
    docs = _t(spark, sf_dir, "documents")
    tok = docs.filter(F.trim(F.col("text")) != "").select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("t"),
    )
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).cast("double").alias("dl"))
    stats = dl.agg(
        (F.sum("dl").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "avgdl"
        ),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    tf = (
        tok.filter(F.col("t").isin(*terms))
        .groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    dfreq = tf.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    idf = dfreq.join(F.broadcast(stats)).select(
        "t",
        F.round(
            F.log(
                (
                    F.col("n").cast("double")
                    - F.col("df").cast("double")
                    + F.lit(0.5)
                )
                / (F.col("df").cast("double") + F.lit(0.5))
                + F.lit(1.0)
            ),
            6,
        ).alias("idf"),
    )
    per_term = (
        tf.join(F.broadcast(idf), "t")
        .join(dl, "doc_id")
        .join(F.broadcast(stats.select("avgdl")))
        .select(
            "doc_id",
            "t",
            (
                F.col("idf")
                * (F.col("tf") * F.lit(k1 + 1))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (F.lit(1 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
                )
            ).alias("score"),
        )
    )
    score_cols = [
        F.coalesce(
            F.max(F.when(F.col("t") == t, F.col("score"))), F.lit(0.0)
        ).alias(f"s{i}")
        for i, t in enumerate(terms)
    ]
    scored = per_term.groupBy("doc_id").agg(*score_cols)
    total = sum(
        (F.col(f"s{i}") for i in range(1, len(terms))), F.col("s0")
    )
    return (
        scored.select("doc_id", F.round(total, 6).alias("bm25"))
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(topn)
    )


@register(
    "agg_filter_clause_breadth",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
           COUNT(DISTINCT o_custkey) FILTER (WHERE o_totalprice > 100000)
             AS big_spenders,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                      FILTER (WHERE o_orderstatus = 'O'), 2) AS DOUBLE)
             AS open_revenue,
           CAST(MIN(o_orderkey) FILTER (WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00') AS BIGINT)
             AS first_1995_order
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def agg_filter_clause_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate FILTER clause breadth: filtered COUNT/ SUM/ MIN and a
    filtered DISTINCT count in one grouped pass — the ANSI way to compute
    many conditional metrics without self-joins or CASE pyramids; one
    scan, one shuffle, partial aggregation intact."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("COUNT(*) FILTER (WHERE o_orderstatus = 'F')").alias(
                "n_finished"
            ),
            F.expr(
                "COUNT(DISTINCT o_custkey) FILTER (WHERE o_totalprice > 100000)"
            ).alias("big_spenders"),
            F.expr(
                "CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))) "
                "FILTER (WHERE o_orderstatus = 'O'), 2) AS DOUBLE)"
            ).alias("open_revenue"),
            F.expr(
                "CAST(MIN(o_orderkey) FILTER "
                "(WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00') AS BIGINT)"
            ).alias("first_1995_order"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "scd2_point_in_time_lookup",
    oracle="""
    WITH hist AS (
      SELECT user_id, event_id, event_type, ts AS valid_from,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS valid_to
      FROM events WHERE user_id < 50),
    probes AS (
      SELECT unnest([TIMESTAMP '2024-01-10 12:00:00',
                     TIMESTAMP '2024-01-20 00:30:00',
                     TIMESTAMP '2024-01-29 23:00:00']) AS at_ts)
    SELECT p.at_ts, h.user_id, h.event_id, h.event_type
    FROM probes p JOIN hist h
      ON h.valid_from <= p.at_ts
     AND (h.valid_to IS NULL OR h.valid_to > p.at_ts)
    ORDER BY at_ts, user_id
    """,
)
def scd2_point_in_time_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal AS OF) lookup against the SCD2 history:
    for each probe timestamp, the single active row per user — the
    interval-containment join every type-2 dimension serves. The probe
    side broadcasts; validity intervals come from one lead window."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    hist = ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
    )
    probes = spark.createDataFrame(
        [("2024-01-10 12:00:00",), ("2024-01-20 00:30:00",),
         ("2024-01-29 23:00:00",)],
        "at_ts string",
    ).select(F.col("at_ts").cast("timestamp").alias("at_ts"))
    return (
        hist.join(
            F.broadcast(probes),
            (F.col("valid_from") <= F.col("at_ts"))
            & (F.col("valid_to").isNull() | (F.col("valid_to") > F.col("at_ts"))),
        )
        .select("at_ts", "user_id", "event_id", "event_type")
        .orderBy("at_ts", "user_id")
    )


@register(
    "market_basket_lift",
    oracle="""
    WITH ob AS (
      SELECT DISTINCT l.l_orderkey, p.p_brand
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
    n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM ob),
    brand_n AS (SELECT p_brand, COUNT(*) AS n FROM ob GROUP BY p_brand),
    pairs AS (
      SELECT a.p_brand AS brand_a, b.p_brand AS brand_b, COUNT(*) AS n_ab
      FROM ob a JOIN ob b
        ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
      GROUP BY 1, 2)
    SELECT p.brand_a, p.brand_b, p.n_ab,
           ROUND(CAST(p.n_ab AS DOUBLE) / CAST((SELECT n_orders FROM n) AS DOUBLE), 6) AS support,
           ROUND(CAST(p.n_ab AS DOUBLE) / CAST(na.n AS DOUBLE), 6) AS confidence_a_b,
           ROUND(CAST(p.n_ab AS DOUBLE) * CAST((SELECT n_orders FROM n) AS DOUBLE) /
                 (CAST(na.n AS DOUBLE) * CAST(nb.n AS DOUBLE)), 6) AS lift
    FROM pairs p
    JOIN brand_n na ON na.p_brand = p.brand_a
    JOIN brand_n nb ON nb.p_brand = p.brand_b
    WHERE p.n_ab >= 20
    ORDER BY lift DESC, brand_a, brand_b
    LIMIT 25
    """,
)
def market_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule metrics for co-purchased brand pairs: support,
    confidence, and lift from exact integer counts with one final double
    division each. Lift > 1 marks genuinely associated pairs rather than
    merely popular ones — the ranking the co-occurrence count alone gets
    wrong. Brand-count table broadcasts; the pair self-join co-partitions
    on the order key."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    # (order, brand) feeds four consumers (order count, brand counts, and
    # both self-join sides) — materialize the dedup once
    ob = op_cache.track(
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select("l_orderkey", "p_brand")
        .distinct()
        .cache()
    )
    n_orders = ob.select("l_orderkey").distinct().agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    brand_n = ob.groupBy("p_brand").agg(F.count(F.lit(1)).alias("n"))
    a, b = ob.alias("a"), ob.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.p_brand") < F.col("b.p_brand")),
        )
        .groupBy(
            F.col("a.p_brand").alias("brand_a"),
            F.col("b.p_brand").alias("brand_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= 20)
    )
    na = brand_n.select(F.col("p_brand").alias("brand_a"), F.col("n").alias("n_a"))
    nb = brand_n.select(F.col("p_brand").alias("brand_b"), F.col("n").alias("n_b"))
    return (
        pairs.join(F.broadcast(na), "brand_a")
        .join(F.broadcast(nb), "brand_b")
        .join(F.broadcast(n_orders))
        .select(
            "brand_a",
            "brand_b",
            "n_ab",
            F.round(
                F.col("n_ab").cast("double") / F.col("n_orders").cast("double"), 6
            ).alias("support"),
            F.round(
                F.col("n_ab").cast("double") / F.col("n_a").cast("double"), 6
            ).alias("confidence_a_b"),
            F.round(
                F.col("n_ab").cast("double")
                * F.col("n_orders").cast("double")
                / (F.col("n_a").cast("double") * F.col("n_b").cast("double")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "brand_a", "brand_b")
        .limit(25)
    )


@register(
    "decile_migration_matrix",
    oracle="""
    WITH monthly AS (
      SELECT o_custkey, date_trunc('month', o_orderdate) AS mon,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
      FROM orders GROUP BY 1, 2),
    ranked AS (
      SELECT o_custkey, mon,
             ntile(10) OVER (PARTITION BY mon
                             ORDER BY spend DESC, o_custkey) AS decile
      FROM monthly),
    paired AS (
      SELECT o_custkey, mon, decile,
             lag(decile) OVER (PARTITION BY o_custkey ORDER BY mon)
               AS prev_decile
      FROM ranked)
    SELECT prev_decile, decile, COUNT(*) AS n_customers
    FROM paired WHERE prev_decile IS NOT NULL
    GROUP BY prev_decile, decile
    ORDER BY prev_decile, decile
    """,
)
def decile_migration_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer spend-decile migration month over month: monthly DECIMAL
    spend → per-month ntile(10) (deterministic (spend desc, custkey)
    tiebreak) → per-customer lag → transition-count matrix. The churn /
    upsell movement view built from two windows and one aggregate."""
    orders = _t(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        "o_custkey", F.date_trunc("month", "o_orderdate").alias("mon")
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("spend"))
    ranked = monthly.select(
        "o_custkey",
        "mon",
        F.ntile(10)
        .over(
            Window.partitionBy("mon").orderBy(F.desc("spend"), F.col("o_custkey"))
        )
        .alias("decile"),
    )
    paired = ranked.select(
        "decile",
        F.lag("decile")
        .over(Window.partitionBy("o_custkey").orderBy("mon"))
        .alias("prev_decile"),
    ).filter(F.col("prev_decile").isNotNull())
    return (
        paired.groupBy("prev_decile", "decile")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("prev_decile", "decile")
    )


@register(
    "theil_sen_revenue_trend",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
      FROM orders GROUP BY 1),
    slopes AS (
      SELECT (b.rev - a.rev) /
             CAST(date_diff('day', a.day, b.day) AS DOUBLE) AS slope
      FROM daily a JOIN daily b ON a.day < b.day)
    SELECT COUNT(*) AS n_pairs,
           ROUND(quantile_cont(slope, 0.5), 4) AS theil_sen_slope,
           ROUND(MIN(slope), 4) AS min_slope,
           ROUND(MAX(slope), 4) AS max_slope
    FROM slopes
    """,
)
def theil_sen_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend estimate of daily revenue: the median of
    all pairwise slopes — immune to outlier days that wreck least
    squares. Slopes come from exact DECIMAL daily sums cast once to
    DOUBLE over integer day gaps, so every slope is bit-identical and
    the median interpolation matches. The O(days²) pair join is over the
    tiny daily aggregate, never the fact table."""
    orders = _t(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("rev")
    )
    a, b = daily.alias("a"), daily.alias("b")
    slopes = a.join(b, F.col("a.day") < F.col("b.day")).select(
        (
            (F.col("b.rev") - F.col("a.rev"))
            / F.datediff(F.col("b.day"), F.col("a.day")).cast("double")
        ).alias("slope")
    )
    return slopes.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.expr("percentile(slope, 0.5)"), 4).alias("theil_sen_slope"),
        F.round(F.min("slope"), 4).alias("min_slope"),
        F.round(F.max("slope"), 4).alias("max_slope"),
    )


@register(
    "cohort_ltv_curve",
    oracle="""
    WITH firsts AS (
      SELECT user_id, MIN(ts) AS first_ts FROM events GROUP BY user_id),
    aged AS (
      SELECT f.user_id,
             date_trunc('week', f.first_ts) AS cohort_week,
             CAST(date_diff('day', CAST(f.first_ts AS DATE), CAST(e.ts AS DATE)) // 7
                  AS BIGINT) AS age_weeks,
             CAST(e.value AS DECIMAL(18,4)) AS v
      FROM events e JOIN firsts f ON f.user_id = e.user_id
      WHERE e.event_type = 'purchase'),
    weekly AS (
      SELECT cohort_week, age_weeks, SUM(v) AS rev
      FROM aged GROUP BY 1, 2)
    SELECT cohort_week, age_weeks,
           CAST(ROUND(SUM(rev) OVER (PARTITION BY cohort_week ORDER BY age_weeks), 2)
                AS DOUBLE) AS cum_revenue
    FROM weekly
    ORDER BY cohort_week, age_weeks
    """,
)
def cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curve: users grouped by first-seen week,
    purchase revenue bucketed by account age in weeks, accumulated per
    cohort with a running-sum window — the LTV payback view. Revenue
    stays DECIMAL through the cumulative window (bit-stable), cast to
    DOUBLE only in the final report."""
    ev = _t(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    purchases = ev.filter(F.col("event_type") == "purchase")
    aged = purchases.join(firsts, "user_id").select(
        F.date_trunc("week", "first_ts").cast("date").alias("cohort_week"),
        (
            F.datediff(F.col("ts").cast("date"), F.col("first_ts").cast("date"))
            / F.lit(7)
        )
        .cast("bigint")
        .alias("age_weeks"),
        F.col("value").cast("decimal(18,4)").alias("v"),
    )
    weekly = aged.groupBy("cohort_week", "age_weeks").agg(F.sum("v").alias("rev"))
    w = Window.partitionBy("cohort_week").orderBy("age_weeks")
    return weekly.select(
        "cohort_week",
        "age_weeks",
        F.round(F.sum("rev").over(w), 2).cast("double").alias("cum_revenue"),
    ).orderBy("cohort_week", "age_weeks")


def _entropy_terms_sql(types=("click", "error", "purchase", "signup", "view")) -> str:
    # fixed-order sum of -p*ln(p) terms, one per known event type; zero
    # counts contribute 0 (CASE guard), so no NULL propagation
    return " + ".join(
        f"""(CASE WHEN n_{t} = 0 THEN CAST(0 AS DOUBLE)
             ELSE -(CAST(n_{t} AS DOUBLE) / CAST(n AS DOUBLE)) *
                   ln(CAST(n_{t} AS DOUBLE) / CAST(n AS DOUBLE)) END)"""
        for t in types
    )


@register(
    "user_activity_entropy",
    oracle=f"""
    WITH counts AS (
      SELECT user_id,
             COUNT(*) AS n,
             {", ".join(f"COUNT(*) FILTER (WHERE event_type = '{t}') AS n_{t}"
                        for t in ("click", "error", "purchase", "signup", "view"))}
      FROM events GROUP BY user_id)
    SELECT user_id, n,
           ROUND({_entropy_terms_sql()}, 6) AS entropy
    FROM counts
    ORDER BY entropy DESC, user_id
    LIMIT 20
    """,
)
def user_activity_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each user's event-type mix — the classic
    behavioral diversity feature. Per-type counts pivot via FILTER
    aggregates and the -p·ln(p) terms add in a FIXED order over the
    known type vocabulary, so the float arithmetic is bit-identical
    across engines (a float sum over grouped rows would not be)."""
    types = ("click", "error", "purchase", "signup", "view")
    ev = _t(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.expr(f"COUNT(*) FILTER (WHERE event_type = '{t}')").alias(f"n_{t}")
            for t in types
        ],
    )
    return (
        counts.select(
            "user_id", "n", F.round(F.expr(_entropy_terms_sql(types)), 6).alias("entropy")
        )
        .orderBy(F.desc("entropy"), "user_id")
        .limit(20)
    )


@register(
    "orders_dow_seasonality",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             dayofweek(CAST(o_orderdate AS DATE)) AS dow,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY 1, 2),
    stats AS (
      SELECT dow, SUM(rev) AS dow_rev, COUNT(*) AS n_days FROM daily GROUP BY dow),
    total AS (
      SELECT SUM(dow_rev) AS all_rev, SUM(n_days) AS all_days FROM stats)
    SELECT s.dow, s.n_days,
           CAST(ROUND(s.dow_rev / s.n_days, 2) AS DOUBLE) AS avg_daily_rev,
           ROUND((CAST(s.dow_rev AS DOUBLE) / CAST(s.n_days AS DOUBLE)) /
                 (CAST((SELECT all_rev FROM total) AS DOUBLE) /
                  CAST((SELECT all_days FROM total) AS DOUBLE)), 6) AS seasonality_index
    FROM stats s
    ORDER BY s.dow
    """,
)
def orders_dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality index: average daily revenue per weekday
    relative to the overall daily average (index 1.0 = typical day).
    Daily sums stay DECIMAL; the index divides two exactly-derived
    doubles once. DuckDB dayofweek is 0-6 Sunday-first; Spark's
    dayofweek is 1-7, so the Spark side subtracts 1 to align."""
    orders = _t(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day"),
        (F.dayofweek(F.col("o_orderdate").cast("date")) - 1).alias("dow"),
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
    stats = daily.groupBy("dow").agg(
        F.sum("rev").alias("dow_rev"), F.count(F.lit(1)).alias("n_days")
    )
    total = stats.agg(
        F.sum("dow_rev").alias("all_rev"), F.sum("n_days").alias("all_days")
    )
    return (
        stats.join(F.broadcast(total))
        .select(
            "dow",
            "n_days",
            F.round(F.col("dow_rev") / F.col("n_days"), 2)
            .cast("double")
            .alias("avg_daily_rev"),
            F.round(
                (F.col("dow_rev").cast("double") / F.col("n_days").cast("double"))
                / (
                    F.col("all_rev").cast("double")
                    / F.col("all_days").cast("double")
                ),
                6,
            ).alias("seasonality_index"),
        )
        .orderBy("dow")
    )


@register(
    "user_interevent_gap_stats",
    oracle="""
    WITH gaps AS (
      SELECT user_id,
             epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id
                                                   ORDER BY ts, event_id)) AS gap_us
      FROM events),
    g AS (SELECT user_id, gap_us FROM gaps WHERE gap_us IS NOT NULL)
    SELECT user_id,
           COUNT(*) AS n_gaps,
           ROUND(quantile_cont(gap_us, 0.5) / CAST(3600000000 AS DOUBLE), 4)
             AS median_gap_hours,
           ROUND(CAST(MIN(gap_us) AS DOUBLE) / CAST(3600000000 AS DOUBLE), 4)
             AS min_gap_hours,
           ROUND(CAST(MAX(gap_us) AS DOUBLE) / CAST(3600000000 AS DOUBLE), 4)
             AS max_gap_hours
    FROM g
    GROUP BY user_id
    HAVING COUNT(*) >= 10
    ORDER BY user_id
    """,
)
def user_interevent_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-event gap distribution (median/min/max hours) from
    exact microsecond lag differences — the activity-cadence feature
    behind churn models. One per-user window, one grouped percentile;
    interpolation over exact integers is bit-stable."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "user_id",
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    hours = "CAST(3600000000 AS DOUBLE)"
    return (
        gaps.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.round(
                F.expr(f"percentile(gap_us, 0.5) / {hours}"), 4
            ).alias("median_gap_hours"),
            F.round(F.expr(f"CAST(MIN(gap_us) AS DOUBLE) / {hours}"), 4).alias(
                "min_gap_hours"
            ),
            F.round(F.expr(f"CAST(MAX(gap_us) AS DOUBLE) / {hours}"), 4).alias(
                "max_gap_hours"
            ),
        )
        .filter(F.col("n_gaps") >= 10)
        .orderBy("user_id")
    )


@register(
    "events_burst_minutes",
    oracle="""
    WITH per_min AS (
      SELECT date_trunc('minute', ts) AS minute, COUNT(*) AS c
      FROM events GROUP BY 1),
    moments AS (
      SELECT COUNT(*) AS n, SUM(c) AS s, SUM(c * c) AS ss FROM per_min)
    SELECT p.minute, p.c AS n_events,
           ROUND((CAST(p.c AS DOUBLE) - CAST(m.s AS DOUBLE) / CAST(m.n AS DOUBLE)) /
                 sqrt((CAST(m.ss AS DOUBLE) - CAST(m.s AS DOUBLE) *
                       CAST(m.s AS DOUBLE) / CAST(m.n AS DOUBLE)) /
                      CAST(m.n - 1 AS DOUBLE)), 4) AS z
    FROM per_min p CROSS JOIN moments m
    WHERE (CAST(p.c AS DOUBLE) - CAST(m.s AS DOUBLE) / CAST(m.n AS DOUBLE)) /
          sqrt((CAST(m.ss AS DOUBLE) - CAST(m.s AS DOUBLE) *
                CAST(m.s AS DOUBLE) / CAST(m.n AS DOUBLE)) /
               CAST(m.n - 1 AS DOUBLE)) > CAST(3 AS DOUBLE)
    ORDER BY minute
    """,
)
def events_burst_minutes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traffic-burst detection: minute-bucket counts flagged when more
    than 3 sample standard deviations above the mean. The moments (n,
    Σc, Σc²) are exact integers, so mean/stddev — and therefore every
    flag decision — are bit-identical; no per-row float aggregation."""
    ev = _t(spark, sf_dir, "events")
    per_min = ev.groupBy(
        F.date_trunc("minute", "ts").alias("minute")
    ).agg(F.count(F.lit(1)).alias("c"))
    moments = per_min.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("ss"),
    )
    mean = F.col("s").cast("double") / F.col("n").cast("double")
    var = (
        F.col("ss").cast("double")
        - F.col("s").cast("double") * F.col("s").cast("double") / F.col("n").cast("double")
    ) / (F.col("n") - 1).cast("double")
    z = (F.col("c").cast("double") - mean) / F.sqrt(var)
    return (
        per_min.join(F.broadcast(moments))
        .filter(z > F.lit(3).cast("double"))
        .select("minute", F.col("c").alias("n_events"), F.round(z, 4).alias("z"))
        .orderBy("minute")
    )


@register(
    "shipping_delay_stats",
    oracle="""
    WITH delays AS (
      SELECT o.o_orderpriority,
             date_diff('day', CAST(o.o_orderdate AS DATE),
                       CAST(l.l_shipdate AS DATE)) AS delay_days
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey)
    SELECT o_orderpriority,
           COUNT(*) AS n_lines,
           ROUND(quantile_cont(delay_days, 0.5), 2) AS p50_days,
           ROUND(quantile_cont(delay_days, 0.95), 2) AS p95_days,
           CAST(MAX(delay_days) AS BIGINT) AS max_days,
           SUM(CASE WHEN delay_days > 90 THEN 1 ELSE 0 END) AS n_late
    FROM delays
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def shipping_delay_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency KPI per priority class: integer day deltas
    through interpolated percentiles plus an SLA-breach count. The
    orders-lineitem join shuffles once on the order key; everything
    after is one grouped aggregate."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    delays = orders.join(li, orders.o_orderkey == li.l_orderkey).select(
        "o_orderpriority",
        F.datediff(
            F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
        ).alias("delay_days"),
    )
    return (
        delays.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.expr("percentile(delay_days, 0.5)"), 2).alias("p50_days"),
            F.round(F.expr("percentile(delay_days, 0.95)"), 2).alias("p95_days"),
            F.max("delay_days").cast("bigint").alias("max_days"),
            F.sum(F.when(F.col("delay_days") > 90, 1).otherwise(0)).alias("n_late"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "customer_rfm_segments",
    oracle="""
    WITH rfm AS (
      SELECT o_custkey,
             date_diff('day', CAST(MAX(o_orderdate) AS DATE),
                       DATE '1998-12-31') AS recency_days,
             COUNT(*) AS frequency,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary
      FROM orders GROUP BY o_custkey),
    scored AS (
      SELECT o_custkey,
             ntile(5) OVER (ORDER BY recency_days ASC, o_custkey) AS r,
             ntile(5) OVER (ORDER BY frequency DESC, o_custkey) AS f,
             ntile(5) OVER (ORDER BY monetary DESC, o_custkey) AS m
      FROM rfm)
    SELECT r, f, m, COUNT(*) AS n_customers,
           CAST(MIN(o_custkey) AS BIGINT) AS example_customer
    FROM scored
    GROUP BY r, f, m
    ORDER BY r, f, m
    """,
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: recency (days before a fixed reference date),
    frequency, and DECIMAL monetary value per customer, each cut into
    quintiles with deterministic customer-id tiebreaks, then segment
    sizes — the classic marketing cube, 125 cells max. Single scan, one
    aggregate, three windows over the small per-customer table."""
    orders = _t(spark, sf_dir, "orders")
    rfm = orders.groupBy("o_custkey").agg(
        F.datediff(
            F.lit("1998-12-31").cast("date"),
            F.max("o_orderdate").cast("date"),
        ).alias("recency_days"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("monetary"),
    )
    scored = rfm.select(
        "o_custkey",
        F.ntile(5).over(Window.orderBy(F.asc("recency_days"), F.col("o_custkey"))).alias("r"),
        F.ntile(5).over(Window.orderBy(F.desc("frequency"), F.col("o_custkey"))).alias("f"),
        F.ntile(5).over(Window.orderBy(F.desc("monetary"), F.col("o_custkey"))).alias("m"),
    )
    return (
        scored.groupBy("r", "f", "m")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.min("o_custkey").cast("bigint").alias("example_customer"),
        )
        .orderBy("r", "f", "m")
    )


@register(
    "events_slo_burn_rate",
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS hour,
             COUNT(*) AS n,
             COUNT(*) FILTER (WHERE event_type = 'error') AS n_err
      FROM events GROUP BY 1),
    windowed AS (
      SELECT hour, n, n_err,
             SUM(n) OVER w6 AS n_6h, SUM(n_err) OVER w6 AS err_6h
      FROM hourly
      WINDOW w6 AS (ORDER BY hour ROWS BETWEEN 5 PRECEDING AND CURRENT ROW))
    SELECT hour, n, n_err,
           ROUND((CAST(n_err AS DOUBLE) / CAST(n AS DOUBLE)) /
                 CAST(0.2 AS DOUBLE), 4) AS burn_1h,
           ROUND((CAST(err_6h AS DOUBLE) / CAST(n_6h AS DOUBLE)) /
                 CAST(0.2 AS DOUBLE), 4) AS burn_6h
    FROM windowed
    WHERE (CAST(n_err AS DOUBLE) / CAST(n AS DOUBLE)) /
          CAST(0.2 AS DOUBLE) > CAST(1 AS DOUBLE)
    ORDER BY hour
    """,
)
def events_slo_burn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-window SLO burn rate (SRE alerting): hourly error ratio over
    a 20% error budget, with the 6-hour window alongside so a one-hour
    spike can be distinguished from sustained burn. Counts stay integer
    until the single ratio division; flagged hours are those burning
    budget faster than 1x."""
    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("hour")).agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("COUNT(*) FILTER (WHERE event_type = 'error')").alias("n_err"),
    )
    w6 = Window.orderBy("hour").rowsBetween(-5, 0)
    windowed = hourly.select(
        "hour",
        "n",
        "n_err",
        F.sum("n").over(w6).alias("n_6h"),
        F.sum("n_err").over(w6).alias("err_6h"),
    )
    slo = F.lit(0.2).cast("double")
    burn1 = (F.col("n_err").cast("double") / F.col("n").cast("double")) / slo
    burn6 = (F.col("err_6h").cast("double") / F.col("n_6h").cast("double")) / slo
    return (
        windowed.filter(burn1 > F.lit(1).cast("double"))
        .select(
            "hour",
            "n",
            "n_err",
            F.round(burn1, 4).alias("burn_1h"),
            F.round(burn6, 4).alias("burn_6h"),
        )
        .orderBy("hour")
    )


@register(
    "supplier_concentration_hhi",
    oracle="""
    WITH rev AS (
      SELECT p.p_brand, l.l_suppkey,
             SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS r
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1, 2),
    agg AS (
      SELECT p_brand,
             COUNT(*) AS n_suppliers,
             SUM(r) AS total,
             SUM(r * r) AS total_sq
      FROM rev GROUP BY p_brand)
    SELECT p_brand, n_suppliers,
           ROUND(CAST(total_sq AS DOUBLE) /
                 (CAST(total AS DOUBLE) * CAST(total AS DOUBLE)), 6) AS hhi
    FROM agg
    ORDER BY hhi DESC, p_brand
    LIMIT 15
    """,
)
def supplier_concentration_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supply-chain concentration risk: the Herfindahl-Hirschman index of
    supplier revenue share per part brand, computed as Σr²/(Σr)² with
    BOTH sums in exact DECIMAL — so no float share is ever summed and
    the index is bit-stable. HHI near 1 = single-supplier brand (the
    procurement red flag); near 1/n = evenly spread."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    rev = (
        li.join(F.broadcast(part), part.p_partkey == li.l_partkey)
        .groupBy("p_brand", "l_suppkey")
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("r"))
    )
    agg = rev.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.sum("r").alias("total"),
        F.sum(F.col("r") * F.col("r")).alias("total_sq"),
    )
    return (
        agg.select(
            "p_brand",
            "n_suppliers",
            F.round(
                F.col("total_sq").cast("double")
                / (F.col("total").cast("double") * F.col("total").cast("double")),
                6,
            ).alias("hhi"),
        )
        .orderBy(F.desc("hhi"), "p_brand")
        .limit(15)
    )


@register(
    "nation_trade_balance",
    oracle="""
    WITH flows AS (
      SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
             SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
                 CAST(1 - l.l_discount AS DECIMAL(9,4))) AS volume
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation sn ON sn.n_nationkey = s.s_nationkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation cn ON cn.n_nationkey = c.c_nationkey
      WHERE sn.n_name <> cn.n_name
      GROUP BY 1, 2),
    exports AS (
      SELECT supp_nation AS nation, SUM(volume) AS exports FROM flows GROUP BY 1),
    imports AS (
      SELECT cust_nation AS nation, SUM(volume) AS imports FROM flows GROUP BY 1)
    SELECT COALESCE(e.nation, i.nation) AS nation,
           CAST(ROUND(COALESCE(e.exports, 0), 2) AS DOUBLE) AS exports,
           CAST(ROUND(COALESCE(i.imports, 0), 2) AS DOUBLE) AS imports,
           CAST(ROUND(COALESCE(e.exports, 0) - COALESCE(i.imports, 0), 2) AS DOUBLE)
             AS balance
    FROM exports e FULL OUTER JOIN imports i ON e.nation = i.nation
    ORDER BY nation
    """,
)
def nation_trade_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-nation trade balance: discounted line revenue flows from
    supplier nation to customer nation (intra-nation flows excluded),
    folded into per-nation exports, imports, and balance via a full
    outer join — Q7's flow matrix taken one step further. All sums in
    exact DECIMAL, dimensions broadcast, the fact shuffles once per
    grouping key."""
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    sn = nat.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = nat.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    flows = (
        li.join(F.broadcast(sup), sup.s_suppkey == li.l_suppkey)
        .join(F.broadcast(sn), F.col("sn_key") == sup.s_nationkey)
        .join(orders, orders.o_orderkey == li.l_orderkey)
        .join(F.broadcast(cust), cust.c_custkey == orders.o_custkey)
        .join(F.broadcast(cn), F.col("cn_key") == cust.c_nationkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount")).cast("decimal(9,4)")
            ).alias("volume")
        )
    )
    exports = flows.groupBy(F.col("supp_nation").alias("nation")).agg(
        F.sum("volume").alias("exports")
    )
    imports = flows.groupBy(F.col("cust_nation").alias("nation")).agg(
        F.sum("volume").alias("imports")
    )
    zero = F.lit(0).cast("decimal(38,6)")
    return (
        exports.join(imports, "nation", "full_outer")
        .select(
            "nation",
            F.round(F.coalesce(F.col("exports"), zero), 2)
            .cast("double")
            .alias("exports"),
            F.round(F.coalesce(F.col("imports"), zero), 2)
            .cast("double")
            .alias("imports"),
            F.round(
                F.coalesce(F.col("exports"), zero)
                - F.coalesce(F.col("imports"), zero),
                2,
            )
            .cast("double")
            .alias("balance"),
        )
        .orderBy("nation")
    )


@register(
    "doc_readability",
    oracle="""
    WITH stats AS (
      SELECT doc_id,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_words,
             GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1) AS n_sentences,
             len(regexp_extract_all(lower(text), '[aeiouy]+')) AS n_vowel_groups
      FROM documents)
    SELECT doc_id, n_words, n_sentences, n_vowel_groups,
           ROUND(CAST(206.835 AS DOUBLE) -
                 CAST(1.015 AS DOUBLE) * (CAST(n_words AS DOUBLE) /
                                          CAST(n_sentences AS DOUBLE)) -
                 CAST(84.6 AS DOUBLE) * (CAST(n_vowel_groups AS DOUBLE) /
                                         CAST(GREATEST(n_words, 1) AS DOUBLE)),
                 4) AS flesch_proxy
    FROM stats
    ORDER BY flesch_proxy DESC, doc_id
    LIMIT 25
    """,
)
def doc_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch-reading-ease proxy per document: words/sentence and a
    vowel-group syllable proxy, all from regexp counts (integers) pushed
    through the fixed formula once — deterministic, no linguistic
    libraries. The 'too hard / too easy' band is a standard
    training-data quality filter."""
    docs = _t(spark, sf_dir, "documents")
    n_words = F.when(F.trim(F.col("text")) == "", 0).otherwise(
        F.size(F.split(F.trim(F.col("text")), r"\s+"))
    )
    n_sent = F.greatest(F.expr("regexp_count(text, '[.!?]+')"), F.lit(1))
    n_vg = F.expr("regexp_count(lower(text), '[aeiouy]+')")
    stats = docs.select(
        "doc_id",
        n_words.alias("n_words"),
        n_sent.alias("n_sentences"),
        n_vg.alias("n_vowel_groups"),
    )
    score = F.round(
        F.lit(206.835).cast("double")
        - F.lit(1.015).cast("double")
        * (F.col("n_words").cast("double") / F.col("n_sentences").cast("double"))
        - F.lit(84.6).cast("double")
        * (
            F.col("n_vowel_groups").cast("double")
            / F.greatest(F.col("n_words"), F.lit(1)).cast("double")
        ),
        4,
    )
    return (
        stats.select(
            "doc_id", "n_words", "n_sentences", "n_vowel_groups",
            score.alias("flesch_proxy"),
        )
        .orderBy(F.desc("flesch_proxy"), "doc_id")
        .limit(25)
    )


@register(
    "keyword_in_context",
    oracle="""
    WITH hits AS (
      SELECT doc_id, text,
             position('customer' IN lower(text)) AS pos
      FROM documents
      WHERE position('customer' IN lower(text)) > 0)
    SELECT doc_id, pos,
           substring(text, GREATEST(pos - 20, 1),
                     pos - GREATEST(pos - 20, 1)) AS left_ctx,
           substring(text, pos, 8) AS keyword,
           substring(text, pos + 8, 20) AS right_ctx
    FROM hits
    ORDER BY doc_id
    LIMIT 50
    """,
)
def keyword_in_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KWIC (keyword-in-context) concordance for a fixed term: first
    occurrence position via `position`, left/right context windows via
    arithmetic substrings — the corpus-inspection tool, entirely
    JVM-side string ops with identical 1-based substring semantics in
    both engines."""
    docs = _t(spark, sf_dir, "documents")
    pos = F.expr("position('customer' IN lower(text))")
    hits = docs.select("doc_id", "text", pos.alias("pos")).filter(
        F.col("pos") > 0
    )
    left_start = F.greatest(F.col("pos") - 20, F.lit(1))
    return (
        hits.select(
            "doc_id",
            "pos",
            F.expr(
                "substring(text, GREATEST(pos - 20, 1), pos - GREATEST(pos - 20, 1))"
            ).alias("left_ctx"),
            F.expr("substring(text, pos, 8)").alias("keyword"),
            F.expr("substring(text, pos + 8, 20)").alias("right_ctx"),
        )
        .orderBy("doc_id")
        .limit(50)
    )


@register(
    "active_user_stickiness",
    oracle="""
    WITH dau AS (
      SELECT CAST(ts AS DATE) AS day, COUNT(DISTINCT user_id) AS dau
      FROM events GROUP BY 1),
    wau AS (
      SELECT date_trunc('week', ts) AS week, COUNT(DISTINCT user_id) AS wau
      FROM events GROUP BY 1),
    mau AS (SELECT COUNT(DISTINCT user_id) AS mau FROM events)
    SELECT d.day, d.dau,
           w.wau,
           (SELECT mau FROM mau) AS mau,
           ROUND(CAST(d.dau AS DOUBLE) / CAST((SELECT mau FROM mau) AS DOUBLE), 6)
             AS stickiness
    FROM dau d
    JOIN wau w ON w.week = date_trunc('week', CAST(d.day AS TIMESTAMP))
    ORDER BY d.day
    """,
)
def active_user_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU/MAU growth metrics with the DAU/MAU stickiness ratio —
    three distinct-count grains joined back to the daily spine. Each
    grain is one hash-distinct aggregate; the week/month tables are tiny
    and broadcast."""
    ev = _t(spark, sf_dir, "events")
    dau = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.countDistinct("user_id").alias("dau")
    )
    wau = ev.groupBy(F.date_trunc("week", "ts").alias("week")).agg(
        F.countDistinct("user_id").alias("wau")
    )
    mau = ev.agg(F.countDistinct("user_id").alias("mau"))
    return (
        dau.join(
            F.broadcast(wau),
            wau.week == F.date_trunc("week", F.col("day").cast("timestamp")),
        )
        .join(F.broadcast(mau))
        .select(
            "day",
            "dau",
            "wau",
            "mau",
            F.round(
                F.col("dau").cast("double") / F.col("mau").cast("double"), 6
            ).alias("stickiness"),
        )
        .orderBy("day")
    )


@register(
    "repeat_purchase_distribution",
    oracle="""
    WITH freq AS (
      SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey),
    hist AS (
      SELECT n_orders, COUNT(*) AS n_customers FROM freq GROUP BY n_orders),
    tot AS (SELECT SUM(n_customers) AS total FROM hist)
    SELECT n_orders, n_customers,
           ROUND(CAST(n_customers AS DOUBLE) /
                 CAST((SELECT total FROM tot) AS DOUBLE), 6) AS share,
           CAST(SUM(n_customers) OVER (ORDER BY n_orders) AS BIGINT) AS cum_customers
    FROM hist
    ORDER BY n_orders
    """,
)
def repeat_purchase_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase histogram: how many customers placed exactly N
    orders, with share and cumulative counts — the retention shape every
    commerce dashboard opens with. Two nested integer aggregates and one
    running-sum window over the tiny histogram."""
    orders = _t(spark, sf_dir, "orders")
    freq = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_orders"))
    hist = freq.groupBy("n_orders").agg(F.count(F.lit(1)).alias("n_customers"))
    tot = hist.agg(F.sum("n_customers").alias("total"))
    w = Window.orderBy("n_orders")
    return (
        hist.join(F.broadcast(tot))
        .select(
            "n_orders",
            "n_customers",
            F.round(
                F.col("n_customers").cast("double") / F.col("total").cast("double"),
                6,
            ).alias("share"),
            F.sum("n_customers").over(w).cast("bigint").alias("cum_customers"),
        )
        .orderBy("n_orders")
    )


@register(
    "embedding_dimension_stats",
    oracle="""
    WITH vals AS (
      SELECT unnest(range(1, len(embedding)+1)) AS dim,
             unnest([CAST(ROUND(CAST(x AS DOUBLE), 6) AS DECIMAL(12,6))
                     FOR x IN embedding]) AS v
      FROM embeddings)
    SELECT dim, COUNT(*) AS n,
           ROUND(CAST(SUM(v) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS mean_v,
           CAST(MIN(v) AS DOUBLE) AS min_v,
           CAST(MAX(v) AS DOUBLE) AS max_v
    FROM vals GROUP BY dim
    ORDER BY dim
    """,
)
def embedding_dimension_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding statistics (mean/min/max across the
    corpus) — the hygiene view that exposes dead dimensions, scale
    drift, or a miswired encoder. Each float rounds into DECIMAL before
    the column sums, so the per-dimension means are exact and identical
    under any row ordering; min/max are order-free anyway."""
    emb = _t(spark, sf_dir, "embeddings")
    vals = emb.select(
        F.posexplode(
            F.expr(
                "transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE), 6) AS DECIMAL(12,6)))"
            )
        ).alias("dim0", "v")
    ).select((F.col("dim0") + 1).alias("dim"), "v")
    return (
        vals.groupBy("dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum("v").cast("double") / F.count(F.lit(1)).cast("double"), 6
            ).alias("mean_v"),
            F.min("v").cast("double").alias("min_v"),
            F.max("v").cast("double").alias("max_v"),
        )
        .orderBy("dim")
    )


@register(
    "orders_gini_coefficient",
    oracle="""
    WITH spend AS (
      SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS x
      FROM orders GROUP BY o_custkey),
    ranked AS (
      SELECT x, ROW_NUMBER() OVER (ORDER BY x, o_custkey) AS i FROM spend),
    sums AS (
      SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(x * i) AS sxi FROM ranked)
    SELECT n,
           CAST(ROUND(sx, 2) AS DOUBLE) AS total_spend,
           ROUND(CAST(2 AS DOUBLE) * CAST(sxi AS DOUBLE) /
                 (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE)) -
                 (CAST(n AS DOUBLE) + CAST(1 AS DOUBLE)) / CAST(n AS DOUBLE),
                 6) AS gini
    FROM sums
    """,
)
def orders_gini_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer spend — the revenue-inequality KPI.
    Uses the rank formulation G = 2·Σi·x(i)/(n·Σx) − (n+1)/n over spend
    sorted ascending with a customer-id tiebreak; Σx and Σi·x stay exact
    DECIMAL so the one double evaluation at the end is bit-stable."""
    orders = _t(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("x")
    )
    ranked = spend.select(
        "x",
        F.row_number()
        .over(Window.orderBy(F.col("x"), F.col("o_custkey")))
        .alias("i"),
    )
    sums = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("i")).alias("sxi"),
    )
    nd = F.col("n").cast("double")
    gini = F.round(
        F.lit(2).cast("double")
        * F.col("sxi").cast("double")
        / (nd * F.col("sx").cast("double"))
        - (nd + F.lit(1).cast("double")) / nd,
        6,
    )
    return sums.select(
        "n",
        F.round(F.col("sx"), 2).cast("double").alias("total_spend"),
        gini.alias("gini"),
    )


@register(
    "orders_daily_dispersion",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS c
      FROM orders GROUP BY 1),
    m AS (SELECT COUNT(*) AS n, SUM(c) AS s, SUM(c * c) AS ss FROM daily)
    SELECT n AS n_days,
           CAST(s AS BIGINT) AS n_orders,
           ROUND(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 4) AS mean_per_day,
           ROUND((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) /
                  CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE), 4) AS variance,
           ROUND(((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) /
                   CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE)) /
                 (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)), 4) AS dispersion_index
    FROM m
    """,
)
def orders_daily_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dispersion index (variance/mean) of daily order counts — the
    Poisson-ness check: ≈1 means memoryless arrivals, >1 means bursty
    demand, <1 means regularized flow. Exact integer moments (n, Σc,
    Σc²) with double evaluation only at the end."""
    orders = _t(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("c")
    )
    m = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("ss"),
    )
    nd = F.col("n").cast("double")
    sd = F.col("s").cast("double")
    ssd = F.col("ss").cast("double")
    mean = sd / nd
    var = (ssd - sd * sd / nd) / (F.col("n") - 1).cast("double")
    return m.select(
        F.col("n").alias("n_days"),
        F.col("s").cast("bigint").alias("n_orders"),
        F.round(mean, 4).alias("mean_per_day"),
        F.round(var, 4).alias("variance"),
        F.round(var / mean, 4).alias("dispersion_index"),
    )


@register(
    "lineitem_discount_tax_crosstab",
    oracle="""
    SELECT CASE WHEN l_discount < 0.03 THEN 'low'
                WHEN l_discount < 0.07 THEN 'mid' ELSE 'high' END AS discount_band,
           CASE WHEN l_tax < 0.03 THEN 'low'
                WHEN l_tax < 0.06 THEN 'mid' ELSE 'high' END AS tax_band,
           COUNT(*) AS n_lines,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS revenue
    FROM lineitem
    GROUP BY 1, 2
    ORDER BY discount_band, tax_band
    """,
)
def lineitem_discount_tax_crosstab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-dimensional banding cross-tab: revenue by discount band × tax
    band — one scan, one grouped aggregate over derived categorical
    dimensions, DECIMAL-exact revenue."""
    li = _t(spark, sf_dir, "lineitem")
    disc = (
        F.when(F.col("l_discount") < 0.03, "low")
        .when(F.col("l_discount") < 0.07, "mid")
        .otherwise("high")
    )
    tax = (
        F.when(F.col("l_tax") < 0.03, "low")
        .when(F.col("l_tax") < 0.06, "mid")
        .otherwise("high")
    )
    return (
        li.groupBy(disc.alias("discount_band"), tax.alias("tax_band"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("discount_band", "tax_band")
    )


@register(
    "customer_abc_classes",
    oracle="""
    WITH spend AS (
      SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS x
      FROM orders GROUP BY o_custkey),
    ranked AS (
      SELECT o_custkey, x,
             SUM(x) OVER (ORDER BY x DESC, o_custkey) AS cum,
             (SELECT SUM(x) FROM spend) AS total
      FROM spend),
    classed AS (
      SELECT o_custkey, x,
             CASE WHEN CAST(cum AS DOUBLE) / CAST(total AS DOUBLE)
                       <= CAST(0.8 AS DOUBLE) THEN 'A'
                  WHEN CAST(cum AS DOUBLE) / CAST(total AS DOUBLE)
                       <= CAST(0.95 AS DOUBLE) THEN 'B'
                  ELSE 'C' END AS abc
      FROM ranked)
    SELECT abc, COUNT(*) AS n_customers,
           CAST(ROUND(SUM(x), 2) AS DOUBLE) AS revenue,
           ROUND(CAST(SUM(x) AS DOUBLE) /
                 CAST((SELECT SUM(x) FROM spend) AS DOUBLE), 6) AS revenue_share
    FROM classed
    GROUP BY abc
    ORDER BY abc
    """,
)
def customer_abc_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC revenue classification: customers sorted by spend, classed A
    while the cumulative share stays within 80%, B to 95%, C after —
    inventory-management's pareto buckets. The cumulative window runs on
    exact DECIMAL; each class decision divides two exact values once, so
    boundary assignments are bit-stable."""
    orders = _t(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("x")
    )
    total = spend.agg(F.sum("x").alias("total"))
    w = Window.orderBy(F.desc("x"), F.col("o_custkey"))
    ranked = spend.join(F.broadcast(total)).select(
        "o_custkey", "x", F.sum("x").over(w).alias("cum"), "total"
    )
    share = F.col("cum").cast("double") / F.col("total").cast("double")
    classed = ranked.select(
        "x",
        "total",
        F.when(share <= F.lit(0.8).cast("double"), "A")
        .when(share <= F.lit(0.95).cast("double"), "B")
        .otherwise("C")
        .alias("abc"),
    )
    return (
        classed.groupBy("abc")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("x"), 2).cast("double").alias("revenue"),
            F.round(
                F.sum("x").cast("double") / F.max("total").cast("double"), 6
            ).alias("revenue_share"),
        )
        .orderBy("abc")
    )


@register(
    "dedup_index_cost_estimate",
    oracle="""
    WITH sh AS (
      SELECT doc_id,
             unnest(list_distinct([list_aggregate(words[i:i+2], 'string_agg', ' ')
                                   FOR i IN range(1, len(words) - 1)])) AS s
      FROM (SELECT doc_id,
                   string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS words
            FROM documents)
      WHERE len(words) >= 3),
    dfreq AS (SELECT s, COUNT(*) AS df FROM sh GROUP BY s)
    SELECT (SELECT COUNT(DISTINCT doc_id) FROM sh) AS n_docs,
           COUNT(*) AS n_distinct_shingles,
           CAST(SUM(df) AS BIGINT) AS n_postings,
           CAST(SUM(df * df) AS BIGINT) AS sum_df_sq,
           CAST(MAX(df) AS BIGINT) AS max_df,
           CAST(SUM(df * (df - 1)) // 2 AS BIGINT) AS candidate_pairs
    FROM dfreq
    """,
)
def dedup_index_cost_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index join cost planner: before running an exact
    similarity join at scale, this one aggregate reports the exact cost
    drivers — posting count, Σdf² (the join's row product), the hottest
    shingle, and the implied candidate-pair count Σ df·(df−1)/2. At
    100 TB you run THIS first and pick prefix filtering / stop-listing /
    LSH from its output; all integers, so the plan inputs are exact."""
    docs = _t(spark, sf_dir, "documents")
    sh = dedup_mod._fan_out(docs).select(
        "doc_id",
        F.explode(dedup_mod.word_shingles(F.col("text"), 3)).alias("s"),
    )
    dfreq = sh.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    n_docs = sh.select("doc_id").distinct().agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    return (
        dfreq.agg(
            F.count(F.lit(1)).alias("n_distinct_shingles"),
            F.sum("df").cast("bigint").alias("n_postings"),
            F.sum(F.col("df") * F.col("df")).cast("bigint").alias("sum_df_sq"),
            F.max("df").cast("bigint").alias("max_df"),
            F.expr("CAST(SUM(df * (df - 1)) div 2 AS BIGINT)").alias(
                "candidate_pairs"
            ),
        )
        .join(F.broadcast(n_docs))
        .select(
            "n_docs", "n_distinct_shingles", "n_postings", "sum_df_sq",
            "max_df", "candidate_pairs",
        )
    )


@register(
    "dau_week_over_week",
    oracle="""
    WITH dau AS (
      SELECT CAST(ts AS DATE) AS day, COUNT(DISTINCT user_id) AS dau
      FROM events GROUP BY 1),
    wow AS (
      SELECT day, dau,
             lag(dau, 7) OVER (ORDER BY day) AS dau_prev_week
      FROM dau)
    SELECT day, dau, dau_prev_week,
           ROUND((CAST(dau AS DOUBLE) - CAST(dau_prev_week AS DOUBLE)) /
                 CAST(dau_prev_week AS DOUBLE), 6) AS wow_change
    FROM wow
    WHERE dau_prev_week IS NOT NULL
    ORDER BY day
    """,
)
def dau_week_over_week(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week DAU change: lag(7) against the daily-active spine
    (same weekday comparison, so weekly seasonality cancels) with one
    ratio division — the growth-trend primitive."""
    ev = _t(spark, sf_dir, "events")
    dau = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.countDistinct("user_id").alias("dau")
    )
    w = Window.orderBy("day")
    wow = dau.select(
        "day", "dau", F.lag("dau", 7).over(w).alias("dau_prev_week")
    ).filter(F.col("dau_prev_week").isNotNull())
    return wow.select(
        "day",
        "dau",
        "dau_prev_week",
        F.round(
            (F.col("dau").cast("double") - F.col("dau_prev_week").cast("double"))
            / F.col("dau_prev_week").cast("double"),
            6,
        ).alias("wow_change"),
    ).orderBy("day")


@register(
    "events_winsorized_stats",
    oracle="""
    WITH caps AS (
      SELECT quantile_cont(value, 0.05) AS lo,
             quantile_cont(value, 0.95) AS hi
      FROM events),
    capped AS (
      SELECT CAST(ROUND(CASE WHEN value < (SELECT lo FROM caps) THEN (SELECT lo FROM caps)
                             WHEN value > (SELECT hi FROM caps) THEN (SELECT hi FROM caps)
                             ELSE value END, 6) AS DECIMAL(18,6)) AS v,
             CAST(ROUND(value, 6) AS DECIMAL(18,6)) AS raw
      FROM events)
    SELECT COUNT(*) AS n,
           ROUND(CAST((SELECT lo FROM caps) AS DOUBLE), 4) AS cap_lo,
           ROUND(CAST((SELECT hi FROM caps) AS DOUBLE), 4) AS cap_hi,
           ROUND(CAST(SUM(raw) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 4) AS mean_raw,
           ROUND(CAST(SUM(v) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 4) AS mean_winsorized,
           SUM(CASE WHEN v <> raw THEN 1 ELSE 0 END) AS n_capped
    FROM capped
    """,
)
def events_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized robust mean: cap values at the 5th/95th percentiles and
    compare against the raw mean — the outlier-taming transform feature
    pipelines apply before scaling. Capped and raw values round into
    DECIMAL before summation (exact under any row order); means divide
    once in DOUBLE; the percentile caps interpolate identically."""
    ev = _t(spark, sf_dir, "events")
    caps = ev.agg(
        F.expr("percentile(value, 0.05)").alias("lo"),
        F.expr("percentile(value, 0.95)").alias("hi"),
    )
    capped = ev.join(F.broadcast(caps)).select(
        F.round(
            F.when(F.col("value") < F.col("lo"), F.col("lo"))
            .when(F.col("value") > F.col("hi"), F.col("hi"))
            .otherwise(F.col("value")),
            6,
        )
        .cast("decimal(18,6)")
        .alias("v"),
        F.round(F.col("value"), 6).cast("decimal(18,6)").alias("raw"),
        "lo",
        "hi",
    )
    return capped.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.max("lo").cast("double"), 4).alias("cap_lo"),
        F.round(F.max("hi").cast("double"), 4).alias("cap_hi"),
        F.round(
            F.sum("raw").cast("double") / F.count(F.lit(1)).cast("double"), 4
        ).alias("mean_raw"),
        F.round(
            F.sum("v").cast("double") / F.count(F.lit(1)).cast("double"), 4
        ).alias("mean_winsorized"),
        F.sum(F.when(F.col("v") != F.col("raw"), 1).otherwise(0)).alias(
            "n_capped"
        ),
    )


@register(
    "lineitem_quantity_mode",
    oracle="""
    WITH counts AS (
      SELECT l_returnflag, l_quantity, COUNT(*) AS c
      FROM lineitem GROUP BY 1, 2),
    best AS (
      SELECT l_returnflag, l_quantity AS mode_quantity, c AS mode_count
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                         ORDER BY c DESC, l_quantity) AS rn
            FROM counts)
      WHERE rn = 1)
    SELECT l_returnflag, CAST(mode_quantity AS DOUBLE) AS mode_quantity,
           mode_count
    FROM best
    ORDER BY l_returnflag
    """,
)
def lineitem_quantity_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mode per group: value-count aggregate then a
    tie-broken row_number — unlike the built-in `mode()` whose tie
    winner is arbitrary, this pins (count desc, value asc) so the result
    is reproducible and oracle-checkable."""
    li = _t(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count(F.lit(1)).alias("c")
    )
    w = Window.partitionBy("l_returnflag").orderBy(
        F.desc("c"), F.col("l_quantity")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "l_returnflag",
            F.col("l_quantity").cast("double").alias("mode_quantity"),
            F.col("c").alias("mode_count"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "region_revenue_share",
    oracle="""
    WITH rev AS (
      SELECT r.r_name AS region,
             SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
                 CAST(1 - l.l_discount AS DECIMAL(9,4))) AS revenue
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      GROUP BY 1),
    tot AS (SELECT SUM(revenue) AS total FROM rev)
    SELECT region,
           CAST(ROUND(revenue, 2) AS DOUBLE) AS revenue,
           ROUND(CAST(revenue AS DOUBLE) /
                 CAST((SELECT total FROM tot) AS DOUBLE), 6) AS share
    FROM rev
    ORDER BY region
    """,
)
def region_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regional revenue mix: discounted line revenue rolled to the
    5-region grain with exact DECIMAL sums and one share division —
    dimensions broadcast down the snowflake, the fact shuffles once."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region")
    rev = (
        li.join(orders, orders.o_orderkey == li.l_orderkey)
        .join(F.broadcast(cust), cust.c_custkey == orders.o_custkey)
        .join(F.broadcast(nat), nat.n_nationkey == cust.c_nationkey)
        .join(F.broadcast(reg), reg.r_regionkey == nat.n_regionkey)
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount")).cast("decimal(9,4)")
            ).alias("revenue")
        )
    )
    tot = rev.agg(F.sum("revenue").alias("total"))
    return (
        rev.join(F.broadcast(tot))
        .select(
            "region",
            F.round(F.col("revenue"), 2).cast("double").alias("revenue"),
            F.round(
                F.col("revenue").cast("double") / F.col("total").cast("double"),
                6,
            ).alias("share"),
        )
        .orderBy("region")
    )


@register(
    "events_hourly_profile",
    oracle="""
    WITH hourly AS (
      SELECT CAST(hour(ts) AS INT) AS hour_of_day, COUNT(*) AS n
      FROM events GROUP BY 1),
    tot AS (SELECT SUM(n) AS total, MAX(n) AS peak FROM hourly)
    SELECT hour_of_day, n,
           ROUND(CAST(n AS DOUBLE) /
                 CAST((SELECT total FROM tot) AS DOUBLE), 6) AS share,
           CASE WHEN n = (SELECT peak FROM tot) THEN 1 ELSE 0 END AS is_peak
    FROM hourly
    ORDER BY hour_of_day
    """,
)
def events_hourly_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day activity profile (UTC session, so hour extraction
    agrees across engines) with traffic share and peak-hour flag — the
    capacity-planning histogram."""
    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(F.hour("ts").cast("int").alias("hour_of_day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = hourly.agg(F.sum("n").alias("total"), F.max("n").alias("peak"))
    return (
        hourly.join(F.broadcast(tot))
        .select(
            "hour_of_day",
            "n",
            F.round(
                F.col("n").cast("double") / F.col("total").cast("double"), 6
            ).alias("share"),
            F.when(F.col("n") == F.col("peak"), 1).otherwise(0).alias("is_peak"),
        )
        .orderBy("hour_of_day")
    )


@register(
    "orders_monthly_status_mix",
    oracle="""
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mon, o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS revenue
    FROM orders
    GROUP BY 1, 2
    ORDER BY mon, o_orderstatus
    """,
)
def orders_monthly_status_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly order-status composition with DECIMAL-exact revenue — the
    operational mix report; one scan, one grouped aggregate."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.date_trunc("month", "o_orderdate").cast("date").alias("mon"),
            "o_orderstatus",
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("mon", "o_orderstatus")
    )


@register(
    "events_value_boxplot",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           ROUND(MIN(value), 4) AS min_v,
           ROUND(quantile_cont(value, 0.25), 4) AS q1,
           ROUND(quantile_cont(value, 0.5), 4) AS median_v,
           ROUND(quantile_cont(value, 0.75), 4) AS q3,
           ROUND(MAX(value), 4) AS max_v
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def events_value_boxplot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five-number summary (boxplot) of event values per type — grouped
    interpolated quantiles in one aggregate pass; Spark `percentile` and
    DuckDB `quantile_cont` share the interpolation rule, and sorting
    NaN-free doubles is a total order, so every summary value matches."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value"), 4).alias("min_v"),
            F.round(F.expr("percentile(value, 0.25)"), 4).alias("q1"),
            F.round(F.expr("percentile(value, 0.5)"), 4).alias("median_v"),
            F.round(F.expr("percentile(value, 0.75)"), 4).alias("q3"),
            F.round(F.max("value"), 4).alias("max_v"),
        )
        .orderBy("event_type")
    )


@register(
    "lineitem_monthly_return_rate",
    oracle="""
    WITH m AS (
      SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS mon,
             COUNT(*) AS n_lines,
             COUNT(*) FILTER (WHERE l_returnflag = 'R') AS n_returned
      FROM lineitem GROUP BY 1)
    SELECT mon, n_lines, n_returned,
           ROUND(CAST(n_returned AS DOUBLE) / CAST(n_lines AS DOUBLE), 6)
             AS return_rate
    FROM m
    ORDER BY mon
    """,
)
def lineitem_monthly_return_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly return rate from the line-level return flag — one grouped
    FILTER aggregate and a single ratio division; the operations trend
    line for returns."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy(
            F.date_trunc("month", "l_shipdate").cast("date").alias("mon")
        )
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.expr("COUNT(*) FILTER (WHERE l_returnflag = 'R')").alias(
                "n_returned"
            ),
        )
        .select(
            "mon",
            "n_lines",
            "n_returned",
            F.round(
                F.col("n_returned").cast("double") / F.col("n_lines").cast("double"),
                6,
            ).alias("return_rate"),
        )
        .orderBy("mon")
    )


@register(
    "corpus_summary_scorecard",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens
      FROM documents),
    fps AS (
      SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
      FROM documents)
    SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
           (SELECT CAST(SUM(n_tokens) AS BIGINT) FROM toks) AS total_tokens,
           (SELECT CAST(MAX(n_tokens) AS BIGINT) FROM toks) AS max_doc_tokens,
           (SELECT COUNT(*) FROM documents WHERE trim(text) = '') AS n_empty,
           (SELECT COUNT(DISTINCT fp) FROM fps) AS n_unique_contents,
           ROUND(CAST((SELECT COUNT(*) FROM documents) -
                      (SELECT COUNT(DISTINCT fp) FROM fps) AS DOUBLE) /
                 CAST((SELECT COUNT(*) FROM documents) AS DOUBLE), 6)
             AS exact_dup_rate
    """,
)
def corpus_summary_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row corpus scorecard: size, token volume, longest document,
    empty-document count, distinct-content count, and the exact-dup rate
    — the at-a-glance health check a curation pipeline prints before and
    after every transformation stage."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        F.when(F.trim(F.col("text")) == "", 0)
        .otherwise(F.size(F.split(F.trim(F.col("text")), r"\s+")))
        .alias("n_tokens"),
        F.trim(F.col("text")).alias("trimmed"),
        tx.fingerprint(F.col("text")).alias("fp"),
    )
    return toks.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.max("n_tokens").cast("bigint").alias("max_doc_tokens"),
        F.sum(F.when(F.col("trimmed") == "", 1).otherwise(0)).alias("n_empty"),
        F.countDistinct("fp").alias("n_unique_contents"),
        F.round(
            (F.count(F.lit(1)) - F.countDistinct("fp")).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("exact_dup_rate"),
    )


# ---------------------------------------------------------------------------
# Round 2 batch: graph analytics, embedding classifiers, language modeling,
# and training-pipeline chunking ops — all value-oracled.
# ---------------------------------------------------------------------------


@register(
    "graph_triangle_count",
    oracle="""
    WITH so AS (SELECT DISTINCT l_suppkey AS s, l_orderkey AS o FROM lineitem),
    w AS (
      SELECT a.s AS u, b.s AS v, COUNT(*) AS c
      FROM so a JOIN so b ON a.o = b.o AND a.s < b.s
      GROUP BY a.s, b.s),
    sym AS (
      SELECT u AS x, v AS y, c FROM w
      UNION ALL SELECT v AS x, u AS y, c FROM w),
    sel AS (
      SELECT x, y FROM (
        SELECT x, y,
               ROW_NUMBER() OVER (PARTITION BY x ORDER BY c DESC, y) AS rn
        FROM sym)
      WHERE rn <= 3),
    e AS (
      SELECT DISTINCT least(x, y) AS u, greatest(x, y) AS v FROM sel),
    tri AS (
      SELECT COUNT(*) AS n FROM e e1
      JOIN e e2 ON e2.u = e1.v
      JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v)
    SELECT (SELECT COUNT(*) FROM e) AS n_edges,
           (SELECT n FROM tri) AS n_triangles
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle count on the TOP-3-SPARSIFIED supplier co-order
    graph: each supplier keeps edges to its 3 strongest co-order partners
    (by shared-order count, ties by id), edges survive if either endpoint
    selected them. Sparsification first is the 100 TB posture — raw
    co-occurrence graphs densify toward complete as data grows (this one
    is already complete at sf0.01), making raw triangle counting O(n³);
    bounding the out-degree bounds wedges at 6·|V| regardless of scale.
    The count itself is the standard oriented edge-iterator: two
    self-joins on the u<v edge list, each triangle counted once."""
    li = _t(spark, sf_dir, "lineitem")
    so = li.select(
        F.col("l_suppkey").alias("s"), F.col("l_orderkey").alias("o")
    ).distinct()
    w = (
        so.alias("a")
        .join(so.alias("b"), (F.col("a.o") == F.col("b.o")) & (F.col("a.s") < F.col("b.s")))
        .groupBy(F.col("a.s").alias("u"), F.col("b.s").alias("v"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # e is vertex-sized (≤ 3|V| edges) and feeds four consumers (three
    # triangle-join sides + the edge count) — materialize once instead of
    # re-running the corpus-scale co-order join per consumer
    e = op_cache.track(graph_mod.top_k_cooccurrence_edges(w, k=3).cache())
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.u") == F.col("e1.v"))
        .join(e3, (F.col("e3.u") == F.col("e1.u")) & (F.col("e3.v") == F.col("e2.v")))
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return e.agg(F.count(F.lit(1)).alias("n_edges")).crossJoin(tri)


@register(
    "graph_jaccard_link_prediction",
    oracle="""
    WITH so AS (SELECT DISTINCT l_suppkey AS s, l_orderkey AS o FROM lineitem),
    deg AS (SELECT s, COUNT(*) AS n FROM so GROUP BY s),
    common AS (
      SELECT a.s AS u, b.s AS v, COUNT(*) AS c
      FROM so a JOIN so b ON a.o = b.o AND a.s < b.s
      GROUP BY a.s, b.s)
    SELECT u, v, c AS n_common,
           ROUND(CAST(c AS DOUBLE) / (du.n + dv.n - c), 6) AS jaccard
    FROM common JOIN deg du ON du.s = u JOIN deg dv ON dv.s = v
    ORDER BY jaccard DESC, u, v
    LIMIT 20
    """,
)
def graph_jaccard_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighborhood-Jaccard link prediction on the supplier-order bipartite
    graph: score supplier pairs by |orders(u) ∩ orders(v)| / |union|. The
    intersection comes from one co-order self-join aggregate (no set
    materialization) and degrees broadcast — the inverted-index shape that
    scales with co-occurrence count, not pair count."""
    li = _t(spark, sf_dir, "lineitem")
    so = li.select(
        F.col("l_suppkey").alias("s"), F.col("l_orderkey").alias("o")
    ).distinct()
    deg = so.groupBy("s").agg(F.count(F.lit(1)).alias("n"))
    common = (
        so.alias("a")
        .join(so.alias("b"), (F.col("a.o") == F.col("b.o")) & (F.col("a.s") < F.col("b.s")))
        .groupBy(F.col("a.s").alias("u"), F.col("b.s").alias("v"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    du = F.broadcast(deg.select(F.col("s").alias("u"), F.col("n").alias("nu")))
    dv = F.broadcast(deg.select(F.col("s").alias("v"), F.col("n").alias("nv")))
    return (
        common.join(du, "u")
        .join(dv, "v")
        .select(
            "u",
            "v",
            F.col("c").alias("n_common"),
            F.round(
                F.col("c").cast("double") / (F.col("nu") + F.col("nv") - F.col("c")),
                6,
            ).alias("jaccard"),
        )
        .orderBy(F.desc("jaccard"), "u", "v")
        .limit(20)
    )


_VDOT_KNN = (
    "list_reduce([CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE) "
    "FOR i IN range(1, len({a}) + 1)], (x, y) -> x + y)"
)


@register(
    "knn_label_classifier",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv, label AS true_label
               FROM embeddings WHERE vec_id < 20),
    scored AS (
      SELECT q.query_id, q.true_label, e.vec_id AS nid, e.label,
             {_VDOT_KNN.format(a="q.qv", b="e.embedding")} /
             (sqrt({_VDOT_KNN.format(a="q.qv", b="q.qv")}) *
              sqrt({_VDOT_KNN.format(a="e.embedding", b="e.embedding")})) AS cos
      FROM embeddings e CROSS JOIN q
      WHERE e.vec_id <> q.query_id),
    top5 AS (
      SELECT query_id, true_label, label FROM (
        SELECT query_id, true_label, label,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, nid) AS rn
        FROM scored)
      WHERE rn <= 5),
    votes AS (
      SELECT query_id, true_label, label, COUNT(*) AS n_votes
      FROM top5 GROUP BY query_id, true_label, label)
    SELECT query_id, true_label,
           CAST(label AS INT) AS predicted_label,
           CAST(n_votes AS INT) AS n_votes,
           CASE WHEN label = true_label THEN 1 ELSE 0 END AS correct
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY n_votes DESC, label) AS rv
          FROM votes)
    WHERE rv = 1
    ORDER BY query_id
    """,
)
def knn_label_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN (k=5) majority-vote label classifier over the embedding table —
    the eval-set pattern of training-data curation (label a sample by its
    nearest labeled neighbors). Brute-force scoring is fine for the probe
    set (queries broadcast, corpus streamed); swap the candidate generation
    for lsh_topk/ivf_topk at corpus scale — voting is identical. Ties break
    by (votes desc, label asc); neighbor ranking by (cosine desc, id)."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("label").alias("true_label"),
    )
    joined = emb.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    scored = joined.select(
        "query_id",
        "true_label",
        F.col("vec_id").alias("nid"),
        "label",
        sim_mod.cosine(F.col("qv"), F.col("embedding")).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "nid")
    top5 = scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 5)
    votes = top5.groupBy("query_id", "true_label", "label").agg(
        F.count(F.lit(1)).alias("n_votes")
    )
    wv = Window.partitionBy("query_id").orderBy(F.desc("n_votes"), "label")
    return (
        votes.withColumn("rv", F.row_number().over(wv))
        .filter(F.col("rv") == 1)
        .select(
            "query_id",
            "true_label",
            F.col("label").cast("int").alias("predicted_label"),
            F.col("n_votes").cast("int").alias("n_votes"),
            F.when(F.col("label") == F.col("true_label"), 1).otherwise(0).alias("correct"),
        )
        .orderBy("query_id")
    )


_NB_WORDS = "string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')"


@register(
    "naive_bayes_lang_score",
    oracle=f"""
    WITH train AS (SELECT * FROM documents WHERE doc_id % 2 = 0 AND trim(text) != ''),
    test  AS (SELECT * FROM documents WHERE doc_id % 2 = 1 AND trim(text) != ''),
    tok_tr AS (SELECT lang, unnest({_NB_WORDS}) AS w FROM train),
    model AS (SELECT lang, w, COUNT(*) AS cnt FROM tok_tr GROUP BY lang, w),
    tot AS (SELECT lang, COUNT(*) AS tot FROM tok_tr GROUP BY lang),
    vocab AS (SELECT COUNT(DISTINCT w) AS v FROM tok_tr),
    prior AS (
      SELECT lang,
             CAST(ROUND(ln(CAST(COUNT(*) AS DOUBLE) /
                           (SELECT COUNT(*) FROM train)), 6) AS DECIMAL(18,6)) AS lp
      FROM train GROUP BY lang),
    tok_te AS (
      SELECT doc_id, lang AS true_lang, w, COUNT(*) AS tf
      FROM (SELECT doc_id, lang, unnest({_NB_WORDS}) AS w FROM test)
      GROUP BY doc_id, lang, w),
    scored AS (
      SELECT t.doc_id, t.true_lang, c.lang AS cand,
             SUM(t.tf * CAST(ROUND(ln(
               CAST(COALESCE(m.cnt, 0) + 1 AS DOUBLE) /
               (c.tot + (SELECT v FROM vocab))), 6) AS DECIMAL(18,6))) AS ll
      FROM tok_te t
      CROSS JOIN tot c
      LEFT JOIN model m ON m.lang = c.lang AND m.w = t.w
      GROUP BY t.doc_id, t.true_lang, c.lang),
    final AS (
      SELECT s.doc_id, s.true_lang, s.cand,
             s.ll + p.lp AS score,
             ROW_NUMBER() OVER (PARTITION BY s.doc_id
                                ORDER BY s.ll + p.lp DESC, s.cand) AS rn
      FROM scored s JOIN prior p ON p.lang = s.cand)
    SELECT doc_id, true_lang, cand AS predicted_lang,
           CAST(score AS DOUBLE) AS score,
           CASE WHEN cand = true_lang THEN 1 ELSE 0 END AS correct
    FROM final WHERE rn = 1
    ORDER BY doc_id
    """,
)
def naive_bayes_lang_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial naive-Bayes language classifier trained on the even
    doc_ids and scored on the odd ones — Laplace-smoothed unigram
    likelihoods. Every log is rounded to 6 dp then fixed as DECIMAL so the
    per-document sums are exact and order-independent (a raw double sum
    over a shuffled join would drift in the last ulp); the candidate-lang
    join is a 5-row broadcast and the token-model join keys on the word —
    the same inverted-index shape as TF-IDF, linear in corpus tokens."""
    docs = _t(spark, sf_dir, "documents").filter(F.trim(F.col("text")) != "")
    words = F.split(
        F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "), " "
    )
    train = docs.filter(F.col("doc_id") % 2 == 0)
    test = docs.filter(F.col("doc_id") % 2 == 1)
    tok_tr = train.select("lang", F.explode(words).alias("w"))
    # the (lang, word) model feeds three consumers (scoring join, per-lang
    # totals, vocabulary size); materialize the vocab-sized aggregate once
    # so the corpus token stream is scanned exactly once — the totals then
    # cost O(vocab), not O(corpus tokens), at any scale
    model = op_cache.track(
        tok_tr.groupBy("lang", "w").agg(F.count(F.lit(1)).alias("cnt")).cache()
    )
    tot = model.groupBy("lang").agg(F.sum("cnt").alias("tot"))
    vocab = model.select("w").distinct().agg(F.count(F.lit(1)).alias("v"))
    n_train = train.agg(F.count(F.lit(1)).alias("n_train"))
    prior = (
        train.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .join(F.broadcast(n_train))
        .select(
            "lang",
            F.round(F.log(F.col("n").cast("double") / F.col("n_train")), 6)
            .cast("decimal(18,6)")
            .alias("lp"),
        )
    )
    tok_te = (
        test.select("doc_id", F.col("lang").alias("true_lang"), F.explode(words).alias("w"))
        .groupBy("doc_id", "true_lang", "w")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    cand = F.broadcast(tot.join(vocab))  # 5 rows x (tot, v)
    scored = (
        tok_te.join(cand)
        .join(
            model.select(F.col("lang").alias("cand"), F.col("w").alias("mw"), "cnt"),
            (F.col("lang") == F.col("cand")) & (F.col("w") == F.col("mw")),
            "left",
        )
        .select(
            "doc_id",
            "true_lang",
            F.col("lang").alias("cand_lang"),
            (
                F.col("tf")
                * F.round(
                    F.log(
                        (F.coalesce(F.col("cnt"), F.lit(0)) + 1).cast("double")
                        / (F.col("tot") + F.col("v"))
                    ),
                    6,
                ).cast("decimal(18,6)")
            ).alias("term"),
        )
        .groupBy("doc_id", "true_lang", "cand_lang")
        .agg(F.sum("term").alias("ll"))
    )
    wv = Window.partitionBy("doc_id").orderBy(F.desc("score_d"), "cand_lang")
    return (
        scored.join(
            F.broadcast(prior.select(F.col("lang").alias("cand_lang"), "lp")),
            "cand_lang",
        )
        .withColumn("score_d", F.col("ll") + F.col("lp"))
        .withColumn("rn", F.row_number().over(wv))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            "true_lang",
            F.col("cand_lang").alias("predicted_lang"),
            F.col("score_d").cast("double").alias("score"),
            F.when(F.col("cand_lang") == F.col("true_lang"), 1).otherwise(0).alias("correct"),
        )
        .orderBy("doc_id")
    )


@register(
    "cdc_chunk_dedup",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, unnest({_NB_WORDS}) AS w,
             unnest(range(1, len({_NB_WORDS}) + 1)) AS pos
      FROM documents WHERE trim(text) != ''),
    flagged AS (
      SELECT doc_id, w, pos,
             CASE WHEN ({_MD5H.format(col="w")}) % 4 = 0 THEN 1 ELSE 0 END AS b
      FROM words),
    chunked AS (
      SELECT doc_id, w, pos,
             SUM(b) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - b
               AS chunk_id
      FROM flagged),
    chunks AS (
      SELECT doc_id, chunk_id,
             string_agg(w, ' ' ORDER BY pos) AS chunk,
             COUNT(*) AS n_words
      FROM chunked GROUP BY doc_id, chunk_id)
    SELECT COUNT(*) AS n_chunks,
           COUNT(DISTINCT chunk) AS n_distinct_chunks,
           ROUND(CAST(COUNT(*) - COUNT(DISTINCT chunk) AS DOUBLE) / COUNT(*), 6)
             AS dup_chunk_rate,
           CAST(SUM(n_words) AS BIGINT) AS total_words,
           CAST(MAX(n_words) AS BIGINT) AS max_chunk_words
    FROM chunks
    """,
)
def cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking dedup: chunk boundaries fall AFTER any word
    whose md5-derived hash ≡ 0 (mod 4) — so chunk edges depend only on
    content, and an insertion early in a document cannot shift every later
    chunk (the failure mode of fixed-size chunking). Chunks are rebuilt per
    document with one window pass (running boundary count), then exact-
    deduplicated by value. This is the rsync/LBFS chunking idea applied to
    corpus dedup; at 100 TB the only shuffle is the final chunk hash-agg."""
    docs = _t(spark, sf_dir, "documents").filter(F.trim(F.col("text")) != "")
    words = F.split(
        F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "), " "
    )
    tok = docs.select("doc_id", F.posexplode(words).alias("pos0", "w")).select(
        "doc_id", (F.col("pos0") + 1).alias("pos"), "w"
    )
    flagged = tok.withColumn(
        "b",
        F.when(
            F.expr(dedup_mod.PORTABLE_HASH_SQL.format(col="w")) % 4 == 0, 1
        ).otherwise(0),
    )
    wrun = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    chunked = flagged.withColumn("chunk_id", F.sum("b").over(wrun) - F.col("b"))
    chunks = chunked.groupBy("doc_id", "chunk_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "w"))),
                lambda s: s["w"],
            ),
        ).alias("chunk"),
        F.count(F.lit(1)).alias("n_words"),
    )
    return chunks.agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.countDistinct("chunk").alias("n_distinct_chunks"),
        F.round(
            (F.count(F.lit(1)) - F.countDistinct("chunk")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("dup_chunk_rate"),
        F.sum("n_words").cast("bigint").alias("total_words"),
        F.max("n_words").cast("bigint").alias("max_chunk_words"),
    )


@register(
    "gopher_quality_rules",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_NB_WORDS} AS ws, text FROM documents
      WHERE trim(text) != '')
    SELECT doc_id,
           len(ws) AS n_words,
           CASE WHEN len(ws) BETWEEN 20 AND 100000 THEN 1 ELSE 0 END AS ok_word_count,
           CASE WHEN 3 * len(ws) <= len(list_aggregate(ws, 'string_agg', ''))
                 AND len(list_aggregate(ws, 'string_agg', '')) <= 10 * len(ws)
                THEN 1 ELSE 0 END AS ok_mean_word_len,
           CASE WHEN 10 * len(regexp_replace(text, '[^#.]', '', 'g')) <= len(text)
                THEN 1 ELSE 0 END AS ok_symbol_ratio,
           CASE WHEN len(list_intersect(list_distinct(ws),
                        ['the', 'and', 'of', 'to', 'a'])) >= 2
                THEN 1 ELSE 0 END AS ok_stopwords
    FROM toks
    ORDER BY doc_id
    """,
)
def gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style document quality rules (word-count bounds, mean word
    length in [3,10], symbol-to-char ratio, minimum stopword evidence) as
    pure integer comparisons — e.g. "mean word length in [3,10]" is checked
    as 3·n ≤ total_chars ≤ 10·n, so no float division can drift between
    engines. All built-in column expressions; one narrow pass, no shuffle."""
    docs = _t(spark, sf_dir, "documents").filter(F.trim(F.col("text")) != "")
    ws = F.split(
        F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "), " "
    )
    d = docs.select("doc_id", "text", ws.alias("ws"))
    total_chars = F.length(F.concat_ws("", F.col("ws")))
    n = F.size("ws")
    sym = F.length(F.regexp_replace(F.col("text"), r"[^#.]", ""))
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(F.col("ws")),
            F.array(*[F.lit(s) for s in ("the", "and", "of", "to", "a")]),
        )
    )
    return d.select(
        "doc_id",
        n.alias("n_words"),
        F.when(n.between(20, 100000), 1).otherwise(0).alias("ok_word_count"),
        F.when((3 * n <= total_chars) & (total_chars <= 10 * n), 1)
        .otherwise(0)
        .alias("ok_mean_word_len"),
        F.when(10 * sym <= F.length("text"), 1).otherwise(0).alias("ok_symbol_ratio"),
        F.when(stop_hits >= 2, 1).otherwise(0).alias("ok_stopwords"),
    ).orderBy("doc_id")


@register(
    "token_sliding_windows",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_NB_WORDS} AS ws FROM documents
      WHERE doc_id < 10 AND trim(text) != ''),
    wins AS (
      SELECT doc_id, unnest(range(0, len(ws) - 31, 16)) AS start_pos, ws
      FROM toks WHERE len(ws) >= 32)
    SELECT doc_id,
           CAST(start_pos / 16 AS INT) AS win_id,
           CAST(start_pos AS INT) AS start_pos,
           ws[start_pos + 1] AS first_token,
           ws[start_pos + 32] AS last_token
    FROM wins
    ORDER BY doc_id, win_id
    """,
)
def token_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size (32-token) training windows with stride 16 — the standard
    context-window chunking for LM pretraining, materialized per window with
    first/last token as content witnesses. sequence() + explode generates
    window starts without any join; per-document work is linear in tokens
    and embarrassingly parallel."""
    docs = _t(spark, sf_dir, "documents").filter(
        (F.col("doc_id") < 10) & (F.trim(F.col("text")) != "")
    )
    ws = F.split(
        F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "), " "
    )
    d = docs.select("doc_id", ws.alias("ws")).filter(F.size("ws") >= 32)
    wins = d.select(
        "doc_id",
        "ws",
        F.explode(F.sequence(F.lit(0), F.size("ws") - 32, F.lit(16))).alias("start_pos"),
    )
    return wins.select(
        "doc_id",
        (F.col("start_pos") / 16).cast("int").alias("win_id"),
        F.col("start_pos").cast("int").alias("start_pos"),
        F.element_at("ws", F.col("start_pos") + 1).alias("first_token"),
        F.element_at("ws", F.col("start_pos") + 32).alias("last_token"),
    ).orderBy("doc_id", "win_id")


@register(
    "vocab_coverage_curve",
    oracle=f"""
    WITH tok AS (
      SELECT unnest({_NB_WORDS}) AS w FROM documents WHERE trim(text) != ''),
    freq AS (SELECT w, COUNT(*) AS f FROM tok GROUP BY w),
    ranked AS (
      SELECT w, f,
             ROW_NUMBER() OVER (ORDER BY f DESC, w) AS rn,
             SUM(f) OVER (ORDER BY f DESC, w
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM freq)
    SELECT CAST(rn AS INT) AS vocab_size,
           ROUND(CAST(cum AS DOUBLE) / (SELECT COUNT(*) FROM tok), 6) AS coverage
    FROM ranked WHERE rn IN (5, 10, 20, 30)
    ORDER BY vocab_size
    """,
)
def vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-coverage curve for tokenizer/vocab sizing: what fraction of
    all token occurrences the top-k vocabulary covers, at k ∈ {5,10,20,30}.
    One token-frequency aggregate plus a single-partition window over the
    (tiny) vocabulary table — the frequency table, not the corpus, flows
    into the window, so corpus scale only affects the first aggregate."""
    docs = _t(spark, sf_dir, "documents").filter(F.trim(F.col("text")) != "")
    ws = F.split(
        F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "), " "
    )
    tok = docs.select(F.explode(ws).alias("w"))
    total = tok.agg(F.count(F.lit(1)).alias("total"))
    freq = tok.groupBy("w").agg(F.count(F.lit(1)).alias("f"))
    wr = Window.orderBy(F.desc("f"), "w")
    ranked = freq.select(
        "w",
        "f",
        F.row_number().over(wr).alias("rn"),
        F.sum("f").over(wr.rowsBetween(Window.unboundedPreceding, Window.currentRow)).alias("cum"),
    )
    return (
        ranked.filter(F.col("rn").isin(5, 10, 20, 30))
        .join(F.broadcast(total))
        .select(
            F.col("rn").cast("int").alias("vocab_size"),
            F.round(F.col("cum").cast("double") / F.col("total"), 6).alias("coverage"),
        )
        .orderBy("vocab_size")
    )


@register(
    "multimodal_ppm_decode_stats",
    oracle="""
    WITH px AS (
      SELECT t.id, u.i % 3 AS ch, CAST((t.id * 31 + u.i) % 256 AS DOUBLE) AS v
      FROM range(0, 50) t(id) CROSS JOIN range(0, 576) u(i))
    SELECT id AS media_id,
           CAST(16 AS INT) AS width, CAST(12 AS INT) AS height,
           ROUND(avg(v) FILTER (ch = 0), 6) AS mean_r,
           ROUND(avg(v) FILTER (ch = 1), 6) AS mean_g,
           ROUND(avg(v) FILTER (ch = 2), 6) AS mean_b
    FROM px GROUP BY id ORDER BY media_id
    """,
)
def multimodal_ppm_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decoding end-to-end: deterministic P6 PPM payloads →
    binary parse (header walk + numpy pixel view) inside mapInPandas →
    per-channel means. The oracle integrates the generator's closed form
    ((id*31+i) % 256) directly in SQL, so the whole decode path — header
    parsing, offset math, channel deinterleave — is value-checked. This is
    the non-stubbed half of the multimodal surface (self-describing
    formats); jpeg/mp4 remain declared stubs."""
    media = mm_mod.synthetic_ppm_media(spark, n=50)
    return mm_mod.ppm_image_stats(media).orderBy("media_id")


@register(
    "multimodal_wav_decode_stats",
    oracle="""
    WITH s AS (
      SELECT t.id, ((t.id * 7 + u.s * 13) % 65536) - 32768 AS v
      FROM range(0, 50) t(id) CROSS JOIN range(0, 256) u(s))
    SELECT id AS media_id,
           CAST(256 AS BIGINT) AS n_samples,
           CAST(8000 AS INT) AS sample_rate,
           ROUND(sqrt(SUM(CAST(v AS DOUBLE) * v) / 256), 6) AS rms,
           CAST(MAX(abs(v)) AS INT) AS peak
    FROM s GROUP BY id ORDER BY media_id
    """,
)
def multimodal_wav_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decoding end-to-end: RIFF/WAVE chunk walk + PCM16 numpy
    view inside mapInPandas → per-clip RMS/peak, value-checked against the
    generator's closed form. Same quarantine-on-malformed contract as the
    export pipeline's decrypt step."""
    media = mm_mod.synthetic_wav_media(spark, n=50)
    return mm_mod.wav_audio_stats(media).orderBy("media_id")


@register(
    "bigram_pmi_collocations",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, {_NB_WORDS} AS ws FROM documents WHERE trim(text) != ''),
    uni AS (
      SELECT w, COUNT(*) AS c FROM (SELECT unnest(ws) AS w FROM words) GROUP BY w),
    n_uni AS (SELECT SUM(c) AS nu FROM uni),
    bi AS (
      SELECT ws[i] AS x, ws[i + 1] AS y, COUNT(*) AS cxy
      FROM (SELECT ws, unnest(range(1, len(ws))) AS i FROM words WHERE len(ws) >= 2)
      GROUP BY ws[i], ws[i + 1]),
    n_bi AS (SELECT SUM(cxy) AS nb FROM bi)
    SELECT x, y, CAST(cxy AS BIGINT) AS cxy,
           ROUND(ln(((CAST(cxy AS DOUBLE) * nu) * nu) /
                    ((CAST(nb AS DOUBLE) * cx.c) * cy.c)), 6) AS pmi
    FROM bi, n_uni, n_bi
    JOIN uni cx ON cx.w = x
    JOIN uni cy ON cy.w = y
    WHERE cxy >= 10
    ORDER BY pmi DESC, x, y
    LIMIT 20
    """,
)
def bigram_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise-mutual-information collocation mining over adjacent word
    pairs — the classic phrase detector for tokenizer/vocab construction.
    PMI = ln(p(xy) / (p(x)p(y))) with the ratio assembled left-to-right in
    one double expression identical on both engines, then rounded. Unigram
    totals broadcast (2 scalar rows); the bigram aggregate is the only
    corpus-scale shuffle."""
    docs = _t(spark, sf_dir, "documents").filter(F.trim(F.col("text")) != "")
    ws = F.split(
        F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "), " "
    )
    words = docs.select(ws.alias("ws"))
    uni = (
        words.select(F.explode("ws").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n_uni = uni.agg(F.sum("c").alias("nu"))
    bigrams = words.filter(F.size("ws") >= 2).select(
        F.explode(
            F.transform(
                F.slice(F.col("ws"), 1, F.size("ws") - 1),
                lambda w, i: F.struct(
                    w.alias("x"), F.element_at(F.col("ws"), i + 2).alias("y")
                ),
            )
        ).alias("p")
    )
    bi = bigrams.groupBy(F.col("p.x").alias("x"), F.col("p.y").alias("y")).agg(
        F.count(F.lit(1)).alias("cxy")
    )
    n_bi = bi.agg(F.sum("cxy").alias("nb"))
    cx = uni.select(F.col("w").alias("x"), F.col("c").alias("cx_c"))
    cy = uni.select(F.col("w").alias("y"), F.col("c").alias("cy_c"))
    return (
        bi.filter(F.col("cxy") >= 10)
        .join(F.broadcast(n_uni))
        .join(F.broadcast(n_bi))
        .join(cx, "x")
        .join(cy, "y")
        .select(
            "x",
            "y",
            F.col("cxy").cast("bigint").alias("cxy"),
            F.round(
                F.log(
                    ((F.col("cxy").cast("double") * F.col("nu")) * F.col("nu"))
                    / ((F.col("nb").cast("double") * F.col("cx_c")) * F.col("cy_c"))
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), "x", "y")
        .limit(20)
    )


@register(
    "events_rollup_multi_granularity",
    oracle="""
    WITH base AS (
      SELECT date_trunc('hour', ts) AS h,
             date_trunc('day', ts) AS d,
             date_trunc('week', ts) AS wk,
             value
      FROM events),
    g AS (
      SELECT h, d, wk, COUNT(*) AS n_events,
             CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_value
      FROM base
      GROUP BY GROUPING SETS ((h), (d), (wk)))
    SELECT CASE WHEN h IS NOT NULL THEN 'hour'
                WHEN d IS NOT NULL THEN 'day'
                ELSE 'week' END AS grain,
           COALESCE(h, d, wk) AS bucket_start,
           n_events, sum_value
    FROM g
    ORDER BY grain, bucket_start
    """,
)
def events_rollup_multi_granularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: one scan feeds hour,
    day, and week buckets via GROUPING SETS — the single-pass form of
    maintaining multiple rollup tables (what a time-series engine calls a
    cascaded continuous aggregate). Sums go through DECIMAL so the three
    granularities are exactly consistent with each other."""
    ev = _t(spark, sf_dir, "events")
    ev.select(
        F.date_trunc("hour", "ts").alias("h"),
        F.date_trunc("day", "ts").alias("d"),
        F.date_trunc("week", "ts").alias("wk"),
        "value",
    ).createOrReplaceTempView("__ev_rollup_base")
    return ev.sparkSession.sql("""
        WITH g AS (
          SELECT h, d, wk, COUNT(*) AS n_events,
                 CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_value
          FROM __ev_rollup_base
          GROUP BY GROUPING SETS ((h), (d), (wk)))
        SELECT CASE WHEN h IS NOT NULL THEN 'hour'
                    WHEN d IS NOT NULL THEN 'day'
                    ELSE 'week' END AS grain,
               COALESCE(h, d, wk) AS bucket_start,
               n_events, sum_value
        FROM g
        ORDER BY grain, bucket_start
    """)


@register(
    "streaming_sliding_window_append",
    oracle="""
    WITH wm AS (SELECT epoch_ms(MAX(ts)) - 7200000 AS wm FROM events),
    wins AS (
      SELECT make_timestamp(
               ((epoch_ms(ts) // 1800000) * 1800000 - j.j * 1800000) * 1000
             ) AS window_start,
             event_type
      FROM events CROSS JOIN (SELECT unnest(range(0, 4)) AS j) j)
    SELECT window_start, event_type, COUNT(*) AS n_events
    FROM wins
    WHERE epoch_ms(window_start) + 7200000 <= (SELECT wm FROM wm)
    GROUP BY window_start, event_type
    ORDER BY window_start, event_type
    """,
)
def streaming_sliding_window_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (2h window / 30min slide) through a real
    Structured Streaming drain in APPEND mode — each event joins 4
    overlapping windows and only watermark-closed windows are emitted
    (the open head of the stream is withheld). The oracle replays the
    window membership and the end<=watermark emission rule in SQL,
    ms truncation included."""
    import os as _os

    from .streaming.incremental import sliding_window_counts

    out = sliding_window_counts(
        spark, _os.path.join(sf_dir, "events.parquet"),
        window_duration="2 hours", slide="30 minutes", watermark="2 hours",
    )
    return out.orderBy("window_start", "event_type")


@register(
    "decision_stump_classifier",
    oracle="""
    WITH q AS (
      SELECT vec_id,
             [GREATEST(CAST(ROUND(CAST(x AS DOUBLE) * 64, 0) AS INT) + 128, 0)
              FOR x IN embedding] AS qv,
             CASE WHEN label < 5 THEN 1 ELSE 0 END AS y
      FROM embeddings),
    expl AS (
      SELECT vec_id, y, unnest(qv) AS val,
             unnest(range(1, len(qv) + 1)) AS d
      FROM q),
    cnt AS (
      SELECT d, val,
             SUM(y) AS pos, COUNT(*) - SUM(y) AS neg
      FROM expl GROUP BY d, val),
    cum AS (
      SELECT d, val,
             SUM(pos) OVER (PARTITION BY d ORDER BY val
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lp,
             SUM(neg) OVER (PARTITION BY d ORDER BY val
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ln
      FROM cnt),
    tot AS (SELECT SUM(y) AS tp, COUNT(*) - SUM(y) AS tn, COUNT(*) AS n FROM q),
    scored AS (
      SELECT d, val,
             GREATEST(lp, ln) + GREATEST(tp - lp, tn - ln) AS n_correct, n
      FROM cum, tot)
    SELECT CAST(d AS INT) AS dim, CAST(val AS INT) AS threshold,
           CAST(n_correct AS BIGINT) AS n_correct,
           ROUND(CAST(n_correct AS DOUBLE) / n, 6) AS accuracy
    FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY n_correct DESC, d, val) AS rn
          FROM scored)
    WHERE rn = 1
    """,
)
def decision_stump_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best single-feature decision stump over the quantized embedding
    table for the binary target label<5 — distributed exhaustive split
    search, the building block of tree ensembles. For every (dimension,
    threshold) the split accuracy comes from one cumulative window over
    per-(dim,value) class counts — integer arithmetic throughout, so the
    argmax (ties to lowest dim, then threshold) is engine-exact. One
    shuffle on (dim,value) + a window over the (tiny) count table; the
    corpus never flows into the window."""
    emb = _t(spark, sf_dir, "embeddings")
    q = sim_mod.quantize_for_kmeans(emb, "vec_id", "embedding").join(
        emb.select("vec_id", F.when(F.col("label") < 5, 1).otherwise(0).alias("y")),
        "vec_id",
    )
    expl = q.select(
        "y", F.posexplode("qv").alias("d0", "val")
    ).select((F.col("d0") + 1).alias("d"), "val", "y")
    cnt = expl.groupBy("d", "val").agg(
        F.sum("y").alias("pos"),
        (F.count(F.lit(1)) - F.sum("y")).alias("neg"),
    )
    wcum = (
        Window.partitionBy("d")
        .orderBy("val")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = cnt.select(
        "d",
        "val",
        F.sum("pos").over(wcum).alias("lp"),
        F.sum("neg").over(wcum).alias("ln"),
    )
    tot = q.agg(
        F.sum("y").alias("tp"),
        (F.count(F.lit(1)) - F.sum("y")).alias("tn"),
        F.count(F.lit(1)).alias("n"),
    )
    scored = cum.join(F.broadcast(tot)).select(
        "d",
        "val",
        (
            F.greatest("lp", "ln")
            + F.greatest(F.col("tp") - F.col("lp"), F.col("tn") - F.col("ln"))
        ).alias("n_correct"),
        "n",
    )
    wtop = Window.orderBy(F.desc("n_correct"), "d", "val")
    return (
        scored.withColumn("rn", F.row_number().over(wtop))
        .filter(F.col("rn") == 1)
        .select(
            F.col("d").cast("int").alias("dim"),
            F.col("val").cast("int").alias("threshold"),
            F.col("n_correct").cast("bigint").alias("n_correct"),
            F.round(F.col("n_correct").cast("double") / F.col("n"), 6).alias("accuracy"),
        )
    )


@register(
    "embedding_pq_assign",
    oracle="""
    WITH q AS (
      SELECT vec_id,
             [GREATEST(CAST(ROUND(CAST(x AS DOUBLE) * 64, 0) AS INT) + 128, 0)
              FOR x IN embedding] AS qv
      FROM embeddings),
    expl AS (
      SELECT vec_id, unnest(qv) AS val,
             unnest(range(0, len(qv))) AS pos0
      FROM q),
    dims AS (
      SELECT vec_id, pos0 // 8 AS sub, pos0 % 8 AS dpos, val FROM expl),
    cents AS (
      SELECT vec_id AS cid, sub, dpos, val AS cval FROM dims WHERE vec_id < 16),
    dists AS (
      SELECT d.vec_id, d.sub, c.cid,
             SUM((d.val - c.cval) * (d.val - c.cval)) AS dist
      FROM dims d JOIN cents c ON c.sub = d.sub AND c.dpos = d.dpos
      GROUP BY d.vec_id, d.sub, c.cid),
    assign AS (
      SELECT vec_id, sub, cid, dist FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                                     ORDER BY dist, cid) AS rn
        FROM dists)
      WHERE rn = 1)
    SELECT CAST(sub AS INT) AS subspace,
           COUNT(*) AS n_vectors,
           CAST(COUNT(DISTINCT cid) AS INT) AS n_codes_used,
           ROUND(CAST(SUM(dist) AS DOUBLE) / COUNT(*), 6) AS avg_sq_err
    FROM assign
    GROUP BY sub
    ORDER BY subspace
    """,
)
def embedding_pq_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization code assignment: 64-dim vectors split into 8
    subspaces of 8 dims, each subvector snapped to its nearest of 16
    deterministic codebook entries (the sub-vectors of ids 0..15) in exact
    integer L2. Reports codebook utilization + mean quantization error per
    subspace — the calibration readout you tune M/K with before committing
    a 100 TB ANN index to PQ codes. The distance computation is one
    (sub,dpos)-keyed join + aggregate: distance-table shaped, no per-row
    Python, linear in vectors x codebook."""
    emb = _t(spark, sf_dir, "embeddings")
    q = sim_mod.quantize_for_kmeans(emb, "vec_id", "embedding")
    dims = q.select(
        "vec_id", F.posexplode("qv").alias("pos0", "val")
    ).select(
        "vec_id",
        (F.col("pos0") / 8).cast("int").alias("sub"),
        (F.col("pos0") % 8).alias("dpos"),
        "val",
    )
    cents = dims.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("cid"), "sub", "dpos", F.col("val").alias("cval")
    )
    dists = (
        dims.join(F.broadcast(cents), ["sub", "dpos"])
        .groupBy("vec_id", "sub", "cid")
        .agg(
            F.sum(
                (F.col("val") - F.col("cval")) * (F.col("val") - F.col("cval"))
            ).alias("dist")
        )
    )
    wmin = Window.partitionBy("vec_id", "sub").orderBy("dist", "cid")
    assign = (
        dists.withColumn("rn", F.row_number().over(wmin)).filter(F.col("rn") == 1)
    )
    return (
        assign.groupBy("sub")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.countDistinct("cid").cast("int").alias("n_codes_used"),
            F.round(F.sum("dist").cast("double") / F.count(F.lit(1)), 6).alias(
                "avg_sq_err"
            ),
        )
        .select(
            F.col("sub").cast("int").alias("subspace"),
            "n_vectors",
            "n_codes_used",
            "avg_sq_err",
        )
        .orderBy("subspace")
    )


@register(
    "training_corpus_pipeline",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, lang,
             regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm,
             {_NB_WORDS} AS ws, text
      FROM documents WHERE trim(text) != ''),
    canon AS (
      SELECT MIN(doc_id) AS keep_id, norm, COUNT(*) AS n_copies
      FROM base GROUP BY norm),
    survivors AS (
      SELECT b.* FROM base b JOIN canon c ON b.doc_id = c.keep_id),
    flagged AS (
      SELECT doc_id, lang, len(ws) AS n_tokens,
             CASE WHEN len(ws) BETWEEN 20 AND 100000
                   AND 3 * len(ws) <= len(list_aggregate(ws, 'string_agg', ''))
                   AND len(list_aggregate(ws, 'string_agg', '')) <= 10 * len(ws)
                  THEN 1 ELSE 0 END AS quality_ok
      FROM survivors),
    dups AS (SELECT SUM(n_copies - 1) AS n_dups FROM canon)
    SELECT lang,
           COUNT(*) AS n_docs_unique,
           CAST(SUM(quality_ok) AS BIGINT) AS n_docs_kept,
           CAST(SUM(CASE WHEN quality_ok = 1 THEN n_tokens ELSE 0 END) AS BIGINT)
             AS tokens_kept,
           (SELECT CAST(n_dups AS BIGINT) FROM dups) AS corpus_exact_dups
    FROM flagged
    GROUP BY lang
    ORDER BY lang
    """,
)
def training_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-corpus curation pipeline in one lazy plan:
    normalize → exact-dedup (keep lowest doc_id per content) → quality
    gate (word-count + mean-word-length rules) → per-language token
    budget. This is the composition story: each stage is an operator the
    registry also checks in isolation, chained without materialization so
    Catalyst fuses the projections and the only shuffles are the dedup
    hash-agg and the final rollup."""
    docs = _t(spark, sf_dir, "documents").filter(F.trim(F.col("text")) != "")
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    ws = F.split(norm, " ")
    base = docs.select("doc_id", "lang", norm.alias("norm"), ws.alias("ws"))
    canon = base.groupBy("norm").agg(
        F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies")
    )
    survivors = base.join(
        canon.select(F.col("keep_id").alias("doc_id"), F.lit(1).alias("__k")),
        "doc_id",
    )
    n = F.size("ws")
    total_chars = F.length(F.concat_ws("", F.col("ws")))
    flagged = survivors.select(
        "doc_id",
        "lang",
        n.alias("n_tokens"),
        F.when(
            n.between(20, 100000)
            & (3 * n <= total_chars)
            & (total_chars <= 10 * n),
            1,
        )
        .otherwise(0)
        .alias("quality_ok"),
    )
    dups = canon.agg(
        F.sum(F.col("n_copies") - 1).cast("bigint").alias("corpus_exact_dups")
    )
    return (
        flagged.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs_unique"),
            F.sum("quality_ok").cast("bigint").alias("n_docs_kept"),
            F.sum(F.when(F.col("quality_ok") == 1, F.col("n_tokens")).otherwise(0))
            .cast("bigint")
            .alias("tokens_kept"),
        )
        .join(F.broadcast(dups))
        .orderBy("lang")
    )


_LANG_HITS_SQL = """
    WITH toks AS (
      SELECT doc_id, lang,
             [lower(w) FOR w IN (CASE WHEN trim(text) = '' THEN []
                                 ELSE string_split_regex(trim(text), '\\s+') END)] AS words
      FROM documents),
    hits AS (
      SELECT doc_id, lang,
             len(list_filter(words, w -> list_contains(['der','die','und','das','ein'], w))) AS h_de,
             len(list_filter(words, w -> list_contains(['the','and','of','to','a'], w))) AS h_en,
             len(list_filter(words, w -> list_contains(['el','la','de','que','y'], w))) AS h_es,
             len(list_filter(words, w -> list_contains(['le','la','de','et','un'], w))) AS h_fr
      FROM toks),
    pred AS (
      SELECT doc_id, lang AS true_lang,
             CASE WHEN greatest(h_de, h_en, h_es, h_fr) = 0 THEN 'und'
                  WHEN h_de = greatest(h_de, h_en, h_es, h_fr) THEN 'de'
                  WHEN h_en = greatest(h_de, h_en, h_es, h_fr) THEN 'en'
                  WHEN h_es = greatest(h_de, h_en, h_es, h_fr) THEN 'es'
                  ELSE 'fr' END AS pred_lang
      FROM hits)
"""


@register(
    "lang_id_confusion_matrix",
    oracle=_LANG_HITS_SQL + """
    SELECT true_lang, pred_lang, COUNT(*) AS n
    FROM pred GROUP BY true_lang, pred_lang
    ORDER BY true_lang, pred_lang
    """,
)
def lang_id_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Evaluation harness for the n-gram language identifier: confusion
    matrix of predicted vs labeled language over the corpus. One narrow
    pass + a tiny (langs²) aggregate — the quality readout you run before
    trusting lang-id as a 100 TB routing key."""
    docs = _t(spark, sf_dir, "documents")
    pred = docs.select(
        F.col("lang").alias("true_lang"),
        tx.lang_id(F.col("text")).alias("pred_lang"),
    )
    return (
        pred.groupBy("true_lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("true_lang", "pred_lang")
    )


@register(
    "tokenizer_fertility_by_lang",
    oracle=f"""
    WITH t AS (
      SELECT lang,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_ws,
             len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]')) AS n_bpe
      FROM documents)
    SELECT lang,
           CAST(SUM(n_ws) AS BIGINT) AS whitespace_tokens,
           CAST(SUM(n_bpe) AS BIGINT) AS subword_tokens,
           ROUND(CAST(SUM(n_bpe) AS DOUBLE) / SUM(n_ws), 6) AS fertility
    FROM t WHERE n_ws > 0
    GROUP BY lang ORDER BY lang
    """,
)
def tokenizer_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility (subword tokens per whitespace word) per
    language — the compression readout that drives per-language token
    budgets in a multilingual training mix. Pure built-in expressions;
    single narrow pass + langs-sized aggregate."""
    docs = _t(spark, sf_dir, "documents")
    t = docs.select(
        "lang",
        tx.token_count(F.col("text")).alias("n_ws"),
        tx.bpe_token_estimate(F.col("text")).alias("n_bpe"),
    ).filter(F.col("n_ws") > 0)
    return (
        t.groupBy("lang")
        .agg(
            F.sum("n_ws").cast("bigint").alias("whitespace_tokens"),
            F.sum("n_bpe").cast("bigint").alias("subword_tokens"),
            F.round(
                F.sum("n_bpe").cast("double") / F.sum("n_ws"), 6
            ).alias("fertility"),
        )
        .orderBy("lang")
    )


_ORACLES["similarity_lsh_recall_eval"] = f"""
    SELECT ex.query_id,
           CAST(COUNT(*) AS INT) AS n_exact,
           CAST(SUM(CASE WHEN ap.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS INT)
             AS n_hit,
           ROUND(SUM(CASE WHEN ap.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) /
                 CAST(COUNT(*) AS DOUBLE), 6) AS recall
    FROM ({_ORACLES["similarity_bruteforce_topk"]}) ex
    LEFT JOIN ({_ORACLES["similarity_lsh_topk"]}) ap
      ON ap.query_id = ex.query_id AND ap.neighbor_id = ex.neighbor_id
    GROUP BY ex.query_id
    ORDER BY ex.query_id
    """


@register("similarity_lsh_recall_eval")
def similarity_lsh_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k evaluation of the LSH index against the brute-force ground
    truth — the accept/reject gate before pointing an ANN index at the
    full corpus. Composes the two oracle-checked retrievals and joins on
    (query, neighbor); the oracle composes the exact same two SQL bodies,
    so the measured recall itself is value-checked."""
    emb = _t(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    qs = emb.filter(F.col("vec_id") < 5)
    exact = sim_mod.cosine_topk(emb, qs, k=3)
    approx = sim_mod.lsh_topk(emb, qs, dim=dim, k=3).select(
        F.col("query_id").alias("aq"), F.col("neighbor_id").alias("an")
    )
    joined = exact.join(
        approx,
        (F.col("query_id") == F.col("aq")) & (F.col("neighbor_id") == F.col("an")),
        "left",
    )
    return (
        joined.groupBy("query_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_exact"),
            F.sum(F.when(F.col("an").isNotNull(), 1).otherwise(0))
            .cast("int")
            .alias("n_hit"),
            F.round(
                F.sum(F.when(F.col("an").isNotNull(), 1).otherwise(0))
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("recall"),
        )
        .orderBy("query_id")
    )


@register(
    "grouped_median_mad_doclen",
    oracle="""
    WITH d AS (SELECT lang AS group_key, n_chars FROM documents),
    ranked AS (
      SELECT group_key, n_chars,
             ROW_NUMBER() OVER (PARTITION BY group_key ORDER BY n_chars) AS rn,
             COUNT(*) OVER (PARTITION BY group_key) AS n
      FROM d),
    med AS (
      SELECT group_key, n AS n_rows, n_chars AS median
      FROM ranked WHERE rn = (n - 1) // 2 + 1),
    dev AS (
      SELECT d.group_key, abs(d.n_chars - m.median) AS ad, m.n_rows, m.median
      FROM d JOIN med m USING (group_key)),
    dranked AS (
      SELECT group_key, n_rows, median, ad,
             ROW_NUMBER() OVER (PARTITION BY group_key ORDER BY ad) AS rn
      FROM dev)
    SELECT group_key, n_rows, median, ad AS mad
    FROM dranked WHERE rn = (n_rows - 1) // 2 + 1
    ORDER BY group_key
    """,
)
def grouped_median_mad_doclen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map UDF surface (applyInPandas): per-language lower-median
    and median-absolute-deviation of document length — whole-group pandas
    logic that needs the full sorted group, shuffled once on the group
    key. Medians are selections (never interpolated), so the DuckDB
    window-based replica matches exactly."""
    from .operators import grouped as grouped_mod

    docs = _t(spark, sf_dir, "documents")
    return grouped_mod.grouped_median_mad(docs, "lang", "n_chars").orderBy(
        "group_key"
    )


@register(
    "arrow_text_byte_stats",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(length(text)) AS BIGINT) AS total_chars,
           CAST(SUM(strlen(text)) AS BIGINT) AS total_bytes,
           ROUND(CAST(SUM(strlen(text)) AS DOUBLE) / SUM(length(text)), 6)
             AS bytes_per_char
    FROM documents WHERE length(text) > 0
    GROUP BY lang ORDER BY lang
    """,
)
def arrow_text_byte_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-native UDF surface (mapInArrow): UTF-8 char vs byte counts
    per language via pyarrow.compute kernels on the raw record batches —
    no pandas materialization, the cheapest Python path for byte-level
    columnar work. bytes_per_char > 1 flags multi-byte scripts, the input
    to byte-budgeted tokenizer planning."""
    from .operators import grouped as grouped_mod

    docs = _t(spark, sf_dir, "documents")
    per_row = grouped_mod.arrow_text_bytes(docs)
    return (
        per_row.filter(F.col("n_chars") > 0)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.sum("n_bytes").cast("bigint").alias("total_bytes"),
            F.round(
                F.sum("n_bytes").cast("double") / F.sum("n_chars"), 6
            ).alias("bytes_per_char"),
        )
        .orderBy("lang")
    )


@register(
    "streaming_chained_window_rollup",
    oracle="""
    WITH wm AS (SELECT epoch_ms(MAX(ts)) - 7200000 AS wm FROM events),
    hourly AS (
      SELECT date_trunc('hour', ts) AS h, COUNT(*) AS n
      FROM events GROUP BY 1)
    SELECT CAST(date_trunc('day', h) AS TIMESTAMP) AS day_start,
           CAST(SUM(n) AS BIGINT) AS n_events,
           COUNT(*) AS n_hours
    FROM hourly
    WHERE epoch_ms(CAST(date_trunc('day', h) AS TIMESTAMP)) + 86400000
            <= (SELECT wm FROM wm)
    GROUP BY 1 ORDER BY day_start
    """,
)
def streaming_chained_window_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two chained stateful operators in ONE streaming query: hourly
    tumbling counts re-windowed (window_time) into a daily rollup — the
    continuous-aggregate cascade a time-series store maintains, executed
    by Structured Streaming's multi-stateful-operator support. Append
    emits a day only after the watermark passes its end; the oracle
    replays the hourly→daily cascade and the emission rule."""
    import os as _os

    from .streaming.incremental import chained_window_rollup

    out = chained_window_rollup(
        spark, _os.path.join(sf_dir, "events.parquet")
    )
    return out.orderBy("day_start")


_ORACLES["embedding_semantic_clusters"] = f"""
    WITH RECURSIVE
    pairs AS (SELECT id_a, id_b FROM ({_ORACLES["embedding_near_dup_pairs"]})),
    edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    reach(id, r) AS (
      SELECT src, src FROM edges
      UNION
      SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src),
    comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id)
    SELECT component AS cluster_id, COUNT(*) AS size
    FROM comp GROUP BY component
    ORDER BY size DESC, cluster_id
    """


@register("embedding_semantic_clusters")
def embedding_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup end-game: hyperplane-bucketed cosine near-dup pairs
    (the oracle-checked embedding_near_dup_pairs output) fed into
    min-label-propagation connected components — the cluster map you keep
    one representative per. Composes two independently-oracled operators;
    the composition itself is value-checked against the recursive-CTE
    transitive closure."""
    from .streaming.stateful import _scoped_shuffle_partitions

    emb = _t(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    pairs = sim_mod.embedding_near_dup_pairs(emb, dim=dim, threshold=0.2)
    with _scoped_shuffle_partitions(emb.sparkSession, 8):
        comp = dedup_mod.connected_components(pairs, "id_a", "id_b")
    return (
        comp.groupBy("component")
        .agg(F.count(F.lit(1)).alias("size"))
        .select(F.col("component").alias("cluster_id"), "size")
        .orderBy(F.desc("size"), "cluster_id")
    )


@register(
    "orders_holt_linear_trend",
    oracle=f"""
    WITH RECURSIVE
    daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(ROUND(SUM(CAST(o_totalprice AS {_DEC})), 2) AS DOUBLE) AS x
      FROM orders GROUP BY 1),
    series AS (
      SELECT ROW_NUMBER() OVER (ORDER BY day) AS i, x FROM daily),
    holt(i, l, t) AS (
      SELECT 1, x, CAST(0 AS DOUBLE) FROM series WHERE i = 1
      UNION ALL
      SELECT s.i,
             0.5 * s.x + 0.5 * (h.l + h.t),
             0.5 * ((0.5 * s.x + 0.5 * (h.l + h.t)) - h.l) + 0.5 * h.t
      FROM holt h JOIN series s ON s.i = h.i + 1)
    SELECT CAST(i AS BIGINT) AS n_days,
           ROUND(l, 6) AS level,
           ROUND(t, 6) AS trend,
           ROUND(l + 7 * t, 6) AS forecast_7d
    FROM holt ORDER BY i DESC LIMIT 1
    """,
)
def orders_holt_linear_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear (level+trend) exponential smoothing over the daily
    revenue series, alpha=beta=0.5 — the two-state cousin of the EWMA
    query. The recurrence is a strictly ordered fold, so the distributed
    part is the daily aggregate; the fold runs over the collected
    (days-sized) array via aggregate() with a struct accumulator, and the
    oracle replays it with a recursive CTE. Halving coefficients keep
    every step an exact double op on both engines."""
    orders = _t(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.round(F.sum(F.col("o_totalprice").cast(_DEC)), 2)
        .cast("double")
        .alias("x")
    )
    arr = daily.agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("day", "x"))), lambda s: s["x"]
        ).alias("xs")
    )
    state = "named_struct('l', CAST(0 AS DOUBLE), 't', CAST(0 AS DOUBLE), 'n', CAST(0 AS BIGINT))"
    step = (
        "(acc, x) -> IF(acc.n = 0, named_struct('l', x, 't', CAST(0 AS DOUBLE), 'n', CAST(1 AS BIGINT)), "
        "named_struct("
        "'l', CAST(0.5 AS DOUBLE) * x + CAST(0.5 AS DOUBLE) * (acc.l + acc.t), "
        "'t', CAST(0.5 AS DOUBLE) * ((CAST(0.5 AS DOUBLE) * x + CAST(0.5 AS DOUBLE) * (acc.l + acc.t)) - acc.l) + CAST(0.5 AS DOUBLE) * acc.t, "
        "'n', acc.n + 1))"
    )
    return arr.select(
        F.expr(f"aggregate(xs, {state}, {step})").alias("h")
    ).select(
        F.col("h.n").alias("n_days"),
        F.round("h.l", 6).alias("level"),
        F.round("h.t", 6).alias("trend"),
        F.round(F.col("h.l") + 7 * F.col("h.t"), 6).alias("forecast_7d"),
    )


@register(
    "map_functions_breadth",
    oracle="""
    WITH cnt AS (
      SELECT user_id, event_type, COUNT(*) AS n
      FROM events GROUP BY user_id, event_type)
    SELECT user_id,
           CAST(COUNT(*) AS INT) AS n_types,
           list_sort(list(event_type)) AS types,
           list_sort(list(event_type) FILTER (n >= 5)) AS heavy_types,
           CAST(SUM(n) AS BIGINT) AS total_events,
           CAST(MAX(n) AS BIGINT) AS max_per_type
    FROM cnt
    WHERE user_id < 50
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def map_functions_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface breadth: per-user event-type counts materialized
    as a real MAP column (map_from_entries), then interrogated with
    map_keys / map_filter / map_values / cardinality + aggregate — the
    five core map operators. Output is flattened to sorted arrays and
    scalars (map iteration order is engine-specific; values aren't).
    The oracle reproduces the semantics from the entry list directly."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    cnt = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    m = cnt.groupBy("user_id").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("event_type", "n")))
        ).alias("m")
    )
    return m.select(
        "user_id",
        F.size(F.map_keys(F.col("m"))).cast("int").alias("n_types"),
        F.sort_array(F.map_keys(F.col("m"))).alias("types"),
        F.sort_array(
            F.map_keys(F.map_filter(F.col("m"), lambda k, v: v >= 5))
        ).alias("heavy_types"),
        F.aggregate(
            F.map_values(F.col("m")), F.lit(0).cast("bigint"), lambda a, x: a + x
        ).alias("total_events"),
        F.array_max(F.map_values(F.col("m"))).cast("bigint").alias("max_per_type"),
    ).orderBy("user_id")


@register(
    "snapshot_diff_incremental",
    oracle="""
    WITH snap_a AS (
      SELECT user_id, event_id FROM (
        SELECT user_id, event_id,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts < TIMESTAMP '2024-02-01 00:00:00')
      WHERE rn = 1),
    snap_b AS (
      SELECT user_id, event_id FROM (
        SELECT user_id, event_id,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts < TIMESTAMP '2024-03-01 00:00:00')
      WHERE rn = 1)
    SELECT change_type, COUNT(*) AS n_keys FROM (
      SELECT CASE WHEN a.user_id IS NULL THEN 'added'
                  WHEN b.user_id IS NULL THEN 'removed'
                  WHEN a.event_id <> b.event_id THEN 'changed'
                  ELSE 'unchanged' END AS change_type
      FROM snap_a a FULL OUTER JOIN snap_b b USING (user_id))
    GROUP BY change_type ORDER BY change_type
    """,
)
def snapshot_diff_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-snapshot reconciliation — the consumer-side check of
    the reference's full-vs-incremental export modes (scan.time.range,
    SURVEY §2.2 P4): latest-record-per-key at two time cutoffs, full-outer
    diff keyed on the entity, rows classified added/changed/unchanged.
    Both snapshots use the max_by shape (one hash-agg each) and the diff
    is a single co-partitioned join on the key — no window over the raw
    corpus, so the plan survives the 100 TB scale-up."""
    ev = _t(spark, sf_dir, "events")

    def snap(cutoff: str) -> DataFrame:
        return (
            ev.filter(F.col("ts") < F.lit(cutoff).cast("timestamp"))
            .groupBy("user_id")
            .agg(
                F.max(F.struct("ts", "event_id")).alias("m")
            )
            .select("user_id", F.col("m.event_id").alias("event_id"))
        )

    a = snap("2024-02-01 00:00:00").select(
        F.col("user_id"), F.col("event_id").alias("eid_a")
    )
    b = snap("2024-03-01 00:00:00").select(
        F.col("user_id"), F.col("event_id").alias("eid_b")
    )
    diff = a.join(b, "user_id", "full_outer").select(
        F.when(F.col("eid_a").isNull(), "added")
        .when(F.col("eid_b").isNull(), "removed")
        .when(F.col("eid_a") != F.col("eid_b"), "changed")
        .otherwise("unchanged")
        .alias("change_type")
    )
    return (
        diff.groupBy("change_type")
        .agg(F.count(F.lit(1)).alias("n_keys"))
        .orderBy("change_type")
    )


@register(
    "k_anonymity_check",
    oracle="""
    WITH spend AS (
      SELECT c_custkey, c_nationkey, c_mktsegment,
             CAST(c_acctbal AS DOUBLE) AS bal
      FROM customer),
    bucketed AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(FLOOR(bal / 1000) AS INT) AS bal_band
      FROM spend),
    groups AS (
      SELECT c_nationkey, c_mktsegment, bal_band, COUNT(*) AS n
      FROM bucketed GROUP BY 1, 2, 3)
    SELECT CAST(5 AS INT) AS k,
           COUNT(*) AS n_groups,
           CAST(SUM(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating,
           CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT) AS n_rows_at_risk,
           CAST(MIN(n) AS BIGINT) AS min_group_size
    FROM groups
    """,
)
def k_anonymity_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over quasi-identifiers (nation, market segment,
    banded account balance): how many equivalence classes fall below
    k=5, and how many rows they expose — the privacy gate a training-data
    release runs before shipping. One hash-agg over the quasi-identifier
    tuple; integer banding keeps it engine-exact."""
    cust = _t(spark, sf_dir, "customer")
    groups = (
        cust.select(
            "c_nationkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal").cast("double") / 1000)
            .cast("int")
            .alias("bal_band"),
        )
        .groupBy("c_nationkey", "c_mktsegment", "bal_band")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return groups.agg(
        F.lit(5).cast("int").alias("k"),
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(F.when(F.col("n") < 5, 1).otherwise(0))
        .cast("bigint")
        .alias("n_violating"),
        F.sum(F.when(F.col("n") < 5, F.col("n")).otherwise(0))
        .cast("bigint")
        .alias("n_rows_at_risk"),
        F.min("n").cast("bigint").alias("min_group_size"),
    )


@register(
    "embedding_matryoshka_error",
    oracle="""
    WITH v AS (
      SELECT vec_id, label,
             [CAST(x AS DOUBLE) FOR x IN embedding] AS fv
      FROM embeddings),
    parts AS (
      SELECT label,
             list_reduce([fv[i] * fv[i] FOR i IN range(1, 17)],
                         (a, b) -> a + b) AS head_sq,
             list_reduce([fv[i] * fv[i] FOR i IN range(1, len(fv) + 1)],
                         (a, b) -> a + b) AS full_sq
      FROM v)
    SELECT label,
           COUNT(*) AS n_vectors,
           -- quantize each ratio to DECIMAL before summing: float-sum
           -- order across partitions must not perturb the average
           ROUND(CAST(SUM(CAST(ROUND(sqrt(head_sq) / sqrt(full_sq), 9)
                               AS DECIMAL(12,9))) AS DOUBLE) / COUNT(*), 6)
             AS avg_cos_to_full,
           ROUND(MIN(sqrt(head_sq) / sqrt(full_sq)), 6) AS min_cos_to_full
    FROM parts GROUP BY label ORDER BY label
    """,
)
def embedding_matryoshka_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation audit: cosine between each embedding and its
    first-16-dims truncation (zero-padded), i.e. ||head|| / ||full|| —
    the retained-similarity readout that decides whether a cheaper
    truncated index is acceptable. Per-label aggregation shows whether
    truncation hurts some classes more. Pure higher-order-function folds,
    JVM-side, no shuffle beyond the label aggregate."""
    emb = _t(spark, sf_dir, "embeddings")
    fv = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    head_sq = F.aggregate(
        F.transform(F.slice(fv, 1, 16), lambda x: x * x),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    full_sq = F.aggregate(
        F.transform(fv, lambda x: x * x), F.lit(0.0), lambda a, x: a + x
    )
    parts = emb.select(
        "label", (F.sqrt(head_sq) / F.sqrt(full_sq)).alias("r")
    )
    return (
        parts.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(
                F.sum(F.round(F.col("r"), 9).cast("decimal(12,9)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_cos_to_full"),
            F.round(F.min("r"), 6).alias("min_cos_to_full"),
        )
        .orderBy("label")
    )


@register(
    "contrastive_hard_negatives",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv, label AS q_label
               FROM embeddings WHERE vec_id < 20),
    scored AS (
      SELECT q.query_id, q.q_label, e.vec_id AS nid, e.label AS n_label,
             {_VDOT_KNN.format(a="q.qv", b="e.embedding")} /
             (sqrt({_VDOT_KNN.format(a="q.qv", b="q.qv")}) *
              sqrt({_VDOT_KNN.format(a="e.embedding", b="e.embedding")})) AS cos
      FROM embeddings e CROSS JOIN q
      WHERE e.vec_id <> q.query_id AND e.label <> q.q_label)
    SELECT query_id, q_label,
           nid AS hard_negative_id,
           CAST(n_label AS INT) AS negative_label,
           ROUND(cos, 6) AS cosine
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY cos DESC, nid) AS rn
          FROM scored)
    WHERE rn = 1
    ORDER BY query_id
    """,
)
def contrastive_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: for each probe
    vector, the most-similar vector with a DIFFERENT label — the
    highest-value negative example. Same broadcast-probe shape as the kNN
    classifier (probes broadcast, corpus streamed; swap candidate
    generation for the LSH path at corpus scale)."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("label").alias("q_label"),
    )
    scored = emb.join(
        F.broadcast(q),
        (F.col("vec_id") != F.col("query_id")) & (F.col("label") != F.col("q_label")),
    ).select(
        "query_id",
        "q_label",
        F.col("vec_id").alias("nid"),
        F.col("label").alias("n_label"),
        sim_mod.cosine(F.col("qv"), F.col("embedding")).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "nid")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "query_id",
            "q_label",
            F.col("nid").alias("hard_negative_id"),
            F.col("n_label").cast("int").alias("negative_label"),
            F.round("cos", 6).alias("cosine"),
        )
        .orderBy("query_id")
    )


@register(
    "packing_nfd_bound",
    oracle="""
    WITH RECURSIVE
    lens AS (
      SELECT doc_id,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE len(string_split_regex(trim(text), '\\s+')) END AS n
      FROM documents),
    capped AS (
      SELECT doc_id, LEAST(n, 256) AS n FROM lens WHERE n > 0),
    ordered AS (
      SELECT ROW_NUMBER() OVER (ORDER BY n DESC, doc_id) AS i, n FROM capped),
    nfd(i, bins, fill) AS (
      SELECT 1, 1, n FROM ordered WHERE i = 1
      UNION ALL
      SELECT o.i,
             CASE WHEN f.fill + o.n <= 256 THEN f.bins ELSE f.bins + 1 END,
             CASE WHEN f.fill + o.n <= 256 THEN f.fill + o.n ELSE o.n END
      FROM nfd f JOIN ordered o ON o.i = f.i + 1)
    SELECT CAST(256 AS INT) AS budget,
           (SELECT COUNT(*) FROM capped) AS n_docs,
           (SELECT CAST(SUM(n) AS BIGINT) FROM capped) AS total_tokens,
           CAST((SELECT CAST(CEIL(SUM(n) / CAST(256 AS DOUBLE)) AS BIGINT)
                 FROM capped) AS BIGINT) AS lower_bound_bins,
           CAST(bins AS BIGINT) AS nfd_bins
    FROM nfd ORDER BY i DESC LIMIT 1
    """,
)
def packing_nfd_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-fit-decreasing packing bound for 256-token training sequences:
    the deterministic, oracle-checkable companion to the partition-local
    FFD packer (sequence_packing_stats) — sort lengths descending, fold a
    single open bin, count bins, compare against the ceil(total/budget)
    lower bound. The fold runs over the collected length array (docs are
    the corpus here, but at scale you run this per shard and sum bins —
    packing is shard-local by design); the oracle replays it with a
    recursive CTE."""
    docs = _t(spark, sf_dir, "documents")
    lens = docs.select(
        "doc_id", tx.token_count(F.col("text")).alias("n")
    ).filter(F.col("n") > 0)
    capped = lens.select("doc_id", F.least(F.col("n"), F.lit(256)).alias("n"))
    arr = capped.agg(
        F.transform(
            F.sort_array(
                F.collect_list(F.struct((-F.col("n")).alias("neg"), "doc_id"))
            ),
            lambda s: -s["neg"],
        ).alias("xs"),
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n").cast("bigint").alias("total_tokens"),
    )
    state = "named_struct('bins', CAST(0 AS BIGINT), 'fill', CAST(0 AS BIGINT))"
    step = (
        "(acc, x) -> IF(acc.bins = 0, named_struct('bins', CAST(1 AS BIGINT), 'fill', CAST(x AS BIGINT)), "
        "IF(acc.fill + x <= 256, named_struct('bins', acc.bins, 'fill', acc.fill + CAST(x AS BIGINT)), "
        "named_struct('bins', acc.bins + 1, 'fill', CAST(x AS BIGINT))))"
    )
    return arr.select(
        F.lit(256).cast("int").alias("budget"),
        "n_docs",
        "total_tokens",
        F.ceil(F.col("total_tokens") / F.lit(256.0).cast("double"))
        .cast("bigint")
        .alias("lower_bound_bins"),
        F.expr(f"aggregate(xs, {state}, {step})").getField("bins").alias("nfd_bins"),
    )


@register(
    "multimodal_ppm_resize_stats",
    oracle="""
    WITH grid AS (
      SELECT t.id, xo.x, yo.y,
             (xo.x * 16) // 8 AS sx, (yo.y * 12) // 6 AS sy
      FROM range(0, 50) t(id)
      CROSS JOIN range(0, 8) xo(x) CROSS JOIN range(0, 6) yo(y)),
    px AS (
      SELECT id, c.c AS ch,
             CAST((id * 31 + (sy * 16 + sx) * 3 + c.c) % 256 AS DOUBLE) AS v
      FROM grid CROSS JOIN range(0, 3) c(c))
    SELECT id AS media_id,
           CAST(8 AS INT) AS out_w, CAST(6 AS INT) AS out_h,
           ROUND(avg(v) FILTER (ch = 0), 6) AS mean_r,
           ROUND(avg(v) FILTER (ch = 1), 6) AS mean_g,
           ROUND(avg(v) FILTER (ch = 2), 6) AS mean_b
    FROM px GROUP BY id ORDER BY media_id
    """,
)
def multimodal_ppm_resize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image resize end-to-end: P6 decode → nearest-neighbor
    16x12 → 8x6 resample (integer source-index grid) → per-channel means,
    inside mapInPandas. The oracle rebuilds the exact resample grid from
    the generator's closed form, so header offsets, row-major indexing,
    and the sampling arithmetic are all value-checked. Completes the
    multimodal verb set: decode, feature-extract, RESIZE, frame-sample."""
    media = mm_mod.synthetic_ppm_media(spark, n=50)
    return mm_mod.ppm_resize_stats(media, out_w=8, out_h=6).orderBy("media_id")


def _lpa_oracle(rounds: int = 2) -> str:
    prev = "l0"
    rounds_sql = []
    for r in range(1, rounds + 1):
        rounds_sql.append(f"""cnt{r} AS (
      SELECT e.src AS node, l.label, COUNT(*) AS n
      FROM esym e JOIN {prev} l ON l.node = e.dst
      GROUP BY e.src, l.label),
    pick{r} AS (
      SELECT node, label AS new_label FROM (
        SELECT node, label,
               ROW_NUMBER() OVER (PARTITION BY node ORDER BY n DESC, label) AS rn
        FROM cnt{r})
      WHERE rn = 1),
    l{r} AS (
      SELECT l.node, COALESCE(p.new_label, l.label) AS label
      FROM {prev} l LEFT JOIN pick{r} p USING (node))""")
        prev = f"l{r}"
    chain = ",\n    ".join(rounds_sql)
    return f"""
    WITH so AS (SELECT DISTINCT l_suppkey AS s, l_orderkey AS o FROM lineitem),
    w AS (
      SELECT a.s AS u, b.s AS v, COUNT(*) AS c
      FROM so a JOIN so b ON a.o = b.o AND a.s < b.s
      GROUP BY a.s, b.s),
    sym0 AS (
      SELECT u AS x, v AS y, c FROM w
      UNION ALL SELECT v, u, c FROM w),
    sel AS (
      SELECT x, y FROM (
        SELECT x, y, ROW_NUMBER() OVER (PARTITION BY x ORDER BY c DESC, y) AS rn
        FROM sym0)
      WHERE rn <= 3),
    e AS (SELECT DISTINCT least(x, y) AS u, greatest(x, y) AS v FROM sel),
    esym AS (SELECT u AS src, v AS dst FROM e UNION ALL SELECT v, u FROM e),
    l0 AS (SELECT s_suppkey AS node, CAST(s_nationkey AS BIGINT) AS label
           FROM supplier),
    {chain}
    SELECT label AS community, COUNT(*) AS n_members
    FROM {prev}
    GROUP BY label
    ORDER BY n_members DESC, community
    """


@register("graph_label_propagation_communities", oracle=_lpa_oracle(rounds=2))
def graph_label_propagation_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous label propagation on the
    top-3-sparsified supplier co-order graph, seeded with nation labels —
    2 rounds, ties to the lowest label, isolated nodes keep their seed.
    The fourth iterative-algorithm family in the engine (after PageRank,
    connected components, and k-means), all value-checked by unrolled SQL
    replicas. Per round: one neighbor-count shuffle + one window over the
    (node,label) count table."""
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    so = li.select(
        F.col("l_suppkey").alias("s"), F.col("l_orderkey").alias("o")
    ).distinct()
    pairs = (
        so.alias("a")
        .join(so.alias("b"), (F.col("a.o") == F.col("b.o")) & (F.col("a.s") < F.col("b.s")))
        .groupBy(F.col("a.s").alias("u"), F.col("b.s").alias("v"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    edges = op_cache.track(
        graph_mod.top_k_cooccurrence_edges(pairs, k=3).cache()
    )
    labels = sup.select(
        F.col("s_suppkey").alias("node"),
        F.col("s_nationkey").cast("bigint").alias("label"),
    )
    final = graph_mod.label_propagation(edges, labels, rounds=2)
    return (
        final.groupBy("label")
        .agg(F.count(F.lit(1)).alias("n_members"))
        .select(F.col("label").alias("community"), "n_members")
        .orderBy(F.desc("n_members"), "community")
    )


_SPARSE_EDGES_CTE = """so AS (SELECT DISTINCT l_suppkey AS s, l_orderkey AS o FROM lineitem),
    w AS (
      SELECT a.s AS u, b.s AS v, COUNT(*) AS c
      FROM so a JOIN so b ON a.o = b.o AND a.s < b.s
      GROUP BY a.s, b.s),
    sym0 AS (
      SELECT u AS x, v AS y, c FROM w
      UNION ALL SELECT v, u, c FROM w),
    sel AS (
      SELECT x, y FROM (
        SELECT x, y, ROW_NUMBER() OVER (PARTITION BY x ORDER BY c DESC, y) AS rn
        FROM sym0)
      WHERE rn <= 3),
    e AS (SELECT DISTINCT least(x, y) AS u, greatest(x, y) AS v FROM sel),
    esym AS (SELECT u AS src, v AS dst FROM e UNION ALL SELECT v, u FROM e)"""


@register(
    "graph_bfs_hop_histogram",
    oracle=f"""
    WITH RECURSIVE
    {_SPARSE_EDGES_CTE},
    start AS (SELECT MIN(u) AS s0 FROM e),
    walk(node, hops) AS (
      SELECT s0, 0 FROM start
      UNION
      SELECT e.dst, w.hops + 1
      FROM walk w JOIN esym e ON e.src = w.node
      WHERE w.hops < 4),
    dist AS (SELECT node, MIN(hops) AS hops FROM walk GROUP BY node)
    SELECT CAST(hops AS INT) AS hops, COUNT(*) AS n_nodes
    FROM dist GROUP BY hops ORDER BY hops
    """,
)
def graph_bfs_hop_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded BFS (4 hops) from the lowest-id vertex of the sparsified
    supplier graph — hop-distance histogram via frontier-expansion joins,
    one shuffle per hop with per-round lineage checkpoints. The oracle's
    recursive CTE takes the MIN hop per node, matching the frontier
    semantics exactly."""
    li = _t(spark, sf_dir, "lineitem")
    so = li.select(
        F.col("l_suppkey").alias("s"), F.col("l_orderkey").alias("o")
    ).distinct()
    pairs = (
        so.alias("a")
        .join(so.alias("b"), (F.col("a.o") == F.col("b.o")) & (F.col("a.s") < F.col("b.s")))
        .groupBy(F.col("a.s").alias("u"), F.col("b.s").alias("v"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    edges = op_cache.track(graph_mod.top_k_cooccurrence_edges(pairs, k=3).cache())
    source = edges.agg(F.min("u")).first()[0]
    dist = graph_mod.bfs_hops(edges, source=int(source), max_hops=4)
    return (
        dist.groupBy("hops")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .select(F.col("hops").cast("int").alias("hops"), "n_nodes")
        .orderBy("hops")
    )


@register(
    "graph_degree_distribution",
    oracle=f"""
    WITH {_SPARSE_EDGES_CTE},
    deg AS (SELECT src AS node, COUNT(*) AS degree FROM esym GROUP BY src)
    SELECT CAST(degree AS INT) AS degree, COUNT(*) AS n_nodes
    FROM deg GROUP BY degree ORDER BY degree
    """,
)
def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree histogram of the sparsified co-order graph — the shape
    readout that validates the top-k sparsifier actually bounded degrees
    (max 2k by construction). Two tiny aggregates over the edge list."""
    li = _t(spark, sf_dir, "lineitem")
    so = li.select(
        F.col("l_suppkey").alias("s"), F.col("l_orderkey").alias("o")
    ).distinct()
    pairs = (
        so.alias("a")
        .join(so.alias("b"), (F.col("a.o") == F.col("b.o")) & (F.col("a.s") < F.col("b.s")))
        .groupBy(F.col("a.s").alias("u"), F.col("b.s").alias("v"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    edges = graph_mod.top_k_cooccurrence_edges(pairs, k=3)
    sym = edges.select(F.col("u").alias("node")).unionAll(
        edges.select(F.col("v").alias("node"))
    )
    deg = sym.groupBy("node").agg(F.count(F.lit(1)).alias("degree"))
    return (
        deg.groupBy("degree")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .select(F.col("degree").cast("int").alias("degree"), "n_nodes")
        .orderBy("degree")
    )


@register(
    "repeated_ngram_loop_detection",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, {_NB_WORDS} AS ws FROM documents WHERE trim(text) != ''),
    grams AS (
      SELECT doc_id,
             unnest(range(1, len(ws) - 2)) AS pos,
             [list_aggregate(ws[i:i+3], 'string_agg', ' ')
              FOR i IN range(1, len(ws) - 2)] AS gs
      FROM words WHERE len(ws) >= 5),
    flat AS (SELECT doc_id, pos, gs[pos] AS g FROM grams),
    rep AS (
      SELECT a.doc_id, MIN(b.pos) AS first_repeat_pos
      FROM flat a JOIN flat b
        ON a.doc_id = b.doc_id AND a.g = b.g AND a.pos < b.pos
      GROUP BY a.doc_id)
    SELECT w.doc_id,
           CAST(len(w.ws) AS INT) AS n_tokens,
           CAST(r.first_repeat_pos AS INT) AS first_repeat_pos,
           CASE WHEN r.first_repeat_pos IS NOT NULL THEN 1 ELSE 0 END AS has_loop
    FROM words w LEFT JOIN rep r USING (doc_id)
    ORDER BY w.doc_id
    """,
)
def repeated_ngram_loop_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generation-loop detector: the first position where a 4-gram repeats
    verbatim inside a document — the truncation point for model-generated
    or boilerplate-looped text (the n-gram analogue of no-repeat-ngram
    decoding checks). Per-document inverted self-join on the gram, cost
    bounded by within-doc gram multiplicity, never cross-document."""
    docs = _t(spark, sf_dir, "documents").filter(F.trim(F.col("text")) != "")
    ws = F.split(
        F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "), " "
    )
    words = docs.select("doc_id", ws.alias("ws"))
    grams = (
        words.filter(F.size("ws") >= 5)
        .select(
            "doc_id",
            F.posexplode(dedup_mod.word_ngrams(F.concat_ws(" ", "ws"), 4)).alias(
                "pos0", "g"
            ),
        )
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "g")
    )
    rep = (
        grams.alias("a")
        .join(
            grams.alias("b"),
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.g") == F.col("b.g"))
            & (F.col("a.pos") < F.col("b.pos")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_id"))
        .agg(F.min(F.col("b.pos")).alias("first_repeat_pos"))
    )
    return (
        words.join(rep, "doc_id", "left")
        .select(
            "doc_id",
            F.size("ws").cast("int").alias("n_tokens"),
            F.col("first_repeat_pos").cast("int").alias("first_repeat_pos"),
            F.when(F.col("first_repeat_pos").isNotNull(), 1)
            .otherwise(0)
            .alias("has_loop"),
        )
        .orderBy("doc_id")
    )


@register(
    "bottomk_hash_sample",
    oracle=f"""
    WITH hashed AS (
      SELECT lang, doc_id,
             {_MD5H.format(col="concat('sample:', CAST(doc_id AS VARCHAR))")} AS h
      FROM documents)
    SELECT lang, doc_id, CAST(rn AS INT) AS sample_rank
    FROM (SELECT lang, doc_id,
                 ROW_NUMBER() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rn
          FROM hashed)
    WHERE rn <= 5
    ORDER BY lang, sample_rank
    """,
)
def bottomk_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bottom-k-by-hash sampling: the MERGEABLE uniform sample (the
    bottom-k sketch) — take the k smallest md5 values per stratum.
    Unlike reservoir sampling it needs no RNG state and unions/merges by
    simply re-taking the bottom k, which is what makes it the 100 TB
    sampling primitive (combine per-partition bottom-k, then global).
    Deterministic: same corpus, same sample, any partitioning."""
    docs = _t(spark, sf_dir, "documents")
    h = F.expr(
        dedup_mod.PORTABLE_HASH_SQL.format(
            col="concat('sample:', CAST(doc_id AS STRING))"
        )
    )
    w = Window.partitionBy("lang").orderBy("h", "doc_id")
    return (
        docs.select("lang", "doc_id", h.alias("h"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("lang", "doc_id", F.col("rn").cast("int").alias("sample_rank"))
        .orderBy("lang", "sample_rank")
    )


@register(
    "span_corruption_masks",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, {_NB_WORDS} AS ws FROM documents
      WHERE doc_id < 50 AND trim(text) != ''),
    pos AS (
      SELECT doc_id, unnest(range(1, len(ws) + 1)) AS p, len(ws) AS n
      FROM words),
    starts AS (
      SELECT doc_id, p, n,
             CASE WHEN ({_MD5H.format(col="concat(CAST(doc_id AS VARCHAR), ':', CAST(p AS VARCHAR))")}) % 7 = 0
                  THEN 1 ELSE 0 END AS is_start
      FROM pos),
    masked AS (
      SELECT s.doc_id, s.n, p2.p AS mp
      FROM starts s
      JOIN pos p2 ON p2.doc_id = s.doc_id
                 AND p2.p BETWEEN s.p AND s.p + 2
      WHERE s.is_start = 1
      GROUP BY s.doc_id, s.n, p2.p)
    SELECT w.doc_id,
           CAST(len(w.ws) AS INT) AS n_tokens,
           CAST(COALESCE(m.n_masked, 0) AS INT) AS n_masked,
           ROUND(CAST(COALESCE(m.n_masked, 0) AS DOUBLE) / len(w.ws), 6)
             AS mask_ratio
    FROM words w
    LEFT JOIN (SELECT doc_id, COUNT(*) AS n_masked FROM masked GROUP BY doc_id) m
      USING (doc_id)
    ORDER BY w.doc_id
    """,
)
def span_corruption_masks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style span-corruption planning: deterministic mask-span starts
    (hash(doc,pos) ≡ 0 mod 7), spans of 3 tokens, overlaps merged — and
    the resulting per-document mask budget. Hash-derived masks make the
    corruption reproducible across runs/engines (no RNG in the data
    path), which is how a distributed pretraining pipeline keeps masking
    consistent between retries."""
    docs = _t(spark, sf_dir, "documents").filter(
        (F.col("doc_id") < 50) & (F.trim(F.col("text")) != "")
    )
    ws = F.split(
        F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "), " "
    )
    words = docs.select("doc_id", ws.alias("ws"))
    pos = words.select(
        "doc_id", F.size("ws").alias("n"), F.posexplode("ws").alias("p0", "_w")
    ).select("doc_id", "n", (F.col("p0") + 1).alias("p"))
    h = F.expr(
        dedup_mod.PORTABLE_HASH_SQL.format(
            col="concat(CAST(doc_id AS STRING), ':', CAST(p AS STRING))"
        )
    )
    starts = pos.withColumn("is_start", F.when(h % 7 == 0, 1).otherwise(0))
    masked = (
        starts.filter(F.col("is_start") == 1)
        .alias("s")
        .join(
            pos.alias("p2"),
            (F.col("p2.doc_id") == F.col("s.doc_id"))
            & (F.col("p2.p") >= F.col("s.p"))
            & (F.col("p2.p") <= F.col("s.p") + 2),
        )
        .select(F.col("s.doc_id").alias("doc_id"), F.col("p2.p").alias("mp"))
        .distinct()
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_masked"))
    )
    return (
        words.join(masked, "doc_id", "left")
        .select(
            "doc_id",
            F.size("ws").cast("int").alias("n_tokens"),
            F.coalesce("n_masked", F.lit(0)).cast("int").alias("n_masked"),
            F.round(
                F.coalesce("n_masked", F.lit(0)).cast("double") / F.size("ws"), 6
            ).alias("mask_ratio"),
        )
        .orderBy("doc_id")
    )


@register(
    "similarity_ivf_list_balance",
    oracle=f"""
    WITH cents AS (
      SELECT vec_id AS cid, embedding AS cv FROM (
        SELECT vec_id, embedding,
               ROW_NUMBER() OVER (ORDER BY
                 {_MD5H.format(col="concat('ivf:', CAST(vec_id AS VARCHAR))")},
                 vec_id) AS rn
        FROM embeddings)
      WHERE rn <= 16),
    scored AS (
      SELECT e.vec_id, c.cid,
             list_dot_product([CAST(x AS DOUBLE) FOR x IN e.embedding],
                              [CAST(x AS DOUBLE) FOR x IN c.cv]) /
             (sqrt(list_dot_product([CAST(x AS DOUBLE) FOR x IN e.embedding],
                                    [CAST(x AS DOUBLE) FOR x IN e.embedding])) *
              sqrt(list_dot_product([CAST(x AS DOUBLE) FOR x IN c.cv],
                                    [CAST(x AS DOUBLE) FOR x IN c.cv]))) AS cos
      FROM embeddings e CROSS JOIN cents c),
    assign AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rn
        FROM scored)
      WHERE rn = 1),
    sizes AS (SELECT cid, COUNT(*) AS n_vectors FROM assign GROUP BY cid),
    tot AS (SELECT COUNT(*) AS n FROM assign)
    SELECT CAST(cid AS BIGINT) AS list_id,
           CAST(n_vectors AS BIGINT) AS n_vectors,
           ROUND(CAST(n_vectors AS DOUBLE) * 16 / (SELECT n FROM tot), 6)
             AS load_factor
    FROM sizes ORDER BY list_id
    """,
)
def similarity_ivf_list_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index diagnostics: inverted-list occupancy and load factor
    (size ÷ ideal size) for 16 md5-sampled centroids — with the PQ error
    readout and LSH recall eval, the third leg of the ANN index
    calibration kit. load_factor ≫ 1 lists are the probe-cost hot spots
    you fix with better centroids before indexing 100 TB. Assignment is
    a broadcast of 16 centroid rows + one argmax window per vector."""
    emb = _t(spark, sf_dir, "embeddings")
    h = F.expr(
        dedup_mod.PORTABLE_HASH_SQL.format(
            col="concat('ivf:', CAST(vec_id AS STRING))"
        )
    )
    cents = (
        emb.select(
            F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"), h.alias("h")
        )
        .orderBy("h", "cid")
        .limit(16)
        .drop("h")
    )
    scored = emb.crossJoin(F.broadcast(cents)).select(
        "vec_id", "cid", sim_mod.cosine(F.col("embedding"), F.col("cv")).alias("cos")
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), "cid")
    assign = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cid")
    )
    sizes = assign.groupBy("cid").agg(F.count(F.lit(1)).alias("n_vectors"))
    tot = assign.agg(F.count(F.lit(1)).alias("n"))
    return (
        sizes.join(F.broadcast(tot))
        .select(
            F.col("cid").cast("bigint").alias("list_id"),
            F.col("n_vectors").cast("bigint").alias("n_vectors"),
            F.round(
                F.col("n_vectors").cast("double") * 16 / F.col("n"), 6
            ).alias("load_factor"),
        )
        .orderBy("list_id")
    )


@register(
    "orders_lttb_downsample",
    oracle=f"""
    WITH RECURSIVE
    daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(ROUND(SUM(CAST(o_totalprice AS {_DEC})), 2) AS DOUBLE) AS y
      FROM orders GROUP BY 1),
    pts AS (
      SELECT datediff('day', DATE '1970-01-01', day) AS x, y,
             ROW_NUMBER() OVER (ORDER BY day) AS rk,
             COUNT(*) OVER () AS n
      FROM daily),
    par AS (
      SELECT n, CAST(CEIL((n - 2) / CAST(10 AS DOUBLE)) AS INT) AS bsize
      FROM pts LIMIT 1),
    firstpt AS (SELECT x, y FROM pts WHERE rk = 1),
    lastpt AS (SELECT p.x, p.y FROM pts p, par WHERE p.rk = par.n),
    mid AS (
      SELECT p.x, p.y, 1 + CAST((p.rk - 2) // par.bsize AS INT) AS b
      FROM pts p, par WHERE p.rk > 1 AND p.rk < par.n),
    bl AS (
      SELECT b,
             list_sort(list({{'x': x, 'y': y}})) AS cands
      FROM mid GROUP BY b),
    bl_avg AS (
      SELECT b, cands,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               [CAST(c.x AS DOUBLE) FOR c IN cands]), (a, v) -> a + v)
               / len(cands) AS ax,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               [c.y FOR c IN cands]), (a, v) -> a + v) / len(cands) AS ay
      FROM bl),
    bl2 AS (
      SELECT cur.b, cur.cands,
             COALESCE(nxt.ax, (SELECT CAST(x AS DOUBLE) FROM lastpt)) AS nax,
             COALESCE(nxt.ay, (SELECT y FROM lastpt)) AS nay
      FROM bl_avg cur LEFT JOIN bl_avg nxt ON nxt.b = cur.b + 1),
    lttb(b, px, py, selx, sely) AS (
      SELECT 0, CAST(x AS DOUBLE), y, CAST(NULL AS INT), CAST(NULL AS DOUBLE)
      FROM firstpt
      UNION ALL
      SELECT b2.b,
             CAST(ch.x AS DOUBLE), ch.y, ch.x, ch.y
      FROM lttb l JOIN bl2 b2 ON b2.b = l.b + 1,
      LATERAL (
        SELECT s.x, s.y FROM (
          SELECT unnest(list_sort(
            [{{'na': -abs((l.px - b2.nax) * (c.y - l.py)
                        - (l.px - CAST(c.x AS DOUBLE)) * (b2.nay - l.py)),
               'x': c.x, 'y': c.y}} FOR c IN b2.cands]))
            AS s LIMIT 1)
      ) ch)
    SELECT x, y FROM firstpt
    UNION ALL SELECT selx, sely FROM lttb WHERE selx IS NOT NULL
    UNION ALL SELECT x, y FROM lastpt
    ORDER BY x
    """,
)
def orders_lttb_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling of the daily revenue
    series to 12 points — the perceptual line-chart decimation algorithm
    (keep the point per bucket that subtends the largest triangle with
    the previously kept point and the next bucket's centroid). The
    sequential selection runs as one aggregate() fold over the collected
    bucket array (buckets are the state, not the corpus — the daily
    aggregate is the distributed part); the oracle replays every pick
    with a recursive CTE + lateral argmin, and the area arithmetic is
    ordered identically on both sides, so even ties resolve the same."""
    orders = _t(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.round(F.sum(F.col("o_totalprice").cast(_DEC)), 2)
        .cast("double")
        .alias("y")
    )
    pts = daily.select(
        F.datediff(F.col("day"), F.lit("1970-01-01").cast("date")).alias("x"), "y"
    )
    n = pts.count()
    k_out = 12
    bsize = -(-(n - 2) // (k_out - 2))
    w = Window.orderBy("x")
    ranked = pts.withColumn("rk", F.row_number().over(w))
    first = ranked.filter(F.col("rk") == 1).select("x", "y").first()
    last = ranked.filter(F.col("rk") == n).select("x", "y").first()
    mid = ranked.filter((F.col("rk") > 1) & (F.col("rk") < n)).withColumn(
        "b", 1 + ((F.col("rk") - 2) / bsize).cast("int")
    )
    bl = mid.groupBy("b").agg(
        F.sort_array(F.collect_list(F.struct("x", "y"))).alias("cands")
    )
    bl = bl.select(
        "b",
        "cands",
        (
            F.aggregate(
                F.col("cands"), F.lit(0.0), lambda a, s: a + s["x"].cast("double")
            )
            / F.size("cands")
        ).alias("ax"),
        (
            F.aggregate(F.col("cands"), F.lit(0.0), lambda a, s: a + s["y"])
            / F.size("cands")
        ).alias("ay"),
    )
    bl2 = (
        bl.alias("cur")
        .join(
            bl.select(
                (F.col("b") - 1).alias("b"),
                F.col("ax").alias("nax"),
                F.col("ay").alias("nay"),
            ).alias("nxt"),
            "b",
            "left",
        )
        .select(
            "b",
            "cands",
            F.coalesce("nax", F.lit(float(last.x))).alias("nax"),
            F.coalesce("nay", F.lit(float(last.y))).alias("nay"),
        )
    )
    buckets = bl2.agg(
        F.sort_array(F.collect_list(F.struct("b", "cands", "nax", "nay"))).alias("bs")
    )
    state = (
        f"named_struct('px', CAST({float(first.x)!r} AS DOUBLE), "
        f"'py', CAST({float(first.y)!r} AS DOUBLE), "
        "'sel', CAST(array() AS ARRAY<STRUCT<x: INT, y: DOUBLE>>))"
    )
    choose = (
        "array_sort(transform(bkt.cands, c -> named_struct("
        "'area', abs((acc.px - bkt.nax) * (c.y - acc.py) "
        "- (acc.px - CAST(c.x AS DOUBLE)) * (bkt.nay - acc.py)), "
        "'x', c.x, 'y', c.y)), "
        "(a, b) -> CASE WHEN a.area > b.area THEN -1 WHEN a.area < b.area THEN 1 "
        "WHEN a.x < b.x THEN -1 WHEN a.x > b.x THEN 1 ELSE 0 END)[0]"
    )
    step = (
        f"(acc, bkt) -> named_struct('px', CAST({choose}.x AS DOUBLE), "
        f"'py', {choose}.y, "
        f"'sel', array_append(acc.sel, named_struct('x', {choose}.x, 'y', {choose}.y)))"
    )
    spark_sel = buckets.select(
        F.explode(F.expr(f"aggregate(bs, {state}, {step})").getField("sel")).alias("s")
    ).select(F.col("s.x").alias("x"), F.col("s.y").alias("y"))
    ends = spark.createDataFrame(
        [(int(first.x), float(first.y)), (int(last.x), float(last.y))],
        "x int, y double",
    )
    return spark_sel.unionByName(ends).orderBy("x")


@register(
    "ks_test_order_totals",
    oracle="""
    WITH a AS (SELECT CAST(o_totalprice AS DOUBLE) AS v FROM orders
               WHERE o_orderpriority = '1-URGENT'),
    b AS (SELECT CAST(o_totalprice AS DOUBLE) AS v FROM orders
          WHERE o_orderpriority = '5-LOW'),
    na AS (SELECT COUNT(*) AS n FROM a),
    nb AS (SELECT COUNT(*) AS n FROM b),
    merged AS (
      SELECT v, 1 AS is_a, 0 AS is_b FROM a
      UNION ALL SELECT v, 0, 1 FROM b),
    cum AS (
      SELECT v,
             SUM(is_a) OVER (ORDER BY v
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
             SUM(is_b) OVER (ORDER BY v
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb
      FROM merged),
    at_v AS (
      SELECT v, MAX(ca) AS ca, MAX(cb) AS cb FROM cum GROUP BY v),
    d AS (
      SELECT MAX(abs(CAST(ca AS DOUBLE) * (SELECT n FROM nb)
                     - CAST(cb AS DOUBLE) * (SELECT n FROM na))) AS dnum
      FROM at_v)
    SELECT (SELECT n FROM na) AS n_a,
           (SELECT n FROM nb) AS n_b,
           ROUND((SELECT dnum FROM d) /
                 ((SELECT CAST(n AS DOUBLE) FROM na) * (SELECT n FROM nb)), 6)
             AS ks_d
    """,
)
def ks_test_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between urgent and low
    priority order totals — distribution-drift detection, computed as
    max |n_b·CA(v) − n_a·CB(v)| / (n_a·n_b) over the merged value points.
    The cumulative counts are integers (the tie-handling MAX per value
    makes both step functions right-continuous), so the sup is exact and
    only one final division happens in floating point."""
    orders = _t(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_totalprice").cast("double").alias("v"),
        F.lit(1).alias("is_a"),
        F.lit(0).alias("is_b"),
    )
    b = orders.filter(F.col("o_orderpriority") == "5-LOW").select(
        F.col("o_totalprice").cast("double").alias("v"),
        F.lit(0).alias("is_a"),
        F.lit(1).alias("is_b"),
    )
    merged = a.unionByName(b)
    wcum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = merged.select(
        "v",
        F.sum("is_a").over(wcum).alias("ca"),
        F.sum("is_b").over(wcum).alias("cb"),
    )
    at_v = cum.groupBy("v").agg(F.max("ca").alias("ca"), F.max("cb").alias("cb"))
    na = a.agg(F.count(F.lit(1)).alias("n_a"))
    nb = b.agg(F.count(F.lit(1)).alias("n_b"))
    return (
        at_v.join(F.broadcast(na))
        .join(F.broadcast(nb))
        .agg(
            F.first("n_a").alias("n_a"),
            F.first("n_b").alias("n_b"),
            F.round(
                F.max(
                    F.abs(
                        F.col("ca").cast("double") * F.col("n_b")
                        - F.col("cb").cast("double") * F.col("n_a")
                    )
                )
                / (F.first("n_a").cast("double") * F.first("n_b")),
                6,
            ).alias("ks_d"),
        )
    )


@register(
    "psi_population_stability",
    oracle="""
    WITH banded AS (
      SELECT CASE WHEN o_orderdate < TIMESTAMP '1995-01-01 00:00:00'
                  THEN 'ref' ELSE 'cur' END AS period,
             LEAST(CAST(o_totalprice / 50000 AS INT), 9) AS band
      FROM orders),
    cnt AS (
      SELECT band,
             SUM(CASE WHEN period = 'ref' THEN 1 ELSE 0 END) AS n_ref,
             SUM(CASE WHEN period = 'cur' THEN 1 ELSE 0 END) AS n_cur
      FROM banded GROUP BY band),
    tot AS (SELECT SUM(n_ref) AS tr, SUM(n_cur) AS tc FROM cnt),
    terms AS (
      SELECT band,
             CAST(ROUND((CAST(n_cur AS DOUBLE) / tc - CAST(n_ref AS DOUBLE) / tr) *
                        ln((CAST(n_cur AS DOUBLE) * tr) /
                           (CAST(n_ref AS DOUBLE) * tc)), 8)
                  AS DECIMAL(18,8)) AS term
      FROM cnt, tot WHERE n_ref > 0 AND n_cur > 0)
    SELECT CAST(COUNT(*) AS INT) AS n_bands,
           CAST(ROUND(SUM(term), 6) AS DOUBLE) AS psi
    FROM terms
    """,
)
def psi_population_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between pre-1995 and post-1995 order
    totals over 10 fixed value bands — the drift metric a production
    scoring pipeline alarms on (PSI > 0.2 = retrain). Each band term is
    rounded then fixed as DECIMAL before the sum, so band order can't
    perturb the result; the ln ratio is assembled left-to-right
    identically on both engines."""
    orders = _t(spark, sf_dir, "orders")
    banded = orders.select(
        F.when(
            F.col("o_orderdate") < F.lit("1995-01-01 00:00:00").cast("timestamp"),
            "ref",
        )
        .otherwise("cur")
        .alias("period"),
        F.least((F.col("o_totalprice") / 50000).cast("int"), F.lit(9)).alias("band"),
    )
    cnt = banded.groupBy("band").agg(
        F.sum(F.when(F.col("period") == "ref", 1).otherwise(0)).alias("n_ref"),
        F.sum(F.when(F.col("period") == "cur", 1).otherwise(0)).alias("n_cur"),
    )
    tot = cnt.agg(F.sum("n_ref").alias("tr"), F.sum("n_cur").alias("tc"))
    terms = (
        cnt.join(F.broadcast(tot))
        .filter((F.col("n_ref") > 0) & (F.col("n_cur") > 0))
        .select(
            F.round(
                (
                    F.col("n_cur").cast("double") / F.col("tc")
                    - F.col("n_ref").cast("double") / F.col("tr")
                )
                * F.log(
                    (F.col("n_cur").cast("double") * F.col("tr"))
                    / (F.col("n_ref").cast("double") * F.col("tc"))
                ),
                8,
            )
            .cast("decimal(18,8)")
            .alias("term")
        )
    )
    return terms.agg(
        F.count(F.lit(1)).cast("int").alias("n_bands"),
        F.round(F.sum("term"), 6).cast("double").alias("psi"),
    )


@register(
    "events_linear_interpolation",
    oracle="""
    WITH daily AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day, COUNT(*) AS n
      FROM events WHERE user_id < 20 GROUP BY 1, 2),
    bounds AS (
      SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY user_id),
    grid AS (
      SELECT b.user_id, CAST(b.d0 + CAST(g.i AS INT) AS DATE) AS day
      FROM bounds b
      CROSS JOIN LATERAL (SELECT unnest(range(0, datediff('day', b.d0, b.d1) + 1)) AS i) g),
    joined AS (
      SELECT g.user_id, g.day, d.n,
             datediff('day', DATE '1970-01-01', g.day) AS x
      FROM grid g LEFT JOIN daily d USING (user_id, day)),
    filled AS (
      SELECT user_id, day, n, x,
             MAX(CASE WHEN n IS NOT NULL THEN x END)
               OVER (PARTITION BY user_id ORDER BY x
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS px,
             MIN(CASE WHEN n IS NOT NULL THEN x END)
               OVER (PARTITION BY user_id ORDER BY x
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nx,
             LAST_VALUE(n IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY x
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             FIRST_VALUE(n IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY x
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv
      FROM joined)
    SELECT user_id,
           COUNT(*) AS n_days,
           CAST(SUM(CASE WHEN n IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_interpolated,
           CAST(ROUND(SUM(CAST(ROUND(
             CASE WHEN n IS NOT NULL THEN CAST(n AS DOUBLE)
                  ELSE CAST(pv AS DOUBLE)
                       + (CAST(nv AS DOUBLE) - pv) * (x - px) / (nx - px)
             END, 6) AS DECIMAL(18,6))), 6) AS DOUBLE) AS total_filled_volume
    FROM filled
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def events_linear_interpolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation over gaps in per-user daily event counts —
    the resampling cousin of LOCF: each missing day gets
    prev + (next-prev)·(d-d_prev)/(d_next-d_prev) between its two known
    neighbors. Densify via sequence(), find neighbors with one forward
    and one backward window pass (no per-gap joins), and the per-row
    rational arithmetic is order-free; sums are decimal-fixed."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    bounds = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    grid = bounds.select(
        "user_id", F.explode(F.sequence("d0", "d1")).alias("day")
    )
    joined = grid.join(daily, ["user_id", "day"], "left").withColumn(
        "x", F.datediff(F.col("day"), F.lit("1970-01-01").cast("date"))
    )
    wb = (
        Window.partitionBy("user_id")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("x")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    known_x = F.when(F.col("n").isNotNull(), F.col("x"))
    filled = joined.select(
        "user_id",
        "n",
        "x",
        F.max(known_x).over(wb).alias("px"),
        F.min(known_x).over(wf).alias("nx"),
        F.last("n", ignorenulls=True).over(wb).alias("pv"),
        F.first("n", ignorenulls=True).over(wf).alias("nv"),
    )
    val = F.when(F.col("n").isNotNull(), F.col("n").cast("double")).otherwise(
        F.col("pv").cast("double")
        + (F.col("nv").cast("double") - F.col("pv"))
        * (F.col("x") - F.col("px"))
        / (F.col("nx") - F.col("px"))
    )
    return (
        filled.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum(F.when(F.col("n").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_interpolated"),
            F.round(
                F.sum(F.round(val, 6).cast("decimal(18,6)")), 6
            )
            .cast("double")
            .alias("total_filled_volume"),
        )
        .orderBy("user_id")
    )


@register(
    "events_cusum_change_detection",
    oracle="""
    WITH RECURSIVE
    daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             COUNT(*) AS x
      FROM events GROUP BY 1),
    kref AS (
      -- reference level: global mean daily count, rounded to an exact
      -- 2dp value so the fold arithmetic is identical in both engines
      SELECT ROUND(CAST(SUM(x) AS DOUBLE) / COUNT(*), 2) AS k FROM daily),
    series AS (
      SELECT ROW_NUMBER() OVER (ORDER BY day) AS i, CAST(x AS DOUBLE) AS x
      FROM daily),
    cusum(i, s, alarms, peak) AS (
      SELECT 1, GREATEST(CAST(0 AS DOUBLE), x - (SELECT k FROM kref)),
             CASE WHEN GREATEST(CAST(0 AS DOUBLE), x - (SELECT k FROM kref))
                       > 2 * (SELECT k FROM kref) THEN 1 ELSE 0 END,
             GREATEST(CAST(0 AS DOUBLE), x - (SELECT k FROM kref))
      FROM series WHERE i = 1
      UNION ALL
      SELECT s2.i,
             GREATEST(CAST(0 AS DOUBLE), c.s + s2.x - (SELECT k FROM kref)),
             c.alarms + CASE WHEN GREATEST(CAST(0 AS DOUBLE),
                                  c.s + s2.x - (SELECT k FROM kref))
                                  > 2 * (SELECT k FROM kref) THEN 1 ELSE 0 END,
             GREATEST(c.peak, GREATEST(CAST(0 AS DOUBLE),
                      c.s + s2.x - (SELECT k FROM kref)))
      FROM cusum c JOIN series s2 ON s2.i = c.i + 1)
    SELECT CAST(i AS BIGINT) AS n_days,
           (SELECT k FROM kref) AS reference_level,
           CAST(alarms AS BIGINT) AS n_alarm_days,
           ROUND(peak, 6) AS peak_cusum
    FROM cusum ORDER BY i DESC LIMIT 1
    """,
)
def events_cusum_change_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM change detection on the daily event-count series:
    s_i = max(0, s_{i-1} + x_i - k) with k = the (rounded) global mean,
    alarm when s exceeds 2k — the standard sequential drift alarm. Like
    Holt/NFD/LTTB the recurrence folds over the collected daily array
    (the distributed work is the daily aggregate); the oracle replays the
    fold with a recursive CTE, and k is rounded once so every step is
    the same double arithmetic on both engines."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("x")
    )
    kref = daily.agg(
        F.round(F.sum("x").cast("double") / F.count(F.lit(1)), 2).alias("k")
    ).first()
    k = float(kref.k)
    arr = daily.agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("day", "x"))),
            lambda s: s["x"].cast("double"),
        ).alias("xs")
    )
    state = (
        "named_struct('s', CAST(0 AS DOUBLE), 'alarms', CAST(0 AS BIGINT), "
        "'peak', CAST(0 AS DOUBLE), 'n', CAST(0 AS BIGINT))"
    )
    step = (
        f"(acc, x) -> named_struct("
        f"'s', GREATEST(CAST(0 AS DOUBLE), acc.s + x - CAST({k!r} AS DOUBLE)), "
        f"'alarms', acc.alarms + IF(GREATEST(CAST(0 AS DOUBLE), acc.s + x - CAST({k!r} AS DOUBLE)) > 2 * CAST({k!r} AS DOUBLE), 1, 0), "
        f"'peak', GREATEST(acc.peak, GREATEST(CAST(0 AS DOUBLE), acc.s + x - CAST({k!r} AS DOUBLE))), "
        f"'n', acc.n + 1)"
    )
    return arr.select(F.expr(f"aggregate(xs, {state}, {step})").alias("c")).select(
        F.col("c.n").alias("n_days"),
        F.lit(k).alias("reference_level"),
        F.col("c.alarms").alias("n_alarm_days"),
        F.round(F.col("c.peak"), 6).alias("peak_cusum"),
    )


@register(
    "js_divergence_lang_unigrams",
    oracle=f"""
    WITH tok AS (
      SELECT lang, unnest({_NB_WORDS}) AS w
      FROM documents WHERE trim(text) != ''),
    cnt AS (SELECT lang, w, COUNT(*) AS c FROM tok GROUP BY lang, w),
    tot AS (SELECT lang, SUM(c) AS t FROM cnt GROUP BY lang),
    langs AS (SELECT DISTINCT lang FROM cnt),
    lp AS (
      SELECT a.lang AS lang_a, b.lang AS lang_b
      FROM langs a JOIN langs b ON a.lang < b.lang),
    vocab AS (
      SELECT lp.lang_a, lp.lang_b, c.w,
             SUM(CASE WHEN c.lang = lp.lang_a THEN c.c ELSE 0 END) AS ca,
             SUM(CASE WHEN c.lang = lp.lang_b THEN c.c ELSE 0 END) AS cb
      FROM lp JOIN cnt c ON c.lang IN (lp.lang_a, lp.lang_b)
      GROUP BY lp.lang_a, lp.lang_b, c.w),
    withtot AS (
      SELECT v.lang_a, v.lang_b, v.w, v.ca, v.cb, ta.t AS ta, tb.t AS tb
      FROM vocab v
      JOIN tot ta ON ta.lang = v.lang_a
      JOIN tot tb ON tb.lang = v.lang_b),
    terms AS (
      SELECT lang_a, lang_b,
             CAST(ROUND(
               CASE WHEN ca > 0 THEN (CAST(ca AS DOUBLE) / ta) *
                 ln((CAST(ca AS DOUBLE) / ta) /
                    ((CAST(ca AS DOUBLE) / ta + CAST(cb AS DOUBLE) / tb) / 2))
               ELSE 0 END +
               CASE WHEN cb > 0 THEN (CAST(cb AS DOUBLE) / tb) *
                 ln((CAST(cb AS DOUBLE) / tb) /
                    ((CAST(ca AS DOUBLE) / ta + CAST(cb AS DOUBLE) / tb) / 2))
               ELSE 0 END, 9) AS DECIMAL(18,9)) AS term
      FROM withtot)
    SELECT lang_a, lang_b,
           CAST(ROUND(SUM(term) / 2, 6) AS DOUBLE) AS js_divergence
    FROM terms GROUP BY lang_a, lang_b
    ORDER BY lang_a, lang_b
    """,
)
def js_divergence_lang_unigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence between every pair of language unigram
    distributions — the mixture-design metric for how separable corpus
    slices are (0 = identical, ln 2 = disjoint). Per-word contributions
    are rounded then decimal-fixed before summing (sum order across the
    shared vocabulary must not move the result); the ln ratios are
    assembled identically on both engines."""
    docs = _t(spark, sf_dir, "documents").filter(F.trim(F.col("text")) != "")
    ws = F.split(
        F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "), " "
    )
    # vocab-sized count table feeds three consumers (pair join, totals,
    # lang list) — materialize once so the corpus tokenizes exactly once
    cnt = op_cache.track(
        docs.select("lang", F.explode(ws).alias("w"))
        .groupBy("lang", "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .cache()
    )
    tot = cnt.groupBy("lang").agg(F.sum("c").alias("t"))
    langs = cnt.select("lang").distinct()
    lp = (
        langs.alias("a")
        .join(langs.alias("b"), F.col("a.lang") < F.col("b.lang"))
        .select(F.col("a.lang").alias("lang_a"), F.col("b.lang").alias("lang_b"))
    )
    vocab = (
        lp.join(
            cnt,
            (F.col("lang") == F.col("lang_a")) | (F.col("lang") == F.col("lang_b")),
        )
        .groupBy("lang_a", "lang_b", "w")
        .agg(
            F.sum(F.when(F.col("lang") == F.col("lang_a"), F.col("c")).otherwise(0)).alias("ca"),
            F.sum(F.when(F.col("lang") == F.col("lang_b"), F.col("c")).otherwise(0)).alias("cb"),
        )
    )
    ta = F.broadcast(tot.select(F.col("lang").alias("lang_a"), F.col("t").alias("ta")))
    tb = F.broadcast(tot.select(F.col("lang").alias("lang_b"), F.col("t").alias("tb")))
    withtot = vocab.join(ta, "lang_a").join(tb, "lang_b")
    pa = F.col("ca").cast("double") / F.col("ta")
    pb = F.col("cb").cast("double") / F.col("tb")
    m = (pa + pb) / 2
    term = (
        F.when(F.col("ca") > 0, pa * F.log(pa / m)).otherwise(F.lit(0.0))
        + F.when(F.col("cb") > 0, pb * F.log(pb / m)).otherwise(F.lit(0.0))
    )
    terms = withtot.select(
        "lang_a", "lang_b", F.round(term, 9).cast("decimal(18,9)").alias("term")
    )
    return (
        terms.groupBy("lang_a", "lang_b")
        .agg(F.round(F.sum("term") / 2, 6).cast("double").alias("js_divergence"))
        .orderBy("lang_a", "lang_b")
    )


@register(
    "unicode_category_profile",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(len(regexp_replace(text, '[^a-zA-Z]', '', 'g')) ) AS BIGINT)
             AS ascii_letters,
           CAST(SUM(len(regexp_replace(text, '[^0-9]', '', 'g'))) AS BIGINT)
             AS digits,
           CAST(SUM(len(regexp_replace(text, '[^ \\t]', '', 'g'))) AS BIGINT)
             AS whitespace,
           CAST(SUM(len(text)
                    - len(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                    - len(regexp_replace(text, '[^0-9]', '', 'g'))
                    - len(regexp_replace(text, '[^ \\t]', '', 'g'))) AS BIGINT)
             AS other_chars,
           ROUND(CAST(SUM(len(text)
                    - len(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                    - len(regexp_replace(text, '[^0-9]', '', 'g'))
                    - len(regexp_replace(text, '[^ \\t]', '', 'g'))) AS DOUBLE)
                 / SUM(len(text)), 6) AS other_ratio
    FROM documents WHERE length(text) > 0
    GROUP BY lang ORDER BY lang
    """,
)
def unicode_category_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-class census per language — ASCII letters, digits,
    whitespace, and everything else (the 'other' bucket is where CJK and
    other non-Latin scripts land) — the byte-level profile that routes
    documents to script-appropriate processing. Integer counts from
    regex strip-and-measure; one narrow pass."""
    docs = _t(spark, sf_dir, "documents").filter(F.length("text") > 0)

    def count_class(pattern: str):
        return F.length(F.regexp_replace(F.col("text"), pattern, ""))

    letters = count_class(r"[^a-zA-Z]")
    digits = count_class(r"[^0-9]")
    wsp = count_class(r"[^ \t]")
    other = F.length("text") - letters - digits - wsp
    return (
        docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(letters).cast("bigint").alias("ascii_letters"),
            F.sum(digits).cast("bigint").alias("digits"),
            F.sum(wsp).cast("bigint").alias("whitespace"),
            F.sum(other).cast("bigint").alias("other_chars"),
            F.round(
                F.sum(other).cast("double") / F.sum(F.length("text")), 6
            ).alias("other_ratio"),
        )
        .orderBy("lang")
    )


@register(
    "mixture_temperature_weights",
    oracle="""
    WITH share AS (
      SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
    tot AS (SELECT SUM(n) AS t FROM share),
    scaled AS (
      SELECT lang, n,
             CAST(ROUND(sqrt(CAST(n AS DOUBLE) / (SELECT t FROM tot)), 9)
                  AS DECIMAL(18,9)) AS s
      FROM share),
    z AS (SELECT SUM(s) AS z FROM scaled)
    SELECT lang, CAST(n AS BIGINT) AS n_docs,
           ROUND(CAST(n AS DOUBLE) / (SELECT t FROM tot), 6) AS raw_share,
           ROUND(CAST(s AS DOUBLE) / CAST((SELECT z FROM z) AS DOUBLE), 6)
             AS temperature_weight
    FROM scaled ORDER BY lang
    """,
)
def mixture_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled sampling weights (T=2, i.e. sqrt-scaling) for
    the per-language training mixture — the standard up-weighting of
    low-resource slices (raw share p → p^(1/T), renormalized). Each
    sqrt is rounded and decimal-fixed before the normalizing sum, so the
    partition order of the 5-row aggregate can't move the weights."""
    docs = _t(spark, sf_dir, "documents")
    share = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    tot = share.agg(F.sum("n").alias("t"))
    scaled = share.join(F.broadcast(tot)).select(
        "lang",
        "n",
        "t",
        F.round(F.sqrt(F.col("n").cast("double") / F.col("t")), 9)
        .cast("decimal(18,9)")
        .alias("s"),
    )
    z = scaled.agg(F.sum("s").alias("z"))
    return (
        scaled.join(F.broadcast(z))
        .select(
            "lang",
            F.col("n").cast("bigint").alias("n_docs"),
            F.round(F.col("n").cast("double") / F.col("t"), 6).alias("raw_share"),
            F.round(
                F.col("s").cast("double") / F.col("z").cast("double"), 6
            ).alias("temperature_weight"),
        )
        .orderBy("lang")
    )


@register(
    "spearman_daily_rank_correlation",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             COUNT(*) AS n_orders,
             SUM(CAST(o_totalprice AS {_DEC})) AS rev
      FROM orders GROUP BY 1),
    ranked AS (
      SELECT ROW_NUMBER() OVER (ORDER BY n_orders, day) AS rx,
             ROW_NUMBER() OVER (ORDER BY rev, day) AS ry
      FROM daily),
    s AS (
      SELECT COUNT(*) AS n,
             SUM(rx * ry) AS sxy, SUM(rx) AS sx, SUM(ry) AS sy,
             SUM(rx * rx) AS sxx, SUM(ry * ry) AS syy
      FROM ranked)
    SELECT CAST(n AS BIGINT) AS n_days,
           ROUND((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
                 (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) *
                  sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6)
             AS spearman_rho
    FROM s
    """,
)
def spearman_daily_rank_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between daily order count and daily
    revenue — the robust monotonic-association measure. Ranks are
    ROW_NUMBERs with a deterministic day tiebreak, so every sum in the
    Pearson-on-ranks formula is an exact integer; floating point appears
    only in the final single expression, ordered identically on both
    engines."""
    orders = _t(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast(_DEC)).alias("rev"),
    )
    ranked = daily.select(
        F.row_number().over(Window.orderBy("n_orders", "day")).alias("rx"),
        F.row_number().over(Window.orderBy("rev", "day")).alias("ry"),
    )
    s = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("rx") * F.col("ry")).alias("sxy"),
        F.sum("rx").alias("sx"),
        F.sum("ry").alias("sy"),
        F.sum(F.col("rx") * F.col("rx")).alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).alias("syy"),
    )
    n_d = F.col("n").cast("double")
    return s.select(
        F.col("n").cast("bigint").alias("n_days"),
        F.round(
            (n_d * F.col("sxy") - F.col("sx").cast("double") * F.col("sy"))
            / (
                F.sqrt(n_d * F.col("sxx") - F.col("sx").cast("double") * F.col("sx"))
                * F.sqrt(n_d * F.col("syy") - F.col("sy").cast("double") * F.col("sy"))
            ),
            6,
        ).alias("spearman_rho"),
    )


@register(
    "dedup_threshold_sweep",
    oracle="""
    WITH sh AS (
      SELECT doc_id, lang,
             list_distinct([list_aggregate(words[i:i+2], 'string_agg', ' ')
                            FOR i IN range(1, len(words) - 1)]) AS shingles
      FROM (SELECT doc_id, lang,
                   string_split_regex(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS words
            FROM documents)
      WHERE len(words) >= 3),
    pairs AS (
      SELECT CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
             len(list_distinct(list_concat(a.shingles, b.shingles))) AS j
      FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id),
    th AS (SELECT unnest([0.1, 0.2, 0.3, 0.4, 0.5]) AS threshold)
    SELECT ROUND(threshold, 2) AS threshold,
           CAST(SUM(CASE WHEN j >= threshold THEN 1 ELSE 0 END) AS BIGINT)
             AS n_pairs
    FROM th, pairs
    GROUP BY threshold ORDER BY threshold
    """,
)
def dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup tuning curve: how many n-gram-Jaccard pairs survive each
    candidate threshold in {0.1..0.5} — the dial you set before a 100 TB
    dedup pass (too low deletes content, too high leaves dupes). One
    blocked pair join scored once; the five thresholds are conditional
    sums over the same scores, not five joins."""
    docs = _t(spark, sf_dir, "documents")
    # threshold = the lowest sweep point: pairs below it can't contribute
    # to any sweep bucket, and the inverted-index path needs a positive cut
    pairs = dedup_mod.ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.1, block_col="lang"
    )
    th = F.array(*[F.lit(x) for x in (0.1, 0.2, 0.3, 0.4, 0.5)])
    return (
        pairs.select(F.col("jaccard").alias("j"))
        .crossJoin(F.broadcast(
            _t(spark, sf_dir, "region").limit(1).select(
                F.explode(th).alias("threshold")
            )
        ))
        .groupBy("threshold")
        .agg(
            F.sum(F.when(F.col("j") >= F.col("threshold"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_pairs")
        )
        .select(F.round("threshold", 2).alias("threshold"), "n_pairs")
        .orderBy("threshold")
    )


@register(
    "events_hourly_autocorrelation",
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS h, COUNT(*) AS x
      FROM events GROUP BY 1),
    idx AS (
      SELECT ROW_NUMBER() OVER (ORDER BY h) AS i, x FROM hourly),
    lagged AS (
      SELECT a.x AS x0, b.x AS x1
      FROM idx a JOIN idx b ON b.i = a.i + 24),
    s AS (
      SELECT COUNT(*) AS n,
             SUM(x0 * x1) AS sxy, SUM(x0) AS sx, SUM(x1) AS sy,
             SUM(x0 * x0) AS sxx, SUM(x1 * x1) AS syy
      FROM lagged)
    SELECT CAST(n AS BIGINT) AS n_pairs,
           ROUND((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
                 (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) *
                  sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6)
             AS autocorr_lag24
    FROM s
    """,
)
def events_hourly_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-24 autocorrelation of the hourly event-count series — the
    daily-seasonality detector (a strong positive value means traffic
    repeats on a 24-hour cycle). Counts are integers, the lag pairing is
    a self-join on the hour index, and every sum in the correlation
    formula stays integer until the single final expression — the same
    exactness discipline as the Spearman query."""
    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count(F.lit(1)).alias("x")
    )
    idx = hourly.select(
        F.row_number().over(Window.orderBy("h")).alias("i"), "x"
    )
    lagged = (
        idx.alias("a")
        .join(idx.alias("b"), F.col("b.i") == F.col("a.i") + 24)
        .select(F.col("a.x").alias("x0"), F.col("b.x").alias("x1"))
    )
    s = lagged.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x0") * F.col("x1")).alias("sxy"),
        F.sum("x0").alias("sx"),
        F.sum("x1").alias("sy"),
        F.sum(F.col("x0") * F.col("x0")).alias("sxx"),
        F.sum(F.col("x1") * F.col("x1")).alias("syy"),
    )
    n_d = F.col("n").cast("double")
    return s.select(
        F.col("n").cast("bigint").alias("n_pairs"),
        F.round(
            (n_d * F.col("sxy") - F.col("sx").cast("double") * F.col("sy"))
            / (
                F.sqrt(n_d * F.col("sxx") - F.col("sx").cast("double") * F.col("sx"))
                * F.sqrt(n_d * F.col("syy") - F.col("sy").cast("double") * F.col("sy"))
            ),
            6,
        ).alias("autocorr_lag24"),
    )


@register(
    "churn_label_generation",
    oracle="""
    WITH horizon AS (SELECT MAX(ts) AS h FROM events),
    per_user AS (
      SELECT user_id,
             COUNT(*) AS n_events,
             MAX(ts) AS last_seen,
             SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS n_purchases
      FROM events GROUP BY user_id)
    SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
           CAST(n_purchases AS BIGINT) AS n_purchases,
           CAST(datediff('day', CAST(last_seen AS DATE),
                         CAST((SELECT h FROM horizon) AS DATE)) AS INT)
             AS days_inactive,
           CASE WHEN datediff('day', CAST(last_seen AS DATE),
                              CAST((SELECT h FROM horizon) AS DATE)) >= 14
                THEN 1 ELSE 0 END AS churn_label
    FROM per_user
    ORDER BY user_id
    """,
)
def churn_label_generation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supervised-label assembly: per-user activity features plus a churn
    label (no activity in the 14 days before the data horizon) — the
    feature/label join a training-data pipeline emits for a tabular
    model. One aggregate + a broadcast scalar horizon; integer day
    arithmetic keeps it engine-exact."""
    ev = _t(spark, sf_dir, "events")
    horizon = ev.agg(F.max("ts").cast("date").alias("h"))
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("ts").alias("last_seen"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "n_purchases"
        ),
    )
    days = F.datediff(F.col("h"), F.col("last_seen").cast("date"))
    return (
        per_user.join(F.broadcast(horizon))
        .select(
            "user_id",
            F.col("n_events").cast("bigint").alias("n_events"),
            F.col("n_purchases").cast("bigint").alias("n_purchases"),
            days.cast("int").alias("days_inactive"),
            F.when(days >= 14, 1).otherwise(0).alias("churn_label"),
        )
        .orderBy("user_id")
    )


@register(
    "dedup_pair_explanations",
    oracle="""
    WITH sh AS (
      SELECT doc_id, lang,
             list_distinct([list_aggregate(words[i:i+2], 'string_agg', ' ')
                            FOR i IN range(1, len(words) - 1)]) AS shingles
      FROM (SELECT doc_id, lang,
                   string_split_regex(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS words
            FROM documents)
      WHERE len(words) >= 3)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(len(a.shingles) AS INT) AS n_shingles_a,
           CAST(len(b.shingles) AS INT) AS n_shingles_b,
           CAST(len(list_intersect(a.shingles, b.shingles)) AS INT) AS n_shared,
           ROUND(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
                 len(list_distinct(list_concat(a.shingles, b.shingles))), 6)
             AS jaccard
    FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
          len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.2
    ORDER BY jaccard DESC, id_a, id_b
    LIMIT 10
    """,
)
def dedup_pair_explanations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explainable dedup: the top near-dup pairs with the evidence a
    reviewer needs — each side's shingle count, the shared count, and
    the resulting Jaccard. Auditability is what makes a destructive
    100 TB dedup pass defensible; this is the human-review view over the
    same blocked pair join the dedup operator runs."""
    docs = _t(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id",
        "lang",
        dedup_mod.word_shingles(F.col("text"), 3).alias("shingles"),
    ).filter(F.size("shingles") >= 1)
    a, b = sh.alias("a"), sh.alias("b")
    inter = F.size(F.array_intersect(F.col("a.shingles"), F.col("b.shingles")))
    union = (
        F.size(F.col("a.shingles")) + F.size(F.col("b.shingles")) - inter
    )
    pairs = (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.size(F.col("a.shingles")).cast("int").alias("n_shingles_a"),
            F.size(F.col("b.shingles")).cast("int").alias("n_shingles_b"),
            inter.cast("int").alias("n_shared"),
            F.round(inter.cast("double") / union, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.2)
    )
    return pairs.orderBy(F.desc("jaccard"), "id_a", "id_b").limit(10)


@register(
    "robust_outlier_docs",
    oracle="""
    WITH d AS (SELECT doc_id, lang, n_chars FROM documents),
    ranked AS (
      SELECT lang, n_chars,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars) AS rn,
             COUNT(*) OVER (PARTITION BY lang) AS n
      FROM d),
    med AS (
      SELECT lang, n_chars AS median FROM ranked WHERE rn = (n - 1) // 2 + 1),
    dev AS (
      SELECT d.lang, abs(d.n_chars - m.median) AS ad
      FROM d JOIN med m USING (lang)),
    dranked AS (
      SELECT lang, ad,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY ad) AS rn,
             COUNT(*) OVER (PARTITION BY lang) AS n
      FROM dev),
    mad AS (SELECT lang, ad AS mad FROM dranked WHERE rn = (n - 1) // 2 + 1)
    SELECT d.doc_id, d.lang, CAST(d.n_chars AS BIGINT) AS n_chars,
           CAST(m.median AS BIGINT) AS lang_median,
           CAST(md.mad AS BIGINT) AS lang_mad
    FROM d JOIN med m USING (lang) JOIN mad md USING (lang)
    WHERE md.mad > 0 AND abs(d.n_chars - m.median) > 3 * md.mad
    ORDER BY d.doc_id
    """,
)
def robust_outlier_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust length outliers: documents more than 3 MADs from their
    language's median length — the grouped-map median/MAD operator
    (applyInPandas) composed back against the corpus, the
    outlier-quarantine step of a curation pipeline. Selection medians
    keep it engine-exact; the per-lang stats broadcast."""
    from .operators import grouped as grouped_mod

    docs = _t(spark, sf_dir, "documents")
    stats = grouped_mod.grouped_median_mad(docs, "lang", "n_chars").select(
        F.col("group_key").alias("lang"),
        F.col("median").alias("lang_median"),
        F.col("mad").alias("lang_mad"),
    )
    return (
        docs.join(F.broadcast(stats), "lang")
        .filter(
            (F.col("lang_mad") > 0)
            & (F.abs(F.col("n_chars") - F.col("lang_median")) > 3 * F.col("lang_mad"))
        )
        .select(
            "doc_id",
            "lang",
            F.col("n_chars").cast("bigint").alias("n_chars"),
            F.col("lang_median").cast("bigint").alias("lang_median"),
            F.col("lang_mad").cast("bigint").alias("lang_mad"),
        )
        .orderBy("doc_id")
    )


@register(
    "events_fano_burstiness",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS x
      FROM events GROUP BY 1, 2),
    s AS (
      SELECT event_type, COUNT(*) AS n, SUM(x) AS sx, SUM(x * x) AS sxx
      FROM hourly GROUP BY event_type)
    SELECT event_type, CAST(n AS BIGINT) AS n_hours,
           ROUND(CAST(sx AS DOUBLE) / n, 6) AS mean_per_hour,
           ROUND((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) /
                 (CAST(n AS DOUBLE) * sx), 6) AS fano_factor
    FROM s ORDER BY event_type
    """,
)
def events_fano_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fano factor (variance-to-mean ratio) of hourly counts per event
    type — the burstiness index (1 = Poisson, >1 = bursty arrivals, the
    signal that decides whether rate-based capacity planning works).
    Integer count sums feed one final double expression — the same
    exactness discipline as the correlation queries."""
    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("h")).agg(
        F.count(F.lit(1)).alias("x")
    )
    s = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    n_d = F.col("n").cast("double")
    return s.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_hours"),
        F.round(F.col("sx").cast("double") / F.col("n"), 6).alias("mean_per_hour"),
        F.round(
            (n_d * F.col("sxx") - F.col("sx").cast("double") * F.col("sx"))
            / (n_d * F.col("sx")),
            6,
        ).alias("fano_factor"),
    ).orderBy("event_type")


@register(
    "quality_dup_contingency",
    oracle=f"""
    WITH base AS (
      SELECT doc_id,
             regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm,
             {_NB_WORDS} AS ws
      FROM documents WHERE trim(text) != ''),
    dup AS (
      SELECT b.doc_id,
             CASE WHEN b.doc_id = MIN(b2.doc_id) THEN 0 ELSE 1 END AS is_dup
      FROM base b JOIN base b2 ON b2.norm = b.norm
      GROUP BY b.doc_id),
    q AS (
      SELECT doc_id,
             CASE WHEN len(ws) BETWEEN 20 AND 100000
                   AND 3 * len(ws) <= len(list_aggregate(ws, 'string_agg', ''))
                   AND len(list_aggregate(ws, 'string_agg', '')) <= 10 * len(ws)
                  THEN 1 ELSE 0 END AS quality_ok
      FROM base),
    cells AS (
      SELECT SUM(CASE WHEN quality_ok = 1 AND is_dup = 1 THEN 1 ELSE 0 END) AS a,
             SUM(CASE WHEN quality_ok = 1 AND is_dup = 0 THEN 1 ELSE 0 END) AS b,
             SUM(CASE WHEN quality_ok = 0 AND is_dup = 1 THEN 1 ELSE 0 END) AS c,
             SUM(CASE WHEN quality_ok = 0 AND is_dup = 0 THEN 1 ELSE 0 END) AS d
      FROM q JOIN dup USING (doc_id))
    SELECT CAST(a AS BIGINT) AS hq_dup, CAST(b AS BIGINT) AS hq_unique,
           CAST(c AS BIGINT) AS lq_dup, CAST(d AS BIGINT) AS lq_unique,
           ROUND(CASE WHEN b * c = 0 THEN NULL
                 ELSE (CAST(a AS DOUBLE) * d) / (CAST(b AS DOUBLE) * c) END, 6)
             AS odds_ratio
    FROM cells
    """,
)
def quality_dup_contingency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does exact-dup removal preferentially discard low-quality text?
    The 2x2 contingency of (quality gate pass, duplicate-copy flag) with
    the odds ratio — the curation-policy sanity check before coupling
    dedup and quality filters. All integer cells; one final ratio."""
    docs = _t(spark, sf_dir, "documents").filter(F.trim(F.col("text")) != "")
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    ws = F.split(norm, " ")
    base = docs.select("doc_id", norm.alias("norm"), ws.alias("ws"))
    canon = base.groupBy("norm").agg(F.min("doc_id").alias("keep_id"))
    dup = base.join(canon, "norm").select(
        "doc_id",
        F.when(F.col("doc_id") == F.col("keep_id"), 0).otherwise(1).alias("is_dup"),
    )
    n = F.size("ws")
    total_chars = F.length(F.concat_ws("", F.col("ws")))
    q = base.select(
        "doc_id",
        F.when(
            n.between(20, 100000)
            & (3 * n <= total_chars)
            & (total_chars <= 10 * n),
            1,
        )
        .otherwise(0)
        .alias("quality_ok"),
    )
    cells = q.join(dup, "doc_id").agg(
        F.sum(F.when((F.col("quality_ok") == 1) & (F.col("is_dup") == 1), 1).otherwise(0)).alias("a"),
        F.sum(F.when((F.col("quality_ok") == 1) & (F.col("is_dup") == 0), 1).otherwise(0)).alias("b"),
        F.sum(F.when((F.col("quality_ok") == 0) & (F.col("is_dup") == 1), 1).otherwise(0)).alias("c"),
        F.sum(F.when((F.col("quality_ok") == 0) & (F.col("is_dup") == 0), 1).otherwise(0)).alias("d"),
    )
    return cells.select(
        F.col("a").cast("bigint").alias("hq_dup"),
        F.col("b").cast("bigint").alias("hq_unique"),
        F.col("c").cast("bigint").alias("lq_dup"),
        F.col("d").cast("bigint").alias("lq_unique"),
        F.round(
            F.when(
                (F.col("b") * F.col("c")) == 0, F.lit(None).cast("double")
            ).otherwise(
                (F.col("a").cast("double") * F.col("d"))
                / (F.col("b").cast("double") * F.col("c"))
            ),
            6,
        ).alias("odds_ratio"),
    )


def _band_sweep_oracle() -> str:
    parts = []
    for b in (8, 16, 32):
        parts.append(
            f"""SELECT * FROM (
    WITH {_minhash_oracle_ctes(64, b)}
    SELECT CAST({b} AS INT) AS bands, CAST(64 / {b} AS INT) AS rows_per_band,
           CAST(COUNT(*) AS BIGINT) AS n_candidate_pairs
    FROM cand)"""
        )
    return "\n    UNION ALL\n    ".join(parts) + "\n    ORDER BY bands"


@register("dedup_minhash_band_sweep", oracle=_band_sweep_oracle())
def dedup_minhash_band_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding sensitivity: candidate-pair counts at 8/16/32 bands
    over the SAME 64-hash MinHash signatures — the (bands, rows) dial
    that trades recall against verification cost (more bands → lower
    per-band specificity → more candidates). Signatures are computed once
    and cached; each sweep point re-bands the cached table, so the
    corpus-scale shingle hashing runs once regardless of sweep width."""
    docs = _t(spark, sf_dir, "documents")
    sig = op_cache.track(
        dedup_mod._minhash_sig_cols(docs, "doc_id", "text", 3, 64, "md5").cache()
    )
    outs = []
    for b in (8, 16, 32):
        cand = dedup_mod._lsh_candidates(sig, "doc_id", 64, b, "md5")
        outs.append(
            cand.agg(F.count(F.lit(1)).cast("bigint").alias("n_candidate_pairs"))
            .select(
                F.lit(b).cast("int").alias("bands"),
                F.lit(64 // b).cast("int").alias("rows_per_band"),
                "n_candidate_pairs",
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("bands")


_ORACLES["dedup_minhash_recall_eval"] = f"""
    SELECT (SELECT COUNT(*) FROM ({_ORACLES["dedup_ngram_jaccard_pairs"]}) ex)
             AS n_exact_pairs,
           (SELECT COUNT(*) FROM ({_ORACLES["dedup_minhash_lsh_pairs"]}) ap)
             AS n_lsh_pairs,
           ROUND(
             (SELECT CAST(COUNT(*) AS DOUBLE)
              FROM ({_ORACLES["dedup_minhash_lsh_pairs"]}) ap
              JOIN ({_ORACLES["dedup_ngram_jaccard_pairs"]}) ex
                ON ex.id_a = ap.id_a AND ex.id_b = ap.id_b) /
             (SELECT COUNT(*) FROM ({_ORACLES["dedup_ngram_jaccard_pairs"]}) ex),
             6) AS recall
    """


@register("dedup_minhash_recall_eval")
def dedup_minhash_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured recall of the MinHash-LSH near-dup detector against the
    exact n-gram-Jaccard ground truth at the same 0.2 threshold — the
    text-dedup acceptance gate (the companion of the embedding-side
    similarity_lsh_recall_eval). Note the exact pass blocks by language
    while LSH does not, so recall can exceed what banding alone implies;
    the oracle composes the two already-checked pipelines verbatim."""
    docs = _t(spark, sf_dir, "documents")
    exact = dedup_mod.ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.2, block_col="lang"
    ).select("id_a", "id_b")
    lsh = dedup_mod.minhash_lsh_pairs(
        docs, "doc_id", "text", n=3, num_hashes=64, bands=16, threshold=0.2,
        hash_fn="md5",
    ).select(F.col("id_a").alias("la"), F.col("id_b").alias("lb"))
    hit = exact.join(
        lsh, (F.col("id_a") == F.col("la")) & (F.col("id_b") == F.col("lb"))
    )
    n_exact = exact.agg(F.count(F.lit(1)).alias("n_exact_pairs"))
    n_lsh = lsh.agg(F.count(F.lit(1)).alias("n_lsh_pairs"))
    n_hit = hit.agg(F.count(F.lit(1)).alias("n_hit"))
    return (
        n_exact.join(F.broadcast(n_lsh))
        .join(F.broadcast(n_hit))
        .select(
            "n_exact_pairs",
            "n_lsh_pairs",
            F.round(
                F.col("n_hit").cast("double") / F.col("n_exact_pairs"), 6
            ).alias("recall"),
        )
    )


# ---------------------------------------------------------------------------
# Storage-layout + join-semantics breadth (round 2): null-aware anti joins,
# bucketed co-located joins, static + dynamic partition pruning, and
# multi-format round-trips. These pin the parts of the engine a 100 TB
# deployment lives and dies by — table layout and scan pruning — with the
# same value-oracle discipline as the relational core.
# ---------------------------------------------------------------------------

_QSTAGE_ROOT: str | None = None


def _qstage(sub: str) -> str:
    """Per-process staging dir for queries that must materialize an
    alternative physical layout (bucketed / partitioned / re-encoded)
    before reading it back. One mkdtemp per process, one subdir per
    query, overwritten on re-run — concurrent processes never collide."""
    global _QSTAGE_ROOT
    import atexit
    import os
    import shutil
    import tempfile

    if _QSTAGE_ROOT is None:
        _QSTAGE_ROOT = tempfile.mkdtemp(prefix="htme_qstage_")
        atexit.register(shutil.rmtree, _QSTAGE_ROOT, True)
    return os.path.join(_QSTAGE_ROOT, sub)


_NULL_AWARE_ANTI_SQL = """
    SELECT
      (SELECT COUNT(*) FROM customer
       WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                               WHERE o_orderstatus = 'F'))
        AS cnt_not_in_clean,
      (SELECT COUNT(*) FROM customer
       WHERE c_custkey NOT IN (SELECT CASE WHEN o_orderstatus = 'P'
                                           THEN NULL ELSE o_custkey END
                               FROM orders))
        AS cnt_not_in_nullable,
      (SELECT COUNT(*) FROM customer
       WHERE c_custkey IN (SELECT CASE WHEN o_orderstatus = 'P'
                                       THEN NULL ELSE o_custkey END
                           FROM orders))
        AS cnt_in_nullable
    """


@register("join_null_aware_anti", oracle=_NULL_AWARE_ANTI_SQL)
def join_null_aware_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN is not an anti join when the list can hold NULLs — ANSI
    three-valued logic makes `x NOT IN (..., NULL)` never-true, so the
    nullable variant counts 0 while the clean variant is a real anti
    join. Catalyst plans the nullable branch as a null-aware anti join
    (single-key BroadcastHashJoin with isNullAware=true) rather than a
    correlated per-row subquery — the semantics corner AND its scalable
    physical plan, pinned against DuckDB running the identical SQL."""
    for t in ("customer", "orders"):
        _t(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_NULL_AWARE_ANTI_SQL)


@register(
    "bucketed_colocated_join",
    oracle=f"""
    SELECT o.o_orderstatus,
           COUNT(*) AS n_lines,
           CAST(ROUND(SUM(CAST(l.l_quantity AS {_DEC})), 2) AS DOUBLE) AS sum_qty,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS {_DEC})), 2) AS DOUBLE)
             AS sum_price
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderstatus
    ORDER BY o.o_orderstatus
    """,
)
def bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shuffle-free fact-fact join: both tables bucketed AND sorted
    by the join key (16 buckets), so the SortMergeJoin reads co-located
    buckets with NO exchange and NO sort on either side — at 100 TB this
    is the difference between a join that moves both tables over the
    network and one that moves nothing. Values must equal the plain
    join on the raw parquet (bucketing is a physical property only),
    which is exactly what the oracle checks."""
    import os

    wh = _qstage("bucketed_wh")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    for name, df, key in (
        ("bkt_orders", orders, "o_orderkey"),
        ("bkt_lineitem", li, "l_orderkey"),
    ):
        (
            df.write.bucketBy(16, key)
            .sortBy(key)
            .option("path", os.path.join(wh, name))
            .mode("overwrite")
            .format("parquet")
            .saveAsTable(name)
        )
    o = spark.table("bkt_orders").hint("merge")
    l = spark.table("bkt_lineitem")
    return (
        o.join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum(F.col("l_quantity").cast(_DEC)), 2)
            .cast("double")
            .alias("sum_qty"),
            F.round(F.sum(F.col("l_extendedprice").cast(_DEC)), 2)
            .cast("double")
            .alias("sum_price"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "partitioned_scan_pruning",
    oracle=f"""
    SELECT CAST(YEAR(o_orderdate) AS INT) AS o_year,
           CAST(MONTH(o_orderdate) AS INT) AS o_month,
           COUNT(*) AS n_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS {_DEC})), 2) AS DOUBLE)
             AS revenue
    FROM orders
    WHERE YEAR(o_orderdate) IN (1996, 1997)
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def partitioned_scan_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partition pruning: orders re-laid-out partitioned by
    year, then a 2-year query reads ONLY those directories — the scan's
    PartitionFilters prune at planning time, no data files outside
    1996/1997 are opened. At 100 TB partition-on-date is the first
    layout decision anyone makes; this pins that the pruned read
    returns byte-identical aggregates to the full-scan-and-filter."""
    stage = _qstage("orders_by_year")
    orders = _t(spark, sf_dir, "orders")
    (
        orders.withColumn("o_year", F.year("o_orderdate").cast("int"))
        .write.partitionBy("o_year")
        .mode("overwrite")
        .parquet(stage)
    )
    part = spark.read.parquet(stage).filter(F.col("o_year").isin(1996, 1997))
    return (
        part.groupBy(
            "o_year", F.month("o_orderdate").cast("int").alias("o_month")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum(F.col("o_totalprice").cast(_DEC)), 2)
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("o_year", "o_month")
    )


@register(
    "dpp_partitioned_fact_join",
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS {_DEC})), 2) AS DOUBLE)
             AS revenue
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def dpp_partitioned_fact_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning: the fact table is partitioned on the
    join key and the filter lives only on the (broadcast) dim side, so
    the partitions to read are only known at RUNTIME — Spark injects a
    dynamic-pruning subquery into the fact scan instead of reading all
    five priority partitions. This is the star-schema scan-reduction
    mechanism at 100 TB (filter on the date/priority dim, never scan
    the cold partitions)."""
    stage = _qstage("orders_by_priority")
    orders = _t(spark, sf_dir, "orders")
    orders.write.partitionBy("o_orderpriority").mode("overwrite").parquet(stage)
    fact = spark.read.parquet(stage)
    dim = (
        orders.select("o_orderpriority").distinct()
        .filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .withColumnRenamed("o_orderpriority", "pri")
    )
    return (
        fact.join(F.broadcast(dim), fact.o_orderpriority == dim.pri)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum(F.col("o_totalprice").cast(_DEC)), 2)
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "format_roundtrip_consistency",
    oracle=f"""
    WITH base AS (
      SELECT COUNT(*) AS n_rows,
             CAST(ROUND(SUM(CAST(l_quantity AS {_DEC})), 2) AS DOUBLE)
               AS sum_qty,
             CAST(ROUND(SUM(CAST(l_extendedprice AS {_DEC})), 2) AS DOUBLE)
               AS sum_price,
             COUNT(DISTINCT l_returnflag) AS n_flags
      FROM lineitem)
    SELECT fmt, n_rows, sum_qty, sum_price, n_flags
    FROM base, (VALUES ('csv'), ('json'), ('orc')) AS f(fmt)
    ORDER BY fmt
    """,
)
def format_roundtrip_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source/sink format breadth: the same projection written to CSV,
    JSON and ORC and read back (CSV/JSON with explicit schemas — never
    schema inference in production paths), then identically aggregated.
    Doubles survive the text formats because Spark writes shortest
    round-trippable representations; the oracle computes the same
    aggregates once from parquet and expects them from every format."""
    import os

    stage = _qstage("fmt_roundtrip")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
        "l_returnflag",
    )
    schema = li.schema
    outs = []
    for fmt in ("csv", "json", "orc"):
        p = os.path.join(stage, fmt)
        w = li.write.mode("overwrite").format(fmt)
        if fmt == "csv":
            w = w.option("header", "true")
        w.save(p)
        r = spark.read.format(fmt)
        if fmt in ("csv", "json"):
            r = r.schema(schema)
            if fmt == "csv":
                r = r.option("header", "true")
        back = r.load(p)
        outs.append(
            back.agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.round(F.sum(F.col("l_quantity").cast(_DEC)), 2)
                .cast("double")
                .alias("sum_qty"),
                F.round(F.sum(F.col("l_extendedprice").cast(_DEC)), 2)
                .cast("double")
                .alias("sum_price"),
                F.countDistinct("l_returnflag").alias("n_flags"),
            ).select(F.lit(fmt).alias("fmt"), "n_rows", "sum_qty",
                     "sum_price", "n_flags")
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("fmt")


# ---------------------------------------------------------------------------
# ML-adjacent breadth (round 2): multi-feature OLS, a depth-2 decision
# tree (the greedy split search distributed), an l-diversity privacy
# audit, and seasonal-naive forecast error — each engine-exact.
# ---------------------------------------------------------------------------

# Sums are exact DECIMALs rounded before the double cast (numerators stay
# under 2^53 at the value-checked scales); every downstream formula is the
# SAME text in both engines, so the double arithmetic is bit-identical.
_OLS_SQL = """
    WITH s AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sx,
             CAST(ROUND(SUM(CAST(l_discount AS DECIMAL(8,4))), 4) AS DOUBLE) AS sy,
             CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sz,
             CAST(ROUND(SUM(CAST(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2)) AS DECIMAL(30,8))), 2) AS DOUBLE) AS sxx,
             CAST(ROUND(SUM(CAST(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(8,4)) AS DECIMAL(30,8))), 4) AS DOUBLE) AS sxy,
             CAST(ROUND(SUM(CAST(CAST(l_discount AS DECIMAL(8,4)) * CAST(l_discount AS DECIMAL(8,4)) AS DECIMAL(30,8))), 6) AS DOUBLE) AS syy,
             CAST(ROUND(SUM(CAST(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(30,8))), 0) AS DOUBLE) AS sxz,
             CAST(ROUND(SUM(CAST(CAST(l_discount AS DECIMAL(8,4)) * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(30,8))), 2) AS DOUBLE) AS syz,
             CAST(ROUND(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(30,8))), 0) AS DOUBLE) AS szz
      FROM lineitem),
    c AS (
      SELECT n, sx / n AS mx, sy / n AS my, sz / n AS mz,
             sxx - sx * sx / n AS cxx, sxy - sx * sy / n AS cxy,
             syy - sy * sy / n AS cyy, sxz - sx * sz / n AS cxz,
             syz - sy * sz / n AS cyz, szz - sz * sz / n AS czz
      FROM s),
    b AS (
      SELECT mx, my, mz, cxz, cyz, czz,
             (cyy * cxz - cxy * cyz) / (cxx * cyy - cxy * cxy) AS b1,
             (cxx * cyz - cxy * cxz) / (cxx * cyy - cxy * cxy) AS b2
      FROM c)
    SELECT ROUND(b1, 6) AS beta_quantity,
           ROUND(b2, 6) AS beta_discount,
           ROUND(mz - b1 * mx - b2 * my, 4) AS intercept,
           ROUND(1 - (czz - b1 * cxz - b2 * cyz) / czz, 6) AS r_squared
    FROM b
    """


@register("ols_regression_2feature", oracle=_OLS_SQL)
def ols_regression_2feature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-feature ordinary least squares (price ~ quantity + discount)
    by the normal equations: ONE aggregate pass collects the 9 moment
    sums in exact DECIMAL, then the closed-form 2x2 solve runs on the
    driver-side 1-row frame. This is the distributed-OLS shape — moments
    are a map-side-combinable aggregate, the solve is O(p^2) on one row
    — and it extends to p features as a p x p Gram matrix. The moment
    sums are rounded before the double cast so the numerators stay
    exactly representable; the solve text is identical in both engines."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_OLS_SQL)


def _stump_sql(src: str) -> str:
    """Best accuracy-split stump over `src` (columns y, qv) — DuckDB SQL
    fragment mirrored by the DataFrame stump in tree_depth2_classifier."""
    return f"""
      SELECT dim, threshold, n_correct, n_node FROM (
        SELECT d AS dim, val AS threshold,
               GREATEST(lp, ln) + GREATEST(tp - lp, tn - ln) AS n_correct,
               n AS n_node,
               ROW_NUMBER() OVER (
                 ORDER BY (GREATEST(lp, ln) + GREATEST(tp - lp, tn - ln)) DESC,
                          d, val) AS rn
        FROM (
          SELECT d, val,
                 SUM(pos) OVER w AS lp, SUM(neg) OVER w AS ln
          FROM (SELECT d, val, SUM(y) AS pos, COUNT(*) - SUM(y) AS neg
                FROM (SELECT y, unnest(qv) AS val,
                             unnest(range(1, len(qv) + 1)) AS d FROM {src})
                GROUP BY d, val)
          WINDOW w AS (PARTITION BY d ORDER BY val
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ), (SELECT SUM(y) AS tp, COUNT(*) - SUM(y) AS tn, COUNT(*) AS n
            FROM {src})
      ) WHERE rn = 1
    """


@register(
    "tree_depth2_classifier",
    oracle=f"""
    WITH q AS (
      SELECT [GREATEST(CAST(ROUND(CAST(x AS DOUBLE) * 64, 0) AS INT) + 128, 0)
              FOR x IN embedding] AS qv,
             CASE WHEN label < 5 THEN 1 ELSE 0 END AS y
      FROM embeddings),
    root AS ({_stump_sql("q")}),
    qL AS (SELECT q.y, q.qv FROM q, root
           WHERE q.qv[root.dim] <= root.threshold),
    qR AS (SELECT q.y, q.qv FROM q, root
           WHERE q.qv[root.dim] > root.threshold),
    lx AS ({_stump_sql("qL")}),
    rx AS ({_stump_sql("qR")})
    SELECT * FROM (
      SELECT 'root' AS node, CAST(dim AS INT) AS dim,
             CAST(threshold AS INT) AS threshold,
             CAST(n_node AS BIGINT) AS n_node,
             CAST(n_correct AS BIGINT) AS n_correct,
             ROUND(CAST(n_correct AS DOUBLE) / n_node, 6) AS accuracy
      FROM root
      UNION ALL
      SELECT 'left', CAST(dim AS INT), CAST(threshold AS INT),
             CAST(n_node AS BIGINT), CAST(n_correct AS BIGINT),
             ROUND(CAST(n_correct AS DOUBLE) / n_node, 6)
      FROM lx
      UNION ALL
      SELECT 'right', CAST(dim AS INT), CAST(threshold AS INT),
             CAST(n_node AS BIGINT), CAST(n_correct AS BIGINT),
             ROUND(CAST(n_correct AS DOUBLE) / n_node, 6)
      FROM rx)
    ORDER BY node
    """,
)
def tree_depth2_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy depth-2 decision tree over the quantized embedding features
    (binary target label<5) — the decision_stump_classifier split search
    applied recursively: best (dim, threshold) at the root, then the best
    stump WITHIN each branch. Split quality is integer split accuracy
    (ties to lowest dim, then threshold), so every argmax is engine-
    exact. Each level is one (dim,value) aggregate + a window over the
    tiny count table; the corpus is cached once and scanned three times
    — at 100 TB this is the per-level histogram pass every distributed
    tree learner (XGBoost-style) runs, with the branch filter pushed into
    the scan rather than materializing per-node copies."""
    emb = _t(spark, sf_dir, "embeddings")
    q = op_cache.track(
        sim_mod.quantize_for_kmeans(emb, "vec_id", "embedding")
        .join(
            emb.select(
                "vec_id", F.when(F.col("label") < 5, 1).otherwise(0).alias("y")
            ),
            "vec_id",
        )
        .select("y", "qv")
        .cache()
    )

    def stump(qdf: DataFrame) -> DataFrame:
        expl = qdf.select("y", F.posexplode("qv").alias("d0", "val")).select(
            (F.col("d0") + 1).alias("d"), "val", "y"
        )
        cnt = expl.groupBy("d", "val").agg(
            F.sum("y").alias("pos"),
            (F.count(F.lit(1)) - F.sum("y")).alias("neg"),
        )
        wcum = (
            Window.partitionBy("d")
            .orderBy("val")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        cum = cnt.select(
            "d", "val",
            F.sum("pos").over(wcum).alias("lp"),
            F.sum("neg").over(wcum).alias("ln"),
        )
        tot = qdf.agg(
            F.sum("y").alias("tp"),
            (F.count(F.lit(1)) - F.sum("y")).alias("tn"),
            F.count(F.lit(1)).alias("n"),
        )
        scored = cum.join(F.broadcast(tot)).select(
            "d", "val",
            (
                F.greatest("lp", "ln")
                + F.greatest(F.col("tp") - F.col("lp"), F.col("tn") - F.col("ln"))
            ).alias("n_correct"),
            F.col("n").alias("n_node"),
        )
        wtop = Window.orderBy(F.desc("n_correct"), "d", "val")
        return (
            scored.withColumn("rn", F.row_number().over(wtop))
            .filter(F.col("rn") == 1)
            .select("d", "val", "n_correct", "n_node")
        )

    root = stump(q)
    rootb = F.broadcast(
        root.select(F.col("d").alias("rd"), F.col("val").alias("rv"))
    )
    qj = q.crossJoin(rootb)
    left = stump(qj.filter(F.expr("element_at(qv, rd) <= rv")).select("y", "qv"))
    right = stump(qj.filter(F.expr("element_at(qv, rd) > rv")).select("y", "qv"))

    def out(node: str, s: DataFrame) -> DataFrame:
        return s.select(
            F.lit(node).alias("node"),
            F.col("d").cast("int").alias("dim"),
            F.col("val").cast("int").alias("threshold"),
            F.col("n_node").cast("bigint").alias("n_node"),
            F.col("n_correct").cast("bigint").alias("n_correct"),
            F.round(
                F.col("n_correct").cast("double") / F.col("n_node"), 6
            ).alias("accuracy"),
        )

    return (
        out("root", root)
        .unionByName(out("left", left))
        .unionByName(out("right", right))
        .orderBy("node")
    )


_LDIV_SQL = """
    WITH joined AS (
      SELECT c.c_nationkey, c.c_mktsegment, o.o_orderpriority AS sens
      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey),
    per_val AS (
      SELECT c_nationkey, c_mktsegment, sens, COUNT(*) AS nv
      FROM joined GROUP BY c_nationkey, c_mktsegment, sens),
    per_grp AS (
      SELECT c_nationkey, c_mktsegment,
             SUM(nv) AS n_rows, COUNT(*) AS l_distinct, MAX(nv) AS max_freq
      FROM per_val GROUP BY c_nationkey, c_mktsegment)
    SELECT CAST(3 AS INT) AS l,
           COUNT(*) AS n_groups,
           CAST(SUM(CASE WHEN l_distinct < 3 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_below_l,
           CAST(SUM(CASE WHEN max_freq * 2 > n_rows THEN 1 ELSE 0 END)
                AS BIGINT) AS n_majority_skewed,
           CAST(MIN(l_distinct) AS BIGINT) AS min_l
    FROM per_grp
    """


@register("l_diversity_audit", oracle=_LDIV_SQL)
def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (the k-anonymity companion): for each quasi-
    identifier class (nation, market segment) count the DISTINCT values
    of the sensitive attribute (order priority) — classes below l=3, and
    classes where one sensitive value holds a majority (vulnerable to
    homogeneity attack even when l is met). Two hash-aggregates, all
    integers; the release gate a curated dataset runs after k-anonymity
    passes."""
    for t in ("customer", "orders"):
        _t(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_LDIV_SQL)


_MASE_SQL = """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS n
      FROM orders GROUP BY CAST(o_orderdate AS DATE)),
    lagd AS (
      SELECT d, n,
             LAG(n, 7) OVER (ORDER BY d) AS n_prev7,
             LAG(n, 1) OVER (ORDER BY d) AS n_prev1
      FROM daily)
    SELECT COUNT(*) AS n_days,
           CAST(SUM(ABS(n - n_prev7)) AS BIGINT) AS sae_seasonal,
           CAST(SUM(ABS(n - n_prev1)) AS BIGINT) AS sae_naive,
           ROUND(CAST(SUM(ABS(n - n_prev7)) AS DOUBLE) /
                 CAST(SUM(ABS(n - n_prev1)) AS DOUBLE), 6) AS mase
    FROM lagd
    WHERE n_prev7 IS NOT NULL AND n_prev1 IS NOT NULL
    """


@register("seasonal_naive_mase", oracle=_MASE_SQL)
def seasonal_naive_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-baseline comparison on the daily order-count series: the
    seasonal-naive predictor (value 7 observations back) scored against
    the naive predictor (previous observation) as a MASE-style absolute-
    error ratio — below 1 means weekly seasonality is real signal, the
    go/no-go check before fitting anything fancier. Integer counts and
    absolute errors keep both engines exact; the lags are observation
    lags over the ordered date spine (robust to calendar gaps)."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_MASE_SQL)


# ---------------------------------------------------------------------------
# Streaming breadth (round 2): event-time outer joins and incremental
# materialization through foreachBatch — the two streaming contracts a
# production pipeline leans on hardest after windowed aggregation.
# ---------------------------------------------------------------------------


@register(
    "streaming_stream_stream_left_outer",
    oracle="""
    WITH m AS (
      SELECT p.user_id, p.event_id AS purchase_id, c.event_id AS click_id
      FROM events p JOIN events c
        ON p.event_type = 'purchase' AND c.event_type = 'click'
       AND c.user_id = p.user_id
       AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts),
    wm AS (
      SELECT LEAST((SELECT MAX(ts) FROM events WHERE event_type = 'purchase'),
                   (SELECT MAX(ts) FROM events WHERE event_type = 'click'))
             - INTERVAL 2 HOUR AS w),
    u AS (
      SELECT p.user_id, p.event_id AS purchase_id,
             CAST(NULL AS BIGINT) AS click_id
      FROM events p, wm
      WHERE p.event_type = 'purchase' AND p.ts < wm.w
        AND NOT EXISTS (SELECT 1 FROM m WHERE m.purchase_id = p.event_id))
    SELECT * FROM (SELECT * FROM m UNION ALL SELECT * FROM u)
    ORDER BY user_id, purchase_id, click_id
    """,
)
def streaming_stream_stream_left_outer(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Watermarked stream-stream LEFT OUTER join, drained availableNow.
    Matched pairs equal the batch range join; an unmatched purchase
    emits a NULL-click row only after the global watermark (min of the
    two stream watermarks = min(max ts) - 2h) passes its event time —
    unmatched purchases inside the final horizon are withheld, which the
    oracle reproduces with the same watermark arithmetic. State stays
    O(rate x horizon): left rows close out as the watermark passes them,
    right rows evict at wm - max_lag."""
    import os as _os

    from .streaming.incremental import stream_stream_left_outer_join

    out = stream_stream_left_outer_join(
        spark, _os.path.join(sf_dir, "events.parquet")
    )
    return out.orderBy("user_id", "purchase_id", "click_id")


@register(
    "streaming_foreachbatch_upsert",
    oracle="""
    WITH ranked AS (
      SELECT user_id, ts, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
    SELECT user_id, ts AS last_ts, event_type AS last_type,
           value AS last_value
    FROM ranked WHERE rn = 1
    ORDER BY user_id
    """,
)
def streaming_foreachbatch_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialization via foreachBatch MERGE: the events
    stream (three forced micro-batches, event_id % 3) maintains a
    latest-per-user serving table with crash-safe staging/backup
    rotation — the continuously-maintained answer to
    latest_event_per_user, and the Spark shape of the reference's
    incremental export feeding a keyed store
    (HbaseToMongoExport incremental run; SURVEY §2.2 P5 applied
    per-batch). The final table must equal the batch latest-per-key
    answer no matter how records were split across batches."""
    import os as _os

    from .streaming.incremental import events_upsert_serving

    out = events_upsert_serving(spark, _os.path.join(sf_dir, "events.parquet"))
    return out.orderBy("user_id")


# ---------------------------------------------------------------------------
# Graph breadth (round 2): k-core decomposition and degree assortativity
# over the same top-3-sparsified supplier co-order graph the triangle /
# label-propagation queries use. Both oracles replay the exact rounds.
# ---------------------------------------------------------------------------

# The sparsified edge list shared by the graph family (see
# graph_triangle_count for the rationale: bounding degree at 2k is what
# keeps every polynomial graph pass polynomial at 100 TB).
_SPARSE_EDGES_SQL = """
    so AS (SELECT DISTINCT l_suppkey AS s, l_orderkey AS o FROM lineitem),
    w AS (
      SELECT a.s AS u, b.s AS v, COUNT(*) AS c
      FROM so a JOIN so b ON a.o = b.o AND a.s < b.s
      GROUP BY a.s, b.s),
    sym AS (
      SELECT u AS x, v AS y, c FROM w
      UNION ALL SELECT v AS x, u AS y, c FROM w),
    sel AS (
      SELECT x, y FROM (
        SELECT x, y,
               ROW_NUMBER() OVER (PARTITION BY x ORDER BY c DESC, y) AS rn
        FROM sym)
      WHERE rn <= 3),
    e AS (
      SELECT DISTINCT least(x, y) AS u, greatest(x, y) AS v FROM sel)
    """


def _kcore_oracle(k: int, rounds: int) -> str:
    parts = [
        "WITH " + _SPARSE_EDGES_SQL.strip().rstrip(),
        """,
    s0 AS (SELECT u AS node FROM e UNION SELECT v AS node FROM e),
    e0 AS (SELECT u, v FROM e)""",
    ]
    for r in range(1, rounds + 1):
        parts.append(f""",
    d{r} AS (SELECT node, COUNT(*) AS deg FROM
             (SELECT u AS node FROM e{r - 1}
              UNION ALL SELECT v AS node FROM e{r - 1}) GROUP BY node),
    s{r} AS (SELECT node FROM d{r} WHERE deg >= {k}),
    e{r} AS (SELECT e.u, e.v FROM e
             JOIN s{r} a ON a.node = e.u JOIN s{r} b ON b.node = e.v)""")
    selects = [
        f"""SELECT CAST({r} AS INT) AS round,
            (SELECT COUNT(*) FROM s{r}) AS n_nodes,
            (SELECT COUNT(*) FROM e{r}) AS n_edges"""
        for r in range(rounds + 1)
    ]
    return "\n".join(parts) + "\nSELECT * FROM (" + \
        " UNION ALL ".join(selects) + ") ORDER BY round"


@register("graph_kcore_decomposition", oracle=_kcore_oracle(3, 4))
def graph_kcore_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative 3-core peeling on the sparsified co-order graph: each
    round drops vertices whose induced degree fell below k, re-inducing
    the edge set on the survivors — 4 synchronous rounds, with the
    (round, nodes, edges) trajectory as the output so the oracle replays
    every round, not just the fixpoint. Per round: one degree aggregate
    + one (vertex-sized, cached) semi-join back onto the edge list — the
    Pregel-lite shape; at 100 TB the edge list is the only corpus-scale
    frame and it is scanned, never shuffled wider than its key."""
    li = _t(spark, sf_dir, "lineitem")
    so = li.select(
        F.col("l_suppkey").alias("s"), F.col("l_orderkey").alias("o")
    ).distinct()
    w = (
        so.alias("a")
        .join(so.alias("b"), (F.col("a.o") == F.col("b.o")) & (F.col("a.s") < F.col("b.s")))
        .groupBy(F.col("a.s").alias("u"), F.col("b.s").alias("v"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # Iterative-algorithm hygiene (same pattern as connected_components):
    # the edge list is localCheckpoint'ed ONCE into a LogicalRDD leaf and
    # every round's survivor set is checkpoint'ed too — checkpoints
    # truncate LINEAGE, not just execution (a cache alone leaves every
    # prior round inside the logical plan, whose tree — and explain
    # string — grows exponentially with rounds, enough to OOM a
    # default-heap driver; skipping the per-round cut instead triggers
    # exponential RECOMPUTE because deg feeds two consumers). Per-round
    # stats come from ONE aggregate over the degree table (|V| = row
    # count, |E| = sum(deg)/2 by the handshake lemma): a round costs two
    # jobs — stats and the survivor checkpoint. 8 shuffle partitions are
    # plenty for the vertex-sized round state.
    from .streaming.stateful import _scoped_shuffle_partitions

    k, rounds = 3, 4
    stats: list[tuple[int, int, int]] = []
    with _scoped_shuffle_partitions(spark, 8):
        e = graph_mod.top_k_cooccurrence_edges(w, k=3).localCheckpoint(
            eager=True
        )
        cur_edges = e
        for r in range(rounds + 1):
            deg = (
                cur_edges.select(F.col("u").alias("node"))
                .unionAll(cur_edges.select(F.col("v").alias("node")))
                .groupBy("node")
                .agg(F.count(F.lit(1)).alias("deg"))
            )
            row = deg.agg(
                F.count(F.lit(1)).alias("n"),
                F.coalesce(F.expr("sum(deg) div 2"), F.lit(0)).alias("m"),
            ).collect()[0]
            stats.append((r, int(row.n), int(row.m)))
            if r == rounds:
                break
            cur_nodes = (
                deg.filter(F.col("deg") >= k)
                .select("node")
                .localCheckpoint(eager=True)
            )
            a = cur_nodes.withColumnRenamed("node", "u")
            b = cur_nodes.withColumnRenamed("node", "v")
            cur_edges = e.join(a, "u", "left_semi").join(b, "v", "left_semi")
    return spark.createDataFrame(
        [(r, int(n), int(m)) for r, n, m in stats],
        "round int, n_nodes bigint, n_edges bigint",
    ).orderBy("round")


@register(
    "graph_degree_assortativity",
    oracle=f"""
    WITH {_SPARSE_EDGES_SQL.strip()},
    deg AS (SELECT node, COUNT(*) AS d FROM
            (SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e)
            GROUP BY node),
    pairs AS (
      SELECT du.d AS dx, dv.d AS dy
      FROM e JOIN deg du ON du.node = e.u JOIN deg dv ON dv.node = e.v
      UNION ALL
      SELECT dv.d AS dx, du.d AS dy
      FROM e JOIN deg du ON du.node = e.u JOIN deg dv ON dv.node = e.v),
    s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                 CAST(SUM(dx) AS DOUBLE) AS sx,
                 CAST(SUM(dy) AS DOUBLE) AS sy,
                 CAST(SUM(dx * dx) AS DOUBLE) AS sxx,
                 CAST(SUM(dy * dy) AS DOUBLE) AS syy,
                 CAST(SUM(dx * dy) AS DOUBLE) AS sxy
          FROM pairs)
    SELECT CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
           ROUND((n * sxy - sx * sy) /
                 (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy)), 6)
             AS assortativity
    FROM s
    """,
)
def graph_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity (Pearson correlation of endpoint degrees over
    both edge orientations) of the sparsified co-order graph — positive
    means hubs pair with hubs, the one-number structure readout used to
    sanity-check a generated graph against the real one. Integer degree
    moment sums are exact; the correlation formula text is identical in
    both engines so the double math is bit-identical."""
    li = _t(spark, sf_dir, "lineitem")
    so = li.select(
        F.col("l_suppkey").alias("s"), F.col("l_orderkey").alias("o")
    ).distinct()
    w = (
        so.alias("a")
        .join(so.alias("b"), (F.col("a.o") == F.col("b.o")) & (F.col("a.s") < F.col("b.s")))
        .groupBy(F.col("a.s").alias("u"), F.col("b.s").alias("v"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    e = op_cache.track(graph_mod.top_k_cooccurrence_edges(w, k=3).cache())
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    ed = e.join(F.broadcast(du), "u").join(F.broadcast(dv), "v")
    pairs = ed.select(
        F.col("du").alias("dx"), F.col("dv").alias("dy")
    ).unionAll(ed.select(F.col("dv").alias("dx"), F.col("du").alias("dy")))
    s = pairs.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("dx").cast("double").alias("sx"),
        F.sum("dy").cast("double").alias("sy"),
        F.sum(F.col("dx") * F.col("dx")).cast("double").alias("sxx"),
        F.sum(F.col("dy") * F.col("dy")).cast("double").alias("syy"),
        F.sum(F.col("dx") * F.col("dy")).cast("double").alias("sxy"),
    )
    ne = e.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    return ne.crossJoin(s).select(
        "n_edges",
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (
                F.sqrt(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
                * F.sqrt(F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
            ),
            6,
        ).alias("assortativity"),
    )


@register(
    "dedup_ngram_containment_pairs",
    oracle="""
    WITH sh AS (
      SELECT doc_id, lang,
             list_distinct([list_aggregate(words[i:i+2], 'string_agg', ' ')
                            FOR i IN range(1, len(words) - 1)]) AS shingles
      FROM (SELECT doc_id, lang,
                   string_split_regex(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS words
            FROM documents)
      WHERE len(words) >= 3),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             len(list_intersect(a.shingles, b.shingles)) AS inter,
             len(a.shingles) AS sz_a, len(b.shingles) AS sz_b
      FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
      WHERE len(list_intersect(a.shingles, b.shingles)) > 0)
    SELECT id_a, id_b,
           ROUND(CAST(inter AS DOUBLE) / sz_a, 6) AS containment_ab,
           ROUND(CAST(inter AS DOUBLE) / sz_b, 6) AS containment_ba,
           ROUND(CAST(inter AS DOUBLE) / (sz_a + sz_b - inter), 6) AS jaccard
    FROM pairs
    WHERE ROUND(CAST(inter AS DOUBLE) / sz_a, 6) >= 0.3
       OR ROUND(CAST(inter AS DOUBLE) / sz_b, 6) >= 0.3
    ORDER BY id_a, id_b
    """,
)
def dedup_ngram_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional shingle containment (Broder) — the asymmetric near-dup
    pass that catches a short document embedded in a longer one, which
    symmetric Jaccard scores low. Same lang-blocked inverted-index join
    as the Jaccard pass; emits pairs where either direction >= 0.3."""
    docs = _t(spark, sf_dir, "documents")
    return dedup_mod.ngram_containment_pairs(
        docs, "doc_id", "text", n=3, threshold=0.3, block_col="lang"
    ).orderBy("id_a", "id_b")


# ---------------------------------------------------------------------------
# Corpus statistics + linear algebra (round 2): Zipf rank-frequency fit,
# Heaps' vocabulary growth, the dominant principal component by power
# iteration, SQL-defined UDFs, and outer-generator semantics.
# ---------------------------------------------------------------------------


@register(
    "zipf_slope_fit",
    oracle="""
    WITH wc AS (
      SELECT w, COUNT(*) AS n
      FROM (SELECT unnest(string_split_regex(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS w
            FROM documents) t
      WHERE w <> '' GROUP BY w),
    ranked AS (
      SELECT w, n, ROW_NUMBER() OVER (ORDER BY n DESC, w) AS r
      FROM wc),
    arrs AS (
      SELECT list(ln(CAST(r AS DOUBLE)) ORDER BY r) AS lx,
             list(ln(CAST(n AS DOUBLE)) ORDER BY r) AS ly
      FROM ranked WHERE r <= 200),
    sums AS (
      SELECT CAST(len(lx) AS DOUBLE) AS m,
             list_reduce(lx, (a, b) -> a + b) AS sx,
             list_reduce(ly, (a, b) -> a + b) AS sy,
             list_reduce([lx[i] * lx[i] FOR i IN range(1, len(lx) + 1)],
                         (a, b) -> a + b) AS sxx,
             list_reduce([lx[i] * ly[i] FOR i IN range(1, len(lx) + 1)],
                         (a, b) -> a + b) AS sxy
      FROM arrs)
    SELECT CAST(m AS BIGINT) AS n_ranks,
           ROUND((m * sxy - sx * sy) / (m * sxx - sx * sx), 6) AS zipf_slope
    FROM sums
    """,
)
def zipf_slope_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law exponent: OLS slope of ln(freq) on ln(rank) over the
    top-200 words — the one-number sanity check that a corpus has
    natural-language-like frequency structure (slope ~ -1). Float sums
    over groups are engine-order-dependent, so the log terms are packed
    into a RANK-ORDERED array and folded left-to-right (Spark
    ``aggregate`` and DuckDB ``list_reduce`` both fold left-to-right and
    match bit-for-bit) — the registry's standard fix for determinism of
    float reductions. The count table is corpus-scale; the array is 200
    elements on one row."""
    docs = _t(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(
            F.split(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "), " ")
        ).alias("w")
    ).filter(F.col("w") != "")
    wc = words.groupBy("w").agg(F.count(F.lit(1)).alias("n"))
    # top-200 via orderBy+limit (TakeOrdered, a per-partition heap +
    # driver merge) — NOT a global row_number window, which would funnel
    # the whole vocabulary through one partition; ranks are then a
    # window over just the 200 survivors
    top = wc.orderBy(F.desc("n"), "w").limit(200)
    wr = Window.orderBy(F.desc("n"), "w")
    ranked = top.withColumn("r", F.row_number().over(wr))
    arrs = ranked.agg(
        F.sort_array(
            F.collect_list(F.struct("r", "n"))
        ).alias("rn")
    ).select(
        F.expr("transform(rn, s -> ln(CAST(s.r AS DOUBLE)))").alias("lx"),
        F.expr("transform(rn, s -> ln(CAST(s.n AS DOUBLE)))").alias("ly"),
    )
    sums = arrs.select(
        F.size("lx").cast("double").alias("m"),
        F.expr("aggregate(lx, CAST(0 AS DOUBLE), (a, b) -> a + b)").alias("sx"),
        F.expr("aggregate(ly, CAST(0 AS DOUBLE), (a, b) -> a + b)").alias("sy"),
        F.expr(
            "aggregate(zip_with(lx, lx, (p, q) -> p * q), CAST(0 AS DOUBLE), (a, b) -> a + b)"
        ).alias("sxx"),
        F.expr(
            "aggregate(zip_with(lx, ly, (p, q) -> p * q), CAST(0 AS DOUBLE), (a, b) -> a + b)"
        ).alias("sxy"),
    )
    return sums.select(
        F.col("m").cast("bigint").alias("n_ranks"),
        F.round(
            (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")),
            6,
        ).alias("zipf_slope"),
    )


def _heaps_oracle() -> str:
    selects = []
    for q in (1, 2, 3, 4):
        selects.append(f"""
      SELECT CAST({q} AS INT) AS quartile,
             (SELECT COUNT(DISTINCT doc_id) FROM wd, nn
              WHERE doc_id * 4 < n_docs * {q}) AS n_docs,
             (SELECT COUNT(*) FROM wd, nn
              WHERE doc_id * 4 < n_docs * {q}) AS n_tokens,
             (SELECT COUNT(DISTINCT w) FROM wd, nn
              WHERE doc_id * 4 < n_docs * {q}) AS n_vocab""")
    return """
    WITH wd AS (
      SELECT doc_id, unnest(string_split_regex(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS w
      FROM documents),
    nn AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT quartile, n_docs, n_tokens, n_vocab,
           ROUND(ln(CAST(n_vocab AS DOUBLE)) / ln(CAST(n_tokens AS DOUBLE)), 6)
             AS heaps_beta
    FROM (""" + " UNION ALL ".join(selects) + """)
    WHERE 1 = 1
    ORDER BY quartile
    """


@register("heaps_law_vocab_growth", oracle=_heaps_oracle())
def heaps_law_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth: distinct-word count at 25/50/75/100%
    corpus prefixes (by doc_id), with the log-log exponent estimate
    beta = ln(V)/ln(N) per prefix — the curve that predicts how much new
    vocabulary another 10x of data buys, which is exactly the question a
    tokenizer-sizing pass asks before training. One explode feeds four
    conditional aggregates (integers; the exponent is a scalar ln ratio,
    deterministic); at 100 TB this is one corpus scan, not four."""
    docs = _t(spark, sf_dir, "documents")
    n_docs = docs.count()
    wd = docs.select(
        "doc_id",
        F.explode(
            F.split(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "), " ")
        ).alias("w"),
    )
    outs = []
    for q in (1, 2, 3, 4):
        pref = wd.filter(F.col("doc_id") * 4 < n_docs * q)
        outs.append(
            pref.agg(
                F.countDistinct("doc_id").alias("n_docs"),
                F.count(F.lit(1)).alias("n_tokens"),
                F.countDistinct("w").alias("n_vocab"),
            ).select(
                F.lit(q).cast("int").alias("quartile"),
                "n_docs",
                "n_tokens",
                "n_vocab",
                F.round(
                    F.log(F.col("n_vocab").cast("double"))
                    / F.log(F.col("n_tokens").cast("double")),
                    6,
                ).alias("heaps_beta"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("quartile")


@register(
    "embedding_power_iteration_pc1",
    oracle="""
    WITH q AS (
      SELECT vec_id,
             [GREATEST(CAST(ROUND(CAST(x AS DOUBLE) * 64, 0) AS INT) + 128, 0) - 192
              FOR x IN embedding] AS xc
      FROM embeddings),
    expl AS (
      SELECT vec_id, unnest(xc) AS x,
             unnest(range(1, len(xc) + 1)) AS i
      FROM q),
    g AS (
      SELECT a.i AS i, b.i AS j, SUM(a.x * b.x) AS gij
      FROM expl a JOIN expl b ON a.vec_id = b.vec_id
      GROUP BY a.i, b.i),
    v1 AS (
      SELECT j, SUM(gij) AS v FROM g GROUP BY j),
    s1 AS (
      SELECT j AS i, CAST(FLOOR(CAST(v AS DOUBLE) / 16384) AS BIGINT) AS s
      FROM v1),
    v2 AS (
      SELECT g.j, SUM(g.gij * s1.s) AS v
      FROM g JOIN s1 ON s1.i = g.i
      GROUP BY g.j),
    nrm AS (
      SELECT SQRT(CAST(SUM(CAST(v AS DECIMAL(19,0)) * CAST(v AS DECIMAL(19,0)))
                       AS DOUBLE)) AS nn
      FROM v2)
    SELECT CAST(j AS INT) AS dim,
           ROUND(CAST(v AS DOUBLE) / nn, 6) AS loading
    FROM v2, nrm
    ORDER BY dim
    """,
)
def embedding_power_iteration_pc1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant principal direction of the (constant-centered, quantized)
    embedding matrix by TWO power-iteration steps on the 64x64 Gram
    matrix — distributed PCA the way it actually runs at scale: the only
    corpus-sized operation is the Gram accumulation (one self-join per
    vector's 64x64 outer product, map-side combinable); the iteration
    itself lives on 64 rows. Exact arithmetic throughout: integer Gram,
    FLOOR-rescale between steps (floor semantics match across engines,
    unlike integer div on negatives), DECIMAL squares for the norm. Sign
    is pinned by the all-ones start vector."""
    emb = _t(spark, sf_dir, "embeddings")
    q = sim_mod.quantize_for_kmeans(emb, "vec_id", "embedding").select(
        "vec_id", F.expr("transform(qv, x -> x - 192)").alias("xc")
    )
    expl = q.select(
        "vec_id", F.posexplode("xc").alias("i0", "x")
    ).select("vec_id", (F.col("i0") + 1).alias("i"), "x")
    g = (
        expl.alias("a")
        .join(expl.alias("b"), "vec_id")
        .groupBy(F.col("a.i").alias("i"), F.col("b.i").alias("j"))
        .agg(F.sum(F.col("a.x") * F.col("b.x")).alias("gij"))
    )
    g = op_cache.track(g.cache())
    v1 = g.groupBy("j").agg(F.sum("gij").alias("v"))
    s1 = v1.select(
        F.col("j").alias("i"),
        F.floor(F.col("v").cast("double") / 16384).cast("bigint").alias("s"),
    )
    v2 = (
        g.join(F.broadcast(s1), "i")
        .groupBy("j")
        .agg(F.sum(F.col("gij") * F.col("s")).alias("v"))
    )
    nrm = v2.agg(
        F.sqrt(
            F.sum(
                F.col("v").cast("decimal(19,0)") * F.col("v").cast("decimal(19,0)")
            ).cast("double")
        ).alias("nn")
    )
    return (
        v2.crossJoin(F.broadcast(nrm))
        .select(
            F.col("j").cast("int").alias("dim"),
            F.round(F.col("v").cast("double") / F.col("nn"), 6).alias("loading"),
        )
        .orderBy("dim")
    )


_SQL_UDF_QUERY = """
    SELECT l_returnflag,
           COUNT(*) AS n,
           CAST(ROUND(SUM(net_price(l_extendedprice, l_discount, l_tax)), 2)
                AS DOUBLE) AS sum_net,
           SUM(CASE WHEN qty_band(l_quantity) = 'bulk' THEN 1 ELSE 0 END)
             AS n_bulk
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """

# The UDF body is decimal-exact (q1's sum_charge pattern): casting the raw
# double COLUMNS to decimal is tie-free, whereas casting a computed double
# product to decimal can land exactly on a .5*10^-scale boundary where the
# engines' double->decimal conversions disagree.
_NET_PRICE_BODY = (
    "CAST({p} AS DECIMAL(18,2)) * CAST(1 - {d} AS DECIMAL(9,4)) "
    "* CAST(1 + {t} AS DECIMAL(9,4))"
)


@register(
    "sql_udf_breadth",
    oracle=f"""
    SELECT l_returnflag,
           COUNT(*) AS n,
           CAST(ROUND(SUM({_NET_PRICE_BODY.format(p="l_extendedprice",
                                                  d="l_discount",
                                                  t="l_tax")}), 2)
                AS DOUBLE) AS sum_net,
           SUM(CASE WHEN (CASE WHEN l_quantity >= 40 THEN 'bulk'
                               WHEN l_quantity >= 10 THEN 'mid'
                               ELSE 'small' END) = 'bulk' THEN 1 ELSE 0 END)
             AS n_bulk
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def sql_udf_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined scalar UDFs (Spark 4 CREATE FUNCTION ... RETURN):
    a net-price expression and a CASE classifier defined as catalog
    functions, used inside an aggregate. Unlike Python UDFs these
    INLINE into the plan — Catalyst substitutes the body, so codegen,
    pushdown and vectorization all still apply (the oracle is literally
    the inlined form). The user-facing contract: business logic shared
    across queries without leaving the JVM fast path."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION net_price("
        "p DOUBLE, d DOUBLE, t DOUBLE) RETURNS DECIMAL(38,10) "
        "RETURN " + _NET_PRICE_BODY.format(p="p", d="d", t="t")
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION qty_band(q DOUBLE) "
        "RETURNS STRING RETURN CASE WHEN q >= 40 THEN 'bulk' "
        "WHEN q >= 10 THEN 'mid' ELSE 'small' END"
    )
    return spark.sql(_SQL_UDF_QUERY)


@register(
    "generator_outer_semantics",
    oracle="""
    WITH po AS (
      SELECT c.c_custkey, c.c_nationkey, o.o_orderkey,
             CAST(o.o_totalprice AS DECIMAL(18,2)) AS total
      FROM customer c LEFT JOIN orders o
        ON o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
    SELECT c_nationkey,
           COUNT(*) AS n_rows,
           COUNT(o_orderkey) AS n_orders,
           CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_empty_customers,
           CAST(ROUND(SUM(total), 2) AS DOUBLE) AS sum_total
    FROM po
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
)
def generator_outer_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OUTER generator semantics: per-customer arrays of pending-order
    structs exploded with inline_outer, which emits one all-NULL row for
    an EMPTY array instead of dropping the customer — the generator-side
    equivalent of a left join, and the semantics corner that silently
    loses rows when someone uses plain explode on sparse nested data.
    The oracle is the relational form (LEFT JOIN) the generator must
    agree with."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    p = orders.filter(F.col("o_orderstatus") == "P").select(
        "o_custkey",
        F.struct(
            F.col("o_orderkey"),
            F.col("o_totalprice").cast(_DEC).alias("total"),
        ).alias("s"),
    )
    arr = (
        cust.join(p, cust.c_custkey == p.o_custkey, "left")
        .groupBy("c_custkey", "c_nationkey")
        .agg(
            F.sort_array(
                F.collect_list("s")
            ).alias("orders_arr")
        )
    )
    ex = arr.select(
        "c_custkey",
        "c_nationkey",
        F.expr("inline_outer(orders_arr)"),
    )
    return (
        ex.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("o_orderkey").alias("n_orders"),
            F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_empty_customers"),
            F.round(F.sum("total"), 2).cast("double").alias("sum_total"),
        )
        .orderBy("c_nationkey")
    )


# ---------------------------------------------------------------------------
# Experimentation + plan-reuse breadth (round 2).
# ---------------------------------------------------------------------------


@register(
    "events_ab_test_zscore",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) % 2
               AS grp,
             SUM(CAST(value AS DECIMAL(18,6))) AS s
      FROM events GROUP BY user_id),
    gtot AS (
      SELECT COUNT(*) AS nu, SUM(s) AS tot FROM per_user),
    assign AS (
      SELECT grp,
             CASE WHEN s * nu > tot THEN 1 ELSE 0 END AS converted
      FROM per_user, gtot),
    agg AS (
      SELECT CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS DOUBLE) AS n_a,
             CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS DOUBLE) AS n_b,
             CAST(SUM(CASE WHEN grp = 0 THEN converted ELSE 0 END) AS DOUBLE) AS c_a,
             CAST(SUM(CASE WHEN grp = 1 THEN converted ELSE 0 END) AS DOUBLE) AS c_b
      FROM assign)
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           CAST(c_a AS BIGINT) AS conv_a, CAST(c_b AS BIGINT) AS conv_b,
           ROUND((c_a / n_a) - (c_b / n_b), 6) AS conv_rate_diff,
           ROUND(CASE WHEN (c_a + c_b) = 0 OR (c_a + c_b) = (n_a + n_b)
                      THEN NULL
                      ELSE ((c_a / n_a) - (c_b / n_b)) /
                           SQRT(((c_a + c_b) / (n_a + n_b)) *
                                (1 - (c_a + c_b) / (n_a + n_b)) *
                                (1 / n_a + 1 / n_b)) END, 6) AS z_score
    FROM agg
    """,
)
def events_ab_test_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test harness: users hash-split 50/50 by
    md5(user_id) (the leakage-free assignment every online experiment
    uses — stable under reprocessing, no coordination), with an
    above-average-spender conversion metric decided by EXACT decimal
    cross-multiplication (s * n_users > total — no division, no float
    mean), then the pooled-variance z statistic. The null split means
    |z| should be small — the A/A-test sanity check an experimentation
    pipeline runs on itself; degenerate all/none conversion yields NULL
    z in both engines. One per-user aggregate + one 4-counter fold."""
    ev = _t(spark, sf_dir, "events")
    grp = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10)
        .cast("long") % 2
    )
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.col("value").cast("decimal(18,6)")).alias("s"),
    ).withColumn("grp", grp)
    glob = per_user.agg(
        F.count(F.lit(1)).alias("nu"), F.sum("s").alias("tot")
    )
    assign = per_user.crossJoin(F.broadcast(glob)).select(
        "grp",
        F.when(
            F.col("s") * F.col("nu") > F.col("tot"), 1
        ).otherwise(0).alias("converted"),
    )
    agg = assign.agg(
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0))
        .cast("double").alias("n_a"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0))
        .cast("double").alias("n_b"),
        F.sum(F.when(F.col("grp") == 0, F.col("converted")).otherwise(0))
        .cast("double").alias("c_a"),
        F.sum(F.when(F.col("grp") == 1, F.col("converted")).otherwise(0))
        .cast("double").alias("c_b"),
    )
    p = (F.col("c_a") + F.col("c_b")) / (F.col("n_a") + F.col("n_b"))
    return agg.select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.col("c_a").cast("bigint").alias("conv_a"),
        F.col("c_b").cast("bigint").alias("conv_b"),
        F.round(F.col("c_a") / F.col("n_a") - F.col("c_b") / F.col("n_b"), 6)
        .alias("conv_rate_diff"),
        F.round(
            F.when(
                (F.col("c_a") + F.col("c_b") == 0)
                | (F.col("c_a") + F.col("c_b") == F.col("n_a") + F.col("n_b")),
                F.lit(None).cast("double"),
            ).otherwise(
                (F.col("c_a") / F.col("n_a") - F.col("c_b") / F.col("n_b"))
                / F.sqrt(
                    p * (F.lit(1) - p)
                    * (F.lit(1) / F.col("n_a") + F.lit(1) / F.col("n_b"))
                )
            ),
            6,
        ).alias("z_score"),
    )


@register(
    "reused_exchange_monthly_share",
    oracle=f"""
    WITH monthly AS (
      SELECT CAST(YEAR(o_orderdate) AS INT) AS y, CAST(MONTH(o_orderdate) AS INT) AS m,
             SUM(CAST(o_totalprice AS {_DEC})) AS rev
      FROM orders GROUP BY 1, 2)
    SELECT y, m,
           CAST(ROUND(rev, 2) AS DOUBLE) AS revenue,
           ROUND(CAST(rev AS DOUBLE) /
                 CAST((SELECT SUM(rev) FROM monthly) AS DOUBLE), 6) AS share
    FROM monthly
    ORDER BY y, m
    """,
)
def reused_exchange_monthly_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-total over an aggregate where BOTH consumers (the monthly
    rows and their global sum) hang off the same shuffle: Spark plans the
    second consumer as a ReusedExchange, so the fact table is scanned and
    shuffled exactly once even though the dataflow reads the aggregate
    twice. The alternative people write — a global-window over the agg —
    funnels everything through one partition; this shape broadcasts a
    1-row total instead. Plan-shape test asserts the reuse."""
    orders = _t(spark, sf_dir, "orders")
    monthly = (
        orders.groupBy(
            F.year("o_orderdate").cast("int").alias("y"),
            F.month("o_orderdate").cast("int").alias("m"),
        )
        .agg(F.sum(F.col("o_totalprice").cast(_DEC)).alias("rev"))
    )
    total = monthly.agg(F.sum("rev").alias("tot"))
    return (
        monthly.crossJoin(F.broadcast(total))
        .select(
            "y",
            "m",
            F.round(F.col("rev"), 2).cast("double").alias("revenue"),
            F.round(
                F.col("rev").cast("double") / F.col("tot").cast("double"), 6
            ).alias("share"),
        )
        .orderBy("y", "m")
    )


@register(
    "markov_stationary_2step",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type, ts, event_id,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events),
    trans AS (
      SELECT event_type AS src, nxt AS dst, COUNT(*) AS n
      FROM seq WHERE nxt IS NOT NULL
      GROUP BY event_type, nxt),
    tot AS (SELECT src, SUM(n) AS tn FROM trans GROUP BY src),
    p AS (
      SELECT t.src, t.dst, CAST(t.n AS DOUBLE) / tt.tn AS pr
      FROM trans t JOIN tot tt ON tt.src = t.src),
    types AS (SELECT DISTINCT event_type AS s FROM events),
    v0 AS (SELECT s, CAST(1 AS DOUBLE) /
                     (SELECT COUNT(*) FROM types) AS w FROM types),
    v1 AS (
      SELECT p.dst AS s, SUM(v0.w * p.pr) AS w
      FROM v0 JOIN p ON p.src = v0.s GROUP BY p.dst),
    v2 AS (
      SELECT p.dst AS s, SUM(v1.w * p.pr) AS w
      FROM v1 JOIN p ON p.src = v1.s GROUP BY p.dst)
    SELECT s AS event_type, ROUND(w, 6) AS stationary_weight
    FROM v2 ORDER BY s
    """,
)
def markov_stationary_2step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two power steps toward the stationary distribution of the
    per-user event-transition Markov chain (uniform start) — the
    behavioral-model readout built on event_transition_matrix. Each step
    is a 5x5-matrix-sized join; the only corpus-scale work is the one
    transition count. The double sums per step run over <= 5 terms per
    destination grouped identically in both engines; per-row probability
    division text is identical, so values match bit-for-bit after
    rounding."""
    ev = _t(spark, sf_dir, "events")
    wseq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(wseq).alias("nxt")
    ).filter(F.col("nxt").isNotNull())
    trans = seq.groupBy(
        F.col("event_type").alias("src"), F.col("nxt").alias("dst")
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = trans.groupBy("src").agg(F.sum("n").alias("tn"))
    prob = trans.join(tot, "src").select(
        "src", "dst", (F.col("n").cast("double") / F.col("tn")).alias("pr")
    )
    prob = op_cache.track(prob.cache())
    types = ev.select(F.col("event_type").alias("s")).distinct()
    n_types = types.count()
    v = types.select("s", (F.lit(1.0) / F.lit(float(n_types))).alias("w"))
    for _ in range(2):
        v = (
            v.join(prob, v.s == prob.src)
            .groupBy(F.col("dst").alias("s2"))
            .agg(F.sum(F.col("w") * F.col("pr")).alias("w"))
            .withColumnRenamed("s2", "s")
        )
    return v.select(
        F.col("s").alias("event_type"),
        F.round("w", 6).alias("stationary_weight"),
    ).orderBy("event_type")


def _catalog_profile_oracle() -> str:
    tabs = ["region", "nation", "customer", "supplier", "part", "orders",
            "lineitem", "events", "documents", "embeddings"]
    sel = [
        f"SELECT '{t}' AS table_name, COUNT(*) AS n_rows,"
        f" (SELECT COUNT(*) FROM (DESCRIBE SELECT * FROM {t}))"
        f" AS n_cols FROM {t}"
        for t in tabs
    ]
    return ("SELECT * FROM (" + " UNION ALL ".join(sel)
            + ") ORDER BY table_name")


@register("catalog_profile_all_tables", oracle=_catalog_profile_oracle())
def catalog_profile_all_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-catalog inventory: one (table, row count, column count) row
    per registered table — the dataset-card readout the reference's
    per-topic export manifest corresponds to (one manifest line per
    topic/collection; SURVEY §2.5). Ten count-star scans that each read
    zero columns (parquet row-group metadata only)."""
    from .sources.catalog import TABLES

    outs = []
    for t in sorted(TABLES):
        df = _t(spark, sf_dir, t)
        outs.append(
            df.agg(F.count(F.lit(1)).alias("n_rows")).select(
                F.lit(t).alias("table_name"),
                "n_rows",
                F.lit(len(df.columns)).cast("bigint").alias("n_cols"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("table_name")


# ---------------------------------------------------------------------------
# Tokenizer inference (round 2): applying a BPE merge table — the
# greedy left-to-right pair-merge fold, expressed with array-accumulator
# higher-order folds in BOTH engines (Spark aggregate / DuckDB
# list_reduce fold left-to-right identically).
# ---------------------------------------------------------------------------

_BPE_MERGES = [("t", "h", "th"), ("th", "e", "the"), ("e", "r", "er")]


def _bpe_fold_duck(src: str, a: str, b: str, ab: str) -> str:
    return (
        f"list_reduce([[t] FOR t IN ({src})], (acc, x) -> "
        f"CASE WHEN len(acc) > 0 AND acc[-1] = '{a}' AND x[1] = '{b}' "
        f"THEN list_concat(acc[1:len(acc)-1], ['{ab}']) "
        f"ELSE list_concat(acc, x) END)"
    )


def _bpe_fold_spark(src: str, a: str, b: str, ab: str) -> str:
    return (
        f"aggregate({src}, CAST(array() AS ARRAY<STRING>), (acc, x) -> "
        f"CASE WHEN size(acc) > 0 AND element_at(acc, -1) = '{a}' AND x = '{b}' "
        f"THEN concat(slice(acc, 1, size(acc) - 1), array('{ab}')) "
        f"ELSE concat(acc, array(x)) END)"
    )


def _bpe_oracle() -> str:
    expr = "string_split_regex(w, '')"
    for a, b, ab in _BPE_MERGES:
        expr = _bpe_fold_duck(expr, a, b, ab)
    return f"""
    WITH wc AS (
      SELECT w, COUNT(*) AS n
      FROM (SELECT unnest(string_split_regex(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS w
            FROM documents) t
      WHERE w <> '' GROUP BY w),
    toks AS (
      SELECT unnest({expr}) AS token, n FROM wc)
    SELECT token, CAST(SUM(n) AS BIGINT) AS n
    FROM toks GROUP BY token
    ORDER BY n DESC, token LIMIT 20
    """


@register("bpe_apply_merges", oracle=_bpe_oracle())
def bpe_apply_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer INFERENCE: apply a 3-rule BPE merge table (t+h -> th,
    th+e -> the, e+r -> er) to the corpus vocabulary by the greedy
    left-to-right pair-merge fold — one array-accumulator ``aggregate``
    per merge rule, run over the DISTINCT-word table (BPE tokenizes the
    vocab, and corpus token counts come back via the word counts), which
    is the decisive scale move: the fold runs once per unique word, not
    once per corpus occurrence. Returns the top-20 resulting subword
    tokens. Both engines fold left-to-right, so the merged token streams
    are identical — including the overlap rule (a fresh merge output can
    immediately pair with the next character)."""
    docs = _t(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(
            F.split(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "), " ")
        ).alias("w")
    ).filter(F.col("w") != "")
    wc = words.groupBy("w").agg(F.count(F.lit(1)).alias("n"))
    expr = "split(w, '')"
    for a, b, ab in _BPE_MERGES:
        expr = _bpe_fold_spark(expr, a, b, ab)
    toks = wc.select(F.explode(F.expr(expr)).alias("token"), "n")
    return (
        toks.groupBy("token")
        .agg(F.sum("n").cast("bigint").alias("n"))
        .orderBy(F.desc("n"), "token")
        .limit(20)
    )


@register(
    "pandas_api_monthly_rollup",
    oracle=f"""
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS {_DEC})), 2) AS DOUBLE)
             AS revenue,
           CAST(ROUND(MAX(CAST(o_totalprice AS {_DEC})), 2) AS DOUBLE)
             AS max_price
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def pandas_api_monthly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pandas-API-on-Spark surface (pyspark.pandas): a
    pandas-looking groupby/agg that compiles to the SAME distributed
    plan as the DataFrame API — pinned by checking it against the plain
    SQL aggregate. This is the migration path for pandas codebases: the
    API is pandas, the execution is Catalyst (no driver-side collect).
    Decimal sums keep the revenue engine-exact."""
    import warnings

    import pyspark.pandas as ps

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        import os as _os

        psdf = ps.read_parquet(_os.path.join(sf_dir, "orders.parquet"))
        psdf = psdf.assign(dec_price=psdf.o_totalprice)
        out = (
            psdf.groupby("o_orderstatus")
            .agg(n_orders=("o_orderkey", "count"))
            .reset_index()
        )
        sdf = out.to_spark()
    # exact money math stays in the DataFrame layer (pandas-API sum would
    # run float addition); join the decimal aggregate on the same key
    orders = _t(spark, sf_dir, "orders")
    money = orders.groupBy("o_orderstatus").agg(
        F.round(F.sum(F.col("o_totalprice").cast(_DEC)), 2)
        .cast("double")
        .alias("revenue"),
        F.round(F.max(F.col("o_totalprice").cast(_DEC)), 2)
        .cast("double")
        .alias("max_price"),
    )
    return sdf.join(money, "o_orderstatus").orderBy("o_orderstatus")


@register(
    "duplicate_span_profile",
    oracle="""
    WITH words AS (
      SELECT doc_id,
             string_split_regex(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS ws
      FROM documents),
    grams AS (
      SELECT k, gram, COUNT(DISTINCT doc_id) AS df
      FROM (
        SELECT doc_id, 4 AS k,
               list_aggregate(ws[i:i+3], 'string_agg', ' ') AS gram
        FROM words, UNNEST(range(1, len(ws) - 2)) AS t(i)
        UNION ALL
        SELECT doc_id, 8 AS k,
               list_aggregate(ws[i:i+7], 'string_agg', ' ') AS gram
        FROM words, UNNEST(range(1, len(ws) - 6)) AS t(i)
        UNION ALL
        SELECT doc_id, 16 AS k,
               list_aggregate(ws[i:i+15], 'string_agg', ' ') AS gram
        FROM words, UNNEST(range(1, len(ws) - 14)) AS t(i)
      ) g
      GROUP BY k, gram)
    SELECT CAST(k AS INT) AS k,
           COUNT(*) AS n_grams,
           CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_cross_doc_dup,
           ROUND(CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS DOUBLE) /
                 COUNT(*), 6) AS dup_ratio
    FROM grams
    GROUP BY k
    ORDER BY k
    """,
)
def duplicate_span_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicate-span profile at 4/8/16-word spans — the
    diagnostic behind exact-substring dedup policy (Lee et al.): how the
    duplicated fraction decays with span length tells you the minimum
    span worth deduplicating. One tokenize feeds three shingle explodes;
    each span length is a distinct-doc count per gram (hash aggregate,
    no joins). The dup ratio uses integer counts only."""
    docs = _t(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id",
        F.split(
            F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "), " "
        ).alias("ws"),
    )
    outs = []
    for k in (4, 8, 16):
        grams = words.select(
            "doc_id",
            F.explode(
                # sequence(1, 0) DESCENDS in Spark (default step -1), so
                # short docs must short-circuit to an empty array
                F.expr(
                    f"CASE WHEN size(ws) >= {k} THEN "
                    f"transform(sequence(1, size(ws) - {k - 1}), "
                    f"i -> array_join(slice(ws, i, {k}), ' ')) "
                    f"ELSE CAST(array() AS ARRAY<STRING>) END"
                )
            ).alias("gram"),
        )
        per = grams.groupBy("gram").agg(
            F.countDistinct("doc_id").alias("df")
        )
        outs.append(
            per.agg(
                F.count(F.lit(1)).alias("n_grams"),
                F.sum(F.when(F.col("df") >= 2, 1).otherwise(0))
                .cast("bigint")
                .alias("n_cross_doc_dup"),
            ).select(
                F.lit(k).cast("int").alias("k"),
                "n_grams",
                "n_cross_doc_dup",
                F.round(
                    F.col("n_cross_doc_dup").cast("double") / F.col("n_grams"),
                    6,
                ).alias("dup_ratio"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("k")


# ---------------------------------------------------------------------------
# Mergeable sketches + weighted sampling + leakage audit (round 2).
# ---------------------------------------------------------------------------


def _hll_merge_oracle(p: int = 8) -> str:
    m, wbits, rank_sql, alpha = _hll_parts(p)
    raw = (
        f"CAST({alpha} AS DOUBLE) * CAST({m * m} AS DOUBLE) * "
        f"CAST({1 << (wbits + 1)} AS DOUBLE) / CAST(inv_scaled AS DOUBLE)"
    )
    est_expr = f"""
      ROUND(CASE WHEN {raw} <= {25 * m // 10} AND zeros > 0
                 THEN CAST({m} AS DOUBLE) *
                      ln(CAST({m} AS DOUBLE) / CAST(zeros AS DOUBLE))
                 ELSE {raw} END, 4)"""
    return f"""
    WITH h AS (
      SELECT event_type AS g,
             CAST(concat('0x', substring(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
      FROM events),
    ranked AS (
      SELECT g, hv & {m - 1} AS bucket, (hv >> {p}) AS w FROM h),
    regs AS (
      SELECT g, bucket, MAX({rank_sql}) AS mj
      FROM ranked GROUP BY g, bucket),
    merged AS (
      SELECT 'zz_merged' AS g, bucket, MAX(mj) AS mj
      FROM regs GROUP BY bucket),
    allregs AS (SELECT * FROM regs UNION ALL SELECT * FROM merged),
    scopes AS (SELECT DISTINCT g FROM allregs),
    full_regs AS (
      SELECT sb.g, sb.b AS bucket, COALESCE(r.mj, 0) AS mj
      FROM (SELECT s.g, t.b FROM scopes s,
            (SELECT unnest(range(0, {m})) AS b) t) sb
      LEFT JOIN allregs r ON r.bucket = sb.b AND r.g = sb.g),
    sums AS (
      SELECT g,
             SUM(CAST(1 AS BIGINT) << ({wbits + 1} - mj)) AS inv_scaled,
             SUM(CASE WHEN mj = 0 THEN 1 ELSE 0 END) AS zeros
      FROM full_regs GROUP BY g),
    ex AS (
      SELECT event_type AS g, COUNT(DISTINCT user_id) AS exact_distinct
      FROM events GROUP BY event_type
      UNION ALL
      SELECT 'zz_merged', COUNT(DISTINCT user_id) FROM events)
    SELECT s.g AS scope, {est_expr} AS hll_estimate, e.exact_distinct
    FROM sums s JOIN ex e ON e.g = s.g
    ORDER BY scope
    """


@register("hll_merge_by_type", oracle=_hll_merge_oracle())
def hll_merge_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The property that makes sketches worth their error bars:
    MERGEABILITY. Per-event-type HyperLogLog registers are built once,
    then the global sketch is the bucketwise MAX of the per-type
    registers — no second pass over the data — and its estimate is
    byte-identical to what a direct global sketch would give (max is
    associative). This is the map-side-combine / cross-datacenter rollup
    contract; everything stays exact integers until one final division
    (same arithmetic as hll_distinct_users)."""
    p = 8
    m, wbits, rank_sql, alpha = _hll_parts(p)
    ev = _t(spark, sf_dir, "events")
    h = ev.select(
        F.col("event_type").alias("g"),
        F.expr(
            "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 15), 16, 10) AS BIGINT)"
        ).alias("hv"),
    )
    ranked = h.select(
        "g",
        (F.col("hv").bitwiseAND(F.lit(m - 1))).alias("bucket"),
        F.shiftright("hv", p).alias("w"),
    )
    regs = ranked.groupBy("g", "bucket").agg(F.expr(f"MAX({rank_sql})").alias("mj"))
    regs = op_cache.track(regs.cache())
    merged = regs.groupBy("bucket").agg(F.max("mj").alias("mj")).select(
        F.lit("zz_merged").alias("g"), "bucket", "mj"
    )
    allregs = regs.unionByName(merged)
    scopes = allregs.select("g").distinct()
    buckets = ev.sparkSession.range(m).select(F.col("id").alias("bucket"))
    full = (
        scopes.crossJoin(buckets)
        .join(allregs, ["g", "bucket"], "left")
        .select("g", "bucket", F.coalesce("mj", F.lit(0)).alias("mj"))
    )
    sums = full.groupBy("g").agg(
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {wbits + 1} - mj)")).alias(
            "inv_scaled"
        ),
        F.sum(F.when(F.col("mj") == 0, 1).otherwise(0)).alias("zeros"),
    )
    raw = (
        F.lit(alpha)
        * F.lit(m * m).cast("double")
        * F.lit(1 << (wbits + 1)).cast("double")
        / F.col("inv_scaled").cast("double")
    )
    est = F.round(
        F.when(
            (raw <= F.lit(25 * m // 10)) & (F.col("zeros") > 0),
            F.lit(float(m))
            * F.log(F.lit(float(m)) / F.col("zeros").cast("double")),
        ).otherwise(raw),
        4,
    )
    ex = (
        ev.groupBy(F.col("event_type").alias("g"))
        .agg(F.countDistinct("user_id").alias("exact_distinct"))
        .unionByName(
            ev.agg(F.countDistinct("user_id").alias("exact_distinct")).select(
                F.lit("zz_merged").alias("g"), "exact_distinct"
            )
        )
    )
    return (
        sums.join(ex, "g")
        .select(F.col("g").alias("scope"), est.alias("hll_estimate"),
                "exact_distinct")
        .orderBy("scope")
    )


@register(
    "weighted_sample_aes",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, n_chars,
             -ln((CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) + 1)
                 / CAST(1152921504606846976 AS DOUBLE)) / n_chars AS k
      FROM documents),
    r AS (
      SELECT doc_id, n_chars, ROUND(k, 8) AS kr,
             ROW_NUMBER() OVER (ORDER BY ROUND(k, 8), doc_id) AS rn
      FROM keyed)
    SELECT doc_id, n_chars, kr AS sample_key
    FROM r WHERE rn <= 20
    ORDER BY sample_key, doc_id
    """,
)
def weighted_sample_aes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis-Spirakis A-ES):
    each document draws an exponential key -ln(u)/w from a DETERMINISTIC
    md5-uniform u and weight w = n_chars; the 20 smallest keys are the
    sample. This is THE distributed weighted sampler — keys are
    independent per row (a narrow projection), and top-k by key is a
    mergeable reduction, so it runs in one pass at any scale and is
    reproducible across reruns/retries. Ranking uses the ROUNDED key
    (+ id tiebreak) so a last-ulp ln() divergence between engines cannot
    reorder the sample."""
    docs = _t(spark, sf_dir, "documents")
    hv = F.expr(
        "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10) AS BIGINT)"
    )
    u = (hv + F.lit(1)).cast("double") / F.lit(float(1 << 60))
    k = -F.log(u) / F.col("n_chars")
    keyed = docs.select("doc_id", "n_chars", F.round(k, 8).alias("kr"))
    # smallest-20 via orderBy+limit (TakeOrdered heap merge), never a
    # global row_number window over the corpus — the one-pass mergeable
    # reduction is the whole point of the A-ES sampler
    return (
        keyed.orderBy("kr", "doc_id")
        .limit(20)
        .select("doc_id", "n_chars", F.col("kr").alias("sample_key"))
        .orderBy("sample_key", "doc_id")
    )


_ORACLES["split_leakage_audit"] = f"""
    WITH pairs AS ({_ORACLES["dedup_ngram_jaccard_pairs"]}),
    sp AS (
      SELECT doc_id,
             CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 100 < 80
                  THEN 'train'
                  WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 100 < 90
                  THEN 'valid' ELSE 'test' END AS split
      FROM documents)
    SELECT sa.split AS split_a, sb.split AS split_b,
           COUNT(*) AS n_pairs,
           CAST(SUM(CASE WHEN sa.split <> sb.split THEN 1 ELSE 0 END) AS BIGINT)
             AS n_leaky
    FROM pairs p
    JOIN sp sa ON sa.doc_id = p.id_a
    JOIN sp sb ON sb.doc_id = p.id_b
    GROUP BY sa.split, sb.split
    ORDER BY split_a, split_b
    """


@register("split_leakage_audit")
def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test LEAKAGE audit: near-duplicate pairs (exact n-gram
    Jaccard >= 0.2, the registry's dedup ground truth) crossed with the
    md5 train/valid/test assignment — a pair whose endpoints land in
    different splits means the held-out set contains a near-copy of a
    training document, the contamination that silently inflates evals.
    This is the composition check a curation pipeline runs AFTER
    splitting: dedup-then-split is the fix when n_leaky > 0. Because the
    split is a PURE HASH of the id, it is recomputed as an expression on
    the pair table — no join against a corpus-sized assignment table
    (broadcasting one would be the tfidf-vocab mistake all over again)."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup_mod.ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.2, block_col="lang"
    ).select("id_a", "id_b")

    def split_of(col: str):
        bucket = (
            F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 15), 16, 10)
            .cast("long") % 100
        )
        return (
            F.when(bucket < 80, "train").when(bucket < 90, "valid")
            .otherwise("test")
        )

    return (
        pairs.select(
            split_of("id_a").alias("split_a"),
            split_of("id_b").alias("split_b"),
        )
        .groupBy("split_a", "split_b")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(
                F.when(F.col("split_a") != F.col("split_b"), 1).otherwise(0)
            ).cast("bigint").alias("n_leaky"),
        )
        .orderBy("split_a", "split_b")
    )


# ---------------------------------------------------------------------------
# Semi-structured round-trips (round 2): the JSON and XML function
# surfaces pinned by encode -> decode -> compare-to-source, so the
# oracle is plain ground truth (every round-trip must be lossless).
# ---------------------------------------------------------------------------


@register(
    "json_roundtrip_shredding",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           COUNT(*) AS n_key_match,
           COUNT(*) AS n_status_match,
           COUNT(*) AS n_price_match,
           COUNT(*) AS n_struct_match,
           COUNT(*) AS n_arraylen_ok
    FROM orders
    """,
)
def json_roundtrip_shredding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON function surface: to_json(struct) -> get_json_object /
    from_json(schema) -> compare every field to its source column, plus
    a JSON-array length probe — six per-row checks that must all equal
    the row count (the oracle is ground truth because a correct encode/
    decode is lossless, doubles included: Spark writes shortest
    round-trippable representations). All JVM-side expressions; at scale
    this is the envelope-projection hot path (SURVEY §2.2 P1) without a
    byte of Python."""
    orders = _t(spark, sf_dir, "orders")
    j = orders.select(
        "o_orderkey", "o_orderstatus", "o_totalprice",
        F.to_json(
            F.struct(
                F.col("o_orderkey").alias("k"),
                F.col("o_orderstatus").alias("s"),
                F.col("o_totalprice").alias("p"),
            )
        ).alias("js"),
        F.to_json(
            F.array(F.col("o_orderkey"), F.col("o_custkey"), F.lit(0))
        ).alias("ja"),
    )
    parsed = j.select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "ja",
        F.get_json_object("js", "$.k").cast("bigint").alias("k2"),
        F.get_json_object("js", "$.s").alias("s2"),
        F.get_json_object("js", "$.p").cast("double").alias("p2"),
        F.from_json(
            "js", "struct<k: bigint, s: string, p: double>"
        ).alias("st"),
    )
    return parsed.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("k2") == F.col("o_orderkey"), 1).otherwise(0))
        .alias("n_key_match"),
        F.sum(F.when(F.col("s2") == F.col("o_orderstatus"), 1).otherwise(0))
        .alias("n_status_match"),
        F.sum(F.when(F.col("p2") == F.col("o_totalprice"), 1).otherwise(0))
        .alias("n_price_match"),
        F.sum(
            F.when(
                (F.col("st.k") == F.col("o_orderkey"))
                & (F.col("st.s") == F.col("o_orderstatus"))
                & (F.col("st.p") == F.col("o_totalprice")),
                1,
            ).otherwise(0)
        ).alias("n_struct_match"),
        F.sum(
            F.when(
                F.expr("size(from_json(ja, 'array<bigint>'))") == 3, 1
            ).otherwise(0)
        ).alias("n_arraylen_ok"),
    )


@register(
    "xml_roundtrip_shredding",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           COUNT(*) AS n_key_match,
           COUNT(*) AS n_name_match,
           COUNT(*) AS n_escape_ok
    FROM part
    """,
)
def xml_roundtrip_shredding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML function surface (Spark 4 native to_xml/from_xml): encode a
    struct per part — including a column with XML-hostile characters
    (the type string contains no '<', so one is injected) — decode it
    back, and require losslessness row by row. Entity escaping
    (&lt;/&amp;) is exactly the corner hand-rolled XML splicing gets
    wrong; the round-trip pins it."""
    part = _t(spark, sf_dir, "part")
    enc = part.select(
        "p_partkey", "p_name",
        F.concat(F.col("p_type"), F.lit(" <& special>")).alias("hostile"),
    )
    x = enc.select(
        "p_partkey", "p_name", "hostile",
        F.to_xml(
            F.struct(
                F.col("p_partkey").alias("k"),
                F.col("p_name").alias("nm"),
                F.col("hostile").alias("h"),
            )
        ).alias("xs"),
    )
    back = x.select(
        "p_partkey", "p_name", "hostile",
        F.from_xml(
            "xs", "struct<k: bigint, nm: string, h: string>"
        ).alias("b"),
    )
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("b.k") == F.col("p_partkey"), 1).otherwise(0))
        .alias("n_key_match"),
        F.sum(F.when(F.col("b.nm") == F.col("p_name"), 1).otherwise(0))
        .alias("n_name_match"),
        F.sum(F.when(F.col("b.h") == F.col("hostile"), 1).otherwise(0))
        .alias("n_escape_ok"),
    )


# ---------------------------------------------------------------------------
# SQL-syntax breadth + time-series bars + referential integrity (round 2).
# ---------------------------------------------------------------------------


@register(
    "sql_pivot_unpivot_roundtrip",
    oracle=f"""
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p,
           COUNT(*) AS n_total
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def sql_pivot_unpivot_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL PIVOT clause (wide) immediately UNPIVOTed back (long) and
    re-aggregated — proving the two reshaping operators are inverses and
    pinning the wide counts against the conditional-aggregation form the
    optimizer compiles PIVOT into anyway. Status values are the fixed
    F/O/P domain, so the pivot column list is static (the scalable form —
    dynamic pivot requires a driver-side distinct first)."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql("""
        WITH wide AS (
          SELECT * FROM (SELECT o_orderpriority, o_orderstatus FROM orders)
          PIVOT (COUNT(*) AS n FOR o_orderstatus IN ('F' AS f, 'O' AS o, 'P' AS p))
        ),
        long AS (
          SELECT o_orderpriority, status, n
          FROM wide UNPIVOT (n FOR status IN (f, o, p))
        )
        SELECT w.o_orderpriority,
               CAST(w.f AS BIGINT) AS n_f,
               CAST(w.o AS BIGINT) AS n_o,
               CAST(w.p AS BIGINT) AS n_p,
               (SELECT CAST(SUM(n) AS BIGINT) FROM long l
                WHERE l.o_orderpriority = w.o_orderpriority) AS n_total
        FROM wide w
        ORDER BY o_orderpriority
    """)


_GROUP_BY_ALL_SQL = """
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS sum_qty
    FROM lineitem
    GROUP BY ALL
    ORDER BY ALL
    """


@register("group_by_all_parity", oracle=_GROUP_BY_ALL_SQL)
def group_by_all_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL / ORDER BY ALL — the modern-SQL ergonomics both
    engines now share: one identical SQL string runs on Spark and DuckDB
    and must produce identical groups, order, and decimal-exact sums.
    Pins that Spark's ALL resolution (every non-aggregate select item)
    matches the de-facto standard."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_GROUP_BY_ALL_SQL)


@register(
    "events_time_weighted_avg",
    oracle="""
    WITH seq AS (
      SELECT user_id, value, ts,
             LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nts
      FROM events),
    seg AS (
      SELECT user_id,
             CAST(value AS DECIMAL(18,6)) AS v,
             epoch_us(nts) - epoch_us(ts) AS dt
      FROM seq WHERE nts IS NOT NULL)
    SELECT user_id,
           CAST(SUM(dt) AS BIGINT) AS total_micros,
           ROUND(CAST(SUM(v * dt) AS DOUBLE) / CAST(SUM(dt) AS DOUBLE), 6)
             AS time_weighted_avg
    FROM seg
    GROUP BY user_id
    HAVING SUM(dt) > 0
    ORDER BY user_id
    """,
)
def events_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of each user's event value — the
    irregular-sampling mean (each observation weighted by how long it
    was 'current') that a plain AVG silently gets wrong on bursty
    streams. Segment weights are integer MICROseconds, values DECIMAL, so
    the weighted sums are exact; one window + one aggregate."""
    ev = _t(spark, sf_dir, "events")
    wseq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        F.col("value").cast("decimal(18,6)").alias("v"),
        "ts",
        F.lead("ts").over(wseq).alias("nts"),
    ).filter(F.col("nts").isNotNull())
    seg = seq.select(
        "user_id", "v",
        # microsecond-exact: epoch() in DuckDB is fractional and
        # unix_timestamp truncates — integer microseconds agree everywhere
        F.expr("unix_micros(nts) - unix_micros(ts)").alias("dt"),
    )
    return (
        seg.groupBy("user_id")
        .agg(
            F.sum("dt").cast("bigint").alias("total_micros"),
            F.round(
                F.sum(F.col("v") * F.col("dt")).cast("double")
                / F.sum("dt").cast("double"),
                6,
            ).alias("time_weighted_avg"),
        )
        .filter(F.col("total_micros") > 0)
        .orderBy("user_id")
    )


@register(
    "events_ohlc_hourly",
    oracle="""
    WITH v AS (
      SELECT date_trunc('hour', ts) AS bar, value, ts, event_id,
             ROW_NUMBER() OVER (PARTITION BY date_trunc('hour', ts)
                                ORDER BY ts, event_id) AS rn_open,
             ROW_NUMBER() OVER (PARTITION BY date_trunc('hour', ts)
                                ORDER BY ts DESC, event_id DESC) AS rn_close
      FROM events WHERE event_type = 'purchase')
    SELECT bar,
           COUNT(*) AS n,
           MAX(CASE WHEN rn_open = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rn_close = 1 THEN value END) AS close
    FROM v
    GROUP BY bar
    ORDER BY bar
    LIMIT 100
    """,
)
def events_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC candlestick bars (hourly) over purchase values: open/close
    by deterministic (ts, event_id) order, high/low as plain min/max —
    the financial-rollup shape. One window pass tags the first and last
    row per bar; values pass through untouched (no float arithmetic), so
    both engines agree exactly."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    bar = F.date_trunc("hour", F.col("ts")).alias("bar")
    w_open = Window.partitionBy(F.date_trunc("hour", F.col("ts"))).orderBy(
        "ts", "event_id"
    )
    w_close = Window.partitionBy(F.date_trunc("hour", F.col("ts"))).orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    v = ev.select(
        bar, "value",
        F.row_number().over(w_open).alias("rn_open"),
        F.row_number().over(w_close).alias("rn_close"),
    )
    return (
        v.groupBy("bar")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max(F.when(F.col("rn_open") == 1, F.col("value"))).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(F.when(F.col("rn_close") == 1, F.col("value"))).alias("close"),
        )
        .orderBy("bar")
        .limit(100)
    )


def _ref_integrity_oracle() -> str:
    fks = [
        ("lineitem_orderkey", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem_partkey", "lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem_suppkey", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("orders_custkey", "orders", "o_custkey", "customer", "c_custkey"),
        ("customer_nationkey", "customer", "c_nationkey", "nation", "n_nationkey"),
        ("supplier_nationkey", "supplier", "s_nationkey", "nation", "n_nationkey"),
        ("nation_regionkey", "nation", "n_regionkey", "region", "r_regionkey"),
    ]
    sel = [
        f"""SELECT '{name}' AS fk, COUNT(*) AS n_child_rows,
            CAST(SUM(CASE WHEN p.{pk} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
              AS n_orphans
        FROM {child} c LEFT JOIN {parent} p ON p.{pk} = c.{fk_col}"""
        for name, child, fk_col, parent, pk in fks
    ]
    return "SELECT * FROM (" + " UNION ALL ".join(sel) + ") ORDER BY fk"


_REF_FKS = [
    ("lineitem_orderkey", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem_partkey", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem_suppkey", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders_custkey", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer_nationkey", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier_nationkey", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation_regionkey", "nation", "n_regionkey", "region", "r_regionkey"),
]


@register("dq_referential_integrity", oracle=_ref_integrity_oracle())
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the whole star schema: for
    every foreign key, the child row count and the orphan count (child
    keys with no parent) via LEFT JOIN + null-parent counting. Parents
    are dimension-sized and broadcast; each check is one pass over its
    child table — the standard post-load DQ gate, here over 7 FKs in one
    result frame."""
    outs = []
    for name, child, fk_col, parent, pk in _REF_FKS:
        c = _t(spark, sf_dir, child)
        p = _t(spark, sf_dir, parent).select(F.col(pk))
        joined = c.select(F.col(fk_col)).join(
            F.broadcast(p), p[pk] == c[fk_col], "left"
        )
        outs.append(
            joined.agg(
                F.count(F.lit(1)).alias("n_child_rows"),
                F.sum(F.when(F.col(pk).isNull(), 1).otherwise(0))
                .cast("bigint")
                .alias("n_orphans"),
            ).select(F.lit(name).alias("fk"), "n_child_rows", "n_orphans")
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("fk")


@register(
    "rake_keyphrases",
    oracle="""
    WITH pos AS (
      SELECT doc_id, unnest(words) AS w,
             unnest(range(1, len(words) + 1)) AS i
      FROM (SELECT doc_id,
                   string_split_regex(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS words
            FROM documents)),
    marked AS (
      SELECT doc_id, w, i,
             CASE WHEN w IN ('the', 'a') THEN 1 ELSE 0 END AS stop,
             SUM(CASE WHEN w IN ('the', 'a') THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY i
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pid
      FROM pos WHERE w <> ''),
    members AS (SELECT doc_id, pid, w, i FROM marked WHERE stop = 0),
    plen AS (
      SELECT doc_id, pid, COUNT(*) AS n_words
      FROM members GROUP BY doc_id, pid),
    wstats AS (
      SELECT m.w,
             COUNT(*) AS freq,
             SUM(p.n_words) AS deg
      FROM members m JOIN plen p ON p.doc_id = m.doc_id AND p.pid = m.pid
      GROUP BY m.w),
    wscore AS (
      SELECT w, (deg * 1000000) // freq AS score_fp FROM wstats),
    phrases AS (
      SELECT m.doc_id, m.pid,
             list_aggregate(list(m.w ORDER BY m.i), 'string_agg', ' ') AS phrase,
             SUM(s.score_fp) AS pscore_fp,
             COUNT(*) AS n_words
      FROM members m JOIN wscore s ON s.w = m.w
      GROUP BY m.doc_id, m.pid),
    dedup AS (
      SELECT DISTINCT phrase, pscore_fp, n_words
      FROM phrases WHERE n_words BETWEEN 2 AND 4)
    SELECT phrase, CAST(n_words AS BIGINT) AS n_words,
           ROUND(CAST(pscore_fp AS DOUBLE) / 1000000, 4) AS rake_score
    FROM dedup
    ORDER BY pscore_fp DESC, phrase
    LIMIT 15
    """,
)
def rake_keyphrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyphrase extraction: stopword-delimited candidate phrases
    (gaps-and-islands over word positions), word scores deg/freq in
    FIXED-POINT integer arithmetic ((deg*1e6) div freq — positive
    integer division floors identically in both engines, and the
    per-phrase score sums stay exact BIGINTs), phrase score = sum of
    member scores, top-15 2-4-word phrases. One explode + two
    aggregates + one window; the phrase table is corpus-scale but
    the word-score table is vocabulary-scale."""
    docs = _t(spark, sf_dir, "documents")
    pos = docs.select(
        "doc_id",
        F.posexplode(
            F.split(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "), " ")
        ).alias("i0", "w"),
    ).select("doc_id", (F.col("i0") + 1).alias("i"), "w").filter(
        F.col("w") != ""
    )
    stop = F.col("w").isin("the", "a").cast("int")
    wcum = (
        Window.partitionBy("doc_id")
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = pos.select(
        "doc_id", "w", "i", stop.alias("stop"), F.sum(stop).over(wcum).alias("pid")
    )
    members = marked.filter(F.col("stop") == 0).select("doc_id", "pid", "w", "i")
    plen = members.groupBy("doc_id", "pid").agg(
        F.count(F.lit(1)).alias("n_words")
    )
    wstats = (
        members.join(plen, ["doc_id", "pid"])
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"), F.sum("n_words").alias("deg"))
    )
    wscore = wstats.select(
        "w", F.expr("(deg * 1000000) div freq").alias("score_fp")
    )
    phrases = (
        members.join(wscore, "w")
        .groupBy("doc_id", "pid")
        .agg(
            F.expr(
                "array_join(transform(sort_array(collect_list(struct(i, w))), s -> s.w), ' ')"
            ).alias("phrase"),
            F.sum("score_fp").alias("pscore_fp"),
            F.count(F.lit(1)).alias("n_words"),
        )
    )
    dedup = (
        phrases.filter(F.col("n_words").between(2, 4))
        .select("phrase", "pscore_fp", "n_words")
        .distinct()
    )
    return (
        dedup.orderBy(F.desc("pscore_fp"), "phrase")
        .limit(15)
        .select(
            "phrase",
            F.col("n_words").cast("bigint").alias("n_words"),
            F.round(F.col("pscore_fp").cast("double") / 1000000, 4).alias(
                "rake_score"
            ),
        )
    )


@register(
    "ngram_novelty_by_source",
    oracle="""
    WITH grams AS (
      SELECT doc_id, source,
             list_aggregate(ws[i:i+2], 'string_agg', ' ') AS g
      FROM (SELECT doc_id, source,
                   string_split_regex(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS ws
            FROM documents),
           UNNEST(range(1, len(ws) - 1)) AS t(i)),
    firstseen AS (
      SELECT g, MIN(doc_id) AS first_doc FROM grams GROUP BY g),
    scored AS (
      SELECT gr.doc_id, gr.source,
             CASE WHEN f.first_doc = gr.doc_id THEN 1 ELSE 0 END AS novel
      FROM grams gr JOIN firstseen f ON f.g = gr.g)
    SELECT source,
           COUNT(*) AS n_grams,
           CAST(SUM(novel) AS BIGINT) AS n_novel,
           ROUND(CAST(SUM(novel) AS DOUBLE) / COUNT(*), 6) AS novelty_ratio
    FROM scored
    GROUP BY source
    ORDER BY source
    """,
)
def ngram_novelty_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-crawl value metric: the fraction of each source's
    3-grams that are NOVEL (first occurrence in doc_id order, the
    ingestion-order proxy) — falling novelty is the signal to stop
    crawling a source. One shingle explode + a min-per-gram aggregate
    joined back on the gram key; at 100 TB the first-seen table is the
    dedup index you already maintain, so this metric is nearly free."""
    docs = _t(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", "source",
        F.split(
            F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "), " "
        ).alias("ws"),
    )
    grams = words.select(
        "doc_id", "source",
        F.explode(
            F.expr(
                "CASE WHEN size(ws) >= 3 THEN transform(sequence(1, size(ws) - 2), "
                "i -> array_join(slice(ws, i, 3), ' ')) "
                "ELSE CAST(array() AS ARRAY<STRING>) END"
            )
        ).alias("g"),
    )
    firstseen = grams.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    scored = grams.join(firstseen, "g").select(
        "source",
        F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0).alias("novel"),
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum("novel").cast("bigint").alias("n_novel"),
            F.round(
                F.sum("novel").cast("double") / F.count(F.lit(1)), 6
            ).alias("novelty_ratio"),
        )
        .orderBy("source")
    )


def _bpe_detok_oracle() -> str:
    expr = "string_split_regex(w, '')"
    for a, b, ab in _BPE_MERGES:
        expr = _bpe_fold_duck(expr, a, b, ab)
    return f"""
    WITH wc AS (
      SELECT DISTINCT w
      FROM (SELECT unnest(string_split_regex(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS w
            FROM documents) t
      WHERE w <> ''),
    rt AS (
      SELECT w, list_aggregate({expr}, 'string_agg', '') AS detok
      FROM wc)
    SELECT COUNT(*) AS n_words,
           CAST(SUM(CASE WHEN detok = w THEN 1 ELSE 0 END) AS BIGINT)
             AS n_lossless
    FROM rt
    """


@register("bpe_detokenize_roundtrip", oracle=_bpe_detok_oracle())
def bpe_detokenize_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer LOSSLESSNESS: every vocabulary word tokenized by the
    BPE merge table must detokenize (token concatenation) back to itself
    — n_lossless must equal n_words, and the oracle checks the same
    property in DuckDB. This is the invariant that makes BPE usable for
    training data at all; a merge-application bug (dropped char, wrong
    overlap handling) breaks it immediately."""
    docs = _t(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(
            F.split(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "), " ")
        ).alias("w")
    ).filter(F.col("w") != "").distinct()
    expr = "split(w, '')"
    for a, b, ab in _BPE_MERGES:
        expr = _bpe_fold_spark(expr, a, b, ab)
    rt = words.select("w", F.expr(f"array_join({expr}, '')").alias("detok"))
    return rt.agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum(F.when(F.col("detok") == F.col("w"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_lossless"),
    )


@register(
    "multimodal_image_dhash",
    oracle="""
    WITH grid AS (
      SELECT t.id, y.y, c.c,
             (c.c * 16) // 9 AS xs, (y.y * 12) // 8 AS ys
      FROM range(0, 50) t(id)
      CROSS JOIN range(0, 8) y(y)
      CROSS JOIN range(0, 9) c(c)),
    gray AS (
      SELECT id, y, c,
             ((id * 31 + ((ys * 16 + xs) * 3 + 0)) % 256) +
             ((id * 31 + ((ys * 16 + xs) * 3 + 1)) % 256) +
             ((id * 31 + ((ys * 16 + xs) * 3 + 2)) % 256) AS g
      FROM grid),
    bits AS (
      SELECT id, y, c,
             CASE WHEN LEAD(g) OVER (PARTITION BY id, y ORDER BY c) > g
                  THEN 1 ELSE 0 END AS b
      FROM gray),
    packed AS (
      SELECT id,
             SUM(CASE WHEN y < 4 AND b = 1
                      THEN CAST(1 AS BIGINT) << (y * 8 + c) ELSE 0 END)
               AS dhash_hi,
             SUM(CASE WHEN y >= 4 AND b = 1
                      THEN CAST(1 AS BIGINT) << ((y - 4) * 8 + c) ELSE 0 END)
               AS dhash_lo
      FROM bits WHERE c < 8
      GROUP BY id)
    SELECT id AS media_id, CAST(dhash_hi AS BIGINT) AS dhash_hi,
           CAST(dhash_lo AS BIGINT) AS dhash_lo
    FROM packed ORDER BY media_id
    """,
)
def multimodal_image_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual dHash over REALLY-decoded P6 images (see
    operators/multimodal.ppm_image_dhash) — the image near-dup
    primitive, value-checked bit for bit because both the decoder input
    and the oracle derive from the same closed-form pixel generator.
    Downstream, hamming distance on (dhash_hi, dhash_lo) pairs buckets
    visually-identical images exactly like SimHash buckets text."""
    media = mm_mod.synthetic_ppm_media(spark, n=50)
    return mm_mod.ppm_image_dhash(media).orderBy("media_id")


@register(
    "multimodal_audio_fingerprint",
    oracle="""
    WITH s AS (
      SELECT t.id, u.s AS i,
             ABS(((t.id * 7 + u.s * 13) % 65536) - 32768) AS av
      FROM range(0, 50) t(id) CROSS JOIN range(0, 256) u(s)),
    bands AS (
      SELECT id, i // 32 AS w, SUM(av) AS e
      FROM s GROUP BY id, i // 32),
    bits AS (
      SELECT id, w,
             CASE WHEN LEAD(e) OVER (PARTITION BY id ORDER BY w) > e
                  THEN 1 ELSE 0 END AS b
      FROM bands)
    SELECT b.id AS media_id,
           CAST(SUM(CASE WHEN b.b = 1 THEN 1 << b.w ELSE 0 END) AS INT)
             AS fingerprint,
           (SELECT CAST(SUM(e) AS BIGINT) FROM bands t WHERE t.id = b.id)
             AS total_abs_energy
    FROM bits b WHERE b.w < 7
    GROUP BY b.id
    ORDER BY media_id
    """,
)
def multimodal_audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal-envelope audio fingerprint over REALLY-decoded PCM16
    clips (see operators/multimodal.wav_energy_fingerprint): 8 integer
    band energies, 7 louder-than-previous bits — the audio analog of the
    image dHash, with the same closed-form full value gate."""
    media = mm_mod.synthetic_wav_media(spark, n=50)
    return mm_mod.wav_energy_fingerprint(media).orderBy("media_id")


_ORACLES["dedup_incremental_index_update"] = _ORACLES["dedup_minhash_lsh_pairs"]


@register("dedup_incremental_index_update")
def dedup_incremental_index_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL index maintenance: the corpus is split into a base
    (80%, by doc_id) and a delta batch (20%); MinHash signatures are
    computed SEPARATELY for each — the way a daily ingest run only
    signs the new documents — then the banded LSH candidate join and
    exact verify run over the unioned signature table. Because
    signatures are per-document, union-then-band is EXACTLY the
    full-corpus index, and the oracle is literally the full-corpus
    dedup_minhash_lsh_pairs oracle: incremental and batch must agree
    pair for pair. At 100 TB this is the difference between re-signing
    the whole corpus per ingest and signing only the delta."""
    from .operators.dedup import (
        _lsh_candidates,
        _minhash_sig_cols,
        jaccard,
        word_shingles,
    )

    docs = _t(spark, sf_dir, "documents")
    n_docs = docs.count()
    cut = (n_docs * 4) // 5
    base = docs.filter(F.col("doc_id") < cut)
    delta = docs.filter(F.col("doc_id") >= cut)
    sig_base = _minhash_sig_cols(base, "doc_id", "text", 3, 64, "md5")
    sig_delta = _minhash_sig_cols(delta, "doc_id", "text", 3, 64, "md5")
    sig = sig_base.unionByName(sig_delta)
    candidates = _lsh_candidates(sig, "doc_id", 64, 16, "md5")
    sh = docs.select(
        F.col("doc_id"), word_shingles(F.col("text"), 3).alias("sh")
    )
    verified = (
        candidates.join(
            sh.withColumnRenamed("doc_id", "id_a").withColumnRenamed("sh", "sh_a"),
            "id_a",
        )
        .join(
            sh.withColumnRenamed("doc_id", "id_b").withColumnRenamed("sh", "sh_b"),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.2)
    )
    return verified.orderBy("id_a", "id_b")


@register(
    "topk_per_group_agg_form",
    oracle="""
    SELECT o_orderpriority, o_orderkey, rnk
    FROM (
      SELECT o_orderpriority, o_orderkey,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY o_orderpriority
               ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rnk
      FROM orders)
    WHERE rnk <= 3
    ORDER BY o_orderpriority, rnk
    """,
)
def topk_per_group_agg_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group in AGGREGATE form: slice(sort_array(collect of
    (price, key) structs)) — one hash aggregate with map-side partial
    top-k, NO window and NO per-group sort of the full partition. The
    oracle is the window-function form, pinning that the two
    formulations agree row for row (deterministic tiebreak on key). For
    small k over high-cardinality groups this is the plan you want at
    100 TB: the window form sorts every group's full row set; this form
    carries at most k structs per group through the shuffle.

    (collect_list is bounded here by the slice that follows; a
    production operator would cap the partial aggregation explicitly —
    Spark's own partial-agg top-k does this once k << group size.)"""
    orders = _t(spark, sf_dir, "orders")
    agg = orders.groupBy("o_orderpriority").agg(
        F.expr(
            "slice(array_sort(collect_list(named_struct("
            "'negp', -o_totalprice, 'k', o_orderkey))), 1, 3)"
        ).alias("top3")
    )
    ex = agg.select(
        "o_orderpriority", F.posexplode("top3").alias("i0", "s")
    )
    return ex.select(
        "o_orderpriority",
        F.col("s.k").alias("o_orderkey"),
        (F.col("i0") + 1).cast("int").alias("rnk"),
    ).orderBy("o_orderpriority", "rnk")


# ---------------------------------------------------------------------------
# Decorrelation breadth, attribution, and mergeable-moment algebra.
# ---------------------------------------------------------------------------

_DECORRELATE_SQL = """
    SELECT c.c_custkey,
           (SELECT COUNT(*) FROM orders o
            WHERE o.o_custkey = c.c_custkey) AS n_orders,
           CAST(ROUND((SELECT SUM(CAST(o2.o_totalprice AS DECIMAL(18,2)))
                       FROM orders o2
                       WHERE o2.o_custkey = c.c_custkey
                         AND o2.o_orderpriority = '1-URGENT'), 2) AS DOUBLE)
             AS urgent_spend
    FROM customer c
    WHERE c.c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
                         WHERE c2.c_nationkey = c.c_nationkey)
    ORDER BY c.c_custkey
    LIMIT 200
    """


@register("subquery_decorrelation_breadth", oracle=_DECORRELATE_SQL)
def subquery_decorrelation_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subqueries in all three positions at once — the
    SELECT list (per-customer order count and a filtered sum) and the
    WHERE clause (above the per-nation average balance). Catalyst
    DECORRELATES each into an aggregate + join; none may execute as a
    per-row loop. One identical SQL string runs on both engines. The
    nation-average comparison is on raw doubles — identical inputs give
    identical comparisons, no arithmetic is stored."""
    for t in ("customer", "orders"):
        _t(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_DECORRELATE_SQL)


@register(
    "attribution_linear_multi_touch",
    oracle="""
    WITH purchases AS (
      SELECT event_id AS pid, user_id, ts AS pts,
             CAST(value AS DECIMAL(18,6)) AS rev
      FROM events WHERE event_type = 'purchase'),
    clicks AS (
      SELECT event_id AS cid, user_id, ts AS cts
      FROM events WHERE event_type = 'click'),
    touches AS (
      SELECT p.pid, p.rev, c.cid,
             COUNT(*) OVER (PARTITION BY p.pid) AS n_touch
      FROM purchases p JOIN clicks c
        ON c.user_id = p.user_id
       AND c.cts >= p.pts - INTERVAL 1 HOUR AND c.cts <= p.pts)
    SELECT cid AS click_id,
           COUNT(*) AS n_purchases_touched,
           ROUND(SUM(CAST(rev AS DOUBLE) / n_touch), 6) AS attributed_revenue
    FROM touches
    GROUP BY cid
    ORDER BY click_id
    """,
)
def attribution_linear_multi_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: each purchase's revenue is split
    equally across the user's clicks in the preceding hour (the range
    join the as-of family already pins), then rolled up per click. The
    per-touch share rev/n_touch divides a DECIMAL-cast revenue by an
    integer count — identical doubles in both engines — and each click's
    sum runs over its (tiny, deterministic) purchase set. The marketing
    warehouse's bread-and-butter query, expressed as one range join +
    one window + one aggregate."""
    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        "user_id",
        F.col("ts").alias("pts"),
        F.col("value").cast("decimal(18,6)").alias("rev"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("cid"),
        F.col("user_id").alias("cuser"),
        F.col("ts").alias("cts"),
    )
    touches = purchases.join(
        clicks,
        (F.col("cuser") == F.col("user_id"))
        & (F.col("cts") >= F.col("pts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("cts") <= F.col("pts")),
    ).select(
        "pid", "rev", "cid",
        F.count(F.lit(1)).over(Window.partitionBy("pid")).alias("n_touch"),
    )
    return (
        touches.groupBy(F.col("cid").alias("click_id"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases_touched"),
            F.round(
                F.sum(F.col("rev").cast("double") / F.col("n_touch")), 6
            ).alias("attributed_revenue"),
        )
        .orderBy("click_id")
    )


_WELFORD_SQL = """
    WITH halves AS (
      SELECT CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15) AS BIGINT) % 2
               AS h,
             CAST(o_totalprice AS DECIMAL(18,2)) AS x
      FROM orders),
    m AS (
      SELECT h,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(ROUND(SUM(x), 2) AS DOUBLE) AS s1,
             CAST(ROUND(SUM(CAST(x * x AS DECIMAL(30,4))), 0) AS DOUBLE) AS s2
      FROM halves GROUP BY h),
    merged AS (
      SELECT SUM(n) AS n, SUM(s1) AS s1, SUM(s2) AS s2 FROM m),
    direct AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(ROUND(SUM(x), 2) AS DOUBLE) AS s1,
             CAST(ROUND(SUM(CAST(x * x AS DECIMAL(30,4))), 0) AS DOUBLE) AS s2
      FROM halves)
    SELECT CAST(mg.n AS BIGINT) AS n_rows,
           ROUND((mg.s2 - mg.s1 * mg.s1 / mg.n) / (mg.n - 1), 4)
             AS merged_sample_var,
           ROUND((d.s2 - d.s1 * d.s1 / d.n) / (d.n - 1), 4)
             AS direct_sample_var,
           CASE WHEN (mg.s2 - mg.s1 * mg.s1 / mg.n) =
                     (d.s2 - d.s1 * d.s1 / d.n)
                THEN 1 ELSE 0 END AS merge_exact
    FROM merged mg, direct d
    """


@register("parallel_variance_merge", oracle=_WELFORD_SQL)
def parallel_variance_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mergeable-moments algebra behind every distributed variance:
    per-partition (n, Σx, Σx²) in exact DECIMAL merge by plain addition,
    and the merged sample variance must EQUAL the direct one (the
    merge_exact flag is computed inside the query, and the oracle
    re-derives everything). This is what lets var_samp run map-side
    partial aggregation; here the 'partitions' are an md5 hash split so
    the check is deterministic. Rounded sums keep the double casts
    exactly representable."""
    orders = _t(spark, sf_dir, "orders")
    halves = orders.select(
        (
            F.conv(
                F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 15),
                16, 10,
            ).cast("long") % 2
        ).alias("h"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("x"),
    )

    def moments(df: DataFrame, keys: list) -> DataFrame:
        g = df.groupBy(*keys) if keys else df.groupBy()
        return g.agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.round(F.sum("x"), 2).cast("double").alias("s1"),
            F.round(F.sum((F.col("x") * F.col("x")).cast("decimal(30,4)")), 0)
            .cast("double")
            .alias("s2"),
        )

    m = moments(halves, ["h"])
    merged = m.agg(
        F.sum("n").alias("n"), F.sum("s1").alias("s1"), F.sum("s2").alias("s2")
    )
    direct = moments(halves, [])
    d = direct.select(
        F.col("n").alias("dn"), F.col("s1").alias("ds1"), F.col("s2").alias("ds2")
    )
    ssq = lambda n, s1, s2: (  # noqa: E731
        F.col(s2) - F.col(s1) * F.col(s1) / F.col(n)
    )
    return merged.crossJoin(F.broadcast(d)).select(
        F.col("n").cast("bigint").alias("n_rows"),
        F.round(ssq("n", "s1", "s2") / (F.col("n") - 1), 4).alias(
            "merged_sample_var"
        ),
        F.round(ssq("dn", "ds1", "ds2") / (F.col("dn") - 1), 4).alias(
            "direct_sample_var"
        ),
        F.when(
            ssq("n", "s1", "s2") == ssq("dn", "ds1", "ds2"), 1
        ).otherwise(0).alias("merge_exact"),
    )


@register(
    "sequence_motif_top20",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS e1,
             LEAD(event_type, 1) OVER w AS e2,
             LEAD(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT e1 || '>' || e2 || '>' || e3 AS motif,
           COUNT(*) AS n
    FROM seq WHERE e3 IS NOT NULL
    GROUP BY e1 || '>' || e2 || '>' || e3
    ORDER BY n DESC, motif
    LIMIT 20
    """,
)
def sequence_motif_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent behavioral motifs: the top-20 contiguous length-3
    event-type subsequences across all user timelines — one window pass
    (two LEADs over the per-user order), one count aggregate. The
    sequence-mining primitive behind funnel discovery, without the
    exponential candidate generation of general sequential-pattern
    mining (contiguous motifs are a linear pass at any scale)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e3").isNotNull())
    return (
        seq.select(
            F.concat_ws(">", "e1", "e2", "e3").alias("motif")
        )
        .groupBy("motif")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "motif")
        .limit(20)
    )


@register(
    "survival_kaplan_meier",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             MIN(CAST(ts AS DATE)) AS first_d,
             MIN(CASE WHEN event_type = 'purchase'
                      THEN CAST(ts AS DATE) END) AS purch_d,
             MAX(CAST(ts AS DATE)) AS last_d
      FROM events GROUP BY user_id),
    dur AS (
      SELECT CASE WHEN purch_d IS NOT NULL
                  THEN date_diff('day', first_d, purch_d)
                  ELSE date_diff('day', first_d, last_d) END AS t,
             CASE WHEN purch_d IS NOT NULL THEN 1 ELSE 0 END AS ev
      FROM per_user),
    per_t AS (
      SELECT t, COUNT(*) AS n_at_t, SUM(ev) AS d_i FROM dur GROUP BY t),
    w AS (
      SELECT t, d_i,
             SUM(n_at_t) OVER (ORDER BY t DESC
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS n_i
      FROM per_t),
    evt AS (SELECT t, d_i, n_i FROM w WHERE d_i > 0),
    arr AS (
      SELECT list(t ORDER BY t) AS ts_,
             list(d_i ORDER BY t) AS ds,
             list(n_i ORDER BY t) AS ns,
             list(1 - CAST(d_i AS DOUBLE) / n_i ORDER BY t) AS fs
      FROM evt)
    SELECT CAST(ts_[j] AS INT) AS t_days,
           CAST(ds[j] AS BIGINT) AS n_events,
           CAST(ns[j] AS BIGINT) AS n_at_risk,
           ROUND(list_reduce(fs[1:j], (a, b) -> a * b), 6) AS km_survival
    FROM arr, UNNEST(range(1, len(fs) + 1)) AS u(j)
    ORDER BY t_days
    """,
)
def survival_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier product-limit estimator of time-to-first-purchase
    (days since each user's first event), with users who never purchase
    RIGHT-CENSORED at their last activity — real survival analysis, the
    statistically-correct replacement for naive time-to-conversion
    averages that silently drop non-converters. Risk sets are integer
    window sums; the survival curve is a product of per-event-time
    factors folded left-to-right over a time-ordered array, so the float
    products are bit-identical in both engines. One per-user aggregate +
    one tiny window: the curve table is event-time-sized, never
    corpus-sized."""
    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("first_d"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts").cast("date"))
        ).alias("purch_d"),
        F.max(F.col("ts").cast("date")).alias("last_d"),
    )
    dur = per_user.select(
        F.when(
            F.col("purch_d").isNotNull(),
            F.datediff("purch_d", "first_d"),
        ).otherwise(F.datediff("last_d", "first_d")).alias("t"),
        F.when(F.col("purch_d").isNotNull(), 1).otherwise(0).alias("ev"),
    )
    per_t = dur.groupBy("t").agg(
        F.count(F.lit(1)).alias("n_at_t"), F.sum("ev").alias("d_i")
    )
    wrev = (
        Window.orderBy(F.desc("t"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    risk = per_t.select(
        "t", "d_i", F.sum("n_at_t").over(wrev).alias("n_i")
    ).filter(F.col("d_i") > 0)
    packed = risk.agg(
        F.sort_array(F.collect_list(F.struct("t", "d_i", "n_i"))).alias("arr")
    ).select(
        "arr",
        F.expr(
            "transform(arr, s -> CAST(1 AS DOUBLE) - CAST(s.d_i AS DOUBLE) / s.n_i)"
        ).alias("fs"),
    )
    ex = packed.select("fs", F.posexplode("arr").alias("j0", "s"))
    return ex.select(
        F.col("s.t").cast("int").alias("t_days"),
        F.col("s.d_i").cast("bigint").alias("n_events"),
        F.col("s.n_i").cast("bigint").alias("n_at_risk"),
        F.expr(
            "round(aggregate(slice(fs, 1, j0 + 1), CAST(1 AS DOUBLE), (a, x) -> a * x), 6)"
        ).alias("km_survival"),
    ).orderBy("t_days")


@register(
    "collation_case_insensitive_join",
    oracle="""
    WITH a AS (SELECT DISTINCT upper(p_brand) AS b FROM part),
    b AS (SELECT DISTINCT lower(p_brand) AS b FROM part)
    SELECT COUNT(*) AS n_matches,
           (SELECT COUNT(*) FROM a) AS n_left,
           (SELECT COUNT(*) FROM b) AS n_right
    FROM a JOIN b ON lower(a.b) = lower(b.b)
    """,
)
def collation_case_insensitive_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 COLLATION surface: an UPPER-cased and a lower-cased brand
    dimension joined under UTF8_LCASE collation must match exactly like
    an explicit lower()=lower() join (which is what the oracle runs) —
    pinning that collated equality is real equality semantics, usable in
    joins and aggregates, not just ORDER BY. Collation-aware equality is
    the engine-native answer to the lower()-wrapping that breaks
    predicate pushdown on case-insensitive business keys."""
    part = _t(spark, sf_dir, "part")
    a = part.select(F.upper("p_brand").alias("b")).distinct()
    b = part.select(F.lower("p_brand").alias("b2")).distinct()
    joined = a.join(
        b,
        F.expr("b COLLATE UTF8_LCASE = b2 COLLATE UTF8_LCASE"),
    )
    na = a.agg(F.count(F.lit(1)).alias("n_left"))
    nb = b.agg(F.count(F.lit(1)).alias("n_right"))
    return (
        joined.agg(F.count(F.lit(1)).alias("n_matches"))
        .crossJoin(F.broadcast(na))
        .crossJoin(F.broadcast(nb))
    )


@register(
    "incremental_agg_maintenance",
    oracle=f"""
    WITH split AS (
      SELECT o_orderstatus,
             CAST(o_totalprice AS {_DEC}) AS x,
             CASE WHEN YEAR(o_orderdate) >= 2000 THEN 1 ELSE 0 END AS is_delta
      FROM orders),
    base AS (
      SELECT o_orderstatus, COUNT(*) AS n, SUM(x) AS s
      FROM split WHERE is_delta = 0 GROUP BY o_orderstatus),
    delta AS (
      SELECT o_orderstatus, COUNT(*) AS n, SUM(x) AS s
      FROM split WHERE is_delta = 1 GROUP BY o_orderstatus),
    merged AS (
      SELECT o_orderstatus, SUM(n) AS n, SUM(s) AS s
      FROM (SELECT * FROM base UNION ALL SELECT * FROM delta)
      GROUP BY o_orderstatus),
    direct AS (
      SELECT o_orderstatus, COUNT(*) AS n, SUM(x) AS s
      FROM split GROUP BY o_orderstatus)
    SELECT m.o_orderstatus,
           CAST(m.n AS BIGINT) AS n_orders,
           CAST(ROUND(m.s, 2) AS DOUBLE) AS revenue,
           CASE WHEN m.n = d.n AND m.s = d.s THEN 1 ELSE 0 END
             AS matches_direct
    FROM merged m JOIN direct d ON d.o_orderstatus = m.o_orderstatus
    ORDER BY m.o_orderstatus
    """,
)
def incremental_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental rollup maintenance in batch form: a pre-2000 base
    aggregate plus a post-2000 delta aggregate merged by ADDITION must
    equal the direct full aggregate — exactly, because the partial
    states (count, DECIMAL sum) are the mergeable algebra foreachBatch
    upserts rely on. The matches_direct flag is computed in-query and
    the oracle re-derives everything; this is the correctness core of
    every materialized-view / continuous-aggregate implementation."""
    orders = _t(spark, sf_dir, "orders")
    split = orders.select(
        "o_orderstatus",
        F.col("o_totalprice").cast(_DEC).alias("x"),
        F.when(F.year("o_orderdate") >= 2000, 1).otherwise(0).alias("is_delta"),
    )

    def agg_of(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n"), F.sum("x").alias("s")
        )

    base = agg_of(split.filter(F.col("is_delta") == 0))
    delta = agg_of(split.filter(F.col("is_delta") == 1))
    merged = (
        base.unionByName(delta)
        .groupBy("o_orderstatus")
        .agg(F.sum("n").alias("n"), F.sum("s").alias("s"))
    )
    direct = agg_of(split).select(
        F.col("o_orderstatus").alias("st2"),
        F.col("n").alias("dn"),
        F.col("s").alias("ds"),
    )
    return (
        merged.join(F.broadcast(direct), merged.o_orderstatus == direct.st2)
        .select(
            "o_orderstatus",
            F.col("n").cast("bigint").alias("n_orders"),
            F.round(F.col("s"), 2).cast("double").alias("revenue"),
            F.when(
                (F.col("n") == F.col("dn")) & (F.col("s") == F.col("ds")), 1
            ).otherwise(0).alias("matches_direct"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "embedding_pq_adc_recall",
    oracle="""
    WITH q AS (
      SELECT vec_id,
             [GREATEST(CAST(ROUND(CAST(x AS DOUBLE) * 64, 0) AS INT) + 128, 0)
              FOR x IN embedding] AS qv
      FROM embeddings),
    dims AS (
      SELECT vec_id, pos0 // 8 AS sub, pos0 % 8 AS dpos, val
      FROM (SELECT vec_id, unnest(qv) AS val,
                   unnest(range(0, len(qv))) AS pos0 FROM q)),
    cents AS (
      SELECT vec_id AS cid, sub, dpos, val AS cval FROM dims WHERE vec_id < 16),
    code_d AS (
      SELECT d.vec_id, d.sub, c.cid,
             SUM((d.val - c.cval) * (d.val - c.cval)) AS dist
      FROM dims d JOIN cents c ON c.sub = d.sub AND c.dpos = d.dpos
      GROUP BY d.vec_id, d.sub, c.cid),
    codes AS (
      SELECT vec_id, sub, cid FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                                     ORDER BY dist, cid) AS rn
        FROM code_d) WHERE rn = 1),
    probes AS (SELECT vec_id AS pid FROM q WHERE vec_id < 3),
    adc AS (
      SELECT p.pid, k.vec_id AS xid, SUM(cd.dist) AS adist
      FROM probes p
      JOIN codes k ON k.vec_id <> p.pid
      JOIN code_d cd ON cd.vec_id = p.pid AND cd.sub = k.sub
                    AND cd.cid = k.cid
      GROUP BY p.pid, k.vec_id),
    adc_top AS (
      SELECT pid, xid FROM (
        SELECT pid, xid,
               ROW_NUMBER() OVER (PARTITION BY pid
                                  ORDER BY adist, xid) AS rn
        FROM adc) WHERE rn <= 10),
    exact AS (
      SELECT p.pid, x.vec_id AS xid,
             SUM((dp.val - dx.val) * (dp.val - dx.val)) AS edist
      FROM probes p
      JOIN q x ON x.vec_id <> p.pid
      JOIN dims dp ON dp.vec_id = p.pid
      JOIN dims dx ON dx.vec_id = x.vec_id AND dx.sub = dp.sub
                  AND dx.dpos = dp.dpos
      GROUP BY p.pid, x.vec_id),
    exact_top AS (
      SELECT pid, xid FROM (
        SELECT pid, xid,
               ROW_NUMBER() OVER (PARTITION BY pid
                                  ORDER BY edist, xid) AS rn
        FROM exact) WHERE rn <= 10)
    SELECT a.pid AS probe_id,
           CAST(10 AS INT) AS k,
           CAST(COUNT(e.xid) AS BIGINT) AS n_hits,
           ROUND(CAST(COUNT(e.xid) AS DOUBLE) / 10, 6) AS recall_at_10
    FROM adc_top a
    LEFT JOIN exact_top e ON e.pid = a.pid AND e.xid = a.xid
    GROUP BY a.pid
    ORDER BY probe_id
    """,
)
def embedding_pq_adc_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PQ SEARCH path (not just code assignment): asymmetric distance
    computation — probe-to-centroid lookup tables summed over the stored
    codes — produces each probe's ADC top-10, evaluated as recall
    against exact quantized L2. Everything is integer arithmetic (exact
    codes, exact ADC sums, deterministic tiebreaks), so the whole
    approximate-search pipeline carries a full value oracle. Plan: the
    corpus-scale work is one codes table and one broadcastable
    (probe x sub x centroid) lookup — the scan side never materializes
    probe x corpus x dims."""
    emb = _t(spark, sf_dir, "embeddings")
    q = sim_mod.quantize_for_kmeans(emb, "vec_id", "embedding")
    dims = q.select(
        "vec_id", F.posexplode("qv").alias("pos0", "val")
    ).select(
        "vec_id",
        (F.col("pos0") / 8).cast("int").alias("sub"),
        (F.col("pos0") % 8).alias("dpos"),
        "val",
    )
    dims = op_cache.track(dims.cache())
    cents = dims.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("cid"), "sub", "dpos", F.col("val").alias("cval")
    )
    code_d = (
        dims.join(F.broadcast(cents), ["sub", "dpos"])
        .groupBy("vec_id", "sub", "cid")
        .agg(
            F.sum(
                (F.col("val") - F.col("cval")) * (F.col("val") - F.col("cval"))
            ).alias("dist")
        )
    )
    code_d = op_cache.track(code_d.cache())
    wcode = Window.partitionBy("vec_id", "sub").orderBy("dist", "cid")
    codes = (
        code_d.withColumn("rn", F.row_number().over(wcode))
        .filter(F.col("rn") == 1)
        .select("vec_id", "sub", "cid")
    )
    probe_lut = code_d.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("pid"), "sub", "cid", "dist"
    )
    adc = (
        codes.join(
            F.broadcast(probe_lut),
            (codes.sub == probe_lut.sub)
            & (codes.cid == probe_lut.cid)
            & (codes.vec_id != probe_lut.pid),
        )
        .groupBy("pid", F.col("vec_id").alias("xid"))
        .agg(F.sum("dist").alias("adist"))
    )
    wtop = Window.partitionBy("pid").orderBy("adist", "xid")
    adc_top = (
        adc.withColumn("rn", F.row_number().over(wtop))
        .filter(F.col("rn") <= 10)
        .select("pid", "xid")
    )
    pd_ = dims.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("pid"), "sub", "dpos", F.col("val").alias("pval")
    )
    exact = (
        dims.join(F.broadcast(pd_), ["sub", "dpos"])
        .filter(F.col("vec_id") != F.col("pid"))
        .groupBy("pid", F.col("vec_id").alias("xid"))
        .agg(
            F.sum(
                (F.col("val") - F.col("pval")) * (F.col("val") - F.col("pval"))
            ).alias("edist")
        )
    )
    wex = Window.partitionBy("pid").orderBy("edist", "xid")
    exact_top = (
        exact.withColumn("rn", F.row_number().over(wex))
        .filter(F.col("rn") <= 10)
        .select(F.col("pid").alias("epid"), F.col("xid").alias("exid"))
    )
    return (
        adc_top.join(
            exact_top,
            (F.col("pid") == F.col("epid")) & (F.col("xid") == F.col("exid")),
            "left",
        )
        .groupBy(F.col("pid").alias("probe_id"))
        .agg(
            F.lit(10).cast("int").alias("k"),
            F.count("exid").cast("bigint").alias("n_hits"),
            F.round(F.count("exid").cast("double") / 10, 6).alias("recall_at_10"),
        )
        .orderBy("probe_id")
    )


@register(
    "trajectory_similarity_topk",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type, ts, event_id,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events),
    paths AS (
      SELECT user_id,
             list_aggregate(list(substr(event_type, 1, 1) ORDER BY rn),
                            'string_agg', '') AS path
      FROM seq WHERE rn <= 20 GROUP BY user_id),
    pairs AS (
      SELECT a.user_id AS user_a, b.user_id AS user_b,
             levenshtein(a.path, b.path) AS dist
      FROM paths a JOIN paths b
        ON substr(a.path, 1, 1) = substr(b.path, 1, 1)
       AND a.user_id < b.user_id)
    SELECT user_a, user_b, CAST(dist AS INT) AS edit_distance
    FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY dist, user_a, user_b) AS rk
          FROM pairs)
    WHERE rk <= 10
    ORDER BY edit_distance, user_a, user_b
    """,
)
def trajectory_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trajectory similarity (the REPOSE/top-k-similarity family on
    behavioral paths): each user's first 20 events compress to a
    character path (first letter of each event type), pairs BLOCKED on
    the same starting step get an edit distance, and the 10 most similar
    pairs surface. Blocking bounds the pair count exactly like the
    dedup family's language blocking; Levenshtein runs JVM-side in both
    engines with integer results."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        F.substring("event_type", 1, 1).alias("c"),
        F.row_number().over(w).alias("rn"),
    ).filter(F.col("rn") <= 20)
    paths = seq.groupBy("user_id").agg(
        F.expr(
            "array_join(transform(sort_array(collect_list(struct(rn, c))), s -> s.c), '')"
        ).alias("path")
    )
    a = paths.select(F.col("user_id").alias("user_a"), F.col("path").alias("pa"))
    b = paths.select(F.col("user_id").alias("user_b"), F.col("path").alias("pb"))
    pairs = a.join(
        b,
        (F.substring("pa", 1, 1) == F.substring("pb", 1, 1))
        & (F.col("user_a") < F.col("user_b")),
    ).select(
        "user_a", "user_b", F.levenshtein("pa", "pb").alias("dist")
    )
    return (
        pairs.orderBy("dist", "user_a", "user_b")
        .limit(10)
        .select("user_a", "user_b", F.col("dist").cast("int").alias("edit_distance"))
        .orderBy("edit_distance", "user_a", "user_b")
    )


@register(
    "ml_inference_iterator_udf",
    oracle="""
    WITH q AS (
      SELECT vec_id,
             [GREATEST(CAST(ROUND(CAST(x AS DOUBLE) * 64, 0) AS INT) + 128, 0)
              FOR x IN embedding] AS qv
      FROM embeddings),
    scored AS (
      SELECT vec_id,
             SUM(val * (((i - 1) * 37) % 100 - 50)) AS num
      FROM (SELECT vec_id, unnest(qv) AS val,
                   unnest(range(1, len(qv) + 1)) AS i FROM q)
      GROUP BY vec_id)
    SELECT vec_id, ROUND(CAST(num AS DOUBLE) / 100, 4) AS score
    FROM scored ORDER BY vec_id LIMIT 200
    """,
)
def ml_inference_iterator_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model inference through an ITERATOR pandas UDF — the deployment
    shape for scoring with a loaded model: the 'model' (a deterministic
    integer weight vector) is constructed ONCE per executor task, before
    the batch loop, and every Arrow batch reuses it — the amortization
    that makes per-partition model loading viable at scale (loading per
    row or per batch is the classic inference-pipeline bug). The dot
    product stays int64 inside numpy, so the UDF output is exact and the
    closed-form oracle reproduces it."""
    from pyspark.sql import types as T

    emb = _t(spark, sf_dir, "embeddings")
    q = sim_mod.quantize_for_kmeans(emb, "vec_id", "embedding")

    @F.pandas_udf(T.LongType())
    def score_num(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        import numpy as np

        # one-time per-task "model load": runs before the batch loop
        w = np.array([((i * 37) % 100) - 50 for i in range(64)], dtype=np.int64)
        for s in batches:
            mat = np.stack(s.to_numpy()).astype(np.int64)
            yield pd.Series(mat[:, : len(w)] @ w)

    return (
        q.select("vec_id", score_num("qv").alias("num"))
        .select(
            "vec_id",
            F.round(F.col("num").cast("double") / 100, 4).alias("score"),
        )
        .orderBy("vec_id")
        .limit(200)
    )


@register(
    "pandas_udaf_language_stats",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars * n_chars) AS BIGINT) AS sum_sq_chars
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
)
def pandas_udaf_language_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A GROUPED_AGG pandas UDF (the Arrow-batched custom aggregate —
    the numpy-side counterpart of a Catalyst UDAF) computing the sum of
    squared document lengths per language. Integer arithmetic inside
    numpy keeps the result order-independent, so the custom aggregate is
    value-checked like any built-in. This is the API for aggregations
    the built-ins can't express (sketch merges, model-state folds) while
    keeping Arrow transfer and map-side grouping."""
    from pyspark.sql import types as T

    @F.pandas_udf(T.LongType())
    def sum_sq(v: pd.Series) -> int:
        import numpy as np

        a = v.to_numpy(dtype="int64")
        return int((a * a).sum())

    docs = _t(spark, sf_dir, "documents")
    # GROUPED_AGG pandas UDFs cannot mix with JVM aggregates in one agg
    # (INVALID_PANDAS_UDF_PLACEMENT) — the count rides a separate
    # aggregate joined on the (tiny) group key
    custom = docs.groupBy("lang").agg(
        sum_sq("n_chars").cast("bigint").alias("sum_sq_chars")
    )
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        custom.join(F.broadcast(counts), "lang")
        .select("lang", "n_docs", "sum_sq_chars")
        .orderBy("lang")
    )


@register(
    "embedding_centroid_drift",
    oracle="""
    WITH q AS (
      SELECT vec_id,
             [GREATEST(CAST(ROUND(CAST(x AS DOUBLE) * 64, 0) AS INT) + 128, 0)
              FOR x IN embedding] AS qv
      FROM embeddings),
    cents AS (
      SELECT vec_id AS cid, qv AS cv FROM q WHERE vec_id < 8),
    assign AS (
      SELECT vec_id, cid, qv, vec_id % 2 AS half FROM (
        SELECT x.vec_id, c.cid, x.qv,
               ROW_NUMBER() OVER (
                 PARTITION BY x.vec_id
                 ORDER BY list_sum([ (x.qv[i] - c.cv[i]) * (x.qv[i] - c.cv[i])
                                     FOR i IN range(1, len(x.qv) + 1) ]),
                          c.cid) AS rn
        FROM q x CROSS JOIN cents c)
      WHERE rn = 1),
    dimvals AS (
      SELECT cid, half, unnest(qv) AS val,
             unnest(range(1, len(qv) + 1)) AS d
      FROM assign),
    means AS (
      SELECT cid, half, d, SUM(val) // COUNT(*) AS m
      FROM dimvals GROUP BY cid, half, d),
    counts AS (
      SELECT cid, half, COUNT(*) AS n FROM assign GROUP BY cid, half),
    drift AS (
      SELECT a.cid, SUM((a.m - b.m) * (a.m - b.m)) AS d2
      FROM means a JOIN means b ON b.cid = a.cid AND b.d = a.d
      WHERE a.half = 0 AND b.half = 1
      GROUP BY a.cid)
    SELECT d.cid AS cluster_id,
           CAST(c0.n AS BIGINT) AS n_half0,
           CAST(c1.n AS BIGINT) AS n_half1,
           ROUND(SQRT(CAST(d.d2 AS DOUBLE)), 6) AS centroid_drift
    FROM drift d
    JOIN counts c0 ON c0.cid = d.cid AND c0.half = 0
    JOIN counts c1 ON c1.cid = d.cid AND c1.half = 1
    ORDER BY cluster_id
    """,
)
def embedding_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-distribution drift monitor: vectors split into two
    halves (vec_id parity — the before/after proxy), assigned to the
    nearest of 8 fixed seed centroids, and each cluster's per-half
    integer centroid compared by L2 — the production check that an
    embedding model upgrade or a corpus shift hasn't silently moved the
    space under an ANN index. Integer means (floor division on
    non-negative sums is engine-identical) keep everything exact until
    the final sqrt."""
    emb = _t(spark, sf_dir, "embeddings")
    q = sim_mod.quantize_for_kmeans(emb, "vec_id", "embedding")
    cents = q.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), F.col("qv").alias("cv")
    )
    dists = q.crossJoin(F.broadcast(cents)).select(
        "vec_id", "cid", "qv",
        F.expr(
            "aggregate(zip_with(qv, cv, (a, b) -> (a - b) * (a - b)), 0, (acc, x) -> acc + x)"
        ).alias("dist"),
    )
    wassign = Window.partitionBy("vec_id").orderBy("dist", "cid")
    assign = (
        dists.withColumn("rn", F.row_number().over(wassign))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cid", "qv", (F.col("vec_id") % 2).alias("half"))
    )
    assign = op_cache.track(assign.cache())
    dimvals = assign.select(
        "cid", "half", F.posexplode("qv").alias("d0", "val")
    ).select("cid", "half", (F.col("d0") + 1).alias("d"), "val")
    means = dimvals.groupBy("cid", "half", "d").agg(
        F.expr("sum(val) div count(1)").alias("m")
    )
    counts = assign.groupBy("cid", "half").agg(F.count(F.lit(1)).alias("n"))
    a = means.filter(F.col("half") == 0).select(
        "cid", "d", F.col("m").alias("m0")
    )
    b = means.filter(F.col("half") == 1).select(
        F.col("cid").alias("cid2"), F.col("d").alias("d2x"), F.col("m").alias("m1")
    )
    drift = (
        a.join(b, (a.cid == b.cid2) & (a.d == b.d2x))
        .groupBy("cid")
        .agg(
            F.sum(
                (F.col("m0") - F.col("m1")) * (F.col("m0") - F.col("m1"))
            ).alias("dd")
        )
    )
    c0 = counts.filter(F.col("half") == 0).select(
        "cid", F.col("n").alias("n_half0")
    )
    c1 = counts.filter(F.col("half") == 1).select(
        F.col("cid").alias("cidb"), F.col("n").alias("n_half1")
    )
    return (
        drift.join(F.broadcast(c0), "cid")
        .join(F.broadcast(c1), drift.cid == c1.cidb)
        .select(
            F.col("cid").alias("cluster_id"),
            F.col("n_half0").cast("bigint").alias("n_half0"),
            F.col("n_half1").cast("bigint").alias("n_half1"),
            F.round(F.sqrt(F.col("dd").cast("double")), 6).alias(
                "centroid_drift"
            ),
        )
        .orderBy("cluster_id")
    )


@register(
    "observation_single_pass_metrics",
    oracle="""
    SELECT COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE)
             AS sum_value,
           CAST(MIN(event_id) AS BIGINT) AS min_event_id,
           CAST(MAX(event_id) AS BIGINT) AS max_event_id
    FROM events
    """,
)
def observation_single_pass_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Observation API (SURVEY §2.6 A1's mechanism, surfaced as a
    query): metrics ride ON the action itself — count, exact decimal
    sum, distinct users are observed during ONE pass over the events
    scan, with no second aggregation job. This is how the export
    pipeline reports its counters without re-reading the input; the
    oracle recomputes the same metrics relationally and the values must
    agree exactly."""
    from pyspark.sql import Observation

    ev = _t(spark, sf_dir, "events")
    obs = Observation("metrics")
    # DISTINCT aggregates are disallowed in observed metrics
    # (INVALID_OBSERVED_METRICS) — min/max/count/sum are the menu
    observed = ev.observe(
        obs,
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("sum_value"),
        F.min("event_id").alias("min_event_id"),
        F.max("event_id").alias("max_event_id"),
    )
    observed.write.format("noop").mode("overwrite").save()
    got = obs.get
    return spark.createDataFrame(
        [
            (
                int(got["n_events"]),
                float(round(got["sum_value"], 4)),
                int(got["min_event_id"]),
                int(got["max_event_id"]),
            )
        ],
        "n_events bigint, sum_value double, min_event_id bigint, "
        "max_event_id bigint",
    )


@register(
    "streaming_progress_metrics",
    oracle="SELECT COUNT(*) AS total_input_rows, CAST(1 AS INT) AS saw_batches FROM events",
)
def streaming_progress_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """StreamingQueryProgress observability: after an availableNow drain
    of a windowed aggregate, the per-batch progress records must account
    for EVERY input row exactly once (sum of numInputRows == batch row
    count) — the monitoring contract operations teams alert on. The
    drain runs a real streaming query; the returned frame carries the
    summed progress metrics."""
    import os as _os

    from .sources.catalog import _read_parquet_nanos_safe, normalize_event_ts
    from .streaming.stateful import _scoped_shuffle_partitions

    import tempfile
    import uuid as _uuid

    events_path = _os.path.join(sf_dir, "events.parquet")
    batch_df = _read_parquet_nanos_safe(spark, events_path)
    stream = (
        spark.readStream.schema(batch_df.schema)
        .option("pathGlobFilter", _os.path.basename(events_path))
        .parquet(_os.path.dirname(events_path))
    )
    stream = normalize_event_ts(stream)
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    sink = f"prog_{_uuid.uuid4().hex[:8]}"
    ckpt = _os.path.join(tempfile.gettempdir(), f"ckpt_{_uuid.uuid4().hex[:8]}")
    import shutil

    try:
        with _scoped_shuffle_partitions(spark, 8):
            q = (
                agg.writeStream.format("memory")
                .queryName(sink)
                .outputMode("append")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            total = sum(
                int(p["numInputRows"]) for p in q.recentProgress
            )
            n_batches = len(q.recentProgress)
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    return spark.createDataFrame(
        [(total, 1 if n_batches >= 1 else 0)],
        "total_input_rows bigint, saw_batches int",
    )


@register(
    "pandas_udaf_over_window",
    oracle="""
    WITH v AS (
      SELECT user_id, event_id, CAST(value * 100 AS BIGINT) AS cents,
             ts
      FROM events WHERE event_type = 'purchase')
    SELECT user_id, event_id,
           CAST(SUM(cents * cents) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT)
             AS rolling_sum_sq
    FROM v
    ORDER BY user_id, event_id
    LIMIT 500
    """,
)
def pandas_udaf_over_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A GROUPED_AGG pandas UDF evaluated OVER A WINDOW FRAME — the
    custom-aggregate-as-window-function combination (Spark re-evaluates
    the Arrow aggregate per frame): a rolling 3-event sum of squared
    purchase cents per user. Cents are exact integers (value*100 rounds
    to the same int64 in numpy and both SQL engines because the doubles
    are identical), so the custom rolling aggregate carries a full value
    oracle."""
    from pyspark.sql import types as T

    @F.pandas_udf(T.LongType())
    def sum_sq(v: pd.Series) -> int:
        import numpy as np

        a = v.to_numpy(dtype="int64")
        return int((a * a).sum())

    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    v = ev.select(
        "user_id", "event_id", "ts",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    return (
        v.select(
            "user_id", "event_id",
            sum_sq("cents").over(w).cast("bigint").alias("rolling_sum_sq"),
        )
        .orderBy("user_id", "event_id")
        .limit(500)
    )


@register(
    "multimodal_image_near_dup_pairs",
    oracle="""
    WITH grid AS (
      SELECT t.id, y.y, c.c,
             (c.c * 16) // 9 AS xs, (y.y * 12) // 8 AS ys
      FROM range(0, 50) t(id)
      CROSS JOIN range(0, 8) y(y)
      CROSS JOIN range(0, 9) c(c)),
    gray AS (
      SELECT id, y, c,
             ((id * 31 + ((ys * 16 + xs) * 3 + 0)) % 256) +
             ((id * 31 + ((ys * 16 + xs) * 3 + 1)) % 256) +
             ((id * 31 + ((ys * 16 + xs) * 3 + 2)) % 256) AS g
      FROM grid),
    bits AS (
      SELECT id, y, c,
             CASE WHEN LEAD(g) OVER (PARTITION BY id, y ORDER BY c) > g
                  THEN 1 ELSE 0 END AS b
      FROM gray),
    packed AS (
      SELECT id,
             SUM(CASE WHEN y < 4 AND b = 1
                      THEN CAST(1 AS BIGINT) << (y * 8 + c) ELSE 0 END) AS hi,
             SUM(CASE WHEN y >= 4 AND b = 1
                      THEN CAST(1 AS BIGINT) << ((y - 4) * 8 + c) ELSE 0 END)
               AS lo
      FROM bits WHERE c < 8 GROUP BY id),
    pairs AS (
      SELECT bit_count(CAST(xor(a.hi, b.hi) AS BIGINT)) +
             bit_count(CAST(xor(a.lo, b.lo) AS BIGINT)) AS hamming
      FROM packed a JOIN packed b ON a.id < b.id)
    SELECT CAST(hamming // 8 AS INT) AS hamming_band,
           COUNT(*) AS n_pairs,
           CAST(MIN(hamming) AS INT) AS min_hamming,
           CAST(MAX(hamming) AS INT) AS max_hamming
    FROM pairs
    GROUP BY hamming // 8
    ORDER BY hamming_band
    """,
)
def multimodal_image_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup detection closing the multimodal dedup loop:
    pairwise Hamming distance between perceptual dHashes (the
    really-decoded P6 pipeline), banded into a distance histogram — the
    readout that calibrates a hamming threshold before bucketed
    image dedup, exactly like the MinHash band sweep calibrates text
    LSH. The hash table is media-sized, so the pair join is the small
    diagnostic form; production pairing buckets on hash prefixes."""
    media = mm_mod.synthetic_ppm_media(spark, n=50)
    hashes = mm_mod.ppm_image_dhash(media)
    a = hashes.select(
        F.col("media_id").alias("ida"),
        F.col("dhash_hi").alias("ha"),
        F.col("dhash_lo").alias("la"),
    )
    b = hashes.select(
        F.col("media_id").alias("idb"),
        F.col("dhash_hi").alias("hb"),
        F.col("dhash_lo").alias("lb"),
    )
    pairs = a.join(b, F.col("ida") < F.col("idb")).select(
        (
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
            + F.bit_count(F.col("la").bitwiseXOR(F.col("lb")))
        ).alias("hamming")
    )
    return (
        pairs.groupBy(
            F.expr("hamming div 8").cast("int").alias("hamming_band")
        )
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.min("hamming").cast("int").alias("min_hamming"),
            F.max("hamming").cast("int").alias("max_hamming"),
        )
        .orderBy("hamming_band")
    )


_REGR_SQL = """
    SELECT l_returnflag,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
           ROUND(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
           ROUND(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
           ROUND(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
           ROUND(regr_avgx(l_extendedprice, l_quantity), 6) AS avg_qty,
           ROUND(regr_avgy(l_extendedprice, l_quantity), 4) AS avg_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """


@register("regr_aggregate_family", oracle=_REGR_SQL)
def regr_aggregate_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANSI linear-regression aggregate family (regr_slope /
    intercept / r2 / count / avgx / avgy) grouped per return flag — one
    identical SQL string on both engines, complementing the
    normal-equations OLS query with the built-in single-feature path
    (these are map-side-combinable moment aggregates under the hood,
    which is why they exist as aggregates at all)."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_REGR_SQL)


_ORACLES["dedup_lexical_semantic_agreement"] = f"""
    WITH lex AS (SELECT id_a, id_b FROM ({_ORACLES["dedup_ngram_jaccard_pairs"]}) t),
    sem AS (SELECT id_a, id_b FROM ({_ORACLES["embedding_near_dup_pairs"]}) t)
    SELECT (SELECT COUNT(*) FROM lex) AS n_lexical,
           (SELECT COUNT(*) FROM sem) AS n_semantic,
           (SELECT COUNT(*) FROM lex JOIN sem
             ON sem.id_a = lex.id_a AND sem.id_b = lex.id_b) AS n_both,
           (SELECT COUNT(*) FROM lex WHERE NOT EXISTS
             (SELECT 1 FROM sem WHERE sem.id_a = lex.id_a
                                  AND sem.id_b = lex.id_b)) AS n_lexical_only,
           (SELECT COUNT(*) FROM sem WHERE NOT EXISTS
             (SELECT 1 FROM lex WHERE lex.id_a = sem.id_a
                                  AND lex.id_b = sem.id_b)) AS n_semantic_only
    """


@register("dedup_lexical_semantic_agreement")
def dedup_lexical_semantic_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Method-agreement audit between the two near-dup detectors: exact
    n-gram-Jaccard (lexical) vs hyperplane-bucketed embedding cosine
    (semantic) over the id-aligned documents/embeddings corpus — the
    readout a curation team uses to decide whether semantic dedup adds
    anything over lexical on their data (here the synthetic embeddings
    are uncorrelated with the text, so overlap should be near-chance —
    which is itself the correct reading of the report). Composes two
    already-oracled pipelines; all counts integer."""
    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    lex = dedup_mod.ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.2, block_col="lang"
    ).select("id_a", "id_b")
    dim = len(emb.select("embedding").first()[0])
    sem = sim_mod.embedding_near_dup_pairs(emb, dim=dim, threshold=0.2).select(
        F.col("id_a").alias("sa"), F.col("id_b").alias("sb")
    )
    lex = op_cache.track(lex.cache())
    sem = op_cache.track(sem.cache())
    both = lex.join(
        sem, (F.col("id_a") == F.col("sa")) & (F.col("id_b") == F.col("sb"))
    )
    nl = lex.agg(F.count(F.lit(1)).alias("n_lexical"))
    ns = sem.agg(F.count(F.lit(1)).alias("n_semantic"))
    nb = both.agg(F.count(F.lit(1)).alias("n_both"))
    return (
        nl.crossJoin(F.broadcast(ns))
        .crossJoin(F.broadcast(nb))
        .select(
            "n_lexical",
            "n_semantic",
            "n_both",
            (F.col("n_lexical") - F.col("n_both")).alias("n_lexical_only"),
            (F.col("n_semantic") - F.col("n_both")).alias("n_semantic_only"),
        )
    )


# ---------------------------------------------------------------------------
# Round 3: O(log n) connected components, the composed IVF+PQ search path,
# the full-outer streaming join, seasonal decomposition, SQL-surface breadth
# (UNION BY NAME / VALUES / EXECUTE IMMEDIATE), and training-pipeline batch
# construction (preference pairs, length-grouped batching).
# ---------------------------------------------------------------------------


@register(
    "graph_cc_two_phase",
    oracle="""
    WITH RECURSIVE
    sh AS (
      SELECT doc_id, lang,
             list_distinct([list_aggregate(words[i:i+2], 'string_agg', ' ')
                            FOR i IN range(1, len(words) - 1)]) AS shingles
      FROM (SELECT doc_id, lang,
                   string_split_regex(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS words
            FROM documents)
      WHERE len(words) >= 3),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
            len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.2),
    edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    reach(id, r) AS (
      SELECT src, src FROM edges
      UNION
      SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src),
    comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id)
    SELECT component AS cluster_id, COUNT(*) AS size
    FROM comp GROUP BY component
    ORDER BY size DESC, cluster_id
    """,
)
def graph_cc_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components by alternating large-star / small-star edge
    rewriting (Kiveris et al., SoCC'14) on the same near-dup graph as
    ``dedup_cluster_components`` — O(log n) rounds instead of
    O(diameter), the variant that survives path-shaped components at
    100 TB. Same output contract and the same recursive-CTE oracle as
    the propagation variant, so the two algorithms cross-check each
    other through the driver gate."""
    from .streaming.stateful import _scoped_shuffle_partitions

    docs = _t(spark, sf_dir, "documents")
    pairs = dedup_mod.ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.2, block_col="lang"
    )
    with _scoped_shuffle_partitions(spark, 32):
        comp = graph_mod.connected_components_two_phase(pairs, "id_a", "id_b")
        comp = comp.localCheckpoint(eager=True)
    return (
        comp.groupBy("component")
        .agg(F.count(F.lit(1)).alias("size"))
        .select(F.col("component").alias("cluster_id"), "size")
        .orderBy(F.col("size").desc(), "cluster_id")
    )


@register(
    "similarity_ivfpq_search",
    oracle="""
    WITH q AS (
      SELECT vec_id,
             [GREATEST(CAST(ROUND(CAST(x AS DOUBLE) * 64, 0) AS INT) + 128, 0)
              FOR x IN embedding] AS qv
      FROM embeddings),
    dims AS (
      SELECT vec_id, pos0 // 8 AS sub, pos0 % 8 AS dpos, val
      FROM (SELECT vec_id, unnest(qv) AS val,
                   unnest(range(0, len(qv))) AS pos0 FROM q)),
    coarse AS (
      SELECT vec_id AS ccid, sub, dpos, val AS ccval
      FROM dims WHERE vec_id < 8),
    cd AS (
      SELECT d.vec_id, c.ccid,
             SUM((d.val - c.ccval) * (d.val - c.ccval)) AS dist
      FROM dims d JOIN coarse c ON c.sub = d.sub AND c.dpos = d.dpos
      GROUP BY d.vec_id, c.ccid),
    assign AS (
      SELECT vec_id, ccid AS list_id FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                     ORDER BY dist, ccid) AS rn
        FROM cd) WHERE rn = 1),
    probes AS (SELECT vec_id AS pid FROM q WHERE vec_id < 3),
    probe_lists AS (
      SELECT pid, ccid AS list_id FROM (
        SELECT p.pid, cd.ccid,
               ROW_NUMBER() OVER (PARTITION BY p.pid
                                  ORDER BY cd.dist, cd.ccid) AS rn
        FROM probes p JOIN cd ON cd.vec_id = p.pid) WHERE rn <= 2),
    cand AS (
      SELECT pl.pid, a.vec_id AS xid
      FROM probe_lists pl JOIN assign a ON a.list_id = pl.list_id
      WHERE a.vec_id <> pl.pid),
    subcents AS (
      SELECT vec_id AS cid, sub, dpos, val AS scval
      FROM dims WHERE vec_id < 16),
    code_d AS (
      SELECT d.vec_id, d.sub, s.cid,
             SUM((d.val - s.scval) * (d.val - s.scval)) AS dist
      FROM dims d JOIN subcents s ON s.sub = d.sub AND s.dpos = d.dpos
      GROUP BY d.vec_id, d.sub, s.cid),
    codes AS (
      SELECT vec_id, sub, cid FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                                     ORDER BY dist, cid) AS rn
        FROM code_d) WHERE rn = 1),
    adc AS (
      SELECT c.pid, c.xid, SUM(cd2.dist) AS adist
      FROM cand c
      JOIN codes k ON k.vec_id = c.xid
      JOIN code_d cd2 ON cd2.vec_id = c.pid AND cd2.sub = k.sub
                     AND cd2.cid = k.cid
      GROUP BY c.pid, c.xid),
    adc_top AS (
      SELECT pid, xid FROM (
        SELECT pid, xid,
               ROW_NUMBER() OVER (PARTITION BY pid
                                  ORDER BY adist, xid) AS rn
        FROM adc) WHERE rn <= 20),
    exact AS (
      SELECT t.pid, t.xid,
             SUM((dx.val - dp.val) * (dx.val - dp.val)) AS edist
      FROM adc_top t
      JOIN dims dp ON dp.vec_id = t.pid
      JOIN dims dx ON dx.vec_id = t.xid AND dx.sub = dp.sub
                  AND dx.dpos = dp.dpos
      GROUP BY t.pid, t.xid)
    SELECT pid AS probe_id, xid AS neighbor_id, CAST(rn AS INT) AS rank,
           CAST(edist AS BIGINT) AS l2_sq
    FROM (SELECT pid, xid, edist,
                 ROW_NUMBER() OVER (PARTITION BY pid
                                    ORDER BY edist, xid) AS rn
          FROM exact)
    WHERE rn <= 10
    ORDER BY probe_id, rank
    """,
)
def similarity_ivfpq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPOSED production ANN path (FAISS IVF+PQ shape): a coarse
    quantizer restricts each probe to its nprobe=2 nearest inverted
    lists, PQ asymmetric-distance lookup tables rank the surviving
    candidates, and the ADC top-20 is re-ranked by exact quantized L2
    to the final top-10 — candidate pruning, compressed scoring, and
    exact re-rank verified end-to-end in integer arithmetic.

    Plan at scale: the coarse assignment is a broadcast of 8 centroid
    rows against the corpus (one pass), candidate generation is an
    equi-join on list_id (no all-pairs stage), the ADC join touches
    only candidates x 8 sub-codes with a broadcastable probe LUT, and
    the exact re-rank touches 20 rows per probe."""
    emb = _t(spark, sf_dir, "embeddings")
    qz = sim_mod.quantize_for_kmeans(emb, "vec_id", "embedding")
    dims = qz.select(
        "vec_id", F.posexplode("qv").alias("pos0", "val")
    ).select(
        "vec_id",
        (F.col("pos0") / 8).cast("int").alias("sub"),
        (F.col("pos0") % 8).alias("dpos"),
        "val",
    )
    dims = op_cache.track(dims.cache())
    coarse = dims.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("ccid"), "sub", "dpos", F.col("val").alias("ccval")
    )
    cd = (
        dims.join(F.broadcast(coarse), ["sub", "dpos"])
        .groupBy("vec_id", "ccid")
        .agg(
            F.sum(
                (F.col("val") - F.col("ccval")) * (F.col("val") - F.col("ccval"))
            ).alias("dist")
        )
    )
    cd = op_cache.track(cd.cache())
    w_assign = Window.partitionBy("vec_id").orderBy("dist", "ccid")
    assign = (
        cd.withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("vec_id", F.col("ccid").alias("list_id"))
    )
    w_probe = Window.partitionBy("pid").orderBy("dist", "ccid")
    probe_lists = (
        cd.filter(F.col("vec_id") < 3)
        .select(F.col("vec_id").alias("pid"), "ccid", "dist")
        .withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= 2)
        .select("pid", F.col("ccid").alias("list_id"))
    )
    cand = (
        assign.join(F.broadcast(probe_lists), "list_id")
        .filter(F.col("vec_id") != F.col("pid"))
        .select("pid", F.col("vec_id").alias("xid"))
    )
    subcents = dims.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("cid"), "sub", "dpos", F.col("val").alias("scval")
    )
    code_d = (
        dims.join(F.broadcast(subcents), ["sub", "dpos"])
        .groupBy("vec_id", "sub", "cid")
        .agg(
            F.sum(
                (F.col("val") - F.col("scval")) * (F.col("val") - F.col("scval"))
            ).alias("dist")
        )
    )
    code_d = op_cache.track(code_d.cache())
    w_code = Window.partitionBy("vec_id", "sub").orderBy("dist", "cid")
    codes = (
        code_d.withColumn("rn", F.row_number().over(w_code))
        .filter(F.col("rn") == 1)
        .select("vec_id", "sub", "cid")
    )
    probe_lut = code_d.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("pid"), "sub", "cid", F.col("dist").alias("ldist")
    )
    adc = (
        cand.join(codes, cand.xid == codes.vec_id)
        .join(F.broadcast(probe_lut), ["pid", "sub", "cid"])
        .groupBy("pid", "xid")
        .agg(F.sum("ldist").alias("adist"))
    )
    w_adc = Window.partitionBy("pid").orderBy("adist", "xid")
    adc_top = (
        adc.withColumn("rn", F.row_number().over(w_adc))
        .filter(F.col("rn") <= 20)
        .select("pid", "xid")
    )
    dp = dims.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("pid"), "sub", "dpos", F.col("val").alias("pval")
    )
    exact = (
        # adc_top is <= 20 rows per probe — broadcast it against the
        # corpus-scale dims scan rather than shuffling dims
        dims.join(F.broadcast(adc_top), dims.vec_id == adc_top.xid)
        .join(F.broadcast(dp), ["pid", "sub", "dpos"])
        .groupBy("pid", "xid")
        .agg(
            F.sum(
                (F.col("val") - F.col("pval")) * (F.col("val") - F.col("pval"))
            ).alias("edist")
        )
    )
    w_final = Window.partitionBy("pid").orderBy("edist", "xid")
    return (
        exact.withColumn("rn", F.row_number().over(w_final))
        .filter(F.col("rn") <= 10)
        .select(
            F.col("pid").alias("probe_id"),
            F.col("xid").alias("neighbor_id"),
            F.col("rn").cast("int").alias("rank"),
            F.col("edist").cast("bigint").alias("l2_sq"),
        )
        .orderBy("probe_id", "rank")
    )


@register(
    "streaming_stream_stream_full_outer",
    oracle="""
    WITH m AS (
      SELECT p.user_id, p.event_id AS purchase_id, c.event_id AS click_id
      FROM events p JOIN events c
        ON p.event_type = 'purchase' AND c.event_type = 'click'
       AND c.user_id = p.user_id
       AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts),
    wm AS (
      SELECT LEAST((SELECT MAX(ts) FROM events WHERE event_type = 'purchase'),
                   (SELECT MAX(ts) FROM events WHERE event_type = 'click'))
             - INTERVAL 2 HOUR AS w),
    up AS (
      SELECT p.user_id, p.event_id AS purchase_id,
             CAST(NULL AS BIGINT) AS click_id
      FROM events p, wm
      WHERE p.event_type = 'purchase' AND p.ts < wm.w
        AND NOT EXISTS (SELECT 1 FROM m WHERE m.purchase_id = p.event_id)),
    uc AS (
      SELECT c.user_id, CAST(NULL AS BIGINT) AS purchase_id,
             c.event_id AS click_id
      FROM events c, wm
      WHERE c.event_type = 'click' AND c.ts + INTERVAL 1 HOUR < wm.w
        AND NOT EXISTS (SELECT 1 FROM m WHERE m.click_id = c.event_id))
    SELECT * FROM (SELECT * FROM m UNION ALL SELECT * FROM up
                   UNION ALL SELECT * FROM uc)
    ORDER BY user_id, purchase_id, click_id
    """,
)
def streaming_stream_stream_full_outer(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Watermarked stream-stream FULL OUTER join, drained availableNow —
    completes the inner/left/full join-mode matrix. Matched pairs equal
    the batch range join; an unmatched purchase closes when the final
    watermark passes its event time; an unmatched click closes when the
    watermark passes click_ts + max_lag (the latest purchase that could
    still match it). Both closure conditions are reproduced exactly in
    the oracle's watermark arithmetic."""
    import os as _os

    from .streaming.incremental import stream_stream_full_outer_join

    out = stream_stream_full_outer_join(
        spark, _os.path.join(sf_dir, "events.parquet")
    )
    return out.orderBy("user_id", "purchase_id", "click_id")


@register(
    "orders_seasonal_decomposition",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2)
                  AS DECIMAL(18,2)) AS rev
      FROM orders GROUP BY 1),
    win AS (
      SELECT d, rev,
             SUM(rev) OVER (ORDER BY d
                            ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS s7,
             COUNT(*) OVER (ORDER BY d
                            ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS c7
      FROM daily),
    detr AS (
      SELECT d, isodow(d) - 1 AS dow, 7 * rev - s7 AS detr7
      FROM win WHERE c7 = 7),
    grp AS (
      SELECT d, dow, detr7,
             SUM(detr7) OVER (PARTITION BY dow) AS ssum,
             COUNT(*) OVER (PARTITION BY dow) AS n
      FROM detr)
    SELECT CAST(dow AS INT) AS weekday,
           CAST(MAX(n) AS BIGINT) AS n_days,
           ROUND(CAST(MAX(ssum) AS DOUBLE) / (7 * MAX(n)), 4) AS seasonal,
           ROUND(CAST(SUM(ABS(n * detr7 - ssum)) AS DOUBLE)
                 / (7.0 * MAX(n) * MAX(n)), 4) AS mad_resid
    FROM grp GROUP BY dow ORDER BY weekday
    """,
)
def orders_seasonal_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical seasonal decomposition of the daily revenue series:
    centered 7-observation moving-average trend, day-of-week seasonal
    component from the detrended series, and the mean absolute residual
    per weekday (how much weekly seasonality fails to explain). All
    intermediate arithmetic is DECIMAL scaled by 7 (detr7 = 7*rev - sum7
    is 7x the detrended value, n*detr7 - ssum is 7n x the residual) so
    no division happens until the final rounded doubles — bit-exact in
    both engines. One scan, two windows, one aggregate."""
    o = _t(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2)
            .cast("decimal(18,2)")
            .alias("rev")
        )
    )
    w7 = Window.orderBy("d").rowsBetween(-3, 3)
    win = daily.select(
        "d",
        "rev",
        F.sum("rev").over(w7).alias("s7"),
        F.count(F.lit(1)).over(w7).alias("c7"),
    )
    detr = win.filter(F.col("c7") == 7).select(
        "d",
        F.weekday("d").alias("dow"),
        (F.lit(7) * F.col("rev") - F.col("s7")).alias("detr7"),
    )
    wd = Window.partitionBy("dow")
    grp = detr.select(
        "dow",
        "detr7",
        F.sum("detr7").over(wd).alias("ssum"),
        F.count(F.lit(1)).over(wd).alias("n"),
    )
    return (
        grp.groupBy("dow")
        .agg(
            F.max("n").alias("mn"),
            F.max("ssum").alias("mssum"),
            F.sum(F.abs(F.col("n") * F.col("detr7") - F.col("ssum"))).alias(
                "sabs"
            ),
        )
        .select(
            F.col("dow").cast("int").alias("weekday"),
            F.col("mn").cast("bigint").alias("n_days"),
            F.round(
                F.col("mssum").cast("double") / (F.lit(7) * F.col("mn")), 4
            ).alias("seasonal"),
            F.round(
                F.col("sabs").cast("double")
                / (F.lit(7.0) * F.col("mn") * F.col("mn")),
                4,
            ).alias("mad_resid"),
        )
        .orderBy("weekday")
    )


@register(
    "union_by_name_breadth",
    oracle="""
    WITH u AS (
      SELECT * FROM (
        SELECT o_orderkey AS k, 'orders' AS src,
               CAST(o_totalprice AS DECIMAL(18,2)) AS amount,
               o_orderpriority AS priority
        FROM orders
        UNION ALL BY NAME
        SELECT l_orderkey AS k,
               CAST(l_extendedprice AS DECIMAL(18,2)) AS amount,
               'lineitem' AS src,
               CAST(l_quantity AS BIGINT) AS qty
        FROM lineitem))
    SELECT src,
           COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN priority IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_null_priority,
           CAST(SUM(CASE WHEN qty IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_null_qty,
           CAST(ROUND(SUM(amount), 2) AS DOUBLE) AS total_amount
    FROM u GROUP BY src ORDER BY src
    """,
)
def union_by_name_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union: two relations with different column ORDER
    and different column SETS combined by column NAME (Spark
    ``unionByName(allowMissingColumns=True)``; DuckDB ``UNION ALL BY
    NAME``), missing columns null-padded — the operator that survives a
    source adding a field mid-crawl. The aggregate proves position-based
    union would have been wrong (src/amount are swapped between the two
    branches) and counts the padding nulls on each side."""
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.lit("orders").alias("src"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("amount"),
        F.col("o_orderpriority").alias("priority"),
    )
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k"),
        F.col("l_extendedprice").cast("decimal(18,2)").alias("amount"),
        F.lit("lineitem").alias("src"),
        F.col("l_quantity").cast("bigint").alias("qty"),
    )
    u = o.unionByName(li, allowMissingColumns=True)
    return (
        u.groupBy("src")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(F.col("priority").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_null_priority"),
            F.sum(F.when(F.col("qty").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_null_qty"),
            F.round(F.sum("amount"), 2).cast("double").alias("total_amount"),
        )
        .orderBy("src")
    )


_VALUES_DIM_SQL = """
    WITH dim(priority, tier) AS (VALUES
      ('1-URGENT', 'hot'), ('2-HIGH', 'hot'), ('3-MEDIUM', 'warm'),
      ('4-NOT SPECIFIED', 'cold'), ('5-LOW', 'cold'))
    SELECT COALESCE(dim.tier, 'unknown') AS tier,
           COUNT(*) AS n_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS total_revenue
    FROM orders LEFT JOIN dim ON o_orderpriority = dim.priority
    GROUP BY COALESCE(dim.tier, 'unknown')
    ORDER BY tier
    """


@register("values_inline_dim_join", oracle=_VALUES_DIM_SQL)
def values_inline_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inline VALUES dimension table (the literal-CTE lookup every ad-hoc
    analysis starts with) left-joined to the fact — ONE SQL string runs
    unchanged on both engines, including the CTE column-alias form
    ``dim(priority, tier) AS (VALUES ...)``. Catalyst folds the 5-row
    VALUES relation into a broadcast hash join build side."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_VALUES_DIM_SQL)


@register(
    "execute_immediate_param",
    oracle="""
    SELECT o_orderpriority AS priority, COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS total
    FROM orders WHERE o_totalprice > 400000
    GROUP BY o_orderpriority ORDER BY priority
    """,
)
def execute_immediate_param(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized dynamic SQL through Spark 4's EXECUTE IMMEDIATE ...
    USING — the SQL-injection-safe templating surface (parameter markers
    bind server-side; no string splicing). The oracle is the statically
    bound equivalent, so the binding itself is what's verified."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """EXECUTE IMMEDIATE
           'SELECT o_orderpriority AS priority, COUNT(*) AS n,
                   CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2)
                        AS DOUBLE) AS total
            FROM orders WHERE o_totalprice > ?
            GROUP BY o_orderpriority ORDER BY priority'
           USING 400000"""
    )


@register(
    "preference_pair_construction",
    oracle="""
    WITH scored AS (
      SELECT doc_id, lang, source,
             (len(list_distinct(words)) * 1000000) // len(words) AS score
      FROM (SELECT doc_id, lang, source,
                   string_split_regex(regexp_replace(lower(trim(text)),
                                                     '\\s+', ' ', 'g'),
                                      ' ') AS words
            FROM documents)
      WHERE len(words) >= 1),
    ranked AS (
      SELECT *,
             ROW_NUMBER() OVER (PARTITION BY lang, source
                                ORDER BY score DESC, doc_id) AS rn_best,
             ROW_NUMBER() OVER (PARTITION BY lang, source
                                ORDER BY score ASC, doc_id) AS rn_worst,
             COUNT(*) OVER (PARTITION BY lang, source) AS n_grp
      FROM scored)
    SELECT b.lang AS lang, b.source AS source,
           b.doc_id AS chosen_doc, w.doc_id AS rejected_doc,
           CAST(b.score AS BIGINT) AS chosen_score,
           CAST(w.score AS BIGINT) AS rejected_score,
           CAST(b.score - w.score AS BIGINT) AS margin
    FROM ranked b JOIN ranked w
      ON b.lang = w.lang AND b.source = w.source
     AND b.rn_best = 1 AND w.rn_worst = 1
    WHERE b.n_grp >= 2 AND b.doc_id <> w.doc_id
    ORDER BY lang, source
    """,
)
def preference_pair_construction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preference-pair assembly for reward-model / DPO-style training:
    within each (lang, source) bucket the highest- and lowest-quality
    documents (quality = integer-scaled distinct-word ratio, exact in
    both engines) become the (chosen, rejected) pair with its score
    margin. Buckets with fewer than 2 docs are skipped. Two ranking
    windows over one scored scan; at 100 TB the bucket key is the
    partition key and each window is a per-bucket top-1."""
    docs = _t(spark, sf_dir, "documents")
    scored = (
        docs.select(
            "doc_id",
            "lang",
            "source",
            F.split(
                F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "), " "
            ).alias("words"),
        )
        .filter(F.size("words") >= 1)
        .select(
            "doc_id",
            "lang",
            "source",
            F.expr(
                "CAST(size(array_distinct(words)) * 1000000 AS BIGINT) div size(words)"
            ).alias("score"),
        )
    )
    wb = Window.partitionBy("lang", "source").orderBy(
        F.col("score").desc(), "doc_id"
    )
    ww = Window.partitionBy("lang", "source").orderBy(
        F.col("score").asc(), "doc_id"
    )
    wg = Window.partitionBy("lang", "source")
    ranked = scored.select(
        "*",
        F.row_number().over(wb).alias("rn_best"),
        F.row_number().over(ww).alias("rn_worst"),
        F.count(F.lit(1)).over(wg).alias("n_grp"),
    )
    b = ranked.filter((F.col("rn_best") == 1) & (F.col("n_grp") >= 2)).select(
        "lang",
        "source",
        F.col("doc_id").alias("chosen_doc"),
        F.col("score").alias("chosen_score"),
    )
    w = ranked.filter(F.col("rn_worst") == 1).select(
        F.col("lang").alias("wl"),
        F.col("source").alias("ws"),
        F.col("doc_id").alias("rejected_doc"),
        F.col("score").alias("rejected_score"),
    )
    return (
        b.join(
            w,
            (F.col("lang") == F.col("wl")) & (F.col("source") == F.col("ws")),
        )
        .filter(F.col("chosen_doc") != F.col("rejected_doc"))
        .select(
            "lang",
            "source",
            "chosen_doc",
            "rejected_doc",
            F.col("chosen_score").cast("bigint").alias("chosen_score"),
            F.col("rejected_score").cast("bigint").alias("rejected_score"),
            (F.col("chosen_score") - F.col("rejected_score"))
            .cast("bigint")
            .alias("margin"),
        )
        .orderBy("lang", "source")
    )


@register(
    "length_grouped_batches",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             len(string_split_regex(regexp_replace(lower(trim(text)),
                                                   '\\s+', ' ', 'g'),
                                    ' ')) AS n_tok
      FROM documents),
    sorted_b AS (
      SELECT doc_id, n_tok,
             (ROW_NUMBER() OVER (ORDER BY n_tok DESC, doc_id) - 1) // 32
               AS batch_id
      FROM toks),
    byid_b AS (
      SELECT doc_id, n_tok,
             (ROW_NUMBER() OVER (ORDER BY doc_id) - 1) // 32 AS batch_id
      FROM toks),
    s AS (
      SELECT batch_id, COUNT(*) AS n_docs, MAX(n_tok) AS max_sorted,
             CAST(COUNT(*) * MAX(n_tok) - SUM(n_tok) AS BIGINT)
               AS waste_sorted
      FROM sorted_b GROUP BY batch_id),
    i AS (
      SELECT batch_id, MAX(n_tok) AS max_byid,
             CAST(COUNT(*) * MAX(n_tok) - SUM(n_tok) AS BIGINT) AS waste_byid
      FROM byid_b GROUP BY batch_id)
    SELECT s.batch_id, s.n_docs,
           CAST(s.max_sorted AS BIGINT) AS max_sorted, s.waste_sorted,
           CAST(i.max_byid AS BIGINT) AS max_byid, i.waste_byid
    FROM s JOIN i ON s.batch_id = i.batch_id
    ORDER BY s.batch_id
    """,
)
def length_grouped_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-grouped batching (the dynamic-padding trick every training
    loader uses): documents sorted by token count form batches of 32,
    and per-batch padding waste (n*max - sum of lengths) is compared
    against naive arrival-order batching — the measured win of sorting.
    All integers. At 100 TB the global sort is one range exchange; the
    naive side exists only for the comparison and would be dropped in
    production."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.size(
            F.split(
                F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "), " "
            )
        ).alias("n_tok"),
    )
    ws = Window.orderBy(F.col("n_tok").desc(), "doc_id")
    wi = Window.orderBy("doc_id")
    sorted_b = toks.select(
        "n_tok",
        ((F.row_number().over(ws) - 1) / 32).cast("bigint").alias("batch_id"),
    )
    byid_b = toks.select(
        "n_tok",
        ((F.row_number().over(wi) - 1) / 32).cast("bigint").alias("batch_id"),
    )
    s = sorted_b.groupBy("batch_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.max("n_tok").cast("bigint").alias("max_sorted"),
        (F.count(F.lit(1)) * F.max("n_tok") - F.sum("n_tok"))
        .cast("bigint")
        .alias("waste_sorted"),
    )
    i = byid_b.groupBy("batch_id").agg(
        F.max("n_tok").cast("bigint").alias("max_byid"),
        (F.count(F.lit(1)) * F.max("n_tok") - F.sum("n_tok"))
        .cast("bigint")
        .alias("waste_byid"),
    )
    return s.join(i, "batch_id").orderBy("batch_id")


@register(
    "streaming_restart_state_recovery",
    oracle="""
    WITH cnt AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
             event_type, COUNT(*) AS n
      FROM events GROUP BY 1, 2),
    sides AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
             event_type,
             MAX(CASE WHEN ts < TIMESTAMP '2024-01-15 12:00:00'
                      THEN 1 ELSE 0 END) AS has_a,
             MAX(CASE WHEN ts >= TIMESTAMP '2024-01-15 12:00:00'
                      THEN 1 ELSE 0 END) AS has_b
      FROM events GROUP BY 1, 2)
    SELECT c.window_start, c.event_type, c.n,
           CAST(s.has_a + s.has_b AS INT) AS n_updates
    FROM cnt c JOIN sides s
      ON s.window_start = c.window_start AND s.event_type = c.event_type
    ORDER BY c.window_start, c.event_type
    """,
)
def streaming_restart_state_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checkpoint restart with state recovery — the contract that makes
    incremental-batch streaming deployable: drain pre-cut events, STOP,
    add the post-cut file, start a NEW query on the SAME checkpoint. The
    offset log skips already-read files and the state store carries the
    first run's window counts, so straddling windows update to the
    combined count (n_updates = 2) and every final count equals the
    one-shot batch answer. The oracle derives both from the raw events."""
    import os as _os

    from .streaming.incremental import restart_state_recovery

    out = restart_state_recovery(
        spark, _os.path.join(sf_dir, "events.parquet")
    )
    return out.orderBy("window_start", "event_type")


@register(
    "multimodal_video_scene_cuts",
    oracle="""
    WITH v AS (
      SELECT doc_id AS media_id, text,
             ((doc_id % 5) + 1) * 3 AS n_frames, len(text) AS nb
      FROM documents WHERE doc_id % 3 = 0 AND len(text) > 0),
    f AS (
      SELECT media_id, n_frames, CAST(t.i AS INT) AS i,
             ascii(substr(text, CAST((t.i * 7) % nb AS INT) + 1, 1)) AS luma
      FROM v, UNNEST(range(0, n_frames)) AS t(i)),
    d AS (
      SELECT media_id, n_frames, i, luma,
             LAG(luma) OVER (PARTITION BY media_id ORDER BY i) AS prev
      FROM f)
    SELECT media_id,
           CAST(MAX(n_frames) AS BIGINT) AS n_frames,
           CAST(SUM(CASE WHEN prev IS NOT NULL AND ABS(luma - prev) > 10
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_cuts,
           CAST(MIN(CASE WHEN prev IS NOT NULL AND ABS(luma - prev) > 10
                         THEN i * 1000 END) AS BIGINT) AS first_cut_ts
    FROM d GROUP BY media_id ORDER BY media_id
    """,
)
def multimodal_video_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video scene-change detection closing the multimodal analysis loop:
    sampled frames -> per-frame luminance -> cut where consecutive lumas
    jump past the threshold. The fake codec reads REAL payload bytes
    (luma = byte at (i*7) mod len), so the whole mapInPandas pipeline is
    value-checked — the oracle replays the byte reads with
    ascii(substr(...)) on the ASCII payloads."""
    media = _media_from_documents(spark, sf_dir, "video", "mp4", 3, 0)
    return mm_mod.video_scene_cuts(media, every_ms=1000, threshold=10).orderBy(
        "media_id"
    )


@register(
    "cogrouped_asof_user_merge",
    oracle="""
    WITH p AS (
      SELECT user_id, event_id AS purchase_id, ts
      FROM events WHERE event_type = 'purchase'),
    c AS (
      SELECT user_id, event_id AS click_id, ts
      FROM events WHERE event_type = 'click'),
    j AS (
      SELECT p.user_id, p.purchase_id, c.click_id,
             ROW_NUMBER() OVER (PARTITION BY p.purchase_id
                                ORDER BY c.ts DESC, c.click_id DESC) AS rn,
             COUNT(c.click_id) OVER (PARTITION BY p.purchase_id)
               AS n_prior
      FROM p LEFT JOIN c
        ON c.user_id = p.user_id AND c.ts <= p.ts)
    SELECT user_id, purchase_id, click_id AS last_click_id,
           CAST(n_prior AS BIGINT) AS n_prior_clicks
    FROM j WHERE rn = 1
    ORDER BY purchase_id
    """,
)
def cogrouped_asof_user_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cogrouped grouped-map surface (groupBy().cogroup()
    .applyInPandas) — the one Python-UDF shape the registry didn't yet
    pin: purchases and clicks shuffle on user_id ONCE each and align
    per key in pandas, where a vectorized searchsorted computes each
    purchase's most recent prior click and prior-click count. Same
    semantics as the pure-SQL as-of join, so the oracle doubles as a
    cross-check between the built-in and UDF paths."""
    from .operators.grouped import cogrouped_asof_merge

    ev = _t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), "ts"
    )
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), "ts"
    )
    return cogrouped_asof_merge(p, c).orderBy("purchase_id")


@register(
    "training_shard_manifest",
    oracle="""
    WITH t AS (
      SELECT doc_id, n_chars,
             len(string_split_regex(regexp_replace(lower(trim(text)),
                                                   '\\s+', ' ', 'g'), ' '))
               AS n_tok,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                  AS BIGINT) % 16 AS shard_id
      FROM documents)
    SELECT CAST(shard_id AS INT) AS shard_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_bytes,
           CAST(bit_xor(doc_id) AS BIGINT) AS xor_fingerprint,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc
    FROM t GROUP BY shard_id ORDER BY shard_id
    """,
)
def training_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shard manifest a pretraining writer materializes next to its
    output: docs hash-assigned to 16 shards (stable under reprocessing,
    no shuffle skew — md5 spreads any doc_id distribution), per-shard
    doc/token/byte totals for balance monitoring, and an order-free
    XOR fingerprint + id range for cheap shard-content verification
    after a rewrite. One hash-aggregate; at 100 TB shard count scales
    with the cluster and this query is the writer's audit artifact."""
    docs = _t(spark, sf_dir, "documents")
    shard = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("long") % 16
    )
    t = docs.select(
        F.col("doc_id"),
        F.col("n_chars"),
        F.size(
            F.split(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "), " ")
        ).alias("n_tok"),
        shard.cast("int").alias("shard_id"),
    )
    return (
        t.groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("total_tokens"),
            F.sum("n_chars").cast("bigint").alias("total_bytes"),
            F.bit_xor("doc_id").cast("bigint").alias("xor_fingerprint"),
            F.min("doc_id").cast("bigint").alias("min_doc"),
            F.max("doc_id").cast("bigint").alias("max_doc"),
        )
        .orderBy("shard_id")
    )


_FM_BIT = (
    "CASE WHEN (CAST('0x' || substr(md5('{t}' || ':' || CAST(id AS VARCHAR)), 1, 15) AS BIGINT) % 4294967296) = 0 "
    "THEN CAST(2147483648 AS BIGINT) "
    "ELSE (CAST('0x' || substr(md5('{t}' || ':' || CAST(id AS VARCHAR)), 1, 15) AS BIGINT) % 4294967296) "
    "& (-(CAST('0x' || substr(md5('{t}' || ':' || CAST(id AS VARCHAR)), 1, 15) AS BIGINT) % 4294967296)) END"
)


def _fm_oracle() -> str:
    bits = ",\n             ".join(
        _FM_BIT.format(t=t) + f" AS b{t}" for t in range(4)
    )

    def step(prev: str, cur: str) -> str:
        ors = ", ".join(
            f"(s.b{t} | COALESCE(n.b{t}, 0)) AS b{t}" for t in range(4)
        )
        aggs = ", ".join(f"bit_or({prev}.b{t}) AS b{t}" for t in range(4))
        return f"""{cur} AS (
      SELECT s.id, {ors}
      FROM {prev} s LEFT JOIN (
        SELECT und.u AS id, {aggs}
        FROM und JOIN {prev} ON {prev}.id = und.v
        GROUP BY und.u) n ON n.id = s.id)"""

    rv = " + ".join(f"((b{t} + 1) & (~b{t}))" for t in range(4))
    stats = "\n    UNION ALL ".join(
        f"SELECT {h} AS hop, COUNT(*) AS n_nodes, SUM({rv}) AS sum_r2 FROM s{h}"
        for h in range(4)
    )
    return f"""
    WITH so AS (SELECT DISTINCT l_suppkey AS s, l_orderkey AS o FROM lineitem),
    w AS (
      SELECT a.s AS u, b.s AS v, COUNT(*) AS c
      FROM so a JOIN so b ON a.o = b.o AND a.s < b.s
      GROUP BY a.s, b.s),
    sym AS (
      SELECT u AS x, v AS y, c FROM w
      UNION ALL SELECT v AS x, u AS y, c FROM w),
    sel AS (
      SELECT x, y FROM (
        SELECT x, y,
               ROW_NUMBER() OVER (PARTITION BY x ORDER BY c DESC, y) AS rn
        FROM sym)
      WHERE rn <= 3),
    e AS (
      SELECT DISTINCT least(x, y) AS u, greatest(x, y) AS v FROM sel),
    und AS (SELECT u, v FROM e UNION SELECT v, u FROM e),
    nodes AS (SELECT DISTINCT u AS id FROM und),
    s0 AS (
      SELECT id, {bits}
      FROM nodes),
    {step("s0", "s1")},
    {step("s1", "s2")},
    {step("s2", "s3")},
    stats AS (
    {stats})
    SELECT CAST(hop AS INT) AS hop, n_nodes,
           CAST(sum_r2 AS BIGINT) AS sum_r2,
           ROUND(CAST(sum_r2 AS DOUBLE) / (4 * CAST(0.77351 AS DOUBLE)), 4)
             AS est_total_reach
    FROM stats ORDER BY hop
    """


@register("graph_neighborhood_function_fm", oracle=_fm_oracle())
def graph_neighborhood_function_fm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANF/HyperANF approximate neighborhood function over the sparsified
    supplier co-order graph: Flajolet-Martin reachability sketches
    unioned via one BIT_OR shuffle per hop — the O(hops)-round scalable
    answer to 'how big is the h-neighborhood' that exact all-pairs BFS
    can't give at 100 TB. Every bitmap bit, union, and lowest-zero-bit
    statistic is integer arithmetic the oracle replays hop by hop."""
    li = _t(spark, sf_dir, "lineitem")
    so = li.select(
        F.col("l_suppkey").alias("s"), F.col("l_orderkey").alias("o")
    ).distinct()
    w = (
        so.alias("a")
        .join(
            so.alias("b"),
            (F.col("a.o") == F.col("b.o")) & (F.col("a.s") < F.col("b.s")),
        )
        .groupBy(F.col("a.s").alias("u"), F.col("b.s").alias("v"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    edges = graph_mod.top_k_cooccurrence_edges(w, k=3)
    return graph_mod.fm_neighborhood_function(
        edges, "u", "v", hops=3, n_hashes=4
    ).orderBy("hop")


def _bpe_train_oracle() -> str:
    """Three BPE training rounds in static SQL: each round's winning pair
    is a scalar subquery (argmax with count-desc, pair-asc tiebreak) and
    the merge is the same left-to-right list_reduce fold Spark runs."""

    def pair_cte(prev: str, p: str) -> str:
        return f"""{p} AS (
      SELECT syms[i] AS a, syms[i + 1] AS b, SUM(freq) AS n
      FROM (SELECT freq, string_split(acc, '|') AS syms FROM {prev}) t,
           UNNEST(range(1, len(syms))) AS u(i)
      GROUP BY syms[i], syms[i + 1])"""

    def merge_cte(prev: str, m: str, r: str) -> str:
        return f"""{r} AS (
      SELECT w, freq,
             list_reduce(string_split(acc, '|'),
               (acc2, s) -> CASE
                 WHEN (acc2 = {m}.a OR acc2 LIKE '%|' || {m}.a)
                      AND s = {m}.b
                 THEN substr(acc2, 1, length(acc2) - length({m}.a))
                      || {m}.a || {m}.b
                 ELSE acc2 || '|' || s END) AS acc
      FROM {prev}, {m})"""

    parts = [
        """vocab AS (
      SELECT w, COUNT(*) AS freq FROM (
        SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
        FROM documents) t
      WHERE len(w) >= 1 GROUP BY w)""",
        """r0 AS (
      SELECT w, freq,
             list_aggregate([w[i] FOR i IN range(1, len(w) + 1)],
                            'string_agg', '|') AS acc
      FROM vocab)""",
    ]
    outs = []
    for i in (1, 2, 3):
        prev = f"r{i - 1}"
        parts.append(pair_cte(prev, f"p{i}"))
        parts.append(
            f"m{i} AS (SELECT a, b, n FROM p{i} ORDER BY n DESC, a, b LIMIT 1)"
        )
        parts.append(merge_cte(prev, f"m{i}", f"r{i}"))
        parts.append(
            f"st{i} AS (SELECT SUM(freq * len(string_split(acc, '|'))) "
            f"AS tot FROM r{i})"
        )
        outs.append(
            f"SELECT {i} AS rnd, m.a AS sym_a, m.b AS sym_b, "
            f"m.a || m.b AS merged, CAST(m.n AS BIGINT) AS pair_count, "
            f"CAST(st.tot AS BIGINT) AS corpus_symbols_after "
            f"FROM m{i} m, st{i} st"
        )
    union = "\n      UNION ALL ".join(outs)
    ctes = ",\n    ".join(parts)
    return f"""
    WITH {ctes}
    SELECT CAST(rnd AS INT) AS round, sym_a, sym_b, merged, pair_count,
           corpus_symbols_after
    FROM ({union}) ORDER BY round
    """


@register("bpe_train_3rounds", oracle=_bpe_train_oracle())
def bpe_train_3rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BPE TRAINING loop itself, three full rounds: count adjacent
    symbol pairs over the weighted vocabulary, pick the argmax (ties
    break count-desc then pair-asc), apply the merge with the canonical
    left-to-right fold, recount. The driver sees exactly one argmax row
    per round (how real distributed BPE trainers work — the corpus-scale
    pair count is a hash aggregate, only the winner is collected); the
    fold runs as a higher-order aggregate expression, never a Python
    UDF. The oracle replays all three rounds with the same tiebreaks
    and the same fold semantics (verified identical left-to-right
    non-overlapping merge in both engines)."""
    docs = _t(spark, sf_dir, "documents")
    vocab = (
        docs.select(
            F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("w")
        )
        .filter(F.length("w") >= 1)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    state = vocab.select(
        "w", "freq", F.concat_ws("|", F.split("w", "")).alias("acc")
    )
    state = state.localCheckpoint(eager=True)
    rows = []
    for rnd in (1, 2, 3):
        pairs = (
            state.select("freq", F.split("acc", r"\|").alias("syms"))
            .filter(F.size("syms") >= 2)
            .select(
                "freq",
                F.explode(
                    F.expr(
                        "transform(sequence(0, size(syms) - 2), "
                        "i -> struct(syms[i] AS a, syms[i + 1] AS b))"
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("freq").alias("n"))
        )
        top = pairs.orderBy(F.desc("n"), "a", "b").limit(1).collect()[0]
        a, b, n = top["a"], top["b"], int(top["n"])
        fold = (
            "aggregate(slice(split(acc,'\\\\|'), 2, size(split(acc,'\\\\|')) - 1), "
            "element_at(split(acc,'\\\\|'), 1), "
            "(acc2, s) -> CASE "
            f"WHEN (acc2 = '{a}' OR acc2 like concat('%|', '{a}')) "
            f"AND s = '{b}' "
            f"THEN concat(substr(acc2, 1, length(acc2) - {len(a)}), '{a}{b}') "
            "ELSE concat(acc2, '|', s) END)"
        )
        state = state.select(
            "w", "freq", F.expr(fold).alias("acc")
        ).localCheckpoint(eager=True)
        tot = state.agg(
            F.sum(F.col("freq") * F.size(F.split("acc", r"\|"))).alias("t")
        ).collect()[0]["t"]
        rows.append((rnd, a, b, a + b, n, int(tot)))
    return spark.createDataFrame(
        rows,
        "round int, sym_a string, sym_b string, merged string, "
        "pair_count bigint, corpus_symbols_after bigint",
    ).orderBy("round")


@register(
    "map_hof_breadth",
    oracle="""
    WITH c AS (
      SELECT user_id, event_type, COUNT(*) AS n
      FROM events GROUP BY user_id, event_type),
    t AS (SELECT user_id, SUM(n) AS tot FROM c GROUP BY user_id)
    SELECT c.user_id, c.event_type, CAST(c.n AS BIGINT) AS n_total,
           CAST((c.n * 1000) // t.tot AS BIGINT) AS share_permille
    FROM c JOIN t ON t.user_id = c.user_id
    ORDER BY c.user_id, c.event_type
    """,
)
def map_hof_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map higher-order-function breadth — the MapType algebra DuckDB
    doesn't have natively, verified by exploding back to rows: per-user
    event-type count maps built for each half of the month
    (map_from_entries), merged with map_zip_with (null-padded sum over
    the key union), normalized with transform_values (integer per-mille
    against the map's aggregate total), then map_entries + explode. The
    oracle computes the same numbers relationally — pinning that the
    map-side algebra loses nothing."""
    ev = _t(spark, sf_dir, "events")
    halves = (
        ev.select(
            "user_id",
            "event_type",
            (F.col("ts") < F.lit("2024-01-16").cast("timestamp")).alias(
                "first_half"
            ),
        )
        .groupBy("user_id", "event_type", "first_half")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    maps = (
        halves.groupBy("user_id", "first_half")
        .agg(
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("event_type", "n")))
            ).alias("m")
        )
        .groupBy("user_id")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("first_half", "m"))
            ).alias("byhalf")
        )
        .select(
            "user_id",
            F.expr(
                "map_zip_with("
                "  coalesce(element_at(byhalf, true), map()),"
                "  coalesce(element_at(byhalf, false), map()),"
                "  (k, v1, v2) -> coalesce(v1, 0L) + coalesce(v2, 0L))"
            ).alias("m"),
        )
        .select(
            "user_id",
            "m",
            F.expr(
                "aggregate(map_values(m), 0L, (acc, v) -> acc + v)"
            ).alias("tot"),
        )
        .select(
            "user_id",
            F.expr(
                "transform_values(m, (k, v) -> struct(v AS n, "
                "(v * 1000) div tot AS pm))"
            ).alias("shares"),
        )
    )
    return (
        maps.select(
            "user_id",
            F.explode(F.expr("map_entries(shares)")).alias("e"),
        )
        .select(
            "user_id",
            F.col("e.key").alias("event_type"),
            F.col("e.value.n").cast("bigint").alias("n_total"),
            F.col("e.value.pm").cast("bigint").alias("share_permille"),
        )
        .orderBy("user_id", "event_type")
    )


@register(
    "window_median_trailing",
    oracle="""
    SELECT user_id, event_id,
           ROUND(MEDIAN(value) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6) AS med5
    FROM events
    ORDER BY user_id, event_id
    """,
)
def window_median_trailing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """An exact MOVING MEDIAN — the holistic aggregate over a sliding
    frame that DuckDB runs natively (MEDIAN ... OVER ROWS) but Spark
    refuses ([INVALID_WINDOW_SPEC_FOR_AGGREGATION_FUNC]); the engine
    supplies it by collecting the 5-row frame into a sorted array and
    selecting the middle element(s) — bounded state (frame width), and
    exact selection/two-element-average semantics identical to DuckDB's."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, 0)
    )
    arr = F.sort_array(F.collect_list("value").over(w))
    med = F.expr(
        "CASE WHEN size(arr) % 2 = 1 "
        "THEN element_at(arr, cast((size(arr) + 1) div 2 as int)) "
        "ELSE (element_at(arr, cast(size(arr) div 2 as int)) "
        "      + element_at(arr, cast(size(arr) div 2 + 1 as int))) / 2 END"
    )
    return (
        ev.select("user_id", "event_id", arr.alias("arr"))
        .select("user_id", "event_id", F.round(med, 6).alias("med5"))
        .orderBy("user_id", "event_id")
    )


@register(
    "spatial_grid_neighbor_join",
    oracle="""
    WITH pts AS (
      SELECT c_custkey AS id,
             CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || ':x'), 1, 15)
                  AS BIGINT) % 10000 AS x,
             CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || ':y'), 1, 15)
                  AS BIGINT) % 10000 AS y
      FROM customer),
    pairs AS (
      SELECT a.id AS id_a, b.id AS id_b,
             (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
      FROM pts a JOIN pts b ON a.id < b.id
      WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 22500)
    SELECT id_a, id_b, CAST(d2 AS BIGINT) AS d2
    FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY d2, id_a, id_b) AS rn
          FROM pairs)
    WHERE rn <= 20 ORDER BY d2, id_a, id_b
    """,
)
def spatial_grid_neighbor_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial radius join by GRID BLOCKING — the all-pairs killer for
    point data at scale: md5-derived integer coordinates bucket into
    radius-sized cells, each point probes its 3x3 cell neighborhood
    (equi-join on cell id, 9 candidate cells), and the exact integer
    L2 filter runs only on candidates. Cost is sum of cell-pair sizes,
    not n² — the same blocking idea as LSH buckets, in 2-D. The oracle
    brute-forces the same radius query (gate-sized input), so grid
    completeness — a neighbor can never be more than one cell away —
    is what's being verified."""
    cust = _t(spark, sf_dir, "customer")
    coord = (
        "CAST(conv(substr(md5(concat(cast(c_custkey as string), ':{ax}')), 1, 15), 16, 10) "
        "AS BIGINT) % 10000"
    )
    pts = cust.select(
        F.col("c_custkey").alias("id"),
        F.expr(coord.format(ax="x")).alias("x"),
        F.expr(coord.format(ax="y")).alias("y"),
    )
    pts = op_cache.track(pts.cache())
    cell = pts.select(
        "id", "x", "y",
        (F.col("x") / 150).cast("long").alias("cx"),
        (F.col("y") / 150).cast("long").alias("cy"),
    )
    probes = cell.select(
        F.col("id").alias("id_a"),
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
        F.explode(
            F.expr(
                "flatten(transform(array(-1, 0, 1), "
                "dx -> transform(array(-1, 0, 1), "
                "dy -> struct(cx + dx AS cx, cy + dy AS cy))))"
            )
        ).alias("c"),
    ).select("id_a", "xa", "ya", F.col("c.cx").alias("cx"), F.col("c.cy").alias("cy"))
    cand = probes.join(
        cell.select(
            F.col("id").alias("id_b"),
            F.col("x").alias("xb"),
            F.col("y").alias("yb"),
            "cx",
            "cy",
        ),
        ["cx", "cy"],
    ).filter(F.col("id_a") < F.col("id_b"))
    d2 = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    pairs = cand.select("id_a", "id_b", d2.alias("d2")).filter(
        F.col("d2") <= 22500
    )
    w = Window.orderBy("d2", "id_a", "id_b")
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select("id_a", "id_b", F.col("d2").cast("bigint").alias("d2"))
        .orderBy("d2", "id_a", "id_b")
    )


@register(
    "phrase_search_positional",
    oracle="""
    WITH pos AS (
      SELECT doc_id, CAST(u.i AS INT) AS p, words[u.i] AS w
      FROM (SELECT doc_id,
                   string_split_regex(regexp_replace(lower(trim(text)),
                                                     '\\s+', ' ', 'g'),
                                      ' ') AS words
            FROM documents) t,
           UNNEST(range(1, len(words) + 1)) AS u(i)),
    top2 AS (
      SELECT w, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, w) AS rk
      FROM pos GROUP BY w),
    w1 AS (SELECT w FROM top2 WHERE rk = 1),
    w2 AS (SELECT w FROM top2 WHERE rk = 2),
    occ AS (
      SELECT a.doc_id, COUNT(*) AS n_occ
      FROM pos a JOIN pos b
        ON b.doc_id = a.doc_id AND b.p = a.p + 1
      WHERE a.w = (SELECT w FROM w1) AND b.w = (SELECT w FROM w2)
      GROUP BY a.doc_id)
    SELECT doc_id, CAST(n_occ AS BIGINT) AS n_occ,
           (SELECT w FROM w1) AS term_1, (SELECT w FROM w2) AS term_2
    FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY n_occ DESC, doc_id) AS rn
          FROM occ)
    WHERE rn <= 20 ORDER BY n_occ DESC, doc_id
    """,
)
def phrase_search_positional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional-index phrase search (the IR operator BM25 can't do):
    (doc, position, term) postings self-joined on position adjacency
    find exact occurrences of the corpus's two most frequent words as a
    phrase. The phrase is data-derived (top-2 terms, deterministic
    tiebreak) so the query is non-trivially non-empty at every SF. At
    100 TB the postings join is an equi-join on (doc, position) after
    term-selective filters — the standard sharded positional-index
    probe."""
    docs = _t(spark, sf_dir, "documents")
    pos = docs.select(
        "doc_id",
        F.posexplode(
            F.split(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "), " ")
        ).alias("p0", "w"),
    ).select("doc_id", (F.col("p0") + 1).alias("p"), "w")
    pos = op_cache.track(pos.cache())
    top = (
        pos.groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "w")
        .limit(2)
        .collect()
    )
    w1, w2 = top[0]["w"], top[1]["w"]
    a = pos.filter(F.col("w") == w1).select("doc_id", "p")
    b = pos.filter(F.col("w") == w2).select(
        F.col("doc_id").alias("db"), F.col("p").alias("pb")
    )
    occ = (
        a.join(b, (F.col("db") == F.col("doc_id")) & (F.col("pb") == F.col("p") + 1))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_occ"))
    )
    w = Window.orderBy(F.desc("n_occ"), "doc_id")
    return (
        occ.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select(
            "doc_id",
            F.col("n_occ").cast("bigint").alias("n_occ"),
            F.lit(w1).alias("term_1"),
            F.lit(w2).alias("term_2"),
        )
        .orderBy(F.desc("n_occ"), "doc_id")
    )


@register(
    "markov_next_event_accuracy",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type, ts, event_id,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt,
             LEAD(ts) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS nxt_ts
      FROM events),
    train AS (
      SELECT event_type AS prev, nxt FROM seq
      WHERE nxt IS NOT NULL AND nxt_ts < TIMESTAMP '2024-01-16'),
    model AS (
      SELECT prev, nxt AS predicted FROM (
        SELECT prev, nxt, ROW_NUMBER() OVER (
          PARTITION BY prev ORDER BY COUNT(*) DESC, nxt) AS rk
        FROM train GROUP BY prev, nxt) WHERE rk = 1),
    test AS (
      SELECT event_type AS prev, nxt FROM seq
      WHERE nxt IS NOT NULL AND ts >= TIMESTAMP '2024-01-16'),
    scored AS (
      SELECT t.prev, t.nxt, m.predicted FROM test t
      LEFT JOIN model m ON m.prev = t.prev)
    SELECT prev AS prev_type,
           COUNT(*) AS n_transitions,
           CAST(SUM(CASE WHEN predicted IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_covered,
           CAST(SUM(CASE WHEN nxt = predicted THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct,
           ROUND(CAST(SUM(CASE WHEN nxt = predicted THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS accuracy
    FROM scored GROUP BY prev ORDER BY prev
    """,
)
def markov_next_event_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal-split model evaluation in one lazy plan: a first-order
    Markov next-event predictor trained on pre-cut transitions (argmax
    next type per previous type, deterministic tiebreak) and scored on
    post-cut transitions via broadcast of the 4-row model — the
    train/evaluate harness shape every behavioral model ships with.
    Transitions assign to train/test by the time of the TARGET event, so
    the split leaks nothing backward."""
    ev = _t(spark, sf_dir, "events")
    wseq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.lead("event_type").over(wseq).alias("nxt"),
        F.lead("ts").over(wseq).alias("nxt_ts"),
    ).filter(F.col("nxt").isNotNull())
    seq = op_cache.track(seq.cache())
    cut = F.lit("2024-01-16").cast("timestamp")
    train = seq.filter(F.col("nxt_ts") < cut).select(
        F.col("event_type").alias("prev"), "nxt"
    )
    wm = Window.partitionBy("prev").orderBy(F.desc("n"), "nxt")
    model = (
        train.groupBy("prev", "nxt")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("rk", F.row_number().over(wm))
        .filter(F.col("rk") == 1)
        .select(F.col("prev").alias("mprev"), F.col("nxt").alias("predicted"))
    )
    test = seq.filter(F.col("ts") >= cut).select(
        F.col("event_type").alias("prev"), "nxt"
    )
    scored = test.join(
        F.broadcast(model), test.prev == model.mprev, "left"
    )
    return (
        scored.groupBy(F.col("prev").alias("prev_type"))
        .agg(
            F.count(F.lit(1)).alias("n_transitions"),
            F.sum(F.when(F.col("predicted").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_covered"),
            F.sum(F.when(F.col("nxt") == F.col("predicted"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_correct"),
            F.round(
                F.sum(
                    F.when(F.col("nxt") == F.col("predicted"), 1).otherwise(0)
                ).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("accuracy"),
        )
        .orderBy("prev_type")
    )


@register(
    "entity_resolution_canonicalize",
    oracle="""
    WITH RECURSIVE
    pairs AS (
      SELECT a.p_partkey AS id_a, b.p_partkey AS id_b
      FROM part a JOIN part b
        ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
      WHERE levenshtein(a.p_name, b.p_name) BETWEEN 1 AND 2),
    edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    reach(id, r) AS (
      SELECT src, src FROM edges
      UNION
      SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src),
    comp AS (SELECT id, MIN(r) AS canonical_id FROM reach GROUP BY id),
    clusters AS (
      SELECT canonical_id, COUNT(*) AS n_members FROM comp
      GROUP BY canonical_id)
    SELECT c.canonical_id, c.n_members, p.p_name AS canonical_name
    FROM clusters c JOIN part p ON p.p_partkey = c.canonical_id
    ORDER BY c.n_members DESC, c.canonical_id
    LIMIT 20
    """,
)
def entity_resolution_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full entity-resolution pipeline: blocked fuzzy candidate pairs
    (brand block, Levenshtein <= 2) -> connected components -> one
    canonical record per entity cluster (min id, its name carried as the
    survivor). Composes the blocking join with the same CC machinery the
    dedup path uses — match, cluster, canonicalize is the ER end-game a
    master-data pipeline runs at 100 TB, and every stage here is
    value-checked through the recursive-closure oracle."""
    from .streaming.stateful import _scoped_shuffle_partitions

    part = _t(spark, sf_dir, "part")
    a = part.select(
        F.col("p_partkey").alias("id_a"),
        F.col("p_brand").alias("brand"),
        F.col("p_name").alias("name_a"),
    )
    b = part.select(
        F.col("p_partkey").alias("id_b"),
        F.col("p_brand").alias("brand"),
        F.col("p_name").alias("name_b"),
    )
    pairs = (
        a.join(b, "brand")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(F.levenshtein("name_a", "name_b").between(1, 2))
        .select("id_a", "id_b")
    )
    with _scoped_shuffle_partitions(spark, 32):
        comp = dedup_mod.connected_components(pairs, "id_a", "id_b")
        comp = comp.localCheckpoint(eager=True)
    clusters = comp.groupBy(F.col("component").alias("canonical_id")).agg(
        F.count(F.lit(1)).alias("n_members")
    )
    names = part.select(
        F.col("p_partkey").alias("canonical_id"),
        F.col("p_name").alias("canonical_name"),
    )
    return (
        clusters.join(names, "canonical_id")
        .select("canonical_id", "n_members", "canonical_name")
        .orderBy(F.desc("n_members"), "canonical_id")
        .limit(20)
    )


@register(
    "bm25_mrr_eval",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS t
      FROM documents WHERE trim(text) <> ''),
    dl AS (SELECT doc_id, CAST(COUNT(*) AS DOUBLE) AS dl
           FROM tok GROUP BY doc_id),
    stats AS (
      SELECT CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl,
             CAST(COUNT(*) AS BIGINT) AS n FROM dl),
    probes AS (SELECT DISTINCT doc_id AS qid FROM tok WHERE doc_id % 50 = 0),
    qterms AS (
      SELECT qid, t FROM (
        SELECT tok.doc_id AS qid, t,
               ROW_NUMBER() OVER (PARTITION BY tok.doc_id
                                  ORDER BY COUNT(*) DESC, t) AS rk
        FROM tok JOIN probes ON probes.qid = tok.doc_id
        GROUP BY tok.doc_id, t) WHERE rk <= 3),
    tfq AS (
      SELECT t, doc_id, CAST(COUNT(*) AS DOUBLE) AS tf FROM tok
      WHERE t IN (SELECT DISTINCT t FROM qterms) GROUP BY t, doc_id),
    dfreq AS (SELECT t, COUNT(*) AS df FROM tfq GROUP BY t),
    idf AS (
      SELECT t, ROUND(ln((CAST((SELECT n FROM stats) AS DOUBLE) -
                          CAST(df AS DOUBLE) + CAST(0.5 AS DOUBLE)) /
                         (CAST(df AS DOUBLE) + CAST(0.5 AS DOUBLE)) +
                         CAST(1 AS DOUBLE)), 6) AS idf
      FROM dfreq),
    terms_scored AS (
      SELECT q.qid, f.doc_id, f.t,
             i.idf * (f.tf * CAST(2.2 AS DOUBLE)) /
               (f.tf + CAST(1.2 AS DOUBLE) *
                (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) *
                 d.dl / (SELECT avgdl FROM stats))) AS s
      FROM qterms q
      JOIN tfq f ON f.t = q.t
      JOIN dl d ON d.doc_id = f.doc_id
      JOIN idf i ON i.t = q.t),
    scored AS (
      SELECT qid, doc_id,
             list_reduce(list(s ORDER BY t), (a, b) -> a + b) AS score
      FROM terms_scored GROUP BY qid, doc_id),
    ranked AS (
      SELECT qid, doc_id,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY score DESC, doc_id) AS rnk
      FROM scored),
    hits AS (
      SELECT p.qid,
             MAX(CASE WHEN r.doc_id = p.qid AND r.rnk <= 10
                      THEN 2520 // r.rnk ELSE 0 END) AS rr2520
      FROM probes p LEFT JOIN ranked r ON r.qid = p.qid
      GROUP BY p.qid)
    SELECT COUNT(*) AS n_queries,
           CAST(SUM(CASE WHEN rr2520 > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_found_top10,
           CAST(SUM(rr2520) AS BIGINT) AS mrr_x2520,
           ROUND(CAST(SUM(rr2520) AS DOUBLE) /
                 (CAST(2520 AS DOUBLE) * COUNT(*)), 6) AS mrr_at10
    FROM hits
    """,
)
def bm25_mrr_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality evaluation harness: every 50th document becomes
    a query (its own top-3 terms), BM25 ranks the corpus per query
    through the inverted index, and MRR@10 measures whether the source
    document comes back — the pseudo-relevance self-retrieval check run
    before shipping any ranker change. Float traps handled exactly:
    per-document scores fold term-ascending (identical left-to-right
    sum both engines), and MRR accumulates as integer 2520/rank
    (lcm of 1..10) so the only float division happens once at the end.
    At 100 TB the probe set is a fixed sample and every join is
    term-selective postings — no all-pairs stage."""
    docs = _t(spark, sf_dir, "documents")
    tok = docs.filter(F.trim("text") != "").select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("t"),
    )
    tok = op_cache.track(tok.cache())
    dl = tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("double").alias("dl")
    )
    dl = op_cache.track(dl.cache())
    stats = dl.agg(
        (F.sum("dl") / F.count(F.lit(1))).alias("avgdl"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    ).collect()[0]
    avgdl, n_docs = float(stats["avgdl"]), int(stats["n"])
    probes = tok.filter(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("qid")
    ).distinct()
    wq = Window.partitionBy("qid").orderBy(F.desc("c"), "t")
    qterms = (
        tok.join(F.broadcast(probes), tok.doc_id == probes.qid)
        .groupBy("qid", "t")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("rk", F.row_number().over(wq))
        .filter(F.col("rk") <= 3)
        .select("qid", "t")
    )
    qterms = op_cache.track(qterms.cache())
    terms = qterms.select("t").distinct()
    tfq = (
        tok.join(F.broadcast(terms), "t")
        .groupBy("t", "doc_id")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    dfreq = tfq.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    idf = dfreq.select(
        "t",
        F.round(
            F.log(
                (F.lit(float(n_docs)) - F.col("df").cast("double") + F.lit(0.5))
                / (F.col("df").cast("double") + F.lit(0.5))
                + F.lit(1.0)
            ),
            6,
        ).alias("idf"),
    )
    ts = (
        qterms.join(tfq, "t")
        .join(F.broadcast(idf), "t")
        .join(dl, "doc_id")
        .select(
            "qid",
            "doc_id",
            "t",
            (
                F.col("idf")
                * (F.col("tf") * F.lit(2.2))
                / (
                    F.col("tf")
                    + F.lit(1.2)
                    * (F.lit(0.25) + F.lit(0.75) * F.col("dl") / F.lit(avgdl))
                )
            ).alias("s"),
        )
    )
    scored = (
        ts.groupBy("qid", "doc_id")
        .agg(
            F.expr(
                "aggregate(array_sort(collect_list(struct(t, s))), "
                "cast(0 as double), (acc, e) -> acc + e.s)"
            ).alias("score")
        )
    )
    wr = Window.partitionBy("qid").orderBy(F.desc("score"), "doc_id")
    ranked = scored.withColumn("rnk", F.row_number().over(wr))
    hits = (
        probes.join(ranked, "qid", "left")
        .groupBy("qid")
        .agg(
            F.max(
                F.when(
                    (F.col("doc_id") == F.col("qid")) & (F.col("rnk") <= 10),
                    (F.lit(2520) / F.col("rnk")).cast("long"),
                ).otherwise(0)
            ).alias("rr2520")
        )
    )
    return hits.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.sum(F.when(F.col("rr2520") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_found_top10"),
        F.sum("rr2520").cast("bigint").alias("mrr_x2520"),
        F.round(
            F.sum("rr2520").cast("double")
            / (F.lit(2520.0) * F.count(F.lit(1))),
            6,
        ).alias("mrr_at10"),
    )


@register(
    "crossval_fold_assignment",
    oracle="""
    WITH f AS (
      SELECT vec_id, label,
             CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR) || ':fold'), 1, 15)
                  AS BIGINT) % 5 AS fold_id
      FROM embeddings)
    SELECT CAST(fold_id AS INT) AS fold_id, label,
           COUNT(*) AS n,
           ROUND(CAST(COUNT(*) AS DOUBLE) /
                 SUM(COUNT(*)) OVER (PARTITION BY fold_id), 6) AS frac_in_fold
    FROM f GROUP BY fold_id, label
    ORDER BY fold_id, label
    """,
)
def crossval_fold_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 5-fold cross-validation assignment by salted md5 —
    reproducible across reruns and engines, no shuffle to assign — with
    the per-fold class-balance audit (label share within each fold) that
    decides whether plain hashing suffices or stratified folds are
    needed. Window-over-aggregate computes the within-fold shares in the
    same pass."""
    emb = _t(spark, sf_dir, "embeddings")
    fold = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("vec_id").cast("string"), F.lit(":fold"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % 5
    )
    wf = Window.partitionBy("fold_id")
    return (
        emb.select(fold.cast("int").alias("fold_id"), "label")
        .groupBy("fold_id", "label")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "fold_id",
            "label",
            "n",
            F.round(
                F.col("n").cast("double") / F.sum("n").over(wf), 6
            ).alias("frac_in_fold"),
        )
        .orderBy("fold_id", "label")
    )


@register(
    "dbscan_grid_clusters",
    oracle="""
    WITH RECURSIVE
    pts AS (
      SELECT c_custkey AS id,
             CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || ':x'), 1, 15)
                  AS BIGINT) % 2000 AS x,
             CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || ':y'), 1, 15)
                  AS BIGINT) % 2000 AS y
      FROM customer),
    nbr AS (
      SELECT a.id AS ia, b.id AS ib
      FROM pts a JOIN pts b ON a.id <> b.id
      WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 22500),
    deg AS (SELECT ia AS id, COUNT(*) AS n FROM nbr GROUP BY ia),
    core AS (SELECT id FROM deg WHERE n + 1 >= 4),
    cedge AS (
      SELECT n.ia, n.ib FROM nbr n
      JOIN core ca ON ca.id = n.ia JOIN core cb ON cb.id = n.ib),
    reach(id, r) AS (
      SELECT id, id FROM core
      UNION
      SELECT reach.id, e.ib FROM reach JOIN cedge e ON reach.r = e.ia),
    comp AS (SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id),
    border AS (
      SELECT n.ia AS id, MIN(c.cluster_id) AS cluster_id
      FROM nbr n
      JOIN comp c ON c.id = n.ib
      WHERE n.ia NOT IN (SELECT id FROM core)
      GROUP BY n.ia),
    counts AS (
      SELECT cluster_id,
             CAST(SUM(is_core) AS BIGINT) AS n_core,
             CAST(SUM(1 - is_core) AS BIGINT) AS n_border
      FROM (SELECT cluster_id, 1 AS is_core FROM comp
            UNION ALL SELECT cluster_id, 0 FROM border) u
      GROUP BY cluster_id)
    SELECT cluster_id, n_core, n_border FROM (
      SELECT *, ROW_NUMBER() OVER (
        ORDER BY n_core + n_border DESC, cluster_id) AS rn
      FROM counts)
    WHERE rn <= 20 ORDER BY n_core + n_border DESC, cluster_id
    """,
)
def dbscan_grid_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN density clustering, the distributed way: eps-sized grid
    cells block the neighbor search (3x3 probe join, exact integer L2 on
    candidates only), core points (>= minPts=4 in the closed eps-ball)
    link into clusters via connected components, border points attach to
    their minimum neighboring core cluster, everything else is noise.
    All-integer geometry makes every stage value-checkable; the oracle
    brute-forces the same definition. At scale: neighbor cost is sum of
    cell-pair sizes, CC is the O(log n) star machinery — no stage is
    quadratic in n."""
    from .streaming.stateful import _scoped_shuffle_partitions

    cust = _t(spark, sf_dir, "customer")
    coord = (
        "CAST(conv(substr(md5(concat(cast(c_custkey as string), ':{ax}')), 1, 15), 16, 10) "
        "AS BIGINT) % 2000"
    )
    pts = cust.select(
        F.col("c_custkey").alias("id"),
        F.expr(coord.format(ax="x")).alias("x"),
        F.expr(coord.format(ax="y")).alias("y"),
    )
    pts = op_cache.track(pts.cache())
    cell = pts.select(
        "id", "x", "y",
        (F.col("x") / 150).cast("long").alias("cx"),
        (F.col("y") / 150).cast("long").alias("cy"),
    )
    probes = cell.select(
        F.col("id").alias("ia"),
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
        F.explode(
            F.expr(
                "flatten(transform(array(-1, 0, 1), "
                "dx -> transform(array(-1, 0, 1), "
                "dy -> struct(cx + dx AS cx, cy + dy AS cy))))"
            )
        ).alias("c"),
    ).select("ia", "xa", "ya", F.col("c.cx").alias("cx"), F.col("c.cy").alias("cy"))
    d2 = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    nbr = (
        probes.join(
            cell.select(
                F.col("id").alias("ib"),
                F.col("x").alias("xb"),
                F.col("y").alias("yb"),
                "cx",
                "cy",
            ),
            ["cx", "cy"],
        )
        .filter(F.col("ia") != F.col("ib"))
        .filter(d2 <= 22500)
        .select("ia", "ib")
    )
    nbr = op_cache.track(nbr.cache())
    deg = nbr.groupBy(F.col("ia").alias("id")).agg(F.count(F.lit(1)).alias("n"))
    core = deg.filter(F.col("n") + 1 >= 4).select("id")
    core = op_cache.track(core.cache())
    cedge = (
        nbr.join(core.withColumnRenamed("id", "ia"), "ia")
        .join(core.withColumnRenamed("id", "ib"), "ib")
        .select("ia", "ib")
    )
    with _scoped_shuffle_partitions(spark, 32):
        comp = dedup_mod.connected_components(cedge, "ia", "ib", nodes=core)
        comp = comp.localCheckpoint(eager=True)
    comp = comp.select("id", F.col("component").alias("cluster_id"))
    border = (
        nbr.join(core.withColumnRenamed("id", "ia"), "ia", "left_anti")
        .join(comp.withColumnRenamed("id", "ib"), "ib")
        .groupBy(F.col("ia").alias("id"))
        .agg(F.min("cluster_id").alias("cluster_id"))
    )
    counts = (
        comp.select("cluster_id", F.lit(1).alias("is_core"))
        .unionByName(border.select("cluster_id", F.lit(0).alias("is_core")))
        .groupBy("cluster_id")
        .agg(
            F.sum("is_core").cast("bigint").alias("n_core"),
            F.sum(1 - F.col("is_core")).cast("bigint").alias("n_border"),
        )
    )
    w = Window.orderBy(
        F.desc(F.col("n_core") + F.col("n_border")), "cluster_id"
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select("cluster_id", "n_core", "n_border")
        .orderBy(F.desc(F.col("n_core") + F.col("n_border")), "cluster_id")
    )


@register(
    "asof_join_native_semantics",
    oracle="""
    WITH p AS (
      SELECT user_id, event_id AS purchase_id, ts
      FROM events WHERE event_type = 'purchase'),
    c AS (
      SELECT user_id, ts AS cts, MAX(event_id) AS click_id
      FROM events WHERE event_type = 'click'
      GROUP BY user_id, ts)
    SELECT p.user_id, p.purchase_id,
           c.click_id AS last_click_id, c.cts AS last_click_ts
    FROM p ASOF LEFT JOIN c
      ON p.user_id = c.user_id AND c.cts <= p.ts
    ORDER BY p.purchase_id
    """,
)
def asof_join_native_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's union-sort as-of join pinned against DuckDB's NATIVE
    ASOF LEFT JOIN — a cross-engine semantics check of the whole
    contract: inclusive boundary (a click exactly at purchase time
    matches), per-key isolation, and null for unpreceded rows. The right
    side is pre-deduped to one row per (user, ts) so the 'which tied
    row' question is closed before the join. The union-sort formulation
    is one shuffle on (key, time) — the merge-join shape, no windowed
    state per probe."""
    ev = _t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), "ts"
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", F.col("ts").alias("cts"))
        .agg(F.max("event_id").alias("click_id"))
    )
    out = asof_mod.asof_join(
        p, c, key="user_id", left_ts="ts", right_ts="cts",
        value_cols=["click_id"], inclusive=True,
    )
    return out.select(
        "user_id",
        "purchase_id",
        F.col("click_id_right").alias("last_click_id"),
        F.col("cts_right").alias("last_click_ts"),
    ).orderBy("purchase_id")


def _sssp_oracle(rounds: int = 4) -> str:
    parts = ["""so AS (SELECT DISTINCT l_suppkey AS s, l_orderkey AS o FROM lineitem),
    w AS (
      SELECT a.s AS u, b.s AS v, COUNT(*) AS c
      FROM so a JOIN so b ON a.o = b.o AND a.s < b.s
      GROUP BY a.s, b.s),
    sym AS (
      SELECT u AS x, v AS y, c FROM w
      UNION ALL SELECT v AS x, u AS y, c FROM w),
    sel AS (
      SELECT x, y FROM (
        SELECT x, y,
               ROW_NUMBER() OVER (PARTITION BY x ORDER BY c DESC, y) AS rn
        FROM sym)
      WHERE rn <= 3),
    e AS (
      SELECT DISTINCT least(x, y) AS u, greatest(x, y) AS v FROM sel),
    ew AS (
      SELECT e.u, e.v, 1 + 1000 // w.c AS wt
      FROM e JOIN w ON w.u = e.u AND w.v = e.v),
    und AS (SELECT u, v, wt FROM ew UNION ALL SELECT v, u, wt FROM ew),
    src AS (SELECT MIN(u) AS s FROM und),
    d0 AS (SELECT s AS node, CAST(0 AS BIGINT) AS dist FROM src)"""]
    for r in range(1, rounds + 1):
        parts.append(f"""d{r} AS (
      SELECT node, MIN(dist) AS dist FROM (
        SELECT node, dist FROM d{r - 1}
        UNION ALL
        SELECT und.v AS node, d{r - 1}.dist + und.wt AS dist
        FROM d{r - 1} JOIN und ON und.u = d{r - 1}.node) t
      GROUP BY node)""")
    ctes = ",\n    ".join(parts)
    return f"""
    WITH {ctes}
    SELECT node, dist FROM (
      SELECT node, dist,
             ROW_NUMBER() OVER (ORDER BY dist, node) AS rn
      FROM d{rounds})
    WHERE rn <= 20 ORDER BY dist, node
    """


@register("graph_sssp_bellman_ford", oracle=_sssp_oracle())
def graph_sssp_bellman_ford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted single-source shortest paths by synchronous Bellman-Ford
    relaxation (4 rounds) on the sparsified co-order graph — integer
    edge costs (1 + 1000 // shared-orders: stronger ties are cheaper),
    one join + one min-aggregate per round, lineage cut per round. The
    oracle replays each relaxation stage verbatim, so the per-round
    frontier arithmetic is what's verified, not just the final
    distances. Output: the 20 nearest suppliers to the minimum-id
    source."""
    li = _t(spark, sf_dir, "lineitem")
    so = li.select(
        F.col("l_suppkey").alias("s"), F.col("l_orderkey").alias("o")
    ).distinct()
    w = (
        so.alias("a")
        .join(
            so.alias("b"),
            (F.col("a.o") == F.col("b.o")) & (F.col("a.s") < F.col("b.s")),
        )
        .groupBy(F.col("a.s").alias("u"), F.col("b.s").alias("v"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    e = graph_mod.top_k_cooccurrence_edges(w, k=3)
    ew = e.join(w, ["u", "v"]).select(
        "u", "v", (F.lit(1) + F.expr("1000 div c")).alias("wt")
    )
    und = ew.unionByName(
        ew.select(F.col("v").alias("u"), F.col("u").alias("v"), "wt")
    )
    und = op_cache.track(und.cache())
    src = und.agg(F.min("u").alias("s")).collect()[0]["s"]
    dist = spark.createDataFrame([(int(src), 0)], "node long, dist long")
    for _ in range(4):
        relaxed = (
            und.join(dist, und.u == dist.node)
            .select(F.col("v").alias("node"), (F.col("dist") + F.col("wt")).alias("dist"))
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
        dist = dist.localCheckpoint(eager=True)
    wr = Window.orderBy("dist", "node")
    return (
        dist.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= 20)
        .select("node", "dist")
        .orderBy("dist", "node")
    )


@register(
    "quantile_normalize_doclen",
    oracle="""
    WITH t AS (
      SELECT doc_id, source, n_chars,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY n_chars, doc_id) AS r,
             COUNT(*) OVER (PARTITION BY source) AS ns
      FROM documents),
    g AS (
      SELECT n_chars AS gval,
             ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS gr,
             COUNT(*) OVER () AS n
      FROM documents),
    mapped AS (
      SELECT t.doc_id, t.source, t.n_chars,
             g.gval AS norm_len
      FROM t JOIN g
        ON g.gr = ((t.r * g.n + t.ns - 1) // t.ns))
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_raw,
           CAST(SUM(norm_len) AS BIGINT) AS sum_normalized,
           CAST(SUM(ABS(norm_len - n_chars)) AS BIGINT) AS total_shift
    FROM mapped GROUP BY source ORDER BY source
    """,
)
def quantile_normalize_doclen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization across sources (the batch-effect
    correction step before mixing corpora): each document's length maps
    to the pooled distribution's value at the equivalent rank
    (ceil(r/ns * N), integer selection — no interpolation, so every
    mapped value is an actual observed length and both engines agree
    exactly). Two rank windows and one equi-join on rank; per-source
    sums report how much each source's length profile had to shift."""
    docs = _t(spark, sf_dir, "documents")
    ws = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    wsc = Window.partitionBy("source")
    t = docs.select(
        "doc_id",
        "source",
        "n_chars",
        F.row_number().over(ws).alias("r"),
        F.count(F.lit(1)).over(wsc).alias("ns"),
    )
    wg = Window.orderBy("n_chars", "doc_id")
    g = docs.select(
        F.col("n_chars").alias("gval"),
        F.row_number().over(wg).alias("gr"),
        F.count(F.lit(1)).over(
            Window.partitionBy()
        ).alias("n"),
    )
    mapped = t.join(
        g,
        F.col("gr")
        == ((F.col("r") * F.col("n") + F.col("ns") - 1) / F.col("ns")).cast(
            "long"
        ),
    )
    return (
        mapped.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_raw"),
            F.sum("gval").cast("bigint").alias("sum_normalized"),
            F.sum(F.abs(F.col("gval") - F.col("n_chars")))
            .cast("bigint")
            .alias("total_shift"),
        )
        .orderBy("source")
    )


@register(
    "functional_dependency_audit",
    oracle="""
    WITH cands AS (
      SELECT 'n_nationkey->n_regionkey' AS fd, n_nationkey AS lhs,
             CAST(n_regionkey AS VARCHAR) AS rhs FROM nation
      UNION ALL
      SELECT 'c_nationkey->c_mktsegment', c_nationkey,
             c_mktsegment FROM customer
      UNION ALL
      SELECT 'o_custkey->o_orderpriority', o_custkey,
             o_orderpriority FROM orders),
    per_lhs AS (
      SELECT fd, lhs, COUNT(DISTINCT rhs) AS n_rhs, COUNT(*) AS n_rows
      FROM cands GROUP BY fd, lhs)
    SELECT fd,
           COUNT(*) AS n_lhs_values,
           CAST(SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violating_lhs,
           CAST(SUM(CASE WHEN n_rhs > 1 THEN n_rows ELSE 0 END) AS BIGINT)
             AS n_rows_in_violation,
           CASE WHEN SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) = 0
                THEN 1 ELSE 0 END AS holds
    FROM per_lhs GROUP BY fd ORDER BY fd
    """,
)
def functional_dependency_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency discovery/validation (schema-quality audit):
    candidate FDs checked by counting distinct right-hand values per
    left-hand value — nation->region must hold (keyed dimension),
    customer-nation->segment and customer->priority must fail (showing
    the audit finds real violations, not just confirms keys). One
    union'd scan and two hash aggregates per candidate; at 100 TB each
    FD check is a distinct-count shuffle on the LHS."""
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    cands = (
        nation.select(
            F.lit("n_nationkey->n_regionkey").alias("fd"),
            F.col("n_nationkey").alias("lhs"),
            F.col("n_regionkey").cast("string").alias("rhs"),
        )
        .unionByName(
            cust.select(
                F.lit("c_nationkey->c_mktsegment").alias("fd"),
                F.col("c_nationkey").alias("lhs"),
                F.col("c_mktsegment").alias("rhs"),
            )
        )
        .unionByName(
            orders.select(
                F.lit("o_custkey->o_orderpriority").alias("fd"),
                F.col("o_custkey").alias("lhs"),
                F.col("o_orderpriority").alias("rhs"),
            )
        )
    )
    per_lhs = cands.groupBy("fd", "lhs").agg(
        F.countDistinct("rhs").alias("n_rhs"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    return (
        per_lhs.groupBy("fd")
        .agg(
            F.count(F.lit(1)).alias("n_lhs_values"),
            F.sum(F.when(F.col("n_rhs") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_violating_lhs"),
            F.sum(F.when(F.col("n_rhs") > 1, F.col("n_rows")).otherwise(0))
            .cast("bigint")
            .alias("n_rows_in_violation"),
            F.when(
                F.sum(F.when(F.col("n_rhs") > 1, 1).otherwise(0)) == 0, 1
            )
            .otherwise(0)
            .alias("holds"),
        )
        .orderBy("fd")
    )


@register(
    "consistent_join_sample",
    oracle="""
    WITH sc AS (
      SELECT c_custkey FROM customer
      WHERE CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || ':smp'), 1, 15)
                 AS BIGINT) % 10 = 0),
    so AS (
      SELECT o.o_orderkey, o.o_totalprice
      FROM orders o JOIN sc ON sc.c_custkey = o.o_custkey),
    sl AS (
      SELECT l.l_extendedprice FROM lineitem l
      JOIN so ON so.o_orderkey = l.l_orderkey)
    SELECT (SELECT COUNT(*) FROM sc) AS n_customers_sampled,
           (SELECT COUNT(*) FROM so) AS n_orders_carried,
           (SELECT COUNT(*) FROM sl) AS n_lineitems_carried,
           CAST(ROUND((SELECT SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                       FROM so) * 10, 2) AS DOUBLE) AS est_total_revenue,
           CAST(ROUND((SELECT SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                       FROM orders), 2) AS DOUBLE) AS true_total_revenue
    """,
)
def consistent_join_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-consistent sampling — the only correct way to sample a star
    schema: hash-sample the ENTITY (10% of customers by salted md5),
    then carry every dependent order and line item of the sampled
    entities, so joins inside the sample are complete and unbiased
    (independent per-table sampling would destroy the join structure).
    The Horvitz-Thompson scale-up (x10) sits next to the true total for
    the bias check. Filters are semi-join pushdowns on the key — at
    100 TB the sample predicate prunes before any fact shuffle."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    sc = cust.filter(
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("c_custkey").cast("string"), F.lit(":smp"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % 10
        == 0
    ).select("c_custkey")
    so = orders.join(
        F.broadcast(sc), orders.o_custkey == sc.c_custkey
    ).select("o_orderkey", "o_totalprice")
    so = op_cache.track(so.cache())
    sl = li.join(
        so.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey")
    ).select("l_extendedprice")
    nc = sc.agg(F.count(F.lit(1)).alias("n_customers_sampled"))
    no = so.agg(F.count(F.lit(1)).alias("n_orders_carried"))
    nl = sl.agg(F.count(F.lit(1)).alias("n_lineitems_carried"))
    est = so.agg(
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 10, 2
        )
        .cast("double")
        .alias("est_total_revenue")
    )
    true_rev = orders.agg(
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2)
        .cast("double")
        .alias("true_total_revenue")
    )
    return (
        nc.crossJoin(F.broadcast(no))
        .crossJoin(F.broadcast(nl))
        .crossJoin(F.broadcast(est))
        .crossJoin(F.broadcast(true_rev))
    )


@register(
    "cep_pattern_detection",
    oracle="""
    WITH v AS (SELECT user_id, event_id AS view_id, ts AS vts
               FROM events WHERE event_type = 'view'),
    p AS (SELECT user_id, event_id AS purchase_id, ts AS pts
          FROM events WHERE event_type = 'purchase'),
    cand AS (
      SELECT v.user_id, v.view_id, v.vts, p.purchase_id, p.pts,
             ROW_NUMBER() OVER (PARTITION BY v.view_id
                                ORDER BY p.pts, p.purchase_id) AS rn
      FROM v JOIN p ON p.user_id = v.user_id
       AND p.pts > v.vts AND p.pts <= v.vts + INTERVAL 30 MINUTE),
    first_p AS (SELECT * FROM cand WHERE rn = 1),
    matched AS (
      SELECT f.user_id, f.view_id, f.purchase_id,
             CAST(epoch_ms(f.pts) - epoch_ms(f.vts) AS BIGINT) AS latency_ms
      FROM first_p f
      WHERE NOT EXISTS (
        SELECT 1 FROM events c
        WHERE c.event_type = 'click' AND c.user_id = f.user_id
          AND c.ts > f.vts AND c.ts < f.pts))
    SELECT user_id, view_id, purchase_id, latency_ms
    FROM matched ORDER BY user_id, view_id
    """,
)
def cep_pattern_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complex-event-processing pattern matching (the MATCH_RECOGNIZE /
    Flink-CEP shape Spark has no primitive for): VIEW followed by
    PURCHASE within 30 minutes with NO CLICK strictly between — the
    'direct conversion' pattern. Expressed relationally: bounded-range
    join to the first qualifying purchase (row_number, deterministic
    tiebreak), then a negation anti-join for the forbidden middle
    event. All joins are equi-joins on user_id with range predicates —
    the state a true CEP engine would hold per key maps here to one
    co-partitioned shuffle."""
    ev = _t(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_id"), F.col("ts").alias("vts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("pts"),
    )
    cand = v.join(
        p,
        (F.col("pu") == F.col("user_id"))
        & (F.col("pts") > F.col("vts"))
        & (F.col("pts") <= F.col("vts") + F.expr("INTERVAL 30 MINUTES")),
    )
    wf = Window.partitionBy("view_id").orderBy("pts", "purchase_id")
    first_p = (
        cand.withColumn("rn", F.row_number().over(wf))
        .filter(F.col("rn") == 1)
        .select("user_id", "view_id", "vts", "purchase_id", "pts")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("ts").alias("cts")
    )
    blocked = first_p.join(
        clicks,
        (F.col("cu") == F.col("user_id"))
        & (F.col("cts") > F.col("vts"))
        & (F.col("cts") < F.col("pts")),
        "left_semi",
    )
    matched = first_p.join(
        blocked.select(F.col("view_id").alias("bv")),
        F.col("view_id") == F.col("bv"),
        "left_anti",
    )
    return matched.select(
        "user_id",
        "view_id",
        "purchase_id",
        (
            (F.unix_millis(F.col("pts")) - F.unix_millis(F.col("vts")))
        ).cast("bigint").alias("latency_ms"),
    ).orderBy("user_id", "view_id")


@register(
    "cdc_tombstone_merge",
    oracle="""
    WITH log AS (
      SELECT user_id, ts, event_id,
             CASE event_type WHEN 'purchase' THEN 'D'
                             WHEN 'click' THEN 'U' ELSE 'I' END AS op,
             value
      FROM events WHERE event_type IN ('view', 'click', 'purchase')),
    latest AS (
      SELECT user_id, op, value, ts FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                     ORDER BY ts DESC, event_id DESC) AS rn
        FROM log) WHERE rn = 1)
    SELECT user_id, ts AS last_ts, ROUND(value, 6) AS last_value
    FROM latest WHERE op <> 'D'
    ORDER BY user_id
    """,
)
def cdc_tombstone_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC merge WITH DELETES: a change log of inserts/updates/tombstones
    (derived deterministically from event types) folds to final state by
    latest-op-per-key — keys whose most recent operation is a tombstone
    vanish from the serving table entirely, the delete semantics an
    upsert-only merge silently gets wrong. One window (or max_by
    aggregate at scale) plus a filter; the tombstone filter applies
    AFTER picking the latest op, never before."""
    ev = _t(spark, sf_dir, "events")
    log = ev.filter(
        F.col("event_type").isin("view", "click", "purchase")
    ).select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "purchase", "D")
        .when(F.col("event_type") == "click", "U")
        .otherwise("I")
        .alias("op"),
        "value",
    )
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    latest = (
        log.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    return (
        latest.filter(F.col("op") != "D")
        .select(
            "user_id",
            F.col("ts").alias("last_ts"),
            F.round("value", 6).alias("last_value"),
        )
        .orderBy("user_id")
    )


_BOM_SQL_BODY = """
    WITH RECURSIVE bom(component, assembly, qty, depth) AS (
        SELECT p_partkey, CAST(FLOOR(p_partkey / 10) AS BIGINT),
               CAST(p_partkey % 5 + 1 AS BIGINT), 1
        FROM {part} WHERE p_partkey >= 10
        UNION ALL
        SELECT b.component, CAST(FLOOR(b.assembly / 10) AS BIGINT),
               b.qty * CAST(b.assembly % 5 + 1 AS BIGINT), b.depth + 1
        FROM bom b WHERE b.assembly >= 10 AND b.depth < 3
    )
    SELECT assembly, depth,
           COUNT(*) AS n_components,
           CAST(SUM(qty) AS BIGINT) AS total_effective_qty,
           CAST(MAX(qty) AS BIGINT) AS max_path_qty
    FROM bom GROUP BY assembly, depth
    ORDER BY assembly, depth
    """


@register("bom_quantity_rollup", oracle=_BOM_SQL_BODY.format(part="part"))
def bom_quantity_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bill-of-materials explosion with MULTIPLIED quantities along the
    path (the manufacturing rollup a plain transitive closure can't do):
    an implicit decimal-tree hierarchy (assembly = partkey/10) where
    each level contributes a per-edge quantity, and effective quantity
    is the PRODUCT down the path — integer products, bounded depth 3,
    aggregated per (assembly, depth). One SQL string on both engines;
    Spark 4's recursive CTE plans each expansion step as its own join."""
    _t(spark, sf_dir, "part").createOrReplaceTempView("part_bom")
    return spark.sql(_BOM_SQL_BODY.format(part="part_bom"))


@register(
    "null_safe_join_eqnullsafe",
    oracle="""
    WITH o AS (
      SELECT o_orderkey,
             CASE WHEN o_orderpriority = '5-LOW' THEN NULL
                  ELSE o_orderpriority END AS pr,
             o_totalprice
      FROM orders),
    d AS (
      SELECT * FROM (VALUES
        ('1-URGENT', 100), ('2-HIGH', 80), ('3-MEDIUM', 50),
        ('4-NOT SPECIFIED', 20), (NULL, 0)) t(pr, weight))
    SELECT COALESCE(o.pr, '<null>') AS priority,
           d.weight,
           COUNT(*) AS n_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS total
    FROM o JOIN d ON o.pr IS NOT DISTINCT FROM d.pr
    GROUP BY COALESCE(o.pr, '<null>'), d.weight
    ORDER BY priority
    """,
)
def null_safe_join_eqnullsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (Spark `<=>` / ANSI IS NOT DISTINCT FROM):
    NULL keys MATCH each other instead of vanishing — the semantics a
    dimension lookup needs when 'unknown' is itself a dimension row. A
    plain equi-join would silently drop every NULL-priority order; the
    weight-0 dimension row catching them is the proof it didn't."""
    orders = _t(spark, sf_dir, "orders")
    o = orders.select(
        "o_orderkey",
        F.when(F.col("o_orderpriority") == "5-LOW", None)
        .otherwise(F.col("o_orderpriority"))
        .alias("pr"),
        "o_totalprice",
    )
    d = spark.createDataFrame(
        [
            ("1-URGENT", 100),
            ("2-HIGH", 80),
            ("3-MEDIUM", 50),
            ("4-NOT SPECIFIED", 20),
            (None, 0),
        ],
        "dpr string, weight int",
    )
    return (
        o.join(F.broadcast(d), o.pr.eqNullSafe(d.dpr))
        .groupBy(
            F.coalesce(F.col("pr"), F.lit("<null>")).alias("priority"),
            "weight",
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("total"),
        )
        .orderBy("priority")
    )


@register(
    "token_balanced_shards",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             len(string_split_regex(regexp_replace(lower(trim(text)),
                                                   '\\s+', ' ', 'g'), ' '))
               AS n_tok
      FROM documents),
    rr AS (
      SELECT doc_id, n_tok,
             (ROW_NUMBER() OVER (ORDER BY n_tok DESC, doc_id) - 1) % 16
               AS shard_id
      FROM toks),
    hash_s AS (
      SELECT n_tok,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                  AS BIGINT) % 16 AS shard_id
      FROM toks),
    r AS (SELECT shard_id, SUM(n_tok) AS load FROM rr GROUP BY shard_id),
    h AS (SELECT shard_id, SUM(n_tok) AS load FROM hash_s GROUP BY shard_id)
    SELECT CAST(r.shard_id AS INT) AS shard_id,
           CAST(r.load AS BIGINT) AS sorted_rr_load,
           CAST(h.load AS BIGINT) AS hash_load,
           CAST((SELECT MAX(load) - MIN(load) FROM r) AS BIGINT)
             AS rr_spread,
           CAST((SELECT MAX(load) - MIN(load) FROM h) AS BIGINT)
             AS hash_spread
    FROM r JOIN h ON h.shard_id = r.shard_id
    ORDER BY shard_id
    """,
)
def token_balanced_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-balanced shard assignment: round-robin over the
    length-sorted corpus (the parallel-friendly LPT approximation) vs
    plain hash sharding, with per-shard token loads and the max-min
    spread of each scheme side by side — the measured case for sorting
    before sharding when downstream cost is token-proportional. All
    integers; the global sort is one range exchange."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.size(
            F.split(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "), " ")
        ).alias("n_tok"),
    )
    toks = op_cache.track(toks.cache())
    wrr = Window.orderBy(F.col("n_tok").desc(), "doc_id")
    rr = toks.select(
        "n_tok",
        ((F.row_number().over(wrr) - 1) % 16).cast("int").alias("shard_id"),
    ).groupBy("shard_id").agg(F.sum("n_tok").cast("bigint").alias("rr_load"))
    hs = toks.select(
        "n_tok",
        (
            F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15),
                16,
                10,
            ).cast("long")
            % 16
        ).cast("int").alias("shard_id"),
    ).groupBy("shard_id").agg(F.sum("n_tok").cast("bigint").alias("hash_load"))
    rspread = rr.agg(
        (F.max("rr_load") - F.min("rr_load")).cast("bigint").alias("rr_spread")
    )
    hspread = hs.agg(
        (F.max("hash_load") - F.min("hash_load"))
        .cast("bigint")
        .alias("hash_spread")
    )
    return (
        rr.join(hs, "shard_id")
        .crossJoin(F.broadcast(rspread))
        .crossJoin(F.broadcast(hspread))
        .select(
            "shard_id",
            F.col("rr_load").alias("sorted_rr_load"),
            "hash_load",
            "rr_spread",
            "hash_spread",
        )
        .orderBy("shard_id")
    )


@register(
    "streaming_stream_stream_left_semi",
    oracle="""
    SELECT DISTINCT p.user_id, p.event_id AS purchase_id
    FROM events p JOIN events c
      ON p.event_type = 'purchase' AND c.event_type = 'click'
     AND c.user_id = p.user_id
     AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
    ORDER BY p.user_id, purchase_id
    """,
)
def streaming_stream_stream_left_semi(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Watermarked stream-stream LEFT SEMI join (the streaming existence
    filter), drained availableNow: each purchase with at least one click
    in its preceding hour emits exactly once, however many clicks
    matched — which the DISTINCT batch oracle pins. Completes the
    inner/left-outer/full-outer/semi join-mode matrix."""
    import os as _os

    from .streaming.incremental import stream_stream_left_semi_join

    out = stream_stream_left_semi_join(
        spark, _os.path.join(sf_dir, "events.parquet")
    )
    return out.orderBy("user_id", "purchase_id")


_PAGINATION_SQL = """
    SELECT o_orderkey, o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 50 OFFSET 100
    """


@register("limit_offset_pagination", oracle=_PAGINATION_SQL)
def limit_offset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic keyset-stable pagination: page 3 of the
    revenue-ordered orders via LIMIT/OFFSET over a total order (unique
    tiebreak column — without it OFFSET pagination is nondeterministic
    and pages can overlap). One SQL string on both engines."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_PAGINATION_SQL)


@register(
    "data_budget_epoch_allocation",
    oracle="""
    WITH t AS (
      SELECT source,
             CAST(SUM(len(string_split_regex(
                    regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')))
                  AS BIGINT) AS toks
      FROM documents GROUP BY source),
    w AS (
      SELECT source, toks,
             CAST(FLOOR(SQRT(CAST(toks AS DOUBLE)) * 1000) AS BIGINT) AS wt
      FROM t),
    tot AS (
      SELECT CAST(SUM(toks) AS BIGINT) // 2 AS budget,
             CAST(SUM(wt) AS BIGINT) AS wsum
      FROM w),
    r1 AS (
      SELECT w.source, w.toks, w.wt,
             LEAST((tot.budget * w.wt) // tot.wsum, 4 * w.toks) AS capped,
             CASE WHEN (tot.budget * w.wt) // tot.wsum >= 4 * w.toks
                  THEN 1 ELSE 0 END AS is_capped
      FROM w, tot),
    l AS (
      SELECT (SELECT budget FROM tot) - CAST(SUM(capped) AS BIGINT)
               AS leftover,
             CAST(SUM(CASE WHEN is_capped = 0 THEN wt ELSE 0 END) AS BIGINT)
               AS wsum_open
      FROM r1)
    SELECT r1.source, r1.toks AS source_tokens, r1.wt AS weight,
           CAST(LEAST(r1.capped +
                      CASE WHEN r1.is_capped = 0 AND l.wsum_open > 0
                           THEN (l.leftover * r1.wt) // l.wsum_open
                           ELSE 0 END,
                      4 * r1.toks) AS BIGINT) AS final_alloc,
           CAST((LEAST(r1.capped +
                      CASE WHEN r1.is_capped = 0 AND l.wsum_open > 0
                           THEN (l.leftover * r1.wt) // l.wsum_open
                           ELSE 0 END,
                      4 * r1.toks) * 1000) // r1.toks AS BIGINT)
             AS epochs_permille
    FROM r1, l ORDER BY r1.source
    """,
)
def data_budget_epoch_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-constrained mixture allocation (the Muennighoff-style
    epoch-capped water-fill): a token budget (half the corpus) is split
    across sources by temperature-smoothed weights (sqrt of source
    tokens, floored to integer per-mille so every subsequent sum and
    division is EXACT integer arithmetic), sources hitting the 4-epoch
    repetition cap are clamped, and one redistribution round water-fills
    the leftover over uncapped sources. Output: per-source allocation
    and repetition factor in per-mille epochs."""
    docs = _t(spark, sf_dir, "documents")
    t = docs.select(
        "source",
        F.size(
            F.split(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "), " ")
        ).alias("n_tok"),
    ).groupBy("source").agg(F.sum("n_tok").cast("bigint").alias("toks"))
    w = t.select(
        "source",
        "toks",
        F.floor(F.sqrt(F.col("toks").cast("double")) * 1000)
        .cast("bigint")
        .alias("wt"),
    )
    w = op_cache.track(w.cache())
    tot = w.agg(
        (F.sum("toks").cast("bigint") / 2).cast("bigint").alias("budget"),
        F.sum("wt").cast("bigint").alias("wsum"),
    )
    r1 = w.crossJoin(F.broadcast(tot)).select(
        "source",
        "toks",
        "wt",
        F.least(
            F.expr("(budget * wt) div wsum"), F.lit(4) * F.col("toks")
        ).alias("capped"),
        F.when(
            F.expr("(budget * wt) div wsum") >= F.lit(4) * F.col("toks"), 1
        )
        .otherwise(0)
        .alias("is_capped"),
        "budget",
    )
    r1 = op_cache.track(r1.cache())
    l = r1.agg(
        (F.max("budget") - F.sum("capped")).cast("bigint").alias("leftover"),
        F.sum(F.when(F.col("is_capped") == 0, F.col("wt")).otherwise(0))
        .cast("bigint")
        .alias("wsum_open"),
    )
    final_alloc = F.least(
        F.col("capped")
        + F.when(
            (F.col("is_capped") == 0) & (F.col("wsum_open") > 0),
            F.expr("(leftover * wt) div wsum_open"),
        ).otherwise(0),
        F.lit(4) * F.col("toks"),
    )
    return (
        r1.crossJoin(F.broadcast(l))
        .select(
            "source",
            F.col("toks").alias("source_tokens"),
            F.col("wt").alias("weight"),
            final_alloc.cast("bigint").alias("final_alloc"),
            F.expr(
                "CAST((least(capped + CASE WHEN is_capped = 0 AND wsum_open > 0 "
                "THEN (leftover * wt) div wsum_open ELSE 0 END, 4 * toks) * 1000) "
                "div toks AS BIGINT)"
            ).alias("epochs_permille"),
        )
        .orderBy("source")
    )


_HLL_SLIDING_ORACLE = """
    WITH h AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
                  AS BIGINT) AS hv
      FROM events),
    rb AS (SELECT d, hv & 63 AS bucket, hv >> 6 AS w FROM h),
    regs AS (SELECT d, bucket, MAX(CASE WHEN w >= 9007199254740992 THEN 1 WHEN w >= 4503599627370496 THEN 2 WHEN w >= 2251799813685248 THEN 3 WHEN w >= 1125899906842624 THEN 4 WHEN w >= 562949953421312 THEN 5 WHEN w >= 281474976710656 THEN 6 WHEN w >= 140737488355328 THEN 7 WHEN w >= 70368744177664 THEN 8 WHEN w >= 35184372088832 THEN 9 WHEN w >= 17592186044416 THEN 10 WHEN w >= 8796093022208 THEN 11 WHEN w >= 4398046511104 THEN 12 WHEN w >= 2199023255552 THEN 13 WHEN w >= 1099511627776 THEN 14 WHEN w >= 549755813888 THEN 15 WHEN w >= 274877906944 THEN 16 WHEN w >= 137438953472 THEN 17 WHEN w >= 68719476736 THEN 18 WHEN w >= 34359738368 THEN 19 WHEN w >= 17179869184 THEN 20 WHEN w >= 8589934592 THEN 21 WHEN w >= 4294967296 THEN 22 WHEN w >= 2147483648 THEN 23 WHEN w >= 1073741824 THEN 24 WHEN w >= 536870912 THEN 25 WHEN w >= 268435456 THEN 26 WHEN w >= 134217728 THEN 27 WHEN w >= 67108864 THEN 28 WHEN w >= 33554432 THEN 29 WHEN w >= 16777216 THEN 30 WHEN w >= 8388608 THEN 31 WHEN w >= 4194304 THEN 32 WHEN w >= 2097152 THEN 33 WHEN w >= 1048576 THEN 34 WHEN w >= 524288 THEN 35 WHEN w >= 262144 THEN 36 WHEN w >= 131072 THEN 37 WHEN w >= 65536 THEN 38 WHEN w >= 32768 THEN 39 WHEN w >= 16384 THEN 40 WHEN w >= 8192 THEN 41 WHEN w >= 4096 THEN 42 WHEN w >= 2048 THEN 43 WHEN w >= 1024 THEN 44 WHEN w >= 512 THEN 45 WHEN w >= 256 THEN 46 WHEN w >= 128 THEN 47 WHEN w >= 64 THEN 48 WHEN w >= 32 THEN 49 WHEN w >= 16 THEN 50 WHEN w >= 8 THEN 51 WHEN w >= 4 THEN 52 WHEN w >= 2 THEN 53 WHEN w >= 1 THEN 54 ELSE 55 END) AS mj
             FROM rb GROUP BY d, bucket),
    days AS (SELECT DISTINCT d FROM regs),
    win AS (
      SELECT dy.d, r.bucket, MAX(r.mj) AS mj
      FROM days dy JOIN regs r ON r.d BETWEEN dy.d - 6 AND dy.d
      GROUP BY dy.d, r.bucket),
    s AS (
      SELECT d,
             SUM(CAST(1 AS BIGINT) << (55 - mj)) AS inv_present,
             COUNT(*) AS n_present
      FROM win GROUP BY d),
    est AS (
      SELECT d, 64 - n_present AS zeros,
             CAST(0.7093409548395029 AS DOUBLE) * 4096 *
             CAST(36028797018963968 AS DOUBLE) /
             CAST(inv_present + (64 - n_present) *
                  (CAST(1 AS BIGINT) << 55) AS DOUBLE) AS raw
      FROM s),
    fin AS (
      SELECT d,
             ROUND(CASE WHEN raw <= 160 AND zeros > 0
                        THEN 64 * ln(CAST(64 AS DOUBLE) /
                                      CAST(zeros AS DOUBLE))
                        ELSE raw END, 4) AS hll_trailing7
      FROM est),
    du AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
    ex AS (
      SELECT dy.d, COUNT(DISTINCT du.user_id) AS exact_trailing7
      FROM days dy JOIN du ON du.d BETWEEN dy.d - 6 AND dy.d
      GROUP BY dy.d)
    SELECT CAST(f.d AS TIMESTAMP) AS day, f.hll_trailing7,
           CAST(ex.exact_trailing7 AS BIGINT) AS exact_trailing7,
           ROUND(ABS(f.hll_trailing7 - ex.exact_trailing7) /
                 ex.exact_trailing7, 4) AS rel_err
    FROM fin f JOIN ex ON ex.d = f.d
    ORDER BY day
    """

_HLL_SLIDING_SPARK = """
    WITH h AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(conv(substr(md5(CAST(user_id AS STRING)), 1, 15), 16, 10)
                  AS BIGINT) AS hv
      FROM events_hll),
    rb AS (SELECT d, hv & 63 AS bucket, shiftright(hv, 6) AS w FROM h),
    regs AS (SELECT d, bucket, MAX(CASE WHEN w >= 9007199254740992 THEN 1 WHEN w >= 4503599627370496 THEN 2 WHEN w >= 2251799813685248 THEN 3 WHEN w >= 1125899906842624 THEN 4 WHEN w >= 562949953421312 THEN 5 WHEN w >= 281474976710656 THEN 6 WHEN w >= 140737488355328 THEN 7 WHEN w >= 70368744177664 THEN 8 WHEN w >= 35184372088832 THEN 9 WHEN w >= 17592186044416 THEN 10 WHEN w >= 8796093022208 THEN 11 WHEN w >= 4398046511104 THEN 12 WHEN w >= 2199023255552 THEN 13 WHEN w >= 1099511627776 THEN 14 WHEN w >= 549755813888 THEN 15 WHEN w >= 274877906944 THEN 16 WHEN w >= 137438953472 THEN 17 WHEN w >= 68719476736 THEN 18 WHEN w >= 34359738368 THEN 19 WHEN w >= 17179869184 THEN 20 WHEN w >= 8589934592 THEN 21 WHEN w >= 4294967296 THEN 22 WHEN w >= 2147483648 THEN 23 WHEN w >= 1073741824 THEN 24 WHEN w >= 536870912 THEN 25 WHEN w >= 268435456 THEN 26 WHEN w >= 134217728 THEN 27 WHEN w >= 67108864 THEN 28 WHEN w >= 33554432 THEN 29 WHEN w >= 16777216 THEN 30 WHEN w >= 8388608 THEN 31 WHEN w >= 4194304 THEN 32 WHEN w >= 2097152 THEN 33 WHEN w >= 1048576 THEN 34 WHEN w >= 524288 THEN 35 WHEN w >= 262144 THEN 36 WHEN w >= 131072 THEN 37 WHEN w >= 65536 THEN 38 WHEN w >= 32768 THEN 39 WHEN w >= 16384 THEN 40 WHEN w >= 8192 THEN 41 WHEN w >= 4096 THEN 42 WHEN w >= 2048 THEN 43 WHEN w >= 1024 THEN 44 WHEN w >= 512 THEN 45 WHEN w >= 256 THEN 46 WHEN w >= 128 THEN 47 WHEN w >= 64 THEN 48 WHEN w >= 32 THEN 49 WHEN w >= 16 THEN 50 WHEN w >= 8 THEN 51 WHEN w >= 4 THEN 52 WHEN w >= 2 THEN 53 WHEN w >= 1 THEN 54 ELSE 55 END) AS mj
             FROM rb GROUP BY d, bucket),
    days AS (SELECT DISTINCT d FROM regs),
    win AS (
      SELECT dy.d, r.bucket, MAX(r.mj) AS mj
      FROM days dy JOIN regs r
        ON r.d BETWEEN date_sub(dy.d, 6) AND dy.d
      GROUP BY dy.d, r.bucket),
    s AS (
      SELECT d,
             SUM(shiftleft(CAST(1 AS BIGINT), 55 - mj))
               AS inv_present,
             COUNT(*) AS n_present
      FROM win GROUP BY d),
    est AS (
      SELECT d, 64 - n_present AS zeros,
             CAST(0.7093409548395029 AS DOUBLE) * 4096 *
             CAST(36028797018963968 AS DOUBLE) /
             CAST(inv_present + (64 - n_present) *
                  shiftleft(CAST(1 AS BIGINT), 55) AS DOUBLE) AS raw
      FROM s),
    fin AS (
      SELECT d,
             ROUND(CASE WHEN raw <= 160 AND zeros > 0
                        THEN 64 * ln(CAST(64 AS DOUBLE) /
                                      CAST(zeros AS DOUBLE))
                        ELSE raw END, 4) AS hll_trailing7
      FROM est),
    du AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events_hll),
    ex AS (
      SELECT dy.d, COUNT(DISTINCT du.user_id) AS exact_trailing7
      FROM days dy JOIN du ON du.d BETWEEN date_sub(dy.d, 6) AND dy.d
      GROUP BY dy.d)
    SELECT CAST(f.d AS TIMESTAMP) AS day, f.hll_trailing7,
           CAST(ex.exact_trailing7 AS BIGINT) AS exact_trailing7,
           ROUND(ABS(f.hll_trailing7 - ex.exact_trailing7) /
                 ex.exact_trailing7, 4) AS rel_err
    FROM fin f JOIN ex ON ex.d = f.d
    ORDER BY day
    """


@register("hll_sliding_window_distinct", oracle=_HLL_SLIDING_ORACLE)
def hll_sliding_window_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch MERGE over a sliding window — the operation that makes
    rolling COUNT(DISTINCT) feasible at 100 TB: per-day HyperLogLog
    registers (m=64, exact-integer max-rank state) merge over each
    trailing 7-day window by per-register MAX, the estimator (with
    linear-counting correction) runs per day, and the exact rolling
    distinct sits alongside for the measured error. Exact distinct costs
    a 7x self-join blowup of (day,user) pairs; the sketch path carries
    64 integers per day — the whole point, demonstrated with both
    answers in one result."""
    _t(spark, sf_dir, "events").createOrReplaceTempView("events_hll")
    return spark.sql(_HLL_SLIDING_SPARK)


@register(
    "hierarchy_share_rollup",
    oracle="""
    WITH rev AS (
      SELECT r.r_name AS region, n.n_name AS nation,
             CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))), 2)
                  AS DECIMAL(18,2)) AS rev
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      GROUP BY r.r_name, n.n_name)
    SELECT region, nation,
           CAST(rev AS DOUBLE) AS revenue,
           ROUND(CAST(rev AS DOUBLE) /
                 CAST(SUM(rev) OVER (PARTITION BY region) AS DOUBLE), 6)
             AS share_of_region,
           ROUND(CAST(SUM(rev) OVER (PARTITION BY region) AS DOUBLE) /
                 CAST(SUM(rev) OVER () AS DOUBLE), 6)
             AS region_share_of_total
    FROM rev ORDER BY region, nation
    """,
)
def hierarchy_share_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-parent at two hierarchy levels in ONE pass: nation
    revenue, its share within the region, and the region's share of the
    grand total — windows over the aggregate (partition-by-region and
    global), never a second scan or self-join. DECIMAL sums keep every
    numerator/denominator exact until the final rounded divisions."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    rev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2)
            .cast("decimal(18,2)")
            .alias("rev")
        )
    )
    wr = Window.partitionBy("region")
    wg = Window.partitionBy()
    return rev.select(
        "region",
        "nation",
        F.col("rev").cast("double").alias("revenue"),
        F.round(
            F.col("rev").cast("double")
            / F.sum("rev").over(wr).cast("double"),
            6,
        ).alias("share_of_region"),
        F.round(
            F.sum("rev").over(wr).cast("double")
            / F.sum("rev").over(wg).cast("double"),
            6,
        ).alias("region_share_of_total"),
    ).orderBy("region", "nation")


@register(
    "dynamic_pivot_top_brands",
    oracle="""
    WITH top5 AS (
      SELECT p_brand FROM (
        SELECT p.p_brand, ROW_NUMBER() OVER (
          ORDER BY SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) DESC,
                   p.p_brand) AS rk
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY p.p_brand) WHERE rk <= 5),
    base AS (
      SELECT l.l_returnflag AS rf, p.p_brand,
             CAST(l.l_extendedprice AS DECIMAL(18,2)) AS px
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_brand IN (SELECT p_brand FROM top5))
    SELECT rf AS returnflag, p_brand AS brand,
           CAST(ROUND(SUM(px), 2) AS DOUBLE) AS revenue
    FROM base GROUP BY rf, p_brand
    ORDER BY returnflag, brand
    """,
)
def dynamic_pivot_top_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC pivot: the pivot columns are data-derived (top-5 brands by
    revenue, collected in a driver round-trip exactly like production
    dynamic-pivot code), then groupBy().pivot(values=top5) aggregates
    with Spark's two-phase pivot. The result unpivots back to long form
    for the engine-neutral value check — proving the pivot lost
    nothing."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    joined = li.join(
        F.broadcast(part.select("p_partkey", "p_brand")),
        li.l_partkey == F.col("p_partkey"),
    )
    wtop = Window.orderBy(F.desc("srev"), "p_brand")
    top5 = [
        r["p_brand"]
        for r in joined.groupBy("p_brand")
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("srev"))
        .withColumn("rk", F.row_number().over(wtop))
        .filter(F.col("rk") <= 5)
        .select("p_brand")
        .collect()
    ]
    pivoted = (
        joined.filter(F.col("p_brand").isin(top5))
        .groupBy(F.col("l_returnflag").alias("returnflag"))
        .pivot("p_brand", top5)
        .agg(
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")), 2)
            .cast("double")
        )
    )
    stack_expr = ", ".join(f"'{b}', `{b}`" for b in sorted(top5))
    return (
        pivoted.selectExpr(
            "returnflag",
            f"stack({len(top5)}, {stack_expr}) AS (brand, revenue)",
        )
        .filter(F.col("revenue").isNotNull())
        .orderBy("returnflag", "brand")
    )


@register(
    "calendar_edge_semantics",
    oracle="""
    WITH d AS (SELECT CAST(o_orderdate AS DATE) AS od FROM orders),
    e AS (
      SELECT od,
             CAST(od + INTERVAL 1 MONTH AS DATE) AS plus_month,
             CAST(last_day(od) AS DATE) AS month_end,
             CASE WHEN od = last_day(od) THEN 1 ELSE 0 END AS is_month_end
      FROM d)
    SELECT plus_month AS month_later,
           COUNT(*) AS n_orders,
           CAST(SUM(is_month_end) AS BIGINT) AS n_from_month_end,
           CAST(MIN(od) AS DATE) AS min_src_day,
           CAST(MAX(od) AS DATE) AS max_src_day
    FROM e GROUP BY plus_month ORDER BY plus_month
    """,
)
def calendar_edge_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-arithmetic EDGE semantics pinned across engines: adding one
    month to a month-end date CLAMPS (Jan 31 -> Feb 29 in a leap year,
    both engines verified identical), last_day() agrees, and grouping by
    the shifted date exposes any off-by-one — several source days
    collapse onto each clamped month-end, which the min/max source-day
    columns make visible."""
    o = _t(spark, sf_dir, "orders")
    d = o.select(F.to_date("o_orderdate").alias("od"))
    e = d.select(
        "od",
        F.add_months("od", 1).alias("plus_month"),
        F.last_day("od").alias("month_end"),
        F.when(F.col("od") == F.last_day("od"), 1).otherwise(0).alias(
            "is_month_end"
        ),
    )
    return (
        e.groupBy(F.col("plus_month").alias("month_later"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("is_month_end").cast("bigint").alias("n_from_month_end"),
            F.min("od").alias("min_src_day"),
            F.max("od").alias("max_src_day"),
        )
        .orderBy("month_later")
    )


@register(
    "mann_whitney_u_orders",
    oracle="""
    WITH pool AS (
      SELECT o_totalprice AS v,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS grp
      FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
    vals AS (
      SELECT v, COUNT(*) AS cnt, SUM(grp) AS n_a_at_v FROM pool GROUP BY v),
    ranked AS (
      SELECT v, cnt, n_a_at_v,
             COALESCE(SUM(cnt) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
      FROM vals),
    r2 AS (
      SELECT CAST(SUM(n_a_at_v * (2 * below + cnt + 1)) AS BIGINT) AS r2_a,
             CAST(SUM(n_a_at_v) AS BIGINT) AS n_a,
             CAST(SUM(cnt - n_a_at_v) AS BIGINT) AS n_b
      FROM ranked)
    SELECT n_a, n_b, r2_a,
           CAST(r2_a - n_a * (n_a + 1) AS BIGINT) AS u2_a,
           ROUND((CAST(r2_a - n_a * (n_a + 1) AS DOUBLE) / 2 -
                  CAST(n_a * n_b AS DOUBLE) / 2) /
                 SQRT(CAST(n_a AS DOUBLE) * n_b * (n_a + n_b + 1) / 12), 6)
             AS z_score
    FROM r2
    """,
)
def mann_whitney_u_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) between urgent and low-priority
    order totals — the nonparametric two-sample test that complements
    the KS statistic. Tied values get average ranks computed exactly:
    doubled rank sums (2*below + cnt + 1 per tied block) stay integer
    until the final z-score, whose variance uses the no-tie normal
    approximation (documented; ties in o_totalprice are measure-zero).
    One grouped scan + one cumulative window over distinct values —
    rank computation without sorting the raw rows twice."""
    o = _t(spark, sf_dir, "orders")
    pool = o.filter(
        F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
    ).select(
        F.col("o_totalprice").alias("v"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0)
        .alias("grp"),
    )
    vals = pool.groupBy("v").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("grp").alias("n_a_at_v")
    )
    wv = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    ranked = vals.select(
        "v",
        "cnt",
        "n_a_at_v",
        F.coalesce(F.sum("cnt").over(wv), F.lit(0)).alias("below"),
    )
    r2 = ranked.agg(
        F.sum(
            F.col("n_a_at_v") * (2 * F.col("below") + F.col("cnt") + 1)
        )
        .cast("bigint")
        .alias("r2_a"),
        F.sum("n_a_at_v").cast("bigint").alias("n_a"),
        F.sum(F.col("cnt") - F.col("n_a_at_v")).cast("bigint").alias("n_b"),
    )
    return r2.select(
        "n_a",
        "n_b",
        "r2_a",
        (F.col("r2_a") - F.col("n_a") * (F.col("n_a") + 1))
        .cast("bigint")
        .alias("u2_a"),
        F.round(
            (
                (F.col("r2_a") - F.col("n_a") * (F.col("n_a") + 1)).cast(
                    "double"
                )
                / 2
                - (F.col("n_a") * F.col("n_b")).cast("double") / 2
            )
            / F.sqrt(
                F.col("n_a").cast("double")
                * F.col("n_b")
                * (F.col("n_a") + F.col("n_b") + 1)
                / 12
            ),
            6,
        ).alias("z_score"),
    )


@register(
    "chi_square_independence",
    oracle="""
    WITH cells AS (
      SELECT o_orderpriority AS pr, o_orderstatus AS st, COUNT(*) AS o
      FROM orders GROUP BY pr, st),
    tot AS (
      SELECT pr, st, o,
             SUM(o) OVER (PARTITION BY pr) AS r,
             SUM(o) OVER (PARTITION BY st) AS c,
             SUM(o) OVER () AS n
      FROM cells),
    terms AS (
      SELECT pr, st,
             CAST((o * n - r * c) AS DOUBLE) * (o * n - r * c) /
             (CAST(n AS DOUBLE) * r * c) AS term,
             n
      FROM tot),
    folded AS (
      SELECT MAX(n) AS n,
             (SELECT COUNT(DISTINCT pr) FROM cells) AS nr,
             (SELECT COUNT(DISTINCT st) FROM cells) AS nc,
             list_reduce(list(term ORDER BY pr, st), (a, b) -> a + b)
               AS chi2
      FROM terms)
    SELECT CAST(n AS BIGINT) AS n,
           CAST((nr - 1) * (nc - 1) AS INT) AS dof,
           ROUND(chi2, 6) AS chi_square
    FROM folded
    """,
)
def chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square test of independence (order priority x status):
    each cell's term is computed from EXACT integer observed/marginal
    counts as (On - rc)^2 / (n r c), and the ~20 terms fold in fixed
    (priority, status) order on both engines so the float sum is
    order-identical. Marginals come from windows over the cell
    aggregate — one scan, no second pass."""
    o = _t(spark, sf_dir, "orders")
    cells = o.groupBy(
        F.col("o_orderpriority").alias("pr"),
        F.col("o_orderstatus").alias("st"),
    ).agg(F.count(F.lit(1)).alias("o"))
    wr = Window.partitionBy("pr")
    wc = Window.partitionBy("st")
    wg = Window.partitionBy()
    tot = cells.select(
        "pr",
        "st",
        "o",
        F.sum("o").over(wr).alias("r"),
        F.sum("o").over(wc).alias("c"),
        F.sum("o").over(wg).alias("n"),
    )
    terms = tot.select(
        "pr",
        "st",
        "n",
        (
            (F.col("o") * F.col("n") - F.col("r") * F.col("c")).cast("double")
            * (F.col("o") * F.col("n") - F.col("r") * F.col("c"))
            / (F.col("n").cast("double") * F.col("r") * F.col("c"))
        ).alias("term"),
    )
    folded = terms.agg(
        F.max("n").cast("bigint").alias("n"),
        F.countDistinct("pr").alias("nr"),
        F.countDistinct("st").alias("nc"),
        F.expr(
            "aggregate(array_sort(collect_list(struct(pr, st, term))), "
            "cast(0 as double), (acc, e) -> acc + e.term)"
        ).alias("chi2"),
    )
    return folded.select(
        "n",
        ((F.col("nr") - 1) * (F.col("nc") - 1)).cast("int").alias("dof"),
        F.round("chi2", 6).alias("chi_square"),
    )


@register(
    "embedding_gram_matrix",
    oracle="""
    WITH q AS (
      SELECT vec_id,
             [GREATEST(CAST(ROUND(CAST(x AS DOUBLE) * 64, 0) AS INT) + 128, 0)
              FOR x IN embedding] AS qv
      FROM embeddings),
    dims AS (
      SELECT vec_id, CAST(pos0 AS INT) AS i, val
      FROM (SELECT vec_id, unnest(qv) AS val,
                   unnest(range(0, len(qv))) AS pos0 FROM q)
      WHERE pos0 < 8),
    gram AS (
      SELECT a.i AS row_i, b.i AS col_j,
             SUM(CAST(a.val AS BIGINT) * b.val) AS dot
      FROM dims a JOIN dims b
        ON b.vec_id = a.vec_id AND b.i >= a.i
      GROUP BY a.i, b.i)
    SELECT row_i, col_j, CAST(dot AS BIGINT) AS dot
    FROM gram ORDER BY row_i, col_j
    """,
)
def embedding_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Gram-matrix accumulation (X^T X — the kernel behind
    covariance, PCA, and linear-model normal equations at scale): each
    vector contributes its dimension outer product map-side, partial
    sums combine before the (i, j) shuffle, and no n x n object ever
    exists — state is d(d+1)/2 cells regardless of row count. Computed
    over the first 8 quantized dimensions (36 upper-triangle cells) in
    exact integer arithmetic."""
    emb = _t(spark, sf_dir, "embeddings")
    q = sim_mod.quantize_for_kmeans(emb, "vec_id", "embedding")
    dims = (
        q.select("vec_id", F.posexplode("qv").alias("i", "val"))
        .filter(F.col("i") < 8)
        .select("vec_id", F.col("i").cast("int").alias("i"), "val")
    )
    a = dims.alias("a")
    b = dims.select(
        F.col("vec_id").alias("bv"),
        F.col("i").alias("j"),
        F.col("val").alias("bval"),
    )
    return (
        a.join(b, (F.col("bv") == F.col("a.vec_id")) & (F.col("j") >= F.col("a.i")))
        .groupBy(F.col("a.i").alias("row_i"), F.col("j").alias("col_j"))
        .agg(
            F.sum(F.col("a.val").cast("bigint") * F.col("bval"))
            .cast("bigint")
            .alias("dot")
        )
        .orderBy("row_i", "col_j")
    )


@register(
    "attribution_time_decay",
    oracle="""
    WITH p AS (
      SELECT user_id, event_id AS purchase_id, ts AS pts, value
      FROM events WHERE event_type = 'purchase'),
    touch AS (
      SELECT p.purchase_id, p.value, c.event_id AS click_id,
             CAST(1 AS BIGINT) <<
               (20 - LEAST((epoch_ms(p.pts) - epoch_ms(c.ts)) //
                           43200000, 20)) AS w
      FROM p JOIN events c
        ON c.event_type = 'click' AND c.user_id = p.user_id
       AND c.ts <= p.pts AND c.ts >= p.pts - INTERVAL 10 DAY),
    norm AS (
      SELECT purchase_id, value, click_id, w,
             SUM(w) OVER (PARTITION BY purchase_id) AS wsum
      FROM touch),
    credit AS (
      SELECT click_id,
             ROUND(list_reduce(
               list(CAST(value AS DOUBLE) * w / wsum ORDER BY purchase_id),
               (a, b) -> a + b), 6) AS credited_value,
             COUNT(*) AS n_purchases
      FROM norm GROUP BY click_id)
    SELECT click_id, credited_value, n_purchases
    FROM (SELECT *, ROW_NUMBER() OVER (
            ORDER BY credited_value DESC, click_id) AS rn FROM credit)
    WHERE rn <= 20 ORDER BY credited_value DESC, click_id
    """,
)
def attribution_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decay multi-touch attribution: each purchase's value splits
    over its preceding 10 days of clicks with half-life-12h weights —
    and the decay weights are EXACT powers of two (1 << (20 - age/12h)),
    so the per-purchase weight normalization is integer/decimal-exact
    rational arithmetic, not a drifting exp(). The scale shape is the
    bounded-interval join (equi on user, 10-day range) plus one window
    per purchase."""
    ev = _t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("pts"),
        "value",
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("cts"),
    )
    touch = p.join(
        c,
        (F.col("cu") == F.col("user_id"))
        & (F.col("cts") <= F.col("pts"))
        & (F.col("cts") >= F.col("pts") - F.expr("INTERVAL 10 DAYS")),
    ).select(
        "purchase_id",
        "value",
        "click_id",
        F.expr(
            "shiftleft(CAST(1 AS BIGINT), "
            "20 - CAST(LEAST((unix_millis(pts) - unix_millis(cts)) div 43200000, "
            "20) AS INT))"
        ).alias("w"),
    )
    wn = Window.partitionBy("purchase_id")
    norm = touch.select(
        "purchase_id",
        "value",
        "click_id",
        "w",
        F.sum("w").over(wn).alias("wsum"),
    )
    # per-touch terms are doubles ((value * w) / wsum — identical op
    # order both engines) folded purchase-ascending so the float sum is
    # order-identical; decimal division would round at engine-specific
    # internal scales and drift in the 6th decimal
    credit = norm.groupBy("click_id").agg(
        F.round(
            F.expr(
                "aggregate(array_sort(collect_list(struct(purchase_id, "
                "CAST(value AS DOUBLE) * w / wsum AS term))), "
                "cast(0 as double), (acc, e) -> acc + e.term)"
            ),
            6,
        ).alias("credited_value"),
        F.count(F.lit(1)).alias("n_purchases"),
    )
    wr = Window.orderBy(F.desc("credited_value"), "click_id")
    return (
        credit.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= 20)
        .select("click_id", "credited_value", "n_purchases")
        .orderBy(F.desc("credited_value"), "click_id")
    )


@register(
    "gapped_sequence_support",
    oracle="""
    WITH pos AS (
      SELECT user_id, event_type,
             MIN(ts) AS first_ts, MAX(ts) AS last_ts
      FROM events GROUP BY user_id, event_type),
    pairs AS (
      SELECT a.event_type AS t1, b.event_type AS t2,
             COUNT(*) AS support
      FROM pos a JOIN pos b
        ON b.user_id = a.user_id AND b.event_type <> a.event_type
      WHERE a.first_ts < b.last_ts
      GROUP BY a.event_type, b.event_type)
    SELECT t1, t2, CAST(support AS BIGINT) AS support
    FROM pairs ORDER BY support DESC, t1, t2
    LIMIT 20
    """,
)
def gapped_sequence_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gapped sequential-pattern support (the PrefixSpan counting core):
    for every ordered type pair (X, Y), the number of users with SOME X
    before SOME Y — decided exactly by first(X) < last(Y), so the whole
    gapped-containment check collapses to one (user, type) min/max
    aggregate and a per-user type self-join (|types|² rows per user,
    never the event sequence itself)."""
    ev = _t(spark, sf_dir, "events")
    pos = ev.groupBy("user_id", "event_type").agg(
        F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts")
    )
    a = pos.select(
        "user_id", F.col("event_type").alias("t1"), "first_ts"
    )
    b = pos.select(
        F.col("user_id").alias("ub"),
        F.col("event_type").alias("t2"),
        "last_ts",
    )
    return (
        a.join(
            b,
            (F.col("ub") == F.col("user_id"))
            & (F.col("t1") != F.col("t2"))
            & (F.col("first_ts") < F.col("last_ts")),
        )
        .groupBy("t1", "t2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("support"))
        .orderBy(F.desc("support"), "t1", "t2")
        .limit(20)
    )


def _rrf_fusion_oracle() -> str:
    bm25 = _bm25_oracle(topn=15)
    vdot = (
        "list_dot_product([CAST(x AS DOUBLE) FOR x IN {a}], "
        "[CAST(x AS DOUBLE) FOR x IN {b}])"
    )
    return f"""
    WITH bm_raw AS ({bm25}),
    bm AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS rnk
      FROM bm_raw),
    q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    cs_raw AS (
      SELECT e.vec_id AS doc_id,
             {vdot.format(a="q.qv", b="e.embedding")} /
             (sqrt({vdot.format(a="q.qv", b="q.qv")}) *
              sqrt({vdot.format(a="e.embedding", b="e.embedding")})) AS cos
      FROM embeddings e, q WHERE e.vec_id <> 0),
    cs AS (
      SELECT doc_id, rnk FROM (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY cos DESC, doc_id) AS rnk
        FROM cs_raw) WHERE rnk <= 15),
    fused AS (
      SELECT COALESCE(bm.doc_id, cs.doc_id) AS doc_id,
             COALESCE(1000000 // (60 + bm.rnk), 0) +
             COALESCE(1000000 // (60 + cs.rnk), 0) AS rrf
      FROM bm FULL OUTER JOIN cs ON cs.doc_id = bm.doc_id)
    SELECT doc_id, CAST(rrf AS BIGINT) AS rrf_score
    FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id) AS rn
          FROM fused)
    WHERE rn <= 10 ORDER BY rrf_score DESC, doc_id
    """


@register("hybrid_rrf_fusion", oracle=_rrf_fusion_oracle())
def hybrid_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HYBRID retrieval — reciprocal-rank fusion of the lexical (BM25
    top-15 for the fixed query) and semantic (exact cosine top-15 for
    probe vector 0) rankings, the standard two-tower search merge. RRF
    contributions are integers (1000000 div (60 + rank)) so the fusion
    itself is exact; both input rankings are the already-value-checked
    scorers, composed. Full-outer on doc id: appearing in either list
    scores, appearing in both wins."""
    bm_raw = bm25_search_topk(spark, sf_dir)
    wb = Window.orderBy(F.desc("bm25"), "doc_id")
    bm = bm_raw.withColumn("rnk", F.row_number().over(wb)).select(
        F.col("doc_id").alias("bd"), F.col("rnk").alias("brnk")
    )
    emb = _t(spark, sf_dir, "embeddings")
    cs = sim_mod.cosine_topk(
        emb, emb.filter(F.col("vec_id") == 0), k=15
    ).select(F.col("neighbor_id").alias("cd"), F.col("rank").alias("crnk"))
    fused = bm.join(cs, F.col("cd") == F.col("bd"), "full_outer").select(
        F.coalesce(F.col("bd"), F.col("cd")).alias("doc_id"),
        (
            F.coalesce(F.expr("1000000 div (60 + brnk)"), F.lit(0))
            + F.coalesce(F.expr("1000000 div (60 + crnk)"), F.lit(0))
        ).alias("rrf"),
    )
    wr = Window.orderBy(F.desc("rrf"), "doc_id")
    return (
        fused.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= 10)
        .select("doc_id", F.col("rrf").cast("bigint").alias("rrf_score"))
        .orderBy(F.desc("rrf_score"), "doc_id")
    )


@register(
    "apriori_triple_itemsets",
    oracle="""
    WITH baskets AS (
      SELECT DISTINCT l.l_orderkey AS o, p.p_brand AS b
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
    pairs AS (
      SELECT a.b AS b1, c.b AS b2, COUNT(*) AS sup
      FROM baskets a JOIN baskets c ON c.o = a.o AND a.b < c.b
      GROUP BY a.b, c.b HAVING COUNT(*) >= 3),
    cand AS (
      SELECT p1.b1, p1.b2, p2.b2 AS b3
      FROM pairs p1 JOIN pairs p2
        ON p2.b1 = p1.b1 AND p2.b2 > p1.b2
      WHERE EXISTS (SELECT 1 FROM pairs p3
                    WHERE p3.b1 = p1.b2 AND p3.b2 = p2.b2)),
    triples AS (
      SELECT c.b1, c.b2, c.b3, COUNT(*) AS support
      FROM cand c
      JOIN baskets x ON x.b = c.b1
      JOIN baskets y ON y.o = x.o AND y.b = c.b2
      JOIN baskets z ON z.o = x.o AND z.b = c.b3
      GROUP BY c.b1, c.b2, c.b3 HAVING COUNT(*) >= 3)
    SELECT b1, b2, b3, CAST(support AS BIGINT) AS support
    FROM triples ORDER BY support DESC, b1, b2, b3
    LIMIT 20
    """,
)
def apriori_triple_itemsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent 3-itemset mining with the A-Priori candidate prune: only
    brand triples whose THREE constituent pairs are all frequent
    (support >= 3) get counted — the downward-closure pruning that keeps
    candidate explosion polynomial at scale. Candidate generation is the
    classic prefix self-join of the frequent-pair list (small, shuffles
    on brand), and support counting re-probes the basket table three
    times on (order, brand) — never an all-triples enumeration."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    baskets = (
        li.join(
            F.broadcast(part.select("p_partkey", "p_brand")),
            li.l_partkey == F.col("p_partkey"),
        )
        .select(F.col("l_orderkey").alias("o"), F.col("p_brand").alias("b"))
        .distinct()
    )
    baskets = op_cache.track(baskets.cache())
    a = baskets.alias("a")
    c = baskets.alias("c")
    pairs = (
        a.join(c, (F.col("c.o") == F.col("a.o")) & (F.col("a.b") < F.col("c.b")))
        .groupBy(F.col("a.b").alias("b1"), F.col("c.b").alias("b2"))
        .agg(F.count(F.lit(1)).alias("sup"))
        .filter(F.col("sup") >= 3)
        .select("b1", "b2")
    )
    pairs = op_cache.track(pairs.cache())
    p1 = pairs.alias("p1")
    p2 = pairs.select(
        F.col("b1").alias("q1"), F.col("b2").alias("b3")
    ).alias("p2")
    cand = p1.join(
        p2, (F.col("q1") == F.col("p1.b1")) & (F.col("b3") > F.col("p1.b2"))
    ).join(
        pairs.select(
            F.col("b1").alias("e1"), F.col("b2").alias("e2")
        ),
        (F.col("e1") == F.col("p1.b2")) & (F.col("e2") == F.col("b3")),
        "left_semi",
    ).select("b1", "b2", "b3")
    x = baskets.select(F.col("o"), F.col("b").alias("xb"))
    y = baskets.select(F.col("o").alias("oy"), F.col("b").alias("yb"))
    z = baskets.select(F.col("o").alias("oz"), F.col("b").alias("zb"))
    triples = (
        F.broadcast(cand)
        .join(x, F.col("xb") == F.col("b1"))
        .join(y, (F.col("oy") == F.col("o")) & (F.col("yb") == F.col("b2")))
        .join(z, (F.col("oz") == F.col("o")) & (F.col("zb") == F.col("b3")))
        .groupBy("b1", "b2", "b3")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= 3)
    )
    return (
        triples.select(
            "b1", "b2", "b3", F.col("support").cast("bigint").alias("support")
        )
        .orderBy(F.desc("support"), "b1", "b2", "b3")
        .limit(20)
    )


@register(
    "incremental_join_maintenance",
    oracle="""
    WITH a_old AS (SELECT o_orderkey, o_totalprice FROM orders
                   WHERE o_orderdate < TIMESTAMP '1996-01-01'),
    a_new AS (SELECT o_orderkey, o_totalprice FROM orders
              WHERE o_orderdate >= TIMESTAMP '1996-01-01'),
    b_old AS (SELECT l_orderkey, l_extendedprice FROM lineitem
              WHERE l_shipdate < TIMESTAMP '1996-01-01'),
    b_new AS (SELECT l_orderkey, l_extendedprice FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1996-01-01'),
    base AS (
      SELECT COUNT(*) AS n,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
      FROM a_old JOIN b_old ON b_old.l_orderkey = a_old.o_orderkey),
    d1 AS (
      SELECT COUNT(*) AS n,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
      FROM a_new JOIN b_old ON b_old.l_orderkey = a_new.o_orderkey),
    d2 AS (
      SELECT COUNT(*) AS n,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
      FROM a_old JOIN b_new ON b_new.l_orderkey = a_old.o_orderkey),
    d3 AS (
      SELECT COUNT(*) AS n,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
      FROM a_new JOIN b_new ON b_new.l_orderkey = a_new.o_orderkey),
    direct AS (
      SELECT COUNT(*) AS n,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey)
    SELECT base.n AS base_rows,
           CAST(d1.n + d2.n + d3.n AS BIGINT) AS delta_rows,
           CAST(base.n + d1.n + d2.n + d3.n AS BIGINT) AS maintained_rows,
           (SELECT n FROM direct) AS direct_rows,
           CAST(ROUND(base.rev + d1.rev + d2.rev + d3.rev, 2) AS DOUBLE)
             AS maintained_rev,
           CAST(ROUND((SELECT rev FROM direct), 2) AS DOUBLE) AS direct_rev
    FROM base, d1, d2, d3
    """,
)
def incremental_join_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental JOIN-view maintenance algebra: with both sides split
    into old/delta partitions, the maintained view is base(A⋈B) plus the
    three delta terms ΔA⋈B, A⋈ΔB, ΔA⋈ΔB — verified against the direct
    full join in the same result row. At 100 TB the three delta joins
    touch only delta-sized inputs on one side, which is why materialized
    join views refresh in minutes, not hours. DECIMAL revenue makes the
    equality exact, not approximate."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    cut = F.lit("1996-01-01").cast("timestamp")
    a_old = o.filter(F.col("o_orderdate") < cut).select(
        "o_orderkey", "o_totalprice"
    )
    a_new = o.filter(F.col("o_orderdate") >= cut).select(
        "o_orderkey", "o_totalprice"
    )
    b_old = li.filter(F.col("l_shipdate") < cut).select(
        "l_orderkey", "l_extendedprice"
    )
    b_new = li.filter(F.col("l_shipdate") >= cut).select(
        "l_orderkey", "l_extendedprice"
    )

    def jstats(a, b, nn, rn):
        return a.join(b, b.l_orderkey == a.o_orderkey).agg(
            F.count(F.lit(1)).alias(nn),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias(rn),
        )

    base = jstats(a_old, b_old, "bn", "br")
    d1 = jstats(a_new, b_old, "n1", "r1")
    d2 = jstats(a_old, b_new, "n2", "r2")
    d3 = jstats(a_new, b_new, "n3", "r3")
    direct = o.join(li, li.l_orderkey == o.o_orderkey).agg(
        F.count(F.lit(1)).alias("dn"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("dr"),
    )
    return (
        base.crossJoin(F.broadcast(d1))
        .crossJoin(F.broadcast(d2))
        .crossJoin(F.broadcast(d3))
        .crossJoin(F.broadcast(direct))
        .select(
            F.col("bn").alias("base_rows"),
            (F.col("n1") + F.col("n2") + F.col("n3"))
            .cast("bigint")
            .alias("delta_rows"),
            (F.col("bn") + F.col("n1") + F.col("n2") + F.col("n3"))
            .cast("bigint")
            .alias("maintained_rows"),
            F.col("dn").alias("direct_rows"),
            F.round(
                F.col("br") + F.col("r1") + F.col("r2") + F.col("r3"), 2
            )
            .cast("double")
            .alias("maintained_rev"),
            F.round(F.col("dr"), 2).cast("double").alias("direct_rev"),
        )
    )


_TEXTRANK_EDGES = """
      SELECT DISTINCT w1 AS src, w2 AS dst FROM (
        SELECT words[i] AS w1, words[i + 1] AS w2
        FROM (SELECT string_split_regex(regexp_replace(lower(trim(text)),
                                                       '\\s+', ' ', 'g'),
                                        ' ') AS words
              FROM documents) t,
             UNNEST(range(1, len(words))) AS u(i))
      WHERE w1 < w2"""

_TEXTRANK_FINAL = """
    SELECT node AS word, rank AS rank_scaled FROM (
      SELECT node, rank,
             ROW_NUMBER() OVER (ORDER BY rank DESC, node) AS rn
      FROM {prev})
    WHERE rn <= 20 ORDER BY rank_scaled DESC, word"""


@register(
    "textrank_keywords",
    oracle=_pagerank_oracle(
        iterations=3, edges_sql=_TEXTRANK_EDGES, final_sql=_TEXTRANK_FINAL
    ),
)
def textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword extraction: PageRank over the word-adjacency
    graph (distinct canonical adjacent-word pairs across the corpus),
    three exact scaled-integer rounds, top-20 words — the unsupervised
    keyword ranker, sharing the verified Pregel machinery and its
    round-unrolled oracle via the parameterized builder."""
    from .operators import graph as graph_mod

    docs = _t(spark, sf_dir, "documents")
    words = docs.select(
        F.split(
            F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "), " "
        ).alias("words")
    )
    pairs = words.select(
        F.explode(
            F.expr(
                "transform(sequence(0, size(words) - 2), "
                "i -> struct(words[i] AS w1, words[i + 1] AS w2))"
            )
        ).alias("p")
    ).select(F.col("p.w1").alias("src"), F.col("p.w2").alias("dst"))
    edges = (
        pairs.filter(F.col("src") < F.col("dst")).distinct()
    )
    pr = graph_mod.pagerank(edges, iterations=3)
    w = Window.orderBy(F.desc("rank_scaled"), "node")
    return (
        pr.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select(F.col("node").alias("word"), "rank_scaled")
        .orderBy(F.desc("rank_scaled"), "word")
    )


@register(
    "running_distinct_users",
    oracle="""
    WITH firsts AS (
      SELECT user_id, CAST(MIN(ts) AS DATE) AS first_day FROM events
      GROUP BY user_id),
    daily_new AS (
      SELECT first_day AS d, COUNT(*) AS n_new FROM firsts GROUP BY first_day),
    days AS (SELECT DISTINCT CAST(ts AS DATE) AS d FROM events)
    SELECT CAST(days.d AS TIMESTAMP) AS day,
           CAST(COALESCE(n_new, 0) AS BIGINT) AS n_new_users,
           CAST(SUM(COALESCE(n_new, 0)) OVER (ORDER BY days.d) AS BIGINT)
             AS cumulative_users
    FROM days LEFT JOIN daily_new ON daily_new.d = days.d
    ORDER BY day
    """,
)
def running_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users (the acquisition curve): running
    COUNT(DISTINCT) made scalable by the first-occurrence trick — each
    user counts only on their first-seen day, so the curve is a plain
    running SUM over daily new-user counts. No per-day distinct state,
    no quadratic window; the exact pattern that replaces 'cumulative
    distinct' at 100 TB."""
    ev = _t(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.to_date(F.min("ts")).alias("first_day")
    )
    daily_new = firsts.groupBy(F.col("first_day").alias("d")).agg(
        F.count(F.lit(1)).alias("n_new")
    )
    days = ev.select(F.to_date("ts").alias("d")).distinct()
    wc = Window.orderBy("d")
    return (
        days.join(daily_new, "d", "left")
        .select(
            F.col("d").cast("timestamp").alias("day"),
            F.coalesce("n_new", F.lit(0)).cast("bigint").alias("n_new_users"),
            F.sum(F.coalesce("n_new", F.lit(0)))
            .over(wc)
            .cast("bigint")
            .alias("cumulative_users"),
        )
        .orderBy("day")
    )


@register(
    "skew_hotkey_split_join",
    oracle="""
    WITH j AS (
      SELECT e.user_id, e.value, c.c_mktsegment
      FROM events e JOIN customer c ON c.c_custkey = e.user_id % 100 + 1)
    SELECT c_mktsegment AS segment,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 4) AS sum_value
    FROM j GROUP BY c_mktsegment ORDER BY segment
    """,
)
def skew_hotkey_split_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key isolation join (the third skew weapon next to salting and
    AQE): keys above the hot threshold join via a broadcast of the hot
    dimension SLICE — the skewed mass never shuffles — while the cold
    tail takes the normal shuffle join; union of the two is provably the
    plain join, which is exactly what the oracle computes. The folded
    key (user_id % 100) manufactures genuine hot keys from the events
    table."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "value",
        (F.col("user_id") % 100 + 1).alias("k"),
    )
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"), "c_mktsegment"
    )
    joined = skew_mod.hotkey_split_join(ev, cust, key="k", hot_threshold=50)
    return (
        joined.groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .orderBy("segment")
    )


@register(
    "weighted_median_discount",
    oracle="""
    WITH g AS (
      SELECT l_discount AS v, CAST(SUM(l_quantity) AS BIGINT) AS w
      FROM lineitem GROUP BY l_discount),
    c AS (
      SELECT v, w,
             SUM(w) OVER (ORDER BY v) AS cum,
             SUM(w) OVER () AS total
      FROM g)
    SELECT MIN(v) AS weighted_median_discount,
           CAST(MAX(total) AS BIGINT) AS total_weight
    FROM c WHERE 2 * cum >= total
    """,
)
def weighted_median_discount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median (quantity-weighted median discount): group by
    value, cumulative integer weights over the value order, first value
    whose doubled cumulative weight reaches the total — a pure selection
    on exact integers, no interpolation to disagree on. The grouped
    pre-aggregation means the window runs over distinct values (tiny),
    not the fact table."""
    li = _t(spark, sf_dir, "lineitem")
    g = li.groupBy(F.col("l_discount").alias("v")).agg(
        F.sum("l_quantity").cast("bigint").alias("w")
    )
    wv = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    wg = Window.partitionBy()
    c = g.select(
        "v",
        F.sum("w").over(wv).alias("cum"),
        F.sum("w").over(wg).alias("total"),
    )
    return c.filter(2 * F.col("cum") >= F.col("total")).agg(
        F.min("v").alias("weighted_median_discount"),
        F.max("total").cast("bigint").alias("total_weight"),
    )


@register(
    "filtered_ann_search",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, embedding AS q_vec, label
               FROM embeddings WHERE vec_id < 5),
    scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             list_dot_product([CAST(x AS DOUBLE) FOR x IN q.q_vec],
                              [CAST(x AS DOUBLE) FOR x IN e.embedding]) /
             (sqrt(list_dot_product([CAST(x AS DOUBLE) FOR x IN q.q_vec],
                                    [CAST(x AS DOUBLE) FOR x IN q.q_vec])) *
              sqrt(list_dot_product([CAST(x AS DOUBLE) FOR x IN e.embedding],
                                    [CAST(x AS DOUBLE) FOR x IN e.embedding])))
               AS cos
      FROM embeddings e CROSS JOIN q
      WHERE e.vec_id <> q.query_id AND e.label = q.label)
    SELECT query_id, neighbor_id, rank, ROUND(cos, 6) AS cosine FROM (
      SELECT query_id, neighbor_id, cos,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, neighbor_id) AS rank
      FROM scored) t
    WHERE rank <= 3 ORDER BY query_id, rank
    """,
)
def filtered_ann_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED vector search — top-k neighbors restricted to candidates
    sharing the probe's metadata label, the constraint that breaks naive
    post-filtering ANN (filter first, then rank: pre-filtering keeps k
    results guaranteed; post-filtering an unfiltered top-k can return
    fewer than k). Implemented as the IVF path with the label predicate
    pushed INTO the candidate scan; nprobe = all lists keeps the oracle
    exhaustive so the filtered ranking itself is what's verified."""
    emb = _t(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qv"),
        F.col("label").alias("qlabel"),
    )
    cand = emb.join(
        F.broadcast(qs),
        (F.col("label") == F.col("qlabel")) & (F.col("vec_id") != F.col("qid")),
    )
    cos = sim_mod.cosine(F.col("qv"), F.col("embedding"))
    scored = cand.select(
        F.col("qid").alias("query_id"),
        F.col("vec_id").alias("neighbor_id"),
        cos.alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.round("cos", 6).alias("cosine"),
        )
        .orderBy("query_id", "rank")
    )


@register(
    "t_closeness_audit",
    oracle="""
    WITH cls AS (
      SELECT n.n_name AS nation, c.c_mktsegment AS seg,
             o.o_orderpriority AS pr, COUNT(*) AS n
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY 1, 2, 3),
    cls_tot AS (
      SELECT nation, seg, SUM(n) AS cn FROM cls GROUP BY nation, seg),
    gdist AS (SELECT pr, SUM(n) AS g FROM cls GROUP BY pr),
    gtot AS (SELECT SUM(g) AS gt FROM gdist),
    -- per class and priority (ordered domain): |cumulative difference|
    -- of the scaled distributions, summed = EMD * cn * gt (exact int)
    full_grid AS (
      SELECT ct.nation, ct.seg, ct.cn, gl.pr, gl.g,
             COALESCE(c2.n, 0) AS n
      FROM cls_tot ct CROSS JOIN gdist gl
      LEFT JOIN cls c2 ON c2.nation = ct.nation AND c2.seg = ct.seg
                      AND c2.pr = gl.pr),
    cums AS (
      SELECT nation, seg, cn, pr,
             SUM(n * (SELECT gt FROM gtot) - cn * g)
               OVER (PARTITION BY nation, seg ORDER BY pr) AS cd
      FROM full_grid),
    emd AS (
      SELECT nation, seg, MAX(cn) AS class_size,
             CAST(SUM(ABS(cd)) AS BIGINT) AS emd_scaled
      FROM cums GROUP BY nation, seg)
    SELECT nation, seg, CAST(class_size AS BIGINT) AS class_size,
           emd_scaled,
           ROUND(CAST(emd_scaled AS DOUBLE) /
                 (4 * class_size * (SELECT gt FROM gtot)), 6) AS t_value
    FROM emd
    ORDER BY t_value DESC, nation, seg
    LIMIT 20
    """,
)
def t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness — the third privacy gate after k-anonymity and
    l-diversity: for each quasi-identifier class (nation, segment), the
    earth-mover's distance between its order-priority distribution and
    the global one, over the ordered 5-value domain. EMD on an ordered
    domain is the sum of |cumulative differences| — computed here on
    integer-scaled counts (n*GT - cn*g), so the distance is exact until
    one final normalized division (the /4 divides by the max cumulative
    span, putting t in [0,1]). Top-20 worst classes."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    cls = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.col("c_mktsegment").alias("seg"),
            F.col("o_orderpriority").alias("pr"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    cls = op_cache.track(cls.cache())
    cls_tot = cls.groupBy("nation", "seg").agg(F.sum("cnt").alias("cn"))
    glob = cls.groupBy("pr").agg(F.sum("cnt").alias("g"))
    gt = glob.agg(F.sum("g").alias("gt"))
    grid = (
        cls_tot.crossJoin(F.broadcast(glob))
        .join(
            cls.select(
                F.col("nation").alias("n2"),
                F.col("seg").alias("s2"),
                F.col("pr").alias("p2"),
                "cnt",
            ),
            (F.col("n2") == F.col("nation"))
            & (F.col("s2") == F.col("seg"))
            & (F.col("p2") == F.col("pr")),
            "left",
        )
        .crossJoin(F.broadcast(gt))
        .select(
            "nation",
            "seg",
            "cn",
            "pr",
            "g",
            "gt",
            F.coalesce("cnt", F.lit(0)).alias("n"),
        )
    )
    wc = Window.partitionBy("nation", "seg").orderBy("pr")
    cums = grid.select(
        "nation",
        "seg",
        "cn",
        "gt",
        F.sum(
            F.col("n") * F.col("gt") - F.col("cn") * F.col("g")
        )
        .over(wc)
        .alias("cd"),
    )
    emd = cums.groupBy("nation", "seg").agg(
        F.max("cn").alias("class_size"),
        F.sum(F.abs("cd")).cast("bigint").alias("emd_scaled"),
        F.max("gt").alias("gt"),
    )
    w = Window.orderBy(F.desc("t_value"), "nation", "seg")
    scored = emd.select(
        "nation",
        "seg",
        F.col("class_size").cast("bigint").alias("class_size"),
        "emd_scaled",
        F.round(
            F.col("emd_scaled").cast("double")
            / (F.lit(4) * F.col("class_size") * F.col("gt")),
            6,
        ).alias("t_value"),
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .drop("rn")
        .orderBy(F.desc("t_value"), "nation", "seg")
    )


@register(
    "group_kfold_assignment",
    oracle="""
    WITH f AS (
      SELECT user_id,
             CAST('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':gf'), 1, 15)
                  AS BIGINT) % 4 AS fold_id
      FROM (SELECT DISTINCT user_id FROM events)),
    ev AS (
      SELECT e.user_id, e.event_id, f.fold_id
      FROM events e JOIN f ON f.user_id = e.user_id)
    SELECT CAST(fold_id AS INT) AS fold_id,
           COUNT(DISTINCT user_id) AS n_users,
           COUNT(*) AS n_events,
           CAST(MIN(user_id) AS BIGINT) AS min_user,
           CAST(MAX(user_id) AS BIGINT) AS max_user
    FROM ev GROUP BY fold_id ORDER BY fold_id
    """,
)
def group_kfold_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP k-fold: folds assigned at the USER level (salted md5 on the
    entity, not the row) so no user's events span folds — the assignment
    that prevents entity leakage in behavioral models, where plain
    row-hash folds silently train and test on the same user. Per-fold
    user/event counts expose the group-size imbalance the trade-off
    costs."""
    ev = _t(spark, sf_dir, "events")
    users = ev.select("user_id").distinct()
    fold = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("user_id").cast("string"), F.lit(":gf"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % 4
    )
    f = users.select("user_id", fold.cast("int").alias("fold_id"))
    return (
        ev.join(F.broadcast(f), "user_id")
        .groupBy("fold_id")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
            F.min("user_id").cast("bigint").alias("min_user"),
            F.max("user_id").cast("bigint").alias("max_user"),
        )
        .orderBy("fold_id")
    )


@register(
    "top_k_with_ties",
    oracle="""
    WITH r AS (
      SELECT o_orderpriority AS priority,
             CAST(FLOOR(o_totalprice / 1000) * 1000 AS BIGINT) AS price_band,
             RANK() OVER (PARTITION BY o_orderpriority
                          ORDER BY CAST(FLOOR(o_totalprice / 1000) AS BIGINT)
                                   DESC) AS rk,
             o_orderkey
      FROM orders)
    SELECT priority, price_band, CAST(rk AS INT) AS rk,
           COUNT(*) AS n_tied
    FROM r WHERE rk <= 3
    GROUP BY priority, price_band, rk
    ORDER BY priority, rk, price_band
    """,
)
def top_k_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k WITH TIES semantics (FETCH FIRST k WITH TIES): RANK over
    banded order totals keeps EVERY row tied at the cutoff — where
    row_number() would arbitrarily drop tied rows, the difference that
    corrupts leaderboards. The bands manufacture real ties; the tied-row
    counts per rank prove they survived."""
    o = _t(spark, sf_dir, "orders")
    band = (F.floor(F.col("o_totalprice") / 1000) * 1000).cast("bigint")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.floor(F.col("o_totalprice") / 1000).cast("bigint").desc()
    )
    r = o.select(
        F.col("o_orderpriority").alias("priority"),
        band.alias("price_band"),
        F.rank().over(w).alias("rk"),
    )
    return (
        r.filter(F.col("rk") <= 3)
        .groupBy("priority", "price_band", F.col("rk").cast("int").alias("rk"))
        .agg(F.count(F.lit(1)).alias("n_tied"))
        .orderBy("priority", "rk", "price_band")
    )


def _hll_intersection_oracle(p: int = 8) -> str:
    m, wbits, rank_sql, alpha = _hll_parts(p)
    raw = (
        f"CAST({alpha} AS DOUBLE) * CAST({m * m} AS DOUBLE) * "
        f"CAST({1 << (wbits + 1)} AS DOUBLE) / CAST(inv_scaled AS DOUBLE)"
    )
    est_expr = f"""
      ROUND(CASE WHEN {raw} <= {25 * m // 10} AND zeros > 0
                 THEN CAST({m} AS DOUBLE) *
                      ln(CAST({m} AS DOUBLE) / CAST(zeros AS DOUBLE))
                 ELSE {raw} END, 4)"""
    return f"""
    WITH h AS (
      SELECT event_type AS g,
             CAST(concat('0x', substring(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
      FROM events WHERE event_type IN ('click', 'purchase')),
    ranked AS (
      SELECT g, hv & {m - 1} AS bucket, (hv >> {p}) AS w FROM h),
    regs AS (
      SELECT g, bucket, MAX({rank_sql}) AS mj
      FROM ranked GROUP BY g, bucket),
    merged AS (
      SELECT 'union' AS g, bucket, MAX(mj) AS mj FROM regs GROUP BY bucket),
    allregs AS (SELECT * FROM regs UNION ALL SELECT * FROM merged),
    scopes AS (SELECT DISTINCT g FROM allregs),
    full_regs AS (
      SELECT sb.g, sb.b AS bucket, COALESCE(r.mj, 0) AS mj
      FROM (SELECT s.g, t.b FROM scopes s,
            (SELECT unnest(range(0, {m})) AS b) t) sb
      LEFT JOIN allregs r ON r.bucket = sb.b AND r.g = sb.g),
    sums AS (
      SELECT g,
             SUM(CAST(1 AS BIGINT) << ({wbits + 1} - mj)) AS inv_scaled,
             SUM(CASE WHEN mj = 0 THEN 1 ELSE 0 END) AS zeros
      FROM full_regs GROUP BY g),
    ests AS (SELECT g, {est_expr} AS est FROM sums),
    wide AS (
      SELECT MAX(CASE WHEN g = 'click' THEN est END) AS est_click,
             MAX(CASE WHEN g = 'purchase' THEN est END) AS est_purchase,
             MAX(CASE WHEN g = 'union' THEN est END) AS est_union
      FROM ests),
    exact AS (
      SELECT COUNT(*) AS exact_intersection FROM (
        SELECT user_id FROM events WHERE event_type = 'click'
        INTERSECT
        SELECT user_id FROM events WHERE event_type = 'purchase'))
    SELECT est_click, est_purchase, est_union,
           ROUND(est_click + est_purchase - est_union, 4)
             AS est_intersection,
           (SELECT CAST(exact_intersection AS BIGINT) FROM exact)
             AS exact_intersection
    FROM wide
    """


@register("hll_intersection_estimate", oracle=_hll_intersection_oracle())
def hll_intersection_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch SET ALGEBRA: HyperLogLog supports union natively (register
    max), so intersections come from inclusion-exclusion — |A∩B| ≈
    est(A) + est(B) - est(A∪B) — the standard audience-overlap estimate,
    with its known error blow-up for small overlaps measured against the
    exact INTERSECT in the same row. All register arithmetic is the
    verified exact-integer HLL; the three estimates and the subtraction
    are the only floats."""
    p = 8
    m, wbits, rank_sql, alpha = _hll_parts(p)
    ev = _t(spark, sf_dir, "events")
    h = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        F.col("event_type").alias("g"),
        F.expr(
            "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 15), 16, 10) AS BIGINT)"
        ).alias("hv"),
    )
    ranked = h.select(
        "g",
        (F.col("hv").bitwiseAND(F.lit(m - 1))).alias("bucket"),
        F.shiftright("hv", p).alias("w"),
    )
    regs = ranked.groupBy("g", "bucket").agg(
        F.expr(f"MAX({rank_sql})").alias("mj")
    )
    regs = op_cache.track(regs.cache())
    merged = regs.groupBy("bucket").agg(F.max("mj").alias("mj")).select(
        F.lit("union").alias("g"), "bucket", "mj"
    )
    allregs = regs.unionByName(merged)
    scopes = allregs.select("g").distinct()
    buckets = spark.range(m).select(F.col("id").alias("bucket"))
    full = (
        scopes.crossJoin(buckets)
        .join(allregs, ["g", "bucket"], "left")
        .select("g", "bucket", F.coalesce("mj", F.lit(0)).alias("mj"))
    )
    sums = full.groupBy("g").agg(
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {wbits + 1} - mj)")
        ).alias("inv_scaled"),
        F.sum(F.when(F.col("mj") == 0, 1).otherwise(0)).alias("zeros"),
    )
    raw = (
        F.lit(float(alpha))
        * F.lit(float(m * m))
        * F.lit(float(1 << (wbits + 1)))
        / F.col("inv_scaled").cast("double")
    )
    est = F.round(
        F.when(
            (raw <= F.lit(25 * m // 10)) & (F.col("zeros") > 0),
            F.lit(float(m))
            * F.log(F.lit(float(m)) / F.col("zeros").cast("double")),
        ).otherwise(raw),
        4,
    )
    ests = sums.select("g", est.alias("est"))
    wide = ests.agg(
        F.max(F.when(F.col("g") == "click", F.col("est"))).alias("est_click"),
        F.max(F.when(F.col("g") == "purchase", F.col("est"))).alias(
            "est_purchase"
        ),
        F.max(F.when(F.col("g") == "union", F.col("est"))).alias("est_union"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id")
    purch = ev.filter(F.col("event_type") == "purchase").select("user_id")
    exact = clicks.intersect(purch).agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_intersection")
    )
    return wide.crossJoin(F.broadcast(exact)).select(
        "est_click",
        "est_purchase",
        "est_union",
        F.round(
            F.col("est_click") + F.col("est_purchase") - F.col("est_union"), 4
        ).alias("est_intersection"),
        "exact_intersection",
    )


@register(
    "conformal_interval_coverage",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2)
                  AS DECIMAL(18,2)) AS rev
      FROM orders GROUP BY 1),
    pred AS (
      SELECT d, rev, LAG(rev, 7) OVER (ORDER BY d) AS yhat
      FROM daily),
    resid AS (
      SELECT d, rev, yhat, ABS(rev - yhat) AS r
      FROM pred WHERE yhat IS NOT NULL),
    calib AS (SELECT r FROM resid WHERE d < DATE '1997-01-01'),
    ncal AS (SELECT COUNT(*) AS n FROM calib),
    q AS (
      -- split-conformal quantile: the ceil((n+1)*0.9)-th order statistic
      SELECT r AS qhat FROM (
        SELECT r, ROW_NUMBER() OVER (ORDER BY r, r) AS rk FROM calib)
      WHERE rk = LEAST((SELECT n FROM ncal),
                       CAST(CEIL(((SELECT n FROM ncal) + 1) * 0.9)
                            AS BIGINT))),
    test AS (
      SELECT rev, yhat, r FROM resid WHERE d >= DATE '1997-01-01')
    SELECT (SELECT n FROM ncal) AS n_calibration,
           COUNT(*) AS n_test,
           CAST((SELECT qhat FROM q) AS DOUBLE) AS q_hat,
           CAST(SUM(CASE WHEN r <= (SELECT qhat FROM q)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
           ROUND(CAST(SUM(CASE WHEN r <= (SELECT qhat FROM q)
                               THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6)
             AS empirical_coverage
    FROM test
    """,
)
def conformal_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction intervals — the distribution-free
    uncertainty wrapper every production forecaster should ship with: a
    seasonal-naive predictor's absolute residuals on the calibration
    period yield the ceil((n+1)*0.9)-th order statistic as the interval
    half-width (a SELECTION on exact decimals, no interpolation), and
    the empirical coverage on the held-out period checks the ~90%
    guarantee. Temporal split, integer counts, one window + one ranked
    pick."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2)
        .cast("decimal(18,2)")
        .alias("rev")
    )
    wd = Window.orderBy("d")
    resid = (
        daily.select("d", "rev", F.lag("rev", 7).over(wd).alias("yhat"))
        .filter(F.col("yhat").isNotNull())
        .select("d", F.abs(F.col("rev") - F.col("yhat")).alias("r"))
    )
    resid = op_cache.track(resid.cache())
    cut = F.lit("1997-01-01").cast("date")
    calib = resid.filter(F.col("d") < cut)
    n_cal = calib.count()
    import math as _math

    rk = min(n_cal, _math.ceil((n_cal + 1) * 0.9))
    wq = Window.orderBy("r")
    qhat = (
        calib.withColumn("rk", F.row_number().over(wq))
        .filter(F.col("rk") == rk)
        .select(F.col("r").alias("qhat"))
    )
    test = resid.filter(F.col("d") >= cut)
    return (
        test.crossJoin(F.broadcast(qhat))
        .agg(
            F.lit(n_cal).cast("bigint").alias("n_calibration"),
            F.count(F.lit(1)).alias("n_test"),
            F.max(F.col("qhat").cast("double")).alias("q_hat"),
            F.sum(F.when(F.col("r") <= F.col("qhat"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_covered"),
            F.round(
                F.sum(F.when(F.col("r") <= F.col("qhat"), 1).otherwise(0))
                .cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("empirical_coverage"),
        )
    )


def _det_walks_oracle(steps: int = 3) -> str:
    md5i = (
        "CAST('0x' || substr(md5(CAST(start AS VARCHAR) || ':' || "
        "CAST(cur AS VARCHAR) || ':{s}'), 1, 15) AS BIGINT)"
    )
    walk_ctes = []
    prev = "w0"
    for s in range(1, steps + 1):
        walk_ctes.append(f"""w{s} AS (
      SELECT w.start, adj.nbr AS cur
      FROM {prev} w
      JOIN deg d ON d.node = w.cur
      JOIN adj ON adj.node = w.cur
             AND adj.idx = {md5i.format(s=s)} % d.deg)""")
        prev = f"w{s}"
    chain = ",\n    ".join(walk_ctes)
    return f"""
    WITH so AS (SELECT DISTINCT l_suppkey AS s, l_orderkey AS o FROM lineitem),
    w AS (
      SELECT a.s AS u, b.s AS v, COUNT(*) AS c
      FROM so a JOIN so b ON a.o = b.o AND a.s < b.s
      GROUP BY a.s, b.s),
    sym AS (
      SELECT u AS x, v AS y, c FROM w
      UNION ALL SELECT v AS x, u AS y, c FROM w),
    sel AS (
      SELECT x, y FROM (
        SELECT x, y,
               ROW_NUMBER() OVER (PARTITION BY x ORDER BY c DESC, y) AS rn
        FROM sym)
      WHERE rn <= 3),
    e AS (SELECT DISTINCT least(x, y) AS u, greatest(x, y) AS v FROM sel),
    und AS (SELECT u, v FROM e UNION SELECT v, u FROM e),
    adj AS (
      SELECT u AS node, v AS nbr,
             ROW_NUMBER() OVER (PARTITION BY u ORDER BY v) - 1 AS idx
      FROM und),
    deg AS (SELECT node, COUNT(*) AS deg FROM adj GROUP BY node),
    w0 AS (SELECT node AS start, node AS cur FROM deg),
    {chain}
    SELECT cur AS end_node, COUNT(*) AS n_walks
    FROM {prev} GROUP BY cur
    ORDER BY n_walks DESC, end_node
    LIMIT 20
    """


@register("graph_deterministic_walks", oracle=_det_walks_oracle())
def graph_deterministic_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The node2vec/DeepWalk SAMPLING primitive, made value-checkable:
    one 3-step walk per node where each transition picks neighbor
    md5(start:current:step) mod degree from the id-ordered adjacency
    list — hash-driven pseudo-randomness instead of an RNG, so walks
    are reproducible across engines, partitionings, and reruns (the
    property a training-data pipeline needs anyway). Each step is one
    equi-join of the walk frontier against the adjacency list; endpoint
    visit counts are the walk-bias diagnostic."""
    from .operators import graph as graph_mod

    li = _t(spark, sf_dir, "lineitem")
    so = li.select(
        F.col("l_suppkey").alias("s"), F.col("l_orderkey").alias("o")
    ).distinct()
    wdf = (
        so.alias("a")
        .join(
            so.alias("b"),
            (F.col("a.o") == F.col("b.o")) & (F.col("a.s") < F.col("b.s")),
        )
        .groupBy(F.col("a.s").alias("u"), F.col("b.s").alias("v"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    e = graph_mod.top_k_cooccurrence_edges(wdf, k=3)
    und = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).distinct()
    wadj = Window.partitionBy("u").orderBy("v")
    adj = und.select(
        F.col("u").alias("node"),
        F.col("v").alias("nbr"),
        (F.row_number().over(wadj) - 1).alias("idx"),
    )
    adj = op_cache.track(adj.cache())
    deg = adj.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
    walks = deg.select(F.col("node").alias("start"), F.col("node").alias("cur"))
    for s in (1, 2, 3):
        pick = F.expr(
            "CAST(conv(substr(md5(concat(cast(start as string), ':', "
            f"cast(cur as string), ':{s}')), 1, 15), 16, 10) AS BIGINT)"
        )
        walks = (
            walks.join(deg, walks.cur == deg.node)
            .withColumn("idx", pick % F.col("deg"))
            .join(
                adj.select(
                    F.col("node").alias("anode"),
                    F.col("nbr"),
                    F.col("idx").alias("aidx"),
                ),
                (F.col("anode") == F.col("cur"))
                & (F.col("aidx") == F.col("idx")),
            )
            .select("start", F.col("nbr").alias("cur"))
        )
    return (
        walks.groupBy(F.col("cur").alias("end_node"))
        .agg(F.count(F.lit(1)).alias("n_walks"))
        .orderBy(F.desc("n_walks"), "end_node")
        .limit(20)
    )


@register(
    "seasonal_adjusted_anomalies",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d, COUNT(*) AS n
      FROM events GROUP BY 1),
    dow AS (
      SELECT isodow(d) - 1 AS wd, SUM(n) AS sn, COUNT(*) AS nd
      FROM daily GROUP BY 1),
    adj AS (
      -- seasonally adjusted count: n scaled by nd/sn (exact rational,
      -- kept as the integer pair n*nd and sn)
      SELECT d, n, isodow(d) - 1 AS wd,
             CAST(n AS DOUBLE) * dow.nd / dow.sn AS a
      FROM daily JOIN dow ON dow.wd = isodow(d) - 1),
    stats AS (
      SELECT COUNT(*) AS cnt, SUM(a) AS sa, SUM(a * a) AS saa FROM adj)
    SELECT CAST(adj.d AS TIMESTAMP) AS day, CAST(adj.n AS BIGINT) AS n_events,
           ROUND(adj.a, 6) AS seasonally_adjusted,
           ROUND((adj.a - sa / cnt) /
                 SQRT(GREATEST(saa / cnt - (sa / cnt) * (sa / cnt),
                               CAST(1e-12 AS DOUBLE))), 4) AS z_score
    FROM adj, stats
    WHERE ABS((adj.a - sa / cnt) /
              SQRT(GREATEST(saa / cnt - (sa / cnt) * (sa / cnt),
                            CAST(1e-12 AS DOUBLE)))) > 1.5
    ORDER BY day
    """,
)
def seasonal_adjusted_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-aware anomaly detection — the composition a raw
    z-score gets wrong (every weekend would alert): daily counts divide
    by their day-of-week seasonal factor first, then z-scores flag days
    |z| > 1.5 against the ADJUSTED series. The adjusted values are
    single-expression doubles from exact integers (n * nd / sn — same
    op order both engines) so moments and thresholds agree bit-for-bit.
    One scan, two aggregates, no window."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("n")
    )
    dow = daily.groupBy(F.weekday("d").alias("wd")).agg(
        F.sum("n").alias("sn"), F.count(F.lit(1)).alias("nd")
    )
    adj = daily.join(
        F.broadcast(dow), F.weekday(F.col("d")) == F.col("wd")
    ).select(
        "d",
        "n",
        (F.col("n").cast("double") * F.col("nd") / F.col("sn")).alias("a"),
    )
    stats = adj.agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("a").alias("sa"),
        F.sum(F.col("a") * F.col("a")).alias("saa"),
    )
    z = (F.col("a") - F.col("sa") / F.col("cnt")) / F.sqrt(
        F.greatest(
            F.col("saa") / F.col("cnt")
            - (F.col("sa") / F.col("cnt")) * (F.col("sa") / F.col("cnt")),
            F.lit(1e-12),
        )
    )
    return (
        adj.crossJoin(F.broadcast(stats))
        .filter(F.abs(z) > 1.5)
        .select(
            F.col("d").cast("timestamp").alias("day"),
            F.col("n").cast("bigint").alias("n_events"),
            F.round("a", 6).alias("seasonally_adjusted"),
            F.round(z, 4).alias("z_score"),
        )
        .orderBy("day")
    )


@register(
    "join_cardinality_estimate_audit",
    oracle="""
    WITH a AS (SELECT o_orderkey AS k FROM orders),
    b AS (SELECT l_orderkey AS k FROM lineitem),
    actual AS (
      SELECT CAST(SUM(ca * cb) AS BIGINT) AS actual_rows FROM
        (SELECT k, COUNT(*) AS ca FROM a GROUP BY k) x
        JOIN (SELECT k, COUNT(*) AS cb FROM b GROUP BY k) y USING (k)),
    stats AS (
      SELECT (SELECT COUNT(*) FROM a) AS na,
             (SELECT COUNT(DISTINCT k) FROM a) AS da,
             (SELECT COUNT(*) FROM b) AS nb,
             (SELECT COUNT(DISTINCT k) FROM b) AS db)
    SELECT na, da, nb, db,
           CAST(na * nb // GREATEST(da, db) AS BIGINT) AS uniform_estimate,
           (SELECT actual_rows FROM actual) AS actual_rows,
           ROUND(CAST((SELECT actual_rows FROM actual) AS DOUBLE) /
                 (na * nb // GREATEST(da, db)), 4) AS skew_factor
    FROM stats
    """,
)
def join_cardinality_estimate_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimizer-statistics literacy as a query: the textbook uniform
    join-cardinality estimate |A||B| / max(ndv_A, ndv_B) next to the
    EXACT join size (sum of per-key count products — computed without
    materializing the join), and their ratio as the skew factor. When
    this ratio strays far from 1 the planner's row estimates — and
    therefore its join-order and broadcast decisions — are wrong; this
    is the audit you run before trusting CBO on a new dataset."""
    o = _t(spark, sf_dir, "orders").select(F.col("o_orderkey").alias("k"))
    li = _t(spark, sf_dir, "lineitem").select(F.col("l_orderkey").alias("k"))
    ca = o.groupBy("k").agg(F.count(F.lit(1)).alias("ca"))
    cb = li.groupBy("k").agg(F.count(F.lit(1)).alias("cb"))
    actual = ca.join(cb, "k").agg(
        F.sum(F.col("ca") * F.col("cb")).cast("bigint").alias("actual_rows")
    )
    sa = o.agg(
        F.count(F.lit(1)).alias("na"), F.countDistinct("k").alias("da")
    )
    sb = li.agg(
        F.count(F.lit(1)).alias("nb"), F.countDistinct("k").alias("db")
    )
    return (
        sa.crossJoin(F.broadcast(sb))
        .crossJoin(F.broadcast(actual))
        .select(
            "na",
            "da",
            "nb",
            "db",
            F.expr("na * nb div GREATEST(da, db)")
            .cast("bigint")
            .alias("uniform_estimate"),
            "actual_rows",
            F.round(
                F.col("actual_rows").cast("double")
                / F.expr("na * nb div GREATEST(da, db)"),
                4,
            ).alias("skew_factor"),
        )
    )


_BLOOM_H_SPARK = (
    "CAST(conv(substring(md5({x}), 1, 15), 16, 10) AS BIGINT)"
)


@register(
    "bloom_semijoin_reduction",
    oracle=f"""
    WITH sel AS (
      SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'),
    bits AS (
      SELECT DISTINCT {_PORTABLE_H_DUCK.format(x="concat(CAST(j AS VARCHAR), ':', CAST(k AS VARCHAR))")} & 8191 AS bit
      FROM sel, (SELECT unnest(range(0, 4)) AS j)),
    probe AS (
      SELECT o_orderkey, o_custkey AS k FROM orders),
    probe_bits AS (
      SELECT o_orderkey, k,
             {_PORTABLE_H_DUCK.format(x="concat(CAST(j AS VARCHAR), ':', CAST(k AS VARCHAR))")} & 8191 AS bit
      FROM probe, (SELECT unnest(range(0, 4)) AS j)),
    passed AS (
      SELECT p.o_orderkey, p.k
      FROM probe_bits p JOIN bits b ON b.bit = p.bit
      GROUP BY p.o_orderkey, p.k HAVING COUNT(*) = 4),
    exact AS (
      SELECT o.o_orderkey FROM orders o JOIN sel ON sel.k = o.o_custkey)
    SELECT (SELECT COUNT(*) FROM probe) AS n_orders,
           (SELECT COUNT(*) FROM passed) AS n_bloom_passed,
           (SELECT COUNT(*) FROM exact) AS n_true_matches,
           CAST((SELECT COUNT(*) FROM passed) -
                (SELECT COUNT(*) FROM exact) AS BIGINT) AS n_false_passes,
           ROUND(CAST((SELECT COUNT(*) FROM passed) AS DOUBLE) /
                 (SELECT COUNT(*) FROM probe), 6) AS pass_fraction
    """,
)
def bloom_semijoin_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter SEMI-JOIN REDUCTION — the distributed trick that
    shrinks a fact shuffle before an expensive join: the filtered
    dimension's key set compresses to 8192 bits (4 md5-salted hashes),
    the fact table pre-filters against the broadcast bitmap, and only
    bloom-passed rows would shuffle. The pass count sits next to the
    exact semi-join count, making the false-pass overhead (the price of
    1 KB instead of a key list) a measured number. Spark's own runtime
    bloom pushdown does this automatically for some plans; this is the
    explicit, verifiable form."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    sel = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("k")
    )
    js = spark.range(4).select(F.col("id").alias("j"))
    hx = _BLOOM_H_SPARK.format(
        x="concat(CAST(j AS STRING), ':', CAST(k AS STRING))"
    )
    bits = (
        sel.crossJoin(F.broadcast(js))
        .select(F.expr(f"{hx} & 8191").alias("bit"))
        .distinct()
    )
    bits = op_cache.track(bits.cache())
    probe = orders.select("o_orderkey", F.col("o_custkey").alias("k"))
    probe_bits = probe.crossJoin(F.broadcast(js)).select(
        "o_orderkey", "k", F.expr(f"{hx} & 8191").alias("bit")
    )
    passed = (
        probe_bits.join(F.broadcast(bits), "bit")
        .groupBy("o_orderkey", "k")
        .agg(F.count(F.lit(1)).alias("n_set"))
        .filter(F.col("n_set") == 4)
    )
    exact = orders.join(
        F.broadcast(sel), orders.o_custkey == sel.k, "left_semi"
    )
    n_orders = probe.agg(F.count(F.lit(1)).alias("n_orders"))
    n_passed = passed.agg(F.count(F.lit(1)).alias("n_bloom_passed"))
    n_exact = exact.agg(F.count(F.lit(1)).alias("n_true_matches"))
    return (
        n_orders.crossJoin(F.broadcast(n_passed))
        .crossJoin(F.broadcast(n_exact))
        .select(
            "n_orders",
            "n_bloom_passed",
            "n_true_matches",
            (F.col("n_bloom_passed") - F.col("n_true_matches"))
            .cast("bigint")
            .alias("n_false_passes"),
            F.round(
                F.col("n_bloom_passed").cast("double") / F.col("n_orders"), 6
            ).alias("pass_fraction"),
        )
    )


_MORTON_DUCK = "((({x} >> 0) & 1) << 0) + ((({y} >> 0) & 1) << 1) + ((({x} >> 1) & 1) << 2) + ((({y} >> 1) & 1) << 3) + ((({x} >> 2) & 1) << 4) + ((({y} >> 2) & 1) << 5) + ((({x} >> 3) & 1) << 6) + ((({y} >> 3) & 1) << 7) + ((({x} >> 4) & 1) << 8) + ((({y} >> 4) & 1) << 9) + ((({x} >> 5) & 1) << 10) + ((({y} >> 5) & 1) << 11) + ((({x} >> 6) & 1) << 12) + ((({y} >> 6) & 1) << 13) + ((({x} >> 7) & 1) << 14) + ((({y} >> 7) & 1) << 15)"
_MORTON_SPARK = "shiftleft(((shiftright({x}, 0)) & 1), 0) + shiftleft(((shiftright({y}, 0)) & 1), 1) + shiftleft(((shiftright({x}, 1)) & 1), 2) + shiftleft(((shiftright({y}, 1)) & 1), 3) + shiftleft(((shiftright({x}, 2)) & 1), 4) + shiftleft(((shiftright({y}, 2)) & 1), 5) + shiftleft(((shiftright({x}, 3)) & 1), 6) + shiftleft(((shiftright({y}, 3)) & 1), 7) + shiftleft(((shiftright({x}, 4)) & 1), 8) + shiftleft(((shiftright({y}, 4)) & 1), 9) + shiftleft(((shiftright({x}, 5)) & 1), 10) + shiftleft(((shiftright({y}, 5)) & 1), 11) + shiftleft(((shiftright({x}, 6)) & 1), 12) + shiftleft(((shiftright({y}, 6)) & 1), 13) + shiftleft(((shiftright({x}, 7)) & 1), 14) + shiftleft(((shiftright({y}, 7)) & 1), 15)"


@register(
    "zorder_block_pruning_audit",
    oracle=f"""
    WITH pts AS (
      SELECT (o_custkey % 256) AS x,
             CAST(FLOOR(o_totalprice / 2500) AS BIGINT) % 256 AS y
      FROM orders),
    coded AS (
      SELECT x, y,
             ({_MORTON_DUCK.format(x="x", y="y")}) AS zcode,
             x * 256 + y AS rcode
      FROM pts),
    matched AS (
      SELECT * FROM coded
      WHERE x >= 64 AND x < 96 AND y >= 32 AND y < 64)
    SELECT (SELECT COUNT(*) FROM matched) AS n_matched,
           (SELECT COUNT(DISTINCT zcode >> 6) FROM matched)
             AS zorder_blocks_touched,
           (SELECT COUNT(DISTINCT rcode >> 6) FROM matched)
             AS rowmajor_blocks_touched,
           (SELECT COUNT(DISTINCT zcode >> 6) FROM coded)
             AS zorder_blocks_total,
           (SELECT COUNT(DISTINCT rcode >> 6) FROM coded)
             AS rowmajor_blocks_total
    """,
)
def zorder_block_pruning_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHY Z-order works, as a measured number: orders mapped onto a
    256x256 (customer-bucket, price-band) grid, codes assigned by bit
    interleave (Morton) vs row-major, 64-cell blocks; a 32x32 rectangle
    query touches far fewer Morton blocks than row-major ones — the
    min/max-pruning win data-skipping formats get from Z-order
    clustering (see plans/layout.py for the writer side). Pure integer
    bit arithmetic, identical in both engines."""
    o = _t(spark, sf_dir, "orders")
    pts = o.select(
        (F.col("o_custkey") % 256).alias("x"),
        (F.floor(F.col("o_totalprice") / 2500).cast("bigint") % 256).alias("y"),
    )
    coded = pts.select(
        "x",
        "y",
        F.expr(_MORTON_SPARK.format(x="x", y="y")).alias("zcode"),
        (F.col("x") * 256 + F.col("y")).alias("rcode"),
    )
    coded = op_cache.track(coded.cache())
    matched = coded.filter(
        (F.col("x") >= 64) & (F.col("x") < 96)
        & (F.col("y") >= 32) & (F.col("y") < 64)
    )
    zb = F.expr("shiftright(zcode, 6)")
    rb = F.expr("shiftright(rcode, 6)")
    m = matched.agg(
        F.count(F.lit(1)).alias("n_matched"),
        F.countDistinct(zb).alias("zorder_blocks_touched"),
        F.countDistinct(rb).alias("rowmajor_blocks_touched"),
    )
    t = coded.agg(
        F.countDistinct(zb).alias("zorder_blocks_total"),
        F.countDistinct(rb).alias("rowmajor_blocks_total"),
    )
    return m.crossJoin(F.broadcast(t))


@register(
    "sprt_sequential_test",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d,
             SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c,
             COUNT(*) AS n
      FROM events WHERE event_type IN ('click', 'view')
      GROUP BY 1),
    llr AS (
      SELECT d, c, n,
             SUM(c * ln(CAST(0.55 AS DOUBLE) / CAST(0.5 AS DOUBLE)) +
                 (n - c) * ln(CAST(0.45 AS DOUBLE) / CAST(0.5 AS DOUBLE)))
               OVER (ORDER BY d) AS cum_llr
      FROM daily),
    crossing AS (
      SELECT MIN(d) AS first_cross
      FROM llr WHERE ABS(cum_llr) > ln(CAST(19 AS DOUBLE))),
    last_row AS (SELECT cum_llr FROM llr ORDER BY d DESC LIMIT 1)
    SELECT (SELECT COUNT(*) FROM llr) AS n_days,
           ROUND(ln(CAST(19 AS DOUBLE)), 6) AS threshold,
           CAST((SELECT first_cross FROM crossing) AS TIMESTAMP)
             AS first_crossing_day,
           ROUND(cum_llr, 6) AS final_llr,
           CASE WHEN cum_llr > ln(CAST(19 AS DOUBLE)) THEN 'accept_h1'
                WHEN cum_llr < -ln(CAST(19 AS DOUBLE)) THEN 'accept_h0'
                ELSE 'continue' END AS decision
    FROM last_row
    """,
)
def sprt_sequential_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald's sequential probability-ratio test on the daily click-share
    series (H1: p=0.55 vs H0: p=0.5, error bounds alpha=beta=0.05 giving
    the ln(19) thresholds): the cumulative log-likelihood ratio is a
    RUNNING window sum — order-defined accumulation, so the doubles
    agree across engines — and the first boundary-crossing day is when a
    sequential experiment would have stopped, the early-stopping
    discipline fixed-horizon A/B tests lack."""
    ev = _t(spark, sf_dir, "events")
    import math as _math

    l1 = _math.log(0.55 / 0.5)
    l0 = _math.log(0.45 / 0.5)
    thr = _math.log(19.0)
    daily = (
        ev.filter(F.col("event_type").isin("click", "view"))
        .groupBy(F.to_date("ts").alias("d"))
        .agg(
            F.sum(
                F.when(F.col("event_type") == "click", 1).otherwise(0)
            ).alias("c"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    wd = Window.orderBy("d")
    llr = daily.select(
        "d",
        F.sum(
            F.col("c") * F.lit(l1) + (F.col("n") - F.col("c")) * F.lit(l0)
        )
        .over(wd)
        .alias("cum_llr"),
    )
    llr = op_cache.track(llr.cache())
    crossing = llr.filter(F.abs("cum_llr") > thr).agg(
        F.min("d").alias("first_cross")
    )
    wlast = Window.orderBy(F.desc("d"))
    last = (
        llr.withColumn("rn", F.row_number().over(wlast))
        .filter(F.col("rn") == 1)
        .select("cum_llr")
    )
    cnt = llr.agg(F.count(F.lit(1)).alias("n_days"))
    return (
        cnt.crossJoin(F.broadcast(last))
        .crossJoin(F.broadcast(crossing))
        .select(
            "n_days",
            F.round(F.lit(thr), 6).alias("threshold"),
            F.col("first_cross").cast("timestamp").alias("first_crossing_day"),
            F.round("cum_llr", 6).alias("final_llr"),
            F.when(F.col("cum_llr") > thr, "accept_h1")
            .when(F.col("cum_llr") < -thr, "accept_h0")
            .otherwise("continue")
            .alias("decision"),
        )
    )


@register(
    "exact_kth_selection",
    oracle="""
    WITH n AS (SELECT COUNT(*) AS n FROM orders),
    k AS (SELECT CAST(CEIL(n * 0.999) AS BIGINT) AS k FROM n)
    SELECT (SELECT n FROM n) AS n_rows,
           (SELECT k FROM k) AS k,
           (SELECT o_totalprice FROM orders
            ORDER BY o_totalprice, o_orderkey
            LIMIT 1 OFFSET (SELECT k - 1 FROM k)) AS kth_value
    """,
)
def exact_kth_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT order statistic without a global sort — the two-phase
    selection that finds the true P99.9 at 100 TB: phase 1 histograms
    values into 1000-unit buckets (map-side combine, a few hundred
    grouped rows to the driver), locates the bucket holding rank k from
    cumulative counts; phase 2 sorts ONLY that bucket's rows and picks
    the offset. The oracle is the brute-force ORDER BY ... OFFSET —
    trivially correct, quadratically more expensive at scale (a full
    sort vs one bucket's)."""
    o = _t(spark, sf_dir, "orders").select("o_totalprice", "o_orderkey")
    o = op_cache.track(o.cache())
    n = o.count()
    import math as _math

    k = _math.ceil(n * 0.999)
    hist = (
        o.groupBy(F.floor(F.col("o_totalprice") / 1000).alias("b"))
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy("b")
        .collect()
    )
    cum = 0
    target_bucket, offset_in_bucket = None, None
    for r in hist:
        if cum + r["c"] >= k:
            target_bucket, offset_in_bucket = r["b"], k - cum
            break
        cum += r["c"]
    bucket_rows = o.filter(
        F.floor(F.col("o_totalprice") / 1000) == target_bucket
    )
    w = Window.orderBy("o_totalprice", "o_orderkey")
    kth = (
        bucket_rows.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == offset_in_bucket)
        .select(F.col("o_totalprice").alias("kth_value"))
    )
    return kth.select(
        F.lit(n).cast("bigint").alias("n_rows"),
        F.lit(k).cast("bigint").alias("k"),
        "kth_value",
    )


@register(
    "business_days_latency",
    oracle="""
    WITH pairs AS (
      SELECT o.o_orderkey,
             CAST(o.o_orderdate AS DATE) AS d1,
             CAST(l.l_shipdate AS DATE) AS d2
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE l.l_linenumber = 1),
    bd AS (
      -- business days in (d1, d2] = W(d2) - W(d1), where W(d) counts
      -- weekdays from the Monday epoch 1990-01-01 through d inclusive:
      -- 5 per complete week + min(partial-week days, 5). Verified
      -- against numpy busday_count over a 2400-pair grid.
      SELECT o_orderkey, d1, d2,
             (5 * ((d2 - DATE '1990-01-01') // 7) +
              LEAST((d2 - DATE '1990-01-01') % 7 + 1, 5)) -
             (5 * ((d1 - DATE '1990-01-01') // 7) +
              LEAST((d1 - DATE '1990-01-01') % 7 + 1, 5)) AS bdays
      FROM pairs)
    SELECT CAST(bdays AS BIGINT) AS business_days,
           COUNT(*) AS n_orders
    FROM bd GROUP BY bdays ORDER BY business_days
    """,
)
def business_days_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-first-ship latency in BUSINESS days — the finance/SLA
    calendar arithmetic calendar-day deltas get wrong: the count is the
    difference of a cumulative-weekday prefix function anchored at a
    Monday epoch (5 per complete week + min(partial days, 5)), verified
    independently against numpy busday_count. Pure integer date
    arithmetic; the histogram shape immediately exposes the
    weekend plateaus a calendar-day histogram smears."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    pairs = o.join(li, li.l_orderkey == o.o_orderkey).select(
        F.to_date("o_orderdate").alias("d1"),
        F.to_date("l_shipdate").alias("d2"),
    )
    def wcount(col):
        days = F.datediff(col, F.lit("1990-01-01"))  # epoch is a Monday
        return F.expr(f"5 * (datediff({col}, DATE '1990-01-01') div 7)") + F.least(
            days % 7 + 1, F.lit(5)
        )

    bdays = wcount("d2") - wcount("d1")
    return (
        pairs.select(bdays.cast("bigint").alias("business_days"))
        .groupBy("business_days")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("business_days")
    )


@register(
    "source_overlap_jaccard",
    oracle="""
    WITH sh AS (
      SELECT DISTINCT source,
             list_aggregate(words[i:i+2], 'string_agg', ' ') AS g
      FROM (SELECT source,
                   string_split_regex(regexp_replace(lower(trim(text)),
                                                     '\\s+', ' ', 'g'),
                                      ' ') AS words
            FROM documents) t,
           UNNEST(range(1, len(words) - 1)) AS u(i)),
    sizes AS (SELECT source, COUNT(*) AS n FROM sh GROUP BY source),
    inter AS (
      SELECT a.source AS s1, b.source AS s2, COUNT(*) AS both
      FROM sh a JOIN sh b ON b.g = a.g AND a.source < b.source
      GROUP BY a.source, b.source)
    SELECT i.s1, i.s2,
           CAST(i.both AS BIGINT) AS n_shared,
           CAST(x.n AS BIGINT) AS n_s1, CAST(y.n AS BIGINT) AS n_s2,
           ROUND(CAST(i.both AS DOUBLE) / (x.n + y.n - i.both), 6)
             AS jaccard
    FROM inter i JOIN sizes x ON x.source = i.s1
    JOIN sizes y ON y.source = i.s2
    ORDER BY s1, s2
    """,
)
def source_overlap_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-level corpus overlap: exact Jaccard between every pair of
    sources over their 3-gram shingle VOCABULARIES (distinct shingles
    per source, intersected by an inverted-index join on the shingle —
    never a pairwise document comparison). The crawl-curation dashboard
    number that says which feeds are rebranded copies of each other.
    Cost ∝ Σ per-shingle source-pair combinations — bounded by the
    number of sources squared per shingle, tiny."""
    docs = _t(spark, sf_dir, "documents")
    words = docs.select(
        "source",
        F.split(
            F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "), " "
        ).alias("ws"),
    ).filter(F.size("ws") >= 3)
    sh = (
        words.select(
            "source",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(ws) - 3), "
                    "i -> concat_ws(' ', ws[i], ws[i + 1], ws[i + 2]))"
                )
            ).alias("g"),
        )
        .distinct()
    )
    sh = op_cache.track(sh.cache())
    sizes = sh.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a = sh.alias("a")
    b = sh.select(F.col("source").alias("s2"), F.col("g").alias("g2"))
    inter = (
        a.join(b, (F.col("g2") == F.col("g")) & (F.col("source") < F.col("s2")))
        .groupBy(F.col("source").alias("s1"), "s2")
        .agg(F.count(F.lit(1)).alias("both"))
    )
    x = sizes.select(F.col("source").alias("s1"), F.col("n").alias("n_s1"))
    y = sizes.select(F.col("source").alias("s2"), F.col("n").alias("n_s2"))
    return (
        inter.join(F.broadcast(x), "s1")
        .join(F.broadcast(y), "s2")
        .select(
            "s1",
            "s2",
            F.col("both").cast("bigint").alias("n_shared"),
            F.col("n_s1").cast("bigint").alias("n_s1"),
            F.col("n_s2").cast("bigint").alias("n_s2"),
            F.round(
                F.col("both").cast("double")
                / (F.col("n_s1") + F.col("n_s2") - F.col("both")),
                6,
            ).alias("jaccard"),
        )
        .orderBy("s1", "s2")
    )


@register(
    "yoy_aligned_growth",
    oracle="""
    WITH monthly AS (
      SELECT date_trunc('month', o_orderdate) AS m,
             CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2)
                  AS DECIMAL(18,2)) AS rev
      FROM orders GROUP BY 1),
    lagd AS (
      SELECT m, rev, LAG(rev, 12) OVER (ORDER BY m) AS rev_ly
      FROM monthly)
    SELECT CAST(m AS TIMESTAMP) AS month,
           CAST(rev AS DOUBLE) AS revenue,
           CAST(rev_ly AS DOUBLE) AS revenue_last_year,
           ROUND((CAST(rev AS DOUBLE) - CAST(rev_ly AS DOUBLE)) /
                 CAST(rev_ly AS DOUBLE), 6) AS yoy_growth
    FROM lagd WHERE rev_ly IS NOT NULL
    ORDER BY month
    """,
)
def yoy_aligned_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year growth with CALENDAR alignment: monthly DECIMAL
    revenue lagged 12 observations over the month spine (not 365 days —
    month arithmetic is what keeps Feb comparing to Feb). The window
    runs over the aggregated series, so the fact scan feeds one shuffle
    regardless of history length."""
    o = _t(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_trunc("month", "o_orderdate").alias("m")
    ).agg(
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2)
        .cast("decimal(18,2)")
        .alias("rev")
    )
    w = Window.orderBy("m")
    lagd = monthly.select(
        "m", "rev", F.lag("rev", 12).over(w).alias("rev_ly")
    ).filter(F.col("rev_ly").isNotNull())
    return lagd.select(
        F.col("m").cast("timestamp").alias("month"),
        F.col("rev").cast("double").alias("revenue"),
        F.col("rev_ly").cast("double").alias("revenue_last_year"),
        F.round(
            (F.col("rev").cast("double") - F.col("rev_ly").cast("double"))
            / F.col("rev_ly").cast("double"),
            6,
        ).alias("yoy_growth"),
    ).orderBy("month")


@register(
    "stream_batch_unification_parity",
    oracle="""
    WITH agg AS (
      SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
             event_type, COUNT(*) AS n_events,
             ROUND(SUM(value), 4) AS sum_value
      FROM events GROUP BY 1, 2)
    SELECT COUNT(*) AS n_windows,
           CAST(0 AS BIGINT) AS n_mismatched
    FROM agg
    """,
)
def stream_batch_unification_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Dataflow-model contract stated as a query: the SAME windowed
    aggregation executed as a real Structured Streaming drain AND as a
    batch groupBy, full-outer joined on the window key — the mismatch
    count the query returns is structurally zero ONLY if streaming
    replay equals batch (the oracle asserts exactly that zero, so any
    divergence in watermarking, window assignment, or aggregation
    between the two engines' modes fails the gate)."""
    import os as _os

    from .streaming.incremental import windowed_event_counts

    stream_res = windowed_event_counts(
        spark, _os.path.join(sf_dir, "events.parquet")
    ).select(
        "window_start",
        "event_type",
        F.col("n_events").alias("sn"),
        F.col("sum_value").alias("sv"),
    )
    ev = _t(spark, sf_dir, "events")
    batch_res = ev.groupBy(
        F.date_trunc("hour", "ts").alias("window_start"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("bn"),
        F.round(F.sum("value"), 4).alias("bv"),
    )
    joined = stream_res.join(
        batch_res, ["window_start", "event_type"], "full_outer"
    )
    return joined.agg(
        F.count(F.lit(1)).alias("n_windows"),
        F.sum(
            F.when(
                F.col("sn").isNull()
                | F.col("bn").isNull()
                | (F.col("sn") != F.col("bn"))
                | (F.col("sv") != F.col("bv")),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_mismatched"),
    )


@register(
    "events_peak_concurrency",
    oracle="""
    WITH iv AS (
      SELECT event_id, ts AS s, ts + INTERVAL 30 MINUTE AS e
      FROM events),
    pts AS (
      SELECT s AS t, 1 AS delta, event_id FROM iv
      UNION ALL
      SELECT e AS t, -1 AS delta, event_id FROM iv),
    swept AS (
      -- at equal instants starts count before ends (closed-interval
      -- convention), tiebreak event_id for full determinism
      SELECT t, delta,
             SUM(delta) OVER (ORDER BY t, delta DESC, event_id) AS load
      FROM pts)
    SELECT CAST(MAX(load) AS BIGINT) AS peak_concurrency,
           CAST((SELECT MIN(t) FROM swept
                 WHERE load = (SELECT MAX(load) FROM swept))
                AS TIMESTAMP) AS first_peak_at,
           (SELECT COUNT(*) FROM iv) AS n_intervals
    FROM swept
    """,
)
def events_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency by SWEEP LINE: each 30-minute activity interval
    becomes a +1/-1 boundary event, a running sum over the global
    boundary order is the live concurrency, and its max is the capacity
    number an interval self-join can't give without O(n²) pairs. The
    closed-interval tiebreak (starts before ends at equal instants,
    then event_id) makes the running sum fully deterministic. One
    explode + one ordered window — at 100 TB the order key is
    time-range partitioned."""
    ev = _t(spark, sf_dir, "events")
    iv = ev.select(
        "event_id",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("e"),
    )
    iv = op_cache.track(iv.cache())
    pts = iv.select(
        F.col("s").alias("t"), F.lit(1).alias("delta"), "event_id"
    ).unionByName(
        iv.select(F.col("e").alias("t"), F.lit(-1).alias("delta"), "event_id")
    )
    wsweep = Window.orderBy(
        "t", F.desc("delta"), "event_id"
    ).rowsBetween(Window.unboundedPreceding, 0)
    swept = pts.select("t", F.sum("delta").over(wsweep).alias("load"))
    swept = op_cache.track(swept.cache())
    peak = swept.agg(F.max("load").alias("p"))
    first = (
        swept.join(F.broadcast(peak), swept.load == F.col("p"))
        .agg(F.min("t").alias("first_peak_at"))
    )
    n = iv.agg(F.count(F.lit(1)).alias("n_intervals"))
    return (
        peak.crossJoin(F.broadcast(first))
        .crossJoin(F.broadcast(n))
        .select(
            F.col("p").cast("bigint").alias("peak_concurrency"),
            F.col("first_peak_at").cast("timestamp").alias("first_peak_at"),
            "n_intervals",
        )
    )


@register(
    "skyline_price_quantity",
    oracle="""
    WITH cand AS (
      -- per-quantity min price: the only point at each quantity that
      -- can possibly be on the skyline (dominance pre-pruning)
      SELECT l_quantity AS q, MIN(l_extendedprice) AS p
      FROM lineitem GROUP BY l_quantity),
    sky AS (
      SELECT c.q, c.p FROM cand c
      WHERE NOT EXISTS (
        SELECT 1 FROM cand d
        WHERE d.q >= c.q AND d.p <= c.p AND (d.q > c.q OR d.p < c.p)))
    SELECT CAST(q AS DOUBLE) AS quantity, CAST(p AS DOUBLE) AS min_price
    FROM sky ORDER BY quantity
    """,
)
def skyline_price_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SKYLINE (Pareto-frontier) operator — maximize quantity while
    minimizing price: no surviving point is dominated by another that is
    at least as good on both axes and strictly better on one. The naive
    skyline is an O(n²) self-join over the fact table; the scalable
    reduction computes per-quantity minimum price FIRST (a hash
    aggregate — only those points can be on the frontier), shrinking the
    dominance check to |distinct quantities|² on broadcastable input."""
    li = _t(spark, sf_dir, "lineitem")
    cand = li.groupBy(F.col("l_quantity").alias("q")).agg(
        F.min("l_extendedprice").alias("p")
    )
    cand = op_cache.track(cand.cache())
    d = cand.select(F.col("q").alias("dq"), F.col("p").alias("dp"))
    dominated = cand.join(
        F.broadcast(d),
        (F.col("dq") >= F.col("q"))
        & (F.col("dp") <= F.col("p"))
        & ((F.col("dq") > F.col("q")) | (F.col("dp") < F.col("p"))),
        "left_semi",
    )
    sky = cand.join(dominated, ["q", "p"], "left_anti")
    return sky.select(
        F.col("q").cast("double").alias("quantity"),
        F.col("p").cast("double").alias("min_price"),
    ).orderBy("quantity")


@register(
    "nucleus_vocab_per_lang",
    oracle="""
    WITH w AS (
      SELECT lang, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS t
      FROM documents WHERE trim(text) <> ''),
    freq AS (SELECT lang, t, COUNT(*) AS n FROM w GROUP BY lang, t),
    ranked AS (
      SELECT lang, t, n,
             SUM(n) OVER (PARTITION BY lang ORDER BY n DESC, t) AS cum,
             SUM(n) OVER (PARTITION BY lang) AS tot,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY n DESC, t) AS rk
      FROM freq)
    SELECT lang,
           CAST(MAX(CASE WHEN 10 * (cum - n) < 9 * tot THEN rk ELSE 0 END)
                AS BIGINT) AS nucleus_size,
           CAST(MAX(rk) AS BIGINT) AS vocab_size,
           ROUND(CAST(MAX(CASE WHEN 10 * (cum - n) < 9 * tot
                               THEN rk ELSE 0 END) AS DOUBLE) /
                 MAX(rk), 6) AS nucleus_fraction
    FROM ranked GROUP BY lang ORDER BY lang
    """,
)
def nucleus_vocab_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-p (nucleus) vocabulary size per language: the smallest
    frequency-ranked prefix covering 90% of token mass — the
    distributional statistic behind nucleus sampling and vocab sizing.
    The inclusion test is exact integer arithmetic (a word is in the
    nucleus iff the mass BEFORE it is under 9/10 of the total, i.e.
    10*(cum - n) < 9*tot), deterministic tiebreaks on the rank windows."""
    docs = _t(spark, sf_dir, "documents")
    w = docs.filter(F.trim("text") != "").select(
        "lang",
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("t"),
    )
    freq = w.groupBy("lang", "t").agg(F.count(F.lit(1)).alias("n"))
    wr = Window.partitionBy("lang").orderBy(F.desc("n"), "t")
    wc = wr.rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.partitionBy("lang")
    ranked = freq.select(
        "lang",
        "n",
        F.sum("n").over(wc).alias("cum"),
        F.sum("n").over(wt).alias("tot"),
        F.row_number().over(wr).alias("rk"),
    )
    return (
        ranked.groupBy("lang")
        .agg(
            F.max(
                F.when(
                    10 * (F.col("cum") - F.col("n")) < 9 * F.col("tot"),
                    F.col("rk"),
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("nucleus_size"),
            F.max("rk").cast("bigint").alias("vocab_size"),
            F.round(
                F.max(
                    F.when(
                        10 * (F.col("cum") - F.col("n")) < 9 * F.col("tot"),
                        F.col("rk"),
                    ).otherwise(0)
                ).cast("double")
                / F.max("rk"),
                6,
            ).alias("nucleus_fraction"),
        )
        .orderBy("lang")
    )


@register(
    "orders_control_chart",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS n
      FROM orders GROUP BY 1),
    mr AS (
      SELECT d, n,
             ABS(n - LAG(n) OVER (ORDER BY d)) AS rng
      FROM daily),
    stats AS (
      SELECT CAST(SUM(n) AS BIGINT) AS sn,
             COUNT(*) AS cnt,
             CAST(SUM(rng) AS BIGINT) AS sr,
             COUNT(rng) AS cr
      FROM mr),
    limits AS (
      -- individuals chart: sigma_hat = MRbar / d2 (d2 = 1.128), limits
      -- at center +- 3 sigma; every input is an exact integer ratio
      SELECT CAST(sn AS DOUBLE) / cnt AS center,
             CAST(sn AS DOUBLE) / cnt +
             3 * (CAST(sr AS DOUBLE) / cr) / CAST(1.128 AS DOUBLE) AS ucl,
             CAST(sn AS DOUBLE) / cnt -
             3 * (CAST(sr AS DOUBLE) / cr) / CAST(1.128 AS DOUBLE) AS lcl
      FROM stats)
    SELECT COUNT(*) AS n_days,
           ROUND((SELECT center FROM limits), 4) AS center,
           ROUND((SELECT ucl FROM limits), 4) AS ucl,
           ROUND((SELECT lcl FROM limits), 4) AS lcl,
           CAST(SUM(CASE WHEN n > (SELECT ucl FROM limits)
                           OR n < (SELECT lcl FROM limits)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_out_of_control
    FROM daily
    """,
)
def orders_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shewhart individuals control chart on the daily order-count
    series: sigma estimated from the mean moving range (MRbar / 1.128 —
    the SPC estimator that's robust to slow drift), 3-sigma control
    limits, and the out-of-control day count. Complements CUSUM (drift)
    with the spike detector; every input to the float expressions is an
    exact integer sum so the limits agree bit-for-bit."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.count(F.lit(1)).alias("n")
    )
    daily = op_cache.track(daily.cache())
    wd = Window.orderBy("d")
    mr = daily.select(
        "n", F.abs(F.col("n") - F.lag("n").over(wd)).alias("rng")
    )
    stats = mr.agg(
        F.sum("n").cast("bigint").alias("sn"),
        F.count(F.lit(1)).alias("cnt"),
        F.sum("rng").cast("bigint").alias("sr"),
        F.count("rng").alias("cr"),
    )
    center = F.col("sn").cast("double") / F.col("cnt")
    sig3 = F.lit(3) * (F.col("sr").cast("double") / F.col("cr")) / F.lit(1.128)
    lim = stats.select(
        center.alias("center"),
        (center + sig3).alias("ucl"),
        (center - sig3).alias("lcl"),
    )
    return (
        daily.crossJoin(F.broadcast(lim))
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.round(F.max("center"), 4).alias("center"),
            F.round(F.max("ucl"), 4).alias("ucl"),
            F.round(F.max("lcl"), 4).alias("lcl"),
            F.sum(
                F.when(
                    (F.col("n") > F.col("ucl")) | (F.col("n") < F.col("lcl")),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_out_of_control"),
        )
    )


@register(
    "fractional_knapsack_revenue",
    oracle="""
    WITH items AS (
      SELECT l_orderkey, l_linenumber,
             CAST(l_quantity AS BIGINT) AS q,
             CAST(l_extendedprice AS DECIMAL(18,2)) AS v,
             CAST(l_extendedprice AS DOUBLE) / l_quantity AS ratio
      FROM lineitem WHERE l_quantity > 0),
    budget AS (
      SELECT CAST(SUM(q) AS BIGINT) // 100 AS b FROM items),
    ranked AS (
      SELECT q, v, ratio,
             SUM(q) OVER (ORDER BY ratio DESC, l_orderkey, l_linenumber)
               AS cumq
      FROM items),
    taken AS (
      SELECT
        CAST(SUM(CASE WHEN cumq <= (SELECT b FROM budget)
                      THEN v ELSE CAST(0 AS DECIMAL(18,2)) END)
             AS DECIMAL(20,2)) AS full_value,
        CAST(SUM(CASE WHEN cumq <= (SELECT b FROM budget)
                      THEN q ELSE 0 END) AS BIGINT) AS full_qty,
        -- the boundary item is the FIRST row past the budget in rank
        -- order = the max ratio among them (ratios descend with rank)
        MAX(CASE WHEN cumq > (SELECT b FROM budget) THEN ratio END)
          AS frac_ratio
      FROM ranked)
    SELECT (SELECT b FROM budget) AS quantity_budget,
           full_qty AS whole_items_qty,
           CAST(ROUND(CAST(full_value AS DOUBLE) +
                      COALESCE(frac_ratio, 0) *
                      ((SELECT b FROM budget) - full_qty), 2) AS DOUBLE)
             AS max_revenue
    FROM taken
    """,
)
def fractional_knapsack_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fractional knapsack by greedy density — provably optimal for the
    divisible case: line items ranked by unit price, taken whole while
    the running quantity fits the budget (1% of total supply), the
    boundary item taken fractionally. Whole-item value accumulates in
    DECIMAL; the single fractional term is the only float product. The
    running-quantity window replaces any sequential greedy loop — the
    sort IS the algorithm."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 0)
    items = li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("bigint").alias("q"),
        F.col("l_extendedprice").cast("decimal(18,2)").alias("v"),
        (F.col("l_extendedprice").cast("double") / F.col("l_quantity")).alias(
            "ratio"
        ),
    )
    items = op_cache.track(items.cache())
    b = items.agg(F.expr("CAST(sum(q) AS BIGINT) div 100").alias("b"))
    wr = Window.orderBy(
        F.desc("ratio"), "l_orderkey", "l_linenumber"
    ).rowsBetween(Window.unboundedPreceding, 0)
    ranked = items.select(
        "q", "v", "ratio", F.sum("q").over(wr).alias("cumq")
    ).crossJoin(F.broadcast(b))
    taken = ranked.agg(
        F.sum(
            F.when(F.col("cumq") <= F.col("b"), F.col("v")).otherwise(
                F.lit(0).cast("decimal(18,2)")
            )
        )
        .cast("decimal(20,2)")
        .alias("full_value"),
        F.sum(F.when(F.col("cumq") <= F.col("b"), F.col("q")).otherwise(0))
        .cast("bigint")
        .alias("full_qty"),
        F.max(
            F.when(F.col("cumq") > F.col("b"), F.col("ratio"))
        ).alias("frac_ratio"),
        F.max("b").alias("b"),
    )
    return taken.select(
        F.col("b").alias("quantity_budget"),
        F.col("full_qty").alias("whole_items_qty"),
        F.round(
            F.col("full_value").cast("double")
            + F.coalesce(F.col("frac_ratio"), F.lit(0.0))
            * (F.col("b") - F.col("full_qty")),
            2,
        )
        .cast("double")
        .alias("max_revenue"),
    )


@register(
    "longest_activity_streak",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
    grp AS (
      SELECT user_id, d,
             d - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d)
                      AS INTEGER) AS island
      FROM days),
    streaks AS (
      SELECT user_id, island, COUNT(*) AS len, MIN(d) AS streak_start
      FROM grp GROUP BY user_id, island),
    best AS (
      SELECT user_id, len, streak_start,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY len DESC, streak_start) AS rk
      FROM streaks)
    SELECT user_id, CAST(len AS BIGINT) AS longest_streak_days,
           CAST(streak_start AS TIMESTAMP) AS streak_start
    FROM best WHERE rk = 1
    ORDER BY longest_streak_days DESC, user_id
    LIMIT 20
    """,
)
def longest_activity_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user — the retention
    metric product teams actually ship: distinct active days, the
    date-minus-rank islands trick groups consecutive runs without any
    self-join, and the per-user argmax picks the longest (earliest on
    ties). Top-20 streakiest users."""
    ev = _t(spark, sf_dir, "events")
    days = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    wr = Window.partitionBy("user_id").orderBy("d")
    grp = days.select(
        "user_id",
        "d",
        F.date_sub("d", F.row_number().over(wr)).alias("island"),
    )
    streaks = grp.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("len"), F.min("d").alias("streak_start")
    )
    wb = Window.partitionBy("user_id").orderBy(
        F.desc("len"), "streak_start"
    )
    best = (
        streaks.withColumn("rk", F.row_number().over(wb))
        .filter(F.col("rk") == 1)
    )
    wtop = Window.orderBy(F.desc("len"), "user_id")
    return (
        best.withColumn("rn", F.row_number().over(wtop))
        .filter(F.col("rn") <= 20)
        .select(
            "user_id",
            F.col("len").cast("bigint").alias("longest_streak_days"),
            F.col("streak_start").cast("timestamp").alias("streak_start"),
        )
        .orderBy(F.desc("longest_streak_days"), "user_id")
    )


@register(
    "revenue_bridge_monthly",
    oracle="""
    WITH monthly AS (
      SELECT date_trunc('month', o_orderdate) AS m,
             COUNT(*) AS n,
             CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2)
                  AS DECIMAL(18,2)) AS rev
      FROM orders GROUP BY 1),
    lagd AS (
      SELECT m, n, rev,
             LAG(n) OVER (ORDER BY m) AS n0,
             LAG(rev) OVER (ORDER BY m) AS rev0
      FROM monthly),
    eff AS (
      SELECT m, rev, rev0, n0,
             CAST((n0 * rev - n * rev0) * 100 AS BIGINT) AS pe_num,
             CAST(rev0 * (n - n0) * 100 AS BIGINT) AS ve_num
      FROM lagd WHERE n0 IS NOT NULL)
    SELECT CAST(m AS TIMESTAMP) AS month,
           CAST((rev - rev0) * 100 AS BIGINT) AS d_revenue_cents,
           -- integer cents, half away from zero: DECIMAL numerators and
           -- integer division only — no double ROUND whose midpoint
           -- behavior differs between engines (Spark rounds the shortest
           -- decimal string, DuckDB the binary value)
           (CASE WHEN pe_num < 0 THEN -1 ELSE 1 END) *
           ((2 * ABS(pe_num) + n0) // (2 * n0)) AS price_effect_cents,
           (CASE WHEN ve_num < 0 THEN -1 ELSE 1 END) *
           ((2 * ABS(ve_num) + n0) // (2 * n0)) AS volume_effect_cents
    FROM eff
    ORDER BY month
    """,
)
def revenue_bridge_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue bridge (the finance waterfall): month-over-month revenue
    change decomposed EXACTLY into a price effect (current volume times
    the change in average order value) and a volume effect (prior
    average value times the order-count change) — the two terms sum to
    the delta identically, no residual (verified algebraically:
    n·Δavg + avg₀·Δn = Δrev). Everything is reported in INTEGER CENTS
    with explicit half-away-from-zero integer rounding — DECIMAL
    numerators divided by integer denominators never touch a double
    ROUND, whose midpoint behavior differs between engines (Spark
    rounds the double's shortest decimal string, DuckDB its binary
    value — a 1-cent trap this query originally hit)."""
    o = _t(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_trunc("month", "o_orderdate").alias("m")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2)
        .cast("decimal(18,2)")
        .alias("rev"),
    )
    w = Window.orderBy("m")
    lagd = monthly.select(
        "m",
        "n",
        "rev",
        F.lag("n").over(w).alias("n0"),
        F.lag("rev").over(w).alias("rev0"),
    ).filter(F.col("n0").isNotNull())
    eff = lagd.select(
        "m",
        "n0",
        ((F.col("rev") - F.col("rev0")) * 100)
        .cast("bigint")
        .alias("d_revenue_cents"),
        ((F.col("n0") * F.col("rev") - F.col("n") * F.col("rev0")) * 100)
        .cast("bigint")
        .alias("pe_num"),
        ((F.col("rev0") * (F.col("n") - F.col("n0"))) * 100)
        .cast("bigint")
        .alias("ve_num"),
    )

    def half_away(num):
        sign = F.when(F.col(num) < 0, -1).otherwise(1)
        return sign * F.expr(f"(2 * ABS({num}) + n0) div (2 * n0)")

    return eff.select(
        F.col("m").cast("timestamp").alias("month"),
        "d_revenue_cents",
        half_away("pe_num").alias("price_effect_cents"),
        half_away("ve_num").alias("volume_effect_cents"),
    ).orderBy("month")


@register(
    "autocomplete_prefix_index",
    oracle="""
    WITH w AS (
      SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS t
      FROM documents WHERE trim(text) <> ''),
    freq AS (SELECT t, COUNT(*) AS n FROM w WHERE len(t) >= 2 GROUP BY t),
    pre AS (
      SELECT substr(t, 1, CAST(u.i AS INT)) AS prefix, t, n
      FROM freq, UNNEST(range(1, LEAST(len(t), 3) + 1)) AS u(i)),
    ranked AS (
      SELECT prefix, t, n,
             ROW_NUMBER() OVER (PARTITION BY prefix
                                ORDER BY n DESC, t) AS rk
      FROM pre)
    SELECT prefix, t AS completion, CAST(n AS BIGINT) AS n, CAST(rk AS INT) AS rk
    FROM ranked WHERE rk <= 3 AND len(prefix) = 2
    ORDER BY prefix, rk
    """,
)
def autocomplete_prefix_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocomplete index build: every word explodes into its prefixes
    (lengths 1-3), top-3 completions per prefix by corpus frequency with
    deterministic tiebreaks — the batch job behind a typeahead service.
    Emitted rows here are the 2-char-prefix shard; at scale the prefix
    is the natural shard/partition key and each group's top-k is one
    rank window."""
    docs = _t(spark, sf_dir, "documents")
    w = docs.filter(F.trim("text") != "").select(
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("t")
    )
    freq = (
        w.filter(F.length("t") >= 2)
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    pre = freq.select(
        "t",
        "n",
        F.explode(
            F.expr(
                "transform(sequence(1, least(length(t), 3)), "
                "i -> substr(t, 1, i))"
            )
        ).alias("prefix"),
    )
    rw = Window.partitionBy("prefix").orderBy(F.desc("n"), "t")
    return (
        pre.withColumn("rk", F.row_number().over(rw))
        .filter((F.col("rk") <= 3) & (F.length("prefix") == 2))
        .select(
            "prefix",
            F.col("t").alias("completion"),
            F.col("n").cast("bigint").alias("n"),
            F.col("rk").cast("int").alias("rk"),
        )
        .orderBy("prefix", "rk")
    )


@register(
    "csv_dialect_roundtrip",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           CAST(0 AS BIGINT) AS n_mismatched,
           CAST(SUM(CASE WHEN text LIKE '%scan%' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_with_marker
    FROM documents
    """,
)
def csv_dialect_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV DIALECT edge cases round-tripped: document text is wrapped
    into adversarial CSV content — embedded delimiters, double quotes,
    and literal newlines injected deterministically — written with
    quoting+escaping enabled and read back with multiLine parsing. The
    query returns the mismatch count against the pre-write values,
    structurally zero only if quoting, escaping, and multi-line parsing
    all survive; the oracle asserts that zero. This is the fidelity
    corner plain format round-trips never touch."""
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile

    docs = _t(spark, sf_dir, "documents")
    gnarly = docs.select(
        "doc_id",
        F.concat(
            F.lit('prefix,"with,commas" and "quotes"\n'),
            F.col("text"),
            F.lit('\nsuffix,"quoted,tail"'),
        ).alias("payload"),
        F.col("text").alias("orig"),
    )
    out = _tempfile.mkdtemp(prefix="csvdialect_")
    try:
        gnarly.select("doc_id", "payload").write.mode("overwrite").option(
            "header", True
        ).option("quoteAll", True).csv(out)
        back = (
            spark.read.option("header", True)
            .option("multiLine", True)
            .option("inferSchema", False)
            .csv(out)
            .select(
                F.col("doc_id").cast("bigint").alias("doc_id"),
                F.col("payload").alias("back_payload"),
            )
        )
        joined = gnarly.join(back, "doc_id", "full_outer")
        res = joined.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(
                F.when(
                    F.col("payload").isNull()
                    | F.col("back_payload").isNull()
                    | (F.col("payload") != F.col("back_payload")),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_mismatched"),
            F.sum(
                F.when(F.col("orig").like("%scan%"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_with_marker"),
        ).collect()[0]
        return spark.createDataFrame(
            [tuple(res)],
            "n_rows bigint, n_mismatched bigint, n_with_marker bigint",
        )
    finally:
        _shutil.rmtree(out, ignore_errors=True)


@register(
    "graph_modularity_nation_partition",
    oracle="""
    WITH e0 AS (
      SELECT DISTINCT o.o_custkey AS cu, l.l_suppkey AS su
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
    cn AS (SELECT c_custkey, c_nationkey FROM customer),
    sn AS (SELECT s_suppkey, s_nationkey FROM supplier),
    e AS (
      SELECT e0.cu AS u, 1000000 + e0.su AS v,
             cn.c_nationkey AS comm_u, sn.s_nationkey AS comm_v
      FROM e0 JOIN cn ON cn.c_custkey = e0.cu
              JOIN sn ON sn.s_suppkey = e0.su),
    m AS (SELECT COUNT(*) AS m FROM e),
    -- within-community edge counts
    within AS (
      SELECT comm_u AS comm, COUNT(*) AS e_c FROM e
      WHERE comm_u = comm_v GROUP BY comm_u),
    -- community degree sums over the undirected bipartite edges
    degs AS (
      SELECT comm, CAST(SUM(d) AS BIGINT) AS d_c FROM (
        SELECT comm_u AS comm, 1 AS d FROM e
        UNION ALL SELECT comm_v, 1 FROM e) t
      GROUP BY comm),
    terms AS (
      SELECT d.comm,
             4 * (SELECT m FROM m) * COALESCE(w.e_c, 0) - d.d_c * d.d_c
               AS q_term
      FROM degs d LEFT JOIN within w ON w.comm = d.comm)
    SELECT (SELECT m FROM m) AS n_edges,
           CAST(SUM(q_term) AS BIGINT) AS q_scaled,
           ROUND(CAST(SUM(q_term) AS DOUBLE) /
                 (4.0 * (SELECT m FROM m) * (SELECT m FROM m)), 6)
             AS modularity
    FROM terms
    """,
)
def graph_modularity_nation_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman MODULARITY of the nation partition over the customer-
    supplier trade graph — does trade cluster along national lines? —
    computed entirely in integers: Q·4m² = Σ_c (4m·e_c − d_c²) over
    within-community edge counts and community degree sums, one double
    division at the end. The community-quality metric that scores any
    partition (LPA output, METIS cuts, business hierarchies) without
    materializing anything quadratic."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    cust = _t(spark, sf_dir, "customer")
    sup = _t(spark, sf_dir, "supplier")
    e0 = (
        o.join(li, li.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("cu"), F.col("l_suppkey").alias("su"))
        .distinct()
    )
    e = (
        e0.join(
            F.broadcast(cust.select("c_custkey", "c_nationkey")),
            e0.cu == F.col("c_custkey"),
        )
        .join(
            F.broadcast(sup.select("s_suppkey", "s_nationkey")),
            e0.su == F.col("s_suppkey"),
        )
        .select(
            F.col("c_nationkey").alias("comm_u"),
            F.col("s_nationkey").alias("comm_v"),
        )
    )
    e = op_cache.track(e.cache())
    m = e.count()
    within = (
        e.filter(F.col("comm_u") == F.col("comm_v"))
        .groupBy(F.col("comm_u").alias("comm"))
        .agg(F.count(F.lit(1)).alias("e_c"))
    )
    degs = (
        e.select(F.col("comm_u").alias("comm"))
        .unionAll(e.select(F.col("comm_v").alias("comm")))
        .groupBy("comm")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d_c"))
    )
    terms = degs.join(F.broadcast(within), "comm", "left").select(
        (
            F.lit(4 * m) * F.coalesce(F.col("e_c"), F.lit(0))
            - F.col("d_c") * F.col("d_c")
        ).alias("q_term")
    )
    return terms.agg(
        F.lit(m).cast("bigint").alias("n_edges"),
        F.sum("q_term").cast("bigint").alias("q_scaled"),
        F.round(
            F.sum("q_term").cast("double") / (F.lit(4.0) * m * m), 6
        ).alias("modularity"),
    )


@register(
    "label_noise_knn_audit",
    oracle="""
    WITH pairs AS (
      SELECT a.vec_id AS id, a.label AS lab, b.vec_id AS nid,
             b.label AS nlab,
             list_dot_product([CAST(x AS DOUBLE) FOR x IN a.embedding],
                              [CAST(x AS DOUBLE) FOR x IN b.embedding]) /
             (sqrt(list_dot_product([CAST(x AS DOUBLE) FOR x IN a.embedding],
                                    [CAST(x AS DOUBLE) FOR x IN a.embedding])) *
              sqrt(list_dot_product([CAST(x AS DOUBLE) FOR x IN b.embedding],
                                    [CAST(x AS DOUBLE) FOR x IN b.embedding])))
               AS cos
      FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id),
    knn AS (
      SELECT id, lab, nlab FROM (
        SELECT id, lab, nlab,
               ROW_NUMBER() OVER (PARTITION BY id
                                  ORDER BY cos DESC, nid) AS rk
        FROM pairs) WHERE rk <= 5),
    votes AS (
      SELECT id, lab, nlab, COUNT(*) AS c FROM knn GROUP BY id, lab, nlab),
    majority AS (
      SELECT id, lab, nlab AS pred FROM (
        SELECT id, lab, nlab,
               ROW_NUMBER() OVER (PARTITION BY id
                                  ORDER BY c DESC, nlab) AS rk
        FROM votes) WHERE rk = 1)
    SELECT lab AS label,
           COUNT(*) AS n_points,
           CAST(SUM(CASE WHEN pred <> lab THEN 1 ELSE 0 END) AS BIGINT)
             AS n_suspect,
           ROUND(CAST(SUM(CASE WHEN pred <> lab THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS noise_rate
    FROM majority GROUP BY lab ORDER BY label
    """,
)
def label_noise_knn_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-noise detection by neighborhood consensus: every point
    whose 5-NN majority label (deterministic tiebreaks on both ranks)
    disagrees with its own label is a relabel/review candidate — the
    data-curation audit run before training on human labels. Exact kNN
    here (the oracle needs the full ranking); at corpus scale the
    candidate set comes from the LSH/IVF index instead of the cross
    join, same consensus logic."""
    emb = _t(spark, sf_dir, "embeddings")
    a = emb.select(
        F.col("vec_id").alias("id"),
        F.col("label").alias("lab"),
        F.col("embedding").alias("va"),
    )
    b = emb.select(
        F.col("vec_id").alias("nid"),
        F.col("label").alias("nlab"),
        F.col("embedding").alias("vb"),
    )
    pairs = a.join(b, F.col("nid") != F.col("id")).select(
        "id",
        "lab",
        "nid",
        "nlab",
        sim_mod.cosine(F.col("va"), F.col("vb")).alias("cos"),
    )
    wk = Window.partitionBy("id").orderBy(F.desc("cos"), "nid")
    knn = (
        pairs.withColumn("rk", F.row_number().over(wk))
        .filter(F.col("rk") <= 5)
        .select("id", "lab", "nlab")
    )
    votes = knn.groupBy("id", "lab", "nlab").agg(
        F.count(F.lit(1)).alias("c")
    )
    wm = Window.partitionBy("id").orderBy(F.desc("c"), "nlab")
    majority = (
        votes.withColumn("rk", F.row_number().over(wm))
        .filter(F.col("rk") == 1)
        .select("id", "lab", F.col("nlab").alias("pred"))
    )
    return (
        majority.groupBy(F.col("lab").alias("label"))
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.sum(F.when(F.col("pred") != F.col("lab"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_suspect"),
            F.round(
                F.sum(
                    F.when(F.col("pred") != F.col("lab"), 1).otherwise(0)
                ).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("noise_rate"),
        )
        .orderBy("label")
    )


@register(
    "latency_percentile_bands",
    oracle="""
    WITH lat AS (
      SELECT date_trunc('month', o.o_orderdate) AS m,
             CAST(l.l_shipdate AS DATE) - CAST(o.o_orderdate AS DATE)
               AS days
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE l.l_linenumber = 1),
    ranked AS (
      SELECT m, days,
             ROW_NUMBER() OVER (PARTITION BY m ORDER BY days) AS rk,
             COUNT(*) OVER (PARTITION BY m) AS n
      FROM lat)
    SELECT CAST(m AS TIMESTAMP) AS month, CAST(MAX(n) AS BIGINT) AS n_orders,
           CAST(MAX(CASE WHEN 2 * rk <= n + 1 THEN days END) AS BIGINT)
             AS p50_days,
           CAST(MAX(CASE WHEN 10 * rk <= 9 * n + 10 THEN days END) AS BIGINT)
             AS p90_days,
           CAST(MAX(CASE WHEN 100 * rk <= 99 * n + 100 THEN days END)
                AS BIGINT) AS p99_days
    FROM ranked GROUP BY m ORDER BY month
    """,
)
def latency_percentile_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly P50/P90/P99 order-to-ship latency bands — the ops SLA
    dashboard — as EXACT selection percentiles (the ceil(q(n+1))-ish
    nearest-rank pick, integer comparisons only: the rank qualifies
    while q·rank <= stays within the scaled bound, and MAX over the
    qualifying days is the order statistic). Integer day deltas, one
    rank window per month partition."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    lat = o.join(li, li.l_orderkey == o.o_orderkey).select(
        F.date_trunc("month", "o_orderdate").alias("m"),
        F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")).alias(
            "days"
        ),
    )
    wr = Window.partitionBy("m").orderBy("days")
    wn = Window.partitionBy("m")
    ranked = lat.select(
        "m",
        "days",
        F.row_number().over(wr).alias("rk"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    return (
        ranked.groupBy("m")
        .agg(
            F.max("n").cast("bigint").alias("n_orders"),
            F.max(
                F.when(2 * F.col("rk") <= F.col("n") + 1, F.col("days"))
            )
            .cast("bigint")
            .alias("p50_days"),
            F.max(
                F.when(10 * F.col("rk") <= 9 * F.col("n") + 10, F.col("days"))
            )
            .cast("bigint")
            .alias("p90_days"),
            F.max(
                F.when(
                    100 * F.col("rk") <= 99 * F.col("n") + 100, F.col("days")
                )
            )
            .cast("bigint")
            .alias("p99_days"),
        )
        .select(
            F.col("m").cast("timestamp").alias("month"),
            "n_orders",
            "p50_days",
            "p90_days",
            "p99_days",
        )
        .orderBy("month")
    )


def _kcenter_oracle(k: int = 5) -> str:
    """Greedy k-center unrolled: center 1 = min vec_id; each next center
    is the point farthest (quantized L2, tiebreak lowest id) from its
    nearest chosen center."""
    parts = ["""q AS (
      SELECT vec_id,
             [GREATEST(CAST(ROUND(CAST(x AS DOUBLE) * 64, 0) AS INT) + 128, 0)
              FOR x IN embedding] AS qv
      FROM embeddings),
    dims AS (
      SELECT vec_id, CAST(pos0 AS INT) AS i, val
      FROM (SELECT vec_id, unnest(qv) AS val,
                   unnest(range(0, len(qv))) AS pos0 FROM q)),
    c1 AS (SELECT MIN(vec_id) AS cid FROM q)"""]
    prev_centers = "(SELECT cid FROM c1)"
    for r in range(2, k + 1):
        parts.append(f"""d{r} AS (
      SELECT d.vec_id, MIN(t.dist) AS mind FROM (
        SELECT a.vec_id, b.vec_id AS cid,
               SUM((a.val - b.val) * (a.val - b.val)) AS dist
        FROM dims a JOIN dims b ON b.i = a.i
        WHERE b.vec_id IN {prev_centers}
        GROUP BY a.vec_id, b.vec_id) t
      JOIN q d ON d.vec_id = t.vec_id
      WHERE d.vec_id NOT IN {prev_centers}
      GROUP BY d.vec_id),
    c{r} AS (
      SELECT vec_id AS cid FROM d{r}
      ORDER BY mind DESC, vec_id LIMIT 1)""")
        prev_centers = (
            "(SELECT cid FROM c1"
            + "".join(f" UNION ALL SELECT cid FROM c{i}" for i in range(2, r + 1))
            + ")"
        )
    parts.append(f"""centers AS (SELECT cid FROM {prev_centers} t),
    cover AS (
      SELECT a.vec_id, MIN(t.dist) AS mind FROM (
        SELECT a2.vec_id, b.vec_id AS cid,
               SUM((a2.val - b.val) * (a2.val - b.val)) AS dist
        FROM dims a2 JOIN dims b ON b.i = a2.i
        WHERE b.vec_id IN (SELECT cid FROM centers)
        GROUP BY a2.vec_id, b.vec_id) t
      JOIN q a ON a.vec_id = t.vec_id
      GROUP BY a.vec_id)""")
    ctes = ",\n    ".join(parts)
    return f"""
    WITH {ctes}
    SELECT (SELECT CAST(list_aggregate(list(cid ORDER BY cid),
                                       'string_agg', ',') AS VARCHAR)
            FROM centers) AS center_ids,
           CAST((SELECT MAX(mind) FROM cover) AS BIGINT)
             AS coverage_radius_sq,
           (SELECT COUNT(*) FROM q) AS n_points
    """


@register("kcenter_coreset_selection", oracle=_kcenter_oracle())
def kcenter_coreset_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center CORESET selection (Gonzalez' 2-approximation) —
    the diversity-sampling primitive for picking maximally-spread
    training examples: start from the minimum id, repeatedly take the
    point farthest from its nearest chosen center (exact quantized L2,
    deterministic tiebreaks), five rounds; report the chosen ids and
    the final coverage radius (the farthest any point sits from its
    center). Each round is one broadcast of <= k centers against the
    corpus plus a min-aggregate — the same per-round shape as Lloyd's,
    oracle-unrolled round by round."""
    emb = _t(spark, sf_dir, "embeddings")
    qz = sim_mod.quantize_for_kmeans(emb, "vec_id", "embedding")
    dims = qz.select(
        "vec_id", F.posexplode("qv").alias("i", "val")
    ).select("vec_id", F.col("i").cast("int").alias("i"), "val")
    dims = op_cache.track(dims.cache())
    centers = [
        int(qz.agg(F.min("vec_id").alias("m")).collect()[0]["m"])
    ]
    for _ in range(4):
        cd = dims.filter(F.col("vec_id").isin(centers)).select(
            F.col("vec_id").alias("cid"), "i", F.col("val").alias("cval")
        )
        mind = (
            dims.filter(~F.col("vec_id").isin(centers))
            .join(F.broadcast(cd), "i")
            .groupBy("vec_id", "cid")
            .agg(
                F.sum(
                    (F.col("val") - F.col("cval"))
                    * (F.col("val") - F.col("cval"))
                ).alias("dist")
            )
            .groupBy("vec_id")
            .agg(F.min("dist").alias("mind"))
        )
        far = mind.orderBy(F.desc("mind"), "vec_id").limit(1).collect()[0]
        centers.append(int(far["vec_id"]))
    cd = dims.filter(F.col("vec_id").isin(centers)).select(
        F.col("vec_id").alias("cid"), "i", F.col("val").alias("cval")
    )
    cover = (
        dims.join(F.broadcast(cd), "i")
        .groupBy("vec_id", "cid")
        .agg(
            F.sum(
                (F.col("val") - F.col("cval"))
                * (F.col("val") - F.col("cval"))
            ).alias("dist")
        )
        .groupBy("vec_id")
        .agg(F.min("dist").alias("mind"))
    )
    radius = cover.agg(F.max("mind").alias("r")).collect()[0]["r"]
    n = qz.count()
    return spark.createDataFrame(
        [(",".join(str(c) for c in sorted(centers)), int(radius), n)],
        "center_ids string, coverage_radius_sq bigint, n_points bigint",
    )


_QUANTIFIED_SQL = """
    WITH march_avgs AS (
      SELECT AVG(o_totalprice) AS a
      FROM orders WHERE EXTRACT(MONTH FROM o_orderdate) = 3
      GROUP BY EXTRACT(YEAR FROM o_orderdate))
    SELECT COUNT(*) AS n_orders,
           CAST(SUM(CASE WHEN o_totalprice > ALL (SELECT a FROM march_avgs)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_above_all,
           CAST(SUM(CASE WHEN o_totalprice > ANY (SELECT a FROM march_avgs)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_above_any
    FROM orders
    """


@register("quantified_subquery_breadth", oracle=_QUANTIFIED_SQL)
def quantified_subquery_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantified comparisons — ``> ALL`` / ``> ANY`` subqueries. Spark
    has no native quantified-comparison syntax, so the engine SUPPLIES
    the semantics via the standard rewrite (x > ALL S  <=>  x > max(S);
    x > ANY S  <=>  x > min(S), both over non-empty non-null S) — and
    the oracle runs DuckDB's native ALL/ANY form, so the rewrite's
    equivalence is what the gate checks."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        WITH march_avgs AS (
          SELECT AVG(o_totalprice) AS a
          FROM orders WHERE EXTRACT(MONTH FROM o_orderdate) = 3
          GROUP BY EXTRACT(YEAR FROM o_orderdate))
        SELECT COUNT(*) AS n_orders,
               CAST(SUM(CASE WHEN o_totalprice >
                                  (SELECT MAX(a) FROM march_avgs)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_above_all,
               CAST(SUM(CASE WHEN o_totalprice >
                                  (SELECT MIN(a) FROM march_avgs)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_above_any
        FROM orders
        """
    )


@register(
    "filter_agreement_kappa",
    oracle="""
    WITH feats AS (
      SELECT doc_id,
             len(string_split_regex(regexp_replace(lower(trim(text)),
                                                   '\\s+', ' ', 'g'), ' '))
               AS wc,
             len(text) AS nc
      FROM documents),
    rated AS (
      SELECT doc_id,
             CASE WHEN wc BETWEEN 50 AND 100000 THEN 1 ELSE 0 END AS r1,
             CASE WHEN nc >= 200 AND wc >= 30 THEN 1 ELSE 0 END AS r2
      FROM feats),
    cells AS (
      SELECT CAST(SUM(r1 * r2) AS BIGINT) AS a,
             CAST(SUM(r1 * (1 - r2)) AS BIGINT) AS b,
             CAST(SUM((1 - r1) * r2) AS BIGINT) AS c,
             CAST(SUM((1 - r1) * (1 - r2)) AS BIGINT) AS d,
             COUNT(*) AS n
      FROM rated)
    SELECT a AS both_keep, b AS only_len_keep, c AS only_char_keep,
           d AS both_drop,
           ROUND(CAST(a + d AS DOUBLE) / n, 6) AS raw_agreement,
           -- kappa = (po - pe) / (1 - pe) with exact integer po*n², pe*n²
           ROUND(CAST((a + d) * n - ((a + b) * (a + c) + (c + d) * (b + d))
                      AS DOUBLE) /
                 (n * n - ((a + b) * (a + c) + (c + d) * (b + d))), 6)
             AS cohens_kappa
    FROM cells
    """,
)
def filter_agreement_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two quality filters (a word-count rule and
    a char/word hybrid rule) treated as raters — chance-corrected
    agreement, the right way to compare filter variants (raw agreement
    is inflated when both keep almost everything). Numerator and
    denominator assemble from exact integer contingency cells scaled by
    n², one double division at the end."""
    docs = _t(spark, sf_dir, "documents")
    feats = docs.select(
        F.size(
            F.split(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "), " ")
        ).alias("wc"),
        F.length("text").alias("nc"),
    )
    rated = feats.select(
        F.when(F.col("wc").between(50, 100000), 1).otherwise(0).alias("r1"),
        F.when((F.col("nc") >= 200) & (F.col("wc") >= 30), 1)
        .otherwise(0)
        .alias("r2"),
    )
    cells = rated.agg(
        F.sum(F.col("r1") * F.col("r2")).cast("bigint").alias("a"),
        F.sum(F.col("r1") * (1 - F.col("r2"))).cast("bigint").alias("b"),
        F.sum((1 - F.col("r1")) * F.col("r2")).cast("bigint").alias("c"),
        F.sum((1 - F.col("r1")) * (1 - F.col("r2")))
        .cast("bigint")
        .alias("d"),
        F.count(F.lit(1)).alias("n"),
    )
    pe_n2 = (F.col("a") + F.col("b")) * (F.col("a") + F.col("c")) + (
        F.col("c") + F.col("d")
    ) * (F.col("b") + F.col("d"))
    return cells.select(
        F.col("a").alias("both_keep"),
        F.col("b").alias("only_len_keep"),
        F.col("c").alias("only_char_keep"),
        F.col("d").alias("both_drop"),
        F.round(
            (F.col("a") + F.col("d")).cast("double") / F.col("n"), 6
        ).alias("raw_agreement"),
        F.round(
            ((F.col("a") + F.col("d")) * F.col("n") - pe_n2).cast("double")
            / (F.col("n") * F.col("n") - pe_n2),
            6,
        ).alias("cohens_kappa"),
    )


@register(
    "simpsons_paradox_audit",
    oracle="""
    WITH base AS (
      SELECT l_returnflag AS g,
             CAST(l_quantity AS DECIMAL(38,0)) AS x,
             CAST(FLOOR(l_extendedprice) AS DECIMAL(38,0)) AS y
      FROM lineitem),
    per_g AS (
      SELECT g, COUNT(*) AS n,
             SUM(x * y) AS sxy, SUM(x) AS sx, SUM(y) AS sy
      FROM base GROUP BY g),
    signs AS (
      SELECT g, n,
             CASE WHEN n * sxy - sx * sy > 0 THEN 1
                  WHEN n * sxy - sx * sy < 0 THEN -1 ELSE 0 END AS s
      FROM per_g),
    pooled AS (
      SELECT CASE WHEN SUM(n) * SUM(sxy) - SUM(sx) * SUM(sy) > 0 THEN 1
                  WHEN SUM(n) * SUM(sxy) - SUM(sx) * SUM(sy) < 0 THEN -1
                  ELSE 0 END AS ps
      FROM per_g)
    SELECT (SELECT ps FROM pooled) AS pooled_corr_sign,
           COUNT(*) AS n_groups,
           CAST(SUM(CASE WHEN s = (SELECT ps FROM pooled)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_groups_agree,
           CAST(SUM(CASE WHEN s <> (SELECT ps FROM pooled) AND s <> 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_groups_flipped
    FROM signs
    """,
)
def simpsons_paradox_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's-paradox screening: the SIGN of the quantity-price
    association pooled vs within each return-flag stratum — a stratum
    whose sign flips against the pooled one is the aggregation trap
    every observational analysis must check for. Signs come from the
    exact integer covariance numerator n·Σxy − Σx·Σy in DECIMAL(38,0)
    (no correlation floats at all), so the audit is bit-exact and
    overflow-safe at any scale."""
    li = _t(spark, sf_dir, "lineitem")
    base = li.select(
        F.col("l_returnflag").alias("g"),
        F.col("l_quantity").cast("decimal(38,0)").alias("x"),
        F.floor("l_extendedprice").cast("decimal(38,0)").alias("y"),
    )
    per_g = base.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
    )
    per_g = op_cache.track(per_g.cache())
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    signs = per_g.select(
        "g",
        F.when(num > 0, 1).when(num < 0, -1).otherwise(0).alias("s"),
    )
    pooled_num = (
        F.sum("n") * F.sum("sxy") - F.sum("sx") * F.sum("sy")
    )
    pooled = per_g.agg(
        F.when(pooled_num > 0, 1)
        .when(pooled_num < 0, -1)
        .otherwise(0)
        .alias("ps")
    )
    return (
        signs.crossJoin(F.broadcast(pooled))
        .agg(
            F.max("ps").alias("pooled_corr_sign"),
            F.count(F.lit(1)).alias("n_groups"),
            F.sum(F.when(F.col("s") == F.col("ps"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_groups_agree"),
            F.sum(
                F.when(
                    (F.col("s") != F.col("ps")) & (F.col("s") != 0), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_groups_flipped"),
        )
    )


@register(
    "littles_law_identity",
    oracle="""
    WITH iv AS (
      SELECT event_id, ts AS s, ts + INTERVAL 30 MINUTE AS e FROM events),
    pts AS (
      SELECT s AS t, 1 AS delta, event_id FROM iv
      UNION ALL SELECT e, -1, event_id FROM iv),
    swept AS (
      SELECT t, delta,
             SUM(delta) OVER (ORDER BY t, delta DESC, event_id) AS load,
             LEAD(t) OVER (ORDER BY t, delta DESC, event_id) AS nxt
      FROM pts),
    integral AS (
      SELECT CAST(SUM(load * (epoch_ms(nxt) - epoch_ms(t))) AS BIGINT)
               AS area_ms
      FROM swept WHERE nxt IS NOT NULL),
    direct AS (
      SELECT CAST(SUM(epoch_ms(e) - epoch_ms(s)) AS BIGINT) AS dur_ms,
             COUNT(*) AS n,
             CAST(epoch_ms(MAX(e)) - epoch_ms(MIN(s)) AS BIGINT)
               AS horizon_ms
      FROM iv)
    SELECT d.n AS n_intervals,
           i.area_ms AS concurrency_time_integral_ms,
           d.dur_ms AS total_duration_ms,
           CAST(i.area_ms - d.dur_ms AS BIGINT) AS identity_gap,
           ROUND(CAST(i.area_ms AS DOUBLE) / d.horizon_ms, 6)
             AS avg_concurrency
    FROM integral i, direct d
    """,
)
def littles_law_identity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Little's law as an exact computational identity: the time
    integral of live concurrency (sweep line: each segment's load times
    its millisecond length) must equal the plain sum of interval
    durations — two very different computations of L·T = λT·W whose
    integer equality (identity_gap = 0) verifies the sweep-line
    integral end-to-end, plus the average concurrency it implies. Pure
    integer milliseconds until the final ratio."""
    ev = _t(spark, sf_dir, "events")
    iv = ev.select(
        "event_id",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("e"),
    )
    iv = op_cache.track(iv.cache())
    pts = iv.select(
        F.col("s").alias("t"), F.lit(1).alias("delta"), "event_id"
    ).unionByName(
        iv.select(F.col("e").alias("t"), F.lit(-1).alias("delta"), "event_id")
    )
    worder = Window.orderBy("t", F.desc("delta"), "event_id")
    swept = pts.select(
        "t",
        F.sum("delta")
        .over(worder.rowsBetween(Window.unboundedPreceding, 0))
        .alias("load"),
        F.lead("t").over(worder).alias("nxt"),
    )
    integral = swept.filter(F.col("nxt").isNotNull()).agg(
        F.sum(
            F.col("load")
            * (F.unix_millis("nxt") - F.unix_millis("t"))
        )
        .cast("bigint")
        .alias("area_ms")
    )
    direct = iv.agg(
        F.sum(F.unix_millis("e") - F.unix_millis("s"))
        .cast("bigint")
        .alias("dur_ms"),
        F.count(F.lit(1)).alias("n"),
        (F.unix_millis(F.max("e")) - F.unix_millis(F.min("s")))
        .cast("bigint")
        .alias("horizon_ms"),
    )
    return integral.crossJoin(F.broadcast(direct)).select(
        F.col("n").alias("n_intervals"),
        F.col("area_ms").alias("concurrency_time_integral_ms"),
        F.col("dur_ms").alias("total_duration_ms"),
        (F.col("area_ms") - F.col("dur_ms")).cast("bigint").alias(
            "identity_gap"
        ),
        F.round(
            F.col("area_ms").cast("double") / F.col("horizon_ms"), 6
        ).alias("avg_concurrency"),
    )


def _ktruss_oracle(rounds: int = 3) -> str:
    """3-truss peeling unrolled: per round, drop edges supported by
    fewer than 1 triangle, recompute — fixpoint within ``rounds`` on
    gate-sized graphs (the Spark side iterates the same fixed count)."""
    parts = ["""so AS (SELECT DISTINCT l_suppkey AS s, l_orderkey AS o FROM lineitem),
    w AS (
      SELECT a.s AS u, b.s AS v, COUNT(*) AS c
      FROM so a JOIN so b ON a.o = b.o AND a.s < b.s
      GROUP BY a.s, b.s),
    sym AS (
      SELECT u AS x, v AS y, c FROM w
      UNION ALL SELECT v AS x, u AS y, c FROM w),
    sel AS (
      SELECT x, y FROM (
        SELECT x, y,
               ROW_NUMBER() OVER (PARTITION BY x ORDER BY c DESC, y) AS rn
        FROM sym)
      WHERE rn <= 3),
    e0 AS (SELECT DISTINCT least(x, y) AS u, greatest(x, y) AS v FROM sel)"""]
    prev = "e0"
    for r in range(1, rounds + 1):
        parts.append(f"""sup{r} AS (
      SELECT e.u, e.v, COUNT(w2.a) AS s
      FROM {prev} e
      LEFT JOIN (
        SELECT e1.u AS a, e1.v AS b, e2.v AS c
        FROM {prev} e1 JOIN {prev} e2 ON e2.u = e1.v
        JOIN {prev} e3 ON e3.u = e1.u AND e3.v = e2.v) w2
        ON (w2.a = e.u AND w2.b = e.v) OR (w2.b = e.u AND w2.c = e.v)
        OR (w2.a = e.u AND w2.c = e.v)
      GROUP BY e.u, e.v),
    e{r} AS (SELECT u, v FROM sup{r} WHERE s >= 1)""")
        prev = f"e{r}"
    ctes = ",\n    ".join(parts)
    return f"""
    WITH {ctes}
    SELECT (SELECT COUNT(*) FROM e0) AS n_edges_initial,
           (SELECT COUNT(*) FROM {prev}) AS n_edges_3truss,
           (SELECT COUNT(DISTINCT u) FROM
             (SELECT u FROM {prev} UNION ALL SELECT v FROM {prev}) t)
             AS n_nodes_3truss
    """


@register("graph_ktruss_edges", oracle=_ktruss_oracle())
def graph_ktruss_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-truss decomposition — the EDGE-cohesion refinement of k-core:
    iteratively delete every edge supported by no triangle until stable
    (3 peeling rounds, fixpoint on this graph). Each round reuses the
    oriented triangle-enumeration joins from the exact triangle count,
    then a support aggregate per edge; the surviving subgraph is where
    community structure actually lives. The oracle replays every
    peeling round."""
    li = _t(spark, sf_dir, "lineitem")
    so = li.select(
        F.col("l_suppkey").alias("s"), F.col("l_orderkey").alias("o")
    ).distinct()
    wdf = (
        so.alias("a")
        .join(
            so.alias("b"),
            (F.col("a.o") == F.col("b.o")) & (F.col("a.s") < F.col("b.s")),
        )
        .groupBy(F.col("a.s").alias("u"), F.col("b.s").alias("v"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    e = graph_mod.top_k_cooccurrence_edges(wdf, k=3)
    e = e.localCheckpoint(eager=True)
    n_initial = e.count()
    for _ in range(3):
        e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
        tris = (
            e1.join(e2, F.col("e2.u") == F.col("e1.v"))
            .join(
                e3,
                (F.col("e3.u") == F.col("e1.u"))
                & (F.col("e3.v") == F.col("e2.v")),
            )
            .select(
                F.col("e1.u").alias("a"),
                F.col("e1.v").alias("b"),
                F.col("e2.v").alias("c"),
            )
        )
        sup = (
            e.alias("e")
            .join(
                tris.alias("t"),
                (
                    (F.col("t.a") == F.col("e.u"))
                    & (F.col("t.b") == F.col("e.v"))
                )
                | (
                    (F.col("t.b") == F.col("e.u"))
                    & (F.col("t.c") == F.col("e.v"))
                )
                | (
                    (F.col("t.a") == F.col("e.u"))
                    & (F.col("t.c") == F.col("e.v"))
                ),
                "left",
            )
            .groupBy(F.col("e.u").alias("u"), F.col("e.v").alias("v"))
            .agg(F.count(F.col("t.a")).alias("s"))
        )
        e = sup.filter(F.col("s") >= 1).select("u", "v")
        e = e.localCheckpoint(eager=True)
    nodes = (
        e.select("u")
        .unionAll(e.select(F.col("v").alias("u")))
        .agg(F.countDistinct("u").alias("n_nodes_3truss"))
    )
    counts = e.agg(F.count(F.lit(1)).alias("n_edges_3truss"))
    return (
        counts.crossJoin(F.broadcast(nodes))
        .select(
            F.lit(n_initial).cast("bigint").alias("n_edges_initial"),
            F.col("n_edges_3truss").cast("bigint"),
            F.col("n_nodes_3truss").cast("bigint"),
        )
    )


@register(
    "char_entropy_compression_bound",
    oracle="""
    WITH ch AS (
      SELECT source, unnest(string_split(text, '')) AS c
      FROM documents WHERE len(text) > 0),
    freq AS (SELECT source, c, COUNT(*) AS n FROM ch GROUP BY source, c),
    tot AS (SELECT source, SUM(n) AS t FROM freq GROUP BY source),
    terms AS (
      SELECT f.source, f.c,
             -(CAST(f.n AS DOUBLE) / t.t) *
              ln(CAST(f.n AS DOUBLE) / t.t) AS h_term,
             t.t
      FROM freq f JOIN tot t ON t.source = f.source)
    SELECT source,
           CAST(MAX(t) AS BIGINT) AS n_chars,
           COUNT(*) AS alphabet_size,
           ROUND(list_reduce(list(h_term ORDER BY c), (a, b) -> a + b)
                 / ln(CAST(2 AS DOUBLE)), 6) AS entropy_bits_per_char,
           CAST(CEIL(MAX(t) *
                     list_reduce(list(h_term ORDER BY c), (a, b) -> a + b)
                     / ln(CAST(2 AS DOUBLE)) / 8) AS BIGINT)
             AS min_bytes_order0
    FROM terms GROUP BY source ORDER BY source
    """,
)
def char_entropy_compression_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-0 compression bound per source: Shannon entropy of the
    character distribution (entropy terms folded in character order so
    the float sum is order-identical across engines) gives the
    theoretical minimum bytes any memoryless coder can reach — the
    storage-planning number to compare against actual codec ratios.
    Alphabet counts and totals stay integer; the fold and two divisions
    are the only floats."""
    docs = _t(spark, sf_dir, "documents")
    ch = docs.filter(F.length("text") > 0).select(
        "source", F.explode(F.split("text", "")).alias("c")
    )
    freq = ch.groupBy("source", "c").agg(F.count(F.lit(1)).alias("n"))
    tot = freq.groupBy("source").agg(F.sum("n").alias("t"))
    terms = freq.join(tot, "source").select(
        "source",
        "c",
        "t",
        (
            -(F.col("n").cast("double") / F.col("t"))
            * F.log(F.col("n").cast("double") / F.col("t"))
        ).alias("h_term"),
    )
    import math as _math

    ln2 = _math.log(2.0)
    folded = terms.groupBy("source").agg(
        F.max("t").cast("bigint").alias("n_chars"),
        F.count(F.lit(1)).alias("alphabet_size"),
        F.expr(
            "aggregate(array_sort(collect_list(struct(c, h_term))), "
            "cast(0 as double), (acc, e) -> acc + e.h_term)"
        ).alias("h_nat"),
    )
    return folded.select(
        "source",
        "n_chars",
        "alphabet_size",
        F.round(F.col("h_nat") / F.lit(ln2), 6).alias(
            "entropy_bits_per_char"
        ),
        F.ceil(F.col("n_chars") * F.col("h_nat") / F.lit(ln2) / 8)
        .cast("bigint")
        .alias("min_bytes_order0"),
    ).orderBy("source")


@register(
    "mutual_information_feature_label",
    oracle="""
    WITH f AS (
      SELECT label,
             CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END AS fbin
      FROM embeddings),
    cells AS (SELECT label, fbin, COUNT(*) AS n FROM f GROUP BY label, fbin),
    tot AS (SELECT SUM(n) AS t FROM cells),
    margins AS (
      SELECT c.label, c.fbin, c.n,
             SUM(c.n) OVER (PARTITION BY c.label) AS nl,
             SUM(c.n) OVER (PARTITION BY c.fbin) AS nf,
             (SELECT t FROM tot) AS t
      FROM cells c),
    terms AS (
      SELECT label, fbin,
             (CAST(n AS DOUBLE) / t) *
             ln((CAST(n AS DOUBLE) * t) / (CAST(nl AS DOUBLE) * nf))
               AS mi_term
      FROM margins)
    SELECT (SELECT CAST(t AS BIGINT) FROM tot) AS n_points,
           COUNT(*) AS n_cells,
           ROUND(list_reduce(list(mi_term ORDER BY label, fbin),
                             (a, b) -> a + b) /
                 ln(CAST(2 AS DOUBLE)), 6) AS mi_bits
    FROM terms
    """,
)
def mutual_information_feature_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between a binarized embedding feature (sign of
    dimension 0) and the class label — the feature-selection screen run
    before training anything: integer contingency cells and margins
    feed per-cell MI terms folded in fixed (label, bin) order, one
    ln(2) division at the end. Zero bits means the feature is useless
    for this label; the exact arithmetic makes the threshold decision
    reproducible."""
    emb = _t(spark, sf_dir, "embeddings")
    f = emb.select(
        "label",
        F.when(F.expr("embedding[0]") >= 0, 1).otherwise(0).alias("fbin"),
    )
    cells = f.groupBy("label", "fbin").agg(F.count(F.lit(1)).alias("n"))
    wl = Window.partitionBy("label")
    wf = Window.partitionBy("fbin")
    wg = Window.partitionBy()
    margins = cells.select(
        "label",
        "fbin",
        "n",
        F.sum("n").over(wl).alias("nl"),
        F.sum("n").over(wf).alias("nf"),
        F.sum("n").over(wg).alias("t"),
    )
    terms = margins.select(
        "label",
        "fbin",
        "t",
        (
            (F.col("n").cast("double") / F.col("t"))
            * F.log(
                (F.col("n").cast("double") * F.col("t"))
                / (F.col("nl").cast("double") * F.col("nf"))
            )
        ).alias("mi_term"),
    )
    import math as _math

    return terms.agg(
        F.max("t").cast("bigint").alias("n_points"),
        F.count(F.lit(1)).alias("n_cells"),
        F.round(
            F.expr(
                "aggregate(array_sort(collect_list(struct(label, fbin, mi_term))), "
                "cast(0 as double), (acc, e) -> acc + e.mi_term)"
            )
            / F.lit(_math.log(2.0)),
            6,
        ).alias("mi_bits"),
    )


@register(
    "surprising_edges_null_model",
    oracle="""
    WITH so AS (SELECT DISTINCT l_suppkey AS s, l_orderkey AS o FROM lineitem),
    w AS (
      SELECT a.s AS u, b.s AS v, COUNT(*) AS obs
      FROM so a JOIN so b ON a.o = b.o AND a.s < b.s
      GROUP BY a.s, b.s),
    deg AS (
      SELECT s, CAST(SUM(obs) AS BIGINT) AS d FROM (
        SELECT u AS s, obs FROM w UNION ALL SELECT v, obs FROM w) t
      GROUP BY s),
    m AS (SELECT CAST(SUM(obs) AS BIGINT) AS m FROM w),
    scored AS (
      SELECT w.u, w.v, w.obs, du.d AS d_u, dv.d AS d_v,
             CAST(w.obs AS DOUBLE) * 2 * (SELECT m FROM m) /
             (CAST(du.d AS DOUBLE) * dv.d) AS lift
      FROM w JOIN deg du ON du.s = w.u JOIN deg dv ON dv.s = w.v
      WHERE w.obs >= 3)
    SELECT u, v, CAST(obs AS BIGINT) AS obs,
           CAST(d_u AS BIGINT) AS d_u, CAST(d_v AS BIGINT) AS d_v,
           ROUND(lift, 6) AS lift
    FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY lift DESC, u, v) AS rn
          FROM scored)
    WHERE rn <= 20 ORDER BY lift DESC, u, v
    """,
)
def surprising_edges_null_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge significance under the configuration null model: observed
    co-order weight vs the degree-preserving expectation d_u·d_v / 2m —
    the lift that separates structurally MEANINGFUL supplier
    relationships from what their sheer activity levels would produce
    by chance. Weighted degrees and totals are exact integers; the lift
    is a single-expression double. Min-support 3 keeps the tail of
    one-off co-orders out of the ranking."""
    li = _t(spark, sf_dir, "lineitem")
    so = li.select(
        F.col("l_suppkey").alias("s"), F.col("l_orderkey").alias("o")
    ).distinct()
    w = (
        so.alias("a")
        .join(
            so.alias("b"),
            (F.col("a.o") == F.col("b.o")) & (F.col("a.s") < F.col("b.s")),
        )
        .groupBy(F.col("a.s").alias("u"), F.col("b.s").alias("v"))
        .agg(F.count(F.lit(1)).alias("obs"))
    )
    w = op_cache.track(w.cache())
    deg = (
        w.select(F.col("u").alias("s"), "obs")
        .unionAll(w.select(F.col("v").alias("s"), "obs"))
        .groupBy("s")
        .agg(F.sum("obs").cast("bigint").alias("d"))
    )
    m = int(w.agg(F.sum("obs")).collect()[0][0])
    scored = (
        w.filter(F.col("obs") >= 3)
        .join(deg.select(F.col("s").alias("u"), F.col("d").alias("d_u")), "u")
        .join(deg.select(F.col("s").alias("v"), F.col("d").alias("d_v")), "v")
        .select(
            "u",
            "v",
            "obs",
            "d_u",
            "d_v",
            (
                F.col("obs").cast("double")
                * 2
                * m
                / (F.col("d_u").cast("double") * F.col("d_v"))
            ).alias("lift"),
        )
    )
    wr = Window.orderBy(F.desc("lift"), "u", "v")
    return (
        scored.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= 20)
        .select(
            "u",
            "v",
            F.col("obs").cast("bigint").alias("obs"),
            F.col("d_u").cast("bigint").alias("d_u"),
            F.col("d_v").cast("bigint").alias("d_v"),
            F.round("lift", 6).alias("lift"),
        )
        .orderBy(F.desc("lift"), "u", "v")
    )


@register(
    "target_encoding_smoothed",
    oracle="""
    WITH g AS (
      SELECT SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS s, COUNT(*) AS n
      FROM orders),
    cat AS (
      SELECT n.n_name AS nation,
             SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS s, COUNT(*) AS n
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY n.n_name)
    SELECT cat.nation, CAST(cat.n AS BIGINT) AS n_orders,
           ROUND(CAST(cat.s AS DOUBLE) / cat.n, 4) AS raw_mean,
           -- m-estimate with m=100 pseudo-observations at the global mean
           ROUND((CAST(cat.s AS DOUBLE) +
                  100 * (CAST(g.s AS DOUBLE) / g.n)) /
                 (cat.n + 100), 4) AS smoothed_mean
    FROM cat, g ORDER BY nation
    """,
)
def target_encoding_smoothed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed target encoding (the m-estimate) — the categorical
    feature-engineering staple: each nation's mean order value shrunk
    toward the global mean by 100 pseudo-observations, so rare
    categories don't memorize noise. DECIMAL-exact sums feed
    single-expression double ratios; the raw-vs-smoothed gap per
    category is the shrinkage audit."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    g = o.agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("gs"),
        F.count(F.lit(1)).alias("gn"),
    )
    cat = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    return (
        cat.crossJoin(F.broadcast(g))
        .select(
            "nation",
            F.col("n").cast("bigint").alias("n_orders"),
            F.round(F.col("s").cast("double") / F.col("n"), 4).alias(
                "raw_mean"
            ),
            F.round(
                (
                    F.col("s").cast("double")
                    + 100 * (F.col("gs").cast("double") / F.col("gn"))
                )
                / (F.col("n") + 100),
                4,
            ).alias("smoothed_mean"),
        )
        .orderBy("nation")
    )


@register(
    "term_burstiness_top20",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS t
      FROM documents WHERE trim(text) <> ''),
    stats AS (
      SELECT t, COUNT(*) AS cf, COUNT(DISTINCT doc_id) AS df
      FROM tok GROUP BY t HAVING COUNT(DISTINCT doc_id) >= 5)
    SELECT t AS term, CAST(cf AS BIGINT) AS collection_freq,
           CAST(df AS BIGINT) AS doc_freq,
           ROUND(CAST(cf AS DOUBLE) / df, 6) AS burstiness
    FROM (SELECT *, ROW_NUMBER() OVER (
            ORDER BY CAST(cf AS DOUBLE) / df DESC, t) AS rn
          FROM stats)
    WHERE rn <= 20 ORDER BY burstiness DESC, term
    """,
)
def term_burstiness_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Church-Gale term burstiness: collection frequency over document
    frequency — terms that repeat heavily WITHIN the documents that
    contain them (topical words) vs terms spread thinly everywhere
    (function words). The adaptation signal behind better-than-Poisson
    term weighting; one token aggregate, integer counts, ranked by a
    single-expression ratio with deterministic tiebreak."""
    docs = _t(spark, sf_dir, "documents")
    tok = docs.filter(F.trim("text") != "").select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("t"),
    )
    stats = (
        tok.groupBy("t")
        .agg(
            F.count(F.lit(1)).alias("cf"),
            F.countDistinct("doc_id").alias("df"),
        )
        .filter(F.col("df") >= 5)
    )
    w = Window.orderBy(
        F.desc(F.col("cf").cast("double") / F.col("df")), "t"
    )
    return (
        stats.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select(
            F.col("t").alias("term"),
            F.col("cf").cast("bigint").alias("collection_freq"),
            F.col("df").cast("bigint").alias("doc_freq"),
            F.round(F.col("cf").cast("double") / F.col("df"), 6).alias(
                "burstiness"
            ),
        )
        .orderBy(F.desc("burstiness"), "term")
    )


@register(
    "markov_entropy_rate",
    oracle="""
    WITH seq AS (
      SELECT event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events),
    trans AS (
      SELECT event_type AS prev, nxt, COUNT(*) AS n
      FROM seq WHERE nxt IS NOT NULL GROUP BY prev, nxt),
    ptot AS (SELECT prev, SUM(n) AS np FROM trans GROUP BY prev),
    tot AS (SELECT SUM(n) AS t FROM trans),
    cond_terms AS (
      SELECT t.prev, t.nxt,
             -(CAST(t.n AS DOUBLE) / (SELECT t FROM tot)) *
              ln(CAST(t.n AS DOUBLE) / p.np) AS h_term
      FROM trans t JOIN ptot p ON p.prev = t.prev),
    uni AS (
      SELECT event_type AS s, COUNT(*) AS n FROM events GROUP BY event_type),
    utot AS (SELECT SUM(n) AS t FROM uni),
    uni_terms AS (
      SELECT s, -(CAST(n AS DOUBLE) / (SELECT t FROM utot)) *
                ln(CAST(n AS DOUBLE) / (SELECT t FROM utot)) AS h_term
      FROM uni)
    SELECT ROUND((SELECT list_reduce(list(h_term ORDER BY s), (a, b) -> a + b)
                  FROM uni_terms) / ln(CAST(2 AS DOUBLE)), 6)
             AS unigram_entropy_bits,
           ROUND((SELECT list_reduce(list(h_term ORDER BY prev, nxt),
                                     (a, b) -> a + b)
                  FROM cond_terms) / ln(CAST(2 AS DOUBLE)), 6)
             AS entropy_rate_bits,
           (SELECT CAST(t AS BIGINT) FROM tot) AS n_transitions
    """,
)
def markov_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order entropy rate of user behavior: H(next | prev) over
    the transition matrix vs the order-0 unigram entropy — the gap is
    exactly how much knowing the previous action predicts the next one
    (the information-theoretic ceiling for any next-event model, which
    markov_next_event_accuracy should approach). All counts integer,
    entropy terms folded in fixed key order."""
    ev = _t(spark, sf_dir, "events")
    wseq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.select(
            F.col("event_type").alias("prev"),
            F.lead("event_type").over(wseq).alias("nxt"),
        )
        .filter(F.col("nxt").isNotNull())
        .groupBy("prev", "nxt")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    trans = op_cache.track(trans.cache())
    ptot = trans.groupBy("prev").agg(F.sum("n").alias("np"))
    tot = int(trans.agg(F.sum("n")).collect()[0][0])
    cond = trans.join(F.broadcast(ptot), "prev").select(
        "prev",
        "nxt",
        (
            -(F.col("n").cast("double") / F.lit(float(tot)))
            * F.log(F.col("n").cast("double") / F.col("np"))
        ).alias("h_term"),
    )
    import math as _math

    ln2 = _math.log(2.0)
    h_cond = cond.agg(
        F.expr(
            "aggregate(array_sort(collect_list(struct(prev, nxt, h_term))), "
            "cast(0 as double), (acc, e) -> acc + e.h_term)"
        ).alias("h")
    )
    uni = ev.groupBy(F.col("event_type").alias("s")).agg(
        F.count(F.lit(1)).alias("n")
    )
    utot = int(uni.agg(F.sum("n")).collect()[0][0])
    h_uni = uni.select(
        "s",
        (
            -(F.col("n").cast("double") / F.lit(float(utot)))
            * F.log(F.col("n").cast("double") / F.lit(float(utot)))
        ).alias("h_term"),
    ).agg(
        F.expr(
            "aggregate(array_sort(collect_list(struct(s, h_term))), "
            "cast(0 as double), (acc, e) -> acc + e.h_term)"
        ).alias("h")
    )
    return (
        h_uni.crossJoin(F.broadcast(h_cond.withColumnRenamed("h", "hc")))
        .select(
            F.round(F.col("h") / ln2, 6).alias("unigram_entropy_bits"),
            F.round(F.col("hc") / ln2, 6).alias("entropy_rate_bits"),
            F.lit(tot).cast("bigint").alias("n_transitions"),
        )
    )


@register(
    "embedding_isotropy_score",
    oracle="""
    WITH n AS (SELECT COUNT(*) AS n FROM embeddings),
    pairs AS (
      SELECT a.vec_id, a.embedding AS va, b.embedding AS vb
      FROM embeddings a
      JOIN embeddings b
        ON b.vec_id = (a.vec_id + (SELECT n // 2 FROM n)) % (SELECT n FROM n)
      WHERE a.vec_id < (SELECT n // 2 FROM n)),
    cos AS (
      SELECT vec_id,
             list_dot_product([CAST(x AS DOUBLE) FOR x IN va],
                              [CAST(x AS DOUBLE) FOR x IN vb]) /
             (sqrt(list_dot_product([CAST(x AS DOUBLE) FOR x IN va],
                                    [CAST(x AS DOUBLE) FOR x IN va])) *
              sqrt(list_dot_product([CAST(x AS DOUBLE) FOR x IN vb],
                                    [CAST(x AS DOUBLE) FOR x IN vb])))
               AS c
      FROM pairs)
    SELECT COUNT(*) AS n_pairs,
           ROUND(list_reduce(list(c ORDER BY vec_id), (a, b) -> a + b) /
                 COUNT(*), 6) AS mean_offdiag_cosine,
           ROUND(MAX(c), 6) AS max_pair_cosine,
           ROUND(MIN(c), 6) AS min_pair_cosine
    FROM cos
    """,
)
def embedding_isotropy_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space isotropy screen: the mean cosine between
    deterministically paired unrelated vectors (i with i + n/2) — an
    isotropic space centers this near zero; a large positive mean is
    the anisotropy cone that degrades cosine retrieval and motivates
    whitening. Cosines fold in id order so the mean is order-exact;
    min/max bracket the spread."""
    emb = _t(spark, sf_dir, "embeddings")
    n = emb.count()
    half = n // 2
    a = emb.select(
        "vec_id", F.col("embedding").alias("va")
    ).filter(F.col("vec_id") < half)
    b = emb.select(
        F.col("vec_id").alias("bid"), F.col("embedding").alias("vb")
    )
    pairs = a.join(
        b, F.col("bid") == (F.col("vec_id") + half) % n
    )
    cos = pairs.select(
        "vec_id", sim_mod.cosine(F.col("va"), F.col("vb")).alias("c")
    )
    return cos.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(
            F.expr(
                "aggregate(array_sort(collect_list(struct(vec_id, c))), "
                "cast(0 as double), (acc, e) -> acc + e.c)"
            )
            / F.count(F.lit(1)),
            6,
        ).alias("mean_offdiag_cosine"),
        F.round(F.max("c"), 6).alias("max_pair_cosine"),
        F.round(F.min("c"), 6).alias("min_pair_cosine"),
    )


@register(
    "timestamp_delta_encoding_stats",
    oracle="""
    WITH d AS (
      SELECT user_id,
             epoch_ms(ts) - LAG(epoch_ms(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS delta
      FROM events),
    sized AS (
      SELECT user_id, delta,
             CASE WHEN delta IS NULL THEN 8
                  WHEN delta < 128 THEN 1
                  WHEN delta < 16384 THEN 2
                  WHEN delta < 2097152 THEN 3
                  WHEN delta < 268435456 THEN 4
                  ELSE 5 END AS varint_bytes
      FROM d)
    SELECT COUNT(*) AS n_timestamps,
           CAST(COUNT(*) * 8 AS BIGINT) AS raw_bytes,
           CAST(SUM(varint_bytes) AS BIGINT) AS delta_varint_bytes,
           ROUND(1 - CAST(SUM(varint_bytes) AS DOUBLE) / (COUNT(*) * 8), 6)
             AS compression_ratio
    FROM sized
    """,
)
def timestamp_delta_encoding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-of-delta storage planning: per-user timestamp deltas sized
    as varints (7 bits per byte, full 8 bytes for each stream head)
    against raw 8-byte encoding — the arithmetic every time-series
    storage engine (Gorilla, Parquet DELTA_BINARY_PACKED) banks on,
    computed exactly so the compression-ratio estimate is a number, not
    a hope. One lag window, integer byte counts."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    d = ev.select(
        (F.unix_millis("ts") - F.lag(F.unix_millis("ts")).over(w)).alias(
            "delta"
        )
    )
    sized = d.select(
        F.when(F.col("delta").isNull(), 8)
        .when(F.col("delta") < 128, 1)
        .when(F.col("delta") < 16384, 2)
        .when(F.col("delta") < 2097152, 3)
        .when(F.col("delta") < 268435456, 4)
        .otherwise(5)
        .alias("varint_bytes")
    )
    return sized.agg(
        F.count(F.lit(1)).alias("n_timestamps"),
        (F.count(F.lit(1)) * 8).cast("bigint").alias("raw_bytes"),
        F.sum("varint_bytes").cast("bigint").alias("delta_varint_bytes"),
        F.round(
            1
            - F.sum("varint_bytes").cast("double")
            / (F.count(F.lit(1)) * 8),
            6,
        ).alias("compression_ratio"),
    )


@register(
    "blocking_recall_eval",
    oracle="""
    WITH sub AS (
      SELECT p_partkey, p_name, p_brand FROM part WHERE p_partkey % 10 = 0),
    truth AS (
      SELECT a.p_partkey AS ia, b.p_partkey AS ib,
             CASE WHEN a.p_brand = b.p_brand THEN 1 ELSE 0 END AS same_block
      FROM sub a JOIN sub b ON a.p_partkey < b.p_partkey
      WHERE levenshtein(a.p_name, b.p_name) <= 2)
    SELECT COUNT(*) AS n_true_pairs,
           CAST(SUM(same_block) AS BIGINT) AS n_found_in_block,
           ROUND(CAST(SUM(same_block) AS DOUBLE) /
                 GREATEST(COUNT(*), 1), 6) AS blocking_recall
    FROM truth
    """,
)
def blocking_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking-recall evaluation — the number every entity-resolution
    pipeline must publish: of all TRUE fuzzy matches (Levenshtein <= 2,
    computed exhaustively on a 10% key-sampled evaluation subset, the
    standard way to afford ground truth), what fraction would the
    brand-blocking strategy have even compared? Recall below target
    means the block key is wrong, no matter how good the matcher is."""
    part = _t(spark, sf_dir, "part")
    sub = part.filter(F.col("p_partkey") % 10 == 0).select(
        "p_partkey", "p_name", "p_brand"
    )
    a = sub.select(
        F.col("p_partkey").alias("ia"),
        F.col("p_name").alias("na"),
        F.col("p_brand").alias("ba"),
    )
    b = sub.select(
        F.col("p_partkey").alias("ib"),
        F.col("p_name").alias("nb"),
        F.col("p_brand").alias("bb"),
    )
    truth = (
        a.join(b, F.col("ia") < F.col("ib"))
        .filter(F.levenshtein("na", "nb") <= 2)
        .select(
            F.when(F.col("ba") == F.col("bb"), 1).otherwise(0).alias(
                "same_block"
            )
        )
    )
    return truth.agg(
        F.count(F.lit(1)).alias("n_true_pairs"),
        F.sum("same_block").cast("bigint").alias("n_found_in_block"),
        F.round(
            F.sum("same_block").cast("double")
            / F.greatest(F.count(F.lit(1)), F.lit(1)),
            6,
        ).alias("blocking_recall"),
    )


def _densest_oracle(rounds: int = 3) -> str:
    parts = ["""so AS (SELECT DISTINCT l_suppkey AS s, l_orderkey AS o FROM lineitem),
    w AS (
      SELECT a.s AS u, b.s AS v, COUNT(*) AS c
      FROM so a JOIN so b ON a.o = b.o AND a.s < b.s
      GROUP BY a.s, b.s),
    sym AS (
      SELECT u AS x, v AS y, c FROM w
      UNION ALL SELECT v AS x, u AS y, c FROM w),
    sel AS (
      SELECT x, y FROM (
        SELECT x, y,
               ROW_NUMBER() OVER (PARTITION BY x ORDER BY c DESC, y) AS rn
        FROM sym)
      WHERE rn <= 3),
    e0 AS (SELECT DISTINCT least(x, y) AS u, greatest(x, y) AS v FROM sel)"""]
    stats = []
    prev = "e0"
    for r in range(1, rounds + 1):
        parts.append(f"""deg{r} AS (
      SELECT s, COUNT(*) AS d FROM (
        SELECT u AS s FROM {prev} UNION ALL SELECT v FROM {prev}) t
      GROUP BY s),
    avg{r} AS (
      SELECT 2 * (SELECT COUNT(*) FROM {prev}) AS sum_d,
             (SELECT COUNT(*) FROM deg{r}) AS n),
    keep{r} AS (
      -- parallel peel: keep nodes with degree >= (1+eps) * average,
      -- eps = 1/10, compared exactly: 10 * n * d >= 11 * sum_d
      SELECT s FROM deg{r}, avg{r}
      WHERE 10 * GREATEST(avg{r}.n, 1) * deg{r}.d >= 11 * avg{r}.sum_d),
    e{r} AS (
      SELECT e.u, e.v FROM {prev} e
      JOIN keep{r} ka ON ka.s = e.u JOIN keep{r} kb ON kb.s = e.v)""")
        stats.append(
            f"SELECT {r} AS round, (SELECT n FROM avg{r}) AS n_nodes, "
            f"(SELECT COUNT(*) FROM {prev}) AS n_edges"
        )
        prev = f"e{r}"
    ctes = ",\n    ".join(parts)
    union = "\n      UNION ALL ".join(stats)
    return f"""
    WITH {ctes}
    SELECT CAST(round AS INT) AS round,
           CAST(n_nodes AS BIGINT) AS n_nodes,
           CAST(n_edges AS BIGINT) AS n_edges,
           ROUND(CAST(n_edges AS DOUBLE) / GREATEST(n_nodes, 1), 6)
             AS density
    FROM ({union}) ORDER BY round
    """


@register("graph_densest_subgraph_peel", oracle=_densest_oracle())
def graph_densest_subgraph_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Densest-subgraph by parallel peeling (Bahmani et al., the
    MapReduce (2+eps)-approximation): each round removes every node
    whose degree is below (1+eps) times the current average — an exact
    integer comparison (10·n·d >= 11·Σd), no float thresholds — and
    O(log n) rounds suffice where the sequential Charikar peel needs n.
    Per-round node/edge counts and density trace the densification; the
    oracle replays every round."""
    li = _t(spark, sf_dir, "lineitem")
    so = li.select(
        F.col("l_suppkey").alias("s"), F.col("l_orderkey").alias("o")
    ).distinct()
    wdf = (
        so.alias("a")
        .join(
            so.alias("b"),
            (F.col("a.o") == F.col("b.o")) & (F.col("a.s") < F.col("b.s")),
        )
        .groupBy(F.col("a.s").alias("u"), F.col("b.s").alias("v"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    e = graph_mod.top_k_cooccurrence_edges(wdf, k=3)
    e = e.localCheckpoint(eager=True)
    rows = []
    for r in (1, 2, 3):
        n_edges = e.count()
        deg = (
            e.select(F.col("u").alias("s"))
            .unionAll(e.select(F.col("v").alias("s")))
            .groupBy("s")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        deg = deg.localCheckpoint(eager=True)
        n_nodes = deg.count()
        rows.append((r, n_nodes, n_edges))
        sum_d = 2 * n_edges
        keep = deg.filter(
            10 * max(n_nodes, 1) * F.col("d") >= 11 * sum_d
        ).select("s")
        e = (
            e.join(keep.withColumnRenamed("s", "u"), "u", "left_semi")
            .join(keep.withColumnRenamed("s", "v"), "v", "left_semi")
            .select("u", "v")
        )
        e = e.localCheckpoint(eager=True)
    # density rounds in Spark SQL (HALF_UP like DuckDB), not Python's
    # banker's round
    return (
        spark.createDataFrame(
            rows, "round int, n_nodes bigint, n_edges bigint"
        )
        .select(
            "round",
            "n_nodes",
            "n_edges",
            F.round(
                F.col("n_edges").cast("double")
                / F.greatest(F.col("n_nodes"), F.lit(1)),
                6,
            ).alias("density"),
        )
        .orderBy("round")
    )


@register(
    "quantile_treatment_effect",
    oracle="""
    WITH pool AS (
      SELECT o_totalprice AS v,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 'a' ELSE 'b' END AS g
      FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
    ranked AS (
      SELECT g, v,
             ROW_NUMBER() OVER (PARTITION BY g ORDER BY v) AS rk,
             COUNT(*) OVER (PARTITION BY g) AS n
      FROM pool),
    qs AS (
      SELECT q.lvl, r.g,
             MAX(CASE WHEN 100 * r.rk <= q.lvl * r.n + 100 THEN r.v END)
               AS qv
      FROM ranked r, (SELECT unnest([25, 50, 75]) AS lvl) q
      GROUP BY q.lvl, r.g)
    SELECT CAST(a.lvl AS INT) AS quantile_pct,
           ROUND(a.qv, 2) AS q_urgent,
           ROUND(b.qv, 2) AS q_low,
           ROUND(a.qv - b.qv, 2) AS qte
    FROM qs a JOIN qs b ON b.lvl = a.lvl AND a.g = 'a' AND b.g = 'b'
    ORDER BY quantile_pct
    """,
)
def quantile_treatment_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile treatment effects — the distributional comparison a mean
    difference hides: the P25/P50/P75 order-total gap between urgent
    and low-priority groups, each quantile an exact nearest-rank
    SELECTION (integer comparisons, no interpolation), so effects at
    the tails and the middle are separately attributable. One rank
    window per group; the 3-level grid is a broadcast."""
    o = _t(spark, sf_dir, "orders")
    pool = o.filter(
        F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
    ).select(
        F.col("o_totalprice").alias("v"),
        F.when(F.col("o_orderpriority") == "1-URGENT", "a")
        .otherwise("b")
        .alias("g"),
    )
    wr = Window.partitionBy("g").orderBy("v")
    wn = Window.partitionBy("g")
    ranked = pool.select(
        "g",
        "v",
        F.row_number().over(wr).alias("rk"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    lvls = spark.createDataFrame([(25,), (50,), (75,)], "lvl int")
    qs = (
        ranked.crossJoin(F.broadcast(lvls))
        .groupBy("lvl", "g")
        .agg(
            F.max(
                F.when(
                    100 * F.col("rk") <= F.col("lvl") * F.col("n") + 100,
                    F.col("v"),
                )
            ).alias("qv")
        )
    )
    a = qs.filter(F.col("g") == "a").select(
        "lvl", F.col("qv").alias("qa")
    )
    b = qs.filter(F.col("g") == "b").select(
        F.col("lvl").alias("lb"), F.col("qv").alias("qb")
    )
    return (
        a.join(b, a.lvl == b.lb)
        .select(
            F.col("lvl").cast("int").alias("quantile_pct"),
            F.round("qa", 2).alias("q_urgent"),
            F.round("qb", 2).alias("q_low"),
            F.round(F.col("qa") - F.col("qb"), 2).alias("qte"),
        )
        .orderBy("quantile_pct")
    )


@register(
    "ab_srm_check",
    oracle="""
    WITH assign AS (
      SELECT CASE WHEN CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)
                                               || ':ab'), 1, 15) AS BIGINT)
                       % 2 = 0
                  THEN 'control' ELSE 'treatment' END AS arm
      FROM (SELECT DISTINCT user_id FROM events)),
    counts AS (
      SELECT CAST(SUM(CASE WHEN arm = 'control' THEN 1 ELSE 0 END)
                  AS BIGINT) AS nc,
             CAST(SUM(CASE WHEN arm = 'treatment' THEN 1 ELSE 0 END)
                  AS BIGINT) AS nt
      FROM assign)
    SELECT nc AS n_control, nt AS n_treatment,
           -- chi-square GOF vs 50/50: (nc - nt)^2 / (nc + nt), exact ints
           ROUND(CAST((nc - nt) * (nc - nt) AS DOUBLE) / (nc + nt), 6)
             AS chi_square,
           CASE WHEN CAST((nc - nt) * (nc - nt) AS DOUBLE) / (nc + nt)
                     > CAST(3.841 AS DOUBLE)
                THEN 1 ELSE 0 END AS srm_flag
    FROM counts
    """,
)
def ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch guardrail — the first check every A/B
    readout must pass: users hash-split 50/50, the chi-square
    goodness-of-fit statistic (algebraically (nc-nt)²/(nc+nt) for two
    equal-probability cells, exact integers until one division) flagged
    at the 0.05 critical value. An SRM flag means the assignment or
    logging is broken and every downstream metric is invalid."""
    ev = _t(spark, sf_dir, "events")
    users = ev.select("user_id").distinct()
    arm = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("user_id").cast("string"), F.lit(":ab"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % 2
    )
    counts = users.select(arm.alias("a")).agg(
        F.sum(F.when(F.col("a") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("nc"),
        F.sum(F.when(F.col("a") != 0, 1).otherwise(0))
        .cast("bigint")
        .alias("nt"),
    )
    chi = (
        (F.col("nc") - F.col("nt")) * (F.col("nc") - F.col("nt"))
    ).cast("double") / (F.col("nc") + F.col("nt"))
    return counts.select(
        F.col("nc").alias("n_control"),
        F.col("nt").alias("n_treatment"),
        F.round(chi, 6).alias("chi_square"),
        F.when(chi > F.lit(3.841), 1).otherwise(0).alias("srm_flag"),
    )


@register(
    "did_estimator",
    oracle="""
    WITH cells AS (
      SELECT CASE WHEN CAST('0x' || substr(md5(CAST(o_custkey AS VARCHAR)
                                               || ':did'), 1, 15) AS BIGINT)
                       % 2 = 0 THEN 0 ELSE 1 END AS treated,
             CASE WHEN o_orderdate >= TIMESTAMP '1996-01-01'
                  THEN 1 ELSE 0 END AS post,
             CAST(o_totalprice AS DECIMAL(18,2)) AS y
      FROM orders),
    sums AS (
      SELECT treated, post, SUM(y) AS s, COUNT(*) AS n
      FROM cells GROUP BY treated, post),
    wide AS (
      SELECT
        MAX(CASE WHEN treated = 1 AND post = 1 THEN CAST(s AS DOUBLE) / n END) AS t1,
        MAX(CASE WHEN treated = 1 AND post = 0 THEN CAST(s AS DOUBLE) / n END) AS t0,
        MAX(CASE WHEN treated = 0 AND post = 1 THEN CAST(s AS DOUBLE) / n END) AS c1,
        MAX(CASE WHEN treated = 0 AND post = 0 THEN CAST(s AS DOUBLE) / n END) AS c0,
        CAST(SUM(n) AS BIGINT) AS n_total
      FROM sums)
    SELECT n_total,
           ROUND(t1 - t0, 4) AS treated_delta,
           ROUND(c1 - c0, 4) AS control_delta,
           ROUND((t1 - t0) - (c1 - c0), 4) AS did_estimate
    FROM wide
    """,
)
def did_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences — the workhorse causal estimator: the
    treated group's pre/post change minus the control group's, from a
    2x2 of DECIMAL-exact cell sums (hash-assigned arms and a date cut
    define the design; on hash-random arms the estimate should hover
    near zero, which is itself the placebo check). Four exact ratios
    and three subtractions — single-expression doubles both engines."""
    o = _t(spark, sf_dir, "orders")
    treated = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("o_custkey").cast("string"), F.lit(":did"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % 2
    )
    cells = o.select(
        F.when(treated == 0, 0).otherwise(1).alias("treated"),
        F.when(
            F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"), 1
        )
        .otherwise(0)
        .alias("post"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("y"),
    )
    sums = cells.groupBy("treated", "post").agg(
        F.sum("y").alias("s"), F.count(F.lit(1)).alias("n")
    )
    mean = F.col("s").cast("double") / F.col("n")
    wide = sums.agg(
        F.max(
            F.when((F.col("treated") == 1) & (F.col("post") == 1), mean)
        ).alias("t1"),
        F.max(
            F.when((F.col("treated") == 1) & (F.col("post") == 0), mean)
        ).alias("t0"),
        F.max(
            F.when((F.col("treated") == 0) & (F.col("post") == 1), mean)
        ).alias("c1"),
        F.max(
            F.when((F.col("treated") == 0) & (F.col("post") == 0), mean)
        ).alias("c0"),
        F.sum("n").cast("bigint").alias("n_total"),
    )
    return wide.select(
        "n_total",
        F.round(F.col("t1") - F.col("t0"), 4).alias("treated_delta"),
        F.round(F.col("c1") - F.col("c0"), 4).alias("control_delta"),
        F.round(
            (F.col("t1") - F.col("t0")) - (F.col("c1") - F.col("c0")), 4
        ).alias("did_estimate"),
    )


@register(
    "graph_local_clustering_topk",
    oracle="""
    WITH so AS (SELECT DISTINCT l_suppkey AS s, l_orderkey AS o FROM lineitem),
    w AS (
      SELECT a.s AS u, b.s AS v, COUNT(*) AS c
      FROM so a JOIN so b ON a.o = b.o AND a.s < b.s
      GROUP BY a.s, b.s),
    sym AS (
      SELECT u AS x, v AS y, c FROM w
      UNION ALL SELECT v AS x, u AS y, c FROM w),
    sel AS (
      SELECT x, y FROM (
        SELECT x, y,
               ROW_NUMBER() OVER (PARTITION BY x ORDER BY c DESC, y) AS rn
        FROM sym)
      WHERE rn <= 3),
    e AS (SELECT DISTINCT least(x, y) AS u, greatest(x, y) AS v FROM sel),
    tri AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM e e1 JOIN e e2 ON e2.u = e1.v
      JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
    tcount AS (
      SELECT s, COUNT(*) AS t FROM (
        SELECT a AS s FROM tri UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri) x
      GROUP BY s),
    deg AS (
      SELECT s, COUNT(*) AS d FROM (
        SELECT u AS s FROM e UNION ALL SELECT v FROM e) x
      GROUP BY s)
    SELECT d.s AS node, CAST(d.d AS BIGINT) AS degree,
           CAST(COALESCE(t.t, 0) AS BIGINT) AS n_triangles,
           ROUND(CAST(2 * COALESCE(t.t, 0) AS DOUBLE) /
                 (d.d * (d.d - 1)), 6) AS local_cc
    FROM deg d LEFT JOIN tcount t ON t.s = d.s
    WHERE d.d >= 2
    ORDER BY local_cc DESC, node
    LIMIT 20
    """,
)
def graph_local_clustering_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node LOCAL clustering coefficient (2·triangles(v) /
    deg(v)·(deg(v)−1)) on the sparsified co-order graph — the node-level
    cohesion score behind small-world and role analysis, where the
    global triangle count only gives one number. Triangle enumeration
    reuses the oriented join; each triangle credits its three corners
    via one union-aggregate. Top-20 most clustered suppliers."""
    li = _t(spark, sf_dir, "lineitem")
    so = li.select(
        F.col("l_suppkey").alias("s"), F.col("l_orderkey").alias("o")
    ).distinct()
    wdf = (
        so.alias("a")
        .join(
            so.alias("b"),
            (F.col("a.o") == F.col("b.o")) & (F.col("a.s") < F.col("b.s")),
        )
        .groupBy(F.col("a.s").alias("u"), F.col("b.s").alias("v"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    e = op_cache.track(graph_mod.top_k_cooccurrence_edges(wdf, k=3).cache())
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.u") == F.col("e1.v"))
        .join(
            e3,
            (F.col("e3.u") == F.col("e1.u"))
            & (F.col("e3.v") == F.col("e2.v")),
        )
        .select(
            F.col("e1.u").alias("a"),
            F.col("e1.v").alias("b"),
            F.col("e2.v").alias("c"),
        )
    )
    tcount = (
        tri.select(F.col("a").alias("s"))
        .unionAll(tri.select(F.col("b").alias("s")))
        .unionAll(tri.select(F.col("c").alias("s")))
        .groupBy("s")
        .agg(F.count(F.lit(1)).alias("t"))
    )
    deg = (
        e.select(F.col("u").alias("s"))
        .unionAll(e.select(F.col("v").alias("s")))
        .groupBy("s")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    scored = (
        deg.join(tcount, "s", "left")
        .filter(F.col("d") >= 2)
        .select(
            F.col("s").alias("node"),
            F.col("d").cast("bigint").alias("degree"),
            F.coalesce(F.col("t"), F.lit(0))
            .cast("bigint")
            .alias("n_triangles"),
            F.round(
                (2 * F.coalesce(F.col("t"), F.lit(0))).cast("double")
                / (F.col("d") * (F.col("d") - 1)),
                6,
            ).alias("local_cc"),
        )
    )
    wtop = Window.orderBy(F.desc("local_cc"), "node")
    return (
        scored.withColumn("rn", F.row_number().over(wtop))
        .filter(F.col("rn") <= 20)
        .drop("rn")
        .orderBy(F.desc("local_cc"), "node")
    )


@register(
    "anomaly_ensemble_vote",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d, COUNT(*) AS n FROM events GROUP BY 1),
    stats AS (
      SELECT COUNT(*) AS cnt, SUM(n) AS sn, SUM(n * n) AS snn FROM daily),
    mr AS (
      SELECT d, n, ABS(n - LAG(n) OVER (ORDER BY d)) AS rng FROM daily),
    mrbar AS (SELECT SUM(rng) AS sr, COUNT(rng) AS cr FROM mr),
    dow AS (
      SELECT isodow(d) - 1 AS wd, SUM(n) AS swn, COUNT(*) AS nwd
      FROM daily GROUP BY 1),
    flags AS (
      SELECT daily.d, daily.n,
             CASE WHEN ABS(daily.n - CAST(sn AS DOUBLE) / cnt) >
                       2 * SQRT(CAST(snn AS DOUBLE) / cnt -
                                (CAST(sn AS DOUBLE) / cnt) *
                                (CAST(sn AS DOUBLE) / cnt))
                  THEN 1 ELSE 0 END AS f_zscore,
             CASE WHEN ABS(daily.n - CAST(sn AS DOUBLE) / cnt) >
                       3 * (CAST((SELECT sr FROM mrbar) AS DOUBLE) /
                            (SELECT cr FROM mrbar)) / CAST(1.128 AS DOUBLE)
                  THEN 1 ELSE 0 END AS f_shewhart,
             CASE WHEN ABS(CAST(daily.n AS DOUBLE) * dow.nwd / dow.swn - 1) >
                       CAST(0.35 AS DOUBLE)
                  THEN 1 ELSE 0 END AS f_seasonal
      FROM daily, stats
      JOIN dow ON dow.wd = isodow(daily.d) - 1)
    SELECT CAST(d AS TIMESTAMP) AS day, CAST(n AS BIGINT) AS n_events,
           CAST(f_zscore + f_shewhart + f_seasonal AS INT) AS votes,
           f_zscore, f_shewhart, f_seasonal
    FROM flags
    WHERE f_zscore + f_shewhart + f_seasonal >= 2
    ORDER BY day
    """,
)
def anomaly_ensemble_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ensemble anomaly alerting — the production pattern that cuts
    single-detector false positives: a day pages only when at least two
    of three independent detectors agree (global 2-sigma z-score,
    Shewhart 3-sigma moving-range limits, and a day-of-week
    seasonal-ratio deviation). Each flag derives from exact integer
    sums via single-expression doubles; the vote is integer."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("n")
    )
    daily = op_cache.track(daily.cache())
    stats = daily.agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("n").alias("sn"),
        F.sum(F.col("n") * F.col("n")).alias("snn"),
    )
    wd_win = Window.orderBy("d")
    mrbar = daily.select(
        F.abs(F.col("n") - F.lag("n").over(wd_win)).alias("rng")
    ).agg(F.sum("rng").alias("sr"), F.count("rng").alias("cr"))
    dow = daily.groupBy(F.weekday("d").alias("wd")).agg(
        F.sum("n").alias("swn"), F.count(F.lit(1)).alias("nwd")
    )
    j = (
        daily.crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(mrbar))
        .join(F.broadcast(dow), F.weekday(F.col("d")) == F.col("wd"))
    )
    mean = F.col("sn").cast("double") / F.col("cnt")
    sd = F.sqrt(
        F.col("snn").cast("double") / F.col("cnt") - mean * mean
    )
    f_z = F.when(F.abs(F.col("n") - mean) > 2 * sd, 1).otherwise(0)
    f_sh = F.when(
        F.abs(F.col("n") - mean)
        > 3 * (F.col("sr").cast("double") / F.col("cr")) / F.lit(1.128),
        1,
    ).otherwise(0)
    f_se = F.when(
        F.abs(
            F.col("n").cast("double") * F.col("nwd") / F.col("swn") - 1
        )
        > F.lit(0.35),
        1,
    ).otherwise(0)
    flagged = j.select(
        F.col("d").cast("timestamp").alias("day"),
        F.col("n").cast("bigint").alias("n_events"),
        f_z.alias("f_zscore"),
        f_sh.alias("f_shewhart"),
        f_se.alias("f_seasonal"),
    )
    return (
        flagged.withColumn(
            "votes",
            (
                F.col("f_zscore") + F.col("f_shewhart") + F.col("f_seasonal")
            ).cast("int"),
        )
        .filter(F.col("votes") >= 2)
        .select(
            "day", "n_events", "votes", "f_zscore", "f_shewhart", "f_seasonal"
        )
        .orderBy("day")
    )


def _rbo_oracle(k: int = 15, p: float = 0.9) -> str:
    bm25 = _bm25_oracle(topn=k)
    vdot = (
        "list_dot_product([CAST(x AS DOUBLE) FOR x IN {a}], "
        "[CAST(x AS DOUBLE) FOR x IN {b}])"
    )
    # (1-p) * sum_{d=1..k} p^(d-1) * |overlap at depth d| / d, plus the
    # residual extrapolation term p^k * overlap_k / k
    return f"""
    WITH bm_raw AS ({bm25}),
    bm AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS rnk
      FROM bm_raw),
    q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    cs_raw AS (
      SELECT e.vec_id AS doc_id,
             {vdot.format(a="q.qv", b="e.embedding")} /
             (sqrt({vdot.format(a="q.qv", b="q.qv")}) *
              sqrt({vdot.format(a="e.embedding", b="e.embedding")})) AS cos
      FROM embeddings e, q WHERE e.vec_id <> 0),
    cs AS (
      SELECT doc_id, rnk FROM (
        SELECT doc_id, ROW_NUMBER() OVER (ORDER BY cos DESC, doc_id) AS rnk
        FROM cs_raw) WHERE rnk <= {k}),
    depths AS (SELECT unnest(range(1, {k + 1})) AS d),
    ov AS (
      SELECT d.d,
             (SELECT COUNT(*) FROM bm, cs
              WHERE bm.doc_id = cs.doc_id
                AND bm.rnk <= d.d AND cs.rnk <= d.d) AS o
      FROM depths d),
    terms AS (
      SELECT d, o,
             CAST({1 - p} AS DOUBLE) * power(CAST({p} AS DOUBLE), d - 1) *
             o / d AS term
      FROM ov)
    SELECT CAST({k} AS INT) AS k,
           (SELECT CAST(o AS BIGINT) FROM ov WHERE d = {k}) AS overlap_at_k,
           ROUND(list_reduce(list(term ORDER BY d), (a, b) -> a + b) +
                 power(CAST({p} AS DOUBLE), {k}) *
                 (SELECT o FROM ov WHERE d = {k}) / CAST({k} AS DOUBLE), 6)
             AS rbo_ext
    FROM terms LIMIT 1
    """


@register("rbo_ranking_similarity", oracle=_rbo_oracle())
def rbo_ranking_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased overlap (Webber et al.) between the lexical and
    semantic top-15 rankings — the top-weighted ranking-similarity
    metric that, unlike Kendall's tau, handles non-conjoint lists: per
    depth d the overlap of the two prefixes weighs in as p^(d-1)·o/d,
    folded depth-ascending, plus the standard extrapolation term. The
    only floats are powers of the fixed p=0.9 and the fold — both
    order-pinned."""
    bm_raw = bm25_search_topk(spark, sf_dir)
    wb = Window.orderBy(F.desc("bm25"), "doc_id")
    bm = bm_raw.withColumn("rnk", F.row_number().over(wb)).select(
        F.col("doc_id").alias("bd"), F.col("rnk").alias("br")
    )
    emb = _t(spark, sf_dir, "embeddings")
    cs = sim_mod.cosine_topk(
        emb, emb.filter(F.col("vec_id") == 0), k=15
    ).select(F.col("neighbor_id").alias("cd"), F.col("rank").alias("cr"))
    k, p = 15, 0.9
    depths = spark.range(1, k + 1).select(F.col("id").alias("d"))
    matched = bm.join(cs, F.col("cd") == F.col("bd")).select(
        F.greatest("br", "cr").alias("depth_in")
    )
    ov = depths.join(
        matched, F.col("depth_in") <= F.col("d"), "left"
    ).groupBy("d").agg(F.count("depth_in").alias("o"))
    terms = ov.select(
        "d",
        "o",
        (
            F.lit(1 - p)
            * F.pow(F.lit(p), F.col("d") - 1)
            * F.col("o")
            / F.col("d")
        ).alias("term"),
    )
    folded = terms.agg(
        F.expr(
            "aggregate(array_sort(collect_list(struct(d, term))), "
            "cast(0 as double), (acc, e) -> acc + e.term)"
        ).alias("s"),
        F.max(F.when(F.col("d") == k, F.col("o"))).alias("ok"),
    )
    return folded.select(
        F.lit(k).cast("int").alias("k"),
        F.col("ok").cast("bigint").alias("overlap_at_k"),
        F.round(
            F.col("s")
            + F.pow(F.lit(p), F.lit(k)) * F.col("ok") / F.lit(float(k)),
            6,
        ).alias("rbo_ext"),
    )


_NAMED_WINDOW_SQL = """
    SELECT o_orderkey,
           ROW_NUMBER() OVER w AS rn,
           CAST(RANK() OVER w AS BIGINT) AS rnk,
           ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER wf, 2)
             AS running_rev
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_orderdate, o_orderkey),
           wf AS (PARTITION BY o_orderpriority
                  ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ORDER BY o_orderkey
    LIMIT 100
    """


@register("named_window_clause", oracle=_NAMED_WINDOW_SQL)
def named_window_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The named WINDOW clause — one window specification shared by
    multiple functions (plus a framed sibling for the running sum —
    Spark doesn't parse the in-place window-extension form), the
    SQL-surface feature that keeps analytic queries DRY. One
    SQL string runs unchanged on both engines; the running DECIMAL sum
    keeps the frame results exact."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_NAMED_WINDOW_SQL)


@register(
    "ips_offpolicy_value",
    oracle="""
    WITH logged AS (
      SELECT event_id, event_type, value,
             CASE WHEN CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)
                                                || ':pol'), 1, 15) AS BIGINT)
                       % 2 = 0
                  THEN 'click' ELSE 'view' END AS logged_action
      FROM events WHERE event_type IN ('click', 'view')),
    scored AS (
      -- behavior policy chooses uniformly between the two actions
      -- (propensity exactly 1/2); target policy always plays 'click'
      SELECT value, event_type,
             CASE WHEN event_type = logged_action THEN 1 ELSE 0 END
               AS on_policy,
             CASE WHEN event_type = 'click' AND event_type = logged_action
                  THEN 2 ELSE 0 END AS ips_w
      FROM logged)
    SELECT COUNT(*) AS n_logged,
           CAST(SUM(on_policy) AS BIGINT) AS n_matched,
           ROUND(CAST(SUM(CAST(value * ips_w AS DECIMAL(18,6))) AS DOUBLE) /
                 COUNT(*), 6) AS ips_value_estimate,
           ROUND(CAST(SUM(CASE WHEN event_type = 'click'
                               THEN CAST(value AS DECIMAL(18,6))
                               ELSE CAST(0 AS DECIMAL(18,6)) END)
                      AS DOUBLE) /
                 GREATEST(SUM(CASE WHEN event_type = 'click'
                              THEN 1 ELSE 0 END), 1), 6)
             AS on_policy_mean_reward
    FROM scored
    """,
)
def ips_offpolicy_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Off-policy evaluation by inverse propensity scoring — the
    counterfactual estimate every recommendation/ranking team needs
    before an online test: rewards of logged actions that match the
    TARGET policy are reweighted by 1/propensity (the hash-random
    behavior policy gives exact propensity 1/2, so the weight is the
    integer 2) and averaged over all logged traffic. The unweighted
    mean reward of matching actions sits alongside as the biased
    baseline IPS corrects. DECIMAL sums, integer weights, one final
    division."""
    ev = _t(spark, sf_dir, "events")
    logged = ev.filter(F.col("event_type").isin("click", "view")).select(
        "event_id",
        "event_type",
        "value",
        F.when(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("event_id").cast("string"), F.lit(":pol")
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % 2
            == 0,
            "click",
        )
        .otherwise("view")
        .alias("logged_action"),
    )
    scored = logged.select(
        "value",
        "event_type",
        F.when(F.col("event_type") == F.col("logged_action"), 1)
        .otherwise(0)
        .alias("on_policy"),
        F.when(
            (F.col("event_type") == "click")
            & (F.col("event_type") == F.col("logged_action")),
            2,
        )
        .otherwise(0)
        .alias("ips_w"),
    )
    return scored.agg(
        F.count(F.lit(1)).alias("n_logged"),
        F.sum("on_policy").cast("bigint").alias("n_matched"),
        F.round(
            F.sum(
                (F.col("value") * F.col("ips_w")).cast("decimal(18,6)")
            ).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("ips_value_estimate"),
        F.round(
            F.sum(
                F.when(
                    F.col("event_type") == "click",
                    F.col("value").cast("decimal(18,6)"),
                ).otherwise(F.lit(0).cast("decimal(18,6)"))
            ).cast("double")
            / F.greatest(
                F.sum(
                    F.when(F.col("event_type") == "click", 1).otherwise(0)
                ),
                F.lit(1),
            ),
            6,
        ).alias("on_policy_mean_reward"),
    )


@register(
    "ab_mde_calculator",
    oracle="""
    WITH base AS (
      SELECT COUNT(DISTINCT user_id) AS n_users,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS DOUBLE) /
             COUNT(*) AS p
      FROM events)
    SELECT n_users,
           ROUND(p, 6) AS baseline_rate,
           -- MDE for a two-sided 0.05 / power 0.8 two-proportion test:
           -- (z_{0.975} + z_{0.8}) * sqrt(2 p (1-p) / (n/2 per arm))
           ROUND((CAST(1.959964 AS DOUBLE) + CAST(0.841621 AS DOUBLE)) *
                 SQRT(2 * p * (1 - p) / (CAST(n_users AS DOUBLE) / 2)), 6)
             AS mde_absolute,
           ROUND(((CAST(1.959964 AS DOUBLE) + CAST(0.841621 AS DOUBLE)) *
                  SQRT(2 * p * (1 - p) / (CAST(n_users AS DOUBLE) / 2))) / p,
                 6) AS mde_relative
    FROM base
    """,
)
def ab_mde_calculator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum detectable effect — the experiment-design number computed
    BEFORE launching: with the observed baseline purchase rate and the
    available user count split 50/50, the smallest absolute and
    relative lift a two-proportion test (alpha 0.05 two-sided, power
    0.8; z constants fixed to 6 dp so both engines share them exactly)
    can reliably detect. Completes the experimentation suite next to
    the SRM, z-test, SPRT, DiD, QTE, and IPS queries."""
    ev = _t(spark, sf_dir, "events")
    base = ev.agg(
        F.countDistinct("user_id").alias("n_users"),
        (
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).cast("double")
            / F.count(F.lit(1))
        ).alias("p"),
    )
    z = F.lit(1.959964) + F.lit(0.841621)
    mde = z * F.sqrt(
        2 * F.col("p") * (1 - F.col("p"))
        / (F.col("n_users").cast("double") / 2)
    )
    return base.select(
        "n_users",
        F.round("p", 6).alias("baseline_rate"),
        F.round(mde, 6).alias("mde_absolute"),
        F.round(mde / F.col("p"), 6).alias("mde_relative"),
    )


@register(
    "partial_correlation_audit",
    oracle="""
    WITH v AS (
      SELECT CAST(l_quantity AS DECIMAL(38,0)) AS x,
             CAST(FLOOR(l_extendedprice) AS DECIMAL(38,0)) AS y,
             CAST(ROUND(l_discount * 100, 0) AS DECIMAL(38,0)) AS z
      FROM lineitem),
    s AS (
      SELECT COUNT(*) AS n,
             SUM(x) AS sx, SUM(y) AS sy, SUM(z) AS sz,
             SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(z * z) AS szz,
             SUM(x * y) AS sxy, SUM(x * z) AS sxz, SUM(y * z) AS syz
      FROM v),
    r AS (
      SELECT
        CAST(n * sxy - sx * sy AS DOUBLE) /
        SQRT(CAST(n * sxx - sx * sx AS DOUBLE) *
             CAST(n * syy - sy * sy AS DOUBLE)) AS rxy,
        CAST(n * sxz - sx * sz AS DOUBLE) /
        SQRT(CAST(n * sxx - sx * sx AS DOUBLE) *
             CAST(n * szz - sz * sz AS DOUBLE)) AS rxz,
        CAST(n * syz - sy * sz AS DOUBLE) /
        SQRT(CAST(n * syy - sy * sy AS DOUBLE) *
             CAST(n * szz - sz * sz AS DOUBLE)) AS ryz
      FROM s)
    SELECT ROUND(rxy, 6) AS r_qty_price,
           ROUND(rxz, 6) AS r_qty_discount,
           ROUND(ryz, 6) AS r_price_discount,
           ROUND((rxy - rxz * ryz) /
                 SQRT((1 - rxz * rxz) * (1 - ryz * ryz)), 6)
             AS partial_r_given_discount
    FROM r
    """,
)
def partial_correlation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial correlation — the quantity-price association with the
    discount CONTROLLED away, the confounder check a raw correlation
    matrix can't answer: r_xy·z = (r_xy − r_xz·r_yz) / sqrt((1−r_xz²)
    (1−r_yz²)). All second moments accumulate as DECIMAL(38,0) integer
    sums (quantity, floored price, per-cent discount), so the three
    pairwise r's and the partial r are single-expression doubles from
    exact numerators — no float accumulation anywhere."""
    li = _t(spark, sf_dir, "lineitem")
    v = li.select(
        F.col("l_quantity").cast("decimal(38,0)").alias("x"),
        F.floor("l_extendedprice").cast("decimal(38,0)").alias("y"),
        F.round(F.col("l_discount") * 100, 0).cast("decimal(38,0)").alias("z"),
    )
    s = v.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum("z").alias("sz"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("z") * F.col("z")).alias("szz"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("z")).alias("sxz"),
        F.sum(F.col("y") * F.col("z")).alias("syz"),
    )

    def corr(sab, sa, sb, saa, sbb):
        return (
            (F.col("n") * F.col(sab) - F.col(sa) * F.col(sb)).cast("double")
            / F.sqrt(
                (F.col("n") * F.col(saa) - F.col(sa) * F.col(sa)).cast(
                    "double"
                )
                * (F.col("n") * F.col(sbb) - F.col(sb) * F.col(sb)).cast(
                    "double"
                )
            )
        )

    r = s.select(
        corr("sxy", "sx", "sy", "sxx", "syy").alias("rxy"),
        corr("sxz", "sx", "sz", "sxx", "szz").alias("rxz"),
        corr("syz", "sy", "sz", "syy", "szz").alias("ryz"),
    )
    return r.select(
        F.round("rxy", 6).alias("r_qty_price"),
        F.round("rxz", 6).alias("r_qty_discount"),
        F.round("ryz", 6).alias("r_price_discount"),
        F.round(
            (F.col("rxy") - F.col("rxz") * F.col("ryz"))
            / F.sqrt(
                (1 - F.col("rxz") * F.col("rxz"))
                * (1 - F.col("ryz") * F.col("ryz"))
            ),
            6,
        ).alias("partial_r_given_discount"),
    )


@register(
    "slope_heterogeneity_by_priority",
    oracle="""
    WITH j AS (
      SELECT o.o_orderpriority AS pr,
             CAST(l.l_quantity AS DECIMAL(38,0)) AS x,
             CAST(FLOOR(l.l_extendedprice) AS DECIMAL(38,0)) AS y
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
    s AS (
      SELECT pr, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(x * y) AS sxy
      FROM j GROUP BY pr),
    slopes AS (
      SELECT pr, CAST(n AS BIGINT) AS n,
             ROUND(CAST(n * sxy - sx * sy AS DOUBLE) /
                   CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope
      FROM s)
    SELECT pr AS priority, n, slope,
           ROUND(MAX(slope) OVER () - MIN(slope) OVER (), 6)
             AS slope_spread
    FROM slopes ORDER BY priority
    """,
)
def slope_heterogeneity_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slope heterogeneity — does the quantity-price relationship differ
    by order priority? Per-group OLS slopes from exact DECIMAL(38,0)
    moment sums (the grouped version of the regression family), with
    the max-min slope spread carried on every row: a spread near zero
    licenses a pooled model, a wide one demands interaction terms. One
    grouped aggregate; the window over five rows is free."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    j = o.join(li, li.l_orderkey == o.o_orderkey).select(
        F.col("o_orderpriority").alias("pr"),
        F.col("l_quantity").cast("decimal(38,0)").alias("x"),
        F.floor("l_extendedprice").cast("decimal(38,0)").alias("y"),
    )
    s = j.groupBy("pr").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    slopes = s.select(
        F.col("pr").alias("priority"),
        F.col("n").cast("bigint").alias("n"),
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
                "double"
            )
            / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
                "double"
            ),
            6,
        ).alias("slope"),
    )
    wg = Window.partitionBy()
    return slopes.select(
        "priority",
        "n",
        "slope",
        F.round(
            F.max("slope").over(wg) - F.min("slope").over(wg), 6
        ).alias("slope_spread"),
    ).orderBy("priority")


@register(
    "lead_lag_correlation_scan",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d,
             SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c,
             SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p
      FROM events GROUP BY 1),
    lags AS (SELECT unnest(range(0, 8)) AS lag),
    aligned AS (
      SELECT l.lag, a.c AS x, b.p AS y
      FROM lags l
      JOIN daily a ON TRUE
      JOIN daily b ON b.d = a.d + CAST(l.lag AS INT)),
    s AS (
      SELECT lag, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
      FROM aligned GROUP BY lag),
    r AS (
      SELECT CAST(lag AS INT) AS lag, CAST(n AS BIGINT) AS n_days,
             ROUND(CAST(n * sxy - sx * sy AS DOUBLE) /
                   SQRT(CAST(n * sxx - sx * sx AS DOUBLE) *
                        CAST(n * syy - sy * sy AS DOUBLE)), 6) AS r
      FROM s)
    SELECT lag, n_days, r,
           CASE WHEN ABS(r) = MAX(ABS(r)) OVER () THEN 1 ELSE 0 END
             AS is_best_lag
    FROM r ORDER BY lag
    """,
)
def lead_lag_correlation_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-lag cross-correlation scan: the Pearson correlation between
    daily clicks and purchases LAGGED 0-7 days — which offset best
    predicts conversions, the first screen before any causal story.
    Each lag aligns by a calendar self-join (never a window over
    shifted copies), correlations come from exact integer moment sums,
    and the best-lag flag compares the identical doubles both engines
    computed."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias(
            "c"
        ),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("p"),
    )
    daily = op_cache.track(daily.cache())
    lags = spark.range(0, 8).select(F.col("id").cast("int").alias("lag"))
    a = daily.select(F.col("d").alias("da"), F.col("c").alias("x"))
    b = daily.select(F.col("d").alias("db"), F.col("p").alias("y"))
    aligned = (
        lags.crossJoin(a)
        .join(b, F.col("db") == F.expr("date_add(da, lag)"))
        .select("lag", "x", "y")
    )
    s = aligned.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    r = s.select(
        F.col("lag").cast("int").alias("lag"),
        F.col("n").cast("bigint").alias("n_days"),
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
                "double"
            )
            / F.sqrt(
                (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
                    "double"
                )
                * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
                    "double"
                )
            ),
            6,
        ).alias("r"),
    )
    wg = Window.partitionBy()
    return r.select(
        "lag",
        "n_days",
        "r",
        F.when(F.abs("r") == F.max(F.abs("r")).over(wg), 1)
        .otherwise(0)
        .alias("is_best_lag"),
    ).orderBy("lag")


@register(
    "misra_gries_heavy_hitters",
    oracle="""
    WITH toks AS (
      SELECT unnest(string_split_regex(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS w
      FROM documents),
    t2 AS (SELECT w FROM toks WHERE w <> ''),
    tot AS (SELECT COUNT(*) AS n FROM t2),
    cnt AS (SELECT w, COUNT(*) AS c FROM t2 GROUP BY w)
    SELECT cnt.w AS token, CAST(cnt.c AS BIGINT) AS freq,
           ROUND(CAST(cnt.c AS DOUBLE) / CAST(tot.n AS DOUBLE), 6) AS share
    FROM cnt, tot
    WHERE cnt.c * 200 > tot.n
    ORDER BY freq DESC, token
    """,
)
def misra_gries_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Misra-Gries heavy hitters over the token stream: each
    partition keeps a k-counter MG summary (mapInPandas, one pass, O(k)
    memory), the union of survivors is the candidate set, and a second
    exact pass counts ONLY the candidates (broadcast semi-join) and keeps
    tokens with freq * k > n. Pigeonhole + the per-partition MG guarantee
    (any item with local count > n_p/k survives) make the candidate set a
    superset of the true heavy hitters on EVERY partitioning, so the
    exact-filtered output is deterministic and the oracle is a plain
    frequency filter. This is the 100 TB shape for "top 0.5% tokens":
    the first pass never shuffles, the second shuffles only candidate
    rows (≤ k·partitions keys)."""
    k = 200
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(
            F.split(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "), " ")
        ).alias("w")
    ).filter(F.col("w") != "")

    def mg_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for pdf in batches:
            for w in pdf["w"]:
                c = counters.get(w)
                if c is not None:
                    counters[w] = c + 1
                elif len(counters) < k:
                    counters[w] = 1
                else:
                    dead = []
                    for key in counters:
                        nv = counters[key] - 1
                        counters[key] = nv
                        if nv == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame({"w": list(counters.keys())})

    cands = toks.mapInPandas(mg_partition, "w string").distinct()
    counts = toks.join(F.broadcast(cands), "w").groupBy("w").agg(
        F.count(F.lit(1)).alias("freq")
    )
    total = toks.agg(F.count(F.lit(1)).alias("n"))
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("freq") * k > F.col("n"))
        .select(
            F.col("w").alias("token"),
            F.col("freq").cast("bigint").alias("freq"),
            F.round(
                F.col("freq").cast("double") / F.col("n").cast("double"), 6
            ).alias("share"),
        )
        .orderBy(F.desc("freq"), "token")
    )


@register(
    "fellegi_sunter_linkage",
    oracle="""
    WITH p AS (SELECT p_partkey AS id, p_brand,
                      p_type AS ft, p_size AS fs,
                      string_split(p_name, ' ')[2] AS fw
               FROM part),
    nn AS (SELECT COUNT(*) AS n FROM p),
    ut AS (SELECT CAST(SUM(c*(c-1)) AS DOUBLE) /
                  CAST((SELECT n*(n-1) FROM nn) AS DOUBLE) AS u
           FROM (SELECT COUNT(*) AS c FROM p GROUP BY ft)),
    us AS (SELECT CAST(SUM(c*(c-1)) AS DOUBLE) /
                  CAST((SELECT n*(n-1) FROM nn) AS DOUBLE) AS u
           FROM (SELECT COUNT(*) AS c FROM p GROUP BY fs)),
    uw AS (SELECT CAST(SUM(c*(c-1)) AS DOUBLE) /
                  CAST((SELECT n*(n-1) FROM nn) AS DOUBLE) AS u
           FROM (SELECT COUNT(*) AS c FROM p GROUP BY fw)),
    wts AS (SELECT
      ROUND(LN(CAST(0.95 AS DOUBLE) / ut.u), 6) AS wt_a,
      ROUND(LN(CAST(0.05 AS DOUBLE) / (1 - ut.u)), 6) AS wt_d,
      ROUND(LN(CAST(0.9 AS DOUBLE) / us.u), 6) AS ws_a,
      ROUND(LN(CAST(0.1 AS DOUBLE) / (1 - us.u)), 6) AS ws_d,
      ROUND(LN(CAST(0.95 AS DOUBLE) / uw.u), 6) AS ww_a,
      ROUND(LN(CAST(0.05 AS DOUBLE) / (1 - uw.u)), 6) AS ww_d
      FROM ut, us, uw),
    cand AS (
      SELECT a.id AS id_a, b.id AS id_b,
             CASE WHEN a.ft = b.ft THEN 1 ELSE 0 END AS agt,
             CASE WHEN a.fs = b.fs THEN 1 ELSE 0 END AS ags,
             CASE WHEN a.fw = b.fw THEN 1 ELSE 0 END AS agw
      FROM p a JOIN p b ON a.p_brand = b.p_brand AND a.id < b.id),
    scored AS (
      SELECT id_a, id_b, agt + ags + agw AS n_agree,
             ROUND((CASE WHEN agt = 1 THEN wt_a ELSE wt_d END) +
                   (CASE WHEN ags = 1 THEN ws_a ELSE ws_d END) +
                   (CASE WHEN agw = 1 THEN ww_a ELSE ww_d END), 6) AS score
      FROM cand, wts)
    SELECT id_a, id_b, CAST(n_agree AS INT) AS n_agree, score
    FROM (SELECT *, ROW_NUMBER() OVER (
            ORDER BY score DESC, id_a, id_b) AS rn
          FROM scored WHERE score > 0)
    WHERE rn <= 100
    ORDER BY score DESC, id_a, id_b
    """,
)
def fellegi_sunter_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter probabilistic record linkage: candidate pairs come
    from blocking on p_brand, each comparison field (type, size, the
    product noun from the name) gets a data-derived u-probability (the
    chance two RANDOM records agree: Σ c_v(c_v-1)/(N(N-1)), one tiny
    aggregate per field), fixed m-probabilities, and every pair scores
    the sum of log(m/u) / log((1-m)/(1-u)) agreement weights. Top-100
    by score. The u-stats and weights are one-row broadcasts; the pair
    join never leaves the brand blocks — the classic ER scale shape
    (cost Σ block², not N²)."""
    part = _t(spark, sf_dir, "part")
    p = part.select(
        F.col("p_partkey").alias("id"),
        "p_brand",
        F.col("p_type").alias("ft"),
        F.col("p_size").alias("fs"),
        F.split("p_name", " ").getItem(1).alias("fw"),
    )
    p = op_cache.track(p.cache())
    nn = p.agg(F.count(F.lit(1)).alias("n"))

    def u_of(field: str) -> DataFrame:
        c = p.groupBy(field).agg(F.count(F.lit(1)).alias("c"))
        return (
            c.agg(F.sum(F.col("c") * (F.col("c") - 1)).alias("agree"))
            .crossJoin(F.broadcast(nn))
            .select(
                (
                    F.col("agree").cast("double")
                    / (F.col("n") * (F.col("n") - 1)).cast("double")
                ).alias(f"u_{field}")
            )
        )

    wts = (
        u_of("ft")
        .crossJoin(u_of("fs"))
        .crossJoin(u_of("fw"))
        .select(
            F.round(F.log(F.lit(0.95).cast("double") / F.col("u_ft")), 6).alias("wt_a"),
            F.round(
                F.log(F.lit(0.05).cast("double") / (F.lit(1) - F.col("u_ft"))), 6
            ).alias("wt_d"),
            F.round(F.log(F.lit(0.9).cast("double") / F.col("u_fs")), 6).alias("ws_a"),
            F.round(
                F.log(F.lit(0.1).cast("double") / (F.lit(1) - F.col("u_fs"))), 6
            ).alias("ws_d"),
            F.round(F.log(F.lit(0.95).cast("double") / F.col("u_fw")), 6).alias("ww_a"),
            F.round(
                F.log(F.lit(0.05).cast("double") / (F.lit(1) - F.col("u_fw"))), 6
            ).alias("ww_d"),
        )
    )
    a = p.select(
        F.col("p_brand").alias("ba"),
        F.col("id").alias("id_a"),
        F.col("ft").alias("fta"),
        F.col("fs").alias("fsa"),
        F.col("fw").alias("fwa"),
    )
    b = p.select(
        F.col("p_brand").alias("bb"),
        F.col("id").alias("id_b"),
        F.col("ft").alias("ftb"),
        F.col("fs").alias("fsb"),
        F.col("fw").alias("fwb"),
    )
    cand = a.join(
        b, (F.col("ba") == F.col("bb")) & (F.col("id_a") < F.col("id_b"))
    ).select(
        "id_a",
        "id_b",
        F.when(F.col("fta") == F.col("ftb"), 1).otherwise(0).alias("agt"),
        F.when(F.col("fsa") == F.col("fsb"), 1).otherwise(0).alias("ags"),
        F.when(F.col("fwa") == F.col("fwb"), 1).otherwise(0).alias("agw"),
    )
    scored = cand.crossJoin(F.broadcast(wts)).select(
        "id_a",
        "id_b",
        (F.col("agt") + F.col("ags") + F.col("agw")).cast("int").alias("n_agree"),
        F.round(
            F.when(F.col("agt") == 1, F.col("wt_a")).otherwise(F.col("wt_d"))
            + F.when(F.col("ags") == 1, F.col("ws_a")).otherwise(F.col("ws_d"))
            + F.when(F.col("agw") == 1, F.col("ww_a")).otherwise(F.col("ww_d")),
            6,
        ).alias("score"),
    )
    return (
        scored.filter(F.col("score") > 0)
        .orderBy(F.desc("score"), "id_a", "id_b")
        .limit(100)
        .orderBy(F.desc("score"), "id_a", "id_b")
    )


@register(
    "hill_tail_index",
    oracle="""
    WITH ranked AS (
      SELECT o_totalprice AS x,
             ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders),
    top AS (SELECT * FROM ranked WHERE rn <= 101),
    xm AS (SELECT x AS xmin FROM top WHERE rn = 101),
    terms AS (
      SELECT t.rn, LN(t.x / xm.xmin) AS term
      FROM top t, xm WHERE t.rn <= 100),
    s AS (SELECT list_reduce(list(term ORDER BY rn), (a, b) -> a + b)
            AS hsum FROM terms)
    SELECT CAST(100 AS INT) AS k,
           ROUND(xm.xmin, 2) AS xmin_threshold,
           ROUND(s.hsum / CAST(100 AS DOUBLE), 6) AS hill_mean_log,
           ROUND(CAST(100 AS DOUBLE) / s.hsum, 6) AS alpha
    FROM s, xm
    """,
)
def hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator of the power-law tail index of order totals:
    alpha^-1 = mean of ln(x_(i)/x_(k+1)) over the top-k order statistics
    (k=100). The top-(k+1) rows come from orderBy().limit() — Spark plans
    TakeOrderedAndProject, a per-partition heap + driver merge, NOT a
    global sort, so this is the 100 TB-safe way to reach the tail. The
    log-sum folds rank-ascending (array_sort + aggregate) to stay
    bit-identical with DuckDB's list_reduce."""
    k = 100
    orders = _t(spark, sf_dir, "orders")
    top = (
        orders.select(F.col("o_totalprice").alias("x"), "o_orderkey")
        .orderBy(F.desc("x"), "o_orderkey")
        .limit(k + 1)
    )
    w = Window.orderBy(F.desc("x"), "o_orderkey")
    ranked = top.select("x", F.row_number().over(w).alias("rn"))
    xm = ranked.filter(F.col("rn") == k + 1).select(F.col("x").alias("xmin"))
    terms = (
        ranked.filter(F.col("rn") <= k)
        .crossJoin(F.broadcast(xm))
        .select("rn", F.log(F.col("x") / F.col("xmin")).alias("term"))
    )
    s = terms.agg(
        F.expr(
            "aggregate(array_sort(collect_list(struct(rn, term))), "
            "cast(0 as double), (acc, e) -> acc + e.term)"
        ).alias("hsum")
    )
    return s.crossJoin(F.broadcast(xm)).select(
        F.lit(k).cast("int").alias("k"),
        F.round("xmin", 2).alias("xmin_threshold"),
        F.round(F.col("hsum") / F.lit(k).cast("double"), 6).alias("hill_mean_log"),
        F.round(F.lit(k).cast("double") / F.col("hsum"), 6).alias("alpha"),
    )


@register(
    "calibration_reliability_bins",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
      FROM events GROUP BY user_id),
    scored AS (
      SELECT user_id, y,
             CAST(c AS DOUBLE) / CAST(c + 3 AS DOUBLE) AS score,
             CAST((10 * c) // (c + 3) AS INT) AS bin
      FROM per_user),
    binned AS (
      SELECT bin, COUNT(*) AS n_users, SUM(y) AS n_pos,
             list_reduce(list(score ORDER BY user_id),
                         (a, b) -> a + b) AS score_sum,
             list_reduce(list((score - y) * (score - y) ORDER BY user_id),
                         (a, b) -> a + b) AS brier_sum
      FROM scored GROUP BY bin)
    SELECT bin, CAST(n_users AS BIGINT) AS n_users,
           ROUND(score_sum / CAST(n_users AS DOUBLE), 6) AS avg_pred,
           ROUND(CAST(n_pos AS DOUBLE) / CAST(n_users AS DOUBLE), 6)
             AS frac_pos,
           ROUND(brier_sum / CAST(n_users AS DOUBLE), 6) AS brier
    FROM binned ORDER BY bin
    """,
)
def calibration_reliability_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration audit of a deterministic conversion scorer: per user
    the rational score c/(c+3) (c = click count — exact, no exp) predicts
    whether the user ever purchased; users bucket into 10 reliability
    bins by integer arithmetic (10c div (c+3)), and each bin reports
    mean predicted probability vs empirical positive rate plus the Brier
    score. Per-bin double sums fold user-ascending so both engines add
    in the same order. One groupBy(user) + one groupBy(bin) — two
    narrow-key shuffles, scale-safe."""
    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("c"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("y"),
    )
    scored = per_user.select(
        "user_id",
        "y",
        (F.col("c").cast("double") / (F.col("c") + 3).cast("double")).alias(
            "score"
        ),
        F.expr("CAST((10 * c) DIV (c + 3) AS INT)").alias("bin"),
    )
    binned = scored.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("y").alias("n_pos"),
        F.expr(
            "aggregate(array_sort(collect_list(struct(user_id, score))), "
            "cast(0 as double), (acc, e) -> acc + e.score)"
        ).alias("score_sum"),
        F.expr(
            "aggregate(array_sort(collect_list(struct(user_id, "
            "(score - y) * (score - y) AS sq))), "
            "cast(0 as double), (acc, e) -> acc + e.sq)"
        ).alias("brier_sum"),
    )
    return binned.select(
        "bin",
        F.col("n_users").cast("bigint").alias("n_users"),
        F.round(F.col("score_sum") / F.col("n_users").cast("double"), 6).alias(
            "avg_pred"
        ),
        F.round(
            F.col("n_pos").cast("double") / F.col("n_users").cast("double"), 6
        ).alias("frac_pos"),
        F.round(F.col("brier_sum") / F.col("n_users").cast("double"), 6).alias(
            "brier"
        ),
    ).orderBy("bin")


@register(
    "kneser_ney_bigram_top30",
    oracle="""
    WITH words AS (
      SELECT doc_id,
             string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS ws
      FROM documents),
    bg AS (
      SELECT ws[i+1] AS w1, ws[i+2] AS w2
      FROM words, unnest(range(0, greatest(len(ws) - 1, 0))) AS t(i)
      WHERE ws[i+1] <> '' AND ws[i+2] <> ''),
    c12 AS (SELECT w1, w2, COUNT(*) AS c FROM bg GROUP BY w1, w2),
    c1 AS (SELECT w1, SUM(c) AS tot, COUNT(*) AS nl FROM c12 GROUP BY w1),
    cr AS (SELECT w2, COUNT(*) AS nr FROM c12 GROUP BY w2),
    bt AS (SELECT COUNT(*) AS b FROM c12),
    p AS (
      SELECT c12.w1, c12.w2, c12.c,
             (CAST(c12.c AS DOUBLE) - CAST(0.75 AS DOUBLE))
               / CAST(c1.tot AS DOUBLE)
             + CAST(0.75 AS DOUBLE) * CAST(c1.nl AS DOUBLE)
               / CAST(c1.tot AS DOUBLE)
               * (CAST(cr.nr AS DOUBLE) / CAST(bt.b AS DOUBLE)) AS pkn
      FROM c12 JOIN c1 USING (w1) JOIN cr USING (w2), bt)
    SELECT w1, w2, CAST(c AS BIGINT) AS c12, ROUND(pkn, 6) AS p_kn
    FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY c DESC, w1, w2) AS rn FROM p)
    WHERE rn <= 30
    ORDER BY c12 DESC, w1, w2
    """,
)
def kneser_ney_bigram_top30(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney smoothed bigram probabilities (d=0.75) for
    the corpus's 30 most frequent bigrams: discounted ML estimate plus
    the continuation-probability backoff N1+(·w2)/|bigram types| — the
    smoothing used by every serious count-based LM. All inputs are exact
    integer counts; the probability arithmetic is double with identical
    operation order in both engines. Count tables shuffle once each on
    narrow keys; the continuation/left-type tables are aggregates OF the
    bigram table, so the corpus is tokenized exactly once."""
    docs = _t(spark, sf_dir, "documents")
    words = docs.select(
        F.split(
            F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "), " "
        ).alias("ws")
    )
    bg = (
        words.select(
            F.expr(
                "CASE WHEN size(ws) >= 2 THEN "
                "transform(sequence(1, size(ws) - 1), "
                "i -> struct(ws[i-1] AS w1, ws[i] AS w2)) "
                "ELSE array() END"
            ).alias("pairs")
        )
        .select(F.explode("pairs").alias("p"))
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .filter((F.col("w1") != "") & (F.col("w2") != ""))
    )
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    c12 = op_cache.track(c12.cache())
    c1 = c12.groupBy("w1").agg(
        F.sum("c").alias("tot"), F.count(F.lit(1)).alias("nl")
    )
    cr = c12.groupBy("w2").agg(F.count(F.lit(1)).alias("nr"))
    bt = c12.agg(F.count(F.lit(1)).alias("b"))
    d = F.lit(0.75).cast("double")
    p = (
        c12.join(c1, "w1")
        .join(cr, "w2")
        .crossJoin(F.broadcast(bt))
        .select(
            "w1",
            "w2",
            "c",
            (
                (F.col("c").cast("double") - d) / F.col("tot").cast("double")
                + d
                * F.col("nl").cast("double")
                / F.col("tot").cast("double")
                * (F.col("nr").cast("double") / F.col("b").cast("double"))
            ).alias("pkn"),
        )
    )
    return (
        p.orderBy(F.desc("c"), "w1", "w2")
        .limit(30)
        .select(
            "w1",
            "w2",
            F.col("c").cast("bigint").alias("c12"),
            F.round("pkn", 6).alias("p_kn"),
        )
        .orderBy(F.desc("c12"), "w1", "w2")
    )


@register(
    "shapley_attribution_channels",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
           + 2 * MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
           + 4 * MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
           + 8 * MAX(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
             AS mask,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
      FROM events GROUP BY user_id),
    mask_conv AS (
      SELECT mask, COUNT(*) AS n_conv FROM per_user
      WHERE conv = 1 GROUP BY mask),
    subsets AS (SELECT unnest(range(0, 16)) AS s),
    v AS (
      SELECT s.s, COALESCE(SUM(m.n_conv), 0) AS v
      FROM subsets s LEFT JOIN mask_conv m ON (m.mask & (15 - s.s)) = 0
      GROUP BY s.s),
    channels AS (
      SELECT * FROM (VALUES ('view', 1), ('click', 2),
                            ('signup', 4), ('error', 8)) AS t(channel, bit)),
    contrib AS (
      SELECT c.channel,
             CASE bit_count(CAST(sv.s AS BIGINT))
               WHEN 0 THEN 6 WHEN 1 THEN 2 WHEN 2 THEN 2 ELSE 6 END
             * (vi.v - sv.v) AS term
      FROM channels c
      JOIN v sv ON (sv.s & c.bit) = 0
      JOIN v vi ON vi.s = sv.s + c.bit),
    phi AS (
      SELECT channel, SUM(term) AS phi24 FROM contrib GROUP BY channel),
    tot AS (SELECT COALESCE(SUM(n_conv), 0) AS t FROM mask_conv)
    SELECT channel, CAST(phi24 AS BIGINT) AS phi24,
           ROUND(CAST(phi24 AS DOUBLE) / CAST(24 AS DOUBLE), 6) AS phi,
           ROUND(CAST(phi24 AS DOUBLE) / CAST(24 * tot.t AS DOUBLE), 6)
             AS share
    FROM phi, tot
    ORDER BY channel
    """,
)
def shapley_attribution_channels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Shapley-value channel attribution: each converting user's
    touched-channel set defines the coalition game v(S) = number of
    converters whose channels ⊆ S, and each channel gets its Shapley
    value φ_i = Σ_S |S|!(3-|S|)!/4! · [v(S∪{i})-v(S)] — the
    order-fair split of total conversions (Σφ = v(full)). The 100 TB
    shape: ONE user-keyed aggregate compresses the data to ≤16 mask
    counts; the factorial-weighted subset enumeration (16×4 rows) is
    driver-trivial and exact in scaled integers (φ·24), no floats until
    the final report."""
    ev = _t(spark, sf_dir, "events")
    has = lambda t: F.max(  # noqa: E731
        F.when(F.col("event_type") == t, 1).otherwise(0)
    )
    per_user = ev.groupBy("user_id").agg(
        (
            has("view")
            + 2 * has("click")
            + 4 * has("signup")
            + 8 * has("error")
        ).alias("mask"),
        has("purchase").alias("conv"),
    )
    mask_conv = (
        per_user.filter(F.col("conv") == 1)
        .groupBy("mask")
        .agg(F.count(F.lit(1)).alias("n_conv"))
    )
    mask_conv = op_cache.track(mask_conv.cache())
    subsets = spark.range(0, 16).select(F.col("id").cast("int").alias("s"))
    v = (
        subsets.join(
            F.broadcast(mask_conv),
            F.expr("(mask & (15 - s)) = 0"),
            "left",
        )
        .groupBy("s")
        .agg(F.coalesce(F.sum("n_conv"), F.lit(0)).alias("v"))
    )
    v = op_cache.track(v.cache())
    channels = spark.createDataFrame(
        [("view", 1), ("click", 2), ("signup", 4), ("error", 8)],
        "channel string, bit int",
    )
    sv = v.select(F.col("s").alias("s0"), F.col("v").alias("v0"))
    vi = v.select(F.col("s").alias("s1"), F.col("v").alias("v1"))
    contrib = (
        channels.join(F.broadcast(sv), F.expr("(s0 & bit) = 0"))
        .join(F.broadcast(vi), F.expr("s1 = s0 + bit"))
        .select(
            "channel",
            (
                F.when(F.bit_count(F.col("s0").cast("bigint")) == 0, 6)
                .when(F.bit_count(F.col("s0").cast("bigint")) == 1, 2)
                .when(F.bit_count(F.col("s0").cast("bigint")) == 2, 2)
                .otherwise(6)
                * (F.col("v1") - F.col("v0"))
            ).alias("term"),
        )
    )
    phi = contrib.groupBy("channel").agg(F.sum("term").alias("phi24"))
    tot = mask_conv.agg(F.coalesce(F.sum("n_conv"), F.lit(0)).alias("t"))
    return (
        phi.crossJoin(F.broadcast(tot))
        .select(
            "channel",
            F.col("phi24").cast("bigint").alias("phi24"),
            F.round(
                F.col("phi24").cast("double") / F.lit(24).cast("double"), 6
            ).alias("phi"),
            F.round(
                F.col("phi24").cast("double")
                / (F.lit(24) * F.col("t")).cast("double"),
                6,
            ).alias("share"),
        )
        .orderBy("channel")
    )


@register(
    "dsir_importance_weights",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang,
             unnest(string_split_regex(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS w
      FROM documents),
    feat AS (
      SELECT doc_id, lang,
             CAST(concat('0x', substring(md5(w), 1, 15)) AS BIGINT) % 1024
               AS f,
             COUNT(*) AS n
      FROM toks WHERE w <> '' GROUP BY doc_id, lang, 3),
    ct AS (SELECT f, SUM(n) AS c FROM feat WHERE lang = 'en' GROUP BY f),
    cs AS (SELECT f, SUM(n) AS c FROM feat GROUP BY f),
    tt AS (SELECT COALESCE(SUM(n), 0) AS t FROM feat WHERE lang = 'en'),
    ts AS (SELECT COALESCE(SUM(n), 0) AS t FROM feat),
    terms AS (
      SELECT feat.doc_id, feat.lang, feat.f,
             CAST(feat.n AS DOUBLE) * LN(
               (CAST(COALESCE(ct.c, 0) + 1 AS DOUBLE)
                  / CAST(tt.t + 1024 AS DOUBLE))
               / (CAST(cs.c + 1 AS DOUBLE) / CAST(ts.t + 1024 AS DOUBLE))
             ) AS term
      FROM feat LEFT JOIN ct USING (f) JOIN cs USING (f), tt, ts),
    w AS (
      SELECT doc_id, lang,
             ROUND(list_reduce(list(term ORDER BY f), (a, b) -> a + b), 6)
               AS log_weight
      FROM terms GROUP BY doc_id, lang)
    SELECT doc_id, lang, log_weight
    FROM (SELECT *, ROW_NUMBER() OVER (
            ORDER BY log_weight DESC, doc_id) AS rn FROM w)
    WHERE rn <= 40
    ORDER BY log_weight DESC, doc_id
    """,
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weights for domain-targeted data selection:
    documents score Σ_f n_f · ln(p_target(f)/p_source(f)) over 1024
    hashed unigram features (md5-portable bucket hash, add-1 smoothing),
    with the 'en' slice as the target distribution and the whole corpus
    as source. Top-40 docs by weight. The feature vocabulary is CAPPED
    at 1024 buckets by construction — the hashed-ngram trick that makes
    importance resampling feasible at 100 TB: bucket stats are a
    broadcast-size table no matter how large the corpus, and each doc's
    log-weight folds feature-ascending for bit-stable float sums."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "lang",
        F.explode(
            F.split(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "), " ")
        ).alias("w"),
    ).filter(F.col("w") != "")
    feat = toks.groupBy(
        "doc_id",
        "lang",
        F.expr("CAST(conv(substring(md5(w),1,15),16,10) AS BIGINT) % 1024").alias(
            "f"
        ),
    ).agg(F.count(F.lit(1)).alias("n"))
    feat = op_cache.track(feat.cache())
    ct = (
        feat.filter(F.col("lang") == "en")
        .groupBy("f")
        .agg(F.sum("n").alias("ct_c"))
    )
    cs = feat.groupBy("f").agg(F.sum("n").alias("cs_c"))
    tt = feat.filter(F.col("lang") == "en").agg(
        F.coalesce(F.sum("n"), F.lit(0)).alias("tt_t")
    )
    ts = feat.agg(F.coalesce(F.sum("n"), F.lit(0)).alias("ts_t"))
    bucket_stats = (
        cs.join(ct, "f", "left")
        .crossJoin(F.broadcast(tt))
        .crossJoin(F.broadcast(ts))
        .select(
            "f",
            F.log(
                (
                    (F.coalesce(F.col("ct_c"), F.lit(0)) + 1).cast("double")
                    / (F.col("tt_t") + 1024).cast("double")
                )
                / (
                    (F.col("cs_c") + 1).cast("double")
                    / (F.col("ts_t") + 1024).cast("double")
                )
            ).alias("lr"),
        )
    )
    terms = feat.join(F.broadcast(bucket_stats), "f").select(
        "doc_id",
        "lang",
        "f",
        (F.col("n").cast("double") * F.col("lr")).alias("term"),
    )
    w = terms.groupBy("doc_id", "lang").agg(
        F.round(
            F.expr(
                "aggregate(array_sort(collect_list(struct(f, term))), "
                "cast(0 as double), (acc, e) -> acc + e.term)"
            ),
            6,
        ).alias("log_weight")
    )
    return (
        w.orderBy(F.desc("log_weight"), "doc_id")
        .limit(40)
        .select("doc_id", "lang", "log_weight")
        .orderBy(F.desc("log_weight"), "doc_id")
    )


# One-sided BH critical values Φ^{-1}(1 - 0.05·i/25), i = 1..25, computed
# once offline (bisection on erf, double precision) and pinned as literals
# in BOTH engines — the inverse normal CDF is configuration, not data.
_BH_CRIT = [
    2.878162, 2.65207, 2.512144, 2.408916, 2.326348, 2.257129, 2.197286,
    2.144411, 2.096927, 2.053749, 2.014091, 1.977368, 1.943134, 1.911036,
    1.880794, 1.85218, 1.825007, 1.799118, 1.774382, 1.750686, 1.727934,
    1.706043, 1.684941, 1.664563, 1.644854,
]


def _bh_crit_sql() -> str:
    rows = ", ".join(
        f"({i + 1}, CAST({c} AS DOUBLE))" for i, c in enumerate(_BH_CRIT)
    )
    return f"(VALUES {rows}) AS crit(rank, c)"


@register(
    "benjamini_hochberg_fdr",
    oracle=f"""
    WITH li AS (
      SELECT s.s_nationkey, l.l_returnflag
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey),
    per_nation AS (
      SELECT n.n_name AS nation, COUNT(*) AS n,
             SUM(CASE WHEN li.l_returnflag = 'R' THEN 1 ELSE 0 END) AS x
      FROM li JOIN nation n ON li.s_nationkey = n.n_nationkey
      GROUP BY n.n_name),
    gl AS (
      SELECT CAST(SUM(x) AS DOUBLE) / CAST(SUM(n) AS DOUBLE) AS p0
      FROM per_nation),
    z AS (
      SELECT nation, n, x,
             (CAST(x AS DOUBLE) - CAST(n AS DOUBLE) * gl.p0)
               / SQRT(CAST(n AS DOUBLE) * gl.p0 * (1 - gl.p0)) AS z
      FROM per_nation, gl),
    ranked AS (
      SELECT nation, n, x, z,
             ROW_NUMBER() OVER (ORDER BY z DESC, nation) AS rank
      FROM z),
    flagged AS (
      SELECT r.nation, r.n, r.x, r.z, r.rank, crit.c,
             CASE WHEN r.z >= crit.c THEN r.rank ELSE 0 END AS pass_rank
      FROM ranked r JOIN {_bh_crit_sql()} ON crit.rank = r.rank),
    k AS (SELECT MAX(pass_rank) AS k FROM flagged)
    SELECT nation, CAST(n AS BIGINT) AS n, CAST(x AS BIGINT) AS x,
           ROUND(z, 6) AS z, CAST(rank AS INT) AS rank,
           c AS crit_z,
           CASE WHEN rank <= k.k THEN 1 ELSE 0 END AS rejected
    FROM flagged, k
    ORDER BY rank
    """,
)
def benjamini_hochberg_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR control over 25 simultaneous one-sided
    tests: per supplier nation, is the return rate elevated vs the
    global rate? z-scores come from exact integer counts; the BH step-up
    compares the i-th largest z against pinned critical values
    Φ^{-1}(1-αi/m) (α=.05) and rejects every rank ≤ the largest passing
    rank — the multiple-testing guard any per-segment anomaly scan
    needs before alerting. One fact-side shuffle (nation agg after a
    broadcast supplier join); the 25-row BH machinery is broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    su = _t(spark, sf_dir, "supplier")
    na = _t(spark, sf_dir, "nation")
    per_nation = (
        li.join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(na), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
            ).alias("x"),
        )
    )
    per_nation = op_cache.track(per_nation.cache())
    glob = per_nation.agg(
        (
            F.sum("x").cast("double") / F.sum("n").cast("double")
        ).alias("p0")
    )
    z = per_nation.crossJoin(F.broadcast(glob)).select(
        "nation",
        "n",
        "x",
        (
            (F.col("x").cast("double") - F.col("n").cast("double") * F.col("p0"))
            / F.sqrt(
                F.col("n").cast("double") * F.col("p0") * (F.lit(1) - F.col("p0"))
            )
        ).alias("z"),
    )
    wr = Window.orderBy(F.desc("z"), "nation")
    ranked = z.select("nation", "n", "x", "z", F.row_number().over(wr).alias("rank"))
    crit = spark.createDataFrame(
        [(i + 1, c) for i, c in enumerate(_BH_CRIT)], "rank int, c double"
    )
    flagged = ranked.join(F.broadcast(crit), "rank").select(
        "nation",
        "n",
        "x",
        "z",
        "rank",
        "c",
        F.when(F.col("z") >= F.col("c"), F.col("rank")).otherwise(0).alias(
            "pass_rank"
        ),
    )
    k = flagged.agg(F.max("pass_rank").alias("k"))
    return (
        flagged.crossJoin(F.broadcast(k))
        .select(
            "nation",
            F.col("n").cast("bigint").alias("n"),
            F.col("x").cast("bigint").alias("x"),
            F.round("z", 6).alias("z"),
            F.col("rank").cast("int").alias("rank"),
            F.round("c", 6).alias("crit_z"),
            F.when(F.col("rank") <= F.col("k"), 1).otherwise(0).alias("rejected"),
        )
        .orderBy("rank")
    )
