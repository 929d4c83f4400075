"""Batch relational query surface (SURVEY §2.1 categories): scans,
filters, joins (broadcast + shuffle), aggregations (incl. rollup),
windows, sorts/limits/top-k, set ops, scalar functions, sessionize,
as-of join, JSON extraction.

Each query documents its intended physical plan; tests/ pin the
plan properties (broadcast, pushdown) via plans/inspect.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tidb_cdc_spark.operators.joins import asof_join
from tidb_cdc_spark.operators.windows import sessionize, topk_per_group


from tidb_cdc_spark.session import read_table as _t  # noqa: E402


# --- exact-decimal helpers (see functions/numeric.py docstring) ---
def _ext(c="l_extendedprice"):
    return F.col(c).cast("decimal(12,2)")


def _one_minus_disc():
    return (F.lit(1) - F.col("l_discount").cast("decimal(4,2)")).cast("decimal(4,2)")


def _one_plus_tax():
    return (F.lit(1) + F.col("l_tax").cast("decimal(4,2)")).cast("decimal(4,2)")


def _disc_price():
    return (_ext() * _one_minus_disc()).cast("decimal(18,4)")


# ---------------------------------------------------------------- q1
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan → filter (pushed to parquet) → hash agg
    (partial map-side + final) → sort. One shuffle on the tiny
    (flag, status) key space; AQE coalesces the post-agg partitions."""
    li = _t(spark, sf_dir, "lineitem")
    charge = (_disc_price() * _one_plus_tax()).cast("decimal(24,6)")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum(_ext()).cast("double").alias("sum_base_price"),
            F.sum(_disc_price()).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum("l_quantity") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(_ext()).cast("double") / F.count(F.lit(1))).alias("avg_price"),
            (
                F.sum(F.col("l_discount").cast("decimal(4,2)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       SUM(l_quantity) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2)) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2)) AS DECIMAL(18,4)) * CAST(1 + CAST(l_tax AS DECIMAL(4,2)) AS DECIMAL(4,2)) AS DECIMAL(24,6))) AS DOUBLE) AS sum_charge,
       SUM(l_quantity) / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------- q3
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: customer(filtered, broadcast) ⋈ orders ⋈
    lineitem → agg → top-10. The customer side is small after the
    segment filter → broadcast; orders⋈lineitem is the one shuffle
    join on orderkey."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1997-03-15")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1997-03-15")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


_Q3_SQL = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2)) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1997-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


# ---------------------------------------------------------------- q5
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join; region→nation→supplier/customer
    are broadcast dims, lineitem⋈orders the single big shuffle."""
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1999-01-01")
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .filter(cust.c_nationkey == supp.s_nationkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


_Q5_SQL = """
SELECT n_name,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2)) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


# ---------------------------------------------------------------- q6
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-filter-agg; all three predicates push to
    the parquet reader, single partial+final agg, no join."""
    li = _t(spark, sf_dir, "lineitem")
    rev = (_ext() * F.col("l_discount").cast("decimal(4,2)")).cast("decimal(18,4)")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount").cast("decimal(4,2)").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


_Q6_SQL = """
SELECT CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND CAST(l_discount AS DECIMAL(4,2)) BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


# ------------------------------------------------------- top-k/group
def topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window top-k: 3 highest-value orders per customer. One shuffle
    on custkey; rank-filter pushdown prunes per partition."""
    orders = _t(spark, sf_dir, "orders")
    return topk_per_group(
        orders.select("o_custkey", "o_orderkey", "o_totalprice"),
        ["o_custkey"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        3,
        rank_col="rk",
    )


_TOPK_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
  FROM orders) t
WHERE rk <= 3
"""


# ----------------------------------------------------------- rollup
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ROLLUP — multi-grouping-set agg in one pass
    (Expand + single shuffle), the built-in Spark shape."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_ext()).cast("double").alias("sum_base_price"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


_ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
"""


# ----------------------------------------------------------- set ops
def setops_nation_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT surface: nations that have customers but no
    suppliers, and nations with both, tagged."""
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").cast("int").alias("nationkey")
    ).distinct()
    supp = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").cast("int").alias("nationkey")
    ).distinct()
    both = cust.intersect(supp).withColumn("tag", F.lit("both"))
    only_cust = cust.exceptAll(supp).withColumn("tag", F.lit("cust_only"))
    return both.unionByName(only_cust).orderBy("tag", "nationkey")


_SETOPS_SQL = """
SELECT nationkey, 'both' AS tag FROM
  (SELECT DISTINCT c_nationkey AS nationkey FROM customer
   INTERSECT
   SELECT DISTINCT s_nationkey AS nationkey FROM supplier) t1
UNION ALL
SELECT nationkey, 'cust_only' AS tag FROM
  (SELECT DISTINCT c_nationkey AS nationkey FROM customer
   EXCEPT
   SELECT DISTINCT s_nationkey AS nationkey FROM supplier) t2
ORDER BY tag, nationkey
"""


# ---------------------------------------------------- scalar funcs
def scalar_functions_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/date/math scalar surface on part+orders — every
    expression a JVM built-in, checked against the oracle's ANSI
    equivalents."""
    part = _t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper(F.col("p_name")).alias("name_upper"),
        F.substring(F.col("p_type"), 1, 5).alias("type_prefix"),
        F.length(F.col("p_name")).alias("name_len"),
        F.concat_ws("|", F.col("p_brand"), F.col("p_type")).alias("brand_type"),
        F.abs(F.col("p_size") - 25).alias("size_dist"),
        F.round(F.col("p_retailprice").cast("decimal(12,2)") * 2, 2)
        .cast("double")
        .alias("double_price"),
        F.when(F.col("p_size") > 25, "large").otherwise("small").alias("size_class"),
        (F.col("p_partkey") % 7).alias("bucket"),
    ).orderBy("p_partkey")


_SCALAR_SQL = """
SELECT p_partkey,
       UPPER(p_name) AS name_upper,
       SUBSTRING(p_type, 1, 5) AS type_prefix,
       LENGTH(p_name) AS name_len,
       CONCAT_WS('|', p_brand, p_type) AS brand_type,
       ABS(p_size - 25) AS size_dist,
       CAST(ROUND(CAST(p_retailprice AS DECIMAL(12,2)) * 2, 2) AS DOUBLE) AS double_price,
       CASE WHEN p_size > 25 THEN 'large' ELSE 'small' END AS size_class,
       p_partkey % 7 AS bucket
FROM part
ORDER BY p_partkey
"""


# ------------------------------------------------------ events agg
def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window batch agg: hour bucket × event_type. The batch
    twin of the streaming windowed agg in streaming/."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("sum_value"),
        )
        .orderBy("hour", "event_type")
    )


_EVENTS_HOURLY_SQL = """
SELECT DATE_TRUNC('hour', ts) AS hour, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY hour, event_type
"""


# ---------------------------------------------------- sessionization
def events_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min gap) per user → session count
    + avg session length. Batch twin of session_window streaming."""
    ev = _t(spark, sf_dir, "events")
    sessions = sessionize(
        ev.select("user_id", "ts", "event_id"),
        ["user_id"],
        "ts",
        gap_seconds=1800,
        tiebreak_cols=["event_id"],
    )
    return (
        sessions.groupBy("user_id", "session_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
            F.max("n_events").alias("max_session_events"),
        )
        .orderBy("user_id")
    )


_SESSIONS_SQL = """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR EPOCH_US(ts) - EPOCH_US(LAG(ts) OVER w) > 1800 * 1000000
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, event_id,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
), per_session AS (
  SELECT user_id, session_id, COUNT(*) AS n_events
  FROM sess GROUP BY user_id, session_id
)
SELECT user_id, COUNT(*) AS n_sessions,
       CAST(SUM(n_events) AS BIGINT) AS n_events,
       MAX(n_events) AS max_session_events
FROM per_session GROUP BY user_id ORDER BY user_id
"""


# -------------------------------------------------------- as-of join
def events_asof_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase event, the most recent click of
    the same user at or before it. Union-sort plan — one shuffle."""
    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("ts").alias("pts")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("cts"), F.col("event_id").alias("click_id")
    )
    out = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_ts="pts",
        right_ts="cts",
        right_value_cols=["click_id"],
    )
    return out.select("user_id", "purchase_id", "click_id").orderBy("purchase_id")


_ASOF_SQL = """
WITH tagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_type = 'click' THEN event_id END AS click_id,
         CASE WHEN event_type = 'purchase' THEN event_id END AS purchase_id
  FROM events WHERE event_type IN ('click', 'purchase')
), carried AS (
  SELECT user_id, purchase_id,
         LAST_VALUE(click_id IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, CASE WHEN click_id IS NOT NULL THEN 0 ELSE 1 END
           ROWS UNBOUNDED PRECEDING) AS click_id
  FROM tagged
)
SELECT user_id, purchase_id, click_id
FROM carried WHERE purchase_id IS NOT NULL
ORDER BY purchase_id
"""


# ----------------------------------------------------- JSON extract
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured surface: extract props.k, aggregate per type."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


_JSON_SQL = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
       MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
       MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
FROM events GROUP BY event_type ORDER BY event_type
"""


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier_volume": q5_local_supplier_volume,
    "q6_forecast_revenue": q6_forecast_revenue,
    "topk_orders_per_customer": topk_orders_per_customer,
    "rollup_revenue": rollup_revenue,
    "setops_nation_overlap": setops_nation_overlap,
    "scalar_functions_showcase": scalar_functions_showcase,
    "events_hourly": events_hourly,
    "events_sessions": events_sessions,
    "events_asof_purchase_click": events_asof_purchase_click,
    "events_json_extract": events_json_extract,
}

ORACLE = {
    "q1_pricing_summary": _Q1_SQL,
    "q3_shipping_priority": _Q3_SQL,
    "q5_local_supplier_volume": _Q5_SQL,
    "q6_forecast_revenue": _Q6_SQL,
    "topk_orders_per_customer": _TOPK_SQL,
    "rollup_revenue": _ROLLUP_SQL,
    "setops_nation_overlap": _SETOPS_SQL,
    "scalar_functions_showcase": _SCALAR_SQL,
    "events_hourly": _EVENTS_HOURLY_SQL,
    "events_sessions": _SESSIONS_SQL,
    "events_asof_purchase_click": _ASOF_SQL,
    "events_json_extract": _JSON_SQL,
}
