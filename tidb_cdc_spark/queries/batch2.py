"""Second wave of batch coverage (SURVEY §2.1 rows not yet pinned by
batch.py): semi/anti joins, EXISTS/IN subqueries, correlated scalar
subqueries, HAVING, distinct aggregates, grouping sets/cube, richer
window functions (lag/lead/rank/running/ntile), string/date scalar
breadth, theta-ish join via range predicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tidb_cdc_spark.session import read_table as _t


def _dec(c: str, p: int = 12, s: int = 2):
    return F.col(c).cast(f"decimal({p},{s})")


# ------------------------------------------------- semi join (EXISTS)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS → left-semi join on orderkey; the semi
    join shuffles only keys, never multiplies rows."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-07-01") & (F.col("o_orderdate") < "1997-07-01")
    )
    late = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_linestatus") == "F"
    ).select("l_orderkey")
    return (
        orders.join(late, orders.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


_Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_linestatus = 'F')
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ------------------------------------------------- anti join (NOT EXISTS)
def q22_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: anti join + uncorrelated scalar subquery.
    Customers above the average balance with no FINISHED ('F')
    orders (every synthetic customer has some order, so the classic
    no-orders-at-all variant is vacuously empty)."""
    cust = _t(spark, sf_dir, "customer")
    # uncorrelated scalar subquery stays IN the plan: broadcast the
    # 1-row aggregate and cross-join, instead of a driver-side
    # .collect() that would serialize two separate jobs
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        (F.sum(_dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("_avg_bal")
    )
    orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_custkey")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal").cast("double") > F.col("_avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("total_bal"),
        )
        .orderBy("c_mktsegment")
    )


_Q22_SQL = """
SELECT c_mktsegment, COUNT(*) AS n_cust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
FROM customer
WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
                   FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


# ------------------------------------- correlated scalar subquery (Q17 shape)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: per-part average-quantity threshold, then sum
    revenue of lineitems below 0.5×avg. Decorrelated into an agg +
    equi-join — the plan Catalyst produces for the correlated SQL,
    written natively."""
    li = _t(spark, sf_dir, "lineitem")
    thresholds = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (F.sum("l_quantity") / (2 * F.count(F.lit(1)))).alias("half_avg_qty")
    )
    return (
        li.join(thresholds, li.l_partkey == thresholds.t_partkey)
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(F.sum(_dec("l_extendedprice")).cast("double").alias("small_qty_revenue"))
    )


_Q17_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS small_qty_revenue
FROM lineitem l1
WHERE l_quantity < (SELECT SUM(l_quantity) / (2 * COUNT(*))
                    FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)
"""


# ---------------------------------------------------- HAVING + distinct agg
def q16_supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregate + HAVING: per (brand, size-class), count of
    distinct suppliers shipping that combination; keep combos with
    more than 2 distinct suppliers."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", (F.col("p_size") % 5).alias("size_class"))
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .filter(F.col("supplier_cnt") > 2)
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "size_class")
    )


_Q16_SQL = """
SELECT p_brand, p_size % 5 AS size_class,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand, p_size % 5
HAVING COUNT(DISTINCT l_suppkey) > 2
ORDER BY supplier_cnt DESC, p_brand, size_class
"""


# ------------------------------------------------------------- cube
def cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (orderstatus, orderpriority): all 4 grouping sets in
    one Expand + single shuffle."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("double").alias("total"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


_CUBE_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
"""


# ------------------------------------------------- window breadth
def window_functions_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/rank/dense_rank/ntile/running-sum over customer order
    history — one window partitioning, many functions (single
    shuffle, functions share the sort)."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wr = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    price = _dec("o_totalprice")
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.row_number().over(w).alias("seq"),
            F.rank().over(
                Window.partitionBy("o_custkey").orderBy(F.col("o_orderstatus"))
            ).alias("status_rank"),
            F.lag("o_orderkey", 1).over(w).alias("prev_order"),
            F.lead("o_orderkey", 1).over(w).alias("next_order"),
            F.ntile(4).over(w).alias("quartile"),
            F.sum(price).over(wr).cast("double").alias("running_spend"),
        )
        .orderBy("o_custkey", "seq")
    )


_WINDOW_SQL = """
SELECT o_custkey, o_orderkey,
       ROW_NUMBER() OVER w AS seq,
       RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderstatus) AS status_rank,
       LAG(o_orderkey, 1) OVER w AS prev_order,
       LEAD(o_orderkey, 1) OVER w AS next_order,
       NTILE(4) OVER w AS quartile,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER wr AS DOUBLE) AS running_spend
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
       wr AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS UNBOUNDED PRECEDING)
ORDER BY o_custkey, seq
"""


# --------------------------------------------- date/string functions
def date_functions_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date scalar breadth on orders: parts, trunc, diff, format."""
    orders = _t(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.year(d).alias("y"),
        F.month(d).alias("m"),
        F.dayofmonth(d).alias("dom"),
        F.quarter(d).alias("q"),
        F.date_trunc("month", d).alias("month_start"),
        F.datediff(F.lit("1998-12-31").cast("date"), d.cast("date")).alias(
            "days_to_eoy"
        ),
        F.date_format(d, "yyyy-MM").alias("ym"),
    ).orderBy("o_orderkey")


_DATE_SQL = """
SELECT o_orderkey,
       EXTRACT(year FROM o_orderdate) AS y,
       EXTRACT(month FROM o_orderdate) AS m,
       EXTRACT(day FROM o_orderdate) AS dom,
       EXTRACT(quarter FROM o_orderdate) AS q,
       DATE_TRUNC('month', o_orderdate) AS month_start,
       DATEDIFF('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS days_to_eoy,
       STRFTIME(o_orderdate, '%Y-%m') AS ym
FROM orders ORDER BY o_orderkey
"""


# ----------------------------------------- conditional agg (Q12/Q14 shape)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation: promo revenue share per month —
    sum(CASE WHEN ...) / sum(...) as exact decimals → double ratio."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    rev = (_dec("l_extendedprice") * (
        F.lit(1) - _dec("l_discount", 4, 2)
    ).cast("decimal(4,2)")).cast("decimal(18,4)")
    promo = F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"))
        .agg(
            F.sum(promo).cast("double").alias("promo_revenue"),
            F.sum(rev).cast("double").alias("total_revenue"),
        )
        .withColumn(
            "promo_share",
            F.round(F.col("promo_revenue") / F.col("total_revenue"), 6),
        )
        .orderBy("ship_month")
    )


_Q14_SQL = """
WITH t AS (
  SELECT STRFTIME(l_shipdate, '%Y-%m') AS ship_month,
         CAST(CAST(l_extendedprice AS DECIMAL(12,2))
              * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))
              AS DECIMAL(18,4)) AS rev,
         p_type LIKE 'PROMO%' AS is_promo
  FROM lineitem JOIN part ON l_partkey = p_partkey
)
SELECT ship_month,
       CAST(SUM(CASE WHEN is_promo THEN rev ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS promo_revenue,
       CAST(SUM(rev) AS DOUBLE) AS total_revenue,
       ROUND(CAST(SUM(CASE WHEN is_promo THEN rev ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(SUM(rev) AS DOUBLE), 6) AS promo_share
FROM t GROUP BY ship_month ORDER BY ship_month
"""


# ------------------------------------------------- IN-subquery join
def suppliers_of_large_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN (subquery) → left-semi join chain across two dims."""
    li = _t(spark, sf_dir, "lineitem")
    big_parts = _t(spark, sf_dir, "part").filter(F.col("p_size") > 40).select("p_partkey")
    supp = _t(spark, sf_dir, "supplier")
    shipped = li.join(
        F.broadcast(big_parts), li.l_partkey == big_parts.p_partkey, "left_semi"
    ).select("l_suppkey").distinct()
    return (
        supp.join(shipped, supp.s_suppkey == shipped.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal")
        .orderBy("s_suppkey")
    )


_IN_SQL = """
SELECT s_suppkey, s_name, s_acctbal
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size > 40))
ORDER BY s_suppkey
"""


# ---------------------------------------------- self theta-range join
def price_band_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band (theta) join: pairs of parts in the same brand whose
    retail prices differ by < 1.00 — equi-key on brand keeps the
    quadratic term bounded per brand (the scalable band-join shape)."""
    part = _t(spark, sf_dir, "part")
    a = part.select(
        F.col("p_brand").alias("brand"),
        F.col("p_partkey").alias("pk_a"),
        _dec("p_retailprice").alias("price_a"),
    )
    b = part.select(
        F.col("p_brand").alias("brand"),
        F.col("p_partkey").alias("pk_b"),
        _dec("p_retailprice").alias("price_b"),
    )
    return (
        a.join(b, "brand")
        .filter(
            (F.col("pk_a") < F.col("pk_b"))
            & (F.abs(F.col("price_a") - F.col("price_b")) < 1.0)
        )
        .select(
            "brand",
            "pk_a",
            "pk_b",
            F.abs(F.col("price_a") - F.col("price_b")).cast("double").alias("price_gap"),
        )
        .orderBy("brand", "pk_a", "pk_b")
    )


_BAND_SQL = """
SELECT a.p_brand AS brand, a.p_partkey AS pk_a, b.p_partkey AS pk_b,
       CAST(ABS(CAST(a.p_retailprice AS DECIMAL(12,2)) - CAST(b.p_retailprice AS DECIMAL(12,2))) AS DOUBLE) AS price_gap
FROM part a JOIN part b
  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
WHERE ABS(CAST(a.p_retailprice AS DECIMAL(12,2)) - CAST(b.p_retailprice AS DECIMAL(12,2))) < 1.0
ORDER BY brand, pk_a, pk_b
"""


# ------------------------------------------------ full outer join
def full_outer_nation_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join surface: customer vs supplier counts per
    nation, nations present on either side."""
    cust = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    supp = (
        _t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return (
        cust.join(supp, "nationkey", "full_outer")
        .select(
            "nationkey",
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
        .orderBy("nationkey")
    )


_FULL_OUTER_SQL = """
SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
       COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
FROM (SELECT c_nationkey AS nationkey, COUNT(*) AS n_cust FROM customer GROUP BY 1) c
FULL OUTER JOIN (SELECT s_nationkey AS nationkey, COUNT(*) AS n_supp FROM supplier GROUP BY 1) s
  USING (nationkey)
ORDER BY nationkey
"""


# --------------------------------------------- explicit grouping sets
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (status), (priority), () with
    grouping_id — the third multi-grouping-set code path next to
    rollup/cube (one pass, expand + single shuffle)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupingSets(
            [["o_orderstatus"], ["o_orderpriority"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_dec("o_totalprice")).cast("double").alias("total"),
            F.grouping_id().cast("long").alias("gid"),
        )
        .orderBy("gid", "o_orderstatus", "o_orderpriority")
    )


_GROUPING_SETS_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total,
       CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
ORDER BY gid, o_orderstatus, o_orderpriority
"""


# ------------------------------------------------ skew-salted aggregate
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew-mitigation surface, oracle-gated: two-phase SALTED
    aggregation (operators/skew.py — phase 1 groups by (key, salt) so
    a hot key fans out over 16 reducers, phase 2 merges partials)
    over lineitem's 3-value l_returnflag — maximal key skew. Exact
    decimal sums make the salted split algebraically identical to the
    plain GROUP BY the oracle runs."""
    from tidb_cdc_spark.operators.skew import salted_sum

    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        _dec("l_quantity").alias("qty"),
        F.lit(1).alias("one"),
    )
    out = salted_sum(li, ["l_returnflag"], {"qty": "sum_qty", "one": "n"})
    return out.select(
        "l_returnflag",
        F.col("sum_qty").cast("double").alias("sum_qty"),
        F.col("n").cast("long").alias("n"),
    ).orderBy("l_returnflag")


_SALTED_SQL = """
SELECT l_returnflag,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


# ------------------------------------- data profiling via unpivot/stack
def table_profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column profile of lineitem's numeric columns —
    one scan computes every statistic (Spark fuses the aggregates),
    then ``stack`` unpivots the 1-row wide aggregate into one row per
    column. The unpivot runs on ONE row, so the wide→long reshape is
    free at any scale; the scan is the only data-sized cost."""
    li = _t(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"{c}_n"),
            F.count_distinct(F.col(c)).alias(f"{c}_d"),
            F.min(F.col(c)).cast("double").alias(f"{c}_min"),
            F.max(F.col(c)).cast("double").alias(f"{c}_max"),
            F.expr(f"percentile({c}, 0.5)").alias(f"{c}_p50"),
        ]
    wide = li.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}_n, {c}_d, {c}_min, {c}_max, {c}_p50" for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(col, n_nonnull, n_distinct, min_v, max_v, p50)"
        )
    ).orderBy("col")


_PROFILE_SQL = """
SELECT col, n_nonnull, n_distinct, min_v, max_v, p50 FROM (
  SELECT 'l_quantity' AS col, COUNT(l_quantity) AS n_nonnull,
         COUNT(DISTINCT l_quantity) AS n_distinct,
         CAST(MIN(l_quantity) AS DOUBLE) AS min_v,
         CAST(MAX(l_quantity) AS DOUBLE) AS max_v,
         quantile_cont(l_quantity, 0.5) AS p50
  FROM lineitem
  UNION ALL
  SELECT 'l_extendedprice', COUNT(l_extendedprice),
         COUNT(DISTINCT l_extendedprice),
         CAST(MIN(l_extendedprice) AS DOUBLE),
         CAST(MAX(l_extendedprice) AS DOUBLE),
         quantile_cont(l_extendedprice, 0.5)
  FROM lineitem
  UNION ALL
  SELECT 'l_discount', COUNT(l_discount), COUNT(DISTINCT l_discount),
         CAST(MIN(l_discount) AS DOUBLE), CAST(MAX(l_discount) AS DOUBLE),
         quantile_cont(l_discount, 0.5)
  FROM lineitem
  UNION ALL
  SELECT 'l_tax', COUNT(l_tax), COUNT(DISTINCT l_tax),
         CAST(MIN(l_tax) AS DOUBLE), CAST(MAX(l_tax) AS DOUBLE),
         quantile_cont(l_tax, 0.5)
  FROM lineitem
) ORDER BY col
"""


QUERIES = {
    "q4_order_priority": q4_order_priority,
    "q22_customers_without_orders": q22_customers_without_orders,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q16_supplier_part_variety": q16_supplier_part_variety,
    "cube_order_stats": cube_order_stats,
    "window_functions_showcase": window_functions_showcase,
    "date_functions_showcase": date_functions_showcase,
    "q14_promo_effect": q14_promo_effect,
    "suppliers_of_large_parts": suppliers_of_large_parts,
    "price_band_pairs": price_band_pairs,
    "full_outer_nation_presence": full_outer_nation_presence,
    "table_profile_lineitem": table_profile_lineitem,
    "skew_salted_agg": skew_salted_agg,
    "grouping_sets_orders": grouping_sets_orders,
}

ORACLE = {
    "q4_order_priority": _Q4_SQL,
    "q22_customers_without_orders": _Q22_SQL,
    "q17_small_quantity_revenue": _Q17_SQL,
    "q16_supplier_part_variety": _Q16_SQL,
    "cube_order_stats": _CUBE_SQL,
    "window_functions_showcase": _WINDOW_SQL,
    "date_functions_showcase": _DATE_SQL,
    "q14_promo_effect": _Q14_SQL,
    "suppliers_of_large_parts": _IN_SQL,
    "price_band_pairs": _BAND_SQL,
    "full_outer_nation_presence": _FULL_OUTER_SQL,
    "table_profile_lineitem": _PROFILE_SQL,
    "skew_salted_agg": _SALTED_SQL,
    "grouping_sets_orders": _GROUPING_SETS_SQL,
}
