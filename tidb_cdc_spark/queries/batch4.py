"""Event-analytics wave: funnel conversion and cohort retention over
the events table — the two classic product-analytics aggregations
(SURVEY §2.1 engine-provided surface; the reference parses ``ts``
and never uses it, `cdc_utils.go:18` — this is what an analytics
engine DOES with event time).

Scale shape: every stage aggregates or joins on ``user_id`` — one
key for the whole pipeline, so the per-stage Exchanges co-partition
and AQE reuses them; no stage shuffles raw events more than once.
Cohort output is #cohort-days × #offsets rows; funnel output is one
row.

Cross-engine notes: session timezone is UTC (session.py) and DuckDB
timestamps are tz-naive, so ``to_date``/``DATE_TRUNC`` agree;
day offsets are integral ``datediff``/``date_diff('day', …)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tidb_cdc_spark.queries.batch import _t


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view → click → purchase conversion: users with a view, users
    with a click at-or-after their first view, users with a purchase
    at-or-after that first qualifying click."""
    ev = _t(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") >= F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") >= F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .agg(
            F.count("t_view").alias("users_viewed"),
            F.count("t_click").alias("users_clicked"),
            F.count("t_purchase").alias("users_purchased"),
        )
    )


_FUNNEL_SQL = """
WITH v AS (
  SELECT user_id, MIN(ts) AS t_view FROM events
  WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, MIN(e.ts) AS t_click
  FROM events e JOIN v USING (user_id)
  WHERE e.event_type = 'click' AND e.ts >= v.t_view
  GROUP BY e.user_id
), p AS (
  SELECT e.user_id, MIN(e.ts) AS t_purchase
  FROM events e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts >= c.t_click
  GROUP BY e.user_id
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS users_viewed,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM c) AS users_clicked,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM p) AS users_purchased
"""


def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users active N days after their cohort (first-seen) day:
    (cohort_day, day_offset, n_users)."""
    ev = _t(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("cohort_day")
    )
    act = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    return (
        act.join(first, "user_id")
        .groupBy(
            # string-typed day (not DATE) — repo convention for
            # cross-engine hash-stable date outputs
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff(F.col("day"), F.col("cohort_day")).alias("day_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
        .orderBy("cohort_day", "day_offset")
    )


_COHORT_SQL = """
WITH first AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
  FROM events GROUP BY user_id
), act AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
)
SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
       date_diff('day', cohort_day, day) AS day_offset,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM act JOIN first USING (user_id)
GROUP BY 1, 2 ORDER BY cohort_day, day_offset
"""


QUERIES = {
    "events_funnel": events_funnel,
    "events_cohort_retention": events_cohort_retention,
}

ORACLE = {
    "events_funnel": _FUNNEL_SQL,
    "events_cohort_retention": _COHORT_SQL,
}
