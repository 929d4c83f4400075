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
    from tidb_cdc_spark.session import materialize

    ev = _t(spark, sf_dir, "events")
    # v and c are per-user aggregates (small) consumed by 3 resp. 2
    # downstream stages — materialized, else each use re-expands into
    # its own filtered scan + aggregation of the events table
    v = materialize(
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = materialize(
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


def events_daily_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily event counts per type on a COMPLETE date spine (missing
    days 0-filled) with a per-type running total — the resample /
    gap-fill shape every time-series report needs.

    Scale: the spine is (#days × #types) rows built from a 1-row
    bounds aggregate — broadcast to the left join; the running total
    window is partitioned by type (parallel, never corpus-global)."""
    ev = _t(spark, sf_dir, "events")
    d = ev.groupBy(
        F.col("event_type"), F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("c"))
    bounds = d.agg(F.min("day").alias("mn"), F.max("day").alias("mx"))
    spine = (
        bounds.select(
            F.explode(F.expr("sequence(mn, mx, interval 1 day)")).alias("day")
        )
        .crossJoin(d.select("event_type").distinct())
    )
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        spine.join(d, ["event_type", "day"], "left")
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce("c", F.lit(0)).cast("long").alias("n_events"),
            F.sum(F.coalesce("c", F.lit(0))).over(w).cast("long").alias("running_total"),
        )
        .orderBy("event_type", "day")
    )


_GAPFILL_SQL = """
WITH d AS (
  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS c
  FROM events GROUP BY 1, 2
), b AS (SELECT MIN(day) AS mn, MAX(day) AS mx FROM d),
spine AS (
  SELECT t.event_type, CAST(u.day AS DATE) AS day
  FROM (SELECT DISTINCT event_type FROM d) t
  CROSS JOIN (SELECT unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS day
              FROM b) u
)
SELECT spine.event_type,
       strftime(spine.day, '%Y-%m-%d') AS day,
       CAST(COALESCE(c, 0) AS BIGINT) AS n_events,
       CAST(SUM(COALESCE(c, 0)) OVER (PARTITION BY spine.event_type
            ORDER BY spine.day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS running_total
FROM spine LEFT JOIN d USING (event_type, day)
ORDER BY event_type, day
"""


_TYPES = ["click", "error", "purchase", "signup", "view"]


def events_pivot_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type pivot: one column per type (explicit value
    list — a dynamic pivot would need a driver-side distinct; the
    fixed list keeps the plan a single groupBy)."""
    ev = _t(spark, sf_dir, "events")
    piv = (
        ev.groupBy("user_id")
        .pivot("event_type", _TYPES)
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "user_id",
        *[
            F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}")
            for t in _TYPES
        ],
    ).orderBy("user_id")


_PIVOT_SQL = """
SELECT user_id,
       CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
       CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
       CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view
FROM events GROUP BY user_id ORDER BY user_id
"""


def events_value_percentiles_by_type(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Grouped exact percentiles of the event value per type —
    Spark ``percentile`` == DuckDB ``quantile_cont`` (same p·(n−1)
    convention); at 100 TB swap in approx_percentile (same shape)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.expr("percentile(value, 0.9)").alias("p90"),
            F.expr("percentile(value, 0.99)").alias("p99"),
        )
        .orderBy("event_type")
    )


_PCTL_SQL = """
SELECT event_type,
       quantile_cont(value, 0.5) AS p50,
       quantile_cont(value, 0.9) AS p90,
       quantile_cont(value, 0.99) AS p99
FROM events GROUP BY event_type ORDER BY event_type
"""


def events_rolling_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-frame time-series features per user: rolling count /
    sum / min / max over the last 5 events (ROWS BETWEEN 4 PRECEDING
    AND CURRENT ROW) plus the inter-event gap — the standard feature
    block in fraud/engagement models.

    Scale shape: ONE hash exchange on user_id serves every window
    (same partitioning, same (ts, event_id) ordering); the frame is
    row-bounded so state per row is O(1) — no unbounded-preceding
    running state, no driver involvement. Gap is integral (epoch
    microseconds) and the rolling sum is exact decimal, cast to
    double only at the edge (cross-engine hash conventions)."""
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events")
    order = [F.col("ts"), F.col("event_id")]
    w = Window.partitionBy("user_id").orderBy(*order).rowsBetween(-4, 0)
    wl = Window.partitionBy("user_id").orderBy(*order)
    us = F.unix_micros(F.col("ts"))
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("roll_n"),
        F.sum(F.col("value").cast("decimal(12,2)"))
        .over(w)
        .cast("double")
        .alias("roll_sum"),
        F.min("value").over(w).alias("roll_min"),
        F.max("value").over(w).alias("roll_max"),
        (us - F.lag(us).over(wl)).alias("gap_us"),
    ).orderBy("event_id")


_ROLLING_SQL = """
SELECT event_id, user_id,
       COUNT(*) OVER w AS roll_n,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE) AS roll_sum,
       MIN(value) OVER w AS roll_min,
       MAX(value) OVER w AS roll_max,
       epoch_us(ts) - LAG(epoch_us(ts)) OVER
         (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
ORDER BY event_id
"""


def events_trailing_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame: per event, the count and exact value
    sum of the SAME USER's events in the trailing 30 minutes
    (inclusive) — the time-bounded sibling of the row-bounded frame
    in ``events_rolling_features`` (velocity/rate features where "last
    N events" is the wrong unit and "last 30 minutes" is right).

    Scale shape: one hash exchange on user_id; the frame is bounded
    by a range predicate on the ordering value (epoch µs), evaluated
    with a sliding two-pointer over the sorted partition — O(1) state
    per row, no unbounded running state. RANGE frames include peer
    rows (equal timestamps) in both engines, so ties are
    deterministic without a tiebreak column."""
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-30 * 60 * 1_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_30m"),
        F.sum(F.col("value").cast("decimal(12,2)"))
        .over(w)
        .cast("double")
        .alias("sum_30m"),
    ).orderBy("event_id")


_TRAILING_SQL = """
SELECT event_id, user_id,
       COUNT(*) OVER w AS n_30m,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE) AS sum_30m
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 1800000000 PRECEDING AND CURRENT ROW)
ORDER BY event_id
"""


def events_sliding_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window aggregation in BATCH via the built-in
    ``window()`` generator: overlapping 1-hour windows every 15
    minutes (each event lands in 4 windows) — the batch twin of the
    streaming sliding agg in streaming/windows.py.

    Scale shape: window() explodes each row to its ≤4 windows BEFORE
    the hash aggregate, so map-side partial aggregation still bounds
    the shuffle at (#windows × #groups) rows — same contract as a
    tumbling groupBy, just 4× the explode factor."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window(F.col("ts"), "1 hour", "15 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("w.start").cast("long").alias("window_start"),
            "n_events",
            "sum_value",
        )
        .orderBy("window_start")
    )


# window membership is integral-second exact: window starts are
# multiples of 900 s, so floor(epoch) preserves the boundary compare
_SLIDING_SQL = """
WITH t AS (
  SELECT CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS te, value FROM events
), w AS (
  SELECT unnest(generate_series(((te - 3600) // 900 + 1) * 900,
                                (te // 900) * 900, 900)) AS ws,
         value
  FROM t
)
SELECT ws AS window_start, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
FROM w GROUP BY ws ORDER BY ws
"""


def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path analytics: per-user consecutive event-type transitions
    (Markov transition counts + within-source share) — the
    click-path sibling of the funnel query.

    Plan: ONE hash exchange on user_id for the lead() pairing; the
    transition aggregate is map-side combining on the 25-cell pair
    space; the share window runs on the 25-row aggregate."""
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            "user_id",
            F.col("event_type").alias("src"),
            F.lead("event_type").over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wsrc = Window.partitionBy("src")
    return pairs.select(
        "src",
        "dst",
        "n",
        (
            F.col("n").cast("double")
            / F.sum("n").over(wsrc).cast("double")
        ).alias("share"),
    ).orderBy("src", "dst")


_TRANSITION_SQL = """
WITH pairs AS (
  SELECT src, dst FROM (
    SELECT event_type AS src,
           LEAD(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS dst
    FROM events
  ) WHERE dst IS NOT NULL
), counts AS (
  SELECT src, dst, COUNT(*) AS n FROM pairs GROUP BY src, dst
)
SELECT src, dst, n,
       CAST(n AS DOUBLE)
         / CAST(CAST(SUM(n) OVER (PARTITION BY src) AS BIGINT) AS DOUBLE)
         AS share
FROM counts ORDER BY src, dst
"""


def array_map_functions_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/map scalar surface: sequence, aggregate, array_max,
    contains, slice, reverse, array_join, map_from_arrays,
    element_at, map_keys — deterministic per-row arrays derived from
    event_id so the oracle can state the expected values in closed
    form. Arrays are emitted joined-to-string (hash-stable across
    engines' list renderings)."""
    ev = _t(spark, sf_dir, "events")
    n = (F.col("event_id") % 5 + 1).cast("int")
    arr = F.sequence(F.lit(1), n)
    m = F.map_from_arrays(
        F.array(F.lit("a"), F.lit("b")), F.array(n, n * 2)
    )
    return ev.select(
        "event_id",
        n.alias("n"),
        F.array_join(arr, ",").alias("arr_str"),
        F.aggregate(arr, F.lit(0), lambda acc, x: acc + x)
        .cast("long")
        .alias("arr_sum"),
        F.array_max(arr).alias("arr_max"),
        F.array_contains(arr, 3).alias("has3"),
        F.array_join(F.slice(arr, 1, 2), ",").alias("first2_str"),
        F.array_join(F.reverse(arr), ",").alias("rev_str"),
        F.element_at(m, "b").cast("long").alias("map_b"),
        F.array_join(F.map_keys(m), ",").alias("keys_str"),
    ).orderBy("event_id")


_ARRAYMAP_SQL = """
SELECT event_id,
       CAST(event_id % 5 + 1 AS INT) AS n,
       array_to_string(generate_series(1, event_id % 5 + 1), ',') AS arr_str,
       CAST((event_id % 5 + 1) * (event_id % 5 + 2) // 2 AS BIGINT) AS arr_sum,
       CAST(event_id % 5 + 1 AS INT) AS arr_max,
       event_id % 5 + 1 >= 3 AS has3,
       array_to_string(generate_series(1, LEAST(event_id % 5 + 1, 2)), ',')
         AS first2_str,
       array_to_string(list_reverse(generate_series(1, event_id % 5 + 1)), ',')
         AS rev_str,
       CAST((event_id % 5 + 1) * 2 AS BIGINT) AS map_b,
       'a,b' AS keys_str
FROM events ORDER BY event_id
"""


def events_zorder_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) curve audit: interleave (user_id, minute) low
    16 bits into the 32-bit curve key that ``functions.io.write_zorder``
    lays files out on, then summarize curve buckets. Pins the bit
    dilation arithmetic — the part an engine can silently get wrong —
    bit-for-bit against the oracle; the layout/pruning effect itself
    is asserted in tests/test_io.py (file min/max coverage)."""
    from tidb_cdc_spark.functions.io import morton_z2

    ev = _t(spark, sf_dir, "events")
    x = F.col("user_id") % 65536
    # integral `div`, not `/`: float division of epoch-µs longs can
    # round across a minute boundary
    y = F.expr("(unix_micros(ts) div 60000000) % 65536")
    z = morton_z2(x, y)
    return (
        ev.select(z.alias("_z"))
        .groupBy(F.shiftright(F.col("_z"), 24).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("_z").alias("z_min"),
            F.max("_z").alias("z_max"),
        )
        .orderBy("bucket")
    )


# staged bit dilation (shift-or-mask) — decimal literals for
# 0x00FF00FF / 0x0F0F0F0F / 0x33333333 / 0x55555555
_ZORDER_SQL = """
WITH base AS (
  SELECT user_id % 65536 AS x,
         (epoch_us(ts) // 60000000) % 65536 AS y
  FROM events
), a AS (
  SELECT (x & 65535) AS x, (y & 65535) AS y FROM base
), b AS (
  SELECT ((x | (x << 8)) & 16711935) AS x, ((y | (y << 8)) & 16711935) AS y FROM a
), c AS (
  SELECT ((x | (x << 4)) & 252645135) AS x, ((y | (y << 4)) & 252645135) AS y FROM b
), d AS (
  SELECT ((x | (x << 2)) & 858993459) AS x, ((y | (y << 2)) & 858993459) AS y FROM c
), e AS (
  SELECT ((x | (x << 1)) & 1431655765) AS x, ((y | (y << 1)) & 1431655765) AS y FROM d
), zc AS (
  SELECT (x | (y << 1)) AS _z FROM e
)
SELECT _z >> 24 AS bucket, COUNT(*) AS n, MIN(_z) AS z_min, MAX(_z) AS z_max
FROM zc GROUP BY bucket ORDER BY bucket
"""


def events_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score outlier detection (|z| > 3) — the anomaly
    screen a metrics pipeline runs over an event stream.

    Cross-engine exactness: the per-type moments (n, Σv, Σv²) are
    EXACT decimal sums (value is 2-dp; v² is 4-dp; order-independent),
    converted to double only for mean/var/z — identical IEEE inputs +
    identical op order ⇒ identical doubles in any engine, so the
    |z| > 3 cut selects identical rows. Plan: one map-side-combining
    aggregate to a #types-row stats table, broadcast back onto the
    scan — the rows shuffle zero times.
    """
    from tidb_cdc_spark.session import read_table

    ev = read_table(spark, sf_dir, "events")
    d2 = F.col("value").cast("decimal(18,2)")
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(d2).alias("_s"),
        F.sum((d2 * d2).cast("decimal(28,4)")).alias("_ss"),
    )
    mean = F.col("_s").cast("double") / F.col("_n").cast("double")
    # E[x²]−mean² can go tiny-negative in floating point for a near-
    # constant group (and 0 for a constant/single-row one): clamp to 0
    # and drop var=0 groups — no outliers exist there, and DuckDB's
    # sqrt ERRORS on negative input where Spark yields NaN, so the
    # clamp must live identically in both engines (_OUTLIERS_SQL).
    var = F.greatest(
        F.col("_ss").cast("double") / F.col("_n").cast("double") - mean * mean,
        F.lit(0.0),
    )
    m = stats.select("event_type", mean.alias("_mean"), var.alias("_var")).filter(
        F.col("_var") > 0
    )
    z = (F.col("value") - F.col("_mean")) / F.sqrt(F.col("_var"))
    return (
        ev.join(F.broadcast(m), "event_type")
        .filter(F.abs(z) > 3)
        .select(
            "event_type",
            "event_id",
            "value",
            F.round(z, 4).alias("z"),
        )
        .orderBy("event_type", "event_id")
    )


_OUTLIERS_SQL = """
WITH st AS (
  SELECT event_type, COUNT(*) AS n,
         SUM(CAST(value AS DECIMAL(18,2))) AS s,
         SUM(CAST(CAST(value AS DECIMAL(18,2))
                  * CAST(value AS DECIMAL(18,2)) AS DECIMAL(28,4))) AS ss
  FROM events GROUP BY event_type
), m0 AS (
  SELECT event_type,
         CAST(s AS DOUBLE)/CAST(n AS DOUBLE) AS mean,
         GREATEST(
           CAST(ss AS DOUBLE)/CAST(n AS DOUBLE)
             - (CAST(s AS DOUBLE)/CAST(n AS DOUBLE))
               * (CAST(s AS DOUBLE)/CAST(n AS DOUBLE)),
           0) AS var
  FROM st
), m AS (
  SELECT * FROM m0 WHERE var > 0
)
SELECT e.event_type, e.event_id, e.value,
       ROUND((e.value - m.mean)/sqrt(m.var), 4) AS z
FROM events e JOIN m USING (event_type)
WHERE ABS((e.value - m.mean)/sqrt(m.var)) > 3
ORDER BY e.event_type, e.event_id
"""


def events_value_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-type outliers by median absolute deviation —
    the screen that survives what breaks z-scores: a single extreme
    value inflates mean AND stddev (masking itself), while the median
    and MAD are 50%-breakdown robust.

    |v − median| > 3·MAD, MAD = median(|v − median|). Cross-engine
    exactness: Spark ``percentile`` and DuckDB ``quantile_cont`` share
    the p·(n−1) interpolation convention (pinned since r1), both
    medians are computed from identical doubles, and the final ratio
    divides identical doubles — so both engines select identical rows.
    Plan: two small per-type aggregates (percentile is sort-based but
    groups are #types), each broadcast back onto the scan — event rows
    shuffle zero times; at 100 TB swap ``percentile`` for
    ``approx_percentile`` with the same call shape.
    """
    from tidb_cdc_spark.session import read_table

    ev = read_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("_med")
    )
    withmed = ev.join(F.broadcast(med), "event_type")
    mad = withmed.groupBy("event_type").agg(
        F.expr("percentile(abs(value - _med), 0.5)").alias("_mad")
    )
    dev = F.abs(F.col("value") - F.col("_med"))
    return (
        withmed.join(F.broadcast(mad.filter(F.col("_mad") > 0)), "event_type")
        .filter(dev > 3 * F.col("_mad"))
        .select(
            "event_type",
            "event_id",
            "value",
            F.round(dev / F.col("_mad"), 4).alias("dev_ratio"),
        )
        .orderBy("event_type", "event_id")
    )


_MAD_SQL = """
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS m
  FROM events GROUP BY event_type
), mad AS (
  SELECT e.event_type, quantile_cont(ABS(e.value - med.m), 0.5) AS d
  FROM events e JOIN med USING (event_type) GROUP BY e.event_type
)
SELECT e.event_type, e.event_id, e.value,
       ROUND(ABS(e.value - med.m) / mad.d, 4) AS dev_ratio
FROM events e JOIN med USING (event_type) JOIN mad USING (event_type)
WHERE mad.d > 0 AND ABS(e.value - med.m) > 3 * mad.d
ORDER BY e.event_type, e.event_id
"""


def events_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy users (> 80 events) via Count-Min sketch screen + exact
    verify (functions/sketch.py). End-to-end oracle-checkable
    DESPITE the sketch: CMS never under-counts, so the screen has
    guaranteed 100% recall and the exact verify pass drops collision
    false-positives — the output is exactly SQL's HAVING COUNT(*) >
    80, with the plan shape a streaming/mergeable pipeline uses."""
    from tidb_cdc_spark.functions.sketch import heavy_hitters
    from tidb_cdc_spark.session import read_table

    ev = read_table(spark, sf_dir, "events")
    return heavy_hitters(ev, "user_id", min_count=80).orderBy("user_id")


_CMS_HH_SQL = """
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
FROM events GROUP BY user_id HAVING COUNT(*) > 80
ORDER BY user_id
"""


QUERIES = {
    "events_funnel": events_funnel,
    "events_value_outliers": events_value_outliers,
    "events_value_mad_outliers": events_value_mad_outliers,
    "events_cohort_retention": events_cohort_retention,
    "events_daily_gapfill": events_daily_gapfill,
    "events_pivot_by_type": events_pivot_by_type,
    "events_value_percentiles_by_type": events_value_percentiles_by_type,
    "events_rolling_features": events_rolling_features,
    "events_trailing_30m": events_trailing_30m,
    "events_sliding_1h": events_sliding_1h,
    "array_map_functions_showcase": array_map_functions_showcase,
    "events_transition_matrix": events_transition_matrix,
    "events_zorder_buckets": events_zorder_buckets,
    "events_heavy_hitters_cms": events_heavy_hitters_cms,
}

ORACLE = {
    "events_heavy_hitters_cms": _CMS_HH_SQL,
    "events_value_outliers": _OUTLIERS_SQL,
    "events_value_mad_outliers": _MAD_SQL,
    "events_rolling_features": _ROLLING_SQL,
    "events_trailing_30m": _TRAILING_SQL,
    "events_sliding_1h": _SLIDING_SQL,
    "array_map_functions_showcase": _ARRAYMAP_SQL,
    "events_transition_matrix": _TRANSITION_SQL,
    "events_zorder_buckets": _ZORDER_SQL,
    "events_funnel": _FUNNEL_SQL,
    "events_cohort_retention": _COHORT_SQL,
    "events_daily_gapfill": _GAPFILL_SQL,
    "events_pivot_by_type": _PIVOT_SQL,
    "events_value_percentiles_by_type": _PCTL_SQL,
}
