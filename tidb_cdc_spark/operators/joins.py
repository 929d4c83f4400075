"""Composite join operators: as-of and range joins.

No reference counterpart (the reference has no joins at all,
SURVEY §2.1); these are the standard time-series operators a CDC /
event engine needs, built so the physical plan stays shuffle-minimal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str] | None = None,
    strict: bool = False,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right_ts <= left_ts`` (``<`` if ``strict``) sharing the key.

    Implementation: union-sort, NOT a range join. A naive
    ``left.join(right, key & right_ts <= left_ts)`` + max explodes
    quadratically per key; instead we union both sides tagged, sort
    per key by time, and carry the most recent right values forward
    with ``last(..., ignorenulls=True)``.

    Scale: exactly ONE shuffle (the window partition on ``on``), no
    join blow-up, linear in |left| + |right| — this is the plan that
    survives 100 TB where per-key event counts are large. Key skew is
    bounded by per-key data, and AQE handles stragglers.
    """
    right_value_cols = right_value_cols or [
        c for c in right.columns if c not in on and c != right_ts
    ]
    lcols = [c for c in left.columns]

    l = left.select(
        *on,
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),  # right (0) sorts before left (1) at equal ts
        F.struct(*lcols).alias("_lrow"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_value_cols],
    )
    r = right.select(
        *on,
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l.schema["_lrow"].dataType).alias("_lrow"),
        *[F.col(c).alias(f"_r_{c}") for c in right_value_cols],
    )
    # strict: right rows at equal ts must NOT match → sort them after left
    if strict:
        l, r = l.withColumn("_side", F.lit(0)), r.withColumn("_side", F.lit(1))

    w = (
        Window.partitionBy(*on)
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = l.unionByName(r)
    carried = merged.select(
        "_lrow",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_c_{c}")
            for c in right_value_cols
        ],
    )
    is_left = F.col("_lrow").isNotNull()
    return carried.filter(is_left).select(
        *[F.col(f"_lrow.{c}").alias(c) for c in lcols],
        *[F.col(f"_c_{c}").alias(c) for c in right_value_cols],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_lo: str,
    right_hi: str,
    how: str = "inner",
) -> DataFrame:
    """Join left points into right intervals:
    ``key match AND right_lo <= left_ts < right_hi``.

    Expressed declaratively so Catalyst can use the equi-key part as
    the hash/broadcast join key and apply the range predicate as a
    post-join filter — the scalable shape when intervals per key are
    modest. For interval-heavy workloads, bucketize the time axis
    upstream (add a coarse time-bucket equi-key) before calling.
    """
    cond = F.lit(True)
    for k in on:
        cond = cond & (left[k] == right[k])
    cond = cond & (right[right_lo] <= left[left_ts]) & (left[left_ts] < right[right_hi])
    joined = left.join(right, cond, how)
    for k in on:  # keep a single copy of the equi-key columns
        joined = joined.drop(right[k])
    return joined
