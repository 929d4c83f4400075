"""Window-based composite operators: top-k per group, sessionize.

No reference counterpart (SURVEY §2.1). Both are single-shuffle
window plans — the minimal data movement for their semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    k: int,
    rank_col: str = "rk",
) -> DataFrame:
    """Top-k rows per group via ``row_number``.

    Scale: one shuffle on the group key; Spark's window TopK
    optimization (rank filter pushdown, SPARK-37099) prunes per
    partition before the full sort materializes, so this holds at
    100 TB as long as k is small.
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def sessionize(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    gap_seconds: float,
    tiebreak_cols: list[str] | None = None,
    session_col: str = "session_id",
) -> DataFrame:
    """Assign gap-based session ids per key: a new session starts when
    the time since the previous event exceeds ``gap_seconds``.

    Classic lag + cumulative-sum plan: one shuffle on the key, two
    window passes over the same partitioning (Spark reuses the sort).
    The batch analogue of Structured Streaming's ``session_window``
    (the streaming variant lives in ``streaming/``).
    """
    from pyspark.sql.types import TimestampNTZType, TimestampType

    order = [F.col(ts_col)] + [F.col(c) for c in (tiebreak_cols or [])]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    # Integral microsecond gap: exact int64 arithmetic, bit-identical
    # across engines (a double-seconds compare can flip on the boundary
    # when the fractional part rounds). Non-timestamp ts columns
    # (numeric epoch) fall back to a plain numeric diff.
    ts_type = df.schema[ts_col].dataType
    if isinstance(ts_type, (TimestampType, TimestampNTZType)):
        cur = F.unix_micros(F.col(ts_col).cast("timestamp"))
        prev = F.unix_micros(prev_ts.cast("timestamp"))
        gap = cur - prev
        # round (not int-truncate) so fractional gaps survive the
        # int64 conversion: gap_seconds=0.5 → 500_000 µs, not 0
        threshold = F.lit(round(gap_seconds * 1_000_000))
    else:
        gap = F.col(ts_col) - prev_ts
        threshold = F.lit(gap_seconds)
    is_new = F.when(prev_ts.isNull() | (gap > threshold), 1).otherwise(0)
    return df.withColumn(
        session_col,
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )


def banded_offsets(
    sharded: DataFrame,
    shard_col: str = "_shard",
    weight: "Column | None" = None,
    out_col: str = "_off",
) -> DataFrame:
    """Step 2 of the banded two-level prefix scan (the repo's pattern
    for global running sums/ranks without a single-task unbounded
    window — functions/selection.py module doc): per-shard totals
    (≤ n_shards rows) exclusive-prefix-summed on a TINY window.
    Broadcast-join the returned ``(shard_col, out_col)`` frame back,
    then run the within-shard window PARTITIONED BY the shard;
    global position = offset + within-shard value. ``weight=None``
    counts rows (rank scans); pass a column for weighted running
    sums (token budgets)."""
    agg = (F.count(F.lit(1)) if weight is None else F.sum(weight)).alias(
        "_tot"
    )
    totals = sharded.groupBy(shard_col).agg(agg)
    w = Window.orderBy(shard_col).rowsBetween(Window.unboundedPreceding, -1)
    return totals.select(
        shard_col,
        F.coalesce(F.sum("_tot").over(w), F.lit(0)).alias(out_col),
    )
