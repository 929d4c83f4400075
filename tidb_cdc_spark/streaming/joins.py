"""Stream-stream joins — correlating two live streams (click ↔
purchase attribution, request ↔ response pairing) with bounded
state.

The reference cannot express this at all: its consumer loop
(`cdc_manager.go:109-188`) sees one topic per handler and any
cross-stream correlation is left to external state the user manages.
In Structured Streaming the join IS the operator; the part the
engine must get right is STATE BOUNDING — an unconstrained
stream-stream join buffers both streams forever. Two things bound
it, and :func:`interval_join` enforces both:

- a watermark on each side (how late data may arrive), and
- a time-interval predicate tying the two event times together, so
  rows outside ``[lower, upper]`` of each other can never match and
  their state is dropped once the watermark passes.

Scale (100 TB/day streams, 1000 executors): state per executor is
``rate × (watermark + interval width)`` for only the keys it owns —
both sides hash-partition on the join key, so the join is
co-partitioned and state never concentrates; no global structure
exists anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: stream-stream joins Spark can bound with watermark + interval:
#: inner always; left outer emits unmatched-left after the watermark
#: closes its window (right outer is the mirror — callers swap sides).
_LEGAL = ("inner", "left_outer")


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower: str = "0 seconds",
    upper: str = "10 minutes",
    watermark: str = "10 minutes",
    how: str = "inner",
    right_prefix: str = "r_",
) -> DataFrame:
    """Join two event streams on ``key`` where the right event falls
    in ``[left_ts + lower, left_ts + upper]``.

    Every right column is prefixed with ``right_prefix`` (the two
    streams usually share a schema, and Spark's stream-stream join
    cannot disambiguate same-named columns across sides). Both sides
    are watermarked with the same ``watermark`` horizon; state for a
    key/time region is dropped as soon as the watermark proves no
    future match can land in it.
    """
    if how not in _LEGAL:
        raise ValueError(
            f"stream-stream interval join supports {_LEGAL}, got {how!r}"
            " (for right outer, swap the sides)"
        )
    r = right
    for c in right.columns:
        r = r.withColumnRenamed(c, right_prefix + c)
    lw = left.withWatermark(left_ts, watermark)
    rw = r.withWatermark(right_prefix + right_ts, watermark)
    rts, lts = F.col(right_prefix + right_ts), F.col(left_ts)
    cond = (
        (F.col(key) == F.col(right_prefix + key))
        & (rts >= lts + F.expr(f"INTERVAL {lower}"))
        & (rts <= lts + F.expr(f"INTERVAL {upper}"))
    )
    return lw.join(rw, cond, how)
