"""Count-Min sketch (Cormode & Muthukrishnan 2005) — the mergeable
frequency sketch a streaming/100 TB pipeline uses when the key space
is too large to hold exact counts, plus the classic two-pass
heavy-hitter pipeline built on it.

Spark shape: the sketch IS a DataFrame — (row, bucket, cnt) with
depth × width cells. Build = one explode to ``depth`` tagged rows per
record + a map-side-combining groupBy: the shuffle carries at most
depth × width cells per partition regardless of input size, and two
sketches (two days, two sources) merge by unioning tables and
re-summing — the mergeability that makes CMS the distributed choice.

Estimates never under-count (each cell ≥ the key's true count since
collisions only ADD), so screening candidates at a threshold has
guaranteed 100% recall; an exact verify pass over only the
candidates removes collision false-positives. For batch corpora
where keys fit in memory a direct groupBy is cheaper — CMS is the
bounded-memory / streaming / cross-partition-merge shape, and the
heavy-hitter query demonstrates the guarantee end-to-end.

Reference scope note: the reference engine has no sketch surface;
north-star addition in the style of ``sketch_approx`` (HLL++/GK).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(key: Column, row: int, width: int, seed: int) -> Column:
    """Row-``row`` hash bucket: xxhash64 of (key, seed + row) — the
    row index is mixed in as a hashed second value under xxhash64's
    fixed default seed, NOT as the hash seed itself — non-negative
    mod width (pmod — Spark's % keeps the sign). Deterministic and
    row-distinct; reproduce in another engine by hashing the pair."""
    h = F.xxhash64(key, F.lit(seed + row))
    return F.pmod(h, F.lit(width)).cast("int")


def count_min_table(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 2048,
    seed: int = 7,
) -> DataFrame:
    """(row, bucket, cnt): the CMS cell table — ≤ depth × width rows
    total. One explode + one combining groupBy; merge two sketches
    built with identical (depth, width, seed) by union + re-sum."""
    tagged = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _bucket(F.col(key_col), r, width, seed).alias(
                            "bucket"
                        ),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("_c")
    ).select("_c.*")
    return tagged.groupBy("row", "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def count_min_estimates(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 2048,
    seed: int = 7,
) -> DataFrame:
    """Append ``cms_est`` to ``keys``: min over the depth cells each
    key hashes to — row-preserving (duplicate key rows each get the
    estimate; no grouping happens). One broadcast left-join per
    depth row against a ≤ width-row slice of the cell table; keys
    never shuffle. ``cms_est ≥ true count`` always."""
    out = keys
    parts = []
    for r in range(depth):
        b = f"__cms_b{r}"
        c = f"__cms_c{r}"
        cells = sketch.filter(F.col("row") == r).select(
            F.col("bucket").alias(b), F.col("cnt").alias(c)
        )
        out = out.withColumn(b, _bucket(F.col(key_col), r, width, seed))
        out = out.join(F.broadcast(cells), b, "left")
        parts.append(F.coalesce(F.col(c), F.lit(0)))
    return out.withColumn(
        "cms_est", F.least(*parts).cast("long") if depth > 1 else parts[0].cast("long")
    ).drop(*[f"__cms_b{r}" for r in range(depth)], *[f"__cms_c{r}" for r in range(depth)])


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    min_count: int,
    depth: int = 4,
    width: int = 2048,
    seed: int = 7,
) -> DataFrame:
    """Exact heavy hitters via CMS screen + exact verify: keys whose
    TRUE frequency exceeds ``min_count``, with exact counts.

    Pass 1 screens distinct keys against the sketch (est > threshold
    — no false negatives, CMS never under-counts); pass 2 exactly
    counts ONLY the screened candidates (a broadcast semi-join on
    the scan) and drops collision false-positives. Note the batch
    screen still enumerates distinct keys; the sketch's real scale
    win is in a STREAM (maintain table + candidate set per
    micro-batch, constant state) or when merging per-partition/
    per-day sketches — in one-shot batch a direct groupBy(key) has
    the same cost and this pipeline demonstrates the
    guaranteed-recall contract.
    """
    sketch = count_min_table(df, key_col, depth, width, seed)
    cands = count_min_estimates(
        sketch, df.select(key_col).distinct(), key_col, depth, width, seed
    ).filter(F.col("cms_est") > min_count)
    # NULL-SAFE semi join: SQL's GROUP BY ... HAVING includes the
    # NULL-key group, and the CMS screen keeps it (xxhash64 hashes a
    # null deterministically) — a null-rejecting equi-join would
    # silently drop a null heavy hitter here
    cand_keys = cands.select(F.col(key_col).alias("__cms_k"))
    exact = (
        df.join(
            F.broadcast(cand_keys),
            F.col(key_col).eqNullSafe(F.col("__cms_k")),
            "leftsemi",
        )
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .filter(F.col("n_events") > min_count)
    )
    return exact


# ---------------------------------------------------- HLL distinct


def hll_distinct_table(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    lgk: int = 12,
) -> DataFrame:
    """(group cols…, hll binary) — one Datasketches HLL sketch per
    group over ``key_col`` (Spark's native ``hll_sketch_agg``; the
    Apache DataSketches HLL, public library). Unlike
    ``approx_count_distinct`` the SKETCH itself is the output:
    sketches are mergeable (``hll_merge_tables``), so per-group
    distinct state is a constant ~2^lgk bytes no matter how many
    keys flow through — the streaming/partitioned-union shape an
    exact distinct cannot give. At small cardinalities (< a few
    hundred) the sketch runs in sparse mode and the estimate is
    EXACT."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(key_col), F.lit(lgk)).alias("hll")
    )


def hll_merge_tables(
    a: DataFrame, b: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Merge two per-group sketch tables: union + one combining
    ``hll_union_agg`` per group — the associative reduce that lets
    per-batch/per-partition sketches roll up without rescanning any
    raw data."""
    return (
        a.unionByName(b)
        .groupBy(*group_cols)
        .agg(F.hll_union_agg("hll").alias("hll"))
    )


def hll_distinct_estimates(
    table: DataFrame, group_cols: list[str]
) -> DataFrame:
    """(group cols…, distinct_est long) from a sketch table."""
    return table.select(
        *group_cols,
        F.hll_sketch_estimate("hll").alias("distinct_est"),
    )
