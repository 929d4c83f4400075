"""Bucketed tables: shuffle-free co-located joins.

The 100 TB join strategy: pay the shuffle ONCE at write time.
Persisting both sides bucketed by the join key into the session
catalog means every subsequent equi-join on that key is planned as a
SortMergeJoin with NO Exchange on either side — output partitioning
is recognized by Catalyst's EnsureRequirements (the bucket spec
satisfies the join's HashClusteredDistribution). For a fact table
joined daily against the same dimension graph, this converts the
dominant per-query cost (re-shuffling the fact table) into a
one-time write cost.

This is the batch analogue of what the CDC MERGE sink needs at
scale: a base snapshot bucketed by PK makes each micro-batch merge a
co-located join (apply.py module docstring).

Sizing rule of thumb at 100 TB: buckets ≈ table_bytes /
(256 MB × compression) rounded to a power of two; all tables that
join together should share the bucket count (or integer multiples,
which Spark ≥3.1 can still co-locate with bucket coalescing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) catalog
    table. Sorting within buckets additionally removes the join-time
    sort of SortMergeJoin — the scan comes back pre-sorted."""
    w = df.write.format("parquet").mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str] | list[tuple[str, str]],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket columns
    (``on`` is either shared column names or (left, right) name
    pairs). With both sides bucketed by the join keys into the same
    bucket count this plans with zero Exchange operators — assert it
    with ``plans.inspect.num_exchanges`` (tests do)."""
    left, right = spark.table(left_table), spark.table(right_table)
    if on and isinstance(on[0], tuple):
        cond = None
        for lc, rc in on:
            c = left[lc] == right[rc]
            cond = c if cond is None else (cond & c)
        return left.join(right, on=cond, how=how)
    return left.join(right, on=list(on), how=how)
