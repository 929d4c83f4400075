"""Skew mitigation: salting for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most skew
at runtime by splitting oversized shuffle partitions, but two shapes
still need explicit salting at 100 TB:

1. **Skewed aggregation** — one hot group key (e.g. a bot user_id
   with 10⁹ events) lands on one reducer. Two-phase salted agg
   spreads the partial aggregation over N salts, then merges the
   partials: the hot key's work parallelizes N-way and the shuffle
   carries N partial rows instead of 10⁹.
2. **Skewed join against a non-broadcastable side** — replicate the
   small side N ways (explode over salts), salt the big side
   randomly; every hot-key row pair still meets exactly once.

Both are pure DataFrame transforms — no custom partitioner needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum(
    df: DataFrame,
    group_cols: list[str],
    agg_cols: dict[str, str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation with explicit salting: phase 1 groups by
    (keys, salt) — the hot key fans out over ``n_salts`` reducers —
    phase 2 merges partials by key alone.

    ``agg_cols`` maps input column → output alias; supported
    aggregates here are additive (sum/count), which is what makes
    the two-phase split algebraically exact.

    Note Spark's map-side partial aggregation already gives this for
    most cases; explicit salting matters when the hot key's rows are
    spread over MANY input partitions (map-side partials then still
    emit one row per partition per key — fine) but the FINAL agg's
    per-key state is itself huge (distinct-sets, collect_list) or
    the downstream needs the (key, salt) layout. Kept additive-only
    so the semantics stay exact.
    """
    salt = (F.rand(seed=7) * n_salts).cast("int").alias("_salt")
    phase1 = (
        df.withColumn("_salt", salt)
        .groupBy(*group_cols, "_salt")
        .agg(
            *[F.sum(src).alias(f"_p_{alias}") for src, alias in agg_cols.items()]
        )
    )
    return phase1.groupBy(*group_cols).agg(
        *[F.sum(f"_p_{alias}").alias(alias) for alias in agg_cols.values()]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join resilient to hot keys on the BIG side when the small
    side is too large to broadcast outright: the small side is
    replicated ``n_salts`` ways (explode), the big side picks a
    random salt — each big-side row meets each matching small-side
    row exactly once, but the hot key's rows are spread over
    ``n_salts`` shuffle partitions instead of one.

    Cost model: small side shuffle bytes × n_salts vs hot-partition
    wall time ÷ n_salts. Use AQE's skew split first; reach for this
    when the skew is so extreme a single key exceeds one executor's
    memory (AQE splits partitions, not keys... it can split a single
    key's partition too, but only for sort-merge joins — salting
    also covers shuffled hash joins and precedes the shuffle).

    Only big-side-preserving join types are accepted: under right/
    full outer, an unmatched small-side row survives once PER SALT
    REPLICA (n_salts duplicate output rows) — salt the other way
    around for those.
    """
    allowed = {"inner", "left", "left_outer", "left_semi", "left_anti", "semi", "anti"}
    if how not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} not supported — the replicated small "
            f"side would emit unmatched rows n_salts times; use one of {sorted(allowed)}"
        )
    big_salted = big.withColumn(
        "_salt", (F.rand(seed=11) * n_salts).cast("int")
    )
    small_rep = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = big_salted.join(small_rep, on=[on, "_salt"], how=how)
    return out.drop("_salt")
