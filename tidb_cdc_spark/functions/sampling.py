"""Deterministic sampling for training-data pipelines.

A 100 TB corpus is never sampled with ``rand()`` — reruns must pick
the SAME rows (reproducible ablations, resumable jobs, consistent
train/eval splits), so the keep/drop decision is a pure function of
a stable key: hash the key, keep the row iff the hash falls below
the rate threshold. Everything here is codegen expressions (md5 →
hex → integer compare); a sample is a filtered scan — no shuffle,
no state, trivially parallel at any scale.

md5 (not xxhash64) is used for the bucket hash so the SAME sample
can be reproduced in any other engine (DuckDB/Postgres/Python all
ship md5; xxhash64 seeds differ across libraries) — sampling is a
cross-system contract in practice (the eval set drawn by the Spark
job must be reproducible by the offline notebook).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: 2^32 — the bucket hash is 32 bits (first 8 hex chars of md5).
_BUCKET_SPACE = 4294967296


def hash_bucket(key: Column, salt: str = "") -> Column:
    """Uniform bucket in [0, 2^32) from a stable key: first 4 bytes
    of md5(key ‖ salt). Change ``salt`` to draw an independent
    sample from the same keys (split trains/evals by salt)."""
    h = F.md5(F.concat(key.cast("string"), F.lit(salt)))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long")


def hash_sample(
    df: DataFrame, key_col: str, rate: float, salt: str = ""
) -> DataFrame:
    """Deterministic ``rate``-fraction sample keyed on ``key_col``.

    The filter is a pure scan predicate — at 100 TB this is a single
    pass with no shuffle, and (unlike ``df.sample``) every rerun,
    every engine, and every partition layout selects the same rows.
    """
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    thresh = int(rate * _BUCKET_SPACE)
    return df.filter(hash_bucket(F.col(key_col), salt) < F.lit(thresh))


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    rate: float,
    max_weight: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic WEIGHTED Bernoulli sample: row kept with
    probability ``rate · w / max_weight`` (importance sampling by
    e.g. token count — longer documents proportionally likelier).

    The decision is the exact integer compare
    ``bucket · max_weight < rate·2³² · w`` — no float pow/log (the
    classic ``u^(1/w)`` priority-sampling key is float-rounding
    hazardous across engines), so any engine reproduces the same
    rows. Scan-only predicate like the rest of the family.

    ``max_weight`` must bound the weight column (checked at runtime:
    an overweight row would silently exceed probability 1) and keep
    ``rate·2³²·max_weight`` inside int64 — enforced here.
    """
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    # The runtime predicate computes bucket·max_weight where bucket
    # ranges over the FULL [0, 2^32) space regardless of rate, so the
    # bound must be rate-independent — else e.g. rate=0.25 admits a
    # max_weight whose product wraps negative in non-ANSI mode and
    # silently keeps rows that should drop.
    if max_weight <= 0 or _BUCKET_SPACE * max_weight >= 2**62:
        raise ValueError(f"max_weight {max_weight} out of safe range")
    thresh = int(rate * _BUCKET_SPACE)
    w = F.col(weight_col).cast("long")
    guard = F.when(
        w <= max_weight, hash_bucket(F.col(key_col), salt) * F.lit(max_weight)
    ).otherwise(
        F.raise_error(
            F.lit(f"{weight_col} exceeds max_weight {max_weight}")
        ).cast("long")
    )
    return df.filter(guard < F.lit(thresh) * w)


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. per-language rates to
    rebalance a pretraining mix). ``rates`` maps stratum value →
    keep fraction; strata not listed get ``default_rate``.

    Same scan-only shape as ``hash_sample`` — the stratum threshold
    is a CASE expression on the stratum column, so no join against a
    rates table is needed (broadcast-join a rates table instead once
    the map stops fitting in a literal CASE — thousands of strata)."""
    for s, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for stratum {s!r} must be in [0, 1], got {r}")
    thresh: Column = F.lit(int(default_rate * _BUCKET_SPACE))
    for s, r in sorted(rates.items()):
        thresh = (
            F.when(F.col(strata_col) == s, F.lit(int(r * _BUCKET_SPACE)))
            .otherwise(thresh)
        )
    return df.filter(hash_bucket(F.col(key_col), salt) < thresh)


def split_assign(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float],
    salt: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Deterministic named splits (train/val/test) keyed on
    ``key_col``: bucket = ``hash_bucket(key, salt)``, cumulative
    fraction thresholds carve [0, 2³²) into one interval per split.
    Scan-only CASE expression — no shuffle, reproducible across
    engines, reruns, and partition layouts.

    The KEY is the leakage contract: split on ``doc_id`` and
    near-duplicates land on both sides of the train/eval fence —
    the classic self-contamination bug (one reason dedup-before-
    split matters, Lee et al. 2021). Pass a dup-CLUSTER id instead
    and every duplicate family moves as one unit; see
    ``corpus_cluster_safe_split``.
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    if any(f < 0 for f in fractions.values()):
        raise ValueError("fractions must be non-negative")
    bucket = hash_bucket(F.col(key_col), salt)
    names = list(fractions)
    expr = F.lit(names[-1])  # remainder absorbs rounding
    cum = 0.0
    cases = []
    for name in names[:-1]:
        cum += fractions[name]
        cases.append((int(cum * _BUCKET_SPACE), name))
    for thresh, name in reversed(cases):
        expr = F.when(bucket < F.lit(thresh), F.lit(name)).otherwise(expr)
    return df.withColumn(split_col, expr)


def sampled_train(df, train_fraction: float, min_rows: int, seed: int):
    """Deterministic training sample for iterative fits (k-means
    converges on far less data than the corpus — at 100 TB a
    full-data fit would dominate the job). Falls back to the full
    frame when the Bernoulli sample lands under ``min_rows``
    (tiny-corpus guard; the limit() probe stops scanning once
    min_rows rows are seen). Shared by ``semdedup.semantic_dedup``
    and the PQ/OPQ codebook fits (functions/pq.py)."""
    if train_fraction >= 1.0:
        return df
    sample = df.sample(fraction=train_fraction, seed=seed)
    if sample.limit(min_rows).count() < min_rows:
        return df
    return sample


def exact_stratified_split(
    df: DataFrame,
    strata_col: str = "source",
    key_col: str = "doc_id",
    quotas_ppm: "tuple[tuple[str, int], ...]" = (
        ("train", 800_000),
        ("val", 100_000),
        ("test", 100_000),
    ),
    salt: str = "split-v1",
    split_col: str = "split",
) -> DataFrame:
    """EXACT-quota stratified split: within every stratum, rank rows
    in deterministic md5 order and carve the ranks by cumulative
    ppm quotas — split sizes are exact floors of n·quota (the last
    split absorbs the remainder), unlike :func:`split_assign` whose
    hash intervals are only proportional in expectation (±√n noise —
    fine corpus-wide, wrong when a run needs "exactly 10% of EACH
    source held out").

    Determinism contract: order key = md5(salt:key), tie-broken by
    the key column — engine-reproducible, layout-independent, and
    stable under re-runs. The leakage caveat of ``split_assign``
    applies unchanged: pass a dup-cluster id as ``key_col`` to move
    duplicate families as one unit.

    Scale (100 TB): the per-stratum rank uses the banded two-level
    pattern (operators/windows.py::banded_offsets rationale) — the
    md5 FIRST BYTE is the band (prefix of the order key, so
    band-major order equals key order), per-(stratum, band) counts
    prefix-sum on a ≤256·n_strata-row window, and the data-sized
    row_number runs partitioned by (stratum, band). No single-task
    unbounded window at any stratum size.

    Output: ``(key, stratum, rank, split)`` with ``rank`` 1-based
    within the stratum."""
    from pyspark.sql.window import Window as W

    names = [n for n, _ in quotas_ppm]
    if len(set(names)) != len(names):
        raise ValueError("duplicate split names")
    ppms = [p for _, p in quotas_ppm]
    if any(p < 0 for p in ppms) or sum(ppms) != 1_000_000:
        raise ValueError("quotas_ppm must be non-negative and sum to 1e6")

    key = F.md5(
        F.concat(F.lit(salt), F.lit(":"), F.col(key_col).cast("string"))
    )
    d = df.select(
        F.col(key_col).alias("_key"),
        F.col(strata_col).alias("_stratum"),
        key.alias("_ord"),
        F.conv(F.substring(key, 1, 2), 16, 10).cast("int").alias("_band"),
    )
    totals = d.groupBy("_stratum", "_band").agg(
        F.count(F.lit(1)).alias("_tot")
    )
    offs = totals.select(
        "_stratum",
        "_band",
        F.coalesce(
            F.sum("_tot").over(
                W.partitionBy("_stratum")
                .orderBy("_band")
                .rowsBetween(W.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("_off"),
    )
    n = totals.groupBy("_stratum").agg(F.sum("_tot").alias("_n"))
    within = F.row_number().over(
        W.partitionBy("_stratum", "_band").orderBy("_ord", "_key")
    )
    ranked = (
        d.join(F.broadcast(offs), ["_stratum", "_band"])
        .join(F.broadcast(n), "_stratum")
        .withColumn("_rank", (F.col("_off") + within).cast("long"))
    )
    expr = F.lit(names[-1])
    cum = 0
    cases = []
    for name, p in quotas_ppm[:-1]:
        cum += p
        cases.append((cum, name))
    for cum, name in reversed(cases):
        expr = F.when(
            F.col("_rank") * F.lit(1_000_000) <= F.col("_n") * F.lit(cum),
            F.lit(name),
        ).otherwise(expr)
    return ranked.select(
        F.col("_key").alias(key_col),
        F.col("_stratum").alias(strata_col),
        F.col("_rank").alias("rank"),
        expr.alias(split_col),
    )
