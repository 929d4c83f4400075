"""Corpus mixing / batch-layout planning — the "how much of each
source do we train on, and what does the batch layout cost" stage
that runs after filtering/dedup and beside sequence packing
(functions/packing.py).

Three operators:

- :func:`source_mix_plan` — per-source sampling plan toward a target
  mixture (uniform or explicit per-source weights): natural token
  share, required over/under-sampling factor, the capped sample rate
  and the repetition (epoch) count when a source is too small.
  DoReMi/Pile-style *static* mixture planning — the output is a tiny
  per-source table a sampler (functions/sampling.py) consumes.
- :func:`padding_waste_stats` — cost of fixed-length batching at a
  token ``budget``: per-source chunk counts, padded token volume and
  waste, vs the concat-and-chunk packer's chunk count (the
  padding-vs-packing tradeoff, per source).
- :func:`token_length_histogram` — power-of-two token-length
  buckets via integer floor-log2.

Cross-engine exactness: every ratio is ppm BIGINT via truncating
integer division (Spark ``div`` == DuckDB ``//``), and the log2
bucket is ``length(bin(n))`` — the binary-digit count, exact in both
engines (no float ``log2`` whose value at exact powers of two is
rounding-mode dependent).

Scale shape (100 TB): each operator is one map-side-combining
groupBy over the corpus; the post-aggregate frame is #sources (or
#buckets) rows, so the window/total arithmetic that follows runs on
a trivially small table. Nothing is collected to the driver.

Reference scope note: the reference engine (dollarkillerx/tidb-cdc)
has no corpus surface; this is north-star pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: parts-per-million scale used by every ratio column.
PPM = 1_000_000


def source_stats(
    docs: DataFrame,
    tokens_col: str = "n_tokens",
    source_col: str = "source",
) -> DataFrame:
    """(source, n_docs, n_tokens): one map-side-combining aggregate;
    output is #sources rows."""
    return docs.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col(tokens_col)).cast("long").alias("n_tokens"),
    )


def source_mix_plan(
    docs: DataFrame,
    tokens_col: str = "n_tokens",
    source_col: str = "source",
    weights_ppm: dict[str, int] | None = None,
    spark: SparkSession | None = None,
) -> DataFrame:
    """Per-source sampling plan toward a target mixture.

    With ``weights_ppm`` (source → target share in ppm) the target
    token count per source is ``total * w div PPM``; without, the
    target is uniform: ``total div n_sources``. Emitted per source:

    - ``natural_ppm``     — the source's share of corpus tokens
    - ``need_ppm``        — required sampling factor (ppm; > PPM
      means the source must repeat to hit its target)
    - ``sample_rate_ppm`` — ``least(need_ppm, PPM)`` — feed to
      functions/sampling.py
    - ``repeat_epochs``   — ``ceil(need_ppm / PPM)`` — how many
      passes over the (sampled) source the mixture implies

    All arithmetic is integral, so the plan is bit-identical in any
    engine. The windows below run over the #sources-row aggregate,
    not the corpus.
    """
    stats = source_stats(docs, tokens_col, source_col)
    w_all = Window.partitionBy()
    stats = stats.withColumn("_total", F.sum("n_tokens").over(w_all))
    if weights_ppm is None:
        stats = stats.withColumn("_k", F.count(F.lit(1)).over(w_all))
        target = F.expr("_total div _k")
    else:
        if spark is None:
            raise ValueError("weights_ppm requires the spark session")
        wdf = spark.createDataFrame(
            [(s, int(w)) for s, w in sorted(weights_ppm.items())],
            "source string, _w_ppm long",
        )
        stats = stats.join(F.broadcast(wdf), "source", "left").withColumn(
            "_w_ppm", F.coalesce(F.col("_w_ppm"), F.lit(0))
        )
        target = F.expr(f"(_total * _w_ppm) div {PPM}")
    need = F.expr(
        f"({PPM}L * _target) div greatest(n_tokens, 1L)"
    )
    return (
        stats.withColumn("_target", target)
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.expr(f"({PPM}L * n_tokens) div _total").alias("natural_ppm"),
            F.col("_target").alias("target_tokens"),
            need.alias("need_ppm"),
            F.least(need, F.lit(PPM)).cast("long").alias("sample_rate_ppm"),
            F.expr(
                f"(({PPM}L * _target) div greatest(n_tokens, 1L)"
                f" + {PPM - 1}L) div {PPM}L"
            ).alias("repeat_epochs"),
        )
    )


def isqrt(col: F.Column) -> F.Column:
    """EXACT integer square root of a non-negative BIGINT column.

    ``floor(sqrt(double))`` alone is rounding-mode hazardous near
    perfect squares, so the float candidate is corrected with one
    integral fix-up step (the double error is < 1 for any int64, so
    one step always lands exactly): c+1 if (c+1)² ≤ x, c−1 if
    c² > x, else c. Pure integer comparisons → engine-identical."""
    c = F.floor(F.sqrt(col.cast("double"))).cast("long")
    return (
        F.when((c + 1) * (c + 1) <= col, c + 1)
        .when(c * c > col, c - 1)
        .otherwise(c)
    )


def temperature_mix_plan(
    docs: DataFrame,
    tokens_col: str = "n_tokens",
    source_col: str = "source",
) -> DataFrame:
    """T=2 (square-root) temperature mixing: target share per source
    ∝ √(its token count) — the standard "flatten the mixture" move
    that boosts small sources without letting any source dominate
    (multilingual-LM sampling temperature, public practice).

    Emitted per source: ``natural_ppm``, ``t2_weight`` (= isqrt of
    token count), ``t2_target_ppm`` (weight share of Σ weights),
    ``target_tokens``, ``need_ppm``, ``sample_rate_ppm``,
    ``repeat_epochs`` — same contract as :func:`source_mix_plan`.
    All integral (exact isqrt + truncating division); windows run on
    the #sources-row aggregate."""
    stats = source_stats(docs, tokens_col, source_col)
    w_all = Window.partitionBy()
    stats = (
        stats.withColumn("_total", F.sum("n_tokens").over(w_all))
        .withColumn("t2_weight", isqrt(F.col("n_tokens")))
        .withColumn("_wsum", F.sum("t2_weight").over(w_all))
        .withColumn(
            "_target", F.expr("(_total * t2_weight) div greatest(_wsum, 1L)")
        )
    )
    need = F.expr(f"({PPM}L * _target) div greatest(n_tokens, 1L)")
    return stats.select(
        "source",
        "n_docs",
        "n_tokens",
        F.expr(f"({PPM}L * n_tokens) div _total").alias("natural_ppm"),
        "t2_weight",
        F.expr(f"({PPM}L * t2_weight) div greatest(_wsum, 1L)").alias(
            "t2_target_ppm"
        ),
        F.col("_target").alias("target_tokens"),
        need.alias("need_ppm"),
        F.least(need, F.lit(PPM)).cast("long").alias("sample_rate_ppm"),
        F.expr(
            f"(({PPM}L * _target) div greatest(n_tokens, 1L)"
            f" + {PPM - 1}L) div {PPM}L"
        ).alias("repeat_epochs"),
    )


def padding_waste_stats(
    docs: DataFrame,
    budget: int,
    tokens_col: str = "n_tokens",
    source_col: str = "source",
) -> DataFrame:
    """Fixed-length batching cost at ``budget`` tokens, per source.

    Each document occupies ``ceil(n/budget)`` padded chunks (its last
    chunk padded up to the budget); the concat-and-chunk packer
    (functions/packing.py) would use ``ceil(sum(n)/budget)`` chunks
    with no padding. Emitted per source: document/token counts, the
    padded chunk count and token volume, waste in ppm of padded
    volume, the packed chunk count, and chunks saved by packing.
    """
    n = F.col(tokens_col)
    chunks = F.when(n > 0, F.expr(f"({tokens_col} + {budget - 1}) div {budget}")).otherwise(
        F.lit(0)
    )
    per_doc = docs.select(
        F.col(source_col).alias("source"),
        n.cast("long").alias("_n"),
        chunks.cast("long").alias("_chunks"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_n").alias("n_tokens"),
            F.sum("_chunks").alias("padded_chunks"),
            (F.sum("_chunks") * F.lit(budget)).alias("padded_tokens"),
        )
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "padded_chunks",
            "padded_tokens",
            F.expr(
                f"({PPM}L * (padded_tokens - n_tokens))"
                " div greatest(padded_tokens, 1L)"
            ).alias("waste_ppm"),
            F.expr(f"(n_tokens + {budget - 1}L) div {budget}L").alias(
                "packed_chunks"
            ),
            F.expr(
                f"padded_chunks - ((n_tokens + {budget - 1}L) div {budget}L)"
            ).alias("chunks_saved"),
        )
    )


def token_length_histogram(
    docs: DataFrame, tokens_col: str = "n_tokens"
) -> DataFrame:
    """Power-of-two token-length histogram: bucket ``b`` holds
    documents with ``2^(b-1) <= n < 2^b`` (bucket 0 = empty docs) —
    the digit count of ``n`` in binary, which both engines compute
    exactly as ``length(bin(n))``."""
    n = F.col(tokens_col)
    bucket = F.when(n > 0, F.length(F.bin(n.cast("long")))).otherwise(
        F.lit(0)
    )
    return (
        docs.select(bucket.cast("long").alias("bucket"), n.cast("long").alias("_n"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_n").alias("n_tokens"),
            F.min("_n").alias("min_tokens"),
            F.max("_n").alias("max_tokens"),
        )
    )
