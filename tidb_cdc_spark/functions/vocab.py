"""Tokenizer-vocabulary induction and corpus coverage — the "what
vocabulary does this corpus need" stage a training pipeline runs
before tokenizer training (frequency-ranked candidate table, token
coverage curve, OOV mass estimate).

Operators:

- :func:`top_terms` — corpus-wide token frequency top-K with rank
  and cumulative-coverage ppm (the vocabulary candidate table; its
  coverage column IS the tokenizer coverage curve).
- :func:`source_overlap` — cross-source exact-duplicate overlap
  matrix (how much of source A is verbatim inside source B) via
  content fingerprints — the "is Common-Crawl-v2 just v1 again"
  audit that decides whether sources are mixed or deduped first.

Cross-engine exactness: counts and ranks are integral; coverage is
ppm BIGINT via truncating integer division (Spark ``div`` == DuckDB
``//``); ties rank by (count DESC, token ASC) — total order, no
engine-dependent tie behavior.

Scale shape (100 TB):
- term counting is one map-side-combining groupBy over exploded
  tokens (shuffle ∝ distinct terms per partition, not corpus size);
- top-K is ``orderBy().limit(k)`` — Spark plans TakeOrderedAndProject
  (per-partition heap + driver merge of K rows), NOT a global sort;
- rank/cumulative windows run on the K-row result only — the
  single-partition window is over K rows, never the corpus;
- the overlap matrix joins distinct (fingerprint, source) pairs on
  fingerprint: per-fingerprint fan-out is bounded by #sources, so
  the self-join never goes quadratic in documents.

Reference scope note: the reference engine (dollarkillerx/tidb-cdc)
has no corpus surface; this is north-star pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tidb_cdc_spark.functions import text as T

#: parts-per-million scale for coverage ratios.
PPM = 1_000_000


def term_counts(
    docs: DataFrame, text_col: str = "text", lowercase: bool = True
) -> DataFrame:
    """(token, cnt): corpus-wide token frequencies. One exploded
    map-side-combining groupBy; whitespace tokenization matching
    functions/text.py conventions."""
    col = F.col(text_col)
    if lowercase:
        col = F.lower(col)
    return (
        docs.select(F.explode(T.tokens(col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def top_terms(
    docs: DataFrame, k: int = 100, text_col: str = "text"
) -> DataFrame:
    """Top-``k`` vocabulary candidates: (token, cnt, rank, cum_cnt,
    coverage_ppm). ``coverage_ppm`` is the cumulative share of ALL
    corpus tokens covered by ranks 1..rank — the tokenizer coverage
    curve. Rank ties break by token (total order)."""
    tc = term_counts(docs, text_col)
    total = tc.agg(F.sum("cnt").cast("long").alias("_total"))
    # TakeOrderedAndProject: per-partition top-k heap, k-row driver
    # merge — no global sort of the vocabulary table.
    top = tc.orderBy(F.desc("cnt"), F.asc("token")).limit(k)
    w = Window.orderBy(F.desc("cnt"), F.asc("token"))
    return (
        top.withColumn("rank", F.row_number().over(w))
        .withColumn(
            "cum_cnt",
            F.sum("cnt").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "token",
            "cnt",
            F.col("rank").cast("long").alias("rank"),
            F.col("cum_cnt").cast("long").alias("cum_cnt"),
            F.expr(f"{PPM} * cum_cnt div _total").alias("coverage_ppm"),
        )
    )


def source_overlap(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    prefix_chars: int = 100,
) -> DataFrame:
    """(source_a, source_b, shared_fps, a_total_fps, b_total_fps,
    overlap_ppm): for every source pair (a < b), how many distinct
    content fingerprints they share, and that count as ppm of the
    SMALLER side's distinct fingerprints (containment, not Jaccard —
    the question is "is B inside A", and containment is what decides
    dedup order).

    The fingerprint is md5 of the first ``prefix_chars`` characters
    (engine-portable): a HEAD fingerprint catches the common scrape
    artifact — same article, different trailing boilerplate — that a
    whole-document hash misses; pass ``prefix_chars=None`` for exact
    whole-text overlap. The join key is the fingerprint, so per-key
    fan-out ≤ #sources."""
    from tidb_cdc_spark.session import materialize

    head = (
        F.col(text_col)
        if prefix_chars is None
        else F.substring(F.col(text_col), 1, prefix_chars)
    )
    # materialized: the self-join below would otherwise recompute the
    # scan + distinct shuffle for EACH side — two full corpus reads
    fs = materialize(
        docs.select(
            F.md5(head).alias("fp"),
            F.col(source_col).alias("source"),
        ).distinct()
    )
    per_source = fs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("total_fps")
    )
    a = fs.alias("a")
    b = fs.alias("b")
    pairs = (
        a.join(b, on="fp")
        .where(F.col("a.source") < F.col("b.source"))
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("shared_fps"))
    )
    # per_source is #sources rows — broadcast both attachments.
    return (
        pairs.join(
            F.broadcast(per_source.withColumnRenamed("total_fps", "a_total_fps")),
            pairs.source_a == F.col("source"),
        )
        .drop("source")
        .join(
            F.broadcast(per_source.withColumnRenamed("total_fps", "b_total_fps")),
            F.col("source_b") == F.col("source"),
        )
        .drop("source")
        .select(
            "source_a",
            "source_b",
            "shared_fps",
            "a_total_fps",
            "b_total_fps",
            F.expr(
                f"{PPM} * shared_fps div least(a_total_fps, b_total_fps)"
            ).alias("overlap_ppm"),
        )
    )


def length_quantile_bounds(
    docs: DataFrame,
    tokens_col: str = "n_tokens",
    source_col: str = "source",
    lo: float = 0.05,
    hi: float = 0.95,
) -> DataFrame:
    """Per-source audit of a corpus-level token-length band filter:
    (source, kept, dropped_short, dropped_long, lo_bound, hi_bound).

    Bounds are EXACT corpus percentiles (Spark ``percentile`` ==
    DuckDB ``quantile_cont``, same p·(n−1) convention — verified
    bit-identical in round 1). Exact percentile buffers values
    per-partition; at 100 TB swap in ``approx_percentile`` (same
    call shape) and keep the oracle on the exact path at test SF.
    The 1-row bounds frame is broadcast; the per-source agg is one
    map-side-combining groupBy."""
    n = F.col(tokens_col).cast("double")
    bounds = docs.agg(
        F.expr(f"percentile({tokens_col}, {lo})").alias("lo_bound"),
        F.expr(f"percentile({tokens_col}, {hi})").alias("hi_bound"),
    )
    return (
        docs.crossJoin(F.broadcast(bounds))
        .groupBy(F.col(source_col).alias("source"))
        .agg(
            F.sum(
                F.when(
                    (n >= F.col("lo_bound")) & (n <= F.col("hi_bound")), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("kept"),
            F.sum(F.when(n < F.col("lo_bound"), 1).otherwise(0))
            .cast("long")
            .alias("dropped_short"),
            F.sum(F.when(n > F.col("hi_bound"), 1).otherwise(0))
            .cast("long")
            .alias("dropped_long"),
            F.first("lo_bound").alias("lo_bound"),
            F.first("hi_bound").alias("hi_bound"),
        )
    )


def term_drift(
    old_docs: DataFrame,
    new_docs: DataFrame,
    k: int = 50,
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` corpus-drift terms between two snapshots: (token,
    ppm_old, ppm_new, delta_ppm) ranked by |delta| — the
    distribution-shift monitor a training pipeline runs per snapshot
    (a crawl that suddenly over-represents a template shows up as
    ppm risers before it poisons a mixture).

    Exactness: per-snapshot ppm = cnt·10⁶ div total — integral,
    order-independent, identical in any engine. Plan: two
    map-side-combining term aggregates, a full-outer equi-join on
    the token (vocabulary-sized, not corpus-sized), TakeOrdered
    top-k. A vanished/new term contributes its full ppm as delta.
    """
    def ppm(docs: DataFrame) -> DataFrame:
        tc = term_counts(docs, text_col)
        tot = tc.agg(F.sum("cnt").cast("long").alias("_t"))
        # cnt·10⁶ through decimal: a BIGINT product would overflow
        # once one token exceeds ~9×10¹² occurrences (possible at
        # 100 TB); DuckDB BIGINT multiplication ERRORS on overflow
        # (verified — it does not auto-widen), so the SQL twin
        # carries an explicit HUGEINT cast to stay exact
        return tc.crossJoin(F.broadcast(tot)).select(
            "token",
            F.expr("CAST(CAST(cnt AS DECIMAL(38,0)) * 1000000 div _t AS BIGINT)").alias(
                "ppm"
            ),
        )

    o = ppm(old_docs).withColumnRenamed("ppm", "ppm_old")
    n = ppm(new_docs).withColumnRenamed("ppm", "ppm_new")
    j = (
        o.join(n, "token", "full_outer")
        .select(
            "token",
            F.coalesce("ppm_old", F.lit(0)).alias("ppm_old"),
            F.coalesce("ppm_new", F.lit(0)).alias("ppm_new"),
        )
        .withColumn("delta_ppm", F.col("ppm_new") - F.col("ppm_old"))
    )
    return (
        j.orderBy(F.abs(F.col("delta_ppm")).desc(), F.col("token"))
        .limit(k)
    )
