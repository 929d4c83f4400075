"""Repetition / quality-filter statistics and eval-set contamination
detection — the Gopher/C4-family document filters a pretraining
pipeline applies between ingestion and dedup, plus the train/eval
n-gram-overlap check run before a corpus ships.

All per-document statistics are native expressions over one
``posexplode`` of the token stream (window ``lead`` builds the
n-grams — the same codegen-friendly shape as
``text.shingle_hash_rows``; array-lambda n-grams are interpreted).

Cross-engine exactness: every ratio is kept INTEGRAL in µ-units
(parts-per-million BIGINT via integer division) — double ratios
round differently between engines at the last decimal, and the
correctness gate hashes values exactly. Consumers that want a float
divide by 1e6 at the edge.

Scale shape (100 TB):
- one shuffle on doc_id for the n-gram window; both downstream
  aggregates cluster on doc_id (``groupBy(doc_id, token)`` is
  satisfied by the doc_id hash partitioning), so no further
  exchanges — ``fan_out_by(doc_id)`` upstream makes the whole
  pipeline a single shuffle;
- the two ``count_distinct`` columns plan as one Expand (2× the
  gram rows through the partial aggregate) — map-side combine still
  applies, and gram rows per doc are bounded by document length;
- contamination joins train shingles against the DISTINCT eval
  shingle set on the shingle string — an equi-join AQE will
  broadcast whenever the eval set is small (the normal case: eval
  benchmarks are MBs against a 100 TB train corpus).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tidb_cdc_spark.functions.sampling import hash_bucket

#: µ-unit scale for integral ratios.
PPM = 1_000_000


def _token_gram_rows(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(doc_id, _t, _g2, _g3) rows: lower-cased whitespace tokens
    with their forward 2- and 3-grams (null when the window runs off
    the document end — aggregates skip nulls)."""
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.lower(F.col(text_col)), r"\s+")).alias(
            "_pos", "_t"
        ),
    ).filter(F.col("_t") != "")
    w = Window.partitionBy("doc_id").orderBy("_pos")
    l1 = F.lead("_t", 1).over(w)
    l2 = F.lead("_t", 2).over(w)
    return tok.select(
        "doc_id",
        "_t",
        F.when(l1.isNotNull(), F.concat_ws(" ", F.col("_t"), l1)).alias("_g2"),
        F.when(l2.isNotNull(), F.concat_ws(" ", F.col("_t"), l1, l2)).alias(
            "_g3"
        ),
    )


def repetition_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document repetition/composition statistics (the
    MassiveText/Gopher filter inputs), one row per input document:

    - ``n_tokens``       — whitespace token count (lower-cased)
    - ``top_token_ppm``  — most-frequent-token share, µ-units
    - ``dup_2gram_ppm``  — 1 − distinct/total 2-grams, µ-units
    - ``dup_3gram_ppm``  — same for 3-grams
    - ``symbol_ppm``     — non-alphanumeric-non-space chars / chars

    Zero-token documents report all-zero stats (left join from the
    corpus, so no document vanishes).
    """
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.length(F.col(text_col)).alias("_nc"),
        F.length(
            F.regexp_replace(F.col(text_col), r"[A-Za-z0-9\s]", "")
        ).alias("_nsym"),
    )
    grams = _token_gram_rows(docs, id_col, text_col)
    tf = (
        grams.groupBy("doc_id", "_t")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy("doc_id")
        .agg(F.sum("_c").alias("_nt"), F.max("_c").alias("_top"))
    )
    ng = grams.groupBy("doc_id").agg(
        F.count("_g2").alias("_n2"),
        F.count_distinct("_g2").alias("_d2"),
        F.count("_g3").alias("_n3"),
        F.count_distinct("_g3").alias("_d3"),
    )
    return (
        base.join(tf, "doc_id", "left")
        .join(ng, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("_nt", F.lit(0)).alias("n_tokens"),
            F.expr(
                f"coalesce((_top * {PPM}L) div greatest(_nt, 1), 0)"
            ).alias("top_token_ppm"),
            F.expr(
                f"coalesce(((_n2 - _d2) * {PPM}L) div greatest(_n2, 1), 0)"
            ).alias("dup_2gram_ppm"),
            F.expr(
                f"coalesce(((_n3 - _d3) * {PPM}L) div greatest(_n3, 1), 0)"
            ).alias("dup_3gram_ppm"),
            F.expr(f"(_nsym * {PPM}L) div greatest(_nc, 1)").alias(
                "symbol_ppm"
            ),
        )
    )


@dataclass(frozen=True)
class QualityThresholds:
    """Keep-filter thresholds (µ-units where applicable). Defaults
    are tuned to split the synthetic corpus into both classes; a
    real pipeline tunes per corpus."""

    min_tokens: int = 20
    max_tokens: int = 100_000
    max_top_token_ppm: int = 200_000  # most-frequent token ≤ 20 %
    max_dup_2gram_ppm: int = 80_000  # repeated 2-grams ≤ 8 %
    max_symbol_ppm: int = 100_000  # symbols ≤ 10 % of chars


#: (reason code, failing predicate) in reporting order.
_REASONS = (
    ("too_short", lambda s, t: F.col("n_tokens") < t.min_tokens),
    ("too_long", lambda s, t: F.col("n_tokens") > t.max_tokens),
    ("top_token", lambda s, t: F.col("top_token_ppm") > t.max_top_token_ppm),
    ("dup_2gram", lambda s, t: F.col("dup_2gram_ppm") > t.max_dup_2gram_ppm),
    ("symbols", lambda s, t: F.col("symbol_ppm") > t.max_symbol_ppm),
)


def quality_filter(
    docs: DataFrame,
    thresholds: QualityThresholds = QualityThresholds(),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, <stats>, keep, fail_reasons): ``keep`` is true iff no
    threshold trips; ``fail_reasons`` is the comma-joined ordered
    reason codes ('' when kept) — the audit trail a curation run
    stores next to the filtered corpus."""
    stats = repetition_stats(docs, id_col, text_col)
    reasons = F.concat_ws(
        ",",
        *[
            F.when(pred(stats, thresholds), F.lit(code))
            for code, pred in _REASONS
        ],
    )
    return stats.withColumn("fail_reasons", reasons).withColumn(
        "keep", F.col("fail_reasons") == ""
    )


def positional_string_shingles(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
) -> DataFrame:
    """(doc_id, pos, _g) POSITIONAL string k-token shingles — dense
    0-based shingle index; n ≥ k tokens → n−k+1 rows, 0 < n < k →
    one all-token shingle at pos 0. The single home of the string-
    shingle convention (``shingle_string_rows`` is its DISTINCT
    projection; functions/winnow.py consumes the positional form).
    Codegen posexplode + window-lead shape."""
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.lower(F.col(text_col)), r"\s+")).alias(
            "_pos", "_t"
        ),
    ).filter(F.col("_t") != "")
    w = Window.partitionBy("doc_id").orderBy("_pos")
    leads = [F.lead("_t", j).over(w) for j in range(1, k)]
    # concat_ws skips nulls, so row 1 of a short doc yields exactly
    # the all-token shingle; full windows have every lead present
    keep = (leads[-1].isNotNull()) | (F.row_number().over(w) == 1)
    return (
        tok.select(
            "doc_id",
            (F.row_number().over(w) - 1).alias("pos"),
            F.concat_ws(" ", F.col("_t"), *leads).alias("_g"),
            keep.alias("_keep"),
        )
        .filter(F.col("_keep"))
        .select("doc_id", "pos", "_g")
    )


def shingle_string_rows(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
) -> DataFrame:
    """(doc_id, _g) DISTINCT string k-token shingles per document —
    the cross-engine shingle unit for contamination checks (hash
    shingles from ``text.shingle_hash_rows`` are xxhash64-specific;
    an overlap CONTRACT against an external eval set must be
    reproducible in whatever engine audits it)."""
    return (
        positional_string_shingles(docs, id_col, text_col, k)
        .select("doc_id", "_g")
        .distinct()
    )


def repeated_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_tokens: int = 12,
    min_docs: int = 2,
) -> DataFrame:
    """Cross-document repeated exact token spans — the
    substring-level dedup signal ("Deduplicating Training Data Makes
    Language Models Better", Lee et al. 2021 — public literature):
    exact spans repeated across documents drive memorization even
    when whole-document dedup passes (boilerplate, licenses, quoted
    chains). Suffix-array exactness does not distribute; the
    standard distributed approximation is fixed-length span
    fingerprints — every repeated substring of ≥ ``span_tokens``
    tokens contains a repeated ``span_tokens``-window, so recall is
    complete at that granularity.

    Output: ``(span, n_docs)`` for spans occurring in ≥ ``min_docs``
    DISTINCT documents (within-doc repetition is ``repetition_stats``'
    job). Scale: one codegen shingle pass (posexplode + window-lead,
    shuffle clustered on doc_id), then one map-side-combining groupBy
    on the span — shuffled rows are (span, partial count), and the
    ≥ min_docs filter runs post-aggregate where the data is already
    tiny. No joins, no driver-side state.
    """
    spans = shingle_string_rows(docs, id_col, text_col, k=span_tokens)
    return (
        spans.groupBy("_g")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select(F.col("_g").alias("span"), "n_docs")
    )


def span_dup_coverage(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_tokens: int = 12,
) -> DataFrame:
    """Per-document share of its spans that also occur in another
    document — the doc-level actionable form of ``repeated_spans``
    (curation drops/deboilerplates docs above a coverage threshold).

    Output: ``(doc_id, n_spans, shared_spans, shared_ppm)`` with the
    ratio integral in µ-units (cross-engine exact, module docstring).
    Scale: span rows → span-count aggregate → join back on the span
    string → per-doc aggregate. The join's build side is only the
    spans with n_docs ≥ 2 after aggregation... kept as the full count
    table here because the per-span count column is needed; both
    sides cluster on the span hash so it is one co-partitioned
    shuffle join, then the doc aggregate re-clusters on doc_id.
    """
    spans = shingle_string_rows(docs, id_col, text_col, k=span_tokens)
    counts = spans.groupBy("_g").agg(F.count(F.lit(1)).alias("_nd"))
    return (
        spans.join(counts, "_g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum((F.col("_nd") >= 2).cast("long")).alias("shared_spans"),
        )
        .select(
            "doc_id",
            "n_spans",
            "shared_spans",
            F.expr(f"(shared_spans * {PPM}L) div greatest(n_spans, 1)").alias(
                "shared_ppm"
            ),
        )
    )


def span_dedup_rewrite(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_tokens: int = 12,
) -> DataFrame:
    """THE Lee et al. 2022 deliverable ("Deduplicating Training Data
    Makes Language Models Better" — public literature):
    ``repeated_spans`` finds cross-document duplicated spans,
    ``span_dup_coverage`` measures them — this op REMOVES them,
    producing the cleaned corpus a training run actually consumes.

    Semantics (deterministic, oracle-exact): a position is
    dup-covered when any ``span_tokens``-window containing it occurs
    in ≥ 2 distinct documents AND this document is not that span's
    canonical keeper (the minimum doc_id containing it). Covered
    positions are dropped; the survivors re-join with single spaces,
    so the output is whitespace-normalized (the shingle pipeline's
    token space). A span is never removed from its own keeper ON ITS
    ACCOUNT — but a DIFFERENT overlapping span with an earlier
    keeper can still excise tokens inside it, so the contract is the
    position-coverage rule above, not per-span survival (for
    non-overlapping spans, exactly one copy survives corpus-wide).
    Within-doc repetition is untouched (``repetition_stats``' job).
    Docs shorter than ``span_tokens`` participate as their all-token
    shingle — an exact short-doc duplicate empties every copy but
    the keeper.

    Output: ``(doc_id, text_clean, n_tokens, n_removed)`` for EVERY
    input doc (fully-deduplicated docs surface with
    ``text_clean = ''``, never silently vanish).

    Scale (100 TB): NO doc-doc pair join anywhere — one groupBy on
    the md5 of the span (slim engine-reproducible 32-hex key, never
    the 12-token string) for (count ≥ 2, keeper), one join back onto
    the positional shingles clustered on the same key, one ids-only
    (doc, pos) flag join onto the token stream, and ONE per-doc
    aggregation clustered on doc_id producing n_tokens, the cleaned
    text, and the kept count together (collect_list skips the
    covered rows' null structs) — the corpus-sized token table
    crosses two exchanges total instead of the three a separate
    n_tokens aggregate + anti-join would cost. Viral boilerplate
    spans cost
    ONE stats row each (the aggregate is associative); the
    ×span_tokens coverage explode applies to dup occurrences only."""
    sh = positional_string_shingles(
        docs, id_col, text_col, k=span_tokens
    ).withColumn("_h", F.md5(F.col("_g")))
    stats = (
        sh.select("doc_id", "_h")
        .distinct()
        .groupBy("_h")
        .agg(
            F.count(F.lit(1)).alias("_nd"),
            F.min("doc_id").alias("_keeper"),
        )
        .filter(F.col("_nd") >= 2)
    )
    covered = (
        sh.join(stats, "_h")
        .filter(F.col("doc_id") != F.col("_keeper"))
        .select(
            "doc_id",
            F.explode(
                F.sequence(
                    F.col("pos"), F.col("pos") + F.lit(span_tokens - 1)
                )
            ).alias("p"),
        )
        .distinct()
    )
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), r"\s+")).alias("_pos", "tok"),
    ).filter(F.col("tok") != "")
    w = Window.partitionBy("doc_id").orderBy("_pos")
    tok = tok.select(
        "doc_id", (F.row_number().over(w) - 1).alias("p"), "tok"
    )
    flagged = tok.join(
        covered.withColumn("_cov", F.lit(True)), ["doc_id", "p"], "left"
    )
    agg = flagged.groupBy("doc_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    # collect_list drops nulls ⇒ covered rows vanish
                    F.collect_list(
                        F.when(
                            F.col("_cov").isNull(), F.struct("p", "tok")
                        )
                    )
                ),
                lambda s: s["tok"],
            ),
        ).alias("text_clean"),
        F.count(F.lit(1)).alias("_n_tokens"),
        F.sum(F.col("_cov").isNull().cast("long")).alias("_n_kept"),
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
            F.coalesce("_n_tokens", F.lit(0))
            .cast("long")
            .alias("n_tokens"),
            (
                F.coalesce("_n_tokens", F.lit(0))
                - F.coalesce("_n_kept", F.lit(0))
            )
            .cast("long")
            .alias("n_removed"),
        )
    )


def contamination_overlap(
    docs: DataFrame,
    eval_rate: float = 0.10,
    k: int = 8,
    salt: str = "eval",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Train/eval contamination: deterministically split the corpus
    (md5-bucket sample keyed on ``id_col`` — the same split any
    engine reproduces), then for every TRAIN document count how many
    of its distinct k-token shingles appear anywhere in the eval
    split. Output per train doc: (doc_id, n_shingles, n_hits,
    contaminated).

    The join is an equi-join on the shingle string against the
    DISTINCT eval shingle set; in the realistic regime (eval set ≪
    train corpus) AQE broadcasts the eval side and the check is a
    single scan of the train shingles.
    """
    thresh = int(eval_rate * 4294967296)
    tagged = docs.withColumn(
        "_is_eval", hash_bucket(F.col(id_col), salt) < F.lit(thresh)
    )
    sh = shingle_string_rows(tagged, id_col, text_col, k)
    flags = tagged.select(F.col(id_col).alias("doc_id"), "_is_eval")
    sh = sh.join(flags, "doc_id")
    eval_sh = sh.filter(F.col("_is_eval")).select("_g").distinct()
    train_sh = sh.filter(~F.col("_is_eval")).select("doc_id", "_g")
    hits = (
        train_sh.join(eval_sh.withColumn("_hit", F.lit(1)), "_g", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count("_hit").alias("n_hits"),
        )
    )
    train_docs = tagged.filter(~F.col("_is_eval")).select(
        F.col(id_col).alias("doc_id")
    )
    return (
        train_docs.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shingles", F.lit(0)).alias("n_shingles"),
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
        )
        .withColumn("contaminated", F.col("n_hits") > 0)
    )
