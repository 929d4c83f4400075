r"""Ninth wave: the end-to-end corpus-curation pipeline as ONE
Spark plan — quality filter → exact dedup → budget selection →
packing summary — the full pre-training data path condensed into a
single per-language audit row. This is the composition the
individual waves exist for: a user runs THIS to turn a raw crawl
into a training corpus and gets the per-stage attrition numbers a
data card needs.

Stage plan (every stage distributed, no driver-side loops):
1. quality stats + keep decision (functions/quality.py — token
   explode, two map-side-combining groupBys);
2. exact dedup among keepers by md5 content fingerprint (hash
   groupBy on the 128-bit key; min-id representative — shuffle is
   ~48 B/row regardless of document size);
3. budget selection: highest-quality (fewest-symbols) docs first
   until half the surviving tokens are spent (functions/
   selection.py two-level quality-banded prefix scan — no global
   single-task window);
4. packing summary: chunks = ceil(tokens/2048) per language
   (concatenation is contiguous, so the chunk count needs no
   per-doc spans).

Cross-engine: every stage is integral (counts, µ-unit quality,
md5 hex, truncating div), so the oracle twin reproduces the exact
bytes. The per-doc stage outcomes are folded into ONE groupBy(lang)
over left-joined survivor markers — 5 output rows.

Reference scope note: the reference engine (dollarkillerx/tidb-cdc,
cdc_manager.go) has no corpus surface; north-star pipeline op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tidb_cdc_spark.functions import quality as Q
from tidb_cdc_spark.functions import selection as SEL
from tidb_cdc_spark.queries.llm import _docs
from tidb_cdc_spark.session import materialize

_T = Q.QualityThresholds()
_PPM = SEL.PPM
_BUDGET = 2048


def corpus_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language curation funnel: input → quality-kept → unique →
    budget-selected doc counts, surviving tokens, packed chunk count."""
    docs = _docs(spark, sf_dir)
    qf = Q.quality_filter(docs).select("doc_id", "n_tokens", "symbol_ppm", "keep")
    # The stats subplan feeds four downstream consumers (spine, dedup,
    # selection, rollup) — materialize once instead of re-running the
    # token-explode pipeline per consumer.
    base = materialize(
        docs.select("doc_id", "lang", F.md5(F.col("text")).alias("_fp")).join(
            qf, "doc_id"
        )
    )
    kept = base.filter(F.col("keep"))
    reps = kept.groupBy("_fp").agg(F.min("doc_id").alias("doc_id"))
    uniq = kept.join(reps, "doc_id", "leftsemi").select(
        "doc_id",
        "lang",
        (F.lit(_PPM) - F.col("symbol_ppm")).alias("quality_ppm"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
    )
    chosen = (
        SEL.budget_head(uniq)
        .filter(F.col("selected"))
        .select("doc_id", F.lit(1).alias("_sel"))
    )
    uniq_ids = uniq.select("doc_id", F.lit(1).alias("_uniq"))
    funnel = base.join(uniq_ids, "doc_id", "left").join(chosen, "doc_id", "left")
    picked_tokens = F.sum(
        F.when(F.col("_sel").isNotNull(), F.col("n_tokens")).otherwise(0)
    ).cast("long")
    return (
        funnel.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_input"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0)).cast("long").alias(
                "n_quality_kept"
            ),
            F.sum(F.when(F.col("_uniq").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_unique"),
            F.sum(F.when(F.col("_sel").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_selected"),
            picked_tokens.alias("tokens_selected"),
        )
        .withColumn(
            "n_chunks",
            F.expr(f"(tokens_selected + {_BUDGET - 1}L) div {_BUDGET}L"),
        )
        .orderBy("lang")
    )


# The oracle replays the identical funnel: llm4's stats CTE (the SQL
# twin of functions/quality.repetition_stats), the same threshold
# predicate as QualityThresholds, md5 dedup, the selection window in
# (quality DESC, doc_id) order, and the ceil-div chunk count.
from tidb_cdc_spark.queries.llm4 import _STATS_CTE  # noqa: E402

_PIPELINE_SQL = (
    _STATS_CTE
    + f"""
, base AS (
  SELECT d.doc_id, d.lang, md5(d.text) AS fp, s.n_tokens, s.symbol_ppm,
         NOT (s.n_tokens < {_T.min_tokens}
              OR s.n_tokens > {_T.max_tokens}
              OR s.top_token_ppm > {_T.max_top_token_ppm}
              OR s.dup_2gram_ppm > {_T.max_dup_2gram_ppm}
              OR s.symbol_ppm > {_T.max_symbol_ppm}) AS keep
  FROM documents d JOIN stats s ON d.doc_id = s.doc_id
), uniq AS (
  SELECT MIN(doc_id) AS doc_id FROM base WHERE keep GROUP BY fp
), su AS (
  SELECT b.doc_id, b.lang, b.n_tokens, {_PPM} - b.symbol_ppm AS quality_ppm
  FROM base b JOIN uniq u ON b.doc_id = u.doc_id
), sel AS (
  SELECT doc_id,
         CAST(SUM(n_tokens) OVER (ORDER BY quality_ppm DESC, doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum,
         CAST(SUM(n_tokens) OVER () AS BIGINT) AS total
  FROM su
), chosen AS (
  SELECT doc_id FROM sel WHERE cum * 2 <= total
)
SELECT b.lang,
       COUNT(*) AS n_input,
       CAST(SUM(CASE WHEN b.keep THEN 1 ELSE 0 END) AS BIGINT)
         AS n_quality_kept,
       CAST(SUM(CASE WHEN u.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_unique,
       CAST(SUM(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_selected,
       CAST(SUM(CASE WHEN c.doc_id IS NOT NULL THEN b.n_tokens ELSE 0 END)
            AS BIGINT) AS tokens_selected,
       CAST((SUM(CASE WHEN c.doc_id IS NOT NULL THEN b.n_tokens ELSE 0 END)
             + {_BUDGET - 1}) // {_BUDGET} AS BIGINT) AS n_chunks
FROM base b
LEFT JOIN uniq u ON b.doc_id = u.doc_id
LEFT JOIN chosen c ON b.doc_id = c.doc_id
GROUP BY b.lang ORDER BY b.lang
"""
)


def rag_retrieve_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG retrieval end-to-end: query vectors → exact top-3 cosine
    neighbors (the ANN twin swaps in ``knn_lsh`` at scale, same join
    shape) → joined back to the document table for the passage
    payload (language, token count). One broadcast of the 3 query
    vectors + one id-equi-join against documents — no corpus text
    moves until a document is actually retrieved."""
    from tidb_cdc_spark.functions import similarity as S
    from tidb_cdc_spark.functions import text as T
    from tidb_cdc_spark.queries.llm import _embs

    e = _embs(spark, sf_dir)
    q = e.filter(F.col("vec_id") < 3)
    hits = S.knn_bruteforce(q, e, k=3).select("query_id", "neighbor_id", "rank")
    docs = _docs(spark, sf_dir).select(
        F.col("doc_id"),
        "lang",
        T.token_count(F.col("text")).alias("n_tokens"),
    )
    return (
        hits.join(docs, hits.neighbor_id == docs.doc_id)
        .select("query_id", "rank", "doc_id", "lang", "n_tokens")
        .orderBy("query_id", "rank")
    )


_RAG_SQL = r"""
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < 3
), c AS (
  SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
  FROM embeddings
), scored AS (
  SELECT query_id, neighbor_id,
         list_inner_product(qv, cv)
           / (sqrt(list_inner_product(qv, qv))
              * sqrt(list_inner_product(cv, cv))) AS score
  FROM q, c WHERE query_id <> neighbor_id
), ranked AS (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY score DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, rank, d.doc_id, d.lang,
       len(list_filter(string_split_regex(d.text, '\s+'),
           x -> x <> '')) AS n_tokens
FROM ranked JOIN documents d ON neighbor_id = d.doc_id
WHERE rank <= 3
ORDER BY query_id, rank
"""


def rag_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: dense (cosine) and lexical (distinct-token
    overlap — degenerate BM25 with no tf/idf weighting, chosen so the
    score is integer-exact across engines) rankings fused by
    Reciprocal Rank Fusion, score(d) = Σ_m 1/(60 + rank_m(d))
    (Cormack & Clarke's RRF, the public IR standard; k=60). RRF fuses
    RANKS, not raw scores, so the two modalities need no score
    calibration — which is also what makes it oracle-exact: ranks are
    ints, the fused score is the same two IEEE divisions + one add in
    both engines.

    Plan: the dense arm broadcasts the 3 query vectors over the
    corpus scan (no corpus shuffle — knn_bruteforce's shape). The
    lexical arm is an inverted-index join: corpus docs explode to
    distinct tokens, the QUERY token table (3 docs' worth) broadcasts
    onto it, overlap counts come from one map-side-combining groupBy
    on (query, doc). LEFT-join fusion keeps docs with zero lexical
    overlap in play on dense rank alone. At 100 TB both arms scan the
    corpus once each with only id/rank-sized shuffles; the dense arm
    swaps to the IVF/LSH index for large query sets (same fusion)."""
    from tidb_cdc_spark.functions import similarity as S
    from tidb_cdc_spark.functions import text as T
    from tidb_cdc_spark.operators import topk_per_group
    from tidb_cdc_spark.queries.llm import _embs

    from pyspark.sql import Window

    e = _embs(spark, sf_dir)
    q = e.filter(F.col("vec_id") < 3)
    # full-corpus ranking (k=None) from the SAME broadcast-cosine
    # operator the plain retrieval path uses — one shape to maintain
    dense = S.knn_bruteforce(q, e, k=None).select(
        "query_id",
        F.col("neighbor_id").alias("doc_id"),
        F.col("rank").alias("_vr"),
    )
    toks = _docs(spark, sf_dir).select(
        "doc_id",
        F.explode(F.array_distinct(T.tokens(F.col("text")))).alias("_tok"),
    )
    qtoks = toks.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"), "_tok"
    )
    lex = (
        toks.join(F.broadcast(qtoks), "_tok")
        .filter(F.col("doc_id") != F.col("query_id"))
        .groupBy("query_id", "doc_id")
        .agg(F.count(F.lit(1)).alias("_n_shared"))
        .withColumn(
            "_lr",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("_n_shared").desc(), F.col("doc_id")
                )
            ),
        )
        .select("query_id", "doc_id", "_lr")
    )
    fused = dense.join(lex, ["query_id", "doc_id"], "left").withColumn(
        "_rrf",
        1.0 / (60 + F.col("_vr"))
        + F.coalesce(1.0 / (60 + F.col("_lr")), F.lit(0.0)),
    )
    return (
        topk_per_group(
            fused,
            ["query_id"],
            [F.col("_rrf").desc(), F.col("doc_id")],
            5,
            rank_col="rank",
        )
        .select(
            "query_id",
            "rank",
            "doc_id",
            F.round("_rrf", 6).alias("rrf_score"),
        )
        .orderBy("query_id", "rank")
    )


_HYBRID_SQL = r"""
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < 3
), c AS (
  SELECT vec_id AS doc_id, CAST(embedding AS DOUBLE[]) AS cv
  FROM embeddings
), dense AS (
  SELECT query_id, doc_id,
         ROW_NUMBER() OVER (
           PARTITION BY query_id
           ORDER BY list_inner_product(qv, cv)
                      / (sqrt(list_inner_product(qv, qv))
                         * sqrt(list_inner_product(cv, cv))) DESC,
                    doc_id) AS vr
  FROM q, c WHERE query_id <> doc_id
), tok AS (
  SELECT doc_id,
         unnest(list_distinct(list_filter(
           string_split_regex(text, '\s+'), x -> x <> ''))) AS tok
  FROM documents
), qtok AS (
  SELECT doc_id AS query_id, tok FROM tok WHERE doc_id < 3
), lex AS (
  SELECT query_id, doc_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY COUNT(*) DESC, doc_id) AS lr
  FROM tok JOIN qtok USING (tok)
  WHERE tok.doc_id <> qtok.query_id
  GROUP BY query_id, doc_id
), fused AS (
  SELECT d.query_id, d.doc_id,
         1.0/(60 + d.vr) + COALESCE(1.0/(60 + l.lr), 0.0) AS rrf
  FROM dense d LEFT JOIN lex l
    ON d.query_id = l.query_id AND d.doc_id = l.doc_id
), ranked AS (
  SELECT query_id, doc_id, rrf,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY rrf DESC, doc_id) AS rank
  FROM fused
)
SELECT query_id, rank, doc_id, ROUND(rrf, 6) AS rrf_score
FROM ranked WHERE rank <= 5
ORDER BY query_id, rank
"""


def corpus_curation_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level provenance for the curation funnel — the "why did
    my document disappear" audit every production pipeline needs
    next to its data card: ONE row per input document naming the
    stage that dropped it and the evidence (the scorecard twin is
    ``corpus_curation_pipeline``; this is the same funnel with the
    per-doc outcomes kept instead of folded into counts):

    - ``dropped_quality`` + the ordered ``fail_reasons`` codes
      (functions/quality.py's audit-trail column);
    - ``dropped_duplicate`` + the representative doc id it lost to
      (the min-id keeper of its md5 class — actionable: that IS the
      copy that survived);
    - ``dropped_budget`` (kept, unique, but below the quality-ranked
      token-budget cut);
    - ``selected``.

    Scale shape: identical to the scorecard funnel — the explode
    stays inside two combining groupBys, dedup shuffles 16 B
    fingerprints, selection is the banded prefix scan (no global
    single-task window), and the provenance join fans ids only. The
    output is corpus-sized BY DESIGN (one row per doc — it is the
    audit artifact a run writes next to the corpus), so at 100 TB
    it is a write-to-parquet job, not a collect."""
    docs = _docs(spark, sf_dir)
    qf = Q.quality_filter(docs).select(
        "doc_id", "n_tokens", "symbol_ppm", "keep", "fail_reasons"
    )
    base = materialize(
        docs.select("doc_id", "lang", F.md5(F.col("text")).alias("_fp")).join(
            qf, "doc_id"
        )
    )
    kept = base.filter(F.col("keep"))
    reps = kept.groupBy("_fp").agg(F.min("doc_id").alias("_rep"))
    rep_map = kept.join(reps, "_fp").select("doc_id", "_rep")
    survivors = (
        base.join(rep_map.filter(F.col("doc_id") == F.col("_rep")), "doc_id")
        .select(
            "doc_id",
            (F.lit(_PPM) - F.col("symbol_ppm")).alias("quality_ppm"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
        )
    )
    sel = SEL.budget_head(survivors).select("doc_id", "selected")
    out = (
        base.join(rep_map.select("doc_id", "_rep"), "doc_id", "left")
        .join(sel, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.when(~F.col("keep"), F.lit("dropped_quality"))
            .when(F.col("_rep") != F.col("doc_id"), F.lit("dropped_duplicate"))
            .when(F.col("selected"), F.lit("selected"))
            .otherwise(F.lit("dropped_budget"))
            .alias("outcome"),
            F.when(~F.col("keep"), F.col("fail_reasons"))
            .when(
                F.col("_rep") != F.col("doc_id"),
                F.col("_rep").cast("string"),
            )
            .otherwise(F.lit(""))
            .alias("detail"),
        )
        .orderBy("doc_id")
    )
    return out


# the oracle replays the identical funnel row-wise: the same stats
# CTE, the same ordered fail-reason codes (concat_ws skips NULLs in
# both engines), md5 min-id dedup with the lost-to id surfaced, and
# the same inclusive-cumsum half-token budget cut
_PROVENANCE_SQL = (
    _STATS_CTE
    + f"""
, base AS (
  SELECT d.doc_id, d.lang, md5(d.text) AS fp, s.n_tokens, s.symbol_ppm,
         concat_ws(',',
           CASE WHEN s.n_tokens < {_T.min_tokens} THEN 'too_short' END,
           CASE WHEN s.n_tokens > {_T.max_tokens} THEN 'too_long' END,
           CASE WHEN s.top_token_ppm > {_T.max_top_token_ppm}
                THEN 'top_token' END,
           CASE WHEN s.dup_2gram_ppm > {_T.max_dup_2gram_ppm}
                THEN 'dup_2gram' END,
           CASE WHEN s.symbol_ppm > {_T.max_symbol_ppm} THEN 'symbols' END
         ) AS fail_reasons
  FROM documents d JOIN stats s ON d.doc_id = s.doc_id
), rep AS (
  SELECT b.doc_id, MIN(b2.doc_id) AS rep
  FROM base b JOIN base b2 ON b.fp = b2.fp
  WHERE b.fail_reasons = '' AND b2.fail_reasons = ''
  GROUP BY b.doc_id
), sel AS (
  SELECT doc_id, selected FROM (
    SELECT b.doc_id,
           CAST(SUM(b.n_tokens) OVER (
                ORDER BY {_PPM} - b.symbol_ppm DESC, b.doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) * 2
             <= CAST(SUM(b.n_tokens) OVER () AS BIGINT) AS selected
    FROM base b JOIN rep r ON b.doc_id = r.doc_id AND b.doc_id = r.rep
  )
)
SELECT b.doc_id, b.lang, CAST(b.n_tokens AS BIGINT) AS n_tokens,
       CASE WHEN b.fail_reasons <> '' THEN 'dropped_quality'
            WHEN r.rep <> b.doc_id THEN 'dropped_duplicate'
            WHEN s.selected THEN 'selected'
            ELSE 'dropped_budget' END AS outcome,
       CASE WHEN b.fail_reasons <> '' THEN b.fail_reasons
            WHEN r.rep <> b.doc_id THEN CAST(r.rep AS VARCHAR)
            ELSE '' END AS detail
FROM base b
LEFT JOIN rep r ON b.doc_id = r.doc_id
LEFT JOIN sel s ON b.doc_id = s.doc_id
ORDER BY b.doc_id
"""
)


QUERIES = {
    "corpus_curation_pipeline": corpus_curation_pipeline,
    "corpus_curation_provenance": corpus_curation_provenance,
    "rag_retrieve_topk": rag_retrieve_topk,
    "rag_hybrid_rrf": rag_hybrid_rrf,
}

ORACLE = {
    "corpus_curation_pipeline": _PIPELINE_SQL,
    "corpus_curation_provenance": _PROVENANCE_SQL,
    "rag_retrieve_topk": _RAG_SQL,
    "rag_hybrid_rrf": _HYBRID_SQL,
}
