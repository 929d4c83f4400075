"""LLM-data-pipeline query surface (north-star ops, BASELINE.json):
dedup, text analysis, language ID, fingerprinting, similarity
search. SQL-expressible ones carry DuckDB oracles; the LSH-bucketed
variants are declared without oracles (driver records rows-only) and
are exact-verified against their brute-force twins in tests/.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tidb_cdc_spark.functions import dedup as D
from tidb_cdc_spark.functions import similarity as S
from tidb_cdc_spark.functions import text as T

_STOP_EN = T.STOPWORDS["en"]


def _fan_out(df: DataFrame) -> DataFrame:
    """The testdata tables are single small parquet files → 1 input
    split → 1-core execution locally. Fan out before the CPU-heavy
    per-row work (hashing/signatures); the tiny shuffle is repaid
    32×. At 100 TB the source has thousands of splits and the same
    repartition is either a no-op cost-wise or a deliberate skew fix."""
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fanned out BY doc_id: the shingle pipeline's window/groupBy
    cluster on the id, so hash-partitioning here means the whole
    explode→lead→aggregate chain runs with zero further shuffles."""
    from tidb_cdc_spark.session import fan_out_by

    return fan_out_by(
        spark.read.parquet(f"{sf_dir}/documents.parquet"), spark, "doc_id"
    )


def _embs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embeddings are tiny at test SF (thousands of rows) — cap the
    fan-out so the Arrow-batched UDF stages don't orchestrate 32
    near-empty Python round-trips; at real scale the source has
    enough splits that this repartition is moot."""
    n = min(8, spark.sparkContext.defaultParallelism)
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").repartition(n)


# ------------------------------------------------------ exact dedup
def dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by normalized-text fingerprint; hash-groupBy on a
    64-bit key (16 B/row shuffle regardless of doc size)."""
    return D.exact_dedup(_docs(spark, sf_dir)).orderBy("doc_id")


_DEDUP_EXACT_SQL = """
SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_dups
FROM documents
GROUP BY trim(lower(regexp_replace(text, '\\s+', ' ', 'g')))
ORDER BY doc_id
"""


def dedup_exact_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dup clusters with QUALITY-AWARE representative choice:
    within each identical-text group keep the copy from the
    preferred (lexicographically smallest) source, ties → lowest
    doc_id — the canonical-copy selection every crawl pipeline does
    (prefer the cleaner mirror, not an arbitrary row). Emits only
    real dup clusters (n_dups > 1).

    Plan: TWO-STAGE aggregate. Stage 1 groups by (fingerprint,
    source) with plain min/count — fixed-width buffers, pure
    whole-stage-codegen HashAggregate with map-side combine, and it
    does ALL the data-sized reduction (shuffle ∝ distinct
    (fp, source), ~30 B/row). Stage 2 reduces those tiny rows per
    fingerprint with ``min(struct(source, doc_id))`` — struct
    buffers force a SortAggregate, which is why it runs on the
    REDUCED rows, never the corpus (a single-stage
    ``min_by(x, struct(...))`` would sort-aggregate 100 TB; the
    count(distinct source) rewrite would add an expand on top).
    n_sources falls out of stage 2 as a plain count.
    """
    d = _docs(spark, sf_dir)
    per_source = (
        d.withColumn("_fp", D.fingerprint(F.col("text")))
        .groupBy("_fp", "source")
        .agg(
            F.min("doc_id").alias("_min_id"),
            F.count(F.lit(1)).alias("_n"),
        )
    )
    # NULL-source handling pinned to match ANSI/DuckDB: an explicit
    # leading null flag makes null sources sort LAST (Spark's struct
    # min would otherwise sort the null field FIRST and elect a
    # null-provenance copy), and n_sources counts non-null sources
    # only (= COUNT(DISTINCT source) semantics, which ignores NULL).
    return (
        per_source.groupBy("_fp")
        .agg(
            F.min(
                F.struct(
                    F.col("source").isNull().alias("_null_last"),
                    F.col("source").alias("source"),
                    F.col("_min_id").alias("_min_id"),
                )
            ).alias("_k"),
            F.sum("_n").alias("n_dups"),
            F.count("source").alias("n_sources"),
        )
        .filter(F.col("n_dups") > 1)
        .select(
            F.col("_k._min_id").alias("kept_doc_id"),
            F.col("_k.source").alias("kept_source"),
            "n_dups",
            "n_sources",
        )
        .orderBy("kept_doc_id")
    )


_KEEP_BEST_SQL = """
WITH g AS (
  SELECT trim(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS fp,
         doc_id, source
  FROM documents
), r AS (
  SELECT fp, doc_id, source,
         row_number() OVER (PARTITION BY fp
                            ORDER BY (source IS NULL), source, doc_id) AS rn
  FROM g
), s AS (
  SELECT fp, COUNT(*) AS n_dups, COUNT(DISTINCT source) AS n_sources
  FROM g GROUP BY fp
)
SELECT r.doc_id AS kept_doc_id, r.source AS kept_source,
       s.n_dups, s.n_sources
FROM r JOIN s USING (fp)
WHERE r.rn = 1 AND s.n_dups > 1
ORDER BY kept_doc_id
"""


# ------------------------------------------------------- text stats
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token/char statistics — pure codegen scan."""
    d = _docs(spark, sf_dir)
    toks = T.tokens(F.col("text"))
    return d.select(
        "doc_id",
        T.token_count(F.col("text")).alias("n_tokens"),
        F.length("text").alias("n_chars_obs"),
        F.length(F.regexp_replace("text", r"[^A-Za-z]", "")).alias("n_alpha"),
        F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
    ).orderBy("doc_id")


_TOKEN_STATS_SQL = """
SELECT doc_id,
       len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS n_tokens,
       length(text) AS n_chars_obs,
       length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
       len(list_distinct(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))) AS n_unique_tokens
FROM documents
ORDER BY doc_id
"""


# ------------------------------------------- quality rollup per lang
def text_quality_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus quality profile per labeled language: doc counts, token
    sums (exact), mean stopword ratio.

    Cross-engine stability: the per-doc ratio is kept INTEGRAL —
    ``(hits * 1e6) div tokens`` as BIGINT (integer division is
    bit-identical in every engine), summed exactly, with ONE final
    double division. Round-tripping each ratio through double →
    decimal(12,6) (the r1 approach) diverged between Spark (half-up)
    and DuckDB (half-even) at the 6th decimal."""
    d = _docs(spark, sf_dir)
    toks = T.tokens(F.lower(F.col("text")))
    hits = F.size(F.filter(toks, lambda t: t.isin(*_STOP_EN)))
    scored = d.select(
        "lang",
        T.token_count(F.col("text")).alias("nt"),
        hits.alias("hits"),
    ).withColumn("swr_u", F.expr("(hits * 1000000L) div greatest(nt, 1)"))
    return (
        scored.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nt").alias("total_tokens"),
            (
                F.sum("swr_u").cast("double")
                / (F.lit(1000000.0) * F.count(F.lit(1)).cast("double"))
            ).alias("avg_stopword_ratio"),
        )
        .orderBy("lang")
    )


_QUALITY_SQL = f"""
WITH scored AS (
  SELECT lang,
         len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS nt,
         len(list_filter(string_split_regex(lower(text), '\\s+'),
             x -> x IN ({", ".join("'" + w + "'" for w in _STOP_EN)}))) AS hits
  FROM documents
)
SELECT lang, COUNT(*) AS n_docs, CAST(SUM(nt) AS BIGINT) AS total_tokens,
       CAST(SUM((hits * 1000000) // GREATEST(nt, 1)) AS DOUBLE)
         / (1000000.0 * COUNT(*)) AS avg_stopword_ratio
FROM scored GROUP BY lang ORDER BY lang
"""


# ------------------------------------------------------ language id
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic stopword-vote language ID per document."""
    d = _docs(spark, sf_dir)
    return d.select("doc_id", T.lang_id(F.col("text")).alias("pred_lang")).orderBy(
        "doc_id"
    )


def _lang_hits_sql(lang: str) -> str:
    words = ", ".join("'" + w + "'" for w in T.STOPWORDS[lang])
    return (
        f"len(list_filter(string_split_regex(lower(text), '\\s+'),"
        f" x -> x IN ({words})))"
    )


_LANG_ID_SQL = f"""
WITH hits AS (
  SELECT doc_id,
         {_lang_hits_sql("en")} AS h_en,
         {_lang_hits_sql("es")} AS h_es,
         {_lang_hits_sql("de")} AS h_de,
         {_lang_hits_sql("fr")} AS h_fr
  FROM documents
)
SELECT doc_id,
       CASE WHEN GREATEST(h_en, h_es, h_de, h_fr) = 0 THEN 'und'
            WHEN h_en = GREATEST(h_en, h_es, h_de, h_fr) THEN 'en'
            WHEN h_es = GREATEST(h_en, h_es, h_de, h_fr) THEN 'es'
            WHEN h_de = GREATEST(h_en, h_es, h_de, h_fr) THEN 'de'
            ELSE 'fr' END AS pred_lang
FROM hits ORDER BY doc_id
"""


# ---------------------------------------------------- fingerprints
def text_fingerprint_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-engine-checkable document fingerprint (md5 of the
    normalized text; the engine's native path uses xxhash64)."""
    d = _docs(spark, sf_dir)
    norm = F.trim(F.lower(F.regexp_replace(F.col("text"), r"\s+", " ")))
    return d.select("doc_id", F.md5(norm).alias("fp")).orderBy("doc_id")


_FP_SQL = """
SELECT doc_id, md5(trim(lower(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
FROM documents ORDER BY doc_id
"""


# ------------------------------------------------------- similarity
def knn_bruteforce_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 cosine neighbors for query vectors vec_id < 5.
    Broadcast the queries; corpus scan stays unshuffled."""
    e = _embs(spark, sf_dir)
    q = e.filter(F.col("vec_id") < 5)
    out = S.knn_bruteforce(q, e, k=5)
    return out.orderBy("query_id", "rank")


_KNN_SQL = """
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < 5
), c AS (
  SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
  FROM embeddings
), scored AS (
  SELECT query_id, neighbor_id,
         list_inner_product(qv, cv)
           / (sqrt(list_inner_product(qv, qv)) * sqrt(list_inner_product(cv, cv))) AS score
  FROM q, c WHERE query_id <> neighbor_id
), ranked AS (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank FROM ranked WHERE rank <= 5
ORDER BY query_id, rank
"""


# ------------------------- LSH / fuzzy (no SQL oracle — rows-only;
# exact-verified against brute force in tests/)
def knn_lsh_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-5 via random-hyperplane LSH (the 100 TB path)."""
    e = _embs(spark, sf_dir)
    q = e.filter(F.col("vec_id") < 5)
    return S.knn_lsh(q, e, k=5, dim=64).orderBy("query_id", "rank")


def knn_ivf_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-5 via IVF coarse quantization (k-means cells +
    n_probe search) — the partition-pruning ANN scale path."""
    e = _embs(spark, sf_dir)
    q = e.filter(F.col("vec_id") < 5)
    return S.knn_ivf(q, e, k=5).orderBy("query_id", "rank")


def ann_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN retrieval contract, oracle-gated. The synthetic embeddings
    are mutually near-orthogonal (recall on them is meaningless —
    LSH's contract is recall on ACTUALLY-near neighbors, tested on
    clustered data in tests/), so the gated audit PLANTS a true
    neighbor per query — a ×1.001-scaled copy at vec_id+10⁶, which
    preserves cosine (=1) AND every hyperplane signature bit — and
    verifies LSH retrieves it at rank 1. Deterministic by algorithm
    structure: identical signatures ⇒ same buckets ⇒ the copy is a
    candidate, and cosine 1 reranks first. A bucketing or rerank
    regression flips the boolean and fails the hash."""
    e = _embs(spark, sf_dir)
    q = e.filter(F.col("vec_id") < 5)
    planted = q.select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform(F.col("embedding"), lambda x: x * F.lit(1.001)).alias(
            "embedding"
        ),
        *[c for c in e.columns if c not in ("vec_id", "embedding")],
    )
    corpus = e.unionByName(planted.select(*e.columns))
    approx = S.knn_lsh(q, corpus, k=5, dim=64)
    found = (
        approx.filter(F.col("neighbor_id") == F.col("query_id") + 1000000)
        .groupBy("query_id")
        .agg(F.min("rank").alias("_rk"))
    )
    return (
        q.select(F.col("vec_id").alias("query_id"))
        .join(found, "query_id", "left")
        .select(
            "query_id",
            F.col("_rk").isNotNull().alias("planted_found"),
            (F.coalesce(F.col("_rk"), F.lit(99)) == 1).alias("planted_rank1"),
        )
        .orderBy("query_id")
    )


_ANN_RECALL_SQL = """
SELECT vec_id AS query_id, TRUE AS planted_found, TRUE AS planted_rank1
FROM embeddings WHERE vec_id < 5 ORDER BY query_id
"""


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded MinHash-LSH candidate near-dup pairs on documents."""
    return D.minhash_lsh_pairs(_docs(spark, sf_dir)).orderBy("id_a", "id_b")


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash Hamming≤3 near-dup pairs on documents."""
    return D.simhash_pairs(_docs(spark, sf_dir)).orderBy("id_a", "id_b")


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard ≥ 0.8 pairs (inverted-index join)."""
    return D.ngram_jaccard_pairs(_docs(spark, sf_dir), min_jaccard=0.8).orderBy(
        "id_a", "id_b"
    )


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs (cosine ≥ 0.95, LSH-bucketed).

    The synthetic embeddings are mutually near-orthogonal (max
    pairwise cosine ≈ 0.51), so the operator is demonstrated on
    planted duplicates: scaled copies (id + 1e6) of the first 50
    vectors. Scaling preserves cosine exactly AND the hyperplane
    signature (sign of every dot product unchanged), so the expected
    result is deterministically the 50 planted pairs — an in-query
    self-check of both bucketing recall and the verify threshold."""
    e = _embs(spark, sf_dir).select("vec_id", "embedding")
    planted = e.filter(F.col("vec_id") < 50).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform(F.col("embedding"), lambda x: x * F.lit(1.001)).alias(
            "embedding"
        ),
    )
    return D.embedding_near_dup_pairs(e.unionByName(planted)).orderBy(
        "id_a", "id_b"
    )


QUERIES = {
    "dedup_exact_docs": dedup_exact_docs,
    "dedup_exact_keep_best": dedup_exact_keep_best,
    "text_token_stats": text_token_stats,
    "text_quality_by_lang": text_quality_by_lang,
    "text_lang_id": text_lang_id,
    "text_fingerprint_md5": text_fingerprint_md5,
    "knn_bruteforce_cosine": knn_bruteforce_cosine,
    "knn_lsh_cosine": knn_lsh_cosine,
    "knn_ivf_cosine": knn_ivf_cosine,
    "ann_recall_audit": ann_recall_audit,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_simhash": dedup_simhash,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_embedding_cosine": dedup_embedding_cosine,
}

ORACLE = {
    "dedup_exact_docs": _DEDUP_EXACT_SQL,
    "dedup_exact_keep_best": _KEEP_BEST_SQL,
    "text_token_stats": _TOKEN_STATS_SQL,
    "text_quality_by_lang": _QUALITY_SQL,
    "text_lang_id": _LANG_ID_SQL,
    "text_fingerprint_md5": _FP_SQL,
    "knn_bruteforce_cosine": _KNN_SQL,
    "ann_recall_audit": _ANN_RECALL_SQL,
}
