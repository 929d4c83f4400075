r"""Seventh wave: tokenizer-vocabulary induction (top-K frequency
table with coverage curve), cross-source exact-overlap matrix,
corpus length-band audit, and symmetric int8 embedding quantization
(functions/vocab.py, functions/quantize.py).

Cross-engine notes: ranks/counts are integral; coverage/overlap are
ppm BIGINT via truncating integer division (Spark ``div`` == DuckDB
``//`` — both truncate toward zero, verified incl. negatives);
quantization is fixed-point (floor(x·2^20) BIGINT) so float inputs
hash bit-exactly; percentile bounds rely on Spark ``percentile`` ==
DuckDB ``quantile_cont`` (same p·(n−1) convention, verified round 1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tidb_cdc_spark.functions import quantize as QZ
from tidb_cdc_spark.functions import text as T
from tidb_cdc_spark.functions import vocab as V
from tidb_cdc_spark.queries.llm import _docs, _embs

_K = 100

_TOK_CTE = r"""
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '\s+'),
                x -> x <> '')) AS token
  FROM documents
)
"""


def vocab_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 vocabulary candidates with rank and cumulative
    corpus-coverage ppm (the tokenizer coverage curve)."""
    return V.top_terms(_docs(spark, sf_dir), k=_K).orderBy("rank")


_VOCAB_SQL = (
    _TOK_CTE
    + f"""
, tf AS (
  SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token
), total AS (
  SELECT CAST(SUM(cnt) AS BIGINT) AS t FROM tf
), top AS (
  SELECT token, cnt FROM tf ORDER BY cnt DESC, token LIMIT {_K}
), ranked AS (
  SELECT token, cnt,
         ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS rank,
         CAST(SUM(cnt) OVER (ORDER BY cnt DESC, token
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS cum_cnt
  FROM top
)
SELECT token, cnt, CAST(rank AS BIGINT) AS rank, cum_cnt,
       (1000000 * cum_cnt) // (SELECT t FROM total) AS coverage_ppm
FROM ranked ORDER BY rank
"""
)


def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source overlap matrix on 100-char head fingerprints:
    distinct shared fingerprints per source pair, with containment
    ppm vs the smaller side."""
    return V.source_overlap(_docs(spark, sf_dir)).orderBy(
        "source_a", "source_b"
    )


_OVERLAP_SQL = """
WITH fs AS (
  SELECT DISTINCT md5(substr(text, 1, 100)) AS fp, source FROM documents
), per AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS total_fps
  FROM fs GROUP BY source
), pairs AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CAST(COUNT(*) AS BIGINT) AS shared_fps
  FROM fs a JOIN fs b USING (fp)
  WHERE a.source < b.source
  GROUP BY a.source, b.source
)
SELECT source_a, source_b, shared_fps,
       pa.total_fps AS a_total_fps, pb.total_fps AS b_total_fps,
       (1000000 * shared_fps) // LEAST(pa.total_fps, pb.total_fps)
         AS overlap_ppm
FROM pairs
JOIN per pa ON pairs.source_a = pa.source
JOIN per pb ON pairs.source_b = pb.source
ORDER BY source_a, source_b
"""


def doc_length_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source audit of the corpus-level [p05, p95] token-length
    band filter (kept / dropped_short / dropped_long + bounds)."""
    d = _docs(spark, sf_dir).select(
        "source", T.token_count(F.col("text")).alias("n_tokens")
    )
    return V.length_quantile_bounds(d).orderBy("source")


_BAND_SQL = r"""
WITH tok AS (
  SELECT source,
         len(list_filter(string_split_regex(text, '\s+'),
             x -> x <> '')) AS n_tokens
  FROM documents
), b AS (
  SELECT quantile_cont(n_tokens, 0.05) AS lo_bound,
         quantile_cont(n_tokens, 0.95) AS hi_bound
  FROM tok
)
SELECT source,
       CAST(SUM(CASE WHEN n_tokens >= lo_bound AND n_tokens <= hi_bound
                THEN 1 ELSE 0 END) AS BIGINT) AS kept,
       CAST(SUM(CASE WHEN n_tokens < lo_bound THEN 1 ELSE 0 END)
            AS BIGINT) AS dropped_short,
       CAST(SUM(CASE WHEN n_tokens > hi_bound THEN 1 ELSE 0 END)
            AS BIGINT) AS dropped_long,
       ANY_VALUE(lo_bound) AS lo_bound,
       ANY_VALUE(hi_bound) AS hi_bound
FROM tok, b GROUP BY source ORDER BY source
"""


def embedding_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector symmetric int8 quantization audit: fixed-point
    scale, surviving components, quantized checksum, L1 residue."""
    return QZ.int8_quantize_stats(_embs(spark, sf_dir)).orderBy("vec_id")


_QUANT_SQL = f"""
WITH comp AS (
  SELECT vec_id, label, i - 1 AS pos,
         CAST(floor(CAST(embedding[i] AS DOUBLE) * {QZ.SCALE})
              AS BIGINT) AS q
  FROM embeddings, range(1, 65) t(i)
), m AS (
  SELECT *, MAX(ABS(q)) OVER (PARTITION BY vec_id) AS maxabs_q
  FROM comp
), qi AS (
  SELECT *, CASE WHEN maxabs_q = 0 THEN 0
                 ELSE (q * 127) // maxabs_q END AS iq
  FROM m
)
SELECT vec_id, label,
       CAST(MAX(maxabs_q) AS BIGINT) AS maxabs_q,
       CAST(SUM(CASE WHEN iq <> 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS nonzero,
       CAST(SUM(iq * (pos + 1)) AS BIGINT) AS iq_checksum,
       CAST(SUM(ABS(q * 127 - iq * maxabs_q)) AS BIGINT) AS err_l1
FROM qi GROUP BY vec_id, label ORDER BY vec_id
"""


QUERIES = {
    "vocab_top_terms": vocab_top_terms,
    "source_overlap_matrix": source_overlap_matrix,
    "doc_length_band": doc_length_band,
    "embedding_int8_quantize": embedding_int8_quantize,
}

ORACLE = {
    "vocab_top_terms": _VOCAB_SQL,
    "source_overlap_matrix": _OVERLAP_SQL,
    "doc_length_band": _BAND_SQL,
    "embedding_int8_quantize": _QUANT_SQL,
}
