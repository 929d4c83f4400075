"""Sixth wave: corpus mixing and batch-layout economics — the
per-source sampling plan toward a uniform token mixture, the
padding-vs-packing cost comparison at the training budget, and the
token-length histogram (functions/mixing.py).

Cross-engine notes: every ratio is ppm BIGINT via truncating integer
division; the histogram bucket is the binary digit count
(``length(bin(n))``) — exact integer floor-log2 in both engines; all
DuckDB aggregate sums are CAST to BIGINT so dtypes match Spark's
longs bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from tidb_cdc_spark.functions import mixing as MX
from tidb_cdc_spark.functions import text as T
from tidb_cdc_spark.queries.llm import _docs

from pyspark.sql import functions as F

_BUDGET = 2048

_TOK_CTE = r"""
WITH tok AS (
  SELECT doc_id, source,
         len(list_filter(string_split_regex(text, '\s+'),
             x -> x <> '')) AS n_tokens
  FROM documents
)
"""


def _doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _docs(spark, sf_dir).select(
        "doc_id", "source", T.token_count(F.col("text")).alias("n_tokens")
    )


def corpus_mix_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform-target mixing plan: per source, the natural token
    share, required over/under-sampling factor, capped sample rate
    and repetition (epoch) count."""
    return MX.source_mix_plan(_doc_tokens(spark, sf_dir)).orderBy("source")


_MIX_SQL = (
    _TOK_CTE
    + """
, s AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
  FROM tok GROUP BY source
), t AS (
  SELECT *, CAST(SUM(n_tokens) OVER () AS BIGINT) AS total,
         COUNT(*) OVER () AS k
  FROM s
)
SELECT source, n_docs, n_tokens,
       (1000000 * n_tokens) // total AS natural_ppm,
       total // k AS target_tokens,
       (1000000 * (total // k)) // GREATEST(n_tokens, 1) AS need_ppm,
       CAST(LEAST((1000000 * (total // k)) // GREATEST(n_tokens, 1),
                  1000000) AS BIGINT) AS sample_rate_ppm,
       ((1000000 * (total // k)) // GREATEST(n_tokens, 1) + 999999)
         // 1000000 AS repeat_epochs
FROM t ORDER BY source
"""
)


def batch_padding_waste(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-length batching cost at the 2048-token budget, per
    source, vs the concat-and-chunk packer's chunk count."""
    return MX.padding_waste_stats(_doc_tokens(spark, sf_dir), _BUDGET).orderBy(
        "source"
    )


_PAD_SQL = (
    _TOK_CTE
    + f"""
, per AS (
  SELECT source, n_tokens,
         CASE WHEN n_tokens > 0
              THEN (n_tokens + {_BUDGET - 1}) // {_BUDGET}
              ELSE 0 END AS chunks
  FROM tok
), s AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
         CAST(SUM(chunks) AS BIGINT) AS padded_chunks,
         CAST(SUM(chunks) * {_BUDGET} AS BIGINT) AS padded_tokens
  FROM per GROUP BY source
)
SELECT source, n_docs, n_tokens, padded_chunks, padded_tokens,
       (1000000 * (padded_tokens - n_tokens))
         // GREATEST(padded_tokens, 1) AS waste_ppm,
       (n_tokens + {_BUDGET - 1}) // {_BUDGET} AS packed_chunks,
       padded_chunks - ((n_tokens + {_BUDGET - 1}) // {_BUDGET})
         AS chunks_saved
FROM s ORDER BY source
"""
)


def token_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-of-two token-length histogram (bucket = binary digit
    count of the token count; bucket 0 = empty docs)."""
    return MX.token_length_histogram(_doc_tokens(spark, sf_dir)).orderBy(
        "bucket"
    )


_HIST_SQL = (
    _TOK_CTE
    + """
SELECT CASE WHEN n_tokens > 0
            THEN CAST(length(bin(n_tokens)) AS BIGINT)
            ELSE 0 END AS bucket,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       CAST(MIN(n_tokens) AS BIGINT) AS min_tokens,
       CAST(MAX(n_tokens) AS BIGINT) AS max_tokens
FROM tok GROUP BY 1 ORDER BY bucket
"""
)


def corpus_mix_t2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Square-root (T=2) temperature mixing plan — per source the
    exact-integer √-weighted target and sampling factors."""
    return MX.temperature_mix_plan(_doc_tokens(spark, sf_dir)).orderBy(
        "source"
    )


# exact isqrt: float floor(sqrt()) candidate + one integral fix-up
_ISQRT = (
    "CASE WHEN (c + 1) * (c + 1) <= n_tokens THEN c + 1 "
    "WHEN c * c > n_tokens THEN c - 1 ELSE c END"
)

_MIX_T2_SQL = (
    _TOK_CTE
    + f"""
, s AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
  FROM tok GROUP BY source
), c0 AS (
  SELECT *, CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS c
  FROM s
), t AS (
  SELECT source, n_docs, n_tokens, {_ISQRT} AS t2_weight,
         CAST(SUM(n_tokens) OVER () AS BIGINT) AS total
  FROM c0
), u AS (
  SELECT *, CAST(SUM(t2_weight) OVER () AS BIGINT) AS wsum,
         (total * t2_weight) // GREATEST(wsum, 1) AS target
  FROM t
)
SELECT source, n_docs, n_tokens,
       (1000000 * n_tokens) // total AS natural_ppm,
       t2_weight,
       (1000000 * t2_weight) // GREATEST(wsum, 1) AS t2_target_ppm,
       target AS target_tokens,
       (1000000 * target) // GREATEST(n_tokens, 1) AS need_ppm,
       CAST(LEAST((1000000 * target) // GREATEST(n_tokens, 1), 1000000)
            AS BIGINT) AS sample_rate_ppm,
       ((1000000 * target) // GREATEST(n_tokens, 1) + 999999)
         // 1000000 AS repeat_epochs
FROM u ORDER BY source
"""
)


QUERIES = {
    "corpus_mix_plan": corpus_mix_plan,
    "corpus_mix_t2": corpus_mix_t2,
    "batch_padding_waste": batch_padding_waste,
    "token_length_histogram": token_length_histogram,
}

ORACLE = {
    "corpus_mix_plan": _MIX_SQL,
    "corpus_mix_t2": _MIX_T2_SQL,
    "batch_padding_waste": _PAD_SQL,
    "token_length_histogram": _HIST_SQL,
}
