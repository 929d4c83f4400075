"""Fourth wave: document quality filtering (Gopher/C4-family
repetition stats + threshold filter) and train/eval contamination
detection — the filters a pretraining pipeline runs before dedup and
the overlap audit it runs before shipping.

Cross-engine notes: every ratio is µ-unit BIGINT (integer division
— bit-identical in any engine; see functions/quality.py); the
contamination eval split reuses the md5-bucket sampling contract of
functions/sampling.py so DuckDB reproduces the exact same split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tidb_cdc_spark.functions import quality as Q
from tidb_cdc_spark.queries.llm import _docs
from tidb_cdc_spark.queries.llm3 import _md5_bucket_sql

# Shared CTE: per-doc token/gram stats in µ-units — the SQL twin of
# functions/quality.repetition_stats (DuckDB lists are 1-based;
# range(a, b) is exclusive of b).
_STATS_CTE = r"""
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS l,
         length(text) AS nc,
         length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) AS nsym
  FROM documents
), tl AS (SELECT doc_id, l, len(l) AS n, nc, nsym FROM tok),
tf AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS nt, MAX(c) AS top FROM (
    SELECT doc_id, term, COUNT(*) AS c
    FROM (SELECT doc_id, unnest(l) AS term FROM tl) GROUP BY doc_id, term
  ) GROUP BY doc_id
), g2s AS (
  SELECT doc_id, COUNT(*) AS n2, COUNT(DISTINCT g) AS d2
  FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, n), i -> l[i] || ' ' || l[i+1])) AS g
    FROM tl
  ) GROUP BY doc_id
), g3s AS (
  SELECT doc_id, COUNT(*) AS n3, COUNT(DISTINCT g) AS d3
  FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, n - 1),
                  i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2])) AS g
    FROM tl
  ) GROUP BY doc_id
), stats AS (
  SELECT tl.doc_id,
         COALESCE(nt, 0) AS n_tokens,
         COALESCE((top * 1000000) // GREATEST(nt, 1), 0) AS top_token_ppm,
         COALESCE(((n2 - d2) * 1000000) // GREATEST(n2, 1), 0) AS dup_2gram_ppm,
         COALESCE(((n3 - d3) * 1000000) // GREATEST(n3, 1), 0) AS dup_3gram_ppm,
         (nsym * 1000000) // GREATEST(nc, 1) AS symbol_ppm
  FROM tl LEFT JOIN tf USING (doc_id) LEFT JOIN g2s USING (doc_id)
          LEFT JOIN g3s USING (doc_id)
)
"""


def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition/composition statistics (µ-unit
    ratios) — the MassiveText filter inputs."""
    return Q.repetition_stats(_docs(spark, sf_dir)).orderBy("doc_id")


_REPETITION_SQL = (
    _STATS_CTE
    + """
SELECT doc_id, n_tokens, top_token_ppm, dup_2gram_ppm, dup_3gram_ppm,
       symbol_ppm
FROM stats ORDER BY doc_id
"""
)


_T = Q.QualityThresholds()


def corpus_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold keep/drop decision per document with the ordered
    fail-reason audit trail."""
    return Q.quality_filter(_docs(spark, sf_dir), _T).orderBy("doc_id")


_FILTER_SQL = (
    _STATS_CTE
    + f"""
SELECT doc_id, n_tokens, top_token_ppm, dup_2gram_ppm, dup_3gram_ppm,
       symbol_ppm,
       concat_ws(',',
         CASE WHEN n_tokens < {_T.min_tokens} THEN 'too_short' END,
         CASE WHEN n_tokens > {_T.max_tokens} THEN 'too_long' END,
         CASE WHEN top_token_ppm > {_T.max_top_token_ppm} THEN 'top_token' END,
         CASE WHEN dup_2gram_ppm > {_T.max_dup_2gram_ppm} THEN 'dup_2gram' END,
         CASE WHEN symbol_ppm > {_T.max_symbol_ppm} THEN 'symbols' END
       ) AS fail_reasons,
       concat_ws(',',
         CASE WHEN n_tokens < {_T.min_tokens} THEN 'too_short' END,
         CASE WHEN n_tokens > {_T.max_tokens} THEN 'too_long' END,
         CASE WHEN top_token_ppm > {_T.max_top_token_ppm} THEN 'top_token' END,
         CASE WHEN dup_2gram_ppm > {_T.max_dup_2gram_ppm} THEN 'dup_2gram' END,
         CASE WHEN symbol_ppm > {_T.max_symbol_ppm} THEN 'symbols' END
       ) = '' AS keep
FROM stats ORDER BY doc_id
"""
)


_EVAL_RATE = 0.10
_SHINGLE_K = 8


def contamination_eval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval shingle-overlap audit: 10 % deterministic eval
    split, 8-token shingles; one row per TRAIN document."""
    return Q.contamination_overlap(
        _docs(spark, sf_dir), _EVAL_RATE, _SHINGLE_K
    ).orderBy("doc_id")


_CONTAMINATION_SQL = rf"""
WITH tagged AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS l,
         {_md5_bucket_sql("doc_id", "eval")} < {int(_EVAL_RATE * 4294967296)}
           AS is_eval
  FROM documents
), tl AS (SELECT doc_id, l, len(l) AS n, is_eval FROM tagged),
sh AS (
  SELECT DISTINCT doc_id, is_eval, g FROM (
    SELECT doc_id, is_eval,
           unnest(CASE WHEN n >= {_SHINGLE_K}
             THEN list_transform(range(1, n - {_SHINGLE_K} + 2),
                  i -> array_to_string(l[i : i + {_SHINGLE_K} - 1], ' '))
             ELSE [array_to_string(l, ' ')] END) AS g
    FROM tl WHERE n > 0
  )
), eval_sh AS (SELECT DISTINCT g FROM sh WHERE is_eval),
hits AS (
  SELECT t.doc_id, COUNT(*) AS n_shingles, COUNT(e.g) AS n_hits
  FROM (SELECT doc_id, g FROM sh WHERE NOT is_eval) t
  LEFT JOIN eval_sh e USING (g)
  GROUP BY t.doc_id
)
SELECT d.doc_id, COALESCE(n_shingles, 0) AS n_shingles,
       COALESCE(n_hits, 0) AS n_hits,
       COALESCE(n_hits, 0) > 0 AS contaminated
FROM (SELECT doc_id FROM tagged WHERE NOT is_eval) d
LEFT JOIN hits USING (doc_id) ORDER BY doc_id
"""


QUERIES = {
    "text_repetition_stats": text_repetition_stats,
    "corpus_quality_filter": corpus_quality_filter,
    "contamination_eval_overlap": contamination_eval_overlap,
}

ORACLE = {
    "text_repetition_stats": _REPETITION_SQL,
    "corpus_quality_filter": _FILTER_SQL,
    "contamination_eval_overlap": _CONTAMINATION_SQL,
}
