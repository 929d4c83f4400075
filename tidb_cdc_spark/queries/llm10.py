"""Tenth wave: substring-level (span) deduplication — the exact
repeated-span signal of "Deduplicating Training Data Makes Language
Models Better" (Lee et al. 2021, public literature), at corpus and
document granularity. Whole-document dedup misses boilerplate,
license blocks, and quoted chains repeated INSIDE otherwise-unique
documents; span fingerprints catch every repeated substring of
≥ span_tokens tokens.

Cross-engine notes: spans are the string-shingle unit of
functions/quality.shingle_string_rows (distinct per doc, short-doc
all-token fallback — mirrored in the DuckDB CTE below, same idiom as
llm4's contamination oracle); the coverage ratio is µ-unit BIGINT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tidb_cdc_spark.functions import quality as Q
from tidb_cdc_spark.queries.llm import _docs

_SPAN_K = 12

# Shared CTE: distinct (doc_id, span) rows — SQL twin of
# shingle_string_rows(k=12). DuckDB lists are 1-based; range(a, b)
# is exclusive of b; slicing l[i : i + k - 1] takes k elements.
_SPAN_CTE = rf"""
WITH tl AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS l
  FROM documents
), tln AS (SELECT doc_id, l, len(l) AS n FROM tl),
sp AS (
  SELECT DISTINCT doc_id, g FROM (
    SELECT doc_id,
           unnest(CASE WHEN n >= {_SPAN_K}
             THEN list_transform(range(1, n - {_SPAN_K} + 2),
                  i -> array_to_string(l[i : i + {_SPAN_K} - 1], ' '))
             ELSE [array_to_string(l, ' ')] END) AS g
    FROM tln WHERE n > 0
  )
)
"""


def repeated_spans_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide repeated exact 12-token spans in ≥2 distinct docs,
    heaviest first — the corpus-curation "what boilerplate should we
    strip" report. Plan: one codegen shingle pass + one span groupBy
    with map-side combine; TakeOrderedAndProject caps the result."""
    out = Q.repeated_spans(_docs(spark, sf_dir), span_tokens=_SPAN_K, min_docs=2)
    return out.orderBy(F.col("n_docs").desc(), F.col("span")).limit(100)


_REPEATED_SQL = (
    _SPAN_CTE
    + """
SELECT g AS span, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM sp GROUP BY g HAVING COUNT(*) >= 2
ORDER BY n_docs DESC, span LIMIT 100
"""
)


def span_dup_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document shared-span coverage (µ-units): how much of each
    document is made of spans that also occur elsewhere — the
    doc-level drop/deboilerplate signal. Plan: span rows → span-count
    aggregate → co-partitioned join back on the span → doc_id
    aggregate (two key shuffles total)."""
    out = Q.span_dup_coverage(_docs(spark, sf_dir), span_tokens=_SPAN_K)
    return out.orderBy("doc_id")


_COVERAGE_SQL = (
    _SPAN_CTE
    + """
, counts AS (
  SELECT g, COUNT(*) AS nd FROM sp GROUP BY g
)
SELECT sp.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_spans,
       CAST(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS shared_spans,
       CAST((SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) * 1000000)
         // GREATEST(COUNT(*), 1) AS BIGINT) AS shared_ppm
FROM sp JOIN counts USING (g)
GROUP BY sp.doc_id ORDER BY sp.doc_id
"""
)


QUERIES = {
    "repeated_spans_top": repeated_spans_top,
    "span_dup_coverage": span_dup_coverage,
}

ORACLE = {
    "repeated_spans_top": _REPEATED_SQL,
    "span_dup_coverage": _COVERAGE_SQL,
}
