r"""Eighth wave: budget-constrained quality selection (take the
best docs until half the corpus tokens are spent —
functions/selection.py) and corpus snapshot diff (derive the
added/removed/changed delta between two corpus versions —
functions/versioning.py).

Cross-engine notes: quality is integral µ-units (PPM − symbol_ppm,
truncating division); the running sum is fully determined by the
total (quality DESC, doc_id ASC) order, which Spark computes with
the two-level quality-banded distributed scan and the oracle with a
plain window — same integers. The v2 snapshot in the diff query is
SYNTHESIZED deterministically from doc_id arithmetic (drop %10==1,
revise %10==2, add remapped %10==3) so both engines build the same
pair of corpora.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tidb_cdc_spark.functions import selection as SEL
from tidb_cdc_spark.functions import text as T
from tidb_cdc_spark.functions import versioning as VER
from tidb_cdc_spark.queries.llm import _docs

_PPM = SEL.PPM


def quality_budget_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Half-the-corpus token budget spent on the highest-quality
    (fewest-symbols) documents first; per doc the running spend and
    the keep decision."""
    d = _docs(spark, sf_dir).select(
        "doc_id",
        (
            F.lit(_PPM)
            - F.expr(
                f"(length(regexp_replace(text, '[A-Za-z0-9\\\\s]', '')) * {_PPM}L)"
                " div greatest(length(text), 1)"
            )
        ).alias("quality_ppm"),
        T.token_count(F.col("text")).cast("long").alias("n_tokens"),
    )
    return SEL.budget_head(d).orderBy("doc_id")


_BUDGET_SQL = rf"""
WITH s AS (
  SELECT doc_id,
         CAST({_PPM} - (length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g'))
              * {_PPM}) // GREATEST(length(text), 1) AS BIGINT) AS quality_ppm,
         CAST(len(list_filter(string_split_regex(text, '\s+'),
              x -> x <> '')) AS BIGINT) AS n_tokens
  FROM documents
), c AS (
  SELECT *,
         CAST(SUM(n_tokens) OVER (ORDER BY quality_ppm DESC, doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum_tokens,
         CAST(SUM(n_tokens) OVER () AS BIGINT) AS total
  FROM s
)
SELECT doc_id, quality_ppm, n_tokens, cum_tokens,
       cum_tokens * 2 <= total AS selected
FROM c ORDER BY doc_id
"""


def _v2(d: DataFrame) -> DataFrame:
    kept = d.filter(F.col("doc_id") % 10 != 1).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 10 == 2, F.concat(F.col("text"), F.lit(" [rev2]"))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    added = d.filter(F.col("doc_id") % 10 == 3).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        F.concat(F.lit("new "), F.col("doc_id").cast("string")).alias("text"),
    )
    return kept.unionAll(added)


def corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document diff between the corpus and a deterministically
    synthesized v2 (drop %10==1, revise %10==2, add remapped
    %10==3): id, status, both content fingerprints."""
    d = _docs(spark, sf_dir).select("doc_id", "text")
    return VER.snapshot_diff(d, _v2(d)).orderBy("id")


# SQL twin of _v2 — single home; llm14's drift oracle reuses it
_V2_CTE = """
v2 AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 = 2 THEN text || ' [rev2]' ELSE text END AS text
  FROM documents WHERE doc_id % 10 <> 1
  UNION ALL
  SELECT doc_id + 10000000 AS doc_id, 'new ' || CAST(doc_id AS VARCHAR) AS text
  FROM documents WHERE doc_id % 10 = 3
)"""

_DIFF_SQL = (
    "WITH " + _V2_CTE + """
, o AS (SELECT doc_id AS id, md5(text) AS old_fp FROM documents),
n AS (SELECT doc_id AS id, md5(text) AS new_fp FROM v2)
SELECT COALESCE(o.id, n.id) AS id,
       CASE WHEN old_fp IS NULL THEN 'added'
            WHEN new_fp IS NULL THEN 'removed'
            WHEN old_fp = new_fp THEN 'unchanged'
            ELSE 'changed' END AS status,
       old_fp, new_fp
FROM o FULL OUTER JOIN n USING (id) ORDER BY id
"""
)


_CW, _CS = 32, 24  # window/stride sized to the testdata's 10-99-token docs


def doc_chunk_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window RAG chunking (32-token windows, stride 24):
    one row per chunk span per document."""
    from tidb_cdc_spark.functions import chunking as CH

    d = _docs(spark, sf_dir).select(
        "doc_id", T.token_count(F.col("text")).cast("long").alias("n_tokens")
    )
    return CH.chunk_spans(d, window=_CW, stride=_CS).orderBy(
        "doc_id", "chunk_idx"
    )


_CHUNK_SQL = rf"""
WITH tok AS (
  SELECT doc_id,
         len(list_filter(string_split_regex(text, '\s+'),
             x -> x <> '')) AS n
  FROM documents
)
SELECT doc_id,
       start_tok // {_CS} AS chunk_idx,
       start_tok,
       LEAST(start_tok + {_CW}, n) AS end_tok,
       LEAST(start_tok + {_CW}, n) - start_tok AS chunk_tokens
FROM (
  SELECT doc_id, n, CAST(u.s AS BIGINT) AS start_tok
  FROM tok, unnest(generate_series(0,
       {_CS} * ((GREATEST(n - {_CW}, 0) + {_CS - 1}) // {_CS}),
       {_CS})) u(s)
  WHERE n > 0
)
ORDER BY doc_id, chunk_idx
"""


QUERIES = {
    "quality_budget_head": quality_budget_head,
    "corpus_snapshot_diff": corpus_snapshot_diff,
    "doc_chunk_spans": doc_chunk_spans,
}

ORACLE = {
    "quality_budget_head": _BUDGET_SQL,
    "corpus_snapshot_diff": _DIFF_SQL,
    "doc_chunk_spans": _CHUNK_SQL,
}
