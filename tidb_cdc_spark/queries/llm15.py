"""Fifteenth wave: targeted data selection and real lexical
retrieval — DSIR importance resampling (Xie et al., NeurIPS 2023),
Okapi BM25 top-k (Robertson & Zaragoza 2009), and within-doc token
entropy. All three are hash-exact cross-engine (whole-bit log2 +
integer µ-units, the functions/lm.py convention), so every query
here carries a direct DuckDB oracle — no audit twins needed.

Reference scope note: the reference engine (dollarkillerx/tidb-cdc)
has no corpus/retrieval surface; north-star pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tidb_cdc_spark.functions import bm25 as B
from tidb_cdc_spark.functions import dsir as DS
from tidb_cdc_spark.functions import lm as LM
from tidb_cdc_spark.queries.llm import _docs
from tidb_cdc_spark.queries.llm3 import _md5_bucket_sql

_DIM = 64
_TARGET_SOURCE = "src0"
_KEEP_PPM = 250_000

# Shared oracle CTE: sparse hashed TF over the raw corpus + the
# dim-row whole-bit log-ratio table toward the src0 target domain —
# the exact mirror of functions/dsir.py (same md5 buckets, same
# Laplace smoothing, same bin-length floor-log2).
_DSIR_CTE = rf"""
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '\s+'),
                            x -> x <> '')) AS term
  FROM documents
), tfr AS (
  SELECT doc_id,
         CAST({_md5_bucket_sql("term")} % {_DIM} AS INTEGER) AS bucket,
         CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok GROUP BY doc_id, bucket
), ttok AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '\s+'),
                            x -> x <> '')) AS term
  FROM documents WHERE source = '{_TARGET_SOURCE}'
), cr AS (
  SELECT bucket, CAST(SUM(tf) AS BIGINT) AS c_raw FROM tfr GROUP BY bucket
), ct AS (
  SELECT CAST({_md5_bucket_sql("term")} % {_DIM} AS INTEGER) AS bucket,
         CAST(COUNT(*) AS BIGINT) AS c_tgt
  FROM ttok GROUP BY bucket
), tot AS (
  SELECT (SELECT CAST(SUM(c_raw) AS BIGINT) FROM cr) AS nr,
         (SELECT COALESCE(CAST(SUM(c_tgt) AS BIGINT), 0) FROM ct) AS nt
), bits AS (
  SELECT cr.bucket,
         CAST((length(bin(nr + {_DIM})) - length(bin(cr.c_raw + 1)))
            - (length(bin(nt + {_DIM}))
               - length(bin(COALESCE(ct.c_tgt, 0) + 1))) AS BIGINT)
           AS bits
  FROM cr LEFT JOIN ct USING (bucket), tot
), weights AS (
  SELECT tfr.doc_id,
         CAST(SUM(tfr.tf) AS BIGINT) AS n_tokens,
         CAST(SUM(tfr.tf * bits.bits) AS BIGINT) AS weight_bits
  FROM tfr JOIN bits USING (bucket)
  GROUP BY tfr.doc_id
)
"""


def corpus_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights toward the ``src0`` domain: every
    document scored by how much more its hashed-unigram bag looks
    like src0's distribution than the corpus average — the ranking
    that turns raw crawl into target-domain training data. The
    dim-row log-ratio table broadcasts; cites functions/dsir.py for
    the whole-bit exactness contract."""
    raw = _docs(spark, sf_dir)
    tgt = raw.filter(F.col("source") == _TARGET_SOURCE)
    return DS.dsir_weights(raw, tgt, dim=_DIM).orderBy("doc_id")


_DSIR_WEIGHTS_SQL = (
    _DSIR_CTE
    + """
SELECT doc_id, n_tokens, weight_bits FROM weights ORDER BY doc_id
"""
)


def corpus_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR top-slice selection: keep the 25% of the corpus most
    target-like, ranked (weight DESC, doc_id ASC) via the banded
    two-level rank — no single-task global window at any scale."""
    raw = _docs(spark, sf_dir)
    tgt = raw.filter(F.col("source") == _TARGET_SOURCE)
    return DS.dsir_select(raw, tgt, dim=_DIM, keep_ppm=_KEEP_PPM).orderBy(
        "rank"
    )


_DSIR_SELECT_SQL = (
    _DSIR_CTE
    + f"""
, ranked AS (
  SELECT doc_id, n_tokens, weight_bits,
         CAST(ROW_NUMBER() OVER (ORDER BY weight_bits DESC, doc_id)
              AS BIGINT) AS rank,
         (SELECT COUNT(*) FROM weights) AS _n
  FROM weights
)
SELECT doc_id, n_tokens, weight_bits, rank,
       rank * 1000000 <= _n * {_KEEP_PPM} AS selected
FROM ranked ORDER BY rank
"""
)


def rag_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 retrieval, the real tf/idf ranker (whole-bit idf,
    integer-µ saturation — functions/bm25.py): docs 0-2 as queries,
    top-5 hits each, self-hits excluded. Postings never move; the
    query-term×idf table broadcasts."""
    docs = _docs(spark, sf_dir)
    q = docs.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"), "text"
    )
    return B.bm25_topk(docs, q, k=5, exclude_self=True).orderBy(
        "query_id", "rank"
    )


_BM25_SQL = r"""
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '\s+'),
                            x -> x <> '')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok GROUP BY doc_id, term
), dl AS (
  SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id
), dfreq AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS nd,
         GREATEST(CAST(SUM(dl) AS BIGINT) // COUNT(*), 1) AS avgdl
  FROM dl
), q AS (
  SELECT doc_id AS query_id, unnest(list_distinct(
           list_filter(string_split_regex(lower(text), '\s+'),
                       x -> x <> ''))) AS term
  FROM documents WHERE doc_id < 3
), qidf AS (
  SELECT q.query_id, q.term,
         CAST(length(bin(tot.nd)) - length(bin(dfreq.df)) AS BIGINT)
           AS idf_bits,
         tot.avgdl
  FROM q JOIN dfreq USING (term), tot
), scored AS (
  -- clamps + idf-outside-the-div mirror functions/bm25.py exactly
  -- (int64-safety restructure; see TF_CAP/AVGDL_CAP/DL_CAP there)
  SELECT qidf.query_id, tf.doc_id,
         CAST(SUM(qidf.idf_bits *
                  ((1000000 * 44 * LEAST(tf.tf, 1000000)
                    * LEAST(qidf.avgdl, 100000))
                   // (20 * LEAST(tf.tf, 1000000)
                       * LEAST(qidf.avgdl, 100000)
                       + 6 * LEAST(qidf.avgdl, 100000)
                       + 18 * LEAST(dl.dl, 1000000000000000))))
              AS BIGINT) AS score_mu
  FROM tf JOIN qidf USING (term) JOIN dl USING (doc_id)
  WHERE tf.doc_id <> qidf.query_id
  GROUP BY qidf.query_id, tf.doc_id
), ranked AS (
  SELECT query_id, doc_id, score_mu,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY score_mu DESC, doc_id)
              AS INTEGER) AS rank
  FROM scored
)
SELECT query_id, doc_id, score_mu, rank
FROM ranked WHERE rank <= 5
ORDER BY query_id, rank
"""


def text_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-doc token self-entropy (whole-bit, µ-units) — the
    corpus-pass-free repetitiveness screen; functions/lm.py."""
    return LM.token_entropy(_docs(spark, sf_dir)).orderBy("doc_id")


_ENTROPY_SQL = r"""
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '\s+'),
                            x -> x <> '')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok GROUP BY doc_id, term
), wt AS (
  SELECT doc_id, tf,
         CAST(SUM(tf) OVER (PARTITION BY doc_id) AS BIGINT) AS n,
         tf * (length(bin(CAST(SUM(tf) OVER (PARTITION BY doc_id)
                               AS BIGINT)))
               - length(bin(tf))) AS b
  FROM tf
)
SELECT doc_id,
       CAST(MAX(n) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_terms,
       CAST(SUM(b) AS BIGINT) AS sum_bits,
       CAST((CAST(SUM(b) AS BIGINT) * 1000000) // MAX(n) AS BIGINT)
         AS mean_mbits
FROM wt GROUP BY doc_id ORDER BY doc_id
"""


QUERIES = {
    "corpus_dsir_weights": corpus_dsir_weights,
    "corpus_dsir_select": corpus_dsir_select,
    "rag_bm25_topk": rag_bm25_topk,
    "text_token_entropy": text_token_entropy,
}

ORACLE = {
    "corpus_dsir_weights": _DSIR_WEIGHTS_SQL,
    "corpus_dsir_select": _DSIR_SELECT_SQL,
    "rag_bm25_topk": _BM25_SQL,
    "text_token_entropy": _ENTROPY_SQL,
}
