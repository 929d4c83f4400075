"""Fourteenth wave: feature-hashed document vectors (the hashing
trick) and semantic dedup over RAW TEXT — the no-model bridge from
the text surface to the embedding-space operators.

Oracle strategy: the sparse hashed-TF table is EXACT (md5 bucket
hash is engine-reproducible, counts integral) — full oracle; the
text-side semantic dedup is k-means-based (rows-only) with a
planted-copy audit (identical text ⇒ identical hashed vector ⇒ same
cell by argmin determinism ⇒ pruned) that DuckDB verifies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tidb_cdc_spark.functions import semdedup as SD
from tidb_cdc_spark.functions.feature_hash import hashed_tf, hashed_tf_dense
from tidb_cdc_spark.queries.audits import (
    _DOC_AUDIT_SQL,
    _N_DOCS,
    _doc_spine,
    _docs_with_copies,
)
from tidb_cdc_spark.queries.llm import _docs
from tidb_cdc_spark.queries.llm3 import _md5_bucket_sql

_DIM = 64


def doc_hashed_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse hashed term-frequency vectors for every document —
    (doc_id, bucket, tf), bucket = md5-bucket(token) mod 64. The
    fixed-dimension text representation a curation pass computes
    before any model exists; exactly reproducible in any engine."""
    return hashed_tf(_docs(spark, sf_dir), dim=_DIM).orderBy(
        "doc_id", "bucket"
    )


_HASHED_TF_SQL = rf"""
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '\s+'),
                            x -> x <> '')) AS term
  FROM documents
)
SELECT doc_id,
       CAST({_md5_bucket_sql("term")} % {_DIM} AS INTEGER) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS tf
FROM tok GROUP BY doc_id, bucket
ORDER BY doc_id, bucket
"""


def doc_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over raw text via hashed-TF vectors — no embeddings
    needed: near-identical token multisets land at cosine ≈ 1.
    Rows-only (k-means); the hard contract is oracle-checked by
    ``doc_semantic_dedup_audit``."""
    vecs = hashed_tf_dense(_docs(spark, sf_dir), dim=_DIM).withColumnRenamed(
        "doc_id", "vec_id"
    )
    res = SD.semantic_dedup(vecs, n_cells=16, threshold=0.9)
    return (
        res.filter(F.col("is_dup"))
        .select(
            F.col("vec_id").alias("doc_id"),
            "cell",
            "dup_of",
            F.round("max_sim", 4).alias("sim"),
        )
        .orderBy("doc_id")
    )


def doc_semantic_dedup_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Planted-copy contract over TEXT: an exact text copy hashes to
    the identical TF vector (pure function of the token multiset),
    so it shares the original's cell and sits at cosine 1 — must be
    pruned."""
    d, off = _docs_with_copies(spark, sf_dir)
    vecs = hashed_tf_dense(d, dim=_DIM).withColumnRenamed(
        "doc_id", "vec_id"
    )
    res = SD.semantic_dedup(vecs, n_cells=16, threshold=0.9)
    copies = (
        res.filter(F.col("vec_id") >= F.lit(off))
        .filter(F.col("vec_id") < F.lit(off) + _N_DOCS)
        .select(
            (F.col("vec_id") - F.lit(off)).alias("doc_id"),
            F.col("is_dup").alias("_d"),
        )
    )
    return (
        _doc_spine(spark, sf_dir).join(copies, "doc_id", "left")
        .select(
            "doc_id",
            F.col("_d").isNotNull().alias("found"),
            F.coalesce(F.col("_d"), F.lit(False)).alias("planted_pruned"),
        )
        .orderBy("doc_id")
    )


QUERIES = {
    "doc_hashed_tf": doc_hashed_tf,
    "doc_semantic_dedup": doc_semantic_dedup,
    "doc_semantic_dedup_audit": doc_semantic_dedup_audit,
}

ORACLE = {
    "doc_hashed_tf": _HASHED_TF_SQL,
    "doc_semantic_dedup_audit": _DOC_AUDIT_SQL.format(flag="planted_pruned"),
}
