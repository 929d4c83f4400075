"""Fifth wave: sequence packing (concat-and-chunk into fixed token
budgets via a distributed prefix sum) and fixed-point embedding
centroids / nearest-centroid assignment — the layout and vector-audit
stages that run after filtering/dedup and before a corpus ships.

Cross-engine notes:
- packing is fully determined by (doc_id order, token counts,
  budget): the Spark side computes the global running sum with a
  two-level distributed scan (functions/packing.py) and the oracle
  with a plain window — identical integers either way;
- centroid math is integral fixed point (floor(x·2^20) components,
  truncating ``div`` for the mean — both engines truncate toward
  zero; see functions/centroids.py), so sums are order-independent
  and hashes match bit-exactly despite float inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tidb_cdc_spark.functions import centroids as CE
from tidb_cdc_spark.functions import packing as PK
from tidb_cdc_spark.functions import text as T
from tidb_cdc_spark.queries.llm import _docs, _embs

# --------------------------------------------------- sequence packing
_BUDGET = 2048


def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk the corpus (doc_id order) into 2048-token
    training sequences; per doc: global offset + chunk span."""
    d = _docs(spark, sf_dir).select(
        "doc_id", T.token_count(F.col("text")).alias("n_tokens")
    )
    return PK.pack_chunks(d, _BUDGET).orderBy("doc_id")


_PACK_SQL = rf"""
WITH tok AS (
  SELECT doc_id,
         len(list_filter(string_split_regex(text, '\s+'),
             x -> x <> '')) AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, n_tokens,
         CAST(SUM(n_tokens) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
  FROM tok
)
SELECT doc_id, n_tokens,
       cum - n_tokens AS start_tok,
       CASE WHEN n_tokens > 0
            THEN (cum - n_tokens) // {_BUDGET} END AS chunk_first,
       CASE WHEN n_tokens > 0
            THEN (cum - 1) // {_BUDGET} END AS chunk_last,
       CASE WHEN n_tokens > 0
            THEN (cum - 1) // {_BUDGET} - (cum - n_tokens) // {_BUDGET} + 1
            ELSE 0 END AS n_chunks
FROM c ORDER BY doc_id
"""

# ------------------------------------------- fixed-point centroids
_QCOMP_CTE = f"""
WITH comp AS (
  SELECT vec_id, label, i - 1 AS pos,
         CAST(floor(CAST(embedding[i] AS DOUBLE) * {CE.SCALE})
              AS BIGINT) AS q
  FROM embeddings, range(1, 65) t(i)
), cent AS (
  SELECT label, pos, CAST(SUM(q) // COUNT(*) AS BIGINT) AS cq, COUNT(*) AS n
  FROM comp GROUP BY label, pos
)
"""


def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label fixed-point centroid signature: member count,
    component checksum, squared norm — exactly reproducible in any
    engine, so snapshots can be diffed byte-for-byte."""
    return CE.centroid_summary(_embs(spark, sf_dir)).orderBy("label")


_CENTROID_SQL = (
    _QCOMP_CTE
    + """
SELECT label, MAX(n) AS n_vectors,
       CAST(SUM(cq) AS BIGINT) AS centroid_checksum,
       CAST(SUM(cq * cq) AS BIGINT) AS centroid_norm2
FROM cent GROUP BY label ORDER BY label
"""
)


def knn_centroid_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid assignment (integral squared L2, ties to the
    smaller label) for every vector — the mislabeled-vector audit."""
    return CE.assign_nearest_centroid(_embs(spark, sf_dir)).orderBy(
        "vec_id"
    )


_ASSIGN_SQL = (
    _QCOMP_CTE
    + """
, d AS (
  SELECT comp.vec_id, comp.label, cent.label AS clabel,
         CAST(SUM((q - cq) * (q - cq)) AS BIGINT) AS dist2
  FROM comp JOIN cent USING (pos)
  GROUP BY comp.vec_id, comp.label, cent.label
), r AS (
  SELECT vec_id, label, clabel AS assigned, dist2,
         ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY dist2, clabel) AS rn
  FROM d
)
SELECT vec_id, label, assigned, dist2 FROM r WHERE rn = 1
ORDER BY vec_id
"""
)


QUERIES = {
    "pack_sequences": pack_sequences,
    "embedding_centroids": embedding_centroids,
    "knn_centroid_assign": knn_centroid_assign,
}

ORACLE = {
    "pack_sequences": _PACK_SQL,
    "embedding_centroids": _CENTROID_SQL,
    "knn_centroid_assign": _ASSIGN_SQL,
}
