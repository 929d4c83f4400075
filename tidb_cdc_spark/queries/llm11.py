"""Eleventh wave: product-quantization ANN (the compression half of
the IVF-PQ 100 TB layout — functions/pq.py). Registered AFTER the
cdcq module on purpose: the driver gate samples the first 50 registry
entries, which are exactly the llm1-10 surface (44) + CDC consumers
(6); PQ is rows-only (KMeans has no SQL oracle) and is pinned by the
recall/compression tests in tests/test_llm.py instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tidb_cdc_spark.functions import pq as PQ
from tidb_cdc_spark.queries.llm import _embs


def knn_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-5 via product quantization + asymmetric distance
    computation: 64-dim vectors → 4×16 codebooks (16× compression),
    corpus-side search is integer code lookups only. Rows-only (the
    codebook training is KMeans); retrieval quality is pinned by the
    clustered-data recall test, and the plan shape — broadcast LUT
    join + map-side-combining (query, vector) sum — is the point at
    scale: no corpus-side float vectors move."""
    e = _embs(spark, sf_dir)
    books = PQ.pq_train(e, m=4, k=16, train_fraction=0.25)
    codes = PQ.pq_encode(e, books)
    q = e.filter(F.col("vec_id") < 5)
    return PQ.pq_knn_adc(q, codes, books, k=5).orderBy("query_id", "rank")


def knn_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-5 via the full IVF-PQ layout: coarse cells prune
    candidates (n_probe of n_cells — partition pruning when the code
    table is stored partitioned by cell), residual-encoded PQ codes
    rank them by ADC. The canonical billion-vector index shape."""
    e = _embs(spark, sf_dir)
    q = e.filter(F.col("vec_id") < 5)
    return PQ.ivfpq_knn(
        q, e, k=5, n_cells=16, n_probe=4, train_fraction=0.25
    ).orderBy(
        "query_id", "rank"
    )


QUERIES = {"knn_pq_adc": knn_pq_adc, "knn_ivfpq": knn_ivfpq}
ORACLE: dict[str, str] = {}
