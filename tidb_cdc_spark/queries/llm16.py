"""Sixteenth wave (round 8): fit-free dimensionality reduction.

``embedding_random_projection`` — seeded ±1 Johnson-Lindenstrauss
projection (functions/projection.py), hash-exact cross-engine: the
sign matrix is md5-derived DRIVER-SIDE into plain literals shared by
both engines, and the projection is an integer signed sum over the
2⁻²⁰ fixed-point quantized vector.

Reference scope note: the reference engine (dollarkillerx/tidb-cdc)
has no vector surface; north-star pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from tidb_cdc_spark.functions.projection import (
    random_project,
    random_project_sql,
)

_DIM = 64
_K = 8


def embedding_random_projection(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """64-d embeddings → 8 exact integer JL coordinates. Map-only:
    the plan is a single project over the scan — no shuffle, no
    Python, no fitted model (plan-pinned)."""
    vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return random_project(vecs, d=_DIM, k=_K).orderBy("vec_id")


QUERIES = {
    "embedding_random_projection": embedding_random_projection,
}

ORACLE = {
    "embedding_random_projection": random_project_sql(d=_DIM, k=_K),
}
