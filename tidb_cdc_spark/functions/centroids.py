"""Per-label embedding centroids and nearest-centroid assignment —
the cheap vector-side labeling / drift-check pass a curation pipeline
runs over an embedded corpus (label purity, mislabeled-vector audit,
cluster-quality drift between corpus snapshots).

Cross-engine exactness: float sums are order-dependent, so every
stage works in FIXED POINT — components are quantized to integers
(``floor(x * 2^20)``: float→double widening and ``floor`` are exact
and identical in every engine), per-label sums are integral (exact,
order-independent), the centroid is the truncating integer division
``sum div count`` (Spark ``div`` and DuckDB ``//`` both truncate
toward zero — verified), and distances are integral sums of squared
differences. With 64 dims, |q| ≲ 2^22 and squared diffs ≲ 2^44, a
BIGINT distance never overflows below ~2^18 dims.

Scale shape (100 TB):
- quantization + posexplode is codegen; the per-(label, pos) sum has
  map-side combine, so the shuffle carries #labels × dims rows per
  partition — independent of corpus size;
- the centroid table is #labels × dims rows — broadcast to the
  assignment join, so assignment is one scan of the exploded corpus
  with NO corpus-side shuffle beyond the per-vector distance agg,
  which is clustered by vec_id (the explode preserves the scan
  partitioning).

Reference scope note: the reference engine (dollarkillerx/tidb-cdc)
has no vector surface; this is north-star pipeline surface, same
contract style as functions/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: Fixed-point scale: 2^20 (≈6 decimal digits of embedding precision).
SCALE = 1 << 20


def quantized_components(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, label, pos, q) rows: 0-based component index and the
    fixed-point component ``floor(x * SCALE)`` as BIGINT."""
    return emb.select(
        F.col(id_col),
        "label",
        F.posexplode(F.col(vec_col)).alias("pos", "_x"),
    ).select(
        id_col,
        "label",
        "pos",
        F.floor(F.col("_x").cast("double") * F.lit(SCALE))
        .cast("long")
        .alias("q"),
    )


def label_centroids(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(label, pos, cq, n): fixed-point centroid component per label
    and dimension — ``cq = sum(q) div n`` (truncating division,
    engine-identical). #labels × dims rows."""
    comp = quantized_components(emb, id_col, vec_col)
    return comp.groupBy("label", "pos").agg(
        F.expr("sum(q) div count(1)").alias("cq"),
        F.count(F.lit(1)).alias("n"),
    )


def centroid_summary(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """One row per label: member count, integral centroid checksum
    (sum of components) and squared norm — the compact, exactly
    reproducible signature used to diff centroids across corpus
    snapshots."""
    cent = label_centroids(emb, id_col, vec_col)
    return cent.groupBy("label").agg(
        F.max("n").alias("n_vectors"),
        F.sum("cq").alias("centroid_checksum"),
        F.sum(F.col("cq") * F.col("cq")).alias("centroid_norm2"),
    )


def assign_nearest_centroid(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, label, assigned, dist2): each vector's nearest label
    centroid by integral squared L2 distance in fixed point, ties
    broken by smaller label id. The centroid table is broadcast;
    the per-vector distance aggregate clusters on the scan's own
    partitioning (no corpus shuffle)."""
    comp = quantized_components(emb, id_col, vec_col)
    cent = label_centroids(emb, id_col, vec_col).select(
        F.col("label").alias("_clabel"), "pos", "cq"
    )
    d = (
        comp.join(F.broadcast(cent), "pos")
        .groupBy(id_col, "label", "_clabel")
        .agg(
            F.sum(
                (F.col("q") - F.col("cq")) * (F.col("q") - F.col("cq"))
            ).alias("dist2")
        )
    )
    w = Window.partitionBy(id_col).orderBy("dist2", "_clabel")
    return (
        d.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            id_col,
            "label",
            F.col("_clabel").alias("assigned"),
            "dist2",
        )
    )
