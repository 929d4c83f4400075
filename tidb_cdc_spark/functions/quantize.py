"""Symmetric int8 embedding quantization — the storage/serving
compression pass a vector pipeline runs before shipping an embedded
corpus (4× smaller vectors, with a per-vector audit of what the
compression cost).

Per vector: ``scale = max(|x_i|)``, ``iq_i ≈ x_i * 127 / scale ∈
[-127, 127]``. Everything is computed in FIXED POINT so the result
is bit-identical across engines (same contract as
functions/centroids.py): components are quantized to integers
``q = floor(x * 2^20)`` (float→double widening and ``floor`` are
exact and identical in every engine), the int8 value is the
truncating integer division ``(q * 127) div maxabs`` (Spark ``div``
and DuckDB ``//`` both truncate toward zero — verified), and the
reconstruction error is the integral L1 residue
``|q * 127 - iq * maxabs|`` summed per vector (units: fixed-point
127ths — exact, order-independent).

Overflow: |q| ≲ 2^20 for unit-ish embeddings, |q·127| ≲ 2^27,
per-vector L1 sums ≲ 2^27·dims — BIGINT-safe below ~2^36 dims.

Scale shape (100 TB): posexplode is codegen; per-vector maxabs is a
window partitioned by vec_id — ONE shuffle clustering components by
vector (rows × dims, but each group is `dims` rows), and the final
per-vector aggregate reuses that clustering (no second exchange).
No joins, no driver collection. At serving scale the same expression
writes the int8 array back with ``transform``; the stats variant
here is the audit/oracle surface.

Reference scope note: the reference engine (dollarkillerx/tidb-cdc)
has no vector surface; north-star pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tidb_cdc_spark.functions.centroids import SCALE


def int8_quantize_stats(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """One row per vector: (vec_id, label, maxabs_q, nonzero,
    iq_checksum, err_l1).

    - ``maxabs_q``    — fixed-point per-vector scale (max |q|)
    - ``nonzero``     — int8 components that survived (iq ≠ 0)
    - ``iq_checksum`` — position-weighted sum Σ iq·(pos+1): a
      layout-sensitive integral signature of the quantized vector
    - ``err_l1``      — Σ |q·127 − iq·maxabs|: integral L1
      reconstruction residue in fixed-point 127ths

    All-zero vectors quantize to all-zero (maxabs_q = 0 guard).
    """
    comp = emb.select(
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
    w = Window.partitionBy(id_col)
    comp = comp.withColumn("maxabs_q", F.max(F.abs(F.col("q"))).over(w))
    iq = F.when(F.col("maxabs_q") == 0, F.lit(0)).otherwise(
        F.expr("(q * 127) div maxabs_q")
    )
    comp = comp.withColumn("iq", iq)
    return comp.groupBy(F.col(id_col), F.col("label")).agg(
        F.max("maxabs_q").cast("long").alias("maxabs_q"),
        F.sum(F.when(F.col("iq") != 0, 1).otherwise(0))
        .cast("long")
        .alias("nonzero"),
        F.sum(F.col("iq") * (F.col("pos") + 1)).cast("long").alias("iq_checksum"),
        F.sum(F.abs(F.col("q") * 127 - F.col("iq") * F.col("maxabs_q")))
        .cast("long")
        .alias("err_l1"),
    )
