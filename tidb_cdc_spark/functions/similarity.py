"""Embedding similarity search: brute-force and LSH-bucketed ANN.

North-star operator (BASELINE.json). The dot product / norms are
native ``zip_with`` + ``aggregate`` expressions (JVM-side, no
Python); the scale path replaces the brute-force cross join with
random-hyperplane LSH bucketing so candidate generation becomes an
equi-join on bucket signatures.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tidb_cdc_spark.operators.windows import topk_per_group


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢbᵢ via zip_with + aggregate — sequential left fold, so the
    summation order (and thus the double result) is deterministic."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def as_double(vec: Column) -> Column:
    """Cast float32 vectors to double BEFORE arithmetic: fixing the
    promotion point makes results engine-independent."""
    return F.transform(vec, lambda x: x.cast("double"))


def knn_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Plan: broadcast the (small) query set against the corpus scan —
    no shuffle of the corpus — then a window top-k on query_id. This
    is the correct baseline: at 100 TB of corpus the scan is
    embarrassingly parallel and the only shuffle is the tiny
    (|queries| × k) candidate set after per-partition pruning. For
    large query sets, switch to ``knn_lsh``.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("_qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("_cv")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("score", cosine(F.col("_qv"), F.col("_cv")))
        .select("query_id", "neighbor_id", "score")
    )
    return topk_per_group(
        scored,
        ["query_id"],
        [F.col("score").desc(), F.col("neighbor_id").asc()],
        k,
        rank_col="rank",
    ).select("query_id", "neighbor_id", "rank")


def _hyperplane(dim: int, plane_idx: int) -> list[float]:
    """Deterministic pseudo-random hyperplane — a fixed public
    hash-free construction (no RNG state, reproducible everywhere):
    component i of plane p = sin(1e4 · (p·dim + i + 1))."""
    return [math.sin(1e4 * (plane_idx * dim + i + 1)) for i in range(dim)]


def lsh_signature(
    vec: Column, dim: int, n_planes: int = 12, plane_offset: int = 0
) -> Column:
    """Random-hyperplane (SimHash) bucket signature: bit p = sign of
    ⟨vec, plane_{offset+p}⟩. Cosine-similar vectors collide with
    probability (1 − θ/π)^n_planes per table."""
    bits = []
    for p in range(n_planes):
        plane = F.array(*[F.lit(x) for x in _hyperplane(dim, plane_offset + p)])
        bits.append(F.when(dot(vec, plane) >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def knn_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 10,
    n_tables: int = 4,
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate top-k: OR of ``n_tables`` hash tables, each an
    ``n_planes``-bit hyperplane signature; candidates = bucket
    collisions (equi-join on the signature), then exact cosine rank.

    ``multiprobe`` also probes every 1-bit-flip bucket of each QUERY
    signature (n_planes+1 probes per query per table) — the standard
    trick that buys large recall without more tables; the corpus side
    stays single-bucket, so corpus-side state is unchanged.

    Scale: replaces the O(|Q|·|C|) cross join with ``n_tables``
    equi-joins whose build side is the bucketed query set — shuffle
    is proportional to collisions, not to the corpus. This is the
    100 TB path; recall tunes with (n_planes, n_tables, multiprobe).
    """
    qd = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("_qv")
    )
    cd = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("_cv")
    )
    cands = None
    for t in range(n_tables):
        off = t * n_planes
        qs = qd.withColumn("_sig", lsh_signature(F.col("_qv"), dim, n_planes, off))
        if multiprobe:
            flips = F.array(
                F.col("_sig"),
                *[
                    F.concat(
                        F.substring("_sig", 1, p),
                        F.when(
                            F.substring("_sig", p + 1, 1) == "1", F.lit("0")
                        ).otherwise(F.lit("1")),
                        F.substring("_sig", p + 2, n_planes - p - 1),
                    )
                    for p in range(n_planes)
                ],
            )
            qs = qs.withColumn("_sig", F.explode(flips))
        cs = cd.withColumn("_sig", lsh_signature(F.col("_cv"), dim, n_planes, off))
        pair = cs.join(F.broadcast(qs), "_sig").filter(
            F.col("query_id") != F.col("neighbor_id")
        )
        cands = pair if cands is None else cands.unionByName(pair)
    scored = (
        cands.dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("score", cosine(F.col("_qv"), F.col("_cv")))
        .select("query_id", "neighbor_id", "score")
    )
    return topk_per_group(
        scored,
        ["query_id"],
        [F.col("score").desc(), F.col("neighbor_id").asc()],
        k,
        rank_col="rank",
    ).select("query_id", "neighbor_id", "rank")
