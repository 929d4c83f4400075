"""Johnson-Lindenstrauss random projection (database-friendly ±1
variant, Achlioptas 2003, "Database-friendly random projections" —
public literature): reduce an embedding column to k dimensions by a
seeded ±1 sign matrix. The JL lemma guarantees pairwise distances
are preserved within (1±eps) for k = O(log n / eps²) — the cheap,
FIT-FREE alternative to PCA (functions/pca.py) when a pipeline needs
dimensionality reduction without a training pass (e.g. pre-shrinking
vectors before MinHash-style bucketing, or cutting shuffle width of
a downstream knn stage).

Exactness contract (repo convention, functions/centroids.py): the
input is quantized once to 2⁻²⁰ fixed point (``q_i = floor(x_i ·
2²⁰)`` as int64), and each output coordinate is an INTEGER signed
sum ``y_j = Σ_i s_ji · q_i`` — order-independent, so Spark and
DuckDB agree bit-for-bit. The sign matrix derives from md5 of
``"{seed}:{j}:{i}"`` computed DRIVER-SIDE into plain ±1 literals
embedded in both engines' plans — no engine hash function involved.
|y_j| ≤ d · 2²⁰ · max|x| — int64-safe for any realistic embedding
(d·max|x| < 2⁴³).

Scale shape (100 TB): the projection is a pure per-row expression —
zero shuffles, zero Python, no fitted model to broadcast (the k·d
sign literals live in the plan itself). Contrast with PCA: one
moment pass + driver eigh; JL needs nothing. Plan-pinned in
tests/test_plans.py.

Reference scope note: the reference engine (dollarkillerx/tidb-cdc,
cdc_manager.go:43-434) has no vector surface; north-star pipeline
operator.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: fixed-point scale shared with functions/centroids.py
_SCALE = 1 << 20


def jl_signs(d: int, k: int, seed: str = "jl-v1") -> list[list[int]]:
    """k×d ±1 sign matrix from md5 — deterministic and
    engine-independent (computed driver-side, embedded as literals
    in both the Spark plan and the DuckDB oracle)."""
    return [
        [
            1
            if int(
                hashlib.md5(f"{seed}:{j}:{i}".encode()).hexdigest()[:8], 16
            )
            & 1
            else -1
            for i in range(d)
        ]
        for j in range(k)
    ]


def random_project(
    vecs: DataFrame,
    d: int,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: str = "jl-v1",
) -> DataFrame:
    """(id, y_0 … y_{k-1}): exact integer JL projection of the
    fixed-point quantized vector through the seeded ±1 matrix.
    Callers needing the geometric estimate rescale by
    ``1/(2²⁰·sqrt(k))`` — kept OUT of the operator so the output
    stays integral (and the distance-preservation tests do exactly
    that rescale)."""
    q = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * F.lit(_SCALE)).cast("long"),
    )
    signs = jl_signs(d, k, seed)
    cols = [
        F.aggregate(
            F.zip_with(
                q,
                F.array(*[F.lit(s) for s in signs[j]]),
                lambda qi, s: s.cast("long") * qi,
            ),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ).alias(f"y_{j}")
        for j in range(k)
    ]
    return vecs.select(F.col(id_col), *cols)


def random_project_sql(
    d: int,
    k: int = 8,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: str = "jl-v1",
) -> str:
    """The DuckDB oracle for :func:`random_project` — same sign
    literals, same quantization, same integer sums."""
    signs = jl_signs(d, k, seed)
    q = (
        f"list_transform({vec_col}, x -> "
        f"CAST(FLOOR(CAST(x AS DOUBLE) * {_SCALE}) AS BIGINT))"
    )
    # CAST: DuckDB's list_sum yields DOUBLE; |y_j| ≤ d·2²⁰·max|x|
    # (< 2³⁵ for any realistic embedding) sits far inside the 2⁵³
    # exact-integer range, so the round-trip is lossless
    ys = ",\n       ".join(
        "CAST(list_sum(list_transform(list_zip(_q, ["
        + ",".join(str(s) for s in signs[j])
        + "]::BIGINT[]), r -> r[1] * r[2])) AS BIGINT) AS y_" + str(j)
        for j in range(k)
    )
    return (
        f"WITH t AS (SELECT {id_col}, {q} AS _q FROM {table})\n"
        f"SELECT {id_col},\n       {ys}\nFROM t ORDER BY {id_col}"
    )
