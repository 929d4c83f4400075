"""Product quantization (PQ) — the compression half of the standard
100 TB ANN layout (IVF-PQ: coarse cells from ``similarity.knn_ivf``'s
quantizer + PQ codes inside each cell; Jégou et al., "Product
Quantization for Nearest Neighbor Search", public literature).

A 64-dim float32 embedding is 256 B; its PQ code at m=8 subvectors ×
256-centroid codebooks is 8 B — a 32× compression that lets a
billion-vector index live in cluster memory. Search uses asymmetric
distance computation (ADC): the QUERY stays exact, and per query a
(m × k) lookup table of partial squared distances to every codebook
centroid is built once; each corpus vector's approximate distance is
then m table lookups summed — no float math per corpus vector.

Spark shapes (design for the 100 TB case):
- **train**: m independent MLlib KMeans fits, one per subvector block
  (each a distributed job over the corpus slice; at scale train on a
  sample — KMeans converges on far less data than the corpus).
- **encode**: one scan; codes are computed per subvector by a
  broadcast nearest-centroid argmin (the codebook is m×k×(dim/m)
  doubles ≈ KBs — always broadcastable).
- **search (ADC)**: corpus codes explode to (vec_id, sub, code) — m
  small ints per vector; the per-query LUT (m×k rows) broadcast-joins
  on (sub, code); per-vector distances are a map-side-combining sum
  keyed on (query_id, vec_id). No corpus-side float vectors move.

Reference scope note: the reference engine (dollarkillerx/tidb-cdc)
has no vector surface; this is north-star pipeline surface, same
contract style as functions/similarity.py. No SQL oracle (KMeans is
not SQL-expressible) — correctness is pinned by recall-vs-brute-force
and reconstruction-error tests, like knn_lsh/knn_ivf.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tidb_cdc_spark.functions.sampling import sampled_train as _sampled_train
from tidb_cdc_spark.functions.similarity import as_double
from tidb_cdc_spark.operators.windows import topk_per_group


def pq_train(
    corpus: DataFrame,
    m: int = 4,
    k: int = 16,
    vec_col: str = "embedding",
    seed: int = 7,
    train_fraction: float = 1.0,
) -> np.ndarray:
    """Train per-subvector codebooks: ``m`` independent KMeans fits
    over the corpus's subvector blocks, submitted CONCURRENTLY —
    the fits share no state (distinct seeds, distinct column
    slices), and Spark schedules jobs from multiple driver threads
    side by side, so wall-clock is the slowest single fit instead of
    the sum (the dominant cost of the OPQ/PQ pipelines on small-job
    latency, and free overlap on a real cluster). ``train_fraction``
    < 1 fits every codebook on a deterministic seeded sample (encode
    still covers every vector) — the 100 TB shape, where codebooks
    converge on a sliver of the corpus. Returns the codebook tensor
    of shape (m, k, dim/m) — kilobytes, held driver-side and
    broadcast into encode/search closures."""
    from concurrent.futures import ThreadPoolExecutor

    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    head = corpus.select(as_double(F.col(vec_col))).first()
    if head is None or head[0] is None:
        raise ValueError(f"pq_train: corpus is empty or {vec_col!r} is null")
    dim = len(head[0])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    d_sub = dim // m
    base = _sampled_train(
        corpus.select(as_double(F.col(vec_col)).alias("_v")),
        train_fraction,
        k,
        seed,
    )

    def fit_block(j: int) -> "np.ndarray":
        sub = base.select(
            array_to_vector(
                F.slice(F.col("_v"), j * d_sub + 1, d_sub)
            ).alias("_fv")
        )
        km = KMeans(k=k, seed=seed + j, maxIter=10, featuresCol="_fv").fit(sub)
        return np.stack([np.asarray(c) for c in km.clusterCenters()])

    with ThreadPoolExecutor(max_workers=m) as ex:
        books = list(ex.map(fit_block, range(m)))
    return np.stack(books)  # (m, k, d_sub)


def pq_encode(
    corpus: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>) — each subvector replaced by the index
    of its nearest codebook centroid. One scan, Arrow-batched numpy
    argmin against the broadcast codebook tensor."""
    from pyspark.sql.functions import pandas_udf

    m, k, d_sub = codebooks.shape
    cb = codebooks  # captured in the closure → task broadcast

    @pandas_udf("array<int>")
    def encode(vecs: pd.Series) -> pd.Series:
        M = np.stack(vecs.to_numpy())  # (n, dim)
        out = np.empty((M.shape[0], m), dtype=np.int32)
        for j in range(m):
            block = M[:, j * d_sub : (j + 1) * d_sub]  # (n, d_sub)
            # ||x−c||² = ||x||² − 2x·c + ||c||²; ||x||² constant per row
            d2 = -2.0 * (block @ cb[j].T) + (cb[j] * cb[j]).sum(1)
            out[:, j] = np.argmin(d2, axis=1)
        return pd.Series([row.tolist() for row in out])

    return corpus.select(
        F.col(id_col), encode(as_double(F.col(vec_col))).alias("codes")
    )


def pq_knn_adc(
    queries: DataFrame,
    codes: DataFrame,
    codebooks: np.ndarray,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k by asymmetric distance computation over PQ
    codes: per query build the (sub, code) → partial-squared-distance
    LUT (m×k rows, exact query side), broadcast-join it against the
    exploded corpus codes, and sum per (query, vector).

    Output: (query_id, neighbor_id, rank) — rank 1 = nearest, ties
    broken by neighbor_id (same contract as knn_lsh/knn_ivf).
    """
    from pyspark.sql.functions import pandas_udf

    m, kk, d_sub = codebooks.shape
    cb = codebooks

    @pandas_udf("array<double>")
    def lut(vecs: pd.Series) -> pd.Series:
        M = np.stack(vecs.to_numpy())  # (n, dim)
        out = np.empty((M.shape[0], m * kk))
        for j in range(m):
            block = M[:, j * d_sub : (j + 1) * d_sub]
            out[:, j * kk : (j + 1) * kk] = (
                (block * block).sum(1, keepdims=True)
                - 2.0 * (block @ cb[j].T)
                + (cb[j] * cb[j]).sum(1)
            )
        return pd.Series([row.tolist() for row in out])

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.posexplode(lut(as_double(F.col(vec_col)))).alias("_slot", "_pd"),
    ).select(
        "query_id",
        (F.col("_slot") / kk).cast("int").alias("_sub"),
        (F.col("_slot") % kk).alias("_code"),
        "_pd",
    )
    c = codes.select(
        F.col(id_col).alias("neighbor_id"),
        F.posexplode("codes").alias("_sub", "_code"),
    )
    scored = (
        c.join(F.broadcast(q), ["_sub", "_code"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("_pd").alias("_d2"), F.count(F.lit(1)).alias("_nsub"))
        # a vector scores only if every subvector matched a LUT row
        # (they always do — the LUT is dense — but the guard keeps the
        # semantics explicit if a caller prunes the LUT)
        .filter(F.col("_nsub") == m)
    )
    return topk_per_group(
        scored,
        ["query_id"],
        [F.col("_d2").asc(), F.col("neighbor_id").asc()],
        k,
        rank_col="rank",
    ).select("query_id", "neighbor_id", "rank")


def _ivfpq_build(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    n_cells: int,
    m: int,
    k_codes: int,
    seed: int,
    train_fraction: float = 1.0,
) -> tuple[np.ndarray, np.ndarray, DataFrame]:
    """Shared IVF-PQ build phase: coarse k-means cells, RESIDUAL
    encoding (vector − cell centroid — the classic accuracy trick:
    residuals are small and centered, so the codebooks spend their
    resolution where the data is), PQ codebooks over residuals.
    Returns ``(centers (n_cells, dim), books (m, k, d_sub),
    codes (id, _cell, codes array<int>))``."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql.functions import pandas_udf

    c = corpus.select(
        F.col(id_col), as_double(F.col(vec_col)).alias("_cv")
    ).withColumn("_fv", array_to_vector(F.col("_cv")))
    km = KMeans(k=n_cells, seed=seed, maxIter=10, featuresCol="_fv").fit(
        _sampled_train(c, train_fraction, n_cells, seed)
    )
    centers = np.stack([np.asarray(ctr) for ctr in km.clusterCenters()])

    assigned = km.transform(c).select(
        id_col, "_cv", F.col(km.getPredictionCol()).alias("_cell")
    )

    @pandas_udf("array<double>")
    def residual(vecs: pd.Series, cells: pd.Series) -> pd.Series:
        M = np.stack(vecs.to_numpy()) - centers[cells.to_numpy()]
        return pd.Series([row.tolist() for row in M])

    from tidb_cdc_spark.session import materialize

    # materialized: pq_train scans the residuals m times (one KMeans
    # fit per subvector), pq_encode once, the cell re-join once — the
    # assignment transform + residual UDF must not re-execute per scan
    residuals = materialize(
        assigned.select(
            id_col,
            "_cell",
            residual(F.col("_cv"), F.col("_cell")).alias(vec_col),
        )
    )
    books = pq_train(
        residuals,
        m=m,
        k=k_codes,
        vec_col=vec_col,
        seed=seed,
        train_fraction=train_fraction,
    )
    codes = pq_encode(residuals, books, id_col=id_col, vec_col=vec_col).join(
        residuals.select(id_col, "_cell"), id_col
    )
    return centers, books, codes


def _ivfpq_search(
    queries: DataFrame,
    codes: DataFrame,
    centers: np.ndarray,
    books: np.ndarray,
    k: int,
    n_probe: int,
    id_col: str,
    vec_col: str,
    probed: DataFrame | None = None,
) -> DataFrame:
    """Shared IVF-PQ search phase over a (id, _cell, codes) table:
    per-(query, probed-cell) residual ADC LUT — (n_probe·m·k) rows
    per query, broadcast — joined against the exploded candidate
    codes on (cell, sub, code), then one map-side-combining sum per
    (query, vector). No corpus-side float vectors move.

    ``probed`` lets the caller hand in an already-computed
    (query_id, _qv, _cell) frame — ``ivfpq_probe_index`` materializes
    one for its partition-filter collect, and reusing it here keeps
    the probe UDF to a single pass over the query batch."""
    from pyspark.sql.functions import pandas_udf

    from tidb_cdc_spark.functions.similarity import _probe_cells_udf

    m_, kk, d_sub = books.shape
    cb = books

    @pandas_udf("array<double>")
    def cell_lut(vecs: pd.Series, cells: pd.Series) -> pd.Series:
        """ADC LUT of the query's RESIDUAL to one probed cell:
        m·k partial squared distances, flattened [sub-major]."""
        R = np.stack(vecs.to_numpy()) - centers[cells.to_numpy()]
        out = np.empty((R.shape[0], m_ * kk))
        for j in range(m_):
            block = R[:, j * d_sub : (j + 1) * d_sub]
            out[:, j * kk : (j + 1) * kk] = (
                (block * block).sum(1, keepdims=True)
                - 2.0 * (block @ cb[j].T)
                + (cb[j] * cb[j]).sum(1)
            )
        return pd.Series([row.tolist() for row in out])

    if probed is None:
        probe_cells = _probe_cells_udf(centers, n_probe)
        qv = queries.select(
            F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("_qv")
        )
        probed = qv.withColumn("_cell", F.explode(probe_cells(F.col("_qv"))))
    lut = probed.select(
        "query_id",
        "_cell",
        F.posexplode(cell_lut(F.col("_qv"), F.col("_cell"))).alias("_slot", "_pd"),
    ).select(
        "query_id",
        "_cell",
        (F.col("_slot") / kk).cast("int").alias("_sub"),
        (F.col("_slot") % kk).alias("_code"),
        "_pd",
    )
    cand = codes.select(
        F.col(id_col).alias("neighbor_id"),
        "_cell",
        F.posexplode("codes").alias("_sub", "_code"),
    )
    scored = (
        cand.join(F.broadcast(lut), ["_cell", "_sub", "_code"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("_pd").alias("_d2"), F.count(F.lit(1)).alias("_nsub"))
        .filter(F.col("_nsub") == m_)
    )
    return topk_per_group(
        scored,
        ["query_id"],
        [F.col("_d2").asc(), F.col("neighbor_id").asc()],
        k,
        rank_col="rank",
    ).select("query_id", "neighbor_id", "rank")


def ivfpq_knn(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    n_probe: int = 4,
    m: int = 4,
    k_codes: int = 16,
    seed: int = 7,
    train_fraction: float = 1.0,
) -> DataFrame:
    """The literal 100 TB ANN layout — IVF-PQ: coarse k-means cells
    prune the candidate set (probe ``n_probe`` of ``n_cells``), and
    PQ codes of the residuals rank candidates by ADC. In-memory
    build+search composition of ``_ivfpq_build`` + ``_ivfpq_search``;
    the persisted form is ``ivfpq_write_index``/``ivfpq_probe_index``.
    Output contract matches knn_lsh/knn_ivf/pq:
    (query_id, neighbor_id, rank).
    """
    centers, books, codes = _ivfpq_build(
        corpus, id_col, vec_col, n_cells, m, k_codes, seed, train_fraction
    )
    return _ivfpq_search(
        queries, codes, centers, books, k, n_probe, id_col, vec_col
    )


def ivfpq_write_index(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    m: int = 4,
    k_codes: int = 16,
    seed: int = 7,
    train_fraction: float = 1.0,
) -> None:
    """Persist the full IVF-PQ index:

    - ``<path>/codes`` — (id, codes) PARTITIONED BY cell: integer
      codes only, m bytes-ish per vector, one directory per cell —
      probing reads n_probe/n_cells of the bytes via directory-level
      partition pruning (plan-pinned in tests);
    - ``<path>/centroids`` — coarse centers (n_cells rows);
    - ``<path>/codebooks`` — residual PQ codebooks (m·k rows).

    Together with ``ivfpq_probe_index`` this is the billion-vector
    serving shape: the float corpus is never stored in the index at
    all — only codes + kilobytes of metadata.
    """
    centers, books, codes = _ivfpq_build(
        corpus, id_col, vec_col, n_cells, m, k_codes, seed, train_fraction
    )
    spark = corpus.sparkSession
    (
        codes.withColumnRenamed("_cell", "cell")
        .repartition("cell")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(f"{path}/codes")
    )
    spark.createDataFrame(
        [(i, [float(x) for x in ctr]) for i, ctr in enumerate(centers)],
        "cell int, center array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")
    mm, kk, _ = books.shape
    spark.createDataFrame(
        [
            (j, c, [float(x) for x in books[j, c]])
            for j in range(mm)
            for c in range(kk)
        ],
        "sub int, code int, center array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/codebooks")


def ivfpq_probe_index(
    spark,
    path: str,
    queries: DataFrame,
    k: int,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k search against a persisted ``ivfpq_write_index`` layout.

    Like ``similarity.ivf_probe_index``, the probed-cell set is
    computed from the QUERY batch (≤ n_cells ids — metadata-sized)
    and planted as a static ``cell IN (…)`` partition filter on the
    codes scan, so unprobed directories are never listed or read;
    ADC then ranks candidates from codes alone.
    """
    from tidb_cdc_spark.functions.similarity import _probe_cells_udf

    crows = spark.read.parquet(f"{path}/centroids").orderBy("cell").collect()
    centers = np.stack([np.asarray(r.center) for r in crows])
    brows = spark.read.parquet(f"{path}/codebooks").orderBy("sub", "code").collect()
    mm = max(r.sub for r in brows) + 1
    kk = max(r.code for r in brows) + 1
    books = np.stack(
        [
            np.stack([np.asarray(r.center) for r in brows if r.sub == j])
            for j in range(mm)
        ]
    )
    assert books.shape[:2] == (mm, kk)

    from tidb_cdc_spark.functions.similarity import _probe_cells_udf
    from tidb_cdc_spark.session import materialize

    probe_cells = _probe_cells_udf(centers, n_probe)
    # materialized: one probe-UDF pass serves both the cell collect
    # and the ADC search join
    qd = materialize(
        queries.select(
            F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("_qv")
        ).withColumn("_cell", F.explode(probe_cells(F.col("_qv"))))
    )
    cells = sorted(r._cell for r in qd.select("_cell").distinct().collect())
    codes = (
        spark.read.parquet(f"{path}/codes")
        .filter(F.col("cell").isin(cells))
        .withColumnRenamed("cell", "_cell")
    )
    return _ivfpq_search(
        queries, codes, centers, books, k, n_probe, id_col, vec_col, probed=qd
    )


# --------------------------------------------------- parametric OPQ
def opq_eigenvalue_allocation(model, m: int) -> "np.ndarray":
    """Parametric OPQ rotation (Ge et al., "Optimized Product
    Quantization", CVPR'13 §4 — the non-iterative OPQ_P variant):
    permute the PCA-rotated axes so each of the ``m`` PQ subspaces
    receives a balanced PRODUCT of eigenvalues. PQ's per-subspace
    quantization error tracks subspace variance; plain PCA rotation
    concentrates variance in the first subspace (the worst possible
    allocation), so axes are dealt greedily — descending eigenvalue,
    each to the non-full subspace with the smallest current
    log-variance sum (log turns the product balance into a sum
    balance).

    ``model`` is a FULL-RANK ``pca.PcaModel`` (k = d). Returns the
    (d, d) rotation matrix R, rows = permuted principal axes. R is
    orthonormal (a permutation of an orthonormal basis), so rotation
    preserves L2 distances exactly — ADC in the rotated space ranks
    against the same true distances, just with better-conditioned
    codebooks.
    """
    comps = model.components
    ev = np.asarray(model.explained_variance, dtype=np.float64)
    d = comps.shape[0]
    if comps.shape != (d, ev.shape[0]) or d != comps.shape[1]:
        raise ValueError(
            f"opq_eigenvalue_allocation needs a full-rank model; got "
            f"components {comps.shape}"
        )
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m {m}")
    cap = d // m
    logs = np.log(np.maximum(ev, 1e-12))
    # Shift logs to be non-negative before the greedy: every bucket
    # holds exactly `cap` axes, so adding a constant to every item
    # shifts every bucket sum by cap·c — the balance objective is
    # shift-invariant, but the GREEDY is not: with all-negative logs
    # (eigenvalues < 1, the NORMAL case for unit-normalized
    # embeddings) "smallest sum" chases the bucket just appended to
    # and the allocation degenerates to the contiguous PCA split.
    logs = logs - logs.min()
    buckets: list[list[int]] = [[] for _ in range(m)]
    sums = np.zeros(m)
    for axis in range(d):  # ev already sorted descending by fit_pca
        open_ = [b for b in range(m) if len(buckets[b]) < cap]
        b = min(open_, key=lambda i: sums[i])
        buckets[b].append(axis)
        sums[b] += logs[axis]
    perm = [a for b in buckets for a in b]
    return np.ascontiguousarray(comps[perm, :])


def opq_knn_adc(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    m: int = 4,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
    train_fraction: float = 1.0,
) -> DataFrame:
    """PQ/ADC search in the OPQ_P-rotated space: full-rank PCA fit
    (one pass), eigenvalue-allocated rotation, Arrow-batched rotate
    of both sides, then the standard train/encode/ADC pipeline.
    Same output contract as ``pq_knn_adc``. The rotation is an
    orthonormal map shipped in the UDF closures (d² doubles ≈ 32 KB
    at d=64); at 100 TB the rotated codes are what you persist
    (``ivfpq_write_index`` applies unchanged to rotated input)."""
    from tidb_cdc_spark.functions.pca import PcaModel, fit_pca, project

    head = corpus.select(as_double(F.col(vec_col))).first()
    if head is None or head[0] is None:
        raise ValueError(f"opq_knn_adc: corpus empty or {vec_col!r} null")
    d = len(head[0])
    model = fit_pca(corpus, vec_col=vec_col, k=d)
    R = opq_eigenvalue_allocation(model, m)
    rot = PcaModel(
        mean=model.mean,
        components=R,
        explained_variance=model.explained_variance,
        total_variance=model.total_variance,
    )

    def rotate(df: DataFrame) -> DataFrame:
        return project(df, rot, vec_col=vec_col, out_col="_rv").select(
            F.col(id_col), F.col("_rv").alias(vec_col)
        )

    from tidb_cdc_spark.session import materialize

    # the rotated corpus feeds m KMeans fits + the encode scan:
    # materialized so the full-corpus rotation UDF runs once, not
    # m+1 times (same discipline as _ivfpq_build's residuals)
    rc, rq = materialize(rotate(corpus)), rotate(queries)
    books = pq_train(
        rc,
        m=m,
        k=n_codes,
        vec_col=vec_col,
        seed=seed,
        train_fraction=train_fraction,
    )
    codes = pq_encode(rc, books, id_col=id_col, vec_col=vec_col)
    return pq_knn_adc(rq, codes, books, k, id_col=id_col, vec_col=vec_col)
