"""Distributed PCA over an embedding column — the dimensionality-
reduction pass a vector pipeline runs before ANN indexing / OPQ
(compress 64-d → 16-d, whiten for product quantization) and the
classic corpus-drift visualizer.

Spark-first shape: PCA needs only the d×d second-moment (Gram)
matrix and the mean — both are ONE pass of map-side partial sums.
``fit_pca`` computes per-Arrow-batch partials (n, Σx, Σxxᵀ) with
mapInPandas, reduces them INSIDE Spark (posexplode the flattened
partial → map-side-combining sum per position — the driver receives
exactly d²+d+1 scalars no matter the corpus size, never one partial
per batch), then eigendecomposes the d×d covariance on the driver
(d=64 ⇒ trivial). The projection is an Arrow-batched matmul with the
(k×d) component matrix shipped in the UDF closure (~8 KB).

Determinism: eigenvector signs are fixed by making each component's
largest-|entry| positive (eigh is deterministic up to sign);
components are ordered by descending eigenvalue with index
tie-break. The transform is a pure function of the fitted arrays.

Scale: the reduction shuffle carries (#partitions × (d²+d+1)) rows of
(pos, val) — independent of corpus size; at 100 TB nothing but the
scan touches the data. For d ≫ 10³ (where d² partials get heavy)
you'd switch to randomized-SVD sketching; out of scope here.

Reference scope note: the reference engine has no vector surface;
north-star pipeline op (contract style of functions/similarity.py).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tidb_cdc_spark.functions.similarity import as_double


@dataclass(frozen=True)
class PcaModel:
    mean: "np.ndarray"  # (d,)
    components: "np.ndarray"  # (k, d) rows = principal axes
    explained_variance: "np.ndarray"  # (k,) descending eigenvalues
    total_variance: float  # trace of the covariance

    @property
    def explained_ratio(self) -> "np.ndarray":
        if self.total_variance <= 0.0:
            return np.zeros_like(self.explained_variance)
        return self.explained_variance / self.total_variance


def moment_partials(embs: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """The distributed moment stage as a reusable (pos, val) frame:
    per-Arrow-batch partials of (n, Σx, Σxxᵀ) reduced in-Spark to
    exactly d²+d+1 scalar rows. Moments are exactly ADDITIVE — union
    two moment tables and re-sum by pos to get the moments of the
    concatenated corpora (the incremental/streaming PCA primitive;
    streaming/enrich.py::PcaMomentSink persists this table)."""
    src = embs.select(as_double(F.col(vec_col)).alias("_v"))

    def partials(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            M = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
            g = M.T @ M  # (d, d)
            flat = np.concatenate(
                ([float(len(M))], M.sum(axis=0), g.ravel())
            )
            yield pd.DataFrame(
                {"pos": np.arange(len(flat), dtype=np.int64), "val": flat}
            )

    return (
        src.mapInPandas(partials, "pos long, val double")
        .groupBy("pos")
        .agg(F.sum("val").alias("val"))
    )


def fit_pca(embs: DataFrame, vec_col: str = "embedding", k: int = 16) -> PcaModel:
    """One-pass distributed moment aggregation + driver-side eigh."""
    summed = moment_partials(embs, vec_col).collect()
    # exactly d²+d+1 scalars — metadata, not data
    vals = {r["pos"]: r["val"] for r in summed}
    return _model_from_moments(vals, k)


def _model_from_moments(vals: dict, k: int) -> PcaModel:
    """Driver-side model build from the (pos → val) moment scalars."""
    if not vals:
        raise ValueError("fit_pca: empty input")
    d = int(round((-1 + np.sqrt(1 + 4 * (len(vals) - 1))) / 2))
    flat = np.array([vals[i] for i in range(d * d + d + 1)])
    n, s, g = flat[0], flat[1 : d + 1], flat[d + 1 :].reshape(d, d)
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    cov = (cov + cov.T) / 2.0  # exact symmetry for eigh
    w, v = np.linalg.eigh(cov)  # ascending
    order = np.argsort(-w, kind="stable")[: min(k, d)]
    comps = v[:, order].T  # (k, d)
    # sign convention: largest-|entry| positive per component
    for row in comps:
        j = int(np.argmax(np.abs(row)))
        if row[j] < 0:
            row *= -1.0
    return PcaModel(
        mean=mean,
        components=np.ascontiguousarray(comps),
        explained_variance=np.maximum(w[order], 0.0),
        total_variance=float(max(np.trace(cov), 0.0)),
    )


def project(
    embs: DataFrame,
    model: PcaModel,
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Append ``out_col``: (x − mean) @ componentsᵀ, Arrow-batched."""
    from pyspark.sql.functions import pandas_udf

    mean = model.mean
    comp_t = np.ascontiguousarray(model.components.T)  # (d, k)

    @pandas_udf("array<double>")
    def proj(v: pd.Series) -> pd.Series:
        M = np.stack(v.to_numpy()).astype(np.float64) - mean
        P = M @ comp_t
        return pd.Series([row.tolist() for row in P])

    return embs.withColumn(out_col, proj(as_double(F.col(vec_col))))


def whiten(
    embs: DataFrame,
    model: PcaModel,
    vec_col: str = "embedding",
    out_col: str = "white",
    eps: float = 1e-8,
) -> DataFrame:
    """Append ``out_col``: PCA whitening — project onto the principal
    axes and scale each coordinate to unit variance,
    ``(x − mean) @ componentsᵀ · diag(1/√(λᵢ + eps))``. The standard
    embedding preprocessing before cosine ANN / k-means when raw
    dimensions have wildly different variances (decorrelates and
    equalizes them; Bishop PRML §12.1.3, public literature). A pure
    per-vector map like ``project`` — one Arrow-batched pass, model
    broadcast in the closure (k·d + k doubles ≈ KBs) — so a planted
    exact copy whitens identically (the audit contract). ``eps``
    guards zero-variance axes; components with λ ≤ eps contribute a
    ~zero coordinate instead of a blow-up."""
    from pyspark.sql.functions import pandas_udf

    mean = model.mean
    scale = 1.0 / np.sqrt(model.explained_variance + eps)
    comp_w = np.ascontiguousarray(model.components.T * scale)  # (d, k)

    @pandas_udf("array<double>")
    def wproj(v: pd.Series) -> pd.Series:
        M = np.stack(v.to_numpy()).astype(np.float64) - mean
        P = M @ comp_w
        return pd.Series([row.tolist() for row in P])

    return embs.withColumn(out_col, wproj(as_double(F.col(vec_col))))
