"""Thirteenth wave: semantic deduplication (SemDeDup) and
distributed PCA — the embedding-space curation pair (prune
semantically redundant examples; reduce dimension before ANN/OPQ).

Oracle strategy (conventions of queries/audits.py):
- the raw SemDeDup prune and the PCA projection are k-means/eigen
  outputs — not SQL-expressible, registered rows-only;
- each gets a planted-copy AUDIT that DuckDB can verify: an exact
  vector copy lands in the same k-means cell (identical distances →
  identical argmin) at cosine 1 to its lower-id original, so
  SemDeDup MUST prune it; PCA projection is a pure function of the
  vector, so copy and original project identically (within 1e-6 —
  BLAS batching may differ in the last bits across Arrow batches);
- the covariance PCA consumes is pinned EXACTLY: fixed-point
  quantized components (floor(x·2^20), the functions/centroids.py
  convention), integer/decimal sums (order-independent), cast to
  double in an identical op order in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tidb_cdc_spark.functions import pca as P
from tidb_cdc_spark.functions import pq as PQF
from tidb_cdc_spark.functions import semdedup as SD
from tidb_cdc_spark.functions.centroids import SCALE
from tidb_cdc_spark.queries.audits import _N_VECS, _embs_with_copies
from tidb_cdc_spark.queries.llm import _embs

# ------------------------------------------------ semantic dedup


def semantic_dedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup prune list: every vector flagged as a within-cell
    semantic duplicate of a lower-id vector (cosine ≥ 0.95), with its
    keeper. The synthetic embeddings are mutually near-orthogonal, so
    (same convention as ``dedup_embedding_cosine``) the operator is
    demonstrated on planted scaled copies of the first 50 vectors —
    scaling preserves cosine exactly, and a 0.1%-scaled copy sits
    0.1% away in L2, sharing the original's k-means cell unless the
    original lies exactly on a Voronoi boundary. Rows-only (k-means);
    the hard contract is oracle-checked by ``semantic_dedup_audit``
    (EXACT copies, where the same-cell argument is airtight)."""
    e = _embs(spark, sf_dir).select("vec_id", "embedding")
    planted = e.filter(F.col("vec_id") < 50).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform(F.col("embedding"), lambda x: x * F.lit(1.001)).alias(
            "embedding"
        ),
    )
    res = SD.semantic_dedup(
        e.unionByName(planted),
        n_cells=16,
        threshold=0.95,
        # seeded sample for the k-means fit (assignment still covers
        # every vector) — at 100 TB a full-corpus fit dominates the
        # job; same knob the PQ/IVF-PQ/OPQ declared queries pass
        train_fraction=0.25,
    )
    return (
        res.filter(F.col("is_dup"))
        .select(
            "vec_id",
            "cell",
            "dup_of",
            F.round("max_sim", 4).alias("sim"),
            "truncated",
        )
        .orderBy("vec_id")
    )


def semantic_dedup_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Planted-copy contract: an exact copy has identical distance to
    every centroid (same cell by deterministic argmin) and cosine 1
    to its lower-id original — semantic_dedup must flag it."""
    e, off = _embs_with_copies(spark, sf_dir)
    res = SD.semantic_dedup(
        e.select("vec_id", "embedding"), n_cells=16, threshold=0.95
    )
    copies = (
        res.filter(F.col("vec_id") >= F.lit(off))
        .filter(F.col("vec_id") < F.lit(off) + _N_VECS)
        .select(
            (F.col("vec_id") - F.lit(off)).alias("vec_id"),
            F.col("is_dup").alias("_d"),
        )
    )
    spine = _embs(spark, sf_dir).filter(F.col("vec_id") < _N_VECS).select("vec_id")
    return (
        spine.join(copies, "vec_id", "left")
        .select(
            "vec_id",
            F.col("_d").isNotNull().alias("found"),
            F.coalesce(F.col("_d"), F.lit(False)).alias("planted_pruned"),
        )
        .orderBy("vec_id")
    )


_SEMDEDUP_AUDIT_SQL = """
SELECT vec_id, TRUE AS found, TRUE AS planted_pruned
FROM embeddings WHERE vec_id < 5 ORDER BY vec_id
"""

# ------------------------------------------------ distributed PCA

#: covariance grid: leading dims pinned by the oracle
_N_DIMS = 4


def embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leading 4×4 block of the embedding covariance matrix — the
    exact statistic ``fit_pca`` diagonalizes, in fixed point so both
    engines hash identically: integral component sums, one
    decimal-exact cross-moment, doubles only for the final
    mean-product subtraction (identical op order)."""
    from tidb_cdc_spark.session import read_table

    # Spark plan: ONE scan + a scalar aggregate of 1+d+d² partial
    # sums (map-side combined — nothing data-sized shuffles), then
    # the 1-row result is exploded to the 16 (i,j) grid rows. The
    # oracle SQL states the same sums via the readable unnest +
    # self-join form; values are identical (order-independent
    # integer/decimal sums), the physical shapes deliberately differ.
    e = read_table(spark, sf_dir, "embeddings")
    base = e.select(
        *[
            F.floor(
                F.element_at(F.col("embedding"), i + 1).cast("double")
                * F.lit(SCALE)
            )
            .cast("long")
            .alias(f"q{i}")
            for i in range(_N_DIMS)
        ]
    )
    aggs = [F.count(F.lit(1)).alias("n")]
    aggs += [F.sum(f"q{i}").alias(f"s{i}") for i in range(_N_DIMS)]
    aggs += [
        F.sum(
            F.col(f"q{i}").cast("decimal(19,0)")
            * F.col(f"q{j}").cast("decimal(19,0)")
        ).alias(f"p{i}_{j}")
        for i in range(_N_DIMS)
        for j in range(_N_DIMS)
    ]
    grid = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("i"),
                    F.lit(j).alias("j"),
                    F.col("n").alias("n_vectors"),
                    F.col(f"s{i}").alias("sx"),
                    F.col(f"s{j}").alias("sy"),
                    F.col(f"p{i}_{j}").alias("_sxy"),
                )
                for i in range(_N_DIMS)
                for j in range(_N_DIMS)
            ]
        )
    )
    g = base.agg(*aggs).select(grid.alias("_g")).select("_g.*")
    n = F.col("n_vectors").cast("double")
    cov_q = F.col("_sxy").cast("double") / n - (
        F.col("sx").cast("double") / n
    ) * (F.col("sy").cast("double") / n)
    return g.select(
        "i",
        "j",
        "n_vectors",
        "sx",
        "sy",
        F.round(cov_q / F.lit(float(SCALE)) / F.lit(float(SCALE)), 8).alias(
            "cov"
        ),
    ).orderBy("i", "j")


_COVARIANCE_SQL = f"""
WITH comp AS (
  SELECT vec_id, i - 1 AS pos,
         CAST(floor(CAST(embedding[i] AS DOUBLE) * {SCALE})
              AS BIGINT) AS q
  FROM embeddings, range(1, {_N_DIMS + 1}) t(i)
), g AS (
  SELECT a.pos AS i, b.pos AS j,
         CAST(COUNT(*) AS BIGINT) AS n_vectors,
         CAST(SUM(a.q) AS BIGINT) AS sx,
         CAST(SUM(b.q) AS BIGINT) AS sy,
         SUM(CAST(a.q AS DECIMAL(19,0)) * CAST(b.q AS DECIMAL(19,0))) AS sxy
  FROM comp a JOIN comp b USING (vec_id)
  GROUP BY a.pos, b.pos
)
SELECT i, j, n_vectors, sx, sy,
       ROUND((CAST(sxy AS DOUBLE) / CAST(n_vectors AS DOUBLE)
              - (CAST(sx AS DOUBLE) / CAST(n_vectors AS DOUBLE))
                * (CAST(sy AS DOUBLE) / CAST(n_vectors AS DOUBLE)))
             / {float(SCALE)} / {float(SCALE)}, 8) AS cov
FROM g ORDER BY i, j
"""


def embedding_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Project the corpus onto its top-8 principal axes (one-pass
    distributed moments + driver eigh + Arrow-batched matmul). Rows-
    only: eigenvectors aren't SQL-expressible; the projection
    contract is oracle-checked by ``embedding_pca_audit`` and the
    covariance input by ``embedding_covariance``."""
    e = _embs(spark, sf_dir).select("vec_id", "embedding")
    model = P.fit_pca(e, k=8)
    proj = P.project(e, model)
    return proj.select(
        "vec_id",
        *[
            F.round(F.element_at(F.col("pca"), d + 1), 4).alias(f"p{d}")
            for d in range(4)
        ],
    ).orderBy("vec_id")


def embedding_pca_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Planted-copy + model-invariant contract: a copy projects onto
    the same coordinates as its original (pure function of the
    vector, 1e-6 tolerance for BLAS batching); components are
    orthonormal; explained variance is non-increasing and the ratios
    sum to ≤ 1."""
    import numpy as np

    e, off = _embs_with_copies(spark, sf_dir)
    e = e.select("vec_id", "embedding")
    model = P.fit_pca(e, k=8)
    gram = model.components @ model.components.T
    ortho_ok = bool(
        np.abs(gram - np.eye(gram.shape[0])).max() < 1e-8
    )
    ev = model.explained_variance
    var_ok = bool(np.all(np.diff(ev) <= 1e-12) and model.explained_ratio.sum() <= 1.0 + 1e-9)

    ids = e.filter(
        (F.col("vec_id") < _N_VECS)
        | (
            (F.col("vec_id") >= F.lit(off))
            & (F.col("vec_id") < F.lit(off) + _N_VECS)
        )
    )
    proj = P.project(ids, model)
    orig = proj.filter(F.col("vec_id") < _N_VECS).select(
        "vec_id", F.col("pca").alias("_pa")
    )
    copy = proj.filter(F.col("vec_id") >= F.lit(off)).select(
        (F.col("vec_id") - F.lit(off)).alias("vec_id"),
        F.col("pca").alias("_pb"),
    )
    diff = F.array_max(
        F.zip_with("_pa", "_pb", lambda x, y: F.abs(x - y))
    )
    return (
        orig.join(copy, "vec_id", "left")
        .select(
            "vec_id",
            F.col("_pb").isNotNull().alias("found"),
            F.coalesce(diff < 1e-6, F.lit(False)).alias("proj_same"),
            F.lit(ortho_ok).alias("ortho_ok"),
            F.lit(var_ok).alias("var_desc"),
        )
        .orderBy("vec_id")
    )


_PCA_AUDIT_SQL = """
SELECT vec_id, TRUE AS found, TRUE AS proj_same,
       TRUE AS ortho_ok, TRUE AS var_desc
FROM embeddings WHERE vec_id < 5 ORDER BY vec_id
"""




def embedding_whiten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 4 (rounded) of the 8 PCA-whitened coordinates per
    vector (same emit shape as ``embedding_pca_project``; decorrelate +
    unit-variance — the standard preprocessing before cosine ANN /
    k-means on anisotropic embeddings; functions/pca.py::whiten).
    Rows-only like ``embedding_pca_project`` (eigenvectors aren't
    SQL-expressible); the contract is oracle-checked by
    ``embedding_whiten_audit``."""
    e = _embs(spark, sf_dir).select("vec_id", "embedding")
    model = P.fit_pca(e, k=8)
    w = P.whiten(e, model)
    return w.select(
        "vec_id",
        *[
            F.round(F.element_at(F.col("white"), d + 1), 4).alias(f"w{d}")
            for d in range(4)
        ],
    ).orderBy("vec_id")


def embedding_whiten_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitening contract, oracle-gated: (a) a planted exact copy
    whitens to identical coordinates (pure per-vector map, 1e-6 BLAS
    tolerance); (b) every whitened component has population variance
    ≈ 1 over the fit corpus — THE whitening property: var along axis
    i is λᵢ, scaled by 1/(λᵢ+eps) ⇒ λᵢ/(λᵢ+eps) ≈ 1 (checked at
    1e-3). A regression in the moment pipeline, eigh plumbing, or
    the scaling flips a boolean and fails the hash."""
    e, off = _embs_with_copies(spark, sf_dir)
    e = e.select("vec_id", "embedding")
    model = P.fit_pca(e, k=8)
    w = P.whiten(e, model)
    var_row = (
        w.select(F.posexplode("white").alias("_d", "_v"))
        .groupBy("_d")
        .agg(F.var_pop("_v").alias("_var"))
        .agg(
            F.min(
                (F.abs(F.col("_var") - 1.0) < 1e-3).cast("int")
            ).alias("_ok")
        )
        .collect()
    )
    unit_var_ok = bool(var_row[0]["_ok"] == 1)

    ids = w.filter(
        (F.col("vec_id") < _N_VECS)
        | (
            (F.col("vec_id") >= F.lit(off))
            & (F.col("vec_id") < F.lit(off) + _N_VECS)
        )
    )
    orig = ids.filter(F.col("vec_id") < _N_VECS).select(
        "vec_id", F.col("white").alias("_wa")
    )
    copy = ids.filter(F.col("vec_id") >= F.lit(off)).select(
        (F.col("vec_id") - F.lit(off)).alias("vec_id"),
        F.col("white").alias("_wb"),
    )
    diff = F.array_max(
        F.zip_with("_wa", "_wb", lambda x, y: F.abs(x - y))
    )
    return (
        orig.join(copy, "vec_id", "left")
        .select(
            "vec_id",
            F.col("_wb").isNotNull().alias("found"),
            F.coalesce(diff < 1e-6, F.lit(False)).alias("white_same"),
            F.lit(unit_var_ok).alias("unit_var_ok"),
        )
        .orderBy("vec_id")
    )


_WHITEN_AUDIT_SQL = """
SELECT vec_id, TRUE AS found, TRUE AS white_same, TRUE AS unit_var_ok
FROM embeddings WHERE vec_id < 5 ORDER BY vec_id
"""


# ------------------------------------------------ parametric OPQ


def knn_opq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-5 via OPQ_P (Ge et al. CVPR'13): eigenvalue-allocated
    PCA rotation balances per-subspace variance before the standard
    4×16 PQ/ADC pipeline. Rows-only (KMeans + eigh); retrieval is
    pinned by the clustered-recall test and ``knn_opq_audit``."""
    e = _embs(spark, sf_dir).select("vec_id", "embedding")
    q = e.filter(F.col("vec_id") < 5)
    return PQF.opq_knn_adc(q, e, k=5, train_fraction=0.25).orderBy(
        "query_id", "rank"
    )


def knn_opq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Planted-copy retrieval contract for OPQ: rotation is a pure
    per-vector map, so an exact copy rotates to the same point,
    encodes to a (near-)identical code, and sits at the minimal ADC
    distance ⇒ must appear in the audit top-k."""
    from tidb_cdc_spark.queries.audits import (
        _AUDIT_K,
        _knn_planted_report,
        _vec_spine,
    )

    e, off = _embs_with_copies(spark, sf_dir)
    q = e.filter(F.col("vec_id") < _N_VECS)
    approx = PQF.opq_knn_adc(
        q, e.select("vec_id", "embedding"), k=_AUDIT_K, train_fraction=0.25
    )
    return _knn_planted_report(approx, _vec_spine(spark, sf_dir), off)


_OPQ_AUDIT_SQL = """
SELECT vec_id AS query_id, TRUE AS planted_found
FROM embeddings WHERE vec_id < 5 ORDER BY query_id
"""


# ------------------------------------------- hard-negative mining


def rag_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive retriever training: for
    each query vector, the top-5 most-similar corpus vectors with a
    DIFFERENT label — near-misses that teach the margin (random
    negatives are trivially separable). Plan = the knn_bruteforce
    shape (broadcast queries over an unshuffled corpus scan + window
    top-k) with the label-mismatch predicate applied pre-rank; at
    100 TB the brute-force arm swaps for ``knn_lsh``/IVF with a
    post-filter, same contract."""
    from tidb_cdc_spark.functions.similarity import as_double, cosine
    from tidb_cdc_spark.operators.windows import topk_per_group

    e = _embs(spark, sf_dir)
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        as_double(F.col("embedding")).alias("_qv"),
        F.col("label").alias("_qlabel"),
    )
    c = e.select(
        F.col("vec_id").alias("neighbor_id"),
        as_double(F.col("embedding")).alias("_cv"),
        F.col("label").alias("neg_label"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .filter(F.col("neg_label") != F.col("_qlabel"))
        .withColumn("score", cosine(F.col("_qv"), F.col("_cv")))
        .select("query_id", "neighbor_id", "neg_label", "score")
    )
    return (
        topk_per_group(
            scored,
            ["query_id"],
            [F.col("score").desc(), F.col("neighbor_id").asc()],
            5,
            rank_col="rank",
        )
        .select("query_id", "neighbor_id", "neg_label", "rank")
        .orderBy("query_id", "rank")
    )


_HARD_NEG_SQL = """
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv, label
  FROM embeddings WHERE vec_id < 5
), c AS (
  SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv, label
  FROM embeddings
), scored AS (
  SELECT query_id, neighbor_id, c.label AS neg_label,
         list_inner_product(qv, cv)
           / (sqrt(list_inner_product(qv, qv))
              * sqrt(list_inner_product(cv, cv))) AS score
  FROM q, c
  WHERE query_id <> neighbor_id AND q.label <> c.label
), ranked AS (
  SELECT query_id, neighbor_id, neg_label,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY score DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, neg_label, rank
FROM ranked WHERE rank <= 5
ORDER BY query_id, rank
"""




# --------------------------------------- retrieve-then-rerank cascade


def rag_rerank_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cross-encoder SERVING shape (retrieve cheap, rerank
    expensive): stage 1 retrieves top-20 candidates per query by
    dense cosine (exact brute force here; at 100 TB this stage swaps
    for knn_lsh / ivfpq_probe_index — the rerank stage is unchanged),
    stage 2 re-scores ONLY those 20 pairs with a PAIRWISE scorer over
    the raw texts and keeps top-5. The scorer is integral token-set
    Jaccard (|A∩B|·10⁶ div |A∪B|) — a deterministic stand-in with
    the same data flow as a model cross-encoder (per-pair scoring of
    query/candidate TEXT, non-factorizable into vector products);
    a model scorer drops into the same per-pair frame as an Arrow
    mapInPandas. Cost shape is the point: the expensive scorer
    touches k·|queries| pairs, never the corpus. Fully exact ⇒
    DuckDB oracle; ties broken by neighbor_id.
    """
    from tidb_cdc_spark.functions.similarity import knn_bruteforce
    from tidb_cdc_spark.operators.windows import topk_per_group
    from tidb_cdc_spark.queries.llm import _docs

    e = _embs(spark, sf_dir).select("vec_id", "embedding")
    q = e.filter(F.col("vec_id") < 5)
    cand = knn_bruteforce(q, e, k=20).select("query_id", "neighbor_id")
    toks = _docs(spark, sf_dir).select(
        "doc_id",
        F.array_distinct(
            F.filter(
                F.split(F.lower(F.col("text")), r"\s+"),
                lambda x: x != "",
            )
        ).alias("ts"),
    )
    j = (
        cand.join(
            toks.select(
                F.col("doc_id").alias("query_id"), F.col("ts").alias("_qt")
            ),
            "query_id",
        )
        .join(
            toks.select(
                F.col("doc_id").alias("neighbor_id"),
                F.col("ts").alias("_ct"),
            ),
            "neighbor_id",
        )
        .select(
            "query_id",
            "neighbor_id",
            # BIGINT before the ×10⁶: size() is INT and Spark runs
            # ANSI — a pair sharing ≥2148 tokens would overflow INT
            F.expr(
                "CAST(size(array_intersect(_qt, _ct)) AS BIGINT) * 1000000 "
                "DIV GREATEST(size(array_union(_qt, _ct)), 1)"
            ).alias("jaccard_ppm"),
        )
    )
    return topk_per_group(
        j,
        ["query_id"],
        [F.col("jaccard_ppm").desc(), F.col("neighbor_id").asc()],
        5,
        rank_col="rank",
    ).select("query_id", "neighbor_id", "jaccard_ppm", "rank").orderBy(
        "query_id", "rank"
    )


_RERANK_SQL = r"""
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < 5
), c AS (
  SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
  FROM embeddings
), scored AS (
  SELECT query_id, neighbor_id,
         list_inner_product(qv, cv)
           / (sqrt(list_inner_product(qv, qv))
              * sqrt(list_inner_product(cv, cv))) AS score
  FROM q, c WHERE query_id <> neighbor_id
), cand AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY score DESC, neighbor_id) AS r
    FROM scored
  ) WHERE r <= 20
), tok AS (
  SELECT doc_id,
         list_distinct(list_filter(string_split_regex(lower(text), '\s+'),
                                   x -> x <> '')) AS ts
  FROM documents
), j AS (
  SELECT query_id, neighbor_id,
         CAST(len(list_intersect(tq.ts, tc.ts)) * 1000000
              // GREATEST(len(list_distinct(list_concat(tq.ts, tc.ts))), 1)
              AS BIGINT) AS jaccard_ppm
  FROM cand
  JOIN tok tq ON tq.doc_id = cand.query_id
  JOIN tok tc ON tc.doc_id = cand.neighbor_id
), rr AS (
  SELECT query_id, neighbor_id, jaccard_ppm,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY jaccard_ppm DESC, neighbor_id)
              AS INTEGER) AS rank
  FROM j
)
SELECT query_id, neighbor_id, jaccard_ppm, rank
FROM rr WHERE rank <= 5 ORDER BY query_id, rank
"""


QUERIES = {
    "semantic_dedup_prune": semantic_dedup_prune,
    "semantic_dedup_audit": semantic_dedup_audit,
    "embedding_covariance": embedding_covariance,
    "embedding_pca_project": embedding_pca_project,
    "embedding_pca_audit": embedding_pca_audit,
    "embedding_whiten": embedding_whiten,
    "embedding_whiten_audit": embedding_whiten_audit,
    "knn_opq_adc": knn_opq_adc,
    "knn_opq_audit": knn_opq_audit,
    "rag_hard_negatives": rag_hard_negatives,
    "rag_rerank_cascade": rag_rerank_cascade,
}

ORACLE = {
    "rag_hard_negatives": _HARD_NEG_SQL,
    "rag_rerank_cascade": _RERANK_SQL,
    "semantic_dedup_audit": _SEMDEDUP_AUDIT_SQL,
    "embedding_covariance": _COVARIANCE_SQL,
    "embedding_pca_audit": _PCA_AUDIT_SQL,
    "embedding_whiten_audit": _WHITEN_AUDIT_SQL,
    "knn_opq_audit": _OPQ_AUDIT_SQL,
}
