"""Oracle-checkable audit twins for the approximate operators.

The LSH/IVF/PQ family cannot have a DuckDB oracle for its raw pair /
top-k output (banding and k-means are not SQL-expressible), so their
driver rows were permanently ``no_oracle``. These audits convert each
into a HARD oracle row by the ``ann_recall_audit`` pattern: plant a
deterministic structure — an EXACT copy of each probe row at
``id + max(id) + 1`` — and emit per-probe booleans that are TRUE by algorithm
structure, not by luck:

- an exact text copy has the identical shingle multiset ⇒ identical
  MinHash signature (all bands collide), identical SimHash (Hamming
  0), identical n-gram set (Jaccard 1.0), and is edge-connected to
  its original in the fuzzy cluster graph;
- an exact vector copy lands in the same IVF cell (same argmin), gets
  the same PQ code (same per-subspace argmin), and ranks at ADC
  distance 0 — so it must appear in the top-k for every ANN variant.

A bucketing, banding, encoding, or rerank regression flips a boolean
and fails the value hash. The raw pair/top-k queries stay declared
(rows-only) right after the gate window; these audits take their
driver slots. DuckDB's side of each audit is the planted-id spine
with constant TRUEs — the determinism argument above is what makes
that a real oracle rather than a tautology, and the booleans are
computed from the operator's actual output, never assumed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from tidb_cdc_spark.functions import clusters as C
from tidb_cdc_spark.functions import dedup as D
from tidb_cdc_spark.functions import pq as PQ
from tidb_cdc_spark.functions import similarity as S
from tidb_cdc_spark.queries.llm import _docs, _embs

_N_DOCS = 20  # docs 0.._N_DOCS-1 get planted copies
_N_VECS = 5  # vectors 0.._N_VECS-1 get planted copies
#: top-k used by the knn audits: ADC/cosine ties rank by neighbor_id
#: ascending and the planted copy has the LARGEST id, so k must
#: comfortably exceed any plausible count of exactly-tied lower-id
#: vectors (PQ code collisions make small ties possible; 50 identical
#: codes would mean the corpus is one giant duplicate family)
_AUDIT_K = 50


def _planting_offset(df: DataFrame, id_col: str) -> int:
    """Copies are planted at ``id + offset`` with offset = max(id)+1 —
    id-space-safe at ANY scale factor (a fixed 10⁶ offset would
    collide with real ids once the corpus grows past it, silently
    corrupting every audit). One aggregated scalar — metadata-sized,
    deterministic."""
    m = df.agg(F.max(F.col(id_col))).first()[0]
    return int(m) + 1


def _docs_with_copies(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, int]:
    d = _docs(spark, sf_dir)
    off = _planting_offset(d, "doc_id")
    copies = d.filter(F.col("doc_id") < _N_DOCS).select(
        (F.col("doc_id") + off).alias("doc_id"),
        *[c for c in d.columns if c != "doc_id"],
    )
    return d.unionByName(copies.select(*d.columns)), off


def _embs_with_copies(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, int]:
    e = _embs(spark, sf_dir)
    off = _planting_offset(e, "vec_id")
    copies = e.filter(F.col("vec_id") < _N_VECS).select(
        (F.col("vec_id") + off).alias("vec_id"),
        *[c for c in e.columns if c != "vec_id"],
    )
    return e.unionByName(copies.select(*e.columns)), off


def _planted_pair_report(
    pairs: DataFrame,
    spine: DataFrame,
    value_flag: Column,
    flag_name: str,
    off: int,
) -> DataFrame:
    """(doc_id, found, <flag>) for each planted doc: ``found`` iff the
    (orig, orig+off) pair is in ``pairs``; ``flag`` from the pair's
    value column (FALSE when not found)."""
    hit = (
        pairs.filter(F.col("id_b") == F.col("id_a") + F.lit(off))
        .filter(F.col("id_a") < _N_DOCS)
        .select(F.col("id_a").alias("doc_id"), value_flag.alias("_flag"))
    )
    return (
        spine.join(hit, "doc_id", "left")
        .select(
            "doc_id",
            F.col("_flag").isNotNull().alias("found"),
            F.coalesce(F.col("_flag"), F.lit(False)).alias(flag_name),
        )
        .orderBy("doc_id")
    )


def _doc_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _docs(spark, sf_dir).filter(F.col("doc_id") < _N_DOCS).select("doc_id")


_DOC_AUDIT_SQL = """
SELECT doc_id, TRUE AS found, TRUE AS {flag}
FROM documents WHERE doc_id < 20 ORDER BY doc_id
"""


def dedup_minhash_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact copies share every MinHash band ⇒ pair found with
    estimated Jaccard exactly 1.0 (all 64 signature slots equal)."""
    d, off = _docs_with_copies(spark, sf_dir)
    return _planted_pair_report(
        D.minhash_lsh_pairs(d),
        _doc_spine(spark, sf_dir),
        F.col("est_jaccard") == 1.0,
        "est_one",
        off,
    )


def dedup_simhash_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact copies have the identical 64-bit SimHash ⇒ every permuted
    table collides ⇒ pair found at Hamming 0."""
    d, off = _docs_with_copies(spark, sf_dir)
    return _planted_pair_report(
        D.simhash_pairs(d),
        _doc_spine(spark, sf_dir),
        F.col("hamming") == 0,
        "hamming_zero",
        off,
    )


def dedup_jaccard_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact copies have identical distinct-shingle sets ⇒ exact
    n-gram Jaccard 1.0 through the inverted-index join (document-
    frequency pruning drops a shingle for both sides or neither, so
    the ratio over surviving sets is still 1.0)."""
    d, off = _docs_with_copies(spark, sf_dir)
    return _planted_pair_report(
        D.ngram_jaccard_pairs(d, min_jaccard=0.8),
        _doc_spine(spark, sf_dir),
        F.col("jaccard") == 1.0,
        "jaccard_one",
        off,
    )


def dedup_embedding_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact vector copies share every hyperplane sign ⇒ same LSH
    bucket ⇒ pair surfaces and verifies at cosine exactly 1."""
    e, off = _embs_with_copies(spark, sf_dir)
    pairs = D.embedding_near_dup_pairs(e.select("vec_id", "embedding"))
    hit = (
        pairs.filter(F.col("id_b") == F.col("id_a") + F.lit(off))
        .filter(F.col("id_a") < _N_VECS)
        .select(F.col("id_a").alias("vec_id"), (F.col("cos") == 1.0).alias("_c"))
    )
    spine = _embs(spark, sf_dir).filter(F.col("vec_id") < _N_VECS).select("vec_id")
    return (
        spine.join(hit, "vec_id", "left")
        .select(
            "vec_id",
            F.col("_c").isNotNull().alias("found"),
            F.coalesce(F.col("_c"), F.lit(False)).alias("cos_one"),
        )
        .orderBy("vec_id")
    )


_EMB_AUDIT_SQL = """
SELECT vec_id, TRUE AS found, TRUE AS cos_one
FROM embeddings WHERE vec_id < 5 ORDER BY vec_id
"""


def dedup_clusters_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy-cluster contract: an exact copy is edge-connected to its
    original through BOTH the MinHash and SimHash pair graphs, so
    connected components must assign the two the same cluster id."""
    d, off = _docs_with_copies(spark, sf_dir)
    mh = D.minhash_lsh_pairs(d).select("id_a", "id_b")
    sh = D.simhash_pairs(d).select("id_a", "id_b")
    labels = C.cluster_representatives(d, mh.unionByName(sh)).select(
        "doc_id", "cluster_id"
    )
    orig = labels.filter(F.col("doc_id") < _N_DOCS)
    copy = labels.filter(F.col("doc_id") >= F.lit(off)).select(
        (F.col("doc_id") - F.lit(off)).alias("doc_id"),
        F.col("cluster_id").alias("_copy_cluster"),
    )
    return (
        orig.join(copy, "doc_id")
        .select(
            "doc_id",
            (F.col("cluster_id") == F.col("_copy_cluster")).alias("same_cluster"),
        )
        .orderBy("doc_id")
    )


_CLUSTERS_AUDIT_SQL = """
SELECT doc_id, TRUE AS same_cluster
FROM documents WHERE doc_id < 20 ORDER BY doc_id
"""


def dedup_keep_best_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware representative contract: give every PLANTED COPY
    strictly lower quality than every real doc (quality 1 vs 2), run
    quality-aware ``cluster_representatives`` over the MinHash ∪
    SimHash pair graph — a copy is edge-connected to its original,
    so its cluster holds at least one higher-quality member, and
    ``max_by(quality, -id)`` can therefore NEVER elect the copy.
    One boolean per planted doc, TRUE by algorithm structure."""
    d, off = _docs_with_copies(spark, sf_dir)
    d = d.withColumn(
        "_quality", F.when(F.col("doc_id") < F.lit(off), 2).otherwise(1)
    )
    mh = D.minhash_lsh_pairs(d).select("id_a", "id_b")
    sh = D.simhash_pairs(d).select("id_a", "id_b")
    labels = C.cluster_representatives(
        d, mh.unionByName(sh), quality_col="_quality"
    )
    copy = labels.filter(F.col("doc_id") >= F.lit(off)).select(
        (F.col("doc_id") - F.lit(off)).alias("doc_id"),
        (~F.col("is_representative")).alias("copy_not_kept"),
    )
    return (
        _doc_spine(spark, sf_dir)
        .join(copy, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("copy_not_kept", F.lit(False)).alias("copy_not_kept"),
        )
        .orderBy("doc_id")
    )


_KEEP_BEST_AUDIT_SQL = """
SELECT doc_id, TRUE AS copy_not_kept
FROM documents WHERE doc_id < 20 ORDER BY doc_id
"""


def _knn_planted_report(
    approx: DataFrame, spine: DataFrame, off: int
) -> DataFrame:
    found = (
        approx.filter(F.col("neighbor_id") == F.col("query_id") + F.lit(off))
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    return (
        spine.join(found, "query_id", "left")
        .select("query_id", F.col("_n").isNotNull().alias("planted_found"))
        .orderBy("query_id")
    )


_KNN_AUDIT_SQL = """
SELECT vec_id AS query_id, TRUE AS planted_found
FROM embeddings WHERE vec_id < 5 ORDER BY query_id
"""


def _vec_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _embs(spark, sf_dir)
        .filter(F.col("vec_id") < _N_VECS)
        .select(F.col("vec_id").alias("query_id"))
    )


def knn_ivf_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF retrieval contract: an exact copy gets the identical cell
    assignment (same argmin over centroids) and cosine 1 to its query
    ⇒ must be retrieved in the audit top-k (ties rank by id ascending
    and the copy's id is the largest, so k is sized far beyond any
    plausible exact-tie count — see _AUDIT_K)."""
    e, off = _embs_with_copies(spark, sf_dir)
    q = e.filter(F.col("vec_id") < _N_VECS)
    approx = S.knn_ivf(q, e, k=_AUDIT_K)
    return _knn_planted_report(approx, _vec_spine(spark, sf_dir), off)


def knn_pq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ/ADC retrieval contract: an exact copy encodes to the
    identical PQ code as the query itself ⇒ ADC distance equals the
    query's own quantization distance, the minimum possible ⇒ copy in the audit top-k (_AUDIT_K
    absorbs same-code ties, which rank lower ids first)."""
    e, off = _embs_with_copies(spark, sf_dir)
    books = PQ.pq_train(e, m=4, k=16, train_fraction=0.25)
    codes = PQ.pq_encode(e, books)
    q = e.filter(F.col("vec_id") < _N_VECS)
    approx = PQ.pq_knn_adc(q, codes, books, k=_AUDIT_K)
    return _knn_planted_report(approx, _vec_spine(spark, sf_dir), off)


def knn_ivfpq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ retrieval contract: exact copy ⇒ same coarse cell, same
    residual, same PQ code ⇒ candidate via every probed cell and
    minimal ADC distance ⇒ copy in the audit top-k (_AUDIT_K)."""
    e, off = _embs_with_copies(spark, sf_dir)
    q = e.filter(F.col("vec_id") < _N_VECS)
    approx = PQ.ivfpq_knn(
        q, e, k=_AUDIT_K, n_cells=16, n_probe=4, train_fraction=0.25
    )
    return _knn_planted_report(approx, _vec_spine(spark, sf_dir), off)


def dedup_minhash_star_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-pair connectivity contract (functions/dedup.py::
    minhash_lsh_star_pairs): an exact copy shares EVERY band bucket
    with its original, so either the original IS some shared
    bucket's min-id hub (⇒ direct pair orig→copy) or a smaller hub
    r < orig emits both (r, orig) and (r, copy) (⇒ two-hop
    connection). ``connected`` is therefore TRUE by construction for
    every planted doc — the clique-equivalent-components guarantee,
    DuckDB-checkable. Precondition (same as ``dedup_minhash_audit``):
    no band bucket may exceed ``max_bucket_size``, else shared
    buckets are silently dropped and the guarantee breaks — the
    audit passes ``max_bucket_size=None`` so it holds at ANY scale
    factor (planted copies only double bucket membership, so the
    uncapped join stays linear here)."""
    d, off = _docs_with_copies(spark, sf_dir)
    p = D.minhash_lsh_star_pairs(
        d, max_bucket_size=None, with_jaccard=False
    )
    direct = p.filter(
        (F.col("id_b") == F.col("id_a") + F.lit(off))
        & (F.col("id_a") < _N_DOCS)
    ).select(F.col("id_a").alias("doc_id"))
    # pre-filter BOTH sides to the planted docs before the hub join:
    # an unfiltered self-join on hub is hub-degree-squared — the very
    # blowup the star op removes (review catch)
    pa = p.filter(F.col("id_b") < _N_DOCS).select(
        F.col("id_a").alias("_hub"), F.col("id_b").alias("_o")
    )
    pb = p.filter(F.col("id_b") >= F.lit(off)).select(
        F.col("id_a").alias("_hub"), F.col("id_b").alias("_c")
    )
    two_hop = (
        pa.join(pb, "_hub")
        .filter(F.col("_c") == F.col("_o") + F.lit(off))
        .select(F.col("_o").alias("doc_id"))
    )
    hit = direct.unionByName(two_hop).distinct()
    return (
        _doc_spine(spark, sf_dir)
        .join(hit.withColumn("_f", F.lit(True)), "doc_id", "left")
        .select(
            "doc_id", F.coalesce("_f", F.lit(False)).alias("connected")
        )
        .orderBy("doc_id")
    )


_STAR_AUDIT_SQL = """
SELECT doc_id, TRUE AS connected
FROM documents WHERE doc_id < 20 ORDER BY doc_id
"""


QUERIES = {
    "dedup_minhash_star_audit": dedup_minhash_star_audit,
    "dedup_minhash_audit": dedup_minhash_audit,
    "dedup_simhash_audit": dedup_simhash_audit,
    "dedup_jaccard_audit": dedup_jaccard_audit,
    "dedup_embedding_audit": dedup_embedding_audit,
    "dedup_clusters_audit": dedup_clusters_audit,
    "dedup_keep_best_audit": dedup_keep_best_audit,
    "knn_ivf_audit": knn_ivf_audit,
    "knn_pq_audit": knn_pq_audit,
    "knn_ivfpq_audit": knn_ivfpq_audit,
}

ORACLE = {
    "dedup_minhash_star_audit": _STAR_AUDIT_SQL,
    "dedup_minhash_audit": _DOC_AUDIT_SQL.format(flag="est_one"),
    "dedup_simhash_audit": _DOC_AUDIT_SQL.format(flag="hamming_zero"),
    "dedup_jaccard_audit": _DOC_AUDIT_SQL.format(flag="jaccard_one"),
    "dedup_embedding_audit": _EMB_AUDIT_SQL,
    "dedup_clusters_audit": _CLUSTERS_AUDIT_SQL,
    "dedup_keep_best_audit": _KEEP_BEST_AUDIT_SQL,
    "knn_ivf_audit": _KNN_AUDIT_SQL,
    "knn_pq_audit": _KNN_AUDIT_SQL,
    "knn_ivfpq_audit": _KNN_AUDIT_SQL,
}
