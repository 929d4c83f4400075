"""Winnowing document fingerprints (Schleimer, Wilkerson, Aiken —
"Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD'03;
the MOSS algorithm): from the rolling k-token shingle hashes of a
document, select the minimum hash of every w-wide window (ties →
rightmost). The selected set is a position-robust fingerprint with
the winnowing GUARANTEE: any substring shared by two documents of at
least w + k − 1 tokens produces at least one shared fingerprint —
detection is structural, not probabilistic — while storing only
~2/(w+1) of the shingles.

This complements the other dedup signals: `repeated_spans` reports
WHICH spans repeat (corpus-wide, every span), MinHash/SimHash score
whole-document similarity; winnowing gives a compact per-document
fingerprint set for pairwise local-overlap detection (quotation,
partial plagiarism, shared boilerplate localization).

Cross-engine exactness: the shingle hash is the md5 bucket hash
(functions/sampling.py — reproducible in any engine, unlike
xxhash64), and the rightmost-min selection is encoded in ONE integer
window-min: key = h·2³¹ + (2³¹−1−pos), so MIN(key) picks the
smallest hash and, among ties, the largest position. h < 2³² and
pos < 2³¹ keep the key inside a BIGINT. The whole pipeline is
integral and order-independent ⇒ the DuckDB oracle reproduces it
bit-for-bit (queries/llm14.py).

Scale shape: tokenize/shingle/hash is codegen clustered on doc_id
(one partitionBy(doc) window pass — same shape as the shingle
pipeline), fingerprints are DISTINCT (doc, fp) rows ≈ 2n/(w+1); the
overlap join is an equi-join on fp with a document-frequency cap
(the `ngram_jaccard_pairs.max_doc_freq` viral-boilerplate guard) so
a fingerprint shared by the whole corpus cannot go quadratic.

Short documents (fewer than k tokens) contribute their single
all-token shingle at position 0 — the repo-wide short-doc
convention (functions/quality.shingle_string_rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tidb_cdc_spark.functions.sampling import hash_bucket

_POS_SPACE = 1 << 31  # pos encoder: key = h * 2^31 + (2^31-1-pos)


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 8,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DISTINCT (doc_id, fp) winnowed fingerprints (fp = 32-bit
    shingle-hash value selected by some window)."""
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.lower(F.col(text_col)), r"\s+")).alias(
            "_tpos", "_t"
        ),
    ).filter(F.col("_t") != "")
    dw = Window.partitionBy("doc_id").orderBy("_tpos")
    leads = [F.lead("_t", j).over(dw) for j in range(1, k)]
    keep = (leads[-1].isNotNull()) | (F.row_number().over(dw) == 1)
    sh = (
        tok.select(
            "doc_id",
            "_tpos",
            F.concat_ws(" ", F.col("_t"), *leads).alias("_g"),
            keep.alias("_keep"),
        )
        .filter(F.col("_keep"))
        .select(
            "doc_id",
            (F.row_number().over(dw) - 1).alias("pos"),
            hash_bucket(F.col("_g")).alias("h"),
        )
    )
    key = F.col("h") * F.lit(_POS_SPACE) + (
        F.lit(_POS_SPACE - 1) - F.col("pos")
    )
    fw = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, w - 1)
    )
    return (
        sh.select("doc_id", F.min(key).over(fw).alias("_wkey"))
        .select("doc_id", F.expr(f"_wkey div {_POS_SPACE}").alias("fp"))
        .distinct()
    )


def winnow_overlap(
    docs: DataFrame,
    k: int = 8,
    w: int = 4,
    min_shared: int = 2,
    max_doc_freq: int = 1000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id_a, id_b, shared): document pairs sharing ≥ ``min_shared``
    winnowed fingerprints — guaranteed to include every pair sharing
    a ≥ (w+k−1)-token substring whose fingerprints survive the
    ``max_doc_freq`` boilerplate cap."""
    from tidb_cdc_spark.session import materialize

    fp = materialize(winnow_fingerprints(docs, k, w, id_col, text_col))
    # broadcast the OVER-cap (viral) list — tiny at any scale — and
    # anti-join; broadcasting the kept side would be data-sized
    viral = (
        fp.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") > max_doc_freq)
        .select("fp")
    )
    kept = fp.join(F.broadcast(viral), "fp", "left_anti")
    a = kept.select(F.col("doc_id").alias("id_a"), "fp")
    b = kept.select(F.col("doc_id").alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )
