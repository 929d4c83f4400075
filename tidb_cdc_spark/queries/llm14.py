"""Fourteenth wave: feature-hashed document vectors (the hashing
trick) and semantic dedup over RAW TEXT — the no-model bridge from
the text surface to the embedding-space operators.

Oracle strategy: the sparse hashed-TF table is EXACT (md5 bucket
hash is engine-reproducible, counts integral) — full oracle; the
text-side semantic dedup is k-means-based (rows-only) with a
planted-copy audit (identical text ⇒ identical hashed vector ⇒ same
cell by argmin determinism ⇒ pruned) that DuckDB verifies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tidb_cdc_spark.functions import semdedup as SD
from tidb_cdc_spark.functions.feature_hash import hashed_tf, hashed_tf_dense
from tidb_cdc_spark.queries.audits import (
    _DOC_AUDIT_SQL,
    _N_DOCS,
    _doc_spine,
    _docs_with_copies,
)
from tidb_cdc_spark.queries.llm import _docs
from tidb_cdc_spark.queries.llm3 import _md5_bucket_sql
from tidb_cdc_spark.queries.llm8 import _V2_CTE

_DIM = 64


def doc_hashed_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse hashed term-frequency vectors for every document —
    (doc_id, bucket, tf), bucket = md5-bucket(token) mod 64. The
    fixed-dimension text representation a curation pass computes
    before any model exists; exactly reproducible in any engine."""
    return hashed_tf(_docs(spark, sf_dir), dim=_DIM).orderBy(
        "doc_id", "bucket"
    )


_HASHED_TF_SQL = rf"""
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '\s+'),
                            x -> x <> '')) AS term
  FROM documents
)
SELECT doc_id,
       CAST({_md5_bucket_sql("term")} % {_DIM} AS INTEGER) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS tf
FROM tok GROUP BY doc_id, bucket
ORDER BY doc_id, bucket
"""


def doc_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over raw text via hashed-TF vectors — no embeddings
    needed: near-identical token multisets land at cosine ≈ 1.
    Rows-only (k-means); the hard contract is oracle-checked by
    ``doc_semantic_dedup_audit``."""
    vecs = hashed_tf_dense(_docs(spark, sf_dir), dim=_DIM).withColumnRenamed(
        "doc_id", "vec_id"
    )
    res = SD.semantic_dedup(
        vecs, n_cells=32, threshold=0.9, train_fraction=0.1
    )
    return (
        res.filter(F.col("is_dup"))
        .select(
            F.col("vec_id").alias("doc_id"),
            "cell",
            "dup_of",
            F.round("max_sim", 4).alias("sim"),
        )
        .orderBy("doc_id")
    )


def doc_semantic_dedup_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Planted-copy contract over TEXT: an exact text copy hashes to
    the identical TF vector (pure function of the token multiset),
    so it shares the original's cell and sits at cosine 1 — must be
    pruned."""
    d, off = _docs_with_copies(spark, sf_dir)
    vecs = hashed_tf_dense(d, dim=_DIM).withColumnRenamed(
        "doc_id", "vec_id"
    )
    res = SD.semantic_dedup(
        vecs, n_cells=32, threshold=0.9, train_fraction=0.1
    )
    copies = (
        res.filter(F.col("vec_id") >= F.lit(off))
        .filter(F.col("vec_id") < F.lit(off) + _N_DOCS)
        .select(
            (F.col("vec_id") - F.lit(off)).alias("doc_id"),
            F.col("is_dup").alias("_d"),
        )
    )
    return (
        _doc_spine(spark, sf_dir).join(copies, "doc_id", "left")
        .select(
            "doc_id",
            F.col("_d").isNotNull().alias("found"),
            F.coalesce(F.col("_d"), F.lit(False)).alias("planted_pruned"),
        )
        .orderBy("doc_id")
    )


# -------------------------------------------- winnowing (MOSS)

_WK, _WW = 8, 4  # shingle tokens, winnow window


def winnow_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document pairs sharing a winnowed fingerprint (Schleimer
    et al. SIGMOD'03 — functions/winnow.py): position-robust local-
    overlap detection with the structural guarantee that any shared
    run of ≥ w+k−1 = 11 tokens surfaces the pair (min_shared=1 — the
    guarantee's setting; an 11-token run promises exactly one shared
    fingerprint). Fully integral and md5-hash-based ⇒ bit-exact
    DuckDB oracle."""
    from tidb_cdc_spark.functions.winnow import winnow_overlap

    return winnow_overlap(
        _docs(spark, sf_dir), k=_WK, w=_WW, min_shared=1
    ).orderBy("id_a", "id_b")


_WINNOW_FP_CTE = rf"""
WITH tl AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\s+'),
                     x -> x <> '') AS l
  FROM documents
), tln AS (SELECT doc_id, l, len(l) AS n FROM tl),
sh AS (
  SELECT doc_id, i - 1 AS pos,
         {_md5_bucket_sql(f"array_to_string(l[i : i + {_WK} - 1], ' ')")} AS h
  FROM (
    SELECT doc_id, l, unnest(range(1, n - {_WK} + 2)) AS i
    FROM tln WHERE n >= {_WK}
  )
  UNION ALL
  SELECT doc_id, 0 AS pos,
         {_md5_bucket_sql("array_to_string(l, ' ')")} AS h
  FROM tln WHERE n > 0 AND n < {_WK}
),
keyed AS (
  SELECT doc_id, pos,
         h * 2147483648 + (2147483647 - pos) AS key
  FROM sh
),
fp AS (
  SELECT DISTINCT doc_id, wkey // 2147483648 AS fp
  FROM (
    SELECT doc_id, pos,
           COUNT(*) OVER (PARTITION BY doc_id) AS n,
           MIN(key) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN CURRENT ROW
                          AND {_WW - 1} FOLLOWING) AS wkey
    FROM keyed
  )
  WHERE pos <= GREATEST(n - {_WW}, 0)
),
freq AS (SELECT fp, COUNT(*) AS df FROM fp GROUP BY fp)
"""

_WINNOW_SQL = _WINNOW_FP_CTE + """
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(COUNT(*) AS BIGINT) AS shared
FROM fp a
JOIN fp b USING (fp)
JOIN freq USING (fp)
WHERE a.doc_id < b.doc_id AND freq.df <= 1000
GROUP BY 1, 2 HAVING COUNT(*) >= 1
ORDER BY id_a, id_b
"""

_WINNOW_CAP = 2  # demo cap: testdata max df is 3, so the row is non-trivial


def winnow_cap_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The no-silent-caps audit row for ``winnow_overlap``'s
    ``max_doc_freq`` boilerplate cap (functions/winnow.py): one row
    ``(capped_fps, affected_docs, total_fps, max_df)`` saying how
    many fingerprints the cap excluded and how many documents lose
    the structural guarantee for those fingerprints. Declared at a
    cap the testdata actually exceeds so the numbers are non-zero;
    production runs emit it at the same cap as the pair query.
    Fully integral ⇒ bit-exact DuckDB oracle."""
    from tidb_cdc_spark.functions.winnow import winnow_cap_report as wcr

    return wcr(
        _docs(spark, sf_dir), k=_WK, w=_WW, max_doc_freq=_WINNOW_CAP
    )


_WINNOW_CAP_SQL = _WINNOW_FP_CTE + f"""
SELECT
  (SELECT COUNT(*) FROM freq WHERE df > {_WINNOW_CAP}) AS capped_fps,
  (SELECT COUNT(DISTINCT doc_id) FROM fp JOIN freq USING (fp)
    WHERE df > {_WINNOW_CAP}) AS affected_docs,
  (SELECT COUNT(*) FROM freq) AS total_fps,
  (SELECT CAST(COALESCE(MAX(df), 0) AS BIGINT) FROM freq) AS max_df
"""


# ----------------------------------------- corpus drift monitor


def vocab_drift_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 drifting terms between the corpus and its synthesized
    v2 snapshot (llm8's versioning convention): (token, ppm_old,
    ppm_new, delta_ppm) by |delta| — the distribution-shift monitor
    that catches a template flooding a crawl before it skews a
    training mixture. Integral ppm (cnt·10⁶ div total) — exact in
    both engines."""
    from tidb_cdc_spark.functions.vocab import term_drift
    from tidb_cdc_spark.queries.llm8 import _v2

    # deliberately NOT materialized (r12 profile, NOTES.md): the base
    # scan feeds three consumers but costs only ~0.27 s of the 1.34 s
    # total — the two tokenize+agg sides are 0.60 + 0.97 s — and
    # caching it measured SLOWER in both storage levels (DISK_ONLY
    # 1.67 s, MEMORY_AND_DISK 2.22 s): the InMemoryTableScan breaks
    # whole-stage codegen fusion into the tokenize-explode, costing
    # more than the two saved small-file scans.
    d = _docs(spark, sf_dir).select("doc_id", "text")
    return term_drift(d, _v2(d), k=50)


_DRIFT_SQL = (
    "WITH " + _V2_CTE + r"""
, tok_o AS (
  SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
                            x -> x <> '')) AS token
  FROM documents
), tok_n AS (
  SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
                            x -> x <> '')) AS token
  FROM v2
), o AS (
  -- HUGEINT cast before the ×10⁶: DuckDB BIGINT multiplication
  -- ERRORS on overflow (it does not widen), and a single token can
  -- exceed ~9×10¹² occurrences at the design scale — mirrors the
  -- Spark side's DECIMAL(38,0) route (functions/vocab.py)
  SELECT token, CAST(COUNT(*) AS HUGEINT) * 1000000
           // (SELECT COUNT(*) FROM tok_o) AS ppm_old
  FROM tok_o GROUP BY token
), n AS (
  SELECT token, CAST(COUNT(*) AS HUGEINT) * 1000000
           // (SELECT COUNT(*) FROM tok_n) AS ppm_new
  FROM tok_n GROUP BY token
)
SELECT token,
       CAST(COALESCE(ppm_old, 0) AS BIGINT) AS ppm_old,
       CAST(COALESCE(ppm_new, 0) AS BIGINT) AS ppm_new,
       CAST(COALESCE(ppm_new, 0) - COALESCE(ppm_old, 0) AS BIGINT)
         AS delta_ppm
FROM o FULL OUTER JOIN n USING (token)
ORDER BY ABS(COALESCE(ppm_new, 0) - COALESCE(ppm_old, 0)) DESC, token
LIMIT 50
"""
)


# -------------------------------------- conditional LM surprisal


def text_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document integer BIGRAM (conditional) surprisal —
    complements ``text_unigram_surprisal``: high bits here with low
    unigram bits = common words in uncommon order (word salad,
    shuffled boilerplate). Exact whole-bit arithmetic, hash-green in
    both engines (functions/lm.py)."""
    from tidb_cdc_spark.functions.lm import bigram_surprisal

    return bigram_surprisal(_docs(spark, sf_dir)).orderBy("doc_id")


_BIGRAM_SQL = r"""
WITH tl AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\s+'),
                     x -> x <> '') AS l
  FROM documents
), tln AS (SELECT doc_id, l, len(l) AS n FROM tl),
uc AS (
  SELECT t AS w1, CAST(COUNT(*) AS BIGINT) AS c1
  FROM (SELECT unnest(l) AS t FROM tl) GROUP BY t
),
bg AS (
  SELECT doc_id, l[i] AS w1, l[i + 1] AS w2
  FROM (SELECT doc_id, l, unnest(range(1, n)) AS i
        FROM tln WHERE n >= 2)
),
btf AS (
  SELECT doc_id, w1, w2, CAST(COUNT(*) AS BIGINT) AS tf
  FROM bg GROUP BY doc_id, w1, w2
),
bc AS (
  SELECT w1, w2, CAST(SUM(tf) AS BIGINT) AS c12
  FROM btf GROUP BY w1, w2
)
SELECT btf.doc_id,
       CAST(SUM(tf) AS BIGINT) AS n_bigrams,
       CAST(SUM(tf * (length(bin(c1)) - length(bin(c12))))
            AS BIGINT) AS sum_bits,
       CAST((CAST(SUM(tf * (length(bin(c1)) - length(bin(c12))))
                  AS BIGINT) * 1000000)
            // CAST(SUM(tf) AS BIGINT) AS BIGINT) AS mean_mbits
FROM btf JOIN bc USING (w1, w2) JOIN uc USING (w1)
GROUP BY btf.doc_id
ORDER BY btf.doc_id
"""


def corpus_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's head/middle/tail split (Wenzek et al. 2020): rank
    every document by LM surprisal (exact whole-bit bigram variant),
    cut the ranking into equal thirds — head = most fluent, the
    slice a pretraining mix up-weights. Fully integral (rank +
    truncating-division bucket formula shared verbatim with the
    oracle) ⇒ hash-exact; the rank runs as the two-level banded
    prefix scan, never a single-task global window
    (functions/lm.py::surprisal_buckets)."""
    from tidb_cdc_spark.functions.lm import surprisal_buckets

    b = surprisal_buckets(_docs(spark, sf_dir), n_buckets=3)
    return b.select(
        "doc_id",
        "mean_mbits",
        "rank",
        "bucket",
        F.element_at(
            F.array(F.lit("head"), F.lit("middle"), F.lit("tail")),
            F.col("bucket") + 1,
        ).alias("band"),
    ).orderBy("rank")


_PPLX_BUCKETS_SQL = f"""
WITH base AS ({_BIGRAM_SQL}),
r AS (
  SELECT doc_id, mean_mbits,
         CAST(ROW_NUMBER() OVER (ORDER BY mean_mbits, doc_id)
              AS BIGINT) AS rank,
         COUNT(*) OVER () AS n
  FROM base
)
SELECT doc_id, mean_mbits, rank,
       CAST(((rank - 1) * 3) // n AS INTEGER) AS bucket,
       CASE CAST(((rank - 1) * 3) // n AS INTEGER)
            WHEN 0 THEN 'head' WHEN 1 THEN 'middle' ELSE 'tail'
       END AS band
FROM r ORDER BY rank
"""






def doc_nfc_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NFC normalization with a DIRECT cross-engine string oracle:
    each specimen doc gets a planted tail of decomposed / unusual
    forms (combining acute, combining tilde, angstrom sign), and the
    normalized output strings are hash-compared verbatim against
    DuckDB's utf8proc ``nfc_normalize`` — two independent UAX #15
    implementations agreeing bit-for-bit
    (functions/text.py::normalize_text)."""
    from tidb_cdc_spark.functions.text import normalize_text

    tail = (
        " cafe\u0301 a\u0303 \u212bngstrom"  # e+acute, a+tilde, angstrom sign
    )
    d = (
        _docs(spark, sf_dir)
        .filter(F.col("doc_id") < 50)
        .select("doc_id", F.concat(F.col("text"), F.lit(tail)).alias("_t"))
    )
    return d.select(
        "doc_id", normalize_text(F.col("_t"), "NFC").alias("text_nfc")
    ).orderBy("doc_id")


_NFC_SQL = """
SELECT doc_id,
       nfc_normalize(text || ' cafe' || chr(769) || ' a' || chr(771)
                     || ' ' || chr(8491) || 'ngstrom') AS text_nfc
FROM documents WHERE doc_id < 50 ORDER BY doc_id
"""


# ------------------------------------------------ mojibake repair


def corpus_mojibake_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Planted-corruption contract for the mojibake repair
    (functions/text.py::fix_mojibake — the ftfy archetype's dominant
    UTF-8-read-as-Latin-1 case, pure JVM encode/decode): append a
    known accented tail to each specimen doc, corrupt it exactly the
    way a Latin-1 misread does, and require the repair to restore
    the original bit-for-bit while leaving the CLEAN text untouched
    (accented characters alone are not the corruption signature).
    Booleans TRUE by construction (the repair is the corruption's
    inverse and the is_valid_utf8 guard admits the planted bytes) —
    DuckDB-checkable."""
    from tidb_cdc_spark.functions.text import fix_mojibake

    tail = "\u00a0caf\u00e9 \u2014 na\u00efve r\u00e9sum\u00e9"
    # r7-advice pin: a marker char PLUS non-Latin-1 chars (em dash,
    # CJK, emoji) is realistic clean text that the unguarded encode
    # used to crash on (ANSI MALFORMED_CHARACTER_CODING) — it must
    # pass through untouched, and the scan must not fail.
    mixed = (
        "ch\u00e2teau \u2014 \u4e2d\u6587 menu \U0001f600 \u2019quoted\u2019"
    )
    d = (
        _docs(spark, sf_dir)
        .filter(F.col("doc_id") < 20)
        .select(
            "doc_id",
            F.concat(F.col("text"), F.lit(tail)).alias("_t"),
            F.concat(F.col("text"), F.lit(mixed)).alias("_mx"),
        )
    )
    corrupted = F.decode(F.encode(F.col("_t"), "UTF-8"), "ISO-8859-1")
    return d.select(
        "doc_id",
        (fix_mojibake(corrupted) == F.col("_t")).alias("restored"),
        (fix_mojibake(F.col("_t")) == F.col("_t")).alias("clean_untouched"),
        (fix_mojibake(F.col("_mx")) == F.col("_mx")).alias("mixed_untouched"),
    ).orderBy("doc_id")


_MOJIBAKE_AUDIT_SQL = """
SELECT doc_id, TRUE AS restored, TRUE AS clean_untouched,
       TRUE AS mixed_untouched
FROM documents WHERE doc_id < 20 ORDER BY doc_id
"""


# -------------------------------------- quality classifier (CCNet)


def quality_classifier_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CCNet/GPT-3 quality-filter archetype demonstrated on a
    planted contrast (the synthetic corpus has no natural text↔label
    signal — same convention as the planted dedup demos): class
    'real' = the corpus, class 'salad' = md5-derived token soup with
    a disjoint vocabulary. Held-out per-class metrics; the planted
    contrast is linearly separable so accuracy ≈ 1, pinned rows-only
    (LBFGS is iterative; the operator itself is exact-tested in
    tests/test_semdedup_pca.py incl. a no-signal-stays-at-chance
    sanity check)."""
    from tidb_cdc_spark.functions.classifier import source_classifier_eval
    from tidb_cdc_spark.queries.audits import _planting_offset

    d = _docs(spark, sf_dir).select("doc_id", "text")
    off = _planting_offset(d, "doc_id")  # id-space-safe at any SF
    real = d.withColumn("label", F.lit("real"))
    salad = d.filter(F.col("doc_id") % 7 == 3).select(
        (F.col("doc_id") + F.lit(off)).alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.substring(
                    F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(i))),
                    1,
                    8,
                )
                # 32 tokens: at 12 the small-norm salad vectors sat
                # close to the LR bias and one held-out row flipped;
                # 24+ separates perfectly (probed at sf0.01/sf0.1)
                for i in range(32)
            ],
        ).alias("text"),
        F.lit("salad").alias("label"),
    )
    return (
        source_classifier_eval(
            real.unionByName(salad), dim=64, label_col="label"
        )
        .orderBy("label")
    )


def quality_classifier_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Planted-contrast contract for the LBFGS classifier path as a
    DuckDB-checkable boolean row per class: the curated-vs-salad
    contrast is linearly separable in hashed-TF space (disjoint
    vocabularies, probed perfectly separable at 24+ salad tokens),
    so held-out accuracy must clear 90% per class — the threshold
    leaves one-mistake headroom on the smallest eval class (14 rows
    at sf0.01) while still certifying the train/score pipeline
    end-to-end. Converts the rows-only eval into a hash-green gate
    row (the audits.py pattern)."""
    ev = quality_classifier_eval(spark, sf_dir)
    return ev.select(
        "label",
        (F.col("n_eval") > 0).alias("has_eval_rows"),
        (F.col("accuracy_ppm") >= 900000).alias("separable_ok"),
    ).orderBy("label")


_CLASSIFIER_AUDIT_SQL = """
SELECT * FROM (VALUES
  ('__all__', TRUE, TRUE),
  ('real', TRUE, TRUE),
  ('salad', TRUE, TRUE)
) t(label, has_eval_rows, separable_ok)
ORDER BY label
"""


QUERIES = {
    "doc_hashed_tf": doc_hashed_tf,
    "doc_semantic_dedup": doc_semantic_dedup,
    "doc_semantic_dedup_audit": doc_semantic_dedup_audit,
    "winnow_overlap_pairs": winnow_overlap_pairs,
    "winnow_cap_report": winnow_cap_report,
    "vocab_drift_top": vocab_drift_top,
    "text_bigram_surprisal": text_bigram_surprisal,
    "quality_classifier_eval": quality_classifier_eval,
    "quality_classifier_audit": quality_classifier_audit,
    "corpus_perplexity_buckets": corpus_perplexity_buckets,
    "corpus_mojibake_audit": corpus_mojibake_audit,
    "doc_nfc_normalize": doc_nfc_normalize,
}

ORACLE = {
    "quality_classifier_audit": _CLASSIFIER_AUDIT_SQL,
    "corpus_perplexity_buckets": _PPLX_BUCKETS_SQL,
    "corpus_mojibake_audit": _MOJIBAKE_AUDIT_SQL,
    "doc_nfc_normalize": _NFC_SQL,
    "vocab_drift_top": _DRIFT_SQL,
    "text_bigram_surprisal": _BIGRAM_SQL,
    "doc_hashed_tf": _HASHED_TF_SQL,
    "winnow_overlap_pairs": _WINNOW_SQL,
    "winnow_cap_report": _WINNOW_CAP_SQL,
    "doc_semantic_dedup_audit": _DOC_AUDIT_SQL.format(flag="planted_pruned"),
}
