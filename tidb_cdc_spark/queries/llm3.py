"""Third wave of pipeline queries: deterministic sampling, TF-IDF
top terms, duplicate-cluster resolution (connected components), and
PII scrubbing — the curation stages a pretraining pipeline runs
between dedup and shipping a corpus.

Cross-engine notes:
- sampling buckets come from md5 (reproducible in ANY engine —
  sampling is a cross-system contract; see functions/sampling.py);
  the DuckDB oracle reconstructs the 32-bit bucket from hex chars.
- tfidf uses the RATIONAL idf (N+1)/(df+1): one exact int→double
  division, bit-identical across engines (libm log is not).
- connected components is iterative (not SQL-expressible in one
  query); its ORACLE-checked variant runs over exact-duplicate
  edges where the closure equals the fingerprint groups a window
  can compute. The fuzzy variant (minhash ∪ simhash edges) is
  declared rows-only and exact-tested against union-find in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tidb_cdc_spark.functions import clusters as C
from tidb_cdc_spark.functions import dedup as D
from tidb_cdc_spark.functions import sampling as SA
from tidb_cdc_spark.functions import text as T
from tidb_cdc_spark.functions import tfidf as TI
from tidb_cdc_spark.queries.llm import _docs

# ----------------------------------------------------- hash sampling
_SAMPLE_RATE = 0.25
_STRATA_RATES = {"en": 0.5, "de": 0.25, "fr": 0.1}
_STRATA_DEFAULT = 0.05


def sample_hash_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 25% sample keyed on doc_id — same rows on every
    rerun, every engine, every partition layout. Scan-only plan."""
    d = _docs(spark, sf_dir)
    return SA.hash_sample(d, "doc_id", _SAMPLE_RATE).select(
        "doc_id", "lang"
    ).orderBy("doc_id")


def sample_stratified_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language deterministic rates (rebalancing a pretraining
    mix): en 50%, de 25%, fr 10%, everything else 5%."""
    d = _docs(spark, sf_dir)
    return SA.stratified_sample(
        d, "doc_id", "lang", _STRATA_RATES, default_rate=_STRATA_DEFAULT
    ).select("doc_id", "lang").orderBy("doc_id")


_MAX_WEIGHT = 1024


def sample_weighted_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic token-weighted Bernoulli sample: doc kept with
    probability n_tokens/1024 — importance sampling with an exact
    integer keep-decision (no float pow; any engine reproduces the
    rows). Scan-only predicate like the whole sampling family."""
    d = _docs(spark, sf_dir).select(
        "doc_id", "lang", T.token_count(F.col("text")).cast("long").alias("w")
    )
    return (
        SA.weighted_sample(d, "doc_id", "w", rate=1.0, max_weight=_MAX_WEIGHT)
        .select("doc_id", "lang", F.col("w").alias("n_tokens"))
        .orderBy("doc_id")
    )


def _md5_bucket_sql(key_expr: str, salt: str = "") -> str:
    """DuckDB expression for sampling.hash_bucket: integer value of
    the first 8 hex chars of md5(key || salt)."""
    h = f"md5(CAST({key_expr} AS VARCHAR) || '{salt}')"

    def byte(pos: int) -> str:
        c1 = f"substr({h}, {pos}, 1)"
        c2 = f"substr({h}, {pos + 1}, 1)"
        return (
            f"((strpos('0123456789abcdef', {c1}) - 1) * 16"
            f" + (strpos('0123456789abcdef', {c2}) - 1))"
        )

    return (
        f"(CAST({byte(1)} AS BIGINT) * 16777216 + {byte(3)} * 65536"
        f" + {byte(5)} * 256 + {byte(7)})"
    )


_SAMPLE_SQL = f"""
SELECT doc_id, lang FROM documents
WHERE {_md5_bucket_sql("doc_id")} < {int(_SAMPLE_RATE * 4294967296)}
ORDER BY doc_id
"""

_WEIGHTED_SQL = rf"""
WITH t AS (
  SELECT doc_id, lang,
         CAST(len(list_filter(string_split_regex(text, '\s+'),
              x -> x <> '')) AS BIGINT) AS n_tokens
  FROM documents
)
SELECT doc_id, lang, n_tokens FROM t
WHERE {_md5_bucket_sql("doc_id")} * {_MAX_WEIGHT} < 4294967296 * n_tokens
ORDER BY doc_id
"""

_STRATified_CASE = " ".join(
    f"WHEN lang = '{s}' THEN {int(r * 4294967296)}"
    for s, r in sorted(_STRATA_RATES.items())
)
_STRATIFIED_SQL = f"""
SELECT doc_id, lang FROM documents
WHERE {_md5_bucket_sql("doc_id")} <
      (CASE {_STRATified_CASE} ELSE {int(_STRATA_DEFAULT * 4294967296)} END)
ORDER BY doc_id
"""


# ------------------------------------------------------------ tfidf
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by tf·idf (rational
    idf; ties broken by term)."""
    return TI.top_terms(_docs(spark, sf_dir), k=3).orderBy("doc_id", "term_rank")


_TFIDF_SQL = r"""
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '\s+'),
                x -> x <> '')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term
), dfreq AS (
  SELECT term, COUNT(*) AS df_t FROM tf GROUP BY term
), nd AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df_t,
         CAST(tf.tf AS DOUBLE)
           * (CAST(n_docs + 1 AS DOUBLE) / CAST(df_t + 1 AS DOUBLE)) AS tfidf
  FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN nd
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY doc_id ORDER BY tfidf DESC, term) AS term_rank
  FROM scored
)
SELECT doc_id, term_rank, term, tf, df_t, tfidf
FROM ranked WHERE term_rank <= 3 ORDER BY doc_id, term_rank
"""


# ------------------------------------------------- cluster resolution
def dedup_clusters_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over EXACT-duplicate edges (star edges
    root→member per fingerprint group), resolved to per-doc
    (cluster_id, is_representative). The iterative CC algorithm runs
    for real; on these edges its closure provably equals the
    fingerprint groups, which is what makes a SQL oracle possible."""
    d = _docs(spark, sf_dir)
    fp = d.select("doc_id", T.fingerprint(F.col("text")).alias("_fp"))
    roots = fp.groupBy("_fp").agg(F.min("doc_id").alias("_root"))
    edges = (
        fp.join(roots, "_fp")
        .filter(F.col("doc_id") != F.col("_root"))
        .select(F.col("_root").alias("id_a"), F.col("doc_id").alias("id_b"))
    )
    return C.cluster_representatives(d, edges).orderBy("doc_id")


_CLUSTERS_EXACT_SQL = r"""
WITH fp AS (
  SELECT doc_id, trim(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS norm
  FROM documents
)
SELECT doc_id,
       MIN(doc_id) OVER (PARTITION BY norm) AS cluster_id,
       doc_id = MIN(doc_id) OVER (PARTITION BY norm) AS is_representative
FROM fp ORDER BY doc_id
"""


def dedup_clusters_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The real dedup endgame: near-dup pair edges from MinHash-LSH
    ∪ SimHash, transitively closed to clusters, one representative
    kept per cluster. Rows-only at the driver (LSH banding is not
    SQL-expressible); the CC core is exact-tested against union-find
    in tests/test_llm.py."""
    d = _docs(spark, sf_dir)
    mh = D.minhash_lsh_pairs(d).select("id_a", "id_b")
    sh = D.simhash_pairs(d).select("id_a", "id_b")
    return C.cluster_representatives(d, mh.unionByName(sh)).orderBy("doc_id")


# ------------------------------------------------------ PII scrubbing
_PLANT_EMAIL = " reach me at agent.smith+spam@example-mail.com ok"
_PLANT_URL = " docs at https://docs.example.com/a/b?q=1 end"
_PLANT_PHONE = " call +1 (415) 555-0199 now"


def pii_scrub_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction over documents. The synthetic corpus
    contains no PII, so deterministic specimens are planted (doc_id
    mod 7/11/13 → email/url/phone) — the same planting the oracle
    replays, making counts AND the redacted-text md5 checkable."""
    d = _docs(spark, sf_dir)
    planted = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 7 == 0, F.lit(_PLANT_EMAIL)).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 11 == 0, F.lit(_PLANT_URL)).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 13 == 0, F.lit(_PLANT_PHONE)).otherwise(F.lit("")),
        ).alias("text"),
    )
    cnt = T.pii_counts(F.col("text"))
    return planted.select(
        "doc_id",
        cnt["url"].alias("n_urls"),
        cnt["email"].alias("n_emails"),
        cnt["phone"].alias("n_phones"),
        F.md5(T.redact_pii(F.col("text"))).alias("redacted_md5"),
    ).orderBy("doc_id")


_PII_SQL_TEMPLATE = """
WITH planted AS (
  SELECT doc_id, text ||
    CASE WHEN doc_id % 7 = 0 THEN '__EMAIL__' ELSE '' END ||
    CASE WHEN doc_id % 11 = 0 THEN '__URL__' ELSE '' END ||
    CASE WHEN doc_id % 13 = 0 THEN '__PHONE__' ELSE '' END AS text
  FROM documents
)
SELECT doc_id,
  len(regexp_extract_all(text, '__P_URL__')) AS n_urls,
  len(regexp_extract_all(text, '__P_EMAIL__')) AS n_emails,
  len(regexp_extract_all(text, '__P_PHONE__')) AS n_phones,
  md5(regexp_replace(regexp_replace(regexp_replace(text,
      '__P_URL__', '[PII]', 'g'),
      '__P_EMAIL__', '[PII]', 'g'),
      '__P_PHONE__', '[PII]', 'g')) AS redacted_md5
FROM planted ORDER BY doc_id
"""

_PII_PAT = dict(T.PII_PATTERNS)
_PII_SQL = (
    _PII_SQL_TEMPLATE.replace("__EMAIL__", _PLANT_EMAIL)
    .replace("__URL__", _PLANT_URL)
    .replace("__PHONE__", _PLANT_PHONE)
    .replace("__P_URL__", _PII_PAT["url"])
    .replace("__P_EMAIL__", _PII_PAT["email"])
    .replace("__P_PHONE__", _PII_PAT["phone"])
)


_SPLIT_FRACTIONS = {"train": 0.8, "val": 0.1, "test": 0.1}
# thresholds via the SAME float accumulation split_assign performs
# (0.8 + 0.1 != 0.9 in IEEE doubles — an independently-written 0.9
# threshold could disagree by one bucket on a boundary key)
_SPLIT_T_TRAIN = int(0.8 * 4294967296)
_SPLIT_T_VAL = int((0.8 + 0.1) * 4294967296)


def corpus_cluster_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split: the assignment unit is the
    duplicate CLUSTER, not the document — splitting on doc_id puts
    near-identical docs on both sides of the train/eval fence and
    silently inflates eval scores (the self-contamination failure
    mode dedup-before-split exists to prevent, cf. Lee et al. 2021).
    Cluster id = min doc id per exact-dup fingerprint group (swap in
    the fuzzy CC labels for near-dup-safe splits — same shape, no SQL
    oracle); split = md5-bucketed cumulative fractions on cluster_id.

    Plan: one fingerprint hash-agg (map-side combined) + one keyed
    join to attach cluster ids, then the split CASE is a pure scan
    expression and the final per-split rollup is a 3-row aggregate.
    Shuffles carry (fp, id)-sized rows only — text never moves.
    """
    d = _docs(spark, sf_dir)
    fp = d.select("doc_id", T.fingerprint(F.col("text")).alias("_fp"))
    roots = fp.groupBy("_fp").agg(F.min("doc_id").alias("cluster_id"))
    labeled = fp.join(roots, "_fp")
    split = SA.split_assign(labeled, "cluster_id", _SPLIT_FRACTIONS)
    return (
        split.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("cluster_id").alias("n_clusters"),
        )
        .orderBy("split")
    )


_SPLIT_SQL = rf"""
WITH fp AS (
  SELECT doc_id, trim(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS norm
  FROM documents
), lab AS (
  SELECT doc_id, MIN(doc_id) OVER (PARTITION BY norm) AS cluster_id
  FROM fp
), assigned AS (
  SELECT doc_id, cluster_id,
         CASE
           WHEN {_md5_bucket_sql("cluster_id", "split")}
                < {_SPLIT_T_TRAIN} THEN 'train'
           WHEN {_md5_bucket_sql("cluster_id", "split")}
                < {_SPLIT_T_VAL} THEN 'val'
           ELSE 'test'
         END AS split
  FROM lab
)
SELECT split, COUNT(*) AS n_docs,
       COUNT(DISTINCT cluster_id) AS n_clusters
FROM assigned GROUP BY split ORDER BY split
"""


QUERIES = {
    "sample_hash_docs": sample_hash_docs,
    "corpus_cluster_safe_split": corpus_cluster_safe_split,
    "sample_stratified_lang": sample_stratified_lang,
    "sample_weighted_docs": sample_weighted_docs,
    "tfidf_top_terms": tfidf_top_terms,
    "dedup_clusters_exact": dedup_clusters_exact,
    "dedup_clusters_fuzzy": dedup_clusters_fuzzy,
    "pii_scrub_stats": pii_scrub_stats,
}

ORACLE = {
    "sample_hash_docs": _SAMPLE_SQL,
    "corpus_cluster_safe_split": _SPLIT_SQL,
    "sample_stratified_lang": _STRATIFIED_SQL,
    "sample_weighted_docs": _WEIGHTED_SQL,
    "tfidf_top_terms": _TFIDF_SQL,
    "dedup_clusters_exact": _CLUSTERS_EXACT_SQL,
    "pii_scrub_stats": _PII_SQL,
}
