"""Sixteenth wave (round 8): fit-free dimensionality reduction and
the duplicated-span REMOVAL rewrite.

- ``embedding_random_projection`` — seeded ±1 Johnson-Lindenstrauss
  projection (functions/projection.py), hash-exact cross-engine: the
  sign matrix is md5-derived DRIVER-SIDE into plain literals shared
  by both engines, and the projection is an integer signed sum over
  the 2⁻²⁰ fixed-point quantized vector.
- ``dedup_span_rewrite`` — Lee et al. 2022 substring dedup as an
  actual corpus rewrite (functions/quality.py::span_dedup_rewrite):
  positions covered by a cross-document duplicated ≥12-token span
  are removed everywhere except the span's minimum-doc_id keeper
  (the position-coverage contract — see the function docstring for
  the overlapping-spans caveat); hash-exact string oracle.

Reference scope note: the reference engine (dollarkillerx/tidb-cdc)
has no corpus/vector surface; north-star pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tidb_cdc_spark.functions.projection import (
    random_project,
    random_project_sql,
)
from tidb_cdc_spark.functions.quality import span_dedup_rewrite
from tidb_cdc_spark.queries.llm import _docs

_DIM = 64
_K = 8
_SPAN = 12


def embedding_random_projection(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """64-d embeddings → 8 exact integer JL coordinates. Map-only:
    the plan is a single project over the scan — no shuffle, no
    Python, no fitted model (plan-pinned)."""
    vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return random_project(vecs, d=_DIM, k=_K).orderBy("vec_id")


def dedup_span_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cleaned corpus after cross-doc duplicated-span removal — the
    output artifact of the Lee et al. pipeline step. Fully string-
    exact cross-engine (md5 span keys, deterministic keeper)."""
    return span_dedup_rewrite(
        _docs(spark, sf_dir), span_tokens=_SPAN
    ).orderBy("doc_id")


_SPAN_REWRITE_SQL = rf"""
WITH tl AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\s+'),
                     x -> x <> '') AS lo,
         list_filter(string_split_regex(lower(text), '\s+'),
                     x -> x <> '') AS l
  FROM documents
), tln AS (SELECT doc_id, lo, l, len(l) AS n FROM tl),
sh AS (
  SELECT doc_id, i - 1 AS pos,
         md5(array_to_string(l[i : i + {_SPAN} - 1], ' ')) AS h
  FROM (
    SELECT doc_id, l, unnest(range(1, n - {_SPAN} + 2)) AS i
    FROM tln WHERE n >= {_SPAN}
  )
  UNION ALL
  SELECT doc_id, 0 AS pos, md5(array_to_string(l, ' ')) AS h
  FROM tln WHERE n > 0 AND n < {_SPAN}
),
stats AS (
  SELECT h, COUNT(*) AS nd, MIN(doc_id) AS keeper
  FROM (SELECT DISTINCT doc_id, h FROM sh)
  GROUP BY h HAVING COUNT(*) >= 2
),
covered AS (
  SELECT DISTINCT doc_id, unnest(range(pos, pos + {_SPAN})) AS p
  FROM sh JOIN stats USING (h)
  WHERE doc_id <> keeper
),
tok AS (
  SELECT doc_id, i - 1 AS p, lo[i] AS tok
  FROM (
    SELECT doc_id, lo, unnest(range(1, n + 1)) AS i
    FROM tln WHERE n > 0
  )
),
kept AS (
  SELECT t.doc_id, t.p, t.tok
  FROM tok t
  LEFT JOIN covered c ON t.doc_id = c.doc_id AND t.p = c.p
  WHERE c.p IS NULL
),
agg AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS text_clean,
         COUNT(*) AS n_kept
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(a.text_clean, '') AS text_clean,
       CAST(COALESCE(tn.n, 0) AS BIGINT) AS n_tokens,
       CAST(COALESCE(tn.n, 0) - COALESCE(a.n_kept, 0) AS BIGINT)
         AS n_removed
FROM documents d
LEFT JOIN tln tn USING (doc_id)
LEFT JOIN agg a USING (doc_id)
ORDER BY doc_id
"""


def events_engagement_pagerank(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact integer PageRank (functions/pagerank.py) over the
    user↔event_type bipartite engagement graph: distinct (user,
    type) pairs as edges in BOTH directions, 5 iterations, top 25
    nodes by rank (node string tiebreak). The iterative-algorithm
    archetype with a fully unrolled hash-exact DuckDB oracle."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pairs = ev.select(
        F.concat(F.lit("u:"), F.col("user_id").cast("string")).alias("u"),
        F.concat(F.lit("t:"), F.col("event_type")).alias("t"),
    ).distinct()
    edges = pairs.select(
        F.col("u").alias("src"), F.col("t").alias("dst")
    ).unionByName(
        pairs.select(F.col("t").alias("src"), F.col("u").alias("dst"))
    )
    from tidb_cdc_spark.functions.pagerank import pagerank

    return (
        pagerank(edges, iters=5)
        .orderBy(F.desc("rank_mu"), "node")
        .limit(25)
    )


_PAGERANK_EDGES_CTE = """pairs AS (
  SELECT DISTINCT 'u:' || CAST(user_id AS VARCHAR) AS u,
                  't:' || event_type AS t
  FROM events
), edges AS (
  SELECT u AS src, t AS dst FROM pairs
  UNION ALL
  SELECT t AS src, u AS dst FROM pairs
)"""

from tidb_cdc_spark.functions.pagerank import pagerank_sql  # noqa: E402

_PAGERANK_SQL = pagerank_sql(
    _PAGERANK_EDGES_CTE,
    iters=5,
    select=(
        "SELECT node, rank_mu FROM r{T} "
        "ORDER BY rank_mu DESC, node LIMIT 25"
    ),
)


def corpus_collocations_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 collocations by whole-bit PMI with a count-5 floor
    (functions/lm.py::collocations) — multi-word-expression /
    tokenizer-merge candidates, hash-exact."""
    from tidb_cdc_spark.functions.lm import collocations

    return collocations(_docs(spark, sf_dir), min_count=5, k=25)


_COLLOC_SQL = r"""
WITH tl AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\s+'),
                     x -> x <> '') AS l
  FROM documents
), tok AS (
  SELECT doc_id, i, l[i] AS w
  FROM (SELECT doc_id, l, unnest(range(1, len(l) + 1)) AS i FROM tl)
), uc AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY w
), bg AS (
  SELECT doc_id, i, l[i] AS w1, l[i + 1] AS w2
  FROM (SELECT doc_id, l, unnest(range(1, len(l))) AS i FROM tl)
), bc AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
  FROM bg GROUP BY w1, w2
), tot AS (SELECT CAST(SUM(c12) AS BIGINT) AS n FROM bc)
SELECT bc.w1, bc.w2, bc.c12,
       CAST(length(bin(bc.c12)) + length(bin(tot.n))
            - length(bin(u1.c)) - length(bin(u2.c)) AS BIGINT)
         AS pmi_bits
FROM bc
JOIN uc u1 ON u1.w = bc.w1
JOIN uc u2 ON u2.w = bc.w2, tot
WHERE bc.c12 >= 5
ORDER BY pmi_bits DESC, w1, w2
LIMIT 25
"""


def corpus_tokenizer_fertility(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-language tokenizer fertility — the statistic a
    multilingual pretraining run tracks to budget its vocabulary
    (languages a tokenizer splits into more sub-words per word cost
    more sequence length per sentence): words (whitespace tokens),
    sub-words (the BPE-ish regex segmentation, functions/text.py),
    chars, and the µ-unit ratios subwords/word and chars/word.
    All-integer arithmetic — hash-exact.

    Scale: single scan, per-row codegen counting expressions, one
    map-side-combining groupBy on the #languages-sized key."""
    from tidb_cdc_spark.functions.text import (
        bpe_token_count,
        token_count,
    )

    d = _docs(spark, sf_dir).select(
        "lang",
        token_count(F.col("text")).cast("long").alias("_w"),
        bpe_token_count(F.col("text")).cast("long").alias("_s"),
        F.length("text").cast("long").alias("_c"),
    )
    return (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_w").alias("n_words"),
            F.sum("_s").alias("n_subwords"),
            F.sum("_c").alias("n_chars"),
        )
        .select(
            "lang",
            "n_docs",
            "n_words",
            "n_subwords",
            "n_chars",
            F.expr("(n_subwords * 1000000L) div greatest(n_words, 1)")
            .alias("fertility_ppm"),
            F.expr("(n_chars * 1000000L) div greatest(n_words, 1)")
            .alias("chars_per_word_ppm"),
        )
        .orderBy("lang")
    )


_FERTILITY_SQL = r"""
WITH d AS (
  SELECT lang,
         CAST(len(list_filter(string_split_regex(text, '\s+'),
                              x -> x <> '')) AS BIGINT) AS w,
         CAST(len(regexp_extract_all(text,
              '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS s,
         CAST(length(text) AS BIGINT) AS c
  FROM documents
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(w) AS BIGINT) AS n_words,
       CAST(SUM(s) AS BIGINT) AS n_subwords,
       CAST(SUM(c) AS BIGINT) AS n_chars,
       CAST((SUM(s) * 1000000) // GREATEST(SUM(w), 1) AS BIGINT)
         AS fertility_ppm,
       CAST((SUM(c) * 1000000) // GREATEST(SUM(w), 1) AS BIGINT)
         AS chars_per_word_ppm
FROM d GROUP BY lang ORDER BY lang
"""


def dedup_minhash_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-pair MinHash-LSH (functions/dedup.py::
    minhash_lsh_star_pairs): per-bucket hub→member pairs — LINEAR in
    near-dup family size where the clique form is quadratic (the
    1×/10×/100× curve's finding), with identical connected
    components for every cluster consumer. Rows-only (xxhash64
    signatures, like dedup_minhash_lsh); the connectivity contract
    is oracle-gated by ``dedup_minhash_star_audit``."""
    from tidb_cdc_spark.functions import dedup as D

    return D.minhash_lsh_star_pairs(_docs(spark, sf_dir)).orderBy(
        "id_a", "id_b"
    )


def corpus_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-quota 80/10/10 per-source split
    (functions/sampling.py::exact_stratified_split): md5-ordered
    banded rank within each source, quota boundaries as exact
    integer floors — hash-exact cross-engine."""
    from tidb_cdc_spark.functions.sampling import exact_stratified_split

    return exact_stratified_split(_docs(spark, sf_dir)).orderBy(
        "source", "rank"
    )


_STRAT_SPLIT_SQL = """
WITH ranked AS (
  SELECT doc_id, source,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY md5('split-v1:' || CAST(doc_id AS VARCHAR)), doc_id
         ) AS BIGINT) AS rank,
         COUNT(*) OVER (PARTITION BY source) AS n
  FROM documents
)
SELECT doc_id, source, rank,
       CASE WHEN rank * 1000000 <= n * 800000 THEN 'train'
            WHEN rank * 1000000 <= n * 900000 THEN 'val'
            ELSE 'test' END AS split
FROM ranked ORDER BY source, rank
"""


def rag_retrieval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval scorecard (functions/similarity.py::
    retrieval_metrics): exact top-10 cosine retrieval for 20 query
    vectors, judged against the same-label relevance set — per-query
    hits@10 / first-hit rank / reciprocal rank / bounded recall, all
    integer µ. The evaluation harness every retrieval change should
    re-run; swaps to the LSH/IVF arm unchanged at scale."""
    from tidb_cdc_spark.functions import similarity as S

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 20)
    results = S.knn_bruteforce(q, e, k=10)
    lab = e.select("vec_id", "label")
    gold = (
        q.select(F.col("vec_id").alias("query_id"), "label")
        .join(
            lab.select(F.col("vec_id").alias("neighbor_id"), "label"),
            "label",
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
    )
    return S.retrieval_metrics(results, gold, k=10).orderBy("query_id")


_RETR_EVAL_SQL = """
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv, label
  FROM embeddings WHERE vec_id < 20
), c AS (
  SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv, label
  FROM embeddings
), scored AS (
  SELECT query_id, neighbor_id,
         list_inner_product(qv, cv)
           / (sqrt(list_inner_product(qv, qv))
              * sqrt(list_inner_product(cv, cv))) AS score
  FROM q, c WHERE query_id <> neighbor_id
), ranked AS (
  SELECT query_id, neighbor_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY score DESC, neighbor_id)
              AS BIGINT) AS rank
  FROM scored
), res AS (
  SELECT query_id, neighbor_id, rank FROM ranked WHERE rank <= 10
), gold AS (
  SELECT q.query_id, c.neighbor_id
  FROM q JOIN c USING (label)
  WHERE c.neighbor_id <> q.query_id
), ng AS (
  SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_gold
  FROM gold GROUP BY query_id
), hits AS (
  SELECT res.query_id,
         CAST(COUNT(*) AS BIGINT) AS hits_at_k,
         CAST(MIN(res.rank) AS BIGINT) AS first
  FROM res JOIN gold USING (query_id, neighbor_id)
  GROUP BY res.query_id
)
SELECT ng.query_id, ng.n_gold,
       CAST(COALESCE(hits.hits_at_k, 0) AS BIGINT) AS hits_at_k,
       CAST(COALESCE(hits.first, 0) AS BIGINT) AS first_hit_rank,
       CAST(CASE WHEN hits.first IS NOT NULL
                 THEN 1000000 // hits.first ELSE 0 END AS BIGINT)
         AS rr_mu,
       CAST((COALESCE(hits.hits_at_k, 0) * 1000000)
            // LEAST(10, ng.n_gold) AS BIGINT) AS recall_mu
FROM ng LEFT JOIN hits USING (query_id)
ORDER BY query_id
"""


QUERIES = {
    "rag_retrieval_eval": rag_retrieval_eval,
    "corpus_stratified_split": corpus_stratified_split,
    "embedding_random_projection": embedding_random_projection,
    "dedup_span_rewrite": dedup_span_rewrite,
    "events_engagement_pagerank": events_engagement_pagerank,
    "corpus_collocations_pmi": corpus_collocations_pmi,
    "corpus_tokenizer_fertility": corpus_tokenizer_fertility,
    "dedup_minhash_star": dedup_minhash_star,
}

ORACLE = {
    "rag_retrieval_eval": _RETR_EVAL_SQL,
    "corpus_stratified_split": _STRAT_SPLIT_SQL,
    "embedding_random_projection": random_project_sql(d=_DIM, k=_K),
    "dedup_span_rewrite": _SPAN_REWRITE_SQL,
    "events_engagement_pagerank": _PAGERANK_SQL,
    "corpus_collocations_pmi": _COLLOC_SQL,
    "corpus_tokenizer_fertility": _FERTILITY_SQL,
}
