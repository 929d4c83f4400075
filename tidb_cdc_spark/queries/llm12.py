"""Twelfth wave: language-model-flavored corpus scoring — unigram
surprisal (hash-exact LM-quality proxy, full oracle) and distributed
BPE merge training (iterative; rows-only like KMeans/CC, pinned by an
exact merge-sequence twin test against a pure-Python reference in
tests/test_bpe_lm.py). Registered after the gate window; the gate
rotation can pull ``text_unigram_surprisal`` in a later round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from tidb_cdc_spark.functions.bpe import bpe_train
from tidb_cdc_spark.functions.lm import unigram_surprisal
from tidb_cdc_spark.queries.llm import _docs


def text_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document integer unigram surprisal (bits + µ-bits/token) —
    the quality screen a perplexity filter approximates, in exact
    arithmetic both engines hash identically (functions/lm.py)."""
    return unigram_surprisal(_docs(spark, sf_dir)).orderBy("doc_id")


_SURPRISAL_SQL = r"""
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '\s+'),
                            x -> x <> '')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok GROUP BY doc_id, term
), cnt AS (
  SELECT term, CAST(SUM(tf) AS BIGINT) AS c FROM tf GROUP BY term
), tot AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n FROM cnt
)
SELECT tf.doc_id,
       CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
       CAST(SUM(tf.tf * (length(bin(tot.n)) - length(bin(cnt.c))))
            AS BIGINT) AS sum_bits,
       CAST((CAST(SUM(tf.tf * (length(bin(tot.n)) - length(bin(cnt.c))))
                  AS BIGINT) * 1000000)
            // CAST(SUM(tf.tf) AS BIGINT) AS BIGINT) AS mean_mbits
FROM tf JOIN cnt USING (term) CROSS JOIN tot
GROUP BY tf.doc_id
ORDER BY tf.doc_id
"""


def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 20 BPE merges learned from the corpus (Sennrich ACL'16;
    merge loop runs on the word VOCABULARY, corpus-size-independent —
    functions/bpe.py). Deterministic (total tie order) but iterative,
    so rows-only at the driver; the exact merge sequence is pinned
    against a pure-Python reference implementation in tests."""
    return bpe_train(_docs(spark, sf_dir), n_merges=20).orderBy("rank")


QUERIES = {
    "text_unigram_surprisal": text_unigram_surprisal,
    "bpe_train_merges": bpe_train_merges,
}

ORACLE = {
    "text_unigram_surprisal": _SURPRISAL_SQL,
}
