"""Unigram language-model surprisal — the CCNet-style "how unusual is
this document's vocabulary" quality signal, in EXACT integer
arithmetic so the cross-engine value hash holds.

A real LM perplexity sums ``−log p(token)`` in floating point; libm
``log`` is not bit-identical across engines and summation order
differs, so a hash-gated oracle would flap. The engine's variant
quantizes surprisal to whole bits using the binary-digit-count
identity ``floor_log2(n) = length(bin(n)) − 1`` (exact in Spark and
DuckDB — repo convention since the token-length histogram,
functions/mixing.py): a token occurring ``c`` times in an
``N``-token corpus scores ``floor_log2(N) − floor_log2(c)`` bits —
monotone in the true ``−log2(c/N)`` and within 2 bits of it. Rare
vocabulary ⇒ high bits/token; boilerplate ⇒ low. Useful for the same
screens as LM perplexity (outlier/garbage detection, corpus mixing)
while staying hash-exact.

Scale shape (100 TB): tokenize+explode is a linear codegen scan; per
(doc, term) counts are ONE map-side-combining hash aggregate (shuffle
∝ distinct doc-term pairs, not tokens); corpus term counts aggregate
the tf output (already distinct per doc — COUNT not COUNT DISTINCT);
the corpus total joins as a broadcast 1-row aggregate. Same shape as
functions/tfidf.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tidb_cdc_spark.functions.tfidf import term_frequencies


def unigram_surprisal(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_tokens, sum_bits, mean_mbits) per document with ≥1
    token (zero-token docs have no defined surprisal and drop in both
    engines):

    - ``sum_bits`` = Σ_tokens (floor_log2(N) − floor_log2(c(term))),
      N = corpus token total, c = corpus occurrences of the term;
    - ``mean_mbits`` = sum_bits·10⁶ div n_tokens (truncating integer
      division, Spark ``div`` == DuckDB ``//``) — bits/token in
      µ-units, the per-doc quality score.
    """
    tf = term_frequencies(docs, id_col, text_col)
    cnt = tf.groupBy("term").agg(F.sum("tf").alias("_c"))
    tot = cnt.agg(F.sum("_c").alias("_n"))
    bits = F.length(F.bin(F.col("_n"))) - F.length(F.bin(F.col("_c")))
    per_doc = (
        tf.join(cnt, "term")
        .join(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.sum(F.col("tf") * bits).cast("long").alias("sum_bits"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_tokens",
        "sum_bits",
        F.expr("CAST((sum_bits * 1000000) DIV n_tokens AS BIGINT)").alias(
            "mean_mbits"
        ),
    )
