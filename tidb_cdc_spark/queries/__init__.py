"""Declared query surface: every entry is (Spark DataFrame builder,
DuckDB oracle SQL) — the correctness gate for SURVEY §2 coverage.

Conventions (all load-bearing for the cross-engine value-hash):
- every computed column aliased identically in Spark and SQL;
- money arithmetic in explicitly-cast tight decimals, aggregated
  exactly, cast to double only at the end (see functions/numeric.py);
- double-producing divisions performed on identical doubles in both
  engines (exact-sum cast to double, THEN divide);
- ties in any top-k broken by a unique key column.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from tidb_cdc_spark.queries import (
    audits,
    batch,
    batch2,
    batch3,
    batch4,
    cdcq,
    llm,
    llm2,
    llm3,
    llm4,
    llm5,
    llm6,
    llm7,
    llm8,
    llm9,
    llm10,
    llm11,
    llm12,
    llm13,
    llm14,
)

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}

for _mod in (
    llm, llm2, llm3, llm4, llm5, llm6, llm7, llm8, llm9, llm10,
    audits, cdcq, llm11, llm12, llm13, llm14, batch, batch2, batch3, batch4,
):
    QUERIES.update(_mod.QUERIES)
    ORACLE.update(_mod.ORACLE)

# Registry order is load-bearing: the driver's correctness gate checks
# the FIRST 50 entries in insertion order.  GATE names them explicitly.
# Composition (round 6):
# - every gate entry is oracle-checkable (the 7 rows-only LSH/IVF ops
#   that held gate slots through r5 are replaced by their audit twins
#   from queries/audits.py — planted-copy contracts DuckDB can verify;
#   the raw pair/top-k forms stay declared right after the window);
# - ~10 slots rotate per round between the long-stable LLM scans and
#   the plan-complex TPC-H/events queries, so every declared query
#   re-acquires a fresh driver row within a few rounds (the r5 finding:
#   51 non-gate queries had only stale driver rows).  Round 6 rotates
#   IN q3/q5/q8/q9/q18 + sessionize/funnel/trailing-30m/zorder/salted
#   + the new text_unigram_surprisal, OUT twelve single-scan text/
#   sampling queries (still mirror-checked in
#   tests/test_queries_oracle.py, driver-identical compare).  Late-r6
#   additions take five more slots (semantic-dedup audit, covariance,
#   PCA audit, OPQ audit, CMS heavy hitters) from five r5-green
#   single-scan rows (multimodal/tfidf/int8/token-histogram/vocab —
#   each keeps its r5 driver row + the mirror); the feature-hash
#   wave takes two more (doc_hashed_tf, doc_semantic_dedup_audit)
#   from source_overlap_matrix / quality_budget_head (same r5-green
#   reasoning).
GATE = [
    # exact + audit-twin dedup/ANN surface (all oracle-checkable)
    "dedup_exact_docs",
    "knn_bruteforce_cosine",
    "ann_recall_audit",
    "dedup_minhash_audit",
    "dedup_simhash_audit",
    "dedup_jaccard_audit",
    "dedup_embedding_audit",
    "dedup_clusters_audit",
    "knn_ivf_audit",
    "knn_pq_audit",
    "knn_ivfpq_audit",
    "dedup_clusters_exact",
    # LLM curation surface
    "text_unigram_surprisal",
    "semantic_dedup_audit",
    "embedding_covariance",
    "corpus_quality_filter",
    "contamination_eval_overlap",
    "pack_sequences",
    "embedding_centroids",
    "knn_centroid_assign",
    "corpus_mix_plan",
    "corpus_mix_t2",
    "batch_padding_waste",
    "knn_opq_audit",
    "events_heavy_hitters_cms",
    "doc_hashed_tf",
    "embedding_pca_audit",
    "doc_semantic_dedup_audit",
    "corpus_snapshot_diff",
    "doc_chunk_spans",
    "corpus_curation_pipeline",
    "rag_retrieve_topk",
    "repeated_spans_top",
    "span_dup_coverage",
    # CDC consumers
    "cdc_parse_typed",
    "cdc_apply_latest",
    "cdc_scd2_history",
    "cdc_incremental_agg",
    "cdc_schema_drift",
    "cdc_decimal_agg",
    # round-6 rotation: plan-complex TPC-H/events queries
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q8_market_share",
    "q9_product_type_profit",
    "q18_large_volume_customers",
    "events_sessions",
    "events_funnel",
    "events_trailing_30m",
    "events_zorder_buckets",
    "skew_salted_agg",
]

assert len(GATE) == 50 and len(set(GATE)) == 50, "gate must be 50 distinct"
_missing = [n for n in GATE if n not in QUERIES]
assert not _missing, f"gate names not in registry: {_missing}"
_unoracled = [n for n in GATE if n not in ORACLE]
assert not _unoracled, f"gate entries without an oracle: {_unoracled}"

_gate_set = set(GATE)
QUERIES = {
    n: QUERIES[n] for n in [*GATE, *(n for n in QUERIES if n not in _gate_set)]
}
