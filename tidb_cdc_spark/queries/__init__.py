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
    batch5,
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
    llm15,
)

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}

for _mod in (
    llm, llm2, llm3, llm4, llm5, llm6, llm7, llm8, llm9, llm10,
    audits, cdcq, llm11, llm12, llm13, llm14, llm15,
    batch, batch2, batch3, batch4, batch5,
):
    QUERIES.update(_mod.QUERIES)
    ORACLE.update(_mod.ORACLE)

# Registry order is load-bearing: the driver's correctness gate checks
# the FIRST 50 entries in insertion order.  GATE names them explicitly.
# Composition (round 7):
# - every gate entry is oracle-checkable (rows-only LSH/IVF/PQ/LBFGS
#   ops are represented by their audit twins from queries/audits.py /
#   llm14.py — planted-copy or planted-contrast contracts DuckDB can
#   verify; the raw forms stay declared right after the window);
# - ~10-16 slots rotate per round, never-gated entries first, so every
#   declared query re-acquires a fresh driver row within a few rounds
#   (the r5 finding: 51 non-gate queries had only stale driver rows).
#   Round 7 rotates IN the ENTIRE never-gated oracle-checkable backlog
#   (dedup_exact_keep_best, dedup_keep_best_audit,
#   corpus_cluster_safe_split, rag_hybrid_rrf, rag_hard_negatives,
#   winnow_overlap_pairs, vocab_drift_top, text_bigram_surprisal,
#   events_value_outliers, events_value_mad_outliers), the two new r7
#   audits (winnow_cap_report, quality_classifier_audit), and four
#   r4-stale rows named by the r6 verdict (events_rolling_features,
#   table_profile_lineitem, events_transition_matrix,
#   events_pivot_by_type — events_value_outliers yielded its slot to
#   the new corpus_perplexity_buckets and queues for r8); OUT
#   sixteen r6-green single-scan rows
#   (unigram surprisal, quality filter, contamination, pack/mix/
#   padding, centroids ×2, snapshot diff, chunk spans, rag topk,
#   repeated spans ×2, hashed-tf... funnel, trailing-30m) — each
#   keeps its r6 driver row + the strict mirror in
#   tests/test_queries_oracle.py (driver-identical compare).
#
# ROUND-8 ROTATION QUEUE (oracled, driver row r4 or older after this
# round — never-gated first): embedding_whiten_audit,
# events_distinct_hll_audit, events_value_outliers,
# rag_rerank_cascade; then the r4 block — q1/q4/q6/q7/q10/q13/q14/
# q15/q16/q17/q19/q20/q22, rollup_revenue, topk_orders_per_customer,
# cube/grouping-sets/setops, events asof/hourly/sliding/cohort/
# gapfill/percentiles/json, sketch_percentiles, sketch_approx,
# price_band_pairs, full_outer_nation_presence,
# suppliers_of_large_parts, scalar/window/date/array showcases.
# Swap ~12-16 in for this round's single-scan text/audit rows.
# (Late-r7: corpus_mojibake_audit and doc_nfc_normalize took the
# doc_hashed_tf / events_heavy_hitters_cms slots — both r6-green,
# both still mirror-checked — so the two newest ops get driver rows
# this round; doc_hashed_tf and the CMS row queue for r8.
# Late-r7 second wave: the four new hash-exact ops
# (corpus_dsir_weights, corpus_dsir_select, rag_bm25_topk,
# text_token_entropy — queries/llm15.py) take the q3/q5/q8/q9 slots;
# those four TPC-H heads are r6-green with r6 driver rows, stay
# mirror-checked, and queue for r8 alongside the r4 block below.)
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
    # round-7 rotation: never-gated backlog + new audits
    "dedup_exact_keep_best",
    "dedup_keep_best_audit",
    "corpus_cluster_safe_split",
    "rag_hybrid_rrf",
    "rag_hard_negatives",
    "winnow_overlap_pairs",
    "winnow_cap_report",
    "vocab_drift_top",
    "text_bigram_surprisal",
    "corpus_perplexity_buckets",
    "events_value_mad_outliers",
    "quality_classifier_audit",
    "events_rolling_features",
    "table_profile_lineitem",
    "events_transition_matrix",
    "events_pivot_by_type",
    # LLM curation surface (audit twins kept from r6)
    "semantic_dedup_audit",
    "embedding_covariance",
    "knn_opq_audit",
    "doc_nfc_normalize",
    "corpus_mojibake_audit",
    "embedding_pca_audit",
    "doc_semantic_dedup_audit",
    "corpus_curation_pipeline",
    # CDC consumers
    "cdc_parse_typed",
    "cdc_apply_latest",
    "cdc_scd2_history",
    "cdc_incremental_agg",
    "cdc_schema_drift",
    "cdc_decimal_agg",
    # late-r7 second wave: new hash-exact selection/retrieval ops
    "corpus_dsir_weights",
    "corpus_dsir_select",
    "rag_bm25_topk",
    "text_token_entropy",
    # plan-complex TPC-H/events (kept from r6 rotation)
    "q18_large_volume_customers",
    "events_sessions",
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
