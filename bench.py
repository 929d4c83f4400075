"""Benchmark harness: runs the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:
``{"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec}, "sf": ...}``.

Each query is fully materialized via a cheap count-style action
(``df.count()`` after the query's own sort/limit), which forces the
whole plan without driver-side collection overhead.
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from tidb_cdc_spark import get_spark
    from tidb_cdc_spark.queries import QUERIES

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + file listing + Python-UDF worker fleet so
    # per-query timings measure the query, not session bootstrap
    # (forking 32 workers that each import pandas costs ~5 s once;
    # production executors keep workers warm across jobs)
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        return s

    spark.range(0, 3200, 1, 32).select(_warm(F.col("id")).alias("v")).agg(
        F.sum("v")
    ).collect()

    names = [
        "q1_pricing_summary",
        "q3_shipping_priority",
        "q5_local_supplier_volume",
        "q6_forecast_revenue",
        "q7_volume_shipping",
        "q8_market_share",
        "q9_product_type_profit",
        "q10_returned_items",
        "q13_customer_distribution",
        "q15_top_supplier",
        "q18_large_volume_customers",
        "q19_discounted_revenue",
        "q20_promo_part_suppliers",
        "topk_orders_per_customer",
        "rollup_revenue",
        "events_hourly",
        "events_sessions",
        "events_asof_purchase_click",
        "cdc_parse_typed",
        "cdc_apply_latest",
        "cdc_scd2_history",
        "cdc_decimal_agg",
        "dedup_exact_docs",
        "dedup_exact_keep_best",
        "text_lang_id",
        "knn_bruteforce_cosine",
        "knn_lsh_cosine",
        "dedup_minhash_lsh",
        "dedup_simhash",
        "tfidf_top_terms",
        "dedup_clusters_exact",
        "corpus_quality_filter",
        "contamination_eval_overlap",
        "repeated_spans_top",
        "pack_sequences",
        "corpus_mix_plan",
        "knn_centroid_assign",
        "vocab_top_terms",
        "source_overlap_matrix",
        "embedding_int8_quantize",
        "quality_budget_head",
        "corpus_snapshot_diff",
        "events_value_mad_outliers",
        "corpus_curation_pipeline",
        "rag_hybrid_rrf",
        "semantic_dedup_prune",
        "embedding_covariance",
        "embedding_pca_project",
        "knn_opq_adc",
        "events_heavy_hitters_cms",
        "rag_hard_negatives",
        "rag_rerank_cascade",
        "doc_semantic_dedup",
        "winnow_overlap_pairs",
        "vocab_drift_top",
        "text_bigram_surprisal",
        "corpus_perplexity_buckets",
        "doc_nfc_normalize",
        "quality_classifier_eval",
        # late-r7 second wave (corpus_dsir_weights is subsumed by
        # the select, which computes the weights as its first pass)
        "corpus_dsir_select",
        "rag_bm25_topk",
        "text_token_entropy",
        # r8: the two plan-complex new TPC-H shapes (q11/q12 are
        # single-join aggs already represented by q14/q4 cost-wise)
        "q2_min_cost_supplier",
        "q21_waiting_suppliers",
        # r8: the Lee-et-al. span-removal rewrite (full shingle +
        # reconstruction pipeline — a heavy honest op)
        "dedup_span_rewrite",
        # r8: iterative graph op + collocation statistic
        "events_engagement_pagerank",
        "corpus_collocations_pmi",
        # r8: linear-in-family star-pair LSH (the 100x-curve fix)
        "dedup_minhash_star",
    ]
    timings: dict[str, float] = {}
    raw: dict[str, list[float]] = {}
    for name in names:
        fn = QUERIES[name]
        # min of N runs: single-shot numbers on a shared box swing
        # ±30% with ambient load; the min measures the engine.  Two
        # warm runs normally; when they disagree by >15% the box was
        # loaded mid-run, so keep sampling (up to 4) until two runs
        # agree — the min of a noisy pair is itself noisy upward.
        runs: list[float] = []
        while True:
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            runs.append(time.perf_counter() - t0)
            if len(runs) >= 2:
                two = sorted(runs)[:2]
                if two[1] - two[0] <= 0.15 * two[0] or len(runs) >= 4:
                    break
        raw[name] = [round(r, 3) for r in runs]
        timings[name] = round(min(runs), 3)
        print(f"# {name}: {timings[name]}s {raw[name]}", file=sys.stderr, flush=True)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                # NOTE: keep this stdout line compact (< ~4 KiB) —
                # the driver's tail capture truncates longer lines
                # and records parsed:null (raw per-run arrays already
                # stream to stderr as "# name: ..." lines above).
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
