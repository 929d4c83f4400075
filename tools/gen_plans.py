"""Regenerate PLANS.md — formatted explains of representative queries
with their scale-critical properties. Run: python tools/gen_plans.py"""

from __future__ import annotations

import contextlib
import io
import re

PICKS = {
    "q3_shipping_priority": "broadcast dims + single shuffle agg",
    "q6_forecast_revenue": "full predicate pushdown to the parquet scan",
    "events_asof_purchase_click": "as-of join: union-sort, ONE hash exchange",
    "events_trailing_30m": "time-RANGE frame: one user_id exchange serves both windows",
    "dedup_minhash_lsh": "banded LSH self-join: ids-only shuffle, signatures re-attached",
    "cdc_scd2_history": "parse -> one PK exchange for both window passes",
    "corpus_curation_pipeline": "4-stage funnel, all JVM-side",
    "cdc_decimal_agg": "decimal(12,2) parse + exact decimal agg, all codegen",
    "cdc_schema_drift": "string-map drift probe: explode of (usually empty) arrays, tiny-key shuffle",
    "repeated_spans_top": "span fingerprints: shingle window + map-side-combining span groupBy, TakeOrdered top-100",
    "dedup_simhash": "Manku 20-table candidate join: guarded keyed frame cached once, both join sides read the cache",
    "text_unigram_surprisal": "tf hash-agg -> term-count join -> broadcast 1-row total; integer-only arithmetic",
    "dedup_exact_keep_best": "two-stage keep-best: codegen HashAggregate does the data-sized reduction, struct-min SortAggregate only on reduced rows",
    "events_value_mad_outliers": "median/MAD robust screen: two #types-sized percentile aggs broadcast back, zero event-row shuffles",
    "embedding_covariance": "4x4 covariance block: ONE scalar agg of 21 partial sums, zero data shuffles, 1-row result exploded to the grid",
    "semantic_dedup_prune": "SemDeDup: k-means cell exchange feeds the chunked-gemm pandas group prune — one data shuffle total",
    "embedding_pca_project": "PCA projection: Arrow-batched matmul over the scan, fit reduced to d*d+d+1 scalars eagerly",
    "events_heavy_hitters_cms": "CMS heavy hitters: cell-table build is a bounded combining agg; screen joins broadcast cell slices; verify is a broadcast null-safe semi join + combining count",
    "winnow_overlap_pairs": "winnowing: one shingle window pass clustered on doc, integer window-min selection, fp equi-join with broadcast viral-cap anti-join",
    "vocab_drift_top": "term drift: two combining term aggs, vocabulary-sized full-outer join, TakeOrderedAndProject top-50",
    "text_bigram_surprisal": "bigram surprisal: token scan + one window lead, per-(doc,bigram) combining agg, co-partitioned bigram-count join",
    "corpus_perplexity_buckets": "CCNet split: banded two-level rank — per-band counts on a tiny window, row_number partitioned BY band; no single-task global window",
    "rag_rerank_cascade": "retrieve-then-rerank: broadcast-query dense top-20, pairwise Jaccard re-score touches only k*queries pairs",
    "winnow_cap_report": "cap audit: one fp pass reused (materialized) by the freq agg and the broadcast semi-join doc count",
    "events_distinct_hll_audit": "mergeable HLL: two half-corpus sketch aggs union-merged per group; exact distinct shares the scan",
    "corpus_dsir_select": "DSIR: dim-row log-ratio table broadcast onto sparse TF; selection rank banded (row_number partitioned BY weight band)",
    "rag_bm25_topk": "BM25: query-term x idf table broadcast onto postings, combining (query,doc) agg, SPARK-37099 rank-filter top-k",
    "text_token_entropy": "token entropy: tf agg, per-doc window, and final agg all reuse the doc_id fan-out — ONE hash exchange total",
    "q2_min_cost_supplier": "Q2 shape: window-min decorrelation — SINGLE lineitem scan, broadcast region-supplier dim, no float-key self-join",
    "q21_waiting_suppliers": "Q21 shape: left-semi (EXISTS) + left-anti (NOT EXISTS) self-joins on orderkey, ids-only projections",
    "embedding_random_projection": "JL projection: pure per-row expression — no hash exchange or Python (only the presentation sort), sign matrix as plan literals",
    "dedup_span_rewrite": "span removal: md5-key span stats, (doc,pos) flag join, ONE per-doc aggregation for text+counts",
    "events_engagement_pagerank": "integer PageRank: loop-invariant edge/node tables checkpointed once, per-iteration join + combining agg",
    "corpus_collocations_pmi": "PMI collocations: one bigram combining agg, two vocab joins, broadcast total, TakeOrdered top-k",
    "winnow_repr_pipeline": "composed family-collapse -> winnow: star-LSH pairs (ids-only) -> CC (checkpoint-truncated loop) -> rep filter -> winnow fp equi-join; within-family quadratic output gone",
    "corpus_lm_stupid_backoff": "stupid-backoff LM: 3 combining count aggs on train; denominators folded into count tables (vocab joins) so the scored side does 3 corpus-scale left joins, not 5",
    "dedup_containment_pairs": "containment: md5-shingle inverted index, broadcast viral anti-join, per-pair combining count; (id, md5) rows only through the self-join",
    "contamination_containment_screen": "decontamination screen: ONE materialized shingle table feeds both arms; join DIRECTED eval->train from the start (no train x train branch); broadcast viral anti-join",
    "dedup_containment_repr": "composed family-collapse -> containment: star-LSH pairs (ids-only) -> CC (checkpoint-truncated loop) -> rep filter -> containment inverted-index join; within-family quadratic pair output gone",
    "corpus_lm_quality_buckets": "CCNet composition: stupid-backoff scored side materialized ONCE, min/max/count agg + banded rank both read the cache; row_number partitioned BY score band",
    "multimodal_probe_audit": "container probe: two Arrow-batched mapInPandas passes (synth -> parse) over id-sized rows; bytes never survive into the output",
    "multimodal_frame_plan": "probe -> frame plan: mapInPandas chain feeds a codegen sequence/explode — one row per sampling timestamp, no Python past the probe",
    "multimodal_image_audit": "image-header probe: two Arrow-batched mapInPandas passes (synth -> parse) over id-sized rows, header-only payloads dropped before the presentation sort",
    "multimodal_dedup_audit": "media payload dedup: JVM-side sha2 on the binary column feeding ONE combining distinct-agg — no Python past the sanctioned synth/probe passes",
    "multimodal_phash_audit": "pixel perceptual near-dup: synth -> decode/hash Arrow passes emit 24 B hash rows (payloads never shuffle), materialized once for three agg consumers; pair stage is the Manku banded equi-join",
    "media_curation_pipeline": "composed media curation: sha2 min-id exact dedup (32 B digest shuffle) -> perceptual collapse over survivors only (hash rows -> banded pairs -> checkpoint-truncated CC) -> 1-row scorecard",
    "multimodal_audio_audit": "audio sample-path near-dup: synth -> PCM decode/fingerprint Arrow passes emit 16 B rows, materialized for three agg consumers; pair stage is the shared Manku banded equi-join",
    "multimodal_video_audit": "video frame-path near-dup: synth -> AVI frame decode/hash Arrow passes emit 28 B frame rows, materialized; pair stage is the inverted-index frame-hash equi-join (viral-frame capped in the generic op)",
    "multimodal_audio_trim_audit": "trim-robust audio near-dup: synth -> PCM decode -> per-window fingerprint Arrow passes emit ~20 B window rows, materialized; pair stage is the same inverted-index containment join as video",
    "multimodal_dct_phash_audit": "DCT pHash near-dup: synth -> decode -> 32x32 box means -> 2-D DCT Arrow passes emit 16 B hash rows (payloads never shuffle); pair stage is the Manku banded equi-join",
    "audio_curation_pipeline": "composed audio curation: sha2 min-id exact dedup (32 B digest shuffle) -> trim-robust window collapse over survivors only (window hashes -> inverted-index pairs -> checkpoint-truncated CC) -> 1-row scorecard",
    "video_curation_pipeline": "composed video curation: sha2 min-id exact dedup -> shot-level frame-hash collapse over survivors only (frame hashes -> inverted-index pairs -> checkpoint-truncated CC) -> 1-row scorecard",
    "phash_cap_report": "no-silent-caps audit: ONE Manku explode + bucket-count window pass (the guarded pair join's own shape minus the self-join), two 1-row aggs crossed via broadcast",
    "video_frame_cap_report": "no-silent-caps audit: distinct (id,fhash) -> frequency agg; viral list broadcast back for the affected-media semi-join",
    "multimodal_png_deep_audit": "full-envelope PNG audit (shape shared by all r13 codec audits): synth -> decode/hash Arrow passes emit 24 B hash rows, materialized once for three agg consumers; compressed decode rides inside the same pass as BMP",
    "multimodal_jpeg_prog_audit": "progressive-JPEG audit: same synth -> decode/hash -> Manku-pair shape; the multi-scan entropy pass stays inside the Arrow stage, reconstruction is one einsum per batch",
    "multimodal_webp_phash_audit": "VP8L lossless-WebP audit: same synth -> decode/hash -> Manku-pair shape; prefix-code/LZ77/transform machinery all inside the Arrow stage, 24 B hash rows shuffle",
    "multimodal_webp_lossy_audit": "lossy-VP8 WebP audit (r14): same synth -> decode/hash -> Manku-pair shape; the ctypes libwebp decode rides the Arrow stage exactly like the pure paths, 24 B hash rows shuffle",
    "animated_gif_video_audit": "animated-GIF frame path (r14): synth -> per-block LZW decode + logical-screen composition inside the Arrow pass -> 28 B frame rows; pair stage is the shared inverted-index frame-hash equi-join",
    "multimodal_anim_probe_audit": "animation header probe (r14): two Arrow-batched mapInPandas passes (synth -> header-only walk) over id-sized rows; frame bitstreams length-skipped, payloads dropped before the presentation sort",
    "animated_webp_video_audit": "animated-WebP frame path (r14): per-ANMF VP8L decode + rect composition inside the Arrow pass -> 28 B frame rows; pair stage is the shared inverted-index frame-hash equi-join",
    "multimodal_audio_probe_audit": "compressed-audio duration probe (r14): synth -> FLAC/MP3 header-only walk, two Arrow passes over id-sized rows, payloads never shuffle",
    "audio_g711_audit": "G.711 companded-audio collapse (r14): synth -> LUT expansion + fingerprint Arrow passes emit 16 B rows; pair stage is the shared Manku banded equi-join",
    "multimodal_tiff_phash_audit": "baseline-TIFF audit (r14): same synth -> decode/hash -> Manku-pair shape; IFD walk + strip assembly all numpy inside the Arrow stage, 24 B hash rows shuffle",
    "multimodal_mjpeg_video_audit": "MJPEG frame path (r14): per-00dc baseline-JPEG decode (K.3 DHT injection for AVI1 frames) inside the Arrow pass -> 28 B frame rows; pair stage is the shared inverted-index frame-hash equi-join",
    "audio_adpcm_audit": "IMA ADPCM collapse (r14): per-block adaptive 4-bit decode + fingerprint Arrow passes emit 16 B rows; pair stage is the shared Manku banded equi-join",
    "warc_ingest_audit": "WARC ingest census (r14): synth -> ISO 28500 record walk + HTTP/gzip/chunked decode in one Arrow pass; census aggregates on md5/status/len columns, bodies never shuffle past the materialize",
    "corpus_html_extract": "HTML->text extraction (r14): regexp_replace/replace column chain — NO Python stage of any kind, extraction runs at scan speed inside codegen; true cross-engine md5 oracle",
    "crawl_html_pipeline": "crawl front end e2e (r14): WARC walk + HTTP/gzip decode in the one Arrow pass, then the JVM html_strip_tags chain and census — the only Python stage is the record walk itself",
    "animated_apng_video_audit": "animated-PNG frame path (r14): per-frame fdAT zlib rewrap through the still PNG decoder + fcTL rect composition inside the Arrow pass -> 28 B frame rows; pair stage is the shared inverted-index frame-hash equi-join",
}

HEADER = (
    "# PLANS — physical-plan audit of representative queries\n\n"
    'Generated by `tools/gen_plans.py` from `.explain("formatted")` at\n'
    "sf0.001 (plans are data-size independent below AQE;\n"
    "`tests/test_plans.py` pins the scale-critical properties as\n"
    "assertions so they cannot regress). Things to check in each tree:\n"
    "`PushedFilters`/`ReadSchema` at the scans (pushdown + pruning),\n"
    "`BroadcastHashJoin` for dim joins, `Exchange hashpartitioning`\n"
    "count (shuffles), and the absence of `BatchEvalPython` (no Python\n"
    "in hot paths).\n\n"
)


def main() -> None:
    from tidb_cdc_spark.queries import QUERIES
    from tidb_cdc_spark.session import get_spark

    spark = get_spark("plans")
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.001"
    out = []
    for name, note in PICKS.items():
        df = QUERIES[name](spark, sf)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        head = plan.split("\n\n")[0]
        scans = "\n".join(
            l for l in plan.splitlines() if re.search(r"PushedFilters|ReadSchema", l)
        )
        out.append(
            f"## {name}\n\n_{note}_\n\n```\n{head}\n```\n\n"
            f"Scan details:\n```\n{scans[:2000]}\n```\n"
        )
    with open("PLANS.md", "w") as f:
        f.write(HEADER + "\n".join(out))
    spark.stop()


if __name__ == "__main__":
    main()
