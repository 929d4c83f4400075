"""Scale rehearsal: synthesize a ~10x events/documents dataset and
run the heaviest declared operators on it — surfacing memory cliffs,
shuffle blowups, and convergence pathologies that AQE hides at sf0.1.

Usage: python3 tools/scale_rehearsal.py [out_dir]

Writes replicated tables to ``out_dir`` (default
/tmp/spark_graft_sf1x10) — NEVER into /root/testdata — then times
each op twice (min reported, same convention as bench.py). Documents
are replicated with a per-replica perturbation token so near-dup
structure stays realistic (~doc-sized clusters, not 10x-everything);
replica 1 keeps the text EXACT to stress the dedup/cluster path with
planted 2-node clusters corpus-wide. Events shift ids/users so key
cardinality scales with volume (a 10x stream has more users, not 10x
hotter keys).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPLICAS = 10


def ensure_replicas(spark, src: str, out: str, replicas: int) -> None:
    """Build the replica set at ``out`` iff absent — the ONE shared
    bootstrap for every tool that must profile IDENTICAL data
    (scale_curve, pagerank_profile; review catch: two hand-copied
    exists-check + REPLICAS-monkeypatch blocks would silently
    desynchronize). Presence requires ALL THREE synthesized tables
    (build writes documents -> events -> embeddings), so a half-built
    dir from a mid-build crash triggers a rebuild instead of being
    consumed stale."""
    global REPLICAS
    if all(
        os.path.exists(f"{out}/{t}.parquet")
        for t in ("documents", "events", "embeddings")
    ):
        return
    orig = REPLICAS
    REPLICAS = replicas
    try:
        build(spark, src, out)
    finally:
        REPLICAS = orig


def build(spark, src: str, out: str) -> None:
    from pyspark.sql import functions as F

    from tidb_cdc_spark.session import read_table

    os.makedirs(out, exist_ok=True)
    docs = read_table(spark, src, "documents")
    # id stride = max+1 (NOT row count): sparse id spaces would make
    # count-based offsets collide across replicas
    n_docs = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    parts = []
    for k in range(REPLICAS):
        d = docs.withColumn("doc_id", F.col("doc_id") + F.lit(k * n_docs))
        if k == 0:
            pass  # originals
        elif k == 1:
            pass  # exact text copies under new ids → planted dup pairs
        else:
            d = d.withColumn(
                "text", F.concat(F.col("text"), F.lit(f" r{k} "), F.col("doc_id"))
            )
        parts.append(d)
    big_docs = parts[0]
    for p in parts[1:]:
        big_docs = big_docs.unionByName(p)
    big_docs.repartition(32).write.mode("overwrite").parquet(f"{out}/documents.parquet")

    ev = read_table(spark, src, "events")
    n_ev = ev.agg(F.max("event_id")).collect()[0][0] + 1
    n_users = ev.agg(F.max("user_id")).collect()[0][0] + 1
    eparts = []
    for k in range(REPLICAS):
        eparts.append(
            ev.withColumn("event_id", F.col("event_id") + F.lit(k * n_ev))
            .withColumn("user_id", F.col("user_id") + F.lit(k * n_users))
            .withColumn("ts", F.col("ts") + F.expr(f"INTERVAL {k} SECONDS"))
        )
    big_ev = eparts[0]
    for p in eparts[1:]:
        big_ev = big_ev.unionByName(p)
    big_ev.repartition(32).write.mode("overwrite").parquet(f"{out}/events.parquet")

    # embeddings: replica 0 = originals, replica 1 = EXACT copies
    # (corpus-wide planted semantic-dup pairs for semdedup/PCA-audit
    # style ops), replicas 2+ perturbed by deterministic per-(id,
    # replica, dim) pseudo-noise so they stay mostly unique
    emb = read_table(spark, src, "embeddings")
    n_vec = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    vparts = []
    for k in range(REPLICAS):
        v = emb.withColumn("vec_id", F.col("vec_id") + F.lit(k * n_vec))
        if k >= 2:
            v = v.withColumn(
                "embedding",
                F.expr(
                    "transform(embedding, (x, i) -> CAST(x + "
                    f"((abs(hash(vec_id, {k}, i)) % 1000) / 1000.0 - 0.5) "
                    "* 0.2 AS FLOAT))"
                ),
            )
        vparts.append(v)
    big_emb = vparts[0]
    for p in vparts[1:]:
        big_emb = big_emb.unionByName(p)
    big_emb.repartition(8).write.mode("overwrite").parquet(
        f"{out}/embeddings.parquet"
    )

    # lineitem is read by cdc_decimal_agg's synthesis; link the sf0.1
    # original (rehearsal targets the documents/events-heavy ops)
    for t in ("lineitem", "region", "nation", "customer", "supplier",
              "part", "orders"):
        dst = f"{out}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{src}/{t}.parquet", dst)


HEAVY = [
    "dedup_minhash_lsh",
    "dedup_exact_keep_best",
    "events_value_mad_outliers",
    "dedup_clusters_exact",
    "corpus_curation_pipeline",
    "cdc_apply_latest",
    "quality_budget_head",
    "repeated_spans_top",
    "span_dup_coverage",
    "semantic_dedup_prune",
    "embedding_pca_project",
    "doc_semantic_dedup",
    "events_heavy_hitters_cms",
    "winnow_overlap_pairs",
    "knn_opq_adc",
    "corpus_perplexity_buckets",
    "rag_rerank_cascade",
    "corpus_dsir_select",
    "rag_bm25_topk",
    "text_token_entropy",
    # r8 additions (docs/events scale 10× here; the TPC-H tables are
    # 1× symlinks, so q2/q21 stay bench-only)
    "dedup_span_rewrite",
    "events_engagement_pagerank",
]


def measure_state_store(spark, out: str) -> dict:
    """Run the custom stateful operator (``running_totals``,
    ``applyInPandasWithState``) over the 10x events through the
    session's state-store provider (RocksDB, session.py) and report
    checkpointed state size — the number behind the "state scales
    with keys, not events" claim."""
    import shutil

    from pyspark.sql import functions as F

    from tidb_cdc_spark.streaming.stateful import running_totals

    ck = f"{out}/_state_rehearsal_ck"
    shutil.rmtree(ck, ignore_errors=True)
    ev = spark.read.parquet(f"{out}/events.parquet")
    n_keys = ev.select("user_id").distinct().count()
    n_rows = ev.count()
    stream = spark.readStream.schema(ev.schema).parquet(f"{out}/events.parquet")
    t0 = time.perf_counter()
    q = (
        running_totals(stream.withColumn("value", F.col("value").cast("double")))
        .writeStream.format("noop")
        .outputMode("update")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    secs = round(time.perf_counter() - t0, 2)
    state_bytes = 0
    for root, _dirs, files in os.walk(f"{ck}/state"):
        state_bytes += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    shutil.rmtree(ck, ignore_errors=True)
    return {
        "rows": n_rows,
        "keys": n_keys,
        "state_bytes": state_bytes,
        "bytes_per_key": round(state_bytes / max(n_keys, 1), 1),
        "sec": secs,
    }


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1x10"
    src = "/root/testdata/sf0.1"
    from tidb_cdc_spark import get_spark
    from tidb_cdc_spark.functions import clusters
    from tidb_cdc_spark.queries import QUERIES

    spark = get_spark("scale-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    stale_emb = os.path.islink(f"{out}/embeddings.parquet")  # pre-r6 cache
    if stale_emb:
        os.unlink(f"{out}/embeddings.parquet")
    if not os.path.exists(f"{out}/documents.parquet") or stale_emb:
        t0 = time.perf_counter()
        build(spark, src, out)
        print(f"# built {out} in {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    timings: dict[str, float] = {}
    for name in HEAVY:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            n = QUERIES[name](spark, out).count()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 2)
        extra = f" cc_rounds={clusters.LAST_ROUNDS}" if "clusters" in name else ""
        print(f"# {name}: {timings[name]}s rows={n}{extra}", file=sys.stderr, flush=True)
    state = measure_state_store(spark, out)
    print(f"# state store (running_totals over 10x events): {state}",
          file=sys.stderr, flush=True)
    print(json.dumps({"scale": "10x-sf0.1", "queries": timings, "state": state}))
    spark.stop()


if __name__ == "__main__":
    main()
