"""Attribute events_engagement_pagerank's 100× scale-curve step
(r9: 3.27 s → 9.55 s, ratio 2.9) to either EDGE GROWTH (fine — an
iterative graph op's cost tracks its edge list) or CHECKPOINT IO
(fixable — reliable-checkpoint interval / lineage-cap tuning).

Method: at each replica scale, measure (a) the graph-build phase
(distinct user↔type pairs + the eager invariant checkpoints — the
part that scales with EVENT rows), (b) the 5-iteration loop + final
top-k (the part that scales with EDGE rows and carries the per-round
lineage truncation), and report both against the edge/node counts.
If loop-time ratio ≈ edge-count ratio, the step is data-bound; a
loop ratio well above the edge ratio implicates per-round overhead
(checkpoint IO).

Run: PYTHONPATH=. python3 tools/pagerank_profile.py
(reuses the scale_rehearsal replica dirs, building them if absent —
same protocol as tools/scale_curve.py). Writes ONLY under /tmp;
prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    out100 = "/tmp/spark_graft_sf1x100"
    out10 = "/tmp/spark_graft_sf1x10"
    src = "/root/testdata/sf0.1"

    import tools.scale_rehearsal as R
    from pyspark.sql import functions as F

    from tidb_cdc_spark import get_spark
    from tidb_cdc_spark.functions.pagerank import pagerank

    spark = get_spark("pagerank-profile")
    spark.sparkContext.setLogLevel("ERROR")

    R.ensure_replicas(spark, src, out10, 10)
    R.ensure_replicas(spark, src, out100, 100)

    results: dict[str, dict] = {}
    for label, d in (("1x", src), ("10x", out10), ("100x", out100)):
        row: dict = {}
        for attempt in range(2):  # min-of-2 per phase
            ev = spark.read.parquet(f"{d}/events.parquet")
            pairs = ev.select(
                F.concat(F.lit("u:"), F.col("user_id").cast("string")).alias(
                    "u"
                ),
                F.concat(F.lit("t:"), F.col("event_type")).alias("t"),
            ).distinct()
            edges = pairs.select(
                F.col("u").alias("src"), F.col("t").alias("dst")
            ).unionByName(
                pairs.select(F.col("t").alias("src"), F.col("u").alias("dst"))
            )
            t0 = time.perf_counter()
            # build phase: constructing the DF runs the eager
            # invariant checkpoints (edges+deg join, node spine)
            ranked = pagerank(edges, iters=5)
            t_build = time.perf_counter() - t0
            t0 = time.perf_counter()
            # loop phase: the final action executes the 5 chained
            # iterations over the checkpointed invariants
            ranked.orderBy(F.desc("rank_mu"), "node").limit(25).count()
            t_loop = time.perf_counter() - t0
            row["build_sec"] = min(
                row.get("build_sec", 1e9), round(t_build, 2)
            )
            row["loop_sec"] = min(row.get("loop_sec", 1e9), round(t_loop, 2))
        row["edges"] = edges.count()
        row["events"] = ev.count()
        results[label] = row
        print(f"# {label}: {row}", file=sys.stderr, flush=True)

    r = {
        "experiment": "pagerank_profile",
        **{k: v for k, v in results.items()},
        "edge_ratio_10to100": round(
            results["100x"]["edges"] / max(results["10x"]["edges"], 1), 2
        ),
        "build_ratio_10to100": round(
            results["100x"]["build_sec"]
            / max(results["10x"]["build_sec"], 1e-9),
            2,
        ),
        "loop_ratio_10to100": round(
            results["100x"]["loop_sec"]
            / max(results["10x"]["loop_sec"], 1e-9),
            2,
        ),
    }
    print(json.dumps(r))
    spark.stop()


if __name__ == "__main__":
    main()
