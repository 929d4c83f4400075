"""r15 VERDICT #6: decide the static-SHJ question with evidence.

``preferSortMergeJoin=false`` (static planner half) trusts size
ESTIMATES — a bad estimate plus skew can OOM an executor at scale
(guide §3.1's caution), while the AQE runtime rewrite
(``maxShuffledHashJoinLocalMapThreshold``) is bounded by OBSERVED
map sizes. r14's 18/18 interleaved win measured both halves ON
together; this tool separates them: same session, both confs are
runtime-settable, three arms interleaved rep by rep —

  A: static SMJ preference (Spark default) + runtime threshold 64m
  B: static SHJ allowed + runtime threshold 64m   (r14 shipped)
  C: static SMJ preference + runtime threshold 0  (both halves off)

If A ≈ B on the SMJ-heavy set, the bounded runtime half carries the
win alone and the static half can be reverted (the safe-at-scale
choice). Usage:  python tools/shj_ab_r15.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "q21_waiting_suppliers",
    "cdc_scd2_history",
    "events_engagement_pagerank",
    "dedup_exact_keep_best",
    "q18_large_volume_customers",
    "multimodal_phash_audit",
]

ARMS = {
    "A_smj_static+aqe64m": ("true", str(64 * 1024 * 1024)),
    "B_shj_static+aqe64m": ("false", str(64 * 1024 * 1024)),
    "C_smj_static+aqe0": ("true", "0"),
}


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from tidb_cdc_spark import get_spark
    from tidb_cdc_spark.queries import QUERIES as REG

    spark = get_spark("shj_ab_r15")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    results: dict[str, dict[str, list[float]]] = {
        q: {a: [] for a in ARMS} for q in QUERIES
    }
    arm_names = list(ARMS)
    for rep in range(reps):
        # rotate arm order per rep — a fixed order hands the first
        # arm every fresh-codegen/first-touch penalty
        order = arm_names[rep % len(arm_names):] + arm_names[: rep % len(arm_names)]
        for q in QUERIES:
            for arm in order:
                prefer_smj, thresh = ARMS[arm]
                spark.conf.set("spark.sql.join.preferSortMergeJoin", prefer_smj)
                spark.conf.set(
                    "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
                    thresh,
                )
                t0 = time.perf_counter()
                REG[q](spark, sf_dir).count()
                results[q][arm].append(time.perf_counter() - t0)
        print(f"# rep {rep} done load={os.getloadavg()[0]:.2f}",
              file=sys.stderr, flush=True)

    print(f"{'query':34s} " + " ".join(f"{a:>22s}" for a in ARMS))
    for q in QUERIES:
        mins = {a: min(results[q][a]) for a in ARMS}
        warm = {a: sorted(results[q][a])[: max(1, reps - 1)] for a in ARMS}
        means = {a: sum(w) / len(w) for a, w in warm.items()}
        print(
            f"{q:34s} "
            + " ".join(
                f"min={mins[a]:6.3f} m={means[a]:6.3f}" for a in ARMS
            )
        )
    for a in ARMS:
        tot = sum(min(results[q][a]) for q in QUERIES)
        print(f"total(min-of-reps) {a}: {tot:.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
