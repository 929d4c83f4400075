"""r15 VERDICT #2: core-count scale evidence the sf0.1 min-of-runs
bench cannot show.

The headline bench is fixed-cost-bound at sf0.1 (8-core total ≈
32-core total) because its min-of-runs methodology reads Spark's
plan-matched cache on warm reps — the decode/shuffle work the r14
fan-out actually parallelizes only runs on the FIRST, uncached pass.
This tool prices exactly that pass: for each decode-heavy query it
clears the SQL cache before every rep, so every rep pays the full
Python decode chain, and reports min-of-reps of the UNCACHED time.

Run it once per core count (the master is fixed at session build):

    SPARK_GRAFT_CPUS=32 python tools/core_scale_r15.py > c32.json
    SPARK_GRAFT_CPUS=8  python tools/core_scale_r15.py > c8.json

A low/high ratio near cores_high/cores_low on these queries is the
evidence that the fan-out work scales with cores; ≈1 would mean the
chain is still serialized.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: decode-heavy audits whose uncached pass is the Python media chain
QUERIES = [
    "multimodal_mjpeg_video_audit",
    "multimodal_webp_phash_audit",
    "multimodal_jpeg_prog_audit",
    "multimodal_png_deep_audit",
    "audio_adpcm_audit",
    "animated_apng_video_audit",
    "multimodal_exif_orientation_audit",
    "dedup_containment_repr",
    "winnow_repr_pipeline",
    "doc_semantic_dedup",
]


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from tidb_cdc_spark import get_spark
    from tidb_cdc_spark.queries import QUERIES as REG

    spark = get_spark("core_scale_r15")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    # warm the Python worker fleet once (bench.py discipline) so the
    # first query doesn't pay worker forking
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        return s

    n = spark.sparkContext.defaultParallelism
    spark.range(0, n * 100, 1, n).select(_warm(F.col("id")).alias("v")).agg(
        F.sum("v")
    ).collect()

    timings: dict[str, float] = {}
    raw: dict[str, list[float]] = {}
    for name in QUERIES:
        runs = []
        for _ in range(reps):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            REG[name](spark, sf_dir).count()
            runs.append(time.perf_counter() - t0)
        raw[name] = [round(r, 3) for r in runs]
        timings[name] = round(min(runs), 3)
        print(f"# {name}: {timings[name]}s {raw[name]}",
              file=sys.stderr, flush=True)

    print(json.dumps({
        "metric": "uncached_decode_runtime",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1],
        "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        "queries": timings,
        "raw_runs": raw,
        "load_start_1m": round(os.getloadavg()[0], 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
