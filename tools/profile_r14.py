"""r14 optimization-round profiler: isolate one or more declared
queries, capture their formatted plans, and time them with the bench
methodology (min of warm runs of ``.count()``) plus an optional noop
sink (guide §1.4) so the computation is timed, not the sink.

Usage:
  PYTHONPATH=/root/repo python tools/profile_r14.py [--plans DIR]
      [--suffix before|after] [--noop] [--runs N] [--sf SF_DIR]
      query [query ...]

Writes ``DIR/<query>_<suffix>.txt`` when --plans is given, and prints
per-query timings:  build (DataFrame construction, which for the
MLlib-backed queries includes the driver-side fits), then each timed
action run.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--plans", default=None, help="dir for explain output")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--noop", action="store_true", help="time noop sink too")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                                   "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from tidb_cdc_spark import get_spark
    from tidb_cdc_spark.queries import QUERIES

    spark = get_spark("profile_r14")
    spark.sparkContext.setLogLevel("ERROR")
    # warm: scan + python worker fleet, mirroring bench.py
    spark.read.parquet(f"{args.sf}/lineitem.parquet").count()
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        return s

    spark.range(0, 3200, 1, 32).select(_warm(F.col("id")).alias("v")).agg(
        F.sum("v")
    ).collect()

    for name in args.queries:
        fn = QUERIES[name]
        spark.sparkContext.setJobDescription(f"{name}: build")
        t0 = time.perf_counter()
        df = fn(spark, args.sf)
        build = time.perf_counter() - t0
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(args.plans,
                                   f"{name}_{args.suffix}.txt"), "w") as fh:
                fh.write(buf.getvalue())
        runs = []
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"{name}: run {i}")
            # fresh build per run, like bench.py's loop
            t0 = time.perf_counter()
            fn(spark, args.sf).count()
            runs.append(round(time.perf_counter() - t0, 3))
        line = f"{name}: build={build:.3f}s runs={runs} min={min(runs)}"
        if args.noop:
            nruns = []
            for i in range(args.runs):
                spark.sparkContext.setJobDescription(f"{name}: noop {i}")
                t0 = time.perf_counter()
                (fn(spark, args.sf).write.format("noop")
                 .mode("overwrite").save())
                nruns.append(round(time.perf_counter() - t0, 3))
            line += f" noop={nruns} noop_min={min(nruns)}"
        print(line, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
