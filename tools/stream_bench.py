"""r15 VERDICT #8: a driver-runnable micro-bench for the STREAMING
half of the engine — deferred since r11 because no prior harness
priced it. Embedded file source (no broker needed) → envelope parse
→ Connector routing → ParquetSnapshotSink + Scd2HistorySink, at a
fixed batch count and fixed per-batch message count, fully
deterministic. Prints ONE compact JSON line in the bench.py style:

  {"metric": "stream_microbench_runtime", "value": <sec>, ...,
   "queries": {"snapshot_apply": s, "scd2_history": s,
               "shared_router": s}}

Methodology matches bench.py: each leg runs ``reps`` times on fresh
checkpoint/output dirs (a stream re-run with the same checkpoint
would consume zero new batches and measure nothing), min of runs
reported. Legs:

- ``snapshot_apply``   — N batches of upserts/deletes through the
                         Connector into ParquetSnapshotSink
                         (read-merge-write per batch, PK latest-wins).
- ``scd2_history``     — same envelope stream into Scd2HistorySink
                         (validity-interval rewrite per batch).
- ``shared_router``    — TWO registered tables through ONE stream
                         (start_shared): the hundreds-of-tables mode;
                         prices the per-batch routing + fan-out.

Usage:  python tools/stream_bench.py [--batches N] [--rows M]
                                     [--reps R]
Env:    SPARK_GRAFT_CPUS honored via get_spark (same contract as
        bench.py; the source is a file stream with one file per
        micro-batch, so batch count — not core count — bounds
        wall-clock at this scale).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _mk_messages(out_dir: str, batches: int, rows: int) -> None:
    """One jsonl file per micro-batch: 60% inserts, 30% updates of
    earlier keys, 10% deletes — deterministic by (batch, row)."""
    os.makedirs(out_dir, exist_ok=True)
    for b in range(batches):
        lines = []
        for i in range(rows):
            k = f"k{(b * rows + i) % (rows * max(1, batches // 2))}"
            ts = b * rows + i
            r = i % 10
            if r < 6:
                m = {"database": "d", "table": "t", "type": "insert",
                     "ts": ts, "data": {"k": k, "v": i}}
            elif r < 9:
                m = {"database": "d", "table": "t", "type": "update",
                     "ts": ts, "data": {"k": k, "v": i + 1},
                     "old": {"v": i}}
            else:
                m = {"database": "d", "table": "t", "type": "delete",
                     "ts": ts, "data": {"k": k, "v": i}}
            lines.append(json.dumps(m))
        tmp = os.path.join(out_dir, f".b{b:04d}.tmp")
        with open(tmp, "w") as fh:
            fh.write("\n".join(lines))
        os.replace(tmp, os.path.join(out_dir, f"b{b:04d}.jsonl"))


def _mk_messages_two_tables(out_dir: str, batches: int, rows: int) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for b in range(batches):
        lines = []
        for i in range(rows):
            table = "t" if i % 2 == 0 else "u"
            col = "v" if table == "t" else "w"
            m = {"database": "d", "table": table, "type": "insert",
                 "ts": b * rows + i,
                 "data": {"k": f"k{b}_{i}", col: i}}
            lines.append(json.dumps(m))
        tmp = os.path.join(out_dir, f".b{b:04d}.tmp")
        with open(tmp, "w") as fh:
            fh.write("\n".join(lines))
        os.replace(tmp, os.path.join(out_dir, f"b{b:04d}.jsonl"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument("--rows", type=int, default=2000)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--workdir", default="/tmp/spark_graft_stream_bench")
    args = ap.parse_args()

    from tidb_cdc_spark import get_spark
    from tidb_cdc_spark.cdc.spec import ColumnSpec, TableSpec
    from tidb_cdc_spark.sources import maxwell_file_stream
    from tidb_cdc_spark.streaming import (
        Connector,
        ConnectorConfig,
        ParquetSnapshotSink,
        Scd2HistorySink,
    )

    spec_t = TableSpec(
        database="d", table="t",
        columns=(ColumnSpec("K", "string", column="k", pk=True),
                 ColumnSpec("V", "int", column="v")),
    )
    spec_u = TableSpec(
        database="d", table="u",
        columns=(ColumnSpec("K", "string", column="k", pk=True),
                 ColumnSpec("W", "int", column="w")),
    )

    spark = get_spark("stream_bench")
    spark.sparkContext.setLogLevel("ERROR")
    load_start = os.getloadavg()[0]

    base = args.workdir
    shutil.rmtree(base, ignore_errors=True)
    src_one = os.path.join(base, "src_one")
    src_two = os.path.join(base, "src_two")
    _mk_messages(src_one, args.batches, args.rows)
    _mk_messages_two_tables(src_two, args.batches, args.rows)

    def run_leg(name: str, rep: int) -> float:
        work = os.path.join(base, f"{name}_{rep}")
        ckpt = os.path.join(work, "ckpt")
        conn = Connector(ConnectorConfig(server_name="bench",
                                         checkpoint_root=ckpt))
        if name == "snapshot_apply":
            sinks = [ParquetSnapshotSink(os.path.join(work, "snap"))]
            conn.register(spec_t, sinks,
                          source=maxwell_file_stream(spark, src_one, max_files_per_trigger=1))
            t0 = time.perf_counter()
            conn.start(spark, available_now=True)
            conn.await_termination()
            return time.perf_counter() - t0
        if name == "scd2_history":
            sinks = [Scd2HistorySink(os.path.join(work, "hist"))]
            conn.register(spec_t, sinks,
                          source=maxwell_file_stream(spark, src_one, max_files_per_trigger=1))
            t0 = time.perf_counter()
            conn.start(spark, available_now=True)
            conn.await_termination()
            return time.perf_counter() - t0
        # shared_router: two tables, one stream
        conn.register(spec_t,
                      [ParquetSnapshotSink(os.path.join(work, "snap_t"))])
        conn.register(spec_u,
                      [ParquetSnapshotSink(os.path.join(work, "snap_u"))])
        t0 = time.perf_counter()
        conn.start_shared(spark,
                          source=maxwell_file_stream(spark, src_two, max_files_per_trigger=1),
                          available_now=True)
        conn.await_termination()
        return time.perf_counter() - t0

    legs = ["snapshot_apply", "scd2_history", "shared_router"]
    timings: dict[str, float] = {}
    raw: dict[str, list[float]] = {}
    for name in legs:
        runs = [run_leg(name, rep) for rep in range(args.reps)]
        raw[name] = [round(r, 3) for r in runs]
        timings[name] = round(min(runs), 3)
        print(f"# {name}: {timings[name]}s {raw[name]}",
              file=sys.stderr, flush=True)

    payload = {
        "metric": "stream_microbench_runtime",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "batches": args.batches,
        "rows_per_batch": args.rows,
        "n_legs": len(timings),
        "queries": timings,
        "raw_runs": raw,
        "load_start_1m": round(load_start, 2),
    }
    print(json.dumps(payload))
    shutil.rmtree(base, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
