"""Rehearse the shared-subscription Connector mode at WIDTH — the
reference's deployment shape is hundreds of registered tables behind
one server (cdc_manager.go:414-422 registers in a loop); the prior
test coverage exercised 2 tables, which probes routing correctness
but not fan-out cost.

Measures, on a file-source twin (same parse/route/sink code path as
Kafka, sources/files.py):

- ``start_shared`` with N registrations: one streaming query, each
  micro-batch persisted once, N filtered parse+sink passes over the
  cached batch;
- ``start`` per-table with N registrations: N streaming queries,
  each with its own checkpoint + trigger loop (the mode the shared
  form exists to replace at width).

Output: wall-clock for each mode, per-table overhead, and the
routing-pass share (time beyond the widest single-table run).
Run: ``PYTHONPATH=. python3 tools/shared_width_rehearsal.py [N]``.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

TMP = "/tmp/shared_width_rehearsal"


def _specs(n: int):
    from tidb_cdc_spark.cdc.spec import ColumnSpec, TableSpec

    return [
        TableSpec(
            database="d",
            table=f"t{i:03d}",
            columns=(
                ColumnSpec("K", "string", column="k", pk=True),
                ColumnSpec("V", "int"),
                ColumnSpec("TS", "string"),
            ),
        )
        for i in range(n)
    ]


def _write_events(
    root: str, n_tables: int, per_table: int, n_files: int, n_active=None
):
    os.makedirs(root, exist_ok=True)
    msgs = []
    for i in range(n_active if n_active is not None else n_tables):
        for j in range(per_table):
            msgs.append(
                json.dumps(
                    {
                        "database": "d",
                        "table": f"t{i:03d}",
                        "type": "insert" if j % 3 else "update",
                        "ts": 1000 + j,
                        "data": {
                            "k": f"k{j % 50}",
                            "v": j,
                            "ts": "2026-01-01 00:00:00",
                        },
                    }
                )
            )
    # interleave tables across files the way one topic-pattern
    # subscription would deliver them
    for f in range(n_files):
        chunk = msgs[f::n_files]
        tmp = os.path.join(root, f".b{f}.jsonl.tmp")
        with open(tmp, "w") as fh:
            fh.write("\n".join(chunk))
        os.replace(tmp, os.path.join(root, f"b{f}.jsonl"))


def main() -> None:
    n_tables = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    # sparse mode: only the first n_active tables carry messages —
    # the hundreds-registered/few-active shape the presence
    # prefilter exists for
    n_active = int(sys.argv[2]) if len(sys.argv) > 2 else None
    per_table, n_files = 200, 3

    from tidb_cdc_spark import get_spark
    from tidb_cdc_spark.sources.files import maxwell_file_stream
    from tidb_cdc_spark.streaming.connector import Connector, ConnectorConfig
    from tidb_cdc_spark.streaming.sinks import ParquetSnapshotSink

    spark = get_spark("shared-width")
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(TMP, ignore_errors=True)
    events = os.path.join(TMP, "in")
    _write_events(events, n_tables, per_table, n_files, n_active)
    specs = _specs(n_tables)

    def fresh_connector(tag: str):
        conn = Connector(
            ConnectorConfig(
                server_name="srv",
                checkpoint_root=os.path.join(TMP, f"ckpt_{tag}"),
            )
        )
        sinks = []
        for s in specs:
            sink = ParquetSnapshotSink(
                os.path.join(TMP, f"snap_{tag}", s.table)
            )
            sinks.append(sink)
            conn.register(s, [sink], source=maxwell_file_stream(spark, events))
        return conn, sinks

    # warm the session (JVM, file listing) so mode timings compare
    spark.read.text(events).count()

    # --- shared: one query, N routed passes per batch
    conn_s, sinks_s = fresh_connector("shared")
    t0 = time.perf_counter()
    q = conn_s.start_shared(
        spark,
        source=maxwell_file_stream(spark, events),
        available_now=True,
    )
    q.awaitTermination()
    shared_s = time.perf_counter() - t0

    # --- single-table baseline: the widest per-batch work one table
    # causes (shared overhead = shared_s - this, roughly)
    conn_1 = Connector(
        ConnectorConfig(
            server_name="srv", checkpoint_root=os.path.join(TMP, "ckpt_one")
        )
    )
    one_sink = ParquetSnapshotSink(os.path.join(TMP, "snap_one"))
    conn_1.register(specs[0], [one_sink], source=maxwell_file_stream(spark, events))
    t0 = time.perf_counter()
    q = conn_1.start_shared(
        spark,
        source=maxwell_file_stream(spark, events),
        available_now=True,
    )
    q.awaitTermination()
    one_s = time.perf_counter() - t0

    # --- per-table mode: N independent queries
    conn_p, sinks_p = fresh_connector("per")
    t0 = time.perf_counter()
    qs = conn_p.start(spark, available_now=True)
    for q in qs:
        q.awaitTermination()
    per_s = time.perf_counter() - t0

    # correctness: both modes converge to identical snapshots
    mismatches = 0
    def _rows(sink):
        cur = sink.read_current(spark)
        return (
            set() if cur is None else {(r.k, r.v) for r in cur.collect()}
        )

    for s, a, b in zip(specs, sinks_s, sinks_p):
        da, db = _rows(a), _rows(b)
        if da != db:
            mismatches += 1
            print(f"# MISMATCH {s.table}: shared={len(da)} per={len(db)}")
    print(
        json.dumps(
            {
                "n_tables": n_tables,
                "n_active": n_active or n_tables,
                "msgs": (n_active or n_tables) * per_table,
                "files": n_files,
                "shared_sec": round(shared_s, 2),
                "single_table_shared_sec": round(one_s, 2),
                "per_table_sec": round(per_s, 2),
                "shared_routing_overhead_sec_per_table": round(
                    (shared_s - one_s) / max(n_tables - 1, 1), 3
                ),
                "snapshot_mismatches": mismatches,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
