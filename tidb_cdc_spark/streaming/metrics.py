"""Streaming observability: per-batch metrics capture.

The reference's only operational signal is a log line per consumed
message (``cdc_manager.go:299`` area — MarkMessage after handler
dispatch); there is no throughput, lag, or state-size visibility at
all. A 100 TB CDC deployment lives or dies on exactly those series
(is the consumer keeping up? is state growing without bound?), so the
engine exposes them first-class via Spark's own
``StreamingQueryListener`` — the progress events the runtime already
computes, captured instead of dropped.

``StreamMetrics`` records one row per (query, batch): input volume,
throughput, batch duration breakdown, and state-store footprint
(summed over stateful operators). Rows accumulate in memory (bounded
ring — a week-long stream must not grow the driver) and optionally
append to a JSONL file that any log shipper can tail. ``to_df``
exposes the captured series as a DataFrame for SQL analysis —
the same engine that processes the data analyzes its own runtime.

Driver-side by design: progress events are metadata-sized (one per
batch, not per row) — this is observability, not a data path.
"""

from __future__ import annotations

import json
import math
import threading
from collections import deque
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.listener import StreamingQueryListener

#: DataFrame schema of the captured series (``to_df``).
METRICS_SCHEMA = (
    "event_ts string, query_id string, run_id string, name string, "
    "batch_id long, num_input_rows long, input_rows_per_second double, "
    "processed_rows_per_second double, batch_duration_ms long, "
    "add_batch_ms long, state_rows long, state_memory_bytes long"
)


class StreamMetrics(StreamingQueryListener):
    """Capture per-batch streaming progress.

    Parameters
    ----------
    max_rows:
        Ring-buffer capacity — oldest rows are dropped beyond it, so
        a long-lived stream cannot grow driver memory (at the default
        10k rows and one batch per second that is ~3 hours of full
        resolution; ship the JSONL for longer horizons).
    jsonl_path:
        When set, every progress row is ALSO appended as one JSON
        line (the full row dict) — the operational log a collector
        tails. Append failures are swallowed after recording
        ``io_errors`` (observability must never kill the query).
    """

    def __init__(self, max_rows: int = 10_000, jsonl_path: str | None = None):
        self._rows: deque[dict[str, Any]] = deque(maxlen=max_rows)
        self._lock = threading.Lock()
        self._jsonl_path = jsonl_path
        self.io_errors = 0

    # -- listener callbacks (invoked on Spark's listener-bus thread) --
    def onQueryStarted(self, event: Any) -> None:  # noqa: N802
        pass

    @staticmethod
    def _rate(x: Any) -> float | None:
        """Spark reports NaN for the first batch's input rate (no
        previous trigger) and can report Infinity for zero-duration
        batches; ``x or 0.0`` passes both through (NaN is truthy) and
        ``json.dumps`` would then emit bare ``NaN``/``Infinity``
        tokens that strict JSON consumers (jq, log collectors)
        reject. Non-finite → None (JSON null, SQL NULL)."""
        if x is None:
            return None
        v = float(x)
        return v if math.isfinite(v) else None

    def onQueryProgress(self, event: Any) -> None:  # noqa: N802
        p = event.progress
        dur = p.durationMs or {}
        state_rows = 0
        state_mem = 0
        for op in p.stateOperators or []:
            state_rows += op.numRowsTotal or 0
            state_mem += op.memoryUsedBytes or 0
        row = {
            "event_ts": p.timestamp,
            "query_id": str(p.id),
            "run_id": str(p.runId),
            "name": p.name,
            "batch_id": p.batchId,
            "num_input_rows": p.numInputRows,
            "input_rows_per_second": self._rate(p.inputRowsPerSecond),
            "processed_rows_per_second": self._rate(
                p.processedRowsPerSecond
            ),
            "batch_duration_ms": int(dur.get("triggerExecution", 0)),
            "add_batch_ms": int(dur.get("addBatch", 0)),
            "state_rows": state_rows,
            "state_memory_bytes": state_mem,
        }
        with self._lock:
            self._rows.append(row)
        if self._jsonl_path is not None:
            try:
                with open(self._jsonl_path, "a") as f:
                    f.write(json.dumps(row) + "\n")
            except OSError:
                self.io_errors += 1

    def onQueryIdle(self, event: Any) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event: Any) -> None:  # noqa: N802
        pass

    # ------------------------------------------------------ reading
    def rows(self) -> list[dict[str, Any]]:
        """Snapshot of the captured rows (oldest first)."""
        with self._lock:
            return list(self._rows)

    def to_df(self, spark: SparkSession) -> DataFrame:
        """The captured series as a DataFrame (``METRICS_SCHEMA``).

        Empty-safe: returns an empty frame with the right schema so
        downstream aggregations work before the first batch lands.
        """
        # dicts bind by NAME against the schema — a tuple build would
        # silently couple dict insertion order to column order
        return spark.createDataFrame(self.rows(), METRICS_SCHEMA)


def attach_metrics(
    spark: SparkSession,
    max_rows: int = 10_000,
    jsonl_path: str | None = None,
) -> StreamMetrics:
    """Create a :class:`StreamMetrics`, register it on the session's
    stream manager, and return it. Detach with
    ``spark.streams.removeListener(m)`` when done (tests) — a
    long-running service normally keeps it for the process lifetime.
    """
    m = StreamMetrics(max_rows=max_rows, jsonl_path=jsonl_path)
    spark.streams.addListener(m)
    return m
