"""Stream-static enrichment and incremental corpus ingestion — the
two joins a streaming pipeline runs against batch state: dimension
lookup (enrich each event with reference data) and snapshot dedup
(drop incoming documents already in the corpus).

The reference's handler loop (`cdc_manager.go:109-188`) hands rows
to user callbacks one at a time and any enrichment is the user's
problem; here the join IS the operator, planned by Catalyst per
micro-batch.

Scale notes (100 TB stream, 1000 executors):
- A stream-static join re-plans the static side EVERY micro-batch.
  Broadcasting the dim (default) makes each batch a map-side hash
  join — no stream shuffle, and the dim refresh is free (the next
  batch sees the table's current content). A non-broadcast dim
  shuffles every micro-batch — only right when the dim is too big
  to broadcast, in which case pre-bucket both sides.
- Snapshot dedup is a LEFT ANTI join against the fingerprint set.
  The fingerprint projection is 16 B/row; a billion-doc corpus is
  ~16 GB of fingerprints — beyond broadcast, so the anti join
  shuffles the (small) incoming batch against the bucketed
  fingerprint table; `broadcast_snapshot=True` covers the
  million-doc case. In-stream repeats are dropped by
  ``dropDuplicatesWithinWatermark`` — state bounded by the
  watermark horizon, the only dedup that survives an unbounded
  stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Enrich a streaming DataFrame with a static dimension table.

    ``how`` is restricted to the stream-static-legal left-side joins
    (inner / left / left_semi / left_anti) — right/full outer would
    need the static side to wait for the unbounded stream."""
    if how not in ("inner", "left", "left_semi", "left_anti"):
        raise ValueError(
            f"stream-static join supports inner/left/left_semi/left_anti, got {how!r}"
        )
    d = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(d, on=on, how=how)


def ingest_new_documents(
    docs_stream: DataFrame,
    snapshot: DataFrame,
    text_col: str = "text",
    ts_col: str = "ingest_ts",
    watermark: str = "1 hour",
    broadcast_snapshot: bool = False,
) -> DataFrame:
    """Incremental corpus ingestion: keep only documents whose
    content fingerprint is in neither the static ``snapshot`` (the
    already-shipped corpus) nor the stream's own watermark horizon.

    ``snapshot`` needs a ``fp`` column (md5 of text — build it with
    :func:`snapshot_fingerprints`); the emitted stream carries the
    incoming columns plus ``fp`` so the sink can append straight
    into the snapshot table, closing the loop for the next run."""
    fp = docs_stream.withColumn("fp", F.md5(F.col(text_col)))
    snap = snapshot.select("fp").distinct()
    if broadcast_snapshot:
        snap = F.broadcast(snap)
    fresh = fp.join(snap, on="fp", how="left_anti")
    return fresh.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["fp"]
    )


def snapshot_fingerprints(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct content fingerprints of a batch corpus — the 16 B/row
    projection ``ingest_new_documents`` anti-joins against."""
    return docs.select(F.md5(F.col(text_col)).alias("fp")).distinct()
