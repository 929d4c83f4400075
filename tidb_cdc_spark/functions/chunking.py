"""Per-document sliding-window chunking — the RAG/embedding-prep
stage that cuts each document into fixed-size token windows with
overlap (stride < window), one output row per chunk span.

Distinct from functions/packing.py: packing lays documents
end-to-end into a GLOBAL chunk stream (training batches); chunking
is PER-DOCUMENT (retrieval units), so there is no global order, no
prefix sum — every row expands independently.

Chunk layout for a doc of ``n`` tokens, window ``w``, stride ``s``:
starts are 0, s, 2s, … while ``start < n``; the last window is
clipped to ``n``. Empty docs emit no chunks. The chunk count is
``ceil(max(n - w, 0) / s) + 1`` for n > 0 — pure integer arithmetic,
identical in any engine.

Scale shape (100 TB): ``sequence()`` + ``posexplode`` is a codegen
per-row expansion — no shuffle, no state; output size is
``Σ ceil(n_i / s)`` rows, the same blow-up any chunker pays. The
expansion preserves the scan partitioning, so a downstream
per-chunk embed/encode stage (mapInPandas) runs straight over it
without a repartition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_spans(
    docs: DataFrame,
    window: int = 512,
    stride: int = 384,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """(id, chunk_idx, start_tok, end_tok, chunk_tokens) — one row
    per sliding window; ``end_tok`` is exclusive and clipped to the
    document length."""
    if not 0 < stride <= window:
        raise ValueError(f"need 0 < stride <= window, got {stride}, {window}")
    n = F.col(tokens_col)
    # last start = s·ceil(max(n−w, 0)/s): stop as soon as a window
    # reaches the end — a start beyond that yields a chunk fully
    # contained in its predecessor
    last = (
        f"{stride}L * ((greatest({tokens_col} - {window}L, 0L) + "
        f"{stride - 1}L) div {stride}L)"
    )
    starts = F.when(
        n > 0, F.expr(f"sequence(0L, {last}, {stride}L)")
    ).otherwise(F.array())
    return (
        docs.select(F.col(id_col), n.alias("_n"), starts.alias("_starts"))
        .select(
            id_col,
            "_n",
            F.posexplode("_starts").alias("chunk_idx", "start_tok"),
        )
        .select(
            id_col,
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.col("start_tok").cast("long").alias("start_tok"),
            F.least(F.col("start_tok") + window, F.col("_n"))
            .cast("long")
            .alias("end_tok"),
            (
                F.least(F.col("start_tok") + window, F.col("_n"))
                - F.col("start_tok")
            )
            .cast("long")
            .alias("chunk_tokens"),
        )
    )
