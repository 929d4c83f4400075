"""Sequence packing — the concat-and-chunk step that turns a filtered
corpus into fixed-budget training sequences: documents are laid out
end-to-end in a deterministic global order (``id_col`` ascending) and
the token stream is cut every ``budget`` tokens. Each document reports
the chunk range it lands in; documents MAY span a chunk boundary
(concat-and-chunk semantics — the packer's consumer decides whether
to mask cross-document attention).

Scale shape (100 TB): the global running token offset is a prefix
sum, which a single unbounded window would serialize onto ONE task.
Instead we compute it as the textbook two-level distributed scan:

1. shard each document by ``id div width`` (contiguous id ranges, so
   shard order == global order);
2. per-shard token totals — a tiny aggregate (#shards rows);
3. exclusive-prefix-sum the shard totals (window over #shards rows —
   trivially small) and broadcast-join the shard offset back;
4. within-shard running sum (window partitioned BY SHARD — parallel
   across shards, each task scans one shard).

The only scalar the driver sees is ``max(id)`` (one column-pruned
scan) to size the shards; no data rows are collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def global_running_sum(
    df: DataFrame,
    id_col: str,
    value_col: str,
    n_shards: int = 256,
) -> DataFrame:
    """Add ``_cum`` = inclusive running sum of ``value_col`` in
    ``id_col`` order, via the two-level distributed scan described in
    the module docstring. ``id_col`` must be unique; shards are
    contiguous id ranges so the scan order equals global id order."""
    from tidb_cdc_spark.session import materialize

    # The sharded projection feeds BOTH the totals aggregate and the
    # main running-sum path; without materialization Spark executes
    # the producing scan (and any upstream token counting) twice.
    df = materialize(df)
    bounds = df.agg(
        F.max(id_col).alias("_mx"), F.min(id_col).alias("_mn")
    ).first()
    if bounds is None or bounds["_mx"] is None:
        return df.withColumn("_cum", F.lit(0).cast("long"))
    span = int(bounds["_mx"]) - int(bounds["_mn"]) + 1
    width = max(1, -(-span // n_shards))  # ceil
    lo = int(bounds["_mn"])
    # ids are >= lo, so truncating div == floor — integral in any engine
    sharded = df.withColumn(
        "_shard", F.expr(f"({id_col} - {lo}L) div {width}L")
    )
    totals = sharded.groupBy("_shard").agg(
        F.sum(F.col(value_col)).alias("_tot")
    )
    w_sh = (
        Window.orderBy("_shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "_shard",
        F.coalesce(F.sum("_tot").over(w_sh), F.lit(0)).alias("_off"),
    )
    w_in = (
        Window.partitionBy("_shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        sharded.join(F.broadcast(offsets), "_shard")
        .withColumn(
            "_cum", F.col("_off") + F.sum(F.col(value_col)).over(w_in)
        )
        .drop("_shard", "_off")
    )


def pack_chunks(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    n_shards: int = 256,
) -> DataFrame:
    """Per-document chunk assignment for concat-and-chunk packing:

    - ``start_tok``   — the document's offset in the global stream
    - ``chunk_first`` / ``chunk_last`` — the ``budget``-token chunks
      the document touches (null for zero-token documents)
    - ``n_chunks``    — chunks spanned (0 for zero-token documents)

    Deterministic in any engine: the layout is fully determined by
    (id order, token counts, budget) — no partition- or
    arrival-order dependence.
    """
    c = global_running_sum(docs, id_col, tokens_col, n_shards)
    start = F.col("_cum") - F.col(tokens_col)
    nonempty = F.col(tokens_col) > 0
    first = F.when(nonempty, F.expr(f"(_cum - {tokens_col}) div {budget}"))
    last = F.when(nonempty, F.expr(f"(_cum - 1) div {budget}"))
    return c.select(
        id_col,
        tokens_col,
        start.alias("start_tok"),
        first.cast("long").alias("chunk_first"),
        last.cast("long").alias("chunk_last"),
        F.when(nonempty, last - first + 1)
        .otherwise(F.lit(0))
        .cast("long")
        .alias("n_chunks"),
    )
