"""Budget-constrained data selection — "take the best documents
until the token budget is spent", the selection step between quality
scoring and training-mix assembly (FineWeb/DCLM-style keep-the-head
curation).

Semantics: order the corpus by (quality DESC, id ASC) — a total,
deterministic order — and keep each document whose INCLUSIVE
running token count fits the budget. The running sum over a global
order is a prefix scan; one unbounded window would serialize the
corpus onto a single task, so it runs as a two-level distributed
scan like functions/packing.py, except sharded by QUALITY BAND
(contiguous quality ranges are contiguous spans of the global order,
so shard order == selection order):

1. shard by ``(PPM - quality) div width`` — monotone non-increasing
   in quality, so shard 0 holds the best band;
2. per-shard token totals (#shards rows), exclusive-prefix-summed by
   a window over that tiny frame;
3. within-shard running sum, window partitioned BY SHARD — parallel
   across bands, each task scans one band.

Skew note: a degenerate corpus where most docs share one quality
value puts them in one band/task; with µ-unit integral quality
(1e6 distinct values) real corpora spread fine — if not, subdivide
the hot band by hashing the id into the shard key's low bits.

Quality must be integral in [0, PPM] (µ-units, the repo-wide ratio
convention) — enforced with a runtime guard (a silent out-of-range
value would land in a wrong band and corrupt the selection ORDER,
not just one row).

Reference scope note: the reference engine (dollarkillerx/tidb-cdc)
has no corpus surface; north-star pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tidb_cdc_spark.session import materialize

#: µ-unit scale shared with functions/quality.py.
PPM = 1_000_000


def budget_head(
    docs: DataFrame,
    quality_col: str = "quality_ppm",
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    n_shards: int = 256,
) -> DataFrame:
    """Adds ``cum_tokens`` (inclusive running token sum in (quality
    DESC, id ASC) order) and ``selected`` — whether the doc fits in
    a budget of HALF the corpus tokens (relative, so the same query
    is meaningful at every scale factor; for an absolute budget
    filter on ``cum_tokens`` directly)."""
    # column-preserving: the selection decision rides along with
    # whatever payload columns the caller chains downstream
    df = materialize(
        docs.withColumn(quality_col, F.col(quality_col).cast("long"))
        .withColumn(tokens_col, F.col(tokens_col).cast("long"))
    )
    width = -(-(PPM + 1) // n_shards)  # ceil
    shard = F.when(
        (F.col(quality_col) >= 0) & (F.col(quality_col) <= PPM),
        F.expr(f"({PPM}L - {quality_col}) div {width}L"),
    ).otherwise(
        F.raise_error(
            F.lit(f"{quality_col} outside [0, {PPM}] — not µ-units")
        )
    )
    sharded = df.withColumn("_shard", shard)
    from tidb_cdc_spark.operators.windows import banded_offsets

    offsets = banded_offsets(sharded, "_shard", weight=F.col(tokens_col))
    w_in = (
        Window.partitionBy("_shard")
        .orderBy(F.desc(quality_col), F.asc(id_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    total = df.agg(F.sum(F.col(tokens_col)).cast("long").alias("_total"))
    return (
        sharded.join(F.broadcast(offsets), "_shard")
        .withColumn(
            "cum_tokens",
            (F.col("_off") + F.sum(F.col(tokens_col)).over(w_in)).cast("long"),
        )
        .crossJoin(F.broadcast(total))
        .withColumn("selected", F.col("cum_tokens") * 2 <= F.col("_total"))
        .drop("_shard", "_off", "_total")
    )
