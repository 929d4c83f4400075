"""Corpus output layout — the write side of a 100 TB pipeline.

A naive ``df.write.partitionBy(...)`` lets EVERY task write into
EVERY partition directory: with 10 000 tasks × 1 000 partitions
that is ten million small files — the classic layout failure that
cripples every downstream scan. The fix is standard and cheap:
repartition by the partition columns first (each directory is then
written by as few tasks as hold its data), bound file size with
``maxRecordsPerFile``, and sort within partitions so parquet
row-group min/max statistics actually prune on the sort key.

``write_corpus`` applies all three; ``corpus_layout_stats`` reads
the result back and reports per-partition file/row counts — the
audit a pipeline gates on before registering the output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_corpus(
    df: DataFrame,
    path: str,
    partition_by: list[str] | tuple[str, ...] = ("source",),
    sort_within: list[str] | tuple[str, ...] = (),
    max_records_per_file: int = 1_000_000,
    mode: str = "error",
) -> None:
    """Write ``df`` as a partitioned parquet corpus with a sane file
    layout (see module docstring). ``sort_within`` columns order
    rows inside each task's output so row-group stats prune."""
    cols = [F.col(c) for c in partition_by]
    out = df.repartition(*cols)
    if sort_within:
        out = out.sortWithinPartitions(*partition_by, *sort_within)
    (
        out.write.mode(mode)
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*partition_by)
        .parquet(path)
    )


def corpus_layout_stats(
    spark: SparkSession, path: str, partition_by: list[str] | tuple[str, ...] = ("source",)
) -> DataFrame:
    """(partition cols…, n_files, n_rows, rows_per_file_min/max) —
    the post-write layout audit. Uses the parquet file-name metadata
    column; one scan, one map-side-combining aggregate."""
    df = spark.read.parquet(path).withColumn(
        "_file", F.input_file_name()
    )
    per_file = df.groupBy(*partition_by, "_file").agg(
        F.count(F.lit(1)).alias("_rows")
    )
    return per_file.groupBy(*partition_by).agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.sum("_rows").cast("long").alias("n_rows"),
        F.min("_rows").cast("long").alias("rows_per_file_min"),
        F.max("_rows").cast("long").alias("rows_per_file_max"),
    )
