"""File sources for Maxwell event streams.

The reference's own golden data is a JSON file captured from Kafka
(``/root/reference/test/fff.json`` via ``test/ko.go:69``); a
JSON-lines directory is the natural replay/test source, and the
streaming variant exercises the exact same parse expressions as the
Kafka path (Structured Streaming is source-agnostic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def maxwell_file_batch(spark: SparkSession, path: str) -> DataFrame:
    """Batch read: one Maxwell JSON document per line → ``value``."""
    return spark.read.text(path).withColumnRenamed("value", "value")


def maxwell_file_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming read of a growing directory of JSON-lines files —
    micro-batch sizing via maxFilesPerTrigger mirrors Kafka's
    maxOffsetsPerTrigger backpressure."""
    reader = spark.readStream.format("text")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)
