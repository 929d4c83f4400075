"""Real-Kafka end-to-end test — auto-skipped unless the environment
provides both a Kafka broker and the spark-sql-kafka connector JAR.

This sandbox has neither (probed: "Failed to find data source:
kafka", NOTES.md "Kafka boundary"), so the reference's core consume
loop (``/root/reference/cdc_manager.go:109-188``) is exercised here
via the kafka-shaped file stream plus the options-contract tests in
``test_streaming.py``. The day a broker + JAR are available, set

    SPARK_GRAFT_KAFKA_BROKERS=host:9092[,host2:9092]

and this test lights up the real path with zero new work: it writes
Maxwell envelopes to a fresh topic through Spark's Kafka sink, then
runs the full engine pipeline (kafka_stream → parse_cdc →
ParquetSnapshotSink via the Connector's foreachBatch) and checks the
materialized snapshot.
"""

import json
import os
import uuid

import pytest

BROKERS = os.environ.get("SPARK_GRAFT_KAFKA_BROKERS", "")


def _connector_available(spark) -> bool:
    """True iff the spark-sql-kafka data source is on the classpath."""
    try:
        spark.read.format("kafka").option(
            "kafka.bootstrap.servers", BROKERS or "localhost:1"
        ).option("subscribe", "probe").option(
            "startingOffsets", "earliest"
        ).load()
        return True
    except Exception as e:  # noqa: BLE001
        return "Failed to find data source" not in str(e)


@pytest.mark.skipif(
    not BROKERS,
    reason="no Kafka broker (set SPARK_GRAFT_KAFKA_BROKERS=host:9092)",
)
class TestKafkaRoundTrip:
    def test_maxwell_topic_to_snapshot(self, spark, tmp_path):
        if not _connector_available(spark):
            pytest.skip("spark-sql-kafka connector JAR not on classpath")

        from tidb_cdc_spark.cdc.spec import ColumnSpec, TableSpec
        from tidb_cdc_spark.sources import KafkaSourceConfig, kafka_stream
        from tidb_cdc_spark.streaming import (
            Connector,
            ConnectorConfig,
            ParquetSnapshotSink,
        )

        topic = f"graft_e2e_{uuid.uuid4().hex[:8]}"
        spec = TableSpec(
            database="d",
            table="t",
            columns=(
                ColumnSpec("K", "string", column="k", pk=True),
                ColumnSpec("V", "int"),
            ),
        )

        def msg(op, k, v, ts, old=None):
            m = {"database": "d", "table": "t", "type": op, "ts": ts,
                 "data": {"k": k, "v": v}}
            if old is not None:
                m["old"] = old
            return json.dumps(m)

        msgs = [
            msg("insert", "a", 1, 10),
            msg("insert", "b", 2, 11),
            msg("update", "a", 5, 12, old={"v": 1}),
            msg("delete", "b", 2, 13),
        ]
        # produce through Spark's Kafka sink (auto-creates the topic
        # on default broker configs)
        spark.createDataFrame(
            [(m,) for m in msgs], "value string"
        ).write.format("kafka").option(
            "kafka.bootstrap.servers", BROKERS
        ).option("topic", topic).save()

        cfg = KafkaSourceConfig(
            brokers=BROKERS.split(","),
            topic=topic,
            starting_offsets="earliest",
        )
        sink = ParquetSnapshotSink(str(tmp_path / "snap"))
        conn = Connector(
            ConnectorConfig(
                server_name="srv", checkpoint_root=str(tmp_path / "ckpt")
            )
        )
        conn.register(spec, [sink], source=kafka_stream(spark, cfg))
        conn.start(spark, available_now=True)
        conn.await_termination()

        snap = sink.read_current(spark)
        assert {(r.k, r.v) for r in snap.collect()} == {("a", 5)}
