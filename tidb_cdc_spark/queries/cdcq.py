"""CDC-surface queries: the reference's core capability (Maxwell
parse + apply semantics) made oracle-checkable.

Both queries synthesize a deterministic Maxwell envelope stream from
the ``events`` table INSIDE Spark (to_json of a struct — same
protocol shape as /root/reference/test/fff.json), push it through
the engine's real parse/apply path, and the DuckDB oracle computes
the expected result directly from the base table. This exercises
ops #3-#12 and #15-#16 of SURVEY §2 end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tidb_cdc_spark.cdc.apply import snapshot_from_ops
from tidb_cdc_spark.cdc.parse import parse_cdc
from tidb_cdc_spark.cdc.spec import ColumnSpec, TableSpec


def events_spec() -> TableSpec:
    return TableSpec(
        database="app",
        table="events",
        columns=(
            ColumnSpec("UserID", "bigint", column="user_id", pk=True),
            ColumnSpec("EventID", "bigint", column="event_id"),
            ColumnSpec("EventType", "string"),
            ColumnSpec("Value", "double"),
            ColumnSpec("Ts", "timestamp", column="ts_ms"),
        ),
    )


def _envelopes(spark: SparkSession, sf_dir: str, with_ops: bool) -> DataFrame:
    """events rows → Maxwell JSON messages (one per row)."""
    from tidb_cdc_spark.session import fan_out, read_table

    # fan_out: a real CDC source is a Kafka topic with N partitions;
    # the single-row-group test parquet collapses the scan to one
    # split, which would serialize the whole JSON round-trip.
    ev = fan_out(read_table(spark, sf_dir, "events"), spark)
    op = (
        F.when(F.col("event_id") % 4 == 3, "delete")
        .when(F.col("event_id") % 4 == 1, "update")
        .otherwise("insert")
        if with_ops
        else F.lit("insert")
    )
    data = F.struct(
        F.col("user_id"),
        F.col("event_id"),
        F.col("event_type"),
        F.col("value"),
        F.unix_millis(F.col("ts")).alias("ts_ms"),
    )
    env = ev.select(
        F.to_json(
            F.struct(
                F.lit("app").alias("database"),
                F.lit("events").alias("table"),
                op.alias("type"),
                F.unix_timestamp(F.col("ts")).alias("ts"),
                data.alias("data"),
            )
        ).alias("value")
    )
    # materialize = "this is a source, not a computation": consumers
    # read the materialized bytes, so the engine's routing/malformed
    # filters (deterministic projections of `value`) cannot be pushed
    # below the synthesis and re-evaluate to_json on the unsplit scan.
    # A real Kafka topic is exactly this — materialized bytes. The
    # materialization runs inside the timed query (32-way, after
    # fan_out), so the bench still pays the synthesis cost once;
    # persist keeps lineage for fault tolerance (session.materialize).
    from tidb_cdc_spark.session import materialize

    return materialize(env)


def cdc_parse_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip: rows → Maxwell JSON → engine parse → typed rows.

    Checks the whole coercion matrix on real data: bigint/double
    round-trip through JSON text, epoch-ms → timestamp. Stateless,
    shuffle-free plan (codegen'd from_json + try_cast)."""
    env = _envelopes(spark, sf_dir, with_ops=False)
    parsed = parse_cdc(env, events_spec())
    return parsed.select(
        F.col("after.event_id").alias("event_id"),
        F.col("after.user_id").alias("user_id"),
        F.col("after.event_type").alias("event_type"),
        F.col("after.value").alias("value"),
        F.col("after.ts_ms").alias("event_ts"),
    ).orderBy("event_id")


_PARSE_SQL = """
SELECT event_id, user_id, event_type, value,
       make_timestamp(epoch_ms(ts) * 1000) AS event_ts
FROM events
ORDER BY event_id
"""


def cdc_apply_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full pipeline: envelopes (insert/update/delete mix keyed by
    user_id) → parse → per-PK latest-wins conflation → snapshot.

    This is the materialization contract of SURVEY §7 M1: final
    state = ops applied in (ts, seq) order per key, deletes wiping
    the row. One shuffle (PK window) — minimal for the semantics."""
    env = _envelopes(spark, sf_dir, with_ops=True)
    parsed = parse_cdc(
        env,
        events_spec(),
        seq_col=F.col("data").getItem("event_id").try_cast("long"),
    )
    snap = snapshot_from_ops(parsed, events_spec())
    return snap.select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_event_type"),
        F.col("value").alias("last_value"),
    ).orderBy("user_id")


_APPLY_SQL = """
WITH ops AS (
  SELECT user_id, event_id, event_type, value,
         CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS ts_sec,
         CASE WHEN event_id % 4 = 3 THEN 'delete'
              WHEN event_id % 4 = 1 THEN 'update'
              ELSE 'insert' END AS op
  FROM events
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (
           PARTITION BY user_id ORDER BY ts_sec DESC, event_id DESC) AS rn
  FROM ops
)
SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
       value AS last_value
FROM ranked WHERE rn = 1 AND op <> 'delete'
ORDER BY user_id
"""


QUERIES = {
    "cdc_parse_typed": cdc_parse_typed,
    "cdc_apply_latest": cdc_apply_latest,
}

ORACLE = {
    "cdc_parse_typed": _PARSE_SQL,
    "cdc_apply_latest": _APPLY_SQL,
}
