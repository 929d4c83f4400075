"""Multi-table Connector: the engine's equivalent of the reference's
registry + runner (``Connector`` / ``Register`` / ``Start``,
``/root/reference/cdc_manager.go:305-434``).

One registration = (TableSpec, sinks, source). ``start`` launches one
streaming query per registered table; each query is: source → parse
(pure expressions) → foreachBatch → sink fan-out, with a per-table
checkpoint directory carrying offsets (MarkMessage parity,
cdc_manager.go:299, upgraded to transactional checkpoints).

Divergences (SURVEY §7.5): duplicate registration raises (reference
panics, :383-385 — same contract, recoverable error instead); sink
errors propagate and fail the batch (reference logs and commits
anyway, :281-299 — data-loss bug we do not replicate).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from tidb_cdc_spark.cdc.parse import parse_cdc
from tidb_cdc_spark.cdc.spec import TableSpec
from tidb_cdc_spark.sources.kafka import KafkaSourceConfig, kafka_stream
from tidb_cdc_spark.streaming.sinks import Sink


@dataclass(frozen=True)
class ConnectorConfig:
    """Reference ``Configuration`` (``config.go:4-27``) minus the
    dead fields, plus checkpointing (which the reference lacks)."""

    server_name: str
    checkpoint_root: str
    brokers: list[str] = field(default_factory=list)
    starting_offsets: str = "earliest"
    max_offsets_per_trigger: int | None = None
    sasl_enabled: bool = False
    sasl_user: str | None = None
    sasl_password: str | None = None


@dataclass
class _Registration:
    group: str
    spec: TableSpec
    sinks: list[Sink]
    source: DataFrame | None  # None → Kafka topic from config


class Connector:
    def __init__(self, config: ConnectorConfig):
        self.config = config
        self._registrations: dict[str, _Registration] = {}
        self._queries: list[StreamingQuery] = []

    def register(
        self,
        spec: TableSpec,
        sinks: list[Sink],
        group: str | None = None,
        source: DataFrame | None = None,
    ) -> None:
        """Register a table (Register parity, cdc_manager.go:370-403).

        ``group`` defaults to the topic name ``server.db.table``
        (:390-391). ``source`` overrides the Kafka stream with any
        DataFrame bearing a ``value`` column (file streams in tests —
        same parse expressions either way).
        """
        group = group or spec.topic(self.config.server_name)
        if group in self._registrations:
            # reference panics here (:383-385); we raise
            raise ValueError(f"duplicate consumer group: {group}")
        if not spec.pk_columns:
            raise ValueError(f"spec {spec.table} needs a primary key for merge sinks")
        self._registrations[group] = _Registration(group, spec, list(sinks), source)

    def _source_for(self, spark: SparkSession, reg: _Registration) -> DataFrame:
        if reg.source is not None:
            return reg.source
        cfg = KafkaSourceConfig(
            brokers=self.config.brokers,
            topic=reg.spec.topic(self.config.server_name),
            group=reg.group,
            starting_offsets=self.config.starting_offsets,
            max_offsets_per_trigger=self.config.max_offsets_per_trigger,
            sasl_enabled=self.config.sasl_enabled,
            sasl_user=self.config.sasl_user,
            sasl_password=self.config.sasl_password,
        )
        return kafka_stream(spark, cfg)

    def start(
        self, spark: SparkSession, available_now: bool = False
    ) -> list[StreamingQuery]:
        """Launch one checkpointed query per registration.

        ``available_now=True`` drains what exists and stops (batch
        replay / tests); default is continuous micro-batches. Task
        parallelism per query = source partitions (the reference's
        NumOfConsumers goroutines, automatic here). A sink INSTANCE
        registered for several tables is serialized by a
        per-instance lock — each table's query runs its foreachBatch
        on its own thread, so without it a shared metrics/snapshot
        sink object would race (same guard as ``start_shared``)."""
        import threading

        sink_locks: dict[int, threading.Lock] = {}
        for _r in self._registrations.values():
            for _s in _r.sinks:
                sink_locks.setdefault(id(_s), threading.Lock())
        for reg in self._registrations.values():
            raw = self._source_for(spark, reg)
            seq = F.col("offset").cast("long") if "offset" in raw.columns else None
            changes = parse_cdc(raw, reg.spec, seq_col=seq)

            def make_batch_fn(r: _Registration):
                def fn(batch_df: DataFrame, batch_id: int) -> None:
                    batch_df.persist()
                    try:
                        # fan-out loop parity (cdc_manager.go:277-298) —
                        # but a sink error FAILS the batch (no silent
                        # offset commit past lost data)
                        for sink in r.sinks:
                            with sink_locks[id(sink)]:
                                sink.process(batch_df, batch_id, r.spec)
                    finally:
                        batch_df.unpersist()

                return fn

            writer = (
                changes.writeStream.foreachBatch(make_batch_fn(reg))
                .option(
                    "checkpointLocation",
                    f"{self.config.checkpoint_root}/{reg.group}",
                )
                .queryName(reg.group)
            )
            if available_now:
                writer = writer.trigger(availableNow=True)
            self._queries.append(writer.start())
        return list(self._queries)

    def start_shared(
        self,
        spark: SparkSession,
        source: DataFrame | None = None,
        available_now: bool = False,
        topic_pattern: str | None = None,
    ) -> StreamingQuery:
        """ONE streaming query serving EVERY registration — the
        many-table scale mode.

        ``start`` launches a query per table, which is right for tens
        of tables but not hundreds: each Spark streaming query costs a
        Kafka consumer group, a checkpoint log, a trigger loop, and
        driver scheduling. The shared form subscribes to a topic
        PATTERN (default ``server\\..*`` — topics are
        ``server.db.table``, cdc_manager.go:390-391), persists each
        raw micro-batch ONCE, and routes rows to each registration's
        typed parse + sinks with cheap filtered passes over the cached
        batch (the envelope's database/table fields via
        ``get_json_object``; rows of unregistered tables are ignored —
        watch them with ``parse.schema_drift`` if that matters).

        Ordering: identical guarantee to per-table mode — per-PK order
        within a topic-partition (seq = Kafka offset); neither mode
        orders across tables. Offsets commit once for the whole batch,
        so a sink error fails the batch for EVERY table (no partial
        commit; same no-silent-loss stance as ``start``).
        """
        import threading

        regs = list(self._registrations.values())
        if not regs:
            raise ValueError("no registrations")
        # a sink INSTANCE may back several registrations (one metrics
        # sink for every table); the concurrent routing below must not
        # let two threads run its process() at once — per-instance
        # locks restore the sequential-loop guarantee for shared
        # sinks. (Distinct sink instances pointed at one output path
        # were never safe in either mode — per-table `start` always
        # ran them concurrently.)
        sink_locks: dict[int, threading.Lock] = {}
        for _r in regs:
            for _s in _r.sinks:
                sink_locks.setdefault(id(_s), threading.Lock())
        if source is None:
            cfg = KafkaSourceConfig(
                brokers=self.config.brokers,
                topic_pattern=topic_pattern
                or self.config.server_name.replace(".", "\\.") + "\\..*",
                group=f"{self.config.server_name}-shared",
                starting_offsets=self.config.starting_offsets,
                max_offsets_per_trigger=self.config.max_offsets_per_trigger,
                sasl_enabled=self.config.sasl_enabled,
                sasl_user=self.config.sasl_user,
                sasl_password=self.config.sasl_password,
            )
            source = kafka_stream(spark, cfg)
        has_offset = "offset" in source.columns

        def batch_fn(batch_df: DataFrame, batch_id: int) -> None:
            from concurrent.futures import ThreadPoolExecutor

            # ONE slim routing parse per row, cached with the batch:
            # separate get_json_object calls each re-parse the whole
            # JSON document and would run 2× per registration; a
            # 2-field from_json runs once total, and the per-table
            # routing filters are then plain column comparisons over
            # the cached rows
            routed = batch_df.withColumn(
                "_route",
                F.from_json(
                    F.col("value").cast("string"),
                    "database string, table string",
                ),
            ).persist()

            def handle(r: _Registration) -> None:
                sub = routed.filter(
                    (F.col("_route.database") == r.spec.database)
                    & (F.col("_route.table") == r.spec.table)
                ).drop("_route")
                seq = F.col("offset").cast("long") if has_offset else None
                changes = parse_cdc(sub, r.spec, seq_col=seq)
                for sink in r.sinks:
                    with sink_locks[id(sink)]:
                        sink.process(changes, batch_id, r.spec)

            # CONCURRENT routed passes: a sequential loop serializes
            # N small Spark jobs per batch and loses to per-table
            # mode's N independent trigger loops by ~N/parallelism
            # (tools/shared_width_rehearsal.py measured 2.7× slower
            # at 24 tables before this).  Driver threads submit jobs
            # Spark schedules side by side over the SAME cached
            # batch; sinks of one registration still run in order.
            # Any failure propagates out of .result() and fails the
            # whole batch — offsets never commit past a lost table.
            #
            # Presence prefilter: at hundreds of registrations a
            # micro-batch usually carries rows for a FRACTION of the
            # tables; one tiny distinct-collect over the cached batch
            # (bounded by #tables, not #rows) skips every absent
            # registration's filter+parse+sink jobs.  A skipped sink
            # sees nothing — identical to processing an empty frame,
            # which every Sink treats as a no-op merge.
            try:
                present = {
                    (r["database"], r["table"])
                    for r in routed.select(
                        F.col("_route.database").alias("database"),
                        F.col("_route.table").alias("table"),
                    )
                    .distinct()
                    .collect()
                }
                live = [
                    r
                    for r in regs
                    if (r.spec.database, r.spec.table) in present
                ]
                if live:
                    with ThreadPoolExecutor(
                        max_workers=min(32, len(live))
                    ) as ex:
                        for fut in [ex.submit(handle, r) for r in live]:
                            fut.result()
            finally:
                routed.unpersist()

        writer = (
            source.writeStream.foreachBatch(batch_fn)
            .option(
                "checkpointLocation",
                f"{self.config.checkpoint_root}/_shared",
            )
            .queryName(f"{self.config.server_name}-shared")
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        q = writer.start()
        self._queries.append(q)
        return q

    def await_termination(self, timeout: float | None = None) -> None:
        for q in self._queries:
            q.awaitTermination(timeout)

    def stop(self) -> None:
        """Graceful shutdown (signal-wait parity, cdc_manager.go:175-187)."""
        for q in self._queries:
            if q.isActive:
                q.stop()
        self._queries.clear()
