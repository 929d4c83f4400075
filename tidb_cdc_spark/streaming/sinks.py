"""Sinks: the engine's replacements for the reference's
``ConsumerHandler`` extension point (``cdc_manager.go:43-47``) plus
real built-in sinks the reference lacks (SURVEY §2.1).

All sinks are driven from one ``foreachBatch`` per table (handler
fan-out loop parity, ``cdc_manager.go:277-298``) with Structured
Streaming checkpointing carrying the offsets — and, because every
built-in sink is an idempotent latest-wins MERGE keyed on PK,
at-least-once replay upgrades to effectively-exactly-once (the
reference is at-least-once with swallowed handler errors,
``cdc_manager.go:281-299``; divergence #3 of SURVEY §7.5: a failing
sink here fails the batch and BLOCKS the offset commit).
"""

from __future__ import annotations

import json
import os
import shutil
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tidb_cdc_spark.cdc.apply import (
    align_to_spec,
    apply_changes,
    conflate_latest,
)
from tidb_cdc_spark.cdc.schema import CDCType
from tidb_cdc_spark.cdc.spec import TableSpec


class Sink:
    """One registered consumer of a table's typed change stream."""

    def process(self, changes: DataFrame, batch_id: int, spec: TableSpec) -> None:
        raise NotImplementedError


def guard_batch_watermark(last: int | None, batch_id: int, what: str) -> bool:
    """Shared replay/lineage policy for watermark-keeping sinks.

    Returns True when ``batch_id`` equals the stored watermark — the
    one legitimate at-least-once re-delivery (under a single
    checkpoint lineage batches arrive in order, so only the latest
    applied batch can ever be re-run) — meaning the caller should
    no-op. Raises when ``batch_id`` is BEHIND the watermark: that
    means a fresh/foreign checkpoint is writing into an existing
    store path, and silently skipping every batch until ids catch up
    would be silent data loss. ``last`` of None or <0 (legacy
    single-value pointers) means no watermark exists yet.
    """
    if last is None or last < 0:
        return False
    if batch_id == last:
        return True
    if batch_id < last:
        raise RuntimeError(
            f"batch id {batch_id} is behind the stored watermark {last}: "
            f"this {what} was written under a different checkpoint "
            "lineage; a stream with a fresh checkpoint must target a "
            "fresh sink path"
        )
    return False


@dataclass
class ParquetSnapshotSink(Sink):
    """Maintains a queryable current-state snapshot in Parquet via
    versioned directories (v=N) with a _CURRENT pointer — the
    copy-on-write MERGE pattern for a plain-Parquet table.

    Scale: each batch rewrites the snapshot via an anti-join on PK.
    At 100 TB the same sink logic targets a format with real MERGE
    (Delta/Iceberg) or a partitioned base where only touched
    partitions rewrite (partition pruning on the PK-hash prefix);
    the conflation/merge plan is identical.
    """

    path: str

    def _pointer(self) -> tuple[int, int] | None:
        """(version, last_applied_batch_id) from the _CURRENT pointer.

        The two values live in ONE file swapped with ``os.replace`` so
        version and batch watermark commit atomically together; older
        single-value pointers read back with batch_id -1 (unknown)."""
        ptr = os.path.join(self.path, "_CURRENT")
        if not os.path.exists(ptr):
            return None
        with open(ptr) as f:
            parts = f.read().split()
        return int(parts[0]), (int(parts[1]) if len(parts) > 1 else -1)

    def _current_version(self) -> int | None:
        p = self._pointer()
        return None if p is None else p[0]

    def _last_batch_id(self) -> int | None:
        p = self._pointer()
        return None if p is None else p[1]

    def read_current(self, spark) -> DataFrame | None:
        v = self._current_version()
        if v is None:
            return None
        return spark.read.parquet(os.path.join(self.path, f"v={v}"))

    def _commit_version(self, merged: DataFrame, batch_id: int) -> None:
        """Write the next snapshot version, atomically swap the
        pointer (version + batch watermark), GC old versions."""
        v = (self._current_version() or 0) + 1
        target = os.path.join(self.path, f"v={v}")
        merged.write.mode("overwrite").parquet(target)
        tmp = os.path.join(self.path, "_CURRENT.tmp")
        with open(tmp, "w") as f:
            f.write(f"{v} {batch_id}")
        os.replace(tmp, os.path.join(self.path, "_CURRENT"))  # atomic pointer swap
        # retain previous version for readers-in-flight; GC older
        for d in os.listdir(self.path):
            if d.startswith("v=") and int(d[2:]) < v - 1:
                shutil.rmtree(os.path.join(self.path, d), ignore_errors=True)

    def bootstrap(self, initial: DataFrame, spec: TableSpec) -> None:
        """Seed the snapshot with an initial full-table load — the
        snapshot-then-tail bootstrap every CDC migration starts with
        (the reference has no equivalent: it can only consume the
        topic from an offset, so a table older than the topic's
        retention can never be fully materialized).

        ``initial`` is the table exported from the source (parquet
        dump, JDBC read, …); columns are aligned to the spec exactly
        like a pre-evolution base (missing → typed NULL). Written as
        the first version with batch watermark −1, so the stream's
        batch 0 applies normally on top. Refuses to overwrite an
        existing snapshot — re-bootstrapping over live state is data
        loss, not a retry.

        Ordering caveat (same as any snapshot+log system): start the
        change stream from an offset AT OR BEFORE the export's
        consistent point; the PK-keyed latest-wins merge makes the
        overlap idempotent.
        """
        if self._pointer() is not None:
            raise RuntimeError(
                f"snapshot at {self.path} already exists — bootstrap "
                "targets a fresh path (re-seeding live state would "
                "discard applied changes)"
            )
        self._commit_version(align_to_spec(initial, spec), -1)

    def process(self, changes: DataFrame, batch_id: int, spec: TableSpec) -> None:
        spark = changes.sparkSession
        base = self.read_current(spark)
        merged = apply_changes(base, changes, spec)
        self._commit_version(merged, batch_id)


@dataclass
class Scd2HistorySink(ParquetSnapshotSink):
    """Maintains a Type-2 SCD history table (versioned rows with
    ``[valid_from, valid_to)`` intervals, ``cdc/scd.py``) instead of
    a current-state snapshot — same copy-on-write versioned-directory
    mechanics as ``ParquetSnapshotSink``, different merge: each batch
    closes the open interval of every touched key and appends the
    batch's new versions (``merge_scd2``). Checkpointed offsets +
    per-key ordered batches ⇒ the stored history equals a one-shot
    replay of the full log (pinned by the merge property test).

    Unlike the PK-keyed MERGE sinks, ``merge_scd2`` is append-based
    and NOT naturally idempotent — a foreachBatch re-delivery after a
    crash (offsets commit after ``process``) would close the batch's
    own just-written intervals at their own ``valid_from`` and append
    duplicate versions. The batch watermark stored atomically in the
    _CURRENT pointer makes replays an explicit no-op."""

    def bootstrap(
        self,
        initial: DataFrame,
        spec: TableSpec,
        as_of=None,
        ts_dtype: str = "long",
    ) -> None:
        """Seed the history with an initial full-table load: every
        row becomes its entity's version 1, open-ended
        ``[as_of, null)`` — pre-export history is unknowable from a
        snapshot, so the export's consistent point is where recorded
        history begins. ``as_of`` (required) must use the change
        stream's ts representation (``ts_dtype``, default epoch
        ``long`` to match the Maxwell envelope); the first change to
        a key AFTER ``as_of`` closes its seeded interval via the
        normal ``merge_scd2`` path.

        Overlap handling differs from the snapshot sink: latest-wins
        absorbs a replayed pre-export change, but ``merge_scd2``
        would close the seeded ``[as_of, null)`` interval at the
        stale change's EARLIER ts — an inverted interval plus a
        duplicate version carrying a pre-export image. So ``as_of``
        is persisted next to the pointer and ``process`` drops
        change rows with ts < as_of: they are already reflected in
        the export by definition of its consistent point."""
        if self._pointer() is not None:
            raise RuntimeError(
                f"history at {self.path} already exists — bootstrap "
                "targets a fresh path"
            )
        if as_of is None:
            raise ValueError(
                "as_of (the export's consistent point) is required for "
                "an SCD2 bootstrap — seeded intervals start there"
            )
        seeded = (
            align_to_spec(initial, spec)
            .withColumn("version", F.lit(1).cast("long"))
            .withColumn("valid_from", F.lit(as_of).cast(ts_dtype))
            .withColumn("valid_to", F.lit(None).cast(ts_dtype))
            .withColumn("is_current", F.lit(True))
        )
        self._commit_version(seeded, -1)
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, "_BOOTSTRAP.tmp")
        with open(tmp, "w") as f:
            json.dump({"as_of": as_of, "ts_dtype": ts_dtype}, f)
        os.replace(tmp, os.path.join(self.path, "_BOOTSTRAP"))

    def _bootstrap_as_of(self) -> tuple[object, str] | None:
        p = os.path.join(self.path, "_BOOTSTRAP")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            d = json.load(f)
        return d["as_of"], d["ts_dtype"]

    def process(self, changes: DataFrame, batch_id: int, spec: TableSpec) -> None:
        from tidb_cdc_spark.cdc.scd import merge_scd2

        if guard_batch_watermark(self._last_batch_id(), batch_id, "history"):
            return  # at-least-once replay of an already-applied batch
        boot = self._bootstrap_as_of()
        if boot is not None:
            # pre-export changes are already in the seeded state; for
            # history (unlike latest-wins) replaying them is not
            # idempotent — see bootstrap()
            as_of, ts_dtype = boot
            changes = changes.filter(
                F.col("ts") >= F.lit(as_of).cast(ts_dtype)
            )
        spark = changes.sparkSession
        base = self.read_current(spark)
        merged = merge_scd2(base, changes, spec)
        self._commit_version(merged, batch_id)


@dataclass
class Scd2SplitHistorySink(Scd2HistorySink):
    """Type-2 SCD history with a SPLIT store — the 100 TB layout the
    monolithic ``Scd2HistorySink`` documents itself out of: that sink
    joins and rewrites the FULL history every batch, so per-batch
    WRITE VOLUME grows with accumulated versions without bound.
    Measured (tools/stateful_width_rehearsal.py::scd2_single, 12
    batches × 50k changes): monolithic 0.7 → 9.6 MB written/batch
    and still climbing; split constant 1.3 MB/batch. At the r10
    12M-row interleaved sweep (``crossover 40 300000``, NOTES.md)
    the write-volume gap reached **162 MB/batch growing vs ~6
    MB/batch constant (27×)** — but wall-time on LOCAL NVMe never
    crossed: a 162 MB local parquet rewrite costs ~1-2 s while this
    sink's fixed two-materialize-pass overhead costs ~3.5 s/batch,
    and the fitted differential puts the local crossover near ~200M
    history rows. Choose by STORAGE, not microbench seconds: on
    replicated/remote stores (S3/HDFS) write volume is the cost and
    an O(history) per-batch rewrite is untenable — use this sink
    whenever history bytes ≫ ~30× batch bytes or the store is
    remote; prefer the monolithic sink for short histories on fast
    local disks (~25% faster there). This sink keeps

    - ``head_v=N/`` — ONE row per key ever seen (its latest version;
      open, or delete-closed with no successor), rewritten per batch
      with the same versioned-dir + atomic-pointer mechanics as
      ``ParquetSnapshotSink`` — cost ∝ live keyspace, the SAME
      accepted baseline as the latest-wins snapshot sink;
    - ``closed/b=<batch_id>/`` — every superseded version, written
      ONCE and immutable forever — cost ∝ batch.

    ``read_current`` = head ∪ closed(b ≤ watermark). Crash-retry is
    clean: the retry OVERWRITES its own ``closed/b=<id>`` dir (per-
    batch-dir idempotence) before the pointer swap publishes it, and
    the watermark guard no-ops true re-deliveries. ``compact()``
    folds the accumulated per-batch dirs into one when small-files
    listing cost matters (NearDupAdmissionSink convention).

    Compaction cadence (measured r11, ``stateful_width_rehearsal.py
    compact 40 300000`` — the same 12M-row history as the crossover
    sweep): one compact() = **4.6 s**, folding 40 dirs / 2,560 files
    / 174 MB into 1 dir / 12 files / 166 MB and cutting the closed-
    store read 1.0 → 0.23 s (4.4×). Cost is ONE closed-store
    rewrite (∝ closed bytes, independent of batch count), so at an
    every-N-batches cadence the amortized extra write volume is
    closed_bytes/N per batch — at N=40 here that's ~4 MB/batch,
    parity with the per-batch append itself, while keeping listing
    flat. Rule: compact when closed dirs reach a few dozen; shorten
    the cadence only if the store is read between batches (the read
    speedup, not write cost, is then the binding term).

    Fold equivalence with the monolithic sink is pinned by
    ``merge_scd2_split``'s contract tests."""

    def _closed_root(self) -> str:
        return os.path.join(self.path, "closed")

    def _read_closed(self, spark) -> DataFrame | None:
        self._recover_compact()  # repair a torn compact before reading
        root = self._closed_root()
        wm = self._last_batch_id()
        if wm is None or not os.path.exists(root):
            return None
        dirs = [d for d in os.listdir(root) if d.startswith("b=")]
        if not any(int(d[2:]) <= wm for d in dirs):
            return None
        return (
            spark.read.option("basePath", root)
            .parquet(root)
            .filter(F.col("b") <= wm)
            .drop("b")
        )

    def _read_head(self, spark) -> DataFrame | None:
        v = self._current_version()
        if v is None:
            return None
        return spark.read.parquet(os.path.join(self.path, f"head_v={v}"))

    def read_current(self, spark) -> DataFrame | None:
        head = self._read_head(spark)
        if head is None:
            return None
        closed = self._read_closed(spark)
        return head if closed is None else head.unionByName(closed)

    def _commit_version(self, head: DataFrame, batch_id: int) -> None:
        """Write the next HEAD version + swap the shared pointer.
        (Reused by ``bootstrap``, which seeds only open head rows.)"""
        v = (self._current_version() or 0) + 1
        head.write.mode("overwrite").parquet(
            os.path.join(self.path, f"head_v={v}")
        )
        tmp = os.path.join(self.path, "_CURRENT.tmp")
        with open(tmp, "w") as f:
            f.write(f"{v} {batch_id}")
        os.replace(tmp, os.path.join(self.path, "_CURRENT"))
        for d in os.listdir(self.path):
            if d.startswith("head_v=") and int(d[7:]) < v - 1:
                shutil.rmtree(os.path.join(self.path, d), ignore_errors=True)

    def process(self, changes: DataFrame, batch_id: int, spec: TableSpec) -> None:
        from tidb_cdc_spark.cdc.scd import merge_scd2_split

        if guard_batch_watermark(self._last_batch_id(), batch_id, "history"):
            return
        boot = self._bootstrap_as_of()
        if boot is not None:
            as_of, ts_dtype = boot
            changes = changes.filter(
                F.col("ts") >= F.lit(as_of).cast(ts_dtype)
            )
        spark = changes.sparkSession
        self._recover_compact()
        head = self._read_head(spark)
        new_head, newly_closed, batch_handles = merge_scd2_split(
            head, changes, spec
        )
        # the stores' layout reserves two names a table column cannot
        # use (partition dirs derive from them); fail loudly, not by
        # silently overwriting the data column (review catch)
        reserved = {"scd2zone", "b"} & set(new_head.columns)
        if reserved:
            raise ValueError(
                f"table columns {sorted(reserved)} collide with the "
                "split-store layout's reserved partition names "
                "(scd2zone, b) — rename via ColumnSpec(column=...)"
            )
        # ONE partitioned job computes both outputs (two separate
        # writes re-executed the shared merge subplan — measured 3×
        # the monolithic sink's batch cost before this; the batch
        # SCD2 subplan is additionally materialized inside
        # merge_scd2_split), staged then moved into the two stores;
        # the pointer swap publishes both atomically
        staging = os.path.join(self.path, f"_stage_b={batch_id}")
        shutil.rmtree(staging, ignore_errors=True)
        (
            new_head.withColumn("scd2zone", F.lit("head"))
            .unionByName(newly_closed.withColumn("scd2zone", F.lit("closed")))
            .write.partitionBy("scd2zone")
            .mode("overwrite")
            .parquet(staging)
        )
        closed_dst = os.path.join(self._closed_root(), f"b={batch_id}")
        os.makedirs(self._closed_root(), exist_ok=True)
        shutil.rmtree(closed_dst, ignore_errors=True)  # crash-retry
        src_closed = os.path.join(staging, "scd2zone=closed")
        src_head = os.path.join(staging, "scd2zone=head")
        if os.path.exists(src_closed):
            os.replace(src_closed, closed_dst)
        # else: batch closed nothing — create NO b=<id> dir at all.
        # _read_closed globs whatever b=* dirs exist and filters
        # b<=wm, so gaps are first-class; writing a schema-only
        # empty dir per idle batch re-created exactly the listing-
        # cost growth compact() exists to fight (r9-advice catch).
        # The rmtree above still clears a torn prior attempt.
        v = (self._current_version() or 0) + 1
        head_dst = os.path.join(self.path, f"head_v={v}")
        # a crash AFTER the head publish but BEFORE the pointer swap
        # leaves head_v=v populated while the watermark still admits
        # the retry — clear it like closed_dst or os.replace raises
        # ENOTEMPTY forever (review catch)
        shutil.rmtree(head_dst, ignore_errors=True)
        if os.path.exists(src_head):
            os.replace(src_head, head_dst)
        else:  # empty stream batch over an empty store
            new_head.limit(0).write.mode("overwrite").parquet(head_dst)
        shutil.rmtree(staging, ignore_errors=True)
        for handle in batch_handles:
            try:  # release this batch's persisted blocks
                handle.unpersist()
            except Exception:  # noqa: BLE001 — best-effort cache release
                pass
        tmp = os.path.join(self.path, "_CURRENT.tmp")
        with open(tmp, "w") as f:
            f.write(f"{v} {batch_id}")
        os.replace(tmp, os.path.join(self.path, "_CURRENT"))
        for d in os.listdir(self.path):
            if d.startswith("head_v=") and int(d[7:]) < v - 1:
                shutil.rmtree(os.path.join(self.path, d), ignore_errors=True)

    def _recover_compact(self) -> None:
        """Complete a compact() whose crash window was hit: a
        ``_compact.ready.<N>`` marker dir holds the complete fold of
        every ``b<=N`` dir — finish the protocol (remove the folded
        dirs, publish the fold as ``b=N``). Idempotent; called at the
        top of every read/process/compact so a half-removed closed
        store is repaired before anyone reads it."""
        root = self._closed_root()
        if not os.path.exists(root):
            return
        for d in os.listdir(root):
            if not d.startswith("_compact.ready."):
                continue
            n = int(d.rsplit(".", 1)[1])
            for e in os.listdir(root):
                if e.startswith("b=") and int(e[2:]) <= n:
                    shutil.rmtree(os.path.join(root, e), ignore_errors=True)
            os.replace(os.path.join(root, d), os.path.join(root, f"b={n}"))

    def compact(self, spark) -> tuple[int, int]:
        """Fold all published ``closed/b=*`` dirs into the newest one
        — per-batch dirs make ``read_current`` listing cost grow with
        batch count (~1 file set per batch). Returns
        ``(dirs_before, dirs_after)``. Unpublished dirs (> watermark,
        from an in-flight crash) are left untouched.

        Crash-safe via a two-phase marker (review catch — the naive
        remove-then-rename lost the whole closed store if the crash
        landed between): the fold is written to ``_compact.tmp``,
        atomically renamed to ``_compact.ready.<N>`` (the commit
        point; '_'-prefixed, invisible to Spark reads), and only then
        are the folded dirs removed and the fold published —
        ``_recover_compact`` finishes that tail after any crash."""
        self._recover_compact()
        root = self._closed_root()
        wm = self._last_batch_id()
        if wm is None or not os.path.exists(root):
            return (0, 0)
        dirs = sorted(
            int(d[2:])
            for d in os.listdir(root)
            if d.startswith("b=") and int(d[2:]) <= wm
        )
        if len(dirs) <= 1:
            return (len(dirs), len(dirs))
        merged = self._read_closed(spark)
        tmp = os.path.join(root, "_compact.tmp")
        shutil.rmtree(tmp, ignore_errors=True)
        merged.coalesce(max(1, merged.rdd.getNumPartitions() // 8)).write.mode(
            "overwrite"
        ).parquet(tmp)
        # commit point: after this rename the fold is authoritative
        os.replace(tmp, os.path.join(root, f"_compact.ready.{dirs[-1]}"))
        self._recover_compact()
        return (len(dirs), 1)


@dataclass
class JdbcMergeSink(Sink):
    """Upsert into an RDBMS table: conflated batch → staging table via
    JDBC → one MERGE statement keyed on PK (exactly-once to the
    target given idempotent MERGE + checkpointed offsets).

    Column identifiers are double-quoted (ANSI) in the generated
    MERGE, matching Spark's JDBC writer, which always quotes the
    column names it creates; table names are passed through as given
    so they resolve the same way for both engines. Integration-tested
    end-to-end against embedded Derby (on Spark's classpath; MERGE
    since 10.11) — in-memory Derby is same-JVM only, so on a real
    cluster point ``url`` at a network-reachable database.

    ``create_column_types`` is forwarded to the staging write's
    ``createTableColumnTypes`` — needed for dialects that map
    StringType to a non-comparable type by default (Derby: CLOB,
    which cannot sit in a MERGE ON clause).
    """

    url: str
    table: str
    properties: dict | None = None
    create_column_types: str | None = None

    def merge_sql(self, spec: TableSpec, staging: str) -> str:
        def q(c: str) -> str:
            return '"' + c + '"'

        cols = [c.source for c in spec.resolved_columns()]
        pk = spec.pk_columns
        on = " AND ".join(f"t.{q(c)} = s.{q(c)}" for c in pk)
        sets = ", ".join(f"{q(c)} = s.{q(c)}" for c in cols if c not in pk)
        ins_cols = ", ".join(q(c) for c in cols)
        ins_vals = ", ".join(f"s.{q(c)}" for c in cols)
        op = q("_op")
        return (
            f"MERGE INTO {self.table} t USING {staging} s ON {on} "
            f"WHEN MATCHED AND s.{op} = 'delete' THEN DELETE "
            f"WHEN MATCHED THEN UPDATE SET {sets} "
            f"WHEN NOT MATCHED AND s.{op} <> 'delete' THEN INSERT ({ins_cols}) VALUES ({ins_vals})"
        )

    def process(self, changes: DataFrame, batch_id: int, spec: TableSpec) -> None:
        latest = conflate_latest(changes, spec.pk_columns)
        staged = latest.select(
            F.col("op").alias("_op"),
            *[
                F.coalesce(F.col(f"after.{c}"), F.col(f"before.{c}")).alias(c)
                for c in [c.source for c in spec.resolved_columns()]
            ],
        )
        staging = f"{self.table}_stage_{batch_id}"
        props = self.properties or {}
        writer = (
            staged.write.format("jdbc")
            .option("url", self.url)
            .option("dbtable", staging)
            .options(**props)
        )
        if self.create_column_types:
            writer = writer.option("createTableColumnTypes", self.create_column_types)
        writer.mode("overwrite").save()
        spark = changes.sparkSession
        try:
            self._execute(spark, self.merge_sql(spec, staging))
        finally:
            # staging is per-batch scratch; a failed merge fails the
            # batch and the retry overwrites it anyway
            self._execute(spark, f"DROP TABLE {staging}", ignore_errors=True)

    def _execute(self, spark, sql: str, ignore_errors: bool = False) -> None:
        """Run one statement driver-side over java.sql (py4j) — the
        MERGE is a single server-side statement, not a Spark job."""
        jvm = spark._jvm
        props = jvm.java.util.Properties()
        for k, v in (self.properties or {}).items():
            props.setProperty(k, str(v))
        conn = jvm.java.sql.DriverManager.getConnection(self.url, props)
        try:
            stmt = conn.createStatement()
            try:
                stmt.execute(sql)
            except Exception:
                if not ignore_errors:
                    raise
            finally:
                stmt.close()
        finally:
            conn.close()


class HandlerSink(Sink):
    """ConsumerHandler parity (``cdc_manager.go:43-47``): user
    callbacks per op type, receiving DataFrames (set-oriented — the
    Spark-first upgrade of the row-at-a-time Go interface).

    Create(after) / Update(before, after) / Delete(before)."""

    def __init__(
        self,
        on_create: Callable[[DataFrame], None] | None = None,
        on_update: Callable[[DataFrame, DataFrame], None] | None = None,
        on_delete: Callable[[DataFrame], None] | None = None,
    ):
        self.on_create = on_create
        self.on_update = on_update
        self.on_delete = on_delete

    def process(self, changes: DataFrame, batch_id: int, spec: TableSpec) -> None:
        if self.on_create:
            rows = changes.filter(F.col("op") == CDCType.INSERT).select("after.*")
            self.on_create(rows)
        if self.on_update:
            upd = changes.filter(F.col("op") == CDCType.UPDATE)
            self.on_update(upd.select("before.*"), upd.select("after.*"))
        if self.on_delete:
            rows = changes.filter(F.col("op") == CDCType.DELETE).select("before.*")
            self.on_delete(rows)


class MemorySink(Sink):
    """Collects typed change rows per batch — test instrumentation."""

    def __init__(self):
        self.batches: list[tuple[int, list]] = []

    def process(self, changes: DataFrame, batch_id: int, spec: TableSpec) -> None:
        self.batches.append((batch_id, changes.collect()))
