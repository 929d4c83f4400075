"""Type-2 slowly-changing-dimension history from a CDC change
stream: every change becomes a versioned row with a
``[valid_from, valid_to)`` validity interval; a delete closes the
previous version's interval without opening a new one.

The reference applies changes only as latest-wins upserts through
user handlers (cdc_manager.go:43-47 — no history surface); SCD2 is
the standard warehouse consumer of exactly this change feed, so the
engine ships it as a first-class operator next to
``apply.conflate_latest``.

Plan shape: ONE hash exchange on the primary key serves both window
passes (version ordinal + interval close via ``lead``) — the minimal
movement for per-key ordered semantics. State per row is O(1); no
unbounded frames. At 100 TB of backlog the cost is the one shuffle
of the change log, same as conflation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tidb_cdc_spark.cdc.schema import CDCType
from tidb_cdc_spark.cdc.spec import TableSpec


def scd2_history(
    changes: DataFrame,
    spec: TableSpec,
    ts_col: str = "ts",
    seq_col: str = "_seq",
) -> DataFrame:
    """Versioned history rows from typed change rows (the
    ``parse_cdc`` output schema ``op, ts, _seq, before, after``).

    Output: PK columns, the after-image attributes, ``version``
    (per-key change ordinal — deletes consume an ordinal so replaying
    the log always yields the same numbering), ``valid_from`` /
    ``valid_to`` (the ts of this change / the next change on the key,
    null while open), ``is_current``. Delete changes close intervals
    but emit no row.
    """
    pk = spec.pk_columns
    if not pk:
        raise ValueError(f"spec {spec.table} has no primary key")
    keyed = changes.select(
        *[
            F.coalesce(F.col(f"after.{c}"), F.col(f"before.{c}")).alias(c)
            for c in pk
        ],
        "op",
        F.col(ts_col).alias("valid_from"),
        F.col(seq_col).alias("__seq"),
        F.col("after").alias("__after"),
    )
    w = Window.partitionBy(*pk).orderBy("valid_from", "__seq")
    attrs = [c.target for c in spec.resolved_columns() if not c.pk]
    return (
        keyed.withColumn("version", F.row_number().over(w).cast("long"))
        .withColumn("valid_to", F.lead("valid_from").over(w))
        .filter(F.col("op") != CDCType.DELETE)
        .select(
            *pk,
            *[F.col(f"__after.{a}").alias(a) for a in attrs],
            "version",
            "valid_from",
            "valid_to",
            F.col("valid_to").isNull().alias("is_current"),
        )
    )
