"""Maxwell CDC envelope schema.

Reference: ``CDCSchema`` at ``/root/reference/cdc_utils.go:14-21`` —
one JSON document per Kafka message:

    {database, table, type: delete|insert|update, ts: epoch-seconds,
     data: {col: val, ...},   # full after-image (or deleted row)
     old:  {col: val, ...}}   # update only: CHANGED columns only

Two-phase parse mirrors the reference's two-phase
``json.Unmarshal`` → ``MaxwellUnmarshal`` split
(``cdc_manager.go:213-256``): phase 1 keeps ``data``/``old`` as
``map<string,string>`` (lossless for scalars, absence-of-key
detectable — needed for before-image reconstruction); phase 2 is the
per-table typed projection in ``parse.py``.
"""

from __future__ import annotations

from pyspark.sql.types import (
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)


class CDCType:
    """Op-type enum, ``/root/reference/cdc_utils.go:23-29``."""

    INSERT = "insert"
    UPDATE = "update"
    DELETE = "delete"
    ALL = (INSERT, UPDATE, DELETE)


def envelope_schema() -> StructType:
    """Phase-1 envelope schema with string-map row images.

    ``from_json`` with MapType(String, String) coerces every scalar
    JSON value to its canonical string form and keeps absent keys
    absent — exactly the property the before-image overlay needs
    (distinguish "column not in old" from "column null in old").
    """
    return StructType(
        [
            StructField("database", StringType()),
            StructField("table", StringType()),
            StructField("type", StringType()),
            StructField("ts", LongType()),  # epoch seconds, cdc_utils.go:18
            StructField("data", MapType(StringType(), StringType())),
            StructField("old", MapType(StringType(), StringType())),
        ]
    )


ENVELOPE_SCHEMA = envelope_schema()
