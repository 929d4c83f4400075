"""Declared query surface: every entry is (Spark DataFrame builder,
DuckDB oracle SQL) — the correctness gate for SURVEY §2 coverage.

Conventions (all load-bearing for the cross-engine value-hash):
- every computed column aliased identically in Spark and SQL;
- money arithmetic in explicitly-cast tight decimals, aggregated
  exactly, cast to double only at the end (see functions/numeric.py);
- double-producing divisions performed on identical doubles in both
  engines (exact-sum cast to double, THEN divide);
- ties in any top-k broken by a unique key column.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from tidb_cdc_spark.queries import (
    batch,
    batch2,
    batch3,
    batch4,
    cdcq,
    llm,
    llm2,
    llm3,
    llm4,
    llm5,
    llm6,
    llm7,
    llm8,
    llm9,
    llm10,
    llm11,
)

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}

# Registry order is load-bearing: the driver's correctness gate checks
# the FIRST 50 entries in insertion order.  The LLM-pipeline surface
# (llm*.py, 44 queries) and the full CDC-consumer set (cdcq, 6) lead —
# exactly 50 — so every north-star operator gets a driver CORRECTNESS
# row; the TPC-H/events queries stay covered by the strict local
# mirror (tests/test_queries_oracle.py, driver-identical compare).
# llm11 (rows-only PQ) sits after cdcq deliberately — see its docstring
for mod in (llm, llm2, llm3, llm4, llm5, llm6, llm7, llm8, llm9, llm10, cdcq, llm11, batch, batch2, batch3, batch4):
    QUERIES.update(mod.QUERIES)
    ORACLE.update(mod.ORACLE)
