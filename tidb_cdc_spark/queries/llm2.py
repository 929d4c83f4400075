"""Second wave of pipeline queries: multimodal feature extraction,
CDC dead-letter accounting, and BPE-ish tokenization — each
oracle-checked (the multimodal decode stub is hash-derived, so even
the fake dimensions are cross-engine verifiable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tidb_cdc_spark.cdc.parse import parse_envelope
from tidb_cdc_spark.functions import text as T
from tidb_cdc_spark.functions.multimodal import extract_features
from tidb_cdc_spark.queries.llm import _docs


# ------------------------------------------- multimodal feature pass
def multimodal_doc_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents re-cast as a media table (payload = UTF-8 bytes,
    metadata first / bytes last) pushed through the REAL multimodal
    path: Arrow-batched ``mapInPandas`` decode → small typed feature
    rows (sha256, byte count, stub-decoded dimensions). The decode
    stub derives dimensions from the payload hash, so the whole
    output — including the fake dims — is oracle-checkable."""
    d = _docs(spark, sf_dir)
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.lit("text/plain").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )
    return extract_features(media).orderBy("media_id")


def _hex_byte(sql_expr: str, pos: int) -> str:
    """DuckDB int value of hex chars [pos, pos+1] (1-based) of a hex
    string — mirrors ``hashlib.sha256(...).digest()[i]``."""
    c1 = f"substr({sql_expr}, {pos}, 1)"
    c2 = f"substr({sql_expr}, {pos + 1}, 1)"
    return (
        f"((strpos('0123456789abcdef', {c1}) - 1) * 16"
        f" + (strpos('0123456789abcdef', {c2}) - 1))"
    )


_MULTIMODAL_SQL = f"""
SELECT doc_id AS media_id, 'image' AS kind,
       sha256(text) AS sha256,
       octet_length(encode(text)) AS n_bytes,
       64 + ({_hex_byte('sha256(text)', 1)} % 64) AS feat_width,
       64 + ({_hex_byte('sha256(text)', 3)} % 64) AS feat_height
FROM documents
ORDER BY media_id
"""


# --------------------------------------------- CDC dead-letter stats
def cdc_dead_letter_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-event accounting — the §7.5 divergence from the
    reference (which PANICS the consumer on bad JSON,
    cdc_manager.go:164): every 7th synthesized envelope is corrupted;
    the engine's dead-letter column captures it and the stream keeps
    flowing. Output: rows per op label with 'corrupt' as its own
    bucket."""
    from tidb_cdc_spark.session import fan_out, read_table

    ev = fan_out(read_table(spark, sf_dir, "events"), spark)
    op = (
        F.when(F.col("event_id") % 4 == 3, "delete")
        .when(F.col("event_id") % 4 == 1, "update")
        .otherwise("insert")
    )
    good = F.to_json(
        F.struct(
            F.lit("app").alias("database"),
            F.lit("events").alias("table"),
            op.alias("type"),
            F.unix_timestamp(F.col("ts")).alias("ts"),
            F.struct(F.col("event_id"), F.col("user_id")).alias("data"),
        )
    )
    value = F.when(
        F.col("event_id") % 7 == 0, F.concat(F.lit("not json "), good)
    ).otherwise(good)
    src = ev.select(value.alias("value")).localCheckpoint(eager=False)
    env = parse_envelope(src)
    label = F.when(F.col("_corrupt").isNotNull(), "corrupt").otherwise(
        F.col("type")
    )
    return (
        env.groupBy(label.alias("op_label"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("op_label")
    )


_DEAD_LETTER_SQL = """
SELECT CASE WHEN event_id % 7 = 0 THEN 'corrupt'
            WHEN event_id % 4 = 3 THEN 'delete'
            WHEN event_id % 4 = 1 THEN 'update'
            ELSE 'insert' END AS op_label,
       COUNT(*) AS n
FROM events
GROUP BY op_label
ORDER BY op_label
"""


# ---------------------------------------------------- BPE tokenizing
def text_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-word (BPE-ish regex) token counts next to whitespace
    counts — the tokens-per-word ratio is a standard quality signal
    for training-data curation."""
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        T.bpe_token_count(F.col("text")).alias("n_bpe"),
        T.token_count(F.col("text")).alias("n_ws"),
    ).orderBy("doc_id")


_BPE_SQL = rf"""
SELECT doc_id,
       len(regexp_extract_all(text, '{T.BPE_TOKEN_RE}')) AS n_bpe,
       len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS n_ws
FROM documents
ORDER BY doc_id
"""


QUERIES = {
    "multimodal_doc_features": multimodal_doc_features,
    "cdc_dead_letter_stats": cdc_dead_letter_stats,
    "text_bpe_tokens": text_bpe_tokens,
}

ORACLE = {
    "multimodal_doc_features": _MULTIMODAL_SQL,
    "cdc_dead_letter_stats": _DEAD_LETTER_SQL,
    "text_bpe_tokens": _BPE_SQL,
}
