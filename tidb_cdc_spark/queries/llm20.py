"""Crawl-archive ingest queries (r14): WARC — the container every
web-scale corpus actually arrives in — walked, HTTP-parsed, and
census'd with planted-arithmetic oracles.

Reference parity note: the reference (dollarkillerx/tidb-cdc) has no
ingest surface beyond Kafka CDC messages; this family belongs to the
north-star LLM-data-pipeline additions (SURVEY §2.1's engine-provided
categories), like the multimodal and audio paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def warc_ingest_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC ingest census over REAL crawl archives — the ISO 28500
    record walk (`functions/warc.py::warc_records`): version line +
    CRLF header block + Content-Length payload + CRLF CRLF
    separator, over all three storage layouts a crawl actually
    ships (plain WARC, record-per-gzip-member .warc.gz, whole-file
    gzip stream), with response records HTTP-parsed (status, MIME,
    chunked transfer-encoding de-chunked, gzip content-encoding
    decompressed — both gzip layers are stdlib zlib, the referee).

    Planted-transform oracle: file ``pid = doc_id % 131`` carries
    one warcinfo + ``K = 1 + pid % 4`` response records whose
    status / MIME / body are pure functions of (pid, k); variant
    ``doc_id div 131 % 3`` stores the SAME logical records as
    0 plain+identity, 1 gzip-members+chunked, 2 gzip-stream+gzipped
    bodies. ``distinct_bodies`` (md5 over DECODED bodies) therefore
    equals the number of distinct (pid, k) pairs iff the record
    walk, de-chunking, and both gzip layers are right — a broken
    layer inflates it. All columns from id arithmetic."""
    from tidb_cdc_spark.functions.warc import (
        synth_warc_media,
        warc_records,
    )
    from tidb_cdc_spark.session import materialize

    planted = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where(F.col("doc_id") >= 0)
        .select(
            F.col("doc_id").alias("media_id"),
            (F.col("doc_id") % 131).alias("pid"),
            (F.expr("doc_id div 131") % 3).cast("int").alias("variant"),
        )
    )
    recs = materialize(
        warc_records(synth_warc_media(planted, "media_id"))
    )
    resp = recs.where(F.col("warc_type") == "response")
    return (
        recs.agg(
            F.countDistinct("media_id").alias("n_files"),
            F.count(F.lit(1)).alias("n_records"),
        )
        .crossJoin(
            F.broadcast(
                resp.agg(
                    F.count(F.lit(1)).alias("n_responses"),
                    F.sum(
                        F.when(F.col("http_status") == 200, 1).otherwise(0)
                    ).cast("long").alias("n_status_200"),
                    F.sum(
                        F.when(F.col("mime") == "text/html", 1).otherwise(0)
                    ).cast("long").alias("n_html"),
                    F.sum("body_len").cast("long").alias("total_body_bytes"),
                    F.countDistinct(F.md5(F.col("body"))).alias(
                        "distinct_bodies"
                    ),
                )
            )
        )
        .select(
            "n_files",
            "n_records",
            "n_responses",
            "n_status_200",
            "n_html",
            "total_body_bytes",
            "distinct_bodies",
        )
    )


# plant arithmetic: file pid has 1 warcinfo + (1 + pid%4) responses;
# response k: status 200 iff (pid+k)%4 != 0, MIME html iff k even,
# body = 16-byte unit × (1 + (pid+k)%5) — bodies injective in
# (pid, k), so distinct_bodies counts distinct (pid, k) pairs
_WARC_INGEST_SQL = """
WITH m AS (
  SELECT doc_id % 131 AS pid FROM documents WHERE doc_id >= 0
), per AS (
  SELECT pid, COUNT(*) AS nf FROM m GROUP BY pid
), recs AS (
  SELECT pid, nf, UNNEST(range(0, 1 + pid % 4)) AS k FROM per
)
SELECT
  CAST((SELECT COUNT(*) FROM m) AS BIGINT) AS n_files,
  CAST((SELECT SUM(2 + pid % 4) FROM m) AS BIGINT) AS n_records,
  CAST((SELECT SUM(1 + pid % 4) FROM m) AS BIGINT) AS n_responses,
  CAST((SELECT SUM(nf * CASE WHEN (pid + k) % 4 <> 0 THEN 1 ELSE 0 END)
        FROM recs) AS BIGINT) AS n_status_200,
  CAST((SELECT SUM(nf * CASE WHEN k % 2 = 0 THEN 1 ELSE 0 END)
        FROM recs) AS BIGINT) AS n_html,
  CAST((SELECT SUM(nf * 16 * (1 + (pid + k) % 5))
        FROM recs) AS BIGINT) AS total_body_bytes,
  CAST((SELECT COUNT(*) FROM recs) AS BIGINT) AS distinct_bodies
"""


QUERIES = {
    "warc_ingest_audit": warc_ingest_audit,
}

ORACLE = {
    "warc_ingest_audit": _WARC_INGEST_SQL,
}
