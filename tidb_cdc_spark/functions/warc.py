"""WARC (ISO 28500) crawl-archive ingest — the front door of every
web-scale training-data pipeline (Common Crawl ships as .warc.gz).
Pure Python + stdlib zlib, no archive library:

- ``parse_warc_records``: the record grammar — ``WARC/1.x`` version
  line, CRLF header block, ``Content-Length`` payload block, CRLF
  CRLF record separator — over plain WARC bytes, per-record gzip
  members (the standard seekable .warc.gz layout), or a single
  gzip stream holding many records (also seen in the wild). Any
  malformed record fails the WHOLE file closed (no partial
  fabrication): crawl archives are checksummed upstream, a broken
  file is a broken file.
- ``parse_http_response``: response-record blocks → (status,
  headers, body) with ``Transfer-Encoding: chunked`` de-chunking
  and ``Content-Encoding: gzip/x-gzip/deflate`` decompression
  (stdlib zlib — the referee for every compressed path). Bodies
  whose coding is outside that envelope surface as NULL with the
  metadata kept — no pixel-path-style fabrication.
- ``warc_records``: the Spark surface — one Arrow-batched
  ``mapInPandas`` pass over (id, payload) rows emitting one row per
  record: metadata first, the (possibly large) body LAST in the
  schema so metadata-only scans never touch it (the multimodal
  column discipline). At 100 TB: files arrive via ``binaryFile`` /
  a blob manifest, the record walk is embarrassingly parallel, and
  only projected columns shuffle.

Scale shape: CPU ∝ archive bytes (one zlib pass + header walks);
the envelope avoids per-record Python string churn by slicing one
``bytes`` object. Record bodies dominate output size — downstream
ops should project them away before any shuffle.
"""

from __future__ import annotations

import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "parse_warc_records",
    "parse_http_response",
    "warc_records",
]


def _gunzip_members(payload: bytes):
    """Concatenated-gzip-member decompression (stdlib zlib, wbits=47
    auto-detects the gzip wrapper): returns the joined plaintext, or
    None on any corrupt member. Handles both the standard
    record-per-member .warc.gz layout and whole-file single-member
    streams — after joining, the record walk is identical."""
    out = []
    rest = payload
    while rest:
        d = zlib.decompressobj(47)
        try:
            out.append(d.decompress(rest))
        except zlib.error:
            return None
        if not d.eof:
            return None  # truncated member
        rest = d.unused_data
    return b"".join(out)


def parse_warc_records(payload: bytes):
    """ISO 28500 record walk → list of dicts with keys ``headers``
    (name-lowercased dict of the WARC header block) and ``block``
    (the Content-Length payload bytes), or None when the payload is
    not a well-formed WARC file (wrong magic, missing/invalid
    Content-Length, truncated block, missing CRLF CRLF separator,
    corrupt gzip member) — fail closed, never a partial record
    list."""
    p = payload
    if p[:2] == b"\x1f\x8b":
        p = _gunzip_members(p)
        if p is None:
            return None
    if not p or not p.startswith(b"WARC/"):
        return None
    records = []
    i = 0
    n = len(p)
    while i < n:
        if p[i : i + 5] != b"WARC/":
            return None  # garbage between records
        hdr_end = p.find(b"\r\n\r\n", i)
        if hdr_end < 0:
            return None  # unterminated header block
        lines = p[i:hdr_end].split(b"\r\n")
        # lines[0] is the version line (WARC/1.0 or 1.1)
        headers = {}
        last = None
        for ln in lines[1:]:
            if ln[:1] in (b" ", b"\t"):  # ISO 28500 header folding
                if last is None:
                    return None
                headers[last] += " " + ln.strip().decode(
                    "utf-8", "replace"
                )
                continue
            k, sep, v = ln.partition(b":")
            if not sep:
                return None
            last = k.strip().lower().decode("ascii", "replace")
            headers[last] = v.strip().decode("utf-8", "replace")
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError):
            return None
        if clen < 0:
            return None
        body_start = hdr_end + 4
        body_end = body_start + clen
        if body_end + 4 > n:
            return None  # truncated block or missing separator
        if p[body_end : body_end + 4] != b"\r\n\r\n":
            return None
        records.append(
            {"headers": headers, "block": p[body_start:body_end]}
        )
        i = body_end + 4
    return records if records else None


def _dechunk(body: bytes):
    """``Transfer-Encoding: chunked`` decode: hex-size CRLF lines,
    a zero-size terminator, optional trailer headers ignored.
    Returns the joined payload or None on malformed framing."""
    out = []
    i = 0
    n = len(body)
    while True:
        eol = body.find(b"\r\n", i)
        if eol < 0:
            return None
        size_token = body[i:eol].split(b";", 1)[0].strip()
        try:
            size = int(size_token, 16)
        except ValueError:
            return None
        i = eol + 2
        if size == 0:
            return b"".join(out)  # trailers (if any) ignored
        if i + size + 2 > n:
            return None
        out.append(body[i : i + size])
        if body[i + size : i + size + 2] != b"\r\n":
            return None
        i = i + size + 2


def parse_http_response(block: bytes):
    """HTTP response block of a WARC ``response`` record →
    ``(status int, headers dict, body bytes | None)`` or None when
    the block is not an HTTP response at all. Chunked
    transfer-encoding is de-chunked; gzip/x-gzip/deflate content-
    encodings are decompressed with stdlib zlib (deflate tried
    zlib-wrapped first, raw second — both appear in the wild); any
    other coding (br, zstd, compress) keeps the metadata and
    returns ``body=None`` — no fabricated payloads."""
    line_end = block.find(b"\r\n")
    if line_end < 0 or not block.startswith(b"HTTP/"):
        return None
    parts = block[:line_end].split(None, 2)
    if len(parts) < 2 or not parts[1].isdigit():
        return None
    status = int(parts[1])
    hdr_end = block.find(b"\r\n\r\n", line_end)
    if hdr_end < 0:
        return None
    headers = {}
    for ln in block[line_end + 2 : hdr_end].split(b"\r\n"):
        k, sep, v = ln.partition(b":")
        if not sep:
            return None
        headers[k.strip().lower().decode("ascii", "replace")] = (
            v.strip().decode("utf-8", "replace")
        )
    body = block[hdr_end + 4 :]
    if "chunked" in headers.get("transfer-encoding", "").lower():
        body = _dechunk(body)
        if body is None:
            return status, headers, None
    coding = headers.get("content-encoding", "identity").lower()
    if coding in ("gzip", "x-gzip"):
        try:
            body = zlib.decompress(body, 47)
        except zlib.error:
            body = None
    elif coding == "deflate":
        try:
            body = zlib.decompress(body)
        except zlib.error:
            try:
                body = zlib.decompress(body, -15)
            except zlib.error:
                body = None
    elif coding not in ("identity", ""):
        body = None  # br/zstd/...: codec territory
    return status, headers, body


#: metadata first, the big body column LAST (multimodal discipline)
def _warc_schema(id_field) -> StructType:
    return StructType(
        [
            id_field,
            StructField("record_idx", IntegerType()),
            StructField("warc_type", StringType()),
            StructField("target_uri", StringType()),
            StructField("warc_date", StringType()),
            StructField("http_status", IntegerType()),
            StructField("mime", StringType()),
            StructField("body_len", LongType()),
            StructField("body", BinaryType()),
        ]
    )


def warc_records(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    with_body: bool = True,
) -> DataFrame:
    """One row per WARC record via the REAL archive walk — plain,
    record-per-member gzip, and single-stream gzip files all land
    on the same grammar. ``response`` records carry their parsed
    HTTP status / MIME (the HTTP Content-Type up to ';') and the
    DECODED body (de-chunked, de-gzipped); other record types
    (warcinfo, request, metadata, ...) carry the raw block.
    Malformed files emit NO rows — no evidence, no records.

    ``with_body=False`` drops the payload column at the SOURCE
    (emits NULL bodies): a metadata-only census over 100 TB of
    archives then never materializes body bytes into Arrow at
    all — ``body_len`` still reports the decoded size."""
    id_field = media.schema[id_col]
    out_schema = _warc_schema(id_field)

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, raw in zip(pdf[id_col], pdf[payload_col]):
                if raw is None:
                    continue
                recs = parse_warc_records(bytes(raw))
                if recs is None:
                    continue
                for k, rec in enumerate(recs):
                    h = rec["headers"]
                    wtype = h.get("warc-type")
                    status, mime, body = None, None, rec["block"]
                    if wtype == "response":
                        parsed = parse_http_response(rec["block"])
                        if parsed is not None:
                            status, hh, body = parsed
                            ct = hh.get("content-type")
                            if ct:
                                mime = ct.split(";", 1)[0].strip()
                    rows.append(
                        (
                            mid,
                            k,
                            wtype,
                            h.get("warc-target-uri"),
                            h.get("warc-date"),
                            status,
                            mime,
                            None if body is None else len(body),
                            (body if with_body else None),
                        )
                    )
            cols = list(zip(*rows)) if rows else [[] for _ in range(9)]
            yield pd.DataFrame(
                {
                    id_col: pd.array(cols[0], dtype=pdf[id_col].dtype),
                    "record_idx": pd.array(cols[1], dtype="int32"),
                    "warc_type": pd.array(cols[2], dtype="object"),
                    "target_uri": pd.array(cols[3], dtype="object"),
                    "warc_date": pd.array(cols[4], dtype="object"),
                    "http_status": pd.array(cols[5], dtype="Int32"),
                    "mime": pd.array(cols[6], dtype="object"),
                    "body_len": pd.array(cols[7], dtype="Int64"),
                    "body": pd.array(cols[8], dtype="object"),
                }
            )

    return media.mapInPandas(walk, schema=out_schema)


# ---------------------------------------------------- TEST FIXTURES
# Real WARC writers, like the PNG/GIF/JPEG/WAV fixture encoders:
# the decode side above is the op under test.


def _encode_warc_record(headers: "list[tuple[str, str]]",
                        block: bytes) -> bytes:
    out = [b"WARC/1.0\r\n"]
    for k, v in headers:
        out.append(f"{k}: {v}\r\n".encode())
    out.append(f"Content-Length: {len(block)}\r\n".encode())
    out.append(b"\r\n")
    out.append(block)
    out.append(b"\r\n\r\n")
    return b"".join(out)


def _http_response_block(
    status: int,
    content_type: str,
    body: bytes,
    chunked: bool = False,
    gzip_body: bool = False,
) -> bytes:
    hdrs = [f"HTTP/1.1 {status} X", f"Content-Type: {content_type}"]
    payload = body
    if gzip_body:
        co = zlib.compressobj(6, zlib.DEFLATED, 31)
        payload = co.compress(body) + co.flush()
        hdrs.append("Content-Encoding: gzip")
    if chunked:
        hdrs.append("Transfer-Encoding: chunked")
        chunks = []
        for i in range(0, len(payload), 7):
            part = payload[i : i + 7]
            chunks.append(f"{len(part):x}\r\n".encode() + part + b"\r\n")
        chunks.append(b"0\r\n\r\n")
        payload = b"".join(chunks)
    else:
        hdrs.append(f"Content-Length: {len(payload)}")
    return "\r\n".join(hdrs).encode() + b"\r\n\r\n" + payload


def encode_warc(records: "list[bytes]", layout: str = "plain") -> bytes:
    """Assemble encoded records into a file: ``plain`` bytes,
    ``gzip_members`` (one gzip member per record — the standard
    seekable .warc.gz), or ``gzip_stream`` (whole file as one
    member)."""
    if layout == "plain":
        return b"".join(records)
    if layout == "gzip_members":
        out = []
        for r in records:
            co = zlib.compressobj(6, zlib.DEFLATED, 31)
            out.append(co.compress(r) + co.flush())
        return b"".join(out)
    if layout == "gzip_stream":
        co = zlib.compressobj(6, zlib.DEFLATED, 31)
        return co.compress(b"".join(records)) + co.flush()
    raise ValueError(f"unknown layout: {layout!r}")


def _planted_html_page(pid: int, k: int) -> bytes:
    """The HTML body mode (`crawl_html_pipeline`): a page whose
    EXTRACTED text is a pure function of (pid, k) — script/comment
    decoys around a headline with an ``&amp;`` entity plus
    ``reps = 1 + (pid+k) % 5`` word paragraphs, so
    ``html_strip_tags`` yields ``D{pid:03d}R{k} & co`` followed by
    reps repeated ``w{pid}_{k}`` tokens: 3 + reps whitespace
    tokens, text injective in (pid, k)."""
    reps = 1 + (pid + k) % 5
    return (
        '<html><head><title>ignored</title><script>var a="<b>x</b>";'
        "</script></head><body><!-- decoy -->"
        f"<h1>D{pid:03d}R{k} &amp; co</h1>"
        + f"<p>w{pid}_{k} </p>" * reps
        + "</body></html>"
    ).encode()


def _planted_warc_file(pid: int, variant: int,
                       bodies: str = "units") -> bytes:
    """The planted-arithmetic WARC file `warc_ingest_audit` reads:
    one warcinfo record + ``K = 1 + pid % 4`` response records whose
    url / status / MIME / body are pure functions of (pid, k) — so
    all three storage variants (0 plain+identity, 1 gzip-member +
    chunked bodies, 2 gzip-stream + gzip bodies) carry IDENTICAL
    logical records and every extracted column collapses iff the
    record walk, de-chunking, and both gzip layers decode right.
    Body of record k: ``bodies="units"`` → the 16-byte unit
    ``D{pid:03d}R{k}######`` repeated ``1 + (pid+k) % 5`` times;
    ``bodies="html"`` → :func:`_planted_html_page`."""
    date = "2026-01-01T00:00:00Z"
    info = _encode_warc_record(
        [
            ("WARC-Type", "warcinfo"),
            ("WARC-Date", date),
            ("WARC-Record-ID", f"<urn:uuid:info-{pid}-{variant}>"),
            ("Content-Type", "application/warc-fields"),
        ],
        f"software: synth/{variant}\r\n".encode(),
    )
    records = [info]
    for k in range(1 + pid % 4):
        if bodies == "html":
            body = _planted_html_page(pid, k)
        else:
            unit = f"D{pid:03d}R{k}".ljust(16, "#").encode()
            body = unit * (1 + (pid + k) % 5)
        status = 200 if (pid + k) % 4 else 404
        mime = "text/html" if k % 2 == 0 else "text/plain"
        block = _http_response_block(
            status,
            mime + "; charset=utf-8",
            body,
            chunked=(variant == 1),
            gzip_body=(variant == 2),
        )
        records.append(
            _encode_warc_record(
                [
                    ("WARC-Type", "response"),
                    ("WARC-Target-URI", f"https://ex.test/{pid:03d}/{k}"),
                    ("WARC-Date", date),
                    ("WARC-Record-ID", f"<urn:uuid:{pid}-{k}-{variant}>"),
                    ("Content-Type",
                     "application/http; msgtype=response"),
                ],
                block,
            )
        )
    layout = ("plain", "gzip_members", "gzip_stream")[variant]
    return encode_warc(records, layout)


def synth_warc_media(
    ids: DataFrame,
    id_col: str = "media_id",
    pid_col: str = "pid",
    variant_col: str = "variant",
    bodies: str = "units",
) -> DataFrame:
    """Plant REAL WARC files (see :func:`_planted_warc_file`) —
    payloads are pure functions of (pid, variant, bodies); ≤512-row
    yields (the Arrow batch-size discipline)."""
    from pyspark.sql import functions as F

    slim = ids.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.col(pid_col).cast("int").alias("_p"),
        F.col(variant_col).cast("int").alias("_v"),
    )
    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("payload", BinaryType()),
        ]
    )
    chunk = 512

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), chunk):
                seg = pdf.iloc[lo : lo + chunk]
                rows = [
                    (int(m), _planted_warc_file(int(p), int(v), bodies))
                    for m, p, v in zip(seg["media_id"], seg["_p"], seg["_v"])
                ]
                yield pd.DataFrame(
                    rows, columns=["media_id", "payload"]
                )

    # fan the id-sized input out before the Python chain starts —
    # same single-split rationale as multimodal._spread (guide §2.5)
    from tidb_cdc_spark.functions.multimodal import _spread

    return _spread(slim).mapInPandas(synth, schema=out_schema)
