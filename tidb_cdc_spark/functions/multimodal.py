"""Multimodal columns: images/audio/video as opaque ``binary``
columns with typed metadata structs, processed via Arrow-batched
``mapInPandas``.

North-star operator (BASELINE.json). The image/audio codec libraries
are not in this container, so the DECODE step is stubbed behind
``_decode_image_stub`` (deterministic fake, clearly marked); the
Spark-side plumbing — schema, batch iteration, partition sizing,
UDF signatures — is real and tested. Swapping the stub for
PIL/libvips/ffmpeg is a one-function change.

Scale notes:
- media bytes travel ONCE per stage: mapInPandas streams Arrow
  batches, so a 100 TB media corpus is a linear scan; keep
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` small enough that
  batch_rows × max_media_bytes fits executor memory.
- metadata-only queries must never touch the bytes: keep media in a
  separate column (parquet column pruning skips it) — enforced by
  the schema builder putting bytes LAST and tests asserting a
  metadata-only scan's ReadSchema excludes it.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Canonical multimodal record schema: typed metadata first (pruned
#: scans never read the bytes), opaque payload last.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image|audio|video
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
        StructField("payload", BinaryType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("sha256", StringType()),
        StructField("n_bytes", LongType()),
        StructField("feat_width", IntegerType()),
        StructField("feat_height", IntegerType()),
    ]
)


try:  # pragma: no cover — no codec libs in this container
    from PIL import Image as _PIL_Image
except ImportError:
    _PIL_Image = None


def _decode_image_stub(payload: bytes) -> tuple[int, int]:
    """STUB — deterministic fake decode (no codec libs in this
    container). The fake derives a stable (w, h) from the payload
    hash so tests are reproducible."""
    h = hashlib.sha256(payload).digest()
    return 64 + h[0] % 64, 64 + h[1] % 64


def decode_image_dims(payload: bytes) -> tuple[int, int]:
    """THE stub boundary, kept to one function: real decode when a
    codec library is importable (PIL — a container with codecs uses
    it automatically), deterministic fake otherwise. A payload PIL
    cannot parse also falls back to the fake (keeps the pipeline
    total; a production deployment wanting dead-lettering instead
    swaps this one function). Everything around it — schema, Arrow
    batching, partitioning — is real either way."""
    if _PIL_Image is not None:
        import io

        try:
            with _PIL_Image.open(io.BytesIO(payload)) as im:
                return int(im.size[0]), int(im.size[1])
        except Exception:
            return _decode_image_stub(payload)
    return _decode_image_stub(payload)


def extract_features(media: DataFrame, batch_size_hint: int = 256) -> DataFrame:
    """Decode/feature-extract media via ``mapInPandas`` — one pass
    over the bytes, Arrow-batched, output is small typed rows (the
    bytes do NOT survive into the output, so downstream stages
    shuffle features, never payloads)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "sha256": pdf["payload"].map(
                    lambda b: hashlib.sha256(bytes(b)).hexdigest()
                ),
                "n_bytes": pdf["payload"].map(len).astype("int64"),
            }
            dims = pdf["payload"].map(lambda b: decode_image_dims(bytes(b)))
            out["feat_width"] = dims.map(lambda d: d[0]).astype("int32")
            out["feat_height"] = dims.map(lambda d: d[1]).astype("int32")
            yield pd.DataFrame(out)

    return media.mapInPandas(extract, schema=FEATURE_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: bytes → bytes with updated metadata. The
    transform itself is the stub (identity payload); the schema/batch
    shape is the real contract."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["width"] = width
            pdf["height"] = height
            # STUB: real impl re-encodes payload at (width, height)
            yield pdf

    return media.mapInPandas(resize, schema=media.schema)


def frame_sample_plan(media: DataFrame, every_ms: int) -> DataFrame:
    """Video frame-sampling plan: one output row per sampled frame
    timestamp (pure expressions — the frame EXTRACTION would join
    this plan against the decoder; timestamps don't need the bytes)."""
    n_frames = (F.col("duration_ms") / every_ms).cast("int")
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0))),
                    lambda i: i * every_ms,
                )
            ).alias("frame_ts_ms"),
        )
    )


def synthesize_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests (payload = seeded
    bytes). Kinds cycle image/audio/video."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        payload = hashlib.sha256(str(i).encode()).digest() * 8
        rows.append(
            (
                i,
                kinds[i % 3],
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[
                    kinds[i % 3]
                ],
                None,
                None,
                (i + 1) * 1000 if kinds[i % 3] == "video" else None,
                payload,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
