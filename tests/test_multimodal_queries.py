"""Container-parse query wave (queries/llm18.py): the planted-value
contract between ``synth_container_media``'s formula-valued headers
and what ``probe_media``'s REAL chunk/box walks recover."""

from pyspark.sql import functions as F

from tidb_cdc_spark.functions.multimodal import (
    frame_sample_plan,
    parse_media_header,
    probe_media,
    synth_container_media,
)


def _expected_duration(mid: int) -> int:
    if mid % 2 == 0:
        return (16000 + (mid % 1000) * 16) * 1000 // (8000 + (mid % 32) * 250)
    dur = 2400 + (mid % 3000) if mid % 4 == 1 else 8589934592 + (mid % 3000)
    return dur * 1000 // (600 + (mid % 400))


def test_probe_recovers_every_planted_field(spark):
    ids = spark.range(0, 40).select(F.col("id").alias("media_id"))
    out = {
        r.media_id: r
        for r in probe_media(synth_container_media(ids)).collect()
    }
    assert len(out) == 40
    for mid, r in out.items():
        assert r.mime == ("audio/wav" if mid % 2 == 0 else "video/mp4")
        assert r.kind == ("audio" if mid % 2 == 0 else "video")
        assert r.duration_ms == _expected_duration(mid), mid
        assert r.width is None and r.height is None  # nothing invented


def test_v1_plants_exercise_the_64bit_duration_field(spark):
    """ids ≡ 3 (mod 4) carry a 2³³-based duration that cannot fit the
    v0 32-bit field — recovering it exactly proves the version-1
    box layout (16-byte ctime/mtime skip, 8-byte read) is live."""
    ids = spark.range(3, 4).select(F.col("id").alias("media_id"))
    row = probe_media(synth_container_media(ids)).collect()[0]
    assert row.duration_ms == (8589934592 + 3) * 1000 // (600 + 3)
    assert row.duration_ms > 2**32  # genuinely beyond the v0 field


def test_payloads_are_real_containers_not_just_markers(spark):
    """The driver-side parser must agree with the Arrow-path probe on
    the same bytes — the payloads are valid containers, not blobs the
    probe special-cases."""
    ids = spark.range(0, 8).select(F.col("id").alias("media_id"))
    for r in synth_container_media(ids).collect():
        parsed = parse_media_header(bytes(r.payload))
        assert parsed is not None
        mime, dur = parsed
        assert dur == _expected_duration(r.media_id)
        assert len(bytes(r.payload)) <= 72  # header-only plant


def test_frame_plan_counts_and_timestamps(spark):
    ids = spark.range(0, 40).select(F.col("id").alias("media_id"))
    v0 = probe_media(synth_container_media(ids)).filter(
        F.col("media_id") % 4 == 1
    )
    frames = frame_sample_plan(v0, every_ms=250).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r.media_id, []).append(r.frame_ts_ms)
    assert set(by_id) == {1, 5, 9, 13, 17, 21, 25, 29, 33, 37}
    for mid, ts in by_id.items():
        n = max(_expected_duration(mid) // 250, 1)
        assert sorted(ts) == [i * 250 for i in range(n)], mid


def test_frame_plan_short_video_gets_one_frame(spark):
    """duration < every_ms must yield exactly one frame at t=0 (the
    sequence floor), matching the oracle's greatest(n, 1)."""
    rows = [(1, "video", "video/mp4", None, None, 180, None)]
    from tidb_cdc_spark.functions.multimodal import MEDIA_SCHEMA

    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = frame_sample_plan(media, every_ms=250).collect()
    assert [(r.media_id, r.frame_ts_ms) for r in got] == [(1, 0)]
