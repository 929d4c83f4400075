"""Tests for sliding-window document chunking (functions/chunking.py)."""

import pytest

from tidb_cdc_spark.functions import chunking as CH


def _df(spark, counts):
    return spark.createDataFrame(
        [(i, int(n)) for i, n in enumerate(counts)],
        "doc_id long, n_tokens long",
    )


def _spans(spark, n, window, stride):
    rows = (
        CH.chunk_spans(_df(spark, [n]), window=window, stride=stride)
        .orderBy("chunk_idx")
        .collect()
    )
    return [(r.start_tok, r.end_tok) for r in rows]


class TestChunkSpans:
    def test_doc_shorter_than_window_is_one_chunk(self, spark):
        assert _spans(spark, 10, 32, 24) == [(0, 10)]

    def test_exact_window_is_one_chunk(self, spark):
        assert _spans(spark, 32, 32, 24) == [(0, 32)]

    def test_one_past_window_adds_clipped_chunk(self, spark):
        assert _spans(spark, 33, 32, 24) == [(0, 32), (24, 33)]

    def test_long_doc_strides_with_overlap(self, spark):
        spans = _spans(spark, 100, 32, 24)
        assert spans == [(0, 32), (24, 56), (48, 80), (72, 100)]
        # every token covered, adjacent chunks overlap by window-stride
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert s2 < e1 and e1 - s2 == 32 - 24

    def test_no_chunk_fully_contained_in_predecessor(self, spark):
        # doc_id i has i+1 tokens — sweep lengths 1..129 in ONE job
        df = _df(spark, range(1, 130))
        by_doc: dict[int, list] = {}
        for r in (
            CH.chunk_spans(df, window=32, stride=24)
            .orderBy("doc_id", "chunk_idx")
            .collect()
        ):
            by_doc.setdefault(r.doc_id, []).append((r.start_tok, r.end_tok))
        assert set(by_doc) == set(range(129))
        for doc_id, spans in by_doc.items():
            n = doc_id + 1
            assert spans[-1][1] == n, (n, spans)  # last chunk reaches the end
            for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
                assert e2 > e1, (n, spans)

    def test_empty_doc_emits_nothing(self, spark):
        assert CH.chunk_spans(_df(spark, [0])).count() == 0

    def test_stride_validation(self, spark):
        with pytest.raises(ValueError):
            CH.chunk_spans(_df(spark, [5]), window=32, stride=0)
        with pytest.raises(ValueError):
            CH.chunk_spans(_df(spark, [5]), window=32, stride=33)

    def test_no_shuffle_in_plan(self, spark):
        plan = (
            CH.chunk_spans(_df(spark, [100, 50]))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan
