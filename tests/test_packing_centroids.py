"""Tests for sequence packing (functions/packing.py) and fixed-point
centroids (functions/centroids.py)."""

from pyspark.sql import functions as F

from tidb_cdc_spark.functions import centroids as CE
from tidb_cdc_spark.functions import packing as PK


def _tok_df(spark, counts, start_id=0):
    return spark.createDataFrame(
        [(start_id + i, int(c)) for i, c in enumerate(counts)],
        "doc_id long, n_tokens long",
    )


class TestGlobalRunningSum:
    def test_matches_naive_cumsum_across_shards(self, spark):
        counts = [5, 0, 7, 3, 11, 2, 9, 1, 4, 6, 8, 10]
        # n_shards=3 forces multiple shards over 12 docs: the
        # cross-shard offset path must be exercised, not just the
        # single-shard window
        got = {
            r.doc_id: r._cum
            for r in PK.global_running_sum(
                _tok_df(spark, counts), "doc_id", "n_tokens", n_shards=3
            ).collect()
        }
        cum = 0
        for i, c in enumerate(counts):
            cum += c
            assert got[i] == cum, f"doc {i}"

    def test_non_zero_based_and_gapped_ids(self, spark):
        df = spark.createDataFrame(
            [(100, 3), (205, 4), (999, 5)], "doc_id long, n_tokens long"
        )
        got = {
            r.doc_id: r._cum
            for r in PK.global_running_sum(
                df, "doc_id", "n_tokens", n_shards=4
            ).collect()
        }
        assert got == {100: 3, 205: 7, 999: 12}

    def test_empty_input(self, spark):
        df = _tok_df(spark, [])
        assert PK.global_running_sum(df, "doc_id", "n_tokens").count() == 0


class TestPackChunks:
    def test_chunk_spans(self, spark):
        # budget 10: doc0 tokens 0..7, doc1 tokens 8..14 (spans the
        # chunk 0/1 boundary), doc2 empty, doc3 tokens 15..24 (ends
        # exactly at the chunk-2 boundary), doc4 tokens 25..26
        df = _tok_df(spark, [8, 7, 0, 10, 2])
        rows = {
            r.doc_id: r for r in PK.pack_chunks(df, budget=10).collect()
        }
        assert (rows[0].start_tok, rows[0].chunk_first, rows[0].chunk_last,
                rows[0].n_chunks) == (0, 0, 0, 1)
        assert (rows[1].chunk_first, rows[1].chunk_last, rows[1].n_chunks) \
            == (0, 1, 2)
        assert (rows[2].chunk_first, rows[2].chunk_last, rows[2].n_chunks) \
            == (None, None, 0)
        assert (rows[3].start_tok, rows[3].chunk_first, rows[3].chunk_last) \
            == (15, 1, 2)
        assert (rows[4].start_tok, rows[4].chunk_first) == (25, 2)

    def test_exact_budget_doc(self, spark):
        # a doc exactly one budget long occupies exactly one chunk
        df = _tok_df(spark, [10, 10])
        rows = {
            r.doc_id: r for r in PK.pack_chunks(df, budget=10).collect()
        }
        assert (rows[0].chunk_first, rows[0].chunk_last) == (0, 0)
        assert (rows[1].chunk_first, rows[1].chunk_last) == (1, 1)

    def test_shard_count_does_not_change_layout(self, spark):
        counts = [3, 9, 1, 14, 6, 2, 8]
        a = sorted(
            PK.pack_chunks(_tok_df(spark, counts), 7, n_shards=1).collect()
        )
        b = sorted(
            PK.pack_chunks(_tok_df(spark, counts), 7, n_shards=5).collect()
        )
        assert a == b


def _emb_df(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


class TestCentroids:
    def test_centroid_of_identical_vectors(self, spark):
        v = [0.5, -0.25, 1.0]
        df = _emb_df(spark, [(0, v, 1), (1, v, 1)])
        cent = {
            r.pos: r.cq for r in CE.label_centroids(df).collect()
        }
        # floor(x * 2^20) of each component, mean of two equal rows
        assert cent == {0: 524288, 1: -262144, 2: 1048576}

    def test_truncating_mean_matches_div(self, spark):
        # components 1 and 2 (unscaled ~1e-6): sum 3 div 2 = 1
        df = _emb_df(
            spark,
            [
                (0, [1.0 / CE.SCALE], 0),
                (1, [2.0 / CE.SCALE], 0),
            ],
        )
        [r] = CE.label_centroids(df).collect()
        assert (r.pos, r.cq, r.n) == (0, 1, 2)

    def test_assignment_prefers_own_cluster(self, spark):
        rows = []
        for i in range(4):
            rows.append((i, [1.0 + 0.01 * i, 0.0], 0))
            rows.append((10 + i, [0.0, 1.0 + 0.01 * i], 1))
        df = _emb_df(spark, rows)
        out = CE.assign_nearest_centroid(df).collect()
        assert all(r.label == r.assigned for r in out)

    def test_tie_breaks_to_smaller_label(self, spark):
        # two centroids equidistant from the probe vector
        df = _emb_df(
            spark,
            [
                (0, [1.0, 0.0], 5),
                (1, [-1.0, 0.0], 3),
                (2, [0.0, 0.0], 9),  # probe: own centroid at origin
            ],
        )
        out = {r.vec_id: r for r in CE.assign_nearest_centroid(df).collect()}
        # vec 2 sits ON centroid 9 (dist 0) — sanity that self wins
        assert out[2].assigned == 9 and out[2].dist2 == 0
        # vecs 0 and 1 sit on their own centroids too
        assert out[0].assigned == 5 and out[1].assigned == 3

    def test_summary_is_integral(self, spark):
        df = _emb_df(
            spark, [(0, [0.1, 0.2], 0), (1, [0.3, 0.4], 0), (2, [1.0, 1.0], 1)]
        )
        rows = {r.label: r for r in CE.centroid_summary(df).collect()}
        assert rows[0].n_vectors == 2 and rows[1].n_vectors == 1
        # label 1 centroid == its only member, quantized
        assert rows[1].centroid_checksum == 2 * CE.SCALE
        assert rows[1].centroid_norm2 == 2 * CE.SCALE * CE.SCALE
