"""Tests for corpus mixing / batch-layout planning
(functions/mixing.py)."""

from pyspark.sql import functions as F

from tidb_cdc_spark.functions import mixing as MX


def _docs_df(spark, rows):
    return spark.createDataFrame(
        [(i, s, int(n)) for i, (s, n) in enumerate(rows)],
        "doc_id long, source string, n_tokens long",
    )


class TestSourceMixPlan:
    def test_uniform_target_splits_total_evenly(self, spark):
        # web: 900 tokens, books: 100 → total 1000, uniform target 500
        rows = [("web", 300)] * 3 + [("books", 50)] * 2
        out = {
            r.source: r
            for r in MX.source_mix_plan(_docs_df(spark, rows)).collect()
        }
        web, books = out["web"], out["books"]
        assert web.n_tokens == 900 and books.n_tokens == 100
        assert web.target_tokens == 500 and books.target_tokens == 500
        # web must downsample to 500/900; books must repeat 5×
        assert web.need_ppm == 1_000_000 * 500 // 900
        assert web.sample_rate_ppm == web.need_ppm
        assert web.repeat_epochs == 1
        assert books.need_ppm == 5_000_000
        assert books.sample_rate_ppm == 1_000_000
        assert books.repeat_epochs == 5
        assert web.natural_ppm == 900_000 and books.natural_ppm == 100_000

    def test_explicit_weights(self, spark):
        rows = [("web", 800), ("books", 200)]
        out = {
            r.source: r
            for r in MX.source_mix_plan(
                _docs_df(spark, rows),
                weights_ppm={"web": 250_000, "books": 750_000},
                spark=spark,
            ).collect()
        }
        assert out["web"].target_tokens == 250
        assert out["books"].target_tokens == 750
        # missing-weight sources get target 0 (dropped from the mix)
        rows2 = rows + [("junk", 100)]
        out2 = {
            r.source: r
            for r in MX.source_mix_plan(
                _docs_df(spark, rows2),
                weights_ppm={"web": 1_000_000},
                spark=spark,
            ).collect()
        }
        assert out2["junk"].target_tokens == 0
        assert out2["junk"].sample_rate_ppm == 0

    def test_empty_source_does_not_divide_by_zero(self, spark):
        rows = [("web", 100), ("empty", 0)]
        out = {
            r.source: r
            for r in MX.source_mix_plan(_docs_df(spark, rows)).collect()
        }
        assert out["empty"].n_tokens == 0
        assert out["empty"].need_ppm == 50 * 1_000_000  # target 50 / max(0,1)


class TestPaddingWaste:
    def test_chunks_and_waste(self, spark):
        # budget 10: docs of 25 → 3 chunks (5 pad), 10 → 1 chunk
        # (0 pad), 1 → 1 chunk (9 pad), 0 → 0 chunks
        rows = [("a", 25), ("a", 10), ("a", 1), ("a", 0)]
        r = MX.padding_waste_stats(
            _docs_df(spark, rows), budget=10
        ).collect()[0]
        assert r.n_docs == 4 and r.n_tokens == 36
        assert r.padded_chunks == 5 and r.padded_tokens == 50
        assert r.waste_ppm == 1_000_000 * 14 // 50
        assert r.packed_chunks == 4  # ceil(36/10)
        assert r.chunks_saved == 1

    def test_all_empty_source(self, spark):
        r = MX.padding_waste_stats(
            _docs_df(spark, [("z", 0), ("z", 0)]), budget=10
        ).collect()[0]
        assert r.padded_chunks == 0 and r.waste_ppm == 0


class TestTokenLengthHistogram:
    def test_power_of_two_bucket_edges(self, spark):
        # bucket b holds 2^(b-1) <= n < 2^b; exact powers stay in
        # their own bucket's low edge (n=8 → bucket 4)
        rows = [("s", n) for n in (0, 1, 2, 3, 4, 7, 8, 1023, 1024)]
        out = {
            r.bucket: r
            for r in MX.token_length_histogram(_docs_df(spark, rows)).collect()
        }
        assert out[0].n_docs == 1 and out[0].max_tokens == 0
        assert out[1].n_docs == 1 and out[1].min_tokens == 1
        assert out[2].n_docs == 2  # 2, 3
        assert out[3].n_docs == 2  # 4, 7
        assert out[4].n_docs == 1 and out[4].min_tokens == 8
        assert out[10].n_docs == 1 and out[10].max_tokens == 1023
        assert out[11].n_docs == 1 and out[11].min_tokens == 1024


class TestIsqrtAndTemperature:
    def test_isqrt_exact_sweep(self, spark):
        import math

        vals = list(range(0, 200)) + [
            10**12 - 1,
            10**12,
            (2**31 - 1) ** 2,
            (2**31 - 1) ** 2 - 1,
            (2**31 - 1) ** 2 + 1,
        ]
        df = spark.createDataFrame([(v,) for v in vals], "x long")
        got = {
            r.x: r.s
            for r in df.select("x", MX.isqrt(F.col("x")).alias("s")).collect()
        }
        for v in vals:
            assert got[v] == math.isqrt(v), v

    def test_t2_flattens_mixture(self, spark):
        rows = [("big", 9000)] * 1 + [("small", 100)]
        out = {
            r.source: r
            for r in MX.temperature_mix_plan(_docs_df(spark, rows)).collect()
        }
        # natural: 9000/9100 vs 100/9100; t2 weights isqrt: 94 vs 10
        assert out["big"].t2_weight == 94 and out["small"].t2_weight == 10
        # the small source's target share rises vs natural, big's falls
        assert out["small"].t2_target_ppm > out["small"].natural_ppm
        assert out["big"].t2_target_ppm < out["big"].natural_ppm
        # and the small source must repeat to hit its target
        assert out["small"].repeat_epochs >= 2
