"""Tests for vocabulary induction / source overlap / length bands
(functions/vocab.py) and int8 embedding quantization
(functions/quantize.py)."""

from pyspark.sql import functions as F

from tidb_cdc_spark.functions import quantize as QZ
from tidb_cdc_spark.functions import vocab as V


def _docs_df(spark, rows):
    return spark.createDataFrame(
        [(i, t, s) for i, (t, s) in enumerate(rows)],
        "doc_id long, text string, source string",
    )


class TestTopTerms:
    def test_counts_ranks_coverage(self, spark):
        docs = _docs_df(
            spark,
            [("a a a b", "s1"), ("b c", "s1"), ("A", "s2")],
        )
        rows = V.top_terms(docs, k=10).orderBy("rank").collect()
        # lowercased: a×4, b×2, c×1 — total 7
        assert [(r.token, r.cnt, r.rank) for r in rows] == [
            ("a", 4, 1),
            ("b", 2, 2),
            ("c", 1, 3),
        ]
        assert [r.cum_cnt for r in rows] == [4, 6, 7]
        assert rows[0].coverage_ppm == 1_000_000 * 4 // 7
        assert rows[-1].coverage_ppm == 1_000_000

    def test_tie_breaks_by_token(self, spark):
        docs = _docs_df(spark, [("z y x", "s")])
        rows = V.top_terms(docs, k=2).orderBy("rank").collect()
        assert [r.token for r in rows] == ["x", "y"]

    def test_topk_plan_avoids_global_sort(self, spark):
        docs = _docs_df(spark, [("a b c", "s")])
        plan = V.top_terms(docs, k=5)._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan


class TestSourceOverlap:
    def test_head_fingerprint_overlap(self, spark):
        shared = "x" * 150
        docs = _docs_df(
            spark,
            [
                (shared, "a"),
                (shared + "tail-differs", "b"),  # same 100-char head
                ("only-in-a", "a"),
                ("only-in-b", "b"),
                ("only-in-c", "c"),
            ],
        )
        rows = V.source_overlap(docs).collect()
        assert len(rows) == 1
        r = rows[0]
        assert (r.source_a, r.source_b, r.shared_fps) == ("a", "b", 1)
        assert r.a_total_fps == 2 and r.b_total_fps == 2
        assert r.overlap_ppm == 500_000

    def test_whole_text_mode_ignores_head_dups(self, spark):
        shared = "x" * 150
        docs = _docs_df(spark, [(shared, "a"), (shared + "tail", "b")])
        assert V.source_overlap(docs, prefix_chars=None).count() == 0
        docs2 = _docs_df(spark, [(shared, "a"), (shared, "b")])
        assert V.source_overlap(docs2, prefix_chars=None).count() == 1

    def test_within_source_dups_not_counted(self, spark):
        docs = _docs_df(spark, [("same", "a"), ("same", "a")])
        assert V.source_overlap(docs).count() == 0


class TestLengthQuantileBounds:
    def test_band_counts(self, spark):
        # token counts 1..10 in one source; p05=1.45, p95=9.55
        df = spark.createDataFrame(
            [("s", n) for n in range(1, 11)], "source string, n_tokens long"
        )
        r = V.length_quantile_bounds(df).collect()[0]
        assert abs(r.lo_bound - 1.45) < 1e-9
        assert abs(r.hi_bound - 9.55) < 1e-9
        assert (r.kept, r.dropped_short, r.dropped_long) == (8, 1, 1)


class TestInt8Quantize:
    def _emb_df(self, spark, vecs):
        return spark.createDataFrame(
            [(i, v, 0) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<float>, label int",
        )

    def test_known_vector(self, spark):
        # q = floor(x * 2^20): [1048576, -524288, 0]
        emb = self._emb_df(spark, [[1.0, -0.5, 0.0]])
        r = QZ.int8_quantize_stats(emb).collect()[0]
        assert r.maxabs_q == 1 << 20
        # iq = (q*127) div maxabs = [127, -63 (truncated toward 0), 0]
        assert r.iq_checksum == 127 * 1 + (-63) * 2 + 0 * 3
        assert r.nonzero == 2
        # err = |q*127 - iq*maxabs|: [0, |−66584576+66060288|, 0]
        assert r.err_l1 == abs(-524288 * 127 - (-63) * 1048576)

    def test_zero_vector_guard(self, spark):
        emb = self._emb_df(spark, [[0.0, 0.0]])
        r = QZ.int8_quantize_stats(emb).collect()[0]
        assert (r.maxabs_q, r.nonzero, r.iq_checksum, r.err_l1) == (0, 0, 0, 0)

    def test_iq_bounded_to_int8(self, spark):
        import random

        random.seed(7)
        vecs = [
            [random.uniform(-2, 2) for _ in range(16)] for _ in range(20)
        ]
        emb = self._emb_df(spark, vecs)
        comp = emb.select(
            "vec_id", F.posexplode("embedding").alias("pos", "x")
        ).select(
            "vec_id",
            "pos",
            F.floor(F.col("x").cast("double") * QZ.SCALE)
            .cast("long")
            .alias("q"),
        )
        from pyspark.sql.window import Window

        w = Window.partitionBy("vec_id")
        iqs = (
            comp.withColumn("m", F.max(F.abs("q")).over(w))
            .select(F.expr("(q * 127) div m").alias("iq"))
            .agg(F.min("iq"), F.max("iq"))
            .collect()[0]
        )
        assert -127 <= iqs[0] and iqs[1] <= 127

    def test_single_shuffle_plan(self, spark):
        emb = self._emb_df(spark, [[1.0, 2.0], [3.0, 4.0]])
        plan = (
            QZ.int8_quantize_stats(emb)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # window shuffle on vec_id is reused by the final agg — the
        # plan must not exchange a second time
        assert plan.count("Exchange hashpartitioning") == 1


class TestTermDrift:
    def test_drift_directions_and_exactness(self, spark):
        from tidb_cdc_spark.functions.vocab import term_drift

        old = spark.createDataFrame(
            [(0, "alpha beta beta gamma"), (1, "alpha beta delta")],
            "doc_id long, text string",
        )
        new = spark.createDataFrame(
            [(0, "alpha beta"), (1, "alpha zeta zeta zeta")],
            "doc_id long, text string",
        )
        out = term_drift(old, new, k=10).toPandas().set_index("token")
        # old totals: 7 tokens; new: 6
        assert out.loc["zeta", "ppm_old"] == 0
        assert out.loc["zeta", "ppm_new"] == 3 * 1_000_000 // 6
        assert out.loc["delta", "ppm_new"] == 0
        assert out.loc["delta", "ppm_old"] == 1 * 1_000_000 // 7
        assert (
            out.delta_ppm == out.ppm_new - out.ppm_old
        ).all()
        # ranked by |delta| descending
        d = out.delta_ppm.abs().to_numpy()
        assert all(d[i] >= d[i + 1] for i in range(len(d) - 1))
