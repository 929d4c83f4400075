"""Tests for repetition stats, quality filtering, and contamination
detection (functions/quality.py)."""

from pyspark.sql import functions as F

from tidb_cdc_spark.functions import quality as Q
from tidb_cdc_spark.functions import sampling as SA


class TestRepetitionStats:
    def test_hand_checked(self, spark):
        docs = spark.createDataFrame(
            [
                (0, "a a a b"),
                (1, "x y z w"),
                (2, "ab!?"),
                (3, "   "),
            ],
            "doc_id long, text string",
        )
        rows = {r.doc_id: r for r in Q.repetition_stats(docs).collect()}
        r0 = rows[0]
        # tokens: a a a b → top a=3/4; 2-grams: (a a, a a, a b) → 1 dup
        # of 3; 3-grams: (a a a, a a b) → 0 dup of 2
        assert r0.n_tokens == 4
        assert r0.top_token_ppm == 750000
        assert r0.dup_2gram_ppm == 333333
        assert r0.dup_3gram_ppm == 0
        r1 = rows[1]
        assert (r1.top_token_ppm, r1.dup_2gram_ppm) == (250000, 0)
        # "ab!?": 2 symbol chars of 4
        assert rows[2].symbol_ppm == 500000
        # whitespace-only doc: all-zero stats, still present
        r3 = rows[3]
        assert (r3.n_tokens, r3.top_token_ppm, r3.dup_2gram_ppm) == (0, 0, 0)

    def test_case_insensitive_tokens(self, spark):
        docs = spark.createDataFrame([(0, "The THE the")], "doc_id long, text string")
        r = Q.repetition_stats(docs).collect()[0]
        assert r.top_token_ppm == 1000000  # all one token after lower()


class TestQualityFilter:
    def test_reasons_ordered_and_keep(self, spark):
        long_clean = " ".join(f"w{i}" for i in range(30))
        docs = spark.createDataFrame(
            [
                (0, long_clean),  # keep
                (1, "short doc"),  # too_short
                (2, "spam " * 30),  # top_token AND dup_2gram (not short)
            ],
            "doc_id long, text string",
        )
        rows = {r.doc_id: r for r in Q.quality_filter(docs).collect()}
        assert rows[0].keep and rows[0].fail_reasons == ""
        # 2 tokens: short AND max token share 1/2 > 20 % — order fixed
        assert not rows[1].keep and rows[1].fail_reasons == "too_short,top_token"
        assert rows[2].fail_reasons == "top_token,dup_2gram"

    def test_custom_thresholds(self, spark):
        docs = spark.createDataFrame(
            [(0, "one two three")], "doc_id long, text string"
        )
        t = Q.QualityThresholds(min_tokens=1, max_top_token_ppm=400000)
        assert Q.quality_filter(docs, t).collect()[0].keep


class TestShingleStringRows:
    def test_counts_and_short_doc(self, spark):
        ten = " ".join(f"t{i}" for i in range(10))
        docs = spark.createDataFrame(
            [(0, ten), (1, "a b c")], "doc_id long, text string"
        )
        sh = Q.shingle_string_rows(docs, k=8)
        by_doc = {}
        for r in sh.collect():
            by_doc.setdefault(r.doc_id, set()).add(r._g)
        assert len(by_doc[0]) == 3  # 10 - 8 + 1
        assert by_doc[1] == {"a b c"}  # n < k → one all-token shingle

    def test_distinct(self, spark):
        docs = spark.createDataFrame(
            [(0, "a b a b a b a b a b")], "doc_id long, text string"
        )
        # 10 tokens → 3 positional 8-shingles, 2 identical ("a b"*4
        # starting on 'a') → distinct set smaller than count
        got = Q.shingle_string_rows(docs, k=8).count()
        assert got == 2


class TestContamination:
    def test_duplicate_across_split_detected(self, spark):
        # find an eval id and a train id under the default split,
        # then plant identical text on both
        ids = spark.range(0, 50).select(
            F.col("id"),
            (SA.hash_bucket(F.col("id"), "eval") < int(0.10 * 2**32)).alias("e"),
        ).collect()
        eval_id = next(r.id for r in ids if r.e)
        train_ids = [r.id for r in ids if not r.e][:2]
        shared = " ".join(f"s{i}" for i in range(12))
        unique = " ".join(f"u{i}" for i in range(12))
        docs = spark.createDataFrame(
            [
                (eval_id, shared),
                (train_ids[0], shared),
                (train_ids[1], unique),
            ],
            "doc_id long, text string",
        )
        rows = {r.doc_id: r for r in Q.contamination_overlap(docs).collect()}
        assert eval_id not in rows  # eval docs are not reported
        dup = rows[train_ids[0]]
        assert dup.contaminated and dup.n_hits == dup.n_shingles == 5
        clean = rows[train_ids[1]]
        assert not clean.contaminated and clean.n_hits == 0
        assert clean.n_shingles == 5


class TestRepeatedSpans:
    def _docs(self, spark):
        boiler = " ".join(f"b{i}" for i in range(12))  # 12-token block
        uniq = lambda tag: " ".join(f"{tag}{i}" for i in range(20))  # noqa: E731
        return spark.createDataFrame(
            [
                (1, f"{uniq('x')} {boiler}"),
                (2, f"{boiler} {uniq('y')}"),
                (3, uniq("z")),
                (4, "tiny doc"),  # < k tokens -> all-token span
                (5, "tiny doc"),  # exact short-dup pair
            ],
            "doc_id long, text string",
        )

    def test_cross_doc_spans_found(self, spark):
        out = {
            r.span: r.n_docs
            for r in Q.repeated_spans(self._docs(spark), span_tokens=12).collect()
        }
        boiler = " ".join(f"b{i}" for i in range(12))
        assert out[boiler] == 2  # the planted boilerplate block
        assert out["tiny doc"] == 2  # short-doc all-token fallback
        # within-doc-only and unique spans are absent
        assert all(n >= 2 for n in out.values())
        # sliding windows touching the boilerplate boundary are NOT
        # repeated (different neighbors in doc 1 vs doc 2)
        assert len(out) == 2

    def test_coverage_ppm(self, spark):
        rows = {
            r.doc_id: r
            for r in Q.span_dup_coverage(self._docs(spark), span_tokens=12).collect()
        }
        # doc 1: 21 spans (32 tokens), exactly 1 shared (the boiler block)
        assert rows[1].n_spans == 21 and rows[1].shared_spans == 1
        assert rows[1].shared_ppm == (1 * 1_000_000) // 21
        assert rows[3].shared_spans == 0 and rows[3].shared_ppm == 0
        assert rows[4].shared_ppm == 1_000_000  # fully duplicated


class TestStreamCompat:
    def test_quality_filter_runs_in_foreachbatch(self, spark, tmp_path):
        """The curation filter slots into the streaming runtime the
        same way the CDC sinks do — per micro-batch via foreachBatch
        (its per-document aggregation uses count_distinct, which
        streaming aggregation does not support live; per-doc stats
        are a batch-local computation anyway — a document arrives
        whole in one micro-batch)."""
        import json
        import os

        d = tmp_path / "qs_in"
        os.makedirs(d, exist_ok=True)
        good = " ".join(f"w{i}" for i in range(60))
        bad = "spam " * 60  # one token repeated -> top_token filter
        with open(d / "1.jsonl", "w") as f:
            f.write(
                "\n".join(
                    json.dumps({"doc_id": i, "text": t})
                    for i, t in ((1, good), (2, bad))
                )
            )
        stream = (
            spark.readStream.format("json")
            .schema("doc_id long, text string")
            .load(str(d))
        )
        results = []

        def process(batch, batch_id):
            results.extend(Q.quality_filter(batch).collect())

        q = (
            stream.writeStream.foreachBatch(process)
            .option("checkpointLocation", str(tmp_path / "ck_q"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        assert {r.doc_id for r in results if r.keep} == {1}
        assert {r.doc_id: r.fail_reasons for r in results if not r.keep} == {
            2: "top_token,dup_2gram"
        }


class TestMojibake:
    def test_repairs_classic_latin1_misread(self, spark):
        from pyspark.sql import functions as F

        from tidb_cdc_spark.functions.text import fix_mojibake, is_mojibake

        orig = ["caf\u00e9 au lait", "curly\u2019s \u2014 dash", "plain"]
        corrupted = [o.encode("utf-8").decode("iso-8859-1") for o in orig]
        df = spark.createDataFrame([(c,) for c in corrupted], "text string")
        out = df.select(
            fix_mojibake(F.col("text")).alias("fx"),
            is_mojibake(F.col("text")).alias("m"),
        ).collect()
        assert [r.fx for r in out] == orig
        assert [r.m for r in out] == [True, True, False]  # ascii untouched

    def test_legitimate_marker_chars_left_alone(self, spark):
        """Uppercase "S\u00c3O PAULO" contains a marker char but its
        Latin-1 bytes are NOT valid UTF-8 — the guard must refuse."""
        from pyspark.sql import functions as F

        from tidb_cdc_spark.functions.text import fix_mojibake, is_mojibake

        s = "S\u00c3O PAULO"
        df = spark.createDataFrame([(s,)], "text string")
        r = df.select(
            fix_mojibake(F.col("text")).alias("fx"),
            is_mojibake(F.col("text")).alias("m"),
        ).collect()[0]
        assert r.fx == s and not r.m

    def test_ansi_safe_on_clean_rows(self, spark):
        """CaseWhen must evaluate the decode lazily: a frame of clean
        rows (whose Latin-1 bytes are NOT valid UTF-8) must not raise
        MALFORMED_CHARACTER_CODING under ANSI mode."""
        from pyspark.sql import functions as F

        from tidb_cdc_spark.functions.text import fix_mojibake

        df = spark.createDataFrame(
            [("S\u00c3O",), ("caf\u00e9 already fine",)], "text string"
        )
        out = df.select(fix_mojibake(F.col("text")).alias("fx")).collect()
        assert [r.fx for r in out] == ["S\u00c3O", "caf\u00e9 already fine"]

    def test_marker_plus_non_latin1_does_not_crash(self, spark):
        """r7 advice (high): a marker char ("ch\u00e2teau") plus ANY
        non-Latin-1 char (curly quote, em dash, CJK, emoji) used to
        evaluate encode(text,'ISO-8859-1') and fail the whole scan
        with MALFORMED_CHARACTER_CODING under ANSI. Such rows cannot
        be UTF-8-as-Latin-1 mojibake; they must pass through
        untouched."""
        from pyspark.sql import functions as F

        from tidb_cdc_spark.functions.text import fix_mojibake, is_mojibake

        rows = [
            "ch\u00e2teau \u2014 tasting menu",        # marker + em dash
            "ch\u00e2teau\u2019s cellar",              # marker + curly quote
            "\u00c2 plus \u4e2d\u6587 text",           # marker + CJK
            "\u00c3 and emoji \U0001f600",             # marker + emoji
        ]
        df = spark.createDataFrame([(t,) for t in rows], "text string")
        out = df.select(
            fix_mojibake(F.col("text")).alias("fx"),
            is_mojibake(F.col("text")).alias("m"),
        ).collect()
        assert [r.fx for r in out] == rows
        assert [r.m for r in out] == [False] * 4

    def test_mixed_frame_still_repairs_latin1_rows(self, spark):
        """The guard must not stop repair of genuinely corrupted rows
        sharing a frame with non-Latin-1 clean rows."""
        from pyspark.sql import functions as F

        from tidb_cdc_spark.functions.text import fix_mojibake

        orig = "na\u00efve caf\u00e9"
        corrupted = orig.encode("utf-8").decode("iso-8859-1")
        clean = "ch\u00e2teau \u2014 \u4e2d\u6587 \U0001f600"
        df = spark.createDataFrame(
            [(corrupted,), (clean,)], "text string"
        )
        out = df.select(fix_mojibake(F.col("text")).alias("fx")).collect()
        assert [r.fx for r in out] == [orig, clean]


class TestNormalizeText:
    def test_nfc_composes_and_nfkc_folds_compat(self, spark):
        from pyspark.sql import functions as F

        from tidb_cdc_spark.functions.text import normalize_text

        decomposed = "cafe\u0301"        # e + combining acute
        compat = "\ufb01le \u2460"      # fi-ligature, circled one
        df = spark.createDataFrame(
            [(decomposed,), (compat,), (None,)], "text string"
        )
        out = df.select(
            normalize_text(F.col("text"), "NFC").alias("nfc"),
            normalize_text(F.col("text"), "NFKC").alias("nfkc"),
        ).collect()
        assert out[0].nfc == "caf\u00e9"
        assert out[0].nfkc == "caf\u00e9"
        assert out[1].nfc == compat          # NFC keeps compat chars
        assert out[1].nfkc == "file 1"       # NFKC folds them
        assert out[2].nfc is None            # null passes through

    def test_rejects_unknown_form(self, spark):
        import pytest
        from pyspark.sql import functions as F

        from tidb_cdc_spark.functions.text import normalize_text

        with pytest.raises(ValueError, match="unknown normalization"):
            normalize_text(F.col("text"), "NFX")


class TestSpanDedupRewrite:
    def _run(self, spark, rows, k=12):
        from tidb_cdc_spark.functions.quality import span_dedup_rewrite

        df = spark.createDataFrame(rows, "doc_id long, text string")
        return {
            r.doc_id: r
            for r in span_dedup_rewrite(df, span_tokens=k).collect()
        }

    def test_keeper_keeps_others_lose_span(self, spark):
        span = " ".join(f"s{i}" for i in range(12))
        rows = [
            (0, f"alpha {span} omega"),
            (1, f"beta gamma {span} delta"),
            (2, "unrelated words only here"),
        ]
        out = self._run(spark, rows)
        assert out[0].text_clean == rows[0][1]          # keeper intact
        assert out[0].n_removed == 0
        assert out[1].text_clean == "beta gamma delta"  # span excised
        assert out[1].n_removed == 12
        assert out[2].text_clean == rows[2][1]
        assert out[2].n_removed == 0

    def test_exact_duplicate_doc_empties_non_keeper(self, spark):
        text = " ".join(f"w{i}" for i in range(20))
        out = self._run(spark, [(5, text), (9, text)])
        assert out[5].text_clean == text
        assert out[9].text_clean == "" and out[9].n_removed == 20

    def test_short_doc_duplicate_uses_all_token_shingle(self, spark):
        out = self._run(spark, [(1, "tiny dup doc"), (2, "tiny dup doc")])
        assert out[1].text_clean == "tiny dup doc"
        assert out[2].text_clean == "" and out[2].n_removed == 3

    def test_three_way_dup_keeps_exactly_one(self, spark):
        span = " ".join(f"x{i}" for i in range(12))
        out = self._run(spark, [(3, span), (1, span), (2, span)])
        assert out[1].n_removed == 0
        assert out[2].text_clean == "" and out[3].text_clean == ""

    def test_output_whitespace_normalized_and_case_preserved(self, spark):
        out = self._run(spark, [(0, "  Mixed   CASE    tokens  ")])
        assert out[0].text_clean == "Mixed CASE tokens"
        assert out[0].n_tokens == 3 and out[0].n_removed == 0

    def test_overlapping_spans_cover_union(self, spark):
        """13 shared tokens = two overlapping 12-windows; the union
        (all 13) must be removed from the non-keeper."""
        shared = " ".join(f"v{i}" for i in range(13))
        out = self._run(spark, [(0, shared + " tail0"), (1, shared + " zzz")])
        assert out[1].text_clean == "zzz"
        assert out[1].n_removed == 13
