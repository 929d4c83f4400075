"""Stupid-backoff trigram LM scoring (functions/lm.py::
stupid_backoff_score): pure-Python twin equality on random corpora,
and per-branch fixtures proving each backoff level actually fires
and scores what the formula says."""

import random

import pytest


def _fl(c: int) -> int:
    return len(bin(c)) - 2  # length of binary digits == floor_log2+1


def _twin(train_texts, score_docs):
    """Pure-Python stupid backoff — same whole-bit formula."""
    c1, c2, c3 = {}, {}, {}
    for t in train_texts:
        toks = [w for w in t.lower().split() if w]
        for w in toks:
            c1[w] = c1.get(w, 0) + 1
        for a, b in zip(toks, toks[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
        for a, b, c in zip(toks, toks[1:], toks[2:]):
            c3[(a, b, c)] = c3.get((a, b, c), 0) + 1
    n = sum(c1.values())
    out = {}
    for doc_id, t in score_docs:
        toks = [w for w in t.lower().split() if w]
        if len(toks) < 3:
            continue
        sbits = 0
        cnt = 0
        for a, b, c in zip(toks, toks[1:], toks[2:]):
            cnt += 1
            if (a, b, c) in c3:
                bits = _fl(c2[(a, b)]) - _fl(c3[(a, b, c)])
            elif (b, c) in c2:
                bits = 2 + _fl(c1[b]) - _fl(c2[(b, c)])
            elif c in c1:
                bits = 4 + _fl(n) - _fl(c1[c])
            else:
                bits = 4 + _fl(n) - _fl(1)  # c=1 pseudo-count
            sbits += bits
        out[doc_id] = (cnt, sbits, sbits * 1_000_000 // cnt)
    return out


def _score(spark, train_texts, score_docs):
    from tidb_cdc_spark.functions.lm import stupid_backoff_score

    train = spark.createDataFrame(
        [(i, t) for i, t in enumerate(train_texts)], "doc_id long, text string"
    )
    score = spark.createDataFrame(list(score_docs), "doc_id long, text string")
    return {
        r.doc_id: (r.n_trigrams, r.sum_bits, r.mean_mbits)
        for r in stupid_backoff_score(train, score).collect()
    }


def test_matches_pure_python_twin_on_random_corpora(spark):
    rng = random.Random(23)
    vocab = [f"w{i}" for i in range(40)]
    train = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 60)))
        for _ in range(30)
    ]
    score = [
        (100 + i, " ".join(rng.choice(vocab + ["zzz"]) for _ in range(rng.randint(1, 50))))
        for i in range(20)
    ]
    assert _score(spark, train, score) == _twin(train, score)


def test_each_backoff_branch_fires_with_documented_bits(spark):
    # train: "a b c" x4 and "b d" x2 and "e" x1 → N = 17
    train = ["a b c"] * 4 + ["b d"] * 2 + ["e"]
    n = sum(len(t.split()) for t in train)
    assert n == 17  # the expected-bits comments below assume fl(17)=5 digits
    cases = {
        # trigram hit: c3(a,b,c)=4, c2(a,b)=4 → fl(4)-fl(4)=0
        10: ("a b c", 0),
        # bigram backoff: (x,b,d) unseen, c2(b,d)=2, c1(b)=6
        # → 2 + fl(6) - fl(2) = 2 + 2 - 1 = 3
        11: ("x b d", 3),
        # unigram backoff: (x,y,e) unseen, (y,e) unseen, c1(e)=1
        # → 4 + fl(17) - fl(1) = 4 + 4 - 0 = 8
        12: ("x y e", 8),
        # OOV: zzz unseen → 4 + fl(17) = 8... fl(17)=4 → 8
        13: ("x y zzz", 8),
    }
    got = _score(spark, train, [(k, v[0]) for k, v in cases.items()])
    for k, (_txt, bits) in cases.items():
        assert got[k] == (1, bits, bits * 1_000_000), (k, got[k])
    assert got == _twin(train, [(k, v[0]) for k, v in cases.items()])


def test_short_docs_drop_and_no_plan_python(spark):
    from tidb_cdc_spark.functions.lm import stupid_backoff_score

    train = spark.createDataFrame([(0, "a b c d")], "doc_id long, text string")
    score = spark.createDataFrame(
        [(1, "a b"), (2, ""), (3, "a b c")], "doc_id long, text string"
    )
    df = stupid_backoff_score(train, score)
    assert [r.doc_id for r in df.collect()] == [3]
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "CartesianProduct" not in plan
