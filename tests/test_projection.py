"""JL random projection — pure-Python bit-exact twin, JL distance
preservation, determinism (the oracle mirror in
test_queries_oracle.py covers the DuckDB side)."""

import hashlib
import math
import random

from tidb_cdc_spark.functions.projection import (
    _SCALE,
    jl_signs,
    random_project,
)


def _project_pure(vec, signs):
    q = [math.floor(float(x) * _SCALE) for x in vec]
    return [sum(s * qi for s, qi in zip(row, q)) for row in signs]


def test_matches_pure_python_twin(spark):
    d, k = 16, 4
    rng = random.Random(7)
    rows = [(i, [rng.uniform(-2, 2) for _ in range(d)]) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        r["vec_id"]: [r[f"y_{j}"] for j in range(k)]
        for r in random_project(df, d=d, k=k).collect()
    }
    signs = jl_signs(d, k)
    # the Spark path quantizes the FLOAT32-rounded value; mirror that
    import struct

    def f32(x):
        return struct.unpack("f", struct.pack("f", x))[0]

    for i, vec in rows:
        assert got[i] == _project_pure([f32(x) for x in vec], signs)


def test_signs_deterministic_and_balanced(spark):
    s1, s2 = jl_signs(64, 8), jl_signs(64, 8)
    assert s1 == s2
    assert all(v in (1, -1) for row in s1 for v in row)
    # md5 bits are fair: no row should be wildly unbalanced
    for row in s1:
        assert abs(sum(row)) <= 32


def test_jl_distance_preservation(spark):
    """The point of the lemma: rescaled projected distances
    approximate original distances. k=32 on 64-d unit-ish vectors →
    loose (±60%) bound on every pair of a small sample, tight on
    the median."""
    d, k = 64, 32
    rng = random.Random(11)
    rows = [
        (i, [rng.gauss(0, 1) for _ in range(d)]) for i in range(12)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        r["vec_id"]: [r[f"y_{j}"] for j in range(k)]
        for r in random_project(df, d=d, k=k).collect()
    }
    ratios = []
    for a in range(len(rows)):
        for b in range(a + 1, len(rows)):
            orig = math.dist(rows[a][1], rows[b][1])
            proj = math.dist(got[a], got[b]) / (_SCALE * math.sqrt(k))
            ratios.append(proj / orig)
    assert all(0.4 < r < 1.6 for r in ratios), ratios
    ratios.sort()
    med = ratios[len(ratios) // 2]
    assert 0.8 < med < 1.25, med
