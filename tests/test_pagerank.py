"""Integer PageRank — pure-Python bit-exact twin plus structural
properties (the oracle mirror in test_queries_oracle.py covers the
unrolled DuckDB recurrence)."""

from pyspark.sql import functions as F

from tidb_cdc_spark.functions.pagerank import PPM, pagerank


def _pagerank_pure(edges, iters=5):
    """Same integer recurrence, dict-based."""
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    nodes = {n for e in edges for n in e}
    r = dict.fromkeys(nodes, PPM)
    base = PPM - PPM * 17 // 20
    for _ in range(iters):
        s = dict.fromkeys(nodes, 0)
        for u, v in edges:
            s[v] += r[u] // outdeg[u]
        r = {n: base + (s[n] * 17) // 20 for n in nodes}
    return r


def _mk(spark, edges):
    return spark.createDataFrame(edges, "src string, dst string")


def test_matches_pure_python_twin(spark):
    edges = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
        ("d", "c"), ("d", "a"), ("b", "d"),
    ]
    got = {
        r["node"]: r["rank_mu"]
        for r in pagerank(_mk(spark, edges), iters=5).collect()
    }
    assert got == _pagerank_pure(edges, iters=5)


def test_star_center_outranks_leaves(spark):
    leaves = [f"l{i}" for i in range(10)]
    edges = [(l, "hub") for l in leaves] + [("hub", l) for l in leaves]
    got = {
        r["node"]: r["rank_mu"]
        for r in pagerank(_mk(spark, edges), iters=5).collect()
    }
    assert all(got["hub"] > got[l] for l in leaves)
    # symmetric leaves tie exactly (deterministic integer math)
    assert len({got[l] for l in leaves}) == 1


def test_dangling_and_sourceless_nodes(spark):
    """'sink' has no out-edges (contributes nothing), 'src' has no
    in-edges (floor rank only) — both must stay in the output."""
    edges = [("src", "mid"), ("mid", "sink")]
    got = {
        r["node"]: r["rank_mu"]
        for r in pagerank(_mk(spark, edges), iters=3).collect()
    }
    base = PPM - PPM * 17 // 20
    assert got["src"] == base  # nothing points at it
    assert set(got) == {"src", "mid", "sink"}
    assert got["sink"] > base  # receives mid's mass


def test_iteration_zero_is_uniform(spark):
    got = pagerank(_mk(spark, [("a", "b")]), iters=0).collect()
    assert {r["rank_mu"] for r in got} == {PPM}


def test_parallel_edges_weight_contribution(spark):
    """A doubled edge doubles both outdeg and the number of
    contributions — the recurrence treats the edge LIST as-is
    (callers dedup if they want simple-graph semantics)."""
    edges = [("a", "b"), ("a", "b"), ("c", "b")]
    got = {
        r["node"]: r["rank_mu"]
        for r in pagerank(_mk(spark, edges), iters=1).collect()
    }
    assert got == _pagerank_pure(edges, iters=1)
