"""PageRank (Page et al. 1999, "The PageRank Citation Ranking" —
public literature) in EXACT integer µ-units: the iterative-algorithm
archetype next to connected components (functions/clusters.py), with
the same distributed discipline — per-iteration lineage truncation,
ids-only shuffles, no driver-side graph state.

Exactness contract: ranks live in µ-units (PPM = 10⁶ per node at
t=0). One iteration is

    r_{t+1}(v) = (1−d)·PPM + ⌊(Σ_{u→v} ⌊r_t(u) / outdeg(u)⌋) · 17 / 20⌋

with d = 0.85 = 17/20 — every operation integral (floor division),
so Spark and DuckDB agree bit-for-bit and the oracle is the SAME
recurrence unrolled as T chained CTEs (no float tolerance, no
recursive-CTE aggregate restrictions). Floor division leaks a little
mass per step (standard in integer PageRank); the recurrence — not
an idealized real-valued limit — is the contract.

int64 bound: Σr is conserved at ≈ PPM·n, so a single rank never
exceeds ~PPM·n and the ·17 step stays inside int64 for graphs up to
~5·10¹¹ nodes — beyond any published web graph; past that, lift the
multiply to decimal(38,0) in both engines.

Scale shape (100 TB): per iteration ONE join of the edge list
(src-clustered; a real deployment pre-partitions edges by src once
and every iteration reuses that layout) against the node-sized rank
table, one map-side-combining groupBy on dst. Rank tables are
`localCheckpoint`-truncated each round exactly like the
connected-components loop, so T iterations never stack T plans.
Dangling nodes (outdeg 0) simply contribute nothing; nodes with no
in-edges keep the (1−d)·PPM floor via the final left join.

Reference scope note: the reference engine (dollarkillerx/tidb-cdc)
has no graph surface; north-star pipeline operator (e.g. boilerplate
centrality over a near-dup graph, domain authority over a link
graph).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PPM = 1_000_000
#: damping 0.85 as the exact rational 17/20
_D_NUM, _D_DEN = 17, 20


def pagerank(
    edges: DataFrame,
    iters: int = 5,
    src: str = "src",
    dst: str = "dst",
    checkpoint: bool = True,
) -> DataFrame:
    """(node, rank_mu) after ``iters`` exact integer iterations over
    the directed edge list. Nodes are every distinct endpoint; rank
    starts at PPM each.

    Side effect: with ``checkpoint=True`` (default) merely
    CONSTRUCTING the returned DataFrame launches real Spark jobs —
    the loop invariants (edge+degree table, node spine) are
    checkpointed EAGERLY at build time, because they are read in
    every iteration and a lazy plan replayed the build subtree each
    round (measured 9.8 s → 5.0 s at the 10× rehearsal). Plan-only
    callers (explain / plan-dump harnesses) should pass
    ``checkpoint=False`` — the logical plan differs only by the
    lineage cuts."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("_outdeg"))
    # loop-invariant tables materialize ONCE (eager): a lazy plan
    # would replay the edge-build subtree in every iteration's DAG —
    # measured 9.8 s → ~3 s at the 10× rehearsal
    ewd = e.join(deg, "src").select("src", "dst", "_outdeg")
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    from tidb_cdc_spark.functions.clusters import _truncate

    if checkpoint:
        # loop invariants want EAGER materialization (they are read
        # in every iteration), but still prefer a reliable checkpoint
        # when a dir is configured — localCheckpoint blocks die with
        # their executor mid-loop (clusters.py `_truncate` rationale)
        sc = ewd.sparkSession.sparkContext
        reliable = sc._jsc.sc().getCheckpointDir().isDefined()
        ewd = ewd.checkpoint() if reliable else ewd.localCheckpoint()
        nodes = (
            nodes.checkpoint() if reliable else nodes.localCheckpoint()
        )
    ranks = nodes.select(
        "node", F.lit(PPM).cast("long").alias("rank_mu")
    )
    for _ in range(iters):
        contrib = ewd.join(ranks, ewd.src == ranks.node).select(
            "dst",
            F.expr("rank_mu div _outdeg").alias("_c"),
        )
        inbound = contrib.groupBy("dst").agg(
            F.sum("_c").cast("long").alias("_s")
        )
        ranks = (
            nodes.join(inbound, nodes.node == inbound.dst, "left")
            .select(
                "node",
                (
                    F.lit(PPM - PPM * _D_NUM // _D_DEN)
                    + F.expr(
                        f"(coalesce(_s, 0L) * {_D_NUM}L) div {_D_DEN}L"
                    )
                )
                .cast("long")
                .alias("rank_mu"),
            )
        )
        if checkpoint:
            # truncate lineage every round (clusters.py discipline,
            # via its own helper) — T iterations must not stack T
            # nested plans; lazy here because only the final action
            # reads the last round
            ranks = _truncate(ranks)
    return ranks


def pagerank_sql(
    edges_cte: str,
    iters: int = 5,
    select: str = "SELECT node, rank_mu FROM r{T} ORDER BY rank_mu DESC, node",
) -> str:
    """DuckDB oracle: the SAME integer recurrence unrolled as
    ``iters`` chained CTEs. ``edges_cte`` must define ``edges(src,
    dst)``; ``select`` may reference ``r{T}`` (the final rank table
    with columns node, rank_mu)."""
    base = PPM - PPM * _D_NUM // _D_DEN
    parts = [
        edges_cte,
        "deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src)",
        "nodes AS (SELECT DISTINCT node FROM "
        "(SELECT src AS node FROM edges "
        "UNION ALL SELECT dst AS node FROM edges))",
        f"r0 AS (SELECT node, CAST({PPM} AS BIGINT) AS rank_mu FROM nodes)",
    ]
    for t in range(1, iters + 1):
        parts.append(
            f"""s{t} AS (
  SELECT e.dst AS node,
         SUM(r.rank_mu // d.outdeg) AS s
  FROM edges e
  JOIN deg d ON d.src = e.src
  JOIN r{t - 1} r ON r.node = e.src
  GROUP BY e.dst
), r{t} AS (
  SELECT n.node,
         CAST({base} + (COALESCE(s{t}.s, 0) * {_D_NUM}) // {_D_DEN}
              AS BIGINT) AS rank_mu
  FROM nodes n LEFT JOIN s{t} ON s{t}.node = n.node
)"""
        )
    return "WITH " + ",\n".join(parts) + "\n" + select.format(T=iters)
