"""r14 optimization-round guards: the two operator-internal changes
(connected-components fused first round; multimodal synth fan-out)
must not change results, only plans/latency.

- ``connected_components`` r14 change: the identity initialization +
  first propagation are fused (label₀ = min(id, min neighbor), one
  aggregate, no join) and the loop starts from there. These tests pin
  label EQUALITY against a driver-side union-find on adversarial
  topologies (long chain — worst case for min-propagation; star;
  multiple components; duplicate/self edges).
- ``multimodal._spread`` r14 change: every ``synth_*`` fans its
  id-sized input out (keyless round-robin) before the Python chain,
  so a single-split source no longer serializes the decode on one
  core. Pinned by a partition-count probe on the synth output.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _uf_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Driver-side union-find ground truth: node -> component min."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        for v in (a, b):
            parent.setdefault(v, v)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in parent}


class TestCcFusedInit:
    @pytest.mark.parametrize(
        "name,edges",
        [
            # chain: diameter n-1 — the topology the pointer jump and
            # the fused first round must not miscount on
            ("chain", [(i, i + 1) for i in range(40)]),
            ("star", [(0, i) for i in range(1, 30)]),
            (
                "two_components_plus_selfloop",
                [(1, 2), (2, 3), (10, 11), (11, 12), (5, 5)],
            ),
            (
                "dup_edges_reversed",
                [(7, 3), (3, 7), (7, 3), (9, 3), (20, 21)],
            ),
        ],
    )
    def test_labels_equal_union_find(self, spark, name, edges):
        from tidb_cdc_spark.functions.clusters import connected_components

        df = spark.createDataFrame(edges, "id_a long, id_b long")
        got = {
            r["id"]: r["cluster_id"]
            for r in connected_components(df).collect()
        }
        assert got == _uf_components(edges), name

    def test_single_edge_converges_in_one_round(self, spark):
        """The fused init IS the fixpoint for a single pair — the
        loop's first round must detect 0 changes and return."""
        from tidb_cdc_spark.functions import clusters as C

        df = spark.createDataFrame([(5, 9)], "id_a long, id_b long")
        out = C.connected_components(df)
        assert {(r["id"], r["cluster_id"]) for r in out.collect()} == {
            (5, 5),
            (9, 5),
        }
        assert C.LAST_ROUNDS == 1


class TestSynthFanOut:
    def test_synth_output_is_spread(self, spark):
        """A 1-split id source must NOT serialize the synth pass on
        one task: the synth output's rows span multiple partitions
        (bounded by the session's parallelism)."""
        from tidb_cdc_spark.functions.multimodal import (
            synth_container_media,
        )

        ids = spark.range(0, 2000, 1, 1).select(
            F.col("id").alias("media_id")
        )
        media = synth_container_media(ids, "media_id")
        nparts = (
            media.select(F.spark_partition_id().alias("p"))
            .distinct()
            .count()
        )
        expect = min(4, spark.sparkContext.defaultParallelism)
        assert nparts >= expect, f"synth ran on {nparts} partition(s)"

    def test_spread_preserves_rows(self, spark):
        from tidb_cdc_spark.functions.multimodal import _spread

        slim = spark.range(0, 500, 1, 1).select(
            F.col("id").alias("media_id")
        )
        out = _spread(slim)
        assert sorted(r["media_id"] for r in out.collect()) == list(
            range(500)
        )
