"""Physical-plan pinning: the scale-critical properties (broadcasts,
pushdown, shuffle counts, payload pruning) asserted explicitly —
correctness at sf0.01 plus these properties is the 100 TB design
contract."""

from pyspark.sql import functions as F

from tidb_cdc_spark.plans import (
    explain_str,
    has_broadcast_join,
    has_pushed_filters,
    num_exchanges,
)
from tidb_cdc_spark.queries.batch import (
    q1_pricing_summary,
    q3_shipping_priority,
    q5_local_supplier_volume,
    q6_forecast_revenue,
    events_asof_purchase_click,
)

SF = "/root/testdata/sf0.001"


class TestJoinStrategies:
    def test_q3_broadcasts_customer(self, spark):
        assert has_broadcast_join(q3_shipping_priority(spark, SF))

    def test_q5_broadcasts_dims(self, spark):
        plan = explain_str(q5_local_supplier_volume(spark, SF))
        assert plan.count("BroadcastHashJoin") >= 3  # cust/supp/nation/region


class TestPushdown:
    def test_q6_filters_reach_scan(self, spark):
        df = q6_forecast_revenue(spark, SF)
        assert has_pushed_filters(df, "l_shipdate")
        assert has_pushed_filters(df, "l_quantity")

    def test_q1_column_pruning(self, spark):
        plan = explain_str(q1_pricing_summary(spark, SF))
        # lineitem has 11 columns; q1 needs 7 — the scan must not
        # read the join keys it doesn't use
        assert "l_orderkey" not in plan.split("ReadSchema")[1][:400]


class TestShuffleBudget:
    def test_asof_join_single_shuffle(self, spark):
        # union-sort as-of join: exactly ONE hash exchange (the
        # window partition) — the property that beats a range join
        df = events_asof_purchase_click(spark, SF)
        # final orderBy adds a range exchange; count hash exchanges only
        plan = explain_str(df, mode="simple")
        assert plan.count("Exchange hashpartitioning") == 1

    def test_q1_two_exchanges_max(self, spark):
        # partial agg map-side, one shuffle to final agg, one range
        # exchange for the sort
        assert num_exchanges(q1_pricing_summary(spark, SF)) <= 2


class TestMultimodalPruning:
    def test_metadata_query_skips_payload(self, spark, tmp_path):
        from tidb_cdc_spark.functions.multimodal import synthesize_media

        path = str(tmp_path / "media")
        synthesize_media(spark, n=8).write.parquet(path)
        meta_only = spark.read.parquet(path).select("media_id", "kind", "mime")
        plan = explain_str(meta_only)
        read_schema = plan.split("ReadSchema: ")[1].splitlines()[0]
        assert "payload" not in read_schema  # bytes never leave the footer
