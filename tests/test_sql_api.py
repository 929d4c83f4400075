"""SQL-API surface: registered temp views drive spark.sql with the
same scans/pushdown as the DataFrame API."""

from pyspark.sql import functions as F

from tidb_cdc_spark import register_views

SF = "/root/testdata/sf0.001"


class TestSqlApi:
    def test_sql_join_equals_dataframe(self, spark):
        register_views(spark, SF)
        via_sql = spark.sql(
            """
            SELECT n_name, COUNT(*) AS n_cust
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name ORDER BY n_name
            """
        ).collect()
        cust = spark.table("customer")
        nat = spark.table("nation")
        via_df = (
            cust.join(nat, cust.c_nationkey == nat.n_nationkey)
            .groupBy("n_name")
            .agg(F.count(F.lit(1)).alias("n_cust"))
            .orderBy("n_name")
            .collect()
        )
        assert via_sql == via_df and len(via_sql) > 0

    def test_sql_view_timestamps_normalized(self, spark):
        register_views(spark, SF, ["events"])
        # ts must arrive as TIMESTAMP (not NTZ / long) through SQL too
        row = spark.sql(
            "SELECT MIN(unix_micros(ts)) AS m FROM events"
        ).collect()[0]
        assert row.m > 0


class TestPythonUdtf:
    def test_udtf_matches_explode(self, spark):
        """UDTF surface (SURVEY §2.1 UDF/UDAF/UDTF row): a Python
        table function lateral-joined per row equals the codegen
        posexplode path. UDTFs are the SLOW path (row-at-a-time
        Python) — declared for API completeness; hot paths use the
        built-in explode, as everywhere else in the repo."""
        from pyspark.sql.functions import udtf

        @udtf(returnType="token string, pos int")
        class Tokenize:
            def eval(self, text: str):
                for i, t in enumerate(text.split()):
                    yield t, i

        spark.udtf.register("tokenize", Tokenize)
        docs = spark.createDataFrame(
            [(1, "a b c"), (2, "x y")], "doc_id long, text string"
        )
        docs.createOrReplaceTempView("udtf_docs")
        via_udtf = spark.sql(
            "SELECT doc_id, token, pos FROM udtf_docs, "
            "LATERAL tokenize(text) ORDER BY doc_id, pos"
        ).collect()
        via_explode = spark.sql(
            "SELECT doc_id, col AS token, pos FROM udtf_docs "
            "LATERAL VIEW posexplode(split(text, ' ')) t AS pos, col "
            "ORDER BY doc_id, pos"
        ).collect()
        assert [tuple(r) for r in via_udtf] == [tuple(r) for r in via_explode]
