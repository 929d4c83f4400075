"""Every declared query hash-matches its DuckDB oracle at sf0.001
(fast); the full sf0.01 gate is run by the driver and by
``python3 tests/oracle_harness.py /root/testdata/sf0.01``."""

import pytest

from tests.oracle_harness import compare, duck_con

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    return duck_con(SF)


def _all_names():
    from tidb_cdc_spark.queries import ORACLE

    return sorted(ORACLE)


@pytest.mark.parametrize("name", _all_names())
def test_query_matches_oracle(spark, con, name):
    from tidb_cdc_spark.queries import ORACLE, QUERIES

    sdf = QUERIES[name](spark, SF)
    ok, msg = compare(name, sdf, con.sql(ORACLE[name]).df())
    assert ok, msg


def test_every_query_runs(spark):
    """Queries without oracles still execute and have stable schemas."""
    from tidb_cdc_spark.queries import ORACLE, QUERIES

    for name, fn in QUERIES.items():
        if name in ORACLE:
            continue
        df = fn(spark, SF)
        assert df.count() >= 0
        assert df.columns


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
