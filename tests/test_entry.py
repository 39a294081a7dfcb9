"""Smoke tests for the driver contract (__spark_entry__)."""

import __spark_entry__ as entry_mod


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_queries_and_oracles_aligned(spark):
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert q, "no queries declared"
    missing = set(o) - set(q)
    assert not missing, f"oracle without query: {missing}"


def test_each_query_runs_on_sf0001(spark, sf_dir):
    for name, fn in entry_mod.queries().items():
        df = fn(spark, sf_dir)
        assert df.columns, name
        df.limit(1).collect()


class TestBenchProtocol:
    def test_runs_degrade_with_consumed_budget(self):
        import bench

        assert bench.runs_for(0, 420) == 3
        assert bench.runs_for(272, 420) == 3      # under 65%
        assert bench.runs_for(274, 420) == 2      # past 65%
        assert bench.runs_for(377, 420) == 2      # under 90%
        assert bench.runs_for(379, 420) == 1      # past 90%
