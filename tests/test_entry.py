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
        # reactive BACKSTOP only (r11): the upfront rotation plan fits
        # PLAN_FRACTION·budget, so these thresholds fire only on a badly
        # loaded box — 85% and 95%, not the old 65/90 that re-degraded
        # the same slow tail every round
        import bench

        assert bench.runs_for(0, 420) == 3
        assert bench.runs_for(355, 420) == 3      # under 85%
        assert bench.runs_for(358, 420) == 2      # past 85%
        assert bench.runs_for(397, 420) == 2      # under 95%
        assert bench.runs_for(400, 420) == 1      # past 95%

    def test_plan_rotation_advances_and_covers(self):
        """The deterministic two-tier rotation: slices move with the
        round, every slow gate gets a full-protocol round eventually,
        unknown-baseline gates always take the full protocol."""
        import bench

        names = [f"g{i}" for i in range(20)] + ["brand_new"]
        base = {f"g{i}": 3.0 for i in range(20)}  # all slow, one unknown
        orig = bench.current_round
        try:
            cover = set()
            for r in range(11, 31):
                bench.current_round = lambda r=r: r
                plan, rotation = bench.plan_runs(names, base, 100.0)
                assert plan["brand_new"] == 3  # unknown: never demoted
                full = {n for n in names if plan[n] == 3 and n in base}
                assert full  # some slow gate is fully measured each round
                cover |= full
            assert cover == set(base)  # every slow gate eventually full
        finally:
            bench.current_round = orig
