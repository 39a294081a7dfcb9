"""grouped_running_sum must be value-identical to the naive single-window
plan — the bucketing partitions the sort, it never approximates."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from database_replicator_spark.operators.cumsum import (
    grouped_running_sum,
    naive_running_sum,
)
from database_replicator_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def rows_of(df):
    return sorted(
        (tuple(r) for r in df.collect()), key=lambda t: tuple(map(str, t))
    )


class TestGroupedRunningSum:
    def test_equals_naive_on_fixture_spend(self, spark):
        orders = load_table(spark, SF, "orders")
        customer = load_table(spark, SF, "customer")
        spend = (
            orders.groupBy("o_custkey")
            .agg(
                F.sum(
                    (F.col("o_totalprice").cast("decimal(18,4)") * 10000)
                    .cast("bigint")
                ).alias("units")
            )
            .join(
                customer.select("c_custkey", "c_nationkey"),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            .select("c_nationkey", "o_custkey", "units")
        )
        fast = grouped_running_sum(
            spend, ["c_nationkey"], "units", "o_custkey", mode="distributed"
        ).select("c_nationkey", "o_custkey", "units", "cum")
        slow = naive_running_sum(
            spend, ["c_nationkey"], "units", "o_custkey"
        ).select("c_nationkey", "o_custkey", "units", "cum")
        assert rows_of(fast) == rows_of(slow)

    @pytest.mark.parametrize("buckets", [1, 2, 7, 1000])
    def test_equals_naive_under_ties_and_bucket_counts(self, spark, buckets):
        # heavy ties + zeros + a single-row group + values spanning the
        # bucket boundaries
        rows = [
            ("a", 1, 10), ("a", 2, 10), ("a", 3, 0), ("a", 4, 7),
            ("a", 5, 10), ("a", 6, 3),
            ("b", 1, 0), ("b", 2, 0),
            ("c", 9, 42),
        ]
        df = spark.createDataFrame(rows, "g string, id long, v long")
        fast = grouped_running_sum(df, ["g"], "v", "id", buckets=buckets, mode="distributed")
        slow = naive_running_sum(df, ["g"], "v", "id")
        assert rows_of(fast.select("g", "id", "v", "cum")) == rows_of(
            slow.select("g", "id", "v", "cum")
        )

    def test_running_total_is_monotone_and_ends_at_group_total(self, spark):
        rows = [("g", i, (i * 37) % 11) for i in range(200)]
        df = spark.createDataFrame(rows, "g string, id long, v long")
        got = sorted(
            grouped_running_sum(df, ["g"], "v", "id", mode="distributed").collect(),
            key=lambda r: (-r["v"], r["id"]),
        )
        total = sum(v for _, _, v in rows)
        running = 0
        for r in got:
            running += r["v"]
            assert r["cum"] == running
        assert running == total


class TestPositionalQuantiles:
    def test_matches_python_reference(self, spark):
        import math
        import random

        rng = random.Random(7)
        rows = [
            (g, i, rng.randint(0, 50))
            for g in ("a", "b", "c")
            for i in range(rng.randint(1, 80))
        ]
        df = spark.createDataFrame(rows, "g string, id long, v long")
        from database_replicator_spark.operators.cumsum import (
            positional_quantiles,
        )

        got = {
            r["g"]: r.asDict()
            for r in positional_quantiles(df, ["g"], "v", "id", mode="distributed").collect()
        }
        by_g = {}
        for g, _, v in rows:
            by_g.setdefault(g, []).append(v)
        for g, vs in by_g.items():
            vs.sort()
            n = len(vs)
            assert got[g]["n"] == n
            assert got[g]["p50"] == vs[math.ceil(n / 2) - 1]
            assert got[g]["p90"] == vs[math.ceil(9 * n / 10) - 1]

    def test_ascending_rank_mode_equals_row_number(self, spark):
        from pyspark.sql import Window

        rows = [("g", i, (i * 13) % 7) for i in range(60)]
        df = spark.createDataFrame(rows, "g string, id long, v long")
        ranked = grouped_running_sum(
            df.withColumn("_one", F.lit(1)),
            ["g"],
            value_col="_one",
            id_col="id",
            out_col="rnk",
            order_col="v",
            ascending=True,
            buckets=3,
            mode="distributed",
        )
        w = Window.partitionBy("g").orderBy(F.col("v").asc(), F.col("id").asc())
        naive = df.withColumn("rnk", F.row_number().over(w))
        assert rows_of(ranked.select("g", "id", "v", "rnk")) == rows_of(
            naive.select("g", "id", "v", "rnk")
        )

    def test_negative_values_supported(self, spark):
        rows = [("g", 1, -5), ("g", 2, 0), ("g", 3, 7), ("g", 4, -5)]
        df = spark.createDataFrame(rows, "g string, id long, v long")
        fast = grouped_running_sum(
            df, ["g"], "v", "id", order_col="v", ascending=True, buckets=2,
            mode="distributed",
        )
        slow_w = (
            Window.partitionBy("g")
            .orderBy(F.col("v").asc(), F.col("id").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        from pyspark.sql import Window as W  # noqa: F401

        slow = df.withColumn("cum", F.sum("v").over(slow_w))
        assert rows_of(fast.select("g", "id", "v", "cum")) == rows_of(
            slow.select("g", "id", "v", "cum")
        )


class TestGlobalRunningSum:
    def test_empty_group_cols_global_cumsum(self, spark):
        rows = [("x", i, (i * 31) % 13) for i in range(150)]
        df = spark.createDataFrame(rows, "g string, id long, v long")
        fast = grouped_running_sum(df, [], "v", "id", buckets=5, mode="distributed")
        w = (
            Window.orderBy(F.col("v").desc(), F.col("id").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        slow = df.withColumn("cum", F.sum("v").over(w))
        assert rows_of(fast.select("id", "v", "cum")) == rows_of(
            slow.select("id", "v", "cum")
        )


class TestNtileAndRank:
    @pytest.mark.parametrize("n,k", [(4, 5), (7, 5), (10, 10), (23, 10), (100, 3)])
    def test_ntile_matches_window_ntile(self, spark, n, k):
        from database_replicator_spark.operators.cumsum import (
            grouped_rank,
            ntile_expr,
        )

        rows = [("g", i, (i * 17) % 29) for i in range(n)]
        df = spark.createDataFrame(rows, "g string, id long, v long")
        ranked = grouped_rank(df, ["g"], "v", "id", ascending=False, buckets=4, mode="distributed")
        sizes = df.groupBy("g").agg(F.count(F.lit(1)).alias("n"))
        fast = (
            ranked.join(sizes, on="g")
            .withColumn("t", ntile_expr(F.col("rank"), F.col("n"), k))
            .select("g", "id", "t")
        )
        w = Window.partitionBy("g").orderBy(F.col("v").desc(), F.col("id").asc())
        slow = df.withColumn("t", F.ntile(k).over(w)).select("g", "id", "t")
        assert rows_of(fast) == rows_of(slow)

    def test_rank_family_derivation(self, spark):
        """percent_rank and cume_dist derived from (rank, n) equal the
        window functions under a unique tiebreak ordering."""
        from database_replicator_spark.operators.cumsum import grouped_rank

        rows = [("g", i, (i * 7) % 5) for i in range(40)]
        df = spark.createDataFrame(rows, "g string, id long, v long")
        ranked = grouped_rank(df, ["g"], "v", "id", ascending=False, buckets=3, mode="distributed")
        sizes = df.groupBy("g").agg(F.count(F.lit(1)).alias("n"))
        fast = (
            ranked.join(sizes, on="g")
            .select(
                "id",
                ((F.col("rank") - 1) / (F.col("n") - 1)).alias("pr"),
                (F.col("rank") / F.col("n")).alias("cd"),
            )
        )
        w = Window.partitionBy("g").orderBy(F.col("v").desc(), F.col("id").asc())
        slow = df.select(
            "id",
            F.percent_rank().over(w).alias("pr"),
            F.cume_dist().over(w).alias("cd"),
        )
        # note: with ties percent_rank/cume_dist use PEER groups; the
        # unique (v, id) ordering here makes every row its own peer
        assert rows_of(fast) == rows_of(slow)


class TestAdaptiveMode:
    def test_auto_equals_forced_paths(self, spark):
        rows = [("g", i, (i * 11) % 6) for i in range(100)]
        df = spark.createDataFrame(rows, "g string, id long, v long")
        auto = grouped_running_sum(df, ["g"], "v", "id")  # small -> window
        dist = grouped_running_sum(df, ["g"], "v", "id", mode="distributed")
        single = grouped_running_sum(df, ["g"], "v", "id", mode="single")
        a = rows_of(auto.select("g", "id", "v", "cum"))
        assert a == rows_of(dist.select("g", "id", "v", "cum"))
        assert a == rows_of(single.select("g", "id", "v", "cum"))

    def test_auto_routes_above_threshold(self, spark):
        rows = [("g", i, i % 9) for i in range(50)]
        df = spark.createDataFrame(rows, "g string, id long, v long")
        # tiny threshold forces the distributed plan through auto
        forced = grouped_running_sum(df, ["g"], "v", "id", small_threshold=10)
        single = grouped_running_sum(df, ["g"], "v", "id", mode="single")
        assert rows_of(forced.select("g", "id", "v", "cum")) == rows_of(
            single.select("g", "id", "v", "cum")
        )

    def test_unknown_mode_raises(self, spark):
        df = spark.createDataFrame([("g", 1, 1)], "g string, id long, v long")
        with pytest.raises(ValueError, match="mode"):
            grouped_running_sum(df, ["g"], "v", "id", mode="bogus")
