"""Mergeable-sketch tests: KMV distinct estimation + Bernoulli sample."""

from __future__ import annotations

from pyspark.sql import functions as F

from database_replicator_spark.operators.sketch import (
    bernoulli_sample,
    kmv_estimate,
    kmv_sketch,
    merge_kmv,
)


def _arrs(df):
    return {tuple(r[:-1]): list(r["kmv"]) for r in df.collect()}


def test_kmv_exact_below_k(spark):
    df = spark.createDataFrame([("g", f"v{i % 17}") for i in range(200)], ["g", "v"])
    sk = kmv_sketch(df, ["g"], "v", k=64)
    est = kmv_estimate(sk, k=64).collect()[0]
    assert est["distinct_est"] == 17.0  # fewer than k distincts → exact


def test_kmv_estimate_within_error_bound(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    k = 256
    sk = kmv_sketch(li, ["l_returnflag"], "l_partkey", k=k)
    est = {r["l_returnflag"]: r["distinct_est"] for r in kmv_estimate(sk, k=k).collect()}
    exact = {
        r["l_returnflag"]: r["d"]
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("d"))
        .collect()
    }
    for flag, d in exact.items():
        if d < k:
            assert est[flag] == float(d)
        else:
            # KMV relative error ~1/sqrt(k) ≈ 6%; allow 4 sigma
            assert abs(est[flag] - d) / d < 0.25, (flag, est[flag], d)


def test_kmv_merge_is_exact(spark, sf_dir):
    """Hash-determinism makes the merge property an EQUALITY: the sketch of
    the union is bit-identical to the merge of slice sketches."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    k = 128
    whole = kmv_sketch(li, ["l_returnflag"], "l_partkey", k=k)
    parts = [
        kmv_sketch(li.filter(F.col("l_orderkey") % 3 == i), ["l_returnflag"], "l_partkey", k=k)
        for i in range(3)
    ]
    merged = merge_kmv(parts, ["l_returnflag"], k=k)
    assert _arrs(whole) == _arrs(merged)


def test_kmv_merge_idempotent_on_duplicates(spark):
    df = spark.createDataFrame([("g", f"v{i}") for i in range(50)], ["g", "v"])
    sk = kmv_sketch(df, ["g"], "v", k=32)
    twice = merge_kmv([sk, sk], ["g"], k=32)  # replaying a slice changes nothing
    assert _arrs(sk) == _arrs(twice)


def test_bernoulli_sample_deterministic_and_mergeable(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    s1 = bernoulli_sample(orders, "o_orderkey", rate=0.2)
    s2 = bernoulli_sample(orders, "o_orderkey", rate=0.2)
    ids = lambda df: sorted(r["o_orderkey"] for r in df.select("o_orderkey").collect())
    assert ids(s1) == ids(s2)  # no RNG state

    lo = bernoulli_sample(orders.filter("o_orderkey <= 700"), "o_orderkey", 0.2)
    hi = bernoulli_sample(orders.filter("o_orderkey > 700"), "o_orderkey", 0.2)
    assert ids(s1) == sorted(ids(lo) + ids(hi))  # slice-independent

    n = orders.count()
    got = len(ids(s1))
    assert abs(got - 0.2 * n) < 4 * (0.2 * n) ** 0.5 + 10


def test_bernoulli_sample_quantile_close(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    s = bernoulli_sample(orders, "o_orderkey", rate=0.5)
    exact = orders.agg(F.expr("percentile(o_totalprice, 0.5)")).collect()[0][0]
    approx = s.agg(F.expr("percentile(o_totalprice, 0.5)")).collect()[0][0]
    spread = orders.agg(
        F.expr("percentile(o_totalprice, 0.9) - percentile(o_totalprice, 0.1)")
    ).collect()[0][0]
    assert abs(approx - exact) < 0.2 * spread


class TestHyperLogLog:
    """Native HLL (r13): deterministic registers, exact MAX-merge
    identity, accuracy within the published error envelope."""

    def _regs(self, spark, rows, b=8):
        from database_replicator_spark.operators.sketch import hll_registers

        df = spark.createDataFrame(rows, "g string, v long")
        return hll_registers(df, ["g"], "v", b=b)

    def test_merge_identity_is_exact(self, spark):
        """sketch(A ∪ B) == merge(sketch(A), sketch(B)) — bit-identical
        rows, the house sketch rule (MAX-merge is idempotent too)."""
        from database_replicator_spark.operators.sketch import (
            hll_merge,
            hll_registers,
        )

        rows_a = [("g1", i) for i in range(0, 400)]
        rows_b = [("g1", i) for i in range(300, 700)]  # overlap 300-399
        both = self._regs(spark, rows_a + rows_b)
        merged = hll_merge(
            [self._regs(spark, rows_a), self._regs(spark, rows_b)], ["g"]
        )
        key = lambda r: (r["g"], r["bucket"], r["rho"])
        assert sorted(map(key, both.collect())) == sorted(
            map(key, merged.collect())
        )
        # idempotent: merging a shipment twice changes nothing
        twice = hll_merge([merged, self._regs(spark, rows_b)], ["g"])
        assert sorted(map(key, twice.collect())) == sorted(
            map(key, merged.collect())
        )

    def test_estimate_within_error_envelope(self, spark):
        from database_replicator_spark.operators.sketch import hll_estimate

        n = 5000
        regs = self._regs(spark, [("g1", i * 7 + 1) for i in range(n)])
        (row,) = hll_estimate(regs, ["g"], b=8).collect()
        # 1.04/sqrt(256) ≈ 6.5% std error; allow 4 sigma
        assert abs(row["hll_estimate"] - n) / n < 0.26

    def test_small_range_linear_counting(self, spark):
        from database_replicator_spark.operators.sketch import hll_estimate

        n = 40  # far below 2.5m — the ln(m/V) branch
        regs = self._regs(spark, [("g1", i) for i in range(n)])
        (row,) = hll_estimate(regs, ["g"], b=8).collect()
        assert row["empty_buckets"] > 0
        # linear counting is near-exact at this occupancy
        assert abs(row["hll_estimate"] - n) / n < 0.1

    def test_groups_are_independent(self, spark):
        from database_replicator_spark.operators.sketch import hll_estimate

        rows = [("a", i) for i in range(100)] + [("b", i) for i in range(2000)]
        est = {
            r["g"]: r["hll_estimate"]
            for r in hll_estimate(self._regs(spark, rows), ["g"], b=8).collect()
        }
        assert abs(est["a"] - 100) / 100 < 0.15
        assert abs(est["b"] - 2000) / 2000 < 0.26
