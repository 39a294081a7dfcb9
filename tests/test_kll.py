"""KLL quantile sketch (operators/kll.py): the docstring contracts as
falsifiable tests.

Pure-core properties (no Spark):
- EXACT regime: while n fits the capacity budget, no compaction fires
  and every quantile is exactly the ceil(p·n) order statistic; a merge
  of exact-regime slices is BIT-identical to the single-pass build.
- Compacting regime: observed rank error ≤ the deterministic worst-case
  bound ``kll_rank_bound`` AND ≤ an empirical pin (4·n/k) on an
  adversarially hash-shuffled input, so bound-loosening regressions and
  accuracy regressions both surface.
- Union-merge associativity: (a⊕b)⊕c and a⊕(b⊕c) conserve n exactly
  and agree on every percentile within the combined rank bound
  (bit-exact associativity is impossible for ANY compaction-based
  summary — compaction is lossy — so the contract is the paper's:
  merged sketches keep the error bound regardless of merge tree).
- Weight conservation: sum over levels of 2^ℓ·|buf_ℓ| == n always (odd
  buffers peel a leftover instead of dropping it).

Spark plumbing: distributed build == pure-core build on the collected
values (exact regime), slice-merge via merge_kll matches whole-build,
and repeated runs are byte-identical (order-canonical fold).
"""

import hashlib

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from database_replicator_spark.operators.kll import (
    kll_merge_states,
    kll_new,
    kll_quantile,
    kll_rank_bound,
    kll_update,
)

SETTINGS = dict(
    max_examples=15,
    deadline=None,
    derandomize=True,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)

ints_strategy = st.lists(
    st.integers(min_value=-(10**9), max_value=10**9), min_size=1, max_size=400
)


def _hash_shuffled(n: int) -> list[int]:
    """Deterministic adversarial arrival order (hash-shuffled 0..n-1)."""
    return sorted(
        range(n), key=lambda x: hashlib.md5(str(x).encode()).hexdigest()
    )


def _weight(state: dict) -> int:
    return sum((1 << lvl) * len(buf) for lvl, buf in enumerate(state["levels"]))


def _true_rank_err(state: dict, values_sorted: list[int], p: int) -> int:
    """|rank(estimate) − target rank| using true ranks of the input."""
    import bisect

    n = len(values_sorted)
    target = (p * n + 99) // 100
    est = kll_quantile(state, p)
    # rank of est: number of values <= est
    r = bisect.bisect_right(values_sorted, est)
    return abs(r - target)


class TestExactRegime:
    @settings(**SETTINGS)
    @given(vals=ints_strategy)
    def test_quantiles_are_order_statistics(self, vals):
        st_ = kll_update(kll_new(), vals, k=1024)
        assert len(st_["levels"]) == 1  # nothing compacted
        s = sorted(vals)
        n = len(s)
        for p in (1, 25, 50, 75, 90, 99, 100):
            rank = max(1, min((p * n + 99) // 100, n))
            assert kll_quantile(st_, p) == s[rank - 1]
        assert kll_rank_bound(st_, 1024) == 0

    @settings(**SETTINGS)
    @given(vals=ints_strategy, cut=st.integers(min_value=0, max_value=400))
    def test_merge_bit_identical_to_single_pass(self, vals, cut):
        cut = min(cut, len(vals))
        a = kll_update(kll_new(), vals[:cut], k=1024)
        b = kll_update(kll_new(), vals[cut:], k=1024)
        assert kll_merge_states(a, b, k=1024) == kll_update(
            kll_new(), vals, k=1024
        )


class TestCompactingRegime:
    K = 256
    N = 60_000

    @pytest.fixture(scope="class")
    def built(self):
        vals = _hash_shuffled(self.N)
        st_ = kll_new()
        for i in range(0, len(vals), 4096):
            kll_update(st_, vals[i : i + 4096], self.K)
        return st_, sorted(vals)

    def test_weight_conserved_and_state_bounded(self, built):
        st_, s = built
        assert _weight(st_) == self.N
        kept = sum(len(b) for b in st_["levels"])
        assert kept <= 4 * self.K  # capacity budget, with slack for growth

    def test_rank_error_within_bounds(self, built):
        st_, s = built
        bound = kll_rank_bound(st_, self.K)
        empirical_pin = 4 * self.N // self.K
        worst = max(_true_rank_err(st_, s, p) for p in range(1, 101))
        assert worst <= bound
        assert worst <= empirical_pin, (worst, empirical_pin)

    def test_merge_associativity_keeps_bound_and_n(self, built):
        _, s = built
        vals = _hash_shuffled(self.N)
        third = self.N // 3
        parts = [
            kll_update(kll_new(), vals[:third], self.K),
            kll_update(kll_new(), vals[third : 2 * third], self.K),
            kll_update(kll_new(), vals[2 * third :], self.K),
        ]
        left = kll_merge_states(
            kll_merge_states(parts[0], parts[1], self.K), parts[2], self.K
        )
        right = kll_merge_states(
            parts[0], kll_merge_states(parts[1], parts[2], self.K), self.K
        )
        assert left["n"] == right["n"] == self.N
        assert _weight(left) == _weight(right) == self.N
        bound = max(kll_rank_bound(left, self.K), kll_rank_bound(right, self.K))
        for stt in (left, right):
            worst = max(_true_rank_err(stt, s, p) for p in range(1, 101))
            assert worst <= bound


class TestSparkPlumbing:
    def _df(self, spark):
        rows = [
            ("g%d" % (i % 3), int(v))
            for i, v in enumerate(_hash_shuffled(3000))
        ]
        return spark.createDataFrame(rows, "grp string, v long")

    def test_distributed_build_matches_core_exact(self, spark):
        from database_replicator_spark.operators.kll import (
            kll_quantile_values,
            kll_sketch,
        )

        df = self._df(spark).repartition(8)
        sk = kll_sketch(df, ["grp"], "v", k=4096)
        got = {
            r["grp"]: (r["n"], r["p50"], r["p99"])
            for r in kll_quantile_values(sk, [50, 99]).collect()
        }
        vals = {}
        for r in df.collect():
            vals.setdefault(r["grp"], []).append(r["v"])
        for g, vs in vals.items():
            st_ = kll_update(kll_new(), vs, k=4096)
            assert got[g] == (
                len(vs),
                kll_quantile(st_, 50),
                kll_quantile(st_, 99),
            )

    def test_slice_merge_matches_whole_and_reruns_identical(self, spark):
        from database_replicator_spark.operators.kll import (
            kll_sketch,
            merge_kll,
        )

        df = self._df(spark)
        whole = kll_sketch(df, ["grp"], "v", k=4096)
        lo = kll_sketch(df.filter("v < 1500"), ["grp"], "v", k=4096)
        hi = kll_sketch(df.filter("v >= 1500"), ["grp"], "v", k=4096)
        merged = merge_kll([lo, hi], ["grp"], k=4096)

        def snap(d):
            return sorted(
                (r["grp"], r["kll_n"], tuple(map(tuple, r["kll_levels"])))
                for r in d.collect()
            )

        assert snap(merged) == snap(whole)
        assert snap(kll_sketch(df, ["grp"], "v", k=4096)) == snap(whole)


class TestProfilePercentiles:
    def test_matches_exact_order_statistics(self, spark):
        """Exact-regime contract: melted per-column sketches reproduce
        the ceil-rank order statistic for every numeric column,
        including the fixed-point round trip on 2-dp doubles."""
        from database_replicator_spark.operators.estimation import (
            profile_percentiles,
        )

        rows = [(i, float(i) + 0.25, "s%d" % i) for i in range(200)]
        df = spark.createDataFrame(rows, "a long, b double, s string")
        got = {
            r["column_name"]: r
            for r in profile_percentiles(df, percents=[50, 90, 100]).collect()
        }
        assert set(got) == {"a", "b"}  # string column excluded
        # ranks: ceil(0.5*200)=100 → value 99 (0-based); ceil(0.9*200)=180 → 179
        assert got["a"]["p50"] == 99.0 and got["a"]["p90"] == 179.0
        assert got["a"]["p100"] == 199.0 and got["a"]["n"] == 200
        assert got["b"]["p50"] == 99.25 and got["b"]["p100"] == 199.25

    def test_nulls_excluded_and_no_numeric_raises(self, spark):
        import pytest as _pytest

        from database_replicator_spark.operators.estimation import (
            profile_percentiles,
        )

        df = spark.createDataFrame(
            [(1.0,), (None,), (3.0,)], "x double"
        )
        r = profile_percentiles(df, percents=[100]).first()
        assert r["n"] == 2 and r["p100"] == 3.0
        with _pytest.raises(ValueError, match="no numeric"):
            profile_percentiles(spark.createDataFrame([("a",)], "s string"))


class TestStorableState:
    def test_parquet_round_trip_then_delta_merge(self, spark, tmp_path):
        """The IVM posture the docstrings claim: a sketch written today
        merges tomorrow's delta without rescanning today's rows, and the
        result is bit-identical to a fresh whole-corpus build."""
        from database_replicator_spark.operators.kll import (
            kll_sketch,
            merge_kll,
        )

        rows = [("g%d" % (i % 2), i * 7 % 1000) for i in range(2000)]
        df = spark.createDataFrame(rows, "grp string, v long")
        day1 = df.filter("v % 3 != 0")
        day2 = df.filter("v % 3 = 0")

        path = str(tmp_path / "sketch")
        kll_sketch(day1, ["grp"], "v", k=4096).write.parquet(path)
        stored = spark.read.parquet(path)
        merged = merge_kll(
            [stored, kll_sketch(day2, ["grp"], "v", k=4096)], ["grp"], k=4096
        )
        whole = kll_sketch(df, ["grp"], "v", k=4096)

        def snap(d):
            return sorted(
                (r["grp"], r["kll_n"], tuple(map(tuple, r["kll_levels"])))
                for r in d.collect()
            )

        assert snap(merged) == snap(whole)


class TestFusedGroupQuantiles:
    def test_identical_to_unfused_pair(self, spark):
        from database_replicator_spark.operators.kll import (
            kll_group_quantiles,
            kll_quantile_values,
            kll_sketch,
        )

        rows = [("g%d" % (i % 3), i * 13 % 997) for i in range(3000)]
        df = spark.createDataFrame(rows, "grp string, v long").repartition(8)
        fused = sorted(
            tuple(r)
            for r in kll_group_quantiles(
                df, ["grp"], "v", [50, 90, 99], k=4096
            ).collect()
        )
        unfused = sorted(
            tuple(r)
            for r in kll_quantile_values(
                kll_sketch(df, ["grp"], "v", k=4096), [50, 90, 99]
            ).collect()
        )
        assert fused == unfused


class TestAdversarialOrders:
    """Sorted arrival orders are the classic compaction adversary (every
    promotion carries maximal rank bias in one direction)."""

    K = 256
    N = 40_000

    @pytest.mark.parametrize("direction", ["asc", "desc"])
    def test_sorted_input_stays_within_bounds(self, direction):
        vals = list(range(self.N))
        if direction == "desc":
            vals.reverse()
        st_ = kll_new()
        for i in range(0, self.N, 2048):
            kll_update(st_, vals[i : i + 2048], self.K)
        assert _weight(st_) == self.N
        kept = sum(len(b) for b in st_["levels"])
        assert kept <= 4 * self.K
        s = sorted(vals)
        bound = kll_rank_bound(st_, self.K)
        worst = max(_true_rank_err(st_, s, p) for p in range(1, 101))
        assert worst <= bound
        assert worst <= 6 * self.N // self.K  # looser pin: sorted order
        # IS the bias-maximizing adversary, hash-shuffled gets 4n/k

    def test_many_tiny_sketch_fold(self):
        """The distributed shape taken to its extreme: 500 single-item
        states folded through the canonical merge — n conserved, exact
        regime preserved (nothing ever exceeds capacity)."""
        from database_replicator_spark.operators.kll import _canonical_fold

        states = [kll_update(kll_new(), [v * 7 % 501], 1024) for v in range(500)]
        rows = [{"n": s["n"], "levels": s["levels"]} for s in states]
        merged = _canonical_fold(rows, 1024)
        assert merged["n"] == 500 and len(merged["levels"]) == 1
        whole = kll_update(kll_new(), [v * 7 % 501 for v in range(500)], 1024)
        assert merged == whole


class TestNanSafety:
    def test_numpy_float_batch_with_nan_drops_nulls(self):
        """ADVICE r11: a nullable column reaches the Arrow batch as
        float64-with-NaN; the fast path must DROP NaN, never cast it
        (NaN.astype(int64) is an arbitrary platform value)."""
        import numpy as np

        from database_replicator_spark.operators.kll import (
            kll_new,
            kll_quantile,
            kll_update,
        )

        st = kll_update(
            kll_new(), np.array([5.0, np.nan, 1.0, np.nan, 9.0]), k=200
        )
        assert st["n"] == 3
        assert kll_quantile(st, 0, 100) == 1  # min untouched by NaN
        assert kll_quantile(st, 100, 100) == 9

    def test_kll_sketch_filters_null_values(self, spark):
        from database_replicator_spark.operators.kll import (
            kll_quantile_values,
            kll_sketch,
        )

        df = spark.createDataFrame(
            [("a", 1), ("a", None), ("a", 7)], "g string, v int"
        )
        sk = kll_sketch(df, ["g"], "v", k=200)
        r = kll_quantile_values(sk, [0, 100]).first()
        assert r["n"] == 2 and r["p0"] == 1 and r["p100"] == 7
