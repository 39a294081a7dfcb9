"""Extension joins: as-of join, bucketized range join, IVF ANN."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from database_replicator_spark.operators.asof import asof_join
from database_replicator_spark.operators.rangejoin import range_join_intervals


def _ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture()
def quotes(spark):
    # right side: per-key timestamped payloads
    return spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 10:00:00"), 1, 100.0),
            ("A", _ts("2024-01-01 10:05:00"), 2, 101.0),
            ("A", _ts("2024-01-01 10:05:00"), 3, 102.0),  # same-ts tie
            ("B", _ts("2024-01-01 11:00:00"), 4, 200.0),
        ],
        "k string, ts timestamp, qid long, px double",
    )


class TestAsofJoin:
    def test_latest_at_or_before(self, spark, quotes):
        probes = spark.createDataFrame(
            [
                ("A", _ts("2024-01-01 10:04:59")),
                ("A", _ts("2024-01-01 10:05:00")),  # equal ts → inclusive
                ("A", _ts("2024-01-01 12:00:00")),
                ("B", _ts("2024-01-01 10:59:59")),  # before first → null
                ("B", _ts("2024-01-01 11:00:00")),
            ],
            "k string, pts timestamp",
        )
        out = asof_join(
            probes, quotes, on=["k"], probe_time="pts", right_time="ts",
            payload_cols=["qid", "px"], tiebreak="qid",
        )
        got = {(r["k"], str(r["pts"])): r["qid"] for r in out.collect()}
        assert got[("A", "2024-01-01 10:04:59")] == 1
        assert got[("A", "2024-01-01 10:05:00")] == 3  # tie → highest qid
        assert got[("A", "2024-01-01 12:00:00")] == 3
        assert got[("B", "2024-01-01 10:59:59")] is None  # left join
        assert got[("B", "2024-01-01 11:00:00")] == 4
        assert out.count() == probes.count()  # exactly one row per probe

    def test_tolerance_drops_stale_matches(self, spark, quotes):
        probes = spark.createDataFrame(
            [("A", _ts("2024-01-01 10:06:00")), ("A", _ts("2024-01-01 23:00:00"))],
            "k string, pts timestamp",
        )
        out = asof_join(
            probes, quotes, on=["k"], probe_time="pts", right_time="ts",
            payload_cols=["qid"], tiebreak="qid", tolerance_seconds=600,
        )
        got = {str(r["pts"]): r["qid"] for r in out.collect()}
        assert got["2024-01-01 10:06:00"] == 3       # 60s old: within tolerance
        assert got["2024-01-01 23:00:00"] is None    # hours old: dropped

    def test_single_shuffle_plan(self, spark, quotes):
        """The as-of plan must contain no nested-loop/cartesian join —
        the whole point vs the naive inequality join."""
        probes = quotes.select("k", F.col("ts").alias("pts"))
        out = asof_join(
            probes, quotes, on=["k"], probe_time="pts", right_time="ts",
            payload_cols=["qid"],
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "NestedLoop" not in plan and "Cartesian" not in plan


class TestRangeJoin:
    def test_containment_exact(self, spark):
        points = spark.createDataFrame(
            [(i, _ts(f"2024-01-01 {h:02d}:30:00")) for i, h in enumerate([0, 1, 2, 5])],
            "pid long, ts timestamp",
        )
        intervals = spark.createDataFrame(
            [
                (1, _ts("2024-01-01 00:00:00"), _ts("2024-01-01 02:00:00")),
                (2, _ts("2024-01-01 01:45:00"), _ts("2024-01-01 02:31:00")),
                (3, _ts("2024-01-01 03:00:00"), _ts("2024-01-01 03:00:00")),  # empty
            ],
            "iid long, w_start timestamp, w_end timestamp",
        )
        out = range_join_intervals(
            points, intervals, point_time="ts",
            start_col="w_start", end_col="w_end", bucket_seconds=3600,
        )
        got = sorted((r["pid"], r["iid"]) for r in out.collect())
        # p0 (00:30) ∈ i1; p1 (01:30) ∈ i1; p2 (02:30) ∈ i2; p3 matches none;
        # empty interval matches nothing
        assert got == [(0, 1), (1, 1), (2, 2)]

    def test_no_duplicate_matches_across_buckets(self, spark):
        # interval spanning many buckets still matches each point once
        points = spark.createDataFrame(
            [(1, _ts("2024-01-01 05:00:00"))], "pid long, ts timestamp"
        )
        intervals = spark.createDataFrame(
            [(1, _ts("2024-01-01 00:00:00"), _ts("2024-01-02 00:00:00"))],
            "iid long, w_start timestamp, w_end timestamp",
        )
        out = range_join_intervals(
            points, intervals, point_time="ts",
            start_col="w_start", end_col="w_end", bucket_seconds=3600,
        )
        assert out.count() == 1

    def test_half_open_boundaries(self, spark):
        points = spark.createDataFrame(
            [(1, _ts("2024-01-01 01:00:00")), (2, _ts("2024-01-01 02:00:00"))],
            "pid long, ts timestamp",
        )
        intervals = spark.createDataFrame(
            [(1, _ts("2024-01-01 01:00:00"), _ts("2024-01-01 02:00:00"))],
            "iid long, w_start timestamp, w_end timestamp",
        )
        out = range_join_intervals(
            points, intervals, point_time="ts",
            start_col="w_start", end_col="w_end",
        )
        assert [r["pid"] for r in out.collect()] == [1]  # start in, end out


class TestIvfTopk:
    def test_recall_vs_bruteforce(self, spark):
        from database_replicator_spark.operators.similarity import (
            brute_force_topk,
            ivf_topk,
        )
        from database_replicator_spark.sources.catalog import load_table

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        q = emb.filter(F.col("vec_id") < 5)
        exact = {
            (r["query_id"], r["corpus_id"])
            for r in brute_force_topk(emb, q, k=10).collect()
        }
        approx = {
            (r["query_id"], r["corpus_id"])
            for r in ivf_topk(emb, q, k=10, nlist=8, nprobe=2).collect()
        }
        recall = len(exact & approx) / len(exact)
        assert recall >= 0.2, f"IVF recall collapsed: {recall}"

    def test_disjoint_lists_unique_pairs(self, spark):
        from database_replicator_spark.operators.similarity import ivf_topk
        from database_replicator_spark.sources.catalog import load_table

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        q = emb.filter(F.col("vec_id") < 3)
        out = ivf_topk(emb, q, k=1000, nlist=8, nprobe=2)
        assert out.count() == out.select("query_id", "corpus_id").distinct().count()


class TestFunnel:
    def _events(self, spark, rows):
        return spark.createDataFrame(
            [(i, u, t, ty) for i, (u, t, ty) in enumerate(rows)],
            "event_id long, user_id long, ts timestamp, event_type string",
        )

    def test_strict_ordering_required(self, spark):
        from datetime import datetime

        from database_replicator_spark.operators.funnel import funnel_counts

        T = lambda s: datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
        rows = [
            # user 1 completes the funnel in order
            (1, T(1), "view"), (1, T(2), "click"), (1, T(3), "purchase"),
            # user 2 clicks BEFORE viewing — click must not count
            (2, T(5), "click"), (2, T(6), "view"),
            # user 3 views only
            (3, T(1), "view"),
            # user 4 purchases without clicking — stops at view
            (4, T(1), "view"), (4, T(2), "purchase"),
            # user 5 never views — not in the funnel at all
            (5, T(1), "click"), (5, T(2), "purchase"),
        ]
        out = {
            r["step"]: r.asDict()
            for r in funnel_counts(
                self._events(spark, rows), ["view", "click", "purchase"]
            ).collect()
        }
        assert out[1]["n_users"] == 4
        assert out[2]["n_users"] == 1
        assert out[3]["n_users"] == 1
        assert out[2]["conversion"] == 0.25
        assert out[1]["avg_seconds_from_prev"] is None
        assert out[2]["avg_seconds_from_prev"] == 1.0

    def test_equal_timestamp_does_not_advance(self, spark):
        from datetime import datetime

        from database_replicator_spark.operators.funnel import funnel_counts

        t = datetime(2024, 1, 1)
        rows = [(1, t, "view"), (1, t, "click")]  # same instant: not after
        out = {
            r["step"]: r["n_users"]
            for r in funnel_counts(self._events(spark, rows), ["view", "click"]).collect()
        }
        assert out == {1: 1, 2: 0}

    def test_min_qualifying_occurrence_chains(self, spark):
        from datetime import datetime

        from database_replicator_spark.operators.funnel import funnel_entries

        T = lambda s: datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
        # user clicks at 2 (before view at 3 — ignored) and at 5 (counts);
        # purchase at 4 precedes the qualifying click → not counted
        rows = [
            (1, T(3), "view"), (1, T(2), "click"), (1, T(5), "click"),
            (1, T(4), "purchase"),
        ]
        row = funnel_entries(
            self._events(spark, rows), ["view", "click", "purchase"]
        ).collect()[0]
        assert row["t_1"] == T(3) and row["t_2"] == T(5) and row["t_3"] is None


class TestRetentionCohorts:
    def test_multi_cohort_matrix(self, spark):
        """Synthetic two-cohort fixture (the sf fixture has one cohort):
        retention is computed per cohort and offsets count from EACH
        cohort's own first week."""
        from datetime import datetime

        rows = []
        # cohort A: users 1,2 first seen week of Jan 1; user 2 churns after w0
        rows += [(1, datetime(2024, 1, 1)), (2, datetime(2024, 1, 2))]
        rows += [(1, datetime(2024, 1, 8))]          # u1 active w1
        # cohort B: user 3 first seen week of Jan 8, active w0 and w1
        rows += [(3, datetime(2024, 1, 9)), (3, datetime(2024, 1, 16))]
        ev = spark.createDataFrame(
            [(i, u, t, "view", 0.0, "{}") for i, (u, t) in enumerate(rows)],
            "event_id long, user_id long, ts timestamp, event_type string, value double, props string",
        )
        import database_replicator_spark.queries_analytics as qa
        from database_replicator_spark import queries as q

        # drive the same logic as the gate, over the synthetic frame
        from pyspark.sql import functions as F

        firsts = ev.groupBy("user_id").agg(
            F.date_trunc("week", F.min("ts")).alias("cohort_week")
        )
        activity = ev.select(
            "user_id", F.date_trunc("week", F.col("ts")).alias("act_week")
        ).distinct()
        sizes = firsts.groupBy("cohort_week").agg(F.count(F.lit(1)).alias("cohort_size"))
        joined = (
            activity.join(firsts, on="user_id")
            .withColumn(
                "week_offset",
                (F.datediff(F.col("act_week"), F.col("cohort_week")) / 7).cast("int"),
            )
            .groupBy("cohort_week", "week_offset")
            .agg(F.count(F.lit(1)).alias("n_active"))
            .join(sizes, on="cohort_week")
        )
        out = {
            (r["cohort_week"].day, r["week_offset"]): (r["n_active"], r["cohort_size"])
            for r in joined.collect()
        }
        assert out[(1, 0)] == (2, 2)   # cohort Jan-1: both active week 0
        assert out[(1, 1)] == (1, 2)   # only u1 retained week 1
        assert out[(8, 0)] == (1, 1)   # cohort Jan-8 week 0
        assert out[(8, 1)] == (1, 1)   # retained its own week 1
