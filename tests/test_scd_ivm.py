"""SCD Type-2 history and incremental-view-maintenance operator tests."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from database_replicator_spark.operators.ivm import (
    finalize,
    merge_partials,
    partial_agg,
)
from database_replicator_spark.operators.scd import (
    scd2_from_changes,
    scd2_merge_batch,
)


def _t(s: str) -> datetime:
    return datetime.fromisoformat(s)


def _changes(spark, rows):
    return spark.createDataFrame(rows, ["k", "attr", "ts"])


def _hist_rows(df):
    return sorted(
        (
            (r["k"], r["attr"], r["valid_from"], r["valid_to"], r["version"], r["is_current"])
            for r in df.collect()
        )
    )


BASE = [
    (1, "a", _t("2024-01-01T00:00:00")),
    (1, "a", _t("2024-01-02T00:00:00")),  # duplicate state — collapses
    (1, "b", _t("2024-01-03T00:00:00")),
    (2, "x", _t("2024-01-01T12:00:00")),
]


def test_scd2_collapses_and_intervals(spark):
    hist = scd2_from_changes(_changes(spark, BASE), ["k"], ["attr"], "ts")
    rows = {(r["k"], r["version"]): r for r in hist.collect()}
    assert len(rows) == 3  # (1,a), (1,b), (2,x)
    first = rows[(1, 1)]
    assert first["attr"] == "a"
    assert first["valid_to"] == _t("2024-01-03T00:00:00")
    assert not first["is_current"]
    second = rows[(1, 2)]
    assert second["attr"] == "b" and second["is_current"] and second["valid_to"] is None
    assert rows[(2, 1)]["is_current"]


def test_scd2_merge_batch_matches_full_rebuild(spark):
    batch = [
        (1, "b", _t("2024-01-04T00:00:00")),  # still b — collapses into v2
        (1, "c", _t("2024-01-05T00:00:00")),  # new state
        (3, "z", _t("2024-01-02T00:00:00")),  # brand-new key
    ]
    hist = scd2_from_changes(_changes(spark, BASE), ["k"], ["attr"], "ts")
    merged = scd2_merge_batch(hist, _changes(spark, batch), ["k"], ["attr"], "ts")
    full = scd2_from_changes(_changes(spark, BASE + batch), ["k"], ["attr"], "ts")
    assert _hist_rows(merged) == _hist_rows(full)
    # untouched key 2 passes through; key 1 gained a version
    cur = {r["k"]: r["attr"] for r in merged.filter("is_current").collect()}
    assert cur == {1: "c", 2: "x", 3: "z"}


def test_scd2_merge_batch_idempotent(spark):
    batch = _changes(spark, [(1, "c", _t("2024-01-05T00:00:00"))])
    hist = scd2_from_changes(_changes(spark, BASE), ["k"], ["attr"], "ts")
    once = scd2_merge_batch(hist, batch, ["k"], ["attr"], "ts")
    twice = scd2_merge_batch(once, batch, ["k"], ["attr"], "ts")
    assert _hist_rows(once) == _hist_rows(twice)


def test_ivm_merge_equals_direct_aggregation(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    keys, measures = ["l_returnflag"], ["l_extendedprice"]
    # three arbitrary slices (simulating base + two delta cycles)
    parts = [
        partial_agg(li.filter(F.col("l_orderkey") % 3 == i), keys, measures)
        for i in range(3)
    ]
    merged = finalize(merge_partials(parts, keys, measures), keys, measures)
    direct = finalize(partial_agg(li, keys, measures), keys, measures)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))


def test_ivm_null_measures_counted_correctly(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("b", 2.0)], ["g", "v"]
    )
    p1 = partial_agg(df.filter("v IS NULL OR v = 1.0"), ["g"], ["v"])
    p2 = partial_agg(df.filter("v = 2.0"), ["g"], ["v"])
    out = {
        r["g"]: r
        for r in finalize(merge_partials([p1, p2], ["g"], ["v"]), ["g"], ["v"]).collect()
    }
    assert out["a"]["n_rows"] == 2 and out["a"]["v_cnt"] == 1
    assert out["a"]["v_avg"] == 1.0
    assert out["b"]["v_sum"] == 2.0
