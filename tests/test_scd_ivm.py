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


def test_rollup_cli_init_then_delta_equals_full(spark, tmp_path, capsys):
    """The rollup verb: init on the first half, --delta the second half —
    finalized view equals one full-table aggregation."""
    import json as _json

    from database_replicator_spark.cli import main
    from database_replicator_spark.operators.ivm import finalize, partial_agg

    state = str(tmp_path / "state")
    args = ["rollup", "--source", "/root/testdata/sf0.001", "--table", "lineitem",
            "--keys", "l_returnflag,l_linestatus", "--measures", "l_extendedprice",
            "--state", state]
    rc = main(args + ["--filter", "l_orderkey <= 750"])
    init = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and init["ok"] and init["mode"] == "init"

    rc = main(args + ["--filter", "l_orderkey > 750", "--delta"])
    delta = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and delta["ok"] and delta["mode"] == "delta"

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    keys, ms = ["l_returnflag", "l_linestatus"], ["l_extendedprice"]
    want = {
        (r["l_returnflag"], r["l_linestatus"]): r.asDict()
        for r in finalize(partial_agg(li, keys, ms), keys, ms).collect()
    }
    got = {(r["l_returnflag"], r["l_linestatus"]): r for r in delta["rollup"]}
    assert set(got) == set(want)
    for k, w in want.items():
        assert got[k]["n_rows"] == w["n_rows"]
        assert abs(float(got[k]["l_extendedprice_sum"]) - w["l_extendedprice_sum"]) < 1e-6
        assert abs(float(got[k]["l_extendedprice_avg"]) - w["l_extendedprice_avg"]) < 1e-9

    # delta without prior state is a clean, explained failure
    rc = main(["rollup", "--source", "/root/testdata/sf0.001", "--table", "lineitem",
               "--keys", "l_returnflag", "--measures", "l_extendedprice",
               "--state", str(tmp_path / "missing"), "--delta"])
    err = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 2 and not err["ok"]


def test_streaming_rollup_maintenance(spark, tmp_path):
    """IVM under Structured Streaming: foreachBatch folds each micro-batch's
    partial aggregates into the stored state; the finalized view after two
    batches equals a one-shot aggregation of all rows."""
    import json
    import os

    from database_replicator_spark.operators.ivm import (
        finalize,
        merge_partials,
        partial_agg,
    )
    from database_replicator_spark.util import staged_overwrite

    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    def apply_batch(batch_df, _epoch):
        p = partial_agg(batch_df, ["g"], ["v"])
        if os.path.isdir(state):
            prev = batch_df.sparkSession.read.parquet(state)
            p = merge_partials([prev, p], ["g"], ["v"])
        staged_overwrite(batch_df.sparkSession, p, state)

    def run(rows, name):
        with open(os.path.join(src, name), "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        q = (
            spark.readStream.schema("g string, v double")
            .json(src)
            .writeStream.foreachBatch(apply_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    b1 = [{"g": "a", "v": 1.5}, {"g": "a", "v": 2.5}, {"g": "b", "v": 10.0}]
    b2 = [{"g": "a", "v": 6.0}, {"g": "c", "v": 7.0}, {"g": "b", "v": None}]
    run(b1, "b1.json")
    run(b2, "b2.json")

    stored = finalize(spark.read.parquet(state), ["g"], ["v"])
    all_rows = spark.createDataFrame(
        [(r["g"], r["v"]) for r in b1 + b2], "g string, v double"
    )
    direct = finalize(partial_agg(all_rows, ["g"], ["v"]), ["g"], ["v"])
    assert sorted(map(tuple, stored.collect())) == sorted(map(tuple, direct.collect()))
    got = {r["g"]: r for r in stored.collect()}
    assert got["a"]["v_avg"] == (1.5 + 2.5 + 6.0) / 3
    assert got["b"]["n_rows"] == 2 and got["b"]["v_cnt"] == 1
