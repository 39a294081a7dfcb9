"""Custom stateful streaming operator (applyInPandasWithState): state
persists across micro-batches and across query restarts.

Sink note: the memory sink cannot recover from a checkpoint, so the
collector is a foreachBatch writing to parquet — the restartable shape.
"""

import json
import os


def _write(path, rows):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")


def _run(spark, src, chk, out_dir):
    from database_replicator_spark.streaming.stateful import running_totals

    stream = spark.readStream.schema("user_id long, value double").json(src)
    totals = running_totals(stream)

    def sink(batch, epoch_id):
        if not batch.isEmpty():
            batch.write.mode("append").parquet(out_dir)

    q = (
        totals.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # latest emission per user wins (update-mode emissions accumulate)
    rows = spark.read.parquet(out_dir).collect()
    latest: dict = {}
    for r in rows:
        cur = latest.get(r["user_id"])
        if cur is None or r["n_events"] > cur[0]:
            latest[r["user_id"]] = (r["n_events"], r["sum_value"])
    return latest


def test_state_accumulates_across_batches_and_restarts(spark, tmp_path):
    src = str(tmp_path / "events")
    chk = str(tmp_path / "chk")
    out = str(tmp_path / "out")
    _write(os.path.join(src, "b1.json"), [
        {"user_id": 1, "value": 10.0},
        {"user_id": 1, "value": 5.0},
        {"user_id": 2, "value": 1.0},
    ])
    got = _run(spark, src, chk, out)
    assert got == {1: (2, 15.0), 2: (1, 1.0)}

    # restart with new data: state resumes from the store, not from zero
    _write(os.path.join(src, "b2.json"), [
        {"user_id": 1, "value": 2.5},
        {"user_id": 3, "value": 7.0},
    ])
    got = _run(spark, src, chk, out)
    assert got[1] == (3, 17.5)   # 2 prior events + 1 new, sums carried
    assert got[3] == (1, 7.0)    # new key starts fresh
    assert got[2] == (1, 1.0)    # untouched key keeps its state
