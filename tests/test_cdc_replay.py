"""Bounded CDC replay harness (streaming/change_stream.replay_change_log):
the determinism contracts behind the cdc_replay_* gates.

- final ``_latest`` equals the batch last-write-wins over the whole log,
  and ``_sync_state`` carries the exact HWM + change count (epochs
  arrive in change-id order by construction);
- explicit chunk_col mode: epoch boundaries are exactly the chunk
  boundaries, so an as-of read at epoch 0 equals LWW over chunk-0 rows;
- re-running the replay on the same work_dir replays from genesis
  (fresh checkpoint), byte-identical output.
"""

import json

from pyspark.sql import functions as F

from database_replicator_spark.streaming.change_stream import (
    read_table_asof,
    replay_change_log,
)


def _changes(spark, n=300):
    rows = [
        (
            i,
            "t",
            "delete" if i % 10 == 0 else ("insert" if i % 3 == 0 else "update"),
            str(i % 40),
            json.dumps({"v": i * 7}),
        )
        for i in range(1, n + 1)
    ]
    return spark.createDataFrame(
        rows, "change_id long, table string, op string, pk string, payload string"
    )


def _lww(rows):
    """Batch last-write-wins over (change_id, op, pk, payload) tuples."""
    best = {}
    for r in rows:
        if r["pk"] not in best or r["change_id"] > best[r["pk"]]["change_id"]:
            best[r["pk"]] = r
    return {
        pk: (r["change_id"], r["payload"])
        for pk, r in best.items()
        if r["op"] != "delete"
    }


class TestReplay:
    def test_final_state_and_sync_state(self, spark, tmp_path):
        ch = _changes(spark)
        latest, state = replay_change_log(
            spark, ch, str(tmp_path / "w"), epochs=3, n_buckets=4
        )
        got = {
            r["pk"]: (r["change_id"], r["payload"]) for r in latest.collect()
        }
        assert got == _lww(ch.collect())
        st = state.collect()
        assert len(st) == 1
        assert st[0]["last_change_id"] == 300
        assert st[0]["n_changes"] == 300

    def test_chunked_asof_equals_bounded_lww(self, spark, tmp_path):
        ch = _changes(spark).withColumn(
            "chunk", F.when(F.col("change_id") <= 150, 0).otherwise(1)
        )
        work = str(tmp_path / "w2")
        latest, _ = replay_change_log(
            spark, ch, work, epochs=2, n_buckets=4, chunk_col="chunk"
        )
        asof = read_table_asof(spark, work + "/target", "t", epoch=0)
        got = {
            r["pk"]: (r["change_id"], r["payload"]) for r in asof.collect()
        }
        want = _lww(ch.filter("change_id <= 150").collect())
        assert got == want
        # and the final state still covers everything
        assert {
            r["pk"]: (r["change_id"], r["payload"]) for r in latest.collect()
        } == _lww(ch.collect())

    def test_rerun_replays_from_genesis_identically(self, spark, tmp_path):
        ch = _changes(spark, n=120)
        work = str(tmp_path / "w3")
        a, _ = replay_change_log(spark, ch, work, epochs=2, n_buckets=4)
        snap_a = sorted(tuple(r) for r in a.collect())
        b, _ = replay_change_log(spark, ch, work, epochs=2, n_buckets=4)
        snap_b = sorted(tuple(r) for r in b.collect())
        assert snap_a == snap_b
