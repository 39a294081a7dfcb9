"""State-store streaming dedup: within-batch, cross-restart (state
survives via checkpoint), and first-wins semantics."""

import json
import os

import pytest

from database_replicator_spark.streaming.dedup_stream import start_dedup_ingest


@pytest.fixture()
def dirs(tmp_path):
    d = {
        "src": str(tmp_path / "feed"),
        "tgt": str(tmp_path / "corpus"),
        "chk": str(tmp_path / "chk"),
    }
    os.makedirs(d["src"])
    return d


def _write_feed(path, rows):
    with open(path, "w") as f:
        json.dump(rows, f)


def _drain(spark, dirs):
    q = start_dedup_ingest(spark, dirs["src"], dirs["tgt"], dirs["chk"])
    q.awaitTermination(120)


def _doc(doc_id, fp, t, text="x", source="s"):
    return {
        "doc_id": doc_id,
        "fingerprint": fp,
        "event_time": t,
        "text": text,
        "source": source,
    }


class TestStateStoreDedup:
    def test_within_batch_and_across_restarts(self, spark, dirs):
        # epoch 1: A twice (within-batch dup), B once
        _write_feed(
            os.path.join(dirs["src"], "f1.json"),
            [
                _doc(1, "A", "2026-01-01T10:00:00", text="first-a"),
                _doc(2, "A", "2026-01-01T10:01:00", text="dup-a"),
                _doc(3, "B", "2026-01-01T10:02:00"),
            ],
        )
        _drain(spark, dirs)
        got = spark.read.parquet(dirs["tgt"]).collect()
        assert sorted(r["fingerprint"] for r in got) == ["A", "B"]

        # epoch 2 (fresh query, SAME checkpoint): A again within the
        # 1-hour horizon must be dropped by recovered state; C is new.
        _write_feed(
            os.path.join(dirs["src"], "f2.json"),
            [
                _doc(4, "A", "2026-01-01T10:30:00", text="late-dup-a"),
                _doc(5, "C", "2026-01-01T10:31:00"),
            ],
        )
        _drain(spark, dirs)
        got = spark.read.parquet(dirs["tgt"]).collect()
        assert sorted(r["fingerprint"] for r in got) == ["A", "B", "C"]
        # first-wins: the surviving A is epoch-1's first copy
        a = [r for r in got if r["fingerprint"] == "A"]
        assert len(a) == 1 and a[0]["text"] == "first-a"
