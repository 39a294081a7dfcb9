"""The reference's flagship integration lifecycle against a LIVE mutable
SQLite source: insert → sync → update → sync → delete → reconcile → state
recovery (tests/xmin_integration_test.rs shape, FIXTURES.md §1: table
(id PK, name, value, updated_at-as-seq))."""

import sqlite3

import pytest

from database_replicator_spark.engine import Engine, ParquetTarget
from database_replicator_spark.sources.sqlite_source import read_table_relational


@pytest.fixture()
def live_db(tmp_path):
    path = str(tmp_path / "live.db")
    conn = sqlite3.connect(path)
    conn.execute(
        "CREATE TABLE xmin_test (id INTEGER PRIMARY KEY, name TEXT NOT NULL, "
        "value INTEGER DEFAULT 0, seq INTEGER NOT NULL)"
    )
    conn.executemany(
        "INSERT INTO xmin_test VALUES (?, ?, ?, ?)",
        [(1, "test1", 0, 1), (2, "test2", 0, 2), (3, "test3", 0, 3)],
    )
    conn.commit()
    conn.close()
    return path


def _engine(spark, live_db, tmp_path):
    return Engine(
        spark=spark,
        source_tables={"xmin_test": read_table_relational(spark, live_db, "xmin_test")},
        target=ParquetTarget(str(tmp_path / "tgt")),
        state_path=str(tmp_path / "state.json"),
    )


def _mutate(live_db, sql, args=()):
    conn = sqlite3.connect(live_db)
    conn.execute(sql, args)
    conn.commit()
    conn.close()


def test_full_lifecycle(spark, live_db, tmp_path):
    eng = _engine(spark, live_db, tmp_path)

    # initial sync: everything flows (no watermark state yet)
    out = eng.sync_cycle("xmin_test", "seq", ["id"])
    assert out == {"table": "xmin_test", "mode": "incremental", "rows": 3}
    assert eng.verify(["xmin_test"])["xmin_test"]["status"] == "match"

    # INSERT at the source → only the delta syncs
    _mutate(live_db, "INSERT INTO xmin_test VALUES (4, 'test4', 9, 4)")
    eng.source_tables["xmin_test"] = read_table_relational(spark, live_db, "xmin_test")
    out = eng.sync_cycle("xmin_test", "seq", ["id"])
    assert out["rows"] == 1
    assert eng.verify(["xmin_test"])["xmin_test"]["status"] == "match"

    # UPDATE (bumping the watermark, like xmin changing on write)
    _mutate(live_db, "UPDATE xmin_test SET value = 42, seq = 5 WHERE id = 2")
    eng.source_tables["xmin_test"] = read_table_relational(spark, live_db, "xmin_test")
    out = eng.sync_cycle("xmin_test", "seq", ["id"])
    assert out["rows"] == 1
    tgt = {r["id"]: r["value"] for r in eng.target.read(spark, "xmin_test").collect()}
    assert tgt[2] == 42

    # DELETE at the source → sync alone cannot see it; reconcile does
    _mutate(live_db, "DELETE FROM xmin_test WHERE id = 1")
    eng.source_tables["xmin_test"] = read_table_relational(spark, live_db, "xmin_test")
    out = eng.sync_cycle("xmin_test", "seq", ["id"])
    assert out["rows"] == 0
    assert eng.verify(["xmin_test"])["xmin_test"]["status"] == "mismatch"  # orphan present
    rec = eng.reconcile("xmin_test", ["id"])
    assert rec["deleted"] == 1
    assert eng.verify(["xmin_test"])["xmin_test"]["status"] == "match"

    # STATE RECOVERY: a fresh engine (same state file) resumes, re-sync is a no-op
    eng2 = _engine(spark, live_db, tmp_path)
    out = eng2.sync_cycle("xmin_test", "seq", ["id"])
    assert out["rows"] == 0
    assert eng2.status()["tables"]["xmin_test"]["last_watermark"] == 5


def test_replayed_batch_is_harmless(spark, live_db, tmp_path):
    """At-least-once contract: wiping the watermark forces a full re-read;
    the idempotent merge leaves the target identical (ST4)."""
    eng = _engine(spark, live_db, tmp_path)
    eng.sync_cycle("xmin_test", "seq", ["id"])
    before = sorted(map(tuple, eng.target.read(spark, "xmin_test").collect()))
    # simulate replay: reset state, sync everything again
    import os

    os.remove(str(tmp_path / "state.json"))
    out = eng.sync_cycle("xmin_test", "seq", ["id"])
    assert out["rows"] == 3
    after = sorted(map(tuple, eng.target.read(spark, "xmin_test").collect()))
    assert before == after
