"""Live-wire execution of the S18/S19 sink SQL against a real database.

The container has no Postgres server, but SQLite speaks the same
``INSERT … ON CONFLICT (pk) DO UPDATE SET c = EXCLUDED.c`` and row-value
``IN`` dialect — so the actual foreachPartition appliers
(JdbcUpsertWriter.upsert/delete) run end-to-end here: Spark executors
open DB-API connections, ship the generated SQL with real parameter
batches, and the final table state is asserted through an independent
connection. This is the integration half of the SQL-generation unit
tests in test_operators.py."""

import sqlite3

import pytest

from database_replicator_spark.sources.ddl_exec import execute_ddl
from database_replicator_spark.sources.jdbc import JdbcUpsertWriter, open_dbapi


@pytest.fixture()
def db(tmp_path):
    return str(tmp_path / "sink.db")


def _all_rows(db, sql):
    conn = sqlite3.connect(db)
    try:
        return sorted(conn.execute(sql).fetchall())
    finally:
        conn.close()


class TestUpsertDeleteLivewire:
    def test_upsert_insert_then_conflict_update(self, spark, db):
        execute_ddl(db, 'CREATE TABLE "users" ("id" INTEGER PRIMARY KEY, "name" TEXT, "age" INTEGER)')
        w = JdbcUpsertWriter(dsn=db, table="users", pk_cols=["id"])

        first = spark.createDataFrame(
            [(1, "ann", 30), (2, "bob", 41), (3, "cid", 52)],
            "id long, name string, age long",
        ).repartition(2)
        w.upsert(first)
        assert _all_rows(db, "SELECT id, name, age FROM users") == [
            (1, "ann", 30),
            (2, "bob", 41),
            (3, "cid", 52),
        ]

        # conflicting re-upsert: updated values win, no duplicate rows,
        # and re-running the same batch is idempotent (task-retry posture)
        second = spark.createDataFrame(
            [(2, "bob2", 42), (4, "dee", 28)], "id long, name string, age long"
        )
        w.upsert(second)
        w.upsert(second)
        assert _all_rows(db, "SELECT id, name, age FROM users") == [
            (1, "ann", 30),
            (2, "bob2", 42),
            (3, "cid", 52),
            (4, "dee", 28),
        ]

    def test_upsert_all_pk_columns_is_do_nothing(self, spark, db):
        execute_ddl(db, 'CREATE TABLE "tags" ("tag" TEXT PRIMARY KEY)')
        w = JdbcUpsertWriter(dsn=db, table="tags", pk_cols=["tag"])
        w.upsert(spark.createDataFrame([("a",), ("b",)], "tag string"))
        w.upsert(spark.createDataFrame([("a",), ("c",)], "tag string"))
        assert _all_rows(db, "SELECT tag FROM tags") == [("a",), ("b",), ("c",)]

    def test_delete_single_pk(self, spark, db):
        execute_ddl(db, 'CREATE TABLE "t" ("id" INTEGER PRIMARY KEY, "v" TEXT)')
        w = JdbcUpsertWriter(dsn=db, table="t", pk_cols=["id"], delete_batch=2)
        w.upsert(
            spark.createDataFrame(
                [(i, f"v{i}") for i in range(10)], "id long, v string"
            )
        )
        # 5 keys with batch=2 exercises the mid-stream flush AND the tail
        w.delete(spark.createDataFrame([(i,) for i in range(5)], "id long"))
        assert _all_rows(db, "SELECT id FROM t") == [(i,) for i in range(5, 10)]

    def test_delete_composite_pk_row_values(self, spark, db):
        execute_ddl(
            db,
            'CREATE TABLE "kv" ("k1" TEXT, "k2" INTEGER, "v" TEXT, PRIMARY KEY ("k1", "k2"))',
        )
        w = JdbcUpsertWriter(dsn=db, table="kv", pk_cols=["k1", "k2"])
        w.upsert(
            spark.createDataFrame(
                [("a", 1, "x"), ("a", 2, "y"), ("b", 1, "z")],
                "k1 string, k2 long, v string",
            )
        )
        w.delete(spark.createDataFrame([("a", 1), ("b", 1)], "k1 string, k2 long"))
        assert _all_rows(db, "SELECT k1, k2 FROM kv") == [("a", 2)]

    def test_batched_upsert_crosses_parameter_batches(self, spark, db):
        # 250 rows × 3 cols at the default 100-row cap → 3 statements per
        # partition worst case; content must still be exact
        execute_ddl(db, 'CREATE TABLE "big" ("id" INTEGER PRIMARY KEY, "a" TEXT, "b" INTEGER)')
        w = JdbcUpsertWriter(dsn=db, table="big", pk_cols=["id"])
        rows = [(i, f"s{i}", i * 2) for i in range(250)]
        w.upsert(spark.createDataFrame(rows, "id long, a string, b long").coalesce(1))
        assert _all_rows(db, "SELECT id, a, b FROM big") == sorted(rows)

    def test_open_dbapi_rejects_unroutable(self):
        with pytest.raises(ValueError):
            open_dbapi("mysql://host/db")
