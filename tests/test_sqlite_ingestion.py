"""SQLite → document-table ingestion tests, replicating the reference's
integration fixtures (FIXTURES.md §2 / tests/sqlite_integration_test.rs):
users/posts/empty_table plus an all-types table with unicode and an empty
blob — the suite's sharpest corners."""

import json
import sqlite3

import pytest

from database_replicator_spark.sources.sqlite_source import (
    encode_row,
    encode_value,
    ingest_sqlite,
    list_tables,
    read_table_docs,
    table_info,
)


@pytest.fixture()
def db(tmp_path):
    path = str(tmp_path / "fixture.db")
    conn = sqlite3.connect(path)
    conn.executescript(
        """
        CREATE TABLE users (
            id INTEGER PRIMARY KEY, name TEXT NOT NULL, age INTEGER,
            balance REAL, bio TEXT, avatar BLOB
        );
        CREATE TABLE posts (
            id INTEGER PRIMARY KEY, user_id INTEGER, title TEXT NOT NULL,
            content TEXT, published INTEGER
        );
        CREATE TABLE empty_table (id INTEGER PRIMARY KEY, data TEXT);
        CREATE TABLE type_test (v);
        CREATE TABLE no_pk (a TEXT, b INTEGER);
        CREATE TABLE composite (a INTEGER, b INTEGER, PRIMARY KEY (a, b));
        """
    )
    conn.execute(
        "INSERT INTO users VALUES (1, 'alice', 30, 12.5, NULL, X'48656c6c6f')"
    )
    conn.execute("INSERT INTO users VALUES (2, '日本語', NULL, NULL, 'bio', X'')")
    conn.execute("INSERT INTO posts VALUES (1, 1, 't1', NULL, 1)")
    for v in [42, 1.5, "text", None]:
        conn.execute("INSERT INTO type_test VALUES (?)", (v,))
    conn.execute("INSERT INTO type_test VALUES (x'00ff')")
    conn.execute("INSERT INTO no_pk VALUES ('x', 1), ('y', 2)")
    conn.execute("INSERT INTO composite VALUES (1, 2), (3, 4)")
    conn.commit()
    conn.close()
    return path


class TestDiscovery:
    def test_list_tables_skips_internals(self, db):
        assert list_tables(db) == [
            "composite", "empty_table", "no_pk", "posts", "type_test", "users",
        ]

    def test_table_info_pk_detection(self, db):
        cols, pks = table_info(db, "users")
        assert cols == ["id", "name", "age", "balance", "bio", "avatar"]
        assert pks == ["id"]
        _, pks = table_info(db, "composite")
        assert pks == ["a", "b"]
        _, pks = table_info(db, "no_pk")
        assert pks == []


class TestEncoding:
    def test_value_matrix(self):
        assert encode_value(None) == "null"
        assert encode_value(42) == "42"
        assert encode_value(1.5) == "1.5"
        assert encode_value(float("nan")) == '"NaN"'
        assert encode_value(float("inf")) == '"inf"'
        assert encode_value(float("-inf")) == '"-inf"'
        assert encode_value(b"Hello") == '{"_type":"blob","data":"SGVsbG8="}'
        assert encode_value(b"") == '{"_type":"blob","data":""}'
        assert json.loads(encode_value("日本語")) == "日本語"

    def test_encode_row_matches_expression_library(self, spark):
        """The Python per-value encoder and the Catalyst fragment library
        must produce identical documents for statically-typed rows."""
        from pyspark.sql import functions as F

        from database_replicator_spark.functions import doc_json as J

        py = encode_row(
            ["a", "b", "c", "d"], [7, "x \"q\"", None, b"\x01"]
        )
        df = spark.createDataFrame(
            [(7, 'x "q"', None, bytes([1]))], "a long, b string, c string, d binary"
        )
        expr = J.object_from_fragments(
            a=J.json_number(F.col("a")),
            b=J.json_string(F.col("b")),
            c=J.json_string(F.col("c")),
            d=J.json_blob(F.col("d")),
        )
        jvm = df.select(expr.alias("j")).collect()[0]["j"]
        assert py == jvm


class TestIngestion:
    def test_users_roundtrip(self, spark, db):
        docs = read_table_docs(spark, db, "users", num_partitions=3)
        rows = {r["id"]: json.loads(r["data"]) for r in docs.collect()}
        assert rows["1"] == {
            "id": 1, "name": "alice", "age": 30, "balance": 12.5,
            "bio": None, "avatar": {"_type": "blob", "data": "SGVsbG8="},
        }
        assert rows["2"]["name"] == "日本語"
        assert rows["2"]["avatar"] == {"_type": "blob", "data": ""}

    def test_dynamic_typed_column(self, spark, db):
        """One column holding int/real/text/null/blob across rows — the
        per-value encoding the expression library cannot express."""
        docs = read_table_docs(spark, db, "type_test")
        vals = [json.loads(r["data"])["v"] for r in docs.orderBy("id").collect()]
        assert vals == [42, 1.5, "text", None, {"_type": "blob", "data": "AP8="}]

    def test_empty_table(self, spark, db):
        docs = read_table_docs(spark, db, "empty_table")
        assert docs.count() == 0
        assert docs.columns == ["id", "data", "_source_type", "_migrated_at"]

    def test_composite_pk_rownum_and_no_pk_fallback(self, spark, db):
        comp = read_table_docs(spark, db, "composite")
        assert sorted(r["id"] for r in comp.collect()) == ["1", "2"]
        nopk = read_table_docs(spark, db, "no_pk")
        assert sorted(r["id"] for r in nopk.collect()) == ["1", "2"]

    def test_ingest_whole_database(self, spark, db):
        tables = ingest_sqlite(spark, db)
        assert set(tables) == {
            "composite", "empty_table", "no_pk", "posts", "type_test", "users",
        }
        assert tables["posts"].count() == 1
        row = tables["posts"].collect()[0]
        assert row["_source_type"] == "sqlite"
        assert json.loads(row["data"])["published"] == 1


class TestRelationalRead:
    def test_typed_read_with_affinity(self, spark, db):
        from database_replicator_spark.sources.sqlite_source import read_table_relational

        df = read_table_relational(spark, db, "users", num_partitions=2)
        assert dict(df.dtypes) == {
            "id": "bigint", "name": "string", "age": "bigint",
            "balance": "double", "bio": "string", "avatar": "binary",
        }
        rows = {r["id"]: r for r in df.collect()}
        assert rows[1]["balance"] == 12.5
        assert bytes(rows[1]["avatar"]) == b"Hello"
        assert rows[2]["age"] is None

    def test_empty_relational(self, spark, db):
        from database_replicator_spark.sources.sqlite_source import read_table_relational

        df = read_table_relational(spark, db, "empty_table")
        assert df.count() == 0 and dict(df.dtypes)["id"] == "bigint"
