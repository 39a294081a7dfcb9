"""FK graph, checkpoint/resume, estimation, and JDBC SQL-generation tests."""

import pytest

from database_replicator_spark.operators.estimation import (
    estimate_parquet_dir,
    format_bytes,
    format_duration,
)
from database_replicator_spark.operators.fk import (
    cascade_safety_check,
    fk_dependents,
    topo_stages,
)
from database_replicator_spark.plans.checkpoint import (
    SnapshotCheckpoint,
    validate_source_target_different,
)
from database_replicator_spark.sources.jdbc import (
    build_delete_sql,
    build_upsert_sql,
    detect_source_type,
    incremental_query,
    upsert_batch_size,
)

TPCH_EDGES = [
    ("lineitem", "orders"), ("lineitem", "part"), ("lineitem", "supplier"),
    ("orders", "customer"), ("customer", "nation"), ("supplier", "nation"),
    ("nation", "region"),
]


class TestFkGraph:
    def test_dependents_transitive(self, spark):
        edges = spark.createDataFrame(TPCH_EDGES, "child string, parent string")
        got = {r["table"] for r in fk_dependents(edges, "region").collect()}
        assert got == {"nation", "customer", "supplier", "orders", "lineitem"}
        got = {r["table"] for r in fk_dependents(edges, "part").collect()}
        assert got == {"lineitem"}

    def test_cascade_safety(self, spark):
        edges = spark.createDataFrame(TPCH_EDGES, "child string, parent string")
        outside = cascade_safety_check(
            edges, "customer", {"customer", "orders"}
        )
        assert outside == ["lineitem"]
        assert cascade_safety_check(edges, "part", {"part", "lineitem"}) == []

    def test_topo_stages(self):
        tables = ["region", "nation", "customer", "supplier", "orders", "lineitem", "part"]
        stages = topo_stages(TPCH_EDGES, tables)
        assert stages[0] == ["part", "region"]
        assert stages[1] == ["nation"]
        assert stages[2] == ["customer", "supplier"]
        assert stages[3] == ["orders"]
        assert stages[4] == ["lineitem"]

    def test_topo_cycle_raises(self):
        with pytest.raises(ValueError, match="cycle"):
            topo_stages([("a", "b"), ("b", "a")], ["a", "b"])


class TestCheckpoint:
    def test_resume_and_fingerprint_invalidation(self, tmp_path):
        path = str(tmp_path / "ckpt.json")
        cp = SnapshotCheckpoint(path, "src://a", "tgt://b", "fp1")
        assert cp.completed_databases() == set()
        cp.mark_completed("db1")
        cp.mark_completed("db2")
        cp.mark_completed("db1")  # idempotent
        assert cp.completed_databases() == {"db1", "db2"}
        # same config resumes
        cp2 = SnapshotCheckpoint(path, "src://a", "tgt://b", "fp1")
        assert cp2.completed_databases() == {"db1", "db2"}
        # changed filter fingerprint discards the checkpoint
        cp3 = SnapshotCheckpoint(path, "src://a", "tgt://b", "fp2")
        assert cp3.completed_databases() == set()
        import os

        assert not os.path.exists(path)

    def test_source_target_guard(self):
        validate_source_target_different("postgres://h1/db", "postgres://h2/db")
        with pytest.raises(ValueError, match="identical"):
            validate_source_target_different("postgres://h/db", "postgres://h/db/")


class TestEstimation:
    def test_parquet_dir_estimate(self):
        est = estimate_parquet_dir("/root/testdata/sf0.001")
        assert est.total_bytes > 0
        assert est.estimated_seconds == pytest.approx(
            est.total_bytes / 1e9 / 20.0 * 3600.0
        )

    def test_formatters(self):
        assert format_bytes(512) == "512 B"
        assert format_bytes(2048) == "2.0 KB"
        assert format_duration(42) == "42s"
        assert format_duration(3700) == "1h 1m"


class TestJdbcSqlGen:
    def test_detect_source_type(self):
        assert detect_source_type("postgres://h/db") == "postgres"
        assert detect_source_type("postgresql://h/db") == "postgres"
        assert detect_source_type("mysql://h/db") == "mysql"
        assert detect_source_type("mongodb+srv://h/db") == "mongodb"
        assert detect_source_type("/tmp/data.sqlite") == "sqlite"
        with pytest.raises(ValueError):
            detect_source_type("ftp://nope")

    def test_upsert_sql(self):
        sql = build_upsert_sql("t", ["id", "name", "v"], ["id"], 2)
        assert sql == (
            'INSERT INTO "t" ("id", "name", "v") VALUES (%s, %s, %s), (%s, %s, %s) '
            'ON CONFLICT ("id") DO UPDATE SET "name" = EXCLUDED."name", "v" = EXCLUDED."v"'
        )

    def test_upsert_all_pk_do_nothing(self):
        sql = build_upsert_sql("t", ["a", "b"], ["a", "b"], 1)
        assert sql.endswith('ON CONFLICT ("a", "b") DO NOTHING')

    def test_upsert_batch_size_param_limit(self):
        assert upsert_batch_size(3) == 100            # capped
        assert upsert_batch_size(1000) == 65          # 65000/1000
        assert upsert_batch_size(100_000) == 1        # floor

    def test_delete_sql(self):
        assert (
            build_delete_sql("t", ["id"], 3)
            == 'DELETE FROM "t" WHERE "id" IN (%s, %s, %s)'
        )
        assert (
            build_delete_sql("t", ["a", "b"], 2)
            == 'DELETE FROM "t" WHERE ("a", "b") IN ((%s, %s), (%s, %s))'
        )

    def test_copy_value_rendering(self):
        from database_replicator_spark.sources.jdbc import render_copy_value

        assert render_copy_value(None) == r"\N"
        assert render_copy_value(True) == "t"
        assert render_copy_value(b"\x01\xff") == "\\\\x01ff"
        assert render_copy_value("a\tb\nc\\d") == "a\\tb\\nc\\\\d"
        assert render_copy_value([1, None, "x,y"]) == '{1,NULL,"x,y"}'
        with pytest.raises(TypeError):
            render_copy_value({"k": 1})

    def test_copy_escape_matches_expression(self, spark):
        """Python copy_escape and the Catalyst copy_text_escape_expr are
        the same rules — pin them together so they cannot drift."""
        from pyspark.sql import functions as F

        from database_replicator_spark.functions.render import copy_text_escape_expr
        from database_replicator_spark.sources.jdbc import copy_escape

        samples = ["plain", "a\tb", "n\nl", "r\rx", "back\\slash", "\t\n\r\\"]
        df = spark.createDataFrame([(s,) for s in samples], "s string")
        jvm = [r["e"] for r in df.select(copy_text_escape_expr(F.col("s")).alias("e")).collect()]
        assert jvm == [copy_escape(s) for s in samples]

    def test_incremental_query_xmin_mode(self):
        q = incremental_query("public.users", "xmin::text::bigint", 42, ["id", "name"])
        assert q == (
            'SELECT "id", "name", xmin::text::bigint AS _watermark '
            'FROM "public"."users" WHERE xmin::text::bigint > 42'
        )
        q = incremental_query("t", "updated_seq", 7)
        assert q == 'SELECT *, "updated_seq" AS _watermark FROM "t" WHERE "updated_seq" > 7'


class TestPreflightRetry:
    """§2.11: retry/backoff semantics (utils.rs:197-278) and preflight
    probe SQL shapes (preflight.rs:163-339, privileges.rs:63-251)."""

    def test_retry_succeeds_after_transient_failures(self):
        from database_replicator_spark.plans.preflight import retry_backoff

        calls, delays = [], []
        def flaky():
            calls.append(1)
            if len(calls) < 3:
                raise ConnectionError("connection refused")
            return "ok"

        out = retry_backoff(flaky, max_retries=3, initial_delay=1.0,
                            sleep=delays.append)
        assert out == "ok"
        assert len(calls) == 3
        assert delays == [1.0, 2.0]  # exponential: 1s then 2s

    def test_retry_exhausts_and_raises_last_error(self):
        import pytest as _pytest

        from database_replicator_spark.plans.preflight import retry_backoff

        delays = []
        def always():
            raise ConnectionError("could not connect to server")

        with _pytest.raises(ConnectionError):
            retry_backoff(always, max_retries=3, initial_delay=1.0,
                          sleep=delays.append)
        assert delays == [1.0, 2.0, 4.0]  # 3 retries => 4 attempts

    def test_non_transient_not_retried_when_gated(self):
        import pytest as _pytest

        from database_replicator_spark.plans.preflight import (
            is_transient_error,
            retry_backoff,
        )

        calls = []
        def authfail():
            calls.append(1)
            raise RuntimeError("password authentication failed")

        with _pytest.raises(RuntimeError):
            retry_backoff(authfail, retry_if=is_transient_error,
                          sleep=lambda _t: None)
        assert len(calls) == 1  # no retry on a permanent error

    def test_transient_classification(self):
        from database_replicator_spark.plans.preflight import is_transient_error

        assert is_transient_error(OSError("Connection timed out"))
        assert is_transient_error(RuntimeError("server closed the connection"))
        assert not is_transient_error(RuntimeError("syntax error at or near"))

    def test_probe_sql_shapes(self):
        from database_replicator_spark.plans.preflight import (
            has_table_privilege_sql,
            role_attributes_sql,
            server_version_sql,
            wal_level_sql,
        )

        s = has_table_privilege_sql("public.orders")
        assert "has_table_privilege(current_user, 'public.orders', 'SELECT')" in s
        # table name is a string literal → quote-doubled, not identifier-quoted
        assert "'public.o''rders'" in has_table_privilege_sql("public.o'rders")
        assert "rolreplication" in role_attributes_sql()
        assert wal_level_sql() == "SHOW wal_level"
        assert server_version_sql() == "SHOW server_version"

    def test_engine_validate_keeps_local_checks(self, spark, tmp_path):
        from database_replicator_spark.engine import Engine, ParquetTarget

        eng = Engine(
            spark=spark,
            source_tables={"t": spark.range(3).toDF("id")},
            target=ParquetTarget(str(tmp_path / "tgt")),
        )
        assert eng.validate(source_id="src", target_id=str(tmp_path / "tgt")) == []
        same = str(tmp_path / "same")
        assert eng.validate(source_id=same, target_id=same) != []


class TestDdlExecutor:
    """S5: driver-side DDL replay, live against SQLite (restore.rs
    semantics: ON_ERROR_STOP + 'already exists' tolerance)."""

    def test_split_statements_respects_quoting(self):
        from database_replicator_spark.sources.ddl_exec import split_statements

        sql = (
            "CREATE TABLE t (v TEXT DEFAULT 'a;b');\n"
            "-- a comment;\n"
            'CREATE TABLE "se;mi" (x INT);\n'
            "DO $$ BEGIN CREATE ROLE r; EXCEPTION WHEN duplicate_object "
            "THEN NULL; END $$;\n"
        )
        stmts = split_statements(sql)
        assert len(stmts) == 3
        assert stmts[0].endswith("'a;b')")
        assert '"se;mi"' in stmts[1]
        assert stmts[2].startswith("DO $$") and stmts[2].endswith("$$")

    def test_sqlite_live_execution_and_tolerance(self, tmp_path):
        import sqlite3

        from database_replicator_spark.sources.ddl_exec import execute_ddl

        db = str(tmp_path / "tgt.db")
        ddl = "CREATE TABLE users (id INTEGER PRIMARY KEY, name TEXT);"
        res = execute_ddl(db, ddl)
        assert res.counts == {"executed": 1, "skipped": 0}

        # replay: tolerated as already-existing, not an error
        res2 = execute_ddl(db, ddl)
        assert res2.counts == {"executed": 0, "skipped": 1}

        # a real error still raises (ON_ERROR_STOP)
        import pytest as _pytest

        with _pytest.raises(Exception):
            execute_ddl(db, "CREATE BOGUS SYNTAX;")

        conn = sqlite3.connect(db)
        try:
            names = [r[0] for r in conn.execute(
                "SELECT name FROM sqlite_master WHERE type='table'"
            )]
        finally:
            conn.close()
        assert names == ["users"]

    def test_generated_schema_replays_onto_sqlite(self, spark, tmp_path):
        """End-to-end S3→S5: StructType → CREATE TABLE → live replay."""
        from database_replicator_spark.operators.ddl import create_table_sql
        from database_replicator_spark.sources.ddl_exec import execute_ddl

        df = spark.createDataFrame([(1, "a", 2.5)], "id long, name string, v double")
        sql = create_table_sql("users", df.schema, pk_cols=["id"], if_not_exists=False)
        db = str(tmp_path / "restore.db")
        res = execute_ddl(db, sql + ";")
        assert res.counts["executed"] == 1


class TestStagingGc:
    def test_old_stage_removed_fresh_kept(self, tmp_path):
        import os
        import time as _time

        from database_replicator_spark.util import cleanup_stale_stages

        old = tmp_path / "t1.stage"
        fresh = tmp_path / "t2.stage"
        normal = tmp_path / "t3"
        for d in (old, fresh, normal):
            d.mkdir()
        stale_t = _time.time() - 48 * 3600
        os.utime(old, (stale_t, stale_t))

        removed = cleanup_stale_stages(str(tmp_path), max_age_hours=24)
        assert removed == [str(old)]
        assert not old.exists() and fresh.exists() and normal.exists()


class TestPgCatalogSql:
    def test_system_objects_excluded(self):
        from database_replicator_spark.sources.jdbc import (
            pg_list_databases_sql,
            pg_list_tables_sql,
            pg_primary_key_sql,
        )

        dbs = pg_list_databases_sql()
        for sysdb in ("template0", "template1", "postgres", "rdsadmin"):
            assert f"'{sysdb}'" in dbs
        assert "ORDER BY datname" in dbs

        tbls = pg_list_tables_sql()
        assert "'pg_catalog'" in tbls and "'information_schema'" in tbls
        assert "n_live_tup" in tbls

        pk = pg_primary_key_sql("public.orders")
        assert "indisprimary" in pk and "'public.orders'::regclass" in pk
        assert "''" in pg_primary_key_sql("o'rders")  # literal-escaped


class TestSchemaDrift:
    def _schemas(self):
        from pyspark.sql import types as T

        src = T.StructType(
            [
                T.StructField("id", T.LongType(), False),
                T.StructField("name", T.StringType(), True),
                T.StructField("score", T.DoubleType(), True),   # added at source
                T.StructField("age", T.LongType(), True),       # was INT at target
                T.StructField("note", T.StringType(), True),    # was NOT NULL at target
            ]
        )
        tgt = T.StructType(
            [
                T.StructField("id", T.LongType(), False),
                T.StructField("name", T.StringType(), True),
                T.StructField("age", T.IntegerType(), True),
                T.StructField("note", T.StringType(), False),
                T.StructField("legacy", T.StringType(), True),  # dropped at source
            ]
        )
        return src, tgt

    def test_diff_classifies_every_drift_kind(self):
        from database_replicator_spark.operators.ddl import schema_diff

        src, tgt = self._schemas()
        d = schema_diff(src, tgt)
        assert d.is_drifted
        assert d.added == ["score"]
        assert d.removed == ["legacy"]
        assert d.retyped == [("age", "BIGINT", "INTEGER")]
        assert d.renullable == [("note", True, False)]

    def test_identical_schemas_do_not_drift(self):
        from database_replicator_spark.operators.ddl import schema_diff

        src, _ = self._schemas()
        assert not schema_diff(src, src).is_drifted

    def test_alter_sql_splits_safe_from_review(self):
        from database_replicator_spark.operators.ddl import drift_alter_sql, schema_diff

        src, tgt = self._schemas()
        apply, review = drift_alter_sql('"t"', src, schema_diff(src, tgt))
        assert any('ADD COLUMN IF NOT EXISTS "score" DOUBLE PRECISION' in s for s in apply)
        assert any('ALTER COLUMN "note" DROP NOT NULL' in s for s in apply)
        # destructive/lossy items are commented, never in apply
        assert all(not s.lstrip().startswith("--") for s in apply)
        assert any('DROP COLUMN "legacy"' in s for s in review)
        assert any('"age" TYPE BIGINT' in s for s in review)
        assert all(s.lstrip().startswith("--") for s in review)

    def test_applied_alters_execute_on_sqlite(self, tmp_path):
        # live-wire: the safe ADD COLUMN statements run through the real
        # DDL executor (SQLite accepts ALTER TABLE ... ADD COLUMN)
        from pyspark.sql import types as T

        from database_replicator_spark.operators.ddl import drift_alter_sql, schema_diff
        from database_replicator_spark.sources.ddl_exec import execute_ddl

        db = str(tmp_path / "drift.db")
        execute_ddl(db, 'CREATE TABLE "t" ("id" INTEGER PRIMARY KEY)')
        src = T.StructType(
            [
                T.StructField("id", T.LongType(), False),
                T.StructField("extra", T.StringType(), True),
            ]
        )
        tgt = T.StructType([T.StructField("id", T.LongType(), False)])
        apply, _ = drift_alter_sql('"t"', src, schema_diff(src, tgt))
        # SQLite has no IF NOT EXISTS on ADD COLUMN — strip for the smoke
        res = execute_ddl(db, ";\n".join(s.replace(" IF NOT EXISTS", "") for s in apply))
        assert res.counts["executed"] == 1
        import sqlite3

        cols = [r[1] for r in sqlite3.connect(db).execute('PRAGMA table_info("t")')]
        assert cols == ["id", "extra"]


class TestEngineDrift:
    def test_check_drift_apply_path_end_to_end(self, spark, tmp_path):
        """The full drift apply loop against a LIVE SQLite target: engine
        reports the drift, its "apply" ALTER list runs through the real
        DDL executor, existing rows backfill NULL in the new column, and
        the post-ALTER table reads back with the evolved schema."""
        import sqlite3

        from pyspark.sql import functions as F

        from database_replicator_spark.engine import Engine, ParquetTarget
        from database_replicator_spark.sources.ddl_exec import execute_ddl
        from database_replicator_spark.sources.sqlite_source import (
            read_table_docs,
            table_info,
        )

        # live target table with one pre-drift row
        db = str(tmp_path / "live.db")
        execute_ddl(
            db,
            'CREATE TABLE "t" ("id" INTEGER PRIMARY KEY, "name" TEXT);\n'
            "INSERT INTO \"t\" VALUES (1, 'a')",
        )
        # engine sees the source schema grown by one column
        tgt = ParquetTarget(str(tmp_path / "tgt"))
        base = spark.createDataFrame([(1, "a")], "id long, name string")
        tgt.overwrite(base, "t")
        src = spark.createDataFrame(
            [(1, "a", 1.5)], "id long, name string, extra double"
        )  # extra is nullable — ADD COLUMN must be backfillable
        eng = Engine(spark=spark, source_tables={"t": src}, target=tgt)
        rep = eng.check_drift()
        assert rep["t"]["status"] == "drifted" and rep["t"]["apply"]
        # execute the engine-emitted apply list on the live target
        # (SQLite lacks IF NOT EXISTS on ADD COLUMN — dialect strip)
        res = execute_ddl(
            db,
            ";\n".join(s.replace(" IF NOT EXISTS", "") for s in rep["t"]["apply"]),
        )
        assert res.counts["executed"] == len(rep["t"]["apply"])
        # existing row backfilled NULL; post-ALTER write+read round-trips
        cols, _ = table_info(db, "t")
        assert cols == ["id", "name", "extra"]
        conn = sqlite3.connect(db)
        conn.execute('INSERT INTO "t" VALUES (2, \'b\', 2.5)')
        conn.commit()
        rows = {r[0]: r[2] for r in conn.execute('SELECT * FROM "t" ORDER BY "id"')}
        conn.close()
        assert rows == {1: None, 2: 2.5}
        # and the distributed reader sees the evolved table
        docs = read_table_docs(spark, db, "t")
        assert docs.count() == 2

    def test_check_drift_reports_per_table(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from database_replicator_spark.engine import Engine, ParquetTarget

        tgt = ParquetTarget(str(tmp_path / "tgt"))
        base = spark.createDataFrame([(1, "a")], "id long, name string")
        tgt.overwrite(base, "t")
        # source grew a column since the snapshot
        src = base.withColumn("extra", F.lit(1.5))
        eng = Engine(spark=spark, source_tables={"t": src}, target=tgt)
        rep = eng.check_drift()
        assert rep["t"]["status"] == "drifted"
        assert rep["t"]["added"] == ["extra"]
        assert any("ADD COLUMN" in s for s in rep["t"]["apply"])

        eng2 = Engine(spark=spark, source_tables={"t": base}, target=tgt)
        assert eng2.check_drift()["t"]["status"] == "in_sync"
