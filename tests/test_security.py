"""Adversarial input tests — the reference's security tier
(tests/security_test.rs, 43 tests: SQL injection via table names and
predicates, path traversal, control characters) re-expressed for this
engine's attack surface: generated SQL (identifiers, literals), rule specs,
and filename-derived table routing.

The DataFrame API removes most injection surface by construction (Catalyst
parses predicates into expressions; a hostile predicate is a parse error or
a falsy filter, never a second statement) — these tests pin the places
where we still BUILD SQL or identifiers by hand."""

import pytest

from database_replicator_spark.plans.rules import (
    QualifiedTable,
    TableRules,
    quote_ident,
    validate_ident,
)
from database_replicator_spark.sources.jdbc import (
    build_delete_sql,
    build_upsert_sql,
    incremental_query,
    sql_literal,
)

HOSTILE_IDENTS = [
    'users"; DROP TABLE x; --',
    "users'; DELETE FROM y --",
    "a\nb",
    "a\x00b",
    "users`; --",
]


class TestIdentifierHandling:
    @pytest.mark.parametrize("evil", HOSTILE_IDENTS)
    def test_quote_ident_neutralizes(self, evil):
        q = quote_ident(evil)
        # quoted form: wrapped, internal quotes doubled → cannot terminate
        assert q.startswith('"') and q.endswith('"')
        assert '"' not in q[1:-1].replace('""', "")

    @pytest.mark.parametrize("evil", HOSTILE_IDENTS)
    def test_validate_ident_rejects(self, evil):
        with pytest.raises(ValueError):
            validate_ident(evil)

    def test_upsert_sql_quotes_hostile_columns(self):
        sql = build_upsert_sql("t", ['x"; DROP TABLE t; --', "ok"], ["ok"], 1)
        # the hostile name is inert inside doubled quotes at every site
        # (column list, SET target, EXCLUDED reference)
        assert sql.count('"x""; DROP TABLE t; --"') == 3
        assert 'x"; DROP' not in sql  # the un-doubled form never appears

    def test_delete_sql_quotes_pk_columns(self):
        sql = build_delete_sql("t", ['pk"junk'], 2)
        assert '"pk""junk"' in sql


class TestLiteralHandling:
    @pytest.mark.parametrize(
        "evil",
        ["'; DROP TABLE t; --", "0; DELETE FROM t", "a'b''c", "x\ny"],
    )
    def test_watermark_literal_cannot_split_statement(self, evil):
        q = incremental_query("t", "wm", evil)
        lit = sql_literal(evil)
        # single literal token: starts/ends with quote, inner quotes doubled
        assert lit.startswith("'") and lit.endswith("'")
        assert "''" in lit or "'" not in evil
        assert q.endswith(lit)

    def test_numeric_watermarks_stay_bare(self):
        assert sql_literal(42) == "42"
        assert sql_literal(3.5) == "3.5"
        assert sql_literal(True) == "TRUE"


class TestRuleSpecs:
    @pytest.mark.parametrize("spec", ["", "a..b", ".t", "a.b.c.d"])
    def test_malformed_table_specs_rejected(self, spec):
        with pytest.raises(ValueError):
            QualifiedTable.parse(spec)

    def test_time_filter_column_must_be_identifier(self):
        tr = TableRules()
        with pytest.raises(ValueError):
            tr.add_time_filter("t", 'ts"; DROP TABLE x; --', "1 day")

    def test_empty_predicate_rejected(self):
        tr = TableRules()
        with pytest.raises(ValueError):
            tr.add_predicate("t", "   ")

    def test_hostile_predicate_is_expression_not_statement(self, spark):
        """A predicate string reaches Catalyst as an EXPRESSION: a
        statement-shaped payload is a parse error, never executed SQL."""
        from pyspark.sql.utils import AnalysisException

        from database_replicator_spark.operators.snapshot import filtered_copy

        df = spark.createDataFrame([(1,)], "id int")
        with pytest.raises(Exception):
            filtered_copy(df, predicate="1=1; DROP TABLE users").collect()
        # ordinary boolean expressions still work
        assert filtered_copy(df, predicate="id > 0").count() == 1


class TestPathHandling:
    def test_sqlite_path_traversal_is_contained(self, tmp_path):
        """A hostile table name cannot escape into SQL via the SQLite
        reader's quoting."""
        import sqlite3

        from database_replicator_spark.sources.sqlite_source import table_info

        path = str(tmp_path / "t.db")
        conn = sqlite3.connect(path)
        conn.execute('CREATE TABLE "we""ird" (id INTEGER PRIMARY KEY)')
        conn.commit()
        conn.close()
        cols, pks = table_info(path, 'we"ird')
        assert cols == ["id"] and pks == ["id"]

    def test_catalog_load_rejects_missing_table(self, spark, tmp_path):
        from database_replicator_spark.sources.catalog import load_table

        with pytest.raises(Exception):
            load_table(spark, str(tmp_path), "../../etc/passwd").collect()
