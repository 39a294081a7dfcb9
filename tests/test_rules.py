"""Unit tests for the plan/rules layer — pure Python, no Spark.

Mirrors the reference's inline suites for filters (src/filters.rs:314-580)
and table rules (src/table_rules.rs:576-858).
"""

import pytest

from database_replicator_spark.plans.rules import (
    QualifiedTable,
    ReplicationFilter,
    RuleConflictError,
    TableRules,
    normalize_time_window,
    quote_ident,
)


class TestQualifiedTable:
    def test_bare_table_gets_public_schema(self):
        qt = QualifiedTable.parse("users")
        assert (qt.database, qt.schema, qt.table) == (None, "public", "users")

    def test_db_table(self):
        qt = QualifiedTable.parse("mydb.users")
        assert (qt.database, qt.schema, qt.table) == ("mydb", "public", "users")

    def test_three_part(self):
        qt = QualifiedTable.parse("mydb.analytics.users")
        assert (qt.database, qt.schema, qt.table) == ("mydb", "analytics", "users")

    @pytest.mark.parametrize("bad", ["", "a.b.c.d", "a..b", ".a"])
    def test_invalid(self, bad):
        with pytest.raises(ValueError):
            QualifiedTable.parse(bad)


class TestTimeWindow:
    @pytest.mark.parametrize(
        "spec,expect",
        [
            ("6 months", (6, "month")),
            ("1 day", (1, "day")),
            ("30 mins", (30, "minute")),
            ("2h", (2, "hour")),
            ("1 yr", (1, "year")),
            ("45 s", (45, "second")),
            ("3 weeks", (3, "week")),
        ],
    )
    def test_units(self, spec, expect):
        assert normalize_time_window(spec) == expect

    @pytest.mark.parametrize("bad", ["0 days", "-1 day", "soon", "1 fortnight", ""])
    def test_invalid(self, bad):
        with pytest.raises(ValueError):
            normalize_time_window(bad)


class TestTableRules:
    def test_time_filter_predicate(self):
        tr = TableRules()
        tr.add_time_filter("mydb.events", "created_at", "6 months")
        pred = tr.predicate_for("mydb", "public", "events")
        assert pred == "\"created_at\" >= NOW() - INTERVAL '6 month'"
        spred = tr.spark_predicate("mydb", "public", "events")
        assert "current_timestamp()" in spred

    def test_predicate_conflicts_with_time_filter(self):
        tr = TableRules()
        tr.add_time_filter("t", "ts", "1 day")
        with pytest.raises(RuleConflictError):
            tr.add_predicate("t", "x > 1")

    def test_schema_only_conflicts(self):
        tr = TableRules()
        tr.add_predicate("t", "x > 1")
        with pytest.raises(RuleConflictError):
            tr.add_schema_only("t")

    def test_db_scope_overrides_global(self):
        tr = TableRules()
        tr.add_predicate("t", "x > 1")          # global scope
        tr.add_predicate("mydb.t", "x > 2")     # db scope
        assert tr.predicate_for("mydb", "public", "t") == "x > 2"
        assert tr.predicate_for("otherdb", "public", "t") == "x > 1"


class TestReplicationFilter:
    def test_include_exclude_mutually_exclusive(self):
        with pytest.raises(RuleConflictError):
            ReplicationFilter(include_databases=["a"], exclude_databases=["b"])

    def test_table_spec_must_be_qualified(self):
        with pytest.raises(RuleConflictError):
            ReplicationFilter(include_tables=["users"])

    def test_system_databases_skipped(self):
        f = ReplicationFilter()
        for db in ["template0", "template1", "postgres", "rdsadmin"]:
            assert not f.should_replicate_database(db)
        assert f.should_replicate_database("mydb")

    def test_include_tables_implies_databases(self):
        f = ReplicationFilter(include_tables=["mydb.users"])
        assert f.should_replicate_database("mydb")
        assert not f.should_replicate_database("otherdb")
        assert f.should_replicate_table("mydb", "users")
        assert not f.should_replicate_table("mydb", "posts")

    def test_exclude_tables(self):
        f = ReplicationFilter(exclude_tables=["mydb.secrets"])
        assert not f.should_replicate_table("mydb", "secrets")
        assert f.should_replicate_table("mydb", "users")

    def test_system_tables_skipped(self):
        f = ReplicationFilter()
        assert not f.should_replicate_table("mydb", "sqlite_sequence")
        assert not f.should_replicate_table("mydb", "t", schema="pg_catalog")

    def test_databases_to_check_sorted_deduped(self):
        f = ReplicationFilter(include_tables=["b.t1", "a.t2", "b.t3"])
        assert f.databases_to_check(["x", "y"]) == ["a", "b"]

    def test_fingerprint_stable_and_sensitive(self):
        f1 = ReplicationFilter(include_databases=["a", "b"])
        f2 = ReplicationFilter(include_databases=["b", "a"])
        f3 = ReplicationFilter(include_databases=["a"])
        assert f1.fingerprint() == f2.fingerprint()
        assert f1.fingerprint() != f3.fingerprint()
        tr = TableRules()
        tr.add_predicate("t", "x > 1")
        f4 = ReplicationFilter(include_databases=["a", "b"], rules=tr)
        assert f4.fingerprint() != f1.fingerprint()


def test_quote_ident():
    assert quote_ident('we"ird') == '"we""ird"'
    assert quote_ident("plain") == '"plain"'
