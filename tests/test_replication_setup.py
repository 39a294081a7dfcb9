"""S24 logical-replication control plane: publication/subscription SQL
generation, the PG15 predicate gate, and the error taxonomy
(reference src/replication/publication.rs, subscription.rs)."""

import pytest

from database_replicator_spark.plans.rules import ReplicationFilter
from database_replicator_spark.sources.replication import (
    PG15_VERSION_NUM,
    classify_publication_error,
    classify_subscription_error,
    create_publication_sql,
    create_subscription_sql,
    drop_publication_sql,
    drop_subscription_sql,
    list_publications_sql,
    list_subscriptions_sql,
    logical_replication_plan,
    quote_literal,
)

TABLES = [("public", "orders"), ("public", "users"), ("audit", "log")]


class TestPublicationSql:
    def test_unfiltered_is_for_all_tables(self):
        sql = create_publication_sql("my_pub")
        assert sql == 'CREATE PUBLICATION "my_pub" FOR ALL TABLES'

    def test_empty_filter_is_for_all_tables(self):
        sql = create_publication_sql("p", filter=ReplicationFilter())
        assert sql.endswith("FOR ALL TABLES")

    def test_filtered_lists_quoted_tables(self):
        f = ReplicationFilter(exclude_tables=["db.users"])
        sql = create_publication_sql("p", TABLES, db_name="db", filter=f)
        assert sql == (
            'CREATE PUBLICATION "p" FOR TABLE "public"."orders", "audit"."log"'
        )

    def test_schema_only_tables_are_excluded(self):
        f = ReplicationFilter(exclude_tables=["db.nothing"])
        f.rules.add_schema_only("db.users")
        sql = create_publication_sql("p", TABLES, db_name="db", filter=f)
        assert '"users"' not in sql and '"orders"' in sql

    def test_predicate_becomes_where_clause_on_pg15(self):
        f = ReplicationFilter(exclude_tables=["db.nothing"])
        f.rules.add_predicate("db.orders", "status = 'open'")
        sql = create_publication_sql(
            "p", TABLES, db_name="db", filter=f, server_version=PG15_VERSION_NUM
        )
        assert '"public"."orders" WHERE (status = \'open\')' in sql
        # plain tables come first, predicated after (publication.rs:118-124)
        assert sql.index('"users"') < sql.index('"orders" WHERE')

    def test_predicate_rejected_below_pg15(self):
        f = ReplicationFilter(exclude_tables=["db.nothing"])
        f.rules.add_time_filter("db.orders", "created_at", "6 months")
        with pytest.raises(ValueError, match="PostgreSQL 15"):
            create_publication_sql(
                "p", TABLES, db_name="db", filter=f, server_version=140008
            )

    def test_all_tables_filtered_out_raises(self):
        f = ReplicationFilter(include_tables=["db.absent"])
        with pytest.raises(ValueError, match="No tables available"):
            create_publication_sql("p", TABLES, db_name="db", filter=f)

    def test_invalid_publication_name_rejected(self):
        with pytest.raises(ValueError, match="invalid identifier"):
            create_publication_sql('x"; DROP TABLE users; --')

    def test_drop_and_list(self):
        assert drop_publication_sql("p") == 'DROP PUBLICATION IF EXISTS "p"'
        assert "pg_publication" in list_publications_sql()


class TestSubscriptionSql:
    def test_create_quotes_connection_literal(self):
        sql = create_subscription_sql(
            "sub1", "host=src dbname=d password=it's", "pub1"
        )
        assert sql == (
            'CREATE SUBSCRIPTION "sub1" '
            "CONNECTION 'host=src dbname=d password=it''s' "
            'PUBLICATION "pub1"'
        )

    def test_invalid_names_rejected(self):
        with pytest.raises(ValueError):
            create_subscription_sql("bad name", "conn", "pub")
        with pytest.raises(ValueError):
            create_subscription_sql("sub", "conn", "bad pub")

    def test_drop_and_list(self):
        assert drop_subscription_sql("s") == 'DROP SUBSCRIPTION IF EXISTS "s"'
        assert "pg_subscription" in list_subscriptions_sql()

    def test_quote_literal_doubles_quotes(self):
        assert quote_literal("o'brien") == "'o''brien'"


class TestErrorTaxonomy:
    def test_publication_arms(self):
        assert classify_publication_error("pub already exists", "p").code == "ok"
        assert (
            classify_publication_error("ERROR: permission denied for database", "p").code
            == "permission"
        )
        assert (
            classify_publication_error("must be owner of database", "p").code
            == "permission"
        )
        assert (
            classify_publication_error("wal_level is insufficient", "p").code
            == "wal_level"
        )
        assert classify_publication_error("who knows", "p").code == "unknown"

    def test_subscription_arms_in_reference_order(self):
        c = classify_subscription_error
        assert c("already exists", "s", "p").code == "ok"
        assert c("must be superuser to create subscriptions", "s", "p").code == "permission"
        # publication-missing wins over the connection arm even though the
        # message mentions connection (match order, subscription.rs:117-140)
        assert (
            c('publication "p" does not exist on connection', "s", "p").code
            == "publication_missing"
        )
        assert c("could not connect to the publisher", "s", "p").retriable
        assert c("all replication slot slots are in use", "s", "p").code == "replication_slot"
        assert c("???", "s", "p").code == "unknown"


class TestPlan:
    def test_plan_orders_probe_source_target(self):
        plan = logical_replication_plan(
            "pub1", "sub1", "host=src", server_version=160000
        )
        assert plan["source_probe"] == ["SHOW server_version_num"]
        assert plan["source"][0].startswith('CREATE PUBLICATION "pub1"')
        assert plan["target"][0].startswith('CREATE SUBSCRIPTION "sub1"')
