"""Operator unit tests over small in-memory / sf0.001 DataFrames."""

import pytest
from pyspark.sql import functions as F

from database_replicator_spark.operators.incremental import (
    WatermarkState,
    apply_change_batch,
    detect_wraparound,
    max_watermark,
    merge_upsert,
    read_changes,
)
from database_replicator_spark.operators.latest import latest_by_key
from database_replicator_spark.operators.reconcile import apply_deletes, find_orphans
from database_replicator_spark.operators.snapshot import SnapshotPlan, filtered_copy
from database_replicator_spark.operators.verify import (
    checksum_df,
    strict_checksum_df,
    table_checksum,
)
from database_replicator_spark.plans.rules import ReplicationFilter
from database_replicator_spark.sources.catalog import load_table


@pytest.fixture()
def kv(spark):
    return spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "id int, name string, v int"
    )


class TestFilteredCopy:
    def test_predicate_and_projection(self, kv):
        out = filtered_copy(kv, predicate="v >= 20", columns=["id", "v"])
        assert out.columns == ["id", "v"]
        assert sorted(r["id"] for r in out.collect()) == [2, 3]

    def test_filter_pushed_to_scan(self, spark, sf_dir):
        li = load_table(spark, sf_dir, "lineitem")
        plan = (
            li.select("l_orderkey", "l_quantity")
            .filter(F.col("l_quantity") > 45)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity" in plan


class TestChecksum:
    def test_order_insensitive_and_content_sensitive(self, spark, kv):
        shuffled = kv.orderBy(F.col("v").desc()).repartition(5)
        a = table_checksum(kv)
        b = table_checksum(shuffled)
        assert a == b
        c = table_checksum(kv.withColumn("v", F.col("v") + 1))
        assert a != c

    def test_empty_table(self, spark):
        empty = spark.createDataFrame([], "id int, name string")
        row = checksum_df(empty).collect()[0]
        assert row["checksum"] == "empty" and row["row_count"] == 0
        row = strict_checksum_df(empty).collect()[0]
        assert row["checksum"] == "empty" and row["row_count"] == 0

    def test_strict_matches_regardless_of_partitioning(self, spark, sf_dir):
        orders = load_table(spark, sf_dir, "orders")
        a = strict_checksum_df(orders).collect()[0]
        b = strict_checksum_df(orders.repartition(7)).collect()[0]
        assert a == b


class TestReconcile:
    def test_orphans_and_deletes(self, spark):
        target = spark.createDataFrame([(1,), (2,), (3,), (4,)], "id int")
        source = spark.createDataFrame([(2,), (3,)], "id int")
        orphans = find_orphans(target, source, ["id"])
        assert sorted(r["id"] for r in orphans.collect()) == [1, 4]
        remaining = apply_deletes(target, orphans, ["id"])
        assert sorted(r["id"] for r in remaining.collect()) == [2, 3]


class TestIncremental:
    def test_read_changes_and_watermark(self, kv):
        changes = read_changes(kv, "v", 10)
        assert sorted(r["id"] for r in changes.collect()) == [2, 3]
        assert max_watermark(kv, "v") == 30

    def test_max_watermark_empty(self, spark):
        empty = spark.createDataFrame([], "v int")
        assert max_watermark(empty, "v") is None

    def test_wraparound(self):
        assert detect_wraparound(4_000_000_000, 100)
        assert not detect_wraparound(100, 4_000_000_000)
        assert not detect_wraparound(200, 100)

    def test_merge_upsert(self, spark, kv):
        updates = spark.createDataFrame(
            [(2, "B", 99), (9, "new", 1)], "id int, name string, v int"
        )
        merged = merge_upsert(kv, updates, ["id"])
        got = {r["id"]: (r["name"], r["v"]) for r in merged.collect()}
        assert got == {1: ("a", 10), 2: ("B", 99), 3: ("c", 30), 9: ("new", 1)}

    def test_apply_change_batch(self, spark, kv):
        changes = spark.createDataFrame(
            [
                (2, "B2", 99, "update", 10),
                (2, "B1", 98, "update", 9),   # older version, must lose
                (3, None, None, "delete", 11),
                (9, "new", 1, "insert", 12),
            ],
            "id int, name string, v int, op string, change_id int",
        )
        out = apply_change_batch(kv, changes, ["id"], version_col="change_id")
        got = {r["id"]: (r["name"], r["v"]) for r in out.collect()}
        assert got == {1: ("a", 10), 2: ("B2", 99), 9: ("new", 1)}

    def test_watermark_state_roundtrip(self, tmp_path):
        st = WatermarkState(str(tmp_path / "state.json"))
        assert st.get_watermark("t") is None
        st.advance("t", 42, synced_rows=10)
        st.advance("t", 50, synced_rows=5)
        assert st.get_watermark("t") == 50
        assert st.load()["t"]["synced_rows"] == 15


class TestLatest:
    def test_last_write_wins_with_tiebreak(self, spark):
        df = spark.createDataFrame(
            [(1, 100, "x"), (1, 200, "y"), (1, 200, "z"), (2, 50, "q")],
            "k int, ver int, payload string",
        )
        # tiebreak on payload desc → 'z' wins at ver=200
        out = latest_by_key(df, ["k"], "ver", tiebreak_cols=["payload"])
        got = {r["k"]: (r["ver"], r["payload"]) for r in out.collect()}
        assert got == {1: (200, "z"), 2: (50, "q")}


class TestSnapshotPlan:
    def test_rules_drive_copy(self, spark, tmp_path):
        kv = spark.createDataFrame([(1, 5), (2, 50)], "id int, v int")
        other = spark.createDataFrame([(1, "x")], "id int, s string")
        skipme = spark.createDataFrame([(9,)], "id int")
        f = ReplicationFilter(exclude_tables=["default.skipme"])
        f.rules.add_predicate("default.kv", "v > 10")
        f.rules.add_schema_only("default.other")
        plan = SnapshotPlan(filter=f, database="default")
        res = plan.run(spark, {"kv": kv, "other": other, "skipme": skipme}, str(tmp_path))
        assert res == {"kv": "copied_filtered", "other": "schema_only", "skipme": "skipped"}
        assert spark.read.parquet(str(tmp_path / "kv")).collect()[0]["id"] == 2
        assert spark.read.parquet(str(tmp_path / "other")).count() == 0


class TestReviewRegressions:
    """Pins for the round-1 code-review findings."""

    def test_merge_upsert_propagates_nulls(self, spark):
        """An update that NULLs a column must null the target (coalesce
        would resurrect the base value and diverge from the JDBC
        SET c=EXCLUDED.c semantics)."""
        from database_replicator_spark.operators.incremental import merge_upsert

        base = spark.createDataFrame([(1, "a@x", 5)], "id int, email string, v int")
        updates = spark.createDataFrame([(1, None, 6)], "id int, email string, v int")
        out = merge_upsert(base, updates, ["id"]).collect()[0]
        assert out["email"] is None and out["v"] == 6

    def test_minhash_width_capped_at_int64_safe_bound(self, spark):
        import pytest as _pytest

        from database_replicator_spark.operators.dedup import minhash_signatures

        sh = spark.createDataFrame([(1, "a b c")], "doc_id long, shingle string")
        with _pytest.raises(ValueError, match="int64-safe"):
            minhash_signatures(sh, num_hashes=16)

    def test_null_text_docs_keep_a_shingle(self, spark):
        from database_replicator_spark.operators.dedup import doc_shingles

        docs = spark.createDataFrame(
            [(1, "hello world now"), (2, None)], "doc_id long, text string"
        )
        sh = doc_shingles(docs)
        by_doc = {r["doc_id"] for r in sh.collect()}
        assert by_doc == {1, 2}  # NULL-text doc did not drop out

    def test_salted_agg_constant_value_hot_key(self, spark):
        """All-identical values on the hot key must still aggregate exactly
        (the old value-derived salt put them in ONE bucket; correctness
        held, spreading did not — this pins correctness under the new
        partition-derived salt)."""
        from pyspark.sql import functions as F

        from database_replicator_spark.operators.skew import salted_sum_count

        df = spark.createDataFrame(
            [("hot", 1)] * 5000 + [("cold", 7)], "k string, v int"
        ).repartition(8)
        out = {r["k"]: (r["sum_value"], r["n_rows"]) for r in
               salted_sum_count(df, ["k"], F.col("v")).collect()}
        assert out == {"hot": (5000, 5000), "cold": (7, 1)}

    def test_sync_cycle_respects_rules(self, spark, tmp_path):
        from database_replicator_spark.engine import Engine, ParquetTarget
        from database_replicator_spark.plans.rules import ReplicationFilter

        src = spark.createDataFrame(
            [(1, 3), (2, 30), (3, 40)], "id int, v int"
        )
        f = ReplicationFilter()
        f.rules.add_predicate("default.t", "v >= 10")
        f.rules.add_schema_only("default.s")
        eng = Engine(
            spark=spark,
            source_tables={"t": src, "s": src},
            target=ParquetTarget(str(tmp_path / "tgt")),
            filter=f,
            state_path=str(tmp_path / "st.json"),
        )
        eng.init_snapshot()
        out = eng.sync_cycle("t", "v", ["id"])
        assert out["rows"] == 2  # the v=3 row never syncs
        assert eng.sync_cycle("s", "v", ["id"])["mode"] == "schema_only_skipped"
        assert eng.verify(["t", "s"]) == {
            "t": {"status": "match", "source_rows": 2, "target_rows": 2},
            "s": {"status": "match", "source_rows": 0, "target_rows": 0},
        }

    def test_staging_dirs_cleaned_up(self, spark, tmp_path):
        from database_replicator_spark.engine import Engine, ParquetTarget

        src = spark.createDataFrame([(1, 1)], "id int, v int")
        eng = Engine(
            spark=spark,
            source_tables={"t": src},
            target=ParquetTarget(str(tmp_path / "tgt")),
            state_path=str(tmp_path / "st.json"),
        )
        eng.init_snapshot()
        eng.sync_cycle("t", "v", ["id"])
        eng.sync_cycle("t", "v", ["id"])
        leftovers = [p for p in (tmp_path / "tgt").iterdir() if p.name.endswith(".stage")]
        assert leftovers == []


class TestMysqlParity:
    """S11 parity: case-variant ID candidates + generated_<n> fallback
    (src/mysql/converter.rs:262-276) and INFORMATION_SCHEMA introspection
    SQL (src/mysql/reader.rs:35-46, converter.rs:181-199)."""

    def test_id_case_variants_in_order(self, spark):
        from database_replicator_spark.operators.documents import (
            extract_document_id_mysql,
        )

        df = spark.createDataFrame([(1, "a")], "Id long, v string")
        out, strat = extract_document_id_mysql(df)
        assert strat == "mysql_Id"
        assert out.collect()[0]["_doc_id"] == "1"

        # exact-case: lowercase `id` wins over `ID` when both exist
        df2 = spark.createDataFrame([(1, 2)], "ID long, id long")
        _, strat2 = extract_document_id_mysql(df2)
        assert strat2 == "mysql_id"

    def test_generated_sequential_fallback(self, spark):
        from database_replicator_spark.operators.documents import (
            extract_document_id_mysql,
        )

        df = spark.createDataFrame(
            [("b", 2), ("a", 1), ("c", 3)], "k string, v long"
        )
        out, strat = extract_document_id_mysql(df, order_cols=["k"])
        assert strat == "mysql_generated"
        got = {r["k"]: r["_doc_id"] for r in out.collect()}
        assert got == {"a": "generated_1", "b": "generated_2", "c": "generated_3"}

    def test_no_uniqueness_gate_unlike_sqlite(self, spark):
        from database_replicator_spark.operators.documents import (
            extract_document_id_mysql,
        )

        dup = spark.createDataFrame([(7, "x"), (7, "y")], "id long, v string")
        out, strat = extract_document_id_mysql(dup)
        assert strat == "mysql_id"
        assert [r["_doc_id"] for r in out.collect()] == ["7", "7"]

    def test_introspection_sql_shapes(self):
        from database_replicator_spark.sources.jdbc import (
            mysql_columns_sql,
            mysql_list_tables_sql,
            mysql_primary_key_sql,
        )

        t = mysql_list_tables_sql("shop")
        assert "INFORMATION_SCHEMA.TABLES" in t and "'shop'" in t
        assert "BASE TABLE" in t and "ORDER BY TABLE_NAME" in t

        c = mysql_columns_sql("shop", "orders")
        assert "INFORMATION_SCHEMA.COLUMNS" in c and "'orders'" in c
        assert "ORDER BY ORDINAL_POSITION" in c

        p = mysql_primary_key_sql("shop", "orders")
        assert "KEY_COLUMN_USAGE" in p and "CONSTRAINT_NAME = 'PRIMARY'" in p

    def test_introspection_sql_escapes_quotes(self):
        from database_replicator_spark.sources.jdbc import mysql_list_tables_sql

        assert "'sho''p'" in mysql_list_tables_sql("sho'p")


class TestIdentifierHygiene:
    """Table names are quoted wherever they reach generated SQL, and the
    '::' watermark escape hatch is whitelisted (ADVICE r1)."""

    def test_quote_table_parts(self):
        from database_replicator_spark.sources.jdbc import quote_table

        assert quote_table("orders") == '"orders"'
        assert quote_table("public.orders") == '"public"."orders"'
        assert quote_table('we"ird') == '"we""ird"'
        import pytest as _pytest

        with _pytest.raises(ValueError):
            quote_table("a.b.c.d")
        with _pytest.raises(ValueError):
            quote_table(".orders")

    def test_upsert_delete_quote_table(self):
        from database_replicator_spark.sources.jdbc import (
            build_delete_sql,
            build_upsert_sql,
        )

        up = build_upsert_sql("public.t; DROP TABLE x", ["id"], ["id"], 1)
        assert '"public"."t; DROP TABLE x"' in up  # neutralized, not raw
        de = build_delete_sql("t", ["id"], 2)
        assert 'DELETE FROM "t"' in de

    def test_watermark_whitelist(self):
        import pytest as _pytest

        from database_replicator_spark.sources.jdbc import incremental_query

        ok = incremental_query("t", "xmin::text::bigint", 5)
        assert "xmin::text::bigint > 5" in ok
        with _pytest.raises(ValueError):
            incremental_query("t", "pg_sleep(9)::text", 5)


class TestProfileTable:
    def test_profile_counts_nulls_distincts_minmax(self, spark):
        from database_replicator_spark.operators.estimation import profile_table

        df = spark.createDataFrame(
            [(1, "a", 1.5), (2, None, 2.5), (3, "a", None), (4, "b", 1.5)],
            "id long, s string, x double",
        )
        out = {r["column_name"]: r.asDict() for r in profile_table(df).collect()}
        assert out["id"]["n_rows"] == 4 and out["id"]["n_nulls"] == 0
        assert out["id"]["n_distinct"] == 4
        assert out["s"]["n_nulls"] == 1 and out["s"]["n_distinct"] == 2
        assert out["s"]["min_value"] == "a" and out["s"]["max_value"] == "b"
        assert out["x"]["n_nulls"] == 1 and out["x"]["n_distinct"] == 2
        assert out["x"]["min_value"] == "1.500000"  # canonical %.6f
        assert out["x"]["max_value"] == "2.500000"

    def test_profile_is_single_scan(self, spark):
        from database_replicator_spark.operators.estimation import profile_table

        df = spark.range(100).selectExpr("id", "id % 7 AS m")
        plan = profile_table(df)._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Scan") <= 1  # one pass over the input


class TestConstraintAudit:
    def test_all_constraint_kinds_count_violations(self, spark):
        from pyspark.sql import functions as F

        from database_replicator_spark.operators.verify import constraint_audit

        child = spark.createDataFrame(
            [(1, 10, 5.0), (2, 10, -1.0), (2, None, 3.0), (3, 99, None)],
            "id long, parent_id long, amount double",
        )
        parent = spark.createDataFrame([(10,), (20,)], "pid long")
        out = {
            r["constraint"]: r["n_violations"]
            for r in constraint_audit(
                child,
                unique_cols=["id"],
                not_null_cols=["parent_id"],
                checks={"positive_amount": F.col("amount") > 0},
                fks={"child_parent": (parent, "parent_id", "pid")},
            ).collect()
        }
        assert out["unique:id"] == 1          # id=2 twice → 1 extra row
        assert out["not_null:parent_id"] == 1
        # -1.0 fails, NULL cannot be proven → 2 violations
        assert out["check:positive_amount"] == 2
        # parent 99 missing; NULL parent_id never matches → 2 orphans
        assert out["fk:child_parent"] == 2

    def test_clean_table_all_zero(self, spark):
        from database_replicator_spark.operators.verify import constraint_audit

        df = spark.createDataFrame([(1,), (2,)], "id long")
        out = constraint_audit(df, unique_cols=["id"], not_null_cols=["id"]).collect()
        assert all(r["n_violations"] == 0 for r in out)


class TestFkConsistentSample:
    def test_no_orphans_and_nested_supersets(self, spark):
        from database_replicator_spark.operators.fk import fk_consistent_sample
        from database_replicator_spark.sources.catalog import load_table

        sf = "/root/testdata/sf0.001"
        tables = {
            "customer": load_table(spark, sf, "customer"),
            "orders": load_table(spark, sf, "orders"),
            "lineitem": load_table(spark, sf, "lineitem"),
        }
        edges = [
            ("orders", "o_custkey", "customer", "c_custkey"),
            ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ]

        s = fk_consistent_sample(tables, "customer", "c_custkey", edges, rate=0.3)
        # zero orphans: every sampled order's customer is sampled, every
        # sampled lineitem's order is sampled
        ck = {r["c_custkey"] for r in s["customer"].select("c_custkey").collect()}
        ok = {r["o_orderkey"] for r in s["orders"].select("o_orderkey").collect()}
        assert all(
            r["o_custkey"] in ck for r in s["orders"].select("o_custkey").collect()
        )
        assert all(
            r["l_orderkey"] in ok
            for r in s["lineitem"].select("l_orderkey").collect()
        )
        # completeness: ALL of a sampled customer's orders come along
        total_orders_of_sampled = (
            tables["orders"].filter(F.col("o_custkey").isin(ck)).count()
        )
        assert s["orders"].count() == total_orders_of_sampled

        # nested: raising the rate yields a superset of customers
        s2 = fk_consistent_sample(tables, "customer", "c_custkey", edges, rate=0.6)
        ck2 = {r["c_custkey"] for r in s2["customer"].select("c_custkey").collect()}
        assert ck <= ck2

    def test_unordered_edges_rejected(self, spark):
        import pytest as _pytest

        from database_replicator_spark.operators.fk import fk_consistent_sample
        from database_replicator_spark.sources.catalog import load_table

        sf = "/root/testdata/sf0.001"
        tables = {
            "customer": load_table(spark, sf, "customer"),
            "orders": load_table(spark, sf, "orders"),
            "lineitem": load_table(spark, sf, "lineitem"),
        }
        with _pytest.raises(ValueError, match="topologically"):
            fk_consistent_sample(
                tables, "customer", "c_custkey",
                [("lineitem", "l_orderkey", "orders", "o_orderkey"),
                 ("orders", "o_custkey", "customer", "c_custkey")],
                rate=0.3,
            )


class TestProfileApproximate:
    def test_hll_mode_within_two_pct_and_other_stats_identical(self, spark):
        from database_replicator_spark.operators.estimation import profile_table
        from database_replicator_spark.sources.catalog import load_table

        orders = load_table(spark, "/root/testdata/sf0.001", "orders")
        exact = {r["column_name"]: r for r in profile_table(orders).collect()}
        approx = {
            r["column_name"]: r
            for r in profile_table(orders, approximate=True).collect()
        }
        for c, e in exact.items():
            a = approx[c]
            # everything except n_distinct must be byte-identical
            assert (a["n_rows"], a["n_nulls"], a["min_value"], a["max_value"]) == (
                e["n_rows"], e["n_nulls"], e["min_value"], e["max_value"]
            )
            rel = abs(a["n_distinct"] - e["n_distinct"]) / max(e["n_distinct"], 1)
            assert rel < 0.05, (c, e["n_distinct"], a["n_distinct"])
