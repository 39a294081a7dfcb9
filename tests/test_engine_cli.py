"""Engine facade + DDL sanitizer tests (the init/sync/verify lifecycle)."""

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from database_replicator_spark.engine import Engine, ParquetTarget
from database_replicator_spark.operators.ddl import (
    create_table_sql,
    remove_restricted_guc_settings,
    remove_superuser_grants,
    remove_tablespace_statements,
    sanitize_create_roles,
    sanitize_globals,
)
from database_replicator_spark.plans.rules import ReplicationFilter


@pytest.fixture()
def engine(spark, tmp_path):
    users = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "id int, name string, seq int"
    )
    posts = spark.createDataFrame([(1, 1, "t1")], "id int, user_id int, title string")
    f = ReplicationFilter()
    f.rules.add_predicate("default.posts", "id >= 1")
    return Engine(
        spark=spark,
        source_tables={"users": users, "posts": posts},
        target=ParquetTarget(str(tmp_path / "tgt")),
        filter=f,
        fk_edges=[("posts", "users")],
        state_path=str(tmp_path / "state.json"),
    )


class TestEngineLifecycle:
    def test_validate_catches_same_endpoint(self, engine):
        assert engine.validate("x", "x") != []
        assert engine.validate("x", "y") == []

    def test_init_sync_reconcile_verify(self, spark, engine, tmp_path):
        # init snapshot (FK order: users before posts)
        results = engine.init_snapshot(checkpoint_path=str(tmp_path / "cp.json"))
        assert results == {"users": "copied", "posts": "copied_filtered"}
        assert engine.verify()["users"]["status"] == "match"

        # first sync with no watermark state reads everything (full sync)
        out = engine.sync_cycle("users", "seq", ["id"])
        assert out["rows"] == 3

        # source gains a row + updates a row → sync cycle picks the delta
        engine.source_tables["users"] = spark.createDataFrame(
            [(1, "a", 10), (2, "B", 40), (3, "c", 30), (4, "d", 50)],
            "id int, name string, seq int",
        )
        out = engine.sync_cycle("users", "seq", ["id"])
        assert out["mode"] == "incremental"
        assert out["rows"] == 2  # seq 40 and 50 are past the old hwm of 30
        tgt = engine.target.read(spark, "users")
        got = {r["id"]: r["name"] for r in tgt.collect()}
        assert got == {1: "a", 2: "B", 3: "c", 4: "d"}

        # source deletes id=1 → reconcile removes it from target
        engine.source_tables["users"] = engine.source_tables["users"].filter("id != 1")
        rec = engine.reconcile("users", ["id"])
        assert rec["deleted"] == 1
        assert engine.verify(["users"])["users"]["status"] == "match"

        # second init resumes from checkpoint without copying
        results = engine.init_snapshot(checkpoint_path=str(tmp_path / "cp.json"))
        assert all(v == "checkpointed" for v in results.values())

    def test_status_reports_state(self, engine, tmp_path):
        engine.init_snapshot()
        engine.sync_cycle("users", "seq", ["id"])
        st = engine.status()
        assert st["tables"]["users"]["last_watermark"] == 30


class TestCli:
    def test_replication_plan_command(self, capsys):
        import json

        from database_replicator_spark import cli

        rc = cli.main(
            ["replication-plan", "--publication", "p1", "--subscription", "s1",
             "--source-conn", "host=src", "--db-name", "db",
             "--publish-table", "public.orders", "--publish-table", "public.users",
             "--schema-only", "db.users", "--server-version", "160000"]
        )
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["ok"]
        assert out["plan"]["source"] == ['CREATE PUBLICATION "p1" FOR TABLE "public"."orders"']
        assert 'CREATE SUBSCRIPTION "s1"' in out["plan"]["target"][0]

    def test_replication_plan_pg15_gate_fails_clean(self, capsys):
        import json

        from database_replicator_spark import cli

        rc = cli.main(
            ["replication-plan", "--publication", "p1", "--subscription", "s1",
             "--source-conn", "c", "--db-name", "db",
             "--publish-table", "public.orders",
             "--table-filter", "orders:x > 1", "--server-version", "140000"]
        )
        assert rc == 2
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert "PostgreSQL 15" in out["error"]

    def test_init_and_verify_roundtrip(self, tmp_path, monkeypatch):
        # CLI spins its own session; run in-process against sf0.001
        from database_replicator_spark import cli

        tgt = str(tmp_path / "out")
        rc = cli.main(
            ["init", "--source", "/root/testdata/sf0.001", "--target", tgt,
             "--table-filter", "lineitem:l_quantity > 45"]
        )
        assert rc == 0
        rc = cli.main(["status", "--target", tgt])
        assert rc == 0


class TestDdl:
    def test_sanitize_create_roles(self):
        out = sanitize_create_roles("CREATE ROLE app;\nSELECT 1;")
        assert out.startswith("DO $$ BEGIN CREATE ROLE app; EXCEPTION")
        assert "SELECT 1;" in out

    def test_superuser_and_guc_and_tablespace(self):
        sql = (
            "ALTER ROLE a WITH SUPERUSER;\n"
            "ALTER ROLE b SET log_statement = 'all';\n"
            "CREATE TABLESPACE ts LOCATION '/x';\n"
            "ALTER ROLE c SET search_path = public;"
        )
        out = sanitize_globals(sql)
        lines = out.splitlines()
        assert lines[0].startswith("-- ")
        assert lines[1].startswith("-- ")
        assert lines[2].startswith("-- ")
        assert not lines[3].startswith("-- ")  # unrestricted GUC survives

    def test_create_table_sql(self):
        schema = T.StructType(
            [
                T.StructField("id", T.LongType(), False),
                T.StructField("name", T.StringType()),
                T.StructField("score", T.DoubleType()),
                T.StructField("tags", T.ArrayType(T.StringType())),
                T.StructField("amount", T.DecimalType(18, 4)),
                T.StructField("meta", T.StructType([T.StructField("k", T.StringType())])),
            ]
        )
        sql = create_table_sql("public.t", schema, pk_cols=["id"])
        assert '"id" BIGINT NOT NULL' in sql
        assert '"tags" TEXT[]' in sql
        assert '"amount" NUMERIC(18,4)' in sql
        assert '"meta" JSONB' in sql
        assert 'PRIMARY KEY ("id")' in sql
        assert sql.startswith("CREATE TABLE IF NOT EXISTS public.t")


class TestSyncDaemon:
    def test_once_cycle_syncs_and_reconciles(self, spark, engine, tmp_path):
        engine.init_snapshot()
        reports = engine.run_sync_daemon(
            {"users": ("seq", ["id"]), "posts": ("id", ["id"])}, once=True
        )
        assert len(reports) == 1
        assert {s["table"] for s in reports[0]["synced"]} == {"users", "posts"}
        assert {r["table"] for r in reports[0]["reconciled"]} == {"users", "posts"}
        assert engine.verify()["users"]["status"] == "match"

    def test_max_cycles_bounds_the_loop(self, spark, engine):
        engine.init_snapshot()
        reports = engine.run_sync_daemon(
            {"users": ("seq", ["id"])}, sync_interval_s=0.01, max_cycles=3
        )
        assert len(reports) == 3


class TestGlobalsManifest:
    """S1 replacement: role manifest round-trips through the S2 sanitizers."""

    ROWS = [
        {"rolname": "app_rw", "rolcanlogin": True, "rolcreatedb": True,
         "grants": ["pg_read_server_files"],
         "settings": {"log_statement": "all", "search_path": "app"}},
        {"rolname": "admin", "rolsuper": True, "rolcanlogin": True},
        {"rolname": "readonly"},
    ]

    def test_manifest_shape_and_export(self, tmp_path):
        import json

        from database_replicator_spark.operators.ddl import (
            export_globals_manifest,
            roles_manifest_sql,
        )

        assert "pg_roles" in roles_manifest_sql()
        p = tmp_path / "globals.json"
        manifest = export_globals_manifest(self.ROWS, str(p))
        assert manifest["kind"] == "globals_manifest"
        assert json.loads(p.read_text()) == manifest
        names = [r["name"] for r in manifest["roles"]]
        assert names == ["app_rw", "admin", "readonly"]

    def test_regenerated_sql_passes_sanitizers(self, tmp_path):
        from database_replicator_spark.operators.ddl import (
            export_globals_manifest,
            manifest_to_globals_sql,
            sanitize_globals,
        )

        manifest = export_globals_manifest(self.ROWS, str(tmp_path / "g.json"))
        sql = manifest_to_globals_sql(manifest)
        # raw SQL has the dangerous statements…
        assert 'ALTER ROLE "admin" WITH SUPERUSER;' in sql
        assert "log_statement" in sql
        assert "pg_read_server_files" in sql

        cleaned = sanitize_globals(sql)
        # …which the sanitizers neutralize:
        for line in cleaned.splitlines():
            if "SUPERUSER" in line or "pg_read_server_files" in line:
                assert line.startswith("-- ")
            if "log_statement" in line:
                assert line.startswith("-- ")
        # CREATE ROLE became idempotent; benign GUC survives
        assert 'DO $$ BEGIN CREATE ROLE "app_rw"' in cleaned
        assert any(
            "search_path" in l and not l.startswith("-- ")
            for l in cleaned.splitlines()
        )


class TestCorpusBuildCli:
    def test_end_to_end_jsonl_to_shards(self, spark, tmp_path, capsys):
        import json as _json
        import os

        src = os.path.join(str(tmp_path), "dump.jsonl")
        with open(src, "w") as f:
            texts = {}
            for i in range(40):
                t = "the quick brown fox jumps over the lazy dog " + " ".join(
                    f"w{i}x{j}" for j in range(12)
                )
                texts[i] = t
                f.write(_json.dumps({"text": t, "lang": "en", "source": f"s{i % 3}"}) + "\n")
            # an exact duplicate, a too-short doc, and a corrupt line
            f.write(_json.dumps({"text": texts[0], "lang": "en", "source": "s0"}) + "\n")
            f.write(_json.dumps({"text": "tiny", "lang": "en", "source": "s0"}) + "\n")
            f.write('{"broken\n')

        from database_replicator_spark.cli import main

        out_dir = os.path.join(str(tmp_path), "built")
        rc = main(["corpus-build", "--source", src, "--out", out_dir, "--budget", "64",
                   "--shards", "4"])
        captured = capsys.readouterr().out.strip().splitlines()[-1]
        rep = _json.loads(captured)
        assert rc == 0 and rep["ok"]
        assert rep["n_corrupt"] == 1
        assert rep["n_quality_rejected"] == 1     # 'tiny'
        assert rep["n_exact_duplicates"] == 1     # content-hash collision
        assert rep["n_ingested"] == 42
        assert rep["n_written"] == 40
        assert sum(rep["split_counts"].values()) == 40

        built = spark.read.parquet(os.path.join(out_dir, "corpus"))
        assert built.count() == 40
        cols = set(built.columns)
        assert {"doc_id", "split", "pack_id", "shard", "pos", "n_tokens"} <= cols
        # shards partitioned on disk
        assert built.select("shard").distinct().count() <= 4


    def test_classifier_threshold_stage_accounts_rejects(
        self, spark, tmp_path, capsys
    ):
        import json as _json
        import os

        src = os.path.join(str(tmp_path), "cls.jsonl")
        with open(src, "w") as f:
            for i in range(30):
                t = "the cat is on a mat and it is fine " + " ".join(
                    f"tok{i}y{j}" for j in range(10)
                )
                f.write(_json.dumps({"text": t, "lang": "en", "source": "s0"}) + "\n")

        from database_replicator_spark.cli import main
        from database_replicator_spark.operators.textops import hashed_linear_score
        from database_replicator_spark.sources.text_corpus import read_jsonl_documents

        # expected rejects straight from the operator on the ingested docs
        docs, _ = read_jsonl_documents(spark, src, text_field="text")
        import pyspark.sql.functions as F
        expected_reject = (
            hashed_linear_score(docs).filter(F.col("score") < 0.0).count()
        )
        assert 0 < expected_reject < 30  # threshold actually separates

        out_dir = os.path.join(str(tmp_path), "built_cls")
        rc = main(["corpus-build", "--source", src, "--out", out_dir,
                   "--budget", "64", "--shards", "2", "--min-tokens", "3",
                   "--classifier-threshold", "0.0"])
        rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rc == 0 and rep["ok"]
        assert rep["n_classifier_rejected"] == expected_reject
        assert rep["n_written"] == 30 - expected_reject

        # threshold below the score floor (weights are in [-1,1]) keeps all
        out_dir2 = os.path.join(str(tmp_path), "built_cls2")
        rc = main(["corpus-build", "--source", src, "--out", out_dir2,
                   "--budget", "64", "--shards", "2", "--min-tokens", "3",
                   "--classifier-threshold", "-1.5"])
        rep2 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rc == 0 and rep2["n_classifier_rejected"] == 0


    def test_export_jsonl_shards_with_manifest(self, spark, tmp_path, capsys):
        import gzip
        import glob as _glob
        import json as _json
        import os

        src = os.path.join(str(tmp_path), "exp.jsonl")
        with open(src, "w") as f:
            for i in range(20):
                t = "the cat is on a mat and it is fine " + " ".join(
                    f"e{i}z{j}" for j in range(8)
                )
                f.write(_json.dumps({"text": t, "lang": "en", "source": "s0"}) + "\n")

        from database_replicator_spark.cli import main

        out_dir = os.path.join(str(tmp_path), "built_exp")
        rc = main(["corpus-build", "--source", src, "--out", out_dir,
                   "--budget", "64", "--shards", "3", "--min-tokens", "3",
                   "--export-jsonl"])
        rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rc == 0 and rep["ok"]
        man = rep["jsonl_manifest"]
        assert man["n_shards"] == 3
        assert sum(s["n_rows"] for s in man["shards"]) == rep["n_written"] == 20
        assert sum(s["n_tokens"] for s in man["shards"]) == rep["total_tokens"]
        # stage timings present for every mandatory stage
        assert {"ingest", "exact_dedup", "quality", "pack_shuffle_write",
                "export_jsonl"} <= set(rep["stage_seconds"])

        # the gzipped shards round-trip: every doc readable, pos-ordered
        files = _glob.glob(os.path.join(out_dir, "shards", "shard=*", "*.json.gz"))
        assert files
        rows = []
        for fp in files:
            with gzip.open(fp, "rt") as fh:
                rows += [_json.loads(line) for line in fh]
        assert len(rows) == 20
        assert all("text" in r and "pos" in r for r in rows)
        # manifest matches a direct re-read through Spark too
        back = spark.read.json(os.path.join(out_dir, "shards"))
        assert back.count() == 20


class TestDatasheetCli:
    def test_datasheet_over_fixture_documents(self, spark, capsys):
        import json as _json

        from database_replicator_spark.cli import main

        rc = main(["datasheet", "--source", "/root/testdata/sf0.001"])
        out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rc == 0 and out["ok"]
        assert out["n_docs"] == 500
        assert out["total_tokens"] > 0
        assert abs(sum(v["doc_share"] for v in out["per_source"].values()) - 1.0) < 1e-6
        assert sum(out["per_lang"].values()) == 500
        p = out["token_percentiles"]
        assert p["p10"] <= p["p50"] <= p["p90"]
        assert 0 <= out["duplicate_rate"] <= 1
        assert 0 <= out["quality_keep_rate"] <= 1
        # rejects + keeps account for every doc
        assert sum(out["quality_reject_reasons"].values()) == round(
            500 * (1 - out["quality_keep_rate"])
        )

    def test_embeddings_section(self, spark, capsys):
        import json as _json

        from database_replicator_spark.cli import main

        rc = main(["datasheet", "--source", "/root/testdata/sf0.001",
                   "--embeddings"])
        out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rc == 0 and out["ok"]
        e = out["embeddings"]
        assert e["n_vectors"] == 500
        assert e["n_dims_seen"] == 1 and e["dim_min"] == e["dim_max"] == 64
        assert e["n_degenerate"] == 0
        assert 0 < e["norm_min"] <= e["norm_p50"] <= e["norm_max"]
        assert sum(e["per_label"].values()) == 500

    def test_approximate_mode_close_to_exact(self, spark, capsys):
        import json as _json

        from database_replicator_spark.cli import main

        main(["datasheet", "--source", "/root/testdata/sf0.001"])
        exact = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        main(["datasheet", "--source", "/root/testdata/sf0.001", "--approximate"])
        approx = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert approx["ok"]
        # KMV (k=256) over ~500 distincts runs the estimator path; the
        # standard error is ~1/sqrt(k) ≈ 6% — hold it to 10%
        rel = abs(
            approx["distinct_fingerprints"] - exact["distinct_fingerprints"]
        ) / exact["distinct_fingerprints"]
        assert rel < 0.10, (approx["distinct_fingerprints"], exact["distinct_fingerprints"])
        # approx percentiles stay within a token of exact on this fixture
        for q in ("p10", "p50", "p90"):
            assert abs(approx["token_percentiles"][q] - exact["token_percentiles"][q]) <= 2


class TestExplainCli:
    def test_explain_prints_formatted_plan(self, spark, capsys):
        from database_replicator_spark.cli import main

        rc = main(["explain", "--query", "pricing_summary",
                   "--source", "/root/testdata/sf0.001"])
        out = capsys.readouterr().out
        assert rc == 0
        assert "== Physical Plan ==" in out
        assert "PushedFilters" in out

    def test_unknown_query_suggests_names(self, spark, capsys):
        import json as _json

        from database_replicator_spark.cli import main

        rc = main(["explain", "--query", "pricing_sumary"])
        out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rc == 2 and not out["ok"]
        assert "pricing_summary" in out["did_you_mean"]


class TestDiffCli:
    def test_diff_reports_divergence_kinds(self, spark, tmp_path, capsys):
        import json as _json
        import os

        from database_replicator_spark.cli import main
        from database_replicator_spark.sources.catalog import load_table

        src_dir = str(tmp_path / "src")
        tgt_dir = str(tmp_path / "tgt")
        os.makedirs(src_dir)
        os.makedirs(tgt_dir)
        orders = load_table(spark, "/root/testdata/sf0.001", "orders")
        orders.write.parquet(os.path.join(src_dir, "orders.parquet"))
        # target: drop one key, mutate one, add one
        mut = (
            orders.filter(F.col("o_orderkey") != 1)
            .withColumn(
                "o_totalprice",
                F.when(F.col("o_orderkey") == 2, F.lit(0.0)).otherwise(
                    F.col("o_totalprice")
                ),
            )
        )
        extra = orders.limit(1).withColumn(
            "o_orderkey", F.col("o_orderkey") + 999999
        )
        mut.unionByName(extra).write.parquet(os.path.join(tgt_dir, "orders.parquet"))

        rc = main(["diff", "--source", src_dir, "--target", tgt_dir,
                   "--table", "orders", "--pk", "o_orderkey"])
        out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rc == 1 and out["ok"]
        assert out["counts"] == {
            "missing_in_target": 1, "mismatch": 1, "extra_in_target": 1
        }

    def test_identical_tables_exit_zero(self, spark, tmp_path, capsys):
        import json as _json
        import os

        from database_replicator_spark.cli import main
        from database_replicator_spark.sources.catalog import load_table

        d = str(tmp_path / "same")
        os.makedirs(d)
        load_table(spark, "/root/testdata/sf0.001", "region").write.parquet(
            os.path.join(d, "region.parquet")
        )
        rc = main(["diff", "--source", d, "--target", d,
                   "--table", "region", "--pk", "r_regionkey"])
        out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rc == 0 and out["ok"] and out["counts"] == {}


    def test_prefer_source_keeps_curated_cluster_member(
        self, spark, tmp_path, capsys
    ):
        import json as _json
        import os

        src = os.path.join(str(tmp_path), "pref.jsonl")
        base = "the cat is on a mat and it is fine w1 w2 w3 w4 w5 w6 w7 w8"
        with open(src, "w") as f:
            # two near-identical docs, different sources (crawl id sorts
            # first alphabetically in content-hash space — unknown, so the
            # test derives which doc survives from the report)
            f.write(_json.dumps({"text": base + " crawlmark", "lang": "en",
                                 "source": "crawl"}) + "\n")
            f.write(_json.dumps({"text": base + " curatedmark", "lang": "en",
                                 "source": "curated"}) + "\n")
            for i in range(10):  # filler docs: only 'the'/'is' shared, so
                # pairwise Jaccard stays far below the 0.2 threshold
                f.write(_json.dumps({
                    "text": f"the f{i}a is " + " ".join(
                        f"f{i}x{j}" for j in range(10)),
                    "lang": "en", "source": "crawl"}) + "\n")

        from database_replicator_spark.cli import main

        out_dir = os.path.join(str(tmp_path), "built_pref")
        rc = main(["corpus-build", "--source", src, "--out", out_dir,
                   "--budget", "64", "--shards", "2", "--min-tokens", "3",
                   "--near-dup",
                   "--prefer-source", "curated=0", "--prefer-source", "crawl=1"])
        rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rc == 0 and rep["ok"]
        assert rep["n_neardup_removed"] == 1
        built = spark.read.parquet(os.path.join(out_dir, "corpus"))
        kept_sources = {r["source"] for r in built.select("source").collect()}
        # the curated twin survived the cluster
        texts = [r["text"] for r in built.select("text").collect()]
        assert any("curatedmark" in t for t in texts)
        assert not any("crawlmark" in t for t in texts)
        assert "curated" in kept_sources


class TestSampleCli:
    def test_fixture_sample_writes_consistent_tables(self, spark, tmp_path, capsys):
        import json as _json
        import os

        from database_replicator_spark.cli import main

        tgt = str(tmp_path / "fixture")
        rc = main(["sample", "--source", "/root/testdata/sf0.001",
                   "--target", tgt,
                   "--root", "customer", "--root-key", "c_custkey",
                   "--edge", "orders.o_custkey=customer.c_custkey",
                   "--edge", "lineitem.l_orderkey=orders.o_orderkey",
                   "--rate", "0.2"])
        out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rc == 0 and out["ok"]
        assert set(out["row_counts"]) == {"customer", "orders", "lineitem"}
        # written fixture joins cleanly: zero orphaned orders
        cust = spark.read.parquet(os.path.join(tgt, "customer.parquet"))
        orders = spark.read.parquet(os.path.join(tgt, "orders.parquet"))
        orphans = orders.join(
            cust, orders["o_custkey"] == cust["c_custkey"], "left_anti"
        ).count()
        assert orphans == 0
        assert orders.count() == out["row_counts"]["orders"]


    def test_datasheet_flag_writes_card_over_built_corpus(
        self, spark, tmp_path, capsys
    ):
        import json as _json
        import os

        src = os.path.join(str(tmp_path), "ds.jsonl")
        with open(src, "w") as f:
            for i in range(15):
                t = "the cat is on a mat and it is fine " + " ".join(
                    f"d{i}q{j}" for j in range(8)
                )
                f.write(_json.dumps({"text": t, "lang": "en", "source": "s0"}) + "\n")

        from database_replicator_spark.cli import main

        out_dir = os.path.join(str(tmp_path), "built_ds")
        rc = main(["corpus-build", "--source", src, "--out", out_dir,
                   "--budget", "64", "--shards", "2", "--min-tokens", "3",
                   "--datasheet"])
        rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rc == 0 and rep["ok"]
        assert rep["datasheet"]["n_docs"] == rep["n_written"] == 15
        with open(os.path.join(out_dir, "datasheet.json")) as fh:
            card = _json.load(fh)
        assert card["n_docs"] == 15
        assert "datasheet" in rep["stage_seconds"]


    def test_build_is_bit_deterministic_across_runs(self, spark, tmp_path, capsys):
        """Two corpus-build runs over the same input must produce
        checksum-identical corpora — the whole-pipeline determinism claim
        (content-hash ids, hash-threshold draws, seeded shuffles; no RNG
        state anywhere)."""
        import json as _json
        import os

        from database_replicator_spark.cli import main
        from database_replicator_spark.operators.verify import table_checksum

        src = os.path.join(str(tmp_path), "det.jsonl")
        with open(src, "w") as f:
            for i in range(25):
                t = "the cat is on a mat and it is fine " + " ".join(
                    f"x{i}v{j}" for j in range(9)
                )
                f.write(_json.dumps({"text": t, "lang": "en",
                                     "source": f"s{i % 2}"}) + "\n")

        sums = []
        for run in ("a", "b"):
            out_dir = os.path.join(str(tmp_path), f"built_{run}")
            rc = main(["corpus-build", "--source", src, "--out", out_dir,
                       "--budget", "64", "--shards", "3", "--min-tokens", "3",
                       "--temperature", "0.7", "--seed", "5"])
            rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
            assert rc == 0 and rep["ok"]
            df = spark.read.parquet(os.path.join(out_dir, "corpus"))
            sums.append(table_checksum(df))
        assert sums[0] == sums[1]


    def test_chunk_dedup_stage_removes_internal_boilerplate(
        self, spark, tmp_path, capsys
    ):
        import json as _json
        import os

        nav = " ".join(f"the nav{i} is here" for i in range(5))  # 20 words
        src = os.path.join(str(tmp_path), "cd.jsonl")
        with open(src, "w") as f:
            # doc 0 repeats its nav block; others are clean
            body = " ".join(f"z0b{j}" for j in range(20))
            f.write(_json.dumps({"text": " ".join([nav, body, nav]),
                                 "lang": "en", "source": "s0"}) + "\n")
            for i in range(1, 10):
                t = "the cat is on a mat and it is fine " + " ".join(
                    f"cd{i}w{j}" for j in range(9)
                )
                f.write(_json.dumps({"text": t, "lang": "en",
                                     "source": "s0"}) + "\n")

        from database_replicator_spark.cli import main

        out_dir = os.path.join(str(tmp_path), "built_cd")
        rc = main(["corpus-build", "--source", src, "--out", out_dir,
                   "--budget", "64", "--shards", "2", "--min-tokens", "3",
                   "--chunk-dedup"])
        rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rc == 0 and rep["ok"]
        assert rep["n_chunk_dedup_docs"] == 1
        built = spark.read.parquet(os.path.join(out_dir, "corpus"))
        texts = [r["text"] for r in built.collect()]
        assert any(t.count("nav0") == 1 for t in texts)  # repeat removed


    def test_all_stages_compose(self, spark, tmp_path, capsys):
        """Kitchen sink: every optional stage enabled at once — the
        interactions (column collisions, checkpoint chains, accounting
        keys) are what this pins, not any single stage's math."""
        import json as _json
        import os

        nav = " ".join(f"the nv{i} is set" for i in range(5))  # 20 words
        src = os.path.join(str(tmp_path), "ks.jsonl")
        base = "the cat is on a mat and it is fine"
        with open(src, "w") as f:
            # near-dup twins across sources (the ONLY docs sharing text:
            # bulk docs interleave stopwords with unique tokens so every
            # shingle carries a unique token — no accidental clustering)
            f.write(_json.dumps({"text": base + " twinmark alpha",
                                 "lang": "en", "source": "crawl"}) + "\n")
            f.write(_json.dumps({"text": base + " twinmark beta",
                                 "lang": "en", "source": "curated"}) + "\n")
            # a doc with internal boilerplate repetition
            body = " ".join(f"ksb{j}" for j in range(20))
            f.write(_json.dumps({"text": " ".join([nav, body, nav]),
                                 "lang": "en", "source": "crawl"}) + "\n")
            # bulk docs across two sources
            for i in range(20):
                t = " ".join(
                    f"the ks{i}w{j} is ks{i}x{j} it" for j in range(4)
                )
                f.write(_json.dumps({"text": t, "lang": "en",
                                     "source": "crawl" if i % 2 else "curated"})
                        + "\n")
            f.write('{"broken\n')

        from database_replicator_spark.cli import main

        out_dir = os.path.join(str(tmp_path), "built_ks")
        rc = main(["corpus-build", "--source", src, "--out", out_dir,
                   "--budget", "64", "--shards", "3", "--min-tokens", "3",
                   "--near-dup", "--span-mask", "--chunk-dedup",
                   "--classifier-threshold", "-1.5",
                   "--temperature", "0.7", "--seed", "3",
                   "--prefer-source", "curated=0", "--prefer-source", "crawl=1",
                   "--export-jsonl", "--datasheet"])
        rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rc == 0 and rep["ok"], rep
        # accounting identity: every ingested doc lands in exactly one bucket
        assert rep["n_ingested"] == (
            rep["n_exact_duplicates"] + rep["n_quality_rejected"]
            + rep["n_classifier_rejected"] + rep["n_neardup_removed"]
            + rep["n_over_token_budget"] + rep["n_downsampled"]
            + rep["n_written"]
        )
        assert rep["n_corrupt"] == 1
        assert rep["n_neardup_removed"] == 1  # exactly the twin cluster
        # stage timing keys for every enabled stage
        assert {"ingest", "exact_dedup", "quality", "classifier", "near_dup",
                "span_mask", "chunk_dedup", "temperature_mix",
                "pack_shuffle_write", "export_jsonl", "datasheet"} <= set(
            rep["stage_seconds"]
        )
        # artifacts all present and consistent
        built = spark.read.parquet(os.path.join(out_dir, "corpus"))
        assert built.count() == rep["n_written"]
        man = rep["jsonl_manifest"]
        assert sum(sh["n_rows"] for sh in man["shards"]) == rep["n_written"]
        assert rep["datasheet"]["n_docs"] == rep["n_written"]
        # prefer-source kept the curated twin
        texts = [r["text"] for r in built.collect()]
        assert any("twinmark beta" in t for t in texts)
        assert not any("twinmark alpha" in t for t in texts)


class TestProfileCli:
    def test_profile_command_emits_per_table_stats(self, spark, capsys):
        import json as _json

        from database_replicator_spark.cli import main

        rc = main(["profile", "--source", "/root/testdata/sf0.001",
                   "--table", "region", "--table", "nation"])
        out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rc == 0 and out["ok"]
        assert set(out["profiles"]) == {"region", "nation"}
        region = {r["column_name"]: r for r in out["profiles"]["region"]}
        assert region["r_regionkey"]["n_rows"] == 5
        assert region["r_regionkey"]["n_distinct"] == 5
        assert region["r_regionkey"]["n_nulls"] == 0

    def test_profile_percentiles_flag(self, spark, capsys):
        import json as _json

        from database_replicator_spark.cli import main

        rc = main(["profile", "--source", "/root/testdata/sf0.001",
                   "--table", "nation", "--percentiles"])
        out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rc == 0 and out["ok"]
        pct = {r["column_name"]: r for r in out["percentiles"]["nation"]}
        # 25 nation keys 0..24: ceil-rank order statistics, exact regime
        assert pct["n_nationkey"]["n"] == 25
        assert pct["n_nationkey"]["p50"] == 12.0  # rank ceil(12.5)=13 → key 12
        assert pct["n_nationkey"]["p99"] == 24.0


class TestCorpusBuildNearDup:
    def test_near_dup_cluster_collapses_to_survivor(self, spark, tmp_path, capsys):
        import json as _json
        import os

        base = ("the quick brown fox jumps over the lazy dog while many other "
                "animals watch from a safe distance in the forest clearing")
        variant = base.replace("safe distance", "safe spot")  # near-dup of base
        distinct = ("an entirely different piece of text about databases and "
                    "replication strategies for large analytical clusters today")
        src = os.path.join(str(tmp_path), "nd.jsonl")
        with open(src, "w") as f:
            for t in (base, variant, distinct):
                f.write(_json.dumps({"text": t, "lang": "en", "source": "s"}) + "\n")

        from database_replicator_spark.cli import main

        out_dir = os.path.join(str(tmp_path), "built")
        rc = main(["corpus-build", "--source", src, "--out", out_dir,
                   "--near-dup", "--shards", "2", "--budget", "64"])
        rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rc == 0 and rep["ok"]
        assert rep["n_neardup_removed"] == 1
        assert rep["n_written"] == 2


class TestCorpusBuildSpanMaskAndBudget:
    def test_span_mask_strips_shared_boilerplate(self, spark, tmp_path, capsys):
        import json as _json
        import os

        boiler = "subscribe to our newsletter for updates every single day"  # 9 words
        src = os.path.join(str(tmp_path), "sm.jsonl")
        with open(src, "w") as f:
            for i in range(3):
                uniq = " ".join(f"doc{i}word{j}" for j in range(20))
                f.write(_json.dumps({"text": f"{boiler} {uniq}",
                                     "lang": "en", "source": "s"}) + "\n")

        from database_replicator_spark.cli import main

        out_dir = os.path.join(str(tmp_path), "built")
        rc = main(["corpus-build", "--source", src, "--out", out_dir,
                   "--span-mask", "--shards", "2", "--budget", "64"])
        rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rc == 0 and rep["ok"]
        assert rep["n_span_masked_docs"] == 3
        assert rep["n_span_words_dropped"] == 27  # 9-word boilerplate × 3 docs

        built = spark.read.parquet(os.path.join(out_dir, "corpus"))
        texts = [r["text"] for r in built.collect()]
        assert all("subscribe" not in t for t in texts)
        assert all("doc0word0" in t for t in texts if "doc0" in t)

    def test_token_budget_keeps_best_first(self, spark, tmp_path, capsys):
        import json as _json
        import os

        src = os.path.join(str(tmp_path), "tb.jsonl")
        with open(src, "w") as f:
            # 10 docs × 20 tokens = 200 tokens; all pass the quality rules
            # (stopwords present, max token share ≤ 10%); the first five are
            # fully distinct (diversity 1.0), the rest half-distinct (0.5)
            for i in range(10):
                if i < 5:
                    words = [f"d{i}w{j}" for j in range(18)] + ["the", "of"]
                else:
                    words = ([f"d{i}w{j}" for j in range(8)] + ["the", "of"]) * 2
                f.write(_json.dumps({"text": " ".join(words),
                                     "lang": "en", "source": "s"}) + "\n")

        from database_replicator_spark.cli import main

        out_dir = os.path.join(str(tmp_path), "built")
        rc = main(["corpus-build", "--source", src, "--out", out_dir,
                   "--token-budget", "100", "--shards", "2", "--budget", "64",
                   "--min-tokens", "5"])
        rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rc == 0 and rep["ok"]
        assert rep["n_over_token_budget"] == 5
        assert rep["n_written"] == 5
        assert rep["total_tokens"] == 100

        built = spark.read.parquet(os.path.join(out_dir, "corpus"))
        # exactly the five lexically-diverse docs survive
        kept = [r["text"].split()[0][:2] for r in built.collect()]
        assert all(k in {"d0", "d1", "d2", "d3", "d4"} for k in kept)


class TestAuditCli:
    def test_audit_clean_and_violating(self, spark, capsys):
        import json as _json

        from database_replicator_spark.cli import main

        rc = main(["audit", "--source", "/root/testdata/sf0.001",
                   "--table", "orders",
                   "--unique", "o_orderkey",
                   "--not-null", "o_custkey",
                   "--check", "positive_price:o_totalprice > 0",
                   "--fk", "o_custkey:customer.c_custkey",
                   "--fail-on-violation"])
        out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rc == 0 and out["ok"] and out["total_violations"] == 0
        names = {r["constraint"] for r in out["audit"]}
        assert names == {"unique:o_orderkey", "not_null:o_custkey",
                         "check:positive_price", "fk:o_custkey->customer.c_custkey"}

        # a failing CHECK flips the exit code in gate mode
        rc = main(["audit", "--source", "/root/testdata/sf0.001",
                   "--table", "orders",
                   "--check", "impossible:o_totalprice < 0",
                   "--fail-on-violation"])
        out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rc == 1 and out["ok"] and out["total_violations"] > 0


class TestSqlVerb:
    def test_sql_select_rows(self, spark, capsys):
        import json

        from database_replicator_spark import cli

        rc = cli.main(
            ["sql", "--source", "/root/testdata/sf0.001",
             "--query",
             "SELECT n_name, COUNT(*) AS n FROM nation GROUP BY 1 ORDER BY 1",
             "--limit", "3"]
        )
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["ok"] and out["columns"] == ["n_name", "n"]
        assert out["n_printed"] == 3

    def test_sql_joins_views_and_writes_out(self, spark, capsys, tmp_path):
        import json

        from database_replicator_spark import cli

        dest = str(tmp_path / "rev")
        rc = cli.main(
            ["sql", "--source", "/root/testdata/sf0.001",
             "--query",
             "SELECT o_orderpriority, SUM(o_totalprice) AS total "
             "FROM orders JOIN customer ON o_custkey = c_custkey "
             "GROUP BY 1",
             "--out", dest]
        )
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["ok"] and out["out"] == dest
        back = spark.read.parquet(dest)
        assert back.count() == 5 and set(back.columns) == {"o_orderpriority", "total"}

    def test_sql_error_is_clean_json(self, spark, capsys):
        import json

        from database_replicator_spark import cli

        rc = cli.main(
            ["sql", "--source", "/root/testdata/sf0.001",
             "--query", "SELECT * FROM no_such_table"]
        )
        assert rc == 2
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert not out["ok"] and "error" in out


class TestIngestVerbs:
    GOOD = (
        "a reasonably long and perfectly ordinary document about data "
        "replication systems and the analytics people run on them daily"
    )
    GOOD2 = (
        "a different document about the state of databases and the many "
        "ways in which they replicate data for analytical workloads"
    )

    def test_corpus_ingest_verb_drains_queue(self, spark, capsys, tmp_path):
        import json as _json
        import os as _os

        from database_replicator_spark import cli

        src = str(tmp_path / "queue")
        _os.makedirs(src)
        with open(_os.path.join(src, "b1.json"), "w") as fh:
            for i, text in [(1, self.GOOD), (2, self.GOOD), (3, "tiny"),
                            (4, self.GOOD2)]:
                fh.write(_json.dumps(
                    {"doc_id": i, "text": text, "lang": "en", "source": "cc"}
                ) + "\n")
        rc = cli.main(
            ["corpus-ingest", "--source", src,
             "--target", str(tmp_path / "tgt"),
             "--checkpoint", str(tmp_path / "chk")]
        )
        assert rc == 0
        out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        # doc 2 is a within-batch dup, doc 3 fails quality -> 2 accepted
        assert out["ok"] and out["corpus_rows"] == 2

        # ingest-status verb: the ST7-style per-tier rollup over the
        # _ingest_stats partitions the drain just wrote
        rc = cli.main(["ingest-status", "--target", str(tmp_path / "tgt")])
        assert rc == 0
        st = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert st["ok"] and st["epochs"] == 1
        assert st["totals"]["n_in"] == 4
        assert st["totals"]["n_quality_rejected"] == 1
        assert st["totals"]["n_dup_in_batch"] == 1
        assert st["totals"]["n_accepted"] == 2
        assert st["totals"]["seconds"] > 0

    def test_embed_ingest_verb_pq_mode(self, spark, capsys, tmp_path):
        import json as _json
        import math

        from database_replicator_spark import cli

        src = str(tmp_path / "equeue")
        rows = [
            (i, [float(math.sin(i * 1.7 + d)) for d in range(8)])
            for i in range(1, 7)
        ]
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"
        ).write.parquet(src)
        rc = cli.main(
            ["embed-ingest", "--source", src,
             "--target", str(tmp_path / "etgt"),
             "--checkpoint", str(tmp_path / "echk"),
             "--dim", "8", "--pq"]
        )
        assert rc == 0
        out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["ok"] and out["index_rows"] == 6


class TestAnnVerb:
    def test_ann_exact_and_ivfpq(self, spark, capsys):
        import json as _json

        from database_replicator_spark import cli

        for method in ("exact", "ivfpq"):
            rc = cli.main(
                ["ann", "--source", "/root/testdata/sf0.001",
                 "--query-ids", "0,1", "--k", "5", "--method", method,
                 "--quantizer", "sample", "--ksub", "16"]
            )
            assert rc == 0
            out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
            assert out["ok"] and out["method"] == method
            assert len(out["rows"]) == 10  # 2 queries x k=5
            ranks = {r["rank"] for r in out["rows"]}
            assert ranks == {1, 2, 3, 4, 5}


class TestRetrieveVerb:
    def test_bm25_free_text_and_hybrid_qbe(self, spark, capsys):
        import json as _json

        from database_replicator_spark import cli

        rc = cli.main(
            ["retrieve", "--source", "/root/testdata/sf0.001",
             "--query", "dup merge batch", "--query", "spark window",
             "--k", "5", "--method", "bm25"]
        )
        assert rc == 0
        out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["ok"] and out["method"] == "bm25"
        assert out["n_rows"] == 10  # 2 queries x k=5
        assert {r["rank"] for r in out["rows"]} == {1, 2, 3, 4, 5}

        rc = cli.main(
            ["retrieve", "--source", "/root/testdata/sf0.001",
             "--query-doc-ids", "0,1", "--k", "5", "--method", "hybrid",
             "--with-dense"]
        )
        assert rc == 0
        out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["ok"] and out["n_rows"] == 10
        for r in out["rows"]:
            assert r["doc_id"] != r["query_id"]          # self excluded
            assert {"bm25_rank", "ql_rank", "dense_rank"} <= set(r)

    def test_query_mode_exclusivity(self, capsys):
        import json as _json

        from database_replicator_spark import cli

        rc = cli.main(
            ["retrieve", "--source", "/root/testdata/sf0.001"]
        )
        out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rc == 2 and not out["ok"]


class TestPagerankVerb:
    def test_global_and_personalized(self, spark, capsys):
        import json as _json

        from database_replicator_spark import cli

        rc = cli.main(
            ["pagerank", "--source", "/root/testdata/sf0.001",
             "--top", "5"]
        )
        assert rc == 0
        out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["ok"] and not out["personalized"]
        assert len(out["rows"]) == 5
        assert [r["rank"] for r in out["rows"]] == [1, 2, 3, 4, 5]
        seed = out["rows"][0]["node"]

        rc = cli.main(
            ["pagerank", "--source", "/root/testdata/sf0.001",
             "--top", "5", "--seeds", str(seed)]
        )
        assert rc == 0
        out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["ok"] and out["personalized"]
        # teleport mass is anchored at the seed's neighborhood: the seed
        # itself must surface in the personalized head
        assert any(r["node"] == seed for r in out["rows"])


class TestRetrieveVerbR9:
    def test_tfidf_jm_and_weighted_hybrid(self, spark, capsys):
        import json as _json

        from database_replicator_spark import cli

        for method in ("tfidf", "jm"):
            rc = cli.main(
                ["retrieve", "--source", "/root/testdata/sf0.001",
                 "--query", "dup merge batch", "--k", "5",
                 "--method", method]
            )
            assert rc == 0
            out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
            assert out["ok"] and out["method"] == method
            assert out["n_rows"] == 5
            assert [r["rank"] for r in out["rows"]] == [1, 2, 3, 4, 5]

        rc = cli.main(
            ["retrieve", "--source", "/root/testdata/sf0.001",
             "--query-doc-ids", "0,1", "--k", "5", "--method", "hybrid",
             "--weights", "2,1"]
        )
        assert rc == 0
        out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["ok"] and out["n_rows"] == 10

    def test_prf_free_text_and_qbe_rejection(self, spark, capsys):
        import json as _json

        from database_replicator_spark import cli

        rc = cli.main(
            ["retrieve", "--source", "/root/testdata/sf0.001",
             "--query", "dup merge", "--k", "5", "--method", "prf"]
        )
        assert rc == 0
        out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["ok"] and out["n_rows"] == 5

        rc = cli.main(
            ["retrieve", "--source", "/root/testdata/sf0.001",
             "--query-doc-ids", "0", "--method", "prf"]
        )
        out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rc == 2 and not out["ok"]

    def test_weights_arity_error(self, spark, capsys):
        import json as _json

        from database_replicator_spark import cli

        rc = cli.main(
            ["retrieve", "--source", "/root/testdata/sf0.001",
             "--query-doc-ids", "0", "--method", "hybrid",
             "--weights", "1,2,3"]
        )
        out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rc == 2 and not out["ok"] and "--weights" in out["error"]


class TestGraphVerbsR9:
    def test_weighted_pagerank(self, spark, capsys):
        import json as _json

        from database_replicator_spark import cli

        rc = cli.main(
            ["pagerank", "--source", "/root/testdata/sf0.001",
             "--top", "5", "--weighted"]
        )
        assert rc == 0
        out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["ok"] and out["weighted"]
        assert len(out["rows"]) == 5

    def test_hits(self, spark, capsys):
        import json as _json

        from database_replicator_spark import cli

        rc = cli.main(
            ["hits", "--source", "/root/testdata/sf0.001", "--top", "5"]
        )
        assert rc == 0
        out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["ok"]
        assert len(out["authorities"]) == 5 and len(out["hubs"]) == 5
        assert [r["rank"] for r in out["authorities"]] == [1, 2, 3, 4, 5]
        # authorities are suppliers (<= 10 at sf0.001), hubs customers
        assert all(r["auth_units"] > 0 for r in out["authorities"])


class TestSemdedupVerb:
    def test_semdedup_labels_and_writes(self, spark, capsys, tmp_path):
        import json as _json

        from database_replicator_spark import cli

        out_path = str(tmp_path / "labeled")
        rc = cli.main(
            ["semdedup", "--source", "/root/testdata/sf0.001",
             "--tau", "0.4", "--nlist", "16", "--quantizer", "sample",
             "--out", out_path]
        )
        assert rc == 0
        out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["ok"]
        assert out["n"] == 500
        assert out["n_kept"] + out["n_dup"] == out["n"]
        assert out["n_dup"] > 0  # tau=0.4 is non-trivial on this fixture
        labeled = spark.read.parquet(out_path)
        assert labeled.count() == 500
        assert set(labeled.columns) == {"vec_id", "cid", "dup_of", "kept"}


class TestConfigFile:
    def test_toml_config_drives_init(self, spark, capsys, tmp_path):
        import json as _json

        from database_replicator_spark import cli

        cfg = tmp_path / "replication.toml"
        cfg.write_text(
            """
[databases.default]
schema_only = ["nation"]

[[databases.default.table_filters]]
table = "lineitem"
where = "l_quantity > 45"
"""
        )
        tgt = str(tmp_path / "tgt")
        rc = cli.main(
            ["init", "--source", "/root/testdata/sf0.001", "--target", tgt,
             "--config", str(cfg)]
        )
        assert rc == 0
        _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        li = spark.read.parquet(f"{tgt}/lineitem")
        assert li.count() > 0
        assert li.filter("l_quantity <= 45").count() == 0
        assert spark.read.parquet(f"{tgt}/nation").count() == 0  # schema-only

    def test_toml_config_rejects_conflicts(self, tmp_path):
        import pytest as _pytest

        from database_replicator_spark.plans.rules import (
            RuleConflictError,
            load_rules_config,
        )

        cfg = tmp_path / "bad.toml"
        cfg.write_text(
            """
[databases.default]
schema_only = ["lineitem"]

[[databases.default.table_filters]]
table = "lineitem"
where = "l_quantity > 45"
"""
        )
        with _pytest.raises(RuleConflictError):
            load_rules_config(str(cfg))

    def test_time_filter_config_parses(self, tmp_path):
        from database_replicator_spark.plans.rules import load_rules_config

        cfg = tmp_path / "tw.toml"
        cfg.write_text(
            """
[[databases.default.time_filters]]
table = "events"
column = "ts"
last = "30d"
"""
        )
        filt = load_rules_config(str(cfg))
        rule = filt.rules.rule_for_table("default", "public", "events")
        assert rule is not None and rule.time_column == "ts"
        assert rule.time_amount == 30 and rule.time_unit == "day"


class TestSemanticDedupStage:
    def test_semantic_dedup_removes_paraphrase(self, capsys, tmp_path):
        import json as _json
        import os as _os

        from database_replicator_spark.cli import main

        src = _os.path.join(str(tmp_path), "docs.jsonl")
        stops = ["the", "and", "of", "in", "to"]  # pass the stopword rule
        base_words = stops + [f"word{i}" for i in range(19)]
        base = " ".join(base_words)
        # paraphrase: two words swapped for variants — the shingle overlap
        # drops a lot lexically, but the hashed embedding keeps cosine high
        para_words = list(base_words)
        para_words[8] = "variantx"
        para_words[20] = "varianty"
        para = " ".join(para_words)
        other = " ".join(stops + [f"zed{i}" for i in range(19)])
        with open(src, "w") as f:
            for text in (base, para, other):
                f.write(_json.dumps(
                    {"text": text, "lang": "en", "source": "s"}) + "\n")
        out_dir = _os.path.join(str(tmp_path), "built")
        rc = main(["corpus-build", "--source", src, "--out", out_dir,
                   "--budget", "64", "--shards", "2",
                   "--semantic-dedup", "--semantic-threshold", "0.8"])
        rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rc == 0 and rep["ok"]
        assert rep["n_semantic_removed"] == 1   # the paraphrase
        assert rep["n_written"] == 2


class TestRestoreVerb:
    def test_restore_into_live_sqlite_idempotent(self, spark, capsys, tmp_path):
        import json as _json
        import sqlite3

        from database_replicator_spark import cli

        dsn = str(tmp_path / "restored.db")
        argv = ["restore", "--source", "/root/testdata/sf0.001", "--dsn", dsn,
                "--table", "nation", "--table", "orders",
                "--pk", "orders=o_orderkey"]
        rc = cli.main(argv)
        assert rc == 0
        out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["ok"]
        assert out["tables"]["orders"]["rows_in_db"] == 1500
        assert out["tables"]["nation"]["rows_in_db"] == 25

        # re-restore: idempotent (upsert + insert-if-absent), no dupes
        rc = cli.main(argv)
        assert rc == 0
        out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["tables"]["orders"]["rows_in_db"] == 1500
        assert out["tables"]["nation"]["rows_in_db"] == 25

        conn = sqlite3.connect(dsn)
        try:
            n_cust = conn.execute(
                "SELECT COUNT(DISTINCT o_custkey) FROM orders"
            ).fetchone()[0]
            total = conn.execute(
                "SELECT ROUND(SUM(o_totalprice), 2) FROM orders"
            ).fetchone()[0]
        finally:
            conn.close()
        import duckdb

        want_n, want_total = duckdb.sql(
            "SELECT COUNT(DISTINCT o_custkey), ROUND(SUM(o_totalprice), 2) "
            "FROM '/root/testdata/sf0.001/orders.parquet'"
        ).fetchone()
        assert n_cust == want_n
        assert abs(total - want_total) < 0.05  # sqlite sums in float too

    def test_restore_then_fk_sample_dev_copy(self, spark, capsys, tmp_path):
        """The 'spin up a dev copy' workflow the two newest verbs compose
        into: FK-ordered restore of a 4-table chain into live SQLite,
        then an FK-consistent sample carved from the restored database —
        parents restore in earlier stages, and the sample has zero
        orphans at every FK edge."""
        import json as _json

        from database_replicator_spark import cli
        from database_replicator_spark.operators.fk import fk_consistent_sample
        from database_replicator_spark.sources.sqlite_source import (
            read_table_relational,
        )

        dsn = str(tmp_path / "dev.db")
        # --table order is deliberately child-first: staging must reorder
        argv = [
            "restore", "--source", "/root/testdata/sf0.001", "--dsn", dsn,
            "--table", "orders", "--table", "customer",
            "--table", "nation", "--table", "region",
            "--edge", "nation=region", "--edge", "customer=nation",
            "--edge", "orders=customer",
            "--pk", "region=r_regionkey", "--pk", "nation=n_nationkey",
            "--pk", "customer=c_custkey", "--pk", "orders=o_orderkey",
        ]
        rc = cli.main(argv)
        assert rc == 0
        out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["ok"]
        order = list(out["tables"])
        assert order.index("region") < order.index("nation")
        assert order.index("nation") < order.index("customer")
        assert order.index("customer") < order.index("orders")

        names = ["region", "nation", "customer", "orders"]
        tables = {t: read_table_relational(spark, dsn, t) for t in names}
        full = {t: tables[t].count() for t in names}
        assert full == {
            "region": 5, "nation": 25, "customer": 150, "orders": 1500,
        }

        edges = [
            ("nation", "n_regionkey", "region", "r_regionkey"),
            ("customer", "c_nationkey", "nation", "n_nationkey"),
            ("orders", "o_custkey", "customer", "c_custkey"),
        ]
        sampled = fk_consistent_sample(
            tables, "region", "r_regionkey", edges, rate=0.5, seed=7
        )
        counts = {t: sampled[t].count() for t in names}
        # a real sample: strictly between empty and full at the root,
        # children bounded by full
        assert 0 < counts["region"] < full["region"]
        for t in names:
            assert counts[t] <= full[t]
        # zero orphans at every edge
        for child, fk, parent, pk in edges:
            orphans = (
                sampled[child]
                .join(
                    sampled[parent].selectExpr(f"{pk} as {fk}"),
                    on=fk,
                    how="left_anti",
                )
                .count()
            )
            assert orphans == 0, f"{child}.{fk} -> {parent}.{pk}"

    def test_restore_rejects_null_conflict_target(self, spark, capsys, tmp_path):
        """Pk-less tables get PRIMARY KEY over all columns; a NULL there
        breaks insert-if-absent idempotency (SQLite duplicates, Postgres
        rejects) — restore must fail fast with the remedy instead
        (ADVICE r5)."""
        import json as _json

        from database_replicator_spark import cli

        src = tmp_path / "src"
        src.mkdir()
        spark.createDataFrame(
            [(1, "a"), (2, None)], "id long, note string"
        ).coalesce(1).write.parquet(str(src / "t.parquet"))

        dsn = str(tmp_path / "t.db")
        rc = cli.main(["restore", "--source", str(src), "--dsn", dsn])
        assert rc == 2
        out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert not out["ok"]
        assert "NULL" in out["error"] and "--pk" in out["error"]

        # explicit non-null pk: same data restores fine
        rc = cli.main(
            ["restore", "--source", str(src), "--dsn", dsn, "--pk", "t=id"]
        )
        assert rc == 0
        out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["ok"] and out["tables"]["t"]["rows_in_db"] == 2

    def test_restore_count_path_psycopg2_cursor_semantics(
        self, spark, capsys, tmp_path, monkeypatch
    ):
        """psycopg2's cursor.execute() returns None where sqlite3 returns
        the cursor — the r5-flagged chaining bug made a fully successful
        postgres restore report ok:false. Emulate the psycopg2 cursor
        contract over the sqlite driver for the DRIVER-SIDE count
        connection and run the verb end-to-end (the executor-side upsert
        workers re-import the real module and are deliberately
        unaffected)."""
        import json as _json

        from database_replicator_spark import cli
        from database_replicator_spark.sources import jdbc as jdbc_mod

        real_open = jdbc_mod.open_dbapi

        class P2Cursor:
            def __init__(self, cur):
                self._cur = cur

            def execute(self, *a, **k):
                self._cur.execute(*a, **k)
                return None  # the psycopg2 contract

            def __getattr__(self, name):
                return getattr(self._cur, name)

        class P2Conn:
            def __init__(self, conn):
                self._conn = conn

            def cursor(self):
                return P2Cursor(self._conn.cursor())

            def __getattr__(self, name):
                return getattr(self._conn, name)

        def p2_open(dsn):
            conn, tr = real_open(dsn)
            return P2Conn(conn), tr

        monkeypatch.setattr(jdbc_mod, "open_dbapi", p2_open)
        dsn = str(tmp_path / "p2.db")
        rc = cli.main(
            ["restore", "--source", "/root/testdata/sf0.001", "--dsn", dsn,
             "--table", "nation", "--pk", "nation=n_nationkey"]
        )
        assert rc == 0
        out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["ok"] and out["tables"]["nation"]["rows_in_db"] == 25


class TestInteractiveSql:
    def test_repl_loop_survives_errors(self, spark, capsys, monkeypatch):
        import io
        import json as _json
        import sys

        from database_replicator_spark.cli import main

        feed = (
            "SELECT COUNT(*) AS n FROM orders;\n"
            "SELECT bogus FROM nope;\n"
            "SELECT o_orderstatus, COUNT(*) AS n FROM orders\n"
            "GROUP BY 1 ORDER BY 1;\n"
            "SELECT COUNT(*) AS n FROM nation\n"  # EOF without ';'
        )
        monkeypatch.setattr(sys, "stdin", io.StringIO(feed))
        rc = main(
            ["sql", "--source", "/root/testdata/sf0.001", "--interactive"]
        )
        out = [
            _json.loads(line)
            for line in capsys.readouterr().out.strip().splitlines()
            if line.startswith("{")
        ]
        assert rc == 0
        assert len(out) == 4
        assert out[0]["ok"] and out[0]["rows"][0]["n"] == 1500
        assert not out[1]["ok"] and "nope" in out[1]["error"]
        # multi-line statement parsed across lines; loop survived the error
        assert out[2]["ok"] and len(out[2]["rows"]) == 3
        # the final un-';'-terminated statement still runs at EOF
        assert out[3]["ok"] and out[3]["rows"][0]["n"] == 25

    def test_literal_semicolon_at_eol_does_not_split(
        self, spark, capsys, monkeypatch
    ):
        """A string literal ending in ';' at end-of-line must NOT
        terminate the statement (ADVICE r7): the terminator scan tracks
        quote state, including '' doubling."""
        import io
        import json as _json
        import sys

        from database_replicator_spark.cli import main

        feed = (
            # literal 'O;' split so the first line ends mid-literal in ';'
            "SELECT COUNT(*) AS n FROM orders WHERE o_orderstatus = 'O;\n"
            "' OR o_orderstatus = 'O';\n"
            # doubled-quote escape containing ';' at EOL
            "SELECT 'a'';\n"
            "b' AS s;\n"
        )
        monkeypatch.setattr(sys, "stdin", io.StringIO(feed))
        rc = main(
            ["sql", "--source", "/root/testdata/sf0.001", "--interactive"]
        )
        out = [
            _json.loads(line)
            for line in capsys.readouterr().out.strip().splitlines()
            if line.startswith("{")
        ]
        assert rc == 0
        assert len(out) == 2
        assert out[0]["ok"] and out[0]["rows"][0]["n"] > 0
        assert out[1]["ok"] and out[1]["rows"][0]["s"] == "a';\nb"

    def test_backslash_escaped_quote_terminates(
        self, spark, capsys, monkeypatch
    ):
        """Spark's default lexing (escapedStringLiterals=false) accepts
        backslash-escaped quotes; the terminator scan must not treat
        ``\\'`` as the closing quote (ADVICE r8) — otherwise the first
        statement silently glues onto the next one."""
        import io
        import json as _json
        import sys

        from database_replicator_spark.cli import main

        feed = (
            "SELECT 'don\\'t;' AS s;\n"
            "SELECT COUNT(*) AS n FROM nation;\n"
        )
        monkeypatch.setattr(sys, "stdin", io.StringIO(feed))
        rc = main(
            ["sql", "--source", "/root/testdata/sf0.001", "--interactive"]
        )
        out = [
            _json.loads(line)
            for line in capsys.readouterr().out.strip().splitlines()
            if line.startswith("{")
        ]
        assert rc == 0
        # two separate statements, both ok — the buggy tracker ran ONE
        # glued statement (a parse error) at EOF
        assert len(out) == 2
        assert out[0]["ok"] and out[0]["rows"][0]["s"] == "don't;"
        assert out[1]["ok"] and out[1]["rows"][0]["n"] == 25

    def test_one_shot_requires_query(self, capsys):
        import json as _json

        from database_replicator_spark.cli import main

        rc = main(["sql", "--source", "/root/testdata/sf0.001"])
        out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rc == 2 and not out["ok"]
