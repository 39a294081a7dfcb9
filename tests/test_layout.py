"""Z-order layout (operators/layout.py): Morton-code correctness and the
data-skipping property (per-shard bounding boxes shrink on BOTH columns)."""

from pyspark.sql import functions as F

from database_replicator_spark.operators.layout import (
    column_bounds,
    interleave_bits,
    interleave_bits_sql,
    quantize_minmax,
    zorder_keys,
)


class TestMorton:
    def test_interleave_known_values(self, spark):
        # q1=0b11, q2=0b01 with 2 bits → z = 0b1 1 1 0 reading (q1_1,q2_1,q1_0,q2_0)
        df = spark.createDataFrame([(3, 1)], "a long, b long")
        z = df.select(
            interleave_bits([F.col("a"), F.col("b")], bits=2).alias("z")
        ).collect()[0]["z"]
        # bit layout: i=0: a->bit1=1, b->bit0=1; i=1: a->bit3=1, b->bit2=0
        assert z == 0b1011

    def test_interleave_monotone_locality(self, spark):
        # points close in (x, y) are close in z: the classic 4x4 curve
        rows = [(x, y) for x in range(4) for y in range(4)]
        df = spark.createDataFrame(rows, "a long, b long")
        out = {
            (r["a"], r["b"]): r["z"]
            for r in df.select(
                "a", "b", interleave_bits([F.col("a"), F.col("b")], 2).alias("z")
            ).collect()
        }
        assert out[(0, 0)] == 0 and out[(3, 3)] == 15
        # quadrant property: all of the low quadrant sorts before the high
        low = {out[(x, y)] for x in range(2) for y in range(2)}
        high = {out[(x, y)] for x in range(2, 4) for y in range(2, 4)}
        assert max(low) < min(high)

    def test_sql_rendering_matches(self, spark):
        import duckdb

        rows = [(x, y) for x in range(8) for y in range(8)]
        df = spark.createDataFrame(rows, "a long, b long")
        got = sorted(
            r["z"]
            for r in df.select(
                interleave_bits([F.col("a"), F.col("b")], 3).alias("z")
            ).collect()
        )
        sql = interleave_bits_sql(["a", "b"], 3)
        want = sorted(
            r[0]
            for r in duckdb.sql(
                f"SELECT {sql} AS z FROM (SELECT unnest(range(8)) AS a), (SELECT unnest(range(8)) AS b)"
            ).fetchall()
        )
        assert got == want

    def test_quantize_bounds(self, spark):
        df = spark.createDataFrame([(0.0,), (5.0,), (10.0,)], "x double")
        q = [
            r["q"]
            for r in df.select(
                quantize_minmax(F.col("x"), 0.0, 10.0, 4).alias("q")
            ).orderBy("x").collect()
        ]
        assert q[0] == 0 and q[2] == 15 and 0 < q[1] < 15


class TestZorderSkipping:
    def test_shard_bounding_boxes_shrink(self, spark):
        # uniform grid: after z-sharding, each shard's per-column span must
        # be far below the global span on BOTH columns — the property that
        # makes parquet min/max stats prune either predicate
        rows = [(i, float(i % 100), float(i // 100)) for i in range(10_000)]
        df = spark.createDataFrame(rows, "id long, x double, y double")
        bounds = column_bounds(df, ["x", "y"])
        out = zorder_keys(df, ["x", "y"], bounds, bits=8, n_shards=16)
        spans = (
            out.groupBy("z_shard")
            .agg(
                (F.max("x") - F.min("x")).alias("sx"),
                (F.max("y") - F.min("y")).alias("sy"),
            )
            .collect()
        )
        assert len(spans) == 16
        avg_sx = sum(r["sx"] for r in spans) / len(spans)
        avg_sy = sum(r["sy"] for r in spans) / len(spans)
        # global span is 99 on both axes; z-sharding must localize both
        assert avg_sx <= 99 * 0.6
        assert avg_sy <= 99 * 0.6
        # versus a single-column sort, which cannot localize the second axis
        lex = df.withColumn(
            "shard", F.ntile(16).over(__import__("pyspark.sql", fromlist=["Window"]).Window.orderBy("x"))
        )
        lex_spans = lex.groupBy("shard").agg((F.max("y") - F.min("y")).alias("sy")).collect()
        avg_lex_sy = sum(r["sy"] for r in lex_spans) / len(lex_spans)
        assert avg_sy < avg_lex_sy * 0.7

    def test_shard_is_pure_function_of_values(self, spark):
        df = spark.createDataFrame(
            [(1, 10.0, 20.0)], "id long, x double, y double"
        )
        bounds = {"x": (0.0, 100.0), "y": (0.0, 100.0)}
        a = zorder_keys(df, ["x", "y"], bounds, bits=8, n_shards=8).collect()[0]
        b = zorder_keys(
            df.repartition(7), ["x", "y"], bounds, bits=8, n_shards=8
        ).collect()[0]
        assert (a["z_key"], a["z_shard"]) == (b["z_key"], b["z_shard"])


class TestSortedExport:
    def test_global_order_across_partitions(self, spark):
        from database_replicator_spark.operators.layout import sorted_export

        df = spark.range(0, 10_000).withColumn(
            "k", (F.col("id") * 2654435761) % 100_000
        )
        out = sorted_export(df, ["k"], n_files=8)
        rows = out.select(
            F.spark_partition_id().alias("p"), "k"
        ).collect()
        # within-partition sorted AND partition ranges non-overlapping
        by_p = {}
        for r in rows:
            by_p.setdefault(r["p"], []).append(r["k"])
        for ks in by_p.values():
            assert ks == sorted(ks)
        bounds = sorted((min(ks), max(ks)) for ks in by_p.values())
        for (lo1, hi1), (lo2, _hi2) in zip(bounds, bounds[1:]):
            assert hi1 <= lo2
        # nothing lost
        assert sorted(r["k"] for r in rows) == sorted(
            r["k"] for r in df.select("k").collect()
        )

    def test_plan_uses_range_partitioning_not_single(self, spark):
        from database_replicator_spark.operators.layout import sorted_export

        df = spark.range(0, 1000).withColumn("k", F.col("id") % 97)
        plan = sorted_export(df, ["k"], n_files=8)._jdf.queryExecution().executedPlan().toString()
        assert "rangepartitioning" in plan.lower()
        assert "SinglePartition" not in plan



class TestOptimize:
    def test_compaction_preserves_content_and_merges_files(
        self, spark, tmp_path, capsys
    ):
        import glob
        import json as _json
        import os

        from database_replicator_spark.cli import main
        from database_replicator_spark.operators.verify import table_checksum
        from database_replicator_spark.sources.catalog import load_table

        path = str(tmp_path / "frag")
        orders = load_table(spark, "/root/testdata/sf0.001", "orders")
        orders.repartition(32).write.parquet(path)  # 32 tiny files
        before_sum = table_checksum(spark.read.parquet(path))
        assert len(glob.glob(os.path.join(path, "*.parquet"))) == 32

        rc = main(["optimize", "--path", path, "--target-file-mb", "128"])
        rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rc == 0 and rep["ok"]
        assert rep["files_before"] == 32
        assert rep["files_after"] == 1      # tiny fixture fits one file
        assert table_checksum(spark.read.parquet(path)) == before_sum

    def test_sort_cols_restore_clustering(self, spark, tmp_path):
        from database_replicator_spark.operators.layout import compact_parquet_dir
        from database_replicator_spark.sources.catalog import load_table

        path = str(tmp_path / "frag2")
        orders = load_table(spark, "/root/testdata/sf0.001", "orders")
        orders.repartition(8).write.parquet(path)
        compact_parquet_dir(spark, path, sort_cols=["o_orderkey"])
        rows = [r["o_orderkey"] for r in spark.read.parquet(path).collect()]
        # one output file sorted within partition -> fully sorted read
        assert rows == sorted(rows)


    def test_partitioned_layout_preserved(self, spark, tmp_path):
        """optimize on a hive-partitioned dir must keep the partition
        scheme (flattening would destroy pruning for every reader)."""
        import glob
        import os

        from database_replicator_spark.operators.layout import compact_parquet_dir
        from database_replicator_spark.sources.catalog import load_table

        path = str(tmp_path / "parted")
        orders = load_table(spark, "/root/testdata/sf0.001", "orders")
        (
            orders.withColumn("bucket", F.pmod(F.col("o_orderkey"), F.lit(4)))
            .repartition(8)
            .write.partitionBy("bucket")
            .parquet(path)
        )
        before = spark.read.parquet(path)
        n_before = before.count()
        want = before.filter(F.col("bucket") == 2).count()  # pre-rewrite
        rep = compact_parquet_dir(spark, path, target_file_mb=128)
        assert rep["partition_cols"] == ["bucket"]
        # partition dirs still present, content preserved
        assert {d.split("=")[0] for d in os.listdir(path) if "=" in d} == {"bucket"}
        after = spark.read.parquet(path)
        assert after.count() == n_before
        assert rep["files_after"] <= rep["files_before"]
        # pruning still works and content per partition is intact
        got = after.filter(F.col("bucket") == 2).count()
        assert got == want > 0
