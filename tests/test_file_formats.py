"""Multi-format table IO (sources/files.py): type-exact round trips for
CSV/ORC/JSON via the schema sidecar, corrupt-row channel, checksum parity
with the parquet original."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from database_replicator_spark.operators.verify import table_checksum
from database_replicator_spark.sources.catalog import load_table
from database_replicator_spark.sources.files import (
    read_table,
    sniff_format,
    split_corrupt,
    write_table,
)


class TestSniff:
    def test_known_extensions(self):
        assert sniff_format("/x/orders.csv") == "csv"
        assert sniff_format("/x/orders.orc/") == "orc"
        assert sniff_format("/x/a.jsonl") == "json"

    def test_unknown_extension_raises(self):
        with pytest.raises(ValueError, match="sniff"):
            sniff_format("/x/orders.xlsx")


class TestRoundTrips:
    @pytest.mark.parametrize("ext", ["csv", "orc", "jsonl"])
    def test_orders_round_trip_checksum_exact(self, spark, tmp_path, ext):
        """orders (bigint/double/string/timestamp columns) must survive
        every text/columnar format bit-exactly — the checksum renders
        timestamps and floats canonically, so one flipped microsecond or
        ulp fails this."""
        orders = load_table(spark, "/root/testdata/sf0.001", "orders")
        path = str(tmp_path / f"orders.{ext}")
        write_table(orders, path)
        back = read_table(spark, path)
        if ext == "csv":
            back, bad = split_corrupt(back)
            assert bad.count() == 0
        assert back.schema == orders.schema
        assert table_checksum(back) == table_checksum(orders)

    def test_csv_without_schema_or_sidecar_refuses(self, spark, tmp_path):
        orders = load_table(spark, "/root/testdata/sf0.001", "orders")
        path = str(tmp_path / "orders.csv")
        write_table(orders, path)
        os.remove(os.path.join(path, "_schema.json"))
        with pytest.raises(ValueError, match="explicit schema"):
            read_table(spark, path)

    def test_corrupt_csv_rows_routed_not_dropped(self, spark, tmp_path):
        df = spark.createDataFrame(
            [(1, 2.5), (2, 3.5)], "id bigint, v double"
        )
        path = str(tmp_path / "t.csv")
        write_table(df, path)
        # inject a malformed line as an extra part file (appending to an
        # existing part would invalidate its hadoop .crc sidecar)
        with open(os.path.join(path, "part-extra.csv"), "w") as fh:
            fh.write("not_an_int,definitely_not_a_double\n")
        clean, bad = split_corrupt(read_table(spark, path))
        assert clean.count() == 2
        assert bad.count() == 1
        assert "not_an_int" in bad.collect()[0]["_corrupt"]


class TestCliRouting:
    def test_init_from_csv_source_dir(self, spark, tmp_path, capsys):
        """A directory of CSV table drops replicates through the same
        init/verify lifecycle as parquet."""
        import json as _json

        from database_replicator_spark.cli import main

        src = str(tmp_path / "csvsrc")
        os.makedirs(src)
        orders = load_table(spark, "/root/testdata/sf0.001", "orders").limit(100)
        write_table(orders, os.path.join(src, "orders.csv"))

        tgt = str(tmp_path / "tgt")
        rc = main(["init", "--source", src, "--target", tgt])
        assert rc == 0
        back = spark.read.parquet(os.path.join(tgt, "orders"))
        assert back.count() == 100


class TestEvolvingRead:
    def test_added_column_backfilled_with_typed_default(self, spark, tmp_path):
        from database_replicator_spark.sources.files import read_evolving

        path = str(tmp_path / "gen")
        v1 = spark.createDataFrame(
            [(1, "a"), (2, "b")], "doc_id bigint, text string"
        )
        v1.write.parquet(path)  # generation 1: no quality column
        v2 = spark.createDataFrame(
            [(3, "c", 0.9)], "doc_id bigint, text string, quality double"
        )
        v2.write.mode("append").parquet(path)  # generation 2 adds quality

        out = read_evolving(spark, path, defaults={"quality": 0.5})
        got = {r["doc_id"]: r["quality"] for r in out.collect()}
        assert got == {1: 0.5, 2: 0.5, 3: 0.9}
        assert dict(out.dtypes)["quality"] == "double"

    def test_without_defaults_old_rows_are_null(self, spark, tmp_path):
        from database_replicator_spark.sources.files import read_evolving

        path = str(tmp_path / "gen2")
        spark.createDataFrame([(1,)], "doc_id bigint").write.parquet(path)
        spark.createDataFrame(
            [(2, "en")], "doc_id bigint, lang string"
        ).write.mode("append").parquet(path)
        out = read_evolving(spark, path)
        got = {r["doc_id"]: r["lang"] for r in out.collect()}
        assert got == {1: None, 2: "en"}
