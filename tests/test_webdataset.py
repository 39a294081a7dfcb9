"""WebDataset-style tar shard IO (sources/webdataset.py): round-trip,
determinism, and layout contracts.

- write → read round-trips the (id, payload, meta) relation exactly;
- shard bytes are deterministic (fixed member mtimes, id-ordered
  members): two exports of the same relation are byte-identical;
- the member convention is the public WebDataset one ({key}.{ext} +
  {key}.json, ext from mime) — checked with plain tarfile, no reader;
- the manifest counts match; empty shard slots simply don't exist.
"""

import hashlib
import json
import os
import tarfile

import pytest
from pyspark.sql import functions as F

from database_replicator_spark.operators.multimodal import media_table
from database_replicator_spark.sources.webdataset import (
    read_tar_shards,
    shard_manifest,
    write_tar_shards,
)


@pytest.fixture()
def media(spark):
    rows = [(i, bytes([i % 251]) * (10 + i % 5)) for i in range(40)]
    df = spark.createDataFrame(rows, "id long, payload binary")
    return media_table(df, "id", "payload", "image/bmp")


def _dir_digest(d):
    out = {}
    for f in sorted(os.listdir(d)):
        if f.endswith(".tar"):
            out[f] = hashlib.md5(open(os.path.join(d, f), "rb").read()).hexdigest()
    return out


class TestRoundTrip:
    def test_write_read_identity(self, spark, media, tmp_path):
        out = str(tmp_path / "wds")
        write_tar_shards(media, out, n_shards=4)
        back = read_tar_shards(spark, out)
        want = sorted(
            (r["id"], bytes(r["payload"]), r["meta"]["mime"], r["meta"]["n_bytes"])
            for r in media.collect()
        )
        got = sorted(
            (r["id"], bytes(r["payload"]), r["meta"]["mime"], r["meta"]["n_bytes"])
            for r in back.collect()
        )
        assert got == want
        m = {r["shard"]: r["n_samples"] for r in shard_manifest(spark, out).collect()}
        assert sum(m.values()) == 40
        assert set(m) == {0, 1, 2, 3}  # pmod sharding covers all slots here

    def test_member_convention_and_determinism(self, spark, media, tmp_path):
        out1, out2 = str(tmp_path / "a"), str(tmp_path / "b")
        write_tar_shards(media, out1, n_shards=2)
        write_tar_shards(media, out2, n_shards=2)
        assert _dir_digest(out1) == _dir_digest(out2)  # byte-identical
        with tarfile.open(os.path.join(out1, "shard-00000.tar")) as tf:
            names = tf.getnames()
            # pairs: {id}.bmp followed by {id}.json, ids ascending & even
            assert names[0] == "0.bmp" and names[1] == "0.json"
            ids = [int(n.split(".")[0]) for n in names[::2]]
            assert ids == sorted(ids) and all(i % 2 == 0 for i in ids)
            meta = json.loads(tf.extractfile("0.json").read())
            assert meta["mime"] == "image/bmp" and meta["n_bytes"] == 10
            assert tf.getmember("0.bmp").mtime == 0  # reproducible headers

    def test_missing_dir_raises(self, spark, tmp_path):
        with pytest.raises(FileNotFoundError, match="no .tar shards"):
            read_tar_shards(spark, str(tmp_path))

    def test_reader_parallel_unit_is_the_shard(self, spark, media, tmp_path):
        out = str(tmp_path / "wds8")
        write_tar_shards(media, out, n_shards=8)
        back = read_tar_shards(spark, out)
        assert back.count() == 40
        assert len([f for f in os.listdir(out) if f.endswith(".tar")]) == 8


class TestNullMeta:
    def test_null_meta_rows_round_trip(self, spark, tmp_path):
        """to_json(null struct) is None — the writer must normalize to
        "{}" so null-meta rows still carry a .json member (ADVICE r11)."""
        df = spark.createDataFrame(
            [(1, b"\x01\x02", None), (2, b"\x03", ("image/bmp", 1))],
            "id long, payload binary, "
            "meta struct<mime string, n_bytes int>",
        )
        out = str(tmp_path / "wds-null")
        write_tar_shards(df, out, n_shards=1)
        with tarfile.open(os.path.join(out, "shard-00000.tar")) as tf:
            names = tf.getnames()
            assert "1.json" in names and "2.json" in names
            assert json.loads(tf.extractfile("1.json").read()) == {}
        back = read_tar_shards(spark, out)
        got = {r["id"]: bytes(r["payload"]) for r in back.collect()}
        assert got == {1: b"\x01\x02", 2: b"\x03"}
