"""Multimodal plumbing tests: schema, batching, stub contract."""

import pytest
from pyspark.sql import functions as F

from database_replicator_spark.operators.multimodal import (
    extract_features,
    fake_decode,
    media_table,
    sample_frames_expr,
)


@pytest.fixture()
def media(spark):
    df = spark.createDataFrame(
        [(1, b"payload-one"), (2, b"payload-two-longer")], "doc_id long, payload binary"
    )
    return media_table(df, "doc_id", "payload", "image/png")


class TestMediaTable:
    def test_schema_and_meta(self, media):
        assert [f.name for f in media.schema.fields] == ["id", "payload", "meta"]
        row = media.orderBy("id").collect()[0]
        assert row["meta"]["mime"] == "image/png"
        assert row["meta"]["n_bytes"] == len(b"payload-one")
        assert row["meta"]["width"] is None


class TestExtractFeatures:
    def test_stub_raises_without_decoder(self, media):
        with pytest.raises(Exception, match="no media decoder available"):
            extract_features(media, decoder=None).collect()

    def test_fake_decode_deterministic(self, media):
        a = extract_features(media, decoder=fake_decode).orderBy("id").collect()
        b = extract_features(media.repartition(3), decoder=fake_decode).orderBy("id").collect()
        assert [r["feature"] for r in a] == [r["feature"] for r in b]
        assert all(len(r["feature"]) == 8 for r in a)
        assert a[0]["fingerprint"] != a[1]["fingerprint"]
        assert a[0]["n_bytes"] == len(b"payload-one")

    def test_fake_decode_values_stable(self):
        v1 = fake_decode(b"x")
        v2 = fake_decode(b"x")
        v3 = fake_decode(b"y")
        assert v1 == v2 and v1 != v3
        assert all(0.0 <= x < 1.0 for x in v1)


def test_sample_frames_plan(spark):
    df = spark.createDataFrame([(10_000,)], "duration_ms long")
    out = df.select(sample_frames_expr(F.col("duration_ms"), 4_000).alias("ts")).collect()
    assert out[0]["ts"] == [0, 4000, 8000]


class TestResize:
    def test_stub_raises_without_resizer(self, media):
        from database_replicator_spark.operators.multimodal import resize_media

        with pytest.raises(Exception, match="no media resizer available"):
            resize_media(media, 4, 4).collect()

    def test_fake_resize_plumbing(self, media):
        from database_replicator_spark.operators.multimodal import fake_resize, resize_media

        out = resize_media(media, 4, 4, resizer=fake_resize).orderBy("id").collect()
        assert all(len(r["payload"]) == 16 for r in out)
        assert all(r["meta"]["width"] == 4 and r["meta"]["height"] == 4 for r in out)
        assert all(r["meta"]["n_bytes"] == 16 for r in out)
        assert out[0]["meta"]["mime"] == "image/png"  # original mime preserved
