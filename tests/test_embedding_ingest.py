"""Streaming embedding-index ingestion: id dedup → LSH-candidate +
exact-cosine near-dup rejection → idempotent epoch appends
(streaming/embedding_ingest.py)."""

import math
import os

import pytest

from database_replicator_spark.streaming.embedding_ingest import (
    EmbeddingIngestor,
    read_embedding_index,
    start_embedding_ingest,
)

DIM = 8


def _vec(seed, flip=0.0):
    """Deterministic unit-ish vector; `flip` perturbs one axis."""
    v = [math.sin(seed * 1.7 + i) for i in range(DIM)]
    v[0] += flip
    return [float(x) for x in v]


def _df(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


@pytest.fixture()
def dirs(tmp_path):
    return {
        "src": str(tmp_path / "queue"),
        "tgt": str(tmp_path / "emb_out"),
        "chk": str(tmp_path / "chk"),
    }


class TestEmbeddingIngestBatch:
    def test_near_dup_rejected_distinct_accepted(self, spark, dirs):
        ing = EmbeddingIngestor(target_dir=dirs["tgt"], dim=DIM, threshold=0.95)
        ing.ingest_batch(_df(spark, [(1, _vec(1)), (2, _vec(2))]), 0)
        # epoch 1: an exact re-embed of vec 1 (cos=1), a tiny perturbation
        # of vec 2 (cos≈1), and a genuinely new vector
        ing.ingest_batch(
            _df(
                spark,
                [(10, _vec(1)), (11, _vec(2, flip=0.01)), (12, _vec(9))],
            ),
            1,
        )
        idx = read_embedding_index(spark, dirs["tgt"])
        ids = {r["vec_id"] for r in idx.collect()}
        assert ids == {1, 2, 12}

    def test_replayed_epoch_is_idempotent(self, spark, dirs):
        ing = EmbeddingIngestor(target_dir=dirs["tgt"], dim=DIM)
        batch = _df(spark, [(1, _vec(1)), (2, _vec(2))])
        ing.ingest_batch(batch, 0)
        ing.ingest_batch(batch, 0)  # at-least-once replay
        idx = read_embedding_index(spark, dirs["tgt"])
        assert idx.count() == 2

    def test_same_id_across_epochs_dropped(self, spark, dirs):
        ing = EmbeddingIngestor(target_dir=dirs["tgt"], dim=DIM)
        ing.ingest_batch(_df(spark, [(1, _vec(1))]), 0)
        ing.ingest_batch(_df(spark, [(1, _vec(5)), (2, _vec(6))]), 1)
        idx = read_embedding_index(spark, dirs["tgt"])
        assert {r["vec_id"] for r in idx.collect()} == {1, 2}
        # the original epoch-0 embedding survives (first write wins)
        v1 = [r for r in idx.collect() if r["vec_id"] == 1][0]["embedding"]
        assert abs(v1[0] - _vec(1)[0]) < 1e-5

    def test_bucket_index_tracks_accepted_only(self, spark, dirs):
        ing = EmbeddingIngestor(target_dir=dirs["tgt"], dim=DIM, threshold=0.95)
        ing.ingest_batch(_df(spark, [(1, _vec(1))]), 0)
        ing.ingest_batch(_df(spark, [(10, _vec(1)), (12, _vec(9))]), 1)
        buckets = spark.read.option(
            "basePath", os.path.join(dirs["tgt"], "buckets")
        ).parquet(os.path.join(dirs["tgt"], "buckets"))
        assert {r["vec_id"] for r in buckets.collect()} == {1, 12}


class TestEmbeddingIngestStream:
    def test_available_now_drains_queue(self, spark, dirs):
        os.makedirs(dirs["src"], exist_ok=True)
        _df(spark, [(i, _vec(i)) for i in range(6)]).write.mode("overwrite").parquet(
            dirs["src"]
        )
        q = start_embedding_ingest(
            spark, dirs["src"], dirs["tgt"], dirs["chk"], dim=DIM, once=True
        )
        q.awaitTermination(120)
        idx = read_embedding_index(spark, dirs["tgt"])
        assert idx.count() == 6


class TestForgetVectors:
    def test_erases_vector_and_buckets(self, spark, dirs):
        from database_replicator_spark.streaming.embedding_ingest import (
            forget_vectors,
        )

        ing = EmbeddingIngestor(target_dir=dirs["tgt"], dim=DIM)
        ing.ingest_batch(_df(spark, [(1, _vec(1)), (2, _vec(2))]), 0)
        ing.ingest_batch(_df(spark, [(3, _vec(3))]), 1)
        rep = forget_vectors(spark, dirs["tgt"], [1])
        assert rep["vectors"] == 1
        assert rep["buckets"] >= 1  # one row per hash table
        idx = read_embedding_index(spark, dirs["tgt"])
        assert {r["vec_id"] for r in idx.collect()} == {2, 3}
        # a re-embed of the forgotten id is admissible again (erasure)
        ing.ingest_batch(_df(spark, [(1, _vec(1))]), 2)
        assert {r["vec_id"] for r in read_embedding_index(spark, dirs["tgt"]).collect()} == {1, 2, 3}
