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


class TestEmbeddingIngestPq:
    def _first_batch(self, spark):
        return _df(spark, [(i, _vec(i)) for i in range(1, 7)])

    def _pq_ing(self, dirs, **kw):
        kw.setdefault("threshold", 0.95)
        kw.setdefault("pq_m", 4)
        kw.setdefault("pq_ksub", 4)
        kw.setdefault("adc_margin", 0.3)
        return EmbeddingIngestor(target_dir=dirs["tgt"], dim=DIM, pq=True, **kw)

    def test_pq_mode_rejects_neardup_accepts_distinct(self, spark, dirs):
        ing = self._pq_ing(dirs)
        ing.ingest_batch(self._first_batch(spark), 0)
        ing.ingest_batch(
            _df(spark, [(10, _vec(1)), (11, _vec(2, flip=0.01)), (12, _vec(20))]),
            1,
        )
        ids = {r["vec_id"] for r in read_embedding_index(spark, dirs["tgt"]).collect()}
        assert 10 not in ids and 11 not in ids  # ADC prefilter + exact rerank
        assert 12 in ids

    def test_pq_bucket_index_stores_codes_not_vectors(self, spark, dirs):
        ing = self._pq_ing(dirs)
        ing.ingest_batch(self._first_batch(spark), 0)
        buckets = spark.read.option(
            "basePath", os.path.join(dirs["tgt"], "buckets")
        ).parquet(os.path.join(dirs["tgt"], "buckets"))
        assert "codes" in buckets.columns and "nvec" not in buckets.columns
        assert all(len(r["codes"]) == 4 for r in buckets.collect())

    def test_pq_codebooks_train_once_and_persist(self, spark, dirs):
        import numpy as np

        from database_replicator_spark.operators.similarity import (
            load_index_artifact,
        )

        ing = self._pq_ing(dirs)
        ing.ingest_batch(self._first_batch(spark), 0)
        books0, meta0 = load_index_artifact(os.path.join(dirs["tgt"], "_pq"))
        ing.ingest_batch(_df(spark, [(30, _vec(30)), (31, _vec(31))]), 1)
        books1, _ = load_index_artifact(os.path.join(dirs["tgt"], "_pq"))
        assert np.array_equal(books0["codebooks"], books1["codebooks"])
        assert meta0["m"] == 4 and meta0["ksub"] == 4

    def test_pq_replay_is_idempotent(self, spark, dirs):
        ing = self._pq_ing(dirs)
        batch = self._first_batch(spark)
        ing.ingest_batch(batch, 0)
        ing.ingest_batch(batch, 0)
        assert read_embedding_index(spark, dirs["tgt"]).count() == 6


class TestEmbeddingIngestMonitoring:
    def test_per_tier_counters_over_three_epochs(self, spark, dirs):
        """ST7-style monitoring for the semantic ingest path: each epoch
        persists its rows-in / rejected-per-tier / seconds counters, and
        ingest_status rolls them up (VERDICT r5 #9)."""
        from database_replicator_spark.streaming.embedding_ingest import (
            ingest_status,
        )

        ing = EmbeddingIngestor(target_dir=dirs["tgt"], dim=DIM, threshold=0.95)
        # epoch 0: 2 fresh + 1 within-batch id dup
        ing.ingest_batch(
            _df(spark, [(1, _vec(1)), (1, _vec(1)), (2, _vec(2))]), 0
        )
        # epoch 1: 1 replayed id + 1 near-dup of vec 2 + 1 fresh
        ing.ingest_batch(
            _df(spark, [(1, _vec(1)), (11, _vec(2, flip=0.01)), (12, _vec(9))]),
            1,
        )
        # epoch 2: all fresh (seeds 21/29 verified <0.9 cosine against
        # every indexed vector and each other — sin-derived vectors in 8
        # dims collide easily, e.g. _vec(20)·_vec(9) = 0.985)
        ing.ingest_batch(_df(spark, [(21, _vec(21)), (29, _vec(29))]), 2)

        st = ingest_status(spark, dirs["tgt"])
        assert st["epochs"] == 3
        t = st["totals"]
        assert t["n_in"] == 8
        assert t["n_dup_in_batch"] == 1
        assert t["n_dup_vs_index"] == 1
        assert t["n_neardup_vs_index"] == 1
        assert t["n_accepted"] == 5
        assert t["seconds"] > 0
        last = st["last_epoch"]
        assert last["epoch"] == 2
        assert (last["n_in"], last["n_accepted"]) == (2, 2)

    def test_pq_mode_flip_fails_fast(self, spark, dirs):
        """Running --pq against an index built without it (or vice versa)
        must fail fast with a clear message, not mid-stream on a missing
        codes column (ADVICE r5)."""
        ing = EmbeddingIngestor(target_dir=dirs["tgt"], dim=DIM)
        ing.ingest_batch(_df(spark, [(1, _vec(1))]), 0)
        flipped = EmbeddingIngestor(target_dir=dirs["tgt"], dim=DIM, pq=True)
        with pytest.raises(ValueError, match="mode"):
            flipped.ingest_batch(_df(spark, [(2, _vec(2))]), 1)
        # matching mode still ingests
        same = EmbeddingIngestor(target_dir=dirs["tgt"], dim=DIM)
        same.ingest_batch(_df(spark, [(3, _vec(3))]), 1)
        idx = read_embedding_index(spark, dirs["tgt"])
        assert {r["vec_id"] for r in idx.collect()} == {1, 3}
