"""PQ codebook drift maintenance (streaming/embedding_ingest.py, r11
verdict ask #7): self-ADC drift rows per epoch, threshold-gated
re-encode, batch-equality of migrated codes, crash-marker fail-fast."""

import math
import os

import numpy as np
import pytest

from database_replicator_spark.streaming.embedding_ingest import (
    EmbeddingIngestor,
    drift_status,
    ingest_status,
    maybe_reencode,
    reencode_index,
)

DIM = 16


def _vec(seed: int, shift: float = 0.0):
    """Deterministic unit-ish vector; ``shift`` pushes the distribution
    into a different region of the sphere (the drift knob)."""
    rng = np.random.RandomState(seed)
    v = rng.rand(DIM) - 0.5
    v[0] += shift
    return [float(x) for x in v]


def _df(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


@pytest.fixture()
def tgt(tmp_path):
    return str(tmp_path / "embidx")


def _ingest(spark, tgt, epoch, ids, shift=0.0):
    ing = EmbeddingIngestor(target_dir=tgt, dim=DIM, pq=True, threshold=0.999)
    ing.ingest_batch(_df(spark, [(i, _vec(i, shift)) for i in ids]), epoch)
    return ing


class TestDriftRows:
    def test_each_epoch_records_self_adc(self, spark, tgt):
        _ingest(spark, tgt, 0, range(0, 30))
        _ingest(spark, tgt, 1, range(100, 130))
        st = drift_status(spark, tgt)
        assert [e["epoch"] for e in st["epochs"]] == [0, 1]
        assert st["generation"] == 0
        assert all(not math.isnan(e["self_adc_mean"]) for e in st["epochs"])
        # same distribution → no drift flagged
        assert st["flagged"] == []
        assert "drift" in ingest_status(spark, tgt)

    def test_distribution_shift_is_flagged(self, spark, tgt):
        _ingest(spark, tgt, 0, range(0, 30))
        # a strong shift the epoch-0 codebooks never saw
        _ingest(spark, tgt, 1, range(100, 130), shift=4.0)
        st = drift_status(spark, tgt, drift_threshold=0.1)
        assert st["flagged"] == [1]


class TestReencode:
    def test_migration_repairs_drift_and_matches_fresh_encode(self, spark, tgt):
        from database_replicator_spark.operators.similarity import (
            load_index_artifact,
            pq_encode,
        )

        _ingest(spark, tgt, 0, range(0, 30))
        _ingest(spark, tgt, 1, range(100, 130), shift=4.0)
        before = drift_status(spark, tgt, drift_threshold=0.1)
        out = maybe_reencode(spark, tgt, drift_threshold=0.1)
        assert out["action"] == "reencoded"
        assert out["report"]["generation"] == 1
        after = out["status_after"]
        assert after["generation"] == 1
        # the shifted epoch's margin improved under the retrained books
        b1 = next(e for e in before["epochs"] if e["epoch"] == 1)
        a1 = next(e for e in after["epochs"] if e["epoch"] == 1)
        assert a1["self_adc_mean"] > b1["self_adc_mean"]
        # batch equality: stored codes == fresh pq_encode under new books
        arrays, meta = load_index_artifact(os.path.join(tgt, "_pq"))
        assert meta["generation"] == 1
        for ep in (0, 1):
            vecs = spark.read.parquet(os.path.join(tgt, "vectors", f"epoch={ep}"))
            want = {
                r["vid"]: list(r["codes"])
                for r in pq_encode(vecs, arrays["codebooks"]).collect()
            }
            got = {
                r["vec_id"]: list(r["codes"])
                for r in spark.read.parquet(
                    os.path.join(tgt, "buckets", f"epoch={ep}")
                ).collect()
            }
            assert got == want

    def test_no_drift_means_no_action(self, spark, tgt):
        _ingest(spark, tgt, 0, range(0, 30))
        _ingest(spark, tgt, 1, range(100, 130))
        out = maybe_reencode(spark, tgt, drift_threshold=0.1)
        assert out["action"] == "none"

    def test_marker_blocks_ingest(self, spark, tgt):
        _ingest(spark, tgt, 0, range(0, 30))
        marker = os.path.join(tgt, "_migration_in_progress")
        open(marker, "w").close()
        with pytest.raises(RuntimeError, match="migration in progress"):
            _ingest(spark, tgt, 1, range(100, 130))
        os.remove(marker)
        _ingest(spark, tgt, 1, range(100, 130))  # recovers

    def test_reencode_is_idempotent(self, spark, tgt):
        _ingest(spark, tgt, 0, range(0, 30))
        _ingest(spark, tgt, 1, range(100, 130), shift=4.0)
        r1 = reencode_index(spark, tgt)
        codes1 = sorted(
            (r["vec_id"], list(r["codes"]))
            for r in spark.read.option(
                "basePath", os.path.join(tgt, "buckets")
            ).parquet(os.path.join(tgt, "buckets")).collect()
        )
        r2 = reencode_index(spark, tgt)
        codes2 = sorted(
            (r["vec_id"], list(r["codes"]))
            for r in spark.read.option(
                "basePath", os.path.join(tgt, "buckets")
            ).parquet(os.path.join(tgt, "buckets")).collect()
        )
        assert r1["epochs"] == r2["epochs"] == [0, 1]
        assert codes1 == codes2

    def test_failed_migration_leaves_marker(self, spark, tgt, monkeypatch):
        """A mid-migration exception must leave _migration_in_progress in
        place (some buckets may already carry new-generation codes while
        _pq still publishes the old books) so ingest keeps failing fast
        until reencode_index is re-run to completion."""
        import database_replicator_spark.streaming.embedding_ingest as ei

        _ingest(spark, tgt, 0, range(0, 30))
        _ingest(spark, tgt, 1, range(100, 130), shift=4.0)

        def boom(*a, **k):
            raise RuntimeError("simulated mid-migration job failure")

        monkeypatch.setattr(ei, "_write_drift_row", boom)
        with pytest.raises(RuntimeError, match="simulated mid-migration"):
            reencode_index(spark, tgt)
        marker = os.path.join(tgt, "_migration_in_progress")
        assert os.path.exists(marker)
        # fail-fast guard still trips...
        with pytest.raises(RuntimeError, match="migration in progress"):
            _ingest(spark, tgt, 2, range(200, 230))
        # ...until the idempotent migration is re-run to completion
        monkeypatch.undo()
        out = reencode_index(spark, tgt)
        assert out["generation"] >= 1
        assert not os.path.exists(marker)
        _ingest(spark, tgt, 2, range(200, 230))  # recovers
