"""Incremental embedding-index ingestion — the SEMANTIC face of
streaming corpus ingestion (corpus_ingest.py is the lexical face).

Each micro-batch of (vec_id, embedding) rows runs the semantic
acceptance gauntlet inside ``foreachBatch``:

  1. **Within-batch id dedup** — first occurrence per vec_id.
  2. **Against-index id dedup** — anti-join on accumulated ids (a
     replayed or re-crawled vector never duplicates).
  3. **Near-dup rejection** — the batch's LSH bucket assignments
     (similarity.lsh_assign_scan — the same seeded hyperplanes every
     epoch, so bucket ids are stable across the index's lifetime) join
     the accumulated bucket index; colliding candidates are verified
     with EXACT cosine, and a batch vector within ``threshold`` of any
     accepted vector is rejected. Verification means precision is exact
     — only recall is bounded by the LSH family (num_planes/num_tables,
     audited in RECALL.md).
  4. **Append** — accepted vectors and their bucket assignments land as
     their own ``epoch=<id>`` partitions; replayed epochs overwrite the
     same partitions (the change_stream idempotency contract).

Per-epoch write volume is O(batch). The candidate join's only shuffle
key is the LSH bucket; at 100 TB the bucket index is the natural
bucketed/partitioned table and the exact-cosine verify touches only
band-colliding pairs. The assignment index stores (vec_id, bucket,
embedding) — vectors ride along so verification never re-reads the
vector table.

``pq=True`` swaps that trade for the at-scale one: the bucket index
stores PQ CODES (similarity.pq_encode — m bytes/vector instead of a
raw float array, a 32-64× cut on the only index that grows without
bound), candidates are pre-scored with ADC against the batch vector,
and only candidates within ``adc_margin`` of the threshold get the
exact-cosine rerank — a bounded semi-join re-read of just those
accepted vectors. Precision stays exact (the rerank decides); recall
is bounded by LSH ∧ ADC-prefilter, with the margin as the knob.
Codebooks are trained once on the first batch and persisted under
``_pq/`` (save_index_artifact), so codes stay comparable across the
index's whole lifetime — retraining mid-stream would silently corrupt
every earlier epoch's codes.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: raw ingest schema
EMB_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)


@dataclass
class EmbeddingIngestor:
    """foreachBatch sink applying the semantic acceptance gauntlet."""

    target_dir: str
    dim: int
    threshold: float = 0.92
    num_planes: int = 6
    num_tables: int = 2
    seed: int = 0
    pq: bool = False
    pq_m: int = 8
    pq_ksub: int = 16
    adc_margin: float = 0.05

    def _path(self, name: str) -> str:
        return os.path.join(self.target_dir, name)

    def _check_mode(self) -> None:
        """Fail fast on a PQ-mode flip against an existing index.

        The persisted buckets index has different columns per mode (PQ
        stores ``codes``, raw mode stores ``nvec``), and PQ codes are only
        comparable under one codebook lifetime — so running ``--pq``
        against a target previously ingested without it (or vice versa,
        or with different m/ksub) would fail mid-stream with an opaque
        missing-column error, or worse, silently mis-score. The mode is
        recorded beside the index on first use and validated every batch
        (ADVICE r5)."""
        import json

        marker = os.path.join(self.target_dir, _MIGRATION_MARKER)
        if os.path.exists(marker):
            raise RuntimeError(
                f"embedding index at {self.target_dir} has a codebook "
                "re-encode migration in progress (or a crashed one) — "
                "codes and codebooks may disagree; finish or re-run "
                "reencode_index before ingesting"
            )
        meta_path = os.path.join(self.target_dir, "_index_meta.json")
        mode = {"pq": self.pq, "pq_m": self.pq_m, "pq_ksub": self.pq_ksub}
        if os.path.exists(meta_path):
            with open(meta_path) as fh:
                saved = json.load(fh)
            if {k: saved.get(k) for k in mode} != mode:
                raise ValueError(
                    f"embedding index at {self.target_dir} was built with "
                    f"mode {saved}, but this ingestor is configured "
                    f"{mode}; PQ codes are only comparable under the "
                    "codebooks that produced them — use a fresh "
                    "target_dir or match the recorded mode"
                )
            return
        os.makedirs(self.target_dir, exist_ok=True)
        with open(meta_path, "w") as fh:
            json.dump(mode, fh)

    def _codebooks(self, batch: DataFrame):
        """Load the persisted PQ codebooks, or train them on this (first)
        batch and persist — train-once/serve-forever, because stored
        codes are only comparable under the codebooks that produced
        them."""
        from ..operators.similarity import (
            load_index_artifact,
            pq_train,
            save_index_artifact,
        )

        path = self._path("_pq")
        if os.path.isdir(path):
            arrays, _meta = load_index_artifact(path)
            return arrays["codebooks"]
        books = pq_train(
            batch, m=self.pq_m, ksub=self.pq_ksub, id_col="vec_id",
            vec_col="embedding",
        )
        save_index_artifact(
            path,
            {"codebooks": books},
            {
                "m": self.pq_m,
                "ksub": self.pq_ksub,
                "trained_on_first_batch": True,
                "generation": 0,
            },
        )
        return books

    def _epoch_index(self, spark, name: str, epoch_id: int):
        path = self._path(name)
        if not os.path.isdir(path):
            return None
        df = spark.read.option("basePath", path).parquet(path)
        return df.filter(F.col("epoch") != epoch_id)

    def _adc_rejects(
        self, spark, assign: DataFrame, prev_idx: DataFrame, books, epoch_id: int
    ) -> DataFrame:
        """PQ-mode near-dup detection: ADC-score the bucket-colliding
        (batch vector, index codes) pairs, then exact-rerank only pairs
        within ``adc_margin`` of the threshold by re-reading just those
        accepted vectors. Returns batch vec_ids to reject."""
        import numpy as np

        from ..operators.similarity import dot_expr, unit_expr

        cand = assign.select("vec_id", "bucket", "nvec").join(
            prev_idx.select(
                "bucket",
                F.col("vec_id").alias("index_id"),
                F.col("codes").alias("icodes"),
            ),
            on="bucket",
        ).select("vec_id", "nvec", "index_id", "icodes")
        bc = spark.sparkContext.broadcast(np.asarray(books, dtype=np.float64))

        def adc(batches):
            import pandas as pd

            bks = bc.value
            m, _ksub, dsub = bks.shape
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                nvecs = np.array(pdf["nvec"].tolist(), dtype=np.float64)
                codes = np.array(pdf["icodes"].tolist(), dtype=np.int64)
                scores = np.zeros(len(pdf))
                for j in range(m):
                    sub = nvecs[:, j * dsub : (j + 1) * dsub]
                    scores += np.einsum("bd,bd->b", sub, bks[j][codes[:, j]])
                yield pd.DataFrame(
                    {
                        "vec_id": pdf["vec_id"].to_numpy(),
                        "index_id": pdf["index_id"].to_numpy(),
                        "adc": scores,
                    }
                )

        survivors = cand.mapInPandas(
            adc, schema="vec_id long, index_id long, adc double"
        ).filter(F.col("adc") >= self.threshold - self.adc_margin)
        prev_vecs = self._epoch_index(spark, "vectors", epoch_id)
        if prev_vecs is None:
            return survivors.select("vec_id").filter(F.lit(False))
        # bounded exact rerank: re-read ONLY the surviving index vectors
        ivecs = prev_vecs.select(
            F.col("vec_id").alias("index_id"),
            unit_expr(F.col("embedding")).alias("ivec"),
        ).join(survivors.select("index_id").distinct(), on="index_id", how="left_semi")
        batch_side = assign.select("vec_id", "nvec").dropDuplicates(["vec_id"])
        return (
            survivors.join(batch_side, on="vec_id")
            .join(ivecs, on="index_id")
            .withColumn("cosine", dot_expr(F.col("nvec"), F.col("ivec")))
            .filter(F.col("cosine") >= self.threshold)
            .select("vec_id")
            .distinct()
        )

    def ingest_batch(self, batch: DataFrame, epoch_id: int) -> None:
        from ..operators.similarity import dot_expr, lsh_assign_scan, pq_encode

        spark = batch.sparkSession
        if batch.isEmpty():
            return
        self._check_mode()
        t0 = time.perf_counter()
        n_in = batch.count()
        batch = batch.dropDuplicates(["vec_id"]).cache()
        try:
            accepted = batch
            n_batch_unique = batch.count()
            prev_vecs = self._epoch_index(spark, "vectors", epoch_id)
            if prev_vecs is not None:
                accepted = accepted.join(
                    prev_vecs.select("vec_id"), on="vec_id", how="left_anti"
                )
            n_new_id = accepted.count()
            assign = lsh_assign_scan(
                accepted,
                self.dim,
                self.num_planes,
                self.seed,
                "vec_id",
                "embedding",
                num_tables=self.num_tables,
            ).select(
                F.col("vid").alias("vec_id"), "bucket", F.col("vec").alias("nvec")
            )
            books = None
            if self.pq:
                books = self._codebooks(accepted)
                codes = pq_encode(accepted, books, id_col="vec_id")
                assign = assign.join(
                    codes.withColumnRenamed("vid", "vec_id"), on="vec_id"
                )
            prev_idx = self._epoch_index(spark, "buckets", epoch_id)
            if prev_idx is not None:
                if self.pq:
                    rejects = self._adc_rejects(
                        spark, assign, prev_idx, books, epoch_id
                    )
                else:
                    cand = assign.join(
                        prev_idx.select(
                            "bucket",
                            F.col("vec_id").alias("index_id"),
                            F.col("nvec").alias("ivec"),
                        ),
                        on="bucket",
                    )
                    rejects = (
                        cand.withColumn(
                            "cosine", dot_expr(F.col("nvec"), F.col("ivec"))
                        )
                        .filter(F.col("cosine") >= self.threshold)
                        .select("vec_id")
                        .distinct()
                    )
                accepted = accepted.join(rejects, on="vec_id", how="left_anti")
                assign = assign.join(rejects, on="vec_id", how="left_anti")
            if self.pq:
                # drift row first (needs nvec + codes together): each
                # accepted vector's self-ADC under the pinned books —
                # the quantization-quality margin drift_status watches
                _write_drift_row(
                    spark,
                    self.target_dir,
                    epoch_id,
                    _self_adc_stats(
                        # one row per vector — multi-table LSH assignment
                        # repeats (nvec, codes) once per table
                        assign.select("vec_id", "nvec", "codes")
                        .dropDuplicates(["vec_id"])
                        .select("nvec", "codes"),
                        books,
                    ),
                    _pq_generation(self.target_dir),
                )
                # the persistent index carries codes, never raw vectors
                assign = assign.drop("nvec")
            n_accepted = accepted.count()
            accepted.write.mode("overwrite").parquet(
                os.path.join(self._path("vectors"), f"epoch={epoch_id}")
            )
            assign.write.mode("overwrite").parquet(
                os.path.join(self._path("buckets"), f"epoch={epoch_id}")
            )
            # per-epoch tier counters, same contract as corpus_ingest's
            # _ingest_stats (ST7-style monitoring for the semantic path)
            spark.createDataFrame(
                [
                    (
                        n_in,
                        n_in - n_batch_unique,
                        n_batch_unique - n_new_id,
                        n_new_id - n_accepted,
                        n_accepted,
                        round(time.perf_counter() - t0, 3),
                    )
                ],
                "n_in long, n_dup_in_batch long, n_dup_vs_index long, "
                "n_neardup_vs_index long, n_accepted long, seconds double",
            ).write.mode("overwrite").parquet(
                os.path.join(self._path("_ingest_stats"), f"epoch={epoch_id}")
            )
        finally:
            batch.unpersist()


def start_embedding_ingest(
    spark: SparkSession,
    source_dir: str,
    target_dir: str,
    checkpoint_dir: str,
    dim: int,
    threshold: float = 0.92,
    once: bool = True,
    pq: bool = False,
):
    """File-source stream → EmbeddingIngestor. ``once=True`` maps to
    Trigger.AvailableNow (drain-and-stop); otherwise micro-batch polling."""
    ingestor = EmbeddingIngestor(
        target_dir=target_dir, dim=dim, threshold=threshold, pq=pq
    )
    stream = spark.readStream.schema(EMB_SCHEMA).parquet(source_dir)
    writer = stream.writeStream.foreachBatch(ingestor.ingest_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if once:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="5 seconds")
    return writer.start()


def read_embedding_index(spark: SparkSession, target_dir: str) -> DataFrame:
    """The accumulated accepted-vector view (all epochs)."""
    path = os.path.join(target_dir, "vectors")
    return spark.read.option("basePath", path).parquet(path)


def ingest_status(spark: SparkSession, target_dir: str) -> dict:
    """Per-tier counters rolled up across epochs — the embedding-path
    twin of corpus_ingest.ingest_status (one shared implementation; the
    tier column names differ per gauntlet, the report shape does not)."""
    from .corpus_ingest import ingest_status as _status

    out = _status(spark, target_dir)
    if os.path.isdir(os.path.join(target_dir, "_drift")):
        out["drift"] = drift_status(spark, target_dir)
    return out


def forget_vectors(
    spark: SparkSession, target_dir: str, vec_ids: list[int]
) -> dict[str, int]:
    """Right-to-be-forgotten for the embedding index: erase vectors and
    their bucket assignments, rewriting only the epoch partitions that
    contain a target id (same erasure-not-suppression contract as
    corpus_ingest.forget_documents — a re-embed of the forgotten item is
    admissible again)."""
    from ..util import staged_overwrite

    ids_df = spark.createDataFrame([(i,) for i in vec_ids], "vec_id long")
    report: dict[str, int] = {}
    for name in ("vectors", "buckets"):
        path = os.path.join(target_dir, name)
        if not os.path.isdir(path):
            report[name] = 0
            continue
        idx = spark.read.option("basePath", path).parquet(path)
        touched = [
            r["epoch"]
            for r in idx.join(ids_df, on="vec_id")
            .select("epoch")
            .distinct()
            .collect()
        ]
        removed = 0
        for ep in touched:
            part = os.path.join(path, f"epoch={ep}")
            df = spark.read.parquet(part)
            kept = df.join(ids_df, on="vec_id", how="left_anti")
            n = df.count() - kept.count()
            if n > 0:
                staged_overwrite(spark, kept, part)
                removed += n
        report[name] = removed
    return report


# ---------------------------------------------------------------------------
# PQ codebook drift maintenance (r11 verdict ask #7). Codebooks train
# once and are pinned (retraining mid-stream would silently corrupt every
# earlier epoch's codes) — but a real corpus DRIFTS, and pinned codebooks
# degrade silently: ADC scores stay plausible while quantization error
# grows. The maintenance loop below is the graph-maintainer pattern
# applied to the one index that silently degrades:
#
#   * every PQ-mode epoch records its SELF-ADC distribution (each
#     accepted vector scored by ADC against ITS OWN code — exactly 1.0
#     minus the quantization error for unit vectors), under the current
#     codebook generation, in ``_drift/epoch=N``;
#   * ``drift_status`` compares each epoch's mean self-ADC against the
#     training epoch's (the baseline the codebooks were fit to) and
#     flags epochs whose margin fell by more than the threshold;
#   * ``reencode_index`` retrains codebooks on the WHOLE accumulated
#     vector set and re-encodes EVERY epoch's codes via the
#     staged-overwrite idiom, bumping the codebook generation and
#     recomputing every drift row — batch-equality (codes == fresh
#     pq_encode under the new books) is pinned by test;
#   * ``maybe_reencode`` is the threshold-gated composition (the live
#     loop calls this; nothing retrains unless drift is measured).
#
# Crash consistency: a ``_migration_in_progress`` marker is written
# before any partition is touched and removed ONLY on the success path,
# after the new codebooks are published — ingest fails fast while it
# exists (codes and codebooks could disagree mid-migration).  Both a
# hard process kill AND a mid-migration exception (e.g. a Spark job
# failure after some epochs' buckets were rewritten with new-generation
# codes) leave the marker in place; recovery is re-running
# ``reencode_index`` to completion (it is idempotent: every output is a
# pure function of the vectors table).
# ---------------------------------------------------------------------------

_MIGRATION_MARKER = "_migration_in_progress"


def _self_adc_stats(df: DataFrame, books) -> tuple[int, float, float]:
    """(n, mean, min) of per-vector self-ADC: ADC score of each unit
    vector against its own PQ code — the quantization-quality margin
    (1.0 = lossless). ``df``: (nvec array, codes array). Distributed
    mapInPandas + one tiny aggregate; only three numbers come back."""
    import numpy as np

    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(np.asarray(books, dtype=np.float64))

    def run(batches):
        import pandas as pd

        bks = bc.value
        m, _ksub, dsub = bks.shape
        for pdf in batches:
            if len(pdf) == 0:
                continue
            nv = np.array(pdf["nvec"].tolist(), dtype=np.float64)
            cd = np.array(pdf["codes"].tolist(), dtype=np.int64)
            sc = np.zeros(len(pdf))
            for j in range(m):
                sc += np.einsum(
                    "bd,bd->b", nv[:, j * dsub : (j + 1) * dsub], bks[j][cd[:, j]]
                )
            yield pd.DataFrame({"adc": sc})

    row = (
        df.select("nvec", "codes")
        .mapInPandas(run, "adc double")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("adc").alias("mean"),
            F.min("adc").alias("mn"),
        )
        .first()
    )
    if not row or row["n"] == 0:
        return 0, float("nan"), float("nan")
    return int(row["n"]), float(row["mean"]), float(row["mn"])


def _pq_generation(target_dir: str) -> int:
    import json

    meta_path = os.path.join(target_dir, "_pq", "meta.json")
    if not os.path.exists(meta_path):
        return 0
    with open(meta_path) as fh:
        return int(json.load(fh).get("generation", 0))


def _write_drift_row(
    spark: SparkSession,
    target_dir: str,
    epoch_id: int,
    stats: tuple[int, float, float],
    generation: int,
) -> None:
    n, mean, mn = stats
    spark.createDataFrame(
        [(n, mean, mn, generation)],
        "n long, self_adc_mean double, self_adc_min double, generation long",
    ).write.mode("overwrite").parquet(
        os.path.join(target_dir, "_drift", f"epoch={epoch_id}")
    )


def drift_status(
    spark: SparkSession, target_dir: str, drift_threshold: float = 0.1
) -> dict:
    """Per-epoch codebook-drift report for a PQ-mode index: each epoch's
    mean self-ADC vs the baseline (the lowest epoch at the CURRENT
    codebook generation — the distribution the books were fit to), and
    the epochs whose margin fell by more than ``drift_threshold``.

    Threshold calibration: the baseline is TRAIN-SET self-ADC, which is
    optimistic — same-distribution follow-up epochs sit a little below
    it (≈0.05 at a 30-vector training batch in the test fixture; the
    gap shrinks as the training batch grows). A real distribution shift
    is an order of magnitude larger (0.53 in the same fixture), so the
    default 0.1 sits safely between the two regimes."""
    path = os.path.join(target_dir, "_drift")
    if not os.path.isdir(path):
        return {"epochs": [], "baseline": None, "flagged": [], "generation": 0}
    gen = _pq_generation(target_dir)
    rows = sorted(
        (
            r.asDict()
            for r in spark.read.option("basePath", path)
            .parquet(path)
            .filter(F.col("generation") == gen)
            .collect()
        ),
        key=lambda r: r["epoch"],
    )
    if not rows:
        return {"epochs": [], "baseline": None, "flagged": [], "generation": gen}
    baseline = rows[0]["self_adc_mean"]
    flagged = [
        r["epoch"]
        for r in rows
        if baseline - r["self_adc_mean"] > drift_threshold
    ]
    return {
        "epochs": [
            {
                "epoch": r["epoch"],
                "n": r["n"],
                "self_adc_mean": r["self_adc_mean"],
                "self_adc_min": r["self_adc_min"],
                "drift": round(baseline - r["self_adc_mean"], 6),
            }
            for r in rows
        ],
        "baseline": baseline,
        "flagged": flagged,
        "generation": gen,
    }


def reencode_index(
    spark: SparkSession, target_dir: str, sample_size: int = 4096
) -> dict:
    """Retrain the PQ codebooks on the WHOLE accumulated vector set and
    re-encode every epoch's codes — the migration that repairs measured
    drift. Every epoch partition is rewritten via staged_overwrite, the
    new codebooks are published last (generation += 1), and every drift
    row is recomputed under the new books; a ``_migration_in_progress``
    marker makes ingest fail fast during the window where codes and
    codebooks could disagree. Idempotent: outputs are pure functions of
    the vectors table, so a crashed migration is simply re-run."""
    import json

    import numpy as np

    from ..operators.similarity import (
        load_index_artifact,
        pq_encode,
        pq_train,
        save_index_artifact,
        unit_expr,
    )
    from ..util import staged_overwrite

    pq_dir = os.path.join(target_dir, "_pq")
    _arrays, meta = load_index_artifact(pq_dir)
    m, ksub = int(meta["m"]), int(meta["ksub"])
    marker = os.path.join(target_dir, _MIGRATION_MARKER)
    with open(marker, "w") as fh:
        fh.write("reencode_index")
    try:
        vec_path = os.path.join(target_dir, "vectors")
        all_vecs = spark.read.option("basePath", vec_path).parquet(vec_path)
        books = pq_train(all_vecs, m=m, ksub=ksub, sample_size=sample_size)
        epochs = sorted(
            r["epoch"] for r in all_vecs.select("epoch").distinct().collect()
        )
        gen = int(meta.get("generation", 0)) + 1
        n_total = 0
        for ep in epochs:
            vecs = spark.read.parquet(
                os.path.join(vec_path, f"epoch={ep}")
            )
            codes = pq_encode(vecs, books).withColumnRenamed("vid", "vec_id")
            bpart = os.path.join(target_dir, "buckets", f"epoch={ep}")
            old = spark.read.parquet(bpart)
            new = old.drop("codes").join(codes, on="vec_id")
            # count BEFORE the overwrite — the lazy plan reads the files
            # staged_overwrite is about to replace
            n_total += new.count()
            staged_overwrite(spark, new, bpart)
            stats = _self_adc_stats(
                vecs.select(
                    "vec_id", unit_expr(F.col("embedding")).alias("nvec")
                ).join(codes, on="vec_id"),
                books,
            )
            _write_drift_row(spark, target_dir, ep, stats, gen)
        # publish the new codebooks LAST (stage dir + atomic rename)
        stage = pq_dir + ".stage"
        import shutil

        shutil.rmtree(stage, ignore_errors=True)
        save_index_artifact(
            stage,
            {"codebooks": np.asarray(books)},
            {**meta, "generation": gen, "retrained_on": "all_epochs"},
        )
        shutil.rmtree(pq_dir)
        os.replace(stage, pq_dir)
    except BaseException:
        # Leave the marker in place: some epoch bucket partitions may
        # already carry new-generation codes while _pq still publishes
        # the old codebooks.  Ingest must keep failing fast until
        # reencode_index is re-run to completion (it is idempotent).
        raise
    os.remove(marker)
    return {"generation": gen, "epochs": epochs, "n_reencoded": n_total}


def maybe_reencode(
    spark: SparkSession, target_dir: str, drift_threshold: float = 0.1
) -> dict:
    """Threshold-gated re-encode: measure drift, migrate only if an
    epoch's self-ADC margin fell more than ``drift_threshold`` below the
    training baseline (the graph-maintainer refresh pattern — nothing
    retrains unless degradation is measured)."""
    st = drift_status(spark, target_dir, drift_threshold)
    if not st["flagged"]:
        return {"action": "none", "status": st}
    report = reencode_index(spark, target_dir)
    return {
        "action": "reencoded",
        "status_before": st,
        "report": report,
        "status_after": drift_status(spark, target_dir, drift_threshold),
    }
