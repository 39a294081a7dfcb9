"""Incremental corpus ingestion — the streaming face of the
training-data pipeline.

Each micro-batch of raw documents runs the acceptance gauntlet inside
``foreachBatch``:

  1. **Quality filter** — the C4-style integer rule cascade
     (operators/textops.quality_filter); rejects carry their first
     failing rule.
  2. **Within-batch exact dedup** — fingerprint groups keep the lowest
     doc_id (operators/textops.fingerprint_expr).
  3. **Against-corpus exact dedup** — anti-join on the accumulated
     fingerprint index: a document identical to anything already
     accepted (any earlier epoch) is dropped.
  4. **Append** — accepted docs and their fingerprints land as their own
     ``epoch=<id>`` partitions; a replayed epoch overwrites the same
     partitions, so at-least-once delivery cannot duplicate (the same
     idempotency contract as change_stream's raw log).

Per-epoch write volume is O(batch); the index read is (fingerprint,
epoch) pairs only. At 100 TB the fingerprint index is the natural
bucketed table (hash-uniform key) and the anti-join shuffles hashes,
never documents; the delta-vs-index LSH tier
(dedup.lsh_incremental_candidates) slots in after step 3 for near-dup
rejection with the same shape.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: raw ingest schema (the documents-table shape, minus derived columns)
DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
    ]
)


@dataclass
class CorpusIngestor:
    """foreachBatch sink applying the corpus acceptance gauntlet.

    ``near_dup=True`` adds tier 3b: the batch's minhash signatures are
    banded against the accumulated signature index
    (dedup.lsh_incremental_candidates) and any batch doc that band-
    collides with an already-accepted doc is rejected. Band collision is
    a high-recall/imperfect-precision rule; the per-bucket cap bounds
    degenerate collisions — the documented trade for an O(delta)
    streaming tier.

    ``maintain_term_stats=True`` adds tier 4b: the accepted docs'
    retrieval index halves — (doc_id, term, tf) and (doc_id, dl), the
    exact pair operators/retrieval.term_stats builds from a batch corpus
    — are appended as their own epoch partitions. The corpus is
    append-only past the gauntlet, so maintenance is PURE INSERTION:
    per-epoch work is O(batch tokens), a replayed epoch overwrites its
    own partitions (same idempotency as the corpus itself), and
    ``read_term_stats`` feeds the rankers' ``stats=`` parameter so
    freshly ingested documents are retrievable without re-tokenizing the
    accumulated corpus. Collection statistics (df, total tokens, N) are
    computed by the rankers FROM these tables at query time — they are
    one map-side aggregate over the index, never over the raw text.

    ``verify_jaccard=<threshold>`` upgrades tier 3b to verified
    precision: band collision only NOMINATES; the colliding accepted
    docs' text is re-read from the corpus (only those docs — a semi-join
    on the candidate ids, never a corpus scan of text) and the batch doc
    is rejected only when its exact shingle Jaccard against some
    colliding accepted doc reaches the threshold. Cost stays O(delta):
    the re-read side is bounded by the candidate pairs the bucket cap
    already bounds."""

    target_dir: str
    near_dup: bool = False
    verify_jaccard: float | None = None
    maintain_term_stats: bool = False
    applied_batches: list[int] = field(default_factory=list)

    def _path(self, name: str) -> str:
        return os.path.join(self.target_dir, name)

    def _epoch_index(self, spark, name: str, epoch_id: int):
        """All rows of an epoch-partitioned index EXCEPT the current
        epoch's (a replayed epoch must not reject its own rows)."""
        path = self._path(name)
        if not os.path.isdir(path):
            return None
        df = spark.read.option("basePath", path).parquet(path)
        return df.filter(F.col("epoch") != epoch_id)

    def _verified_hits(
        self, spark, accepted: DataFrame, pairs: DataFrame, epoch_id: int
    ) -> DataFrame:
        """Tier 3b verification: exact shingle Jaccard on the band-colliding
        pairs only. Each side's shingle sets are built from just the
        colliding docs (semi-join), the pair intersection is a pair-local
        codegen ``array_intersect`` — no corpus self-join, no shuffle keyed
        on shingle. Returns the batch doc_ids to reject."""
        from ..operators.dedup import doc_shingles

        pairs = pairs.cache()
        corpus_prev = self._epoch_index(spark, "corpus", epoch_id)
        if corpus_prev is None:
            return pairs.select(F.col("new_doc").alias("doc_id")).filter(F.lit(False))
        new_ids = pairs.select(F.col("new_doc").alias("doc_id")).distinct()
        idx_ids = pairs.select(F.col("index_doc").alias("doc_id")).distinct()
        new_sets = (
            doc_shingles(accepted.join(new_ids, on="doc_id", how="left_semi"))
            .groupBy("doc_id")
            .agg(F.collect_set("shingle").alias("s_new"))
            .withColumnRenamed("doc_id", "new_doc")
        )
        idx_sets = (
            doc_shingles(corpus_prev.join(idx_ids, on="doc_id", how="left_semi"))
            .groupBy("doc_id")
            .agg(F.collect_set("shingle").alias("s_idx"))
            .withColumnRenamed("doc_id", "index_doc")
        )
        inter = F.size(F.array_intersect(F.col("s_new"), F.col("s_idx")))
        jac = inter / (F.size("s_new") + F.size("s_idx") - inter)
        return (
            pairs.join(new_sets, on="new_doc")
            .join(idx_sets, on="index_doc")
            .withColumn("jaccard", jac)
            .filter(F.col("jaccard") >= self.verify_jaccard)
            .select(F.col("new_doc").alias("doc_id"))
            .distinct()
        )

    def ingest_batch(self, batch: DataFrame, epoch_id: int) -> None:
        from ..operators.dedup import (
            doc_shingles,
            lsh_incremental_candidates,
            minhash_signatures,
        )
        from ..operators.textops import fingerprint_expr, quality_filter

        spark = batch.sparkSession
        if batch.isEmpty():
            return
        t0 = time.perf_counter()
        batch = batch.cache()
        try:
            n_in = batch.count()

            # 1. quality gate
            verdicts = quality_filter(batch).select(
                "doc_id", "keep", "reject_reason"
            )
            quality_ok = (
                batch.join(verdicts, on="doc_id")
                .filter(F.col("keep"))
                .drop("keep", "reject_reason")
            )
            n_quality = quality_ok.count()

            # 2. within-batch exact dedup (lowest doc_id survives)
            fp = quality_ok.withColumn("fingerprint", fingerprint_expr(F.col("text")))
            w_min = fp.groupBy("fingerprint").agg(F.min("doc_id").alias("doc_id"))
            batch_unique = fp.join(w_min, on=["fingerprint", "doc_id"], how="left_semi")
            n_batch_unique = batch_unique.count()

            # 3. against-corpus exact dedup (anti-join on the index)
            index = self._epoch_index(spark, "_fingerprints", epoch_id)
            if index is not None:
                accepted = batch_unique.join(
                    index.select("fingerprint"), on="fingerprint", how="left_anti"
                )
            else:
                accepted = batch_unique
            accepted = accepted.cache()
            n_exact = accepted.count()

            # 3b. against-corpus NEAR-dup rejection (optional)
            batch_sigs = None
            if self.near_dup:
                batch_sigs = minhash_signatures(doc_shingles(accepted)).cache()
                sig_index = self._epoch_index(spark, "_signatures", epoch_id)
                if sig_index is not None:
                    pairs = lsh_incremental_candidates(
                        batch_sigs, sig_index.select("doc_id", "sig")
                    )
                    if self.verify_jaccard is not None:
                        hits = self._verified_hits(spark, accepted, pairs, epoch_id)
                    else:
                        hits = pairs.select(
                            F.col("new_doc").alias("doc_id")
                        ).distinct()
                    accepted = accepted.join(hits, on="doc_id", how="left_anti").cache()
            n_accepted = accepted.count()

            # 4. idempotent epoch appends
            accepted.drop("fingerprint").write.mode("overwrite").parquet(
                os.path.join(self._path("corpus"), f"epoch={epoch_id}")
            )
            accepted.select("fingerprint").write.mode("overwrite").parquet(
                os.path.join(self._path("_fingerprints"), f"epoch={epoch_id}")
            )
            if self.near_dup:
                accepted.select("doc_id").join(batch_sigs, on="doc_id").write.mode(
                    "overwrite"
                ).parquet(os.path.join(self._path("_signatures"), f"epoch={epoch_id}"))
            if self.maintain_term_stats:
                from ..operators.retrieval import term_stats

                tf, dl = term_stats(accepted)
                tf.write.mode("overwrite").parquet(
                    os.path.join(self._path("_term_tf"), f"epoch={epoch_id}")
                )
                dl.write.mode("overwrite").parquet(
                    os.path.join(self._path("_doc_len"), f"epoch={epoch_id}")
                )
            stats = spark.createDataFrame(
                [
                    (
                        n_in,
                        n_in - n_quality,
                        n_quality - n_batch_unique,
                        n_batch_unique - n_exact,
                        n_exact - n_accepted,
                        n_accepted,
                        round(time.perf_counter() - t0, 3),
                    )
                ],
                "n_in long, n_quality_rejected long, n_dup_in_batch long, "
                "n_dup_vs_corpus long, n_neardup_vs_corpus long, n_accepted long, "
                "seconds double",
            )
            stats.write.mode("overwrite").parquet(
                os.path.join(self._path("_ingest_stats"), f"epoch={epoch_id}")
            )
            accepted.unpersist()
            if batch_sigs is not None:
                batch_sigs.unpersist()
            self.applied_batches.append(epoch_id)
        finally:
            batch.unpersist()


def start_corpus_ingest(
    spark: SparkSession,
    source_dir: str,
    target_dir: str,
    checkpoint_dir: str,
    once: bool = True,
    near_dup: bool = False,
    verify_jaccard: float | None = None,
    maintain_term_stats: bool = False,
):
    """Wire a JSON-lines document queue → CorpusIngestor → streaming
    query (Trigger.AvailableNow for --once parity, like change_stream)."""
    ingestor = CorpusIngestor(
        target_dir=target_dir, near_dup=near_dup, verify_jaccard=verify_jaccard,
        maintain_term_stats=maintain_term_stats,
    )
    stream = (
        spark.readStream.schema(DOC_SCHEMA).option("maxFilesPerTrigger", 10).json(source_dir)
    )
    writer = (
        stream.writeStream.foreachBatch(ingestor.ingest_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    writer = writer.trigger(availableNow=True) if once else writer.trigger(
        processingTime="60 seconds"
    )
    return writer.start(), ingestor


def read_corpus(spark: SparkSession, target_dir: str) -> DataFrame:
    """The accepted corpus across all epochs."""
    path = os.path.join(target_dir, "corpus")
    return spark.read.option("basePath", path).parquet(path)


def read_term_stats(spark: SparkSession, target_dir: str):
    """The incrementally maintained (tf, dl) pair across all epochs — the
    drop-in value for the rankers' ``stats=`` parameter:

        tf, dl = read_term_stats(spark, tgt)
        bm25_topk(read_corpus(spark, tgt), qterms, stats=(tf, dl))

    Equal by construction to ``term_stats(read_corpus(...))`` (pinned by
    tests/test_corpus_ingest.py): accepted docs are never mutated and a
    doc's (term, tf)/(dl) rows depend on that doc alone, so the
    per-epoch union IS the batch build. Raises FileNotFoundError when the
    ingest ran without ``maintain_term_stats`` — the caller should fall
    back to the batch build rather than silently retrieve over nothing."""
    tf_path = os.path.join(target_dir, "_term_tf")
    dl_path = os.path.join(target_dir, "_doc_len")
    if not (os.path.isdir(tf_path) and os.path.isdir(dl_path)):
        raise FileNotFoundError(
            f"no maintained term stats under {target_dir} — ingest ran "
            f"without maintain_term_stats=True; build them batch-side via "
            f"operators.retrieval.term_stats(read_corpus(...))"
        )
    tf = spark.read.option("basePath", tf_path).parquet(tf_path).select(
        "doc_id", "term", "tf"
    )
    dl = spark.read.option("basePath", dl_path).parquet(dl_path).select(
        "doc_id", "dl"
    )
    return tf, dl


def ingest_status(spark: SparkSession, target_dir: str) -> dict:
    """ST7-style monitoring for the corpus-ingest path: the per-epoch
    rows-in / rejected-per-tier / seconds counters each ``ingest_batch``
    persisted under ``_ingest_stats``, rolled up the way
    ``monitor.stream_status`` reports the CDC path — epochs processed,
    lifetime totals per tier, and the last epoch's row (the live-lag
    signal: a growing ``seconds`` or collapsing acceptance rate is the
    backpressure indicator). One bounded aggregate collect; works on a
    live or stopped target."""
    path = os.path.join(target_dir, "_ingest_stats")
    if not os.path.isdir(path):
        return {"epochs": 0, "totals": {}, "last_epoch": None}
    # mergeSchema: epochs written before a counter column existed (the
    # 'seconds' column was added later) must not make the sums depend on
    # which footer Spark happens to sample — missing columns read NULL.
    # A stats dir can also exist with zero files/rows (crash between
    # mkdir and write): schema inference raises, or totals_row would be
    # all-NULL and the epoch==NULL probe .first()s into None — report
    # the empty status instead of raising in both shapes.
    from pyspark.errors import AnalysisException

    try:
        stats = spark.read.option("basePath", path).option(
            "mergeSchema", "true"
        ).parquet(path)
        if not stats.head(1):
            return {"epochs": 0, "totals": {}, "last_epoch": None}
    except AnalysisException:
        return {"epochs": 0, "totals": {}, "last_epoch": None}
    counter_cols = [c for c in stats.columns if c != "epoch"]
    totals_row = stats.select(
        *[F.sum(c).alias(c) for c in counter_cols],
        F.count("*").alias("_epochs"),
        F.max("epoch").alias("_last"),
    ).first()
    last = (
        stats.filter(F.col("epoch") == totals_row["_last"])
        .first()
        .asDict()
    )
    return {
        "epochs": int(totals_row["_epochs"]),
        "totals": {
            c: (
                float(totals_row[c] or 0.0)
                if c == "seconds"
                else int(totals_row[c] or 0)
            )
            for c in counter_cols
        },
        "last_epoch": last,
    }


def compact_ingest_indexes(spark: SparkSession, target_dir: str) -> None:
    """Maintenance job: collapse the per-epoch fingerprint/signature
    index partitions into one ``epoch=0`` partition each, bounding the
    partition listing cost for long-running queues (the corpus itself
    keeps its epoch layout — that IS the shard structure downstream
    consumers want). Same posture as change_stream.compact_change_log:
    run with the streaming query stopped. Caveat (shared with the change
    log): compacted rows live under ``epoch=0``, so compact only after
    epoch 0 can no longer be replayed (its checkpoint offset is
    committed) — otherwise an epoch-0 replay would exclude the whole
    compacted index from its own-rows filter."""
    import shutil

    from ..util import staged_overwrite

    # _term_tf/_doc_len join the list: they are never read by the ingest
    # gauntlet (no own-rows replay concern), their rows are unique per
    # doc, and a long-running queue otherwise accumulates one partition
    # per epoch on the retrieval hot path
    for name in ("_fingerprints", "_signatures", "_term_tf", "_doc_len"):
        path = os.path.join(target_dir, name)
        if not os.path.isdir(path):
            continue
        compacted = (
            spark.read.option("basePath", path).parquet(path).drop("epoch").distinct()
        )
        staged_overwrite(
            spark, compacted, os.path.join(path + ".compact", "epoch=0")
        )
        shutil.rmtree(path)
        os.rename(path + ".compact", path)


def forget_documents(
    spark: SparkSession, target_dir: str, doc_ids: list[int]
) -> dict[str, int]:
    """Right-to-be-forgotten: remove documents AND their derived index
    rows (fingerprints, minhash signatures) from an ingested corpus.

    Only epoch partitions that actually contain a target doc are
    rewritten (partition-pruned scan finds them; each rewrite goes
    through ``staged_overwrite`` because the rewrite reads the partition
    it replaces). The fingerprints to remove are recomputed from the
    corpus rows being deleted — the fingerprint index stores no doc_id
    by design (it is a set).

    Consequence, by design: once the fingerprint is gone, a future
    re-crawl of the forgotten text is ADMITTED again. If policy requires
    permanent suppression instead of erasure, keep a separate tombstone
    fingerprint set and check it in the ingest gauntlet — erasure and
    suppression are different legal obligations; this function implements
    erasure.

    Returns per-index removed-row counts.
    """
    from ..operators.textops import fingerprint_expr
    from ..util import staged_overwrite

    ids_df = spark.createDataFrame([(i,) for i in doc_ids], "doc_id long")
    report: dict[str, int] = {}

    corpus_path = os.path.join(target_dir, "corpus")
    corpus = spark.read.option("basePath", corpus_path).parquet(corpus_path)
    victims = corpus.join(ids_df, on="doc_id").select(
        "doc_id", "epoch", fingerprint_expr(F.col("text")).alias("fingerprint")
    ).cache()
    try:
        touched = [r["epoch"] for r in victims.select("epoch").distinct().collect()]
        fps = victims.select("fingerprint").distinct()
        report["corpus"] = victims.count()

        def _rewrite(name: str, filter_join):
            path = os.path.join(target_dir, name)
            if not os.path.isdir(path):
                return 0
            removed = 0
            # epoch 0 is always considered in addition to the victims'
            # corpus epochs: compact_ingest_indexes collapses every
            # per-epoch index partition into epoch=0 while the corpus
            # keeps its layout, so after a compaction the rows to erase
            # live in a partition no victim's corpus epoch points at
            # (the compact-then-forget hole — r9 review finding)
            for ep in sorted({0, *touched}):
                part = os.path.join(path, f"epoch={ep}")
                if not os.path.isdir(part):
                    continue
                df = spark.read.parquet(part)
                kept = filter_join(df)
                n = df.count() - kept.count()
                if n > 0:
                    staged_overwrite(spark, kept, part)
                    removed += n
            return removed

        report["corpus"] = _rewrite(
            "corpus", lambda df: df.join(ids_df, on="doc_id", how="left_anti")
        )
        report["_fingerprints"] = _rewrite(
            "_fingerprints",
            lambda df: df.join(fps, on="fingerprint", how="left_anti"),
        )
        report["_signatures"] = _rewrite(
            "_signatures", lambda df: df.join(ids_df, on="doc_id", how="left_anti")
        )
        # the maintained retrieval index is doc_id-keyed like signatures:
        # erasing the doc's tf/dl rows removes it from future rankings
        # (collection stats are derived at query time, so they shift
        # automatically)
        report["_term_tf"] = _rewrite(
            "_term_tf", lambda df: df.join(ids_df, on="doc_id", how="left_anti")
        )
        report["_doc_len"] = _rewrite(
            "_doc_len", lambda df: df.join(ids_df, on="doc_id", how="left_anti")
        )
        return report
    finally:
        victims.unpersist()
