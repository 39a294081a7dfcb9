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
    """foreachBatch sink applying the corpus acceptance gauntlet."""

    target_dir: str
    applied_batches: list[int] = field(default_factory=list)

    def _path(self, name: str) -> str:
        return os.path.join(self.target_dir, name)

    def ingest_batch(self, batch: DataFrame, epoch_id: int) -> None:
        from ..operators.textops import fingerprint_expr, quality_filter
        from ..util import parquet_exists

        spark = batch.sparkSession
        if batch.isEmpty():
            return
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
            index_path = self._path("_fingerprints")
            if parquet_exists(index_path) or os.path.isdir(index_path):
                index = spark.read.option("basePath", index_path).parquet(index_path)
                # a replayed epoch must not reject its OWN rows
                index = index.filter(F.col("epoch") != epoch_id).select("fingerprint")
                accepted = batch_unique.join(index, on="fingerprint", how="left_anti")
            else:
                accepted = batch_unique
            accepted = accepted.cache()
            n_accepted = accepted.count()

            # 4. idempotent epoch appends
            accepted.drop("fingerprint").write.mode("overwrite").parquet(
                os.path.join(self._path("corpus"), f"epoch={epoch_id}")
            )
            accepted.select("fingerprint").write.mode("overwrite").parquet(
                os.path.join(index_path, f"epoch={epoch_id}")
            )
            stats = spark.createDataFrame(
                [
                    (
                        n_in,
                        n_in - n_quality,
                        n_quality - n_batch_unique,
                        n_batch_unique - n_accepted,
                        n_accepted,
                    )
                ],
                "n_in long, n_quality_rejected long, n_dup_in_batch long, "
                "n_dup_vs_corpus long, n_accepted long",
            )
            stats.write.mode("overwrite").parquet(
                os.path.join(self._path("_ingest_stats"), f"epoch={epoch_id}")
            )
            accepted.unpersist()
            self.applied_batches.append(epoch_id)
        finally:
            batch.unpersist()


def start_corpus_ingest(
    spark: SparkSession,
    source_dir: str,
    target_dir: str,
    checkpoint_dir: str,
    once: bool = True,
):
    """Wire a JSON-lines document queue → CorpusIngestor → streaming
    query (Trigger.AvailableNow for --once parity, like change_stream)."""
    ingestor = CorpusIngestor(target_dir=target_dir)
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
