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
vector table; at scale swap the embedding column for PQ codes
(similarity.pq_encode) and verify on ADC scores + a rerank read.
"""

from __future__ import annotations

import os
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

    def _path(self, name: str) -> str:
        return os.path.join(self.target_dir, name)

    def _epoch_index(self, spark, name: str, epoch_id: int):
        path = self._path(name)
        if not os.path.isdir(path):
            return None
        df = spark.read.option("basePath", path).parquet(path)
        return df.filter(F.col("epoch") != epoch_id)

    def ingest_batch(self, batch: DataFrame, epoch_id: int) -> None:
        from ..operators.similarity import dot_expr, lsh_assign_scan

        spark = batch.sparkSession
        if batch.isEmpty():
            return
        batch = batch.dropDuplicates(["vec_id"]).cache()
        try:
            accepted = batch
            prev_vecs = self._epoch_index(spark, "vectors", epoch_id)
            if prev_vecs is not None:
                accepted = accepted.join(
                    prev_vecs.select("vec_id"), on="vec_id", how="left_anti"
                )
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
            prev_idx = self._epoch_index(spark, "buckets", epoch_id)
            if prev_idx is not None:
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
            accepted.write.mode("overwrite").parquet(
                os.path.join(self._path("vectors"), f"epoch={epoch_id}")
            )
            assign.write.mode("overwrite").parquet(
                os.path.join(self._path("buckets"), f"epoch={epoch_id}")
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
):
    """File-source stream → EmbeddingIngestor. ``once=True`` maps to
    Trigger.AvailableNow (drain-and-stop); otherwise micro-batch polling."""
    ingestor = EmbeddingIngestor(target_dir=target_dir, dim=dim, threshold=threshold)
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
