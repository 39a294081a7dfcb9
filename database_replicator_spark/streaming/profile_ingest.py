"""Streaming profile maintenance — per-epoch mergeable profile states.

Completes "every batch index has a streaming maintainer" (term stats r9,
graph deltas r10, profile r11 — r10 verdict ask #6): each micro-batch
appends PARTIAL profile states for its rows — a wide one-row summary
(count / per-column nulls / native-typed min / max), per-column KMV
sketches (distinct estimation), and per-column fixed-point KLL sketches
(percentiles) — as idempotent ``epoch=<id>`` parquet partitions, exactly
the ``maintain_term_stats`` idiom. :func:`read_profile` merges them on
read: sums/extrema fold exactly, KMV merges by union-of-minima (state
identical to a batch build — order-free), KLL merges through the
order-canonical fold (operators/kll.py), so the served profile equals
the batch ``profile_table``/``profile_percentiles`` pair over the full
corpus without ever rescanning history (equality pinned by
tests/test_profile_ingest.py).

Scale shape: per-epoch write volume is O(columns · sketch size), not
O(rows); the read-side merge is one groupBy over (epochs × columns)
k-bounded states. Reference parity: the reference keeps only exact
MIN/MAX/COUNT verify aggregates recomputed per run (src/verify.rs);
maintained mergeable profiles are replica-scale extension surface.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: fixed-point scale for KLL percentile states (exact for ≤6-dp values —
#: the repo's canonical grain, same constant as profile_percentiles)
_SCALE = 1_000_000

_NUMERIC = (
    T.LongType, T.IntegerType, T.ShortType, T.ByteType,
    T.DoubleType, T.FloatType, T.DecimalType,
)


def _numeric_cols(df: DataFrame, columns: list[str] | None) -> list[str]:
    return [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, _NUMERIC)
        and (columns is None or f.name in columns)
    ]


def _melt_fixed_point(df: DataFrame, cols: list[str]) -> DataFrame:
    melted = None
    for c in cols:
        part = df.select(
            F.lit(c).alias("column_name"),
            (F.col(c).cast("decimal(28,6)") * _SCALE)
            .cast("bigint")
            .alias("_v"),
        ).filter(F.col("_v").isNotNull())
        melted = part if melted is None else melted.unionByName(part)
    return melted


@dataclass
class ProfileMaintainer:
    """foreachBatch sink appending per-epoch profile partials under
    ``target_dir``: ``_profile_summary`` (wide, native min/max types),
    ``_profile_kmv`` and ``_profile_kll`` (long form per column)."""

    target_dir: str
    columns: list[str] | None = None
    kll_k: int = 16384
    kmv_k: int = 256
    applied_batches: list[int] = field(default_factory=list)

    def _path(self, name: str, epoch_id: int) -> str:
        return os.path.join(self.target_dir, name, f"epoch={epoch_id}")

    def ingest_batch(self, batch: DataFrame, epoch_id: int) -> None:
        from ..operators.kll import kll_sketch
        from ..operators.sketch import kmv_sketch

        if batch.isEmpty():
            return
        batch = batch.cache()
        try:
            cols = [
                c for c in batch.columns
                if self.columns is None or c in self.columns
            ]
            aggs = [F.count(F.lit(1)).alias("_n")]
            for c in cols:
                aggs += [
                    F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(
                        f"_nulls_{c}"
                    ),
                    F.min(F.col(c)).alias(f"_min_{c}"),
                    F.max(F.col(c)).alias(f"_max_{c}"),
                ]
            batch.agg(*aggs).write.mode("overwrite").parquet(
                self._path("_profile_summary", epoch_id)
            )

            melted_any = None
            for c in cols:
                part = batch.select(
                    F.lit(c).alias("column_name"),
                    F.col(c).cast("string").alias("_v"),
                ).filter(F.col("_v").isNotNull())
                melted_any = (
                    part if melted_any is None else melted_any.unionByName(part)
                )
            kmv_sketch(
                melted_any, ["column_name"], "_v", k=self.kmv_k
            ).write.mode("overwrite").parquet(
                self._path("_profile_kmv", epoch_id)
            )

            num = _numeric_cols(batch, self.columns)
            if num:
                # merge_partitions=1: grain = profiled column list
                # (schema-bounded, the estimation.profile_percentiles
                # lever)
                kll_sketch(
                    _melt_fixed_point(batch, num),
                    ["column_name"],
                    "_v",
                    k=self.kll_k,
                    merge_partitions=1,
                ).write.mode("overwrite").parquet(
                    self._path("_profile_kll", epoch_id)
                )
            self.applied_batches.append(epoch_id)
        finally:
            batch.unpersist()


def start_profile_ingest(
    spark: SparkSession,
    source_dir: str,
    target_dir: str,
    checkpoint_dir: str,
    schema: str | T.StructType,
    columns: list[str] | None = None,
    once: bool = True,
    max_files_per_trigger: int = 10,
):
    """Wire a parquet drop directory → ProfileMaintainer → streaming
    query (Trigger.AvailableNow for --once parity, like change_stream /
    corpus_ingest / graph_ingest)."""
    maintainer = ProfileMaintainer(target_dir=target_dir, columns=columns)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    writer = (
        stream.writeStream.foreachBatch(maintainer.ingest_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    writer = writer.trigger(availableNow=True) if once else writer.trigger(
        processingTime="60 seconds"
    )
    return writer.start(), maintainer


def read_profile(
    spark: SparkSession,
    target_dir: str,
    percents: list[int] = (50, 90, 99),
    kll_k: int = 16384,
    kmv_k: int = 256,
) -> DataFrame:
    """The maintained profile, merged on read: ``(column_name, n_rows,
    n_nulls, n_distinct_est, min_value, max_value, p50, …)`` — n/nulls/
    extrema fold exactly across epochs, n_distinct from the merged KMV
    state (identical to a single-shot sketch of the full corpus),
    percentiles from the canonically merged KLL states (exact while a
    column fits the sketch capacity). min/max render through the
    engine's canonical cross-engine formatting, matching
    ``profile_table`` byte-for-byte. Raises FileNotFoundError when no
    maintained store exists (callers fall back to the batch build)."""
    from ..functions.render import _canon
    from ..operators.kll import kll_quantile_values, merge_kll
    from ..operators.sketch import kmv_estimate, merge_kmv

    summary_path = os.path.join(target_dir, "_profile_summary")
    if not os.path.isdir(summary_path):
        raise FileNotFoundError(
            f"no maintained profile under {target_dir} — run the profile "
            "ingest first, or build batch-side via "
            "operators.estimation.profile_table"
        )
    s = spark.read.option("basePath", summary_path).parquet(summary_path)
    dtypes = {
        f.name[len("_min_"):]: f.dataType
        for f in s.schema.fields
        if f.name.startswith("_min_")
    }
    cols = sorted(dtypes)
    folded = s.agg(
        F.sum("_n").alias("_n"),
        *[
            a
            for c in cols
            for a in (
                F.sum(f"_nulls_{c}").alias(f"_nulls_{c}"),
                _canon(F.min(f"_min_{c}"), dtypes[c]).alias(f"_min_{c}"),
                _canon(F.max(f"_max_{c}"), dtypes[c]).alias(f"_max_{c}"),
            )
        ],
    )
    arms = ", ".join(
        f"'{c}', _n, _nulls_{c}, _min_{c}, _max_{c}" for c in cols
    )
    summary = folded.select(
        F.expr(
            f"stack({len(cols)}, {arms}) AS "
            "(column_name, n_rows, n_nulls, min_value, max_value)"
        )
    )

    kmv_path = os.path.join(target_dir, "_profile_kmv")
    kmv = spark.read.option("basePath", kmv_path).parquet(kmv_path).select(
        "column_name", "kmv"
    )
    distinct = kmv_estimate(
        merge_kmv([kmv], ["column_name"], k=kmv_k), k=kmv_k
    ).select("column_name", F.col("distinct_est").alias("n_distinct_est"))

    out = summary.join(distinct, on="column_name", how="left")

    kll_path = os.path.join(target_dir, "_profile_kll")
    if os.path.isdir(kll_path):
        kll = spark.read.option("basePath", kll_path).parquet(kll_path).select(
            "column_name", "kll_n", "kll_levels"
        )
        q = kll_quantile_values(
            merge_kll([kll], ["column_name"], k=kll_k, merge_partitions=1),
            list(percents),
        )
        back = [
            (F.col(f"p{p}").cast("double") / _SCALE).alias(f"p{p}")
            for p in percents
        ]
        out = out.join(
            q.select("column_name", *back), on="column_name", how="left"
        )
    return out.select(
        "column_name",
        "n_rows",
        "n_nulls",
        "n_distinct_est",
        "min_value",
        "max_value",
        *[f"p{p}" for p in percents if os.path.isdir(kll_path)],
    )
