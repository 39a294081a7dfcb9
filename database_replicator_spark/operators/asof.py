"""As-of (point-in-time) join — a custom operator Spark lacks natively.

``asof_join(probes, events)`` answers "for each probe row, the most recent
right-side row at or before the probe's timestamp, per key" — the
time-series lookup DuckDB ships as ``ASOF JOIN`` and Pandas as
``merge_asof``. Not in the reference (its join repertoire is PK anti-join
/ upsert-merge / FK closure, SURVEY.md §2.3); it belongs to the
training-pipeline extension surface (feature lookups, label joins,
slowly-changing-dimension reads).

Spark-first implementation — the union-marker trick, NOT a range join:

  1. union both sides with a marker, right rows carrying their payload,
     probe rows carrying null payload;
  2. one window per key ordered by (time, marker, tiebreak):
     ``last(payload, ignorenulls)`` carries the latest right payload
     forward onto each probe row;
  3. keep probe rows.

Cost: ONE shuffle on the join key (the window's partitionBy) — at 100 TB
this is the difference between a shuffle join and the O(n·m) broadcast
nested-loop Spark would pick for the naive ``t_right <= t_left``
inequality join. Ordering puts right rows BEFORE probes at equal
timestamps, giving ASOF's inclusive ``probe.t >= right.t`` semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    probes: DataFrame,
    right: DataFrame,
    on: list[str],
    probe_time: str,
    right_time: str,
    payload_cols: list[str],
    tiebreak: str | None = None,
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Left as-of join: every probe row, enriched with the latest
    ``payload_cols`` from ``right`` where ``right_time <= probe_time``
    within the same ``on`` key (null payload when no prior right row).

    ``tiebreak`` orders right rows sharing a timestamp (highest wins);
    ``tolerance_seconds`` drops matches older than the probe by more than
    the tolerance (merge_asof's ``tolerance``)."""
    marker = F.lit(0)
    tb = F.col(tiebreak) if tiebreak else F.lit(0)
    r = right.select(
        *[F.col(c) for c in on],
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_is_probe"),
        tb.alias("_tb"),
        F.struct(*[F.col(c) for c in payload_cols], F.col(right_time).alias("_rt")).alias("_pay"),
    )
    p = probes.select(
        *[F.col(c) for c in on],
        F.col(probe_time).alias("_t"),
        F.lit(1).alias("_is_probe"),
        F.lit(0).alias("_tb"),
        F.lit(None).cast(r.schema["_pay"].dataType).alias("_pay"),
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_t").asc(), F.col("_is_probe").asc(), F.col("_tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = (
        r.unionByName(p)
        .withColumn("_match", F.last("_pay", ignorenulls=True).over(w))
        .filter(F.col("_is_probe") == 1)
    )
    if tolerance_seconds is not None:
        in_tol = (
            F.col("_match").isNotNull()
            & (
                F.unix_micros(F.col("_t"))
                - F.unix_micros(F.col("_match._rt"))
                <= int(tolerance_seconds * 1_000_000)
            )
        )
        joined = joined.withColumn(
            "_match", F.when(in_tol, F.col("_match"))
        )
    return joined.select(
        *[F.col(c) for c in on],
        F.col("_t").alias(probe_time),
        *[F.col(f"_match.{c}").alias(c) for c in payload_cols],
    )
