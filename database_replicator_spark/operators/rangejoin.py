"""Interval containment (range) join — bucketized for scale.

``point in [start, end)`` joins are native in DuckDB (IEJoin) but Spark
plans a bare inequality join as BroadcastNestedLoopJoin — O(n·m) row
comparisons, the classic 100 TB cliff. The standard fix, implemented
here: overlay a fixed bucket grid, explode each interval into the buckets
it covers, equi-join points to interval-buckets on the bucket id, then
refine with the exact predicate.

Cost: one shuffle on the bucket id (size ≈ points + Σ interval spans /
bucket width). Each point lands in exactly one bucket, so a point matches
an interval through exactly one joined row — no dedup needed. Bucket
width tunes the fan-out: ≈ median interval length is the usual sweet
spot (1-3 buckets per interval).

Not in the reference (no analytical joins at all, SURVEY.md §2.3);
extension surface for event-in-window attribution, time-range feature
aggregation, and genomic/IP-range style lookups.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket_of(ts: Column, bucket_seconds: int) -> Column:
    return F.floor(F.unix_micros(ts) / F.lit(bucket_seconds * 1_000_000)).cast("long")


def range_join_intervals(
    points: DataFrame,
    intervals: DataFrame,
    point_time: str,
    start_col: str = "start",
    end_col: str = "end",
    bucket_seconds: int = 3600,
    extra_key: list[str] | None = None,
) -> DataFrame:
    """Inner-join ``points`` to every interval with
    ``start <= point_time < end`` (optionally also matching ``extra_key``
    columns). Returns points columns + the interval's columns.

    Plan: intervals explode to (bucket, interval) rows via a codegen
    ``sequence``; points compute their single bucket; equi-join on
    bucket (+ extra keys); exact refine filter. Empty intervals
    (end <= start) match nothing, like the half-open contract says."""
    key = list(extra_key or [])
    ib = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                _bucket_of(F.col(start_col), bucket_seconds),
                # end is exclusive: a bucket is covered only if the
                # interval reaches past the bucket's start
                _bucket_of(
                    F.col(end_col) - F.expr("INTERVAL 1 MICROSECOND"), bucket_seconds
                ),
            )
        ),
    ).filter(F.col(end_col) > F.col(start_col))
    pb = points.withColumn("_b", _bucket_of(F.col(point_time), bucket_seconds))
    return (
        pb.join(ib, on=["_b", *key])
        .filter(
            (F.col(point_time) >= F.col(start_col))
            & (F.col(point_time) < F.col(end_col))
        )
        .drop("_b")
    )
