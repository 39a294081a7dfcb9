"""Event-time windowed aggregation + sessionization.

The reference has NO event-time operators (SURVEY.md §2.9 ST9 — it relies
on idempotent upsert + periodic reconcile); these are the Spark-native
extension surface: tumbling/sliding windows with watermarks for late data,
and session windows for activity grouping. Batch variants power the
oracle-checked queries; the streaming variants reuse the same expressions
over ``readStream``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    window_duration: str,
    group_cols: list[str],
    aggs: list[Column],
) -> DataFrame:
    """Tumbling event-time window aggregation. In streaming mode add
    ``df.withWatermark(ts_col, <delay>)`` first; the aggregation spec is
    identical (that symmetry is the point of Structured Streaming)."""
    return (
        df.groupBy(F.window(F.col(ts_col), window_duration).alias("win"), *group_cols)
        .agg(*aggs)
        .withColumn("window_start", F.col("win.start"))
        .withColumn("window_end", F.col("win.end"))
        .drop("win")
    )


def streaming_tumbling_counts(
    stream: DataFrame, ts_col: str, window_duration: str, watermark: str, group_cols: list[str]
) -> DataFrame:
    """Streaming form with a watermark bounding state for late data (ST9)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration), *group_cols)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *group_cols,
            "n_events",
        )
    )


def sessionize(
    df: DataFrame, ts_col: str, key_cols: list[str], gap_seconds: int
) -> DataFrame:
    """Batch sessionization via gaps-and-islands: a new session starts when
    the gap to the previous event (per key) exceeds ``gap_seconds``.

    Matches ``F.session_window`` grouping for fixed gaps, but is expressible
    in plain SQL (→ DuckDB oracle) and runs as two windows over one
    partition-by-key shuffle. session_id is 1-based per key."""
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy(F.col(ts_col))
    prev_ts = F.lag(F.col(ts_col)).over(w)
    gap = F.col(ts_col).cast("double") - prev_ts.cast("double")
    new_session = F.when(prev_ts.isNull() | (gap > gap_seconds), 1).otherwise(0)
    return df.withColumn("_new_s", new_session).withColumn(
        "session_id", F.sum("_new_s").over(w.rowsBetween(Window.unboundedPreceding, 0))
    ).drop("_new_s")


def session_stats(
    df: DataFrame, ts_col: str, key_cols: list[str], gap_seconds: int
) -> DataFrame:
    """Per-session stats (start, end, n_events) from sessionize()."""
    s = sessionize(df, ts_col, key_cols, gap_seconds)
    return s.groupBy(*key_cols, "session_id").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[tuple[str, str]],
    left_ts: str,
    right_ts: str,
    within: str,
    left_watermark: str = "10 minutes",
    right_watermark: str = "10 minutes",
    join_type: str = "inner",
) -> DataFrame:
    """Stream-stream event-time interval join: pair each left event with
    right events on the same key whose timestamp falls in
    ``[left_ts, left_ts + within]`` (e.g. purchases within 1 hour of the
    click).

    Structured Streaming requires BOTH watermarks plus the two-sided
    time-range condition — that is what lets the engine garbage-collect
    join state: a buffered left row can be dropped once the right
    watermark passes ``left_ts + within``, so state is O(key-rate ×
    (within + watermark)), never unbounded. Without the range bounds the
    same join would accumulate state forever; this helper makes the
    bounds impossible to forget.

    Works identically on batch frames (the condition is plain Catalyst),
    which is how the oracle-checked attribution gate validates the join
    semantics; this wrapper's value in streaming mode is the state-TTL
    contract. ``on`` is a list of (left_col, right_col) equality pairs;
    keep the two frames' column names disjoint apart from the keys.
    """
    l_wm = left.withWatermark(left_ts, left_watermark)
    r_wm = right.withWatermark(right_ts, right_watermark)
    cond = None
    for lc, rc in on:
        piece = l_wm[lc] == r_wm[rc]
        cond = piece if cond is None else (cond & piece)
    cond = (
        cond
        & (r_wm[right_ts] >= l_wm[left_ts])
        & (r_wm[right_ts] <= l_wm[left_ts] + F.expr(f"INTERVAL {within}"))
    )
    return l_wm.join(r_wm, cond, join_type)


def stream_exact_dedup(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup with BOUNDED state: drop repeats of the same
    key arriving within the watermark horizon
    (``dropDuplicatesWithinWatermark``), so state holds only keys newer
    than the watermark instead of every key ever seen — the difference
    between O(rate × horizon) and O(stream lifetime) memory.

    This is the at-source companion to the corpus ingestor's
    against-index anti-join (corpus_ingest.py): use THIS to collapse
    duplicate deliveries inside the transport window (at-least-once
    sources redeliver within minutes), and the index anti-join for
    content-level dedup against all of history. The two compose; neither
    replaces the other.
    """
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )
