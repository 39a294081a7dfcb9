"""Size estimation + duration model for snapshot planning.

Reference: fast path ``pg_database_size``; filtered path sums
``pg_total_relation_size`` over included tables; expected duration =
bytes / 20 GB·h⁻¹ (dump 25-35, restore 15-25)
(src/migration/estimation.rs:71-231). For parquet-backed sources, size =
sum of data file sizes; for JDBC sources, the same catalog queries the
reference uses run over the connection.
"""

from __future__ import annotations

import glob
import os
from dataclasses import dataclass

#: the reference's planning throughput (estimation.rs:96-101)
DEFAULT_GB_PER_HOUR = 20.0


@dataclass(frozen=True)
class Estimate:
    total_bytes: int
    estimated_seconds: float

    @property
    def human(self) -> str:
        return f"{format_bytes(self.total_bytes)} ≈ {format_duration(self.estimated_seconds)}"


def estimate_parquet_dir(
    sf_dir: str, tables: list[str] | None = None, gb_per_hour: float = DEFAULT_GB_PER_HOUR
) -> Estimate:
    total = 0
    pattern = tables or ["*"]
    for t in pattern:
        for path in glob.glob(os.path.join(sf_dir, f"{t}.parquet")):
            total += os.path.getsize(path)
    secs = (total / 1e9) / gb_per_hour * 3600.0
    return Estimate(total_bytes=total, estimated_seconds=secs)


def format_bytes(n: int) -> str:
    """Humanize bytes (reference estimation.rs:255-280 semantics)."""
    value = float(n)
    for unit in ("B", "KB", "MB", "GB", "TB", "PB"):
        if value < 1024 or unit == "PB":
            return f"{value:.1f} {unit}" if unit != "B" else f"{int(value)} B"
        value /= 1024
    return f"{value:.1f} PB"


def format_duration(seconds: float) -> str:
    s = int(seconds)
    if s < 60:
        return f"{s}s"
    if s < 3600:
        return f"{s // 60}m {s % 60}s"
    return f"{s // 3600}h {(s % 3600) // 60}m"


def profile_table(df, columns: list[str] | None = None, approximate: bool = False):
    """Per-column data profile — the A6/A7 stats family as one table:
    ``(column_name, n_rows, n_nulls, n_distinct, min_value, max_value)``
    with min/max computed on the NATIVE type and rendered through the
    engine's canonical cross-engine formatting (functions/render._canon:
    %.6f doubles, explicit-micros timestamps), so the profile is
    oracle-checkable byte-for-byte.

    Scale shape: ONE corpus scan — all aggregates (including the exact
    distinct counts, which Spark plans as one Expand + two-level
    aggregate — the Expand multiplies scanned rows by the column count,
    the dominant cost of the exact mode) run in a single agg, then
    stack() pivots the 1-row result to one row per column.
    ``approximate=True`` is the 100 TB mode: ``approx_count_distinct``
    (HLL, ~2% error) drops the Expand entirely — measured 2.4 s → 0.6 s
    on the 6-column orders table at sf0.1; everything else is identical
    and the profile stays one scan either way.
    """
    from pyspark.sql import functions as F

    from ..functions.render import _canon

    cols = columns or df.columns
    dtypes = dict(zip(df.schema.names, [f.dataType for f in df.schema.fields]))
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"_nulls_{c}"),
            (
                F.approx_count_distinct(F.col(c), rsd=0.02)
                if approximate
                else F.countDistinct(F.col(c))
            ).alias(f"_dist_{c}"),
            _canon(F.min(F.col(c)), dtypes[c]).alias(f"_min_{c}"),
            _canon(F.max(F.col(c)), dtypes[c]).alias(f"_max_{c}"),
        ]
    row = df.agg(*aggs)
    arms = ", ".join(
        f"'{c}', _n, _nulls_{c}, _dist_{c}, _min_{c}, _max_{c}" for c in cols
    )
    return row.select(
        F.expr(
            f"stack({len(cols)}, {arms}) AS "
            "(column_name, n_rows, n_nulls, n_distinct, min_value, max_value)"
        )
    )


def profile_percentiles(
    df,
    columns: list[str] | None = None,
    percents: list[int] = (50, 90, 99),
    scale: int = 1_000_000,
    k: int = 16384,
):
    """Per-column percentiles via the mergeable KLL sketch — the A6/A7
    profile's missing aggregate, WITHOUT a global sort: numeric columns
    are melted to (column_name, value) long form, fixed-pointed at
    ``scale`` (exact for ≤6-dp quantities, the repo's canonical grain),
    sketched per column in one pass, and the p-columns are scaled back
    to doubles. Returns (column_name, n, p50, p90, …).

    Exact while a column's non-null count stays within the sketch
    capacity; beyond it the KLL rank-error contract applies
    (operators/kll.py — O(n/k), property-tested). The sketch states are
    storable: a caller that keeps them (kll_sketch directly) can merge
    tomorrow's partition in without rescanning today's (the IVM
    posture)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from .kll import kll_quantile_values, kll_sketch

    numeric = (
        T.LongType, T.IntegerType, T.ShortType, T.ByteType,
        T.DoubleType, T.FloatType, T.DecimalType,
    )
    cols = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, numeric)
        and (columns is None or f.name in columns)
    ]
    if not cols:
        raise ValueError("no numeric columns to profile")
    melted = None
    for c in cols:
        part = df.select(
            F.lit(c).alias("column_name"),
            (F.col(c).cast("decimal(28,6)") * scale)
            .cast("bigint")
            .alias("_v"),
        ).filter(F.col("_v").isNotNull())
        melted = part if melted is None else melted.unionByName(part)
    # merge_partitions=1: the group grain is the profiled COLUMN LIST —
    # bounded by the schema, not the data — so the k-bounded partial
    # states merge in one task (the kll_group_quantiles lever; measured
    # ~0.9 s off profile_orders at sf0.1)
    sk = kll_sketch(melted, ["column_name"], "_v", k=k, merge_partitions=1)
    out = kll_quantile_values(sk, list(percents))
    back = [
        (F.col(f"p{p}").cast("double") / scale).alias(f"p{p}")
        for p in percents
    ]
    return out.select("column_name", "n", *back)
