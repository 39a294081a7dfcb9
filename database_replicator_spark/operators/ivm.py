"""Incremental view maintenance: mergeable partial aggregates.

The reference recomputes verification aggregates from scratch on every sync
cycle (COUNT(*) per table — src/verify.rs; checksum scans — A5). At 100 TB a
"recompute the rollup" step is the single most expensive line in a pipeline:
an hourly GROUP BY over the full corpus re-reads everything to fold in one
hour of deltas. The standard fix is to keep the rollup in *partial-aggregate
form* — per-group (sum, count, min, max) — which is algebraically mergeable:

    partial(base ∪ delta) == merge(partial(base), partial(delta))

so maintaining the view costs one aggregation over the DELTA plus a
merge keyed on the (tiny) group space, never a re-scan of the base. AVG and
friends are derived at read time (`finalize`), which is why the partial form
stores sums and counts instead of averages (averages don't merge).

This is the same contract Spark uses internally for partial aggregation
(map-side combine before the shuffle); here it is lifted to *storage* so the
combine spans pipeline runs, not just stages.

Scale notes: `partial_agg` is one standard groupBy (map-side partials, one
shuffle on the group key); `merge_partials` shuffles only the stored
partial rows — O(groups), not O(rows). Sums are carried as DECIMAL(28,4) so
the merge is exact and associative regardless of partition order (the house
determinism rule from queries.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: exact, associative carrier type for monetary/quantity sums
_SUM_TYPE = "decimal(28,4)"


def partial_agg(
    df: DataFrame, group_cols: Sequence[str], measure_cols: Sequence[str]
) -> DataFrame:
    """Per-group mergeable partial state: n_rows + (sum, count, min, max)
    per measure. Sums are exact decimals; counts exclude NULLs (SQL
    aggregate semantics, preserved by the merge)."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for m in measure_cols:
        aggs += [
            F.sum(F.col(m).cast(_SUM_TYPE)).alias(f"{m}_sum"),
            F.count(F.col(m)).alias(f"{m}_cnt"),
            F.min(F.col(m)).alias(f"{m}_min"),
            F.max(F.col(m)).alias(f"{m}_max"),
        ]
    return df.groupBy(*group_cols).agg(*aggs)


def merge_partials(
    parts: Sequence[DataFrame], group_cols: Sequence[str], measure_cols: Sequence[str]
) -> DataFrame:
    """Merge partial states from any number of slices (base + deltas).
    Associative and commutative — slice boundaries never change results."""
    unioned = parts[0]
    for p in parts[1:]:
        unioned = unioned.unionByName(p)
    aggs = [F.sum("n_rows").alias("n_rows")]
    for m in measure_cols:
        aggs += [
            F.sum(f"{m}_sum").cast(_SUM_TYPE).alias(f"{m}_sum"),
            F.sum(f"{m}_cnt").alias(f"{m}_cnt"),
            F.min(f"{m}_min").alias(f"{m}_min"),
            F.max(f"{m}_max").alias(f"{m}_max"),
        ]
    return unioned.groupBy(*group_cols).agg(*aggs)


def finalize(
    partials: DataFrame, group_cols: Sequence[str], measure_cols: Sequence[str]
) -> DataFrame:
    """Read-time view over the stored partial state: per measure emit
    sum (double), count, min, max, and the derived avg. The avg divides the
    exact decimal sum (as double) by the count — both engines perform the
    identical IEEE double division, keeping the result oracle-exact."""
    cols = [*group_cols, F.col("n_rows")]
    for m in measure_cols:
        sum_d = F.col(f"{m}_sum").cast("double")
        cnt = F.col(f"{m}_cnt")
        cols += [
            sum_d.alias(f"{m}_sum"),
            cnt.alias(f"{m}_cnt"),
            F.col(f"{m}_min").alias(f"{m}_min"),
            F.col(f"{m}_max").alias(f"{m}_max"),
            F.when(cnt > 0, sum_d / cnt.cast("double")).alias(f"{m}_avg"),
        ]
    return partials.select(*cols)
