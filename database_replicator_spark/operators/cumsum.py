"""Scalable grouped running sums — the two-phase bucketed cumulative sum
as a reusable operator.

A grouped running total (``SUM(v) OVER (PARTITION BY g ORDER BY v DESC,
id)``) plans as one sort per group: a single task sorts each group's
entire slice, which is exactly the shape that dies first at 100 TB grain
(billions of rows behind one hot group key). ``select_token_budget``
(operators/corpus.py) solved the GLOBAL version with coarse monotone
buckets + driver-computed prefix offsets; this operator generalizes it to
per-group semantics and removes the driver from the loop entirely:

  1. per-group max of the value column (one partitionBy-only window — no
     sort) normalizes values into ``buckets`` coarse bins, monotone with
     the (value DESC, id ASC) order within the group;
  2. per-(group, bucket) totals — one tiny aggregate, groups×B rows;
  3. per-group EXCLUSIVE prefix offsets over those totals — a window over
     the tiny relation, ordered by bucket DESC, fully distributed (the
     token-budget version collects ≤B rows to the driver; at many-group
     grain that collect would itself be the bottleneck);
  4. the exact cumulative sum runs as a per-(group, bucket) window with
     the broadcast-size offset added — every task sorts only its bucket's
     slice, ~|group|/B rows.

The result is value-identical to the naive window (exact integer/decimal
arithmetic throughout — the bucketing only partitions the sort, it never
approximates), asserted by tests/test_cumsum.py against the naive plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def grouped_running_sum(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    id_col: str,
    out_col: str = "cum",
    buckets: int = 1000,
) -> DataFrame:
    """Exact per-group running total of ``value_col`` in (value DESC,
    id ASC) order, without any single-task whole-group sort.

    Requires non-negative values (ranking semantics; the Pareto/top-N
    use cases). Output = input columns + ``out_col``. Ties order by
    ``id_col`` so the running total is deterministic row-by-row.
    """
    gcols = [F.col(c) for c in group_cols]
    w_max = Window.partitionBy(*gcols)
    # monotone coarse bin: floor(v / (max+1) * B) — descending order means
    # HIGHER buckets come first; max+1 keeps the ratio strictly < 1
    binned = df.withColumn(
        "_gmax", F.max(value_col).over(w_max)
    ).withColumn(
        "_bkt",
        F.floor(
            F.col(value_col).cast("double")
            / (F.col("_gmax").cast("double") + 1.0)
            * buckets
        ).cast("int"),
    )

    totals = binned.groupBy(*gcols, F.col("_bkt")).agg(
        F.sum(value_col).alias("_bkt_total")
    )
    # exclusive prefix over the tiny (groups x B) relation — distributed,
    # no driver collect
    w_off = (
        Window.partitionBy(*gcols)
        .orderBy(F.col("_bkt").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.withColumn(
        "_offset", F.coalesce(F.sum("_bkt_total").over(w_off), F.lit(0))
    ).drop("_bkt_total")

    w_cum = (
        Window.partitionBy(*gcols, F.col("_bkt"))
        .orderBy(F.col(value_col).desc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        binned.join(offsets, on=[*group_cols, "_bkt"])
        .withColumn(out_col, F.col("_offset") + F.sum(value_col).over(w_cum))
        .drop("_gmax", "_bkt", "_offset")
    )


def naive_running_sum(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    id_col: str,
    out_col: str = "cum",
) -> Column:
    """The single-window reference plan (one sort per whole group) —
    the semantic definition grouped_running_sum must equal."""
    w = (
        Window.partitionBy(*[F.col(c) for c in group_cols])
        .orderBy(F.col(value_col).desc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(out_col, F.sum(value_col).over(w))
