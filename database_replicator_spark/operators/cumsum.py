"""Scalable grouped running sums — the two-phase bucketed cumulative sum
as a reusable operator.

A grouped running total (``SUM(v) OVER (PARTITION BY g ORDER BY v DESC,
id)``) plans as one sort per group: a single task sorts each group's
entire slice, which is exactly the shape that dies first at 100 TB grain
(billions of rows behind one hot group key). ``select_token_budget``
(operators/corpus.py) solved the GLOBAL version with coarse monotone
buckets + driver-computed prefix offsets; this operator generalizes it to
per-group semantics and removes the driver from the loop entirely:

  1. per-group (min, max) of the order column via a map-side-combined
     aggregate joined back (NOT a partitionBy-only window, which would
     collocate whole groups) normalizes values into ``buckets`` coarse
     bins, monotone with the (order DESC/ASC, id ASC) order within the
     group;
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

``mode="auto"`` (the default) picks the plan by measured size — the
connected-components fast-path pattern (operators/corpus.py): at
fixture-to-mid scale one task sorting the whole relation beats the
multi-stage distributed plan's shuffle and scheduling overhead by 3-10×
(measured on the ranking gates at sf0.1), while past ``small_threshold``
rows the single sort is the thing that dies. Both paths are
output-identical by construction and by test, so callers — and the
oracle — never see which one ran.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: below this row count, one task sorting the whole relation wins
SMALL_THRESHOLD = 2_000_000


def _nullsafe_join(left: DataFrame, right: DataFrame, keys: list[str]) -> DataFrame:
    """Inner join on ``keys`` with NULL-safe equality (``<=>``), keeping
    the left side's key columns. A plain ``on=keys`` equi-join silently
    drops NULL-keyed rows — with grouped data a NULL group key is a
    legitimate group (groupBy and Window.partitionBy both keep it), so
    the bucketed plan must join it back like any other."""
    renamed = right
    for k in keys:
        renamed = renamed.withColumnRenamed(k, f"_r_{k}")
    cond = None
    for k in keys:
        c = left[k].eqNullSafe(renamed[f"_r_{k}"])
        cond = c if cond is None else (cond & c)
    return left.join(renamed, cond).drop(*[f"_r_{k}" for k in keys])


def grouped_running_sum(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    id_col: str,
    out_col: str = "cum",
    buckets: int = 1000,
    order_col: str | None = None,
    ascending: bool = False,
    mode: str = "auto",
    small_threshold: int = SMALL_THRESHOLD,
) -> DataFrame:
    """Exact per-group running total of ``value_col`` in (order_col
    DESC-or-ASC, id ASC) order, without any single-task whole-group sort
    on the distributed path.

    ``order_col`` defaults to ``value_col`` (the Pareto/top-N shape);
    pass ``value_col`` as a constant-1 column and ``order_col`` as the
    sort key to get scalable per-group RANKS (the positional-quantile
    shape — operators/cumsum.positional_quantiles). Output = input
    columns + ``out_col``. Ties order by ``id_col`` so the running total
    is deterministic row-by-row.

    ``mode``: ``"auto"`` counts the input (one job; the relations fed to
    this operator are usually pre-aggregated, so the count is cheap
    relative to a wrong plan either way) and routes small inputs to the
    plain-window plan; ``"distributed"`` / ``"single"`` force a path —
    a 100 TB caller that KNOWS its scale should pass ``"distributed"``
    and skip the sizing pass.

    NULL semantics match the naive window exactly on every axis: a NULL
    group key is one group (null-safe joins), NULL order values sort
    where Spark's defaults put them (NULLS FIRST for ASC, NULLS LAST for
    DESC — the sentinel bucket −1 lands there on both bucket orders),
    and the running SUM is NULL precisely while every prefix value is
    NULL (the offset is kept nullable and composed with the local sum).
    ``id_col`` must be non-NULL and unique per group — it is the
    deterministic tiebreak, same contract as the naive window.
    """
    oc = order_col or value_col
    if mode not in ("auto", "distributed", "single"):
        raise ValueError(f"unknown mode {mode!r}")
    if mode == "single" or (
        mode == "auto" and df.count() <= small_threshold
    ):
        w = (
            Window.partitionBy(*[F.col(c) for c in group_cols])
            .orderBy(
                F.col(oc).asc() if ascending else F.col(oc).desc(),
                F.col(id_col).asc(),
            )
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return df.withColumn(out_col, F.sum(value_col).over(w))
    gcols = [F.col(c) for c in group_cols]
    # per-group order-column range via AGGREGATE + JOIN, never a
    # partitionBy-only window — such a window collocates each whole
    # group in one task, which is exactly the bottleneck this operator
    # exists to remove (the map-side-combined aggregate ships one
    # (min,max) pair per group per task instead). Empty group_cols
    # (global running sum) becomes a 1-row broadcast crossJoin.
    ranges = df.groupBy(*gcols).agg(
        F.max(oc).alias("_gmax"), F.min(oc).alias("_gmin")
    )
    if group_cols:
        # NULL-safe: a NULL group key is a real group in both groupBy
        # and Window.partitionBy — the bucketed path must keep it too
        with_rng = _nullsafe_join(df, ranges, list(group_cols))
    else:
        with_rng = df.crossJoin(F.broadcast(ranges))
    # monotone coarse bin over the ORDER column's per-group range (min
    # shift handles negatives; +1 keeps the ratio strictly < 1). NULL
    # order values take the sentinel bucket -1, which the DESC bucket
    # order places last and the ASC order first — exactly Spark's
    # default NULL placement (NULLS LAST for DESC, NULLS FIRST for ASC),
    # so both paths stay output-identical on NULL-keyed rows. This also
    # covers the all-NULL group, whose (min, max) range is itself NULL.
    binned = with_rng.withColumn(
        "_bkt",
        F.when(F.col(oc).isNull(), F.lit(-1))
        .otherwise(
            F.floor(
                (F.col(oc).cast("double") - F.col("_gmin").cast("double"))
                / (
                    F.col("_gmax").cast("double")
                    - F.col("_gmin").cast("double")
                    + 1.0
                )
                * buckets
            )
        )
        .cast("int"),
    )

    totals = binned.groupBy(*gcols, F.col("_bkt")).agg(
        F.sum(value_col).alias("_bkt_total")
    )
    # exclusive prefix over the tiny (groups x B) relation — distributed,
    # no driver collect
    bkt_order = F.col("_bkt").asc() if ascending else F.col("_bkt").desc()
    w_off = (
        Window.partitionBy(*gcols)
        .orderBy(bkt_order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # keep the offset NULLABLE (no coalesce): SQL's running SUM is NULL
    # exactly while every prefix value is NULL, and the two pieces must
    # compose to that — offset NULL ⟺ no non-NULL value in any earlier
    # bucket, local NULL ⟺ none in this bucket's prefix
    offsets = totals.withColumn(
        "_offset", F.sum("_bkt_total").over(w_off)
    ).drop("_bkt_total")

    row_order = F.col(oc).asc() if ascending else F.col(oc).desc()
    w_cum = (
        Window.partitionBy(*gcols, F.col("_bkt"))
        .orderBy(row_order, F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = F.sum(value_col).over(w_cum)
    cum = F.when(
        F.col("_offset").isNull() & local.isNull(), F.lit(None)
    ).otherwise(
        F.coalesce(F.col("_offset"), F.lit(0)) + F.coalesce(local, F.lit(0))
    )
    return (
        _nullsafe_join(binned, offsets, [*group_cols, "_bkt"])
        .withColumn(out_col, cum)
        .drop("_gmax", "_gmin", "_bkt", "_offset")
    )


def positional_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    id_col: str,
    fractions: list[tuple[int, int, str]] = (
        (1, 2, "p50"),
        (9, 10, "p90"),
    ),
    mode: str = "auto",
) -> DataFrame:
    """Discrete (type-1) per-group quantiles by sorted POSITION — the
    value at rank ⌈p·n⌉ of the ascending sort — computed scalably:
    ranks come from :func:`grouped_running_sum` over a constant-1
    column (no single-task whole-group sort), group sizes from an
    aggregate-and-join (not a partitionBy-only window, which would
    collocate whole groups again). ⌈num·n/den⌉ is the pure-integer
    ``(num·n + den − 1) div den``, so the picked position is
    engine-exact; the element AT a position is tie-order-independent.

    ``fractions``: (numerator, denominator, output_column) triples.
    Output: one row per group with ``n`` and one column per fraction.
    """
    ranked = grouped_running_sum(
        df.withColumn("_one", F.lit(1)),
        group_cols,
        value_col="_one",
        id_col=id_col,
        out_col="_rank",
        order_col=value_col,
        ascending=True,
        mode=mode,
    ).drop("_one")
    sizes = df.groupBy(*[F.col(c) for c in group_cols]).agg(
        F.count(F.lit(1)).alias("n")
    )
    joined = (
        _nullsafe_join(ranked, sizes, list(group_cols))
        if group_cols
        else ranked.crossJoin(F.broadcast(sizes))
    )
    aggs = [F.max("n").alias("n")]
    for num, den, name in fractions:
        pos = F.expr(f"({num} * n + {den - 1}) div {den}")
        aggs.append(
            F.max(F.when(F.col("_rank") == pos, F.col(value_col))).alias(name)
        )
    return joined.groupBy(*[F.col(c) for c in group_cols]).agg(*aggs)


def grouped_rank(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    id_col: str,
    out_col: str = "rank",
    ascending: bool = False,
    buckets: int = 1000,
    mode: str = "auto",
) -> DataFrame:
    """Deterministic per-group ROW_NUMBER-style ranks (order_col
    DESC-or-ASC, id ASC tiebreak) without any whole-group sort: a
    constant-1 running sum through :func:`grouped_running_sum`. With a
    unique tiebreak this equals rank()/row_number() (no peer groups), so
    the full ranking-window family derives from (rank, n):
    percent_rank = (rank−1)/(n−1) — guard the n = 1 group, where 0/0 is
    NULL in Spark but percent_rank() defines 0.0 —, cume_dist = rank/n,
    and ntile via :func:`ntile_expr` — all without the single-task
    global sort the naive window plans."""
    return grouped_running_sum(
        df.withColumn("_one", F.lit(1)),
        group_cols,
        value_col="_one",
        id_col=id_col,
        out_col=out_col,
        buckets=buckets,
        order_col=order_col,
        ascending=ascending,
        mode=mode,
    ).drop("_one")


def ntile_expr(rank_col: Column, n_col: Column, k: int) -> Column:
    """Exact NTILE(k) bucket from a 1-based unique rank and the group
    size: the first ``n mod k`` buckets get ``n div k + 1`` rows, the
    rest ``n div k`` — SQL-standard remainder-to-first-buckets
    semantics, as pure integer arithmetic (⌈a/b⌉ = (a+b−1) div b) via
    the JVM's integral ``div`` — no double round-trip, so exactness
    holds across the full bigint range, not just below 2^53. The q = 0
    edge (n < k: every row its own bucket) stays in the WHEN branch, so
    the else-branch division by q never evaluates."""
    idiv = lambda a, b: F.call_function("div", a, b)  # noqa: E731
    q = idiv(n_col, F.lit(k))  # n div k
    m = n_col - q * k  # n mod k
    boundary = m * (q + 1)
    first = idiv(rank_col + q, q + 1)  # ceil(r/(q+1))
    rest = m + idiv(rank_col - boundary + q - 1, q)
    return F.when(rank_col <= boundary, first).otherwise(rest)


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
