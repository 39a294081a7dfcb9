"""Sequential-pattern funnel analytics over an event stream.

The classic product funnel (view → click → purchase): a user advances to
step k only with an event of step k's type strictly AFTER their step-k-1
entry time; the entry time is the MIN such timestamp (first qualifying
occurrence). This "min-timestamp chaining" definition is the standard
warehouse formulation — each stage is one filtered aggregation plus one
equi-join on the user key, so the whole funnel is k small shuffles on a
uniform key and never materializes event sequences per user (no
collect_list, no per-user sort), which is what makes it safe on a
100 TB event table where a single user may hold millions of rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_entries(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    materialize_stages: bool = True,
) -> DataFrame:
    """Per-user funnel entry times: one row per user who completed at
    least step 1, with nullable ``t_1 … t_k`` entry timestamps where
    ``t_i`` = MIN ts of a ``steps[i]`` event strictly after ``t_{i-1}``.

    Each stage prunes: stage i only aggregates events of users still in
    the funnel (inner join against the stage-i-1 survivors), so work
    decreases monotonically down the funnel.

    Each stage's per-user frame is consumed TWICE (as the next stage's
    probe filter and as the left side carrying entry times forward), and
    column pruning gives the two consumers different projections, so
    ReuseExchange never collapses them — without materialization the
    replayed lineage re-scans the event table O(2^k) times (measured: 7
    scans for k=3). ``materialize_stages`` therefore localCheckpoints
    each stage frame — bounded by USER cardinality, tiny next to the
    event table — bringing the whole funnel to exactly k event scans,
    each parquet-pushdown-filtered on its step type. On preemptible
    clusters swap for a durable ``checkpoint()`` dir (same note as
    connected_components).
    """
    cur = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t_1"))
    )
    if materialize_stages:
        cur = cur.localCheckpoint(eager=False)
    for i, step in enumerate(steps[1:], start=2):
        prev_t = f"t_{i - 1}"
        nxt = (
            events.filter(F.col(type_col) == step)
            .join(cur.select(user_col, prev_t), on=user_col)
            .filter(F.col(ts_col) > F.col(prev_t))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias(f"t_{i}"))
        )
        cur = cur.join(nxt, on=user_col, how="left")
        if materialize_stages:
            cur = cur.localCheckpoint(eager=False)
    return cur


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Funnel summary: one row per step with the step name, the number of
    users reaching it, the conversion rate from step 1 (6 dp), and the
    mean seconds from the previous step's entry (6 dp; NULL for step 1).

    Cross-engine determinism: the step-to-step gap is summed as exact
    epoch-microsecond longs and divided once as a double — both engines
    perform the identical float op on identical operands.
    """
    entries = funnel_entries(events, steps, user_col, ts_col, type_col)
    # ONE global aggregate over the entries frame (a union of per-step
    # aggregates would recompute the whole entries DAG per step), then a
    # stack() generator pivots the single row into per-step rows.
    aggs = [F.count(F.col("t_1")).alias("n_1")]
    for i in range(2, len(steps) + 1):
        aggs.append(F.count(F.col(f"t_{i}")).alias(f"n_{i}"))
        aggs.append(
            F.sum(
                F.when(
                    F.col(f"t_{i}").isNotNull(),
                    F.unix_micros(F.col(f"t_{i}"))
                    - F.unix_micros(F.col(f"t_{i - 1}")),
                )
            ).alias(f"g_{i}")
        )
    row = entries.agg(*aggs)
    arms = []
    for i, step in enumerate(steps, start=1):
        gap = "CAST(NULL AS BIGINT)" if i == 1 else f"g_{i}"
        arms.append(f"{i}, '{step}', n_{i}, {gap}")
    stacked = row.select(
        F.expr(
            f"stack({len(steps)}, {', '.join(arms)}) "
            "AS (step, event_type, n_users, _gap_us)"
        ),
        F.col("n_1").alias("_n1"),
    )
    return stacked.select(
        "step",
        "event_type",
        "n_users",
        F.round(
            F.when(
                F.col("_n1") > 0, F.col("n_users").cast("double") / F.col("_n1")
            ),
            6,
        ).alias("conversion"),
        F.round(
            F.when(
                F.col("n_users") > 0,
                F.col("_gap_us").cast("double")
                / (F.col("n_users") * F.lit(1000000.0)),
            ),
            6,
        ).alias("avg_seconds_from_prev"),
    )
