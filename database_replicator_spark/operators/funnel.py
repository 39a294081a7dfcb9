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
) -> DataFrame:
    """Per-user funnel entry times: one row per user who completed at
    least step 1, with nullable ``t_1 … t_k`` entry timestamps where
    ``t_i`` = MIN ts of a ``steps[i]`` event strictly after ``t_{i-1}``.

    Each stage prunes: stage i only aggregates events of users still in
    the funnel (inner join against the stage-i-1 survivors), so work
    decreases monotonically down the funnel.
    """
    cur = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t_1"))
    )
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
    per_step = []
    for i in range(1, len(steps) + 1):
        t = f"t_{i}"
        agg = [
            F.count(F.col(t)).alias("n_users"),
            (
                F.sum(
                    F.when(
                        F.col(t).isNotNull(),
                        F.unix_micros(F.col(t)) - F.unix_micros(F.col(f"t_{i - 1}")),
                    )
                ).alias("_gap_us")
                if i > 1
                else F.lit(None).cast("bigint").alias("_gap_us")
            ),
        ]
        per_step.append(
            entries.agg(*agg).select(
                F.lit(i).alias("step"),
                F.lit(steps[i - 1]).alias("event_type"),
                "n_users",
                "_gap_us",
            )
        )
    out = per_step[0]
    for s in per_step[1:]:
        out = out.unionByName(s)
    first = out.filter(F.col("step") == 1).select(
        F.col("n_users").alias("_n1"), F.lit(1).alias("_k")
    )
    return (
        out.withColumn("_k", F.lit(1))
        .join(F.broadcast(first), on="_k")
        .select(
            "step",
            "event_type",
            "n_users",
            F.round(F.col("n_users").cast("double") / F.col("_n1"), 6).alias(
                "conversion"
            ),
            F.round(
                F.col("_gap_us").cast("double")
                / (F.col("n_users") * F.lit(1000000.0)),
                6,
            ).alias("avg_seconds_from_prev"),
        )
    )
