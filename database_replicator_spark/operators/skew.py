"""Skew-resistant aggregation: two-phase salted groupBy.

At 100 TB a handful of hot keys (one user, one event type, one null) can
pin a single reducer. AQE's skew-join handling covers joins; for
aggregations whose partial aggregation doesn't collapse enough (e.g.
collect-heavy or high-cardinality-combine aggs), the classic fix is
salting: group on (key, salt) first, then combine the partials per key.

For algebraic aggregates (sum/count/min/max) the result is exactly equal
to the unsalted groupBy — which is what the oracle checks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum_count(
    df: DataFrame,
    key_cols: list[str],
    value_col: Column,
    salt_buckets: int = 16,
    value_alias: str = "sum_value",
    count_alias: str = "n_rows",
) -> DataFrame:
    """Two-phase SUM/COUNT: phase 1 groups on (key, salt) spreading each
    hot key over ``salt_buckets`` reducers; phase 2 combines per key.

    The salt comes from ``monotonically_increasing_id`` (partition-derived,
    value-independent) so a hot key whose rows all share one value — or
    are all NULL — still spreads across buckets. The final result is
    salt-independent for algebraic aggregates, so task retries remain
    correct regardless of salt assignment."""
    salt = F.pmod(F.monotonically_increasing_id(), F.lit(salt_buckets))
    phase1 = (
        df.withColumn("_salt", salt)
        .groupBy(*key_cols, "_salt")
        .agg(
            F.sum(value_col).alias("_psum"),
            F.count(F.lit(1)).alias("_pcount"),
        )
    )
    return phase1.groupBy(*key_cols).agg(
        F.sum("_psum").alias(value_alias),
        F.sum("_pcount").alias(count_alias),
    )
