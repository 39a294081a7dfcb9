"""Keyed last-write-wins dedup — the ``_latest`` materialization.

Reference: ``append_deduped`` mode keeps a raw change log plus a ``_latest``
table holding only the newest row per id (src/commands/sync_sqlite.rs:169-181,
SURVEY.md §2.7/ST6).

Spark: ``row_number() OVER (PARTITION BY pk ORDER BY version DESC) = 1``.
At scale this is a single hash-partition shuffle on the PK; with heavy key
skew AQE's skew-join handling plus the fact that the window never
materializes more than one partition's rows per task keeps it bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_by_key(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Newest row per key. ``order_col`` descending; ``tiebreak_cols``
    (descending) make the result deterministic when versions tie."""
    order = [F.col(order_col).desc()] + [
        F.col(c).desc() for c in (tiebreak_cols or [])
    ]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
