"""Delete reconciliation: find target rows whose PK no longer exists at the
source (orphans), then delete them.

Reference: hash anti-join for small tables (src/xmin/reconciler.rs:45-78) and
a hand-rolled streaming sorted merge-join with keyset pagination for large
ones (reconciler.rs:223-386), including a ``::text`` cast dance to make SQL
and Rust sort orders agree (reconciler.rs:469-474).

In Spark both collapse to one declarative ``left_anti`` join: Catalyst picks
broadcast-hash when the source PK set is small and sort-merge with spill when
it is not — the exact two strategies the reference hand-codes — and AQE
switches between them at runtime using real sizes. The text-cast ordering
hack disappears because the join compares native types.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def find_orphans(target: DataFrame, source: DataFrame, pk_cols: list[str]) -> DataFrame:
    """PKs present in target but absent from source (J1/J2 unified).

    At 100 TB: both inputs are projected to PK columns before the join, so
    the shuffle carries keys only; a co-partitioned (bucketed) layout makes
    this a zero-shuffle merge join.
    """
    return target.select(*pk_cols).join(
        source.select(*pk_cols), on=pk_cols, how="left_anti"
    )


def apply_deletes(target: DataFrame, orphans: DataFrame, pk_cols: list[str]) -> DataFrame:
    """Delete-by-PK as a DataFrame transform (S19): keep target rows whose PK
    is NOT in the orphan set. For JDBC/Delta targets the same orphan set
    feeds ``DELETE WHERE pk IN …`` / ``MERGE WHEN MATCHED THEN DELETE``."""
    return target.join(orphans, on=pk_cols, how="left_anti")
