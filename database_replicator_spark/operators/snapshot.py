"""Snapshot copy: the Spark re-expression of the reference's `init` path.

Reference shape (SURVEY.md §3.1): pg_dump/pg_restore subprocesses for full
tables (S4/S6) and ``COPY (SELECT … WHERE pred)`` for predicate tables (S7,
src/migration/filtered.rs:66-173). In Spark both collapse to one declarative
pipeline::

    read(source) → [.select(columns)] → [.filter(expr(pred))] → write(target)

Catalyst pushes the filter and projection into the source scan (JDBC: into
the generated SELECT; parquet: into the reader), so the predicate runs
source-side exactly like the reference's COPY subquery — with no custom code.

Parallelism: the reference caps at ``min(nCPU, 8)`` pg_dump jobs
(dump.rs:571-575); a partitioned Spark scan scales with the cluster instead.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.rules import ReplicationFilter


def filtered_copy(
    df: DataFrame,
    predicate: str | None = None,
    columns: list[str] | None = None,
) -> DataFrame:
    """S7 + P1/P3: project + arbitrary SQL predicate, pushed down by Catalyst."""
    if columns:
        df = df.select(*columns)
    if predicate:
        df = df.filter(F.expr(predicate))
    return df


def snapshot_table(
    df: DataFrame,
    target_path: str,
    predicate: str | None = None,
    columns: list[str] | None = None,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Copy one table to a parquet target. ``overwrite`` gives the
    truncate-then-load idempotency the reference relies on
    (TRUNCATE CASCADE before COPY, filtered.rs:127-143)."""
    out = filtered_copy(df, predicate, columns)
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(target_path)


@dataclass
class SnapshotPlan:
    """Driver-side orchestration of a multi-table snapshot with rules.

    The analogue of `init`'s per-database loop (src/commands/init.rs:405-631):
    schema-only tables produce empty targets with the source schema, predicate
    tables are filtered, everything else is copied whole.
    """

    filter: ReplicationFilter = field(default_factory=ReplicationFilter)
    database: str = "default"

    def run(
        self,
        spark: SparkSession,
        sources: dict[str, DataFrame],
        target_dir: str,
    ) -> dict[str, str]:
        results: dict[str, str] = {}
        for name, df in sources.items():
            if not self.filter.should_replicate_table(self.database, name):
                results[name] = "skipped"
                continue
            if self.filter.rules.is_schema_only(self.database, "public", name):
                spark.createDataFrame([], df.schema).write.mode("overwrite").parquet(
                    f"{target_dir}/{name}"
                )
                results[name] = "schema_only"
                continue
            pred = self.filter.rules.spark_predicate(self.database, "public", name)
            snapshot_table(df, f"{target_dir}/{name}", predicate=pred)
            results[name] = "copied_filtered" if pred else "copied"
        return results
