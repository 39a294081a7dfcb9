"""Optional transactional-table sinks (Delta Lake MERGE).

The default storage everywhere in this repo is plain parquet with
idempotent overwrite layouts (epoch partitions for logs, pk-hash buckets
for ``_latest``) — zero extra dependencies, and the bucket swap is the
transactional-MERGE stand-in the change_stream docstring describes.

When the ``delta`` Python package (delta-spark) IS importable and the
session has the Delta catalog/extension configured, these helpers swap a
real ACID ``MERGE INTO`` in for the two places that want one:

  * ``_latest`` maintenance (streaming/change_stream.ChangeApplier with
    ``storage="delta"``): last-write-wins keyed MERGE incl. deletes —
    O(batch) row-level commits instead of touched-bucket file rewrites,
    plus time travel and concurrent-writer safety.
  * ``merge_upsert`` batch targets (:func:`merge_upsert_delta`).

Reference parity: the reference's upsert sink is ON CONFLICT DO UPDATE
(postgres_writer.rs' upsert path, cited in sources/jdbc.build_upsert_sql);
MERGE INTO is the lakehouse rendering of the same keyed idempotent apply.

This module is import-safe without delta installed: only the ``*_delta``
entry points require it (they raise ``RuntimeError`` with guidance), and
:func:`merge_into_sql` — the engine-neutral SQL text generator used for
DDL review artifacts — has no dependency at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def delta_available() -> bool:
    """True when delta-spark is importable (NOT whether the session has
    the Delta extension configured — that is checked at call time)."""
    try:
        import delta  # noqa: F401

        return True
    except ImportError:
        return False


def merge_into_sql(
    target: str,
    keys: list[str],
    columns: list[str],
    source: str = "updates",
    delete_col: str | None = None,
) -> str:
    """ANSI ``MERGE INTO`` statement for a keyed last-write-wins upsert —
    runnable by Delta SQL, Iceberg, and any MERGE-capable warehouse.

    With ``delete_col`` (a boolean column on the source), matched rows
    flagged for deletion are deleted — the (table, op) routing contract of
    the change stream in one statement."""
    on = " AND ".join(f"t.{k} = s.{k}" for k in keys)
    sets = ", ".join(f"t.{c} = s.{c}" for c in columns if c not in keys)
    cols = ", ".join(columns)
    vals = ", ".join(f"s.{c}" for c in columns)
    lines = [f"MERGE INTO {target} t", f"USING {source} s", f"ON {on}"]
    if delete_col is not None:
        lines.append(f"WHEN MATCHED AND s.{delete_col} THEN DELETE")
        lines.append(f"WHEN MATCHED THEN UPDATE SET {sets}")
        lines.append(f"WHEN NOT MATCHED AND NOT s.{delete_col} THEN")
        lines.append(f"  INSERT ({cols}) VALUES ({vals})")
    else:
        lines.append(f"WHEN MATCHED THEN UPDATE SET {sets}")
        lines.append(f"WHEN NOT MATCHED THEN INSERT ({cols}) VALUES ({vals})")
    return "\n".join(lines)


def _require_delta():
    if not delta_available():
        raise RuntimeError(
            "delta-spark is not installed; install it and build the session "
            "with spark.sql.extensions=io.delta.sql.DeltaSparkSessionExtension "
            "and spark.sql.catalog.spark_catalog=org.apache.spark.sql.delta."
            "catalog.DeltaCatalog, or keep the default parquet bucket-swap "
            "storage (ChangeApplier(storage='parquet'))."
        )


def apply_latest_delta(
    spark: SparkSession,
    changes: DataFrame,
    path: str,
    key_col: str = "pk",
    order_col: str = "change_id",
    op_col: str = "op",
) -> None:
    """Last-write-wins MERGE of a change batch into a Delta ``_latest``
    table at ``path`` — the drop-in Delta twin of the parquet
    touched-bucket rewrite in ChangeApplier.apply_batch.

    The batch is first reduced to one winner per key (same
    ``latest_by_key`` semantics as the parquet path), then merged:
    matched+delete → DELETE, matched → UPDATE, unmatched non-delete →
    INSERT. Idempotent under at-least-once replay: a replayed change
    carries the same ``order_col``, and re-updating a row to its current
    payload is a no-op."""
    _require_delta()
    from delta.tables import DeltaTable  # type: ignore

    from .operators.latest import latest_by_key

    winners = latest_by_key(changes, [key_col], order_col)
    if not DeltaTable.isDeltaTable(spark, path):
        winners.filter(f"{op_col} != 'delete'").drop(op_col).write.format(
            "delta"
        ).save(path)
        return
    tgt = DeltaTable.forPath(spark, path)
    (
        tgt.alias("t")
        .merge(winners.alias("s"), f"t.{key_col} = s.{key_col}")
        .whenMatchedDelete(condition=f"s.{op_col} = 'delete'")
        .whenMatchedUpdate(
            condition=f"s.{order_col} >= t.{order_col}",
            set={
                "payload": "s.payload",
                order_col: f"s.{order_col}",
            },
        )
        .whenNotMatchedInsert(
            condition=f"s.{op_col} != 'delete'",
            values={
                key_col: f"s.{key_col}",
                "payload": "s.payload",
                order_col: f"s.{order_col}",
            },
        )
        .execute()
    )


def merge_upsert_delta(
    spark: SparkSession,
    updates: DataFrame,
    path: str,
    keys: list[str],
) -> None:
    """Keyed upsert of a batch DataFrame into a Delta table — the
    lakehouse twin of sources/jdbc.build_upsert_sql's ON CONFLICT DO
    UPDATE (update-all/insert-all; no delete routing)."""
    _require_delta()
    from delta.tables import DeltaTable  # type: ignore

    if not DeltaTable.isDeltaTable(spark, path):
        updates.write.format("delta").save(path)
        return
    cond = " AND ".join(f"t.{k} = s.{k}" for k in keys)
    (
        DeltaTable.forPath(spark, path)
        .alias("t")
        .merge(updates.alias("s"), cond)
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
        .execute()
    )
