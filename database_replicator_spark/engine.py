"""Engine facade: the reference's command surface as a Python API.

Maps the CLI verbs (src/main.rs:48-237) onto the Spark-first pipeline:

  validate → preflight checks (source/target resolvable, not identical,
             rules consistent)                       [§2.11]
  init     → snapshot: discovery → rules → FK stage order → per-table
             copy (filtered/schema-only) → checkpoint [§3.1]
  sync     → watermark incremental cycle: read changes > hwm → merge →
             advance hwm; wraparound ⇒ full refresh   [§3.2 path 5]
  reconcile→ PK anti-join deletes                     [J1/J2]
  verify   → per-table checksum + rowcount compare    [A5]
  status   → watermark/state report                   [ST7-ish]

Targets are directories of parquet tables (the test substrate) or JDBC
URLs (sources/jdbc.py); the orchestration logic is identical.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from .operators.estimation import Estimate, estimate_parquet_dir
from .operators.fk import topo_stages
from .operators.incremental import (
    WatermarkState,
    detect_wraparound,
    max_watermark,
    merge_upsert,
    read_changes,
)
from .operators.reconcile import apply_deletes, find_orphans
from .operators.snapshot import filtered_copy
from .operators.verify import table_checksum
from .plans.checkpoint import SnapshotCheckpoint, validate_source_target_different
from .plans.rules import ReplicationFilter


@dataclass
class ParquetTarget:
    """Directory-of-parquet target with overwrite/merge semantics."""

    root: str

    def path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def exists(self, table: str) -> bool:
        return os.path.exists(self.path(table))

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        return spark.read.parquet(self.path(table))

    def overwrite(self, df: DataFrame, table: str) -> None:
        df.write.mode("overwrite").parquet(self.path(table))

    def merge(self, spark, updates: DataFrame, table: str, pk_cols: list[str]) -> None:
        """MERGE emulation for parquet: read-modify-overwrite via
        util.staged_overwrite (lakehouse formats do this transactionally)."""
        from .util import staged_overwrite

        if not self.exists(table):
            self.overwrite(updates, table)
            return
        base = self.read(spark, table)
        merged = merge_upsert(base, updates, pk_cols)
        staged_overwrite(spark, merged, self.path(table))


@dataclass
class Engine:
    spark: SparkSession
    source_tables: dict[str, DataFrame]
    target: ParquetTarget
    filter: ReplicationFilter = field(default_factory=ReplicationFilter)
    database: str = "default"
    fk_edges: list[tuple[str, str]] = field(default_factory=list)
    state_path: str | None = None

    # -- validate ----------------------------------------------------------
    def validate(
        self,
        source_id: str = "source",
        target_id: str | None = None,
        jdbc_url: str | None = None,
        jdbc_properties: dict[str, str] | None = None,
    ) -> list[str]:
        """Preflight: returns a list of failures (empty = OK).

        Always: src≠tgt guard + schema readability + rule consistency.
        With ``jdbc_url``: the reference's live probes too — connectivity,
        wal_level/version, per-table has_table_privilege scan — each
        retried with exponential backoff (plans/preflight.py; reference
        src/preflight.rs:163-339, src/postgres/privileges.rs:63-251)."""
        problems: list[str] = []
        try:
            validate_source_target_different(source_id, target_id or self.target.root)
        except ValueError as e:
            problems.append(str(e))
        for t in self.source_tables:
            try:
                _ = self.source_tables[t].schema
            except Exception as e:  # noqa: BLE001
                problems.append(f"table {t}: schema unreadable: {e}")
        if jdbc_url:
            from .plans.preflight import run_jdbc_preflight

            report = run_jdbc_preflight(
                self.spark, jdbc_url,
                tables=list(self.source_tables), properties=jdbc_properties,
            )
            problems.extend(report.problems)
        return problems

    # -- init (snapshot) ---------------------------------------------------
    def init_snapshot(self, checkpoint_path: str | None = None) -> dict[str, str]:
        """Full snapshot with FK-ordered stages and per-database checkpoint
        semantics (here: one logical database)."""
        cp = None
        if checkpoint_path:
            cp = SnapshotCheckpoint(
                checkpoint_path, "source", self.target.root, self.filter.fingerprint()
            )
            if self.database in cp.completed_databases():
                return {t: "checkpointed" for t in self.source_tables}
        tables = [
            t
            for t in self.source_tables
            if self.filter.should_replicate_table(self.database, t)
        ]
        results: dict[str, str] = {}
        for stage in topo_stages(self.fk_edges, tables):
            # tables within a stage have no FK interdependency → safe to
            # load in parallel (Spark scheduler handles concurrency)
            for t in stage:
                df = self.source_tables[t]
                if self.filter.rules.is_schema_only(self.database, "public", t):
                    self.target.overwrite(
                        self.spark.createDataFrame([], df.schema), t
                    )
                    results[t] = "schema_only"
                    continue
                pred = self.filter.rules.spark_predicate(self.database, "public", t)
                self.target.overwrite(filtered_copy(df, pred), t)
                results[t] = "copied_filtered" if pred else "copied"
        for t in self.source_tables:
            if t not in results:
                results[t] = "skipped"
        if cp:
            cp.mark_completed(self.database)
        return results

    # -- sync (incremental cycle) -----------------------------------------
    def sync_cycle(self, table: str, watermark_col: str, pk_cols: list[str]) -> dict:
        """One xmin-style cycle: read > hwm → merge → advance
        (src/xmin/daemon.rs:336-461 shape). Wraparound ⇒ full refresh.

        The engine's replication rules apply here exactly as in init/verify:
        schema-only tables never sync data, and predicate rules filter the
        change stream (and the wraparound resync) so incremental apply can
        never widen a filtered table past its contract."""
        state = WatermarkState(self.state_path or os.path.join(self.target.root, "_state.json"))
        if self.filter.rules.is_schema_only(self.database, "public", table):
            return {"table": table, "mode": "schema_only_skipped", "rows": 0}
        src = self.source_tables[table]
        pred = self.filter.rules.spark_predicate(self.database, "public", table)
        if pred:
            src = filtered_copy(src, pred)
        hwm = state.get_watermark(table)
        current_max = max_watermark(src, watermark_col)
        if hwm is not None and current_max is not None and isinstance(hwm, (int, float)):
            if detect_wraparound(int(hwm), int(current_max)):
                self.target.overwrite(src, table)
                state.advance(table, current_max)
                return {"table": table, "mode": "full_resync", "rows": src.count()}
        changes = src if hwm is None else read_changes(src, watermark_col, hwm)
        n = changes.count()
        if n > 0:
            self.target.merge(self.spark, changes, table, pk_cols)
            state.advance(table, max_watermark(changes, watermark_col), synced_rows=n)
        return {"table": table, "mode": "incremental", "rows": n}

    # -- reconcile ---------------------------------------------------------
    def reconcile(self, table: str, pk_cols: list[str]) -> dict:
        """Delete target rows whose PK vanished at the (rule-filtered)
        source (J1/J2)."""
        from .util import staged_overwrite

        src = self.source_tables[table]
        pred = self.filter.rules.spark_predicate(self.database, "public", table)
        if pred:
            src = filtered_copy(src, pred)
        tgt = self.target.read(self.spark, table)
        orphans = find_orphans(tgt, src, pk_cols)
        n = orphans.count()
        if n > 0:
            remaining = apply_deletes(tgt, orphans, pk_cols)
            staged_overwrite(self.spark, remaining, self.target.path(table))
        return {"table": table, "deleted": n}

    # -- daemon (ST3) ------------------------------------------------------
    def run_sync_daemon(
        self,
        tables: dict[str, tuple[str, list[str]]],
        sync_interval_s: float = 3600.0,
        reconcile_interval_s: float = 86400.0,
        once: bool = False,
        max_cycles: int | None = None,
    ) -> list[dict]:
        """ST3: the periodic micro-batch scheduler — sync every
        ``sync_interval_s`` (reference default 3600 s), reconcile every
        ``reconcile_interval_s`` (86400 s), ``once`` runs a single cycle
        and returns (the ``--once`` flag; src/xmin/daemon.rs:16-43,
        src/main.rs:159-170). ``tables`` maps table → (watermark_col,
        pk_cols). Returns the per-cycle reports."""
        import time as _time

        reports: list[dict] = []
        last_reconcile = _time.monotonic()
        cycles = 0
        while True:
            cycle: dict = {"synced": [], "reconciled": []}
            for t, (wm, pks) in tables.items():
                cycle["synced"].append(self.sync_cycle(t, wm, pks))
            if once or (_time.monotonic() - last_reconcile) >= reconcile_interval_s:
                for t, (_, pks) in tables.items():
                    if not self.filter.rules.is_schema_only(self.database, "public", t):
                        cycle["reconciled"].append(self.reconcile(t, pks))
                last_reconcile = _time.monotonic()
            reports.append(cycle)
            cycles += 1
            if once or (max_cycles is not None and cycles >= max_cycles):
                return reports
            _time.sleep(sync_interval_s)

    # -- verify ------------------------------------------------------------
    def verify(self, tables: list[str] | None = None) -> dict[str, dict]:
        """Checksum-compare each table against the EXPECTED projection of
        the source: predicate rules are applied to the source side and
        schema-only tables expect an empty target — verification validates
        the replication contract, not raw table equality."""
        out: dict[str, dict] = {}
        for t in tables or list(self.source_tables):
            src = self.source_tables[t]
            if self.filter.rules.is_schema_only(self.database, "public", t):
                src = self.spark.createDataFrame([], src.schema)
            else:
                pred = self.filter.rules.spark_predicate(self.database, "public", t)
                if pred:
                    src = filtered_copy(src, pred)
            # _migrated_at is ingestion metadata (DEFAULT NOW() in the
            # reference's doc schema) — re-evaluated on every source read,
            # so it can never checksum-match and is excluded by contract
            cols = [c for c in src.columns if c != "_migrated_at"]
            src_cs = table_checksum(src, cols)
            if not self.target.exists(t):
                out[t] = {"status": "missing_target"}
                continue
            tgt = self.target.read(self.spark, t)
            tgt_cs = table_checksum(tgt, [c for c in tgt.columns if c != "_migrated_at"])
            out[t] = {
                "status": "match" if src_cs == tgt_cs else "mismatch",
                "source_rows": src_cs.row_count,
                "target_rows": tgt_cs.row_count,
            }
        return out

    # -- drift -------------------------------------------------------------
    def check_drift(self, tables: list[str] | None = None) -> dict[str, dict]:
        """Schema-drift report per table: the live source schema compared
        against the target's current schema, with the safe/review ALTER
        split (operators/ddl.schema_diff). A sync daemon runs this before
        each cycle; apply-side statements execute through
        sources/ddl_exec.execute_ddl on JDBC targets (parquet targets
        evolve by mergeSchema instead)."""
        from .operators.ddl import drift_alter_sql, schema_diff
        from .plans.rules import quote_ident

        out: dict[str, dict] = {}
        for t in tables or list(self.source_tables):
            if not self.target.exists(t):
                out[t] = {"status": "missing_target"}
                continue
            src_schema = self.source_tables[t].schema
            tgt_schema = self.target.read(self.spark, t).schema
            drift = schema_diff(src_schema, tgt_schema)
            if not drift.is_drifted:
                out[t] = {"status": "in_sync"}
                continue
            apply, review = drift_alter_sql(quote_ident(t), src_schema, drift)
            out[t] = {
                "status": "drifted",
                "added": drift.added,
                "removed": drift.removed,
                "retyped": drift.retyped,
                "renullable": drift.renullable,
                "apply": apply,
                "review": review,
            }
        return out

    # -- status ------------------------------------------------------------
    def status(self) -> dict:
        state = WatermarkState(self.state_path or os.path.join(self.target.root, "_state.json"))
        return {
            "filter_fingerprint": self.filter.fingerprint(),
            "tables": state.load(),
        }

    # -- estimate ----------------------------------------------------------
    def estimate(self, sf_dir: str) -> Estimate:
        return estimate_parquet_dir(sf_dir)
