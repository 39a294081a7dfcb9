"""Incremental sync: watermark-column reads + merge-upsert application.

Reference: the xmin path — ``SELECT …, xmin::text::bigint AS _xmin FROM t
WHERE xmin > $hwm ORDER BY xmin`` (src/xmin/reader.rs:122-163), applied with
generated ``INSERT … ON CONFLICT (pk) DO UPDATE`` batches
(src/xmin/writer.rs:271-320), high-water mark advanced after each batch
(src/xmin/daemon.rs:420-427), 32-bit wraparound forcing a full resync when
``old - new > 2^31`` (src/xmin/reader.rs:10-48, threshold 2_000_000_000).

Spark design: the watermark column is *pluggable* (an ``updated_at``, a
sequence, or Postgres ``xmin::text::bigint`` injected via the JDBC ``query``
option) because xmin is a Postgres physical column with no Spark analogue
(SURVEY.md §7 hard-part 3). Incremental read = a pushed-down range predicate;
apply = MERGE semantics expressed as a keyed full-outer coalesce for
DataFrame targets, or generated ON CONFLICT batches for JDBC targets.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: xmin is u32; a backwards jump bigger than this means txid wraparound
WRAPAROUND_THRESHOLD = 2_000_000_000


def read_changes(df: DataFrame, watermark_col: str, since) -> DataFrame:
    """S13: rows strictly newer than the high-water mark. The comparison is a
    plain Catalyst predicate → pushed into the parquet/JDBC scan."""
    return df.filter(F.col(watermark_col) > F.lit(since))


def max_watermark(df: DataFrame, watermark_col: str):
    """A4: next high-water mark (None on empty input)."""
    return df.agg(F.max(watermark_col).alias("wm")).collect()[0]["wm"]


def detect_wraparound(previous: int, current: int, threshold: int = WRAPAROUND_THRESHOLD) -> bool:
    """ST2: watermark regression beyond threshold ⇒ the 32-bit txid space
    wrapped; caller must full-resync (reader.rs:35-48)."""
    return previous - current > threshold


def merge_upsert(base: DataFrame, updates: DataFrame, pk_cols: list[str]) -> DataFrame:
    """MERGE semantics on DataFrames: update matched rows, insert unmatched
    (J4/S18). Last-write-wins within ``updates`` is the caller's concern
    (use latest.latest_by_key first when a batch can contain multiple
    versions of one PK).

    Implementation: updates-wins full outer join per PK with an explicit
    update-presence marker — NOT per-column coalesce, which would silently
    resurrect the base value whenever an update sets a column to NULL
    (the JDBC path's ``SET c = EXCLUDED.c`` propagates NULLs; this must
    too). One shuffle on the PK; with both sides bucketed by PK it is
    shuffle-free. Catalyst/AQE broadcast the updates side when it is
    small — the common incremental case.
    """
    cols = base.columns
    u = updates.select(*cols).withColumn("_upd", F.lit(1))
    joined = base.alias("b").join(u.alias("u"), on=pk_cols, how="full_outer")
    present = F.col("u._upd").isNotNull()
    projected = [
        F.when(present, F.col(f"u.{c}")).otherwise(F.col(f"b.{c}")).alias(c)
        if c not in pk_cols
        else F.col(c)
        for c in cols
    ]
    return joined.select(*projected)


def apply_change_batch(
    base: DataFrame,
    changes: DataFrame,
    pk_cols: list[str],
    op_col: str = "op",
    version_col: str | None = None,
) -> DataFrame:
    """ST6: apply a mixed insert/update/delete change batch to a keyed table.

    ``changes`` carries data columns + ``op`` in {insert, update, delete}
    (+ optional monotone ``version_col`` e.g. change_id). Routing per the
    reference's per-(table, op) grouping (src/commands/sync_sqlite.rs:115-187)
    but order-independent: keep only the LAST change per PK (by version),
    then upserts merge and deletes anti-join. Replay-safe / idempotent —
    the at-least-once contract (ST4).
    """
    from .latest import latest_by_key

    if version_col is not None:
        changes = latest_by_key(changes, pk_cols, version_col)
    upserts = changes.filter(F.col(op_col) != "delete").drop(op_col)
    deletes = changes.filter(F.col(op_col) == "delete").select(*pk_cols)
    if version_col is not None:
        upserts = upserts.drop(version_col)
    merged = merge_upsert(base, upserts.select(*base.columns), pk_cols)
    return merged.join(deletes, on=pk_cols, how="left_anti")


@dataclass
class WatermarkState:
    """ST1/ST5: per-table high-water marks, persisted as JSON — the analogue
    of ``TableSyncState``/``SyncState`` (src/xmin/state.rs:11-148)."""

    path: str

    def load(self) -> dict[str, dict]:
        import json
        import os

        if not os.path.exists(self.path):
            return {}
        with open(self.path) as fh:
            return json.load(fh)

    def save(self, state: dict[str, dict]) -> None:
        import json
        import os

        tmp = self.path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(state, fh, indent=2, sort_keys=True, default=str)
        os.replace(tmp, self.path)

    def get_watermark(self, table: str):
        return self.load().get(table, {}).get("last_watermark")

    def advance(self, table: str, watermark, synced_rows: int = 0) -> None:
        state = self.load()
        entry = state.setdefault(table, {})
        entry["last_watermark"] = watermark
        entry["synced_rows"] = entry.get("synced_rows", 0) + synced_rows
        self.save(state)


def compact_changes(
    changes: DataFrame,
    pk_cols: list[str],
    version_col: str,
    op_col: str = "op",
    value_cols: list[str] | None = None,
    strict_inserts: bool = True,
) -> DataFrame:
    """Changelog net-effect compaction (the normalization step CDC runtimes
    apply before fan-out; the reference ships every intermediate change to
    the sink — src/commands/sync_sqlite.rs applies row-by-row batches —
    whereas one net row per key is sufficient and at 100 TB is the
    difference between O(changes) and O(touched keys) sink traffic).

    Per key, ordered by ``version_col``: the FIRST op decides whether the key
    existed before the batch, the LAST change decides its final state:

      first=insert, last=delete  → key net-never-existed: emit nothing
      first≠insert, last=delete  → emit one delete
      first=insert, last≠delete  → emit one insert carrying the last values
      first≠insert, last≠delete  → emit one update carrying the last values

    One groupBy on the key (min_by/max_by — map-side partials, no window,
    no sort). Requires ``version_col`` unique per key (change sequence).

    ``strict_inserts`` encodes a trust decision about the feed: the
    emit-nothing row above is only sound when an ``insert`` GUARANTEES the
    key did not exist before the batch (a well-formed CDC log). Against a
    sink that applies inserts as upserts, a spurious insert for an
    EXISTING key followed by a delete would then leave the stale row
    alive — a hypothesis-found divergence from sequential replay. Pass
    ``strict_inserts=False`` (the streaming sink path does) to emit a
    delete instead: idempotently harmless when the key never existed,
    correct when it did, still O(touched keys).
    """
    vals = value_cols if value_cols is not None else [
        c for c in changes.columns if c not in {*pk_cols, op_col, version_col}
    ]
    agg = changes.groupBy(*pk_cols).agg(
        F.min_by(op_col, version_col).alias("_first_op"),
        F.max_by(F.struct(op_col, *vals), version_col).alias("_last"),
    )
    never_existed = F.lit(None) if strict_inserts else F.lit("delete")
    net_op = (
        F.when(
            F.col(f"_last.{op_col}") == "delete",
            F.when(F.col("_first_op") == "insert", never_existed).otherwise(
                "delete"
            ),
        )
        .when(F.col("_first_op") == "insert", F.lit("insert"))
        .otherwise(F.lit("update"))
    )
    return (
        agg.withColumn("net_op", net_op)
        .filter(F.col("net_op").isNotNull())
        .select(*pk_cols, "net_op", *[F.col(f"_last.{v}").alias(v) for v in vals])
    )
