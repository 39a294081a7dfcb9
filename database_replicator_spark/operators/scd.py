"""Slowly-changing-dimension (Type 2) history maintenance.

The reference's keyed change application (J4 — src/xmin/writer.rs upsert
batches) OVERWRITES the target row: the destination always holds the latest
version and history is lost. A warehouse sink frequently wants the other
contract — keep every version with a validity interval. This module provides
that as a first-class operator over the same change-feed shape the engine
already produces (incremental.py `read_changes`, streaming change batches):

  * ``scd2_from_changes`` — batch construction: collapse consecutive
    duplicate attribute states per key, assign ``valid_from`` / ``valid_to``
    / ``version`` / ``is_current`` with two per-key windows.
  * ``scd2_merge_batch`` — incremental maintenance: only keys present in the
    new batch are rebuilt (their existing history rows are folded back into
    change form and re-derived); untouched keys pass through column-pruned
    and untouched. At 100 TB this is the difference between rewriting the
    dimension and rewriting ~batch-sized slices of it — the same
    touched-partition-only discipline as the `_latest` bucket rewrites
    (streaming/change_stream.py).

Scale notes: both entry points shuffle once on the dimension key; per-key
state is bounded by that key's version count. No global window, no driver
materialization.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_from_changes(
    changes: DataFrame,
    key_cols: Sequence[str],
    attr_cols: Sequence[str],
    ts_col: str,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Build a Type-2 history table from a keyed change feed.

    Rows are ordered per key by ``(ts_col, *tiebreak_cols)``; consecutive
    rows whose ``attr_cols`` are unchanged are collapsed into one version.
    Output = key + attrs + ``valid_from``/``valid_to``/``version``/
    ``is_current`` (open interval ⇔ current).
    """
    order = [F.col(ts_col).asc(), *[F.col(c).asc() for c in tiebreak_cols]]
    w = Window.partitionBy(*key_cols).orderBy(*order)

    changed = F.row_number().over(w) == 1
    for a in attr_cols:
        changed = changed | ~F.col(a).eqNullSafe(F.lag(a).over(w))

    versions = changes.withColumn("_is_change", changed).filter("_is_change")

    w2 = Window.partitionBy(*key_cols).orderBy(*order)
    out = (
        versions.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w2))
        .withColumn("version", F.row_number().over(w2).cast("long"))
        .withColumn("is_current", F.col("valid_to").isNull())
    )
    return out.select(
        *key_cols, *attr_cols, "valid_from", "valid_to", "version", "is_current"
    )


def scd2_merge_batch(
    history: DataFrame,
    batch: DataFrame,
    key_cols: Sequence[str],
    attr_cols: Sequence[str],
    ts_col: str,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Fold a new change batch into an existing Type-2 history.

    Only keys that appear in ``batch`` are rebuilt: their history rows are
    converted back into change form (one change per version, at
    ``valid_from``) and re-derived together with the batch rows. Keys absent
    from the batch are passed through untouched via an anti-join — the
    physical plan touches batch-sized state, never the full dimension.

    Idempotence: replaying a batch already folded in yields the identical
    history (duplicate states collapse), matching the engine's at-least-once
    delivery contract (SURVEY.md ST4).

    Determinism requires ``ts_col`` to be unique per key across the merged
    feed (history keeps only ``valid_from``, so a tiebreak column cannot
    survive a round-trip). Change feeds produced by this engine satisfy it:
    watermark columns are monotone per key by construction.
    """
    keys = list(key_cols)
    touched_keys = batch.select(*keys).distinct()

    untouched = history.join(touched_keys, on=keys, how="left_anti")

    old_changes = history.join(touched_keys, on=keys, how="left_semi").select(
        *keys, *attr_cols, F.col("valid_from").alias(ts_col)
    )
    new_changes = batch.select(*keys, *attr_cols, ts_col)
    rebuilt = scd2_from_changes(
        old_changes.unionByName(new_changes),
        keys,
        attr_cols,
        ts_col,
        tiebreak_cols=(),
    )
    return untouched.select(rebuilt.columns).unionByName(rebuilt)
