"""Table verification: row counts + content checksums.

Reference: per-table ``md5(string_agg(row_data, '' ORDER BY row_num))`` with
``row_num = ROW_NUMBER() OVER (ORDER BY all columns)`` and ``"empty"`` for
empty tables (src/migration/checksum.rs:33-111); source and target checksums
compared in parallel (src/commands/verify.rs:254-307).

A global ORDER BY + ordered string_agg is a single-reducer anti-pattern at
100 TB. The engine's native checksum is therefore **order-insensitive**:

  * ``table_checksum`` (scale path): per-row xxhash64 of the canonical
    rendering, combined with a commutative SUM (split into 4 independent
    lanes re-keyed by hash bytes so a transposition can't cancel). One
    map-side partial aggregation, no shuffle of data rows, no sort.
  * ``strict_checksum`` (small-data / cross-engine path): md5 of the
    concatenation of **sorted per-row md5s** — order-insensitive but exactly
    reproducible in any engine with md5 + string sort (DuckDB oracle uses
    the identical formula).

Both agree on "equal content ⇔ equal checksum" for our purposes and share
the row-rendering rules in functions/render.py.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.render import render_row_expr, row_hash_expr


@dataclass(frozen=True)
class TableChecksum:
    checksum: str
    row_count: int


def checksum_df(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Distributed order-insensitive checksum as a 1-row DataFrame
    ``(checksum string, row_count long)``.

    Plan shape at scale: parquet scan → project(render) → partial hash-agg →
    single final agg of 5 longs. The only data crossing the wire is one
    5-long tuple per task.
    """
    hashed = df.select(F.xxhash64(render_row_expr(df, columns)).alias("h"))
    # Four commutative lanes keyed by different bit-shifts of the row hash;
    # summed in decimal (sum(long) would overflow) then bounded by a modulus
    # so the final rendering is deterministic.
    lanes = [
        F.sum(F.shiftrightunsigned(F.col("h"), r).cast("decimal(38,0)")).alias(f"lane{i}")
        for i, r in enumerate((0, 13, 27, 41))
    ]
    agg = hashed.agg(F.count(F.lit(1)).alias("row_count"), *lanes)
    mask = F.lit(int("9" * 18)).cast("decimal(38,0)")  # keep lanes bounded/deterministic
    checksum = F.when(
        F.col("row_count") == 0, F.lit("empty")
    ).otherwise(
        F.md5(
            F.concat_ws(
                ":",
                *[(F.col(f"lane{i}") % mask).cast("string") for i in range(4)],
                F.col("row_count").cast("string"),
            )
        )
    )
    return agg.select(checksum.alias("checksum"), F.col("row_count"))


def table_checksum(df: DataFrame, columns: list[str] | None = None) -> TableChecksum:
    row = checksum_df(df, columns).collect()[0]
    return TableChecksum(checksum=row["checksum"], row_count=row["row_count"])


def strict_checksum_df(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Cross-engine-reproducible checksum: md5 over sorted per-row md5s.

    Single-reducer by construction — use only for small tables / spot audits;
    the scale path is :func:`checksum_df`. ``"empty"`` for empty input, like
    checksum.rs:96-100.
    """
    hashed = df.select(row_hash_expr(df, columns).alias("h"))
    agg = hashed.agg(
        F.count(F.lit(1)).alias("row_count"),
        F.md5(F.array_join(F.array_sort(F.collect_list("h")), "")).alias("cs"),
    )
    return agg.select(
        F.when(F.col("row_count") == 0, F.lit("empty")).otherwise(F.col("cs")).alias("checksum"),
        F.col("row_count"),
    )


def reference_ordered_checksum_df(
    df: DataFrame, columns: list[str] | None = None
) -> DataFrame:
    """STRICT reference-parity checksum: md5 over the concatenation of
    canonical row renders ordered by the render string — the reference's
    ``md5(string_agg(row_data, '' ORDER BY row_num))`` (checksum.rs:33-111)
    with the ordering defined on the rendered text (both comparison sides
    apply the same rule, the trick the reference itself uses at
    reconciler.rs:469-474). Single-reducer by construction — small-data
    audits only; use :func:`checksum_df` at scale."""
    rendered = df.select(render_row_expr(df, columns).alias("row_data"))
    agg = rendered.agg(
        F.count(F.lit(1)).alias("row_count"),
        F.md5(F.array_join(F.array_sort(F.collect_list("row_data")), "")).alias("cs"),
    )
    return agg.select(
        F.when(F.col("row_count") == 0, F.lit("empty")).otherwise(F.col("cs")).alias("checksum"),
        F.col("row_count"),
    )


def verify_tables(
    source: dict[str, DataFrame], target: dict[str, DataFrame]
) -> dict[str, dict]:
    """Compare checksum+count for each table name present in ``source``.

    The reference runs 4 concurrent connection pairs (verify.rs:175-244);
    here each comparison is a Spark job and the scheduler provides the
    parallelism.
    """
    out: dict[str, dict] = {}
    for name, src_df in source.items():
        tgt_df = target.get(name)
        src = table_checksum(src_df)
        if tgt_df is None:
            out[name] = {"status": "missing_target", "source": src}
            continue
        tgt = table_checksum(tgt_df)
        out[name] = {
            "status": "match" if (src == tgt) else "mismatch",
            "source": src,
            "target": tgt,
        }
    return out


def constraint_audit(
    df: DataFrame,
    unique_cols: list[str] | None = None,
    not_null_cols: list[str] | None = None,
    checks: dict[str, "F.Column"] | None = None,
    fks: dict[str, tuple[DataFrame, str, str]] | None = None,
) -> DataFrame:
    """Declarative constraint audit: one row per constraint with its
    violation count — the data-quality report a replication target runs
    after every sync (and what the reference's uniqueness probe, A3,
    generalizes to).

      * ``unique_cols``   — duplicate-key count per column
      * ``not_null_cols`` — null count per column
      * ``checks``        — named boolean expressions; violations = rows
        where the predicate is NOT satisfied (nulls count as violations:
        a CHECK that cannot be proven true fails the audit, stricter
        than SQL's CHECK-passes-on-NULL — deliberate for a data gate)
      * ``fks``           — name → (parent_df, child_col, parent_col):
        orphaned-child count via left-anti join

    Scale shape: each uniqueness audit is one column-pruned groupBy;
    NOT NULL and CHECK audits share ONE scan (single conditional agg);
    each FK is one anti-join where Catalyst picks broadcast vs
    sort-merge. Results union to a tiny frame.
    """
    parts: list[DataFrame] = []
    agg_exprs = []
    for c in not_null_cols or []:
        agg_exprs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias(f"not_null:{c}")
        )
    for name, pred in (checks or {}).items():
        agg_exprs.append(
            F.sum(F.when(pred, 0).otherwise(1)).cast("bigint").alias(f"check:{name}")
        )
    if agg_exprs:
        row = df.agg(*agg_exprs)
        arms = ", ".join(f"'{c}', `{c}`" for c in row.columns)
        parts.append(
            row.select(
                F.expr(
                    f"stack({len(row.columns)}, {arms}) AS (constraint, n_violations)"
                )
            )
        )
    for c in unique_cols or []:
        dups = (
            df.groupBy(c)
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > 1)
            .agg(
                F.coalesce(F.sum(F.col("_n") - 1), F.lit(0))
                .cast("bigint")
                .alias("n_violations")
            )
            .select(F.lit(f"unique:{c}").alias("constraint"), "n_violations")
        )
        parts.append(dups)
    for name, (parent, child_col, parent_col) in (fks or {}).items():
        orphans = (
            df.join(
                parent.select(F.col(parent_col).alias(child_col)).distinct(),
                on=child_col,
                how="left_anti",
            )
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_violations"))
            .select(F.lit(f"fk:{name}").alias("constraint"), "n_violations")
        )
        parts.append(orphans)
    if not parts:
        raise ValueError("no constraints given")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
