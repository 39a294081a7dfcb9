"""Document ingestion: canonical 4-column document table + ID extraction.

Reference: every non-Postgres source lands in
``(id TEXT PRIMARY KEY, data JSONB, _source_type TEXT, _migrated_at
TIMESTAMP DEFAULT NOW())`` (src/jsonb/writer.rs:61-103). ID extraction rules
(SURVEY.md §1.2c):

  * declared single-column PK → its value rendered to string
    (sqlite/converter.rs:162-182)
  * composite PK → 1-based row number (deterministic only given a total
    order — the caller must supply order columns; Spark has no implicit
    scan order, SURVEY.md §7 hard-part 4)
  * else heuristic candidate ``id``/``rowid``/``_id``, used **only if
    verified unique** via COUNT(*) == COUNT(DISTINCT col)
    (sqlite/converter.rs:209-297)
  * else row number fallback.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

ID_CANDIDATES = ("id", "rowid", "_id")


def is_column_unique(df: DataFrame, col: str) -> bool:
    """A3: COUNT(*) == COUNT(DISTINCT col) (null-excluding, like SQL).
    At 100 TB prefer ``approx_count_distinct`` as a pre-filter and confirm
    exactly only when the estimate is within error of the row count."""
    row = df.agg(
        F.count(F.lit(1)).alias("n"), F.count_distinct(F.col(col)).alias("d")
    ).collect()[0]
    return row["n"] == row["d"]


def extract_document_id(
    df: DataFrame,
    declared_pk: list[str] | None = None,
    order_cols: list[str] | None = None,
) -> tuple[DataFrame, str]:
    """Return (df + ``_doc_id`` string column, strategy_name)."""
    if declared_pk and len(declared_pk) == 1:
        return df.withColumn("_doc_id", F.col(declared_pk[0]).cast("string")), "declared_pk"
    if declared_pk and len(declared_pk) > 1:
        order = order_cols or declared_pk
        w = Window.orderBy(*[F.col(c) for c in order])
        return (
            df.withColumn("_doc_id", F.row_number().over(w).cast("string")),
            "composite_pk_rownum",
        )
    for cand in ID_CANDIDATES:
        if cand in df.columns and is_column_unique(df, cand):
            return df.withColumn("_doc_id", F.col(cand).cast("string")), f"heuristic_{cand}"
    order = order_cols or df.columns
    w = Window.orderBy(*[F.col(c) for c in order])
    return df.withColumn("_doc_id", F.row_number().over(w).cast("string")), "rownum_fallback"


def to_document_table(
    df: DataFrame,
    data_json: Column,
    source_type: str,
    id_col: str = "_doc_id",
) -> DataFrame:
    """Project to the canonical document schema. ``_migrated_at`` is the
    ingestion timestamp (non-deterministic, excluded from checksums)."""
    return df.select(
        F.col(id_col).alias("id"),
        data_json.alias("data"),
        F.lit(source_type).alias("_source_type"),
        F.current_timestamp().alias("_migrated_at"),
    )
