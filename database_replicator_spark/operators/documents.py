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

#: MySQL's candidate list is case-VARIANT and ordered (src/mysql/
#: converter.rs:262-276): exact column names `id`, `Id`, `ID`, first
#: present wins, NO uniqueness verification (unlike the SQLite heuristic).
MYSQL_ID_CANDIDATES = ("id", "Id", "ID")


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


def extract_document_id_mysql(
    df: DataFrame, order_cols: list[str] | None = None
) -> tuple[DataFrame, str]:
    """MySQL document-ID rule (src/mysql/converter.rs:262-276): the first
    of the exact-case columns ``id``/``Id``/``ID`` present is used as-is
    (no uniqueness gate); rows of a table with none get sequential
    ``generated_<n>`` ids, 1-based.

    The reference's ``<n>`` is the read-cursor position; Spark has no scan
    order, so ``order_cols`` must supply the total order that stands in
    for it (defaults to all columns — deterministic, though not
    necessarily the server's physical order; SURVEY.md §7 hard-part 4)."""
    for cand in MYSQL_ID_CANDIDATES:
        if cand in df.columns:
            # positional plumbing: the rule is case-SENSITIVE but Spark's
            # name resolution is case-insensitive (a table with both `id`
            # and `ID` makes any by-name reference ambiguous), so the
            # column is picked by ordinal under temporary unique names
            idx = df.columns.index(cand)
            tmp_names = [f"_c{i}" for i in range(len(df.columns))]
            out = (
                df.toDF(*tmp_names)
                .withColumn("_doc_id", F.col(f"_c{idx}").cast("string"))
                .toDF(*df.columns, "_doc_id")
            )
            return out, f"mysql_{cand}"
    order = order_cols or df.columns
    w = Window.orderBy(*[F.col(c) for c in order])
    return (
        df.withColumn(
            "_doc_id", F.concat(F.lit("generated_"), F.row_number().over(w).cast("string"))
        ),
        "mysql_generated",
    )


def auto_fragments(df: DataFrame, style: str = "mysql") -> Column:
    """Schema-driven document encoding: dispatch each column to the
    type-tagged fragment encoder its Spark type demands, per source style.

    Styles (SURVEY.md §1.2b):
      * ``mysql``  — bytes are utf8-or-binary-tagged, temporals are
        datetime-tagged ISO-8601Z (mysql/converter.rs:40-102)
      * ``sqlite`` — bytes are blob-tagged (sqlite/converter.rs:56-65)
      * ``mongo``  — temporals are $date epoch-millis, decimals are
        precision-preserving strings (mongodb/converter.rs:76-113)

    This is the statically-typed (JDBC) half of document ingestion; the
    per-VALUE dynamic path for SQLite files lives in sources/sqlite_source.
    """
    from pyspark.sql import types as T

    from ..functions import doc_json as J

    frags: dict[str, Column] = {}
    for f in df.schema.fields:
        col = F.col(f.name)
        dt = f.dataType
        if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
            frags[f.name] = J.json_number(col)
        elif isinstance(dt, (T.FloatType, T.DoubleType)):
            frags[f.name] = J.json_real(col)
        elif isinstance(dt, T.BooleanType):
            frags[f.name] = J.json_bool(col)
        elif isinstance(dt, T.BinaryType):
            frags[f.name] = (
                J.json_mysql_bytes(col) if style == "mysql" else J.json_blob(col)
            )
        elif isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
            frags[f.name] = (
                J.json_bson_datetime(col) if style == "mongo" else J.json_mysql_datetime(col)
            )
        elif isinstance(dt, T.DecimalType):
            frags[f.name] = (
                J.json_bson_decimal128(col) if style == "mongo" else J.json_number(col)
            )
        else:
            frags[f.name] = J.json_string(col.cast("string"))
    return J.object_from_fragments(**frags)


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
