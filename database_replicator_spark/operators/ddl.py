"""DDL transport: sanitizers for globals dumps + CREATE TABLE generation.

Reference S2: five line-rewriting sanitizers applied to ``pg_dumpall
--globals-only`` output before replay on managed targets
(src/migration/dump.rs:98-301):
  1. wrap ``CREATE ROLE`` in DO $$ … duplicate_object guards
  2. comment out ``ALTER ROLE … SUPERUSER`` grants
  3. comment out restricted per-role GUC settings (ALTER ROLE … SET)
  4. comment out tablespace statements
  5. comment out restricted role GRANTs

Reference S3/S5: schema DDL is transported as pg_dump text; here it is
*generated* from the introspected Spark ``StructType`` instead — the
idiomatic replacement called out in SURVEY.md §1.3.
"""

from __future__ import annotations

import re

from pyspark.sql import types as T

RESTRICTED_GUCS = (
    "session_replication_role",
    "log_statement",
    "log_min_duration_statement",
    "track_activities",
)

RESTRICTED_ROLES = ("pg_read_server_files", "pg_write_server_files", "pg_execute_server_program")


def sanitize_create_roles(sql: str) -> str:
    """Wrap each CREATE ROLE in an idempotency guard so replaying a globals
    dump onto a target that already has the role succeeds (dump.rs:98-147)."""
    out = []
    for line in sql.splitlines():
        m = re.match(r"^\s*CREATE ROLE\s+(\S+?);?\s*$", line)
        if m:
            stmt = line.strip().rstrip(";")
            out.append(
                "DO $$ BEGIN "
                + stmt
                + "; EXCEPTION WHEN duplicate_object THEN NULL; END $$;"
            )
        else:
            out.append(line)
    return "\n".join(out)


def remove_superuser_grants(sql: str) -> str:
    """Comment out ALTER ROLE … SUPERUSER (managed targets refuse it,
    dump.rs:150-180)."""
    out = []
    for line in sql.splitlines():
        if re.match(r"^\s*ALTER ROLE\b.*\bSUPERUSER\b", line, re.IGNORECASE):
            out.append("-- " + line)
        else:
            out.append(line)
    return "\n".join(out)


def remove_restricted_guc_settings(sql: str) -> str:
    """Comment out ALTER ROLE … SET <restricted-guc> (dump.rs:183-226)."""
    out = []
    for line in sql.splitlines():
        if re.match(r"^\s*ALTER ROLE\b.*\bSET\b", line, re.IGNORECASE) and any(
            g in line for g in RESTRICTED_GUCS
        ):
            out.append("-- " + line)
        else:
            out.append(line)
    return "\n".join(out)


def remove_tablespace_statements(sql: str) -> str:
    """Comment out CREATE/ALTER TABLESPACE (dump.rs:229-262)."""
    out = []
    for line in sql.splitlines():
        if re.match(r"^\s*(CREATE|ALTER|DROP)\s+TABLESPACE\b", line, re.IGNORECASE):
            out.append("-- " + line)
        else:
            out.append(line)
    return "\n".join(out)


def remove_restricted_role_grants(sql: str) -> str:
    """Comment out GRANTs of restricted built-in roles (dump.rs:265-301)."""
    out = []
    for line in sql.splitlines():
        if re.match(r"^\s*GRANT\b", line, re.IGNORECASE) and any(
            r in line for r in RESTRICTED_ROLES
        ):
            out.append("-- " + line)
        else:
            out.append(line)
    return "\n".join(out)


def sanitize_globals(sql: str) -> str:
    """All five sanitizers in the reference's order."""
    for fn in (
        sanitize_create_roles,
        remove_superuser_grants,
        remove_restricted_guc_settings,
        remove_tablespace_statements,
        remove_restricted_role_grants,
    ):
        sql = fn(sql)
    return sql


# --- CREATE TABLE generation from StructType ------------------------------

_TYPE_MAP: list[tuple[type, str]] = [
    (T.ShortType, "SMALLINT"),
    (T.IntegerType, "INTEGER"),
    (T.LongType, "BIGINT"),
    (T.FloatType, "REAL"),
    (T.DoubleType, "DOUBLE PRECISION"),
    (T.BooleanType, "BOOLEAN"),
    (T.DateType, "DATE"),
    (T.TimestampNTZType, "TIMESTAMP"),
    (T.TimestampType, "TIMESTAMPTZ"),
    (T.BinaryType, "BYTEA"),
    (T.StringType, "TEXT"),
]


def _sql_type(dtype: T.DataType) -> str:
    if isinstance(dtype, T.DecimalType):
        return f"NUMERIC({dtype.precision},{dtype.scale})"
    if isinstance(dtype, T.ArrayType):
        return _sql_type(dtype.elementType) + "[]"
    if isinstance(dtype, (T.StructType, T.MapType)):
        return "JSONB"
    for py_t, sql_t in _TYPE_MAP:
        if isinstance(dtype, py_t):
            return sql_t
    return "TEXT"  # unknown types fall back to text, like writer.rs:565-569


def create_table_sql(
    table: str,
    schema: T.StructType,
    pk_cols: list[str] | None = None,
    if_not_exists: bool = True,
) -> str:
    """Postgres CREATE TABLE from a Spark schema — replaces pg_dump
    schema transport (S3/S5) for Spark-introspected sources."""
    from ..plans.rules import quote_ident

    cols = []
    for f in schema.fields:
        null = "" if f.nullable else " NOT NULL"
        cols.append(f"{quote_ident(f.name)} {_sql_type(f.dataType)}{null}")
    if pk_cols:
        cols.append("PRIMARY KEY (" + ", ".join(quote_ident(c) for c in pk_cols) + ")")
    ine = "IF NOT EXISTS " if if_not_exists else ""
    return f"CREATE TABLE {ine}{table} (\n  " + ",\n  ".join(cols) + "\n)"
