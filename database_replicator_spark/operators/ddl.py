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
from dataclasses import dataclass

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


# --- S1 replacement: globals as a JSON role manifest ----------------------
#
# The reference shells out to `pg_dumpall --globals-only` (dump.rs:12-86);
# the engine's replacement (sanctioned by SURVEY.md §2.1 S1) exports the
# same information as a JSON manifest via catalog introspection, and can
# regenerate globals SQL from it — which then flows through the S2
# sanitizers exactly like a real dump.

def roles_manifest_sql() -> str:
    """pg_roles introspection that feeds the manifest (the catalog the
    reference's pg_dumpall reads; role attributes per privileges.rs:63-133)."""
    return (
        "SELECT rolname, rolsuper, rolcreatedb, rolcreaterole, rolreplication, "
        "rolcanlogin, rolconnlimit FROM pg_roles WHERE rolname NOT LIKE 'pg\\_%' "
        "ORDER BY rolname"
    )


def build_role_manifest(rows: list[dict]) -> dict:
    """Normalize introspected role rows into the manifest document."""
    return {
        "version": 1,
        "kind": "globals_manifest",
        "roles": [
            {
                "name": r["rolname"],
                "superuser": bool(r.get("rolsuper", False)),
                "createdb": bool(r.get("rolcreatedb", False)),
                "createrole": bool(r.get("rolcreaterole", False)),
                "replication": bool(r.get("rolreplication", False)),
                "login": bool(r.get("rolcanlogin", False)),
                "conn_limit": r.get("rolconnlimit", -1),
                "grants": list(r.get("grants", [])),
                "settings": dict(r.get("settings", {})),
            }
            for r in rows
        ],
    }


def manifest_to_globals_sql(manifest: dict) -> str:
    """Regenerate globals SQL from a manifest — the inverse of the dump,
    emitting the same statement shapes pg_dumpall writes so the S2
    sanitizers (and their tests) apply unchanged."""
    from ..plans.rules import quote_ident

    lines: list[str] = []
    for role in manifest.get("roles", []):
        name = quote_ident(role["name"])
        opts = []
        opts.append("LOGIN" if role.get("login") else "NOLOGIN")
        if role.get("createdb"):
            opts.append("CREATEDB")
        if role.get("createrole"):
            opts.append("CREATEROLE")
        if role.get("replication"):
            opts.append("REPLICATION")
        lines.append(f"CREATE ROLE {name};")
        if opts:
            lines.append(f"ALTER ROLE {name} WITH {' '.join(opts)};")
        if role.get("superuser"):
            lines.append(f"ALTER ROLE {name} WITH SUPERUSER;")
        for guc, val in role.get("settings", {}).items():
            lines.append(f"ALTER ROLE {name} SET {guc} = '{val}';")
        for granted in role.get("grants", []):
            lines.append(f"GRANT {granted} TO {name};")
    return "\n".join(lines) + ("\n" if lines else "")


def export_globals_manifest(rows: list[dict], path: str) -> dict:
    """Write the manifest JSON (the driver-side artifact replacing the
    globals dump file). Returns the manifest."""
    import json

    manifest = build_role_manifest(rows)
    with open(path, "w") as fh:
        json.dump(manifest, fh, indent=2, sort_keys=True)
    return manifest


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


@dataclass(frozen=True)
class SchemaDrift:
    """Source-vs-target schema comparison for a long-lived sync.

    The reference's posture on drift is drop-and-recreate (commands/
    init.rs add-tables mode); for a continuously-synced 100 TB target a
    full recopy is not an option, so this classifies the drift and
    generates the additive ALTERs that can be applied online:

      * ``added``    — columns present only in source → ALTER TABLE ADD
        COLUMN (always safe; backfill happens through the normal sync).
      * ``removed``  — columns present only in target → reported, NOT
        dropped (data-destructive; operator decides).
      * ``retyped``  — same column, different SQL type → reported with
        both renderings; an automatic USING cast is deliberately not
        generated (lossy casts must be a human call).
      * ``renullable`` — nullability tightened/loosened → reported;
        loosening generates DROP NOT NULL (safe), tightening is
        reported only (may fail on existing data).
    """

    added: list[str]
    removed: list[str]
    retyped: list[tuple[str, str, str]]
    renullable: list[tuple[str, bool, bool]]  # (col, src_nullable, tgt_nullable)

    @property
    def is_drifted(self) -> bool:
        return bool(self.added or self.removed or self.retyped or self.renullable)


def schema_diff(source: T.StructType, target: T.StructType) -> SchemaDrift:
    """Classify drift between a (fresh) source schema and the target's
    last-known schema. Comparison is by rendered SQL type, so Spark-level
    aliases that map to the same target type (e.g. Short vs Int → both
    INTEGER? no — each renders itself) never false-positive."""
    src = {f.name: f for f in source.fields}
    tgt = {f.name: f for f in target.fields}
    added = [n for n in src if n not in tgt]
    removed = [n for n in tgt if n not in src]
    retyped = []
    renull = []
    for n in src.keys() & tgt.keys():
        s_t, t_t = _sql_type(src[n].dataType), _sql_type(tgt[n].dataType)
        if s_t != t_t:
            retyped.append((n, s_t, t_t))
        if src[n].nullable != tgt[n].nullable:
            renull.append((n, src[n].nullable, tgt[n].nullable))
    return SchemaDrift(
        added=sorted(added),
        removed=sorted(removed),
        retyped=sorted(retyped),
        renullable=sorted(renull),
    )


def drift_alter_sql(
    table: str, source: T.StructType, drift: SchemaDrift
) -> tuple[list[str], list[str]]:
    """(apply, review): ``apply`` holds the safe, online-appliable
    statements (ADD COLUMN for added columns, DROP NOT NULL where the
    source loosened nullability); ``review`` holds human-decision items
    rendered as commented SQL (drops, retypes, tightened nullability) so
    a run log shows exactly what was NOT done."""
    from ..plans.rules import quote_ident

    src = {f.name: f for f in source.fields}
    apply: list[str] = []
    review: list[str] = []
    for n in drift.added:
        f = src[n]
        null = "" if f.nullable else " NOT NULL DEFAULT NULL /* backfill via sync */"
        apply.append(
            f"ALTER TABLE {table} ADD COLUMN IF NOT EXISTS "
            f"{quote_ident(n)} {_sql_type(f.dataType)}{null}"
        )
    for n, s_null, _t_null in drift.renullable:
        if s_null:  # source loosened → safe to loosen target
            apply.append(
                f"ALTER TABLE {table} ALTER COLUMN {quote_ident(n)} DROP NOT NULL"
            )
        else:
            review.append(
                f"-- source tightened nullability; verify data first:\n"
                f"-- ALTER TABLE {table} ALTER COLUMN {quote_ident(n)} SET NOT NULL"
            )
    for n in drift.removed:
        review.append(
            f"-- column dropped at source; data-destructive, apply manually:\n"
            f"-- ALTER TABLE {table} DROP COLUMN {quote_ident(n)}"
        )
    for n, s_t, t_t in drift.retyped:
        review.append(
            f"-- type drift {t_t} -> {s_t}; pick an explicit USING cast:\n"
            f"-- ALTER TABLE {table} ALTER COLUMN {quote_ident(n)} TYPE {s_t}"
        )
    return apply, review
