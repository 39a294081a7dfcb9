"""Preflight checks + driver-side retry (§2.11).

The reference runs preflight before every command: connectivity, version
probes, privilege scans (src/preflight.rs:163-339) — `has_table_privilege`
per filtered table, role attributes, `wal_level`
(src/postgres/privileges.rs:63-251) — and wraps every connection and
subprocess in 3-try exponential backoff (src/utils.rs:197-390).

Spark mapping: Spark's task retry covers executor-side failures, but
DRIVER-side JDBC metadata/DDL calls (bounds probes, introspection,
preflight queries themselves) get no retry from Spark — that is what
:func:`retry_backoff` is for. The probe SQL is generated here and executed
through the JDBC reader when a live database exists; in this container the
SQL shapes and the retry/backoff/transient-classification logic are
unit-tested with fake connections.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable, Sequence

from pyspark.sql import SparkSession

#: stderr/exception substrings classified as transient connection failures
#: (reference utils.rs:233-244 pattern list)
TRANSIENT_PATTERNS = (
    "connection closed",
    "connection refused",
    "could not connect",
    "server closed the connection",
    "timeout",
    "connection timed out",
    "connection reset",
)


def is_transient_error(exc: BaseException) -> bool:
    msg = str(exc).lower()
    return any(p in msg for p in TRANSIENT_PATTERNS)


def retry_backoff(
    operation: Callable,
    max_retries: int = 3,
    initial_delay: float = 1.0,
    retry_if: Callable[[BaseException], bool] | None = None,
    sleep: Callable[[float], None] = time.sleep,
):
    """Run ``operation`` with exponential backoff (reference
    utils.rs:197-278 semantics: try, on failure wait ``initial_delay``,
    double per retry, raise the last error after ``max_retries`` retries).

    ``retry_if`` gates which errors are retried (default: everything, like
    the generic reference helper; pass :func:`is_transient_error` for the
    subprocess-style connection-error classification)."""
    delay = initial_delay
    last: BaseException | None = None
    for attempt in range(max_retries + 1):
        try:
            return operation()
        except BaseException as e:  # noqa: BLE001 - mirror reference catch-all
            if retry_if is not None and not retry_if(e):
                raise
            last = e
            if attempt < max_retries:
                sleep(delay)
                delay *= 2
    assert last is not None
    raise last


# --- probe SQL (executed via JDBC when a live database exists) -------------

def has_table_privilege_sql(qualified_table: str) -> str:
    """`SELECT has_table_privilege(current_user, 'schema.table', 'SELECT')`
    (privileges.rs:227-251). The table name rides as a STRING LITERAL (it
    is an argument, not an identifier) — quote-doubled."""
    lit = qualified_table.replace("'", "''")
    return f"SELECT has_table_privilege(current_user, '{lit}', 'SELECT') AS ok"


def role_attributes_sql() -> str:
    """Role capability probe (privileges.rs:63-133): replication/createdb/
    superuser flags for current_user; the rds_replication membership check
    is separate because RDS hides rolreplication."""
    return (
        "SELECT rolname, rolreplication, rolcreatedb, rolsuper "
        "FROM pg_roles WHERE rolname = current_user"
    )


def wal_level_sql() -> str:
    """`SHOW wal_level` (privileges.rs:159-175) — 'logical' enables the
    CDC path, anything else falls back to watermark polling (the sync
    auto-detection, src/main.rs:659-730)."""
    return "SHOW wal_level"


def server_version_sql() -> str:
    """Version probe (preflight.rs:323-339 compares client/server majors;
    the Spark engine only needs the server side — there is no pg_dump)."""
    return "SHOW server_version"


@dataclass
class PreflightReport:
    ok: bool
    problems: list[str] = field(default_factory=list)
    accessible_tables: list[str] = field(default_factory=list)
    inaccessible_tables: list[str] = field(default_factory=list)
    wal_level: str | None = None
    server_version: str | None = None


def run_jdbc_preflight(
    spark: SparkSession,
    url: str,
    tables: Sequence[str] = (),
    properties: dict[str, str] | None = None,
    max_retries: int = 3,
    initial_delay: float = 1.0,
) -> PreflightReport:
    """Live-wire preflight against a JDBC source: connectivity (a 1-row
    probe), wal_level + version, and a per-table SELECT-privilege scan —
    each JDBC call wrapped in retry_backoff (driver-side calls get no
    Spark task retry). Degrades to a problem list, never raises, so
    callers can decide like the reference's validate command."""

    def q(sql: str):
        def call():
            reader = spark.read.format("jdbc").option("url", url)
            for k, v in (properties or {}).items():
                reader = reader.option(k, v)
            return reader.option("dbtable", f"({sql}) AS p").load().collect()

        return retry_backoff(
            call, max_retries=max_retries, initial_delay=initial_delay,
            retry_if=is_transient_error,
        )

    report = PreflightReport(ok=True)
    try:
        q("SELECT 1 AS ok")
    except Exception as e:  # noqa: BLE001
        report.ok = False
        report.problems.append(f"connectivity: {e}")
        return report
    try:
        report.wal_level = q(wal_level_sql())[0][0]
        report.server_version = q(server_version_sql())[0][0]
    except Exception as e:  # noqa: BLE001
        report.problems.append(f"version/wal probe: {e}")
    for t in tables:
        try:
            ok = bool(q(has_table_privilege_sql(t))[0][0])
        except Exception as e:  # noqa: BLE001
            ok = False
            report.problems.append(f"privilege probe {t}: {e}")
        (report.accessible_tables if ok else report.inaccessible_tables).append(t)
    if report.inaccessible_tables:
        report.ok = False
        report.problems.append(
            "missing SELECT privilege: " + ", ".join(report.inaccessible_tables)
        )
    return report
