"""Driver-side DDL execution — the restore half of S3/S5.

The reference replays dumped DDL through ``psql --file -v ON_ERROR_STOP=1``
and tolerates "already exists … skipping" notices
(src/migration/restore.rs:10-172). The Spark engine generates DDL from
introspected schemas (operators/ddl.py) and replays it here:

  * **SQLite targets** run live through the stdlib driver — the
    integration-testable path in this container.
  * **Postgres targets** run through psycopg2 when present.
  * **Anything JDBC** runs through the JVM's ``java.sql.DriverManager``
    via the SparkSession's py4j gateway when the driver jar is on the
    classpath — no extra Python dependency.

All paths share the same statement splitting, idempotency tolerance
("already exists" errors skipped, mirroring restore.rs:75), and
driver-side retry (plans/preflight.retry_backoff) for transient failures.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .jdbc import detect_source_type


def split_statements(sql: str) -> list[str]:
    """Split a DDL script into statements on top-level semicolons,
    respecting single/double-quoted spans and $$-dollar-quoted bodies
    (the CREATE ROLE guards from operators/ddl.py emit DO $$ … $$;)."""
    out: list[str] = []
    buf: list[str] = []
    in_sq = in_dq = in_dollar = False
    i = 0
    while i < len(sql):
        ch = sql[i]
        if in_sq:
            buf.append(ch)
            if ch == "'":
                in_sq = False
        elif in_dq:
            buf.append(ch)
            if ch == '"':
                in_dq = False
        elif in_dollar:
            buf.append(ch)
            if ch == "$" and sql[i - 1] == "$" and len(buf) >= 2:
                in_dollar = False
        elif ch == "'":
            in_sq = True
            buf.append(ch)
        elif ch == '"':
            in_dq = True
            buf.append(ch)
        elif ch == "$" and i + 1 < len(sql) and sql[i + 1] == "$":
            in_dollar = True
            buf.append(ch)
            buf.append("$")
            i += 1
        elif ch == ";":
            stmt = "".join(buf).strip()
            if stmt and not _is_comment_only(stmt):
                out.append(stmt)
            buf = []
        else:
            buf.append(ch)
        i += 1
    tail = "".join(buf).strip()
    if tail and not _is_comment_only(tail):
        out.append(tail)
    return out


def _is_comment_only(stmt: str) -> bool:
    return all(
        not line.strip() or line.strip().startswith("--")
        for line in stmt.splitlines()
    )


@dataclass
class DdlResult:
    executed: list[str] = field(default_factory=list)
    skipped_existing: list[str] = field(default_factory=list)

    @property
    def counts(self) -> dict[str, int]:
        return {"executed": len(self.executed), "skipped": len(self.skipped_existing)}


def execute_ddl(
    dsn: str,
    sql: str,
    tolerate_existing: bool = True,
    max_retries: int = 3,
    initial_delay: float = 1.0,
) -> DdlResult:
    """Replay a DDL script against ``dsn`` (routed by URL sniffing).

    ``tolerate_existing`` mirrors the reference's "already exists …
    skipping" acceptance (restore.rs:75): those statements are recorded as
    skipped, everything else raises — ON_ERROR_STOP semantics. Transient
    connection errors retry with backoff."""
    from ..plans.preflight import is_transient_error, retry_backoff

    kind = detect_source_type(dsn)
    if kind == "sqlite":
        runner = _sqlite_runner(dsn)
    elif kind == "postgres":
        runner = _psycopg_runner(dsn)
    else:
        raise ValueError(f"no driver-side DDL path for source type {kind!r}")

    result = DdlResult()
    for stmt in split_statements(sql):
        def run(stmt=stmt):
            return runner(stmt)

        try:
            retry_backoff(
                run, max_retries=max_retries, initial_delay=initial_delay,
                retry_if=is_transient_error,
            )
            result.executed.append(stmt)
        except Exception as e:  # noqa: BLE001
            if tolerate_existing and "already exists" in str(e).lower():
                result.skipped_existing.append(stmt)
                continue
            raise
    return result


def _sqlite_runner(dsn: str):
    import sqlite3

    path = dsn

    def run(stmt: str):
        conn = sqlite3.connect(path)
        try:
            conn.execute(stmt)
            conn.commit()
        finally:
            conn.close()

    return run


def _psycopg_runner(dsn: str):  # pragma: no cover - driver not in sandbox
    try:
        import psycopg2  # type: ignore
    except ImportError as e:
        raise RuntimeError(
            "psycopg2 required for Postgres DDL execution; alternatively use "
            "execute_ddl_jvm with the JDBC driver jar on Spark's classpath"
        ) from e

    def run(stmt: str):
        conn = psycopg2.connect(dsn)
        try:
            with conn.cursor() as cur:
                cur.execute(stmt)
            conn.commit()
        finally:
            conn.close()

    return run


def execute_ddl_jvm(
    spark, jdbc_url: str, sql: str, tolerate_existing: bool = True
) -> DdlResult:  # pragma: no cover - needs a JDBC driver jar + live DB
    """DDL through the JVM's DriverManager (py4j) — works for any JDBC
    URL whose driver jar is on Spark's classpath, with no Python driver."""
    jvm = spark.sparkContext._jvm
    result = DdlResult()
    for stmt in split_statements(sql):
        conn = jvm.java.sql.DriverManager.getConnection(jdbc_url)
        try:
            st = conn.createStatement()
            try:
                st.execute(stmt)
                result.executed.append(stmt)
            except Exception as e:  # noqa: BLE001
                if tolerate_existing and "already exists" in str(e).lower():
                    result.skipped_existing.append(stmt)
                else:
                    raise
            finally:
                st.close()
        finally:
            conn.close()
    return result
