"""JDBC source/sink plumbing for live databases.

Spark's JDBC DataFrame reader/writer already provides the reference's
hand-built machinery (SURVEY.md §4): partitioned parallel scans replace
``pg_dump --jobs`` (S4), pushed-down predicates replace COPY subqueries
(S7), and ``batchsize``/``reWriteBatchedInserts`` replace adaptive INSERT
batching (S17). What Spark does NOT provide natively is keyed upsert to a
plain JDBC target — this module generates the same ``INSERT … ON CONFLICT``
statements the reference builds (src/xmin/writer.rs:271-320), applied per
partition.

URL sniffing mirrors src/lib.rs:65-86: postgres://, mysql://, mongodb://,
*.db/*.sqlite path → source type.

No live database exists in the test environment, so execution paths are
exercised against SQL-generation unit tests; wire-level behavior is
deferred to an environment with a reachable database.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from ..plans.rules import quote_ident


def quote_table(name: str) -> str:
    """Quote a possibly schema-qualified table name: each dot-separated
    part is identifier-quoted (``public.orders`` → ``"public"."orders"``).
    Config-supplied table names must never reach generated SQL raw
    (reference quotes via utils.rs:392-465 and validates via
    jsonb/validate_table_name)."""
    parts = name.split(".")
    if not parts or any(p == "" for p in parts) or len(parts) > 3:
        raise ValueError(f"invalid table name: {name!r}")
    return ".".join(quote_ident(p) for p in parts)


def detect_source_type(url_or_path: str) -> str:
    """Source-type sniffing (reference src/lib.rs:65-86)."""
    low = url_or_path.lower()
    if low.startswith(("postgres://", "postgresql://")):
        return "postgres"
    if low.startswith("mysql://"):
        return "mysql"
    if low.startswith(("mongodb://", "mongodb+srv://")):
        return "mongodb"
    if low.endswith((".db", ".sqlite", ".sqlite3")):
        return "sqlite"
    raise ValueError(f"cannot detect source type from {url_or_path!r}")


def jdbc_url(source_type: str, host: str, port: int, database: str) -> str:
    prefix = {"postgres": "postgresql", "mysql": "mysql", "sqlite": "sqlite"}[source_type]
    if source_type == "sqlite":
        return f"jdbc:sqlite:{database}"
    return f"jdbc:{prefix}://{host}:{port}/{database}"


def partitioned_read(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    predicate: str | None = None,
    fetchsize: int = 10_000,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """Partitioned parallel scan — the Spark analogue of ``pg_dump
    --jobs=N`` (S4) plus predicate pushdown (S7). Bounds for the stride are
    probed with one min/max query, exactly what the reference's keyset
    pagination amounts to."""
    reader = spark.read.format("jdbc").option("url", url).option("fetchsize", str(fetchsize))
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    qtable = quote_table(table)
    source = f"(SELECT * FROM {qtable} WHERE {predicate}) AS src" if predicate else qtable
    reader = reader.option("dbtable", source)
    if partition_column:
        bounds = (
            spark.read.format("jdbc")
            .option("url", url)
            .option(
                "dbtable",
                f"(SELECT MIN({quote_ident(partition_column)}) AS lo, "
                f"MAX({quote_ident(partition_column)}) AS hi FROM {qtable}) AS b",
            )
            .load()
            .collect()[0]
        )
        if bounds["lo"] is not None:
            reader = (
                reader.option("partitionColumn", partition_column)
                .option("lowerBound", str(bounds["lo"]))
                .option("upperBound", str(bounds["hi"]))
                .option("numPartitions", str(num_partitions))
            )
    return reader.load()


def sql_literal(v) -> str:
    """Render a watermark value as a safe SQL literal: numbers verbatim,
    everything else single-quoted with quote doubling (anti-injection —
    watermarks come from persisted state files, not trusted code)."""
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    return "'" + str(v).replace("'", "''") + "'"


#: the only cast-bearing watermark expression accepted verbatim — the
#: Postgres xmin idiom (reader.rs:122-163). Anything else containing '::'
#: is rejected rather than interpolated (config values are untrusted).
WATERMARK_EXPR_WHITELIST = frozenset({"xmin::text::bigint"})


def incremental_query(table: str, watermark_col: str, since, columns: list[str] | None = None) -> str:
    """The pushed-down incremental read (S13 generalized): for Postgres
    xmin mode pass ``watermark_col="xmin::text::bigint"``. The watermark
    value is rendered through :func:`sql_literal` (string/timestamp
    watermarks quote correctly; state-file content cannot inject SQL) and
    cast-bearing watermark expressions are whitelisted, not trusted."""
    cols = ", ".join(quote_ident(c) for c in columns) if columns else "*"
    if "::" in watermark_col:
        if watermark_col not in WATERMARK_EXPR_WHITELIST:
            raise ValueError(
                f"watermark expression {watermark_col!r} not in whitelist "
                f"{sorted(WATERMARK_EXPR_WHITELIST)}"
            )
        wm = watermark_col
    else:
        wm = quote_ident(watermark_col)
    return (
        f"SELECT {cols}, {wm} AS _watermark FROM {quote_table(table)} "
        f"WHERE {wm} > {sql_literal(since)}"
    )


# --- Postgres catalog discovery (src/migration/schema.rs:33-130) ----------

#: databases never replicated (schema.rs:36-44): templates, the maintenance
#: db, and the RDS admin db
PG_SYSTEM_DATABASES = ("template0", "template1", "postgres", "rdsadmin")

#: schemas never replicated (P7; schema.rs:69)
PG_SYSTEM_SCHEMAS = ("pg_catalog", "information_schema")


def pg_list_databases_sql() -> str:
    """User databases in deterministic order, excluding templates/system
    (reference list_databases, schema.rs:33-55)."""
    excl = ", ".join(f"'{d}'" for d in PG_SYSTEM_DATABASES)
    return (
        "SELECT datname FROM pg_database "
        f"WHERE NOT datistemplate AND datname NOT IN ({excl}) "
        "ORDER BY datname"
    )


def pg_list_tables_sql() -> str:
    """User tables + row estimates (reference joins pg_tables with
    pg_stat_user_tables for n_live_tup, schema.rs:58-86)."""
    excl = ", ".join(f"'{s}'" for s in PG_SYSTEM_SCHEMAS)
    return (
        "SELECT t.schemaname, t.tablename, COALESCE(s.n_live_tup, 0) AS row_estimate "
        "FROM pg_tables t LEFT JOIN pg_stat_user_tables s "
        "ON s.schemaname = t.schemaname AND s.relname = t.tablename "
        f"WHERE t.schemaname NOT IN ({excl}) "
        "ORDER BY t.schemaname, t.tablename"
    )


def pg_primary_key_sql(qualified_table: str) -> str:
    """Declared-PK columns via pg_index/pg_attribute (reference
    src/xmin/reader.rs:378-397). Table name rides as a regclass literal."""
    lit = qualified_table.replace("'", "''")
    return (
        "SELECT a.attname FROM pg_index i "
        "JOIN pg_attribute a ON a.attrelid = i.indrelid "
        "AND a.attnum = ANY(i.indkey) "
        f"WHERE i.indrelid = '{lit}'::regclass AND i.indisprimary "
        "ORDER BY a.attnum"
    )


# --- MySQL introspection (src/mysql/reader.rs:35-46, converter.rs:181-199) -

def _mysql_str_literal(v: str) -> str:
    """Single-quoted MySQL string literal with quote doubling; the
    reference binds these as parameters — Spark's JDBC ``dbtable`` has no
    parameter channel, so values are rendered as validated literals."""
    return "'" + v.replace("\\", "\\\\").replace("'", "''") + "'"


def mysql_list_tables_sql(database: str) -> str:
    """User tables of one database, base tables only, deterministic order
    (reference src/mysql/reader.rs:35-46)."""
    return (
        "SELECT TABLE_NAME FROM INFORMATION_SCHEMA.TABLES "
        f"WHERE TABLE_SCHEMA = {_mysql_str_literal(database)} "
        "AND TABLE_TYPE = 'BASE TABLE' ORDER BY TABLE_NAME"
    )


def mysql_columns_sql(database: str, table: str) -> str:
    """Column names in ordinal order (reference src/mysql/converter.rs:
    181-199) plus the data type, for schema mapping."""
    return (
        "SELECT COLUMN_NAME, DATA_TYPE, IS_NULLABLE "
        "FROM INFORMATION_SCHEMA.COLUMNS "
        f"WHERE TABLE_SCHEMA = {_mysql_str_literal(database)} "
        f"AND TABLE_NAME = {_mysql_str_literal(table)} "
        "ORDER BY ORDINAL_POSITION"
    )


def mysql_primary_key_sql(database: str, table: str) -> str:
    """Declared-PK columns in key order via KEY_COLUMN_USAGE — the
    introspection the reference's ID rule would need to prefer a true PK
    over the id/Id/ID heuristic (the heuristic stays the documented
    behavior; converter.rs:262-276)."""
    return (
        "SELECT COLUMN_NAME FROM INFORMATION_SCHEMA.KEY_COLUMN_USAGE "
        f"WHERE TABLE_SCHEMA = {_mysql_str_literal(database)} "
        f"AND TABLE_NAME = {_mysql_str_literal(table)} "
        "AND CONSTRAINT_NAME = 'PRIMARY' ORDER BY ORDINAL_POSITION"
    )


def mysql_introspect(
    spark: SparkSession, url: str, database: str, properties: dict[str, str] | None = None
) -> dict[str, list[str]]:
    """Live-wire MySQL discovery: {table: [columns…]} via the JDBC reader
    running the INFORMATION_SCHEMA queries above (untestable in this
    container — no MySQL; the SQL strings are unit-pinned instead)."""
    def q(sql: str) -> DataFrame:
        reader = spark.read.format("jdbc").option("url", url)
        for k, v in (properties or {}).items():
            reader = reader.option(k, v)
        return reader.option("dbtable", f"({sql}) AS t").load()

    tables = [r[0] for r in q(mysql_list_tables_sql(database)).collect()]
    return {
        t: [r[0] for r in q(mysql_columns_sql(database, t)).collect()] for t in tables
    }


# --- upsert / delete SQL generation (src/xmin/writer.rs parity) -----------

def build_upsert_sql(table: str, columns: list[str], pk_cols: list[str], n_rows: int) -> str:
    """``INSERT INTO t (cols) VALUES (%s,…),… ON CONFLICT (pks) DO UPDATE
    SET c=EXCLUDED.c`` — DO NOTHING when every column is part of the PK
    (writer.rs:304-309). Placeholders are %s (psycopg style)."""
    col_list = ", ".join(quote_ident(c) for c in columns)
    row = "(" + ", ".join(["%s"] * len(columns)) + ")"
    values = ", ".join([row] * n_rows)
    pk_list = ", ".join(quote_ident(c) for c in pk_cols)
    non_pk = [c for c in columns if c not in pk_cols]
    if not non_pk:
        conflict = "DO NOTHING"
    else:
        sets = ", ".join(f"{quote_ident(c)} = EXCLUDED.{quote_ident(c)}" for c in non_pk)
        conflict = f"DO UPDATE SET {sets}"
    return (
        f"INSERT INTO {quote_table(table)} ({col_list}) VALUES {values} "
        f"ON CONFLICT ({pk_list}) {conflict}"
    )


def upsert_batch_size(n_columns: int, max_params: int = 65_000, cap: int = 100) -> int:
    """min(65000/params_per_row, 100) — the Postgres 65,535-parameter limit
    rule (writer.rs:60-66)."""
    return max(1, min(max_params // max(n_columns, 1), cap))


def build_delete_sql(table: str, pk_cols: list[str], n_rows: int) -> str:
    """``DELETE FROM t WHERE pk IN (…)`` / composite ``(a,b) IN ((…),…)``
    (writer.rs:333-377)."""
    if len(pk_cols) == 1:
        placeholders = ", ".join(["%s"] * n_rows)
        return (
            f"DELETE FROM {quote_table(table)} "
            f"WHERE {quote_ident(pk_cols[0])} IN ({placeholders})"
        )
    tup = "(" + ", ".join(["%s"] * len(pk_cols)) + ")"
    placeholders = ", ".join([tup] * n_rows)
    cols = "(" + ", ".join(quote_ident(c) for c in pk_cols) + ")"
    return f"DELETE FROM {quote_table(table)} WHERE {cols} IN ({placeholders})"


def copy_escape(s: str) -> str:
    """COPY text-format escaping, Python side — the same rules as the
    Column expression ``functions/render.copy_text_escape_expr`` (both
    mirror jsonb/writer.rs:174-186; a test pins their agreement)."""
    return (
        s.replace("\\", "\\\\")
        .replace("\t", "\\t")
        .replace("\n", "\\n")
        .replace("\r", "\\r")
    )


def render_copy_value(v) -> str:
    """One COPY text cell: NULL → ``\\N``; bytes → bytea hex; bool →
    t/f; lists → ``{...}`` array literal; strings escaped. Struct/map
    values are rejected — serialize them to JSON upstream."""
    if v is None:
        return r"\N"
    if isinstance(v, bool):
        return "t" if v else "f"
    if isinstance(v, (bytes, bytearray)):
        return "\\\\x" + bytes(v).hex()
    if isinstance(v, (list, tuple)):
        # array-literal elements need their OWN backslash/quote escaping
        # BEFORE the COPY-level escaping (two layers on the wire)
        def elem(x) -> str:
            if x is None:
                return "NULL"
            if isinstance(x, str):
                return '"' + x.replace("\\", "\\\\").replace('"', '\\"') + '"'
            return str(x)

        return copy_escape("{" + ",".join(elem(x) for x in v) + "}")
    if isinstance(v, dict):
        raise TypeError("struct/map values are not COPY-text renderable; to_json them first")
    return copy_escape(str(v))


def copy_sink(df: DataFrame, dsn: str, table: str, rows_per_copy: int = 10_000) -> None:
    """S16: Postgres COPY fast-path sink — the reference's 5-10× COPY-vs-
    INSERT claim (CHANGELOG.md:54, jsonb/writer.rs:230-322).

    Each non-empty partition opens one connection and sends bounded-size
    COPY chunks (``rows_per_copy`` rows per statement, all in one
    transaction) so executor memory stays O(chunk), not O(partition).

    NOT retry-safe: plain COPY appends, so a task retry or speculative
    twin duplicates its partition (unlike :class:`JdbcUpsertWriter`).
    Target a staging table and apply with INSERT … ON CONFLICT / MERGE —
    the same recovery posture the reference takes by truncating before
    COPY (filtered.rs:127-143).

    Transport: psycopg2 when installed; otherwise the stdlib wire client
    (:mod:`pgwire` — trust-auth, simple-query, COPY-IN subprotocol),
    which is what executes in this sandbox and what the livewire test
    byte-asserts (tests/test_copy_livewire.py). Both transports send the
    identical chunk payloads; ``df.write.jdbc(batchsize,
    reWriteBatchedInserts=true)`` remains the built-in fallback for
    password/SCRAM targets without psycopg."""
    from ..plans.rules import quote_ident

    columns = df.columns
    col_list = ", ".join(quote_ident(c) for c in columns)
    table = quote_table(table)
    copy_sql = f"COPY {table} ({col_list}) FROM STDIN"

    def apply(rows) -> None:
        rows = iter(rows)
        try:
            first = next(rows)
        except StopIteration:
            return  # empty partition: never connect
        import io
        import itertools

        def chunks():
            """rows_per_copy-bounded COPY text chunks — executor memory
            stays O(chunk) on either transport."""
            lines: list[str] = []
            for r in itertools.chain([first], rows):
                lines.append(
                    "\t".join(render_copy_value(r[c]) for c in columns) + "\n"
                )
                if len(lines) >= rows_per_copy:
                    yield "".join(lines)
                    lines = []
            if lines:
                yield "".join(lines)

        try:
            import psycopg2  # type: ignore
        except ImportError:
            psycopg2 = None
        if psycopg2 is not None:  # pragma: no cover - driver not in test env
            conn = psycopg2.connect(dsn)
            try:
                with conn.cursor() as cur:
                    for chunk in chunks():
                        cur.copy_expert(copy_sql, io.StringIO(chunk))
                conn.commit()
            finally:
                conn.close()
            return
        from .pgwire import PgWireCopyClient

        client = PgWireCopyClient.from_dsn(dsn).connect()
        try:
            client.simple_query("BEGIN")
            for chunk in chunks():
                client.copy_in(copy_sql, [chunk.encode()])
            client.simple_query("COMMIT")
        finally:
            client.close()

    df.foreachPartition(apply)


def _pyformat_to_qmark(sql: str) -> str:
    """Translate psycopg %s placeholders to DB-API qmark style (sqlite)."""
    return sql.replace("%s", "?")


def open_dbapi(dsn: str):
    """(connection, placeholder-translator) for a sink DSN.

    Postgres routes through psycopg2 (%s style, untranslated); sqlite file
    paths route through the stdlib driver with ``%s`` → ``?`` — SQLite
    speaks the same ``INSERT … ON CONFLICT (pk) DO UPDATE SET c =
    EXCLUDED.c`` and row-value ``(a,b) IN ((?,?),…)`` dialect, which makes
    it the live-wire integration path for the upsert/delete sinks in this
    container (no Postgres server available)."""
    kind = detect_source_type(dsn)
    if kind == "sqlite":
        import sqlite3

        return sqlite3.connect(dsn, timeout=30), _pyformat_to_qmark
    if kind == "postgres":  # pragma: no cover - driver not in test env
        try:
            import psycopg2  # type: ignore
        except ImportError as e:
            raise RuntimeError("psycopg2 required for JDBC upsert fast path") from e
        return psycopg2.connect(dsn), lambda s: s
    raise ValueError(f"no DB-API sink path for source type {kind!r}")


@dataclass
class JdbcUpsertWriter:
    """foreachPartition upsert/delete applier for plain-JDBC targets.

    Executors open one connection per partition and send batched ON
    CONFLICT statements — MERGE semantics without requiring a lakehouse
    table format. Batch size honors the parameter-limit rule; task retries
    are safe because upsert and delete are idempotent (the reference's
    recovery contract, writer.rs:31-47). Connections route per DSN via
    :func:`open_dbapi` — Postgres in production, live SQLite in tests."""

    dsn: str
    table: str
    pk_cols: list[str]
    delete_batch: int = 1_000  # writer.rs:221

    def upsert(self, df: DataFrame) -> None:
        columns = df.columns
        batch = upsert_batch_size(len(columns))
        dsn, table, pks = self.dsn, self.table, self.pk_cols

        def apply(rows) -> None:
            rows = iter(rows)
            try:
                first = next(rows)
            except StopIteration:
                return  # empty partition: never connect
            import itertools

            conn, xlate = open_dbapi(dsn)
            try:
                cur = conn.cursor()
                try:
                    buf: list = []
                    for r in itertools.chain([first], rows):
                        buf.append(tuple(r[c] for c in columns))
                        if len(buf) >= batch:
                            cur.execute(
                                xlate(build_upsert_sql(table, columns, pks, len(buf))),
                                [v for row in buf for v in row],
                            )
                            buf.clear()
                    if buf:
                        cur.execute(
                            xlate(build_upsert_sql(table, columns, pks, len(buf))),
                            [v for row in buf for v in row],
                        )
                finally:
                    cur.close()
                conn.commit()
            finally:
                conn.close()

        df.foreachPartition(apply)

    def delete(self, keys: DataFrame) -> None:
        """Apply batched deletes for a DataFrame of PK rows (S19): the
        anti-join reconcile produces the orphan keys; this ships them as
        ``DELETE … WHERE pk IN (…)`` / composite row-value IN batches of
        ``delete_batch`` (writer.rs:333-377)."""
        dsn, table, pks, batch = self.dsn, self.table, self.pk_cols, self.delete_batch
        key_cols = list(self.pk_cols)

        def apply(rows) -> None:
            rows = iter(rows)
            try:
                first = next(rows)
            except StopIteration:
                return
            import itertools

            conn, xlate = open_dbapi(dsn)
            try:
                cur = conn.cursor()
                try:
                    buf: list = []
                    for r in itertools.chain([first], rows):
                        buf.append(tuple(r[c] for c in key_cols))
                        if len(buf) >= batch:
                            cur.execute(
                                xlate(build_delete_sql(table, pks, len(buf))),
                                [v for row in buf for v in row],
                            )
                            buf.clear()
                    if buf:
                        cur.execute(
                            xlate(build_delete_sql(table, pks, len(buf))),
                            [v for row in buf for v in row],
                        )
                finally:
                    cur.close()
                conn.commit()
            finally:
                conn.close()

        keys.select(*key_cols).foreachPartition(apply)
