"""SQLite → canonical document-table ingestion.

The reference's flagship document path (SURVEY.md §3.3): list tables from
``sqlite_master`` (skipping ``sqlite_%``), batched rowid-keyset scans, ID
extraction, per-VALUE type-tagged JSON encoding, canonical 4-column JSONB
output (src/sqlite/reader.rs, src/sqlite/converter.rs).

Spark-first shape: the rowid keyset pagination (S9) becomes a
**rowid-range partitioned read** — the driver plans [lo, hi) ranges from
min/max rowid, and each partition opens its own read-only connection
inside ``mapInPandas``. That is Spark's JDBC partitioned-scan pattern
applied to a file database; on a cluster the .db file must be on shared
storage (or the read degenerates to one partition on the driver).

Per-value encoding runs in Python (not Catalyst expressions) because
SQLite columns are dynamically typed — one column can hold an int in one
row and text in the next — so the type tag depends on the runtime value,
exactly as in the reference (converter.rs:37-65). The encoding rules are
identical to functions/doc_json.py's expression library and are tested
against the same vectors.
"""

from __future__ import annotations

import base64
import json
import math
import sqlite3

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOC_SCHEMA = "id string, data string, _source_type string"


def _connect_ro(path: str) -> sqlite3.Connection:
    return sqlite3.connect(f"file:{path}?mode=ro", uri=True)


def list_tables(path: str) -> list[str]:
    """User tables from sqlite_master, skipping sqlite_% internals
    (reader.rs:36-57)."""
    with _connect_ro(path) as conn:
        rows = conn.execute(
            "SELECT name FROM sqlite_master WHERE type='table' "
            "AND name NOT LIKE 'sqlite_%' ORDER BY name"
        ).fetchall()
    return [r[0] for r in rows]


def table_info(path: str, table: str) -> tuple[list[str], list[str]]:
    """(column names, declared-PK columns) via PRAGMA table_info
    (converter.rs:213-236)."""
    with _connect_ro(path) as conn:
        rows = conn.execute(f"PRAGMA table_info({_q(table)})").fetchall()
    cols = [r[1] for r in rows]
    pks = [r[1] for r in sorted((r for r in rows if r[5] > 0), key=lambda r: r[5])]
    return cols, pks


def _q(ident: str) -> str:
    return '"' + ident.replace('"', '""') + '"'


def encode_value(v) -> str:
    """Per-value type-tagged JSON (converter.rs:37-65):
    int/str/None → native JSON; float finite → number, NaN → '"NaN"',
    ±inf → '"inf"'/'"-inf"'; bytes → blob-tagged base64."""
    if v is None:
        return "null"
    if isinstance(v, bool):  # sqlite has no bool, but be safe
        return "true" if v else "false"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return '"NaN"'
        if math.isinf(v):
            return '"inf"' if v > 0 else '"-inf"'
        return json.dumps(v)
    if isinstance(v, bytes):
        return (
            '{"_type":"blob","data":"' + base64.b64encode(v).decode("ascii") + '"}'
        )
    return json.dumps(str(v), ensure_ascii=False)


def encode_row(columns: list[str], values) -> str:
    """Whole-row document object, keys in source column order."""
    parts = [
        json.dumps(c, ensure_ascii=False) + ":" + encode_value(v)
        for c, v in zip(columns, values)
    ]
    return "{" + ",".join(parts) + "}"


def render_id(v) -> str:
    """PK value → string id (converter.rs:162-182): ints/floats/strings
    rendered to text; floats drop a trailing .0 like the reference."""
    if isinstance(v, float) and v.is_integer():
        return str(int(v))
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _id_strategy(path: str, table: str) -> tuple[str, str | None]:
    """(strategy, column): declared single PK → its values; composite →
    1-based row number; heuristic id/rowid/_id only if verified unique via
    COUNT(*) == COUNT(DISTINCT col) (converter.rs:209-297)."""
    cols, pks = table_info(path, table)
    if len(pks) == 1:
        return "declared_pk", pks[0]
    if len(pks) > 1:
        return "rownum", None
    with _connect_ro(path) as conn:
        for cand in ("id", "rowid", "_id"):
            if cand in cols:
                n, d = conn.execute(
                    f"SELECT COUNT(*), COUNT(DISTINCT {_q(cand)}) FROM {_q(table)}"
                ).fetchone()
                if n == d:
                    return "heuristic", cand
    return "rownum", None


def read_table_docs(
    spark: SparkSession,
    path: str,
    table: str,
    num_partitions: int = 8,
) -> DataFrame:
    """Distributed document read of one SQLite table.

    Plan: driver reads min/max rowid (one tiny query) → parallelize
    [lo, hi) ranges → each task opens a read-only connection and scans its
    range ordered by rowid → per-value encode → canonical doc rows.
    Memory is O(range), mirroring the reference's O(batch) contract
    (converter.rs:383-457)."""
    with _connect_ro(path) as conn:
        row = conn.execute(
            f"SELECT MIN(rowid), MAX(rowid), COUNT(*) FROM {_q(table)}"
        ).fetchone()
    lo, hi, count = row
    strategy, id_col = _id_strategy(path, table)
    columns, _ = table_info(path, table)

    if count == 0:
        return spark.createDataFrame([], DOC_SCHEMA).withColumn(
            "_migrated_at", F.current_timestamp()
        )

    n_parts = max(1, min(num_partitions, count))
    step = (hi - lo + 1 + n_parts - 1) // n_parts
    ranges = [(lo + i * step, min(hi + 1, lo + (i + 1) * step)) for i in range(n_parts)]
    ranges_df = spark.createDataFrame(ranges, "lo long, hi long")

    def scan(batches):
        import pandas as pd

        for pdf in batches:
            for _, r in pdf.iterrows():
                conn = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
                try:
                    sel = ", ".join(_q(c) for c in columns)
                    rows = conn.execute(
                        f"SELECT rowid, {sel} FROM {_q(table)} "
                        f"WHERE rowid >= ? AND rowid < ? ORDER BY rowid",
                        (int(r["lo"]), int(r["hi"])),
                    ).fetchall()
                finally:
                    conn.close()
                if not rows:
                    continue
                ids, datas = [], []
                for row in rows:
                    rowid, values = row[0], row[1:]
                    if strategy == "declared_pk" or strategy == "heuristic":
                        idx = columns.index(id_col)
                        ids.append(render_id(values[idx]))
                    else:
                        # row-number fallback: rowid is SQLite's stable
                        # 1-based-ish ordering key; the reference's counter
                        # equals rowid on freshly-loaded tables
                        ids.append(str(rowid))
                    datas.append(encode_row(columns, values))
                yield pd.DataFrame(
                    {"id": ids, "data": datas, "_source_type": "sqlite"}
                )

    docs = ranges_df.repartition(n_parts, "lo").mapInPandas(scan, schema=DOC_SCHEMA)
    return docs.withColumn("_migrated_at", F.current_timestamp())


_DECL_TYPE_MAP = (
    ("INT", "long"),
    ("CHAR", "string"), ("CLOB", "string"), ("TEXT", "string"),
    ("BLOB", "binary"),
    ("REAL", "double"), ("FLOA", "double"), ("DOUB", "double"),
    ("NUMERIC", "double"), ("DECIMAL", "double"),
    ("BOOL", "boolean"),
    ("DATETIME", "string"), ("TIMESTAMP", "string"), ("DATE", "string"),
)


def _spark_type_for(decl: str) -> str:
    """SQLite type-affinity rules (declared type substring → affinity),
    mapped to a Spark type; untyped/unknown columns fall back to string."""
    up = (decl or "").upper()
    for key, t in _DECL_TYPE_MAP:
        if key in up:
            return t
    return "string"


def read_table_relational(
    spark: SparkSession, path: str, table: str, num_partitions: int = 4
) -> DataFrame:
    """Relational (typed-column) read of a SQLite table — the xmin-path
    shape, where rows keep their schema instead of becoming documents.
    Schema from PRAGMA declared types via affinity rules; values outside
    the declared affinity are coerced (str) or nulled, the price of
    imposing static typing on a dynamically-typed store (the document
    path via read_table_docs is the lossless alternative)."""
    with _connect_ro(path) as conn:
        info = conn.execute(f"PRAGMA table_info({_q(table)})").fetchall()
        row = conn.execute(
            f"SELECT MIN(rowid), MAX(rowid), COUNT(*) FROM {_q(table)}"
        ).fetchone()
    columns = [r[1] for r in info]
    types = [_spark_type_for(r[2]) for r in info]
    schema = ", ".join(f"{c} {t}" for c, t in zip(columns, types))
    lo, hi, count = row
    if count == 0:
        return spark.createDataFrame([], schema)

    n_parts = max(1, min(num_partitions, count))
    step = (hi - lo + 1 + n_parts - 1) // n_parts
    ranges = [(lo + i * step, min(hi + 1, lo + (i + 1) * step)) for i in range(n_parts)]
    ranges_df = spark.createDataFrame(ranges, "lo long, hi long")

    def coerce(v, t):
        if v is None:
            return None
        try:
            if t == "long":
                return int(v)
            if t == "double":
                return float(v)
            if t == "boolean":
                return bool(v)
            if t == "binary":
                return bytes(v) if isinstance(v, (bytes, bytearray)) else str(v).encode()
            return v if isinstance(v, str) else str(v)
        except (TypeError, ValueError):
            return None

    def scan(batches):
        import pandas as pd

        for pdf in batches:
            for _, r in pdf.iterrows():
                conn = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
                try:
                    sel = ", ".join(_q(c) for c in columns)
                    rows = conn.execute(
                        f"SELECT {sel} FROM {_q(table)} "
                        f"WHERE rowid >= ? AND rowid < ? ORDER BY rowid",
                        (int(r["lo"]), int(r["hi"])),
                    ).fetchall()
                finally:
                    conn.close()
                if not rows:
                    continue
                data = {
                    c: [coerce(row[i], types[i]) for row in rows]
                    for i, c in enumerate(columns)
                }
                yield pd.DataFrame(data)

    return ranges_df.repartition(n_parts, "lo").mapInPandas(scan, schema=schema)


def ingest_sqlite(
    spark: SparkSession, path: str, num_partitions: int = 8
) -> dict[str, DataFrame]:
    """Whole-database ingestion: every user table → canonical doc table
    (the init_sqlite_to_postgres pipeline, init.rs:1015-1136)."""
    return {
        t: read_table_docs(spark, path, t, num_partitions) for t in list_tables(path)
    }
