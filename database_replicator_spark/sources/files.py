"""Multi-format file table IO: CSV / ORC / JSON-lines / parquet behind one
read/write pair with format sniffing.

The reference replicates DB→DB only; real warehouse handoffs also arrive
as CSV exports and columnar ORC drops. House rules applied uniformly:

  * EXPLICIT schemas always — ``inferSchema`` is a full extra pass over
    the data at 100 TB and types drift run-to-run; the writer records the
    schema in a sidecar ``_schema.json`` the reader restores from, so a
    round trip is type-exact even for CSV (which is stringly-typed on
    disk).
  * Corrupt CSV rows route to a reject channel (PERMISSIVE +
    ``columnNameOfCorruptRecord``), mirroring the JSONL reader's corrupt
    channel — ingestion never silently drops rows.
  * ORC/parquet keep predicate pushdown + column pruning; CSV scans
    prune columns only (Spark pushes no filters into CSV) — the writer's
    job is to get data OUT of csv and into a columnar format, once.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

#: extension → spark datasource format
_FORMATS = {
    ".parquet": "parquet",
    ".orc": "orc",
    ".csv": "csv",
    ".jsonl": "json",
    ".json": "json",
}


def sniff_format(path: str) -> str:
    """Datasource format from the path extension (directories use the
    extension of their basename, e.g. ``orders.csv/`` part-file dirs)."""
    base = path.rstrip("/")
    for ext, fmt in _FORMATS.items():
        if base.endswith(ext):
            return fmt
    raise ValueError(
        f"cannot sniff table format from {path!r} "
        f"(expected one of {sorted(_FORMATS)})"
    )


def _sidecar(path: str) -> str:
    return os.path.join(path, "_schema.json")


def write_table(df: DataFrame, path: str, fmt: str | None = None) -> None:
    """Write a table in the sniffed/given format with a schema sidecar.
    CSV gets an explicit header plus ISO-8601 timestamps so the values
    survive the text round trip."""
    fmt = fmt or sniff_format(path)
    w = df.write.mode("overwrite").format(fmt)
    if fmt == "csv":
        w = w.option("header", "true").option(
            "timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
        )
    w.save(path)
    with open(_sidecar(path), "w") as fh:
        json.dump(json.loads(df.schema.json()), fh)


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str | None = None,
    schema: T.StructType | None = None,
) -> DataFrame:
    """Read a table written by :func:`write_table` (or any file drop with
    a known schema). Schema resolution order: explicit arg → sidecar →
    error for text formats (parquet/orc carry their own types).

    CSV reads attach a ``_corrupt`` reject column (PERMISSIVE mode);
    callers split it off with :func:`split_corrupt`."""
    fmt = fmt or sniff_format(path)
    if schema is None and os.path.exists(_sidecar(path)):
        with open(_sidecar(path)) as fh:
            schema = T.StructType.fromJson(json.load(fh))
    r = spark.read.format(fmt)
    if fmt in ("parquet", "orc"):
        return r.load(path) if schema is None else r.schema(schema).load(path)
    if schema is None:
        raise ValueError(
            f"{fmt} needs an explicit schema (arg or {_sidecar(path)}): "
            "inferSchema is a full extra data pass and drifts types"
        )
    if fmt == "csv":
        from pyspark.sql import functions as F

        # text scan + from_csv (not spark.read.csv): keeps the raw line
        # for the corrupt channel and sidesteps Spark's restriction on
        # querying only the corrupt-record column from raw CSV files —
        # the exact pattern the JSONL reader uses (text_corpus.py).
        full = T.StructType(
            schema.fields + [T.StructField("_corrupt", T.StringType())]
        )
        header = ",".join(f.name for f in schema.fields)
        raw = spark.read.text(path)
        # each part file repeats the header; a typed data row cannot
        # render as the literal column-name line, so the equality filter
        # is safe
        parsed = raw.filter(F.col("value") != header).select(
            F.from_csv(
                F.col("value"),
                full.simpleString(),
                {
                    "mode": "PERMISSIVE",
                    "columnNameOfCorruptRecord": "_corrupt",
                    "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
                },
            ).alias("p"),
            F.col("value"),
        )
        # from_csv leaves _corrupt null but row fields null too on bad
        # lines; mark corrupt = any malformed line (from_csv sets the
        # corrupt column) and carry the raw text for the reject channel
        cols = [F.col(f"p.{f.name}").alias(f.name) for f in schema.fields]
        return parsed.select(
            *cols,
            F.when(F.col("p._corrupt").isNotNull(), F.col("value")).alias(
                "_corrupt"
            ),
        )
    return r.schema(schema).load(path)


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean rows without the reject column, corrupt raw lines)."""
    from pyspark.sql import functions as F

    if "_corrupt" not in df.columns:
        return df, df.limit(0)
    clean = df.filter(F.col("_corrupt").isNull()).drop("_corrupt")
    bad = df.filter(F.col("_corrupt").isNotNull()).select("_corrupt")
    return clean, bad


def read_evolving(
    spark: SparkSession,
    path: str,
    defaults: dict | None = None,
) -> DataFrame:
    """Read a parquet directory whose shard generations have DIFFERENT
    schemas (columns added over time — the normal life of a corpus that
    gains metadata fields), unioning them into the widest schema.

    ``mergeSchema`` makes Spark reconcile the footers (added columns are
    NULL for older files); ``defaults`` then backfills those NULLs with
    typed values so downstream integer/boolean rules never trip on
    nullability they didn't expect. This is read-side evolution — the
    old files are untouched; rewrite-side evolution is `optimize`'s job
    once the column is universal.

    Scale note: mergeSchema reads every file footer up front — O(files)
    driver work. Run it once and persist the merged schema (the
    `_schema.json` sidecar) for the steady-state reader, or keep file
    counts tamed with `compact_parquet_dir`.
    """
    from pyspark.sql import functions as F

    df = spark.read.option("mergeSchema", "true").parquet(path)
    for col, default in (defaults or {}).items():
        if col in df.columns:
            df = df.withColumn(col, F.coalesce(F.col(col), F.lit(default)))
    return df
