"""Canonical row rendering for verification checksums.

The reference renders each row as ``COALESCE(c1::text,'') || '|' || ...``
(src/migration/checksum.rs:63-68) before hashing. We keep those rules —
cast to string, NULL → '', '|' separator — but define OUR canonical string
forms for types whose ``::text`` differs from Spark's ``cast(string)``
(timestamps, floats, booleans). Verification always applies the same
rendering on both sides of a comparison, so cross-engine parity of the
rendering itself is what matters, not parity with Postgres ``::text``
(SURVEY.md §7 hard-part 2 — the reference plays the same trick at
src/xmin/reconciler.rs:469-474).

Canonical forms:
  * NULL → ``''`` (empty string)
  * timestamp → ``yyyy-MM-dd HH:mm:ss.SSSSSS`` (UTC, fixed-width micros)
  * date → ``yyyy-MM-dd``
  * double/float → ``%.6f`` fixed-point (no scientific notation)
  * boolean → ``true``/``false``
  * binary → lowercase hex
  * array<T> → ``[a,b,c]`` canonical-element join
  * everything else → Spark string cast
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _canon(col: Column, dtype: T.DataType) -> Column:
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        # Spark's 'S' fraction pattern trims trailing zeros (and drops the
        # dot when the fraction is 0), so build the fixed-width micros field
        # explicitly to match strftime('%f') on the oracle side. NTZ casts
        # to LTZ losslessly because the session timezone is pinned to UTC.
        ts = col.cast("timestamp") if isinstance(dtype, T.TimestampNTZType) else col
        micros = F.lpad(F.pmod(F.unix_micros(ts), F.lit(1_000_000)).cast("string"), 6, "0")
        return F.concat(F.date_format(ts, "yyyy-MM-dd HH:mm:ss"), F.lit("."), micros)
    if isinstance(dtype, T.DateType):
        return F.date_format(col, "yyyy-MM-dd")
    if isinstance(dtype, (T.DoubleType, T.FloatType)):
        return F.format_string("%.6f", col)
    if isinstance(dtype, T.BooleanType):
        return F.when(col, F.lit("true")).otherwise(F.lit("false"))
    if isinstance(dtype, T.BinaryType):
        return F.lower(F.hex(col))
    if isinstance(dtype, T.ArrayType):
        inner = F.transform(col, lambda x: F.coalesce(_canon(x, dtype.elementType), F.lit("")))
        return F.concat(F.lit("["), F.array_join(inner, ","), F.lit("]"))
    return col.cast("string")


def render_row_expr(df: DataFrame, columns: list[str] | None = None) -> Column:
    """``'|'``-joined canonical rendering of the given columns (all by default),
    NULLs as ``''`` — the direct analogue of checksum.rs:63-68."""
    schema = {f.name: f.dataType for f in df.schema.fields}
    cols = columns or [f.name for f in df.schema.fields]
    parts = [F.coalesce(_canon(F.col(c), schema[c]), F.lit("")) for c in cols]
    return F.concat_ws("|", *parts)


def row_hash_expr(df: DataFrame, columns: list[str] | None = None) -> Column:
    """Per-row md5 hex digest of the canonical rendering."""
    return F.md5(render_row_expr(df, columns))


def copy_text_escape_expr(col: Column) -> Column:
    """Postgres COPY text-format escaping: backslash, tab, newline, CR —
    the reference's hand-rolled sink escaping (jsonb/writer.rs:174-186),
    needed only by a custom COPY fast-path sink."""
    out = F.regexp_replace(col, r"\\", r"\\\\")
    out = F.regexp_replace(out, "\t", r"\\t")
    out = F.regexp_replace(out, "\n", r"\\n")
    out = F.regexp_replace(out, "\r", r"\\r")
    return out
