"""Type-tagged JSON encoding — the document-normalization spec.

The reference converts SQLite/MySQL/MongoDB rows into a canonical JSON
representation stored in a fixed 4-column JSONB table (SURVEY.md §1.1/§1.2b;
src/jsonb/writer.rs:61-103 for the table, src/*/converter.rs for the
encodings). This module reproduces that encoding **bit-for-bit as a library
of Spark column expressions** — no UDFs; everything stays JVM-side.

Encoding spec implemented here (citations into /root/reference):

  value kind                      | JSON                                  | cite
  --------------------------------|---------------------------------------|-----
  int / text / bool / null        | native JSON                           | sqlite/converter.rs:37-54
  REAL finite                     | JSON number                           | sqlite/converter.rs:41-52
  REAL NaN / +inf / -inf          | "NaN" / "inf" / "-inf" (strings)      | sqlite/converter.rs:41-52
  BLOB                            | {"_type":"blob","data":"<base64>"}    | sqlite/converter.rs:56-65
  MySQL bytes, valid UTF-8        | JSON string                           | mysql/converter.rs:65-68
  MySQL bytes, non-UTF-8          | {"_type":"binary","data":"<base64>"}  | mysql/converter.rs:69-77
  MySQL datetime                  | {"_type":"datetime","value":"…Z"}     | mysql/converter.rs:79-89
  MySQL time                      | {"_type":"time","value":"D HH:MM:SS"} | mysql/converter.rs:91-102
  BSON ObjectId                   | {"_type":"objectid","$oid":"<hex>"}   | mongodb/converter.rs:69-75
  BSON DateTime                   | {"_type":"datetime","$date":millis}   | mongodb/converter.rs:76-83
  BSON Binary                     | {"_type":"binary","subtype":n,"data":…} | mongodb/converter.rs:84-93
  BSON Regex                      | {"_type":"regex","pattern":…,"options":…} | mongodb/converter.rs:94-101
  BSON Timestamp                  | {"_type":"timestamp","t":…,"i":…}     | mongodb/converter.rs:102-109
  BSON Decimal128                 | string                                | mongodb/converter.rs:110-113
  BSON MinKey / MaxKey            | {"_type":"minkey"/"maxkey"}           | mongodb/converter.rs:118-129

Mechanism: every encoder produces a **JSON fragment** column of the form
``"key":<json-value>``; a row's fragments concatenate into the document
object. String escaping rides on Spark's own ``to_json`` (the
named_struct-substring trick) so quoting/escapes are exactly Spark-JSON.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _escaped_json_string(col: Column) -> Column:
    """JSON string literal (quoted, escaped) for a non-null string column,
    via to_json(named_struct('k', col)) minus the {"k": prefix and } suffix."""
    obj = F.to_json(F.struct(col.alias("k")))
    # strip the {"k": prefix (5 chars) and trailing } (1 char)
    return obj.substr(F.lit(6), F.length(obj) - F.lit(6))


def json_string(col: Column) -> Column:
    """Escaped JSON string value; NULL-safe (null → JSON null)."""
    s = _escaped_json_string(col)
    return F.when(col.isNull(), F.lit("null")).otherwise(s)


def json_number(col: Column) -> Column:
    """JSON number from an integral/decimal column (cast-to-string render)."""
    return F.when(col.isNull(), F.lit("null")).otherwise(col.cast("string"))


def json_bool(col: Column) -> Column:
    return F.when(col.isNull(), F.lit("null")).otherwise(
        F.when(col, F.lit("true")).otherwise(F.lit("false"))
    )


def json_real(col: Column) -> Column:
    """SQLite REAL rule: finite → number; NaN → "NaN"; ±inf → "inf"/"-inf"
    as JSON *strings* (sqlite/converter.rs:41-52; MySQL float follows the
    same non-finite rule, mysql/converter.rs:43-63)."""
    return (
        F.when(col.isNull(), F.lit("null"))
        .when(F.isnan(col), F.lit('"NaN"'))
        .when(col == float("inf"), F.lit('"inf"'))
        .when(col == float("-inf"), F.lit('"-inf"'))
        .otherwise(col.cast("string"))
    )


def json_blob(col: Column) -> Column:
    """SQLite BLOB → {"_type":"blob","data":"<base64>"}. base64 of empty
    blob is "" (the empty-blob edge the reference fixtures probe)."""
    b64 = F.regexp_replace(F.base64(col), r"[\r\n]", "")  # unchunked base64
    return F.when(col.isNull(), F.lit("null")).otherwise(
        F.concat(F.lit('{"_type":"blob","data":"'), b64, F.lit('"}'))
    )


def json_mysql_bytes(col: Column) -> Column:
    """MySQL bytes: valid UTF-8 → JSON string; else binary-tagged base64.
    ``is_valid_utf8`` guards the decode (Spark 4's ANSI decode throws on
    malformed input instead of substituting replacement chars)."""
    b64 = F.regexp_replace(F.base64(col), r"[\r\n]", "")
    is_valid = F.call_function("is_valid_utf8", col)
    return (
        F.when(col.isNull(), F.lit("null"))
        .when(is_valid, json_string(F.decode(col, "UTF-8")))
        .otherwise(
            F.concat(F.lit('{"_type":"binary","data":"'), b64, F.lit('"}'))
        )
    )


def json_mysql_datetime(col: Column) -> Column:
    """{"_type":"datetime","value":"YYYY-MM-DDTHH:MM:SS.ffffffZ"}
    (mysql/converter.rs:79-89)."""
    micros = F.lpad(F.pmod(F.unix_micros(col.cast("timestamp")), F.lit(1_000_000)).cast("string"), 6, "0")
    iso = F.concat(
        F.date_format(col.cast("timestamp"), "yyyy-MM-dd'T'HH:mm:ss"),
        F.lit("."), micros, F.lit("Z"),
    )
    return F.when(col.isNull(), F.lit("null")).otherwise(
        F.concat(F.lit('{"_type":"datetime","value":"'), iso, F.lit('"}'))
    )


def json_mysql_time(seconds: Column, micros: Column | None = None) -> Column:
    """{"_type":"time","value":"[-]Dd HH:MM:SS.ffffff"} from a signed
    seconds-duration column (mysql/converter.rs:91-102)."""
    micros = micros if micros is not None else F.lit(0)
    sign = F.when(seconds < 0, F.lit("-")).otherwise(F.lit(""))
    abss = F.abs(seconds)
    days = (abss / 86400).cast("long")
    rem = abss % 86400
    hh = F.lpad((rem / 3600).cast("long").cast("string"), 2, "0")
    mm = F.lpad(((rem % 3600) / 60).cast("long").cast("string"), 2, "0")
    ss = F.lpad((rem % 60).cast("long").cast("string"), 2, "0")
    frac = F.lpad(micros.cast("string"), 6, "0")
    val = F.concat(sign, days.cast("string"), F.lit("d "), hh, F.lit(":"), mm, F.lit(":"), ss, F.lit("."), frac)
    return F.when(seconds.isNull(), F.lit("null")).otherwise(
        F.concat(F.lit('{"_type":"time","value":"'), val, F.lit('"}'))
    )


def json_bson_objectid(hex_col: Column) -> Column:
    return F.when(hex_col.isNull(), F.lit("null")).otherwise(
        F.concat(F.lit('{"_type":"objectid","$oid":"'), F.lower(hex_col), F.lit('"}'))
    )


def json_bson_datetime(ts_col: Column) -> Column:
    """{"_type":"datetime","$date":<epoch_millis>} (mongodb/converter.rs:76-83)."""
    millis = F.unix_millis(ts_col.cast("timestamp"))
    return F.when(ts_col.isNull(), F.lit("null")).otherwise(
        F.concat(F.lit('{"_type":"datetime","$date":'), millis.cast("string"), F.lit("}"))
    )


def json_bson_binary(col: Column, subtype: Column) -> Column:
    b64 = F.regexp_replace(F.base64(col), r"[\r\n]", "")
    return F.when(col.isNull(), F.lit("null")).otherwise(
        F.concat(
            F.lit('{"_type":"binary","subtype":'), subtype.cast("string"),
            F.lit(',"data":"'), b64, F.lit('"}'),
        )
    )


def json_bson_regex(pattern: Column, options: Column) -> Column:
    return F.concat(
        F.lit('{"_type":"regex","pattern":'), json_string(pattern),
        F.lit(',"options":'), json_string(options), F.lit("}"),
    )


def json_bson_timestamp(t: Column, i: Column) -> Column:
    return F.concat(
        F.lit('{"_type":"timestamp","t":'), t.cast("string"),
        F.lit(',"i":'), i.cast("string"), F.lit("}"),
    )


def json_bson_decimal128(col: Column) -> Column:
    """Decimal128 precision-preserved as a JSON string (converter.rs:110-113)."""
    return F.when(col.isNull(), F.lit("null")).otherwise(
        F.concat(F.lit('"'), col.cast("string"), F.lit('"'))
    )


def json_minkey() -> Column:
    return F.lit('{"_type":"minkey"}')


def json_maxkey() -> Column:
    return F.lit('{"_type":"maxkey"}')


def object_from_fragments(**key_to_value: Column) -> Column:
    """Assemble ``{"k1":v1,...}`` from value-fragment columns, keys in the
    given order (the reference preserves source column order)."""
    parts: list[Column] = []
    for key, val in key_to_value.items():
        key_lit = F.lit(f'"{key}":')
        parts.append(F.concat(key_lit, val))
    return F.concat(F.lit("{"), F.concat_ws(",", *parts), F.lit("}"))
