"""MongoDB → canonical document-table ingestion (S12).

The reference reads whole collections of BSON documents and converts each
to (id, type-tagged JSON) for the canonical 4-column JSONB table
(src/mongodb/reader.rs:119+, src/mongodb/converter.rs:42-129, _id rules
converter.rs:236-260, system-collection filter reader.rs:47-51).

Spark-first shape, two paths:

* **Live cluster**: ``read_collection`` wraps the Spark-MongoDB connector
  (``spark.read.format("mongodb")``) — Spark's own partitioner replaces
  the reference's single full-collection cursor with per-partition
  cursors, which is the 100 TB shape. The connector jar is not in this
  container, so the wrapper is option-assembly + a guarded call.
* **Dump files**: ``read_dump_docs`` ingests `mongoexport`-style
  Extended JSON (relaxed or canonical) line files distributedly
  (``spark.read.text`` → ``mapInPandas``) and converts every value to the
  reference's type-tagged encoding. This is the fixture-testable path and
  doubles as the real bulk path for dump-and-load migrations.

Per-value conversion runs in Python (not Catalyst expressions) because a
BSON document is dynamically typed per value — same reasoning as the
SQLite per-value path (sources/sqlite_source.py). The statically-typed
half (a DataFrame already carrying typed columns) goes through
``operators.documents.auto_fragments(style="mongo")`` instead.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOC_SCHEMA = "id string, data string, _source_type string"

#: collections skipped during discovery (reference reader.rs:47-51)
SYSTEM_COLLECTION_PREFIX = "system."


def filter_user_collections(names: list[str]) -> list[str]:
    """Drop ``system.*`` collections (reference src/mongodb/reader.rs:47-51)."""
    return [n for n in names if not n.startswith(SYSTEM_COLLECTION_PREFIX)]


def read_collection(
    spark: SparkSession,
    uri: str,
    database: str,
    collection: str,
    pipeline: str | None = None,
) -> DataFrame:
    """Live-cluster collection scan via the Spark-MongoDB connector.

    ``pipeline`` is an aggregation-pipeline JSON string pushed to the
    server (the connector's predicate-pushdown channel — the Mongo
    analogue of the COPY subquery). Raises a clear error when the
    connector jar is absent (this container has none)."""
    reader = (
        spark.read.format("mongodb")
        .option("connection.uri", uri)
        .option("database", database)
        .option("collection", collection)
    )
    if pipeline:
        reader = reader.option("aggregation.pipeline", pipeline)
    try:
        return reader.load()
    except Exception as exc:  # pragma: no cover - connector not in sandbox
        raise RuntimeError(
            "spark-mongodb connector unavailable; for dump files use "
            "read_dump_docs(), for typed DataFrames use "
            "operators.documents.auto_fragments(style='mongo')"
        ) from exc


# ---------------------------------------------------------------------------
# Extended JSON → reference type-tagged JSON (converter.rs:42-129 semantics).
# ---------------------------------------------------------------------------

def convert_value(v) -> str:
    """One parsed Extended-JSON value → reference-tagged JSON text.

    Dispatch mirrors bson_to_json (src/mongodb/converter.rs:42-129):
    scalars/arrays/documents recurse natively; the `$`-keyed Extended JSON
    wrappers map to the `_type`-tagged forms; Decimal128 stays a string;
    Undefined becomes null. Non-finite doubles render as strings, same as
    the SQLite REAL rule."""
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        import math

        if isinstance(v, float):
            if math.isnan(v):
                return '"NaN"'
            if math.isinf(v):
                return '"inf"' if v > 0 else '"-inf"'
        return json.dumps(v)
    if isinstance(v, str):
        return json.dumps(v, ensure_ascii=False)
    if isinstance(v, list):
        return "[" + ",".join(convert_value(x) for x in v) + "]"
    if isinstance(v, dict):
        tagged = _convert_extended(v)
        if tagged is not None:
            return tagged
        return convert_document(v)
    return json.dumps(str(v), ensure_ascii=False)


def _convert_extended(d: dict) -> str | None:
    """Extended-JSON `$`-wrapper → tagged fragment, or None for a plain
    subdocument."""
    if "$oid" in d:
        return '{"_type":"objectid","$oid":"%s"}' % str(d["$oid"]).lower()
    if "$date" in d:
        ms = d["$date"]
        if isinstance(ms, dict) and "$numberLong" in ms:  # canonical mode
            ms = int(ms["$numberLong"])
        if isinstance(ms, str):  # relaxed mode ISO string
            ms = _iso_to_millis(ms)
        return '{"_type":"datetime","$date":%d}' % int(ms)
    if "$binary" in d:
        b = d["$binary"]
        data = b["base64"] if isinstance(b, dict) else str(b)
        subtype = int(str(b.get("subType", "0")), 16) if isinstance(b, dict) else 0
        return '{"_type":"binary","subtype":%d,"data":"%s"}' % (subtype, data)
    if "$regularExpression" in d:
        r = d["$regularExpression"]
        return '{"_type":"regex","pattern":%s,"options":%s}' % (
            json.dumps(r.get("pattern", ""), ensure_ascii=False),
            json.dumps(r.get("options", ""), ensure_ascii=False),
        )
    if "$timestamp" in d:
        t = d["$timestamp"]
        return '{"_type":"timestamp","t":%d,"i":%d}' % (int(t["t"]), int(t["i"]))
    if "$numberDecimal" in d:
        return json.dumps(str(d["$numberDecimal"]))
    if "$numberLong" in d:
        return str(int(d["$numberLong"]))
    if "$numberInt" in d:
        return str(int(d["$numberInt"]))
    if "$numberDouble" in d:
        return convert_value(
            float("nan") if d["$numberDouble"] == "NaN" else float(d["$numberDouble"])
        )
    if "$undefined" in d:
        return "null"
    if "$minKey" in d:
        return '{"_type":"minkey"}'
    if "$maxKey" in d:
        return '{"_type":"maxkey"}'
    return None


def _iso_to_millis(iso: str) -> int:
    from datetime import datetime, timezone

    s = iso.replace("Z", "+00:00")
    dt = datetime.fromisoformat(s)
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return int(dt.timestamp() * 1000)


def convert_document(doc: dict) -> str:
    """Whole document object, keys in source order (converter.rs:131-141)."""
    parts = [
        json.dumps(k, ensure_ascii=False) + ":" + convert_value(v)
        for k, v in doc.items()
    ]
    return "{" + ",".join(parts) + "}"


def extract_id(doc: dict, doc_num: int) -> str:
    """The `_id` rules (converter.rs:236-260): ObjectId → hex,
    String/Int32/Int64 → string; any other type, or a missing `_id`,
    falls back to the 1-based document number."""
    if "_id" not in doc:
        return str(doc_num)
    v = doc["_id"]
    if isinstance(v, dict):
        if "$oid" in v:
            return str(v["$oid"]).lower()
        if "$numberLong" in v:
            return str(int(v["$numberLong"]))
        if "$numberInt" in v:
            return str(int(v["$numberInt"]))
        return str(doc_num)
    if isinstance(v, bool) or not isinstance(v, (str, int)):
        return str(doc_num)
    return str(v)


def read_dump_docs(
    spark: SparkSession, path: str, collection: str = "dump"
) -> DataFrame:
    """Distributed ingestion of a mongoexport Extended-JSON line file into
    the canonical document table.

    ``spark.read.text`` splits the file across tasks; each task parses and
    converts its lines (Arrow-batched). Document numbers — the `_id`
    fallback — must be globally stable, so they come from a window over
    the file position (zipWithIndex semantics via ``row_number`` on a
    monotonic id is NOT stable across partition counts; the line's byte
    offset would be the scalable key. For the fallback path we instead
    sort lines — acceptable because docs without `_id` are the anomaly,
    warned about in the reference too)."""
    from pyspark.sql import Window

    lines = (
        spark.read.text(path)
        .filter(F.length(F.trim(F.col("value"))) > 0)
        .withColumn("_line", F.monotonically_increasing_id())
    )
    # global 1-based doc number in file order (monotonic ids are ordered
    # within and across file splits for a deterministic file listing)
    w = Window.orderBy("_line")
    numbered = lines.withColumn("_doc_num", F.row_number().over(w))

    def convert(batches):
        import pandas as pd

        for pdf in batches:
            ids, datas = [], []
            for raw, num in zip(pdf["value"], pdf["_doc_num"]):
                doc = json.loads(raw)
                ids.append(extract_id(doc, int(num)))
                datas.append(convert_document(doc))
            yield pd.DataFrame(
                {"id": ids, "data": datas, "_source_type": ["mongodb"] * len(ids)}
            )

    docs = numbered.mapInPandas(convert, schema=DOC_SCHEMA)
    return docs.withColumn("_migrated_at", F.current_timestamp())
