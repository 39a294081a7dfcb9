"""Raw-text corpus ingestion: JSONL dumps and one-doc-per-file trees.

The formats a pretraining pipeline actually receives (Common-Crawl-style
JSONL shards, scraped text trees) normalized into the engine's canonical
``documents`` schema — ``doc_id, text, lang, source, n_chars`` — so every
downstream operator (dedup tiers, quality filters, packing, mixing) runs
unchanged on ingested data.

Spark-first shape: ``spark.read.json``/``text`` handles splitting,
decompression, and schema enforcement; corrupt lines are CAPTURED (not
dropped silently) via PERMISSIVE mode + ``columnNameOfCorruptRecord`` so
ingestion reports can account for every input line. Document ids default
to the portable 60-bit content hash — stable across re-ingestion, and the
exact-dedup fingerprint comes for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.hashing import hash60

#: canonical documents schema every reader normalizes into
DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

_CORRUPT = "_corrupt_record"


def read_jsonl_documents(
    spark: SparkSession,
    path: str,
    text_field: str = "text",
    id_field: str | None = None,
    lang_field: str | None = "lang",
    source_field: str | None = "source",
    default_source: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Read a JSONL corpus dump into the canonical documents schema.

    Returns ``(docs, corrupt)``: ``docs`` carries every parseable line
    with a non-empty ``text_field``; ``corrupt`` carries the raw text of
    unparseable lines plus parseable lines missing the text field, so
    ``input lines == docs + corrupt`` always balances.

    ``doc_id``: the ``id_field`` value if given and numeric, else the
    portable hash60 of the text — re-ingesting the same shard yields the
    same ids (idempotent appends into the dedup index).

    Scale: one ``spark.read.text`` scan (splits uncompressed shards by
    range, parallelizes across files otherwise) + ``from_json`` —
    map-only on top of the scan. Schema is EXPLICIT (one string field
    per used key + the corrupt column) — never schema-inference, which
    at 100 TB would scan the corpus twice.
    """
    fields = {text_field}
    for f_ in (id_field, lang_field, source_field):
        if f_:
            fields.add(f_)
    schema = T.StructType(
        [T.StructField(name, T.StringType()) for name in sorted(fields)]
        + [T.StructField(_CORRUPT, T.StringType())]
    )
    # one text scan + from_json (not spark.read.json): keeps the raw line
    # for the corrupt channel, and sidesteps Spark's restriction on
    # querying only the corrupt-record column from raw JSON files
    raw = spark.read.text(path).select(
        F.col("value").alias("raw_line"),
        F.from_json(
            F.col("value"),
            schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": _CORRUPT},
        ).alias("p"),
    )
    text_col = F.col(f"p.{text_field}")
    is_parsed = F.col(f"p.{_CORRUPT}").isNull()
    text_ok = text_col.isNotNull() & (text_col != "")
    corrupt = raw.filter(~is_parsed | ~text_ok).select("raw_line")
    parsed = raw.filter(is_parsed & text_ok)
    if id_field:
        doc_id = F.coalesce(F.expr(f"try_cast(p.{id_field} AS LONG)"), hash60(text_col))
    else:
        doc_id = hash60(text_col)
    docs = parsed.select(
        doc_id.alias("doc_id"),
        text_col.alias("text"),
        (
            F.col(f"p.{lang_field}") if lang_field else F.lit(None).cast("string")
        ).alias("lang"),
        (
            F.coalesce(F.col(f"p.{source_field}"), F.lit(default_source))
            if source_field
            else F.lit(default_source).cast("string")
        ).alias("source"),
        F.length(text_col).cast("long").alias("n_chars"),
    )
    return docs, corrupt


def read_text_tree(
    spark: SparkSession,
    path: str,
    source: str | None = None,
) -> DataFrame:
    """One document per file: read a directory tree of plain-text files
    into the canonical schema. ``wholetext`` keeps each file one row;
    ``source`` defaults to the file's directory name, and ``doc_id`` is
    the content hash (stable under tree moves).

    Scale caveat (by design): wholetext files are NOT split — a single
    multi-GB text file lands in one task. Shard producers should cap
    file size; for splittable giant files use JSONL instead.
    """
    raw = spark.read.option("wholetext", "true").text(path).select(
        F.col("value").alias("text"),
        F.input_file_name().alias("_path"),
    )
    src = (
        F.lit(source)
        if source is not None
        else F.element_at(F.split(F.col("_path"), "/"), -2)
    )
    return raw.filter(F.col("text") != "").select(
        hash60(F.col("text")).alias("doc_id"),
        "text",
        F.lit(None).cast("string").alias("lang"),
        src.alias("source"),
        F.length("text").cast("long").alias("n_chars"),
    )


def ingestion_report(docs: DataFrame, corrupt: DataFrame) -> DataFrame:
    """One-row accounting for an ingestion batch: parsed docs, corrupt
    lines, distinct ids (collisions → exact dupes), char volume."""
    d = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("doc_id").alias("n_distinct_ids"),
        F.sum("n_chars").alias("total_chars"),
    ).withColumn("_k", F.lit(1))
    c = corrupt.agg(F.count(F.lit(1)).alias("n_corrupt")).withColumn("_k", F.lit(1))
    return d.join(c, on="_k").drop("_k")


def export_jsonl_shards(
    df: DataFrame,
    out_dir: str,
    shard_col: str = "shard",
    order_col: str = "pos",
    compression: str = "gzip",
) -> dict:
    """Write a built corpus as gzipped JSON-lines shards — the format
    training loaders stream (WebDataset-adjacent; one directory per
    shard, rows in deterministic ``order_col`` order within each) — plus
    a ``manifest.json`` a loader can use for length-aware scheduling
    without touching the data files.

    Plan: one repartition on the shard key (the rows were already
    assigned shards by ``deterministic_shuffle``; this is a co-location
    shuffle, not an assignment), per-partition sort, direct JSON write.
    The manifest comes from ONE per-shard aggregate (rows, docs where the
    schema carries doc_id, token sum where it carries n_tokens) — driver
    traffic is O(shards).
    """
    import json as _json
    import os as _os

    writer = (
        df.repartition(F.col(shard_col))
        .sortWithinPartitions(order_col)
        .write.mode("overwrite")
        .partitionBy(shard_col)
        .option("compression", compression)
    )
    writer.json(f"{out_dir}/shards")

    aggs = [F.count(F.lit(1)).alias("n_rows")]
    if "n_tokens" in df.columns:
        aggs.append(F.sum("n_tokens").cast("long").alias("n_tokens"))
    if "doc_id" in df.columns:
        aggs.append(F.countDistinct("doc_id").alias("n_docs"))
    per_shard = (
        df.groupBy(shard_col).agg(*aggs).orderBy(shard_col).collect()
    )
    manifest = {
        "format": f"jsonl+{compression}",
        "n_shards": len(per_shard),
        "shards": [r.asDict() for r in per_shard],
    }
    path = _os.path.join(out_dir, "manifest.json")
    with open(path, "w") as fh:
        _json.dump(manifest, fh, indent=2, default=int)
    return manifest
