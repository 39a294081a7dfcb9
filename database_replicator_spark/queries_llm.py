"""Query-surface entries for the LLM-data-pipeline operators (dedup,
similarity, text analysis, document normalization), each with a DuckDB
oracle that reproduces the construction exactly.

Portability notes:
  * hash60 (md5-derived 60-bit int) is the shared hash; DuckDB renders it
    as CAST('0x'||substr(md5(s),1,15) AS BIGINT).
  * DuckDB ``regexp_replace`` needs the explicit 'g' flag (Spark is global
    by default); DuckDB regex is RE2 → no lookarounds in shared patterns.
  * Array folds (`F.aggregate` / `list_reduce`) run left-to-right in both
    engines and ``0.0 + x == x`` exactly, so double cosines are
    bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import query
from .sources.catalog import load_table

# shared SQL snippets -------------------------------------------------------

# the canonical normalization lives in the leaf fragments module (shared
# with the BM25-family oracles across queries_r8/r9 without import cycles)
from .oracle_sql_fragments import _NORM_SQL  # noqa: E402

_TOKS_SQL = f"regexp_split_to_array({_NORM_SQL}, ' ')"


def _hash60_sql(expr: str) -> str:
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"


def _tail60_sql(expr: str) -> str:
    return f"CAST('0x' || substr(md5({expr}), 17, 15) AS BIGINT)"


_SHINGLES_CTE = f"""
  norm AS (
    SELECT doc_id, {_TOKS_SQL} AS toks FROM documents
  ),
  sh AS (
    SELECT DISTINCT doc_id, shingle
    FROM norm, UNNEST(
      CASE WHEN len(toks) >= 3
           THEN list_transform(generate_series(1, len(toks) - 2),
                               i -> array_to_string(toks[i:i+2], ' '))
           ELSE [array_to_string(toks, ' ')] END
    ) AS t(shingle)
  )
"""

# unit-normalize once, then cosine == dot — mirrors similarity.unit_expr/
# dot_expr including fold order, so doubles are bit-identical.
_UNIT_SQL = (
    "list_transform({v}, x -> CAST(x AS DOUBLE) / "
    "sqrt(list_reduce(list_transform({v}, e -> CAST(e AS DOUBLE) * CAST(e AS DOUBLE)), (a, b) -> a + b)))"
)
_DOT_SQL = (
    "list_reduce(list_transform(list_zip({a}, {b}), "
    "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (x, y) -> x + y)"
)


# ---------------------------------------------------------------------------
# Document normalization (§1.2b/c): canonical doc table + typed encoding.
# ---------------------------------------------------------------------------

@query(
    "document_normalize",
    oracle="""
    SELECT CAST(doc_id AS VARCHAR) AS id,
           to_json(struct_pack(doc_id := doc_id, text := text, lang := lang,
                               source := source, n_chars := n_chars)) AS data,
           'parquet' AS _source_type
    FROM documents
    """,
)
def document_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-row JSON document ingestion (jsonb/writer.rs:61-68 schema,
    minus the non-deterministic _migrated_at)."""
    from .operators.documents import extract_document_id

    docs = load_table(spark, sf_dir, "documents")
    docs, _ = extract_document_id(docs, declared_pk=["doc_id"])
    return docs.select(
        F.col("_doc_id").alias("id"),
        F.to_json(F.struct("doc_id", "text", "lang", "source", "n_chars")).alias("data"),
        F.lit("parquet").alias("_source_type"),
    )


@query(
    "document_typed_encoding",
    oracle="""
    SELECT CAST(event_id AS VARCHAR) AS id,
           '{"event_id":' || event_id
           || ',"ts":{"_type":"datetime","value":"'
           || strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%dT%H:%M:%S.%f') || 'Z"}'
           || ',"event_type":' || to_json(event_type)
           || ',"value":' || (CASE WHEN isnan(value) THEN '"NaN"'
                                   WHEN value = 'inf'::DOUBLE THEN '"inf"'
                                   WHEN value = '-inf'::DOUBLE THEN '"-inf"'
                                   ELSE CAST(value AS VARCHAR) END)
           || ',"props":' || props || '}' AS data,
           'events' AS _source_type
    FROM events
    """,
)
def document_typed_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-tagged JSON encoding on a real table: datetime tagging
    (mysql/converter.rs:79-89), non-finite real rule
    (sqlite/converter.rs:41-52), raw-JSON passthrough for an already-JSON
    column."""
    from .functions import doc_json as J

    ev = load_table(spark, sf_dir, "events")
    data = J.object_from_fragments(
        event_id=J.json_number(F.col("event_id")),
        ts=J.json_mysql_datetime(F.col("ts")),
        event_type=J.json_string(F.col("event_type")),
        value=J.json_real(F.col("value")),
        props=F.col("props"),
    )
    return ev.select(
        F.col("event_id").cast("string").alias("id"),
        data.alias("data"),
        F.lit("events").alias("_source_type"),
    )


@query(
    "document_mysql_style_orders",
    oracle="""
    SELECT CAST(o_orderkey AS VARCHAR) AS id,
           '{"o_orderkey":' || o_orderkey
           || ',"o_custkey":' || o_custkey
           || ',"o_orderstatus":' || to_json(o_orderstatus)
           || ',"o_totalprice":' || (CASE WHEN isnan(o_totalprice) THEN '"NaN"'
                                          ELSE CAST(o_totalprice AS VARCHAR) END)
           || ',"o_orderdate":{"_type":"datetime","value":"'
           || strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S.%f') || 'Z"}'
           || ',"o_orderpriority":' || to_json(o_orderpriority) || '}' AS data,
           'mysql' AS _source_type
    FROM orders
    """,
)
def document_mysql_style_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MySQL-style document ingestion of a statically-typed relational
    table: the auto-dispatching encoder picks the right type-tag per Spark
    column type (number / non-finite-real rule / datetime tag / escaped
    string) — the S11→JSONB path without a live MySQL."""
    from .operators.documents import auto_fragments, extract_document_id

    orders = load_table(spark, sf_dir, "orders")
    docs, _ = extract_document_id(orders, declared_pk=["o_orderkey"])
    return docs.select(
        F.col("_doc_id").alias("id"),
        auto_fragments(orders, style="mysql").alias("data"),
        F.lit("mysql").alias("_source_type"),
    )


@query(
    "document_mongo_style_events",
    oracle="""
    SELECT lower(substr(md5(CAST(event_id AS VARCHAR)), 1, 24)) AS id,
           '{"_id":{"_type":"objectid","$oid":"'
           || lower(substr(md5(CAST(event_id AS VARCHAR)), 1, 24)) || '"}'
           || ',"event_id":' || event_id
           || ',"ts":{"_type":"datetime","$date":'
           || epoch_ms(CAST(ts AS TIMESTAMP)) || '}'
           || ',"event_type":' || to_json(event_type)
           || ',"value":' || (CASE WHEN isnan(value) THEN '"NaN"'
                                   WHEN value = 'inf'::DOUBLE THEN '"inf"'
                                   WHEN value = '-inf'::DOUBLE THEN '"-inf"'
                                   ELSE CAST(value AS VARCHAR) END)
           || ',"amount":"' || CAST(CAST(value AS DECIMAL(18,4)) AS VARCHAR) || '"'
           || ',"payload":{"_type":"binary","subtype":0,"data":"'
           || to_base64(encode(event_type)) || '"}}' AS data,
           'mongodb' AS _source_type
    FROM events
    """,
)
def document_mongo_style_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MongoDB-style document ingestion (S12→JSONB without a live Mongo):
    a deterministic ObjectId (md5-derived 24-hex) exercises the `_id`
    ObjectId→hex rule (mongodb/converter.rs:236-260); the payload covers
    the $date epoch-millis, Decimal128-as-string, and binary-subtype tags
    (converter.rs:69-113). The dynamic per-value path for real dumps is
    sources/mongo_source.read_dump_docs."""
    from .functions import doc_json as J

    ev = load_table(spark, sf_dir, "events")
    oid = F.lower(F.substring(F.md5(F.col("event_id").cast("string")), 1, 24))
    enriched = ev.select(
        "event_id", "ts", "event_type", "value",
        F.col("value").cast("decimal(18,4)").alias("amount"),
        F.encode(F.col("event_type"), "UTF-8").alias("payload"),
        oid.alias("_oid"),
    )
    data = J.object_from_fragments(
        _id=J.json_bson_objectid(F.col("_oid")),
        event_id=J.json_number(F.col("event_id")),
        ts=J.json_bson_datetime(F.col("ts")),
        event_type=J.json_string(F.col("event_type")),
        value=J.json_real(F.col("value")),
        amount=J.json_bson_decimal128(F.col("amount")),
        payload=J.json_bson_binary(F.col("payload"), F.lit(0)),
    )
    return enriched.select(
        F.col("_oid").alias("id"),
        data.alias("data"),
        F.lit("mongodb").alias("_source_type"),
    )


@query(
    "document_id_uniqueness",
    oracle="""
    SELECT COUNT(*) AS n_rows, COUNT(DISTINCT doc_id) AS n_distinct,
           COUNT(*) = COUNT(DISTINCT doc_id) AS is_unique
    FROM documents
    """,
)
def document_id_uniqueness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: the uniqueness gate behind heuristic ID extraction
    (sqlite/converter.rs:278-297)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct(F.col("doc_id")).alias("n_distinct"),
        (F.count(F.lit(1)) == F.count_distinct(F.col("doc_id"))).alias("is_unique"),
    )


# ---------------------------------------------------------------------------
# Text analysis.
# ---------------------------------------------------------------------------

@query(
    "doc_token_stats",
    oracle="""
    SELECT doc_id,
           len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
           len(list_filter(regexp_split_to_array(text, '[^A-Za-z0-9]+'), p -> p != '')) AS n_words
    FROM documents
    """,
)
def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.textops import token_count_expr

    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), r"[^A-Za-z0-9]+")
    return docs.select(
        "doc_id",
        token_count_expr(F.col("text")).alias("n_tokens"),
        F.size(F.filter(words, lambda p: p != "")).alias("n_words"),
    )


@query(
    "doc_lang_id",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang,
             len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                 x -> x IN ('the','a','of','and','to','in','is','it','for','on'))) AS n_stop,
             len(regexp_split_to_array(trim(text), '\\s+')) AS n_tok
      FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN n_tok > 0 AND n_stop * 1000 >= n_tok * 80 THEN 'en' ELSE 'other' END AS lang_pred
    FROM t
    """,
)
def doc_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.textops import lang_id_expr

    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", "lang", lang_id_expr(F.col("text")).alias("lang_pred"))


@query(
    "doc_quality",
    oracle="""
    WITH c AS (
      SELECT doc_id,
             length(text) AS n_chars_m,
             len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
             len(regexp_extract_all(text, '[.!?,;:]')) AS n_punct,
             length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
             len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                 x -> x IN ('the','a','of','and','to','in','is','it','for','on'))) AS n_stop
      FROM documents
    )
    SELECT doc_id, n_chars_m, n_tokens, n_punct, n_alpha, n_stop,
           least((n_alpha / greatest(n_tokens, 1)) / 8.0, 1.0) * 0.4
           + least((n_stop / greatest(n_tokens, 1)) * 5.0, 1.0) * 0.4
           + least((n_punct / greatest(n_chars_m, 1)) * 20.0, 1.0) * 0.2 AS quality_score
    FROM c
    """,
)
def doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.textops import quality_components, quality_score_expr

    docs = load_table(spark, sf_dir, "documents")
    comp = quality_components(docs)
    return comp.select(
        "doc_id", "n_chars_m", "n_tokens", "n_punct", "n_alpha", "n_stop",
        quality_score_expr().alias("quality_score"),
    )


# ---------------------------------------------------------------------------
# Dedup tiers.
# ---------------------------------------------------------------------------

@query(
    "doc_winnowing_fingerprints",
    oracle=f"""
    WITH norm AS (
      SELECT doc_id, {_NORM_SQL} AS n FROM documents
    ),
    grams AS (
      SELECT doc_id, i AS pos,
             {_hash60_sql('substr(n, CAST(i AS INTEGER), 5)')} AS h
      FROM norm, UNNEST(generate_series(1, greatest(length(n) - 4, 1))) AS t(i)
    )
    SELECT DISTINCT doc_id,
           MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fingerprint
    FROM grams
    """,
)
def doc_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash winnowing fingerprints (k=5 char-grams, window 4):
    sub-document near-dup evidence robust to local edits — the brief's
    'rolling hash' fingerprinting. Trailing partial windows included
    (mirrored in the oracle's identical frame)."""
    from .operators.textops import winnowing_fingerprints

    docs = load_table(spark, sf_dir, "documents")
    return winnowing_fingerprints(docs, k=5, w=4)


@query(
    "dedup_exact",
    oracle=f"""
    SELECT md5({_NORM_SQL}) AS fingerprint,
           MIN(doc_id) AS keep_id,
           COUNT(*) AS n_docs
    FROM documents
    GROUP BY 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import exact_dedup_groups

    docs = load_table(spark, sf_dir, "documents")
    return exact_dedup_groups(docs)


# Carter-Wegman family mirror: h_i = (h1 + i*(h2 % P)) % P
_CW_P = 576460752303423433
_MINHASH_MINS = ",\n       ".join(
    f"MIN((h1 + {s} * h2m) % {_CW_P}) AS h{s}" for s in range(12)
)
# both bases come from ONE md5 digest: head 15 hex chars → h1, tail 15
# (chars 17-31) → h2 — mirrors hashing.hash60 / hash60_tail
_MINHASH_BASE = (
    f"SELECT doc_id, {_hash60_sql('shingle')} AS h1, "
    f"CAST('0x' || substr(md5(shingle), 17, 15) AS BIGINT) % {_CW_P} AS h2m FROM sh"
)

_LSH_BANDS = ", ".join(
    "struct_pack(band := %d, band_sig := md5(concat_ws(',', %s)))"
    % (b, ", ".join(f"CAST(h{b * 3 + r} AS VARCHAR)" for r in range(3)))
    for b in range(4)
)

# The per-bucket cap is part of the gated contract: the Spark side drops
# buckets larger than DEFAULT_MAX_BUCKET_SIZE (operators/dedup.py), the
# oracle mirrors the same rule with a HAVING filter on bucket size.
from .operators.dedup import DEFAULT_MAX_BUCKET_SIZE as _LSH_BUCKET_CAP  # noqa: E402

_CAPPED_CTE = f"""
    capped AS (
      SELECT banded.doc_id, banded.band, banded.band_sig
      FROM banded
      JOIN (SELECT band, band_sig FROM banded
            GROUP BY band, band_sig
            HAVING COUNT(*) <= {_LSH_BUCKET_CAP}) ok
        USING (band, band_sig)
    )
"""

@query(
    "dedup_minhash_lsh",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    base AS ({_MINHASH_BASE}),
    sig AS (
      SELECT doc_id,
       {_MINHASH_MINS}
      FROM base GROUP BY doc_id
    ),
    banded AS (
      SELECT doc_id, b.band, b.band_sig
      FROM sig, UNNEST([{_LSH_BANDS}]) AS u(b)
    ),
    {_CAPPED_CTE}
    SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
    FROM capped a JOIN capped b
      ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
    """,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import doc_shingles, lsh_candidate_pairs, minhash_signatures

    docs = load_table(spark, sf_dir, "documents")
    sh = doc_shingles(docs)
    sig = minhash_signatures(sh, num_hashes=12)
    return lsh_candidate_pairs(sig, bands=4, rows_per_band=3)


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    co AS (
      SELECT a.doc_id AS doc1, b.doc_id AS doc2, COUNT(*) AS inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc1, doc2, inter, s1.n AS n1, s2.n AS n2,
           inter / (s1.n + s2.n - inter) AS jaccard
    FROM co
    JOIN sizes s1 ON s1.doc_id = doc1
    JOIN sizes s2 ON s2.doc_id = doc2
    WHERE inter / (s1.n + s2.n - inter) >= 0.05
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import doc_shingles, jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    sh = doc_shingles(docs)
    return jaccard_pairs(sh, threshold=0.05)


@query(
    "dedup_lsh_verified",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    base AS ({_MINHASH_BASE}),
    sig AS (
      SELECT doc_id,
       {_MINHASH_MINS}
      FROM base GROUP BY doc_id
    ),
    banded AS (
      SELECT doc_id, b.band, b.band_sig
      FROM sig, UNNEST([{_LSH_BANDS}]) AS u(b)
    ),
    {_CAPPED_CTE},
    cand AS (
      SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
      FROM capped a JOIN capped b
        ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    co AS (
      SELECT a.doc_id AS doc1, b.doc_id AS doc2, COUNT(*) AS inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT co.doc1, co.doc2, inter, s1.n AS n1, s2.n AS n2,
           inter / (s1.n + s2.n - inter) AS jaccard
    FROM co
    JOIN cand ON cand.doc1 = co.doc1 AND cand.doc2 = co.doc2
    JOIN sizes s1 ON s1.doc_id = co.doc1
    JOIN sizes s2 ON s2.doc_id = co.doc2
    WHERE inter / (s1.n + s2.n - inter) >= 0.2
    """,
)
def dedup_lsh_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale-complete near-dup pipeline: minhash→LSH candidates, then
    exact Jaccard verification restricted to candidates — the quadratic
    work is confined to LSH buckets, which is what survives 100 TB."""
    from .operators.dedup import doc_shingles, jaccard_pairs, lsh_candidate_pairs, minhash_signatures

    docs = load_table(spark, sf_dir, "documents")
    # checkpointed: sh feeds the signature pipeline AND the verifier's
    # semi-join — one shingle explode instead of two (r13 interleaved
    # A/B: 5.8 s -> 4.4 s warm, identical output; localCheckpoint, not
    # cache — blocks are written once, no memory-pressure double-write)
    sh = doc_shingles(docs).localCheckpoint()
    cand = lsh_candidate_pairs(minhash_signatures(sh, num_hashes=12))
    return jaccard_pairs(sh, candidates=cand, threshold=0.2)


_SIMHASH_VOTES = ",\n       ".join(
    f"SUM(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS v{j}" for j in range(60)
)
_SIMHASH_SUM = " + ".join(
    f"(CASE WHEN v{j} > 0 THEN CAST({2**j} AS BIGINT) ELSE 0 END)" for j in range(60)
)

@query(
    "dedup_simhash",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    hashed AS (SELECT doc_id, {_hash60_sql('shingle')} AS h FROM sh),
    votes AS (
      SELECT doc_id,
       {_SIMHASH_VOTES}
      FROM hashed GROUP BY doc_id
    )
    SELECT doc_id, {_SIMHASH_SUM} AS simhash
    FROM votes
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import doc_shingles, simhash_signatures

    docs = load_table(spark, sf_dir, "documents")
    sh = doc_shingles(docs)
    return simhash_signatures(sh, bits=60)


# ---------------------------------------------------------------------------
# Embedding similarity.
# ---------------------------------------------------------------------------

@query(
    "embedding_neardup_pairs",
    oracle=f"""
    WITH units AS (
      SELECT vec_id, {_UNIT_SQL.format(v='embedding')} AS unit FROM embeddings
    )
    SELECT a.vec_id AS id1, b.vec_id AS id2,
           round({_DOT_SQL.format(a='a.unit', b='b.unit')}, 6) AS cosine
    FROM units a JOIN units b ON a.vec_id < b.vec_id
    WHERE {_DOT_SQL.format(a='a.unit', b='b.unit')} >= 0.5
    """,
)
def embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed block-matrix near-dup scan (cogrouped per-block-pair
    BLAS matmuls — no driver collect, survives corpora that don't fit one
    machine); scores rounded to 6 dp so the BLAS pairwise summation and
    the oracle's sequential fold agree exactly (float error ~1e-14 «
    5e-7 quantum)."""
    from .operators.similarity import neardup_pairs_blocked

    emb = load_table(spark, sf_dir, "embeddings")
    return neardup_pairs_blocked(emb, threshold=0.5)


@query(
    "similarity_topk",
    oracle=f"""
    WITH units AS (
      SELECT vec_id, {_UNIT_SQL.format(v='embedding')} AS unit FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, unit AS qvec FROM units WHERE vec_id < 5),
    scored AS (
      SELECT q.query_id, c.vec_id AS corpus_id,
             round({_DOT_SQL.format(a='c.unit', b='q.qvec')}, 6) AS cosine
      FROM units c, q
      WHERE c.vec_id != q.query_id
    )
    SELECT query_id, corpus_id, cosine, rank FROM (
      SELECT query_id, corpus_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, corpus_id ASC) AS rank
      FROM scored
    ) WHERE rank <= 10
    """,
)
def similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLAS top-k; ranking happens on the 6-dp-rounded score with corpus_id
    tiebreak in BOTH engines, so order is reproducible."""
    from .operators.similarity import topk_blas

    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 5)
    return topk_blas(emb, queries_df, k=10)


@query(
    "similarity_ivf_topk",
    oracle=f"""
    WITH units AS (
      SELECT vec_id, {_UNIT_SQL.format(v='embedding')} AS unit FROM embeddings
    ),
    cents AS (SELECT vec_id AS cid, unit AS cvec FROM units WHERE vec_id < 16),
    cells AS (
      SELECT u.vec_id, u.unit, c.cid,
             ROW_NUMBER() OVER (
               PARTITION BY u.vec_id
               ORDER BY round({_DOT_SQL.format(a='u.unit', b='c.cvec')}, 6) DESC,
                        c.cid ASC) AS rn
      FROM units u CROSS JOIN cents c
    ),
    assign AS (SELECT vec_id AS corpus_id, unit AS cvec_u, cid
               FROM cells WHERE rn = 1),
    probes AS (SELECT vec_id AS query_id, unit AS qvec_u, cid
               FROM cells WHERE rn <= 2 AND vec_id < 5),
    scored AS (
      SELECT p.query_id, a.corpus_id,
             round({_DOT_SQL.format(a='a.cvec_u', b='p.qvec_u')}, 6) AS cosine
      FROM assign a JOIN probes p
        ON a.cid = p.cid AND a.corpus_id != p.query_id
    )
    SELECT query_id, corpus_id, cosine, rank FROM (
      SELECT query_id, corpus_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, corpus_id ASC) AS rank
      FROM scored
    ) WHERE rank <= 10
    """,
)
def similarity_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat ANN (the second scale path next to LSH): deterministic
    sample quantizer (lowest-nlist ids, k-means at zero Lloyd
    iterations), nprobe=2 probed lists per query, exact rounded cosines
    within probed lists — every stage SQL-reproducible. Production
    swaps sampled-kmeans centroids in without changing the plan shape
    (operators/similarity.ivf_topk docstring)."""
    from .operators.similarity import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 5)
    return ivf_topk(emb, queries_df, k=10, nlist=16, nprobe=2)


def _lsh_planes_sql(dim: int, num_planes: int, seed: int = 0) -> str:
    """Hyperplane coefficients as SQL literal rows (plane, coeffs[])."""
    from .operators.similarity import hyperplane_coeffs

    rows = []
    for p in range(num_planes):
        coeffs = hyperplane_coeffs(dim, p, seed)
        rows.append(f"({p}, [{', '.join(repr(c) for c in coeffs)}])")
    return ", ".join(rows)


_LSH_DOT_RAW = (
    "list_reduce(list_transform(list_zip({a}, {b}), "
    "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (x, y) -> x + y)"
)

@query(
    "embedding_neardup_lsh",
    oracle=f"""
    WITH planes(p, coeffs) AS (VALUES {{planes}}),
    buckets AS (
      SELECT e.vec_id,
             SUM(CASE WHEN {_LSH_DOT_RAW.format(a='e.embedding', b='pl.coeffs')} >= 0
                      THEN CAST(POWER(2, pl.p) AS BIGINT) ELSE 0 END) AS bucket
      FROM embeddings e CROSS JOIN planes pl
      GROUP BY e.vec_id
    ),
    units AS (
      SELECT vec_id, {{unit}} AS unit FROM embeddings
    )
    SELECT a.vec_id AS id1, b.vec_id AS id2,
           round({{dot}}, 6) AS cosine
    FROM buckets a JOIN buckets b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    JOIN units ua ON ua.vec_id = a.vec_id
    JOIN units ub ON ub.vec_id = b.vec_id
    WHERE {{dot}} >= 0.15
    """.replace("{planes}", _lsh_planes_sql(64, 6))
       .replace("{unit}", _UNIT_SQL.format(v="embedding"))
       .replace("{dot}", _DOT_SQL.format(a="ua.unit", b="ub.unit")),
)
def embedding_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-prefiltered near-dup pairs, fully oracle-exact: the hyperplanes
    are deterministic (md5-derived literals embedded in the oracle SQL),
    bucket bits come from sign-of-dot folds (JVM-side, bit-exact vs the
    oracle), and within-bucket pairs get one BLAS matmul per bucket via
    applyInPandas — bucket is the only shuffle key. The scale story of
    similarity_lsh_topk with none of its approximation opacity."""
    from .operators.similarity import neardup_pairs_lsh

    emb = load_table(spark, sf_dir, "embeddings")
    return neardup_pairs_lsh(emb, dim=64, threshold=0.15, num_planes=6)


@query(
    "similarity_lsh_topk",
    # cosine = dot(raw_a, raw_b) / (norm_a * norm_b) — the same flat chain
    # the Spark side codegens (dot_unrolled / norm_unrolled); both engines
    # left-fold the products and the sums of squares, so the doubles are
    # bit-identical before rounding.
    oracle=f"""
    WITH planes(p, coeffs) AS (VALUES {{planes}}),
    buckets AS (
      SELECT e.vec_id,
             SUM(CASE WHEN {_LSH_DOT_RAW.format(a='e.embedding', b='pl.coeffs')} >= 0
                      THEN CAST(POWER(2, pl.p) AS BIGINT) ELSE 0 END) AS bucket
      FROM embeddings e CROSS JOIN planes pl
      GROUP BY e.vec_id
    ),
    norms AS (
      SELECT vec_id, embedding, {{nrm}} AS nrm FROM embeddings
    ),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
             round({{dot}} / (uc.nrm * uq.nrm), 6) AS cosine
      FROM buckets c JOIN buckets q
        ON c.bucket = q.bucket AND q.vec_id < 5 AND c.vec_id != q.vec_id
      JOIN norms uc ON uc.vec_id = c.vec_id
      JOIN norms uq ON uq.vec_id = q.vec_id
    )
    SELECT query_id, corpus_id, cosine, rank FROM (
      SELECT query_id, corpus_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, corpus_id ASC) AS rank
      FROM scored
    ) WHERE rank <= 10
    """.replace("{planes}", _lsh_planes_sql(64, 6))
       .replace(
           "{nrm}",
           "sqrt(list_reduce(list_transform(embedding, e -> CAST(e AS DOUBLE) * CAST(e AS DOUBLE)), (a, b) -> a + b))",
       )
       .replace("{dot}", _DOT_SQL.format(a="uc.embedding", b="uq.embedding")),
)
def similarity_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-path ANN, made oracle-exact: candidates = corpus vectors with
    an identical deterministic hyperplane signature (bucket equijoin), then
    exact rounded cosines and a per-query top-k window. Approximation is in
    RECALL (bucketing misses neighbors), never in values — so a value
    oracle applies; the recall-vs-bruteforce bound is tested on the
    mapInPandas variant (similarity.lsh_topk) in tests."""
    from .operators.similarity import lsh_topk_bucketed

    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 5)
    return lsh_topk_bucketed(
        emb, queries_df, dim=64, k=10, num_planes=6,
        # gate contract pins the single-table/no-probe config explicitly
        # (the operator DEFAULT is the measured sweet spot tables=4,
        # multiprobe=1 since r12 — RECALL.md)
        num_tables=1, multiprobe=0,
    )


def _lsh_planes_mt_sql(dim: int, num_planes: int, num_tables: int) -> str:
    """Multi-table hyperplane literals as SQL rows (t, p, coeffs[]) —
    table t uses seed t, matching lsh_assign_scan's seed + t."""
    from .operators.similarity import hyperplane_coeffs

    rows = []
    for t in range(num_tables):
        for p in range(num_planes):
            coeffs = hyperplane_coeffs(dim, p, seed=t)
            rows.append(f"({t}, {p}, [{', '.join(repr(c) for c in coeffs)}])")
    return ", ".join(rows)


@query(
    "similarity_lsh_topk_mt",
    # The recall-lever rendering of the LSH gate: 2 hash tables OR'd +
    # Hamming-1 query multiprobe, candidates deduped before scoring —
    # the oracle reproduces tables (per-table signatures), probes
    # (xor with each ≤1-bit mask), the DISTINCT, and the exact cosines.
    oracle=f"""
    WITH planes(t, p, coeffs) AS (VALUES {{planes}}),
    buckets AS (
      SELECT e.vec_id, pl.t,
             SUM(CASE WHEN {_LSH_DOT_RAW.format(a='e.embedding', b='pl.coeffs')} >= 0
                      THEN CAST(POWER(2, pl.p) AS BIGINT) ELSE 0 END) AS sig
      FROM embeddings e CROSS JOIN planes pl
      GROUP BY e.vec_id, pl.t
    ),
    masks(mask) AS (VALUES (0), (1), (2), (4), (8), (16), (32)),
    cand AS (
      SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS corpus_id
      FROM buckets q
      CROSS JOIN masks m
      JOIN buckets c
        ON c.t = q.t AND c.sig = xor(q.sig, CAST(m.mask AS BIGINT))
      WHERE q.vec_id < 5 AND c.vec_id != q.vec_id
    ),
    norms AS (
      SELECT vec_id, embedding, {{nrm}} AS nrm FROM embeddings
    ),
    scored AS (
      SELECT cand.query_id, cand.corpus_id,
             round({{dot}} / (uc.nrm * uq.nrm), 6) AS cosine
      FROM cand
      JOIN norms uc ON uc.vec_id = cand.corpus_id
      JOIN norms uq ON uq.vec_id = cand.query_id
    )
    SELECT query_id, corpus_id, cosine, rank FROM (
      SELECT query_id, corpus_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, corpus_id ASC) AS rank
      FROM scored
    ) WHERE rank <= 10
    """.replace("{planes}", "__MT_PLANES__")
       .replace(
           "{nrm}",
           "sqrt(list_reduce(list_transform(embedding, e -> CAST(e AS DOUBLE) * CAST(e AS DOUBLE)), (a, b) -> a + b))",
       )
       .replace("{dot}", _DOT_SQL.format(a="uc.embedding", b="uq.embedding"))
       .replace("__MT_PLANES__", _lsh_planes_mt_sql(64, 6, 2)),
)
def similarity_lsh_topk_mt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LSH recall levers, gated: 2 independently-seeded hash tables
    (OR'd candidates) + Hamming-1 query-side multiprobe, pairs deduped
    before exact rounded cosine scoring — recall rises from 0.06 to ~0.5
    (RECALL.md) while every surfaced value stays oracle-exact. At corpus
    scale the tables multiply shuffle rows linearly and the probes
    multiply only the tiny broadcast query side."""
    from .operators.similarity import lsh_topk_bucketed

    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 5)
    return lsh_topk_bucketed(
        emb, queries_df, dim=64, k=10, num_planes=6, num_tables=2, multiprobe=1
    )


@query(
    "embedding_components",
    # the embedding twin of dedup_components: LSH near-dup pairs (the
    # embedding_neardup_lsh construction) become edges, clustered by
    # hash-min connected components; the oracle mirrors the iteration
    # with a recursive CTE over the same deterministic pair set
    oracle=f"""
    WITH RECURSIVE planes(p, coeffs) AS (VALUES {{planes}}),
    buckets AS (
      SELECT e.vec_id,
             SUM(CASE WHEN {_LSH_DOT_RAW.format(a='e.embedding', b='pl.coeffs')} >= 0
                      THEN CAST(POWER(2, pl.p) AS BIGINT) ELSE 0 END) AS bucket
      FROM embeddings e CROSS JOIN planes pl
      GROUP BY e.vec_id
    ),
    units AS (
      SELECT vec_id, {{unit}} AS unit FROM embeddings
    ),
    pairs AS (
      SELECT a.vec_id AS id1, b.vec_id AS id2
      FROM buckets a JOIN buckets b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
      JOIN units ua ON ua.vec_id = a.vec_id
      JOIN units ub ON ub.vec_id = b.vec_id
      WHERE {{dot}} >= 0.15
    ),
    edges AS (
      SELECT id1 AS src, id2 AS dst FROM pairs
      UNION ALL
      SELECT id2, id1 FROM pairs
    ),
    reach AS (
      SELECT vec_id AS node, vec_id AS m FROM embeddings
      UNION
      SELECT r.node, e.dst FROM reach r JOIN edges e ON e.src = r.m
    ),
    comp AS (
      SELECT node AS vec_id, MIN(m) AS cluster_id FROM reach GROUP BY node
    )
    SELECT vec_id, cluster_id,
           COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size,
           vec_id = cluster_id AS is_canonical
    FROM comp
    """.replace("{planes}", _lsh_planes_sql(64, 6))
       .replace("{unit}", _UNIT_SQL.format(v="embedding"))
       .replace("{dot}", _DOT_SQL.format(a="ua.unit", b="ub.unit")),
)
def embedding_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic (embedding-space) cluster dedup: cosine near-dup pairs
    from the LSH-bucketed scan become edges; every vector is labeled with
    its connected component's minimum id — the canonical survivor of a
    semantic duplicate cluster. The lexical pipeline's dedup_components
    with embedding edges: together they are the two halves of a
    production near-dup stage (lexical catches templated text, semantic
    catches paraphrases)."""
    from .operators.corpus import connected_components
    from .operators.similarity import neardup_pairs_lsh
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = neardup_pairs_lsh(emb, dim=64, threshold=0.15, num_planes=6)
    comp = connected_components(
        emb.select("vec_id"), pairs, id_col="vec_id", src_col="id1", dst_col="id2"
    )
    w = Window.partitionBy("cluster_id")
    return comp.select(
        F.col("node").alias("vec_id"),
        "cluster_id",
        F.count(F.lit(1)).over(w).alias("cluster_size"),
        (F.col("node") == F.col("cluster_id")).alias("is_canonical"),
    )


@query(
    "dedup_incremental",
    # new batch = doc_id % 10 == 0 (the daily delta); index = the rest.
    # The capped CTE applies to the INDEX side only, mirroring
    # lsh_incremental_candidates.
    oracle=f"""
    WITH {_SHINGLES_CTE},
    base AS ({_MINHASH_BASE}),
    sig AS (
      SELECT doc_id,
       {_MINHASH_MINS}
      FROM base GROUP BY doc_id
    ),
    banded AS (
      SELECT doc_id, b.band, b.band_sig
      FROM sig, UNNEST([{_LSH_BANDS}]) AS u(b)
    ),
    new_b AS (SELECT * FROM banded WHERE doc_id % 10 = 0),
    idx_all AS (SELECT * FROM banded WHERE doc_id % 10 != 0),
    idx_b AS (
      SELECT idx_all.doc_id, idx_all.band, idx_all.band_sig
      FROM idx_all
      JOIN (SELECT band, band_sig FROM idx_all
            GROUP BY band, band_sig
            HAVING COUNT(*) <= {_LSH_BUCKET_CAP}) ok
        USING (band, band_sig)
    )
    SELECT DISTINCT n.doc_id AS new_doc, i.doc_id AS index_doc
    FROM new_b n JOIN idx_b i
      ON n.band = i.band AND n.band_sig = i.band_sig AND n.doc_id != i.doc_id
    """,
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental (delta-vs-index) near-dup candidates: a deterministic
    'new batch' slice (doc_id % 10 = 0) is banded and joined against the
    existing corpus's signature index — the daily-crawl dedup shape where
    the corpus is never self-joined and the delta side broadcasts."""
    from .operators.dedup import (
        doc_shingles,
        lsh_incremental_candidates,
        minhash_signatures,
    )

    docs = load_table(spark, sf_dir, "documents")
    sig = minhash_signatures(doc_shingles(docs), num_hashes=12)
    new_sigs = sig.filter(F.col("doc_id") % 10 == 0)
    index_sigs = sig.filter(F.col("doc_id") % 10 != 0)
    return lsh_incremental_candidates(new_sigs, index_sigs)


@query(
    "decontaminate_semantic",
    # Embedding-space decontamination: corpus vectors whose cosine
    # against some benchmark vector (vec_id % 50 == 0) clears 0.15,
    # candidates confined to shared single-table LSH buckets. Same
    # bucket/unit/dot machinery as embedding_neardup_lsh.
    oracle=f"""
    WITH planes(p, coeffs) AS (VALUES {{planes}}),
    buckets AS (
      SELECT e.vec_id,
             SUM(CASE WHEN {_LSH_DOT_RAW.format(a='e.embedding', b='pl.coeffs')} >= 0
                      THEN CAST(POWER(2, pl.p) AS BIGINT) ELSE 0 END) AS bucket
      FROM embeddings e CROSS JOIN planes pl
      GROUP BY e.vec_id
    ),
    units AS (
      SELECT vec_id, {{unit}} AS unit FROM embeddings
    )
    SELECT c.vec_id AS corpus_id, b.vec_id AS bench_id,
           round({{dot}}, 6) AS cosine
    FROM buckets c
    JOIN buckets b ON c.bucket = b.bucket
                  AND b.vec_id % 50 = 0
                  AND c.vec_id != b.vec_id
    JOIN units uc ON uc.vec_id = c.vec_id
    JOIN units ub ON ub.vec_id = b.vec_id
    WHERE round({{dot}}, 6) >= 0.15
    """.replace("{planes}", _lsh_planes_sql(64, 6))
       .replace("{unit}", _UNIT_SQL.format(v="embedding"))
       .replace("{dot}", _DOT_SQL.format(a="uc.unit", b="ub.unit")),
)
def decontaminate_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic decontamination — the embedding-space twin of the
    n-gram `decontaminate_overlap` gate: training vectors too close
    (cosine ≥ 0.15) to any benchmark vector, surfaced via shared LSH
    buckets so the corpus is scanned once and never self-joined
    (operators/similarity.cross_neardup_lsh; benchmark side broadcast)."""
    from .operators.similarity import cross_neardup_lsh

    emb = load_table(spark, sf_dir, "embeddings")
    bench = emb.filter(F.col("vec_id") % 50 == 0)
    return cross_neardup_lsh(emb, bench, dim=64, threshold=0.15, num_planes=6)


@query(
    "doc_classifier_score",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
             CAST(list_sum(list_transform(
               regexp_split_to_array(trim(text), '\\s+'),
               tok -> CAST('0x' || substr(md5('w:' || CAST(
                          CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) % 512
                        AS VARCHAR)), 1, 15) AS BIGINT) % 2001 - 1000
             )) AS BIGINT) AS feat_sum
      FROM documents
    )
    SELECT doc_id, n_tokens, feat_sum,
           CASE WHEN n_tokens > 0
                THEN CAST(feat_sum AS DOUBLE) / (1000.0 * CAST(n_tokens AS DOUBLE))
           END AS score,
           COALESCE(CASE WHEN n_tokens > 0
                THEN CAST(feat_sum AS DOUBLE) / (1000.0 * CAST(n_tokens AS DOUBLE))
           END >= 0, FALSE) AS accept
    FROM t
    """,
)
def doc_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-style hashed-feature linear quality classifier
    (textops.hashed_linear_score): the trained-weight-vector production
    shape with a deterministic md5-derived fake weight table, folded over
    the token array in one codegen'd higher-order aggregate — zero
    shuffles, no explode, integer-exact feature sums."""
    from .operators.textops import hashed_linear_score

    docs = load_table(spark, sf_dir, "documents")
    return hashed_linear_score(docs, num_buckets=512)


@query(
    "corpus_source_stats",
    oracle="""
    WITH t AS (
      SELECT source,
             len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens
      FROM documents
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           quantile_cont(n_tokens, 0.5) AS p50_tokens,
           MIN(n_tokens) AS min_tokens,
           MAX(n_tokens) AS max_tokens
    FROM t
    GROUP BY source
    ORDER BY source
    """,
)
def corpus_source_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The datasheet's composition core as a driver-verifiable gate:
    per-source doc/token counts and the exact interpolated median length
    (`percentile` / `quantile_cont` interpolate identically on integer
    inputs, so the doubles match bit-for-bit). One shuffle on source;
    the scale path swaps the exact percentile for `approx_percentile`
    (pipeline.corpus_datasheet's --approximate mode)."""
    from .operators.textops import token_count_expr

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "source", token_count_expr(F.col("text")).alias("n_tokens")
    )
    return (
        base.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.expr("percentile(n_tokens, 0.5)").alias("p50_tokens"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
        )
        .orderBy("source")
    )


@query(
    "doc_chunk_dedup",
    oracle="""
    WITH w AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS words
      FROM documents
    ),
    c AS (
      SELECT doc_id, idx,
             array_to_string(words[(idx*20+1):(idx*20+20)], ' ') AS chunk
      FROM w, LATERAL (
        SELECT unnest(range(CAST(ceil(len(words)/20.0) AS INT))) AS idx
      ) i
    ),
    r AS (
      SELECT doc_id, idx, chunk,
             row_number() OVER (PARTITION BY doc_id, chunk ORDER BY idx) AS rn
      FROM c
    )
    SELECT doc_id,
           COUNT(*) AS n_chunks,
           CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
           string_agg(CASE WHEN rn = 1 THEN chunk END, ' ' ORDER BY idx)
             AS clean_text
    FROM r
    GROUP BY doc_id
    """,
)
def doc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repeated-chunk removal
    (corpus.dedup_repeated_chunks): templated pages repeat their own
    boilerplate; drop later occurrences of any exact 20-word chunk,
    keeping document order. Chunking is one codegen expression; the only
    shuffle is the per-doc window."""
    from .operators.corpus import dedup_repeated_chunks

    docs = load_table(spark, sf_dir, "documents")
    return dedup_repeated_chunks(docs, chunk_words=20)


# ---------------------------------------------------------------------------
# Product quantization: compressed-index ANN (operators/pq.py). The gated
# codebook is the deterministic zero-iteration sample (unit subvectors of
# the 16 lowest-id vectors), so every stage — encode argmin, LUT build,
# integer-micros ADC sum — reproduces in SQL. m=8 subspaces × 8 dims,
# ksub=16 codes, queries = vec_id < 5.
# ---------------------------------------------------------------------------

_PQ_D2_SQL = (
    "list_reduce(list_transform(list_zip({a}, {b}), "
    "p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))"
    " * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))), (x, y) -> x + y)"
)

_PQ_SUBS_CTE = f"""
    units AS (
      SELECT vec_id, {_UNIT_SQL.format(v='embedding')} AS unit FROM embeddings
    ),
    subs AS (
      SELECT vec_id, t.j, list_slice(unit, t.j * 8 + 1, t.j * 8 + 8) AS sub
      FROM units, UNNEST([0, 1, 2, 3, 4, 5, 6, 7]) AS t(j)
    ),
    cents AS (
      SELECT vec_id AS code, j, sub AS cvec FROM subs WHERE vec_id < 16
    )
"""


@query(
    "similarity_pq_topk",
    oracle=f"""
    WITH {_PQ_SUBS_CTE},
    assign AS (
      SELECT vec_id, j, code FROM (
        SELECT s.vec_id, s.j, c.code,
               ROW_NUMBER() OVER (
                 PARTITION BY s.vec_id, s.j
                 ORDER BY round({_PQ_D2_SQL.format(a='s.sub', b='c.cvec')}, 6) ASC,
                          c.code ASC) AS rn
        FROM subs s JOIN cents c ON c.j = s.j
      ) WHERE rn = 1
    ),
    luts AS (
      SELECT q.vec_id AS query_id, c.j, c.code,
             CAST(round({_DOT_SQL.format(a='q.sub', b='c.cvec')}, 6) * 1000000
                  AS BIGINT) AS dot_micros
      FROM subs q JOIN cents c ON c.j = q.j
      WHERE q.vec_id < 5
    ),
    scored AS (
      SELECT l.query_id, a.vec_id AS corpus_id, SUM(l.dot_micros) AS score_micros
      FROM assign a JOIN luts l ON l.j = a.j AND l.code = a.code
      WHERE a.vec_id != l.query_id
      GROUP BY 1, 2
    )
    SELECT query_id, corpus_id, score, rank FROM (
      SELECT query_id, corpus_id,
             CAST(score_micros AS DOUBLE) / 1000000 AS score,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY score_micros DESC, corpus_id ASC) AS rank
      FROM scored
    ) WHERE rank <= 10
    """,
)
def similarity_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ/ADC top-k (similarity.pq_topk): the corpus is served from its
    compressed code table (8 codes/vector); per-query LUTs of exact
    BIGINT micros broadcast into a mapInPandas gather, so query-time IO
    is the codes column only. Gated at the SQL-reproducible settings —
    sample codebooks + integer-micros ADC; the trained-codebook + exact
    rerank production path is recall-tested instead (RECALL.md). The
    oracle rebuilds the same subvector slices and LUT dots with the
    shared fold-order dot snippet."""
    from .operators.similarity import pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 5)
    return pq_topk(
        emb, queries_df, k=10, m=8, ksub=16, quantizer="sample", exact_micros=True
    )


# ---------------------------------------------------------------------------
# Embedding-space corpus selection (similarity.py selection tier):
# coverage sampling, hard-negative mining, k-NN label voting.
# ---------------------------------------------------------------------------

@query(
    "embedding_coverage_sample",
    oracle=f"""
    WITH units AS (
      SELECT vec_id, {_UNIT_SQL.format(v='embedding')} AS unit FROM embeddings
    ),
    cents AS (SELECT vec_id AS cid, unit AS cvec FROM units WHERE vec_id < 16),
    cells AS (
      SELECT u.vec_id, c.cid,
             ROW_NUMBER() OVER (
               PARTITION BY u.vec_id
               ORDER BY round({_DOT_SQL.format(a='u.unit', b='c.cvec')}, 6) DESC,
                        c.cid ASC) AS rn
      FROM units u CROSS JOIN cents c
    ),
    assign AS (SELECT vec_id, cid FROM cells WHERE rn = 1),
    ranked AS (
      SELECT vec_id, cid,
             ROW_NUMBER() OVER (
               PARTITION BY cid
               ORDER BY {_hash60_sql("'0:' || CAST(vec_id AS VARCHAR)")} ASC,
                        vec_id ASC) AS cell_rank
      FROM assign
    )
    SELECT vec_id, cid, cell_rank FROM ranked WHERE cell_rank <= 10
    """,
)
def embedding_coverage_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity-preserving subset (similarity.coverage_sample): 10
    hash-selected vectors per quantizer cell, so sparse regions of
    embedding space survive selection that raw Bernoulli sampling would
    starve. Gated with the two-stage bucket prefilter ON
    (prefilter_buckets=4) — the scale path for corpus-sized cells — which
    is output-identical to the plain per-cell window the oracle runs."""
    from .operators.similarity import coverage_sample

    emb = load_table(spark, sf_dir, "embeddings")
    return coverage_sample(emb, per_cell=10, nlist=16, seed=0, prefilter_buckets=4)


@query(
    "embedding_hard_negatives",
    oracle=f"""
    WITH units AS (
      SELECT vec_id, label, {_UNIT_SQL.format(v='embedding')} AS unit
      FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, label AS qlabel, unit AS qvec
          FROM units WHERE vec_id < 5),
    scored AS (
      SELECT q.query_id, c.vec_id AS corpus_id, c.label AS neg_label,
             round({_DOT_SQL.format(a='c.unit', b='q.qvec')}, 6) AS cosine
      FROM units c, q
      WHERE c.vec_id != q.query_id AND c.label != q.qlabel
    )
    SELECT query_id, corpus_id, neg_label, cosine, rank FROM (
      SELECT query_id, corpus_id, neg_label, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, corpus_id ASC) AS rank
      FROM scored
    ) WHERE rank <= 10
    """,
)
def embedding_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive hard negatives (similarity.hard_negatives): per query,
    the 10 most-similar vectors with a DIFFERENT label — label filter
    before the top-k cut, one broadcast-queries matmul scan over the
    corpus, no shuffle beyond the rank window."""
    from .operators.similarity import hard_negatives

    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 5)
    return hard_negatives(emb, queries_df, k=10)


@query(
    "embedding_knn_label_vote",
    oracle=f"""
    WITH units AS (
      SELECT vec_id, label, {_UNIT_SQL.format(v='embedding')} AS unit
      FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, unit AS qvec FROM units WHERE vec_id < 20),
    scored AS (
      SELECT q.query_id, c.vec_id AS corpus_id, c.label AS nbr_label,
             round({_DOT_SQL.format(a='c.unit', b='q.qvec')}, 6) AS cosine
      FROM units c, q
      WHERE c.vec_id != q.query_id
    ),
    nbrs AS (
      SELECT query_id, corpus_id, nbr_label FROM (
        SELECT query_id, corpus_id, nbr_label,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, corpus_id ASC) AS rank
        FROM scored
      ) WHERE rank <= 10
    ),
    votes AS (
      SELECT query_id, nbr_label, COUNT(*) AS votes
      FROM nbrs GROUP BY 1, 2
    )
    SELECT query_id, predicted_label, votes FROM (
      SELECT query_id, nbr_label AS predicted_label, votes,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY votes DESC, nbr_label ASC) AS rn
      FROM votes
    ) WHERE rn = 1
    """,
)
def embedding_knn_label_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN majority label (similarity.knn_label_vote) over 20 query
    vectors: the label-propagation stage that bootstraps a quality
    classifier from a small hand-labeled seed set. Modal label of the 10
    nearest neighbors, ties to the smaller label."""
    from .operators.similarity import knn_label_vote

    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 20)
    return knn_label_vote(emb, queries_df, k=10)


@query(
    "similarity_ivfpq_topk",
    oracle=f"""
    WITH units AS (
      SELECT vec_id, {_UNIT_SQL.format(v='embedding')} AS unit FROM embeddings
    ),
    coarse AS (SELECT vec_id AS cid, unit AS cvec FROM units WHERE vec_id < 16),
    cells AS (
      SELECT u.vec_id, u.unit, c.cid,
             ROW_NUMBER() OVER (
               PARTITION BY u.vec_id
               ORDER BY round({_DOT_SQL.format(a='u.unit', b='c.cvec')}, 6) DESC,
                        c.cid ASC) AS rn
      FROM units u CROSS JOIN coarse c
    ),
    assign AS (SELECT vec_id AS corpus_id, cid FROM cells WHERE rn = 1),
    probes AS (SELECT vec_id AS query_id, cid FROM cells
               WHERE rn <= 2 AND vec_id < 5),
    subs AS (
      SELECT vec_id, t.j, list_slice(unit, t.j * 8 + 1, t.j * 8 + 8) AS sub
      FROM units, UNNEST([0, 1, 2, 3, 4, 5, 6, 7]) AS t(j)
    ),
    pcents AS (
      SELECT vec_id AS code, j, sub AS pcvec FROM subs WHERE vec_id < 16
    ),
    pqassign AS (
      SELECT vec_id, j, code FROM (
        SELECT s.vec_id, s.j, c.code,
               ROW_NUMBER() OVER (
                 PARTITION BY s.vec_id, s.j
                 ORDER BY round({_PQ_D2_SQL.format(a='s.sub', b='c.pcvec')}, 6) ASC,
                          c.code ASC) AS prn
        FROM subs s JOIN pcents c ON c.j = s.j
      ) WHERE prn = 1
    ),
    luts AS (
      SELECT q.vec_id AS query_id, c.j, c.code,
             CAST(round({_DOT_SQL.format(a='q.sub', b='c.pcvec')}, 6) * 1000000
                  AS BIGINT) AS dot_micros
      FROM subs q JOIN pcents c ON c.j = q.j
      WHERE q.vec_id < 5
    ),
    scored AS (
      SELECT p.query_id, a.corpus_id, SUM(l.dot_micros) AS score_micros
      FROM assign a
      JOIN probes p ON p.cid = a.cid AND a.corpus_id != p.query_id
      JOIN pqassign pa ON pa.vec_id = a.corpus_id
      JOIN luts l ON l.query_id = p.query_id AND l.j = pa.j AND l.code = pa.code
      GROUP BY 1, 2
    )
    SELECT query_id, corpus_id, score, rank FROM (
      SELECT query_id, corpus_id,
             CAST(score_micros AS DOUBLE) / 1000000 AS score,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY score_micros DESC, corpus_id ASC) AS rank
      FROM scored
    ) WHERE rank <= 10
    """,
)
def similarity_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF+PQ — the production ANN composition (similarity.ivf_pq_topk):
    one fused corpus pass builds the (cid, codes) index; queries probe 2
    of 16 coarse cells and ADC-score only those cells' codes in exact
    BIGINT micros. Both quantizers are the deterministic lowest-id
    sample here so every stage reproduces in SQL; the trained twin
    (kmeans centroids + Lloyd codebooks + exact rerank) is the
    recall-tested production path."""
    from .operators.similarity import ivf_pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 5)
    return ivf_pq_topk(
        emb, queries_df, k=10, nlist=16, nprobe=2, m=8, ksub=16, quantizer="sample"
    )


@query(
    "doc_hashed_embedding",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
      FROM documents
    ),
    sums AS (
      SELECT doc_id,
             {_hash60_sql('tok')} % 64 AS bucket,
             SUM({_tail60_sql('tok')} % 2 * 2 - 1) AS w
      FROM toks GROUP BY 1, 2
    ),
    grid AS (
      SELECT d.doc_id, g.bucket
      FROM (SELECT DISTINCT doc_id FROM documents) d,
           UNNEST(generate_series(0, 63)) AS g(bucket)
    )
    SELECT grid.doc_id, CAST(grid.bucket AS BIGINT) AS bucket,
           CAST(COALESCE(s.w, 0) AS DOUBLE) AS weight
    FROM grid LEFT JOIN sums s
      ON s.doc_id = grid.doc_id AND s.bucket = grid.bucket
    """,
)
def doc_hashed_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashed document embeddings (textops.hashed_embedding,
    dim=64): signed-count components are exact integers, assembled into
    dense vectors via a map lookup over the bucket sequence; the gate
    posexplodes the vectors back to (doc_id, bucket, weight) rows so the
    oracle verifies every component including exact zeros. This is the
    in-engine text→vector bridge that lets the semantic tier run without
    precomputed embeddings."""
    from .operators.textops import hashed_embedding

    docs = load_table(spark, sf_dir, "documents")
    emb = hashed_embedding(docs, dim=64)
    return emb.select(
        "doc_id",
        F.posexplode("embedding").alias("bucket", "weight"),
    ).select("doc_id", F.col("bucket").cast("bigint").alias("bucket"), "weight")


@query(
    "embedding_outliers",
    oracle=f"""
    WITH units AS (
      SELECT vec_id, {_UNIT_SQL.format(v='embedding')} AS unit FROM embeddings
    ),
    cents AS (SELECT vec_id AS cid, unit AS cvec FROM units WHERE vec_id < 16),
    scored AS (
      SELECT u.vec_id, c.cid,
             round({_DOT_SQL.format(a='u.unit', b='c.cvec')}, 6) AS cosine
      FROM units u CROSS JOIN cents c
    )
    SELECT vec_id, best_cid, best_cosine, best_cosine < 0.35 AS is_outlier
    FROM (
      SELECT vec_id, cid AS best_cid, cosine AS best_cosine,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY cosine DESC, cid ASC) AS rn
      FROM scored
    ) WHERE rn = 1
    """,
)
def embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OOD flagging (similarity.embedding_outliers): every vector's best
    cosine against the 16 sample centroids, flagged when below 0.35 —
    map-only, zero shuffles; the curation pass that catches encoder
    failures and off-manifold content before training. Ties in the
    best-centroid choice break to the lower cid like every quantizer
    assignment in the suite."""
    from .operators.similarity import embedding_outliers as _outliers

    emb = load_table(spark, sf_dir, "embeddings")
    return _outliers(emb, threshold=0.35, nlist=16, quantizer="sample")
