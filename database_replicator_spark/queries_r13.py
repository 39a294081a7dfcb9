"""Round-13 gated surface — the r12 verdict's composition asks:

* ``rag_hybrid_fusion_topk`` — the hybrid RAG build a real pipeline
  runs, composed end to end: chunk windows → BM25 (lexical) AND a
  feature-hashed dense ranker over the SAME chunk relation → RRF fusion
  at the chunk grain → maxP parent-document ranking, against one DuckDB
  oracle (verdict ask #4; the retrieval-side sibling of
  corpus_build_e2e).
* ``cdc_toast_merge_latest`` — the unchanged-TOAST consumer contract
  gated through real wire bytes: pgoutput streams whose updates ship
  'u' columns are decoded (key-absence = keep stored value) and folded
  by the partial-row-image merge; the oracle re-derives every final
  image from the event log independently (verdict ask #3).
* ``sketch_hll_distinct`` — native HyperLogLog: the industry-standard
  mergeable distinct sketch (registers, exact MAX-merge, integer-scaled
  harmonic estimator), per-shard build MAX-merged then estimated
  against a DuckDB oracle computing identical register math.

House determinism rules per queries.py: integer fixed-point scores,
rounded-double ranking keys with integer id tiebreaks, identical
aliases in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .oracle_sql_fragments import _BM25_QUERIES, _bm25_score_ctes
from .queries import query
from .sources.catalog import load_table

# NOTE: _RAG_DOC_K / _RAG_KEY_SPAN come from queries_r12 but are imported
# lazily inside the functions that use them (house style for cross-module
# constants): a module-level import here is circular when queries_r12 is
# imported first (queries_r12 → .queries → queries_r13 → queries_r12
# partially initialized).

# ---------------------------------------------------------------------------
# rag_hybrid_fusion_topk — chunk → {BM25, dense} → RRF → maxP, composed.
#
# The dense ranker is the feature-hashed inner product (Weinberger et
# al. 2009, the textops.hashed_embedding construction at dim=16): both
# the chunk and the query embed as signed hashed-token count vectors,
# and the score is their INTEGER dot product — exact in both engines,
# no normalization NaN hazard, deterministic ties. At 100 TB the exact
# scorer swaps for the gated IVF/PQ tiers; this gate pins the
# COMPOSITION semantics (both rankers over the DERIVED chunk relation,
# fusion at the chunk grain, parent ranking by best fused chunk — Dai &
# Callan maxP over Cormack RRF).
# ---------------------------------------------------------------------------
_HYB_DIM = 16
_HYB_RANK_K = 50
_HYB_FUSED_K = 50

def _chunk_relation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared chunk relation (same construction as
    rag_chunk_retrieval_topk): 64-token/16-overlap sliding windows,
    chunk_key = doc_id·{span} + chunk_id."""
    from .operators.corpus import chunk_long_docs
    from .queries_pipeline import _CHUNK_BUDGET, _CHUNK_OVERLAP
    from .queries_r12 import _RAG_KEY_SPAN

    docs = load_table(spark, sf_dir, "documents")
    return chunk_long_docs(
        docs, budget=_CHUNK_BUDGET, overlap=_CHUNK_OVERLAP
    ).select(
        (F.col("doc_id") * _RAG_KEY_SPAN + F.col("chunk_id")).alias(
            "chunk_key"
        ),
        F.col("doc_id").alias("parent"),
        "chunk_id",
        "chunk_text",
    )


def _hashed_feats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Sparse feature-hash sums (id, bucket, w), w != 0 — the sparse
    half of textops.hashed_embedding, kept sparse because the dense
    scorer only needs shared-bucket products."""
    from .functions.hashing import hash60, hash60_tail
    from .operators.textops import tokens_expr

    return (
        df.select(
            F.col(id_col), F.explode(tokens_expr(F.col(text_col))).alias("tok")
        )
        .select(
            id_col,
            F.pmod(hash60(F.col("tok")), F.lit(_HYB_DIM)).alias("bucket"),
            (F.pmod(hash60_tail(F.col("tok")), F.lit(2)) * 2 - 1).alias(
                "sign"
            ),
        )
        .groupBy(id_col, "bucket")
        .agg(F.sum("sign").alias("w"))
        .filter(F.col("w") != 0)
    )


@query(
    "rag_hybrid_fusion_topk",
    oracle=None,  # assembled below (needs the fragment imports)
)
def rag_hybrid_fusion_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} parent documents per query under HYBRID chunk retrieval:
    BM25 and the hashed-feature dense scorer each rank the chunk
    relation (top-50, integer scores, chunk_key tiebreak), RRF fuses the
    two chunk rankings (κ=60, operators/retrieval.rrf_fuse), and parents
    rank by their best fused chunk (maxP). Output: (query_id, doc_id,
    best_chunk_id, lex_rank, dense_rank, rrf_score, doc_rank).

    Plan shape: the chunk relation is computed once and feeds both
    rankers; BM25 stats are map-side-combined aggregates with the query
    table broadcast; the dense side is a broadcast join of ≤ queries×dim
    sparse query features against the chunk features with one
    (query, chunk) aggregate; fusion and maxP run over O(queries·k)
    rows. No Python, no driver collect."""
    from .operators.retrieval import (
        bm25_scores,
        dl_from_tf,
        rrf_fuse,
        term_stats,
    )
    from .queries_r12 import _RAG_DOC_K, _RAG_KEY_SPAN

    chunks = _chunk_relation(spark, sf_dir)
    qdf = spark.createDataFrame(_BM25_QUERIES, "query_id long, term string")

    # ONE tokenize+explode of the chunk corpus (r13 plan measurement:
    # caching the chunk relation still paid the window explode + token
    # explode once per ranker). tf is checkpointed and feeds all three
    # consumers — BM25 (via stats=), dl (Σ_term tf), and the dense
    # hashed features, for which w(chunk, bucket) = Σ_tokens sign(tok)
    # = Σ_terms tf·sign(term) since bucket and sign depend only on the
    # term (chunk_text is space-joined normalized tokens, so tokens_expr
    # and doc_tokens agree token for token — and the oracle's cfeat CTE
    # reads the same toks relation as its tf). Identical integers.
    tf, _ = term_stats(chunks, id_col="chunk_key", text_col="chunk_text")
    tf = tf.localCheckpoint()
    dl = dl_from_tf(tf).localCheckpoint()

    # lexical ranking (top-50 chunks per query)
    lex_scores = bm25_scores(
        chunks, qdf, id_col="chunk_key", text_col="chunk_text",
        stats=(tf, dl),
    ).select("query_id", F.col("doc_id").alias("chunk_key"), "score_units")
    w_lex = Window.partitionBy("query_id").orderBy(
        F.col("score_units").desc(), F.col("chunk_key").asc()
    )
    lex = (
        lex_scores.withColumn("rank", F.row_number().over(w_lex))
        .filter(F.col("rank") <= _HYB_RANK_K)
        .select("query_id", F.col("chunk_key").alias("doc_id"), "rank")
    )

    # dense ranking: integer hashed-feature dot product (top-50),
    # derived from the checkpointed tf — no second corpus explode
    from .functions.hashing import hash60, hash60_tail

    cfeat = (
        tf.select(
            F.col("doc_id").alias("chunk_key"),
            F.pmod(hash60(F.col("term")), F.lit(_HYB_DIM)).alias("bucket"),
            (
                (F.pmod(hash60_tail(F.col("term")), F.lit(2)) * 2 - 1)
                * F.col("tf")
            ).alias("w"),
        )
        .groupBy("chunk_key", "bucket")
        .agg(F.sum("w").alias("cw"))
        .filter(F.col("cw") != 0)
    )
    qtext = qdf.groupBy("query_id").agg(
        F.concat_ws(" ", F.collect_list("term")).alias("qtext")
    )
    qfeat = _hashed_feats(qtext, "query_id", "qtext").withColumnRenamed(
        "w", "qw"
    )
    dots = (
        cfeat.join(F.broadcast(qfeat), on="bucket")
        .groupBy("query_id", "chunk_key")
        .agg(F.sum(F.col("cw") * F.col("qw")).alias("dot_units"))
        .filter(F.col("dot_units") != 0)
    )
    w_den = Window.partitionBy("query_id").orderBy(
        F.col("dot_units").desc(), F.col("chunk_key").asc()
    )
    dense = (
        dots.withColumn("rank", F.row_number().over(w_den))
        .filter(F.col("rank") <= _HYB_RANK_K)
        .select("query_id", F.col("chunk_key").alias("doc_id"), "rank")
    )

    # RRF fusion at the chunk grain, then maxP parent ranking
    fused = rrf_fuse(lex, dense, k=_HYB_FUSED_K, rrf_k=60)
    w_best = Window.partitionBy("query_id", "parent").orderBy(
        F.col("rrf_score").desc(), F.col("doc_id").asc()
    )
    per_doc = (
        fused.withColumn(
            "parent", F.expr(f"doc_id DIV {_RAG_KEY_SPAN}")
        )
        .withColumn("_rn", F.row_number().over(w_best))
        .filter(F.col("_rn") == 1)
        .select(
            "query_id",
            F.col("parent"),
            F.expr(f"doc_id % {_RAG_KEY_SPAN}").alias("best_chunk_id"),
            "lex_rank",
            "dense_rank",
            "rrf_score",
        )
    )
    w_doc = Window.partitionBy("query_id").orderBy(
        F.col("rrf_score").desc(), F.col("parent").asc()
    )
    return (
        per_doc.withColumn("doc_rank", F.row_number().over(w_doc))
        .filter(F.col("doc_rank") <= _RAG_DOC_K)
        .select(
            "query_id",
            F.col("parent").alias("doc_id"),
            "best_chunk_id",
            "lex_rank",
            "dense_rank",
            "rrf_score",
            "doc_rank",
        )
    )


def _hybrid_oracle() -> str:
    from .queries_llm import _TOKS_SQL
    from .queries_pipeline import _CHUNK_BUDGET, _CHUNK_STEP
    from .queries_r12 import _RAG_DOC_K, _RAG_KEY_SPAN

    qrows = ", ".join(
        f"({qid}, '{term}', -1)" for qid, term in _BM25_QUERIES
    )
    h60 = "CAST('0x' || substr(md5({e}), 1, 15) AS BIGINT)"
    t60 = "CAST('0x' || substr(md5({e}), 17, 15) AS BIGINT)"
    return f"""
    WITH t0 AS (
      SELECT doc_id, {_TOKS_SQL} AS toks, len({_TOKS_SQL}) AS n FROM documents
    ),
    cdef AS (
      SELECT doc_id, toks, n,
             CASE WHEN n <= {_CHUNK_BUDGET} THEN 1
                  ELSE 1 + (n - {_CHUNK_BUDGET} + {_CHUNK_STEP} - 1) // {_CHUNK_STEP}
             END AS n_chunks
      FROM t0
    ),
    ck AS (
      SELECT doc_id * {_RAG_KEY_SPAN} + u.i AS chunk_key,
             doc_id AS parent, CAST(u.i AS INT) AS chunk_id,
             toks[u.i * {_CHUNK_STEP} + 1 : u.i * {_CHUNK_STEP} + {_CHUNK_BUDGET}] AS ctoks
      FROM cdef, UNNEST(generate_series(0, n_chunks - 1)) AS u(i)
    ),
    toks AS (
      SELECT chunk_key AS doc_id, UNNEST(ctoks) AS term FROM ck
    ),
    tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
           FROM toks GROUP BY doc_id, term),
    dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
           FROM toks GROUP BY doc_id),
    stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                     CAST(SUM(dl) AS BIGINT) AS total_tokens FROM dl),
    q(query_id, term, self_excl) AS (VALUES {qrows}),
    {_bm25_score_ctes()},
    lex AS (
      SELECT query_id, doc_id, lex_rank FROM (
        SELECT query_id, doc_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY score_units DESC, doc_id ASC)
                 AS lex_rank
        FROM scores
      ) WHERE lex_rank <= {_HYB_RANK_K}
    ),
    cfeat AS (
      SELECT doc_id AS chunk_key,
             {h60.format(e='term')} % {_HYB_DIM} AS bucket,
             CAST(SUM({t60.format(e='term')} % 2 * 2 - 1) AS BIGINT) AS w
      FROM toks GROUP BY 1, 2 HAVING w != 0
    ),
    qfeat AS (
      SELECT query_id,
             {h60.format(e='term')} % {_HYB_DIM} AS bucket,
             CAST(SUM({t60.format(e='term')} % 2 * 2 - 1) AS BIGINT) AS w
      FROM q GROUP BY 1, 2 HAVING w != 0
    ),
    dots AS (
      SELECT qf.query_id, cf.chunk_key,
             CAST(SUM(qf.w * cf.w) AS BIGINT) AS dot_units
      FROM cfeat cf JOIN qfeat qf ON qf.bucket = cf.bucket
      GROUP BY 1, 2 HAVING dot_units != 0
    ),
    den AS (
      SELECT query_id, chunk_key AS doc_id, dense_rank FROM (
        SELECT query_id, chunk_key,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY dot_units DESC, chunk_key ASC)
                 AS dense_rank
        FROM dots
      ) WHERE dense_rank <= {_HYB_RANK_K}
    ),
    fused AS (
      SELECT query_id, doc_id, lex_rank, dense_rank, rrf_score, rank FROM (
        SELECT query_id, doc_id, lex_rank, dense_rank, rrf_score,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY rrf_score DESC, doc_id ASC)
                 AS rank
        FROM (
          SELECT COALESCE(l.query_id, d.query_id) AS query_id,
                 COALESCE(l.doc_id, d.doc_id) AS doc_id,
                 CAST(COALESCE(l.lex_rank, 0) AS BIGINT) AS lex_rank,
                 CAST(COALESCE(d.dense_rank, 0) AS BIGINT) AS dense_rank,
                 ROUND(COALESCE(1.0 / CAST(60 + l.lex_rank AS DOUBLE), 0.0)
                     + COALESCE(1.0 / CAST(60 + d.dense_rank AS DOUBLE), 0.0),
                       9) AS rrf_score
          FROM lex l FULL OUTER JOIN den d
            ON l.query_id = d.query_id AND l.doc_id = d.doc_id
        )
      ) WHERE rank <= {_HYB_FUSED_K}
    ),
    perdoc AS (
      SELECT query_id, doc_id // {_RAG_KEY_SPAN} AS parent,
             doc_id % {_RAG_KEY_SPAN} AS best_chunk_id,
             lex_rank, dense_rank, rrf_score,
             ROW_NUMBER() OVER (PARTITION BY query_id, doc_id // {_RAG_KEY_SPAN}
                                ORDER BY rrf_score DESC, doc_id ASC) AS rn
      FROM fused
    ),
    ranked AS (
      SELECT query_id, parent AS doc_id, best_chunk_id,
             lex_rank, dense_rank, rrf_score,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY rrf_score DESC, parent ASC)
               AS doc_rank
      FROM perdoc WHERE rn = 1
    )
    SELECT query_id, doc_id, best_chunk_id, lex_rank, dense_rank,
           rrf_score, doc_rank
    FROM ranked WHERE doc_rank <= {_RAG_DOC_K}
    """


# ---------------------------------------------------------------------------
# cdc_toast_merge_latest — the unchanged-TOAST keep-old contract, wire
# to _latest (r12 verdict #2/ask #3): per shard, the events-derived
# change log is framed as REAL pgoutput bytes — inserts ship the full
# row image including a TOAST-sized 'big' column; updates ship 'u' for
# it (not shipped, keep stored); deletes are key-only — decoded by the
# native parser (absent key ≠ NULL), then folded by the partial-row-
# image merge (operators/latest.merged_latest_by_key: delete clears,
# insert resets, update overrides only shipped keys). The oracle never
# sees the fold: it re-derives every survivor's final image from the
# event log with the reset/override case analysis, so a decoder that
# nulls TOAST columns or a fold that resurrects pre-delete values
# breaks the hash.
# ---------------------------------------------------------------------------
_TOAST_SHARDS = 8


@query(
    "cdc_toast_merge_latest",
    oracle="""
    WITH ev AS (
      SELECT event_id, user_id, event_type, value,
             CASE WHEN event_type = 'signup' THEN 'insert'
                  WHEN event_type = 'purchase' THEN 'delete'
                  ELSE 'update' END AS op
      FROM events
    ),
    resets AS (
      SELECT user_id,
             COALESCE(MAX(CASE WHEN op IN ('insert', 'delete')
                               THEN event_id END), 0) AS r
      FROM ev GROUP BY user_id
    ),
    lastev AS (
      SELECT user_id, MAX(event_id) AS last_eid FROM ev GROUP BY user_id
    ),
    alive AS (
      SELECT e.user_id, l.last_eid
      FROM ev e
      JOIN lastev l ON e.user_id = l.user_id AND e.event_id = l.last_eid
      WHERE e.op != 'delete'
    ),
    rinfo AS (
      SELECT e.user_id, e.op AS rop, e.event_type AS retype,
             e.value AS rval, e.event_id AS reid
      FROM ev e JOIN resets t ON e.user_id = t.user_id AND e.event_id = t.r
    ),
    lastupd AS (
      SELECT e.user_id, MAX(e.event_id) AS ueid
      FROM ev e JOIN resets t ON e.user_id = t.user_id
      WHERE e.op = 'update' AND e.event_id > t.r
      GROUP BY e.user_id
    ),
    upd AS (
      SELECT e.user_id, e.event_type AS uetype, e.value AS uval, u.ueid
      FROM ev e JOIN lastupd u
        ON e.user_id = u.user_id AND e.event_id = u.ueid
    )
    SELECT a.user_id,
           CASE WHEN r.rop = 'insert'
                THEN 'blob-' || CAST(a.user_id AS VARCHAR)
                       || '-' || CAST(r.reid AS VARCHAR) END AS big,
           CASE WHEN u.ueid IS NOT NULL THEN u.uetype
                WHEN r.rop = 'insert' THEN r.retype END AS etype,
           CASE WHEN u.ueid IS NOT NULL THEN u.uval
                WHEN r.rop = 'insert' THEN r.rval END AS val,
           CAST(a.last_eid AS BIGINT) AS change_id
    FROM alive a
    LEFT JOIN rinfo r ON r.user_id = a.user_id
    LEFT JOIN upd u ON u.user_id = a.user_id
    """,
)
def cdc_toast_merge_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final row image per surviving user after replaying the
    events-derived pgoutput stream with unchanged-TOAST updates:
    (user_id, big, etype, val, change_id) where ``big`` ships only on
    insert ('u' afterwards — it must survive every update and die with
    a delete), ``etype``/``val`` track the last shipped update, and
    ``change_id`` is the last applied event. Encode→decode runs in one
    Arrow-batched stage per shard (real wire bytes, per-stream relation
    cache); the fold is the JVM-side ordered merge — one groupBy on the
    key, exactly the ChangeApplier(merge_partial_updates=True) path."""
    import json as _json

    from .operators.latest import merged_latest_by_key
    from .sources.pgoutput import (
        UNCHANGED_TOAST,
        PgOutputEncoder,
        decode_pgoutput_stream,
    )

    events = load_table(spark, sf_dir, "events")
    src = events.select(
        F.pmod(F.col("event_id"), F.lit(_TOAST_SHARDS)).cast("int").alias(
            "shard"
        ),
        "event_id",
        "user_id",
        "event_type",
        "value",
    )

    def encode_decode(pdf):
        import math

        import pandas as pd

        pdf = pdf.sort_values("event_id")
        shard = int(pdf["shard"].iloc[0])
        enc = PgOutputEncoder(
            relid=16500 + shard,
            namespace="public",
            relname="events",
            columns=["user_id", "etype", "val", "big"],
            key_cols=["user_id"],
        )
        enc.relation().begin(xid=1300 + shard)
        eids = []
        # itertuples, not iterrows — see cdc_pgoutput_decode: iterrows
        # builds a Series per row and dominates the per-row loop cost
        for r in pdf.itertuples(index=False):
            uid = str(int(r.user_id))
            eid = int(r.event_id)
            val = (
                None
                if r.value is None
                or (isinstance(r.value, float) and math.isnan(r.value))
                else repr(float(r.value))
            )
            if r.event_type == "signup":
                enc.insert([uid, r.event_type, val, f"blob-{uid}-{eid}"])
            elif r.event_type == "purchase":
                enc.delete([uid, None, None, None])
            else:
                enc.update(
                    [uid, r.event_type, val, UNCHANGED_TOAST],
                    old_key=[uid, None, None, None],
                )
            eids.append(eid)
        enc.commit()
        rows = decode_pgoutput_stream(enc.stream())
        return pd.DataFrame(
            [
                {
                    "change_id": eid,
                    "pk": r["columns"]["user_id"],
                    "op": r["op"],
                    "payload": (
                        None
                        if r["op"] == "delete"
                        else _json.dumps(r["columns"])
                    ),
                }
                for eid, r in zip(eids, rows)
            ]
        )

    changes = src.groupBy("shard").applyInPandas(
        encode_decode,
        "change_id long, pk string, op string, payload string",
    )
    merged = merged_latest_by_key(changes, ["pk"], "change_id").filter(
        F.col("op") != "delete"
    )
    img = F.from_json(F.col("payload"), "map<string,string>")
    return merged.select(
        F.col("pk").cast("bigint").alias("user_id"),
        F.element_at(img, "big").alias("big"),
        F.element_at(img, "etype").alias("etype"),
        F.element_at(img, "val").cast("double").alias("val"),
        F.col("change_id"),
    )


from .queries import _ORACLES as _oracle_registry  # noqa: E402

_oracle_registry["rag_hybrid_fusion_topk"] = _hybrid_oracle()


# ---------------------------------------------------------------------------
# sketch_hll_distinct — native HyperLogLog (operators/sketch.py:
# hll_registers/hll_merge/hll_estimate), the industry-standard mergeable
# distinct sketch the tier was missing (KMV/CMS/Bloom/MG/KLL existed).
# The Spark side builds registers PER SHARD and MAX-merges them — the
# cross-run shipment path — while the oracle computes registers straight
# from the values (merge(max) == direct max, the mergeability identity).
# Register math is pure integer hash arithmetic and the harmonic sum is
# integer-scaled, so the whole estimator crosses engines exactly (the
# only floats: one division + the standard ln correction, rounded).
# ---------------------------------------------------------------------------
_HLL_B = 8
_HLL_M = 1 << _HLL_B
_HLL_W = 60 - _HLL_B
_HLL_SCALE = _HLL_W + 1
_HLL_SHARDS = 4


def _hll_numer() -> float:
    from .operators.sketch import hll_alpha

    return float(hll_alpha(_HLL_M)) * _HLL_M * _HLL_M * float(1 << _HLL_SCALE)


@query(
    "sketch_hll_distinct",
    oracle=None,  # assembled below (needs the computed alpha literal)
)
def sketch_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority distinct-customer estimates from merged HLL shards:
    (priority, empty_buckets, hll_estimate, n_exact). Registers build
    per (priority, orderkey%4) shard, MAX-merge across shards, estimate
    with the integer-scaled harmonic sum + linear-counting correction;
    ``n_exact`` pins the estimator against ground truth in the SAME
    gate (relative error ~1.04/sqrt(256) ≈ 6.5%). One groupBy on
    (group, bucket) — the value space never shuffles."""
    from .operators.sketch import hll_estimate, hll_merge, hll_registers

    orders = load_table(spark, sf_dir, "orders")
    src = orders.select(
        F.col("o_orderpriority").alias("priority"),
        F.pmod(F.col("o_orderkey"), F.lit(_HLL_SHARDS)).alias("shard"),
        "o_custkey",
    )
    shards = [
        hll_registers(
            src.filter(F.col("shard") == s), ["priority"], "o_custkey",
            b=_HLL_B,
        )
        for s in range(_HLL_SHARDS)
    ]
    merged = hll_merge(shards, ["priority"])
    est = hll_estimate(merged, ["priority"], b=_HLL_B)
    exact = src.groupBy("priority").agg(
        F.countDistinct("o_custkey").alias("n_exact")
    )
    return est.join(exact, on="priority").select(
        "priority", "empty_buckets", "hll_estimate", "n_exact"
    )


def _hll_oracle() -> str:
    h60 = "CAST('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15) AS BIGINT)"
    numer = repr(_hll_numer())
    return f"""
    WITH h AS (
      SELECT o_orderpriority AS priority, {h60} AS hv, o_custkey
      FROM orders
    ),
    r AS (
      SELECT priority, hv % {_HLL_M} AS bucket,
             MAX(CASE WHEN hv // {_HLL_M} = 0 THEN {_HLL_SCALE}
                      ELSE {_HLL_W} - length(bin(hv // {_HLL_M})) + 1
                 END) AS rho
      FROM h GROUP BY 1, 2
    ),
    agg AS (
      SELECT priority,
             CAST(SUM(CAST(1 AS BIGINT) << ({_HLL_SCALE} - rho)) AS BIGINT)
               AS s_present,
             CAST({_HLL_M} - COUNT(*) AS BIGINT) AS empty_buckets
      FROM r GROUP BY priority
    ),
    est AS (
      SELECT priority, empty_buckets,
             {numer} / CAST(s_present
                 + empty_buckets * (CAST(1 AS BIGINT) << {_HLL_SCALE})
               AS DOUBLE) AS raw
      FROM agg
    ),
    ex AS (
      SELECT o_orderpriority AS priority,
             CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_exact
      FROM orders GROUP BY 1
    )
    SELECT e.priority, e.empty_buckets,
           ROUND(CASE WHEN e.raw <= {2.5 * _HLL_M} AND e.empty_buckets > 0
                      THEN {float(_HLL_M)!r}
                           * ln({float(_HLL_M)!r} / CAST(e.empty_buckets AS DOUBLE))
                      ELSE e.raw END, 4) AS hll_estimate,
           ex.n_exact
    FROM est e JOIN ex ON ex.priority = e.priority
    """


_oracle_registry["sketch_hll_distinct"] = _hll_oracle()


# ---------------------------------------------------------------------------
# dedup_containment_capped — the df_cap backstop EXERCISED where it
# bites (r12 verdict ask #1 "with the cap active"): candidate generation
# drops shingles with df > cap from BOTH join sides (the hard fence for
# adversarial boilerplate), the verifier still intersects FULL sets, and
# the oracle mirrors the whole capped generation — rare-first prefix
# ranks, the cap, the prefix×postings join — in SQL, so a fence that
# silently widened or narrowed the candidate set breaks the hash. At the
# gate scales max df ≈ 25, so cap=12 genuinely drops the head (the
# uncapped sibling gate dedup_containment_pairs pins the lossless path).
# ---------------------------------------------------------------------------
_CONT_CAP_THRESHOLD = 0.6
_CONT_DF_CAP = 12


@query(
    "dedup_containment_capped",
    oracle=None,  # assembled below
)
def dedup_containment_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment ≥ {t} pairs under the df_cap={cap} candidate fence:
    (doc1, doc2, inter, n1, n2, containment_permille) where candidates
    may only arise from shingles with 2 ≤ df ≤ {cap} (hot head dropped,
    logged) but inter/|A|/|B| stay exact full-set values for every
    emitted pair — the documented accounting contract of
    operators/dedup.postings_candidates."""
    from .operators.dedup import (
        containment_pairs,
        doc_shingles,
        postings_candidates,
    )

    docs = load_table(spark, sf_dir, "documents")
    # checkpoint the shingle relation: it feeds ~6 consumers here (the
    # df_cap accounting count, dfreq, sizes, posts/prefix, the verifier
    # semi-join and its sizes) and re-running tokenize+shingle-window
    # per consumer dominated the gate (r13 interleaved A/B: 12.2 s ->
    # 9.6 s warm; identical 256-row output). At 100 TB this is the
    # materialize-shingles-once parquet/Delta stage the operator
    # docstrings prescribe.
    sh = doc_shingles(docs).localCheckpoint()
    cand = postings_candidates(
        sh, threshold=_CONT_CAP_THRESHOLD, df_cap=_CONT_DF_CAP
    )
    return containment_pairs(
        sh, candidates=cand, threshold=_CONT_CAP_THRESHOLD
    ).select("doc1", "doc2", "inter", "n1", "n2", "containment_permille")


def _containment_capped_oracle() -> str:
    from .queries_llm import _SHINGLES_CTE

    t = _CONT_CAP_THRESHOLD
    cap = _CONT_DF_CAP
    return f"""
    WITH {_SHINGLES_CTE.strip()},
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    dfreq AS (
      SELECT shingle, COUNT(*) AS df FROM sh GROUP BY shingle
      HAVING COUNT(*) >= 2 AND COUNT(*) <= {cap}
    ),
    posts AS (
      SELECT sh.doc_id, sh.shingle, d.df
      FROM sh JOIN dfreq d USING (shingle)
    ),
    pranked AS (
      SELECT doc_id, shingle,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY df ASC, shingle ASC) AS rk
      FROM posts
    ),
    prefix AS (
      SELECT p.doc_id, p.shingle
      FROM pranked p JOIN sizes s USING (doc_id)
      WHERE p.rk <= s.n - CEIL(CAST({t} AS DOUBLE) * s.n) + 1
    ),
    cand AS (
      SELECT DISTINCT LEAST(p.doc_id, f.doc_id) AS doc1,
             GREATEST(p.doc_id, f.doc_id) AS doc2
      FROM prefix p JOIN posts f USING (shingle)
      WHERE p.doc_id != f.doc_id
    ),
    co AS (
      SELECT a.doc_id AS doc1, b.doc_id AS doc2, COUNT(*) AS inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT co.doc1, co.doc2, CAST(co.inter AS BIGINT) AS inter,
           CAST(s1.n AS BIGINT) AS n1, CAST(s2.n AS BIGINT) AS n2,
           CAST(co.inter * 1000 // least(s1.n, s2.n) AS BIGINT)
             AS containment_permille
    FROM co
    JOIN cand ON cand.doc1 = co.doc1 AND cand.doc2 = co.doc2
    JOIN sizes s1 ON s1.doc_id = co.doc1
    JOIN sizes s2 ON s2.doc_id = co.doc2
    WHERE co.inter * 1000 >= {int(_CONT_CAP_THRESHOLD * 1000)} * least(s1.n, s2.n)
    """


_oracle_registry["dedup_containment_capped"] = _containment_capped_oracle()
