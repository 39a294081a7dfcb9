"""Round-8 query-surface additions: BM25 ranked lexical retrieval over
the corpus, reciprocal-rank hybrid fusion of the lexical and dense
(ANN) rankers, and variable-length duplicate-span coverage.

These complete the text-analysis tier (VERDICT r7 Next-round #4/#5):
the repo had postings, TF-IDF and ANN but no lexical *ranking*
function. Determinism follows the house rules in queries.py — each
BM25 per-term contribution is one composed double expression per side,
immediately fixed-pointed to BIGINT units (floor(x·10⁶ + 0.5)) so every
cross-row sum is integer-exact; ranking keys are integers or
bit-identical doubles with id tiebreaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries import query
from .queries_llm import _DOT_SQL, _NORM_SQL, _UNIT_SQL
from .sources.catalog import load_table

# the query workload and BM25 build CTEs live in the leaf fragments
# module (shared with queries_r9 without import cycles); re-exported
# here because tests and queries_r9 historically import them from r8
from .oracle_sql_fragments import (  # noqa: F401
    _BM25_BUILD_TEMPLATE,
    _BM25_QUERIES,
    _bm25_build_cte,
)




@query(
    "doc_bm25_topk",
    oracle=f"""
    WITH q AS (
      SELECT CAST(query_id AS BIGINT) AS query_id, term,
             CAST(-1 AS BIGINT) AS self_excl
      FROM (VALUES {", ".join(f"({q}, '{t}')" for q, t in _BM25_QUERIES)})
           AS v(query_id, term)
    ),
    {_bm25_build_cte()}
    SELECT query_id, doc_id,
           ROUND(CAST(score_units AS DOUBLE) / 1000000.0, 6) AS score, rank
    FROM (
      SELECT query_id, doc_id, score_units,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY score_units DESC, doc_id ASC) AS rank
      FROM scores
    ) WHERE rank <= 10
    """,
)
def doc_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval (Robertson–Spärck Jones k1/b form, Lucene
    non-negative idf) over the corpus for a fixed three-query workload —
    the lexical ranking counterpart to the ANN tiers and the standard
    contamination-check scorer.

    Plan (operators/retrieval.bm25_topk): tf/dl/df are map-side-combined
    aggregates; the query-term table broadcasts; candidates are bounded
    by the query terms' postings; the per-query top-k runs behind an
    8-bucket pre-cut window, so no task sorts a whole candidate list —
    the 100 TB-shaped plan even at fixture scale. Ranking compares the
    INTEGER fixed-point score, never a float."""
    from .operators.retrieval import bm25_topk

    docs = load_table(spark, sf_dir, "documents")
    qterms = spark.createDataFrame(_BM25_QUERIES, "query_id bigint, term string")
    return bm25_topk(docs, qterms, k=10, prefilter_buckets=8)


@query(
    "hybrid_rrf_topk",
    oracle=f"""
    WITH q AS (
      SELECT DISTINCT doc_id AS query_id, term,
             CAST(doc_id AS BIGINT) AS self_excl
      FROM (SELECT doc_id,
                   UNNEST(regexp_split_to_array({_NORM_SQL}, ' ')) AS term
            FROM documents WHERE doc_id < 5)
    ),
    {_bm25_build_cte()},
    lex AS (
      SELECT query_id, doc_id, lex_rank FROM (
        SELECT query_id, doc_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY score_units DESC, doc_id ASC)
                 AS lex_rank
        FROM scores
      ) WHERE lex_rank <= 50
    ),
    units AS (
      SELECT vec_id, {_UNIT_SQL.format(v='embedding')} AS unit FROM embeddings
    ),
    qv AS (SELECT vec_id AS query_id, unit AS qvec FROM units
           WHERE vec_id < 5),
    den AS (
      SELECT query_id, doc_id, dense_rank FROM (
        SELECT qv.query_id, c.vec_id AS doc_id,
               ROW_NUMBER() OVER (
                 PARTITION BY qv.query_id
                 ORDER BY round({_DOT_SQL.format(a='c.unit', b='qv.qvec')}, 6)
                            DESC,
                          c.vec_id ASC) AS dense_rank
        FROM units c, qv
        WHERE c.vec_id != qv.query_id
      ) WHERE dense_rank <= 50
    ),
    fused AS (
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
    SELECT query_id, doc_id, lex_rank, dense_rank, rrf_score, rank
    FROM (
      SELECT query_id, doc_id, lex_rank, dense_rank, rrf_score,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY rrf_score DESC, doc_id ASC) AS rank
      FROM fused
    ) WHERE rank <= 10
    """,
)
def hybrid_rrf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: reciprocal-rank fusion (Cormack et al. 2009,
    κ=60) of the BM25 lexical ranker and the exact-cosine dense ranker
    over the shared doc/vec id space, query-by-example with docs 0–4 as
    the queries (a document's own terms / its embedding are the query;
    the document itself is excluded from both rankings).

    Each ranker contributes its top-50; fusion, ranking and the output
    are all over O(queries·k) rows. Each RRF contribution is one IEEE
    division of exact integers and the fusion sums exactly two doubles,
    so the fused score is bit-identical across engines (operators/
    retrieval.rrf_fuse). Absent-from-one-ranker documents report rank 0
    (keeps the rank columns integral for the pandas canonicalizer)."""
    from .operators.retrieval import bm25_topk, doc_tokens, rrf_fuse
    from .operators.similarity import topk_blas

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    qterms = (
        doc_tokens(docs.filter(F.col("doc_id") < 5))
        .select(F.col("doc_id").alias("query_id"), "term")
        .distinct()
    )
    lex = bm25_topk(
        docs, qterms, k=50, prefilter_buckets=8, exclude_self=True
    )
    dense = topk_blas(emb, emb.filter(F.col("vec_id") < 5), k=50).select(
        "query_id", F.col("corpus_id").alias("doc_id"), "rank"
    )
    return rrf_fuse(lex, dense, k=10, rrf_k=60)


@query(
    "doc_bm25_contamination",
    oracle=f"""
    WITH q AS (
      SELECT DISTINCT doc_id AS query_id, term,
             CAST(-1 AS BIGINT) AS self_excl
      FROM (SELECT doc_id,
                   UNNEST(regexp_split_to_array({_NORM_SQL}, ' ')) AS term
            FROM documents WHERE doc_id % 200 = 0)
    ),
    {_bm25_build_cte("doc_id % 200 != 0")}
    SELECT query_id AS bench_doc, doc_id AS train_doc,
           ROUND(CAST(score_units AS DOUBLE) / 1000000.0, 6) AS score, rank
    FROM (
      SELECT query_id, doc_id, score_units,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY score_units DESC, doc_id ASC) AS rank
      FROM scores
    ) WHERE rank <= 5
    """,
)
def doc_bm25_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranked contamination check: for every benchmark document
    (doc_id % 200 = 0 — a thinner split than the overlap gates' % 50:
    this corpus's 31-term vocabulary makes EVERY doc a candidate for
    every query, so the per-benchmark-doc cost is a full-corpus score
    and the gate sizes the benchmark set accordingly), the top-5
    TRAINING documents by BM25 over the benchmark doc's terms — the
    ranked complement of the binary n-gram-overlap report
    (`decontaminate_overlap*`): overlap says WHETHER a train doc shares
    content, BM25 says WHICH train docs a reviewer should read first.
    Corpus statistics (tf/dl/df/N/avgdl) come from the TRAIN side only,
    so adding benchmark docs never shifts training-corpus scores.

    Same scale shape as doc_bm25_topk, with one caveat the ranker now
    carries a knob for: the query-term table here is corpus-DERIVED
    (the benchmark slice's vocabulary), not a handful of user queries —
    at a real benchmark-suite scale (10⁵–10⁶ bench docs) it outgrows the
    driver broadcast budget, and a deployment passes
    ``broadcast_queries=False`` so the tf⋈qterms / df joins shuffle on
    uniformly hashed term keys instead (output-identity pinned by
    tests/test_queries_r9.py). At this gate's bench-suite size the
    default broadcast is the right plan."""
    from .operators.retrieval import bm25_topk, doc_tokens

    docs = load_table(spark, sf_dir, "documents")
    bench_pred = F.col("doc_id") % 200 == 0
    qterms = (
        doc_tokens(docs.filter(bench_pred))
        .select(F.col("doc_id").alias("query_id"), "term")
        .distinct()
    )
    return bm25_topk(
        docs.filter(~bench_pred), qterms, k=5, prefilter_buckets=8
    ).select(
        F.col("query_id").alias("bench_doc"),
        F.col("doc_id").alias("train_doc"),
        "score",
        "rank",
    )


@query(
    "doc_ql_dirichlet_topk",
    oracle=f"""
    WITH q AS (
      SELECT CAST(query_id AS BIGINT) AS query_id, term
      FROM (VALUES {", ".join(f"({q}, '{t}')" for q, t in _BM25_QUERIES)})
           AS v(query_id, term)
    ),
    toks AS (
      SELECT doc_id, UNNEST(regexp_split_to_array({_NORM_SQL}, ' ')) AS term
      FROM documents
    ),
    tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
           FROM toks GROUP BY doc_id, term),
    dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
           FROM toks GROUP BY doc_id),
    stats AS (SELECT CAST(SUM(dl) AS BIGINT) AS total_tokens FROM dl),
    coll AS (SELECT term, CAST(SUM(tf) AS BIGINT) AS ctf FROM tf
             WHERE term IN (SELECT DISTINCT term FROM q) GROUP BY term),
    qconst AS (
      SELECT query_id, CAST(COUNT(*) AS BIGINT) AS nq,
             CAST(SUM(CAST(FLOOR(
               LN(100.0 * (CAST(c.ctf AS DOUBLE)
                           / CAST(s.total_tokens AS DOUBLE)))
               * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS a_units
      FROM q JOIN coll c USING (term) CROSS JOIN stats s
      GROUP BY query_id
    ),
    dlu AS (
      SELECT doc_id,
             CAST(FLOOR(LN(CAST(dl AS DOUBLE) + 100.0)
                        * 1000000.0 + 0.5) AS BIGINT) AS dlu
      FROM dl
    ),
    mtch AS (
      SELECT q.query_id, tf.doc_id,
             CAST(SUM(CAST(FLOOR(
               LN((CAST(tf.tf AS DOUBLE)
                   + 100.0 * (CAST(c.ctf AS DOUBLE)
                              / CAST(s.total_tokens AS DOUBLE)))
                  / (100.0 * (CAST(c.ctf AS DOUBLE)
                              / CAST(s.total_tokens AS DOUBLE))))
               * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS m_units
      FROM tf JOIN q USING (term) JOIN coll c USING (term)
      CROSS JOIN stats s
      GROUP BY q.query_id, tf.doc_id
    ),
    sc AS (
      SELECT m.query_id, m.doc_id,
             m.m_units + qc.a_units - qc.nq * d.dlu AS score_units
      FROM mtch m JOIN qconst qc USING (query_id) JOIN dlu d USING (doc_id)
    )
    SELECT query_id, doc_id,
           ROUND(CAST(score_units AS DOUBLE) / 1000000.0, 6) AS score, rank
    FROM (
      SELECT query_id, doc_id, score_units,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY score_units DESC, doc_id ASC) AS rank
      FROM sc
    ) WHERE rank <= 10
    """,
)
def doc_ql_dirichlet_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-likelihood retrieval with Dirichlet smoothing (Zhai &
    Lafferty, SIGIR'01) — the language-modeling ranker next to BM25,
    the second member of a real lexical-retrieval stack (their rank
    disagreements are exactly what RRF fusion exploits). μ=100, sized
    to the corpus's ~55-token documents.

    Every ln is one composed double expression per engine, immediately
    fixed-pointed to BIGINT units, so the three-part decomposition
    (match + per-query constant − |q|·length) sums exactly
    (operators/retrieval.ql_dirichlet_topk); ranking compares the
    integer unit sum. Scale shape identical to doc_bm25_topk."""
    from .operators.retrieval import ql_dirichlet_topk

    docs = load_table(spark, sf_dir, "documents")
    qterms = spark.createDataFrame(
        _BM25_QUERIES, "query_id bigint, term string"
    )
    return ql_dirichlet_topk(docs, qterms, k=10, mu=100.0, prefilter_buckets=8)


@query(
    "hybrid_rrf3_topk",
    oracle=f"""
    WITH q AS (
      SELECT DISTINCT doc_id AS query_id, term,
             CAST(doc_id AS BIGINT) AS self_excl
      FROM (SELECT doc_id,
                   UNNEST(regexp_split_to_array({_NORM_SQL}, ' ')) AS term
            FROM documents WHERE doc_id < 5)
    ),
    {_bm25_build_cte()},
    lex AS (
      SELECT query_id, doc_id, bm25_rank FROM (
        SELECT query_id, doc_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY score_units DESC, doc_id ASC)
                 AS bm25_rank
        FROM scores
      ) WHERE bm25_rank <= 50
    ),
    coll AS (SELECT term, CAST(SUM(tf) AS BIGINT) AS ctf FROM tf
             WHERE term IN (SELECT DISTINCT term FROM q) GROUP BY term),
    qconst AS (
      SELECT query_id, CAST(COUNT(*) AS BIGINT) AS nq,
             CAST(SUM(CAST(FLOOR(
               LN(100.0 * (CAST(c.ctf AS DOUBLE)
                           / CAST(s.total_tokens AS DOUBLE)))
               * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS a_units
      FROM q JOIN coll c USING (term) CROSS JOIN stats s
      GROUP BY query_id
    ),
    dlu AS (
      SELECT doc_id,
             CAST(FLOOR(LN(CAST(dl AS DOUBLE) + 100.0)
                        * 1000000.0 + 0.5) AS BIGINT) AS dlu
      FROM dl
    ),
    mtch AS (
      SELECT q.query_id, tf.doc_id,
             CAST(SUM(CAST(FLOOR(
               LN((CAST(tf.tf AS DOUBLE)
                   + 100.0 * (CAST(c.ctf AS DOUBLE)
                              / CAST(s.total_tokens AS DOUBLE)))
                  / (100.0 * (CAST(c.ctf AS DOUBLE)
                              / CAST(s.total_tokens AS DOUBLE))))
               * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS m_units
      FROM tf JOIN q USING (term) JOIN coll c USING (term)
      CROSS JOIN stats s
      WHERE tf.doc_id != q.self_excl
      GROUP BY q.query_id, tf.doc_id
    ),
    qsc AS (
      SELECT m.query_id, m.doc_id,
             m.m_units + qc.a_units - qc.nq * d.dlu AS ql_units
      FROM mtch m JOIN qconst qc USING (query_id) JOIN dlu d USING (doc_id)
    ),
    qlr AS (
      SELECT query_id, doc_id, ql_rank FROM (
        SELECT query_id, doc_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY ql_units DESC, doc_id ASC)
                 AS ql_rank
        FROM qsc
      ) WHERE ql_rank <= 50
    ),
    units AS (
      SELECT vec_id, {_UNIT_SQL.format(v='embedding')} AS unit FROM embeddings
    ),
    qv AS (SELECT vec_id AS query_id, unit AS qvec FROM units
           WHERE vec_id < 5),
    den AS (
      SELECT query_id, doc_id, dense_rank FROM (
        SELECT qv.query_id, c.vec_id AS doc_id,
               ROW_NUMBER() OVER (
                 PARTITION BY qv.query_id
                 ORDER BY round({_DOT_SQL.format(a='c.unit', b='qv.qvec')}, 6)
                            DESC,
                          c.vec_id ASC) AS dense_rank
        FROM units c, qv
        WHERE c.vec_id != qv.query_id
      ) WHERE dense_rank <= 50
    ),
    p2 AS (
      SELECT COALESCE(l.query_id, m.query_id) AS query_id,
             COALESCE(l.doc_id, m.doc_id) AS doc_id,
             l.bm25_rank, m.ql_rank
      FROM lex l FULL OUTER JOIN qlr m
        ON l.query_id = m.query_id AND l.doc_id = m.doc_id
    ),
    f3 AS (
      SELECT COALESCE(p.query_id, d.query_id) AS query_id,
             COALESCE(p.doc_id, d.doc_id) AS doc_id,
             CAST(COALESCE(p.bm25_rank, 0) AS BIGINT) AS bm25_rank,
             CAST(COALESCE(p.ql_rank, 0) AS BIGINT) AS ql_rank,
             CAST(COALESCE(d.dense_rank, 0) AS BIGINT) AS dense_rank,
             COALESCE(CAST(1000000000000 AS BIGINT)
                      // CAST(60 + p.bm25_rank AS BIGINT), 0)
             + COALESCE(CAST(1000000000000 AS BIGINT)
                        // CAST(60 + p.ql_rank AS BIGINT), 0)
             + COALESCE(CAST(1000000000000 AS BIGINT)
                        // CAST(60 + d.dense_rank AS BIGINT), 0)
               AS rrf_units
      FROM p2 p FULL OUTER JOIN den d
        ON p.query_id = d.query_id AND p.doc_id = d.doc_id
    )
    SELECT query_id, doc_id, bm25_rank, ql_rank, dense_rank,
           ROUND(CAST(rrf_units AS DOUBLE) / 1000000000000.0, 9)
             AS rrf_score,
           rank
    FROM (
      SELECT query_id, doc_id, bm25_rank, ql_rank, dense_rank, rrf_units,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY rrf_units DESC, doc_id ASC) AS rank
      FROM f3
    ) WHERE rank <= 10
    """,
)
def hybrid_rrf3_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-ranker hybrid retrieval: BM25, query-likelihood (Dirichlet)
    and exact dense cosine fused with integer fixed-point RRF
    (operators/retrieval.rrf_fuse_n) — beyond two rankers the pairwise
    IEEE-commutativity argument of rrf_fuse no longer covers the sum, so
    each contribution is ``10¹² div (60 + rank)`` and the fusion is pure
    integer arithmetic, exact on both engines at any ranker count.

    Query-by-example with docs 0–4, each ranker contributing its top-50;
    everything after the rankers is O(queries·k). The tf/dl term
    statistics — the shared index-build half of both lexical rankers —
    are computed ONCE and localCheckpointed, so the tokenize+aggregate
    corpus scans are paid once, not per ranker (values identical; the
    oracle's CTEs are shared the same way)."""
    from .operators.retrieval import (
        bm25_topk,
        doc_tokens,
        ql_dirichlet_topk,
        rrf_fuse_n,
        term_stats,
    )
    from .operators.similarity import topk_blas

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    qterms = (
        doc_tokens(docs.filter(F.col("doc_id") < 5))
        .select(F.col("doc_id").alias("query_id"), "term")
        .distinct()
    )
    from .operators.retrieval import dl_from_tf

    tf, _ = term_stats(docs)
    # dl from the CHECKPOINTED tf: re-checkpointing the original dl plan
    # would tokenize+explode the corpus a second time
    tf = tf.localCheckpoint()
    shared = (tf, dl_from_tf(tf).localCheckpoint())
    lex = bm25_topk(
        docs, qterms, k=50, prefilter_buckets=8, exclude_self=True,
        stats=shared,
    ).select("query_id", "doc_id", "rank")
    qlr = ql_dirichlet_topk(
        docs, qterms, k=50, mu=100.0, prefilter_buckets=8, exclude_self=True,
        stats=shared,
    ).select("query_id", "doc_id", "rank")
    den = topk_blas(emb, emb.filter(F.col("vec_id") < 5), k=50).select(
        "query_id", F.col("corpus_id").alias("doc_id"), "rank"
    )
    return rrf_fuse_n(
        [("bm25", lex), ("ql", qlr), ("dense", den)], k=10, rrf_k=60
    )


#: integer-PageRank unit for the GLOBAL co-purchase gates: the overflow
#: guard's worst-case bound is damping_num·n_nodes·unit < 2⁶³, which at
#: the operator default 10¹² trips once the part graph passes ~1.08e5
#: nodes (TPC-H sf ≈ 0.55) — 10⁹ keeps the guard green to ~10⁸ nodes
#: (sf ≈ 500) with quantization still far below rank decisions
#: (ADVICE r9, medium). The personalized gate keeps 10¹² because its
#: mass support is the seed set, not the graph.
_PR_GATE_UNIT = 10**9


def _copurchase_halfw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The a<b half of the part co-purchase edge list with shared-order
    weights, localCheckpointed per call. Each order contributes each of
    its distinct part pairs exactly once (collect_set dedupes, the
    sorted-array transform emits each a<b pair once), so COUNT(*) IS
    the shared-order weight, and the distinct pair set for the
    unweighted gates is a plain projection.

    Rebuilt on every invocation: a process-level memo keyed on the data
    path would survive the bench's clearCache() between timed runs and
    make min-of-N report a memo-warm number (r13 verdict). For real
    deployments the edge list is an offline parquet artifact passed to
    the pagerank operators explicitly."""
    li = load_table(spark, sf_dir, "lineitem")
    # ONE orderkey shuffle instead of the r8-r13 distinct + self-join
    # (which exchanged the (order, part) relation twice and joined):
    # collect_set dedupes parts within the order, array_sort + the
    # slice(i+2) transform emits exactly the a<b pairs in-array — the
    # fanout is bounded by order size (~4 parts), so the generated-pair
    # explode is skew-free (guide §2.3 shuffle-fewer-bytes / §2.4).
    # Output identical to the self-join form (asserted in the r14
    # interleaved A/B at sf0.1: 1,196,000 identical weighted pairs;
    # wall is a wash at gate scale — the win is the removed second
    # exchange+join of the fact-projection, which is what scales).
    return (
        li.groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("ps"))
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ps, (x, i) -> "
                    "transform(slice(ps, i + 2, size(ps)), "
                    "y -> struct(x AS src, y AS dst))))"
                )
            ).alias("p")
        )
        .groupBy(F.col("p.src").alias("src"), F.col("p.dst").alias("dst"))
        .agg(F.count(F.lit(1)).alias("w"))
        # cut lineage before the symmetric union — its two branches
        # would otherwise each re-run the edge aggregate (the CC
        # edge-list rule)
        .localCheckpoint()
    )


def _pr_iter_sql(prev: str, name: str, unit: int = _PR_GATE_UNIT) -> str:
    """One unrolled integer-PageRank iteration as a CTE (teleport
    = (100−85)·unit // 100; all arithmetic integer)."""
    teleport = (100 - 85) * unit // 100
    return f"""
    {name} AS (
      SELECT n.node,
             CAST(CAST({teleport} AS BIGINT)
                  + (85 * COALESCE(CAST(SUM(r.pr_units // dg.deg) AS BIGINT),
                                   0)) // 100
                  AS BIGINT) AS pr_units
      FROM nodes n
      LEFT JOIN e ON e.d = n.node
      LEFT JOIN {prev} r ON r.node = e.s
      LEFT JOIN deg dg ON dg.s = e.s
      GROUP BY n.node
    )"""


@query(
    "part_copurchase_pagerank",
    oracle=f"""
    WITH ps AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    half AS (SELECT DISTINCT a.l_partkey AS s, b.l_partkey AS d
             FROM ps a JOIN ps b
               ON a.l_orderkey = b.l_orderkey
              AND a.l_partkey < b.l_partkey),
    e AS (SELECT s, d FROM half UNION ALL SELECT d AS s, s AS d FROM half),
    nodes AS (SELECT DISTINCT s AS node FROM e
              UNION SELECT DISTINCT d FROM e),
    deg AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY s),
    r0 AS (SELECT node, CAST({_PR_GATE_UNIT} AS BIGINT) AS pr_units
           FROM nodes),
    {_pr_iter_sql('r0', 'it1')},
    {_pr_iter_sql('it1', 'it2')},
    {_pr_iter_sql('it2', 'it3')}
    SELECT node AS part_key, pr_units,
           ROUND(CAST(pr_units AS DOUBLE) / {_PR_GATE_UNIT}.0, 6) AS pr,
           rank
    FROM (
      SELECT node, pr_units,
             ROW_NUMBER() OVER (ORDER BY pr_units DESC, node ASC) AS rank
      FROM it3
    ) WHERE rank <= 100
    """,
)
def part_copurchase_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank centrality over the part co-purchase graph (parts
    co-occurring in an order, both directions) — the iterative
    value-propagation family next to the MapReduce connected components:
    'frequently bought together' popularity as a ranking signal, the
    same shape a data pipeline uses for domain/link authority.

    Integer fixed-point form (operators/graph.pagerank_units): three
    unrolled iterations of r' = T + (85·Σ r div deg) div 100 over
    BIGINT units — no float crosses an aggregation boundary, so the
    DuckDB oracle replays the exact same integers. Edge build groups
    lineitem by order and emits the a<b part pairs in-array — fanout
    bounded by order size (~4 items), scale-safe — checkpointed per call
    (:func:`_copurchase_halfw`; r14 removed the cross-call memo and the
    self-join). ``unit`` is sized to the graph
    (_PR_GATE_UNIT = 10⁹) so the operator's default-on int64 overflow
    guard holds to ~10⁸ nodes instead of tripping at TPC-H sf ≈ 0.55
    (ADVICE r9). The top-100 head runs behind an 8-bucket pre-cut, so
    the global window sees ≤ 800 rows."""
    from .operators.graph import pagerank_units

    # the co-purchase relation is symmetric: build only the a<b half
    # (halves the join output and the distinct shuffle) and mirror it —
    # the two direction sets are disjoint, so no second dedup is needed
    half = _copurchase_halfw(spark, sf_dir).select("src", "dst")
    edges = half.unionByName(
        half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    pr = pagerank_units(
        edges, iters=3, checkpoint_edges=False, symmetric=True,
        unit=_PR_GATE_UNIT,
    )
    wb = Window.partitionBy(
        F.pmod(F.xxhash64(F.col("node")), F.lit(8))
    ).orderBy(F.col("pr_units").desc(), F.col("node").asc())
    pre = pr.withColumn("_brn", F.row_number().over(wb)).filter(
        F.col("_brn") <= 100
    )
    w = Window.orderBy(F.col("pr_units").desc(), F.col("node").asc())
    return (
        pre.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 100)
        .select(
            F.col("node").alias("part_key"),
            "pr_units",
            F.round(
                F.col("pr_units").cast("double")
                / F.lit(float(_PR_GATE_UNIT)),
                6,
            ).alias("pr"),
            "rank",
        )
    )


def _span_tier_sql(k: int, min_docs: int) -> str:
    """Covered word positions (doc_id, wi) for one (k, min_docs) gram
    tier — the parameterized form of queries_ext2._SPAN_COV_CTES."""
    return f"""
      SELECT g.doc_id, unnest(range(g.pos, g.pos + {k})) AS wi
      FROM (
        SELECT doc_id, generate_subscripts(grams, 1) - 1 AS pos,
               unnest(grams) AS gram
        FROM (
          SELECT doc_id,
                 [array_to_string(words[i:i+{k - 1}], ' ')
                  FOR i IN range(1, n_words - {k - 2})] AS grams
          FROM spl WHERE n_words >= {k}
        )
      ) g
      JOIN (
        SELECT gram FROM (
          SELECT doc_id, unnest(grams) AS gram
          FROM (
            SELECT doc_id,
                   [array_to_string(words[i:i+{k - 1}], ' ')
                    FOR i IN range(1, n_words - {k - 2})] AS grams
            FROM spl WHERE n_words >= {k}
          )
        ) GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= {min_docs}
      ) dup USING (gram)
    """


@query(
    "doc_duplicate_span_merge",
    oracle=f"""
    WITH spl AS (
      SELECT doc_id, string_split(text, ' ') AS words,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words
      FROM documents
    ),
    cov AS (
      SELECT DISTINCT doc_id, wi FROM (
        {_span_tier_sql(25, 3)}
        UNION ALL
        {_span_tier_sql(50, 2)}
      )
    ),
    isl AS (
      SELECT doc_id,
             wi - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY wi) AS isl
      FROM cov
    ),
    spans AS (
      SELECT doc_id, isl, CAST(COUNT(*) AS BIGINT) AS span_len
      FROM isl GROUP BY doc_id, isl
    ),
    per AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
             CAST(SUM(span_len) AS BIGINT) AS n_covered,
             CAST(MAX(span_len) AS BIGINT) AS max_span_len
      FROM spans GROUP BY doc_id
    )
    SELECT spl.doc_id, spl.n_words,
           COALESCE(per.n_covered, 0) AS n_covered,
           COALESCE(per.n_spans, 0) AS n_spans,
           COALESCE(per.max_span_len, 0) AS max_span_len,
           ROUND(CAST(COALESCE(per.n_covered, 0) AS DOUBLE)
                 / CAST(spl.n_words AS DOUBLE), 6) AS coverage
    FROM spl LEFT JOIN per USING (doc_id)
    """,
)
def doc_duplicate_span_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variable-length duplicate-span coverage (VERDICT r7 #5): overlap
    hits from two (k, min_docs) gram tiers — 25-grams at df≥3 and
    50-grams at df≥2, the length/frequency tradeoff of practical span
    dedup — merged into MAXIMAL per-doc spans via the gaps-and-islands
    identity (wi − row_number constant on a maximal run; equivalent to
    an array interval merge, zero per-doc arrays). Reports span count,
    total covered positions, longest span and coverage fraction per doc.

    Every shuffle key is a uniform hash (gram text, doc id); the only
    window partitions by doc id with state bounded by document length —
    scale-safe at any corpus size (operators/corpus.merged_span_report)."""
    from .operators.corpus import merged_span_report

    docs = load_table(spark, sf_dir, "documents")
    return merged_span_report(docs, tiers=((25, 3), (50, 2)))
