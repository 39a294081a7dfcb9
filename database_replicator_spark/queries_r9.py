"""Round-9 query-surface additions: the graph tier grows personalized,
weighted, and hubs-vs-authorities centrality (PPR over a query-result
seed set, shared-order-weighted PageRank, integer HITS), and the
retrieval tier completes the classic-ranker family (Salton TF-IDF
cosine, Jelinek-Mercer query likelihood) plus weighted RRF fusion.

Determinism follows the house rules (queries.py): one composed double
expression per side fixed-pointed to BIGINT units before ANY cross-row
sum; rankings order by integers (or one identical double composition of
exact integers) with id tiebreaks. Reference provenance: the reference
engine has no graph/retrieval surface — these are the LLM-pipeline
additions the build mandate grades as first-class; algorithms are the
published ones (Haveliwala 2002 personalized PR; Kleinberg 1999 HITS;
Salton & Buckley 1988 tf·idf/cosine; Zhai & Lafferty 2001 JM smoothing;
Cormack et al. 2009 RRF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .oracle_sql_fragments import (
    _BM25_QUERIES,
    _bm25_build_cte,
    _bm25_score_ctes,
)
from .queries import query
from .sources.catalog import load_table

#: seed predicate for the personalized-PageRank gate: one part brand —
#: a genuine query-result seed set (exercises the seeds-DataFrame form)
_PPR_BRAND = "Brand#11"

#: shared graph-build CTEs for the co-purchase oracles (the same build
#: as queries_r8.part_copurchase_pagerank, plus an edge weight = number
#: of shared orders for the weighted variant)
_COPURCHASE_CTES = """
    ps AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    halfw AS (SELECT a.l_partkey AS s, b.l_partkey AS d,
                     CAST(COUNT(*) AS BIGINT) AS w
              FROM ps a JOIN ps b
                ON a.l_orderkey = b.l_orderkey
               AND a.l_partkey < b.l_partkey
              GROUP BY a.l_partkey, b.l_partkey),
    e AS (SELECT s, d, w FROM halfw
          UNION ALL SELECT d AS s, s AS d, w FROM halfw),
    deg AS (SELECT s, CAST(SUM(w) AS BIGINT) AS wdeg,
                   CAST(COUNT(*) AS BIGINT) AS deg
            FROM e GROUP BY s)
"""


def _ppr_iter_sql(prev: str, name: str) -> str:
    """One unrolled personalized-PageRank iteration: teleport mass goes
    to seed nodes only (isseed carried on the node relation); the
    propagation term is the same unweighted integer split as
    queries_r8._pr_iter_sql."""
    return f"""
    {name} AS (
      SELECT n.node, n.isseed,
             CAST(n.isseed * CAST(150000000000 AS BIGINT)
                  + (85 * COALESCE(CAST(SUM(r.pr_units // dg.deg) AS BIGINT),
                                   0)) // 100
                  AS BIGINT) AS pr_units
      FROM nodes n
      LEFT JOIN e ON e.d = n.node
      LEFT JOIN {prev} r ON r.node = e.s
      LEFT JOIN deg dg ON dg.s = e.s
      GROUP BY n.node, n.isseed
    )"""


def _wpr_iter_sql(prev: str, name: str, unit: int = 10**9) -> str:
    """One unrolled WEIGHTED-PageRank iteration: mass splits
    proportionally to edge weight, (r·w) // Σw — integer multiply before
    the floor division, mirroring operators/graph.pagerank_units'
    weight_col form. ``unit`` defaults to the global-gate unit
    (queries_r8._PR_GATE_UNIT = 10⁹): global mass support means the
    overflow bound scales with the whole node set (ADVICE r9)."""
    teleport = (100 - 85) * unit // 100
    return f"""
    {name} AS (
      SELECT n.node,
             CAST(CAST({teleport} AS BIGINT)
                  + (85 * COALESCE(
                        CAST(SUM((r.pr_units * e.w) // dg.wdeg) AS BIGINT),
                        0)) // 100
                  AS BIGINT) AS pr_units
      FROM nodes n
      LEFT JOIN e ON e.d = n.node
      LEFT JOIN {prev} r ON r.node = e.s
      LEFT JOIN deg dg ON dg.s = e.s
      GROUP BY n.node
    )"""


@query(
    "part_copurchase_ppr",
    oracle=f"""
    WITH {_COPURCHASE_CTES},
    seeds AS (SELECT p_partkey AS node FROM part
              WHERE p_brand = '{_PPR_BRAND}'),
    nodes AS (SELECT dg.s AS node,
                     CASE WHEN sd.node IS NOT NULL THEN 1 ELSE 0 END
                       AS isseed
              FROM deg dg LEFT JOIN seeds sd ON sd.node = dg.s),
    r0 AS (SELECT node, isseed,
                  CAST(isseed * CAST(1000000000000 AS BIGINT) AS BIGINT)
                    AS pr_units
           FROM nodes),
    {_ppr_iter_sql('r0', 'it1')},
    {_ppr_iter_sql('it1', 'it2')},
    {_ppr_iter_sql('it2', 'it3')}
    SELECT node AS part_key, pr_units,
           ROUND(CAST(pr_units AS DOUBLE) / 1000000000000.0, 6) AS pr,
           rank
    FROM (
      SELECT node, pr_units,
             ROW_NUMBER() OVER (ORDER BY pr_units DESC, node ASC) AS rank
      FROM it3
    ) WHERE rank <= 100
    """,
)
def part_copurchase_ppr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank over the part co-purchase graph, seeded by
    one brand's parts — 'more items like these': rank measures random-
    walk proximity to the seed set (Haveliwala 2002), the serving form
    behind recommendation and crawl-frontier prioritization.

    Exercises the operator's seeds-DATAFRAME form (r9): the seed set is
    itself a query result (a part-table filter), attached as a
    distinct+left-join flag — the path a deployment takes when seeds are
    fact-table-sized and a driver-side isin list would not fit. Teleport
    AND init mass go to seeds only; all arithmetic stays the integer
    fixed-point recurrence the oracle unrolls (seed-conditional teleport
    via an isseed flag on the node relation). The default unit 10¹²
    stays: the overflow bound scales with the SEED-set mass support
    (|brand parts| ≈ n_parts/25), not the graph, so the guard holds to
    sf ≈ 25 here without the global gates' lowered unit. Edge build via
    queries_r8._copurchase_halfw (checkpointed per call; r14 removed
    the cross-call memo)."""
    from .operators.graph import pagerank_units
    from .queries_r8 import _copurchase_halfw

    part = load_table(spark, sf_dir, "part")
    half = _copurchase_halfw(spark, sf_dir).select("src", "dst")
    edges = half.unionByName(
        half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    seeds = part.filter(F.col("p_brand") == _PPR_BRAND).select(
        F.col("p_partkey")
    )
    pr = pagerank_units(
        edges, iters=3, checkpoint_edges=False, symmetric=True, seeds=seeds
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
                F.col("pr_units").cast("double") / F.lit(1e12), 6
            ).alias("pr"),
            "rank",
        )
    )


@query(
    "part_copurchase_pagerank_weighted",
    oracle=f"""
    WITH {_COPURCHASE_CTES},
    nodes AS (SELECT s AS node FROM deg),
    r0 AS (SELECT node, CAST(1000000000 AS BIGINT) AS pr_units
           FROM nodes),
    {_wpr_iter_sql('r0', 'it1')},
    {_wpr_iter_sql('it1', 'it2')},
    {_wpr_iter_sql('it2', 'it3')}
    SELECT node AS part_key, pr_units,
           ROUND(CAST(pr_units AS DOUBLE) / 1000000000.0, 6) AS pr,
           rank
    FROM (
      SELECT node, pr_units,
             ROW_NUMBER() OVER (ORDER BY pr_units DESC, node ASC) AS rank
      FROM it3
    ) WHERE rank <= 100
    """,
)
def part_copurchase_pagerank_weighted(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Weighted PageRank over the co-purchase graph: edge weight = the
    number of orders the two parts co-occur in, so a random step follows
    STRONG associations proportionally more often — the weighted variant
    every production link/co-occurrence ranker runs (one shared order is
    noise; twelve is a signal).

    Integer contract extends cleanly: mass out of u splits as
    (r(u)·w_e) div Σw — multiply before the floor division (the oracle
    replays the identical expression). Weights are shared-order counts
    (single digits here); ``unit`` is the global-gate 10⁹
    (queries_r8._PR_GATE_UNIT) so the operator's worst-case overflow
    bound max(85, w_max)·n·unit holds to ~10⁸ nodes instead of tripping
    at sf ≈ 0.55 (ADVICE r9). Because the pair relation is already
    distinct per (order, pair), the weight aggregate is a plain count
    on the shared edge build (queries_r8._copurchase_halfw, rebuilt
    per call since r14) — no extra shuffle vs the unweighted gate."""
    from .operators.graph import pagerank_units
    from .queries_r8 import _PR_GATE_UNIT, _copurchase_halfw

    halfw = _copurchase_halfw(spark, sf_dir)
    edges = halfw.unionByName(
        halfw.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
        )
    )
    pr = pagerank_units(
        edges, iters=3, checkpoint_edges=False, symmetric=True,
        weight_col="w", unit=_PR_GATE_UNIT,
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
                F.col("pr_units").cast("double") / F.lit(1e9), 6
            ).alias("pr"),
            "rank",
        )
    )


@query(
    "supplier_customer_hits",
    oracle="""
    WITH e AS (
      SELECT DISTINCT o.o_custkey AS s, l.l_suppkey AS d
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ),
    a1 AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS a FROM e GROUP BY d),
    h1 AS (SELECT e.s, CAST(SUM(a1.a) AS BIGINT) AS h
           FROM e JOIN a1 ON a1.d = e.d GROUP BY e.s),
    a2 AS (SELECT e.d, CAST(SUM(h1.h) AS BIGINT) AS a
           FROM e JOIN h1 ON h1.s = e.s GROUP BY e.d),
    h2 AS (SELECT e.s, CAST(SUM(a2.a) AS BIGINT) AS h
           FROM e JOIN a2 ON a2.d = e.d GROUP BY e.s),
    tops AS (
      SELECT 'authority' AS role, d AS node, a AS units,
             ROW_NUMBER() OVER (ORDER BY a DESC, d ASC) AS rank
      FROM a2
      UNION ALL
      SELECT 'hub' AS role, s AS node, h AS units,
             ROW_NUMBER() OVER (ORDER BY h DESC, s ASC) AS rank
      FROM h2
    )
    SELECT role, node, units, rank FROM tops WHERE rank <= 20
    """,
)
def supplier_customer_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs and authorities (Kleinberg 1999) over the bipartite
    customer→supplier purchase graph: authoritative suppliers are those
    bought from by strong hub customers, hub customers those buying from
    authoritative suppliers — the mutually-recursive centrality pair,
    two iterations unrolled.

    Integer contract: the UNNORMALIZED power iteration (a ← Aᵀh,
    h ← A·a from all-ones) — per-iteration L2 normalization only
    rescales, so the fixed-iteration RANKING is identical without it and
    every update stays a pure BIGINT sum the oracle replays as two joins
    + two aggregates. Output: top-20 per role (role, node, units, rank).

    Scale: each half-step is one edge⋈value join + one keyed aggregate —
    Pregel-shaped like pagerank_units; values grow ≤ max_deg² per
    iteration, bounding int64 to ~3–4 iterations (the ranking
    convergence regime; see operators/graph.hits_units)."""
    from .operators.graph import hits_units

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    edges = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select(
            F.col("o_custkey").alias("src"), F.col("l_suppkey").alias("dst")
        )
        .distinct()
    )
    hubs, auths = hits_units(edges, iters=2)
    wa = Window.orderBy(F.col("auth_units").desc(), F.col("node").asc())
    wh = Window.orderBy(F.col("hub_units").desc(), F.col("node").asc())
    top_a = (
        auths.withColumn("rank", F.row_number().over(wa))
        .filter(F.col("rank") <= 20)
        .select(
            F.lit("authority").alias("role"),
            "node",
            F.col("auth_units").alias("units"),
            "rank",
        )
    )
    top_h = (
        hubs.withColumn("rank", F.row_number().over(wh))
        .filter(F.col("rank") <= 20)
        .select(
            F.lit("hub").alias("role"),
            "node",
            F.col("hub_units").alias("units"),
            "rank",
        )
    )
    return top_a.unionByName(top_h)


#: TF-IDF oracle CTEs: full-vocabulary df (every doc term feeds the
#: norm), per-(doc, term) weight fixed-pointed at 10³ (the scale cancels
#: in the cosine ratio), integer norms and match sums. The HAVING > 0
#: guards mirror the engine's zero-norm drops (retrieval.py dn2/qn2
#: filters): an all-universal-term doc or query has norm 0, and without
#: the guard the oracle would emit NaN-scored rows the engine never
#: produces (ADVICE r9).
_TFIDF_CTES = """
    dfall AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df
              FROM tf GROUP BY term),
    wts AS (
      SELECT tf.doc_id, tf.term,
             CAST(FLOOR(CAST(tf.tf AS DOUBLE)
                        * LN(CAST(s.n_docs AS DOUBLE)
                             / CAST(d.df AS DOUBLE))
                        * 1000.0 + 0.5) AS BIGINT) AS wu
      FROM tf JOIN dfall d ON d.term = tf.term CROSS JOIN stats s
    ),
    dnorm AS (SELECT doc_id, CAST(SUM(wu * wu) AS BIGINT) AS dn2
              FROM wts GROUP BY doc_id
              HAVING CAST(SUM(wu * wu) AS BIGINT) > 0),
    qw AS (
      SELECT q.query_id, q.term,
             CAST(FLOOR(LN(CAST(s.n_docs AS DOUBLE)
                           / CAST(d.df AS DOUBLE))
                        * 1000.0 + 0.5) AS BIGINT) AS qu
      FROM q JOIN dfall d ON d.term = q.term CROSS JOIN stats s
    ),
    qnorm AS (SELECT query_id, CAST(SUM(qu * qu) AS BIGINT) AS qn2
              FROM qw GROUP BY query_id
              HAVING CAST(SUM(qu * qu) AS BIGINT) > 0),
    matches AS (
      SELECT w.query_id, t.doc_id, CAST(SUM(t.wu * w.qu) AS BIGINT)
               AS match_units
      FROM wts t JOIN qw w ON w.term = t.term
      GROUP BY w.query_id, t.doc_id
    ),
    cscored AS (
      SELECT m.query_id, m.doc_id,
             ROUND(CAST(m.match_units AS DOUBLE)
                   / (SQRT(CAST(dn.dn2 AS DOUBLE))
                      * SQRT(CAST(qn.qn2 AS DOUBLE))), 6) AS score
      FROM matches m
      JOIN dnorm dn ON dn.doc_id = m.doc_id
      JOIN qnorm qn ON qn.query_id = m.query_id
    )
"""


@query(
    "doc_tfidf_cosine_topk",
    oracle=f"""
    WITH q AS (
      SELECT CAST(query_id AS BIGINT) AS query_id, term,
             CAST(-1 AS BIGINT) AS self_excl
      FROM (VALUES {", ".join(f"({q}, '{t}')" for q, t in _BM25_QUERIES)})
           AS v(query_id, term)
    ),
    {_bm25_build_cte()},
    {_TFIDF_CTES}
    SELECT query_id, doc_id, score, rank FROM (
      SELECT query_id, doc_id, score,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY score DESC, doc_id ASC) AS rank
      FROM cscored
    ) WHERE rank <= 10
    """,
)
def doc_tfidf_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic vector-space retrieval (Salton tf·idf, full cosine
    normalization) over the documents table — the third lexical ranker
    next to BM25 and query likelihood, and the one whose DOCUMENT norm
    touches every term (not just query matches): its oracle proves the
    full-vocabulary index build agrees cross-engine, not only the
    postings-bounded slice.

    Fixed-point contract: weights quantized at 10³ (the scale cancels in
    the cosine ratio; 10⁶ would square past int64 on long docs —
    operators/retrieval.TFIDF_W_SCALE states the bound), match and both
    norms are integer sums, and the final score is one identical
    three-integer double composition per side."""
    from .operators.retrieval import tfidf_cosine_topk

    docs = load_table(spark, sf_dir, "documents")
    qterms = spark.createDataFrame(
        _BM25_QUERIES, "query_id long, term string"
    )
    return tfidf_cosine_topk(docs, qterms, k=10, prefilter_buckets=8)


#: JM oracle contribution CTEs at λ=0.5 (literals 0.5 exact in binary)
_JM_CTES = """
    coll AS (SELECT term, CAST(SUM(tf) AS BIGINT) AS ctf FROM tf
             WHERE term IN (SELECT DISTINCT term FROM q) GROUP BY term),
    qconst AS (
      SELECT q.query_id,
             CAST(SUM(CAST(FLOOR(
               LN(0.5 * (CAST(c.ctf AS DOUBLE)
                         / CAST(s.total_tokens AS DOUBLE)))
               * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS a_units
      FROM q JOIN coll c ON c.term = q.term CROSS JOIN stats s
      GROUP BY q.query_id
    ),
    jmatch AS (
      SELECT q.query_id, tf.doc_id,
             CAST(SUM(CAST(FLOOR(
               LN((0.5 * (CAST(tf.tf AS DOUBLE) / CAST(dl.dl AS DOUBLE))
                   + 0.5 * (CAST(c.ctf AS DOUBLE)
                            / CAST(s.total_tokens AS DOUBLE)))
                  / (0.5 * (CAST(c.ctf AS DOUBLE)
                            / CAST(s.total_tokens AS DOUBLE))))
               * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS m_units
      FROM tf
      JOIN q ON q.term = tf.term
      JOIN coll c ON c.term = tf.term
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN stats s
      GROUP BY q.query_id, tf.doc_id
    ),
    jscored AS (
      SELECT m.query_id, m.doc_id,
             CAST(m.m_units + qc.a_units AS BIGINT) AS score_units
      FROM jmatch m JOIN qconst qc ON qc.query_id = m.query_id
    )
"""


@query(
    "doc_ql_jm_topk",
    oracle=f"""
    WITH q AS (
      SELECT CAST(query_id AS BIGINT) AS query_id, term,
             CAST(-1 AS BIGINT) AS self_excl
      FROM (VALUES {", ".join(f"({q}, '{t}')" for q, t in _BM25_QUERIES)})
           AS v(query_id, term)
    ),
    {_bm25_build_cte()},
    {_JM_CTES}
    SELECT query_id, doc_id,
           ROUND(CAST(score_units AS DOUBLE) / 1000000.0, 6) AS score,
           rank
    FROM (
      SELECT query_id, doc_id, score_units,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY score_units DESC, doc_id ASC)
               AS rank
      FROM jscored
    ) WHERE rank <= 10
    """,
)
def doc_ql_jm_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jelinek-Mercer query likelihood (Zhai & Lafferty 2001, the fixed-
    λ linear interpolation) — completes the two-smoothing LM pair next
    to the Dirichlet gate: JM's smoothing mass is length-INdependent, so
    unlike Dirichlet it carries no per-doc length term (title-query
    regime), a semantic difference worth having both of.

    Same decomposition discipline: the match contribution is one
    composed ln per side fixed-pointed to 10⁶ units, the per-query
    constant aggregates once, the sum is integer, out-of-corpus query
    terms drop on both engines."""
    from .operators.retrieval import ql_jm_topk

    docs = load_table(spark, sf_dir, "documents")
    qterms = spark.createDataFrame(
        _BM25_QUERIES, "query_id long, term string"
    )
    return ql_jm_topk(docs, qterms, k=10, lam=0.5, prefilter_buckets=8)


@query(
    "hybrid_rrf_weighted_topk",
    oracle=f"""
    WITH q AS (
      SELECT CAST(query_id AS BIGINT) AS query_id, term,
             CAST(-1 AS BIGINT) AS self_excl
      FROM (VALUES {", ".join(f"({q}, '{t}')" for q, t in _BM25_QUERIES)})
           AS v(query_id, term)
    ),
    {_bm25_build_cte()},
    {_JM_CTES},
    lexr AS (
      SELECT query_id, doc_id, bm25_rank FROM (
        SELECT query_id, doc_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY score_units DESC, doc_id ASC)
                 AS bm25_rank
        FROM scores
      ) WHERE bm25_rank <= 50
    ),
    jmr AS (
      SELECT query_id, doc_id, jm_rank FROM (
        SELECT query_id, doc_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY score_units DESC, doc_id ASC)
                 AS jm_rank
        FROM jscored
      ) WHERE jm_rank <= 50
    ),
    pairs AS (
      SELECT COALESCE(l.query_id, m.query_id) AS query_id,
             COALESCE(l.doc_id, m.doc_id) AS doc_id,
             CAST(COALESCE(l.bm25_rank, 0) AS BIGINT) AS bm25_rank,
             CAST(COALESCE(m.jm_rank, 0) AS BIGINT) AS jm_rank,
             CAST(COALESCE(2 * (CAST(1000000000000 AS BIGINT)
                      // CAST(60 + l.bm25_rank AS BIGINT)), 0)
                  + COALESCE(CAST(1000000000000 AS BIGINT)
                      // CAST(60 + m.jm_rank AS BIGINT), 0)
                  AS BIGINT) AS rrf_units
      FROM lexr l FULL OUTER JOIN jmr m
        ON l.query_id = m.query_id AND l.doc_id = m.doc_id
    )
    SELECT query_id, doc_id, bm25_rank, jm_rank, rrf_score, rank FROM (
      SELECT query_id, doc_id, bm25_rank, jm_rank,
             ROUND(CAST(rrf_units AS DOUBLE) / 1000000000000.0, 9)
               AS rrf_score,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY rrf_units DESC, doc_id ASC)
               AS rank
      FROM pairs
    ) WHERE rank <= 10
    """,
)
def hybrid_rrf_weighted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED reciprocal-rank fusion (2:1) of BM25 and Jelinek-Mercer
    QL — the trust-skewed fusion form: each ranker contributes
    w_r · (10¹² div (60 + rank)) integer units, so the arbitration stays
    engine-exact for any weight vector. 2:1 encodes 'prefer the tf-
    saturating ranker, let the LM break its ties' — the knob a
    deployment turns per workload rather than re-training anything.

    Both rankers run over ONE shared term-stats build (the r8 rrf3
    pattern: tokenize+aggregate paid once), each top-50-bounded before
    the O(queries·k) fusion."""
    from .operators.retrieval import (
        bm25_topk,
        ql_jm_topk,
        rrf_fuse_n,
        term_stats,
    )

    docs = load_table(spark, sf_dir, "documents")
    qterms = spark.createDataFrame(
        _BM25_QUERIES, "query_id long, term string"
    )
    from .operators.retrieval import dl_from_tf

    tf, _ = term_stats(docs)
    # dl from the CHECKPOINTED tf: re-checkpointing the original dl plan
    # would tokenize+explode the corpus a second time
    tf = tf.localCheckpoint()
    stats = (tf, dl_from_tf(tf).localCheckpoint())
    lex = bm25_topk(
        docs, qterms, k=50, prefilter_buckets=8, stats=stats
    ).select("query_id", "doc_id", "rank")
    jm = ql_jm_topk(
        docs, qterms, k=50, lam=0.5, prefilter_buckets=8, stats=stats
    ).select("query_id", "doc_id", "rank")
    return rrf_fuse_n(
        [("bm25", lex), ("jm", jm)], k=10, rrf_k=60, weights=[2, 1]
    )


@query(
    "doc_bm25_prf_topk",
    oracle=f"""
    WITH q AS (
      SELECT CAST(query_id AS BIGINT) AS query_id, term,
             CAST(-1 AS BIGINT) AS self_excl
      FROM (VALUES {", ".join(f"({q}, '{t}')" for q, t in _BM25_QUERIES)})
           AS v(query_id, term)
    ),
    {_bm25_build_cte()},
    top5 AS (
      SELECT query_id, doc_id FROM (
        SELECT query_id, doc_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY score_units DESC, doc_id ASC)
                 AS r
        FROM scores
      ) WHERE r <= 5
    ),
    fbsum AS (
      SELECT f.query_id, tf.term, CAST(SUM(tf.tf) AS BIGINT) AS fb_tf
      FROM tf JOIN top5 f ON f.doc_id = tf.doc_id
      WHERE NOT EXISTS (SELECT 1 FROM q
                        WHERE q.query_id = f.query_id
                          AND q.term = tf.term)
      GROUP BY f.query_id, tf.term
    ),
    fbt AS (
      SELECT query_id, term FROM (
        SELECT query_id, term,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY fb_tf DESC, term ASC) AS trn
        FROM fbsum
      ) WHERE trn <= 3
    ),
    q2 AS (
      SELECT query_id, term, CAST(-1 AS BIGINT) AS self_excl FROM q
      UNION
      SELECT query_id, term, CAST(-1 AS BIGINT) AS self_excl FROM fbt
    ),
    {_bm25_score_ctes('q2', '2')}
    SELECT query_id, doc_id,
           ROUND(CAST(score_units AS DOUBLE) / 1000000.0, 6) AS score, rank
    FROM (
      SELECT query_id, doc_id, score_units,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY score_units DESC, doc_id ASC)
               AS rank
      FROM scores2
    ) WHERE rank <= 10
    """,
)
def doc_bm25_prf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 with pseudo-relevance feedback (Rocchio-style two-pass
    expansion): pass 1 retrieves top-5 per query, the 3 most frequent
    NEW terms of that feedback set join the query, pass 2 ranks with the
    expanded query — the classic recall lever for short queries under
    vocabulary mismatch, and the repo's first MULTI-PASS retrieval gate:
    its oracle replays retrieve → select → expand → re-retrieve end to
    end, so the cross-engine contract covers query rewriting, not just
    scoring.

    Determinism: pass-1 order is the integer BM25 ranking; expansion
    terms are picked by (Σtf desc, term asc) — integer totals under a
    total order; pass-2 scores are integer BM25 over the UNION-deduped
    expanded term set. Corpus stats are built once and shared by both
    passes (operators/retrieval.bm25_prf_topk ``stats=`` reuse)."""
    from .operators.retrieval import bm25_prf_topk

    docs = load_table(spark, sf_dir, "documents")
    qterms = spark.createDataFrame(
        _BM25_QUERIES, "query_id long, term string"
    )
    return bm25_prf_topk(
        docs, qterms, k=10, fb_k=5, fb_terms=3, prefilter_buckets=8
    )
