"""Ranked lexical retrieval (BM25) and reciprocal-rank fusion (RRF).

Public algorithms only: the Robertson–Spärck Jones BM25 weighting in its
k1/b form with the Lucene non-negative idf variant
``ln(1 + (N − df + 0.5)/(df + 0.5))``, and reciprocal-rank fusion
(Cormack, Clarke & Büttcher, SIGIR'09: ``Σ 1/(κ + rank)``).

The reference engine ships no ranked-retrieval surface; these complete
the text-analysis tier next to the inverted index
(queries_r6.doc_keyword_postings) and the ANN family — BM25 is the
standard lexical counterpart for contamination checks and hybrid
retrieval over a training corpus.

Cross-engine determinism (the house rules in queries.py): every per-term
BM25 contribution is ONE composed double expression per side —
``idf · tf_norm`` — then immediately fixed-pointed with
``floor(x · 10⁶ + 0.5)`` into BIGINT units, so the per-document sum is
integer arithmetic: order-independent, overflow-safe (contributions are
a few 10⁶ units), and bit-identical across engines. The only doubles
that cross an aggregation boundary are already integers in disguise.

Scale shape (100 TB): tf/dl/df are plain map-side-combined aggregates;
the query-term table broadcasts by default (true queries are small) but
every query-scaled broadcast is gated on ``broadcast_queries`` for
corpus-derived query tables — a benchmark-suite decontamination run with
10⁵–10⁶ benchmark docs makes (query_id, term) far too large for a driver
broadcast, and the knob lets those joins shuffle instead; the
candidate set is bounded by the postings of the query terms; and the
final per-query top-k runs behind a bucketed pre-cut window
(``prefilter_buckets``) so no single task ever sorts a whole query's
candidate list — the same two-phase idiom as operators/corpus's race
sampler and similarity's ``_topk_candidates``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: fixed-point scale for BM25 score units (6 decimal digits — matches the
#: repo-wide round(x, 6) output grain)
BM25_SCALE = 1_000_000


def _maybe_bcast(df: DataFrame, flag: bool) -> DataFrame:
    """Broadcast hint gated on the caller's knowledge of the query side.

    For true user queries the (query_id, term) table is tiny and the hint
    is right. But compositions that derive the 'queries' from a corpus
    slice (decontamination against a benchmark *suite*, query-by-example
    over a sample) can make it hundreds of millions of rows at the 100 TB
    story — there the hard hint forces an over-budget driver broadcast,
    and callers pass ``broadcast_queries=False`` so the tf⋈qterms / df /
    per-query-constant joins fall back to shuffle joins on uniformly
    hashed keys. Same knob pattern as corpus.ngram_overlap's
    ``broadcast_bench``."""
    return F.broadcast(df) if flag else df


def doc_tokens(docs: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """(doc_id, term) with multiplicity, from the canonical normalized
    form (lowercase, collapsed whitespace) — the same tokenizer as the
    inverted index so df/tf agree with doc_keyword_postings."""
    from .textops import normalize_text_expr

    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.split(
                normalize_text_expr(F.coalesce(F.col(text_col), F.lit(""))),
                " ",
            )
        ).alias("term"),
    )


def term_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
):
    """(tf, dl) term-statistics pair for the ranking functions — the
    shared 'index build' half of BM25 and query-likelihood. Callers
    running SEVERAL rankers over one corpus should build this once
    (optionally `.localCheckpoint()` each side) and pass it via the
    rankers' ``stats=`` parameter, so the tokenize+aggregate scans are
    paid once instead of per ranker."""
    toks = doc_tokens(docs, id_col, text_col)
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # dl as an INDEPENDENT aggregate over the token explode, not derived
    # from tf (r14 adjudication of the r13 dl-from-tf restructure): for
    # the stats=None single-pass rankers each consumer of dl re-executes
    # its whole lineage, so deriving dl from tf made every dl evaluation
    # pay the (doc, term) pre-aggregation shuffle ON TOP of the doc-key
    # one — measured ~10% slower per round on doc_ql_dirichlet_topk in a
    # 5-round interleaved A/B with identical outputs (tools/
    # ab_term_stats.py). Callers that materialize tf (PRF, hybrid, CLI
    # fusion, the RAG gate) should keep deriving dl from the
    # CHECKPOINTED tf via :func:`dl_from_tf`, where the explode is paid
    # once into blocks and the extra shuffle argument flips.
    dl = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("dl")
    )
    return tf, dl


def dl_from_tf(tf: DataFrame) -> DataFrame:
    """Document lengths from the (doc_id, term, tf) relation — Σ_term tf
    is the doc's token count. Callers that ``localCheckpoint`` tf should
    derive dl FROM THE CHECKPOINTED tf with this helper (then checkpoint
    dl too): the aggregate runs over the materialized blocks instead of
    re-running tokenize+explode over the corpus."""
    return tf.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))


def bm25_scores(
    docs: DataFrame,
    query_terms: DataFrame,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    exclude_self: bool = False,
    stats: tuple | None = None,
    broadcast_queries: bool = True,
) -> DataFrame:
    """Per-(query, document) BM25 scores over every document matching at
    least one query term.

    ``query_terms`` is a (query_id, term) table — broadcast by default
    (true queries are small); pass ``broadcast_queries=False`` when it is
    corpus-derived (benchmark-suite decontamination) so the query-scaled
    joins run as shuffle joins instead. Output
    columns: query_id, doc_id, score_units (BIGINT fixed-point),
    score (= units/10⁶, rounded to 6 dp).

    ``exclude_self=True`` drops doc_id == query_id rows — the
    query-by-example form used by the hybrid gate, where a document's own
    terms are the query and the document itself is not a result.
    """
    tf, dl = stats if stats is not None else term_stats(docs, id_col, text_col)
    # one-row corpus stats: N and total token count (avgdl = total/N);
    # broadcast-crossJoin is the repo's 1-row scalar idiom
    corpus_stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_tokens"),
    )
    # dedupe defensively: a repeated (query_id, term) row would otherwise
    # count the term's contribution twice (BM25 query-side tf is a
    # deliberate non-feature at these query lengths, matching the oracle)
    qterms = query_terms.select(
        F.col("query_id").cast("bigint").alias("query_id"), "term"
    ).distinct()
    # df only for query terms: tf is distinct on (doc, term), so a term
    # count over tf IS the document frequency; restricting through the
    # (tiny) distinct query-term set keeps the df aggregate bounded by
    # the postings of the query vocabulary, not the corpus vocabulary
    dfreq = (
        tf.join(
            _maybe_bcast(qterms.select("term").distinct(), broadcast_queries),
            on="term",
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    cut = tf.join(_maybe_bcast(qterms, broadcast_queries), on="term")
    if exclude_self:
        cut = cut.filter(F.col("doc_id") != F.col("query_id"))
    scored = (
        cut.join(_maybe_bcast(dfreq, broadcast_queries), on="term")
        .join(dl, on="doc_id")
        .crossJoin(F.broadcast(corpus_stats))
    )
    # ONE composed double expression per side, then fixed-point:
    #   idf = ln((N − df + 0.5)/(df + 0.5) + 1)         [Lucene variant]
    #   tfn = tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    # avgdl inlined as total/N so the whole thing is a single composition
    # over integer inputs — the oracle mirrors it token for token.
    idf = F.log(
        ((F.col("n_docs") - F.col("df")).cast("double") + F.lit(0.5))
        / (F.col("df").cast("double") + F.lit(0.5))
        + F.lit(1.0)
    )
    tfn = (F.col("tf").cast("double") * F.lit(float(k1 + 1.0))) / (
        F.col("tf").cast("double")
        + F.lit(float(k1))
        * (
            F.lit(float(1.0 - b))
            + F.lit(float(b))
            * (
                F.col("dl").cast("double")
                / (
                    F.col("total_tokens").cast("double")
                    / F.col("n_docs").cast("double")
                )
            )
        )
    )
    units = F.floor(idf * tfn * F.lit(float(BM25_SCALE)) + F.lit(0.5)).cast(
        "bigint"
    )
    return (
        scored.withColumn("units", units)
        .groupBy("query_id", "doc_id")
        .agg(F.sum("units").alias("score_units"))
        .withColumn(
            "score",
            F.round(
                F.col("score_units").cast("double") / F.lit(float(BM25_SCALE)),
                6,
            ),
        )
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    prefilter_buckets: int = 0,
    exclude_self: bool = False,
    stats: tuple | None = None,
    broadcast_queries: bool = True,
) -> DataFrame:
    """Top-k BM25 retrieval per query: (query_id, doc_id, score, rank).

    Ranking key is the INTEGER fixed-point score (desc, doc_id asc) on
    both engines — no double comparison anywhere in the ordering. With
    ``prefilter_buckets`` > 0 a per-(query, doc-hash-bucket) window keeps
    only each bucket's top k before the global per-query window, so the
    global sort sees ≤ buckets·k rows per query regardless of how many
    documents match the query terms — exact by the same dominance
    argument as similarity._topk_candidates."""
    scored = bm25_scores(
        docs, query_terms, k1=k1, b=b, id_col=id_col, text_col=text_col,
        exclude_self=exclude_self, stats=stats,
        broadcast_queries=broadcast_queries,
    )
    if prefilter_buckets > 0:
        wb = Window.partitionBy(
            "query_id", F.pmod(F.xxhash64(F.col("doc_id")), F.lit(prefilter_buckets))
        ).orderBy(F.col("score_units").desc(), F.col("doc_id").asc())
        scored = scored.withColumn("_brn", F.row_number().over(wb)).filter(
            F.col("_brn") <= k
        )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_units").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "rank")
    )


def ql_dirichlet_topk(
    docs: DataFrame,
    query_terms: DataFrame,
    k: int = 10,
    mu: float = 100.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    prefilter_buckets: int = 0,
    exclude_self: bool = False,
    stats: tuple | None = None,
    broadcast_queries: bool = True,
) -> DataFrame:
    """Query-likelihood retrieval with Dirichlet smoothing (Zhai &
    Lafferty, SIGIR'01) — the language-modeling counterpart to BM25:

      score(q, d) = Σ_{t∈q} ln((tf_{t,d} + μ·p_c(t)) / (dl_d + μ))

    with collection model p_c(t) = ctf_t / total_tokens. Decomposed so
    every double crosses an aggregation boundary only as fixed-point
    BIGINT units (each ln is ONE composed expression per engine,
    floor(x·10⁶ + 0.5)-scaled immediately):

      score = Σ_{t∈q∩d} ln((tf + μ·p_c)/(μ·p_c))     [match part]
            + Σ_{t∈q}   ln(μ·p_c(t))                  [per-query const]
            − |q| · ln(dl + μ)                        [per-doc length]

    Query terms absent from the corpus are dropped (p_c = 0 has no
    finite likelihood — the standard convention), and |q| counts the
    surviving terms on both engines. Candidates are docs sharing ≥ 1
    query term; ranking compares the integer unit sum (desc, doc_id
    asc). Scale shape identical to :func:`bm25_topk`: map-side
    aggregates, broadcast query vocabulary, postings-bounded candidates,
    optional bucketed pre-cut."""
    tf, dl = stats if stats is not None else term_stats(docs, id_col, text_col)
    corpus_stats = dl.agg(F.sum("dl").alias("total_tokens"))
    qterms = query_terms.select(
        F.col("query_id").cast("bigint").alias("query_id"), "term"
    ).distinct()
    # collection counts for the query vocabulary only
    coll = (
        tf.join(
            _maybe_bcast(qterms.select("term").distinct(), broadcast_queries),
            on="term",
        )
        .groupBy("term")
        .agg(F.sum("tf").alias("ctf"))
    )
    mu_lit = F.lit(float(mu))
    pc = F.col("ctf").cast("double") / F.col("total_tokens").cast("double")
    # per-(query, known-term): ln(μ·p_c) units; aggregated per query
    qconst = (
        qterms.join(_maybe_bcast(coll, broadcast_queries), on="term")
        .crossJoin(F.broadcast(corpus_stats))
        .withColumn(
            "_a", F.floor(F.log(mu_lit * pc) * F.lit(float(BM25_SCALE)) + F.lit(0.5)).cast("bigint")
        )
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("nq"),
            F.sum("_a").alias("a_units"),
        )
    )
    # per-doc length term: |q| multiplies an already-fixed-pointed unit
    dl_units = dl.withColumn(
        "_dlu",
        F.floor(
            F.log(F.col("dl").cast("double") + mu_lit)
            * F.lit(float(BM25_SCALE))
            + F.lit(0.5)
        ).cast("bigint"),
    )
    # match part over candidate (query, doc, term) rows; exclude_self
    # drops the query-by-example document itself (collection statistics
    # stay global, mirroring bm25_scores)
    cut = tf.join(_maybe_bcast(qterms, broadcast_queries), on="term")
    if exclude_self:
        cut = cut.filter(F.col("doc_id") != F.col("query_id"))
    match = (
        cut.join(_maybe_bcast(coll, broadcast_queries), on="term")
        .crossJoin(F.broadcast(corpus_stats))
        .withColumn(
            "_m",
            F.floor(
                F.log(
                    (F.col("tf").cast("double") + mu_lit * pc) / (mu_lit * pc)
                )
                * F.lit(float(BM25_SCALE))
                + F.lit(0.5)
            ).cast("bigint"),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("_m").alias("m_units"))
    )
    scored = (
        match.join(_maybe_bcast(qconst, broadcast_queries), on="query_id")
        .join(dl_units.select("doc_id", "_dlu"), on="doc_id")
        .withColumn(
            "score_units",
            F.col("m_units")
            + F.col("a_units")
            - F.col("nq") * F.col("_dlu"),
        )
        .withColumn(
            "score",
            F.round(
                F.col("score_units").cast("double") / F.lit(float(BM25_SCALE)),
                6,
            ),
        )
    )
    if prefilter_buckets > 0:
        wb = Window.partitionBy(
            "query_id",
            F.pmod(F.xxhash64(F.col("doc_id")), F.lit(prefilter_buckets)),
        ).orderBy(F.col("score_units").desc(), F.col("doc_id").asc())
        scored = scored.withColumn("_brn", F.row_number().over(wb)).filter(
            F.col("_brn") <= k
        )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_units").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "rank")
    )


#: fixed-point scale for TF-IDF weight units: coarser than BM25_SCALE
#: because the cosine denominator SQUARES the units — at 10³ a per-term
#: weight of ~10³ (tf·idf ≲ 10·e.g. 12 → units ≲ 10⁷... see bound note)
#: keeps Σ units² far inside int64 while the scale cancels exactly in
#: the cosine ratio (numerator and denominator carry the same factor).
TFIDF_W_SCALE = 1_000


def tfidf_cosine_topk(
    docs: DataFrame,
    query_terms: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    prefilter_buckets: int = 0,
    exclude_self: bool = False,
    stats: tuple | None = None,
    broadcast_queries: bool = True,
) -> DataFrame:
    """Classic vector-space-model retrieval (Salton's SMART tf·idf with
    cosine normalization): w(t,d) = tf·ln(N/df), query weights idf with
    unit query tf, score = cos(q, d) over the FULL document vector (the
    norm includes every doc term, not just matches — real cosine, not a
    truncated one).

    Determinism: each weight is ONE composed double per engine,
    immediately fixed-pointed to BIGINT at :data:`TFIDF_W_SCALE`; the
    match numerator Σ wd·wq and both norms Σ w² are then integer sums
    (the scale factor cancels in the ratio). The final score is one
    identical double composition of three exact integers —
    ``round(match / (sqrt(dn2)·sqrt(qn2)), 6)`` — and ranking orders by
    (score desc, doc_id asc) on the rounded value both sides.

    Int64 bound: units ≤ tf_max·ln(N)·10³; Σ units² per doc ≤
    dl·(tf_max·ln N·10³)² — at tf_max 10², N 10⁹, dl 10⁴ that is
    ~4·10¹⁷ < 2⁶³. Scale shape mirrors :func:`bm25_topk` with one
    addition: the document-norm aggregate needs df for EVERY corpus
    term (the classic full-vocabulary index build) — a vocab-bounded
    map-side aggregate, paid once and reusable across query batches."""
    tf, dl = stats if stats is not None else term_stats(docs, id_col, text_col)
    n_docs_df = dl.agg(F.count(F.lit(1)).alias("n_docs"))
    # full-vocabulary document frequency (needed for every doc's norm)
    dfreq_all = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    w_units = F.floor(
        F.col("tf").cast("double")
        * F.log(F.col("n_docs").cast("double") / F.col("df").cast("double"))
        * F.lit(float(TFIDF_W_SCALE))
        + F.lit(0.5)
    ).cast("bigint")
    weighted = (
        tf.join(dfreq_all, on="term")
        .crossJoin(F.broadcast(n_docs_df))
        .withColumn("_wu", w_units)
    )
    dnorm2 = weighted.groupBy("doc_id").agg(
        F.sum(F.col("_wu") * F.col("_wu")).alias("dn2")
    ).filter(F.col("dn2") > 0)
    qterms = query_terms.select(
        F.col("query_id").cast("bigint").alias("query_id"), "term"
    ).distinct()
    # query weights: unit tf → w(t,q) = idf, same fixed-point rule.
    # dfreq_all is CORPUS-vocabulary-sized — never broadcast it; the
    # query side is the small one here, so the hint (gated on the same
    # knob as everywhere else) goes on qterms.
    q_w = (
        dfreq_all.join(_maybe_bcast(qterms, broadcast_queries), on="term")
        .crossJoin(F.broadcast(n_docs_df))
        .withColumn(
            "_qu",
            F.floor(
                F.log(
                    F.col("n_docs").cast("double")
                    / F.col("df").cast("double")
                )
                * F.lit(float(TFIDF_W_SCALE))
                + F.lit(0.5)
            ).cast("bigint"),
        )
        .select("query_id", "term", "_qu")
    )
    # a query whose every term appears in every document has qn2 = 0 (all
    # idf weights 0) — its cosine is 0/0 for every candidate, and NaN
    # sorts FIRST under desc order, poisoning the top-k. Such queries
    # return no rows instead (the OOV-convention analogue: a query with
    # zero discriminative content has no meaningful ranking). Same guard
    # on the doc side (dn2 = 0 docs can only score 0/0 too).
    qnorm2 = q_w.groupBy("query_id").agg(
        F.sum(F.col("_qu") * F.col("_qu")).alias("qn2")
    ).filter(F.col("qn2") > 0)
    cut = weighted.join(_maybe_bcast(q_w, broadcast_queries), on="term")
    if exclude_self:
        cut = cut.filter(F.col("doc_id") != F.col("query_id"))
    match = cut.groupBy("query_id", "doc_id").agg(
        F.sum(F.col("_wu") * F.col("_qu")).alias("match_units")
    )
    scored = (
        match.join(_maybe_bcast(qnorm2, broadcast_queries), on="query_id")
        .join(dnorm2, on="doc_id")
        .withColumn(
            "score",
            F.round(
                F.col("match_units").cast("double")
                / (
                    F.sqrt(F.col("dn2").cast("double"))
                    * F.sqrt(F.col("qn2").cast("double"))
                ),
                6,
            ),
        )
    )
    if prefilter_buckets > 0:
        wb = Window.partitionBy(
            "query_id",
            F.pmod(F.xxhash64(F.col("doc_id")), F.lit(prefilter_buckets)),
        ).orderBy(F.col("score").desc(), F.col("doc_id").asc())
        scored = scored.withColumn("_brn", F.row_number().over(wb)).filter(
            F.col("_brn") <= k
        )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "rank")
    )


def ql_jm_topk(
    docs: DataFrame,
    query_terms: DataFrame,
    k: int = 10,
    lam: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    prefilter_buckets: int = 0,
    exclude_self: bool = False,
    stats: tuple | None = None,
    broadcast_queries: bool = True,
) -> DataFrame:
    """Query-likelihood retrieval with Jelinek-Mercer smoothing (the
    other classic from Zhai & Lafferty, SIGIR'01):

      score(q, d) = Σ_{t∈q} ln(λ·tf/dl + (1−λ)·p_c(t))

    Decomposed so only integers cross aggregation boundaries:

      score = Σ_{t∈q∩d} ln((λ·tf/dl + (1−λ)·p_c) / ((1−λ)·p_c))
            + Σ_{t∈q}   ln((1−λ)·p_c(t))

    — the match part is one composed double per row (fixed-pointed to
    units immediately), the per-query constant aggregates once, and
    unlike Dirichlet there is NO per-doc length term (JM's smoothing
    mass is length-independent; dl appears only inside the match
    composition). Out-of-corpus query terms are dropped, same
    convention as :func:`ql_dirichlet_topk`. Scale shape identical:
    map-side aggregates, postings-bounded candidates, the
    ``broadcast_queries`` knob on every query-scaled join."""
    tf, dl = stats if stats is not None else term_stats(docs, id_col, text_col)
    corpus_stats = dl.agg(F.sum("dl").alias("total_tokens"))
    qterms = query_terms.select(
        F.col("query_id").cast("bigint").alias("query_id"), "term"
    ).distinct()
    coll = (
        tf.join(
            _maybe_bcast(qterms.select("term").distinct(), broadcast_queries),
            on="term",
        )
        .groupBy("term")
        .agg(F.sum("tf").alias("ctf"))
    )
    lam_l = F.lit(float(lam))
    one_m = F.lit(float(1.0 - lam))
    pc = F.col("ctf").cast("double") / F.col("total_tokens").cast("double")
    qconst = (
        qterms.join(_maybe_bcast(coll, broadcast_queries), on="term")
        .crossJoin(F.broadcast(corpus_stats))
        .withColumn(
            "_a",
            F.floor(
                F.log(one_m * pc) * F.lit(float(BM25_SCALE)) + F.lit(0.5)
            ).cast("bigint"),
        )
        .groupBy("query_id")
        .agg(F.sum("_a").alias("a_units"))
    )
    cut = tf.join(_maybe_bcast(qterms, broadcast_queries), on="term")
    if exclude_self:
        cut = cut.filter(F.col("doc_id") != F.col("query_id"))
    match = (
        cut.join(_maybe_bcast(coll, broadcast_queries), on="term")
        .join(dl, on="doc_id")
        .crossJoin(F.broadcast(corpus_stats))
        .withColumn(
            "_m",
            F.floor(
                F.log(
                    (
                        lam_l
                        * (
                            F.col("tf").cast("double")
                            / F.col("dl").cast("double")
                        )
                        + one_m * pc
                    )
                    / (one_m * pc)
                )
                * F.lit(float(BM25_SCALE))
                + F.lit(0.5)
            ).cast("bigint"),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("_m").alias("m_units"))
    )
    scored = (
        match.join(_maybe_bcast(qconst, broadcast_queries), on="query_id")
        .withColumn("score_units", F.col("m_units") + F.col("a_units"))
        .withColumn(
            "score",
            F.round(
                F.col("score_units").cast("double") / F.lit(float(BM25_SCALE)),
                6,
            ),
        )
    )
    if prefilter_buckets > 0:
        wb = Window.partitionBy(
            "query_id",
            F.pmod(F.xxhash64(F.col("doc_id")), F.lit(prefilter_buckets)),
        ).orderBy(F.col("score_units").desc(), F.col("doc_id").asc())
        scored = scored.withColumn("_brn", F.row_number().over(wb)).filter(
            F.col("_brn") <= k
        )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_units").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "rank")
    )


def bm25_prf_topk(
    docs: DataFrame,
    query_terms: DataFrame,
    k: int = 10,
    fb_k: int = 5,
    fb_terms: int = 3,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    prefilter_buckets: int = 0,
    stats: tuple | None = None,
    broadcast_queries: bool = True,
) -> DataFrame:
    """BM25 with pseudo-relevance feedback (Rocchio-style query
    expansion, the classic two-pass PRF of Buckley et al. / TREC): pass
    1 retrieves each query's top ``fb_k`` documents, the ``fb_terms``
    most frequent terms of that feedback set (by summed tf, excluding
    the original query terms) join the query, and pass 2 ranks with the
    expanded query. The standard recall lever when queries are short and
    vocabulary mismatch is the failure mode.

    Fully deterministic across engines: pass-1 ranking is the integer
    BM25 order; expansion terms are chosen by (Σtf desc, term asc) —
    integer sums with a total order; pass-2 scoring is integer BM25 over
    the expanded term set (expansion terms contribute with query-tf 1,
    the same dedup convention as direct queries).

    Scale: pass 1 is :func:`bm25_topk`; the feedback set is
    O(queries · fb_k) rows (broadcast onto tf), term selection is one
    bounded aggregate + window; pass 2 is another bm25_topk whose query
    vocabulary grew by ≤ fb_terms per query. The corpus-side term stats
    are built ONCE and shared by both passes (``stats=``)."""
    if stats is None:
        tf, _ = term_stats(docs, id_col, text_col)
        # checkpoint tf, then derive dl from the MATERIALIZED blocks —
        # checkpointing the original dl plan would re-run the corpus
        # tokenize+explode a second time
        tf = tf.localCheckpoint()
        dl = dl_from_tf(tf).localCheckpoint()
    else:
        tf, dl = stats
    both = (tf, dl)
    qterms = query_terms.select(
        F.col("query_id").cast("bigint").alias("query_id"), "term"
    ).distinct()
    first = bm25_topk(
        docs, qterms, k=fb_k, k1=k1, b=b, id_col=id_col, text_col=text_col,
        prefilter_buckets=prefilter_buckets, stats=both,
        broadcast_queries=broadcast_queries,
    )
    fb = first.select("query_id", "doc_id")
    fb_tf = (
        tf.join(F.broadcast(fb) if broadcast_queries else fb, on="doc_id")
        .groupBy("query_id", "term")
        .agg(F.sum("tf").alias("fb_tf"))
        # expansion candidates must be NEW terms
        .join(qterms, on=["query_id", "term"], how="left_anti")
    )
    wt = Window.partitionBy("query_id").orderBy(
        F.col("fb_tf").desc(), F.col("term").asc()
    )
    expansion = (
        fb_tf.withColumn("_trn", F.row_number().over(wt))
        .filter(F.col("_trn") <= fb_terms)
        .select("query_id", "term")
    )
    expanded = qterms.unionByName(expansion)
    return bm25_topk(
        docs, expanded, k=k, k1=k1, b=b, id_col=id_col, text_col=text_col,
        prefilter_buckets=prefilter_buckets, stats=both,
        broadcast_queries=broadcast_queries,
    )


def rrf_fuse_n(
    rankings,
    k: int = 10,
    rrf_k: int = 60,
    unit_scale: int = 10**12,
    weights=None,
) -> DataFrame:
    """n-way reciprocal-rank fusion with INTEGER fixed-point
    contributions: each ranker contributes ``unit_scale div (κ + rank)``
    units (floor division of exact integers), so the fused sum is
    integer arithmetic — order-independent and engine-exact for ANY
    number of rankers, where the two-ranker :func:`rrf_fuse` could lean
    on IEEE pairwise-add commutativity. At ``unit_scale`` = 10¹² the
    quantization of 1/(κ+r) is ~10⁻¹²·κ² relative — far below any rank
    decision — and a 16-ranker fusion still sums to < 2⁶⁰.

    ``rankings`` is a sequence of (name, df) pairs, each df a
    (query_id, doc_id, rank) table already top-k-bounded per query.
    Output: query_id, doc_id, one ``<name>_rank`` column per ranker
    (0 = not retrieved by it), rrf_score (units/unit_scale, 9 dp), rank.

    ``weights`` (optional, one INTEGER per ranker) scales each ranker's
    contribution — ``w_r · (unit_scale div (κ + rank))``, the weighted
    RRF variant used when one signal is trusted more (e.g. lexical 2 :
    dense 1 for exact-phrase-heavy workloads). Integer weights keep the
    fused sum exact; for fractional ratios scale all weights up (3:2,
    not 1.5:1).
    """
    fused = None
    rank_cols = []
    if weights is not None and len(weights) != len(rankings):
        raise ValueError(
            f"weights ({len(weights)}) must match rankings ({len(rankings)})"
        )
    for name, df in rankings:
        col = f"{name}_rank"
        rank_cols.append(col)
        d = df.select(
            "query_id", "doc_id", F.col("rank").cast("bigint").alias(col)
        )
        fused = (
            d
            if fused is None
            else fused.join(d, on=["query_id", "doc_id"], how="full_outer")
        )
    units = None
    for i, col in enumerate(rank_cols):
        w_i = 1 if weights is None else int(weights[i])
        c = F.coalesce(
            F.expr(
                f"CAST({w_i} AS BIGINT) * (CAST({unit_scale} AS BIGINT)"
                f" div CAST({rrf_k} + {col} AS BIGINT))"
            ),
            F.lit(0),
        )
        units = c if units is None else units + c
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_units").desc(), F.col("doc_id").asc()
    )
    out = fused.withColumn("rrf_units", units)
    for col in rank_cols:
        out = out.withColumn(col, F.coalesce(F.col(col), F.lit(0)))
    return (
        out.withColumn(
            "rrf_score",
            F.round(
                F.col("rrf_units").cast("double") / F.lit(float(unit_scale)),
                9,
            ),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "doc_id", *rank_cols, "rrf_score", "rank"
        )
    )


def rrf_fuse(
    lex: DataFrame,
    dense: DataFrame,
    k: int = 10,
    rrf_k: int = 60,
    round_digits: int = 9,
) -> DataFrame:
    """Reciprocal-rank fusion of two rankings (Cormack et al. 2009):
    ``rrf = Σ_r 1/(κ + rank_r)`` over the rankers that returned the
    document, κ = 60 per the paper. Inputs are (query_id, doc_id, rank)
    tables; a document absent from one ranking contributes 0 from it and
    reports rank 0 in the output (0 = "not retrieved" — keeps the column
    integral, NULLs would float-ify the pandas canonical form).

    Determinism: each contribution is one IEEE division of exact
    integers (correctly rounded, engine-independent) and the fusion is a
    sum of exactly TWO doubles (commutative, associativity moot), so the
    fused score is bit-identical across engines before the output
    rounding. Ordering: rounded rrf desc, doc_id asc.

    Scale: both inputs are already top-k-bounded per query (≤ k rows per
    query per ranker), so the outer join and the final window are over
    O(queries · k) rows — driver-free and skew-free at any corpus size."""
    a = lex.select(
        "query_id", "doc_id", F.col("rank").cast("bigint").alias("lex_rank")
    )
    d = dense.select(
        "query_id", "doc_id", F.col("rank").cast("bigint").alias("dense_rank")
    )
    fused = a.join(d, on=["query_id", "doc_id"], how="full_outer")
    contrib_a = F.lit(1.0) / (
        F.lit(rrf_k) + F.col("lex_rank")
    ).cast("double")
    contrib_d = F.lit(1.0) / (
        F.lit(rrf_k) + F.col("dense_rank")
    ).cast("double")
    rrf = F.round(
        F.coalesce(contrib_a, F.lit(0.0)) + F.coalesce(contrib_d, F.lit(0.0)),
        round_digits,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_score").desc(), F.col("doc_id").asc()
    )
    return (
        fused.withColumn("rrf_score", rrf)
        .withColumn("lex_rank", F.coalesce(F.col("lex_rank"), F.lit(0)))
        .withColumn("dense_rank", F.coalesce(F.col("dense_rank"), F.lit(0)))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "doc_id", "lex_rank", "dense_rank", "rrf_score", "rank"
        )
    )


# ---------------------------------------------------------------------------
# Positional proximity: minimal-window phrase evidence (round 10).
# ---------------------------------------------------------------------------

def doc_positions(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """(doc_id, pos, term) positional postings — :func:`doc_tokens` plus
    the 0-based token position, same canonical tokenizer, so positional
    evidence composes with the bag-of-words index (tf/df agree)."""
    from .textops import normalize_text_expr

    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.split(
                normalize_text_expr(F.coalesce(F.col(text_col), F.lit(""))),
                " ",
            )
        ).alias("pos", "term"),
    )


def phrase_window_topk(
    docs: DataFrame,
    query_pairs: DataFrame,
    k: int = 10,
    window: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_queries: bool = True,
) -> DataFrame:
    """Top-k documents per 2-term phrase query by position-aware
    evidence: ordered-adjacency hits, unordered co-occurrences inside a
    ``window``-token span, and the minimal span — the three proximity
    channels of Metzler & Croft's sequential dependence model (SIGIR'05)
    with Clarke et al. (2000) minimal-window cover, combined on an
    INTEGER scale (house fixed-point contract; no logs, no doubles):

        score_units = 10000·ordered + 1000·within_window + 100·(window − min_gap)

    ``query_pairs`` is (query_id, term_a, term_b). Only documents with at
    least one within-window co-occurrence are scored — the bag-of-words
    fallback channel is the existing rankers' job (compose via
    :func:`rrf_fuse_n` for the full SDM-shaped blend); verbatim-quote
    contamination checks read ``ordered_hits`` directly.

    Plan shape: positional postings join the (broadcast) query-pair
    relation term-keyed TWICE (the a-side and b-side posting lists), then
    pair up per (query, doc) under the ``|pb − pa| < window`` predicate —
    work is Σ tf_a·tf_b per matched doc *bounded by the window*, the
    standard positional-intersection cost, never a token cross product.
    The per-(query,doc) aggregate and the per-query top-k window are the
    only shuffles past the posting build."""
    positions = doc_positions(docs, id_col, text_col)
    pairs = query_pairs.select(
        "query_id",
        F.col("term_a").cast("string").alias("term_a"),
        F.col("term_b").cast("string").alias("term_b"),
    )
    qp = _maybe_bcast(pairs, broadcast_queries)
    a = positions.join(qp, positions["term"] == qp["term_a"]).select(
        "query_id", "doc_id", F.col("pos").alias("pa")
    )
    # Distinct column names on the b side: a and b share the qp lineage,
    # so joining on a["query_id"] == b["query_id"] resolves BOTH sides to
    # one attribute (Spark's trivially-true-predicate trap) — which would
    # silently pair term_a postings of one query with term_b postings of
    # every other.
    b = positions.join(qp, positions["term"] == qp["term_b"]).select(
        F.col("query_id").alias("qid_b"),
        F.col("doc_id").alias("doc_b"),
        F.col("pos").alias("pb"),
    )
    gap = F.abs(F.col("pb") - F.col("pa"))
    co = a.join(
        b,
        (F.col("query_id") == F.col("qid_b"))
        & (F.col("doc_id") == F.col("doc_b"))
        & (gap >= 1)
        & (gap < window),
    ).select("query_id", "doc_id", "pa", "pb")
    per_doc = co.groupBy("query_id", "doc_id").agg(
        F.sum(
            F.when(F.col("pb") == F.col("pa") + 1, F.lit(1)).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("ordered_hits"),
        F.count(F.lit(1)).cast("bigint").alias("window_hits"),
        F.min(F.abs(F.col("pb") - F.col("pa"))).cast("bigint").alias("min_gap"),
    )
    score = (
        F.lit(10_000) * F.col("ordered_hits")
        + F.lit(1_000) * F.col("window_hits")
        + F.lit(100) * (F.lit(window) - F.col("min_gap"))
    ).cast("bigint")
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_units").desc(), F.col("doc_id").asc()
    )
    return (
        per_doc.withColumn("score_units", score)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "doc_id",
            "ordered_hits",
            "window_hits",
            "min_gap",
            "score_units",
            "rank",
        )
    )


def late_interaction_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    sig_bits: int = 16,
    prefilter_candidates: int | None = 20,
) -> DataFrame:
    """Late-interaction (maxsim) top-k in the ColBERT shape (Khattab &
    Zaharia, SIGIR 2020): documents and queries are BAGS OF TOKEN
    VECTORS; score(q, d) = Σ over query tokens of the MAX similarity
    against any document token — fine-grained token-level matching the
    bag-of-words rankers cannot express (a query term scores against
    the CLOSEST document token, not only exact matches).

    Token vectors here are the deterministic ±1 signature family the
    oracle can reproduce: ``sig(term) = hash60(term) mod 2^sig_bits``,
    read as sig_bits ±1 components, so ``dot(t, u) = sig_bits −
    2·hamming(sig_t, sig_u)`` and maxsim per (query term, doc) is
    ``sig_bits − 2·min_hamming`` — all integer (house determinism
    rules). A real deployment swaps the signature for learned per-token
    embeddings and the hamming for a BLAS dot; every join/shuffle below
    carries over unchanged (the decode-seam pattern of the media tier).

    Plan shape at scale: exact-match prefilter first — only docs sharing
    ≥1 query term enter maxsim, ranked by distinct-match count with a
    doc_id tiebreak and cut to ``prefilter_candidates`` per query (the
    retrieval family's top-k pre-cut idiom) — then ONE equi-join of the
    candidate set against the per-doc DISTINCT token lists on doc_id,
    query side broadcast. No pairwise explosion: work is
    O(candidates · distinct doc terms · |q|), all integer codegen.

    ``queries``: (query_id, term). Returns (query_id, doc_id,
    match_terms, score_units, rank ≤ k).

    ``prefilter_candidates=None`` is EXACT maxsim: every (query, doc)
    pair is scored, including docs sharing no query term (whose signal
    is pure signature-collision similarity). The candidate set becomes
    a broadcast-nested-loop cross of the distinct query ids against the
    doc ids — O(|queries|·|docs|) scoring with no pre-cut, which is the
    small-corpus / final-rerank / audit-baseline mode (the prefilter's
    measured recall against it lives in RETRIEVAL.md), NOT the 100 TB
    path; the prefiltered default is.
    """
    from ..functions.hashing import hash60

    sig_mod = 1 << sig_bits
    qterms = queries.select("query_id", "term").distinct().withColumn(
        "qsig", F.pmod(hash60(F.col("term")), F.lit(sig_mod))
    )
    dterms = doc_tokens(docs).distinct().withColumn(
        "dsig", F.pmod(hash60(F.col("term")), F.lit(sig_mod))
    )

    # exact-match prefilter: candidate docs per query by distinct
    # matched terms (desc), doc_id (asc), top prefilter_candidates
    matches = (
        dterms.join(F.broadcast(qterms.select("query_id", "term")), on="term")
        .groupBy("query_id", "doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("match_terms"))
    )
    if prefilter_candidates is None:
        cands = (
            dterms.select("doc_id")
            .distinct()
            .crossJoin(F.broadcast(qterms.select("query_id").distinct()))
            .join(matches, on=["query_id", "doc_id"], how="left")
            .select(
                "query_id",
                "doc_id",
                F.coalesce(F.col("match_terms"), F.lit(0))
                .cast("bigint")
                .alias("match_terms"),
            )
        )
    else:
        w_cand = Window.partitionBy("query_id").orderBy(
            F.col("match_terms").desc(), F.col("doc_id").asc()
        )
        cands = (
            matches.withColumn("_rn", F.row_number().over(w_cand))
            .filter(F.col("_rn") <= prefilter_candidates)
            .select("query_id", "doc_id", "match_terms")
        )

    # maxsim: per (query_id, query term, candidate doc), the minimum
    # hamming over the doc's distinct token signatures. Grouping is by
    # TERM (not signature): two query terms whose signatures collide
    # still contribute separately, exactly like real per-token vectors.
    pair = cands.join(
        F.broadcast(
            qterms.select("query_id", F.col("term").alias("_qt"), "qsig")
        ),
        on="query_id",
    ).join(dterms.select("doc_id", "dsig"), on="doc_id")
    ham = F.expr("bit_count(qsig ^ dsig)").cast("bigint")
    per_qtok = (
        pair.withColumn("_h", ham)
        .groupBy("query_id", "doc_id", "match_terms", "_qt")
        .agg(F.min("_h").alias("_minh"))
    )
    scored = per_qtok.groupBy("query_id", "doc_id", "match_terms").agg(
        F.sum(F.lit(sig_bits) - 2 * F.col("_minh"))
        .cast("bigint")
        .alias("score_units")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_units").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "match_terms", "score_units", "rank")
    )
