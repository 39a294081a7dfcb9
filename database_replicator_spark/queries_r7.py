"""Round-7 query-surface additions: SemDeDup-style semantic dedup over
the embedding table, a quality-threshold calibration sweep, a per-source
pipeline-attrition funnel, the matryoshka prescreen → exact-rerank
serving composition, CCNet perplexity terciles, and the leakage-safe
cluster-keyed train/val/test split.

These deepen the LLM-data-pipeline tier (corpus curation + embedding
serving); the replication surface is complete per SURVEY.md §2.
Determinism follows the house rules in queries.py — integer arithmetic
until one final identical double op per side, 6-dp-rounded cosines with
id tiebreaks, identical aliases.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import query
from .queries_llm import _DOT_SQL, _NORM_SQL, _TOKS_SQL, _UNIT_SQL
from .sources.catalog import load_table

def _sq8_codebook(emb: DataFrame, sf_dir: str, dim: int = 64):
    """Train the SQ8 codebook (mn, mx — 2·dim doubles) from the corpus.

    Every invocation trains from scratch: precompute-once-offline is a
    deployment story told through the operators' explicit ``codebook=``
    parameter (pass a stored artifact), never through process-level
    state keyed on the data path (r13 verdict: such a memo survives the
    bench's clearCache() and turns min-of-N timings into memo-warm
    numbers)."""
    from .operators.similarity import sq8_train

    return sq8_train(emb, "vec_id", "embedding", dim=dim)


@query(
    "embedding_semantic_dedup",
    oracle=f"""
    WITH units AS (
      SELECT vec_id, {_UNIT_SQL.format(v='embedding')} AS unit FROM embeddings
    ),
    cents AS (SELECT vec_id AS cid, unit AS cvec FROM units WHERE vec_id < 16),
    assign AS (
      SELECT vec_id, unit, cid FROM (
        SELECT u.vec_id, u.unit, c.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY u.vec_id
                 ORDER BY round({_DOT_SQL.format(a='u.unit', b='c.cvec')}, 6)
                            DESC,
                          c.cid ASC) AS rn
        FROM units u CROSS JOIN cents c
      ) WHERE rn = 1
    ),
    dups AS (
      SELECT a.vec_id, MIN(b.vec_id) AS dup_of
      FROM assign a JOIN assign b
        ON a.cid = b.cid AND b.vec_id < a.vec_id
       AND round({_DOT_SQL.format(a='a.unit', b='b.unit')}, 6) >= 0.4
      GROUP BY a.vec_id
    )
    SELECT a.vec_id, a.cid,
           COALESCE(d.dup_of, -1) AS dup_of,
           d.dup_of IS NOT NULL AS is_dup
    FROM assign a LEFT JOIN dups d ON a.vec_id = d.vec_id
    """,
)
def embedding_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): coarse-quantize
    the embedding corpus into cells, then inside each cell drop every
    vector whose 6-dp cosine to a lower-id cell member reaches τ = 0.4 —
    semantic near-duplicates that no lexical tier can see (paraphrases,
    translations, re-encodings). ``dup_of`` names the smallest qualifying
    lower id (-1 for kept rows): the deterministic keep-lowest-id
    representative rule, identical in both engines.

    Plan (operators/similarity.semantic_dedup): map-only cell assignment
    (one batch×nlist BLAS matmul per Arrow batch), ONE shuffle on the
    cell id, one |cell|×dim matmul per cell — clustering bounds the
    quadratic exactly as the paper prescribes (50k cells over LAION);
    nothing is all-pairs across the corpus. The gate's sample quantizer
    (lowest-16-id unit vectors) keeps every stage SQL-reproducible;
    production swaps trained/persisted centroids without changing the
    plan shape, same contract as similarity_ivf_topk."""
    from .operators.similarity import semantic_dedup

    emb = load_table(spark, sf_dir, "embeddings")
    out = semantic_dedup(emb, tau=0.4, nlist=16)
    return out.select(
        "vec_id", "cid", "dup_of", (~F.col("kept")).alias("is_dup")
    )


@query(
    "doc_quality_threshold_sweep",
    oracle="""
    WITH c AS (
      SELECT doc_id,
             length(text) AS n_chars_m,
             len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
             len(regexp_extract_all(text, '[.!?,;:]')) AS n_punct,
             length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
             len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                 x -> x IN ('the','a','of','and','to','in','is','it','for','on')))
               AS n_stop
      FROM documents
    ),
    s AS (
      SELECT doc_id, n_tokens,
             least((n_alpha / greatest(n_tokens, 1)) / 8.0, 1.0) * 0.4
             + least((n_stop / greatest(n_tokens, 1)) * 5.0, 1.0) * 0.4
             + least((n_punct / greatest(n_chars_m, 1)) * 20.0, 1.0) * 0.2 AS q
      FROM c
    ),
    b AS (
      SELECT CAST(floor(q * 10) AS BIGINT) AS bin,
             CAST(COUNT(*) AS BIGINT) AS docs,
             CAST(SUM(n_tokens) AS BIGINT) AS toks
      FROM s GROUP BY 1
    ),
    grid AS (SELECT CAST(k AS BIGINT) AS k FROM range(0, 10) t(k)),
    tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total FROM s)
    SELECT CAST(k AS DOUBLE) / 10 AS threshold,
           CAST(COALESCE(SUM(CASE WHEN bin >= k THEN docs END), 0) AS BIGINT)
             AS n_docs,
           CAST(COALESCE(SUM(CASE WHEN bin >= k THEN toks END), 0) AS BIGINT)
             AS n_tokens_retained,
           CAST(COALESCE(SUM(CASE WHEN bin >= k THEN toks END), 0) AS DOUBLE)
             / MAX(total) AS token_share
    FROM grid CROSS JOIN tot LEFT JOIN b ON true
    GROUP BY k
    """,
)
def doc_quality_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-calibration curve: documents and tokens retained at each
    quality-score threshold 0.0, 0.1, …, 0.9 — the table a pipeline
    operator reads to pick the threshold that meets a token budget
    ("what does tightening quality from 0.5 to 0.6 cost in tokens?").

    Plan: the scale-shaped sweep is NOT a 10× fanout of the corpus —
    each document maps once into its score decile bin (one scan, one
    tiny groupBy), and the per-threshold totals are descending
    cumulative sums over the ≤10-row bin relation, joined to the 10-row
    threshold grid (a broadcast nested loop over bounded literals).
    Both engines compute the score with identical fixed-order double
    arithmetic (the doc_quality contract), so binning agrees."""
    from .operators.textops import quality_components, quality_score_expr

    docs = load_table(spark, sf_dir, "documents")
    s = quality_components(docs).select(
        "doc_id", "n_tokens", quality_score_expr().alias("q")
    )
    b = s.groupBy(
        F.floor(F.col("q") * 10).cast("bigint").alias("bin")
    ).agg(
        F.count(F.lit(1)).alias("docs"), F.sum("n_tokens").alias("toks")
    )
    grid = spark.range(0, 10).select(F.col("id").alias("k"))
    tot = s.agg(F.sum("n_tokens").alias("total"))
    return (
        grid.crossJoin(F.broadcast(tot))
        .join(F.broadcast(b), F.lit(True), how="left")
        .groupBy("k", "total")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("bin") >= F.col("k"), F.col("docs"))),
                F.lit(0),
            ).alias("n_docs"),
            F.coalesce(
                F.sum(F.when(F.col("bin") >= F.col("k"), F.col("toks"))),
                F.lit(0),
            ).alias("n_tokens_retained"),
        )
        .select(
            (F.col("k").cast("double") / 10).alias("threshold"),
            "n_docs",
            "n_tokens_retained",
            (
                F.col("n_tokens_retained").cast("double") / F.col("total")
            ).alias("token_share"),
        )
    )


@query(
    "corpus_attrition_funnel",
    oracle=f"""
    WITH c AS (
      SELECT doc_id, source,
             md5({_NORM_SQL}) AS fp,
             length(text) AS n_chars_m,
             len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
             len(regexp_extract_all(text, '[.!?,;:]')) AS n_punct,
             length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
             len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                 x -> x IN ('the','a','of','and','to','in','is','it','for','on')))
               AS n_stop
      FROM documents
    ),
    flagged AS (
      SELECT doc_id, source, fp,
             CASE WHEN n_tokens > 0 AND n_stop * 1000 >= n_tokens * 80
                  THEN 1 ELSE 0 END AS lang_ok,
             CASE WHEN least((n_alpha / greatest(n_tokens, 1)) / 8.0, 1.0) * 0.4
                       + least((n_stop / greatest(n_tokens, 1)) * 5.0, 1.0) * 0.4
                       + least((n_punct / greatest(n_chars_m, 1)) * 20.0, 1.0) * 0.2
                       >= 0.5
                  THEN 1 ELSE 0 END AS q_ok
      FROM c
    ),
    keepers AS (
      SELECT MIN(doc_id) AS keep_id FROM flagged
      WHERE lang_ok = 1 AND q_ok = 1
      GROUP BY fp
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_in,
           CAST(SUM(lang_ok) AS BIGINT) AS n_lang,
           CAST(SUM(lang_ok * q_ok) AS BIGINT) AS n_quality,
           CAST(SUM(CASE WHEN keep_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_unique,
           CAST(SUM(CASE WHEN keep_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS retention
    FROM flagged LEFT JOIN keepers ON flagged.doc_id = keepers.keep_id
    GROUP BY source
    """,
)
def corpus_attrition_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source pipeline-attrition report: how many documents each
    source contributes at every curation tier — ingested → language-ID
    pass → quality pass (score ≥ 0.5) → exact-dedup survivor — plus the
    end-to-end retention rate. The first table a corpus build prints,
    and the one that catches a source whose crawl went bad (retention
    collapses at one tier).

    Tier semantics: dedup runs on the lang+quality survivors (pipeline
    order), the survivor of each fingerprint group is the minimum
    doc_id, and the surviving row is attributed to ITS source. All tier
    predicates are the gated building blocks (lang_id_expr's integer
    per-mille rule, the doc_quality fixed-order double score,
    fingerprint_expr's md5-of-normalized-text).

    Plan: one scan computes every per-doc flag map-side; the dedup tier
    is one fingerprint-keyed aggregate of the filtered subset joined
    back on doc_id (uniform keys); the report is one source-keyed
    aggregate. No fanout, no window."""
    from .operators.textops import (
        fingerprint_expr,
        lang_id_expr,
        quality_components,
        quality_score_expr,
    )

    docs = load_table(spark, sf_dir, "documents")
    flagged = quality_components(docs).select(
        "doc_id",
        "source",
        fingerprint_expr(F.col("text")).alias("fp"),
        (lang_id_expr(F.col("text")) == "en").cast("int").alias("lang_ok"),
        (quality_score_expr() >= 0.5).cast("int").alias("q_ok"),
    )
    keepers = (
        flagged.filter((F.col("lang_ok") == 1) & (F.col("q_ok") == 1))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_id"))
        .select("keep_id")
    )
    survived = F.when(F.col("keep_id").isNotNull(), 1).otherwise(0)
    return (
        flagged.join(
            keepers, flagged.doc_id == keepers.keep_id, how="left"
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_in"),
            F.sum("lang_ok").alias("n_lang"),
            F.sum(F.col("lang_ok") * F.col("q_ok")).alias("n_quality"),
            F.sum(survived).alias("n_unique"),
            (
                F.sum(survived).cast("double") / F.count(F.lit(1))
            ).alias("retention"),
        )
    )


@query(
    "embedding_matryoshka_rerank",
    oracle=f"""
    WITH sliced AS (
      SELECT vec_id, (embedding)[1:16] AS emb FROM embeddings
    ),
    prefix_units AS (
      SELECT vec_id, {_UNIT_SQL.format(v='emb')} AS unit FROM sliced
    ),
    full_units AS (
      SELECT vec_id, {_UNIT_SQL.format(v='embedding')} AS unit
      FROM embeddings
    ),
    pq AS (SELECT vec_id AS query_id, unit AS qvec FROM prefix_units
           WHERE vec_id < 5),
    prescreen AS (
      SELECT query_id, corpus_id FROM (
        SELECT pq.query_id, c.vec_id AS corpus_id,
               ROW_NUMBER() OVER (
                 PARTITION BY pq.query_id
                 ORDER BY round({_DOT_SQL.format(a='c.unit', b='pq.qvec')}, 6)
                            DESC,
                          c.vec_id ASC) AS prank
        FROM prefix_units c JOIN pq ON c.vec_id != pq.query_id
      ) WHERE prank <= 25
    ),
    fq AS (SELECT vec_id AS query_id, unit AS qvec FROM full_units
           WHERE vec_id < 5),
    rescored AS (
      SELECT p.query_id, p.corpus_id,
             round({_DOT_SQL.format(a='c.unit', b='fq.qvec')}, 6) AS cosine
      FROM prescreen p
      JOIN full_units c ON c.vec_id = p.corpus_id
      JOIN fq ON fq.query_id = p.query_id
    )
    SELECT query_id, corpus_id, cosine, rank FROM (
      SELECT query_id, corpus_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, corpus_id ASC) AS rank
      FROM rescored
    ) WHERE rank <= 10
    """,
)
def embedding_matryoshka_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full matryoshka SERVING composition (Kusupati et al. 2022):
    coarse candidate sweep on the re-normalized 16-dim prefix (4× less
    index to scan) → exact full-dimension rerank of the 25 survivors →
    top-10. This is the adaptive-dimension pattern production retrieval
    runs — embedding_matryoshka_topk gates the prefix pass alone; this
    gate proves the prescreen + rerank composition end to end, exactly
    the ADC-prescreen-then-exact-rerank shape of similarity_pq_topk.

    Plan: two topk_blas passes — the prefix pass scans the corpus once
    (per-batch local candidate cut, shuffle O(tasks×Q×25)); the rerank
    joins the 25×Q survivor ids back to full vectors (uniform key) and
    rescores that bounded set. The corpus is never scanned at full
    dimension."""
    from .operators.similarity import prefix_rerank_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return prefix_rerank_topk(
        emb, emb.filter(F.col("vec_id") < 5), prefix_dim=16,
        candidates=25, k=10,
    )


@query(
    "corpus_perplexity_terciles",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKS_SQL}) AS token FROM documents
    ),
    vocab AS (SELECT token, COUNT(*) AS c FROM toks GROUP BY token),
    totals AS (SELECT SUM(c) AS n_total, COUNT(*) AS v_size FROM vocab),
    scored AS (
      SELECT t.doc_id,
             CAST(round(ln((v.c + 1) / (tt.n_total + tt.v_size)), 6)
                  AS DECIMAL(28,12)) AS lp
      FROM toks t JOIN vocab v ON t.token = v.token CROSS JOIN totals tt
    ),
    doc AS (
      SELECT doc_id, COUNT(*) AS n_toks,
             CAST(CAST(SUM(lp) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_lp
      FROM scored GROUP BY doc_id
    ),
    ranked AS (
      SELECT d.doc_id, d.n_toks, d.avg_lp, s.source,
             NTILE(3) OVER (ORDER BY d.avg_lp DESC, d.doc_id ASC) AS tercile
      FROM doc d JOIN documents s ON s.doc_id = d.doc_id
    )
    SELECT source, tercile,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
           MIN(avg_lp) AS min_logprob,
           MAX(avg_lp) AS max_logprob
    FROM ranked GROUP BY source, tercile
    """,
)
def corpus_perplexity_terciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's head/middle/tail quality bucketing (Wenzek et al. 2020):
    rank every document by its corpus-trained LM score (higher avg
    logprob = less perplexing = head) and cut the ranking into NTILE(3)
    terciles; report each source's composition per tercile — the table
    CCNet uses to decide which bucket of each domain to keep. Boundaries
    are MIN/MAX per cell (order-independent), never cross-doc double
    means.

    Plan: the LM score is the gated doc_unigram_logprob computation
    (decimal-exact per-token logprobs); the GLOBAL ranking runs through
    operators/cumsum.grouped_rank — the two-phase bucketed rank, no
    single-task whole-corpus sort — with the tercile derived by the
    exact integer ntile_expr, so this composition IS the 100 TB shape
    (the naive NTILE window would collocate the corpus in one task).
    The plan decision is sized once on the docs relation (the RFM
    rank_mode idiom)."""
    from .operators.corpus import unigram_logprob
    from .operators.cumsum import SMALL_THRESHOLD, grouped_rank, ntile_expr

    docs = load_table(spark, sf_dir, "documents")
    scored = unigram_logprob(docs).select(
        "doc_id",
        F.col("n_tokens").alias("n_toks"),
        F.col("avg_logprob").alias("avg_lp"),
    ).join(docs.select("doc_id", "source"), on="doc_id")
    n_docs = docs.count()
    rank_mode = "single" if n_docs <= SMALL_THRESHOLD else "distributed"
    ranked = grouped_rank(
        scored, [], "avg_lp", "doc_id", out_col="_r",
        ascending=False, mode=rank_mode,
    )
    return (
        ranked.crossJoin(
            F.broadcast(scored.agg(F.count(F.lit(1)).alias("_n")))
        )
        .withColumn("tercile", ntile_expr(F.col("_r"), F.col("_n"), 3))
        .groupBy("source", "tercile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").alias("n_tokens"),
            F.min("avg_lp").alias("min_logprob"),
            F.max("avg_lp").alias("max_logprob"),
        )
    )


def _leakage_split_oracle() -> str:
    from .queries_pipeline import (
        _H60,
        _SPLIT_SEED,
        _VERIFIED_PAIRS_SQL,
        _split_case_sql,
    )

    key = _H60.format(
        expr=f"'{_SPLIT_SEED}:' || CAST(cluster_id AS VARCHAR)"
    )
    return f"""
    WITH RECURSIVE pairs AS ({_VERIFIED_PAIRS_SQL}),
    edges AS (
      SELECT doc1 AS src, doc2 AS dst FROM pairs
      UNION ALL
      SELECT doc2, doc1 FROM pairs
    ),
    reach AS (
      SELECT doc_id AS node, doc_id AS m FROM documents
      UNION
      SELECT r.node, e.dst FROM reach r JOIN edges e ON e.src = r.m
    ),
    comp AS (
      SELECT node AS doc_id, MIN(m) AS cluster_id FROM reach GROUP BY node
    ),
    keyed AS (
      SELECT doc_id, cluster_id, {key} AS split_key FROM comp
    )
    SELECT doc_id, cluster_id, {_split_case_sql()} AS split FROM keyed
    """


def _neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, cluster_id) near-dup clusters — the dedup_components
    construction (LSH candidates → verified Jaccard ≥ 0.2 pairs →
    iterative hash-min CC), shared by the leakage-safe split and the
    cluster-size histogram gates."""
    from .operators.corpus import connected_components
    from .operators.dedup import (
        doc_shingles,
        jaccard_pairs,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    docs = load_table(spark, sf_dir, "documents")
    # checkpointed: sh feeds the signature pipeline and the verifier's
    # semi-join (r13: one shingle explode instead of two)
    sh = doc_shingles(docs).localCheckpoint()
    sig = minhash_signatures(sh, num_hashes=12).cache()
    cand = lsh_candidate_pairs(sig)
    pairs = jaccard_pairs(sh, candidates=cand, threshold=0.2)
    return connected_components(
        docs.select("doc_id"), pairs,
        id_col="doc_id", src_col="doc1", dst_col="doc2",
    ).select(F.col("node").alias("doc_id"), "cluster_id")


@query("corpus_leakage_safe_split", oracle=_leakage_split_oracle())
def corpus_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test assignment: the split key is the
    near-dup CLUSTER id, not the document id, so two near-duplicates can
    never land on opposite sides of the split — the evaluation-leakage
    failure mode a per-doc split invites the moment dedup is less than
    perfect (and any sub-threshold near-dup survives dedup by design).
    Composition of two gated stages: the verified-Jaccard near-dup
    clusters (dedup_components' construction) feed dataset_split keyed
    on cluster_id with the standard 90/5/5 fractions and seed — a doc's
    split stays stable under corpus appends unless its cluster merges,
    which is exactly when it MUST be allowed to move.

    Plan: the cluster stage is the dedup_components pipeline (LSH
    candidates → verified pairs → iterative hash-min CC); the split
    itself adds one map-side hash and zero shuffles."""
    from .operators.corpus import dataset_split
    from .queries_pipeline import _SPLIT_FRACTIONS, _SPLIT_SEED

    comp = _neardup_clusters(spark, sf_dir)
    return dataset_split(
        comp, _SPLIT_FRACTIONS, id_col="cluster_id", seed=_SPLIT_SEED
    ).select("doc_id", "cluster_id", "split")


def _cluster_hist_oracle() -> str:
    from .queries_pipeline import _VERIFIED_PAIRS_SQL

    return f"""
    WITH RECURSIVE pairs AS ({_VERIFIED_PAIRS_SQL}),
    edges AS (
      SELECT doc1 AS src, doc2 AS dst FROM pairs
      UNION ALL
      SELECT doc2, doc1 FROM pairs
    ),
    reach AS (
      SELECT doc_id AS node, doc_id AS m FROM documents
      UNION
      SELECT r.node, e.dst FROM reach r JOIN edges e ON e.src = r.m
    ),
    comp AS (
      SELECT node AS doc_id, MIN(m) AS cluster_id FROM reach GROUP BY node
    ),
    sizes AS (
      SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
      FROM comp GROUP BY cluster_id
    )
    SELECT cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(SUM(cluster_size) AS BIGINT) AS n_docs
    FROM sizes GROUP BY cluster_size
    """


@query("corpus_dedup_cluster_hist", oracle=_cluster_hist_oracle())
def corpus_dedup_cluster_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster-size histogram — the standard corpus-dedup
    diagnostic (duplicate-cluster size distributions are heavy-tailed in
    web corpora; Lee et al. 2022 "Deduplicating Training Data Makes
    Language Models Better" reports exactly this shape). One row per
    cluster size with the cluster count and total docs at that size;
    singletons (size 1) measure the never-duplicated mass, the tail
    rows are the boilerplate/mirror clusters a curation pass should
    inspect before choosing keep-one vs drop-all.

    Plan: the cluster stage is the shared dedup_components pipeline;
    the histogram adds two key-uniform aggregations (cluster_id, then
    size) — both with map-side partial combine, no new hazards."""
    comp = _neardup_clusters(spark, sf_dir)
    sizes = comp.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).alias("n_clusters"),
        F.sum("cluster_size").alias("n_docs"),
    )


def _source_overlap_oracle() -> str:
    from .queries_llm import _MINHASH_BASE, _MINHASH_MINS, _SHINGLES_CTE

    src_mins = ",\n       ".join(
        f"MIN(h{s}) AS h{s}" for s in range(12)
    )
    match_sum = " + ".join(
        f"CASE WHEN a.h{s} = b.h{s} THEN 1 ELSE 0 END" for s in range(12)
    )
    return f"""
    WITH {_SHINGLES_CTE},
    base AS ({_MINHASH_BASE}),
    sig AS (
      SELECT doc_id,
       {_MINHASH_MINS}
      FROM base GROUP BY doc_id
    ),
    ssig AS (
      SELECT d.source,
       {src_mins}
      FROM sig JOIN documents d USING (doc_id)
      GROUP BY d.source
    )
    SELECT a.source AS source1, b.source AS source2,
           CAST(({match_sum}) AS BIGINT) AS matching_slots,
           ROUND(({match_sum}) / 12.0, 6) AS jaccard_est
    FROM ssig a JOIN ssig b ON a.source < b.source
    """


@query("corpus_source_overlap", oracle=_source_overlap_oracle())
def corpus_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source-level content overlap, estimated from MinHash
    signatures of each source's shingle UNION — the "how much does crawl
    A duplicate crawl B" question a mixture designer asks BEFORE paying
    for a doc-level cross-source dedup. The union signature is free
    given the per-doc signatures (min is associative: the source min of
    per-doc mins IS the union min), so the estimate costs one tiny
    aggregation over a table that dedup_minhash_lsh already builds, and
    the matching-slot fraction is an unbiased Jaccard estimator (Broder
    1997) between full source contents.

    Plan: per-doc signatures (one shuffle over shingles, the dedup
    substrate), a doc_id-keyed join to the source map, a groupBy over
    ~S sources (map-side combine makes the shuffle S rows per task),
    then an S×S broadcast self-join — no all-pairs anything at doc
    granularity. At 100 TB the per-source state is 12 int64s regardless
    of corpus size."""
    from .operators.dedup import doc_shingles, minhash_signatures

    docs = load_table(spark, sf_dir, "documents")
    sh = doc_shingles(docs)
    sig = minhash_signatures(sh, num_hashes=12)
    ssig = (
        sig.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(*[
            F.min(F.col("sig")[s]).alias(f"h{s}") for s in range(12)
        ])
    )
    a, b = ssig.alias("a"), ssig.alias("b")
    matching = sum(
        (F.col(f"a.h{s}") == F.col(f"b.h{s}")).cast("int")
        for s in range(12)
    )
    return (
        a.join(F.broadcast(b), F.col("a.source") < F.col("b.source"))
        .select(
            F.col("a.source").alias("source1"),
            F.col("b.source").alias("source2"),
            matching.cast("bigint").alias("matching_slots"),
            F.round(matching.cast("double") / F.lit(12.0), 6).alias(
                "jaccard_est"
            ),
        )
    )


@query(
    "supplier_balance_outliers",
    oracle="""
    WITH ranked AS (
      SELECT s_nationkey, s_suppkey, s_acctbal,
             ROW_NUMBER() OVER (PARTITION BY s_nationkey
                                ORDER BY s_acctbal) AS rn,
             COUNT(*) OVER (PARTITION BY s_nationkey) AS n
      FROM supplier
    ),
    med AS (
      SELECT s_nationkey, MAX(n) AS n,
             MAX(CASE WHEN rn = (n + 1) // 2 THEN s_acctbal END) AS med
      FROM ranked GROUP BY s_nationkey
    ),
    dev AS (
      SELECT s.s_nationkey, s.s_suppkey,
             ABS(s.s_acctbal - m.med) AS abs_dev, m.med, m.n
      FROM supplier s JOIN med m USING (s_nationkey)
    ),
    dranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY s_nationkey
                                   ORDER BY abs_dev) AS drn
      FROM dev
    ),
    mad AS (
      SELECT s_nationkey,
             MAX(CASE WHEN drn = (n + 1) // 2 THEN abs_dev END) AS mad
      FROM dranked GROUP BY s_nationkey
    )
    SELECT d.s_nationkey,
           MAX(d.n) AS n_suppliers,
           MAX(d.med) AS med_acctbal,
           MAX(x.mad) AS mad_acctbal,
           CAST(SUM(CASE WHEN x.mad > 0 AND d.abs_dev / x.mad >= 1.5
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
           ROUND(MAX(CASE WHEN x.mad > 0 THEN d.abs_dev / x.mad END), 6)
             AS max_robust_z
    FROM dev d JOIN mad x USING (s_nationkey)
    GROUP BY d.s_nationkey
    """,
)
def supplier_balance_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-nation account-balance outlier report: median/MAD
    (median absolute deviation) instead of mean/stddev, so a single
    corrupted balance cannot mask itself by inflating the spread — the
    data-quality screen a replication verify pass runs on a dimension
    table before trusting it. Flags |x − med| / MAD ≥ 1.5 (uniform
    balances top out near 2, so the report stays informative without a
    distributional assumption) and reports the per-nation max.

    Both quantiles are discrete rank-⌈n/2⌉ picks via
    operators/cumsum.positional_quantiles — the two-phase bucketed
    ranking, no single-task whole-nation sorts — chained: median first,
    then the median OF absolute deviations from it. All arithmetic
    after the picks is one identical double op per side + round(…, 6)
    per the cross-engine rules in queries.py."""
    from .operators.cumsum import SMALL_THRESHOLD, positional_quantiles

    sup = load_table(spark, sf_dir, "supplier")
    # rank_mode idiom: size the input ONCE and pass the mode to both
    # quantile passes (mode="auto" would re-count per call)
    rank_mode = (
        "single" if sup.count() <= SMALL_THRESHOLD else "distributed"
    )
    med = positional_quantiles(
        sup, ["s_nationkey"], "s_acctbal", "s_suppkey",
        fractions=[(1, 2, "med")], mode=rank_mode,
    )
    dev = sup.join(
        F.broadcast(med.select("s_nationkey", "med", "n")), "s_nationkey"
    ).withColumn("abs_dev", F.abs(F.col("s_acctbal") - F.col("med")))
    mad = positional_quantiles(
        dev.select("s_nationkey", "s_suppkey", "abs_dev"),
        ["s_nationkey"], "abs_dev", "s_suppkey",
        fractions=[(1, 2, "mad")], mode=rank_mode,
    ).select("s_nationkey", "mad")
    z = F.when(
        F.col("mad") > 0, F.col("abs_dev") / F.col("mad")
    )
    return (
        dev.join(F.broadcast(mad), "s_nationkey")
        .groupBy("s_nationkey")
        .agg(
            F.max("n").alias("n_suppliers"),
            F.max("med").alias("med_acctbal"),
            F.max("mad").alias("mad_acctbal"),
            F.sum(
                F.when(z >= 1.5, 1).otherwise(0)
            ).alias("n_flagged"),
            F.round(F.max(z), 6).alias("max_robust_z"),
        )
    )


@query(
    "events_activity_gini",
    oracle="""
    WITH counts AS (
      SELECT user_id, COUNT(*) AS x FROM events GROUP BY user_id
    ),
    ranked AS (
      SELECT user_id, x,
             ROW_NUMBER() OVER (ORDER BY x, user_id) AS r
      FROM counts
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(r * x) AS BIGINT) AS w
      FROM ranked
    ),
    tops AS (
      SELECT
        CAST(SUM(CASE WHEN r > (SELECT n FROM s) - 1 THEN x ELSE 0 END)
             AS BIGINT) AS t1,
        CAST(SUM(CASE WHEN r > (SELECT n FROM s) - 10 THEN x ELSE 0 END)
             AS BIGINT) AS t10
      FROM ranked
    )
    SELECT n AS n_users, sx AS total_events,
           ROUND(CAST(2 * w - (n + 1) * sx AS DOUBLE)
                 / CAST(n * sx AS DOUBLE), 6) AS gini,
           ROUND(CAST(t1 AS DOUBLE) / CAST(sx AS DOUBLE), 6) AS top1_share,
           ROUND(CAST(t10 AS DOUBLE) / CAST(sx AS DOUBLE), 6) AS top10_share
    FROM s, tops
    """,
)
def events_activity_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew diagnostic over the event stream: the Gini coefficient
    of per-user activity plus top-1/top-10 heavy-hitter shares — the
    numbers that tell you whether a user-keyed shuffle (sessionize,
    per-user windows, stateful streaming) will hot-spot BEFORE you run
    it, and whether salting is worth wiring in. Gini uses the exact
    rank formula G = (2·Σ r·xᵣ − (n+1)·Σx) / (n·Σx) over ascending
    ranks — tie-order-invariant (equal x within a tie group contribute
    x·Σr however ranks fall), integer arithmetic until one final double
    division per side.

    Plan: one map-side-combined count per user, then GLOBAL ranks via
    grouped_running_sum with empty group_cols — the two-phase bucketed
    path, so even a billion-user rank never single-task-sorts — and two
    scalar aggregates. Σ r·x stays inside int64 while n·Σx < 2^63
    (~1e9 users × ~1e9 events); beyond that move the two sums to
    decimal(38,0), same plan."""
    from .operators.cumsum import grouped_running_sum

    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("x"))
    ranked = grouped_running_sum(
        counts.withColumn("_one", F.lit(1)), [], "_one", "user_id",
        out_col="r", order_col="x", ascending=True,
    )
    n_df = counts.agg(F.count(F.lit(1)).alias("n"))
    j = ranked.crossJoin(F.broadcast(n_df))
    agg = j.agg(
        F.max("n").alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("r") * F.col("x")).alias("w"),
        F.sum(F.when(F.col("r") > F.col("n") - 1, F.col("x")).otherwise(0))
        .alias("t1"),
        F.sum(F.when(F.col("r") > F.col("n") - 10, F.col("x")).otherwise(0))
        .alias("t10"),
    )
    return agg.select(
        F.col("n").alias("n_users"),
        F.col("sx").alias("total_events"),
        F.round(
            (2 * F.col("w") - (F.col("n") + 1) * F.col("sx")).cast("double")
            / (F.col("n") * F.col("sx")).cast("double"),
            6,
        ).alias("gini"),
        F.round(F.col("t1").cast("double") / F.col("sx").cast("double"), 6)
        .alias("top1_share"),
        F.round(F.col("t10").cast("double") / F.col("sx").cast("double"), 6)
        .alias("top10_share"),
    )


@query(
    "embedding_cell_balance",
    oracle=f"""
    WITH units AS (
      SELECT vec_id, {_UNIT_SQL.format(v='embedding')} AS unit FROM embeddings
    ),
    cents AS (SELECT vec_id AS cid, unit AS cvec FROM units WHERE vec_id < 16),
    assign AS (
      SELECT vec_id, cid FROM (
        SELECT u.vec_id, c.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY u.vec_id
                 ORDER BY round({_DOT_SQL.format(a='u.unit', b='c.cvec')}, 6)
                            DESC,
                          c.cid ASC) AS rn
        FROM units u CROSS JOIN cents c
      ) WHERE rn = 1
    ),
    cells AS (
      SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_vecs FROM assign GROUP BY cid
    ),
    tot AS (SELECT CAST(SUM(n_vecs) AS BIGINT) AS total FROM cells)
    SELECT cid, n_vecs,
           ROUND(CAST(n_vecs AS DOUBLE) / CAST(total AS DOUBLE), 6) AS share,
           ROUND(CAST(n_vecs * 16 AS DOUBLE) / CAST(total AS DOUBLE), 6)
             AS hot_factor
    FROM cells, tot
    """,
)
def embedding_cell_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF cell-occupancy balance report: per-cell vector counts, corpus
    share, and hot factor (count ÷ uniform expectation) under the gated
    sample quantizer — the index-operations diagnostic behind every
    cell-keyed stage in this engine (ivf_topk's probe cost, SemDeDup's
    per-cell matmul memory, coverage sampling's strata). A hot_factor-k
    cell makes nprobe-hit queries k× slower and its dedup matmul k²×
    bigger, so this table is what decides a re-train / subsplit BEFORE a
    skewed cell becomes a straggler task at 100 TB.

    Plan: map-only cell assignment (one batch × nlist BLAS matmul per
    Arrow batch, operators/similarity.cell_assign), one ~nlist-row
    aggregate, and a 1-row broadcast for the total — no per-vector
    shuffle at all (the count agg is map-side-combined on cid)."""
    import numpy as np

    from .operators.similarity import cell_assign, collect_unit_matrix

    emb = load_table(spark, sf_dir, "embeddings")
    ids, mat = collect_unit_matrix(
        emb.filter(F.col("vec_id") < 16), "vec_id", "embedding"
    )
    cent = mat[np.argsort(ids)]
    assigned = cell_assign(emb, cent)
    cells = assigned.groupBy("cid").agg(F.count(F.lit(1)).alias("n_vecs"))
    tot = cells.agg(F.sum("n_vecs").alias("total"))
    return cells.crossJoin(F.broadcast(tot)).select(
        "cid",
        "n_vecs",
        F.round(
            F.col("n_vecs").cast("double") / F.col("total").cast("double"), 6
        ).alias("share"),
        F.round(
            (F.col("n_vecs") * 16).cast("double")
            / F.col("total").cast("double"),
            6,
        ).alias("hot_factor"),
    )


@query(
    "similarity_sq8_topk",
    oracle=f"""
    WITH units AS (
      SELECT vec_id, {_UNIT_SQL.format(v='embedding')} AS unit FROM embeddings
    ),
    dims AS (
      SELECT t.i, MIN(unit[t.i]) AS mn, MAX(unit[t.i]) AS mx
      FROM units, UNNEST(generate_series(1, 64)) AS t(i)
      GROUP BY t.i
    ),
    recon AS (
      SELECT u.vec_id, d.i,
             d.mn + (CASE WHEN d.mx > d.mn
                          THEN LEAST(FLOOR((u.unit[d.i] - d.mn)
                                           / (d.mx - d.mn) * 256), 255)
                          ELSE 0 END + 0.5) * ((d.mx - d.mn) / 256) AS xr
      FROM units u CROSS JOIN dims d
    ),
    rvecs AS (
      SELECT vec_id, list(xr ORDER BY i) AS runit FROM recon GROUP BY vec_id
    ),
    scored AS (
      SELECT q.vec_id AS query_id, r.vec_id AS corpus_id,
             round({_DOT_SQL.format(a='q.unit', b='r.runit')}, 6) AS score
      FROM units q CROSS JOIN rvecs r
      WHERE q.vec_id < 5 AND r.vec_id != q.vec_id
    )
    SELECT query_id, corpus_id, score, rank FROM (
      SELECT query_id, corpus_id, score,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY score DESC, corpus_id ASC) AS rank
      FROM scored
    ) WHERE rank <= 10
    """,
)
def similarity_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-quantized ANN (FAISS ScalarQuantizer QT_8bit shape): the
    corpus is served from a 1-byte-per-dimension code table — the
    memory-bandwidth lever between matryoshka prefixes (fewer dims) and
    PQ (sub-byte codes): 8× less scan IO than float64 with near-exact
    ranking at 64 dims. Train is one per-dim min/max aggregate (2·dim
    doubles of state at any corpus size), encode is map-only JVM
    arithmetic with the half-rounding-free floor-bin rule, and the scan
    reconstructs bin centers per Arrow batch, cuts to per-batch top-k
    candidates, and finishes with the exact bounded window
    (operators/similarity.sq8_train/sq8_encode/sq8_topk). The oracle
    replays train/encode/decode in SQL with the identical composition
    mn + (code + 0.5)·(mx − mn)/256 and the shared fold-order dot.

    r14: the codebook is trained from the corpus on every invocation
    (the r9-r13 per-sf_dir memo was deleted — it survived bench's
    clearCache() and skewed min-of-N timings); offline-trained serving
    is expressed by passing a stored artifact via ``codebook=``."""
    from .operators.similarity import sq8_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return sq8_topk(
        emb, emb.filter(F.col("vec_id") < 5), k=10,
        codebook=_sq8_codebook(emb, sf_dir),
    )


@query(
    "similarity_ivfsq_topk",
    oracle=f"""
    WITH units AS (
      SELECT vec_id, {_UNIT_SQL.format(v='embedding')} AS unit FROM embeddings
    ),
    cents AS (SELECT vec_id AS cid, unit AS cvec FROM units WHERE vec_id < 16),
    cells AS (
      SELECT u.vec_id, u.unit, c.cid,
             ROW_NUMBER() OVER (
               PARTITION BY u.vec_id
               ORDER BY round({_DOT_SQL.format(a='u.unit', b='c.cvec')}, 6)
                          DESC,
                        c.cid ASC) AS rn
      FROM units u CROSS JOIN cents c
    ),
    assign AS (SELECT vec_id, cid FROM cells WHERE rn = 1),
    probes AS (SELECT vec_id AS query_id, unit AS qvec_u, cid
               FROM cells WHERE rn <= 2 AND vec_id < 5),
    dims AS (
      SELECT t.i, MIN(unit[t.i]) AS mn, MAX(unit[t.i]) AS mx
      FROM units, UNNEST(generate_series(1, 64)) AS t(i)
      GROUP BY t.i
    ),
    recon AS (
      SELECT u.vec_id, d.i,
             d.mn + (CASE WHEN d.mx > d.mn
                          THEN LEAST(FLOOR((u.unit[d.i] - d.mn)
                                           / (d.mx - d.mn) * 256), 255)
                          ELSE 0 END + 0.5) * ((d.mx - d.mn) / 256) AS xr
      FROM units u CROSS JOIN dims d
    ),
    rvecs AS (
      SELECT vec_id, list(xr ORDER BY i) AS runit FROM recon GROUP BY vec_id
    ),
    scored AS (
      SELECT p.query_id, r.vec_id AS corpus_id,
             round({_DOT_SQL.format(a='p.qvec_u', b='r.runit')}, 6) AS score
      FROM probes p
      JOIN assign a ON a.cid = p.cid
      JOIN rvecs r ON r.vec_id = a.vec_id
      WHERE r.vec_id != p.query_id
    )
    SELECT query_id, corpus_id, score, rank FROM (
      SELECT query_id, corpus_id, score,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY score DESC, corpus_id ASC) AS rank
      FROM scored
    ) WHERE rank <= 10
    """,
)
def similarity_ivfsq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF+SQ8 ANN (the FAISS IVF16,SQ8 composition): coarse cells
    bound IO to nprobe/nlist of the code table, scalar 1-byte codes
    bound what a probed row costs — reconstruction is plain per-dim
    arithmetic in JVM expressions (no codebook gather), so unlike
    IVF+PQ the query side has zero Python stages after the index build.
    Gated at the SQL-reproducible settings (sample quantizer, floor-bin
    codes, shared fold-order dot); the trained-centroid path is
    recall-audited instead (RECALL.md).

    One driver-side amortization (r8): the sample-quantizer collect
    (vec_id < 16) is a superset of the query set (vec_id < 5), so ONE
    collect feeds both the centroid matrix and the query matrix — one
    fewer job in the three-phase gate, output identical (tested against
    the collect-twice path).

    The SQ8 codebook — a 2·dim-double artifact fully determined by the
    corpus — is trained per invocation and handed to the operator via
    its ``codebook=`` parameter (r14: the r9 per-sf_dir memo was
    deleted as cross-run state; offline training is a deployment story
    told by passing a stored artifact explicitly). Output identity of
    codebook reuse is pinned by tests/test_queries_r9.py."""
    import numpy as np

    from .operators.similarity import collect_unit_matrix, ivf_sq8_topk

    emb = load_table(spark, sf_dir, "embeddings")
    ids, mat = collect_unit_matrix(
        emb.filter(F.col("vec_id") < 16), "vec_id", "embedding"
    )
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    qsel = ids < 5
    return ivf_sq8_topk(
        emb, emb.filter(F.col("vec_id") < 5), k=10, nlist=16, nprobe=2,
        centroids=mat, query_matrix=(ids[qsel], mat[qsel]),
        codebook=_sq8_codebook(emb, sf_dir, dim=mat.shape[1]),
    )


def _cms_oracle() -> str:
    from .functions.hashing import hash60_sql, hash60_tail_sql
    from .operators.sketch import CMS_PRIME

    return f"""
    WITH keys AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY event_type
    ),
    hashed AS (
      SELECT event_type, x,
             {hash60_sql('event_type')} AS h1,
             {hash60_tail_sql('event_type')} % {CMS_PRIME} AS h2m
      FROM keys
    ),
    coords AS (
      SELECT event_type, x, t.j,
             ((h1 + t.j * h2m) % {CMS_PRIME}) % 64 AS col
      FROM hashed, UNNEST([0, 1, 2, 3]) AS t(j)
    ),
    counters AS (
      SELECT j, col, CAST(SUM(x) AS BIGINT) AS c
      FROM coords GROUP BY j, col
    ),
    est AS (
      SELECT co.event_type, MIN(ct.c) AS cms_estimate
      FROM coords co JOIN counters ct ON ct.j = co.j AND ct.col = co.col
      GROUP BY co.event_type
    )
    SELECT k.event_type, k.x AS exact_count, e.cms_estimate,
           CAST(e.cms_estimate - k.x AS BIGINT) AS overestimate
    FROM keys k JOIN est e USING (event_type)
    """


@query("events_heavy_hitters_cms", oracle=_cms_oracle())
def events_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch frequency estimates for the event-type keys,
    compared against exact counts (Cormode & Muthukrishnan 2005). The
    sketch is d·w = 4×64 longs of state at ANY input size, merges across
    partitions/epochs by elementwise sum (EXACT linearity — asserted in
    tests, not approximate), and answers point queries with one-sided
    error: estimate ≥ truth always, over by ~N/w with probability
    1 − 2⁻ᵈ. This is what per-key change-frequency monitoring stores at
    unbounded key cardinality, where the exact per-key count relation
    (the reference's verify counters) would itself be the big table.

    Plan: keys pre-aggregate FIRST (map-side combine), the 4-way hash
    fanout explodes distinct keys only, and the counter relation is ≤256
    cells — broadcast back for the query join. The oracle replays the
    identical Carter-Wegman family over one md5 digest per key."""
    from .operators.sketch import cms_counters, cms_estimate

    ev = load_table(spark, sf_dir, "events")
    keys = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("exact_count")
    )
    counters = cms_counters(ev, "event_type", depth=4, width=64)
    est = cms_estimate(
        counters, keys.select("event_type"), "event_type",
        depth=4, width=64,
    )
    return keys.join(est, "event_type").select(
        "event_type",
        "exact_count",
        "cms_estimate",
        (F.col("cms_estimate") - F.col("exact_count")).alias("overestimate"),
    )


def _kmv_overlap_oracle() -> str:
    from .functions.hashing import hash60_sql
    from .operators.sketch import HASH60_SPAN

    h = hash60_sql("CAST(o_custkey AS VARCHAR)")
    union_raw = (
        f"CASE WHEN np < 256 THEN CAST(np AS DOUBLE) "
        f"ELSE 255.0 * CAST({HASH60_SPAN} AS DOUBLE) / theta END"
    )
    return f"""
    WITH a_h AS (
      SELECT DISTINCT {h} AS h FROM orders WHERE year(o_orderdate) = 1995
    ),
    a_k AS (SELECT list(h ORDER BY h) AS l
            FROM (SELECT h FROM a_h ORDER BY h LIMIT 256)),
    b_h AS (
      SELECT DISTINCT {h} AS h FROM orders WHERE year(o_orderdate) = 1996
    ),
    b_k AS (SELECT list(h ORDER BY h) AS l
            FROM (SELECT h FROM b_h ORDER BY h LIMIT 256)),
    pooled AS (
      SELECT list_sort(list_distinct(a.l || b.l)) AS pool,
             a.l AS al, b.l AS bl
      FROM a_k a, b_k b
    ),
    staged AS (
      SELECT list_slice(pool, 1, 256) AS K,
             LEAST(256, len(pool)) AS kk,
             len(pool) AS np, al, bl
      FROM pooled
    ),
    calc AS (
      SELECT kk, np,
             len(list_intersect(list_intersect(K, al), bl)) AS m,
             CAST(K[kk] AS DOUBLE) AS theta
      FROM staged
    )
    SELECT CAST(kk AS BIGINT) AS k_used,
           CAST(m AS BIGINT) AS matching,
           ROUND(CAST(m AS DOUBLE) / CAST(kk AS DOUBLE), 6) AS jaccard_est,
           ROUND({union_raw}, 6) AS union_est,
           ROUND((CAST(m AS DOUBLE) / CAST(kk AS DOUBLE)) * ({union_raw}),
                 6) AS intersection_est
    FROM calc
    """


@query("orders_year_overlap_kmv", oracle=_kmv_overlap_oracle())
def orders_year_overlap_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-retention overlap between two order years estimated
    from STORED KMV sketches alone (Beyer et al. SIGMOD'07 multiset
    ops): Jaccard, union, and intersection distinct-count estimates
    from 2×256 longs of state — the "how many customers did these two
    periods share" answer that an exact COUNT(DISTINCT) would re-shuffle
    both periods' keys for. The estimator is exact below k (every hash
    is in the pool — the fixture's small scales take that branch; the
    bigger scales exercise the θ-threshold branch, so the gate covers
    both) and deterministic above it.

    Plan: each sketch is one mapInPandas partial + one k-bounded merge
    (operators/sketch.kmv_sketch); the set ops are array arithmetic on
    two 1-row relations (operators/sketch.kmv_set_ops) — nothing
    rescans orders."""
    from .operators.sketch import kmv_set_ops, kmv_sketch

    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        "o_custkey", F.year("o_orderdate").alias("_y")
    ).withColumn("_g", F.lit(1))
    a = kmv_sketch(
        base.filter(F.col("_y") == 1995), ["_g"], "o_custkey", k=256
    )
    b = kmv_sketch(
        base.filter(F.col("_y") == 1996), ["_g"], "o_custkey", k=256
    )
    return kmv_set_ops(a, b, k=256)


def _bloom_oracle() -> str:
    from .functions.hashing import hash60_sql, hash60_tail_sql
    from .operators.sketch import CMS_PRIME

    h1 = hash60_sql("CAST(o_custkey AS VARCHAR)")
    h2m = f"{hash60_tail_sql('CAST(o_custkey AS VARCHAR)')} % {CMS_PRIME}"
    return f"""
    WITH a_keys AS (
      SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995
    ),
    a_pos AS (
      SELECT DISTINCT ((h1 + t.j * h2m) % {CMS_PRIME}) % 1024 AS pos
      FROM (SELECT {h1} AS h1, {h2m} AS h2m FROM a_keys),
           UNNEST([0, 1, 2]) AS t(j)
    ),
    b_keys AS (
      SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    ),
    b_pos AS (
      SELECT o_custkey, ((h1 + t.j * h2m) % {CMS_PRIME}) % 1024 AS pos
      FROM (SELECT o_custkey, {h1} AS h1, {h2m} AS h2m FROM b_keys),
           UNNEST([0, 1, 2]) AS t(j)
    ),
    checks AS (
      SELECT b.o_custkey,
             CASE WHEN a.pos IS NOT NULL THEN 1 ELSE 0 END AS hit
      FROM b_pos b LEFT JOIN a_pos a USING (pos)
    ),
    passed AS (
      SELECT o_custkey FROM checks GROUP BY o_custkey HAVING MIN(hit) = 1
    ),
    members AS (
      SELECT o_custkey FROM b_keys
      WHERE o_custkey IN (SELECT o_custkey FROM a_keys)
    ),
    s AS (
      SELECT CAST((SELECT COUNT(*) FROM b_keys) AS BIGINT) AS n_probed,
             CAST((SELECT COUNT(*) FROM passed) AS BIGINT) AS n_pass,
             CAST((SELECT COUNT(*) FROM members) AS BIGINT) AS n_member
    )
    SELECT n_probed, n_pass, n_member,
           CAST(n_pass - n_member AS BIGINT) AS n_false_pos,
           ROUND(CAST(n_pass - n_member AS DOUBLE)
                 / CAST(n_probed - n_member AS DOUBLE), 6) AS fp_rate
    FROM s
    """


@query("orders_bloom_prefilter", oracle=_bloom_oracle())
def orders_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storable Bloom-filter pre-filter audit: build an m=1024, d=3
    filter over one year's customer keys, probe the next year's keys,
    and report pass/member/false-positive counts plus the measured FP
    rate — the decision table for "ship a KB of bits instead of
    shuffling keys" in incremental replication (probe the target's
    filter before shipping changes; only might-contain keys need the
    real anti-join). No false negatives by construction — n_pass ≥
    n_member always, asserted in tests alongside exact build/probe
    replay.

    Plan: build = distinct keys → d map-side hash positions → ≤m-row
    collect (the filter IS broadcast-sized by definition); probe =
    map-only boolean against the broadcast bit array
    (operators/sketch.bloom_bits / bloom_might_contain)."""
    from .operators.sketch import bloom_bits, bloom_might_contain

    orders = load_table(spark, sf_dir, "orders")
    yr = F.year("o_orderdate")
    a = orders.filter(yr == 1995).select("o_custkey")
    b_keys = orders.filter(yr == 1996).select("o_custkey").distinct()
    bits = bloom_bits(a, "o_custkey", m=1024, d=3)
    probed = bloom_might_contain(bits, b_keys, "o_custkey", m=1024, d=3)
    members = b_keys.join(a.distinct(), "o_custkey", "left_semi")
    stats = probed.agg(
        F.count(F.lit(1)).alias("n_probed"),
        F.sum(F.col("might_contain").cast("int")).alias("n_pass"),
    )
    m_cnt = members.agg(F.count(F.lit(1)).alias("n_member"))
    return stats.crossJoin(F.broadcast(m_cnt)).select(
        "n_probed",
        "n_pass",
        "n_member",
        (F.col("n_pass") - F.col("n_member")).alias("n_false_pos"),
        F.round(
            (F.col("n_pass") - F.col("n_member")).cast("double")
            / (F.col("n_probed") - F.col("n_member")).cast("double"),
            6,
        ).alias("fp_rate"),
    )


@query(
    "events_heavy_users_mg",
    oracle="""
    WITH counts AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY user_id
    ),
    th AS (
      SELECT COALESCE(
        (SELECT x FROM counts ORDER BY x DESC LIMIT 1 OFFSET 8), 0
      ) AS thresh
    ),
    n AS (SELECT CAST(SUM(x) AS BIGINT) AS total FROM counts)
    SELECT c.user_id,
           CAST(c.x - th.thresh AS BIGINT) AS mg_count,
           n.total AS n_total
    FROM counts c, th, n
    WHERE c.x - th.thresh > 0
    """,
)
def events_heavy_users_mg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Misra-Gries heavy-user summary at k=8: the ≤8 keys that could
    have frequency above N/9, with lower-bound counts — heavy-hitter
    DISCOVERY from bounded state, where the CMS gate answers point
    queries about keys you already suspect. The decrement threshold
    (the 9th-largest count) is a value, not an order, so the summary is
    deterministic and oracle-exact; the MG guarantee (every key with
    true freq > N/(k+1) is present; reported ≤ true ≤ reported +
    threshold) is property-tested against exact counts.

    Plan: one map-side-combined key aggregate (the shuffle an exact
    top-k would also pay), a k+1-row TakeOrdered for the threshold (no
    whole-relation sort), one broadcast scalar filter."""
    from .operators.sketch import mg_summary

    ev = load_table(spark, sf_dir, "events")
    return mg_summary(ev, "user_id", k=8)


#: top-k vocabulary cut for the Zipf fit; ln(rank) is precomputed in
#: PYTHON (round 6) and embedded as the SAME literal table in both
#: engines, so the x axis carries zero cross-engine libm risk.
_ZIPF_TOP = 100


def _zipf_lnrank_rows() -> list:
    import math

    return [(r, round(math.log(r), 6)) for r in range(1, _ZIPF_TOP + 1)]


def _zipf_oracle() -> str:
    from .queries_llm import _TOKS_SQL

    values = ", ".join(f"({r}, {x!r})" for r, x in _zipf_lnrank_rows())
    slope = (
        "(n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
        " / (n * CAST(sxx AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    )
    return f"""
    WITH toks AS (
      SELECT unnest({_TOKS_SQL}) AS token FROM documents
    ),
    vocab AS (SELECT token, COUNT(*) AS c FROM toks GROUP BY token),
    ranked AS (
      SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, token ASC) AS r
      FROM vocab
    ),
    sel AS (SELECT * FROM ranked WHERE r <= {_ZIPF_TOP}),
    lnr(r, x) AS (VALUES {values}),
    pts AS (
      SELECT CAST(l.x AS DECIMAL(18,6)) AS xd,
             CAST(round(ln(s.c), 6) AS DECIMAL(18,6)) AS yd
      FROM sel s JOIN lnr l ON l.r = s.r
    ),
    s AS (
      SELECT COUNT(*) AS n, SUM(xd) AS sx, SUM(yd) AS sy,
             SUM(xd * yd) AS sxy, SUM(xd * xd) AS sxx
      FROM pts
    )
    SELECT CAST(n AS BIGINT) AS n_terms,
           {slope} AS zipf_slope,
           (CAST(sy AS DOUBLE) - ({slope}) * CAST(sx AS DOUBLE)) / n
             AS intercept
    FROM s
    """


@query("doc_zipf_exponent", oracle=_zipf_oracle())
def doc_zipf_exponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit of the corpus vocabulary: OLS slope of ln(frequency)
    on ln(rank) over the top-100 terms — the vocabulary-health
    diagnostic (natural text sits near slope −1; templated/synthetic
    corpora flatten, OCR noise steepens the tail). x = ln(rank) is a
    Python-precomputed literal table shared verbatim by both engines;
    y = ln(count) is rounded to 6 dp and summed as exact decimals (the
    doc_unigram_logprob contract), so the five sufficient statistics
    are exact and the closed-form slope runs one identical IEEE
    sequence per side.

    Plan: one token explode + one vocab aggregate (the shuffles every
    vocab op pays), a bounded top-100 TakeOrdered, a 100-row broadcast
    join to the literal ranks, one scalar aggregate."""
    from pyspark.sql import Window

    from .operators.textops import normalize_text_expr

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(
            F.split(
                normalize_text_expr(F.coalesce(F.col("text"), F.lit(""))),
                " ",
            )
        ).alias("token")
    )
    vocab = toks.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    top = vocab.orderBy(F.col("c").desc(), F.col("token").asc()).limit(
        _ZIPF_TOP
    )
    w = Window.orderBy(F.col("c").desc(), F.col("token").asc())
    ranked = top.withColumn("r", F.row_number().over(w))
    lnr = spark.createDataFrame(_zipf_lnrank_rows(), "r int, x double")
    pts = ranked.join(F.broadcast(lnr), "r").select(
        F.col("x").cast("decimal(18,6)").alias("xd"),
        F.round(F.log(F.col("c")), 6).cast("decimal(18,6)").alias("yd"),
    )
    s = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xd").alias("sx"),
        F.sum("yd").alias("sy"),
        F.sum(F.col("xd") * F.col("yd")).alias("sxy"),
        F.sum(F.col("xd") * F.col("xd")).alias("sxx"),
    )
    n = F.col("n")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    slope = (n * F.col("sxy").cast("double") - sx * sy) / (
        n * F.col("sxx").cast("double") - sx * sx
    )
    return s.select(
        n.cast("bigint").alias("n_terms"),
        slope.alias("zipf_slope"),
        ((sy - slope * sx) / n).alias("intercept"),
    )


@query(
    "nation_revenue_trend_ols",
    oracle="""
    WITH o AS (
      SELECT c.c_nationkey,
             year(CAST(o.o_orderdate AS TIMESTAMP)) * 12
               + (month(CAST(o.o_orderdate AS TIMESTAMP)) - 1) AS midx,
             CAST(CAST(o.o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT)
               AS cents
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    monthly AS (
      SELECT c_nationkey, midx, CAST(SUM(cents) AS BIGINT) AS rev
      FROM o GROUP BY c_nationkey, midx
    ),
    base AS (SELECT MIN(midx) AS m0 FROM monthly),
    pts AS (
      SELECT n.n_name, CAST(m.midx - b.m0 AS BIGINT) AS xi, m.rev AS yi
      FROM monthly m CROSS JOIN base b
      JOIN nation n ON m.c_nationkey = n.n_nationkey
    ),
    s AS (
      SELECT n_name,
             COUNT(*) AS n,
             SUM(xi) AS sx,
             SUM(yi) AS sy,
             CAST(CAST(SUM(CAST(xi AS DECIMAL(19,0))
                           * CAST(yi AS DECIMAL(19,0))) AS VARCHAR)
                  AS DOUBLE) AS sxy,
             CAST(CAST(SUM(CAST(xi AS DECIMAL(19,0))
                           * CAST(xi AS DECIMAL(19,0))) AS VARCHAR)
                  AS DOUBLE) AS sxx
      FROM pts GROUP BY n_name
    )
    SELECT n_name, CAST(n AS BIGINT) AS n_months,
           (n * sxy - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (n * sxx - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             AS trend_cents_per_month
    FROM s
    """,
)
def nation_revenue_trend_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation revenue trend: the OLS slope of monthly revenue
    (integer cents) over the month index — the replication-verify
    surface's "is this market growing or shrinking, and how fast"
    screen, as a closed-form regression from exact sufficient
    statistics (the part_size_price_corr idiom: bigint sums, products
    through DECIMAL(19,0) so int64 cannot overflow in either engine,
    one string-roundtrip conversion for the >2^53 product sums, then
    one identical IEEE sequence per side). Month indices are rebased to
    the corpus minimum so the x values are small integers — no
    catastrophic cancellation in the normal equations at any scale.

    Plan: one fact-dim join, one (nation, month)-keyed aggregate, a
    1-row broadcast for the rebase, one map-side-combined aggregate per
    nation. No windows, no Python."""
    from pyspark.sql.types import TimestampType

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    od = F.col("o_orderdate").cast(TimestampType())
    o = orders.join(
        F.broadcast(customer.select("c_custkey", "c_nationkey")),
        orders.o_custkey == F.col("c_custkey"),
    ).select(
        "c_nationkey",
        (F.year(od) * 12 + (F.month(od) - 1)).alias("midx"),
        (F.col("o_totalprice").cast("decimal(18,4)") * 10000)
        .cast("bigint")
        .alias("cents"),
    )
    monthly = o.groupBy("c_nationkey", "midx").agg(
        F.sum("cents").alias("rev")
    )
    base = monthly.agg(F.min("midx").alias("m0"))
    pts = (
        monthly.crossJoin(F.broadcast(base))
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(
            "n_name",
            (F.col("midx") - F.col("m0")).cast("bigint").alias("xi"),
            F.col("rev").alias("yi"),
        )
    )
    d19 = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    s = pts.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xi").alias("sx"),
        F.sum("yi").alias("sy"),
        F.sum(d19("xi") * d19("yi")).cast("string").cast("double")
        .alias("sxy"),
        F.sum(d19("xi") * d19("xi")).cast("string").cast("double")
        .alias("sxx"),
    )
    n = F.col("n")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    return s.select(
        "n_name",
        n.cast("bigint").alias("n_months"),
        ((n * F.col("sxy") - sx * sy) / (n * F.col("sxx") - sx * sx))
        .alias("trend_cents_per_month"),
    )


def _decon_bloom_oracle() -> str:
    # output-identical to decontaminate_overlap by the no-false-negative
    # argument, so the oracle IS decontaminate_overlap's oracle
    from .queries_pipeline import _SHINGLES_CTE

    return f"""
    WITH {_SHINGLES_CTE},
    bench AS (SELECT doc_id AS bench_doc, shingle FROM sh WHERE doc_id % 50 = 0),
    train AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 50 != 0),
    sizes AS (SELECT doc_id, COUNT(*) AS n_train_shingles FROM train GROUP BY doc_id),
    hits AS (
      SELECT t.doc_id AS train_doc, b.bench_doc, COUNT(*) AS n_overlap
      FROM train t JOIN bench b ON t.shingle = b.shingle
      GROUP BY 1, 2
    )
    SELECT train_doc, bench_doc, n_overlap, s.n_train_shingles,
           round(n_overlap / s.n_train_shingles, 6) AS overlap_frac
    FROM hits JOIN sizes s ON s.doc_id = train_doc
    WHERE n_overlap >= 1
    """


@query("decontaminate_overlap_bloom", oracle=_decon_bloom_oracle())
def decontaminate_overlap_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-accelerated benchmark decontamination — the same flagged
    set as decontaminate_overlap (the oracle IS that gate's oracle; the
    filter has no false negatives, and the exact join discards its
    false positives), but the train side is pruned MAP-SIDE by a
    broadcast Bloom filter of the benchmark shingles before any
    shuffle. At a 100 TB corpus this is the difference between
    shuffling every training shingle into the collision join and
    shuffling only the might-contain survivors; and when the eval
    suite outgrows the broadcast budget, its KB-scale filter still
    broadcasts (operators/corpus.ngram_overlap_bloom)."""
    from .operators.corpus import ngram_overlap_bloom
    from .operators.dedup import doc_shingles

    docs = load_table(spark, sf_dir, "documents")
    sh = doc_shingles(docs)
    return ngram_overlap_bloom(sh, F.col("doc_id") % 50 == 0, min_overlap=1)
