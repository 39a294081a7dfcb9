"""Query-surface entries for the corpus-level pipeline operators
(operators/corpus.py): near-dup clustering, decontamination, stratified
sampling, sequence packing, TF-IDF. Every query has an exact DuckDB
oracle; the clustering oracle uses a recursive CTE to mirror the
iterative hash-min propagation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.corpus import sample_threshold
from .queries import query
from .queries_llm import (
    _CAPPED_CTE,
    _LSH_BANDS,
    _MINHASH_BASE,
    _MINHASH_MINS,
    _SHINGLES_CTE,
    _TOKS_SQL,
)
from .sources.catalog import load_table

# The verified near-dup pair pipeline (shingles → minhash → LSH bands →
# candidate pairs → Jaccard ≥ 0.2), as one nested-WITH subquery — the same
# construction queries_llm.dedup_lsh_verified gates, reused as the edge
# list for clustering.
_VERIFIED_PAIRS_SQL = f"""
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
    SELECT co.doc1, co.doc2
    FROM co
    JOIN cand ON cand.doc1 = co.doc1 AND cand.doc2 = co.doc2
    JOIN sizes s1 ON s1.doc_id = co.doc1
    JOIN sizes s2 ON s2.doc_id = co.doc2
    WHERE inter / (s1.n + s2.n - inter) >= 0.2
"""


@query(
    "dedup_components",
    oracle=f"""
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
    )
    SELECT doc_id, cluster_id,
           COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size,
           doc_id = cluster_id AS is_canonical
    FROM comp
    """,
)
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cluster stage of the dedup pipeline: verified near-dup pairs
    (the dedup_lsh_verified construction) become edges; every document is
    labeled with its connected component's minimum doc_id, the canonical
    survivor. Iterative hash-min over DataFrames (operators/corpus.py) —
    the oracle mirrors it with a recursive CTE."""
    from pyspark.sql import Window

    from .operators.corpus import connected_components
    from .operators.dedup import (
        doc_shingles,
        jaccard_pairs,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    docs = load_table(spark, sf_dir, "documents")
    # checkpointed: sh feeds the signature pipeline and the verifier's
    # semi-join (r13: one shingle explode instead of two, same
    # measurement as dedup_lsh_verified)
    sh = doc_shingles(docs).localCheckpoint()
    # the CC stage replays the candidate pipeline beyond what
    # ReuseExchange covers — caching the (tiny: one row/doc) signature
    # table cuts ~17% off this query
    sig = minhash_signatures(sh, num_hashes=12).cache()
    cand = lsh_candidate_pairs(sig)
    pairs = jaccard_pairs(sh, candidates=cand, threshold=0.2)
    comp = connected_components(
        docs.select("doc_id"), pairs, id_col="doc_id", src_col="doc1", dst_col="doc2"
    )
    w = Window.partitionBy("cluster_id")
    return comp.select(
        F.col("node").alias("doc_id"),
        "cluster_id",
        F.count(F.lit(1)).over(w).alias("cluster_size"),
        (F.col("node") == F.col("cluster_id")).alias("is_canonical"),
    )


@query(
    "decontaminate_overlap",
    oracle=f"""
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
    """,
)
def decontaminate_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing word
    3-gram shingles with a (deterministic) held-out eval slice
    (doc_id % 50 = 0). The eval side broadcasts; the corpus is scanned
    once — the shape that survives a 100 TB corpus against a fixed eval
    suite."""
    from .operators.corpus import ngram_overlap
    from .operators.dedup import doc_shingles

    docs = load_table(spark, sf_dir, "documents")
    sh = doc_shingles(docs)
    return ngram_overlap(sh, F.col("doc_id") % 50 == 0, min_overlap=1)


#: deterministic training-mix rates per language stratum
SAMPLE_RATES = {"en": 0.9, "de": 0.5, "fr": 0.5, "es": 0.5, "zh": 0.25}
_SAMPLE_SEED = 7


def _sample_case_sql() -> tuple[str, str]:
    thresh = " ".join(
        f"WHEN lang = '{s}' THEN CAST({sample_threshold(r)} AS BIGINT)"
        for s, r in SAMPLE_RATES.items()
    )
    weight = " ".join(
        f"WHEN lang = '{s}' THEN {round(1.0 / r, 6)!r}" for s, r in SAMPLE_RATES.items()
    )
    return (
        f"CASE {thresh} ELSE CAST(0 AS BIGINT) END",
        f"CASE {weight} ELSE CAST(NULL AS DOUBLE) END",
    )


_THRESH_SQL, _WEIGHT_SQL = _sample_case_sql()


@query(
    "sample_stratified",
    oracle=f"""
    WITH drawn AS (
      SELECT doc_id, lang, source,
             CAST('0x' || substr(md5('{_SAMPLE_SEED}:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS sample_key
      FROM documents
    )
    SELECT doc_id, lang, source, sample_key, {_WEIGHT_SQL} AS weight
    FROM drawn
    WHERE sample_key < {_THRESH_SQL}
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language Bernoulli sample for training-mix
    construction: keep iff hash60(seed:doc_id) < rate·2^60, weight =
    1/rate. Pure map-side filter — zero shuffle, reproducible across
    engines, retries, and cluster sizes."""
    from .operators.corpus import stratified_sample

    docs = load_table(spark, sf_dir, "documents")
    out = stratified_sample(
        docs, strata_col="lang", rates=SAMPLE_RATES, id_col="doc_id", seed=_SAMPLE_SEED
    )
    return out.select("doc_id", "lang", "source", "sample_key", "weight")


_PACK_BUDGET = 1024


@query(
    "doc_pack_sequences",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source, len({_TOKS_SQL}) AS n_tokens FROM documents
    ),
    c AS (
      SELECT doc_id, source, n_tokens,
             CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
      FROM t
    )
    SELECT doc_id, source, n_tokens, cum_tokens,
           (cum_tokens - n_tokens) // {_PACK_BUDGET} AS pack_id,
           ROW_NUMBER() OVER (PARTITION BY source, (cum_tokens - n_tokens) // {_PACK_BUDGET}
                              ORDER BY doc_id) AS slot
    FROM c
    """,
)
def doc_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sequence packing: within each source shard, docs are
    packed in doc_id order into {_PACK_BUDGET}-token bins via a cumulative
    window — the deterministic, order-parallel packing a pretraining data
    loader consumes. The windowed SUM is cast to BIGINT on both sides
    (DuckDB widens window sums to HUGEINT)."""
    from .operators.corpus import pack_sequences
    from .operators.textops import normalize_text_expr, token_count_expr

    docs = load_table(spark, sf_dir, "documents")
    # token count over the NORMALIZED text to mirror _TOKS_SQL exactly
    base = docs.select(
        "doc_id",
        "source",
        F.size(F.split(normalize_text_expr(F.coalesce(F.col("text"), F.lit(""))), " ")).alias(
            "n_tokens"
        ),
    )
    return pack_sequences(
        base, budget=_PACK_BUDGET, token_col="n_tokens", order_col="doc_id", part_col="source"
    )


@query(
    "doc_repetition_signals",
    oracle=f"""
    WITH norm AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    tok AS (SELECT doc_id, t.tok FROM norm, UNNEST(toks) AS t(tok)),
    bi AS (
      SELECT doc_id, u.b FROM norm, UNNEST(
        list_transform(generate_series(1, len(toks) - 1),
                       i -> array_to_string(toks[i:i+1], ' '))) AS u(b)
    ),
    tri AS (
      SELECT doc_id, u.t FROM norm, UNNEST(
        list_transform(generate_series(1, len(toks) - 2),
                       i -> array_to_string(toks[i:i+2], ' '))) AS u(t)
    ),
    per_doc AS (
      SELECT doc_id, COUNT(*) AS n_tokens,
             COUNT(DISTINCT tok) AS n_distinct_tokens
      FROM tok GROUP BY doc_id
    ),
    per_tri AS (
      SELECT doc_id, COUNT(*) AS n_trigrams,
             COUNT(DISTINCT t) AS n_distinct_trigrams
      FROM tri GROUP BY doc_id
    ),
    per_bigram AS (
      SELECT doc_id, MAX(c) AS top_bigram_count FROM (
        SELECT doc_id, b, COUNT(*) AS c FROM bi GROUP BY 1, 2
      ) GROUP BY doc_id
    )
    SELECT d.doc_id, d.n_tokens,
           COALESCE(g.top_bigram_count, 0) AS top_bigram_count,
           round(d.n_distinct_tokens / d.n_tokens, 6) AS type_token_ratio,
           round(COALESCE(g.top_bigram_count * 2, 0) / d.n_tokens, 6) AS top_bigram_frac,
           round(CASE WHEN COALESCE(t.n_trigrams, 0) > 0
                      THEN 1 - CAST(t.n_distinct_trigrams AS DOUBLE) / t.n_trigrams
                      ELSE 0.0 END, 6) AS dup_trigram_frac,
           ((COALESCE(g.top_bigram_count, 0) >= 2
             AND round(COALESCE(g.top_bigram_count * 2, 0) / d.n_tokens, 6) > 0.18)
            OR round(CASE WHEN COALESCE(t.n_trigrams, 0) > 0
                          THEN 1 - CAST(t.n_distinct_trigrams AS DOUBLE) / t.n_trigrams
                          ELSE 0.0 END, 6) > 0.30) AS is_repetitive
    FROM per_doc d
    LEFT JOIN per_bigram g ON g.doc_id = d.doc_id
    LEFT JOIN per_tri t ON t.doc_id = d.doc_id
    """,
)
def doc_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style intra-document repetition filters at token granularity:
    type-token ratio, top-bigram coverage, duplicate-trigram fraction, and
    the resulting is_repetitive cut. One token explode, window-built
    n-grams, doc-keyed aggregations only (operators/textops.py
    repetition_signals)."""
    from .operators.textops import repetition_signals

    docs = load_table(spark, sf_dir, "documents")
    return repetition_signals(docs)


# Deterministic PII-bearing contact line derived from existing columns —
# the corpus itself is synthetic word soup with no PII, so the redaction
# query plants one email/IP/phone per document as a pure function of
# (source, doc_id) and must scrub all of them. Both engines build the
# SAME string, so counts and redacted text are exactly comparable.
_CONTACT_SPARK = (
    "concat(text, ' contact ', source, '@example.com ip 10.0.', "
    "CAST(pmod(doc_id, 256) AS STRING), '.1 ph +1-555-', lpad(CAST(doc_id AS STRING), 4, '0'))"
)
_CONTACT_DUCK = (
    "text || ' contact ' || source || '@example.com ip 10.0.' || "
    "CAST(doc_id % 256 AS VARCHAR) || '.1 ph +1-555-' || lpad(CAST(doc_id AS VARCHAR), 4, '0')"
)


@query(
    "doc_pii_redaction",
    oracle=f"""
    WITH lines AS (
      SELECT doc_id, {_CONTACT_DUCK} AS contact FROM documents
    )
    SELECT doc_id,
           len(regexp_extract_all(contact, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}')) AS n_emails,
           len(regexp_extract_all(contact, '\\b[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}\\b')) AS n_ips,
           len(regexp_extract_all(contact, '\\+?[0-9]{{1,2}}[- ][0-9]{{3}}[- ][0-9]{{4}}')) AS n_phones,
           regexp_replace(
             regexp_replace(
               regexp_replace(contact, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}', '<EMAIL>', 'g'),
               '\\b[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}\\b', '<IP>', 'g'),
             '\\+?[0-9]{{1,2}}[- ][0-9]{{3}}[- ][0-9]{{4}}', '<PHONE>', 'g') AS redacted
    FROM lines
    """,
)
def doc_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub pass: plant a deterministic contact line (email + IPv4 +
    phone derived from source/doc_id), then redact and count each class
    with shared RE2∩Java-compatible patterns. Map-only codegen scan — the
    exact shape of a 100 TB PII pass (operators/textops.py pii_redact)."""
    from .operators.textops import pii_redact

    docs = load_table(spark, sf_dir, "documents")
    lines = docs.select("doc_id", F.expr(_CONTACT_SPARK).alias("contact"))
    return pii_redact(lines, text_col="contact", out_col="redacted").select(
        "doc_id", "n_emails", "n_ips", "n_phones", "redacted"
    )


@query(
    "doc_tfidf_topterms",
    oracle="""
    WITH terms AS (
      SELECT doc_id, t.term
      FROM documents,
           UNNEST(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                              p -> p != '')) AS t(term)
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY 1, 2),
    dfc AS (SELECT term, COUNT(*) AS df_count FROM tf GROUP BY 1),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, dfc.df_count,
             round(tf.tf * ln((n.n_docs + 1) / (dfc.df_count + 1)), 6) AS score
      FROM tf JOIN dfc ON tf.term = dfc.term CROSS JOIN n
    )
    SELECT doc_id, term, tf, df_count, score, rank FROM (
      SELECT doc_id, term, tf, df_count, score,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, term ASC) AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
)
def doc_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-5 TF-IDF terms. Ranking happens on the
    6-dp-rounded score (term tiebreak) in BOTH engines so the top-k set is
    reproducible; ln() cross-engine error (≤1 ulp) is far below the
    rounding quantum."""
    from .operators.corpus import tfidf_topterms

    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    return tfidf_topterms(docs, n_docs=n_docs, k=5)


@query(
    "corpus_mixture_report",
    oracle=f"""
    WITH t AS (
      SELECT source, lang, len({_TOKS_SQL}) AS n_tokens FROM documents
    ),
    agg AS (
      SELECT source, lang, COUNT(*) AS n_docs,
             CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
             round(AVG(n_tokens), 6) AS mean_tokens
      FROM t GROUP BY 1, 2
    )
    SELECT source, lang, n_docs, total_tokens, mean_tokens,
           round(total_tokens / (SELECT SUM(total_tokens) FROM agg), 6) AS token_share
    FROM agg
    """,
)
def corpus_mixture_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture accounting at the (source, lang) grain: doc counts, token
    totals, and each stratum's share of all corpus tokens — the table a
    pretraining-mix decision (and the stratified_sample audit) starts
    from. One groupBy to the stratum grain; the grand total comes from
    the tiny aggregate, never a second corpus pass."""
    from .operators.corpus import mixture_report
    from .operators.textops import normalize_text_expr

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "source",
        "lang",
        F.size(
            F.split(normalize_text_expr(F.coalesce(F.col("text"), F.lit(""))), " ")
        ).alias("n_tokens"),
    )
    return mixture_report(base, strata_cols=["source", "lang"])


@query(
    "doc_quality_filter",
    oracle=f"""
    WITH norm AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    base AS (
      SELECT doc_id, len(toks) AS n_tokens,
             len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is','it','for','on'))) AS n_stop,
             toks
      FROM norm
    ),
    top AS (
      SELECT doc_id, MAX(c) AS max_tok_count FROM (
        SELECT doc_id, tok, COUNT(*) AS c
        FROM base, UNNEST(toks) AS u(tok) GROUP BY 1, 2
      ) GROUP BY doc_id
    ),
    j AS (
      SELECT b.doc_id, b.n_tokens, b.n_stop, t.max_tok_count,
             CASE WHEN b.n_tokens < 10 THEN 'too_short'
                  WHEN b.n_tokens > 50000 THEN 'too_long'
                  WHEN b.n_stop * 1000 < b.n_tokens * 20 THEN 'low_stopword'
                  WHEN t.max_tok_count * 100 > b.n_tokens * 20 THEN 'repetitive'
             END AS reject_reason
      FROM base b JOIN top t USING (doc_id)
    )
    SELECT doc_id, n_tokens, n_stop, max_tok_count, reject_reason,
           reject_reason IS NULL AS keep
    FROM j
    """,
)
def doc_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style rule-cascade filter: integer-only rules (token bounds,
    stopword floor, single-token repetition cap) with the first failing
    rule as the reject reason — drops stay explainable and the decision
    is bit-reproducible across engines."""
    from .operators.textops import quality_filter

    docs = load_table(spark, sf_dir, "documents")
    return quality_filter(docs)


@query(
    "doc_passage_dedup",
    oracle=f"""
    WITH norm AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    chunks AS (
      SELECT doc_id,
             md5(array_to_string(toks[(i-1)*16+1:(i-1)*16+16], ' ')) AS passage_fp
      FROM norm,
           UNNEST(generate_series(1, CAST(ceil(len(toks) / 16.0) AS BIGINT))) AS g(i)
    )
    SELECT passage_fp, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_occurrences,
           MIN(doc_id) AS keep_doc
    FROM chunks GROUP BY 1 HAVING COUNT(*) >= 2
    """,
)
def doc_passage_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passage-level exact dedup: fixed 16-token windows fingerprinted per
    document; fingerprints occurring more than once across the corpus are
    reported with their spread and deterministic survivor. Finer than
    whole-doc fingerprints, cheaper than shingle Jaccard — the tier that
    catches repeated boilerplate passages inside otherwise-unique
    documents. One shuffle on the fingerprint."""
    from .operators.corpus import passage_dedup_groups

    docs = load_table(spark, sf_dir, "documents")
    return passage_dedup_groups(docs, window=16)


@query(
    "corpus_top_ngrams",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    counts AS (
      SELECT shingle, COUNT(DISTINCT doc_id) AS df_docs FROM sh GROUP BY 1
    ),
    topk AS (
      SELECT shingle, df_docs FROM counts
      ORDER BY df_docs DESC, shingle ASC LIMIT 20
    )
    SELECT shingle, df_docs,
           ROW_NUMBER() OVER (ORDER BY df_docs DESC, shingle ASC) AS rank
    FROM topk
    """,
)
def corpus_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-20 word 3-grams by document frequency — the
    boilerplate-survey / contamination-audit primitive. orderBy+limit
    plans as a distributed TakeOrdered (per-partition top-k merged on the
    driver), never a global sort shuffle; ties break on the gram string."""
    from .operators.corpus import top_ngrams
    from .operators.dedup import doc_shingles

    docs = load_table(spark, sf_dir, "documents")
    return top_ngrams(doc_shingles(docs), k=20)


@query(
    "corpus_clean_view",
    # the full acceptance decision per document, composed from the gated
    # building blocks: quality cascade + exact-dedup survivorship +
    # benchmark decontamination (doc_id % 50 = 0 is the eval slice)
    oracle=f"""
    WITH norm0 AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    base AS (
      SELECT doc_id, len(toks) AS n_tokens,
             len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is','it','for','on'))) AS n_stop,
             toks
      FROM norm0
    ),
    top AS (
      SELECT doc_id, MAX(c) AS max_tok_count FROM (
        SELECT doc_id, tok, COUNT(*) AS c
        FROM base, UNNEST(toks) AS u(tok) GROUP BY 1, 2
      ) GROUP BY doc_id
    ),
    qual AS (
      SELECT b.doc_id,
             (CASE WHEN b.n_tokens < 10 THEN 'too_short'
                   WHEN b.n_tokens > 50000 THEN 'too_long'
                   WHEN b.n_stop * 1000 < b.n_tokens * 20 THEN 'low_stopword'
                   WHEN t.max_tok_count * 100 > b.n_tokens * 20 THEN 'repetitive'
              END) IS NULL AS keep_quality
      FROM base b JOIN top t USING (doc_id)
    ),
    fp AS (
      SELECT doc_id,
             md5(trim(regexp_replace(lower(COALESCE(text, '')), '\\s+', ' ', 'g'))) AS fingerprint
      FROM documents
    ),
    canon AS (
      SELECT doc_id, doc_id = MIN(doc_id) OVER (PARTITION BY fingerprint) AS is_canonical
      FROM fp
    ),
    {_SHINGLES_CTE.lstrip()},
    contaminated AS (
      SELECT DISTINCT t.doc_id
      FROM sh t JOIN sh b ON t.shingle = b.shingle
      WHERE t.doc_id % 50 != 0 AND b.doc_id % 50 = 0
    )
    SELECT d.doc_id,
           q.keep_quality,
           c.is_canonical,
           d.doc_id % 50 = 0 AS is_benchmark,
           ct.doc_id IS NOT NULL AS is_contaminated,
           q.keep_quality AND c.is_canonical AND d.doc_id % 50 != 0
             AND ct.doc_id IS NULL AS accepted
    FROM documents d
    JOIN qual q ON q.doc_id = d.doc_id
    JOIN canon c ON c.doc_id = d.doc_id
    LEFT JOIN contaminated ct ON ct.doc_id = d.doc_id
    """,
)
def corpus_clean_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship corpus-cleaning decision: every document labeled with
    its quality verdict, exact-dedup survivorship, benchmark membership,
    and contamination flag, plus the final acceptance — the composed view
    a pretraining data build materializes before sampling/packing. Each
    component is itself a gated operator; this query pins that they
    compose without re-deriving anything (one quality pass, one
    fingerprint window, one broadcast decontamination join)."""
    from pyspark.sql import Window

    from .operators.dedup import doc_shingles
    from .operators.textops import fingerprint_expr, quality_filter

    docs = load_table(spark, sf_dir, "documents")
    qual = quality_filter(docs).select(
        "doc_id", F.col("keep").alias("keep_quality")
    )
    w = Window.partitionBy("fingerprint")
    canon = docs.select(
        "doc_id", fingerprint_expr(F.col("text")).alias("fingerprint")
    ).select(
        "doc_id",
        (F.col("doc_id") == F.min("doc_id").over(w)).alias("is_canonical"),
    )
    sh = doc_shingles(docs)
    bench_sh = sh.filter(F.col("doc_id") % 50 == 0).select("shingle").distinct()
    contaminated = (
        sh.filter(F.col("doc_id") % 50 != 0)
        .join(F.broadcast(bench_sh), on="shingle", how="left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("_hit", F.lit(True))
    )
    return (
        docs.select("doc_id")
        .join(qual, on="doc_id")
        .join(canon, on="doc_id")
        .join(contaminated, on="doc_id", how="left")
        .select(
            "doc_id",
            "keep_quality",
            "is_canonical",
            (F.col("doc_id") % 50 == 0).alias("is_benchmark"),
            F.coalesce(F.col("_hit"), F.lit(False)).alias("is_contaminated"),
            (
                F.col("keep_quality")
                & F.col("is_canonical")
                & (F.col("doc_id") % 50 != 0)
                & F.coalesce(F.col("_hit"), F.lit(False)).__invert__()
            ).alias("accepted"),
        )
    )


_SHUFFLE_SEED = 11
_SHUFFLE_SHARDS = 8


@query(
    "corpus_shuffle",
    oracle=f"""
    WITH drawn AS (
      SELECT doc_id, source,
             CAST('0x' || substr(md5('{_SHUFFLE_SEED}:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS draw
      FROM documents
    )
    SELECT doc_id, source, draw,
           CAST(draw % {_SHUFFLE_SHARDS} AS INTEGER) AS shard,
           ROW_NUMBER() OVER (PARTITION BY draw % {_SHUFFLE_SHARDS}
                              ORDER BY draw, doc_id) AS pos
    FROM drawn
    """,
)
def corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-shard shuffle: (shard, pos) from the seeded
    portable hash of doc_id — identical layout across engines, re-runs,
    and partitionings (unlike orderBy(rand())); the shard key is uniform
    so no task ever sorts more than corpus/n_shards rows."""
    from .operators.corpus import deterministic_shuffle

    docs = load_table(spark, sf_dir, "documents")
    out = deterministic_shuffle(docs.select("doc_id", "source"), n_shards=_SHUFFLE_SHARDS, seed=_SHUFFLE_SEED)
    return out.select("doc_id", "source", "draw", "shard", "pos")


_CAP_SEED = 77
_CAP_N = 40


@query(
    "doc_domain_caps",
    oracle=f"""
    WITH drawn AS (
      SELECT doc_id, source,
             CAST('0x' || substr(md5('{_CAP_SEED}:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS sel_key
      FROM documents
    ),
    ranked AS (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY sel_key ASC, doc_id ASC) AS sel_rank
      FROM drawn
    )
    SELECT doc_id, source, sel_rank FROM ranked WHERE sel_rank <= {_CAP_N}
    """,
)
def doc_domain_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/RefinedWeb-style per-domain cap: each source keeps at most
    {_CAP_N} docs, chosen by the seeded deterministic hash draw — an
    unbiased per-domain subsample reproducible across engines, re-runs,
    and partitionings (operators/corpus.cap_per_group)."""
    from .operators.corpus import cap_per_group

    docs = load_table(spark, sf_dir, "documents")
    return cap_per_group(
        docs.select("doc_id", "source"), "source", cap=_CAP_N, seed=_CAP_SEED
    ).select("doc_id", "source", "sel_rank")


@query(
    "doc_unigram_logprob",
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
    )
    SELECT doc_id,
           COUNT(*) AS n_tokens,
           round(CAST(CAST(SUM(lp) AS VARCHAR) AS DOUBLE), 6) AS sum_logprob,
           CAST(CAST(SUM(lp) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_logprob
    FROM scored
    GROUP BY doc_id
    """,
)
def doc_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained unigram-LM quality score (the CCNet perplexity
    filter reduced to unigrams so it stays SQL-reproducible): add-one
    smoothed p(t), per-doc Σ ln p and mean. Per-token logprobs are
    rounded then summed as exact decimals, so both engines add the same
    quantities in any order (operators/corpus.unigram_logprob)."""
    from .operators.corpus import unigram_logprob

    docs = load_table(spark, sf_dir, "documents")
    return unigram_logprob(docs)


_TEMP_SEED = 11
_H60 = "CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"
_SPAN = 1 << 60


@query(
    "corpus_temperature_mix",
    oracle=f"""
    WITH s AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
    t AS (
      SELECT SUM(n_docs) AS total,
             SUM(sqrt(CAST(n_docs AS DOUBLE))) AS z,
             MIN(n_docs) AS n_min
      FROM s
    )
    SELECT s.source, s.n_docs,
           round(CAST(s.n_docs AS DOUBLE) / t.total, 6) AS p_raw,
           round(sqrt(CAST(s.n_docs AS DOUBLE)) / t.z, 6) AS p_temp,
           round(sqrt(CAST(t.n_min AS DOUBLE) / s.n_docs), 6) AS rate,
           CAST(floor(sqrt(CAST(t.n_min AS DOUBLE) / s.n_docs) * {float(_SPAN)!r})
                AS BIGINT) AS keep_threshold
    FROM s CROSS JOIN t
    """,
)
def corpus_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-0.5 mixture table per source: raw share, temperature
    share (∝ √n), the down-sampling rate (√(n_min/n)) that realizes it,
    and the integer hash threshold. Every float step is IEEE
    correctly-rounded (divide, sqrt, ×2^60 exponent shift), so even the
    60-bit thresholds match DuckDB bit-for-bit
    (operators/corpus.temperature_rates)."""
    from .operators.corpus import temperature_rates

    docs = load_table(spark, sf_dir, "documents")
    return temperature_rates(docs, strata_col="source", alpha=0.5)


@query(
    "corpus_temperature_sample",
    oracle=f"""
    WITH s AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
    m AS (SELECT MIN(n_docs) AS n_min FROM s),
    th AS (
      SELECT s.source,
             CAST(floor(sqrt(CAST(m.n_min AS DOUBLE) / s.n_docs) * {float(_SPAN)!r})
                  AS BIGINT) AS keep_threshold
      FROM s CROSS JOIN m
    )
    SELECT d.doc_id, d.source, d.lang,
           {_H60.format(expr=f"'{_TEMP_SEED}:' || CAST(d.doc_id AS VARCHAR)")} AS sample_key,
           th.keep_threshold
    FROM documents d JOIN th ON d.source = th.source
    WHERE {_H60.format(expr=f"'{_TEMP_SEED}:' || CAST(d.doc_id AS VARCHAR)")} < th.keep_threshold
    """,
)
def corpus_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The temperature mix REALIZED: every source down-sampled to its
    √-temperature rate by the portable hash draw — rates derived from the
    data in-plan (tiny count aggregate broadcast back; nothing collected
    to the driver), decision map-side, reproducible across engines and
    cluster sizes (operators/corpus.temperature_sample)."""
    from .operators.corpus import temperature_sample

    docs = load_table(spark, sf_dir, "documents")
    out = temperature_sample(
        docs, strata_col="source", alpha=0.5, id_col="doc_id", seed=_TEMP_SEED
    )
    return out.select("doc_id", "source", "lang", "sample_key", "keep_threshold")


_SPLIT_SEED = 13
_SPLIT_FRACTIONS = {"train": 0.9, "val": 0.05, "test": 0.05}


def _split_case_sql() -> str:
    names = list(_SPLIT_FRACTIONS)
    cum = 0.0
    arms = []
    for name in names[:-1]:
        cum += _SPLIT_FRACTIONS[name]
        arms.append(f"WHEN split_key < {sample_threshold(cum)} THEN '{name}'")
    return f"CASE {' '.join(arms)} ELSE '{names[-1]}' END"


@query(
    "corpus_split",
    oracle=f"""
    WITH keyed AS (
      SELECT lang,
             {_H60.format(expr=f"'{_SPLIT_SEED}:' || CAST(doc_id AS VARCHAR)")} AS split_key
      FROM documents
    )
    SELECT {_split_case_sql()} AS split, lang,
           COUNT(*) AS n_docs,
           MIN(split_key) AS min_key,
           MAX(split_key) AS max_key
    FROM keyed
    GROUP BY 1, 2
    """,
)
def corpus_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/val/test assignment audited at the
    (split, lang) grain: cumulative integer thresholds over the portable
    hash draw — a pure function of (doc_id, seed), so appends never move
    an existing doc's split. Map-only + one tiny aggregate
    (operators/corpus.dataset_split)."""
    from .operators.corpus import dataset_split

    docs = load_table(spark, sf_dir, "documents")
    out = dataset_split(docs, _SPLIT_FRACTIONS, id_col="doc_id", seed=_SPLIT_SEED)
    return out.groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("split_key").alias("min_key"),
        F.max("split_key").alias("max_key"),
    )


@query(
    "doc_dsir_weights",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS is_target,
             unnest({_TOKS_SQL}) AS token
      FROM documents
    ),
    vocab AS (
      SELECT token, COUNT(*) AS c_raw, SUM(is_target) AS c_tgt
      FROM toks GROUP BY token
    ),
    totals AS (
      SELECT SUM(c_raw) AS n_raw, SUM(c_tgt) AS n_tgt, COUNT(*) AS v_size
      FROM vocab
    ),
    scored AS (
      SELECT t.doc_id,
             CAST(round(ln((v.c_tgt + 1) / (tt.n_tgt + tt.v_size)), 6)
                  AS DECIMAL(28,12))
             - CAST(round(ln((v.c_raw + 1) / (tt.n_raw + tt.v_size)), 6)
                  AS DECIMAL(28,12)) AS lr
      FROM toks t JOIN vocab v ON t.token = v.token CROSS JOIN totals tt
    )
    SELECT doc_id, COUNT(*) AS n_tokens,
           round(CAST(SUM(lr) AS DOUBLE), 6) AS log_ratio_sum,
           round(CAST(SUM(lr) AS DOUBLE) / COUNT(*), 6) AS avg_log_ratio
    FROM scored
    GROUP BY doc_id
    """,
)
def doc_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights: per-doc Σ[ln p_target − ln p_raw] under
    two corpus-trained add-one unigram LMs (target = the src0 slice),
    the importance-resampling signal that shifts a training mix toward a
    trusted domain. Per-token log-ratios are rounded then subtracted and
    summed as exact decimals — the unigram_logprob cross-engine contract
    applied twice (operators/corpus.dsir_logratio)."""
    from .operators.corpus import dsir_logratio

    docs = load_table(spark, sf_dir, "documents")
    return dsir_logratio(docs, F.col("source") == "src0")


_CHUNK_BUDGET = 64
_CHUNK_OVERLAP = 16
_CHUNK_STEP = _CHUNK_BUDGET - _CHUNK_OVERLAP


@query(
    "doc_chunk_windows",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_TOKS_SQL} AS toks, len({_TOKS_SQL}) AS n FROM documents
    ),
    c AS (
      SELECT doc_id, toks, n,
             CASE WHEN n <= {_CHUNK_BUDGET} THEN 1
                  ELSE 1 + (n - {_CHUNK_BUDGET} + {_CHUNK_STEP} - 1) // {_CHUNK_STEP}
             END AS n_chunks
      FROM t
    ),
    e AS (
      SELECT doc_id, toks, n, u.i AS chunk_id
      FROM c, UNNEST(generate_series(0, n_chunks - 1)) AS u(i)
    )
    SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
           CAST(chunk_id * {_CHUNK_STEP} AS INT) AS start_tok,
           CAST(least({_CHUNK_BUDGET}, n - chunk_id * {_CHUNK_STEP}) AS INT)
             AS chunk_tokens,
           array_to_string(
             toks[chunk_id * {_CHUNK_STEP} + 1 : chunk_id * {_CHUNK_STEP} + {_CHUNK_BUDGET}],
             ' ') AS chunk_text
    FROM e
    """,
)
def doc_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking of over-budget docs ({_CHUNK_BUDGET}-token
    windows, {_CHUNK_OVERLAP}-token overlap): the split half of sequence
    preparation (pack_sequences bins the short docs). Map+explode only,
    integer-exact chunk arithmetic
    (operators/corpus.chunk_long_docs)."""
    from .operators.corpus import chunk_long_docs

    docs = load_table(spark, sf_dir, "documents")
    out = chunk_long_docs(docs, budget=_CHUNK_BUDGET, overlap=_CHUNK_OVERLAP)
    return out.select(
        "doc_id",
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.col("start_tok").cast("int").alias("start_tok"),
        F.col("chunk_tokens").cast("int").alias("chunk_tokens"),
        "chunk_text",
    )


#: fixed merge list for the gate (common English merges; the TRAINING
#: loop is iterative/non-SQL — it is verified against a pure-Python BPE
#: reference in tests/test_docs_text.py::TestBpe instead)
_BPE_MERGES = [("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("e", "r"), ("in", "g")]


def _bpe_oracle_sql() -> str:
    s = "chr(31)"
    ss = f"{s} || {s}"
    sym = f"{ss} || array_to_string(string_split(word, ''), {ss}) || {ss}"
    for a, b in _BPE_MERGES:
        pat = f"{s} || '{a}' || {ss} || '{b}' || {s}"
        rep = f"{s} || '{a}{b}' || {s}"
        sym = f"replace({sym}, {pat}, {rep})"
    return f"""
    WITH tok AS (
      SELECT doc_id, t.word FROM (
        SELECT doc_id, {_TOKS_SQL} AS toks FROM documents
      ), UNNEST(toks) AS t(word)
      WHERE t.word <> ''
    ),
    dist AS (SELECT DISTINCT word FROM tok),
    seg AS (
      SELECT word,
             len(string_split(trim({sym}, chr(31)), {ss})) AS n_sym
      FROM dist
    )
    SELECT tok.doc_id, COUNT(*) AS n_words,
           CAST(SUM(seg.n_sym) AS BIGINT) AS n_bpe_tokens
    FROM tok JOIN seg ON tok.word = seg.word
    GROUP BY tok.doc_id
    """


@query("doc_bpe_segment", oracle=_bpe_oracle_sql())
def doc_bpe_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE merge APPLICATION over the corpus with a fixed merge list:
    per-doc whitespace-word and BPE-token counts. Merges run on the
    DISTINCT word table (Zipf-small) as literal separator-framed string
    replaces — bit-identical in DuckDB — then join back to the token
    stream. The merge TRAINING loop (operators/bpe.bpe_train) is
    iterative argmax and verified against a pure-Python BPE reference in
    pytest instead (operators/bpe.py)."""
    from .operators.bpe import bpe_segment

    docs = load_table(spark, sf_dir, "documents")
    return bpe_segment(docs, _BPE_MERGES)


@query(
    "doc_bigram_logprob",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, {_TOKS_SQL} AS t FROM documents
      WHERE len({_TOKS_SQL}) >= 2
    ),
    bi AS (
      SELECT doc_id, t[g.i] AS prev, t[g.i + 1] AS cur
      FROM base, UNNEST(generate_series(1, len(t) - 1)) AS g(i)
    ),
    toks AS (SELECT doc_id, unnest({_TOKS_SQL}) AS token FROM documents),
    vocab AS (SELECT token, COUNT(*) AS c_uni FROM toks GROUP BY 1),
    totals AS (SELECT SUM(c_uni) AS n_uni, COUNT(*) AS v_size FROM vocab),
    bic AS (SELECT prev, cur, COUNT(*) AS c_bi FROM bi GROUP BY 1, 2),
    ctx AS (SELECT prev, SUM(c_bi) AS c_ctx FROM bic GROUP BY 1),
    scored AS (
      SELECT b.doc_id,
             CAST(round(ln(0.75 * ((c.c_bi + 1) / (x.c_ctx + tt.v_size))
                         + 0.25 * ((v.c_uni + 1) / (tt.n_uni + tt.v_size))), 6)
                  AS DECIMAL(28,12)) AS lp
      FROM bi b
      JOIN bic c ON b.prev = c.prev AND b.cur = c.cur
      JOIN ctx x ON b.prev = x.prev
      JOIN vocab v ON b.cur = v.token
      CROSS JOIN totals tt
    )
    SELECT doc_id, COUNT(*) AS n_scored,
           round(CAST(CAST(SUM(lp) AS VARCHAR) AS DOUBLE), 6) AS sum_logprob,
           CAST(CAST(SUM(lp) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_logprob
    FROM scored GROUP BY doc_id
    """,
)
def doc_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated bigram-LM score (λ=0.75 bigram + 0.25 unigram, both
    add-one smoothed on the corpus's own counts) — the next rung of the
    CCNet perplexity ladder above doc_unigram_logprob, still fully in
    codegen and decimal-exact across engines
    (operators/corpus.bigram_logprob)."""
    from .operators.corpus import bigram_logprob

    docs = load_table(spark, sf_dir, "documents")
    return bigram_logprob(docs)


@query(
    "sample_weighted",
    oracle="""
    WITH scored AS (
      SELECT doc_id, CAST(n_chars AS DOUBLE) AS weight,
             round(
               ln((CAST('0x' || substr(md5('0:' || CAST(doc_id AS VARCHAR)), 1, 15)
                        AS BIGINT) + 1) / 1152921504606846976.0)
               / CAST(n_chars AS DOUBLE), 6) AS race_score
      FROM documents
    )
    SELECT doc_id, weight, race_score, rank FROM (
      SELECT doc_id, weight, race_score,
             ROW_NUMBER() OVER (ORDER BY race_score DESC, doc_id ASC) AS rank
      FROM scored
    ) WHERE rank <= 100
    """,
)
def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted corpus draw (corpus.weighted_sample): 100 docs
    without replacement, inclusion probability ∝ n_chars, via the
    deterministic Efraimidis-Spirakis exponential race (u from
    hash60(seed:id), rank on round(ln(u)/w, 6) with id tiebreak). Gated
    with the bucket prefilter ON (B=16) — the bounded-window scale path
    the oracle's plain global rank must match exactly."""
    from .operators.corpus import weighted_sample

    docs = load_table(spark, sf_dir, "documents")
    return weighted_sample(
        docs, n=100, weight_col="n_chars", seed=0, prefilter_buckets=16
    )
