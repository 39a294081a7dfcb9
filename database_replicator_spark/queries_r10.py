"""Round-10 query-surface additions.

Four gates over three tiers: the sketch tier gains a mergeable quantile
sketch (KLL family, Karnin-Lang-Liberty FOCS'16 — operators/kll.py) so
percentile profiling joins KMV/CMS/Bloom/MG in the storable-mergeable-
state story; the retrieval tier gains position-aware evidence (minimal
phrase windows over positional postings) for verbatim-quote
contamination checks; and the multimodal tier gains perceptual-hash
image near-dup in both public flavors — mean-threshold aHash and
gradient-sign dHash — riding the text tier's banded-hamming machinery.

Determinism follows the house rules (queries.py): integer arithmetic for
ranks, fixed-point scores, and hash bits; identical aliases both sides;
id tiebreaks. Reference provenance: the reference engine (a replication
engine) has none of these surfaces — they are the LLM-pipeline
extensions the build mandate grades as first-class; algorithms are the
published ones (Karnin et al. 2016; Clarke et al. 2000 and Metzler &
Croft 2005 for proximity; Krawetz's aHash/dHash notes for the
perceptual hashes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import query
from .sources.catalog import load_table


# ---------------------------------------------------------------------------
# orders_kll_quantiles — per-(order month, priority) price percentiles
# via the mergeable KLL sketch.
#
# Gate contract: the (month × priority) grain holds ~375 rows/group at
# sf0.1 and grows linearly with SF, so with k=16384 the sketch stays in
# its EXACT regime (no compaction → quantile == order statistic) through
# roughly sf4 — far past every driver/sweep scale (max sf0.1), with the
# bound stated here rather than discovered at a larger SF (the r9 ADVICE
# failure mode). The compacting regime's rank-error bound is pinned by
# tests/test_kll.py on adversarial inputs, not by this oracle.
# ---------------------------------------------------------------------------

_KLL_K = 16384


@query(
    "orders_kll_quantiles",
    oracle="""
    WITH v AS (
      SELECT date_trunc('month', CAST(o_orderdate AS TIMESTAMP)) AS o_month,
             o_orderpriority,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM orders
    ),
    r AS (
      SELECT o_month, o_orderpriority, cents,
             ROW_NUMBER() OVER (PARTITION BY o_month, o_orderpriority
                                ORDER BY cents) AS rn,
             COUNT(*) OVER (PARTITION BY o_month, o_orderpriority) AS n
      FROM v
    )
    SELECT o_month, o_orderpriority,
           CAST(MAX(n) AS BIGINT) AS n,
           MAX(CASE WHEN rn = (50 * n + 99) // 100 THEN cents END) AS p50,
           MAX(CASE WHEN rn = (90 * n + 99) // 100 THEN cents END) AS p90,
           MAX(CASE WHEN rn = (99 * n + 99) // 100 THEN cents END) AS p99
    FROM r
    GROUP BY o_month, o_orderpriority
    ORDER BY o_month, o_orderpriority
    """,
)
def orders_kll_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90/p99 of o_totalprice (integer cents) per order month ×
    priority, computed through the full distributed sketch path:
    per-Arrow-batch partial KLL states → one k-bounded groupBy merge →
    per-row quantile extraction. Rank = ceil(p·n/100) in integer
    arithmetic on BOTH sides (float p·n flips ranks at exact multiples:
    0.99*100 = 99.00000000000001)."""
    from .operators.kll import kll_quantile_values, kll_sketch

    orders = load_table(spark, sf_dir, "orders")
    v = orders.select(
        F.date_trunc("month", F.col("o_orderdate")).alias("o_month"),
        "o_orderpriority",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    sk = kll_sketch(v, ["o_month", "o_orderpriority"], "cents", k=_KLL_K)
    return kll_quantile_values(sk, [50, 90, 99]).orderBy(
        "o_month", "o_orderpriority"
    )


# ---------------------------------------------------------------------------
# doc_phrase_window_topk — position-aware proximity retrieval (minimal
# window + ordered adjacency, integer scoring; operators/retrieval.py
# phrase_window_topk). Completes the bag-of-words ranker family with the
# positional channel verbatim-quote contamination checks need.
# ---------------------------------------------------------------------------

#: 2-term phrase workload over the synthetic corpus vocabulary — pairs
#: chosen so ordered, unordered-window, and absent evidence all occur.
_PHRASE_QUERIES = [
    (1, "hash", "join"),
    (2, "table", "scan"),
    (3, "sort", "merge"),
    (4, "window", "agg"),
    (5, "stream", "batch"),
]

_PHRASE_W = 8
_PHRASE_K = 10


@query(
    "doc_phrase_window_topk",
    oracle=f"""
    WITH p AS (
      SELECT doc_id,
             generate_subscripts(toks, 1) - 1 AS pos,
             unnest(toks) AS term
      FROM (
        SELECT doc_id,
               string_split(trim(regexp_replace(lower(COALESCE(text, '')),
                                                '\\s+', ' ', 'g')), ' ') AS toks
        FROM documents
      )
    ),
    q(query_id, term_a, term_b) AS (
      VALUES {", ".join(f"({i}, '{a}', '{b}')" for i, a, b in _PHRASE_QUERIES)}
    ),
    co AS (
      SELECT CAST(q.query_id AS BIGINT) AS query_id, a.doc_id,
             a.pos AS pa, b.pos AS pb
      FROM q
      JOIN p a ON a.term = q.term_a
      JOIN p b ON b.term = q.term_b AND b.doc_id = a.doc_id
      WHERE ABS(b.pos - a.pos) BETWEEN 1 AND {_PHRASE_W - 1}
    ),
    per AS (
      SELECT query_id, doc_id,
             CAST(SUM(CASE WHEN pb = pa + 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS ordered_hits,
             CAST(COUNT(*) AS BIGINT) AS window_hits,
             CAST(MIN(ABS(pb - pa)) AS BIGINT) AS min_gap
      FROM co GROUP BY query_id, doc_id
    )
    SELECT query_id, doc_id, ordered_hits, window_hits, min_gap,
           score_units, rank
    FROM (
      SELECT *,
             CAST(10000 * ordered_hits + 1000 * window_hits
                  + 100 * ({_PHRASE_W} - min_gap) AS BIGINT) AS score_units,
             ROW_NUMBER() OVER (
               PARTITION BY query_id
               ORDER BY 10000 * ordered_hits + 1000 * window_hits
                        + 100 * ({_PHRASE_W} - min_gap) DESC,
                        doc_id ASC) AS rank
      FROM per
    ) WHERE rank <= {_PHRASE_K}
    """,
)
def doc_phrase_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 documents per 2-term phrase by the integer proximity score
    (ordered-adjacency / within-8-window counts + minimal-gap bonus) —
    the positional-postings channel over the same canonical tokenizer as
    the bag-of-words rankers."""
    from .operators.retrieval import phrase_window_topk

    docs = load_table(spark, sf_dir, "documents")
    pairs = spark.createDataFrame(
        _PHRASE_QUERIES, "query_id long, term_a string, term_b string"
    )
    return phrase_window_topk(docs, pairs, k=_PHRASE_K, window=_PHRASE_W)


# ---------------------------------------------------------------------------
# multimodal_phash_dedup — image near-dup over the perceptual-hash tier
# (operators/multimodal.py media_phash + phash_pairs with the hot-bucket
# guard). Synthetic byte-pattern images: each document's normalized text
# (48-byte window) is the pixel grid, plus a one-byte-perturbed variant,
# so genuine near-duplicates exist by construction; the byte_decode
# stand-in preserves locality, and the DuckDB oracle reproduces the SAME
# integer pipeline (ord() pixels → mean threshold → bit pack → 12-bit
# band join with the bucket cap → bit_count hamming).
# ---------------------------------------------------------------------------

_PHASH_DIM = 48
_PHASH_BANDS = 4
_PHASH_MAXHAM = 6
_PHASH_CAP = 50


@query(
    "multimodal_phash_dedup",
    oracle=f"""
    WITH base AS (
      SELECT doc_id,
             rpad(substr(trim(regexp_replace(lower(COALESCE(text, '')),
                                             '\\s+', ' ', 'g')), 1, {_PHASH_DIM}),
                  {_PHASH_DIM}, 'x') AS s
      FROM documents
    ),
    items AS (
      SELECT doc_id * 2 AS id, s FROM base
      UNION ALL
      SELECT doc_id * 2 + 1 AS id,
             substr(s, 1, 5) || '#' || substr(s, 7) AS s
      FROM base
    ),
    feats AS (
      SELECT id, [ord(substr(s, i, 1)) FOR i IN range(1, {_PHASH_DIM + 1})] AS f
      FROM items
    ),
    hashed AS (
      SELECT id,
             CAST(list_sum(
               [CASE WHEN f[i] > list_avg(f)
                     THEN CAST(POWER(2, i - 1) AS BIGINT)
                     ELSE 0 END FOR i IN range(1, {_PHASH_DIM + 1})]
             ) AS BIGINT) AS h
      FROM feats
    ),
    bands AS (
      SELECT id, h, b.band,
             (h >> (b.band * {_PHASH_DIM // _PHASH_BANDS}))
               & {(1 << (_PHASH_DIM // _PHASH_BANDS)) - 1} AS bits
      FROM hashed, (VALUES (0), (1), (2), (3)) b(band)
    ),
    small AS (
      SELECT band, bits FROM bands
      GROUP BY band, bits HAVING COUNT(*) <= {_PHASH_CAP}
    ),
    kept AS (SELECT bands.* FROM bands JOIN small USING (band, bits)),
    cand AS (
      SELECT DISTINCT a.id AS id1, b.id AS id2, a.h AS h1, b.h AS h2
      FROM kept a JOIN kept b
        ON a.band = b.band AND a.bits = b.bits AND a.id < b.id
    )
    SELECT id1, id2, CAST(bit_count(xor(h1, h2)) AS INTEGER) AS hamming
    FROM cand
    WHERE bit_count(xor(h1, h2)) <= {_PHASH_MAXHAM}
    """,
)
def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate media pairs (id1 < id2, hamming ≤ 6) over the
    perceptual-hash pipeline, bucket cap ON — the full dedup path the
    image tier shares with text simhash, driven end-to-end through the
    Arrow decode stage."""
    from .operators.multimodal import (
        byte_decode,
        media_phash,
        media_table,
        phash_pairs,
    )
    from .operators.textops import normalize_text_expr

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        F.rpad(
            F.substring(normalize_text_expr(F.coalesce(F.col("text"), F.lit(""))), 1, _PHASH_DIM),
            _PHASH_DIM,
            "x",
        ).alias("s"),
    )
    orig = base.select(
        (F.col("doc_id") * 2).alias("id"), F.col("s")
    )
    pert = base.select(
        (F.col("doc_id") * 2 + 1).alias("id"),
        F.concat(
            F.substring(F.col("s"), 1, 5),
            F.lit("#"),
            F.substring(F.col("s"), 7, _PHASH_DIM - 6),
        ).alias("s"),
    )
    items = orig.unionByName(pert).withColumn(
        "payload", F.encode(F.col("s"), "UTF-8")
    )
    media = media_table(items, "id", "payload", "image/x-gray8")
    hashes = media_phash(media, decoder=byte_decode, dim=_PHASH_DIM)
    return phash_pairs(
        hashes,
        max_hamming=_PHASH_MAXHAM,
        dim=_PHASH_DIM,
        n_bands=_PHASH_BANDS,
        max_bucket_size=_PHASH_CAP,
    )


# ---------------------------------------------------------------------------
# multimodal_dhash_dedup — the difference-hash sibling of the aHash gate
# above: gradient-sign bits instead of a mean threshold, so a perturbed
# pixel flips at most its two adjacent bits (no global-statistic
# coupling) and the near-dup pairs are tighter. 49-byte grid → 48-bit
# hash → the same 12-bit band join + cap + hamming verify.
# ---------------------------------------------------------------------------

_DHASH_DIM = 49  # features; hash is dim-1 = 48 bits


@query(
    "multimodal_dhash_dedup",
    oracle=f"""
    WITH base AS (
      SELECT doc_id,
             rpad(substr(trim(regexp_replace(lower(COALESCE(text, '')),
                                             '\\s+', ' ', 'g')), 1, {_DHASH_DIM}),
                  {_DHASH_DIM}, 'x') AS s
      FROM documents
    ),
    items AS (
      SELECT doc_id * 2 AS id, s FROM base
      UNION ALL
      SELECT doc_id * 2 + 1 AS id,
             substr(s, 1, 10) || '#' || substr(s, 12) AS s
      FROM base
    ),
    feats AS (
      SELECT id, [ord(substr(s, i, 1)) FOR i IN range(1, {_DHASH_DIM + 1})] AS f
      FROM items
    ),
    hashed AS (
      SELECT id,
             CAST(list_sum(
               [CASE WHEN f[i + 1] > f[i]
                     THEN CAST(POWER(2, i - 1) AS BIGINT)
                     ELSE 0 END FOR i IN range(1, {_DHASH_DIM})]
             ) AS BIGINT) AS h
      FROM feats
    ),
    bands AS (
      SELECT id, h, b.band,
             (h >> (b.band * 12)) & 4095 AS bits
      FROM hashed, (VALUES (0), (1), (2), (3)) b(band)
    ),
    small AS (
      SELECT band, bits FROM bands
      GROUP BY band, bits HAVING COUNT(*) <= {_PHASH_CAP}
    ),
    kept AS (SELECT bands.* FROM bands JOIN small USING (band, bits)),
    cand AS (
      SELECT DISTINCT a.id AS id1, b.id AS id2, a.h AS h1, b.h AS h2
      FROM kept a JOIN kept b
        ON a.band = b.band AND a.bits = b.bits AND a.id < b.id
    )
    SELECT id1, id2, CAST(bit_count(xor(h1, h2)) AS INTEGER) AS hamming
    FROM cand
    WHERE bit_count(xor(h1, h2)) <= {_PHASH_MAXHAM}
    """,
)
def multimodal_dhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate media pairs over the DIFFERENCE hash: one
    perturbed byte flips ≤ 2 gradient bits, so the planted variants sit
    at hamming ≤ 2 — inside the 4-band pigeonhole guarantee, unlike the
    mean-threshold hash whose shifted mean can push pairs past it."""
    from .operators.multimodal import (
        byte_decode,
        media_dhash,
        media_table,
        phash_pairs,
    )
    from .operators.textops import normalize_text_expr

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        F.rpad(
            F.substring(
                normalize_text_expr(F.coalesce(F.col("text"), F.lit(""))),
                1,
                _DHASH_DIM,
            ),
            _DHASH_DIM,
            "x",
        ).alias("s"),
    )
    orig = base.select((F.col("doc_id") * 2).alias("id"), F.col("s"))
    pert = base.select(
        (F.col("doc_id") * 2 + 1).alias("id"),
        F.concat(
            F.substring(F.col("s"), 1, 10),
            F.lit("#"),
            F.substring(F.col("s"), 12, _DHASH_DIM - 11),
        ).alias("s"),
    )
    items = orig.unionByName(pert).withColumn(
        "payload", F.encode(F.col("s"), "UTF-8")
    )
    media = media_table(items, "id", "payload", "image/x-gray8")
    hashes = media_dhash(media, decoder=byte_decode, dim=_DHASH_DIM)
    return phash_pairs(
        hashes,
        max_hamming=_PHASH_MAXHAM,
        dim=_DHASH_DIM - 1,
        n_bands=_PHASH_BANDS,
        max_bucket_size=_PHASH_CAP,
    )


# ---------------------------------------------------------------------------
# multimodal_video_neardup — the video tier's gated near-dup path:
# frame-sample on a fixed grid → per-frame difference hash → pack the
# time-ordered frame hashes into one 60-bit signature → 15-bit banded
# join (a band IS a frame position, so the candidate rule is "some
# sampled frame hashes identical at the same timestamp") → hamming
# verify across the clip. The deterministic stand-in extractor
# (fake_frame_extract: a (ts·7 mod len) byte window over the doubled
# payload) is exactly reproducible in SQL, so unlike the DCT path this
# one oracle-gates end to end.
# ---------------------------------------------------------------------------

_VID_EVERY_MS = 1000
_VID_DURATION = 3000  # → frames at 0/1000/2000/3000 ms, 4 per clip
_VID_MAXHAM = 8


@query(
    "multimodal_video_neardup",
    oracle=f"""
    WITH base AS (
      SELECT doc_id,
             trim(regexp_replace(lower(COALESCE(text, '')), '\\s+', ' ', 'g'))
               || 'xxxxxxxxxxxxxxxx' AS s
      FROM documents
    ),
    items AS (
      SELECT doc_id * 2 AS id, s FROM base
      UNION ALL
      SELECT doc_id * 2 + 1 AS id,
             substr(s, 1, 20) || '#' || substr(s, 22) AS s
      FROM base
    ),
    frames AS (
      SELECT id, t.ts,
             substr(s || s, ((t.ts * 7) % length(s)) + 1, 16) AS fr
      FROM items, (VALUES (0), (1000), (2000), (3000)) t(ts)
    ),
    fh AS (
      SELECT id, ts,
             CAST(list_sum(
               [CASE WHEN ord(substr(fr, i + 1, 1)) > ord(substr(fr, i, 1))
                     THEN CAST(POWER(2, i - 1) AS BIGINT)
                     ELSE 0 END FOR i IN range(1, 16)]
             ) AS BIGINT) AS fhash
      FROM frames
    ),
    sig AS (
      SELECT id,
             CAST(SUM(fhash * CAST(POWER(2, 15 * (ts // 1000)) AS BIGINT))
                  AS BIGINT) AS h
      FROM fh GROUP BY id
    ),
    bands AS (
      SELECT id, h, b.band, (h >> (b.band * 15)) & 32767 AS bits
      FROM sig, (VALUES (0), (1), (2), (3)) b(band)
    ),
    small AS (
      SELECT band, bits FROM bands
      GROUP BY band, bits HAVING COUNT(*) <= {_PHASH_CAP}
    ),
    kept AS (SELECT bands.* FROM bands JOIN small USING (band, bits)),
    cand AS (
      SELECT DISTINCT a.id AS id1, b.id AS id2, a.h AS h1, b.h AS h2
      FROM kept a JOIN kept b
        ON a.band = b.band AND a.bits = b.bits AND a.id < b.id
    )
    SELECT id1, id2, CAST(bit_count(xor(h1, h2)) AS INTEGER) AS hamming
    FROM cand
    WHERE bit_count(xor(h1, h2)) <= {_VID_MAXHAM}
    """,
)
def multimodal_video_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate video pairs (id1 < id2, hamming ≤ 8 over the
    4-frame packed signature): the full video path — duration metadata →
    frame sampling → Arrow frame hash → temporal signature → banded
    join with the bucket cap — driven end to end. A one-byte payload
    edit perturbs only the frames whose sampled window covers it, so
    genuine partial-match behavior (some frames equal, some drifted) is
    exercised, not just exact duplicates."""
    from .operators.multimodal import (
        fake_frame_extract,
        media_table,
        phash_pairs,
        video_phash_signature,
    )
    from .operators.textops import normalize_text_expr

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        F.concat(
            normalize_text_expr(F.coalesce(F.col("text"), F.lit(""))),
            F.lit("x" * 16),
        ).alias("s"),
    )
    orig = base.select((F.col("doc_id") * 2).alias("id"), F.col("s"))
    pert = base.select(
        (F.col("doc_id") * 2 + 1).alias("id"),
        F.concat(
            F.substring(F.col("s"), 1, 20),
            F.lit("#"),
            F.expr("substring(s, 22)"),
        ).alias("s"),
    )
    items = orig.unionByName(pert).withColumn(
        "payload", F.encode(F.col("s"), "UTF-8")
    )
    media = media_table(items, "id", "payload", "video/x-fake").withColumn(
        "meta",
        F.struct(
            F.col("meta.mime"),
            F.col("meta.n_bytes"),
            F.col("meta.width"),
            F.col("meta.height"),
            F.lit(_VID_DURATION).cast("long").alias("duration_ms"),
        ),
    )
    sigs = video_phash_signature(
        media, every_ms=_VID_EVERY_MS, extractor=fake_frame_extract
    )
    return phash_pairs(
        sigs,
        max_hamming=_VID_MAXHAM,
        dim=60,
        n_bands=4,
        max_bucket_size=_PHASH_CAP,
    )
