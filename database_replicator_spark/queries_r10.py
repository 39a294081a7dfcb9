"""Round-10 query-surface additions (eight gates over five tiers).

Sketch: a mergeable quantile sketch (KLL family, Karnin-Lang-Liberty
FOCS'16 — operators/kll.py) so percentile profiling joins
KMV/CMS/Bloom/MG in the storable-mergeable-state story. Retrieval:
position-aware evidence (minimal phrase windows over positional
postings) for verbatim-quote contamination checks. Multimodal:
perceptual-hash near-dup for ALL THREE modalities — image aHash + dHash
(the DCT flavor is python-replay-only; a DCT is not SQL-expressible),
video frame-signature, audio energy-landscape — riding the text tier's
banded-hamming machinery. Dedup: record linkage by blocking +
thresholded edit distance. Analytics: OHLC time-bucket bars
(rank-1 open/close under a total order).

Determinism follows the house rules (queries.py): integer arithmetic for
ranks, fixed-point scores, and hash bits; identical aliases both sides;
id tiebreaks. Reference provenance: the reference engine (a replication
engine) has none of these surfaces — they are the LLM-pipeline
extensions the build mandate grades as first-class; algorithms are the
published ones (Karnin et al. 2016; Clarke et al. 2000 and Metzler &
Croft 2005 for proximity; Krawetz's aHash/dHash notes and
Haitsma-Kalker ISMIR'02 for the perceptual hashes; Christen 2012 for
blocking-based record linkage).
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
    0.99*100 = 99.00000000000001). Runs the FUSED build→merge→extract
    (kll_group_quantiles) — one fewer Arrow round-trip of nested level
    arrays than the storable kll_sketch/kll_quantile_values pair, which
    tests pin value-identical.

    merge_partitions=1: the (month × priority) grain is BOUNDED (~400
    groups at any SF — it grows with the calendar, not the data), so the
    k-bounded partial states merge in one task; the heavy partial build
    keeps full scan parallelism. No trailing orderBy: a global sort's
    range-sampling pass re-executes the whole Python pipeline (measured
    +2 s at sf0.1), the single merge task already emits a total order,
    and the driver's value-hash is order-insensitive."""
    from .operators.kll import kll_group_quantiles

    orders = load_table(spark, sf_dir, "orders")
    v = orders.select(
        F.date_trunc("month", F.col("o_orderdate")).alias("o_month"),
        "o_orderpriority",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    return kll_group_quantiles(
        v,
        ["o_month", "o_orderpriority"],
        "cents",
        [50, 90, 99],
        k=_KLL_K,
        merge_partitions=1,
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


# ---------------------------------------------------------------------------
# multimodal_audio_neardup — the audio tier's gated fingerprint path
# (operators/multimodal.py audio_fingerprint, the Haitsma-Kalker
# energy-landscape hash on the byte-PCM stand-in). Payloads are padded/
# truncated to exactly 234 bytes (13 frames x 18), a one-byte edit
# perturbs <= ~4 sign bits, and the oracle recomputes every band energy
# and double-difference bit from the same bytes.
# ---------------------------------------------------------------------------

_AUDIO_NEED = 234
_AUDIO_MAXHAM = 6


@query(
    "multimodal_audio_neardup",
    oracle=f"""
    WITH base AS (
      SELECT doc_id,
             substr(trim(regexp_replace(lower(COALESCE(text, '')),
                                        '\\s+', ' ', 'g'))
                    || repeat('x', 234), 1, 234) AS s
      FROM documents
    ),
    items AS (
      SELECT doc_id * 2 AS id, s FROM base
      UNION ALL
      SELECT doc_id * 2 + 1 AS id,
             substr(s, 1, 49) || '#' || substr(s, 51) AS s
      FROM base
    ),
    feats AS (
      SELECT id, [ord(substr(s, i, 1)) FOR i IN range(1, 235)] AS f
      FROM items
    ),
    energies AS (
      SELECT id, [f[1] + f[2] + f[3], f[4] + f[5] + f[6], f[7] + f[8] + f[9], f[10] + f[11] + f[12], f[13] + f[14] + f[15], f[16] + f[17] + f[18], f[19] + f[20] + f[21], f[22] + f[23] + f[24], f[25] + f[26] + f[27], f[28] + f[29] + f[30], f[31] + f[32] + f[33], f[34] + f[35] + f[36], f[37] + f[38] + f[39], f[40] + f[41] + f[42], f[43] + f[44] + f[45], f[46] + f[47] + f[48], f[49] + f[50] + f[51], f[52] + f[53] + f[54], f[55] + f[56] + f[57], f[58] + f[59] + f[60], f[61] + f[62] + f[63], f[64] + f[65] + f[66], f[67] + f[68] + f[69], f[70] + f[71] + f[72], f[73] + f[74] + f[75], f[76] + f[77] + f[78], f[79] + f[80] + f[81], f[82] + f[83] + f[84], f[85] + f[86] + f[87], f[88] + f[89] + f[90], f[91] + f[92] + f[93], f[94] + f[95] + f[96], f[97] + f[98] + f[99], f[100] + f[101] + f[102], f[103] + f[104] + f[105], f[106] + f[107] + f[108], f[109] + f[110] + f[111], f[112] + f[113] + f[114], f[115] + f[116] + f[117], f[118] + f[119] + f[120], f[121] + f[122] + f[123], f[124] + f[125] + f[126], f[127] + f[128] + f[129], f[130] + f[131] + f[132], f[133] + f[134] + f[135], f[136] + f[137] + f[138], f[139] + f[140] + f[141], f[142] + f[143] + f[144], f[145] + f[146] + f[147], f[148] + f[149] + f[150], f[151] + f[152] + f[153], f[154] + f[155] + f[156], f[157] + f[158] + f[159], f[160] + f[161] + f[162], f[163] + f[164] + f[165], f[166] + f[167] + f[168], f[169] + f[170] + f[171], f[172] + f[173] + f[174], f[175] + f[176] + f[177], f[178] + f[179] + f[180], f[181] + f[182] + f[183], f[184] + f[185] + f[186], f[187] + f[188] + f[189], f[190] + f[191] + f[192], f[193] + f[194] + f[195], f[196] + f[197] + f[198], f[199] + f[200] + f[201], f[202] + f[203] + f[204], f[205] + f[206] + f[207], f[208] + f[209] + f[210], f[211] + f[212] + f[213], f[214] + f[215] + f[216], f[217] + f[218] + f[219], f[220] + f[221] + f[222], f[223] + f[224] + f[225], f[226] + f[227] + f[228], f[229] + f[230] + f[231], f[232] + f[233] + f[234]] AS e
      FROM feats
    ),
    sig AS (
      SELECT id,
             CAST(list_sum([
               CASE WHEN (e[7] - e[8]) - (e[1] - e[2]) > 0 THEN CAST(POWER(2, 0) AS BIGINT) ELSE 0 END,
               CASE WHEN (e[8] - e[9]) - (e[2] - e[3]) > 0 THEN CAST(POWER(2, 1) AS BIGINT) ELSE 0 END,
               CASE WHEN (e[9] - e[10]) - (e[3] - e[4]) > 0 THEN CAST(POWER(2, 2) AS BIGINT) ELSE 0 END,
               CASE WHEN (e[10] - e[11]) - (e[4] - e[5]) > 0 THEN CAST(POWER(2, 3) AS BIGINT) ELSE 0 END,
               CASE WHEN (e[11] - e[12]) - (e[5] - e[6]) > 0 THEN CAST(POWER(2, 4) AS BIGINT) ELSE 0 END,
               CASE WHEN (e[13] - e[14]) - (e[7] - e[8]) > 0 THEN CAST(POWER(2, 5) AS BIGINT) ELSE 0 END,
               CASE WHEN (e[14] - e[15]) - (e[8] - e[9]) > 0 THEN CAST(POWER(2, 6) AS BIGINT) ELSE 0 END,
               CASE WHEN (e[15] - e[16]) - (e[9] - e[10]) > 0 THEN CAST(POWER(2, 7) AS BIGINT) ELSE 0 END,
               CASE WHEN (e[16] - e[17]) - (e[10] - e[11]) > 0 THEN CAST(POWER(2, 8) AS BIGINT) ELSE 0 END,
               CASE WHEN (e[17] - e[18]) - (e[11] - e[12]) > 0 THEN CAST(POWER(2, 9) AS BIGINT) ELSE 0 END,
               CASE WHEN (e[19] - e[20]) - (e[13] - e[14]) > 0 THEN CAST(POWER(2, 10) AS BIGINT) ELSE 0 END,
               CASE WHEN (e[20] - e[21]) - (e[14] - e[15]) > 0 THEN CAST(POWER(2, 11) AS BIGINT) ELSE 0 END,
               CASE WHEN (e[21] - e[22]) - (e[15] - e[16]) > 0 THEN CAST(POWER(2, 12) AS BIGINT) ELSE 0 END,
               CASE WHEN (e[22] - e[23]) - (e[16] - e[17]) > 0 THEN CAST(POWER(2, 13) AS BIGINT) ELSE 0 END,
               CASE WHEN (e[23] - e[24]) - (e[17] - e[18]) > 0 THEN CAST(POWER(2, 14) AS BIGINT) ELSE 0 END,
               CASE WHEN (e[25] - e[26]) - (e[19] - e[20]) > 0 THEN CAST(POWER(2, 15) AS BIGINT) ELSE 0 END,
               CASE WHEN (e[26] - e[27]) - (e[20] - e[21]) > 0 THEN CAST(POWER(2, 16) AS BIGINT) ELSE 0 END,
               CASE WHEN (e[27] - e[28]) - (e[21] - e[22]) > 0 THEN CAST(POWER(2, 17) AS BIGINT) ELSE 0 END,
               CASE WHEN (e[28] - e[29]) - (e[22] - e[23]) > 0 THEN CAST(POWER(2, 18) AS BIGINT) ELSE 0 END,
               CASE WHEN (e[29] - e[30]) - (e[23] - e[24]) > 0 THEN CAST(POWER(2, 19) AS BIGINT) ELSE 0 END,
               CASE WHEN (e[31] - e[32]) - (e[25] - e[26]) > 0 THEN CAST(POWER(2, 20) AS BIGINT) ELSE 0 END,
               CASE WHEN (e[32] - e[33]) - (e[26] - e[27]) > 0 THEN CAST(POWER(2, 21) AS BIGINT) ELSE 0 END,
               CASE WHEN (e[33] - e[34]) - (e[27] - e[28]) > 0 THEN CAST(POWER(2, 22) AS BIGINT) ELSE 0 END,
               CASE WHEN (e[34] - e[35]) - (e[28] - e[29]) > 0 THEN CAST(POWER(2, 23) AS BIGINT) ELSE 0 END,
               CASE WHEN (e[35] - e[36]) - (e[29] - e[30]) > 0 THEN CAST(POWER(2, 24) AS BIGINT) ELSE 0 END,
               CASE WHEN (e[37] - e[38]) - (e[31] - e[32]) > 0 THEN CAST(POWER(2, 25) AS BIGINT) ELSE 0 END,
               CASE WHEN (e[38] - e[39]) - (e[32] - e[33]) > 0 THEN CAST(POWER(2, 26) AS BIGINT) ELSE 0 END,
               CASE WHEN (e[39] - e[40]) - (e[33] - e[34]) > 0 THEN CAST(POWER(2, 27) AS BIGINT) ELSE 0 END,
               CASE WHEN (e[40] - e[41]) - (e[34] - e[35]) > 0 THEN CAST(POWER(2, 28) AS BIGINT) ELSE 0 END,
               CASE WHEN (e[41] - e[42]) - (e[35] - e[36]) > 0 THEN CAST(POWER(2, 29) AS BIGINT) ELSE 0 END,
               CASE WHEN (e[43] - e[44]) - (e[37] - e[38]) > 0 THEN CAST(POWER(2, 30) AS BIGINT) ELSE 0 END,
               CASE WHEN (e[44] - e[45]) - (e[38] - e[39]) > 0 THEN CAST(POWER(2, 31) AS BIGINT) ELSE 0 END,
               CASE WHEN (e[45] - e[46]) - (e[39] - e[40]) > 0 THEN CAST(POWER(2, 32) AS BIGINT) ELSE 0 END,
               CASE WHEN (e[46] - e[47]) - (e[40] - e[41]) > 0 THEN CAST(POWER(2, 33) AS BIGINT) ELSE 0 END,
               CASE WHEN (e[47] - e[48]) - (e[41] - e[42]) > 0 THEN CAST(POWER(2, 34) AS BIGINT) ELSE 0 END,
               CASE WHEN (e[49] - e[50]) - (e[43] - e[44]) > 0 THEN CAST(POWER(2, 35) AS BIGINT) ELSE 0 END,
               CASE WHEN (e[50] - e[51]) - (e[44] - e[45]) > 0 THEN CAST(POWER(2, 36) AS BIGINT) ELSE 0 END,
               CASE WHEN (e[51] - e[52]) - (e[45] - e[46]) > 0 THEN CAST(POWER(2, 37) AS BIGINT) ELSE 0 END,
               CASE WHEN (e[52] - e[53]) - (e[46] - e[47]) > 0 THEN CAST(POWER(2, 38) AS BIGINT) ELSE 0 END,
               CASE WHEN (e[53] - e[54]) - (e[47] - e[48]) > 0 THEN CAST(POWER(2, 39) AS BIGINT) ELSE 0 END,
               CASE WHEN (e[55] - e[56]) - (e[49] - e[50]) > 0 THEN CAST(POWER(2, 40) AS BIGINT) ELSE 0 END,
               CASE WHEN (e[56] - e[57]) - (e[50] - e[51]) > 0 THEN CAST(POWER(2, 41) AS BIGINT) ELSE 0 END,
               CASE WHEN (e[57] - e[58]) - (e[51] - e[52]) > 0 THEN CAST(POWER(2, 42) AS BIGINT) ELSE 0 END,
               CASE WHEN (e[58] - e[59]) - (e[52] - e[53]) > 0 THEN CAST(POWER(2, 43) AS BIGINT) ELSE 0 END,
               CASE WHEN (e[59] - e[60]) - (e[53] - e[54]) > 0 THEN CAST(POWER(2, 44) AS BIGINT) ELSE 0 END,
               CASE WHEN (e[61] - e[62]) - (e[55] - e[56]) > 0 THEN CAST(POWER(2, 45) AS BIGINT) ELSE 0 END,
               CASE WHEN (e[62] - e[63]) - (e[56] - e[57]) > 0 THEN CAST(POWER(2, 46) AS BIGINT) ELSE 0 END,
               CASE WHEN (e[63] - e[64]) - (e[57] - e[58]) > 0 THEN CAST(POWER(2, 47) AS BIGINT) ELSE 0 END,
               CASE WHEN (e[64] - e[65]) - (e[58] - e[59]) > 0 THEN CAST(POWER(2, 48) AS BIGINT) ELSE 0 END,
               CASE WHEN (e[65] - e[66]) - (e[59] - e[60]) > 0 THEN CAST(POWER(2, 49) AS BIGINT) ELSE 0 END,
               CASE WHEN (e[67] - e[68]) - (e[61] - e[62]) > 0 THEN CAST(POWER(2, 50) AS BIGINT) ELSE 0 END,
               CASE WHEN (e[68] - e[69]) - (e[62] - e[63]) > 0 THEN CAST(POWER(2, 51) AS BIGINT) ELSE 0 END,
               CASE WHEN (e[69] - e[70]) - (e[63] - e[64]) > 0 THEN CAST(POWER(2, 52) AS BIGINT) ELSE 0 END,
               CASE WHEN (e[70] - e[71]) - (e[64] - e[65]) > 0 THEN CAST(POWER(2, 53) AS BIGINT) ELSE 0 END,
               CASE WHEN (e[71] - e[72]) - (e[65] - e[66]) > 0 THEN CAST(POWER(2, 54) AS BIGINT) ELSE 0 END,
               CASE WHEN (e[73] - e[74]) - (e[67] - e[68]) > 0 THEN CAST(POWER(2, 55) AS BIGINT) ELSE 0 END,
               CASE WHEN (e[74] - e[75]) - (e[68] - e[69]) > 0 THEN CAST(POWER(2, 56) AS BIGINT) ELSE 0 END,
               CASE WHEN (e[75] - e[76]) - (e[69] - e[70]) > 0 THEN CAST(POWER(2, 57) AS BIGINT) ELSE 0 END,
               CASE WHEN (e[76] - e[77]) - (e[70] - e[71]) > 0 THEN CAST(POWER(2, 58) AS BIGINT) ELSE 0 END,
               CASE WHEN (e[77] - e[78]) - (e[71] - e[72]) > 0 THEN CAST(POWER(2, 59) AS BIGINT) ELSE 0 END
             ]) AS BIGINT) AS h
      FROM energies
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
    WHERE bit_count(xor(h1, h2)) <= {_AUDIO_MAXHAM}
    """,
)
def multimodal_audio_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate audio pairs (id1 < id2, hamming <= 6 over the
    60-bit energy-landscape fingerprint): byte-PCM stand-in decode, 13
    frames x 6 bands, double-difference sign bits, 15-bit banded join
    with the bucket cap — gain-invariant by construction (a constant
    offset cancels in both differences, test-pinned)."""
    from .operators.multimodal import (
        audio_fingerprint,
        media_table,
        phash_pairs,
    )
    from .operators.textops import normalize_text_expr

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        F.substring(
            F.concat(
                normalize_text_expr(F.coalesce(F.col("text"), F.lit(""))),
                F.lit("x" * _AUDIO_NEED),
            ),
            1,
            _AUDIO_NEED,
        ).alias("s"),
    )
    orig = base.select((F.col("doc_id") * 2).alias("id"), F.col("s"))
    pert = base.select(
        (F.col("doc_id") * 2 + 1).alias("id"),
        F.concat(
            F.substring(F.col("s"), 1, 49),
            F.lit("#"),
            F.substring(F.col("s"), 51, _AUDIO_NEED - 50),
        ).alias("s"),
    )
    items = orig.unionByName(pert).withColumn(
        "payload", F.encode(F.col("s"), "UTF-8")
    )
    media = media_table(items, "id", "payload", "audio/x-pcm8")
    sigs = audio_fingerprint(media)
    return phash_pairs(
        sigs,
        max_hamming=_AUDIO_MAXHAM,
        dim=60,
        n_bands=4,
        max_bucket_size=_PHASH_CAP,
    )


# ---------------------------------------------------------------------------
# events_ohlc_bars — the hypertable-rollup shape with FIRST/LAST-by-time
# semantics (OHLC candles): open/close are selected row values under a
# total (ts, event_id) order, high/low are plain extrema, volume/turnover
# the usual exact aggregates. Determinism: first/last via ROW_NUMBER over
# the identical total order on both engines (arg_min/arg_max tie rules
# differ across engines; rank-1 selection does not), turnover via the
# decimal-sum-then-double house rule. Plan: two windows + one groupBy,
# all on the same (event_type, hour) key — a single shuffle.
# ---------------------------------------------------------------------------


@query(
    "events_ohlc_bars",
    oracle="""
    WITH base AS (
      SELECT event_type,
             date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bar_start,
             event_id, ts, value
      FROM events
    ),
    ranked AS (
      SELECT *,
             ROW_NUMBER() OVER (PARTITION BY event_type, bar_start
                                ORDER BY ts ASC, event_id ASC) AS rn_a,
             ROW_NUMBER() OVER (PARTITION BY event_type, bar_start
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM base
    )
    SELECT event_type, bar_start,
           MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
           COUNT(*) AS volume,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS turnover
    FROM ranked
    GROUP BY event_type, bar_start
    """,
)
def events_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(event_type, hour) OHLC bars over the event stream."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("bar_start"),
        "event_id",
        "ts",
        "value",
    )
    w_a = Window.partitionBy("event_type", "bar_start").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    w_d = Window.partitionBy("event_type", "bar_start").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    ranked = base.withColumn("rn_a", F.row_number().over(w_a)).withColumn(
        "rn_d", F.row_number().over(w_d)
    )
    return ranked.groupBy("event_type", "bar_start").agg(
        F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
        F.count(F.lit(1)).alias("volume"),
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("turnover"),
    )


# ---------------------------------------------------------------------------
# doc_entity_linkage — record linkage by blocking + edit-distance verify
# (operators/dedup.py blocking_edit_pairs). Entities are fixed 40-char
# document prefixes plus a one-character-perturbed variant each (the
# typo'd-duplicate-record scenario), block key = first 8 chars (the
# perturbation at position 20 never touches it), Levenshtein ≤ 2.
# ---------------------------------------------------------------------------

_ENT_LEN = 40
_ENT_BLOCK = 8
_ENT_MAXD = 2


@query(
    "doc_entity_linkage",
    oracle=f"""
    WITH base AS (
      SELECT doc_id,
             substr(trim(regexp_replace(lower(COALESCE(text, '')),
                                        '\\s+', ' ', 'g'))
                    || repeat('x', {_ENT_LEN}), 1, {_ENT_LEN}) AS s
      FROM documents
    ),
    items AS (
      SELECT doc_id * 2 AS id, s FROM base
      UNION ALL
      SELECT doc_id * 2 + 1 AS id,
             substr(s, 1, 19) || '#' || substr(s, 21) AS s
      FROM base
    ),
    blocked AS (SELECT id, s, substr(s, 1, {_ENT_BLOCK}) AS blk FROM items),
    small AS (
      SELECT blk FROM blocked GROUP BY blk HAVING COUNT(*) <= 50
    ),
    kept AS (SELECT blocked.* FROM blocked JOIN small USING (blk)),
    pairs AS (
      SELECT DISTINCT a.id AS id1, b.id AS id2,
             CAST(levenshtein(a.s, b.s) AS INTEGER) AS distance
      FROM kept a JOIN kept b
        ON a.blk = b.blk AND a.id < b.id
      WHERE levenshtein(a.s, b.s) <= {_ENT_MAXD}
    )
    SELECT id1, id2, distance FROM pairs
    """,
)
def doc_entity_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-record pairs (id1 < id2, edit distance ≤ 2) over the
    synthetic entity strings — the blocking + thresholded-Levenshtein
    path the n-gram dedup tiers cannot express for short typo'd fields."""
    from .operators.dedup import blocking_edit_pairs

    docs = load_table(spark, sf_dir, "documents")
    from .operators.textops import normalize_text_expr

    base = docs.select(
        "doc_id",
        F.substring(
            F.concat(
                normalize_text_expr(F.coalesce(F.col("text"), F.lit(""))),
                F.lit("x" * _ENT_LEN),
            ),
            1,
            _ENT_LEN,
        ).alias("s"),
    )
    orig = base.select((F.col("doc_id") * 2).alias("id"), F.col("s"))
    pert = base.select(
        (F.col("doc_id") * 2 + 1).alias("id"),
        F.concat(
            F.substring(F.col("s"), 1, 19),
            F.lit("#"),
            F.substring(F.col("s"), 21, _ENT_LEN - 20),
        ).alias("s"),
    )
    items = orig.unionByName(pert)
    return blocking_edit_pairs(
        items,
        id_col="id",
        text_col="s",
        block_len=_ENT_BLOCK,
        max_distance=_ENT_MAXD,
    )
