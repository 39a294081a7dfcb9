"""Round-11 query-surface additions.

Multimodal: the codec seam CLOSES for two real containers — uncompressed
BMP and PCM WAV parse natively (pure stdlib/numpy decoders,
operators/multimodal.py decode_bmp/decode_wav), so the perceptual-hash
dedup tier now runs on REAL media bytes end-to-end inside the sandbox:
fixtures are genuine BMP/WAV files (correct headers, palettes,
bottom-up rows, RIFF chunk lists), decoded by the magic-byte-dispatched
default_decoder, hashed and paired by the same banded-hamming machinery
as r10. The DuckDB oracles reproduce the PIXEL/SAMPLE pipeline from the
source text (the container encode→decode round trip is the identity on
the payload grid, which the decoder unit tests pin byte-exactly).

Streaming: the CDC apply path gains its first DuckDB-oracle gate —
a deterministic bounded replay (fixed change log derived from the
events table → multi-epoch Structured Streaming foreachBatch apply →
``_latest`` read back) compared against a window-over-change-log oracle
(r10 verdict ask #3).

Reference provenance: the CDC replay gates the S20/ST4-ST6 consumer
semantics (reference: sqlite-watcher consumer loop,
src/commands/sync_sqlite.rs:115-187 — per-op routing, last-write-wins
``_latest``, sync-state accounting); the media tier remains mandate
surface the reference does not have.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import query
from .sources.catalog import load_table

# ---------------------------------------------------------------------------
# multimodal_bmp_phash_dedup — difference-hash near-dup over REAL BMP
# files: each document's 49-char normalized-text window becomes the 7×7
# pixel grid of a genuine 8-bit BMP (1078-byte header+palette prefix,
# 4-byte-padded bottom-up rows), decoded by the magic-dispatched REAL
# parser, then the r10 dHash → banded-hamming pipeline. The oracle
# computes the identical pixel pipeline from the text directly: BMP
# encode→decode is the identity on the grid (unit-test-pinned), so both
# sides see the same 49 features.
# ---------------------------------------------------------------------------

_BMP_SIDE = 7
_BMP_DIM = _BMP_SIDE * _BMP_SIDE  # 49 features → 48-bit dHash
_BMP_MAXHAM = 6
_BMP_CAP = 50


@query(
    "multimodal_bmp_phash_dedup",
    oracle=f"""
    WITH base AS (
      SELECT doc_id,
             rpad(substr(trim(regexp_replace(lower(COALESCE(text, '')),
                                             '\\s+', ' ', 'g')), 1, {_BMP_DIM}),
                  {_BMP_DIM}, 'x') AS s
      FROM documents
    ),
    items AS (
      SELECT doc_id * 2 AS id, s FROM base
      UNION ALL
      SELECT doc_id * 2 + 1 AS id,
             substr(s, 1, 29) || '#' || substr(s, 31) AS s
      FROM base
    ),
    feats AS (
      SELECT id, [ord(substr(s, i, 1)) FOR i IN range(1, {_BMP_DIM + 1})] AS f
      FROM items
    ),
    hashed AS (
      SELECT id,
             CAST(list_sum(
               [CASE WHEN f[i + 1] > f[i]
                     THEN CAST(POWER(2, i - 1) AS BIGINT)
                     ELSE 0 END FOR i IN range(1, {_BMP_DIM})]
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
      GROUP BY band, bits HAVING COUNT(*) <= {_BMP_CAP}
    ),
    kept AS (SELECT bands.* FROM bands JOIN small USING (band, bits)),
    cand AS (
      SELECT DISTINCT a.id AS id1, b.id AS id2, a.h AS h1, b.h AS h2
      FROM kept a JOIN kept b
        ON a.band = b.band AND a.bits = b.bits AND a.id < b.id
    )
    SELECT id1, id2, CAST(bit_count(xor(h1, h2)) AS INTEGER) AS hamming
    FROM cand
    WHERE bit_count(xor(h1, h2)) <= {_BMP_MAXHAM}
    """,
)
def multimodal_bmp_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate image pairs (id1 < id2, hamming ≤ 6 over the 48-bit
    dHash) where every payload is a REAL uncompressed 8-bit BMP built
    plan-side (constant header/palette prefix + padded bottom-up pixel
    rows) and decoded by the real parser via magic-byte dispatch — the
    end-to-end real-media path the r10 tier stubbed."""
    from .operators.multimodal import (
        bmp_prefix,
        default_decoder,
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
                _BMP_DIM,
            ),
            _BMP_DIM,
            "x",
        ).alias("s"),
    )
    orig = base.select((F.col("doc_id") * 2).alias("id"), F.col("s"))
    pert = base.select(
        (F.col("doc_id") * 2 + 1).alias("id"),
        F.concat(
            F.substring(F.col("s"), 1, 29),
            F.lit("#"),
            F.substring(F.col("s"), 31, _BMP_DIM - 30),
        ).alias("s"),
    )
    # mint a REAL BMP: constant prefix + 4-byte-padded rows, bottom-up
    row_exprs = [
        F.concat(
            F.encode(
                F.substring(F.col("s"), r * _BMP_SIDE + 1, _BMP_SIDE), "UTF-8"
            ),
            F.lit(b"\x00"),  # pad 7-byte row to the 8-byte boundary
        )
        for r in reversed(range(_BMP_SIDE))
    ]
    items = orig.unionByName(pert).withColumn(
        "payload", F.concat(F.lit(bmp_prefix(_BMP_SIDE, _BMP_SIDE)), *row_exprs)
    )
    media = media_table(items, "id", "payload", "image/bmp")
    hashes = media_dhash(media, decoder=default_decoder, dim=_BMP_DIM)
    return phash_pairs(
        hashes,
        max_hamming=_BMP_MAXHAM,
        dim=_BMP_DIM - 1,
        n_bands=4,
        max_bucket_size=_BMP_CAP,
    )


# ---------------------------------------------------------------------------
# multimodal_wav_audio_neardup — the Haitsma-Kalker fingerprint over REAL
# PCM WAV files: 234 8-bit mono samples per clip (44-byte RIFF prefix +
# sample bytes), chunk-walked and decoded by decode_wav, then the r10
# energy-landscape double-difference pipeline. Oracle computed from the
# source text (decode is the identity on the sample bytes).
# ---------------------------------------------------------------------------

_WAV_NEED = 234  # 13 frames × 18 bytes (6 bands × 3)
_WAV_MAXHAM = 6


def _audio_energy_oracle(perturb_pos: int) -> str:
    """The audio-fingerprint oracle as a generated SQL string (78 band
    energies, 60 double-difference sign bits) — same pipeline as the r10
    hand-written multimodal_audio_neardup oracle, parameterized by the
    perturbation position."""
    energies = ", ".join(
        f"f[{3 * i + 1}] + f[{3 * i + 2}] + f[{3 * i + 3}]" for i in range(78)
    )
    bits = []
    for c in range(12):
        for m in range(5):
            bit = c * 5 + m
            a, b = (c + 1) * 6 + m + 1, (c + 1) * 6 + m + 2
            p, q = c * 6 + m + 1, c * 6 + m + 2
            bits.append(
                f"CASE WHEN (e[{a}] - e[{b}]) - (e[{p}] - e[{q}]) > 0 "
                f"THEN CAST(POWER(2, {bit}) AS BIGINT) ELSE 0 END"
            )
    bit_list = ",\n               ".join(bits)
    return f"""
    WITH base AS (
      SELECT doc_id,
             substr(trim(regexp_replace(lower(COALESCE(text, '')),
                                        '\\s+', ' ', 'g'))
                    || repeat('x', {_WAV_NEED}), 1, {_WAV_NEED}) AS s
      FROM documents
    ),
    items AS (
      SELECT doc_id * 2 AS id, s FROM base
      UNION ALL
      SELECT doc_id * 2 + 1 AS id,
             substr(s, 1, {perturb_pos - 1}) || '#'
               || substr(s, {perturb_pos + 1}) AS s
      FROM base
    ),
    feats AS (
      SELECT id, [ord(substr(s, i, 1)) FOR i IN range(1, {_WAV_NEED + 1})] AS f
      FROM items
    ),
    energies AS (
      SELECT id, [{energies}] AS e
      FROM feats
    ),
    sig AS (
      SELECT id,
             CAST(list_sum([
               {bit_list}
             ]) AS BIGINT) AS h
      FROM energies
    ),
    bands AS (
      SELECT id, h, b.band, (h >> (b.band * 15)) & 32767 AS bits
      FROM sig, (VALUES (0), (1), (2), (3)) b(band)
    ),
    small AS (
      SELECT band, bits FROM bands
      GROUP BY band, bits HAVING COUNT(*) <= 50
    ),
    kept AS (SELECT bands.* FROM bands JOIN small USING (band, bits)),
    cand AS (
      SELECT DISTINCT a.id AS id1, b.id AS id2, a.h AS h1, b.h AS h2
      FROM kept a JOIN kept b
        ON a.band = b.band AND a.bits = b.bits AND a.id < b.id
    )
    SELECT id1, id2, CAST(bit_count(xor(h1, h2)) AS INTEGER) AS hamming
    FROM cand
    WHERE bit_count(xor(h1, h2)) <= {_WAV_MAXHAM}
    """


@query("multimodal_wav_audio_neardup", oracle=_audio_energy_oracle(100))
def multimodal_wav_audio_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate audio pairs (id1 < id2, hamming ≤ 6) where every
    payload is a REAL 8-bit mono PCM WAV (RIFF chunk list + 234 sample
    bytes), decoded by the chunk-walking real parser — the audio twin of
    the BMP gate, perturbation at sample 100."""
    from .operators.multimodal import (
        audio_fingerprint,
        decode_wav,
        media_table,
        phash_pairs,
        wav_prefix,
    )
    from .operators.textops import normalize_text_expr

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        F.substring(
            F.concat(
                normalize_text_expr(F.coalesce(F.col("text"), F.lit(""))),
                F.lit("x" * _WAV_NEED),
            ),
            1,
            _WAV_NEED,
        ).alias("s"),
    )
    orig = base.select((F.col("doc_id") * 2).alias("id"), F.col("s"))
    pert = base.select(
        (F.col("doc_id") * 2 + 1).alias("id"),
        F.concat(
            F.substring(F.col("s"), 1, 99),
            F.lit("#"),
            F.substring(F.col("s"), 101, _WAV_NEED - 100),
        ).alias("s"),
    )
    items = orig.unionByName(pert).withColumn(
        "payload",
        F.concat(F.lit(wav_prefix(_WAV_NEED)), F.encode(F.col("s"), "UTF-8")),
    )
    media = media_table(items, "id", "payload", "audio/wav")
    sigs = audio_fingerprint(media, decoder=decode_wav)
    return phash_pairs(
        sigs,
        max_hamming=_WAV_MAXHAM,
        dim=60,
        n_bands=4,
        max_bucket_size=50,
    )


# ---------------------------------------------------------------------------
# cdc_replay_latest — the streaming CDC apply path's first DuckDB-oracle
# gate (r10 verdict ask #3): a deterministic change log derived from the
# events table replays through the REAL Structured-Streaming consumer
# (file source → maxFilesPerTrigger=1 micro-batches → ChangeApplier
# foreachBatch → bucketed ``_latest`` + ``_sync_state``), and the applied
# state reads back as a DataFrame the oracle recomputes as one
# window-over-change-log pass. Covers S20/ST4-ST6 end to end (reference:
# sqlite-watcher consumer, src/commands/sync_sqlite.rs:115-187) — not
# just the per-operator units the streaming tier had so far.
#
# Deliberate divergence from the reference's batch ordering: the
# reference applies all upserts then all deletes per batch (a same-batch
# delete wins regardless of change order); ChangeApplier and these
# oracles use last-write-wins by change_id (order-robust / idempotent
# under at-least-once redelivery — see replay_change_log's docstring).
# The derived logs here give each PK one op per epoch, where the two
# semantics coincide.
# ---------------------------------------------------------------------------

#: 3 epochs × (1/5 of events): enough to exercise the multi-epoch merge
#: path (batch ⊕ previous _latest, HWM accounting across commits) while
#: keeping the gate's wall cost in the normal bench band — per-epoch
#: fixed cost (checkpoint commit + bucket rewrite jobs) dominates at
#: small SF, so epochs are the budget knob, not rows.
_REPLAY_EPOCHS = 3


@query(
    "cdc_replay_latest",
    oracle="""
    WITH ch AS (
      SELECT CAST(event_id AS BIGINT) AS change_id,
             CAST(user_id AS VARCHAR) AS pk,
             user_id, event_type, value,
             CASE WHEN event_type = 'signup' THEN 'insert'
                  WHEN event_type = 'purchase' THEN 'delete'
                  ELSE 'update' END AS op
      FROM events
      WHERE event_id % 5 = 0
    ),
    latest AS (
      SELECT pk, user_id, event_type, value, change_id FROM (
        SELECT pk, user_id, event_type, value, change_id, op,
               ROW_NUMBER() OVER (PARTITION BY pk ORDER BY change_id DESC)
                 AS rn
        FROM ch
      ) WHERE rn = 1 AND op <> 'delete'
    ),
    state AS (
      SELECT MAX(change_id) AS last_change_id,
             CAST(COUNT(*) AS BIGINT) AS n_changes
      FROM ch
    )
    SELECT l.pk, l.user_id, l.event_type, l.value, l.change_id,
           s.last_change_id, s.n_changes
    FROM latest l CROSS JOIN state s
    """,
)
def cdc_replay_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final ``_latest`` state (plus the ``_sync_state`` high-water mark
    and exact change count as scalar columns) after replaying the
    event-derived change log through the streaming consumer: signup →
    insert, purchase → delete, else update; payload is the JSON document
    the applier stores and this gate parses back. The oracle is the
    declarative equivalent — last-write-wins per pk with deletes dropped.
    Work dir is recreated per call under /tmp (bounded: one dir per SF),
    so re-runs replay from genesis, never from a stale checkpoint."""
    import os as _os

    from .streaming.change_stream import replay_change_log

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_id") % 5 == 0
    )
    ch = ev.select(
        F.col("event_id").cast("bigint").alias("change_id"),
        F.lit("accounts").alias("table"),
        F.when(F.col("event_type") == "signup", "insert")
        .when(F.col("event_type") == "purchase", "delete")
        .otherwise("update")
        .alias("op"),
        F.col("user_id").cast("string").alias("pk"),
        F.to_json(F.struct("user_id", "event_type", "value")).alias("payload"),
    )
    work = _os.path.join(
        "/tmp",
        "spark_graft_replay",
        _os.path.basename(_os.path.normpath(sf_dir)),
    )
    latest, state = replay_change_log(
        spark, ch, work, epochs=_REPLAY_EPOCHS, n_buckets=8
    )
    parsed = latest.select(
        "pk",
        F.from_json(
            "payload", "user_id bigint, event_type string, value double"
        ).alias("_p"),
        "change_id",
    ).select(
        "pk",
        F.col("_p.user_id").alias("user_id"),
        F.col("_p.event_type").alias("event_type"),
        F.col("_p.value").alias("value"),
        "change_id",
    )
    # 1-row broadcast crossJoin: the scalar-fold idiom for attaching the
    # sync-state aggregates without a second replay
    return parsed.crossJoin(
        F.broadcast(state.select("last_change_id", "n_changes"))
    )


# ---------------------------------------------------------------------------
# cdc_replay_asof_vs_final — epoch time travel under the oracle: ONE
# bounded replay with an EXPLICIT, SQL-reproducible epoch boundary
# (chunk 0 = change_id ≤ max/2), then BOTH the as-of-epoch-0 snapshot
# (read_table_asof over the epoch-partitioned log) and the final
# ``_latest`` state, stacked under a snapshot marker. The oracle
# recomputes both as last-write-wins windows over the bounded/full
# change sets. Reference semantics: the reference can only reconstruct
# CURRENT state (its queue is consumed destructively); as-of reads are
# what the append-per-epoch log layout buys — gated here, previously
# unit-only.
# ---------------------------------------------------------------------------


@query(
    "cdc_replay_asof_vs_final",
    oracle="""
    WITH ch AS (
      SELECT CAST(event_id AS BIGINT) AS change_id,
             CAST(user_id AS VARCHAR) AS pk,
             user_id, value,
             CASE WHEN event_type = 'signup' THEN 'insert'
                  WHEN event_type = 'purchase' THEN 'delete'
                  ELSE 'update' END AS op
      FROM events
      WHERE event_id % 17 = 0
    ),
    b AS (SELECT MAX(change_id) // 2 AS bnd FROM ch),
    snap0 AS (
      SELECT pk, user_id, value, change_id FROM (
        SELECT pk, user_id, value, change_id, op,
               ROW_NUMBER() OVER (PARTITION BY pk ORDER BY change_id DESC)
                 AS rn
        FROM ch WHERE change_id <= (SELECT bnd FROM b)
      ) WHERE rn = 1 AND op <> 'delete'
    ),
    fin AS (
      SELECT pk, user_id, value, change_id FROM (
        SELECT pk, user_id, value, change_id, op,
               ROW_NUMBER() OVER (PARTITION BY pk ORDER BY change_id DESC)
                 AS rn
        FROM ch
      ) WHERE rn = 1 AND op <> 'delete'
    )
    SELECT 'asof_epoch0' AS snapshot, * FROM snap0
    UNION ALL
    SELECT 'final' AS snapshot, * FROM fin
    """,
)
def cdc_replay_asof_vs_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of-epoch-0 time travel AND the final applied state from one
    2-epoch replay (1/17 of events, explicit half-point chunk boundary
    so the oracle can reproduce it). The boundary max/2 is collected as
    one scalar — bounded metadata, the FK-edges/driver-fast-path class."""
    import os as _os

    from .streaming.change_stream import (
        read_table_asof,
        replay_change_log,
    )

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_id") % 17 == 0
    )
    ch = ev.select(
        F.col("event_id").cast("bigint").alias("change_id"),
        F.lit("accounts").alias("table"),
        F.when(F.col("event_type") == "signup", "insert")
        .when(F.col("event_type") == "purchase", "delete")
        .otherwise("update")
        .alias("op"),
        F.col("user_id").cast("string").alias("pk"),
        F.to_json(F.struct("user_id", "value")).alias("payload"),
    )
    bnd = ch.agg(F.max("change_id")).first()[0] // 2
    ch = ch.withColumn(
        "chunk", F.when(F.col("change_id") <= bnd, 0).otherwise(1)
    )
    work = _os.path.join(
        "/tmp",
        "spark_graft_replay_asof",
        _os.path.basename(_os.path.normpath(sf_dir)),
    )
    latest, _state = replay_change_log(
        spark, ch, work, epochs=2, n_buckets=8, chunk_col="chunk"
    )

    def parse(df: DataFrame, marker: str) -> DataFrame:
        return df.select(
            F.lit(marker).alias("snapshot"),
            "pk",
            F.from_json("payload", "user_id bigint, value double").alias("_p"),
            "change_id",
        ).select(
            "snapshot",
            "pk",
            F.col("_p.user_id").alias("user_id"),
            F.col("_p.value").alias("value"),
            "change_id",
        )

    asof = read_table_asof(
        spark, _os.path.join(work, "target"), "accounts", epoch=0
    )
    return parse(asof, "asof_epoch0").unionByName(parse(latest, "final"))


# ---------------------------------------------------------------------------
# doc_late_interaction_topk — ColBERT-shape late-interaction (maxsim)
# retrieval (operators/retrieval.py late_interaction_topk): per query
# token, the MAX similarity against any document token, summed — the
# token-level matching channel the bag-of-words rankers lack. Token
# vectors are the deterministic 16-bit ±1 signature family
# (hash60 mod 2^16; dot = 16 − 2·hamming), fully SQL-reproducible; a
# deployment swaps in learned embeddings + BLAS and keeps every join.
# Workload: the shared BM25 query set; exact-match prefilter to 20
# candidates per query before maxsim (the family's pre-cut idiom).
# ---------------------------------------------------------------------------

from .oracle_sql_fragments import _BM25_QUERIES, _NORM_SQL
from .functions.hashing import hash60_sql

_LI_K = 10
_LI_CANDS = 20
_LI_BITS = 16


@query(
    "doc_late_interaction_topk",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, UNNEST(regexp_split_to_array({_NORM_SQL}, ' ')) AS term
      FROM documents
    ),
    dterms AS (SELECT DISTINCT doc_id, term FROM toks),
    dsig AS (
      SELECT doc_id, term, {hash60_sql('term')} % {1 << _LI_BITS} AS dsig
      FROM dterms
    ),
    q(query_id, term) AS (
      VALUES {", ".join(f"({i}, '{t}')" for i, t in _BM25_QUERIES)}
    ),
    qd AS (SELECT DISTINCT CAST(query_id AS BIGINT) AS query_id, term FROM q),
    qsig AS (
      SELECT query_id, term, {hash60_sql('term')} % {1 << _LI_BITS} AS qsig
      FROM qd
    ),
    matches AS (
      SELECT qd.query_id, d.doc_id, CAST(COUNT(*) AS BIGINT) AS match_terms
      FROM qd JOIN dterms d ON d.term = qd.term
      GROUP BY 1, 2
    ),
    cands AS (
      SELECT query_id, doc_id, match_terms FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY match_terms DESC, doc_id ASC) AS rn
        FROM matches
      ) WHERE rn <= {_LI_CANDS}
    ),
    per_qtok AS (
      SELECT c.query_id, c.doc_id, c.match_terms, s.term,
             MIN(bit_count(xor(s.qsig, d.dsig))) AS minh
      FROM cands c
      JOIN qsig s ON s.query_id = c.query_id
      JOIN dsig d ON d.doc_id = c.doc_id
      GROUP BY 1, 2, 3, 4
    ),
    scored AS (
      SELECT query_id, doc_id, match_terms,
             CAST(SUM({_LI_BITS} - 2 * minh) AS BIGINT) AS score_units
      FROM per_qtok GROUP BY 1, 2, 3
    )
    SELECT query_id, doc_id, match_terms, score_units, rank FROM (
      SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                  ORDER BY score_units DESC, doc_id ASC) AS INTEGER) AS rank
      FROM scored
    ) WHERE rank <= {_LI_K}
    """,
)
def doc_late_interaction_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 documents per query under the late-interaction maxsim
    score (16-bit ±1 token signatures, integer dot = 16 − 2·hamming),
    exact-match prefilter to 20 candidates — the ColBERT scoring shape
    over the shared query workload."""
    from .operators.retrieval import late_interaction_topk

    docs = load_table(spark, sf_dir, "documents")
    queries_df = spark.createDataFrame(
        _BM25_QUERIES, "query_id long, term string"
    )
    return late_interaction_topk(
        docs,
        queries_df,
        k=_LI_K,
        sig_bits=_LI_BITS,
        prefilter_candidates=_LI_CANDS,
    )
