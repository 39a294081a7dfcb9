"""Text analysis operators for training-data pipelines (north-star
extension surface; BASELINE.json): token counting, language-ID heuristic,
quality scoring, document fingerprinting.

All pure Catalyst expressions — whole-stage-codegen-friendly, no Python in
the hot path. Integer-arithmetic scoring where possible so results are
bit-identical across engines (the DuckDB oracles reuse the formulas).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..util import spread_by

#: tiny English stopword list for the n-gram/stopword language heuristic
EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")

#: per-mille stopword-share threshold for calling a document English
EN_THRESHOLD_PERMILLE = 80


def tokens_expr(text: Column) -> Column:
    """Whitespace tokenization of trimmed text."""
    return F.split(F.trim(text), r"\s+")


def token_count_expr(text: Column) -> Column:
    return F.size(tokens_expr(text))


def bpe_ish_token_count_expr(text: Column) -> Column:
    """A BPE-ish proxy count: split on word boundaries/punctuation so
    subword-ish pieces are counted (regex split on transitions), the
    cheap stand-in for a real tokenizer at 100 TB scan cost."""
    pieces = F.split(F.trim(text), r"[^A-Za-z0-9]+|(?<=[a-z])(?=[A-Z])")
    return F.size(F.filter(pieces, lambda p: p != ""))


def stopword_count_expr(text: Column, stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    toks = tokens_expr(F.lower(text))
    arr = F.array(*[F.lit(s) for s in stopwords])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def lang_id_expr(text: Column) -> Column:
    """Stopword-share language heuristic: ≥ EN_THRESHOLD_PERMILLE per-mille
    English stopwords → 'en', else 'other'. Integer arithmetic only, so the
    decision is exactly reproducible in any engine."""
    n_stop = stopword_count_expr(text)
    n_tok = token_count_expr(text)
    return F.when(
        (n_tok > 0) & (n_stop * 1000 >= n_tok * EN_THRESHOLD_PERMILLE), F.lit("en")
    ).otherwise(F.lit("other"))


def punct_count_expr(text: Column) -> Column:
    return F.regexp_count(text, F.lit(r"[.!?,;:]"))


def quality_components(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality signals, all integers: char count, token count,
    punctuation count, alpha char count, stopword count."""
    t = F.col(text_col)
    return df.withColumns(
        {
            "n_chars_m": F.length(t),
            "n_tokens": token_count_expr(t),
            "n_punct": punct_count_expr(t),
            "n_alpha": F.length(F.regexp_replace(t, r"[^A-Za-z]", "")),
            "n_stop": stopword_count_expr(t),
        }
    )


def quality_score_expr() -> Column:
    """Composite quality score in [0,1]-ish from the integer components
    (call after quality_components). Deterministic double arithmetic:
    fixed operation order, no aggregation."""
    mean_tok_len = F.col("n_alpha") / F.greatest(F.col("n_tokens"), F.lit(1))
    stop_share = F.col("n_stop") / F.greatest(F.col("n_tokens"), F.lit(1))
    punct_density = F.col("n_punct") / F.greatest(F.col("n_chars_m"), F.lit(1))
    return (
        F.least(mean_tok_len / F.lit(8.0), F.lit(1.0)) * F.lit(0.4)
        + F.least(stop_share * F.lit(5.0), F.lit(1.0)) * F.lit(0.4)
        + F.least(punct_density * F.lit(20.0), F.lit(1.0)) * F.lit(0.2)
    )


def quality_filter(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 10,
    max_tokens: int = 50_000,
    stop_permille: int = 20,
    max_token_share_pct: int = 20,
) -> DataFrame:
    """C4-style rule-cascade document filter: every document gets a keep
    flag and the FIRST failing rule as ``reject_reason`` (fixed rule
    order: too_short → too_long → low_stopword → repetitive), so drops
    are explainable and re-runnable — the pipeline stage between raw
    ingestion and dedup in a pretraining corpus build.

    All rules are integer comparisons (no float thresholds), so the
    decision is exactly reproducible in any engine:
      * too_short / too_long — token-count bounds
      * low_stopword — stopword per-mille below ``stop_permille``
        (gibberish / non-language detector)
      * repetitive — the single most frequent token exceeds
        ``max_token_share_pct`` of all tokens (boilerplate detector)

    Plan: one token explode + two-level groupBy for the max-token count
    (shuffles on (doc, token) then doc — both keyed on the doc grain at
    worst), joined back to per-doc integer signals computed map-side.
    """
    norm = normalize_text_expr(F.coalesce(F.col(text_col), F.lit("")))
    toks = F.split(norm, " ")
    stop_arr = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).alias("n_tokens"),
        F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))).alias(
            "n_stop"
        ),
        toks.alias("_toks"),
    )
    base = spread_by(base, F.col("doc_id"))  # spread the explode (see winnowing note)
    top = (
        base.select("doc_id", F.explode("_toks").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("_n"))
        .groupBy("doc_id")
        .agg(F.max("_n").alias("max_tok_count"))
    )
    joined = base.drop("_toks").join(top, on="doc_id")
    reason = (
        F.when(F.col("n_tokens") < min_tokens, F.lit("too_short"))
        .when(F.col("n_tokens") > max_tokens, F.lit("too_long"))
        .when(
            F.col("n_stop") * 1000 < F.col("n_tokens") * stop_permille,
            F.lit("low_stopword"),
        )
        .when(
            F.col("max_tok_count") * 100 > F.col("n_tokens") * max_token_share_pct,
            F.lit("repetitive"),
        )
    )
    return joined.select(
        "doc_id",
        "n_tokens",
        "n_stop",
        "max_tok_count",
        reason.alias("reject_reason"),
        reason.isNull().alias("keep"),
    )


def normalize_text_expr(text: Column) -> Column:
    """Canonical text form for fingerprinting/dedup: lowercase, collapse
    whitespace runs to single spaces, trim."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def fingerprint_expr(text: Column) -> Column:
    """Document fingerprint: md5 of the normalized text (exact-dup key).
    md5 keeps the oracle portable; the scale path can swap xxhash64."""
    return F.md5(normalize_text_expr(text))


def repetition_signals(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style intra-document repetition signals (Rae et al. 2021,
    "Scaling Language Models", table A1 — adapted to token-level measures
    since the corpus has no line structure):

      * ``type_token_ratio`` — distinct tokens / tokens (low = repetitive)
      * ``top_bigram_frac``  — tokens covered by the most frequent bigram
        (2·max_count / n_tokens)
      * ``dup_trigram_frac`` — fraction of trigram occurrences that are
        repeats (1 − distinct/total)
      * ``is_repetitive``    — Gopher-ish cut: (top-bigram repeats AND
        covers > 0.18 of tokens) OR dup-trigram > 0.30

    Plan shape: ONE posexplode of tokens, a partition-by-doc window to
    build bigrams/trigrams with ``lead`` (no re-tokenization), then two
    aggregations that share the doc_id shuffle key. All codegen; fractions
    rounded to 6 dp for cross-engine parity. At 100 TB every shuffle is
    keyed by doc_id (uniform), payload a few longs per n-gram — no
    corpus-wide keys, no skew beyond document length itself."""
    from pyspark.sql import Window

    norm = normalize_text_expr(F.coalesce(F.col(text_col), F.lit("")))
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(norm, " ")).alias("pos", "tok"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    grams = toks.select(
        "doc_id",
        "tok",
        F.lead("tok", 1).over(w).alias("t1"),
        F.lead("tok", 2).over(w).alias("t2"),
    ).select(
        "doc_id",
        "tok",
        F.when(F.col("t1").isNotNull(), F.concat_ws(" ", "tok", "t1")).alias("bigram"),
        F.when(F.col("t2").isNotNull(), F.concat_ws(" ", "tok", "t1", "t2")).alias(
            "trigram"
        ),
    )
    per_bigram = (
        grams.filter(F.col("bigram").isNotNull())
        .groupBy("doc_id", "bigram")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_bigram_count"))
    )
    per_doc = grams.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("tok").alias("n_distinct_tokens"),
        F.count("trigram").alias("n_trigrams"),
        F.countDistinct("trigram").alias("n_distinct_trigrams"),
    )
    out = per_doc.join(per_bigram, on="doc_id", how="left").select(
        "doc_id",
        "n_tokens",
        F.coalesce(F.col("top_bigram_count"), F.lit(0)).alias("top_bigram_count"),
        F.round(F.col("n_distinct_tokens") / F.col("n_tokens"), 6).alias(
            "type_token_ratio"
        ),
        F.round(
            F.coalesce(F.col("top_bigram_count") * 2, F.lit(0)) / F.col("n_tokens"), 6
        ).alias("top_bigram_frac"),
        F.round(
            F.when(
                F.col("n_trigrams") > 0,
                1 - F.col("n_distinct_trigrams") / F.col("n_trigrams"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("dup_trigram_frac"),
    )
    # the top-bigram cut requires an ACTUAL repeat (count ≥ 2): a short
    # all-distinct doc has top frac 2/n > 0.18 for n < 12 without any
    # repetition, which is not what the Gopher rule targets
    return out.withColumn(
        "is_repetitive",
        ((F.col("top_bigram_count") >= 2) & (F.col("top_bigram_frac") > 0.18))
        | (F.col("dup_trigram_frac") > 0.30),
    )


#: PII patterns — the RE2 ∩ Java-regex compatible subset (no backrefs, no
#: lookaround) so Spark and the DuckDB oracle compile the SAME pattern.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\+?[0-9]{1,2}[- ][0-9]{3}[- ][0-9]{4}"
PII_IPV4 = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def pii_redact(
    df: DataFrame, text_col: str = "text", out_col: str = "redacted"
) -> DataFrame:
    """Scrub emails → ``<EMAIL>``, phone-ish numbers → ``<PHONE>``, IPv4
    literals → ``<IP>`` and count each class. Pure codegen
    regexp_replace/regexp_count chain — the shape of a 100 TB PII pass is
    exactly a map-only scan, no shuffle at all. Order matters: emails are
    replaced first so their host parts can't be re-matched as phones/IPs."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(text, PII_EMAIL, "<EMAIL>"), PII_IPV4, "<IP>"
        ),
        PII_PHONE,
        "<PHONE>",
    )
    return df.withColumns(
        {
            "n_emails": F.regexp_count(text, F.lit(PII_EMAIL)),
            "n_ips": F.regexp_count(text, F.lit(PII_IPV4)),
            "n_phones": F.regexp_count(text, F.lit(PII_PHONE)),
            out_col: redacted,
        }
    )


def winnowing_fingerprints(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    k: int = 5, w: int = 4,
) -> DataFrame:
    """Rolling-hash document fingerprints via winnowing (the MOSS
    algorithm): hash every character k-gram, slide a window of ``w``
    consecutive k-gram hashes, keep each window's minimum — the selected
    hashes are robust to local edits and position shifts, unlike the
    whole-document fingerprint.

    Plan shape: explode positions (codegen sequence+substring), one
    partition-by-doc window for the per-window min, then distinct —
    shuffle payload is (doc_id, hash) pairs. Output: distinct
    (doc_id, fingerprint) rows. Shared fingerprints across documents are
    near-dup evidence at sub-document granularity (copied passages)."""
    from pyspark.sql import Window

    from ..functions.hashing import hash60

    norm = normalize_text_expr(F.coalesce(F.col(text_col), F.lit("")))
    # repartition on doc_id BEFORE the ~|text|-way char-gram expansion: a
    # small parquet fixture scans as ONE partition, which would run the
    # entire explode+md5 on one core; the downstream per-doc window needs
    # hashpartitioning(doc_id) anyway, so this moves that shuffle ahead of
    # the expansion instead of adding one (measured 3.6 s → sub-second at
    # sf0.1 on local[32])
    grams = (
        df.withColumn("_norm", norm)
        .select(F.col(id_col).alias("doc_id"), "_norm")
        .transform(lambda d: spread_by(d, F.col("doc_id")))
        .select(
            "doc_id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(1, greatest(length(_norm) - {k - 1}, 1)), "
                    f"i -> substring(_norm, i, {k}))"
                )
            ).alias("pos", "gram"),
        )
    )
    hashed = grams.select("doc_id", "pos", hash60(F.col("gram")).alias("h"))
    win = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(0, w - 1)
    )
    return (
        hashed.withColumn("fingerprint", F.min("h").over(win))
        .select("doc_id", "fingerprint")
        .distinct()
    )

def classifier_weight(bucket: int, num_buckets: int, seed: str = "w") -> int:
    """Deterministic integer weight in [-1000, 1000] for one feature
    bucket — the stand-in for a trained model's coefficient, derived from
    md5 exactly like the SQL ``hash60`` so oracles can recompute it."""
    import hashlib

    h = int(hashlib.md5(f"{seed}:{bucket % num_buckets}".encode()).hexdigest()[:15], 16)
    return h % 2001 - 1000


def hashed_linear_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 512,
    seed: str = "w",
) -> DataFrame:
    """fastText-style linear quality classifier over hashed bag-of-words
    features: ``score(doc) = (Σ_t W[hash(t) mod D]) / (1000·|tokens|)``.

    The production shape for corpus-quality classifiers (GPT-3/LLaMA-style
    "looks like reference text" scoring): a trained weight vector small
    enough to broadcast, applied as an O(1) lookup per token. Here the
    weight vector is a deterministic fake (md5-derived integers — swap in
    trained coefficients at deployment); it is embedded as a plan-literal
    array and the per-document feature sum folds inside ONE codegen'd
    higher-order ``aggregate`` over the token array — zero shuffles, zero
    Python, no explode. Integer weight sums are exact, so the final double
    division is bit-identical across engines (the DuckDB oracle recomputes
    W from the same md5 formula).

    Scale: map-only over the corpus; cost is one md5 per token. At larger
    D swap the literal array for a broadcast ``map_from_arrays`` lookup —
    the plan shape is otherwise unchanged.
    """
    weights = F.array(
        *[F.lit(classifier_weight(b, num_buckets, seed)) for b in range(num_buckets)]
    )
    toks = tokens_expr(F.col(text_col))

    def _w(t: Column) -> Column:
        bucket = (
            F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("bigint")
            % num_buckets
        )
        return F.element_at(weights, (bucket + 1).cast("int")).cast("bigint")

    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).alias("n_tokens"),
        F.aggregate(toks, F.lit(0).cast("bigint"), lambda acc, t: acc + _w(t)).alias(
            "feat_sum"
        ),
    )
    score = F.when(
        F.col("n_tokens") > 0,
        F.col("feat_sum").cast("double")
        / (F.lit(1000.0) * F.col("n_tokens").cast("double")),
    )
    return base.withColumn("score", score).withColumn(
        "accept", F.coalesce(F.col("score") >= 0, F.lit(False))
    )


def hashed_embedding(
    df: DataFrame,
    dim: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Feature-hashed document embeddings — the hashing trick (Weinberger
    et al., "Feature Hashing for Large Scale Multitask Learning", ICML
    2009): ``v[h(t) mod dim] += sign(t)`` over the document's tokens,
    with the sign drawn from an independent hash bit so collisions cancel
    in expectation. Model-free and deterministic, which closes the
    text→vector loop INSIDE the engine: the whole semantic tier (ANN
    top-k, embedding near-dup, cluster dedup, coverage sampling) runs on
    any document table without precomputed embeddings or an external
    encoder — the production swap is a learned encoder writing the same
    (id, array<double>) shape.

    Components are signed integer counts (exact in both engines); the
    vector assembles from a (doc, bucket) sum — one shuffle on the doc id
    — via a map lookup over the bucket sequence, so empty buckets are
    exact zeros. Cosine/ANN over these vectors inherits the usual
    rounded-double contract."""
    from ..functions.hashing import hash60, hash60_tail

    toks = tokens_expr(F.col(text_col))
    exploded = df.select(
        F.col(id_col), F.explode(toks).alias("tok")
    ).select(
        id_col,
        F.pmod(hash60(F.col("tok")), F.lit(dim)).alias("bucket"),
        (F.pmod(hash60_tail(F.col("tok")), F.lit(2)) * 2 - 1).alias("sign"),
    )
    sums = exploded.groupBy(id_col, "bucket").agg(F.sum("sign").alias("w"))
    entries = sums.groupBy(id_col).agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("bucket").cast("int"), F.col("w")))
        ).alias("_m")
    )
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda b: F.coalesce(F.element_at(F.col("_m"), b.cast("int")), F.lit(0)).cast(
            "double"
        ),
    )
    return entries.select(F.col(id_col), vec.alias("embedding"))
