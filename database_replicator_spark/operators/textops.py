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


def normalize_text_expr(text: Column) -> Column:
    """Canonical text form for fingerprinting/dedup: lowercase, collapse
    whitespace runs to single spaces, trim."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def fingerprint_expr(text: Column) -> Column:
    """Document fingerprint: md5 of the normalized text (exact-dup key).
    md5 keeps the oracle portable; the scale path can swap xxhash64."""
    return F.md5(normalize_text_expr(text))


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
    grams = df.withColumn("_norm", norm).select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.expr(
                f"transform(sequence(1, greatest(length(_norm) - {k - 1}, 1)), "
                f"i -> substring(_norm, i, {k}))"
            )
        ).alias("pos", "gram"),
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
