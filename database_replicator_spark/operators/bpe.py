"""Byte-pair-encoding tokenizer surface: distributed merge training and
merge application.

BPE (Sennrich et al. 2016) trains on the WORD-FREQUENCY table, not the
raw corpus — the scale insight that makes a 100 TB corpus trainable: one
corpus scan aggregates ``(word, count)`` (vocabulary-sized, Zipf-bounded),
and every merge iteration then runs over that small distributed table.

Representation: a word is a separator-framed symbol string
``⟂⟂s1⟂⟂s2⟂⟂…⟂⟂`` (⟂ = ``\\x1f``, double-framed). Merging pair (a, b)
is then ONE LITERAL string replace of ``⟂a⟂⟂b⟂`` with ``⟂ab⟂``:
left-to-right non-overlapping replace-all reproduces Python BPE's greedy
merge exactly (consecutive pairs chain, overlapping pairs don't), and the
invariant framing survives every replacement — no regex, no escaping, and
the identical expression runs in DuckDB, which keeps the application side
oracle-checkable.

Per training iteration: one explode→groupBy over the vocab to count
adjacent pairs (weighted by word count), one ``TakeOrdered(1)`` for the
argmax pair (deterministic tie-break: count desc, then pair lexicographic),
one map applying the merge, and a localCheckpoint to stop lineage growth
across iterations. The merge LOOP is inherently sequential (each merge
depends on the last — same as every production BPE trainer); what is
distributed is the work inside each iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: symbol separator (ASCII unit separator — never appears in normal text)
SEP = "\x1f"


def _sym_col(word_col) -> "F.Column":
    """``word`` → double-framed symbol string over its characters."""
    return F.concat(
        F.lit(SEP + SEP),
        F.array_join(F.split(word_col, ""), SEP + SEP),
        F.lit(SEP + SEP),
    )


def _pairs_col(sym_col) -> "F.Column":
    """Adjacent symbol pairs of a framed symbol string."""
    syms = F.split(F.expr(f"trim(BOTH '{SEP}' FROM {sym_col})"), SEP + SEP)
    # sequence(0, -1) would DESCEND for single-symbol words — emit no pairs
    idx = F.when(
        F.size(syms) >= 2, F.sequence(F.lit(0), F.size(syms) - 2)
    ).otherwise(F.expr("array()").cast("array<int>"))
    return F.transform(
        idx,
        lambda i: F.struct(
            F.element_at(syms, i + 1).alias("a"), F.element_at(syms, i + 2).alias("b")
        ),
    )


def merge_replace(sym_col, a: str, b: str):
    """Apply merge (a, b) to a framed symbol string: one literal
    replace-all of ``⟂a⟂⟂b⟂`` → ``⟂ab⟂`` (greedy left-to-right, exactly
    Python BPE's merge order)."""
    col = F.col(sym_col) if isinstance(sym_col, str) else sym_col
    return F.call_function(
        "replace",
        col,
        F.lit(f"{SEP}{a}{SEP}{SEP}{b}{SEP}"),
        F.lit(f"{SEP}{a + b}{SEP}"),
    )


def word_counts(
    df: DataFrame, text_col: str = "text", word_col: str = "word"
) -> DataFrame:
    """One corpus scan → the (word, count) table BPE trains on."""
    from .textops import normalize_text_expr

    toks = df.select(
        F.explode(
            F.split(normalize_text_expr(F.coalesce(F.col(text_col), F.lit(""))), " ")
        ).alias(word_col)
    ).filter(F.col(word_col) != "")
    return toks.groupBy(word_col).agg(F.count(F.lit(1)).alias("count"))


def bpe_train(
    words: DataFrame,
    num_merges: int,
    word_col: str = "word",
    count_col: str = "count",
    min_pair_count: int = 2,
) -> list[tuple[str, str, int]]:
    """Learn up to ``num_merges`` BPE merges from a (word, count) table.

    Returns ``[(a, b, pair_count), …]`` in merge order. Deterministic:
    the argmax pair tie-breaks on (count desc, a asc, b asc), so re-runs
    and any partitioning learn the identical merge list.

    The driver holds only the merge list (one 3-tuple per iteration) and
    the per-iteration top-1 row — never the vocabulary.
    """
    state = words.select(
        _sym_col(F.col(word_col)).alias("w"), F.col(count_col).alias("n")
    ).localCheckpoint(eager=False)
    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        top = (
            state.select(F.explode(_pairs_col("w")).alias("p"), "n")
            .groupBy("p.a", "p.b")
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] < min_pair_count:
            break
        a, b, cnt = top[0]["a"], top[0]["b"], int(top[0]["cnt"])
        merges.append((a, b, cnt))
        state = state.select(
            merge_replace("w", a, b).alias("w"), "n"
        ).localCheckpoint(eager=False)
    return merges


def bpe_segment(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply a learned merge list to a corpus: per doc, the whitespace
    token count and the BPE token count after all merges.

    Scale shape: merges are applied to the DISTINCT token table (Zipf:
    vastly smaller than the token stream), then joined back — the merge
    chain runs once per vocabulary word, not once per occurrence.
    """
    from .textops import normalize_text_expr

    toks = df.select(
        F.col(id_col),
        F.explode(
            F.split(normalize_text_expr(F.coalesce(F.col(text_col), F.lit(""))), " ")
        ).alias("word"),
    ).filter(F.col("word") != "")
    seg = toks.select("word").distinct().withColumn("w", _sym_col(F.col("word")))
    for a, b, *_ in merges:
        seg = seg.withColumn("w", merge_replace("w", a, b))
    seg = seg.select(
        "word",
        (F.size(F.split(F.expr(f"trim(BOTH '{SEP}' FROM w)"), SEP + SEP))).alias(
            "n_sym"
        ),
    )
    return (
        toks.join(seg, on="word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_sym").cast("bigint").alias("n_bpe_tokens"),
        )
    )
