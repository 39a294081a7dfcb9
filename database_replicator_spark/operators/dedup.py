"""Deduplication operators for training-data pipelines.

Four tiers, cheapest-first — a 100 TB dedup pipeline runs them in this
order so each tier shrinks the candidate set for the next:

  1. **Exact** — group by content fingerprint (md5 of normalized text).
     One shuffle on the fingerprint; survivors = min(doc_id) per group.
  2. **MinHash + LSH banding** — per-doc minhash signature over word
     shingles; band signatures bucket candidates; only same-bucket pairs
     are verified. Candidate generation is a groupBy on (band, band_sig),
     never an all-pairs join — the quadratic blowup is confined to within
     buckets, which is the whole point of LSH at scale.
  3. **SimHash** — 60-bit per-doc signature whose Hamming distance tracks
     cosine similarity of the token multiset; near-dup candidates share
     signature prefixes (sortable → range-partitionable at scale).
  4. **N-gram Jaccard verification** — exact similarity on candidate pairs
     only (explode shingles → count intersections via groupBy).

Embedding-cosine near-dup lives in similarity.py (same LSH idea over
random hyperplanes).

All constructions use the portable md5-based ``hash60`` so every tier is
oracle-checkable in DuckDB; swap ``xxhash64`` for md5 at production scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import hash60, seeded
from .textops import fingerprint_expr, normalize_text_expr, tokens_expr


def exact_dedup_groups(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Fingerprint groups with a deterministic survivor (min id) and the
    duplicate count. Survivors-only view = filter n_docs, or anti-join ids."""
    return (
        df.select(F.col(id_col), fingerprint_expr(F.col(text_col)).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


def doc_shingles(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3
) -> DataFrame:
    """Distinct (doc_id, shingle) word-k-shingle pairs — the substrate for
    minhash & jaccard. Documents shorter than k words contribute their whole
    normalized text as one shingle so no document drops out of minhash.

    Implementation: posexplode tokens → window ``lead``s build the k-grams.
    Everything stays inside whole-stage codegen (an earlier higher-order
    ``transform``+``slice`` formulation was ~4× slower because lambda
    functions are interpreted and the token split was re-evaluated per
    element). Cost: one shuffle on doc_id for the window + one for the
    distinct — both on (id, small-string) rows."""
    from pyspark.sql import Window

    # NULL text behaves as empty text (one '' shingle) so no document ever
    # drops out of signatures — matching the oracle's COALESCE
    norm = normalize_text_expr(F.coalesce(F.col(text_col), F.lit("")))
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.split(norm, " ")).alias("n_toks"),
        norm.alias("norm"),
    )
    long_docs = toks.filter(F.col("n_toks") >= k).select(
        "doc_id", F.posexplode(F.split(F.col("norm"), " ")).alias("pos", "tok")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    leads = [F.col("tok")] + [F.lead("tok", i).over(w) for i in range(1, k)]
    grams = (
        long_docs.select("doc_id", *[l.alias(f"t{i}") for i, l in enumerate(leads)])
        .filter(F.col(f"t{k-1}").isNotNull())
        .select("doc_id", F.concat_ws(" ", *[F.col(f"t{i}") for i in range(k)]).alias("shingle"))
    )
    short_docs = toks.filter(F.col("n_toks") < k).select(
        "doc_id", F.col("norm").alias("shingle")
    )
    return grams.unionByName(short_docs).distinct()


#: Carter-Wegman modulus: largest prime below 2^59. h1 + i*(h2 % P) stays
#: inside int64 for i ≤ 14 (max h1 + 14·(P−1) < 2^63; i = 15 overflows),
#: so signatures are capped at 15 hash functions.
CW_PRIME = 576460752303423433
CW_MAX_HASHES = 15


def minhash_signatures(
    shingled: DataFrame, num_hashes: int = 12
) -> DataFrame:
    """One row per doc: ``sig`` = array of minhash values.

    Hash family is Carter-Wegman over two base hashes,
    ``h_i = (h1 + i * (h2 mod P)) mod P`` — 2 md5 evaluations per shingle
    regardless of signature width (vs. one md5 per hash function), which
    cut the sf0.1 minhash stage ~3×. Single groupBy over the exploded
    shingles; each family member is a map-side integer expression."""
    if num_hashes > CW_MAX_HASHES:
        raise ValueError(
            f"num_hashes={num_hashes} exceeds the int64-safe Carter-Wegman "
            f"bound of {CW_MAX_HASHES}; use a second seed pair for wider signatures"
        )
    h1 = hash60(F.col("shingle"))
    h2 = hash60(seeded(F.col("shingle"), 1)) % F.lit(CW_PRIME)
    aggs = [
        F.min((h1 + F.lit(s) * h2) % F.lit(CW_PRIME)).alias(f"h{s}")
        for s in range(num_hashes)
    ]
    per_doc = shingled.groupBy("doc_id").agg(*aggs)
    return per_doc.select(
        "doc_id", F.array(*[F.col(f"h{s}") for s in range(num_hashes)]).alias("sig")
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    bands: int = 4,
    rows_per_band: int = 3,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Distinct candidate pairs (doc1 < doc2) sharing ≥1 LSH band.

    Plan shape: explode to (band, band_sig, doc) → self-join within bucket.
    At scale the join key (band, band_sig) is high-cardinality and uniform
    (hash values), so the shuffle is well balanced.

    ``max_bucket_size`` bounds degenerate buckets (a corpus of identical
    boilerplate puts every doc in one bucket → that bucket alone is O(n²)):
    buckets with more than ``max_bucket_size`` members are dropped entirely
    — a deterministic rule, and safe in a tiered pipeline because
    boilerplate-identical docs are exactly what the cheaper exact-dedup
    tier (tier 1) already collapses before LSH runs.
    """
    banded = signatures.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.md5(
                        F.array_join(
                            F.transform(
                                F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                                lambda v: v.cast("string"),
                            ),
                            ",",
                        )
                    ).alias("band_sig"),
                ),
            )
        ).alias("bb"),
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.band_sig").alias("band_sig"))
    # the self-join below consumes `banded` twice; caching stops the whole
    # shingle→signature pipeline from executing twice
    banded = banded.cache()
    if max_bucket_size is not None:
        small = (
            banded.groupBy("band", "band_sig")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") <= max_bucket_size)
            .select("band", "band_sig")
        )
        banded = banded.join(small, on=["band", "band_sig"], how="left_semi")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, on=["band", "band_sig"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc1"), F.col("b.doc_id").alias("doc2"))
        .distinct()
    )


def jaccard_pairs(
    shingled: DataFrame,
    candidates: DataFrame | None = None,
    threshold: float = 0.0,
) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs (all pairs sharing ≥1
    shingle when ``candidates`` is None — correct but quadratic; always
    pass LSH candidates at scale).

    With ``candidates``, intersections are computed per candidate pair
    (explode pair by doc1's shingles → match doc2's set) — the quadratic
    work is confined to the LSH candidate set, which is what survives
    100 TB. Without, a corpus self-join on shingle with df≥2 vocabulary
    pruning. Either way jaccard = inter/(|A|+|B|-inter), exact in
    integers until the final division.

    ``shingled`` is consumed several times, so it is cached here — at
    scale, materialize it once (parquet/Delta stage) instead."""
    shingled = shingled.cache()
    sizes = shingled.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    if candidates is not None:
        # Candidates prune BEFORE the quadratic work: each candidate pair is
        # exploded by doc1's shingles, then matched against doc2's shingle
        # set on (doc2, shingle) — per-pair intersection counting, no corpus
        # self-join at all. Pairs with zero overlap vanish here, exactly as
        # they vanish from the oracle's inner-join co-occurrence. The df≥2
        # vocabulary pruning below is pointless in this branch (unshared
        # shingles simply find no match), so its groupBy is skipped.
        cand = candidates.select("doc1", "doc2")
        a = shingled.select(F.col("doc_id").alias("doc1"), "shingle")
        b = shingled.select(F.col("doc_id").alias("doc2"), "shingle")
        co = (
            cand.join(a, on="doc1")
            .join(b, on=["doc2", "shingle"])
            .groupBy("doc1", "doc2")
            .agg(F.count(F.lit(1)).alias("inter"))
        )
    else:
        # Exact pruning for the all-pairs path: shingles with document
        # frequency 1 cannot co-occur, so drop them from the join inputs
        # (but not from the |A|/|B| sizes) — bit-identical results with
        # strictly less join work; on natural-language corpora the df=1
        # tail is the majority of distinct shingles.
        shared = (
            shingled.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") >= 2)
            .select("shingle")
        )
        joinable = shingled.join(shared, on="shingle", how="left_semi")
        a = joinable.alias("a")
        b = joinable.alias("b")
        co = (
            a.join(b, on="shingle")
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .groupBy(F.col("a.doc_id").alias("doc1"), F.col("b.doc_id").alias("doc2"))
            .agg(F.count(F.lit(1)).alias("inter"))
        )
    out = (
        co.join(sizes.withColumnsRenamed({"doc_id": "doc1", "n_shingles": "n1"}), on="doc1")
        .join(sizes.withColumnsRenamed({"doc_id": "doc2", "n_shingles": "n2"}), on="doc2")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("n1") + F.col("n2") - F.col("inter")),
        )
    )
    if threshold > 0:
        out = out.filter(F.col("jaccard") >= threshold)
    return out.select("doc1", "doc2", "inter", "n1", "n2", "jaccard")


def simhash_signatures(
    shingled: DataFrame, bits: int = 60
) -> DataFrame:
    """60-bit SimHash per doc: bit j of the signature is the majority vote
    of bit j across the hash60 of each shingle.

    One groupBy; the per-bit votes are map-side SUM expressions (±1), so
    the shuffle carries ``bits`` longs per doc — constant, not O(shingles).
    """
    h = hash60(F.col("shingle"))
    votes = [
        F.sum(
            F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{j}")
        for j in range(bits)
    ]
    per_doc = shingled.groupBy("doc_id").agg(*votes)
    sig = None
    for j in range(bits):
        term = F.when(F.col(f"v{j}") > 0, F.lit(2 ** j).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
        sig = term if sig is None else sig + term
    return per_doc.select("doc_id", sig.alias("simhash"))


def hamming_distance(a: Column, b: Column) -> Column:
    """Popcount of XOR via bit_count (JVM intrinsic)."""
    return F.bit_count(a.bitwiseXOR(b))
