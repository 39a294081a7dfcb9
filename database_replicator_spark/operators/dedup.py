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

from ..functions.hashing import hash60, hash60_tail
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
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3,
    spread: bool = True,
) -> DataFrame:
    """Distinct (doc_id, shingle) word-k-shingle pairs — the substrate for
    minhash & jaccard. Documents shorter than k words contribute their whole
    normalized text as one shingle so no document drops out of minhash.

    Implementation: posexplode tokens → window ``lead``s build the k-grams.
    Everything stays inside whole-stage codegen (an earlier higher-order
    ``transform``+``slice`` formulation was ~4× slower because lambda
    functions are interpreted and the token split was re-evaluated per
    element). Cost: one shuffle on doc_id for the window + one for the
    distinct — both on (id, small-string) rows.

    ``spread`` (default on) repartitions on doc_id with an explicit
    partition count (util.spread_by) BEFORE the token explode so a
    single-partition input (one small parquet file) doesn't run the whole
    expansion on one core; the per-doc lead window needs that
    partitioning anyway, so the shuffle is moved, not added. (A bare
    ``repartition(col)`` would NOT work here — AQE coalesces the small
    pre-explosion shuffle back to one partition; see spread_by.)"""
    from pyspark.sql import Window

    # NULL text behaves as empty text (one '' shingle) so no document ever
    # drops out of signatures — matching the oracle's COALESCE
    norm = normalize_text_expr(F.coalesce(F.col(text_col), F.lit("")))
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.split(norm, " ")).alias("n_toks"),
        norm.alias("norm"),
    )
    if spread:
        from ..util import spread_by

        toks = spread_by(toks, F.col("doc_id"))
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
    ``h_i = (h1 + i * (h2 mod P)) mod P``, with BOTH bases sliced from one
    md5 digest (head/tail 60 bits) — a single md5 evaluation per shingle
    regardless of signature width; codegen subexpression elimination
    collapses the two slices onto one digest computation. Single groupBy
    over the exploded shingles; each family member is a map-side integer
    expression."""
    if num_hashes > CW_MAX_HASHES:
        raise ValueError(
            f"num_hashes={num_hashes} exceeds the int64-safe Carter-Wegman "
            f"bound of {CW_MAX_HASHES}; use a second seed pair for wider signatures"
        )
    h1 = hash60(F.col("shingle"))
    h2 = hash60_tail(F.col("shingle")) % F.lit(CW_PRIME)
    aggs = [
        F.min((h1 + F.lit(s) * h2) % F.lit(CW_PRIME)).alias(f"h{s}")
        for s in range(num_hashes)
    ]
    per_doc = shingled.groupBy("doc_id").agg(*aggs)
    return per_doc.select(
        "doc_id", F.array(*[F.col(f"h{s}") for s in range(num_hashes)]).alias("sig")
    )


#: Default per-bucket candidate cap: a bucket of B docs contributes
#: B(B−1)/2 pairs, so 50 bounds any single bucket at ~1.2k pairs while
#: being far above what honest near-dup groups produce once exact dedup
#: (tier 1) has collapsed identical boilerplate. The gated pipeline runs
#: with this cap ON and the DuckDB oracle mirrors it (HAVING COUNT(*) <=
#: cap), so the rule is part of the verified contract, not a silent drop.
DEFAULT_MAX_BUCKET_SIZE = 50


def lsh_candidate_pairs(
    signatures: DataFrame,
    bands: int = 4,
    rows_per_band: int = 3,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
) -> DataFrame:
    """Distinct candidate pairs (doc1 < doc2) sharing ≥1 LSH band.

    Plan shape: explode to (band, band_sig, doc) → self-join within bucket.
    At scale the join key (band, band_sig) is high-cardinality and uniform
    (hash values), so the shuffle is well balanced.

    ``max_bucket_size`` (default :data:`DEFAULT_MAX_BUCKET_SIZE`) bounds
    degenerate buckets (a corpus of identical boilerplate puts every doc
    in one bucket → that bucket alone is O(n²)): buckets with more than
    ``max_bucket_size`` members are dropped entirely — a deterministic
    rule, and safe in a tiered pipeline because boilerplate-identical docs
    are exactly what the cheaper exact-dedup tier (tier 1) already
    collapses before LSH runs. Pass ``None`` to disable.
    """
    # Band structs are built with plain codegen expressions (element_at +
    # concat_ws + md5) over a LITERAL band list, not higher-order
    # transform/slice lambdas — HOFs run interpreted per element and showed
    # up as a measurable slice of the candidate stage at sf0.1.
    def band_struct(b: int) -> Column:
        cells = [
            F.element_at(F.col("sig"), b * rows_per_band + r + 1).cast("string")
            for r in range(rows_per_band)
        ]
        return F.struct(
            F.lit(b).alias("band"), F.md5(F.concat_ws(",", *cells)).alias("band_sig")
        )

    banded = signatures.select(
        "doc_id",
        F.explode(F.array(*[band_struct(b) for b in range(bands)])).alias("bb"),
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.band_sig").alias("band_sig"))
    # the self-join below consumes `banded` twice, but BOTH consumers
    # shuffle it on the same (band, band_sig) keys from identical
    # subplans, so Catalyst's ReuseExchange computes the
    # shingle→signature pipeline once and reads the exchange twice — no
    # cache materialization barrier needed (and the bucket-size filter's
    # groupBy below shares the same exchange too)
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


def lsh_incremental_candidates(
    new_sigs: DataFrame,
    index_sigs: DataFrame,
    bands: int = 4,
    rows_per_band: int = 3,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
) -> DataFrame:
    """Candidate pairs between a NEW batch and an EXISTING corpus index —
    the daily-increment dedup shape: a crawl delta is checked against the
    accumulated signature index without ever self-joining the corpus.

    Both sides band identically; the join is new-banded ⋈ index-banded on
    (band, band_sig) — at a 100 TB corpus with a daily delta the new side
    is orders of magnitude smaller, so this is a broadcast or small-side
    shuffle join keyed on uniform hash values, and the index side is
    touched once per band with no quadratic term. The bucket cap applies
    to the INDEX side (a degenerate boilerplate bucket there would match
    every new doc). Output: (new_doc, index_doc) distinct pairs; new-batch
    self-duplicates are the ordinary within-batch pipeline's job.

    At scale the banded index is a materialized table partitioned by
    (band, band_sig) — appending each day's accepted batch keeps the
    index current without recomputation."""
    def band_struct(b: int) -> Column:
        cells = [
            F.element_at(F.col("sig"), b * rows_per_band + r + 1).cast("string")
            for r in range(rows_per_band)
        ]
        return F.struct(
            F.lit(b).alias("band"), F.md5(F.concat_ws(",", *cells)).alias("band_sig")
        )

    def banded(sigs: DataFrame) -> DataFrame:
        return sigs.select(
            "doc_id",
            F.explode(F.array(*[band_struct(b) for b in range(bands)])).alias("bb"),
        ).select(
            "doc_id",
            F.col("bb.band").alias("band"),
            F.col("bb.band_sig").alias("band_sig"),
        )

    new_b = banded(new_sigs)
    idx_b = banded(index_sigs)
    if max_bucket_size is not None:
        small = (
            idx_b.groupBy("band", "band_sig")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") <= max_bucket_size)
            .select("band", "band_sig")
        )
        idx_b = idx_b.join(small, on=["band", "band_sig"], how="left_semi")
    n = new_b.alias("n")
    i = idx_b.alias("i")
    return (
        n.join(i, on=["band", "band_sig"])
        .filter(F.col("n.doc_id") != F.col("i.doc_id"))
        .select(
            F.col("n.doc_id").alias("new_doc"), F.col("i.doc_id").alias("index_doc")
        )
        .distinct()
    )


#: caches marked by the PREVIOUS jaccard_pairs call, unpersisted on the
#: next call — candidate-bounded but they accumulated across gate calls
#: in long-lived sessions (same leak class as the r12 e2e advice item);
#: nothing is shared across calls, each invocation recomputes fully.
_JP_CACHED: list[DataFrame] = []


def jaccard_pairs(
    shingled: DataFrame,
    candidates: DataFrame | None = None,
    threshold: float = 0.0,
) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs (all pairs sharing ≥1
    shingle when ``candidates`` is None — correct but quadratic; always
    pass LSH candidates at scale).

    With ``candidates``, each candidate pair intersects its two docs'
    shingle SETS pair-locally (array_intersect on per-doc collect_set
    rows) — the quadratic work is confined to the LSH candidate set, which
    is what survives 100 TB. Without, a corpus self-join on shingle with
    df≥2 vocabulary pruning. Either way jaccard = inter/(|A|+|B|-inter),
    exact in integers until the final division.

    In the all-pairs branch ``shingled`` is consumed three times and is
    cached; in the candidate branch it is NOT cached here — callers that
    feed the same shingle relation to BOTH the candidate pipeline and
    this verifier should ``localCheckpoint()`` it first (one explode,
    blocks read by every consumer; measured r13: 5.8 s -> 4.4 s on
    dedup_lsh_verified, 12.2 -> 9.6 on the capped containment gate —
    unlike ``.cache()``, whose write+read under memory pressure measured
    WORSE than a fused recompute in r11). At 100 TB the same role is
    played by a materialized parquet/Delta shingle stage."""
    while _JP_CACHED:
        try:
            _JP_CACHED.pop().unpersist(blocking=False)
        except Exception:  # noqa: BLE001 — stopped context, already gone
            pass
    if candidates is not None:
        # Candidates prune BEFORE the quadratic work, and the intersection
        # is computed PAIR-LOCALLY: the shingle table is semi-joined down
        # to candidate doc ids, collapsed to one shingle-set row per doc,
        # and each candidate pair intersects its two sets in a codegen
        # expression (array_intersect). No corpus self-join, no shuffle
        # keyed on shingle at all — so a corpus-wide hot shingle
        # (boilerplate) cannot skew this stage; per-pair cost is bounded
        # by the two docs' own shingle counts. Zero-overlap candidates are
        # filtered (inter ≥ 1), exactly as they vanish from the oracle's
        # inner-join co-occurrence. Set sizes double as |A|/|B| (the
        # semi-join keeps ALL shingles of a kept doc, so counts equal
        # full-corpus sizes for every emitted row).
        # cand is consumed by ids AND the final join; sets by both join
        # sides — cache both, or the upstream LSH candidate pipeline
        # replays once per consumer. Both are candidate-bounded, far
        # below corpus size.
        cand = candidates.select("doc1", "doc2").cache()
        _JP_CACHED.append(cand)
        # no .distinct() — left_semi ignores duplicate build-side keys, and
        # skipping it saves a shuffle; cached cand's stats let the planner
        # broadcast the id list outright at candidate-bounded sizes
        ids = cand.select(F.explode(F.array("doc1", "doc2")).alias("doc_id"))
        sets = (
            shingled.join(ids, on="doc_id", how="left_semi")
            .groupBy("doc_id")
            .agg(F.collect_set("shingle").alias("sh_set"))
            .select(
                "doc_id", "sh_set", F.size("sh_set").alias("n_shingles")
            )
            .cache()
        )
        _JP_CACHED.append(sets)
        s1 = sets.select(
            F.col("doc_id").alias("doc1"),
            F.col("sh_set").alias("set1"),
            F.col("n_shingles").alias("n1"),
        )
        s2 = sets.select(
            F.col("doc_id").alias("doc2"),
            F.col("sh_set").alias("set2"),
            F.col("n_shingles").alias("n2"),
        )
        # join strategy note: the pair stream is thin (two longs) but
        # once joined it carries the per-doc shingle ARRAYS — a
        # sort-merge join would SORT those fat rows for the second join,
        # and that sort is what spills at scale (measured 12 GiB at the
        # 16x probe leg; 0 with shuffle-hash). The session therefore
        # prefers shuffle-hash over sort-merge (session.py default,
        # SPARK_GRAFT_PREFER_SHJ-overridable): small sets still
        # broadcast, large sets hash-build per partition (|docs|/N
        # rows, kept in memory by AQE partition sizing), and no
        # fat-row sort ever happens. An explicit shuffle_hash hint
        # here would override the small-scale BROADCAST too (+4 s per
        # gate, measured) — conf, not hint.
        co = (
            cand.join(s1, on="doc1")
            .join(s2, on="doc2")
            .select(
                "doc1",
                "doc2",
                F.size(F.array_intersect("set1", "set2")).alias("inter"),
                "n1",
                "n2",
            )
            .filter(F.col("inter") >= 1)
        )
        out = co.withColumn(
            "jaccard",
            F.col("inter") / (F.col("n1") + F.col("n2") - F.col("inter")),
        )
        if threshold > 0:
            out = out.filter(F.col("jaccard") >= threshold)
        return out.select("doc1", "doc2", "inter", "n1", "n2", "jaccard")
    else:
        shingled = shingled.cache()
        _JP_CACHED.append(shingled)
        sizes = shingled.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
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


def blocking_edit_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_len: int = 8,
    max_distance: int = 2,
    max_block_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
) -> DataFrame:
    """Record-linkage pairs by BLOCKING + edit-distance verify — the
    classic entity-resolution shape (Fellegi-Sunter era blocking;
    Christen, "Data Matching" 2012): candidate pairs share a cheap
    deterministic block key (the first ``block_len`` chars of the
    canonical text form), and only candidates pay the O(len²) Levenshtein
    — never the corpus cross product. Complements the n-gram tiers:
    shingle Jaccard misses single-character typos in SHORT strings
    (names, addresses, SKUs) that edit distance is built for.

    Same hot-block contract as the LSH buckets: blocks above
    ``max_block_size`` are dropped deterministically (a corpus of
    identical prefixes is what the exact tier collapses first). Returns
    (id1, id2, distance), id1 < id2, distance ≤ ``max_distance``.

    Plan: block key is the only shuffle key; the verify runs INSIDE the
    join as Spark's thresholded ``levenshtein(l, r, k)`` (early-exits
    the DP past k, returns the true distance within it — wall-clock
    O(k·len) per pair instead of O(len²))."""
    norm = normalize_text_expr(F.coalesce(F.col(text_col), F.lit("")))
    rel = df.select(
        F.col(id_col).alias("_id"),
        norm.alias("_t"),
        F.substring(norm, 1, block_len).alias("_blk"),
    )
    if max_block_size is not None:
        small = (
            rel.groupBy("_blk")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") <= max_block_size)
            .select("_blk")
        )
        rel = rel.join(small, on="_blk", how="left_semi")
    a = rel.select(
        F.col("_blk"), F.col("_id").alias("id1"), F.col("_t").alias("_t1")
    )
    b = rel.select(
        F.col("_blk").alias("_blk_b"),
        F.col("_id").alias("id2"),
        F.col("_t").alias("_t2"),
    )
    dist = F.levenshtein(F.col("_t1"), F.col("_t2"), max_distance)
    return (
        a.join(
            b,
            (F.col("_blk") == F.col("_blk_b")) & (F.col("id1") < F.col("id2")),
        )
        .withColumn("distance", dist)
        .filter((F.col("distance") >= 0) & (F.col("distance") <= max_distance))
        .select("id1", "id2", F.col("distance").cast("int").alias("distance"))
        .distinct()
    )


def postings_candidates(
    shingled: DataFrame,
    threshold: float,
    df_cap: int | None = None,
) -> DataFrame:
    """Scale-safe candidate generation for CONTAINMENT joins: a
    prefix-filtered postings join (PPJoin-family, Chaudhuri et al. 2006
    / Xiao et al. 2008, adapted to the asymmetric overlap bound), the
    candidate source :func:`containment_pairs` should be fed at scale
    (r12 verdict #1 — the uncapped shingle self-join was the one
    candidate generator a hot boilerplate shingle could blow up).

    Construction, for containment ≥ ``threshold`` t:

    * order the vocabulary globally by document frequency ascending
      (ties by shingle text) — the canonical rare-first prefix order;
    * PREFIX side: each doc keeps only its ``n - ceil(t*n) + 1`` rarest
      shingles. Completeness: for a qualifying pair (A, B) with
      n_A ≤ n_B, inter ≥ t*n_A; if none of A's prefix shingles were
      shared, the shared count would be ≤ n_A - (n_A - ceil(t*n_A) + 1)
      = ceil(t*n_A) - 1 < t*n_A — contradiction. So joining the SMALLER
      doc's prefix against the other doc's FULL postings finds every
      qualifying pair; emitting both docs' prefixes covers not knowing
      which side is smaller.
    * FULL side: all df ≥ 2 postings (df=1 cannot co-occur), optionally
      df ≤ ``df_cap``.

    Why this caps the hot-shingle blowup: a corpus-hot shingle sits
    LAST in the df-ascending order, so it enters a doc's prefix only
    when >t of that doc's shingles are even hotter — join rows per hot
    shingle are df × (docs carrying it in a prefix), not df². For
    adversarial corpora (near-identical boilerplate docs, where even
    prefixes are hot) ``df_cap`` is the hard backstop: shingles with
    df > cap are dropped from CANDIDATE GENERATION ONLY (the verifier
    still intersects full sets, so inter/|A|/|B| stay exact for every
    emitted pair); the dropped-shingle count is logged — never a silent
    cap. A pair is missed only if every shared prefix shingle of its
    smaller doc has df > cap.

    Output: distinct ``(doc1, doc2)`` with doc1 < doc2. Cost shape: one
    doc_id-partition window for the prefix ranks, one shingle-keyed
    join whose build side is the prefix relation (≈ (1-t) of the corpus
    shingle volume), candidate-bounded output."""
    from pyspark.sql import Window

    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    dfreq = shingled.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    if df_cap is not None:
        dropped = dfreq.filter(F.col("df") > df_cap)
        n_dropped = dropped.count()
        if n_dropped:
            import logging

            logging.getLogger(__name__).warning(
                "postings_candidates: df_cap=%d drops %d hot shingle(s) "
                "from candidate generation (pairs sharing ONLY these "
                "shingles will not be emitted)",
                df_cap,
                n_dropped,
            )
        dfreq = dfreq.filter(F.col("df") <= df_cap)
    posts = shingled.join(
        dfreq.filter(F.col("df") >= 2), on="shingle"
    ).select("doc_id", "shingle", "df")
    w = Window.partitionBy("doc_id").orderBy(F.col("df").asc(), F.col("shingle").asc())
    # prefix length uses the doc's FULL shingle count (df=1/dropped
    # shingles still count toward n — they are part of the doc's set and
    # of the completeness bound), so derive n from the unpruned relation
    sizes = shingled.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    prefix = (
        posts.join(sizes, on="doc_id")
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= F.col("n") - F.ceil(F.lit(threshold) * F.col("n")) + 1)
        .select("doc_id", "shingle")
    )
    p = prefix.alias("p")
    f = posts.alias("f")
    return (
        p.join(f, on="shingle")
        .filter(F.col("p.doc_id") != F.col("f.doc_id"))
        .select(
            F.least(F.col("p.doc_id"), F.col("f.doc_id")).alias("doc1"),
            F.greatest(F.col("p.doc_id"), F.col("f.doc_id")).alias("doc2"),
        )
        .distinct()
    )


def containment_pairs(
    shingled: DataFrame,
    candidates: DataFrame | None = None,
    threshold: float = 0.0,
) -> DataFrame:
    """Exact shingle CONTAINMENT for candidate pairs — the asymmetric
    near-dup measure Jaccard structurally misses (Broder, "On the
    resemblance and containment of documents", 1997): a short document
    quoted verbatim inside a 10× longer one has Jaccard ≈ |A|/|B| ≈ 0.1
    (invisible at the dedup tier's 0.2 threshold) but containment
    max(|A∩B|/|A|, |A∩B|/|B|) = inter/min(|A|,|B|) ≈ 1.0. This is the
    measure for quote/excerpt/boilerplate-inclusion detection — the
    decontamination fraction rule is its one-sided special case.

    Reuses :func:`jaccard_pairs`'s exact machinery (candidate-bounded
    pair-local set intersection, or the df≥2-pruned co-occurrence join),
    so every scale property carries over unchanged. NOTE on candidates:
    MinHash-LSH under-recalls asymmetric pairs BY DESIGN (its collision
    probability tracks Jaccard, which is low here) — for containment
    workloads pass ``candidates=postings_candidates(shingled, threshold
    [, df_cap])``: the prefix-filtered postings join is COMPLETE for the
    containment threshold and caps the hot-shingle blowup the raw
    ``candidates=None`` self-join is exposed to (df≥2 pruning only drops
    the singleton tail, not the boilerplate head — one shingle shared by
    K docs costs K² join rows there; keep that branch for small/ad-hoc
    corpora only, r12 verdict #1).

    Output adds ``containment_permille`` = inter·1000 div min(n1,n2)
    (integer-exact — no float crosses the engine boundary); ``threshold``
    filters on the exact rational inequality, not a rounded double.
    """
    base = jaccard_pairs(shingled, candidates=candidates, threshold=0.0)
    out = base.withColumn(
        "containment_permille",
        F.expr("CAST(inter * 1000 DIV least(n1, n2) AS BIGINT)"),
    )
    if threshold > 0:
        # inter / least >= t  <=>  inter * 1000 >= t*1000 * least (ints)
        t_pm = int(round(threshold * 1000))
        out = out.filter(
            F.col("inter") * 1000 >= F.lit(t_pm) * F.least("n1", "n2")
        )
    return out.select(
        "doc1", "doc2", "inter", "n1", "n2", "containment_permille"
    )
