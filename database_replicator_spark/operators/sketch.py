"""Mergeable approximate-aggregate sketches (KMV distinct, hash-Bernoulli
quantile sample).

The IVM tier (ivm.py) makes SUM/COUNT/MIN/MAX rollups maintainable at
O(delta); the two aggregates that do NOT merge are COUNT(DISTINCT) and
percentiles. The standard fix is a *mergeable sketch* stored per group:

  * **KMV / bottom-k distinct sketch** (Bar-Yossef et al. 2002; Beyer et
    al., "On Synopses for Distinct-Value Estimation Under Multiset
    Operations", SIGMOD'07): keep the k smallest hash values per group;
    with hashes uniform on [0, 2^60), E[D] ≈ (k-1)·2^60 / h_(k), relative
    error ≈ 1/√k. Union of sketches = merge (flatten, dedup, re-take k
    smallest) — exact, associative, no re-scan of the base.
  * **Hash-Bernoulli sample**: keep rows with hash60(seed:id) below
    rate·2^60 — the same deterministic threshold construction as
    `stratified_sample` (corpus.py). Samples union trivially; quantiles
    of the sample estimate quantiles of the whole.

Because both sketches are HASH-deterministic (no RNG state), the merge
property is EXACT — sketch(A ∪ B) is bit-identical to
merge(sketch(A), sketch(B)) — which the tests assert as equality, not
approximately. Spark's own approx_count_distinct/approx_percentile keep
their state inside one query; these sketches are *storable* columns, so
the combine spans pipeline runs (the IVM contract).

Scale notes: partial sketches are built per Arrow batch inside
mapInPandas (bounded memory: G·k longs for G groups in the batch), then
merged with ONE groupBy on the group key whose rows are k-bounded arrays
— the value space itself is never shuffled, which is the entire point at
100 TB (an exact COUNT(DISTINCT) shuffles every distinct value).
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import hash60, seeded

#: 2^60 — exclusive upper bound of hash60's range.
HASH60_SPAN = 1 << 60


def kmv_sketch(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    k: int = 256,
) -> DataFrame:
    """Per-group KMV sketch: ``(group_cols…, kmv array<bigint>)`` holding
    the k smallest 60-bit hashes of the value column. Store it alongside
    the IVM partials; merge new deltas in with :func:`merge_kmv`."""
    groups = list(group_cols)
    hashed = df.select(
        *groups, hash60(F.col(value_col).cast("string")).alias("_h")
    )

    out_schema = ", ".join(
        [f"`{c}` {hashed.schema[c].dataType.simpleString()}" for c in groups]
        + ["kmv array<bigint>"]
    )

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: dict[tuple, set] = {}
        for pdf in batches:
            for key, sub in pdf.groupby(groups, sort=False):
                key = key if isinstance(key, tuple) else (key,)
                s = acc.setdefault(key, set())
                s.update(sub["_h"].tolist())
                if len(s) > 4 * k:  # cap growth; keep k smallest
                    acc[key] = set(sorted(s)[:k])
        rows = [
            {**dict(zip(groups, key)), "kmv": sorted(vals)[:k]}
            for key, vals in acc.items()
        ]
        yield pd.DataFrame(rows, columns=[*groups, "kmv"])

    part = hashed.mapInPandas(partials, out_schema)
    return _combine(part, groups, k)


def merge_kmv(sketches: Sequence[DataFrame], group_cols: Sequence[str], k: int = 256) -> DataFrame:
    """Merge stored KMV sketches (base + deltas): flatten, dedup, re-take
    the k smallest. Associative and commutative — slice boundaries never
    change the result."""
    groups = list(group_cols)
    unioned = sketches[0]
    for s in sketches[1:]:
        unioned = unioned.unionByName(s)
    return _combine(unioned, groups, k)


def _combine(part: DataFrame, groups: list[str], k: int) -> DataFrame:
    return part.groupBy(*groups).agg(
        F.slice(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("kmv")))), 1, k
        ).alias("kmv")
    )


def kmv_estimate(sketch: DataFrame, k: int = 256) -> DataFrame:
    """Distinct-count estimate per group: exact when the sketch holds
    fewer than k hashes (every distinct value is present), else the KMV
    estimator (k-1)·2^60 / h_(k)."""
    n = F.size("kmv")
    kth = F.element_at("kmv", k).cast("double")
    est = F.when(n < k, n.cast("double")).otherwise(
        (F.lit(float(k - 1)) * F.lit(float(HASH60_SPAN))) / kth
    )
    return sketch.withColumn("distinct_est", est).drop("kmv")


def bernoulli_sample(
    df: DataFrame, id_col: str, rate: float, seed: int = 1
) -> DataFrame:
    """Deterministic hash-threshold row sample (keep iff
    hash60(seed:id) < rate·2^60). Union-mergeable; re-runs reproduce the
    identical sample. The quantile path: store the sample, answer
    percentile queries from it with error O(1/√(n·rate))."""
    thr = int(rate * HASH60_SPAN)
    return df.filter(hash60(seeded(F.col(id_col).cast("string"), seed)) < F.lit(thr))


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005): mergeable frequency
# sketch — d hash rows × w counters of fixed state per group/epoch,
# point-queryable with one-sided error (estimate ≥ true count, over by
# at most ~N/w with probability 1 − (1/2)^d). Like KMV above, the hash
# family is deterministic (Carter-Wegman over one md5 digest), so
# sketch(A ∪ B) == elementwise-sum(sketch(A), sketch(B)) EXACTLY and the
# tests assert equality. Reference parity: the reference keeps exact
# per-table change counts (verify.rs); the sketch is the storable,
# mergeable generalization for per-KEY frequencies at unbounded key
# cardinality.
# ---------------------------------------------------------------------------

#: Carter-Wegman modulus shared with the minhash family (dedup.py).
CMS_PRIME = 576460752303423433


def cms_counters(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 64,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the (j, col, c) counter relation: ``depth × width`` cells,
    where key k adds its weight to cell (j, (h1 + j·h2) mod P mod w)
    for every hash row j.

    Plan shape: keys are pre-aggregated FIRST (one map-side-combined
    groupBy), so the depth-way fanout explodes the distinct-key
    relation, never the raw rows; the final groupBy lands on ≤ d·w
    cells. Total sketch state is d·w longs regardless of input size —
    THE property that makes it storable per group/epoch and mergeable
    across pipeline runs (elementwise sum)."""
    from ..functions.hashing import hash60, hash60_tail

    w_expr = (
        F.sum(F.col(weight_col)) if weight_col else F.count(F.lit(1))
    )
    keys = df.groupBy(F.col(key_col).cast("string").alias("_k")).agg(
        w_expr.alias("_x")
    )
    h1 = hash60(F.col("_k"))
    h2m = hash60_tail(F.col("_k")) % F.lit(CMS_PRIME)
    rows = keys.select(
        "_k",
        "_x",
        F.explode(
            F.array(*[F.lit(j) for j in range(depth)])
        ).alias("j"),
        h1.alias("_h1"),
        h2m.alias("_h2m"),
    ).select(
        "j",
        (
            ((F.col("_h1") + F.col("j") * F.col("_h2m")) % F.lit(CMS_PRIME))
            % F.lit(width)
        ).alias("col"),
        "_x",
    )
    return rows.groupBy("j", "col").agg(F.sum("_x").alias("c"))


def cms_merge(sketches: Sequence[DataFrame]) -> DataFrame:
    """Union of inputs = elementwise counter sum (CMS linearity)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("j", "col").agg(F.sum("c").alias("c"))


def cms_estimate(
    counters: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """Point-query the sketch for each key: min over the d counters the
    key hashes into. Returns (key_col, cms_estimate). The candidate-key
    relation is the caller's (top-k candidates, a dimension, a sample) —
    the sketch itself cannot enumerate keys, by construction."""
    from ..functions.hashing import hash60, hash60_tail

    h1 = hash60(F.col(key_col).cast("string"))
    h2m = hash60_tail(F.col(key_col).cast("string")) % F.lit(CMS_PRIME)
    coords = keys.select(
        F.col(key_col),
        F.explode(F.array(*[F.lit(j) for j in range(depth)])).alias("j"),
        h1.alias("_h1"),
        h2m.alias("_h2m"),
    ).select(
        key_col,
        "j",
        (
            ((F.col("_h1") + F.col("j") * F.col("_h2m")) % F.lit(CMS_PRIME))
            % F.lit(width)
        ).alias("col"),
    )
    # LEFT join + zero-fill: a cell no build key hashed into is a ZERO
    # counter, not an absent one — an inner join would take the min over
    # only the populated cells, inflating (or dropping) estimates for
    # keys outside the build set, which the candidate-key contract
    # explicitly allows
    return (
        coords.join(F.broadcast(counters), on=["j", "col"], how="left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("cms_estimate"))
    )


def kmv_set_ops(
    sketch_a: DataFrame,
    sketch_b: DataFrame,
    k: int = 256,
    round_digits: int = 6,
) -> DataFrame:
    """Set-operation estimates from two stored KMV sketches (Beyer et
    al. SIGMOD'07, the multiset-operations half of the KMV paper): pool
    the two bottom-k hash sets, re-take the k smallest as the unified
    threshold sample K with θ = max(K); then

      * ``jaccard_est``       = |K ∩ A ∩ B| / |K|
      * ``union_est``         = (k−1)·2^60 / θ  (exact |pool| when the
        pool holds fewer than k hashes — every distinct value is there)
      * ``intersection_est``  = jaccard_est · union_est

    Everything is integer set arithmetic on the stored hashes until the
    two final double divisions, so both engines agree exactly — the
    same determinism contract as the sketches themselves. This answers
    "how many keys do these two epochs/tables/partitions SHARE" from
    d·k longs of stored state, no re-scan of either input."""
    a = sketch_a.select(F.col("kmv").alias("_a"))
    b = sketch_b.select(F.col("kmv").alias("_b"))
    staged = (
        a.crossJoin(b)
        .withColumn(
            "_pool", F.array_sort(F.array_distinct(F.concat("_a", "_b")))
        )
        .withColumn("_K", F.slice("_pool", 1, k))
        .withColumn("_kk", F.least(F.lit(k), F.size("_pool")))
        .withColumn(
            "_m",
            F.size(
                F.array_intersect(
                    F.array_intersect(F.col("_K"), F.col("_a")), F.col("_b")
                )
            ),
        )
        # lazily guarded: when both stored sketches are empty the pool is
        # empty and _kk = 0 — element_at(_K, 0) would raise, so gate it
        # behind the CASE (Spark evaluates branches lazily) and emit a
        # well-defined zero-overlap row instead
        .withColumn(
            "_theta",
            F.when(
                F.col("_kk") > 0, F.expr("element_at(_K, _kk)").cast("double")
            ),
        )
    )
    jac = F.when(
        F.col("_kk") > 0,
        F.col("_m").cast("double") / F.col("_kk").cast("double"),
    ).otherwise(F.lit(0.0))
    union_est = F.when(
        F.size("_pool") < k, F.size("_pool").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(float(HASH60_SPAN)) / F.col("_theta")
    )
    return staged.select(
        F.col("_kk").cast("bigint").alias("k_used"),
        F.col("_m").cast("bigint").alias("matching"),
        F.round(jac, round_digits).alias("jaccard_est"),
        F.round(union_est, round_digits).alias("union_est"),
        F.round(jac * union_est, round_digits).alias("intersection_est"),
    )


def bloom_bits(
    df: DataFrame,
    key_col: str,
    m: int = 1024,
    d: int = 3,
) -> DataFrame:
    """Deterministic Bloom filter over the key column, stored SPARSE:
    one row holding the sorted array of set bit positions (≤ m longs;
    production packs to an m-bit binary — the representation changes,
    the set arithmetic does not). Positions come from the repo's
    Carter-Wegman family, so build and probe agree across engines and
    epochs, and two filters over disjoint slices merge by array union —
    the storable, shippable form of the runtime semi-join pre-filter:
    at 100 TB you broadcast a KB of bits to skip a key shuffle, the
    same trick Spark's own runtime bloom join plays, but as a COLUMN
    the pipeline can persist per table/epoch."""
    from ..functions.hashing import hash60, hash60_tail

    keys = df.select(F.col(key_col).cast("string").alias("_k")).distinct()
    hashed = keys.select(
        hash60(F.col("_k")).alias("_h1"),
        (hash60_tail(F.col("_k")) % F.lit(CMS_PRIME)).alias("_h2m"),
    )
    pos = (
        hashed.select(
            F.explode(F.array(*[F.lit(j) for j in range(d)])).alias("j"),
            "_h1",
            "_h2m",
        )
        .select(
            (
                ((F.col("_h1") + F.col("j") * F.col("_h2m"))
                 % F.lit(CMS_PRIME))
                % F.lit(m)
            ).alias("pos")
        )
        .distinct()
    )
    return pos.agg(F.sort_array(F.collect_list("pos")).alias("bits"))


def bloom_might_contain(
    bits: DataFrame,
    keys: DataFrame,
    key_col: str,
    m: int = 1024,
    d: int = 3,
) -> DataFrame:
    """Probe: key passes iff all its d bit positions are set. No false
    negatives ever (members always pass); false-positive rate is the
    standard (1 − e^(−d·n/m))^d. Adds a ``might_contain`` boolean."""
    from ..functions.hashing import hash60, hash60_tail

    h1 = hash60(F.col(key_col).cast("string"))
    h2m = hash60_tail(F.col(key_col).cast("string")) % F.lit(CMS_PRIME)
    probed = keys.crossJoin(F.broadcast(bits))
    cond = F.lit(True)
    for j in range(d):
        pos_j = ((h1 + F.lit(j) * h2m) % F.lit(CMS_PRIME)) % F.lit(m)
        cond = cond & F.array_contains(F.col("bits"), pos_j)
    return probed.withColumn("might_contain", cond).drop("bits")


def mg_summary(
    df: DataFrame,
    key_col: str,
    k: int = 16,
    weight_col: str | None = None,
) -> DataFrame:
    """Misra-Gries heavy-hitter summary (Misra & Gries 1982): at most
    ``k`` (key, lower-bound count) pairs such that every key with true
    frequency > N/(k+1) is PRESENT, and each reported count satisfies
    ``true − N/(k+1) ≤ reported ≤ true``. Complements the CMS point
    query: CMS needs candidate keys; MG *produces* the candidates from
    k counters of state.

    The classic streaming MG's surviving set depends on arrival order;
    this implementation instead pre-aggregates exact per-key counts
    map-side (one shuffle of distinct keys — the same shuffle an exact
    top-k pays) and applies the MG decrement once over the aggregated
    relation: subtract the (k+1)-th largest count from everyone and
    keep the strictly-positive remainder — the MG fixed point for
    weighted input, at most k survivors, and fully DETERMINISTIC (the
    threshold is a value, not an order), so it oracle-gates like any
    exact query. Returns (key, mg_count, n_total).

    100 TB shape: the only shuffle is the key-count aggregate the exact
    top-k would also pay; the decrement is a broadcast of ONE scalar
    (the k+1-th count via TakeOrdered over counts) — no global sort."""
    w_expr = (
        F.sum(F.col(weight_col)) if weight_col else F.count(F.lit(1))
    )
    counts = df.groupBy(F.col(key_col)).agg(w_expr.alias("_x"))
    # (k+1)-th largest count: bounded TakeOrdered, no whole-relation sort
    top = [r["_x"] for r in counts.orderBy(F.col("_x").desc()).take(k + 1)]
    # N from the (distinct-key-sized) counts relation — never a second
    # scan of the raw input
    n_total = counts.agg(F.sum("_x")).first()[0]
    if len(top) <= k:
        thresh = 0  # fewer than k+1 keys: summary is exact
    else:
        thresh = top[k]
    out = (
        counts.withColumn("mg_count", F.col("_x") - F.lit(thresh))
        .filter(F.col("mg_count") > 0)
        .select(
            key_col,
            "mg_count",
            F.lit(n_total).alias("n_total"),
        )
    )
    return out


# ---------------------------------------------------------------------------
# HyperLogLog — the industry-standard mergeable distinct sketch
# (Flajolet, Fusy, Gandouet, Meunier, "HyperLogLog: the analysis of a
# near-optimal cardinality estimation algorithm", AofA 2007). KMV gives
# k·8 bytes per group; HLL gives m·6 bits with ~1.04/√m relative error
# and a MAX-merge (commutative, idempotent — the friendliest merge in
# the sketch family). Spark's approx_count_distinct is HLL++ inside one
# query; these registers are STORABLE rows (group, bucket, rho), so the
# merge spans runs, engines, and partial-sketch shipments — the IVM
# contract, same as the KMV/CMS/KLL tiers.
#
# Determinism contract (the reason this is oracle-gateable while
# approx_count_distinct is not): the register transform is pure integer
# arithmetic on hash60 — bucket = h mod m, rho = leading-zero count of
# the remaining w = 60 - b bits + 1 via string-length-of-bin (exact in
# both engines; log2-on-bigint would misround near powers of two) —
# and the estimator's harmonic sum is computed in INTEGERS
# (Σ 2^(w+1-ρ_j), absent buckets contributing 2^(w+1)), so the only
# float ops are one division and the standard-correction ln/round,
# the proven cross-engine pattern (BM25 contribs).
# ---------------------------------------------------------------------------

def hll_alpha(m: int) -> float:
    """The α_m bias constant (Flajolet et al. §4, m ≥ 128)."""
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    b: int = 8,
) -> DataFrame:
    """Sparse HLL registers per group: (``*group_cols``, bucket, rho)
    with rho = max over the group's values hashing into the bucket.
    Sparse (absent bucket == register 0) so tiny groups don't pay m
    rows. ONE groupBy on (group, bucket) with a map-side-combined MAX —
    the value space itself is never shuffled."""
    m = 1 << b
    w = 60 - b
    groups = list(group_cols)
    h = hash60(F.col(value_col).cast("string"))
    hashed = df.select(*groups, h.alias("_h")).select(
        *groups,
        F.pmod(F.col("_h"), F.lit(m)).cast("int").alias("bucket"),
        # the remaining w bits; h is non-negative so DIV == floor-div
        F.expr(f"_h DIV {m}").alias("_h2"),
    )
    rho = F.when(F.col("_h2") == 0, F.lit(w + 1)).otherwise(
        F.lit(w) - F.length(F.bin(F.col("_h2"))) + 1
    )
    return (
        hashed.withColumn("_rho", rho)
        .groupBy(*groups, "bucket")
        .agg(F.max("_rho").cast("int").alias("rho"))
    )


def hll_merge(
    sketches: Sequence[DataFrame], group_cols: Sequence[str]
) -> DataFrame:
    """Union of HLL sketches = per-(group, bucket) MAX of registers —
    commutative and idempotent, so re-merging a shipment is harmless.
    sketch(A ∪ B) is bit-identical to merge(sketch(A), sketch(B)): the
    tests assert equality, not approximation (the house sketch rule)."""
    groups = list(group_cols)
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy(*groups, "bucket").agg(
        F.max("rho").cast("int").alias("rho")
    )


def hll_estimate(
    regs: DataFrame,
    group_cols: Sequence[str],
    b: int = 8,
    round_digits: int = 4,
) -> DataFrame:
    """Cardinality estimate per group from sparse registers: raw HLL
    E = α_m·m²/Σ2^(−ρ_j) with the small-range linear-counting correction
    (E ≤ 2.5m and empty buckets → m·ln(m/V)). The harmonic sum is exact
    integer arithmetic scaled by 2^(w+1): Σ 2^(w+1−ρ_j) + zeros·2^(w+1)
    (max 2^53·m — fits bigint for b ≥ 7), so the estimate is one IEEE
    division of exact integers; output rounded to ``round_digits``."""
    m = 1 << b
    w = 60 - b
    scale = w + 1  # max rho, so every term 2^(scale - rho) is integral
    groups = list(group_cols)
    per_group = regs.groupBy(*groups).agg(
        # SQL shiftleft takes a column shift amount (the Python API
        # wrapper insists on an int literal)
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {scale} - rho)")
        ).alias("_s_present"),
        F.count(F.lit(1)).alias("_n_buckets"),
    )
    zeros = F.lit(m) - F.col("_n_buckets")
    s_int = F.col("_s_present") + zeros * F.lit(1 << scale).cast("bigint")
    raw = (
        F.lit(float(hll_alpha(m)) * m * m * float(1 << scale))
        / s_int.cast("double")
    )
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    return per_group.select(
        *groups,
        zeros.cast("bigint").alias("empty_buckets"),
        F.round(est, round_digits).alias("hll_estimate"),
    )
