"""Corpus-level training-data pipeline operators.

These extend the dedup/similarity tiers (dedup.py, similarity.py) with the
operations a 100 TB pretraining-data pipeline runs *after* pair generation:

  * **Connected components** — near-dup pairs are edges; the unit of
    deduplication is the *cluster* (keep one canonical doc per component).
    Implemented as iterative hash-min label propagation over DataFrames:
    each round every node takes the min label among itself and its
    neighbors; converges in O(component diameter) rounds. Near-dup
    clusters are star-shaped in practice (diameter ≤ 4 even at web scale
    — see the large-star/small-star analysis in Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14), so the
    round count stays small; each round is one self-contained
    join+groupBy shuffle on the edge list. For adversarial long-path
    graphs, switch to the large-star/small-star rewrite (same join
    primitives, O(log n) rounds).
  * **Decontamination** — n-gram collision join between the training
    corpus and a benchmark/eval set: any training doc sharing ≥ t
    shingles with an eval doc is flagged. The benchmark side is tiny by
    construction → broadcast join; cost is one scan of the corpus
    shingles.
  * **Stratified sampling** — deterministic per-stratum Bernoulli
    sampling via a portable hash threshold: keep iff
    hash60(seed:doc_id) < rate·2^60. Reproducible across engines and
    re-runs (no RNG state), exactly-once per doc, and embarrassingly
    parallel — the property a training-mix builder needs.
  * **Sequence packing** — deterministic token-budget chunking: docs are
    ordered within a partition key, cumulative token counts assign each
    doc to pack floor(cum_before/budget). One window per partition key;
    no shuffle beyond the partition key. (Greedy first-fit packs ~equally
    well at corpus scale and would need a sequential scan; the cumulative
    rule is order-parallel.)
  * **TF-IDF top terms** — per-doc top-k salient terms: tf·idf with
    idf = ln((N+1)/(df+1)), ranked on the 6-dp-rounded score (ties by
    term) so ranking is reproducible bit-for-bit across engines.

All hashes use the portable md5-based hash60 (functions/hashing.py) so
every operator is oracle-checkable in DuckDB; swap xxhash64 at production
scale where cross-engine parity is not needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import hash60, seeded
from ..util import spread_by

#: 2^60 — the exclusive upper bound of hash60's range, used to turn a
#: sampling rate into an integer hash threshold.
HASH60_SPAN = 1 << 60


def connected_components(
    nodes: DataFrame,
    pairs: DataFrame,
    id_col: str = "node",
    src_col: str = "doc1",
    dst_col: str = "doc2",
    max_rounds: int = 25,
    driver_path_max_edges: int = 200_000,
) -> DataFrame:
    """Label every node with the minimum node id reachable through
    ``pairs`` (undirected). Returns (node, cluster_id).

    Hash-min propagation with pointer jumping: labels start as self; each
    round a node's label becomes min(own, neighbors' labels), then is
    path-compressed through one label→label hop — so label distance to
    the component minimum roughly halves per round and convergence takes
    O(log diameter) rounds, not O(diameter). Each round is two keyed
    joins + one groupBy, all shuffled on node ids; the loop is
    driver-side but every iteration's *data* stays distributed — the only
    driver value is the changed-row count used for convergence.

    Singleton pruning: nodes that appear in no edge can never change
    label, so the iteration runs only over edge endpoints (at 100 TB the
    near-dup graph's vertex set is a small fraction of the corpus) and
    singletons are appended unlabeled-as-self afterwards.

    Lineage control: every per-round frame is cut with an eager
    ``localCheckpoint()``, NOT ``cache()``. Iterative self-referential
    joins defeat Spark's cache plan-matching (the round-N plan embeds
    round-N-1's full lineage; a lookup miss re-runs the entire upstream
    pair pipeline — measured 180 s/round vs 0.7 s checkpointed on a
    477-node graph), and unbounded logical plans also blow up Catalyst
    analysis time. localCheckpoint stores executor-local RDD blocks; on
    a production cluster with preemptible executors, point
    ``spark.sparkContext.setCheckpointDir`` at durable storage and swap
    in ``checkpoint()`` for fault-tolerant lineage cuts.
    """
    # Materialize the edge list BEFORE anything consumes it twice: the
    # symmetric union's two branches (and the fast-path probe below)
    # would otherwise embed the caller's full pair pipeline as separate
    # subtrees, and ReuseExchange only dedupes up to the last exchange —
    # the post-exchange stages (candidate joins, set intersections) ran
    # twice. One O(edges) checkpoint collapses that to a single
    # execution (measured ~12% off dedup_components at sf0.1).
    edges = pairs.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint()
    all_nodes = nodes.select(F.col(id_col).alias("node"))

    # Small-graph fast path: near-dup graphs are usually a sliver of the
    # corpus, and the iterative loop pays 4+ scheduled jobs PER ROUND —
    # pure round-trip latency when the edge set fits on the driver. Probe
    # with one LIMIT-cap-plus-one collect against the already
    # materialized edge list: if every raw edge came back, run min-root
    # union-find driver-side — label = min reachable id, exactly the
    # loop's fixpoint, so the two paths are output-identical (tested) and
    # the oracle never sees which one ran. Symmetrization and
    # deduplication are free inside union-find, so the fast path never
    # builds the distributed ``sym``/``endpoints`` frames at all — the
    # whole probe+solve is 2 scheduled jobs (checkpoint + collect),
    # down from 6 (sym distinct, endpoints distinct, count, 2 collects)
    # in the earlier shape; at ~0.2 s of scheduler latency per tiny job
    # that is most of the operator's small-scale cost. The cap bounds
    # driver memory (200k raw edge rows ≈ a few MB); above it, or with
    # the cap set to 0, the distributed loop below is the path — THAT is
    # the 100 TB story, the fast path is the toy-to-mid-scale latency
    # win.
    if driver_path_max_edges:
        probe = edges.limit(driver_path_max_edges + 1).collect()
        if len(probe) <= driver_path_max_edges:
            parent: dict = {}

            def find(x):
                r = x
                while parent.get(r, r) != r:
                    r = parent[r]
                while parent.get(x, x) != x:  # path compression
                    parent[x], x = r, parent[x]
                return r

            for row in probe:
                a, b = find(row["src"]), find(row["dst"])
                if a != b:
                    # union by MIN id keeps the label = component minimum
                    lo, hi = (a, b) if a < b else (b, a)
                    parent[hi] = lo
            ep_rows = sorted(
                {row["src"] for row in probe} | {row["dst"] for row in probe}
            )
            import pandas as pd

            spark = nodes.sparkSession
            node_schema = edges.select(
                F.col("src").alias("node"),
                F.col("src").alias("cluster_id"),
            ).schema
            # pandas → Arrow ingestion: ~10× cheaper than a Python tuple
            # list at the cap boundary (hundreds of thousands of rows)
            labeled = spark.createDataFrame(
                pd.DataFrame(
                    {
                        "node": ep_rows,
                        "cluster_id": [find(n) for n in ep_rows],
                    }
                ),
                schema=node_schema,
            )
            endpoint_ids = spark.createDataFrame(
                pd.DataFrame({"node": ep_rows}),
                schema=labeled.select("node").schema,
            )
            singles = all_nodes.join(
                endpoint_ids, on="node", how="left_anti"
            ).select("node", F.col("node").alias("cluster_id"))
            return labeled.unionByName(singles)

    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct().localCheckpoint()
    endpoints = sym.select(F.col("src").alias("node")).distinct().localCheckpoint()
    singletons = all_nodes.join(endpoints, on="node", how="left_anti").select(
        "node", F.col("node").alias("label")
    )

    labels = endpoints.select("node", F.col("node").alias("label")).localCheckpoint()
    for _ in range(max_rounds):
        neigh = (
            sym.join(labels, sym["dst"] == labels["node"])
            .groupBy("src")
            .agg(F.min("label").alias("nlabel"))
            .withColumnRenamed("src", "node")
        )
        # min(self, neighbors) ...
        cand = labels.select("node", F.col("label").alias("old_label")).join(
            neigh, on="node", how="left"
        ).select(
            "node",
            "old_label",
            F.least(
                F.col("old_label"), F.coalesce(F.col("nlabel"), F.col("old_label"))
            ).alias("clabel"),
        )
        # ... then compress one hop: node→label→(that label's label).
        # Labels are always node ids within the active set, so the join hits.
        lmap = cand.select(
            F.col("node").alias("lnode"), F.col("clabel").alias("llabel")
        )
        merged = (
            cand.join(lmap, cand["clabel"] == lmap["lnode"], "left")
            .select(
                "node",
                "old_label",
                F.least(
                    F.col("clabel"), F.coalesce(F.col("llabel"), F.col("clabel"))
                ).alias("label"),
            )
        ).localCheckpoint()  # eager: cuts lineage and materializes in one action
        # convergence compares against the PREVIOUS round's label (not the
        # intermediate neighbor-min), else compression-free rounds would
        # terminate early with unpropagated labels
        changed = merged.filter(F.col("label") != F.col("old_label")).count()
        labels = merged.select("node", "label")
        if changed == 0:
            break
    return labels.unionByName(singletons).withColumnRenamed("label", "cluster_id")


def connected_components_star(
    nodes: DataFrame,
    pairs: DataFrame,
    id_col: str = "node",
    src_col: str = "doc1",
    dst_col: str = "doc2",
    max_rounds: int = 50,
) -> DataFrame:
    """Alternating large-star/small-star connected components (Kiveris et
    al., "Connected Components in MapReduce and Beyond", SoCC'14) — the
    adversarial-graph companion to :func:`connected_components`:
    hash-min+pointer-jumping is ideal for the star-shaped clusters
    near-dup graphs produce, but a long-path graph costs it O(log
    diameter) rounds with the FULL edge set alive each round; the star
    rewrites provably converge in O(log n) rounds while monotonically
    bending edges toward component minima.

    Per round (u = the groupBy center, m = min of u and its neighbors):

    * large-star: every neighbor v > u re-attaches to m — (v, m);
    * small-star: every neighbor v < u, and u itself, attach to m.

    Each half-round is ONE groupBy on the symmetric adjacency + a
    projection — the same shuffle budget as a hash-min round but with an
    edge set that can only shrink toward the final star forest.
    Convergence = unchanged (count, hash-sum) edge signature; the
    signature is two longs to the driver per round. Same localCheckpoint
    lineage-cut policy as :func:`connected_components` (and the same
    durable-``checkpoint()`` swap on preemptible clusters).
    """
    edges = pairs.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).filter(F.col(src_col) != F.col(dst_col))
    sym = (
        edges.unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .localCheckpoint()
    )
    endpoints = sym.select(F.col("src").alias("node")).distinct().localCheckpoint()
    all_nodes = nodes.select(F.col(id_col).alias("node"))
    singletons = all_nodes.join(endpoints, on="node", how="left_anti").select(
        "node", F.col("node").alias("cluster_id")
    )

    def _star(cur: DataFrame, large: bool) -> DataFrame:
        m = cur.groupBy("src").agg(F.min("dst").alias("_nmin"))
        m = m.select(
            "src", F.least(F.col("src"), F.col("_nmin")).alias("m")
        )
        joined = cur.join(m, on="src")
        cond = F.col("dst") > F.col("src") if large else F.col("dst") < F.col("src")
        out = joined.filter(cond).select(F.col("dst").alias("a"), F.col("m").alias("b"))
        if not large:
            out = out.unionByName(
                m.select(F.col("src").alias("a"), F.col("m").alias("b"))
            )
        out = out.filter(F.col("a") != F.col("b"))
        # re-symmetrize for the next half-round's groupBy
        return (
            out.unionByName(
                out.select(F.col("b").alias("a"), F.col("a").alias("b"))
            )
            .distinct()
            .select(F.col("a").alias("src"), F.col("b").alias("dst"))
        )

    def _sig(cur: DataFrame) -> tuple[int, int]:
        row = cur.agg(
            F.count(F.lit(1)).alias("c"),
            F.coalesce(F.sum(F.hash("src", "dst").cast("long")), F.lit(0)).alias("h"),
        ).collect()[0]
        return int(row["c"]), int(row["h"])

    cur = sym
    sig = _sig(cur)
    for _ in range(max_rounds):
        cur = _star(cur, large=True).localCheckpoint()
        cur = _star(cur, large=False).localCheckpoint()
        nsig = _sig(cur)
        if nsig == sig:
            break
        sig = nsig
    labels = (
        cur.groupBy("src")
        .agg(F.min("dst").alias("_nmin"))
        .select(
            F.col("src").alias("node"),
            F.least(F.col("src"), F.col("_nmin")).alias("cluster_id"),
        )
    )
    # nodes already at their component minimum have only larger neighbors
    # in the final star forest; their own id IS the label (least() above).
    return labels.unionByName(singletons)


def ngram_overlap(
    shingled: DataFrame,
    bench_pred,
    min_overlap: int = 1,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Decontamination: training docs sharing ≥ ``min_overlap`` shingles
    with any benchmark doc.

    ``shingled`` is (doc_id, shingle) distinct pairs (dedup.doc_shingles);
    ``bench_pred`` is a Column predicate over doc_id selecting the
    benchmark subset. Returns (train_doc, bench_doc, n_overlap,
    n_train_shingles, overlap_frac).

    Plan: the benchmark shingle set is small by construction — broadcast
    it (``broadcast_bench=True``, the default); the corpus side is never
    self-joined and NEVER cached. When the benchmark shingle table itself
    outgrows the broadcast budget, pass ``broadcast_bench=False`` to drop
    the hint and let the collision join run as a shuffle join (or use
    :func:`ngram_overlap_bloom`, which prunes the train side map-side
    first). The train side is deliberately re-derived from the scan for
    its two consumers (per-doc sizes, collision hits): shingling is a
    map-only codegen explode, so the cost is two columnar scans with
    pushdown — cheap at any scale — whereas MEMORY_AND_DISK-caching an
    exploded (doc_id, shingle) table (~10× the corpus text at 100 TB) is
    an eviction storm. Only the benchmark side is ever materialized, and
    only when broadcast.
    """
    bench = shingled.filter(bench_pred).select(
        F.col("doc_id").alias("bench_doc"), "shingle"
    )
    train = shingled.filter(~bench_pred)
    sizes = train.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_train_shingles"))
    hits = (
        train.join(F.broadcast(bench) if broadcast_bench else bench, on="shingle")
        .groupBy(F.col("doc_id").alias("train_doc"), "bench_doc")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
        .filter(F.col("n_overlap") >= min_overlap)
    )
    return (
        hits.join(sizes.withColumnRenamed("doc_id", "train_doc"), on="train_doc")
        .select(
            "train_doc",
            "bench_doc",
            "n_overlap",
            "n_train_shingles",
            F.round(F.col("n_overlap") / F.col("n_train_shingles"), 6).alias(
                "overlap_frac"
            ),
        )
    )


def sample_threshold(rate: float) -> int:
    """Integer hash threshold for a Bernoulli rate (keep iff hash < this)."""
    return int(rate * HASH60_SPAN)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    id_col: str = "doc_id",
    seed: int = 0,
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic stratified Bernoulli sample: a row in stratum s is
    kept iff hash60(seed:id) < rates[s]·2^60. Adds ``sample_key`` (the
    hash draw) and ``weight`` (1/rate — Horvitz-Thompson inverse
    probability, what downstream mixture accounting multiplies by).

    No RNG state, no per-partition seeding hazards: the decision is a pure
    function of (id, seed, stratum rate), so re-runs, retries, and other
    engines reproduce the identical sample — unlike ``df.sample`` whose
    output depends on partitioning.
    """
    draw = hash60(seeded(F.col(id_col).cast("string"), seed))
    rate_expr = None
    for stratum, rate in rates.items():
        cond = F.col(strata_col) == stratum
        rate_expr = (
            F.when(cond, F.lit(rate))
            if rate_expr is None
            else rate_expr.when(cond, F.lit(rate))
        )
    rate_expr = (
        rate_expr.otherwise(F.lit(default_rate))
        if rate_expr is not None
        else F.lit(default_rate)
    )
    thresh = None
    for stratum, rate in rates.items():
        cond = F.col(strata_col) == stratum
        t = F.lit(sample_threshold(rate))
        thresh = F.when(cond, t) if thresh is None else thresh.when(cond, t)
    thresh = (
        thresh.otherwise(F.lit(sample_threshold(default_rate)))
        if thresh is not None
        else F.lit(sample_threshold(default_rate))
    )
    return (
        df.withColumn("sample_key", draw)
        .filter(F.col("sample_key") < thresh)
        .withColumn("weight", F.round(F.lit(1.0) / rate_expr, 6))
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    cap: int,
    id_col: str = "doc_id",
    seed: int = 0,
    range_shards: int | None = None,
) -> DataFrame:
    """Per-group document cap with deterministic hash-ordered selection —
    the C4/RefinedWeb-style per-domain cap: within each ``group_col``
    value keep at most ``cap`` docs, chosen by ascending
    ``hash60(seed:id)`` (an unbiased deterministic draw; re-runs and
    other engines reproduce it exactly). Adds ``sel_rank`` (1-based rank
    within the group's draw order).

    Scale shape: one shuffle on the group key + a per-group sort on the
    60-bit draw — the same cost class as any per-group top-k. The known
    hazard is a mega-domain (billions of docs in one group): its sort
    lands on one task. ``range_shards=S`` closes it exactly (not
    approximately): the draw is uniform in [0, 2^60), so fixed ranges
    ``shard = draw >> (60 - log2 S)`` split every group into ~equal
    DRAW-ORDERED shards; rank = row_number within (group, shard) + the
    group's cumulative count of lower shards (a tiny offsets join —
    same two-pass trick as pack_sequences). Output is IDENTICAL to the
    single-window form; no task ever sorts more than group/S rows. The
    single window (default) is right at typical cap settings.
    """
    draw = hash60(seeded(F.col(id_col).cast("string"), seed))
    keyed = df.withColumn("sel_key", draw)
    if range_shards is None:
        w = Window.partitionBy(group_col).orderBy(
            F.col("sel_key").asc(), F.col(id_col).asc()
        )
        return (
            keyed.withColumn("sel_rank", F.row_number().over(w))
            .filter(F.col("sel_rank") <= cap)
            .drop("sel_key")
        )
    shard_bits = max(range_shards - 1, 1).bit_length()
    keyed = keyed.withColumn(
        "_shard", F.shiftright(F.col("sel_key"), 60 - shard_bits)
    )
    # pass 1: per-(group, shard) counts → per-group offsets of lower shards
    counts = keyed.groupBy(group_col, "_shard").agg(F.count(F.lit(1)).alias("_n"))
    w_off = (
        Window.partitionBy(group_col)
        .orderBy(F.col("_shard").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.withColumn(
        "_offset", F.coalesce(F.sum("_n").over(w_off), F.lit(0))
    ).select(group_col, "_shard", "_offset")
    # pass 2: rank within each bounded (group, shard) + offset
    w_shard = Window.partitionBy(group_col, "_shard").orderBy(
        F.col("sel_key").asc(), F.col(id_col).asc()
    )
    return (
        keyed.join(offsets, on=[group_col, "_shard"])
        .withColumn(
            "sel_rank",
            (F.row_number().over(w_shard) + F.col("_offset")).cast("int"),
        )
        .filter(F.col("sel_rank") <= cap)
        .drop("sel_key", "_shard", "_offset")
    )


def unigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_token_digits: int = 6,
    round_digits: int = 6,
) -> DataFrame:
    """Corpus-trained unigram LM quality score per document — the
    CCNet-style perplexity filter with the LM reduced to unigrams so the
    whole operator stays inside Catalyst codegen and is SQL-reproducible.

    Model: add-one-smoothed unigram probabilities over the corpus's own
    normalized whitespace tokens, p(t) = (c_t + 1) / (N + V). Score:
    avg_logprob = Σ ln p(t_i) / n_tokens (monotone in perplexity =
    exp(-avg); the exp is omitted to avoid a second libm call in the
    cross-engine contract). Low avg_logprob → rare-token-heavy (gibberish
    or boilerplate-free unique text); high → repetitive common-token text.

    Cross-engine determinism: ln p is rounded to ``round_token_digits``
    and cast DECIMAL(28,12) BEFORE the sum, so both engines perform the
    identical exact decimal addition in any order (libm's last-ulp ln
    differences sit ~1e-10 below the rounding quantum).

    Scale shape: one token explode (map-only), one groupBy token for the
    vocab (partial-combine shuffle), one token→freq join (sort-merge on
    the token key at corpus scale; the vocab side is Zipf-skewed but the
    join key is the token itself so AQE's skew split applies), one
    per-doc aggregation. No Python anywhere.
    """
    from .textops import normalize_text_expr

    toks = df.select(
        F.col(id_col),
        F.explode(
            F.split(normalize_text_expr(F.coalesce(F.col(text_col), F.lit(""))), " ")
        ).alias("token"),
    )
    vocab = toks.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    totals = vocab.agg(
        F.sum("c").alias("n_total"), F.count(F.lit(1)).alias("v_size")
    )
    scored = (
        toks.join(vocab, on="token")
        .crossJoin(F.broadcast(totals))
        .select(
            F.col(id_col),
            F.round(
                F.log((F.col("c") + 1) / (F.col("n_total") + F.col("v_size"))),
                round_token_digits,
            )
            .cast("decimal(28,12)")
            .alias("lp"),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("lp").alias("_sum_lp"),
        )
        .select(
            id_col,
            "n_tokens",
            # the decimal sum is exactly 6-dp, so rounding its double to 6
            # is identity-stable; the string round-trip keeps the
            # decimal→double conversion correctly rounded in both engines
            F.round(
                F.col("_sum_lp").cast("string").cast("double"), round_digits
            ).alias("sum_logprob"),
            # double division of the exact decimal sum — decimal-division
            # scale rules differ across engines, double division does not.
            # NO final round: sum/count is not 6-dp, and rounding a value
            # that CAN sit on a .5e-6 midpoint diverges between engines
            (
                F.col("_sum_lp").cast("string").cast("double")
                / F.col("n_tokens")
            ).alias("avg_logprob"),
        )
    )


def pack_sequences(
    df: DataFrame,
    budget: int,
    token_col: str = "n_tokens",
    order_col: str = "doc_id",
    part_col: str | None = None,
    range_width: int | None = 4096,
) -> DataFrame:
    """Assign each doc to a token-budget pack: docs are ordered by
    ``order_col`` within ``part_col`` (or globally when None); pack_id =
    (cumulative tokens before this doc) div budget, slot = position within
    the pack. Docs longer than the budget get a pack of their own (the
    cumulative rule never splits a doc).

    Scale shape (two-pass range packing): a real pretraining corpus has
    maybe tens of sources (common_crawl alone is most of 100 TB), so a
    window partitioned by ``part_col`` alone would sort a multi-TB stratum
    in ONE task. Instead docs are range-bucketed on ``order_col div
    range_width`` — pass 1 aggregates per-bucket token totals (tiny:
    strata × buckets rows) and turns them into per-bucket prefix offsets
    with a window over the AGGREGATE frame; pass 2 windows inside each
    (part, bucket) — thousands of parallel bounded sorts — and adds the
    broadcast offset. The output (cum_tokens / pack_id / slot) is
    identical to the single-window form, which remains available via
    ``range_width=None`` (requires a numeric ``order_col`` otherwise).

    The slot window partitions by pack_id; packs are ≤ budget tokens so
    those partitions are bounded regardless of corpus size.
    """
    from pyspark.sql import Window

    keys = [part_col] if part_col else []
    if range_width:
        data = df.withColumn("_bkt", F.expr(f"{order_col} div {range_width}"))
        totals = data.groupBy(*keys, "_bkt").agg(
            F.sum(F.col(token_col)).alias("_bkt_tokens")
        )
        woff = Window.partitionBy(*keys).orderBy("_bkt").rowsBetween(
            Window.unboundedPreceding, -1
        )
        offsets = totals.withColumn(
            "_offset",
            F.coalesce(F.sum("_bkt_tokens").over(woff), F.lit(0)).cast("bigint"),
        ).drop("_bkt_tokens")
        wb = Window.partitionBy(*(keys + ["_bkt"])).orderBy(order_col).rowsBetween(
            Window.unboundedPreceding, 0
        )
        out = (
            data.join(F.broadcast(offsets), on=keys + ["_bkt"])
            .withColumn(
                "cum_tokens",
                (F.col("_offset") + F.sum(F.col(token_col)).over(wb)).cast("bigint"),
            )
            .select(*df.columns, "cum_tokens")
        )
    else:
        w = Window.partitionBy(*keys).orderBy(order_col).rowsBetween(
            Window.unboundedPreceding, 0
        )
        out = df.withColumn("cum_tokens", F.sum(F.col(token_col)).over(w).cast("bigint"))
    out = out.withColumn(
        "pack_id", F.expr(f"(cum_tokens - {token_col}) div {budget}").cast("bigint")
    )
    w2 = Window.partitionBy(*(keys + ["pack_id"])).orderBy(order_col)
    return out.withColumn("slot", F.row_number().over(w2))


def deterministic_shuffle(
    df: DataFrame,
    n_shards: int,
    seed: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Reproducible global shuffle into training shards: every row gets
    (shard, pos) from the seeded portable hash of its id — shard =
    hash mod n_shards, pos = rank of the hash within the shard. The
    ordering is a pure function of (id, seed): re-runs, retries, other
    engines, and any partitioning produce the identical layout, unlike
    ``orderBy(rand())``. Changing the seed is a fresh epoch-level
    reshuffle.

    Scale: one shuffle on the (uniform) shard key; each shard sorts
    corpus/n_shards rows — pick n_shards so a shard fits a task
    (100 TB / 100k shards ≈ 1 GB). No global sort ever happens."""
    from pyspark.sql import Window

    draw = hash60(seeded(F.col(id_col).cast("string"), seed))
    w = Window.partitionBy("shard").orderBy("draw", id_col)
    return (
        df.withColumn("draw", draw)
        .withColumn("shard", F.pmod(F.col("draw"), F.lit(n_shards)).cast("int"))
        .withColumn("pos", F.row_number().over(w))
    )


def mixture_report(
    df: DataFrame,
    strata_cols: list[str],
    token_col: str = "n_tokens",
) -> DataFrame:
    """Corpus mixture accounting: per stratum (e.g. source × lang) the
    document count, token total, mean doc length, and the stratum's share
    of all corpus tokens — the table every pretraining-mixture decision
    starts from (and what Horvitz-Thompson weights from
    :func:`stratified_sample` are audited against).

    One groupBy to the stratum grain, then the share is computed against
    a broadcast 1-row total (sum over the already-tiny aggregate), not a
    window over the corpus — zero full-data shuffles beyond the groupBy.
    """
    agg = df.groupBy(*strata_cols).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col(token_col)).cast("bigint").alias("total_tokens"),
        F.round(F.avg(F.col(token_col)), 6).alias("mean_tokens"),
    )
    total = agg.agg(F.sum("total_tokens").alias("_grand")).withColumn(
        "_k", F.lit(1)
    )
    return (
        agg.withColumn("_k", F.lit(1))
        .join(F.broadcast(total), on="_k")
        .withColumn(
            "token_share", F.round(F.col("total_tokens") / F.col("_grand"), 6)
        )
        .drop("_k", "_grand")
    )


def passage_fingerprints(
    df: DataFrame,
    window: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, passage_idx, passage_fp) — fixed-width token-window
    fingerprints, the substrate for passage-level exact dedup (finer than
    whole-document fingerprints, coarser than shingles; boilerplate
    passages repeated across documents surface here even when the
    surrounding documents differ).

    The chunking runs as one codegen-friendly expression per row (slice
    over the token array via transform(sequence(...))) — no explode until
    the chunks exist, so the shuffle carries (doc, md5) rows only."""
    from .textops import normalize_text_expr

    norm = normalize_text_expr(F.coalesce(F.col(text_col), F.lit("")))
    toks = F.split(norm, " ")
    n_chunks = F.ceil(F.size(toks) / F.lit(window)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i * window + 1, window)),
    )
    return (
        df.select(F.col(id_col).alias("doc_id"), chunks.alias("_chunks"))
        # spread the chunk explode across cores (single-file fixture scans
        # are one partition; see util.spread_by)
        .transform(lambda d: spread_by(d, F.col("doc_id")))
        .select("doc_id", F.posexplode("_chunks").alias("passage_idx", "passage"))
        .select(
            "doc_id",
            "passage_idx",
            F.md5(F.col("passage")).alias("passage_fp"),
        )
    )


def passage_dedup_groups(
    df: DataFrame,
    window: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Duplicated-passage report: fingerprints occurring ≥2 times across
    the corpus, with the document spread, occurrence count, and the
    deterministic survivor (lowest doc_id). One shuffle on the
    fingerprint — the passage-granularity twin of exact_dedup_groups."""
    fps = passage_fingerprints(df, window, id_col, text_col)
    return (
        fps.groupBy("passage_fp")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min("doc_id").alias("keep_doc"),
        )
        .filter(F.col("n_occurrences") >= 2)
    )


def top_ngrams(
    shingled: DataFrame,
    k: int = 20,
) -> DataFrame:
    """Corpus-wide top-k n-grams by document frequency (distinct docs
    containing the gram) — the contamination-audit / boilerplate-survey
    primitive. Input is the (doc_id, shingle) table from
    :func:`..dedup.doc_shingles` (already distinct per doc).

    groupBy(shingle) then a global TakeOrdered — Spark's orderBy+limit
    plans as a per-partition top-k merge on the driver, never a global
    sort shuffle, so this survives any vocabulary size. Ties break on the
    gram string for determinism."""
    from pyspark.sql import Window

    counts = shingled.groupBy("shingle").agg(
        F.countDistinct("doc_id").alias("df_docs")
    )
    topk = counts.orderBy(F.col("df_docs").desc(), F.col("shingle").asc()).limit(k)
    w = Window.orderBy(F.col("df_docs").desc(), F.col("shingle").asc())
    return topk.withColumn("rank", F.row_number().over(w))


def tfidf_topterms(
    docs: DataFrame,
    n_docs: int,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k TF-IDF terms per document.

    tf = term count in doc; df = number of docs containing the term;
    idf = ln((N+1)/(df+1)) (smoothed, always > 0 so rare terms rank
    high); score = round(tf·idf, 6). Ranking uses the ROUNDED score with
    the term string as tiebreak, so the top-k set is deterministic and
    engine-portable (ln differs at most in the last ulp — far below the
    5e-7 rounding quantum).

    Plan: explode→groupBy(doc,term) for tf (one shuffle), groupBy(term)
    for df (second shuffle, carries one row per distinct (doc,term)), a
    broadcast-sized join back on term when the vocabulary is bounded, and
    a per-doc window for the top-k. N is passed in (a count the caller
    already has) rather than recomputed.
    """
    from pyspark.sql import Window

    words = F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+")
    terms = (
        docs.select(F.col(id_col).alias("doc_id"), words.alias("_w"))
        # spread the term explode across cores (single-file fixture scans
        # are one partition; the tf groupBy keys on doc_id anyway)
        .transform(lambda d: spread_by(d, F.col("doc_id")))
        .select("doc_id", F.explode("_w").alias("term"))
        .filter(F.col("term") != "")
    )
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    tf = tf.cache()  # consumed by both the df aggregation and the score join
    dfc = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_count"))
    scored = tf.join(dfc, on="term").withColumn(
        "score",
        F.round(
            F.col("tf") * F.log((F.lit(float(n_docs + 1))) / (F.col("df_count") + 1)),
            6,
        ),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "tf", "df_count", "score", "rank")
    )


def temperature_rates(
    df: DataFrame,
    strata_col: str,
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-based mixture rates per stratum — the multinomial
    re-balancing used by multilingual/multi-source pretraining mixes
    (XLM-R / mT5 style): sampling probability p_temp(d) ∝ n_d^alpha
    flattens the raw distribution toward uniform as alpha → 0.

    Returns one row per stratum with ``n_docs``, ``p_raw`` (= n_d/N),
    ``p_temp`` (= n_d^alpha / Σ n_d^alpha), and ``rate`` — the per-doc
    Bernoulli keep rate (n_min/n_d)^(1-alpha) that realizes the
    temperature mix by pure DOWN-sampling (the smallest stratum keeps
    everything; effective counts are ∝ n_d^alpha). Shares are rounded to
    6 dp for cross-engine reproducibility.

    Scale shape: one groupBy to the stratum grain (tiny output), then the
    normalizers come from broadcast 1-row aggregates over that tiny table
    — the corpus is scanned exactly once, no window over the full data.

    Determinism note: at alpha = 0.5 every float step is IEEE
    correctly-rounded (double divide, ``sqrt``, multiply by 2^60 — an
    exact exponent shift), so derived hash thresholds are bit-identical
    across engines; other alphas go through ``pow``, whose last ulp is
    libm-specific — fine for reporting, not for threshold parity.
    """
    agg = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("n_docs"))
    if alpha == 0.5:
        weight = F.sqrt(F.col("n_docs").cast("double"))
    else:
        weight = F.pow(F.col("n_docs").cast("double"), F.lit(alpha))
    agg = agg.withColumn("_w", weight)
    totals = agg.agg(
        F.sum("n_docs").alias("_total"),
        F.sum("_w").alias("_z"),
        F.min("n_docs").alias("_n_min"),
    ).withColumn("_k", F.lit(1))
    if alpha == 0.5:
        rate = F.sqrt(F.col("_n_min").cast("double") / F.col("n_docs"))
    else:
        rate = F.pow(
            F.col("_n_min").cast("double") / F.col("n_docs"), F.lit(1.0 - alpha)
        )
    return (
        agg.withColumn("_k", F.lit(1))
        .join(F.broadcast(totals), on="_k")
        .withColumn("p_raw", F.round(F.col("n_docs") / F.col("_total"), 6))
        .withColumn("p_temp", F.round(F.col("_w") / F.col("_z"), 6))
        .withColumn("rate", F.round(rate, 6))
        .withColumn(
            "keep_threshold",
            F.floor(rate * F.lit(float(HASH60_SPAN))).cast("bigint"),
        )
        .select(strata_col, "n_docs", "p_raw", "p_temp", "rate", "keep_threshold")
    )


def temperature_sample(
    df: DataFrame,
    strata_col: str,
    alpha: float = 0.5,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Down-sample the corpus to a temperature-alpha mixture: stratum d is
    Bernoulli-kept at rate (n_min/n_d)^(1-alpha), so effective counts are
    ∝ n_d^alpha and the smallest stratum is kept in full. The keep
    decision is the portable hash draw ``hash60(seed:id) <
    floor(rate·2^60)`` — deterministic across engines, re-runs, retries,
    and partitionings (see :func:`stratified_sample`).

    Unlike :func:`stratified_sample`, the rates are DERIVED from the data
    (one tiny stratum-count aggregate, broadcast back onto the corpus) —
    nothing is collected to the driver and the corpus is scanned once for
    counting and once for filtering (the count side is the groupBy's tiny
    output; at 100 TB the two scans beat caching the corpus by far).

    alpha = 0.5 (the common pretraining setting) keeps every float step
    IEEE-exact (sqrt + exponent shift), making thresholds bit-identical
    across engines — the property the CORRECTNESS gate relies on.
    """
    rates = temperature_rates(df, strata_col, alpha=alpha).select(
        strata_col, "n_docs", "keep_threshold"
    )
    draw = hash60(seeded(F.col(id_col).cast("string"), seed))
    return (
        df.join(F.broadcast(rates), on=strata_col)
        .withColumn("sample_key", draw)
        .filter(F.col("sample_key") < F.col("keep_threshold"))
    )


def dataset_split(
    df: DataFrame,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Deterministic train/val/test assignment: the portable 60-bit hash
    draw of (seed, id) is bucketed by cumulative integer thresholds
    computed ONCE in Python from ``fractions`` (insertion order), so the
    split is a pure function of (id, seed) — stable across engines,
    re-runs, appends (a new doc never moves an old doc's split), and
    cluster sizes. Fractions must sum to ≤ 1; any remainder falls into
    the last split.

    Scale: map-only — zero shuffles, no RNG state, embarrassingly
    parallel."""
    names = list(fractions)
    cum = 0.0
    expr = None
    draw = hash60(seeded(F.col(id_col).cast("string"), seed))
    keyed = df.withColumn("split_key", draw)
    for name in names[:-1]:
        cum += fractions[name]
        t = F.lit(sample_threshold(cum))
        cond = F.col("split_key") < t
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return keyed.withColumn("split", expr)


def dsir_logratio(
    df: DataFrame,
    target_pred,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_token_digits: int = 6,
    round_digits: int = 6,
) -> DataFrame:
    """DSIR-style importance weights (Xie et al., "Data Selection for
    Language Models via Importance Resampling", NeurIPS 2023): per-doc
    log importance ratio Σ [ln p_target(t) − ln p_raw(t)] under two
    add-one-smoothed unigram LMs — ``target`` trained on the rows
    matching ``target_pred`` (a boolean Column, e.g. the trusted
    high-quality slice), ``raw`` on the whole corpus. Docs whose token
    distribution looks like the target get high ``avg_log_ratio``;
    resampling by these weights shifts the training mix toward the
    target domain without hand-written rules.

    Both LMs share the raw corpus's vocabulary size V in the smoothing
    denominator, so target-unseen tokens contribute a finite negative
    ratio instead of −∞.

    Cross-engine determinism: each ln is rounded to
    ``round_token_digits`` and cast DECIMAL(28,12) BEFORE the subtraction
    and sum (the :func:`unigram_logprob` contract, applied twice) — both
    engines add/subtract identical exact decimals in any order.

    Scale shape: one token explode; two vocab aggregations (the target
    one over a filtered — typically tiny — slice); one token→freqs join
    (left join on the target counts: absent → 0); one per-doc
    aggregation. The raw-vocab join dominates and is the same
    sort-merge-on-token shape as :func:`unigram_logprob`; no Python
    anywhere.
    """
    from .textops import normalize_text_expr

    toks = df.select(
        F.col(id_col),
        F.when(target_pred, F.lit(1)).otherwise(F.lit(0)).alias("_is_target"),
        F.explode(
            F.split(normalize_text_expr(F.coalesce(F.col(text_col), F.lit(""))), " ")
        ).alias("token"),
    )
    vocab = toks.groupBy("token").agg(
        F.count(F.lit(1)).alias("c_raw"),
        F.sum("_is_target").alias("c_tgt"),
    )
    totals = vocab.agg(
        F.sum("c_raw").alias("n_raw"),
        F.sum("c_tgt").alias("n_tgt"),
        F.count(F.lit(1)).alias("v_size"),
    )
    lp = lambda c, n: F.round(  # noqa: E731
        F.log((c + 1) / (n + F.col("v_size"))), round_token_digits
    ).cast("decimal(28,12)")
    scored = (
        toks.join(vocab, on="token")
        .crossJoin(F.broadcast(totals))
        .select(
            F.col(id_col),
            (lp(F.col("c_tgt"), F.col("n_tgt")) - lp(F.col("c_raw"), F.col("n_raw"))).alias(
                "lr"
            ),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_tokens"), F.sum("lr").alias("_sum_lr"))
        .select(
            id_col,
            "n_tokens",
            F.round(F.col("_sum_lr").cast("double"), round_digits).alias("log_ratio_sum"),
            F.round(
                F.col("_sum_lr").cast("double") / F.col("n_tokens"), round_digits
            ).alias("avg_log_ratio"),
        )
    )


def chunk_long_docs(
    df: DataFrame,
    budget: int,
    overlap: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split over-budget documents into ``budget``-token sliding windows
    with ``overlap`` tokens of context carry-over — the complement of
    :func:`pack_sequences` (which BINS whole short docs; this SPLITS long
    ones so no sequence is ever truncated silently). Chunk i of a doc
    covers tokens [i·step, i·step+budget), step = budget − overlap; a doc
    with n ≤ budget tokens yields exactly one chunk.

    Output: one row per (doc, chunk) with ``chunk_id``, ``start_tok``,
    ``chunk_tokens`` (actual length), ``chunk_text`` (space-joined).

    Scale shape: pure map + explode — zero shuffles; chunk arithmetic is
    integer-exact (`div`, no float), so the layout is reproducible
    across engines. The explode fan-out is bounded by n/step per doc;
    downstream repartition is the consumer's choice.
    """
    if not 0 <= overlap < budget:
        raise ValueError("need 0 <= overlap < budget")
    step = budget - overlap
    from .textops import normalize_text_expr

    toks = F.split(normalize_text_expr(F.coalesce(F.col(text_col), F.lit(""))), " ")
    base = df.select(
        F.col(id_col), toks.alias("_toks"), F.size(toks).alias("_n")
    ).withColumn(
        "n_chunks",
        F.when(F.col("_n") <= budget, F.lit(1)).otherwise(
            (F.lit(1) + F.expr(f"(_n - {budget} + {step} - 1) div {step}")).cast("int")
        ),
    )
    return (
        base.select(
            id_col,
            "_toks",
            "_n",
            F.explode(F.sequence(F.lit(0), F.col("n_chunks") - 1)).alias("chunk_id"),
        )
        .select(
            id_col,
            "chunk_id",
            (F.col("chunk_id") * step).alias("start_tok"),
            F.least(F.lit(budget), F.col("_n") - F.col("chunk_id") * step).alias(
                "chunk_tokens"
            ),
            F.array_join(
                F.slice(F.col("_toks"), F.col("chunk_id") * step + 1, budget), " "
            ).alias("chunk_text"),
        )
    )


def bigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lam: float = 0.75,
    round_token_digits: int = 6,
    round_digits: int = 6,
) -> DataFrame:
    """Interpolated bigram LM score per document — the next rung of the
    CCNet-style perplexity ladder above :func:`unigram_logprob`:
    p(t|prev) = λ·p_bi(t|prev) + (1−λ)·p_uni(t), both add-one smoothed
    over the corpus's own counts (bigram contexts = occurrences of prev
    as a non-final token; shared vocab size V in both denominators).
    Scores tokens 2…n of each doc (no sentence-start padding), so
    ``n_scored = n_tokens − 1`` and single-token docs drop out.

    Cross-engine determinism: the same round-then-decimal-sum contract —
    each token's ln(λ·p_bi + (1−λ)·p_uni) is one chain of correctly-
    rounded float ops from exact integer counts, rounded to 6 dp and cast
    DECIMAL before summation.

    Scale shape: one bigram explode (map-only, built from the token
    array by index — no self-join on position), one groupBy each for
    bigram counts / context counts / unigram counts (all partial-agg
    shuffles on hash-uniform-ish keys; the Zipf head is the same AQE
    skew-split story as unigram_logprob), two token-keyed joins, one
    per-doc agg.
    """
    from .textops import normalize_text_expr

    toks_arr = F.split(
        normalize_text_expr(F.coalesce(F.col(text_col), F.lit(""))), " "
    )
    base = df.select(F.col(id_col), toks_arr.alias("_t")).filter(F.size("_t") >= 2)
    bi = base.select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("_t") - 2),
                lambda i: F.struct(
                    F.element_at(F.col("_t"), i + 1).alias("prev"),
                    F.element_at(F.col("_t"), i + 2).alias("cur"),
                ),
            )
        ).alias("p"),
    ).select(id_col, F.col("p.prev").alias("prev"), F.col("p.cur").alias("cur"))
    toks = df.select(F.col(id_col), F.explode(toks_arr).alias("token"))
    vocab = toks.groupBy("token").agg(F.count(F.lit(1)).alias("c_uni"))
    totals = vocab.agg(
        F.sum("c_uni").alias("n_uni"), F.count(F.lit(1)).alias("v_size")
    )
    bi_counts = bi.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("c_bi"))
    ctx_counts = bi_counts.groupBy("prev").agg(F.sum("c_bi").alias("c_ctx"))
    p_bi = (F.col("c_bi") + 1) / (F.col("c_ctx") + F.col("v_size"))
    p_uni = (F.col("c_uni") + 1) / (F.col("n_uni") + F.col("v_size"))
    scored = (
        bi.join(bi_counts, on=["prev", "cur"])
        .join(ctx_counts, on="prev")
        .join(vocab.select(F.col("token").alias("cur"), "c_uni"), on="cur")
        .crossJoin(F.broadcast(totals))
        .select(
            F.col(id_col),
            F.round(
                F.log(F.lit(lam) * p_bi + F.lit(1.0 - lam) * p_uni),
                round_token_digits,
            )
            .cast("decimal(28,12)")
            .alias("lp"),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_scored"), F.sum("lp").alias("_s"))
        .select(
            id_col,
            "n_scored",
            F.round(
                F.col("_s").cast("string").cast("double"), round_digits
            ).alias("sum_logprob"),
            # no final round on the average — see unigram_logprob
            (
                F.col("_s").cast("string").cast("double") / F.col("n_scored")
            ).alias("avg_logprob"),
        )
    )


def _split_words(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return docs.select(
        F.col(id_col).alias("_id"), F.split(F.col(text_col), " ").alias("_w")
    ).withColumn("n_words", F.size("_w"))


def _covered_positions(d: DataFrame, k: int, min_docs: int) -> DataFrame:
    """Distinct (``_id``, ``_wi``) word positions covered by any k-gram that
    occurs in ≥ ``min_docs`` distinct docs. Shared by the span-coverage
    report and the span-masking text producer."""
    grams = spread_by(d.filter(F.col("n_words") >= k), "_id").select(
        "_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, n_words - {k}), "
                f"i -> concat_ws(' ', slice(_w, i + 1, {k})))"
            )
        ).alias("pos", "gram"),
    )
    dup_grams = (
        grams.groupBy("gram")
        .agg(F.count_distinct("_id").alias("_nd"))
        .filter(F.col("_nd") >= min_docs)
        .select("gram")
    )
    return (
        grams.join(dup_grams, "gram")
        .select("_id", F.explode(F.expr(f"sequence(pos, pos + {k} - 1)")).alias("_wi"))
        .distinct()
    )


def duplicate_span_coverage(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Exact duplicated-SPAN coverage per document (the substring-level
    complement of the doc-level dedup tiers — Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better", which found
    verbatim spans repeated across otherwise-distinct documents dominate
    memorization).

    A span is a k-word window. A span is *duplicated* when it occurs in at
    least ``min_docs`` distinct documents; every word position covered by at
    least one duplicated span counts as covered. Output per doc:
    ``n_words``, ``n_covered`` and ``coverage`` (fraction of word positions
    inside duplicated spans) — the masking/cut stage consumes this directly.

    Shape at scale: one explode to (doc, pos, gram) — k-bounded, linear in
    corpus tokens; one groupBy on the gram string for document frequency;
    one join back on the same gram key (Catalyst reuses the exchange); one
    k-bounded position explode + distinct per doc. Every shuffle key is a
    uniform hash (gram text, doc id) — no skew beyond genuinely viral spans,
    which the `min_docs` HAVING prunes to the duplicated minority before the
    join back. Suffix-array exactness at arbitrary span length is a
    single-node luxury; fixed-k windows are the MapReduce-able form.
    """
    d = _split_words(docs, id_col, text_col)
    covered = _covered_positions(d, k, min_docs).groupBy("_id").agg(
        F.count(F.lit(1)).alias("n_covered")
    )

    return (
        d.select("_id", "n_words")
        .join(covered, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            "n_words",
            F.coalesce(F.col("n_covered"), F.lit(0)).alias("n_covered"),
            (
                F.coalesce(F.col("n_covered"), F.lit(0)).cast("double")
                / F.col("n_words").cast("double")
            ).alias("coverage"),
        )
    )


def merged_span_report(
    docs: DataFrame,
    tiers: tuple = ((25, 3), (50, 2)),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Variable-length duplicate-span coverage: merge overlapping hits
    from multiple (k, min_docs) gram tiers into MAXIMAL spans per doc and
    report span structure, not just the covered-position count that
    :func:`duplicate_span_coverage` gives.

    Tier semantics — the length/frequency tradeoff of practical span
    dedup: a short span only counts when it recurs widely (boilerplate),
    a long span counts at lower document frequency (verbatim quotation).
    The default is 25-grams at df≥3 plus 50-grams at df≥2. A single-k
    union would be pointless (every sub-k-gram of a shared longer gram is
    shared by the same docs, so a uniform-min_docs union is subsumed by
    the smallest k); differing thresholds break the subsumption.

    Merging overlapping/adjacent hits into maximal spans is the
    gaps-and-islands identity: over the distinct covered positions of a
    doc ordered by position, ``wi − row_number()`` is constant exactly on
    a maximal run — pure integer arithmetic, equivalent to an array-based
    interval merge but with no per-doc array materialization. The window
    partitions by doc id, so its state is bounded by document length
    (≤ n_words positions) at any corpus size.

    Output per doc: n_words, n_covered, n_spans (maximal merged spans),
    max_span_len, coverage.
    """
    d = _split_words(docs, id_col, text_col)
    cov = None
    for k, min_docs in tiers:
        tier_cov = _covered_positions(d, k, min_docs)
        cov = tier_cov if cov is None else cov.unionByName(tier_cov)
    cov = cov.distinct()
    w = Window.partitionBy("_id").orderBy(F.col("_wi").asc())
    spans = (
        cov.withColumn("_isl", F.col("_wi") - F.row_number().over(w))
        .groupBy("_id", "_isl")
        .agg(F.count(F.lit(1)).alias("span_len"))
    )
    per = spans.groupBy("_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum("span_len").alias("n_covered"),
        F.max("span_len").alias("max_span_len"),
    )
    return (
        d.select("_id", "n_words")
        .join(per, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.col("n_words").cast("long").alias("n_words"),
            F.coalesce(F.col("n_covered"), F.lit(0))
            .cast("long")
            .alias("n_covered"),
            F.coalesce(F.col("n_spans"), F.lit(0))
            .cast("long")
            .alias("n_spans"),
            F.coalesce(F.col("max_span_len"), F.lit(0))
            .cast("long")
            .alias("max_span_len"),
            F.round(
                F.coalesce(F.col("n_covered"), F.lit(0)).cast("double")
                / F.col("n_words").cast("double"),
                6,
            ).alias("coverage"),
        )
    )


def select_token_budget(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    score_col: str = "score",
    tokens_col: str = "n_tokens",
    score_buckets: int = 1000,
) -> DataFrame:
    """Deterministic best-first selection under a token budget: rank docs by
    (score DESC, id ASC), keep every doc whose INCLUSIVE running token total
    stays within ``budget``. This is the final "fill the training mix to N
    tokens, best documents first" stage of a corpus build.

    The naive form is a single global window (ORDER BY score DESC) — one
    task sorts the corpus. Here the same two-phase trick as
    ``pack_sequences``: scores are binned into ``score_buckets`` coarse
    buckets (floor(score·B), monotone with the global order), per-bucket
    token totals are aggregated (one tiny groupBy, B rows to the driver),
    the driver computes prefix offsets over ≤B+1 totals, and the exact
    cumulative sum runs as a per-bucket window with the broadcast offset
    added — every task sorts only its bucket's slice, ~corpus/B docs.

    Requires ``score_col`` in [0, 1] (callers normalize). Output keeps the
    exact global ``cum_tokens`` so the selection is auditable.
    """
    scored = docs.select(
        F.col(id_col), F.col(score_col), F.col(tokens_col)
    ).withColumn(
        "_bkt",
        F.least(
            F.floor(F.col(score_col) * score_buckets).cast("int"),
            F.lit(score_buckets - 1),
        ),
    )

    totals = {
        int(r["_bkt"]): int(r["_t"])
        for r in scored.groupBy("_bkt").agg(F.sum(tokens_col).alias("_t")).collect()
    }
    offsets, running = {}, 0
    for b in sorted(totals, reverse=True):
        offsets[b] = running
        running += totals[b]

    spark = docs.sparkSession
    off_df = F.broadcast(
        spark.createDataFrame(
            [(b, o) for b, o in offsets.items()], "_bkt int, _offset long"
        )
    )

    w = (
        Window.partitionBy("_bkt")
        .orderBy(F.col(score_col).desc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        scored.join(off_df, "_bkt")
        .withColumn("cum_tokens", (F.col("_offset") + F.sum(tokens_col).over(w)).cast("long"))
        .filter(F.col("cum_tokens") <= budget)
        .select(id_col, score_col, tokens_col, "cum_tokens")
    )


def mask_duplicate_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """The text-producing half of span-level dedup: emit each document with
    every word position covered by a duplicated k-gram REMOVED (Lee et al.
    2022 cut duplicated spans from all-but-one occurrence; the symmetric
    drop-everywhere rule used here is order-independent — no global
    "first occurrence" tiebreak — which is what makes it embarrassingly
    parallel, at the cost of also dropping the canonical copy; pair with
    doc-level dedup which already keeps one canonical document per
    near-dup cluster).

    The per-doc rebuild is a lambda filter over the original word array
    against that doc's (bounded, ≤ n_words) covered-position set — no
    second explode-and-reassemble shuffle for the text itself.
    """
    d = _split_words(docs, id_col, text_col)
    cov_arr = (
        _covered_positions(d, k, min_docs)
        .groupBy("_id")
        .agg(F.collect_set("_wi").alias("_cov"))
    )
    joined = d.join(cov_arr, "_id", "left")
    keep = F.expr("filter(_w, (w, i) -> _cov IS NULL OR NOT array_contains(_cov, CAST(i AS BIGINT)))")
    return joined.select(
        F.col("_id").alias(id_col),
        F.concat_ws(" ", keep).alias("clean_text"),
        F.coalesce(F.size("_cov"), F.lit(0)).cast("long").alias("n_dropped"),
    )


def select_canonicals(
    labels: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    priority_col: str | None = None,
    ascending: bool = True,
) -> DataFrame:
    """Pick ONE canonical document per duplicate cluster.

    ``labels`` is (node, cluster_id) from :func:`connected_components`;
    ``docs`` supplies the optional ``priority_col``. Without a priority
    the canonical is the min doc id (the classic choice, and what the
    gated pipelines use). WITH one, the canonical is the best-priority
    member — the production knob when a dup cluster spans sources of
    different quality (curated > crawl): dedup should keep the curated
    copy, not whichever happened to get the smaller id. Ties (and the
    no-priority case) break on doc id, so the choice is deterministic
    under any partitioning.

    One window over cluster_id (single shuffle). Returns
    (cluster_id, canonical_id, cluster_size).
    """
    from pyspark.sql import Window

    j = labels.select(F.col("node").alias(id_col), "cluster_id")
    if priority_col is not None:
        j = j.join(docs.select(id_col, priority_col), on=id_col)
        order = [
            F.col(priority_col).asc() if ascending else F.col(priority_col).desc(),
            F.col(id_col).asc(),
        ]
    else:
        order = [F.col(id_col).asc()]
    w = Window.partitionBy("cluster_id").orderBy(*order)
    return (
        j.withColumn("_rn", F.row_number().over(w))
        .withColumn(
            "cluster_size",
            F.count(F.lit(1)).over(Window.partitionBy("cluster_id")),
        )
        .filter(F.col("_rn") == 1)
        .select(
            "cluster_id",
            F.col(id_col).alias("canonical_id"),
            "cluster_size",
        )
    )


def dedup_repeated_chunks(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_words: int = 20,
) -> DataFrame:
    """WITHIN-document dedup: drop repeated fixed-width word chunks inside
    each document, keeping the first occurrence — the intra-page
    counterpart of cross-document passage dedup (templated pages repeat
    their own boilerplate: nav blocks, cookie banners, footer text).

    The text splits into ``chunk_words``-word windows as ONE codegen
    expression (transform over sequence + slice — no Python, no explode
    until after chunking); duplicates are detected by exact chunk-text
    equality under a per-doc window, so the only shuffle is on
    (doc, chunk) at doc grain. Returns (doc_id, n_chunks, n_dropped,
    clean_text) with clean_text = surviving chunks rejoined in order.
    """
    from pyspark.sql import Window

    words = F.split(F.trim(F.col(text_col)), r"\s+")
    n_chunks = F.ceil(F.size(words) / F.lit(chunk_words)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(
            F.slice(words, i * chunk_words + 1, chunk_words), " "
        ),
    )
    exploded = docs.select(
        F.col(id_col).alias("doc_id"), F.posexplode(chunks).alias("idx", "chunk")
    )
    w = Window.partitionBy("doc_id", "chunk").orderBy("idx")
    kept = exploded.withColumn("_rn", F.row_number().over(w))
    return (
        kept.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum((F.col("_rn") > 1).cast("long")).alias("n_dropped"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("_rn") == 1,
                                F.struct(F.col("idx"), F.col("chunk")),
                            )
                        )
                    ),
                    lambda s: s["chunk"],
                ),
                " ",
            ).alias("clean_text"),
        )
    )


def weighted_sample(
    df: DataFrame,
    n: int,
    weight_col: str,
    id_col: str = "doc_id",
    seed: int = 0,
    round_digits: int = 6,
    prefilter_buckets: int = 0,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, inclusion probability ∝
    weight — the exponential-race scheme of Efraimidis & Spirakis
    ("Weighted random sampling with a reservoir", IPL 2006): every row
    draws u ∈ (0, 1] and the n largest u^(1/w) win, which this ranks by
    the monotone-equivalent ln(u)/w (descending). A quality- or
    length-weighted corpus draw is this with the score column as the
    weight.

    Deterministic and engine-portable: u derives from
    hash60(seed:id) — no RNG state, reproducible across runs,
    partitionings, and engines — and the race score is rounded to
    ``round_digits`` with the id as tiebreak (libm vs JVM ``ln`` can
    differ in the last ulp; the rounding absorbs it, the same contract
    as the 6-dp cosine gates). Weights must be strictly positive.

    Scale: a global top-n needs a global order; ``prefilter_buckets=B``
    bounds it the usual way — per-(hash-bucket) local top-n first, so no
    task sorts more than ~rows/B, and the final global window sees
    ≤ B·n rows. Output-identical (every bucket forwards its full
    top-n). Returns (id, weight, race_score, rank).
    """
    u = (hash60(seeded(F.col(id_col).cast("string"), seed)) + 1) / F.lit(
        float(HASH60_SPAN)
    )
    scored = df.select(
        F.col(id_col),
        F.col(weight_col).cast("double").alias("weight"),
        F.round(F.log(u) / F.col(weight_col).cast("double"), round_digits).alias(
            "race_score"
        ),
        hash60(seeded(F.col(id_col).cast("string"), seed)).alias("_h"),
    )
    if prefilter_buckets > 0:
        wb = Window.partitionBy(F.pmod(F.col("_h"), F.lit(prefilter_buckets))).orderBy(
            F.col("race_score").desc(), F.col(id_col).asc()
        )
        scored = scored.withColumn("brn", F.row_number().over(wb)).filter(
            F.col("brn") <= n
        )
    w_all = Window.orderBy(F.col("race_score").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w_all))
        .filter(F.col("rank") <= n)
        .select(id_col, "weight", "race_score", "rank")
    )


def ngram_overlap_bloom(
    shingled: DataFrame,
    bench_pred,
    min_overlap: int = 1,
    m: int = 1 << 20,
    d: int = 3,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Bloom-accelerated :func:`ngram_overlap`, OUTPUT-IDENTICAL by the
    filter's no-false-negative guarantee: build a Bloom filter over the
    benchmark shingles, drop every training shingle the filter rules out
    MAP-SIDE, and run the exact collision join over the survivors only.
    A training shingle that misses the filter is definitely not a
    benchmark shingle, so no (train_doc, bench_doc) hit can be lost;
    false positives merely ride into the exact join, which discards
    them. Per-doc shingle totals still come from the UNFILTERED train
    side, so overlap_frac denominators are untouched.

    This is the deployment shape for decontaminating a 100 TB corpus
    against a large eval suite: when the benchmark n-gram set outgrows
    the broadcast budget, its Bloom filter (KBs–MBs at any suite size)
    still broadcasts, and the join's shuffle carries only the
    might-contain survivors — typically a vanishing fraction of the
    corpus's shingles. In exactly that scenario pass
    ``broadcast_bench=False`` so the residual survivors⋈bench exact
    join runs as a shuffle join of two already-pruned sides instead of
    forcing an over-budget broadcast build; output is identical either
    way. NULL shingles cannot occur (doc_shingles lower-bounds every
    doc with one '' shingle), so the NULL-probe routing question of
    find_orphans_bloom does not arise; guarded anyway by keeping
    null-probe rows for the exact join."""
    from .sketch import bloom_bits, bloom_might_contain

    bench = shingled.filter(bench_pred).select(
        F.col("doc_id").alias("bench_doc"), "shingle"
    )
    train = shingled.filter(~bench_pred)
    sizes = train.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_train_shingles")
    )
    bits = bloom_bits(bench.select("shingle"), "shingle", m=m, d=d)
    survivors = (
        bloom_might_contain(bits, train, "shingle", m=m, d=d)
        .filter(
            F.col("might_contain") | F.col("shingle").isNull()
        )
        .drop("might_contain")
    )
    hits = (
        survivors.join(F.broadcast(bench) if broadcast_bench else bench, on="shingle")
        .groupBy(F.col("doc_id").alias("train_doc"), "bench_doc")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
        .filter(F.col("n_overlap") >= min_overlap)
    )
    return (
        hits.join(
            sizes.withColumnRenamed("doc_id", "train_doc"), on="train_doc"
        )
        .select(
            "train_doc",
            "bench_doc",
            "n_overlap",
            "n_train_shingles",
            F.round(
                F.col("n_overlap") / F.col("n_train_shingles"), 6
            ).alias("overlap_frac"),
        )
    )
