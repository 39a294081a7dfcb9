"""Iterative graph algorithms over edge-list DataFrames.

The MapReduce connected-components operator lives in operators/corpus
(large-star/small-star); this module adds the value-propagation family —
PageRank (Brin & Page 1998) in an integer fixed-point form, so a fixed
iteration count is EXACTLY reproducible across engines (the DuckDB
oracle unrolls the same iterations as CTEs).

Arithmetic contract: ranks are BIGINT units (``unit`` = 10¹² per node at
init). One iteration is

    r'(v) = T + (num · Σ_{u→v} (r(u) div out_deg(u))) div den

with teleport ``T = ((den − num) · unit) div den`` — every operation is
integer floor division or integer add/multiply, so no floating point
crosses an aggregation boundary, ever. The div-based mass splitting
loses ≤ out_deg(u) units per node per iteration (quantization), orders
of magnitude below rank decisions at 10¹² scale; dangling-node mass is
dropped (the common simplification; noted so the oracle matches).

Scale shape: one iteration = one join of the edge list against the
(node, rank) relation plus one aggregate on dst — the Pregel-style
plan. The rank relation is node-sized, the edge join shuffles on the
edge key, no driver-side state beyond the loop counter. A fixed small
iteration count (3–10) is the production norm for ranking signals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_UNIT = 10**12


def pagerank_units(
    edges: DataFrame,
    iters: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
    unit: int = PR_UNIT,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_edges: bool = True,
    symmetric: bool = False,
    seeds=None,
    checkpoint_every: int = 5,
    check_overflow: bool = True,
    weight_col: str | None = None,
) -> DataFrame:
    """Integer fixed-point PageRank over a directed edge list.

    Returns (node, pr_units) for every node appearing as src or dst.
    Uniform init at ``unit`` per node (the unnormalized form — ranking
    and ratios are what downstream consumes; divide by node count for
    the probability form).

    ``symmetric=True`` declares that every edge has its mirror (the
    co-occurrence/undirected case): then the node set IS the degree
    table's key set (no union-distinct over the edge list) and every
    node receives incoming mass each iteration, so the per-iteration
    left join that re-attaches zero-in-degree nodes is dropped — one
    shuffle less per iteration, value-identical on such graphs.

    ``seeds`` switches to PERSONALIZED PageRank (Haveliwala 2002): init
    mass and the teleport term go to the seed set only, so rank measures
    proximity to the seeds — the 'more items like these' serving form.
    Two forms, value-identical (pinned by tests/test_queries_r9.py):

    - an iterable of node ids — a literal ``isin``; right for
      CLI/driver-sized seed sets (stays in the plan, no extra join);
    - a DataFrame (first column = node id) — a distinct+left-join flag;
      right when the seed set IS a query result (e.g. "rank parts near
      everything customer X bought") and may be arbitrarily large. Costs
      one node-sized flag join per iteration on symmetric graphs (the
      general path folds the flag into the existing re-attach join).

    Overflow contract: total mass is ≤ mass_nodes·unit at every
    iteration, where mass_nodes is the INIT support — all nodes for
    global PR, only the seed set for personalized PR — so the per-node
    multiply ``damping_num · Σ_in`` (and, weighted, the per-edge
    ``r(u)·w``) is bounded by ``max(damping_num, w_max) · mass_nodes ·
    unit``. On hub-concentrated graphs all of that can genuinely land on
    ONE node, and int64 wraps silently in Spark (non-ANSI) while DuckDB
    raises: an undiagnosed cross-engine divergence.
    ``check_overflow=True`` (default) counts the mass support (one cheap
    job on an already-checkpointed input; plus a max(w) job when
    weighted) and raises with the safe ``unit`` to use instead; at
    unit = 10¹² the global bound is ~1.08·10⁵ nodes, lowering unit to
    10⁹ buys ~10⁸ nodes with quantization still far below rank
    decisions, and personalized runs scale with |seeds|, not the graph.
    The bound is the worst-case TOPOLOGY (near-sink graphs) — callers
    who know their graph spreads mass may pass ``check_overflow=False``,
    accepting the silent-wrap risk the guard exists to name.

    ``checkpoint_every`` cuts the rank relation's lineage every N
    iterations (localCheckpoint): each iteration stacks a join+aggregate
    layer, and past ~10 layers Catalyst analysis time dominates — the cut
    makes high-``iters`` calls (power-iteration-to-convergence uses
    30–100) linear-time instead of superlinear. 0 disables.

    ``weight_col`` names an integer edge-weight column: mass splits
    proportionally, ``(r(u) · w_e) div W_u`` with ``W_u = Σ w`` over u's
    out-edges — still pure integer arithmetic (the per-edge multiply
    adds a factor ≤ w_max to the int64 headroom: weighted callers on
    heavy-weight graphs should lower ``unit`` by ~w_max; the co-purchase
    weights here are shared-order counts, single digits). The
    ``check_overflow`` scan also enforces w ≥ 1 when weighted: w ≤ 0
    rows (or a Σw = 0 node) divide by zero in the integer split —
    silent NULL mass loss on non-ANSI sessions, a bare mid-job
    DIVIDE_BY_ZERO on ANSI ones, both diverging from what the SQL
    oracle reports; the guard raises with a prescriptive message
    instead of letting the engines silently diverge."""
    # One eager lineage cut on the edge list: it is scanned ~(iters + 3)
    # times (node set ×2, degrees, one join per iteration) and usually
    # arrives as a non-trivial pipeline (self-join + distinct in the
    # co-purchase gate). localCheckpoint, not cache — the house rule for
    # iterative graph loops (see connected_components: self-referential
    # lineage defeats cache plan-matching and blows up analysis time).
    # Callers that ALREADY checkpointed their edge pipeline (e.g. a
    # symmetric mirror of a checkpointed half) pass
    # ``checkpoint_edges=False`` to skip the redundant materialization.
    cols = [F.col(src_col).alias("_s"), F.col(dst_col).alias("_d")]
    if weight_col is not None:
        cols.append(F.col(weight_col).cast("bigint").alias("_w"))
    e = edges.select(*cols)
    if checkpoint_edges:
        e = e.localCheckpoint()
    # deg is referenced once per iteration — cut it once (node-sized).
    # nodes: for a symmetric graph the degree keys ARE the node set; the
    # general case needs the union-distinct over both endpoints.
    deg = e.groupBy("_s").agg(
        (
            F.sum("_w") if weight_col is not None else F.count(F.lit(1))
        ).alias("_deg")
    ).localCheckpoint()
    if symmetric:
        nodes = deg.select(F.col("_s").alias("node"))
    else:
        nodes = (
            e.select(F.col("_s").alias("node"))
            .unionByName(e.select(F.col("_d").alias("node")))
            .distinct()
            .localCheckpoint()
        )
    if check_overflow:
        # total mass is bounded by mass_nodes·unit, where mass_nodes is
        # the INIT support: all nodes for global PR, only the seed set
        # for personalized PR (Σr' = |S|·T + 0.85·Σ_in ≤ fixpoint
        # |S|·unit) — so a large graph with a small seed set is fine at
        # the default unit, and the guard must not regress it. The
        # worst-case topology (all mass converging on one node) is what
        # the bound protects against; the message prescribes the safe
        # unit rather than leaving Spark to wrap silently (non-ANSI)
        # where the DuckDB oracle raises.
        if seeds is not None and isinstance(seeds, DataFrame):
            mass_nodes = (
                seeds.select(seeds.columns[0]).distinct().count()
            )
        elif seeds is not None:
            mass_nodes = len({int(s) for s in seeds})
        else:
            mass_nodes = nodes.count()
        # the weighted path multiplies pr_units·w per edge BEFORE the
        # div, adding a w_max factor the aggregate bound doesn't see.
        # The same (already-checkpointed) scan also validates w ≥ 1: a
        # node whose Σw = 0 (or any w ≤ 0 row) hits integer div by
        # zero, which a non-ANSI Spark session turns into NULL (mass
        # silently vanishes from the sum) and an ANSI session turns
        # into a bare mid-job DIVIDE_BY_ZERO — either way diverging
        # from / obscuring what the DuckDB oracle reports: exactly the
        # undiagnosed cross-engine divergence class this guard exists
        # to name, so it is named here too.
        w_max = 1
        if weight_col is not None:
            row = e.agg(
                F.max("_w").alias("_mx"), F.min("_w").alias("_mn")
            ).collect()[0]
            w_max = int(row["_mx"] or 1)
            if row["_mn"] is not None and int(row["_mn"]) < 1:
                raise ValueError(
                    f"pagerank_units: weight_col={weight_col!r} has "
                    f"min weight {int(row['_mn'])} < 1 — non-positive "
                    f"weights divide by zero in the integer split: "
                    f"silent NULL mass loss (non-ANSI) or a bare "
                    f"mid-job DIVIDE_BY_ZERO (ANSI), either way "
                    f"diverging from the SQL oracle. Filter w >= 1 "
                    f"rows or shift weights before ranking, or "
                    f"check_overflow=False to skip both guards if the "
                    f"weight domain is known positive."
                )
        bound = max(damping_num, w_max) * mass_nodes * unit
        if bound >= 2**63:
            safe_unit = 2**63 // (max(damping_num, w_max) * mass_nodes * 4)
            raise ValueError(
                f"pagerank_units: max(damping_num, w_max)*mass_nodes*unit"
                f" = {max(damping_num, w_max)}*{mass_nodes}*{unit} exceeds"
                f" int64 — Spark would wrap silently while the oracle "
                f"raises. Pass unit<={safe_unit} (quantization at that "
                f"scale is still orders of magnitude below rank "
                f"decisions), or check_overflow=False if the worst-case "
                f"mass concentration is known impossible for this graph."
            )
    teleport = ((damping_den - damping_num) * unit) // damping_den
    seed_df = None
    if seeds is not None and isinstance(seeds, DataFrame):
        node_type = dict(nodes.dtypes)["node"]
        seed_df = (
            seeds.select(
                F.col(seeds.columns[0]).cast(node_type).alias("node")
            )
            .distinct()
            .withColumn("_isseed", F.lit(1))
            .localCheckpoint()
        )
        is_seed = F.col("_isseed").isNotNull()
        tele_expr = F.when(is_seed, F.lit(teleport)).otherwise(F.lit(0))
        init_expr = F.when(is_seed, F.lit(unit)).otherwise(F.lit(0))
        # fold the flag into the node relation once — the general path's
        # per-iteration re-attach join then carries it for free
        nodes = nodes.join(seed_df, on="node", how="left")
        if not symmetric:
            nodes = nodes.localCheckpoint()
    elif seeds is not None:
        seed_list = [int(s) for s in seeds]
        is_seed = F.col("node").isin(seed_list)
        tele_expr = F.when(is_seed, F.lit(teleport)).otherwise(F.lit(0))
        init_expr = F.when(is_seed, F.lit(unit)).otherwise(F.lit(0))
    else:
        tele_expr = F.lit(teleport)
        init_expr = F.lit(unit)
    new_rank = (
        tele_expr.cast("bigint")
        + F.expr(f"({damping_num} * coalesce(_in, 0)) div {damping_den}")
    ).alias("pr_units")
    r = nodes.withColumn("pr_units", init_expr.cast("bigint")).select(
        "node", "pr_units"
    )
    for i in range(iters):
        contrib_expr = (
            "(pr_units * _w) div _deg"
            if weight_col is not None
            else "pr_units div _deg"
        )
        contrib = (
            e.join(r.withColumnRenamed("node", "_s"), on="_s")
            .join(deg, on="_s")
            .select(
                F.col("_d").alias("node"),
                F.expr(contrib_expr).alias("_c"),
            )
        )
        incoming = contrib.groupBy("node").agg(F.sum("_c").alias("_in"))
        if symmetric:
            # every node has incoming mass (mirrored edges) — no
            # re-attach join needed; the DataFrame-seed form still needs
            # the node-sized flag join to evaluate the teleport term
            if seed_df is not None:
                incoming = incoming.join(seed_df, on="node", how="left")
            r = incoming.select("node", new_rank)
        else:
            r = nodes.join(incoming, on="node", how="left").select(
                "node", new_rank
            )
        if checkpoint_every and (i + 1) % checkpoint_every == 0 and (
            i + 1
        ) < iters:
            r = r.localCheckpoint()
    return r


def hits_units(
    edges: DataFrame,
    iters: int = 2,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_edges: bool = True,
    checkpoint_every: int = 5,
    check_overflow: bool = True,
):
    """Integer HITS (Kleinberg 1999, "Authoritative sources in a
    hyperlinked environment") over a directed edge list — hubs on the
    src side, authorities on the dst side. Returns ``(hubs, auths)``:
    (node, hub_units) / (node, auth_units) BIGINT DataFrames.

    The UNNORMALIZED power iteration: ``a ← Aᵀh; h ← A·a`` from
    all-ones init. Per-iteration L2 normalization only rescales — the
    RANKING after any fixed iteration count is identical — so dropping
    it keeps every update a pure integer aggregate (sum over in-/out-
    neighbors), exactly replayable as SQL joins. The price is
    geometric growth: values gain a factor ≤ (max_deg²) per iteration,
    so int64 bounds iters to ~3–4 on high-degree graphs — the
    convergence regime for RANKING on real graphs anyway (the gate uses
    2); past that, normalize offline from the returned units.

    One iteration = two edge⋈value joins + two keyed aggregates — the
    same Pregel shape as :func:`pagerank_units`, state bounded by the
    node sets, no driver loops. ``checkpoint_every`` cuts both value
    relations' lineage like the PageRank loop.

    ``check_overflow=True`` (default) enforces the growth bound instead
    of hoping: after k iterations values reach up to
    (din_max·dout_max)^k, and Spark wraps int64 silently (non-ANSI) —
    the guard measures the two max degrees (two cheap aggregates on the
    checkpointed edge list) and raises with the max safe ``iters``."""
    if iters < 1:
        raise ValueError(f"hits_units: iters must be >= 1, got {iters}")
    e = edges.select(
        F.col(src_col).alias("_s"), F.col(dst_col).alias("_d")
    )
    if checkpoint_edges:
        e = e.localCheckpoint()
    if check_overflow:
        row = e.groupBy("_s").count().agg(
            F.max("count").alias("dout")
        ).crossJoin(
            e.groupBy("_d").count().agg(F.max("count").alias("din"))
        ).collect()[0]
        dout_max, din_max = int(row["dout"] or 1), int(row["din"] or 1)
        growth = max(2, din_max * dout_max)
        # h_k ≤ (din·dout)^k from the all-ones init
        safe_iters = 0
        v = 1
        while v * growth < 2**63:
            v *= growth
            safe_iters += 1
        if iters > safe_iters:
            raise ValueError(
                f"hits_units: {iters} iterations can overflow int64 "
                f"(per-iteration growth ≤ din_max*dout_max = "
                f"{din_max}*{dout_max}); max safe iters here is "
                f"{safe_iters}. Rankings converge in 2-4 iterations — "
                f"lower iters, or check_overflow=False if the degree "
                f"distribution is known to keep values far below the "
                f"worst case."
            )
    hubs = e.select(F.col("_s").alias("node")).distinct().withColumn(
        "hub_units", F.lit(1).cast("bigint")
    ).localCheckpoint()
    auths = None
    for i in range(iters):
        auths = (
            e.join(hubs.withColumnRenamed("node", "_s"), on="_s")
            .groupBy(F.col("_d").alias("node"))
            .agg(F.sum("hub_units").alias("auth_units"))
        )
        if i + 1 == iters:
            # Every caller consumes BOTH returned frames, and the final
            # hubs derives from the final auths — without a cut here the
            # consumer's hub branch re-runs the whole iteration chain
            # that its auth branch just computed (2·iters−1 extra
            # join+agg half-steps). Materializing the final auths makes
            # the two branches share it (guide §2.4 shared subtree /
            # §5); the relation is (node, BIGINT) — node-set-sized.
            auths = auths.localCheckpoint()
        hubs = (
            e.join(
                auths.withColumnRenamed("node", "_d").select(
                    "_d", "auth_units"
                ),
                on="_d",
            )
            .groupBy(F.col("_s").alias("node"))
            .agg(F.sum("auth_units").alias("hub_units"))
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0 and (
            i + 1
        ) < iters:
            hubs = hubs.localCheckpoint()
            auths = auths.localCheckpoint()
    return hubs, auths
