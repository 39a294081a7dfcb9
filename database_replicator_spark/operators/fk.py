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


def fk_dependents(edges: DataFrame, root: str, max_iterations: int = 50) -> DataFrame:
    """All tables that (transitively) reference ``root`` — the TRUNCATE
    CASCADE blast radius. ``edges`` has columns (child, parent) meaning
    "child has an FK to parent"."""
    spark = edges.sparkSession
    frontier = spark.createDataFrame([(root,)], "table string")
    seen = frontier
    for _ in range(max_iterations):
        new = (
            edges.join(frontier, edges["parent"] == frontier["table"])
            .select(F.col("child").alias("table"))
            .distinct()
            .join(seen, on="table", how="left_anti")
        )
        if new.isEmpty():
            break
        seen = seen.unionByName(new).distinct()
        frontier = new
    return seen.filter(F.col("table") != root)


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
