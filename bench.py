"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced through the noop sink so timing covers full
materialization (scan → compute → row production) without driver-collect
overhead distorting the numbers.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def runs_for(elapsed: float, budget: float) -> int:
    """Per-query measurement protocol under the wall budget: 3 (warmup +
    min-of-2) while under 65% consumed, 2 (warmup + 1) to 90%, then 1
    (single cold run) — complete-but-noisier beats an absent JSON line."""
    if elapsed > budget * 0.9:
        return 1
    if elapsed > budget * 0.65:
        return 2
    return 3


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.0

    from database_replicator_spark import queries as q
    from database_replicator_spark.session import build_session

    spark = build_session("bench")

    # Warm the JVM/codegen paths so per-query numbers measure the engine,
    # not first-job startup.
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def run_once(fn) -> float:
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        # operators cache self-joined intermediates; drop them so queries
        # are timed independently and storage memory doesn't accumulate
        spark.catalog.clearCache()
        return dt

    # Wall budget: the gate count grows every round, and an external
    # timeout that kills bench mid-loop yields NO json line at all —
    # strictly worse than noisier timings. Degrade the per-query protocol
    # (3 runs → 2 → 1) as the budget is consumed so the full query dict
    # is always emitted. At 118 gates / sf0.1 the 3-run protocol fits the
    # default budget on an idle host; degradation only kicks in under
    # neighbor load.
    budget = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET", "420"))
    bench_t0 = time.perf_counter()

    timings: dict[str, float] = {}
    total = 0.0
    n_degraded = 0
    for name, fn in q.all_queries().items():
        runs = runs_for(time.perf_counter() - bench_t0, budget)
        if runs < 3:
            n_degraded += 1
        if runs == 1:
            dt = run_once(fn)
        else:
            run_once(fn)        # warm-up: codegen/JIT + python workers
            # steady-state = min of the measured runs: this box shares a
            # host and neighbor load spikes individual runs 3-5x; the min
            # is the reproducible engine time, not the noise
            dt = run_once(fn)
            if runs == 3:
                dt = min(dt, run_once(fn))
        timings[name] = round(dt, 3)
        total += dt

    print(
        json.dumps(
            {
                "metric": "total_query_wall_time",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "degraded_queries": n_degraded,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
