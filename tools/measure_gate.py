"""Isolated single-gate measurement through the noop sink (guide §1.4):
wall seconds + scheduled-job count per run, warmup + N measured runs.

Usage: python tools/measure_gate.py <gate> [gate ...] [--sf SF_DIR] [--runs N]

Job count comes from the DAGScheduler's nextJobId counter delta — the
number of jobs *submitted* during the run, the metric guide §1.2 targets
when gate cost is scheduler-latency-bound (small SF, many tiny jobs).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("gates", nargs="+")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    from database_replicator_spark import queries as q
    from database_replicator_spark.session import build_session

    spark = build_session("measure_gate")
    spark.sparkContext.setLogLevel("ERROR")
    # same warmups as bench.py
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    warm = spark.range(64).repartition(32)
    warm.mapInPandas(lambda it: it, warm.schema).write.format("noop").mode(
        "overwrite").save()

    sc = spark.sparkContext
    registry = q.all_queries()

    def njobs() -> int:
        n = sc._jsc.sc().dagScheduler().nextJobId()
        return n if isinstance(n, int) else n.get()

    for name in args.gates:
        fn = registry[name]
        sc.setJobDescription(f"measure:{name}")
        results = []
        for i in range(args.runs + 1):  # +1 warmup
            j0, t0 = njobs(), time.perf_counter()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            dt, j1 = time.perf_counter() - t0, njobs()
            spark.catalog.clearCache()
            results.append((round(dt, 3), j1 - j0))
        warmup, rest = results[0], results[1:]
        best = min(r[0] for r in rest)
        print(
            f"GATE {name}: cold={warmup[0]}s/{warmup[1]}j "
            f"warm={[r[0] for r in rest]} min={best}s "
            f"jobs={[r[1] for r in rest]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
