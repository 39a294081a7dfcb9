"""Interleaved A/B/C for the term_stats dl-derivation question (r13
verdict #5): for stats=None single-ranker gates, is dl-from-tf (current)
slower than the old independent aggregate, and does a tf localCheckpoint
beat both?

  A: current — tf = agg(toks), dl = dl_from_tf(tf), nothing materialized
  B: r12 form — tf = agg(toks), dl = independent agg over toks
  C: checkpointed — tf.localCheckpoint(), dl = dl_from_tf(tf_ckpt)

Each round runs A, B, C through the noop sink (guide §1.4) and asserts
identical collected outputs. Interleaving inside one session is the only
signal this box gives (cross-process flutter ~2x, r13 lesson).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = int(os.environ.get("AB_ROUNDS", "3"))


def main() -> None:
    from pyspark.sql import functions as F

    from database_replicator_spark.operators.retrieval import (
        dl_from_tf,
        doc_tokens,
        ql_dirichlet_topk,
        term_stats,
    )
    from database_replicator_spark.queries_r8 import _BM25_QUERIES
    from database_replicator_spark.session import build_session
    from database_replicator_spark.sources.catalog import load_table

    spark = build_session("ab_term_stats")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    warm = spark.range(64).repartition(32)
    warm.mapInPandas(lambda it: it, warm.schema).write.format("noop").mode(
        "overwrite").save()

    docs = load_table(spark, SF, "documents")
    qterms = spark.createDataFrame(_BM25_QUERIES, "query_id bigint, term string")

    def variant_a():
        return ql_dirichlet_topk(docs, qterms, k=10, mu=100.0,
                                 prefilter_buckets=8)

    def variant_b():
        toks = doc_tokens(docs)
        tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
        dl = toks.groupBy("doc_id").agg(
            F.count(F.lit(1)).cast("long").alias("dl"))
        return ql_dirichlet_topk(docs, qterms, k=10, mu=100.0,
                                 prefilter_buckets=8, stats=(tf, dl))

    def variant_c():
        tf, _ = term_stats(docs)
        tf = tf.localCheckpoint()
        dl = dl_from_tf(tf)
        return ql_dirichlet_topk(docs, qterms, k=10, mu=100.0,
                                 prefilter_buckets=8, stats=(tf, dl))

    variants = {"A_dl_from_tf": variant_a, "B_independent": variant_b,
                "C_tf_ckpt": variant_c}
    times: dict[str, list[float]] = {k: [] for k in variants}
    outs: dict[str, list] = {}
    for rnd in range(ROUNDS):
        for name, fn in variants.items():
            t0 = time.perf_counter()
            df = fn()
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            if rnd == 0:
                outs[name] = sorted(map(tuple, df.collect()))
            spark.catalog.clearCache()
            times[name].append(round(dt, 3))
            print(f"round {rnd} {name}: {dt:.3f}s", flush=True)
    ref = outs["A_dl_from_tf"]
    for name, rows in outs.items():
        assert rows == ref, f"OUTPUT MISMATCH {name}"
    print("outputs identical across variants:", len(ref), "rows")
    for name, ts in times.items():
        print(f"{name}: runs={ts} min={min(ts)}")
    spark.stop()


if __name__ == "__main__":
    main()
