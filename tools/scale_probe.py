"""Empirical scaling probe: measure flagship corpus operators at 1x/4x/16x
the bench corpus and report the scaling exponent over the 4x→16x leg.

The cost models in SCALING.md are arguments; this tool is the measurement.
Corpus multiples are synthesized by copying sf0.1 documents with a
per-copy vocabulary prefix on every word — copies share NO shingles, so
cross-copy candidate pairs are zero by construction and the workload
grows exactly linearly in documents/tokens. An operator whose measured
exponent is ~1.0 scales by data; >1.2 indicates super-linear behavior
(quadratic buckets, driver hot spots) worth investigating BEFORE the
100 TB cluster does.

Usage: python tools/scale_probe.py [--sf-dir /root/testdata/sf0.1]
                                   [--out /tmp/scale_probe]
Prints a markdown table (paste into SCALING.md §Measured scaling).
"""

from __future__ import annotations

import argparse
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: 1x is the fixed-overhead floor (sub-second jobs measure the scheduler,
#: not the operator); the exponent is computed over the 4x→16x leg where
#: per-op compute dominates.
MULTIPLES = [1, 4, 16]


def synthesize(spark, sf_dir: str, out_root: str):
    """x{k} corpora: k disjoint-vocabulary copies of the base documents."""
    from pyspark.sql import functions as F

    from database_replicator_spark.sources.catalog import load_table

    base = load_table(spark, sf_dir, "documents")
    n = base.count()
    paths = {}
    for k in MULTIPLES:
        path = os.path.join(out_root, f"x{k}")
        copies = []
        for c in range(k):
            prefixed = base.select(
                (F.col("doc_id") + F.lit(c * n)).alias("doc_id"),
                F.concat_ws(
                    " ",
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda w: F.concat(F.lit(f"c{c}_"), w),
                    ),
                ).alias("text"),
                "lang",
                F.concat(F.lit(f"c{c}_"), F.col("source")).alias("source"),
                "n_chars",
            )
            copies.append(prefixed)
        df = copies[0]
        for c in copies[1:]:
            df = df.unionByName(c)
        df.write.mode("overwrite").parquet(path)
        paths[k] = path
    return paths


def probe_ops(spark, path: str) -> dict[str, float]:
    from pyspark.sql import functions as F

    docs = spark.read.parquet(path)

    def mat(df):
        # noop sink: full materialization, no count()-only branch pruning
        df.write.format("noop").mode("overwrite").save()

    def timed(fn):
        t0 = time.perf_counter()
        fn()
        spark.catalog.clearCache()
        return time.perf_counter() - t0

    out = {}

    def exact_dedup():
        from database_replicator_spark.operators.dedup import exact_dedup_groups

        mat(exact_dedup_groups(docs))

    def minhash_lsh():
        from database_replicator_spark.operators.dedup import (
            doc_shingles,
            lsh_candidate_pairs,
            minhash_signatures,
        )

        mat(lsh_candidate_pairs(minhash_signatures(doc_shingles(docs), num_hashes=12)))

    def span_coverage():
        from database_replicator_spark.operators.corpus import (
            duplicate_span_coverage,
        )

        mat(duplicate_span_coverage(docs))

    def token_budget():
        from database_replicator_spark.operators.corpus import select_token_budget

        words = F.split(F.col("text"), " ")
        t = docs.select(
            "doc_id",
            (
                F.size(F.array_distinct(words)).cast("double")
                / F.size(words).cast("double")
            ).alias("score"),
            F.size(words).cast("long").alias("n_tokens"),
        )
        total = t.agg(F.sum("n_tokens")).collect()[0][0]
        mat(select_token_budget(t, budget=int(total) // 5))

    def quality():
        from database_replicator_spark.operators.textops import quality_filter

        mat(quality_filter(docs))

    def classifier():
        from database_replicator_spark.operators.textops import hashed_linear_score

        mat(hashed_linear_score(docs))

    for name, fn in [
        ("exact_dedup", exact_dedup),
        ("minhash_lsh_pairs", minhash_lsh),
        ("duplicate_span_coverage", span_coverage),
        ("select_token_budget", token_budget),
        ("quality_filter", quality),
        ("hashed_linear_score", classifier),
    ]:
        fn()  # warm (codegen + python workers)
        out[name] = round(min(timed(fn), timed(fn)), 3)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/scale_probe")
    args = ap.parse_args()

    from database_replicator_spark.session import build_session

    spark = build_session("scale_probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    paths = synthesize(spark, args.sf_dir, args.out)
    results = {k: probe_ops(spark, p) for k, p in paths.items()}

    ops = list(results[MULTIPLES[0]])
    print("| operator | " + " | ".join(f"{k}x" for k in MULTIPLES) + " | exponent |")
    print("|---|" + "---|" * (len(MULTIPLES) + 1))
    for op in ops:
        times = [results[k][op] for k in MULTIPLES]
        lo, hi = times[-2], times[-1]
        ratio = MULTIPLES[-1] / MULTIPLES[-2]
        exp = math.log(hi / lo) / math.log(ratio) if lo > 0 else float("nan")
        cells = " | ".join(f"{t:.2f}s" for t in times)
        print(f"| {op} | {cells} | {exp:.2f} |")

    shutil.rmtree(args.out, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
