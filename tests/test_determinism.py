"""Distribution-invariance: gate results must not depend on the physical
partition layout. Every determinism rule in queries.py (decimal-carried
sums, hash-threshold sampling, two-phase windows) exists to make this
true; this test actually varies `spark.sql.shuffle.partitions` (a runtime
conf) and asserts bit-identical result sets for the most layout-sensitive
gates — the ones whose naive forms WOULD differ run-to-run:

  * `pricing_summary` — double sums would be partition-order-dependent
    without the decimal carrier;
  * `corpus_token_budget` — bucketed two-phase cumsum must equal itself
    under any bucket task layout;
  * `doc_pack_sequences` — range packing assigns pack ids from prefix
    offsets, not task order;
  * `distinct_kmv_estimate` — bottom-k merge must be associative across
    however many partials the batch layout produces;
  * `dedup_minhash_lsh` — banding/grouping over whatever partitioning.
"""

from __future__ import annotations

import pytest

from database_replicator_spark.queries import all_queries

GATES = [
    "pricing_summary",
    "corpus_token_budget",
    "doc_pack_sequences",
    "distinct_kmv_estimate",
    "dedup_minhash_lsh",
    "ivm_pricing_merge",
    # session-2 gates whose plans carry windows/full-outer joins/HOF folds
    "row_diff_orders",
    "doc_chunk_dedup",
    "customer_value_deciles",
    "doc_classifier_score",
]


@pytest.mark.parametrize("name", GATES)
def test_result_invariant_under_shuffle_partitions(spark, sf_dir, name):
    fn = all_queries()[name]

    def run(n_parts: int):
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(n_parts))
        try:
            rows = fn(spark, sf_dir).collect()
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
            spark.catalog.clearCache()
        return sorted(tuple(r) for r in rows)

    assert run(3) == run(17)
