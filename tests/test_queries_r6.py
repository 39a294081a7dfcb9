"""Algebraic invariants for the round-6 query surface (queries_r6.py).

Value-exactness vs DuckDB is covered by the oracle gate; these pin the
internal contracts that a hash match alone would not localize when it
breaks (bounds, conservation, monotonicity).
"""

import pytest

from database_replicator_spark import queries_r6 as q6
from database_replicator_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def rows(spark):
    """One evaluation of every r6 gate at the smallest fixture scale."""
    return {
        name: [r.asDict() for r in fn(spark, SF).collect()]
        for name, fn in [
            ("pareto", q6.nation_customer_pareto),
            ("hhi", q6.part_brand_supplier_hhi),
            ("quant", q6.shipping_delay_quantiles),
            ("attr", q6.events_last_touch_attribution),
            ("contain", q6.doc_shingle_containment),
            ("postings", q6.doc_keyword_postings),
            ("xsource", q6.corpus_cross_source_dups),
            ("mat", q6.embedding_matryoshka_topk),
        ]
    }


class TestRound6Invariants:
    def test_pareto_bounds_and_totals(self, spark, rows):
        orders = load_table(spark, SF, "orders")
        total = float(orders.selectExpr("sum(o_totalprice)").first()[0])
        got = rows["pareto"]
        assert len(got) == 25  # every nation has customers in the fixture
        for r in got:
            assert 1 <= r["n_top80"] <= r["n_customers"]
        # revenue conserves: per-nation revenues sum to corpus revenue
        assert abs(sum(r["revenue"] for r in got) - total) < 1.0

    def test_hhi_bounds(self, rows):
        for r in rows["hhi"]:
            lower = 1.0 / r["n_suppliers"]
            assert lower - 1e-12 <= r["hhi"] <= 1.0 + 1e-12
            assert r["revenue"] > 0

    def test_quantiles_ordered_and_realized(self, spark, rows):
        # p50 <= p90, and both are realized delay values of their group
        from pyspark.sql import functions as F
        from pyspark.sql.types import TimestampType

        li = load_table(spark, SF, "lineitem")
        orders = load_table(spark, SF, "orders")
        delays = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .select(
                "o_orderpriority",
                (
                    (
                        F.unix_micros(F.col("l_shipdate").cast(TimestampType()))
                        - F.unix_micros(
                            F.col("o_orderdate").cast(TimestampType())
                        )
                    )
                    / F.lit(86400000000)
                )
                .cast("long")
                .alias("d"),
            )
            .collect()
        )
        by_prio = {}
        for r in delays:
            by_prio.setdefault(r["o_orderpriority"], set()).add(r["d"])
        for r in rows["quant"]:
            assert r["p50_days"] <= r["p90_days"]
            assert r["p50_days"] in by_prio[r["o_orderpriority"]]
            assert r["p90_days"] in by_prio[r["o_orderpriority"]]

    def test_attribution_conserves_purchases(self, spark, rows):
        ev = load_table(spark, SF, "events")
        n_purchases = ev.filter("event_type = 'purchase'").count()
        got = rows["attr"]
        assert sum(r["conversions"] for r in got) == n_purchases
        # purchase events never attribute to the purchase channel itself
        assert all(r["channel"] != "purchase" for r in got)

    def test_containment_dominates_jaccard(self, spark, rows):
        """overlap coefficient >= jaccard for every pair (min <= union)."""
        from database_replicator_spark.operators.dedup import (
            doc_shingles,
            jaccard_pairs,
        )

        docs = load_table(spark, SF, "documents")
        jac = {
            (r["doc1"], r["doc2"]): r["jaccard"]
            for r in jaccard_pairs(doc_shingles(docs), threshold=0.0).collect()
        }
        for r in rows["contain"]:
            assert 0.5 <= r["containment"] <= 1.0 + 1e-12
            assert r["containment"] >= jac[(r["doc1"], r["doc2"])] - 1e-12

    def test_postings_sorted_bounded(self, rows):
        for r in rows["postings"]:
            # comma-joined STRING (array outputs crash a pandas-based
            # canonicalizer — the r6 driver finding); numeric sort order
            # must still hold after parsing
            head = [int(x) for x in r["postings_head"].split(",")]
            assert head == sorted(head)
            assert len(head) <= 20
            assert len(head) <= r["df"]
            assert r["df"] >= 10

    def test_cross_source_pairs_canonical(self, rows):
        seen = set()
        for r in rows["xsource"]:
            assert r["source1"] < r["source2"]
            assert r["n_shared"] >= 1
            key = (r["source1"], r["source2"])
            assert key not in seen
            seen.add(key)

    def test_matryoshka_is_exact_topk_on_prefix(self, spark, rows):
        """The gate must equal brute-force top-k on the truncated,
        re-normalized vectors (it IS exact on the prefix — approximation
        enters only vs the full-dim ranking)."""
        import numpy as np

        emb = load_table(spark, SF, "embeddings").collect()
        vecs = {
            r["vec_id"]: np.asarray(r["embedding"][:16], dtype=np.float64)
            for r in emb
        }
        units = {k: v / np.linalg.norm(v) for k, v in vecs.items()}
        for qid in range(5):
            scored = sorted(
                (
                    (round(float(units[qid] @ u), 6), cid)
                    for cid, u in units.items()
                    if cid != qid
                ),
                key=lambda t: (-t[0], t[1]),
            )[:10]
            got = sorted(
                (
                    (r["cosine"], r["corpus_id"])
                    for r in rows["mat"]
                    if r["query_id"] == qid
                ),
                key=lambda t: (-t[0], t[1]),
            )
            assert [c for _, c in got] == [c for _, c in scored]


class TestRound6Batch2Invariants:
    @pytest.fixture(scope="class")
    def rows2(self, spark):
        return {
            name: [r.asDict() for r in fn(spark, SF).collect()]
            for name, fn in [
                ("rfm", q6.orders_rfm_segments),
                ("affinity", q6.part_type_affinity),
                ("dau", q6.events_dau_stickiness),
                ("gaps", q6.customer_order_gap_stats),
            ]
        }

    def test_rfm_partitions_customers(self, spark, rows2):
        orders = load_table(spark, SF, "orders")
        n_cust = orders.select("o_custkey").distinct().count()
        total = float(orders.selectExpr("sum(o_totalprice)").first()[0])
        got = rows2["rfm"]
        assert sum(r["n_customers"] for r in got) == n_cust
        assert abs(sum(r["revenue"] for r in got) - total) < 1.0
        for r in got:
            assert 1 <= r["r_q"] <= 5 and 1 <= r["f_q"] <= 5 and 1 <= r["m_q"] <= 5

    def test_affinity_counts_bounded(self, rows2):
        for r in rows2["affinity"]:
            assert r["type_a"] < r["type_b"]
            assert 5 <= r["n_both"] <= min(r["n_a"], r["n_b"])
            assert r["lift"] > 0

    def test_dau_bounded_by_wau(self, rows2):
        for r in rows2["dau"]:
            assert 1 <= r["dau"] <= r["wau"]
            assert 0 < r["stickiness"] <= 1.0

    def test_gap_stats_consistent(self, rows2):
        for r in rows2["gaps"]:
            assert r["n_gaps"] > 0
            assert r["p50_gap_days"] >= 0
            # mean within the observed range around the median is not
            # guaranteed, but both stay within [0, max-gap] and the mean
            # of non-negative integers is non-negative
            assert r["avg_gap_days"] >= 0


class TestRound6Batch3Invariants:
    @pytest.fixture(scope="class")
    def rows3(self, spark):
        return {
            name: [r.asDict() for r in fn(spark, SF).collect()]
            for name, fn in [
                ("novelty", q6.doc_ngram_novelty),
                ("ltv", q6.orders_cohort_ltv),
                ("topsup", q6.nation_top_supplier_share),
                ("corr", q6.part_size_price_corr),
            ]
        }

    def test_novelty_partitions_shingles(self, spark, rows3):
        """Every shingle is novel in exactly one document: the novel
        counts sum to the number of DISTINCT shingles in the corpus."""
        from database_replicator_spark.operators.dedup import doc_shingles
        from pyspark.sql import functions as F

        docs = load_table(spark, SF, "documents")
        n_distinct = (
            doc_shingles(docs).select("shingle").distinct().count()
        )
        got = rows3["novelty"]
        assert sum(r["n_novel"] for r in got) == n_distinct
        for r in got:
            assert 0 <= r["n_novel"] <= r["n_shingles"]
            assert 0.0 <= r["novelty"] <= 1.0

    def test_ltv_offsets_and_conservation(self, spark, rows3):
        orders = load_table(spark, SF, "orders")
        total = float(orders.selectExpr("sum(o_totalprice)").first()[0])
        got = rows3["ltv"]
        assert abs(sum(r["revenue"] for r in got) - total) < 1.0
        # offset 0 exists for every cohort (the first order defines it)
        cohorts = {r["cohort_month"] for r in got}
        zero = {r["cohort_month"] for r in got if r["month_offset"] == 0}
        assert cohorts == zero
        assert all(r["month_offset"] >= 0 for r in got)

    def test_top_supplier_share_bounds(self, rows3):
        for r in rows3["topsup"]:
            assert 0 < r["share"] <= 1.0
            assert r["top_revenue"] > 0

    def test_corr_in_range(self, rows3):
        for r in rows3["corr"]:
            assert -1.0 - 1e-9 <= r["size_price_corr"] <= 1.0 + 1e-9
            assert r["n"] > 1
