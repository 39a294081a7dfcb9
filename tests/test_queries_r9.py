"""Round-9 invariants: the retrieval query-side broadcast knob
(`broadcast_queries`) must be output-neutral and actually remove the
query-scaled broadcast hints from the plan — the deployment path for
corpus-derived query tables (benchmark-suite decontamination) where the
(query_id, term) side outgrows the driver broadcast budget."""

import pytest
from pyspark.sql import functions as F

from database_replicator_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def _n_hints(df):
    plan = df._jdf.queryExecution().analyzed().toString()
    return plan.count("ResolvedHint (strategy=broadcast)")


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF, "documents")


@pytest.fixture(scope="module")
def corpus_qterms(docs):
    """Corpus-derived query table — the doc_bm25_contamination shape,
    exactly the composition where the broadcast is over-budget at a real
    benchmark-suite scale."""
    from database_replicator_spark.operators.retrieval import doc_tokens

    return (
        doc_tokens(docs.filter(F.col("doc_id") % 200 == 0))
        .select(F.col("doc_id").alias("query_id"), "term")
        .distinct()
        .localCheckpoint()
    )


class TestRetrievalBroadcastKnob:
    def test_bm25_no_broadcast_identical_and_unhinted(self, docs, corpus_qterms):
        from database_replicator_spark.operators.retrieval import bm25_topk

        on = bm25_topk(docs, corpus_qterms, k=5, prefilter_buckets=8)
        off = bm25_topk(
            docs, corpus_qterms, k=5, prefilter_buckets=8,
            broadcast_queries=False,
        )
        rows = lambda df: {tuple(r) for r in df.collect()}  # noqa: E731
        got_on, got_off = rows(on), rows(off)
        assert got_off == got_on
        assert got_on  # non-degenerate
        # AQE may still pick a broadcast at runtime on this tiny input;
        # what matters is that no USER hint forces the query-scaled
        # builds (qterms ×2, dfreq). The 1-row corpus-stats broadcast is
        # legitimate at any scale and stays in both plans.
        assert _n_hints(off) == _n_hints(on) - 3
        assert _n_hints(off) == 1  # exactly the corpus-stats crossJoin

    def test_ql_no_broadcast_identical_and_unhinted(self, docs, corpus_qterms):
        from database_replicator_spark.operators.retrieval import (
            ql_dirichlet_topk,
        )

        on = ql_dirichlet_topk(docs, corpus_qterms, k=5)
        off = ql_dirichlet_topk(docs, corpus_qterms, k=5, broadcast_queries=False)
        rows = lambda df: {tuple(r) for r in df.collect()}  # noqa: E731
        got_on, got_off = rows(on), rows(off)
        assert got_off == got_on
        assert got_on
        # query-scaled hints removed: coll-build qterms (embedded twice —
        # coll's subtree appears under both qconst and match), qterms
        # (match cut), coll ×2, qconst → 6; the two 1-row corpus-stats
        # crossJoin broadcasts remain.
        assert _n_hints(off) == _n_hints(on) - 6
        assert _n_hints(off) == 2


class TestPagerankR9:
    def _graph(self, spark):
        # a small directed graph with a hub (node 1) and a tail chain
        edges = [(2, 1), (3, 1), (4, 1), (1, 2), (2, 3), (4, 5), (5, 4)]
        return spark.createDataFrame(edges, "src long, dst long")

    def test_seeds_dataframe_matches_literal_list(self, spark):
        """The seeds-DataFrame form (left-join flag) must be
        value-identical to the literal-isin form — both the general and
        the symmetric path."""
        from database_replicator_spark.operators.graph import pagerank_units

        e = self._graph(spark)
        sym = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct()
        seeds_df = spark.createDataFrame([(1,), (4,)], "node long")
        for graph, symmetric in [(e, False), (sym, True)]:
            lit = sorted(
                map(
                    tuple,
                    pagerank_units(
                        graph, iters=4, seeds=[1, 4], symmetric=symmetric
                    ).collect(),
                )
            )
            dfo = sorted(
                map(
                    tuple,
                    pagerank_units(
                        graph, iters=4, seeds=seeds_df, symmetric=symmetric
                    ).collect(),
                )
            )
            assert dfo == lit
            assert lit  # non-degenerate

    def test_overflow_guard_raises_with_safe_unit(self, spark):
        from database_replicator_spark.operators.graph import pagerank_units

        e = self._graph(spark)
        with pytest.raises(ValueError, match="unit<="):
            pagerank_units(e, iters=1, unit=10**18)
        # and the suggested bound actually passes the guard
        try:
            pagerank_units(e, iters=1, unit=2**63 // (85 * 5 * 4)).collect()
        except ValueError:  # pragma: no cover
            pytest.fail("suggested safe unit rejected by the guard")

    def test_high_iters_lineage_cut(self, spark):
        """iters=20 with the default checkpoint_every=5 must (a) finish
        without superlinear analysis blowup and (b) equal a plain-Python
        replay of the integer recurrence on a path graph."""
        import time

        from database_replicator_spark.operators.graph import (
            PR_UNIT,
            pagerank_units,
        )

        edges = [(i, i + 1) for i in range(1, 6)]  # 1→2→…→6
        df = spark.createDataFrame(edges, "src long, dst long")
        t0 = time.monotonic()
        got = {
            r["node"]: r["pr_units"]
            for r in pagerank_units(df, iters=20).collect()
        }
        elapsed = time.monotonic() - t0
        # replay: out_deg = 1 for nodes 1..5; node 6 dangling
        rank = {n: PR_UNIT for n in range(1, 7)}
        tele = (15 * PR_UNIT) // 100
        for _ in range(20):
            incoming = {n: 0 for n in range(1, 7)}
            for s, d in edges:
                incoming[d] += rank[s] // 1
            rank = {n: tele + (85 * incoming[n]) // 100 for n in range(1, 7)}
        assert got == rank
        assert elapsed < 120  # superlinear analysis would blow far past


class TestSq8EncodeIdentifiers:
    def test_collision_and_funny_names(self, spark):
        """ADVICE r8: an input column literally named `_sq8n`, or a
        vector column needing quoting (dots/spaces), must not corrupt or
        fail the generated-SQL encode — codes must equal the plain-named
        baseline."""
        import numpy as np

        from database_replicator_spark.operators.similarity import (
            sq8_encode,
            sq8_train,
        )

        rows = [
            (i, [float(i), float(10 - i), 0.5 * i + 1.0]) for i in range(1, 9)
        ]
        base = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        mn, mx = sq8_train(base, "vec_id", "embedding", dim=3)
        want = {
            r["vec_id"]: list(r["code"])
            for r in sq8_encode(base, mn, mx).collect()
        }
        assert want  # non-degenerate
        # (a) pre-existing `_sq8n` column must be ignored, not used
        clash = base.withColumn("_sq8n", F.lit(123.0))
        got = {
            r["vec_id"]: list(r["code"])
            for r in sq8_encode(clash, mn, mx).collect()
        }
        assert got == want
        # (b) vec/id columns that need backtick quoting
        funny = base.select(
            F.col("vec_id").alias("the id"),
            F.col("embedding").alias("emb.vec"),
        )
        got2 = {
            r["the id"]: list(r["code"])
            for r in sq8_encode(
                funny, mn, mx, id_col="the id", vec_col="emb.vec"
            ).collect()
        }
        assert got2 == want
        assert isinstance(mn, np.ndarray) or len(mn) == 3


class TestSq8CodebookMemo:
    def test_memoized_gates_identical_to_fresh_train(self, spark):
        """The per-sf_dir codebook memo must be output-neutral: a warm
        call (memo hit) returns byte-identical rows to a cold call AND
        to the operator's own train-inline path."""
        from database_replicator_spark import queries_r7 as q7
        from database_replicator_spark.operators.similarity import sq8_topk
        from database_replicator_spark.sources.catalog import load_table

        q7._SQ8_CODEBOOK_MEMO.clear()
        cold = sorted(
            map(tuple, q7.similarity_sq8_topk(spark, SF).collect())
        )
        assert SF in q7._SQ8_CODEBOOK_MEMO
        warm = sorted(
            map(tuple, q7.similarity_sq8_topk(spark, SF).collect())
        )
        assert warm == cold
        emb = load_table(spark, SF, "embeddings")
        inline = sorted(
            map(
                tuple,
                sq8_topk(emb, emb.filter(F.col("vec_id") < 5), k=10).collect(),
            )
        )
        assert inline == cold
        # and the ivfsq gate shares the same memo entry (same corpus)
        ivf_cold_memo = dict(q7._SQ8_CODEBOOK_MEMO)
        ivf = sorted(
            map(tuple, q7.similarity_ivfsq_topk(spark, SF).collect())
        )
        assert ivf  # non-degenerate
        assert list(q7._SQ8_CODEBOOK_MEMO) == list(ivf_cold_memo)
