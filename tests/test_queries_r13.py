"""Round-13 gate properties beyond the driver's oracle compare: the
leakage guarantee of the cluster-keyed split, maxP/fusion structural
invariants of the hybrid RAG gate, and the TOAST gate's keep-old
semantics on a crafted stream."""

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def r13(spark):
    from database_replicator_spark import queries_r13 as m

    return m


class TestLeakageSafeSplit:
    # the gate itself is the r7 original (r13 briefly duplicated it);
    # the straddle invariant is worth pinning regardless of which round
    # owns the registration
    def test_cluster_members_share_split(self, spark, r13):
        from database_replicator_spark.queries_r7 import (
            corpus_leakage_safe_split,
        )

        rows = corpus_leakage_safe_split(spark, SF).collect()
        by_cluster = {}
        for r in rows:
            by_cluster.setdefault(r["cluster_id"], set()).add(r["split"])
        assert by_cluster, "no rows"
        assert all(len(s) == 1 for s in by_cluster.values())


class TestHybridFusion:
    def test_parents_unique_and_ranked_densely(self, spark, r13):
        rows = r13.rag_hybrid_fusion_topk(spark, SF).collect()
        assert rows
        per_q = {}
        for r in rows:
            per_q.setdefault(r["query_id"], []).append(r)
        for q, rs in per_q.items():
            docs = [r["doc_id"] for r in rs]
            assert len(docs) == len(set(docs)), f"dup parent for query {q}"
            ranks = sorted(r["doc_rank"] for r in rs)
            assert ranks == list(range(1, len(rs) + 1))
            # rrf_score non-increasing with doc_rank
            by_rank = sorted(rs, key=lambda r: r["doc_rank"])
            scores = [r["rrf_score"] for r in by_rank]
            assert scores == sorted(scores, reverse=True)

    def test_fusion_uses_both_rankers(self, spark, r13):
        rows = r13.rag_hybrid_fusion_topk(spark, SF).collect()
        # at least one surviving chunk was retrieved by each ranker
        assert any(r["lex_rank"] > 0 for r in rows)
        assert any(r["dense_rank"] > 0 for r in rows)


class TestToastMergeGate:
    def test_big_column_survives_updates(self, spark, r13):
        rows = r13.cdc_toast_merge_latest(spark, SF).collect()
        assert rows
        # every big value that IS present matches the insert that minted
        # it: 'blob-<uid>-<eid>'
        for r in rows:
            if r["big"] is not None:
                uid, eid = r["big"].split("-")[1:]
                assert int(uid) == r["user_id"]
                assert int(eid) <= r["change_id"]
