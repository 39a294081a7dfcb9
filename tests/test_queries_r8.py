"""Round-8 gate invariants + independent Python references (the oracle
gate proves cross-engine equality; these prove the SEMANTICS are the
intended ones — BM25 per Robertson k1/b with Lucene idf, RRF per
Cormack et al. 2009)."""

import math
import re
from collections import Counter, defaultdict

import pytest
from pyspark.sql import functions as F

from database_replicator_spark import queries_r8 as q8
from database_replicator_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"

K1, B = 1.2, 0.75
SCALE = 1_000_000


def _tokenize(text):
    return re.sub(r"\s+", " ", (text or "").lower()).strip().split(" ")


@pytest.fixture(scope="module")
def corpus_py(spark):
    rows = load_table(spark, SF, "documents").select("doc_id", "text").collect()
    return {r["doc_id"]: _tokenize(r["text"]) for r in rows}


def _bm25_reference(corpus, query_terms, exclude_self=False):
    """Plain-Python BM25 with the operator's exact fixed-point contract."""
    tf = {d: Counter(toks) for d, toks in corpus.items()}
    dl = {d: len(toks) for d, toks in corpus.items()}
    n = len(corpus)
    avgdl = sum(dl.values()) / n
    df = Counter()
    for d in corpus:
        for t in set(corpus[d]):
            df[t] += 1
    scores = defaultdict(int)  # (qid, doc) -> integer units
    for qid, t in query_terms:
        if t not in df:
            continue
        idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
        for d, c in tf.items():
            if c[t] == 0 or (exclude_self and d == qid):
                continue
            tfn = (c[t] * (K1 + 1.0)) / (
                c[t] + K1 * ((1.0 - B) + B * (dl[d] / avgdl))
            )
            scores[(qid, d)] += int(math.floor(idf * tfn * SCALE + 0.5))
    return scores


def _topk_reference(scores, k=10):
    per_q = defaultdict(list)
    for (qid, d), u in scores.items():
        per_q[qid].append((-u, d))
    out = {}
    for qid, lst in per_q.items():
        for rank, (negu, d) in enumerate(sorted(lst)[:k], start=1):
            out[(qid, d)] = (rank, -negu)
    return out


class TestBM25:
    def test_matches_python_reference(self, spark, corpus_py):
        want = _topk_reference(
            _bm25_reference(corpus_py, q8._BM25_QUERIES), k=10
        )
        got = {
            (r["query_id"], r["doc_id"]): (r["rank"], r["score"])
            for r in q8.doc_bm25_topk(spark, SF).collect()
        }
        assert set(got) == set(want)
        for key, (rank, units) in want.items():
            grank, gscore = got[key]
            assert grank == rank
            assert abs(gscore - units / SCALE) < 1e-9

    def test_rare_term_query_ranks_dup_docs_first(self, spark, corpus_py):
        """Query 0 contains 'dup' (the only rare term, df≈5%): with the
        Lucene idf its contribution dominates, so every top-ranked doc
        for query 0 must actually contain 'dup'."""
        got = [
            r
            for r in q8.doc_bm25_topk(spark, SF).collect()
            if r["query_id"] == 0
        ]
        assert got
        top = min(got, key=lambda r: r["rank"])
        assert "dup" in corpus_py[top["doc_id"]]

    def test_prefilter_is_output_identical(self, spark):
        from database_replicator_spark.operators.retrieval import bm25_topk

        docs = load_table(spark, SF, "documents")
        qterms = spark.createDataFrame(
            q8._BM25_QUERIES, "query_id bigint, term string"
        )
        plain = sorted(
            map(tuple, bm25_topk(docs, qterms, k=10).collect())
        )
        cut = sorted(
            map(tuple, bm25_topk(docs, qterms, k=10, prefilter_buckets=8).collect())
        )
        assert plain == cut and plain

    def test_unknown_query_term_contributes_nothing(self, spark):
        from database_replicator_spark.operators.retrieval import bm25_topk

        docs = load_table(spark, SF, "documents")
        qterms = spark.createDataFrame(
            [(0, "dup"), (7, "zz-not-in-vocab")],
            "query_id bigint, term string",
        )
        got = bm25_topk(docs, qterms, k=5).collect()
        assert {r["query_id"] for r in got} == {0}


class TestQLDirichlet:
    def test_matches_python_reference(self, spark, corpus_py):
        """Replay the fixed-point three-part decomposition in plain
        Python (Zhai-Lafferty Dirichlet QL) and compare ranks+scores."""
        mu = 100.0
        tf = {d: Counter(toks) for d, toks in corpus_py.items()}
        dl = {d: len(toks) for d, toks in corpus_py.items()}
        total = sum(dl.values())
        qterms = sorted(set(q8._BM25_QUERIES))
        ctf = Counter()
        for d, c in tf.items():
            for _, t in qterms:
                ctf[t] += c[t]
        units = defaultdict(int)
        per_q = defaultdict(list)
        for qid, t in qterms:
            if ctf[t] > 0:
                per_q[qid].append(t)
        for qid, terms in per_q.items():
            a_units = sum(
                int(math.floor(math.log(mu * (ctf[t] / total)) * SCALE + 0.5))
                for t in terms
            )
            nq = len(terms)
            for d in corpus_py:
                m_units = 0
                hit = False
                for t in terms:
                    if tf[d][t] > 0:
                        hit = True
                        pc = ctf[t] / total
                        m_units += int(
                            math.floor(
                                math.log((tf[d][t] + mu * pc) / (mu * pc))
                                * SCALE
                                + 0.5
                            )
                        )
                if hit:
                    dlu = int(
                        math.floor(math.log(dl[d] + mu) * SCALE + 0.5)
                    )
                    units[(qid, d)] = m_units + a_units - nq * dlu
        want = _topk_reference(units, k=10)
        got = {
            (r["query_id"], r["doc_id"]): (r["rank"], r["score"])
            for r in q8.doc_ql_dirichlet_topk(spark, SF).collect()
        }
        assert set(got) == set(want)
        for key, (rank, u) in want.items():
            grank, gscore = got[key]
            assert grank == rank
            assert abs(gscore - u / SCALE) < 1e-9


class TestBM25Contamination:
    def test_train_only_candidates_and_bench_queries(self, spark):
        rows = q8.doc_bm25_contamination(spark, SF).collect()
        assert rows
        for r in rows:
            assert r["bench_doc"] % 50 == 0       # queries are bench docs
            assert r["train_doc"] % 50 != 0       # candidates train-only
            assert 1 <= r["rank"] <= 5


class TestPageRank:
    def test_matches_python_reference_exactly(self, spark):
        """Integer fixed-point PageRank must replay EXACTLY in plain
        Python — same div-based mass splitting, same teleport."""
        from database_replicator_spark.operators.graph import (
            PR_UNIT,
            pagerank_units,
        )

        edges = [
            (1, 2), (2, 1), (2, 3), (3, 1), (4, 1),  # 4 is upstream-only
            (1, 3), (5, 2),                           # 5 dangling source
        ]
        df = spark.createDataFrame(edges, "src bigint, dst bigint")
        got = {
            r["node"]: r["pr_units"]
            for r in pagerank_units(df, iters=3).collect()
        }
        out = {}
        nodes = {n for e in edges for n in e}
        deg = {}
        for s, _ in edges:
            deg[s] = deg.get(s, 0) + 1
        r = {n: PR_UNIT for n in nodes}
        tele = (15 * PR_UNIT) // 100
        for _ in range(3):
            inc = {n: 0 for n in nodes}
            for s, d in edges:
                inc[d] += r[s] // deg[s]
            r = {n: tele + (85 * inc[n]) // 100 for n in nodes}
        assert got == r
        # node 1 has the most in-links → highest rank; dangling-source 5
        # ends at pure teleport
        assert max(got, key=got.get) == 1
        assert got[5] == tele

    def test_personalized_teleport_concentrates_near_seeds(self, spark):
        """Seeded PPR on a path graph 1—2—3—4—5 (mirrored): mass stays
        near the seed end (at 3 iterations the pulse sits on the seed's
        NEIGHBOR, not the seed — odd-step dynamics of a path — so the
        contract asserted is the exact integer replay plus far-end
        starvation, not naive monotonicity)."""
        from database_replicator_spark.operators.graph import (
            PR_UNIT,
            pagerank_units,
        )

        half = [(1, 2), (2, 3), (3, 4), (4, 5)]
        edges = half + [(b, a) for a, b in half]
        df = spark.createDataFrame(edges, "src bigint, dst bigint")
        got = {
            r["node"]: r["pr_units"]
            for r in pagerank_units(df, iters=3, seeds=[1]).collect()
        }
        # the far end of the path has received (nearly) nothing; the
        # seed half holds the mass
        assert got[5] == min(got.values())
        assert got[1] + got[2] > got[4] + got[5]
        # exact python replay of the seeded integer iteration
        nodes = {1, 2, 3, 4, 5}
        deg = {}
        for s, _ in edges:
            deg[s] = deg.get(s, 0) + 1
        tele = (15 * PR_UNIT) // 100
        r = {n: (PR_UNIT if n == 1 else 0) for n in nodes}
        for _ in range(3):
            inc = {n: 0 for n in nodes}
            for s, d in edges:
                inc[d] += r[s] // deg[s]
            r = {
                n: (tele if n == 1 else 0) + (85 * inc[n]) // 100
                for n in nodes
            }
        assert got == r

    def test_symmetric_fast_path_identical_on_mirrored_graph(self, spark):
        """symmetric=True (skip union-distinct node set + per-iteration
        re-attach join) must be value-identical to the general path on a
        graph that really is mirrored."""
        from database_replicator_spark.operators.graph import pagerank_units

        half = [(1, 2), (2, 3), (3, 1), (1, 4)]
        edges = half + [(b, a) for a, b in half]
        df = spark.createDataFrame(edges, "src bigint, dst bigint")
        gen = sorted(map(tuple, pagerank_units(df, iters=3).collect()))
        sym = sorted(
            map(tuple, pagerank_units(df, iters=3, symmetric=True).collect())
        )
        assert gen == sym and gen

    def test_gate_head_is_ranked_and_bounded(self, spark):
        rows = q8.part_copurchase_pagerank(spark, SF).collect()
        assert 1 <= len(rows) <= 100
        ranks = sorted(r["rank"] for r in rows)
        assert ranks == list(range(1, len(rows) + 1))
        by_rank = sorted(rows, key=lambda r: r["rank"])
        for prev, cur in zip(by_rank, by_rank[1:]):
            assert (prev["pr_units"], -prev["part_key"]) >= (
                cur["pr_units"], -cur["part_key"]
            )


class TestSQ8Artifacts:
    def test_pretrained_codebook_and_query_matrix_paths_identical(self, spark):
        """The train-once deployment params (codebook=, centroids=,
        query_matrix=) must be pure amortizations: byte-identical output
        to the train-inline path."""
        import numpy as np

        from database_replicator_spark.operators.similarity import (
            collect_unit_matrix,
            ivf_sq8_topk,
            sq8_topk,
            sq8_train,
        )

        emb = load_table(spark, SF, "embeddings")
        queries = emb.filter(F.col("vec_id") < 5)
        mn, mx = sq8_train(emb)
        inline = sorted(map(tuple, sq8_topk(emb, queries, k=10).collect()))
        pretrained = sorted(
            map(tuple, sq8_topk(emb, queries, k=10, codebook=(mn, mx)).collect())
        )
        assert inline == pretrained and inline

        ids, mat = collect_unit_matrix(
            emb.filter(F.col("vec_id") < 16), "vec_id", "embedding"
        )
        order = np.argsort(ids)
        ids, mat = ids[order], mat[order]
        a = sorted(
            map(tuple, ivf_sq8_topk(emb, queries, k=10).collect())
        )
        b = sorted(
            map(
                tuple,
                ivf_sq8_topk(
                    emb, queries, k=10, centroids=mat,
                    codebook=(mn, mx),
                    query_matrix=(ids[ids < 5], mat[ids < 5]),
                ).collect(),
            )
        )
        assert a == b and a


class TestRRF:
    def test_fusion_arithmetic_and_absentees(self, spark):
        from database_replicator_spark.operators.retrieval import rrf_fuse

        lex = spark.createDataFrame(
            [(0, 10, 1), (0, 11, 2), (0, 12, 3)],
            "query_id bigint, doc_id bigint, rank int",
        )
        dense = spark.createDataFrame(
            [(0, 11, 1), (0, 13, 2)],
            "query_id bigint, doc_id bigint, rank int",
        )
        got = {r["doc_id"]: r for r in rrf_fuse(lex, dense, k=10).collect()}
        assert set(got) == {10, 11, 12, 13}
        # doc 11 in both: 1/62 + 1/61
        assert abs(got[11]["rrf_score"] - round(1 / 62 + 1 / 61, 9)) < 1e-12
        assert got[11]["rank"] == 1
        assert got[11]["lex_rank"] == 2 and got[11]["dense_rank"] == 1
        # absentees report rank 0 on the missing side, never NULL
        assert got[10]["dense_rank"] == 0
        assert abs(got[10]["rrf_score"] - round(1 / 61, 9)) < 1e-12
        assert got[13]["lex_rank"] == 0
        # tie between doc 10 (lex rank 1) and doc 13 (dense rank 2)?
        # 1/61 vs 1/62 — no tie; order: 11, 10, 13, 12
        ranks = [got[d]["rank"] for d in (11, 10, 13, 12)]
        assert ranks == [1, 2, 3, 4]

    def test_equal_scores_break_by_doc_id(self, spark):
        from database_replicator_spark.operators.retrieval import rrf_fuse

        lex = spark.createDataFrame(
            [(0, 5, 1), (0, 3, 2)], "query_id bigint, doc_id bigint, rank int"
        )
        dense = spark.createDataFrame(
            [(0, 9, 1), (0, 7, 2)], "query_id bigint, doc_id bigint, rank int"
        )
        got = {r["doc_id"]: r["rank"] for r in rrf_fuse(lex, dense).collect()}
        # 5 and 9 tie at 1/61 → lower doc_id first; 3 and 7 tie at 1/62
        assert got == {5: 1, 9: 2, 3: 3, 7: 4}

    def test_hybrid_gate_excludes_self(self, spark):
        for r in q8.hybrid_rrf_topk(spark, SF).collect():
            assert r["doc_id"] != r["query_id"]

    def test_fuse_n_integer_units_and_absentees(self, spark):
        from database_replicator_spark.operators.retrieval import rrf_fuse_n

        a = spark.createDataFrame(
            [(0, 10, 1), (0, 11, 2)], "query_id bigint, doc_id bigint, rank int"
        )
        b = spark.createDataFrame(
            [(0, 11, 1), (0, 12, 2)], "query_id bigint, doc_id bigint, rank int"
        )
        c = spark.createDataFrame(
            [(0, 12, 1), (0, 10, 2)], "query_id bigint, doc_id bigint, rank int"
        )
        got = {
            r["doc_id"]: r
            for r in rrf_fuse_n(
                [("a", a), ("b", b), ("c", c)], k=10
            ).collect()
        }
        U = 10**12
        # doc 10: a@1 + c@2 -> U//61 + U//62; doc 11: U//61 + U//62;
        # doc 12: U//62 + U//61 — three-way tie, broken by doc_id
        want_units = U // 61 + U // 62
        for d in (10, 11, 12):
            assert abs(
                got[d]["rrf_score"] - round(want_units / U, 9)
            ) < 1e-12
        assert [got[d]["rank"] for d in (10, 11, 12)] == [1, 2, 3]
        # absent-ranker columns report 0
        assert got[10]["b_rank"] == 0
        assert got[11]["c_rank"] == 0
        assert got[12]["a_rank"] == 0

    def test_hybrid3_gate_excludes_self(self, spark):
        rows = q8.hybrid_rrf3_topk(spark, SF).collect()
        assert rows
        for r in rows:
            assert r["doc_id"] != r["query_id"]


class TestCopurchaseEdgeBuild:
    def test_in_array_pairs_match_self_join(self, spark):
        """The r14 in-array edge build (per-order collect_set +
        sorted-array a<b transform, one orderkey shuffle) must emit
        exactly the weighted pair set the r8-r13 distinct + self-join
        form produced."""
        from pyspark.sql import functions as F

        from database_replicator_spark.queries_r8 import _copurchase_halfw
        from database_replicator_spark.sources.catalog import load_table

        got = sorted(map(tuple, _copurchase_halfw(spark, SF).collect()))

        li = load_table(spark, SF, "lineitem")
        ps = li.select("l_orderkey", "l_partkey").distinct()
        a, b = ps.alias("a"), ps.alias("b")
        ref = sorted(
            map(
                tuple,
                a.join(
                    b,
                    (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                    & (F.col("a.l_partkey") < F.col("b.l_partkey")),
                )
                .groupBy(
                    F.col("a.l_partkey").alias("src"),
                    F.col("b.l_partkey").alias("dst"),
                )
                .agg(F.count(F.lit(1)).alias("w"))
                .collect(),
            )
        )
        assert got == ref
        assert got  # non-degenerate
        # a<b half-edge invariant
        assert all(s < d for s, d, _w in got)
