"""phrase_window_topk (operators/retrieval.py): the integer proximity
contract checked against an independent brute-force python reference,
plus the structural invariants the ranker family pins elsewhere
(broadcast gating identity, per-query k bound, rank contiguity)."""

import pytest

from pyspark.sql import functions as F

from database_replicator_spark.operators.retrieval import (
    doc_positions,
    phrase_window_topk,
)

DOCS = [
    # ordered adjacency, repeated
    (1, "hash join hash join hash join"),
    # unordered within window only (gap 2 both directions)
    (2, "join x hash y join z hash"),
    # terms present but outside the window (gap 8)
    (3, "hash a b c d e f g join"),
    # only one term — must not appear
    (4, "hash hash hash"),
    # adjacency for the second query
    (5, "table scan table x scan"),
    # mixed case / extra whitespace exercise the canonical tokenizer
    (6, "  Hash   JOIN  extra"),
    (7, None),
]

QUERIES = [(10, "hash", "join"), (20, "table", "scan")]
W = 8
K = 10


def brute_force(docs, queries, window=W, k=K):
    out = []
    for qid, ta, tb in queries:
        scored = []
        for did, text in docs:
            toks = (text or "").lower().split()
            pa = [i for i, t in enumerate(toks) if t == ta]
            pb = [i for i, t in enumerate(toks) if t == tb]
            pairs = [
                (x, y)
                for x in pa
                for y in pb
                if 1 <= abs(y - x) < window
            ]
            if not pairs:
                continue
            ordered = sum(1 for x, y in pairs if y == x + 1)
            gap = min(abs(y - x) for x, y in pairs)
            score = 10_000 * ordered + 1_000 * len(pairs) + 100 * (window - gap)
            scored.append((did, ordered, len(pairs), gap, score))
        scored.sort(key=lambda r: (-r[4], r[0]))
        for rank, (did, o, wh, g, s) in enumerate(scored[:k], 1):
            out.append((qid, did, o, wh, g, s, rank))
    return sorted(out)


@pytest.fixture(scope="module")
def result(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    pairs = spark.createDataFrame(
        QUERIES, "query_id long, term_a string, term_b string"
    )
    return sorted(
        tuple(r)
        for r in phrase_window_topk(docs, pairs, k=K, window=W).collect()
    )


def test_matches_python_reference(result):
    assert result == brute_force(DOCS, QUERIES)


def test_expected_evidence_shapes(result):
    rows = {(r[0], r[1]): r for r in result}
    # doc 1: 3 ordered "hash join" + cross pairs within window
    assert rows[(10, 1)][2] == 3 and rows[(10, 1)][4] == 1
    # doc 2: co-occurrence only, min gap 2, zero ordered hits
    assert rows[(10, 2)][2] == 0 and rows[(10, 2)][4] == 2
    # doc 3 (gap 8, outside window), doc 4 (one term), doc 7 (null) absent
    for absent in (3, 4, 7):
        assert (10, absent) not in rows
    # tokenizer canonicalization: doc 6 scores the adjacency
    assert rows[(10, 6)][2] == 1
    # cross-query isolation: nothing from query 10 leaks into query 20
    assert all(q == 10 or d == 5 for q, d in rows)


def test_second_query_counts(result):
    rows = {(r[0], r[1]): r for r in result}
    # doc 5 = "table scan table x scan": ordered pairs (0,1); window pairs:
    # (0,1) g1, (0,4) g4, (2,1) g1, (2,4) g2 -> 4 pairs, min gap 1,
    # ordered = pairs with pb == pa+1: (0,1) only... and (2,1)? pb=1,pa=2 no.
    r = rows[(20, 5)]
    assert r[3] == 4 and r[4] == 1 and r[2] == 1


def test_broadcast_off_identity(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    pairs = spark.createDataFrame(
        QUERIES, "query_id long, term_a string, term_b string"
    )
    on = sorted(map(tuple, phrase_window_topk(docs, pairs).collect()))
    off = sorted(
        map(
            tuple,
            phrase_window_topk(docs, pairs, broadcast_queries=False).collect(),
        )
    )
    assert on == off


def test_positions_compose_with_bag_of_words(spark):
    from database_replicator_spark.operators.retrieval import doc_tokens

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    pos_counts = (
        doc_positions(docs)
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    tok_counts = (
        doc_tokens(docs)
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    assert sorted(map(tuple, pos_counts.collect())) == sorted(
        map(tuple, tok_counts.collect())
    )
