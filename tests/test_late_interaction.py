"""Late-interaction maxsim retrieval (operators/retrieval.py
late_interaction_topk): the semantic contracts behind the
doc_late_interaction_topk gate.

- an exact token match contributes the maximum per-token score
  (sig_bits: hamming 0 against itself), so a doc containing ALL query
  terms beats one containing a strict subset when the remaining terms
  miss by more than the hash-noise floor can recover;
- signature-colliding query terms still contribute SEPARATELY (grouping
  is per term, not per signature);
- determinism: ranks tie-break by doc_id, two runs identical;
- the prefilter bounds candidates per query.
"""

from pyspark.sql import functions as F

from database_replicator_spark.operators.retrieval import (
    late_interaction_topk,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestMaxsim:
    def test_exact_full_match_outranks_partial(self, spark):
        docs = _docs(
            spark,
            [
                (1, "alpha beta gamma"),     # all three query terms
                (2, "alpha beta zzz qqq"),   # two of three
                (3, "alpha nnn mmm kkk"),    # one of three
            ],
        )
        q = spark.createDataFrame(
            [(0, "alpha"), (0, "beta"), (0, "gamma")],
            "query_id long, term string",
        )
        out = late_interaction_topk(docs, q, k=3).collect()
        ranked = [r["doc_id"] for r in sorted(out, key=lambda r: r["rank"])]
        assert ranked[0] == 1
        scores = {r["doc_id"]: r["score_units"] for r in out}
        # doc 1: three exact matches = 3 * sig_bits
        assert scores[1] == 3 * 16
        assert scores[1] > scores[2] > 0

    def test_match_terms_counts_distinct_matches(self, spark):
        docs = _docs(spark, [(1, "alpha alpha alpha beta")])
        q = spark.createDataFrame(
            [(0, "alpha"), (0, "beta")], "query_id long, term string"
        )
        r = late_interaction_topk(docs, q, k=1).first()
        assert r["match_terms"] == 2  # distinct, not multiplicity

    def test_prefilter_caps_candidates(self, spark):
        docs = _docs(spark, [(i, "alpha filler%d" % i) for i in range(30)])
        q = spark.createDataFrame([(0, "alpha")], "query_id long, term string")
        out = late_interaction_topk(
            docs, q, k=30, prefilter_candidates=5
        ).collect()
        assert len(out) == 5  # candidate cut bounds the result set
        # deterministic tiebreak: lowest doc_ids survive equal match counts
        assert sorted(r["doc_id"] for r in out) == [0, 1, 2, 3, 4]

    def test_two_runs_identical(self, spark):
        docs = _docs(
            spark, [(i, f"t{i % 7} t{(i * 3) % 11} alpha") for i in range(50)]
        )
        q = spark.createDataFrame(
            [(0, "alpha"), (0, "t3"), (1, "t5")], "query_id long, term string"
        )
        a = sorted(tuple(r) for r in late_interaction_topk(docs, q).collect())
        b = sorted(tuple(r) for r in late_interaction_topk(docs, q).collect())
        assert a == b
