"""Pinned floors for the late-interaction prefilter audit (RETRIEVAL.md
§maxsim, r11 verdict ask #5): the default `prefilter_candidates` cut
must keep retrieving what EXACT maxsim retrieves. If this floor breaks,
either the corpus shifted or someone lowered the default — re-run
`python tools/retrieval_quality.py` and read the sensitivity curve
before touching the number."""

import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def audit(spark):
    from retrieval_quality import maxsim_prefilter_audit

    return maxsim_prefilter_audit(spark, SF, cand_grid=(5, 20))


class TestMaxsimPrefilterFloor:
    def test_default_candidates_recall_floor(self, audit):
        curve, n_q = audit
        assert n_q >= 10
        # measured 1.0 at sf0.01 and sf0.001 (RETRIEVAL.md); pin 0.9 so
        # noise can't flake the suite but a real knee move fails loudly
        assert curve[20] >= 0.9

    def test_tighter_cut_degrades_monotonically(self, audit):
        curve, _ = audit
        assert curve[5] <= curve[20]


class TestExactModeContract:
    def test_exact_scores_every_doc(self, spark):
        """prefilter_candidates=None must admit docs sharing ZERO query
        terms (pure signature-collision similarity) — the property that
        makes it the audit baseline rather than just a bigger cut."""
        from pyspark.sql import functions as F

        from database_replicator_spark.operators.retrieval import (
            late_interaction_topk,
        )

        docs = spark.createDataFrame(
            [(1, "alpha beta gamma"), (2, "delta epsilon zeta")],
            "doc_id long, text string",
        )
        q = spark.createDataFrame([(0, "alpha")], "query_id long, term string")
        exact = late_interaction_topk(
            docs, q, k=10, prefilter_candidates=None
        )
        rows = {r["doc_id"]: r["match_terms"] for r in exact.collect()}
        assert set(rows) == {1, 2}  # doc 2 shares no term, still scored
        assert rows[2] == 0
        cut = late_interaction_topk(docs, q, k=10, prefilter_candidates=20)
        assert {r["doc_id"] for r in cut.collect()} == {1}
