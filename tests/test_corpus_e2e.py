"""The composed corpus build (queries_r12.corpus_build_e2e): stage
containment, live stages, packing invariants, determinism. Values are
oracle-gated in CORRECTNESS; these tests pin the PIPELINE properties the
value-hash can't express."""

import pytest

from database_replicator_spark.queries_r12 import (
    _E2E_BUDGET,
    _E2E_CAP,
    _e2e_stages,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def stages(spark):
    return _e2e_stages(spark, SF)


def _ids(df):
    return {r["doc_id"] for r in df.select("doc_id").collect()}


class TestStageContainment:
    def test_each_stage_consumes_previous_survivors(self, stages):
        docs = _ids(stages["docs"])
        accepted = _ids(stages["accepted"])
        neardup = _ids(stages["neardup"])
        capped = _ids(stages["capped"])
        mixed = _ids(stages["mixed"])
        packed = _ids(stages["packed"])
        assert accepted <= docs
        assert neardup <= accepted
        assert capped <= neardup
        assert mixed <= capped
        assert packed == mixed  # split/pack drop nothing

    def test_every_stage_is_live(self, stages):
        """Each stage must DROP something at this fixture scale —
        otherwise the composition gate silently degrades to testing a
        subset of the chain (the reason the cap/seed constants were
        tuned; see the module constants' comment)."""
        n = {k: stages[k].count() for k in
             ("docs", "accepted", "neardup", "capped", "mixed")}
        assert n["docs"] > n["accepted"] > n["neardup"] > n["capped"] > n["mixed"]


class TestPackingInvariants:
    def test_cap_respected_per_source(self, stages):
        per_src = stages["capped"].groupBy("source").count().collect()
        assert all(r["count"] <= _E2E_CAP for r in per_src)

    def test_packs_respect_budget_rule(self, stages):
        """The cumulative rule: a pack exceeds the budget only via its
        LAST doc (docs are never split); equivalently cum_tokens -
        pack_id*budget - n_tokens < budget for every row."""
        bad = stages["packed"].filter(
            f"cum_tokens - n_tokens - pack_id * {_E2E_BUDGET} >= {_E2E_BUDGET}"
        )
        assert bad.count() == 0

    def test_slots_are_dense_ranks(self, stages):
        from pyspark.sql import functions as F

        g = (
            stages["packed"]
            .groupBy("split", "pack_id")
            .agg(F.min("slot").alias("lo"), F.max("slot").alias("hi"),
                 F.count(F.lit(1)).alias("n"))
        )
        assert g.filter("lo != 1 OR hi != n").count() == 0


class TestDeterminism:
    def test_rerun_is_identical(self, spark, stages):
        a = sorted(map(tuple, stages["packed"].collect()))
        b = sorted(map(tuple, _e2e_stages(spark, SF)["packed"].collect()))
        assert a == b
