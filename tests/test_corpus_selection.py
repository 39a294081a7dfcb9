"""Duplicated-span coverage and token-budget selection operator tests."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from database_replicator_spark.operators.corpus import (
    duplicate_span_coverage,
    select_token_budget,
)


def test_duplicate_span_coverage_marks_shared_span_only(spark):
    shared = "w1 w2 w3 w4 w5 w6 w7 w8"  # exactly one 8-gram
    docs = spark.createDataFrame(
        [
            (1, f"{shared} alpha beta"),
            (2, f"gamma {shared} delta"),
            (3, "u1 u2 u3 u4 u5 u6 u7 u8 u9"),  # unique spans
            (4, "short doc"),  # under k words
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in duplicate_span_coverage(docs, k=8).collect()}
    assert out[1]["n_covered"] == 8 and out[1]["n_words"] == 10
    assert out[2]["n_covered"] == 8 and out[2]["n_words"] == 10
    assert out[3]["n_covered"] == 0
    assert out[4]["n_covered"] == 0 and out[4]["coverage"] == 0.0
    assert abs(out[1]["coverage"] - 0.8) < 1e-12


def test_duplicate_span_coverage_within_doc_repeat_not_duplicated(spark):
    # the same span twice in ONE doc is not cross-document duplication
    span = "a b c d e f g h"
    docs = spark.createDataFrame([(1, f"{span} x {span}")], ["doc_id", "text"])
    out = duplicate_span_coverage(docs, k=8, min_docs=2).collect()[0]
    assert out["n_covered"] == 0


def test_select_token_budget_matches_global_window(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
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
    budget = int(total) // 4

    got = select_token_budget(t, budget=budget)

    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = (
        t.withColumn("cum_tokens", F.sum("n_tokens").over(w).cast("long"))
        .filter(F.col("cum_tokens") <= budget)
        .select("doc_id", "score", "n_tokens", "cum_tokens")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # the budget is actually binding (some docs selected, some not)
    assert 0 < got.count() < t.count()


def test_select_token_budget_no_global_sort_in_plan(spark, sf_dir):
    """The two-phase form must not contain a single-partition global sort:
    every Sort/Window runs after a hash repartition on the bucket key."""
    # filter, not limit: GlobalLimit itself plans a SinglePartition exchange
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter("doc_id < 50")
    t = docs.select(
        "doc_id",
        ((F.col("doc_id") % 100).cast("double") / 100.0).alias("score"),
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
    )
    out = select_token_budget(t, budget=1000)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # a global window shows up as 'Window ... ORDER BY' over a SinglePartition
    # exchange; the bucketed form partitions by _bkt first
    assert "SinglePartition" not in plan


def test_mask_duplicate_spans_drops_only_covered(spark):
    from database_replicator_spark.operators.corpus import mask_duplicate_spans

    shared = "w1 w2 w3 w4 w5 w6 w7 w8"
    docs = spark.createDataFrame(
        [
            (1, f"{shared} alpha beta"),
            (2, f"gamma {shared} delta"),
            (3, "u1 u2 u3 u4 u5 u6 u7 u8 u9"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in mask_duplicate_spans(docs, k=8).collect()}
    assert out[1]["clean_text"] == "alpha beta" and out[1]["n_dropped"] == 8
    assert out[2]["clean_text"] == "gamma delta" and out[2]["n_dropped"] == 8
    assert out[3]["clean_text"] == "u1 u2 u3 u4 u5 u6 u7 u8 u9"
    assert out[3]["n_dropped"] == 0


def test_mask_fully_covered_doc_yields_empty_text(spark):
    from database_replicator_spark.operators.corpus import mask_duplicate_spans

    span = "a b c d e f g h"
    docs = spark.createDataFrame([(1, span), (2, span)], ["doc_id", "text"])
    out = {r["doc_id"]: r for r in mask_duplicate_spans(docs, k=8).collect()}
    assert out[1]["clean_text"] == "" and out[1]["n_dropped"] == 8


def test_select_token_budget_empty_input(spark):
    t = spark.createDataFrame([], "doc_id long, score double, n_tokens long")
    assert select_token_budget(t, budget=100).count() == 0


class TestWeightedSample:
    def _df(self, spark):
        # ids 0..39: even ids weight 100, odd ids weight 1
        rows = [(i, 100.0 if i % 2 == 0 else 1.0) for i in range(40)]
        return spark.createDataFrame(rows, "doc_id long, w double")

    def test_without_replacement_and_exact_n(self, spark):
        from database_replicator_spark.operators.corpus import weighted_sample

        out = weighted_sample(self._df(spark), n=10, weight_col="w").collect()
        ids = [r["doc_id"] for r in out]
        assert len(ids) == 10 and len(set(ids)) == 10
        assert sorted(r["rank"] for r in out) == list(range(1, 11))

    def test_prefilter_is_output_identical(self, spark):
        from database_replicator_spark.operators.corpus import weighted_sample

        df = self._df(spark)
        plain = [(r["doc_id"], r["rank"]) for r in
                 weighted_sample(df, n=7, weight_col="w").collect()]
        pre = [(r["doc_id"], r["rank"]) for r in
               weighted_sample(df.repartition(5), n=7, weight_col="w",
                               prefilter_buckets=3).collect()]
        assert plain == pre

    def test_heavy_weights_dominate_inclusion(self, spark):
        """Across seeds, weight-100 rows must win far more slots than
        weight-1 rows (inclusion probability ∝ weight)."""
        from database_replicator_spark.operators.corpus import weighted_sample

        df = self._df(spark).cache()
        heavy = light = 0
        for seed in range(12):
            for r in weighted_sample(df, n=8, weight_col="w", seed=seed).collect():
                if r["doc_id"] % 2 == 0:
                    heavy += 1
                else:
                    light += 1
        df.unpersist()
        assert heavy > 4 * light
