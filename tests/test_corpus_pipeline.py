"""Corpus-pipeline operator tests: clustering, decontamination, sampling,
packing, tf-idf (operators/corpus.py)."""

import pytest
from pyspark.sql import functions as F

from database_replicator_spark.operators.corpus import (
    HASH60_SPAN,
    connected_components,
    ngram_overlap,
    pack_sequences,
    sample_threshold,
    stratified_sample,
    tfidf_topterms,
)
from database_replicator_spark.operators.dedup import doc_shingles


class TestConnectedComponents:
    def _run(self, spark, n_nodes, pairs):
        nodes = spark.createDataFrame([(i,) for i in range(n_nodes)], "node long")
        edges = spark.createDataFrame(pairs, "doc1 long, doc2 long")
        out = connected_components(nodes, edges)
        return {r["node"]: r["cluster_id"] for r in out.collect()}

    def test_chain_converges_to_min(self, spark):
        # 0-1-2-3-4 path: min label must propagate the full diameter
        labels = self._run(spark, 6, [(0, 1), (1, 2), (2, 3), (3, 4)])
        assert labels == {0: 0, 1: 0, 2: 0, 3: 0, 4: 0, 5: 5}

    def test_two_components_and_singletons(self, spark):
        labels = self._run(spark, 7, [(1, 2), (2, 3), (5, 6)])
        assert labels == {0: 0, 1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 5}

    def test_edge_direction_irrelevant(self, spark):
        # edges given high->low still propagate the low id
        labels = self._run(spark, 3, [(2, 0), (1, 2)])
        assert labels == {0: 0, 1: 0, 2: 0}

    def test_empty_edges_all_singletons(self, spark):
        nodes = spark.createDataFrame([(i,) for i in range(4)], "node long")
        edges = spark.createDataFrame([], "doc1 long, doc2 long")
        out = connected_components(nodes, edges).collect()
        assert all(r["node"] == r["cluster_id"] for r in out)

    def test_driver_and_distributed_paths_identical(self, spark):
        """The union-find fast path and the hash-min loop must be
        output-identical on a graph mixing chains, cliques, reversed
        edges and singletons (the oracle never sees which ran)."""
        import random

        rng = random.Random(11)
        n = 60
        pairs = []
        # random chains + a clique + reversed edges
        for _ in range(40):
            a, b = rng.randrange(n), rng.randrange(n)
            if a != b:
                pairs.append((a, b))
        nodes = spark.createDataFrame([(i,) for i in range(n)], "node long")
        edges = spark.createDataFrame(pairs, "doc1 long, doc2 long")
        fast = {
            r["node"]: r["cluster_id"]
            for r in connected_components(nodes, edges).collect()
        }
        loop = {
            r["node"]: r["cluster_id"]
            for r in connected_components(
                nodes, edges, driver_path_max_edges=0
            ).collect()
        }
        assert fast == loop


class TestDecontamination:
    def test_overlap_counts_and_fraction(self, spark):
        docs = spark.createDataFrame(
            [
                (0, "alpha beta gamma delta epsilon"),  # bench (id % 2 == 0... use pred id==0)
                (1, "alpha beta gamma something else entirely"),
                (2, "nothing shared with the benchmark at all"),
            ],
            "doc_id long, text string",
        )
        sh = doc_shingles(docs, k=3)
        out = ngram_overlap(sh, F.col("doc_id") == 0, min_overlap=1).collect()
        # doc 1 shares the 'alpha beta gamma' 3-gram with bench doc 0; doc 2 none
        assert len(out) == 1
        row = out[0]
        assert (row["train_doc"], row["bench_doc"], row["n_overlap"]) == (1, 0, 1)
        assert row["n_train_shingles"] == 4
        assert row["overlap_frac"] == 0.25

    def test_min_overlap_filters(self, spark):
        docs = spark.createDataFrame(
            [(0, "a b c d e"), (1, "a b c d x")],
            "doc_id long, text string",
        )
        sh = doc_shingles(docs, k=3)
        assert ngram_overlap(sh, F.col("doc_id") == 0, min_overlap=3).count() == 0
        assert ngram_overlap(sh, F.col("doc_id") == 0, min_overlap=2).count() == 1


class TestStratifiedSample:
    def test_deterministic_and_rate_roughly_honored(self, spark):
        rows = [(i, "en" if i % 2 == 0 else "zh") for i in range(2000)]
        df = spark.createDataFrame(rows, "doc_id long, lang string")
        rates = {"en": 0.5, "zh": 0.1}
        a = stratified_sample(df, "lang", rates, seed=3)
        b = stratified_sample(df, "lang", rates, seed=3)
        got_a = sorted(r["doc_id"] for r in a.collect())
        got_b = sorted(r["doc_id"] for r in b.collect())
        assert got_a == got_b  # pure function of (id, seed, rate)
        by_lang = {
            r["lang"]: r["n"]
            for r in a.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        # 1000 per stratum; binomial 3-sigma bounds
        assert 450 <= by_lang["en"] <= 550
        assert 70 <= by_lang["zh"] <= 130

    def test_weights_are_inverse_rates(self, spark):
        df = spark.createDataFrame([(i, "en") for i in range(50)], "doc_id long, lang string")
        out = stratified_sample(df, "lang", {"en": 0.25}, seed=0)
        assert {r["weight"] for r in out.collect()} == {4.0}

    def test_unknown_stratum_dropped_by_default(self, spark):
        df = spark.createDataFrame([(1, "xx")], "doc_id long, lang string")
        assert stratified_sample(df, "lang", {"en": 1.0}).count() == 0

    def test_threshold_monotone(self):
        assert sample_threshold(0.0) == 0
        assert sample_threshold(1.0) == HASH60_SPAN
        assert 0 < sample_threshold(0.3) < sample_threshold(0.7) < HASH60_SPAN


class TestPackSequences:
    def test_cumulative_binning(self, spark):
        df = spark.createDataFrame(
            [(1, 60), (2, 50), (3, 10), (4, 200), (5, 5)],
            "doc_id long, n_tokens int",
        )
        out = {r["doc_id"]: (r["pack_id"], r["slot"]) for r in
               pack_sequences(df, budget=100).collect()}
        # cum-before: 0, 60, 110, 120, 320 → packs 0,0,1,1,3
        assert out == {1: (0, 1), 2: (0, 2), 3: (1, 1), 4: (1, 2), 5: (3, 1)}

    def test_oversized_doc_gets_own_packs_not_split(self, spark):
        df = spark.createDataFrame([(1, 500), (2, 10)], "doc_id long, n_tokens int")
        out = {r["doc_id"]: r["pack_id"] for r in pack_sequences(df, budget=100).collect()}
        assert out == {1: 0, 2: 5}  # doc 2 starts a fresh pack after the giant

    def test_partitioned_packing_is_per_key(self, spark):
        df = spark.createDataFrame(
            [(1, "a", 80), (2, "a", 80), (1, "b", 80), (2, "b", 80)],
            "doc_id long, src string, n_tokens int",
        )
        out = pack_sequences(df, budget=100, part_col="src").collect()
        packs = {(r["src"], r["doc_id"]): r["pack_id"] for r in out}
        assert packs == {("a", 1): 0, ("a", 2): 0, ("b", 1): 0, ("b", 2): 0}

    def test_range_packing_matches_single_window(self, spark):
        # 400 docs, 2 sources, varied token counts, non-contiguous ids —
        # the two-pass range path must reproduce the single-window output
        # exactly while spreading each source across many buckets
        rows = [
            (i * 3 + 7, "ab"[i % 2], (i * 37) % 190 + 1) for i in range(400)
        ]
        df = spark.createDataFrame(rows, "doc_id long, src string, n_tokens int")
        key = ["src", "doc_id"]
        fast = pack_sequences(
            df, budget=500, part_col="src", range_width=64
        ).orderBy(*key).collect()
        slow = pack_sequences(
            df, budget=500, part_col="src", range_width=None
        ).orderBy(*key).collect()
        assert [tuple(r) for r in fast] == [tuple(r) for r in slow]

    def test_range_packing_uses_many_buckets_per_source(self, spark):
        # the scale property: each source's cumulative sort is split over
        # >1 range bucket (no single-task source-wide sort)
        rows = [(i, "cc", 10) for i in range(1000)]
        df = spark.createDataFrame(rows, "doc_id long, src string, n_tokens int")
        n_buckets = (
            df.withColumn("_bkt", F.expr("doc_id div 64"))
            .groupBy("src")
            .agg(F.countDistinct("_bkt").alias("nb"))
            .collect()[0]["nb"]
        )
        assert n_buckets > 1
        out = pack_sequences(df, budget=100, part_col="src", range_width=64)
        # windowed cum must still be globally consistent across buckets
        cums = {r["doc_id"]: r["cum_tokens"] for r in out.collect()}
        assert cums[0] == 10 and cums[999] == 10_000


class TestMixtureReport:
    def test_shares_sum_to_one_and_counts(self, spark):
        from database_replicator_spark.operators.corpus import mixture_report

        df = spark.createDataFrame(
            [("cc", "en", 100), ("cc", "en", 300), ("wiki", "de", 600)],
            "source string, lang string, n_tokens int",
        )
        out = {(r["source"], r["lang"]): r for r in
               mixture_report(df, ["source", "lang"]).collect()}
        assert out[("cc", "en")]["n_docs"] == 2
        assert out[("cc", "en")]["total_tokens"] == 400
        assert out[("cc", "en")]["token_share"] == 0.4
        assert out[("wiki", "de")]["token_share"] == 0.6
        assert out[("cc", "en")]["mean_tokens"] == 200.0


class TestQualityFilter:
    def test_rule_cascade_first_reason_wins(self, spark):
        from database_replicator_spark.operators.textops import quality_filter

        rows = [
            (1, "word " * 5),                     # 5 tokens -> too_short
            (2, "the " + "unique" + " of and to in is it for on " + " ".join(f"w{i}" for i in range(20))),
            (3, " ".join(["spam"] * 40)),          # no stopwords -> low_stopword fires before repetitive
            (4, "the a of and to in is it for on " + " ".join(["x"] * 30)),  # x = 30/40 -> repetitive
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["doc_id"]: (r["keep"], r["reject_reason"]) for r in
               quality_filter(df).collect()}
        assert out[1] == (False, "too_short")
        assert out[2] == (True, None)
        assert out[3] == (False, "low_stopword")
        assert out[4] == (False, "repetitive")


class TestPassageDedup:
    def test_repeated_passage_found_across_docs(self, spark):
        from database_replicator_spark.operators.corpus import passage_dedup_groups

        boiler = " ".join(f"b{i}" for i in range(16))  # exactly one window
        rows = [
            (1, boiler + " " + " ".join(f"u{i}" for i in range(16))),
            (2, boiler + " " + " ".join(f"v{i}" for i in range(16))),
            (3, " ".join(f"w{i}" for i in range(32))),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = passage_dedup_groups(df, window=16).collect()
        assert len(out) == 1  # only the shared boilerplate window repeats
        assert out[0]["n_docs"] == 2 and out[0]["keep_doc"] == 1

    def test_within_doc_repetition_counts_occurrences(self, spark):
        from database_replicator_spark.operators.corpus import passage_dedup_groups

        chunk = " ".join(f"c{i}" for i in range(16))
        df = spark.createDataFrame(
            [(7, chunk + " " + chunk)], "doc_id long, text string"
        )
        out = passage_dedup_groups(df, window=16).collect()
        assert len(out) == 1
        assert out[0]["n_docs"] == 1 and out[0]["n_occurrences"] == 2


class TestTopNgrams:
    def test_df_ranking_with_ties(self, spark):
        from database_replicator_spark.operators.corpus import top_ngrams
        from database_replicator_spark.operators.dedup import doc_shingles

        docs = spark.createDataFrame(
            [(1, "alpha beta gamma delta"), (2, "alpha beta gamma epsilon")],
            "doc_id long, text string",
        )
        out = [(r["shingle"], r["df_docs"], r["rank"]) for r in
               top_ngrams(doc_shingles(docs), k=3).collect()]
        # 'alpha beta gamma' appears in both docs; ties break alphabetically
        assert out[0] == ("alpha beta gamma", 2, 1)
        assert all(out[i][1] >= out[i + 1][1] for i in range(len(out) - 1))


class TestDeterministicShuffle:
    def test_layout_invariant_to_partitioning(self, spark):
        from database_replicator_spark.operators.corpus import deterministic_shuffle

        df = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
        a = {(r["doc_id"], r["shard"], r["pos"]) for r in
             deterministic_shuffle(df, n_shards=4, seed=3).collect()}
        b = {(r["doc_id"], r["shard"], r["pos"]) for r in
             deterministic_shuffle(df.repartition(7), n_shards=4, seed=3).collect()}
        assert a == b

    def test_seed_changes_layout_and_positions_are_dense(self, spark):
        from database_replicator_spark.operators.corpus import deterministic_shuffle

        df = spark.createDataFrame([(i,) for i in range(100)], "doc_id long")
        s0 = deterministic_shuffle(df, n_shards=4, seed=0)
        s1 = deterministic_shuffle(df, n_shards=4, seed=1)
        l0 = {(r["doc_id"], r["shard"], r["pos"]) for r in s0.collect()}
        l1 = {(r["doc_id"], r["shard"], r["pos"]) for r in s1.collect()}
        assert l0 != l1  # reshuffled epoch
        # positions within each shard are 1..n dense
        for shard_rows in s0.groupBy("shard").agg(
            F.count(F.lit(1)).alias("n"), F.max("pos").alias("mx"), F.min("pos").alias("mn")
        ).collect():
            assert shard_rows["mn"] == 1 and shard_rows["mx"] == shard_rows["n"]


class TestTfidf:
    def test_rare_terms_outrank_common(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "common common rare1"),
                (2, "common common rare2"),
                (3, "common common rare3"),
            ],
            "doc_id long, text string",
        )
        out = tfidf_topterms(docs, n_docs=3, k=1).collect()
        top = {r["doc_id"]: r["term"] for r in out}
        # 'common' has df=3 → idf=0; each rareN has df=1 → positive score
        assert top == {1: "rare1", 2: "rare2", 3: "rare3"}

    def test_rank_deterministic_on_ties(self, spark):
        docs = spark.createDataFrame([(1, "zeta alpha")], "doc_id long, text string")
        out = tfidf_topterms(docs, n_docs=1, k=2).collect()
        ranked = sorted((r["rank"], r["term"]) for r in out)
        # equal scores → alphabetical tiebreak
        assert ranked == [(1, "alpha"), (2, "zeta")]


class TestCapPerGroup:
    def test_caps_only_oversized_groups_deterministically(self, spark):
        from database_replicator_spark.operators.corpus import cap_per_group

        rows = [(i, "big") for i in range(10)] + [(100, "small"), (101, "small")]
        df = spark.createDataFrame(rows, "doc_id long, source string")
        out = cap_per_group(df, "source", cap=3).collect()
        by_src = {}
        for r in out:
            by_src.setdefault(r["source"], []).append(r)
        assert len(by_src["big"]) == 3 and len(by_src["small"]) == 2
        assert {r["sel_rank"] for r in by_src["big"]} == {1, 2, 3}
        # deterministic: a reshuffled input yields the identical selection
        again = cap_per_group(df.repartition(7), "source", cap=3).collect()
        assert {(r["doc_id"], r["sel_rank"]) for r in again} == {
            (r["doc_id"], r["sel_rank"]) for r in out
        }

    def test_seed_changes_selection(self, spark):
        from database_replicator_spark.operators.corpus import cap_per_group

        df = spark.createDataFrame(
            [(i, "s") for i in range(20)], "doc_id long, source string"
        )
        a = {r["doc_id"] for r in cap_per_group(df, "source", cap=5, seed=1).collect()}
        b = {r["doc_id"] for r in cap_per_group(df, "source", cap=5, seed=2).collect()}
        assert a != b  # 20C5 space — seeded draws differ


class TestUnigramLogprob:
    def test_common_token_docs_score_higher(self, spark):
        from database_replicator_spark.operators.corpus import unigram_logprob

        docs = spark.createDataFrame(
            [
                (1, "the the the the"),          # only common tokens
                (2, "the qwxz the vbnm"),        # half rare tokens
            ],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in unigram_logprob(docs).collect()}
        assert out[1]["n_tokens"] == 4 and out[2]["n_tokens"] == 4
        assert out[1]["avg_logprob"] > out[2]["avg_logprob"]
        # sum = avg * n within rounding
        for r in out.values():
            assert abs(r["sum_logprob"] - r["avg_logprob"] * r["n_tokens"]) < 1e-4

    def test_range_sharded_form_is_output_identical(self, spark):
        """The scale-safe two-phase rank (range shards on the uniform
        draw + offset merge) must reproduce the single-window output
        exactly — same selection, same ranks."""
        from database_replicator_spark.operators.corpus import cap_per_group

        rows = [(i, "a") for i in range(40)] + [(i + 1000, "b") for i in range(7)]
        df = spark.createDataFrame(rows, "doc_id long, source string")
        one = {
            (r["doc_id"], r["source"], r["sel_rank"])
            for r in cap_per_group(df, "source", cap=12).collect()
        }
        sharded = {
            (r["doc_id"], r["source"], r["sel_rank"])
            for r in cap_per_group(df, "source", cap=12, range_shards=8).collect()
        }
        assert one == sharded


class TestTemperatureMix:
    def _docs(self, spark):
        # 3 strata with sizes 100 / 25 / 4
        rows = (
            [(i, "big") for i in range(100)]
            + [(100 + i, "mid") for i in range(25)]
            + [(125 + i, "small") for i in range(4)]
        )
        return spark.createDataFrame(rows, "doc_id long, source string")

    def test_rates_alpha_half(self, spark):
        from database_replicator_spark.operators.corpus import temperature_rates

        out = {
            r["source"]: r.asDict()
            for r in temperature_rates(self._docs(spark), "source").collect()
        }
        # rate = sqrt(n_min/n); smallest stratum keeps everything
        assert out["small"]["rate"] == 1.0
        assert out["small"]["keep_threshold"] == HASH60_SPAN
        assert out["big"]["rate"] == pytest.approx((4 / 100) ** 0.5, abs=1e-6)
        assert out["mid"]["rate"] == pytest.approx((4 / 25) ** 0.5, abs=1e-6)
        # p_temp ∝ sqrt(n): shares sum to 1 and order-flatten vs p_raw
        assert sum(v["p_temp"] for v in out.values()) == pytest.approx(1.0, abs=1e-5)
        assert out["big"]["p_temp"] < out["big"]["p_raw"]
        assert out["small"]["p_temp"] > out["small"]["p_raw"]

    def test_rates_alpha_one_is_identity(self, spark):
        from database_replicator_spark.operators.corpus import temperature_rates

        out = {
            r["source"]: r.asDict()
            for r in temperature_rates(self._docs(spark), "source", alpha=1.0).collect()
        }
        for v in out.values():
            assert v["p_temp"] == v["p_raw"]
            assert v["rate"] == 1.0

    def test_sample_deterministic_and_full_min_stratum(self, spark):
        from database_replicator_spark.operators.corpus import temperature_sample

        docs = self._docs(spark)
        a = temperature_sample(docs, "source", seed=3)
        b = temperature_sample(docs, "source", seed=3)
        ids_a = sorted(r["doc_id"] for r in a.collect())
        ids_b = sorted(r["doc_id"] for r in b.collect())
        assert ids_a == ids_b
        kept = {s: 0 for s in ("big", "mid", "small")}
        for r in a.collect():
            kept[r["source"]] += 1
        assert kept["small"] == 4  # min stratum kept in full
        # effective counts ∝ sqrt(n): 100→~20, 25→~10 (hash noise allowed)
        assert 10 <= kept["big"] <= 30
        assert 4 <= kept["mid"] <= 16

    def test_sample_matches_manual_threshold(self, spark):
        from database_replicator_spark.functions.hashing import hash60, seeded
        from database_replicator_spark.operators.corpus import temperature_sample

        docs = self._docs(spark)
        import math

        out = temperature_sample(docs, "source", seed=3)
        draws = {
            r["doc_id"]: r["k"]
            for r in docs.select(
                "doc_id", hash60(seeded(F.col("doc_id").cast("string"), 3)).alias("k")
            ).collect()
        }
        thresh = {
            "big": math.floor(math.sqrt(4 / 100) * HASH60_SPAN),
            "mid": math.floor(math.sqrt(4 / 25) * HASH60_SPAN),
            "small": HASH60_SPAN,
        }
        expect = {
            r["doc_id"]
            for r in docs.collect()
            if draws[r["doc_id"]] < thresh[r["source"]]
        }
        assert {r["doc_id"] for r in out.collect()} == expect


class TestDatasetSplit:
    def test_partition_exhaustive_and_deterministic(self, spark):
        from database_replicator_spark.operators.corpus import dataset_split

        docs = spark.createDataFrame(
            [(i,) for i in range(2000)], "doc_id long"
        )
        fr = {"train": 0.8, "val": 0.1, "test": 0.1}
        out = dataset_split(docs, fr, seed=5)
        rows = out.collect()
        assert len(rows) == 2000  # every doc assigned exactly once
        counts = {}
        for r in rows:
            counts[r["split"]] = counts.get(r["split"], 0) + 1
        assert set(counts) == {"train", "val", "test"}
        assert counts["train"] == pytest.approx(1600, abs=120)
        assert counts["val"] == pytest.approx(200, abs=60)
        # stable under re-run and under appends (same doc, same split)
        again = {r["doc_id"]: r["split"] for r in dataset_split(docs, fr, seed=5).collect()}
        more = spark.createDataFrame([(i,) for i in range(3000)], "doc_id long")
        bigger = {
            r["doc_id"]: r["split"] for r in dataset_split(more, fr, seed=5).collect()
        }
        for r in rows:
            assert again[r["doc_id"]] == r["split"]
            assert bigger[r["doc_id"]] == r["split"]

    def test_split_seed_changes_assignment(self, spark):
        from database_replicator_spark.operators.corpus import dataset_split

        docs = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
        fr = {"a": 0.5, "b": 0.5}
        s1 = {r["doc_id"]: r["split"] for r in dataset_split(docs, fr, seed=1).collect()}
        s2 = {r["doc_id"]: r["split"] for r in dataset_split(docs, fr, seed=2).collect()}
        assert any(s1[i] != s2[i] for i in s1)


class TestDsirLogratio:
    def test_target_like_docs_score_higher(self, spark):
        from database_replicator_spark.operators.corpus import dsir_logratio

        rows = (
            # target slice: fruit vocabulary
            [(i, "apple banana apple cherry", "tgt") for i in range(5)]
            # raw bulk: animal vocabulary
            + [(10 + i, "dog cat dog bird", "web") for i in range(20)]
            # probes: one fruit-like, one animal-like
            + [(100, "apple banana cherry apple", "probe"),
               (101, "dog cat bird dog", "probe")]
        )
        docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
        out = {
            r["doc_id"]: r["avg_log_ratio"]
            for r in dsir_logratio(docs, F.col("source") == "tgt").collect()
        }
        assert out[100] > out[101]
        # target docs themselves score above the raw bulk
        assert min(out[i] for i in range(5)) > max(out[10 + i] for i in range(20))

    def test_deterministic_and_complete(self, spark):
        from database_replicator_spark.operators.corpus import dsir_logratio

        docs = spark.createDataFrame(
            [(i, f"tok{i % 7} tok{i % 3} common", "s" + str(i % 4)) for i in range(50)],
            "doc_id long, text string, source string",
        )
        a = dsir_logratio(docs, F.col("source") == "s0").collect()
        b = dsir_logratio(docs, F.col("source") == "s0").collect()
        assert len(a) == 50
        assert sorted(map(str, a)) == sorted(map(str, b))


class TestChunkLongDocs:
    def test_short_doc_single_chunk(self, spark):
        from database_replicator_spark.operators.corpus import chunk_long_docs

        docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
        rows = chunk_long_docs(docs, budget=10).collect()
        assert len(rows) == 1
        r = rows[0]
        assert (r["chunk_id"], r["start_tok"], r["chunk_tokens"]) == (0, 0, 3)
        assert r["chunk_text"] == "a b c"

    def test_windows_cover_with_overlap(self, spark):
        from database_replicator_spark.operators.corpus import chunk_long_docs

        text = " ".join(f"t{i}" for i in range(10))
        docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
        rows = sorted(
            chunk_long_docs(docs, budget=4, overlap=1).collect(),
            key=lambda r: r["chunk_id"],
        )
        # step 3: starts 0,3,6 — [6,10) already covers the tail, so no
        # degenerate 1-token window is emitted
        assert [r["start_tok"] for r in rows] == [0, 3, 6]
        assert [r["chunk_tokens"] for r in rows] == [4, 4, 4]
        assert rows[0]["chunk_text"] == "t0 t1 t2 t3"
        assert rows[1]["chunk_text"] == "t3 t4 t5 t6"   # 1-token carry-over
        assert rows[2]["chunk_text"] == "t6 t7 t8 t9"
        # every token appears in some window; consecutive windows share `overlap`
        seen = set()
        for r in rows:
            seen.update(r["chunk_text"].split(" "))
        assert seen == {f"t{i}" for i in range(10)}

    def test_exact_boundary_no_empty_tail(self, spark):
        from database_replicator_spark.operators.corpus import chunk_long_docs

        text = " ".join(f"t{i}" for i in range(8))
        docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
        rows = chunk_long_docs(docs, budget=4, overlap=0).collect()
        assert sorted(r["chunk_tokens"] for r in rows) == [4, 4]

    def test_invalid_overlap_raises(self, spark):
        from database_replicator_spark.operators.corpus import chunk_long_docs

        docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with pytest.raises(ValueError):
            chunk_long_docs(docs, budget=4, overlap=4)


class TestStarConnectedComponents:
    def _run(self, spark, n_nodes, pairs):
        from database_replicator_spark.operators.corpus import (
            connected_components_star,
        )

        nodes = spark.createDataFrame([(i,) for i in range(n_nodes)], "node long")
        edges = spark.createDataFrame(pairs, "doc1 long, doc2 long")
        out = connected_components_star(nodes, edges)
        return {r["node"]: r["cluster_id"] for r in out.collect()}

    def test_long_path_converges(self, spark):
        # the adversarial case for plain label propagation
        n = 16
        labels = self._run(spark, n, [(i, i + 1) for i in range(n - 1)])
        assert labels == {i: 0 for i in range(n)}

    def test_matches_hashmin_on_random_graphs(self, spark):
        import random

        from database_replicator_spark.operators.corpus import connected_components

        rng = random.Random(7)
        n = 60
        pairs = sorted({(min(a, b), max(a, b))
                        for a, b in (sorted(rng.sample(range(n), 2)) for _ in range(45))})
        nodes = spark.createDataFrame([(i,) for i in range(n)], "node long")
        edges = spark.createDataFrame(pairs, "doc1 long, doc2 long")
        star = {
            r["node"]: r["cluster_id"]
            for r in __import__(
                "database_replicator_spark.operators.corpus", fromlist=["x"]
            ).connected_components_star(nodes, edges).collect()
        }
        hashmin = {
            r["node"]: r["cluster_id"]
            for r in connected_components(nodes, edges).collect()
        }
        assert star == hashmin

    def test_self_loops_and_duplicate_edges(self, spark):
        labels = self._run(spark, 4, [(1, 1), (2, 3), (3, 2), (2, 3)])
        assert labels == {0: 0, 1: 1, 2: 2, 3: 2}


class TestBigramLogprob:
    def test_repetitive_bigrams_score_higher(self, spark):
        from database_replicator_spark.operators.corpus import bigram_logprob

        rows = (
            # corpus dominated by 'a b' transitions
            [(i, "a b a b a b") for i in range(10)]
            # probe with the same transitions vs a probe with unseen ones
            + [(100, "a b a b"), (101, "b a b a")]
        )
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["doc_id"]: r.asDict() for r in bigram_logprob(docs).collect()}
        assert out[100]["avg_logprob"] > out[101]["avg_logprob"]
        assert out[100]["n_scored"] == 3

    def test_single_token_docs_dropped(self, spark):
        from database_replicator_spark.operators.corpus import bigram_logprob

        docs = spark.createDataFrame(
            [(1, "solo"), (2, "two words")], "doc_id long, text string"
        )
        out = bigram_logprob(docs).collect()
        assert {r["doc_id"] for r in out} == {2}


class TestSelectCanonicals:
    def test_priority_beats_min_id(self, spark):
        from database_replicator_spark.operators.corpus import (
            connected_components,
            select_canonicals,
        )

        # cluster {1,2,3}: doc 3 is from the curated source (priority 0)
        # cluster {7,8}: both crawl; singleton 9
        docs = spark.createDataFrame(
            [(1, 2), (2, 2), (3, 0), (7, 2), (8, 2), (9, 1)],
            "doc_id long, src_priority int",
        )
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (7, 8)], "doc1 long, doc2 long"
        )
        labels = connected_components(
            docs.select(F.col("doc_id").alias("node")), pairs
        )
        # default: min id wins
        by_id = {
            r["cluster_id"]: (r["canonical_id"], r["cluster_size"])
            for r in select_canonicals(labels, docs).collect()
        }
        assert by_id[1] == (1, 3)
        assert by_id[7] == (7, 2)
        assert by_id[9] == (9, 1)
        # with priority: the curated member wins its cluster
        by_prio = {
            r["cluster_id"]: r["canonical_id"]
            for r in select_canonicals(
                labels, docs, priority_col="src_priority"
            ).collect()
        }
        assert by_prio[1] == 3
        assert by_prio[7] == 7   # tie on priority → min id
        assert by_prio[9] == 9


class TestDedupRepeatedChunks:
    def test_repeated_boilerplate_dropped_in_order(self, spark):
        from database_replicator_spark.operators.corpus import (
            dedup_repeated_chunks,
        )

        nav = " ".join(f"nav{i}" for i in range(20))     # one exact chunk
        body1 = " ".join(f"b{i}" for i in range(20))
        body2 = " ".join(f"c{i}" for i in range(20))
        # nav repeats twice more after bodies
        text = " ".join([nav, body1, nav, body2, nav])
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        out = dedup_repeated_chunks(df, chunk_words=20).collect()[0]
        assert out["n_chunks"] == 5
        assert out["n_dropped"] == 2
        assert out["clean_text"] == " ".join([nav, body1, body2])

    def test_no_repeats_is_identity(self, spark):
        from database_replicator_spark.operators.corpus import (
            dedup_repeated_chunks,
        )

        text = " ".join(f"w{i}" for i in range(45))  # 3 chunks, all distinct
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        out = dedup_repeated_chunks(df, chunk_words=20).collect()[0]
        assert out["n_dropped"] == 0
        assert out["clean_text"] == text
