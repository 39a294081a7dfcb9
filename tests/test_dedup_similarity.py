"""Dedup & similarity operator tests with planted duplicates."""

import pytest
from pyspark.sql import functions as F

from database_replicator_spark.operators.dedup import (
    doc_shingles,
    exact_dedup_groups,
    hamming_distance,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    simhash_signatures,
)
from database_replicator_spark.operators.similarity import (
    brute_force_topk,
    cosine_expr,
    lsh_topk,
    neardup_pairs,
    neardup_pairs_blas,
    neardup_pairs_blocked,
)


@pytest.fixture()
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = "the quick brown fox jumps over the lazy dog again and again tomorrow"
    other = "completely different content about spark query engines at scale"
    return spark.createDataFrame(
        [(1, base), (2, base.upper()), (3, near), (4, other)],
        "doc_id long, text string",
    )


class TestExactDedup:
    def test_case_whitespace_invariant_groups(self, spark, docs):
        groups = exact_dedup_groups(docs).collect()
        by_n = sorted((g["n_docs"], g["keep_id"]) for g in groups)
        # docs 1 and 2 collapse (case-normalized); 3 and 4 are singletons
        assert by_n == [(1, 3), (1, 4), (2, 1)]


class TestMinhashLsh:
    def test_planted_neardup_is_candidate(self, spark, docs):
        sh = doc_shingles(docs)
        sig = minhash_signatures(sh, num_hashes=12)
        pairs = {(r["doc1"], r["doc2"]) for r in lsh_candidate_pairs(sig).collect()}
        assert (1, 2) in pairs        # exact dup (normalized) always collides
        assert (1, 3) in pairs or (2, 3) in pairs  # near dup should band-collide
        assert all(4 not in p for p in pairs)      # unrelated doc never pairs

    def test_jaccard_exact_values(self, spark, docs):
        sh = doc_shingles(docs)
        out = {(r["doc1"], r["doc2"]): r for r in jaccard_pairs(sh).collect()}
        assert out[(1, 2)]["jaccard"] == 1.0
        j13 = out[(1, 3)]["jaccard"]
        # 13-token docs differing in last token: 11 shingles each, 10 shared
        assert abs(j13 - 10 / 12) < 1e-12
        assert (1, 4) not in out

    def test_lsh_candidates_subset_of_sharing_pairs(self, spark, sf_dir):
        from database_replicator_spark.sources.catalog import load_table

        docs = load_table(spark, sf_dir, "documents").limit(100)
        sh = doc_shingles(docs)
        sig = minhash_signatures(sh, num_hashes=12)
        cand = lsh_candidate_pairs(sig)
        verified = jaccard_pairs(sh, candidates=cand)
        assert verified.count() <= cand.count()


class TestSimhash:
    def test_near_dup_small_hamming(self, spark, docs):
        sh = doc_shingles(docs)
        sigs = {r["doc_id"]: r["simhash"] for r in simhash_signatures(sh).collect()}
        assert sigs[1] == sigs[2]  # identical normalized content
        df = spark.createDataFrame(
            [(sigs[1], sigs[3], sigs[4])], "a long, b long, c long"
        )
        row = df.select(
            hamming_distance(F.col("a"), F.col("b")).alias("near"),
            hamming_distance(F.col("a"), F.col("c")).alias("far"),
        ).collect()[0]
        assert row["near"] < row["far"]


@pytest.fixture()
def vectors(spark):
    import math

    rows = []
    for i in range(40):
        base = [math.sin(i * 13.7 + j) for j in range(8)]
        rows.append((i, [float(x) for x in base]))
    # vector 100 = near-copy of vector 0
    v0 = rows[0][1]
    rows.append((100, [x + 0.01 for x in v0]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


class TestSimilarity:
    def test_cosine_self_is_one(self, spark, vectors):
        row = vectors.filter(F.col("vec_id") == 0).select(
            cosine_expr(F.col("embedding"), F.col("embedding")).alias("c")
        ).collect()[0]
        assert abs(row["c"] - 1.0) < 1e-12

    def test_bruteforce_finds_planted_neighbor(self, spark, vectors):
        q = vectors.filter(F.col("vec_id") == 0)
        top = brute_force_topk(vectors, q, k=3).collect()
        assert top[0]["corpus_id"] == 100 and top[0]["rank"] == 1
        assert top[0]["cosine"] > 0.999

    def test_neardup_pairs_threshold(self, spark, vectors):
        pairs = neardup_pairs(vectors, threshold=0.999).collect()
        assert {(p["id1"], p["id2"]) for p in pairs} == {(0, 100)}

    def test_blocked_matches_blas_exactly(self, spark, vectors):
        # the distributed block-matrix scan must reproduce the
        # driver-broadcast BLAS twin bit-for-bit (same rounding)
        blas = {
            (r["id1"], r["id2"]): r["cosine"]
            for r in neardup_pairs_blas(vectors, threshold=0.3).collect()
        }
        blocked = {
            (r["id1"], r["id2"]): r["cosine"]
            for r in neardup_pairs_blocked(vectors, threshold=0.3).collect()
        }
        assert blas == blocked and len(blocked) > 1

    def test_blocked_invariant_to_block_count(self, spark, vectors):
        one = {
            (r["id1"], r["id2"])
            for r in neardup_pairs_blocked(vectors, threshold=0.3, num_blocks=1).collect()
        }
        many = {
            (r["id1"], r["id2"])
            for r in neardup_pairs_blocked(vectors, threshold=0.3, num_blocks=7).collect()
        }
        assert one == many

    def test_lsh_recall_on_fixture(self, spark):
        from database_replicator_spark.sources.catalog import load_table

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        q = emb.filter(F.col("vec_id") < 5)
        exact = {
            (r["query_id"], r["corpus_id"])
            for r in brute_force_topk(emb, q, k=10).collect()
        }
        approx = {
            (r["query_id"], r["corpus_id"])
            for r in lsh_topk(emb, q, dim=64, k=10, num_planes=4).collect()
        }
        recall = len(exact & approx) / len(exact)
        assert recall >= 0.2, f"LSH recall collapsed: {recall}"

    def test_kmeans_quantizer_beats_sample_on_clustered_corpus(self, spark):
        """The production IVF quantizer contract: on a corpus with real
        cluster structure whose low-id vectors all sit in ONE stratum
        (so the deterministic lowest-id sample quantizer is maximally
        misled), driver-trained spherical k-means centroids recover the
        true cells and recall@10 at nprobe=1 beats the sample quantizer
        and clears 0.9."""
        import numpy as np

        from database_replicator_spark.operators.similarity import ivf_topk, topk_blas

        rng = np.random.default_rng(7)
        K, dim, per = 8, 16, 50
        centers = rng.normal(size=(K, dim))
        centers /= np.sqrt((centers * centers).sum(axis=1, keepdims=True))
        rows = []
        vid = 0
        for c in range(K):  # cluster-major ids: ids 0..49 are ALL cluster 0
            for _ in range(per):
                v = centers[c] + 0.12 * rng.normal(size=dim)
                rows.append((vid, [float(x) for x in v]))
                vid += 1
        corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        queries = corpus.filter(F.col("vec_id") % per == 5)  # one per cluster

        def recall(df):
            got = {(r["query_id"], r["corpus_id"]) for r in df.collect()}
            return len(got & truth) / len(truth)

        truth = {
            (r["query_id"], r["corpus_id"])
            for r in topk_blas(corpus, queries, k=10).collect()
        }
        r_sample = recall(
            ivf_topk(corpus, queries, k=10, nlist=K, nprobe=1, quantizer="sample")
        )
        r_kmeans = recall(
            ivf_topk(corpus, queries, k=10, nlist=K, nprobe=1, quantizer="kmeans")
        )
        assert r_kmeans > r_sample, (r_kmeans, r_sample)
        assert r_kmeans >= 0.9, r_kmeans

    def test_kmeans_sample_unbiased_when_ids_are_stratified(self, spark):
        """Quantizer training sample is drawn in hash60(id) order, not id
        order: when ids correlate with strata (id ranges per source — the
        common production layout) and the sample budget is SMALLER than
        one stratum, an id-ordered sample would train every centroid on
        stratum 0 and never see the others. The hash-ordered sample must
        still place a centroid near every true cluster center."""
        import numpy as np

        from database_replicator_spark.operators.similarity import kmeans_centroids

        rng = np.random.default_rng(11)
        K, dim, per = 8, 16, 100
        centers = rng.normal(size=(K, dim))
        centers /= np.sqrt((centers * centers).sum(axis=1, keepdims=True))
        rows = []
        vid = 0
        for c in range(K):  # ids 0..99 are ALL cluster 0, etc.
            for _ in range(per):
                v = centers[c] + 0.10 * rng.normal(size=dim)
                rows.append((vid, [float(x) for x in v]))
                vid += 1
        corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        # sample budget < one stratum: id-order would see ONLY cluster 0
        cent = kmeans_centroids(corpus, nlist=K, sample_size=per - 20)
        coverage = (centers @ cent.T).max(axis=1)  # best centroid per true center
        assert (coverage >= 0.8).sum() >= K - 1, coverage


class TestLshBucketCap:
    def test_degenerate_bucket_dropped(self, spark):
        # pathological corpus: 20 identical boilerplate docs (one mega
        # bucket) + 2 planted near-dups with distinct content
        boiler = "terms of service apply to all users of this website always"
        a = "the quick brown fox jumps over the lazy dog again and again today"
        b = "the quick brown fox jumps over the lazy dog again and again tomorrow"
        rows = [(i, boiler) for i in range(20)] + [(100, a), (101, b)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        sig = minhash_signatures(doc_shingles(docs), num_hashes=12)

        uncapped = {(r["doc1"], r["doc2"]) for r in lsh_candidate_pairs(sig).collect()}
        capped = {
            (r["doc1"], r["doc2"])
            for r in lsh_candidate_pairs(sig, max_bucket_size=5).collect()
        }
        # uncapped: the boilerplate bucket alone yields C(20,2)=190 pairs
        assert len(uncapped) >= 190
        # capped: every boilerplate pair gone, the planted near-dup survives
        assert all(p[0] >= 100 for p in capped), capped
        assert (100, 101) in capped

    def test_incremental_candidates_delta_vs_index(self, spark):
        """Delta-vs-index banding: a new doc near-identical to an index
        doc pairs with it; an unrelated new doc pairs with nothing; and
        pairs never form within the index (no corpus self-join)."""
        from database_replicator_spark.operators.dedup import (
            lsh_incremental_candidates,
        )

        a = "the quick brown fox jumps over the lazy dog again and again today"
        b = "the quick brown fox jumps over the lazy dog again and again tomorrow"
        idx_docs = spark.createDataFrame(
            [(1, a), (2, "completely different content about databases and replication")],
            "doc_id long, text string",
        )
        new_docs = spark.createDataFrame(
            [(100, b), (101, "nothing like anything in the index corpus at all")],
            "doc_id long, text string",
        )
        idx_sigs = minhash_signatures(doc_shingles(idx_docs), num_hashes=12)
        new_sigs = minhash_signatures(doc_shingles(new_docs), num_hashes=12)
        out = {(r["new_doc"], r["index_doc"]) for r in
               lsh_incremental_candidates(new_sigs, idx_sigs).collect()}
        assert (100, 1) in out
        assert all(nd in (100, 101) for nd, _ in out)  # left side is always the delta

    def test_default_cap_drops_degenerate_bucket(self, spark):
        # 60 identical docs exceed DEFAULT_MAX_BUCKET_SIZE=50: the default
        # pipeline (what the gates run) drops that bucket entirely while
        # max_bucket_size=None keeps its C(60,2) pairs
        from database_replicator_spark.operators.dedup import DEFAULT_MAX_BUCKET_SIZE

        boiler = "subscribe to our newsletter for updates and exclusive offers"
        rows = [(i, boiler) for i in range(DEFAULT_MAX_BUCKET_SIZE + 10)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        sig = minhash_signatures(doc_shingles(docs), num_hashes=12)
        assert lsh_candidate_pairs(sig).count() == 0
        assert lsh_candidate_pairs(sig, max_bucket_size=None).count() == 60 * 59 // 2

    def test_cap_none_is_identity(self, spark, docs):
        sig = minhash_signatures(doc_shingles(docs), num_hashes=12)
        base = {(r["doc1"], r["doc2"]) for r in lsh_candidate_pairs(sig).collect()}
        wide = {
            (r["doc1"], r["doc2"])
            for r in lsh_candidate_pairs(sig, max_bucket_size=10**6).collect()
        }
        assert base == wide


class TestNeardupPairsLsh:
    def test_matches_bucket_join_formulation(self, spark):
        from database_replicator_spark.operators.similarity import (
            dot_expr,
            lsh_bucket_expr,
            neardup_pairs_lsh,
            unit_expr,
        )
        from database_replicator_spark.sources.catalog import load_table

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        got = {
            (r["id1"], r["id2"]): r["cosine"]
            for r in neardup_pairs_lsh(emb, dim=64, threshold=0.15, num_planes=6).collect()
        }
        # reference formulation: explicit bucket self-join + fold dot
        withb = emb.select(
            "vec_id",
            unit_expr(F.col("embedding")).alias("unit"),
            lsh_bucket_expr(F.col("embedding"), dim=64, num_planes=6).alias("bucket"),
        ).cache()
        a = withb.select(F.col("vec_id").alias("id1"), F.col("unit").alias("u1"), "bucket")
        b = withb.select(F.col("vec_id").alias("id2"), F.col("unit").alias("u2"), "bucket")
        want = {
            (r["id1"], r["id2"]): r["cosine"]
            for r in a.join(b, on="bucket")
            .filter(F.col("id1") < F.col("id2"))
            .withColumn("d", dot_expr(F.col("u1"), F.col("u2")))
            .filter(F.col("d") >= 0.15)
            .select("id1", "id2", F.round(F.col("d"), 6).alias("cosine"))
            .collect()
        }
        assert got == want

    def test_multi_table_unions_candidates_no_dupes(self, spark):
        """num_tables > 1 ORs independently-seeded hash tables: the pair
        set must contain the single-table pairs (table 0 is the same
        seed), stay a subset of the exact blocked pairs with identical
        cosines, and never emit a pair twice."""
        from database_replicator_spark.operators.similarity import (
            neardup_pairs_blocked,
            neardup_pairs_lsh,
        )
        from database_replicator_spark.sources.catalog import load_table

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        one = {
            (r["id1"], r["id2"]): r["cosine"]
            for r in neardup_pairs_lsh(emb, dim=64, threshold=0.15, num_planes=6).collect()
        }
        rows = neardup_pairs_lsh(
            emb, dim=64, threshold=0.15, num_planes=6, num_tables=4
        ).collect()
        multi = {(r["id1"], r["id2"]): r["cosine"] for r in rows}
        assert len(rows) == len(multi)  # dedup happened
        assert set(one) <= set(multi)  # table 0 is the single-table family
        exact = {
            (r["id1"], r["id2"]): r["cosine"]
            for r in neardup_pairs_blocked(emb, threshold=0.15).collect()
        }
        assert set(multi) <= set(exact)
        for pair, cos in multi.items():
            assert cos == exact[pair]  # values stay oracle-exact


class TestLshTopkRecallLevers:
    def test_tables_and_multiprobe_lift_recall_values_exact(self, spark):
        """The two recall levers must strictly widen candidate coverage on
        the fixture while every surfaced cosine stays bit-identical to the
        brute-force score (approximation lives in recall, never values)."""
        from database_replicator_spark.operators.similarity import (
            lsh_topk_bucketed,
            topk_blas,
        )
        from database_replicator_spark.sources.catalog import load_table

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        q = emb.filter(F.col("vec_id") < 10)
        truth = {
            (r["query_id"], r["corpus_id"])
            for r in topk_blas(emb, q, k=10).collect()
        }
        base = {
            (r["query_id"], r["corpus_id"])
            for r in lsh_topk_bucketed(
                emb, q, dim=64, k=10, num_planes=6, num_tables=1,
                multiprobe=0,
            ).collect()
        }
        rows = lsh_topk_bucketed(
            emb, q, dim=64, k=10, num_planes=6, num_tables=4, multiprobe=1
        ).collect()
        lifted = {(r["query_id"], r["corpus_id"]) for r in rows}
        assert len(rows) == len(lifted)  # no duplicate pairs post-union
        r_base = len(base & truth) / len(truth)
        r_lift = len(lifted & truth) / len(truth)
        assert r_lift > r_base, (r_base, r_lift)
        assert r_lift >= 0.4, r_lift
        # value-exactness: surfaced cosines equal the exact BLAS scores
        exact_scores = {
            (r["query_id"], r["corpus_id"]): r["cosine"]
            for r in topk_blas(emb, q, k=10).collect()
        }
        for r in rows:
            key = (r["query_id"], r["corpus_id"])
            if key in exact_scores:
                assert r["cosine"] == exact_scores[key]


class TestCrossNeardupLsh:
    def test_matches_bruteforce_on_shared_buckets(self, spark):
        """Cross near-dup = corpus⋈bench restricted to shared buckets:
        every emitted pair must carry the exact cosine and clear the
        threshold; a planted copy of a bench vector must always surface
        (identical vectors share every bucket)."""
        from database_replicator_spark.operators.similarity import (
            cross_neardup_lsh,
        )
        from database_replicator_spark.sources.catalog import load_table

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
            "vec_id", "embedding"
        )
        bench = emb.filter(F.col("vec_id") % 20 == 0)
        # plant an exact copy of bench vector 0 under a fresh id
        v0 = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
        corpus = emb.unionByName(
            spark.createDataFrame([(99999, v0)], emb.schema)
        )
        out = cross_neardup_lsh(corpus, bench, dim=64, threshold=0.15)
        rows = {(r["corpus_id"], r["bench_id"]): r["cosine"] for r in out.collect()}
        assert (99999, 0) in rows and rows[(99999, 0)] == 1.0
        assert all(c >= 0.15 for c in rows.values())
        assert all(cid != bid for cid, bid in rows)


class TestProductQuantization:
    def _clustered(self, spark, n=240, dim=16, n_clusters=6, seed=5):
        import random

        rng = random.Random(seed)
        centers = [
            [rng.gauss(0, 1) for _ in range(dim)] for _ in range(n_clusters)
        ]
        rows = []
        for i in range(n):
            c = centers[i % n_clusters]
            rows.append((i, [v + rng.gauss(0, 0.05) for v in c]))
        return spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    def test_encode_deterministic_across_partitionings(self, spark):
        from database_replicator_spark.operators.similarity import (
            pq_encode,
            pq_train,
        )

        emb = self._clustered(spark)
        books = pq_train(emb, m=4, ksub=8, sample_size=240)
        a = {r["vid"]: list(r["codes"]) for r in pq_encode(emb, books).collect()}
        b = {
            r["vid"]: list(r["codes"])
            for r in pq_encode(emb.repartition(13), books).collect()
        }
        assert a == b
        assert all(len(c) == 4 for c in a.values())

    def test_adc_recall_on_clustered_corpus(self, spark):
        from pyspark.sql import functions as F

        from database_replicator_spark.operators.similarity import pq_topk, topk_blas

        emb = self._clustered(spark)
        queries = emb.filter(F.col("vec_id") < 12)
        truth = {
            (r["query_id"], r["corpus_id"])
            for r in topk_blas(emb, queries, k=10).collect()
        }
        # plain ADC: within a tight cluster every member shares codes, so
        # ADC cannot rank INSIDE the cluster — but it must never leave it
        plain = pq_topk(emb, queries, k=10, m=4, ksub=16).collect()
        for r in plain:
            assert r["corpus_id"] % 6 == r["query_id"] % 6
        # ADC + exact rerank (the production contract): candidate choice
        # approximate, ranking exact → recall recovers
        got = {
            (r["query_id"], r["corpus_id"])
            for r in pq_topk(emb, queries, k=10, m=4, ksub=16, rerank=40).collect()
        }
        recall = len(got & truth) / len(truth)
        assert recall >= 0.9

    def test_rerank_returns_exact_cosines(self, spark):
        from pyspark.sql import functions as F

        from database_replicator_spark.operators.similarity import pq_topk, topk_blas

        emb = self._clustered(spark)
        queries = emb.filter(F.col("vec_id") < 6)
        exact = {
            (r["query_id"], r["corpus_id"]): r["cosine"]
            for r in topk_blas(emb, queries, k=50).collect()
        }
        got = pq_topk(emb, queries, k=10, m=4, ksub=16, rerank=40).collect()
        for r in got:
            key = (r["query_id"], r["corpus_id"])
            assert key in exact
            assert abs(r["cosine"] - exact[key]) < 1e-9  # exact rescore


class TestIndexArtifacts:
    def test_persisted_quantizers_reproduce_results(self, spark, tmp_path):
        """Train → save → load → serve must equal train → serve for both
        IVF (centroids) and PQ (codebooks) — the train-once/serve-many
        index lifecycle."""
        import numpy as np

        from database_replicator_spark.operators.similarity import (
            ivf_topk,
            kmeans_centroids,
            load_index_artifact,
            pq_topk,
            pq_train,
            save_index_artifact,
        )
        from database_replicator_spark.sources.catalog import load_table

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        queries = emb.filter(F.col("vec_id") < 5)

        cent = kmeans_centroids(emb, nlist=8)
        books = pq_train(emb, m=8, ksub=16)
        path = str(tmp_path / "index")
        save_index_artifact(
            path, {"centroids": cent, "codebooks": books},
            meta={"nlist": 8, "m": 8, "ksub": 16},
        )
        arrays, meta = load_index_artifact(path)
        assert meta["nlist"] == 8
        np.testing.assert_array_equal(arrays["centroids"], cent)
        np.testing.assert_array_equal(arrays["codebooks"], books)

        def rows(df, score_col):
            return sorted(
                (r["query_id"], r["corpus_id"], r[score_col]) for r in df.collect()
            )

        direct = rows(
            ivf_topk(emb, queries, k=5, nlist=8, quantizer="kmeans"), "cosine"
        )
        served = rows(
            ivf_topk(emb, queries, k=5, nlist=8, centroids=arrays["centroids"]),
            "cosine",
        )
        assert direct == served

        pq_direct = rows(pq_topk(emb, queries, k=5, m=8, ksub=16), "score")
        pq_served = rows(
            pq_topk(emb, queries, k=5, codebooks=arrays["codebooks"]), "score"
        )
        assert pq_direct == pq_served


class TestDistributedKmeans:
    def test_partition_layout_invariance_exact(self, spark):
        import numpy as np

        from database_replicator_spark.operators.similarity import (
            kmeans_distributed,
        )
        from database_replicator_spark.sources.catalog import load_table

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        c1 = kmeans_distributed(emb.repartition(3), nlist=8, iters=4)
        c2 = kmeans_distributed(emb.repartition(13), nlist=8, iters=4)
        np.testing.assert_array_equal(c1, c2)

    def test_full_data_lloyd_beats_or_matches_sample_trainer(self, spark):
        """Training on ALL vectors must fit at least as well as the
        bounded-sample driver trainer (the reason the distributed path
        exists): compare mean best-centroid cosine over the corpus."""
        import numpy as np

        from database_replicator_spark.operators.similarity import (
            collect_unit_matrix,
            kmeans_centroids,
            kmeans_distributed,
        )
        from database_replicator_spark.sources.catalog import load_table

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        _ids, mat = collect_unit_matrix(emb, "vec_id", "embedding")

        def fit(cent):
            return float((mat @ np.asarray(cent).T).max(axis=1).mean())

        dist = kmeans_distributed(emb, nlist=8, iters=6)
        # sample trainer restricted to a small sample to expose the gap
        samp = kmeans_centroids(emb, nlist=8, sample_size=32, iters=6)
        assert fit(dist) >= fit(samp) - 1e-9


class TestEmbeddingSelection:
    def _clustered(self, spark, n=200, dim=16, n_clusters=5, seed=11):
        import random

        rng = random.Random(seed)
        centers = [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(n_clusters)]
        rows = []
        for i in range(n):
            c = centers[i % n_clusters]
            rows.append(
                (i, [v + rng.gauss(0, 0.05) for v in c], i % n_clusters)
            )
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label long"
        )

    def test_coverage_sample_prefilter_is_output_identical(self, spark):
        from database_replicator_spark.operators.similarity import coverage_sample

        emb = self._clustered(spark)
        plain = {
            (r["vec_id"], r["cid"], r["cell_rank"])
            for r in coverage_sample(emb, per_cell=7, nlist=8).collect()
        }
        pre = {
            (r["vec_id"], r["cid"], r["cell_rank"])
            for r in coverage_sample(
                emb.repartition(9), per_cell=7, nlist=8, prefilter_buckets=3
            ).collect()
        }
        assert plain == pre and len(plain) > 0

    def test_coverage_sample_bounds_and_seed_sensitivity(self, spark):
        from database_replicator_spark.operators.similarity import coverage_sample

        emb = self._clustered(spark)
        out = coverage_sample(emb, per_cell=5, nlist=8).collect()
        per_cell = {}
        for r in out:
            per_cell.setdefault(r["cid"], []).append(r["cell_rank"])
        assert all(len(v) <= 5 for v in per_cell.values())
        assert all(sorted(v) == list(range(1, len(v) + 1)) for v in per_cell.values())
        # hash-order selection: a different seed picks a different subset
        other = coverage_sample(emb, per_cell=5, nlist=8, seed=1).collect()
        assert {r["vec_id"] for r in out} != {r["vec_id"] for r in other}

    def test_coverage_sample_covers_sparse_cluster(self, spark):
        """A cluster holding 5% of the corpus still contributes per_cell
        rows — the property Bernoulli sampling lacks."""
        import random

        from pyspark.sql import functions as F

        from database_replicator_spark.operators.similarity import (
            coverage_sample,
            kmeans_centroids,
        )

        rng = random.Random(3)
        a = [1.0] + [0.0] * 15
        b = [0.0] * 15 + [1.0]
        rows = [(i, [v + rng.gauss(0, 0.03) for v in a]) for i in range(190)]
        rows += [(200 + i, [v + rng.gauss(0, 0.03) for v in b]) for i in range(10)]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        cent = kmeans_centroids(emb, nlist=2, sample_size=200)
        out = coverage_sample(emb, per_cell=8, centroids=cent).collect()
        sparse_kept = [r for r in out if r["vec_id"] >= 200]
        assert len(sparse_kept) == 8

    def test_hard_negatives_label_filter_before_cut(self, spark):
        from pyspark.sql import functions as F

        from database_replicator_spark.operators.similarity import hard_negatives

        emb = self._clustered(spark)
        queries = emb.filter(F.col("vec_id") < 5)
        out = hard_negatives(emb, queries, k=10).collect()
        qlab = {r["vec_id"]: r["label"] for r in queries.collect()}
        by_q = {}
        for r in out:
            assert r["neg_label"] != qlab[r["query_id"]]
            by_q.setdefault(r["query_id"], []).append(r)
        # plenty of other-label vectors exist -> full k delivered per query
        assert all(len(v) == 10 for v in by_q.values())

    def test_knn_label_vote_recovers_cluster_labels(self, spark):
        from pyspark.sql import functions as F

        from database_replicator_spark.operators.similarity import knn_label_vote

        emb = self._clustered(spark)
        queries = emb.filter(F.col("vec_id") < 15)
        out = knn_label_vote(emb, queries, k=10).collect()
        assert len(out) == 15
        for r in out:
            assert r["predicted_label"] == r["query_id"] % 5
            assert r["votes"] == 10


class TestIvfPq:
    def _clustered(self, spark, n=240, dim=16, n_clusters=6, seed=7):
        import random

        rng = random.Random(seed)
        centers = [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(n_clusters)]
        rows = []
        for i in range(n):
            c = centers[i % n_clusters]
            rows.append((i, [v + rng.gauss(0, 0.05) for v in c]))
        return spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    def test_served_from_persisted_index_identical(self, spark):
        from pyspark.sql import functions as F

        from database_replicator_spark.operators.similarity import (
            ivf_pq_topk,
            ivfpq_index,
            kmeans_centroids,
            pq_train,
        )

        emb = self._clustered(spark)
        queries = emb.filter(F.col("vec_id") < 6)
        cent = kmeans_centroids(emb, nlist=6, sample_size=240)
        books = pq_train(emb, m=4, ksub=16, sample_size=240)
        idx = ivfpq_index(emb, cent, books)
        direct = ivf_pq_topk(
            emb, queries, k=10, nprobe=2, centroids=cent, codebooks=books
        ).collect()
        served = ivf_pq_topk(
            emb, queries, k=10, nprobe=2, centroids=cent, codebooks=books, index=idx
        ).collect()
        key = lambda r: (r["query_id"], r["rank"], r["corpus_id"], r["score"])
        assert sorted(map(key, direct)) == sorted(map(key, served))
        assert len(direct) == 60

    def test_probed_cells_prune_candidates(self, spark):
        """Every returned neighbor must come from one of the query's
        nprobe probed cells — the IO bound that makes IVF+PQ the scale
        path."""
        import numpy as np
        from pyspark.sql import functions as F

        from database_replicator_spark.operators.similarity import (
            cell_assign,
            collect_unit_matrix,
            ivf_pq_topk,
            kmeans_centroids,
            pq_train,
        )

        emb = self._clustered(spark)
        queries = emb.filter(F.col("vec_id") < 6)
        cent = kmeans_centroids(emb, nlist=6, sample_size=240)
        books = pq_train(emb, m=4, ksub=16, sample_size=240)
        out = ivf_pq_topk(
            emb, queries, k=10, nprobe=2, centroids=cent, codebooks=books
        ).collect()
        cells = {r["vec_id"]: r["cid"] for r in cell_assign(emb, cent).collect()}
        qids, qmat = collect_unit_matrix(queries, "vec_id", "embedding")
        sims = np.round(qmat @ np.asarray(cent).T, 6)
        probed = {
            int(q): set(
                sorted(range(len(cent)), key=lambda c: (-sims[i, c], c))[:2]
            )
            for i, q in enumerate(qids)
        }
        for r in out:
            assert cells[r["corpus_id"]] in probed[r["query_id"]]

    def test_trained_path_stays_in_cluster(self, spark):
        from pyspark.sql import functions as F

        from database_replicator_spark.operators.similarity import ivf_pq_topk

        emb = self._clustered(spark)
        queries = emb.filter(F.col("vec_id") < 12)
        out = ivf_pq_topk(
            emb, queries, k=5, nlist=6, nprobe=1, m=4, ksub=16, quantizer="kmeans"
        ).collect()
        for r in out:
            assert r["corpus_id"] % 6 == r["query_id"] % 6


class TestEmbeddingOutliers:
    def test_planted_outlier_flagged(self, spark):
        import random

        from pyspark.sql import functions as F

        from database_replicator_spark.operators.similarity import (
            embedding_outliers,
            kmeans_centroids,
        )

        rng = random.Random(13)
        a = [1.0] + [0.0] * 15
        b = [0.0] * 8 + [1.0] + [0.0] * 7
        rows = [(i, [v + rng.gauss(0, 0.02) for v in (a if i % 2 else b)])
                for i in range(60)]
        rows.append((99, [0.0] * 15 + [1.0]))  # orthogonal to both modes
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        # fit on the inliers only — the curation scenario: the quantizer
        # describes the known corpus, new arrivals are scored against it
        cent = kmeans_centroids(
            emb.filter("vec_id < 60"), nlist=2, sample_size=60
        )
        out = {r["vec_id"]: r for r in
               embedding_outliers(emb, threshold=0.5, centroids=cent).collect()}
        assert out[99]["is_outlier"] is True
        inliers = [r for i, r in out.items() if i != 99]
        assert all(not r["is_outlier"] for r in inliers)
        assert len(out) == 61


class TestBlockingEditPairs:
    """Record linkage (round 10): blocking + thresholded Levenshtein."""

    def _pairs(self, spark, rows, **kw):
        from database_replicator_spark.operators.dedup import (
            blocking_edit_pairs,
        )

        df = spark.createDataFrame(rows, "doc_id long, text string")
        return sorted(
            tuple(r) for r in blocking_edit_pairs(df, **kw).collect()
        )

    def test_typo_pairs_found_with_exact_distance(self, spark):
        rows = [
            (1, "acme corporation ltd"),
            (2, "acme corporatian ltd"),   # 1 substitution
            (3, "acme corporation ltd."),  # 1 insertion
            (4, "acme corp holdings intl"),  # same block, distance > 2
            (5, "zenith corporation ltd"),   # different block
        ]
        got = self._pairs(spark, rows, max_distance=2)
        assert got == [(1, 2, 1), (1, 3, 1), (2, 3, 2)]

    def test_block_miss_is_the_documented_trade(self, spark):
        # a typo INSIDE the 8-char block key lands the records in
        # different blocks — blocking recall is bounded by key choice,
        # exactly like LSH band recall
        rows = [(1, "acme corporation"), (2, "acmi corporation")]
        assert self._pairs(spark, rows) == []
        # widening the block away from the typo recovers the pair
        assert self._pairs(spark, rows, block_len=2) == [(1, 2, 1)]

    def test_hot_block_cap(self, spark):
        rows = [(i, f"samepref variant {i}") for i in range(30)]
        rows += [(100, "uniq-blk one"), (101, "uniq-blk oni")]
        capped = self._pairs(spark, rows, max_block_size=10, max_distance=2)
        assert capped == [(100, 101, 1)]
        uncapped = self._pairs(spark, rows, max_block_size=None, max_distance=2)
        assert len(uncapped) > 1

    def test_normalization_shared_with_text_tiers(self, spark):
        rows = [(1, "  Acme   CORP  "), (2, "acme corp")]
        assert self._pairs(spark, rows) == [(1, 2, 0)]


class TestContainmentPairs:
    """Asymmetric near-dup (r12): containment catches what Jaccard
    structurally misses — the design reason the operator exists."""

    def test_quote_inside_long_doc_jaccard_misses_containment_catches(
        self, spark
    ):
        from database_replicator_spark.operators.dedup import (
            containment_pairs,
            doc_shingles,
            jaccard_pairs,
        )

        quote = " ".join(f"q{i}" for i in range(12))
        longdoc = quote + " " + " ".join(f"w{i}" for i in range(140))
        docs = spark.createDataFrame(
            [(1, quote), (2, longdoc), (3, "unrelated words only here")],
            "doc_id long, text string",
        )
        sh = doc_shingles(docs)
        jac = jaccard_pairs(sh, threshold=0.2).select("doc1", "doc2")
        assert jac.count() == 0  # symmetric tier is blind to the quote
        cont = {
            (r["doc1"], r["doc2"]): r["containment_permille"]
            for r in containment_pairs(sh, threshold=0.9).collect()
        }
        assert set(cont) == {(1, 2)}
        assert cont[(1, 2)] == 1000  # every quote shingle is contained

    def test_threshold_is_integer_exact(self, spark):
        from database_replicator_spark.operators.dedup import (
            containment_pairs,
            doc_shingles,
        )

        # overlap 3 of min-size 5 = 0.6 exactly: must be INCLUDED at
        # threshold 0.6 (>= on the exact rational, no float rounding)
        a = "s1 s2 s3 s4 s5 s6 s7"          # 5 shingles
        b = "s1 s2 s3 s4 s5 x1 x2 x3 x4 x5 x6 x7 x8 x9"  # shares 3
        docs = spark.createDataFrame(
            [(1, a), (2, b)], "doc_id long, text string"
        )
        sh = doc_shingles(docs)
        rows = containment_pairs(sh, threshold=0.6).collect()
        assert len(rows) == 1 and rows[0]["containment_permille"] == 600
        assert containment_pairs(sh, threshold=0.601).count() == 0


class TestPostingsCandidates:
    """Prefix-filtered containment candidate generation (r12 verdict #1):
    complete for the threshold, hot-shingle-capped with logged drops."""

    def _docs(self, spark):
        import random

        rng = random.Random(13)
        quote = " ".join(f"q{i}" for i in range(12))
        rows = [(1, quote), (2, quote + " " + " ".join(f"w{i}" for i in range(60)))]
        # background docs sharing a HOT boilerplate shingle run
        boiler = "the quick brown fox jumps over lazy dogs"
        for d in range(3, 40):
            words = " ".join(f"t{d}_{j}" for j in range(rng.randint(8, 20)))
            rows.append((d, boiler + " " + words))
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_candidates_are_complete_for_threshold(self, spark):
        from database_replicator_spark.operators.dedup import (
            containment_pairs,
            doc_shingles,
            postings_candidates,
        )

        sh = doc_shingles(self._docs(spark))
        # ground truth from the exhaustive branch
        want = {
            (r["doc1"], r["doc2"])
            for r in containment_pairs(sh, threshold=0.6).collect()
        }
        cand = postings_candidates(sh, threshold=0.6)
        got = {
            (r["doc1"], r["doc2"])
            for r in containment_pairs(
                sh, candidates=cand, threshold=0.6
            ).collect()
        }
        assert want and got == want

    def test_exact_values_match_exhaustive_branch(self, spark):
        from database_replicator_spark.operators.dedup import (
            containment_pairs,
            doc_shingles,
            postings_candidates,
        )

        sh = doc_shingles(self._docs(spark))
        key = lambda r: (r["doc1"], r["doc2"])
        want = {
            key(r): (r["inter"], r["n1"], r["n2"], r["containment_permille"])
            for r in containment_pairs(sh, threshold=0.6).collect()
        }
        got = {
            key(r): (r["inter"], r["n1"], r["n2"], r["containment_permille"])
            for r in containment_pairs(
                sh,
                candidates=postings_candidates(sh, threshold=0.6),
                threshold=0.6,
            ).collect()
        }
        assert got == want

    def test_df_cap_drops_hot_shingles_and_logs(self, spark, caplog):
        import logging

        from database_replicator_spark.operators.dedup import (
            doc_shingles,
            postings_candidates,
        )

        sh = doc_shingles(self._docs(spark))
        with caplog.at_level(
            logging.WARNING, logger="database_replicator_spark.operators.dedup"
        ):
            capped = postings_candidates(sh, threshold=0.6, df_cap=5)
            n_capped = capped.count()
        assert any("df_cap" in r.message for r in caplog.records)
        # the boilerplate-only background pairs vanish; the quote pair
        # (rare shingles) survives the cap
        uncapped = postings_candidates(sh, threshold=0.6)
        assert n_capped < uncapped.count()
        assert (1, 2) in {
            (r["doc1"], r["doc2"]) for r in capped.collect()
        }

    def test_rejects_bad_threshold(self, spark):
        from database_replicator_spark.operators.dedup import (
            doc_shingles,
            postings_candidates,
        )

        sh = doc_shingles(self._docs(spark))
        with pytest.raises(ValueError, match="threshold"):
            postings_candidates(sh, threshold=0.0)
