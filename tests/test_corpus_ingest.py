"""Streaming corpus-ingestion lifecycle: quality gate → within-batch
dedup → against-corpus dedup → idempotent epoch appends
(streaming/corpus_ingest.py)."""

import json
import os

import pytest

from database_replicator_spark.streaming.corpus_ingest import (
    read_corpus,
    start_corpus_ingest,
)

GOOD = (
    "the quick brown fox jumps over a lazy dog and it runs on for "
    "quite a while with plenty of variety in the words it uses"
)
GOOD2 = (
    "a different document about the state of databases and the many "
    "ways in which they replicate data for analytical workloads"
)
LOW_QUALITY = "tiny"  # < 10 tokens -> too_short


@pytest.fixture()
def dirs(tmp_path):
    return {
        "src": str(tmp_path / "queue"),
        "tgt": str(tmp_path / "corpus_out"),
        "chk": str(tmp_path / "chk"),
    }


def _write(path, docs):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as fh:
        for d in docs:
            fh.write(json.dumps(d) + "\n")


def _run_once(spark, dirs):
    q, ing = start_corpus_ingest(spark, dirs["src"], dirs["tgt"], dirs["chk"], once=True)
    q.awaitTermination(120)
    return ing


def _doc(i, text, lang="en", source="cc"):
    return {"doc_id": i, "text": text, "lang": lang, "source": source}


class TestCorpusIngest:
    def test_gauntlet_and_cross_epoch_dedup(self, spark, dirs):
        # epoch 1: a good doc, a within-batch duplicate of it, a low-quality doc
        _write(
            os.path.join(dirs["src"], "b1.json"),
            [_doc(1, GOOD), _doc(2, GOOD), _doc(3, LOW_QUALITY)],
        )
        _run_once(spark, dirs)
        corpus = read_corpus(spark, dirs["tgt"])
        assert {r["doc_id"] for r in corpus.collect()} == {1}  # min-id survivor

        stats_p = os.path.join(dirs["tgt"], "_ingest_stats")
        s1 = spark.read.parquet(os.path.join(stats_p, "epoch=0")).collect()[0]
        assert (
            s1["n_in"],
            s1["n_quality_rejected"],
            s1["n_dup_in_batch"],
            s1["n_dup_vs_corpus"],
            s1["n_accepted"],
        ) == (3, 1, 1, 0, 1)

        # epoch 2: a re-crawl of the accepted doc (cross-epoch dup) + a new doc
        _write(
            os.path.join(dirs["src"], "b2.json"),
            [_doc(10, GOOD), _doc(11, GOOD2)],
        )
        _run_once(spark, dirs)
        corpus = read_corpus(spark, dirs["tgt"])
        assert {r["doc_id"] for r in corpus.collect()} == {1, 11}
        epochs = {r["epoch"] for r in corpus.select("epoch").collect()}
        assert epochs == {0, 1}

    def test_near_dup_tier_rejects_band_collisions(self, spark, dirs):
        # epoch 1 accepts GOOD; epoch 2 brings a near-identical variant
        # (one word changed) and an unrelated doc — with near_dup on, the
        # variant band-collides with the accepted doc and is rejected
        near = GOOD.replace("lazy", "sleepy")

        def run():
            q, ing = start_corpus_ingest(
                spark, dirs["src"], dirs["tgt"], dirs["chk"], once=True, near_dup=True
            )
            q.awaitTermination(120)
            return ing

        _write(os.path.join(dirs["src"], "b1.json"), [_doc(1, GOOD)])
        run()
        _write(os.path.join(dirs["src"], "b2.json"), [_doc(20, near), _doc(21, GOOD2)])
        run()
        corpus = read_corpus(spark, dirs["tgt"])
        assert {r["doc_id"] for r in corpus.collect()} == {1, 21}
        s2 = spark.read.parquet(
            os.path.join(dirs["tgt"], "_ingest_stats", "epoch=1")
        ).collect()[0]
        assert s2["n_neardup_vs_corpus"] == 1 and s2["n_accepted"] == 1

    def test_verified_jaccard_accepts_low_overlap_collision(self, spark, dirs):
        """Band collision only NOMINATES when verify_jaccard is set: the
        one-word variant band-collides with the accepted doc (the plain
        near_dup tier rejects it — test above) but its true shingle
        Jaccard ≈ 0.76 sits below a 0.9 threshold, so the verified tier
        re-reads the colliding accepted doc and lets it through."""
        near = GOOD.replace("lazy", "sleepy")

        def run():
            q, ing = start_corpus_ingest(
                spark,
                dirs["src"],
                dirs["tgt"],
                dirs["chk"],
                once=True,
                near_dup=True,
                verify_jaccard=0.9,
            )
            q.awaitTermination(120)
            return ing

        _write(os.path.join(dirs["src"], "b1.json"), [_doc(1, GOOD)])
        run()
        _write(os.path.join(dirs["src"], "b2.json"), [_doc(20, near)])
        run()
        assert {r["doc_id"] for r in read_corpus(spark, dirs["tgt"]).collect()} == {1, 20}
        s2 = spark.read.parquet(
            os.path.join(dirs["tgt"], "_ingest_stats", "epoch=1")
        ).collect()[0]
        assert s2["n_neardup_vs_corpus"] == 0 and s2["n_accepted"] == 1

    def test_verified_jaccard_still_rejects_true_neardups(self, spark, dirs):
        """Same collision, threshold below the true Jaccard: the verified
        tier must keep rejecting genuine near-duplicates."""
        near = GOOD.replace("lazy", "sleepy")

        def run():
            q, ing = start_corpus_ingest(
                spark,
                dirs["src"],
                dirs["tgt"],
                dirs["chk"],
                once=True,
                near_dup=True,
                verify_jaccard=0.5,
            )
            q.awaitTermination(120)
            return ing

        _write(os.path.join(dirs["src"], "b1.json"), [_doc(1, GOOD)])
        run()
        _write(os.path.join(dirs["src"], "b2.json"), [_doc(20, near), _doc(21, GOOD2)])
        run()
        assert {r["doc_id"] for r in read_corpus(spark, dirs["tgt"]).collect()} == {1, 21}
        s2 = spark.read.parquet(
            os.path.join(dirs["tgt"], "_ingest_stats", "epoch=1")
        ).collect()[0]
        assert s2["n_neardup_vs_corpus"] == 1 and s2["n_accepted"] == 1

    def test_compaction_preserves_rejection_behavior(self, spark, dirs):
        from database_replicator_spark.streaming.corpus_ingest import (
            compact_ingest_indexes,
        )

        _write(os.path.join(dirs["src"], "b1.json"), [_doc(1, GOOD)])
        _run_once(spark, dirs)
        compact_ingest_indexes(spark, dirs["tgt"])
        fp_dir = os.path.join(dirs["tgt"], "_fingerprints")
        assert sorted(d for d in os.listdir(fp_dir) if d.startswith("epoch=")) == ["epoch=0"]
        # a post-compaction re-crawl of the accepted doc is still rejected
        _write(os.path.join(dirs["src"], "b2.json"), [_doc(30, GOOD), _doc(31, GOOD2)])
        _run_once(spark, dirs)
        assert {r["doc_id"] for r in read_corpus(spark, dirs["tgt"]).collect()} == {1, 31}

    def test_restart_without_new_data_is_noop(self, spark, dirs):
        _write(os.path.join(dirs["src"], "b1.json"), [_doc(1, GOOD)])
        _run_once(spark, dirs)
        ing2 = _run_once(spark, dirs)
        assert ing2.applied_batches == []
        assert read_corpus(spark, dirs["tgt"]).count() == 1


class TestForgetDocuments:
    def test_forget_erases_doc_and_derived_rows(self, spark, dirs):
        from database_replicator_spark.streaming.corpus_ingest import (
            CorpusIngestor,
            forget_documents,
            read_corpus,
        )

        ing = CorpusIngestor(target_dir=dirs["tgt"], near_dup=True)
        mk = lambda i, t: spark.createDataFrame(  # noqa: E731
            [(i, t, "en", "cc")], "doc_id long, text string, lang string, source string"
        )
        ing.ingest_batch(mk(1, GOOD), 0)
        ing.ingest_batch(mk(2, GOOD2), 1)
        rep = forget_documents(spark, dirs["tgt"], [1])
        assert rep["corpus"] == 1
        assert rep["_fingerprints"] == 1
        assert rep["_signatures"] >= 1
        assert {r["doc_id"] for r in read_corpus(spark, dirs["tgt"]).collect()} == {2}
        # erasure (not suppression): the same text is admissible again
        ing.ingest_batch(mk(10, GOOD), 2)
        assert {r["doc_id"] for r in read_corpus(spark, dirs["tgt"]).collect()} == {2, 10}

    def test_forget_unknown_id_is_noop(self, spark, dirs):
        from database_replicator_spark.streaming.corpus_ingest import (
            CorpusIngestor,
            forget_documents,
            read_corpus,
        )

        ing = CorpusIngestor(target_dir=dirs["tgt"])
        ing.ingest_batch(
            spark.createDataFrame(
                [(1, GOOD, "en", "cc")],
                "doc_id long, text string, lang string, source string",
            ),
            0,
        )
        rep = forget_documents(spark, dirs["tgt"], [999])
        assert rep == {
            "corpus": 0, "_fingerprints": 0, "_signatures": 0,
            "_term_tf": 0, "_doc_len": 0,
        }
        assert read_corpus(spark, dirs["tgt"]).count() == 1


class TestForgetCompactInteraction:
    def test_erasure_survives_index_compaction(self, spark, dirs):
        """forget → compact must not resurrect the erased doc in ANY
        surface (corpus, fingerprint index, signature index), and the
        forgotten content stays admissible after compaction."""
        from database_replicator_spark.streaming.corpus_ingest import (
            CorpusIngestor,
            compact_ingest_indexes,
            forget_documents,
            read_corpus,
        )

        ing = CorpusIngestor(target_dir=dirs["tgt"], near_dup=True)
        mk = lambda i, t: spark.createDataFrame(  # noqa: E731
            [(i, t, "en", "cc")],
            "doc_id long, text string, lang string, source string",
        )
        ing.ingest_batch(mk(1, GOOD), 0)
        ing.ingest_batch(mk(2, GOOD2), 1)
        forget_documents(spark, dirs["tgt"], [1])
        compact_ingest_indexes(spark, dirs["tgt"])
        assert {r["doc_id"] for r in read_corpus(spark, dirs["tgt"]).collect()} == {2}

        # post-compaction: the forgotten text is admissible, a dup of the
        # SURVIVING doc is still rejected
        ing2 = CorpusIngestor(target_dir=dirs["tgt"], near_dup=True)
        ing2.ingest_batch(mk(10, GOOD), 2)
        ing2.ingest_batch(mk(11, GOOD2), 3)  # exact dup of doc 2 → rejected
        got = {r["doc_id"] for r in read_corpus(spark, dirs["tgt"]).collect()}
        assert got == {2, 10}


class TestCorpusIngestMonitoring:
    def test_per_tier_counters_over_three_epochs(self, spark, dirs):
        """The lexical twin of the embedding monitoring test: per-epoch
        _ingest_stats rows carry seconds and roll up via ingest_status
        (VERDICT r5 #9 — ST7-style lag monitoring for the corpus path)."""
        from database_replicator_spark.streaming.corpus_ingest import (
            ingest_status,
        )

        # epoch 0: good + within-batch dup + low quality
        _write(
            os.path.join(dirs["src"], "b1.json"),
            [_doc(1, GOOD), _doc(2, GOOD), _doc(3, LOW_QUALITY)],
        )
        _run_once(spark, dirs)
        # epoch 1: cross-epoch dup + fresh
        _write(
            os.path.join(dirs["src"], "b2.json"),
            [_doc(10, GOOD), _doc(11, GOOD2)],
        )
        _run_once(spark, dirs)
        # epoch 2: fresh only
        _write(
            os.path.join(dirs["src"], "b3.json"),
            [_doc(20, GOOD2 + " extended with some additional trailing words")],
        )
        _run_once(spark, dirs)

        st = ingest_status(spark, dirs["tgt"])
        assert st["epochs"] == 3
        t = st["totals"]
        assert t["n_in"] == 6
        assert t["n_quality_rejected"] == 1
        assert t["n_dup_in_batch"] == 1
        assert t["n_dup_vs_corpus"] == 1
        assert t["n_accepted"] == 3
        assert t["seconds"] > 0
        assert st["last_epoch"]["n_accepted"] == 1

    def test_status_on_empty_and_mixed_schema_stats(self, spark, dirs, tmp_path):
        """ingest_status must survive two degenerate layouts (r6 advisor):
        a stats dir that exists with zero rows (crash between mkdir and
        write), and epochs written before the 'seconds' column existed
        (schema-merged read, missing counters sum as 0)."""
        from database_replicator_spark.streaming.corpus_ingest import (
            ingest_status,
        )

        # empty dir → empty status, not AttributeError
        tgt = str(tmp_path / "t1")
        os.makedirs(os.path.join(tgt, "_ingest_stats"))
        assert ingest_status(spark, tgt) == {
            "epochs": 0, "totals": {}, "last_epoch": None,
        }

        # epoch 0 written WITHOUT seconds (old layout), epoch 1 with it
        tgt2 = str(tmp_path / "t2")
        stats = os.path.join(tgt2, "_ingest_stats")
        spark.createDataFrame(
            [(5, 1, 0, 0, 0, 4)],
            "n_in long, n_quality_rejected long, n_dup_in_batch long, "
            "n_dup_vs_corpus long, n_neardup_vs_corpus long, n_accepted long",
        ).write.parquet(os.path.join(stats, "epoch=0"))
        spark.createDataFrame(
            [(3, 0, 0, 0, 0, 3, 0.25)],
            "n_in long, n_quality_rejected long, n_dup_in_batch long, "
            "n_dup_vs_corpus long, n_neardup_vs_corpus long, n_accepted long, "
            "seconds double",
        ).write.parquet(os.path.join(stats, "epoch=1"))
        st = ingest_status(spark, tgt2)
        assert st["epochs"] == 2
        assert st["totals"]["n_in"] == 8
        assert st["totals"]["seconds"] == 0.25  # old epoch contributes 0
        assert st["last_epoch"]["n_accepted"] == 3


class TestTermStatsMaintenance:
    def _run_once_ts(self, spark, dirs):
        q, ing = start_corpus_ingest(
            spark, dirs["src"], dirs["tgt"], dirs["chk"],
            once=True, maintain_term_stats=True,
        )
        q.awaitTermination(120)
        return ing

    def test_incremental_equals_batch_over_epochs(self, spark, dirs):
        """The maintained (tf, dl) index after a multi-epoch ingest —
        with a quality reject, a within-batch dup, and a cross-epoch dup
        along the way — must equal term_stats() built from scratch over
        the accepted corpus (VERDICT r8 #6)."""
        from database_replicator_spark.operators.retrieval import term_stats
        from database_replicator_spark.streaming.corpus_ingest import (
            read_term_stats,
        )

        _write(
            os.path.join(dirs["src"], "b1.json"),
            [_doc(1, GOOD), _doc(2, GOOD), _doc(3, LOW_QUALITY)],
        )
        self._run_once_ts(spark, dirs)
        _write(
            os.path.join(dirs["src"], "b2.json"),
            [_doc(10, GOOD), _doc(11, GOOD2)],
        )
        self._run_once_ts(spark, dirs)

        corpus = read_corpus(spark, dirs["tgt"])
        tf_b, dl_b = term_stats(corpus)
        tf_i, dl_i = read_term_stats(spark, dirs["tgt"])
        assert sorted(map(tuple, tf_i.collect())) == sorted(
            map(tuple, tf_b.collect())
        )
        assert sorted(map(tuple, dl_i.collect())) == sorted(
            map(tuple, dl_b.collect())
        )
        assert dl_i.count() == 2  # docs 1 and 11 accepted

    def test_ingest_then_retrieve_e2e(self, spark, dirs):
        """Freshly ingested docs must be retrievable through the
        maintained index without re-tokenizing the corpus, and the
        ranking must equal the batch-built stats path."""
        from database_replicator_spark.operators.retrieval import bm25_topk
        from database_replicator_spark.streaming.corpus_ingest import (
            read_term_stats,
        )

        _write(os.path.join(dirs["src"], "b1.json"), [_doc(1, GOOD)])
        self._run_once_ts(spark, dirs)
        _write(os.path.join(dirs["src"], "b2.json"), [_doc(11, GOOD2)])
        self._run_once_ts(spark, dirs)

        corpus = read_corpus(spark, dirs["tgt"])
        qterms = spark.createDataFrame(
            [(0, "databases"), (0, "replicate"), (1, "fox")],
            "query_id bigint, term string",
        )
        stats = read_term_stats(spark, dirs["tgt"])
        inc = sorted(
            map(tuple, bm25_topk(corpus, qterms, k=5, stats=stats).collect())
        )
        batch = sorted(map(tuple, bm25_topk(corpus, qterms, k=5).collect()))
        assert inc == batch
        # doc 11 (epoch 2) answers the 'databases' query — fresh docs
        # ARE in the index
        assert any(r[0] == 0 and r[1] == 11 for r in inc)
        assert any(r[0] == 1 and r[1] == 1 for r in inc)

    def test_forget_and_compaction_keep_index_consistent(self, spark, dirs):
        """forget_documents must erase the doc's tf/dl rows (so it stops
        ranking), and compact_ingest_indexes must preserve the maintained
        index exactly while collapsing to one partition."""
        from database_replicator_spark.operators.retrieval import term_stats
        from database_replicator_spark.streaming.corpus_ingest import (
            compact_ingest_indexes,
            forget_documents,
            read_term_stats,
        )

        _write(
            os.path.join(dirs["src"], "b1.json"),
            [_doc(1, GOOD), _doc(11, GOOD2)],
        )
        self._run_once_ts(spark, dirs)
        rep = forget_documents(spark, dirs["tgt"], [1])
        assert rep["_term_tf"] > 0 and rep["_doc_len"] == 1
        tf_i, dl_i = read_term_stats(spark, dirs["tgt"])
        assert {r["doc_id"] for r in dl_i.collect()} == {11}
        assert tf_i.filter("doc_id = 1").count() == 0
        before_tf = sorted(map(tuple, tf_i.collect()))
        compact_ingest_indexes(spark, dirs["tgt"])
        tf_c, dl_c = read_term_stats(spark, dirs["tgt"])
        assert sorted(map(tuple, tf_c.collect())) == before_tf
        # and the compacted index still equals the batch build
        tf_b, dl_b = term_stats(read_corpus(spark, dirs["tgt"]))
        assert sorted(map(tuple, dl_c.collect())) == sorted(
            map(tuple, dl_b.collect())
        )

    def test_compact_then_forget_still_erases(self, spark, dirs):
        """The reverse order of the erasure/compaction interaction test:
        compaction collapses every index into epoch=0 while the corpus
        keeps its layout, so forget must also sweep epoch=0 or the
        'erased' doc keeps ranking (r9 review finding — applies to
        fingerprints and signatures too, not just the new term stats)."""
        from database_replicator_spark.operators.textops import (
            fingerprint_expr,
        )
        from database_replicator_spark.streaming.corpus_ingest import (
            compact_ingest_indexes,
            forget_documents,
            read_term_stats,
        )
        from pyspark.sql import functions as F

        _write(
            os.path.join(dirs["src"], "b1.json"),
            [_doc(1, GOOD), _doc(11, GOOD2)],
        )
        self._run_once_ts(spark, dirs)
        compact_ingest_indexes(spark, dirs["tgt"])
        rep = forget_documents(spark, dirs["tgt"], [1])
        assert rep["corpus"] == 1
        assert rep["_term_tf"] > 0 and rep["_doc_len"] == 1
        assert rep["_fingerprints"] == 1
        tf_i, dl_i = read_term_stats(spark, dirs["tgt"])
        assert {r["doc_id"] for r in dl_i.collect()} == {11}
        assert tf_i.filter("doc_id = 1").count() == 0
        # the forgotten doc's fingerprint is gone from the compacted
        # index: re-ingesting the same text is ADMITTED again (erasure
        # semantics), which only works if epoch=0 was actually rewritten
        fp_path = os.path.join(dirs["tgt"], "_fingerprints")
        fps = spark.read.option("basePath", fp_path).parquet(fp_path)
        doomed = spark.createDataFrame(
            [(GOOD,)], "text string"
        ).select(fingerprint_expr(F.col("text")).alias("fingerprint"))
        assert fps.join(doomed, on="fingerprint").count() == 0

    def test_read_term_stats_missing_raises(self, spark, dirs):
        import pytest as _pytest

        from database_replicator_spark.streaming.corpus_ingest import (
            read_term_stats,
        )

        _write(os.path.join(dirs["src"], "b1.json"), [_doc(1, GOOD)])
        _run_once(spark, dirs)  # WITHOUT maintain_term_stats
        with _pytest.raises(FileNotFoundError):
            read_term_stats(spark, dirs["tgt"])
