"""Focused equivalence tests for the round-13 optimization internals:

* ``dl_from_tf`` — document lengths derived from the (doc, term, tf)
  relation must equal a direct token count over the raw explode (the
  single-explode term_stats restructure).
* tf-derived hashed features — the hybrid RAG gate now computes
  w(doc, bucket) = Σ_terms tf·sign(term) from tf instead of
  Σ_tokens sign(tok) from a second corpus explode; both forms must
  produce identical integers.
* ``jaccard_pairs`` cache hygiene — the candidate-bounded caches a call
  marks are unpersisted when the NEXT call enters, so long-lived
  sessions do not accumulate storage across gate calls.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _toy_docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox"),
        (3, "pack my box with five dozen liquor jugs"),
        (4, "the the the repeated token document"),
        (5, ""),  # empty doc: one '' token in both constructions
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dl_from_tf_matches_direct_token_count(spark):
    from database_replicator_spark.operators.retrieval import (
        dl_from_tf,
        doc_tokens,
        term_stats,
    )

    docs = _toy_docs(spark)
    tf, dl = term_stats(docs)
    direct = (
        doc_tokens(docs)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("dl"))
    )
    got = {r["doc_id"]: r["dl"] for r in dl_from_tf(tf).collect()}
    want = {r["doc_id"]: r["dl"] for r in direct.collect()}
    assert got == want
    # and term_stats' own dl is the same construction
    assert {r["doc_id"]: r["dl"] for r in dl.collect()} == want


def test_hashed_features_from_tf_match_per_token_form(spark):
    """w(doc, bucket) = Σ_tokens sign(tok) == Σ_terms tf·sign(term)."""
    from database_replicator_spark.functions.hashing import (
        hash60,
        hash60_tail,
    )
    from database_replicator_spark.operators.retrieval import term_stats
    from database_replicator_spark.queries_r13 import _hashed_feats

    dim = 16
    # normalized text (lowercase, single spaces) so tokens_expr and
    # doc_tokens tokenize identically, as chunk_text guarantees
    docs = _toy_docs(spark)
    per_token = {
        (r["doc_id"], r["bucket"]): r["w"]
        for r in _hashed_feats(docs, "doc_id", "text").collect()
    }

    tf, _ = term_stats(docs)
    from_tf = (
        tf.select(
            "doc_id",
            F.pmod(hash60(F.col("term")), F.lit(dim)).alias("bucket"),
            (
                (F.pmod(hash60_tail(F.col("term")), F.lit(2)) * 2 - 1)
                * F.col("tf")
            ).alias("w"),
        )
        .groupBy("doc_id", "bucket")
        .agg(F.sum("w").alias("w"))
        .filter(F.col("w") != 0)
    )
    got = {(r["doc_id"], r["bucket"]): r["w"] for r in from_tf.collect()}
    assert got == per_token


def test_jaccard_pairs_unpersists_previous_call_caches(spark):
    from database_replicator_spark.operators import dedup

    sh = spark.createDataFrame(
        [(1, "ab"), (1, "bc"), (2, "ab"), (2, "bc"), (3, "zz")],
        "doc_id long, shingle string",
    )
    out1 = dedup.jaccard_pairs(sh)
    out1.collect()
    first_call_caches = list(dedup._JP_CACHED)
    assert first_call_caches, "all-pairs branch should register its cache"
    assert all(df.storageLevel.useMemory for df in first_call_caches)

    # second call over a DIFFERENT input plan (the cache manager matches
    # by canonicalized plan, so re-caching the same plan would re-mark
    # the first call's entries and mask the unpersist)
    sh2 = spark.createDataFrame(
        [(7, "xy"), (8, "xy"), (9, "qq")], "doc_id long, shingle string"
    )
    out2 = dedup.jaccard_pairs(sh2)
    out2.collect()
    # previous call's marks dropped on entry; new call registered its own
    assert all(
        not df.storageLevel.useMemory for df in first_call_caches
    ), "previous call's caches must be unpersisted on re-entry"
    assert dedup._JP_CACHED and dedup._JP_CACHED != first_call_caches
    # and the first call's results are recomputable regardless (pure
    # recompute, no shared state)
    assert sorted(map(tuple, out1.collect())) == sorted(
        map(tuple, dedup.jaccard_pairs(sh).collect())
    )
    # leave the module state clean for other tests
    while dedup._JP_CACHED:
        dedup._JP_CACHED.pop().unpersist(blocking=False)
