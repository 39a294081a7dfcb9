"""Document-normalization and text-op tests.

The doc_json cases port the reference's type-conversion matrices
(sqlite/converter.rs:459-737, mysql/converter.rs:291-362,
mongodb/converter.rs:283-393 — re-expressed, not copied) including the
sharp corners called out in SURVEY.md §7: NaN/Inf, empty blob, non-UTF-8
bytes, unicode text.
"""

import json

import pytest
from pyspark.sql import functions as F

from database_replicator_spark.functions import doc_json as J
from database_replicator_spark.operators.documents import (
    extract_document_id,
    is_column_unique,
    to_document_table,
)
from database_replicator_spark.operators.textops import (
    fingerprint_expr,
    lang_id_expr,
    normalize_text_expr,
    token_count_expr,
)


def _one(spark, col, schema, value):
    df = spark.createDataFrame([(value,)], schema)
    return df.select(col(F.col(df.columns[0])).alias("j")).collect()[0]["j"]


class TestTypeTaggedJson:
    def test_integer_and_null(self, spark):
        assert _one(spark, J.json_number, "v long", 42) == "42"
        assert _one(spark, J.json_number, "v long", None) == "null"

    def test_real_finite_nan_inf(self, spark):
        assert _one(spark, J.json_real, "v double", 1.5) == "1.5"
        assert _one(spark, J.json_real, "v double", float("nan")) == '"NaN"'
        assert _one(spark, J.json_real, "v double", float("inf")) == '"inf"'
        assert _one(spark, J.json_real, "v double", float("-inf")) == '"-inf"'

    def test_string_escaping_and_unicode(self, spark):
        out = _one(spark, J.json_string, "v string", 'he said "hi" \\ 日本語')
        assert json.loads(out) == 'he said "hi" \\ 日本語'

    def test_blob_base64_and_empty_blob(self, spark):
        out = _one(spark, J.json_blob, "v binary", b"Hello")
        assert json.loads(out) == {"_type": "blob", "data": "SGVsbG8="}
        out = _one(spark, J.json_blob, "v binary", b"")
        assert json.loads(out) == {"_type": "blob", "data": ""}

    def test_mysql_bytes_utf8_vs_binary(self, spark):
        out = _one(spark, J.json_mysql_bytes, "v binary", "héllo".encode())
        assert json.loads(out) == "héllo"
        out = _one(spark, J.json_mysql_bytes, "v binary", b"\xff\xfe\x01")
        assert json.loads(out) == {"_type": "binary", "data": "//4B"}

    def test_mysql_datetime(self, spark):
        out = _one(spark, J.json_mysql_datetime, "v string", "2024-03-05 10:20:30.000045")
        assert json.loads(out) == {
            "_type": "datetime",
            "value": "2024-03-05T10:20:30.000045Z",
        }

    def test_mysql_time(self, spark):
        df = spark.createDataFrame([(93784,), (-3661,)], "secs long")
        rows = df.select(J.json_mysql_time(F.col("secs")).alias("j")).collect()
        assert json.loads(rows[0]["j"]) == {"_type": "time", "value": "1d 02:03:04.000000"}
        assert json.loads(rows[1]["j"]) == {"_type": "time", "value": "-0d 01:01:01.000000"}

    def test_bson_encoders(self, spark):
        df = spark.createDataFrame(
            [("507F1F77BCF86CD799439011", "2024-01-01 00:00:00", b"\x01\x02", "pat.*", "i")],
            "oid string, ts string, bin binary, pat string, opts string",
        )
        row = df.select(
            J.json_bson_objectid(F.col("oid")).alias("a"),
            J.json_bson_datetime(F.col("ts")).alias("b"),
            J.json_bson_binary(F.col("bin"), F.lit(0)).alias("c"),
            J.json_bson_regex(F.col("pat"), F.col("opts")).alias("d"),
            J.json_bson_timestamp(F.lit(7), F.lit(2)).alias("e"),
            J.json_minkey().alias("f"),
            J.json_maxkey().alias("g"),
        ).collect()[0]
        assert json.loads(row["a"]) == {"_type": "objectid", "$oid": "507f1f77bcf86cd799439011"}
        assert json.loads(row["b"]) == {"_type": "datetime", "$date": 1704067200000}
        assert json.loads(row["c"]) == {"_type": "binary", "subtype": 0, "data": "AQI="}
        assert json.loads(row["d"]) == {"_type": "regex", "pattern": "pat.*", "options": "i"}
        assert json.loads(row["e"]) == {"_type": "timestamp", "t": 7, "i": 2}
        assert json.loads(row["f"]) == {"_type": "minkey"}
        assert json.loads(row["g"]) == {"_type": "maxkey"}

    def test_object_assembly_valid_json(self, spark):
        df = spark.createDataFrame([(1, "x", None)], "a long, b string, c string")
        obj = J.object_from_fragments(
            a=J.json_number(F.col("a")),
            b=J.json_string(F.col("b")),
            c=J.json_string(F.col("c")),
        )
        out = df.select(obj.alias("j")).collect()[0]["j"]
        assert json.loads(out) == {"a": 1, "b": "x", "c": None}


class TestDocumentId:
    def test_declared_single_pk(self, spark):
        df = spark.createDataFrame([(10, "a")], "k int, v string")
        out, strat = extract_document_id(df, declared_pk=["k"])
        assert strat == "declared_pk"
        assert out.collect()[0]["_doc_id"] == "10"

    def test_composite_pk_rownum(self, spark):
        df = spark.createDataFrame([(1, 2), (1, 1), (0, 9)], "a int, b int")
        out, strat = extract_document_id(df, declared_pk=["a", "b"])
        assert strat == "composite_pk_rownum"
        got = {(r["a"], r["b"]): r["_doc_id"] for r in out.collect()}
        assert got == {(0, 9): "1", (1, 1): "2", (1, 2): "3"}

    def test_heuristic_id_requires_uniqueness(self, spark):
        dup = spark.createDataFrame([(1, "x"), (1, "y")], "id int, v string")
        out, strat = extract_document_id(dup, order_cols=["id", "v"])
        assert strat == "rownum_fallback"
        uniq = spark.createDataFrame([(1, "x"), (2, "y")], "id int, v string")
        out, strat = extract_document_id(uniq)
        assert strat == "heuristic_id"
        assert sorted(r["_doc_id"] for r in out.collect()) == ["1", "2"]

    def test_is_column_unique(self, spark):
        df = spark.createDataFrame([(1,), (2,), (2,)], "x int")
        assert not is_column_unique(df, "x")
        assert is_column_unique(df.distinct(), "x")

    def test_document_table_schema(self, spark):
        df = spark.createDataFrame([(1, "a")], "id int, v string")
        df2, _ = extract_document_id(df)
        doc = to_document_table(
            df2, J.object_from_fragments(v=J.json_string(F.col("v"))), "sqlite"
        )
        assert doc.columns == ["id", "data", "_source_type", "_migrated_at"]
        row = doc.collect()[0]
        assert row["id"] == "1" and row["_source_type"] == "sqlite"
        assert json.loads(row["data"]) == {"v": "a"}


class TestTextOps:
    def test_token_count(self, spark):
        df = spark.createDataFrame([("  a b   c ",), ("one",)], "text string")
        out = [r[0] for r in df.select(token_count_expr(F.col("text"))).collect()]
        assert out == [3, 1]

    def test_normalize_and_fingerprint_invariance(self, spark):
        df = spark.createDataFrame(
            [("Hello   World",), ("hello world",), ("different",)], "text string"
        )
        rows = df.select(
            normalize_text_expr(F.col("text")).alias("n"),
            fingerprint_expr(F.col("text")).alias("f"),
        ).collect()
        assert rows[0]["n"] == "hello world"
        assert rows[0]["f"] == rows[1]["f"]
        assert rows[0]["f"] != rows[2]["f"]

    def test_lang_id(self, spark):
        df = spark.createDataFrame(
            [("the cat sat on the mat and it is a hat",), ("zzz qqq www rrr",)],
            "text string",
        )
        out = [r[0] for r in df.select(lang_id_expr(F.col("text"))).collect()]
        assert out == ["en", "other"]


class TestWinnowing:
    def test_local_edit_preserves_most_fingerprints(self, spark):
        from database_replicator_spark.operators.textops import winnowing_fingerprints

        base = "the quick brown fox jumps over the lazy dog and runs far away today"
        edited = base.replace("lazy", "hazy")  # one-char local edit
        other = "completely unrelated content with different characters entirely"
        df = spark.createDataFrame(
            [(1, base), (2, edited), (3, other)], "doc_id long, text string"
        )
        fps = winnowing_fingerprints(df, k=5, w=4)
        by_doc = {
            d: {r["fingerprint"] for r in rows}
            for d, rows in __import__("itertools").groupby(
                sorted(fps.collect(), key=lambda r: r["doc_id"]),
                key=lambda r: r["doc_id"],
            )
        }
        overlap_edit = len(by_doc[1] & by_doc[2]) / len(by_doc[1])
        overlap_other = len(by_doc[1] & by_doc[3]) / len(by_doc[1])
        assert overlap_edit > 0.6, f"local edit destroyed fingerprints: {overlap_edit}"
        assert overlap_other < 0.1, f"unrelated docs share fingerprints: {overlap_other}"

    def test_short_and_null_docs_survive(self, spark):
        from database_replicator_spark.operators.textops import winnowing_fingerprints

        df = spark.createDataFrame(
            [(1, "ab"), (2, None)], "doc_id long, text string"
        )
        out = winnowing_fingerprints(df, k=5, w=4)
        assert {r["doc_id"] for r in out.collect()} == {1, 2}


class TestRepetitionSignals:
    def test_repetitive_doc_flagged_clean_doc_not(self, spark):
        from database_replicator_spark.operators.textops import repetition_signals

        rep = " ".join(["buy now"] * 20)  # one bigram covers the doc
        clean = "every word here appears exactly once in this sentence"
        df = spark.createDataFrame(
            [(1, rep), (2, clean)], "doc_id long, text string"
        )
        out = {r["doc_id"]: r for r in repetition_signals(df).collect()}
        assert out[1]["is_repetitive"] and not out[2]["is_repetitive"]
        assert out[1]["top_bigram_frac"] > 0.5
        assert out[2]["type_token_ratio"] == 1.0
        assert out[2]["dup_trigram_frac"] == 0.0

    def test_short_docs_survive(self, spark):
        from database_replicator_spark.operators.textops import repetition_signals

        df = spark.createDataFrame(
            [(1, "one"), (2, "two words"), (3, None)], "doc_id long, text string"
        )
        out = {r["doc_id"]: r for r in repetition_signals(df).collect()}
        assert set(out) == {1, 2, 3}
        # no bigrams/trigrams → zero fractions, never repetitive
        assert out[1]["top_bigram_frac"] == 0.0
        assert out[1]["dup_trigram_frac"] == 0.0
        assert not out[1]["is_repetitive"]

    def test_type_token_ratio_counts_duplicates(self, spark):
        from database_replicator_spark.operators.textops import repetition_signals

        df = spark.createDataFrame([(1, "a b a b")], "doc_id long, text string")
        row = repetition_signals(df).collect()[0]
        assert row["n_tokens"] == 4
        assert row["type_token_ratio"] == 0.5


class TestPiiRedact:
    def test_all_three_classes_scrubbed(self, spark):
        from database_replicator_spark.operators.textops import pii_redact

        df = spark.createDataFrame(
            [(1, "mail bob.smith+x@corp.example.org from 192.168.0.1 call +1 555 867-5309 end")],
            "doc_id long, text string",
        )
        row = pii_redact(df).collect()[0]
        assert row["n_emails"] == 1 and row["n_ips"] == 1
        assert "<EMAIL>" in row["redacted"] and "<IP>" in row["redacted"]
        assert "bob.smith" not in row["redacted"]
        assert "192.168.0.1" not in row["redacted"]

    def test_phone_variants(self, spark):
        from database_replicator_spark.operators.textops import pii_redact

        df = spark.createDataFrame(
            [(1, "a +1-555-1234 b"), (2, "c 44 123-9999 d"), (3, "no pii at all")],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in pii_redact(df).collect()}
        assert out[1]["n_phones"] == 1 and "<PHONE>" in out[1]["redacted"]
        assert out[2]["n_phones"] == 1
        assert out[3]["n_phones"] == 0 and out[3]["redacted"] == "no pii at all"

    def test_null_text_safe(self, spark):
        from database_replicator_spark.operators.textops import pii_redact

        df = spark.createDataFrame([(1, None)], "doc_id long, text string")
        row = pii_redact(df).collect()[0]
        assert row["redacted"] == "" and row["n_emails"] == 0


def _ref_bpe_train(word_counts, num_merges, min_pair_count=2):
    """Pure-Python Sennrich-style BPE on a word-frequency dict."""
    vocab = {tuple(w): c for w, c in word_counts.items()}
    merges = []
    for _ in range(num_merges):
        pairs = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] = pairs.get((syms[i], syms[i + 1]), 0) + c
        if not pairs:
            break
        # tie-break: count desc, then pair lexicographic
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_pair_count:
            break
        merges.append((a, b, cnt))
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


class TestBpe:
    def test_train_matches_python_reference(self, spark):
        from database_replicator_spark.operators.bpe import bpe_train

        wc = {"lower": 5, "lowest": 2, "newer": 6, "wider": 3, "new": 2}
        words = spark.createDataFrame(list(wc.items()), "word string, count long")
        got = bpe_train(words, num_merges=8)
        want = _ref_bpe_train(wc, 8)
        assert got == want
        assert len(got) >= 4  # the fixture supports several merges

    def test_train_deterministic_ties(self, spark):
        from database_replicator_spark.operators.bpe import bpe_train

        # 'ab' and 'cd' both appear 3 times: lexicographic tie-break
        wc = {"ab": 3, "cd": 3}
        words = spark.createDataFrame(list(wc.items()), "word string, count long")
        got = bpe_train(words, num_merges=2, min_pair_count=2)
        assert got == [("a", "b", 3), ("c", "d", 3)]

    def test_greedy_overlap_semantics(self, spark):
        from database_replicator_spark.operators.bpe import bpe_train

        # 'aaa' x4: pair (a,a) counts 8 (two per word); after the merge the
        # word is (aa, a) — greedy non-overlapping, like python BPE
        words = spark.createDataFrame([("aaa", 4)], "word string, count long")
        got = bpe_train(words, num_merges=2)
        assert got[0] == ("a", "a", 8)
        assert got == _ref_bpe_train({"aaa": 4}, 2)

    def test_segment_counts(self, spark):
        from database_replicator_spark.operators.bpe import bpe_segment

        docs = spark.createDataFrame(
            [(1, "newer lower"), (2, "new")], "doc_id long, text string"
        )
        merges = [("e", "r"), ("n", "e"), ("ne", "w")]
        out = {r["doc_id"]: r.asDict() for r in bpe_segment(docs, merges).collect()}
        # newer -> new,er (2); lower -> l,o,w,er (4); new -> new (1)
        assert out[1]["n_words"] == 2 and out[1]["n_bpe_tokens"] == 6
        assert out[2]["n_words"] == 1 and out[2]["n_bpe_tokens"] == 1

    def test_word_counts_one_scan(self, spark):
        from database_replicator_spark.operators.bpe import word_counts

        docs = spark.createDataFrame(
            [(1, "The the THE"), (2, "the cat")], "doc_id long, text string"
        )
        wc = {r["word"]: r["count"] for r in word_counts(docs).collect()}
        assert wc["the"] == 4 and wc["cat"] == 1


class TestHashedLinearClassifier:
    def test_matches_pure_python_reference(self, spark):
        import hashlib

        from database_replicator_spark.operators.textops import (
            classifier_weight,
            hashed_linear_score,
        )

        texts = ["the cat sat", "one", "alpha beta gamma delta", ""]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        got = {
            r["doc_id"]: r
            for r in hashed_linear_score(df, num_buckets=64).collect()
        }

        def py_score(text):
            # split(trim(''), '\s+') yields [''] (size 1) in both engines
            toks = text.strip().split() or [""]
            s = 0
            for t in toks:
                b = int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % 64
                s += classifier_weight(b, 64)
            return s, len(toks)

        for i, t in enumerate(texts):
            s, n = py_score(t)
            assert got[i]["feat_sum"] == s, (t, got[i])
            assert got[i]["n_tokens"] == n
            if n:
                assert got[i]["score"] == s / (1000.0 * n)

    def test_plan_is_shuffle_free(self, spark):
        from database_replicator_spark.operators.textops import hashed_linear_score

        df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
        plan = (
            hashed_linear_score(df, num_buckets=8)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan


class TestHashedEmbedding:
    def test_components_are_signed_token_counts(self, spark):
        from pyspark.sql import functions as F

        from database_replicator_spark.operators.textops import hashed_embedding

        docs = spark.createDataFrame(
            [(1, "alpha beta alpha"), (2, "alpha")],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r["embedding"] for r in hashed_embedding(docs, dim=16).collect()}
        assert len(out[1]) == 16
        # doc1 = 2*alpha + beta; doc2 = alpha → doc1 - doc2 - doc2 leaves beta's bucket
        import numpy as np

        v1, v2 = np.array(out[1]), np.array(out[2])
        diff = v1 - 2 * v2
        assert np.abs(diff).sum() == 1.0  # exactly beta's ±1 remains
        assert float(np.abs(v2).sum()) == 1.0

    def test_identical_text_identical_vector_e2e_neardup(self, spark):
        """The in-engine text→vector→near-dup loop: a duplicated document
        text yields cosine 1.0 through the semantic tier with no external
        embeddings."""
        from pyspark.sql import functions as F

        from database_replicator_spark.operators.similarity import topk_blas
        from database_replicator_spark.operators.textops import hashed_embedding

        base = (
            "the quick brown fox jumps over the lazy dog and keeps on "
            "running through the wide open field all day"
        )
        other = (
            "completely different material concerning database systems "
            "replication checkpoints and distributed execution engines"
        )
        docs = spark.createDataFrame(
            [(1, base), (2, base), (3, other)], "doc_id long, text string"
        )
        emb = hashed_embedding(docs, dim=32).withColumnRenamed("doc_id", "vec_id")
        top = topk_blas(emb, emb.filter(F.col("vec_id") == 1), k=1).collect()
        assert len(top) == 1
        assert top[0]["corpus_id"] == 2 and top[0]["cosine"] == 1.0
