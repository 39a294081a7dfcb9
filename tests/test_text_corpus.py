"""JSONL / text-tree corpus ingestion (sources/text_corpus.py): every
input line is accounted for (docs + corrupt), ids are content-stable,
and downstream corpus operators run unchanged on ingested frames."""

import json
import os

from database_replicator_spark.sources.text_corpus import (
    ingestion_report,
    read_jsonl_documents,
    read_text_tree,
)


def _write_jsonl(tmp_path, name, lines):
    p = os.path.join(str(tmp_path), name)
    with open(p, "w") as f:
        for line in lines:
            f.write((line if isinstance(line, str) else json.dumps(line)) + "\n")
    return p


class TestJsonlIngestion:
    def test_docs_plus_corrupt_balances(self, spark, tmp_path):
        lines = [
            {"text": "hello world", "lang": "en", "source": "web"},
            {"text": "bonjour", "lang": "fr", "source": "web"},
            '{"text": "broken json', # corrupt
            {"lang": "en", "source": "web"},          # missing text
            {"text": "", "lang": "en", "source": "web"},  # empty text
        ]
        p = _write_jsonl(tmp_path, "shard.jsonl", lines)
        docs, corrupt = read_jsonl_documents(spark, p)
        assert docs.count() == 2
        assert corrupt.count() == 3
        rep = ingestion_report(docs, corrupt).collect()[0]
        assert rep["n_docs"] == 2 and rep["n_corrupt"] == 3
        assert rep["n_distinct_ids"] == 2
        assert rep["total_chars"] == len("hello world") + len("bonjour")

    def test_ids_content_stable_across_reingest(self, spark, tmp_path):
        lines = [{"text": f"doc number {i}", "source": "s"} for i in range(5)]
        p1 = _write_jsonl(tmp_path, "a.jsonl", lines)
        p2 = _write_jsonl(tmp_path, "b.jsonl", lines)
        ids1 = sorted(r["doc_id"] for r in read_jsonl_documents(spark, p1)[0].collect())
        ids2 = sorted(r["doc_id"] for r in read_jsonl_documents(spark, p2)[0].collect())
        assert ids1 == ids2

    def test_explicit_id_field_with_hash_fallback(self, spark, tmp_path):
        lines = [
            {"id": "42", "text": "has id"},
            {"id": "not-a-number", "text": "bad id"},
        ]
        p = _write_jsonl(tmp_path, "c.jsonl", lines)
        docs, _ = read_jsonl_documents(
            spark, p, id_field="id", lang_field=None, source_field=None,
            default_source="dump",
        )
        rows = {r["text"]: r for r in docs.collect()}
        assert rows["has id"]["doc_id"] == 42
        assert rows["bad id"]["doc_id"] is not None  # hash fallback
        assert rows["has id"]["source"] == "dump"

    def test_downstream_operators_run_on_ingested(self, spark, tmp_path):
        lines = [
            {"text": "same text", "source": "a"},
            {"text": "same text", "source": "b"},
            {"text": "unique text", "source": "a"},
        ]
        p = _write_jsonl(tmp_path, "d.jsonl", lines)
        docs, _ = read_jsonl_documents(spark, p)
        # content-hash ids collide for identical text — count the group
        assert docs.count() == 3
        assert docs.select("doc_id").distinct().count() == 2


class TestTextTree:
    def test_one_doc_per_file_with_dir_source(self, spark, tmp_path):
        for sub, texts in [("wiki", ["alpha beta"]), ("web", ["gamma", ""])]:
            os.makedirs(os.path.join(str(tmp_path), "tree", sub), exist_ok=True)
            for i, t in enumerate(texts):
                with open(os.path.join(str(tmp_path), "tree", sub, f"{i}.txt"), "w") as f:
                    f.write(t)
        docs = read_text_tree(spark, os.path.join(str(tmp_path), "tree", "*"))
        rows = docs.collect()
        assert len(rows) == 2  # empty file filtered
        by_text = {r["text"]: r["source"] for r in rows}
        assert by_text == {"alpha beta": "wiki", "gamma": "web"}
