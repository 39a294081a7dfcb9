"""MongoDB source tests: Extended-JSON conversion vectors (re-expressed
from reference src/mongodb/converter.rs:283-393), `_id` extraction rules
(converter.rs:236-260), and the distributed dump-file ingestion path."""

import json

from database_replicator_spark.sources.mongo_source import (
    convert_document,
    convert_value,
    extract_id,
    filter_user_collections,
    read_dump_docs,
)


class TestConvertValue:
    def test_scalars_native(self):
        assert convert_value(42) == "42"
        assert convert_value(42.75) == "42.75"
        assert convert_value("Hello, World!") == '"Hello, World!"'
        assert convert_value(True) == "true"
        assert convert_value(False) == "false"
        assert convert_value(None) == "null"

    def test_array_recurses(self):
        assert convert_value([1, 2, 3]) == "[1,2,3]"

    def test_document_recurses(self):
        doc = {"name": "Alice", "age": 30, "active": True}
        assert json.loads(convert_document(doc)) == doc

    def test_nested_document_and_tags(self):
        doc = {
            "user": {"name": "Alice", "email": "alice@example.com"},
            "tags": ["admin", "user"],
        }
        assert json.loads(convert_document(doc)) == doc

    def test_objectid_tag(self):
        out = convert_value({"$oid": "507F1F77BCF86CD799439011"})
        assert json.loads(out) == {
            "_type": "objectid",
            "$oid": "507f1f77bcf86cd799439011",
        }

    def test_datetime_tag_all_modes(self):
        # relaxed millis, canonical $numberLong, relaxed ISO string
        assert convert_value({"$date": 1700000000000}) == \
            '{"_type":"datetime","$date":1700000000000}'
        assert convert_value({"$date": {"$numberLong": "1700000000000"}}) == \
            '{"_type":"datetime","$date":1700000000000}'
        assert convert_value({"$date": "2023-11-14T22:13:20Z"}) == \
            '{"_type":"datetime","$date":1700000000000}'

    def test_binary_tag(self):
        out = convert_value({"$binary": {"base64": "AQID", "subType": "80"}})
        assert json.loads(out) == {"_type": "binary", "subtype": 128, "data": "AQID"}

    def test_regex_tag(self):
        out = convert_value(
            {"$regularExpression": {"pattern": "^a.*b$", "options": "i"}}
        )
        assert json.loads(out) == {
            "_type": "regex", "pattern": "^a.*b$", "options": "i",
        }

    def test_timestamp_tag(self):
        out = convert_value({"$timestamp": {"t": 7, "i": 2}})
        assert json.loads(out) == {"_type": "timestamp", "t": 7, "i": 2}

    def test_decimal128_stays_string(self):
        assert convert_value({"$numberDecimal": "1234.56789012345678901"}) == \
            '"1234.56789012345678901"'

    def test_number_wrappers_unwrap(self):
        assert convert_value({"$numberLong": "42"}) == "42"
        assert convert_value({"$numberInt": "-7"}) == "-7"
        assert convert_value({"$numberDouble": "2.5"}) == "2.5"

    def test_non_finite_double_is_string(self):
        assert convert_value(float("nan")) == '"NaN"'
        assert convert_value(float("inf")) == '"inf"'
        assert convert_value(float("-inf")) == '"-inf"'
        assert convert_value({"$numberDouble": "NaN"}) == '"NaN"'

    def test_undefined_null_minmax_keys(self):
        assert convert_value({"$undefined": True}) == "null"
        assert convert_value({"$minKey": 1}) == '{"_type":"minkey"}'
        assert convert_value({"$maxKey": 1}) == '{"_type":"maxkey"}'


class TestExtractId:
    def test_objectid_to_hex(self):
        assert extract_id({"_id": {"$oid": "507F1F77BCF86CD799439011"}}, 1) == \
            "507f1f77bcf86cd799439011"

    def test_string_and_ints_to_string(self):
        assert extract_id({"_id": "k1"}, 1) == "k1"
        assert extract_id({"_id": 42}, 1) == "42"
        assert extract_id({"_id": {"$numberLong": "99"}}, 1) == "99"
        assert extract_id({"_id": {"$numberInt": "7"}}, 1) == "7"

    def test_unsupported_type_falls_back_to_doc_number(self):
        assert extract_id({"_id": [1, 2]}, 5) == "5"
        assert extract_id({"_id": {"k": 1}}, 6) == "6"
        assert extract_id({"_id": True}, 7) == "7"

    def test_missing_id_falls_back(self):
        assert extract_id({"x": 1}, 3) == "3"


def test_filter_user_collections():
    assert filter_user_collections(
        ["users", "system.indexes", "posts", "system.profile"]
    ) == ["users", "posts"]


class TestReadDumpDocs:
    def test_dump_roundtrip(self, spark, tmp_path):
        lines = [
            json.dumps({"_id": {"$oid": "507f1f77bcf86cd799439011"},
                        "name": "Alice",
                        "joined": {"$date": 1700000000000},
                        "balance": {"$numberDecimal": "10.50"}}),
            json.dumps({"_id": "key-2", "tags": ["a", "b"], "n": 3}),
            json.dumps({"name": "anonymous"}),  # no _id → doc number
        ]
        p = tmp_path / "dump.jsonl"
        p.write_text("\n".join(lines) + "\n")

        rows = {r["id"]: r for r in read_dump_docs(spark, str(p)).collect()}
        assert set(rows) == {"507f1f77bcf86cd799439011", "key-2", "3"}
        d1 = json.loads(rows["507f1f77bcf86cd799439011"]["data"])
        assert d1["_id"] == {"_type": "objectid", "$oid": "507f1f77bcf86cd799439011"}
        assert d1["joined"] == {"_type": "datetime", "$date": 1700000000000}
        assert d1["balance"] == "10.50"
        d2 = json.loads(rows["key-2"]["data"])
        assert d2["tags"] == ["a", "b"] and d2["n"] == 3
        assert all(r["_source_type"] == "mongodb" for r in rows.values())
