"""pgoutput logical-replication codec (sources/pgoutput.py, r12): frame
round-trips, REPLICA-IDENTITY branches, relation-cache contract, and the
declared out-of-scope seams. The oracle-gated path is
cdc_pgoutput_decode; these pin the protocol corners the gate's uniform
fixture can't reach."""

import struct

import pytest

from database_replicator_spark.sources.pgoutput import (
    PgOutputEncoder,
    decode_pgoutput_stream,
)


def _enc(**kw):
    return PgOutputEncoder(
        relid=kw.get("relid", 500),
        namespace="public",
        relname=kw.get("relname", "t"),
        columns=kw.get("columns", ["id", "a", "b"]),
        key_cols=["id"],
    )


class TestRoundTrip:
    def test_insert_update_delete_sequence(self):
        e = _enc().relation().begin(xid=7)
        e.insert(["1", "x", "0.5"])
        e.update(["1", "y", "1.5"], old_key=["1", None, None])
        e.delete(["1", None, None])
        e.commit()
        rows = decode_pgoutput_stream(e.stream())
        assert [r["op"] for r in rows] == ["insert", "update", "delete"]
        assert [r["seq"] for r in rows] == [0, 1, 2]
        assert all(r["xid"] == 7 and r["table"] == "public.t" for r in rows)
        assert rows[1]["columns"] == {"id": "1", "a": "y", "b": "1.5"}
        assert rows[2]["columns"] == {"id": "1", "a": None, "b": None}

    def test_update_without_old_key(self):
        e = _enc().relation().begin(xid=1)
        e.update(["9", "z", None])  # REPLICA IDENTITY key unchanged
        e.commit()
        (row,) = decode_pgoutput_stream(e.stream())
        assert row["columns"] == {"id": "9", "a": "z", "b": None}

    def test_multiple_relations_one_stream(self):
        a = _enc(relid=1, relname="a", columns=["id", "v"])
        b = _enc(relid=2, relname="b", columns=["id", "w"])
        a.relation()
        a.frames += b.relation().frames[-1:]
        a.begin(xid=3)
        a.insert(["1", "av"])
        a.frames.append(
            b"I" + struct.pack("!I", 2) + b"N"
            + b"".join(
                [struct.pack("!H", 2),
                 b"t", struct.pack("!I", 1), b"2",
                 b"t", struct.pack("!I", 2), b"bw"]
            )
        )
        a.commit()
        rows = decode_pgoutput_stream(a.stream())
        assert rows[0]["table"] == "public.a"
        assert rows[1]["table"] == "public.b"
        assert rows[1]["columns"] == {"id": "2", "w": "bw"}

    def test_unchanged_toast_column_is_omitted_not_null(self):
        """Postgres semantics for 'u': value not shipped — KEEP the old
        value. The decoder must omit the key (absence == not shipped),
        never emit None, or a consumer would null-out stored TOAST
        values (r12 verdict #2)."""
        e = _enc().relation().begin(xid=1)
        e.frames.append(
            b"U" + struct.pack("!I", 500) + b"N"
            + struct.pack("!H", 3)
            + b"t" + struct.pack("!I", 1) + b"1"
            + b"u"  # unchanged TOAST: not shipped
            + b"t" + struct.pack("!I", 1) + b"q"
        )
        e.commit()
        (row,) = decode_pgoutput_stream(e.stream())
        assert row["columns"] == {"id": "1", "b": "q"}
        assert "a" not in row["columns"]

    def test_encoder_mints_unchanged_toast(self):
        from database_replicator_spark.sources.pgoutput import UNCHANGED_TOAST

        e = _enc().relation().begin(xid=1)
        e.update(["1", UNCHANGED_TOAST, "new_b"], old_key=["1", None, None])
        e.commit()
        (row,) = decode_pgoutput_stream(e.stream())
        assert row["op"] == "update"
        assert row["columns"] == {"id": "1", "b": "new_b"}
        # explicit NULL stays distinguishable from not-shipped
        e2 = _enc().relation().begin(xid=2)
        e2.update(["1", None, "x"], old_key=["1", None, None])
        e2.commit()
        (row2,) = decode_pgoutput_stream(e2.stream())
        assert row2["columns"] == {"id": "1", "a": None, "b": "x"}


class TestContracts:
    def test_tuple_before_relation_raises(self):
        e = _enc().begin(xid=1)
        e.insert(["1", "x", "y"])
        with pytest.raises(ValueError, match="before its Relation"):
            decode_pgoutput_stream(e.stream())

    def test_unsupported_message_is_a_named_seam(self):
        e = _enc().relation()
        e.frames.append(b"T" + struct.pack("!I", 1))  # Truncate
        with pytest.raises(ValueError, match="unsupported pgoutput"):
            decode_pgoutput_stream(e.stream())

    def test_commit_clears_xid(self):
        e = _enc().relation().begin(xid=5)
        e.insert(["1", "x", "y"])
        e.commit()
        # second txn without Begin: xid must be None, not a stale 5
        e.insert(["2", "x", "y"])
        rows = decode_pgoutput_stream(e.stream())
        assert rows[0]["xid"] == 5 and rows[1]["xid"] is None
