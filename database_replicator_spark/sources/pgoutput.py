"""pgoutput logical-replication message codec — the wire format a
PostgreSQL logical replication slot emits (PUBLIC spec: PostgreSQL docs
§"Logical Streaming Replication Protocol" + §"Logical Replication
Message Formats", protocol version 1). The reference consumes logical
changes through a queue (sqlite-watcher/src/queue.rs); this module
parses the actual upstream byte format those changes originate from, so
the CDC tier's decode seam is a real protocol parser, not a declared
stub — the pgwire.py pattern applied to replication (S22/S24
narrowing).

Implemented messages: Begin ('B'), Commit ('C'), Relation ('R'),
Insert ('I'), Update ('U'), Delete ('D'); TupleData with null ('n'),
unchanged-TOAST ('u'), and text ('t') columns. Not implemented (raise):
Truncate, Type, Origin, Message, streamed (protocol ≥2) transactions —
each a ValueError naming the message, the honest-seam convention.

Unchanged-TOAST contract (r12 verdict #2): an 'u' column means "value
not shipped — KEEP the stored value", which is NOT the same as NULL.
The decoder therefore OMITS such columns from the change row's
``columns`` dict entirely (key absence == not shipped; ``None`` ==
SQL NULL), and a consumer applying these rows must preserve the prior
value for absent keys (``ChangeApplier(merge_partial_updates=True)``
does exactly that).

Statefulness contract: pgoutput sends a Relation message describing a
table before the first tuple message that references it ON EACH
CONNECTION — a decoder therefore needs only per-stream state. The
distributed shape mirrors that: shard change streams by slot/partition,
decode each shard's ordered frames in one task with its own relation
cache (exactly what :func:`decode_pgoutput_stream` keeps).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

__all__ = [
    "UNCHANGED_TOAST",
    "PgOutputEncoder",
    "decode_pgoutput_stream",
]


class _UnchangedToast:
    """Singleton marking a column the wire did not ship (TupleData kind
    'u'): the stored value is unchanged. Distinct from ``None`` (SQL
    NULL). Never appears in decoded ``columns`` dicts — the decoder
    drops the key instead — but the encoder accepts it to mint
    TOAST-bearing fixtures."""

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return "UNCHANGED_TOAST"


UNCHANGED_TOAST = _UnchangedToast()


# ---------------------------------------------------------------------------
# encoding (fixture/minting side — a real slot produces these bytes; the
# encoder exists so tests and gates can exercise the decoder on genuine
# frames without a live cluster)
# ---------------------------------------------------------------------------

def _cstr(s: str) -> bytes:
    return s.encode() + b"\0"


def _tuple_data(values: list) -> bytes:
    out = struct.pack("!H", len(values))
    for v in values:
        if v is None:
            out += b"n"
        elif isinstance(v, _UnchangedToast):
            # isinstance, not identity: task closures pickle the sentinel
            # by value, so an executor-side copy must still encode as 'u'
            out += b"u"
        else:
            b = str(v).encode()
            out += b"t" + struct.pack("!I", len(b)) + b
    return out


@dataclass
class PgOutputEncoder:
    """Builds a pgoutput frame sequence for one table. ``key_cols`` mark
    the REPLICA IDENTITY columns (flag bit 1 in the Relation message);
    deletes emit key-only 'K' tuples, the wire reality that a delete
    carries no non-key data."""

    relid: int
    namespace: str
    relname: str
    columns: list[str]
    key_cols: list[str]
    frames: list[bytes] = field(default_factory=list)

    def relation(self) -> "PgOutputEncoder":
        body = struct.pack("!I", self.relid) + _cstr(self.namespace) + _cstr(
            self.relname
        )
        body += b"d"  # replica identity: default (primary key)
        body += struct.pack("!H", len(self.columns))
        for c in self.columns:
            flags = 1 if c in self.key_cols else 0
            # typid 25 = text, typmod -1: the text-transfer contract
            body += struct.pack("!B", flags) + _cstr(c) + struct.pack(
                "!Ii", 25, -1
            )
        self.frames.append(b"R" + body)
        return self

    def begin(self, xid: int, lsn: int = 0, ts: int = 0) -> "PgOutputEncoder":
        self.frames.append(b"B" + struct.pack("!QQI", lsn, ts, xid))
        return self

    def commit(self, lsn: int = 0, ts: int = 0) -> "PgOutputEncoder":
        self.frames.append(b"C" + struct.pack("!BQQQ", 0, lsn, lsn, ts))
        return self

    def insert(self, values: list[str | None]) -> "PgOutputEncoder":
        self.frames.append(
            b"I" + struct.pack("!I", self.relid) + b"N" + _tuple_data(values)
        )
        return self

    def update(
        self,
        values: list[str | None],
        old_key: list[str | None] | None = None,
    ) -> "PgOutputEncoder":
        body = struct.pack("!I", self.relid)
        if old_key is not None:
            body += b"K" + _tuple_data(old_key)
        body += b"N" + _tuple_data(values)
        self.frames.append(b"U" + body)
        return self

    def delete(self, key_values: list[str | None]) -> "PgOutputEncoder":
        self.frames.append(
            b"D"
            + struct.pack("!I", self.relid)
            + b"K"
            + _tuple_data(key_values)
        )
        return self

    def stream(self) -> bytes:
        """Length-prefixed frame concatenation (the XLogData payloads in
        arrival order — length framing stands in for the outer wire
        envelope, which carries one message per XLogData)."""
        return b"".join(
            struct.pack("!I", len(f)) + f for f in self.frames
        )


# ---------------------------------------------------------------------------
# decoding
# ---------------------------------------------------------------------------

def _read_tuple(buf: bytes, pos: int) -> tuple[list, int]:
    (ncols,) = struct.unpack_from("!H", buf, pos)
    pos += 2
    vals: list = []
    for _ in range(ncols):
        kind = buf[pos : pos + 1]
        pos += 1
        if kind == b"n":
            vals.append(None)
        elif kind == b"u":  # unchanged TOAST: value not shipped — keep old
            vals.append(UNCHANGED_TOAST)
        elif kind == b"t":
            (ln,) = struct.unpack_from("!I", buf, pos)
            pos += 4
            vals.append(buf[pos : pos + ln].decode())
            pos += ln
        else:
            raise ValueError(f"unknown TupleData column kind {kind!r}")
    return vals, pos


def decode_pgoutput_stream(stream: bytes) -> list[dict]:
    """Decode one shard's length-prefixed pgoutput frame stream into
    change rows: ``{"seq", "xid", "table", "op", "columns" (dict of
    column → text value; key columns only for deletes)}``. Relation
    messages populate the per-stream relation cache; Begin/Commit set
    the ambient transaction id. ``seq`` is the tuple-message arrival
    index (0-based) — the within-stream order a consumer applies.

    Unchanged-TOAST ('u') columns are OMITTED from ``columns`` — key
    absence means "not shipped, keep the stored value", while an
    explicit ``None`` means SQL NULL (r12 verdict #2)."""
    rels: dict[int, tuple[str, list[str]]] = {}
    out: list[dict] = []
    xid = None
    pos = 0
    seq = 0
    while pos < len(stream):
        (ln,) = struct.unpack_from("!I", stream, pos)
        pos += 4
        frame = stream[pos : pos + ln]
        pos += ln
        mtype = frame[:1]
        if mtype == b"R":
            (relid,) = struct.unpack_from("!I", frame, 1)
            p = 5
            end = frame.index(b"\0", p)
            ns = frame[p:end].decode()
            p = end + 1
            end = frame.index(b"\0", p)
            name = frame[p:end].decode()
            p = end + 2  # skip replica-identity byte
            (ncols,) = struct.unpack_from("!H", frame, p)
            p += 2
            cols: list[str] = []
            for _ in range(ncols):
                p += 1  # flags
                end = frame.index(b"\0", p)
                cols.append(frame[p:end].decode())
                p = end + 1
                p += 8  # typid + typmod
            rels[relid] = (f"{ns}.{name}", cols)
        elif mtype == b"B":
            _lsn, _ts, xid = struct.unpack_from("!QQI", frame, 1)
        elif mtype == b"C":
            xid = None
        elif mtype in (b"I", b"U", b"D"):
            (relid,) = struct.unpack_from("!I", frame, 1)
            if relid not in rels:
                raise ValueError(
                    f"tuple message for relation {relid} before its "
                    "Relation message — shard streams by connection"
                )
            table, cols = rels[relid]
            p = 5
            kind = frame[p : p + 1]
            p += 1
            vals, p = _read_tuple(frame, p)
            if mtype == b"U" and kind in (b"K", b"O"):
                # old key/tuple present: the NEW tuple follows
                kind = frame[p : p + 1]
                p += 1
                vals, p = _read_tuple(frame, p)
            op = {b"I": "insert", b"U": "update", b"D": "delete"}[
                mtype
            ]
            out.append(
                {
                    "seq": seq,
                    "xid": xid,
                    "table": table,
                    "op": op,
                    "columns": {
                        c: v
                        for c, v in zip(cols, vals)
                        if not isinstance(v, _UnchangedToast)
                    },
                }
            )
            seq += 1
        else:
            raise ValueError(
                f"unsupported pgoutput message {mtype!r} (Truncate/Type/"
                "Origin/streamed transactions are out of scope)"
            )
    return out
