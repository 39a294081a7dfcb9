"""Stdlib socket server speaking just enough PostgreSQL v3 wire protocol
to receive the COPY sink's real send path (r11 verdict ask #8): startup →
AuthenticationOk (trust) → ReadyForQuery; simple queries acknowledged
with CommandComplete; ``COPY … FROM STDIN`` answered with CopyInResponse,
CopyData frames collected until CopyDone, tag ``COPY n``. Every received
statement and COPY payload is recorded for byte-assertions. Test harness
only — no SQL is executed, nothing is stored beyond the transcript."""

from __future__ import annotations

import socket
import struct
import threading

SSL_REQUEST = 80877103
GSSENC_REQUEST = 80877104


def _msg(mtype: bytes, payload: bytes) -> bytes:
    return mtype + struct.pack("!I", len(payload) + 4) + payload


def _recv_exact(conn: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = conn.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("client closed")
        buf += chunk
    return buf


class PgWireServer:
    """One transcript-recording fake Postgres; thread per connection."""

    def __init__(self, noisy: bool = False):
        #: when True, emit NoticeResponse + ParameterStatus frames before
        #: CopyInResponse — what a real server does for trigger warnings /
        #: client_min_messages; clients must skip them (ADVICE r12)
        self.noisy = noisy
        #: pgoutput message payloads a START_REPLICATION session will
        #: ship as XLogData frames (set by the test before connecting);
        #: each is wrapped in 'w' + walStart/walEnd/sendTime per the
        #: public streaming-replication protocol
        self.replication_payloads: list[bytes] = []
        #: synthetic LSN of the first XLogData frame; consecutive frames
        #: advance by 0x100
        self.replication_base_lsn = 0x1_0000_0000
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(16)
        self.port = self.sock.getsockname()[1]
        self.lock = threading.Lock()
        #: list of per-connection transcripts; each is a list of
        #: ("query", sql) / ("copy", sql, payload_bytes) / ("startup",
        #: params dict) tuples in arrival order
        self.connections: list[list] = []
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._serve, daemon=True)

    # -- lifecycle -----------------------------------------------------------
    def start(self) -> "PgWireServer":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        try:
            socket.create_connection(("127.0.0.1", self.port), 1).close()
        except OSError:
            pass
        self.sock.close()

    def _serve(self) -> None:
        while not self._stop.is_set():
            try:
                conn, _ = self.sock.accept()
            except OSError:
                return
            if self._stop.is_set():
                conn.close()
                return
            threading.Thread(
                target=self._handle, args=(conn,), daemon=True
            ).start()

    # -- protocol ------------------------------------------------------------
    def _handle(self, conn: socket.socket) -> None:
        transcript: list = []
        with self.lock:
            self.connections.append(transcript)
        try:
            # startup (possibly preceded by SSL/GSS negotiation probes)
            while True:
                (length,) = struct.unpack("!I", _recv_exact(conn, 4))
                body = _recv_exact(conn, length - 4)
                (code,) = struct.unpack("!I", body[:4])
                if code in (SSL_REQUEST, GSSENC_REQUEST):
                    conn.sendall(b"N")  # not supported — try plain
                    continue
                params = body[4:].split(b"\0")
                kv = dict(zip(params[0::2], params[1::2]))
                transcript.append(
                    ("startup", {k.decode(): v.decode() for k, v in kv.items() if k})
                )
                break
            conn.sendall(_msg(b"R", struct.pack("!I", 0)))  # AuthenticationOk
            conn.sendall(_msg(b"S", b"server_version\x0016.0-fake\x00"))
            conn.sendall(_msg(b"Z", b"I"))
            while True:
                mtype = _recv_exact(conn, 1)
                (length,) = struct.unpack("!I", _recv_exact(conn, 4))
                payload = _recv_exact(conn, length - 4)
                if mtype == b"X":
                    return
                if mtype != b"Q":
                    continue  # this harness only speaks simple-query
                sql = payload.rstrip(b"\0").decode()
                if sql.upper().startswith("START_REPLICATION"):
                    self._serve_replication(conn, transcript, sql)
                elif sql.upper().startswith("COPY"):
                    if self.noisy:
                        conn.sendall(
                            _msg(b"N", b"SWARNING\0Mtrigger says hi\0\0")
                        )
                        conn.sendall(_msg(b"S", b"application_name\0fake\0"))
                    # CopyInResponse: text format, 0 column formats (the
                    # column count is not needed for text-format COPY)
                    conn.sendall(_msg(b"G", b"\x00\x00\x00"))
                    data = b""
                    while True:
                        t2 = _recv_exact(conn, 1)
                        (l2,) = struct.unpack("!I", _recv_exact(conn, 4))
                        p2 = _recv_exact(conn, l2 - 4)
                        if t2 == b"d":
                            data += p2
                        elif t2 in (b"c", b"f"):
                            break
                    transcript.append(("copy", sql, data))
                    n = data.count(b"\n")
                    conn.sendall(_msg(b"C", f"COPY {n}".encode() + b"\0"))
                else:
                    transcript.append(("query", sql))
                    tag = sql.split()[0].upper()
                    conn.sendall(_msg(b"C", tag.encode() + b"\0"))
                conn.sendall(_msg(b"Z", b"I"))
        except (ConnectionError, OSError):
            return
        finally:
            conn.close()

    def _serve_replication(
        self, conn: socket.socket, transcript: list, sql: str
    ) -> None:
        """One walsender session: CopyBothResponse → a reply-requested
        keepalive → every queued pgoutput payload as an XLogData frame →
        CopyDone; incoming standby-status-update ('r') frames recorded,
        client CopyDone awaited, CommandComplete + ReadyForQuery close.
        Message shapes per the public streaming-replication protocol."""
        transcript.append(("start_replication", sql))
        conn.sendall(_msg(b"W", b"\x00\x00\x00"))  # CopyBothResponse
        # keepalive with reply requested — exercises the client ack path
        conn.sendall(
            _msg(b"d", b"k" + struct.pack("!QQB", self.replication_base_lsn, 0, 1))
        )
        lsn = self.replication_base_lsn
        for payload in self.replication_payloads:
            lsn += 0x100
            conn.sendall(
                _msg(b"d", b"w" + struct.pack("!QQQ", lsn, lsn, 0) + payload)
            )
        conn.sendall(_msg(b"c", b""))  # server CopyDone
        # drain client frames (status updates + CopyDone mirror)
        while True:
            t2 = _recv_exact(conn, 1)
            (l2,) = struct.unpack("!I", _recv_exact(conn, 4))
            p2 = _recv_exact(conn, l2 - 4)
            if t2 == b"d" and p2[:1] == b"r":
                recv_lsn, flush_lsn, apply_lsn, _ts, reply = struct.unpack_from(
                    "!QQQQB", p2, 1
                )
                transcript.append(
                    ("standby_status", recv_lsn, flush_lsn, apply_lsn, reply)
                )
            elif t2 == b"c":
                break
        conn.sendall(_msg(b"C", b"START_REPLICATION\0"))
        conn.sendall(_msg(b"Z", b"I"))

    def status_updates(self) -> list[tuple]:
        with self.lock:
            return [
                e[1:]
                for t in self.connections
                for e in t
                if e[0] == "standby_status"
            ]

    def replication_requests(self) -> list[str]:
        with self.lock:
            return [
                e[1]
                for t in self.connections
                for e in t
                if e[0] == "start_replication"
            ]

    # -- assertions ----------------------------------------------------------
    def all_copy_payload(self) -> bytes:
        with self.lock:
            return b"".join(
                e[2] for t in self.connections for e in t if e[0] == "copy"
            )

    def copy_frames(self) -> list[tuple[str, bytes]]:
        with self.lock:
            return [
                (e[1], e[2])
                for t in self.connections
                for e in t
                if e[0] == "copy"
            ]

    def statements(self) -> list[str]:
        with self.lock:
            return [
                e[1] for t in self.connections for e in t if e[0] == "query"
            ]
