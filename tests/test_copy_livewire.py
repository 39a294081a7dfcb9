"""S16 livewire: copy_sink's REAL send path against an in-process
Postgres v3 wire server (tests/pgwire_server.py) — the frames the sink
produces are byte-asserted, closing most of the "never met a server" gap
without psycopg or a real Postgres (r11 verdict ask #8). The escaping
itself is contract-tested in test_sinks/test_security; here the wire
framing, chunking, transaction bracket, and DSN routing are what's under
test."""

import pytest

from database_replicator_spark.sources.jdbc import (
    copy_sink,
    render_copy_value,
)
from database_replicator_spark.sources.pgwire import (
    PgWireCopyClient,
    PgWireError,
)
from pgwire_server import PgWireServer


@pytest.fixture()
def server():
    s = PgWireServer().start()
    yield s
    s.stop()


def _dsn(server, user="sink", db="targetdb"):
    return f"postgresql://{user}@127.0.0.1:{server.port}/{db}"


class TestWireClient:
    def test_startup_and_transaction_bracket(self, server):
        c = PgWireCopyClient.from_dsn(_dsn(server)).connect()
        assert c.simple_query("BEGIN") == "BEGIN"
        assert c.copy_in(
            'COPY "t" ("a") FROM STDIN', [b"1\n", b"2\n"]
        ) == "COPY 2"
        assert c.simple_query("COMMIT") == "COMMIT"
        c.close()
        assert server.connections[0][0] == (
            "startup",
            {"user": "sink", "database": "targetdb"},
        )
        assert server.statements() == ["BEGIN", "COMMIT"]
        assert server.copy_frames() == [('COPY "t" ("a") FROM STDIN', b"1\n2\n")]

    def test_password_dsn_refused(self):
        with pytest.raises(PgWireError, match="trust auth only"):
            PgWireCopyClient.from_dsn("postgresql://u:secret@h:5432/db")


class TestCopySinkLivewire:
    def test_single_partition_bytes_exact(self, spark, server):
        rows = [
            (1, "plain"),
            (2, "tab\there"),
            (3, "line\nbreak"),
            (4, None),
            (5, "back\\slash"),
        ]
        df = spark.createDataFrame(rows, "id long, txt string").coalesce(1)
        copy_sink(df, _dsn(server), "public.t", rows_per_copy=100)
        frames = server.copy_frames()
        assert len(frames) == 1
        sql, payload = frames[0]
        assert sql == 'COPY "public"."t" ("id", "txt") FROM STDIN'
        want = {
            f"{i}\t{render_copy_value(t)}".encode()
            for i, t in rows
        }
        assert set(payload.rstrip(b"\n").split(b"\n")) == want
        assert b"3\tline\\nbreak" in payload  # escaping survives the wire
        assert b"4\t\\N" in payload
        # one transaction bracket around the partition
        assert server.statements() == ["BEGIN", "COMMIT"]

    def test_chunking_splits_copy_statements(self, spark, server):
        df = spark.createDataFrame(
            [(i, f"v{i}") for i in range(10)], "id long, txt string"
        ).coalesce(1)
        copy_sink(df, _dsn(server), "t", rows_per_copy=3)
        frames = server.copy_frames()
        assert len(frames) == 4  # 3+3+3+1
        assert sum(p.count(b"\n") for _, p in frames) == 10
        assert server.statements() == ["BEGIN", "COMMIT"]

    def test_multi_partition_opens_connection_each(self, spark, server):
        df = spark.createDataFrame(
            [(i, f"v{i}") for i in range(40)], "id long, txt string"
        ).repartition(4)
        copy_sink(df, _dsn(server), "t", rows_per_copy=1000)
        payload = server.all_copy_payload()
        assert payload.count(b"\n") == 40
        got = {
            line.split(b"\t")[0]
            for line in payload.rstrip(b"\n").split(b"\n")
        }
        assert got == {str(i).encode() for i in range(40)}
        # ≤4 connections (empty partitions never connect), each bracketed
        n_conn = len([t for t in server.connections if t])
        assert 1 <= n_conn <= 4
        stmts = server.statements()
        assert stmts.count("BEGIN") == stmts.count("COMMIT") == n_conn

    def test_empty_dataframe_never_connects(self, spark, server):
        df = spark.createDataFrame([], "id long, txt string")
        copy_sink(df, _dsn(server), "t")
        assert server.connections == []


class TestNoisyServer:
    def test_notices_before_copyinresponse_are_skipped(self):
        """A real server may emit NoticeResponse / ParameterStatus before
        CopyInResponse (trigger warnings, client_min_messages); the client
        must skip N/S/A frames rather than fail (ADVICE r12)."""
        s = PgWireServer(noisy=True).start()
        try:
            c = PgWireCopyClient.from_dsn(_dsn(s)).connect()
            assert c.copy_in(
                'COPY "t" ("a") FROM STDIN', [b"1\n", b"2\n", b"3\n"]
            ) == "COPY 3"
            c.close()
            assert s.copy_frames() == [('COPY "t" ("a") FROM STDIN', b"1\n2\n3\n")]
        finally:
            s.stop()
