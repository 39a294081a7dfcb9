"""Logical-replication control plane (S24): ``CREATE PUBLICATION`` /
``CREATE SUBSCRIPTION`` SQL generation plus the error taxonomy a failed
setup maps onto.

Reference parity: src/replication/publication.rs:25-133 (publication
assembly — FOR ALL TABLES when unfiltered, otherwise the filtered table
list with schema-only tables excluded and per-table predicates as WHERE
clauses behind the PostgreSQL-15 gate, publication.rs:108-116) and
src/replication/subscription.rs:40-165 (subscription DDL + the error
classification arms). This module is driver-side string generation only —
statements execute through any client (``sources/ddl_exec.execute_ddl``);
the ST8 monitor (``streaming/monitor.subscription_state`` /
``wait_for_caught_up``) then polls the created subscription, which is how
the control plane hands off to the streaming plane.

Security note carried over from subscription.rs:64-82: PostgreSQL stores
the subscription connection string (including any password) in
``pg_subscription``; prefer a password-less URL + ``.pgpass`` on the
target server.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..plans.rules import ReplicationFilter, quote_ident, validate_ident

#: server_version_num at which publications support row predicates
#: (publication.rs:110: predicates require PostgreSQL 15+)
PG15_VERSION_NUM = 150000

#: SQL the version probe runs (publication.rs:217-229)
SERVER_VERSION_SQL = "SHOW server_version_num"


def quote_literal(value: str) -> str:
    """Single-quote a SQL string literal, doubling embedded quotes
    (reference utils.rs quote_literal; standard_conforming_strings)."""
    return "'" + value.replace("'", "''") + "'"


def create_publication_sql(
    publication_name: str,
    tables: list[tuple[str, str]] | None = None,
    db_name: str = "",
    filter: ReplicationFilter | None = None,
    server_version: int | None = None,
) -> str:
    """Build the CREATE PUBLICATION statement.

    ``tables`` is the live catalog listing as (schema, name) pairs (the
    reference calls migration::list_tables); with no filter (or an empty
    one) the publication covers ALL TABLES and the listing is not needed.
    Filtered publications exclude schema-only tables outright and attach
    predicate rules as ``WHERE (...)`` clauses — which requires
    ``server_version`` ≥ 150000 when any predicate survives
    (publication.rs:108-116).
    """
    validate_ident(publication_name)
    if filter is None or filter.is_empty():
        return f"CREATE PUBLICATION {quote_ident(publication_name)} FOR ALL TABLES"

    if tables is None:
        raise ValueError("filtered publication requires the table listing")

    plain: list[str] = []
    predicated: list[tuple[str, str]] = []
    for schema, name in tables:
        identifier = name if schema == "public" else f"{schema}.{name}"
        if not filter.should_replicate_table(db_name, identifier, schema=schema):
            continue
        validate_ident(schema)
        validate_ident(name)
        fq = f"{quote_ident(schema)}.{quote_ident(name)}"
        rule = filter.rules.rule_for_table(db_name, schema, name)
        if rule is not None and rule.schema_only:
            continue  # schema-only: never published (publication.rs:86-91)
        pred = rule.effective_predicate() if rule is not None else None
        if pred is not None:
            predicated.append((fq, pred))
        else:
            plain.append(fq)

    if not plain and not predicated:
        raise ValueError(
            f"No tables available for publication {publication_name!r} "
            "after applying filters and schema-only rules"
        )
    if predicated and (server_version is None or server_version < PG15_VERSION_NUM):
        raise ValueError(
            "Table-level predicates require PostgreSQL 15+. "
            f"Detected server version {server_version}. Upgrade the source "
            "database or remove --table-filter/--time-filter for logical "
            "replication."
        )

    clauses = list(plain) + [f"{fq} WHERE ({pred})" for fq, pred in predicated]
    return (
        f"CREATE PUBLICATION {quote_ident(publication_name)} "
        f"FOR TABLE {', '.join(clauses)}"
    )


def drop_publication_sql(publication_name: str) -> str:
    validate_ident(publication_name)
    return f"DROP PUBLICATION IF EXISTS {quote_ident(publication_name)}"


def list_publications_sql() -> str:
    return "SELECT pubname FROM pg_publication ORDER BY pubname"


def create_subscription_sql(
    subscription_name: str,
    source_connection_string: str,
    publication_name: str,
) -> str:
    """CREATE SUBSCRIPTION (subscription.rs:84-89). The connection string
    is quoted as a literal; both names are validated identifiers."""
    validate_ident(subscription_name)
    validate_ident(publication_name)
    return (
        f"CREATE SUBSCRIPTION {quote_ident(subscription_name)} "
        f"CONNECTION {quote_literal(source_connection_string)} "
        f"PUBLICATION {quote_ident(publication_name)}"
    )


def drop_subscription_sql(subscription_name: str) -> str:
    validate_ident(subscription_name)
    return f"DROP SUBSCRIPTION IF EXISTS {quote_ident(subscription_name)}"


def list_subscriptions_sql() -> str:
    return "SELECT subname FROM pg_subscription ORDER BY subname"


@dataclass(frozen=True)
class ReplicationError:
    """Classified setup failure: ``code`` is stable for programmatic
    handling, ``hint`` is the operator guidance the reference prints."""

    code: str
    hint: str
    retriable: bool = False


def classify_publication_error(err_str: str, publication_name: str) -> ReplicationError:
    """The publication error arms (publication.rs:176-213). ``already
    exists`` maps to code ``ok`` — the reference treats it as success."""
    low = err_str.lower()
    if "already exists" in low:
        return ReplicationError("ok", f"Publication {publication_name!r} already exists")
    if "permission denied" in low or "must be owner" in low:
        return ReplicationError(
            "permission",
            "Need superuser or owner privileges on the database. "
            "Grant with: GRANT CREATE ON DATABASE <dbname> TO <user>;",
        )
    if "wal_level" in low or "logical replication" in low:
        return ReplicationError(
            "wal_level",
            "The database parameter 'wal_level' must be set to 'logical' "
            "in postgresql.conf (requires a server restart).",
        )
    return ReplicationError(
        "unknown",
        "Common causes: insufficient privileges (need CREATE on database); "
        "logical replication not enabled (wal_level must be 'logical'); "
        "database does not support publications.",
    )


def classify_subscription_error(
    err_str: str, subscription_name: str, publication_name: str
) -> ReplicationError:
    """The subscription error arms (subscription.rs:100-163), in the
    reference's match order — e.g. a missing publication is reported as
    such even though the message also contains 'connection'."""
    low = err_str.lower()
    if "already exists" in low:
        return ReplicationError(
            "ok", f"Subscription {subscription_name!r} already exists"
        )
    if "permission denied" in low or "must be superuser" in low:
        return ReplicationError(
            "permission",
            "Only superusers can create subscriptions. Ask an administrator "
            "to grant superuser or create the subscription on your behalf.",
        )
    if "publication" in low and "does not exist" in low:
        return ReplicationError(
            "publication_missing",
            f"The publication {publication_name!r} was not found on the "
            "source database; create it before the subscription.",
        )
    if "could not connect to the publisher" in low or "connection" in low:
        return ReplicationError(
            "connection",
            "Verify the source is reachable from the target, the connection "
            "string is correct, firewall rules allow it, and the source user "
            "has the REPLICATION privilege.",
            retriable=True,
        )
    if "replication slot" in low:
        return ReplicationError(
            "replication_slot",
            "The source may have hit max_replication_slots; check and raise "
            "it or drop unused slots.",
        )
    return ReplicationError(
        "unknown",
        "Common causes: insufficient privileges (need SUPERUSER on target); "
        "publication missing on source; source unreachable; "
        "max_replication_slots reached.",
    )


def logical_replication_plan(
    publication_name: str,
    subscription_name: str,
    source_connection_string: str,
    tables: list[tuple[str, str]] | None = None,
    db_name: str = "",
    filter: ReplicationFilter | None = None,
    server_version: int | None = None,
) -> dict[str, list[str]]:
    """The ordered statement plan for a full logical-replication setup:
    ``source`` statements run on the publisher, ``target`` on the
    subscriber, then the caller polls ST8's ``wait_for_caught_up``. The
    version probe is listed first so the PG15 predicate gate can be
    evaluated against the real server when ``server_version`` is not
    pre-known."""
    return {
        "source_probe": [SERVER_VERSION_SQL],
        "source": [
            create_publication_sql(
                publication_name,
                tables,
                db_name=db_name,
                filter=filter,
                server_version=server_version,
            )
        ],
        "target": [
            create_subscription_sql(
                subscription_name, source_connection_string, publication_name
            )
        ],
    }


def fetch_slot_changes(
    dsn: str,
    slot: str,
    publications: list[str],
    start_lsn: int = 0,
    proto_version: int = 1,
) -> dict:
    """Consume one logical-replication walsender session end to end:
    connect with ``replication=database``, START_REPLICATION, demux
    XLogData/keepalive frames, ack via standby status updates, and
    decode the received pgoutput messages into change rows
    (:func:`pgoutput.decode_pgoutput_stream`). Returns ``{"changes":
    [...], "acked_lsn": n, "n_frames": n, "keepalives": n}``.

    This is the live-slot envelope that was the declared S22/S24 gap:
    the wire client (pgwire.PgWireReplicationClient) and the codec
    (sources/pgoutput.py) compose here, exercised in-sandbox against the
    walsender-speaking test server (tests/pgwire_server.py) and usable
    unchanged against a trust-auth PostgreSQL ≥10 cluster. Remaining
    real-cluster deltas: MD5/SCRAM auth and TLS (psycopg territory,
    declared in README).

    Distributed shape: ONE slot is inherently a single ordered stream
    (Postgres ships a slot's WAL serially) — parallelism comes from
    sharding across slots/publications upstream, which is exactly how
    :func:`queries_r12.cdc_pgoutput_decode` shards decode work."""
    import struct as _struct

    from .pgoutput import decode_pgoutput_stream
    from .pgwire import PgWireReplicationClient

    client = PgWireReplicationClient.from_dsn(dsn)
    client.connect()
    try:
        out = client.start_replication(
            slot, publications, start_lsn=start_lsn, proto_version=proto_version
        )
    finally:
        client.close()
    stream = b"".join(
        _struct.pack("!I", len(p)) + p for _lsn, p in out["frames"]
    )
    return {
        "changes": decode_pgoutput_stream(stream),
        "acked_lsn": out["acked_lsn"],
        "n_frames": len(out["frames"]),
        "keepalives": out["keepalives"],
    }
