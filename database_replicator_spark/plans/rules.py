"""Replication plan objects: table selection + per-table predicates.

This is the engine's only "query plan" surface for replication parity, the
analogue of the reference's ``ReplicationFilter`` (src/filters.rs:10-17) and
``TableRules`` (src/table_rules.rs:174-378). Semantics reproduced:

  * ``db.schema.table`` / ``db.table`` / ``table`` parsing with default
    schema ``public`` (src/table_rules.rs:24-75).
  * include/exclude lists are mutually exclusive; ``include_tables`` implies
    the database set (src/filters.rs:27-55, 155-174).
  * per-table SQL predicates (``--table-filter "t:pred"``,
    src/table_rules.rs:211-226) compiled to ``DataFrame.filter(expr(...))``.
  * time-window filters (``--time-filter "t:col:6 months"``) normalized to
    ``col >= NOW() - INTERVAL 'n unit'`` (src/table_rules.rs:479-517).
  * schema-only marking (DDL copied, data skipped, src/table_rules.rs:204-209).
  * scope precedence: database-scoped rule overrides global; schema-only >
    table-filter > time-filter conflicts rejected (src/table_rules.rs:228-255,
    404-430).
  * SHA-256 fingerprint over the canonicalized rule set for checkpoint
    validation (src/filters.rs:81-108, src/table_rules.rs:365-373).

Everything here is driver-side pure Python — deliberately Spark-free so it is
unit-testable without a session and adds zero overhead at 100 TB scale.
"""

from __future__ import annotations

import hashlib
import json
import re
from dataclasses import dataclass, field


class RuleConflictError(ValueError):
    """Raised when rules contradict (include+exclude, schema-only+filter...)."""


#: unit aliases accepted by time-window filters (src/table_rules.rs:479-517)
_TIME_UNITS = {
    "second": "second", "seconds": "second", "sec": "second", "secs": "second", "s": "second",
    "minute": "minute", "minutes": "minute", "min": "minute", "mins": "minute", "m": "minute",
    "hour": "hour", "hours": "hour", "hr": "hour", "hrs": "hour", "h": "hour",
    "day": "day", "days": "day", "d": "day",
    "week": "week", "weeks": "week", "w": "week",
    "month": "month", "months": "month", "mo": "month",
    "year": "year", "years": "year", "yr": "year", "yrs": "year", "y": "year",
}

_IDENT_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_$]*$")


def quote_ident(name: str) -> str:
    """Double-quote an SQL identifier, doubling embedded quotes
    (anti-injection; reference src/utils.rs:392-465)."""
    return '"' + name.replace('"', '""') + '"'


def validate_ident(name: str) -> str:
    """Whitelist-validate a bare identifier; raise on anything that would
    need quoting tricks (reference rejects rather than escapes for table
    names arriving from CLI args)."""
    if not _IDENT_RE.match(name):
        raise ValueError(f"invalid identifier: {name!r}")
    return name


def normalize_time_window(spec: str) -> tuple[int, str]:
    """Parse ``"6 months"`` → ``(6, 'month')``.

    Positive integer amounts only; unit aliases per the table above
    (reference src/table_rules.rs:479-517).
    """
    m = re.match(r"^\s*(\d+)\s*([A-Za-z]+)\s*$", spec)
    if not m:
        raise ValueError(f"invalid time window: {spec!r}")
    amount = int(m.group(1))
    if amount <= 0:
        raise ValueError(f"time window amount must be positive: {spec!r}")
    unit = _TIME_UNITS.get(m.group(2).lower())
    if unit is None:
        raise ValueError(f"unknown time unit in: {spec!r}")
    return amount, unit


@dataclass(frozen=True)
class QualifiedTable:
    """``database.schema.table`` with default schema ``public``
    (reference src/table_rules.rs:24-75)."""

    database: str | None
    schema: str
    table: str

    @classmethod
    def parse(cls, spec: str) -> "QualifiedTable":
        parts = spec.split(".")
        if any(p == "" for p in parts):
            raise ValueError(f"empty component in table spec: {spec!r}")
        if len(parts) == 1:
            return cls(None, "public", parts[0])
        if len(parts) == 2:
            return cls(parts[0], "public", parts[1])
        if len(parts) == 3:
            return cls(parts[0], parts[1], parts[2])
        raise ValueError(f"too many components in table spec: {spec!r}")

    def key(self) -> str:
        return f"{self.database or '*'}.{self.schema}.{self.table}"

    def matches(self, database: str, schema: str, table: str) -> bool:
        if self.database is not None and self.database != database:
            return False
        return self.schema == schema and self.table == table


@dataclass
class _Rule:
    predicate: str | None = None          # raw SQL predicate (P3)
    time_column: str | None = None        # time-window filter (P4)
    time_amount: int | None = None
    time_unit: str | None = None
    schema_only: bool = False             # P5

    def effective_predicate(self) -> str | None:
        """The single WHERE-clause string for this rule.

        Time windows normalize to ``"col" >= NOW() - INTERVAL 'n unit'``
        exactly like the reference (src/table_rules.rs:153-166); callers on
        the Spark side translate NOW()/INTERVAL to Catalyst expressions via
        :func:`TableRules.spark_predicate`.
        """
        if self.predicate is not None:
            return self.predicate
        if self.time_column is not None:
            return (
                f"{quote_ident(self.time_column)} >= "
                f"NOW() - INTERVAL '{self.time_amount} {self.time_unit}'"
            )
        return None


@dataclass
class TableRules:
    """Per-table rules with Global < Database(db) scope precedence
    (reference src/table_rules.rs:184-201, 320-357)."""

    _rules: dict[str, _Rule] = field(default_factory=dict)

    @staticmethod
    def _key(qt: QualifiedTable) -> str:
        return qt.key()

    def _rule_slot(self, qt: QualifiedTable) -> _Rule:
        return self._rules.setdefault(qt.key(), _Rule())

    def add_predicate(self, table_spec: str, predicate: str) -> None:
        qt = QualifiedTable.parse(table_spec)
        rule = self._rule_slot(qt)
        if rule.schema_only:
            raise RuleConflictError(
                f"{qt.key()}: table-filter conflicts with schema-only"
            )
        if rule.time_column is not None:
            raise RuleConflictError(
                f"{qt.key()}: table-filter conflicts with time-filter"
            )
        if not predicate.strip():
            raise ValueError("empty predicate")
        rule.predicate = predicate.strip()

    def add_time_filter(self, table_spec: str, column: str, window: str) -> None:
        qt = QualifiedTable.parse(table_spec)
        rule = self._rule_slot(qt)
        if rule.schema_only:
            raise RuleConflictError(
                f"{qt.key()}: time-filter conflicts with schema-only"
            )
        if rule.predicate is not None:
            raise RuleConflictError(
                f"{qt.key()}: time-filter conflicts with table-filter"
            )
        amount, unit = normalize_time_window(window)
        validate_ident(column)
        rule.time_column = column
        rule.time_amount = amount
        rule.time_unit = unit

    def add_schema_only(self, table_spec: str) -> None:
        qt = QualifiedTable.parse(table_spec)
        rule = self._rule_slot(qt)
        if rule.predicate is not None or rule.time_column is not None:
            raise RuleConflictError(
                f"{qt.key()}: schema-only conflicts with an existing filter"
            )
        rule.schema_only = True

    def is_empty(self) -> bool:
        return not self._rules

    def rule_for_table(self, database: str, schema: str, table: str) -> _Rule | None:
        """Database-scoped rule wins over global (src/table_rules.rs:320-357)."""
        db_key = f"{database}.{schema}.{table}"
        glob_key = f"*.{schema}.{table}"
        if db_key in self._rules:
            return self._rules[db_key]
        return self._rules.get(glob_key)

    def predicate_for(self, database: str, schema: str, table: str) -> str | None:
        rule = self.rule_for_table(database, schema, table)
        return rule.effective_predicate() if rule else None

    def is_schema_only(self, database: str, schema: str, table: str) -> bool:
        rule = self.rule_for_table(database, schema, table)
        return bool(rule and rule.schema_only)

    def spark_predicate(self, database: str, schema: str, table: str) -> str | None:
        """The predicate translated for ``F.expr``: ``NOW()`` →
        ``current_timestamp()``; INTERVAL syntax is shared."""
        pred = self.predicate_for(database, schema, table)
        if pred is None:
            return None
        return pred.replace("NOW()", "current_timestamp()")

    def fingerprint_payload(self) -> dict:
        return {
            key: {
                "predicate": r.predicate,
                "time": [r.time_column, r.time_amount, r.time_unit]
                if r.time_column
                else None,
                "schema_only": r.schema_only,
            }
            for key, r in sorted(self._rules.items())
        }


@dataclass
class ReplicationFilter:
    """Database/table include-exclude selection (reference src/filters.rs).

    Validation (src/filters.rs:27-55): include and exclude lists are mutually
    exclusive per level; ``include_tables`` entries must be ``db.table``
    qualified and imply the database include set.
    """

    include_databases: list[str] = field(default_factory=list)
    exclude_databases: list[str] = field(default_factory=list)
    include_tables: list[str] = field(default_factory=list)
    exclude_tables: list[str] = field(default_factory=list)
    rules: TableRules = field(default_factory=TableRules)

    #: system objects always skipped (reference src/migration/schema.rs:36-44,
    #: sqlite reader.rs:41-44, mongodb reader.rs:47-51)
    SYSTEM_DATABASES = frozenset({"template0", "template1", "postgres", "rdsadmin"})
    SYSTEM_SCHEMAS = frozenset({"pg_catalog", "information_schema"})

    def __post_init__(self) -> None:
        if self.include_databases and self.exclude_databases:
            raise RuleConflictError("include and exclude databases are mutually exclusive")
        if self.include_tables and self.exclude_tables:
            raise RuleConflictError("include and exclude tables are mutually exclusive")
        for t in self.include_tables + self.exclude_tables:
            if "." not in t:
                raise RuleConflictError(f"table spec must be db.table: {t!r}")

    def is_empty(self) -> bool:
        """No selection or rules at all → replicate everything (the
        reference's filter.is_empty() publication fast path)."""
        return not (
            self.include_databases
            or self.exclude_databases
            or self.include_tables
            or self.exclude_tables
        ) and self.rules.is_empty()

    def databases_to_check(self, all_databases: list[str]) -> list[str]:
        """Sorted, deduped database working set (src/filters.rs:155-174)."""
        if self.include_tables:
            dbs = {t.split(".", 1)[0] for t in self.include_tables}
            dbs |= set(self.include_databases)
            return sorted(dbs)
        if self.include_databases:
            return sorted(set(self.include_databases))
        return sorted(d for d in set(all_databases) if self.should_replicate_database(d))

    def should_replicate_database(self, database: str) -> bool:
        if database in self.SYSTEM_DATABASES:
            return False
        if self.include_databases or self.include_tables:
            implied = {t.split(".", 1)[0] for t in self.include_tables}
            return database in set(self.include_databases) | implied
        if self.exclude_databases:
            return database not in self.exclude_databases
        return True

    def should_replicate_table(self, database: str, table: str, schema: str = "public") -> bool:
        if not self.should_replicate_database(database):
            return False
        if schema in self.SYSTEM_SCHEMAS or table.startswith("sqlite_") or schema == "system":
            return False
        qualified = f"{database}.{table}"
        if self.include_tables:
            return qualified in self.include_tables
        if self.exclude_tables:
            return qualified not in self.exclude_tables
        return True

    def fingerprint(self) -> str:
        """SHA-256 over the canonical JSON of the whole filter config
        (reference src/filters.rs:81-108); checkpoints resume only when the
        fingerprint matches."""
        payload = {
            "include_databases": sorted(self.include_databases),
            "exclude_databases": sorted(self.exclude_databases),
            "include_tables": sorted(self.include_tables),
            "exclude_tables": sorted(self.exclude_tables),
            "rules": self.rules.fingerprint_payload(),
        }
        blob = json.dumps(payload, sort_keys=True, separators=(",", ":"))
        return hashlib.sha256(blob.encode()).hexdigest()


def load_rules_config(path: str) -> ReplicationFilter:
    """Load a reference-format TOML replication config (src/config.rs):

    .. code-block:: toml

        [databases.appdb]
        schema_only = ["public.audit_log"]

        [[databases.appdb.table_filters]]
        table = "public.orders"
        where = "o_totalprice > 100"

        [[databases.appdb.time_filters]]
        table = "events"
        column = "ts"
        last = "30d"

    Every table spec may be ``table`` or ``schema.table`` (an explicit
    ``schema`` field overrides, like the reference), and each section maps
    onto the same TableRules calls the CLI flags use — a reference user's
    existing config file drives this engine unchanged. Parsed with the
    stdlib ``tomllib``; raises ``RuleConflictError`` on the same conflicts
    the flag path rejects."""
    import tomllib

    with open(path, "rb") as fh:
        parsed = tomllib.load(fh)

    rules = TableRules()
    for db_name, db in (parsed.get("databases") or {}).items():
        def _spec(entry_table: str, entry_schema: str | None) -> str:
            if entry_schema:
                return f"{db_name}.{entry_schema}.{entry_table}"
            if "." in entry_table:
                return f"{db_name}.{entry_table}"
            return f"{db_name}.{entry_table}"

        for table in db.get("schema_only", []):
            rules.add_schema_only(_spec(table, None))
        for filt in db.get("table_filters", []):
            if "table" not in filt or "where" not in filt:
                raise RuleConflictError(
                    f"table_filters entries need 'table' and 'where': {filt!r}"
                )
            rules.add_predicate(_spec(filt["table"], filt.get("schema")), filt["where"])
        for filt in db.get("time_filters", []):
            for req in ("table", "column", "last"):
                if req not in filt:
                    raise RuleConflictError(
                        f"time_filters entries need 'table', 'column', 'last': {filt!r}"
                    )
            rules.add_time_filter(
                _spec(filt["table"], filt.get("schema")), filt["column"], filt["last"]
            )
    return ReplicationFilter(rules=rules)
