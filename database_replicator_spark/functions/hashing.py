"""Portable deterministic hashing helpers.

``hash60`` maps a string to a non-negative 60-bit integer via the first 15
hex digits of md5 — computable identically in Spark
(``conv(substr(md5(s),1,15),16,10)``) and DuckDB
(``CAST('0x'||substr(md5(s),1,15) AS BIGINT)``), which makes minhash /
simhash / LSH constructions oracle-checkable. The scale path can swap in
``xxhash64`` (cheaper, JVM-native) wherever cross-engine parity is not
needed; the construction is otherwise unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hash60(col: Column) -> Column:
    """Non-negative 60-bit integer hash of a string column."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def hash60_sql(expr: str) -> str:
    """The DuckDB-SQL rendering of :func:`hash60` for oracle queries."""
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"


def hash60_tail(col: Column) -> Column:
    """Second independent 60-bit value from the SAME md5 digest (hex chars
    17-31). Pairing this with :func:`hash60` gives two Carter-Wegman base
    hashes for ONE md5 evaluation per row — md5's output bits are
    independent across the digest, and halving the digest count halved the
    measured minhash aggregation cost."""
    return F.conv(F.substring(F.md5(col), 17, 15), 16, 10).cast("bigint")


def hash60_tail_sql(expr: str) -> str:
    """The DuckDB-SQL rendering of :func:`hash60_tail` for oracle queries."""
    return f"CAST('0x' || substr(md5({expr}), 17, 15) AS BIGINT)"


def seeded(col: Column, seed: int) -> Column:
    """Seed-diversified string for independent hash families."""
    return F.concat(F.lit(f"{seed}:"), col)


def seeded_sql(expr: str, seed: int) -> str:
    return f"'{seed}:' || {expr}"
