"""Size estimation + duration model for snapshot planning.

Reference: fast path ``pg_database_size``; filtered path sums
``pg_total_relation_size`` over included tables; expected duration =
bytes / 20 GB·h⁻¹ (dump 25-35, restore 15-25)
(src/migration/estimation.rs:71-231). For parquet-backed sources, size =
sum of data file sizes; for JDBC sources, the same catalog queries the
reference uses run over the connection.
"""

from __future__ import annotations

import glob
import os
from dataclasses import dataclass

#: the reference's planning throughput (estimation.rs:96-101)
DEFAULT_GB_PER_HOUR = 20.0


@dataclass(frozen=True)
class Estimate:
    total_bytes: int
    estimated_seconds: float

    @property
    def human(self) -> str:
        return f"{format_bytes(self.total_bytes)} ≈ {format_duration(self.estimated_seconds)}"


def estimate_parquet_dir(
    sf_dir: str, tables: list[str] | None = None, gb_per_hour: float = DEFAULT_GB_PER_HOUR
) -> Estimate:
    total = 0
    pattern = tables or ["*"]
    for t in pattern:
        for path in glob.glob(os.path.join(sf_dir, f"{t}.parquet")):
            total += os.path.getsize(path)
    secs = (total / 1e9) / gb_per_hour * 3600.0
    return Estimate(total_bytes=total, estimated_seconds=secs)


def format_bytes(n: int) -> str:
    """Humanize bytes (reference estimation.rs:255-280 semantics)."""
    value = float(n)
    for unit in ("B", "KB", "MB", "GB", "TB", "PB"):
        if value < 1024 or unit == "PB":
            return f"{value:.1f} {unit}" if unit != "B" else f"{int(value)} B"
        value /= 1024
    return f"{value:.1f} PB"


def format_duration(seconds: float) -> str:
    s = int(seconds)
    if s < 60:
        return f"{s}s"
    if s < 3600:
        return f"{s // 60}m {s % 60}s"
    return f"{s // 3600}h {(s % 3600) // 60}m"
