"""Checkpoint/resume for multi-database snapshot runs.

Reference: per-database completion set + metadata (source/target hash,
filter fingerprint, flags) persisted as JSON; a resume is only honored when
every fingerprint matches, otherwise the checkpoint is discarded and the
run restarts (src/checkpoint.rs:14-144, driver logic
src/commands/init.rs:275-343)."""

from __future__ import annotations

import hashlib
import json
import os
import time
from dataclasses import dataclass


def _ident_hash(value: str) -> str:
    return hashlib.sha256(value.encode()).hexdigest()[:16]


@dataclass
class SnapshotCheckpoint:
    path: str
    source_id: str
    target_id: str
    filter_fingerprint: str

    def _meta(self) -> dict:
        return {
            "source_hash": _ident_hash(self.source_id),
            "target_hash": _ident_hash(self.target_id),
            "filter_fingerprint": self.filter_fingerprint,
        }

    def load(self) -> dict | None:
        """Return checkpoint state iff metadata matches; discard otherwise
        (the reference's mismatch ⇒ restart rule)."""
        if not os.path.exists(self.path):
            return None
        with open(self.path) as fh:
            state = json.load(fh)
        if state.get("meta") != self._meta():
            os.remove(self.path)
            return None
        return state

    def completed_databases(self) -> set[str]:
        state = self.load()
        return set(state["completed"]) if state else set()

    def mark_completed(self, database: str) -> None:
        state = self.load() or {"meta": self._meta(), "completed": [], "updated_at": None}
        if database not in state["completed"]:
            state["completed"].append(database)
        state["updated_at"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
        tmp = self.path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(state, fh, indent=2)
        os.replace(tmp, self.path)

    def clear(self) -> None:
        if os.path.exists(self.path):
            os.remove(self.path)


def validate_source_target_different(source_id: str, target_id: str) -> None:
    """Anti-data-loss guard (utils.rs:602-655): refuse to run when source
    and target resolve to the same endpoint."""
    if source_id.strip().rstrip("/") == target_id.strip().rstrip("/"):
        raise ValueError(
            f"source and target are identical ({source_id!r}) — refusing to replicate"
        )
