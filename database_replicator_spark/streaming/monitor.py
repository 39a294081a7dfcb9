"""Streaming lag/status monitoring — ST7/ST8 parity.

Reference: `status` reads pg_stat_replication/pg_stat_subscription (sent/
write/flush/replay LSN + lag ms; "caught up" = replay lag < 1 s,
src/replication/monitor.rs:31-95) and the subscription state machine polls
srsubstate until streaming (subscription.rs:205-331).

Spark mapping: a StreamingQuery's ``lastProgress``/``status``/
``recentProgress`` carry the same signals — rows/sec, batch durations,
backlog. "Caught up" = at least one batch has run, the source reports no
data available, and the last batch had no input rows.
"""

from __future__ import annotations

import time
from dataclasses import dataclass


@dataclass(frozen=True)
class StreamStatus:
    query_name: str | None
    is_active: bool
    caught_up: bool
    #: lifetime batch count from the checkpoint-global batchId — survives
    #: restarts, so it counts ALL runs against this checkpoint, not just
    #: the current process's
    batches_completed: int
    input_rows_per_second: float
    processed_rows_per_second: float
    last_batch_duration_ms: int | None
    num_input_rows: int


def stream_status(query) -> StreamStatus:
    """Summarize a StreamingQuery into the reference's lag-report shape.

    ``caught_up`` is False until the query has produced at least one
    progress event — a just-started query with an unpolled backlog must
    not report as caught up."""
    progress = query.lastProgress or {}
    status = query.status or {}
    duration_ms = (progress.get("durationMs") or {}).get("triggerExecution")
    caught_up = (
        bool(progress)
        and not status.get("isDataAvailable", False)
        and progress.get("numInputRows", 0) == 0
    )
    return StreamStatus(
        query_name=progress.get("name") or query.name,
        is_active=query.isActive,
        caught_up=caught_up,
        batches_completed=int(progress.get("batchId", -1)) + 1,
        input_rows_per_second=float(progress.get("inputRowsPerSecond", 0.0) or 0.0),
        processed_rows_per_second=float(
            progress.get("processedRowsPerSecond", 0.0) or 0.0
        ),
        last_batch_duration_ms=duration_ms,
        num_input_rows=int(progress.get("numInputRows", 0)),
    )


#: reference srsubstate codes → names (subscription.rs:205-331)
STATE_STREAMING = "streaming"        # 'r' — replicating, caught up or keeping up
STATE_INITIALIZING = "initializing"  # 'i' — subscription created, no data yet
STATE_COPYING = "copying"            # 'd' — initial table copy in flight
STATE_SYNCING = "syncing"            # 's' — catching up a backlog
STATE_ERROR = "error"


def subscription_state(query) -> str:
    """Map a StreamingQuery onto the reference's subscription state machine
    (srsubstate → Streaming/Initializing/Copying/Syncing/Error):

      * terminated with an exception        → error
      * terminated cleanly (AvailableNow)   → streaming (it consumed its
        committed range — the reference's 'r' after wait_for_sync)
      * active, no progress events yet      → initializing
      * active, first batch still running   → copying (the initial sync)
      * active, caught up                   → streaming
      * active, draining a backlog          → syncing
    """
    if not query.isActive:
        return STATE_ERROR if query.exception() is not None else STATE_STREAMING
    progress = query.lastProgress
    if not progress:
        return STATE_INITIALIZING
    st = stream_status(query)
    if st.caught_up:
        return STATE_STREAMING
    if st.batches_completed <= 1:
        return STATE_COPYING
    return STATE_SYNCING


def wait_for_caught_up(query, timeout_seconds: float = 300.0, poll_seconds: float = 2.0) -> bool:
    """ST8's ``wait_for_sync`` analogue: poll until the stream has consumed
    all available input (or timeout; default 300 s / 2 s like
    subscription.rs:205-331). Returns True when caught up; raises the
    stream's own error if it terminated exceptionally (a crashed stream is
    NOT caught up); returns False on timeout or on a query stopped
    mid-backlog."""

    def check() -> bool | None:
        if not query.isActive:
            exc = query.exception()
            if exc is not None:
                raise exc
            # clean termination: AvailableNow consumed everything it
            # committed to. (A continuous query stop()ed mid-backlog also
            # lands here — callers doing manual stops should consult
            # stream_status BEFORE stopping.)
            return True
        st = stream_status(query)
        return True if st.caught_up else None

    deadline = time.monotonic() + timeout_seconds
    while True:
        result = check()
        if result is not None:
            return result
        remaining = deadline - time.monotonic()
        if remaining <= 0:
            final = check()
            return bool(final)
        time.sleep(min(poll_seconds, remaining))
