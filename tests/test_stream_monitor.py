"""ST7/ST8: streaming status/lag reporting."""

import os

from database_replicator_spark.streaming.change_stream import (
    start_change_apply,
    write_change_file,
)
from database_replicator_spark.streaming.monitor import (
    stream_status,
    wait_for_caught_up,
)


def test_stream_status_and_catchup(spark, tmp_path):
    src = str(tmp_path / "q")
    write_change_file(
        os.path.join(src, "c1.json"),
        [
            {"change_id": i, "table": "t", "op": "insert", "pk": str(i), "payload": "{}"}
            for i in range(50)
        ],
    )
    query, _ = start_change_apply(
        spark, src, str(tmp_path / "t"), str(tmp_path / "c"), once=True
    )
    assert wait_for_caught_up(query, timeout_seconds=120)
    query.awaitTermination(60)
    st = stream_status(query)
    assert not st.is_active          # AvailableNow run terminated
    assert st.batches_completed >= 1
    assert st.processed_rows_per_second > 0
    assert st.last_batch_duration_ms is not None


def test_crashed_stream_raises_not_caught_up(spark, tmp_path):
    """A stream whose foreachBatch fails must surface its error, never a
    false 'caught up' (the code-review finding this test pins)."""
    import pytest

    src = str(tmp_path / "q")
    write_change_file(
        os.path.join(src, "c1.json"),
        [{"change_id": 1, "table": "t", "op": "insert", "pk": "1", "payload": "{}"}],
    )
    # target path is a FILE → parquet writes inside foreachBatch blow up
    target_file = tmp_path / "target"
    target_file.write_text("not a directory")
    query, _ = start_change_apply(
        spark, src, str(target_file), str(tmp_path / "c"), once=True
    )
    try:
        query.awaitTermination(120)
    except Exception:
        pass  # termination may already raise; wait_for_caught_up must too
    with pytest.raises(Exception):
        wait_for_caught_up(query, timeout_seconds=30)


def test_unstarted_backlog_not_caught_up(spark):
    """stream_status on a query with no progress yet must not report
    caught_up (empty-dict defaults previously satisfied the condition)."""

    class FakeQuery:
        lastProgress = None
        status = {"isDataAvailable": False}
        isActive = True
        name = None

    st = stream_status(FakeQuery())
    assert not st.caught_up
    assert st.batches_completed == 0


class _Fake:
    """Configurable StreamingQuery stand-in."""

    def __init__(self, active=True, exc=None, progress=None, data_available=False):
        self.isActive = active
        self._exc = exc
        self.lastProgress = progress
        self.status = {"isDataAvailable": data_available}
        self.name = None

    def exception(self):
        return self._exc


def test_subscription_state_machine():
    from database_replicator_spark.streaming.monitor import (
        STATE_COPYING,
        STATE_ERROR,
        STATE_INITIALIZING,
        STATE_STREAMING,
        STATE_SYNCING,
        subscription_state,
    )

    # terminated with error → error
    assert subscription_state(_Fake(active=False, exc=RuntimeError("x"))) == STATE_ERROR
    # clean AvailableNow termination → streaming
    assert subscription_state(_Fake(active=False)) == STATE_STREAMING
    # active, no progress yet → initializing
    assert subscription_state(_Fake(progress=None)) == STATE_INITIALIZING
    # first batch, backlog → copying
    assert subscription_state(
        _Fake(progress={"batchId": 0, "numInputRows": 10}, data_available=True)
    ) == STATE_COPYING
    # later batch, backlog → syncing
    assert subscription_state(
        _Fake(progress={"batchId": 5, "numInputRows": 10}, data_available=True)
    ) == STATE_SYNCING
    # no data left → streaming
    assert subscription_state(
        _Fake(progress={"batchId": 5, "numInputRows": 0}, data_available=False)
    ) == STATE_STREAMING


def test_subscription_state_on_live_availablenow(spark, tmp_path):
    src = str(tmp_path / "q")
    write_change_file(
        os.path.join(src, "c1.json"),
        [{"change_id": 1, "table": "t", "op": "insert", "pk": "1", "payload": "{}"}],
    )
    query, _ = start_change_apply(
        spark, src, str(tmp_path / "t"), str(tmp_path / "c"), once=True
    )
    query.awaitTermination(120)
    from database_replicator_spark.streaming.monitor import (
        STATE_STREAMING,
        subscription_state,
    )

    assert subscription_state(query) == STATE_STREAMING
