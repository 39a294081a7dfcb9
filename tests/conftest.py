from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from database_replicator_spark.session import build_session  # noqa: E402

SF_SMALL = "/root/testdata/sf0.001"
SF_MEDIUM = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    # worker reuse off: across ~175 tests in one session, reused Python
    # workers occasionally die and surface as ClosedChannelException on
    # the next mapInPandas/pandas_udf task (a rare-but-real local-mode
    # flake); fresh workers cost a little startup and remove it
    # AQE initial-partition ceiling pinned to the test shuffle width:
    # session.py leaves it unset locally (probe runs raise it via
    # SPARK_GRAFT_AQE_INITIAL), so this pin only guards against env
    # leakage into the test session — a high ceiling multiplies every
    # toy-data shuffle's pre-coalesce task count, and with worker reuse
    # off extra tasks spawn fresh Python workers (measured 5:48 -> 5:00
    # on tests/test_dedup_similarity.py at ceiling 512 vs 8).
    s = build_session(
        "tests",
        shuffle_partitions=8,
        extra_conf={
            "spark.python.worker.reuse": "false",
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum": "8",
        },
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMALL
