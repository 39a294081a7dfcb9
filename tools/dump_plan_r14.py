"""Dump plans/r14/<gate>_<suffix>.txt — `.explain("formatted")` at sf0.1
for the gates touched in optimization round 14.

Usage: python tools/dump_plan_r14.py <suffix> <gate> [gate ...]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    suffix, gates = sys.argv[1], sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from database_replicator_spark import queries as q
    from database_replicator_spark.session import build_session

    spark = build_session("dump_plan_r14")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs("/root/repo/plans/r14", exist_ok=True)
    for name in gates:
        df = q.all_queries()[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = f"/root/repo/plans/r14/{name}_{suffix}.txt"
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path} ({len(buf.getvalue())} bytes)")
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
