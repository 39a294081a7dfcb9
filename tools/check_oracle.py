"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry from ``__spark_entry__`` against the matching
``oracle_sql()`` DuckDB query on the same parquet tables, and compares
row count, column names, and (order-insensitively) values. Use while
iterating so hash mismatches are caught before the driver runs.

Driver-faithful canonicalization (the r6 lesson): BOTH result sets are
materialized as pandas DataFrames — Spark via ``toPandas()``, DuckDB via
``.df()`` — exactly like the driver, NOT via ``fetchall()``. DuckDB
renders a bare integer ``SUM(CASE…)`` as HUGEINT, which pandas widens to
float64 (``3791.0``) while Spark emits int64 (``3791``): value-identical
under ``fetchall()`` (HUGEINT → Python int) yet hash-different in the
driver. Hence two extra rejections beyond value equality:

* **dtype-kind mismatch** — any output column whose pandas dtype *kind*
  (int/float/object/datetime/bool) differs between the Spark and oracle
  frames fails the gate even when every value renders identically;
* **unhashable output** — any object column containing list/ndarray/
  dict/tuple values fails (the driver's pandas sort raises
  ``TypeError: unhashable type`` on them — CORRECTNESS_r06
  ``doc_keyword_postings``). Arrays must be string-joined on both sides.

Usage: python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import datetime
import math
import sys

sys.path.insert(0, "/root/repo")


def canon_value(v):
    """Canonicalize a scalar for cross-engine comparison."""
    import numpy as np

    if v is None:
        return "∅"
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, (np.floating,)):
        v = float(v)
    if isinstance(v, (np.integer,)):
        v = int(v)
    if isinstance(v, float):
        return repr(v)  # exact double repr
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, (list, tuple)) or isinstance(v, np.ndarray):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return repr(float(v))
    except ImportError:
        pass
    return repr(v)


def rows_to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        "\x1f".join(canon_value(r[i]) for i in order) for r in rows
    )


def pdf_problems(s_pdf, d_pdf):
    """Driver-faithfulness checks on the two pandas frames.

    Returns a list of problem strings: dtype-KIND mismatches per column
    (int64 vs float64 is the HUGEINT leak; exact-dtype equality is NOT
    required — datetime64[ns] vs datetime64[us] both render the same) and
    unhashable object-column payloads (lists/ndarrays crash the driver's
    pandas ``sort_values`` canonicalizer).
    """
    import numpy as np

    problems = []
    shared = sorted(set(s_pdf.columns) & set(d_pdf.columns))
    for c in shared:
        sk, dk = s_pdf[c].dtype.kind, d_pdf[c].dtype.kind
        # unify signed/unsigned int kinds; treat everything else strictly
        norm = {"u": "i"}
        if norm.get(sk, sk) != norm.get(dk, dk):
            problems.append(
                f"dtype kind mismatch on {c!r}: spark={s_pdf[c].dtype} "
                f"oracle={d_pdf[c].dtype} (driver hashes pandas renderings "
                f"— int64 3791 vs float64 3791.0 differ)"
            )
    for side, pdf in (("spark", s_pdf), ("oracle", d_pdf)):
        for c in pdf.columns:
            if pdf[c].dtype.kind != "O":
                continue
            bad = pdf[c].map(
                lambda v: isinstance(v, (list, tuple, dict, set, np.ndarray))
            )
            if bad.any():
                problems.append(
                    f"unhashable {side} output column {c!r} "
                    "(array/struct values crash the driver's pandas sort "
                    "— string-join them on both sides)"
                )
    return problems


def main() -> int:
    import duckdb

    import __spark_entry__ as entry_mod
    from database_replicator_spark.session import build_session

    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        args = args[:i] + args[i + 2 :]
    if args and args[0] == "--scales":
        # three-scale sweep in ONE session: the idiom for validating new
        # gates (scale-dependent tie/rounding bugs only show at some SFs)
        rc = 0
        spark = build_session("check_oracle")
        sweep: dict = {}
        for sf in ("0.001", "0.01", "0.1"):
            print(f"--- sf{sf}")
            results: dict = {}
            rc |= _run(spark, f"/root/testdata/sf{sf}", set(args[1:]),
                       entry_mod, duckdb, results=results)
            sweep[f"sf{sf}"] = results
        spark.stop()
        if json_out:
            import json

            n_gates = len(entry_mod.queries())
            n_ok = sum(
                1 for per_sf in sweep.values()
                for st in per_sf.values() if st.startswith("ok")
            )
            with open(json_out, "w") as fh:
                json.dump(
                    {"n_gates": n_gates, "n_checks": sum(len(v) for v in sweep.values()),
                     "n_ok": n_ok, "exit": rc, "per_scale": sweep},
                    fh, indent=1, sort_keys=True,
                )
        return rc

    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    spark = build_session("check_oracle")
    rc = _run(spark, sf_dir, only, entry_mod, duckdb)
    spark.stop()
    return rc


def _run(spark, sf_dir: str, only: set, entry_mod, duckdb, results: dict | None = None) -> int:
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        sql = oracles.get(name)
        try:
            sdf = fn(spark, sf_dir)
            s_pdf = sdf.toPandas()  # driver path: pandas, NOT collect()
            s_cols = list(s_pdf.columns)
            s_rows = list(s_pdf.itertuples(index=False, name=None))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            if results is not None:
                results[name] = f"FAIL: spark error: {e}"[:200]
            continue
        if sql is None:
            print(f"weak  {name}: rows-only check, {len(s_rows)} rows")
            if results is not None:
                results[name] = f"weak ({len(s_rows)} rows)"
            continue
        try:
            d_pdf = con.execute(sql).df()  # driver path: .df(), NOT fetchall()
            d_cols = list(d_pdf.columns)
            d_rows = list(d_pdf.itertuples(index=False, name=None))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failures += 1
            if results is not None:
                results[name] = f"FAIL: duckdb error: {e}"[:200]
            continue
        problems = []
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"columns spark={sorted(s_cols)} duck={sorted(d_cols)}")
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount spark={len(s_rows)} duck={len(d_rows)}")
        if not problems:
            problems.extend(pdf_problems(s_pdf, d_pdf))
        if not problems:
            sm = rows_to_multiset(s_cols, s_rows)
            dm = rows_to_multiset(d_cols, d_rows)
            if sm != dm:
                diff = [(a, b) for a, b in zip(sm, dm) if a != b][:3]
                problems.append(f"values differ; first diffs: {diff}")
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            failures += 1
            if results is not None:
                results[name] = "FAIL: " + "; ".join(problems)[:200]
        else:
            print(f"ok    {name}: {len(s_rows)} rows")
            if results is not None:
                results[name] = f"ok ({len(s_rows)} rows)"
    con.close()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
