"""Per-query bench budget check: fail when any query regresses more than
2× its last recorded per-round time, so new work can't silently
reintroduce a 50-second query.

Usage:
    python tools/bench_budget.py                  # runs bench.py fresh
    python tools/bench_budget.py fresh.json       # compare a saved run
    python tools/bench_budget.py fresh.json BENCH_r02.json

The baseline defaults to the newest BENCH_r*.json in the repo root. A
regression = fresh > 2× baseline AND fresh − baseline > 0.5 s (the
absolute guard keeps sub-second queries from tripping on scheduler
noise). New queries without a baseline row are listed, never failed.
Exit code 1 on any regression.
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_bench_json(path: str) -> dict[str, float]:
    """Accept bench.py's raw one-line JSON, the driver's wrapped
    BENCH_r*.json (["parsed"]["queries"]), or — when the driver recorded
    ``parsed: null`` because its tail capture truncated the head of the
    line — the per-query dict recovered from the ``tail`` string."""
    with open(path) as fh:
        data = json.load(fh)
    if "queries" in data:
        return data["queries"]
    parsed = data.get("parsed")
    if isinstance(parsed, dict) and "queries" in parsed:
        return parsed["queries"]
    tail = data.get("tail")
    if isinstance(tail, str):
        m = re.search(r'"queries":\s*(\{[^{}]*\})', tail)
        if m:
            return json.loads(m.group(1))
        # driver keeps only the LAST 2000 chars — the dict's opening
        # brace is often cut off; scrape the surviving "name": float
        # pairs instead (same fallback as bench.baseline_timings)
        sys.path.insert(0, REPO)
        from bench import _NON_QUERY_KEYS

        pairs = {
            k: float(v)
            for k, v in re.findall(
                r'"([A-Za-z_][A-Za-z0-9_]*)":\s*([0-9]+(?:\.[0-9]+)?)', tail
            )
            if k not in _NON_QUERY_KEYS
        }
        if pairs:
            return pairs
    raise ValueError(f"no queries dict in {path}")


def load_calib(path: str) -> float | None:
    """Calibration micro-gate time from a bench artifact (min of the
    start/end measurements), scraped from raw JSON, the driver's parsed
    wrapper, or its truncated tail — the calib block sits at the very
    end of the line precisely so it survives the 2000-char cut."""
    with open(path) as fh:
        data = json.load(fh)
    for d in (data, data.get("parsed") or {}):
        if isinstance(d, dict) and "calib_start_s" in d:
            return min(
                float(d["calib_start_s"]),
                float(d.get("calib_end_s", d["calib_start_s"])),
            )
    tail = data.get("tail")
    if isinstance(tail, str):
        vals = re.findall(
            r'"calib_(?:start|end)_s":\s*([0-9]+(?:\.[0-9]+)?)', tail
        )
        if vals:
            return min(float(v) for v in vals)
    return None


def latest_baseline() -> str:
    paths = glob.glob(os.path.join(REPO, "BENCH_r*.json"))
    if not paths:
        raise FileNotFoundError("no BENCH_r*.json baseline in repo root")
    return max(paths, key=lambda p: int(re.search(r"r(\d+)", p).group(1)))


def run_fresh() -> dict[str, float]:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        timeout=900,
        check=True,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)["queries"]


def main() -> int:
    fresh = (
        load_bench_json(sys.argv[1]) if len(sys.argv) > 1 else run_fresh()
    )
    base_path = sys.argv[2] if len(sys.argv) > 2 else latest_baseline()
    base = load_bench_json(base_path)

    # Self-calibration normalization (README "bench normalization rule"):
    # both artifacts carry a fixed CPU-bound micro-gate time; the ratio
    # cancels box drift (neighbor load / frequency scaling) before the
    # 2x regression test. Only applied when BOTH sides recorded it, and
    # only in the slowdown direction (scale < 1 would hide real
    # regressions behind a faster box).
    scale = 1.0
    if len(sys.argv) > 1:
        cf, cb = load_calib(sys.argv[1]), load_calib(base_path)
        if cf and cb and cf > cb:
            scale = cb / cf
            print(
                f"CALIB    fresh {cf:.3f}s vs baseline {cb:.3f}s — box is "
                f"{cf / cb:.2f}x slower; normalizing fresh times by "
                f"{scale:.3f}"
            )

    regressions, new = [], []
    for q, t in sorted(fresh.items()):
        b = base.get(q)
        if b is None:
            new.append((q, t))
            continue
        tn = t * scale
        if tn > 2 * b and tn - b > 0.5:
            regressions.append((q, b, tn))

    for q, t in new:
        print(f"NEW      {q}: {t:.2f}s (no baseline row)")
    for q, b, t in regressions:
        print(f"REGRESS  {q}: {b:.2f}s -> {t:.2f}s ({t / b:.1f}x)")
    if not regressions:
        print(f"OK: {len(fresh)} queries within 2x of {os.path.basename(base_path)}")
    return 1 if regressions else 0


if __name__ == "__main__":
    raise SystemExit(main())
