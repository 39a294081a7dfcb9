"""Driver-evidence ledger: how many rounds of green driver CORRECTNESS
evidence each registered gate has accumulated.

The round driver verifies at most 50 gates per round; the registry
rotation (queries._reorder_by_evidence) spends that window on the
least-verified gates first. This tool makes rotation health visible at a
glance instead of derived: it reads the same CORRECTNESS_r*.json
artifacts the rotation reads and prints gates grouped by evidence count,
plus the exact set the driver will verify next round.

Usage:
    python tools/evidence_ledger.py            # human table
    python tools/evidence_ledger.py --markdown # README-pasteable section
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DRIVER_WINDOW = 50


def ledger() -> tuple[dict[str, int], dict[str, list[str]], list[str]]:
    """(evidence per gate, red rows per gate, registry order)."""
    import __spark_entry__ as entry_mod

    registry = list(entry_mod.queries())
    evidence: dict[str, int] = {name: 0 for name in registry}
    reds: dict[str, list[str]] = {}
    for path in sorted(
        glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")),
        # basename only: a checkout path containing 'r<digits>' elsewhere
        # must not reorder rounds (same fix as bench.baseline_timings)
        key=lambda p: int(re.search(r"r(\d+)", os.path.basename(p)).group(1)),
    ):
        rnd = re.search(r"r(\d+)", os.path.basename(path)).group(1)
        with open(path) as fh:
            data = json.load(fh)
        if not isinstance(data, dict):
            continue
        for name, row in data.items():
            if name not in evidence:
                continue  # renamed/retired gate
            if isinstance(row, dict) and row.get("hash_match"):
                evidence[name] += 1
            elif isinstance(row, dict):
                reds.setdefault(name, []).append(f"r{rnd}")
    return evidence, reds, registry


def main() -> int:
    markdown = "--markdown" in sys.argv
    evidence, reds, registry = ledger()
    by_count: dict[int, list[str]] = {}
    for name, n in evidence.items():
        by_count.setdefault(n, []).append(name)

    out = []
    if markdown:
        out.append("| driver-green rounds | gates | names |")
        out.append("|---|---|---|")
        for n in sorted(by_count):
            names = sorted(by_count[n])
            shown = ", ".join(f"`{x}`" for x in names)
            out.append(f"| {n} | {len(names)} | {shown} |")
    else:
        for n in sorted(by_count):
            names = sorted(by_count[n])
            out.append(f"=== {n} round(s) of driver evidence: {len(names)} gates")
            for x in names:
                flag = f"  (red in {','.join(reds[x])})" if x in reds else ""
                out.append(f"    {x}{flag}")
    window = registry[:DRIVER_WINDOW]
    out.append("")
    out.append(
        f"next driver window ({DRIVER_WINDOW} gates, registry order): "
        + ", ".join(window)
    )
    never = [g for g, n in evidence.items() if n == 0]
    missed = [g for g in never if g not in window]
    out.append(
        f"never-driver-verified: {len(never)}"
        + (f"; NOT in next window: {missed}" if missed else "; all in next window")
    )
    print("\n".join(out))
    return 1 if missed else 0


if __name__ == "__main__":
    raise SystemExit(main())
