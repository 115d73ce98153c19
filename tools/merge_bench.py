"""Merge bench.py JSON outputs by per-entry minimum.

The shared host has multi-minute load waves (BASELINE.md; CLAUDE.md
rules 15/17/21): a single suite pass can inflate 2-4x ambient.  The
robust record is min-per-entry over interleaved passes — bench.py
already does reps within one run; this merges ACROSS runs taken in
different windows, keeping all raw observations and per-run probe
stamps so the JSON stays self-describing about which environment
produced each number.

Usage: python tools/merge_bench.py out.json in1.json in2.json ...
"""

from __future__ import annotations

import json
import sys


def merge(paths: list[str]) -> dict:
    runs = [json.load(open(p)) for p in paths]
    base = runs[-1]  # newest run defines metadata/entry universe
    queries: dict[str, float] = {}
    raw: dict[str, list[float]] = {}
    probes: dict[str, list[float]] = {}
    for r in runs:
        for name, best in r.get("queries", {}).items():
            raw.setdefault(name, []).extend(r.get("queries_raw", {}).get(name, [best]))
            probes.setdefault(name, []).extend(
                r.get("probe_us_per_page", {}).get(name, [])
            )
            queries[name] = min(queries.get(name, float("inf")), best)
    # drop entries retired from the newest suite
    live = set(base.get("queries", {}))
    queries = {k: v for k, v in queries.items() if k in live}
    return {
        **base,
        "metric": "headline_suite_seconds",
        "value": round(sum(queries.values()), 3),
        "queries": queries,
        "queries_raw": {k: v for k, v in raw.items() if k in live},
        "probe_us_per_page": {k: v for k, v in probes.items() if k in live},
        "reps": sum(r.get("reps", 1) for r in runs),
        "merged_from_runs": len(runs),
        "hosts": [r.get("host") for r in runs],
    }


if __name__ == "__main__":
    out, *ins = sys.argv[1:]
    merged = merge(ins)
    with open(out, "w") as f:
        f.write(json.dumps(merged) + "\n")
    print(f"merged {len(ins)} runs -> {out}: {merged['value']}s over "
          f"{len(merged['queries'])} entries")
