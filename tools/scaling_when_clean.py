"""Probe-gated scaling run (VERDICT r4 item 6): poll the host probe
and launch ``bench.py --scaling`` only inside a clean window.

The shared sandbox host has two degradation modes (BASELINE.md):
first-touch page-fault storms (~0.5 ms/page vs ~1 us healthy) and
sustained warm-memory-bandwidth collapse, either of which caps the
8→32 speedup of ANY program below 2.5x.  Nine manual round-4 attempts
showed face-value efficiency tracks the window, not the engine; this
tool automates what those attempts did by hand — wait for
``warm_matmul < WARM_MS`` AND ``first_touch < FT_US`` (defaults 50 ms
/ 3 us/page, overridable via GRAFT_PROBE_WARM_MS / GRAFT_PROBE_FT_US),
then run the scaling suite once and emit its JSON (stdout + optional
file), with the gate probes and per-leg probe stamps embedded.

Usage:
    python tools/scaling_when_clean.py [--out FILE] [--max-wait SEC]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WARM_MS = float(os.environ.get("GRAFT_PROBE_WARM_MS", "50"))
FT_US = float(os.environ.get("GRAFT_PROBE_FT_US", "3"))
POLL_SEC = float(os.environ.get("GRAFT_PROBE_POLL_SEC", "45"))


def probe() -> dict:
    from bench import _host_probe

    return _host_probe()


def wait_for_clean(max_wait: float) -> tuple[dict, list[dict]]:
    """Poll until both thresholds pass twice in a row (a single clean
    probe can land between pressure bursts); returns (last_probe,
    history).  Gives up after max_wait seconds and proceeds anyway —
    a stamped dirty run beats no run — flagging gate_clean=False."""
    t0 = time.time()
    history: list[dict] = []
    streak = 0
    while True:
        p = probe()
        p["t_offset_sec"] = round(time.time() - t0, 1)
        history.append(p)
        ok = p["warm_matmul_ms"] < WARM_MS and p["first_touch_us_per_page"] < FT_US
        streak = streak + 1 if ok else 0
        if streak >= 2:
            return p, history
        if time.time() - t0 > max_wait:
            return p, history
        time.sleep(POLL_SEC)


def main() -> None:
    out_path = None
    max_wait = 1800.0
    args = sys.argv[1:]
    if "--out" in args:
        out_path = args[args.index("--out") + 1]
    if "--max-wait" in args:
        max_wait = float(args[args.index("--max-wait") + 1])

    last, history = wait_for_clean(max_wait)
    gate_clean = (
        last["warm_matmul_ms"] < WARM_MS and last["first_touch_us_per_page"] < FT_US
    )
    run = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--scaling"],
        capture_output=True,
        text=True,
        check=True,
        cwd=REPO,
    )
    result = json.loads(run.stdout.strip().splitlines()[-1])
    result["gate"] = {
        "clean": gate_clean,
        "thresholds": {"warm_matmul_ms": WARM_MS, "first_touch_us_per_page": FT_US},
        "probe_at_launch": last,
        "polls": len(history),
        "wait_sec": history[-1]["t_offset_sec"],
    }
    line = json.dumps(result)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
