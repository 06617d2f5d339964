"""Opportunistic scaling-evidence hunter.

Runs the same pinned bench child as bench.py (tools/bench_scaling_child.py)
in interleaved high/low pairs, but only STARTS a pair when a short probe
sees the machine quiet — then logs every observation (including aborts) to
BENCH/scaling_hunt_r04.jsonl. Where bench.py is a bounded artifact run,
this loop trades wall time for the chance of catching the quiet windows
between this host's multi-minute steal episodes. Same gates as bench.py
apply when reading the log: a pair is clean when both sides have
steal_frac_cap <= 0.05, machine_steal_rate <= 0.35, and times within 1.3x
of the best seen for that master.

Usage: python tools/scaling_hunt.py [n_pages] (runs until killed)
"""

from __future__ import annotations

import json
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT / "tools"))
from bench_scaling_child import read_steal_ticks  # noqa: E402

OUT = ROOT / "BENCH" / "scaling_hunt_r05.jsonl"
PAGES = int(sys.argv[1]) if len(sys.argv) > 1 else 45000


def log(obj: dict) -> None:
    obj["t"] = round(time.time(), 1)
    with OUT.open("a") as f:
        f.write(json.dumps(obj) + "\n")
    print(json.dumps(obj), flush=True)


def machine_rate(window: float = 8.0) -> float:
    s0, t0 = read_steal_ticks(), time.time()
    time.sleep(window)
    return (read_steal_ticks() - s0) / 100.0 / (time.time() - t0)


def run_child(master: str) -> dict | None:
    child = ROOT / "tools" / "bench_scaling_child.py"
    try:
        proc = subprocess.run(
            [sys.executable, str(child), master, str(PAGES)],
            capture_output=True,
            text=True,
            cwd=str(ROOT),
            timeout=1800,
        )
    except subprocess.TimeoutExpired:
        log({"master": master, "aborted": "parent_timeout"})
        return None
    for line in proc.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    log({"master": master, "aborted": "child_failed", "rc": proc.returncode})
    return None


def main() -> None:
    rnd = 0
    while True:
        rate = machine_rate()
        if rate > 0.2:
            time.sleep(25)
            continue
        rnd += 1
        pair = {}
        for master in ("local[4]", "local[1]"):  # cheap side first
            o = run_child(master)
            if o is not None:
                o["hunt_round"] = rnd
                log(o)
            if o is None or "aborted" in o:
                pair = {}
                break
            pair[master] = o
        if len(pair) == 2:
            lo, hi = pair["local[1]"], pair["local[4]"]
            log(
                {
                    "hunt_round": rnd,
                    "pair_eff": round((lo["dt_sec"] / hi["dt_sec"]) / 4.0, 3),
                    "pair_eff_corr": round(
                        (lo["dt_corr_sec"] / hi["dt_corr_sec"]) / 4.0, 3
                    ),
                    "max_steal_frac": max(
                        lo["steal_frac_cap"], hi["steal_frac_cap"]
                    ),
                    "max_machine_rate": max(
                        lo["machine_steal_rate"], hi["machine_steal_rate"]
                    ),
                }
            )


if __name__ == "__main__":
    main()
