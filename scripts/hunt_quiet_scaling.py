"""Quiet-window hunter for the scaling sandwich (north-rule evidence).

The sandwich protocol (bench.py) rejects any attempt where the hypervisor
stole more than 5% of a leg's demanded CPU — and round-4 measurements show
this box suffers a steady ~0.2-0.6 stolen cores for hours at a stretch,
which is 20-40% of a 1-core narrow leg.  Burning 15-minute sandwich
attempts into a known-noisy window wastes the bench budget, so this script
inverts the loop: probe steal cheaply (20 s of 1-core spin) every couple
of minutes, and only when two consecutive probes read quiet does it spend
a real sandwich attempt.  The first ACCEPTED attempt lands in
``.bench_scaling_cache.json`` (bench.py's persistent cache) and the hunter
exits; every probe and attempt is appended to ``/tmp/steal_probe.log`` so
the steal landscape of the whole hunt is auditable.

Coordination: touch ``/tmp/box_busy`` to pause the hunter while running
tests or benchmarks on the same box; remove it to resume.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(REPO, ".bench_scaling_cache.json")
LOG = os.environ.get("HUNT_LOG", "/tmp/steal_probe.log")
BUSY_FLAG = "/tmp/box_busy"
PROBE_SECS = float(os.environ.get("HUNT_PROBE_SECS", "20"))
# 0.015 / 4-probe streak (round-4 refinement): attempts launched on the
# FIRST quiet probe pair systematically ran their first narrow leg in the
# tail of the fading noise burst (leg-1 slower in 6 of 7 sandwiches, with
# visibly higher per-pass steal) — the narrow-agreement gate then rejects.
# Requiring a deeper, longer quiet streak starts the sandwich well inside
# the quiet phase instead of at its leading edge.
QUIET_SHARE = float(os.environ.get("HUNT_QUIET_SHARE", "0.015"))
STREAK = int(os.environ.get("HUNT_STREAK", "4"))
SLEEP = float(os.environ.get("HUNT_SLEEP", "120"))
DEADLINE = time.time() + float(os.environ.get("HUNT_BUDGET_SECS", str(5 * 3600)))


def _log(msg: str) -> None:
    line = f"{time.strftime('%H:%M:%S')} {msg}"
    with open(LOG, "a") as f:
        f.write(line + "\n")
    print(line, flush=True)


def _read_steal_percpu() -> list[tuple[float, float]]:
    """(busy, steal) ticks per cpu — same attribution as bench.py
    r4-sandwich-3: steal on near-idle vCPUs (timer ticks on a shared host)
    cannot slow the work and is not charged to it."""
    out = []
    with open("/proc/stat") as f:
        for line in f:
            if not line.startswith("cpu") or line.startswith("cpu "):
                continue
            v = [float(x) for x in line.split()[1:]]
            out.append((v[0] + v[1] + v[2], v[7] if len(v) > 7 else 0.0))
    return out


def probe() -> float:
    """Steal share of demanded CPU on ACTIVE cpus during a 1-core spin."""
    p0 = _read_steal_percpu()
    t0 = time.time()
    t_end = t0 + PROBE_SECS
    x = 0
    while time.time() < t_end:
        for i in range(2_000_000):
            x += i * i
    wall = time.time() - t0
    p1 = _read_steal_percpu()
    hz = os.sysconf("SC_CLK_TCK") or 100
    busy = steal = 0.0
    for (b0, s0), (b1, s1) in zip(p0, p1):
        db, ds = b1 - b0, s1 - s0
        if db > 0.05 * wall * hz:
            busy += db
            steal += ds
    return steal / max(busy + steal, 1.0)


def accepted() -> bool:
    try:
        with open(CACHE) as f:
            return bool(json.load(f)["scaling"].get("accepted"))
    except (OSError, ValueError, KeyError):
        return False


def main() -> None:
    streak = 0
    while time.time() < DEADLINE:
        if accepted():
            _log("accepted result in cache — done")
            return
        if os.path.exists(BUSY_FLAG):
            _log("box_busy flag present — pausing")
            time.sleep(SLEEP)
            streak = 0
            continue
        share = probe()
        _log(f"probe steal_share={share:.4f} (streak={streak})")
        if share > QUIET_SHARE:
            streak = 0
            time.sleep(SLEEP)
            continue
        streak += 1
        if streak < STREAK:
            time.sleep(30)
            continue
        _log("quiet window — launching sandwich attempt")
        env = {
            **os.environ,
            "SPARK_GRAFT_SCALING_ONLY": "1",
            "SPARK_GRAFT_SCALING_ATTEMPTS": "1",
        }
        t0 = time.time()
        p = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            capture_output=True,
            text=True,
            env=env,
            cwd=REPO,
        )
        _log(f"attempt finished in {time.time() - t0:.0f}s rc={p.returncode}")
        for ln in p.stderr.strip().splitlines()[-4:]:
            _log(f"  stderr: {ln}")
        tail = p.stdout.strip().splitlines()
        if tail:
            _log(f"  result: {tail[-1][:400]}")
        streak = 0
        if accepted():
            _log("ACCEPTED — cached; exiting")
            return
    _log("budget exhausted without an accepted window")


if __name__ == "__main__":
    main()
