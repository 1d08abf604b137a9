"""Time-spread scaling sampler: the box's noise windows last minutes, so
draws clustered in one window are correlated and their min lies (this round
measured the SAME commit at 24.6 s and 95.7 s local[8] an hour apart, and an
8-draw "floor" of 40 s that a later single draw beat by 1.6×).

Each cycle takes ONE replay draw per level plus the engine-free shuffle
control at the same level (bench.py --shuffle-control-only — the
read→shuffle→write pattern the merge is made of), then sleeps. The control
classifies the window: a cycle whose control is near the session floor is
quiet, and only quiet-window replay draws say anything about the engine.
Output: one JSON line per draw appended to the target file, with wall-clock
timestamps, so the scaling evidence carries its own noise audit.

Usage: PYTHONPATH=/root/repo python tools/scaling_sampler.py out.jsonl \
    [cycles=8] [sleep_s=180] [levels=2,8]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).parent.parent
BENCH = REPO / "bench.py"


def run(flag: str, cpus: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    p = subprocess.run(
        [sys.executable, str(BENCH), flag],
        capture_output=True, text=True, env=env, timeout=3600, cwd=str(REPO),
    )
    lines = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
    return json.loads(lines[-1]) if lines else {"error": p.stderr[-500:]}


def main():
    out = Path(sys.argv[1]) if len(sys.argv) > 1 else REPO / "BENCH" / "scaling_samples.jsonl"
    cycles = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    sleep_s = int(sys.argv[3]) if len(sys.argv) > 3 else 180
    levels = [int(x) for x in (sys.argv[4] if len(sys.argv) > 4 else "2,8").split(",")]
    with out.open("a") as f:
        for c in range(cycles):
            for cpus in levels:
                ctl = run("--shuffle-control-only", cpus)
                rep = run("--replay-only", cpus)
                rec = {
                    "t": round(time.time(), 1),
                    "cycle": c,
                    "cpus": cpus,
                    "shuffle_control_s": ctl.get("seconds"),
                    "replay_s": rep.get("seconds"),
                    "events_per_sec": rep.get("events_per_sec"),
                }
                f.write(json.dumps(rec) + "\n")
                f.flush()
                print(json.dumps(rec), flush=True)
            time.sleep(sleep_s)


if __name__ == "__main__":
    main()
