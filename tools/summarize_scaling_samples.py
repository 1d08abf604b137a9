import json, sys
from pathlib import Path

rows = [json.loads(l) for l in Path(sys.argv[1]).read_text().splitlines() if l.strip()]
by = {2: [], 8: []}
for r in rows:
    by[r["cpus"]].append(r)
ctl_floor = {c: min(r["shuffle_control_s"] for r in rs) for c, rs in by.items()}
out = {}
for c, rs in by.items():
    quiet = [r for r in rs if r["shuffle_control_s"] <= ctl_floor[c] * 1.25]
    out[c] = {
        "draws": [r["replay_s"] for r in rs],
        "controls": [r["shuffle_control_s"] for r in rs],
        "ctl_floor": ctl_floor[c],
        "quiet_draws": sorted(r["replay_s"] for r in quiet),
        "quiet_min": min((r["replay_s"] for r in quiet), default=None),
        "quiet_min_eps": max((r["events_per_sec"] for r in quiet), default=None),
    }
eff = out[2]["quiet_min"] / out[8]["quiet_min"] / 4
ctl_eff = ctl_floor[2] / ctl_floor[8] / 4
print(json.dumps({
    "per_level": out,
    "quiet_scaling_efficiency": round(eff, 3),
    "shuffle_ceiling_efficiency": round(ctl_eff, 3),
    "ratio_to_shuffle_ceiling": round(eff / ctl_eff, 3),
}, indent=1))
