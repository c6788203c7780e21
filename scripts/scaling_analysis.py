"""Post-hoc analysis of a v4 gated scaling campaign log (PAIR lines from
scripts/bench_scaling_gated.py): per-pair raw efficiency, gate outcomes,
and a DIAGNOSTIC host-speed-normalized efficiency.

The normalization model: measured wall time = work / host_speed, with
host_speed proxied by the single-core CPU probe (Mop/s) taken immediately
before each run. Normalizing every run to the campaign's median probe
value removes the hypervisor frequency/CPU-share phase documented in
BASELINE.md (campaign 4: 1.9x probe swing inside one pair):

    sec_norm = sec * (cpu_mops / median_mops)

This is a DIAGNOSTIC, not the headline: the qualification rule in
bench_scaling_gated.py gates on RAW numbers under quiet+stable conditions,
and only qualifying pairs support the >= 0.8 claim. The normalized series
is reported so a reader can see that the non-qualifying pairs' spread is
explained by the measured phases, not by the engine.

Usage: python scripts/scaling_analysis.py /tmp/gated_r4_150k.log
"""

from __future__ import annotations

import json
import statistics
import sys


def load_pairs(path: str) -> list[dict]:
    pairs = []
    with open(path) as f:
        for line in f:
            if line.startswith("PAIR "):
                pairs.append(json.loads(line[len("PAIR "):]))
    return pairs


def analyze(pairs: list[dict]) -> dict:
    all_runs = [p["lo"] for p in pairs] + [
        r for p in pairs for r in (p["hi"] if isinstance(p["hi"], list) else [p["hi"]])
    ]
    mops = [r["cpu_mops"] for r in all_runs if r["cpu_mops"] > 0]
    ref = statistics.median(mops) if mops else 0.0
    rows = []
    for p in pairs:
        lo = p["lo"]
        his = p["hi"] if isinstance(p["hi"], list) else [p["hi"]]

        def norm(r):
            return r["sec"] * (r["cpu_mops"] / ref) if ref and r["cpu_mops"] else None

        lo_n = norm(lo)
        hi_n = [norm(r) for r in his]
        hi_n_ok = [x for x in hi_n if x is not None]
        eff_n = (
            round((lo_n / statistics.median(hi_n_ok)) / 4.0, 3)
            if lo_n and hi_n_ok
            else None
        )
        rows.append(
            {
                "pair": p["pair"],
                "eff_raw": p["eff"],
                "eff_norm": eff_n,
                "qualifies": p["qualifies"],
                "gates": {
                    "ext": p["ext_ok"],
                    "steal": p["steal_ok"],
                    "speed": p["speed_ok"],
                },
                "lo_sec": lo["sec"],
                "hi_secs": [r["sec"] for r in his],
                "probes_mops": [lo["cpu_mops"]] + [r["cpu_mops"] for r in his],
            }
        )
    q = [r["eff_raw"] for r in rows if r["qualifies"]]
    n = [r["eff_norm"] for r in rows if r["eff_norm"] is not None]
    return {
        "ref_mops_median": round(ref, 1),
        "pairs": rows,
        "eff_raw_qualifying": q,
        "eff_raw_min_qualifying": min(q) if q else None,
        "eff_norm_all": n,
        "eff_norm_median": round(statistics.median(n), 3) if n else None,
    }


if __name__ == "__main__":
    out = analyze(load_pairs(sys.argv[1]))
    print(json.dumps(out, indent=2))
