"""Scaling campaign protocol v5.1: v5 pairs with a run-length-invariant
external-load gate.

Why v5.1. Campaign 7 (400k pages, protocol v5, 2026-08-20 ~10:00-10:50
UTC) rejected 4/4 pairs on the `ext_max <= 1` gate while every run's
ext_mean sat at 0.03-0.10: a 400k lo run spans ~80 five-second monitor
samples vs ~25 for a 150k lo run, so at IDENTICAL host activity the long
run is ~3x as likely to catch a single 5 s blip of 2 external R threads
— a <=1.25%-of-samples event that distorts a 400 s wall by well under
1%. `ext_max` therefore encodes run length, not load. v5.1 replaces it
with the fraction of samples that saw >1 external running thread, which
is invariant to window length; every other part of v5 (minimal
probe-bracketed pair, alternating order, speed-agreement gate) is
unchanged.

QUALIFICATION RULE (stated before any v5.1 campaign is run):
a pair qualifies iff
  (a) both runs: ext_mean <= 0.25 and ext_frac_gt1 <= 0.02 (at most 2%
      of 5 s samples saw more than one external running thread; v3/v5
      direct monitor, worker descendant tree excluded), and
  (b) both runs: steal_pct <= 1.0, and
  (c) host-speed agreement across the pair's THREE bracketing probes
      (before the first run, between the runs, after the second):
      max/min <= 1.10 for BOTH probe series (DRAM-triad GB/s and
      L2-resident Mop/s).
Efficiency = (lo_sec / hi_sec) / 4.  Pairs alternate run order (even
pairs hi-first, odd pairs lo-first) so within-phase drift biases
alternate pairs in opposite directions.

Usage:
  python scripts/bench_scaling_v51.py --pages 400000 --pairs 12 \
      --n 2 --stop-after-qualifying 3
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(__file__))
from bench_scaling import wait_for_quiet  # noqa: E402
from bench_scaling_gated import BW_PROBE, CPU_PROBE, _probe, one_run  # noqa: E402


def _probes() -> dict:
    return {
        "bw_gbs": _probe(BW_PROBE, "bw_gbs"),
        "cpu_mops": _probe(CPU_PROBE, "cpu_mops"),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=400000)
    ap.add_argument("--pairs", type=int, default=12)
    ap.add_argument("--n", type=int, default=2)
    ap.add_argument("--quiet", type=float, default=1.5)
    ap.add_argument("--qualify-ext-frac", type=float, default=0.02)
    ap.add_argument("--qualify-ext-mean", type=float, default=0.25)
    ap.add_argument("--qualify-steal", type=float, default=1.0)
    ap.add_argument("--qualify-speed-ratio", type=float, default=1.10)
    ap.add_argument("--stop-after-qualifying", type=int, default=0)
    args = ap.parse_args()

    import tempfile

    pages_dir = os.path.join(
        tempfile.gettempdir(), f"graphiti_scale_pages_{args.pages}"
    )

    pairs = []
    for i in range(args.pairs):
        wait_for_quiet(args.quiet)
        p0 = _probes()
        order = ["hi", "lo"] if i % 2 == 0 else ["lo", "hi"]
        runs: dict[str, dict] = {}
        runs[order[0]] = one_run(
            args.n * 4 if order[0] == "hi" else args.n,
            args.pages, pages_dir, quiet=None,
        )
        p1 = _probes()
        runs[order[1]] = one_run(
            args.n * 4 if order[1] == "hi" else args.n,
            args.pages, pages_dir, quiet=None,
        )
        p2 = _probes()
        lo, hi = runs["lo"], runs["hi"]
        eff = (lo["sec"] / hi["sec"]) / 4.0
        both = [lo, hi]
        ext_ok = all(
            r["ext_frac_gt1"] <= args.qualify_ext_frac
            and r["ext_mean"] <= args.qualify_ext_mean
            for r in both
        )
        steal_ok = all(r["steal_pct"] <= args.qualify_steal for r in both)
        bws = [p["bw_gbs"] for p in (p0, p1, p2)]
        mops = [p["cpu_mops"] for p in (p0, p1, p2)]
        speed_ok = (
            min(bws) > 0
            and min(mops) > 0
            and max(bws) / min(bws) <= args.qualify_speed_ratio
            and max(mops) / min(mops) <= args.qualify_speed_ratio
        )
        pair = {
            "pair": i + 1,
            "order": order,
            "probes": {"before": p0, "between": p1, "after": p2},
            "lo": lo,
            "hi": hi,
            "eff": round(eff, 3),
            "ext_ok": ext_ok,
            "steal_ok": steal_ok,
            "speed_ok": speed_ok,
            "qualifies": ext_ok and steal_ok and speed_ok,
        }
        pairs.append(pair)
        print("PAIR " + json.dumps(pair), flush=True)
        n_q = sum(1 for p in pairs if p["qualifies"])
        if args.stop_after_qualifying and n_q >= args.stop_after_qualifying:
            break

    effs = [p["eff"] for p in pairs]
    qeffs = [p["eff"] for p in pairs if p["qualifies"]]
    out = {
        "protocol": "v5.1 minimal probe-bracketed pairs, length-invariant ext gate",
        "pages": args.pages,
        "triples": pairs[0]["lo"]["triples"] if pairs else None,
        "n_cpus": args.n,
        "n4_cpus": args.n * 4,
        "pairs_run": len(pairs),
        "eff_all": effs,
        "eff_qualifying": qeffs,
        "eff_paired_median": round(statistics.median(qeffs), 3) if qeffs else None,
        "eff_min_qualifying": round(min(qeffs), 3) if qeffs else None,
        "eff_max_qualifying": round(max(qeffs), 3) if qeffs else None,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
