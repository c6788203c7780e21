"""Simultaneous A/B scaling measurement — immune to time-varying host speed.

The round-4 campaigns showed this sandbox host's effective speed swinging
up to ~4x between adjacent minutes (identical 2-core runs: 187s vs 729s),
which no sequential pairing can cancel: a pair whose two runs straddle a
host-speed phase change reads an efficiency that is purely the phase
ratio. This variant removes the time axis entirely:

  local[N]  pinned to cores [0, N)          } launched at the SAME instant,
  local[4N] pinned to cores [N, 5N)         } disjoint core sets

Both measured windows sample the identical host phase (same ambient, same
frequency/steal state), so their wall ratio is a same-instant observation
of the scaling curve. Stated confounder: the two jobs share DRAM
bandwidth, so each sees a busier memory subsystem than it would alone —
the 4N job draws more bandwidth, biasing the measured efficiency DOWN
(conservative for a >= 0.8 target). Core counts stay within the machine
(N + 4N <= cpu_count - 2 head-room cores for the OS/monitor).

Usage:
  python scripts/bench_scaling_sim.py --pages 150000 --runs 2 --n 2
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import threading

sys.path.insert(0, os.path.dirname(__file__))
from bench_scaling import WORKER, wait_for_quiet  # noqa: E402


def launch(cpus: int, core_lo: int, core_hi: int, pages: int, pages_dir: str):
    env = dict(os.environ)
    env.update(
        {
            "SCALE_CPUS": str(cpus),
            "SCALE_PAGES": str(pages),
            "SCALE_PAGES_DIR": pages_dir,
            "SPARK_GRAFT_SHUFFLE": "64",
        }
    )
    cmd = ["taskset", "-c", f"{core_lo}-{core_hi}", sys.executable, "-c", WORKER]
    return subprocess.Popen(
        cmd, env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True
    )


def drain(proc) -> "threading.Thread":
    """Start draining a worker's stdout/stderr immediately. Both workers
    run concurrently; if the parent blocked in one worker's communicate()
    while the other filled its 64KB pipe (JVM WARN/GC chatter), the other
    worker's writes would stall MID-MEASUREMENT and inflate its wall time.
    Draining both from the moment of launch keeps the pipes empty."""
    proc._drained = {"out": "", "err": ""}

    def _pump():
        out, err = proc.communicate(timeout=3000)
        proc._drained = {"out": out, "err": err}

    th = threading.Thread(target=_pump, daemon=True)
    th.start()
    return th


def parse(proc, th) -> dict:
    th.join(timeout=3000)
    out, err = proc._drained["out"], proc._drained["err"]
    for line in out.splitlines():
        if line.startswith("WORKER_RESULT "):
            r = json.loads(line[len("WORKER_RESULT "):])["runs"][0]
            return {"sec": round(r["sec"], 2), "triples": r["triples"]}
    raise RuntimeError(f"worker failed:\n{out[-1500:]}\n{err[-1500:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=150000)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--n", type=int, default=2)
    ap.add_argument("--quiet", type=float, default=1.5)
    args = ap.parse_args()

    import tempfile

    pages_dir = os.path.join(
        tempfile.gettempdir(), f"graphiti_scale_pages_{args.pages}"
    )
    n = args.n
    results = []
    for i in range(args.runs):
        load0 = wait_for_quiet(args.quiet)
        samples: list[float] = []
        stop = threading.Event()

        def _mon():
            while not stop.wait(10):
                samples.append(os.getloadavg()[0])

        th = threading.Thread(target=_mon, daemon=True)
        th.start()
        # same instant, disjoint cores: lo on [0, n), hi on [n, 5n)
        lo_p = launch(n, 0, n - 1, args.pages, pages_dir)
        hi_p = launch(4 * n, n, 5 * n - 1, args.pages, pages_dir)
        lo_t = drain(lo_p)
        hi_t = drain(hi_p)
        hi = parse(hi_p, hi_t)
        lo = parse(lo_p, lo_t)
        stop.set()
        th.join(timeout=1)
        own = 5 * n
        amb_max = round(max([0.0] + [s - own for s in samples]), 2)
        eff = round((lo["sec"] / hi["sec"]) / 4.0, 3)
        run = {
            "run": i + 1,
            "lo_sec": lo["sec"],
            "hi_sec": hi["sec"],
            "triples": lo["triples"],
            "eff": eff,
            "load_before": round(load0, 2),
            "amb_max": amb_max,
        }
        results.append(run)
        print("SIMRUN " + json.dumps(run), flush=True)

    effs = sorted(r["eff"] for r in results)
    print(
        json.dumps(
            {
                "pages": args.pages,
                "n_cpus": n,
                "n4_cpus": 4 * n,
                "runs": results,
                "eff_min": effs[0],
                "eff_max": effs[-1],
                "eff_median": effs[len(effs) // 2],
            }
        )
    )


if __name__ == "__main__":
    main()
