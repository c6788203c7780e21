"""Interleaved A/B scaling campaign, protocol v2: DIRECT external-load
monitor.

Why v2. The v1 gate (bench_scaling_ab.py) samples the 1-minute loadavg
and subtracts the run's own pinned core count. Measured on a QUIET host
(round 4, /tmp/ab_r4_c1.log pair 1), that statistic reads 1.6-1.7
"ambient cores" during runs whose instantaneous external runnable count
is ZERO, for two reasons both internal to the measurement:

  1. decay tail — the 1-minute average needs ~3 minutes to forget the
     preceding phase (the other level's 8-core run, or the 32-core corpus
     materialization), so early samples carry phantom cores;
  2. own queueing — loadavg counts RUNNABLE threads, not running ones: a
     taskset-pinned local[2] JVM holding >2 hungry threads (executor
     pool + GC + Py4J + python driver) keeps 3-4 tasks runnable while
     only 2 execute, inflating "loadavg - own cores" by 1-2 even in a
     sealed box.

  v1's gate was designed against the round-3 environment (genuine 3-9
  core EXTERNAL bursts, where it worked); on a quiet host it rejects
  every pair for reasons that have nothing to do with external load.

The v2 monitor measures external contention DIRECTLY: every 5 s it counts
threads in R (runnable) or D (uninterruptible) state, excluding the
worker's own threads and the sampling `ps` itself. What remains is the
instantaneous number of external threads competing for (or blocking on)
CPU/IO — no averaging window, no decay, no own-thread contamination.

v3 (this version) fixes HOW "the worker's own threads" are identified.
v2 excluded by process group (the worker is launched with
start_new_session=True), but `pyspark.daemon` calls setpgid(0,0), so the
job's own Python task workers land in their own pgids and were counted
as EXTERNAL load. The error is proportional to the number of
concurrently-running Python workers — i.e. systematically larger at the
higher parallelism level (measured: ext_mean ~0.8-0.9 at local[2] vs
~2.0-2.6 at local[8] on the same ambient load) — which made the
qualification gate unpassable by construction. v3 excludes the full
descendant tree of the worker process (ppid walk), computed from the
same `ps -eLo pid,ppid,stat,comm` snapshot used for the thread count.

QUALIFICATION RULE (stated before any campaign is run with this
protocol): a pair qualifies iff, at BOTH levels, (a) the maximum
instantaneous external R/D thread count across all 5 s samples is <= 1
thread, and (b) the mean is <= 0.25. One transient sample of a single
external thread (e.g. a monitoring daemon waking) is tolerated; any
sustained or multi-core external activity disqualifies the pair.

Usage:
  python scripts/bench_scaling_ab2.py --pages 400000 --pairs 3 --n 2
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import threading

sys.path.insert(0, os.path.dirname(__file__))
from bench_scaling import WORKER, wait_for_quiet  # noqa: E402


def _external_rd_threads(root_pid: int) -> int:
    """Instantaneous count of R/D-state threads outside the worker's full
    DESCENDANT TREE rooted at `root_pid` (and outside this sampler — ps
    itself always reports R).

    v3 fix over the pgid-based exclusion: `pyspark.daemon` calls
    setpgid(0,0) on startup, so the job's own Python task workers live in
    their OWN process group and a pgid filter counts them as external.
    That inflated ext_mean by ~the number of concurrently-running Python
    workers — systematically more at the higher parallelism level — and
    made the qualification gate unpassable by construction. Walking the
    ppid tree from the worker process catches the JVM, the daemons (ppid =
    JVM), and every forked task worker (ppid = daemon), all from ONE ps
    snapshot so there is no fork/exit race between tree discovery and
    thread counting."""
    try:
        out = subprocess.run(
            ["ps", "-eLo", "pid=,ppid=,stat=,comm="],
            capture_output=True,
            text=True,
            timeout=10,
        ).stdout
    except Exception:
        return 0
    rows = []
    children: dict[int, list[int]] = {}
    for line in out.splitlines():
        parts = line.split(None, 3)
        if len(parts) < 4:
            continue
        try:
            pid, ppid = int(parts[0]), int(parts[1])
        except ValueError:
            continue
        rows.append((pid, parts[2], parts[3]))
        children.setdefault(ppid, []).append(pid)
    own = {root_pid}
    frontier = [root_pid]
    while frontier:
        nxt = []
        for p in frontier:
            for c in children.get(p, ()):  # noqa: B023
                if c not in own:
                    own.add(c)
                    nxt.append(c)
        frontier = nxt
    n = 0
    for pid, stat, comm in rows:
        if not stat or stat[0] not in "RD":
            continue
        if comm == "ps" or pid in own:
            continue
        n += 1
    return n


def one_run(cpus: int, pages: int, pages_dir: str, quiet: float | None) -> dict:
    env = dict(os.environ)
    env.update(
        {
            "SCALE_CPUS": str(cpus),
            "SCALE_PAGES": str(pages),
            "SCALE_PAGES_DIR": pages_dir,
            "SPARK_GRAFT_SHUFFLE": "64",
        }
    )
    cmd = ["taskset", "-c", f"0-{cpus - 1}", sys.executable, "-c", WORKER]
    load0 = wait_for_quiet(quiet) if quiet is not None else os.getloadavg()[0]

    samples: list[int] = []
    loads: list[float] = []
    stop = threading.Event()
    proc = subprocess.Popen(
        cmd,
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
        start_new_session=True,  # still useful: clean kill of the whole tree
    )

    def _mon():
        while not stop.wait(5):
            samples.append(_external_rd_threads(proc.pid))
            loads.append(os.getloadavg()[0])

    th = threading.Thread(target=_mon, daemon=True)
    th.start()
    try:
        stdout, stderr = proc.communicate(timeout=3000)
    finally:
        stop.set()
        th.join(timeout=2)
    ext_max = max(samples) if samples else 0
    ext_mean = round(sum(samples) / len(samples), 3) if samples else 0.0
    amb_max_v1 = (
        round(max([0.0] + [ld - cpus for ld in loads]), 2) if loads else 0.0
    )
    stages = None
    for line in stdout.splitlines():
        if line.startswith("WORKER_STAGES "):
            stages = json.loads(line[len("WORKER_STAGES "):])["stages"]
    for line in stdout.splitlines():
        if line.startswith("WORKER_RESULT "):
            r = json.loads(line[len("WORKER_RESULT "):])["runs"][0]
            return {
                "cpus": cpus,
                "sec": round(r["sec"], 2),
                "triples": r["triples"],
                "load_before": round(load0, 2),
                "ext_max": ext_max,
                "ext_mean": ext_mean,
                "amb_max_v1": amb_max_v1,  # the old statistic, for comparison
                "n_samples": len(samples),
                "stages": stages,
            }
    raise RuntimeError(
        f"worker local[{cpus}] failed:\n{stdout[-2000:]}\n{stderr[-2000:]}"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=400000)
    ap.add_argument("--pairs", type=int, default=3)
    ap.add_argument("--n", type=int, default=2)
    ap.add_argument("--quiet", type=float, default=1.5)
    ap.add_argument("--qualify-ext-max", type=int, default=1)
    ap.add_argument("--qualify-ext-mean", type=float, default=0.25)
    ap.add_argument(
        "--stop-after-qualifying",
        type=int,
        default=0,
        help="stop early once this many pairs qualify (0 = run all pairs)",
    )
    args = ap.parse_args()

    import tempfile

    pages_dir = os.path.join(
        tempfile.gettempdir(), f"graphiti_scale_pages_{args.pages}"
    )

    pairs = []
    for i in range(args.pairs):
        lo = one_run(args.n, args.pages, pages_dir, args.quiet)
        hi = one_run(args.n * 4, args.pages, pages_dir, args.quiet)
        eff = (lo["sec"] / hi["sec"]) / 4.0
        qualifies = all(
            r["ext_max"] <= args.qualify_ext_max
            and r["ext_mean"] <= args.qualify_ext_mean
            for r in (lo, hi)
        )
        pair = {
            "pair": i + 1,
            "lo": lo,
            "hi": hi,
            "eff": round(eff, 3),
            "qualifies": qualifies,
        }
        pairs.append(pair)
        print("PAIR " + json.dumps(pair), flush=True)
        n_q = sum(1 for p in pairs if p["qualifies"])
        if args.stop_after_qualifying and n_q >= args.stop_after_qualifying:
            break

    effs = [p["eff"] for p in pairs]
    qeffs = [p["eff"] for p in pairs if p["qualifies"]]
    out = {
        "protocol": "ab2-direct-external-monitor",
        "pages": args.pages,
        "triples": pairs[0]["lo"]["triples"],
        "n_cpus": args.n,
        "n4_cpus": args.n * 4,
        "pairs": pairs,
        "eff_all": effs,
        "eff_qualifying": qeffs,
        "eff_paired_median": round(statistics.median(qeffs or effs), 3),
        "eff_min_qualifying": round(min(qeffs), 3) if qeffs else None,
        "eff_max_qualifying": round(max(qeffs), 3) if qeffs else None,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
