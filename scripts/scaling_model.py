"""Amdahl fit for N-vs-4N pairs: decompose a (lo_sec, hi_sec) pair into a
size-independent serial term s and parallel work W, then predict
efficiency at other input sizes.

Model: lo = s + W/n, hi = s + W/(4n) with the parallel work scaling
perfectly across cores. Two walls, two unknowns:

    W = (lo - hi) * (4n * n) / (4n - n) / n  ->  for n=2: W = (lo-hi)*8/3
    s = lo - W/n

eff(pages') = (s + W'/n) / (s + W'/(4n)) / 4 with W' = W * pages'/pages.

This is the analysis behind the BASELINE.md campaign-6 finding that the
150k operating point's 0.763 is a perfect-parallel-scaling measurement
depressed by ~20 s of driver planning / stage-barrier serial time.

Usage:
    python scripts/scaling_model.py LO_SEC HI_SEC [--n 2] \
        [--pages 150000 --predict 400000 ...]
"""

from __future__ import annotations

import argparse


def fit(lo: float, hi: float, n: int = 2) -> tuple[float, float]:
    """Return (s, W) for lo = s + W/n, hi = s + W/(4n)."""
    w = (lo - hi) * (4 * n) / 3.0
    s = lo - w / n
    return s, w


def eff(s: float, w: float, n: int = 2) -> float:
    return (s + w / n) / (s + w / (4 * n)) / 4.0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("lo", type=float)
    ap.add_argument("hi", type=float)
    ap.add_argument("--n", type=int, default=2)
    ap.add_argument("--pages", type=int, default=150000)
    ap.add_argument("--predict", type=int, nargs="*", default=[400000])
    args = ap.parse_args()

    s, w = fit(args.lo, args.hi, args.n)
    print(
        f"serial s = {s:.1f} s, parallel W = {w:.1f} s "
        f"(measured eff {eff(s, w, args.n):.3f} at {args.pages} pages)"
    )
    for p in args.predict:
        wp = w * p / args.pages
        print(
            f"predicted eff at {p} pages (same phase, perfect-W): "
            f"{eff(s, wp, args.n):.3f}"
        )


if __name__ == "__main__":
    main()
