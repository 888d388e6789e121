"""Host-ceiling control for the scaling evidence (BENCH/BASELINE.md):
pure numpy multiprocessing — NO Spark, no JVM, no Arrow — measuring the
sandbox VM's own N -> 4N process-scaling efficiency in the current hour.

Each process runs a fixed amount of float64 trig/sqrt work (the same
arithmetic-intensity class as the cell-encode kernel), so aggregate work
scales with process count and perfect scaling means equal wall time at
both levels. Run interleaved with bench_scaling.py sessions: if this
control shows the same sub-0.8 ratio Spark shows, the ceiling is the
host, not the plan.

Usage: python scripts/host_ceiling_control.py [--n 2] [--pairs 3]
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import time

os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
os.environ.setdefault("OMP_NUM_THREADS", "1")


def kernel(n_iter: int) -> float:
    import numpy as np

    x = np.linspace(0, 1, 500_000)
    acc = 0.0
    for _ in range(n_iter):
        acc += float((np.sin(x * 3.1) * np.cos(x * 1.7) + np.sqrt(x + 0.5)).sum())
    return acc


def run(procs: int, n_iter: int = 40) -> float:
    with mp.Pool(procs) as p:
        t0 = time.monotonic()
        p.map(kernel, [n_iter] * procs)  # fixed work per proc: aggregate scales
        dt = time.monotonic() - t0
    return procs * n_iter / dt  # work units per second


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2)
    ap.add_argument("--pairs", type=int, default=3)
    args = ap.parse_args()
    for rep in range(args.pairs):
        rn = run(args.n)
        r4n = run(4 * args.n)
        print(json.dumps({
            "pair": rep,
            f"u{args.n}_per_s": round(rn, 1),
            f"u{4 * args.n}_per_s": round(r4n, 1),
            "eff": round((r4n / rn) / 4.0, 3),
        }))


if __name__ == "__main__":
    main()
