"""STREAM-style memory-bandwidth roofline probe (round-3 verdict #7).

Runs the classic triad kernel a = b + s*c (numpy, arrays far larger than
L3) in N independent worker PROCESSES and reports aggregate bandwidth at
each worker count. If aggregate GB/s stops growing between 8 and 32
workers, the box's memory bus — not the engine — is the ceiling for the
saturated 8->32 Spark scaling pair; the triad number is the measured
evidence BENCH.md's "memory-bus bound" diagnosis cites.

Usage: python scripts/mem_triad.py [workers ...]   (default: 1 8 32)
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

N = 40_000_000  # 3 float64 arrays x 320 MB/worker: far beyond any cache
REPS = 5


def _triad(_: int) -> float:
    import numpy as np

    b = np.random.default_rng(1).random(N)
    c = np.random.default_rng(2).random(N)
    a = np.empty_like(b)
    best = float("inf")
    for _ in range(REPS):
        t0 = time.monotonic()
        np.multiply(c, 3.0, out=a)
        np.add(a, b, out=a)
        best = min(best, time.monotonic() - t0)
    # numpy cannot fuse mul+add, so this is TWO passes moving 5 arrays:
    # pass 1 reads c + writes a, pass 2 reads a + reads b + writes a.
    # Count 5, not the fused triad's 3 — otherwise GB/s underreports ~40%.
    return 5 * N * 8 / best / 1e9  # GB/s for this worker


def run(workers: int) -> float:
    with mp.get_context("spawn").Pool(workers) as pool:
        per = pool.map(_triad, range(workers))
    return sum(per)


def main() -> None:
    counts = [int(x) for x in sys.argv[1:]] or [1, 8, 32]
    out = {}
    for w in counts:
        gbps = run(w)
        out[str(w)] = round(gbps, 1)
        print(f"workers={w:3d}  aggregate {gbps:7.1f} GB/s")
    if "8" in out and "32" in out:
        out["scale_8_to_32"] = round(out["32"] / out["8"], 3)
        print(f"8->32 aggregate-bandwidth scaling: {out['scale_8_to_32']}x "
              f"(1.0 = flat bus, 4.0 = perfect)")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
