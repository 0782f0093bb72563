"""Host CPU-scaling ceiling probe (context for BENCH/BASELINE.md).

Measures how pure-CPU, shared-nothing Python work (the same process shape as
Spark's Arrow workers: independent OS processes, no shared state) scales on
THIS host at the physical-thread counts the two scaling levels actually use.
Any Spark job is bounded above by this curve — the gap between it and 1.0 is
the host's own turbo/SMT/thermal behavior (on a shared sandbox, also noisy
neighbors), not engine plan shape.

Usage: python scripts/host_ceiling.py [n1 n2 ...]  (default 2 4 8 16 32)
Emits one JSON line: {procs: Mops/s, ...} plus pairwise efficiencies.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time


def burn(n: int) -> int:
    s = 0
    for i in range(n):
        s += i * i % 7
    return s


def measure(nproc: int, work: int = 6_000_000, rounds: int = 4) -> float:
    with mp.Pool(nproc) as p:
        t0 = time.perf_counter()
        p.map(burn, [work] * nproc * rounds)
        dt = time.perf_counter() - t0
    return nproc * rounds * work / dt / 1e6


def main() -> None:
    levels = [int(x) for x in sys.argv[1:]] or [2, 4, 8, 16, 32]
    thr = {n: round(measure(n), 1) for n in levels}
    effs = {}
    for a in levels:
        for b in levels:
            if b == 4 * a:
                effs[f"{a}->{b}"] = round(thr[b] / (4 * thr[a]), 3)
    print(json.dumps({"mops_per_sec": thr, "efficiency_4x": effs}))


if __name__ == "__main__":
    main()
