"""Measure the host's actually-deliverable CPU parallelism.

This sandbox reports 32 vCPUs but sits on a noisy shared host: aggregate
throughput varies several-fold minute to minute, and in bad windows the box
delivers single-digit effective cores. Benchmarks must therefore (a) take
min-of-repeats, and (b) not over-read any single local[N]-vs-local[4N]
comparison. Run this next to a benchmark to know what the host was giving.

    python tools/cpu_probe.py
"""

from __future__ import annotations

import multiprocessing as mp
import time

WORK = 10_000_000


def _burn(n: int) -> int:
    x = 0
    for i in range(n):
        x += i * i
    return x


def measure(procs: int, repeats: int = 3, work: int = WORK) -> float:
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        with mp.Pool(procs) as p:
            p.map(_burn, [work] * procs)
        best = min(best, time.perf_counter() - t0)
    return best


def steal_context(procs: int = 8, repeats: int = 1, work: int = WORK) -> dict:
    """~2 s probe embeddable in bench JSON: what was the host giving?

    Returns the single-process unit-of-work time and the effective core
    count at `procs` workers. Bench outputs carry this so a cross-round
    comparison can tell code regressions from host weather without
    re-running anything (VERDICT r2 'bench comparability hygiene')."""
    base = measure(1, repeats=repeats, work=work)
    wall = measure(procs, repeats=repeats, work=work)
    return {
        "unit_seconds_1proc": round(base, 3),
        "probe_procs": procs,
        "probe_wall_seconds": round(wall, 3),
        "effective_cores": round(procs * base / wall, 2),
    }


def main() -> None:
    base = measure(1)
    print(f" 1 proc: {base:.2f}s (unit of work)")
    for procs in (2, 4, 8, 16, 32):
        w = measure(procs)
        print(
            f"{procs:2d} procs: wall={w:.2f}s  "
            f"effective_cores={procs * base / w:.1f}"
        )


if __name__ == "__main__":
    main()
