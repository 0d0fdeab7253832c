"""Pure-CPU scaling control (no JVM, no shuffle): the same arithmetic
burn at N and 4N processes. If THIS doesn't scale, the host — not the
engine — is the ceiling at that parallelism.

Usage: python scripts/cpu_control.py [N] [4N]
"""

from __future__ import annotations

import multiprocessing as mp
import sys
import time


def burn(n: int) -> float:
    s = 0.0
    x = 1.0000001
    for i in range(n):
        x = x * 1.0000001 % 2.0
        s += x
    return s


WORK = 12_000_000


def run(procs: int) -> float:
    with mp.Pool(procs) as p:
        p.map(burn, [1000] * procs)  # warm the pool
        t0 = time.time()
        p.map(burn, [WORK] * procs * 4)  # 4 waves per proc
        return time.time() - t0


def main():
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    tl = min(run(lo) for _ in range(2))
    th = min(run(hi) for _ in range(2))
    thr_l = lo * 4 / tl
    thr_h = hi * 4 / th
    eff = (thr_h / thr_l) / (hi / lo)
    print(
        f"procs {lo}: {tl:.2f}s  procs {hi}: {th:.2f}s  "
        f"efficiency {eff:.3f}"
    )


if __name__ == "__main__":
    main()
