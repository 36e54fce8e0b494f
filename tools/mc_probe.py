"""Multi-core box-health probe (round-11 session 5).

The single-thread spin marker (bench.spin_sec) misses a failure mode this
host exhibits: hypervisor steal-time WAVES that leave single-thread work
near-normal while 32-way parallel work degrades 3-4x (observed /proc/stat
steal exceeding user time). Spark stages are parallel, so a bench run can
be inflated 10-50x on scattered keys while the spin marker reads ~quiet.

This probe times the SAME fixed workload once single-process and once as
32 concurrent processes; on healthy hardware the 32-way wall time is close
to the single time (ratio ~1 plus scheduler noise). Ratios observed on
this box: 1.4-1.7 (quiet window) vs 2.4-4.1 (steal wave).

Usage: python tools/mc_probe.py    # one line: single, mc32, ratio
"""

from __future__ import annotations

import multiprocessing as mp
import time


def spin() -> None:
    x = 0
    for i in range(5_000_000):
        x += i


def probe() -> tuple[float, float]:
    t0 = time.perf_counter()
    spin()
    single = time.perf_counter() - t0
    t0 = time.perf_counter()
    ps = [mp.Process(target=spin) for _ in range(32)]
    for p in ps:
        p.start()
    for p in ps:
        p.join()
    mc = time.perf_counter() - t0
    return single, mc


if __name__ == "__main__":
    s, m = probe()
    print(
        f"{time.strftime('%H:%M:%S')} single={s:.3f} mc32={m:.3f} "
        f"ratio={m / s:.1f}"
    )
