"""Interleaved env-flag A/B with more rounds and a trimmed mean (r11 s5).

tools/opt_ab.py's median-of-3 is enough on a box with stationary noise;
under this host's steal-time waves a single 20 s burst lands in one arm
and decides the median. This variant runs N interleaved rounds (default 8)
and compares TRIMMED means (drop the top-2 of each arm), so a burst that
hits either arm is discarded instead of deciding the verdict.

Usage: python tools/opt_ab_trimmed.py ENV_VAR key [rounds]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from swallow_spark.registry import all_queries  # noqa: E402
from swallow_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    env, key = sys.argv[1], sys.argv[2]
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("opt_ab_trimmed", cpus=cpus)
    qs = all_queries()

    def run(on: bool) -> float:
        os.environ[env] = "1" if on else "0"
        t0 = time.perf_counter()
        qs[key].fn(spark, SF).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    run(True)
    run(False)  # warm both plan variants, unrecorded
    on: list[float] = []
    off: list[float] = []
    for _ in range(rounds):
        on.append(run(True))
        off.append(run(False))

    def tmean(v: list[float]) -> float:
        s = sorted(v)[: max(1, len(v) - 2)]
        return sum(s) / len(s)

    print(f"{key}: {env}=1 trimmed {tmean(on):.3f}s vs =0 {tmean(off):.3f}s")
    print("  on :", [round(r, 2) for r in sorted(on)])
    print("  off:", [round(r, 2) for r in sorted(off)])
    os.environ.pop(env, None)


if __name__ == "__main__":
    main()
