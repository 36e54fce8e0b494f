"""Interleaved A/B for an arbitrary plan-construction env flag (round 11).

Generalizes tools/fanout_ab.py: box contention on this machine drifts
minute-to-minute (consecutive full-bench runs disagree per-key by up to 3x),
so two back-to-back timing sessions confound variant with drift. This
harness flips the given env var *inside one Spark session* and alternates
ON/OFF runs per key (after one unrecorded warm-up of each variant), so both
variants sample the same seconds of box noise. The flag must be read by the
query code at plan-construction time.

Usage: python tools/opt_ab.py ENV_VAR key1 [key2 ...]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from bench import spin_sec  # noqa: E402

from swallow_spark.registry import all_queries  # noqa: E402
from swallow_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = 3


def main() -> None:
    env_var, keys = sys.argv[1], sys.argv[2:]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("opt_ab", cpus=cpus)
    qs = all_queries()

    def run_once(name: str, enabled: bool) -> float:
        os.environ[env_var] = "1" if enabled else "0"
        t0 = time.perf_counter()
        qs[name].fn(spark, SF).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for name in keys:
        spark.sparkContext.setJobDescription(f"opt_ab:{name}")
        run_once(name, True)
        run_once(name, False)  # warm both plan variants, unrecorded
        on: list[float] = []
        off: list[float] = []
        for _ in range(ROUNDS):
            on.append(run_once(name, True))
            off.append(run_once(name, False))
        sp = spin_sec()
        m_on, m_off = sorted(on)[1], sorted(off)[1]
        verdict = "WIN" if m_on < m_off * 0.95 else (
            "LOSS" if m_on > m_off * 1.05 else "same"
        )
        print(
            f"{name}: {env_var}=1 {m_on:.3f}s vs =0 {m_off:.3f}s -> {verdict} "
            f"(spin {sp:.3f}, on {[round(r, 3) for r in sorted(on)]}, "
            f"off {[round(r, 3) for r in sorted(off)]})"
        )
    os.environ.pop(env_var, None)


if __name__ == "__main__":
    main()
