"""Per-key warm timing for the optimization round: median-of-3 noop-sink
runs with a per-key spin sample, same methodology as bench.py but for an
arbitrary key list (so before/after deltas can be measured without paying
for the whole bench).

Usage: python tools/opt_time.py key1 [key2 ...]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from bench import SPIN_REF_SEC, spin_sec  # noqa: E402

from swallow_spark.registry import all_queries  # noqa: E402
from swallow_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    keys = sys.argv[1:]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("opt_time", cpus=cpus)
    qs = all_queries()

    def run_once(name: str) -> float:
        t0 = time.perf_counter()
        qs[name].fn(spark, SF).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for name in keys:
        spark.sparkContext.setJobDescription(f"opt_time:{name}")
        run_once(name)  # warm-up (codegen + edge caches), unrecorded
        sp = spin_sec()
        runs = sorted(run_once(name) for _ in range(3))
        norm = runs[1] / max(sp / SPIN_REF_SEC, 1.0)
        print(
            f"{name}: median {runs[1]:.3f}s raw, {norm:.3f}s normalized "
            f"(spin {sp:.3f}, runs {[round(r, 3) for r in runs]})"
        )


if __name__ == "__main__":
    main()
