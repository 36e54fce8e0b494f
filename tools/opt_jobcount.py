"""Per-key Spark job/stage counter (round-11 session 5).

Wall-clock on this box is contention-warped, but job and stage COUNTS are
exact — and a key whose single logical query fans into 15+ driver actions
is paying sequential stage-scheduling latency that no per-stage tuning
recovers (the eval_bradley_terry finding, 10 jobs -> 3). This tool runs
each key once warm, then once inside a fresh job group, and prints how
many jobs/stages the statusTracker attributes to it.

Usage: python tools/opt_jobcount.py key1 [key2 ...]
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
    keys = sys.argv[1:]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("opt_jobcount", cpus=cpus)
    qs = all_queries()
    for name in keys:
        qs[name].fn(spark, SF).write.format("noop").mode("overwrite").save()
        tr = spark.sparkContext.statusTracker()
        spark.sparkContext.setJobGroup(f"jc_{name}", name)
        t0 = time.perf_counter()
        qs[name].fn(spark, SF).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        jobs = tr.getJobIdsForGroup(f"jc_{name}") or []
        nstages = 0
        for j in jobs:
            ji = tr.getJobInfo(j)
            if ji:
                nstages += len(ji.stageIds)
        print(f"{name:35s} jobs={len(jobs):3d} stages={nstages:3d} wall={dt:.3f}s")
        spark.sparkContext.setJobGroup(None, None)


if __name__ == "__main__":
    main()
