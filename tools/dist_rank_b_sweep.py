"""Measure distributed_prefix cost vs bucket count B (SCALE.md evidence).

The round-11 change derives the default B from spark.sql.shuffle.partitions
(floor 64) instead of a fixed 64, so the widest within-bucket task shrinks
as the job is sized up. This sweep shows the local cost of raising B is
flat — the per-bucket aggregate and the ≤B-row offset window are noise next
to the one table-sized shuffle — so scaling B with the cluster is free.

Workload: global rank + one running sum over sf0.1 lineitem (600k rows,
the repo's largest fixture), keyed on l_orderkey (dense, clustered), noop
write, median of 3 after a warm-up.

Usage: python tools/dist_rank_b_sweep.py [sf_dir]
Prints one JSON line: {"rows": N, "sf_dir": ..., "spin": s,
                       "by_buckets": {B: median_sec}}
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

import bench  # noqa: E402
from swallow_spark.io import load  # noqa: E402
from swallow_spark.ops.dist_rank import distributed_prefix  # noqa: E402
from swallow_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("dist_rank_b_sweep")
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    n = li.count()

    def run(b: int) -> float:
        df = distributed_prefix(
            li,
            F.col("l_orderkey"),
            ["l_orderkey", "l_linenumber"],
            buckets=b,
            rank="r",
            sums={"cq": "l_quantity"},
        )
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    out = {"rows": n, "sf_dir": sf_dir, "by_buckets": {}}
    for b in (16, 64, 256, 1024, 4096):
        run(b)  # warm-up, unrecorded
        out["by_buckets"][b] = round(sorted(run(b) for _ in range(3))[1], 3)
    out["spin"] = round(min(bench.spin_sec() for _ in range(3)), 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
