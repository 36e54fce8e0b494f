"""Record the quiet-box per-key bench baseline (VERDICT r7 item 2).

Runs the headline + extended keys with bench.py's exact protocol (noop sink,
warm-up, median of 3) and writes tests/golden/bench_quiet_baseline.json —
the reference the regression gate (tests/test_bench_regression.py) compares
against. REFUSES to record on a contended box: a baseline taken under load
would make the gate permanently loose.

Usage:  python tools/bench_baseline.py [--force]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402
from swallow_spark.registry import declared_queries  # noqa: E402
from swallow_spark.session import get_spark  # noqa: E402

OUT = Path(__file__).resolve().parent.parent / "tests/golden/bench_quiet_baseline.json"
SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--force", action="store_true", help="record even if contended")
    args = ap.parse_args()

    sp = bench.spin_sec()
    if sp > bench.SPIN_REF_SEC * (1 + bench.SPIN_TOL) and not args.force:
        sys.exit(f"box contended (spin {sp} > {bench.SPIN_REF_SEC}×1.25) — not recording")

    spark = get_spark("bench_baseline", cpus=32)
    qs = declared_queries()
    names = [n for n in bench.HEADLINE + bench.EXTENDED if n in qs]

    def run_once(name: str) -> float:
        t0 = time.perf_counter()
        qs[name].fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    run_once("limit_topn")
    baseline: dict[str, float] = {}
    for name in names:
        run_once(name)  # warm-up
        runs = sorted(run_once(name) for _ in range(3))
        baseline[name] = round(runs[1], 3)
        print(f"{name}: {baseline[name]}", file=sys.stderr)

    OUT.write_text(
        json.dumps(
            {
                "sf_dir": SF_DIR,
                "spin_sec_at_record": sp,
                "spin_ref_sec": bench.SPIN_REF_SEC,
                "recorded_unix": int(time.time()),
                "medians": baseline,
            },
            indent=1,
        )
        + "\n"
    )
    print(f"wrote {OUT}", file=sys.stderr)


if __name__ == "__main__":
    main()
