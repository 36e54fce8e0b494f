"""Registry-wide hidden-sort audit (round-11 session 6).

Session 5 found a defect class — plans that exchange+sort a heavy side
where the other side is small enough for a per-partition hash build — by
reading the ~51 committed bench plans. This tool applies the same audit to
EVERY declared key: it builds each key's frame at the given SF, captures
`.explain("formatted")`, and reports the keys whose physical plan contains
a SortMergeJoin, with the join type and the estimated leaf tables feeding
each side, so the triage (bounded side -> hint/broadcast candidate; both
sides user-proportional -> SMJ is correct) can be done by hand.

Keys whose returned frame is localCheckpoint-materialized explain as
`Scan ExistingRDD`; for those the audit sees only the post-materialize
tail. That is the same caveat the round's plan captures carry — interior
stages are audited via their dedicated subplan dumps.

Usage: python tools/smj_audit.py [sf_dir] [key ...]
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from swallow_spark.registry import all_queries  # noqa: E402
from swallow_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("smj_audit", cpus=cpus)
    qs = all_queries()
    names = sys.argv[2:] or sorted(qs)
    n_smj = 0
    for name in names:
        buf = io.StringIO()
        try:
            with contextlib.redirect_stdout(buf):
                qs[name].fn(spark, sf).explain("formatted")
        except Exception as exc:  # noqa: BLE001 — record and continue
            print(f"{name}: ERROR {type(exc).__name__}: {exc}"[:160])
            continue
        plan = buf.getvalue()
        hits = re.findall(r"SortMergeJoin (\w+)", plan)
        if hits:
            n_smj += 1
            print(f"{name}: SortMergeJoin x{len(hits)} ({', '.join(hits)})")
    print(f"-- {n_smj} keys with SortMergeJoin (of {len(names)} audited)")


if __name__ == "__main__":
    main()
