"""Run any registered query key from the command line.

Usage:
    python tools/run_query.py <key> [--sf DIR] [--show N] [--explain]
    python tools/run_query.py --list
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from swallow_spark.registry import all_queries  # noqa: E402
from swallow_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("key", nargs="?")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--show", type=int, default=20)
    ap.add_argument("--explain", action="store_true")
    ap.add_argument("--list", action="store_true")
    args = ap.parse_args()

    qs = all_queries()
    if args.list or not args.key:
        for name, q in qs.items():
            kind = "oracle" if q.oracle else "rows-only"
            print(f"{name:32s} {q.tier:3s} {kind:9s} {q.doc.strip().splitlines()[0] if q.doc else ''}")
        return 0
    if args.key not in qs:
        print(f"unknown key {args.key!r}; use --list", file=sys.stderr)
        return 1
    spark = get_spark("run_query")
    df = qs[args.key].fn(spark, args.sf)
    if args.explain:
        df.explain("formatted")
    df.show(args.show, truncate=False)
    print(f"[{args.key}] {df.count()} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
