"""Freeze DuckDB oracle outputs for T1 keys at sf0.001 into tests/golden/
(SURVEY.md §5.2) so the fast pytest tier runs without DuckDB churn.

Usage: python tools/make_golden.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from tools.oracle_diff import canon, duck_con  # noqa: E402

from swallow_spark.registry import all_queries  # noqa: E402

SF = "/root/testdata/sf0.001"
OUT = REPO / "tests" / "golden"


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)
    con = duck_con(SF)
    n = 0
    for name, q in all_queries().items():
        if q.tier != "T1" or not q.oracle:
            continue
        rel = con.sql(q.oracle)
        cols = sorted(rel.columns)
        idx = [list(rel.columns).index(c) for c in cols]
        rows = sorted(tuple(canon(r[i]) for i in idx) for r in rel.fetchall())
        (OUT / f"{name}.json").write_text(
            json.dumps({"columns": cols, "rows": [list(r) for r in rows]}, indent=0)
        )
        n += 1
    print(f"wrote {n} golden files to {OUT}")


if __name__ == "__main__":
    main()
