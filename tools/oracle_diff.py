"""Differential tester: run a registered query in Spark AND its oracle SQL in
DuckDB, compare row-count + schema-class + order-insensitive values
(SURVEY.md §5.2). This mirrors the driver's correctness gate so nothing is
declared in __spark_entry__ without passing here first.

Usage:
    python tools/oracle_diff.py [--sf /root/testdata/sf0.01] [key ...]
    (no keys => all registered keys with an oracle)
"""

from __future__ import annotations

import argparse
import datetime as dt
import decimal
import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402

from swallow_spark import TABLES  # noqa: E402
from swallow_spark.registry import all_queries  # noqa: E402
from swallow_spark.session import get_spark  # noqa: E402


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def canon(v) -> str:
    """Canonical string form of a cell value for order-insensitive compare."""
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return "T" if v else "F"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # exact shortest repr — bit-identical floats only
    if isinstance(v, decimal.Decimal):
        return f"dec:{v}"
    if isinstance(v, dt.datetime):
        return "ts:" + v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return "d:" + v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon(x)}" for k, x in sorted(v.items())) + "}"
    return repr(v)


_SPARK_CLASS = {
    "tinyint": "int", "smallint": "int", "int": "int", "bigint": "int",
    "float": "float", "double": "float", "string": "str", "boolean": "bool",
    "date": "date", "timestamp": "ts", "timestamp_ntz": "ts", "binary": "bin",
}
_DUCK_CLASS = {
    "TINYINT": "int", "SMALLINT": "int", "INTEGER": "int", "BIGINT": "int",
    "HUGEINT": "int", "UTINYINT": "int", "USMALLINT": "int", "UINTEGER": "int",
    "UBIGINT": "int", "FLOAT": "float", "DOUBLE": "float", "VARCHAR": "str",
    "BOOLEAN": "bool", "DATE": "date", "TIMESTAMP": "ts", "BLOB": "bin",
}


def type_class(t: str) -> str:
    t = t.strip()
    if t.lower().startswith("array") or t.upper().endswith("[]"):
        return "list"
    if t.lower().startswith("decimal") or t.upper().startswith("DECIMAL"):
        return "dec"
    return _SPARK_CLASS.get(t.lower()) or _DUCK_CLASS.get(t.upper()) or t


def compare_one(name, q, spark, con, sf_dir, max_diffs=5):
    sdf = q.fn(spark, sf_dir)
    s_cols = sorted(sdf.columns)
    s_types = {c: t for c, t in sdf.dtypes}
    s_rows = [tuple(canon(r[c]) for c in s_cols) for r in sdf.collect()]

    rel = con.sql(q.oracle)
    d_cols_raw = list(rel.columns)
    d_type_by_col = {c: str(t) for c, t in zip(rel.columns, rel.types)}
    d_cols = sorted(d_cols_raw)
    idx = [d_cols_raw.index(c) for c in d_cols]
    d_rows = [tuple(canon(row[i]) for i in idx) for row in rel.fetchall()]

    errs = []
    if s_cols != d_cols:
        errs.append(f"columns differ: spark={s_cols} duck={d_cols}")
    else:
        for c in s_cols:
            sc, dc = type_class(s_types[c]), type_class(d_type_by_col[c])
            if sc != dc:
                errs.append(f"type class differs on {c}: spark={s_types[c]}({sc}) duck={d_type_by_col[c]}({dc})")
    if len(s_rows) != len(d_rows):
        errs.append(f"row count differs: spark={len(s_rows)} duck={len(d_rows)}")
    if not errs:
        s_sorted, d_sorted = sorted(s_rows), sorted(d_rows)
        if s_sorted != d_sorted:
            n_bad = 0
            diffs = []
            for a, b in zip(s_sorted, d_sorted):
                if a != b:
                    n_bad += 1
                    if len(diffs) < max_diffs:
                        diffs.append(f"  spark={a}\n   duck={b}")
            errs.append(f"values differ in {n_bad} sorted positions:\n" + "\n".join(diffs))
    return errs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("keys", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--include-rows-only", action="store_true")
    args = ap.parse_args()

    qs = all_queries()
    keys = args.keys or [k for k, q in qs.items() if q.oracle or args.include_rows_only]
    spark = get_spark("oracle_diff")
    con = duck_con(args.sf)

    n_pass = n_fail = 0
    failed = []
    for k in keys:
        q = qs[k]
        if q.oracle is None:
            # rows-only: just check it runs and returns a stable schema
            try:
                n = q.fn(spark, args.sf).count()
                print(f"ROWS-ONLY {k}: {n} rows")
                n_pass += 1
            except Exception as e:
                print(f"FAIL {k}: {type(e).__name__}: {e}")
                n_fail += 1
                failed.append(k)
            continue
        try:
            errs = compare_one(k, q, spark, con, args.sf)
        except Exception as e:
            errs = [f"{type(e).__name__}: {e}"]
        if errs:
            n_fail += 1
            failed.append(k)
            print(f"FAIL {k}:")
            for e in errs:
                print(f"  {e}")
        else:
            n_pass += 1
            print(f"PASS {k}")
    print(f"\n{n_pass} passed, {n_fail} failed" + (f": {failed}" if failed else ""))
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
