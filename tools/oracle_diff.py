"""Differential tester: run a registered query in Spark AND its oracle SQL in
DuckDB, compare row-count + schema + order-insensitive value-hash
(SURVEY.md §5.2). This mirrors the DRIVER's correctness gate exactly —
round 1 proved the old lenient canonicalizer (typed canon strings, dtype
coercion) masked four driver failures, so this version replicates the
driver's observed pipeline:

  1. result -> pandas (Spark `toPandas()`, DuckDB `fetchdf()`)
  2. columns sorted by name, then `sort_values` over ALL columns
     (pandas lexsort over raw cells — list/dict cells raise TypeError,
     exactly as the driver's `_canon` did on agg_collect_sorted)
  3. dtype-sensitive value hash via `pd.util.hash_pandas_object`
     (int64 vs float64 mismatch — reproduces the DuckDB-HUGEINT
     hash failures on doc_pack_bins / etl_data_expectations)

Additionally rejects any ArrayType/MapType/StructType column in a declared
Spark output (contract rule from VERDICT.md round 1).

Usage:
    python tools/oracle_diff.py [--sf /root/testdata/sf0.01] [key ...]
    (no keys => all registered keys with an oracle)
"""

from __future__ import annotations

import argparse
import datetime as dt
import decimal
import hashlib
import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

from swallow_spark import TABLES  # noqa: E402
from swallow_spark.registry import all_queries  # noqa: E402
from swallow_spark.session import get_spark  # noqa: E402

_NONSCALAR = ("array", "map", "struct")


def canon(v) -> str:
    """Canonical string form of a cell value for order-insensitive compare.

    Used by the fuzz/golden test helpers (engine-semantics equivalence,
    where cross-type tolerance is wanted) — NOT by the strict driver-mirror
    compare below, which is deliberately dtype-sensitive."""
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


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def canon_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    """Driver-style canonicalization: name-sorted columns, full-row lexsort.

    Deliberately does NOT coerce dtypes and does NOT special-case list
    cells — a list-valued column must raise TypeError here, because it
    does in the driver."""
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    if len(pdf):
        pdf = pdf.sort_values(by=cols)
    return pdf.reset_index(drop=True)


def digest(pdf: pd.DataFrame) -> str:
    """Dtype-sensitive order-insensitive-after-canon value hash.

    hash_pandas_object hashes int64 and float64 representations of the
    same number differently (float bit-pattern vs integer value), which is
    exactly the driver's sensitivity that uncast DuckDB HUGEINT tripped."""
    h = hashlib.sha256()
    for c in pdf.columns:
        h.update(str(c).encode())
        h.update(pd.util.hash_pandas_object(_norm_col(pdf[c]), index=False).values.tobytes())
    return h.hexdigest()


def _norm_col(col: pd.Series) -> pd.Series:
    """Normalize temporal transport representations before hashing.

    - datetime64 unit (us vs ns) is a transport detail; both engines are
      microsecond precision.
    - Spark DateType arrives as object-dtype datetime.date cells while
      DuckDB DATE arrives as datetime64 — the driver accepts that pairing
      (cohort_retention hash-passed in CORRECTNESS_r01), so we coerce both
      to datetime64[us] rather than flag a false mismatch.
    """
    import datetime as _dt

    if str(col.dtype).startswith("datetime64"):
        return col.astype("datetime64[us]")
    if col.dtype == object and len(col):
        nn = col.dropna()
        # check EVERY cell (result sets are small): a mixed column must fall
        # through unchanged, not crash mid-coercion; and only coerce actual
        # date/datetime instances — never pd.to_datetime's permissive string
        # parsing, which this strict driver-mirror compare must reject
        if len(nn) and all(isinstance(v, (_dt.date, _dt.datetime)) for v in nn):
            return pd.to_datetime(col).astype("datetime64[us]")
    return col


def spark_nonscalar_cols(sdf) -> list:
    return [
        f"{fld.name}:{fld.dataType.simpleString()}"
        for fld in sdf.schema.fields
        if any(fld.dataType.simpleString().startswith(p) for p in _NONSCALAR)
    ]


def compare_one(name, q, spark, con, sf_dir, max_diffs=5):
    sdf = q.fn(spark, sf_dir)
    bad = spark_nonscalar_cols(sdf)
    if bad:
        return [f"non-scalar output column(s) {bad} — forbidden in declared queries"]

    s_pdf = canon_pdf(sdf.toPandas())
    d_pdf = canon_pdf(con.sql(q.oracle).fetchdf())

    errs = []
    if list(s_pdf.columns) != list(d_pdf.columns):
        errs.append(f"columns differ: spark={list(s_pdf.columns)} duck={list(d_pdf.columns)}")
        return errs
    if len(s_pdf) != len(d_pdf):
        errs.append(f"row count differs: spark={len(s_pdf)} duck={len(d_pdf)}")
        return errs
    if digest(s_pdf) != digest(d_pdf):
        # pinpoint the offending columns for the report
        for c in s_pdf.columns:
            sc, dc = _norm_col(s_pdf[c]), _norm_col(d_pdf[c])
            sh = pd.util.hash_pandas_object(sc, index=False).values
            dh = pd.util.hash_pandas_object(dc, index=False).values
            if not np.array_equal(sh, dh):
                n_bad = int((sh != dh).sum())
                detail = f"col '{c}' differs ({n_bad} rows; dtype spark={sc.dtype} duck={dc.dtype})"
                idxs = np.nonzero(sh != dh)[0][:max_diffs]
                for i in idxs:
                    detail += f"\n    row {i}: spark={sc.iloc[i]!r} duck={dc.iloc[i]!r}"
                errs.append(detail)
        if not errs:
            errs.append("digest differs but no per-column diff found (dtype mix?)")
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
            # rows-only: check it runs, returns rows, and has scalar-only schema
            try:
                sdf = q.fn(spark, args.sf)
                bad = spark_nonscalar_cols(sdf)
                if bad:
                    raise TypeError(f"non-scalar output column(s) {bad}")
                n = len(canon_pdf(sdf.toPandas()))  # same crash surface as driver
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
