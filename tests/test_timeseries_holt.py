"""ts_holt_linear: Python-reference check of the fold, plus a pinned
demonstration of the DuckDB v1.0 struct-accumulator aliasing quirk that
forced the array-state formulation (see the key's docstring)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow.parquet as pq

from swallow_spark.registry import all_queries
from tests.conftest import SF_SMOKE

A, B = 0.3, 0.2


def _holt_ref(xs: list[float]) -> tuple[float, float]:
    l, b = xs[0], 0.0
    for x in xs[1:]:
        nl = A * x + (1.0 - A) * (l + b)
        nb = B * (nl - l) + (1.0 - B) * b
        l, b = nl, nb
    return l, b


def test_holt_matches_python_reference(spark):
    got = (
        all_queries()["ts_holt_linear"]
        .fn(spark, SF_SMOKE)
        .toPandas()
        .set_index("user_id")
    )
    ev = pq.read_table(f"{SF_SMOKE}/events.parquet").to_pandas()
    ev["day"] = pd.to_datetime(ev["ts"]).dt.date
    ev["cents"] = (ev["value"] * 100 + 0.5).apply(lambda v: int(v // 1))
    daily = (
        ev.groupby(["user_id", "day"])["cents"].sum().astype(float) / 100
    ).reset_index()
    for uid, grp in daily.groupby("user_id"):
        xs = grp.sort_values("day")["cents"].tolist()
        l, b = _holt_ref(xs)
        row = got.loc[uid]
        assert row["n_days"] == len(xs)
        assert abs(row["level"] - round(l, 4)) < 1e-9 + 1e-4
        assert abs(row["trend"] - round(b, 4)) < 1e-9 + 1e-4


def test_duckdb_struct_accumulator_aliasing_quirk():
    """Pin the behavior that justifies the array-state design: with a
    struct accumulator, a later field referencing acc.l reads the NEW
    level computed earlier in the same step (123), not the pre-step value
    (12). If this ever starts returning 12.0, DuckDB fixed the aliasing
    and the struct formulation becomes viable again."""
    con = duckdb.connect()
    (res,) = con.sql(
        """
        SELECT list_reduce(
          list_transform(CAST([1.0, 2.0, 3.0] AS DOUBLE[]),
                         v -> {'l': v, 'b': CAST(0.0 AS DOUBLE)}),
          (acc, x) -> {'l': acc.l * 10 + x.l, 'b': acc.l})
        """
    ).fetchone()
    assert res["l"] == 123.0
    assert res["b"] in (123.0, 12.0)  # aliased today; 12.0 if ever fixed
    # the ARRAY accumulator reads pre-step values (what both engines must do)
    (arr,) = con.sql(
        """
        SELECT list_reduce(
          list_transform(CAST([1.0, 2.0, 3.0] AS DOUBLE[]),
                         v -> [v, CAST(0.0 AS DOUBLE)]),
          (acc, x) -> [acc[1] * 10 + x[1], acc[1]])
        """
    ).fetchone()
    assert arr == [123.0, 12.0]
