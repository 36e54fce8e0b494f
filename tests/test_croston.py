"""ts_croston: Python-reference check of the two-EWMA fold over the sparse
demand sequence (same recipe as tests/test_timeseries_holt.py — the Spark
result must equal an independently-coded per-user Python fold)."""

from __future__ import annotations

import math

import pandas as pd
import pyarrow.parquet as pq

from swallow_spark.registry import all_queries
from tests.conftest import SF_SMOKE

A = 0.3


def _croston_ref(pairs: list[tuple[float, float]]) -> tuple[float, float]:
    z, p = pairs[0]
    for d, g in pairs[1:]:
        z = z + A * (d - z)
        p = p + A * (g - p)
    return z, p


def test_croston_matches_python_reference(spark):
    got = (
        all_queries()["ts_croston"]
        .fn(spark, SF_SMOKE)
        .toPandas()
        .set_index("user_id")
    )
    ev = pq.read_table(f"{SF_SMOKE}/events.parquet").to_pandas()
    ev = ev[(ev["event_type"] == "purchase") & ev["value"].notna()].copy()
    ev["day"] = pd.to_datetime(ev["ts"]).dt.date
    ev["cents"] = (ev["value"] * 100 + 0.5).apply(lambda v: int(v // 1))
    daily = (
        ev.groupby(["user_id", "day"])["cents"].sum().astype(float) / 100
    ).reset_index()
    n_checked = 0
    for uid, grp in daily.groupby("user_id"):
        grp = grp.sort_values("day")
        days = grp["day"].tolist()
        gaps = [1.0] + [float((b - a).days) for a, b in zip(days, days[1:])]
        pairs = list(zip(grp["cents"].tolist(), gaps))
        z, p = _croston_ref(pairs)
        row = got.loc[uid]
        assert row["n_demand_days"] == len(pairs)
        assert abs(row["demand_level"] - math.floor(z * 10000 + 0.5) / 10000) < 1e-9
        assert abs(row["interval_level"] - math.floor(p * 10000 + 0.5) / 10000) < 1e-9
        assert abs(row["croston_rate"] - math.floor(z / p * 10000 + 0.5) / 10000) < 1e-9
        n_checked += 1
    assert n_checked == len(got)
