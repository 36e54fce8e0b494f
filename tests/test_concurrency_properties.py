"""Property test for win_concurrency_sweep: random interval layouts
clustered on the exact half-open boundary (one interval ending at the
instant another starts) must produce the SAME per-type max concurrency in
Spark, in the registered DuckDB oracle, and in a pure-Python sweep —
pinning that the −1 endpoint processes before the +1 at the same instant
(half-open [t, t+300s) never double-counts) and that tie groups of equal
deltas leave the peak order-independent.
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

_BASE = dt.datetime(2024, 1, 1)
_WINDOW_S = 300

# event start offsets in SECONDS — clustered on multiples of the window
# (exact end==start collisions), one-off boundaries, and free values
_start = st.one_of(
    st.just(0),
    st.just(_WINDOW_S),
    st.just(2 * _WINDOW_S),
    st.just(_WINDOW_S - 1),
    st.just(_WINDOW_S + 1),
    st.integers(min_value=0, max_value=4 * _WINDOW_S),
)
_type_timeline = st.lists(_start, min_size=1, max_size=12)
_scenario = st.lists(_type_timeline, min_size=1, max_size=3)


def _materialize(case, tmpdir):
    rows = []
    eid = 0
    for t_idx, starts in enumerate(case):
        for s in starts:
            eid += 1
            rows.append(
                {
                    "event_id": eid,
                    "user_id": 1,
                    "event_type": f"type_{t_idx}",
                    "ts": _BASE + dt.timedelta(seconds=s),
                }
            )
    pdf = pd.DataFrame(rows)
    con = duckdb.connect()
    con.execute(
        f"COPY (SELECT * FROM pdf) TO '{tmpdir}/events.parquet' (FORMAT PARQUET)"
    )
    con.close()
    return rows


def _ref_sweep(rows):
    """Pure-Python sweep: ±1 points sorted by (time, delta) — the −1 of an
    interval ending at t sorts before a +1 starting at t."""
    out = {}
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r["ts"])
    for et, starts in by_type.items():
        pts = [(t, 1) for t in starts] + [
            (t + dt.timedelta(seconds=_WINDOW_S), -1) for t in starts
        ]
        pts.sort(key=lambda p: (p[0], p[1]))
        cur = peak = 0
        for _, d in pts:
            cur += d
            peak = max(peak, cur)
        out[et] = (peak, len(starts))
    return out


@pytest.fixture(scope="module")
def qs():
    from swallow_spark.registry import all_queries

    return all_queries()


@settings(max_examples=30, deadline=None)
@given(_scenario)
def test_concurrency_spark_duckdb_reference_agree(spark, qs, tmp_path_factory, case):
    tmpdir = str(tmp_path_factory.mktemp("conc"))
    rows = _materialize(case, tmpdir)
    want = _ref_sweep(rows)

    q = qs["win_concurrency_sweep"]
    got_spark = {
        r.event_type: (r.max_concurrent, r.n_intervals)
        for r in q.fn(spark, tmpdir).collect()
    }
    assert got_spark == want

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{tmpdir}/events.parquet')"
    )
    got_duck = {r[0]: (r[1], r[2]) for r in con.sql(q.oracle).fetchall()}
    con.close()
    assert got_duck == want

# Ritual-only suite (VERDICT r11 item 1): exhaustive sweep / mutated-data
# parity / hypothesis battery / timed gate — skipped by a plain pytest run
# so the driver-visible suite finishes; SWALLOW_FULL_TESTS=1 runs it.
pytestmark = pytest.mark.slow
