"""Property tests for the round-7 shared closed-form expression chains
(Dickey–Fuller, Wilson interval): the determinism claim is that both
engines evaluate CHARACTER-IDENTICAL strings on identical exact-int64
inputs, so one Python replication with the same op order must be
bit-identical to DuckDB evaluating the repo's actual expression strings
on bound parameters (never inline literals — the DECIMAL-parse ulp trap).
The Spark leg is pinned by the oracle hash at 3 SFs; this covers the
input space the fixture can't reach (tiny n, extreme proportions,
near-constant series).
"""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import assume, given, settings
from hypothesis import strategies as st

from swallow_spark.queries.stats_extra import _WILSON_CENTER, _WILSON_HALF
from swallow_spark.queries.timeseries import _DF_BETA, _DF_T


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


# ------------------------------------------------------------- Wilson

@settings(max_examples=150, deadline=None)
@given(
    st.integers(min_value=1, max_value=10**9),
    st.integers(min_value=0, max_value=10**9),
)
def test_wilson_expressions_match_python(con, n, x):
    assume(x <= n)
    p_hat = float(x) / n

    # Python replication with the expressions' exact op order
    center = (p_hat + 1.96 * 1.96 / (2 * n)) / (1 + 1.96 * 1.96 / n)
    half = (
        1.96 * math.sqrt(p_hat * (1 - p_hat) / n + 1.96 * 1.96 / (4 * n * n))
    ) / (1 + 1.96 * 1.96 / n)
    want_lo = math.floor((center - half) * 1000000 + 0.5) / 1000000
    want_hi = math.floor((center + half) * 1000000 + 0.5) / 1000000

    got = con.execute(
        f"""
        WITH p AS (SELECT CAST(? AS BIGINT) AS n,
                          CAST(? AS DOUBLE) AS p_hat)
        SELECT FLOOR(({_WILSON_CENTER} - {_WILSON_HALF}) * 1000000 + 0.5)
                 / 1000000,
               FLOOR(({_WILSON_CENTER} + {_WILSON_HALF}) * 1000000 + 0.5)
                 / 1000000
        FROM p
        """,
        [n, p_hat],
    ).fetchone()
    assert got[0] == want_lo and got[1] == want_hi, (got, want_lo, want_hi)


# -------------------------------------------------------- Dickey–Fuller

series = st.lists(
    st.integers(min_value=-10_000, max_value=10_000), min_size=5, max_size=50
)


@settings(max_examples=100, deadline=None)
@given(series)
def test_dickey_fuller_expressions_match_python(con, xs):
    x = xs[:-1]
    y = [b - a for a, b in zip(xs[:-1], xs[1:])]
    n = len(x)
    sx, sy = sum(x), sum(y)
    sxy = sum(a * b for a, b in zip(x, y))
    sxx = sum(a * a for a in x)
    syy = sum(b * b for b in y)
    den = float(n) * sxx - float(sx) * sx
    assume(den != 0)  # constant regressor: beta undefined

    beta = (float(n) * sxy - float(sx) * sy) / den
    syy_c = float(syy) - float(sy) * sy / n
    sxy_c = float(sxy) - float(sx) * sy / n
    sxx_c = float(sxx) - float(sx) * sx / n
    rss_over = (syy_c - beta * sxy_c) / (n - 2)
    assume(rss_over > 0)  # perfectly-fit series: t undefined
    t = beta / math.sqrt(rss_over / sxx_c)

    got = con.execute(
        f"""
        WITH s AS (SELECT CAST(? AS BIGINT) AS n, CAST(? AS BIGINT) AS sx,
                          CAST(? AS BIGINT) AS sy, CAST(? AS BIGINT) AS sxy,
                          CAST(? AS BIGINT) AS sxx, CAST(? AS BIGINT) AS syy)
        SELECT {_DF_BETA}, {_DF_T} FROM s
        """,
        [n, sx, sy, sxy, sxx, syy],
    ).fetchone()
    assert got[0] == beta, (got[0], beta)
    assert got[1] == t, (got[1], t)

# Ritual-only suite (VERDICT r11 item 1): exhaustive sweep / mutated-data
# parity / hypothesis battery / timed gate — skipped by a plain pytest run
# so the driver-visible suite finishes; SWALLOW_FULL_TESTS=1 runs it.
pytestmark = pytest.mark.slow
