"""Property tests for the ts_pacf algebraic Durbin–Levinson unrolling.

The determinism claim of ts_pacf (and the Cramer-OLS in ts_granger_1lag)
is that both engines evaluate CHARACTER-IDENTICAL expression strings, so
the result is one IEEE sequence regardless of engine. This suite pins the
two halves of that claim:

1. the generated expression strings (_dl_exprs) compute EXACTLY the
   textbook Durbin–Levinson recursion — Python eval of the strings is
   bit-identical to a hand-written reference loop (same left-associated
   summation order), and
2. DuckDB evaluating those same strings on bound-parameter inputs is
   bit-identical to the Python eval (the cross-engine leg; parameters,
   never inline literals — a long numeric literal parses as DECIMAL and
   loses the last ulp before any DOUBLE cast).

Spark's leg is covered by the oracle hash at all 3 SFs; this suite covers
the INPUT SPACE the fixture can't reach (arbitrary valid ACFs, including
near-unit-root ones).
"""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from swallow_spark.queries.timeseries import _PACF_M, _dl_exprs


def _ref_dl(r: list[float]) -> dict[int, float]:
    """Textbook Durbin–Levinson with the exact summation order of the
    generated expressions: Σ over j = 1..k-1 left-associated."""
    phis: dict[int, float] = {}
    prev: dict[int, float] = {}
    for k in range(1, _PACF_M + 1):
        if k == 1:
            kk = r[1]
            cur = {1: kk}
        else:
            num = 0.0
            first = True
            for j in range(1, k):
                term = prev[j] * r[k - j]
                num = term if first else num + term
                first = False
            den = 0.0
            first = True
            for j in range(1, k):
                term = prev[j] * r[j]
                den = term if first else den + term
                first = False
            kk = (r[k] - num) / (1 - den)
            cur = {k: kk}
            for j in range(1, k):
                cur[j] = prev[j] - kk * prev[k - j]
        phis[k] = kk
        prev = cur
    return phis


def _acf_from_series(xs: list[int]) -> list[float]:
    """Sample lag-0..5 autocorrelations of an integer series via the same
    exact-int sufficient statistics ts_pacf uses, quantized to micro."""
    out = [1.0]
    n_all = len(xs)
    for lag in range(1, _PACF_M + 1):
        a = xs[: n_all - lag]
        b = xs[lag:]
        n = len(a)
        sa, sb = sum(a), sum(b)
        sab = sum(x * y for x, y in zip(a, b))
        saa = sum(x * x for x in a)
        sbb = sum(y * y for y in b)
        va = n * saa - sa * sa
        vb = n * sbb - sb * sb
        if va <= 0 or vb <= 0:
            return []  # constant sub-series: rho undefined
        rho = (n * sab - sa * sb) / math.sqrt(float(va) * float(vb))
        out.append(math.floor(rho * 1000000 + 0.5) / 1000000)
    return out


series = st.lists(
    st.integers(min_value=-10_000, max_value=10_000), min_size=12, max_size=60
)


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


@settings(max_examples=60, deadline=None)
@given(series)
def test_dl_exprs_match_reference_and_duckdb(con, xs):
    r = _acf_from_series(xs)
    if not r:
        return
    # guard: DL denominators must be non-degenerate for a meaningful check
    ref = _ref_dl(r)
    if any(not math.isfinite(v) for v in ref.values()):
        return

    # 1) Python eval of the generated strings == reference loop, bit-exact
    env = {f"r{k}": r[k] for k in range(1, _PACF_M + 1)}
    for name, expr in _dl_exprs():
        env[name] = eval(expr, {}, env)  # noqa: S307 — repo-generated exprs
    for k in range(1, _PACF_M + 1):
        assert env[f"p{k}_{k}"] == ref[k], (k, env[f"p{k}_{k}"], ref[k])

    # 2) DuckDB eval of the same strings on bound params, bit-exact
    src = (
        "(SELECT "
        + ", ".join(f"CAST(? AS DOUBLE) AS r{k}" for k in range(1, _PACF_M + 1))
        + ")"
    )
    for name, expr in _dl_exprs():
        src = f"(SELECT *, {expr} AS {name} FROM {src})"
    cols = ", ".join(f"p{k}_{k}" for k in range(1, _PACF_M + 1))
    got = con.execute(
        f"SELECT {cols} FROM {src}", [r[k] for k in range(1, _PACF_M + 1)]
    ).fetchone()
    for k in range(1, _PACF_M + 1):
        assert got[k - 1] == ref[k], (k, got[k - 1], ref[k])

# Ritual-only suite (VERDICT r11 item 1): exhaustive sweep / mutated-data
# parity / hypothesis battery / timed gate — skipped by a plain pytest run
# so the driver-visible suite finishes; SWALLOW_FULL_TESTS=1 runs it.
pytestmark = pytest.mark.slow
