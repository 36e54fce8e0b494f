"""Cross-checks for eval_auc_delong_paired beyond the three-engine suite:

1. Its model-A AUC must agree with stats_auc_roc's auc_micro on the real
   fixture — both keys derive AUC from the SAME (price, finished) pair via
   completely different constructions (joint-pair placements vs
   Mann-Whitney rank sum), so agreement within 1 micro (independent
   rounding) pins both against a shared construction bug.
2. The micro-quantization of placements must not move the STATISTICS:
   against an unquantized float DeLong reference (numpy-free, direct
   counting with 0.5 tie weights), AUC agrees to the output quantizer's
   half-ulp and se/z to the documented error bound of the 1e-6 placement
   grid.
"""

from __future__ import annotations

import math
import random

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def qs():
    from swallow_spark.registry import all_queries

    return all_queries()


def test_auc_matches_stats_auc_roc(spark, qs):
    delong = {
        r["segment"]: r["auc_a"]
        for r in qs["eval_auc_delong_paired"].fn(spark, SF).collect()
    }
    roc = {
        r["segment"]: r["auc_micro"]
        for r in qs["stats_auc_roc"].fn(spark, SF).collect()
    }
    assert delong, "no segments survived the m,n >= 2 guard on the fixture"
    for seg, auc_a in delong.items():
        assert seg in roc
        assert abs(auc_a * 1_000_000 - roc[seg]) <= 1.0, (
            seg,
            auc_a,
            roc[seg],
        )


def _float_delong(rows):
    """Unquantized float DeLong on (cents, day, y) tuples — one segment."""
    m = sum(1 for *_, y in rows if y)
    n = len(rows) - m

    def placements(idx):
        pos = [r[idx] for r in rows if r[2] == 1]
        neg = [r[idx] for r in rows if r[2] == 0]
        v10, v01 = [], []
        for x, _, y in [(r[idx], None, r[2]) for r in rows]:
            if y == 1:
                v10.append(
                    (sum(1 for v in neg if v < x) + 0.5 * sum(1 for v in neg if v == x))
                    / n
                )
            else:
                v01.append(
                    1.0
                    - (
                        sum(1 for v in pos if v < x)
                        + 0.5 * sum(1 for v in pos if v == x)
                    )
                    / m
                )
        return v10, v01

    va10, va01 = placements(0)
    vb10, vb01 = placements(1)
    auc_a = sum(va10) / m
    auc_b = sum(vb10) / m

    def svar(xs, mean):
        return sum((x - mean) ** 2 for x in xs) / (len(xs) - 1)

    def scov(xs, ys, mx, my):
        return sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / (len(xs) - 1)

    ma10, mb10 = sum(va10) / m, sum(vb10) / m
    ma01, mb01 = sum(va01) / n, sum(vb01) / n
    var_diff = (
        svar(va10, ma10) + svar(vb10, mb10) - 2 * scov(va10, vb10, ma10, mb10)
    ) / m + (
        svar(va01, ma01) + svar(vb01, mb01) - 2 * scov(va01, vb01, ma01, mb01)
    ) / n
    return auc_a, auc_b, var_diff


def test_quantization_error_bounded(spark, qs, tmp_path):
    rng = random.Random(42)
    rows = []
    for _ in range(240):
        cents = rng.randrange(1, 40) * 100  # heavy ties
        day = rng.randrange(0, 30)
        y = rng.random() < (0.25 + 0.5 * (cents > 2000))  # informative scores
        rows.append((cents, day, int(y)))

    cust = pd.DataFrame(
        {"c_custkey": [1], "c_name": ["X"], "c_mktsegment": ["AUTOMOBILE"]}
    )
    orders = pd.DataFrame(
        {
            "o_orderkey": range(1, len(rows) + 1),
            "o_custkey": [1] * len(rows),
            "o_totalprice": [r[0] / 100.0 for r in rows],
            "o_orderdate": [
                pd.Timestamp("1990-01-01") + pd.Timedelta(days=r[1]) for r in rows
            ],
            "o_orderstatus": ["F" if r[2] else "O" for r in rows],
        }
    )
    cust.to_parquet(f"{tmp_path}/customer.parquet", index=False)
    orders.to_parquet(f"{tmp_path}/orders.parquet", index=False)

    got = qs["eval_auc_delong_paired"].fn(spark, str(tmp_path)).collect()
    assert len(got) == 1
    g = got[0]
    auc_a, auc_b, var_diff = _float_delong(rows)
    se = math.sqrt(max(var_diff, 0.0))

    # AUC is an exact rational in the key; only the output floor quantizes
    assert abs(g["auc_a"] - auc_a) <= 5.1e-7
    assert abs(g["auc_b"] - auc_b) <= 5.1e-7
    # the 1e-6 placement grid perturbs each V by < 1e-6; the variance of a
    # [0,1]-bounded sample moves by O(2 * grid) plus the output floor
    assert abs(g["se_diff"] - se) <= 5e-6
    if se > 1e-4:
        z = (auc_a - auc_b) / se
        assert abs(g["z_score"] - z) <= max(2e-3, abs(z) * 1e-2)
