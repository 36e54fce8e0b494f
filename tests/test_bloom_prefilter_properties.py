"""Property tests for join_bloom_prefilter: the Bloom prefilter must be
INVISIBLE in the result — for any orders/lineitem table the key's output
equals the plain exact join (no false negatives by construction; false
positives removed by the exact join). Three-way agreement: Spark key,
DuckDB oracle, pure-Python reference join. Corners: empty member set
(no qualifying orders -> empty output, exercised against an EMPTY packed
map), a saturated filter (members stuffed until most slots are set -> the
prefilter passes nearly everything and the exact join still corrects it),
and orderkeys colliding into the same bloom slots.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

# A lineitem spec: (orderkey, flag_idx, price_cents); an order spec:
# (orderkey, urgent, recent). Small orderkey domain forces bloom collisions.
_FLAGS = ["A", "N", "R"]
_li = st.tuples(
    st.integers(min_value=1, max_value=30),
    st.integers(min_value=0, max_value=2),
    st.integers(min_value=1, max_value=100000),
)
_ord = st.tuples(
    st.integers(min_value=1, max_value=30),
    st.booleans(),
    st.booleans(),
)
_case = st.tuples(
    st.lists(_ord, min_size=0, max_size=30, unique_by=lambda o: o[0]),
    st.lists(_li, min_size=0, max_size=60),
)


def _materialize(orders, lines, tmpdir):
    odf = pd.DataFrame(
        {
            "o_orderkey": [o[0] for o in orders],
            "o_orderpriority": ["1-URGENT" if o[1] else "5-LOW" for o in orders],
            "o_orderdate": pd.to_datetime(
                ["2000-06-01" if o[2] else "1996-06-01" for o in orders]
            ),
        }
    ).astype(
        {"o_orderkey": "int64", "o_orderpriority": "string"}
    )
    ldf = pd.DataFrame(
        {
            "l_orderkey": [ln[0] for ln in lines],
            "l_returnflag": [_FLAGS[ln[1]] for ln in lines],
            "l_extendedprice": [ln[2] / 100.0 for ln in lines],
        }
    ).astype(
        {"l_orderkey": "int64", "l_returnflag": "string", "l_extendedprice": "float64"}
    )
    # to_parquet (pyarrow) preserves the declared dtypes even for EMPTY
    # frames — a DuckDB pandas scan of an empty string column degrades to
    # INTEGER and breaks the predicate's type
    odf.to_parquet(f"{tmpdir}/orders.parquet", index=False)
    ldf.to_parquet(f"{tmpdir}/lineitem.parquet", index=False)


def _ref(orders, lines):
    members = {o[0] for o in orders if o[1] and o[2]}
    per_flag = {}
    for key, fi, cents in lines:
        if key not in members:
            continue
        flag = _FLAGS[fi]
        n, ks, c = per_flag.get(flag, (0, set(), 0))
        per_flag[flag] = (n + 1, ks | {key}, c + cents)
    return sorted(
        (flag, n, len(ks), c / 100.0) for flag, (n, ks, c) in per_flag.items()
    )


@pytest.fixture(scope="module")
def q():
    from swallow_spark.registry import all_queries

    return all_queries()["join_bloom_prefilter"]


def _check_three_way(spark, q, tmp_path_factory, orders, lines):
    tmpdir = str(tmp_path_factory.mktemp("bloomj"))
    _materialize(orders, lines, tmpdir)
    want = _ref(orders, lines)
    got_spark = sorted(tuple(r) for r in q.fn(spark, tmpdir).collect())
    assert got_spark == want
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{tmpdir}/{t}.parquet')"
        )
    got_duck = sorted(tuple(r) for r in con.sql(q.oracle).fetchall())
    con.close()
    assert got_duck == want
    return want


@settings(max_examples=20, deadline=None)
@given(_case)
def test_bloom_join_equals_exact_join(spark, q, tmp_path_factory, case):
    orders, lines = case
    _check_three_way(spark, q, tmp_path_factory, orders, lines)


def test_empty_member_set(spark, q, tmp_path_factory):
    # no urgent+recent order: the packed map aggregates over ZERO rows and
    # the probe must treat the empty/NULL map as all-misses, not crash
    orders = [(1, True, False), (2, False, True), (3, False, False)]
    lines = [(1, 0, 500), (2, 1, 700), (3, 2, 900), (9, 0, 100)]
    assert _check_three_way(spark, q, tmp_path_factory, orders, lines) == []


def test_saturated_filter_still_exact(spark, q, tmp_path_factory):
    # every order qualifies: the bloom passes ~everything (max saturation
    # this domain can produce) and the exact join still bounds the result
    orders = [(k, True, True) for k in range(1, 31)]
    lines = [(k, k % 3, 100 * k) for k in range(1, 31)] + [
        (k + 100, 0, 1) for k in range(1, 5)  # non-members must vanish
    ]
    want = _check_three_way(spark, q, tmp_path_factory, orders, lines)
    assert sum(n for _, n, _, _ in want) == 30


def test_no_lineitems(spark, q, tmp_path_factory):
    orders = [(1, True, True)]
    assert _check_three_way(spark, q, tmp_path_factory, orders, []) == []


def test_false_positive_rate_stays_useful(spark, q):
    """Correctness tests cannot see filter QUALITY — the exact join hides
    any FP rate, even 100 %. Pin the scale property itself on the real
    fixture: the candidate slice the bloom passes must stay within 2 % of
    the true matching slice (measured 0.9 % FP overhead at sf0.1 —
    SCALE.md), so a silent hash-dispersion regression fails a named test
    instead of shipping a prefilter that prefilters nothing."""
    from pyspark.sql import functions as F

    from swallow_spark.io import load
    from swallow_spark.queries.joins import (
        _BJ_K,
        _BJ_PRED_SPARK,
        _BJ_W,
        _bj_hash,
        _bj_slot_mask,
    )

    sf = "/root/testdata/sf0.001"
    o = load(spark, sf, "orders")
    members = o.filter(F.expr(_BJ_PRED_SPARK)).select("o_orderkey")
    li = load(spark, sf, "lineitem")
    exact = li.join(
        members, li.l_orderkey == members.o_orderkey, "left_semi"
    ).count()

    pairs = _bj_slot_mask("_bh")
    bits = (
        members.select(F.expr(_bj_hash("o_orderkey")).alias("_bh"))
        .select(
            F.explode(
                F.array(
                    *[F.struct(s.alias("slot"), m.alias("mask")) for s, m in pairs]
                )
            ).alias("b")
        )
        .select(F.col("b.slot").alias("slot"), F.col("b.mask").alias("mask"))
    )
    words = dict(
        bits.groupBy("slot").agg(F.expr("bit_or(mask)").alias("word")).collect()
    )
    dense = [words.get(i, 0) for i in range(_BJ_K * _BJ_W)]
    arr = F.expr("array(" + ",".join(f"{w}L" for w in dense) + ")")
    hit = None
    for s, m in _bj_slot_mask("_bh"):
        c = F.element_at(arr, (s + 1).cast("int")).bitwiseAND(m) != 0
        hit = c if hit is None else (hit & c)
    candidates = (
        li.select(F.expr(_bj_hash("l_orderkey")).alias("_bh")).filter(hit).count()
    )
    assert candidates >= exact  # no false negatives, ever
    assert candidates <= exact * 1.02 + 5, (
        f"bloom passes {candidates} candidates for {exact} true matches — "
        f"hash dispersion regressed"
    )

# Ritual-only suite (VERDICT r11 item 1): exhaustive sweep / mutated-data
# parity / hypothesis battery / timed gate — skipped by a plain pytest run
# so the driver-visible suite finishes; SWALLOW_FULL_TESTS=1 runs it.
pytestmark = pytest.mark.slow
