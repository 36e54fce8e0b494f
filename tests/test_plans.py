"""Physical-plan regression tests (SURVEY.md §4.2): the scale-relevant plan
shapes asserted in BENCH.md must not silently regress."""

from __future__ import annotations

import contextlib
import io

import pytest

from swallow_spark.registry import all_queries

SF = "/root/testdata/sf0.001"


def plan_of(spark, key: str) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        all_queries()[key].fn(spark, SF).explain("formatted")
    return buf.getvalue()


@pytest.mark.parametrize(
    "key,required",
    [
        ("join_multiway_star", "BroadcastHashJoin"),  # dims never shuffle the fact
        ("join_broadcast", "BroadcastHashJoin"),
        ("filter_simple", "GreaterThan(l_quantity,30.0)"),  # parquet pushdown
        ("scan_projected", "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
        ("limit_topn", "TakeOrderedAndProject"),  # no global sort for top-n
        ("join_left_semi", "LeftSemi"),
        ("join_left_anti", "LeftAnti"),
        ("win_row_number_topk", "WindowGroupLimit"),  # rank filter pushed into sort
    ],
)
def test_plan_shape(spark, key, required):
    assert required in plan_of(spark, key)


def test_flagship_partial_aggregate(spark):
    """Integer-cent sums must partial-aggregate BEFORE the exchange
    (map-side combine) — the reproducibility + shuffle-width guarantee."""
    p = plan_of(spark, "agg_pricing_summary")
    agg_positions = [i for i in range(len(p)) if p.startswith("HashAggregate", i)]
    assert len(agg_positions) >= 2
    exchange = p.find("Exchange")
    assert exchange != -1
    # at least one HashAggregate below (after) the Exchange in tree order and
    # one above it
    assert min(agg_positions) < exchange < max(agg_positions)


def test_no_cartesian_in_interval_join(spark):
    """The interval self-join must keep user_id as an equi key — a
    NestedLoop/Cartesian here explodes at scale."""
    p = plan_of(spark, "join_interval")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
