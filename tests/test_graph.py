"""graph_pagerank is oracle-checked (exact int64 fixed-point ranks), but we
additionally validate the MATH against a dense numpy float reference on the
same edges at sf0.001 — the fixed-point truncation must stay within 1e-5 of
the real-number PageRank, or the formulation drifted."""

from __future__ import annotations

import numpy as np
import pytest

from swallow_spark.queries.graph import _PR_R0, _edges, graph_pagerank
from swallow_spark.registry import all_queries

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def pr_rows(spark):
    return {
        r["node"]: r["rank_units"] / _PR_R0
        for r in graph_pagerank(spark, SF).collect()
    }


def _numpy_pagerank(edges: list[tuple[int, int]], iters: int = 5, d: float = 0.85):
    und = edges + [(b, a) for a, b in edges]
    nodes = sorted({n for e in und for n in e})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n)
    for s, _ in und:
        deg[idx[s]] += 1
    rank = np.ones(n)
    for _ in range(iters):
        nxt = np.zeros(n)
        for s, t in und:
            nxt[idx[t]] += rank[idx[s]] / deg[idx[s]]
        rank = (1 - d) + d * nxt
    return {nodes[i]: rank[i] for i in range(n)}


def test_pagerank_matches_numpy_reference(spark, pr_rows):
    edges = [(r["src"], r["dst"]) for r in _edges(spark, SF).collect()]
    ref = _numpy_pagerank(edges)
    assert pr_rows, "pagerank returned no rows"
    for node, got in pr_rows.items():
        assert abs(got - ref[node]) < 1e-5, (node, got, ref[node])


def test_pagerank_top50_is_rank_sorted_and_deterministic(spark, pr_rows):
    again = {
        r["node"]: r["rank_units"] / _PR_R0
        for r in graph_pagerank(spark, SF).collect()
    }
    assert pr_rows == again  # rerun-stable, exact integer units


def test_kcore_matches_pandas_peeling(spark):
    """graph_kcore vs an exact pandas peeling reference at sf0.001, plus
    the defining invariant: every core node's within-core degree >= k."""
    import pandas as pd

    from swallow_spark.queries.graph import _edges

    e = _edges(spark, SF).toPandas()
    und = pd.concat(
        [e, e.rename(columns={"src": "dst", "dst": "src"})[["src", "dst"]]]
    )
    # mirror _kcore_k: floor(median / 2); pandas interpolated median and
    # Spark exact percentile agree on this integer distribution
    k = max(1, int(float(und.groupby("src").size().median())) // 2)
    while True:
        deg = und.groupby("src").size()
        keep = set(deg[deg >= k].index)
        nxt = und[und["src"].isin(keep) & und["dst"].isin(keep)]
        if len(nxt) == len(und):
            break
        und = nxt
    want = und.groupby("src").size().to_dict()

    got = {
        r["node"]: r["core_degree"]
        for r in all_queries()["graph_kcore"].fn(spark, SF).collect()
    }
    assert got == want
    assert got  # the median-degree core must be non-empty
    assert all(d >= k for d in got.values())
