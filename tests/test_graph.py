"""graph_pagerank is oracle-checked (exact int64 fixed-point ranks), but we
additionally validate the MATH against a dense numpy float reference on the
same edges at sf0.001 — the fixed-point truncation must stay within 1e-5 of
the real-number PageRank, or the formulation drifted."""

from __future__ import annotations

import numpy as np
import pytest

from swallow_spark.queries.graph import _PR_R0, _edges, graph_pagerank

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
