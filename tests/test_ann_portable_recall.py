"""vec_ann_lsh_portable recall vs the exhaustive twin (round 8, VERDICT r7
item 6). The key itself is fully oracle-checked (every bucket, probe, and
rerank decision pinned by DuckDB); this asserts the APPROXIMATION QUALITY —
that the bucketed pipeline actually finds the true neighbors the exhaustive
sim_cosine_topk returns. Measured at add time: 0.92 (sf0.01), 0.96 (sf0.1).
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


@pytest.mark.parametrize("sf_dir,floor", [
    ("/root/testdata/sf0.01", 0.80),
    ("/root/testdata/sf0.1", 0.85),
])
def test_portable_ann_recall(spark, sf_dir, floor):
    from swallow_spark.registry import all_queries

    qs = all_queries()
    exact = {
        (r.probe_id, r.neighbor_id)
        for r in qs["sim_cosine_topk"].fn(spark, sf_dir).collect()
    }
    ann = {
        (r.probe_id, r.neighbor_id)
        for r in qs["vec_ann_lsh_portable"].fn(spark, sf_dir).collect()
    }
    assert exact, "exhaustive twin returned nothing"
    recall = len(exact & ann) / len(exact)
    assert recall >= floor, f"recall {recall:.3f} under {floor} at {sf_dir}"
