"""sim_pairs_threshold mode equivalence (round 8, VERDICT r7 item 3).

The query now picks one of three physical plans — uniform short-circuit
(driver-side pyarrow histogram, no banding), locally-built nb broadcast
(histogram shows skew), or distributed count+broadcast (table above the
probe size gate). All three must produce the identical row set; the plan
shapes themselves are asserted in test_plans.py.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(
        (r["v1"], r["v2"], r["label"], r["cosine"]) for r in df.collect()
    )


def test_three_modes_identical(spark, monkeypatch):
    import swallow_spark.queries.llm_similarity as sim
    from swallow_spark.registry import all_queries

    fn = all_queries()["sim_pairs_threshold"].fn

    uniform = _rows(fn(spark, SF))
    assert len(uniform) > 0, "fixture must produce at least one pair"

    monkeypatch.setattr(sim, "_BAND_TARGET", 4)
    local_banded = _rows(fn(spark, SF))

    monkeypatch.setattr(sim, "_PROBE_MAX_BYTES", 0)
    distributed = _rows(fn(spark, SF))

    assert uniform == local_banded == distributed
