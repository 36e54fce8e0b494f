"""Portable-ANN recall vs the exhaustive twin (rounds 8-9, VERDICT r7 item 6
/ r8 item 3). The keys themselves are fully oracle-checked (every bucket /
cell, probe, and rerank decision pinned by DuckDB); this asserts the
APPROXIMATION QUALITY — that the bucketed pipelines actually find the true
neighbors the exhaustive sim_cosine_topk returns. Measured at add time:
LSH 0.92 (sf0.01) / 0.96 (sf0.1); IVF 0.60 (sf0.01, out-of-fit corpus with
near-random vectors — honest IVF behavior when the coarse quantizer was fit
elsewhere) / 0.98 (sf0.1, the fit corpus).
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


# (key, exhaustive twin it approximates, sf_dir, recall floor). The IVFPQ
# twin is the EXHAUSTIVE-ADC key so the assertion isolates routing loss —
# PQ quantization loss is vec_pq_adc_topk's own documented recall story.
@pytest.mark.parametrize("key,twin,sf_dir,floor", [
    ("vec_ann_lsh_portable", "sim_cosine_topk", "/root/testdata/sf0.01", 0.80),
    ("vec_ann_lsh_portable", "sim_cosine_topk", "/root/testdata/sf0.1", 0.85),
    ("vec_ann_ivf_portable", "sim_cosine_topk", "/root/testdata/sf0.01", 0.50),
    ("vec_ann_ivf_portable", "sim_cosine_topk", "/root/testdata/sf0.1", 0.90),
    ("vec_ann_ivfpq_portable", "vec_pq_adc_topk", "/root/testdata/sf0.01", 0.50),
    ("vec_ann_ivfpq_portable", "vec_pq_adc_topk", "/root/testdata/sf0.1", 0.75),
])
def test_portable_ann_recall(spark, key, twin, sf_dir, floor):
    from swallow_spark.registry import all_queries

    qs = all_queries()
    exact = {
        (r.probe_id, r.neighbor_id)
        for r in qs[twin].fn(spark, sf_dir).collect()
    }
    ann = {
        (r.probe_id, r.neighbor_id)
        for r in qs[key].fn(spark, sf_dir).collect()
    }
    assert exact, "exhaustive twin returned nothing"
    recall = len(exact & ann) / len(exact)
    assert recall >= floor, f"{key} recall {recall:.3f} under {floor} at {sf_dir}"


# IVFPQ vs exact L2 ground truth (computed in-test, same integer units).
# Near-random fixture vectors are PQ's hardest case (distance concentration);
# the flat-ADC key's own documented exhaustive recall is 0.4-0.6, and IVF
# routing multiplies that. Measured at add time: flat 0.34/0.42, residual
# 0.36/0.44 (sf0.01/sf0.1) — residual >= flat at both, the structural win
# residual coding exists for.
@pytest.mark.parametrize("key,sf_dir,floor", [
    ("vec_ann_ivfpq_portable", "/root/testdata/sf0.01", 0.25),
    ("vec_ann_ivfpq_portable", "/root/testdata/sf0.1", 0.30),
    ("vec_ann_ivfpq_residual", "/root/testdata/sf0.01", 0.25),
    ("vec_ann_ivfpq_residual", "/root/testdata/sf0.1", 0.30),
])
def test_ivfpq_recall_vs_exact_l2(spark, key, sf_dir, floor):
    import numpy as np
    import pyarrow.parquet as pq

    from swallow_spark.registry import all_queries

    t = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
    t = t[t["embedding"].map(lambda v: v is not None and len(v) == 64)]
    q = np.floor(
        np.stack([np.asarray(v, float) for v in t["embedding"]]) * 1e4 + 0.5
    ).astype(np.int64)
    ids = t["vec_id"].to_numpy()
    truth = set()
    for pi in np.where(ids < 10)[0]:
        d2 = ((q - q[pi]) ** 2).sum(1)
        d2[pi] = 2**62
        order = np.lexsort((ids, d2))[:5]
        truth |= {(int(ids[pi]), int(ids[j])) for j in order}
    assert truth
    got = {
        (r.probe_id, r.neighbor_id)
        for r in all_queries()[key].fn(spark, sf_dir).collect()
    }
    recall = len(truth & got) / len(truth)
    assert recall >= floor, f"{key} recall {recall:.3f} under {floor} at {sf_dir}"
