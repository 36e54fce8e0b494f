"""Linear-algebra operator checks: vec_gram_matrix against a dense numpy
computation (exact int64 equality) and vec_pca_project against a dense
numpy PCA reference (tolerance + invariants) — the rows-only key's
substitute for a DuckDB oracle, per §2.0 rule 6."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

from swallow_spark.queries.vectors_text_extra import _VEC_DIM, _VEC_UNITS
from swallow_spark.registry import all_queries
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def emb_matrix():
    t = pq.read_table(f"{SF_SMOKE}/embeddings.parquet").to_pandas()
    t = t[t["embedding"].map(lambda v: v is not None and len(v) == _VEC_DIM)]
    x = np.stack([np.asarray(v, dtype=np.float64) for v in t["embedding"]])
    q = np.floor(x * _VEC_UNITS + 0.5).astype(np.int64)
    return t, q


def test_gram_matches_dense_numpy(spark, emb_matrix):
    _, q = emb_matrix
    want = q.T @ q
    rows = all_queries()["vec_gram_matrix"].fn(spark, SF_SMOKE).collect()
    assert len(rows) == _VEC_DIM * (_VEC_DIM + 1) // 2
    for r in rows:
        assert r["g"] == want[r["i"], r["j"]], (r["i"], r["j"])


def test_pca_matches_frozen_model_reference(spark, emb_matrix):
    """vec_pca_project == the frozen-basis projection computed densely in
    numpy with the same exact-integer arithmetic, bit-identical (the key is
    a persisted-model projection since VERDICT r5 item 4; the model-vs-live
    eigh agreement is pinned separately in test_pca_frozen.py)."""
    from swallow_spark.queries.pca_frozen import PCA_C1, PCA_C2, PCA_OFF1, PCA_OFF2

    t, q = emb_matrix
    C = np.stack([np.asarray(PCA_C1, dtype=np.int64), np.asarray(PCA_C2, dtype=np.int64)], axis=1)
    dots = q @ C  # exact int64
    want1 = np.floor((dots[:, 0] - PCA_OFF1).astype(np.float64) / 1e9 + 0.5) / 1e6
    want2 = np.floor((dots[:, 1] - PCA_OFF2).astype(np.float64) / 1e9 + 0.5) / 1e6

    got = (
        all_queries()["vec_pca_project"]
        .fn(spark, SF_SMOKE)
        .toPandas()
        .set_index("vec_id")
        .loc[t["vec_id"].to_numpy()]
    )
    np.testing.assert_array_equal(got["pc1"].to_numpy(), want1)
    np.testing.assert_array_equal(got["pc2"].to_numpy(), want2)
    # Basis columns are ~unit-norm in 1e-9 units and near-orthogonal, so the
    # projection preserves scale: coordinate spread stays within the raw range.
    norms = np.sqrt((C.astype(np.float64) ** 2).sum(axis=0)) / 1e9
    np.testing.assert_allclose(norms, 1.0, atol=1e-6)
    assert abs(float(C[:, 0] @ C[:, 1]) / 1e18) < 1e-6


def test_random_projection_jl_distortion(spark, emb_matrix):
    """vec_random_projection quality invariant: the ±1 sign projection must
    (a) reproduce the dense numpy projection EXACTLY (int64 equality — the
    oracle pins this cross-engine, this pins it vs a reference
    implementation), and (b) approximately preserve pairwise squared
    distances after the standard 1/k scaling: median distortion of 200
    deterministic pairs within [0.5, 2.0] — JL with k=8 is coarse, the
    invariant is 'usable for candidate pruning', not exactness."""
    from swallow_spark.queries.vectors_text_extra import _RP_D, _RP_K, _rp_signs

    t, _ = emb_matrix
    x = np.stack([np.asarray(v, dtype=np.float64) for v in t["embedding"]])
    q = np.floor(x * 1e6 + 0.5).astype(np.int64)
    s_t = _rp_signs().T
    want = q @ s_t  # exact int64 reference

    rows = (
        all_queries()["vec_random_projection"]
        .fn(spark, SF_SMOKE)
        .orderBy("vec_id")
        .collect()
    )
    ids = list(t["vec_id"])
    order = np.argsort(ids)
    got = np.array([[r[f"p{j}"] for j in range(_RP_K)] for r in rows], dtype=np.int64)
    assert got.shape == want[order].shape
    assert (got == want[order]).all()

    # JL distortion on deterministic pairs (i, i + n//2)
    n = q.shape[0]
    ratios = []
    for i in range(min(200, n // 2)):
        a, b = i, i + n // 2
        d_orig = float(((q[a] - q[b]) ** 2).sum())
        d_proj = float(((want[a] - want[b]) ** 2).sum()) / _RP_K
        if d_orig > 0:
            ratios.append(d_proj / d_orig)
    ratios.sort()
    med = ratios[len(ratios) // 2]
    assert 0.5 <= med <= 2.0, med
