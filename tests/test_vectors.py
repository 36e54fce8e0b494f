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


def test_pca_matches_dense_numpy(spark, emb_matrix):
    t, q = emb_matrix
    qf = q.astype(np.float64)
    mean = qf.mean(axis=0)
    c = qf - mean
    cov = c.T @ c / len(qf)
    evals, evecs = np.linalg.eigh(cov)
    comps = evecs[:, ::-1][:, :2].copy()
    for j in range(2):
        k = int(np.argmax(np.abs(comps[:, j])))
        if comps[k, j] < 0:
            comps[:, j] = -comps[:, j]
    want = c @ comps / _VEC_UNITS  # original coordinate scale

    got = (
        all_queries()["vec_pca_project"]
        .fn(spark, SF_SMOKE)
        .toPandas()
        .set_index("vec_id")
        .loc[t["vec_id"].to_numpy()]
    )
    np.testing.assert_allclose(got["pc1"].to_numpy(), want[:, 0], atol=2e-5)
    np.testing.assert_allclose(got["pc2"].to_numpy(), want[:, 1], atol=2e-5)
    # PC1 captures at least as much variance as PC2, both positive
    assert evals[-1] >= evals[-2] > 0
    # projections are centered: column means ~ 0
    assert abs(got["pc1"].mean()) < 1e-3
    assert abs(got["pc2"].mean()) < 1e-3
