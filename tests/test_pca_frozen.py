"""Freshness pin for the frozen PCA model (VERDICT r5 item 4).

Re-derives the top-2 principal axes from the LIVE sf0.1 embedding corpus
with exactly the math tools/pca_freeze.py ran (exact-int64 augmented Gram
→ biased covariance → numpy eigh → sign-pinning) and asserts the frozen
constants in pca_frozen.py still quantize to the same int64 literals.

If the driver regenerates embeddings with different content, the corpus
fingerprint (valid-row count + Gram corner + G[0,0]) won't match and this
test SKIPS with instructions instead of failing — the frozen model stays
self-consistent either way (both the Spark side and the DuckDB oracle
embed the same literals), it just stops being the live corpus's own fit
until tools/pca_freeze.py is re-run.
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

from swallow_spark.queries import pca_frozen as M
from swallow_spark.queries.vectors_text_extra import _VEC_DIM, _VEC_UNITS

SF01 = "/root/testdata/sf0.1"
COMP_UNITS = 1_000_000_000


def test_frozen_basis_matches_live_eigh():
    emb = pq.read_table(f"{SF01}/embeddings.parquet", columns=["embedding"])
    vecs = [
        np.asarray(v, dtype=np.float64)
        for v in emb.column("embedding").to_pylist()
        if v is not None and len(v) == _VEC_DIM
    ]
    q = np.floor(np.stack(vecs) * _VEC_UNITS + 0.5).astype(np.int64)
    aug = np.hstack([q, np.full((q.shape[0], 1), _VEC_UNITS, dtype=np.int64)])
    G = (aug.T @ aug).astype(np.float64)
    d = _VEC_DIM
    fingerprint = (len(vecs), int(G[d, d]), int(G[0, 0]))
    frozen_fp = (M.PCA_FIT_N, M.PCA_FIT_GRAM_CORNER, M.PCA_FIT_GRAM_00)
    if fingerprint != frozen_fp:
        pytest.skip(
            f"sf0.1 embeddings regenerated (live fingerprint {fingerprint} != "
            f"frozen {frozen_fp}) — rerun tools/pca_freeze.py to refresh "
            "pca_frozen.py; the key stays hash-consistent meanwhile."
        )

    n = G[d, d] / (_VEC_UNITS * _VEC_UNITS)
    s = G[:d, d] / _VEC_UNITS
    mean_q = s / n
    cov = (G[:d, :d] - np.outer(s, s) / n) / n
    _, evecs = np.linalg.eigh(cov)
    comps = evecs[:, ::-1][:, :2].copy()
    for c in range(2):
        k = int(np.argmax(np.abs(comps[:, c])))
        if comps[k, c] < 0:
            comps[:, c] = -comps[:, c]
    c_int = np.floor(comps * COMP_UNITS + 0.5).astype(np.int64)
    np.testing.assert_array_equal(c_int[:, 0], np.asarray(M.PCA_C1, dtype=np.int64))
    np.testing.assert_array_equal(c_int[:, 1], np.asarray(M.PCA_C2, dtype=np.int64))
    off = [int(np.floor(mean_q @ c_int[:, c].astype(np.float64) + 0.5)) for c in range(2)]
    assert off == [M.PCA_OFF1, M.PCA_OFF2]
