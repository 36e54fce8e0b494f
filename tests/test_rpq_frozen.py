"""Freshness pin for the frozen RESIDUAL PQ codebooks: re-runs
tools/rpq_freeze.py's deterministic pipeline (IVF home-cell assignment from
ivf_frozen.py, then Lloyd over the residuals) on the LIVE sf0.1 corpus and
asserts the frozen literals still match (skipping with the corpus
fingerprint if the driver regenerated embeddings — vec_ann_ivfpq_residual
stays hash-consistent either way, both engines embed the same books)."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

from swallow_spark.queries import rpq_frozen as M
from swallow_spark.queries.ivf_frozen import IVF_CENTROIDS

SF01 = "/root/testdata/sf0.1"


def test_frozen_residual_books_match_live_fit():
    tbl = pq.read_table(
        f"{SF01}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).to_pandas()
    tbl = tbl[tbl["embedding"].map(lambda v: v is not None and len(v) == 64)]
    tbl = tbl.sort_values("vec_id")
    x = np.stack([np.asarray(v, dtype=np.float64) for v in tbl["embedding"]])
    q = np.floor(x * 10_000 + 0.5).astype(np.int64)
    fp = (len(q), int(q.sum()), int((q[0] * q[0]).sum()))
    frozen_fp = (M.RPQ_FIT_N, M.RPQ_FIT_QSUM, M.RPQ_FIT_Q0SQ)
    if fp != frozen_fp:
        pytest.skip(
            f"sf0.1 embeddings regenerated (live {fp} != frozen {frozen_fp}) — "
            "rerun tools/rpq_freeze.py; the key stays hash-consistent."
        )

    q = q[(q * q).sum(axis=1) > 0]
    IC = np.asarray(IVF_CENTROIDS, dtype=np.int64)
    cell = ((q[:, None, :] - IC[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
    r = q - IC[cell]
    for s in range(16):
        sub = r[:, s * 4 : (s + 1) * 4]
        cent = sub[:64].astype(np.float64).copy()
        for _ in range(10):
            d = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d, axis=1)
            for c in range(64):
                m = assign == c
                if m.any():
                    cent[c] = np.floor(sub[m].mean(axis=0) + 0.5)
        np.testing.assert_array_equal(
            cent.astype(np.int64),
            np.asarray(M.RPQ_BOOKS[s], dtype=np.int64),
            err_msg=f"subspace {s}",
        )
