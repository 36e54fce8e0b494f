"""Freshness pin for the frozen IVF centroids: re-runs tools/ivf_freeze.py's
deterministic Lloyd over the LIVE sf0.1 corpus and asserts the frozen
literals still match (skipping with the corpus fingerprint if the driver
regenerated different embedding data — the key stays hash-consistent either
way, both engines embed the same centroids)."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

from swallow_spark.queries import ivf_frozen as M

SF01 = "/root/testdata/sf0.1"


def test_frozen_centroids_match_live_lloyd():
    tbl = pq.read_table(
        f"{SF01}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).to_pandas()
    tbl = tbl[tbl["embedding"].map(lambda v: v is not None and len(v) == 64)]
    tbl = tbl.sort_values("vec_id")
    x = np.stack([np.asarray(v, dtype=np.float64) for v in tbl["embedding"]])
    q = np.floor(x * 10_000 + 0.5).astype(np.int64)
    fp = (len(q), int(q.sum()), int((q[0] * q[0]).sum()))
    frozen_fp = (M.IVF_FIT_N, M.IVF_FIT_QSUM, M.IVF_FIT_Q0SQ)
    if fp != frozen_fp:
        pytest.skip(
            f"sf0.1 embeddings regenerated (live {fp} != frozen {frozen_fp}) — "
            "rerun tools/ivf_freeze.py; vec_ann_ivf_portable stays hash-consistent."
        )

    q = q[(q * q).sum(axis=1) > 0]
    cent = q[:16].astype(np.float64).copy()
    for _ in range(10):
        d = ((q[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = np.argmin(d, axis=1)
        for c in range(16):
            m = assign == c
            if m.any():
                cent[c] = np.floor(q[m].mean(axis=0) + 0.5)
    np.testing.assert_array_equal(
        cent.astype(np.int64), np.asarray(M.IVF_CENTROIDS, dtype=np.int64)
    )
