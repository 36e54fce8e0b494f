"""Lineage truncation with a reliable-checkpoint seam (VERDICT r7 item 4).

Iterative operators (pagerank, k-core, BFS, label propagation, connected
components) grow a plan per iteration; each loop materializes intermediates
to truncate lineage. ``localCheckpoint`` is the right local-mode choice
(executor-side block storage, no extra I/O) but is NON-RELIABLE on a real
cluster: blocks live only in executor storage, so losing one executor at
iteration 40 of a 100 TB pagerank kills the whole job rather than recomputing
a partition.

``materialize`` is the single seam every call site uses:

- ``SWALLOW_CHECKPOINT_DIR`` set (or an explicit ``dir`` argument): reliable
  ``DataFrame.checkpoint`` into that directory (HDFS/S3/DBFS path on a real
  cluster) — survives executor loss, costs one write+read of the materialized
  rows per cut. The SparkContext checkpoint dir is set on first use.
- unset (local mode, tests, the bench): ``localCheckpoint`` — identical
  semantics minus fault tolerance, zero disk I/O.

The tradeoff is documented in SCALE.md §checkpointing; both modes are
exercised by tests/test_materialize_seam.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

_ENV = "SWALLOW_CHECKPOINT_DIR"

# applicationId -> base dir last passed to setCheckpointDir. Spark's
# getCheckpointDir returns the UUID subdir (possibly scheme-qualified, e.g.
# "file:/base/<uuid>"), so the base we chose is tracked here rather than
# parsed back out of the resolved path.
_SET_BASE: dict[str, str] = {}


def checkpoint_dir() -> str | None:
    """The configured reliable-checkpoint directory, or None (local mode)."""
    d = os.environ.get(_ENV)
    return d if d else None


def materialize(df: DataFrame, eager: bool = True, ckpt_dir: str | None = None) -> DataFrame:
    """Materialize ``df`` and truncate its lineage.

    Reliable ``checkpoint()`` when a directory is configured (``ckpt_dir``
    argument wins over $SWALLOW_CHECKPOINT_DIR), else ``localCheckpoint()``.
    Both are executor-side — no driver collect either way.
    """
    d = ckpt_dir if ckpt_dir is not None else checkpoint_dir()
    if d:
        sc = df.sparkSession.sparkContext
        # Public accessor (PySpark >= 3.1; Connect-safe — no _jsc/_jvm).
        # setCheckpointDir creates a fresh UUID subdir per call, so re-set
        # only when unset or when an explicit ckpt_dir names a different
        # base than the one last set — the documented "ckpt_dir argument
        # wins" contract actually holds.
        app = sc.applicationId
        if sc.getCheckpointDir() is None or (
            ckpt_dir is not None and _SET_BASE.get(app) != d
        ):
            sc.setCheckpointDir(d)
            _SET_BASE[app] = d
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
