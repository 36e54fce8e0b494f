"""Shared co-purchase edge-view cache invalidation (round 8).

_edges() caches its materialized result per (application id, lineitem file
path + mtime + size). A stale hit would poison every graph key at once, so
this suite pins the invalidation contract: same file → same frame (cache
hit), regenerated file → fresh results that reflect the new data.
"""

from __future__ import annotations

import os
import shutil
import sys
import time
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SRC = "/root/testdata/sf0.001"
DST = "/tmp/swallow_spark_edgecache/sf0.001"


@pytest.fixture()
def mut_dir():
    os.makedirs(DST, exist_ok=True)
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        shutil.copyfile(f"{SRC}/{name}.parquet", f"{DST}/{name}.parquet")
    yield DST
    shutil.rmtree(os.path.dirname(DST), ignore_errors=True)


def test_cache_hits_same_file_and_invalidates_on_regen(spark, mut_dir):
    from swallow_spark.queries import graph

    e1 = graph._edges(spark, mut_dir)
    e2 = graph._edges(spark, mut_dir)
    assert e1 is e2, "same file version must return the cached frame"
    n_before = e1.count()

    # regenerate lineitem with HALF the orders — the edge set must shrink
    time.sleep(0.05)  # ensure a distinct mtime even on coarse filesystems
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (SELECT * FROM read_parquet('{SRC}/lineitem.parquet')
              WHERE l_orderkey % 2 = 0)
        TO '{mut_dir}/lineitem.parquet' (FORMAT PARQUET)
        """
    )
    con.close()

    e3 = graph._edges(spark, mut_dir)
    assert e3 is not e1, "regenerated file must invalidate the cache"
    n_after = e3.count()
    assert 0 < n_after < n_before

    # DuckDB ground truth on the regenerated file
    con = duckdb.connect()
    truth = con.execute(
        f"""
        SELECT COUNT(*) FROM (
          SELECT DISTINCT a.l_partkey, b.l_partkey
          FROM read_parquet('{mut_dir}/lineitem.parquet') a
          JOIN read_parquet('{mut_dir}/lineitem.parquet') b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)
        """
    ).fetchone()[0]
    con.close()
    assert n_after == truth
