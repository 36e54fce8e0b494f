"""vec_ann_ivf_batch_rescore's conditional hot-cell salting, driven for
real: the sf fixtures are near-uniform (no cell over the 10% threshold, so
ns = 1 everywhere there), so this suite plants a corpus where ~50% of
vectors cluster around frozen IVF centroid 0, asserts the salt decision
actually fires (ns = _BR_SALT on the hot cell), and then proves the salted
plan is result-invariant by hash-comparing against the UNSALTED DuckDB
oracle on the same planted corpus."""

from __future__ import annotations

import os
import shutil
import sys
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

SRC = "/root/testdata/sf0.001"
DST = "/tmp/swallow_spark_ivfsalt/sf0.001"

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

N_VECS = 400
HOT_FRAC = 0.5


@pytest.fixture(scope="module")
def salt_dir():
    from swallow_spark.queries.ivf_frozen import IVF_CENTROIDS

    os.makedirs(DST, exist_ok=True)
    rng = np.random.default_rng(23)
    c0 = np.asarray(IVF_CENTROIDS[0], dtype=np.float64) / 10_000.0
    vecs = rng.standard_normal((N_VECS, 64))
    n_hot = int(N_VECS * HOT_FRAC)
    # every other vector is a cluster member — probes (vec_id % 20 == 0)
    # land in the hot cell too
    vecs[::2][: n_hot] = c0[None, :] + 0.05 * rng.standard_normal((n_hot, 64))
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(1, N_VECS + 1, dtype=np.int64),
            "embedding": [v.astype(np.float32) for v in vecs],
            "label": rng.integers(0, 5, N_VECS).astype(np.int32),
        }
    )
    for t in TABLES:
        if t == "embeddings":
            import pyarrow as pa
            import pyarrow.parquet as pq

            src_type = pq.read_schema(f"{SRC}/embeddings.parquet").field(
                "embedding"
            ).type
            tbl = pa.table(
                {
                    "vec_id": pa.array(pdf["vec_id"], type=pa.int64()),
                    "embedding": pa.array(
                        [list(map(float, v)) for v in pdf["embedding"]],
                        type=src_type,
                    ),
                    "label": pa.array(
                        pdf["label"],
                        type=pq.read_schema(f"{SRC}/embeddings.parquet").field(
                            "label"
                        ).type,
                    ),
                }
            )
            pq.write_table(tbl, f"{DST}/{t}.parquet")
        else:
            shutil.copyfile(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")
    yield DST
    shutil.rmtree(os.path.dirname(DST), ignore_errors=True)


def test_salt_decision_fires(spark, salt_dir):
    """On the planted corpus the hot cell must exceed the 10% threshold
    and get ns = _BR_SALT (and at least one cool cell must stay ns = 1),
    so the salted join branch genuinely executes."""
    from swallow_spark.io import load
    from swallow_spark.queries.vectors_text_extra import _BR_SALT, _ivf_assign

    e = load(spark, salt_dir, "embeddings")
    corpus = _ivf_assign(e, 4).filter(F.col("crk") == 0)
    pops = {r["cell"]: r["count"] for r in corpus.groupBy("cell").count().collect()}
    tot = sum(pops.values())
    hot = {c: n for c, n in pops.items() if n * 10 > tot}
    assert 0 in hot, f"planted cell 0 not hot: {pops}"
    assert len(hot) < len(pops), "every cell hot — control group lost"
    assert _BR_SALT > 1


def test_salted_output_matches_unsalted_oracle(spark, salt_dir):
    """Driver-mirror hash equality of the SALTED Spark plan vs the plain
    unsalted DuckDB oracle on the hot corpus — the result-invariance
    proof for the salt algebra under a fired threshold."""
    from oracle_diff import canon_pdf, digest

    from swallow_spark.registry import all_queries

    q = all_queries()["vec_ann_ivf_batch_rescore"]
    s_raw = q.fn(spark, salt_dir).toPandas()
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{salt_dir}/{t}.parquet')"
            )
        d_raw = con.sql(q.oracle).fetchdf()
    finally:
        con.close()
    s_pdf, d_pdf = canon_pdf(s_raw.copy()), canon_pdf(d_raw.copy())
    assert list(s_pdf.columns) == list(d_pdf.columns)
    assert len(s_pdf) == len(d_pdf) > 0
    assert digest(s_pdf) == digest(d_pdf)
    # the probe batch is real: many probes, each with <= topk rows
    assert s_raw["probe_id"].nunique() >= 10
