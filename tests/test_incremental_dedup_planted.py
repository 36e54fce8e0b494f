"""Planted-verdict test for etl_incremental_dedup (round 9).

The fixture corpus exercises the three verdicts only at sf0.1 (6 exact /
115 near cross-split at the 50% split); this test PLANTS one unambiguous
document per verdict class into a tiny staged corpus so each classification
path is pinned at test time regardless of what the driver's generator
produces:

- base doc 1 / incoming doc 91: byte-identical text  -> exact_dup(1)
- base doc 2 / incoming doc 92: last token changed out of 30 — only the
  final 5-shingle differs, so Jaccard = 25/27 ~= 0.926 >= 0.8
  -> near_dup
- incoming doc 93: disjoint vocabulary -> novel
- incoming doc 94: identical to ANOTHER INCOMING doc 93's vocabulary but
  shares nothing with base -> novel (increment-vs-increment pairs must NOT
  be formed — the asymmetry contract)
- base doc 3 == base doc 4 (intra-base duplicates must NOT appear at all)
"""

from __future__ import annotations

import os
import shutil
import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SRC = "/root/testdata/sf0.001"
DST = "/tmp/swallow_spark_incdedup/sf"

BODY = " ".join(f"tok{i}" for i in range(30))
NEAR = " ".join(("CHANGED" if i == 29 else f"tok{i}") for i in range(30))

# doc_ids: base <= floor(94 * 0.5) = 47, incoming > 47
TEXTS = {
    1: BODY,
    2: BODY,            # intra-base duplicate of 1 — must not surface
    3: "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10",
    91: BODY,           # exact dup of base 1 (lowest match wins -> 1)
    92: NEAR,           # near dup of base 1/2 (last token changed)
    93: "zz1 zz2 zz3 zz4 zz5 zz6 zz7 zz8",   # novel
    94: "zz1 zz2 zz3 zz4 zz5 zz6 zz7 zz8",   # novel; dup of 93 only
}


@pytest.fixture(scope="module")
def staged():
    os.makedirs(DST, exist_ok=True)
    t = pq.read_table(f"{SRC}/documents.parquet")
    ids = sorted(TEXTS)
    doc = pa.table(
        {
            "doc_id": pa.array(ids, type=t.schema.field("doc_id").type),
            "text": pa.array([TEXTS[i] for i in ids], type=pa.string()),
            "lang": pa.array(["xx"] * len(ids), type=t.schema.field("lang").type),
            "source": pa.array(
                ["synthetic"] * len(ids), type=t.schema.field("source").type
            ),
            "n_chars": pa.array(
                [len(TEXTS[i]) for i in ids], type=t.schema.field("n_chars").type
            ),
        }
    )
    pq.write_table(doc, f"{DST}/documents.parquet")
    for tbl in (
        "region nation customer supplier part orders lineitem events embeddings"
    ).split():
        shutil.copyfile(f"{SRC}/{tbl}.parquet", f"{DST}/{tbl}.parquet")
    yield DST
    shutil.rmtree(os.path.dirname(DST), ignore_errors=True)


def test_planted_verdicts(spark, staged):
    from swallow_spark.registry import all_queries

    rows = {
        r.doc_id: r
        for r in all_queries()["etl_incremental_dedup"].fn(spark, staged).collect()
    }
    assert set(rows) == {91, 92, 93, 94}, "exactly the incoming docs classified"
    assert rows[91].verdict == "exact_dup"
    assert rows[91].matched_doc == 1, "lowest matching base doc wins"
    assert rows[91].jaccard is None
    assert rows[92].verdict == "near_dup"
    assert rows[92].matched_doc in (1, 2)
    # 26 shingles per side; only the final shingle contains the changed
    # token -> inter = 25, union = 27, jaccard = 25/27 rounded to 0.9259
    assert rows[92].jaccard == pytest.approx(0.9259, abs=1e-4)
    assert rows[93].verdict == "novel" and rows[93].matched_doc is None
    assert rows[94].verdict == "novel", (
        "increment-vs-increment pair must not be formed"
    )


def test_oracle_agrees_on_planted(spark, staged):
    import duckdb

    from swallow_spark import TABLES
    from swallow_spark.registry import all_queries

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from oracle_diff import canon_pdf, digest

    q = all_queries()["etl_incremental_dedup"]
    s_pdf = canon_pdf(q.fn(spark, staged).toPandas())
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{staged}/{t}.parquet')"
            )
        d_pdf = canon_pdf(con.sql(q.oracle).fetchdf())
    finally:
        con.close()
    assert digest(s_pdf) == digest(d_pdf)
