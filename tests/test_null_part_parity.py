"""NULL-measure drift probe for the supplier/part tables (round 7).

Round 6's null-order probe on orders-readers found 10 real cross-engine
divergences; this applies the same systematic treatment to the remaining
unprobed reader families (VERDICT r6 item 6). supplier.s_acctbal,
part.p_retailprice and part.p_size plausibly arrive with NULLs in a future
testdata generation — the divergence classes are aggregate NULL-skipping
vs COUNT(*), conform-cents of NULL, NULLS-FIRST-asc (Spark) vs NULLS-LAST
(DuckDB) rank/sort drift, and NULL arithmetic reaching a filter. Every
supplier- or part-reading oracle key must hash-match its oracle with the
measures nulled.
"""

from __future__ import annotations

import os
import re
import shutil

import duckdb
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

SRC = "/root/testdata/sf0.001"
DST = "/tmp/swallow_spark_nullsp/sf0.001"


def _null_every(table: pa.Table, col: str, step: int, offset: int = 0) -> pa.Table:
    n = len(table)
    mask = pa.array([(i + offset) % step == 0 for i in range(n)])
    typ = table.schema.field(col).type
    nulled = pc.if_else(mask, pa.nulls(n, typ), table[col].combine_chunks())
    return table.set_column(table.schema.get_field_index(col), col, nulled)


@pytest.fixture(scope="module")
def null_dir():
    os.makedirs(DST, exist_ok=True)
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        src = f"{SRC}/{name}.parquet"
        dst = f"{DST}/{name}.parquet"
        if name == "supplier":
            t = pq.read_table(src)
            t = _null_every(t, "s_acctbal", 7)
            pq.write_table(t, dst)
        elif name == "part":
            t = pq.read_table(src)
            t = _null_every(t, "p_retailprice", 5)
            t = _null_every(t, "p_size", 11, offset=3)
            pq.write_table(t, dst)
        else:
            shutil.copyfile(src, dst)
    yield DST
    shutil.rmtree(os.path.dirname(DST), ignore_errors=True)


def _probed_keys():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from swallow_spark.registry import all_queries

    return sorted(
        k
        for k, q in all_queries().items()
        if q.oracle and re.search(r"\b(supplier|part)\b", q.oracle)
    )


@pytest.fixture(scope="module")
def null_duck(null_dir):
    from swallow_spark import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{null_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("key", _probed_keys())
def test_supplier_part_keys_survive_null_measures(spark, null_dir, null_duck, key):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from oracle_diff import canon_pdf, digest

    from swallow_spark.registry import all_queries

    q = all_queries()[key]
    s_pdf = canon_pdf(q.fn(spark, null_dir).toPandas())
    d_pdf = canon_pdf(null_duck.sql(q.oracle).fetchdf())
    assert list(s_pdf.columns) == list(d_pdf.columns)
    assert len(s_pdf) == len(d_pdf)
    assert digest(s_pdf) == digest(d_pdf)

# Ritual-only suite (VERDICT r11 item 1): exhaustive sweep / mutated-data
# parity / hypothesis battery / timed gate — skipped by a plain pytest run
# so the driver-visible suite finishes; SWALLOW_FULL_TESTS=1 runs it.
pytestmark = pytest.mark.slow
