"""Testdata physical-encoding drift hardening.

The driver regenerates /root/testdata between rounds and the parquet
encodings change (r1: events.ts TIMESTAMP(NANOS); r2: TIMESTAMP(MICROS,
ntz) — the r2 driver run lost every events-based key to that drift).
io.load must normalize any plausible temporal encoding to the declared
schema, so results are identical whichever generation is on disk.

This test materializes a mutated copy of sf0.001 (dates as DATE32, events
ts as TIMESTAMP(NANOS)) and asserts representative queries return exactly
the same rows as against the pristine directory.
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SRC = "/root/testdata/sf0.001"
DST = "/tmp/swallow_spark_drift/sf0.001"

# representative keys touching each mutated table
KEYS = [
    "q4_order_priority",  # orders.o_orderdate
    "agg_pricing_summary",  # lineitem.l_shipdate
    "cohort_retention",  # events.ts
    "win_range_time",  # events.ts in a range window
]


@pytest.fixture(scope="module")
def drift_dir():
    os.makedirs(DST, exist_ok=True)
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        src = f"{SRC}/{name}.parquet"
        dst = f"{DST}/{name}.parquet"
        t = pq.read_table(src)
        if name == "orders":
            i = t.schema.get_field_index("o_orderdate")
            t = t.set_column(
                i, "o_orderdate", t.column(i).cast(pa.date32())
            )
            pq.write_table(t, dst)
        elif name == "lineitem":
            i = t.schema.get_field_index("l_shipdate")
            t = t.set_column(i, "l_shipdate", t.column(i).cast(pa.date32()))
            pq.write_table(t, dst)
        elif name == "events":
            i = t.schema.get_field_index("ts")
            t = t.set_column(i, "ts", t.column(i).cast(pa.timestamp("ns")))
            # version 2.6 writes a genuine TIMESTAMP(NANOS) physical type
            pq.write_table(t, dst, version="2.6")
        else:
            shutil.copyfile(src, dst)
    yield DST
    shutil.rmtree(os.path.dirname(DST), ignore_errors=True)


@pytest.mark.parametrize("key", KEYS)
def test_drifted_encoding_same_result(spark, drift_dir, key):
    from swallow_spark.registry import all_queries

    q = all_queries()[key]
    want = sorted(map(tuple, q.fn(spark, SRC).collect()))
    got = sorted(map(tuple, q.fn(spark, drift_dir).collect()))
    assert got == want, f"{key}: drifted encoding changed the result"
