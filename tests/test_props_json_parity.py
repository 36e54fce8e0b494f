"""JSON-content drift probe for the events.props column (round 7).

The round-4 null_event probe nulls the props STRING wholesale; this probe
mutates the JSON *inside* it — the divergence surface between Spark's
get_json_object/from_json and DuckDB's JSON extraction:

- absent key ({}): missing-path extraction must be NULL on both engines;
- explicit JSON null ({"k": null}): null-literal vs absent-key conflation;
- unicode escapes ({"k": .., "s": "caf\\u00e9 \\"q\\" \\\\ \\u203d"}):
  escape decoding, embedded quotes/backslashes, non-ASCII BMP chars;
- malformed JSON ({"k": 87): lenient-NULL vs hard-error parsing.

Every oracle key whose SQL touches props must hash-match with these
variants injected.
"""

from __future__ import annotations

import os
import shutil

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SRC = "/root/testdata/sf0.001"
DST = "/tmp/swallow_spark_propsjson/sf0.001"


def _mutate_props(vals):
    out = []
    for i, v in enumerate(vals):
        if v is None:
            out.append(None)
        elif i % 5 == 0:
            out.append("{}")
        elif i % 7 == 0:
            out.append('{"k": null}')
        elif i % 11 == 0:
            # inner JSON stays syntactically valid: escaped quote, escaped
            # backslash, é (é) and ‽ (interrobang) escapes
            out.append(v[:-1] + ', "s": "caf\\u00e9 \\"q\\" \\\\ \\u203d"}')
        elif i % 13 == 0:
            out.append(v[:-1])  # drop the closing brace: malformed JSON
        else:
            out.append(v)
    return out


@pytest.fixture(scope="module")
def json_dir():
    os.makedirs(DST, exist_ok=True)
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        src = f"{SRC}/{name}.parquet"
        dst = f"{DST}/{name}.parquet"
        if name == "events":
            t = pq.read_table(src)
            props = _mutate_props(t["props"].to_pylist())
            t = t.set_column(
                t.schema.get_field_index("props"),
                "props",
                pa.array(props, pa.string()),
            )
            pq.write_table(t, dst)
        else:
            shutil.copyfile(src, dst)
    yield DST
    shutil.rmtree(os.path.dirname(DST), ignore_errors=True)


def _props_oracle_keys():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from swallow_spark.registry import all_queries

    return sorted(
        k for k, q in all_queries().items() if q.oracle and "props" in q.oracle
    )


@pytest.fixture(scope="module")
def json_duck(json_dir):
    from swallow_spark import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{json_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("key", _props_oracle_keys())
def test_props_keys_survive_json_variants(spark, json_dir, json_duck, key):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from oracle_diff import canon_pdf, digest

    from swallow_spark.registry import all_queries

    q = all_queries()[key]
    s_pdf = canon_pdf(q.fn(spark, json_dir).toPandas())
    d_pdf = canon_pdf(json_duck.sql(q.oracle).fetchdf())
    assert list(s_pdf.columns) == list(d_pdf.columns)
    assert len(s_pdf) == len(d_pdf)
    assert digest(s_pdf) == digest(d_pdf)
