"""Short-document parity hardening (ADVICE round 3).

The driver regenerates testdata between rounds; nothing guarantees every
document stays >= 8 chars. text_fingerprint's oracle zero-pads its single
window for short texts (ascii(substr(..)) past the end is ascii('') = 0),
so the Spark side must zero-pad codepoints too, not emit NULL. This test
materializes a documents table with empty / 1..9-char texts and asserts
the Spark result hash-matches the oracle on it.
"""

from __future__ import annotations

import os
import shutil

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SRC = "/root/testdata/sf0.001"
DST = "/tmp/swallow_spark_shortdoc/sf0.001"

SHORT_TEXTS = ["", "a", "ab", "abcdefg", "abcdefgh", "abcdefghi", "zz zz", "analytics"]


@pytest.fixture(scope="module")
def short_dir():
    os.makedirs(DST, exist_ok=True)
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        src = f"{SRC}/{name}.parquet"
        dst = f"{DST}/{name}.parquet"
        if name == "documents":
            t = pq.read_table(src)
            n = len(SHORT_TEXTS)
            short = pa.table(
                {
                    "doc_id": pa.array(
                        [10_000 + i for i in range(n)], type=t.schema.field("doc_id").type
                    ),
                    "text": pa.array(SHORT_TEXTS, type=pa.string()),
                    "lang": pa.array(["en"] * n, type=t.schema.field("lang").type),
                    "source": pa.array(["synthetic"] * n, type=t.schema.field("source").type),
                    "n_chars": pa.array(
                        [len(s) for s in SHORT_TEXTS], type=t.schema.field("n_chars").type
                    ),
                }
            )
            pq.write_table(pa.concat_tables([t.select(short.column_names), short]), dst)
        else:
            shutil.copyfile(src, dst)
    yield DST
    shutil.rmtree(os.path.dirname(DST), ignore_errors=True)


def _doc_oracle_keys():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from swallow_spark.registry import all_queries

    return sorted(
        k for k, q in all_queries().items() if q.oracle and "documents" in q.oracle
    )


@pytest.fixture(scope="module")
def short_duck(short_dir):
    from swallow_spark import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{short_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("key", _doc_oracle_keys())
def test_doc_keys_survive_short_docs(spark, short_dir, short_duck, key):
    """EVERY documents-reading oracle key must hash-match its oracle when
    the table contains empty/1..9-char texts — the driver regenerates
    testdata between rounds, and a crash here is a hard driver `err`
    (this probe caught text_ngrams and fn_array ANSI index crashes)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from oracle_diff import canon_pdf, digest

    from swallow_spark.registry import all_queries

    q = all_queries()[key]
    s_pdf = canon_pdf(q.fn(spark, short_dir).toPandas())
    d_pdf = canon_pdf(short_duck.sql(q.oracle).fetchdf())
    assert list(s_pdf.columns) == list(d_pdf.columns)
    assert len(s_pdf) == len(d_pdf)
    assert digest(s_pdf) == digest(d_pdf)


def test_text_fingerprint_short_docs_non_null(spark, short_dir):
    """Short docs must produce real (zero-padded-window) fingerprints, not
    NULLs — mirroring the oracle's ascii('') = 0 padding."""
    from swallow_spark.registry import all_queries

    s_pdf = all_queries()["text_fingerprint"].fn(spark, short_dir).toPandas()
    shorts = s_pdf[s_pdf["doc_id"] >= 10_000]
    assert len(shorts) == len(SHORT_TEXTS)
    assert shorts["fingerprint"].notna().all()

# Ritual-only suite (VERDICT r11 item 1): exhaustive sweep / mutated-data
# parity / hypothesis battery / timed gate — skipped by a plain pytest run
# so the driver-visible suite finishes; SWALLOW_FULL_TESTS=1 runs it.
pytestmark = pytest.mark.slow
