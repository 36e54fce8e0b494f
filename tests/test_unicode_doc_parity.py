"""Unicode-document parity hardening (round 4).

The driver regenerates testdata between rounds; today's corpus is pure
ASCII but nothing guarantees that. Non-ASCII text is where engines love to
diverge: char-vs-byte lengths/offsets, ascii() semantics, case mapping.
This probe materializes a documents table with accented/CJK/emoji texts
and asserts every documents-reading oracle key still hash-matches its
DuckDB oracle (the multimodal hex-slice keys claim byte-exact drift-proof
semantics — this is the test that makes the claim checkable).
"""

from __future__ import annotations

import os
import shutil

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SRC = "/root/testdata/sf0.001"
DST = "/tmp/swallow_spark_unidoc/sf0.001"

UNI_TEXTS = [
    "héllo wörld from the énginé",
    "日本語 テキスト 処理 エンジン 検証 テスト",
    "emoji 🚀 test 🚀 again 🎉 done",
    "café café café résumé naïve",
    "mixed ascii ünïcode tökens here now",
    "ŧĦɇ qÜiçk ƀrøwn føx jumps",
    # mixed-normalization forms (round 8, for text_unicode_normalize and any
    # key hashing raw text): decomposed e+U+0301, the U+212B angstrom
    # singleton, and combining-mark reorderings that NFC must canonicalize
    "décomposed é again résumé",
    "angstrom Å sign Å here twice",
    "ṩ reorder ṩ both ways",
    "already composed é Å ṩ stays",
]


@pytest.fixture(scope="module")
def uni_dir():
    os.makedirs(DST, exist_ok=True)
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        src = f"{SRC}/{name}.parquet"
        dst = f"{DST}/{name}.parquet"
        if name == "documents":
            t = pq.read_table(src)
            n = len(UNI_TEXTS)
            uni = pa.table(
                {
                    "doc_id": pa.array(
                        [20_000 + i for i in range(n)], type=t.schema.field("doc_id").type
                    ),
                    "text": pa.array(UNI_TEXTS, type=pa.string()),
                    "lang": pa.array(["xx"] * n, type=t.schema.field("lang").type),
                    "source": pa.array(["synthetic"] * n, type=t.schema.field("source").type),
                    "n_chars": pa.array(
                        [len(s) for s in UNI_TEXTS], type=t.schema.field("n_chars").type
                    ),
                }
            )
            pq.write_table(pa.concat_tables([t.select(uni.column_names), uni]), dst)
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
def uni_duck(uni_dir):
    from swallow_spark import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{uni_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("key", _doc_oracle_keys())
def test_doc_keys_survive_unicode_docs(spark, uni_dir, uni_duck, key):
    """EVERY documents-reading oracle key must hash-match its oracle when
    the table contains non-ASCII texts."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from oracle_diff import canon_pdf, digest

    from swallow_spark.registry import all_queries

    q = all_queries()[key]
    s_pdf = canon_pdf(q.fn(spark, uni_dir).toPandas())
    d_pdf = canon_pdf(uni_duck.sql(q.oracle).fetchdf())
    assert list(s_pdf.columns) == list(d_pdf.columns)
    assert len(s_pdf) == len(d_pdf)
    assert digest(s_pdf) == digest(d_pdf)

# Ritual-only suite (VERDICT r11 item 1): exhaustive sweep / mutated-data
# parity / hypothesis battery / timed gate — skipped by a plain pytest run
# so the driver-visible suite finishes; SWALLOW_FULL_TESTS=1 runs it.
pytestmark = pytest.mark.slow
