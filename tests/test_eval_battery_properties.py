"""Eval-battery degenerate-input property suite (round 8, VERDICT r7 item 8).

BLEU / chrF / ROUGE-L / WER are oracle-green on the fixture grid, but the
fixture's documents are uniformly ~80 tokens — none of the degenerate shapes
a real eval set contains ever execute: empty-after-tokenization candidates,
single-token docs, all-n-grams-clipped, repeated-token clipping, unicode
combining characters, double-space empty tokens, truncation boundaries.

This suite plants 50 adversarial candidate/reference pairs INSIDE the eval
grid (cand doc_id 0..49, ref doc_id+100) and checks all three ways:
Spark result == DuckDB oracle (driver-mirror canonicalization) AND both ==
a pure-Python reference implementing the documented integer spec per pair.

Found at write time: eval_bleu's `clip * 1e6 DIV total_cnt` THREW under the
ANSI session for candidates shorter than n tokens (DuckDB `//` returns NULL
there) — fixed with an explicit total_cnt > 0 guard on the Spark side.
"""

from __future__ import annotations

import os
import random
import shutil
import sys
from collections import Counter
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

SRC = "/root/testdata/sf0.001"
DST = "/tmp/swallow_spark_evalprops/sf0.001"

CRAFTED = [
    ("x", "x"),                            # single identical token
    ("x", "y"),                            # single disjoint token
    ("a b", "a b"),                        # perfect short pair
    ("a a a a a", "a"),                    # clipping: 5 cand copies, 1 ref
    ("a b c d e", "f g h i j"),            # fully disjoint vocab
    ("w " * 24 + "end", "w " * 24 + "end"),  # truncation at 20 tokens
    ("z", "r " * 24 + "r"),                # extreme brevity penalty
    (" ", " "),                            # whitespace-only: empty chrF side
    ("é x", "é x"),             # combining acute vs composed é
    ("a  b", "a b"),                       # double space -> empty token
    ("café über naïve", "café über naïve"),
    ("a b a b a b", "b a b a"),            # overlapping periodic patterns
    ("the cat sat on the mat", "the cat sat on a mat"),
    ("p q", "q p"),                        # transposition
]

VOCAB = ["the", "cat", "sat", "on", "a", "mat", "dog", "ran", "zz", "été"]


def _random_pairs(n: int) -> list[tuple[str, str]]:
    rng = random.Random(20260815)
    out = []
    for _ in range(n):
        la, lb = rng.randint(1, 25), rng.randint(1, 25)
        out.append(
            (
                " ".join(rng.choice(VOCAB) for _ in range(la)),
                " ".join(rng.choice(VOCAB) for _ in range(lb)),
            )
        )
    return out


PAIRS = CRAFTED + _random_pairs(50 - len(CRAFTED))


@pytest.fixture(scope="module")
def eval_dir():
    os.makedirs(DST, exist_ok=True)
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        src = f"{SRC}/{name}.parquet"
        dst = f"{DST}/{name}.parquet"
        if name == "documents":
            t = pq.read_table(src)
            ids, texts = [], []
            for i, (c, r) in enumerate(PAIRS):
                ids += [i, i + 100]
                texts += [c, r]
            doc = pa.table(
                {
                    "doc_id": pa.array(ids, type=t.schema.field("doc_id").type),
                    "text": pa.array(texts, type=pa.string()),
                    "lang": pa.array(["xx"] * len(ids), type=t.schema.field("lang").type),
                    "source": pa.array(
                        ["synthetic"] * len(ids), type=t.schema.field("source").type
                    ),
                    "n_chars": pa.array(
                        [len(s) for s in texts], type=t.schema.field("n_chars").type
                    ),
                }
            )
            pq.write_table(doc, dst)
        else:
            shutil.copyfile(src, dst)
    yield DST
    shutil.rmtree(os.path.dirname(DST), ignore_errors=True)


@pytest.fixture(scope="module")
def eval_duck(eval_dir):
    from swallow_spark import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{eval_dir}/{t}.parquet')"
        )
    yield con
    con.close()


# ------------------------------------------------- pure-Python references


def _toks(t: str) -> list[str]:
    return t.split(" ")[:20]


def bleu_ref(c: str, r: str) -> dict:
    ct, rt = _toks(c), _toks(r)
    out = {"n_cand": len(ct), "n_ref": len(rt)}
    ms = []
    for n in (1, 2, 3, 4):
        cg = Counter(tuple(ct[i : i + n]) for i in range(len(ct) - n + 1))
        rg = Counter(tuple(rt[i : i + n]) for i in range(len(rt) - n + 1))
        clip = sum(min(v, rg[g]) for g, v in cg.items() if g in rg)
        total = max(len(ct) - n + 1, 0)
        out[f"clip{n}"] = clip
        out[f"p{n}_micro"] = clip * 1000000 // total if total > 0 else None
        ms.append(clip * 1000 // total if total > 0 else None)
    out["prod_e12"] = (
        None if any(m is None for m in ms) else ms[0] * ms[1] * ms[2] * ms[3]
    )
    out["bp_log_micro"] = (
        0 if len(ct) >= len(rt) else 1000000 - len(rt) * 1000000 // len(ct)
    )
    return out


def chrf_ref(c: str, r: str) -> dict:
    cs, rs = c.replace(" ", "")[:100], r.replace(" ", "")[:100]
    ps, rcl = [], []
    for n in range(1, 7):
        cg = Counter(cs[i : i + n] for i in range(max(len(cs) - n + 1, 0)))
        rg = Counter(rs[i : i + n] for i in range(max(len(rs) - n + 1, 0)))
        o = sum(min(v, rg[g]) for g, v in cg.items() if g in rg)
        tc, tr = max(len(cs) - n + 1, 0), max(len(rs) - n + 1, 0)
        if tc > 0:
            ps.append(o * 1000000 // tc)
        if tr > 0:
            rcl.append(o * 1000000 // tr)
    p = sum(ps) // len(ps) if ps else None
    rr = sum(rcl) // len(rcl) if rcl else None
    if p is None or rr is None:
        f = None
    elif p + rr == 0:
        f = 0
    else:
        f = 2 * p * rr // (p + rr)
    return {"chrp_micro": p, "chrr_micro": rr, "chrf_micro": f}


def _lcs(a: list[str], b: list[str]) -> int:
    m = len(b)
    prev = [0] * (m + 1)
    for tok in a:
        cur = [0] * (m + 1)
        for j in range(1, m + 1):
            cur[j] = prev[j - 1] + 1 if tok == b[j - 1] else max(prev[j], cur[j - 1])
        prev = cur
    return prev[m]


def rouge_ref(c: str, r: str) -> dict:
    ct, rt = _toks(c), _toks(r)
    lcs = _lcs(ct, rt)
    return {
        "n_cand": len(ct),
        "n_ref": len(rt),
        "lcs_len": lcs,
        "p_micro": lcs * 1000000 // len(ct),
        "r_micro": lcs * 1000000 // len(rt),
        "f1_micro": lcs * 2000000 // (len(ct) + len(rt)),
    }


def _word_lev(a: list[str], b: list[str]) -> int:
    m = len(b)
    prev = list(range(m + 1))
    for i, wa in enumerate(a, 1):
        cur = [i] + [0] * m
        for j in range(1, m + 1):
            cost = 0 if wa == b[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
        prev = cur
    return prev[m]


def wer_ref(c: str, r: str) -> dict:
    ct, rt = _toks(c), _toks(r)
    d = _word_lev(ct, rt)
    return {
        "n_cand": len(ct),
        "n_ref": len(rt),
        "edit_dist": d,
        "wer_micro": d * 1000000 // len(rt),
    }


REFS = {
    "eval_bleu": bleu_ref,
    "eval_chrf": chrf_ref,
    "text_rouge_l": rouge_ref,
    "eval_wer": wer_ref,
}

# whitespace-only texts survive the length>0 filter; empty texts would not
_EXPECTED_PAIRS = len(PAIRS)


@pytest.mark.parametrize("key", sorted(REFS))
def test_eval_key_three_way(spark, eval_dir, eval_duck, key):
    from oracle_diff import canon_pdf, digest

    from swallow_spark.registry import all_queries

    q = all_queries()[key]
    s_pdf_raw = q.fn(spark, eval_dir).toPandas()
    d_pdf_raw = eval_duck.sql(q.oracle).fetchdf()

    # leg 1: driver-mirror hash equality Spark vs DuckDB
    s_pdf = canon_pdf(s_pdf_raw.copy())
    d_pdf = canon_pdf(d_pdf_raw.copy())
    assert list(s_pdf.columns) == list(d_pdf.columns)
    assert len(s_pdf) == len(d_pdf) == _EXPECTED_PAIRS
    assert digest(s_pdf) == digest(d_pdf)

    # leg 2: every Spark row equals the pure-Python integer spec
    ref_fn = REFS[key]
    by_id = {int(r["cand_id"]): r for _, r in s_pdf_raw.iterrows()}
    for i, (c, r) in enumerate(PAIRS):
        row = by_id[i]
        expect = ref_fn(c, r)
        for col, want in expect.items():
            got = row[col]
            got = None if got is None or (got != got) else int(got)  # NaN -> None
            assert got == want, (
                f"{key} pair {i} ({c!r}, {r!r}) column {col}: "
                f"spark={got} python={want}"
            )

# Ritual-only suite (VERDICT r11 item 1): exhaustive sweep / mutated-data
# parity / hypothesis battery / timed gate — skipped by a plain pytest run
# so the driver-visible suite finishes; SWALLOW_FULL_TESTS=1 runs it.
pytestmark = pytest.mark.slow
