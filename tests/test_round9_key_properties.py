"""Degenerate-input property suites for the three keys that landed after
round 9's first full ritual (VERDICT r9 item 5): etl_layout_skipping_report,
training_chat_format_validate, eval_regression_metrics. Each scenario is
checked three ways in the established pattern (test_eval_battery_properties):
Spark == DuckDB oracle under the driver-mirror hash, and both == a
pure-Python implementation of the documented integer spec.

Shapes exercised that the sf fixtures never produce: zero-variance
(constant-price) regression targets, single-row inputs, <3-token documents
(n_turns = 0 — the engine-divergent sequence(1, 0) bound this round's
advice fix guards), all-invalid chat corpora, rule-precedence collisions
(doc_id divisible by both 7 and 11), single-file layouts, and a target
month no file contains.
"""

from __future__ import annotations

import math
import os
import shutil
import sys
from collections import defaultdict
from datetime import datetime
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

SRC = "/root/testdata/sf0.001"
BASE = "/tmp/swallow_spark_r9props"

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _make_dir(name: str, table: str, mutated: pa.Table) -> str:
    dst = f"{BASE}/{name}"
    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        if t == table:
            pq.write_table(mutated, f"{dst}/{t}.parquet")
        else:
            shutil.copyfile(f"{SRC}/{t}.parquet", f"{dst}/{t}.parquet")
    return dst


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _three_way(spark, key: str, sf_dir: str):
    """Run the key's Spark arm and DuckDB oracle on sf_dir; assert the
    driver-mirror hash matches; return the raw Spark pandas frame."""
    from oracle_diff import canon_pdf, digest

    from swallow_spark.registry import all_queries

    q = all_queries()[key]
    s_raw = q.fn(spark, sf_dir).toPandas()
    con = _duck(sf_dir)
    try:
        d_raw = con.sql(q.oracle).fetchdf()
    finally:
        con.close()
    s_pdf, d_pdf = canon_pdf(s_raw.copy()), canon_pdf(d_raw.copy())
    assert list(s_pdf.columns) == list(d_pdf.columns)
    assert len(s_pdf) == len(d_pdf)
    assert digest(s_pdf) == digest(d_pdf)
    return s_raw


@pytest.fixture(scope="module", autouse=True)
def _cleanup():
    yield
    shutil.rmtree(BASE, ignore_errors=True)


# ---------------------------------------------------------------- chat


def _docs_table(rows: list[tuple[int, str]]) -> pa.Table:
    t = pq.read_table(f"{SRC}/documents.parquet")
    ids = [r[0] for r in rows]
    texts = [r[1] for r in rows]
    return pa.table(
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


def _chat_ref(doc_id: int, text: str):
    """Pure-Python mirror of the documented chat-construction +
    validation spec."""
    tok = text.split(" ")
    n = min(len(tok) // 3, 6)
    turns = []
    for i in range(1, n + 1):
        if doc_id % 7 == 0 and i == 2:
            role = "user"
        elif (i - 1) % 2 == 0:
            role = "user"
        else:
            role = "assistant"
        if doc_id % 11 == 0 and i == n:
            content = ""
        else:
            content = " ".join(tok[(i - 1) * 3 : (i - 1) * 3 + 3])
        turns.append((role, content))
    if n < 2:
        verdict = "too_short"
    elif any(turns[i][0] == turns[i - 1][0] for i in range(1, n)):
        verdict = "bad_alternation"
    elif any(c == "" for _, c in turns):
        verdict = "empty_content"
    else:
        verdict = "valid"
    return n, verdict


# crafted corpus: every planted-residue / turn-count / precedence branch
_CHAT_DOCS = [
    (1, "a"),                      # 1 token -> n_turns 0 (sequence(1,0) bound)
    (2, "a b"),                    # 2 tokens -> n_turns 0
    (3, "a b c"),                  # exactly 1 turn -> too_short
    (4, "a b c d e"),              # 5 tokens -> 1 turn -> too_short
    (5, " "),                      # whitespace-only: 2 empty tokens, n 0
    (6, "a b c d e f"),            # 2 turns, no plants -> valid
    (13, " ".join(f"t{i}" for i in range(9))),   # 3 turns -> valid
    (7, "a b c d e f"),            # %7: role plant at turn 2 -> bad_alternation
    (14, " ".join(f"t{i}" for i in range(12))),  # %7 with 4 turns
    (11, "a b c d e f"),           # %11: final turn blanked -> empty_content
    (22, " ".join(f"t{i}" for i in range(18))),  # %11 with 6 turns
    (33, "a b c"),                 # %11 but n_turns 1 -> too_short wins
    (21, "a b c d e f"),           # %7 (21%7==0) -> bad_alternation
    (77, " ".join(f"t{i}" for i in range(12))),  # %7 AND %11: precedence
    (0, " ".join(f"t{i}" for i in range(12))),   # 0 divides everything
    (8, " ".join(f"t{i}" for i in range(25))),   # >18 tokens: capped at 6 turns
    (9, "x  y z q"),               # double space -> empty middle token
]

_ALL_INVALID_DOCS = [(i + 100, "a b") for i in range(10)]  # all n_turns 0


@pytest.mark.parametrize(
    "name,rows",
    [("chat_grid", _CHAT_DOCS), ("chat_all_invalid", _ALL_INVALID_DOCS)],
)
def test_chat_format_validate_three_way(spark, name, rows):
    sf_dir = _make_dir(name, "documents", _docs_table(rows))
    s_raw = _three_way(spark, "training_chat_format_validate", sf_dir)
    got = {
        int(r["doc_id"]): (int(r["n_turns"]), r["verdict"])
        for _, r in s_raw.iterrows()
    }
    want = {doc_id: _chat_ref(doc_id, text) for doc_id, text in rows}
    assert got == want
    if name == "chat_all_invalid":
        assert {v for _, v in got.values()} == {"too_short"}


# ----------------------------------------------------------- regression


def _orders_table(rows: list[tuple[int, float]]) -> pa.Table:
    """rows: (o_custkey, o_totalprice); other columns cloned from row 0."""
    t = pq.read_table(f"{SRC}/orders.parquet")
    n = len(rows)
    out = t.slice(0, 1)
    out = pa.concat_tables([out] * n)
    i_ck = out.schema.get_field_index("o_custkey")
    out = out.set_column(
        i_ck, "o_custkey", pa.array([r[0] for r in rows], type=pa.int64())
    )
    i_tp = out.schema.get_field_index("o_totalprice")
    out = out.set_column(
        i_tp, "o_totalprice", pa.array([r[1] for r in rows], type=pa.float64())
    )
    i_ok = out.schema.get_field_index("o_orderkey")
    return out.set_column(
        i_ok, "o_orderkey", pa.array(list(range(1, n + 1)), type=pa.int64())
    )


def _reg_ref(rows: list[tuple[int, float]]):
    """Pure-Python mirror of the documented integer spec."""
    ys = defaultdict(list)
    for ck, price in rows:
        ys[ck].append(math.floor(price))
    pred = []
    for ck, vals in ys.items():
        yhat = sum(vals) // len(vals)  # non-negative: DIV == //
        pred += [(yv, yhat) for yv in vals]
    n = len(pred)
    ae = [abs(yv - yh) for yv, yh in pred]
    sae, sse = sum(ae), sum(a * a for a in ae)
    sy = sum(yv for yv, _ in pred)
    sy2 = sum(yv * yv for yv, _ in pred)
    smape = sum(a * 1000 // max(yv, 1) for a, (yv, _) in zip(ae, pred))
    ymin = min(yv for yv, _ in pred)
    ymax = max(yv for yv, _ in pred)
    r2 = (
        None
        if ymin == ymax
        else math.floor((1 - sse / (sy2 - sy * sy / n)) * 1000000 + 0.5) / 1000000
    )
    return {
        "n": n,
        "mae_dollars": sae // n,
        "rmse_dollars": math.floor(math.sqrt(sse / n) * 10000 + 0.5) / 10000,
        "r2": r2,
        "mape_milli": smape // n,
    }


_REG_SCENARIOS = {
    # constant price everywhere -> zero variance -> r2 NULL (advice fix)
    "reg_zero_variance": [(k % 3 + 1, 500.25) for k in range(10)],
    # per-customer constant, cross-customer varying -> perfect predictor
    "reg_perfect": [(k, 100.0 * k + 0.75) for k in (1, 2, 3) for _ in range(4)],
    # single order: n = 1 -> min == max -> r2 NULL
    "reg_single_row": [(42, 1234.56)],
    # mixed group sizes incl. singletons, varying residuals
    "reg_mixed": [(1, 10.0), (1, 20.0), (1, 31.0), (2, 5.5), (3, 7.25), (3, 9.75)],
}


@pytest.mark.parametrize("name", sorted(_REG_SCENARIOS))
def test_regression_metrics_three_way(spark, name):
    rows = _REG_SCENARIOS[name]
    sf_dir = _make_dir(name, "orders", _orders_table(rows))
    s_raw = _three_way(spark, "eval_regression_metrics", sf_dir)
    assert len(s_raw) == 1
    got = s_raw.iloc[0]
    want = _reg_ref(rows)
    assert int(got["n"]) == want["n"]
    assert int(got["mae_dollars"]) == want["mae_dollars"]
    assert float(got["rmse_dollars"]) == want["rmse_dollars"]
    if want["r2"] is None:
        assert got["r2"] != got["r2"] or got["r2"] is None  # NaN/None both OK
    else:
        assert float(got["r2"]) == want["r2"]
        assert math.isfinite(float(got["r2"]))
    assert int(got["mape_milli"]) == want["mape_milli"]


# --------------------------------------------------------------- layout


def _lineitem_table(rows: list[tuple[int, str]]) -> pa.Table:
    """rows: (l_orderkey, 'YYYY-MM-DD' shipdate); other cols cloned."""
    t = pq.read_table(f"{SRC}/lineitem.parquet")
    n = len(rows)
    out = pa.concat_tables([t.slice(0, 1)] * n)
    i_ok = out.schema.get_field_index("l_orderkey")
    out = out.set_column(
        i_ok, "l_orderkey", pa.array([r[0] for r in rows], type=pa.int64())
    )
    i_sd = out.schema.get_field_index("l_shipdate")
    ship_type = t.schema.field("l_shipdate").type
    dates = [datetime.fromisoformat(r[1] + "T00:00:00") for r in rows]
    return out.set_column(i_sd, "l_shipdate", pa.array(dates, type=ship_type))


def _layout_ref(rows: list[tuple[int, str]], target_ym: int):
    """Pure-Python mirror: per-layout (n_files, files_hit, skip_micro,
    rows_total, rows_in_hit_files)."""
    out = {}
    for layout, keyf in (
        ("hash", lambda ok, ym: ok % 8),
        ("range", lambda ok, ym: ym),
    ):
        groups = defaultdict(list)
        for ok, d in rows:
            ym = int(d[:4]) * 100 + int(d[5:7])
            groups[keyf(ok, ym)].append(ym)
        n_files = len(groups)
        hits = [
            yms for yms in groups.values() if min(yms) <= target_ym <= max(yms)
        ]
        out[layout] = (
            n_files,
            len(hits),
            (n_files - len(hits)) * 1000000 // n_files,
            sum(len(v) for v in groups.values()),
            sum(len(v) for v in hits),
        )
    return out


_LAYOUT_SCENARIOS = {
    # every row in the target month: both layouts 0% skip
    "layout_all_target": [(k, "1995-06-15") for k in range(16)],
    # no row anywhere near the target month: 100% skip in both layouts
    "layout_no_hit": [(k, "1997-03-01") for k in range(16)],
    # single row -> single-file layouts on both sides
    "layout_single_row": [(3, "1995-06-02")],
    # one orderkey, many months -> 1 hash file spanning, range files 1-per-month
    "layout_one_bucket": [(8, f"1995-{m:02d}-10") for m in range(1, 13)],
}


@pytest.mark.parametrize("name", sorted(_LAYOUT_SCENARIOS))
def test_layout_skipping_three_way(spark, name):
    from swallow_spark.queries.layout import _LAYOUT_TARGET_YM

    rows = _LAYOUT_SCENARIOS[name]
    sf_dir = _make_dir(name, "lineitem", _lineitem_table(rows))
    s_raw = _three_way(spark, "etl_layout_skipping_report", sf_dir)
    got = {
        r["layout"]: (
            int(r["n_files"]),
            int(r["files_hit"]),
            int(r["skip_micro"]),
            int(r["rows_total"]),
            int(r["rows_in_hit_files"]),
        )
        for _, r in s_raw.iterrows()
    }
    assert got == _layout_ref(rows, _LAYOUT_TARGET_YM)


def _zorder_ref(rows: list[tuple[int, str]], pb0: int, mb_t: int, pb_t: int):
    """Pure-Python mirror of etl_zorder_layout. The crafted lineitem clones
    l_partkey from the source's first row, so pb = pb0 for EVERY row — the
    degenerate constant-column case (all part mass in one tile column)."""
    mos = [int(d[:4]) * 12 + int(d[5:7]) for _, d in rows]
    lo, span = min(mos), max(mos) - min(mos) + 1
    recs = [(((mo - lo) * 16) // span, pb0) for mo in mos]

    def morton(mb, pb):
        return sum(
            (((mb >> i) & 1) << (2 * i)) + (((pb >> i) & 1) << (2 * i + 1))
            for i in range(4)
        )

    out = {}
    for layout, keyf in (
        ("linear", lambda mb, pb: mb),
        ("zorder", lambda mb, pb: morton(mb, pb) // 16),
    ):
        groups = defaultdict(list)
        for mb, pb in recs:
            groups[keyf(mb, pb)].append((mb, pb))
        nf = len(groups)
        for dim, target, idx in (("month", mb_t, 0), ("part", pb_t, 1)):
            hits = [
                g
                for g in groups.values()
                if min(x[idx] for x in g) <= target <= max(x[idx] for x in g)
            ]
            out[(layout, dim)] = (
                nf,
                len(hits),
                (nf - len(hits)) * 1000000 // nf,
                len(recs),
                sum(len(g) for g in hits),
            )
    return out


@pytest.mark.parametrize("name", sorted(_LAYOUT_SCENARIOS))
def test_zorder_layout_three_way(spark, name):
    from swallow_spark.queries.layout import _Z_TARGET_MB, _Z_TARGET_PB

    rows = _LAYOUT_SCENARIOS[name]
    sf_dir = _make_dir(f"z_{name}", "lineitem", _lineitem_table(rows))
    pb0 = int(
        pq.read_table(f"{SRC}/lineitem.parquet").slice(0, 1)["l_partkey"][0].as_py()
        % 16
    )
    s_raw = _three_way(spark, "etl_zorder_layout", sf_dir)
    got = {
        (r["layout"], r["dim"]): (
            int(r["n_files"]),
            int(r["files_hit"]),
            int(r["skip_micro"]),
            int(r["rows_total"]),
            int(r["rows_in_hit_files"]),
        )
        for _, r in s_raw.iterrows()
    }
    assert got == _zorder_ref(rows, pb0, _Z_TARGET_MB, _Z_TARGET_PB)

# Ritual-only suite (VERDICT r11 item 1): exhaustive sweep / mutated-data
# parity / hypothesis battery / timed gate — skipped by a plain pytest run
# so the driver-visible suite finishes; SWALLOW_FULL_TESTS=1 runs it.
pytestmark = pytest.mark.slow
