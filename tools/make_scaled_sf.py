"""Deterministic sf1/sf3 builder for SCALING measurements (round 12,
VERDICT r11 items 4/5/8).

The driver's largest SF (sf0.1, 600k lineitem rows) is fixed-overhead
dominated: every headline query runs as fast on 8 cores as on 32, so none
of the round-11 "scale-safe" claims (fan_out, SHUFFLE_HASH loop hints,
dist_rank's derived B) had a measured point where parallelism matters.
This tool builds an N× scale-up of /root/testdata/sf0.1 under /tmp (never
touching the read-only driver data) by replicating every fact table with
REPLICA-SHIFTED KEYS, so cardinalities, join fan-outs and group counts all
scale by N while per-key distributions match the driver's generator:

- region/nation: copied (fixed dimensions).
- customer/supplier/part/orders/lineitem/events: keys shifted by
  replica * (max key) per replica; foreign keys shifted consistently, so
  each replica is an isomorphic copy of the sf0.1 star — join selectivity
  and group sizes per key are UNCHANGED, group COUNTS scale by N.
- documents: doc_id shifted; every token in replica k>0 is suffixed
  "_rk", so within-replica shingle/token structure (and near-dup pairs)
  is preserved exactly while CROSS-replica Jaccard is 0 — naive
  replication would hand the dedup keys N² cross-copy near-duplicates
  that no real corpus has.
- embeddings: vec_id shifted; replica k's vectors are np.roll(v, k)
  (norm- and distribution-preserving, decorrelates copies so the
  similarity keys don't see N-1 exact duplicates of every vector).
  label kept (label is a blocking key: block COUNT fixed, block SIZE
  scales — the realistic direction).

Usage: python tools/make_scaled_sf.py [--mult N] [--out DIR]
Defaults: --mult 10 (sf1), --out /tmp/swallow_sf1. Deterministic — no RNG
at all; rerunning reproduces byte-identical logical content.
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

import numpy as np
import pandas as pd

SRC = "/root/testdata/sf0.1"
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# key spans at sf0.1 (verified against the data in round 12): shifting by
# replica*span keeps every replica's key range disjoint
SPAN = {
    "c_custkey": 15_000,
    "s_suppkey": 1_000,
    "p_partkey": 20_000,
    "o_orderkey": 150_000,
    "event_id": 100_000,
    "user_id": 15_000,
    "doc_id": 5_000,
    "vec_id": 2_000,
}


def _read(t: str) -> pd.DataFrame:
    import duckdb

    return duckdb.connect().execute(
        f"SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
    ).df()


def _write(pdf: pd.DataFrame, path: str) -> None:
    import duckdb

    con = duckdb.connect()
    con.execute(f"COPY (SELECT * FROM pdf) TO '{path}' (FORMAT PARQUET)")
    con.close()


def _replicate(base: pd.DataFrame, mult: int, shifts: dict[str, int]) -> pd.DataFrame:
    parts = []
    for k in range(mult):
        r = base.copy(deep=False)
        if k:
            r = r.copy()
            for col, span in shifts.items():
                r[col] = r[col] + k * span
        parts.append(r)
    return pd.concat(parts, ignore_index=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--out", default="/tmp/swallow_sf1")
    args = ap.parse_args()
    mult, out = args.mult, args.out
    os.makedirs(out, exist_ok=True)

    for t in ("region", "nation"):
        _write(_read(t), f"{out}/{t}.parquet")
        print(t, "copied", file=sys.stderr)

    shifts_by_table = {
        "customer": {"c_custkey": SPAN["c_custkey"]},
        "supplier": {"s_suppkey": SPAN["s_suppkey"]},
        "part": {"p_partkey": SPAN["p_partkey"]},
        "orders": {"o_orderkey": SPAN["o_orderkey"], "o_custkey": SPAN["c_custkey"]},
        "lineitem": {
            "l_orderkey": SPAN["o_orderkey"],
            "l_partkey": SPAN["p_partkey"],
            "l_suppkey": SPAN["s_suppkey"],
        },
        "events": {"event_id": SPAN["event_id"], "user_id": SPAN["user_id"]},
    }
    for t, shifts in shifts_by_table.items():
        pdf = _replicate(_read(t), mult, shifts)
        _write(pdf, f"{out}/{t}.parquet")
        print(t, len(pdf), "rows", file=sys.stderr)

    # documents: token-suffix per replica (k=0 verbatim)
    base = _read("documents")
    parts = [base]
    for k in range(1, mult):
        r = base.copy()
        r["doc_id"] = r["doc_id"] + k * SPAN["doc_id"]
        suf = f"_r{k}"
        r["text"] = [
            " ".join(w + suf for w in t.split()) if isinstance(t, str) else t
            for t in r["text"]
        ]
        r["n_chars"] = [
            len(t) if isinstance(t, str) else n
            for t, n in zip(r["text"], r["n_chars"])
        ]
        parts.append(r)
    pdf = pd.concat(parts, ignore_index=True)
    _write(pdf, f"{out}/documents.parquet")
    print("documents", len(pdf), "rows", file=sys.stderr)

    # embeddings: np.roll(v, k) per replica
    base = _read("embeddings")
    parts = [base]
    for k in range(1, mult):
        r = base.copy()
        r["vec_id"] = r["vec_id"] + k * SPAN["vec_id"]
        r["embedding"] = [
            np.roll(np.asarray(v, dtype=np.float32), k) for v in r["embedding"]
        ]
        parts.append(r)
    pdf = pd.concat(parts, ignore_index=True)
    _write(pdf, f"{out}/embeddings.parquet")
    print("embeddings", len(pdf), "rows", file=sys.stderr)
    print(f"done -> {out} (mult {mult})", file=sys.stderr)


if __name__ == "__main__":
    main()
