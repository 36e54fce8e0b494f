"""Skew stress-test at builder-generated sf≈1 (VERDICT r6 item 4).

Plan tests assert shuffle SHAPES; this measures BEHAVIOR under deliberate
key skew, above the driver's largest scale factor. Two synthetic corpora of
identical size (~10× sf0.1) are generated under /tmp (never touching
/root/testdata): a SKEWED variant — one hot user owning 20% of events, one
hot 10-word document prefix shared by 20% of docs (hot shingles → hot LSH
buckets), one hot embedding label blocking 20% of vectors, one hot part in
20% of lineitem baskets (hot graph vertex) — and a UNIFORM control. The
skew-sensitive families then run on both, warm median-of-3, alongside
hash-partition histograms of each family's shuffle key, so SCALE.md can
record measured skew amplification rather than assumed shapes.

Usage:  python tools/skew_stress.py [--keep] [--scale N] [--keys a,b,c]
Prints one JSON line; human summary to stderr. --keys restricts the run to a
subset of KEYS (one family at a time keeps a --scale 3 run tractable).

--scale multiplies every corpus size (round 8, VERDICT r7 item 7: the
iterative graph keys and the throttle fold measured at sf≈3 — 3M events,
18M+ lineitem rows — where a hot vertex owning ~20% of basket edges is the
power-law case a crawl graph presents).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

BASE = "/tmp/swallow_skew"
SRC = "/root/testdata/sf0.1"
N_EVENTS = 1_000_000
N_USERS = 15_000
N_DOCS = 50_000
N_VECS = 20_000
N_ORDERS = 1_500_000
N_PARTS = 20_000
HOT_SHARE = 0.20

KEYS = [
    ("stream_session_batch", "events", "user_id"),
    ("win_throttle_events", "events", "user_id"),
    ("dedup_minhash_lsh", "documents", None),
    ("sim_pairs_threshold", "embeddings", "label"),
    ("graph_pagerank", "lineitem", None),
    ("graph_kcore", "lineitem", None),
    # round 9 (VERDICT r8 item 4): the explode-heavy text family — the hot
    # 10-word prefix gives tokens hot0..hot9 df = 20% of docs (~25x the mean
    # df), the boilerplate-header shape a crawl corpus presents. The exposed
    # keys are the token/shingle posting lists.
    ("text_tfidf_topk", "documents", None),
    ("text_bm25_search", "documents", None),
    ("dedup_near_exact_jaccard", "documents", None),
]


def apply_scale(mult: int) -> None:
    """Scale every corpus size in place (module constants)."""
    global N_EVENTS, N_USERS, N_DOCS, N_VECS, N_ORDERS, N_PARTS
    N_EVENTS *= mult
    N_USERS *= mult
    N_DOCS *= mult
    N_VECS *= mult
    N_ORDERS *= mult
    N_PARTS *= mult


def _write(pdf: pd.DataFrame, path: str) -> None:
    import duckdb

    con = duckdb.connect()
    con.execute(f"COPY (SELECT * FROM pdf) TO '{path}' (FORMAT PARQUET)")
    con.close()


def _gen_events(rng, skewed: bool, path: str) -> None:
    n = N_EVENTS
    if skewed:
        n_hot = int(n * HOT_SHARE)
        users = np.concatenate(
            [np.ones(n_hot, dtype=np.int64),
             rng.integers(2, N_USERS + 1, n - n_hot)]
        )
        rng.shuffle(users)
    else:
        users = rng.integers(1, N_USERS + 1, n)
    ts = (
        np.datetime64("2024-01-01", "s")
        + rng.integers(0, 90 * 86400, n).astype("timedelta64[s]")
    )
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(1, n + 1, dtype=np.int64),
            "ts": ts.astype("datetime64[us]"),
            "user_id": users,
            "event_type": np.array(["view", "click", "cart", "buy", "share", "rate"])[
                rng.integers(0, 6, n)
            ],
            "value": np.round(rng.uniform(0, 100, n), 2),
            "props": pd.Series(rng.integers(0, 100, n)).map(
                lambda k: '{"k": %d}' % k
            ),
        }
    )
    _write(pdf, path)


def _gen_documents(rng, skewed: bool, path: str) -> None:
    vocab = np.array([f"w{i}" for i in range(5000)])
    words = vocab[rng.integers(0, 5000, (N_DOCS, 40))]
    hot_prefix = " ".join(f"hot{i}" for i in range(10))
    texts = []
    n_hot = int(N_DOCS * HOT_SHARE)
    for i in range(N_DOCS):
        body = " ".join(words[i])
        if skewed and i < n_hot:
            texts.append(hot_prefix + " " + body)
        else:
            texts.append(body)
    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(1, N_DOCS + 1, dtype=np.int64),
            "text": texts,
            "lang": "en",
            "source": "skewgen",
            "n_chars": [len(t) for t in texts],
        }
    )
    _write(pdf, path)


def _gen_embeddings(rng, skewed: bool, path: str) -> None:
    vecs = rng.standard_normal((N_VECS, 64)).astype(np.float32)
    if skewed:
        n_hot = int(N_VECS * HOT_SHARE)
        labels = np.concatenate(
            [np.zeros(n_hot, dtype=np.int32),
             rng.integers(1, 51, N_VECS - n_hot).astype(np.int32)]
        )
        rng.shuffle(labels)
    else:
        labels = rng.integers(0, 51, N_VECS).astype(np.int32)
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(1, N_VECS + 1, dtype=np.int64),
            "embedding": list(vecs),
            "label": labels,
        }
    )
    _write(pdf, path)


def _gen_lineitem(rng, skewed: bool, path: str) -> None:
    # 4 uniform parts per order; skewed adds hot part 777 to 20% of baskets
    orders = np.repeat(np.arange(1, N_ORDERS + 1, dtype=np.int64), 4)
    parts = rng.integers(1, N_PARTS + 1, 4 * N_ORDERS)
    if skewed:
        hot_orders = rng.choice(
            N_ORDERS, int(N_ORDERS * HOT_SHARE), replace=False
        ) + 1
        orders = np.concatenate([orders, hot_orders.astype(np.int64)])
        parts = np.concatenate(
            [parts, np.full(len(hot_orders), 777, dtype=parts.dtype)]
        )
    pdf = pd.DataFrame({"l_orderkey": orders, "l_partkey": parts})
    _write(pdf, path)


def generate(variant: str, seed: int) -> str:
    d = f"{BASE}/{variant}/sf1"
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(seed)
    skewed = variant == "skew"
    _gen_events(rng, skewed, f"{d}/events.parquet")
    _gen_documents(rng, skewed, f"{d}/documents.parquet")
    _gen_embeddings(rng, skewed, f"{d}/embeddings.parquet")
    _gen_lineitem(rng, skewed, f"{d}/lineitem.parquet")
    for t in ("region", "nation", "customer", "supplier", "part", "orders"):
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{d}/{t}.parquet")
    return d


def partition_histogram(spark, sf_dir: str, table: str, key: str) -> dict:
    """Rows per hash partition when shuffling `table` on `key` into 32
    partitions — the distribution an executor fleet would actually see."""
    import pyspark.sql.functions as F

    from swallow_spark.io import load

    df = load(spark, sf_dir, table).repartition(32, key)
    counts = sorted(
        r.n
        for r in df.groupBy(F.spark_partition_id().alias("p"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    return {
        "min": counts[0],
        "p50": counts[len(counts) // 2],
        "max": counts[-1],
        "max_share": round(counts[-1] / sum(counts), 3),
    }


ANN_KEYS = (
    "vec_ann_ivf_portable",
    "vec_ann_ivfpq_portable",
    # round 10: the batch-probe key whose conditional salting FIRES on the
    # hotcell variant (cell 0 ~25% > the 10% threshold) and not on uniform
    "vec_ann_ivf_batch_rescore",
)


def _gen_embeddings_ann(rng, hot: bool, path: str) -> dict:
    """ANN hot-cell corpus (round 10, VERDICT r9 item 4): `hot` plants 20%
    of vectors (INCLUDING the probe ids 1..9, so the probes route there)
    in a tight cluster around frozen IVF centroid 0 — the one-hot-
    inverted-list shape a clustered production corpus presents; `uniform`
    is the standard-normal control. Returns the nearest-frozen-centroid
    cell histogram so the measured hot share is recorded, not assumed."""
    from swallow_spark.queries.ivf_frozen import IVF_CENTROIDS

    c0 = np.asarray(IVF_CENTROIDS[0], dtype=np.float64) / 10_000.0
    vecs = rng.standard_normal((N_VECS, 64))
    if hot:
        n_hot = int(N_VECS * HOT_SHARE)
        hot_idx = np.concatenate(
            [np.arange(9), 9 + rng.choice(N_VECS - 9, n_hot - 9, replace=False)]
        )
        vecs[hot_idx] = c0[None, :] + 0.05 * rng.standard_normal((n_hot, 64))
    q = np.floor(vecs * 10_000 + 0.5).astype(np.int64)
    ic = np.asarray(IVF_CENTROIDS, dtype=np.int64)
    d2 = ((q[:, None, :] - ic[None, :, :]) ** 2).sum(axis=2)
    cells = d2.argmin(axis=1)
    counts = np.bincount(cells, minlength=len(ic))
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(1, N_VECS + 1, dtype=np.int64),
            "embedding": list(vecs.astype(np.float32)),
            "label": rng.integers(0, 51, N_VECS).astype(np.int32),
        }
    )
    _write(pdf, path)
    return {
        "max_cell_share": round(counts.max() / N_VECS, 3),
        "hot_cell": int(counts.argmax()),
        "cells_nonempty": int((counts > 0).sum()),
    }


def ann_main(scale: int, keep: bool) -> None:
    """--ann mode: hot-IVF-cell vs uniform embeddings, ANN keys only
    (--keys also filters this list)."""
    from swallow_spark.registry import all_queries
    from swallow_spark.session import get_spark

    global ANN_KEYS
    if "--keys" in sys.argv:
        wanted = set(sys.argv[sys.argv.index("--keys") + 1].split(","))
        unknown = wanted - set(ANN_KEYS)
        if unknown:
            raise SystemExit(f"unknown ann keys: {sorted(unknown)}")
        ANN_KEYS = tuple(k for k in ANN_KEYS if k in wanted)
    spark = get_spark("swallow_skew_stress_ann")
    qs = all_queries()
    out: dict = {"mode": "ann_hotcell", "n_vecs": N_VECS,
                 "hot_share": HOT_SHARE, "scale": scale, "variants": {}}
    try:
        for variant, hot in (("uniform", False), ("hotcell", True)):
            d = f"{BASE}/ann_{variant}/sf1"
            os.makedirs(d, exist_ok=True)
            rng = np.random.default_rng(11)
            cellinfo = _gen_embeddings_ann(rng, hot, f"{d}/embeddings.parquet")
            for t in ("region", "nation", "customer", "supplier", "part",
                      "orders", "lineitem", "events", "documents"):
                shutil.copyfile(f"{SRC}/{t}.parquet", f"{d}/{t}.parquet")
            v: dict = {"timings": {}, "cells": cellinfo}
            print(f"{variant} cells: {cellinfo}", file=sys.stderr)
            for name in ANN_KEYS:
                fn = qs[name].fn
                fn(spark, d).write.format("noop").mode("overwrite").save()  # warm
                runs = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    fn(spark, d).write.format("noop").mode("overwrite").save()
                    runs.append(time.perf_counter() - t0)
                v["timings"][name] = round(sorted(runs)[1], 3)
                print(f"{variant} {name}: {v['timings'][name]}s", file=sys.stderr)
            out["variants"][variant] = v
        for name in ANN_KEYS:
            u = out["variants"]["uniform"]["timings"][name]
            s = out["variants"]["hotcell"]["timings"][name]
            out.setdefault("skew_amplification", {})[name] = round(s / u, 2)
    finally:
        if not keep:
            shutil.rmtree(BASE, ignore_errors=True)
    print(json.dumps(out))


# Round 12 (VERDICT r11 item 8): the user-proportional SMJs the r11 audit
# DELIBERATELY kept (a shuffled-hash build side there is the OOM shape).
# "SMJ is the spill-safe choice" was asserted, not measured — this mode
# plants the hot-key pathology each key could actually meet and records
# skew amplification, same format as the r9/r10 tables.
SMJ_KEYS = (
    # orders-keyed full outers: hot = one business key (778 — not %5/%7,
    # so it survives both snapshot filters) duplicated HOT_DUP times on
    # both sides -> a dup²-row single-key join output in ONE partition
    # (AQE skew-split does not apply to full outer). The bad-load /
    # repeated-upsert CDC pathology.
    "etl_snapshot_diff",
    # rich×big full outer: `big` is DISTINCT o_custkey and rich custkeys
    # are unique, so both sides are key-unique BY CONSTRUCTION — run it
    # on the same skewed orders to show the distinct absorbs the hot key.
    "join_full_outer",
    # documents: hot = 20% of the increment replicas are byte-identical
    # copies of one base doc (re-upload storm) -> one hot md5 join key +
    # one hot inc-side posting set.
    "etl_incremental_dedup",
    "text_language_mix",
)
SMJ_MULT = 10
HOT_DUP = 2000


def _gen_orders_scaled(hot: bool, path: str) -> None:
    import duckdb

    base = duckdb.connect().execute(
        f"SELECT * FROM read_parquet('{SRC}/orders.parquet')"
    ).df()
    parts = []
    for k in range(SMJ_MULT):
        r = base.copy()
        if k:
            r["o_orderkey"] = r["o_orderkey"] + k * 150_000
            r["o_custkey"] = r["o_custkey"] + k * 15_000
        parts.append(r)
    pdf = pd.concat(parts, ignore_index=True)
    if hot:
        hot_row = pdf[pdf["o_orderkey"] == 778]
        pdf = pd.concat([pdf] + [hot_row] * HOT_DUP, ignore_index=True)
    _write(pdf, path)


def _gen_documents_scaled(hot: bool, path: str) -> None:
    import duckdb

    base = duckdb.connect().execute(
        f"SELECT * FROM read_parquet('{SRC}/documents.parquet')"
    ).df()
    hot_text = base.loc[base["doc_id"] == 1, "text"].iloc[0]
    parts = [base]
    for k in range(1, SMJ_MULT):
        r = base.copy()
        r["doc_id"] = r["doc_id"] + k * 5_000
        if hot and k >= SMJ_MULT - 2:
            # top-20% doc_ids = increment side of the 50% split: every doc
            # an exact copy of base doc 1 (hot md5 + hot posting set + one
            # hot lang for the language keys)
            r["text"] = hot_text
            r["lang"] = "en"
            r["n_chars"] = len(hot_text)
        else:
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
    _write(pd.concat(parts, ignore_index=True), path)


def smj_main(keep: bool) -> None:
    from swallow_spark.registry import all_queries
    from swallow_spark.session import get_spark

    keys = SMJ_KEYS
    if "--keys" in sys.argv:
        wanted = set(sys.argv[sys.argv.index("--keys") + 1].split(","))
        unknown = wanted - set(SMJ_KEYS)
        if unknown:
            raise SystemExit(f"unknown smj keys: {sorted(unknown)}")
        keys = tuple(k for k in SMJ_KEYS if k in wanted)
    spark = get_spark("swallow_skew_stress_smj")
    qs = all_queries()
    out: dict = {"mode": "smj_hotkey", "mult": SMJ_MULT, "hot_dup": HOT_DUP,
                 "variants": {}}
    try:
        for variant, hot in (("uniform", False), ("hot", True)):
            d = f"{BASE}/smj_{variant}/sf1"
            os.makedirs(d, exist_ok=True)
            _gen_orders_scaled(hot, f"{d}/orders.parquet")
            _gen_documents_scaled(hot, f"{d}/documents.parquet")
            for t in ("region", "nation", "customer", "supplier", "part",
                      "lineitem", "events", "embeddings"):
                shutil.copyfile(f"{SRC}/{t}.parquet", f"{d}/{t}.parquet")
            v: dict = {"timings": {}}
            v["orders_hist"] = partition_histogram(spark, d, "orders", "o_orderkey")
            for name in keys:
                fn = qs[name].fn
                fn(spark, d).write.format("noop").mode("overwrite").save()  # warm
                runs = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    fn(spark, d).write.format("noop").mode("overwrite").save()
                    runs.append(time.perf_counter() - t0)
                v["timings"][name] = round(sorted(runs)[1], 3)
                print(f"{variant} {name}: {v['timings'][name]}s", file=sys.stderr)
            out["variants"][variant] = v
        for name in keys:
            u = out["variants"]["uniform"]["timings"][name]
            s = out["variants"]["hot"]["timings"][name]
            out.setdefault("skew_amplification", {})[name] = round(s / u, 2)
    finally:
        if not keep:
            shutil.rmtree(BASE, ignore_errors=True)
    print(json.dumps(out))


def main() -> None:
    from swallow_spark.registry import all_queries
    from swallow_spark.session import get_spark

    keep = "--keep" in sys.argv
    if "--smj" in sys.argv:
        smj_main(keep)
        return
    if "--ann" in sys.argv:
        scale = 1
        if "--scale" in sys.argv:
            scale = int(sys.argv[sys.argv.index("--scale") + 1])
            apply_scale(scale)
        ann_main(scale, keep)
        return
    scale = 1
    if "--scale" in sys.argv:
        scale = int(sys.argv[sys.argv.index("--scale") + 1])
        apply_scale(scale)
    keys = KEYS
    if "--keys" in sys.argv:
        wanted = set(sys.argv[sys.argv.index("--keys") + 1].split(","))
        unknown = wanted - {k for k, *_ in KEYS}
        if unknown:
            raise SystemExit(f"unknown keys: {sorted(unknown)}")
        keys = [k for k in KEYS if k[0] in wanted]
    spark = get_spark("swallow_skew_stress")
    qs = all_queries()
    out: dict = {"n_events": N_EVENTS, "n_docs": N_DOCS, "n_vecs": N_VECS,
                 "lineitem_rows": 4 * N_ORDERS, "hot_share": HOT_SHARE,
                 "scale": scale, "variants": {}}
    try:
        for variant in ("uniform", "skew"):
            d = generate(variant, seed=7)
            v: dict = {"timings": {}, "histograms": {}}
            for table, key in {("events", "user_id"), ("embeddings", "label")}:
                v["histograms"][f"{table}:{key}"] = partition_histogram(
                    spark, d, table, key
                )
            for name, _table, _key in keys:
                fn = qs[name].fn
                fn(spark, d).write.format("noop").mode("overwrite").save()  # warm
                runs = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    fn(spark, d).write.format("noop").mode("overwrite").save()
                    runs.append(time.perf_counter() - t0)
                v["timings"][name] = round(sorted(runs)[1], 3)
                print(f"{variant} {name}: {v['timings'][name]}s", file=sys.stderr)
            out["variants"][variant] = v
        for name, *_ in keys:
            u = out["variants"]["uniform"]["timings"][name]
            s = out["variants"]["skew"]["timings"][name]
            out.setdefault("skew_amplification", {})[name] = round(s / u, 2)
    finally:
        if not keep:
            shutil.rmtree(BASE, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
