"""Unit tests for the generic ops library (inline DataFrames: nulls, ties,
empty groups, at-or-before asof ties)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from swallow_spark.ops.asof import asof_join_backward
from swallow_spark.ops.relational import dedup_keep_first, sessionize, topk_per_group
from swallow_spark.ops.text import shingles
from swallow_spark.ops.vectors import dot_units, l2_norm


def ts(s):
    return dt.datetime.fromisoformat(s)


def test_topk_per_group_ties(spark):
    df = spark.createDataFrame(
        [("a", 10, 1), ("a", 10, 2), ("a", 5, 3), ("b", 7, 4)],
        "g string, v int, id int",
    )
    out = topk_per_group(df, ["g"], [F.col("v").desc(), F.col("id")], 2)
    rows = {(r.g, r.id): r.rn for r in out.collect()}
    assert rows == {("a", 1): 1, ("a", 2): 2, ("b", 4): 1}


def test_dedup_keep_first_deterministic(spark):
    df = spark.createDataFrame(
        [("x", 2, "second"), ("x", 1, "first"), ("y", 9, "only")],
        "k string, ord int, tag string",
    )
    out = dedup_keep_first(df, ["k"], [F.col("ord")])
    assert {(r.k, r.tag) for r in out.collect()} == {("x", "first"), ("y", "only")}


def test_sessionize_gap_boundary(spark):
    # Spark's native session_window COALESCES per-event windows [t, t+gap)
    # that touch at the boundary, so an event arriving EXACTLY gap after the
    # previous one CONTINUES the session (strict '> gap' starts a new one) —
    # pinned by tests/test_session_window_properties.py against the engine.
    df = spark.createDataFrame(
        [
            (1, ts("2024-01-01T00:00:00")),
            (1, ts("2024-01-01T00:29:59")),
            (1, ts("2024-01-01T00:59:59")),  # gap vs prev = exactly 30:00 → SAME session
            (1, ts("2024-01-01T01:30:00")),  # gap 30:01 > gap → NEW session
            (2, ts("2024-01-01T00:00:00")),
        ],
        "user_id long, ts timestamp",
    )
    out = sessionize(df, "user_id", "ts", 30).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append((r.ts, r.session_id))
    u1 = sorted(by_user[1])
    assert u1[0][1] == 1 and u1[1][1] == 1  # 29:59 gap < 30 min → same session
    assert u1[2][1] == 1  # exactly 30:00 gap → session_window coalesces → same
    assert u1[3][1] == 2  # 30:01 gap → new session
    assert by_user[2][0][1] == 1


def test_asof_backward_with_tie(spark):
    left = spark.createDataFrame(
        [(1, ts("2024-01-01T00:10:00")), (1, ts("2024-01-01T00:20:00")), (2, ts("2024-01-01T00:05:00"))],
        "k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, ts("2024-01-01T00:10:00"), 100.0),  # exact tie: at-or-before includes it
            (1, ts("2024-01-01T00:15:00"), 200.0),
            (2, ts("2024-01-01T00:06:00"), 999.0),  # after left → never visible
        ],
        "k long, ts timestamp, v double",
    )
    out = asof_join_backward(left, right, on="k", ts="ts", value_cols=["v"])
    got = {(r.k, r.ts.isoformat()): r.v_asof for r in out.collect()}
    assert got[(1, "2024-01-01T00:10:00")] == 100.0  # tie → right wins
    assert got[(1, "2024-01-01T00:20:00")] == 200.0
    assert got[(2, "2024-01-01T00:05:00")] is None  # nothing at-or-before


def test_salted_join_matches_plain_join(spark):
    from swallow_spark.ops.relational import salted_join

    big = spark.createDataFrame(
        [(k, i) for i in range(200) for k in ("hot", "cold")[: 1 + i % 2]],
        "k string, v int",
    )
    small = spark.createDataFrame([("hot", 1), ("cold", 2)], "k string, w int")
    plain = big.join(small, "k").select("v", "w")
    salted = salted_join(big, small, "k", n_salts=8).select("v", "w")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_shingles_short_doc(spark):
    df = spark.createDataFrame([("a b c",), ("a b c d e f",)], "text string")
    out = df.select(shingles(F.col("text")).alias("s")).collect()
    assert out[0].s == ["a b c"]  # < k tokens → one truncated shingle
    assert out[1].s == ["a b c d e", "b c d e f"]


def test_vector_units_exact(spark):
    df = spark.createDataFrame([([1.0, 2.0, 2.0],)], "v array<float>")
    row = df.select(
        dot_units(F.col("v"), F.col("v")).alias("du"),
        l2_norm(F.col("v")).alias("n"),
    ).collect()[0]
    assert row.du == 900_000_000  # (1+4+4) * 1e8
    assert row.n == 3.0


def test_pipeline_explode_flatmap_repartition(spark):
    import pandas as pd

    from swallow_spark.pipeline import (
        Explode,
        Filter,
        FlatMapPandas,
        ParquetSource,
        Pipeline,
        Repartition,
    )

    def mark(batches):
        for pdf in batches:
            out = pdf[["doc_id", "token"]].copy()
            out["marked"] = "tok:" + out["token"]
            yield out

    pipe = Pipeline(
        source=ParquetSource("/root/testdata/sf0.001", "documents"),
        steps=[
            Filter("doc_id < 5"),
            Explode("split(text, ' ')", "token"),
            Repartition(4),
            FlatMapPandas(mark, "doc_id long, token string, marked string"),
        ],
    )
    df = pipe.to_df(spark)
    rows = df.collect()
    assert df.rdd.getNumPartitions() == 4
    assert all(r.marked == f"tok:{r.token}" for r in rows)
    assert len(rows) > 5  # exploded fan-out (swallow doc -> list[doc])


def test_pipeline_quarantine_routes_bad_rows(spark, tmp_path):
    from swallow_spark.pipeline import Filter, ParquetSource, Pipeline, Quarantine

    qpath = str(tmp_path / "quarantine")
    pipe = Pipeline(
        source=ParquetSource("/root/testdata/sf0.001", "customer"),
        steps=[
            Quarantine("c_acctbal >= 0", qpath, reason="negative_balance"),
            Filter("c_acctbal >= 0"),
        ],
    )
    good = pipe.run(spark)
    bad = spark.read.parquet(qpath)
    total = spark.read.parquet("/root/testdata/sf0.001/customer.parquet").count()
    assert good.count() + bad.count() == total
    assert bad.count() > 0
    assert bad.select("_quarantine_reason").distinct().collect()[0][0] == "negative_balance"
    assert good.filter("c_acctbal < 0").count() == 0


def test_pipeline_facade_runs(spark, tmp_path):
    from swallow_spark.pipeline import (
        Filter,
        ParquetSink,
        ParquetSource,
        Pipeline,
        Project,
    )

    pipe = Pipeline(
        source=ParquetSource("/root/testdata/sf0.001", "nation"),
        steps=[Filter("n_regionkey = 0"), Project(["n_nationkey", "n_name"])],
        sink=ParquetSink(str(tmp_path / "out")),
    )
    df = pipe.run(spark)
    assert df.columns == ["n_nationkey", "n_name"]
    back = spark.read.parquet(str(tmp_path / "out"))
    assert back.count() == df.count() > 0


def test_sample_sql_matches_spark_on_negative_keys(spark):
    """Sample.apply (Spark pmod) and Sample.sql (DuckDB %) must keep the
    SAME rows even for negative keys — DuckDB's % returns negative
    remainders, which the ((x % m + m) % m) spelling neutralizes."""
    import duckdb

    from swallow_spark.pipeline import Sample

    s = Sample(key="k", percent=30)
    keys = list(range(-500, 500))
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    spark_kept = sorted(r.k for r in s.apply(df).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES " + ",".join(f"({k})" for k in keys) + ") v(k)")
    duck_kept = sorted(r[0] for r in con.execute(f"SELECT k FROM t WHERE {s.sql()}").fetchall())
    assert spark_kept == duck_kept
    assert any(k < 0 for k in spark_kept)  # the sample actually spans negatives


def test_max_posting_caps_hot_shingle_fanout(spark):
    from swallow_spark.ops.dedup import shingle_jaccard_pairs

    # 12 docs share one hot 5-token shingle but are otherwise disjoint;
    # docs 100/101 are genuine near-dups sharing several rare shingles.
    hot = "alpha beta gamma delta epsilon"
    rows = [(i, f"{hot} filler{i}a filler{i}b filler{i}c filler{i}d") for i in range(12)]
    rows += [
        (100, "one two three four five six seven eight"),
        (101, "one two three four five six seven nine"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")

    capped, _ = shingle_jaccard_pairs(d, max_posting=5)
    got = {(r.d1, r.d2) for r in capped.select("d1", "d2").collect()}
    # hot-shingle pairs (12*11/2 = 66 of them) are pruned by the df-cap;
    # the rare-shingle near-dup pair survives
    assert got == {(100, 101)}

    uncapped, _ = shingle_jaccard_pairs(d, max_posting=None)
    n_uncapped = uncapped.count()
    assert n_uncapped == 66 + 1  # every hot pair + the near-dup pair

    # default cap (500) leaves fixture-scale postings untouched
    default, _ = shingle_jaccard_pairs(d)
    assert default.count() == n_uncapped
