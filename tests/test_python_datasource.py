"""Unit tests for the swallow_jsonl Python DataSource (custom connector)."""

from __future__ import annotations

from pyspark.sql import types as T


def test_skip_bad_lines(spark, tmp_path):
    from swallow_spark.sources.jsonl_source import register

    register(spark)
    p = tmp_path / "data"
    p.mkdir()
    (p / "a.jsonl").write_text(
        '{"id": 1, "name": "ok"}\n'
        "garbage line\n"
        '{"id": 2, "name": "fine"}\n'
    )
    (p / "b.jsonl").write_text('{"id": 3, "name": "also"}\n{"broken\n')
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("name", T.StringType())]
    )
    df = (
        spark.read.format("swallow_jsonl")
        .schema(schema)
        .option("path", str(p))
        .load()
    )
    assert sorted(r.id for r in df.collect()) == [1, 2, 3]
    # per-file partitioning: two files → two input partitions
    assert df.rdd.getNumPartitions() == 2


def test_writer_commit_marker_and_roundtrip(spark, tmp_path):
    from swallow_spark.sources.jsonl_source import register

    register(spark)
    src = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, name string"
    ).repartition(2)
    out = str(tmp_path / "out")
    src.write.format("swallow_jsonl").mode("overwrite").option("path", out).save()
    marker = (tmp_path / "out" / "_SUCCESS").read_text()
    assert marker == "3"
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("name", T.StringType())]
    )
    back = (
        spark.read.format("swallow_jsonl").schema(schema).option("path", out).load()
    )
    assert sorted((r.id, r.name) for r in back.collect()) == [(1, "a"), (2, "b"), (3, "c")]


def test_event_stream_replay_contract():
    """The streaming source's exactly-once contract: readBetweenOffsets
    must regenerate ANY committed range bit-identically to what read()
    originally returned — the invariant a broker adapter must honor."""
    from swallow_spark.sources.event_stream_source import build_datasource

    ds_cls = build_datasource()
    ds = ds_cls(options={})
    reader = ds.simpleStreamReader(ds.schema())
    start = reader.initialOffset()
    seen = []
    offs = [start]
    while True:
        it, nxt = reader.read(offs[-1])
        rows = list(it)
        if not rows:
            break
        seen.append(rows)
        offs.append(nxt)
    assert sum(len(r) for r in seen) == 300
    for i, rows in enumerate(seen):
        replay = list(reader.readBetweenOffsets(offs[i], offs[i + 1]))
        assert replay == rows


def test_event_stream_demo_runs(spark):
    from swallow_spark.registry import all_queries

    df = all_queries()["stream_python_datasource_demo"].fn(
        spark, "/root/testdata/sf0.001"
    )
    assert df.count() == 7  # one row per user_id mod 7


def test_stream_sink_demo_runs(spark):
    from swallow_spark.registry import all_queries

    df = all_queries()["stream_python_sink_demo"].fn(spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert sum(r.n_rows for r in rows) == 300
    assert all(r.batch.startswith("batch-") for r in rows)


def test_committed_mode_ignores_orphans_and_unsealed(spark, tmp_path):
    """Exactly-once READ side: mode=committed must see only files listed in
    a sealed batch's manifest — orphan task files from a crashed pre-commit
    attempt and entire unsealed batch dirs are invisible."""
    import json

    from swallow_spark.sources.jsonl_source import register

    register(spark)
    sink = tmp_path / "sink"
    b0 = sink / "batch-0"
    b0.mkdir(parents=True)
    (b0 / "task-0.jsonl").write_text('{"id": 1}\n{"id": 2}\n')
    # orphan from a crashed attempt: present on disk, absent from manifest
    (b0 / "task-9.jsonl").write_text('{"id": 99}\n')
    (b0 / "_COMMITTED").write_text(json.dumps({"n": 2, "files": {"task-0.jsonl": 2}}))
    # unsealed batch: has data but no marker → entirely invisible
    b1 = sink / "batch-1"
    b1.mkdir()
    (b1 / "task-0.jsonl").write_text('{"id": 50}\n')
    back = (
        spark.read.format("swallow_jsonl")
        .schema("id long")
        .option("path", str(sink))
        .option("mode", "committed")
        .load()
    )
    assert sorted(r.id for r in back.collect()) == [1, 2]


def test_stream_task_files_deterministic(spark, tmp_path):
    """Replay safety: streaming task files are named task-<partitionId>, so
    a re-run of a failed epoch overwrites rather than appending."""
    import json
    import os

    from swallow_spark.sources.event_stream_source import register as reg_stream
    from swallow_spark.sources.jsonl_source import register as reg_jsonl

    reg_stream(spark)
    reg_jsonl(spark)
    out = str(tmp_path / "sink")
    chk = str(tmp_path / "chk")
    feed = spark.readStream.format("swallow_eventstream").load()
    q = (
        feed.writeStream.format("swallow_jsonl")
        .option("path", out)
        .option("checkpointLocation", chk)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    batches = [b for b in sorted(os.listdir(out)) if b.startswith("batch-")]
    assert batches, "no batches written"
    for b in batches:
        bdir = os.path.join(out, b)
        files = sorted(f for f in os.listdir(bdir) if f.endswith(".jsonl"))
        # deterministic names with no uuid component
        assert all(f.startswith("task-") and f[5:-6].isdigit() for f in files), files
        manifest = json.loads(open(os.path.join(bdir, "_COMMITTED")).read())
        assert sorted(manifest["files"]) == files
        assert sum(manifest["files"].values()) == manifest["n"]


def test_stream_connector_roundtrip_key(spark):
    from swallow_spark.registry import all_queries

    df = all_queries()["stream_connector_roundtrip"].fn(spark, "/root/testdata/sf0.001")
    rows = {r.user_id: (r.n_events, r.total_cents) for r in df.collect()}
    want = {}
    for i in range(300):
        u = i % 7
        n, c = want.get(u, (0, 0))
        want[u] = (n + 1, c + (i * 37) % 1000)
    assert rows == want
