"""`swallow_jsonl` — a Spark 4 Python DataSource reading/writing
line-delimited JSON with per-file partitioning and skip-bad-record
semantics.

This is the modern Spark form of a swallow reader/writer adapter: implement
partitions() + read() (and write()/commit()) in pure Python, register once,
and the source becomes a first-class `spark.read.format("swallow_jsonl")` —
executors call read() in parallel, one task per InputPartition, and
everything downstream is ordinary Catalyst.

IMPORTANT pickling constraint: the DataSource classes are defined INSIDE
build_datasource() so cloudpickle serializes them BY VALUE. Defined at
module level they would pickle by reference and every executor worker would
need `swallow_spark` importable on ITS sys.path — which is not true when the
driver imports this repo by file path (the driver harness does exactly
that). Function-scoped classes ship self-contained to the workers.

Scale notes: partitions are per-file (a directory of N files → N parallel
tasks); a production version would split large files by byte ranges exactly
like the builtin text source. Bad lines are skipped rather than failing the
job — the reference's skip-bad-document behavior.
"""

from __future__ import annotations


def build_datasource():
    """Create the DataSource class (function-scoped → pickled by value)."""
    import datetime as dt
    import json
    import os
    import shutil
    import uuid

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        DataSourceWriter,
        InputPartition,
        WriterCommitMessage,
    )

    class _FilePartition(InputPartition):
        def __init__(self, path: str):
            self.path = path

    class SwallowJsonlReader(DataSourceReader):
        def __init__(self, options, schema):
            self.path = options.get("path")
            self.skip_bad = options.get("skip_bad", "true").lower() == "true"
            # mode=committed: path is a STREAMING-SINK output dir; trust only
            # the files enumerated in each sealed batch's _COMMITTED marker
            # (exactly-once read side of the connector pair — orphan task
            # files from a crashed pre-commit attempt are never visible).
            self.committed_only = options.get("mode", "").lower() == "committed"
            self.fields = [f.name for f in schema.fields]

        def partitions(self):
            if self.committed_only:
                files = []
                for b in sorted(os.listdir(self.path)):
                    bdir = os.path.join(self.path, b)
                    marker = os.path.join(bdir, "_COMMITTED")
                    if not (b.startswith("batch-") and os.path.exists(marker)):
                        continue  # unsealed / foreign dir: invisible
                    with open(marker, encoding="utf-8") as fh:
                        manifest = json.load(fh)
                    files += [os.path.join(bdir, f) for f in sorted(manifest["files"])]
                return [_FilePartition(p) for p in files]
            if os.path.isdir(self.path):
                files = sorted(
                    os.path.join(self.path, f)
                    for f in os.listdir(self.path)
                    if f.endswith((".json", ".jsonl")) or f.startswith("part-")
                )
            else:
                files = [self.path]
            return [_FilePartition(p) for p in files]

        def read(self, partition):
            with open(partition.path, encoding="utf-8") as fh:
                for line in fh:
                    line = line.strip()
                    if not line:
                        continue
                    try:
                        doc = json.loads(line)
                    except json.JSONDecodeError:
                        if self.skip_bad:
                            continue
                        raise
                    yield tuple(doc.get(f) for f in self.fields)

    class _Committed(WriterCommitMessage):
        def __init__(self, path: str, n: int):
            self.path = path
            self.n = n

    class SwallowJsonlWriter(DataSourceWriter):
        """Per-partition jsonl writer (bulk-writer adapter analog): each task
        streams its rows to a task file; commit writes the success marker.
        Timestamps/dates are ISO-formatted (lossless for naive fixtures)."""

        def __init__(self, options, schema):
            self.path = options.get("path")
            self.fields = [f.name for f in schema.fields]

        def write(self, rows):
            os.makedirs(self.path, exist_ok=True)
            out = os.path.join(self.path, f"task-{uuid.uuid4().hex}.jsonl")
            n = 0
            with open(out, "w", encoding="utf-8") as fh:
                for row in rows:
                    doc = {}
                    for f in self.fields:
                        v = row[f]
                        if isinstance(v, dt.datetime):
                            v = v.isoformat(sep=" ")
                        elif isinstance(v, dt.date):
                            v = v.isoformat()
                        doc[f] = v
                    fh.write(json.dumps(doc) + "\n")
                    n += 1
            return _Committed(out, n)

        def commit(self, messages):
            with open(os.path.join(self.path, "_SUCCESS"), "w") as fh:
                fh.write(str(sum(m.n for m in messages)))

        def abort(self, messages):
            for m in messages:
                if m is not None and os.path.exists(m.path):
                    os.remove(m.path)

    from pyspark.sql.datasource import DataSourceStreamWriter

    class SwallowJsonlStreamWriter(DataSourceStreamWriter):
        """STREAMING sink half of the connector (bulk-indexer adapter
        analog): every micro-batch's tasks write task files under
        batch-<epochId>/, and commit() seals the batch with a JSON
        manifest marker recording the EXACT task filenames and their row
        counts. Exactly-once on replay is guaranteed twice over:
        (a) task files are named deterministically task-<partitionId>.jsonl,
        so a replayed epoch OVERWRITES its own files rather than appending
        beside orphans from a crashed attempt, and (b) readers trust only
        files enumerated in the manifest, so even a foreign stray file in
        the batch dir is invisible — the same protocol an ES-bulk /
        object-store streaming sink uses (marker-manifest commit)."""

        def __init__(self, options, schema):
            self.path = options.get("path")
            self.fields = [f.name for f in schema.fields]

        def write(self, rows):
            # executed per task; epoch id arrives via the TaskContext
            from pyspark import TaskContext

            ctx = TaskContext.get()
            epoch = ctx.getLocalProperty("streaming.sql.batchId")
            bdir = os.path.join(self.path, f"batch-{epoch}")
            os.makedirs(bdir, exist_ok=True)
            # deterministic per-task name: a replayed epoch overwrites, so a
            # crash-before-commit can never inflate the sealed batch
            out = os.path.join(bdir, f"task-{ctx.partitionId()}.jsonl")
            tmp = out + f".inprogress-{uuid.uuid4().hex}"
            n = 0
            with open(tmp, "w", encoding="utf-8") as fh:
                for row in rows:
                    doc = {}
                    for f in self.fields:
                        v = row[f]
                        if isinstance(v, dt.datetime):
                            v = v.isoformat(sep=" ")
                        elif isinstance(v, dt.date):
                            v = v.isoformat()
                        doc[f] = v
                    fh.write(json.dumps(doc) + "\n")
                    n += 1
            os.replace(tmp, out)  # atomic publish: no torn task files
            return _Committed(out, n)

        def commit(self, messages, batchId):
            bdir = os.path.join(self.path, f"batch-{batchId}")
            os.makedirs(bdir, exist_ok=True)
            manifest = {
                "n": sum(m.n for m in messages),
                "files": {os.path.basename(m.path): m.n for m in messages},
            }
            tmp = os.path.join(bdir, f"_COMMITTED.tmp-{uuid.uuid4().hex}")
            with open(tmp, "w", encoding="utf-8") as fh:
                json.dump(manifest, fh)
            os.replace(tmp, os.path.join(bdir, "_COMMITTED"))

        def abort(self, messages, batchId):
            for m in messages:
                if m is not None and os.path.exists(m.path):
                    os.remove(m.path)

    class SwallowJsonlDataSource(DataSource):
        """spark.read.format("swallow_jsonl").schema(s).option("path", p) /
        df.write.format("swallow_jsonl").option("path", p) /
        df.writeStream.format("swallow_jsonl").option("path", p)"""

        @classmethod
        def name(cls) -> str:
            return "swallow_jsonl"

        def reader(self, schema):
            return SwallowJsonlReader(self.options, schema)

        def writer(self, schema, overwrite):
            path = self.options.get("path")
            if overwrite and path and os.path.isdir(path):
                shutil.rmtree(path, ignore_errors=True)
            return SwallowJsonlWriter(self.options, schema)

        def streamWriter(self, schema, overwrite):
            return SwallowJsonlStreamWriter(self.options, schema)

    return SwallowJsonlDataSource


def register(spark) -> None:
    spark.dataSource.register(build_datasource())
