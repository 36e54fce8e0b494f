"""`swallow_eventstream` — a Spark 4 Python STREAMING DataSource: the
streaming half of the custom-connector surface (the batch half is
jsonl_source.py). A message-queue adapter analog that needs no broker:
the source generates a deterministic, replayable event feed from pure
offset arithmetic, so exactly-once recovery semantics are testable
offline — `readBetweenOffsets` regenerates any offset range bit-identically,
which is precisely the contract a Kafka-style adapter must honor.

Same pickling constraint as jsonl_source: classes are function-scoped so
cloudpickle ships them by value (the driver harness imports this repo by
file path; module-level classes would need swallow_spark importable on
executor workers).

Scale notes: SimpleDataSourceStreamReader reads on the driver and is the
right tool for low-volume control streams; a production adapter for a
partitioned broker implements DataSourceStreamReader.partitions() so each
executor task consumes one broker partition in parallel.
"""

from __future__ import annotations

ROWS_PER_BATCH = 100
MAX_ROWS = 300  # the feed is bounded so demos drain deterministically


def build_datasource():
    from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

    def _gen(lo: int, hi: int):
        # deterministic event i: user = i mod 7, integer-cent amount.
        # LIST ITERATOR, not a generator: the prefetching cache both
        # next()s and copy.copy()s the returned object — list iterators
        # support __reduce__ (copyable), generators do not.
        return iter([(i, i % 7, ((i * 37) % 1000) / 100.0) for i in range(lo, hi)])

    class EventStreamReader(SimpleDataSourceStreamReader):
        def __init__(self, options):
            self.rows_per_batch = int(options.get("rowsperbatch", ROWS_PER_BATCH))
            self.max_rows = int(options.get("maxrows", MAX_ROWS))

        def initialOffset(self):
            return {"offset": 0}

        def read(self, start):
            lo = start["offset"]
            hi = min(lo + self.rows_per_batch, self.max_rows)
            if hi <= lo:
                return iter([]), start
            return _gen(lo, hi), {"offset": hi}

        def readBetweenOffsets(self, start, end):
            # exactly-once replay: regenerate the range deterministically
            return _gen(start["offset"], end["offset"])

    class SwallowEventStream(DataSource):
        @classmethod
        def name(cls):
            return "swallow_eventstream"

        def schema(self):
            return "seq bigint, user_id bigint, amount double"

        def simpleStreamReader(self, schema):
            return EventStreamReader(self.options)

    return SwallowEventStream


def register(spark) -> None:
    spark.dataSource.register(build_datasource())
