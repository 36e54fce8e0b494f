"""The canonical swallow workflow — bulk document reindexing — on
swallow_spark.

Reference shape (SURVEY.md §1.1): reader (document store) → per-record
process chain (clean/enrich/route) → bulk writer. Here: jsonl source via the
custom Python DataSource → declarative steps (+ an opaque per-record Python
step where truly needed) → partitioned sink. On a real deployment the source
line becomes spark.read.format("es"/"mongodb") and the sink a foreachBatch
bulk-indexer (demos/streaming shows the streaming variant) — everything in
between is unchanged.

Run: python examples/reindex_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from swallow_spark import schemas
from swallow_spark.io import load
from swallow_spark.pipeline import (
    Filter,
    ParquetSink,
    ParquetSource,
    Pipeline,
    Project,
    Quarantine,
    WithColumn,
)
from swallow_spark.session import get_spark
from swallow_spark.sources.jsonl_source import register as register_jsonl


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark("reindex_example")
    register_jsonl(spark)
    staging = "/tmp/swallow_spark_io/example/docs_in"
    out = "/tmp/swallow_spark_io/example/docs_indexed"
    quarantine = "/tmp/swallow_spark_io/example/docs_quarantine"

    # stage the "document store" as jsonl (stand-in for the ES scan source)
    load(spark, sf_dir, "documents").write.mode("overwrite").json(staging)

    class JsonlSource:
        def read(self, spark):
            return (
                spark.read.format("swallow_jsonl")
                .schema(schemas.documents)
                .option("path", staging)
                .load()
            )

    pipe = Pipeline(
        source=JsonlSource(),
        steps=[
            # validation: short docs are quarantined, not dropped silently
            Quarantine("n_chars >= 60", quarantine, reason="too_short"),
            Filter("n_chars >= 60"),
            # enrichment: language bucket + token count + content hash
            WithColumn("token_count", "size(split(text, ' '))"),
            WithColumn("content_hash", "md5(text)"),
            WithColumn("is_english", "cast(lang = 'en' as int)"),
            Project(
                [
                    "doc_id",
                    "lang",
                    "source",
                    "token_count",
                    "content_hash",
                    "is_english",
                ]
            ),
        ],
        sink=ParquetSink(out, partition_by=("lang",)),
    )
    result = pipe.run(spark)
    n_ok = spark.read.parquet(out).count()
    n_bad = spark.read.parquet(quarantine).count()
    print(f"indexed={n_ok} quarantined={n_bad} columns={result.columns}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
