"""End-to-end LLM training-corpus preparation on swallow_spark: dedup →
quality filter → language rebalance → deterministic split → sharded output.

Each stage is a registered, oracle-verified operator (COVERAGE.md); this
example chains them the way a 100 TB corpus run would, writing train/test
shards partitioned by split.

Run: python examples/training_corpus_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from swallow_spark.registry import all_queries
from swallow_spark.session import get_spark


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark("training_corpus_example")
    qs = all_queries()

    cleaned = qs["training_data_clean"].fn(spark, sf_dir)  # dedup + quality
    sampled = qs["sample_stratified"].fn(spark, sf_dir)  # language rebalance
    # IMPORTANT: the split hash must be INDEPENDENT of the sampling hash —
    # reusing the same slots would make the test split empty by construction
    # (every sampled doc already has a low slot). Different multiplier = an
    # independent deterministic hash.
    split_slot = F.pmod(
        F.pmod(F.pmod(F.col("doc_id"), F.lit(1000003)) * F.lit(1103515245), F.lit(1000003)),
        F.lit(1000),
    )
    split = (
        cleaned.join(sampled.select("doc_id"), "doc_id")  # keep rebalanced set
        .withColumn("split", F.when(split_slot < 900, "train").otherwise("test"))
    )
    out = "/tmp/swallow_spark_io/example/corpus"
    split.write.mode("overwrite").partitionBy("split").parquet(out)
    stats = spark.read.parquet(out).groupBy("split").count().collect()
    print({r.split: r["count"] for r in stats})


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
