"""Training-loader shard materialization on swallow_spark: template-level
dedup → readability-band gate → FULL deterministic epoch shuffle written as
shard files whose on-disk order IS the training order.

The declared key training_epoch_shuffle pins the first-20 positions of the
shuffle order against a DuckDB oracle; this example runs the production
shape of the same verb: instead of a top-k window, the whole epoch order
materializes with ONE shuffle — repartition(N, h) + sortWithinPartitions
(h, doc_id) — so shard files come out pre-shuffled and a trainer streams
them sequentially. No global sort, no driver collection, any cluster size
produces byte-identical shards.

Run: python examples/epoch_loader_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from swallow_spark.io import load
from swallow_spark.session import get_spark

N_SHARDS = 8
EPOCH = 0


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark("epoch_loader_example")
    docs = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())

    # 1. template-level dedup (the text_template_groups verb inline):
    #    survivors = min doc_id per digit-masked template
    tpl = docs.withColumn(
        "tpl_hash",
        F.xxhash64(F.regexp_replace(F.lower(F.col("text")), "[0-9]+", "#")),
    )
    survivors = (
        tpl.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("tpl_hash").orderBy("doc_id")
            ),
        )
        .filter(F.col("rk") == 1)
        .drop("rk", "tpl_hash")
    )

    # 2. readability-band gate (the text_readability_fk verb inline):
    #    keep docs whose FK grade is defined and not degenerate
    n_words = F.size(F.split(F.col("text"), " ")).cast("double")
    n_sent = F.greatest(F.regexp_count(F.col("text"), F.lit("[.!?]+")), F.lit(1)).cast(
        "double"
    )
    n_syl = F.regexp_count(F.lower(F.col("text")), F.lit("[aeiouy]+")).cast("double")
    graded = survivors.withColumn(
        "fk",
        0.39 * (n_words / n_sent) + 11.8 * (n_syl / n_words) - 15.59,
    ).filter(F.col("fk") < 60)  # drop pathological outliers only

    # 3. FULL epoch shuffle: hash order key, ONE shuffle materializes the
    #    epoch's training order as N pre-shuffled shards
    shuffled = (
        graded.withColumn(
            "h",
            (F.col("doc_id") * F.lit(2654435761) + F.lit(EPOCH) * 97)
            % F.lit(1000000007),
        )
        .repartition(N_SHARDS, "h")
        .sortWithinPartitions("h", "doc_id")
    )

    out = f"/tmp/swallow_spark_io/epoch_shards/epoch={EPOCH}"
    shuffled.select("doc_id", "text", "lang", "h").write.mode("overwrite").parquet(out)

    back = spark.read.parquet(out)
    n_in, n_out = graded.count(), back.count()
    print(f"docs in: {n_in}  shard rows out: {n_out}  shards: {N_SHARDS}")
    assert n_in == n_out
    # order check inside one shard: h must be nondecreasing per file
    one = (
        back.withColumn("f", F.col("_metadata.file_name"))
        .withColumn(
            "prev_h",
            F.lag("h").over(
                Window.partitionBy("f").orderBy(F.monotonically_increasing_id())
            ),
        )
        .filter(F.col("prev_h").isNotNull() & (F.col("h") < F.col("prev_h")))
    )
    assert one.count() == 0, "shard files must be internally h-ordered"
    print("epoch shards verified: deterministic order, all docs present")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
