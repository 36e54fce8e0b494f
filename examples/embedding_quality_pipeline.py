"""Embedding-corpus quality report on swallow_spark: semantic dedup →
label-noise audit → centroid drift → truncated-index recall — the checks
an embedding pipeline runs before (re)building a production ANN index.

Each stage is a registered, oracle- or reference-verified operator
(COVERAGE.md); this example chains them the way a 100 TB embedding store
run would and prints one summary line per check.

Run: python examples/embedding_quality_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from swallow_spark.registry import all_queries
from swallow_spark.session import get_spark


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark("embedding_quality_example")
    qs = all_queries()

    clusters = qs["dedup_semantic_clusters"].fn(spark, sf_dir)
    dup_rows = clusters.filter(F.col("is_survivor") == 0).count()
    print(f"semantic_dups={dup_rows}")

    noise = qs["vec_label_noise_knn"].fn(spark, sf_dir)
    suspects = noise.filter(F.col("suspect") == 1).count()
    print(f"label_suspects={suspects}")

    drift = qs["vec_centroid_drift"].fn(spark, sf_dir)
    worst = drift.orderBy(F.col("centroid_cos").asc()).first()
    print(f"worst_label_cos={worst['centroid_cos']}")

    recall = qs["vec_matryoshka_recall"].fn(spark, sf_dir)
    mean_recall = recall.agg(F.avg("recall_at_5")).first()[0]
    print(f"truncated_recall={mean_recall:.2f}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
