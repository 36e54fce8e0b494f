"""Benchmark runner (driver contract, SURVEY.md §6).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from swallow_spark.registry import declared_queries
from swallow_spark.session import get_spark

# Headline set: one representative per operator family, weighted toward the
# shuffle/join/window-heavy paths that dominate at scale, plus the LLM-data
# operators (dedup / similarity / text) that are this engine's raison d'être.
HEADLINE = [
    "agg_pricing_summary",
    "join_multiway_star",
    "join_broadcast",
    "join_inner_hash",
    "agg_count_distinct",
    "win_row_number_topk",
    "win_lag_lead",
    "win_running_sum",
    "agg_rollup",
    "set_union_distinct",
    "limit_topn",
    "filter_compound",
    "project_compute",
    "stream_session_batch",
    "dedup_exact",
    "dedup_near_exact_jaccard",
    "dedup_minhash_lsh",
    "sim_cosine_topk",
    "sim_pairs_threshold",
    "text_tokenize_counts",
    "text_tfidf_topk",
    "text_fingerprint",
    "udf_pandas_scalar",
    "q8_market_share",
    "q18_large_volume_customer",
    "q21_suppliers_kept_waiting",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark("swallow_spark_bench", cpus=cpus)
    qs = declared_queries()
    names = [n for n in HEADLINE if n in qs]
    def run_once(name: str) -> float:
        # noop sink: full executor-side materialization without driver
        # transfer, so we time the query, not py4j row serialization.
        t0 = time.perf_counter()
        qs[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    run_once("limit_topn")  # warm the JVM + parquet footers

    # BASELINE.md protocol: warm-up + median of 3 timed runs per key.
    # Per-key fault isolation: one crashing query must not zero out the
    # whole bench record (round 2 lost its BENCH to a single load error).
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench:{name}")
        try:
            runs = sorted(run_once(name) for _ in range(3))
            timings[name] = round(runs[1], 3)
        except Exception as e:  # noqa: BLE001 — record and continue
            errors[name] = f"{type(e).__name__}: {e}"[:300]
    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))


if __name__ == "__main__":
    main()
