"""Quiet-box per-key bench regression gate (round 8, VERDICT r7 item 2).

Two consecutive driver benches ran under CPU contention, so cross-round
totals stopped being attributable. This gate makes regressions visible
WITHOUT a quiet driver bench: each headline/extended key's warm median must
stay within TOLERANCE of the recorded quiet baseline
(tests/golden/bench_quiet_baseline.json, written by tools/bench_baseline.py
— which refuses to record on a contended box).

The whole module SKIPS when the box is currently contended (spin > 1.25×
reference) — a loaded box would flag phantom regressions — or when no
baseline has been recorded yet.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402

BASELINE_PATH = Path(__file__).parent / "golden/bench_quiet_baseline.json"
TOLERANCE = 1.5  # warm median may drift this much before the gate fails


def _baseline():
    if not BASELINE_PATH.exists():
        pytest.skip("no quiet baseline recorded (run tools/bench_baseline.py)")
    return json.loads(BASELINE_PATH.read_text())


@pytest.fixture(scope="module")
def quiet_box():
    sp = bench.spin_sec()
    if sp > bench.SPIN_REF_SEC * (1 + bench.SPIN_TOL):
        pytest.skip(f"box contended (spin {sp}) — gate meaningless under load")
    return sp


@pytest.fixture(scope="module")
def warm(spark):
    """Warm the JVM, parquet cache, and Python worker pool once."""
    base = _baseline()
    from swallow_spark.registry import declared_queries

    qs = declared_queries()
    sf_dir = base["sf_dir"]

    def run_once(name: str) -> float:
        t0 = time.perf_counter()
        qs[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    run_once("limit_topn")
    return base, qs, run_once


@pytest.mark.parametrize("name", bench.HEADLINE + bench.EXTENDED)
def test_key_within_quiet_baseline(name, quiet_box, warm):
    base, qs, run_once = warm
    if name not in base["medians"]:
        pytest.skip(f"{name} not in recorded baseline")
    if name not in qs:
        pytest.fail(f"benched key {name} disappeared from the registry")
    run_once(name)  # warm-up, unrecorded
    median = sorted(run_once(name) for _ in range(3))[1]
    limit = base["medians"][name] * TOLERANCE
    assert median <= limit, (
        f"{name}: warm median {median:.3f}s exceeds {TOLERANCE}× quiet "
        f"baseline {base['medians'][name]}s — investigate before shipping "
        f"(or re-record via tools/bench_baseline.py if the speedup/slowdown "
        f"is intentional and documented in BENCH.md)"
    )
