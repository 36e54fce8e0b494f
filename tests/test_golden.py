"""Golden-output tests: Spark results for T1 keys vs frozen DuckDB outputs
at sf0.001 (regenerate with tools/make_golden.py)."""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from swallow_spark.registry import all_queries
from tools.oracle_diff import canon

GOLDEN = Path(__file__).parent / "golden"
KEYS = sorted(p.stem for p in GOLDEN.glob("*.json")) if GOLDEN.exists() else []


@pytest.mark.parametrize("key", KEYS)
def test_golden(key, spark):
    expected = json.loads((GOLDEN / f"{key}.json").read_text())
    df = all_queries()[key].fn(spark, "/root/testdata/sf0.001")
    cols = sorted(df.columns)
    assert cols == expected["columns"]
    rows = sorted([canon(r[c]) for c in cols] for r in df.collect())
    assert rows == [list(r) for r in expected["rows"]]
