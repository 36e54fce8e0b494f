#!/usr/bin/env bash
# End-of-round verification ritual (VERDICT r10 item 2, made executable).
#
# Run AFTER the last swallow_spark/ (query-code) commit of the round; only
# tests/docs commits may follow, or this script re-runs. Steps, in order
# (never concurrently — probe fixtures and io-roundtrip keys share
# /tmp/swallow_spark_* dirs):
#
#   1. full oracle parity, one uninterrupted run per SF (521+ keys each)
#   2. driver simulation from /tmp (vanilla non-UTC local[4], foreign cwd)
#   3. full pytest
#   4. bench at sf0.1 (the graded headline)
#   5. leak grep
#
# Usage: bash tools/round_ritual.sh [outdir]   (default /tmp/ritual_<ts>)
set -u
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/ritual_$(date +%s)}"
mkdir -p "$OUT"
echo "ritual output -> $OUT"
FAIL=0

for sf in sf0.001 sf0.01 sf0.1; do
  echo "== oracle sweep $sf"
  python tools/oracle_diff.py --sf "/root/testdata/$sf" --include-rows-only \
    >"$OUT/sweep_$sf.txt" 2>/dev/null
  tail -2 "$OUT/sweep_$sf.txt"
  grep -q " 0 failed" "$OUT/sweep_$sf.txt" || FAIL=1
done

echo "== driver simulation (/tmp, non-UTC, foreign cwd)"
(cd /tmp && python - <<'EOF' >"$OUT/driver_sim.txt" 2>/dev/null
import importlib.util
spec = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
mod = importlib.util.module_from_spec(spec); spec.loader.exec_module(mod)
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.session.timeZone", "America/New_York")
         .config("spark.ui.enabled", "false").getOrCreate())
rows = mod.entry(spark).collect()
assert len(rows) > 0
qs, osql = mod.queries(), mod.oracle_sql()
assert set(osql) <= set(qs)
ks = sorted(qs)
print(len(rows), "entry rows;", len(qs), "declared /", len(osql), "oracled; 50th key:", ks[49])
print("OK")
EOF
) || FAIL=1
cat "$OUT/driver_sim.txt"
grep -q "^OK$" "$OUT/driver_sim.txt" || FAIL=1

echo "== full pytest (SWALLOW_FULL_TESTS=1 — includes slow-marked suites)"
SWALLOW_FULL_TESTS=1 python -m pytest tests/ -q >"$OUT/pytest.txt" 2>&1
tail -2 "$OUT/pytest.txt"
# contention-sensitive bench timing gates may flake in a full run that has
# hammered the box for 40 minutes — re-run any timing failures standalone
# before calling them regressions (NOTES_r10/r11 pattern)
if grep -q "^FAILED" "$OUT/pytest.txt"; then
  if grep "^FAILED" "$OUT/pytest.txt" | grep -vq test_bench_regression; then
    FAIL=1  # a non-timing failure is always real
  else
    echo "timing-gate flakes only — re-running those standalone"
    keys=$(grep "^FAILED" "$OUT/pytest.txt" | sed 's/.*\[\(.*\)\].*/\1/' \
      | awk 'NR>1{printf " or "}{printf "%s",$0}')
    SWALLOW_FULL_TESTS=1 python -m pytest tests/test_bench_regression.py -q -k "$keys" \
      >"$OUT/pytest_retry.txt" 2>&1
    tail -2 "$OUT/pytest_retry.txt"
    grep -q " failed" "$OUT/pytest_retry.txt" && FAIL=1
  fi
fi

echo "== bench (sf0.1)"
python bench.py 2>/dev/null >"$OUT/bench.json"
python - "$OUT/bench.json" <<'EOF'
import json, sys
d = json.loads(open(sys.argv[1]).read())
t = d["totals"]
print("headline", t["value"], "raw /", t["value_spin_normalized"], "normalized;",
      "extended", t["extended_total"], "/", t["extended_total_spin_normalized"],
      "; errors", t["n_errors"])
EOF

echo "== leak grep"
if grep -rniE "anthropic|claude|capybara|tengu" --exclude=round_ritual.sh \
    swallow_spark/ tools/ __spark_entry__.py bench.py; then
  FAIL=1
else
  echo "clean"
fi

echo
if [ "$FAIL" -eq 0 ]; then echo "RITUAL GREEN"; else echo "RITUAL FAILED — see $OUT"; fi
exit $FAIL
