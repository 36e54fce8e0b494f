"""Cross-engine determinism helpers (SURVEY.md §2.0 — MANDATORY rules).

The driver hash-compares Spark output against DuckDB output value-by-value,
so every float that went through arithmetic must be canonicalized *with the
same IEEE-754 operation sequence in both engines*. Library `ROUND()` is NOT
safe for that: Spark rounds the shortest-decimal repr (BigDecimal.valueOf,
HALF_UP) while DuckDB rounds the binary value — they disagree whenever the
shortest repr lands exactly on a .xx5 boundary.

Instead we canonicalize with pure IEEE primitives that both engines compute
identically:

    half-up round to n digits:  floor(x * 10^n + 0.5) / 10^n
    exact money sum:            sum(floor(x*100 + 0.5) :: int-cents) / 100

Integer cent sums are exact in both engines (longs in Spark, HUGEINT in
DuckDB, and even double partial sums of integers < 2^53 are exact), so the
result is independent of partitioning / summation order — the property a
floating sum does not have at 100 TB scale.

Fixture floats are already 2-decimal (verified in FIXTURES.md), so the cents
cast is lossless on raw columns; on derived products it defines half-up
rounding, identically in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------- Spark side


def rnd(col: Column, n: int = 2) -> Column:
    """Deterministic half-up round to n digits: floor(x*10^n + 0.5)/10^n."""
    m = 10**n
    return F.floor(col * F.lit(m) + F.lit(0.5)) / F.lit(m)


def cents(col: Column, n: int = 2) -> Column:
    """x as integer 10^-n units (long)."""
    m = 10**n
    return F.floor(col * F.lit(m) + F.lit(0.5))


def money_sum(col: Column, n: int = 2) -> Column:
    """Order-independent exact SUM of a float column, as double.

    Scale note: partial aggregation (map-side combine) of longs; no
    precision drift regardless of partition count or merge order.
    """
    m = 10**n
    return F.sum(cents(col, n)).cast("double") / F.lit(m)


def money_avg(col: Column, n: int = 2, out_digits: int = 4) -> Column:
    """Deterministic AVG: exact integer sum / count, half-up to out_digits."""
    m = 10**n
    return rnd(
        F.sum(cents(col, n)).cast("double") / F.lit(m) / F.count(F.lit(1)),
        out_digits,
    )


# --------------------------------------------------------------- DuckDB side
# SQL fragment builders so oracle text uses the *same* operation sequence.


def sql_rnd(expr: str, n: int = 2) -> str:
    m = 10**n
    return f"(FLOOR(({expr}) * {m} + 0.5) / {m})"


def sql_cents(expr: str, n: int = 2) -> str:
    m = 10**n
    return f"CAST(FLOOR(({expr}) * {m} + 0.5) AS BIGINT)"


def sql_money_sum(expr: str, n: int = 2) -> str:
    m = 10**n
    return f"(CAST(SUM({sql_cents(expr, n)}) AS DOUBLE) / {m})"


def sql_money_avg(expr: str, n: int = 2, out_digits: int = 4) -> str:
    m = 10**n
    inner = f"CAST(SUM({sql_cents(expr, n)}) AS DOUBLE) / {m} / COUNT(*)"
    return sql_rnd(inner, out_digits)


# ------------------------------------------------- portable polynomial hash
# A deterministic string hash BOTH engines compute identically with pure
# int64 arithmetic: H = fold(codepoints, acc -> (acc*31 + c) mod P), seed 7,
# P = 1e9+7. acc < P ≈ 2^30, so acc*31 + 255 < 2^35 — no overflow in either
# engine. Unlike xxhash64 (Spark-only), this makes hash-dependent operators
# (count-min sketch, minhash) ORACLE-CHECKABLE in DuckDB. It is a weaker
# mixer than xxhash64 — fine for sketch bucketing where the oracle proves
# the exact estimate, and the cost is O(len) lambda steps per string, so
# hash each DISTINCT string once, not each occurrence.

POLY_P = 1_000_000_007
POLY_SEED = 7


def poly_hash(col: str) -> Column:
    """Spark column: portable polynomial hash of a string column."""
    return F.expr(sql_poly_hash_spark(col))


def sql_poly_hash_spark(expr: str) -> str:
    # CASE guard: Spark's sequence(1, 0) is DESCENDING [1, 0], not empty —
    # an empty string must short-circuit to the bare seed (as DuckDB's
    # empty-list reduce does).
    return (
        f"CASE WHEN length({expr}) = 0 THEN CAST({POLY_SEED} AS BIGINT) ELSE "
        f"aggregate(transform(sequence(1, length({expr})), "
        f"i -> cast(ascii(substring({expr}, i, 1)) as bigint)), "
        f"cast({POLY_SEED} as bigint), "
        f"(acc, c) -> (acc * 31 + c) % {POLY_P}) END"
    )


def sql_poly_hash_duck(expr: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST({POLY_SEED} AS BIGINT), "
        f"list_transform(generate_series(1, length({expr})), "
        f"i -> CAST(ascii(substr({expr}, CAST(i AS INT), 1)) AS BIGINT))), "
        f"(acc, c) -> (acc * 31 + c) % {POLY_P})"
    )
