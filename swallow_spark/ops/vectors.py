"""Vector/similarity column builders (SURVEY.md §2.K).

Determinism: dot products accumulate integer 1e-8 units (exact longs), so
results are independent of summation order — bit-identical between Spark and
DuckDB, and between any two cluster partitionings. The per-term floor defines
the semantics identically in both engines.

Scale notes: cosine/dot stay in JVM codegen (zip_with + aggregate — no UDF,
no Python). For pairwise similarity at 100 TB, block first (label key or LSH
band) so the cross product never materializes globally; norms are
precomputed once per vector and joined, not recomputed per pair.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SCALE = 100_000_000  # 1e-8 units


def dot_units(a: Column, b: Column) -> Column:
    """Σ floor(a_i*b_i*1e8 + 0.5) as an exact long."""
    terms = F.zip_with(
        a,
        b,
        lambda x, y: F.floor(
            x.cast("double") * y.cast("double") * F.lit(SCALE) + F.lit(0.5)
        ),
    )
    return F.aggregate(terms, F.lit(0).cast("long"), lambda acc, v: acc + v)


def sql_dot_units(a: str, b: str) -> str:
    """DuckDB mirror of dot_units (1-based list indexing)."""
    return (
        f"CAST(list_sum(list_transform(generate_series(1, len({a})), "
        f"i -> CAST(FLOOR(CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE) "
        f"* {SCALE} + 0.5) AS BIGINT))) AS BIGINT)"
    )


def l2_norm(v: Column) -> Column:
    """Euclidean norm from exact unit self-dot."""
    return F.sqrt(dot_units(v, v).cast("double") / F.lit(SCALE))


def sql_l2_norm(v: str) -> str:
    return f"sqrt(CAST({sql_dot_units(v, v)} AS DOUBLE) / {SCALE})"


def cosine_from(dot_u: Column, norm_a: Column, norm_b: Column) -> Column:
    """cosine given precomputed unit-dot and norms (shared IEEE op order)."""
    return (dot_u.cast("double") / F.lit(SCALE)) / (norm_a * norm_b)


# ---- pre-quantized variant: floor per ELEMENT (1e-4 units), so the float→
# int conversion happens once per vector instead of once per pair — the fast
# path for pairwise similarity joins. Still exact integer sums.

ESCALE = 10_000  # 1e-4 units per element; products are 1e-8 units (= SCALE)


def int_units(v: Column) -> Column:
    """Vector quantized to integer 1e-4 units (compute once, reuse per pair)."""
    return F.transform(
        v, lambda x: F.floor(x.cast("double") * F.lit(ESCALE) + F.lit(0.5))
    )


def sql_int_units(v: str) -> str:
    return (
        f"list_transform({v}, x -> CAST(FLOOR(CAST(x AS DOUBLE) * {ESCALE} + 0.5)"
        " AS BIGINT))"
    )


def dot_int(ia: Column, ib: Column) -> Column:
    """Exact long dot of pre-quantized vectors, in 1e-8 units."""
    return F.aggregate(
        F.zip_with(ia, ib, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def sql_dot_int(ia: str, ib: str) -> str:
    return (
        f"CAST(list_sum(list_transform(generate_series(1, len({ia})), "
        f"i -> {ia}[i] * {ib}[i])) AS BIGINT)"
    )
