"""Text-analysis column builders (SURVEY.md §2.K).

Everything here is a Catalyst expression (higher-order functions over token
arrays) — no Python UDFs, so the 100 TB path stays inside whole-stage
codegen. Explode-heavy consumers should project to (id, token) before the
explode so shuffles carry minimal width.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(col: Column) -> Column:
    """Whitespace tokens (fixture text is single-space separated)."""
    return F.split(col, " ")


def shingles(col: Column, k: int = 5) -> Column:
    """Distinct k-token shingles joined by spaces.

    Docs shorter than k tokens yield one truncated shingle (greatest(n-k+1,1)
    start positions; slice truncates at the end) — mirrored exactly by
    sql_shingles below.
    """
    arr = tokens(col)
    starts = F.sequence(F.lit(1), F.greatest(F.size(arr) - (k - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(starts, lambda i: F.array_join(F.slice(arr, i, k), " "))
    )


def sql_shingles(text_expr: str, k: int = 5) -> str:
    """DuckDB mirror of shingles() (list_slice end is inclusive)."""
    arr = f"string_split({text_expr}, ' ')"
    return (
        f"list_distinct(list_transform("
        f"generate_series(1, greatest(len({arr}) - {k - 1}, 1)), "
        f"i -> array_to_string(list_slice({arr}, i, i + {k - 1}), ' ')))"
    )


# Fixed stopword list (fixture vocabulary markers + generic fillers).
STOPWORDS = ["a", "the", "dup"]
