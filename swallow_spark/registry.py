"""Query registry: the single place a capability is declared.

Each operator from SURVEY.md §2 registers exactly once with (a) its Spark
implementation ``fn(spark, sf_dir) -> DataFrame`` and (b) its DuckDB oracle
SQL (or None for rows-only ops). ``__spark_entry__`` and the pytest parity
suite both iterate this registry, so a query cannot be declared to the driver
without also being locally testable.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None => rows-only check
    tier: str  # T1 / T2 / T3 (SURVEY.md §2)
    doc: str = ""
    declare: bool = True  # False => keep local-only (not exported to driver)


_REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, tier: str = "T2", declare: bool = True):
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query key: {name}")
        _REGISTRY[name] = Query(
            name=name, fn=fn, oracle=oracle, tier=tier, doc=(fn.__doc__ or ""), declare=declare
        )
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    # Import query modules lazily so registration happens on first use.
    from . import queries as _  # noqa: F401

    return dict(sorted(_REGISTRY.items()))


def declared_queries() -> dict[str, Query]:
    return {k: q for k, q in all_queries().items() if q.declare}
