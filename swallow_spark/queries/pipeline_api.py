"""E1 pipeline façade exercised as an oracle-checked query key: a
swallow-style source → filter → derive → broadcast-join → aggregate chain
compiled to one Catalyst plan (SURVEY.md §3.2)."""

from __future__ import annotations

from ..conform import sql_money_sum
from ..pipeline import Aggregate, Filter, Join, ParquetSource, Pipeline, WithColumn
from ..registry import register


@register(
    "pipeline_api",
    oracle=f"""
SELECT c_mktsegment, yr,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       {sql_money_sum('o_totalprice')} AS total_value
FROM (
  SELECT o_custkey, o_totalprice, CAST(year(o_orderdate) AS INT) AS yr
  FROM orders WHERE o_totalprice > 1000
) o JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment, yr
""",
    tier="T2",
)
def pipeline_api(spark, sf_dir):
    """Declarative Pipeline: orders > 1000 → year column → ⋈ customer
    (broadcast) → count + exact money sum per (segment, year)."""
    pipe = Pipeline(
        source=ParquetSource(sf_dir, "orders"),
        steps=[
            Filter("o_totalprice > 1000"),
            WithColumn("yr", "cast(year(o_orderdate) as int)"),
            Join(
                ParquetSource(sf_dir, "customer"),
                on="o_custkey = c_custkey",
                how="inner",
                broadcast=True,
            ),
            Aggregate(
                by=["c_mktsegment", "yr"],
                aggs={
                    "n_orders": "count(1)",
                    "total_value": (
                        "cast(sum(cast(floor(o_totalprice * 100 + 0.5) as bigint))"
                        " as double) / 100"
                    ),
                },
            ),
        ],
    )
    return pipe.to_df(spark)
