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


from ..pipeline import Dedup, Sample  # noqa: E402

_MIX_SAMPLE = Sample(key="doc_id", percent=60)

_MIX_SQL = f"""
WITH dedup AS (
  SELECT * FROM (
    SELECT doc_id, text, lang, source, n_chars,
           row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM documents
  ) WHERE rn = 1
),
sampled AS (SELECT * FROM dedup WHERE {_MIX_SAMPLE.sql()})
SELECT source, lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM sampled
GROUP BY source, lang
"""


@register("pipeline_training_mix", oracle=_MIX_SQL, tier="T2")
def pipeline_training_mix(spark, sf_dir):
    """The facade running a training-corpus mix job end-to-end with the
    three data-curation verbs: Dedup (exact, by content hash, lowest
    doc_id survives) → Sample (deterministic 60% key-hash) → Aggregate
    per (source, lang) — swallow-pipeline spelling of the same chain the
    training_data_clean key writes in raw DataFrame code, compiled to
    one Catalyst plan.

    Determinism: dedup survivor is the window minimum over a total
    order; the sample predicate is pure integer hashing (the Sample verb
    emits its own mirrored DuckDB spelling); counts are exact ints.
    """
    from ..pipeline import Aggregate, ParquetSource, Pipeline

    pipe = Pipeline(
        source=ParquetSource(sf_dir, "documents"),
        steps=[
            Dedup(by=("md5(text)",), order_by=("doc_id",)),
            _MIX_SAMPLE,
            Aggregate(
                by=["source", "lang"],
                aggs={
                    "n_docs": "count(1)",
                    "total_chars": "sum(n_chars)",
                },
            ),
        ],
    )
    return pipe.to_df(spark)
