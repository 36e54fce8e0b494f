"""swallow_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first engine covering the capability surface defined in
SURVEY.md §2 (the normative spec; the reference checkout is empty, see
SURVEY.md §0): batch ETL pipeline (source → transforms → sink), a relational
operator suite (scans, filters, joins, aggregates, windows, set ops, scalar
function packs), event/streaming semantics, a UDF surface, and
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns).

Design principles (SURVEY.md §4, §7.4):
- Everything is a DataFrame; declarative plans so Catalyst/AQE optimize.
- No RDDs, no driver-side collect loops inside operators.
- Python UDFs only where column expressions genuinely cannot express the
  semantics, and then Arrow-batched (pandas_udf / mapInPandas).
- Deterministic cross-engine results via swallow_spark.conform.
"""

__version__ = "0.1.0"

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]
