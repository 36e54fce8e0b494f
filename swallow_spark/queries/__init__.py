"""Query-key implementations (SURVEY.md §2). Importing this package
registers every implemented key into swallow_spark.registry."""

from . import (  # noqa: F401
    scans,
    filters,
    joins,
    aggregates,
    windows,
    sorts,
    setops,
    functions_scalar,
    functions_array,
    events_windows,
    llm_text,
    llm_dedup,
    llm_similarity,
    udfs,
    sources_sinks,
    pipeline_api,
    training_pipeline,
    sampling,
    analytics,
    streaming_demo,
    functions_extra,
    reshape,
    etl,
    timeseries,
)
