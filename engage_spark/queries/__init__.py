"""Query modules — importing this package registers every named query."""

from engage_spark.queries import (  # noqa: F401
    flagship,
    relational,
    joins,
    aggregates,
    windows,
    setops,
    scalar_functions,
    sql_surface,
    events_ts,
    model_ops,
    kernels,
    llm_curation,
    llm_dedup,
    llm_similarity,
    llm_text,
    multimodal,
    sinks,
    extensions,
    custom_joins,
)
