"""Query modules — importing this package registers every named query."""

# Import order = registry order = the driver's correctness-check order.
# The r1 driver sweep truncated on a time budget, so the modules that
# were left unchecked (kernels, model ops, LLM pipeline) register FIRST
# this round; the r1-verified relational surface follows.
from engage_spark.queries import (  # noqa: F401
    flagship,
    kernels,
    model_ops,
    llm_dedup,
    llm_similarity,
    llm_text,
    llm_curation,
    llm_corpus,
    multimodal,
    streaming_twins,
    sinks,
    extensions,
    custom_joins,
    relational,
    joins,
    aggregates,
    windows,
    setops,
    scalar_functions,
    sql_surface,
    events_ts,
)
