"""engage_spark — a PySpark-native analytics engine.

Re-expresses the data-processing capabilities of the reference pipeline
(`project-engage/engage`, see SURVEY.md) as lazy, Catalyst-optimized
PySpark DataFrame/SQL operators, plus large-scale LLM-data-pipeline
extensions (dedup, similarity search, text analysis, multimodal columns).

Design stance (SURVEY.md §7.0):
  - DataFrame/SQL first; no RDDs; no custom Catalyst rules.
  - Per-group sequential algorithms (interpolation, SIR recurrence,
    recursive forecast) are Arrow-batched ``applyInPandas`` kernels with
    pinned output schemas.
  - Parquet as interchange; CSV only at ingest boundaries.
  - Every operator designed for a multi-executor cluster: broadcast the
    small side, aggregate before join where possible, keep expressions
    inside whole-stage codegen.
"""

__version__ = "0.1.0"

from engage_spark.session import get_spark  # noqa: F401
