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


def _register_pickle_by_value() -> None:
    """Ship this package's code inside cloudpickle payloads.

    applyInPandas/mapInPandas kernels defined in these modules reach the
    Python workers via cloudpickle, which serializes module-level
    functions BY REFERENCE — workers would then need `engage_spark` on
    their own sys.path, which isn't true when the driving process runs
    from another cwd (the round driver does). Registering the package
    for pickle-by-value makes every kernel payload self-contained.
    """
    import sys

    try:
        from pyspark import cloudpickle
    except ImportError:  # pragma: no cover - vendored path moved
        import cloudpickle
    cloudpickle.register_pickle_by_value(sys.modules[__name__])


_register_pickle_by_value()
