"""Named-query registry — the correctness surface of the engine.

Every operator row in SURVEY.md §2 is realized as at least one named
query over the driver testdata, registered here together with (when the
semantics are SQL-expressible) an equivalent DuckDB oracle SQL string.
The driver runs both sides at sf0.01 and hash-compares.

Conventions that make the hash comparison robust:
  - every computed column is aliased identically in Spark and SQL;
  - floating-point aggregates are rounded (4-6 dp) on BOTH sides;
  - timestamps/dates in outputs are formatted to strings;
  - BIGINT sums are cast explicitly in the oracle (DuckDB sums of
    BIGINT widen to HUGEINT otherwise).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None → driver does rows-only check
    covers: tuple[str, ...] = field(default_factory=tuple)  # SURVEY §2 row ids
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None = None, covers: tuple[str, ...] | list[str] = ()):
    """Decorator registering a (spark, sf_dir) -> DataFrame query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(
            name=name, fn=fn, oracle=oracle, covers=tuple(covers), doc=fn.__doc__ or ""
        )
        return fn

    return deco


# The driver's per-round correctness sweep checks the FIRST 50 registry
# entries. Cumulative record so far: the relational core went green in
# round 1, kernels/model/LLM ops in round 3. This list front-loads the
# queries that still need a first (or first-green) driver row — the 14
# never-checked entries, the 3 streaming twins fixed this round, and any
# new round-4 queries — so every registered query has a driver signal.
DRIVER_PRIORITY: tuple[str, ...] = (
    # fixed this round (TIMESTAMP_NTZ watermark bug) — need green rows
    "st_tumbling_window_agg",
    "st_dedup_events",
    "st_session_window",
    # new in round 4
    "st_sliding_window_agg",
    "st_stream_stream_join",
    "st_stateful_running_stats",
    "x_curation_pipeline",
    "x_embed_lsh_neardup_pairs",
    "mm_resize_plan",
    "mm_resize_bytes",
    "ev_conversion_funnel",
    "ev_retention_cohorts",
    "x1b_exact_dedup_keepers",
    "x_sequence_packing",
    "x_vocab_topk",
    "x_doc_chunking",
    "x_shard_manifest",
    "x_span_dedup",
    "x4b_quality_classifier",
    "x_packed_sequences",
    "x_token_encode",
    # never received any driver CORRECTNESS row (sat at positions 50+)
    "ext_exact_percentiles",
    "ext_approx_sketches",
    "ext_salted_skew_join",
    "ext_pivot_wide",
    "ext_unpivot_long",
    "ext_asof_join",
    "ext_range_join_binned",
    "ev_json_extract",
    "ev_sessionize_gap",
    "f_collection_ops",
    "x_profile_columns",
    "x2c_mllib_minhash_join",
    "x3d_mllib_brp_ann",
    "x4_tfidf_pipeline",
)


def load_all() -> dict[str, Query]:
    """Import every query module (side effect: fills REGISTRY), then
    order the result so DRIVER_PRIORITY entries come first (registry
    order = the driver's correctness-check order)."""
    import engage_spark.queries  # noqa: F401  (package __init__ imports submodules)

    ordered = {n: REGISTRY[n] for n in DRIVER_PRIORITY if n in REGISTRY}
    ordered.update((n, q) for n, q in REGISTRY.items() if n not in ordered)
    return ordered
