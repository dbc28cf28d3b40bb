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


# Round-12 rotation (part 4): the driver checks the FIRST 50 registry
# entries, so this tuple is exactly that window. Composition:
# (a) queries NEW or implementation-changed in round 12 — the version
#     log (s14/s15), the file-targeted delete vacuum + lease (s13),
#     the zorder write/append/optimize versioning hooks (s10 family),
#     the distributed PQ query-side ADC build (x3e2/x3f/x5b), and the
#     order-independent IRLS moments (m1c/m1d/x4b2) — each needs a
#     fresh post-change driver row (the bench-drift watchlist
#     x2/x3_topk/k_w9 needs TIMINGS, which bench.py provides
#     regardless of this window — no correctness slots spent);
# (b) the 38 registered queries whose newest driver row is r8 —
#     rotation part 4. With 16 (a)-entries the 50-query window covers
#     the first 33 of these; the final five (x_embed_profile,
#     x_pack_boundaries, x_span_dedup, x_token_encode, x_vocab_topk —
#     all hash-green on their r8 rows, none code-changed since) lead
#     part 5 next round.
# Names not yet registered are skipped by load_all(), so this list may
# lead the implementation within a round.
DRIVER_PRIORITY: tuple[str, ...] = (
    # (a) changed or NEW in round 12
    "s16_change_data_feed",
    "s18_mirror_sync",
    "s19_incremental_rollup",
    "s17_bucketed_join",
    "x4b_quality_classifier",
    "s14_time_travel_versions",
    "s15_version_diff",
    "s13_delete_vector_roundtrip",
    "s10d_zorder_incremental_optimize_roundtrip",
    "s10c_zorder_append_roundtrip",
    "s10_zorder_layout",
    "x3e2_pq_adc_search",
    "x3f_ivfpq_residual_search",
    "x5b_hybrid_ivfpq",
    "x5_hybrid_rrf",
    "m1d_glm_irls_step",
    "x4b2_quality_logit_irls",
    # (b) newest driver row r8
    "ev_json_extract",
    "ev_sessionize_gap",
    "ext_asof_join",
    "ext_cube_order_stats",
    "ext_exact_percentiles",
    "ext_pivot_wide",
    "ext_range_frame_sum",
    "ext_range_join_binned",
    "ext_rank_dense_ntile",
    "ext_rollup_revenue",
    "ext_salted_skew_join",
    "ext_unpivot_long",
    "f_collection_ops",
    "k_m4b_sir_continuous",
    "m1c_glm_design_stats",
    "m2_mixed_effects",
    "m5_r0_estimation",
    "m6_bias_correction",
    "m7_train_holdout_split",
    "m8_scenario_compare",
    "mm_media_metadata",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "s2_multifile_csv_glob_scan",
    "s4_s5_parquet_partitioned_roundtrip",
    "s4b_json_orc_roundtrip",
    "st_dedup_events",
    "st_session_window",
    "st_sliding_window_agg",
    "st_stream_stream_join",
    "st_tumbling_window_agg",
    "x1b_exact_dedup_keepers",
    "x_cluster_safe_split",
)


def load_all() -> dict[str, Query]:
    """Import every query module (side effect: fills REGISTRY), then
    order the result so DRIVER_PRIORITY entries come first (registry
    order = the driver's correctness-check order)."""
    import engage_spark.queries  # noqa: F401  (package __init__ imports submodules)

    ordered = {n: REGISTRY[n] for n in DRIVER_PRIORITY if n in REGISTRY}
    ordered.update((n, q) for n, q in REGISTRY.items() if n not in ordered)
    return ordered
