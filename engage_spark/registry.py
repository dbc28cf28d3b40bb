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
# entries. Cumulative record: r1 greened the relational core, r3 the
# kernels/model/LLM block, r4 the streaming/ext/corpus block, r5 the
# round-5 additions plus most of the r1-era core, r6 the r6 additions,
# the r1-stale rollover and the r3-era LLM block. Round 7 rotation:
# (a) queries NEW or whose code/oracle CHANGED this round (the three
# kernel-oracle conversions — k_m4b sits in block (c) below, also
# changed — the closed-form M2, the M1 stats twin, the Lloyd-refined
# IVF, the packing renames), (b) the 8 queries whose
# only driver row is r3 — the oldest signal, scheduled for this round
# by the r6 comment — then (c) the r4-signal block. Six rows-only
# r4-signal queries (their hash twins are all green and a rows-only
# driver row carries little signal) defer to the round-8 window:
# ext_approx_sketches, m1b_glm_poisson_govflags, mm_resize_bytes,
# x3d_mllib_brp_ann, x4_tfidf_pipeline, x4b_quality_classifier —
# plus, to make room for this round's six new oracled queries (the PQ
# pair, compaction roundtrip, cluster-safe split, pack boundaries,
# embed profile), six oracled-but-unchanged r4-signal queries with
# pytest+plan coverage: mm_resize_plan, x_profile_columns,
# x_doc_chunking, x_shard_manifest, ev_retention_cohorts,
# ev_conversion_funnel.
DRIVER_PRIORITY: tuple[str, ...] = (
    # (a) new / changed in round 7
    "k_m4_sir_simulate",             # recursive-CTE oracle added (was rows-only)
    "k_w11_ar_forecast",             # Yule-Walker fit + recursive-CTE oracle
    "m2_mixed_effects",              # closed-form Cramer rewrite + full oracle
    "m1c_glm_design_stats",          # new: GLM design-matrix moment twin
    "x3c_ivf_ann_search",            # one deterministic Lloyd refinement step
    "x3e_pq_encode",                 # new: product-quantization codes
    "x3e2_pq_adc_search",            # new: ADC shortlist + exact re-rank
    "s7_compaction_roundtrip",       # new: small-file compaction is lossless
    "x_cluster_safe_split",          # new: leakage-safe split by dup component
    "x_pack_boundaries",             # new: per-pack doc boundary offsets
    "x_embed_profile",               # new: embedding drift/statistics profile
    "x_sequence_packing_exact_order",    # renamed (flat variant demoted)
    "x_packed_sequences_exact_order",    # renamed (flat variant demoted;
    # the sharded covers-primary only changed docstrings — r5 signal stands)
    # (b) only driver row is round 3 — the scheduled rollover block
    "mm_media_metadata",
    "s4_s5_parquet_partitioned_roundtrip",
    "s4b_json_orc_roundtrip",
    "s2_multifile_csv_glob_scan",
    "ext_rollup_revenue",
    "ext_cube_order_stats",
    "ext_rank_dense_ntile",
    "ext_range_frame_sum",
    # (c) r4-signal block — now the oldest remaining
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "m1_glm_poisson",
    "m5_r0_estimation",
    "m6_bias_correction",
    "m7_train_holdout_split",
    "m8_scenario_compare",
    "k_m4b_sir_continuous",
    "ev_sessionize_gap",
    "ev_json_extract",
    "f_collection_ops",
    "ext_asof_join",
    "ext_exact_percentiles",
    "ext_pivot_wide",
    "ext_range_join_binned",
    "ext_salted_skew_join",
    "ext_unpivot_long",
    "st_dedup_events",
    "st_session_window",
    "st_sliding_window_agg",
    "st_stream_stream_join",
    "st_tumbling_window_agg",
    "x1_exact_dedup",
    "x1b_exact_dedup_keepers",
    "x_curation_pipeline",
    "x_span_dedup",
    "x_token_encode",
    "x_vocab_topk",
)


def load_all() -> dict[str, Query]:
    """Import every query module (side effect: fills REGISTRY), then
    order the result so DRIVER_PRIORITY entries come first (registry
    order = the driver's correctness-check order)."""
    import engage_spark.queries  # noqa: F401  (package __init__ imports submodules)

    ordered = {n: REGISTRY[n] for n in DRIVER_PRIORITY if n in REGISTRY}
    ordered.update((n, q) for n, q in REGISTRY.items() if n not in ordered)
    return ordered
