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
# round-5 additions plus most of the r1-era core, r6 the r6 additions
# and the r3-era LLM block, r7+r8 the kernel-oracle conversions, the
# PQ/compaction/split/packing additions and the r3 rollover (r8 ran
# the unrotated r7 list). Round 9 rotation:
# (a) queries whose CODE or ORACLE changed in r8/r9 without a
# post-change driver row: the hot-bucket-capped LSH family (cap added
# r8; x2*/components* never re-swept) plus the r9 embed-LSH cap, the
# r9 nprobe/posexplode-centroid IVF + PQ rewrites, and the r9
# null-safe-compaction s7;
# (b) the 12 queries whose newest driver row is r4 — the deferral
# block the r7 verdict scheduled for r8, now overdue;
# (c) 26 of the 47 r5-signal queries (relational/agg/join/window
# core); the remaining 21 r5-signal queries
# (p7..x_quality_decile_gate) are the scheduled round-10 rollover.
DRIVER_PRIORITY: tuple[str, ...] = (
    # (a) changed in r8/r9 — need a post-change driver row
    "x2_minhash_lsh_dedup",          # r8 hot-bucket cap (star edges)
    "x2d_minhash_md5",               # r8 cap, oracle twin carries the cap
    "x2b_simhash_dedup",             # r8 cap
    "x2b2_simhash_md5",              # r8 cap, oracled
    "x_embed_lsh_neardup_pairs",     # r9 cap (last uncapped family member)
    "x_dedup_components",            # consumes capped edges
    "x_dedup_components_lsh",        # consumes capped edges
    "x_dedup_components_star",       # consumes capped edges
    "x3c_ivf_ann_search",            # r9: nprobe=1.5*log2, posexplode centroids
    "x3e_pq_encode",                 # r9: posexplode codebook recompute
    "x3e2_pq_adc_search",            # r9: same codebook path
    "x3f_ivfpq_residual_search",     # NEW r9: true IVF-PQ (residual codes)
    "s7_compaction_roundtrip",       # r9: null-safe partitioned compaction
    "s8_partitioned_compaction_nulls",  # NEW r9: NULL-partition roundtrip
    "s9_upsert_merge_roundtrip",     # NEW r9: MERGE INTO on parquet
    "s10_zorder_layout",             # NEW r9: Morton layout, minmax scale
    "s10b_zorder_rank_layout",       # NEW r9: Morton layout, rank scale
    "x_expectations_check",          # NEW r9: declarative quality gate
    "m1d_glm_irls_step",             # NEW r9: one IRLS step, Cramer oracle
    # (b) newest driver row is r4 — the overdue deferral block
    "ext_approx_sketches",
    "m1b_glm_poisson_govflags",
    "mm_resize_bytes",
    "mm_resize_plan",
    "x3d_mllib_brp_ann",
    "x4_tfidf_pipeline",
    "x4b_quality_classifier",
    "x_doc_chunking",
    "x_profile_columns",
    "x_shard_manifest",
    "ev_retention_cohorts",
    "ev_conversion_funnel",
    # (c) r5-signal rollover, part 1 of 2 (part 2 = round 10)
    "a1_groupby_mean_all_numeric",
    "a2_a3_groupby_sum_max",
    "a5_global_min_max_mean",
    "a6_group_size_gate",
    "a8_maxabs_normalize",
    "a9_distinct_values",
    "a10_row_dedup_subset",
    "a11_zscore_standardize",
    "a12_rmse_metric",
    "j1_inner_join_multikey",
    "j3_left_outer_join",
    "j4_right_outer_join",
    "j5_self_join_suffixes",
    "j6_broadcast_dim_join",
    "j7_semi_join_membership",
    "j8_anti_join_dropgroups",
    "k_w9_interpolate",
    "ext_kmv_distinct_md5",          # NEW r9: hash-gated sketch twin
    "s11_schema_evolution_roundtrip",  # NEW r9: mergeSchema drift path
    # o2_sorted_distinct, o3_first_row_after_sort, p2_projection_exclude,
    # p3_p4_rename_literal, p5_arith_derived, p10_cast, p11_null_fill,
    # p12_drop_allnull_columns and p13_first_value_per_group roll to
    # round 10 with the p7+ block (slots ceded to the new x3f, s8,
    # m1d, s9, s10, s10b, x_expectations_check and ext_kmv — this
    # tuple is exactly the 50-query window the driver checks)
)


def load_all() -> dict[str, Query]:
    """Import every query module (side effect: fills REGISTRY), then
    order the result so DRIVER_PRIORITY entries come first (registry
    order = the driver's correctness-check order)."""
    import engage_spark.queries  # noqa: F401  (package __init__ imports submodules)

    ordered = {n: REGISTRY[n] for n in DRIVER_PRIORITY if n in REGISTRY}
    ordered.update((n, q) for n, q in REGISTRY.items() if n not in ordered)
    return ordered
