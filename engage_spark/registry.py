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


# Round-13 rotation (part 5): the driver checks the FIRST 50 registry
# entries, so this tuple is exactly that window. Composition:
# (a) the five queries whose newest driver row is r8 (the VERDICT r12
#     rotation tail — none code-changed since, all hash-green there);
# (b) queries NEW in round 13 — the partitioned version stack
#     (s14b/s15b/s16b), restore/rollback (s14c), the partitioned
#     mirror (s18b), and the min/max recompute rollup (s19b);
# (c) queries whose IMPLEMENTATION changed in round 13 — the mirror
#     purge staging + distributed bootstrap (s18), the rollup merge
#     refactor (s19), the partition-aware + mergeSchema apply_deletes
#     (s13), the relative-path log + _read_names + snapshot
#     checkpoints (s14/s15/s16), the _bucket_spec sidecar (s17), and
#     the staged-commit walk under zorder maintenance (s10 family);
# (d) the r9 cohort, oldest-first — rotation part 5 proper (27 of 41;
#     the remaining 14 — x2b/x2b2/x2d, x3c/x3d/x3e, x4_tfidf_pipeline,
#     the x_dedup_components trio, x_doc_chunking,
#     x_embed_lsh_neardup_pairs, x_profile_columns, x_shard_manifest —
#     lead part 6 next round).
# Names not yet registered are skipped by load_all(), so this list may
# lead the implementation within a round.
DRIVER_PRIORITY: tuple[str, ...] = (
    # (a) newest driver row r8
    "x_embed_profile",
    "x_pack_boundaries",
    "x_span_dedup",
    "x_token_encode",
    "x_vocab_topk",
    # (b) NEW in round 13
    "s10e_zorder_partitioned_layout",
    "s14b_time_travel_partitioned",
    "s14c_restore_version",
    "s15b_version_diff_partitioned",
    "s16b_change_feed_partitioned",
    "s18b_mirror_sync_partitioned",
    "s19b_incremental_rollup_minmax",
    # (c) implementation changed in round 13
    "s18_mirror_sync",
    "s19_incremental_rollup",
    "s13_delete_vector_roundtrip",
    "s14_time_travel_versions",
    "s15_version_diff",
    "s16_change_data_feed",
    "s17_bucketed_join",
    "s10_zorder_layout",
    "s10b_zorder_rank_layout",
    "s10c_zorder_append_roundtrip",
    "s10d_zorder_incremental_optimize_roundtrip",
    # (d) the r9 cohort, rotation part 5
    "a1_groupby_mean_all_numeric",
    "a2_a3_groupby_sum_max",
    "a5_global_min_max_mean",
    "a6_group_size_gate",
    "a8_maxabs_normalize",
    "a9_distinct_values",
    "a10_row_dedup_subset",
    "a11_zscore_standardize",
    "a12_rmse_metric",
    "ev_conversion_funnel",
    "ev_retention_cohorts",
    "ext_approx_sketches",
    "ext_kmv_distinct_md5",
    "j1_inner_join_multikey",
    "j3_left_outer_join",
    "j4_right_outer_join",
    "j5_self_join_suffixes",
    "j6_broadcast_dim_join",
    "j7_semi_join_membership",
    "j8_anti_join_dropgroups",
    "k_w9_interpolate",
    "mm_resize_bytes",
    "mm_resize_plan",
    "s7_compaction_roundtrip",
    "s8_partitioned_compaction_nulls",
    "s11_schema_evolution_roundtrip",
    "x2_minhash_lsh_dedup",
)


def load_all() -> dict[str, Query]:
    """Import every query module (side effect: fills REGISTRY), then
    order the result so DRIVER_PRIORITY entries come first (registry
    order = the driver's correctness-check order)."""
    import engage_spark.queries  # noqa: F401  (package __init__ imports submodules)

    ordered = {n: REGISTRY[n] for n in DRIVER_PRIORITY if n in REGISTRY}
    ordered.update((n, q) for n, q in REGISTRY.items() if n not in ordered)
    return ordered
