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


# Round-14 rotation (part 6): the driver checks the FIRST 50 registry
# entries, so this tuple is exactly that window. Composition (counts
# and the tail list are now GENERATED — scripts/gen_coverage.py
# §Driver-check rotation state — after two rounds of hand-miscounts):
# (a) the 14 r9-cohort queries that close rotation part 6 (every
#     registered query's newest row is then r10+);
# (b) NEW in round 14 — the versioned partitioned MERGE (s9b) and
#     its streaming CDC front end (st_cdc_merge_upsert);
# (c) queries whose IMPLEMENTATION changed in round 14 — the multi-key
#     deletion sidecar (s13 apply, s14c restore), schema-tolerant
#     version_diff (s15/s15b and the s16 CDF fallback), the
#     read_version-pinned rollup recompute (s19/s19b), the upsert vlog
#     branch + layout guard (s9), the escaped read_bucketed DDL (s17),
#     the executor-probed mirror bootstrap (s18/s18b), and the
#     stash-age heal guard under the version-logged zorder lifecycle
#     (s14/s14b, s10c/s10d);
# (d) the r10 cohort, alphabetical-first 10 of 44 — rotation part 7
#     starts here next round (the remaining 34 are the generated tail;
#     six slots went to the new s22/s23/s24/s25/s26/s27 queries, which
#     must land in the never-checked head of THIS round's window).
# Names not yet registered are skipped by load_all(), so this list may
# lead the implementation within a round.
DRIVER_PRIORITY: tuple[str, ...] = (
    # (a) rotation part 6: the r9 cohort
    "x2b_simhash_dedup",
    "x2b2_simhash_md5",
    "x2d_minhash_md5",
    "x3c_ivf_ann_search",
    "x3d_mllib_brp_ann",
    "x3e_pq_encode",
    "x4_tfidf_pipeline",
    "x_dedup_components",
    "x_dedup_components_lsh",
    "x_dedup_components_star",
    "x_doc_chunking",
    "x_embed_lsh_neardup_pairs",
    "x_profile_columns",
    "x_shard_manifest",
    # (b) NEW in round 14
    "s9b_upsert_partitioned_versioned",
    "st_cdc_merge_upsert",
    "s20_concurrent_appends",
    "s21_stats_pruned_scan",
    "s22_bloom_point_lookup",
    "s23_bloom_join_pruning",
    "s24_expectations_gated_append",
    "s25_optimize_during_append",
    "s26_takedown_during_append",
    "s27_describe_detail",
    # (c) implementation changed in round 14
    "s9_upsert_merge_roundtrip",
    "s13_delete_vector_roundtrip",
    "s14c_restore_version",
    "s15_version_diff",
    "s15b_version_diff_partitioned",
    "s16_change_data_feed",
    "s16b_change_feed_partitioned",
    "s17_bucketed_join",
    "s18_mirror_sync",
    "s18b_mirror_sync_partitioned",
    "s19_incremental_rollup",
    "s19b_incremental_rollup_minmax",
    "s14_time_travel_versions",
    "s14b_time_travel_partitioned",
    "s10c_zorder_append_roundtrip",
    "s10d_zorder_incremental_optimize_roundtrip",
    # (d) the r10 cohort, rotation part 7 head
    "f_string_ops",
    "m1_glm_poisson",
    "m1b_glm_poisson_govflags",
    "o2_sorted_distinct",
    "o3_first_row_after_sort",
    "p2_projection_exclude",
    "p3_p4_rename_literal",
    "p5_arith_derived",
    "p7_compound_filter",
    "p8_conditional_column",
)


def load_all() -> dict[str, Query]:
    """Import every query module (side effect: fills REGISTRY), then
    order the result so DRIVER_PRIORITY entries come first (registry
    order = the driver's correctness-check order)."""
    import engage_spark.queries  # noqa: F401  (package __init__ imports submodules)

    ordered = {n: REGISTRY[n] for n in DRIVER_PRIORITY if n in REGISTRY}
    ordered.update((n, q) for n, q in REGISTRY.items() if n not in ordered)
    return ordered
