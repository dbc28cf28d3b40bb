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


# Round-10 rotation: the driver checks the FIRST 50 registry entries,
# so this tuple is exactly that window. Composition:
# (a) the 7 queries whose implementation changed in round 10 and need
#     a fresh post-change driver row (the chained-IRLS GLM rewrites,
#     the distributed rank-CDF Z-order path + its new append query,
#     the upsert failure-path hardening, the expectations coalesce);
# (b) all 32 queries whose newest driver row is r4/r5 — closing the
#     freshness rotation the r7 verdict started (after this round no
#     registered query's newest row is older than r6);
# (c) 11 r6-signal picks for the remaining slots, preferring the
#     bench-watched lines (x3_topk creep, the x_bpe/x_embed_quantize
#     drift) and the function/SQL/setop core.
DRIVER_PRIORITY: tuple[str, ...] = (
    # (a) changed or NEW in round 10
    "x4d_bm25_topk",
    "x5_hybrid_rrf",
    "x_dedup_keep_best",
    "x2e_lsh_recall_report",
    "x4b2_quality_logit_irls",
    "m1_glm_poisson",
    "m1b_glm_poisson_govflags",
    "s10c_zorder_append_roundtrip",
    "s10b_zorder_rank_layout",
    "s10_zorder_layout",
    "s9_upsert_merge_roundtrip",
    "x_expectations_check",
    # (b) newest driver row r4/r5
    "x_packed_sequences_exact_order",
    "o2_sorted_distinct",
    "o3_first_row_after_sort",
    "p2_projection_exclude",
    "p3_p4_rename_literal",
    "p5_arith_derived",
    "p7_compound_filter",
    "p8_conditional_column",
    "p9_mapping_join_coalesce",
    "p10_cast",
    "p11_null_fill",
    "p12_drop_allnull_columns",
    "p13_first_value_per_group",
    "s1_scan_filter_project",
    "st_doc_quality_stream",
    "st_stateful_running_stats",
    "w2_w3_lag_and_diff",
    "w4_trim_leading_prefix",
    "w5_head_n_per_group",
    "w6_tail_n_per_group",
    "w7_conditional_increase_sum",
    "w8_sliding_feature_window",
    "w12_rownumber_index",
    "x4_tfidf_terms",
    "x_bigram_perplexity",
    "x_incremental_dedup",
    "x_mixture_materialize",
    "x_mixture_temperature",
    "x_ngram_novelty",
    "x_packed_sequences_sharded",
    "x_quality_decile_gate",
    "x_sequence_packing_exact_order",
    # (c) r6-signal picks
    "x3_topk_cosine_search",
    "x3b_lsh_ann_search",
    "x_bpe_merges",
    "x_embed_quantize",
    "f_string_ops",
    "sql1_ordinal_groupby_ifnull",
)


def load_all() -> dict[str, Query]:
    """Import every query module (side effect: fills REGISTRY), then
    order the result so DRIVER_PRIORITY entries come first (registry
    order = the driver's correctness-check order)."""
    import engage_spark.queries  # noqa: F401  (package __init__ imports submodules)

    ordered = {n: REGISTRY[n] for n in DRIVER_PRIORITY if n in REGISTRY}
    ordered.update((n, q) for n, q in REGISTRY.items() if n not in ordered)
    return ordered
