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


# Round-11 rotation: the driver checks the FIRST 50 registry entries,
# so this tuple is exactly that window. Composition:
# (a) queries NEW or implementation-changed in round 11 (the hybrid
#     IVF-PQ retriever, the hermetic LSTM twin, the distributed
#     SemDeDup assignment, the Z-order family shave) — each needs a
#     fresh post-change driver row;
# (b) all 35 registered queries whose newest driver row is r6 —
#     closing rotation part 3 (after this round no registered query's
#     newest row predates r8);
# (c) r8-signal picks for the remaining slots, preferring bench-watched
#     lines and the model/kernel core.
# Names not yet registered are skipped by load_all(), so this list may
# lead the implementation within a round.
DRIVER_PRIORITY: tuple[str, ...] = (
    # (a) changed or NEW in round 11
    "x5b_hybrid_ivfpq",
    "k_w11b_lstm_forecast",
    "x_semdedup_prune",
    "s6_plot_sink",
    "s13_delete_vector_roundtrip",
    "s10d_zorder_incremental_optimize_roundtrip",
    "s10b_zorder_rank_layout",
    "s10c_zorder_append_roundtrip",
    "s10_zorder_layout",
    "x5_hybrid_rrf",
    # (b) newest driver row r6
    "ev_sliding_window_agg",
    "ev_tumbling_window_agg",
    "f13_date_range_explode",
    "f15_case_banding",
    "f17_f18_math_null_tests",
    "f_date_ops",
    "mm_byte_histogram",
    "mm_frame_digest",
    "mm_frame_sample",
    "mm_resize_digest",
    "sql2_causal_features",
    "u1_union_homogeneous",
    "u2_union_missing_columns",
    "u4_rekey_collapse_aggregate",
    "u5_intersect_except",
    "x2c_mllib_minhash_join",
    "x3d2_brp_highrecall_agreement",
    "x4c_tfidf_md5",
    "x_bpe_encode",
    "x_bpe_encode_wscount",
    "x_cosine_neardup_pairs",
    "x_decontaminate",
    "x_gopher_repetition",
    "x_hash_sample_stratified",
    "x_length_histogram",
    "x_line_dedup",
    "x_mixture_plan",
    "x_ngram_jaccard_pairs",
    "x_pii_redact",
    "x_text_fingerprint",
    "x_text_lang_id",
    "x_text_quality",
    "x_text_sentiment",
    "x_text_token_count",
    # (c) r8-signal picks
    "q1_pricing_summary",
    "x1_exact_dedup",
    "k_m4_sir_simulate",
    "k_w11_ar_forecast",
    "x_curation_pipeline",
    "x_snapshot_diff",
)


def load_all() -> dict[str, Query]:
    """Import every query module (side effect: fills REGISTRY), then
    order the result so DRIVER_PRIORITY entries come first (registry
    order = the driver's correctness-check order)."""
    import engage_spark.queries  # noqa: F401  (package __init__ imports submodules)

    ordered = {n: REGISTRY[n] for n in DRIVER_PRIORITY if n in REGISTRY}
    ordered.update((n, q) for n, q in REGISTRY.items() if n not in ordered)
    return ordered
