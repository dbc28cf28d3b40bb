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
# round-5 additions plus most of the r1-era core. Round 6 rotation:
# (a) queries that are NEW or whose code/oracle CHANGED this round,
# (b) the 13 queries whose only driver row is round 1 (they rolled past
# position 50 in r5 — SQL1/SQL2 are the reference's entire SQL surface)
# plus x_embed_lsh_neardup_pairs (changed r5, rolled), then (c) the
# r3-era block, now the oldest remaining signal. Entries past position
# 50 roll to the round-7 window.
DRIVER_PRIORITY: tuple[str, ...] = (
    # (a) new / changed in round 6
    "x_semdedup_prune",              # new: SemDeDup semantic dedup (full oracle)
    "x2b2_simhash_md5",              # new: oracle-checkable SimHash twin
    "x2d_minhash_md5",               # new: oracle-checkable MinHash twin
    "x_dedup_components_lsh",        # oracle added (md5-LSH edges + closure)
    "x4c_tfidf_md5",                 # new: oracle-checkable hashing-TF-IDF twin
    "x_line_dedup",                  # new: C4 corpus-frequency line dedup
    "x_dedup_components_star",       # oracle added (star algo on exact edges)
    "mm_frame_digest",               # new: frame content oracle (hex twin)
    "mm_resize_digest",              # new: pixel-exact resize oracle (hex twin)
    "mm_byte_histogram",             # oracle added (was rows-only)
    "x3b_lsh_ann_search",            # oracle added (was rows-only)
    "x3c_ivf_ann_search",            # oracle added (was rows-only)
    "x_bpe_encode_wscount",          # new: oracled projection of BPE encode
    "x3d2_brp_highrecall_agreement", # new: BRP@16 tables vs exact top-5 oracle
    "x2c_mllib_minhash_join",        # oracle added (was rows-only)
    "x_bpe_merges",                  # pruned-vocab bounded-collect config
    "x_bpe_encode",                  # same config change
    # (b) only driver row is round 1 — rolled past 50 in round 5
    "u1_union_homogeneous",
    "u2_union_missing_columns",
    "u4_rekey_collapse_aggregate",
    "u5_intersect_except",
    "f_string_ops",
    "f_date_ops",
    "f13_date_range_explode",
    "f15_case_banding",
    "f17_f18_math_null_tests",
    "sql1_ordinal_groupby_ifnull",
    "sql2_causal_features",
    "ev_tumbling_window_agg",
    "ev_sliding_window_agg",
    "x_embed_lsh_neardup_pairs",     # banding auto-scaled r5; rolled past 50
    # (c) r3-era block — oldest remaining driver signal
    "x2_minhash_lsh_dedup",
    "x2b_simhash_dedup",
    "x_ngram_jaccard_pairs",
    "x_cosine_neardup_pairs",
    "x3_topk_cosine_search",
    "x_embed_quantize",
    "x_text_token_count",
    "x_text_quality",
    "x_text_lang_id",
    "x_text_fingerprint",
    "x_text_sentiment",
    "x_gopher_repetition",
    "x_dedup_components",
    "x_pii_redact",
    "x_hash_sample_stratified",
    "x_mixture_plan",
    "x_decontaminate",
    "x_length_histogram",
    "mm_frame_sample",
    # position 51+: rolls to the round-7 window (r3-era rows, re-green
    # them next round along with the r4-era block)
    "mm_media_metadata",
    "s4_s5_parquet_partitioned_roundtrip",
    "s4b_json_orc_roundtrip",
    "s2_multifile_csv_glob_scan",
    "ext_rollup_revenue",
    "ext_cube_order_stats",
    "ext_rank_dense_ntile",
    "ext_range_frame_sum",
)


def load_all() -> dict[str, Query]:
    """Import every query module (side effect: fills REGISTRY), then
    order the result so DRIVER_PRIORITY entries come first (registry
    order = the driver's correctness-check order)."""
    import engage_spark.queries  # noqa: F401  (package __init__ imports submodules)

    ordered = {n: REGISTRY[n] for n in DRIVER_PRIORITY if n in REGISTRY}
    ordered.update((n, q) for n, q in REGISTRY.items() if n not in ordered)
    return ordered
