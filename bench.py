"""Headline benchmark — driver contract.

Runs the engine's headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed to completion with the noop sink (full plan
runs distributed; nothing collects to the driver), after a single
warm-up of the flagship to exclude JVM/session start-up from
per-query numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

# Headline set: one per major operator family. Kept deliberately small
# and stable round-over-round so BENCH_r{N}.json is comparable.
HEADLINE = [
    "q1_pricing_summary",      # scan → hash agg (TPC-H Q1 shape)
    "j1_inner_join_multikey",  # large join
    "j6_broadcast_dim_join",   # broadcast join
    "w2_w3_lag_and_diff",      # window lag/diff
    "w8_sliding_feature_window",  # window frames + collect_list
    "sql2_causal_features",    # SQL surface (CASE bands, concat, dedup)
    "ev_tumbling_window_agg",  # event-time tumbling agg
    "a8_maxabs_normalize",     # agg + rejoin normalization
]
# Added as modules land (guarded: only run if registered). The original
# 15 keys stay stable round-over-round; later additions only append.
OPTIONAL = [
    "x1_exact_dedup",
    "x2_minhash_lsh_dedup",
    "x3_topk_cosine_search",
    "x_text_quality",
    "k_w9_interpolate",
    "k_m4_sir_simulate",
    "k_w11_ar_forecast",
    # round 2 additions
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "x_gopher_repetition",
    "x_embed_quantize",
    # round 4 additions. Streaming (st_*) queries are deliberately NOT
    # benched here: their wall time is dominated by micro-batch
    # orchestration (checkpoint dir + state-store setup, ~10s fixed at
    # any sf), which would swamp the throughput signal this headline
    # total exists to track round-over-round.
    "x_curation_pipeline",
    # renamed r7 (was x_sequence_packing): the flat exact-order variant
    # was demoted; the sharded form is the registered primary
    "x_sequence_packing_exact_order",
    "x_vocab_topk",
    "x_doc_chunking",
    "x_shard_manifest",
    "x_span_dedup",
    # round 5 additions
    "x_packed_sequences_sharded",
    "x_token_encode",
    "x4_tfidf_terms",
    "x_embed_lsh_neardup_pairs",
    "x_bigram_perplexity",
    "x_quality_decile_gate",
    "x_bpe_merges",
    "x_incremental_dedup",
    "x_mixture_materialize",
    # round 6 additions
    "x_semdedup_prune",
    "x_line_dedup",
    "x3b_lsh_ann_search",
    "x3c_ivf_ann_search",
    "mm_resize_digest",
    # round 7 additions
    "x3e_pq_encode",
    "x3e2_pq_adc_search",
    "x3f_ivfpq_residual_search",
    "x_pack_boundaries",
    # round 9 additions (storage maintenance + quality gate; the two
    # sink roundtrips time a full write+read cycle, not just a scan)
    "s9_upsert_merge_roundtrip",
    "s10b_zorder_rank_layout",
    "x_expectations_check",
    # round 10 additions (frozen-curve append lifecycle roundtrip;
    # BM25 lexical retrieval)
    "s10c_zorder_append_roundtrip",
    "s10d_zorder_incremental_optimize_roundtrip",
    "s13_delete_vector_roundtrip",
    "x4d_bm25_topk",
    "x5_hybrid_rrf",
    "x5b_hybrid_ivfpq",
    "x_snapshot_diff",
    # round 12 addition (version log). s15 times the scale-interesting
    # op — the only-changed-files snapshot diff over a 3-version build.
    # s14 (the full five-version lifecycle + all five snapshots read
    # back, ~10.5s) stays driver-verified but NOT benched: five
    # maintenance ops per run is a storage soak test, and one of those
    # (s10d) already anchors the bench's maintenance family. The same
    # reasoning keeps s16 (change feed) and s18 (mirror sync) out —
    # both replay that lifecycle; their scale story is measured
    # directly in scripts/measure_cdf_scaling.py → SCALE.md.
    "s15_version_diff",
    # round 12 second pass: the zero-exchange bucketed fact-fact join
    # (times the one-time layout write + the exchange-free join; the
    # join-only steady state is in scripts/measure_bucketed_join.py)
    "s17_bucketed_join",
    # round 13 addition: the partitioned version stack — s15b times
    # the only-changed-files diff on the standard hive layout (the
    # s15 twin). s14b/s16b/s18b/s19b replay the same multi-op
    # lifecycle and stay driver-verified but unbenched, the s14/s16
    # reasoning: three maintenance cycles per run is a storage soak
    # (~10 s of pure lifecycle orchestration at sf0.1), and the
    # scale-interesting piece of each — the touched-group min/max
    # recompute, the partitioned drain — is change-bounded by
    # construction and pinned by pytest + driver hash instead.
    "s15b_version_diff_partitioned",
    # round 14 addition: the versioned partitioned MERGE (publish →
    # enable → MERGE → time-travel both sides). Its streaming front
    # end (st_cdc_merge_upsert) stays unbenched per the st_* policy
    # above; the batch-side commit is the scale-interesting piece.
    "s9b_upsert_partitioned_versioned",
    # round 14 second pass: the stats-pruned scan (zorder publish +
    # footer harvest + data-skipping read). s20 (concurrent appenders)
    # stays driver-verified but unbenched: its wall is thread-timing
    # orchestration, a concurrency soak per the s14/s16 reasoning;
    # the lease-window numbers live in
    # scripts/measure_append_commit.py → SCALE.md.
    "s21_stats_pruned_scan",
    # round 14 third pass: the bloom point-lookup (zorder publish +
    # per-file bloom build + key-targeted read) — the takedown path —
    # and its join-shaped twin (dynamic file pruning from a filtered
    # dim frame)
    "s22_bloom_point_lookup",
    "s23_bloom_join_pruning",
    # round 14 fourth pass: the commit-time expectation gate (publish
    # + dirty staged append + one-job count-and-drop + gated commit)
    "s24_expectations_gated_append",
    # round 14 continuation: the DESCRIBE DETAIL operations surface
    # (clustered+partitioned publish, version log, both index
    # sidecars, a takedown record, then the pure-metadata details row)
    "s27_describe_detail",
    # s25 (optimize racing an appender) and s26 (takedown racing an
    # appender) stay driver-verified but unbenched, the s20 policy:
    # their wall is thread-timing orchestration; the latency numbers
    # that matter live in scripts/measure_optimize_occ.py → SCALE.md.
]

# The exact 15 queries BENCH_r01 timed — the apples-to-apples baseline
# subset. FROZEN: never edit this tuple; it defines what
# baseline_subset_total means against BASELINE.md.
R1_BASELINE = (
    "q1_pricing_summary",
    "j1_inner_join_multikey",
    "j6_broadcast_dim_join",
    "w2_w3_lag_and_diff",
    "w8_sliding_feature_window",
    "sql2_causal_features",
    "ev_tumbling_window_agg",
    "a8_maxabs_normalize",
    "x1_exact_dedup",
    "x2_minhash_lsh_dedup",
    "x3_topk_cosine_search",
    "x_text_quality",
    "k_w9_interpolate",
    "k_m4_sir_simulate",
    "k_w11_ar_forecast",
)


def emit_result(payload: dict, out_path: str | None = None) -> str:
    """Print the one-line JSON contract to stdout AND persist the same
    JSON to a file (default bench_out.json next to this script, or
    $SPARK_GRAFT_BENCH_OUT). The stdout line is the driver contract and
    stays byte-identical; the file exists so a truncated stdout capture
    can never again lose the round's record (r15's PERF had n_common=0
    because BENCH_r14's captured tail was cut mid-JSON). Returns the
    serialized line."""
    line = json.dumps(payload)
    print(line)
    path = out_path or os.environ.get(
        "SPARK_GRAFT_BENCH_OUT",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "bench_out.json"),
    )
    try:
        with open(path, "w") as f:
            f.write(line + "\n")
    except OSError as e:  # the file is belt-and-braces, never fatal
        print(f"bench_out write failed: {e}", file=sys.stderr)
    return line


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .appName("engage-spark-bench")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from engage_spark.registry import load_all

    registry = load_all()
    names = [n for n in HEADLINE if n in registry]
    names += [n for n in OPTIONAL if n in registry]
    # SPARK_GRAFT_BENCH_SUBSET=r1 restricts the run to the frozen
    # 15-query baseline subset — the standing sf1 scale point (r15,
    # VERDICT r14 #7: scripts/bench_sf1.sh emits BENCH_sf1_r{N}.json
    # each round so scale regressions surface like sf0.1 ones do).
    if os.environ.get("SPARK_GRAFT_BENCH_SUBSET") == "r1":
        names = [n for n in R1_BASELINE if n in registry]

    def run(name: str) -> float:
        # fn() is inside the timed region: for streaming (st_*) queries
        # the AvailableNow drain executes there, and for batch queries
        # plan construction is millisecond noise against the min-of-two
        # pass policy — this times what a user actually waits for.
        t0 = time.perf_counter()
        df = registry[name].fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    run("q1_pricing_summary")  # warm-up: JVM, codegen, parquet footer cache

    # Warm the Python worker pool too: the first pandas-UDF stage of a
    # session forks one worker per task slot, each importing
    # numpy/pandas (~2-7s burst for 8-32 workers contending on CPU).
    # That is session start-up cost of the same kind as JVM/codegen
    # warm-up — a steady-state service pays it once, not per query —
    # so it belongs in the warm-up, not in whichever pandas-UDF query
    # happens to run first (it made x2's number swing 1.2s<->12s).
    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf("double")
    def _noop_pdf(v):  # pragma: no cover - bench-only
        import numpy as _np  # noqa: F401  (mirror kernel imports)
        return v * 1.0

    (
        spark.range(0, int(cpus) * 4, 1, int(cpus))
        .select(_noop_pdf(F.col("id").cast("double")).alias("v"))
        .write.format("noop").mode("overwrite").save()
    )

    # Three passes, per-query minimum: the bench box is a shared VM
    # with bursty noisy-neighbor throttling (observed: the same query
    # plan swinging 0.8s <-> 6.9s run-over-run with zero local load).
    # Min of full passes reports the machine-capability number rather
    # than whichever host hiccup a single pass happened to absorb.
    # r12: two -> three passes after the drift study (SCALE.md r12)
    # showed sub-1.5s fixed-overhead lines (x3_topk, k_w9) still
    # shedding one-time codegen/Python-worker cost on pass 2 — pass-3+
    # repeats are the steady state a resident service actually runs at,
    # and they reproduce the r10 numbers the r11 "drift" deviated from.
    timings: dict[str, float] = {}
    for _pass in range(3):
        for name in names:
            try:
                t = round(run(name), 3)
                prev = timings.get(name)
                timings[name] = t if prev is None or prev < 0 else min(prev, t)
            except Exception as e:  # noqa: BLE001 — report, don't abort the bench
                print(f"bench error {name}: {e}", file=sys.stderr)
                timings.setdefault(name, -1.0)

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    # The r1 baseline (BENCH_r01: 22.396 s) timed exactly these 15
    # queries; OPTIONAL has grown since, so `value` alone is not
    # comparable round-over-round. This subtotal is the
    # apples-to-apples number against BASELINE.md. Frozen by NAME (not
    # positional slices of the live lists) so inserts/reorders above
    # can never silently change the subset's composition.
    r1_set = R1_BASELINE
    r1_ok = [n for n in r1_set if timings.get(n, -1.0) >= 0]
    baseline_subset = round(sum(timings[n] for n in r1_ok), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    emit_result({
        "metric": "headline_total",
        "value": total,
        "unit": "sec",
        # n < 15 means an r1 query FAILED and the subtotal is not
        # comparable — never read the subtotal without checking n
        "baseline_subset_total": baseline_subset,
        "baseline_subset_n": len(r1_ok),
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    })
    spark.stop()


if __name__ == "__main__":
    main()
