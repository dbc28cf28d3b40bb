"""One full corpus-maintenance cycle — the operational loop the
round-9/10 storage pieces were built for, composed ONLY from the
engine's registered operators:

  1. INGEST   — streaming micro-batches with exact + near-dup
                admission (incremental_ingest_stream: fingerprint
                anti-join + persisted MinHash index, idempotent
                run=<tag>_batch=<id> partitions).
  2. GATE     — validate_expectations over the admitted corpus: the
                declarative pre-publish contract check (one
                aggregation over one scan). A failing gate stops the
                cycle before anything is published.
  3. COMPACT  — compact_ingest_state collapses the finished run's
                micro-batch partition debris (corpus + fingerprint
                store) into right-sized run=history files, keeping the
                hive layout the next run's appends require.
  4. OPTIMIZE — optimize_dataset publishes the corpus Z-ordered on
                (doc_id, n_chars): compaction sizing + Morton
                clustering in one rewrite, so point lookups by id and
                range scans by document length both prune on footer
                stats alone.
  5. TAKEDOWN — minhash_index_delete tombstones a document out of the
                near-dup index (round-10 delete path) and delete_rows
                appends its key to the published corpus's deletion
                sidecar (r11) — the right-to-be-forgotten flow at
                O(batch): NO data file is touched, the Z-order layout
                survives, reads go through read_with_deletes, and the
                physical rewrite is a scheduled apply_deletes vacuum.
                (upsert_dataset remains the path for partitioned
                corpora and value UPDATES — s9 exercises it.)
  6. DRIFT + AUTO-REOPTIMIZE — later deliveries zorder_append onto the
                published layout (frozen curve); zorder_layout_stats
                is the MEASURED trigger: when overlap_fraction crosses
                _REOPT_OVERLAP the loop runs optimize_incremental IN
                PLACE — rewriting ONLY the overlapping-file set (at
                100 TB that is the appended 1%, not the table) after
                optimize_recover clears any interrupted prior pass —
                and verifies the layout health recovered. This is the
                OPTIMIZE cadence a production table service runs from
                stats, not a timer.

  7. HISTORY  — the publish boundary enables the version log (r12):
                takedown, appends and the reoptimize are all logged
                versions, the publish-time corpus stays exactly
                readable (read_version), the cycle's net change is an
                only-changed-files version_diff, and vacuum_versions
                applies the retention policy.

  8. MIRROR   — a downstream replica (sync_mirror, r12) bootstraps at
                the publish version and then drains ONLY the cycle's
                logged changes off the change data feed — append files
                directly, the takedown as an In-pushed key purge, the
                reoptimize skipped — converging to the live content
                without re-reading the corpus. Drains run BEFORE
                vacuum_versions (retention must not outrun consumers).

Each stage is the SAME function a production job would schedule; this
script only sequences them. Run:

  python examples/corpus_maintenance_loop.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

# OPTIMIZE trigger: re-cluster when more than this fraction of file
# pairs overlap in Z-range. Measured at sf0.001 (test) and sf0.01:
# a fresh optimize_dataset layout sits at ~0.0 and three appended
# micro-batches push past ~0.3, so 0.10 separates the states cleanly
# while tolerating a single small append between cycles.
_REOPT_OVERLAP = 0.10


def run(spark: SparkSession, sf_dir: str, workdir: str) -> dict:
    from engage_spark.api import (
        minhash_index_delete,
        minhash_index_query,
        validate_expectations,
    )
    from engage_spark.io import (
        compact_ingest_state,
        optimize_dataset,
    )
    from engage_spark.streaming.jobs import incremental_ingest_stream

    # ---- 1. INGEST ------------------------------------------------
    delivery = f"{workdir}/delivery"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    docs.repartition(4).write.parquet(delivery)  # 4 drops = 4 batches
    corpus, store = f"{workdir}/corpus", f"{workdir}/fingerprints"
    nd_index = f"{workdir}/near_dup_index"
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(delivery)
    )
    incremental_ingest_stream(
        stream, corpus, store, near_dup_index=nd_index
    ).awaitTermination()
    admitted_df = spark.read.parquet(corpus)
    admitted = admitted_df.count()

    # ---- 2. GATE --------------------------------------------------
    gate = validate_expectations(
        admitted_df,
        [
            {"rule": "not_null", "col": "doc_id"},
            {"rule": "unique", "col": "doc_id"},
            {"rule": "not_null", "col": "text"},
            {"rule": "expr", "id": "nonempty_text", "expr": "length(text) > 0"},
        ],
    ).collect()
    gate_passed = all(r["passed"] for r in gate)
    if not gate_passed:
        failed = [r["rule_id"] for r in gate if not r["passed"]]
        raise RuntimeError(
            f"corpus failed its expectations gate ({failed}); "
            "not publishing this cycle"
        )

    # ---- 3. COMPACT -----------------------------------------------
    compacted_store = f"{workdir}/fingerprints_compacted"
    compacted_corpus = f"{workdir}/corpus_compacted"
    compact_ingest_state(spark, store, compacted_store)
    compacted_files = compact_ingest_state(spark, corpus, compacted_corpus)

    # ---- 4. OPTIMIZE ----------------------------------------------
    publish_src = f"{workdir}/publish_src"
    published = f"{workdir}/published"
    (
        spark.read.parquet(compacted_corpus)
        .select(
            "doc_id",
            "text",
            # long from the start: the takedown upsert's updates frame
            # declares n_chars long, and unionByName would silently
            # promote the merged files — appends must match file types
            F.length("text").cast("long").alias("n_chars"),
        )
        .write.parquet(publish_src)
    )
    optimized_files = optimize_dataset(
        spark, publish_src, published, ["doc_id", "n_chars"]
    )
    # start version history at the publish boundary (r12): every later
    # takedown/append/reoptimize below is a logged version — "read the
    # corpus as of the audit date" without ever copying a snapshot
    from engage_spark.versioning import sync_mirror, version_log_enable

    version_log_enable(spark, published)
    # a downstream replica bootstraps at the publish version; it
    # drains ONLY this cycle's changes at the end of the loop (stage 8)
    mirror = f"{workdir}/mirror"
    sync_mirror(spark, published, mirror, "doc_id")

    # ---- 5. TAKEDOWN ----------------------------------------------
    victim = admitted_df.select("doc_id", "text").orderBy("doc_id").limit(1)
    vrow = victim.collect()[0]
    probe = spark.createDataFrame(
        [(10_000_000, vrow.text)], "doc_id long, text string"
    )
    matches_before = (
        minhash_index_query(nd_index, probe, jaccard_threshold=0.9)
        .filter(F.col("corpus_id") == vrow.doc_id)
        .count()
    )
    minhash_index_delete(nd_index, [int(vrow.doc_id)], spark=spark)
    matches_after = (
        minhash_index_query(nd_index, probe, jaccard_threshold=0.9)
        .filter(F.col("corpus_id") == vrow.doc_id)
        .count()
    )
    from engage_spark.io import delete_rows, read_with_deletes

    delete_rows(spark, published, [int(vrow.doc_id)], "doc_id")
    published_rows = read_with_deletes(spark, published).count()

    # ---- 6. DRIFT + AUTO-REOPTIMIZE --------------------------------
    # appended micro-batches stay on the frozen curve but their files
    # OVERLAP existing files' Z-ranges; overlap_fraction is the
    # measured trigger (SCALE.md §zorder documents the threshold)
    from engage_spark.io import (
        optimize_incremental,
        optimize_recover,
        zorder_append,
        zorder_layout_stats,
    )

    base = spark.read.parquet(publish_src)
    for c in range(1, 4):
        inc = base.select(
            (F.col("doc_id") + 1_000_000 * c).alias("doc_id"),
            "text",
            "n_chars",
        ).limit(200)
        zorder_append(spark, inc, published, num_files=2)
    drift = zorder_layout_stats(spark, published)
    reoptimized = False
    final_stats = drift
    rewritten = 0
    if drift["overlap_fraction"] > _REOPT_OVERLAP:
        optimize_recover(spark, published)  # clear any interrupted pass
        rewritten = optimize_incremental(spark, published)["rewritten_files"]
        final_stats = zorder_layout_stats(spark, published)
        reoptimized = True

    # ---- 7. HISTORY -----------------------------------------------
    # the audit surface the log bought: every maintenance event above
    # is a version; the publish-time corpus is still exactly readable
    # (the takedown victim included), and the cycle's net change is one
    # only-changed-files diff, not a two-copy comparison. Retention is
    # a policy knob: vacuum_versions reclaims retained files outside
    # the keep-last horizon.
    from engage_spark.versioning import (
        dataset_history,
        read_version,
        vacuum_versions,
        version_diff,
    )

    hist = dataset_history(spark, published).collect()  # bounded: events
    history_ops = [r["op"] for r in sorted(hist, key=lambda r: r["version"])]
    latest = max(r["version"] for r in hist)
    v1_rows = read_version(spark, published, 1).count()
    diff_counts = {
        r["change"]: r["n"]
        for r in version_diff(spark, published, 1, latest)
        .groupBy("change").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # ---- 8. MIRROR -------------------------------------------------
    # the replica drains ONLY this cycle's logged changes (the three
    # append versions read just their files, the takedown probes with
    # an In-pushed key, the reoptimize version is skipped outright) —
    # and it drains BEFORE vacuum_versions, which is the operational
    # ordering contract: vacuum reclaims retained files a lagging
    # consumer might still need
    sync = sync_mirror(spark, published, mirror, "doc_id")
    mirror_converged = (
        spark.read.parquet(mirror).count()
        == read_with_deletes(spark, published).count()
    )
    vacuumed = vacuum_versions(spark, published, keep_last=3)

    # ---- 9. NIGHTLY ------------------------------------------------
    # stages 3-7 ARE what maintain_dataset schedules. Stage 5 left the
    # takedown PENDING by design ("the physical rewrite is a scheduled
    # apply_deletes vacuum") — the one-call nightly pass is that
    # scheduler: it applies the backlog, re-checks layout health, and
    # a second call proves convergence by no-oping. dataset_details is
    # the DESCRIBE DETAIL row a dashboard polls — pure metadata.
    from engage_spark.maintenance import dataset_details, maintain_dataset

    nightly = maintain_dataset(spark, published)
    assert nightly["apply_deletes"]["deleted_keys"] >= 1
    nightly2 = maintain_dataset(spark, published)
    assert "apply_deletes" not in nightly2 and "optimize" not in nightly2
    detail = dataset_details(spark, published).collect()[0]
    assert detail["pending_delete_keys"] == 0
    assert detail["pending_dv_versions"] == 0
    assert detail["clustered_by"] == "doc_id,n_chars"

    return {
        "nightly_applied": nightly["apply_deletes"]["deleted_keys"],
        "nightly_noop": sorted(nightly2),
        "detail_versioned": bool(detail["versioned"]),
        "detail_latest_version": int(detail["latest_version"]),
        "drift_overlap": round(drift["overlap_fraction"], 4),
        "drift_avg_covering": round(drift["avg_covering"], 4),
        "reoptimized": reoptimized,
        "rewritten_files": rewritten,
        "final_overlap": round(final_stats["overlap_fraction"], 4),
        "final_avg_covering": round(final_stats["avg_covering"], 4),
        "delivered": docs.count(),
        "admitted": admitted,
        "gate_passed": gate_passed,
        "compacted_files": compacted_files,
        "optimized_files": optimized_files,
        "takedown_matches_before": matches_before,
        "takedown_matches_after": matches_after,
        "published_rows": published_rows,
        "history_ops": history_ops,
        "publish_version_rows": v1_rows,
        "latest_version": latest,
        "cycle_diff": diff_counts,
        "mirror_synced": (sync["from_version"], sync["to_version"]),
        "mirror_converged": mirror_converged,
        "vacuum": vacuumed,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count()}]")
        .appName("corpus-maintenance-loop")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    with tempfile.TemporaryDirectory() as tmp:
        print(run(spark, sf_dir, tmp))


if __name__ == "__main__":
    main()
