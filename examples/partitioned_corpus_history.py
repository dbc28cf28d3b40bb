"""Version history on the STANDARD 100 TB layout — a hive-partitioned
corpus — composed only from the engine's registered operators (r13):

  1. PUBLISH   — write the corpus partitioned by language
                 (write_parquet partition_by) and enable the version
                 log: version 1 records the partition-relative file
                 paths (`lang=en/part-….parquet`), pure metadata.
  2. APPEND    — a re-crawl delivery lands via append_dataset: one
                 `append` entry holding exactly the increment's files,
                 inside their partition dirs.
  3. TAKEDOWN  — delete_rows records a right-to-be-forgotten batch as
                 a deletion vector (O(batch), no data file touched);
                 apply_deletes later vacuums it PARTITION-AWARE —
                 victims are read with basePath (partition values
                 survive) and survivors are rewritten inside their
                 partition dirs; clean partitions stay byte-identical.
  4. TIME TRAVEL — read_version reconstructs any version with its
                 partition COLUMN VALUES intact (live + retained
                 leaves each resolved against the right basePath),
                 and a partition predicate still prunes directories
                 (plan-pinned in tests/test_plans.py).
  5. FEED      — read_changes drains the row-level deltas; a
                 downstream replica (sync_mirror) converges keeping
                 the SAME partitioned layout (staged inserts land
                 partitionBy via relative-path moves), and an
                 incremental rollup (sync_rollup, count/sum + min/max
                 via the touched-group recompute tier) stays
                 hash-equal to a fresh aggregate.
  6. ROLLBACK  — restore_version rolls the live corpus back to the
                 publish version (metadata-only renames + the target's
                 deletion state re-recorded) and forward again —
                 the bad-delivery recovery path; history is never
                 rewritten and the mirror drains straight through it.
  7. MERGE     — the hourly CDC batch (updates + partition-moving
                 re-classifications + deletes) lands via
                 upsert_dataset on the SAME versioned partitioned
                 corpus (r14): touched partitions' files retain, the
                 staged slice renames in, one exact `upsert` entry —
                 time travel and the row-level feed work straight
                 through the commonest production op.
  8. SNAPSHOT  — read_snapshot pins one committed version for readers
                 while maintenance runs (r14): plain path reads can
                 tear mid-swap; the pinned read is consistent-or-loud.
  9. CONCURRENT INGEST — three delivery shards land via racing
                 append_dataset calls (r14): each stages with no lease
                 held and queues for the bounded rename+log commit
                 window, so ALL land with their own exact `append`
                 entry — no lost increment, no reconcile drift.
  10. STATS    — stats_enable harvests per-file min/max from parquet
                 footers (no data scan; later commits auto-harvest),
                 and read_where answers a range predicate scheduling
                 only the files whose range can overlap (r14).
  11. BLOOM    — bloom_enable indexes doc_id per file (r14); a point
                 fetch (read_keys) schedules only files whose bloom
                 admits a key, and a takedown's physical apply
                 (delete_rows → apply_deletes) confirms victims
                 against the same index instead of scanning the key
                 column of every file — the GDPR path at 10^5 files.

Run:

  python examples/partitioned_corpus_history.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def run(spark: SparkSession, sf_dir: str, workdir: str) -> dict:
    from engage_spark.io import (
        append_dataset,
        apply_deletes,
        delete_rows,
        read_with_deletes,
        table,
        upsert_dataset,
        write_parquet,
    )
    from engage_spark.versioning import (
        dataset_history,
        read_changes,
        with_pinned_version,
        read_version,
        restore_version,
        sync_mirror,
        sync_rollup,
        version_log_enable,
    )

    corpus = os.path.join(workdir, "corpus")
    mirror = os.path.join(workdir, "mirror")
    rollup = os.path.join(workdir, "rollup")
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    first, recrawl = (
        docs.filter(F.col("doc_id") % 2 == 0),
        docs.filter(F.col("doc_id") % 2 == 1),
    )

    # 1. PUBLISH (partitioned) + enable history
    write_parquet(first, corpus, partition_by=["lang"])
    version_log_enable(spark, corpus)                           # v1
    sync_mirror(spark, corpus, mirror, "doc_id")                # bootstrap
    sync_rollup(
        spark, corpus, rollup, ["lang"], ["n_chars"],
        minmax_cols=["n_chars"],
    )

    # 2. APPEND the re-crawl delivery
    append_dataset(spark, recrawl, corpus, partition_by=["lang"])  # v2

    # 3. TAKEDOWN + partition-aware vacuum
    doomed = docs.filter(F.col("doc_id") % 53 == 0).select("doc_id")
    delete_rows(spark, corpus, doomed, "doc_id")                # v3
    apply_deletes(spark, corpus)                                # v4

    # 4. TIME TRAVEL — publish-time corpus, partition values intact
    v1 = read_version(spark, corpus, 1)
    assert v1.count() == first.count()
    assert v1.filter(F.col("lang").isNull()).count() == 0

    # 5. FEED consumers converge on the same partitioned layout
    sync_mirror(spark, corpus, mirror, "doc_id")
    sync_rollup(
        spark, corpus, rollup, ["lang"], ["n_chars"],
        minmax_cols=["n_chars"],
    )
    live = read_with_deletes(spark, corpus)
    # materialize the COUNT now: `live` pins file paths, and the
    # restore/MERGE below MOVE those files — re-evaluating the frame
    # afterwards is the exact torn-read race read_snapshot exists for
    live_n = live.count()
    assert spark.read.parquet(mirror).count() == live_n
    fresh = live.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"), F.min("n_chars").alias("mn")
    )
    mv = spark.read.parquet(rollup).select(
        "lang", "n", F.col("min_n_chars").alias("mn")
    )
    assert fresh.exceptAll(mv).count() == 0 and mv.exceptAll(fresh).count() == 0

    # what changed since publish, straight off the log
    feed_counts = {
        (r["change_type"]): r["n"]
        for r in read_changes(spark, corpus, 1)
        .groupBy("change_type").agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }

    # 6. ROLLBACK to publish, then roll forward; the mirror follows
    restore_version(spark, corpus, 1)                           # v5
    assert read_with_deletes(spark, corpus).count() == first.count()
    restore_version(spark, corpus, 4)                           # v6
    assert read_with_deletes(spark, corpus).count() == live_n
    sync_mirror(spark, corpus, mirror, "doc_id")
    assert spark.read.parquet(mirror).count() == live_n

    # 7. MERGE — the hourly CDC batch, fully versioned (r14)
    batch = (
        docs.filter(F.col("doc_id") % 40 == 0)
        .withColumn("n_chars", (F.col("n_chars") + 7).cast("long"))
        .withColumn(
            "lang",
            F.when(F.col("doc_id") % 80 == 0, F.lit("xx")).otherwise(
                F.col("lang")
            ),
        )
        .withColumn("is_delete", F.col("doc_id") % 120 == 0)
    )
    upsert_dataset(
        spark, corpus, batch, ["doc_id"], partition_by=["lang"],
        delete_col="is_delete",
    )                                                           # v7
    assert dataset_history(spark, corpus).filter(
        F.col("op") == "upsert"
    ).count() == 1
    # history through the MERGE is exact: the pre-merge version still
    # reads byte-for-byte, and the feed carries its row-level delta
    assert read_version(spark, corpus, 6).count() == live_n
    merged_live = read_with_deletes(spark, corpus)
    sync_mirror(spark, corpus, mirror, "doc_id")
    assert spark.read.parquet(mirror).count() == merged_live.count()

    # 8. SNAPSHOT-ISOLATED read while maintenance may run — the
    # shipped helper pins a version, acts, and retries ONCE at the
    # same pin if a racing maintenance op moved a resolved file
    merged_n, v_pin = with_pinned_version(
        spark, corpus, lambda df: df.count()
    )

    # 9. CONCURRENT INGEST — three shards race; all land exactly once
    import threading

    shards = [
        docs.filter(F.col("doc_id") % 3 == k).select(
            (F.col("doc_id") + 1_000_000 * (k + 1)).alias("doc_id"),
            "lang", "source", "n_chars",
        )
        for k in range(3)
    ]
    errs: list = []

    def _ingest(shard):
        try:
            append_dataset(spark, shard, corpus, partition_by=["lang"])
        except Exception as e:  # pragma: no cover - surfaced below
            errs.append(e)

    threads = [threading.Thread(target=_ingest, args=(s,)) for s in shards]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
    hist_ops = [
        r["op"] for r in dataset_history(spark, corpus).collect()
    ]
    assert hist_ops.count("append") == 1 + 3  # the re-crawl + 3 shards
    assert "reconcile" not in hist_ops
    ingested = read_with_deletes(spark, corpus)
    pre_n = ingested.count()  # evaluated ONCE; reused through stage 11
    assert pre_n == merged_n + sum(s.count() for s in shards)

    # 10. STATS — footer harvest + data-skipping range read
    from engage_spark.stats import _stats_prune, read_where, stats_enable
    from engage_spark.versioning import _replay_files, _vlog_entries
    from engage_spark.versioning import latest_version as _latest

    stats_enable(spark, corpus, ["lang", "n_chars"])
    names = _replay_files(
        _vlog_entries(spark, corpus), _latest(spark, corpus)
    )
    kept, n_pruned = _stats_prune(spark, corpus, names, "lang", "en", "en")
    en_rows = read_where(spark, corpus, "lang", "en", "en")
    expect_en = ingested.filter(F.col("lang") == "en")
    assert en_rows.count() == expect_en.count()
    assert n_pruned > 0  # other languages' files never scheduled

    # 11. BLOOM — point lookups + a bloom-targeted takedown
    from engage_spark.indexes import _bloom_prune, bloom_enable, read_keys

    bloom_enable(spark, corpus, ["doc_id"])
    some_ids = [
        r["doc_id"] for r in ingested.select("doc_id").limit(3).collect()
    ]
    fetched = read_keys(spark, corpus, "doc_id", some_ids)
    assert fetched.count() == len(some_ids)
    # `names` from stage 10 is still the live replay: bloom_enable
    # writes only a sidecar, no data commit between the two stages
    b_kept, b_pruned = _bloom_prune(spark, corpus, names, "doc_id", some_ids)
    assert b_pruned > 0  # files that cannot hold these ids never scheduled
    # takedown: logical first (O(batch)), physical apply confirms its
    # victims through the same bloom index (only candidate files get
    # the confirmation scan), clean files stay byte-identical
    victim_ids = some_ids[:2]
    # pre_n was captured BEFORE the apply: `ingested` was planned
    # against pre-apply files, so re-evaluating it after the rewrite
    # would hit the documented stale-file-index race — the same class
    # stage 8 pins with read_snapshot
    delete_rows(spark, corpus, victim_ids, "doc_id")
    res = apply_deletes(spark, corpus)
    assert res["deleted_keys"] == len(victim_ids)
    # fresh reads re-list and see the post-apply file set (verified:
    # only STALE pre-apply plans fail — the read_snapshot contract)
    after = read_with_deletes(spark, corpus)
    assert after.count() == pre_n - len(victim_ids)
    assert after.filter(F.col("doc_id").isin(victim_ids)).count() == 0
    # the rewritten files' blooms were re-harvested by the commit hook,
    # so lookups stay exact after the apply
    assert read_keys(spark, corpus, "doc_id", victim_ids).count() == 0
    assert (
        read_keys(spark, corpus, "doc_id", some_ids[2:]).count()
        == len(some_ids) - 2
    )

    return {
        "versions": dataset_history(spark, corpus).count(),
        "live_rows": after.count(),
        "pinned_version": v_pin,
        "feed": feed_counts,
        "stats_files_kept": f"{len(kept)}/{len(names)}",
        "bloom_files_kept": f"{len(b_kept)}/{len(names)}",
        "takedown_rewrote": res["rewritten_files"],
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    workdir = "/tmp/_partitioned_corpus_history"
    shutil.rmtree(workdir, ignore_errors=True)
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("partitioned-corpus-history")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = run(spark, sf_dir, workdir)
    print(out)
    shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
