"""Mixed-writer/reader concurrency soak over one versioned corpus
(round 14 — the shipped check for the staged-append + optimistic-MERGE
+ waitable-lease machinery).

One lang-partitioned, Z-CLUSTERED (doc_id, n_chars), version-logged,
stats-enabled documents corpus; R rounds of SEVEN threads racing it:

  appender x2   — disjoint nonce-keyed slices via append_dataset
                  (staged commit, lease only for the rename+log tail);
                  plain appends onto the clustered layout, so layout
                  health DEGRADES under ingest — exactly what the
                  racing optimizer exists to repair
  merger  x1    — an IDEMPOTENT MERGE (n_chars := doc_id*2+1 for a
                  fixed base-key set) via the optimistic upsert; any
                  number of applications converge to the same state
  deleter x1    — delete_rows on a fixed base-id slice (DV batch;
                  repeat batches are dropDuplicates-idempotent)
  optimizer x1  — optimize_incremental (r14 OPTIMISTIC: stages its
                  rewrite with no lease, commits iff every victim is
                  still live — commuting appends must never conflict
                  it, and it must never block them)
  applier x1    — apply_deletes (r14 OPTIMISTIC too: the physical
                  takedown stages unleased; a racing delete_rows is a
                  pending-set mutator that forces a restage, so the
                  rewrite can never settle keys it did not apply)
  reader  x2    — with_pinned_version + a stats-pruned read_where range +
                  a bloom point lookup (read_keys) on never-deleted
                  base ids, which must never raise (consistent-or-loud
                  means loud only for vacuumed history, never for a
                  racing commit), never return a torn count, and
                  return EXACTLY one row per probed id

The final state is DETERMINISTIC regardless of interleaving: merge
keys come from the base (always present), deletes target base ids
disjoint from merge keys, appends are globally disjoint. Validation:
  - zero unexpected exceptions across every thread and round;
  - history ops counts == operations performed, NO reconcile entries;
  - read_with_deletes == the closed-form expected frame (exact rows);
  - read_version(latest) == live view;
  - the stats sidecar prunes and read_where stays exact at the end;
  - the bloom sidecar (enabled at setup, harvested by every racing
    commit's hook) prunes and read_keys stays exact at the end.

Usage: python scripts/soak_concurrency.py [sf_dir] [rounds] [store]
`store` = "cas" runs the WHOLE soak against the reference
conditional-put CommitStore (r15 seam: lease + version-allocation
claims arbitrate through pure CAS semantics instead of filesystem
O_EXCL/rename — the object-store shape) — same validation bar.
Prints one JSON line with the verdict.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import threading

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    store = sys.argv[3] if len(sys.argv) > 3 else "default"
    if store == "cas":
        from engage_spark.commitstore import (
            InMemoryCASCommitStore,
            set_commit_store,
        )

        set_commit_store(InMemoryCASCommitStore())

    from engage_spark.io import (
        OptimizeConflict,
        TakedownConflict,
        append_dataset,
        apply_deletes,
        delete_rows,
        optimize_incremental,
        read_with_deletes,
        upsert_dataset,
        zorder_write,
    )
    from engage_spark.indexes import _bloom_prune, bloom_enable, read_keys
    from engage_spark.session import get_spark
    from engage_spark.stats import _stats_prune, read_where, stats_enable
    from engage_spark.versioning import (
        _replay_files,
        _vlog_entries,
        dataset_history,
        latest_version,
        with_pinned_version,
        read_version,
        version_log_enable,
    )

    spark = get_spark()
    root = tempfile.mkdtemp(prefix="soak_conc_")
    ds = f"{root}/corpus"
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "n_chars"
    )
    zorder_write(
        spark, d, ds, ["doc_id", "n_chars"], bits=16, num_files=4,
        partition_by=["lang"],
    )
    version_log_enable(spark, ds)
    stats_enable(spark, ds, ["doc_id", "n_chars"])
    bloom_enable(spark, ds, ["doc_id"])

    merge_keys = d.filter(F.col("doc_id") % 10 == 3)  # base-only keys
    delete_ids = d.filter(F.col("doc_id") % 10 == 6).select("doc_id")
    base_n = d.count()
    del_n = delete_ids.count()
    errs: list = []
    appends_done: list = []

    def slice_for(nonce: int):
        """The appended slice for one nonce — ONE definition shared by
        the appender and the expected-frame oracle (drift between two
        copies would silently invalidate the closed-form check)."""
        return d.filter(F.col("doc_id") % 10 == (nonce % 2)).select(
            (F.col("doc_id") + 1_000_000 * (nonce + 1)).alias("doc_id"),
            "lang", "n_chars",
        )

    def appender(nonce: int) -> None:
        try:
            # odd nonces go through the commit-time expectation gate
            # (clean data — the gate must be a no-op under the same
            # concurrency the ungated appenders race)
            gate = (
                {
                    "expectations": [
                        {"rule": "not_null", "col": "doc_id"},
                        {"rule": "in_range", "col": "n_chars", "lo": 0},
                    ]
                }
                if nonce % 2 == 1
                else {}
            )
            res = append_dataset(
                spark, slice_for(nonce), ds, partition_by=["lang"],
                lease_wait_s=180.0, **gate,
            )
            if gate and any(res["expectations"].values()):
                errs.append(f"appender {nonce}: spurious gate violations")
            appends_done.append(nonce)
        except Exception as e:  # pragma: no cover
            errs.append(f"appender: {e!r}")

    def merger() -> None:
        try:
            upd = merge_keys.select(
                "doc_id", "lang",
                (F.col("doc_id") * 2 + 1).cast("long").alias("n_chars"),
            )
            upsert_dataset(
                spark, ds, upd, ["doc_id"], partition_by=["lang"],
                assume_partition_stable=True, occ_retries=10,
                lease_wait_s=180.0,
            )
        except Exception as e:  # pragma: no cover
            errs.append(f"merger: {e!r}")

    def deleter() -> None:
        try:
            delete_rows(spark, ds, delete_ids, "doc_id")
        except Exception as e:  # pragma: no cover
            errs.append(f"deleter: {e!r}")

    def optimizer() -> None:
        try:
            optimize_incremental(
                spark, ds, target_file_bytes=1 << 20,
                lease_wait_s=180.0, occ_retries=20,
            )
        except OptimizeConflict:
            pass  # legitimate under adversarial contention; data intact
        except Exception as e:  # pragma: no cover
            errs.append(f"optimizer: {e!r}")

    def applier() -> None:
        try:
            apply_deletes(
                spark, ds, lease_wait_s=180.0, occ_retries=20,
            )
        except TakedownConflict:
            pass  # legitimate under adversarial contention; data intact
        except Exception:  # pragma: no cover
            import traceback

            errs.append(f"applier: {traceback.format_exc()}")

    def reader(k: int) -> None:
        # consistent-or-loud: a maintenance op renaming a resolved file
        # mid-scan fails loudly; with_pinned_version ships the
        # documented one-retry pattern (r15) instead of hand-rolling it
        try:
            n, v = with_pinned_version(spark, ds, lambda df: df.count())
            # any committed version holds at least the undeleted base:
            # appends only add, the merge never deletes, takedowns are
            # bounded by delete_ids — a count below this is a TORN read
            assert n >= base_n - del_n, f"torn snapshot: {n} at v{v}"
            assert v >= 1
            lo, hi = 10 + k, 400 + k
            try:
                got_n = read_where(spark, ds, "doc_id", lo, hi).count()
            except Exception:
                got_n = read_where(spark, ds, "doc_id", lo, hi).count()
            # base ids in [lo, hi] minus at most the deletable ones
            # are ALWAYS present — below that is a wrong prune
            floor = d.filter(
                (F.col("doc_id") >= lo) & (F.col("doc_id") <= hi)
                & (F.col("doc_id") % 10 != 6)
            ).count()
            assert got_n >= floor, f"pruned read lost rows: {got_n}<{floor}"
            # bloom point lookup: base ids with %10 in {1, 2} are never
            # deleted and never re-keyed, and appended copies live at
            # +1M offsets — every committed version holds EXACTLY one
            # row per id, so anything else is a wrong prune or a torn
            # read racing the concurrent commits
            probe = [11 + 10 * k, 12 + 10 * k, 41 + 10 * k]
            got_k = read_keys(spark, ds, "doc_id", probe).count()
            assert got_k == len(probe), (
                f"bloom lookup {probe} -> {got_k} rows"
            )
        except Exception as e:  # pragma: no cover
            errs.append(f"reader: {e!r}")

    for r in range(rounds):
        threads = [
            threading.Thread(target=appender, args=(2 * r,)),
            threading.Thread(target=appender, args=(2 * r + 1,)),
            threading.Thread(target=merger),
            threading.Thread(target=deleter),
            threading.Thread(target=optimizer),
            threading.Thread(target=applier),
            threading.Thread(target=reader, args=(r,)),
            threading.Thread(target=reader, args=(r + 7,)),
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

    # deterministic tail: the racing optimizer can legitimately find a
    # clean layout every time (the MERGE re-lays its touched partitions
    # on the frozen curve, repairing overlap before the optimizer
    # stages) — so force the case it exists for: one more plain append
    # degrades the layout, then an optimize MUST find victims, commit
    # an exact entry, and leave every read surface intact.
    tail_nonce = 2 * rounds
    append_dataset(
        spark, slice_for(tail_nonce), ds, partition_by=["lang"],
        lease_wait_s=180.0,
    )
    appends_done.append(tail_nonce)
    opt_tail = optimize_incremental(
        spark, ds, target_file_bytes=1 << 20, lease_wait_s=180.0,
    )
    if opt_tail["rewritten_files"] < 2:
        errs.append(f"tail optimize found no victims: {opt_tail}")
    # ...and a deterministic takedown settle: whatever the racing
    # appliers consumed, one final apply leaves the sidecar empty and
    # the pending set settled — the live view must be unchanged
    # (read_with_deletes is invariant under physical apply)
    apply_deletes(spark, ds, lease_wait_s=180.0)
    apply_tail = apply_deletes(spark, ds, lease_wait_s=180.0)
    if apply_tail != {
        "deleted_keys": 0, "rewritten_files": 0, "kept_files": 0,
    }:
        errs.append(f"tail apply left sidecar keys: {apply_tail}")

    ops = [x["op"] for x in dataset_history(spark, ds).collect()]
    live = read_with_deletes(spark, ds)
    # closed-form expected state
    expected = d
    for nonce in appends_done:
        expected = expected.unionByName(slice_for(nonce))
    expected = expected.withColumn(
        "n_chars",
        F.when(
            (F.col("doc_id") % 10 == 3) & (F.col("doc_id") < 1_000_000),
            F.col("doc_id") * 2 + 1,
        ).otherwise(F.col("n_chars")).cast("long"),
    ).filter(
        ~((F.col("doc_id") % 10 == 6) & (F.col("doc_id") < 1_000_000))
    )
    live_n, exp_n = live.count(), expected.count()
    diff = (
        live.select("doc_id", "lang", "n_chars")
        .exceptAll(expected.select("doc_id", "lang", "n_chars"))
        .count()
        + expected.select("doc_id", "lang", "n_chars")
        .exceptAll(live.select("doc_id", "lang", "n_chars"))
        .count()
    )
    v = latest_version(spark, ds)
    vread_n = read_version(spark, ds, v).count()
    names = _replay_files(_vlog_entries(spark, ds), v)
    kept, pruned = _stats_prune(spark, ds, names, "doc_id", 10, 60)
    rw = read_where(spark, ds, "doc_id", 10, 60)
    rw_exact = (
        rw.count()
        == live.filter(
            (F.col("doc_id") >= 10) & (F.col("doc_id") <= 60)
        ).count()
    )
    # bloom surface after the full soak: the sidecar covers every
    # live file (commit hooks fired through appends AND the staged
    # MERGE swaps) and a final lookup is exact vs the live view
    probe = [11, 12, 41, 1_000_011, 2_000_012]
    bkept, bpruned = _bloom_prune(spark, ds, names, "doc_id", probe)
    rk = read_keys(spark, ds, "doc_id", probe)
    rk_exact = (
        rk.count() == live.filter(F.col("doc_id").isin(probe)).count()
    )
    verdict = {
        "rounds": rounds,
        "commit_store": store,
        "errors": errs,
        "appends": ops.count("append"),
        "upserts": ops.count("upsert"),
        "logical_deletes": ops.count("logical_delete"),
        "optimizes": ops.count("optimize"),
        "takedown_applies": ops.count("vacuum_deletes"),
        "reconciles": ops.count("reconcile"),
        "live_rows": live_n,
        "expected_rows": exp_n,
        "row_diff": diff,
        "version_read_rows": vread_n,
        "stats_pruned": pruned,
        "read_where_exact": rw_exact,
        "bloom_pruned": bpruned,
        "read_keys_exact": rk_exact,
        "ok": (
            not errs
            and diff == 0
            and live_n == exp_n == vread_n
            and ops.count("append") == len(appends_done) == 2 * rounds + 1
            and ops.count("optimize") >= 1
            and ops.count("reconcile") == 0
            and rw_exact
            and rk_exact
        ),
    }
    print(json.dumps(verdict), flush=True)
    shutil.rmtree(root, ignore_errors=True)
    sys.exit(0 if verdict["ok"] else 1)


if __name__ == "__main__":
    main()
