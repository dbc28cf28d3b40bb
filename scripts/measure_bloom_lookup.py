"""Per-file Bloom index effectiveness for point lookups + takedown
victim detection (SCALE.md evidence).

Claim under test: on a layout where the key is SCATTERED (Z-ordered on
other columns — the case min/max stats cannot prune), a B-key lookup
through ``indexes.read_keys`` schedules only the files whose bloom
admits a key, the pruned read equals filtering the full read, and
``apply_deletes`` victim detection confirms-scans only those candidate
files instead of the whole key column. The local wall delta
understates the cluster win for the same reason as the stats study
(both paths pay one driver here; at 10^5 files the unpruned path pays
listing + a key-column scan task per file across the fleet — the
file-count ratio is the transferable number).

Method: Z-order `events` (sf dir arg) on (user_id, v_cents) into N
files, enable version log + bloom on event_id, then for a ladder of
lookup batch sizes measure (a) candidate files vs total, (b) wall of
read_keys vs a plain IN-filtered path read, (c) result equality; then
take down one batch and compare bloom-targeted vs untargeted
apply_deletes victim-detection wall (the detection scan only — the
rewrite cost is identical by construction).

Usage: python scripts/measure_bloom_lookup.py [sf_dir] [num_files] [fpp]
  fpp (default 0.01) demonstrates the sizing rule: per-batch false
  positives compound as B*fpp, so batch lookups want a tighter rate.
Prints ONE JSON line per batch size plus one for victim detection:
  {"lookup_keys": B, "files_kept": k, "files_total": n,
   "bloom_wall_s": ..., "plain_wall_s": ..., "rows": r, "exact": true}
  {"victim_detection": {...}}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    num_files = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    fpp = float(sys.argv[3]) if len(sys.argv) > 3 else 0.01

    from engage_spark.indexes import _bloom_prune, bloom_enable, read_keys
    from engage_spark.io import zorder_write
    from engage_spark.session import get_spark
    from engage_spark.versioning import (
        _live_names,
        _read_names,
        _replay_files,
        _vlog_entries,
        latest_version,
        version_log_enable,
    )

    spark = get_spark()
    root = tempfile.mkdtemp(prefix="bloom_lookup_")
    ds = f"{root}/events_z"
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id",
        "user_id",
        F.round(F.col("value") * 100 + 1e-9).cast("long").alias("v_cents"),
    )
    n_rows = ev.count()
    zorder_write(
        spark, ev, ds, ["user_id", "v_cents"], bits=16, num_files=num_files
    )
    version_log_enable(spark, ds)
    t0 = time.monotonic()
    bloom_enable(spark, ds, ["event_id"], fpp=fpp)
    build_s = time.monotonic() - t0
    print(
        json.dumps(
            {
                "build_files": num_files,
                "rows": n_rows,
                "fpp": fpp,
                "build_s": round(build_s, 3),
            }
        ),
        flush=True,
    )
    names = _replay_files(_vlog_entries(spark, ds), latest_version(spark, ds))

    from engage_spark.versioning import read_version

    for b in (1, 10, 100, 1000):
        stride = max(1, n_rows // b)
        keys = list(range(0, stride * b, stride))[:b]
        kept, _ = _bloom_prune(spark, ds, names, "event_id", keys)
        t0 = time.monotonic()
        got = read_keys(spark, ds, "event_id", keys).count()
        bloom_s = time.monotonic() - t0
        # versioned-but-unpruned: isolates the pruning win from the
        # version-log machinery read_keys also pays
        t0 = time.monotonic()
        unpruned = (
            read_version(spark, ds, latest_version(spark, ds))
            .filter(F.col("event_id").isin(keys))
            .count()
        )
        unpruned_s = time.monotonic() - t0
        t0 = time.monotonic()
        plain = (
            spark.read.parquet(ds).filter(F.col("event_id").isin(keys)).count()
        )
        plain_s = time.monotonic() - t0
        print(
            json.dumps(
                {
                    "lookup_keys": b,
                    "files_kept": len(kept),
                    "files_total": len(names),
                    "bloom_wall_s": round(bloom_s, 3),
                    "unpruned_versioned_wall_s": round(unpruned_s, 3),
                    "plain_wall_s": round(plain_s, 3),
                    "rows": got,
                    # exactness = the three reads agree; `rows` can be
                    # < lookup_keys on datasets whose id domain is
                    # sparse over [0, n_rows) (the sf1 blow-up shifts
                    # copies by +10M) — absent keys match nothing on
                    # every path, which is itself part of the contract
                    "exact": got == unpruned == plain,
                }
            ),
            flush=True,
        )

    # victim detection: the same 100-key batch, detection scan only
    keys = list(range(0, (n_rows // 100) * 100, n_rows // 100))[:100]
    live = _live_names(spark, ds)
    t0 = time.monotonic()
    cand, _ = _bloom_prune(spark, ds, live, "event_id", keys)
    v_bloom = (
        _read_names(spark, ds, cand)
        .select(F.input_file_name().alias("f"), "event_id")
        .filter(F.col("event_id").isin(keys))
        .select("f")
        .distinct()
        .count()
    )
    bloom_s = time.monotonic() - t0
    t0 = time.monotonic()
    v_plain = (
        spark.read.parquet(ds)
        .select(F.input_file_name().alias("f"), "event_id")
        .filter(F.col("event_id").isin(keys))
        .select("f")
        .distinct()
        .count()
    )
    plain_s = time.monotonic() - t0
    print(
        json.dumps(
            {
                "victim_detection": {
                    "keys": len(keys),
                    "candidate_files": len(cand),
                    "files_total": len(live),
                    "victims": v_bloom,
                    "bloom_wall_s": round(bloom_s, 3),
                    "plain_wall_s": round(plain_s, 3),
                    "exact": v_bloom == v_plain,
                }
            }
        ),
        flush=True,
    )
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
