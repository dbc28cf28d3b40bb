"""Log-owned versioned reads (round 15, VERDICT r14 #1): every
versioned READ path resolves its file list purely from the version log
+ snapshot checkpoints — ZERO directory walks — so read planning cost
is flat in live-file count (the last listing-shaped scale wall at 10^6
files on object stores). Drift healing (`_vlog_reconcile`) is writer/
maintenance contact only — the Delta model.

Pins: (a) none of read_version / read_snapshot / read_version_at /
dataset_history / version_diff / read_changes / read_where / read_keys
/ join_keys calls `_live_names` (the walk primitive); (b) results stay
byte-identical to the pre-change shape; (c) out-of-band files are
INVISIBLE to log-owned reads until a writer/maintenance op reconciles,
then visible — the demotion is a documented semantic, not a leak.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import engage_spark.versioning as V
from engage_spark.io import (
    append_dataset,
    delete_rows,
    optimize_incremental,
    write_parquet,
    zorder_write,
)
from engage_spark.versioning import (
    dataset_history,
    latest_version,
    read_changes,
    read_snapshot,
    read_version,
    read_version_at,
    version_diff,
    version_log_enable,
)


def _ev(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "event_type",
        F.round(F.col("value") * 100 + 1e-9).cast("long").alias("v_cents"),
    )


@pytest.fixture()
def vds(spark, sf_dir, tmp_path):
    """A versioned dataset with history worth reading: init → append →
    logical_delete → optimize (moves files to retained/), plus stats +
    bloom sidecars so the pruned read paths exercise end to end."""
    from engage_spark.indexes import bloom_enable
    from engage_spark.stats import stats_enable

    out = str(tmp_path / "logowned")
    ev = _ev(spark, sf_dir)
    zorder_write(
        spark, ev.filter(F.col("event_id") % 3 == 0), out,
        ["user_id", "v_cents"], bits=16, num_files=4,
    )
    version_log_enable(spark, out)
    stats_enable(spark, out, ["v_cents"])
    bloom_enable(spark, out, ["event_id"])
    append_dataset(spark, ev.filter(F.col("event_id") % 3 == 1), out)
    delete_rows(
        spark, out,
        ev.filter(F.col("event_id") % 100 == 7).select("event_id"),
        "event_id",
    )
    optimize_incremental(spark, out, target_file_bytes=1 << 30)
    return out, ev


class _WalkTripwire:
    """Replace versioning._live_names with a loud failure — any read
    path that still walks the dataset directory fails the test with
    the call site in the traceback."""

    def __init__(self, monkeypatch):
        self.calls = 0

        def _trip(spark, path):
            self.calls += 1
            raise AssertionError(
                "directory walk (_live_names) on a READ path — "
                "log-owned reads must resolve files from the log"
            )

        monkeypatch.setattr(V, "_live_names", _trip)


def test_reads_never_walk(spark, vds, monkeypatch):
    out, ev = vds
    hi = latest_version(spark, out)
    expected = read_version(spark, out, hi).count()  # pre-patch truth
    trip = _WalkTripwire(monkeypatch)

    df, v = read_snapshot(spark, out)
    assert v == hi and df.count() == expected
    assert read_version(spark, out, 1).count() > 0
    assert read_version(spark, out, hi).count() == expected
    ts = [r["ts_unix"] for r in dataset_history(spark, out).collect()]
    assert read_version_at(spark, out, max(ts)).count() == expected
    assert dataset_history(spark, out).count() == hi
    assert version_diff(spark, out, 1, hi).count() > 0
    assert read_changes(spark, out, 1).count() > 0

    from engage_spark.indexes import join_keys, read_keys
    from engage_spark.stats import read_where

    ids = [r[0] for r in ev.select("event_id").limit(5).collect()]
    got = read_keys(spark, out, "event_id", ids)
    want = read_version(spark, out, hi).filter(F.col("event_id").isin(ids))
    assert got.count() == want.count()
    lo_hi = read_version(spark, out, hi).agg(
        F.min("v_cents"), F.max("v_cents")
    ).collect()[0]
    mid = (lo_hi[0] + lo_hi[1]) // 2
    assert (
        read_where(spark, out, "v_cents", lo_hi[0], mid).count()
        == read_version(spark, out, hi)
        .filter(F.col("v_cents").between(lo_hi[0], mid))
        .count()
    )
    keys_df = ev.select("event_id").limit(3)
    assert join_keys(spark, out, "event_id", keys_df).count() > 0
    assert trip.calls == 0  # tripwire never even entered a tolerated path


def test_out_of_band_drift_heals_at_writer_contact(spark, sf_dir, tmp_path):
    """Log-owned reads TRUST the log: a file dropped into the dataset
    directory by an out-of-band writer is invisible to read_version
    until the next writer/maintenance contact reconciles it — then it
    appears in both the history (a `reconcile` entry) and the read."""
    import glob
    import shutil

    out = str(tmp_path / "drift")
    ev = _ev(spark, sf_dir)
    write_parquet(ev.filter(F.col("event_id") % 2 == 0), out)
    version_log_enable(spark, out)
    n0 = read_version(spark, out, 1).count()

    # out-of-band: a foreign writer drops a parquet part straight in
    stray_src = str(tmp_path / "stray")
    ev.filter(F.col("event_id") % 2 == 1).limit(100).coalesce(
        1
    ).write.parquet(stray_src)
    part = glob.glob(f"{stray_src}/part-*.parquet")[0]
    shutil.copy(part, f"{out}/stray-out-of-band.parquet")

    # log-owned read: still the committed version, stray invisible
    assert read_version(spark, out, latest_version(spark, out)).count() == n0
    assert dataset_history(spark, out).filter(
        F.col("op") == "reconcile"
    ).count() == 0

    # maintenance contact heals: the one-call ops surface reconciles
    from engage_spark.maintenance import maintain_dataset

    maintain_dataset(spark, out)
    assert dataset_history(spark, out).filter(
        F.col("op") == "reconcile"
    ).count() == 1
    assert (
        read_version(spark, out, latest_version(spark, out)).count()
        == n0 + 100
    )


def test_time_travel_resolves_retained_without_walk(
    spark, sf_dir, tmp_path, monkeypatch
):
    """Old versions whose files were moved to retained/ by an optimize
    resolve through the LOG's live-set arithmetic (name absent from the
    latest replay → retained), with only per-retained-file existence
    probes — never a walk of the live tree."""
    out = str(tmp_path / "ttravel")
    ev = _ev(spark, sf_dir)
    zorder_write(
        spark, ev.filter(F.col("event_id") % 2 == 0), out,
        ["user_id", "v_cents"], bits=16, num_files=4,
    )
    version_log_enable(spark, out)
    append_dataset(spark, ev.filter(F.col("event_id") % 2 == 1), out)
    optimize_incremental(spark, out, target_file_bytes=1 << 30)
    _WalkTripwire(monkeypatch)
    # v1 and v2 files are all retained now (optimize rewrote the set)
    assert read_version(spark, out, 1).count() == ev.filter(
        F.col("event_id") % 2 == 0
    ).count()
    assert read_version(spark, out, 2).count() == ev.count()
    assert read_version(spark, out, 3).count() == ev.count()


def test_with_pinned_version_survives_mid_read_optimize(
    spark, sf_dir, tmp_path
):
    """The shipped reader-retry helper (r15, VERDICT r14 #6): a frame
    pinned BEFORE an optimize that retains every resolved file fails
    its action loudly (never silent mixed data) — with_pinned_version
    retries fn ONCE at the SAME version, which now resolves from
    retained/, and succeeds where the naive read provably fails."""
    from engage_spark.versioning import with_pinned_version

    out = str(tmp_path / "pinned")
    ev = _ev(spark, sf_dir)
    zorder_write(
        spark, ev, out, ["user_id", "v_cents"], bits=16, num_files=8
    )
    version_log_enable(spark, out)
    append_dataset(spark, ev.limit(50), out)
    want = ev.count() + 50

    # naive pattern: pin a frame, let maintenance move its files,
    # then act — provably fails loud
    naive, v = read_snapshot(spark, out)
    optimize_incremental(spark, out, target_file_bytes=1 << 30)
    with pytest.raises(Exception, match="FileNotFound|does not exist"):
        naive.count()

    # helper pattern: same race injected INSIDE fn's first run — the
    # action fails mid-scan, the helper re-resolves the SAME pinned
    # version (files now in retained/) and fn's re-run succeeds
    append_dataset(spark, ev.limit(25), out)
    state = {"ran": 0}

    def act(df):
        state["ran"] += 1
        if state["ran"] == 1:
            optimize_incremental(spark, out, target_file_bytes=1 << 30)
        return df.count()

    n, v2 = with_pinned_version(spark, out, act)
    assert state["ran"] == 2  # first run raced, retry served the pin
    assert n == want + 25
    # the pin held: same version both runs, not "whatever is latest"
    assert v2 == latest_version(spark, out) - 1  # optimize committed after


def test_dataset_details_live_bytes_from_log(spark, sf_dir, tmp_path, monkeypatch):
    """r15: a version-logged dataset whose entries carry recorded
    sizes answers n_live_files/live_bytes from the LOG — no live-tree
    walk (retained/ keeps its bounded walk). The logged numbers match
    the filesystem truth byte-for-byte."""
    import engage_spark.maintenance as M
    from engage_spark.maintenance import _tree_size, dataset_details

    out = str(tmp_path / "details")
    ev = _ev(spark, sf_dir)
    write_parquet(ev.filter(F.col("event_id") % 2 == 0), out)
    version_log_enable(spark, out)
    append_dataset(spark, ev.filter(F.col("event_id") % 2 == 1), out)
    truth_n, truth_b = _tree_size(spark, out)

    real_tree = M._tree_size

    def guarded_tree(spark_, root):
        assert "_versions" in root, (
            "live-tree walk in dataset_details on a size-logged dataset"
        )
        return real_tree(spark_, root)

    monkeypatch.setattr(M, "_tree_size", guarded_tree)
    _WalkTripwire(monkeypatch)

    def _trip(*a, **k):
        raise AssertionError("live-tree _live_names walk in details")

    # maintenance binds _live_names by name at import — tripwire both
    monkeypatch.setattr(M, "_live_names", _trip)
    row = dataset_details(spark, out).collect()[0]
    assert row["n_live_files"] == truth_n
    assert row["live_bytes"] == truth_b
    assert row["versioned"] and row["latest_version"] == 2


def test_crash_window_readable_without_logged_schema(
    spark, sf_dir, tmp_path, monkeypatch
):
    """Review-found (r15): with NO logged schema (pre-r15 log) and a
    maintenance crash that retained every live file before its entry,
    the full-latest fast path used to raise UNABLE_TO_INFER_SCHEMA on
    the empty live root. It must fall through to the leaf-path
    resolution, which serves the logged latest from retained/."""
    import engage_spark.versioning as V2

    out = str(tmp_path / "crashwin")
    ev = _ev(spark, sf_dir)
    write_parquet(ev.limit(500), out)
    version_log_enable(spark, out)
    n = read_version(spark, out, 1).count()
    # simulate a pre-r15 log: no schema at any version
    monkeypatch.setattr(V2, "_schema_at", lambda entries, upto: None)
    # simulate the crash: every live file retained, no entry written
    for name in V2._replay_files(V2._vlog_entries(spark, out), 1):
        V2._retain_file(spark, out, name)
    got = read_version(spark, out, 1)
    assert got.count() == n
