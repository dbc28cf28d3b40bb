"""The pluggable commit-primitive seam (round 15, VERDICT r14 missing
#2): the maintenance lease and the log's version allocation go through
a CommitStore — default = the previous O_EXCL / create(overwrite=false)
behavior, injectable = a conditional-put implementation for backends
where neither filesystem primitive is atomic (S3-style).

Pins: the default store's primitives are atomic on file://; the whole
writer-concurrency stack (racing appenders, lease contention, expired-
lease break) runs CORRECTLY against the reference conditional-put
store (no O_EXCL, no rename — pure CAS semantics, the S3
If-None-Match shape); and the per-version claim makes double
allocation impossible even when the lease is bypassed outright.
"""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import functions as F

from engage_spark.commitstore import (
    HadoopCommitStore,
    InMemoryCASCommitStore,
    get_commit_store,
    set_commit_store,
)
from engage_spark.io import (
    MaintenanceLockHeld,
    append_dataset,
    maintenance_lease,
    write_parquet,
)
from engage_spark.versioning import (
    dataset_history,
    latest_version,
    read_version,
    version_log_enable,
)


@pytest.fixture()
def cas_store():
    """Inject the reference conditional-put store; always restore the
    default afterwards (session-scoped Spark outlives this test)."""
    prev = set_commit_store(InMemoryCASCommitStore())
    try:
        yield get_commit_store()
    finally:
        set_commit_store(prev)


def _rows(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("grp")
    )


def test_default_store_primitives(spark, tmp_path):
    st = HadoopCommitStore()
    p = f"{tmp_path}/obj"
    assert st.read(spark, p) is None
    assert st.put_if_absent(spark, p, b"alpha") is True
    assert st.put_if_absent(spark, p, b"beta") is False  # loser sees it
    assert st.read(spark, p) == b"alpha"
    assert st.claim(spark, p, f"{tmp_path}/obj.scratch") is True
    assert st.read(spark, p) is None
    assert st.claim(spark, p, f"{tmp_path}/obj.scratch2") is False
    st.delete(spark, p)  # absent delete is a no-op


def test_cas_store_primitives(spark, tmp_path):
    st = InMemoryCASCommitStore()
    p = f"{tmp_path}/obj"
    winners = []

    def race(i):
        if st.put_if_absent(spark, p, f"w{i}".encode()):
            winners.append(i)

    ts = [threading.Thread(target=race, args=(i,)) for i in range(8)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert len(winners) == 1
    assert st.read(spark, p) == f"w{winners[0]}".encode()
    assert st.claim(spark, p, "scratch") is True
    assert st.claim(spark, p, "scratch") is False


def test_lease_and_appends_run_on_cas_store(spark, tmp_path, cas_store):
    """The full staged-append concurrency stack on the conditional-put
    store: racing appenders all land exactly once, history is exact,
    and the lock never touches the filesystem's O_EXCL path."""
    out = str(tmp_path / "cas_ds")
    write_parquet(_rows(spark, 0, 1000), out)
    version_log_enable(spark, out)
    errs: list = []

    def appender(k):
        try:
            append_dataset(
                spark, _rows(spark, 1000 + 500 * k, 1500 + 500 * k), out,
                lease_wait_s=60.0,
            )
        except Exception as e:  # pragma: no cover — surfaced below
            errs.append(e)

    ts = [threading.Thread(target=appender, args=(k,)) for k in range(4)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert not errs
    hi = latest_version(spark, out)
    got = read_version(spark, out, hi)
    assert got.count() == 3000
    assert got.select("k").distinct().count() == 3000
    ops = [r["op"] for r in dataset_history(spark, out).collect()]
    assert ops.count("append") == 4
    # the lock arbitrated through the CAS table, not the filesystem
    import os

    assert not os.path.exists(f"{out}/_maintenance_lock")


def test_lease_contention_and_release_on_cas_store(
    spark, tmp_path, cas_store
):
    out = str(tmp_path / "cas_lock")
    write_parquet(_rows(spark, 0, 10), out)
    held, release = threading.Event(), threading.Event()
    state: dict = {}

    def holder():
        with maintenance_lease(spark, out):
            held.set()
            release.wait(20)

    t = threading.Thread(target=holder)
    t.start()
    assert held.wait(10)

    def contender():
        try:
            with maintenance_lease(spark, out):
                state["got"] = True
        except MaintenanceLockHeld as e:
            state["err"] = str(e)

    t2 = threading.Thread(target=contender)
    t2.start()
    t2.join()
    assert "err" in state and "got" not in state
    release.set()
    t.join()
    with maintenance_lease(spark, out):  # released cleanly, reacquirable
        pass


def test_version_claim_prevents_double_allocation(spark, tmp_path):
    """Even if a foreign writer claimed the next version number (the
    lease-bypassed S3 race), the entry writer resolves through the
    claim: it allocates the NEXT number, the log never carries two
    entries for one version, and the resulting gap is read-tolerated."""
    out = str(tmp_path / "claimed")
    write_parquet(_rows(spark, 0, 100), out)
    version_log_enable(spark, out)  # v1
    # foreign claim for v2 (crashed writer / racing lease-less commit)
    st = get_commit_store()
    assert st.put_if_absent(
        spark, f"{out}/_versions/log/.v{2:012d}.claim", b"{}"
    )
    append_dataset(spark, _rows(spark, 100, 150), out)
    vs = [r["version"] for r in dataset_history(spark, out).collect()]
    assert vs == [1, 3]  # v2 skipped, never double-written
    assert read_version(spark, out, 3).count() == 150
    assert read_version(spark, out, 2).count() == 100  # gap reads as prior


def test_stale_claim_never_divorces_side_effects(spark, tmp_path):
    """Review-found (r15): callers that write version-NAMED side
    effects (record_logical_delete's deletes_v{N} batch) must allocate
    through the claim, not precompute max+1 — a stale claim (crashed
    writer between claim and entry) previously shifted the entry to
    v+1 while the batch landed at v, corrupting the log durably."""
    from engage_spark.io import delete_rows

    out = str(tmp_path / "staleclaim")
    write_parquet(_rows(spark, 0, 200), out)
    version_log_enable(spark, out)  # v1
    # stale claim for v2: a writer crashed between claim and entry
    st = get_commit_store()
    assert st.put_if_absent(
        spark, f"{out}/_versions/log/.v{2:012d}.claim", b"{}"
    )
    delete_rows(
        spark, out,
        spark.range(0, 10).select(F.col("id").alias("k")), "k",
    )
    hist = {r["version"]: r["op"] for r in dataset_history(spark, out).collect()}
    dv = [v for v, op in hist.items() if op == "logical_delete"]
    assert len(dv) == 1
    v = dv[0]
    assert v != 2  # the stale claim's number was skipped
    import os

    # the batch is named after the ENTRY's version — consistent
    assert os.path.isdir(f"{out}/_versions/retained/deletes_v{v}")
    # and every read resolves (the old bug made this PATH_NOT_FOUND)
    assert read_version(spark, out, v).count() == 190
    assert read_version(spark, out, 1).count() == 200


def test_crashed_enable_leaves_dataset_healthy(spark, tmp_path):
    """Review-found (r15): the claim's create makes the log dir, so an
    enable that crashes before its init entry used to leave a
    claim-only dir that read as 'enabled' and failed every op. Now:
    not enabled, and a re-enable lands init at v1."""
    import os

    from engage_spark.versioning import version_log_enabled

    out = str(tmp_path / "crashenable")
    write_parquet(_rows(spark, 0, 50), out)
    # simulate the crash: claim only, no entry
    os.makedirs(f"{out}/_versions/log", exist_ok=True)
    open(f"{out}/_versions/log/.v{1:012d}.claim", "wb").write(b"{}")
    assert version_log_enabled(spark, out) is False
    assert spark.read.parquet(out).count() == 50  # plain reads fine
    v = version_log_enable(spark, out)
    assert v == 1  # stale claim cleared; init is v1, not v2
    assert read_version(spark, out, 1).count() == 50


def test_compact_spares_inflight_claims(spark, tmp_path):
    """Review-found (r15): log compaction must not count claims toward
    its threshold nor delete a claim ABOVE the committed tip (an
    in-flight writer's allocation on a lease-less backend); settled
    claims (<= tip) are swept."""
    import os

    from engage_spark.io import maintenance_lease
    from engage_spark.versioning import _vlog_compact, _vlog_entries

    out = str(tmp_path / "compactclaims")
    write_parquet(_rows(spark, 0, 100), out)
    version_log_enable(spark, out)
    for k in range(3):
        append_dataset(spark, _rows(spark, 100 + k * 10, 110 + k * 10), out)
    tip = latest_version(spark, out)
    inflight = f"{out}/_versions/log/.v{tip + 1:012d}.claim"
    open(inflight, "wb").write(b"{}")
    with maintenance_lease(spark, out):
        assert _vlog_compact(spark, out, max_parts=1) is True
    # settled claims swept, in-flight one survives
    left = [
        n for n in os.listdir(f"{out}/_versions/log") if n.endswith(".claim")
    ]
    assert left == [f".v{tip + 1:012d}.claim"]
    # log intact after compaction
    assert [e["version"] for e in _vlog_entries(spark, out)] == list(
        range(1, tip + 1)
    )
    # and the in-flight claim still forces the next entry past it
    append_dataset(spark, _rows(spark, 500, 510), out)
    assert latest_version(spark, out) == tip + 2
