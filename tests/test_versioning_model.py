"""Model-based randomized lifecycle check for the versioning stack
(round 15): a seeded random program of append / MERGE / logical-delete
/ OPTIMIZE / physical-apply / RESTORE ops runs against one versioned
dataset while a pure-Python model tracks the expected visible row set
at every committed version. After every op the live read AND the
as-of read must equal the model exactly; at the end, EVERY recorded
version is re-read (time travel through arbitrary interleavings of
file-moving ops) and the change feed must replay init → final.

This is the property the unit suite can't state piece-by-piece: that
the whole op algebra composes — a restore over an optimize over a
masked delete still reads byte-exactly at every version it ever
committed. Deterministic seeds (no flaky search), so failures are
reproducible; the program shape still covers op interleavings no
hand-written test enumerates.

Rules that keep the model honest (documented engine semantics):
  - deleted keys are never re-appended (the sidecar's re-append
    masking is a separate documented behavior with its own tests);
  - logical deletes target keys present at delete time;
  - MERGE updates existing keys and inserts fresh ones;
  - restore targets are sampled from recorded versions, and the model
    snapshots its map at every commit exactly like the log does.
"""

from __future__ import annotations

import random

import pytest

from engage_spark.io import (
    append_dataset,
    apply_deletes,
    delete_rows,
    optimize_incremental,
    upsert_dataset,
    zorder_write,
)
from engage_spark.versioning import (
    latest_version,
    read_changes,
    read_version,
    restore_version,
    version_log_enable,
)


def _df(spark, pairs):
    return spark.createDataFrame(
        [(int(k), int(v)) for k, v in pairs], "k long, v long"
    )


def _read_map(df):
    return {r["k"]: r["v"] for r in df.select("k", "v").collect()}


@pytest.mark.parametrize("seed", [7, 23])
def test_random_lifecycle_matches_model(spark, tmp_path, seed):
    rng = random.Random(seed)
    out = str(tmp_path / f"model{seed}")

    model = {k: k for k in range(100)}
    zorder_write(spark, _df(spark, model.items()), out, ["k", "v"],
                 bits=16, num_files=4)
    version_log_enable(spark, out)
    next_key = 100
    deleted: set = set()
    history: dict[int, dict] = {latest_version(spark, out): dict(model)}

    def commit_point(op_name):
        v = latest_version(spark, out)
        history[v] = dict(model)
        live = _read_map(read_version(spark, out, v))
        assert live == model, (
            f"seed {seed}: live read diverged from model after "
            f"{op_name} at v{v}: {len(live)} vs {len(model)} rows"
        )

    ops = ["append", "upsert", "delete", "optimize", "apply", "restore"]
    weights = [30, 25, 15, 10, 10, 10]
    program = rng.choices(ops, weights=weights, k=14)
    for op in program:
        if op == "append":
            n = rng.randint(5, 30)
            fresh = {next_key + i: next_key + i for i in range(n)}
            next_key += n
            append_dataset(spark, _df(spark, fresh.items()), out)
            model.update(fresh)
            commit_point("append")
        elif op == "upsert":
            keys = rng.sample(sorted(model), min(10, len(model)))
            n_ins = rng.randint(0, 5)
            ins = {next_key + i: -(next_key + i) for i in range(n_ins)}
            next_key += n_ins
            upd = {k: model[k] + 1000 for k in keys} | ins
            upsert_dataset(spark, out, _df(spark, upd.items()), ["k"])
            model.update(upd)
            commit_point("upsert")
        elif op == "delete":
            pool = sorted(set(model) - deleted)
            if not pool:
                continue
            keys = rng.sample(pool, min(rng.randint(1, 8), len(pool)))
            delete_rows(
                spark, out,
                spark.createDataFrame([(int(k),) for k in keys], "k long"),
                "k",
            )
            for k in keys:
                model.pop(k, None)
                deleted.add(k)
            commit_point("delete")
        elif op == "optimize":
            optimize_incremental(spark, out, target_file_bytes=1 << 30)
            commit_point("optimize")
        elif op == "apply":
            apply_deletes(spark, out)
            commit_point("apply")
        elif op == "restore":
            target = rng.choice(sorted(history))
            restore_version(spark, out, target)
            model.clear()
            model.update(history[target])
            # restoring to a pre-delete snapshot resurrects keys; the
            # no-re-append rule applies only to keys still invisible
            deleted -= set(model)
            commit_point("restore")

    # every recorded version time-travels exactly, through every
    # interleaving of file-moving ops the program produced
    for v, expected in history.items():
        got = _read_map(read_version(spark, out, v))
        assert got == expected, (
            f"seed {seed}: read_version({v}) diverged: "
            f"{len(got)} vs {len(expected)} rows"
        )

    # the change feed replays init -> final: applying inserts minus
    # deletes on top of v1's state reproduces the final model
    feed = read_changes(spark, out, 1).collect()
    state = dict(history[min(history)])
    for r in sorted(feed, key=lambda r: r["commit_version"]):
        if r["change_type"] == "insert":
            state[r["k"]] = r["v"]
        else:
            # delete rows carry the row content being removed
            if state.get(r["k"]) == r["v"]:
                state.pop(r["k"], None)
    assert state == model, (
        f"seed {seed}: change-feed replay diverged: "
        f"{len(state)} vs {len(model)} rows"
    )
