"""Commit-time expectation gates on versioned appends (io.append_dataset
expectations/on_violation, round 14) — the DLT expect_or_fail /
expect_or_drop shape on the staged-commit protocol.

Pins: fail mode refuses the WHOLE increment atomically (no files land,
no log entry, no orphan staging), drop mode commits exactly the clean
subset with exact per-rule counts and a once-per-row dropped count,
the gate validates the STAGED bytes (rules see what would land), and
the unsupported combinations raise up front.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from engage_spark.io import (
    ExpectationViolation,
    append_dataset,
    write_parquet,
)
from engage_spark.versioning import (
    dataset_history,
    latest_version,
    read_version,
    version_log_enable,
)


def _events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id",
        "user_id",
        "event_type",
        F.round(F.col("value") * 100 + 1e-9).cast("long").alias("v_cents"),
    )


@pytest.fixture()
def base(spark, sf_dir, tmp_path):
    out = str(tmp_path / "gated")
    ev = _events(spark, sf_dir)
    write_parquet(ev.filter(F.col("event_id") % 2 == 0), out)
    version_log_enable(spark, out)
    return out, ev


RULES = [
    {"rule": "not_null", "col": "event_type"},
    {"rule": "in_range", "col": "v_cents", "lo": 0},
]


def test_fail_mode_refuses_atomically(spark, base, tmp_path):
    out, ev = base
    v0 = latest_version(spark, out)
    n0 = read_version(spark, out, v0).count()
    bad = ev.filter(F.col("event_id") % 2 == 1).withColumn(
        "v_cents",
        F.when(F.col("event_id") % 10 == 1, -F.col("v_cents") - 1)
        .otherwise(F.col("v_cents")),
    )
    with pytest.raises(ExpectationViolation) as ei:
        append_dataset(spark, bad, out, expectations=RULES)
    assert ei.value.counts["in_range:v_cents"] > 0
    # NOTHING landed: same version, same rows, no staging left behind
    assert latest_version(spark, out) == v0
    assert read_version(spark, out, v0).count() == n0
    import pathlib

    parent = pathlib.Path(out).parent
    assert not [p for p in parent.iterdir() if "staging" in p.name]


def test_fail_mode_clean_increment_commits(spark, base):
    out, ev = base
    inc = ev.filter(F.col("event_id") % 2 == 1)
    res = append_dataset(spark, inc, out, expectations=RULES)
    assert res["files"] > 0
    assert set(res["expectations"].values()) == {0}
    v = latest_version(spark, out)
    assert read_version(spark, out, v).count() == ev.count()


def test_drop_mode_commits_exactly_the_clean_subset(spark, base):
    out, ev = base
    inc = ev.filter(F.col("event_id") % 2 == 1)
    # poison two disjoint slices, plus one overlap row violating BOTH
    bad_range = (F.col("event_id") % 10 == 1) | (F.col("event_id") % 10 == 3)
    bad_null = (F.col("event_id") % 10 == 3) | (F.col("event_id") % 10 == 5)
    dirty = inc.withColumn(
        "v_cents",
        F.when(bad_range, -1).otherwise(F.col("v_cents")),
    ).withColumn(
        "event_type",
        F.when(bad_null, F.lit(None)).otherwise(F.col("event_type")),
    )
    n_range = inc.filter(bad_range).count()
    n_null = inc.filter(bad_null).count()
    n_either = inc.filter(bad_range | bad_null).count()
    res = append_dataset(
        spark, dirty, out, expectations=RULES, on_violation="drop"
    )
    assert res["expectations"] == {
        "not_null:event_type": n_null,
        "in_range:v_cents": n_range,
    }
    assert res["dropped_rows"] == n_either < n_range + n_null
    v = latest_version(spark, out)
    got = read_version(spark, out, v)
    exp = ev.filter(F.col("event_id") % 2 == 0).unionByName(
        inc.filter(~(bad_range | bad_null))
    )
    assert got.count() == exp.count()
    assert got.exceptAll(exp).count() == 0 and exp.exceptAll(got).count() == 0
    # exactly one append entry for the gated commit
    assert (
        dataset_history(spark, out).filter(F.col("op") == "append").count()
        == 1
    )


def test_drop_mode_all_dirty_commits_nothing(spark, base):
    out, ev = base
    v0 = latest_version(spark, out)
    dirty = ev.filter(F.col("event_id") % 2 == 1).withColumn(
        "v_cents", F.lit(-5).cast("long")
    )
    res = append_dataset(
        spark, dirty, out, expectations=RULES, on_violation="drop"
    )
    assert res["files"] == 0 and res["dropped_rows"] == dirty.count()
    assert latest_version(spark, out) == v0  # no empty commit


def test_gate_preserves_partitioned_layout(spark, sf_dir, tmp_path):
    out = str(tmp_path / "gated_part")
    ev = _events(spark, sf_dir)
    write_parquet(
        ev.filter(F.col("event_id") % 2 == 0), out,
        partition_by=["event_type"],
    )
    version_log_enable(spark, out)
    dirty = ev.filter(F.col("event_id") % 2 == 1).withColumn(
        "v_cents",
        F.when(F.col("event_id") % 10 == 1, -1).otherwise(F.col("v_cents")),
    )
    res = append_dataset(
        spark, dirty, out, partition_by=["event_type"],
        expectations=RULES, on_violation="drop",
    )
    assert res["dropped_rows"] > 0
    got = read_version(spark, out, latest_version(spark, out))
    assert "event_type" in got.columns
    assert got.filter(F.col("v_cents") < 0).count() == 0
    assert got.count() == ev.count() - res["dropped_rows"]


def test_invalid_combinations_raise_before_writing(spark, base, tmp_path):
    out, ev = base
    inc = ev.limit(5)
    with pytest.raises(ValueError, match="on_violation"):
        append_dataset(
            spark, inc, out, expectations=RULES, on_violation="warn"
        )
    with pytest.raises(ValueError, match="unique"):
        append_dataset(
            spark, inc, out,
            expectations=[{"rule": "unique", "col": "event_id"}],
            on_violation="drop",
        )
    plain = str(tmp_path / "plain")
    write_parquet(ev.limit(10), plain)
    with pytest.raises(ValueError, match="version-logged"):
        append_dataset(spark, inc, plain, expectations=RULES)


def test_unique_rule_in_fail_mode(spark, base):
    out, ev = base
    dup = ev.filter(F.col("event_id") % 2 == 1).limit(10)
    dup = dup.unionByName(dup.limit(3))
    with pytest.raises(ExpectationViolation) as ei:
        append_dataset(
            spark, dup, out,
            expectations=[{"rule": "unique", "col": "event_id"}],
        )
    assert ei.value.counts["unique:event_id"] == 3


def test_zorder_append_gate_fail_and_drop(spark, sf_dir, tmp_path):
    """The clustered ingest path shares the gate: fail refuses
    atomically; drop re-lays the survivors on the FROZEN curve (a
    plain filtered rewrite would break the range-partitioned
    layout)."""
    from engage_spark.io import zorder_append, zorder_write

    out = str(tmp_path / "zgated")
    ev = _events(spark, sf_dir)
    zorder_write(
        spark, ev.filter(F.col("event_id") % 2 == 0), out,
        ["user_id", "v_cents"], bits=16, num_files=8,
    )
    version_log_enable(spark, out)
    v0 = latest_version(spark, out)
    dirty = ev.filter(F.col("event_id") % 2 == 1).withColumn(
        "v_cents",
        F.when(F.col("event_id") % 10 == 1, F.lit(-1).cast("long"))
        .otherwise(F.col("v_cents")),
    )
    with pytest.raises(ExpectationViolation):
        zorder_append(spark, dirty, out, expectations=RULES)
    assert latest_version(spark, out) == v0  # nothing landed
    res = zorder_append(
        spark, dirty, out, expectations=RULES, on_violation="drop"
    )
    assert res["dropped_rows"] == dirty.filter(F.col("v_cents") < 0).count()
    got = read_version(spark, out, latest_version(spark, out))
    exp = ev.filter(F.col("event_id") % 2 == 0).unionByName(
        dirty.filter(F.col("v_cents") >= 0)
    )
    assert got.count() == exp.count()
    assert got.exceptAll(exp).count() == 0
    # survivors are ON the frozen curve: the committed files pass the
    # z-range self-check (each appended file covers a tight rectangle)
    from engage_spark.io import zorder_layout_stats

    stats = zorder_layout_stats(spark, out)
    assert stats["files"] > 8  # base plus the gated increment


def test_streaming_ingest_quality_gate(spark, tmp_path):
    """The streaming ingest's quality tier: violating docs drop FIRST
    (before fingerprinting — a malformed doc must not block the valid
    re-delivery of the same text), per-batch metrics land under the
    idempotent run/batch partitions, and fail mode kills the query on
    the first dirty batch."""
    from engage_spark.streaming.jobs import incremental_ingest_stream

    src = str(tmp_path / "in")
    rows = [
        (0, "alpha beta gamma"),
        (1, ""),                    # violates min length
        (2, None),                  # violates not_null
        (3, "delta epsilon zeta"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.coalesce(1).write.parquet(f"{src}/a.parquet")
    corpus, store = str(tmp_path / "corpus"), str(tmp_path / "store")
    metrics = str(tmp_path / "metrics")
    rules = [
        {"rule": "not_null", "col": "text"},
        {
            "rule": "expr",
            "id": "min_len:text",
            "expr": "length(text) >= 5",
        },
    ]
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q = incremental_ingest_stream(
        stream, corpus, store,
        expectations=rules, on_violation="drop", metrics_dir=metrics,
    )
    q.awaitTermination()
    got = spark.read.parquet(corpus)
    assert sorted(r["doc_id"] for r in got.collect()) == [0, 3]
    m = {
        r["rule_id"]: r["n_violations"]
        for r in spark.read.parquet(metrics).collect()
    }
    # doc 2 violates not_null; min_len catches doc 1 (empty string)
    # AND doc 2 — at the GATE a NULL expr result refuses the row
    # (api._expectation_rule gate=True), unlike the report's
    # SQL-CHECK semantics where unknown passes
    assert m["not_null:text"] == 1
    assert m["min_len:text"] == 2
    # a dropped doc's resubmission WITH valid text is admitted (its
    # fingerprint slot was never burned)
    spark.createDataFrame(
        [(21, "resubmitted text for doc one")], "doc_id long, text string"
    ).coalesce(1).write.parquet(f"{src}/b.parquet")
    q2 = incremental_ingest_stream(
        stream, corpus, store,
        expectations=rules, on_violation="drop", metrics_dir=metrics,
    )
    q2.awaitTermination()
    assert sorted(
        r["doc_id"] for r in spark.read.parquet(corpus).collect()
    ) == [0, 3, 21]

    # fail mode: first dirty batch kills the query with the counts
    corpus2, store2 = str(tmp_path / "c2"), str(tmp_path / "s2")
    q3 = incremental_ingest_stream(
        spark.readStream.schema("doc_id long, text string")
        .option("recursiveFileLookup", "true")
        .parquet(src),
        corpus2, store2, expectations=rules, on_violation="fail",
    )
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="refused by"):
        q3.awaitTermination()


def test_duplicate_rule_ids_and_empty_rules_raise_up_front(
    spark, base, tmp_path
):
    """Two rules deriving the same id would collapse into one count (a
    violated rule masked by a clean one); an empty rule list used to
    crash only AFTER staging, orphaning the dir. Both refuse before
    any write now."""
    out, ev = base
    inc = ev.limit(5)
    with pytest.raises(ValueError, match="duplicate expectation rule ids"):
        append_dataset(
            spark, inc, out,
            expectations=[
                {"rule": "regex", "col": "event_type", "pattern": "^a"},
                {"rule": "regex", "col": "event_type", "pattern": ".*"},
            ],
        )
    with pytest.raises(ValueError, match="non-empty"):
        append_dataset(spark, inc, out, expectations=[])
    # explicit ids disambiguate the same rule kind on one column
    res = append_dataset(
        spark, inc, out,
        expectations=[
            {"rule": "in_range", "col": "v_cents", "lo": 0, "id": "lo"},
            {"rule": "in_range", "col": "v_cents", "hi": 10**12, "id": "hi"},
        ],
    )
    assert res["expectations"] == {"lo": 0, "hi": 0}
    import pathlib

    parent = pathlib.Path(out).parent
    assert not [p for p in parent.iterdir() if "staging" in p.name]


def test_gated_empty_partitioned_increment_is_a_noop(spark, sf_dir, tmp_path):
    """A zero-row partitioned increment stages only _SUCCESS; the gate
    must pass it through to the empty-increment branch instead of
    crashing on schema inference and orphaning the staging."""
    out = str(tmp_path / "gated_empty")
    ev = _events(spark, sf_dir)
    write_parquet(ev, out, partition_by=["event_type"])
    version_log_enable(spark, out)
    v0 = latest_version(spark, out)
    res = append_dataset(
        spark, ev.filter(F.lit(False)), out,
        partition_by=["event_type"], expectations=RULES,
    )
    assert res["files"] == 0
    assert latest_version(spark, out) == v0
    import pathlib

    parent = pathlib.Path(out).parent
    assert not [p for p in parent.iterdir() if "staging" in p.name]


def test_gate_null_expr_refuses_in_batch_path(spark, base):
    """The NULL-expr-refuses gate semantic applies to the batch path
    too: a row whose quality predicate cannot evaluate is dropped."""
    out, ev = base
    inc = ev.filter(F.col("event_id") % 2 == 1).withColumn(
        "event_type",
        F.when(F.col("event_id") % 10 == 7, F.lit(None))
        .otherwise(F.col("event_type")),
    )
    res = append_dataset(
        spark, inc, out,
        expectations=[
            {
                "rule": "expr",
                "id": "type_len",
                "expr": "length(event_type) >= 1",
            }
        ],
        on_violation="drop",
    )
    n_null = inc.filter(F.col("event_type").isNull()).count()
    assert res["dropped_rows"] == n_null > 0
    got = read_version(spark, out, latest_version(spark, out))
    assert got.filter(F.col("event_type").isNull()).count() == 0


def test_upsert_gate_fail_and_drop_with_tombstones(spark, sf_dir, tmp_path):
    """The MERGE path's gate: fail refuses the change batch before any
    merge work; drop filters dirty UPSERTED rows while DELETE-marker
    tombstones (which legitimately carry NULL payload) bypass the
    rules and still apply."""
    from engage_spark.io import upsert_dataset

    out = str(tmp_path / "merge_gated")
    ev = _events(spark, sf_dir)
    write_parquet(ev, out, partition_by=["event_type"])
    version_log_enable(spark, out)
    v0 = latest_version(spark, out)
    types = [r[0] for r in ev.select("event_type").distinct().collect()]
    # change batch: 3 updates (one dirty), 2 tombstones w/ NULL payload
    upd = [
        (10, 1, types[0], 111, False),
        (11, 1, types[0], -5, False),  # violates in_range at the gate
        (12, 1, types[1], 222, False),
        (13, None, None, None, True),  # tombstone: NULL payload OK
        (14, None, None, None, True),
    ]
    changes = spark.createDataFrame(
        upd,
        "event_id long, user_id long, event_type string, v_cents long,"
        " is_del boolean",
    )
    with pytest.raises(ExpectationViolation):
        upsert_dataset(
            spark, out, changes, ["event_id"],
            partition_by=["event_type"], delete_col="is_del",
            expectations=[{"rule": "in_range", "col": "v_cents", "lo": 0}],
        )
    assert latest_version(spark, out) == v0  # merge never ran
    res = upsert_dataset(
        spark, out, changes, ["event_id"],
        partition_by=["event_type"], delete_col="is_del",
        expectations=[{"rule": "in_range", "col": "v_cents", "lo": 0}],
        on_violation="drop",
    )
    assert res["expectations"] == {"in_range:v_cents": 1}
    assert res["dropped_rows"] == 1
    got = read_version(spark, out, latest_version(spark, out))
    assert got.filter(F.col("event_id").isin([13, 14])).count() == 0
    assert (
        got.filter(F.col("event_id") == 10).collect()[0]["v_cents"] == 111
    )
    assert (
        got.filter(F.col("event_id") == 12).collect()[0]["v_cents"] == 222
    )
    # the dirty update was dropped: row 11 keeps its ORIGINAL value
    orig_11 = ev.filter(F.col("event_id") == 11).collect()[0]["v_cents"]
    assert (
        got.filter(F.col("event_id") == 11).collect()[0]["v_cents"]
        == orig_11
    )


def test_cdc_merge_stream_gate_passthrough(spark, sf_dir, tmp_path):
    from engage_spark.streaming.jobs import cdc_merge_stream

    out = str(tmp_path / "cdc_gated")
    ev = _events(spark, sf_dir)
    write_parquet(ev, out, partition_by=["event_type"])
    version_log_enable(spark, out)
    types = [r[0] for r in ev.select("event_type").distinct().collect()]
    src = str(tmp_path / "changes")
    spark.createDataFrame(
        [
            (20, 1, types[0], 999, False, 1),
            (21, 1, types[0], -7, False, 1),  # dirty: dropped at the gate
        ],
        "event_id long, user_id long, event_type string, v_cents long,"
        " is_del boolean, ts long",
    ).coalesce(1).write.parquet(f"{src}/a.parquet")
    q = cdc_merge_stream(
        spark.readStream.schema(
            "event_id long, user_id long, event_type string,"
            " v_cents long, is_del boolean, ts long"
        )
        .option("recursiveFileLookup", "true")
        .parquet(src),
        out, ["event_id"], str(tmp_path / "ckpt"),
        partition_by=["event_type"], delete_col="is_del", order_col="ts",
        expectations=[{"rule": "in_range", "col": "v_cents", "lo": 0}],
    )
    q.awaitTermination()
    got = read_version(spark, out, latest_version(spark, out))
    assert got.filter(F.col("event_id") == 20).collect()[0]["v_cents"] == 999
    orig_21 = ev.filter(F.col("event_id") == 21).collect()[0]["v_cents"]
    assert (
        got.filter(F.col("event_id") == 21).collect()[0]["v_cents"]
        == orig_21
    )


def test_quarantine_lands_annotated_violations(spark, base, tmp_path):
    """Drop mode with a quarantine: the dropped rows land in a plain
    parquet dataset with a __violated array naming the rules each row
    broke — and a row violating BOTH rules carries both ids."""
    out, ev = base
    q = str(tmp_path / "quarantine")
    inc = ev.filter(F.col("event_id") % 2 == 1)
    bad_range = F.col("event_id") % 10 == 1
    bad_null = F.col("event_id") % 10 == 3
    both = F.col("event_id") % 10 == 5
    dirty = inc.withColumn(
        "v_cents",
        F.when(bad_range | both, F.lit(-1).cast("long"))
        .otherwise(F.col("v_cents")),
    ).withColumn(
        "event_type",
        F.when(bad_null | both, F.lit(None)).otherwise(F.col("event_type")),
    )
    res = append_dataset(
        spark, dirty, out, expectations=RULES, on_violation="drop",
        quarantine=q,
    )
    quar = spark.read.parquet(q)
    assert quar.count() == res["dropped_rows"]
    by_id = {
        r["event_id"]: sorted(r["__violated"]) for r in quar.collect()
    }
    for r in dirty.filter(both).collect():
        assert by_id[r["event_id"]] == [
            "in_range:v_cents", "not_null:event_type"
        ]
    for r in dirty.filter(bad_range).collect():
        assert by_id[r["event_id"]] == ["in_range:v_cents"]
    # the survivors landed clean; quarantine rows never reached the
    # corpus
    got = read_version(spark, out, latest_version(spark, out))
    assert got.filter(F.col("v_cents") < 0).count() == 0
    assert got.count() + quar.count() == ev.count()


def test_streaming_quarantine_is_idempotent_partitioned(spark, tmp_path):
    from engage_spark.streaming.jobs import incremental_ingest_stream

    src = str(tmp_path / "in")
    spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, ""), (2, "delta epsilon zeta")],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(f"{src}/a.parquet")
    corpus, store = str(tmp_path / "corpus"), str(tmp_path / "store")
    qdir = str(tmp_path / "quar")
    rules = [
        {"rule": "expr", "id": "min_len", "expr": "length(text) >= 5"}
    ]

    def run():
        q = incremental_ingest_stream(
            spark.readStream.schema("doc_id long, text string")
            .option("recursiveFileLookup", "true")
            .parquet(src),
            corpus, store, expectations=rules, quarantine_dir=qdir,
        )
        q.awaitTermination()

    run()
    quar = spark.read.parquet(qdir)
    assert [r["doc_id"] for r in quar.collect()] == [1]
    assert quar.collect()[0]["__violated"] == ["min_len"]
    # quarantine partitions follow the run/batch discipline
    import pathlib

    assert any(
        p.name.startswith("run=")
        for p in pathlib.Path(qdir).iterdir()
        if p.is_dir()
    )
    # a restart with no new input neither duplicates nor rewrites
    run()
    assert spark.read.parquet(qdir).count() == 1


def test_quarantine_misconfigurations_refused(spark, base, tmp_path):
    out, ev = base
    inc = ev.limit(5)
    q = str(tmp_path / "q")
    with pytest.raises(ValueError, match="drop mode"):
        append_dataset(
            spark, inc, out, expectations=RULES,
            on_violation="fail", quarantine=q,
        )
    with pytest.raises(ValueError, match="expectations is None"):
        append_dataset(spark, inc, out, quarantine=q)
    from engage_spark.streaming.jobs import (
        cdc_merge_stream,
        incremental_ingest_stream,
    )

    (tmp_path / "nosrc").mkdir()
    (tmp_path / "nosrc2").mkdir()
    with pytest.raises(ValueError, match="drop mode"):
        incremental_ingest_stream(
            spark.readStream.schema("doc_id long, text string").parquet(
                str(tmp_path / "nosrc")
            ),
            str(tmp_path / "c"), str(tmp_path / "s"),
            expectations=[{"rule": "not_null", "col": "text"}],
            on_violation="fail", quarantine_dir=q,
        )
    with pytest.raises(ValueError, match="expectations is None"):
        cdc_merge_stream(
            spark.readStream.schema("a long").parquet(
                str(tmp_path / "nosrc2")
            ),
            out, ["a"], str(tmp_path / "ck"), metrics_dir=q,
        )


def test_upsert_gate_materializes_nondeterministic_batches(
    spark, sf_dir, tmp_path
):
    """The MERGE gate materializes the change batch before gating, so
    a NON-DETERMINISTIC upstream plan (rand()) cannot slip rows past
    the rules: what was counted is byte-for-byte what merged."""
    from engage_spark.io import upsert_dataset

    out = str(tmp_path / "nondet")
    ev = _events(spark, sf_dir)
    write_parquet(ev, out, partition_by=["event_type"])
    version_log_enable(spark, out)
    types = [r[0] for r in ev.select("event_type").distinct().collect()]
    changes = (
        spark.range(1000, 1200)
        .select(
            F.col("id").alias("event_id"),
            F.lit(1).cast("long").alias("user_id"),
            F.lit(types[0]).alias("event_type"),
            # non-deterministic payload: ~half violate the rule on
            # EVERY evaluation, but never the same half twice
            (F.rand() * 200 - 100).cast("long").alias("v_cents"),
        )
    )
    res = upsert_dataset(
        spark, out, changes, ["event_id"], partition_by=["event_type"],
        expectations=[{"rule": "in_range", "col": "v_cents", "lo": 0}],
        on_violation="drop",
    )
    got = read_version(spark, out, latest_version(spark, out)).filter(
        F.col("event_id") >= 1000
    )
    # every merged row satisfies the rule, and counted drops + merged
    # rows account for the whole batch — impossible without
    # materialization (each evaluation re-rolls the dice)
    assert got.filter(F.col("v_cents") < 0).count() == 0
    assert got.count() + res["dropped_rows"] == 200
    # the gate's temp materialization is cleaned up
    import pathlib

    parent = pathlib.Path(out).parent
    assert not [p for p in parent.iterdir() if "gate_staging" in p.name]


def test_cdc_stream_quarantine_and_metrics(spark, sf_dir, tmp_path):
    from engage_spark.streaming.jobs import cdc_merge_stream

    out = str(tmp_path / "cdc_quar")
    ev = _events(spark, sf_dir)
    write_parquet(ev, out, partition_by=["event_type"])
    version_log_enable(spark, out)
    types = [r[0] for r in ev.select("event_type").distinct().collect()]
    src = str(tmp_path / "changes")
    spark.createDataFrame(
        [
            (30, 1, types[0], 500, False, 1),
            (31, 1, types[0], -9, False, 1),   # quarantined
            (32, None, None, None, True, 1),   # tombstone: bypasses
        ],
        "event_id long, user_id long, event_type string, v_cents long,"
        " is_del boolean, ts long",
    ).coalesce(1).write.parquet(f"{src}/a.parquet")
    mdir, qdir = str(tmp_path / "metrics"), str(tmp_path / "quar")
    q = cdc_merge_stream(
        spark.readStream.schema(
            "event_id long, user_id long, event_type string,"
            " v_cents long, is_del boolean, ts long"
        )
        .option("recursiveFileLookup", "true")
        .parquet(src),
        out, ["event_id"], str(tmp_path / "ckpt"),
        partition_by=["event_type"], delete_col="is_del", order_col="ts",
        expectations=[{"rule": "in_range", "col": "v_cents", "lo": 0}],
        metrics_dir=mdir, quarantine_dir=qdir,
    )
    q.awaitTermination()
    got = read_version(spark, out, latest_version(spark, out))
    assert got.filter(F.col("event_id") == 30).count() == 1
    assert got.filter(F.col("event_id") == 32).count() == 0  # tombstone
    orig_31 = ev.filter(F.col("event_id") == 31).collect()[0]["v_cents"]
    assert (
        got.filter(F.col("event_id") == 31).collect()[0]["v_cents"]
        == orig_31
    )
    quar = spark.read.parquet(qdir)
    assert [r["event_id"] for r in quar.collect()] == [31]
    assert quar.collect()[0]["__violated"] == ["in_range:v_cents"]
    m = {
        r["rule_id"]: r["n_violations"]
        for r in spark.read.parquet(mdir).collect()
    }
    assert m == {"in_range:v_cents": 1}


def test_drop_gate_preserves_string_partition_spellings(spark, tmp_path):
    """ADVICE r14 (medium): the drop-mode rewrite re-read the staged
    increment with partition TYPE INFERENCE on, so a string partition
    value that parses numerically ('007', '01') was silently re-encoded
    (k=7) — diverging from the ungated path (files move verbatim) and
    from the target's existing directory spellings. The gate now reads
    the staging with the upstream frame's explicit schema."""
    import os

    out = str(tmp_path / "spellings")
    base = spark.createDataFrame(
        [(1, "007", 10), (2, "01", 20)], "id long, k string, v long"
    )
    write_parquet(base, out, partition_by=["k"])
    version_log_enable(spark, out)
    inc = spark.createDataFrame(
        [(3, "007", 30), (4, "01", -5), (5, "0099", 40)],
        "id long, k string, v long",
    )
    res = append_dataset(
        spark, inc, out, partition_by=["k"],
        expectations=[{"rule": "in_range", "col": "v", "lo": 0}],
        on_violation="drop",
    )
    assert res["dropped_rows"] == 1
    # directory spellings byte-for-byte: k=007 / k=01 / k=0099, never k=7
    dirs = {n for n in os.listdir(out) if n.startswith("k=")}
    assert dirs == {"k=007", "k=01", "k=0099"}
    # value check through a schema'd read (a bare read would apply the
    # same numeric inference on the READ side — standard Spark
    # behavior, identical for gated and ungated data; the defect was
    # the WRITE side rewriting the directory names)
    got = spark.read.schema("id long, k string, v long").parquet(out)
    assert dict(got.select("id", "k").collect()) == {
        1: "007", 2: "01", 3: "007", 5: "0099"
    }
    assert read_version(spark, out, latest_version(spark, out)).count() == 4


def test_quarantine_sees_declared_partition_type(spark, tmp_path):
    """The quarantined rows carry the DECLARED partition type and
    spelling too (rules and quarantine read the schema'd staging)."""
    out = str(tmp_path / "quar_spelling")
    write_parquet(
        spark.createDataFrame([(1, "007", 10)], "id long, k string, v long"),
        out, partition_by=["k"],
    )
    version_log_enable(spark, out)
    qdir = str(tmp_path / "quar")
    append_dataset(
        spark,
        spark.createDataFrame([(2, "01", -3)], "id long, k string, v long"),
        out, partition_by=["k"],
        expectations=[{"rule": "in_range", "col": "v", "lo": 0}],
        on_violation="drop", quarantine=qdir,
    )
    quar = spark.read.parquet(qdir)
    assert dict(quar.dtypes)["k"] == "string"
    assert quar.collect()[0]["k"] == "01"


def test_metrics_dir_with_fail_mode_refused(spark, tmp_path):
    """ADVICE r14: metrics land only in the drop branch, so accepting
    metrics_dir with on_violation='fail' silently records nothing —
    both streaming front ends now refuse the combination up front,
    mirroring the quarantine+fail check."""
    from engage_spark.streaming.jobs import (
        cdc_merge_stream,
        incremental_ingest_stream,
    )

    changes = spark.createDataFrame(
        [(1, "a", 1)], "event_id long, event_type string, v long"
    )
    with pytest.raises(ValueError, match="metrics_dir.*fail"):
        cdc_merge_stream(
            changes, str(tmp_path / "t"), ["event_id"],
            str(tmp_path / "ckpt"),
            expectations=[{"rule": "not_null", "col": "event_type"}],
            on_violation="fail", metrics_dir=str(tmp_path / "m"),
        )
    docs = spark.createDataFrame([(1, "hello")], "doc_id long, text string")
    with pytest.raises(ValueError, match="metrics_dir.*fail"):
        incremental_ingest_stream(
            docs, str(tmp_path / "corpus"), str(tmp_path / "store"),
            expectations=[{"rule": "not_null", "col": "text"}],
            on_violation="fail", metrics_dir=str(tmp_path / "m2"),
        )


def test_ingest_metrics_dir_without_expectations_refused(spark, tmp_path):
    """Review-found (r15): incremental_ingest_stream accepted
    metrics_dir with expectations=None (cdc_merge_stream refused the
    same combination) — the metrics write lives inside the
    expectations branch, so nothing ever landed. Both refuse now."""
    from engage_spark.streaming.jobs import incremental_ingest_stream

    docs = spark.createDataFrame([(1, "hello")], "doc_id long, text string")
    with pytest.raises(ValueError, match="metrics_dir"):
        incremental_ingest_stream(
            docs, str(tmp_path / "corpus"), str(tmp_path / "store"),
            metrics_dir=str(tmp_path / "m"),
        )
