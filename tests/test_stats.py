"""File-level min/max stats + data-skipping reads (engage_spark.stats,
round 14).

Pins the two-sided contract: pruning drops provably-disjoint files
(narrow ranges on a Z-ordered layout schedule a fraction of the files)
AND the pruned read is byte-identical to filtering the unpruned read —
under pending deletion vectors, at historical versions, across appends,
with conservative fallbacks (missing stats rows, type-mismatched
bounds) and exact all-NULL semantics.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from engage_spark.io import (
    append_dataset,
    delete_rows,
    write_parquet,
    zorder_write,
)
from engage_spark.stats import (
    _stats_prune,
    file_stats,
    read_where,
    stats_enable,
)
from engage_spark.versioning import (
    _replay_files,
    _vlog_entries,
    latest_version,
    read_version,
    version_log_enable,
)


def _events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id",
        "user_id",
        F.round(F.col("value") * 100 + 1e-9).cast("long").alias("v_cents"),
    )


def _names(spark, path):
    return _replay_files(
        _vlog_entries(spark, path), latest_version(spark, path)
    )


def _same(a, b):
    b = b.select(*a.columns)  # exceptAll is positional; align by name
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


@pytest.fixture()
def zstats(spark, sf_dir, tmp_path):
    """Z-ordered events + version log + stats on the cluster columns."""
    out = str(tmp_path / "zstats")
    ev = _events(spark, sf_dir)
    zorder_write(spark, ev, out, ["user_id", "v_cents"], bits=16, num_files=16)
    version_log_enable(spark, out)
    n = stats_enable(spark, out, ["user_id", "v_cents"])
    assert n == 16
    return out, ev


def test_pruned_read_is_exact_and_actually_prunes(spark, zstats):
    out, ev = zstats
    names = _names(spark, out)
    kept, pruned = _stats_prune(spark, out, names, "user_id", 10, 20)
    assert pruned > 0, "narrow range on the Z-order column must skip files"
    got = read_where(spark, out, "user_id", 10, 20)
    exp = ev.filter((F.col("user_id") >= 10) & (F.col("user_id") <= 20))
    assert exp.count() > 0
    _same(got, exp)
    # open ranges: one bound at a time
    _same(
        read_where(spark, out, "v_cents", None, 500),
        ev.filter(F.col("v_cents") <= 500),
    )
    _same(
        read_where(spark, out, "v_cents", 9000, None),
        ev.filter(F.col("v_cents") >= 9000),
    )
    # out-of-domain range: everything pruned, empty frame, right schema
    none = read_where(spark, out, "user_id", 10**9, None)
    assert none.count() == 0
    assert set(none.columns) == set(ev.columns)


def test_pruned_read_respects_dvs_versions_and_appends(spark, zstats):
    out, ev = zstats
    # append an increment: the commit hook harvests its files' stats
    before_rows = file_stats(spark, out).count()
    extra = ev.withColumn("event_id", F.col("event_id") + 10_000_000)
    append_dataset(spark, extra, out)                              # v2
    assert file_stats(spark, out).count() > before_rows
    # deletion vectors anti-join exactly like read_version
    doomed = (
        ev.filter((F.col("user_id") >= 10) & (F.col("user_id") <= 20))
        .select("event_id").limit(7)
    )
    delete_rows(spark, out, doomed, "event_id")                    # v3
    v = latest_version(spark, out)
    _same(
        read_where(spark, out, "user_id", 10, 20),
        read_version(spark, out, v).filter(
            (F.col("user_id") >= 10) & (F.col("user_id") <= 20)
        ),
    )
    # time travel: the same pruned read at v1 sees the pre-append,
    # pre-delete state
    _same(
        read_where(spark, out, "user_id", 10, 20, version=1),
        ev.filter((F.col("user_id") >= 10) & (F.col("user_id") <= 20)),
    )


def test_missing_stats_rows_are_conservative(spark, zstats, monkeypatch):
    """Files committed while the harvest is unavailable (crash between
    entry and harvest, exotic fs) have no stats rows and must always
    be KEPT — absence degrades pruning, never correctness."""
    import engage_spark.stats as stats_mod

    out, ev = zstats
    monkeypatch.setattr(stats_mod, "_stats_harvest", lambda *a, **k: 0)
    extra = ev.withColumn("event_id", F.col("event_id") + 10_000_000)
    append_dataset(spark, extra, out)
    monkeypatch.undo()
    names = _names(spark, out)
    kept, _ = _stats_prune(spark, out, names, "user_id", 10, 20)
    unharvested = set(names) - {
        r["name"] for r in file_stats(spark, out).select("name").collect()
    }
    assert unharvested, "append should have landed without stats"
    assert unharvested <= set(kept)
    got = read_where(spark, out, "user_id", 10, 20)
    exp = ev.filter((F.col("user_id") >= 10) & (F.col("user_id") <= 20))
    assert got.count() == 2 * exp.count()


def test_type_mismatched_bounds_never_prune_wrong(spark, zstats):
    """String bounds against numeric stats (and vice versa) fall back
    to keeping every file — the predicate still applies exactly."""
    out, ev = zstats
    names = _names(spark, out)
    kept, pruned = _stats_prune(spark, out, names, "user_id", "10", "20")
    assert pruned == 0
    # and Spark's own comparison semantics decide the result
    got = read_where(spark, out, "user_id", 10, 20)
    exp = ev.filter((F.col("user_id") >= 10) & (F.col("user_id") <= 20))
    _same(got, exp)


def test_string_and_partition_column_stats(spark, sf_dir, tmp_path):
    """String-typed stats prune on a lang-partitioned corpus: the
    partition column's min=max comes from the directory name (hive
    unescaping included), the data column from footers."""
    out = str(tmp_path / "pstats")
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "n_chars"
    )
    write_parquet(d, out, partition_by=["lang"])
    version_log_enable(spark, out)
    stats_enable(spark, out, ["lang", "n_chars"])
    names = _names(spark, out)
    kept, pruned = _stats_prune(spark, out, names, "lang", "en", "en")
    assert pruned > 0
    _same(
        read_where(spark, out, "lang", "en", "en"),
        d.filter(F.col("lang") == "en"),
    )
    # numeric stats on the data column prune too (per-partition files
    # each hold the full n_chars range, so use an out-of-domain probe)
    none = read_where(spark, out, "n_chars", 10**9, None)
    assert none.count() == 0


def test_all_null_column_files_prune_for_ranges(spark, tmp_path):
    """A file whose stats column is entirely NULL can never satisfy a
    range predicate and is pruned; mixed-null files keep exact
    results."""
    out = str(tmp_path / "nstats")
    a = spark.range(0, 100).select(
        F.col("id"), F.col("id").cast("long").alias("score")
    )
    b = spark.range(100, 200).select(
        F.col("id"), F.lit(None).cast("long").alias("score")
    )
    a.coalesce(1).write.parquet(out)
    version_log_enable(spark, out)
    stats_enable(spark, out, ["score"])
    append_dataset(spark, b.coalesce(1), out)
    names = _names(spark, out)
    kept, pruned = _stats_prune(spark, out, names, "score", 0, 1000)
    assert pruned == 1, "the all-NULL file must be skipped"
    got = read_where(spark, out, "score", 0, 1000)
    assert got.count() == 100
    assert {r["id"] for r in got.collect()} == set(range(100))


def test_hive_unescape_roundtrip():
    from engage_spark.io import _hive_part_dir
    from engage_spark.stats import _hive_unescape

    for v in ["plain", "a b", "x=y", "100%", "a/b", "q#r", "it's"]:
        dirname = _hive_part_dir("c", v)
        assert _hive_unescape(dirname.split("=", 1)[1]) == v
    assert _hive_unescape("__HIVE_DEFAULT_PARTITION__") is None


def test_file_stats_dedupes_and_is_empty_without_enable(spark, zstats, tmp_path):
    out, _ = zstats
    st = file_stats(spark, out)
    assert st.count() == st.dropDuplicates(["name", "col"]).count()
    bare = str(tmp_path / "bare")
    spark.range(5).write.parquet(bare)
    assert file_stats(spark, bare).count() == 0


def test_vacuum_compacts_stats_sidecar(spark, zstats):
    """vacuum_versions rewrites the stats sidecar to one part holding
    rows only for files some retained version still references;
    pruning keeps working on the compacted sidecar."""
    import os

    from engage_spark.versioning import vacuum_versions

    out, ev = zstats
    extra = ev.withColumn("event_id", F.col("event_id") + 10_000_000)
    append_dataset(spark, extra, out)                              # v2
    append_dataset(
        spark, extra.withColumn("event_id", F.col("event_id") + 1), out
    )                                                              # v3
    pre_names = {
        r["name"] for r in file_stats(spark, out).select("name").collect()
    }
    res = vacuum_versions(spark, str(out), keep_last=1)
    assert res["stats_rows_kept"] > 0
    post = file_stats(spark, out)
    post_names = {r["name"] for r in post.select("name").collect()}
    live = set(_names(spark, out))
    assert post_names <= pre_names
    assert post_names == live & pre_names
    parts = [
        n
        for n in os.listdir(f"{out}/_versions/stats")
        if n.endswith(".parquet")
    ]
    assert len(parts) == 1
    got = read_where(spark, out, "user_id", 10, 20)
    exp = ev.filter((F.col("user_id") >= 10) & (F.col("user_id") <= 20))
    assert got.count() == 3 * exp.count()


def test_compound_predicate_prunes_multiplicatively(spark, zstats):
    """and_where: a second range on the OTHER Z-order column prunes
    further than either alone, and the result equals applying both
    filters to the unpruned read."""
    out, ev = zstats
    names = _names(spark, out)
    k1, _ = _stats_prune(spark, out, names, "user_id", 10, 60)
    k2, _ = _stats_prune(spark, out, k1, "v_cents", 0, 2000)
    assert len(k2) < len(k1) < len(names)
    got = read_where(
        spark, out, "user_id", 10, 60, and_where={"v_cents": (0, 2000)}
    )
    exp = ev.filter(
        (F.col("user_id") >= 10) & (F.col("user_id") <= 60)
        & (F.col("v_cents") >= 0) & (F.col("v_cents") <= 2000)
    )
    assert exp.count() > 0
    _same(got, exp)


def test_stats_follow_optimize_rewrites(spark, zstats):
    """An incremental OPTIMIZE rewrites victim files into new ones;
    the commit hook harvests the rewrites' stats automatically and the
    pruned read stays exact over the new layout."""
    from engage_spark.io import optimize_incremental, zorder_append

    out, ev = zstats
    extra = ev.withColumn("event_id", F.col("event_id") + 10_000_000)
    zorder_append(spark, extra, out, num_files=4)                  # v2
    optimize_incremental(spark, out)                               # v3
    names = set(_names(spark, out))
    with_stats = {
        r["name"] for r in file_stats(spark, out).select("name").collect()
    }
    assert names <= with_stats, "rewritten files missing from the sidecar"
    got = read_where(spark, out, "user_id", 10, 20)
    exp = ev.filter((F.col("user_id") >= 10) & (F.col("user_id") <= 20))
    assert got.count() == 2 * exp.count()


def test_distributed_harvest_past_256_files(spark, tmp_path):
    """Past 256 files the footer harvest fans out as a Spark job over
    the name list (driver fallback otherwise); rows and pruning are
    identical either way."""
    out = str(tmp_path / "many")
    # round-robin repartition: exactly 300 part files (hash-by-column
    # would collide buckets and land under the 256 threshold)
    spark.range(0, 30000).repartition(300).write.parquet(out)
    version_log_enable(spark, out)
    n = stats_enable(spark, out, ["id"])
    assert n >= 257, f"expected >256 files, got {n}"
    st = file_stats(spark, out)
    assert st.count() == n
    names = _names(spark, out)
    kept, pruned = _stats_prune(spark, out, names, "id", 0, 50)
    assert pruned > 0
    got = read_where(spark, out, "id", 0, 50)
    assert got.count() == 51


def test_spec_widening_backfills_new_columns(spark, zstats):
    """stats_enable called again with MORE columns backfills exactly
    the missing (file, column) pairs — old files gain the new column's
    stats, no duplicate rows, and the new column prunes."""
    out, ev = zstats
    st0 = file_stats(spark, out)
    assert {r["col"] for r in st0.select("col").distinct().collect()} == {
        "user_id", "v_cents",
    }
    n = stats_enable(spark, out, ["user_id", "v_cents", "event_id"])
    assert n == 16  # every file was missing the new column
    st1 = file_stats(spark, out)
    assert st1.count() == st0.count() + 16
    assert st1.count() == st1.dropDuplicates(["name", "col"]).count()
    # harvest is idempotent once complete
    assert stats_enable(spark, out, ["user_id", "v_cents", "event_id"]) == 0
    none = read_where(spark, out, "event_id", 10**12, None)
    assert none.count() == 0


def test_schema_evolved_files_prune_as_all_null(spark, tmp_path):
    """A file written BEFORE a column existed reads as NULL for it
    (mergeSchema), so stats mark it prunable for any range on that
    column — and the pruned read still equals the tolerant full read."""
    out = str(tmp_path / "evo")
    spark.range(0, 100).selectExpr("id").coalesce(1).write.parquet(out)
    version_log_enable(spark, out)
    append_dataset(
        spark,
        spark.range(100, 200).selectExpr(
            "id", "id * 10 AS score"
        ).coalesce(1),
        out,
    )
    stats_enable(spark, out, ["score"])
    st = file_stats(spark, out)
    # the pre-evolution file carries the prunable all-NULL row
    assert st.filter(
        F.col("is_num").isNotNull()
        & F.col("mn_num").isNull() & F.col("mn_str").isNull()
    ).count() == 1
    names = _names(spark, out)
    kept, pruned = _stats_prune(spark, out, names, "score", 1000, 1500)
    assert pruned == 1
    got = read_where(spark, out, "score", 1000, 1500)
    assert got.count() == 51  # ids 100..150
    assert {r["id"] for r in got.collect()} == set(range(100, 151))


def test_unbounded_read_where_keeps_all_null_files(spark, tmp_path):
    """With BOTH bounds None there is no predicate, so even files whose
    column is entirely NULL (or absent pre-evolution) must contribute
    their rows — nothing may be pruned."""
    out = str(tmp_path / "nobounds")
    spark.range(0, 100).selectExpr("id").coalesce(1).write.parquet(out)
    version_log_enable(spark, out)
    append_dataset(
        spark,
        spark.range(100, 200).selectExpr("id", "id AS score").coalesce(1),
        out,
    )
    stats_enable(spark, out, ["score"])
    names = _names(spark, out)
    kept, pruned = _stats_prune(spark, out, names, "score", None, None)
    assert pruned == 0 and set(kept) == set(names)
    got = read_where(spark, out, "score")
    assert got.count() == 200
