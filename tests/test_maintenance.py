"""One-call operations surface (engage_spark.maintenance, round 14):
DESCRIBE DETAIL metadata row + the composed housekeeping pass.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from engage_spark.io import (
    append_dataset,
    delete_rows,
    upsert_dataset,
    write_parquet,
    zorder_write,
)
from engage_spark.indexes import bloom_enable
from engage_spark.maintenance import dataset_details, maintain_dataset
from engage_spark.stats import stats_enable
from engage_spark.versioning import (
    _vlog_entries,
    read_version,
    version_log_enable,
)


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "n_chars"
    )


@pytest.fixture()
def rich(spark, sf_dir, tmp_path):
    """A corpus wearing every hat: clustered + partitioned + versioned
    + stats + bloom + an evolved merge + a plain append (layout
    debris) + pending takedown keys."""
    out = str(tmp_path / "rich")
    d = _docs(spark, sf_dir)
    zorder_write(
        spark, d, out, ["doc_id", "n_chars"], bits=16, num_files=4,
        partition_by=["lang"],
    )
    version_log_enable(spark, out)                                 # v1
    stats_enable(spark, out, ["doc_id"])
    bloom_enable(spark, out, ["doc_id"])
    upsert_dataset(
        spark, out,
        d.limit(40).withColumn("quality", F.lit(0.5)),
        ["doc_id"], partition_by=["lang"], assume_partition_stable=True,
        evolve_schema=True,
    )                                                              # v2
    append_dataset(
        spark,
        d.limit(60).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            "lang", "n_chars",
        ),
        out, partition_by=["lang"],
    )                                                              # v3
    delete_rows(
        spark, out,
        d.filter(F.col("doc_id") % 13 == 0).select("doc_id"), "doc_id",
    )                                                              # v4
    return out, d


def test_dataset_details_reports_every_surface(spark, sf_dir, rich):
    out, d = rich
    row = dataset_details(spark, out).collect()[0]
    assert row["path"] == out
    assert row["versioned"] and row["latest_version"] == 4
    assert row["partition_cols"] == "lang"
    assert row["n_partition_dirs"] == (
        d.select("lang").distinct().count()
    )
    assert row["n_live_files"] > 0 and row["live_bytes"] > 0
    assert row["n_retained_files"] > 0  # the merge retained v1 files
    assert row["pending_delete_keys"] == (
        d.filter(F.col("doc_id") % 13 == 0).count()
    )
    assert row["pending_dv_versions"] == 1
    assert row["clustered_by"] == "doc_id,n_chars"
    assert row["schema_evolved"] is True
    assert row["stats_columns"] == "doc_id"
    assert row["bloom_columns"] == "doc_id"
    assert row["bucketed_by"] == ""


def test_dataset_details_plain_dataset(spark, sf_dir, tmp_path):
    out = str(tmp_path / "plain")
    write_parquet(_docs(spark, sf_dir), out)
    row = dataset_details(spark, out).collect()[0]
    assert row["versioned"] is False and row["latest_version"] == 0
    assert row["partition_cols"] == "" and row["n_partition_dirs"] == 0
    assert row["pending_delete_keys"] == 0
    assert row["clustered_by"] == "" and row["schema_evolved"] is False
    with pytest.raises(FileNotFoundError):
        dataset_details(spark, str(tmp_path / "nope"))


def test_maintain_runs_every_due_step_then_noops(spark, sf_dir, rich):
    out, d = rich
    r = maintain_dataset(
        spark, out, target_file_bytes=1 << 20, keep_last=50
    )
    assert set(r) >= {"apply_deletes", "layout", "vacuum"}
    assert "drift_reconciled" in r
    assert r["apply_deletes"]["deleted_keys"] == (
        d.filter(F.col("doc_id") % 13 == 0).count()
    )
    # the plain append degraded the layout, so the optimize was due
    assert r["layout"]["overlap_fraction"] >= 0.1
    assert "optimize" in r and r["optimize"]["rewritten_files"] >= 2
    # post-maintenance state: sidecar consumed, DVs settled, exact data
    row = dataset_details(spark, out).collect()[0]
    assert row["pending_delete_keys"] == 0
    assert row["pending_dv_versions"] == 0
    exp = (
        d.filter(F.col("doc_id") % 13 != 0)
        .unionByName(
            d.limit(60).select(
                (F.col("doc_id") + 1_000_000).alias("doc_id"),
                "lang", "n_chars",
            )
        )
    )
    live = spark.read.option("mergeSchema", "true").parquet(out)
    assert live.count() == exp.count()
    # history: every step an exact entry, no drift
    ops = [e["op"] for e in _vlog_entries(spark, out)]
    assert "reconcile" not in ops
    assert ops.count("vacuum_deletes") == 1
    assert ops.count("optimize") == 1
    # second pass: nothing due (below threshold, sidecar empty)
    r2 = maintain_dataset(spark, out, target_file_bytes=1 << 20)
    assert "apply_deletes" not in r2 and "optimize" not in r2
    assert r2["layout"]["overlap_fraction"] < 0.1
    # time travel through the maintenance still replays
    assert read_version(spark, out, 3).count() == d.count() + 60


def test_maintain_noops_on_plain_unclustered_dataset(
    spark, sf_dir, tmp_path
):
    out = str(tmp_path / "plain2")
    write_parquet(_docs(spark, sf_dir), out)
    assert maintain_dataset(spark, out) == {}


def test_maintain_survives_full_takedown(spark, sf_dir, tmp_path):
    """apply_deletes can leave ZERO live data files; the later steps
    (layout probe) must treat that as an empty layout instead of dying
    on schema inference, and the vacuum still runs (review-found)."""
    out = str(tmp_path / "fulltd")
    d = _docs(spark, sf_dir)
    zorder_write(
        spark, d, out, ["doc_id", "n_chars"], bits=16, num_files=4,
    )
    version_log_enable(spark, out)
    delete_rows(spark, out, d.select("doc_id"), "doc_id")  # everything
    r = maintain_dataset(spark, out, keep_last=50)
    assert r["apply_deletes"]["deleted_keys"] == d.count()
    assert r["layout"]["files"] == 0 and "optimize" not in r
    assert "vacuum" in r
    row = dataset_details(spark, out).collect()[0]
    # the survivor rewrite may stage one empty part; what matters is
    # zero rows, zero backlog
    assert row["pending_delete_keys"] == 0
    assert spark.read.parquet(out).count() == 0


def test_maintain_records_conflicts_and_continues(
    spark, sf_dir, rich, monkeypatch
):
    """A step that loses its optimistic race repeatedly must be
    RECORDED, not propagated — the retention vacuum would otherwise be
    starved forever on a permanently-hot dataset (review-found)."""
    import engage_spark.maintenance as em
    from engage_spark.io import TakedownConflict

    out, d = rich

    def always_conflicting(*a, **k):
        raise TakedownConflict("synthetic: lost the race")

    monkeypatch.setattr(em, "apply_deletes", always_conflicting)
    r = maintain_dataset(spark, out, target_file_bytes=1 << 20, keep_last=50)
    assert "conflict" in r["apply_deletes"]
    assert "vacuum" in r, "later steps must still run"


def test_details_dedups_reissued_takedown_keys(spark, sf_dir, tmp_path):
    """A re-issued takedown appends a duplicate batch; the backlog
    metric counts DISTINCT pending keys, not sidecar rows."""
    out = str(tmp_path / "dedupkeys")
    d = _docs(spark, sf_dir)
    write_parquet(d, out, partition_by=["lang"])
    version_log_enable(spark, out)
    ids = d.filter(F.col("doc_id") % 19 == 0).select("doc_id")
    delete_rows(spark, out, ids, "doc_id")
    delete_rows(spark, out, ids, "doc_id")  # retried job, same keys
    row = dataset_details(spark, out).collect()[0]
    assert row["pending_delete_keys"] == ids.count()


def test_details_nonhive_nested_dirs_not_mislabeled(
    spark, sf_dir, tmp_path
):
    """Nested NON-hive dirs (batch-001/part-*.parquet) must not be
    reported as partition columns."""
    out = tmp_path / "nested"
    d = _docs(spark, sf_dir)
    d.limit(50).write.parquet(str(out / "batch-001"))
    d.limit(50).write.parquet(str(out / "batch-002"))
    row = dataset_details(spark, str(out)).collect()[0]
    assert row["partition_cols"] == ""
    assert row["n_partition_dirs"] == 2  # leaf dirs, still counted
