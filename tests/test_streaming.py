"""Streaming == batch on the same data (the Structured Streaming
contract the module is built on)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from engage_spark.io import table
from engage_spark.streaming import (
    sessionize_stream,
    stream_events_from_parquet,
    tumbling_counts_stream,
)
from engage_spark.streaming.jobs import run_available_now


def _drain(spark, stream_df, tmp_path, name) -> pd.DataFrame:
    run_available_now(stream_df, str(tmp_path), name)
    return spark.read.parquet(f"{tmp_path}/{name}").toPandas()


def test_tumbling_stream_matches_batch(spark, sf_dir, tmp_path):
    stream = tumbling_counts_stream(stream_events_from_parquet(spark, sf_dir))
    got = _drain(spark, stream, tmp_path, "tumbling").sort_values(
        ["win_start", "event_type"]
    ).reset_index(drop=True)

    ev = table(spark, sf_dir, "events")
    exp = (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("win_start"), "event_type",
            "n_events", "sum_value",
        )
        .toPandas()
        .sort_values(["win_start", "event_type"])
        .reset_index(drop=True)
    )
    # append-mode watermark semantics: windows not yet closed when the
    # stream drains stay in state. Every EMITTED row must match batch
    # exactly; anything withheld must be within the watermark horizon
    # of the stream's end.
    merged = got.merge(exp, on=list(got.columns), how="left", indicator=True)
    assert (merged._merge == "both").all(), "streamed row not in batch result"
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    horizon = pd.Timestamp(max_ts) - pd.Timedelta(hours=2)  # watermark+window
    missing = exp.merge(got, on=list(got.columns), how="left", indicator=True)
    held_back = missing[missing._merge != "both"]
    assert (pd.to_datetime(held_back.win_start) >= horizon).all()
    assert len(got) >= len(exp) - 4  # only the tail is withheld


def test_session_stream_matches_batch(spark, sf_dir, tmp_path):
    stream = sessionize_stream(stream_events_from_parquet(spark, sf_dir))
    got = _drain(spark, stream, tmp_path, "sessions")

    ev = table(spark, sf_dir, "events")
    exp = (
        ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "n_events",
        )
        .toPandas()
    )
    # emitted sessions match the batch twin exactly; withheld ones are
    # only those still open within the watermark horizon at stream end
    merged = got.merge(exp, on=list(got.columns), how="left", indicator=True)
    assert (merged._merge == "both").all(), "streamed session not in batch result"
    max_ts = pd.Timestamp(ev.agg(F.max("ts")).collect()[0][0])
    horizon = max_ts - pd.Timedelta(hours=1)
    missing = exp.merge(got, on=list(got.columns), how="left", indicator=True)
    held_back = missing[missing._merge != "both"]
    assert (pd.to_datetime(held_back.session_end) >= horizon).all()
    # sessions are per-user, disjoint in time
    g = got.sort_values(["user_id", "session_start"])
    for _, u in g.groupby("user_id"):
        starts = u.session_start.to_numpy()
        ends = u.session_end.to_numpy()
        assert (starts[1:] >= ends[:-1]).all()


def test_watermark_present_in_plan(spark, sf_dir):
    stream = tumbling_counts_stream(stream_events_from_parquet(spark, sf_dir))
    assert stream.isStreaming
    plan = stream._jdf.queryExecution().analyzed().toString()
    assert "EventTimeWatermark" in plan


def test_stateful_running_stats_matches_batch(spark, sf_dir, tmp_path):
    """applyInPandasWithState: final per-user (count, ewma) after
    draining the whole stream equals a batch computation of the same
    recurrence."""
    from engage_spark.streaming import running_user_stats_stream

    stream = running_user_stats_stream(stream_events_from_parquet(spark, sf_dir))
    q = (
        stream.writeStream.format("memory")
        .queryName("user_stats")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = (
        spark.sql("SELECT * FROM user_stats")
        .toPandas()
        .sort_values("user_id")
        .drop_duplicates("user_id", keep="last")  # update mode re-emits per batch
        .reset_index(drop=True)
    )

    ev = (
        table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "value")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    alpha = 0.2
    rows = []
    for uid, g in ev.groupby("user_id"):
        ewma = None
        for v in g["value"]:
            ewma = float(v) if ewma is None else alpha * float(v) + (1 - alpha) * ewma
        rows.append((uid, len(g), ewma))
    exp = pd.DataFrame(rows, columns=["user_id", "n_events", "ewma_value"])
    merged = got.merge(exp, on="user_id", suffixes=("_got", "_exp"))
    assert len(merged) == len(exp)
    assert (merged.n_events_got == merged.n_events_exp).all()
    assert (merged.ewma_value_got - merged.ewma_value_exp).abs().max() < 1e-9


def test_streaming_dedup_collapses_redelivered_events(spark, sf_dir, tmp_path):
    """Feed the same events file twice (an at-least-once redelivery) —
    the watermarked streaming dedup must emit each event_id once."""
    import shutil

    from engage_spark.streaming import dedup_events_stream, stream_parquet

    src = f"{sf_dir}/events.parquet"
    redelivered = tmp_path / "redelivered"
    redelivered.mkdir()
    shutil.copy(src, redelivered / "delivery_1.parquet")
    shutil.copy(src, redelivered / "delivery_2.parquet")

    batch_schema = table(spark, sf_dir, "events").schema
    stream = stream_parquet(spark, str(redelivered), batch_schema, schema_src=src)

    got = _drain(spark, dedup_events_stream(stream), tmp_path, "dedup")
    n_unique = table(spark, sf_dir, "events").select("event_id").distinct().count()
    assert len(got) == n_unique
    assert got.event_id.is_unique


def test_late_data_beyond_watermark_is_dropped(spark, sf_dir, tmp_path):
    """The watermark contract as tested behavior, not prose: a row
    arriving in a later micro-batch whose window closed before the
    current watermark must NOT re-open or modify the emitted window.

    Three parquet "deliveries" processed as separate micro-batches
    (maxFilesPerTrigger=1): delivery 1 spans hours 0 and 10; delivery 2
    is a fresh hour-20 row (Spark's late-event filter uses the watermark
    committed BEFORE the previous batch — SPARK-24634's two-phase
    late-filter/eviction split — so a spacer batch is needed for the
    watermark to take effect); delivery 3 is one ~19.5-hours-late row
    for hour 0, far beyond the 1-hour horizon -> dropped. In append
    mode the hour-0 window emits with exactly its on-time count."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from engage_spark.streaming import stream_parquet, tumbling_counts_stream

    src_dir = tmp_path / "late_src"
    src_dir.mkdir()
    base = pd.Timestamp("2024-01-01 00:00:00")

    def mk(rows):
        df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"])
        return pa.Table.from_pandas(
            df.astype({"event_id": "int64", "user_id": "int64", "value": "float64"}),
            preserve_index=False,
        )

    on_time = [
        (i, base + pd.Timedelta(minutes=i), 1, "a", 1.0, "{}") for i in range(50)
    ] + [
        (100 + i, base + pd.Timedelta(hours=10, minutes=i), 1, "a", 1.0, "{}")
        for i in range(50)
    ]
    fresh = [(901, base + pd.Timedelta(hours=20), 1, "a", 1.0, "{}")]
    late = [(900, base + pd.Timedelta(minutes=30), 1, "a", 1.0, "{}")]  # hour-0: LATE
    f1 = src_dir / "delivery_1.parquet"
    f2 = src_dir / "delivery_2.parquet"
    f3 = src_dir / "delivery_3.parquet"
    pq.write_table(mk(on_time), f1)
    pq.write_table(mk(fresh), f2)
    pq.write_table(mk(late), f3)
    # file source orders micro-batches by modification time
    now = os.path.getmtime(f3)
    os.utime(f1, (now - 20, now - 20))
    os.utime(f2, (now - 10, now - 10))

    batch_schema = table(spark, sf_dir, "events").schema
    stream = stream_parquet(
        spark, str(src_dir), batch_schema, schema_src=str(f1), maxFilesPerTrigger="1"
    )
    got = _drain(spark, tumbling_counts_stream(stream), tmp_path, "late")

    h0 = got[got.win_start == base]
    assert len(h0) == 1, f"hour-0 window rows: {h0}"
    # 50 on-time rows; the late row must have been dropped, not merged
    assert int(h0.n_events.iloc[0]) == 50
    # hour-10 window also closed (watermark reached 19:00 via the fresh row)
    h10 = got[got.win_start == base + pd.Timedelta(hours=10)]
    assert len(h10) == 1 and int(h10.n_events.iloc[0]) == 50
    # the still-open hour-20 window is withheld in append mode
    assert (got.win_start != base + pd.Timedelta(hours=20)).all()


def test_transform_with_state_matches_apply_in_pandas_with_state(
    spark, sf_dir, tmp_path
):
    """The StatefulProcessor (transformWithStateInPandas) twin computes
    the same per-user (count, ewma) as the applyInPandasWithState
    operator and the batch recurrence. Executing TWS needs the protobuf
    package (state-server protocol) and the RocksDB state store
    provider; absent protobuf we still assert the plan ANALYZES (the
    declaration is valid) and skip execution."""
    import pytest

    from engage_spark.streaming.jobs import running_user_stats_tws

    stream = running_user_stats_tws(stream_events_from_parquet(spark, sf_dir))
    assert stream.isStreaming  # declaration analyzes without protobuf

    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        pytest.skip("protobuf unavailable in container — TWS execution gated")

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("user_stats_tws")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_tws"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = (
        spark.sql("SELECT * FROM user_stats_tws")
        .toPandas()
        .sort_values("user_id")
        .drop_duplicates("user_id", keep="last")
        .reset_index(drop=True)
    )

    ev = (
        table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "value")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    alpha = 0.2
    rows = []
    for uid, g in ev.groupby("user_id"):
        ewma = None
        for v in g["value"]:
            ewma = float(v) if ewma is None else alpha * float(v) + (1 - alpha) * ewma
        rows.append((uid, len(g), ewma))
    exp = pd.DataFrame(rows, columns=["user_id", "n_events", "ewma_value"])
    merged = got.merge(exp, on="user_id", suffixes=("_got", "_exp"))
    assert len(merged) == len(exp)
    assert (merged.n_events_got == merged.n_events_exp).all()
    assert (merged.ewma_value_got - merged.ewma_value_exp).abs().max() < 1e-9


def test_checkpoint_recovery_preserves_dedup_state(spark, sf_dir, tmp_path):
    """Exactly-once across a restart: a drained query's checkpoint
    carries both source offsets and dedup state, so a second run over
    the same checkpoint (1) does not reprocess delivery 1, and (2)
    still recognizes delivery 2's rows as duplicates via the persisted
    state store. All events sit inside one watermark horizon so no key
    is evicted between runs."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from engage_spark.streaming import dedup_events_stream, stream_parquet

    src_dir = tmp_path / "ckpt_src"
    src_dir.mkdir()
    base = pd.Timestamp("2024-01-01 00:00:00")
    rows = [
        (i, base + pd.Timedelta(seconds=i), 1, "a", 1.0, "{}") for i in range(100)
    ]
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).astype({"event_id": "int64", "user_id": "int64", "value": "float64"})
    tbl = pa.Table.from_pandas(pdf, preserve_index=False)
    f1 = src_dir / "delivery_1.parquet"
    pq.write_table(tbl, f1)

    batch_schema = table(spark, sf_dir, "events").schema
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        stream = stream_parquet(spark, str(src_dir), batch_schema, schema_src=str(f1))
        q = (
            dedup_events_stream(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    first = spark.read.parquet(out).toPandas()
    assert len(first) == 100 and first.event_id.is_unique

    # "restart": same checkpoint, delivery 2 = byte-identical redelivery
    pq.write_table(tbl, src_dir / "delivery_2.parquet")
    run_once()
    second = spark.read.parquet(out).toPandas()
    assert len(second) == 100, (
        f"restart re-emitted rows: {len(second)} (state or offsets lost)"
    )
    assert second.event_id.is_unique


def test_incremental_ingest_stream_dedups_across_batches(spark, tmp_path):
    """The foreachBatch corpus-ingest pattern: duplicates planted
    WITHIN a micro-batch, ACROSS micro-batches, and ACROSS separate
    stream runs must all collapse; the fingerprint store is the only
    carried state."""
    from engage_spark.streaming.jobs import incremental_ingest_stream

    in1 = str(tmp_path / "in1")
    # three single-row files -> three micro-batches with
    # maxFilesPerTrigger=1; doc 2 duplicates doc 0's text cross-batch,
    # doc 3 duplicates doc 1 within one batch
    rows = [
        (0, "alpha  beta"), (1, "gamma delta"),      # file A
        (2, "Alpha Beta"), (3, "gamma delta"),       # file B (2 dups 0; 3 dups 1)
        (4, "epsilon zeta"),                         # file C
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.filter("doc_id < 2").coalesce(1).write.parquet(f"{in1}/a.parquet")
    df.filter("doc_id in (2, 3)").coalesce(1).write.parquet(f"{in1}/b.parquet")
    df.filter("doc_id = 4").coalesce(1).write.parquet(f"{in1}/c.parquet")

    corpus, store = str(tmp_path / "corpus"), str(tmp_path / "store")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(in1)
    )
    q = incremental_ingest_stream(stream, corpus, store)
    q.awaitTermination()

    got = spark.read.parquet(corpus).toPandas()
    # normalized fingerprints: "alpha beta" == "Alpha Beta"
    assert sorted(got.doc_id) == [0, 1, 4]
    assert got.fingerprint.nunique() == 3
    assert spark.read.parquet(store).distinct().count() == 3

    # a SECOND run (new input, same store): one seen doc, one new
    in2 = str(tmp_path / "in2")
    df2 = spark.createDataFrame(
        [(10, "epsilon   zeta"), (11, "eta theta")], "doc_id long, text string"
    )
    df2.coalesce(1).write.parquet(f"{in2}/d.parquet")
    stream2 = (
        spark.readStream.schema("doc_id long, text string")
        .option("recursiveFileLookup", "true")
        .parquet(in2)
    )
    corpus2 = str(tmp_path / "corpus2")
    q2 = incremental_ingest_stream(stream2, corpus2, store)
    q2.awaitTermination()
    got2 = spark.read.parquet(corpus2).toPandas()
    assert sorted(got2.doc_id) == [11]  # 10 was already in the store
    assert spark.read.parquet(store).distinct().count() == 4


def test_incremental_ingest_restart_is_a_noop(spark, tmp_path):
    """Restarting the ingest stream on the SAME checkpoint with no new
    input must neither re-admit nor duplicate anything — the committed
    batches are owned by the checkpoint, and the store is untouched."""
    from engage_spark.streaming.jobs import incremental_ingest_stream

    src = str(tmp_path / "in")
    spark.createDataFrame(
        [(1, "one two"), (2, "three four")], "doc_id long, text string"
    ).coalesce(1).write.parquet(f"{src}/a.parquet")
    corpus, store = str(tmp_path / "corpus"), str(tmp_path / "store")

    def run():
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("recursiveFileLookup", "true")
            .parquet(src)
        )
        incremental_ingest_stream(stream, corpus, store).awaitTermination()

    run()
    first = spark.read.parquet(corpus).toPandas()
    run()  # restart, same checkpoint, nothing new
    second = spark.read.parquet(corpus).toPandas()
    assert sorted(first.doc_id) == sorted(second.doc_id) == [1, 2]
    assert spark.read.parquet(store).select("fingerprint").distinct().count() == 2


def test_ingest_replay_after_store_write_recovers_batch(spark, tmp_path):
    """Crash AFTER the fingerprint-store write but BEFORE the checkpoint
    commit: the replayed batch must recompute the same accepted set —
    not anti-join against its own half-committed fingerprints and
    overwrite the corpus partition with empty data (which would lose
    the documents forever: their fingerprints stay in the store)."""
    import hashlib

    from engage_spark.api import normalized_fingerprint
    from engage_spark.streaming.jobs import incremental_ingest_stream

    src = str(tmp_path / "in")
    spark.createDataFrame(
        [(1, "one two"), (2, "three four")], "doc_id long, text string"
    ).coalesce(1).write.parquet(f"{src}/a.parquet")
    corpus, store = str(tmp_path / "corpus"), str(tmp_path / "store")
    run_tag = hashlib.md5(f"{corpus}_ckpt".encode()).hexdigest()[:12]

    # simulate the half-committed state: batch 0's store partition
    # already holds exactly what ingest will write; checkpoint is empty,
    # so the stream will (re)process batch 0 against this store
    (
        spark.read.parquet(f"{src}/a.parquet")
        .select(normalized_fingerprint("text").alias("fingerprint"))
        .distinct()
        .write.parquet(f"{store}/run={run_tag}_batch=0")
    )

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    incremental_ingest_stream(stream, corpus, store).awaitTermination()
    got = spark.read.parquet(corpus).toPandas()
    assert sorted(got.doc_id) == [1, 2], (
        "replay lost the batch: the anti-join saw the batch's own "
        "half-committed fingerprints"
    )
    assert spark.read.parquet(store).select("fingerprint").distinct().count() == 2


def test_ingest_warns_when_store_lacks_run_partitions(spark, tmp_path, caplog):
    """A pre-existing FLAT fingerprint store (no run=... hive layout,
    e.g. bootstrapped by an external writer) disables the replay
    self-exclusion; that degraded mode must be logged, not silent."""
    import logging

    from engage_spark.streaming.jobs import incremental_ingest_stream

    src = str(tmp_path / "in")
    spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")], "doc_id long, text string"
    ).coalesce(1).write.parquet(f"{src}/a.parquet")
    corpus, store = str(tmp_path / "corpus"), str(tmp_path / "store")
    # flat store: fingerprints but no run partition column
    spark.createDataFrame([("deadbeef",)], "fingerprint string").write.parquet(
        store
    )

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    with caplog.at_level(logging.WARNING, logger="engage_spark.streaming.jobs"):
        incremental_ingest_stream(stream, corpus, store).awaitTermination()
    assert any(
        "replay protection is OFF" in r.message for r in caplog.records
    ), "flat store must emit the unprotected-replay warning"
    # ingest itself still works in degraded mode
    got = spark.read.parquet(corpus).toPandas()
    assert sorted(got.doc_id) == [1, 2]


def test_ingest_trigger_knob_processing_time(spark, tmp_path):
    """The trigger parameter must pass through to writeStream.trigger()
    — a processingTime ingest keeps running (long-lived mode) and still
    admits/dedups the delivered batch."""
    import time

    from engage_spark.streaming.jobs import incremental_ingest_stream

    src = str(tmp_path / "in")
    spark.createDataFrame(
        [(1, "one two"), (2, "one two"), (3, "three")],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(f"{src}/a.parquet")
    corpus, store = str(tmp_path / "corpus"), str(tmp_path / "store")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q = incremental_ingest_stream(
        stream, corpus, store, trigger={"processingTime": "1 second"}
    )
    try:
        deadline = time.time() + 60
        got = []
        while time.time() < deadline:
            try:
                got = sorted(
                    r.doc_id for r in spark.read.parquet(corpus).collect()
                )
                if got == [1, 3]:
                    break
            except Exception:
                pass
            time.sleep(1)
        assert got == [1, 3], f"processingTime ingest produced {got}"
        assert q.isActive  # long-running mode: not self-terminating
    finally:
        q.stop()


def test_ingest_near_dup_admission_across_batches(spark, tmp_path):
    """near_dup_index upgrades streaming admission from exact-only to
    near-dup aware: a later batch's paraphrase of an earlier batch's
    document must be rejected even though its fingerprint differs,
    while genuinely new text is admitted; the index grows with each
    admitted batch."""
    from engage_spark.streaming.jobs import incremental_ingest_stream

    base = (
        "the quick brown fox jumps over the lazy dog while rain falls "
        "softly on the old tin roof of the farmhouse near the river"
    )
    near = base.replace("lazy dog", "sleepy dog")
    fresh = (
        "spark executes declarative plans through catalyst which optimizes "
        "joins and projections before tungsten generates fast bytecode"
    )
    src = str(tmp_path / "in")
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, fresh)], "doc_id long, text string"
    )
    # batch 1: doc 1; batch 2: docs 2 (near-dup of 1) + 3 (fresh)
    df.filter("doc_id = 1").coalesce(1).write.parquet(f"{src}/a.parquet")
    df.filter("doc_id > 1").coalesce(1).write.parquet(f"{src}/b.parquet")

    corpus, store = str(tmp_path / "corpus"), str(tmp_path / "store")
    idx = str(tmp_path / "nd_idx")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    incremental_ingest_stream(
        stream, corpus, store, near_dup_index=idx
    ).awaitTermination()

    got = sorted(r.doc_id for r in spark.read.parquet(corpus).collect())
    assert got == [1, 3], f"near-dup admission produced {got}"
    # the index holds exactly the admitted docs
    idx_ids = sorted(
        r.doc_id
        for r in spark.read.parquet(f"{idx}/hashes").select("doc_id").collect()
    )
    assert idx_ids == [1, 3]


def test_ingest_semantic_admission_across_batches(spark, tmp_path):
    """embed_index adds the SEMANTIC admission tier: a later batch's
    document with (near-)identical EMBEDDING but entirely different
    words — the paraphrase/translation case MinHash cannot see — is
    rejected; a semantically fresh document is admitted; the embed
    index grows only with admitted docs."""
    import numpy as np

    from engage_spark.streaming.jobs import incremental_ingest_stream

    rng = np.random.RandomState(11)
    base_vec = rng.randn(64)
    near_vec = base_vec + 0.01 * rng.randn(64)  # cosine ~1 with base
    fresh_vec = rng.randn(64)                   # cosine ~0
    rows = [
        (1, "the original english sentence about rainfall totals", base_vec),
        (2, "la frase original en espanol sobre lluvia acumulada", near_vec),
        (3, "catalyst compiles declarative plans into fast bytecode",
         fresh_vec),
    ]
    src = str(tmp_path / "in")
    df = spark.createDataFrame(
        [(i, t, v.tolist()) for i, t, v in rows],
        "doc_id long, text string, embedding array<double>",
    )
    # batch 1: doc 1; batch 2: doc 2 (semantic dup of 1) + doc 3
    df.filter("doc_id = 1").coalesce(1).write.parquet(f"{src}/a.parquet")
    df.filter("doc_id > 1").coalesce(1).write.parquet(f"{src}/b.parquet")

    corpus, store = str(tmp_path / "corpus"), str(tmp_path / "store")
    eidx = str(tmp_path / "emb_idx")
    stream = (
        spark.readStream.schema(
            "doc_id long, text string, embedding array<double>"
        )
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    incremental_ingest_stream(
        stream, corpus, store, embed_index=eidx, embed_threshold=0.8
    ).awaitTermination()

    got = sorted(r.doc_id for r in spark.read.parquet(corpus).collect())
    assert got == [1, 3], f"semantic admission produced {got}"
    idx_ids = sorted(
        r.vec_id
        for r in spark.read.parquet(f"{eidx}/vectors")
        .select("vec_id")
        .collect()
    )
    assert idx_ids == [1, 3]
    # the frozen banding config exists and is 1 row
    assert spark.read.parquet(f"{eidx}/meta").count() == 1


def test_ingest_partial_embed_index_fails_loudly(spark, tmp_path):
    """The semantic tier follows the same partial-index discipline as
    the lexical one: bands/ without vectors/ raises instead of
    silently admitting semantic duplicates."""
    import pytest as _pytest

    from engage_spark.streaming.jobs import incremental_ingest_stream

    src = str(tmp_path / "in")
    spark.createDataFrame(
        [(1, "text body", [0.1] * 8)],
        "doc_id long, text string, embedding array<double>",
    ).coalesce(1).write.parquet(f"{src}/a.parquet")
    corpus, store = str(tmp_path / "corpus"), str(tmp_path / "store")
    eidx = str(tmp_path / "emb_idx")
    spark.createDataFrame(
        [(99, 0, 123)], "vec_id long, band int, key long"
    ).write.parquet(f"{eidx}/bands")
    stream = (
        spark.readStream.schema(
            "doc_id long, text string, embedding array<double>"
        )
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    with _pytest.raises(Exception, match="partial"):
        incremental_ingest_stream(
            stream, corpus, store, embed_index=eidx
        ).awaitTermination()


def test_ingest_partial_near_dup_index_fails_loudly(spark, tmp_path):
    """r9 ADVICE medium: a PARTIAL index (bands/ without hashes/) must
    fail the ingest with a clear error, not silently disable near-dup
    admission and let duplicates through (the old bare-except did)."""
    import pytest as _pytest

    from engage_spark.streaming.jobs import incremental_ingest_stream

    src = str(tmp_path / "in")
    spark.createDataFrame(
        [(1, "some document text here")], "doc_id long, text string"
    ).coalesce(1).write.parquet(f"{src}/a.parquet")
    corpus, store = str(tmp_path / "corpus"), str(tmp_path / "store")
    idx = str(tmp_path / "nd_idx")
    # fabricate the partial state: bands/ exists, hashes/ doesn't
    spark.createDataFrame(
        [(99, 0, 123)], "doc_id long, band int, band_key long"
    ).write.parquet(f"{idx}/bands")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    with _pytest.raises(Exception, match="partial"):
        incremental_ingest_stream(
            stream, corpus, store, near_dup_index=idx
        ).awaitTermination()


def test_ingest_near_dup_replay_excludes_own_index_partition(spark, tmp_path):
    """Crash AFTER the near-dup index append but BEFORE the checkpoint
    commit: the replayed batch must not reject its own documents as
    near-dups of their half-committed index rows (same own-partition
    exclusion as the fingerprint store)."""
    import hashlib

    from engage_spark.queries.llm_dedup import (
        minhash_band_rows,
        minhash_shingle_hashes,
    )
    from engage_spark.streaming.jobs import incremental_ingest_stream

    text = (
        "one singular document about rivers and farmhouses and rain on "
        "old tin roofs in the quiet valley beyond the bend"
    )
    src = str(tmp_path / "in")
    spark.createDataFrame(
        [(7, text)], "doc_id long, text string"
    ).coalesce(1).write.parquet(f"{src}/a.parquet")
    corpus, store = str(tmp_path / "corpus"), str(tmp_path / "store")
    idx = str(tmp_path / "nd_idx")
    run_tag = hashlib.md5(f"{corpus}_ckpt".encode()).hexdigest()[:12]

    # simulate the half-committed state: batch 0's index partition
    # already holds the batch's band/hash rows; checkpoint is empty
    batch = spark.read.parquet(f"{src}/a.parquet")
    hashed = minhash_shingle_hashes(batch)
    part = f"run={run_tag}_batch=0"
    minhash_band_rows(hashed).write.parquet(f"{idx}/bands/{part}")
    hashed.write.parquet(f"{idx}/hashes/{part}")

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    incremental_ingest_stream(
        stream, corpus, store, near_dup_index=idx
    ).awaitTermination()
    got = spark.read.parquet(corpus).toPandas()
    assert sorted(got.doc_id) == [7], (
        "replay rejected the batch against its own half-committed index rows"
    )


def test_ingest_example_composes_end_to_end(spark, tmp_path):
    """The examples/ streaming ingest script runs over real testdata:
    every delivered doc is either admitted (and indexed) or rejected
    as an exact/near dup."""
    from examples.incremental_near_dup_ingest import run

    out = run(spark, "/root/testdata/sf0.001", str(tmp_path / "work"))
    assert 0 < out["admitted"] <= out["delivered"]
    assert out["indexed"] == out["admitted"]


def test_maintenance_loop_example_composes_end_to_end(spark, tmp_path):
    """The full operational cycle (ingest -> expectations gate ->
    compact -> optimize -> takedown) composes from registered ops only
    and each stage's outcome is observable (r9 VERDICT item 8)."""
    from examples.corpus_maintenance_loop import run

    out = run(spark, "/root/testdata/sf0.001", str(tmp_path / "work"))
    assert 0 < out["admitted"] <= out["delivered"]
    assert out["gate_passed"] is True
    assert out["compacted_files"] >= 1 and out["optimized_files"] >= 1
    # the takedown must flip retrievability and shrink the published set
    assert out["takedown_matches_before"] >= 1
    assert out["takedown_matches_after"] == 0
    assert out["published_rows"] == out["admitted"] - 1
    # r10 verdict item 7: the MEASURED reoptimize trigger — appended
    # micro-batches must push layout overlap past the threshold, the
    # loop must respond with optimize_dataset, and the rewritten layout
    # must recover (overlap back under the trigger, read amplification
    # down)
    assert out["drift_overlap"] > 0.10, "appends did not degrade layout"
    assert out["reoptimized"] is True
    assert out["rewritten_files"] >= 2, "incremental pass rewrote nothing"
    assert out["final_overlap"] <= 0.10
    assert out["final_avg_covering"] < out["drift_avg_covering"]
    # r12: the publish boundary starts version history — the cycle's
    # maintenance events are logged, the publish-time corpus is still
    # exactly readable, and the net diff is takedown + appends only
    assert out["history_ops"][0] == "init"
    assert out["history_ops"].count("logical_delete") == 1
    assert out["history_ops"].count("append") == 3
    assert out["history_ops"].count("optimize") == 1
    assert out["publish_version_rows"] == out["admitted"]
    assert out["cycle_diff"]["added"] == 600  # 3 appends x 200 docs
    assert out["cycle_diff"]["removed"] == 1  # the takedown victim
    assert out["vacuum"]["horizon"] == out["latest_version"] - 2
    # r12: the downstream replica drained the whole cycle (bootstrap
    # version -> latest) and converged to the live content
    assert out["mirror_synced"] == (1, out["latest_version"])
    assert out["mirror_converged"] is True


def test_compact_ingest_state_between_runs(spark, tmp_path):
    """Between-runs state compaction: finished runs' run=... partitions
    collapse into run=history (layout preserved), and a SECOND stream
    run against the compacted store still (a) rejects previously
    ingested docs and (b) appends its own run=... partitions without a
    partition-discovery conflict."""
    import glob

    from engage_spark.io import compact_ingest_state
    from engage_spark.streaming.jobs import incremental_ingest_stream

    src1 = str(tmp_path / "in1")
    spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")], "doc_id long, text string"
    ).coalesce(1).write.parquet(f"{src1}/a.parquet")
    corpus1, store = str(tmp_path / "c1"), str(tmp_path / "store")
    s1 = (
        spark.readStream.schema("doc_id long, text string")
        .option("recursiveFileLookup", "true").parquet(src1)
    )
    incremental_ingest_stream(s1, corpus1, store).awaitTermination()

    compacted = str(tmp_path / "store_compacted")
    compact_ingest_state(spark, store, compacted)
    parts = sorted(p.split("/")[-1] for p in glob.glob(f"{compacted}/run=*"))
    assert parts == ["run=history"], parts
    assert spark.read.parquet(compacted).count() == 2

    # second run, against the compacted store
    src2 = str(tmp_path / "in2")
    spark.createDataFrame(
        [(3, "Alpha  Beta"), (4, "epsilon zeta")], "doc_id long, text string"
    ).coalesce(1).write.parquet(f"{src2}/b.parquet")
    corpus2 = str(tmp_path / "c2")
    s2 = (
        spark.readStream.schema("doc_id long, text string")
        .option("recursiveFileLookup", "true").parquet(src2)
    )
    incremental_ingest_stream(s2, corpus2, compacted).awaitTermination()
    got = sorted(r.doc_id for r in spark.read.parquet(corpus2).collect())
    assert got == [4], f"history rejection failed: {got}"  # 3 dups doc 1
    # the new run's partition coexists with run=history
    parts2 = sorted(p.split("/")[-1] for p in glob.glob(f"{compacted}/run=*"))
    assert "run=history" in parts2 and len(parts2) == 2, parts2


def test_cdc_merge_stream_versioned_target(spark, sf_dir, tmp_path):
    """r14: the streaming CDC MERGE front end — micro-batches of
    change rows (multiple actions per key, netted latest-wins by
    `order_col`) apply through upsert_dataset onto a VERSION-LOGGED
    lang-partitioned corpus: every drain commits one exact `upsert`
    entry (time travel + row-level CDF through the stream), a restart
    with no new data is a no-op, and the corpus — not a state store —
    is the only carried state."""
    from engage_spark.io import write_parquet
    from engage_spark.streaming import cdc_merge_stream
    from engage_spark.versioning import (
        _vlog_entries,
        read_version,
        version_log_enable,
    )

    d = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "lang", "n_chars")
    )
    tgt = str(tmp_path / "cdc_target")
    write_parquet(d, tgt, partition_by=["lang"])
    version_log_enable(spark, tgt)                                 # v1
    n0 = d.count()

    src = str(tmp_path / "cdc_in")
    ckpt = str(tmp_path / "cdc_ckpt")
    schema = "doc_id long, lang string, n_chars long, is_delete boolean, seq long"
    # batch 1: two conflicting updates per %10 key (seq 2 must win)
    # plus deletes for the %17==3 keys
    upd1 = d.filter("doc_id % 10 = 0 and doc_id % 17 <> 3").selectExpr(
        "doc_id", "lang", "n_chars + 1 as n_chars",
        "false as is_delete", "1 as seq",
    )
    upd2 = d.filter("doc_id % 10 = 0 and doc_id % 17 <> 3").selectExpr(
        "doc_id", "lang", "n_chars + 2 as n_chars",
        "false as is_delete", "2 as seq",
    )
    dels = d.filter("doc_id % 17 = 3").selectExpr(
        "doc_id", "lang", "n_chars", "true as is_delete", "1 as seq"
    )
    upd1.unionByName(upd2).unionByName(dels).coalesce(1).write.parquet(
        f"{src}/b1.parquet"
    )

    def drain():
        stream = (
            spark.readStream.schema(schema)
            .option("recursiveFileLookup", "true")
            .parquet(src)
        )
        q = cdc_merge_stream(
            stream, tgt, ["doc_id"], ckpt,
            partition_by=["lang"], delete_col="is_delete",
            order_col="seq",
        )
        q.awaitTermination()

    drain()
    n_del = dels.count()
    live = spark.read.parquet(tgt)
    assert live.count() == n0 - n_del
    # seq=2 won the net
    assert (
        live.join(d.select("doc_id", F.col("n_chars").alias("v0")), "doc_id")
        .filter("doc_id % 10 = 0 and doc_id % 17 <> 3")
        .filter("n_chars <> v0 + 2").count() == 0
    )
    ops = [e["op"] for e in _vlog_entries(spark, tgt)]
    assert ops == ["init", "upsert"]
    assert read_version(spark, tgt, 1).count() == n0  # exact history

    # restart with NO new data: no batch fires, no new version
    drain()
    assert [e["op"] for e in _vlog_entries(spark, tgt)] == ops

    # batch 2: re-insert one deleted key into a NEW partition
    back_id = dels.select("doc_id").first()[0]
    spark.createDataFrame(
        [(back_id, "zz", 123, False, 1)], schema
    ).coalesce(1).write.parquet(f"{src}/b2.parquet")
    drain()
    ops2 = [e["op"] for e in _vlog_entries(spark, tgt)]
    assert ops2 == ["init", "upsert", "upsert"]
    live2 = spark.read.parquet(tgt)
    assert live2.count() == n0 - n_del + 1
    assert live2.filter(F.col("doc_id") == back_id).first()["lang"] == "zz"
    # time travel across both stream commits stays exact
    assert read_version(spark, tgt, 2).count() == n0 - n_del


def test_changes_stream_delivers_contiguous_windows(spark, tmp_path):
    """r15 generalized CDC consumer: each drain hands apply_fn exactly
    the (last, latest] feed; windows are contiguous; a failing apply
    does NOT advance the checkpoint (the same window redelivers); the
    union of delivered feeds replays init -> final."""
    from pyspark.sql import functions as F

    from engage_spark.io import append_dataset, delete_rows, write_parquet
    from engage_spark.versioning import changes_stream, version_log_enable

    out = str(tmp_path / "cdc_src")
    write_parquet(
        spark.range(100).select(F.col("id").alias("k"), F.col("id").alias("v")),
        out,
    )
    version_log_enable(spark, out)
    append_dataset(
        spark,
        spark.range(100, 150).select(F.col("id").alias("k"), F.col("id").alias("v")),
        out,
    )

    windows: list = []
    rows: list = []

    def apply_fn(feed, lo, hi):
        windows.append((lo, hi))
        rows.extend(feed.collect())

    ck = str(tmp_path / "consumer")
    q = changes_stream(spark, out, ck, apply_fn)
    q.awaitTermination()
    assert windows == [(1, 2)]

    # more commits; a second availableNow run drains ONLY the delta
    delete_rows(
        spark, out, spark.createDataFrame([(5,), (7,)], "k long"), "k"
    )
    append_dataset(
        spark,
        spark.range(150, 160).select(F.col("id").alias("k"), F.col("id").alias("v")),
        out,
    )
    q = changes_stream(spark, out, ck, apply_fn)
    q.awaitTermination()
    assert windows == [(1, 2), (2, 4)]  # contiguous, no gap, no overlap

    # failure does not advance: the SAME window redelivers
    append_dataset(
        spark,
        spark.range(160, 165).select(F.col("id").alias("k"), F.col("id").alias("v")),
        out,
    )
    calls = {"n": 0}

    def flaky(feed, lo, hi):
        calls["n"] += 1
        raise RuntimeError("injected apply crash")

    import pytest as _pytest

    q = changes_stream(spark, out, ck, flaky)
    with _pytest.raises(Exception, match="injected apply crash"):
        q.awaitTermination()
    q = changes_stream(spark, out, ck, apply_fn)
    q.awaitTermination()
    assert windows[-1] == (4, 5)  # redelivered after the crash

    # the union of delivered feeds replays v1 -> final
    state = {k: k for k in range(100)}
    for r in sorted(rows, key=lambda r: r["commit_version"]):
        if r["change_type"] == "insert":
            state[r["k"]] = r["v"]
        elif state.get(r["k"]) == r["v"]:
            state.pop(r["k"])
    from engage_spark.io import read_with_deletes

    final = {
        r["k"]: r["v"]
        for r in read_with_deletes(spark, out).select("k", "v").collect()
    }
    assert state == final


def test_changes_stream_start_version_and_torn_checkpoint(spark, tmp_path):
    """Review-found (r15): a fresh consumer can seed past vacuumed
    history via start_version, and a TORN consumer checkpoint raises
    loudly instead of silently replaying from init."""
    from pyspark.sql import functions as F

    from engage_spark.io import append_dataset, write_parquet
    from engage_spark.versioning import changes_stream, version_log_enable

    out = str(tmp_path / "cdc_sv")
    write_parquet(
        spark.range(50).select(F.col("id").alias("k"), F.col("id").alias("v")),
        out,
    )
    version_log_enable(spark, out)                     # v1
    append_dataset(
        spark,
        spark.range(50, 60).select(F.col("id").alias("k"), F.col("id").alias("v")),
        out,
    )                                                  # v2
    append_dataset(
        spark,
        spark.range(60, 70).select(F.col("id").alias("k"), F.col("id").alias("v")),
        out,
    )                                                  # v3

    windows: list = []
    ck = str(tmp_path / "seeded")
    q = changes_stream(
        spark, out, ck, lambda feed, lo, hi: windows.append((lo, hi)),
        start_version=2,
    )
    q.awaitTermination()
    assert windows == [(2, 3)]  # history before the seed never drained

    # torn checkpoint: loud, names the file
    import os

    with open(f"{ck}/consumer_v.json", "w") as f:
        f.write('{"v": tor')
    append_dataset(
        spark,
        spark.range(70, 75).select(F.col("id").alias("k"), F.col("id").alias("v")),
        out,
    )
    import pytest as _pytest

    q = changes_stream(
        spark, out, ck, lambda feed, lo, hi: windows.append((lo, hi))
    )
    with _pytest.raises(Exception, match="consumer checkpoint"):
        q.awaitTermination()
