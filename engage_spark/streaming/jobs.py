"""Streaming jobs over the events table.

Each job is a readStream→transform pair returning an unstarted
DataFrame; callers attach writeStream with their sink/trigger. Tests
run Trigger.AvailableNow against the driver parquet and compare to the
batch twins — same transformation code path, which is the point:
window(), watermark and session_window work identically in batch and
streaming, so one declaration serves both the live stream and the
backfill.

Scale notes: watermarks bound state (late rows beyond the horizon are
dropped instead of growing state forever); session windows merge in
the state store keyed by (user_id, session); shuffle partitioning is
the same exchange as the batch groupBy — nothing here is
driver-resident.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from engage_spark.io import table

WATERMARK = "1 hour"


def stream_events_from_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet (file source; schema pinned —
    streaming sources need explicit schemas).

    The file source wants a directory, so the scan targets sf_dir with
    a pathGlobFilter. The testdata writes TIMESTAMP(NANOS), which the
    reader surfaces as long under the legacy flag (same handling as
    io.table); microsecond timestamps are rebuilt in the stream.

    Event-time typing: parquet TIMESTAMP(isAdjustedToUTC=false) columns
    surface as TIMESTAMP_NTZ, which ``withWatermark`` rejects
    (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE). We cast NTZ event-time fields
    to TIMESTAMP here, and pin the session timezone to UTC first so the
    NTZ->LTZ cast maps wall-clock to the identical UTC instant — window
    boundaries and formatted output then agree exactly with the batch
    twins (which compute on NTZ) regardless of the host timezone."""
    path = f"{sf_dir}/events.parquet"
    batch_schema = table(spark, sf_dir, "events").schema
    return stream_parquet(
        spark, sf_dir, batch_schema, schema_src=path, glob="events.parquet"
    )


def stream_parquet(
    spark: SparkSession,
    directory: str,
    batch_schema: T.StructType,
    schema_src: str,
    glob: str | None = None,
    **options: str,
) -> DataFrame:
    """Parquet file-source readStream with the engine's event-time typing
    rules applied (shared by the sf_dir reader and tests feeding their
    own delivery directories).

    ``schema_src`` is one representative file used to detect
    TIMESTAMP(NANOS) columns (read as long + rebuilt, as in io.table).
    NTZ fields are cast to TIMESTAMP under a UTC-pinned session so the
    cast is an exact wall-clock == UTC-instant mapping (see module
    docstring / stream_events_from_parquet).

    Note the session-conf writes below are DELIBERATE engine-wide
    invariants, not a local hack: engage_spark pins session.timeZone to
    UTC everywhere (session.py does the same at build time), because
    every timestamp-formatting oracle and every NTZ<->LTZ boundary in
    the engine assumes it. Calling this from a foreign session adopts
    that invariant for the rest of the session — by design, so batch
    queries before and after a streaming reader agree."""
    from engage_spark.io import _nano_ts_fields

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    nano_fields = set(_nano_ts_fields(schema_src))
    raw_schema = T.StructType(
        [
            T.StructField(f.name, T.LongType() if f.name in nano_fields else f.dataType)
            for f in batch_schema.fields
        ]
    )
    reader = spark.readStream.schema(raw_schema).format("parquet")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    for k, v in options.items():
        reader = reader.option(k, v)
    df = reader.load(directory)
    for name in nano_fields:
        df = df.withColumn(name, F.expr(f"timestamp_micros({name} div 1000)"))
    for f in raw_schema.fields:
        if isinstance(f.dataType, T.TimestampNTZType):
            df = df.withColumn(f.name, F.col(f.name).cast("timestamp"))
    return df


def tumbling_counts_stream(events: DataFrame) -> DataFrame:
    """1-hour tumbling window counts/sums with watermark late-data
    handling — streaming twin of ev_tumbling_window_agg."""
    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("win_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts_stream(
    events: DataFrame, window: str = "1 hour", slide: str = "30 minutes"
) -> DataFrame:
    """Sliding-window counts — streaming twin of ev_sliding_window_agg
    (defaults match its 1-hour window / 30-minute slide, so the two
    share one oracle). Each event lands in window/slide state rows; the
    watermark evicts windows as they close."""
    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy(F.window("ts", window, slide))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("window.start").alias("win_start"), "n_events")
    )


def click_purchase_join_stream(events: DataFrame, horizon: str = "1 hour") -> DataFrame:
    """Stream-stream interval self-join: every purchase matched to the
    same user's clicks in the preceding `horizon` (the attribution-join
    shape). Both sides carry a watermark and the join condition bounds
    purchase_ts to [click_ts, click_ts + horizon], so each side's buffer
    state evicts once the other side's watermark passes the interval —
    bounded state on an unbounded stream, which is what makes this join
    runnable on the live feed and as an AvailableNow backfill alike.
    Inner join: matches emit as soon as both rows have arrived."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            "user_id",
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", WATERMARK)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", WATERMARK)
    )
    return clicks.join(
        purchases,
        F.expr(
            f"""user_id = p_user_id
            AND purchase_ts >= click_ts
            AND purchase_ts <= click_ts + INTERVAL {horizon}"""
        ),
        "inner",
    ).select("user_id", "click_id", "purchase_id", "click_ts", "purchase_ts")


def sessionize_stream(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session windows (gap-based) per user — the streaming-native form
    of the batch gap-sessionization (ev_sessionize_gap). State-store
    sessions merge as events arrive; the watermark closes them."""
    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def dedup_events_stream(events: DataFrame) -> DataFrame:
    """Streaming exact dedup — the exactly-once guard an at-least-once
    event log needs (re-delivered rows collapse to one). The streaming
    twin of x1_exact_dedup's hash-groupBy shape, keyed on event_id.

    ``dropDuplicatesWithinWatermark`` is the scale-correct form: plain
    streaming dropDuplicates keeps EVERY seen key in the state store
    forever (unbounded at 100 TB/day); the watermark variant evicts keys
    once they age past the horizon, bounding state to one key per event
    inside the window while still catching any duplicate delivered
    within it."""
    return events.withWatermark("ts", WATERMARK).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def run_available_now(stream_df: DataFrame, out_dir: str, name: str) -> None:
    """Drain the stream with Trigger.AvailableNow into a parquet sink —
    the batch-of-a-stream execution mode (used by tests and backfills)."""
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", f"{out_dir}/{name}")
        .option("checkpointLocation", f"{out_dir}/{name}_ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def running_user_stats_stream(events: DataFrame, alpha: float = 0.2) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    running event count and EWMA of `value`, carried in the state store
    across micro-batches (the streaming form of a per-group recurrence —
    the same family as the reference's cumulative kernels W10/W11, but
    with state that outlives any single batch).

    State is O(1) per user (count, ewma); the state store shuffles on
    user_id exactly like a batch groupBy, so a 100 TB backfill and the
    live stream have the same partitioning story.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("ewma_value", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("ewma", T.DoubleType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        n, ewma = state.get if state.exists else (0, None)
        # one concat+sort per micro-batch (chunks of one group may arrive
        # split, so event-time order must be established across them),
        # then the recurrence in closed form: ewm(adjust=False) IS
        # y_i = a*x_i + (1-a)*y_{i-1}; seeding the series with the
        # carried state makes the batch update exact — no per-row loop.
        # timed-out keys (under a timeout conf) deliver an EMPTY chunk
        # iterator — guard it; pd.concat([]) raises
        chunks = [p for p in pdfs if len(p)]
        if not chunks:
            state.update((n, ewma))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "ewma_value": [ewma]}
            )
            return
        pdf = pd.concat(chunks, ignore_index=True).sort_values(["ts", "event_id"])
        vals = pdf["value"].astype(float)
        if len(vals):
            n += len(vals)
            seed = pd.Series([] if ewma is None else [ewma], dtype=float)
            series = pd.concat([seed, vals], ignore_index=True)
            ewma = float(series.ewm(alpha=alpha, adjust=False).mean().iloc[-1])
        state.update((n, ewma))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "ewma_value": [ewma]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_user_stats_tws(events: DataFrame, alpha: float = 0.2) -> DataFrame:
    """The running count/EWMA operator on Spark 4's StatefulProcessor
    API (``transformWithStateInPandas``) — the successor to
    applyInPandasWithState with typed state handles, timers and TTL.
    Semantics are identical to running_user_stats_stream (the pytest
    asserts both against the same batch recurrence); state is one
    ValueState row (n, ewma) per user, and the closed-form
    ``ewm(adjust=False)`` batch update is the same.

    Why both exist: applyInPandasWithState is the widely-deployed API;
    transformWithState is where Spark streaming state is headed
    (composable state variables, per-key timers, state TTL) — an engine
    claiming the streaming surface should speak both.

    Environment note: executing this operator needs (a) the RocksDB
    state store provider (`spark.sql.streaming.stateStore.providerClass`)
    and (b) the `protobuf` package for the TWS state-server protocol.
    This container ships neither protobuf nor pip access, so the parity
    test skips when `google.protobuf` is absent — the same guarded-
    capability policy as the TF/scipy kernels (SURVEY §7.3). The plan
    builds and analyzes without protobuf; only execution needs it."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("ewma_value", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("ewma", T.DoubleType()),
        ]
    )

    class RunningStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._stats = handle.getValueState("stats", state_schema)

        def handleInputRows(self, key, rows, timer_values):
            n, ewma = self._stats.get() if self._stats.exists() else (0, None)
            # empty chunk iterator (timed-out key) — pd.concat([]) raises
            chunks = [p for p in rows if len(p)]
            if not chunks:
                self._stats.update((n, ewma))
                yield pd.DataFrame(
                    {"user_id": [key[0]], "n_events": [n], "ewma_value": [ewma]}
                )
                return
            pdf = pd.concat(chunks, ignore_index=True).sort_values(
                ["ts", "event_id"]
            )
            vals = pdf["value"].astype(float)
            if len(vals):
                n += len(vals)
                seed = pd.Series([] if ewma is None else [ewma], dtype=float)
                series = pd.concat([seed, vals], ignore_index=True)
                ewma = float(series.ewm(alpha=alpha, adjust=False).mean().iloc[-1])
            self._stats.update((n, ewma))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "ewma_value": [ewma]}
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningStats(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )


# ---------------------------------------------------------------------------
# Streaming corpus ingest with incremental dedup (the streaming form of
# x_incremental_dedup: a document stream lands in a corpus only if its
# normalized fingerprint is new — both within the micro-batch and
# against everything ingested so far)


def incremental_ingest_stream(
    docs: DataFrame,
    corpus_dir: str,
    store_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    trigger: dict | None = None,
    near_dup_index: str | None = None,
    near_dup_threshold: float = 0.5,
    embed_index: str | None = None,
    emb_col: str = "embedding",
    embed_threshold: float = 0.85,
    expectations=None,
    on_violation: str = "drop",
    metrics_dir: str | None = None,
    quarantine_dir: str | None = None,
):
    """foreachBatch corpus ingest: per micro-batch, admit only documents
    whose normalized md5 fingerprint is (a) the first occurrence inside
    the batch (smallest id wins, the x_incremental_dedup rule) and (b)
    absent from the persisted fingerprint store, then append the
    accepted documents to `corpus_dir` and their fingerprints to
    `store_dir`. Returns the started StreamingQuery.

    Scale/exactly-once shape:
      - The store holds 16-byte fingerprints only — each batch reads it
        WITHOUT touching any corpus text, and the admission anti-join
        shuffles fingerprints, never documents.
      - Both sinks write into a run=<tag>_batch=<n> subdirectory with
        mode("overwrite"), where the tag derives from the checkpoint
        location: a replayed micro-batch (failure between sink writes
        and checkpoint commit) REWRITES its own partition with
        identical deterministic content instead of appending
        duplicates — idempotent without a transactional sink — while a
        DIFFERENT stream feeding the same store (batch ids restart at
        0 per checkpoint) gets its own partitions. (On a lakehouse,
        Delta/Iceberg MERGE replaces this dance.)
      - Replay reads EXCLUDE the batch's own store partition (and any
        later batch of this run): a crash AFTER the store write but
        BEFORE the checkpoint commit leaves the batch's fingerprints
        in the store; without the exclusion the replayed anti-join
        would see them, admit nothing, and overwrite the corpus
        partition with empty data — silently losing the batch forever
        (the fingerprints stay, so the documents could never re-enter).
        Filtering run >= this (run_tag, batch_id) makes the replay
        recompute the identical accepted set.
      - State never lives in the streaming state store; the
        fingerprint parquet IS the state, so the stream restarts from
        any checkpoint with no rehydration.

    Throughput lever (measured, scripts/measure_streaming_throughput.py
    + SCALE.md sweep table): per micro-batch cost is ~1.3 s FIXED
    trigger/planning overhead plus a small row-linear term, so
    sustained rows/s is nearly proportional to micro-batch size. Tune
    the SOURCE batch sizing, not this sink: file source —
    maxFilesPerTrigger / maxBytesPerTrigger on the readStream; Kafka —
    maxOffsetsPerTrigger (with minPartitions to fan wide topics across
    executors). `trigger` passes through to writeStream.trigger():
    default {"availableNow": True} (drain-and-stop); use
    {"processingTime": "30 seconds"} for a long-running ingest — longer
    intervals amortize the fixed overhead into bigger batches at the
    cost of latency.

    `near_dup_index` (round 9) upgrades admission from exact-only to
    NEAR-dup aware: after the fingerprint anti-join, the batch queries
    the persisted MinHash index (api.minhash_index_query semantics,
    >= `near_dup_threshold` Jaccard) and rejects documents that
    near-dup anything ingested by PRIOR batches; admitted documents'
    band rows + shingle hashes then append to the index under the same
    run=<tag>_batch=<id> idempotent-partition discipline as the
    fingerprint store, with the same own-batch replay exclusion.
    Within-batch near-dups (two new paraphrases arriving together) are
    both admitted — the index orders admission across batches, not
    inside one; run the batch clustering queries for intra-batch
    collapse. A missing index directory means "nothing indexed yet".

    `expectations` (r14) adds the QUALITY admission tier, FIRST in the
    gate order (before fingerprint/near-dup/semantic dedup — a
    malformed document must not consume a fingerprint slot that then
    blocks the valid re-delivery of the same text): rule dicts in the
    api.validate_expectations format, enforced per micro-batch. The
    default ``on_violation="drop"`` filters violating rows with ZERO
    extra jobs (the predicate fuses into the batch's existing plan);
    ``"fail"`` counts violations first (one agg job per batch) and
    raises ExpectationViolation — failing the streaming query — on the
    first dirty batch, the DLT expect_or_fail shape. ``metrics_dir``
    (optional, drop mode) writes per-batch per-rule violation counts
    under the same ``run=<tag>_batch=<id>`` idempotent-partition
    discipline as the fingerprint store (a replayed batch rewrites its
    own identical metrics row, never duplicates) — the quality
    dashboard's input. ``quarantine_dir`` (drop mode) lands each
    batch's violating rows, annotated with a ``__violated`` array of
    the rule ids each broke, under the SAME idempotent partitions —
    unlike the batch appends' at-least-once quarantine, a replayed
    micro-batch rewrites its own identical quarantine partition, so
    the streaming quarantine is exactly-once. `unique` rules raise up
    front in drop mode (aggregate property, no row-drop semantics;
    the fingerprint gate already dedups exact text).

    `embed_index` (round 10) adds the SEMANTIC admission tier: when the
    stream carries an `emb_col` embedding column, each batch also
    rejects documents whose embedding cosine-matches a prior batch's
    admitted document at >= `embed_threshold` — paraphrases and
    translations share no n-grams, so they pass the MinHash gate; this
    is the layer that catches them. The embed index persists under the
    same run=<tag>_batch=<id> partitions with the same own-batch replay
    exclusion; its banding config is frozen into `embed_index/meta` on
    first write (batches hashed under different configs would land in
    disjoint buckets and silently match nothing). Both index gates
    honor takedown tombstones and fail loudly on a partial index.

    Maintenance: every run=... partition is a separate small parquet
    write, so long-lived corpora accumulate small files in the corpus,
    store, and index directories. Compact BETWEEN runs with
    io.compact_ingest_state: it collapses finished runs' partitions
    into a single run=history partition (KEEPING the hive layout — a
    flat rewrite would make later run=... appends fail partition
    discovery), which the own-batch exclusion correctly treats as
    committed history.
    """
    import functools
    import hashlib
    import operator

    from engage_spark.api import normalized_fingerprint

    spark = docs.sparkSession
    exp_rules = None
    if expectations is not None:
        from engage_spark.io import _check_gate_args

        # vlog=True: the ingest corpus is run/batch-partitioned, not
        # version-logged — the version-log requirement is a batch-path
        # concept, the rest of the checks (mode, empty list, duplicate
        # ids, unique-in-drop, quarantine-with-fail) apply verbatim
        exp_rules = _check_gate_args(
            expectations, on_violation, True, corpus_dir,
            quarantine=quarantine_dir,
        )
        if metrics_dir is not None and on_violation == "fail":
            # metrics land only in the drop branch; silently accepting
            # the combination would leave an operator believing
            # violation counts are being recorded when nothing ever
            # lands (mirrors _check_gate_args' quarantine+fail check)
            raise ValueError(
                "metrics_dir is set with on_violation='fail' — fail "
                "mode stops the query on the first dirty batch and "
                "never writes metrics; use on_violation='drop' or "
                "remove metrics_dir"
            )
    elif quarantine_dir is not None or metrics_dir is not None:
        raise ValueError(
            "metrics_dir/quarantine_dir set but expectations is None — "
            "nothing would ever land there; configure the rules or "
            "drop them"
        )
    store_schema = "fingerprint string"
    bands_schema = "doc_id long, band int, band_key long"
    embed_bands_schema = "vec_id long, band int, key long"
    embed_vecs_schema = "vec_id long, embedding array<double>"
    hashes_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("__h", T.ArrayType(T.LongType())),
        ]
    )
    ckpt = f"{corpus_dir}_ckpt"
    run_tag = hashlib.md5(ckpt.encode()).hexdigest()[:12]
    # the embed index's banding config is FROZEN on first write (by
    # design — batches hashed under different configs would silently
    # match nothing), so one read serves every subsequent batch instead
    # of a per-batch collect job
    _meta_cache: dict = {}

    def _embed_meta():
        if "meta" not in _meta_cache:
            _meta_cache["meta"] = spark.read.parquet(
                f"{embed_index}/meta"
            ).collect()[0]
        return _meta_cache["meta"]

    def _replay_filtered(df: DataFrame, batch_id: int, cols: list[str]) -> DataFrame:
        """Drop this run's own (and later) batch partitions — the same
        half-committed-replay exclusion the fingerprint store uses."""
        if "run" not in df.columns:
            return df.select(*cols)
        own_batch = F.when(
            F.col("run").startswith(f"{run_tag}_batch="),
            F.split(F.col("run"), "_batch=").getItem(1).cast("long"),
        )
        return df.filter(own_batch.isNull() | (own_batch < batch_id)).select(*cols)

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        from engage_spark.io import _hadoop_fs

        if exp_rules is not None:
            # QUALITY gate, first: a malformed document must not burn
            # a fingerprint slot that would then block the valid
            # re-delivery of the same text. Shared compile + count
            # helpers with the batch gates (io._check_gate_args /
            # _gate_aggs / _gate_fail_check), so every gate counts
            # identically — including the NULL-expr-refuses rule.
            if on_violation == "fail":
                from engage_spark.io import _gate_fail_check

                _gate_fail_check(
                    batch_df, corpus_dir, expectations, exp_rules
                )
            else:
                any_viol = F.coalesce(
                    functools.reduce(
                        operator.or_, (v for _, v in exp_rules)
                    ),
                    F.lit(False),
                )
                if metrics_dir is not None or quarantine_dir is not None:
                    from engage_spark.io import _gate_aggs
                    from engage_spark.session import local_frame

                    row = batch_df.agg(
                        *_gate_aggs(expectations, exp_rules)
                    ).collect()[0]
                    counts = [
                        (rid, int(row[f"__v{i}"]))
                        for i, (rid, _) in enumerate(exp_rules)
                    ]
                    if metrics_dir is not None:
                        local_frame(
                            spark, counts,
                            "rule_id string, n_violations long",
                        ).coalesce(1).write.mode("overwrite").parquet(
                            f"{metrics_dir}/run={run_tag}_batch={batch_id}"
                        )
                    if quarantine_dir is not None and any(
                        n for _, n in counts
                    ):
                        from engage_spark.io import _quarantine_frame

                        _quarantine_frame(
                            batch_df, exp_rules, any_viol
                        ).write.mode("overwrite").parquet(
                            f"{quarantine_dir}/run={run_tag}"
                            f"_batch={batch_id}"
                        )
                batch_df = batch_df.filter(~any_viol)

        # probe existence EXPLICITLY instead of catching Exception
        # around the read: "no store yet" is the only condition that
        # may silently disable dedup — a real failure (schema drift,
        # transient FS error) must propagate, not admit duplicates
        sfs, sp = _hadoop_fs(spark, store_dir)
        if not sfs.exists(sp):
            store = spark.createDataFrame([], store_schema)
        else:
            # the user schema omits the `run` partition column, so the
            # reader appends it from the directory layout — needed to
            # exclude this batch's own partition on replay (see above)
            store = spark.read.schema(store_schema).parquet(store_dir)
            if "run" in store.columns:
                own_batch = F.when(
                    F.col("run").startswith(f"{run_tag}_batch="),
                    F.split(F.col("run"), "_batch=").getItem(1).cast("long"),
                )
                store = store.filter(
                    own_batch.isNull() | (own_batch < batch_id)
                ).select("fingerprint")
            else:
                # store exists but lacks the run=... hive layout (e.g.
                # bootstrapped by an external flat writer): the self-
                # exclusion above can't apply, so a crash-replay of a
                # half-committed batch would see its own fingerprints
                # and drop the batch. Degraded mode must be VISIBLE,
                # not silent.
                import logging

                logging.getLogger(__name__).warning(
                    "fingerprint store %s has no 'run' partition column; "
                    "replay protection is OFF for this ingest — a crash "
                    "between the store write and the checkpoint commit "
                    "can lose that batch. Rewrite the store with "
                    "run=<tag>_batch=<id> hive partitions to re-enable.",
                    store_dir,
                )
        f = batch_df.withColumn("fingerprint", normalized_fingerprint(text_col))
        w = Window.partitionBy("fingerprint").orderBy(id_col)
        accepted = (
            f.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
            .join(store.hint("broadcast"), "fingerprint", "left_anti")
        )
        if near_dup_index is not None:
            from engage_spark.api import _minhash_query_frames

            # same discipline as the fingerprint store: probe existence
            # explicitly. A bare except here would silently turn off
            # near-dup admission on ANY error (partial index, schema
            # drift, transient FS failure) and admit duplicates.
            bfs, bp = _hadoop_fs(spark, f"{near_dup_index}/bands")
            hfs, hp = _hadoop_fs(spark, f"{near_dup_index}/hashes")
            b_exists, h_exists = bfs.exists(bp), hfs.exists(hp)
            if b_exists != h_exists:
                raise RuntimeError(
                    f"near-dup index at {near_dup_index} is partial "
                    f"(bands={'present' if b_exists else 'missing'}, "
                    f"hashes={'present' if h_exists else 'missing'}); "
                    "repair or remove it before ingesting — proceeding "
                    "would admit near-duplicates"
                )
            if b_exists:
                sb = _replay_filtered(
                    spark.read.schema(bands_schema).parquet(
                        f"{near_dup_index}/bands"
                    ),
                    batch_id,
                    ["doc_id", "band", "band_key"],
                )
                sh = _replay_filtered(
                    spark.read.schema(hashes_schema).parquet(
                        f"{near_dup_index}/hashes"
                    ),
                    batch_id,
                    ["doc_id", "__h"],
                )
                # honor takedowns (api.minhash_index_delete): a
                # tombstoned document must not block re-admission
                from engage_spark.api import _without_tombstones

                sb = _without_tombstones(spark, near_dup_index, sb, "doc_id")
                sh = _without_tombstones(spark, near_dup_index, sh, "doc_id")
                dup_ids = (
                    _minhash_query_frames(
                        sb, sh, accepted, id_col=id_col, text_col=text_col,
                        jaccard_threshold=near_dup_threshold,
                    )
                    .select(F.col("new_id").alias(id_col))
                    .distinct()
                )
                accepted = accepted.join(dup_ids, on=id_col, how="left_anti")
        if embed_index is not None:
            # SEMANTIC admission: reject documents whose embedding
            # cosine-matches a PRIOR batch's admitted document at >=
            # embed_threshold — catches paraphrases/translations that
            # share no n-grams and so pass the MinHash gate. Same
            # existence-probe / partial-index / run-partition replay
            # discipline as the lexical index.
            if emb_col not in batch_df.columns:
                raise ValueError(
                    f"embed_index is set but the stream lacks the "
                    f"'{emb_col}' column"
                )
            from engage_spark.api import (
                _embed_query_frames,
                _without_tombstones,
            )

            ebfs, ebp = _hadoop_fs(spark, f"{embed_index}/bands")
            evfs, evp = _hadoop_fs(spark, f"{embed_index}/vectors")
            eb_exists, ev_exists = ebfs.exists(ebp), evfs.exists(evp)
            if eb_exists != ev_exists:
                raise RuntimeError(
                    f"embed index at {embed_index} is partial "
                    f"(bands={'present' if eb_exists else 'missing'}, "
                    f"vectors={'present' if ev_exists else 'missing'}); "
                    "repair or remove it before ingesting"
                )
            if eb_exists:
                meta = _embed_meta()
                esb = _replay_filtered(
                    spark.read.schema(embed_bands_schema).parquet(
                        f"{embed_index}/bands"
                    ),
                    batch_id,
                    ["vec_id", "band", "key"],
                )
                esv = _replay_filtered(
                    spark.read.schema(embed_vecs_schema).parquet(
                        f"{embed_index}/vectors"
                    ),
                    batch_id,
                    ["vec_id", "embedding"],
                )
                esb = _without_tombstones(spark, embed_index, esb, "vec_id")
                esv = _without_tombstones(spark, embed_index, esv, "vec_id")
                sem_dup = (
                    _embed_query_frames(
                        esb, esv, meta,
                        accepted.select(
                            F.col(id_col).alias("vec_id"),
                            F.col(emb_col).alias("embedding"),
                        ),
                        threshold=embed_threshold,
                    )
                    .select(F.col("new_id").alias(id_col))
                    .distinct()
                )
                accepted = accepted.join(sem_dup, on=id_col, how="left_anti")
        part = f"run={run_tag}_batch={batch_id}"
        accepted.write.mode("overwrite").parquet(f"{corpus_dir}/{part}")
        accepted.select("fingerprint").distinct().write.mode("overwrite").parquet(
            f"{store_dir}/{part}"
        )
        if near_dup_index is not None:
            from engage_spark.queries.llm_dedup import (
                minhash_band_rows,
                minhash_shingle_hashes,
            )

            hashed = minhash_shingle_hashes(
                accepted, id_col=id_col, text_col=text_col
            )
            minhash_band_rows(hashed).write.mode("overwrite").parquet(
                f"{near_dup_index}/bands/{part}"
            )
            hashed.write.mode("overwrite").parquet(
                f"{near_dup_index}/hashes/{part}"
            )
        if embed_index is not None:
            from engage_spark.queries.llm_similarity import (
                lsh_banding_params,
                nd_band_keys_column,
            )

            mfs, mp = _hadoop_fs(spark, f"{embed_index}/meta")
            if not mfs.exists(mp):
                # freeze the banding config on first write: batches
                # hashed under different (bands, rows, dim) would land
                # in disjoint buckets and match nothing. Deterministic
                # on replay (derived from this batch's own rows).
                probe = accepted.select(emb_col).limit(1).collect()
                dim = len(probe[0][0]) if probe else 64
                bands_n, rows_n = lsh_banding_params(
                    max(1024, accepted.count())
                )
                from engage_spark.session import local_frame

                local_frame(
                    spark,
                    [(int(bands_n), int(rows_n), int(dim))],
                    "bands int, rows int, dim int",
                ).coalesce(1).write.mode("overwrite").parquet(
                    f"{embed_index}/meta"
                )
            meta = _embed_meta()
            ev = accepted.select(
                F.col(id_col).alias("vec_id"),
                F.col(emb_col).alias("embedding"),
            )
            ev.select(
                "vec_id",
                F.posexplode(
                    nd_band_keys_column(
                        ev, "embedding",
                        int(meta.bands), int(meta.rows), int(meta.dim),
                    )
                ).alias("band", "key"),
            ).write.mode("overwrite").parquet(f"{embed_index}/bands/{part}")
            ev.write.mode("overwrite").parquet(f"{embed_index}/vectors/{part}")

    return (
        docs.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", ckpt)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )


def cdc_merge_stream(
    changes: DataFrame,
    target: str,
    key_cols,
    checkpoint_dir: str,
    partition_by=None,
    delete_col: str | None = None,
    order_col: str | None = None,
    trigger: dict | None = None,
    assume_partition_stable: bool = False,
    expectations=None,
    on_violation: str = "drop",
    metrics_dir: str | None = None,
    quarantine_dir: str | None = None,
    evolve_schema: bool = False,
):
    """CONTINUOUS CDC MERGE (r14): tail a change stream and apply each
    micro-batch to a parquet corpus through io.upsert_dataset — the
    streaming front end of the versioned partitioned MERGE. On a
    version-logged target every micro-batch commits as one exact
    `upsert` entry, so a CDC-ingested corpus gets time travel and a
    row-level change feed for free; on a plain target it is the
    dynamic-partition-overwrite merge.

    `order_col` nets the batch to the LAST action per key first (a CDC
    feed delivers multiple updates per key per batch; latest wins,
    delete rows included — the sync_mirror netting rule), so the
    upsert's one-row-per-key contract holds without the caller
    pre-deduping. Without it the batch must already be key-unique.

    Exactly-once-in-effect: upsert_dataset is key-idempotent, so a
    micro-batch REPLAYED after its merge committed but before the
    checkpoint advanced re-applies the same values — live state
    converges byte-equal; on a versioned target the replay records a
    second `upsert` entry whose row-level diff is ZERO rows (identical
    rows in swapped files cancel in version_diff), so CDF consumers
    drain nothing extra. No streaming state store is used: the corpus
    IS the state, and the stream restarts from any checkpoint with no
    rehydration. Scale: per batch cost is the upsert's — O(touched
    partitions) with `partition_by`, never corpus-sized.

    ``evolve_schema`` (r14): the underlying MERGE schema-gates every
    batch — NOTE the behavior change: a feed carrying an extra column
    (previously dropped silently) now FAILS each micro-batch with a
    ValueError unless ``evolve_schema=True``, which instead evolves
    the corpus on first sight of the new column (durable
    ``_schema_evolution`` marker; old rows surface NULL via the
    mergeSchema read convention). A batch MISSING a target column
    always fails — NULL-filling it would destroy matched rows'
    values; align the feed instead.

    ``expectations``/``on_violation`` (r14): each NETTED batch's
    upserted rows are gated before the merge (delete-marker rows
    bypass — a tombstone legitimately carries NULL payload). drop
    (the default) filters IN-STREAM: zero extra jobs unless
    ``metrics_dir``/``quarantine_dir`` is set, in which case per-rule
    counts and the annotated violating rows land under idempotent
    ``run=<tag>_batch=<id>`` partitions (exactly-once — a replayed
    batch rewrites its own identical partition), and the merge runs
    ungated on the already-clean batch. fail passes through to
    upsert_dataset's materializing gate and stops the query on the
    first dirty batch with per-rule counts.

    Returns the started StreamingQuery."""
    import hashlib

    from pyspark.sql.window import Window

    from engage_spark.io import upsert_dataset

    key_cols = list(key_cols)
    spark = changes.sparkSession
    exp_rules = None
    if expectations is not None:
        from engage_spark.io import _check_gate_args

        exp_rules = _check_gate_args(
            expectations, on_violation, True, target,
            quarantine=quarantine_dir,
        )
        if metrics_dir is not None and on_violation == "fail":
            # same contract as incremental_ingest_stream: fail mode
            # never reaches the metrics write, so accepting the
            # combination silently records nothing
            raise ValueError(
                "metrics_dir is set with on_violation='fail' — fail "
                "mode stops the query on the first dirty batch and "
                "never writes metrics; use on_violation='drop' or "
                "remove metrics_dir"
            )
    elif quarantine_dir is not None or metrics_dir is not None:
        raise ValueError(
            "metrics_dir/quarantine_dir set but expectations is None — "
            "nothing would ever land there"
        )
    run_tag = hashlib.md5(checkpoint_dir.encode()).hexdigest()[:12]

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        b = batch_df
        if order_col is not None:
            w = Window.partitionBy(*key_cols).orderBy(
                F.desc(order_col),
                # deterministic tie-break inside one (key, order) pair
                *[F.desc(c) for c in b.columns if c != order_col],
            )
            b = (
                b.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn", order_col)
            )
        if exp_rules is not None and on_violation == "drop":
            # IN-STREAM drop gate: a foreachBatch frame is pinned to
            # committed source offsets (deterministic), so filtering
            # here carries the staged-bytes guarantee without the
            # upsert gate's materialization write — and skips its
            # per-batch counting agg when nobody consumes the counts
            from engage_spark.io import (
                _gate_aggs,
                _gate_any_viol,
                _gate_counts,
                _quarantine_frame,
            )

            is_del = (
                F.coalesce(F.col(delete_col).cast("boolean"), F.lit(False))
                if delete_col is not None
                else F.lit(False)
            )
            rules_nd = [(rid, v & ~is_del) for rid, v in exp_rules]
            any_viol = _gate_any_viol(rules_nd)
            if metrics_dir is not None or quarantine_dir is not None:
                from engage_spark.session import local_frame

                row = b.agg(*_gate_aggs(expectations, rules_nd)).collect()[0]
                counts = _gate_counts(rules_nd, row)
                part = f"run={run_tag}_batch={batch_id}"
                if metrics_dir is not None:
                    local_frame(
                        spark, sorted(counts.items()),
                        "rule_id string, n_violations long",
                    ).coalesce(1).write.mode("overwrite").parquet(
                        f"{metrics_dir}/{part}"
                    )
                if quarantine_dir is not None and any(counts.values()):
                    _quarantine_frame(b, rules_nd, any_viol).write.mode(
                        "overwrite"
                    ).parquet(f"{quarantine_dir}/{part}")
            b = b.filter(~any_viol)
        if b.isEmpty():
            return
        upsert_dataset(
            spark, target, b, key_cols,
            partition_by=partition_by, delete_col=delete_col,
            assume_partition_stable=assume_partition_stable,
            check_unique_keys=order_col is None,
            # drop already gated in-stream; fail uses the upsert's
            # materializing gate so the query stops with exact counts
            expectations=expectations if on_violation == "fail" else None,
            on_violation="fail",
            # a CDC feed that grows a column mid-stream evolves the
            # corpus instead of erroring every later batch
            evolve_schema=evolve_schema,
        )

    return (
        changes.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )
