"""File-level min/max statistics + data-skipping reads (round 14) —
the Delta/Iceberg "stats in metadata" pattern on the plain-parquet
version log.

Z-order gives each file a narrow value range; parquet footers already
record per-row-group min/max, and Spark prunes ROW GROUPS at scan time
— but only after the scheduler has listed, opened and footer-read
every file. At 100 TB / ~10^5 files, a driver-side stats table turns a
narrow range query's planning into "read 4 files" instead of "open
10^5 footers": commit-time footer HARVEST (no data scan — the parquet
just written is re-read at metadata level only), stored in a
``_versions/stats`` sidecar keyed by the same dataset-relative names
the log uses, consumed by :func:`read_where`.

Stats are an OPTIMIZATION, never a correctness gate: files without a
stats row are always kept, the exact predicate is re-applied after the
pruned scan, and pending deletion vectors anti-join exactly like
``read_version`` — so ``read_where(path, col, lo, hi)`` is
byte-identical to ``read_version(...).filter(lo <= col <= hi)``.

Reference parity note: covers no reference file — engine extension
(the 100 TB scan-planning path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engage_spark.versioning import (
    _VDIR,
    _apply_pending_dvs,
    _fs,
    _heal_staged_sidecar,
    _heal_staged_sidecar_if_idle,
    _live_names,
    _pa_fs_for,
    _pa_read_small,
    _read_names,
    _replay_files,
    _schema_at,
    _staged_sidecar_swap,
    _vlog_entries,
    version_log_enabled,
)

_VSTATS = f"{_VDIR}/stats"
_VSTATS_SPEC = f"{_VDIR}/stats_spec"
_STATS_SCHEMA = (
    "name string, col string, is_num boolean, "
    "mn_num double, mx_num double, mn_str string, mx_str string"
)
# ops whose `added` lists are not fresh data files: snapshots re-list
# files already harvested, vacuum/logical_delete add no data
_STATS_SKIP_OPS = ("snapshot", "vacuum_log", "logical_delete")


def _hive_unescape(val: str):
    """Inverse of io._hive_part_dir's value escaping; None for the
    __HIVE_DEFAULT_PARTITION__ null sentinel."""
    if val == "__HIVE_DEFAULT_PARTITION__":
        return None
    out, i = [], 0
    while i < len(val):
        ch = val[i]
        if ch == "%" and i + 3 <= len(val):
            try:
                out.append(chr(int(val[i + 1:i + 3], 16)))
                i += 3
                continue
            except ValueError:
                pass
        out.append(ch)
        i += 1
    return "".join(out)


def _footer_stats_one(uri: str, rel: str, cols: list) -> list:
    """(rel, col, is_num, mn_num, mx_num, mn_str, mx_str) rows for one
    parquet file, harvested from its FOOTER row-group statistics (no
    data pages read). Partition columns come from the relative path's
    `col=val/` dirs (they have no physical column). A column present
    in the schema whose row groups lack min/max yields a KEEP sentinel
    (is_num NULL — kept by the prune, never re-probed); a column
    ABSENT from the file's schema (pre-evolution file) reads as NULL
    everywhere, so it gets the prunable all-NULL row. Pure function of
    (uri, rel, cols), so
    it runs driver-side for small increments and inside executor tasks
    for large ones."""
    import datetime

    import pyarrow.parquet as pq

    rows = []
    part_vals = {}
    for seg in rel.split("/")[:-1]:
        if "=" in seg:
            c, _, v = seg.partition("=")
            part_vals[c] = _hive_unescape(v)
    want_phys = [c for c in cols if c not in part_vals]
    for c in cols:
        if c not in part_vals:
            continue
        v = part_vals[c]
        if v is None:
            rows.append((rel, c, False, None, None, None, None))
            continue
        try:
            fv = float(v)
            rows.append((rel, c, True, fv, fv, str(v), str(v)))
        except ValueError:
            rows.append((rel, c, False, None, None, str(v), str(v)))
    if not want_phys:
        return rows
    fs, p = _pa_fs_for(uri)
    with fs.open_input_file(p) as f:
        md = pq.ParquetFile(f).metadata
    acc: dict = {}
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for i in range(g.num_columns):
            cmeta = g.column(i)
            nm = cmeta.path_in_schema
            if nm not in want_phys or acc.get(nm) == "absent":
                continue
            st = cmeta.statistics
            if st is None or not st.has_min_max:
                # an all-NULL row group legitimately has no min/max;
                # anything else missing means the writer didn't record
                # stats -> no row for this (file, col)
                if st is not None and st.null_count == cmeta.num_values:
                    acc.setdefault(nm, None)
                    continue
                acc[nm] = "absent"
                continue
            mn, mx = st.min, st.max
            prev = acc.get(nm)
            if not isinstance(prev, list):
                acc[nm] = [mn, mx]
            else:
                acc[nm] = [min(prev[0], mn), max(prev[1], mx)]
    leaf_names = set(md.schema.to_arrow_schema().names)
    for nm in want_phys:
        got = acc.get(nm, "absent")
        if got == "absent":
            if nm not in leaf_names:
                # column physically absent (pre-schema-evolution file):
                # it reads as NULL everywhere — same prunable semantics
                # as an all-NULL column
                rows.append((rel, nm, False, None, None, None, None))
            else:
                # present but the writer recorded no min/max: emit a
                # KEEP sentinel (is_num NULL) so later harvests don't
                # re-probe this footer on every commit
                rows.append((rel, nm, None, None, None, None, None))
            continue
        if got is None:  # every value in the file is NULL
            rows.append((rel, nm, False, None, None, None, None))
            continue
        mn, mx = got
        if isinstance(mn, bytes):
            mn = mn.decode("utf-8", "replace")
            mx = mx.decode("utf-8", "replace")
        if isinstance(mn, (bool, int, float)):
            rows.append((rel, nm, True, float(mn), float(mx), None, None))
        elif isinstance(mn, (datetime.date, datetime.datetime)):
            rows.append(
                (rel, nm, False, None, None, mn.isoformat(), mx.isoformat())
            )
        else:
            rows.append((rel, nm, False, None, None, str(mn), str(mx)))
    return rows


def _stats_spec(spark: SparkSession, path: str) -> list:
    """Declared stat columns, or [] when never enabled. A TORN spec
    dir (a crashed stats_enable's half-written overwrite) degrades to
    'not enabled' instead of raising — the spec is probed on every
    versioned commit's tail and every vacuum, and stats must never
    become a correctness gate (same review-found class as the bloom
    spec)."""
    sfs, sp = _fs(spark, f"{path}/{_VSTATS_SPEC}")
    if not sfs.exists(sp):
        return []
    # driver-side pyarrow read (r15 optimization round): probed on
    # every versioned commit tail; a one-row Spark read job cost
    # ~150 ms each; torn/unreadable still degrades to 'not enabled'
    row = _pa_read_small(spark, f"{path}/{_VSTATS_SPEC}")
    if row is None:
        try:
            row = [
                r.asDict()
                for r in spark.read.parquet(
                    f"{path}/{_VSTATS_SPEC}"
                ).collect()
            ]
        except Exception:
            return []
    return list(row[0]["cols"]) if row else []


def _stats_harvest(spark: SparkSession, path: str, names: list) -> int:
    """Append footer-harvested stats rows for `names` — the shared
    sidecar harvest (versioning._sidecar_harvest: (file, column) pair
    dedup, driver loop for small increments / Spark job past 256
    files, increment-bounded driver transfer) with _footer_stats_one
    as the per-file builder. Caller holds the maintenance lease (this
    rides the commit that added the files). Returns the number of
    files harvested."""
    from engage_spark.versioning import _sidecar_harvest

    cols = _stats_spec(spark, path)
    if not cols or not names:
        return 0
    _heal_staged_sidecar(
        spark, f"{path}/{_VSTATS}", f"{path}/{_VDIR}/stats_new"
    )
    return _sidecar_harvest(
        spark, path, list(names), cols, _VSTATS, _STATS_SCHEMA,
        _footer_stats_one,
    )


def stats_enable(spark: SparkSession, path: str, cols) -> int:
    """Declare file-level min/max stats for `cols` on a version-logged
    dataset and backfill the CURRENT live file set from parquet
    footers (no data scan). Every subsequent versioned commit harvests
    its added files' footers into the sidecar automatically
    (versioning._vlog_append_entry hook); reads go through
    :func:`read_where` to prune files by range predicate before the
    scan is even planned. Returns the number of files backfilled."""
    from engage_spark.io import maintenance_lease
    from engage_spark.session import local_frame

    if not version_log_enabled(spark, path):
        raise ValueError(f"{path} has no version log (version_log_enable)")
    cols = list(cols)
    # validate against the MERGED schema (same review-found class as
    # bloom_enable: a misspelled column would silently harvest
    # prunable all-NULL rows everywhere and turn every read_where on
    # it into an empty frame instead of the AnalysisException the
    # unpruned read raises)
    known = set(
        spark.read.option("mergeSchema", "true").parquet(path).columns
    )
    unknown = [c for c in cols if c not in known]
    if unknown:
        raise ValueError(
            f"column(s) {unknown} not in the dataset schema {sorted(known)}"
        )
    with maintenance_lease(spark, path):
        local_frame(spark, [(cols,)], "cols array<string>").coalesce(
            1
        ).write.mode("overwrite").parquet(f"{path}/{_VSTATS_SPEC}")
        return _stats_harvest(spark, path, _live_names(spark, path))


def file_stats(spark: SparkSession, path: str) -> DataFrame:
    """The harvested stats sidecar as a DataFrame (name, col, is_num,
    mn_num, mx_num, mn_str, mx_str) — one row per (file, column),
    deduped. Empty frame if stats were never enabled."""
    from engage_spark.session import local_frame

    sfs, sp = _fs(spark, f"{path}/{_VSTATS}")
    if not sfs.exists(sp):
        return local_frame(spark, [], _STATS_SCHEMA)
    return spark.read.parquet(f"{path}/{_VSTATS}").dropDuplicates(
        ["name", "col"]
    )


def _stats_prune(
    spark: SparkSession, path: str, names: list, col: str, lo, hi
) -> tuple:
    """(kept_names, n_pruned): drop files whose harvested [min, max]
    for `col` cannot overlap [lo, hi]. Files without a stats row are
    kept (absence is never a prune); files whose column is entirely
    NULL are dropped (no NULL satisfies a range predicate). With BOTH
    bounds None there is no predicate to prune against — even all-NULL
    files' rows belong in an unbounded read — so nothing is pruned."""
    if lo is None and hi is None:
        return list(names), 0
    _heal_staged_sidecar_if_idle(
        spark, path, f"{path}/{_VSTATS}", f"{path}/{_VDIR}/stats_new"
    )
    sfs, sp = _fs(spark, f"{path}/{_VSTATS}")
    if not sfs.exists(sp):
        return list(names), 0
    try:
        # driver-side pyarrow sidecar read (r15 optimization round):
        # the min/max rows come to the driver either way, so the read
        # belongs there too — replaces a ~200 ms Spark filter+collect
        # job per pruned read; Spark read stays the fallback
        pa_rows = _pa_read_small(spark, f"{path}/{_VSTATS}")
        if pa_rows is not None:
            by_name = {r["name"]: r for r in pa_rows if r["col"] == col}
        else:
            by_name = {
                r["name"]: r
                for r in spark.read.parquet(f"{path}/{_VSTATS}")
                .filter(F.col("col") == col)
                .collect()
            }
    except Exception:
        # unreadable sidecar (e.g. the brief _stats_vacuum rewrite
        # window): stats are an optimization — degrade to no pruning
        return list(names), 0
    num_pred = all(
        isinstance(b, (int, float)) and not isinstance(b, bool)
        for b in (lo, hi)
        if b is not None
    )
    kept = []
    for n in names:
        r = by_name.get(n)
        if r is None or r["is_num"] is None:
            # no stats row, or the KEEP sentinel (stats present in the
            # sidecar but the footer recorded no min/max): never prune
            kept.append(n)
            continue
        if (
            r["mn_num"] is None and r["mx_num"] is None
            and r["mn_str"] is None and r["mx_str"] is None
        ):
            continue  # all-NULL column: no row can match a range
        if r["is_num"] and num_pred:
            mn, mx = r["mn_num"], r["mx_num"]
            if lo is not None and mx is not None and mx < float(lo):
                continue
            if hi is not None and mn is not None and mn > float(hi):
                continue
        elif not r["is_num"] and isinstance(lo if lo is not None else hi, str):
            mn, mx = r["mn_str"], r["mx_str"]
            if lo is not None and mx is not None and mx < str(lo):
                continue
            if hi is not None and mn is not None and mn > str(hi):
                continue
        kept.append(n)
    return kept, len(names) - len(kept)


def read_where(
    spark: SparkSession,
    path: str,
    col: str,
    lo=None,
    hi=None,
    version: int | None = None,
    and_where: dict | None = None,
    and_keys: dict | None = None,
) -> DataFrame:
    """Stats-pruned range read: the dataset at `version` (default
    latest) filtered to lo <= col <= hi (either bound optional), with
    the FILE LIST pruned by the harvested min/max sidecar before the
    scan is planned — at 10^5 files, a narrow range on the Z-order /
    cluster column schedules a handful of files instead of footer-
    probing everything. `and_where={"col2": (lo2, hi2), ...}` ANDs
    further range predicates, each pruning the file list again — on a
    Z-ordered layout the curve interleaves BOTH cluster columns, so a
    compound predicate prunes multiplicatively (a file survives only
    if EVERY column's [min, max] overlaps its range).
    `and_keys={"col3": [v1, v2], ...}` ANDs point predicates (col3 IN
    values), pruning through the per-file BLOOM index when one covers
    that column (indexes.bloom_enable) — the two sidecars COMPOSE:
    "rows for these doc_ids inside this date range" prunes by range
    and by key before any scan is planned. Every predicate is
    re-applied exactly after the pruned scan and pending deletion
    vectors are anti-joined exactly like read_version, so the result
    is byte-identical to filtering the unpruned read — stats and
    blooms only ever REMOVE provably-disjoint files. Works at any
    retained version (file stats are immutable)."""
    if not version_log_enabled(spark, path):
        raise ValueError(f"{path} has no version log (version_log_enable)")
    entries = _vlog_entries(spark, path)
    if not entries:
        raise ValueError(f"version log of {path} has no entries")
    live_now = set(_replay_files(entries, entries[-1]["version"]))
    v = version if version is not None else entries[-1]["version"]
    if v < 1 or v > entries[-1]["version"]:
        raise ValueError(
            f"version {v} out of range 1..{entries[-1]['version']} for {path}"
        )
    names = _replay_files(entries, v)
    if not names:
        raise ValueError(f"version {v} of {path} has no data files")
    bounds = {col: (lo, hi)}
    for c, (c_lo, c_hi) in (and_where or {}).items():
        bounds[c] = (c_lo, c_hi)
    keysets = {
        c: [x for x in vals if x is not None]
        for c, vals in (and_keys or {}).items()
    }
    if any(not vs for vs in keysets.values()):
        # an and_keys leg empty after NULL-filtering: the result is
        # provably empty BEFORE any sidecar probe runs (empty frame
        # with the union schema, planning-level read only)
        return _read_names(
            spark, path, names, live=live_now,
            schema=_schema_at(entries, v),
        ).filter(F.lit(False))
    kept = list(names)
    for c, (c_lo, c_hi) in bounds.items():
        kept, _ = _stats_prune(spark, path, kept, c, c_lo, c_hi)
    if keysets:
        from engage_spark.indexes import _bloom_prune

        for c, vals in keysets.items():
            kept, _ = _bloom_prune(spark, path, kept, c, vals)
    if not kept:
        # every file provably disjoint: an empty frame with the UNION
        # schema — read ALL the version's files at planning level only
        # (footer merge, no data pages; names[:1] could be a
        # pre-evolution file missing a queried column, breaking the
        # byte-identical schema contract — same review-found class as
        # read_keys)
        return _read_names(
            spark, path, names, live=live_now,
            schema=_schema_at(entries, v),
        ).filter(F.lit(False))
    df = _read_names(
        spark, path, kept, live=live_now, schema=_schema_at(entries, v)
    )
    df = _apply_pending_dvs(spark, path, entries, v, df)
    for c, (c_lo, c_hi) in bounds.items():
        if c_lo is not None:
            df = df.filter(F.col(c) >= F.lit(c_lo))
        if c_hi is not None:
            df = df.filter(F.col(c) <= F.lit(c_hi))
    for c, vals in keysets.items():
        # empty legs (only-NULL lookups) returned early above, so
        # every surviving keyset has values
        df = df.filter(F.col(c).isin(vals))
    return df


def _stats_vacuum(spark: SparkSession, path: str, needed: set) -> int:
    """Compact the stats sidecar during vacuum_versions (caller holds
    the lease): one part file, rows only for files some retained
    version still references. Without this the sidecar accumulates one
    tiny parquet part per commit and rows for long-vacuumed files.
    Crash-tolerant the cheap way — stats are an optimization, so the
    brief rewrite gap is covered by _stats_prune's conservative
    fallback (unreadable sidecar = no pruning), never a wrong result.
    Returns the number of rows kept."""
    from engage_spark.session import local_frame

    staged = f"{path}/{_VDIR}/stats_new"
    _heal_staged_sidecar(spark, f"{path}/{_VSTATS}", staged)
    sfs, sp = _fs(spark, f"{path}/{_VSTATS}")
    if not sfs.exists(sp):
        return 0
    rows = [
        tuple(r)
        for r in spark.read.parquet(f"{path}/{_VSTATS}")
        .dropDuplicates(["name", "col"])
        .collect()
        if r["name"] in needed
    ]
    local_frame(spark, rows, _STATS_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(staged)
    # delete-live → rename-staged; a crash between the two is healed
    # by _heal_staged_sidecar at the next read/compaction (previously
    # the crashed swap silently lost the whole sidecar forever —
    # review-found on the bloom twin of this code)
    _staged_sidecar_swap(spark, f"{path}/{_VSTATS}", staged)
    return len(rows)
