"""Multimodal (image/audio/video) column plumbing (SURVEY.md §2.12).

No reference counterpart. The pattern for opaque media at 100 TB:
media lives as a `binary` column + a typed metadata struct; decode /
feature-extract / frame-sample run as Arrow-batched pandas functions
over `mapInPandas`, so bytes move driver-free through columnar batches
and each task handles a bounded slice.

The container ships no image/audio codecs, so the *decode* step is a
deterministic stand-in (byte histograms / fixed-stride frame slicing)
behind the same schema a real codec UDF would return; `decode_image`
raises NotImplementedError unless PIL is importable. The Spark-side
plumbing — schema, batching, partitioning — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from engage_spark.io import table
from engage_spark.registry import query

_N_BINS = 16
_FRAME_BYTES = 64
_FRAME_STRIDE = 4


def with_media_columns(docs: DataFrame) -> DataFrame:
    """Attach a synthetic media payload: the utf-8 bytes of `text` as an
    opaque `binary` column plus a typed metadata struct — the storage
    shape a real multimodal table would have (media inlined or as
    object-store references)."""
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("media"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.length(F.encode("text", "utf-8")).alias("n_bytes"),
            F.lit("synthetic").alias("codec"),
        ).alias("media_meta"),
    )


_HIST_SCHEMA = T.StructType(
    [T.StructField("doc_id", T.LongType())]
    + [T.StructField(f"bin_{i}", T.LongType()) for i in range(_N_BINS)]
)


def byte_histogram_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched 'feature extraction': a 16-bin byte histogram per
    media blob — the deterministic stand-in for an image-embedding or
    mel-spectrogram kernel. numpy over whole batches, not per row."""
    import numpy as np

    for pdf in batches:
        out = {"doc_id": pdf["doc_id"].to_numpy()}
        hists = np.zeros((len(pdf), _N_BINS), dtype="int64")
        for i, blob in enumerate(pdf["media"]):
            arr = np.frombuffer(blob, dtype=np.uint8)
            hists[i] = np.bincount(arr >> 4, minlength=_N_BINS)[:_N_BINS]
        for b in range(_N_BINS):
            out[f"bin_{b}"] = hists[:, b]
        yield pd.DataFrame(out)


# DuckDB CAN oracle the byte kernels after all (upgraded round 6 from
# rows-only): hex(encode(text)) exposes the media blob as a hex string
# whose ODD positions are each byte's high nibble — exactly the
# `byte >> 4` bin of the histogram kernel — and fixed-stride frame
# slices are substrings of that hex string. Both kernels' outputs are
# therefore fully hash-checkable without any byte iteration in SQL.
_HIST_BINS_DUCK = ", ".join(
    f"len(list_filter(hi, c -> c = '{b:X}'))::BIGINT AS bin_{b}"
    for b in range(_N_BINS)
)


@query(
    "mm_byte_histogram",
    oracle=f"""
    WITH t AS (SELECT doc_id, hex(encode(text)) AS h FROM documents),
    n AS (
      SELECT doc_id,
             list_transform(range(1, length(h)+1, 2), i -> h[i]) AS hi
      FROM t
    )
    SELECT doc_id, {_HIST_BINS_DUCK} FROM n
    """,
    covers=["X4"],
)
def mm_byte_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media feature extraction through mapInPandas: binary column in,
    fixed-width feature row out. One map stage, no shuffle; batch size
    bounded by spark.sql.execution.arrow.maxRecordsPerBatch. FULL
    oracle (upgraded r6): the 16 bins are high-nibble counts, which the
    DuckDB twin reads off the odd positions of the blob's hex dump."""
    media = with_media_columns(table(spark, sf_dir, "documents"))
    return media.select("doc_id", "media").mapInPandas(
        byte_histogram_batches, schema=_HIST_SCHEMA
    )


_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_bytes", T.BinaryType()),
    ]
)


def frame_sample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Fixed-stride 'video frame' sampling: slice each blob into
    _FRAME_BYTES-sized frames and keep every _FRAME_STRIDE-th — the
    plumbing shape of ffmpeg-style keyframe extraction (1 input row →
    N output rows through Arrow)."""
    for pdf in batches:
        ids, idxs, frames = [], [], []
        for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
            n = len(blob) // _FRAME_BYTES
            for k in range(0, n, _FRAME_STRIDE):
                ids.append(doc_id)
                idxs.append(k)
                frames.append(bytes(blob[k * _FRAME_BYTES:(k + 1) * _FRAME_BYTES]))
        yield pd.DataFrame(
            {"doc_id": ids, "frame_idx": idxs, "frame_bytes": frames}
        )


@query("mm_frame_sample", oracle=None, covers=["X4"])
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over binary media via mapInPandas (row-expanding).
    Rows-only because the output column is raw BINARY (engines disagree
    on binary rendering in the hash compare); the hex-projected twin
    mm_frame_digest carries the full content oracle."""
    media = with_media_columns(table(spark, sf_dir, "documents"))
    return media.select("doc_id", "media").mapInPandas(
        frame_sample_batches, schema=_FRAME_SCHEMA
    )


@query(
    "mm_frame_digest",
    # the frame kernel's output, content-checked byte for byte: each
    # sampled frame is a 64-byte slice = a 128-char substring of the
    # blob's hex dump (both engines emit uppercase hex)
    oracle=f"""
    WITH t AS (SELECT doc_id, hex(encode(text)) AS h FROM documents),
    f AS (
      SELECT doc_id,
             unnest(range(0, (length(h)//2) // {_FRAME_BYTES},
                          {_FRAME_STRIDE})) AS frame_idx,
             h
      FROM t WHERE (length(h)//2) // {_FRAME_BYTES} > 0
    )
    SELECT doc_id, frame_idx::BIGINT AS frame_idx,
           substring(h, frame_idx*{_FRAME_BYTES * 2}+1,
                     {_FRAME_BYTES * 2}) AS frame_hex
    FROM f
    """,
    covers=["X4"],
)
def mm_frame_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-oracled projection of the SAME frame-sampling kernel
    (mm_frame_sample's mapInPandas path, unchanged): every sampled
    frame's bytes rendered as hex so the driver can value-compare the
    full frame CONTENT against the DuckDB hex-dump twin — the
    byte-slicing plumbing a real keyframe extractor sits on, now under
    a hard signal (upgraded r6)."""
    media = with_media_columns(table(spark, sf_dir, "documents"))
    frames = media.select("doc_id", "media").mapInPandas(
        frame_sample_batches, schema=_FRAME_SCHEMA
    )
    return frames.select(
        "doc_id", "frame_idx", F.hex("frame_bytes").alias("frame_hex")
    )


@query(
    "mm_media_metadata",
    oracle="""
    SELECT doc_id,
           'application/octet-stream' AS mime,
           octet_length(encode(text))::BIGINT AS n_bytes,
           'synthetic' AS codec
    FROM documents
    """,
    covers=["X4"],
)
def mm_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata projection off the media struct — the query shape
    for 'select all videos longer than N' style pruning; the struct
    field access pushes down to a column read under parquet."""
    media = with_media_columns(table(spark, sf_dir, "documents"))
    return media.select(
        "doc_id",
        F.col("media_meta.mime").alias("mime"),
        F.col("media_meta.n_bytes").cast("long").alias("n_bytes"),
        F.col("media_meta.codec").alias("codec"),
    )


def decode_image(blob: bytes):  # pragma: no cover - codec not in container
    """Real image decode — requires a codec library the container does
    not ship. The mapInPandas wiring above is the tested path; swap
    byte_histogram_batches for a PIL/torchvision kernel in a full env."""
    try:
        from PIL import Image  # noqa: F401
        import io

        return Image.open(io.BytesIO(blob))
    except ImportError as e:
        raise NotImplementedError(
            "image decode needs PIL; container ships no codecs"
        ) from e


# ---------------------------------------------------------------------------
# Resize: plan (oracle-checked arithmetic) + execution kernel (mapInPandas)

_MAX_SIDE = 32  # target bounding box for the synthetic "images"


def _resize_dim_cols() -> dict[str, F.Column]:
    """The synthetic decode stand-in + aspect-preserving target dims as
    named Columns, shared by mm_resize_plan (the oracle-checked
    metadata half) and mm_resize_bytes (the pixel kernel) so the plan,
    the kernel's inputs, and the SQL oracle can only drift together."""
    src_w = (F.lit(16) + F.col("media_meta.n_bytes") % 64).cast("long")
    src_h = (F.lit(16) + (F.col("media_meta.n_bytes") * 7) % 48).cast("long")
    scale = F.least(
        F.lit(float(_MAX_SIDE)) / src_w, F.lit(float(_MAX_SIDE)) / src_h, F.lit(1.0)
    )
    return {
        "src_w": src_w,
        "src_h": src_h,
        "out_w": F.greatest(F.lit(1), F.floor(src_w * scale)).cast("long"),
        "out_h": F.greatest(F.lit(1), F.floor(src_h * scale)).cast("long"),
    }


@query(
    "mm_resize_plan",
    oracle=f"""
    WITH dims AS (
        SELECT doc_id,
               (16 + octet_length(encode(text)) % 64)::BIGINT AS src_w,
               (16 + (octet_length(encode(text)) * 7) % 48)::BIGINT AS src_h
        FROM documents
    )
    SELECT doc_id, src_w, src_h,
           greatest(1, floor(src_w * least({_MAX_SIDE}.0 / src_w,
                                           {_MAX_SIDE}.0 / src_h, 1.0)))::BIGINT
               AS out_w,
           greatest(1, floor(src_h * least({_MAX_SIDE}.0 / src_w,
                                           {_MAX_SIDE}.0 / src_h, 1.0)))::BIGINT
               AS out_h
    FROM dims
    """,
    covers=["X4"],
)
def mm_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving resize planning over media metadata: source
    dims (a deterministic synthetic decode stand-in — real pipelines
    read them from the codec header) -> the largest size fitting a
    32x32 (_MAX_SIDE) box without upscaling. Pure JVM arithmetic,
    map-only; the metadata-level half of a resize stage, which at
    100 TB is what lets you PRUNE (skip already-small media) before
    paying for any pixel work."""
    media = with_media_columns(table(spark, sf_dir, "documents"))
    dims = _resize_dim_cols()
    return media.select(
        "doc_id", *[col.alias(name) for name, col in dims.items()]
    )


_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("out_w", T.LongType()),
        T.StructField("out_h", T.LongType()),
        T.StructField("pixels", T.BinaryType()),
    ]
)


def resize_bytes_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Nearest-neighbor 'resize' over the synthetic byte buffer: treat
    the blob as a src_h x src_w byte image (row-major, truncated/padded)
    and gather the out_h x out_w nearest-neighbor grid — the exact
    batch shape of a torchvision/PIL resize kernel, minus the codec.
    Vectorized numpy gather per image; Arrow moves the bytes."""
    import numpy as np

    for pdf in batches:
        ids, ws, hs, bufs = [], [], [], []
        for doc_id, blob, sw, sh, ow, oh in zip(
            pdf["doc_id"], pdf["media"], pdf["src_w"], pdf["src_h"],
            pdf["out_w"], pdf["out_h"],
        ):
            img = np.frombuffer(blob, dtype=np.uint8)
            img = np.resize(img, (sh, sw))  # truncate/cycle to H x W
            ys = (np.arange(oh) * sh) // oh
            xs = (np.arange(ow) * sw) // ow
            out = img[np.ix_(ys, xs)]
            ids.append(doc_id)
            ws.append(ow)
            hs.append(oh)
            bufs.append(out.tobytes())
        yield pd.DataFrame(
            {"doc_id": ids, "out_w": ws, "out_h": hs, "pixels": bufs}
        )


@query("mm_resize_bytes", oracle=None, covers=["X4"])
def mm_resize_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pixel half of the resize stage: mapInPandas gather over the
    binary column at the planned output dims. The plan columns are
    computed INLINE in the same projection as the media bytes (they
    derive from the same row — a join back to mm_resize_plan would
    manufacture a shuffle for column-level information). One map stage,
    no shuffle. Rows-only under the driver (raw BINARY output); the
    hex-projected twin mm_resize_digest carries the pixel-exact
    oracle, and the pytest checks buffer sizes and a known gather."""
    media = with_media_columns(table(spark, sf_dir, "documents"))
    dims = _resize_dim_cols()
    src = media.select(
        "doc_id", "media", *[col.alias(name) for name, col in dims.items()]
    )
    return src.mapInPandas(resize_bytes_batches, schema=_RESIZE_SCHEMA)


@query(
    "mm_resize_digest",
    # Pixel-exact SQL twin of the resize kernel. np.resize CYCLES the
    # source buffer to sh*sw, so out[i,j] = blob[((i*sh//oh)*sw +
    # j*sw//ow) % n] — each output pixel is one 2-char slice of the
    # blob's hex dump, reassembled in row-major order. Domain: n > 0
    # (documents are non-empty; np.resize of an EMPTY buffer
    # zero-fills, while % 0 is undefined in SQL).
    oracle=f"""
    WITH dims AS (
      SELECT doc_id, hex(encode(text)) AS h,
             octet_length(encode(text)) AS n,
             (16 + octet_length(encode(text)) % 64)::BIGINT AS src_w,
             (16 + (octet_length(encode(text)) * 7) % 48)::BIGINT AS src_h
      FROM documents
    ),
    d2 AS (
      SELECT *,
             greatest(1, floor(src_w * least({_MAX_SIDE}.0/src_w,
                 {_MAX_SIDE}.0/src_h, 1.0)))::BIGINT AS out_w,
             greatest(1, floor(src_h * least({_MAX_SIDE}.0/src_w,
                 {_MAX_SIDE}.0/src_h, 1.0)))::BIGINT AS out_h
      FROM dims
    ),
    ri AS (SELECT *, unnest(range(0, out_h)) AS i FROM d2),
    rij AS (SELECT *, unnest(range(0, out_w)) AS j FROM ri),
    px AS (
      SELECT doc_id, out_w, out_h, i, j,
             substring(h, (((i*src_h//out_h)*src_w + (j*src_w//out_w))
                           % n)*2 + 1, 2) AS pp
      FROM rij
    )
    SELECT doc_id, out_w, out_h,
           string_agg(pp, '' ORDER BY i, j) AS px_hex
    FROM px GROUP BY doc_id, out_w, out_h
    """,
    covers=["X4"],
)
def mm_resize_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-oracled projection of the SAME nearest-neighbor resize
    kernel (mm_resize_bytes' mapInPandas path, unchanged): the gathered
    pixel buffer rendered as hex so the driver value-compares every
    output pixel against the DuckDB cyclic-gather twin (upgraded r6 —
    the multimodal family's pixel path now has a hard signal
    end-to-end: plan dims, frame slices, and resize gathers are all
    oracle-checked)."""
    media = with_media_columns(table(spark, sf_dir, "documents"))
    dims = _resize_dim_cols()
    src = media.select(
        "doc_id", "media", *[col.alias(name) for name, col in dims.items()]
    )
    out = src.mapInPandas(resize_bytes_batches, schema=_RESIZE_SCHEMA)
    return out.select(
        "doc_id", "out_w", "out_h", F.hex("pixels").alias("px_hex")
    )
