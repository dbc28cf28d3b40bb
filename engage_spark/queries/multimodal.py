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


@query("mm_byte_histogram", oracle=None, covers=["X4"])
def mm_byte_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media feature extraction through mapInPandas: binary column in,
    fixed-width feature row out. One map stage, no shuffle; batch size
    bounded by spark.sql.execution.arrow.maxRecordsPerBatch."""
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
    """Frame sampling over binary media via mapInPandas (row-expanding)."""
    media = with_media_columns(table(spark, sf_dir, "documents"))
    return media.select("doc_id", "media").mapInPandas(
        frame_sample_batches, schema=_FRAME_SCHEMA
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
    no shuffle. Rows-only under the driver (binary output); the pytest
    checks buffer sizes equal out_w*out_h and a known gather."""
    media = with_media_columns(table(spark, sf_dir, "documents"))
    dims = _resize_dim_cols()
    src = media.select(
        "doc_id", "media", *[col.alias(name) for name, col in dims.items()]
    )
    return src.mapInPandas(resize_bytes_batches, schema=_RESIZE_SCHEMA)
