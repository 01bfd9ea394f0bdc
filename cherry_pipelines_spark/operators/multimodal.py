"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The container has no image/audio codecs, so the *decode kernels* are
stubbed (deterministic fake or ``NotImplementedError``), but the
Spark-side plumbing is real and tested: schema, Arrow batch shape,
``mapInPandas`` signature, partition behavior — the parts that matter
for running this on a cluster where the workers *do* have codecs.

Design for 100 TB of media: blobs travel as ``binary`` columns inside
Parquet row groups; metadata extraction is one Arrow-batched pass
(``mapInPandas``), no per-row Python calls, no driver collection;
downstream filters on extracted metadata (width, duration, codec) are
ordinary pushdown-able columns.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("n_bytes", T.LongType()),
        T.StructField("format_tag", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def _fake_decode(blob: bytes | None) -> tuple[int, str, int, int]:
    """Deterministic stand-in for a real image decoder.

    Real implementation would go through PIL/libvips here; the container
    lacks codecs, so metadata is derived from the bytes deterministically
    (keeps tests and oracles exact)."""
    if blob is None:
        return 0, "empty", 0, 0
    n = len(blob)
    tag = "png" if blob[:1] == b"\x89" else ("jpg" if blob[:1] == b"\xff" else "bin")
    # fake dimensions derived from content length — stable and oracle-checkable
    return n, tag, 64 + n % 512, 64 + (n * 7) % 512


def extract_media_meta(
    df: DataFrame, blob_col: str = "blob", id_col: str = "media_id"
) -> DataFrame:
    """Arrow-batched metadata extraction over binary media columns."""
    out_schema = T.StructType(
        [df.schema[id_col]] + list(MEDIA_META_SCHEMA.fields)
    )

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [_fake_decode(b) for b in pdf[blob_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": [m[0] for m in meta],
                    "format_tag": [m[1] for m in meta],
                    "width": [m[2] for m in meta],
                    "height": [m[3] for m in meta],
                }
            )

    return df.select(id_col, blob_col).mapInPandas(mapper, out_schema)


def sample_frames(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "media_id",
    frame_size: int = 32,
    every_k: int = 2,
) -> DataFrame:
    """Frame sampling over opaque media blobs: split each blob into
    fixed-size ``frame_size``-byte frames and keep every ``every_k``-th
    one (a video decoder would seek key-frames here; the fixed-stride
    split is the codec-free stand-in — the *plumbing* is the real part:
    one Arrow pass, frames exploded as rows so downstream per-frame
    feature extraction distributes).

    Output: ``(id_col, frame_index, n_frame_bytes, frame)`` — one row
    per sampled frame; a trailing short frame is kept.
    """
    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("frame_index", T.LongType()),
            T.StructField("n_frame_bytes", T.LongType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list = []
            idxs: list[int] = []
            sizes: list[int] = []
            frames: list[bytes] = []
            for mid, blob in zip(pdf[id_col], pdf[blob_col]):
                if blob is None:
                    continue
                n_frames = (len(blob) + frame_size - 1) // frame_size
                for fi in range(0, n_frames, every_k):
                    fr = blob[fi * frame_size : (fi + 1) * frame_size]
                    ids.append(mid)
                    idxs.append(fi)
                    sizes.append(len(fr))
                    frames.append(fr)
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype=pdf[id_col].dtype),
                    "frame_index": pd.Series(idxs, dtype="int64"),
                    "n_frame_bytes": pd.Series(sizes, dtype="int64"),
                    "frame": pd.Series(frames, dtype=object),
                }
            )

    from cherry_pipelines_spark.operators.text import fan_out

    return fan_out(df.select(id_col, blob_col)).mapInPandas(mapper, out_schema)


def frame_features(
    df: DataFrame, blob_col: str = "frame", drop_blob: bool = True
) -> DataFrame:
    """Per-frame feature extraction over sampled frames (the step after
    :func:`sample_frames` in a media pipeline).  The real kernel is a
    model forward pass / image descriptor; codec-free stand-in: exact
    byte statistics (min/max/sum/mean) — deterministic, oracle-checkable,
    and shaped like the real thing (one Arrow pass in, fixed feature
    columns out, ready to feed ``similarity.cosine_topk`` after
    ``F.array(...)``).

    All non-blob input columns pass through; features are
    ``byte_min/byte_max/byte_sum`` (long) + ``byte_mean`` (double,
    round 6).  NULL/empty blobs yield NULL features.
    """
    passthrough = [c for c in df.columns if c != blob_col]
    out_fields = [df.schema[c] for c in passthrough]
    if not drop_blob:
        out_fields.append(df.schema[blob_col])
        passthrough = passthrough + [blob_col]
    out_schema = T.StructType(
        out_fields
        + [
            T.StructField("byte_min", T.LongType()),
            T.StructField("byte_max", T.LongType()),
            T.StructField("byte_sum", T.LongType()),
            T.StructField("byte_mean", T.DoubleType()),
        ]
    )

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            n = len(pdf)
            blobs = pdf[blob_col].to_numpy()
            lens = np.fromiter(
                (len(b) if b is not None else 0 for b in blobs), np.int64, count=n
            )
            nonempty = lens > 0
            # one concatenated buffer + segmented reductions (reduceat)
            # instead of a per-frame frombuffer loop
            buf = np.frombuffer(
                b"".join(blobs[i] for i in np.nonzero(nonempty)[0]), np.uint8
            ).astype(np.int64)
            ne_lens = lens[nonempty]
            mins = np.full(n, None, dtype=object)
            maxs = np.full(n, None, dtype=object)
            sums = np.full(n, None, dtype=object)
            means = np.full(n, None, dtype=object)
            if len(ne_lens):
                starts = np.zeros(len(ne_lens), dtype=np.int64)
                np.cumsum(ne_lens[:-1], out=starts[1:])
                seg_sum = np.add.reduceat(buf, starts)
                mins[nonempty] = np.minimum.reduceat(buf, starts)
                maxs[nonempty] = np.maximum.reduceat(buf, starts)
                sums[nonempty] = seg_sum
                # python round (not np.round) to stay bit-identical to
                # the SQL oracle's decimal-aware rounding
                means[nonempty] = [
                    round(int(s) / int(ln), 6) for s, ln in zip(seg_sum, ne_lens)
                ]
            base = pdf[passthrough].reset_index(drop=True)
            base["byte_min"] = pd.Series(mins, dtype=object)
            base["byte_max"] = pd.Series(maxs, dtype=object)
            base["byte_sum"] = pd.Series(sums, dtype=object)
            base["byte_mean"] = pd.Series(means, dtype=object)
            yield base

    return df.mapInPandas(mapper, out_schema)


def sampled_frame_features(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "media_id",
    frame_size: int = 32,
    every_k: int = 2,
) -> DataFrame:
    """Fused :func:`sample_frames` → :func:`frame_features` for the
    chained case: identical output rows, ONE ``mapInPandas`` pass.

    The chained form Arrow-serializes every sampled frame's bytes out of
    the first UDF and back into the second; here frames are never
    materialized at all — per-frame (start, end) offsets into one
    concatenated blob buffer drive ``np.*.reduceat`` segmented
    reductions directly (interleaved start/end index trick: results at
    even positions are the [start, end) segments, odd positions are the
    skipped gaps).  Cuts the Python↔JVM transfer roughly in half and
    drops one exchange-free stage boundary.
    """
    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("frame_index", T.LongType()),
            T.StructField("n_frame_bytes", T.LongType()),
            T.StructField("byte_min", T.LongType()),
            T.StructField("byte_max", T.LongType()),
            T.StructField("byte_sum", T.LongType()),
            T.StructField("byte_mean", T.DoubleType()),
        ]
    )

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids: list = []
            idxs: list[int] = []
            starts_l: list[int] = []
            ends_l: list[int] = []
            chunks: list[bytes] = []
            offset = 0
            for mid, blob in zip(pdf[id_col], pdf[blob_col]):
                if not blob:  # NULL or empty: no frames (as in sample_frames)
                    continue
                nb = len(blob)
                chunks.append(blob)
                n_frames = (nb + frame_size - 1) // frame_size
                for fi in range(0, n_frames, every_k):
                    ids.append(mid)
                    idxs.append(fi)
                    starts_l.append(offset + fi * frame_size)
                    ends_l.append(offset + min((fi + 1) * frame_size, nb))
                offset += nb
            if ids:
                buf = np.frombuffer(b"".join(chunks), np.uint8).astype(np.int64)
                starts = np.asarray(starts_l, np.int64)
                ends = np.asarray(ends_l, np.int64)
                inter = np.empty(2 * len(starts), np.int64)
                inter[0::2] = starts
                inter[1::2] = ends
                # reduceat indices must be < len(buf); a trailing end ==
                # len(buf) is implied by reduceat's run-to-end behavior
                idx = inter[:-1] if inter[-1] == len(buf) else inter
                sums = np.add.reduceat(buf, idx)[::2]
                mins = np.minimum.reduceat(buf, idx)[::2]
                maxs = np.maximum.reduceat(buf, idx)[::2]
                lens = ends - starts
                means = [round(int(s) / int(ln), 6) for s, ln in zip(sums, lens)]
            else:
                sums = mins = maxs = lens = means = []
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype=pdf[id_col].dtype),
                    "frame_index": pd.Series(idxs, dtype="int64"),
                    "n_frame_bytes": pd.Series(lens, dtype="int64"),
                    "byte_min": pd.Series(mins, dtype="int64"),
                    "byte_max": pd.Series(maxs, dtype="int64"),
                    "byte_sum": pd.Series(sums, dtype="int64"),
                    "byte_mean": pd.Series(means, dtype="float64"),
                }
            )

    from cherry_pipelines_spark.operators.text import fan_out

    return fan_out(df.select(id_col, blob_col)).mapInPandas(mapper, out_schema)


def resize_media(
    df: DataFrame, blob_col: str = "blob", stride: int = 2, id_col: str = "media_id"
) -> DataFrame:
    """Media resize/downsample plumbing: the real kernel is a codec
    decode → resample → re-encode (PIL/libvips); the codec-free stand-in
    keeps every ``stride``-th byte, which preserves the properties the
    Spark side must get right — output is a new smaller binary column
    with before/after sizes, computed in one Arrow pass, no driver
    collection.  NULL blobs pass through as NULL.
    """
    if stride <= 0:
        raise ValueError("stride must be positive")
    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("n_bytes_in", T.LongType()),
            T.StructField("n_bytes_out", T.LongType()),
            T.StructField("blob_out", T.BinaryType()),
        ]
    )

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_in: list = []
            n_out: list = []
            outs: list = []
            for blob in pdf[blob_col]:
                if blob is None:
                    n_in.append(None); n_out.append(None); outs.append(None)
                    continue
                small = blob[::stride]
                n_in.append(len(blob))
                n_out.append(len(small))
                outs.append(small)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes_in": pd.Series(n_in, dtype=object),
                    "n_bytes_out": pd.Series(n_out, dtype=object),
                    "blob_out": pd.Series(outs, dtype=object),
                }
            )

    return df.select(id_col, blob_col).mapInPandas(mapper, out_schema)


def resize_stub(df: DataFrame, blob_col: str = "blob", max_px: int = 256) -> DataFrame:
    """Placeholder for the real codec-backed resize kernel: raises if
    reached — the container has no codecs.  ``resize_media`` is the
    deterministic stand-in with the same plumbing; swap in PIL here on
    a real cluster."""
    raise NotImplementedError(
        "image resize requires a codec library not present in this container"
    )
