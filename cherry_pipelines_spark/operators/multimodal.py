"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

PPM (P6), uncompressed 24bpp BMP, 8-bit truecolor PNG (stdlib zlib
inflate + all five scanline filters), and baseline JPEG
(``operators/jpeg.py``: marker/DQT/DHT parse, Huffman entropy decode,
dequantize, IDCT, chroma upsample, YCbCr→RGB — plus a spec-valid
encoder) are decoded FOR REAL here via ``decode_image_stats`` /
``resize_image``.  When the worker environment carries PIL/Pillow,
``_decode_blob`` routes JPEG and PNG through it (C-speed libjpeg /
libpng — the bulk-media throughput path, which also picks up
progressive/arithmetic JPEG variants the pure codec rejects); without
PIL the pure-numpy codecs decode everything themselves, and
non-baseline JPEG raises and surfaces as NULL rows.
``SPARK_GRAFT_NO_PIL=1`` pins the pure path.  The
lightweight ``extract_media_meta`` probe keeps its deterministic
stand-in (it is a metadata-only fixture surface, not a decoder).

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


# ---------------------------------------------------------------------
# Real image codecs: PPM (P6) and BMP (24bpp) here; PNG below (zlib
# inflate + unfilter); baseline JPEG in operators/jpeg.py.  All are
# full decoders/encoders — header parse, stride math, channel order,
# entropy/filter reversal — implemented in numpy/stdlib inside the
# same Arrow ``mapInPandas`` batch shape as the metadata stand-in
# above.
# ---------------------------------------------------------------------


def _decode_ppm(blob: bytes):
    """Parse a binary PPM (P6): ``P6 <w> <h> <maxval>`` header tokens
    separated by whitespace (with ``#`` comments), one whitespace byte,
    then ``h*w*3`` raw RGB bytes.  Returns (h, w, 3) uint8 array."""
    import numpy as np

    if blob[:2] != b"P6":
        raise ValueError("not a P6 ppm")
    i, vals = 2, []
    while len(vals) < 3:
        while i < len(blob) and blob[i : i + 1].isspace():
            i += 1
        if blob[i : i + 1] == b"#":
            while i < len(blob) and blob[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(blob) and blob[j : j + 1].isdigit():
            j += 1
        if j == i:
            raise ValueError("bad ppm header")
        vals.append(int(blob[i:j]))
        i = j
    w, h, maxval = vals
    if maxval != 255:
        raise ValueError("only maxval=255 supported")
    i += 1  # exactly one whitespace byte after maxval
    raster = blob[i : i + w * h * 3]
    if len(raster) != w * h * 3:
        raise ValueError("short ppm raster")
    return np.frombuffer(raster, np.uint8).reshape(h, w, 3)


def _encode_ppm(pix) -> bytes:
    h, w, _ = pix.shape
    return b"P6\n%d %d\n255\n" % (w, h) + pix.tobytes()


def _decode_bmp(blob: bytes):
    """Parse an uncompressed 24bpp BMP (BITMAPINFOHEADER): little-endian
    header fields, 4-byte-padded rows, bottom-up row order (top-down when
    height < 0), BGR channel order.  Returns (h, w, 3) uint8 RGB."""
    import numpy as np

    if blob[:2] != b"BM":
        raise ValueError("not a bmp")
    off = int.from_bytes(blob[10:14], "little")
    hdr = int.from_bytes(blob[14:18], "little")
    if hdr < 40:
        raise ValueError("unsupported bmp header")
    w = int.from_bytes(blob[18:22], "little", signed=True)
    h = int.from_bytes(blob[22:26], "little", signed=True)
    bpp = int.from_bytes(blob[28:30], "little")
    comp = int.from_bytes(blob[30:34], "little")
    if bpp != 24 or comp != 0 or w <= 0 or h == 0:
        raise ValueError("only uncompressed 24bpp supported")
    bottom_up, ah = h > 0, abs(h)
    stride = (w * 3 + 3) // 4 * 4
    raster = blob[off : off + stride * ah]
    if len(raster) != stride * ah:
        raise ValueError("short bmp raster")
    rows = np.frombuffer(raster, np.uint8).reshape(ah, stride)[:, : w * 3]
    pix = rows.reshape(ah, w, 3)[:, :, ::-1]  # BGR -> RGB
    return pix[::-1] if bottom_up else pix


def _encode_bmp(pix) -> bytes:
    import numpy as np

    h, w, _ = pix.shape
    stride = (w * 3 + 3) // 4 * 4
    raster = np.zeros((h, stride), np.uint8)
    raster[:, : w * 3] = pix[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    size = 14 + 40 + stride * h
    head = (
        b"BM" + size.to_bytes(4, "little") + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little") + (stride * h).to_bytes(4, "little")
        + b"\x00" * 16
    )
    return head + raster.tobytes()


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _decode_png(blob: bytes):
    """Real PNG decode without external codecs: chunk walk (IHDR/IDAT/
    IEND), stdlib ``zlib.decompress`` of the concatenated IDAT stream,
    then per-scanline UNFILTER of all five PNG filter types — None(0),
    Sub(1), Up(2), Average(3), Paeth(4) — in numpy.  Supports the
    dominant training-data shape: 8-bit truecolor (color type 2),
    non-interlaced.  Returns (h, w, 3) uint8 RGB.

    Sub rows vectorize as a per-channel cumulative sum; Average/Paeth
    have a true left-neighbor recurrence, so those rows walk pixels
    (vectorized across the 3 channels) — the same per-row sequential
    dependency every PNG implementation has.
    """
    import numpy as np
    import zlib

    if blob[:8] != _PNG_SIG:
        raise ValueError("not a png")
    i, idat, w, h = 8, [], None, None
    while i + 8 <= len(blob):
        ln = int.from_bytes(blob[i : i + 4], "big")
        typ = blob[i + 4 : i + 8]
        data = blob[i + 8 : i + 8 + ln]
        if len(data) != ln:
            raise ValueError("truncated png chunk")
        i += 12 + ln  # length + type + data + crc
        if typ == b"IHDR":
            w = int.from_bytes(data[0:4], "big")
            h = int.from_bytes(data[4:8], "big")
            bitd, ct, comp, filt, ilace = data[8], data[9], data[10], data[11], data[12]
            if (bitd, ct, comp, filt, ilace) != (8, 2, 0, 0, 0):
                raise ValueError("only 8-bit truecolor non-interlaced supported")
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    raw = zlib.decompress(b"".join(idat))
    stride = w * 3
    if len(raw) != h * (1 + stride):
        raise ValueError("bad png raster length")
    arr = np.frombuffer(raw, np.uint8).reshape(h, 1 + stride)
    out = np.empty((h, stride), np.uint8)
    zero = np.zeros(stride, np.int32)
    for r in range(h):
        f = int(arr[r, 0])
        line = arr[r, 1:].astype(np.int32)
        prior = out[r - 1].astype(np.int32) if r else zero
        if f == 0:  # None
            recon = line
        elif f == 1:  # Sub: recon[x] = line[x] + recon[x-3]
            recon = np.cumsum(line.reshape(w, 3), axis=0).reshape(stride)
        elif f == 2:  # Up
            recon = line + prior
        elif f in (3, 4):  # Average / Paeth: left-neighbor recurrence
            recon = np.empty(stride, np.int32)
            left = np.zeros(3, np.int32)
            pl = prior.reshape(w, 3)
            ln2 = line.reshape(w, 3)
            for p in range(w):
                b = pl[p]
                if f == 3:
                    recon[p * 3 : p * 3 + 3] = (ln2[p] + (left + b) // 2) & 0xFF
                else:
                    c = pl[p - 1] if p else np.zeros(3, np.int32)
                    pp = left + b - c
                    pa, pb, pc = abs(pp - left), abs(pp - b), abs(pp - c)
                    pred = np.where(
                        (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, b, c)
                    )
                    recon[p * 3 : p * 3 + 3] = (ln2[p] + pred) & 0xFF
                left = recon[p * 3 : p * 3 + 3]
        else:
            raise ValueError(f"bad png filter {f}")
        out[r] = (recon & 0xFF).astype(np.uint8)
    return out.reshape(h, w, 3)


def _encode_png(pix, filters=None) -> bytes:
    """Encode (h, w, 3) uint8 RGB as 8-bit truecolor PNG.  ``filters``
    optionally pins the per-row filter type (default: None-filter rows);
    used by the tests to round-trip every filter type through
    ``_decode_png``."""
    import numpy as np
    import struct
    import zlib

    h, w, _ = pix.shape
    px = pix.astype(np.int32)
    lines = []
    for r in range(h):
        f = 0 if filters is None else int(filters[r % len(filters)])
        cur = px[r].reshape(-1)
        prior = px[r - 1].reshape(-1) if r else np.zeros(w * 3, np.int32)
        left = np.concatenate([np.zeros(3, np.int32), cur[:-3]])
        pl = np.concatenate([np.zeros(3, np.int32), prior[:-3]])
        if f == 0:
            filt = cur
        elif f == 1:
            filt = cur - left
        elif f == 2:
            filt = cur - prior
        elif f == 3:
            filt = cur - (left + prior) // 2
        else:  # Paeth
            pp = left + prior - pl
            pa, pb, pc = abs(pp - left), abs(pp - prior), abs(pp - pl)
            pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prior, pl))
            filt = cur - pred
        lines.append(bytes([f]) + (filt & 0xFF).astype(np.uint8).tobytes())

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    idat = zlib.compress(b"".join(lines))
    return _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")


def _pil_available() -> bool:
    """True when the optional PIL/Pillow fast path is importable and
    not disabled via ``SPARK_GRAFT_NO_PIL``."""
    import os

    if os.environ.get("SPARK_GRAFT_NO_PIL", "").strip().lower() in (
        "1",
        "true",
        "yes",
    ):
        return False
    try:
        import PIL.Image  # noqa: F401
    except ImportError:
        return False
    return True


def _try_pil_decode(blob: bytes):
    """Bulk-media fast path: decode a JPEG/PNG blob via PIL (libjpeg /
    libpng under the hood — C-speed entropy decode) when the worker
    carries Pillow.  Returns an (h, w, 3) uint8 array, or ``None`` when
    PIL is absent, disabled (``SPARK_GRAFT_NO_PIL=1``), or cannot parse
    the blob — the caller then falls back to the pure-numpy codecs,
    whose errors are the authoritative ones.

    Output contract matches the pure codecs: grayscale replicated to 3
    channels, palette/alpha modes converted to RGB.  For the
    block-constant DC-only JPEG fixtures both engines are bit-exact
    (libjpeg short-circuits all-AC-zero blocks to the descaled DC,
    the same closed form jpeg.py computes); arbitrary photos may
    differ per-pixel by IDCT rounding — the parity test pins the exact
    fixtures and documents the tolerance for the rest."""
    if not _pil_available():
        return None
    import io

    import numpy as np
    from PIL import Image

    try:
        with Image.open(io.BytesIO(blob)) as img:
            img.load()
            if img.mode == "L":
                g = np.asarray(img)
                return np.stack([g, g, g], axis=2)
            if img.mode != "RGB":
                img = img.convert("RGB")
            return np.asarray(img)
    except Exception:
        return None


def _decode_blob(blob: bytes):
    """Dispatch on magic bytes → ("ppm"|"bmp"|"png"|"jpeg", pixel
    array).  Raises on malformed data or unsupported stream variants
    (progressive/arithmetic JPEG — see operators/jpeg.py's scope).

    JPEG and PNG route through PIL when the worker has it (the
    bulk-media throughput path — the pure-Python JPEG entropy loop is a
    correctness reference, not a 100 TB media plan) and fall back to
    the pure codecs otherwise; ``SPARK_GRAFT_NO_PIL=1`` forces the
    pure path everywhere (how the parity test exercises both)."""
    if blob[:2] == b"P6":
        return "ppm", _decode_ppm(blob)
    if blob[:2] == b"BM":
        return "bmp", _decode_bmp(blob)
    if blob[:8] == _PNG_SIG:
        pix = _try_pil_decode(blob)
        return "png", pix if pix is not None else _decode_png(blob)
    if blob[:2] == b"\xff\xd8":
        pix = _try_pil_decode(blob)
        if pix is not None:
            return "jpeg", pix
        from cherry_pipelines_spark.operators.jpeg import _decode_jpeg

        return "jpeg", _decode_jpeg(blob)
    raise ValueError("unsupported image format")


DECODE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("px_sum", T.LongType()),
        T.StructField("px_min", T.IntegerType()),
        T.StructField("px_max", T.IntegerType()),
    ]
)


def decode_image_stats(
    df: DataFrame, blob_col: str = "blob", id_col: str = "media_id"
) -> DataFrame:
    """REAL image decode over binary blobs (PPM/BMP): per row, parse the
    container header, undo stride padding / channel order / row order,
    and reduce the pixel array to exact stats.  Undecodable rows yield
    NULL stats (the decoders' ``allow_decode_fail`` posture)."""
    out_schema = T.StructType([df.schema[id_col]] + list(DECODE_STATS_SCHEMA.fields))

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for blob in pdf[blob_col]:
                try:
                    fmt, pix = _decode_blob(bytes(blob))
                    h, w, _ = pix.shape
                    flat = pix.reshape(-1).astype("int64")
                    rows.append(
                        (fmt, w, h, int(flat.sum()), int(flat.min()), int(flat.max()))
                    )
                except Exception:
                    rows.append((None, None, None, None, None, None))
            out = pd.DataFrame(
                rows, columns=[f.name for f in DECODE_STATS_SCHEMA.fields]
            ).astype(object)
            out.insert(0, id_col, pdf[id_col].reset_index(drop=True))
            yield out

    from cherry_pipelines_spark.operators.text import fan_out

    return fan_out(df.select(id_col, blob_col)).mapInPandas(mapper, out_schema)


def resize_image(
    df: DataFrame,
    factor: int = 2,
    blob_col: str = "blob",
    id_col: str = "media_id",
) -> DataFrame:
    """REAL image resize for codec-free formats: decode (PPM/BMP) →
    nearest-neighbor subsample by ``factor`` (keep every factor-th pixel
    in both dimensions) → re-encode in the SAME container format.  One
    Arrow pass; undecodable rows yield NULLs."""
    if factor <= 0:
        raise ValueError("factor must be positive")
    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("format", T.StringType()),
            T.StructField("width_in", T.IntegerType()),
            T.StructField("height_in", T.IntegerType()),
            T.StructField("width_out", T.IntegerType()),
            T.StructField("height_out", T.IntegerType()),
            T.StructField("blob_out", T.BinaryType()),
        ]
    )
    from cherry_pipelines_spark.operators.jpeg import _encode_jpeg

    enc = {"ppm": _encode_ppm, "bmp": _encode_bmp, "jpeg": _encode_jpeg}

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for blob in pdf[blob_col]:
                try:
                    fmt, pix = _decode_blob(bytes(blob))
                    small = pix[::factor, ::factor]
                    h2, w2, _ = small.shape
                    rows.append(
                        (fmt, pix.shape[1], pix.shape[0], w2, h2, enc[fmt](small))
                    )
                except Exception:
                    rows.append((None, None, None, None, None, None))
            out = pd.DataFrame(
                rows,
                columns=[
                    "format", "width_in", "height_in",
                    "width_out", "height_out", "blob_out",
                ],
            ).astype(object)
            out.insert(0, id_col, pdf[id_col].reset_index(drop=True))
            yield out

    from cherry_pipelines_spark.operators.text import fan_out

    return fan_out(df.select(id_col, blob_col)).mapInPandas(mapper, out_schema)


# ------------------------------------------------------------------ audio


def _decode_wav(blob: bytes):
    """Parse a RIFF/WAVE container with 16-bit PCM samples: validate
    the chunk layout (RIFF size, fmt tag, PCM format code, block
    alignment), then return (sample_rate, channels, int16 sample
    array).  Raises on compressed/malformed input — WAV with PCM is the
    one audio container that needs no external codec, the audio
    counterpart of PPM/BMP on the image side."""
    import struct

    import numpy as np

    if len(blob) < 44 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    riff_size = struct.unpack("<I", blob[4:8])[0]
    if riff_size != len(blob) - 8:
        raise ValueError("RIFF size mismatch")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(blob):
        cid = blob[pos : pos + 4]
        csz = struct.unpack("<I", blob[pos + 4 : pos + 8])[0]
        body = blob[pos + 8 : pos + 8 + csz]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + csz + (csz & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    (audio_format, channels, rate, _byte_rate, block_align, bits) = struct.unpack(
        "<HHIIHH", fmt[:16]
    )
    if audio_format != 1 or bits != 16:
        raise ValueError("not 16-bit PCM (codec required)")
    if block_align != channels * 2:
        raise ValueError("block_align mismatch")
    samples = np.frombuffer(data, dtype="<i2")
    return rate, channels, samples


AUDIO_STATS_SCHEMA = T.StructType(
    [
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("sum_sq", T.LongType()),
        T.StructField("peak", T.IntegerType()),
    ]
)


def decode_audio_stats(
    df: DataFrame, blob_col: str = "blob", id_col: str = "media_id"
) -> DataFrame:
    """REAL audio decode over binary blobs (WAV/PCM16): parse the RIFF
    chunk walk, vectorize the PCM payload with numpy, and reduce to
    exact integer stats — energy (sum of squared samples), peak
    amplitude, duration floor-milliseconds.  Integer outputs make the
    result engine-replayable bit-for-bit (no float RMS).  Undecodable
    rows yield NULL stats (``allow_decode_fail`` posture).  Same Arrow
    mapInPandas batch shape as the image kernels — one pass, no
    regroup, scales with input splits."""
    import numpy as np

    out_schema = T.StructType([df.schema[id_col]] + list(AUDIO_STATS_SCHEMA.fields))

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for blob in pdf[blob_col]:
                try:
                    rate, channels, s = _decode_wav(bytes(blob))
                    s64 = s.astype("int64")
                    n = len(s) // channels
                    rows.append(
                        (
                            int(rate),
                            int(channels),
                            int(n),
                            int(n * 1000 // rate),
                            int((s64 * s64).sum()),
                            int(np.abs(s64).max()) if len(s) else 0,
                        )
                    )
                except Exception:
                    rows.append((None, None, None, None, None, None))
            out = pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_STATS_SCHEMA.fields]
            ).astype(object)
            out.insert(0, id_col, pdf[id_col].reset_index(drop=True))
            yield out

    from cherry_pipelines_spark.operators.text import fan_out

    return fan_out(df.select(id_col, blob_col)).mapInPandas(mapper, out_schema)


# ------------------------------------------------------------- perceptual hash


def _dhash_bits(pix, hash_w: int = 8, hash_h: int = 8):
    """64 dHash bits from an HxWx3 uint8 array: integer grayscale
    ((r+g+b)//3), nearest-neighbor sample to (hash_h, hash_w+1), then
    row-wise left>right comparisons.  Pure integer math — bit-exact
    reproducible by the SQL oracle."""
    import numpy as np

    h, w, _ = pix.shape
    gray = pix.astype("int64").sum(axis=2) // 3
    ys = (np.arange(hash_h) * h) // hash_h
    xs = (np.arange(hash_w + 1) * w) // (hash_w + 1)
    g2 = gray[np.ix_(ys, xs)]
    return (g2[:, :-1] > g2[:, 1:]).reshape(-1)


def image_dhash(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "media_id",
    hash_w: int = 8,
    hash_h: int = 8,
) -> DataFrame:
    """Perceptual difference-hash over REAL decoded pixels (PPM/BMP):
    ``(id, dhash)`` with the hash as a hex string (nibble = 4 bits,
    row-major, MSB-first) — engine-portable, no int64 sign games.
    Visually identical images (any size — the grid normalizes) collide;
    small edits flip few bits, so near-dups sit at small hamming
    distance.  One Arrow pass; undecodable rows yield NULL."""
    n_bits = hash_w * hash_h
    if n_bits % 4:
        raise ValueError("hash_w*hash_h must be a multiple of 4")
    out_schema = T.StructType(
        [df.schema[id_col], T.StructField("dhash", T.StringType())]
    )

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = []
            for blob in pdf[blob_col]:
                try:
                    _, pix = _decode_blob(bytes(blob))
                    bits = _dhash_bits(pix, hash_w, hash_h)
                    nibbles = bits.reshape(-1, 4)
                    vals = nibbles @ (8, 4, 2, 1)
                    hashes.append("".join(format(int(v), "x") for v in vals))
                except Exception:
                    hashes.append(None)
            out = pd.DataFrame({id_col: pdf[id_col].reset_index(drop=True)})
            out["dhash"] = pd.Series(hashes, dtype=object)
            yield out

    from cherry_pipelines_spark.operators.text import fan_out

    return fan_out(df.select(id_col, blob_col)).mapInPandas(mapper, out_schema)


def dhash_near_dups(
    hashes: DataFrame,
    max_dist: int,
    id_col: str = "media_id",
    hash_col: str = "dhash",
    bands: int = 4,
    hash_chars: int = 16,
) -> DataFrame:
    """Image near-dup pairs by hamming distance over dHash hex strings:
    ``(a_id, b_id, hamming)`` with ``hamming <= max_dist``.

    LSH shape, not N²: the ``hash_chars``-char hex string is sliced
    into ``bands`` integer band values BEFORE the join (one ``conv``
    each, done once per row, not once per candidate pair); candidates
    equi-join on (band index, band value); the hamming verify is a
    flat XOR+popcount sum over the band integers — straight-line
    codegen arithmetic, no per-nibble lambda fold.  With
    ``max_dist < bands`` the pigeonhole guarantees a colliding band for
    every qualifying pair, so the result is EXACT — the same
    completeness argument as the simhash band join.

    Dedup without a shuffle: a pair that collides in several bands is
    emitted only from its FIRST matching band (a codegen predicate
    over the earlier bands' slices), so the old
    ``distinct()`` over all candidate pairs — a second full shuffle of
    the candidate set, measured at ~2/3 of this operator's runtime —
    is gone entirely.

    100 TB shape: band rows are |corpus|·bands, buckets are keyed by
    band value (a degenerate all-same-hash corpus needs the usual
    max_bucket-style cap upstream); the verify join is candidate-
    bounded.  Never broadcasts the corpus, never nests loops.
    BAND WIDTH IS THE SCALE KNOB: a w-bit band collides random pairs
    at 2^-w, so candidate volume is Θ(n²/2^w) — keep E[candidates]
    bounded by growing the hash/sketch width ~2 bits per 4x of corpus
    (measured: the pinned-32-plane SRP caller goes super-linear at
    256x, the scaled-width twin is flat — SCALING_DEEP.json).
    """
    from pyspark.sql import functions as F

    if max_dist >= bands:
        raise ValueError(
            f"max_dist must be < bands for an exact result "
            f"(got {max_dist} >= {bands})"
        )
    if hash_chars % bands:
        raise ValueError(f"bands ({bands}) must divide hash_chars ({hash_chars})")
    wchars = hash_chars // bands
    if wchars > 15:
        raise ValueError("band slices above 60 bits overflow a signed long")
    # the hash frame feeds BOTH self-join sides; without a checkpoint the
    # whole decode+hash MapInPandas subtree runs twice (Spark does not
    # CSE across self-joins).  The frame is id + `bands` longs — tiny at
    # any corpus size — so one lazy materialization beats a second full
    # blob decode
    slices = [
        F.conv(F.substring(F.col(hash_col), b * wchars + 1, wchars), 16, 10)
        .cast("long")
        .alias(f"_s{b}")
        for b in range(bands)
    ]
    h = (
        hashes.filter(F.col(hash_col).isNotNull())
        .select(F.col(id_col), *slices)
        .localCheckpoint(eager=False)
    )
    band_rows = h.select(
        F.col(id_col),
        *[F.col(f"_s{b}") for b in range(bands)],
        F.posexplode(F.array(*[F.col(f"_s{b}") for b in range(bands)])).alias(
            "band", "key"
        ),
    )
    a, b_ = band_rows.alias("a"), band_rows.alias("b")
    # first-matching-band emission: band k qualifies only if no band
    # k' < k also matched — a when-chain over the (small) band count,
    # evaluated post-join on the carried slices
    first_band = F.lit(True)
    for k in range(1, bands):
        earlier_differs = F.lit(True)
        for kp in range(k):
            earlier_differs = earlier_differs & (
                F.col(f"a._s{kp}") != F.col(f"b._s{kp}")
            )
        first_band = F.when(F.col("a.band") == k, earlier_differs).otherwise(
            first_band
        )
    hamming = sum(
        [
            F.bit_count(
                F.col(f"a._s{b}").bitwiseXOR(F.col(f"b._s{b}"))
            ).cast("long")
            for b in range(bands)
        ],
        F.lit(0).cast("long"),
    )
    return (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .filter(first_band)
        .select(
            F.col(f"a.{id_col}").alias("a_id"),
            F.col(f"b.{id_col}").alias("b_id"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_dist)
    )
