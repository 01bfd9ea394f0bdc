"""Real PPM/BMP codec kernels and their Spark operators
(decode_image_stats / resize_image) — the codec-free formats where the
full decode (header parse, stride padding, channel order, row order)
runs for real inside mapInPandas."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cherry_pipelines_spark.operators.multimodal import (
    _decode_blob,
    _decode_bmp,
    _decode_png,
    _decode_ppm,
    _encode_bmp,
    _encode_png,
    _encode_ppm,
    decode_image_stats,
    resize_image,
)


@pytest.mark.parametrize("w,h", [(1, 1), (2, 3), (3, 2), (5, 4), (8, 1), (7, 5)])
def test_roundtrip_both_formats(w, h):
    rng = np.random.default_rng(w * 100 + h)
    pix = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    assert np.array_equal(_decode_ppm(_encode_ppm(pix)), pix)
    # widths 1,2,3,5,7 exercise every BMP row-padding remainder
    assert np.array_equal(_decode_bmp(_encode_bmp(pix)), pix)


def test_ppm_header_comments_and_whitespace():
    blob = b"P6 # inline\n# full line comment\n 3\t2\n255\n" + bytes(range(18))
    pix = _decode_ppm(blob)
    assert pix.shape == (2, 3, 3)
    assert pix.reshape(-1).tolist() == list(range(18))


def test_bmp_top_down_negative_height():
    pix = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    b = bytearray(_encode_bmp(pix))
    b[22:26] = (-2).to_bytes(4, "little", signed=True)
    stride = (3 * 3 + 3) // 4 * 4
    raster = np.zeros((2, stride), np.uint8)
    raster[:, :9] = pix[:, :, ::-1].reshape(2, 9)  # top-down BGR rows
    b[54:] = raster.tobytes()
    assert np.array_equal(_decode_bmp(bytes(b)), pix)


def test_unsupported_formats_raise():
    for blob in (b"\x89PNG\r\n", b"\xff\xd8\xff", b"", b"P5\n1 1\n255\n\x00"):
        with pytest.raises(ValueError):
            _decode_blob(blob)
    with pytest.raises(ValueError):
        _decode_bmp(_encode_bmp(np.zeros((1, 1, 3), np.uint8))[:30])  # truncated


@pytest.mark.parametrize("filters", [None, [1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_png_roundtrip_every_filter(filters):
    """_decode_png must undo every PNG scanline filter type exactly,
    including the Paeth predictor and the row-0 zero-prior edge."""
    rng = np.random.default_rng(17 if filters is None else sum(filters))
    for w, h in [(1, 1), (2, 3), (7, 5), (16, 16)]:
        pix = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        assert np.array_equal(_decode_png(_encode_png(pix, filters)), pix), (w, h)


def test_png_stored_deflate_block():
    """A zlib stream of one STORED (uncompressed) deflate block — the
    shape the SQL-built driver fixture emits — must decode identically
    to the compressed stream."""
    import struct
    import zlib

    pix = (np.arange(2 * 3 * 3) % 256).astype(np.uint8).reshape(2, 3, 3)
    raw = b"".join(b"\x00" + pix[r].tobytes() for r in range(2))
    stored = b"\x78\x01\x01" + struct.pack("<HH", len(raw), 0xFFFF ^ len(raw)) + raw
    stored += struct.pack(">I", zlib.adler32(raw))

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    blob = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 2, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", stored)
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(_decode_png(blob), pix)
    fmt, got = _decode_blob(blob)
    assert fmt == "png" and np.array_equal(got, pix)


def test_png_multiple_idat_chunks_concatenate():
    import struct
    import zlib

    pix = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    whole = _encode_png(pix)
    # re-split the IDAT payload into two chunks
    sig, rest = whole[:8], whole[8:]
    ihdr_len = 12 + 13
    ihdr, rest = rest[:ihdr_len], rest[ihdr_len:]
    idat_len = int.from_bytes(rest[:4], "big")
    payload = rest[8 : 8 + idat_len]
    iend = rest[12 + idat_len :]

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    mid = len(payload) // 2
    split = sig + ihdr + chunk(b"IDAT", payload[:mid]) + chunk(b"IDAT", payload[mid:]) + iend
    assert np.array_equal(_decode_png(split), pix)


def test_png_unsupported_and_malformed_raise():
    import struct
    import zlib

    pix = np.zeros((2, 2, 3), np.uint8)
    good = _encode_png(pix)
    with pytest.raises(ValueError):
        _decode_png(good[:20])  # truncated chunk
    # unsupported color type (grayscale)
    def chunk(typ, data):
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    gray = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"\x00\x01\x02\x00\x03\x04"))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        _decode_png(gray)
    # corrupt zlib stream
    bad = bytearray(good)
    bad[8 + 25 + 8] ^= 0xFF  # flip a byte inside IDAT payload
    with pytest.raises(Exception):
        _decode_png(bytes(bad))


def _media_df(spark, blobs):
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("blob", T.BinaryType()),
        ]
    )
    return spark.createDataFrame(list(enumerate(blobs)), schema)


def test_decode_image_stats_operator(spark):
    rng = np.random.default_rng(3)
    p1 = rng.integers(0, 256, (4, 5, 3), dtype=np.uint8)
    p2 = rng.integers(0, 256, (2, 7, 3), dtype=np.uint8)
    p3 = rng.integers(0, 256, (3, 4, 3), dtype=np.uint8)
    df = _media_df(
        spark,
        [
            _encode_ppm(p1),
            _encode_bmp(p2),
            b"\x89PNG not decodable",
            _encode_png(p3, [0, 1, 2, 3, 4]),
        ],
    )
    rows = {r["media_id"]: r for r in decode_image_stats(df).collect()}
    assert (rows[0]["format"], rows[0]["width"], rows[0]["height"]) == ("ppm", 5, 4)
    assert rows[0]["px_sum"] == int(p1.astype("int64").sum())
    assert (rows[1]["format"], rows[1]["width"], rows[1]["height"]) == ("bmp", 7, 2)
    assert rows[1]["px_min"] == int(p2.min()) and rows[1]["px_max"] == int(p2.max())
    assert rows[2]["format"] is None and rows[2]["px_sum"] is None
    assert (rows[3]["format"], rows[3]["width"], rows[3]["height"]) == ("png", 4, 3)
    assert rows[3]["px_sum"] == int(p3.astype("int64").sum())


def test_resize_image_matches_numpy(spark):
    rng = np.random.default_rng(9)
    p1 = rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)
    p2 = rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)
    df = _media_df(spark, [_encode_ppm(p1), _encode_bmp(p2)])
    rows = {r["media_id"]: r for r in resize_image(df, factor=2).collect()}
    for mid, pix in ((0, p1), (1, p2)):
        r = rows[mid]
        expect = pix[::2, ::2]
        assert (r["width_in"], r["height_in"]) == (pix.shape[1], pix.shape[0])
        assert (r["width_out"], r["height_out"]) == (
            expect.shape[1], expect.shape[0],
        )
        _fmt, got = _decode_blob(bytes(r["blob_out"]))
        assert np.array_equal(got, expect), mid


def test_dhash_size_invariant_and_variant_flip(spark):
    """The grid normalizes size: a 2x nearest-neighbor upscale hashes
    identically; a one-pixel edit flips at most one bit."""
    import numpy as np

    from cherry_pipelines_spark.operators.multimodal import (
        _encode_ppm,
        image_dhash,
    )

    base = ((np.arange(16 * 16 * 3) * 7) % 256).astype("uint8").reshape(16, 16, 3)
    up = base.repeat(2, axis=0).repeat(2, axis=1)
    var = base.copy()
    var[0, 0] = 255
    df = spark.createDataFrame(
        [
            (1, _encode_ppm(base)),
            (2, _encode_ppm(up)),
            (3, _encode_ppm(var)),
            (4, b"not an image"),
        ],
        "media_id long, blob binary",
    )
    got = {r["media_id"]: r["dhash"] for r in image_dhash(df).collect()}
    assert got[1] == got[2]
    assert got[4] is None
    ham = sum(
        bin(int(a, 16) ^ int(b, 16)).count("1")
        for a, b in zip(got[1], got[3])
    )
    assert ham <= 1


def test_dhash_near_dups_exact_and_guard(spark):
    import numpy as np
    import pytest

    from cherry_pipelines_spark.operators.multimodal import (
        _encode_ppm,
        dhash_near_dups,
        image_dhash,
    )

    imgs = []
    for i in range(12):
        g = i % 3
        pix = ((g * 31 + np.arange(16 * 16 * 3) * 7) % 256).astype(
            "uint8"
        ).reshape(16, 16, 3)
        if i == 5:
            pix = pix.copy()
            pix[0, 0] = 255
        imgs.append((i, _encode_ppm(pix)))
    df = spark.createDataFrame(imgs, "media_id long, blob binary")
    h = image_dhash(df)
    pairs = {
        (r["a_id"], r["b_id"]): r["hamming"]
        for r in dhash_near_dups(h, max_dist=3).collect()
    }
    # every same-group pair qualifies (variant is within 1 bit)
    import itertools

    for a, b in itertools.combinations(range(12), 2):
        if a % 3 == b % 3:
            assert (a, b) in pairs
            assert pairs[(a, b)] <= 1
        else:
            assert (a, b) not in pairs
    with pytest.raises(ValueError):
        dhash_near_dups(h, max_dist=4, bands=4)
