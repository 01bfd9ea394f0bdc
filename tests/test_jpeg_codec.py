"""Baseline JPEG codec (operators/jpeg.py) — the library's last image
stand-in replaced with a real decoder/encoder pair.

Exactness strategy mirrors the PPM/PNG suites: with the all-ones quant
table an 8×8-block-constant plane is DC-only and round-trips the DCT
bit-exactly, and gray pixels (R=G=B) survive the YCbCr color transform
losslessly — so block-constant gray images decode back EXACTLY,
including through Spark's ``decode_image_stats`` / ``resize_image``.
Lossy-but-bounded behavior on arbitrary images, non-baseline stream
rejection, and restart-marker handling are pinned separately.
"""

from __future__ import annotations

import numpy as np
import pytest

from cherry_pipelines_spark.operators.jpeg import (
    _decode_jpeg,
    _encode_jpeg,
)


def _block_gray(rng, bh, bw):
    vals = rng.integers(0, 256, (bh, bw), dtype=np.uint8)
    return np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)


def test_block_constant_gray_rgb_roundtrip_exact():
    rng = np.random.default_rng(1)
    g = _block_gray(rng, 3, 5)
    rgb = np.stack([g, g, g], axis=2)
    out = _decode_jpeg(_encode_jpeg(rgb))
    assert np.array_equal(out, rgb)


def test_block_constant_grayscale_roundtrip_exact():
    rng = np.random.default_rng(2)
    g = _block_gray(rng, 4, 2)
    out = _decode_jpeg(_encode_jpeg(g))
    for c in range(3):  # grayscale replicates to all three channels
        assert np.array_equal(out[:, :, c], g)


def test_non_multiple_of_8_dims_cropped():
    # encoder pads by edge replication; decoder crops back to (h, w) —
    # with block-constant content the padding IS the edge value, so the
    # visible region still round-trips exactly
    rng = np.random.default_rng(3)
    g = _block_gray(rng, 3, 3)[:19, :21]
    out = _decode_jpeg(_encode_jpeg(g))
    assert out.shape == (19, 21, 3)
    assert np.array_equal(out[:, :, 0], g)


def test_arbitrary_image_error_bounded():
    # all-ones quant table: the only loss is DCT/color-transform
    # rounding — a few counts per pixel, never structural
    rng = np.random.default_rng(4)
    pix = rng.integers(0, 256, (21, 37, 3), dtype=np.uint8)
    out = _decode_jpeg(_encode_jpeg(pix))
    assert out.shape == pix.shape
    assert np.abs(out.astype(int) - pix.astype(int)).max() <= 4
    gray = rng.integers(0, 256, (16, 24), dtype=np.uint8)
    outg = _decode_jpeg(_encode_jpeg(gray))
    assert np.abs(outg[:, :, 0].astype(int) - gray.astype(int)).max() <= 2


def test_single_pixel_and_tiny_dims():
    for h, w in ((1, 1), (1, 9), (8, 1), (7, 7)):
        pix = np.full((h, w), 200, dtype=np.uint8)
        out = _decode_jpeg(_encode_jpeg(pix))
        assert out.shape == (h, w, 3)
        assert np.array_equal(out[:, :, 0], pix)


def test_malformed_streams_rejected():
    rng = np.random.default_rng(5)
    good = _encode_jpeg(_block_gray(rng, 2, 2))
    bad = [
        b"",
        b"\xff\xd8",                        # SOI only
        b"notajpeg",
        good[:40],                           # truncated mid-segment
        good[:-10],                          # truncated entropy data
        b"\xff\xd8" + good[20:],             # missing leading tables
    ]
    for blob in bad:
        with pytest.raises(ValueError):
            _decode_jpeg(blob)
    # corrupting SOF into progressive (SOF2) must be rejected, not
    # mis-decoded
    idx = good.find(b"\xff\xc0")
    prog = good[:idx] + b"\xff\xc2" + good[idx + 2 :]
    with pytest.raises(ValueError, match="baseline"):
        _decode_jpeg(prog)


def test_mutation_fuzz_never_hangs_or_misparses():
    # seeded byte-level mutations: every mutated stream either decodes
    # to a valid (h, w, 3) uint8 array or raises ValueError — no other
    # exception type, no crash
    rng = np.random.default_rng(6)
    base = _encode_jpeg(rng.integers(0, 256, (24, 16, 3), dtype=np.uint8))
    for i in range(200):
        data = bytearray(base)
        mut = rng.integers(0, 3)
        if mut == 0:
            data[rng.integers(len(data))] ^= 1 << rng.integers(8)
        elif mut == 1:
            data = data[: rng.integers(2, len(data))]
        else:
            data += bytes(rng.integers(0, 256, rng.integers(1, 20)).tolist())
        try:
            out = _decode_jpeg(bytes(data))
            assert out.dtype == np.uint8 and out.ndim == 3
        except ValueError:
            pass


def test_spark_decode_image_stats_jpeg(spark):
    """decode_image_stats over JPEG blobs: closed-form stats for
    block-constant gray fixtures; malformed rows NULL."""
    from cherry_pipelines_spark.operators.multimodal import decode_image_stats

    rng = np.random.default_rng(7)
    rows, expect = [], {}
    for mid in range(6):
        g = _block_gray(rng, 1 + mid % 3, 2 + mid % 2)
        blob = _encode_jpeg(np.stack([g, g, g], axis=2))
        rows.append((mid, bytearray(blob)))
        flat = np.stack([g, g, g], axis=2).reshape(-1).astype(np.int64)
        expect[mid] = (
            "jpeg", g.shape[1], g.shape[0],
            int(flat.sum()), int(flat.min()), int(flat.max()),
        )
    rows.append((99, bytearray(b"\xff\xd8broken")))
    df = spark.createDataFrame(rows, "media_id long, blob binary")
    got = {
        r["media_id"]: (
            r["format"], r["width"], r["height"],
            r["px_sum"], r["px_min"], r["px_max"],
        )
        for r in decode_image_stats(df).collect()
    }
    for mid, exp in expect.items():
        assert got[mid] == exp, mid
    assert got[99] == (None, None, None, None, None, None)


def test_spark_resize_jpeg_roundtrip(spark):
    """resize_image on JPEG: decode → subsample → re-encode as JPEG;
    16×16-block-constant input stays 8×8-block-constant after factor-2
    subsampling, so the re-encoded blob decodes exactly."""
    from cherry_pipelines_spark.operators.multimodal import (
        decode_image_stats,
        resize_image,
    )

    rng = np.random.default_rng(8)
    vals = rng.integers(0, 256, (2, 3), dtype=np.uint8)
    g = np.repeat(np.repeat(vals, 16, axis=0), 16, axis=1)  # 32x48
    blob = _encode_jpeg(np.stack([g, g, g], axis=2))
    df = spark.createDataFrame([(1, bytearray(blob))], "media_id long, blob binary")
    rz = resize_image(df, factor=2)
    row = rz.collect()[0]
    assert (row["width_in"], row["height_in"]) == (48, 32)
    assert (row["width_out"], row["height_out"]) == (24, 16)
    stats = decode_image_stats(
        rz.select("media_id", rz["blob_out"].alias("blob"))
    ).collect()[0]
    small = g[::2, ::2]
    flat = np.stack([small] * 3, axis=2).reshape(-1).astype(np.int64)
    assert (stats["format"], stats["px_sum"]) == ("jpeg", int(flat.sum()))
    assert (stats["px_min"], stats["px_max"]) == (
        int(flat.min()), int(flat.max()),
    )


def test_restart_markers_decoded():
    """A stream WITH a DRI interval and RSTn markers between MCUs must
    decode identically — predictors reset per interval.  Built by
    re-encoding each MCU row as its own entropy interval."""
    # encode normally, then re-assemble with DRI=3 (MCUs per row = 3)
    # by re-encoding with restart support via the public encoder is not
    # exposed; instead verify the decoder path with a hand-built stream:
    # two intervals each holding 3 MCU of a 24x16 gray image
    rng = np.random.default_rng(9)
    vals = rng.integers(0, 256, (2, 3), dtype=np.uint8)
    g = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)  # 16x24, 6 MCUs
    base = _encode_jpeg(g)
    # split the entropy stream at the natural MCU-row boundary by
    # re-encoding the two halves independently (fresh DC predictors =
    # exactly the RST contract), then splicing with DRI + RST0
    top = _encode_jpeg(g[:8, :])
    bot = _encode_jpeg(g[8:, :])

    def entropy(blob: bytes) -> bytes:
        i = blob.find(b"\xff\xda")
        ln = int.from_bytes(blob[i + 2 : i + 4], "big")
        return blob[i + 2 + ln : -2]

    i = base.find(b"\xff\xda")
    dri = b"\xff\xdd\x00\x04\x00\x03"  # restart every 3 MCUs
    ln = int.from_bytes(base[i + 2 : i + 4], "big")
    spliced = (
        base[:i] + dri + base[i : i + 2 + ln]
        + entropy(top) + b"\xff\xd0" + entropy(bot) + b"\xff\xd9"
    )
    out = _decode_jpeg(spliced)
    assert np.array_equal(out[:, :, 0], g)


def test_subsampled_420_decode():
    """4:2:0 stream (Y 2x2, Cb/Cr 1x1): hand-built from the encoder's
    primitives — one MCU = 4 Y blocks + 1 Cb + 1 Cr — exercising the
    decoder's sampling-factor MCU walk and nearest-neighbor upsample,
    which the 4:4:4 encoder never emits.  Constant gray input: every
    block DC-only, chroma exactly 128 → bit-exact output."""
    import struct

    from cherry_pipelines_spark.operators.jpeg import (
        _ENC_AC_BITS,
        _ENC_AC_VALS,
        _ENC_DC_BITS,
        _ENC_DC_VALS,
        _BitWriter,
        _canonical_codes,
        _category,
    )

    v = 77  # constant gray level
    h = w = 16  # one 4:2:0 MCU
    dc_codes = _canonical_codes(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_codes = _canonical_codes(_ENC_AC_BITS, _ENC_AC_VALS)
    bw_ = _BitWriter()

    def put_block(dc_diff):
        size = _category(dc_diff)
        code, ln = dc_codes[size]
        bw_.put(code, ln)
        if size:
            bw_.put(dc_diff if dc_diff >= 0 else dc_diff + (1 << size) - 1, size)
        code, ln = ac_codes[0x00]  # EOB
        bw_.put(code, ln)

    # Y: 4 blocks, DC = 8*(v-128) then diffs of 0; Cb/Cr: DC = 0 (=128)
    put_block(8 * (v - 128))
    for _ in range(3):
        put_block(0)
    put_block(0)  # Cb
    put_block(0)  # Cr
    entropy = bw_.flush()

    def seg(marker, payload):
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    blob = (
        b"\xff\xd8"
        + seg(0xFFDB, bytes([0x00]) + bytes([1] * 64))
        + seg(
            0xFFC0,
            struct.pack(">BHHB", 8, h, w, 3)
            + struct.pack(">BBB", 1, 0x22, 0)   # Y 2x2
            + struct.pack(">BBB", 2, 0x11, 0)   # Cb 1x1
            + struct.pack(">BBB", 3, 0x11, 0),  # Cr 1x1
        )
        + seg(
            0xFFC4,
            bytes([0x00]) + bytes(_ENC_DC_BITS) + bytes(_ENC_DC_VALS)
            + bytes([0x10]) + bytes(_ENC_AC_BITS) + bytes(_ENC_AC_VALS),
        )
        + seg(
            0xFFDA,
            bytes([3])
            + struct.pack(">BB", 1, 0x00)
            + struct.pack(">BB", 2, 0x00)
            + struct.pack(">BB", 3, 0x00)
            + bytes([0, 63, 0]),
        )
        + entropy
        + b"\xff\xd9"
    )
    out = _decode_jpeg(blob)
    assert out.shape == (16, 16, 3)
    assert np.array_equal(out, np.full((16, 16, 3), v, dtype=np.uint8))


def test_encoder_huffman_table_covers_worst_case_coefficients():
    """The encoder's uniform AC table covers sizes 1..10 and the DC
    table categories 0..11.  Adversarial proof that no uint8 input can
    escape them: for every DCT basis (u, v), the block that MAXIMIZES
    |coeff(u, v)| (pixels saturated to the basis sign) must encode
    without a table miss and keep |AC| < 1024 (size 10) — measured max
    is 1020.  A miss would KeyError at encode time."""
    from cherry_pipelines_spark.operators.jpeg import _C

    worst = 0.0
    for u in range(8):
        for v in range(8):
            basis = np.outer(_C[u], _C[v])
            block = np.where(basis >= 0, 255, 0).astype(np.uint8)
            _decode_jpeg(_encode_jpeg(np.tile(block, (2, 2))))  # no raise
            coeffs = _C @ (block.astype(float) - 128.0) @ _C.T
            ac = np.abs(coeffs).copy()
            ac[0, 0] = 0.0
            worst = max(worst, float(ac.max()))
    assert worst < 1024.0  # AC size <= 10


def test_subsampled_422_decode_and_bad_ratio_rejected():
    """4:2:2 (Y 2x1, chroma 1x1): MCU = 2 Y blocks + Cb + Cr, chroma
    upsampled horizontally only.  Constant gray → bit-exact.  A
    non-integer factor mix (Y 3x1 with Cb 2x1) must be REJECTED, not
    silently mis-upsampled."""
    import struct

    from cherry_pipelines_spark.operators.jpeg import (
        _ENC_AC_BITS,
        _ENC_AC_VALS,
        _ENC_DC_BITS,
        _ENC_DC_VALS,
        _BitWriter,
        _canonical_codes,
        _category,
    )

    v = 163
    h, w = 8, 16  # one 4:2:2 MCU
    dc_codes = _canonical_codes(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_codes = _canonical_codes(_ENC_AC_BITS, _ENC_AC_VALS)
    bw_ = _BitWriter()

    def put_block(dc_diff):
        size = _category(dc_diff)
        code, ln = dc_codes[size]
        bw_.put(code, ln)
        if size:
            bw_.put(dc_diff if dc_diff >= 0 else dc_diff + (1 << size) - 1, size)
        code, ln = ac_codes[0x00]
        bw_.put(code, ln)

    put_block(8 * (v - 128))  # Y block 1
    put_block(0)              # Y block 2 (diff 0)
    put_block(0)              # Cb
    put_block(0)              # Cr
    entropy = bw_.flush()

    def seg(marker, payload):
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    def frame(y_sampling, cb_sampling):
        return (
            b"\xff\xd8"
            + seg(0xFFDB, bytes([0x00]) + bytes([1] * 64))
            + seg(
                0xFFC0,
                struct.pack(">BHHB", 8, h, w, 3)
                + struct.pack(">BBB", 1, y_sampling, 0)
                + struct.pack(">BBB", 2, cb_sampling, 0)
                + struct.pack(">BBB", 3, 0x11, 0),
            )
            + seg(
                0xFFC4,
                bytes([0x00]) + bytes(_ENC_DC_BITS) + bytes(_ENC_DC_VALS)
                + bytes([0x10]) + bytes(_ENC_AC_BITS) + bytes(_ENC_AC_VALS),
            )
            + seg(
                0xFFDA,
                bytes([3])
                + struct.pack(">BB", 1, 0x00)
                + struct.pack(">BB", 2, 0x00)
                + struct.pack(">BB", 3, 0x00)
                + bytes([0, 63, 0]),
            )
            + entropy
            + b"\xff\xd9"
        )

    out = _decode_jpeg(frame(0x21, 0x11))  # Y 2x1: valid 4:2:2
    assert out.shape == (8, 16, 3)
    assert np.array_equal(out, np.full((8, 16, 3), v, dtype=np.uint8))

    with pytest.raises(ValueError, match="sampling"):
        _decode_jpeg(frame(0x31, 0x21))  # Y 3x1, Cb 2x1: 3/2 ratio


def test_sql_built_fixture_stream_decodes_to_walk():
    """Regression guard for the `multimodal_decode_jpeg` driver query:
    the SQL-expressible stream construction (uniform-length DHT pair,
    all-ones DQT, grayscale SOF0, 2-byte-per-block entropy coding of a
    +/-1 DC walk) must decode to exactly the walk's block-constant
    plane.  Mirrors the query's hex assembly in pure Python so a codec
    or table change that would break the driver oracle fails here in
    milliseconds instead of at the sf0.01 gate."""
    ac_vals = [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 11)]
    header = (
        "FFD8"
        + "FFDB0043" + "00" + "01" * 64
        + "{sof}"
        + "FFC4001F00"
        + "".join(f"{b:02X}" for b in [0, 0, 0, 12] + [0] * 12)
        + "".join(f"{v:02X}" for v in range(12))
        + "FFC400B510"
        + "".join(f"{b:02X}" for b in [0] * 7 + [len(ac_vals)] + [0] * 8)
        + "".join(f"{v:02X}" for v in ac_vals)
        + "FFDA00080101" + "00003F00"
    )
    for doc_id in (0, 1, 2, 3, 17, 4999):
        bw, bh = doc_id % 3 + 1, doc_id % 2 + 1
        steps = [
            1 if ((doc_id * 31 + b * 17) % 5) % 2 == 0 else -1
            for b in range(bw * bh)
        ]
        sof = "FFC0000B08" + f"{bh * 8:04X}" + f"{bw * 8:04X}" + "01011100"
        ent = "".join("4800" if d == 1 else "4700" for d in steps)
        blob = bytes.fromhex(header.format(sof=sof) + ent + "FFD9")
        pix = _decode_jpeg(blob)
        vals = np.cumsum(steps) + 128
        exp = np.zeros((bh * 8, bw * 8), dtype=np.int64)
        for b, val in enumerate(vals):
            my, mx = divmod(b, bw)
            exp[my * 8 : (my + 1) * 8, mx * 8 : (mx + 1) * 8] = val
        assert (pix.astype(np.int64) == np.stack([exp] * 3, axis=2)).all(), doc_id
