"""Baseline JPEG codec in pure numpy + stdlib — no external codec.

Removes the library's last image-format stand-in (SCALE.md disclosed
JPEG as "needs an external codec" through round 7): ``_decode_jpeg``
parses real ITU T.81 baseline streams — marker segments, DQT/DHT table
slots, interleaved MCU entropy data with byte unstuffing and RSTn
restart handling, canonical Huffman decode, dequantize, 2-D IDCT,
sampling-factor upsample, YCbCr→RGB — and ``_encode_jpeg`` emits
spec-valid baseline 4:4:4 (or grayscale) streams any standard decoder
can read.  Both sides derive their Huffman codecs from the SAME
BITS/HUFFVAL representation a DHT segment carries, so the pair is
consistent by construction rather than by constant-table transcription.

Scope (disclosed): baseline sequential DCT, 8-bit precision, Huffman
entropy coding.  Progressive (SOF2), arithmetic coding, 12-bit, and
hierarchical streams raise ``ValueError`` — which the multimodal
operators surface as NULL stats rows (allow_decode_fail posture).
Upsampling of subsampled chroma (4:2:0 / 4:2:2) is nearest-neighbor
(T.81 leaves the filter unspecified).

Throughput: the entropy loop is per-symbol Python behind a one-probe
8-bit Huffman lookup — ~1 s for a WORST-CASE 256×256×3 max-entropy
image (every AC populated at quant=1); typical quantized photos carry
far fewer symbols.  The codec is the correctness reference; for bulk
media, ``multimodal._decode_blob`` routes JPEG through PIL whenever
the worker carries it (wired, with this codec as the fallback and
parity reference) — the Spark-side plumbing is identical either way.

Exactness contract used by the tests: with the all-ones quant table an
8×8-block-constant plane is DC-only, and DCT/IDCT round-trip it
bit-exactly (DC = 8·s is exact in float64, and the reconstruction
8s/8 = s rounds back exactly); gray pixels (R=G=B) convert to
(Y, 128, 128) and back losslessly, so block-constant gray images
round-trip EXACTLY through the full codec — the same closed-form-oracle
trick the PPM/PNG fixtures use.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan: position k in the scan -> raster index in the 8x8 block
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# 2-D DCT-II basis with JPEG normalization: F = C @ X @ C.T
_C = np.zeros((8, 8))
for _u in range(8):
    _cu = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _C[_u, _x] = 0.5 * _cu * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


# ---------------------------------------------------------------------
# Huffman tables in the DHT wire representation: BITS (count of codes
# per length 1..16) + HUFFVAL (symbols in code order).  The encoder
# uses simple uniform-length canonical tables — valid Huffman tables
# any decoder accepts; the decoder builds its codec from whatever the
# file's DHT carries.
# ---------------------------------------------------------------------

# DC: 12 categories (0..11), all 4-bit codes (Kraft 12/16 < 1)
_ENC_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_ENC_DC_VALS = list(range(12))
# AC: EOB, ZRL and (run 0..15, size 1..10), all 8-bit codes
# (Kraft 162/256 < 1)
_ENC_AC_VALS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
_ENC_AC_BITS = [0, 0, 0, 0, 0, 0, 0, len(_ENC_AC_VALS), 0, 0, 0, 0, 0, 0, 0, 0]


def _canonical_codes(bits: list[int], vals: list[int]):
    """BITS/HUFFVAL -> {symbol: (code, length)} (T.81 C.2 assignment)."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]):
    """BITS/HUFFVAL -> (fast8, slow): ``fast8`` maps the next 8 bits to
    ``(symbol, code_length)`` for codes ≤ 8 bits (one table probe per
    symbol — covers every code the library's own encoder emits and the
    bulk of standard Annex-K codes); ``slow`` is the exact
    {(length, code): symbol} map the bit-by-bit fallback walks for
    longer codes."""
    slow = {
        (ln, code): sym
        for sym, (code, ln) in _canonical_codes(bits, vals).items()
    }
    fast8: list = [None] * 256
    for (ln, code), sym in slow.items():
        if ln <= 8:
            base = code << (8 - ln)
            for suffix in range(1 << (8 - ln)):
                fast8[base | suffix] = (sym, ln)
    return fast8, slow


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            self.put(0x7F, 8 - self.n)  # pad with 1s per spec
        return bytes(self.out)


_POW8 = 1 << np.arange(7, -1, -1)


class _BitReader:
    """Reads the unstuffed entropy stream MSB-first."""

    def __init__(self, buf: bytes) -> None:
        self.bits = np.unpackbits(np.frombuffer(buf, np.uint8))
        self.pos = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.bits):
            raise ValueError("jpeg: entropy stream exhausted")
        b = int(self.bits[self.pos])
        self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.pos + n > len(self.bits):
            raise ValueError("jpeg: entropy stream exhausted")
        v = int(
            self.bits[self.pos : self.pos + n]
            .dot(1 << np.arange(n - 1, -1, -1))
        )
        self.pos += n
        return v

    def read_symbol(self, table) -> int:
        fast8, slow = table
        # single-probe fast path: peek 8 bits (zero-padded near the
        # end — padding bits only matter if the true code is longer
        # than what remains, which the slow path rejects anyway)
        avail = len(self.bits) - self.pos
        if avail >= 8:
            peek = int(
                self.bits[self.pos : self.pos + 8].dot(_POW8)
            )
            hit = fast8[peek]
            if hit is not None:
                self.pos += hit[1]
                return hit[0]
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = slow.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("jpeg: invalid huffman code")


def _extend(v: int, size: int) -> int:
    """T.81 F.12: map `size` raw bits to the signed coefficient."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


# ---------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------


def _rgb_to_ycbcr(pix: np.ndarray) -> np.ndarray:
    r = pix[:, :, 0].astype(np.float64)
    g = pix[:, :, 1].astype(np.float64)
    b = pix[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    out = np.stack([y, cb, cr], axis=2)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    y = y.astype(np.float64)
    cbf = cb.astype(np.float64) - 128.0
    crf = cr.astype(np.float64) - 128.0
    r = y + 1.402 * crf
    g = y - 0.344136286 * cbf - 0.714136286 * crf
    b = y + 1.772 * cbf
    out = np.stack([r, g, b], axis=2)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def _plane_blocks(plane: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Pad a (h, w) plane to 8-multiples by edge replication and return
    (n_blocks, 8, 8) float blocks in raster order + block-grid dims."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    p = np.pad(plane, ((0, ph), (0, pw)), mode="edge").astype(np.float64)
    bh, bw = p.shape[0] // 8, p.shape[1] // 8
    blocks = (
        p.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(bh * bw, 8, 8)
    )
    return blocks, bh, bw


def _encode_jpeg(pix: np.ndarray) -> bytes:
    """Encode (h, w) or (h, w, 1|3) uint8 pixels as a baseline JPEG
    (4:4:4, all-ones quant table, uniform-length Huffman tables)."""
    if pix.ndim == 2:
        pix = pix[:, :, None]
    h, w, nc = pix.shape
    if nc not in (1, 3):
        raise ValueError("jpeg: 1 or 3 channels required")
    if h < 1 or w < 1 or h > 65535 or w > 65535:
        raise ValueError("jpeg: bad dimensions")
    planes = (
        [pix[:, :, 0]]
        if nc == 1
        else [p.squeeze(2) for p in np.dsplit(_rgb_to_ycbcr(pix), 3)]
    )

    dc_codes = _canonical_codes(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_codes = _canonical_codes(_ENC_AC_BITS, _ENC_AC_VALS)

    # quantized zigzag coefficients per component, blocks in raster order
    comp_zz = []
    for plane in planes:
        blocks, _, _ = _plane_blocks(plane)
        coeffs = np.einsum("ux,nxy,vy->nuv", _C, blocks - 128.0, _C)
        q = np.round(coeffs).astype(np.int64)  # all-ones quant table
        comp_zz.append(q.reshape(-1, 64)[:, ZIGZAG])

    bw_ = _BitWriter()
    prev_dc = [0] * nc
    n_blocks = comp_zz[0].shape[0]
    for bi in range(n_blocks):  # 4:4:4 MCU = one block per component
        for ci in range(nc):
            zz = comp_zz[ci][bi]
            diff = int(zz[0]) - prev_dc[ci]
            prev_dc[ci] = int(zz[0])
            size = _category(diff)
            code, ln = dc_codes[size]
            bw_.put(code, ln)
            if size:
                bw_.put(diff if diff >= 0 else diff + (1 << size) - 1, size)
            run = 0
            last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
            for k in range(1, 64):
                v = int(zz[k])
                if k > last_nz:
                    code, ln = ac_codes[0x00]  # EOB
                    bw_.put(code, ln)
                    break
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = ac_codes[0xF0]  # ZRL
                    bw_.put(code, ln)
                    run -= 16
                size = _category(v)
                code, ln = ac_codes[(run << 4) | size]
                bw_.put(code, ln)
                bw_.put(v if v >= 0 else v + (1 << size) - 1, size)
                run = 0
    entropy = bw_.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    dqt = seg(0xFFDB, bytes([0x00]) + bytes([1] * 64))
    sof = seg(
        0xFFC0,
        struct.pack(">BHHB", 8, h, w, nc)
        + b"".join(struct.pack(">BBB", i + 1, 0x11, 0) for i in range(nc)),
    )
    dht = seg(
        0xFFC4,
        bytes([0x00]) + bytes(_ENC_DC_BITS) + bytes(_ENC_DC_VALS)
        + bytes([0x10]) + bytes(_ENC_AC_BITS) + bytes(_ENC_AC_VALS),
    )
    sos = seg(
        0xFFDA,
        bytes([nc])
        + b"".join(struct.pack(">BB", i + 1, 0x00) for i in range(nc))
        + bytes([0, 63, 0]),
    )
    return b"\xff\xd8" + dqt + sof + dht + sos + entropy + b"\xff\xd9"


# ---------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------


def _decode_jpeg(blob: bytes) -> np.ndarray:
    """Decode a baseline JPEG to (h, w, 3) RGB (grayscale replicated).
    Raises ValueError on non-baseline or malformed streams."""
    if blob[:2] != b"\xff\xd8":
        raise ValueError("jpeg: missing SOI")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> decode table
    comps: list[tuple[int, int, int, int]] = []  # (id, hi, vi, tq)
    h = w = 0
    restart_interval = 0
    scan = None
    while pos + 4 <= len(blob):
        if blob[pos] != 0xFF:
            raise ValueError("jpeg: expected marker")
        marker = blob[pos + 1]
        if marker == 0xFF:  # fill byte padding before a marker
            pos += 1
            continue
        if marker == 0xD9:  # EOI before SOS
            break
        ln = struct.unpack(">H", blob[pos + 2 : pos + 4])[0]
        payload = blob[pos + 4 : pos + 2 + ln]
        if len(payload) != ln - 2:
            raise ValueError("jpeg: truncated segment")
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0x0F
                if pq != 0:
                    raise ValueError("jpeg: 16-bit quant tables unsupported")
                tab = np.frombuffer(
                    payload[p + 1 : p + 65], np.uint8
                ).astype(np.int64)
                if len(tab) != 64:
                    raise ValueError("jpeg: short quant table")
                qt[tq] = tab
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0x0F
                bits = list(payload[p + 1 : p + 17])
                n = sum(bits)
                vals = list(payload[p + 17 : p + 17 + n])
                if len(bits) != 16 or len(vals) != n:
                    raise ValueError("jpeg: short huffman table")
                huff[(tc, th)] = _decode_table(bits, vals)
                p += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # baseline / ext sequential
            prec, h, w, nc = struct.unpack(">BHHB", payload[:6])
            if prec != 8:
                raise ValueError("jpeg: only 8-bit precision supported")
            comps = [
                (payload[6 + 3 * i], payload[7 + 3 * i] >> 4,
                 payload[7 + 3 * i] & 0x0F, payload[8 + 3 * i])
                for i in range(nc)
            ]
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError("jpeg: only baseline sequential supported")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", payload[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = payload[0]
            scan = [
                (payload[1 + 2 * i], payload[2 + 2 * i] >> 4,
                 payload[2 + 2 * i] & 0x0F)
                for i in range(ns)
            ]
            pos = pos + 2 + ln
            break
        # APPn / COM / others: skip
        pos = pos + 2 + ln
    if scan is None or not comps or h == 0 or w == 0:
        raise ValueError("jpeg: missing SOS/SOF")

    # entropy-coded data: collect until EOI, unstuffing FF00 and
    # splitting on RSTn
    intervals: list[bytes] = []
    cur = bytearray()
    while pos < len(blob):
        b = blob[pos]
        if b != 0xFF:
            cur.append(b)
            pos += 1
            continue
        nxt = blob[pos + 1] if pos + 1 < len(blob) else None
        if nxt == 0x00:
            cur.append(0xFF)
            pos += 2
        elif nxt is not None and 0xD0 <= nxt <= 0xD7:
            intervals.append(bytes(cur))
            cur = bytearray()
            pos += 2
        elif nxt == 0xD9:
            break
        else:
            raise ValueError("jpeg: unexpected marker in entropy data")
    intervals.append(bytes(cur))

    by_id = {c[0]: c for c in comps}
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    for _cid, hi, vi, _tq in comps:
        if hi < 1 or vi < 1 or hmax % hi or vmax % vi:
            # T.81 permits e.g. (3,2) factor mixes, but integer-ratio
            # upsampling can't reconstruct them — reject rather than
            # emit silently misaligned planes
            raise ValueError("jpeg: non-integer sampling ratio unsupported")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    n_mcu = mcux * mcuy

    # per-component block planes (padded to the MCU grid)
    planes = {
        cid: np.zeros((mcuy * vi * 8, mcux * hi * 8), dtype=np.float64)
        for cid, hi, vi, _tq in comps
    }
    pred = {cid: 0 for cid, *_ in comps}
    it = iter(intervals)
    reader = _BitReader(next(it))
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            reader = _BitReader(next(it, b""))
            pred = {cid: 0 for cid, *_ in comps}
        my, mx = divmod(m, mcux)
        for cid, td, ta in scan:
            if cid not in by_id:
                raise ValueError("jpeg: scan component not in frame")
            _, hi, vi, tq = by_id[cid]
            dc_tab, ac_tab = huff.get((0, td)), huff.get((1, ta))
            if dc_tab is None or ac_tab is None or tq not in qt:
                raise ValueError("jpeg: missing table")
            for by in range(vi):
                for bx in range(hi):
                    zz = np.zeros(64, dtype=np.int64)
                    size = reader.read_symbol(dc_tab)
                    pred[cid] += _extend(reader.read_bits(size), size)
                    zz[0] = pred[cid]
                    k = 1
                    while k < 64:
                        sym = reader.read_symbol(ac_tab)
                        if sym == 0x00:  # EOB
                            break
                        run, sz = sym >> 4, sym & 0x0F
                        if sz == 0:
                            if run != 15:
                                raise ValueError("jpeg: bad AC symbol")
                            k += 16  # ZRL
                            continue
                        k += run
                        if k > 63:
                            raise ValueError("jpeg: AC index overflow")
                        zz[k] = _extend(reader.read_bits(sz), sz)
                        k += 1
                    # DQT entries are stored in zigzag order, same as
                    # the decoded coefficients — dequantize in zigzag,
                    # then scatter to raster
                    block = np.zeros(64, dtype=np.float64)
                    block[ZIGZAG] = (zz * qt[tq]).astype(np.float64)
                    px = _C.T @ block.reshape(8, 8) @ _C + 128.0
                    y0 = (my * vi + by) * 8
                    x0 = (mx * hi + bx) * 8
                    planes[cid][y0 : y0 + 8, x0 : x0 + 8] = px

    out_planes = []
    for cid, hi, vi, _tq in comps:
        p = np.clip(np.round(planes[cid]), 0, 255).astype(np.uint8)
        if hi < hmax or vi < vmax:  # nearest-neighbor upsample
            p = np.repeat(np.repeat(p, vmax // vi, axis=0), hmax // hi, axis=1)
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        g = out_planes[0]
        return np.stack([g, g, g], axis=2)
    if len(out_planes) != 3:
        raise ValueError("jpeg: unsupported component count")
    return _ycbcr_to_rgb(*out_planes)
