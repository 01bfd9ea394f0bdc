"""Optional PIL/Pillow bulk-media fast path (multimodal._decode_blob).

The pure-numpy codecs are the correctness reference; when the worker
environment carries Pillow, JPEG and PNG decode routes through it for
throughput (the pure JPEG entropy loop is per-symbol Python).  These
tests are green in BOTH environments:

* without PIL — the routing probe returns None and the dispatcher
  falls back to the pure codecs (asserted, not skipped);
* with PIL — every fixture decodes identically through both engines
  (parity), pinned by forcing the pure path via SPARK_GRAFT_NO_PIL and
  comparing.
"""

from __future__ import annotations

import numpy as np
import pytest

from cherry_pipelines_spark.operators.jpeg import _encode_jpeg
from cherry_pipelines_spark.operators.multimodal import (
    _decode_blob,
    _encode_png,
    _pil_available,
    _try_pil_decode,
)


def _has_pil() -> bool:
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def _fixture_blobs() -> dict[str, bytes]:
    """Deterministic fixture corpus spanning both codecs' exact modes:
    block-constant gray JPEG (bit-exact contract), grayscale JPEG,
    and filtered truecolor PNG (lossless by spec)."""
    rng = np.random.default_rng(7)
    gray_blocks = np.repeat(
        np.repeat(rng.integers(100, 156, (2, 3)).astype(np.uint8), 8, 0), 8, 1
    )
    gray_rgb = np.stack([gray_blocks] * 3, axis=2)
    photo = rng.integers(0, 256, (13, 17, 3)).astype(np.uint8)
    return {
        "jpeg_block_gray_rgb": _encode_jpeg(gray_rgb),
        "jpeg_block_gray_1ch": _encode_jpeg(gray_blocks),
        "png_truecolor": _encode_png(photo),
    }


def test_fallback_routing_without_pil(monkeypatch):
    """With PIL disabled (or absent), _decode_blob must still decode
    every fixture via the pure codecs — the probe returns None and the
    dispatcher falls through."""
    monkeypatch.setenv("SPARK_GRAFT_NO_PIL", "1")
    assert _pil_available() is False
    for name, blob in _fixture_blobs().items():
        assert _try_pil_decode(blob) is None, name
        fmt, pix = _decode_blob(blob)
        assert fmt in ("jpeg", "png"), name
        assert pix.ndim == 3 and pix.shape[2] == 3, name


def test_probe_is_none_when_pil_absent(monkeypatch):
    """In a PIL-less environment the probe must say so (this is the
    'green without PIL' half of the parity contract — the environment
    this repo develops in)."""
    monkeypatch.delenv("SPARK_GRAFT_NO_PIL", raising=False)
    if _has_pil():
        pytest.skip("PIL installed: covered by test_pil_parity_on_fixtures")
    assert _pil_available() is False
    for blob in _fixture_blobs().values():
        assert _try_pil_decode(blob) is None


@pytest.mark.skipif(not _has_pil(), reason="Pillow not installed")
def test_pil_parity_on_fixtures(monkeypatch):
    """With PIL present: both engines must agree on the fixture corpus.

    PNG is lossless by spec — bit-exact always.  The JPEG fixtures are
    the codec's exactness class (DC-only block-constant planes, where
    libjpeg's all-AC-zero short-circuit computes the same closed form)
    — bit-exact too.  Arbitrary photos may differ by +/-1 per pixel
    across IDCT implementations; that tolerance is documented on
    _try_pil_decode and deliberately NOT exercised here so the test is
    a hard equality."""
    blobs = _fixture_blobs()
    monkeypatch.setenv("SPARK_GRAFT_NO_PIL", "1")
    pure = {n: _decode_blob(b) for n, b in blobs.items()}
    monkeypatch.delenv("SPARK_GRAFT_NO_PIL")
    assert _pil_available() is True
    for name, blob in blobs.items():
        pil_pix = _try_pil_decode(blob)
        assert pil_pix is not None, name
        fmt, pure_pix = pure[name]
        assert pil_pix.shape == pure_pix.shape, name
        assert (pil_pix == pure_pix).all(), name
        fmt2, routed = _decode_blob(blob)
        assert fmt2 == fmt and (routed == pil_pix).all(), name


def test_pil_probe_rejects_garbage(monkeypatch):
    """The probe must return None (not raise) on undecodable bytes so
    the pure codec's error remains the authoritative one."""
    monkeypatch.delenv("SPARK_GRAFT_NO_PIL", raising=False)
    assert _try_pil_decode(b"\xff\xd8 not a real jpeg") is None
