"""Unit tests: table_diff, triangle_count, WAV/PCM decode."""

from __future__ import annotations

import struct

from pyspark.sql import functions as F

from cherry_pipelines_spark.operators.diff import diff_summary, table_diff
from cherry_pipelines_spark.operators.graph import triangle_count


# ----------------------------------------------------------- table_diff


def _frames(spark):
    old = spark.createDataFrame(
        [(1, 10.0, "a"), (2, 20.0, "b"), (3, None, "c"), (4, 40.0, "d")],
        "k long, price double, status string",
    )
    new = spark.createDataFrame(
        [(1, 10.0, "a"), (2, 25.0, "B"), (3, None, "c"), (5, 50.0, "e")],
        "k long, price double, status string",
    )
    return old, new


def test_table_diff_statuses_and_changed_cols(spark):
    old, new = _frames(spark)
    out = {r["k"]: r for r in table_diff(old, new, ["k"]).collect()}
    assert out[1]["status"] == "unchanged" and out[1]["changed_cols"] == []
    assert out[2]["status"] == "changed"
    assert out[2]["changed_cols"] == ["price", "status"]
    # NULL == NULL is unchanged (null-safe compare)
    assert out[3]["status"] == "unchanged"
    assert out[4]["status"] == "removed" and out[5]["status"] == "added"


def test_table_diff_null_to_value_is_changed(spark):
    old = spark.createDataFrame([(1, None)], "k long, v string")
    new = spark.createDataFrame([(1, "x")], "k long, v string")
    r = table_diff(old, new, ["k"]).collect()[0]
    assert r["status"] == "changed" and r["changed_cols"] == ["v"]


def test_diff_summary_counts(spark):
    old, new = _frames(spark)
    s = {r["status"]: r["n"] for r in diff_summary(table_diff(old, new, ["k"])).collect()}
    assert s == {"unchanged": 2, "changed": 1, "removed": 1, "added": 1}


# ------------------------------------------------------- triangle_count


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_triangle_count_k4(spark):
    # K4: every vertex is in C(3,2) = 3 triangles
    pairs = [(a, b) for a in range(4) for b in range(4) if a < b]
    out = {r["node"]: r["triangles"] for r in triangle_count(_edges(spark, pairs)).collect()}
    assert out == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangle_count_path_and_dups(spark):
    # path graph has no triangles; duplicate/reversed/self edges ignored
    pairs = [(0, 1), (1, 0), (1, 2), (2, 3), (3, 3), (2, 3)]
    out = {r["node"]: r["triangles"] for r in triangle_count(_edges(spark, pairs)).collect()}
    assert out == {0: 0, 1: 0, 2: 0, 3: 0}


def test_triangle_one_closed_one_open(spark):
    pairs = [(1, 2), (2, 3), (1, 3), (3, 4)]
    out = {r["node"]: r["triangles"] for r in triangle_count(_edges(spark, pairs)).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 0}


# ------------------------------------------------------------ WAV decode


def _wav(rate=8000, samples=(0, 1000, -1000, 32767, -32768), channels=1):
    data = b"".join(struct.pack("<h", s) for s in samples)
    hdr = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, channels, rate, rate * 2 * channels,
                                 2 * channels, 16)
        + b"data" + struct.pack("<I", len(data))
    )
    return hdr + data


def test_wav_kernel_roundtrip():
    from cherry_pipelines_spark.operators.multimodal import _decode_wav

    rate, ch, s = _decode_wav(_wav())
    assert rate == 8000 and ch == 1
    assert list(s) == [0, 1000, -1000, 32767, -32768]


def test_wav_kernel_rejects_malformed():
    import pytest

    from cherry_pipelines_spark.operators.multimodal import _decode_wav

    with pytest.raises(ValueError):
        _decode_wav(b"RIFFxxxxWAVE")
    bad = bytearray(_wav())
    bad[20] = 2  # audio_format=2 (ADPCM -> codec required)
    with pytest.raises(ValueError):
        _decode_wav(bytes(bad))


def test_decode_audio_stats_operator(spark):
    from cherry_pipelines_spark.operators.multimodal import decode_audio_stats

    rows = [(1, bytearray(_wav())), (2, bytearray(b"not audio"))]
    df = spark.createDataFrame(rows, "media_id long, blob binary")
    out = {r["media_id"]: r for r in decode_audio_stats(df).collect()}
    r1 = out[1]
    assert r1["sample_rate"] == 8000 and r1["n_samples"] == 5
    assert r1["sum_sq"] == 0 + 2 * 1000**2 + 32767**2 + 32768**2
    assert r1["peak"] == 32768
    assert out[2]["sample_rate"] is None  # allow_decode_fail posture
