"""Small-file compaction maintenance job (sinks/compact.py): rewrites
over-fragmented partitions at a target file count, preserving partition
values, row data, and the checkpoint watermark."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cherry_pipelines_spark.sinks.compact import compact_partitions
from cherry_pipelines_spark.sinks.parquet import BATCH_COL, ParquetSink


def _make_fragmented_table(spark, base):
    sink = ParquetSink(base_path=base, anchor_table="t", block_column="b")
    for start in (0, 100, 200):
        df = spark.range(start, start + 50).select(
            F.col("id").alias("b"), (F.col("id") * 2).alias("v")
        ).repartition(8)  # 8 tiny files per batch partition
        sink.write(spark, {"t": df}, start, start + 49)
    return sink


def test_compact_preserves_data_and_watermark(spark, tmp_path):
    base = str(tmp_path / "tbl")
    sink = _make_fragmented_table(spark, base)
    tpath = sink.table_path("t")
    before = spark.read.parquet(tpath)
    rows_before = sorted((r["b"], r["v"], r[BATCH_COL]) for r in before.collect())
    nb_before = sink.next_block(spark)

    rep = compact_partitions(spark, tpath, target_file_bytes=128 << 20)
    assert rep.partitions_seen == 3
    assert rep.partitions_compacted == 3       # 8 files >> 1 target each
    assert rep.files_before == 24 and rep.files_after == 3

    after = spark.read.parquet(tpath)
    rows_after = sorted((r["b"], r["v"], r[BATCH_COL]) for r in after.collect())
    assert rows_after == rows_before           # data + partition values intact
    assert sink.next_block(spark) == nb_before # watermark unchanged

    # physical file count actually dropped to 1 per partition
    for d in os.listdir(tpath):
        if d.startswith(BATCH_COL + "="):
            n = len([f for f in os.listdir(os.path.join(tpath, d))
                     if f.endswith(".parquet")])
            assert n == 1, (d, n)

    # idempotent: second run finds nothing to do
    rep2 = compact_partitions(spark, tpath, target_file_bytes=128 << 20)
    assert rep2.partitions_compacted == 0
    assert rep2.files_after == rep2.files_before == 3


def test_compact_respects_target_size(spark, tmp_path):
    base = str(tmp_path / "tbl2")
    sink = _make_fragmented_table(spark, base)
    tpath = sink.table_path("t")
    # a tiny target keeps multiple output files per partition
    rep = compact_partitions(spark, tpath, target_file_bytes=1200)
    assert rep.partitions_compacted >= 1
    for d in os.listdir(tpath):
        if d.startswith(BATCH_COL + "="):
            n = len([f for f in os.listdir(os.path.join(tpath, d))
                     if f.endswith(".parquet")])
            assert n >= 2  # sized out, not blindly coalesced to 1

    # replay-after-compaction: overwriting one batch partition still
    # replaces exactly that partition
    df = spark.range(100, 150).select(
        F.col("id").alias("b"), (F.col("id") * 3).alias("v")
    )
    sink.write(spark, {"t": df}, 100, 149)
    out = spark.read.parquet(tpath)
    assert out.count() == 150
    replayed = out.filter(F.col(BATCH_COL) == 100)
    assert all(r["v"] == r["b"] * 3 for r in replayed.collect())
