"""Z-order layout keys and incrementally-maintained rollups."""

from __future__ import annotations

from pyspark.sql import functions as F

from cherry_pipelines_spark.engine.rollup import IncrementalRollup
from cherry_pipelines_spark.operators.zorder import zorder_key, zorder_write_layout


def _interleave2(x: int, y: int, bits: int = 16) -> int:
    out = 0
    for b in range(bits - 1, -1, -1):
        out = (out << 1) | ((x >> b) & 1)
        out = (out << 1) | ((y >> b) & 1)
    return out


def test_zorder_key_matches_reference_interleave(spark):
    rows = [(0, 0), (1, 0), (0, 1), (5, 3), (65535, 65535), (12345, 54321)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.withColumn("z", zorder_key(["x", "y"])).collect()
    }
    for x, y in rows:
        # spread(x) holds even bit positions, y's bits sit above — the
        # per-bit model interleaves (x_b, y_b) pairs MSB-first
        assert got[(x, y)] == _interleave2(y, x), (x, y)


def test_zorder_key_3dim_and_validation(spark):
    import pytest

    df = spark.createDataFrame([(1, 2, 3)], "a long, b long, c long")
    (row,) = df.withColumn("z", zorder_key(["a", "b", "c"], bits=4)).collect()
    ref = 0
    for b in range(3, -1, -1):
        for v in (1, 2, 3):
            ref = (ref << 1) | ((v >> b) & 1)
    assert row["z"] == ref
    with pytest.raises(ValueError):
        zorder_key(["a"])
    with pytest.raises(ValueError):
        zorder_key(["a", "b", "c"], bits=22)


def test_zorder_layout_preserves_rows(spark):
    df = spark.range(0, 1000).select(
        (F.col("id") % 97).alias("a"), (F.col("id") * 31 % 89).alias("b"),
        F.col("id"),
    )
    out = zorder_write_layout(df, ["a", "b"], bits=8)
    assert out.count() == 1000
    assert {r["id"] for r in out.collect()} == set(range(1000))


def test_incremental_rollup_equals_full_recompute(spark, tmp_path):
    path = str(tmp_path / "rollup")
    r = IncrementalRollup(
        spark,
        path,
        ["k"],
        {
            "n": ("count", "v"),
            "total": ("sum", "v"),
            "lo": ("min", "v"),
            "hi": ("max", "v"),
        },
    )
    b1 = spark.createDataFrame([("a", 1), ("a", 5), ("b", 2)], "k string, v long")
    b2 = spark.createDataFrame([("a", 3), ("c", 7)], "k string, v long")
    r.apply(b1)
    state = {row["k"]: row for row in r.apply(b2).collect()}
    full = {
        row["k"]: row
        for row in b1.unionByName(b2)
        .groupBy("k")
        .agg(
            F.count("v").alias("n"),
            F.sum("v").alias("total"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        .collect()
    }
    assert set(state) == set(full) == {"a", "b", "c"}
    for k in full:
        for c in ("n", "total", "lo", "hi"):
            assert state[k][c] == full[k][c], (k, c)
    # empty batch is a no-op
    empty = spark.createDataFrame([], "k string, v long")
    state2 = {row["k"]: row for row in r.apply(empty).collect()}
    assert {k: (v["n"], v["total"]) for k, v in state2.items()} == {
        k: (v["n"], v["total"]) for k, v in state.items()
    }


def test_incremental_rollup_rejects_non_decomposable(spark, tmp_path):
    import pytest

    with pytest.raises(ValueError):
        IncrementalRollup(spark, str(tmp_path / "x"), ["k"], {"m": ("avg", "v")})


def test_streaming_foreachbatch_maintains_rollup(spark, tmp_path):
    """The incremental rollup composes with Structured Streaming: a
    foreachBatch sink folds every micro-batch into the stored state,
    and the final state equals one aggregation over all data seen."""
    from pyspark.sql import types as T

    src = tmp_path / "stream_src"
    src.mkdir()
    schema = T.StructType(
        [T.StructField("k", T.StringType()), T.StructField("v", T.LongType())]
    )
    b1 = spark.createDataFrame([("a", 1), ("b", 2)], schema)
    b2 = spark.createDataFrame([("a", 4), ("c", 8)], schema)
    b1.write.mode("overwrite").parquet(str(src / "f1"))

    r = IncrementalRollup(
        spark, str(tmp_path / "state"), ["k"],
        {"n": ("count", "v"), "total": ("sum", "v")},
    )
    stream = spark.readStream.schema(schema).option(
        "recursiveFileLookup", "true"
    ).parquet(str(src))
    q = (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(lambda df, _id: r.apply(df) and None)
        .start()
    )
    try:
        q.processAllAvailable()
        b2.write.mode("overwrite").parquet(str(src / "f2"))
        q.processAllAvailable()
    finally:
        q.stop()
    state = {row["k"]: (row["n"], row["total"]) for row in r.read().collect()}
    assert state == {"a": (2, 5), "b": (1, 2), "c": (1, 8)}


def test_zorder_layout_narrows_per_file_ranges(spark, tmp_path):
    """The point of the z-layout: after a z-ordered write, EVERY file's
    min/max range is narrow on BOTH dimensions, so parquet stats prune
    scans filtered on either column.  A (a, b)-sorted write only
    narrows the leading column."""
    import pyarrow.parquet as pq
    import glob

    n = 20_000
    df = spark.range(0, n).select(
        (F.col("id") * 2654435761 % 256).alias("a"),
        (F.col("id") * 40503 % 256).alias("b"),
    )

    def per_file_span(path, col):
        spans = []
        for f in glob.glob(path + "/*.parquet"):
            md = pq.read_metadata(f)
            names = md.schema.to_arrow_schema().names
            idx = names.index(col)
            lo, hi = None, None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            spans.append(hi - lo)
        return sum(spans) / len(spans)

    plain = str(tmp_path / "plain")
    df.repartitionByRange(8, "a").sortWithinPartitions("a").write.parquet(plain)
    zed = str(tmp_path / "zed")
    zorder_write_layout(df, ["a", "b"], bits=8, num_files=8).write.parquet(zed)

    # the a-sorted layout leaves b unclustered: each file spans ~the full
    # 0..255 domain on b; the z-layout must do far better on b while
    # keeping a far better than unclustered
    assert per_file_span(plain, "b") > 200
    assert per_file_span(zed, "b") < per_file_span(plain, "b") / 2
    assert per_file_span(zed, "a") < 200


def test_zorder_2dim_low_bits_matches_general(spark):
    """bits<16 on the 2-dim fast path must mask inputs to the requested
    bits, matching the general per-bit interleave (inputs exceed 2^bits
    on purpose)."""
    rows = [(300, 7), (255, 256), (511, 511), (1000, 999)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.withColumn("z", zorder_key(["x", "y"], bits=8)).collect()
    }
    for x, y in rows:
        assert got[(x, y)] == _interleave2(y & 0xFF, x & 0xFF, 8), (x, y)


def _fs_rename(spark, src: str, dst: str) -> None:
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(src)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    assert fs.rename(p, jvm.org.apache.hadoop.fs.Path(dst))


def test_rollup_crash_between_renames_recovers(spark, tmp_path):
    """Simulate a crash between rename(dst->old) and rename(tmp->dst):
    dst is gone, old holds the previous state.  read()/apply() must
    restore old instead of silently treating the rollup as empty."""
    path = str(tmp_path / "state")
    r = IncrementalRollup(
        spark, path, ["k"], {"n": ("count", "v"), "total": ("sum", "v")}
    )
    b1 = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v long")
    r.apply(b1)
    # crash window: dst renamed away, new state never swapped in
    _fs_rename(spark, path, path + "._rollup_old")
    state = {row["k"]: (row["n"], row["total"]) for row in r.read().collect()}
    assert state == {"a": (1, 1), "b": (1, 2)}
    # and the interrupted batch re-applies cleanly on top
    b2 = spark.createDataFrame([("a", 4)], "k string, v long")
    state2 = {row["k"]: (row["n"], row["total"]) for row in r.apply(b2).collect()}
    assert state2 == {"a": (2, 5), "b": (1, 2)}


def test_rollup_empty_state_schema(spark, tmp_path):
    """Pre-first-apply read() honors the declared schema so it unions
    against later state without type mismatches."""
    path = str(tmp_path / "state")
    ddl = "k string, n bigint, total decimal(18,6)"
    r = IncrementalRollup(
        spark, path, ["k"], {"n": ("count", "v"), "total": ("sum", "v")},
        empty_schema=ddl,
    )
    empty = r.read()
    assert [f.dataType.simpleString() for f in empty.schema.fields] == [
        "string", "bigint", "decimal(18,6)"
    ]
    b1 = spark.createDataFrame(
        [("a", "1.5")], "k string, raw string"
    ).select("k", F.col("raw").cast("decimal(18,6)").alias("v"))
    merged = empty.unionByName(r.apply(b1))
    assert merged.count() == 1


# --- rowgroup_stats / pruning_report ----------------------------------------


def test_rowgroup_stats_match_pyarrow_footers(spark, tmp_path):
    from cherry_pipelines_spark.operators.zorder import rowgroup_stats

    out = str(tmp_path / "rg")
    (
        spark.range(1, 1001)
        .select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
        .repartitionByRange(4, "k")
        .sortWithinPartitions("k")
        .write.parquet(out)
    )
    got = {
        (r["file"], r["row_group"]): (r["n_rows"], r["stat_min"], r["stat_max"])
        for r in rowgroup_stats(spark, out, "k").collect()
    }
    import os

    import pyarrow.parquet as pq

    exp = {}
    for f in os.listdir(out):
        if not f.endswith(".parquet"):
            continue
        p = os.path.join(out, f)
        md = pq.ParquetFile(p).metadata
        ci = md.schema.names.index("k")
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            st = g.column(ci).statistics
            exp[(p, rg)] = (g.num_rows, int(st.min), int(st.max))
    assert got == exp
    # 4 range partitions -> disjoint fences covering 1..1000
    assert sum(n for n, _, _ in got.values()) == 1000


def test_pruning_report_clustered_beats_shuffled(spark, tmp_path):
    """The audit shows the VALUE of clustering: a range-clustered
    layout skips most row groups for a narrow predicate, a hash-shuffled
    layout of the same data skips none (every file spans the key
    space)."""
    from cherry_pipelines_spark.operators.zorder import (
        pruning_report,
        rowgroup_stats,
    )

    base = spark.range(1, 4001).select(F.col("id").alias("k"))
    clustered, shuffled = str(tmp_path / "c"), str(tmp_path / "s")
    base.repartitionByRange(8, "k").sortWithinPartitions("k").write.parquet(clustered)
    base.repartition(8, F.col("k")).write.parquet(shuffled)
    rc = pruning_report(rowgroup_stats(spark, clustered, "k"), 100, 300).collect()[0]
    rs = pruning_report(rowgroup_stats(spark, shuffled, "k"), 100, 300).collect()[0]
    assert rc["rows_total"] == rs["rows_total"] == 4000
    assert rc["n_skipped"] >= 6  # narrow slice hits at most 2 of 8 fences
    assert rs["n_skipped"] == 0  # hash layout: every file spans 1..4000
    assert rc["rows_skipped"] > rs["rows_skipped"]


def test_rowgroup_stats_validation(spark, tmp_path):
    import pytest

    from cherry_pipelines_spark.operators.zorder import rowgroup_stats

    empty = tmp_path / "none"
    empty.mkdir()
    with pytest.raises(ValueError):
        rowgroup_stats(spark, str(empty), "k")
