"""Keyed parquet upsert (ReplacingMergeTree-style latest-per-key):
merge semantics, idempotent re-delivery, crash-window recovery, and the
one-shuffle plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cherry_pipelines_spark.sinks.upsert import UpsertTable


def _t(spark, tmp_path):
    return UpsertTable(
        spark, str(tmp_path / "tbl"), key_cols=["k"], version_col="ver"
    )


def _rows(df):
    return {r["k"]: (r["ver"], r["val"]) for r in df.collect()}


def test_upsert_merge_semantics(spark, tmp_path):
    t = _t(spark, tmp_path)
    b1 = spark.createDataFrame(
        [("a", 1, "a1"), ("b", 1, "b1")], "k string, ver long, val string"
    )
    assert _rows(t.apply(b1)) == {"a": (1, "a1"), "b": (1, "b1")}
    b2 = spark.createDataFrame(
        [("a", 2, "a2"),   # higher version: replaces
         ("b", 0, "b0"),   # lower version: ignored
         ("c", 1, "c1")],  # new key: appended
        "k string, ver long, val string",
    )
    assert _rows(t.apply(b2)) == {"a": (2, "a2"), "b": (1, "b1"), "c": (1, "c1")}
    # equal-version re-delivery keeps the stored row (strict no-op)
    b3 = spark.createDataFrame(
        [("a", 2, "a2-redelivered")], "k string, ver long, val string"
    )
    assert _rows(t.apply(b3))["a"] == (2, "a2")
    # re-applying a whole past batch is idempotent
    assert _rows(t.apply(b2)) == {"a": (2, "a2"), "b": (1, "b1"), "c": (1, "c1")}


def test_upsert_crash_between_renames_recovers(spark, tmp_path):
    t = _t(spark, tmp_path)
    b1 = spark.createDataFrame([("a", 1, "a1")], "k string, ver long, val string")
    t.apply(b1)
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(t.path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    assert fs.rename(p, jvm.org.apache.hadoop.fs.Path(t.path + "._upsert_old"))
    # crash window: dst missing, old holds the table — reads recover it
    assert _rows(t.read()) == {"a": (1, "a1")}
    b2 = spark.createDataFrame([("a", 2, "a2")], "k string, ver long, val string")
    assert _rows(t.apply(b2)) == {"a": (2, "a2")}


def test_upsert_validation_and_plan(spark, tmp_path):
    with pytest.raises(ValueError):
        UpsertTable(spark, str(tmp_path / "x"), [], "ver")
    t = _t(spark, tmp_path)
    with pytest.raises(FileNotFoundError):
        t.read()
    b = spark.createDataFrame([("a", 1, "v")], "k string, ver long, val string")
    with pytest.raises(ValueError):
        t.apply(b.drop("ver"))
    t.apply(b)
    # merge plan: one hash aggregate over the union — no join, no sort
    plan = t._merged(b)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "max_by" in plan or "HashAggregate" in plan
