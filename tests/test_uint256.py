"""Full-precision uint256 aggregation (functions/uint256.py).

Ground truth is Python's bignum int — every test builds raw 32-byte
big-endian words, runs the Spark path, and compares exact decimal
strings.  Covers the exactness frontier the Decimal(38,0) decode
policy NULLs out: values above 10^38, sums straddling 2^256, limb
carries, and NULL handling.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F
from pyspark.sql import types as T

from cherry_pipelines_spark.functions.uint256 import (
    uint256_limbs,
    uint256_sum,
    uint256_to_string,
)

_SCHEMA = T.StructType(
    [
        T.StructField("g", T.StringType()),
        T.StructField("amount", T.BinaryType()),
    ]
)


def _word(v: int) -> bytes:
    return v.to_bytes(32, "big")


def _df(spark, rows):
    return spark.createDataFrame(
        [(g, None if v is None else _word(v)) for g, v in rows], _SCHEMA
    )


def test_limbs_exact_roundtrip(spark):
    vals = [0, 1, 2**64 - 1, 2**64, 2**128 + 7, 2**255, 2**256 - 1, 10**38]
    df = _df(spark, [("a", v) for v in vals]).select(
        "amount", *uint256_limbs(F.col("amount"))
    )
    for row in df.collect():
        v = int.from_bytes(bytes(row["amount"]), "big")
        got = sum(int(row[f"limb{i}"]) << (64 * i) for i in range(4))
        assert got == v


def test_sum_exceeds_decimal38(spark):
    """Sum of values each near 2^255 — far beyond both Decimal(38,0)
    and 2^256 — must still render exactly."""
    vals = [2**255 - 3, 2**255 - 1, 2**254 + 12345, 10**60 + 1]
    df = _df(spark, [("a", v) for v in vals])
    out = uint256_sum(df, "amount").collect()
    assert len(out) == 1
    assert out[0]["amount_sum"] == str(sum(vals))


def test_grouped_sum_matches_bignum(spark):
    rng = random.Random(42)
    rows = []
    truth: dict[str, int] = {}
    for i in range(500):
        g = f"g{i % 7}"
        v = rng.getrandbits(rng.choice([8, 63, 64, 130, 200, 256]))
        rows.append((g, v))
        truth[g] = truth.get(g, 0) + v
    out = uint256_sum(_df(spark, rows), "amount", group_cols=["g"]).collect()
    assert len(out) == 7
    for row in out:
        assert row["amount_sum"] == str(truth[row["g"]]), row["g"]


def test_limb_projection_consistent(spark):
    """keep_limbs exposes the SQL-checkable projection: the string must
    equal sum(limb_i * 2^(64i))."""
    rows = [("a", 2**200 + 5), ("a", 2**64 - 1), ("b", 7)]
    out = uint256_sum(_df(spark, rows), "amount", ["g"], keep_limbs=True).collect()
    for row in out:
        total = sum(int(row[f"amount_sum_limb{i}"]) << (64 * i) for i in range(4))
        assert str(total) == row["amount_sum"]


def test_nulls_follow_sum_semantics(spark):
    rows = [("a", 10**40), ("a", None), ("b", None)]
    out = {
        r["g"]: r["amount_sum"]
        for r in uint256_sum(_df(spark, rows), "amount", ["g"]).collect()
    }
    assert out["a"] == str(10**40)
    assert out["b"] is None


def test_short_words_left_padded(spark):
    df = spark.createDataFrame(
        [((255).to_bytes(1, "big"),), ((2**64 + 3).to_bytes(12, "big"),)],
        T.StructType([T.StructField("amount", T.BinaryType())]),
    )
    out = uint256_sum(df, "amount").collect()
    assert out[0]["amount_sum"] == str(255 + 2**64 + 3)


def test_to_string_exact(spark):
    vals = [0, 1, 10**38, 2**256 - 1, 2**255]
    df = _df(spark, [("a", v) for v in vals]).select(
        uint256_to_string(F.col("amount")).alias("s")
    )
    got = sorted(r["s"] for r in df.collect())
    assert got == sorted(str(v) for v in vals)


def test_plan_is_jvm_side_until_final_pass(spark):
    """The limb split and group-sum must be ordinary codegen'd
    hash-agg (no Python in the per-row path) — the only Arrow exchange
    is the per-group assembly."""
    df = _df(spark, [("a", 5), ("b", 6)])
    plan = uint256_sum(df, "amount", ["g"])._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") == 1
    assert "BatchEvalPython" not in plan


def test_accumulator_survives_many_max_limbs(spark):
    """Regression for the pre-cast fix: SUM over Decimal(20,0) inputs
    accumulates in Decimal(30,0), which a large count of 2^64-1 limbs
    can overflow to NULL under non-ANSI mode.  With the cast-before-sum
    the accumulator is Decimal(38,0).  5e10 rows is untestable locally;
    instead prove the aggregation plan's sum input type IS Decimal(38,0)
    and that a dense all-max-limb batch sums exactly."""
    n = 2000
    df = _df(spark, [("a", 2**256 - 1)] * n)
    out = uint256_sum(df, "amount").collect()
    assert out[0]["amount_sum"] == str((2**256 - 1) * n)
    plan = (
        uint256_sum(df, "amount", ["g"])
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # the sum's child expression carries the widened accumulator type
    assert "decimal(38,0)" in plan
    assert "sum(_l0" in plan or "sum(cast(_l0" in plan


def test_oversized_binary_yields_null_not_truncation(spark):
    """A >32-byte value must become NULL (skipped by SUM), never a
    silently hex-truncated wrong number."""
    df = spark.createDataFrame(
        [((1).to_bytes(33, "big"),), ((7).to_bytes(32, "big"),)],
        T.StructType([T.StructField("amount", T.BinaryType())]),
    )
    out = uint256_sum(df, "amount").collect()
    assert out[0]["amount_sum"] == "7"
    limbs = df.select(*uint256_limbs(F.col("amount"))).collect()
    by_null = sorted(tuple(r[f"limb{i}"] is None for i in range(4)) for r in limbs)
    assert by_null == [(False, False, False, False), (True, True, True, True)]
