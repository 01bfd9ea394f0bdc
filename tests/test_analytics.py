"""Behavioral-analytics operators: SCD2 intervals, cohort retention,
sequential funnel, temperature mixing."""

from __future__ import annotations

from pyspark.sql import functions as F

from cherry_pipelines_spark.operators.analytics import (
    cohort_retention,
    funnel_conversion,
    scd2_intervals,
)
from cherry_pipelines_spark.operators.sampling import temperature_mix


def _ts(spark, rows, schema):
    return spark.createDataFrame(rows, schema).withColumn(
        "ts", F.timestamp_seconds("secs")
    )


def test_scd2_runs_merge_and_intervals(spark):
    # user 1: A(10) A(20) B(30) B(40) A(50) -> runs A[10,30) B[30,50) A[50,)
    # user 2: single observation -> one open run
    df = _ts(
        spark,
        [
            (1, "A", 10),
            (1, "A", 20),
            (1, "B", 30),
            (1, "B", 40),
            (1, "A", 50),
            (2, "X", 5),
        ],
        "user long, state string, secs long",
    )
    out = scd2_intervals(df, "user", ["state"], "ts")
    got = sorted(
        (
            r["user"],
            r["state"],
            int(r["valid_from"].timestamp()),
            None if r["valid_to"] is None else int(r["valid_to"].timestamp()),
        )
        for r in out.collect()
    )
    assert got == [
        (1, "A", 10, 30),
        (1, "A", 50, None),
        (1, "B", 30, 50),
        (2, "X", 5, None),
    ]


def test_scd2_null_attr_and_multi_attr(spark):
    # NULL->NULL is NOT a change (eqNullSafe); NULL->value is
    df = spark.createDataFrame(
        [
            (1, None, "p", 10),
            (1, None, "p", 20),
            (1, "v", "p", 30),
            (1, "v", "q", 40),
        ],
        "user long, a string, b string, secs long",
    ).withColumn("ts", F.timestamp_seconds("secs"))
    out = scd2_intervals(df, "user", ["a", "b"], "ts")
    starts = sorted(
        int(r["valid_from"].timestamp()) for r in out.collect()
    )
    assert starts == [10, 30, 40]


def test_cohort_retention_day(spark):
    day = 86400
    rows = [
        # user 1 first seen day0, active day0 + day2
        (1, 0),
        (1, 10),
        (1, 2 * day + 5),
        # user 2 first seen day0, active day0 only
        (2, 100),
        # user 3 first seen day2, active day2 + day3
        (3, 2 * day),
        (3, 3 * day),
    ]
    df = _ts(spark, rows, "user long, secs long")
    out = {
        (int(r["cohort"].timestamp()), r["bucket_offset"]): r["n_users"]
        for r in cohort_retention(df, "user", "ts", bucket="day").collect()
    }
    assert out == {
        (0, 0): 2,
        (0, 2): 1,
        (2 * day, 0): 1,
        (2 * day, 1): 1,
    }


def test_funnel_strict_sequence(spark):
    rows = [
        # user 1 completes all three in order
        (1, "view", 10),
        (1, "click", 20),
        (1, "purchase", 30),
        # user 2: click BEFORE first view -> stalls at view
        (2, "click", 10),
        (2, "view", 20),
        # user 3: view then purchase (no click) -> stalls at click... but a
        # later click then purchase completes: view(10) click(40) purchase(50)
        (3, "view", 10),
        (3, "purchase", 20),
        (3, "click", 40),
        (3, "purchase", 50),
        # user 4: never views
        (4, "purchase", 10),
    ]
    df = _ts(spark, rows, "user long, step string, secs long")
    out = {
        (r["step_index"], r["step"]): r["n_users"]
        for r in funnel_conversion(
            df, "user", "step", "ts", ["view", "click", "purchase"]
        ).collect()
    }
    assert out == {(1, "view"): 3, (2, "click"): 2, (3, "purchase"): 2}


def test_funnel_same_ts_not_counted(spark):
    # strict '>' — a step at exactly the prior step's time doesn't count
    df = _ts(
        spark,
        [(1, "view", 10), (1, "click", 10)],
        "user long, step string, secs long",
    )
    out = {
        r["step"]: r["n_users"]
        for r in funnel_conversion(
            df, "user", "step", "ts", ["view", "click"]
        ).collect()
    }
    assert out == {"view": 1, "click": 0}


def test_temperature_mix_rates_and_determinism(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kept = temperature_mix(docs, "lang", F.col("doc_id"), tau=0.5)
    before = {
        r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    after = {
        r["lang"]: r["n"] for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    n_min = min(before.values())
    for lang, n in before.items():
        expect = (n_min / n) ** 0.5 * n
        # hash gate at 1e-4 granularity: binomial-ish tolerance
        assert abs(after.get(lang, 0) - expect) <= max(5, 0.15 * expect), lang
    # smallest stratum keeps everything
    smallest = min(before, key=before.get)
    assert after[smallest] == before[smallest]
    # deterministic under repartitioning
    re = temperature_mix(docs.repartition(13), "lang", F.col("doc_id"), tau=0.5)
    a = sorted(r["doc_id"] for r in kept.select("doc_id").collect())
    b = sorted(r["doc_id"] for r in re.select("doc_id").collect())
    assert a == b


def test_temperature_tau_one_keeps_all(spark):
    df = spark.range(100).withColumn("g", (F.col("id") % 3).cast("string"))
    assert temperature_mix(df, "g", F.col("id"), tau=1.0).count() == 100
