"""Unit tests for fuzzy record linkage, correlation matrix, and
group trend lines."""

from __future__ import annotations

import itertools
import random

import pytest
from pyspark.sql import functions as F

from cherry_pipelines_spark.operators.linkage import fuzzy_pairs
from cherry_pipelines_spark.operators.stats import correlation_matrix, group_trend


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


# ------------------------------------------------------------- fuzzy


def test_fuzzy_pairs_edit_kinds(spark):
    rows = [
        (1, "warehouse"),
        (2, "warehuose"),  # transposition = 2 edits -> NOT matched
        (3, "warehouses"),  # insertion -> 1
        (4, "warehous"),  # deletion -> 1
        (5, "warehouse"),  # exact duplicate -> 0
        (6, "carehouse"),  # substitution -> 1
        (7, "unrelated"),
    ]
    df = spark.createDataFrame(rows, "id long, name string")
    got = {(r.a_id, r.b_id): r.edit_dist for r in fuzzy_pairs(df, "name", "id").collect()}
    assert got[(1, 3)] == 1 and got[(1, 4)] == 1 and got[(1, 6)] == 1
    assert got[(1, 5)] == 0
    assert (1, 2) not in got  # two substitutions away
    assert not any(7 in p for p in got)


def test_fuzzy_pairs_complete_vs_bruteforce(spark):
    rnd = random.Random(3)
    alphabet = "abcd"
    names = list({"".join(rnd.choices(alphabet, k=rnd.randint(3, 6))) for _ in range(60)})
    rows = [(i, n) for i, n in enumerate(names)]
    df = spark.createDataFrame(rows, "id long, name string")
    got = {(r.a_id, r.b_id) for r in fuzzy_pairs(df, "name", "id").collect()}
    want = {
        (i, j)
        for (i, a), (j, b) in itertools.combinations(rows, 2)
        if _lev(a, b) <= 1
    }
    assert got == want  # the symmetric-delete cover is complete AND tight


# ------------------------------------------------------ correlations


def test_correlation_matrix_matches_numpy(spark):
    import numpy as np

    rnd = random.Random(5)
    xs = [rnd.uniform(0, 10) for _ in range(200)]
    ys = [x * 2 + rnd.uniform(-1, 1) for x in xs]
    zs = [rnd.uniform(0, 1) for _ in range(200)]
    df = spark.createDataFrame(list(zip(xs, ys, zs)), "x double, y double, z double")
    got = {
        (r.col_a, r.col_b): r.corr
        for r in correlation_matrix(df, ["x", "y", "z"]).collect()
    }
    arr = np.array([xs, ys, zs])
    want = np.corrcoef(arr)
    assert got[("x", "y")] == pytest.approx(round(float(want[0, 1]), 6), abs=2e-6)
    assert got[("x", "z")] == pytest.approx(round(float(want[0, 2]), 6), abs=2e-6)
    assert got[("y", "z")] == pytest.approx(round(float(want[1, 2]), 6), abs=2e-6)
    assert set(got) == {("x", "y"), ("x", "z"), ("y", "z")}  # sorted upper triangle


# ------------------------------------------------------------ trends


def test_group_trend_recovers_line(spark):
    rows = [("g", x, 3.0 * x + 7.0) for x in range(50)]
    df = spark.createDataFrame(rows, "grp string, x long, y double")
    r = group_trend(df, ["grp"], "x", "y").collect()[0]
    assert r.slope == pytest.approx(3.0, abs=1e-9)
    assert r.intercept == pytest.approx(7.0, abs=1e-6)
    assert r.n == 50


def test_group_trend_matches_polyfit_with_noise(spark):
    import numpy as np

    rnd = random.Random(11)
    xs = list(range(200))
    ys = [0.5 * x - 20 + rnd.uniform(-5, 5) for x in xs]
    df = spark.createDataFrame(
        [("g", x, y) for x, y in zip(xs, ys)], "grp string, x long, y double"
    )
    r = group_trend(df, ["grp"], "x", "y").collect()[0]
    slope, intercept = np.polyfit(np.array(xs, dtype=float), np.array(ys), 1)
    assert r.slope == pytest.approx(float(slope), abs=1e-6)
    assert r.intercept == pytest.approx(float(intercept), abs=1e-4)


def test_group_trend_constant_x_null_slope(spark):
    df = spark.createDataFrame(
        [("g", 5, 1.0), ("g", 5, 2.0)], "grp string, x long, y double"
    )
    r = group_trend(df, ["grp"], "x", "y").collect()[0]
    assert r.slope is None and r.intercept is None and r.n == 2
