"""Unit tests for dataset_split, the data-contract validator, and the
JL random projection."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from cherry_pipelines_spark.operators.quality import contract_report, rule_violations
from cherry_pipelines_spark.operators.sampling import dataset_split
from cherry_pipelines_spark.operators.similarity import _srp_weights, rp_project


def _h32(s: str) -> int:
    return int(hashlib.sha256(s.encode()).hexdigest()[:8], 16)


# ------------------------------------------------------------- split


def test_dataset_split_matches_hash_bands(spark):
    df = spark.createDataFrame([(i,) for i in range(500)], "id long")
    out = dataset_split(df, F.col("id"), {"train": 0.8, "val": 0.1, "test": 0.1})
    got = {r.id: r.split for r in out.collect()}
    for i in range(500):
        b = _h32(str(i)) % 10_000
        want = "test" if b < 1000 else ("train" if b < 9000 else "val")
        assert got[i] == want, (i, b)


def test_dataset_split_deterministic_under_layout(spark):
    df = spark.createDataFrame([(i,) for i in range(300)], "id long")
    a = {r.id: r.split for r in dataset_split(df, F.col("id"), {"train": 0.5}).collect()}
    b = {
        r.id: r.split
        for r in dataset_split(df.repartition(7), F.col("id"), {"train": 0.5}).collect()
    }
    assert a == b
    # remainder rows are the explicit NULL holdout
    assert any(v is None for v in a.values())


def test_dataset_split_fractions_validated(spark):
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError):
        dataset_split(df, F.col("id"), {"a": 0.7, "b": 0.5})
    with pytest.raises(ValueError):
        dataset_split(df, F.col("id"), {"a": -0.1})


# ----------------------------------------------------------- contract


def test_contract_report_counts_and_null_posture(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, -1.0), (3, None), (4, 5.0)], "id long, v double"
    )
    rep = {
        r.rule: (r.n_violations, r.n_rows)
        for r in contract_report(df, {"v_positive": F.col("v") > 0}).collect()
    }
    # -1 fails, NULL counts as a violation (contracts are allowlists)
    assert rep == {"v_positive": (2, 4)}


def test_rule_violations_long_form(spark):
    df = spark.createDataFrame(
        [(1, 10.0, "a"), (2, -1.0, "zz"), (3, 4.0, "a")],
        "id long, v double, tag string",
    )
    out = rule_violations(
        df,
        {"v_positive": F.col("v") > 0, "tag_short": F.length("tag") <= 1},
        id_cols=["id"],
    )
    got = {(r.id, r.rule) for r in out.collect()}
    assert got == {(2, "v_positive"), (2, "tag_short")}


def test_contract_nullable_tolerant_rule_spelled_explicitly(spark):
    df = spark.createDataFrame([(1, None), (2, -3.0)], "id long, v double")
    rep = {
        r.rule: r.n_violations
        for r in contract_report(
            df, {"v_pos_or_null": F.col("v").isNull() | (F.col("v") > 0)}
        ).collect()
    }
    assert rep == {"v_pos_or_null": 1}  # only the -3


# ---------------------------------------------------------------- JL


def test_rp_project_matches_python(spark):
    vecs = [
        (1, [float(j % 5 - 2) for j in range(16)]),
        (2, [1.0] * 16),
        (3, [0.0] * 16),  # zero vector → zero projection
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    out = {r.vec_id: list(r.rp) for r in rp_project(df, 16, 4, seed=0).collect()}
    W = _srp_weights(4, 16, 0)
    inv = 1.0 / math.sqrt(4)
    for vid, v in vecs:
        amax = max(abs(x) for x in v)
        if amax == 0:
            assert out[vid] == [0.0] * 4
            continue
        s = round(amax / 127.0, 9)
        q = [round(x / s) for x in v]
        want = [round(sum(w * qi for w, qi in zip(W[p], q)) * s * inv, 9) for p in range(4)]
        assert out[vid] == pytest.approx(want, abs=1e-9), vid


def test_rp_project_preserves_relative_distances(spark):
    # JL sanity: a vector is closer to its near-copy than to an
    # unrelated vector, after projection
    import random

    rnd = random.Random(7)
    base = [rnd.uniform(-1, 1) for _ in range(64)]
    near = [x + rnd.uniform(-0.01, 0.01) for x in base]
    far = [rnd.uniform(-1, 1) for _ in range(64)]
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "vec_id long, embedding array<double>"
    )
    out = {r.vec_id: list(r.rp) for r in rp_project(df, 64, 16, seed=1).collect()}

    def d2(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    assert d2(out[1], out[2]) < d2(out[1], out[3])
