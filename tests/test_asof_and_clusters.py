"""Unit tests for the as-of join (union+window plan) and the
connected-components duplicate clustering, on hand-computed fixtures."""

from __future__ import annotations

from pyspark.sql import functions as F

from cherry_pipelines_spark.operators.asof import asof_join
from cherry_pipelines_spark.operators.dedup import duplicate_clusters


def _asof_frames(spark):
    left = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "a", 5), (4, "b", 100), (5, "c", 50)],
        "event_id long, k string, ts long",
    )
    right = spark.createDataFrame(
        [("a", 10, 1.0), ("a", 15, 2.0), ("b", 99, 3.0)],
        "k string, ts long, px double",
    )
    return left, right


def test_asof_backward_with_exact_match(spark):
    left, right = _asof_frames(spark)
    out = {r["event_id"]: r["px"] for r in asof_join(left, right, "ts", by=("k",)).collect()}
    # event 1 at ts=10 matches the quote AT ts=10 (exact match allowed)
    assert out == {1: 1.0, 2: 2.0, 3: None, 4: 3.0, 5: None}


def test_asof_strict_inequality(spark):
    left, right = _asof_frames(spark)
    out = {
        r["event_id"]: r["px"]
        for r in asof_join(
            left, right, "ts", by=("k",), allow_exact_match=False
        ).collect()
    }
    # event 1 at ts=10 must now skip the ts=10 quote → no earlier one
    assert out == {1: None, 2: 2.0, 3: None, 4: 3.0, 5: None}


def test_asof_rejects_column_collision(spark):
    left, right = _asof_frames(spark)
    try:
        asof_join(left, right.withColumnRenamed("px", "k2"), "ts", by=("k",), value_cols=("ts",))
    except ValueError as e:
        assert "collide" in str(e)
    else:
        raise AssertionError("expected ValueError")


def test_asof_plan_has_no_join(spark):
    import contextlib, io

    left, right = _asof_frames(spark)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        asof_join(left, right, "ts", by=("k",)).explain("formatted")
    plan = buf.getvalue()
    assert "Join" not in plan  # union + window, never a range join
    assert "Window" in plan


def test_duplicate_clusters_transitive(spark):
    # chain 1-2-3 plus isolated 4 and pair 5-6: min-label must propagate
    # transitively (3 reaches 1 only through 2)
    docs = spark.createDataFrame([(i,) for i in (1, 2, 3, 4, 5, 6)], "doc_id long")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "doc_a long, doc_b long"
    )
    out = {r["doc_id"]: r["cluster_id"] for r in duplicate_clusters(docs, pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 5}


def test_duplicate_clusters_long_chain(spark):
    # a path graph needs several propagation rounds
    n = 12
    docs = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    out = duplicate_clusters(docs, pairs)
    assert out.filter(F.col("cluster_id") != 0).count() == 0


def test_interval_join_inner_and_left(spark):
    from cherry_pipelines_spark.operators.ranges import interval_join

    points = spark.createDataFrame(
        [(1, 5), (2, 10), (3, 99)], "point_id long, p long"
    )
    intervals = spark.createDataFrame(
        [(100, 0, 7), (200, 5, 12), (300, 40, 45)], "iv_id long, s long, e long"
    )
    # closed bounds: p=5 hits [0,7] and [5,12]; p=10 hits [5,12]; p=99 none
    inner = interval_join(points, intervals, "p", "s", "e", bucket_width=4)
    got = sorted((r["point_id"], r["iv_id"]) for r in inner.collect())
    assert got == [(1, 100), (1, 200), (2, 200)]

    left = interval_join(points, intervals, "p", "s", "e", bucket_width=4, how="left")
    rows = sorted((r["point_id"], r["iv_id"]) for r in left.collect())
    assert rows == [(1, 100), (1, 200), (2, 200), (3, None)]


def test_interval_join_no_nested_loop_plan(spark):
    from cherry_pipelines_spark.operators.ranges import interval_join
    from cherry_pipelines_spark.plans import explain_str

    points = spark.range(1000).select(F.col("id").alias("pid"), (F.col("id") % 500).alias("p"))
    iv = spark.range(100).select(
        F.col("id").alias("ivid"),
        (F.col("id") * 7 % 400).alias("s"),
        (F.col("id") * 7 % 400 + 20).alias("e"),
    )
    plan = explain_str(interval_join(points, iv, "p", "s", "e", bucket_width=16))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_interval_join_randomized_vs_bruteforce(spark):
    """200 random points x 40 random intervals (negative values and
    bucket-boundary hits included): bucket expansion must agree exactly
    with the brute-force BETWEEN evaluation."""
    import random

    from cherry_pipelines_spark.operators.ranges import interval_join

    rng = random.Random(1234)
    pts = [(i, rng.randint(-500, 500)) for i in range(200)]
    ivs = []
    for j in range(40):
        s = rng.randint(-520, 480)
        ivs.append((j, s, s + rng.randint(0, 130)))
    expect = sorted(
        (pid, ivid)
        for pid, p in pts
        for ivid, s, e in ivs
        if s <= p <= e
    )
    pdf = spark.createDataFrame(pts, "pid long, p long")
    idf = spark.createDataFrame(ivs, "ivid long, s long, e long")
    for width in (1, 7, 64, 1000):
        got = sorted(
            (r["pid"], r["ivid"])
            for r in interval_join(pdf, idf, "p", "s", "e", bucket_width=width).collect()
        )
        assert got == expect, f"width={width}"


def test_asof_value_cols_come_from_one_right_row(spark):
    # the newest matching right row has px=NULL: standard as-of (pandas
    # merge_asof / DuckDB ASOF) keeps that NULL — it must NOT be
    # back-filled from the older row while qty comes from the newer one
    left = spark.createDataFrame([(1, "a", 20)], "event_id long, k string, ts long")
    right = spark.createDataFrame(
        [("a", 10, 1.0, 100), ("a", 15, None, 200)],
        "k string, ts long, px double, qty long",
    )
    row = asof_join(left, right, "ts", by=("k",)).collect()[0]
    assert row["qty"] == 200
    assert row["px"] is None  # newest row's NULL, not 1.0 from ts=10


def test_duplicate_clusters_warns_on_non_convergence(spark):
    import warnings as w

    n = 8  # path graph of diameter 7 cannot converge in 2 rounds
    docs = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    with w.catch_warnings(record=True) as caught:
        w.simplefilter("always")
        duplicate_clusters(docs, pairs, max_iterations=2).collect()
    assert any("did not converge" in str(c.message) for c in caught)


def test_interval_join_left_null_point_column_not_duplicated(spark):
    from cherry_pipelines_spark.operators.ranges import interval_join

    # point 1 matches an interval but carries a NULL payload column: the
    # left-mode anti-join must be null-safe or the row is emitted twice
    points = spark.createDataFrame(
        [(1, 5, None), (3, 99, "x")], "point_id long, p long, payload string"
    )
    intervals = spark.createDataFrame(
        [(100, 0, 7)], "iv_id long, s long, e long"
    )
    out = interval_join(points, intervals, "p", "s", "e", bucket_width=4, how="left")
    rows = sorted((r["point_id"], r["iv_id"]) for r in out.collect())
    assert rows == [(1, 100), (3, None)]


def test_asof_directions_match_pandas(spark):
    """Differential oracle: every (direction, allow_exact_match) combo
    must match pandas merge_asof on data with duplicate timestamps,
    NULL values in matched rows, and keys with no match at all."""
    import pandas as pd
    from cherry_pipelines_spark.operators.asof import asof_join

    left_rows = [
        ("a", 10), ("a", 15), ("a", 20), ("a", 3),
        ("b", 7), ("b", 100),
        ("c", 50),  # key with no right rows
    ]
    right_rows = [
        ("a", 5, 1.0), ("a", 10, None), ("a", 15, 3.0), ("a", 30, 4.0),
        ("b", 7, 5.0), ("b", 90, None), ("b", 110, 7.0),
    ]
    lpdf = pd.DataFrame(left_rows, columns=["k", "ts"]).sort_values("ts")
    rpdf = pd.DataFrame(right_rows, columns=["k", "ts", "v"]).sort_values("ts")
    ldf = spark.createDataFrame(left_rows, "k string, ts long")
    rdf = spark.createDataFrame(right_rows, "k string, ts long, v double")

    for direction in ("backward", "forward", "nearest"):
        for exact in (True, False):
            exp = pd.merge_asof(
                lpdf, rpdf, on="ts", by="k",
                direction=direction, allow_exact_matches=exact,
            )
            expected = {
                (r.k, r.ts): (None if pd.isna(r.v) else r.v)
                for r in exp.itertuples()
            }
            got = {
                (r["k"], r["ts"]): r["v"]
                for r in asof_join(
                    ldf, rdf, "ts", by=["k"],
                    direction=direction, allow_exact_match=exact,
                ).collect()
            }
            assert got == expected, (direction, exact, got, expected)


def test_overlap_join_matches_naive(spark):
    """Bucketed overlap join must equal the naive theta-join on random
    intervals, with no duplicate pairs from shared buckets."""
    from cherry_pipelines_spark.operators.ranges import overlap_join

    left = spark.range(0, 120).select(
        F.col("id").alias("lid"),
        ((F.col("id") * 37) % 500).alias("ls"),
        (((F.col("id") * 37) % 500) + (F.col("id") * 13) % 90).alias("le"),
    )
    right = spark.range(0, 90).select(
        F.col("id").alias("rid"),
        ((F.col("id") * 53) % 500).alias("rs"),
        (((F.col("id") * 53) % 500) + (F.col("id") * 7) % 140).alias("re"),
    )
    naive = left.crossJoin(right).filter(
        (F.col("ls") <= F.col("re")) & (F.col("rs") <= F.col("le"))
    )
    expected = sorted((r["lid"], r["rid"]) for r in naive.collect())
    got = sorted(
        (r["lid"], r["rid"])
        for r in overlap_join(left, right, "ls", "le", "rs", "re", 32).collect()
    )
    assert got == expected and len(got) > 100

    # left mode keeps matchless intervals with NULL right columns
    lonely = spark.createDataFrame([(999, 10_000, 10_005)], "lid long, ls long, le long")
    out = overlap_join(
        left.unionByName(lonely), right, "ls", "le", "rs", "re", 32, how="left"
    )
    rows = {r["lid"]: r for r in out.collect() if r["lid"] == 999}
    assert rows[999]["rid"] is None
    assert out.count() == len(expected) + 1
