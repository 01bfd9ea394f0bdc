"""Sketch operators: HyperLogLog cardinality, count-min heavy
hitters, and the span-level boilerplate scrub."""

from __future__ import annotations

from pyspark.sql import functions as F

from cherry_pipelines_spark.operators import dedup
from cherry_pipelines_spark.operators.sketches import (
    bloom_build,
    bloom_probe,
    countmin_heavy_hitters,
    countmin_sketch,
    hll_distinct,
    hll_registers,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------- HLL


def test_hll_estimate_within_expected_error(spark):
    # p=8 -> relative error ~1.04/sqrt(256) ~ 6.5%; allow 3 sigma
    df = spark.range(10_000).select(F.col("id").alias("k"))
    row = hll_distinct(df, F.col("k"), label="k").collect()[0]
    assert row["key"] == "k" and row["exact"] == 10_000
    assert abs(row["estimate"] - 10_000) / 10_000 < 0.20


def test_hll_registers_merge_across_shards(spark):
    # registers(a) union registers(b) folded with MAX == registers(a+b):
    # the mergeability that makes the sketch incremental at 100 TB
    a = spark.range(0, 3_000).select(F.col("id").alias("k"))
    b = spark.range(2_000, 6_000).select(F.col("id").alias("k"))
    whole = hll_registers(a.unionAll(b), F.col("k"))
    merged = (
        hll_registers(a, F.col("k"))
        .unionByName(hll_registers(b, F.col("k")))
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )
    assert sorted(map(tuple, whole.collect())) == sorted(map(tuple, merged.collect()))


def test_hll_insensitive_to_duplicates_and_layout(spark):
    base = spark.range(1_000).select(F.col("id").alias("k"))
    dup = base.unionAll(base).unionAll(base).repartition(7)
    e1 = hll_distinct(base, F.col("k")).collect()[0]["estimate"]
    e2 = hll_distinct(dup, F.col("k")).collect()[0]["estimate"]
    assert e1 == e2


# ---------------------------------------------------------- count-min


def test_countmin_never_underestimates_and_finds_all_hitters(spark):
    rows = [("hot",)] * 500 + [("warm",)] * 120 + [(f"t{i}",) for i in range(300)]
    tok = spark.createDataFrame(rows, "token string")
    out = {r["token"]: r for r in countmin_heavy_hitters(tok, min_count=100).collect()}
    # one-sided CMS guarantee: est >= exact, so no false negatives
    assert set(out) >= {"hot", "warm"}
    for r in out.values():
        assert r["est"] >= r["exact"]
    assert out["hot"]["exact"] == 500 and out["warm"]["exact"] == 120


def test_countmin_sketch_size_bounded_and_mergeable(spark):
    tok = spark.createDataFrame([(f"t{i % 37}",) for i in range(5_000)], "token string")
    sk = countmin_sketch(tok, d=4, w=64)
    assert sk.count() <= 4 * 64
    half1 = countmin_sketch(tok.limit(2_500), d=4, w=64)
    # SUM-merge of shard sketches == sketch of the union (same tokens)
    tot = sk.agg(F.sum("cnt")).collect()[0][0]
    assert tot == 4 * 5_000
    assert half1.agg(F.sum("cnt")).collect()[0][0] == 4 * 2_500


# --------------------------------------------------------- span scrub


def test_span_scrub_removes_cross_doc_spans_only(spark):
    boiler = "c o m m o n"  # 6 tokens, shared by 3 docs
    docs = _docs(
        spark,
        [
            (1, boiler + " u1 a b c d e"),
            (2, boiler + " u2 f g h i j"),
            (3, boiler + " u3 k l m n o"),
            (4, "solo w x y z q r"),
        ],
    )
    out = {r["doc_id"]: r for r in dedup.span_scrub(docs, n=6, max_docs=2).collect()}
    for d in (1, 2, 3):
        assert out[d]["n_removed"] == 1
        assert not out[d]["clean_text"].startswith(boiler)
    assert out[4]["n_removed"] == 0
    assert out[4]["clean_text"] == "solo w x y z q r"


def test_span_scrub_noop_reassembles_text_exactly(spark):
    docs = _docs(spark, [(1, " ".join(f"w{i}" for i in range(17)))])
    r = dedup.span_scrub(docs, n=6, max_docs=1).collect()[0]
    assert r["n_spans"] == 3 and r["n_removed"] == 0
    assert r["clean_text"] == " ".join(f"w{i}" for i in range(17))


def test_span_scrub_full_removal_yields_empty(spark):
    docs = _docs(spark, [(i, "a b c d e f") for i in range(1, 5)])
    for r in dedup.span_scrub(docs, n=6, max_docs=2).collect():
        assert r["n_removed"] == 1 and r["clean_text"] == ""


def test_boilerplate_spans_counts_distinct_docs(spark):
    # same span twice INSIDE one doc is not cross-doc boilerplate
    docs = _docs(spark, [(1, "a b c d e f a b c d e f"), (2, "z z z z z z")])
    assert dedup.boilerplate_spans(docs, n=6, max_docs=1).count() == 0


def test_histogram_sketch_bounded_and_mergeable(spark):
    from cherry_pipelines_spark.operators.sketches import histogram_sketch

    df = spark.range(10000).select((F.col("id") % 500).cast("double").alias("v"))
    sk = histogram_sketch(df, F.col("v"), lo=0.0, hi=500.0, bins=50)
    rows = sk.collect()
    assert len(rows) <= 50
    assert sum(r["n"] for r in rows) == 10000
    # shard-merge == whole: union of half-sketches, groupBy-SUM
    a = histogram_sketch(df.filter(F.col("v") < 250), F.col("v"), 0.0, 500.0, 50)
    b = histogram_sketch(df.filter(F.col("v") >= 250), F.col("v"), 0.0, 500.0, 50)
    merged = (
        a.unionByName(b).groupBy("bin").agg(F.sum("n").alias("n"))
    )
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, rows))


def test_histogram_quantiles_error_bound(spark):
    from cherry_pipelines_spark.operators.sketches import (
        histogram_quantiles,
        histogram_sketch,
    )

    df = spark.range(100000).select((F.col("id") % 1000).cast("double").alias("v"))
    sk = histogram_sketch(df, F.col("v"), lo=0.0, hi=1000.0, bins=100)
    est = {
        r["q"]: r["estimate"]
        for r in histogram_quantiles(sk, [0.5, 0.9, 0.99], 0.0, 1000.0, 100).collect()
    }
    # uniform data: estimate within one bin width (10.0) of the truth
    for q, truth in [(0.5, 500.0), (0.9, 900.0), (0.99, 990.0)]:
        assert abs(est[q] - truth) <= 10.0, (q, est[q])
    # outliers clamp to edge bins instead of erroring
    wild = spark.createDataFrame([(-5.0,), (1e9,)], "v double")
    sk2 = histogram_sketch(wild, F.col("v"), 0.0, 1000.0, 100)
    bins = sorted(r["bin"] for r in sk2.collect())
    assert bins == [0, 99]


def test_hll_by_group_merge_equals_whole(spark):
    """The __ALL__ row (merged per-group registers) must equal the
    single-sketch estimate over the whole frame — mergeability as data."""
    from cherry_pipelines_spark.operators.sketches import (
        hll_distinct_by_group,
        hll_estimate,
    )

    df = spark.createDataFrame(
        [(i, f"val{i % 700}", "g" + str(i % 3)) for i in range(2000)],
        "row_id long, v string, grp string",
    )
    rows = {r["key"]: r for r in hll_distinct_by_group(df, F.col("v"), "grp").collect()}
    assert set(rows) == {"g0", "g1", "g2", "__ALL__"}
    whole = hll_estimate(hll_registers(df, F.col("v"))).collect()[0]
    assert rows["__ALL__"]["estimate"] == whole["estimate"]
    assert rows["__ALL__"]["buckets_used"] == whole["buckets_used"]
    assert rows["__ALL__"]["exact"] == 700
    # per-group exacts: values i%700 within group i%3 — group g0 sees
    # i ≡ 0 (mod 3): distinct v = |{i%700 : i<2000, i%3==0}|
    for g in range(3):
        expect = len({i % 700 for i in range(2000) if i % 3 == g})
        assert rows[f"g{g}"]["exact"] == expect
        # raw-HLL relative error at m=256 is ~6.5%; 3x sigma guard
        assert abs(rows[f"g{g}"]["estimate"] - expect) / expect < 0.25


# --- Bloom filter -----------------------------------------------------------


def _keys(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "k string")


def test_bloom_no_false_negatives_and_bounded_size(spark):
    members = [f"key{i}" for i in range(200)]
    bloom = bloom_build(_keys(spark, members), F.col("k"), n_bits=1024, n_hashes=4)
    words = bloom.collect()
    assert len(words) <= 1024 // 32  # bounded BY CONSTRUCTION
    probes = spark.createDataFrame(
        [(v, v) for v in members] + [(f"absent{i}", f"absent{i}") for i in range(200)],
        "pid string, k string",
    )
    got = {
        r["pid"]: r["maybe_present"]
        for r in bloom_probe(
            probes, bloom, F.col("k"), id_col="pid", n_bits=1024, n_hashes=4
        ).collect()
    }
    # one-sided error: every member MUST probe true
    assert all(got[m] for m in members)
    # 200 members x 4 hashes in 1024 bits -> fill ~54%, fp ~9%: the
    # absent set must not be all-true (the filter is not saturated)
    assert not all(got[f"absent{i}"] for i in range(200))


def test_bloom_probe_null_key_is_false_not_null(spark):
    # round-10 advice: a NULL key hashes to NULL positions, so the
    # min(hit) aggregate is NULL — the boolean contract column must
    # coalesce to False (a NULL key was never inserted by build)
    bloom = bloom_build(
        _keys(spark, ["present"]), F.col("k"), n_bits=512, n_hashes=3
    )
    probes = spark.createDataFrame(
        [("a", "present"), ("b", None)], "pid string, k string"
    )
    got = {
        r["pid"]: r["maybe_present"]
        for r in bloom_probe(
            probes, bloom, F.col("k"), id_col="pid", n_bits=512, n_hashes=3
        ).collect()
    }
    assert got["a"] is True
    assert got["b"] is False  # not None


def test_bloom_shard_merge_equals_whole(spark):
    a = [f"a{i}" for i in range(80)]
    b = [f"b{i}" for i in range(80)]
    whole = bloom_build(_keys(spark, a + b), F.col("k"), n_bits=512, n_hashes=3)
    sharded = (
        bloom_build(_keys(spark, a), F.col("k"), n_bits=512, n_hashes=3)
        .unionAll(bloom_build(_keys(spark, b), F.col("k"), n_bits=512, n_hashes=3))
        .groupBy("word_idx")
        .agg(F.bit_or("word").alias("word"))
    )
    lhs = sorted(tuple(r) for r in whole.collect())
    rhs = sorted(tuple(r) for r in sharded.collect())
    assert lhs == rhs


def test_bloom_empty_filter_probes_all_false(spark):
    empty = bloom_build(
        _keys(spark, []).limit(0), F.col("k"), n_bits=256, n_hashes=2
    )
    probes = spark.createDataFrame([("x", "x"), ("y", "y")], "pid string, k string")
    got = bloom_probe(
        probes, empty, F.col("k"), id_col="pid", n_bits=256, n_hashes=2
    ).collect()
    assert len(got) == 2 and not any(r["maybe_present"] for r in got)


def test_bloom_word_width_validation(spark):
    import pytest

    with pytest.raises(ValueError):
        bloom_build(_keys(spark, ["a"]), F.col("k"), n_bits=100)
