"""Property-based equivalence tests for the window-family operators:
randomized inputs pin chunked_trailing_range_agg to the plain window and
sessionize to a brute-force python model.  Example counts are small —
each example runs real Spark jobs — but inputs cover duplicates, gaps,
negative values, and chunk-boundary alignment."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

rows_strategy = st.lists(
    st.tuples(
        st.integers(0, 2),          # key
        st.integers(-50, 200),      # pos (negatives cross chunk 0)
        st.integers(-5, 10),        # value
    ),
    min_size=1,
    max_size=60,
)


@settings(max_examples=8, deadline=None)
@given(rows=rows_strategy, width=st.integers(1, 12), chunk_mul=st.integers(1, 4))
def test_chunked_window_equivalence_property(spark, rows, width, chunk_mul):
    from cherry_pipelines_spark.operators.windows import (
        chunked_trailing_range_agg,
        trailing_range_agg,
    )

    chunk = width * chunk_mul  # always >= width
    df = spark.createDataFrame(rows, "k long, pos long, v long")
    aggs = {"s": F.sum("v"), "c": F.count("v")}

    def key(out):
        return sorted((r["k"], r["pos"], r["v"], r["s"], r["c"]) for r in out.collect())

    assert key(trailing_range_agg(df, "pos", width, aggs, ("k",))) == key(
        chunked_trailing_range_agg(df, "pos", width, aggs, ("k",), chunk=chunk)
    )


@settings(max_examples=8, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 100)),
        min_size=1,
        max_size=40,
        unique=True,  # (key, ts) unique -> deterministic session labels
    ),
    gap=st.integers(1, 20),
)
def test_sessionize_matches_bruteforce_property(spark, rows, gap):
    from cherry_pipelines_spark.operators.sessionize import sessionize

    df = spark.createDataFrame(rows, "k long, ts long")
    got = {
        (r["k"], r["ts"]): r["session_idx"]
        for r in sessionize(df, ["k"], "ts", gap=gap).collect()
    }

    expected = {}
    by_key: dict[int, list[int]] = {}
    for k, ts in rows:
        by_key.setdefault(k, []).append(ts)
    for k, tss in by_key.items():
        idx = 0
        prev = None
        for ts in sorted(tss):
            if prev is not None and ts - prev > gap:
                idx += 1
            expected[(k, ts)] = idx
            prev = ts
    assert got == expected
