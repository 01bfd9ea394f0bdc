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


@settings(max_examples=8, deadline=None)
@given(
    n_docs=st.integers(1, 12),
    chunk=st.integers(2, 10),
    overlap_frac=st.integers(0, 9),
)
def test_doc_chunks_reconstruction_property(spark, n_docs, chunk, overlap_frac):
    """Every chunk is exactly the token window it claims; with
    overlap=0 the chunks concatenate back to the original text."""
    from cherry_pipelines_spark.operators.text import doc_chunks

    overlap = min(overlap_frac, chunk - 1)
    rows = [
        (i, " ".join(f"t{i}_{j}" for j in range(1 + (i * 7) % 23)))
        for i in range(n_docs)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = doc_chunks(df, chunk=chunk, overlap=overlap)
    got = {}
    for r in out.collect():
        got.setdefault(r["doc_id"], []).append(r)
    texts = dict(rows)
    step = chunk - overlap
    for doc_id, chunks in got.items():
        toks = texts[doc_id].split(" ")
        chunks.sort(key=lambda r: r["chunk_idx"])
        for r in chunks:
            expect = toks[r["start"] : r["start"] + chunk]
            assert r["chunk_text"].split(" ") == expect
            assert r["n_tokens"] == len(expect)
            assert r["start"] == r["chunk_idx"] * step
        if overlap == 0:
            rebuilt = " ".join(r["chunk_text"] for r in chunks)
            assert rebuilt == texts[doc_id]


@settings(max_examples=8, deadline=None)
@given(
    sizes=st.lists(st.integers(1, 300), min_size=1, max_size=40),
    budget=st.integers(8, 512),
    buckets=st.integers(1, 4),
)
def test_pack_sequences_bruteforce_property(spark, sizes, budget, buckets):
    """pack_sequences must equal the sequential token-stream model:
    per bucket, docs in key order, cumulative offsets cut every
    budget tokens."""
    import hashlib

    from cherry_pipelines_spark.operators.sampling import pack_sequences

    rows = [(i, s) for i, s in enumerate(sizes)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = {
        r["doc_id"]: (r["pack_bucket"], r["seq_id"], r["seq_offset"])
        for r in pack_sequences(
            df, "n_tokens", budget=budget, key=F.col("doc_id"), buckets=buckets
        ).collect()
    }
    # brute force: same hash → bucket, then running totals per bucket
    def h32(s: str) -> int:
        return int.from_bytes(hashlib.sha256(s.encode()).digest()[:4], "big")

    streams: dict[int, int] = {}
    for doc_id, size in sorted(rows):
        b = h32(str(doc_id)) % buckets
        start = streams.get(b, 0)
        streams[b] = start + size
        assert got[doc_id] == (b, start // budget, start % budget), doc_id
