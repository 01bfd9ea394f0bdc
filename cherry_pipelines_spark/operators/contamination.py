"""Benchmark-contamination detection: n-gram overlap between a corpus
and a (much smaller) benchmark/eval set.

The standard decontamination step before training: any document sharing
word n-grams with an eval benchmark is flagged (and usually dropped).
Plan shape for 100 TB: the benchmark side is tiny relative to the
corpus, so its distinct shingle set is BROADCAST — the corpus-side
shingle explode then joins map-side with no shuffle of corpus data;
per-doc aggregation is the only shuffle, keyed by doc id.  If the
benchmark ever outgrows broadcast range, drop the hint and it degrades
to a plain shuffled semi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cherry_pipelines_spark.operators.text import fan_out, shingle_array, tokens


def _doc_shingles(df: DataFrame, id_col: str, text_col: str, ngram: int) -> DataFrame:
    # fan_out: a one-file corpus fixture otherwise explodes on a single
    # partition; at scale (many files) this is a no-op
    return fan_out(df.select(id_col, text_col)).select(
        F.col(id_col),
        F.explode(shingle_array(tokens(F.col(text_col)), ngram)).alias("shingle"),
    ).distinct()


def ngram_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 5,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Per-corpus-document contamination stats against ``benchmark``.

    Returns one row per corpus document: ``n_shingles`` (distinct word
    ``ngram``-grams), ``n_overlap`` (of those, how many appear anywhere
    in the benchmark), ``contamination_frac`` (round 6).  Documents with
    zero overlap are kept (frac 0.0) so the output is a stable decision
    table for a downstream filter.
    """
    corpus_sh = _doc_shingles(corpus, id_col, text_col, ngram)
    bench_sh = (
        benchmark.select(
            F.explode(shingle_array(tokens(F.col(text_col)), ngram)).alias("shingle")
        )
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    if broadcast_benchmark:
        bench_sh = F.broadcast(bench_sh)
    # ONE corpus explode: broadcast-left-join marks benchmark hits, a
    # single per-doc aggregate counts totals and hits together (the
    # two-branch per_doc/overlap formulation scans + explodes the corpus
    # twice with no exchange reuse — measured 1.6x slower at sf0.1)
    marked = corpus_sh.join(bench_sh, "shingle", "left")
    return marked.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_shingles"),
        F.count("_hit").cast("long").alias("n_overlap"),
        F.round(F.count("_hit") / F.count(F.lit(1)), 6).alias("contamination_frac"),
    )


def benchmark_span_occurrences(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    min_span_tokens: int = 16,
    bench_id_col: str | None = None,
) -> DataFrame:
    """POSITIONED benchmark-derived spans inside corpus documents — the
    span-level sibling of :func:`ngram_contamination` (which only says
    HOW MUCH of a doc overlaps the benchmark, not WHERE): every maximal
    run of at least ``min_span_tokens`` tokens that a corpus document
    shares verbatim with a benchmark document, with its start offset on
    BOTH sides.  This is the Lee-et-al exact-substring machinery of
    ``dedup.duplicated_span_pairs`` pointed across two corpora, and the
    table a surgical decontamination pass consumes (cut the range
    instead of dropping the whole document).

    Plan shape for 100 TB: the corpus side is map-only (position-stamped
    k-token windows, ``dedup.window_occurrences``); the benchmark's
    window table — bounded by the benchmark's size, tiny by definition —
    is BROADCAST, so matching shuffles NO corpus data at all and, unlike
    the within-corpus family, needs no hash/salt key engineering: the
    join key is the window text, compared map-side.  Only the matches
    (benchmark-overlapping windows) shuffle, once, for the per-(doc,
    bench, diagonal) run chaining.

    Output: ``(doc_id, bench_id, pos_doc, pos_bench, span_tokens)``;
    ``bench_id_col`` defaults to ``id_col``.  A corpus document that IS
    a benchmark document (shared id space, e.g. a pseudo-benchmark
    drawn from the corpus) matches itself end-to-end — by design: true
    decontamination must scrub benchmark copies wherever they appear."""
    from pyspark.sql import Window

    from cherry_pipelines_spark.operators.dedup import window_occurrences

    bid = bench_id_col or id_col
    cw = window_occurrences(corpus, text_col, k, id_col)
    bw = window_occurrences(benchmark, text_col, k, bid).select(
        F.col(bid).alias("bench_id"), F.col("pos").alias("_pb"), "_w"
    )
    matched = cw.join(F.broadcast(bw), "_w").select(
        F.col(id_col),
        F.col("bench_id"),
        F.col("pos").alias("_pd"),
        "_pb",
        (F.col("pos") - F.col("_pb")).alias("_diag"),
    )
    win = Window.partitionBy(id_col, "bench_id", "_diag").orderBy("_pd")
    runs = (
        matched.withColumn("_grp", F.col("_pd") - F.row_number().over(win))
        .groupBy(id_col, "bench_id", "_diag", "_grp")
        .agg(F.min("_pd").alias("_pd0"), F.count(F.lit(1)).alias("_run"))
    )
    return runs.select(
        id_col,
        "bench_id",
        F.col("_pd0").alias("pos_doc"),
        (F.col("_pd0") - F.col("_diag")).alias("pos_bench"),
        (F.col("_run") + F.lit(k - 1)).cast("long").alias("span_tokens"),
    ).filter(F.col("span_tokens") >= min_span_tokens)


def benchmark_span_scrub(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    min_span_tokens: int = 16,
    bench_id_col: str | None = None,
) -> DataFrame:
    """SURGICAL benchmark decontamination: cut every
    ≥``min_span_tokens`` benchmark-derived run from the corpus
    documents (same cut mechanics as ``dedup.duplicated_span_scrub`` —
    per-doc cut-list aggregation, map-side indexed array filter over
    ORIGINAL token coordinates) and emit the scrubbed corpus.  Where
    :func:`ngram_contamination` supports drop-the-document policies,
    this keeps the document and removes exactly the leaked benchmark
    text; a corpus copy of a whole benchmark doc scrubs to ''.

    Output: ``(id, n_tokens, n_removed, clean_text)`` for EVERY corpus
    document.  Re-passing the scrubbed corpus through
    :func:`benchmark_span_occurrences` yields zero ≥``min_span_tokens``
    runs (pinned in tests/test_llm_data_ops.py)."""
    occ = benchmark_span_occurrences(
        corpus, benchmark, id_col, text_col, k, min_span_tokens, bench_id_col
    )
    cuts = occ.select(
        F.col(id_col),
        F.struct(
            F.col("pos_doc").cast("long").alias("s"),
            (F.col("pos_doc") + F.col("span_tokens")).cast("long").alias("e"),
        ).alias("_r"),
    )
    per_doc = cuts.groupBy(id_col).agg(F.collect_list("_r").alias("_cuts"))
    t = tokens(F.coalesce(F.col(text_col), F.lit("")))
    no_cuts = F.expr("array()").cast("array<struct<s:bigint,e:bigint>>")
    joined = corpus.join(per_doc, id_col, "left").select(
        F.col(id_col),
        t.alias("_t"),
        F.coalesce(F.col("_cuts"), no_cuts).alias("_cuts"),
    )
    kept = F.filter(
        F.col("_t"),
        lambda tok, i: ~F.exists(
            F.col("_cuts"), lambda r: (i >= r["s"]) & (i < r["e"])
        ),
    )
    return joined.select(
        id_col,
        F.size("_t").cast("long").alias("n_tokens"),
        (F.size("_t") - F.size(kept)).cast("long").alias("n_removed"),
        F.concat_ws(" ", kept).alias("clean_text"),
    )
