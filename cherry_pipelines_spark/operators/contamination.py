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
