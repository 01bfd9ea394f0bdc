"""Corpus relevance statistics: TF-IDF term extraction and BM25
scoring over the ``documents`` table — the retrieval/quality-weighting
side of a training-data pipeline (keyword extraction for topic
filtering, BM25 for query-driven corpus slicing, e.g. pulling the
documents most relevant to an eval suite for decontamination review).

Beyond-reference operators (the reference engine has no text-relevance
primitives).  All statistics are computed with deterministic,
engine-portable formulas so an independent SQL engine reproduces every
score:

* tf  = count of the term in the document (raw count, no sub-linear
  damping — damping variants are a caller-side ``F.log1p``).
* idf = ln((N + 1) / (df + 1)) + 1  (the smoothed form: strictly
  positive, defined even for df = N).
* BM25 idf = ln(1 + (N - df + 0.5) / (df + 0.5)) with k1/b defaults
  1.2 / 0.75.
* scores are rounded HALF_UP at ``scale`` (Spark's ``round``) before
  ranking, ties broken on the term string ascending — bit-reproducible
  rankings across engines.

Scale shape (100 TB): one token explode feeds a (term) hash-agg for
document frequencies — mergeable partial aggregation, one shuffle.
Term stats join back onto the exploded tokens keyed by term; stop-word
terms are the classic skew key, so ``max_df_ratio`` (OPT-IN, default
1.0 = keep everything) drops terms seen in more than that fraction of
documents BEFORE the join.  The guard is an APPROXIMATION that alters
results: under the smoothed idf above, idf(df = N) = ln((N+1)/(N+1))+1
= 1, so a high-tf common term can still out-score rarer terms and
pruning it changes top-k composition (and drops stopword-only
documents entirely).  It is the same honest df-cut trade
``dedup.max_df`` makes — removing the hottest shuffle keys at the cost
of exactness — which is why it defaults OFF here where exact ranking
is the contract.  BM25's query-term DF frame is tiny (|query| rows)
and broadcast.  No Python anywhere — every expression is
whole-stage-codegen JVM.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _doc_terms(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, term, tf) — whitespace tokens (``\\s+`` regex split, so
    tabs/newlines delimit exactly like ``str.split()``), empty strings
    dropped, per-document term counts."""
    return (
        df.select(
            F.col(id_col),
            F.explode(F.split(F.col(text_col), r"\s+")).alias("term"),
        )
        .filter(F.col("term") != "")
        .groupBy(id_col, "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )


def tfidf_top_terms(
    df: DataFrame,
    top_k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df_ratio: float = 1.0,
    scale: int = 6,
) -> DataFrame:
    """Top-``top_k`` TF-IDF terms per document:
    ``(id, term, tf, df, score, rank)``.

    ``max_df_ratio`` < 1.0 opts into an APPROXIMATE skew guard: terms
    present in more than that fraction of documents are pruned before
    the stats join.  Because the smoothed idf floors at 1 even for
    df = N, pruning CAN change top-k composition (a high-tf stop-word
    may legitimately out-score rarer terms) and drops documents made
    only of pruned terms; the default 1.0 keeps exact ranking.  Rank is
    ``row_number`` within a document (consecutive, no gaps or ties):
    score DESC, then term ASC — deterministic under ties."""
    if top_k < 1:
        raise ValueError("top_k must be >= 1")
    terms = _doc_terms(df, id_col, text_col)
    n_docs = df.select(F.count(F.lit(1)).cast("long").alias("n_docs"))
    stats = (
        terms.groupBy("term")
        .agg(F.count("*").cast("long").alias("df"))
        .crossJoin(F.broadcast(n_docs))
        .filter(F.col("df") <= F.col("n_docs") * F.lit(max_df_ratio))
        .select(
            "term",
            "df",
            (F.log((F.col("n_docs") + 1) / (F.col("df") + 1)) + 1).alias("idf"),
        )
    )
    scored = terms.join(stats, "term").select(
        id_col,
        "term",
        "tf",
        "df",
        F.round(F.col("tf") * F.col("idf"), scale).alias("score"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= top_k)
    )


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    scale: int = 6,
) -> DataFrame:
    """BM25 relevance of every document against a fixed bag of query
    terms: ``(id, score)`` with score 0 for documents matching no term
    (every document is returned — downstream slicing decides the
    cutoff).

    The per-term DF frame is |query| rows → broadcast; document length
    and the corpus average use the same whitespace tokens as tf.  One
    explode + two broadcast joins; facts never shuffle."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    uniq = sorted(set(query_terms))
    terms = _doc_terms(df, id_col, text_col)
    doclen = terms.groupBy(id_col).agg(F.sum("tf").cast("long").alias("dl"))
    n_docs = df.select(F.count(F.lit(1)).cast("long").alias("n_docs"))
    avgdl = doclen.agg((F.sum("dl") / F.count("*")).alias("avgdl"))
    qdf = (
        terms.filter(F.col("term").isin(uniq))
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("df"))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "term",
            F.log(
                1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ).alias("idf"),
        )
    )
    hits = (
        terms.filter(F.col("term").isin(uniq))
        .join(F.broadcast(qdf), "term")
        .join(doclen, id_col)
        .crossJoin(F.broadcast(avgdl))
        .select(
            id_col,
            (
                F.col("idf")
                * (F.col("tf") * (k1 + 1))
                / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl")))
            ).alias("s"),
        )
        .groupBy(id_col)
        .agg(F.sum("s").alias("score"))
    )
    return (
        df.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.round(F.coalesce(F.col("score"), F.lit(0.0)), scale).alias("score"),
        )
    )


def tfidf_cosine_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df_ratio: float = 0.5,
    scale: int = 6,
    max_df_count: int | None = None,
) -> DataFrame:
    """All-pairs sparse TF-IDF cosine similarity over the inverted
    index — the text-side counterpart to the dense embedding near-dup:
    ``(doc_a, doc_b, cos)`` for every pair scoring ``>= threshold``,
    ``doc_a < doc_b``.

    Candidate generation is the classic all-pairs-similarity shape
    (posting-list self-join on term): only documents SHARING a kept
    term ever pair, so cost is bounded by posting-list sizes, not n².
    ``max_df_ratio`` is the same honest df-cut ``dedup.max_df`` makes —
    terms in more than that fraction of documents (stop words, the
    quadratic buckets) contribute nothing to any pair.  Unlike
    ``tfidf_top_terms`` this is part of the CONTRACT here, not an
    opt-in: the score is defined over the df-kept vocabulary, norms
    included, so the result is deterministic and the SQL mirror applies
    the identical cut.

    ``max_df_count`` additionally caps df as an ABSOLUTE count — the
    100 TB knob.  The ratio cut is corpus-relative: on a growing corpus
    whose head vocabulary fragments (sources with disjoint jargon), a
    term can sit under any ratio while its posting list still pairs
    C(df, 2) documents.  An absolute cap bounds per-term join work at
    C(max_df_count, 2) regardless of corpus size, which is what keeps
    the self-join linear in the number of terms (measured on the
    scaling ladder as ``tfidf_doc_pairs_capped``).

    Exactness: weights are ``round(tf·idf, scale)`` DECIMAL(18,6); dot
    products and squared norms are decimal sums of decimal products —
    order-independent, engine-portable.  Floats appear only in the
    final ``dot / (sqrt(na)·sqrt(nb))``, rounded HALF_UP at ``scale``.

    Scale shape (100 TB): one explode → (doc, term) agg, one term-keyed
    stats join (df-cut BEFORE the join kills the skew keys), one
    posting self-join keyed on term, one (a, b) hash-agg, two id-keyed
    norm joins.  Every join is an equi-join; nothing driver-side."""
    if not 0 < max_df_ratio <= 1:
        raise ValueError("max_df_ratio must be in (0, 1]")
    if max_df_count is not None and max_df_count < 1:
        raise ValueError("max_df_count must be >= 1")
    terms = _doc_terms(df, id_col, text_col)
    n_docs = df.select(F.count(F.lit(1)).cast("long").alias("n_docs"))
    df_cut = F.col("df") <= F.col("n_docs") * F.lit(max_df_ratio)
    if max_df_count is not None:
        df_cut = df_cut & (F.col("df") <= max_df_count)
    keep = (
        terms.groupBy("term")
        .agg(F.count("*").cast("long").alias("df"))
        .crossJoin(F.broadcast(n_docs))
        .filter(df_cut)
        .select(
            "term",
            (F.log((F.col("n_docs") + 1) / (F.col("df") + 1)) + 1).alias("idf"),
        )
    )
    w = (
        terms.join(keep, "term")
        .select(
            F.col(id_col).alias("doc"),
            "term",
            F.round(F.col("tf") * F.col("idf"), scale)
            .cast("decimal(18,6)")
            .alias("w"),
        )
        # feeds the norms AND both sides of the posting self-join —
        # materialize the weighted index once instead of re-running the
        # explode + df stats three times
        .localCheckpoint(eager=False)
    )
    norms = w.groupBy("doc").agg(F.sum(F.col("w") * F.col("w")).alias("nn"))
    a = w.select(F.col("doc").alias("doc_a"), "term", F.col("w").alias("wa"))
    b = w.select(F.col("doc").alias("doc_b"), "term", F.col("w").alias("wb"))
    dots = (
        a.join(b, "term")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    na = norms.select(F.col("doc").alias("doc_a"), F.col("nn").alias("na"))
    nb = norms.select(F.col("doc").alias("doc_b"), F.col("nn").alias("nb"))
    cos = F.round(
        F.col("dot").cast("double")
        / (F.sqrt(F.col("na").cast("double")) * F.sqrt(F.col("nb").cast("double"))),
        scale,
    )
    return (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .select("doc_a", "doc_b", cos.alias("cos"))
        .filter(F.col("cos") >= threshold)
    )
