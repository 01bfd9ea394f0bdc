"""Text-analysis operators for LLM training-data pipelines.

Pure ``pyspark.sql.functions`` compositions — no Python UDFs — so the
operators stay inside whole-stage codegen and scale linearly with
executors; each has an exact ANSI-SQL equivalent (used as the DuckDB
oracle in ``__spark_entry__``).  The one deliberate exception is
``bpe_learn_merges``' greedy merge application: a ragged per-word scan
with no JVM-expression form, run Arrow-batched in ``mapInPandas``.

The shared 32-bit deterministic hash ``h32(s) = int(sha256(s)[:8
hex])`` is engine-portable (identical in Spark and DuckDB), which is
what makes minhash/simhash oracle-checkable.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Marker stopwords per language for the n-gram/stopword language-ID
# heuristic.  Deliberately small and fixed so the SQL oracle can inline
# them.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a"),
    "es": ("el", "la", "de", "que", "y"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
}

STOPWORDS = ("the", "a", "an", "of", "to", "and", "in", "is", "it", "that")

# BPE-ish token pieces: runs of letters, runs of digits, or a single
# non-alphanumeric non-space character.
BPE_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def fan_out(df: DataFrame) -> DataFrame:
    """Small inputs often arrive as one parquet partition; the
    explode/hash chains here are CPU-bound, so spread them across the
    cluster first.  No-op-cheap at scale (already-parallel inputs skip
    the shuffle).

    Parallelism is estimated from the leaf-scan file count rather than
    ``df.rdd.getNumPartitions()`` — touching ``.rdd`` materializes the
    RDD lineage (and would weaken the no-Python-eval plan guarantees);
    file count is metadata-only.  A many-file scan is already parallel;
    a one-file fixture (or an in-memory frame, ``inputFiles() == []``)
    gets spread.  Worst case for the heuristic is one huge splittable
    file, where the extra repartition is a small bounded shuffle.

    An EXPLICIT upstream ``repartition`` wins over the file-count
    heuristic: a caller that fanned out before an expensive synthesis
    select still reads as a one-file scan here, and a second exchange
    would shuffle the (much larger) synthesized rows for zero added
    parallelism.  Detected from the analyzed logical plan tree
    (metadata-only — same reason ``.rdd`` is avoided): node names are
    matched at LINE STARTS of the tree rendering and the scan stops at
    the first partitioning-collapsing operator (Aggregate/Join/Window/
    Sort/...), so a Repartition buried below a shuffle — or the word
    appearing inside a string literal mid-line — no longer counts
    (round-7 advice)."""
    if df.isStreaming:
        # fan-out exists for one-file BATCH fixtures; a stream's
        # parallelism comes from the source/trigger, and inputFiles()
        # is not defined for streaming plans
        return df
    spark = df.sparkSession
    try:
        target = spark.sparkContext.defaultParallelism
    except Exception:  # pragma: no cover - Spark Connect: no SparkContext
        target = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    files = df.inputFiles()
    if files and len(files) >= max(2, target // 2):
        return df
    if _has_live_repartition(df):
        return df
    return df.repartition(target)


def _has_live_repartition(df: DataFrame) -> bool:
    """True iff the analyzed logical plan carries a Repartition node
    ABOVE the first operator that collapses partitioning — i.e. the
    repartition's layout actually survives to this frame.  Perf-only
    heuristic; under Spark Connect (no ``_jdf``) it returns False and
    the caller falls back to its own repartition (safe: at most one
    redundant bounded shuffle)."""
    try:
        plan = df._jdf.queryExecution().analyzed().toString()
    except Exception:  # pragma: no cover - Spark Connect / API drift
        return False
    # Tree lines look like "+- Repartition 32, true" / ":  +- Join ...";
    # strip the box-drawing prefix and read the leading node name only,
    # so literals inside Project/Filter expression lists never match.
    stop = {
        "Aggregate", "Join", "Window", "Sort", "Deduplicate",
        "GlobalLimit", "Intersect", "Except", "Distinct",
    }
    for line in plan.splitlines():
        m = re.match(r"^[\s:+|-]*'?([A-Za-z]+)", line)
        if not m:
            continue
        name = m.group(1)
        if name.startswith("Repartition"):  # Repartition / ...ByExpression
            return True
        if name in stop:
            return False
    return False


def h32(col: Column) -> Column:
    """Deterministic 32-bit hash shared with the DuckDB oracle:
    first 8 hex chars of sha256, parsed base-16."""
    return F.conv(F.substring(F.sha2(col, 256), 1, 8), 16, 10).cast("long")


def tokens(col: Column) -> Column:
    """Whitespace tokens (documents are single-space separated)."""
    return F.split(col, " ")


def shingle_array(t: Column, ngram: int = 3) -> Column:
    """Word n-grams of a token array as an array column.

    Built from ``zip_with`` over shifted ``slice``s of the (already
    materialized) token array.  The naive form — ``transform(sequence(..),
    i -> concat_ws(element_at(t, i), element_at(t, i+1), ...))`` — is
    O(n²): Spark re-evaluates the outer array expression for every
    lambda invocation, which re-splits the document once per shingle
    element access.  The zip_with form evaluates the token array once
    (~9× faster measured at sf0.1).

    Documents shorter than ``ngram`` produce one truncated shingle
    (out-of-range slices zip as NULL, which ``concat_ws`` skips) —
    identical to the element_at/NULL semantics.
    """
    n = F.size(t)
    m = F.greatest(n - (ngram - 1), F.lit(1))
    out = F.slice(t, 1, m)
    for j in range(1, ngram):
        out = F.zip_with(
            out, F.slice(t, 1 + j, m), lambda a, b: F.concat_ws(" ", a, b)
        )
    return out


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting: whitespace tokens + BPE-ish regex pieces."""
    t = tokens(F.col(text_col))
    return df.select(
        "doc_id",
        F.size(t).cast("long").alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_REGEX), 0)).cast("long").alias("bpe_tokens"),
        F.length(text_col).cast("long").alias("n_chars_computed"),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality scoring: length / punctuation / stopword ratios + a
    composite score, all in fixed decimal so the oracle matches exactly."""
    t = tokens(F.col(text_col))
    n_tok = F.size(t)
    n_stop = F.size(F.filter(t, lambda w: w.isin(*STOPWORDS)))
    n_punct = F.length(F.col(text_col)) - F.length(
        F.regexp_replace(F.col(text_col), r"[.,!?;:]", "")
    )
    # ratios in IEEE double + fixed rounding: bit-identical across engines
    # (decimal division scale rules differ between engines; double doesn't)
    mean_word_len = F.round(
        (F.length(text_col) - n_tok + 1).cast("double") / n_tok.cast("double"), 6
    )
    stop_ratio = F.round(n_stop.cast("double") / n_tok.cast("double"), 6)
    punct_ratio = F.round(
        n_punct.cast("double") / F.length(text_col).cast("double"), 6
    )
    return df.select(
        "doc_id",
        n_tok.cast("long").alias("n_tokens"),
        mean_word_len.alias("mean_word_len"),
        stop_ratio.alias("stop_ratio"),
        punct_ratio.alias("punct_ratio"),
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-marker language ID: count marker-word hits per language,
    argmax with deterministic tie-break on language code."""
    t = tokens(F.col(text_col))
    scores = [
        F.struct(
            F.size(F.filter(t, lambda w: w.isin(*words))).alias("hits"),
            F.lit(lang).alias("lang"),
        )
        for lang, words in sorted(LANG_MARKERS.items())
    ]
    # argmax by (hits, lang) — array_max on structs compares fieldwise;
    # ties broken by the *larger* lang code, deterministic on both engines
    best = F.array_max(F.array(*scores))
    return df.select(
        "doc_id",
        best["lang"].alias("pred_lang"),
        best["hits"].cast("long").alias("marker_hits"),
    )


def fingerprint(df: DataFrame, text_col: str = "text", ngram: int = 3) -> DataFrame:
    """Document fingerprint: min/max rolling hash over word n-grams
    (winnowing-lite).  One deterministic 32-bit value per document."""
    t = tokens(F.col(text_col))
    hashes = F.transform(shingle_array(t, ngram), lambda s: h32(s))
    return fan_out(df).select(
        "doc_id",
        F.array_min(hashes).alias("fp_min"),
        F.array_max(hashes).alias("fp_max"),
        F.size(hashes).cast("long").alias("n_shingles"),
    )


# email + digit-run redaction patterns, kept to syntax shared by Java
# regex (Spark) and RE2 (DuckDB) so the oracle matches byte-for-byte
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\+?[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}"


def pii_scrub(
    df: DataFrame, text_col: str = "text", replacement: str = "[REDACTED]"
) -> DataFrame:
    """PII scrubbing: redact email addresses and phone-shaped digit runs,
    reporting per-document redaction counts.  Pure JVM regexp — no UDF;
    map-only, so it composes with scan pruning at any scale.  The
    pattern set is the *plumbing* contract; a production deployment
    extends PII patterns, not the operator."""
    c = F.col(text_col)
    n_email = F.size(F.regexp_extract_all(c, F.lit(PII_EMAIL), 0))
    scrubbed1 = F.regexp_replace(c, PII_EMAIL, replacement)
    n_phone = F.size(F.regexp_extract_all(scrubbed1, F.lit(PII_PHONE), 0))
    scrubbed = F.regexp_replace(scrubbed1, PII_PHONE, replacement)
    return df.withColumn("n_redactions", (n_email + n_phone).cast("long")).withColumn(
        text_col + "_scrubbed", scrubbed
    )


def normalize_text(
    df: DataFrame, text_col: str = "text", out_col: str | None = None
) -> DataFrame:
    """Corpus text normalization (the first stage of every training-data
    pipeline): strip C0/DEL control characters, collapse whitespace runs
    to single spaces, trim, lowercase.  Reports before/after char counts
    so downstream audits can bound how destructive the pass was.

    Pure JVM regexp/lower/trim — map-only, whole-stage codegen, composes
    with scan pruning at any scale; order is pinned (controls→space
    BEFORE whitespace collapse) so an independent engine replays the
    exact output."""
    c = F.col(text_col)
    cleaned = F.lower(
        F.trim(
            F.regexp_replace(
                F.regexp_replace(c, "[\\x00-\\x1F\\x7F]", " "), "\\s+", " "
            )
        )
    )
    out = out_col or text_col + "_norm"
    return (
        df.withColumn("n_chars_raw", F.length(c).cast("long"))
        .withColumn(out, cleaned)
        .withColumn("n_chars_norm", F.length(F.col(out)).cast("long"))
    )


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Repetition / boilerplate signals (the Gopher-rule family): unique
    word fraction, most-frequent-word fraction, most-frequent-bigram
    fraction.  Highly repetitive documents (templated spam, boilerplate,
    generation loops) score low unique-fraction / high top-fractions and
    get filtered before training.

    Plan: two explode→groupBy branches (words, bigrams) joined on the
    doc id.  All shuffle keys include the doc id, so partitions stay
    bounded by single-document size; no UDFs, all whole-stage codegen.
    Documents with fewer than 2 tokens get NULL bigram stats."""
    t = tokens(F.col(text_col))
    words = df.select(F.col(id_col), F.explode(t).alias("w"))
    wc = words.groupBy(id_col, "w").agg(F.count(F.lit(1)).alias("c"))
    word_stats = wc.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_unique_words"),
        F.sum("c").cast("long").alias("n_words"),
        F.max("c").cast("long").alias("top_word_count"),
    )
    bigrams = df.select(
        F.col(id_col),
        F.explode(
            F.when(F.size(t) >= 2, shingle_array(t, 2)).otherwise(
                F.array().cast("array<string>")
            )
        ).alias("b"),
    )
    bc = bigrams.groupBy(id_col, "b").agg(F.count(F.lit(1)).alias("c"))
    bigram_stats = bc.groupBy(id_col).agg(
        F.max("c").cast("long").alias("top_bigram_count"),
        F.sum("c").cast("long").alias("n_bigrams"),
    )
    return (
        word_stats.join(bigram_stats, id_col, "left")
        .select(
            id_col,
            "n_words",
            "n_unique_words",
            F.round(
                F.col("n_unique_words").cast("double") / F.col("n_words"), 6
            ).alias("unique_word_frac"),
            F.round(
                F.col("top_word_count").cast("double") / F.col("n_words"), 6
            ).alias("top_word_frac"),
            F.round(
                F.col("top_bigram_count").cast("double") / F.col("n_bigrams"), 6
            ).alias("top_bigram_frac"),
        )
    )


def idf_keywords(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3
) -> DataFrame:
    """Per-document top-k keywords by tf·idf (ln(N/df) form, round 6),
    deterministic tie-break (score desc, token asc).

    Plan: one explode→groupBy for term frequencies, a groupBy over
    distinct (doc, word) for document frequencies, the corpus size as a
    broadcast 1-row aggregate (no driver-side collect), then a per-doc
    row_number window.  Every shuffle is keyed by word or doc id — no
    global sort, no UDF."""
    from pyspark.sql import Window

    t = tokens(F.col(text_col))
    words = df.select(F.col(id_col), F.explode(t).alias("w"))
    tf = words.groupBy(id_col, "w").agg(F.count(F.lit(1)).alias("tf"))
    docfreq = tf.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    n_total = df.agg(F.countDistinct(F.col(id_col)).alias("n_total"))
    scored = (
        tf.join(docfreq, "w")
        .crossJoin(F.broadcast(n_total))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * F.log(F.col("n_total").cast("double") / F.col("df").cast("double")),
                6,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("w").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(id_col, F.col("w").alias("keyword"), "score", "rank")
    )


def vocab_topk(
    df: DataFrame, text_col: str = "text", k: int = 100
) -> DataFrame:
    """Corpus-wide token vocabulary: the ``k`` most frequent tokens with
    counts (the first step of any tokenizer/vocab build over a corpus).

    Plan: explode → hash agg on token.  Catalyst makes the count
    partial-first (map-side combine), so the shuffle carries one row per
    distinct token per input partition — not one row per token
    occurrence; the final top-k is a TakeOrdered over the (small)
    distinct-token aggregate, not a global sort of the corpus.  The
    (count desc, token asc) tiebreak makes the selected set
    deterministic, so the operator is reproducible run-to-run at any
    parallelism."""
    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(k)
    )


def doc_chunks(
    df: DataFrame,
    text_col: str = "text",
    chunk: int = 64,
    overlap: int = 16,
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into overlapping token-window chunks (the
    context-window chunking step before embedding or long-doc training):
    windows of ``chunk`` tokens starting every ``chunk - overlap``
    tokens; the final window may be short; every doc yields ≥ 1 chunk.

    Pure JVM: ``sequence`` generates the start offsets, ``posexplode``
    fans them out, ``slice`` + ``concat_ws`` rebuild the chunk text —
    map-side only (the explode multiplies rows ~n_tokens/stride but
    involves no shuffle), so it composes with pushdown and scales
    embarrassingly."""
    if overlap >= chunk:
        raise ValueError(f"overlap {overlap} must be < chunk {chunk}")
    step = chunk - overlap
    t = tokens(F.col(text_col))
    n = F.size(t)
    starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(step))
    return (
        df.select(F.col(id_col), t.alias("_t"), starts.alias("_starts"))
        .select(
            id_col,
            F.posexplode("_starts").alias("chunk_idx", "start"),
            F.col("_t"),
        )
        .select(
            id_col,
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.col("start").cast("long").alias("start"),
            F.least(F.lit(chunk), F.size("_t") - F.col("start"))
            .cast("long")
            .alias("n_tokens"),
            F.concat_ws(" ", F.slice(F.col("_t"), F.col("start") + 1, chunk)).alias(
                "chunk_text"
            ),
        )
    )


def inverted_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_postings: int = 20,
) -> DataFrame:
    """Token → (document frequency, capped sorted posting list) — the
    build step of a corpus search index.

    One distinct-explode (map-side), then a token-keyed window + one
    aggregation (the window's sort-shuffle on token is reused by the
    groupBy — same partitioning, no second exchange).  Posting lists
    are capped at ``max_postings`` ids (the full df count is still
    exact): a stop-word's list would otherwise be |corpus| long — the
    classic inverted-index hot key.  The cap is applied BEFORE the
    aggregation buffer (row_number ≤ cap feeds collect_list), so a
    stop-word token holds at most ``max_postings`` entries in memory at
    any point — not |corpus| entries later sliced down.
    Postings are emitted as a comma-joined string of sorted ids, which
    keeps the operator engine-portable (array-of-number formatting is
    engine-specific; digit strings are not)."""
    from pyspark.sql.window import Window

    words = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("token"),
    )
    rn = F.row_number().over(Window.partitionBy("token").orderBy(F.col(id_col)))
    ranked = words.withColumn("_rn", rn)
    return ranked.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.when(F.col("_rn") <= max_postings, F.col(id_col))
                    )
                ),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("postings"),
    )


def bigram_lm_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    materialize: bool = True,
) -> DataFrame:
    """Character-bigram language-model quality score.  EAGER BY
    DEFAULT: with ``materialize=True`` this runs a Spark job AT CALL
    TIME and returns a localCheckpoint-ed, lineage-free frame (it
    cannot recompute after executor loss; pass ``materialize=False``
    to compose it into a lazy plan and own the cache lifetime).

    The classic cheap LLM-data gibberish filter: train an MLE
    char-bigram model on
    the corpus itself, score every document by the average
    log-probability of its bigrams.  Low scores flag encoding garbage,
    random strings, and wrong-alphabet text; thresholding is the
    caller's policy (pair with ``sampling.quantile_gate``).

    Output: ``(id, n_bigrams, lm_score)`` with ``lm_score =
    avg(ln(count(bigram)/total))`` rounded to 6 dp.  Documents shorter
    than 2 characters have no bigrams and no row.

    Scale shape: the exploded bigram stream collapses FIRST to
    per-(doc, bigram) counts — one keyed shuffle whose map-side combine
    compresses |occurrences| rows down to at most |doc| × alphabet² —
    and everything else derives from that materialized frame: the model
    (global bigram counts) is a tiny re-aggregation of it, the corpus
    total a broadcast 1-row aggregate, and the per-doc score a WEIGHTED
    average (Σ k·ln(c/t) / Σ k — identical to the per-occurrence mean)
    over the same compressed rows.  The explode therefore runs exactly
    once (round-5 shape ran it twice: once for the model, once for the
    score stream).  Everything is JVM-side expression work, no UDFs.
    """
    # bigrams via zip_with over the split char array (split once, zip
    # shifted slices) — measured 2× faster at sf0.1 than the
    # substring-per-index transform (3.68 → 1.88 s), same rows.
    # The length >= 2 filter also sidesteps Spark's sequence(1, 0)
    # counting DOWN instead of yielding empty (matches the oracle's
    # WHERE length >= 2).
    chars = F.split(F.col(text_col), "")
    n = F.size(chars)
    bigrams = F.zip_with(
        F.slice(chars, 1, n - 1),
        F.slice(chars, 2, n - 1),
        lambda a, b: F.concat(a, b),
    )
    # fan_out before the explode: a one-file corpus otherwise runs the
    # whole char-split + zip_with + explode single-threaded in the one
    # scan task feeding the first shuffle (round-13 measurement)
    grams = fan_out(
        df.filter(F.length(F.col(text_col)) >= 2).select(id_col, text_col)
    ).select(F.col(id_col), F.explode(bigrams).alias("bigram"))
    # persist (columnar cache), NOT localCheckpoint: model and score
    # branches prune different columns so plain exchange reuse cannot
    # dedupe them, and this frame is CORPUS-SCALE (|docs| × bigrams/doc
    # rows — 123M at the 256× deep-scale point).  A localCheckpoint
    # stores it as deserialized row objects whose blocks the truncated
    # lineage must keep, and at 256× that pinned storage starved the
    # downstream score aggregation into AGGREGATE_OUT_OF_MEMORY; the
    # SQL columnar cache is compressed (~10× smaller here) and
    # evictable-to-disk, so execution memory always wins.
    from pyspark.storagelevel import StorageLevel

    pairs = (
        grams.groupBy(id_col, "bigram")
        .agg(F.count("*").cast("long").alias("k"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    model = pairs.groupBy("bigram").agg(F.sum("k").cast("long").alias("c"))
    total = model.agg(F.sum("c").cast("double").alias("t"))
    out = (
        pairs.join(F.broadcast(model), "bigram")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.sum("k").cast("long").alias("n_bigrams"),
            F.round(
                F.sum(
                    F.col("k") * F.log(F.col("c").cast("double") / F.col("t"))
                )
                / F.sum("k"),
                6,
            ).alias("lm_score"),
        )
    )
    # cache lifetime is scoped to THIS call (default): the returned
    # frame is doc-level (|docs| rows, 3 scalar cols — trivially
    # holdable), so materialize it eagerly and release the corpus-scale
    # cache before returning.  Without this, every invocation in a
    # long-lived session (the 175-query bench, a pipeline runner)
    # accumulated cached bigram partitions until LRU pressure
    # (round-10 verdict).  ``materialize=False`` returns the lazy plan
    # and the CALLER owns the cache lifetime (clearCache / unpersist).
    if materialize:
        out = out.localCheckpoint(eager=True)
        pairs.unpersist()
    return out


def _bpe_merge_word(tokens: list, a: str, b: str, merged: str) -> list:
    """Greedy left-to-right non-overlapping merge of (a, b) → merged."""
    out: list = []
    for t in tokens:
        if out and out[-1] == a and t == b:
            out[-1] = merged
        else:
            out.append(t)
    return out


def bpe_learn_merges(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    iters: int = 1,
) -> DataFrame:
    """Byte-pair-encoding merge training over the corpus — the
    vocabulary-learning step of tokenizer construction.  Words are
    whitespace tokens, initial symbols are characters; each iteration
    counts adjacent symbol pairs corpus-wide, picks the most frequent
    (ties: lexicographically smallest pair — deterministic), and
    applies it greedily left-to-right within every word.

    Returns one row per learned merge: ``(merge_rank, left, right,
    pair_count)`` — the ordered merge table a tokenizer ships.

    Scale shape: per iteration, ONE pair-count shuffle (map-side
    partial) and one driver-visible argmax via ``TakeOrdered`` of a
    single row (the merge RULE is O(1) model state — collecting it is
    the k-means-centroid pattern, not a data collect).  Merge
    application is per-word Python inside Arrow ``mapInPandas`` (ragged
    greedy scan, the honest kernel); the corpus is re-tokenized
    lazily per round off the previous round's ``localCheckpoint`` —
    checkpoint blocks (unlike ``.cache()``) are reclaimed by the
    ContextCleaner as each round's frame goes out of scope, so an
    N-merge run holds at most two rounds of corpus state, not N.
    """
    if iters < 1:
        raise ValueError("iters must be >= 1")
    import pandas as pd
    from pyspark.sql import types as T

    sess = df.sparkSession
    words_schema = T.StructType([T.StructField("syms", T.ArrayType(T.StringType()))])

    def to_words(batches):
        for pdf in batches:
            out = []
            for text in pdf[text_col]:
                if text is None:
                    continue
                for w in text.split(" "):
                    if w:
                        out.append(list(w))
            yield pd.DataFrame({"syms": out})

    words = fan_out(df.select(text_col)).mapInPandas(to_words, words_schema)
    words = words.localCheckpoint(eager=False)
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(iters):
        pairs = (
            words.select(
                F.explode(
                    F.zip_with(
                        F.slice(F.col("syms"), 1, F.size("syms") - 1),
                        F.slice(F.col("syms"), 2, F.size("syms") - 1),
                        lambda x, y: F.struct(x.alias("l"), y.alias("r")),
                    )
                ).alias("p")
            )
            .groupBy("p.l", "p.r")
            .agg(F.count("*").cast("long").alias("c"))
        )
        top = pairs.orderBy(F.col("c").desc(), F.col("l"), F.col("r")).limit(1).collect()
        if not top:
            break
        row = top[0]
        a, b, cnt = row["l"], row["r"], row["c"]
        merges.append((rank, a, b, int(cnt)))
        merged_sym = a + b

        def apply_merge(batches, _a=a, _b=b, _m=merged_sym):
            for pdf in batches:
                yield pd.DataFrame(
                    {"syms": [_bpe_merge_word(s, _a, _b, _m) for s in pdf["syms"]]}
                )

        words = words.mapInPandas(apply_merge, words_schema).localCheckpoint(
            eager=False
        )
    return sess.createDataFrame(
        merges, "merge_rank long, left string, right string, pair_count long"
    )


def bpe_encode(
    df: DataFrame,
    merges: "list[tuple[str, str]]",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply an ORDERED BPE merge table and count tokens per document —
    entirely JVM-side, no Python kernel.

    The trick: give every symbol a single-character representation
    (original chars stand for themselves; merge k mints the private-use
    codepoint U+E000+k).  A word's symbol sequence is then literally a
    character string, and one greedy left-to-right non-overlapping
    merge of pair (a, b) is exactly one ``replace(word, repr(a) ||
    repr(b), chr(0xE000+k))`` — ``replace`` substitutes left-to-right
    and never overlaps, the same scan order BPE specifies.  Folding the
    merge table into a chain of ``replace`` calls turns tokenization
    into a map-only whole-stage-codegen expression: no UDF, no shuffle,
    composable with scan pruning at any corpus size.

    ``merges`` is the (small, driver-held) tokenizer model — the same
    model-as-literal posture as ``rebalance_to_mix``'s target shares.
    Each ``left``/``right`` must be a single original character or the
    concatenation produced by an earlier merge (standard BPE table
    well-formedness; validated here).  Corpus text must not contain
    U+E000..U+F8FF private-use codepoints (asserted nowhere — document
    corpus hygiene upstream).

    Returns ``(id, n_tokens)`` with ``n_tokens`` the post-merge symbol
    count over whitespace-split words (whitespace itself untokenized).
    """
    sym_repr: dict[str, str] = {}
    for k, (left, right) in enumerate(merges):
        lr = sym_repr.get(left)
        if lr is None:
            if len(left) != 1:
                raise ValueError(f"merge {k}: left {left!r} is not a known symbol")
            lr = left
        rr = sym_repr.get(right)
        if rr is None:
            if len(right) != 1:
                raise ValueError(f"merge {k}: right {right!r} is not a known symbol")
            rr = right
        sym_repr[left + right] = chr(0xE000 + k)

    def chain(word: Column) -> Column:
        out = word
        # rebuild the same fold over column expressions
        reprs: dict[str, str] = {}
        for k, (left, right) in enumerate(merges):
            lr = reprs.get(left, left)
            rr = reprs.get(right, right)
            out = F.replace(out, F.lit(lr + rr), F.lit(chr(0xE000 + k)))
            reprs[left + right] = chr(0xE000 + k)
        return out

    n_tokens = F.aggregate(
        F.transform(F.split(F.col(text_col), " "), lambda w: F.length(chain(w))),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x.cast("long"),
    )
    return df.select(F.col(id_col), n_tokens.alias("n_tokens"))


# fixed alphabet for char_entropy: 26 letters + space; everything else
# falls into one "other" bucket.  A literal list keeps the whole count
# vector a codegen'd expression — no explode, no per-char rows.
ENTROPY_ALPHABET = [chr(c) for c in range(ord("a"), ord("z") + 1)] + [" "]


def char_entropy(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Shannon entropy of the character distribution per document —
    the classic gibberish/boilerplate screen (uniform noise scores
    high, 'aaaa...' and template spam score low; natural English sits
    ~2.9-3.1 bits over this alphabet).

    Counting is `length(t) - length(replace(t, ch))` per alphabet char
    — 27 pure-JVM string expressions, map-only, zero shuffle, zero
    explode (an explode-per-char plan multiplies the corpus 1000x
    before aggregating it right back).  The entropy sum is a FLAT
    when-chain over the 28 counts in literal order — deliberately no
    array/aggregate/filter HOFs: one HOF anywhere in the projection
    knocks the WHOLE stage out of codegen into interpreted eval, where
    the shared lower()/length() subtrees are re-evaluated per count
    (measured 3.1 s → 1.2 s steady-state at sf0.1; the residual is
    per-invocation plan cost, not row work — sf0.001 times the same).
    Flat
    order is fixed, so the rounded result stays engine-exact."""
    import math

    t = F.lower(F.col(text_col))
    n = F.length(t)
    # stage 1: count each alphabet char, ALIASED — and keep the fan_out
    # exchange between the two selects as a CollapseProject barrier.
    # Inlined, the `other` term would structurally re-expand the
    # 27-count sum on every use (~1 s of Catalyst analysis per
    # invocation at ANY data size — measured); behind the barrier the
    # entropy chain is plain column refs and the plan stays small.
    counted = fan_out(
        df.select(
            "doc_id",
            n.alias("_n"),
            *[
                (n - F.length(F.replace(t, F.lit(ch), F.lit("")))).alias(f"_c{i}")
                for i, ch in enumerate(ENTROPY_ALPHABET)
            ],
        )
    )
    nn = F.col("_n")
    counts = [F.col(f"_c{i}") for i in range(len(ENTROPY_ALPHABET))]
    known = counts[0]
    for c in counts[1:]:
        known = known + c
    other = nn - known
    log2 = math.log(2.0)

    def term(c):
        p = c.cast("double") / nn
        return F.when(c > 0, -p * F.log(p) / F.lit(log2)).otherwise(F.lit(0.0))

    ent = term(counts[0])
    for c in counts[1:]:
        ent = ent + term(c)
    ent = ent + term(other)
    return counted.select(
        "doc_id",
        nn.cast("long").alias("n_chars_total"),
        F.round(ent, 6).alias("char_entropy_bits"),
    )


def chunks_reassemble(
    chunks: DataFrame,
    chunk: int = 64,
    overlap: int = 16,
    id_col: str = "doc_id",
) -> DataFrame:
    """Inverse of :func:`doc_chunks`: stitch overlapping chunk rows back
    into the original document text — the round-trip a chunked
    embedding/training store needs for audits and re-exports (prove no
    tokens were lost or duplicated at chunk boundaries).

    De-overlap rule: every chunk contributes its first ``chunk -
    overlap`` tokens; the LAST chunk (max index) contributes all of
    them.  One keyed shuffle: a max-index window and the ordered
    re-concat groupBy both hash on the doc id, so Catalyst reuses the
    single exchange."""
    if overlap >= chunk:
        raise ValueError(f"overlap {overlap} must be < chunk {chunk}")
    from pyspark.sql import Window

    step = chunk - overlap
    w = Window.partitionBy(id_col)
    t = F.split(F.col("chunk_text"), " ")
    part = F.when(
        F.col("chunk_idx") < F.max("chunk_idx").over(w),
        F.slice(t, 1, step),
    ).otherwise(t)
    return (
        chunks.withColumn("_part", part)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.array_join(
                F.flatten(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.struct(F.col("chunk_idx"), F.col("_part"))
                            )
                        ),
                        lambda s: s["_part"],
                    )
                ),
                " ",
            ).alias("text"),
        )
    )


def trigram_lm_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    l3: float = 0.6,
    l2: float = 0.3,
    l1: float = 0.1,
    materialize: bool = True,
) -> DataFrame:
    """Interpolated word-trigram language-model score.  EAGER BY
    DEFAULT: with ``materialize=True`` this runs a Spark job AT CALL
    TIME and returns a localCheckpoint-ed, lineage-free frame (pass
    ``materialize=False`` for the lazy plan; the caller then owns the
    corpus-scale cache lifetime).

    The KenLM-shaped fluency filter one step up from
    ``bigram_lm_scores``:
    train MLE trigram/bigram/unigram models on the corpus itself and
    score every document by the average log of the interpolated
    probability  λ3·P(w3|w1w2) + λ2·P(w3|w2) + λ1·P(w3).

    Contract (pinned so an independent engine replays it): every count
    derives from the TRIGRAM EVENT STREAM (token positions 3..n) —
    c3(w1w2w3); ctx2(w1w2)=Σ_w3 c3; c2(w2w3)=Σ_w1 c3; ctx1(w2)=Σ_w1w3
    c3; c1(w3)=Σ_w1w2 c3; T=Σ c3 — so the three MLE models are
    self-consistent and no boundary convention leaks in.  Per-trigram
    log-probs are rounded at 6 dp in the MODEL (before the per-doc
    weighted average), ties and ordering never matter.  Documents with
    fewer than 3 tokens have no events and no row.

    Output: ``(id, n_trigrams, lm_score)``.

    Scale shape: ONE explode collapses immediately to per-(doc,
    trigram) counts (map-side combine bounds rows at |doc| × distinct
    trigrams); the persisted compressed frame feeds BOTH the model
    (re-aggregations of it — the bigram_lm lesson: never explode
    twice) and the score join.  Model enrichment joins are
    model-side-only (distinct trigrams), the doc side joins once on
    the trigram key.  No UDFs anywhere."""
    from pyspark.storagelevel import StorageLevel

    if abs(l3 + l2 + l1 - 1.0) > 1e-9:
        raise ValueError("interpolation weights must sum to 1")
    w = F.split(F.col(text_col), r"\s+")
    n = F.size(w)
    tri = F.zip_with(
        F.zip_with(
            F.slice(w, 1, n - 2),
            F.slice(w, 2, n - 2),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
        F.slice(w, 3, n - 2),
        lambda ab, c: F.struct(
            ab["w1"].alias("w1"), ab["w2"].alias("w2"), c.alias("w3")
        ),
    )
    events = (
        # fan_out before the explode — same single-scan-task fix as
        # bigram_lm_scores (round-13)
        fan_out(
            df.filter(F.size(F.split(F.col(text_col), r"\s+")) >= 3).select(
                id_col, text_col
            )
        )
        .select(F.col(id_col), F.explode(tri).alias("t"))
        .select(id_col, F.col("t.w1").alias("w1"), F.col("t.w2").alias("w2"),
                F.col("t.w3").alias("w3"))
        .groupBy(id_col, "w1", "w2", "w3")
        .agg(F.count("*").cast("long").alias("k"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    from pyspark.sql.window import Window

    c3 = events.groupBy("w1", "w2", "w3").agg(F.sum("k").cast("long").alias("c3"))
    # ctx2 (w1w2), c2 (w2w3) and ctx1 (w2) all cluster on subsets/
    # supersets CONTAINING w2, so one hash exchange keyed w2 serves all
    # three as window sums (HashPartitioning(w2) satisfies each
    # window's ClusteredDistribution; only local sorts differ, and the
    # (w2,w3) sort already covers the (w2) window).  The previous
    # shape re-aggregated c3 four times and re-joined the results on
    # four different keys — 4 extra trigram-cardinality exchanges per
    # model build (guide §2.3/§2.4).  Values are identical: window
    # sums over the same groups, cardinality one row per trigram
    # throughout.  Only c1 (w3) needs its own key — one aggregation +
    # one join.
    byw2 = c3.repartition("w2")
    enriched = (
        byw2.withColumn(
            "ctx2", F.sum("c3").over(Window.partitionBy("w1", "w2"))
        )
        .withColumn("c2", F.sum("c3").over(Window.partitionBy("w2", "w3")))
        .withColumn("ctx1", F.sum("c3").over(Window.partitionBy("w2")))
    )
    # c1 (w3) as a WINDOW over the same one-row-per-trigram frame after
    # one w3-keyed exchange, not a separate groupBy + sort-merge join:
    # the join form re-aggregated c3 (an extra trigram-cardinality
    # exchange) and then shuffled BOTH sides again to merge on w3 — the
    # window form pays exactly one exchange of rows that had to move to
    # a w3 key anyway (guide §2.4).  Values identical: enriched is one
    # row per distinct trigram, so the w3-partition window sum equals
    # the w3 groupBy sum (long addition, order-independent).
    enriched = enriched.repartition("w3").withColumn(
        "c1", F.sum("c3").over(Window.partitionBy("w3"))
    )
    total = c3.agg(F.sum("c3").cast("double").alias("t"))
    p = (
        F.lit(l3) * F.col("c3").cast("double") / F.col("ctx2")
        + F.lit(l2) * F.col("c2").cast("double") / F.col("ctx1")
        + F.lit(l1) * F.col("c1").cast("double") / F.col("t")
    )
    model = (
        enriched.crossJoin(F.broadcast(total))
        # DECIMAL(18,6): the 6-dp-rounded log-prob is exactly
        # representable, so the per-doc weighted sum below is decimal
        # addition — order-independent.  (The double form mismatched
        # the oracle on 21/5000 docs at sf0.1 purely on sum order.)
        .select(
            "w1", "w2", "w3",
            F.round(F.log(p), 6).cast("decimal(18,6)").alias("lp"),
        )
    )
    out = (
        events.join(model, ["w1", "w2", "w3"])
        .groupBy(id_col)
        .agg(
            F.sum("k").cast("long").alias("n_trigrams"),
            F.round(
                F.sum(F.col("k") * F.col("lp")).cast("double") / F.sum("k"), 6
            ).alias("lm_score"),
        )
    )
    # scope the corpus-scale cache to this call (see bigram_lm_scores);
    # materialize=False returns the lazy plan, caller owns the cache
    if materialize:
        out = out.localCheckpoint(eager=True)
        events.unpersist()
    return out
