"""Unit tests for the LLM-data operators (dedup, similarity, text)
against hand-computed expectations on tiny in-memory frames — the
operators' scale behavior is covered by the sf0.01 oracle harness;
these pin the *semantics* independent of DuckDB.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from cherry_pipelines_spark.operators import dedup, similarity, text


def _h32(s: str) -> int:
    return int(hashlib.sha256(s.encode()).hexdigest()[:8], 16)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates(spark):
    df = _docs(spark, [(1, "a b"), (2, "a b"), (3, "c")])
    out = {r["content_hash"]: r for r in dedup.exact_duplicates(df).collect()}
    dup = hashlib.sha256(b"a b").hexdigest()
    assert out[dup]["canonical_doc_id"] == 1 and out[dup]["n_copies"] == 2
    solo = hashlib.sha256(b"c").hexdigest()
    assert out[solo]["n_copies"] == 1


def test_shingles_and_minhash_signature(spark):
    df = _docs(spark, [(1, "a b c d")])
    sh = {r["shingle"] for r in dedup.shingles_df(df).collect()}
    assert sh == {"a b c", "b c d"}
    sig = dedup.minhash_signatures(df, k=2).collect()[0]
    hs = [_h32("a b c"), _h32("b c d")]
    assert sig["mh0"] == min((37 * h + 101) % dedup.MINHASH_P for h in hs)
    assert sig["mh1"] == min((49 * h + 198) % dedup.MINHASH_P for h in hs)


def test_minhash_lsh_candidates_pairs_identical_docs(spark):
    df = _docs(
        spark,
        [(1, "w x y z"), (2, "w x y z"), (3, "entirely different words here")],
    )
    pairs = {(r["doc_a"], r["doc_b"]) for r in dedup.minhash_lsh_candidates(df).collect()}
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)


def test_lsh_recall_stats_counts_and_recall(spark):
    # two identical docs (exact pair + LSH collision) plus an unrelated
    # doc: n_exact = n_hit = 1, recall = 1.0, and the candidate count
    # matches the standalone LSH operator on the same corpus
    df = _docs(
        spark,
        [(1, "w x y z"), (2, "w x y z"), (3, "entirely different words here")],
    )
    row = dedup.lsh_recall_stats(df, threshold=0.5).collect()[0]
    n_cand = dedup.minhash_lsh_candidates(df).count()
    assert (row["n_exact"], row["n_hit"]) == (1, 1)
    assert row["n_candidates"] == n_cand
    assert row["recall"] == 1.0


def test_lsh_recall_stats_no_exact_pairs_recall_one(spark):
    # zero exact pairs used to divide to NULL (non-ANSI Spark), which
    # reads as missing data; the vacuous case is now explicit recall=1.0
    # (round-7 advice)
    df = _docs(
        spark,
        [(1, "alpha beta gamma delta"), (2, "entirely different words here")],
    )
    row = dedup.lsh_recall_stats(df, threshold=0.5).collect()[0]
    assert row["n_exact"] == 0
    assert row["recall"] == 1.0


def test_lsh_recall_stats_matches_naive_composition(spark):
    # the shared-pass evaluator must agree with composing the exact and
    # LSH operators independently on a mixed corpus (near-dups, exact
    # dups, and unique docs)
    docs = [(i, f"tok{i} a b c d e f") for i in range(8)]
    docs += [(100, "a b c d e f g h"), (101, "a b c d e f g h"),
             (102, "a b c d e f g x")]
    df = _docs(spark, docs)
    row = dedup.lsh_recall_stats(df, threshold=0.5).collect()[0]
    exact = dedup.ngram_jaccard_pairs(df, threshold=0.5).select("doc_a", "doc_b")
    cand = dedup.minhash_lsh_candidates(df)
    hits = {(r["doc_a"], r["doc_b"]) for r in cand.collect()} & {
        (r["doc_a"], r["doc_b"]) for r in exact.collect()
    }
    assert row["n_exact"] == exact.count()
    assert row["n_candidates"] == cand.count()
    assert row["n_hit"] == len(hits)


def test_simhash_identical_docs_equal(spark):
    df = _docs(spark, [(1, "p q r"), (2, "p q r"), (3, "zz yy xx")])
    out = {r["doc_id"]: r["simhash"] for r in dedup.simhash(df).collect()}
    assert out[1] == out[2]
    assert 0 <= out[1] < (1 << 16)


def test_ngram_jaccard_exact_value(spark):
    # doc1: {a b c, b c d}; doc2: {b c d, c d e} → inter 1, union 3
    df = _docs(spark, [(1, "a b c d"), (2, "b c d e")])
    rows = dedup.ngram_jaccard_pairs(df, threshold=0.0).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["doc_a"], r["doc_b"], r["n_common"]) == (1, 2, 1)
    assert float(r["jaccard"]) == round(1 / 3, 6)


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, label long, embedding array<float>")


def test_cosine_topk_orders_by_similarity(spark):
    corpus = _vecs(
        spark,
        [
            (1, 0, [1.0, 0.0]),
            (2, 0, [0.9, 0.1]),
            (3, 0, [0.0, 1.0]),
            (4, 0, [-1.0, 0.0]),
        ],
    )
    q = corpus.filter(F.col("vec_id") == 1)
    out = similarity.cosine_topk(corpus, q, k=3).orderBy("rank").collect()
    assert [r["neighbor_id"] for r in out] == [2, 3, 4]
    expect = 0.9 / math.sqrt(0.9**2 + 0.1**2)
    assert abs(float(out[0]["cos"]) - round(expect, 6)) < 1e-9


def test_ivf_topk_restricts_to_cell(spark):
    corpus = _vecs(
        spark,
        [
            (1, 0, [0.1, 0.1]),
            (2, 0, [0.2, 0.2]),  # same 0.5-grid cell as 1
            (3, 0, [5.0, 5.0]),  # far cell — must not appear
        ],
    )
    q = corpus.filter(F.col("vec_id") == 1)
    out = similarity.ivf_topk(corpus, q, k=5).collect()
    assert {r["neighbor_id"] for r in out} == {2}


def test_cosine_near_dup_pairs_threshold(spark):
    df = _vecs(
        spark,
        [
            (1, 7, [1.0, 0.0]),
            (2, 7, [1.0, 0.01]),
            (3, 7, [0.0, 1.0]),
            (4, 8, [1.0, 0.0]),  # same direction but different group
        ],
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in similarity.cosine_near_dup_pairs(df, threshold=0.99).collect()
    }
    assert pairs == {(1, 2)}


def test_token_stats_and_quality(spark):
    df = _docs(spark, [(1, "the cat, sat!")])
    ts = text.token_stats(df).collect()[0]
    assert ts["ws_tokens"] == 3
    # pieces: the / cat / , / sat / !
    assert ts["bpe_tokens"] == 5
    assert ts["n_chars_computed"] == 13
    q = text.quality_score(df).collect()[0]
    assert q["n_tokens"] == 3
    assert float(q["stop_ratio"]) == round(1 / 3, 6)
    assert float(q["punct_ratio"]) == round(2 / 13, 6)


def test_has_live_repartition_tree_anchored(spark):
    """fan_out's repartition detection must read NODE names at tree-line
    starts and stop at the first partitioning-collapsing operator — a
    repartition buried below a groupBy, or the word 'Repartition' inside
    a string literal, must NOT suppress the fan-out (round-7 advice)."""
    from cherry_pipelines_spark.operators.text import _has_live_repartition

    base = _docs(spark, [(1, "a b"), (2, "c d")])
    # live repartition above (possibly through) narrow ops -> True
    assert _has_live_repartition(base.repartition(4))
    assert _has_live_repartition(
        base.repartition(4).withColumn("n", F.length("text"))
    )
    # repartition BELOW an aggregation: layout collapsed -> False
    agg = base.repartition(4).groupBy("doc_id").count()
    assert not _has_live_repartition(agg)
    # 'Repartition' appearing only inside a string literal -> False
    lit = base.withColumn("note", F.lit("Repartition is a fine word"))
    assert not _has_live_repartition(lit)
    # plain scan -> False
    assert not _has_live_repartition(base)


def test_language_id_markers(spark):
    df = _docs(
        spark,
        [
            (1, "the cat and the dog of y"),
            (2, "el que la de y"),
            (3, "der die und das ist"),
        ],
    )
    out = {r["doc_id"]: r["pred_lang"] for r in text.language_id(df).collect()}
    assert out == {1: "en", 2: "es", 3: "de"}


def test_fingerprint_min_max(spark):
    df = _docs(spark, [(1, "a b c d")])
    r = text.fingerprint(df).collect()[0]
    hs = [_h32("a b c"), _h32("b c d")]
    assert (r["fp_min"], r["fp_max"], r["n_shingles"]) == (min(hs), max(hs), 2)


def test_minhash_lsh_bucket_cap_preserves_connectivity(spark):
    """A bucket over max_bucket still yields one connected component:
    within-cap pairs are exhaustive, overflow members pair with the
    bucket minimum."""
    from cherry_pipelines_spark.operators.dedup import (
        duplicate_clusters,
        minhash_lsh_candidates,
    )

    docs = spark.createDataFrame(
        [(i, "identical text body repeated for every document here") for i in range(9)],
        "doc_id long, text string",
    )
    pairs = minhash_lsh_candidates(docs, max_bucket=4)
    got = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
    # capped members pair fully; overflow (4..8) pairs only with min id 0
    assert {(0, i) for i in range(1, 9)} <= got
    assert (4, 5) not in got
    clusters = duplicate_clusters(docs, pairs)
    assert clusters.select("cluster_id").distinct().count() == 1


def test_ngram_jaccard_max_df_drops_stop_shingle_pairs(spark):
    """With a df cut, pairs supported only by a ubiquitous shingle
    disappear and surviving jaccard is never inflated."""
    from cherry_pipelines_spark.operators.dedup import ngram_jaccard_pairs

    common = "the quick brown"
    docs = spark.createDataFrame(
        [
            (1, f"{common} fox jumps high"),
            (2, f"{common} fox jumps high"),   # true duplicate of 1
            (3, f"{common} cat sits low"),     # shares only the stop shingle
        ],
        "doc_id long, text string",
    )
    exact = {(r["doc_a"], r["doc_b"]): r["jaccard"]
             for r in ngram_jaccard_pairs(docs, threshold=0.0).collect()}
    cut = {(r["doc_a"], r["doc_b"]): r["jaccard"]
           for r in ngram_jaccard_pairs(docs, threshold=0.0, max_df=2).collect()}
    assert (1, 2) in exact and (1, 3) in exact
    assert (1, 2) in cut and (1, 3) not in cut  # stop-shingle-only pair gone
    assert float(cut[(1, 2)]) <= float(exact[(1, 2)])  # never inflated


def test_dot_fold_ragged_null_element_yields_null(spark):
    # mixed lengths in one Arrow batch force the per-row fallback; a NULL
    # element inside a pair must yield NULL (JVM fold semantics), not a
    # task-failing TypeError
    df = spark.createDataFrame(
        [
            ([1.0, 2.0], [3.0, 4.0]),
            ([1.0, None, 2.0], [1.0, 1.0, 1.0]),
        ],
        "a array<double>, b array<double>",
    )
    got = df.select(
        similarity._dot_fold("a", "b").alias("udf"),
        similarity._dot(F.col("a"), F.col("b")).alias("jvm"),
    ).collect()
    assert got[0]["udf"] == got[0]["jvm"] == 11.0
    assert got[1]["udf"] is None and got[1]["jvm"] is None


def test_ngram_jaccard_lsh_prefilter_matches_exact_for_candidates(spark):
    """With generous LSH params (bands=k → collide on any one minhash)
    the prefiltered path returns the same pairs and the SAME jaccard
    values as exact mode — the prefilter only prunes, never rescores."""
    from cherry_pipelines_spark.operators.dedup import ngram_jaccard_pairs

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon eta"),   # near-dup of 1
            (3, "one two three four five six"),
            (4, "one two three four five six"),          # exact dup of 3
            (5, "totally different words entirely here now"),
        ],
        "doc_id long, text string",
    )
    exact = {(r["doc_a"], r["doc_b"]): r["jaccard"]
             for r in ngram_jaccard_pairs(docs, threshold=0.3).collect()}
    pre = {(r["doc_a"], r["doc_b"]): r["jaccard"]
           for r in ngram_jaccard_pairs(
               docs, threshold=0.3, lsh_prefilter=True, lsh_k=8, lsh_bands=8
           ).collect()}
    assert set(pre) <= set(exact)  # prefilter can only prune
    assert (3, 4) in pre and (1, 2) in pre  # dups collide in some band
    for p, j in pre.items():
        assert float(j) == float(exact[p])  # identical scoring


def test_ngram_jaccard_lsh_prefilter_plan_is_candidate_driven(spark):
    """The prefiltered plan must contain no shingle=shingle self-join:
    the verify join is keyed on (doc_b, shingle) driven by the candidate
    pairs, so a stop shingle cannot fan out N² rows."""
    from cherry_pipelines_spark.operators.dedup import ngram_jaccard_pairs
    from cherry_pipelines_spark.plans import explain_str

    docs = spark.createDataFrame(
        [(i, f"w{i} common text body shared") for i in range(20)],
        "doc_id long, text string",
    )
    plan = explain_str(
        ngram_jaccard_pairs(docs, lsh_prefilter=True), mode="extended"
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # the exact-mode self-join condition (shingle = shingle with a
    # doc_id < doc_id residual) must not appear anywhere in the plan
    import re

    assert not re.search(r"doc_id#\d+L? < doc_id#\d+", plan)


def test_bpe_encode_matches_reference_python(spark):
    """The replace-chain encoder must equal a plain-python greedy BPE
    (symbol-list semantics) on multi-level merge tables."""
    from cherry_pipelines_spark.operators.text import _bpe_merge_word, bpe_encode

    merges = [("t", "h"), ("th", "e"), ("a", "n"), ("an", "d"), ("e", "r")]
    texts = [
        (1, "the theater and other anthems"),
        (2, "thththe"),          # overlap posture: greedy left-to-right
        (3, ""),                  # empty text -> 0 tokens
        (4, "xyz"),               # no merges apply
        (5, "and and and"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {r["doc_id"]: r["n_tokens"] for r in bpe_encode(df, merges).collect()}

    def py_encode(text):
        total = 0
        for w in text.split(" "):
            syms = list(w)
            for left, right in merges:
                syms = _bpe_merge_word(syms, left, right, left + right)
            total += len(syms)
        return total

    for i, t in texts:
        assert got[i] == py_encode(t), (i, t, got[i], py_encode(t))


def test_bpe_encode_rejects_unknown_symbol(spark):
    import pytest

    from cherry_pipelines_spark.operators.text import bpe_encode

    df = spark.createDataFrame([(1, "ab")], "doc_id long, text string")
    with pytest.raises(ValueError):
        bpe_encode(df, [("ab", "c")])  # 'ab' never minted by a prior merge


def test_containment_asymmetry_catches_quotes(spark):
    """A short doc quoted verbatim inside a long doc: jaccard is small
    but containment(short→long) = 1."""
    from cherry_pipelines_spark.operators.dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    quote = "alpha beta gamma delta epsilon zeta"
    filler = " ".join(f"w{i}" for i in range(60))
    rows = [(1, quote), (2, filler + " " + quote + " " + filler)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = containment_pairs(df, threshold=0.8).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.doc_a, r.doc_b) == (1, 2)
    assert r.cont_a_in_b == 1.0  # every shingle of the quote is in the page
    assert r.cont_b_in_a < 0.1
    # whole-doc jaccard misses the same pair at any useful threshold
    assert ngram_jaccard_pairs(df, threshold=0.5).count() == 0


def test_chunks_roundtrip_exact(spark):
    from cherry_pipelines_spark.operators.text import chunks_reassemble, doc_chunks

    texts = [
        " ".join(f"t{i}" for i in range(200)),  # many chunks
        " ".join(f"t{i}" for i in range(64)),   # exactly one chunk
        " ".join(f"t{i}" for i in range(65)),   # one token spills
        " ".join(f"t{i}" for i in range(48)),   # shorter than a chunk
        "solo",                                  # single token
    ]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    back = chunks_reassemble(doc_chunks(df, chunk=64, overlap=16))
    got = {r.doc_id: r.text for r in back.collect()}
    for i, t in enumerate(texts):
        assert got[i] == t, i


def test_chunks_reassemble_validates_overlap(spark):
    from cherry_pipelines_spark.operators.text import chunks_reassemble

    df = spark.createDataFrame([(1, 0, "x")], "doc_id long, chunk_idx long, chunk_text string")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        chunks_reassemble(df, chunk=16, overlap=16)


def test_normalize_text_order_and_counts(spark):
    from cherry_pipelines_spark.operators.text import normalize_text

    df = spark.createDataFrame(
        [(1, "\tA\x01B  Big\n\nDeal "), (2, "ok"), (3, "  ")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in normalize_text(df).collect()}
    # control char becomes a space FIRST, so A/B split into two tokens
    assert rows[1]["text_norm"] == "a b big deal"
    assert rows[1]["n_chars_raw"] == len("\tA\x01B  Big\n\nDeal ")
    assert rows[1]["n_chars_norm"] == len("a b big deal")
    assert rows[2]["text_norm"] == "ok"
    assert rows[3]["text_norm"] == ""


def test_minhash_estimate_identical_docs_and_bounds(spark):
    from cherry_pipelines_spark.operators.dedup import minhash_jaccard_estimates

    docs = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon zeta"),  # exact dup of 1
        (3, "one two three four five six seven"),
        (4, "totally different words entirely here now"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = {(r["doc_a"], r["doc_b"]): r["jaccard_est"] for r in
            minhash_jaccard_estimates(df, k=8, bands=4).collect()}
    assert rows[(1, 2)] == 1.0  # identical signature => estimate 1
    for (a, b), est in rows.items():
        assert 0.0 <= est <= 1.0
        if (a, b) != (1, 2):
            assert est < 1.0


def test_duplicated_span_pairs_hand_case(spark):
    """Lee-et-al exact-substring verdict on a hand-built fixture: doc 2
    embeds doc 1's first 8 tokens verbatim (longest shared span = 8),
    doc 3 shares nothing, doc 4 repeats the same span twice (multiple
    diagonals, max unchanged, pair count doubled)."""
    span = "a b c d e f g h"
    rows = [
        (1, span + " i j"),
        (2, "x y " + span + " q r"),
        (3, "p q r s t u v w z0 z1"),
        (4, span + " mid1 mid2 " + span),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        (r["doc_a"], r["doc_b"]): (r["max_span_tokens"], r["shared_window_pairs"])
        for r in dedup.duplicated_span_pairs(df, k=4, max_window_occ=10).collect()
    }
    # an 8-token shared span holds 5 consecutive 4-token windows
    assert out[(1, 2)] == (8, 5)
    assert (1, 3) not in out and (2, 3) not in out
    # doc 4 carries the span twice: two diagonals vs doc 1 (5 matches
    # each), max span still 8
    assert out[(1, 4)] == (8, 10)


def test_duplicated_span_pairs_df_cap_drops_boilerplate(spark):
    """A window with MORE than max_window_occ corpus-wide occurrences is
    a boilerplate/quadratic key and must not generate pairs."""
    rows = [(i, "common boiler plate text here now") for i in range(5)]
    rows.append((100, "totally different words in this document friend"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.duplicated_span_pairs(df, k=4, max_window_occ=4).collect()
    assert out == []  # 5 docs share every window, cap=4 drops them all
    kept = dedup.duplicated_span_pairs(df, k=4, max_window_occ=5).collect()
    assert len(kept) == 10  # C(5,2) pairs once the cap admits them


def test_duplicated_span_pairs_short_and_null_docs(spark):
    """Docs with fewer than k tokens (including NULL/empty text) yield
    NO windows instead of crashing — Spark's sequence(1, 0) is the
    DESCENDING [1, 0] whose 0 start blows up slice() unguarded
    (review regression)."""
    rows = [
        (1, "a b c"),            # 3 tokens < k
        (2, None),               # NULL text
        (3, ""),                 # empty -> one '' token
        (4, "a b c d e f g h"),  # exactly k
        (5, "a b c d e f g h"),  # its twin
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        (r["doc_a"], r["doc_b"]): r["max_span_tokens"]
        for r in dedup.duplicated_span_pairs(df, k=8, max_window_occ=10).collect()
    }
    assert out == {(4, 5): 8}


def test_duplicated_span_pairs_occurrence_cap_bounds_repetitive_docs(spark):
    """The cap is on OCCURRENCES, not distinct docs: a degenerate
    repetitive doc pair (df=2 but huge per-doc counts) is exactly the
    quadratic join key the C(cap,2) bound must cover (review
    regression)."""
    spam = " ".join(["spam"] * 40)  # 37 identical 4-token windows
    rows = [(1, spam), (2, spam), (3, "alpha beta gamma delta epsilon zeta")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # the spam window occurs 74 times corpus-wide: cap 50 drops it even
    # though only 2 distinct docs carry it
    assert dedup.duplicated_span_pairs(df, k=4, max_window_occ=50).collect() == []
    kept = dedup.duplicated_span_pairs(df, k=4, max_window_occ=74).collect()
    assert [(r["doc_a"], r["doc_b"], r["max_span_tokens"]) for r in kept] == [
        (1, 2, 40)
    ]


def test_duplicated_span_occurrences_positions(spark):
    """The positioned form emits the exact token offsets a scrub pass
    cuts: doc 2 embeds doc 1's first 8 tokens at offset 2; doc 4
    carries the span twice (two runs, two positions)."""
    span = "a b c d e f g h"
    rows = [
        (1, span + " i j"),
        (2, "x y " + span + " q r"),
        (4, span + " mid1 mid2 " + span),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    occ = sorted(
        map(
            tuple,
            dedup.duplicated_span_occurrences(
                df, k=4, min_span_tokens=8, max_window_occ=10
            )
            .select("doc_a", "doc_b", "pos_a", "pos_b", "span_tokens")
            .collect(),
        )
    )
    # (1,2): doc1 pos 0 -> doc2 pos 2; (1,4): doc1 span at doc4 pos 0
    # and pos 10 ("a b c d e f g h mid1 mid2" = 10 tokens before rep 2)
    assert (1, 2, 0, 2, 8) in occ
    assert (1, 4, 0, 0, 8) in occ and (1, 4, 0, 10, 8) in occ
    # min_span filter: 8-token runs pass at min 8, die at min 9
    assert (
        dedup.duplicated_span_occurrences(
            df, k=4, min_span_tokens=9, max_window_occ=10
        ).count()
        == 0
    )
    # pair verdict unchanged by the refactor onto the shared helper
    pairs = {
        (r["doc_a"], r["doc_b"]): (r["max_span_tokens"], r["shared_window_pairs"])
        for r in dedup.duplicated_span_pairs(df, k=4, max_window_occ=10).collect()
    }
    assert pairs[(1, 2)] == (8, 5) and pairs[(1, 4)] == (8, 10)


def test_duplicated_span_scrub_hand_case(spark):
    """The scrub cuts each ≥min_span run from the LOWER-priority doc
    only: doc 1 (lowest id sharing the span) keeps its copy, doc 2
    loses the embedded 8 tokens (seam closes around them), doc 4 loses
    BOTH repetitions, doc 3 passes through untouched."""
    span = "a b c d e f g h"
    rows = [
        (1, span + " i j"),
        (2, "x y " + span + " q r"),
        (3, "p q r s t u v w z0 z1"),
        (4, span + " mid1 mid2 " + span),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["clean_text"])
        for r in dedup.duplicated_span_scrub(
            df, k=4, min_span_tokens=8, max_window_occ=10
        ).collect()
    }
    assert out[1] == (10, 0, span + " i j")          # keeper untouched
    assert out[2] == (12, 8, "x y q r")              # span cut, seam closed
    assert out[3] == (10, 0, "p q r s t u v w z0 z1")
    assert out[4] == (18, 16, "mid1 mid2")           # both repetitions cut


def test_duplicated_span_scrub_repass_is_clean_and_chains(spark):
    """Curation-chain invariant on the real fixture corpus: the
    scrubbed output re-passed through the span detector yields ZERO
    ≥min_span runs (exactly one copy of every long span survives), and
    the scrubbed frame chains into a downstream curation step on its
    clean_text column."""
    import os

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    scrubbed = dedup.duplicated_span_scrub(
        docs, k=8, min_span_tokens=16, max_window_occ=50
    ).localCheckpoint(eager=True)
    assert scrubbed.count() == docs.count()  # every doc passes through
    assert scrubbed.filter("n_removed > 0").count() > 0  # fixture has dups
    repass = dedup.duplicated_span_occurrences(
        scrubbed.select("doc_id", F.col("clean_text").alias("text")),
        k=8,
        min_span_tokens=16,
        max_window_occ=50,
    )
    assert repass.count() == 0
    # chains: a quality-style downstream op consumes clean_text
    stats = text.token_stats(
        scrubbed.select("doc_id", F.col("clean_text").alias("text"))
    )
    assert stats.count() == docs.count()


def test_benchmark_span_occurrences_and_scrub_hand_case(spark):
    """Cross-corpus span decontamination: doc 10 embeds benchmark doc
    1's 8-token span at offset 2 (positioned occurrence, cut from the
    CORPUS doc); doc 11 shares nothing; a corpus copy of the whole
    benchmark doc (doc 12) scrubs to ''."""
    from cherry_pipelines_spark.operators.contamination import (
        benchmark_span_occurrences,
        benchmark_span_scrub,
    )

    span = "a b c d e f g h"
    bench = spark.createDataFrame([(1, span)], "doc_id long, text string")
    corpus = spark.createDataFrame(
        [
            (10, "x y " + span + " q r"),
            (11, "p q r s t u v w z0 z1"),
            (12, span),
        ],
        "doc_id long, text string",
    )
    occ = sorted(
        map(
            tuple,
            benchmark_span_occurrences(
                corpus, bench, k=4, min_span_tokens=8
            )
            .select("doc_id", "bench_id", "pos_doc", "pos_bench", "span_tokens")
            .collect(),
        )
    )
    assert occ == [(10, 1, 2, 0, 8), (12, 1, 0, 0, 8)]
    out = {
        r["doc_id"]: (r["n_removed"], r["clean_text"])
        for r in benchmark_span_scrub(
            corpus, bench, k=4, min_span_tokens=8
        ).collect()
    }
    assert out[10] == (8, "x y q r")
    assert out[11] == (0, "p q r s t u v w z0 z1")
    assert out[12] == (8, "")  # benchmark copy fully removed


def test_benchmark_span_scrub_repass_is_clean(spark):
    """On the fixture corpus with the pseudo-benchmark convention
    (doc_id % 97 == 0): scrubbed corpus re-passed through the detector
    against the SAME benchmark yields zero ≥min_span runs, and every
    in-corpus benchmark copy is removed in full."""
    import os

    from cherry_pipelines_spark.operators.contamination import (
        benchmark_span_occurrences,
        benchmark_span_scrub,
    )

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    scrubbed = benchmark_span_scrub(
        docs, bench, k=8, min_span_tokens=16
    ).localCheckpoint(eager=True)
    assert scrubbed.count() == docs.count()
    # benchmark docs long enough to window must be fully self-scrubbed
    residue = scrubbed.filter(
        (F.col("doc_id") % 97 == 0)
        & (F.col("n_tokens") >= 8)
        & (F.col("n_removed") < F.col("n_tokens"))
    )
    assert residue.count() == 0
    repass = benchmark_span_occurrences(
        scrubbed.select("doc_id", F.col("clean_text").alias("text")),
        bench,
        k=8,
        min_span_tokens=16,
    )
    assert repass.count() == 0
