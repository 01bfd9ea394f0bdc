"""Tests for the training-data pipeline operators added beyond the
reference surface: sessionization (batch + native session_window),
deterministic sampling, PII scrubbing, repetition stats, tf-idf
keywords, and benchmark-contamination checks."""

from __future__ import annotations

import math
from collections import Counter

from pyspark.sql import functions as F

from cherry_pipelines_spark.operators.contamination import ngram_contamination
from cherry_pipelines_spark.operators.sampling import (
    group_topk,
    hash_sample,
    stratified_sample,
)
from cherry_pipelines_spark.operators.sessionize import session_stats, sessionize
from cherry_pipelines_spark.streaming.windows import session_window_agg


# ------------------------------------------------------------- sessions


def _session_rows():
    # user 1: gaps 5, 10(=gap, merges), 11(>gap, splits); user 2: single
    return [
        (1, 100), (1, 105), (1, 115), (1, 126),
        (2, 500),
    ]


def test_sessionize_gap_semantics(spark):
    df = spark.createDataFrame(_session_rows(), "user_id long, secs long")
    out = sessionize(df, ["user_id"], "secs", gap=10)
    got = {(r["user_id"], r["secs"]): r["session_idx"] for r in out.collect()}
    assert got == {
        (1, 100): 0, (1, 105): 0, (1, 115): 0,  # exact gap merges
        (1, 126): 1,                             # 11 > 10 splits
        (2, 500): 0,
    }


def test_session_stats_and_native_session_window_agree(spark):
    """The batch gaps-and-islands form and Spark's native session_window
    must produce the same sessions (start, end-of-last-event, count)."""
    df = spark.createDataFrame(_session_rows(), "user_id long, secs long")
    batch = {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in session_stats(df, ["user_id"], "secs", gap=10).collect()
    }
    native = session_window_agg(
        df.withColumn("ts", F.timestamp_seconds("secs")),
        "ts",
        "10 seconds",
        {"n_events": F.count(F.lit(1)).cast("long"), "first_secs": F.min("secs")},
        ("user_id",),
    )
    rows = native.collect()
    native_set = {(r["user_id"], r["first_secs"], r["n_events"]) for r in rows}
    assert batch == native_set == {(1, 100, 3), (1, 126, 1), (2, 500, 1)}
    # window close = last event + gap, even when the last event landed
    # exactly `gap` seconds after its predecessor (the (1,115) row) —
    # pins the oracle convention used by the sessionize_native query
    closes = {
        (r["user_id"], int(r["session_start"].timestamp())):
            int(r["session_end"].timestamp())
        for r in rows
    }
    assert closes == {(1, 100): 125, (1, 126): 136, (2, 500): 510}


# ------------------------------------------------------------- sampling


def test_hash_sample_partition_invariant(spark):
    df = spark.range(0, 2000).select(F.col("id"))
    a = {r["id"] for r in hash_sample(df, F.col("id"), 0.3).collect()}
    b = {
        r["id"]
        for r in hash_sample(df.repartition(17), F.col("id"), 0.3).collect()
    }
    assert a == b  # layout-independent
    assert 0.2 < len(a) / 2000 < 0.4  # near the nominal rate
    # monotone: a lower rate selects a subset
    c = {r["id"] for r in hash_sample(df, F.col("id"), 0.1).collect()}
    assert c <= a


def test_stratified_sample_rates(spark):
    df = spark.range(0, 3000).select(
        F.col("id"),
        F.when(F.col("id") % 3 == 0, "en").when(F.col("id") % 3 == 1, "de")
        .otherwise("zh").alias("lang"),
    )
    out = stratified_sample(
        df, "lang", {"en": 1.0, "de": 0.2}, F.col("id"), default_rate=0.0
    )
    got = Counter(r["lang"] for r in out.collect())
    assert got["en"] == 1000          # rate 1.0 keeps everything
    assert 120 < got["de"] < 280      # ~200
    assert got["zh"] == 0             # default 0.0


def test_group_topk_deterministic(spark):
    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 30.0), ("a", 3, 30.0), ("b", 4, 5.0)],
        "g string, id long, score double",
    )
    out = group_topk(df, ["g"], [F.col("score").desc(), F.col("id").asc()], k=2)
    got = sorted((r["g"], r["id"], r["rank_in_group"]) for r in out.collect())
    assert got == [("a", 2, 1), ("a", 3, 2), ("b", 4, 1)]


# ------------------------------------------------------------- text ops


def test_pii_scrub(spark):
    from cherry_pipelines_spark.operators.text import pii_scrub

    rows = [
        (1, "reach me at bob.smith+x@example.co.uk or 555-123-4567 ok"),
        (2, "clean text only"),
        (3, "a@b.io and c.d@e.org twice"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert got[1]["n_redactions"] == 2
    assert got[1]["text_scrubbed"] == "reach me at [REDACTED] or [REDACTED] ok"
    assert got[2]["n_redactions"] == 0
    assert got[2]["text_scrubbed"] == "clean text only"
    assert got[3]["n_redactions"] == 2


def test_repetition_stats(spark):
    from cherry_pipelines_spark.operators.text import repetition_stats

    rows = [
        (1, "spam spam spam spam"),          # 1 unique / 4; top bigram 3/3
        (2, "all words here differ now"),    # 5 unique / 5
        (3, "solo"),                         # 1 token -> NULL bigram stats
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert got[1]["n_words"] == 4 and got[1]["n_unique_words"] == 1
    assert got[1]["unique_word_frac"] == 0.25
    assert got[1]["top_word_frac"] == 1.0
    assert got[1]["top_bigram_frac"] == 1.0  # "spam spam" x3 of 3
    assert got[2]["unique_word_frac"] == 1.0
    assert got[2]["top_word_frac"] == 0.2
    assert got[3]["top_bigram_frac"] is None
    assert got[3]["n_words"] == 1


def test_idf_keywords(spark):
    from cherry_pipelines_spark.operators.text import idf_keywords

    rows = [
        (1, "apple apple banana shared"),
        (2, "banana cherry shared shared"),
        (3, "cherry shared"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = idf_keywords(df, k=2).collect()
    got = {(r["doc_id"], r["rank"]): (r["keyword"], r["score"]) for r in out}
    # doc 1: apple tf=2 idf=ln(3/1) -> top; banana tf=1 idf=ln(3/2)
    assert got[(1, 1)][0] == "apple"
    assert math.isclose(got[(1, 1)][1], round(2 * math.log(3 / 1), 6))
    assert got[(1, 2)][0] == "banana"
    # doc 3: cherry (ln(3/2)) beats shared (ln(3/3)=0)
    assert got[(3, 1)][0] == "cherry"
    # ties broken by token asc; every doc has exactly k or fewer rows
    assert all(r["rank"] <= 2 for r in out)


# ------------------------------------------------------- contamination


def test_ngram_contamination(spark):
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely novel words appear in this document here"),
            (3, "the quick brown fox differs after four tokens only"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in
           ngram_contamination(corpus, bench, ngram=5).collect()}
    # doc 1 shares the 5-gram "the quick brown fox jumps"
    assert out[1]["n_overlap"] == 1 and out[1]["n_shingles"] == 5
    assert out[1]["contamination_frac"] == 0.2
    assert out[2]["n_overlap"] == 0 and out[2]["contamination_frac"] == 0.0
    assert out[3]["n_overlap"] == 0  # shares only a 4-gram prefix


# -------------------------------------------------- vocab / canonical / mix


def test_vocab_topk_counts_and_tiebreak(spark):
    from cherry_pipelines_spark.operators.text import vocab_topk

    df = spark.createDataFrame(
        [(1, "a b b c"), (2, "b c d"), (3, "c d")], "doc_id long, text string"
    )
    out = [(r["token"], r["n"]) for r in vocab_topk(df, k=3).collect()]
    # b and c tie at 3 -> token asc breaks it; d (2) beats a (1)
    assert out == [("b", 3), ("c", 3), ("d", 2)]


def test_canonical_per_cluster(spark):
    from cherry_pipelines_spark.operators.dedup import canonical_per_cluster

    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 5), (6, 5)],
        "doc_id long, cluster_id long",
    )
    scores = spark.createDataFrame(
        [(1, 10), (2, 30), (3, 30), (4, 7), (5, 2), (6, 2)],
        "doc_id long, n_tokens long",
    )
    got = {
        r["cluster_id"]: (r["doc_id"], r["cluster_size"])
        for r in canonical_per_cluster(clusters, scores, "n_tokens").collect()
    }
    # cluster 1: docs 2,3 tie at 30 -> lower id wins; singleton keeps itself
    assert got == {1: (2, 3), 4: (4, 1), 5: (5, 2)}


def test_rebalance_to_mix(spark):
    from cherry_pipelines_spark.operators.sampling import rebalance_to_mix

    rows = (
        [(i, "en") for i in range(900)]
        + [(i + 1000, "de") for i in range(50)]
        + [(i + 2000, "es") for i in range(300)]
        + [(i + 3000, "fr") for i in range(100)]
    )
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = rebalance_to_mix(
        df, "lang", {"en": 0.5, "de": 0.25, "es": 0.25}, key=F.col("doc_id")
    )
    by_lang = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    # de binds: 50/.25 = 200 total -> all 50 de kept, ~100 en, ~50 es;
    # fr is outside the target mix and must vanish entirely
    assert "fr" not in by_lang
    assert by_lang["de"] == 50  # binding stratum keeps everything
    assert abs(by_lang["en"] - 100) <= 20  # hash-rate tolerance
    assert abs(by_lang["es"] - 50) <= 15
    # deterministic under repartitioning (reproducible release)
    again = {
        r["doc_id"]
        for r in rebalance_to_mix(
            df.repartition(13), "lang",
            {"en": 0.5, "de": 0.25, "es": 0.25}, key=F.col("doc_id"),
        ).collect()
    }
    assert {r["doc_id"] for r in out.collect()} == again


# --------------------------------------- chunking / packing / gating


def test_doc_chunks_windows(spark):
    from cherry_pipelines_spark.operators.text import doc_chunks

    df = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(10))), (2, "a b"), (3, "solo")],
        "doc_id long, text string",
    )
    rows = {
        (r["doc_id"], r["chunk_idx"]): r
        for r in doc_chunks(df, chunk=4, overlap=2).collect()
    }
    # doc 1: 10 tokens, stride 2 -> starts 0,2,4,6,8
    assert [k for k in sorted(rows) if k[0] == 1] == [(1, i) for i in range(5)]
    assert rows[(1, 0)]["chunk_text"] == "w0 w1 w2 w3"
    assert rows[(1, 1)]["chunk_text"] == "w2 w3 w4 w5"
    assert rows[(1, 4)]["chunk_text"] == "w8 w9" and rows[(1, 4)]["n_tokens"] == 2
    # short docs still yield exactly one chunk
    assert rows[(2, 0)]["chunk_text"] == "a b" and (2, 1) not in rows
    assert rows[(3, 0)]["n_tokens"] == 1


def test_pack_sequences_layout(spark):
    from cherry_pipelines_spark.operators.sampling import pack_sequences

    df = spark.createDataFrame(
        [(i, 60) for i in range(10)], "doc_id long, n_tokens long"
    )
    out = pack_sequences(
        df, "n_tokens", budget=100, key=F.col("doc_id"), buckets=1
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    # single bucket, docs in id order, 60 tokens each: doc k starts at 60k
    for k in range(10):
        assert by_id[k]["pack_bucket"] == 0
        assert by_id[k]["seq_id"] == (60 * k) // 100
        assert by_id[k]["seq_offset"] == (60 * k) % 100
    # total stream = 600 tokens -> last doc starts in sequence 5
    assert by_id[9]["seq_id"] == 5


def test_quantile_gate(spark):
    from cherry_pipelines_spark.operators.sampling import quantile_gate

    df = spark.createDataFrame(
        [("en", i, float(i)) for i in range(1, 5)] + [("de", 10, 7.0)],
        "lang string, doc_id long, v double",
    )
    kept = {
        r["doc_id"]
        for r in quantile_gate(df, ["lang"], "v", 0.5).collect()
    }
    # en median (interpolated) = 2.5 -> keeps 3,4; de singleton keeps itself
    assert kept == {3, 4, 10}
    low = {
        r["doc_id"]
        for r in quantile_gate(df, ["lang"], "v", 0.5, keep="le").collect()
    }
    assert low == {1, 2, 10}


def test_cross_corpus_near_dups(spark):
    from cherry_pipelines_spark.operators.dedup import cross_corpus_near_dups

    base = "alpha beta gamma delta epsilon zeta eta theta"
    new = spark.createDataFrame(
        [(1, base), (2, "totally different words with no overlap at all")],
        "doc_id long, text string",
    )
    ref = spark.createDataFrame(
        [(100, base), (101, "other reference content goes right here")],
        "doc_id long, text string",
    )
    hits = {r["doc_id"]: r for r in cross_corpus_near_dups(new, ref).collect()}
    assert 1 in hits and hits[1]["first_ref_id"] == 100  # exact dup collides
    assert 2 not in hits                                  # novel doc is clean


# ------------------------------------------------- stats / index build


def test_embedding_centroids(spark):
    from cherry_pipelines_spark.operators.stats import embedding_centroids

    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (0, [3.0, 6.0]), (1, [10.0, 0.0])],
        "label int, embedding array<float>",
    )
    got = {
        (r["label"], r["dim"]): (r["centroid"], r["n"])
        for r in embedding_centroids(df).collect()
    }
    assert got == {
        (0, 1): (2.0, 2), (0, 2): (4.0, 2),
        (1, 1): (10.0, 1), (1, 2): (0.0, 1),
    }


def test_zscore_outliers(spark):
    from cherry_pipelines_spark.operators.stats import zscore_outliers

    rows = [("a", i, 10.0) for i in range(10)] + [("a", 99, 1000.0), ("b", 7, 5.0)]
    df = spark.createDataFrame(rows, "g string, id long, v double")
    out = {r["id"] for r in zscore_outliers(df, ["g"], "v", 2.0).collect()}
    # the 1000.0 spike is the only >2-sigma point; b's singleton group
    # has NULL stddev and emits nothing
    assert out == {99}


def test_inverted_index(spark):
    from cherry_pipelines_spark.operators.text import inverted_index

    df = spark.createDataFrame(
        [(3, "b a"), (1, "a a c"), (2, "a b")], "doc_id long, text string"
    )
    got = {r["token"]: (r["df"], r["postings"])
           for r in inverted_index(df, max_postings=2).collect()}
    # df counts are exact even where the posting list is capped at 2
    assert got == {"a": (3, "1,2"), "b": (2, "2,3"), "c": (1, "1")}


# ------------------------------------------- profiling + bigram LM score


def test_profile_table_exact_stats(spark):
    from cherry_pipelines_spark.operators.stats import profile_table

    df = spark.createDataFrame(
        [(1, "ab", 5), (2, "ab", None), (3, None, 5), (4, "xyz", 7)],
        "id long, s string, v long",
    )
    rows = {r["column"]: r for r in profile_table(df).collect()}
    assert set(rows) == {"id", "s", "v"}
    assert all(r["n_rows"] == 4 for r in rows.values())
    assert (rows["s"]["n_nulls"], rows["s"]["n_distinct"]) == (1, 2)
    assert (rows["s"]["min_value"], rows["s"]["max_value"]) == ("ab", "xyz")
    assert rows["s"]["avg_len"] == round((2 + 2 + 3) / 3, 6)
    assert (rows["v"]["n_nulls"], rows["v"]["n_distinct"]) == (1, 2)
    assert rows["v"]["avg_len"] is None
    assert (rows["id"]["min_value"], rows["id"]["max_value"]) == ("1", "4")
    # column subset + approx mode run
    sub = profile_table(df, ["id"], exact_distinct=False).collect()
    assert len(sub) == 1 and sub[0]["column"] == "id"


def test_bigram_lm_scores_match_counter_model(spark):
    """Differential vs a plain-python Counter implementation of the
    same MLE bigram model."""
    from cherry_pipelines_spark.operators.text import bigram_lm_scores

    docs = [
        (1, "hello world"),
        (2, "hello hello"),
        (3, "zq"),      # rare bigram -> low score
        (4, "x"),       # too short: no bigrams, no row
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    model = Counter()
    per_doc = {}
    for i, t in docs:
        grams = [t[j : j + 2] for j in range(len(t) - 1)]
        per_doc[i] = grams
        model.update(grams)
    total = sum(model.values())
    rows = {r["doc_id"]: r for r in bigram_lm_scores(df).collect()}
    assert set(rows) == {1, 2, 3}
    for i, grams in per_doc.items():
        if not grams:
            continue
        expect = round(
            sum(math.log(model[g] / total) for g in grams) / len(grams), 6
        )
        assert rows[i]["lm_score"] == expect, i
        assert rows[i]["n_bigrams"] == len(grams)
    assert rows[3]["lm_score"] < rows[1]["lm_score"]  # gibberish scores lower


def test_bigram_lm_plan_broadcasts_model(spark):
    """Plan gates: the model joins by BROADCAST (facts never shuffle
    for the join) and the whole operator stays JVM-side."""
    from cherry_pipelines_spark.operators.text import bigram_lm_scores

    df = spark.createDataFrame([(1, "abcabc")], "doc_id long, text string")
    # materialize=False: gate the LAZY plan (the default eagerly
    # checkpoints the doc-level result, whose plan is just an RDD scan)
    plan = (
        bigram_lm_scores(df, materialize=False)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# -------------------------------------- quantized ANN + weighted sample


def test_quantize_embeddings_bounds_and_roundtrip(spark):
    from cherry_pipelines_spark.operators.similarity import quantize_embeddings

    df = spark.createDataFrame(
        [(1, [1.0, -0.5, 0.25]), (2, [0.0, 0.0, 0.0]), (3, [127.0, 0.0, -127.0])],
        "vec_id long, embedding array<float>",
    )
    rows = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
    # scale = round(1/127, 9) = 0.007874016, so -0.5/scale = -63.49997…
    assert rows[1]["qvec"] == [127, -63, 32]
    assert all(-127 <= x <= 127 for r in rows.values() for x in r["qvec"])
    assert rows[2]["qscale"] is None and rows[2]["qvec"] == [0, 0, 0]
    # dequantized values within scale/2 of the originals
    s = rows[1]["qscale"]
    for orig, q in zip([1.0, -0.5, 0.25], rows[1]["qvec"]):
        assert abs(q * s - orig) <= s / 2 + 1e-12


def test_quantized_topk_close_to_exact(spark):
    """Quantized ranking must broadly agree with the float baseline:
    the top-1 neighbor matches the exact top-3 set for most queries."""
    import numpy as np

    from cherry_pipelines_spark.operators.similarity import (
        cosine_topk,
        quantized_cosine_topk,
    )

    rng = np.random.default_rng(5)
    vecs = rng.normal(size=(80, 16)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    queries = df.filter(F.col("vec_id") % 20 == 0)
    exact = cosine_topk(df, queries, k=3).collect()
    quant = quantized_cosine_topk(df, queries, k=1).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(1 for r in quant if r["neighbor_id"] in exact_sets[r["query_id"]])
    assert hits >= len(quant) - 1, (hits, len(quant))


def test_weighted_sample_deterministic_and_proportional(spark):
    from cherry_pipelines_spark.operators.sampling import weighted_sample

    rows = [(i, "a" if i % 2 == 0 else "b", 1 if i < 800 else 100)
            for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, stratum string, w long")
    out1 = weighted_sample(df, "w", n=20, strata=["stratum"]).collect()
    out2 = weighted_sample(
        df.repartition(7), "w", n=20, strata=["stratum"]
    ).collect()
    key = lambda rs: sorted((r["doc_id"], r["sample_rank"]) for r in rs)
    assert key(out1) == key(out2)  # layout-independent
    per = {}
    for r in out1:
        per[r["stratum"]] = per.get(r["stratum"], 0) + 1
    assert per == {"a": 20, "b": 20}
    # weight-100 docs are 20% of rows but ~100% of mass: they dominate
    heavy = sum(1 for r in out1 if r["doc_id"] >= 800)
    assert heavy >= 30, heavy
    # zero/negative weights excluded
    z = weighted_sample(
        spark.createDataFrame([(1, 0), (2, -3), (3, 5)], "doc_id long, w long"),
        "w", n=10,
    ).collect()
    assert [r["doc_id"] for r in z] == [3]


# ------------------------------------------------------------------ BPE


def _py_bpe(texts, iters):
    """Plain-python BPE reference: greedy left-to-right merge, most
    frequent pair wins, ties -> lexicographically smallest."""
    words = [list(w) for t in texts for w in t.split(" ") if w]
    merges = []
    for rank in range(iters):
        counts = Counter()
        for w in words:
            for i in range(len(w) - 1):
                counts[(w[i], w[i + 1])] += 1
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), c = best
        merges.append((rank, a, b, c))
        m = a + b
        new_words = []
        for w in words:
            out = []
            for t in w:
                if out and out[-1] == a and t == b:
                    out[-1] = m
                else:
                    out.append(t)
            new_words.append(out)
        words = new_words
    return merges


def test_bpe_learn_merges_matches_python_reference(spark):
    from cherry_pipelines_spark.operators.text import bpe_learn_merges

    texts = [
        "low lower lowest low low",
        "new newer newest",
        "wider wide widest low",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    for iters in (1, 3, 6):
        got = [
            (r["merge_rank"], r["left"], r["right"], r["pair_count"])
            for r in bpe_learn_merges(df, iters=iters)
            .orderBy("merge_rank")
            .collect()
        ]
        assert got == _py_bpe(texts, iters), iters


def test_bpe_merge_word_greedy_overlap():
    from cherry_pipelines_spark.operators.text import _bpe_merge_word

    # non-overlapping left-to-right: abab -> [ab, ab]; aaa -> [aa, a]
    assert _bpe_merge_word(list("abab"), "a", "b", "ab") == ["ab", "ab"]
    assert _bpe_merge_word(list("aaa"), "a", "a", "aa") == ["aa", "a"]
    # merged token doesn't spuriously re-match
    assert _bpe_merge_word(["aa", "a", "a"], "a", "a", "aa") == ["aa", "aa"]


def test_round_half_up_np_matches_spark_round(spark):
    """round_half_up_np claims EXACT replication of Spark's
    round(double, 6) (BigDecimal of shortest repr, HALF_UP) — the
    faithfulness contract of the matmul kernels.  Differential over
    random values plus adversarial rounding-boundary cases."""
    import numpy as np

    from cherry_pipelines_spark.operators.similarity import round_half_up_np

    rng = np.random.default_rng(11)
    vals = list(rng.uniform(-1, 1, 500))
    # exact boundary representatives and sign/magnitude edges
    vals += [0.1234565, -0.1234565, 0.9999995, -0.9999995, 0.0000005,
             -0.0000005, 0.5e-6, 1.0, -1.0, 0.0, 0.3499995, -0.3499995,
             0.35000049999, 123.4567895]
    # large magnitudes: |x|*10^6 beyond 2^49 (ulp-band saturation zone),
    # beyond 2^52 (scaled float is integral — fast path must stay exact
    # AND vectorized), and 1e22 (28-digit-context InvalidOperation
    # regression: the Decimal fallback needs a wider local context)
    vals += [1e22, -1e22, 5.6e8 + 0.1234565, 4.5e9, -4.5e9,
             9.007199254740993e8, 1.23456789e15, -1.23456789e15]
    # scaled float an ODD integer in [2^52, 2^53): floor(ax+0.5) would
    # tie-to-even up by 1; the ulp>=1 passthrough must keep these exact
    # (round-7 advice).  5718610970.946973*1e6 is odd and in-octave.
    vals += [5718610970.946973, -5718610970.946973,
             np.nextafter(2.0**52, np.inf) / 1e6,   # 2^52+1 scaled
             (2.0**53 - 1.0) / 1e6,                 # largest odd in octave
             6755399441055747.0 / 1e6]              # arbitrary odd mid-octave
    df = spark.createDataFrame([(float(v),) for v in vals], "x double")
    expect = [r["r"] for r in df.select(F.round("x", 6).alias("r")).collect()]
    got = round_half_up_np(np.array(vals, dtype=np.float64), 6)
    for v, e, g in zip(vals, expect, got):
        assert g == e, (v, e, g)


def test_trigram_lm_matches_python_reference(spark):
    """Differential vs a Counter-based mirror of the pinned contract:
    all counts from the trigram event stream, model log-probs rounded
    6 dp, exact-decimal weighted per-doc average."""
    import math
    from collections import Counter
    from decimal import ROUND_HALF_UP, Decimal

    import pytest

    from cherry_pipelines_spark.operators.text import trigram_lm_scores

    docs = [
        (1, "a b c a b c a b"),
        (2, "a b c d e f"),
        (3, "x x x x"),
        (4, "a b"),          # < 3 tokens -> no row
        (5, "q r s q r s"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_trigrams"], float(r["lm_score"]))
        for r in trigram_lm_scores(df).collect()
    }
    ev = {}
    for i, t in docs:
        ws = t.split()
        ev[i] = Counter(zip(ws, ws[1:], ws[2:]))
    c3 = Counter()
    for c in ev.values():
        c3.update(c)
    ctx2, c2, ctx1, c1, tot = Counter(), Counter(), Counter(), Counter(), 0
    for (w1, w2, w3), n in c3.items():
        ctx2[(w1, w2)] += n
        c2[(w2, w3)] += n
        ctx1[w2] += n
        c1[w3] += n
        tot += n
    def r6(x):
        return Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP)
    exp = {}
    for i, c in ev.items():
        if not c:
            continue
        num = Decimal(0)
        den = 0
        for (w1, w2, w3), k in c.items():
            p = (0.6 * c3[(w1, w2, w3)] / ctx2[(w1, w2)]
                 + 0.3 * c2[(w2, w3)] / ctx1[w2]
                 + 0.1 * c1[w3] / tot)
            num += k * r6(math.log(p))
            den += k
        exp[i] = (den, float(r6(float(num) / den)))
    assert set(got) == {1, 2, 3, 5}
    for i, (n, s) in exp.items():
        assert got[i][0] == n
        assert got[i][1] == pytest.approx(s, abs=1e-6), i
