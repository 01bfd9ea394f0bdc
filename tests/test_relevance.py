"""TF-IDF / BM25 relevance operators (operators/relevance.py):
differential tests against a plain-Python reference of the same
deterministic spec, plus plan/guard properties."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from cherry_pipelines_spark.operators.relevance import bm25_scores, tfidf_top_terms

DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the dog chased the cat"),
    (3, "quantum chromodynamics of the charm quark"),
    (4, "the the the the"),
    (5, "cat cat cat dog"),
    (6, ""),  # empty text -> no terms
]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _py_tf(text):
    return Counter(text.split())  # \s+ tokenization, same as the operator


def _py_tfidf(docs, top_k, max_df_ratio):
    n = len(docs)
    dfc = Counter()
    for _i, t in docs:
        dfc.update(set(_py_tf(t)))
    out = {}
    for i, t in docs:
        rows = []
        for term, tf in _py_tf(t).items():
            if dfc[term] > n * max_df_ratio:
                continue
            idf = math.log((n + 1) / (dfc[term] + 1)) + 1
            rows.append((round(tf * idf, 6), term, tf, dfc[term]))
        rows.sort(key=lambda r: (-r[0], r[1]))
        out[i] = rows[:top_k]
    return out


def test_tfidf_matches_python_reference(spark):
    got = {}
    for r in tfidf_top_terms(_df(spark), top_k=3).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["rank"], float(r["score"]), r["term"], r["tf"], r["df"])
        )
    exp = _py_tfidf(DOCS, 3, 1.0)
    for doc_id, rows in exp.items():
        g = sorted(got.get(doc_id, []))
        assert len(g) == len(rows), doc_id
        for (rank, score, term, tf, df_), (escore, eterm, etf, edf) in zip(g, rows):
            assert (term, tf, df_) == (eterm, etf, edf), (doc_id, rank)
            assert score == pytest.approx(escore, abs=1e-6)
    assert 6 not in got  # empty doc has no terms


def test_tfidf_default_is_exact_and_guard_is_approximate(spark):
    """Default (max_df_ratio=1.0) is EXACT: nothing pruned, every doc
    with terms present, and 'the' (the high-df term) legitimately wins
    where its tf is high.  Opting into max_df_ratio=0.5 prunes 'the'
    (df 5 > 6*0.5): an honest approximation the contract documents as
    result-altering — it reshapes top-ks and drops the stopword-only
    doc 4 entirely."""
    exact = tfidf_top_terms(_df(spark), top_k=2).collect()
    exact_by_doc = {}
    for r in exact:
        exact_by_doc.setdefault(r["doc_id"], []).append(r)
    # every non-empty doc is represented; doc 4 ('the' x4) keeps its term
    assert set(exact_by_doc) == {1, 2, 3, 4, 5}
    assert [r["term"] for r in sorted(exact_by_doc[4], key=lambda r: r["rank"])] == [
        "the"
    ]
    # doc 1: 'the' tf=2 idf=1+ln(7/6)=1.154 -> 2.31 beats 'mat' tf=1
    # idf=1+ln(7/2)=2.25 — the smoothed-idf floor makes stop-words rankable
    doc1 = [r["term"] for r in sorted(exact_by_doc[1], key=lambda r: r["rank"])]
    assert doc1 == ["the", "mat"]

    pruned = tfidf_top_terms(_df(spark), top_k=2, max_df_ratio=0.5).collect()
    pruned_terms = {r["term"] for r in pruned}
    assert "the" not in pruned_terms  # df 5/6 > 0.5 — pruned
    assert {r["doc_id"] for r in pruned} == {1, 2, 3, 5}  # doc 4 dropped
    # and the pruned run's doc-1 top-k differs from exact (approximation)
    doc1_pruned = sorted(
        (r["rank"], r["term"]) for r in pruned if r["doc_id"] == 1
    )
    assert [t for _, t in doc1_pruned] != doc1


def _py_bm25(docs, query, k1=1.2, b=0.75):
    n = len(docs)
    tfs = {i: _py_tf(t) for i, t in docs}
    dls = {i: sum(c.values()) for i, c in tfs.items()}
    with_terms = [i for i in dls if dls[i] > 0]
    avgdl = sum(dls.values()) / len(with_terms)
    out = {}
    for i, _t in docs:
        s = 0.0
        for term in sorted(set(query)):
            df_ = sum(1 for c in tfs.values() if term in c)
            tf = tfs[i].get(term, 0)
            if tf == 0:
                continue
            idf = math.log(1 + (n - df_ + 0.5) / (df_ + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dls[i] / avgdl))
        out[i] = round(s, 6)
    return out


def test_bm25_matches_python_reference(spark):
    got = {
        r["doc_id"]: float(r["score"])
        for r in bm25_scores(_df(spark), ["cat", "quark"]).collect()
    }
    exp = _py_bm25(DOCS, ["cat", "quark"])
    assert set(got) == {1, 2, 3, 4, 5, 6}  # every doc returned
    for i, e in exp.items():
        assert got[i] == pytest.approx(e, abs=1e-6), i
    assert got[6] == 0.0 and got[4] == 0.0


def test_bm25_validation(spark):
    with pytest.raises(ValueError):
        bm25_scores(_df(spark), [])


def test_plans_are_jvm_only_and_broadcast(spark):
    """No Python stage anywhere; BM25's stats joins broadcast (facts
    never shuffle onto a stats key)."""
    tf_plan = (
        tfidf_top_terms(_df(spark), 3)._jdf.queryExecution().executedPlan().toString()
    )
    bm_plan = (
        bm25_scores(_df(spark), ["cat"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for plan in (tf_plan, bm_plan):
        assert "MapInPandas" not in plan and "BatchEvalPython" not in plan
    assert "BroadcastExchange" in bm_plan


# --- property-based differential: random corpora vs the python spec ---

from hypothesis import given, settings
from hypothesis import strategies as st

_WORDS = ["the", "cat", "dog", "sat", "mat", "on", "quark", "spark", "a"]
_corpus = st.lists(
    st.lists(st.sampled_from(_WORDS), min_size=0, max_size=8).map(" ".join),
    min_size=1,
    max_size=6,
)


@settings(max_examples=8, deadline=None)
@given(texts=_corpus, top_k=st.integers(1, 3))
def test_tfidf_property_differential(spark, texts, top_k):
    docs = [(i + 1, t) for i, t in enumerate(texts)]
    got = {}
    for r in tfidf_top_terms(
        spark.createDataFrame(docs, "doc_id long, text string"), top_k=top_k
    ).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["rank"], round(float(r["score"]), 6), r["term"], r["tf"], r["df"])
        )
    exp = _py_tfidf(docs, top_k, 1.0)
    for doc_id, rows in exp.items():
        g = sorted(got.get(doc_id, []))
        assert [(t, tf, df_) for _, _, t, tf, df_ in g] == [
            (t, tf, df_) for _, t, tf, df_ in rows
        ], doc_id
        for (_, score, *_), (escore, *_) in zip(g, rows):
            assert score == pytest.approx(escore, abs=1e-6)


@settings(max_examples=8, deadline=None)
@given(
    texts=_corpus,
    query=st.lists(st.sampled_from(_WORDS), min_size=1, max_size=3),
)
def test_bm25_property_differential(spark, texts, query):
    docs = [(i + 1, t) for i, t in enumerate(texts)]
    # all-empty corpora have no avgdl; the operator returns 0.0 rows
    if not any(t.strip() for t in texts):
        return
    got = {
        r["doc_id"]: float(r["score"])
        for r in bm25_scores(
            spark.createDataFrame(docs, "doc_id long, text string"), query
        ).collect()
    }
    exp = _py_bm25(docs, query)
    assert set(got) == set(exp)
    for i, e in exp.items():
        assert got[i] == pytest.approx(e, abs=1e-6), i


# --- tfidf_cosine_pairs ------------------------------------------------------


def _py_cosine_pairs(docs, max_df_ratio, threshold):
    """Plain-python mirror of the exact spec: df-cut vocabulary,
    6-dp-rounded decimal weights, exact dot/norm sums, double cosine
    rounded at 6."""
    from decimal import Decimal, ROUND_HALF_UP

    def r6(x):
        return Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP)

    n = len(docs)
    tf = {i: Counter(t.split()) for i, t in docs}
    df = Counter(term for c in tf.values() for term in c)
    keep = {t: math.log((n + 1) / (d + 1)) + 1 for t, d in df.items()
            if d <= n * max_df_ratio}
    w = {
        i: {t: r6(c * keep[t]) for t, c in cnt.items() if t in keep}
        for i, cnt in tf.items()
    }
    nn = {i: sum(x * x for x in ws.values()) for i, ws in w.items() if ws}
    out = {}
    ids = sorted(w)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            shared = set(w[a]) & set(w[b])
            if not shared:
                continue
            dot = sum(w[a][t] * w[b][t] for t in shared)
            cos = float(
                Decimal(repr(float(dot) / (math.sqrt(float(nn[a])) * math.sqrt(float(nn[b])))))
                .quantize(Decimal("0.000001"), ROUND_HALF_UP)
            )
            if cos >= threshold:
                out[(a, b)] = cos
    return out


PAIR_DOCS = [
    (1, "alpha beta gamma delta"),
    (2, "alpha beta gamma delta"),        # exact dup of 1 -> cos 1.0
    (3, "alpha beta gamma epsilon"),      # 3/4 overlap with 1
    (4, "zeta eta theta iota"),           # disjoint from 1-3
    (5, "zeta eta theta kappa lambda"),   # partial overlap with 4
    (6, "mu nu xi omicron"),              # no shared rare terms
    (7, "common common common"),          # stop-ish term, df-cut target
    (8, "common alpha"),
]


def test_cosine_pairs_match_python_reference(spark):
    from cherry_pipelines_spark.operators.relevance import tfidf_cosine_pairs

    df = spark.createDataFrame(PAIR_DOCS, "doc_id long, text string")
    exp = _py_cosine_pairs(PAIR_DOCS, max_df_ratio=0.5, threshold=0.1)
    got = {
        (r["doc_a"], r["doc_b"]): float(r["cos"])
        for r in tfidf_cosine_pairs(df, threshold=0.1, max_df_ratio=0.5).collect()
    }
    assert got == exp
    # structure sanity: the fixture produces a MIX of similarities
    assert got[(1, 2)] == 1.0
    assert 0.1 < got[(1, 3)] < 1.0
    assert (1, 4) not in got  # disjoint vocab never pairs


def test_cosine_pairs_df_cut_is_part_of_the_contract(spark):
    """Terms above max_df_ratio contribute nothing: doc 7 (only a
    corpus-wide term after the cut at a low ratio) pairs with nobody,
    and the (7, 8) pair via 'common' disappears."""
    from cherry_pipelines_spark.operators.relevance import tfidf_cosine_pairs

    df = spark.createDataFrame(PAIR_DOCS, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"])
        for r in tfidf_cosine_pairs(df, threshold=0.01, max_df_ratio=0.2).collect()
    }
    assert all(7 not in p for p in got), got


def test_cosine_pairs_plan_equi_joins_only(spark):
    from cherry_pipelines_spark.operators.relevance import tfidf_cosine_pairs

    df = spark.createDataFrame(PAIR_DOCS, "doc_id long, text string")
    out = tfidf_cosine_pairs(df, threshold=0.5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the weighted index is checkpoint-shared (the deliberate 1-row
    # n_docs broadcast lives in that prefix); the posting self-join and
    # the norm joins must all be equi-joins and nothing is driver-side
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert (
        "SortMergeJoin" in plan
        or "ShuffledHashJoin" in plan
        or "BroadcastHashJoin" in plan
    )
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan


def test_cosine_pairs_ratio_validation(spark):
    from cherry_pipelines_spark.operators.relevance import tfidf_cosine_pairs

    df = spark.createDataFrame(PAIR_DOCS, "doc_id long, text string")
    with pytest.raises(ValueError):
        tfidf_cosine_pairs(df, max_df_ratio=0.0)


def test_cosine_pairs_absolute_df_cap(spark):
    """max_df_count composes with the ratio cut: non-binding cap leaves
    results identical; a binding cap removes the capped term's pairs
    exactly like the python mirror with the same vocabulary cut."""
    from cherry_pipelines_spark.operators.relevance import tfidf_cosine_pairs

    df = spark.createDataFrame(PAIR_DOCS, "doc_id long, text string")
    base = sorted(
        tuple(r)
        for r in tfidf_cosine_pairs(df, threshold=0.1, max_df_ratio=0.5).collect()
    )
    uncapped = sorted(
        tuple(r)
        for r in tfidf_cosine_pairs(
            df, threshold=0.1, max_df_ratio=0.5, max_df_count=10**6
        ).collect()
    )
    assert base == uncapped
    # cap at df<=1: only corpus-unique terms remain -> no doc shares a
    # kept term except none (every pairing term in the fixture has df>=2)
    capped = tfidf_cosine_pairs(
        df, threshold=0.01, max_df_ratio=1.0, max_df_count=1
    ).collect()
    assert capped == []
    with pytest.raises(ValueError):
        tfidf_cosine_pairs(df, max_df_count=0)
