"""Unit tests for the round-4 robust-stats / event-window operators:
MAD outliers, char entropy, truncated EWMA, last-touch attribution.

Each is checked against an independent plain-Python recomputation of
the same definition (the oracle strategy used across the suite), plus
the boundary cases the SQL oracle can't isolate.
"""

from __future__ import annotations

import math

import pytest

from cherry_pipelines_spark.operators.stats import mad_outliers
from cherry_pipelines_spark.operators.text import ENTROPY_ALPHABET, char_entropy
from cherry_pipelines_spark.operators.windows import ewma, last_touch_attribution


# ------------------------------------------------------------------ MAD


def _median(xs):
    s = sorted(xs)
    n = len(s)
    mid = n // 2
    return s[mid] if n % 2 else (s[mid - 1] + s[mid]) / 2.0


def test_mad_outliers_matches_python(spark):
    vals = [1.0, 1.1, 0.9, 1.2, 0.8, 1.05, 50.0, 1.15, 0.95, -40.0]
    rows = [(i, "g", v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id long, grp string, v double")
    got = {
        r.id for r in mad_outliers(df, ["grp"], "v", threshold=3.0).collect()
    }
    med = _median(vals)
    mad = _median([abs(v - med) for v in vals])
    want = {
        i for i, v in enumerate(vals) if mad > 0 and abs(v - med) > 3.0 * 1.4826 * mad
    }
    assert got == want
    assert got == {6, 9}  # the planted outliers, nothing else


def test_mad_robust_where_zscore_is_dragged(spark):
    # one colossal outlier inflates stddev enough that z-score misses a
    # second, smaller outlier; MAD flags both (the reason it exists)
    base = [9.5, 9.7, 9.9, 10.1, 10.3, 10.5] * 4  # MAD ≈ 0.3
    vals = base + [1e6, 200.0]
    rows = [(i, "g", v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id long, grp string, v double")
    flagged = {r.id for r in mad_outliers(df, ["grp"], "v").collect()}
    assert 24 in flagged and 25 in flagged  # 1e6 AND 200 both caught
    assert not any(i in flagged for i in range(24))  # base values are fine

    from cherry_pipelines_spark.operators.stats import zscore_outliers

    z = {r.id for r in zscore_outliers(df, ["grp"], "v", threshold=2.0).collect()}
    assert 22 not in z  # stddev dragged by 1e6: z-score misses 200


def test_mad_degenerate_group_emits_nothing(spark):
    # constant group: MAD = 0 → no outliers (not a divide-by-zero spray)
    df = spark.createDataFrame(
        [(i, "g", 5.0) for i in range(6)], "id long, grp string, v double"
    )
    assert mad_outliers(df, ["grp"], "v").count() == 0


# -------------------------------------------------------------- entropy


def _py_entropy(text: str) -> float:
    t = text.lower()
    n = len(t)
    counts = [t.count(c) for c in ENTROPY_ALPHABET]
    other = n - sum(counts)
    ent = 0.0
    for c in counts + [other]:
        if c > 0:
            p = c / n
            ent -= p * math.log(p, 2)
    return round(ent, 6)


@pytest.mark.parametrize(
    "text",
    [
        "aaaaaaaa",  # zero entropy
        "abababab",  # exactly 1 bit
        "the quick brown fox jumps over the lazy dog",
        "Hello, World! 123",  # punctuation+digits land in the other bucket
        "ZzZzZz",  # case folding
    ],
)
def test_char_entropy_matches_python(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = char_entropy(df).collect()[0]
    assert row.n_chars_total == len(text)
    assert row.char_entropy_bits == pytest.approx(_py_entropy(text), abs=1e-6)


def test_char_entropy_zero_and_one_bit(spark):
    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "abab")], "doc_id long, text string"
    )
    got = {r.doc_id: r.char_entropy_bits for r in char_entropy(df).collect()}
    assert got[1] == 0.0
    assert got[2] == 1.0


# ----------------------------------------------------------------- EWMA


def _py_ewma(xs, alpha=0.2, lookback=32):
    out = []
    for t in range(len(xs)):
        lo = max(0, t - lookback + 1)
        window = xs[lo : t + 1]
        acc = 0.0
        for j, x in enumerate(reversed(window)):
            acc += x * (1 - alpha) ** j
        out.append(alpha * acc)
    return out


def test_ewma_matches_sequential_python(spark):
    xs = [1.0, 2.0, 3.0, 10.0, 2.0, 2.0, 2.0, 0.0, 5.0]
    rows = [(i, "u", float(i), x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "id long, u string, ts double, v double")
    got = {
        r.id: r.ewma
        for r in ewma(df, ["ts"], "v", partition_cols=["u"]).collect()
    }
    want = _py_ewma(xs)
    for i in range(len(xs)):
        assert got[i] == pytest.approx(want[i], rel=1e-12)


def test_ewma_truncation_window(spark):
    # 40 identical values: once the 32-row window is full the EWMA is
    # constant at alpha * sum_{j<32} (1-a)^j = 1 - 0.8^32
    xs = [1.0] * 40
    rows = [(i, "u", float(i), x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "id long, u string, ts double, v double")
    got = {r.id: r.ewma for r in ewma(df, ["ts"], "v", partition_cols=["u"]).collect()}
    steady = 1 - 0.8**32
    assert got[39] == pytest.approx(steady, rel=1e-12)
    assert got[32] == pytest.approx(steady, rel=1e-12)
    assert got[0] == pytest.approx(0.2, rel=1e-12)


def test_ewma_keys_are_independent(spark):
    rows = [(0, "a", 0.0, 1.0), (1, "b", 1.0, 100.0), (2, "a", 2.0, 1.0)]
    df = spark.createDataFrame(rows, "id long, u string, ts double, v double")
    got = {r.id: r.ewma for r in ewma(df, ["ts"], "v", partition_cols=["u"]).collect()}
    # key a's second row never sees key b's 100.0
    assert got[2] == pytest.approx(0.2 * (1.0 + 0.8), rel=1e-12)


# ----------------------------------------------------- attribution


def test_last_touch_basic_chain(spark):
    rows = [
        (1, "u1", 1.0, "view"),
        (2, "u1", 2.0, "click"),
        (3, "u1", 3.0, "purchase"),  # → 2 (click is most recent touch)
        (4, "u1", 4.0, "purchase"),  # → still 2 (no new touch between)
        (5, "u1", 5.0, "view"),
        (6, "u1", 6.0, "purchase"),  # → 5
        (7, "u2", 1.0, "purchase"),  # organic: no prior touch → NULL
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id string, ts double, event_type string")
    out = last_touch_attribution(
        df, order_cols=("ts", "event_id"), carry_cols=("event_id",)
    )
    got = {r.event_id: r.touch_event_id for r in out.collect()}
    assert got == {3: 2, 4: 2, 6: 5, 7: None}


def test_last_touch_never_attributes_to_conversion(spark):
    # purchases are not touch types: a purchase between touches must
    # not become its own (or the next purchase's) attribution
    rows = [
        (1, "u", 1.0, "click"),
        (2, "u", 2.0, "purchase"),
        (3, "u", 3.0, "purchase"),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id string, ts double, event_type string")
    out = last_touch_attribution(df, carry_cols=("event_id",))
    got = {r.event_id: r.touch_event_id for r in out.collect()}
    assert got == {2: 1, 3: 1}


# ------------------------------------------------------------ debounce


def test_debounce_keeps_burst_heads(spark):
    from cherry_pipelines_spark.operators.windows import debounce

    rows = [
        (1, "u", 0),    # head of burst 1
        (2, "u", 100),  # within 300 of prev -> dropped
        (3, "u", 350),  # within 300 of #2 (250) -> dropped (burst chains)
        (4, "u", 800),  # gap 450 -> head of burst 2
        (5, "w", 810),  # other key -> its own head
    ]
    df = spark.createDataFrame(rows, "id long, k string, t long")
    out = debounce(df, ["k"], ["t", "id"], "t", 300)
    assert {r.id for r in out.collect()} == {1, 4, 5}


def test_debounce_zero_gap_duplicates_dropped(spark):
    from cherry_pipelines_spark.operators.windows import debounce

    rows = [(1, "u", 50), (2, "u", 50), (3, "u", 50)]
    df = spark.createDataFrame(rows, "id long, k string, t long")
    out = debounce(df, ["k"], ["t", "id"], "t", 300)
    assert {r.id for r in out.collect()} == {1}


# --------------------------------------------------- quantile norm


def test_quantile_normalize_ranks(spark):
    from cherry_pipelines_spark.operators.windows import quantile_normalize

    rows = [("a", 10.0), ("a", 20.0), ("a", 30.0), ("a", 20.0), ("b", 5.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = quantile_normalize(df, ["g"], "v").collect()
    got = sorted((r.g, r.v, r.qnorm) for r in out)
    # percent_rank: (rank-1)/(n-1); ties share rank; single-row group = 0
    assert got == [
        ("a", 10.0, 0.0),
        ("a", 20.0, pytest.approx(1 / 3, abs=1e-6)),
        ("a", 20.0, pytest.approx(1 / 3, abs=1e-6)),
        ("a", 30.0, 1.0),
        ("b", 5.0, 0.0),
    ]


# ------------------------------------------------- label propagation


def _py_lpa(edges, iters):
    und = set()
    for a, b in edges:
        if a != b:
            und.add((a, b))
            und.add((b, a))
    nodes = {u for u, _ in und}
    labels = {n: n for n in nodes}
    for _ in range(iters):
        new = {}
        for u in nodes:
            votes = {}
            for a, b in und:
                if a == u:
                    lbl = labels[b]
                    votes[lbl] = votes.get(lbl, 0) + 1
            new[u] = min(votes, key=lambda l: (-votes[l], l))
        labels = new
    return labels


def test_label_propagation_matches_python_replay(spark):
    from cherry_pipelines_spark.operators.graph import label_propagation

    # two triangles bridged by one edge: CC would merge everything; LPA
    # keeps the dense groups apart.  Checked against a plain-python
    # replay of the same synchronous mode/min-tie rule.
    edges = [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12), (3, 10)]
    df = spark.createDataFrame(edges, "src long, dst long")
    for iters in (1, 2, 3):
        got = {
            r.node: r.label for r in label_propagation(df, iters=iters).collect()
        }
        assert got == _py_lpa(edges, iters), iters
    # the two triangle cores end in different communities
    final = {r.node: r.label for r in label_propagation(df, iters=3).collect()}
    assert final[1] == final[2]
    assert final[11] == final[12]
    assert final[1] != final[11]


def test_label_propagation_isolated_self_loop_hygiene(spark):
    from cherry_pipelines_spark.operators.graph import label_propagation

    edges = [(1, 1), (2, 3)]  # self loop ignored; 1 drops out (no real edge)
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r.node: r.label for r in label_propagation(df, iters=2).collect()}
    # a bare pair OSCILLATES under synchronous LPA (labels swap every
    # round) — the replay pins that exactly; node 1 never appears
    assert out == _py_lpa(edges, 2) == {2: 2, 3: 3}
    out1 = {r.node: r.label for r in label_propagation(df, iters=1).collect()}
    assert out1 == _py_lpa(edges, 1) == {2: 3, 3: 2}


# ---------------------------------------------------------- timeseries


def test_resample_ffill_semantics(spark):
    from cherry_pipelines_spark.operators.timeseries import resample_ffill

    rows = [
        ("u", 95, 1.0, 1),
        ("u", 205, 2.0, 2),
        ("u", 205, 3.0, 3),  # tie: later tiebreak wins the carry
        ("u", 430, 4.0, 4),
    ]
    df = spark.createDataFrame(rows, "k string, t long, v double, id long")
    out = {
        r.grid_ts: r.value
        for r in resample_ffill(df, ["k"], "t", "v", step=100,
                                order_tiebreak=("id",)).collect()
    }
    # grid spans floor(95/100)=0 .. floor(430/100)=4
    assert out == {0: None, 100: 1.0, 200: 1.0, 300: 3.0, 400: 3.0}


def test_resample_ffill_grid_point_sees_same_instant_value(spark):
    from cherry_pipelines_spark.operators.timeseries import resample_ffill

    df = spark.createDataFrame(
        [("u", 200, 9.0, 1)], "k string, t long, v double, id long"
    )
    out = {
        r.grid_ts: r.value
        for r in resample_ffill(df, ["k"], "t", "v", step=100,
                                order_tiebreak=("id",)).collect()
    }
    assert out == {200: 9.0}  # data at exactly the grid instant is carried


def test_chunked_running_sum_equals_global_scan(spark):
    from cherry_pipelines_spark.operators.timeseries import chunked_running_sum
    import random

    rnd = random.Random(9)
    rows = [(i, rnd.randint(0, 1000), round(rnd.uniform(-5, 5), 3)) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, t long, v double")
    for chunk in (7, 100, 10_000):  # many chunks, some chunks, one chunk
        out = {
            r.id: float(r.running_sum)
            for r in chunked_running_sum(
                df, "t", "v", order_tiebreak=("id",), chunk=chunk
            ).collect()
        }
        acc = 0.0
        want = {}
        from decimal import Decimal

        accd = Decimal(0)
        for i, t, v in sorted(rows, key=lambda r: (r[1], r[0])):
            accd += Decimal(str(round(v, 6)))
            want[i] = float(accd)
        assert out == want, chunk  # chunk splits never perturb the scan


# ----------------------------------------------------------- winsorize


def test_winsorize_clips_tails_only(spark):
    from cherry_pipelines_spark.operators.sampling import winsorize

    vals = list(range(1, 101))  # 1..100
    df = spark.createDataFrame(
        [(i, "g", float(v)) for i, v in enumerate(vals)],
        "id long, grp string, v double",
    )
    out = {r.id: r.v_winsor for r in winsorize(df, ["grp"], "v", 0.05, 0.95).collect()}
    # interpolated p05 of 1..100 is 5.95, p95 is 95.05
    assert out[0] == 5.95 and out[1] == 5.95  # 1, 2 clipped up
    assert out[99] == 95.05  # 100 clipped down
    assert out[49] == 50.0  # middle untouched
    with __import__("pytest").raises(ValueError):
        winsorize(df, ["grp"], "v", 0.9, 0.1)
