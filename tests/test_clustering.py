"""k-means (Lloyd) operator: differential test against a plain-numpy
implementation of the same deterministic spec (smallest-id init,
round-6 distances with id tie-break, decimal-exact means rounded to 6),
plus plan/edge properties."""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cherry_pipelines_spark.operators.clustering import kmeans_lloyd


def _numpy_lloyd(ids, vecs, k, iters):
    """Reference implementation in plain python/numpy."""
    order = np.argsort(ids)
    cents = {ci: vecs[order[ci]].astype(float).copy() for ci in range(k)}
    assign = None
    for _ in range(iters):
        assign = {}
        for i, v in zip(ids, vecs):
            best = min(
                (round(float(((v - c) ** 2).sum()), 6), ci)
                for ci, c in cents.items()
            )
            assign[i] = best[1]
        new = {}
        for ci in set(assign.values()):
            members = [v for i, v in zip(ids, vecs) if assign[i] == ci]
            dims = len(members[0])
            cent = np.empty(dims)
            for d in range(dims):
                s = sum(
                    Decimal(float(m[d])).quantize(
                        Decimal("1e-9"), rounding=ROUND_HALF_UP
                    )
                    for m in members
                )
                cent[d] = round(float(s) / len(members), 6)
            new[ci] = cent
        cents = new
    counts = {ci: sum(1 for c in assign.values() if c == ci) for ci in cents}
    return cents, counts


def _df(spark, ids, vecs):
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    return spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in zip(ids, vecs)], schema
    )


def test_kmeans_matches_numpy_reference(spark):
    rng = np.random.default_rng(42)
    n, dims, k, iters = 120, 6, 4, 3
    vecs = rng.normal(size=(n, dims)).astype(np.float32)
    ids = np.arange(100, 100 + n)
    out = kmeans_lloyd(_df(spark, ids, vecs), k=k, iters=iters).collect()
    cents, counts = _numpy_lloyd(ids, vecs, k, iters)
    got = {}
    for r in out:
        got.setdefault(r["cluster_id"], {})[r["dim"]] = (r["centroid"], r["n"])
    assert set(got) == set(cents)
    for ci, cent in cents.items():
        assert got[ci][0][1] == counts[ci], ci
        for d in range(dims):
            assert got[ci][d][0] == pytest.approx(cent[d], abs=1e-9), (ci, d)


def test_kmeans_separated_blobs_converge(spark):
    """Three well-separated blobs: every cluster is pure and centroids
    land on the blob means regardless of iteration count."""
    rng = np.random.default_rng(7)
    blobs = [(0.0, 0.0), (10.0, 0.0), (0.0, 10.0)]
    vecs, ids = [], []
    for bi, (cx, cy) in enumerate(blobs):
        for j in range(30):
            vecs.append([cx + rng.normal(0, 0.1), cy + rng.normal(0, 0.1)])
            ids.append(bi + 3 * j + 1000 * bi)  # first 3 ids hit 3 blobs
    # ensure init picks one seed per blob: ids 0,1,2 smallest, one per blob
    ids = list(range(len(vecs)))
    vecs = [vecs[i] for i in (0, 30, 60)] + [
        v for i, v in enumerate(vecs) if i not in (0, 30, 60)
    ]
    out = kmeans_lloyd(
        _df(spark, ids, np.array(vecs, dtype=np.float32)), k=3, iters=4
    ).collect()
    by_c = {}
    for r in out:
        by_c.setdefault(r["cluster_id"], {})[r["dim"]] = r["centroid"]
        by_c[r["cluster_id"]]["n"] = r["n"]
    assert all(by_c[c]["n"] == 30 for c in by_c)
    means = sorted((round(v[0]), round(v[1])) for v in by_c.values())
    assert means == [(0, 0), (0, 10), (10, 0)]


def test_kmeans_validation(spark):
    df = _df(spark, [1], [[0.0, 0.0]])
    with pytest.raises(ValueError):
        kmeans_lloyd(df, k=0)
    with pytest.raises(ValueError):
        kmeans_lloyd(df, iters=0)


def test_kmeans_assignment_is_map_only(spark):
    """Plan gate: the assignment stage broadcasts the centroid row —
    no shuffle of the points side (BroadcastNestedLoopJoin over ONE
    row is the expected physical shape for a crossJoin(broadcast))."""
    from cherry_pipelines_spark.operators.clustering import (
        assign_clusters,
    )

    rng = np.random.default_rng(1)
    pts = _df(spark, range(50), rng.normal(size=(50, 4)).astype(np.float32))
    cents = spark.createDataFrame(
        [(0, [0.0, 0.0, 0.0, 0.0]), (1, [1.0, 1.0, 1.0, 1.0])],
        "cluster_id long, centroid array<double>",
    )
    plan = assign_clusters(
        pts, cents, "embedding", "vec_id"
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


# ------------------------------------------------------------- pagerank


def test_pagerank_matches_python_reference(spark):
    """Differential vs a plain-python implementation of the same
    deterministic spec (rounded contributions, decimal sums)."""
    from decimal import Decimal

    from cherry_pipelines_spark.operators.graph import pagerank

    edges = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
        ("d", "c"), ("d", "a"), ("e", "d"),
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    iters, d = 3, 0.85
    nodes = sorted({x for e in edges for x in e})
    n = len(nodes)
    deg = {}
    for s, _t in edges:
        deg[s] = deg.get(s, 0) + 1
    rank = {x: round(1.0 / n, 9) for x in nodes}
    for _ in range(iters):
        mass = {x: Decimal(0) for x in nodes}
        for s, t in edges:
            mass[t] += Decimal(str(round(rank[s] / deg[s], 9)))
        rank = {
            x: round((1 - d) / n + d * float(mass[x]), 9) for x in nodes
        }
    got = {r["node"]: r["rank"] for r in pagerank(df, iters=iters).collect()}
    assert got == rank
    # ranks form a probability-like vector: positive, authority node c
    # (3 in-edges) beats leaf node e (0 in-edges)
    assert got["c"] > got["e"] > 0


def test_pagerank_dedupes_edges_and_validates(spark):
    import pytest

    from cherry_pipelines_spark.operators.graph import pagerank

    dup = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("b", "a")], "src string, dst string"
    )
    uniq = spark.createDataFrame([("a", "b"), ("b", "a")], "src string, dst string")
    assert {
        (r["node"], r["rank"]) for r in pagerank(dup, iters=2).collect()
    } == {(r["node"], r["rank"]) for r in pagerank(uniq, iters=2).collect()}
    with pytest.raises(ValueError):
        pagerank(uniq, iters=0)


def test_graph_materialize_checkpoint_lifetime(spark):
    """materialize="checkpoint" must (a) produce identical results to
    the default cache policy and (b) register NOTHING in the session's
    CacheManager — the round-7 footgun was a library caller inheriting
    session-lifetime cache blocks without knowing the clearCache()
    contract."""
    import pytest

    from cherry_pipelines_spark.operators.graph import (
        label_propagation,
        pagerank,
    )

    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("d", "a")]
    df = spark.createDataFrame(edges, "src string, dst string")
    cm = spark._jsparkSession.sharedState().cacheManager()
    spark.catalog.clearCache()

    pr_ck = {
        (r["node"], r["rank"])
        for r in pagerank(df, iters=2, materialize="checkpoint").collect()
    }
    lp_ck = {
        (r["node"], r["label"])
        for r in label_propagation(
            df, iters=2, materialize="checkpoint"
        ).collect()
    }
    assert cm.isEmpty()  # nothing leaked into the CacheManager

    pr_c = {
        (r["node"], r["rank"]) for r in pagerank(df, iters=2).collect()
    }
    lp_c = {
        (r["node"], r["label"])
        for r in label_propagation(df, iters=2).collect()
    }
    assert not cm.isEmpty()  # default policy does cache (and is cleared)
    spark.catalog.clearCache()

    assert pr_ck == pr_c
    assert lp_ck == lp_c

    with pytest.raises(ValueError):
        pagerank(df, iters=1, materialize="spill")


def test_semantic_dedup_drops_higher_id_of_near_pair(spark):
    from cherry_pipelines_spark.operators.clustering import semantic_dedup

    rows = [
        (1, [1.0, 0.0]),
        (2, [0.999, 0.01]),   # ~parallel to 1 -> dropped
        (3, [0.0, 1.0]),
        (4, [-1.0, 0.05]),    # far from everything -> kept
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r for r in semantic_dedup(df, k=1, iters=1, threshold=0.95).collect()}
    assert out[1]["kept"] and not out[2]["kept"]
    assert out[3]["kept"] and out[4]["kept"]


def test_semantic_dedup_verdict_independent_of_chain(spark):
    from cherry_pipelines_spark.operators.clustering import semantic_dedup

    # 1~2 and 2~3 but 1!~3: one-pass rule drops BOTH 2 and 3?  No —
    # 3 is only near 2 (a lower id), so 3 drops too; the documented
    # rule is "near ANY lower id", survival of the mate is irrelevant.
    rows = [
        (1, [1.0, 0.0]),
        (2, [0.96, 0.28]),
        (3, [0.85, 0.52]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r for r in semantic_dedup(df, k=1, iters=1, threshold=0.95).collect()}
    assert out[1]["kept"] and not out[2]["kept"] and not out[3]["kept"]


def test_ann_recall_counts_and_bounds(spark):
    from cherry_pipelines_spark.operators.similarity import ann_recall

    ex = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (2, 20), (2, 21), (2, 22)],
        "query_id long, neighbor_id long",
    )
    ap = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 99), (2, 77), (2, 88), (2, 99)],
        "query_id long, neighbor_id long",
    )
    out = {r["query_id"]: r for r in ann_recall(ex, ap, k=3).collect()}
    assert out[1]["hits"] == 2 and out[1]["recall"] == 0.6667
    assert out[2]["hits"] == 0 and out[2]["recall"] == 0.0


def test_srp_sketch_angle_correlation(spark):
    """Sign sketches must track cosine: near-identical vectors land at
    tiny hamming distance, orthogonal-ish ones far away; sketches are
    layout-deterministic."""
    import numpy as np

    from cherry_pipelines_spark.operators.similarity import (
        srp_near_dups,
        srp_sketch,
    )

    rng = np.random.RandomState(7)
    base = rng.randn(16).astype("float32")
    rows = [
        (1, [float(x) for x in base]),
        (2, [float(x) for x in base * 3.0]),          # same direction
        (3, [float(x) for x in base + rng.randn(16) * 0.05]),  # tiny noise
        (4, [float(x) for x in rng.randn(16)]),        # unrelated
        (5, [0.0] * 16),                               # zero vector posture
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    sk = {r["vec_id"]: r["srp"] for r in srp_sketch(df, dims=16).collect()}
    ham = lambda a, b: sum(
        bin(int(x, 16) ^ int(y, 16)).count("1") for x, y in zip(sk[a], sk[b])
    )
    assert ham(1, 2) <= 2          # scaling barely moves signs
    assert ham(1, 3) <= 6          # small noise, few flips
    assert ham(1, 4) >= 8          # unrelated direction
    assert len(sk[5]) == 8         # zero vector still hashes (all-ones)
    # determinism under repartition
    sk2 = {
        r["vec_id"]: r["srp"]
        for r in srp_sketch(df.repartition(5), dims=16).collect()
    }
    assert sk == sk2
    pairs = {
        (r["a_id"], r["b_id"]): r["hamming"]
        for r in srp_near_dups(df, dims=16, max_dist=7, bands=8).collect()
    }
    assert (1, 2) in pairs and (1, 3) in pairs
    assert (1, 4) not in pairs


def test_semantic_dedup_ragged_and_null_vectors_never_drop(spark):
    """Faithfulness of the matmul kernel to the old fold semantics: a
    NULL or different-length vector can never cause a drop (the
    zip_with fold gave NULL, and NULL >= threshold is NULL)."""
    from cherry_pipelines_spark.operators.clustering import semantic_dedup

    rows = [
        (0, [1.0, 0.0]),
        (1, [1.0, 0.0]),        # exact dup of 0 -> dropped
        (2, [1.0, 0.0, 0.0]),   # ragged: pairs with 0/1 are NULL
        (3, None),              # NULL vector: never drops, never dropped
        (4, [0.0, 0.0]),        # zero norm: NULL cosine both ways
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r["kept"] for r in
           semantic_dedup(df, k=1, iters=1, threshold=0.9).collect()}
    assert out[0] is True and out[1] is False
    assert out[2] is True and out[4] is True
    # NULL-vector rows pass through the assignment with kept=True
    assert out.get(3, True) is True


# ------------------------------------------------- GEMM assignment path


def test_assignment_gemm_hof_parity(spark):
    """The two assignment kernels must produce IDENTICAL verdicts on a
    non-trivial corpus: same rounded-distance contract, same lowest-id
    tie-break, same NULL/ragged fallback.  Includes deliberate ties
    (duplicate points) and near-boundary vectors."""
    from cherry_pipelines_spark.operators.clustering import assign_clusters

    rng = np.random.default_rng(5)
    vecs = rng.normal(size=(400, 8)).astype(np.float32)
    vecs[10] = vecs[11]  # exact duplicates -> tie on every centroid
    pts = _df(spark, range(400), vecs)
    cents = spark.createDataFrame(
        [(int(ci), [float(x) for x in vecs[ci]]) for ci in range(70)],
        "cluster_id long, centroid array<double>",
    )
    hof = {
        r["vec_id"]: r["cluster_id"]
        for r in assign_clusters(pts, cents, "embedding", "vec_id", "hof").collect()
    }
    gemm = {
        r["vec_id"]: r["cluster_id"]
        for r in assign_clusters(pts, cents, "embedding", "vec_id", "gemm").collect()
    }
    assert hof == gemm


def test_assignment_gemm_null_ragged_fallback(spark):
    """NULL and ragged vectors land in the lowest cluster id in BOTH
    kernels (pinned against the HOF fold's observed all-NULL-distance
    behavior)."""
    from cherry_pipelines_spark.operators.clustering import assign_clusters

    pts = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, None), (3, [1.0]), (4, [5.0, 5.0])],
        "vec_id long, embedding array<double>",
    )
    cents = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [4.0, 4.0])],
        "cluster_id long, centroid array<double>",
    )
    for method in ("hof", "gemm"):
        got = {
            r["vec_id"]: r["cluster_id"]
            for r in assign_clusters(
                pts, cents, "embedding", "vec_id", method
            ).collect()
        }
        assert got == {1: 0, 2: 0, 3: 0, 4: 1}, method


def test_assignment_auto_selects_by_k(spark):
    """auto = hof below the threshold (all-JVM plan, no Python stage),
    gemm at/above it (one MapInPandas)."""
    from cherry_pipelines_spark.operators.clustering import (
        _GEMM_K_THRESHOLD,
        assign_clusters,
    )

    rng = np.random.default_rng(7)
    pts = _df(spark, range(30), rng.normal(size=(30, 4)).astype(np.float32))
    small = spark.createDataFrame(
        [(0, [0.0] * 4), (1, [1.0] * 4)], "cluster_id long, centroid array<double>"
    )
    plan_small = (
        assign_clusters(pts, small, "embedding", "vec_id", "auto", k_hint=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "MapInPandas" not in plan_small
    big = spark.createDataFrame(
        [(int(i), [float(i)] * 4) for i in range(_GEMM_K_THRESHOLD)],
        "cluster_id long, centroid array<double>",
    )
    plan_big = (
        assign_clusters(
            pts, big, "embedding", "vec_id", "auto", k_hint=_GEMM_K_THRESHOLD
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "MapInPandas" in plan_big


# --- kcenter_select ----------------------------------------------------------


def _py_kcenter(rows, k):
    """Plain-python farthest-point traversal with the exact spec:
    6-dp-rounded distances, id-asc argmax ties, min-id seed."""
    pts = dict(rows)
    ids = sorted(pts)
    sel = [(0, ids[0], 0.0)]
    dist = {
        i: round(sum((a - b) * (a - b) for a, b in zip(pts[i], pts[ids[0]])), 6)
        for i in ids
    }
    for r in range(1, k):
        far = max(ids, key=lambda i: (dist[i], -i))
        sel.append((r, far, dist[far]))
        for i in ids:
            d = round(sum((a - b) * (a - b) for a, b in zip(pts[i], pts[far])), 6)
            dist[i] = min(dist[i], d)
    return sel


def test_kcenter_matches_python_reference(spark):
    import math

    from cherry_pipelines_spark.operators.clustering import kcenter_select

    rows = [
        (i, [math.sin(i * 0.7 + j) * (1 + (i % 5)) for j in range(6)])
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = [
        (r["rank"], r["vec_id"], r["gap"])
        for r in kcenter_select(df, k=5).orderBy("rank").collect()
    ]
    exp = _py_kcenter(rows, 5)
    assert [(a, b) for a, b, _ in got] == [(a, b) for a, b, _ in exp]
    for (_, _, g), (_, _, e) in zip(got, exp):
        assert g == pytest.approx(e, abs=1e-9)
    # gaps are non-increasing after the seed (the coverage-radius signal)
    gaps = [g for _, _, g in got[1:]]
    assert gaps == sorted(gaps, reverse=True)


def test_kcenter_null_vectors_never_selected(spark):
    from cherry_pipelines_spark.operators.clustering import kcenter_select

    rows = [(1, [0.0, 0.0]), (2, [9.0, 9.0]), (3, None), (4, [5.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = [r["vec_id"] for r in kcenter_select(df, k=3).orderBy("rank").collect()]
    assert got == [1, 2, 4]  # NULL vec (id 3) never wins the argmax


def test_kcenter_validation(spark):
    from cherry_pipelines_spark.operators.clustering import kcenter_select

    df = spark.createDataFrame([(1, [0.0])], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError):
        kcenter_select(df, k=0)


def test_kcenter_null_lowest_id_seed_skipped(spark):
    # round-10 advice: a NULL (or NULL-element) vector on the LOWEST id
    # must not be seeded — the seed is the min id with a USABLE vector
    from cherry_pipelines_spark.operators.clustering import kcenter_select

    rows = [(1, None), (2, [1.0, None]), (3, [0.0, 0.0]), (4, [9.0, 9.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = [r["vec_id"] for r in kcenter_select(df, k=2).orderBy("rank").collect()]
    assert got == [3, 4]


def test_kcenter_all_null_raises(spark):
    from cherry_pipelines_spark.operators.clustering import kcenter_select

    df = spark.createDataFrame(
        [(1, None), (2, None)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="usable vector"):
        kcenter_select(df, k=2)


def test_kcenter_k_exceeds_points_stops_early(spark):
    # k > usable point count stops after exhausting candidates instead
    # of re-selecting already-picked points with gap 0.0
    from cherry_pipelines_spark.operators.clustering import kcenter_select

    rows = [(1, [0.0, 0.0]), (2, [3.0, 4.0]), (3, [6.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = kcenter_select(df, k=10).orderBy("rank").collect()
    assert [r["vec_id"] for r in got] == [1, 3, 2]
    assert len(got) == 3  # stopped at the point count, not k
