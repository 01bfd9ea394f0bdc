"""Measured operator-family scaling curves at 1x / 4x / 16x data.

The per-round bench pins ABSOLUTE time at one scale (sf0.1); this
script pins the SHAPE of the curve: it synthesizes K-times-scaled
copies of the five fact tables under a scratch directory, then times a
representative subset of the registry queries at each scale through
the exact same ``(spark, sf_dir)`` entry points ``bench.py`` uses, and
flags any family whose time grows super-linearly in the input — the
failure mode that is invisible at a single scale factor but fatal at
100 TB.

Scaling model — corpus GROWTH, not replication:

* every copy ``k`` gets disjoint keys (``+ k * 1e12``), so joins and
  groupings gain NEW keys instead of deeper hot keys;
* ``documents``: each word in copy ``k > 0`` is suffixed ``~k`` so
  shingles are distinct across copies — byte-replicated text would
  multiply every shingle's document frequency by K and the near-dup
  self-joins would measure the (intentionally) quadratic pair blowup
  of a degenerate corpus, not the operator;
* ``embeddings``: element 0 is nudged by ``k * 1e-4`` to break exact
  vector ties for the same reason, and ``label`` (the near-dup
  blocking key) is offset per copy so blocked self-joins gain new
  groups instead of 256x-deeper ones;
* dim tables (region/nation/customer/supplier/part) stay UNSCALED and
  are symlinked — facts-per-dim grows, the realistic shape of a
  growing corpus (and what keeps the broadcast sides broadcastable);
* scaled tables are written with 32 partitions, the multi-file layout
  cluster inputs actually have (the single-file sf0.1 fixtures are the
  reason several queries carry their own ``fan_out``).

Usage::

    python scripts/scaling_bench.py [--scales 1,4,16] [--queries a,b]
        [--out SCALING.json] [--data-root /tmp/scaling] [--keep-data]
        [--isolate]

Writes one JSON artifact (default ``SCALING.json`` at the repo root)::

    {"scales": [1, 4, 16], "sf_src": ".../sf0.1",
     "queries": {"<name>": {"sec": {"1": s, "4": s, "16": s},
                            "norm_hi": <sec_hi / (sec_lo * K_hi/K_lo)>,
                            "verdict": "linear|super-linear"}}}

``norm_hi`` is time at the top scale divided by perfectly-linear
extrapolation from the previous scale; ≤ ``LINEAR_TOLERANCE`` counts
as linear (timer noise, partial-agg constant factors and shuffle
startup keep real linear operators under ~1.4 on this box).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

from pyspark.sql import functions as F  # noqa: E402

KEY_OFFSET = 10**12
LINEAR_TOLERANCE = 1.6

# Measurement-protocol provenance, stamped on every artifact row so a
# merged artifact can never silently mix rows measured under different
# conditions (the old single-JVM/20s-cap rows are tagged differently or
# not at all).  Bump the ladder version whenever the retime discipline
# changes.
_LADDER_VERSION = "ladder-v2-depth235"
# synthesis model version: bump when _scale_table's growth model
# changes (v2 = embeddings.label offset per copy — blocking keys gain
# new groups instead of deeper ones)
_SYNTHESIS_VERSION = "synth-v2-labeloffset"

FACT_KEYS: dict[str, list[str]] = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    # label is a BLOCKING key (cosine_near_dup_pairs groups on it):
    # left unscaled, every copy lands in the same 10 groups and the
    # blocked self-join measures 256^2 pair blowup of a degenerate
    # corpus instead of the operator — same reason documents' words get
    # suffixed.  Offsetting it keeps group SIZE constant while group
    # COUNT grows, the corpus-growth shape.
    "embeddings": ["vec_id", "label"],
}
DIMS = ["region", "nation", "customer", "supplier", "part"]

# one query per operator family with distinct scale risk:
#   scan+agg, range window, union+window as-of, keyed sessionization,
#   hash dedup, shingle self-join (the quadratic-risk shape), banded
#   LSH x2, integer-GEMM ANN, iterative k-means, iterative graph,
#   Arrow decode kernel.
DEFAULT_QUERIES = [
    "pricing_summary",
    "trailing_window",
    "asof_join_nearest",
    "sessionize_native",
    "dedup_exact",
    "ngram_jaccard",
    "ngram_jaccard_lsh",
    "dedup_minhash_lsh",
    "quantized_topk",
    "quantized_topk_fixedq",
    "pq_topk",
    "pq_topk_fixedq",
    "kmeans_embeddings",
    "pagerank",
    "evm_decode_batch",
    "dedup_clusters",
    "embedding_near_dup",
    "containment",
    "semantic_dedup",
    "semantic_dedup_scaledk",
    "srp_near_dups",
    "srp_near_dups_scaledplanes",
    # composed-path rows: the chains a curation deployment actually runs
    "dedup_endgame",
    "docs_curation_v3",
    "bloom_filter",
    "ivf_pq_topk",
    "ivf_pq_topk_fixedq",
    "tfidf_doc_pairs_capped",
    "stream_near_dedup",
    "ivf_pq_stored",
    "kcenter_coreset",
    "trigram_lm_score",
    "scan_pruning",
]


def _quantized_topk_fixedq(spark, sf_dir: str):
    """Corpus-scaling twin of the registry ``quantized_topk``: same
    operator, but the query set is pinned to copy-0 rows (keys below
    ``KEY_OFFSET``), so |Q| stays constant while the corpus grows.

    The registry query derives its queries from the corpus
    (``vec_id % 50 == 0``), so under this harness BOTH sides grow and
    its cost follows the brute-force law O(|Q|·|C|) — 16x data means
    256x integer-dot work, which the artifact records as super-linear
    BY CONSTRUCTION.  This twin answers the 100 TB question (fixed
    query workload, growing corpus); for query sets that grow with the
    corpus, the indexed IVF/SRP operators are the scale path.
    """
    from cherry_pipelines_spark.operators.similarity import quantized_cosine_topk

    em = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    q = em.filter((F.col("vec_id") % 50 == 0) & (F.col("vec_id") < KEY_OFFSET))
    return quantized_cosine_topk(em, q, k=5)


def _semantic_dedup_scaledk(spark, sf_dir: str):
    """Corpus-scaling twin of the registry ``semantic_dedup``: ``k``
    grows with the scale factor (parsed from the ``x{K}`` dir name) so
    the EXPECTED cluster size stays constant while the corpus grows —
    the real deployment posture, since ``k`` is the documented knob
    that bounds the quadratic within-cluster screen (Σ|cluster|², see
    operators/clustering.py).  The registry query pins k=4, so under
    this harness its clusters grow linearly and the screen owes
    quadratic work BY CONSTRUCTION — flagged-but-expected, like
    ``quantized_topk``."""
    import re as _re

    from cherry_pipelines_spark.operators.clustering import semantic_dedup

    m = _re.search(r"x(\d+)$", os.path.normpath(sf_dir))
    scale = int(m.group(1)) if m else 1
    em = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return semantic_dedup(em, k=4 * scale, iters=2, threshold=0.35)


def _srp_near_dups_scaledplanes(spark, sf_dir: str):
    """Corpus-scaling twin of the registry ``srp_near_dups``: the SRP
    sketch WIDTH grows with the corpus (planes 32/64/96/128 at
    4/16/64/256x → band width 4/8/12/16 bits), the deployment knob the
    pinned-width registry query cannot turn.  A fixed band width w
    collides random pairs at rate 2^-w, so candidates are Θ(n²/2^w) —
    quadratic BY CONSTRUCTION for any pinned sketch; growing w by
    2 bits per 4x of corpus holds E[candidates] = n²/2^w CONSTANT
    (6.4e7/16 = 1e9/256 = ... = 4e6 per band on this ladder) and the
    linear sketch+banding side dominates.  max_dist stays 7 < bands=8
    (pigeonhole-exact); at wider sketches the same hamming budget is a
    stricter cosine threshold — the posture a larger corpus wants
    anyway."""
    import re as _re

    from cherry_pipelines_spark.operators.similarity import srp_near_dups

    m = _re.search(r"x(\d+)$", os.path.normpath(sf_dir))
    scale = int(m.group(1)) if m else 1
    planes = {1: 32, 4: 32, 16: 64, 64: 96, 256: 128}.get(scale, 128)
    em = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return srp_near_dups(em, dims=64, max_dist=7, planes=planes, seed=0, bands=8)


def _dedup_endgame(spark, sf_dir: str):
    """The dedup ENDGAME as one composite chain — the deployment recipe
    a 100 TB curation run actually executes end-to-end:

        LSH candidate pairs -> connected components -> canonical doc
        per cluster (longest text wins) -> survivor semi-join

    Each stage is individually linear (its own SCALING_DEEP row); the
    chain adds the question no per-stage row answers: does the
    ITERATION COUNT of the label-propagation stage grow as the corpus
    (and its cluster population) grows?  Under the corpus-growth
    synthesis model clusters stay near-clique-sized, so rounds should
    stay at the graph diameter (2-3) and the chain should stay linear.

    NOTE: the registry carries a same-named correctness query
    (``q_dedup_endgame``, oracle-checked) returning the canonical
    survivor rows; this workload (which shadows it under the harness,
    and is what the SCALING_DEEP row measured) ends in the survivor
    semi-join instead — same chain, same stages, leaner output.
    """
    from cherry_pipelines_spark.operators.dedup import (
        canonical_per_cluster,
        duplicate_clusters,
        minhash_lsh_candidates,
    )

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    cands = minhash_lsh_candidates(docs, k=8, bands=4)
    clusters = duplicate_clusters(docs, cands)
    scores = docs.select("doc_id", F.length("text").alias("text_len"))
    canon = canonical_per_cluster(clusters, scores, "text_len")
    return docs.join(canon.select("doc_id"), "doc_id", "left_semi")


def _pq_topk_fixedq(spark, sf_dir: str):
    """Corpus-scaling twin of the registry ``pq_topk``: queries pinned
    to copy-0 rows (same rationale as ``quantized_topk_fixedq`` — the
    registry query's ADC join is |Q|·|corpus| with |Q| growing with the
    corpus, super-linear BY CONSTRUCTION; the deployment posture is a
    fixed query workload over a growing corpus)."""
    from cherry_pipelines_spark.operators.similarity import pq_topk

    em = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return pq_topk(
        em,
        k=3,
        m=8,
        ksub=16,
        dim=64,
        query_filter=(F.col("vec_id") % 100 == 0)
        & (F.col("vec_id") < KEY_OFFSET),
    )


def _ivf_pq_topk_fixedq(spark, sf_dir: str):
    """Corpus-scaling twin of the registry ``ivf_pq_topk``: queries
    pinned to copy-0 rows.  The registry query's set grows with the
    corpus AND the synthesis model's 1e-4 embedding nudge keeps every
    copy in (nearly) the same coarse lattice cells — cell POPULATION
    grows ~K while the cell count stays flat, so |Q|·cell-pop is
    super-linear BY CONSTRUCTION under this harness.  Deployment
    posture: fixed query workload, growing corpus → per-query cost
    grows with the probed cells' population only, and a real corpus
    grows its CELL COUNT too (new content occupies new cells), which
    this synthesis model deliberately does not."""
    from cherry_pipelines_spark.operators.similarity import ivf_pq_topk

    em = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return ivf_pq_topk(
        em,
        k=3,
        m=8,
        ksub=16,
        dim=64,
        n_components=2,
        grid=0.5,
        probe_radius=1,
        query_filter=(F.col("vec_id") % 100 == 0) & (F.col("vec_id") < KEY_OFFSET),
    )


def _ivf_pq_stored_fixedq(spark, sf_dir: str):
    """Corpus-scaling twin of the registry ``ivf_pq_stored``: the
    stored-index build (train + encode + cell-partitioned WRITE) scales
    with the corpus, but the query workload is pinned to copy-0 rows —
    the registry query's |Q| grows with the corpus (vec_id % 100) and
    the synthesis nudge keeps copies in the same coarse cells, so the
    registry row is super-linear BY CONSTRUCTION (same rationale as
    ``ivf_pq_topk_fixedq``; deployment posture = fixed query workload,
    growing corpus)."""
    import hashlib as _hl
    import shutil as _sh
    import tempfile as _tf

    from cherry_pipelines_spark.operators.similarity import (
        build_stored_ivfpq_index,
        query_stored_ivfpq_index,
    )

    em = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    # scratch under tempdir, NEVER inside sf_dir (fixture dirs are
    # read-only by contract)
    index_path = os.path.join(
        _tf.gettempdir(),
        "cherry_ivfpq_fixedq_" + _hl.sha256(sf_dir.encode()).hexdigest()[:12],
    )
    _sh.rmtree(index_path, ignore_errors=True)
    codebooks = build_stored_ivfpq_index(
        em, index_path, m=8, dim=64, ksub=16, iters=2, n_components=2, grid=0.5
    )
    queries = em.filter(
        (F.col("vec_id") % 100 == 0) & (F.col("vec_id") < KEY_OFFSET)
    )
    return query_stored_ivfpq_index(
        spark, index_path, codebooks, queries,
        k=3, m=8, dim=64, n_components=2, grid=0.5, probe_radius=1,
    )


def _pq_refine_fixedq(spark, sf_dir: str):
    """Corpus-scaling twin of the registry ``pq_refine_topk``: fixed
    copy-0 query workload over a growing corpus.  The ADC scan is
    linear in the corpus; the refine stage is a CONSTANT |Q|·64 exact
    distances regardless of scale — the property the operator's
    docstring claims, measured here."""
    from cherry_pipelines_spark.operators.similarity import pq_refine_topk

    em = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return pq_refine_topk(
        em, k=3, candidates=64, m=8, dim=64, ksub=16,
        query_filter=(F.col("vec_id") % 100 == 0) & (F.col("vec_id") < KEY_OFFSET),
        exclude_self=True,
    )


def _ivf_pq_trained_fixedq(spark, sf_dir: str):
    """Corpus-scaling twin of the trained IVF-PQ path on the HARNESS
    corpus (the registry queries run on the derived family fixture,
    whose id-arithmetic construction does not survive the +k·1e12 key
    offsets): k-means cells + residual PQ train/encode scale with the
    corpus, the probe workload is pinned to copy-0 queries.  Expected
    linear: every training pass is one scan + a tiny aggregate, and
    per-probe cost is the probed cell's population (cells grow ~K/16
    here since the trained centroids follow the data)."""
    from cherry_pipelines_spark.operators.similarity import ivf_pq_topk_trained

    em = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return ivf_pq_topk_trained(
        em, k=3, m=8, dim=64, ksub=16, iters=2, n_cells=16, coarse_iters=1,
        nprobe=1,
        query_filter=(F.col("vec_id") % 100 == 0) & (F.col("vec_id") < KEY_OFFSET),
    )


def _ivf_pq_trained_autosized(spark, sf_dir: str):
    """Round-11 verdict #3: the trained IVF-PQ with n_cells following
    the sqrt(n) rule instead of the pinned 16 — auto-sized cells
    (``n_cells=None`` -> max(16, isqrt(n))) AND sample-based coarse
    training (``coarse_sample_per_cell=64``).  Both knobs are what the
    100 TB posture requires: fixed 16 cells probe an ever-growing n/16
    slice per query, and FULL-corpus training at sqrt(n) cells costs
    O(n^1.5) — the bounded per-centroid sample brings training back to
    O(n) (Faiss trains on a sample for exactly this reason), so the
    whole path stays linear while per-probe candidates grow only as
    sqrt(n).  Probe workload pinned to copy-0 queries (fixedq twin
    protocol); recall/candidate-count/numFiles at the auto cell count
    are recorded separately in SCALE.md (scripts/autosize_metrics.py)."""
    from cherry_pipelines_spark.operators.similarity import ivf_pq_topk_trained

    em = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return ivf_pq_topk_trained(
        em, k=3, m=8, dim=64, ksub=16, iters=2, n_cells=None,
        coarse_iters=1, nprobe=1, coarse_sample_per_cell=64,
        query_filter=(F.col("vec_id") % 100 == 0) & (F.col("vec_id") < KEY_OFFSET),
    )


def _bloom_filter_wide(spark, sf_dir: str):
    """Production-width Bloom (round-10 verdict #7): n_bits=2^27 (16 MB
    of words — the width a 100 TB ingest-dedup filter actually runs),
    built through the SHARD-MERGE path (two half-corpus builds union →
    BIT_OR per word) over the scaled lineitem facts, probed by the
    part keys plus a shifted guaranteed-absent set.  Returns the same
    confusion-count row as the registry ``bloom_filter`` so the
    measured FP rate lands in the artifact; the (1-e^{-kn/m})^k
    prediction is recorded next to it in SCALE.md."""
    from cherry_pipelines_spark.operators.sketches import bloom_build, bloom_probe

    n_bits, n_hashes = 1 << 27, 4
    l = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    p = spark.read.parquet(os.path.join(sf_dir, "part.parquet"))
    members = l.filter(F.col("l_quantity") <= 2).select(
        F.col("l_partkey").cast("string").alias("k")
    )
    shard_a = bloom_build(
        members.filter(F.col("k").cast("long") % 2 == 0),
        F.col("k"), n_bits=n_bits, n_hashes=n_hashes,
    )
    shard_b = bloom_build(
        members.filter(F.col("k").cast("long") % 2 != 0),
        F.col("k"), n_bits=n_bits, n_hashes=n_hashes,
    )
    bloom = (
        shard_a.unionAll(shard_b)
        .groupBy("word_idx")
        .agg(F.bit_or("word").alias("word"))
    )
    probes = p.select(
        F.col("p_partkey").alias("pid"),
        F.col("p_partkey").cast("string").alias("k"),
    ).unionAll(
        p.select(
            (F.col("p_partkey") + 1000000000).alias("pid"),
            (F.col("p_partkey") + 1000000000).cast("string").alias("k"),
        )
    )
    probed = bloom_probe(
        probes, bloom, F.col("k"), id_col="pid", n_bits=n_bits, n_hashes=n_hashes
    )
    exact = probes.join(
        members.distinct().withColumnRenamed("k", "mk"),
        F.col("k") == F.col("mk"),
        "left",
    ).select("pid", F.col("mk").isNotNull().alias("present"))
    return probed.join(exact, "pid").agg(
        F.count(F.lit(1)).cast("long").alias("n_probes"),
        F.sum(F.when(F.col("maybe_present"), 1).otherwise(0)).cast("long").alias("n_maybe"),
        F.sum(F.when(F.col("present"), 1).otherwise(0)).cast("long").alias("n_present"),
        F.sum(F.when(F.col("maybe_present") & ~F.col("present"), 1).otherwise(0))
        .cast("long").alias("n_false_positives"),
        F.sum(F.when(~F.col("maybe_present") & F.col("present"), 1).otherwise(0))
        .cast("long").alias("n_false_negatives"),
    )


def _tfidf_doc_pairs_capped(spark, sf_dir: str):
    """Scaling form of the registry ``tfidf_doc_pairs``: the ABSOLUTE
    df cap (max_df_count=2500) replaces the corpus-relative ratio cut
    as the binding constraint.  At x1 (5000 docs) the two cuts
    coincide (0.5 · 5000 = 2500).  The ratio cut alone is NOT
    ladder-safe under the growth model: per-copy ``~k`` suffixes give
    every copy its own head vocabulary, so at 4x a term with df 3500
    sits under ratio 0.5 of 20000 docs and its posting list self-joins
    C(3500, 2) pairs per term — the absolute cap bounds per-term join
    work at C(cap, 2) regardless of corpus size, the 100 TB posture."""
    from cherry_pipelines_spark.operators.relevance import tfidf_cosine_pairs

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return tfidf_cosine_pairs(
        docs, threshold=0.5, max_df_ratio=1.0, max_df_count=2500
    )


def _stream_near_dedup(spark, sf_dir: str):
    """Registry ``stream_near_dedup`` pointed at the scaled documents
    dir (the registry function handles directory fixtures through its
    symlink shim)."""
    import __spark_entry__ as _entry

    return _entry.q_stream_near_dedup(spark, sf_dir)


EXTRA_WORKLOADS = {
    "pq_topk_fixedq": _pq_topk_fixedq,
    "quantized_topk_fixedq": _quantized_topk_fixedq,
    "semantic_dedup_scaledk": _semantic_dedup_scaledk,
    "srp_near_dups_scaledplanes": _srp_near_dups_scaledplanes,
    "dedup_endgame": _dedup_endgame,
    "ivf_pq_topk_fixedq": _ivf_pq_topk_fixedq,
    "ivf_pq_stored_fixedq": _ivf_pq_stored_fixedq,
    "pq_refine_fixedq": _pq_refine_fixedq,
    "ivf_pq_trained_fixedq": _ivf_pq_trained_fixedq,
    "ivf_pq_trained_autosized": _ivf_pq_trained_autosized,
    "bloom_filter_wide": _bloom_filter_wide,
    "tfidf_doc_pairs_capped": _tfidf_doc_pairs_capped,
    "stream_near_dedup": _stream_near_dedup,
}

# super-linear BY CONSTRUCTION under this harness (documented on the
# workload): flagged in the artifact but not a failure exit.
# semantic_dedup: the registry query pins k=4, so cluster sizes grow
# with the corpus and the within-cluster screen owes quadratic work —
# the scaled-k twin measures the deployment posture.
# srp_near_dups: the registry query pins the sketch width (32 planes →
# 4-bit bands), so band collisions are Θ(n²/16) — the scaled-planes
# twin grows the sketch with the corpus, the deployment posture.
EXPECTED_SUPERLINEAR = {
    "quantized_topk",
    "semantic_dedup",
    "srp_near_dups",
    # registry pq_topk derives its query set from the corpus (|Q| grows
    # with it), so the ADC join owes |Q|·|corpus| work by construction;
    # pq_topk_fixedq is the deployment twin
    "pq_topk",
    # registry ivf_pq_topk: |Q| grows with the corpus and the synthesis
    # nudge keeps copies in the same coarse cells (population grows,
    # count doesn't) — ivf_pq_topk_fixedq is the deployment twin
    "ivf_pq_topk",
    # registry ivf_pq_stored: same |Q|-grows + same-cells construction
    # as ivf_pq_topk — ivf_pq_stored_fixedq is the deployment twin
    "ivf_pq_stored",
}


def _scale_table(spark, src: str, dst: str, name: str, k: int) -> None:
    df = spark.read.parquet(src)
    df = df.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("_copy")
    )
    copy = F.col("_copy")
    for key in FACT_KEYS[name]:
        df = df.withColumn(key, F.col(key) + copy.cast("long") * F.lit(KEY_OFFSET))
    if name == "documents":
        suffixed = F.array_join(
            F.transform(
                F.split(F.col("text"), " "),
                lambda w: F.concat(w, F.lit("~"), copy.cast("string")),
            ),
            " ",
        )
        df = df.withColumn(
            "text", F.when(copy == 0, F.col("text")).otherwise(suffixed)
        ).withColumn("n_chars", F.length("text"))
    elif name == "embeddings":
        df = df.withColumn(
            "embedding",
            F.transform(
                F.col("embedding"),
                lambda x, i: F.when(
                    i == 0, x + copy.cast("float") * F.lit(1e-4)
                )
                .otherwise(x)
                .cast("float"),
            ),
        )
    df.drop("_copy").repartition(32).write.mode("overwrite").parquet(dst)


def _build_scale_dir(spark, sf_src: str, root: str, k: int) -> str:
    out = os.path.join(root, f"x{k}")
    marker = os.path.join(out, "_SCALE_OK")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    for name in DIMS:
        link = os.path.join(out, f"{name}.parquet")
        if not os.path.lexists(link):
            os.symlink(os.path.join(sf_src, f"{name}.parquet"), link)
    for name in FACT_KEYS:
        # k == 1 runs through the SAME writer (explode over [0]) so every
        # scale shares the 32-partition layout — a symlinked single-file
        # 1x baseline measures the fixture layout, not the operator, and
        # bends the curve (observed: 4x FASTER than single-file 1x).
        src = os.path.join(sf_src, f"{name}.parquet")
        _scale_table(spark, src, os.path.join(out, f"{name}.parquet"), name, k)
    open(marker, "w").close()
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1,4,16")
    ap.add_argument("--queries", default=",".join(DEFAULT_QUERIES))
    ap.add_argument("--out", default=os.path.join(_ROOT, "SCALING.json"))
    ap.add_argument("--data-root", default="/tmp/scaling")
    ap.add_argument(
        "--keep-data",
        action="store_true",
        help="leave the synthesized scale dirs on disk for re-runs",
    )
    ap.add_argument(
        "--sf-src",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument(
        "--isolate",
        action="store_true",
        help="fresh JVM per query: one subprocess per queried name, "
        "results merged into --out.  Single-JVM sequential runs carry "
        "cross-query heap/GC state that swings big-shuffle timings "
        "±50%% run-over-run — per-query isolation makes every curve's "
        "measurement conditions uniform.",
    )
    ap.add_argument(
        "--_isolated-child",
        action="store_true",
        dest="isolated_child",
        help=argparse.SUPPRESS,  # set by the --isolate parent on its
        # children so their artifact rows carry the isolated protocol tag
    )
    args = ap.parse_args()
    scales = sorted({int(s) for s in args.scales.split(",")})
    names = [q for q in args.queries.split(",") if q]

    # NOTE: applies to single-query runs too — a one-query --isolate
    # re-measurement must not time in the JVM that just synthesized the
    # scaled tables (that cross-heap contamination is the whole point of
    # the flag, and single-query re-runs are how artifact rows get
    # refreshed).
    if args.isolate:
        import subprocess

        # synthesize once up front (children find the _SCALE_OK markers)
        # so no child's measurements run in a JVM that just wrote the
        # scaled tables; then one child process per query — children
        # always --keep-data, the parent honors the flag at the end
        from cherry_pipelines_spark.session import get_spark as _gs

        synth = _gs("scaling_synth", wide_shuffles=True)
        t0 = time.monotonic()
        for k in scales:
            _build_scale_dir(synth, args.sf_src, args.data_root, k)
        print(
            f"synthesis: {time.monotonic() - t0:.1f}s for scales {scales}",
            flush=True,
        )
        synth.stop()
        rc = 0
        for i, name in enumerate(names):
            cmd = [
                sys.executable, os.path.abspath(__file__),
                "--scales", args.scales, "--queries", name,
                "--out", args.out, "--data-root", args.data_root,
                "--sf-src", args.sf_src, "--keep-data",
                "--_isolated-child",
            ]
            r = subprocess.run(cmd).returncode
            rc = rc or r
        if not args.keep_data:
            shutil.rmtree(args.data_root, ignore_errors=True)
        return rc

    import __spark_entry__ as entry_mod
    from cherry_pipelines_spark.session import get_spark

    # wide posture = the cluster default this harness is modeling: the
    # synthesized 64x inputs are exactly the byte-heavy shuffles whose
    # per-partition state outgrows fixed-width planning (see session.py)
    spark = get_spark("scaling_bench", wide_shuffles=True)
    qs = dict(entry_mod.queries())
    qs.update(EXTRA_WORKLOADS)
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    dirs = {}
    t0 = time.monotonic()
    for k in scales:
        dirs[k] = _build_scale_dir(spark, args.sf_src, args.data_root, k)
    print(f"synthesis: {time.monotonic() - t0:.1f}s for scales {scales}", flush=True)

    # one untimed warm-up so the first timed query doesn't pay JVM/codegen
    # startup for the whole run
    qs["pricing_summary"](spark, dirs[scales[0]]).write.mode("overwrite").format(
        "noop"
    ).save()

    results: dict[str, dict] = {}
    for name in names:
        secs: dict[str, float] = {}
        for k in scales:
            best = None
            # steady-state, not cold-start: JIT/whole-stage-codegen
            # warm-up bleeds INTO the big runs, not just the small ones
            # — pagerank at 64x measured 41 → 36 → 16 s across passes in
            # a fresh JVM (the warm 16 s is BELOW linear extrapolation
            # from 16x; the cold 41 s flagged a phantom
            # super-linearity), so capping retimes on slow queries (the
            # old `>= 20 s: break`) recorded warm-up as if it were the
            # operator.  JMH-style depth ladder instead: best-of-2 under
            # 5 s (noise band is small, and a third pass times ~40
            # queries), best-of-3 under 20 s, best-of-5 above — C2
            # compilation on multi-stage loops takes several executions
            # to converge, and the big rows are exactly where the
            # linear/super-linear verdict is decided.
            for i in range(5):
                spark.catalog.clearCache()
                t = time.monotonic()
                qs[name](spark, dirs[k]).write.mode("overwrite").format(
                    "noop"
                ).save()
                dt = time.monotonic() - t
                best = dt if best is None else min(best, dt)
                if (i == 1 and best < 5.0) or (i == 2 and best < 20.0):
                    break
            secs[str(k)] = round(best, 3)
        k_lo, k_hi = scales[-2], scales[-1]
        lin = secs[str(k_lo)] * (k_hi / k_lo)
        norm_hi = round(secs[str(k_hi)] / lin, 3) if lin > 0 else None
        verdict = (
            "linear"
            if norm_hi is not None and norm_hi <= LINEAR_TOLERANCE
            else "super-linear"
        )
        results[name] = {
            "sec": secs,
            "norm_hi": norm_hi,
            "verdict": verdict,
            "protocol": {
                "isolated": bool(args.isolated_child),
                "ladder": _LADDER_VERSION,
                "synthesis": _SYNTHESIS_VERSION,
            },
        }
        print(f"{name:24s} {secs}  norm_hi={norm_hi}  {verdict}", flush=True)

    # ALWAYS merge into an existing artifact, so a partial re-run
    # (--queries x,y) updates rows instead of dropping the rest.
    # The old scales-must-match guard silently REPLACED the whole
    # artifact when a single query was re-laddered at different scales
    # (round-11: a 3-scale ivf_pq_stored re-run clobbered 27 rows).
    # A mismatched run keeps the artifact's header and tags its own
    # rows with a per-row "scales" key — each row's sec dict is
    # self-describing either way.
    artifact = {"scales": scales, "sf_src": args.sf_src, "queries": results}
    if os.path.exists(args.out):
        try:
            with open(args.out) as f:
                prev = json.load(f)
            if prev.get("scales") and prev["scales"] != scales:
                for r in results.values():
                    r["scales"] = scales
                artifact["scales"] = prev["scales"]
                # The header now describes the PREV run's rows, so its
                # sf_src must travel with it — this run's rows carry
                # their own scales tag (sf_src is shared per protocol).
                if prev.get("sf_src"):
                    artifact["sf_src"] = prev["sf_src"]
            merged = dict(prev.get("queries", {}))
            if not prev.get("scales"):
                # Pre-"scales"-key artifact: its rows' measurement
                # scales are UNKNOWN — tag them None rather than let
                # them inherit this run's header scales silently.
                for r in merged.values():
                    r.setdefault("scales", None)
            merged.update(results)
            artifact["queries"] = merged
            my_proto = (
                next(iter(results.values()))["protocol"] if results else None
            )
            mixed = [
                n
                for n, r in merged.items()
                if results and n not in results and r.get("protocol") != my_proto
            ]
            if mixed:
                print(
                    "WARNING: merged artifact mixes measurement "
                    f"protocols — rows {mixed} carry a different "
                    f"(or no) protocol tag than this run's {my_proto}",
                    flush=True,
                )
        except (json.JSONDecodeError, OSError):
            pass
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"wrote {args.out}", flush=True)

    if not args.keep_data:
        shutil.rmtree(args.data_root, ignore_errors=True)
    bad = [n for n, r in results.items() if r["verdict"] != "linear"]
    if bad:
        print(f"SUPER-LINEAR: {bad}", flush=True)
    return 1 if [n for n in bad if n not in EXPECTED_SUPERLINEAR] else 0


if __name__ == "__main__":
    raise SystemExit(main())
