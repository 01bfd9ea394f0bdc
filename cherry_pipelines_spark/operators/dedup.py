"""Deduplication operators for LLM training-data pipelines.

Four families, all expressed with built-in DataFrame ops (no UDFs) so
they scale to 100 TB on shuffle behavior alone:

* **exact** — sha256-hash groupBy; one shuffle on a 64-hex key.
* **minhash + LSH** — shingle → k minhashes → b bands → bucket join;
  candidate pairs come from equi-joins on (band, bucket-hash), never a
  cross join.  The minhash uses the engine-portable ``(a*h32+b) % p``
  family so a SQL oracle reproduces it bit-for-bit.
* **simhash** — 16-bit sign-aggregated token-hash fingerprint; near-dup
  candidates share the fingerprint (or a band of it).
* **n-gram Jaccard** — exact pairwise Jaccard via a shingle equi-join
  (|A∩B| from the join, |A|,|B| from per-doc counts) — no n² scan; the
  join fans out only on shared shingles, and at scale is preceded by
  the minhash-LSH candidate filter.

Embedding-cosine near-dup lives in ``similarity.py``.
"""

from __future__ import annotations

import warnings
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cherry_pipelines_spark.operators.text import fan_out as _fan_out
from cherry_pipelines_spark.operators.text import h32, tokens

# minhash family: h_i(x) = (a_i*x + b_i) mod p with p prime > 2^32 and
# small deterministic coefficients (mirrored in the SQL oracle); all
# arithmetic stays below 2^63 so plain BIGINT works on both engines
MINHASH_P = 4294967311


def _coeffs(k: int) -> list[tuple[int, int]]:
    return [(37 + 12 * i, 101 + 97 * i) for i in range(k)]


def exact_duplicates(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Group by content hash; emit one row per content group with the
    canonical (min) doc_id and the duplicate count."""
    return (
        df.select(F.sha2(F.col(text_col), 256).alias("content_hash"), "doc_id")
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count("*").cast("long").alias("n_copies"),
        )
    )


def _shingle_rows(df: DataFrame, text_col: str = "text", ngram: int = 3) -> DataFrame:
    """(doc_id, n_sh, shingle) — one row per *distinct* word n-gram per
    document, with the per-doc distinct count carried on every row.

    Arrow-batched ``mapInPandas``, not the ``zip_with`` expression from
    ``text.shingle_array``: higher-order-function lambdas are interpreted
    per element (outside whole-stage codegen), and shingling evaluates
    ~n·ngram lambdas per document — measured ~3× slower than this
    vectorized producer at sf0.1.  String semantics are identical to
    ``shingle_array(tokens(c), ngram)``: split on single spaces (empty
    tokens kept), ``max(n-ngram+1, 1)`` shingles, documents shorter than
    ``ngram`` yield one truncated shingle, NULL text yields no rows.
    ``shingle_array`` remains the pure-JVM form for in-array use
    (``fingerprint``)."""
    id_field = df.schema[  # preserve the caller's doc_id type exactly
        "doc_id"
    ]
    out_schema = T.StructType(
        [
            id_field,
            T.StructField("n_sh", T.LongType()),
            T.StructField("shingle", T.StringType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list = []
            counts: list[int] = []
            shingles: list[str] = []
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                if text is None or (isinstance(text, float) and pd.isna(text)):
                    continue
                toks = text.split(" ")
                m = max(len(toks) - (ngram - 1), 1)
                uniq = list(dict.fromkeys(" ".join(toks[i : i + ngram]) for i in range(m)))
                ids.extend([doc_id] * len(uniq))
                counts.extend([len(uniq)] * len(uniq))
                shingles.extend(uniq)
            yield pd.DataFrame({"doc_id": ids, "n_sh": counts, "shingle": shingles})

    return _fan_out(df.select("doc_id", text_col)).mapInPandas(gen, out_schema)


def shingles_df(df: DataFrame, text_col: str = "text", ngram: int = 3) -> DataFrame:
    """(doc_id, shingle) — distinct word n-grams per document."""
    return _shingle_rows(df, text_col, ngram).select("doc_id", "shingle")


def shingle_sets(
    df: DataFrame,
    text_col: str = "text",
    ngram: int = 3,
    k: int = 0,
    include_shingles: bool = True,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(doc_id, n_sh, shingles[, mh0..mh{k-1}]) — the per-doc distinct
    shingle set in ARRAY form: one output row per document, produced
    map-only (same Arrow producer as ``_shingle_rows``, same string
    semantics).

    With ``k > 0`` the k minhash values are computed inside the same
    pass (numpy affine transforms over the shingle sha-hashes), so a
    full signature table costs ZERO shuffles — versus the
    explode → groupBy(doc_id) reduction of the row form, whose shuffle
    carries every (doc, shingle) pair.  Values are bit-identical to the
    min-over-exploded-rows aggregation (same ``h32``, same
    coefficients, same modulus), so the DuckDB oracles are unaffected.

    (An array-form pair-verify — joining shingle arrays onto candidate
    pairs and intersecting in-row — was tried and measured 1.7× slower
    than the row-driven verify at sf0.1: candidate rows hauling full
    arrays through two shuffles cost more than the skinny row fan-out.
    The array form earns its keep for signatures only.)

    ``extra_cols`` passes small tag/metadata columns through the
    producer unchanged (a post-hoc join would re-shuffle one row per doc
    just to restore them).  ``include_shingles=False`` drops the
    ``shingles`` array column from the OUTPUT — Spark cannot column-prune inside a ``mapInPandas``
    producer, so signature-only callers that select just ``mh*`` would
    otherwise pay Arrow serialization for every shingle string of every
    document (measured ~2× on ``cross_corpus_near_dups``, which builds
    signatures for two corpora and needs no arrays)."""
    import hashlib

    import numpy as np

    coeffs = _coeffs(k)
    id_field = df.schema["doc_id"]
    fields = [id_field, T.StructField("n_sh", T.LongType())]
    if include_shingles:
        fields.append(T.StructField("shingles", T.ArrayType(T.StringType())))
    fields += [T.StructField(f"mh{i}", T.LongType()) for i in range(k)]
    fields += [df.schema[c] for c in extra_cols]
    out_schema = T.StructType(fields)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list = []
            counts: list[int] = []
            sets: list[list[str]] = []
            mhs: list[list[int]] = [[] for _ in range(k)]
            extras: dict[str, list] = {c: [] for c in extra_cols}
            for row_i, (doc_id, text) in enumerate(zip(pdf["doc_id"], pdf[text_col])):
                if text is None or (isinstance(text, float) and pd.isna(text)):
                    continue
                for c in extra_cols:
                    extras[c].append(pdf[c].iloc[row_i])
                toks = text.split(" ")
                m = max(len(toks) - (ngram - 1), 1)
                uniq = list(
                    dict.fromkeys(" ".join(toks[i : i + ngram]) for i in range(m))
                )
                ids.append(doc_id)
                counts.append(len(uniq))
                if include_shingles:
                    sets.append(uniq)
                if k:
                    # h32 parity: first 4 bytes of sha256, big-endian —
                    # identical to conv(substr(sha2(s,256),1,8),16,10)
                    hs = np.fromiter(
                        (
                            int.from_bytes(
                                hashlib.sha256(s.encode()).digest()[:4], "big"
                            )
                            for s in uniq
                        ),
                        dtype=np.int64,
                        count=len(uniq),
                    )
                    for i, (a, b) in enumerate(coeffs):
                        # a ≤ 37+12k, h < 2^32 → a*h+b < 2^63: no overflow
                        mhs[i].append(int(((a * hs + b) % MINHASH_P).min()))
            data: dict = {"doc_id": ids, "n_sh": counts}
            if include_shingles:
                data["shingles"] = sets
            for i in range(k):
                data[f"mh{i}"] = mhs[i]
            for c in extra_cols:
                data[c] = extras[c]
            yield pd.DataFrame(data)

    return _fan_out(df.select("doc_id", text_col, *extra_cols)).mapInPandas(
        gen, out_schema
    )


def minhash_signatures(
    df: DataFrame, text_col: str = "text", k: int = 8, ngram: int = 3
) -> DataFrame:
    """k-minhash signature per doc as k columns mh0..mh{k-1}, computed
    map-only in the shingle producer (no explode/groupBy shuffle).
    Shingle arrays are suppressed at the producer (not select-pruned —
    pruning cannot reach inside mapInPandas)."""
    return shingle_sets(df, text_col, ngram, k=k, include_shingles=False).select(
        "doc_id", *[f"mh{i}" for i in range(k)]
    )


def _banded(
    df: DataFrame, text_col: str, k: int, bands: int, ngram: int
) -> DataFrame:
    """(doc_id, band, key) LSH band rows from map-only signatures."""
    return _banded_from_sig(minhash_signatures(df, text_col, k, ngram), k, bands)


def _banded_from_sig(
    sig: DataFrame, k: int, bands: int, extra_cols: tuple[str, ...] = ()
) -> DataFrame:
    """(doc_id, band, key[, extras]) band rows from an existing signature
    frame (columns doc_id, mh0..mh{k-1}) — lets callers that already hold
    the signatures (e.g. a shared shingle+signature subtree) band without
    re-shingling."""
    rows_per_band = k // bands
    # band key = fixed-width binary concat of the band's minhash longs
    # (cast BIGINT->BINARY is the 8-byte big-endian encoding): injective,
    # so bucket membership — and therefore every emitted pair — is
    # identical to any other exact encoding, but the groupBy/join
    # shuffles carry 8*rows_per_band bytes instead of a ~20-char decimal
    # string per minhash.  Keys never appear in operator output.
    band_structs = [
        F.struct(
            F.lit(bi).alias("band"),
            F.concat(
                *[
                    F.col(f"mh{bi * rows_per_band + r}").cast("binary")
                    for r in range(rows_per_band)
                ]
            ).alias("key"),
        )
        for bi in range(bands)
    ]
    return sig.select(
        "doc_id", *extra_cols, F.explode(F.array(*band_structs)).alias("bk")
    ).select(
        "doc_id",
        F.col("bk.band").alias("band"),
        F.col("bk.key").alias("key"),
        *extra_cols,
    )


def cross_corpus_near_dups(
    new_df: DataFrame,
    ref_df: DataFrame,
    text_col: str = "text",
    k: int = 8,
    bands: int = 4,
    ngram: int = 3,
) -> DataFrame:
    """Near-duplicate hits of a NEW corpus against a REFERENCE corpus
    (dedup-against-the-training-set): every new doc that LSH-collides
    with at least one reference doc, with the hit count and the smallest
    colliding reference id for audit.  Anti-join the result against the
    new corpus to keep only novel documents.

    Scale shape: both corpora reduce to band rows in ONE tagged pass of
    the map-only signature producer (two separate passes each paid the
    Python-stage floor; merging them measured 1.45 → 0.9 s at sf0.1).
    The skinny signature frame (one row/doc, no shingle arrays) is
    localCheckpoint-ed (not .cache(): checkpoint blocks are reclaimed by
    the ContextCleaner when the frame goes out of scope, where a cached
    frame leaks storage until an explicit unpersist — round-5 advice)
    so the new/ref split does not re-run the producer, and the
    only shuffle is the (band, key) equi-join between the two sides —
    the reference corpus is never self-joined, and at steady state its
    band rows can be precomputed once and stored as the dedup index of
    the training set."""
    tagged = (
        new_df.select("doc_id", text_col)
        .withColumn("_is_new", F.lit(True))
        .unionByName(
            ref_df.select("doc_id", text_col).withColumn("_is_new", F.lit(False))
        )
    )
    sig = shingle_sets(
        tagged, text_col, ngram, k=k, include_shingles=False,
        extra_cols=("_is_new",),
    ).localCheckpoint(eager=False)
    banded = _banded_from_sig(sig, k, bands, extra_cols=("_is_new",))
    nb = banded.filter(F.col("_is_new")).select("doc_id", "band", "key")
    rb = banded.filter(~F.col("_is_new")).select(
        F.col("doc_id").alias("ref_id"), "band", "key"
    )
    return (
        nb.join(rb, ["band", "key"])
        .groupBy("doc_id")
        .agg(
            F.countDistinct("ref_id").cast("long").alias("n_ref_hits"),
            F.min("ref_id").alias("first_ref_id"),
        )
    )


def minhash_jaccard_estimates(
    df: DataFrame,
    text_col: str = "text",
    k: int = 8,
    bands: int = 4,
    ngram: int = 3,
    max_bucket: int = 10_000,
) -> DataFrame:
    """LSH candidate pairs with the ESTIMATED Jaccard — the fraction of
    matching minhash components — instead of the exact shingle-
    intersection verify.  (doc_a, doc_b, jaccard_est).

    This is the constant-per-pair similarity check: the exact verify
    join fans out one row per shared shingle (O(|∩|) per pair), while
    the estimate compares k integers.  At 100 TB the estimate screens
    the candidate stream first and the exact verify runs only on the
    survivors; standard error is ~sqrt(j(1-j)/k), so k is the precision
    dial.  ONE signature pass feeds both the banding and the estimate
    (localCheckpoint-ed skinny frame, same lifetime contract as
    cross_corpus_near_dups).

    Candidate generation inherits ``_pairs_from_banded``'s
    ``max_bucket`` saturation: a band bucket larger than ``max_bucket``
    pairs its overflow members only with the bucket minimum (blast-
    radius cap) instead of enumerating all O(n^2) pairs — an exact-
    replay oracle that enumerates every pair diverges on such buckets,
    so keep fixtures under the cap or raise it."""
    sig = shingle_sets(
        df, text_col, ngram, k=k, include_shingles=False
    ).localCheckpoint(eager=False)
    cands = _pairs_from_banded(_banded_from_sig(sig, k, bands), max_bucket)
    a = sig.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"mh{i}").alias(f"_a{i}") for i in range(k)],
    )
    b = sig.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"mh{i}").alias(f"_b{i}") for i in range(k)],
    )
    n_match = sum(
        F.when(F.col(f"_a{i}") == F.col(f"_b{i}"), 1).otherwise(0) for i in range(k)
    )
    return (
        cands.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (n_match.cast("double") / F.lit(float(k))).alias("jaccard_est"),
        )
    )


def lsh_recall_stats(
    df: DataFrame,
    text_col: str = "text",
    threshold: float = 0.5,
    k: int = 8,
    bands: int = 4,
    ngram: int = 3,
    max_bucket: int = 10_000,
) -> DataFrame:
    """Candidate RECALL of minhash-LSH banding against the exact n-gram
    Jaccard ≥ ``threshold`` pair set — ONE row (n_exact, n_candidates,
    n_hit, recall).  The measurement loop to run per corpus sample
    before committing band/row settings for a 100 TB dedup pass.

    Scale shape: ONE shingle+signature producer pass feeds BOTH sides —
    the exact self-join explodes the materialized frame's shingle
    arrays JVM-side while the candidates band off its mh columns — and
    each derived pair frame is materialized once even though the stats
    consume it twice (its own count + the semi-join).  The naive
    composition (exact operator + LSH operator + semi-join) re-runs the
    Python shingle producer four times; this runs it once (measured
    1.4 → 0.6 s warm at sf0.1).  Candidate generation inherits
    ``_pairs_from_banded``'s ``max_bucket`` saturation (see
    :func:`minhash_lsh_candidates`)."""
    ss = shingle_sets(df, text_col, ngram, k=k).localCheckpoint(eager=False)
    sh = ss.select("doc_id", "n_sh", F.explode("shingles").alias("shingle"))
    exact = (
        _jaccard_tail(_intersection_counts(sh), threshold)
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=False)
    )
    cand = _pairs_from_banded(
        _banded_from_sig(ss, k, bands), max_bucket
    ).localCheckpoint(eager=False)
    ca = cand.select(F.col("doc_a").alias("ca"), F.col("doc_b").alias("cb"))
    hit = exact.join(
        ca, (exact.doc_a == ca.ca) & (exact.doc_b == ca.cb), "semi"
    )
    # 1-row aggregates: the crossJoins broadcast single rows, never data
    return (
        exact.agg(F.count(F.lit(1)).cast("long").alias("n_exact"))
        .crossJoin(cand.agg(F.count(F.lit(1)).cast("long").alias("n_candidates")))
        .crossJoin(hit.agg(F.count(F.lit(1)).cast("long").alias("n_hit")))
        .select(
            "n_exact",
            "n_candidates",
            "n_hit",
            # n_exact == 0 would divide to NULL (non-ANSI Spark), which
            # downstream tooling misreads as missing data — make the
            # vacuous case explicit: no exact pairs to recall = 1.0
            # (round-7 advice).
            F.when(F.col("n_exact") == 0, F.lit(1.0))
            .otherwise(
                F.round(
                    F.col("n_hit").cast("double")
                    / F.col("n_exact").cast("double"),
                    6,
                )
            )
            .alias("recall"),
        )
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    k: int = 8,
    bands: int = 4,
    ngram: int = 3,
    max_bucket: int = 10_000,
) -> DataFrame:
    """LSH banding: split the k-signature into ``bands`` rows-per-band
    groups, bucket docs by (band_id, band values), and emit candidate
    pairs (doc_a < doc_b) that collide in ≥1 band.

    Scale shape: one groupBy for signatures, one explode to b rows/doc,
    one self-equi-join on the band key — shuffle keys are band hashes,
    so skew only appears if many docs are near-identical (exactly the
    case where the pairs are wanted).  ``max_bucket`` bounds the blast
    radius of a degenerate bucket (N identical docs → N²/2 pairs and an
    N-element collected array): only the ``max_bucket`` smallest doc ids
    per bucket pair up.  For dedup that loses nothing — members of a
    saturated bucket still pair with the bucket minimum, so connected
    components still merge the whole cluster."""
    return _pairs_from_banded(_banded(df, text_col, k, bands, ngram), max_bucket)


def _pairs_from_banded(banded: DataFrame, max_bucket: int) -> DataFrame:
    """Candidate pairs from (doc_id, band, key) band rows — the bucket
    expansion half of :func:`minhash_lsh_candidates`."""
    # single-pass bucket expansion instead of a self-join: the signature
    # subtree is computed once, buckets collapse in one shuffle, and
    # pairs are generated inside each (band, key) bucket.  Buckets are
    # tiny unless docs are near-identical — exactly when pairs are the
    # desired output.
    buckets = (
        banded.groupBy("band", "key")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("all_ids"))
        .filter(F.size("all_ids") > 1)
        .select(
            F.slice("all_ids", 1, max_bucket).alias("ids"),
            F.when(
                F.size("all_ids") > max_bucket,
                F.slice(
                    "all_ids", max_bucket + 1, F.size("all_ids") - F.lit(max_bucket)
                ),
            ).otherwise(F.slice("all_ids", 1, 0)).alias("overflow"),
        )
    )
    pairs = buckets.select(
        F.explode(
            F.concat(
                F.expr(
                    "flatten(transform(ids, (a, i) -> "
                    "transform(slice(ids, i + 2, size(ids)), b -> "
                    "struct(a AS doc_a, b AS doc_b))))"
                ),
                # overflow members each pair with the bucket minimum so a
                # saturated bucket still forms one connected component
                F.expr(
                    "transform(overflow, b -> struct(ids[0] AS doc_a, b AS doc_b))"
                ),
            )
        ).alias("p")
    ).select("p.doc_a", "p.doc_b")
    return pairs.distinct()


def duplicate_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iterations: int = 20,
) -> DataFrame:
    """Connected components over candidate duplicate pairs: every doc
    gets ``cluster_id`` = the minimum doc id reachable through the pair
    graph (its own id when it has no duplicates).  This is the step that
    turns pairwise candidates (minhash-LSH / jaccard / near-dup) into
    keep-one-per-cluster dedup decisions.

    Iterative min-label propagation: per round, each node takes the min
    of its own label and its neighbors' labels — one shuffle per round,
    rounds = graph diameter (duplicate clusters are near-cliques, so
    2-3 rounds in practice).  ``localCheckpoint`` truncates the plan
    between rounds, which is what keeps an iterative DataFrame algorithm
    viable at scale (otherwise the lineage doubles every round).
    Convergence is detected by a count of changed labels (one scalar
    action per round — not a driver-side data collection).
    """
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(
            pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = docs.select(
        F.col(id_col).alias("node"), F.col(id_col).alias("label")
    ).localCheckpoint(eager=False)
    changed = 0
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.src == labels.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nbr_label", "label")).alias("label"),
                (F.col("nbr_label") < F.col("label")).alias("_chg"),
            )
        ).localCheckpoint()
        changed = new_labels.filter(F.col("_chg")).count()
        labels = new_labels.drop("_chg")
        if changed == 0:
            break
    if changed != 0:
        warnings.warn(
            f"duplicate_clusters did not converge after {max_iterations} "
            f"iterations ({changed} labels still propagating) — clusters may "
            "be split; raise max_iterations (rounds needed = graph diameter)",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels.select(F.col("node").alias(id_col), F.col("label").alias("cluster_id"))


def simhash(df: DataFrame, text_col: str = "text", bits: int = 16) -> DataFrame:
    """Sign-aggregated token-hash fingerprint: bit j of the output is 1
    iff sum over tokens of sign((h32(token)>>j)&1) is positive."""
    tok = _fan_out(df).select(
        "doc_id", F.explode(tokens(F.col(text_col))).alias("token")
    ).withColumn("h", h32(F.col("token")))
    bit_cols = [
        F.sum(
            F.when(F.shiftright(F.col("h"), j).bitwiseAND(1) == 1, 1).otherwise(-1)
        ).alias(f"w{j}")
        for j in range(bits)
    ]
    weights = tok.groupBy("doc_id").agg(*bit_cols)
    fp = None
    for j in range(bits):
        term = F.when(F.col(f"w{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return weights.select("doc_id", fp.cast("long").alias("simhash"))


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    ngram: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
    lsh_prefilter: bool = False,
    lsh_k: int = 8,
    lsh_bands: int = 4,
    lsh_max_bucket: int = 10_000,
) -> DataFrame:
    """n-gram Jaccard similarity pairs, exact or LSH-prefiltered.

    |A∩B| comes from the shingle equi-join; |A∪B| = |A|+|B|-|A∩B|.
    Emits (doc_a < doc_b, jaccard) with jaccard ≥ threshold.

    Scale shape (exact mode): the per-doc shingle count is computed
    while shingling (no shuffle) and carried through the fan-out, so no
    post-hoc size joins are needed; the self-join's two sides are then
    *identical* subplans shuffled on the same key, which Catalyst
    executes as one exchange (ReusedExchange).

    ``max_df`` is the corpus-scale guard for exact mode: a shingle
    occurring in N documents fans the join out N²/2 on that one key (a
    stop-phrase at 100 TB is a job-killer).  When set, shingles with
    document frequency > ``max_df`` are dropped from the *join* before
    pairing — the standard df-cut approximation: per-doc sizes still
    count every shingle, so jaccard for surviving pairs is
    underestimated, never inflated; pairs supported only by ubiquitous
    shingles disappear.  Default None keeps the exact semantics (and
    the SQL oracle).

    ``lsh_prefilter=True`` is the 100 TB default recipe: generate
    candidate pairs with :func:`minhash_lsh_candidates` first, then
    compute exact jaccard ONLY for candidates — the verify join is
    pair-driven (candidates ⨝ doc_a's shingles, then an equi-join on
    (doc_b, shingle)), so its size is |candidates|·shingles/doc no
    matter how common any shingle is: the stop-shingle N² blowup of the
    self-join cannot occur.  Jaccard values for surviving pairs are
    identical to exact mode up to 64-bit shingle-hash collisions (the
    verify join keys on xxhash64(shingle), never the raw string — see
    the inline note); pairs that collide in no LSH band are missed
    (recall is the bands/k dial, same as the LSH operator)."""
    if lsh_prefilter:
        # ONE shingle+signature pass feeds both stages: candidates band
        # off the mh columns, the verify join explodes the same cached
        # frame's shingle arrays JVM-side.  Without the cache the two
        # consumers would re-run the Python shingle producer (their
        # shared subtree is map-only, so no exchange exists to reuse) —
        # sharing it measured 3.13 → 2.60 s warm / 8.50 → 8.24 s cold at
        # sf0.1 (the cache is one row per doc, LRU-evictable).  The verify
        # join itself stays ROW-driven: an array-carrying *join* was
        # measured 1.7× slower (arrays hauled through two shuffles);
        # arrays here live only in the cached map-side frame.
        ss = shingle_sets(df, text_col, ngram, k=lsh_k).localCheckpoint(eager=False)
        # 64-bit-hash the shingles map-side: the verify fan-out and its
        # (doc_b, shingle) equi-probe then shuffle an 8-byte long per row
        # instead of the raw n-gram string (~20-40 bytes) — the dominant
        # byte volume of this operator at scale.  Intersection counts are
        # identical to exact mode up to xxhash64 collisions, a ~D²/2^65
        # event over D distinct shingles — vanishing next to the banding
        # recall loss this mode already accepts.  Exact mode (below)
        # keeps raw strings: it is the oracle baseline.
        sh = ss.select(
            "doc_id", "n_sh", F.explode("shingles").alias("shingle")
        ).select("doc_id", "n_sh", F.xxhash64("shingle").alias("shingle"))
        if max_df is not None:
            sh = sh.join(_rare_shingles(sh, max_df), "shingle")
        cands = _pairs_from_banded(
            _banded_from_sig(ss, lsh_k, lsh_bands), lsh_max_bucket
        )
        a = sh.select(
            F.col("doc_id").alias("doc_a"),
            F.col("n_sh").alias("size_a"),
            "shingle",
        )
        b = sh.select(
            F.col("doc_id").alias("doc_b"),
            F.col("n_sh").alias("size_b"),
            "shingle",
        )
        inter = (
            cands.join(a, "doc_a")  # fan out: one row per (pair, shingle of A)
            .join(b, ["doc_b", "shingle"])  # equi-probe: shingle also in B?
            .groupBy("doc_a", "doc_b", "size_a", "size_b")
            .agg(F.count("*").cast("long").alias("n_common"))
        )
        return _jaccard_tail(inter, threshold)
    sh = _shingle_rows(df, text_col, ngram)
    if max_df is not None:
        sh = sh.join(_rare_shingles(sh, max_df), "shingle")
    return _jaccard_tail(_intersection_counts(sh), threshold)


def _intersection_counts(sh: DataFrame) -> DataFrame:
    """Pairwise shingle-intersection counts from ``(doc_id, n_sh,
    shingle)`` rows — the self-join core shared by exact jaccard,
    containment, and the LSH recall evaluator; emits ``(doc_a < doc_b,
    size_a, size_b, n_common)``.

    shuffle-hash, not broadcast: the exploded shingle table is |docs| ×
    |shingles/doc| rows — far over any broadcast threshold at scale —
    and the identical l/r subplans share one exchange (ReusedExchange).
    No sort needed (sort-merge would add two).

    The shuffled-hash build is per-PARTITION state, so it is safe only
    while ``rows / shuffle_partitions`` fits memory — under FIXED-width
    partition planning that ratio grows linearly with the corpus and
    the build hits a GC cliff (measured: 12.6 → 64.7 s warm for 4x data
    at the 64x scaling point).  The session factory's wide AQE posture
    (`session.py`, default on cluster masters) is what keeps the build
    bounded: exchanges are planned wide and AQE coalesces to the 64 MB
    advisory target, so partition count tracks input volume."""
    l, r = sh.hint("shuffle_hash").alias("l"), sh.hint("shuffle_hash").alias("r")
    return (
        l.join(
            r,
            (F.col("l.shingle") == F.col("r.shingle"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .groupBy(
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
            F.col("l.n_sh").alias("size_a"),
            F.col("r.n_sh").alias("size_b"),
        )
        .agg(F.count("*").cast("long").alias("n_common"))
    )


def _rare_shingles(sh: DataFrame, max_df: int) -> DataFrame:
    """Shingles with document frequency ≤ max_df (the df-cut guard)."""
    return (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("_df"))
        .filter(F.col("_df") <= max_df)
        .select("shingle")
    )


def _jaccard_tail(inter: DataFrame, threshold: float) -> DataFrame:
    """Shared jaccard projection: |A∪B| = |A|+|B|-|A∩B|, threshold, select."""
    return (
        inter.withColumn(
            "jaccard",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("size_a") + F.col("size_b") - F.col("n_common")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jaccard") >= F.lit(threshold))
        .select("doc_a", "doc_b", "n_common", "jaccard")
    )


def canonical_per_cluster(
    clusters: DataFrame,
    scores: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Pick ONE canonical document per duplicate cluster — the
    keep-side of near-dedup: highest ``score_col`` wins, ``id_col``
    breaks ties, and the emitted row carries the cluster size so the
    caller can weight or audit the collapse.

    Input ``clusters`` is ``(id_col, cluster_id)`` (e.g. from
    ``duplicate_clusters``); ``scores`` is ``(id_col, score_col)`` (e.g.
    ``quality_score``'s n_tokens).  Plan: one equi-join on the doc id,
    then a single hash shuffle on cluster_id feeding two window
    functions over the same partitioning (rank + cluster count) — no
    second join, no global sort.  Cluster keys are near-unique (most
    docs are their own cluster), so the window partitions are tiny and
    skew-free by construction."""
    w_rank = Window.partitionBy("cluster_id").orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    w_size = Window.partitionBy("cluster_id")
    return (
        clusters.join(scores.select(id_col, score_col), id_col)
        .withColumn("cluster_size", F.count(F.lit(1)).over(w_size).cast("long"))
        .withColumn("_rn", F.row_number().over(w_rank))
        .filter(F.col("_rn") == 1)
        .select(id_col, "cluster_id", "cluster_size")
    )


def span_spans(
    df: DataFrame, text_col: str = "text", n: int = 6, id_col: str = "doc_id"
) -> DataFrame:
    """Non-overlapping ``n``-token spans of each document with their
    position: (id, span_idx, span_text).  Map-side only (sequence +
    posexplode + slice, same producer shape as ``text.doc_chunks``)."""
    t = tokens(F.col(text_col))
    starts = F.sequence(F.lit(0), F.greatest(F.size(t) - 1, F.lit(0)), F.lit(n))
    return (
        df.select(F.col(id_col), t.alias("_t"), starts.alias("_starts"))
        .select(id_col, F.posexplode("_starts").alias("span_idx", "_start"), "_t")
        .select(
            id_col,
            F.col("span_idx").cast("long").alias("span_idx"),
            F.concat_ws(" ", F.slice(F.col("_t"), F.col("_start") + 1, n)).alias(
                "span_text"
            ),
        )
    )


def boilerplate_spans(
    df: DataFrame,
    text_col: str = "text",
    n: int = 6,
    max_docs: int = 2,
    id_col: str = "doc_id",
    max_spans: int = 10_000,
) -> DataFrame:
    """Spans repeated across more than ``max_docs`` DISTINCT documents —
    the exact-substring boilerplate set (headers, footers, license
    blocks, nav chrome).  One uniform-key shuffle (groupBy span hash);
    ``max_spans`` caps the result so the scrub side can broadcast it
    (the boilerplate set is small by nature — each member appears in
    many documents, so |set| <= corpus_spans / max_docs; the cap keeps
    the top offenders if an adversarial corpus breaks that bound)."""
    sp = span_spans(df, text_col, n, id_col)
    return (
        sp.groupBy(h32(F.col("span_text")).alias("span_h"))
        .agg(F.count_distinct(id_col).cast("long").alias("n_docs"))
        .filter(F.col("n_docs") > max_docs)
        .orderBy(F.col("n_docs").desc(), "span_h")
        .limit(max_spans)
    )


def span_scrub(
    df: DataFrame,
    text_col: str = "text",
    n: int = 6,
    max_docs: int = 2,
    id_col: str = "doc_id",
) -> DataFrame:
    """Remove cross-document boilerplate spans from every document
    (CCNet/RefinedWeb-style repeated-paragraph scrubbing, here over
    fixed ``n``-token spans since fixture docs carry no line structure).

    Two-pass plan built for 100 TB: pass 1 aggregates span hashes into
    the (small, capped) boilerplate set; pass 2 re-derives each doc's
    spans MAP-SIDE inside an array ``filter`` against the broadcast
    set — the corpus is never exploded-and-regrouped, so the only
    shuffle in the whole operator is the pass-1 uniform hash groupBy.

    Output: (id, n_spans, n_removed, clean_text) — clean_text is the
    surviving spans rejoined in order ('' when everything was scrubbed).
    """
    bad = boilerplate_spans(df, text_col, n, max_docs, id_col).agg(
        F.coalesce(F.collect_list("span_h"), F.array().cast("array<long>")).alias(
            "_bad"
        )
    )
    t = tokens(F.col(text_col))
    starts = F.sequence(
        F.lit(0), F.greatest(F.size(F.col("_t")) - 1, F.lit(0)), F.lit(n)
    )
    spans = F.transform(
        starts, lambda s: F.concat_ws(" ", F.slice(F.col("_t"), s + 1, n))
    )
    kept = F.filter(
        F.col("_spans"), lambda sp: ~F.array_contains(F.col("_bad"), h32(sp))
    )
    return (
        df.crossJoin(F.broadcast(bad))
        .select(F.col(id_col), t.alias("_t"), F.col("_bad"))
        .withColumn("_spans", spans)
        .select(
            id_col,
            F.size("_spans").cast("long").alias("n_spans"),
            (F.size("_spans") - F.size(kept)).cast("long").alias("n_removed"),
            F.concat_ws(" ", kept).alias("clean_text"),
        )
    )


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    ngram: int = 3,
    threshold: float = 0.8,
    max_df: int | None = None,
) -> DataFrame:
    """ASYMMETRIC n-gram containment pairs: C(A→B) = |A∩B| / |A|.
    Jaccard misses near-SUPERSET relations (a paragraph quoted inside a
    much longer page scores tiny jaccard but containment ≈ 1), which is
    exactly the quote/boilerplate-embedding/near-superset case a
    training-data dedup pass wants to catch separately from whole-doc
    duplicates.

    Emits ``(doc_a < doc_b, cont_a_in_b, cont_b_in_a)`` where EITHER
    direction clears ``threshold``.  Same shuffle-hash self-join shape
    (and ``max_df`` stop-shingle guard) as
    :func:`ngram_jaccard_pairs`'s exact mode — one shared exchange, the
    only change is the tail arithmetic."""
    sh = _shingle_rows(df, text_col, ngram)
    if max_df is not None:
        sh = sh.join(_rare_shingles(sh, max_df), "shingle")
    inter = _intersection_counts(sh)
    c_ab = F.round(
        F.col("n_common").cast("double") / F.col("size_a").cast("double"), 6
    )
    c_ba = F.round(
        F.col("n_common").cast("double") / F.col("size_b").cast("double"), 6
    )
    return (
        inter.withColumn("cont_a_in_b", c_ab)
        .withColumn("cont_b_in_a", c_ba)
        .filter(
            (F.col("cont_a_in_b") >= threshold)
            | (F.col("cont_b_in_a") >= threshold)
        )
        .select("doc_a", "doc_b", "n_common", "cont_a_in_b", "cont_b_in_a")
    )


def duplicated_span_pairs(
    df: DataFrame,
    text_col: str = "text",
    k: int = 8,
    max_window_occ: int = 50,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact duplicated-SPAN detection between document pairs — the
    exact-substring dedup verdict of Lee et al. 2022 ("Deduplicating
    Training Data Makes Language Models Better"), which set-based
    similarity cannot produce: Jaccard/containment say HOW MUCH two
    docs share, this says the LONGEST contiguous run of tokens they
    share verbatim (the memorization-relevant quantity; the paper
    removes spans >= 50 tokens).

    Method, all JVM-side: every k-token SLIDING window of every doc
    (position-stamped; docs shorter than k tokens yield none), windows
    with more than ``max_window_occ`` OCCURRENCES corpus-wide dropped —
    an occurrence cap, not a distinct-doc cap, because the equi-join
    matches occurrences: one degenerate repetitive doc pair ("spam"
    x 100k) would have df=2 but occ² join rows, and the occurrence cap
    is what actually bounds join work at C(cap, 2) per key
    (boilerplate-grade windows belong to :func:`boilerplate_spans`;
    same ladder-safe absolute-cap posture as ``tfidf_doc_pairs``).
    Cross-doc equi-join on the window TEXT (not a hash — bit-exact
    oracle parity, no collision caveat), then shared windows chain
    into maximal runs by the classic diagonal trick: matches of the
    same pair on one diagonal (pos_a − pos_b constant) with
    consecutive pos_a form one duplicated span of
    ``run_len + k − 1`` tokens (gaps-and-islands via
    ``pos_a − row_number``).

    Output: ``(doc_a < doc_b, max_span_tokens, shared_window_pairs)``
    per pair sharing at least one window.  ``shared_window_pairs`` is
    the total matched (occurrence_a, occurrence_b) count — every match
    belongs to exactly one run, so it is ``sum(run_len)``.

    Scale shape: explode is map-side; one uniform-key groupBy for the
    df cap; one equi-join shuffle on window text; one (pair, diagonal)
    window + partial-agg chain.  Per-window join work is bounded by
    C(max_window_occ, 2) regardless of corpus size."""
    runs = _span_runs(df, text_col, k, max_window_occ, id_col)
    return runs.groupBy("doc_a", "doc_b").agg(
        (F.max("_run") + F.lit(k - 1)).cast("long").alias("max_span_tokens"),
        F.sum("_run").cast("long").alias("shared_window_pairs"),
    )


def window_occurrences(
    df: DataFrame, text_col: str = "text", k: int = 8, id_col: str = "doc_id"
) -> DataFrame:
    """Every k-token sliding window of every document, position-stamped:
    ``(id, pos, _w)`` with ``pos`` the 0-based token offset and ``_w``
    the space-joined window text.  Map-side only.  Shared producer of
    the duplicated-span family and the cross-corpus benchmark
    decontamination (``contamination.benchmark_span_occurrences``).

    Short-doc guard: ``sequence(1, 0)`` is the DESCENDING array
    ``[1, 0]`` in Spark, whose 0 start then blows up ``F.slice`` — a
    doc with fewer than k tokens must yield an EMPTY window array (the
    oracle's range() end-exclusive semantics), not a crash.

    Fanned out before the explode: a one-file corpus otherwise runs the
    whole window synthesis (tokens × k slice/concat per doc) in a
    single scan task (round-13 measurement: the explode alone was
    1.4 s single-threaded at sf0.1, the hottest primitive of the whole
    span family); already-parallel many-file inputs skip the shuffle."""
    from cherry_pipelines_spark.operators.text import fan_out

    df = fan_out(df.select(id_col, text_col))
    t = tokens(F.coalesce(F.col(text_col), F.lit("")))
    starts = F.when(
        F.size(t) >= k, F.sequence(F.lit(1), F.size(t) - F.lit(k - 1))
    ).otherwise(F.expr("array()").cast("array<int>"))
    wins = F.transform(starts, lambda s: F.concat_ws(" ", F.slice(t, s, k)))
    return df.select(F.col(id_col), F.posexplode(wins).alias("pos", "_w"))


def _span_runs(
    df: DataFrame, text_col: str, k: int, max_window_occ: int, id_col: str
) -> DataFrame:
    """Shared body of the duplicated-span family: windows → occurrence
    cap → cross-doc HASH-KEYED join → diagonal gaps-and-islands.
    Returns one row per maximal run: ``(doc_a, doc_b, _diag, _pa0,
    _run)`` with ``_pa0`` the run's first window position in doc_a
    (``_pa0 - _diag`` is the doc_b position) and ``_run`` the number of
    chained windows (span = _run + k − 1 tokens).

    SHUFFLE-KEY DESIGN (round-13, verdict #3): the occurrence table is
    the biggest shuffle in the LLM-ops suite, and joining it on the
    raw k-token window text (~50+ bytes/row) made key width pure
    overhead.  Occurrence rows now shuffle on ``(xxhash64(_w), salt)``
    — 12 bytes — with the text DROPPED before any occurrence-level
    shuffle, which cuts occurrence-join shuffle bytes ~3× (measured in
    SCALE.md round-13).  Exactness is preserved WITHOUT a collision
    caveat: 64-bit collisions among DISTINCT windows are detected
    exactly on the distinct-window table (the occurrence-cap
    aggregate, already text-keyed and map-side-combined to one row
    per distinct window per partition), and each colliding text gets
    a per-hash ``salt`` from a tiny broadcast map, making
    ``(hash, salt) ↔ window text`` a bijection — so the hash join
    matches exactly the pairs the text join would.  Expected collided
    set at 10^9 distinct windows: ~0.05 rows (birthday bound), so the
    broadcast is metadata-sized; a pathological corpus degrades the
    broadcast, never correctness."""
    w = window_occurrences(df, text_col, k, id_col)
    # one row per DISTINCT window with its exact corpus-wide count —
    # partial aggregation compresses the text shuffle to
    # distinct-per-partition, and this is the ONLY shuffle that still
    # carries window text
    dist = (
        w.groupBy("_w")
        .agg(F.count(F.lit(1)).alias("_occ"))
        .withColumn("_wh", F.xxhash64("_w"))
    )
    # exact collision resolution: distinct windows sharing a 64-bit
    # hash (computed over ALL windows, not just rare ones — a dropped
    # frequent window colliding with a rare one must not leak its
    # occurrences into the rare key) get salts 1..n per hash
    coll = (
        dist.groupBy("_wh")
        .agg(F.count(F.lit(1)).alias("_nw"))
        .filter(F.col("_nw") > 1)
        .select("_wh")
    )
    cmap = dist.join(coll, "_wh").select(
        "_w",
        F.row_number()
        .over(Window.partitionBy("_wh").orderBy("_w"))
        .alias("_salt"),
    )
    rare = (
        # _occ >= 2: singleton windows (the bulk of a natural corpus's
        # distinct windows) can never produce a cross-doc pair, so
        # keeping them in the join key set only inflates the hash build
        # side and the matched groups — dropping them changes nothing
        # downstream (a 1-occurrence group expands to zero pairs)
        dist.filter(
            (F.col("_occ") <= max_window_occ) & (F.col("_occ") >= 2)
        )
        .join(F.broadcast(cmap), "_w", "left")
        .select("_wh", F.coalesce("_salt", F.lit(0)).alias("_salt"))
    )
    occ = w.join(F.broadcast(cmap), "_w", "left").select(
        F.xxhash64("_w").alias("_wh"),
        F.coalesce("_salt", F.lit(0)).alias("_salt"),
        F.col(id_col),
        F.col("pos"),
    )
    # SHUFFLE_HASH, not broadcast, for the occurrence⨝rare-keys join:
    # Catalyst can't see the posexplode fan-out, underestimates the
    # occurrence side, and happily broadcasts the ENTIRE occurrence
    # table (measured 872 MB on the old text-keyed plan, 436 MB on the
    # un-hinted hash plan at x16 — a driver OOM and a per-executor
    # network fan-out at 100 TB).  The hint shuffles both sides on the
    # compact 12-byte key and builds the hash map from the
    # distinct-keys side per partition — the only shape that scales;
    # rare's size grows with corpus distinct windows, so it must never
    # be a broadcast candidate either.
    wr = occ.join(rare.hint("shuffle_hash"), ["_wh", "_salt"])
    # PAIR EXPANSION (round-13 optimization): the old shape matched
    # occurrences with a self-join of ``wr`` on (_wh, _salt), which
    # plans as two full copies of the ENTIRE upstream subtree (window
    # explode, distinct-window aggregate, collision map, occurrence
    # join — the formatted plan scanned the corpus 8×).  Because the
    # occurrence cap bounds every group at ``max_window_occ`` rows, the
    # same pairs come from ONE pass: group the already-co-partitioned
    # occurrences by (_wh, _salt) — no new shuffle, same keys as the
    # join — collect the (id, pos) structs, and expand the bounded
    # in-row cross product (≤ C(cap, 2) pairs) map-side with nested
    # ``transform`` + ``flatten``.  Identical pair set: (x, y) from the
    # same key with x.id < y.id, every (pos_a, pos_b) combination.
    occs = wr.groupBy("_wh", "_salt").agg(
        F.collect_list(
            F.struct(F.col(id_col).alias("_id"), F.col("pos").alias("_p"))
        ).alias("_os")
    )
    pair = F.filter(
        F.flatten(
            F.transform(
                F.col("_os"),
                lambda x: F.transform(
                    F.col("_os"),
                    lambda y: F.struct(
                        x["_id"].alias("a"),
                        y["_id"].alias("b"),
                        x["_p"].alias("pa"),
                        y["_p"].alias("pb"),
                    ),
                ),
            )
        ),
        lambda s: s["a"] < s["b"],
    )
    matched = occs.select(F.explode(pair).alias("_m")).select(
        F.col("_m.a").alias("doc_a"),
        F.col("_m.b").alias("doc_b"),
        F.col("_m.pa").alias("_pa"),
        F.col("_m.pb").alias("_pb"),
    )
    diag = (F.col("_pa") - F.col("_pb")).alias("_diag")
    win = Window.partitionBy("doc_a", "doc_b", "_diag").orderBy("_pa")
    return (
        matched.select("doc_a", "doc_b", diag, "_pa")
        .withColumn("_grp", F.col("_pa") - F.row_number().over(win))
        .groupBy("doc_a", "doc_b", "_diag", "_grp")
        .agg(
            F.min("_pa").alias("_pa0"),
            F.count(F.lit(1)).alias("_run"),
        )
    )


def duplicated_span_occurrences(
    df: DataFrame,
    text_col: str = "text",
    k: int = 8,
    min_span_tokens: int = 16,
    max_window_occ: int = 50,
    id_col: str = "doc_id",
) -> DataFrame:
    """POSITIONED duplicated spans — the actionable form of
    :func:`duplicated_span_pairs`: one row per maximal shared run with
    its start offsets in BOTH documents, filtered to runs of at least
    ``min_span_tokens`` (Lee et al. remove spans >= 50 tokens; the
    default 16 suits shorter fixture docs).  This is the table a
    scrub/removal pass consumes: (doc_b, pos_b, span_tokens) says
    exactly which token range of the lower-priority doc to cut.

    Output: ``(doc_a < doc_b, pos_a, pos_b, span_tokens)`` — pos are
    0-based token offsets of the run's first window; the run covers
    ``span_tokens`` tokens from there.  Same plan as the pair verdict
    (shared helper) with min(pos) carried through the run aggregation
    instead of collapsed."""
    runs = _span_runs(df, text_col, k, max_window_occ, id_col)
    return (
        runs.select(
            "doc_a",
            "doc_b",
            F.col("_pa0").alias("pos_a"),
            (F.col("_pa0") - F.col("_diag")).alias("pos_b"),
            (F.col("_run") + F.lit(k - 1)).cast("long").alias("span_tokens"),
        )
        .filter(F.col("span_tokens") >= min_span_tokens)
    )


def duplicated_span_scrub(
    df: DataFrame,
    text_col: str = "text",
    k: int = 8,
    min_span_tokens: int = 16,
    max_window_occ: int = 50,
    id_col: str = "doc_id",
) -> DataFrame:
    """CONSUME the :func:`duplicated_span_occurrences` table — the
    Lee et al. 2022 removal pass: every duplicated run of at least
    ``min_span_tokens`` tokens is CUT from the lower-priority document
    (``doc_b``; ``doc_a``, the lowest doc id sharing the span, keeps
    its copy), and the scrubbed corpus is emitted for the curation
    funnel.  In an a<b<c duplicate chain the pairs (a,b), (a,c), (b,c)
    cut b once and c twice (overlapping ranges union per token), so
    exactly the lowest-id copy of each span survives — the canonical-
    representative policy the cluster dedup family uses.

    All cut offsets refer to the ORIGINAL token positions (the
    occurrence table's coordinate system), applied simultaneously —
    never to already-scrubbed text.

    Scale shape: the occurrence table (already bounded by the span
    family's occurrence cap) aggregates to one cut-list row per
    affected doc (one uniform-key shuffle), left-joins the corpus on
    ``id_col`` (one co-partitioned shuffle), and the cut itself is a
    MAP-SIDE indexed array ``filter`` — the corpus text is never
    exploded.  Per-doc cut lists are bounded by the doc's own run
    count (≤ tokens/k), not by corpus size.

    Output: ``(id, n_tokens, n_removed, clean_text)`` for EVERY input
    document (unaffected docs pass through with ``n_removed = 0``);
    token order is preserved and survivors are re-joined with single
    spaces.  Scrubbed output re-passed through
    :func:`duplicated_span_occurrences` yields zero ≥``min_span_tokens``
    runs (pinned in tests/test_llm_data_ops.py)."""
    occ = duplicated_span_occurrences(
        df, text_col, k, min_span_tokens, max_window_occ, id_col
    )
    cuts = occ.select(
        F.col("doc_b").alias(id_col),
        F.struct(
            F.col("pos_b").cast("long").alias("s"),
            (F.col("pos_b") + F.col("span_tokens")).cast("long").alias("e"),
        ).alias("_r"),
    )
    per_doc = cuts.groupBy(id_col).agg(F.collect_list("_r").alias("_cuts"))
    t = tokens(F.coalesce(F.col(text_col), F.lit("")))
    no_cuts = F.array().cast("array<struct<s:bigint,e:bigint>>")
    joined = df.join(per_doc, id_col, "left").select(
        F.col(id_col),
        t.alias("_t"),
        F.coalesce(F.col("_cuts"), no_cuts).alias("_cuts"),
    )
    # indexed array filter: token i survives iff NO cut range covers i
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
