"""Deterministic sampling operators for training-data pipelines.

`df.sample()` is seed-dependent per partition layout — re-running after
a repartition yields a different sample, which breaks reproducible
dataset releases.  These operators hash a stable key instead: the same
row is kept or dropped regardless of partitioning, cluster size, or
engine (the sha256-based ``h32`` matches the DuckDB oracle bit-for-bit).

Scale notes: both samplers are map-only — no shuffle, no driver state;
they compose with scan pushdown (the hash filter evaluates after column
pruning).  ``group_topk`` is one shuffle on the group key plus a
per-group window (rank state only).
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from cherry_pipelines_spark.operators.text import h32

# hash buckets for rate resolution: 1e-4 granularity
_MOD = 10_000
_N_SALT = 64  # per-group pre-rank fan-out of the two-phase top-k


def hash_sample(df: DataFrame, key: Column, rate: float) -> DataFrame:
    """Keep a deterministic ``rate`` fraction of rows by stable key hash
    (content-addressed sampling: same key → same verdict everywhere)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return df.filter(F.pmod(h32(key.cast("string")), _MOD) < int(rate * _MOD))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: Mapping[str, float],
    key: Column,
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling — e.g. downsample dominant
    languages while keeping the tail (the standard training-mix lever:
    ``{"en": 0.3, "zh": 1.0}``).  Strata absent from ``rates`` keep
    ``default_rate``."""
    for s, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for stratum {s!r} must be in [0, 1], got {r}")
    threshold = F.lit(int(default_rate * _MOD))
    for s, r in sorted(rates.items()):
        threshold = F.when(
            F.col(strata_col) == F.lit(s), F.lit(int(r * _MOD))
        ).otherwise(threshold)
    return df.filter(F.pmod(h32(key.cast("string")), _MOD) < threshold)


def group_topk(
    df: DataFrame,
    group_cols: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    out_col: str = "rank_in_group",
    salt_key: Column | None = None,
) -> DataFrame:
    """Deterministic per-group top-k (quality-quota sampling: keep the k
    best documents per source/language).  ``order_by`` must be a total
    order for reproducibility — include a unique id as the last key.

    A per-group window funnels the WHOLE group through one task — the
    hot-group killer when groups are few and huge (one language at
    100 TB).  Pass ``salt_key`` (any deterministic per-row column, e.g.
    the id) to enable the standard two-phase form: phase 1 keeps the
    top-k per (group, salt-of-key) — map-spread across ``_N_SALT``
    reducers — so the final per-group window ranks at most
    ``k·_N_SALT`` survivors instead of the full group.  Output is
    IDENTICAL (the global top-k is a subset of the union of per-salt
    top-ks); the extra cost is one more shuffle of a k·salt-bounded
    frame."""
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    if salt_key is not None:
        from cherry_pipelines_spark.operators.text import h32

        salt = F.pmod(h32(salt_key.cast("string")), F.lit(_N_SALT))
        w1 = Window.partitionBy(*group_cols, salt).orderBy(*order_by)
        df = df.withColumn("_pre_rank", F.row_number().over(w1)).filter(
            F.col("_pre_rank") <= k
        ).drop("_pre_rank")
    return (
        df.withColumn(out_col, F.row_number().over(w).cast("long"))
        .filter(F.col(out_col) <= k)
    )


def rebalance_to_mix(
    df: DataFrame,
    strata_col: str,
    target_shares: Mapping[str, float],
    key: Column,
) -> DataFrame:
    """Move the corpus toward a target stratum mix by downsampling only
    (no stratum is upsampled): the achievable total is bounded by the
    stratum that is scarcest relative to its target share, every other
    stratum gets a deterministic hash-sampled keep-rate, and strata
    outside the target are dropped.

    E.g. ``{"en": .5, "de": .25, "es": .25}`` with counts en=9000,
    de=500, es=3000 → de binds (500/.25 = 2000 total), so keep all 500
    de, ~1000 en, ~500 es.

    The whole computation stays in-plan: one column-pruned groupBy for
    stratum counts, a broadcast 1-row min-aggregate for the binding
    total, and a broadcast threshold join onto the fact table — no
    driver collect, so it composes inside a pipeline at any scale.
    Sampling uses the engine-portable ``h32`` hash at 1e-4 rate
    granularity: the kept set is stable under repartitioning and
    re-runs, which is what a reproducible dataset release needs."""
    for s, p in target_shares.items():
        if p <= 0.0:
            raise ValueError(f"target share for {s!r} must be > 0, got {p}")
    spark = df.sparkSession
    shares = spark.createDataFrame(
        sorted(target_shares.items()), schema=f"{strata_col} string, share double"
    )
    counts = df.groupBy(strata_col).agg(
        F.count(F.lit(1)).cast("double").alias("n")
    )
    scoped = counts.join(F.broadcast(shares), strata_col)
    total = scoped.agg(F.min(F.col("n") / F.col("share")).alias("total"))
    thresholds = scoped.crossJoin(F.broadcast(total)).select(
        strata_col,
        # floor at hash-bucket granularity; share*total/n <= 1 by
        # construction of the binding total (left-to-right evaluation
        # order mirrors the SQL oracle for bit-identical doubles)
        F.floor(F.lit(float(_MOD)) * F.col("share") * F.col("total") / F.col("n"))
        .cast("long")
        .alias("keep_thr"),
    )
    return (
        df.join(F.broadcast(thresholds), strata_col)
        .filter(F.pmod(h32(key.cast("string")), _MOD) < F.col("keep_thr"))
        .drop("keep_thr")
    )


def pack_sequences(
    df: DataFrame,
    size_col: str,
    budget: int,
    key: Column,
    buckets: int = 1024,
) -> DataFrame:
    """Assign every document its place in packed fixed-budget training
    sequences — the standard pretraining layout where documents are
    concatenated in a deterministic order and the token stream is cut
    every ``budget`` tokens (sequences may span document boundaries).

    Emits ``(…, pack_bucket, seq_id, seq_offset)``: the document's
    tokens start at ``seq_offset`` of sequence ``seq_id`` within its
    bucket.  Documents are spread over ``buckets`` independent streams
    by stable hash so the packing parallelizes: one shuffle on the
    bucket id, a per-bucket running sum (O(1) window state), no global
    sort.  Order within a bucket is the hash-then-key order, so the
    layout is reproducible across runs, partitionings, and engines."""
    b = F.pmod(h32(key.cast("string")), buckets)
    w = (
        Window.partitionBy("pack_bucket")
        .orderBy(key)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(size_col)).over(w)
    # integer div/mod, not float floor: exact at any stream length
    return (
        df.withColumn("pack_bucket", b.cast("long"))
        .withColumn("_start", (cum - F.col(size_col)).cast("long"))
        .withColumn("seq_id", F.expr(f"_start div {int(budget)}"))
        .withColumn("seq_offset", F.pmod("_start", F.lit(int(budget))).cast("long"))
        .drop("_start")
    )


def quantile_gate(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    q: float,
    keep: str = "ge",
) -> DataFrame:
    """Per-group exact-quantile threshold filter: keep rows whose
    ``value_col`` is ≥ (``keep="ge"``) or ≤ (``"le"``) their group's
    interpolated ``q``-quantile — the "drop the worst X% per language"
    curation lever, with the cut computed from the data itself.

    The thresholds table is one row per group (broadcast back onto the
    facts: the fact side never shuffles).  ``percentile`` is the exact
    interpolated form (matches DuckDB ``quantile_cont``); at extreme
    group cardinalities swap in ``approx_percentile`` — same plan shape,
    bounded agg state — and lose oracle exactness only."""
    if keep not in ("ge", "le"):
        raise ValueError(f"keep must be 'ge' or 'le', got {keep!r}")
    thr = df.groupBy(*group_cols).agg(
        F.expr(f"percentile({value_col}, {q})").alias("_thr")
    )
    cond = (
        F.col(value_col) >= F.col("_thr")
        if keep == "ge"
        else F.col(value_col) <= F.col("_thr")
    )
    return df.join(F.broadcast(thr), list(group_cols)).filter(cond).drop("_thr")


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    n: int,
    strata: Sequence[str] = (),
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis–Spirakis A-ES): each row gets key ``-ln(u)/w`` with
    ``u = (h32(id)+1)/2^32`` — a reproducible stand-in for a uniform
    draw — and the ``n`` smallest keys win (per stratum when ``strata``
    given).  Inclusion probability is proportional to weight, and the
    same rows win on ANY engine/layout: u is content-addressed, the
    rank orders by (rounded key, id).

    The classic use: sample pretraining docs ∝ quality score or token
    count without collecting weights to the driver.  Rows with
    weight <= 0 or NULL are excluded (zero mass).

    Scale shape: two-phase salted top-n — phase 1 keeps the n smallest
    keys per (stratum, salt-of-id) so no single reducer ever sees a
    whole stratum (the hot-stratum killer when one language is most of
    100 TB); the final stratum window ranks at most n·_N_SALT
    survivors.  Output identical to the single-window form.
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    w = F.col(weight_col).cast("double")
    u = (h32(F.col(id_col).cast("string")) + 1).cast("double") / F.lit(
        4294967296.0
    )
    key = F.round(-F.log(u) / w, 9)
    keyed = df.filter(w > 0).withColumn("_akey", key)
    salt = F.pmod(h32(F.col(id_col).cast("string")), F.lit(_N_SALT))
    pre = Window.partitionBy(*[F.col(s) for s in strata], salt).orderBy(
        F.col("_akey"), F.col(id_col)
    )
    keyed = keyed.withColumn("_pre", F.row_number().over(pre)).filter(
        F.col("_pre") <= n
    ).drop("_pre")
    win = Window.partitionBy(*[F.col(s) for s in strata]).orderBy(
        F.col("_akey"), F.col(id_col)
    )
    return (
        keyed.withColumn("sample_rank", F.row_number().over(win).cast("long"))
        .filter(F.col("sample_rank") <= n)
        .drop("_akey")
    )


def temperature_mix(
    df: DataFrame,
    strata_col: str,
    key: Column,
    tau: float,
) -> DataFrame:
    """Temperature-scaled stratum rebalancing by downsampling only:
    target mass per stratum ∝ count^tau (``tau`` < 1 flattens the mix
    toward uniform — the multilingual-pretraining trick; ``tau`` = 1 is
    a no-op; ``tau`` = 0 is equal mass per stratum).

    Kept count per stratum is ``n_min^(1-tau) * n_g^tau`` — the largest
    K with ``K * n_g^tau <= n_g`` everywhere — so the SMALLEST stratum
    keeps everything (rate 1.0) and larger strata keep
    ``(n_min/n_g)^(1-tau)``, realizing the tempered proportions without
    upsampling.  The row-level gate is the engine-portable
    deterministic ``h32`` hash at 1e-4 granularity, so the kept set is
    identical across engines and layouts.

    Scale shape: identical to ``rebalance_to_mix`` — one column-pruned
    stratum-count groupBy, a broadcast 1-row min-aggregate, a broadcast
    threshold join back onto the facts.  No driver collect.
    """
    if not 0.0 <= tau <= 1.0:
        raise ValueError(f"tau must be in [0, 1], got {tau}")
    counts = df.groupBy(strata_col).agg(
        F.count(F.lit(1)).cast("double").alias("n")
    )
    mn = counts.agg(F.min("n").alias("n_min"))
    thresholds = counts.crossJoin(F.broadcast(mn)).select(
        strata_col,
        # (n_min/n)^(1-tau): 1.0 at the smallest stratum, <1 above it
        F.floor(
            F.lit(float(_MOD))
            * F.pow(F.col("n_min") / F.col("n"), F.lit(1.0 - tau))
        )
        .cast("long")
        .alias("keep_thr"),
    )
    return (
        df.join(F.broadcast(thresholds), strata_col)
        .filter(F.pmod(h32(key.cast("string")), _MOD) < F.col("keep_thr"))
        .drop("keep_thr")
    )


def dataset_split(
    df: DataFrame,
    key: Column,
    splits: Mapping[str, float],
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment by stable content hash:
    ``splits`` maps split name → fraction (must sum to ≤ 1; any
    remainder is assigned NULL — an explicit holdout bucket).  Same key
    → same split on any cluster, any partitioning, any day — the
    property that keeps eval sets honest across re-runs and makes the
    assignment joinable from every derived table.

    Map-only: one hash + a when-chain over cumulative thresholds
    (names in sorted order, so the operator — not dict order — defines
    the band layout).  No shuffle, no state, composes with scan
    pruning."""
    total = sum(splits.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"split fractions sum to {total} > 1")
    for s, r in splits.items():
        if r < 0:
            raise ValueError(f"negative fraction for split {s!r}")
    bucket = F.pmod(h32(key.cast("string")), _MOD)
    expr = F.lit(None).cast("string")
    acc = 0.0
    bands = []
    for name, frac in sorted(splits.items()):
        lo = int(acc * _MOD)
        acc += frac
        hi = int(acc * _MOD)
        bands.append((name, lo, hi))
    for name, lo, hi in reversed(bands):
        expr = F.when((bucket >= lo) & (bucket < hi), F.lit(name)).otherwise(expr)
    return df.withColumn(split_col, expr)


def winsorize(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    lo: float = 0.05,
    hi: float = 0.95,
    out_col: str | None = None,
) -> DataFrame:
    """Per-group winsorization: CLIP ``value_col`` to its group's
    [``lo``, ``hi``] interpolated quantiles — the third member of the
    robust-numeric family (``quantile_gate`` filters, ``mad_outliers``
    flags, winsorize keeps every row but bounds the tails, which is
    what a loss-weighting or feature column usually wants).

    Same shape as :func:`quantile_gate`: one per-group percentile
    aggregate (two quantiles in ONE pass), one-row-per-group bounds
    broadcast back, clip as pure expression work — the facts never
    shuffle.  Same scale swap: ``approx_percentile`` at extreme group
    cardinality."""
    if not 0.0 <= lo < hi <= 1.0:
        raise ValueError(f"need 0 <= lo < hi <= 1, got {lo}, {hi}")
    out = out_col or f"{value_col}_winsor"
    bounds = df.groupBy(*group_cols).agg(
        F.expr(f"percentile({value_col}, {lo})").alias("_lo"),
        F.expr(f"percentile({value_col}, {hi})").alias("_hi"),
    )
    clipped = F.least(F.greatest(F.col(value_col), F.col("_lo")), F.col("_hi"))
    return (
        df.join(F.broadcast(bounds), list(group_cols))
        .withColumn(out, F.round(clipped, 6))
        .drop("_lo", "_hi")
    )
