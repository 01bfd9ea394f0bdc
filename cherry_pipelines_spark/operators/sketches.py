"""Distributed sketch operators: HyperLogLog cardinality and
count-min heavy hitters.

At 100 TB exact ``COUNT(DISTINCT)`` and exact per-token frequency
tables are the two aggregations most likely to blow shuffle/state
budgets (billions of distinct keys, stop-word posting explosions).
Sketches bound both: a HyperLogLog register file is ``2^p`` rows no
matter how many rows feed it, and a count-min sketch is ``d*w``
counters.  Both are *mergeable* — partial sketches built per
partition / per day / per corpus shard union together with a plain
``MAX`` / ``SUM`` — which is what makes them the right shape for
incremental 100 TB pipelines (fold today's shard into yesterday's
registers instead of recounting history).

Everything here is deterministic and engine-portable: the hash is the
shared sha256-based ``h32`` (same bits in DuckDB), the HLL rho uses
integer/string bit-length math (no float log2), and the harmonic sum
adds exact dyadic rationals (2^-rho with rho<=25 over <=2^p terms fits
a double's 52-bit mantissa exactly, so the sum is order-independent) —
the whole estimate is reproducible bit-for-bit across engines.

Reference parity: the reference engine has no sketch operators; this
extends the training-data toolbox (corpus-size estimation, vocabulary
heavy-hitter mining) beyond reference scope.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cherry_pipelines_spark.operators.text import h32

# 0.7213 / (1 + 1.079/m) for m = 2^8; literal so the DuckDB oracle can
# embed the identical constant
HLL_P = 8
HLL_ALPHA_256 = 0.7182725932495458


def _rho(rem: Column, width: int) -> Column:
    """Position of the first set bit (from the MSB of a ``width``-bit
    value) + 1; ``width + 1`` when the value is zero.  Integer/string
    math only (``bin()`` length == bit_length), identical in DuckDB."""
    return (
        F.when(rem == 0, F.lit(width + 1))
        .otherwise(F.lit(width + 1) - F.length(F.bin(rem)))
        .cast("long")
    )


def hll_registers(df: DataFrame, key: Column, p: int = HLL_P) -> DataFrame:
    """Build a HyperLogLog register file for ``key``: ``<=2^p`` rows of
    ``(bucket, rho)``.

    Bucket = top ``p`` bits of h32(key); rho = leading-zero rank of the
    remaining ``32-p`` bits.  The aggregation is a MAX groupBy on a
    uniform 2^p-ary key — map-side partial max reduces every partition
    to <=2^p rows before the (trivial) shuffle.  Register files from
    disjoint shards merge with ``union -> groupBy bucket -> max(rho)``.
    """
    w = 32 - p
    h = h32(key.cast("string"))
    bucket = F.shiftright(h, w).cast("long").alias("bucket")
    rem = h.bitwiseAND(F.lit((1 << w) - 1))
    return (
        df.select(bucket, _rho(rem, w).alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(registers: DataFrame, p: int = HLL_P, label: str = "key") -> DataFrame:
    """Collapse a register file to a 1-row cardinality estimate.

    Raw HLL estimate only (alpha * m^2 / sum(2^-rho); absent buckets
    contribute 2^0 = 1).  The small-range linear-counting correction is
    deliberately omitted: it needs ``ln``, whose libm rounding differs
    across engines — the raw estimate is reproducible bit-for-bit.
    Estimates are rounded to 4 decimals.
    """
    if p != HLL_P:
        raise ValueError("alpha constant is pinned for p=8; extend the table to change p")
    m = 1 << p
    return registers.agg(
        F.count("*").cast("long").alias("buckets_used"),
        F.round(
            F.lit(HLL_ALPHA_256 * m * m)
            / (F.lit(float(m)) - F.count("*") + F.sum(F.pow(F.lit(2.0), -F.col("rho")))),
            4,
        ).alias("estimate"),
    ).select(F.lit(label).alias("key"), "buckets_used", "estimate")


def hll_distinct(df: DataFrame, key: Column, label: str = "key", p: int = HLL_P) -> DataFrame:
    """``hll_registers`` + ``hll_estimate`` + the exact distinct count
    for audit, as one row: (key, buckets_used, estimate, exact)."""
    est = hll_estimate(hll_registers(df, key, p), p, label)
    exact = df.agg(F.count_distinct(key).cast("long").alias("exact"))
    return est.crossJoin(F.broadcast(exact))


def hll_registers_by_group(
    df: DataFrame, key: Column, group_col: str, p: int = HLL_P
) -> DataFrame:
    """Per-group HyperLogLog register files: ``<=2^p`` rows of
    ``(group, bucket, rho)`` per group value — the shardable form of a
    per-source / per-day cardinality report."""
    w = 32 - p
    h = h32(key.cast("string"))
    bucket = F.shiftright(h, w).cast("long").alias("bucket")
    rem = h.bitwiseAND(F.lit((1 << w) - 1))
    return (
        df.select(F.col(group_col).alias("_grp"), bucket, _rho(rem, w).alias("rho"))
        .groupBy("_grp", "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge_registers(registers: DataFrame) -> DataFrame:
    """Merge per-group register files into one: union → MAX per bucket.
    THE property that makes HLL the right 100 TB shape — the merged
    estimate equals the estimate of the union of the inputs without
    rescanning a single row."""
    return registers.groupBy("bucket").agg(F.max("rho").alias("rho"))


def hll_distinct_by_group(
    df: DataFrame, key: Column, group_col: str, p: int = HLL_P
) -> DataFrame:
    """Per-group cardinality estimates PLUS an ``__ALL__`` row whose
    estimate comes from MERGING the per-group registers (max per bucket)
    rather than re-scanning the input — the merge-correctness proof in
    query form.  Exact distinct counts ride along for audit.

    Output: (key, buckets_used, estimate, exact); one row per group +
    one ``__ALL__`` row."""
    if p != HLL_P:
        raise ValueError("alpha constant is pinned for p=8")
    m = 1 << p
    regs = hll_registers_by_group(df, key, group_col, p)
    # the grouped register frame feeds both the per-group estimates and
    # the merge; it is <= n_groups * 2^p rows — cache-cheap by construction
    regs = regs.localCheckpoint(eager=False)
    est_expr = F.round(
        F.lit(HLL_ALPHA_256 * m * m)
        / (F.lit(float(m)) - F.count("*") + F.sum(F.pow(F.lit(2.0), -F.col("rho")))),
        4,
    ).alias("estimate")
    per_group = regs.groupBy("_grp").agg(
        F.count("*").cast("long").alias("buckets_used"), est_expr
    )
    exact_g = df.groupBy(F.col(group_col).alias("_grp")).agg(
        F.count_distinct(key).cast("long").alias("exact")
    )
    grouped = per_group.join(exact_g, "_grp").select(
        F.col("_grp").cast("string").alias("key"), "buckets_used", "estimate", "exact"
    )
    merged = hll_merge_registers(regs).agg(
        F.count("*").cast("long").alias("buckets_used"), est_expr
    )
    exact_all = df.agg(F.count_distinct(key).cast("long").alias("exact"))
    total = (
        merged.crossJoin(F.broadcast(exact_all))
        .select(F.lit("__ALL__").alias("key"), "buckets_used", "estimate", "exact")
    )
    return grouped.unionByName(total)


def countmin_sketch(
    tokens_df: DataFrame, token_col: str = "token", d: int = 4, w: int = 512
) -> DataFrame:
    """Count-min sketch of a token stream: ``d*w`` counter rows
    ``(seed, bucket, cnt)``.

    Each token lands in one bucket per seed row (hash of
    ``seed|token``), so the plan is a map-side explode by ``d`` then a
    SUM groupBy on a uniform (seed, bucket) key — partial aggregation
    collapses every partition to <=d*w rows before the shuffle.  Sketch
    rows from disjoint shards merge with SUM.
    """
    seeds = F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("seed")
    t = tokens_df.select(F.col(token_col).alias("_tok"), seeds)
    bucket = F.pmod(h32(F.concat_ws("|", F.col("seed"), F.col("_tok"))), F.lit(w))
    return (
        t.select("seed", bucket.cast("long").alias("bucket"))
        .groupBy("seed", "bucket")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def countmin_heavy_hitters(
    tokens_df: DataFrame,
    token_col: str = "token",
    d: int = 4,
    w: int = 512,
    min_count: int = 100,
) -> DataFrame:
    """Heavy hitters via count-min: tokens whose sketch estimate
    (min over the ``d`` counter rows they hash into) reaches
    ``min_count``, with the exact count alongside for audit.

    The sketch (d*w rows) broadcasts to the candidate side, so the only
    corpus-scale work is ONE pass to the per-token counts: the sketch
    itself is derived from those counts (bucket sum of per-token counts
    ≡ bucket count of the raw stream), so the token stream — typically
    an explode over every word of the corpus — is produced exactly
    once.  An incremental pipeline would instead probe yesterday's
    sketch and skip even that aggregation.
    Output: (token, est, exact) for est >= min_count.
    """
    cand = (
        tokens_df.groupBy(F.col(token_col).alias("token"))
        .agg(F.count("*").cast("long").alias("exact"))
        .localCheckpoint(eager=False)
    )
    sk_seeds = F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("seed")
    sketch = (
        cand.select("token", "exact", sk_seeds)
        .select(
            "seed",
            F.pmod(h32(F.concat_ws("|", F.col("seed"), F.col("token"))), F.lit(w))
            .cast("long")
            .alias("bucket"),
            "exact",
        )
        .groupBy("seed", "bucket")
        .agg(F.sum("exact").cast("long").alias("cnt"))
    )
    seeds = F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("seed")
    probe = cand.select("token", "exact", seeds).withColumn(
        "bucket",
        F.pmod(h32(F.concat_ws("|", F.col("seed"), F.col("token"))), F.lit(w)).cast(
            "long"
        ),
    )
    est = (
        probe.join(F.broadcast(sketch), ["seed", "bucket"])
        .groupBy("token", "exact")
        .agg(F.min("cnt").alias("est"))
    )
    return est.filter(F.col("est") >= min_count).select("token", "est", "exact")


# ------------------------------------------------------------ quantile sketch


def histogram_sketch(
    df: DataFrame,
    value: Column,
    lo: float,
    hi: float,
    bins: int = 256,
) -> DataFrame:
    """Fixed-bin histogram sketch of ``value``: ``<= bins`` rows of
    ``(bin, n)`` — the mergeable building block for distributed
    quantile estimation (shards union with ``groupBy bin -> SUM``,
    exactly like the HLL/count-min merges above).

    Bin = clamp(floor((v - lo) / (hi - lo) * bins), 0, bins-1); values
    outside [lo, hi] land in the edge bins, NULLs are dropped.  The
    aggregation is a map-side-combining groupBy on a <= ``bins``-ary
    key, so every partition reduces to at most ``bins`` rows before a
    trivial shuffle — the same "bounded state no matter the row count"
    contract as the other sketches.  At 100 TB this replaces the sort
    / range-partition an exact percentile needs with one tiny
    aggregate; the [lo, hi] frame comes from domain knowledge or a
    prior min/max pass.
    """
    if bins < 1 or not hi > lo:
        raise ValueError("need bins >= 1 and hi > lo")
    width = (hi - lo) / bins
    v = value.cast("double")
    b = F.floor((v - F.lit(lo)) / F.lit(width)).cast("long")
    b = F.least(F.greatest(b, F.lit(0)), F.lit(bins - 1))
    return (
        df.filter(v.isNotNull())
        .select(b.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def histogram_quantiles(
    sketch: DataFrame,
    qs: list[float],
    lo: float,
    hi: float,
    bins: int = 256,
) -> DataFrame:
    """Quantile estimates from a histogram sketch: ``(q, estimate)``
    per requested quantile, by cumulative-count walk + linear
    interpolation INSIDE the landing bin:

        target = q * N;  first bin with cum >= target
        est = lo + (bin + (target - cum_before) / n_bin) * bin_width

    Deterministic double arithmetic in a fixed evaluation order, so an
    independent engine replays the estimate bit-for-bit.  The sketch
    is <= ``bins`` rows: the window cumsum and the per-q pick are
    driver-light broadcast-scale work regardless of corpus size.
    Estimation error is bounded by one bin width — pick ``bins`` to
    taste (256 bins over a [0,1] quality-score frame = 0.4% of range).
    """
    from pyspark.sql import Window

    if not qs:
        raise ValueError("qs must be non-empty")
    for q in qs:
        if not 0.0 < q <= 1.0:
            raise ValueError(f"quantile {q} outside (0, 1]")
    width = (hi - lo) / bins
    # constant partition key: the sketch is <= `bins` rows BY CONSTRUCTION,
    # so one window partition is the intent — the explicit key documents
    # that and keeps WindowExec's no-partition warning out of executor logs
    one = Window.partitionBy(F.lit(0))
    w = one.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = sketch.select(
        "bin",
        "n",
        F.sum("n").over(w).alias("cum"),
        F.sum("n")
        .over(one.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
        .alias("total"),
    )
    qcol = F.explode(
        F.array(*[F.lit(float(q)) for q in sorted(qs)])
    ).alias("q")
    targets = cum.select("bin", "n", "cum", "total", qcol).filter(
        # first bin whose cumulative count reaches the target mass
        (F.col("cum") >= F.col("q") * F.col("total"))
        & (F.col("cum") - F.col("n") < F.col("q") * F.col("total"))
    )
    est = (
        F.lit(lo)
        + (
            F.col("bin")
            + (F.col("q") * F.col("total") - (F.col("cum") - F.col("n")))
            / F.col("n")
        )
        * F.lit(width)
    )
    return targets.select("q", F.round(est, 9).alias("estimate"))


# --- Bloom filter -----------------------------------------------------------
#
# The membership member of the sketch family (HLL = cardinality,
# count-min = frequency, histogram = quantiles, Bloom = membership).
# At 100 TB the canonical uses are "have we ingested this URL/doc-id
# before" and benchmark decontamination pre-screens: the filter is
# n_bits/32 rows no matter how many keys feed it, merges across
# shards/days with a plain BIT_OR, and broadcasts to the probe side so
# the probe is map-only.  One-sided error by construction: a present
# key can NEVER probe false (the guarantee incremental-ingest dedup
# rests on); absent keys false-positive at the classic
# (1 - e^{-kn/m})^k rate, dialed by n_bits/n_hashes.
#
# Deterministic and engine-portable: positions are h32(i || ':' || key)
# mod n_bits (same sha256 bits in DuckDB), words are 32-bit so every
# value fits a signed BIGINT without sign games.

BLOOM_WORD = 32


def bloom_positions(key: Column, n_bits: int = 1 << 14, n_hashes: int = 4) -> Column:
    """``array<long>`` of the key's ``n_hashes`` bit positions."""
    return F.array(
        *[h32(F.concat(F.lit(f"{i}:"), key)) % n_bits for i in range(n_hashes)]
    )


def bloom_build(
    df: DataFrame, key: Column, n_bits: int = 1 << 14, n_hashes: int = 4
) -> DataFrame:
    """Build the filter: ``(word_idx, word)`` — at most ``n_bits/32``
    rows.  The aggregation is a BIT_OR groupBy on a uniform word key,
    so map-side partials reduce every partition to <= n_bits/32 rows
    before the (trivial) shuffle; shard filters merge with
    ``union -> groupBy word_idx -> bit_or(word)``."""
    if n_bits % BLOOM_WORD != 0:
        raise ValueError(f"n_bits must be a multiple of {BLOOM_WORD}")
    pos = df.select(F.explode(bloom_positions(key, n_bits, n_hashes)).alias("pos"))
    return (
        pos.select(
            F.floor(F.col("pos") / BLOOM_WORD).cast("long").alias("word_idx"),
            (F.col("pos") % BLOOM_WORD).cast("int").alias("bit"),
        )
        .groupBy("word_idx")
        .agg(
            F.bit_or(
                F.expr("shiftleft(CAST(1 AS BIGINT), bit)")
            ).alias("word")
        )
    )


def bloom_probe(
    items: DataFrame,
    bloom: DataFrame,
    key: Column,
    id_col: str,
    n_bits: int = 1 << 14,
    n_hashes: int = 4,
) -> DataFrame:
    """Probe: ``(id, maybe_present)``.  The filter broadcasts (it is
    <= n_bits/32 rows by construction) and each item checks its
    ``n_hashes`` bits with one left join + one keyed aggregate — the
    probe side never shuffles the corpus that built the filter.
    ``maybe_present`` is true iff ALL bits are set.

    Width boundary: the broadcast is ~16·n_bits/32 bytes — n_bits=2^27
    (the measured production row in SCALE.md) broadcasts ~67 MB, well
    inside executor memory; past ~2^33 bits drop the ``F.broadcast``
    hint and let the word join shuffle (the probe side hashes on
    word_idx, still one pass)."""
    ipos = items.select(
        F.col(id_col),
        F.explode(bloom_positions(key, n_bits, n_hashes)).alias("pos"),
    ).select(
        id_col,
        F.floor(F.col("pos") / BLOOM_WORD).cast("long").alias("word_idx"),
        (F.col("pos") % BLOOM_WORD).cast("int").alias("bit"),
    )
    checked = ipos.join(F.broadcast(bloom), "word_idx", "left").select(
        id_col,
        F.expr("(shiftright(coalesce(word, CAST(0 AS BIGINT)), bit) & 1)").alias("hit"),
    )
    # coalesce: a NULL key hashes to NULL positions, so every hit is
    # NULL and min(hit) is NULL — the boolean contract column must not
    # leak NULL into downstream filters.  A NULL key was never inserted
    # (build hashes it to NULL positions, setting no bits), so False is
    # the semantically correct verdict, not just a type fix.
    return checked.groupBy(id_col).agg(
        F.coalesce(F.min("hit") == 1, F.lit(False)).alias("maybe_present")
    )
