"""Distributed statistics operators for corpus / embedding QA.

Both operators are pure DataFrame compositions (no UDFs).  Where a
result feeds an exact cross-engine comparison, sums run in fixed-point
decimal — decimal addition is associative, so partition order and
partial-aggregation splits cannot change the answer (float sums are
order-dependent and differ between engines at ~1e-13, which a
hash-compare oracle would catch).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def embedding_centroids(
    df: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-group embedding centroids as (group, dim, centroid, n) rows —
    the training step of an IVF index, a class-prototype probe, or a
    drift monitor over an embedding corpus.

    Plan: posexplode the vectors (map-side), one hash shuffle on
    (group, dim), decimal-exact sums with a double division at the very
    end.  Per-dim ROWS, not re-assembled arrays: the row form is what a
    downstream join (assign-to-nearest-centroid) wants, and it keeps
    the cross-engine comparison on scalars.  Shuffle volume is
    rows × dims — the same as any dense-vector aggregation; dims are
    bounded (model width), groups are bounded, so the reduce side is
    tiny at any corpus size."""
    e = df.select(
        F.col(group_col),
        F.posexplode(F.col(vec_col)).alias("pos", "v"),
    ).select(
        group_col,
        (F.col("pos") + 1).cast("long").alias("dim"),  # 1-based like SQL
        F.col("v").cast("decimal(18,9)").alias("v"),
    )
    # exact decimal sum → ONE double cast → double division: every step
    # is bit-identical cross-engine (decimal÷int scale rules are not)
    return e.groupBy(group_col, "dim").agg(
        F.round(F.sum("v").cast("double") / F.count("v"), 6).alias("centroid"),
        F.count("v").cast("long").alias("n"),
    )


def zscore_outliers(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    threshold: float = 2.0,
) -> DataFrame:
    """Rows whose ``value_col`` deviates more than ``threshold`` sample
    standard deviations from their group mean — the cheap distributed
    outlier screen for numeric quality columns.

    One aggregation per group (mean + stddev_samp, both partial-first),
    broadcast back onto the facts: the fact side never shuffles.
    Single-member groups have NULL stddev and emit no outliers."""
    stats = df.groupBy(*group_cols).agg(
        F.avg(value_col).alias("_mean"),
        F.stddev_samp(value_col).alias("_std"),
    )
    z = (F.col(value_col) - F.col("_mean")) / F.col("_std")
    return (
        df.join(F.broadcast(stats), list(group_cols))
        .filter(F.col("_std").isNotNull() & (F.abs(z) > threshold))
        .drop("_mean", "_std")
    )


def profile_table(
    df: DataFrame,
    columns: Sequence[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """Dataset profiling card: one output row per column with
    ``(column, n_rows, n_nulls, n_distinct, min_value, max_value,
    avg_len)`` — the per-shard statistics a data-curation run records
    before/after every filter stage (and the inputs to drift checks
    between snapshots).

    ONE aggregation pass computes every column's stats; the per-column
    rows are unpivoted from that single row with ``stack`` (map-side,
    no extra shuffle).  ``min/max`` are rendered as strings so one
    schema covers heterogeneous columns; ``avg_len`` (round 6) applies
    to string columns and is NULL otherwise.

    Scale note: multiple exact ``countDistinct`` aggregates expand the
    input (one replica per distinct-agg) — fine to ~tens of columns;
    at extreme width or cardinality pass ``exact_distinct=False`` to
    use HyperLogLog ``approx_count_distinct`` (the standard profiling
    trade: stats cards do not need exact distincts, oracles do).
    """
    cols = list(columns) if columns is not None else list(df.columns)
    str_cols = {
        f.name for f in df.schema.fields if f.dataType.simpleString() == "string"
    }
    distinct = (
        F.countDistinct if exact_distinct else F.approx_count_distinct
    )
    aggs = [F.count(F.lit(1)).cast("long").alias("_n_rows")]
    for c in cols:
        aggs.append(F.count(F.col(c)).cast("long").alias(f"_nn_{c}"))
        aggs.append(distinct(F.col(c)).cast("long").alias(f"_nd_{c}"))
        aggs.append(F.min(F.col(c)).cast("string").alias(f"_min_{c}"))
        aggs.append(F.max(F.col(c)).cast("string").alias(f"_max_{c}"))
        aggs.append(
            (
                F.round(F.avg(F.length(F.col(c))), 6)
                if c in str_cols
                else F.lit(None).cast("double")
            ).alias(f"_len_{c}")
        )
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', _nn_{c}, _nd_{c}, _min_{c}, _max_{c}, _len_{c}" for c in cols
    )
    return one.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column, _nn, n_distinct, min_value, max_value, avg_len)"
        ),
        F.col("_n_rows").alias("n_rows"),
    ).select(
        "column",
        "n_rows",
        (F.col("n_rows") - F.col("_nn")).cast("long").alias("n_nulls"),
        "n_distinct",
        "min_value",
        "max_value",
        "avg_len",
    )


def mad_outliers(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    threshold: float = 3.0,
    scale: float = 1.4826,
) -> DataFrame:
    """Rows whose ``value_col`` deviates more than ``threshold``
    scaled-MAD units from their group MEDIAN — the robust sibling of
    :func:`zscore_outliers`.  Mean/stddev are themselves dragged by the
    outliers they are supposed to flag; median and MAD (median absolute
    deviation, x1.4826 ≈ one sigma under normality) have a 50%
    breakdown point, which is what a corpus-quality screen over
    heavy-tailed web data actually needs.

    Plan: two per-group aggregations (median, then median of |x-med|),
    each shuffling only (group, value) pairs; both one-row-per-group
    results broadcast back, so the fact table itself never shuffles.
    Exact ``median`` sorts each group's values on one reducer — fine
    while per-group cardinality fits a task (the quantile_gate
    contract); at extreme cardinality swap ``F.median`` for
    ``F.percentile_approx(value, 0.5)`` — same shape, sketch-merged
    partials."""
    med = df.groupBy(*group_cols).agg(F.median(value_col).alias("_med"))
    mad = (
        df.join(F.broadcast(med), list(group_cols))
        .groupBy(*group_cols)
        .agg(F.median(F.abs(F.col(value_col) - F.col("_med"))).alias("_mad"))
    )
    stats = med.join(mad, list(group_cols))
    dev = F.abs(F.col(value_col) - F.col("_med"))
    return (
        df.join(F.broadcast(stats), list(group_cols))
        .filter((F.col("_mad") > 0) & (dev > threshold * scale * F.col("_mad")))
        .drop("_med", "_mad")
    )


def correlation_matrix(
    df: DataFrame,
    columns: Sequence[str],
    scale: int = 6,
) -> DataFrame:
    """Pairwise Pearson correlations of numeric columns as
    ``(col_a, col_b, corr)`` rows (upper triangle, names sorted) — the
    profiling companion that catches redundant quality signals before
    they double-count in a composite score.

    Every pair's ``corr`` runs in ONE aggregation pass (the C(n,2)
    aggregates share the single shuffle and their partials merge
    map-side); the per-pair rows unpivot from that one row via
    ``stack``.  Results round to ``scale`` dp — the usual float-sum
    order tolerance across engines."""
    cols = sorted(columns)
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]]
    aggs = [
        F.round(F.corr(a, b), scale).alias(f"_c_{i}")
        for i, (a, b) in enumerate(pairs)
    ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{a}', '{b}', _c_{i}" for i, (a, b) in enumerate(pairs)
    )
    return one.select(
        F.expr(
            f"stack({len(pairs)}, {stack_args}) as (col_a, col_b, corr)"
        )
    )


def group_trend(
    df: DataFrame,
    group_cols: Sequence[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group least-squares trend line ``(group, slope, intercept,
    n)`` — the drift detector over time-keyed quality metrics
    ("is this source's score sliding?").

    Engine-exact where the built-in ``regr_slope`` is not: the five
    sufficient statistics (n, Σx, Σy, Σxy, Σx²) are summed in exact
    decimal (order-independent), each cast to double ONCE, and the
    closed forms ``slope = (n·Σxy − Σx·Σy) / (n·Σx² − Σx²)`` /
    ``intercept = (Σy − slope·Σx) / n`` evaluate in a fixed double
    expression order — so DuckDB replays the bits, which float
    accumulation order never guarantees.  One keyed shuffle,
    partial-merged map-side.  Requires integer-valued x (epoch
    seconds, slot numbers); a constant-x group has NULL slope."""
    x = F.col(x_col).cast("decimal(18,0)")
    y = F.col(y_col).cast("decimal(18,6)")
    agg = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.sum(x).cast("double").alias("_sx"),
        F.sum(y).cast("double").alias("_sy"),
        F.sum(x.cast("decimal(38,6)") * y.cast("decimal(38,6)"))
        .cast("double")
        .alias("_sxy"),
        F.sum(x.cast("decimal(38,0)") * x.cast("decimal(38,0)"))
        .cast("double")
        .alias("_sxx"),
    )
    den = F.col("_n") * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    slope = F.when(
        den != 0.0,
        (F.col("_n") * F.col("_sxy") - F.col("_sx") * F.col("_sy")) / den,
    )
    intercept = F.when(
        slope.isNotNull(),
        (F.col("_sy") - slope * F.col("_sx")) / F.col("_n"),
    )
    return agg.select(
        *group_cols,
        F.round(slope, 9).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
        F.col("_n").cast("long").alias("n"),
    )
