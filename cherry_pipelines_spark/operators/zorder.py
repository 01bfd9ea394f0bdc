"""Z-order (Morton) interleaved sort keys for multi-dimensional layout.

MergeTree's ``ORDER BY (a, b)`` clusters on a THEN b: predicates on b
alone skip nothing (reference layout, SURVEY §4.5).  Interleaving the
bits of both columns into one Morton key and sorting by it gives every
dimension partial locality, so parquet row-group min/max stats prune on
ANY of the z-ordered columns — the standard lakehouse answer to
multi-dimensional point/range lookups at 100 TB.

Everything here is pure JVM bit arithmetic (shifts, masks, ors) inside
whole-stage codegen — no UDF, no shuffle; the only cost of a z-ordered
layout is the final sort at write time, which replaces (not adds to)
the plain ``sortWithinPartitions``.  The bit-spreading uses the
classic mask-shift doubling scheme, expressible identically in any
engine with 64-bit integer ops (the DuckDB oracle reproduces it
bit-for-bit).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# mask-shift doubling constants for spreading 16 bits over 32
# (x | x<<8) & 0x00FF00FF → (x | x<<4) & 0x0F0F0F0F → …
_SPREAD_16 = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _spread16(col: Column, bits: int = 16) -> Column:
    """Spread the low ``bits`` (≤16) of ``col`` so bit i lands at 2i."""
    # mask to the REQUESTED bits, not 16 — keeps the fast path
    # bit-identical to the general per-bit interleave for bits < 16
    x = col.bitwiseAND(F.lit((1 << bits) - 1))
    for shift, mask in _SPREAD_16:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def zorder_key(cols: Sequence[Column | str], bits: int = 16) -> Column:
    """Morton key interleaving the low ``bits`` of each column (2 or 3
    dims, ≤ 21 bits each keeps the key in a signed 64-bit long).

    Inputs must already be non-negative integers scaled to the key
    range (rank/bucket ids, truncated timestamps, quantized floats) —
    standard practice, since z-ordering raw skewed values wastes key
    space.  Column order sets tie-breaking only; locality is symmetric.
    """
    ncols = [F.col(c) if isinstance(c, str) else c for c in cols]
    if not 2 <= len(ncols) <= 3:
        raise ValueError(f"zorder_key takes 2 or 3 columns, got {len(ncols)}")
    if bits > (21 if len(ncols) == 3 else 16):
        raise ValueError(f"bits={bits} overflows a signed long for {len(ncols)} dims")
    if len(ncols) == 2 and bits <= 16:
        parts = [_spread16(c.cast("long"), bits) for c in ncols]
        key = parts[0]
        for i, p in enumerate(parts[1:], start=1):
            key = key.bitwiseOR(F.shiftleft(p, i))
        return key.cast("long")
    # 3-dim (or >16-bit) general form: per-bit interleave — more exprs,
    # still pure codegen'd arithmetic
    key = F.lit(0).cast("long")
    for b in range(bits - 1, -1, -1):
        for i, c in enumerate(ncols):
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1))
            key = F.shiftleft(key, 1).bitwiseOR(bit)
    return key


def zorder_write_layout(
    df: DataFrame, cols: Sequence[str], bits: int = 16, num_files: int | None = None
) -> DataFrame:
    """Return ``df`` ordered for a z-clustered write: repartition by
    z-key range (so file boundaries follow the curve) and sort within
    partitions.  Use as ``zorder_write_layout(df, ["a","b"])
    .write.parquet(...)`` — row-group stats then prune on either
    column.  The range partitioning is the one global sort this layout
    costs; it replaces the ORDER-BY clustering sort the reference's
    MergeTree sink already paid (SURVEY §4.5).

    Pass ``num_files`` to pin the output file count: without it the
    partition count follows shuffle-partition settings and AQE may
    coalesce a small write into one file, which clusters nothing."""
    keyed = df.withColumn("_zkey", zorder_key(list(cols), bits))
    parts = (
        keyed.repartitionByRange(num_files, "_zkey")
        if num_files
        else keyed.repartitionByRange("_zkey")
    )
    return parts.sortWithinPartitions("_zkey").drop("_zkey")


def rowgroup_stats(spark, path: str, column: str) -> "DataFrame":
    """Parquet footer statistics per row group for one column:
    ``(file, row_group, n_rows, stat_min, stat_max)`` with min/max as
    LONG (the audit targets integer layout keys; widen caller-side for
    other types).

    This is the MEASUREMENT half of the layout story: ``zorder_key`` /
    ``zorder_write_layout`` / ``compact_partitions`` shape files so
    row-group min/max fences prune I/O — this reads the fences back so
    a pipeline can AUDIT whether its layout actually prunes before
    shipping a 100 TB backfill.  Footer reads are metadata-only (no
    data pages touched) and distribute one file per task via
    ``mapInPandas`` over the file list — the driver never opens a
    footer.

    A column chunk without min/max statistics (``has_min_max`` false —
    e.g. an all-NULL chunk) yields NULL fences, which
    :func:`pruning_report` already treats as unskippable.

    Path contract: the file LISTING runs on the driver via
    ``os.listdir`` and executors open plain paths through pyarrow, so
    this audit targets locally-mounted filesystems (local disk, NFS,
    FUSE mounts of object stores).  For raw ``s3://``/``hdfs://`` URIs
    list via the Hadoop FS API and hand pyarrow a filesystem handle —
    the per-row-group logic is unchanged."""
    import os as _os

    from pyspark.sql import types as T

    files = sorted(
        _os.path.join(path, f)
        for f in _os.listdir(path)
        if f.endswith(".parquet")
    )
    if not files:
        raise ValueError(f"no parquet files under {path}")
    fdf = spark.createDataFrame([(f,) for f in files], "file string").repartition(
        min(len(files), 32)
    )
    out_schema = T.StructType(
        [
            T.StructField("file", T.StringType()),
            T.StructField("row_group", T.LongType()),
            T.StructField("n_rows", T.LongType()),
            T.StructField("stat_min", T.LongType()),
            T.StructField("stat_max", T.LongType()),
        ]
    )

    def gen(batches):
        import pandas as pd
        import pyarrow.parquet as pq

        for pdf in batches:
            rows = []
            for f in pdf["file"]:
                md = pq.ParquetFile(f).metadata
                ci = md.schema.names.index(column)
                for rg in range(md.num_row_groups):
                    g = md.row_group(rg)
                    st = g.column(ci).statistics
                    has = st is not None and st.has_min_max
                    rows.append(
                        (
                            f,
                            rg,
                            g.num_rows,
                            int(st.min) if has else None,
                            int(st.max) if has else None,
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["file", "row_group", "n_rows", "stat_min", "stat_max"]
            )

    return fdf.mapInPandas(gen, out_schema)


def pruning_report(stats: "DataFrame", lo: int, hi: int) -> "DataFrame":
    """One-row audit of how much a ``BETWEEN lo AND hi`` predicate can
    skip using the footer fences from :func:`rowgroup_stats`: a row
    group is skippable iff ``stat_max < lo OR stat_min > hi`` (NULL
    stats are never skippable — the conservative read posture).
    Returns ``(n_groups, n_skipped, rows_total, rows_skipped)`` —
    ``rows_skipped / rows_total`` is the I/O the layout saves."""
    skippable = F.when(
        (F.col("stat_max") < lo) | (F.col("stat_min") > hi), 1
    ).otherwise(0)
    return stats.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum(skippable).cast("long").alias("n_skipped"),
        F.sum("n_rows").cast("long").alias("rows_total"),
        F.sum(F.col("n_rows") * skippable).cast("long").alias("rows_skipped"),
    )
