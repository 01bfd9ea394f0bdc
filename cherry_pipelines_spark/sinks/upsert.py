"""Keyed upsert (merge) for parquet tables — the lakehouse analogue of
ClickHouse ``ReplacingMergeTree`` semantics the reference's sink tables
lean on (latest row per key wins; see SURVEY §4.5): new batches may
re-deliver or revise rows, and readers must see exactly one row per
key, the one with the highest version.

``upsert_table`` merges a batch into a stored table:

* new keys are appended;
* existing keys are replaced when the batch row's ``version_col`` is
  higher (ties keep the stored row — re-delivery is a no-op);
* everything else is carried over untouched.

Scale shape: ONE shuffle — the union of (stored ∪ batch) aggregates by
key with a ``max_by`` struct pick (map-side partial applies); no join,
no window sort.  The rewrite goes through the same crash-safe two-rename
swap as ``engine/rollup.py`` (write tmp → dst→old → tmp→dst → drop
old), with the same roll-back recovery: a crash between the renames is
healed by restoring ``old`` on the next call, and the interrupted batch
re-applies idempotently (same keys + versions → same table).

At 100 TB one would partition the table and rewrite only partitions the
batch touches (the ``compact_partitions`` per-partition machinery);
this operator keeps the single-table form — the merge PLAN is the part
that carries over unchanged.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_TMP_SUFFIX = "._upsert_tmp"
_OLD_SUFFIX = "._upsert_old"


class UpsertTable:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key_cols: Sequence[str],
        version_col: str,
    ) -> None:
        if not key_cols:
            raise ValueError("key_cols must be non-empty")
        self.spark = spark
        self.path = path
        self.key_cols = list(key_cols)
        self.version_col = version_col

    # ------------------------------------------------------------ state
    def _fs_paths(self):
        jvm = self.spark._jvm
        dst = jvm.org.apache.hadoop.fs.Path(self.path)
        tmp = jvm.org.apache.hadoop.fs.Path(self.path + _TMP_SUFFIX)
        old = jvm.org.apache.hadoop.fs.Path(self.path + _OLD_SUFFIX)
        fs = dst.getFileSystem(self.spark._jsc.hadoopConfiguration())
        return fs, dst, tmp, old

    def _recover(self) -> None:
        fs, dst, _tmp, old = self._fs_paths()
        if not fs.exists(dst) and fs.exists(old):
            fs.rename(old, dst)

    def exists(self) -> bool:
        self._recover()
        fs, dst, _tmp, _old = self._fs_paths()
        return bool(fs.exists(dst))

    def read(self) -> DataFrame:
        if not self.exists():
            raise FileNotFoundError(self.path)
        return self.spark.read.parquet(self.path)

    # ------------------------------------------------------------ merge
    def _merged(self, batch: DataFrame) -> DataFrame:
        cols = batch.columns
        if self.version_col not in cols:
            raise ValueError(f"batch lacks version column {self.version_col!r}")
        src = batch.select(*cols).withColumn("_pref", F.lit(0))
        if self.exists():
            src = (
                self.read().select(*cols).withColumn("_pref", F.lit(1))
                .unionByName(src)
            )
        # greatest (version, stored-first) row per key: the ordering
        # struct compares lexicographically, so equal versions keep the
        # STORED row (_pref 1 > 0) — re-delivery is a strict no-op.
        order = F.struct(
            F.col(self.version_col).alias("_v"), F.col("_pref").alias("_p")
        )
        payload = F.struct(*[F.col(c).alias(c) for c in cols])
        return (
            src.groupBy(*self.key_cols)
            .agg(F.max_by(payload, order).alias("_row"))
            .select(*[F.col(f"_row.{c}").alias(c) for c in cols])
        )

    def apply(self, batch: DataFrame) -> DataFrame:
        """Merge one batch in; returns the new table state."""
        merged = self._merged(batch)
        fs, dst, tmp, old = self._fs_paths()
        self._recover()
        if fs.exists(tmp):
            fs.delete(tmp, True)
        merged.write.mode("overwrite").parquet(str(tmp))
        had_prev = fs.exists(dst)
        if had_prev:
            if fs.exists(old):
                fs.delete(old, True)
            fs.rename(dst, old)
        fs.rename(tmp, dst)
        if had_prev:
            fs.delete(old, True)
        return self.read()
