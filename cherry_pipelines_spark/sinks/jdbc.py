"""JDBC sink — ClickHouse-parity writer behind the same Sink interface.

The reference writes every bundle table to ClickHouse over HTTP Arrow
inserts (S8/S9: /root/reference/src/cherry_pipelines/svm/swap_prices.py
:304-317 and the cc.ClickHouseWriterConfig call sites, e.g.
evm/erc20_transfers.py:118-124).  On Spark the equivalent is
``df.write.jdbc`` with the ClickHouse JDBC driver on the classpath
(``spark.jars``); the anchor-table ordering and max-block checkpoint
semantics are identical to the Parquet sink.

The full write/read/checkpoint path is REAL-database-tested on every
run: embedded Derby ships on Spark's classpath, and
tests/test_jdbc_sink.py drives the whole erc20 pipeline through this
sink into Derby (write 3 batches, read back, resume = 0 batches) —
only the ClickHouse transport itself is deployment configuration
(point CHERRY_JDBC_URL at it to run the same test there).  When the
configured driver is absent the sink still raises a clear error at
construction instead of a mid-write crash.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from cherry_pipelines_spark.engine.step import TableBundle


def _has_driver(spark: SparkSession, driver: str) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(driver)  # type: ignore[union-attr]
        return True
    except Exception:
        return False


@dataclass
class JdbcSink:
    """Writes each bundle table via JDBC append; non-anchor tables
    first, anchor last (T3).  Resume reads MAX(block_column) from the
    anchor table through a pushed-down aggregate query."""

    url: str
    anchor_table: str
    block_column: str
    properties: dict[str, str] | None = None
    driver: str = "com.clickhouse.jdbc.ClickHouseDriver"

    def _effective_driver(self) -> str:
        # a "driver" key in properties (e.g. threaded through
        # CHERRY_JDBC_PROP_DRIVER) overrides the dataclass default —
        # the same precedence _props() gives the write/read calls
        return (self.properties or {}).get("driver", self.driver)

    def _props(self) -> dict[str, str]:
        return {"driver": self.driver, **(self.properties or {})}

    def _check(self, spark: SparkSession) -> None:
        drv = self._effective_driver()
        if not _has_driver(spark, drv):
            raise NotImplementedError(
                f"JDBC driver {drv!r} not on the Spark classpath; "
                "add it via spark.jars to use JdbcSink (see module docstring)"
            )

    def write(
        self, spark: SparkSession, bundle: TableBundle, from_block: int, to_block: int
    ) -> None:
        self._check(spark)
        names = [n for n in bundle if n != self.anchor_table]
        if self.anchor_table in bundle:
            names.append(self.anchor_table)  # anchor written last (T3)
        for name in names:
            bundle[name].write.mode("append").jdbc(self.url, name, properties=self._props())

    def next_block(self, spark: SparkSession) -> int:
        self._check(spark)
        # Quote the COLUMN (ANSI double quotes — identifier quoting on
        # ClickHouse too) but pass the TABLE name through as given:
        # Spark's JDBC writer quotes column identifiers per-dialect
        # when it creates the table (so on case-folding databases like
        # Derby the stored column is the case-preserved `"b"`, and an
        # unquoted `b` would fold to `B` and miss), while the table
        # name is forwarded verbatim from the write call — quoting it
        # here would un-match what the writer created.
        q = (
            f'(SELECT MAX("{self.block_column}") AS m '
            f"FROM {self.anchor_table}) t"
        )
        try:
            row = spark.read.jdbc(self.url, q, properties=self._props()).collect()[0]
        except Exception:
            return 0  # table absent → fresh start (reference db.py:42-45)
        # positional access: case-folding databases return the alias
        # upper-cased (Derby gives `M` for the unquoted alias `m`)
        return 0 if row[0] is None else int(row[0]) + 1
