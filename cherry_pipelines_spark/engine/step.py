"""Pipeline steps — transforms over a *table bundle*.

The unit of data flowing through a pipeline is a ``dict[str, DataFrame]``
("table bundle"): multiple named columnar tables produced together for
one block range, transformed together, written together.  Steps freely
add / drop / replace tables.  This mirrors the reference's step contract
(``Dict[str, pl.DataFrame] -> Dict[str, pl.DataFrame]``, see
/root/reference/src/cherry_pipelines/svm/orca_swaps.py:223-265) but the
tables here are lazy Spark DataFrames, so a whole chain of steps
collapses into one Catalyst plan per output table — no materialization
between steps.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any, Protocol, runtime_checkable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TableBundle = dict[str, DataFrame]


@runtime_checkable
class Step(Protocol):
    """A named transform over the table bundle."""

    def run(self, spark: SparkSession, bundle: TableBundle, ctx: Any) -> TableBundle: ...


@dataclass
class PyStep:
    """Arbitrary Python function step (reference: POLARS step kind,
    orca_swaps.py:559-564).  ``fn(bundle, ctx) -> bundle``."""

    fn: Callable[[TableBundle, Any], TableBundle]
    name: str = "py_step"

    def run(self, spark: SparkSession, bundle: TableBundle, ctx: Any) -> TableBundle:
        return self.fn(bundle, ctx)


@dataclass
class SqlStep:
    """SQL step (reference: DATAFUSION step kind, erc20_transfers.py:53-76).

    Registers every bundle table as a temp view, runs each ``(output
    table, sql)`` statement, and merges the results into the bundle.
    ``drop`` removes tables from the bundle afterwards.
    """

    statements: dict[str, str]
    drop: tuple[str, ...] = ()
    name: str = "sql_step"

    def run(self, spark: SparkSession, bundle: TableBundle, ctx: Any) -> TableBundle:
        # register views on the session that owns the bundle's DataFrames:
        # inside Structured Streaming's foreachBatch the micro-batch DF
        # belongs to a cloned session, and views registered there are
        # invisible to the outer session (and vice versa)
        session = spark
        for tname, df in bundle.items():
            df.createOrReplaceTempView(tname)
            session = df.sparkSession  # bundle DFs share one session
        out = dict(bundle)
        for tname, sql in self.statements.items():
            out[tname] = session.sql(sql)
        for tname in self.drop:
            out.pop(tname, None)
        return out


@dataclass
class CastStep:
    """Per-table column type coercion (reference: CAST step kind,
    erc20_transfers.py:149-155)."""

    table_name: str
    mappings: dict[str, str]  # column -> spark type DDL string
    name: str = "cast_step"

    def run(self, spark: SparkSession, bundle: TableBundle, ctx: Any) -> TableBundle:
        df = bundle[self.table_name]
        for col, typ in self.mappings.items():
            df = df.withColumn(col, F.col(col).cast(typ))
        return {**bundle, self.table_name: df}


@dataclass
class SetChainIdStep:
    """Append a constant ``chain_id`` column to every table in the bundle
    (reference: SET_CHAIN_ID step kind, erc20_transfers.py:156-159)."""

    chain_id: int
    tables: tuple[str, ...] | None = None
    name: str = "set_chain_id"

    def run(self, spark: SparkSession, bundle: TableBundle, ctx: Any) -> TableBundle:
        out = dict(bundle)
        for tname in self.tables if self.tables is not None else list(out):
            out[tname] = out[tname].withColumn("chain_id", F.lit(self.chain_id).cast("long"))
        return out


@dataclass
class SelectStep:
    """Keep/reorder a named subset of columns on one table."""

    table_name: str
    columns: tuple[str, ...]
    name: str = "select_step"

    def run(self, spark: SparkSession, bundle: TableBundle, ctx: Any) -> TableBundle:
        return {**bundle, self.table_name: bundle[self.table_name].select(*self.columns)}
