"""Parquet batch source with block-range + predicate + column pruning.

Stands in for the reference's provider scans (HyperSync/SQD,
/root/reference/src/cherry_pipelines/evm/erc20_transfers.py:86-116 and
svm/orca_swaps.py:487-543): the provider evaluates topic0 / program_id /
discriminator / block-range filters server-side and returns only the
selected fields.  Here the same pushdown happens via Catalyst —
``.filter`` + ``.select`` applied directly on the scan reach the Parquet
reader as PushedFilters / ReadSchema, so only matching row groups and
requested columns are read.  At 100 TB this is the difference between
scanning a block range's row groups (min/max stats prune the rest) and
scanning the world.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

from pyspark.sql import Column, DataFrame, SparkSession

from cherry_pipelines_spark.engine.step import TableBundle


@dataclass
class TableSpec:
    """One table in the bundle: where it lives, which columns to keep,
    which column is the block number, and extra pushdown predicates.

    ``columns`` mirrors the reference's ``Fields(...=True)`` projection
    flags; ``predicate`` mirrors its server-side LogRequest /
    InstructionRequest filters (an OR of per-request predicates models
    the multi-request union semantics of raydium_swaps.py:638-675).

    ``format``/``options``/``schema`` open the same scan to other file
    formats (csv, json, orc).  Parquet/ORC keep full filter/column
    pushdown; CSV/JSON get column pruning only — and text formats
    should declare ``schema`` explicitly, since inference costs an
    extra pass and is non-deterministic at scale.
    """

    path: str
    block_column: str
    columns: Sequence[str] | None = None
    predicate: Column | None = None
    format: str = "parquet"
    options: dict[str, str] = field(default_factory=dict)
    schema: str | None = None  # DDL string, e.g. "a long, b string"
    # False = load the whole table every batch (dimension / reference
    # tables — e.g. a decontamination benchmark — must not be sliced by
    # the batch's block range)
    range_filter: bool = True

    def load(self, spark: SparkSession) -> DataFrame:
        reader = spark.read.format(self.format).options(**self.options)
        if self.schema is not None:
            reader = reader.schema(self.schema)
        return reader.load(self.path)


@dataclass
class ParquetSource:
    tables: dict[str, TableSpec]

    def tip(self, spark: SparkSession) -> int:
        """Max block available across the source tables — the chain-tip
        probe for unbounded runs (reference: dataset metadata REST call,
        scripts/main.py:192-194).  A stats-only scan under
        ``parquet.aggregatePushdown``."""
        from pyspark.sql import functions as F

        tip = -1
        for spec in self.tables.values():
            row = spec.load(spark).agg(F.max(spec.block_column).alias("m")).collect()[0]
            if row["m"] is not None:
                tip = max(tip, int(row["m"]))
        return tip

    def read(self, spark: SparkSession, from_block: int, to_block: int) -> TableBundle:
        from pyspark.sql import functions as F

        bundle: TableBundle = {}
        for name, spec in self.tables.items():
            df: DataFrame = spec.load(spark)
            if spec.range_filter:
                df = df.filter(
                    (F.col(spec.block_column) >= from_block)
                    & (F.col(spec.block_column) <= to_block)
                )
            if spec.predicate is not None:
                df = df.filter(spec.predicate)
            if spec.columns is not None:
                df = df.select(*spec.columns)
            bundle[name] = df
        return bundle
