"""Dimension ("dictionary") tables + broadcast point-lookup joins.

Capability parity with the reference's ClickHouse dictionary surface
(S10/S12: /root/reference/src/cherry_pipelines/db.py:48-77,
evm/chain_id.py:26-44, evm/chain_name.py:26-44,
svm/token_decimals.py:25-34): small key→value lookup tables seeded from
literal rows, consulted as point lookups.

Spark mapping (SURVEY §2.1 S12): there is no dictionary engine — a
small dimension DataFrame + ``F.broadcast`` join gives the same
point-lookup behavior with zero shuffle on the fact side, which is the
correct 100 TB shape (the dim ships to every executor once).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cherry_pipelines_spark.config import CHAIN_ID_TO_NAME


def chain_id_dim(spark: SparkSession) -> DataFrame:
    """name → id (reference: evm/chain_id.py — RocksDB dict keyed by
    chain name)."""
    schema = T.StructType(
        [
            T.StructField("chain_name", T.StringType(), False),
            T.StructField("chain_id", T.LongType(), False),
        ]
    )
    rows = [(n, i) for i, n in CHAIN_ID_TO_NAME.items()]
    return spark.createDataFrame(rows, schema)


def chain_name_dim(spark: SparkSession) -> DataFrame:
    """id → name (reference: evm/chain_name.py)."""
    schema = T.StructType(
        [
            T.StructField("chain_id", T.LongType(), False),
            T.StructField("chain_name", T.StringType(), False),
        ]
    )
    return spark.createDataFrame(list(CHAIN_ID_TO_NAME.items()), schema)


def token_decimals_dim(spark: SparkSession, rows: list[tuple[bytes, int]]) -> DataFrame:
    """mint → decimals (reference: svm/token_decimals.py:25-34; rows come
    from the swap pipelines' second output table)."""
    schema = T.StructType(
        [
            T.StructField("mint", T.BinaryType(), False),
            T.StructField("decimals", T.IntegerType(), False),
        ]
    )
    return spark.createDataFrame(rows, schema)


def init_dims(spark: SparkSession, base_path: str) -> dict[str, str]:
    """Materialize the static dims (reference init_db mode seeds the
    dictionaries, scripts/main.py:307-328).  Idempotent overwrite —
    dictionary rows are reference data, not facts."""
    import os

    out = {}
    for name, df in (
        ("chain_id", chain_id_dim(spark)),
        ("chain_name", chain_name_dim(spark)),
    ):
        path = os.path.join(base_path, name)
        df.coalesce(1).write.mode("overwrite").parquet(path)
        out[name] = path
    return out


def lookup(
    fact: DataFrame, dim: DataFrame, on: str | list[str], how: str = "left"
) -> DataFrame:
    """Dictionary point lookup = broadcast hash join: no shuffle of the
    fact table, dim replicated to executors (db.py:67-73's
    LAYOUT(DIRECT()) equivalent)."""
    return fact.join(F.broadcast(dim), on=on, how=how)
