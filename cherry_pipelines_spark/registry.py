"""Pipeline registry & dispatch (SURVEY §2.8 U4).

Capability parity with the reference's entry point
(/root/reference/scripts/main.py:284-330): named pipeline registries
per kind (evm / svm), env-driven selection
(``CHERRY_PIPELINE_KIND`` / ``CHERRY_PIPELINE_NAME``), and the two run
modes — ``run`` (ingest) vs ``init_db`` (``CHERRY_INIT_DB=true`` →
create sink layout + seed dimension tables).
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import SparkSession

from cherry_pipelines_spark.config import EvmConfig, SvmConfig, load_evm_config, load_svm_config
from cherry_pipelines_spark.engine.pipeline import Pipeline
from cherry_pipelines_spark.pipelines import dims
from cherry_pipelines_spark.pipelines.docs import curate as docs_curate
from cherry_pipelines_spark.pipelines.evm import erc20_transfers
from cherry_pipelines_spark.pipelines.svm import (
    meteora_swaps,
    orca_metadata,
    orca_swaps,
    raydium_swaps,
)


def _evm_erc20(cfg: EvmConfig) -> Pipeline:
    return erc20_transfers.build_pipeline(
        logs_path=os.path.join(cfg.data_path, "evm_logs.parquet"),
        blocks_path=os.path.join(cfg.data_path, "evm_blocks.parquet"),
        sink_path=cfg.sink_path,
        chain_id=cfg.chain_id,
    )


def _svm(builder) -> Callable[[SvmConfig], Pipeline]:
    def make(cfg: SvmConfig) -> Pipeline:
        paths = {
            name: os.path.join(cfg.data_path, f"svm_{name}.parquet")
            for name in ("instructions", "transactions", "blocks", "token_balances")
        }
        if builder is orca_metadata.build_pipeline:
            return builder(
                paths["instructions"], paths["transactions"], paths["blocks"], cfg.sink_path
            )
        return builder(
            paths["instructions"],
            paths["transactions"],
            paths["blocks"],
            paths["token_balances"],
            cfg.sink_path,
        )

    return make


EVM_PIPELINES: dict[str, Callable[[EvmConfig], Pipeline]] = {
    "erc20_transfers": _evm_erc20,
}

SVM_PIPELINES: dict[str, Callable[[SvmConfig], Pipeline]] = {
    "orca_swaps": _svm(orca_swaps.build_pipeline),
    "raydium_swaps": _svm(raydium_swaps.build_pipeline),
    "meteora_swaps": _svm(meteora_swaps.build_pipeline),
    "orca_metadata": _svm(orca_metadata.build_pipeline),
}


def _docs_curation(cfg: EvmConfig) -> Pipeline:
    # reuses the generic env config: data_path holds documents.parquet
    # (+ benchmark.parquet for decontamination)
    return docs_curate.build_pipeline(
        docs_path=os.path.join(cfg.data_path, "documents.parquet"),
        benchmark_path=os.path.join(cfg.data_path, "benchmark.parquet"),
        sink_path=cfg.sink_path,
    )


DOCS_PIPELINES: dict[str, Callable[[EvmConfig], Pipeline]] = {
    "curate": _docs_curation,
}


def main(spark: SparkSession) -> int:
    """Env-driven dispatch (reference: scripts/main.py:300-330).
    Returns the number of batches executed (0 for init_db mode)."""
    kind = os.environ.get("CHERRY_PIPELINE_KIND", "evm").lower()
    name = os.environ.get("CHERRY_PIPELINE_NAME", "")
    is_init = os.environ.get("CHERRY_INIT_DB", "").lower() in ("1", "true", "yes")

    if kind == "evm":
        cfg: EvmConfig | SvmConfig = load_evm_config()
        registry = EVM_PIPELINES
    elif kind == "svm":
        cfg = load_svm_config()
        registry = SVM_PIPELINES
    elif kind == "docs":
        cfg = load_evm_config()  # same env surface; chain fields unused
        registry = DOCS_PIPELINES
    else:
        raise ValueError(f"unknown CHERRY_PIPELINE_KIND {kind!r}")

    if is_init:
        dims.init_dims(spark, os.path.join(cfg.sink_path, "_dims"))
        return 0

    if name not in registry:
        raise ValueError(f"unknown pipeline {name!r} for kind {kind!r}; have {sorted(registry)}")
    pipe = registry[name](cfg)  # type: ignore[arg-type]
    # to_block=None → unbounded: run to the source tip (README.md:24's
    # "waits for new blocks" becomes re-invocation / streaming.follow)
    to_block = cfg.to_block if cfg.to_block is not None else pipe.source.tip(spark)  # type: ignore[attr-defined]
    return pipe.run(spark, from_block=cfg.from_block, to_block=to_block, batch_size=cfg.batch_size)
