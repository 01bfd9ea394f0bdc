"""Env-driven pipeline configuration.

Capability parity with the reference's config surface
(/root/reference/src/cherry_pipelines/config.py:10-101 and
scripts/main.py:221-263): ``EvmConfig`` / ``SvmConfig`` dataclasses
built from environment variables, with a chain-id→name map for sink
partitioning and per-chain checkpoint scoping.

Spark-first deviations: the "provider" is a path to columnar tables
(Parquet, or csv/json/orc via TableSpec.format) instead of a remote ingestion URL; buffer sizing (S3/T4)
has no equivalent because Spark pipelines stages itself.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

# public chain-id → chain-name facts (reference keeps an equivalent map
# at config.py:34-101; this is a representative seed, extend via env)
CHAIN_ID_TO_NAME: dict[int, str] = {
    1: "ethereum",
    10: "optimism",
    56: "bnb",
    100: "gnosis",
    137: "polygon",
    250: "fantom",
    8453: "base",
    42161: "arbitrum",
    43114: "avalanche",
    81457: "blast",
    534352: "scroll",
    7777777: "zora",
}
CHAIN_NAME_TO_ID: dict[str, int] = {v: k for k, v in CHAIN_ID_TO_NAME.items()}


def _env_int(name: str, default: int | None) -> int | None:
    v = os.environ.get(name)
    return default if v in (None, "") else int(v)


@dataclass
class EvmConfig:
    """EVM pipeline config (reference: config.py:10-16)."""

    chain_id: int
    data_path: str
    sink_path: str
    from_block: int = 0
    to_block: int | None = None
    batch_size: int = 10_000

    @property
    def chain_name(self) -> str:
        return CHAIN_ID_TO_NAME.get(self.chain_id, f"chain_{self.chain_id}")


@dataclass
class SvmConfig:
    """SVM pipeline config (reference: config.py:19-31)."""

    data_path: str
    sink_path: str
    from_block: int = 0
    to_block: int | None = None
    batch_size: int = 10_000
    extra: dict[str, str] = field(default_factory=dict)


def load_evm_config() -> EvmConfig:
    """Reference: scripts/main.py:221-239 (env names re-expressed with
    the CHERRY_ prefix convention)."""
    return EvmConfig(
        chain_id=_env_int("CHERRY_CHAIN_ID", 1) or 1,
        data_path=os.environ.get("CHERRY_DATA_PATH", "."),
        sink_path=os.environ.get("CHERRY_SINK_PATH", "./sink"),
        from_block=_env_int("CHERRY_FROM_BLOCK", 0) or 0,
        to_block=_env_int("CHERRY_TO_BLOCK", None),
        batch_size=_env_int("CHERRY_BATCH_SIZE", 10_000) or 10_000,
    )


def load_svm_config() -> SvmConfig:
    """Reference: scripts/main.py:242-263; the provider-metadata
    from_block clamp (S4) becomes a min-block read in the runner."""
    return SvmConfig(
        data_path=os.environ.get("CHERRY_DATA_PATH", "."),
        sink_path=os.environ.get("CHERRY_SINK_PATH", "./sink"),
        from_block=_env_int("CHERRY_FROM_BLOCK", 0) or 0,
        to_block=_env_int("CHERRY_TO_BLOCK", None),
        batch_size=_env_int("CHERRY_BATCH_SIZE", 10_000) or 10_000,
    )
