"""Orca pool-initialization metadata pipeline — capability parity with
/root/reference/src/cherry_pipelines/svm/orca_metadata.py: two
initialize_pool instruction versions, typed-NULL padded union, tx/block
joins, single output table (no anchor, no token balances).

The v2 signature has 14 account names, so token_program_a (index 10)
onward map through ``rest_of_accounts`` — exercised here for real.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cherry_pipelines_spark.engine.pipeline import Pipeline
from cherry_pipelines_spark.engine.step import PyStep, TableBundle
from cherry_pipelines_spark.functions import borsh as B
from cherry_pipelines_spark.functions.crypto import anchor_discriminator, base58_decode
from cherry_pipelines_spark.pipelines.svm import common as C
from cherry_pipelines_spark.sinks.parquet import ParquetSink

TABLE_NAME = "orca_metadata"
PROGRAM_ID = base58_decode("whirLbMiicVdio4qvUfM5KAg6Ct8VwpYzGff3uctyCc")
DISCRIMINATOR_V1 = anchor_discriminator("initialize_pool")
DISCRIMINATOR_V2 = anchor_discriminator("initialize_pool_v2")

# orca_metadata.py:37-68 (whirlpool_bump is the flattened single-field
# struct — same ABI)
SIGNATURE_V1 = B.InstructionSignature(
    discriminator=DISCRIMINATOR_V1,
    params=(
        B.ParamInput("whirlpool_bump", B.U8()),
        B.ParamInput("tick_spacing", B.U16()),
        B.ParamInput("initial_sqrt_price", B.U128()),
    ),
    accounts_names=(
        "whirlpools_config",
        "token_mint_a",
        "token_mint_b",
        "funder",
        "whirlpool",
        "token_vault_a",
        "token_vault_b",
        "fee_tier",
        "token_program",
        "system_program",
        "rent",
    ),
)
# orca_metadata.py:70-99
SIGNATURE_V2 = B.InstructionSignature(
    discriminator=DISCRIMINATOR_V2,
    params=(
        B.ParamInput("tick_spacing", B.U16()),
        B.ParamInput("initial_sqrt_price", B.U128()),
    ),
    accounts_names=(
        "whirlpools_config",
        "token_mint_a",
        "token_mint_b",
        "token_badge_a",
        "token_badge_b",
        "funder",
        "whirlpool",
        "token_vault_a",
        "token_vault_b",
        "fee_tier",
        "token_program_a",
        "token_program_b",
        "system_program",
        "rent",
    ),
)

_SHARED = (
    "block_slot",
    "block_hash",
    "transaction_index",
    "instruction_address",
    "program_id",
)


# both versions decode through ONE Arrow boundary (round-11 verdict
# #4: the v1/v2 branches ran separate mapInPandas stages over the same
# parent rows); the multi dispatcher's program+discriminator routing
# subsumes the old split_step's filters exactly (orca_metadata.py:
# 147-165)
_MULTI_KINDS = [
    ("inits_v1", (PROGRAM_ID,), SIGNATURE_V1),
    ("inits_v2", (PROGRAM_ID,), SIGNATURE_V2),
]


def decode_step(bundle: TableBundle, ctx) -> TableBundle:
    out = dict(bundle)
    fused = ctx.batch_cache(
        B.decode_instructions_multi(
            out.pop("instructions"), _MULTI_KINDS, passthrough=_SHARED
        )
    )
    out.update(B.split_decoded(fused, _MULTI_KINDS, passthrough=_SHARED))
    return out


def process_step(bundle: TableBundle, ctx) -> TableBundle:
    """orca_metadata.py:168-244: typed-NULL padded union + joins."""
    v1 = bundle["inits_v1"].select(
        *_SHARED,
        F.lit(1).cast("int").alias("version"),
        "whirlpools_config",
        "token_mint_a",
        "token_mint_b",
        F.lit(None).cast("binary").alias("token_badge_a"),
        F.lit(None).cast("binary").alias("token_badge_b"),
        "funder",
        "whirlpool",
        "token_vault_a",
        "token_vault_b",
        "fee_tier",
        F.col("token_program").alias("token_program_a"),
        F.col("token_program").alias("token_program_b"),
        "system_program",
        "rent",
        "whirlpool_bump",
        "tick_spacing",
        "initial_sqrt_price",
    )
    v2 = bundle["inits_v2"].select(
        *_SHARED,
        F.lit(2).cast("int").alias("version"),
        "whirlpools_config",
        "token_mint_a",
        "token_mint_b",
        "token_badge_a",
        "token_badge_b",
        "funder",
        "whirlpool",
        "token_vault_a",
        "token_vault_b",
        "fee_tier",
        "token_program_a",
        "token_program_b",
        "system_program",
        "rent",
        F.lit(None).cast("int").alias("whirlpool_bump"),
        "tick_spacing",
        "initial_sqrt_price",
    )
    inits = v1.unionByName(v2)
    inits = C.join_tx_and_blocks(inits, bundle["transactions"], bundle["blocks"])
    return {TABLE_NAME: inits}


def build_pipeline(
    instructions_path: str,
    transactions_path: str,
    blocks_path: str,
    sink_path: str,
) -> Pipeline:
    source = C.svm_source(instructions_path, transactions_path, blocks_path, None)
    sink = ParquetSink(
        base_path=sink_path,
        anchor_table=TABLE_NAME,
        block_column="block_slot",
        sort_within_partitions={TABLE_NAME: ("whirlpool",)},
    )
    steps = [
        # split + decode fused into one step (one Arrow boundary for
        # both init versions — see decode_step)
        PyStep(decode_step, name="svm_decode_instructions"),
        PyStep(process_step, name="process_data"),
    ]
    return Pipeline(TABLE_NAME, source, steps, sink)
