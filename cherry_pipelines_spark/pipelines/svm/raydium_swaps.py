"""Raydium swap pipeline — capability parity with
/root/reference/src/cherry_pipelines/svm/raydium_swaps.py: three
programs (AMM / CLMM / CP) × six instruction kinds dispatched by
discriminator, typed-NULL padded to one schema with a ``swap_kind``
tag, positional transfer pairing carrying destination/source as the
vault hints, vault→mint resolution, tx/block joins, two-table output.
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

TABLE_NAME = "raydium_swaps"

AMM_PROGRAM_ID = base58_decode("675kPX9MHTjS2zt1qfr1NYHuzeLXfQM9H24wFSUt1Mp8")
SWAP_BASE_IN_DISCRIMINATOR = bytes([9])
SWAP_BASE_OUT_DISCRIMINATOR = bytes([11])
# 17 account names → a0..a9 + rest_of_accounts (raydium_swaps.py:59-78)
_AMM_ACCOUNTS = (
    "token_program",
    "amm",
    "amm_authority",
    "amm_open_orders",
    "pool_coin_token_account",
    "pool_pc_token_account",
    "serum_program",
    "serum_market",
    "serum_bids",
    "serum_asks",
    "serum_event_queue",
    "serum_coin_vault_account",
    "serum_pc_vault_account",
    "serum_vault_signer",
    "user_source_token_account",
    "user_destination_token_account",
    "user_source_owner",
)
SWAP_BASE_IN_SIGNATURE = B.InstructionSignature(
    discriminator=SWAP_BASE_IN_DISCRIMINATOR,
    params=(B.ParamInput("amount_in", B.U64()), B.ParamInput("minimum_amount_out", B.U64())),
    accounts_names=_AMM_ACCOUNTS,
)
SWAP_BASE_OUT_SIGNATURE = B.InstructionSignature(
    discriminator=SWAP_BASE_OUT_DISCRIMINATOR,
    params=(B.ParamInput("max_amount_in", B.U64()), B.ParamInput("amount_out", B.U64())),
    accounts_names=_AMM_ACCOUNTS,
)

CLMM_PROGRAM_ID = base58_decode("CAMMCzo5YL8w4VFF8KVHrK22GGUsp5VTaW7grrKgrWqK")
SWAP_V1_DISCRIMINATOR = anchor_discriminator("swap")
SWAP_V2_DISCRIMINATOR = anchor_discriminator("swap_v2")
_CLMM_PARAMS = (
    B.ParamInput("amount", B.U64()),
    B.ParamInput("other_amount_threshold", B.U64()),
    B.ParamInput("sqrt_price_limit_x64", B.U128()),
    B.ParamInput("is_base_input", B.Bool()),
)
SWAP_V1_SIGNATURE = B.InstructionSignature(
    discriminator=SWAP_V1_DISCRIMINATOR,
    params=_CLMM_PARAMS,
    accounts_names=(
        "payer",
        "amm_config",
        "pool_state",
        "input_token_account",
        "output_token_account",
        "input_vault",
        "output_vault",
        "observation_state",
        "token_program",
        "tick_array",
    ),
)
SWAP_V2_SIGNATURE = B.InstructionSignature(
    discriminator=SWAP_V2_DISCRIMINATOR,
    params=_CLMM_PARAMS,
    accounts_names=(
        "payer",
        "amm_config",
        "pool_state",
        "input_token_account",
        "output_token_account",
        "input_vault",
        "output_vault",
        "observation_state",
        "token_program",
        "token_program_2022",
        "memo_program",
        "input_vault_mint",
        "output_vault_mint",
    ),
)

CP_SWAP_PROGRAM_ID = base58_decode("CPMMoo8L3F4NbTegBCKVNunggL7H1ZpdTHKxQB5qKP1C")
SWAP_BASE_INPUT_DISCRIMINATOR = anchor_discriminator("swap_base_input")
SWAP_BASE_OUTPUT_DISCRIMINATOR = anchor_discriminator("swap_base_output")
_CP_ACCOUNTS = (
    "payer",
    "authority",
    "amm_config",
    "pool_state",
    "input_token_account",
    "output_token_account",
    "input_vault",
    "output_vault",
    "input_token_program",
    "output_token_program",
    "input_token_mint",
    "output_token_mint",
    "observation_state",
)
SWAP_BASE_INPUT_SIGNATURE = B.InstructionSignature(
    discriminator=SWAP_BASE_INPUT_DISCRIMINATOR,
    params=(B.ParamInput("amount_in", B.U64()), B.ParamInput("minimum_amount_out", B.U64())),
    accounts_names=_CP_ACCOUNTS,
)
SWAP_BASE_OUTPUT_SIGNATURE = B.InstructionSignature(
    discriminator=SWAP_BASE_OUTPUT_DISCRIMINATOR,
    params=(B.ParamInput("max_amount_in", B.U64()), B.ParamInput("amount_out", B.U64())),
    accounts_names=_CP_ACCOUNTS,
)

# the six split tables: (bundle key, program id, discriminator, signature)
_KINDS = (
    ("amm_base_in_swaps", AMM_PROGRAM_ID, SWAP_BASE_IN_DISCRIMINATOR, SWAP_BASE_IN_SIGNATURE),
    ("amm_base_out_swaps", AMM_PROGRAM_ID, SWAP_BASE_OUT_DISCRIMINATOR, SWAP_BASE_OUT_SIGNATURE),
    ("cp_swap_base_input_swaps", CP_SWAP_PROGRAM_ID, SWAP_BASE_INPUT_DISCRIMINATOR, SWAP_BASE_INPUT_SIGNATURE),
    ("cp_swap_base_output_swaps", CP_SWAP_PROGRAM_ID, SWAP_BASE_OUTPUT_DISCRIMINATOR, SWAP_BASE_OUTPUT_SIGNATURE),
    ("clmm_swaps_v1", CLMM_PROGRAM_ID, SWAP_V1_DISCRIMINATOR, SWAP_V1_SIGNATURE),
    ("clmm_swaps_v2", CLMM_PROGRAM_ID, SWAP_V2_DISCRIMINATOR, SWAP_V2_SIGNATURE),
)

def _null(t: str):
    return F.lit(None).cast(t)


def _head(payer: str, pool: str, in_acct: str, out_acct: str, kind: str):
    return [
        F.col("block_slot"),
        F.col("block_hash"),
        F.col("transaction_index"),
        F.col("instruction_address"),
        F.col("program_id"),
        F.col(payer).alias("payer"),
        F.col(pool).alias("pool"),
        F.col(in_acct).alias("input_token_account"),
        F.col(out_acct).alias("output_token_account"),
        F.lit(kind).alias("swap_kind"),
    ]


def _tail():
    return [F.col("instruction_index")]


def _normalize(bundle: TableBundle) -> DataFrame:
    """Typed-NULL pad the six decoded shapes to one schema with the
    swap_kind tag (raydium_swaps.py:378-514)."""
    clmm_cols = lambda: [
        _null("long").alias("max_amount_in"),
        _null("long").alias("amount_out"),
        _null("long").alias("amount_in"),
        _null("long").alias("minimum_amount_out"),
        F.col("amount"),
        F.col("other_amount_threshold"),
        F.col("sqrt_price_limit_x64"),
        F.col("is_base_input"),
    ]
    frames = [
        bundle["clmm_swaps_v1"].select(
            *_head("payer", "pool_state", "input_token_account", "output_token_account", "clmm_v1"),
            *clmm_cols(),
            *_tail(),
        ),
        bundle["clmm_swaps_v2"].select(
            *_head("payer", "pool_state", "input_token_account", "output_token_account", "clmm_v2"),
            *clmm_cols(),
            *_tail(),
        ),
        bundle["cp_swap_base_input_swaps"].select(
            *_head("payer", "pool_state", "input_token_account", "output_token_account", "cp_swap_base_input"),
            _null("long").alias("max_amount_in"),
            _null("long").alias("amount_out"),
            F.col("amount_in"),
            F.col("minimum_amount_out"),
            _null("long").alias("amount"),
            _null("long").alias("other_amount_threshold"),
            _null("decimal(38,0)").alias("sqrt_price_limit_x64"),
            _null("boolean").alias("is_base_input"),
            *_tail(),
        ),
        bundle["cp_swap_base_output_swaps"].select(
            *_head("payer", "pool_state", "input_token_account", "output_token_account", "cp_swap_base_output"),
            F.col("max_amount_in"),
            F.col("amount_out"),
            _null("long").alias("amount_in"),
            _null("long").alias("minimum_amount_out"),
            _null("long").alias("amount"),
            _null("long").alias("other_amount_threshold"),
            _null("decimal(38,0)").alias("sqrt_price_limit_x64"),
            _null("boolean").alias("is_base_input"),
            *_tail(),
        ),
        bundle["amm_base_in_swaps"].select(
            *_head("user_source_owner", "amm", "user_source_token_account", "user_destination_token_account", "amm_base_in"),
            _null("long").alias("max_amount_in"),
            _null("long").alias("amount_out"),
            F.col("amount_in"),
            F.col("minimum_amount_out"),
            _null("long").alias("amount"),
            _null("long").alias("other_amount_threshold"),
            _null("decimal(38,0)").alias("sqrt_price_limit_x64"),
            _null("boolean").alias("is_base_input"),
            *_tail(),
        ),
        bundle["amm_base_out_swaps"].select(
            *_head("user_source_owner", "amm", "user_source_token_account", "user_destination_token_account", "amm_base_out"),
            F.col("max_amount_in"),
            F.col("amount_out"),
            _null("long").alias("amount_in"),
            _null("long").alias("minimum_amount_out"),
            _null("long").alias("amount"),
            _null("long").alias("other_amount_threshold"),
            _null("decimal(38,0)").alias("sqrt_price_limit_x64"),
            _null("boolean").alias("is_base_input"),
            *_tail(),
        ),
    ]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


# the fused dispatch spec: eight kind branches + two transfer branches,
# decoded through ONE Arrow boundary (functions/borsh.py:
# decode_instructions_multi) instead of ten — the round-10 PIPEBENCH
# gap between raydium (44k instr/s, 10 boundaries) and meteora
# (152k instr/s, 2 boundaries) attributed to exactly this
_MULTI_KINDS = [
    (key, (program,), sig) for key, program, _disc, sig in _KINDS
] + [
    (
        "transfers",
        (C.TOKEN_PROGRAM_ID, C.TOKEN_2022_PROGRAM_ID),
        C.TOKEN_TRANSFER_SIGNATURE,
    ),
    (
        "checked_transfers",
        (C.TOKEN_PROGRAM_ID, C.TOKEN_2022_PROGRAM_ID),
        C.TOKEN_TRANSFER_CHECKED_SIGNATURE,
    ),
]


def decode_step(bundle: TableBundle, ctx) -> TableBundle:
    """raydium_swaps.py:309-374: memo-filter → index → 8-way dispatch →
    decode, fused: the discriminator dispatch happens INSIDE one
    mapInPandas batch (per-sub-batch vectorized kernels), the decoded
    union is cached per batch, and the ten branch frames are pure JVM
    projections over the cache.  Per-kind results are schema- and
    value-identical to the per-branch decode_instructions_df chain
    (pinned by the differential pytest)."""
    from cherry_pipelines_spark.functions.borsh import (
        decode_instructions_multi,
        split_decoded,
    )

    out = dict(bundle)
    ins = C.indexed_instructions(
        bundle["instructions"],
        (F.col("program_id") != F.lit(C.MEMO_PROGRAM_ID_V1))
        & (F.col("program_id") != F.lit(C.MEMO_PROGRAM_ID_V2)),
    )
    fused = ctx.batch_cache(
        decode_instructions_multi(ins, _MULTI_KINDS, passthrough=C.DECODE_PASSTHROUGH)
    )
    out.update(split_decoded(fused, _MULTI_KINDS, passthrough=C.DECODE_PASSTHROUGH))
    del out["instructions"]
    return out


def process_step(bundle: TableBundle, ctx) -> TableBundle:
    """raydium_swaps.py:377-625: vaults come from the adjacent transfers'
    destination/source (unlike orca where they're swap accounts)."""
    swaps = _normalize(bundle)
    transfers = C.prepared_transfers(
        bundle["transfers"], bundle["checked_transfers"], with_vaults=True
    )
    swaps = C.join_adjacent_transfers(swaps, transfers, with_vaults=True)
    swaps = C.join_vault_mints(swaps, bundle["token_balances"])
    swaps = C.join_tx_and_blocks(swaps, bundle["transactions"], bundle["blocks"])
    swaps = swaps.drop("instruction_index")
    return {
        TABLE_NAME: swaps,
        "token_decimals_table": C.token_decimals_table(bundle["token_balances"]),
    }


def build_pipeline(
    instructions_path: str,
    transactions_path: str,
    blocks_path: str,
    token_balances_path: str,
    sink_path: str,
) -> Pipeline:
    source = C.svm_source(
        instructions_path, transactions_path, blocks_path, token_balances_path
    )
    sink = ParquetSink(
        base_path=sink_path,
        anchor_table=TABLE_NAME,
        block_column="block_slot",
        sort_within_partitions={
            TABLE_NAME: ("block_slot", "transaction_index", "instruction_address")
        },
    )
    steps = [
        # split + decode are FUSED into one step (one Arrow boundary
        # for all ten discriminator branches — see decode_step)
        PyStep(decode_step, name="svm_decode_instructions"),
        PyStep(process_step, name="process_data"),
    ]
    return Pipeline(TABLE_NAME, source, steps, sink)
