"""Meteora CP-AMM swap pipeline — capability parity with
/root/reference/src/cherry_pipelines/svm/meteora_swaps.py: swap
instructions paired with their self-emitted CPI event instruction at
index+1 (J7), direction swap on ``b_to_a``, tx/block joins, two-table
output.

Note the indexing difference vs orca/raydium: the positional index is
assigned AFTER filtering to only this program's swap|CPI instructions
(meteora_swaps.py:201-208), so the CPI event is at index+1 within that
filtered sequence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cherry_pipelines_spark.engine.pipeline import Pipeline
from cherry_pipelines_spark.engine.step import PyStep, TableBundle
from cherry_pipelines_spark.functions import borsh as B
from cherry_pipelines_spark.functions.borsh import decode_instructions_df
from cherry_pipelines_spark.functions.crypto import anchor_discriminator, base58_decode
from cherry_pipelines_spark.pipelines.svm import common as C
from cherry_pipelines_spark.sinks.parquet import ParquetSink

TABLE_NAME = "meteora_swaps"
CP_AMM_PROGRAM_ID = base58_decode("cpamdpZCGKUy5JxQXB4dcpGPiikHawvSWAd6mEn1sGG")
SWAP_DISCRIMINATOR = anchor_discriminator("swap")
CPI_DISCRIMINATOR = bytes.fromhex("e445a52e51cb9a1d1b3c15d58aaabb93")

# meteora_swaps.py:37-63
SWAP_SIGNATURE = B.InstructionSignature(
    discriminator=SWAP_DISCRIMINATOR,
    params=(
        B.ParamInput("amount_in", B.U64()),
        B.ParamInput("minimum_amount_out", B.U64()),
    ),
    accounts_names=(
        "pool_authority",
        "pool",
        "input_token_account",
        "output_token_account",
        "token_a_vault",
        "token_b_vault",
        "token_a_mint",
        "token_b_mint",
        "payer",
        "token_a_program",
        "token_b_program",
        "referral_token_account",
    ),
)
# meteora_swaps.py:64-130 (flattened SwapParameters + SwapResult structs —
# same borsh layout)
CPI_SIGNATURE = B.InstructionSignature(
    discriminator=CPI_DISCRIMINATOR,
    params=(
        B.ParamInput("pool", B.FixedArray(B.U8(), 32)),
        B.ParamInput("b_to_a", B.Bool()),
        B.ParamInput("has_referral", B.Bool()),
        B.ParamInput("amount_in", B.U64()),
        B.ParamInput("minimum_amount_out", B.U64()),
        B.ParamInput("output_amount", B.U64()),
        B.ParamInput("next_sqrt_price", B.U128()),
        B.ParamInput("lp_fee", B.U64()),
        B.ParamInput("protocol_fee", B.U64()),
        B.ParamInput("partner_fee", B.U64()),
        B.ParamInput("referral_fee", B.U64()),
        B.ParamInput("actual_amount_in", B.U64()),
        B.ParamInput("current_timestamp", B.U64()),
    ),
    accounts_names=(),
)


def split_step(bundle: TableBundle, ctx) -> TableBundle:
    """Filter to this program's swap|CPI rows FIRST, then index
    (meteora_swaps.py:190-219)."""
    out = dict(bundle)
    keep = (F.col("program_id") == F.lit(CP_AMM_PROGRAM_ID)) & (
        C.starts_with(F.col("data"), SWAP_DISCRIMINATOR)
        | C.starts_with(F.col("data"), CPI_DISCRIMINATOR)
    )
    ins = ctx.batch_cache(C.indexed_instructions(bundle["instructions"], keep))
    out["swaps"] = ins.filter(C.starts_with(F.col("data"), SWAP_DISCRIMINATOR))
    out["cpi"] = ins.filter(C.starts_with(F.col("data"), CPI_DISCRIMINATOR))
    del out["instructions"]
    return out


def decode_step(bundle: TableBundle, ctx) -> TableBundle:
    out = dict(bundle)
    out["swaps"] = decode_instructions_df(
        bundle["swaps"], SWAP_SIGNATURE, passthrough=C.DECODE_PASSTHROUGH
    )
    out["cpi"] = decode_instructions_df(
        bundle["cpi"],
        CPI_SIGNATURE,
        passthrough=("block_slot", "transaction_index", "instruction_index"),
    )
    return out


_OUT_COLS = (
    "block_slot",
    "block_hash",
    "transaction_index",
    "instruction_address",
    "program_id",
    "pool",
    "b_to_a",
    "has_referral",
    "amount_in",
    "minimum_amount_out",
    "output_amount",
    "next_sqrt_price",
    "lp_fee",
    "protocol_fee",
    "partner_fee",
    "referral_fee",
    "input_amount",
    "current_timestamp",
    "pool_authority",
    "input_token_account",
    "output_token_account",
    "input_vault",
    "output_vault",
    "input_mint",
    "output_mint",
    "payer",
    "input_token_program",
    "output_token_program",
    "referral_token_account",
    "found_cpi",
)


def process_step(bundle: TableBundle, ctx) -> TableBundle:
    """meteora_swaps.py:257-327: CPI pairing at index+1, then direction
    swap (single-pass F.when replaces the filter+rename+vstack)."""
    swaps = bundle["swaps"]
    cpi = bundle["cpi"].withColumn("found_cpi", F.lit(True))
    # the CPI decode re-emits amount_in/minimum_amount_out and a `pool`
    # bytes param — swap's own columns win (reference join keeps left
    # columns unsuffixed); rename the CPI duplicates away
    cpi = (
        cpi.drop("pool", "amount_in", "minimum_amount_out")
        .withColumnRenamed("instruction_index", "_cpi_idx")
    )
    swaps = swaps.withColumn("_cpi_idx", F.col("instruction_index") + 1)
    swaps = swaps.join(cpi, on=["block_slot", "transaction_index", "_cpi_idx"], how="left")
    swaps = swaps.withColumnRenamed("actual_amount_in", "input_amount")

    # reference quirk preserved: the two-way eq(True)/eq(False) split
    # (meteora_swaps.py:276-277) silently drops rows whose CPI was not
    # found (NULL b_to_a matches neither filter)
    swaps = swaps.filter(F.col("b_to_a").isNotNull())

    b2a = F.col("b_to_a")

    def pick(a_col: str, b_col: str):
        return F.when(~b2a, F.col(a_col)).otherwise(F.col(b_col))

    swaps = (
        swaps.withColumn("input_mint", pick("token_a_mint", "token_b_mint"))
        .withColumn("output_mint", pick("token_b_mint", "token_a_mint"))
        .withColumn("input_token_program", pick("token_a_program", "token_b_program"))
        .withColumn("output_token_program", pick("token_b_program", "token_a_program"))
        .withColumn("input_vault", pick("token_a_vault", "token_b_vault"))
        .withColumn("output_vault", pick("token_b_vault", "token_a_vault"))
        .select(*[c for c in _OUT_COLS if c not in ("block_height", "timestamp")])
    )
    swaps = C.join_tx_and_blocks(swaps, bundle["transactions"], bundle["blocks"])
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
        PyStep(split_step, name="split_instructions"),
        PyStep(decode_step, name="svm_decode_instructions"),
        PyStep(process_step, name="process_data"),
    ]
    return Pipeline(TABLE_NAME, source, steps, sink)
