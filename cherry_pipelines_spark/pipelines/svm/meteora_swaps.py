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
    (meteora_swaps.py:190-219).  The swap/CPI discriminator split
    itself moved into the fused decode (see ``decode_step``); this
    step's job is the FILTERED positional index the CPI adjacency
    join keys on."""
    out = dict(bundle)
    keep = (F.col("program_id") == F.lit(CP_AMM_PROGRAM_ID)) & (
        C.starts_with(F.col("data"), SWAP_DISCRIMINATOR)
        | C.starts_with(F.col("data"), CPI_DISCRIMINATOR)
    )
    out["ins"] = ctx.batch_cache(C.indexed_instructions(bundle["instructions"], keep))
    del out["instructions"]
    return out


# both kinds decode through ONE Arrow boundary (round-11 verdict #4:
# meteora ran per-branch decode chains — 2 mapInPandas stages over the
# same parent rows — while raydium/orca were already fused)
_MULTI_KINDS = [
    ("swaps", (CP_AMM_PROGRAM_ID,), SWAP_SIGNATURE),
    ("cpi", (CP_AMM_PROGRAM_ID,), CPI_SIGNATURE),
]


def decode_step(bundle: TableBundle, ctx) -> TableBundle:
    """meteora_swaps.py:222-254, fused: swap + CPI rows dispatch inside
    one mapInPandas batch (decode_instructions_multi); per-kind frames
    are JVM projections over the per-batch cache, schema-identical to
    the per-branch decode_instructions_df output (the CPI frame keeps
    its narrower 3-column passthrough by projection)."""
    out = dict(bundle)
    fused = ctx.batch_cache(
        B.decode_instructions_multi(
            out.pop("ins"), _MULTI_KINDS, passthrough=C.DECODE_PASSTHROUGH
        )
    )
    parts = B.split_decoded(fused, _MULTI_KINDS, passthrough=C.DECODE_PASSTHROUGH)
    out["swaps"] = parts["swaps"]
    out["cpi"] = parts["cpi"].select(
        "block_slot",
        "transaction_index",
        "instruction_index",
        *[p.name for p in CPI_SIGNATURE.params],
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


# (a_col, b_col, input_name, output_name) — the reference's fixed
# direction-swap column list (meteora_swaps.py:278-299)
_DIRECTIONAL = (
    ("token_a_mint", "token_b_mint", "input_mint", "output_mint"),
    (
        "token_a_program",
        "token_b_program",
        "input_token_program",
        "output_token_program",
    ),
    ("token_a_vault", "token_b_vault", "input_vault", "output_vault"),
)


def pair_cpi_and_direct(
    swaps: DataFrame,
    cpi: DataFrame,
    directional: tuple[tuple[str, str, str, str], ...] = _DIRECTIONAL,
) -> DataFrame:
    """J7 core (meteora_swaps.py:257-299), reusable: attach each swap's
    self-emitted CPI event at ``instruction_index + 1`` WITHIN the
    filtered swap|CPI sequence (one left join on the 3-key), rename the
    CPI's ``actual_amount_in`` to ``input_amount``, silently drop swaps
    whose CPI was not found (the reference's two-way eq(True)/eq(False)
    split quirk: NULL ``b_to_a`` matches neither side), then resolve
    each (token_a_X, token_b_X) pair present in ``swaps`` into
    input/output columns by ``b_to_a`` — a single-pass F.when instead of
    the reference's filter+rename+vstack.

    Scale shape: one shuffle on (block_slot, transaction_index) keys
    for the equi-join; the direction swap is map-only."""
    cpi = cpi.withColumn("found_cpi", F.lit(True))
    # the CPI decode re-emits amount_in/minimum_amount_out and a `pool`
    # bytes param — swap's own columns win (reference join keeps left
    # columns unsuffixed); rename the CPI duplicates away
    dup = [c for c in ("pool", "amount_in", "minimum_amount_out") if c in cpi.columns]
    cpi = cpi.drop(*dup).withColumnRenamed("instruction_index", "_cpi_idx")
    out = swaps.withColumn("_cpi_idx", F.col("instruction_index") + 1).join(
        cpi, on=["block_slot", "transaction_index", "_cpi_idx"], how="left"
    )
    if "actual_amount_in" in out.columns:
        out = out.withColumnRenamed("actual_amount_in", "input_amount")
    out = out.filter(F.col("b_to_a").isNotNull())
    b2a = F.col("b_to_a")
    for a_col, b_col, in_name, out_name in directional:
        if a_col in swaps.columns and b_col in swaps.columns:
            out = out.withColumn(
                in_name, F.when(~b2a, F.col(a_col)).otherwise(F.col(b_col))
            ).withColumn(
                out_name, F.when(~b2a, F.col(b_col)).otherwise(F.col(a_col))
            )
    return out.drop("_cpi_idx")


def process_step(bundle: TableBundle, ctx) -> TableBundle:
    """meteora_swaps.py:257-327: CPI pairing at index+1, then direction
    swap (single-pass F.when replaces the filter+rename+vstack)."""
    swaps = pair_cpi_and_direct(bundle["swaps"], bundle["cpi"]).select(
        *[c for c in _OUT_COLS if c not in ("block_height", "timestamp")]
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
