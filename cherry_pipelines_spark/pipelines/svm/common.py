"""Shared SVM pipeline pieces (capability parity with the reference's
svm/common_signatures.py and the split/process structure its pipelines
share — structure re-expressed Spark-first, not translated).

Key Spark-first decision (SURVEY §7.3): the reference assigns a GLOBAL
row index over the sorted, filtered instruction batch and joins
adjacency on ``index+1``/``index+2`` *with equality on (block_slot,
transaction_index)*.  Because every adjacency comparison also equates
the (slot, tx) group, a per-(slot, tx) ``row_number`` produces
identical join results without the global sort — the global index is
``group_base + local_index`` and bases cancel inside a group.  At scale
that turns an impossible single-partition sort into a hash-partitioned
window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cherry_pipelines_spark.functions import borsh as B
from cherry_pipelines_spark.functions.crypto import base58_decode
from cherry_pipelines_spark.operators.positional import with_positional_index
from cherry_pipelines_spark.sources.parquet import ParquetSource, TableSpec

# public Solana program addresses (common_signatures.py:3-7)
MEMO_PROGRAM_ID_V1 = base58_decode("Memo1UhkJRfHyvLMcVucJwxXeuD728EqVDDwQDxFMNo")
MEMO_PROGRAM_ID_V2 = base58_decode("MemoSq4gqABAXKb96qnH8TysNcWxMyWCqXgDLGmfcHr")
TOKEN_PROGRAM_ID = base58_decode("TokenkegQfeZyiNwAJbNbGKPFXCWuBvf9Ss623VQ5DA")
TOKEN_2022_PROGRAM_ID = base58_decode("TokenzQdBNbLqP5VEhdkAS6EPFLC1PHnBqCXEpPxuEb")

# SPL token transfer instruction signatures (common_signatures.py:8-42)
TOKEN_TRANSFER_DISCRIMINATOR = bytes([3])
TOKEN_TRANSFER_CHECKED_DISCRIMINATOR = bytes([12])
TOKEN_TRANSFER_SIGNATURE = B.InstructionSignature(
    discriminator=TOKEN_TRANSFER_DISCRIMINATOR,
    params=(B.ParamInput("amount", B.U64()),),
    accounts_names=("source", "destination", "authority"),
)
TOKEN_TRANSFER_CHECKED_SIGNATURE = B.InstructionSignature(
    discriminator=TOKEN_TRANSFER_CHECKED_DISCRIMINATOR,
    params=(B.ParamInput("amount", B.U64()), B.ParamInput("decimals", B.U8())),
    accounts_names=("source", "mint", "destination", "authority"),
)

INSTRUCTION_FIELDS = (
    "block_slot",
    "block_hash",
    "transaction_index",
    "instruction_address",
    "program_id",
    *[f"a{i}" for i in range(10)],
    "rest_of_accounts",
    "data",
    "is_committed",
)
TRANSACTION_FIELDS = ("block_slot", "transaction_index", "signature")
BLOCK_FIELDS = ("slot", "height", "timestamp")
TOKEN_BALANCE_FIELDS = (
    "block_slot",
    "transaction_index",
    "account",
    "post_mint",
    "post_decimals",
)

DECODE_PASSTHROUGH = (
    "block_slot",
    "block_hash",
    "transaction_index",
    "instruction_address",
    "program_id",
    "instruction_index",
)


def starts_with(col: Column, prefix: bytes) -> Column:
    """Binary discriminator-prefix dispatch (reference P7:
    ``data.bin.starts_with(disc)``)."""
    return col.startswith(F.lit(prefix))


def program_in(*program_ids: bytes) -> Column:
    c = F.col("program_id") == F.lit(program_ids[0])
    for p in program_ids[1:]:
        c = c | (F.col("program_id") == F.lit(p))
    return c


def svm_source(
    instructions_path: str,
    transactions_path: str,
    blocks_path: str,
    token_balances_path: str | None,
    instruction_predicate: Column | None = None,
) -> ParquetSource:
    """The four-table SVM bundle scan (orca_swaps.py:487-543): committed
    instructions with an optional provider-side predicate (program OR of
    discriminator prefixes), plus transactions / blocks / token_balances
    side tables."""
    pred = F.col("is_committed")
    if instruction_predicate is not None:
        pred = pred & instruction_predicate
    tables = {
        "instructions": TableSpec(
            path=instructions_path,
            block_column="block_slot",
            columns=INSTRUCTION_FIELDS,
            predicate=pred,
        ),
        "transactions": TableSpec(
            path=transactions_path, block_column="block_slot", columns=TRANSACTION_FIELDS
        ),
        "blocks": TableSpec(path=blocks_path, block_column="slot", columns=BLOCK_FIELDS),
    }
    if token_balances_path is not None:
        tables["token_balances"] = TableSpec(
            path=token_balances_path,
            block_column="block_slot",
            columns=TOKEN_BALANCE_FIELDS,
        )
    return ParquetSource(tables)


def indexed_instructions(instructions: DataFrame, keep: Column) -> DataFrame:
    """Filter to ``keep`` rows, then assign the positional
    ``instruction_index`` per (block_slot, transaction_index) ordered by
    instruction_address (array-lexicographic).  Mirrors the reference's
    filter-then-``with_row_index`` (orca_swaps.py:234-238) with the
    global index replaced by the equivalent per-group one."""
    return with_positional_index(
        instructions.filter(keep),
        group_cols=("block_slot", "transaction_index"),
        order_cols=("instruction_address",),
        index_col="instruction_index",
    )


def prepared_transfers(
    transfers: DataFrame, checked_transfers: DataFrame, with_vaults: bool = False
) -> DataFrame:
    """Decoded transfer + transfer_checked rows stacked to one frame
    (orca_swaps.py:347-359; raydium keeps destination/source as the
    vault hints, raydium_swaps.py:516-532)."""
    cols = ["block_slot", "transaction_index", "amount", "instruction_index"]
    if with_vaults:
        cols += ["destination", "source"]
    return transfers.select(*cols).unionByName(checked_transfers.select(*cols))


def join_adjacent_transfers(
    swaps: DataFrame, transfers: DataFrame, with_vaults: bool = False
) -> DataFrame:
    """J2 positional adjacency: input transfer at index+1, output at
    index+2 (orca_swaps.py:402-436), with found_input/found_output
    flags; raydium also carries destination→input_vault /
    source→output_vault (raydium_swaps.py:553-568)."""
    in_cols = [
        F.col("block_slot"),
        F.col("transaction_index"),
        F.col("amount").alias("input_amount"),
        F.col("instruction_index").alias("_in_idx"),
        F.lit(True).alias("found_input"),
    ]
    out_cols = [
        F.col("block_slot"),
        F.col("transaction_index"),
        F.col("amount").alias("output_amount"),
        F.col("instruction_index").alias("_out_idx"),
        F.lit(True).alias("found_output"),
    ]
    if with_vaults:
        in_cols.append(F.col("destination").alias("input_vault"))
        out_cols.append(F.col("source").alias("output_vault"))
    input_transfers = transfers.select(*in_cols)
    output_transfers = transfers.select(*out_cols)
    swaps = swaps.withColumn("_in_idx", F.col("instruction_index") + 1).withColumn(
        "_out_idx", F.col("instruction_index") + 2
    )
    swaps = swaps.join(
        input_transfers, on=["block_slot", "transaction_index", "_in_idx"], how="left"
    )
    swaps = swaps.join(
        output_transfers, on=["block_slot", "transaction_index", "_out_idx"], how="left"
    )
    return swaps.drop("_in_idx", "_out_idx")


def join_vault_mints(swaps: DataFrame, token_balances: DataFrame) -> DataFrame:
    """J3: resolve vault account → mint via token balances
    (orca_swaps.py:452-463)."""
    input_balances = token_balances.select(
        "block_slot",
        "transaction_index",
        F.col("account").alias("input_vault"),
        F.col("post_mint").alias("input_mint"),
    )
    output_balances = token_balances.select(
        "block_slot",
        "transaction_index",
        F.col("account").alias("output_vault"),
        F.col("post_mint").alias("output_mint"),
    )
    swaps = swaps.join(
        input_balances, on=["block_slot", "transaction_index", "input_vault"], how="left"
    )
    swaps = swaps.join(
        output_balances,
        on=["block_slot", "transaction_index", "output_vault"],
        how="left",
    )
    return swaps


def join_tx_and_blocks(
    swaps: DataFrame, transactions: DataFrame, blocks: DataFrame
) -> DataFrame:
    """J4: attach transaction signature and block height/timestamp
    (orca_swaps.py:465-467).  Both sides are per-batch small relative to
    swaps — broadcast them."""
    tx = transactions.select(
        "block_slot",
        "transaction_index",
        F.col("signature").alias("transaction_signature"),
    )
    blk = blocks.select(
        F.col("slot").alias("block_slot"),
        F.col("height").alias("block_height"),
        F.col("timestamp"),
    )
    swaps = swaps.join(F.broadcast(tx), on=["block_slot", "transaction_index"], how="left")
    swaps = swaps.join(F.broadcast(blk), on="block_slot", how="left")
    return swaps


def token_decimals_table(token_balances: DataFrame) -> DataFrame:
    """Second output table of the swap pipelines (orca_swaps.py:475-478)."""
    return token_balances.select(
        F.col("post_mint").alias("mint"), F.col("post_decimals").alias("decimals")
    )
