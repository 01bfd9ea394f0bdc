"""Derived swap-prices pipeline — capability parity with
/root/reference/src/cherry_pipelines/svm/swap_prices.py: reads the
materialized ``raydium_swaps`` table back, computes 20-slot trailing
VWAP prices for WSOL (vs USD coins) and for tokens (vs priced outputs),
in fixed-point Decimal(38,9), with 200-slot batches and 20-slot
lookback refetch.

Spark-first plan improvement (SURVEY §4.9): the reference's non-equi
``join_where`` range self-join + group_by (swap_prices.py:190-201,
272-283) is re-expressed as a ``rangeBetween(-20, 0)`` window.  The
reference's group-by also *multiplies* window sums by the number of
anchor rows sharing a slot (each anchor row of a slot contributes one
copy of the window to the slot's group) — reproduced here by summing
the per-row window totals per (slot[, mint]): n_rows × window_sum,
identical numbers, including the inflated ``window_total_amount`` and
threshold behavior.  The price ratio is unaffected (the multiplier
cancels in total_output / total_input).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cherry_pipelines_spark.engine.checkpoint import get_min_block, get_next_block
from cherry_pipelines_spark.functions.crypto import base58_decode
from cherry_pipelines_spark.operators.windows import (
    chunked_trailing_range_agg,
    trailing_range_agg,
)
from cherry_pipelines_spark.sinks.parquet import ParquetSink

TABLE_NAME = "swap_prices"

WINDOW_RANGE = 20
BATCH_RANGE = 200
DECIMALS = 9
USD_DECIMALS = 6
USD_PRICE = 10 ** (DECIMALS - USD_DECIMALS)  # = 1000 raw units
TOTAL_AMOUNT_THRESHOLD = USD_PRICE * 1_000_000

USDC = base58_decode("EPjFWdd5AufqSSqeM2qN1xzybapC8G4wEGGkZwyTDt1v")
USDT = base58_decode("Es9vMFrzaCERmJfrF4H2FYD4KCoNkY11McCe8BenwNYB")
USD_COINS = (USDC, USDT)
WSOL = base58_decode("So11111111111111111111111111111111111111112")

DEC = "decimal(38,9)"

# sol-leg window chunk for single-plan backfills: bounds any one window
# task to ~BACKFILL_CHUNK slots of history (see chunked_trailing_range_agg)
BACKFILL_CHUNK = 4096


def _directional_swaps(swaps: DataFrame) -> DataFrame:
    """Decimal casts + bidirectional union + USD/WSOL filter
    (swap_prices.py:151-183): each swap contributes both directions,
    then keep rows whose input is NOT a USD coin and whose output is
    WSOL or a USD coin."""
    base = swaps.select(
        F.col("input_amount").cast(DEC).alias("input_amount"),
        F.col("output_amount").cast(DEC).alias("output_amount"),
        "input_mint",
        "output_mint",
        "block_slot",
        "timestamp",
    )
    flipped = swaps.select(
        F.col("output_amount").cast(DEC).alias("input_amount"),
        F.col("input_amount").cast(DEC).alias("output_amount"),
        F.col("output_mint").alias("input_mint"),
        F.col("input_mint").alias("output_mint"),
        "block_slot",
        "timestamp",
    )
    both = base.unionByName(flipped)
    # set membership on binary columns as an explicit OR chain (P8)
    out_usd = (F.col("output_mint") == F.lit(USD_COINS[0])) | (
        F.col("output_mint") == F.lit(USD_COINS[1])
    )
    in_usd = (F.col("input_mint") == F.lit(USD_COINS[0])) | (
        F.col("input_mint") == F.lit(USD_COINS[1])
    )
    return both.filter(
        (~in_usd) & ((F.col("output_mint") == F.lit(WSOL)) | out_usd)
    )


def _windowed_totals(
    df: DataFrame,
    from_block: int,
    partition_cols: tuple[str, ...],
    chunk: int | None = None,
) -> DataFrame:
    """Trailing 20-slot totals, replicating the reference's
    join+group_by fan-out: per-row window sums, then summed per
    (slot[, mint]) group — total = n_anchor_rows × window_sum.

    ``chunk`` switches to the chunked boundary-replicated window
    (operators/windows.chunked_trailing_range_agg) so an unbounded
    backfill never funnels a whole partition-key's history into one
    task; results are identical."""
    aggs = {
        "w_input": F.sum("input_amount"),
        "w_output": F.sum("output_amount"),
    }
    if chunk is None:
        per_row = trailing_range_agg(
            df, "block_slot", WINDOW_RANGE, aggs, partition_cols
        )
    else:
        per_row = chunked_trailing_range_agg(
            df, "block_slot", WINDOW_RANGE, aggs, partition_cols, chunk=chunk
        )
    # anchors must be inside the batch proper (lookback rows only feed
    # windows; swap_prices.py:193,274)
    per_row = per_row.filter(F.col("block_slot") >= from_block)
    return per_row.groupBy("block_slot", *partition_cols, "timestamp").agg(
        F.sum("w_input").cast(DEC).alias("total_input"),
        F.sum("w_output").cast(DEC).alias("total_output"),
    )


def compute_prices(
    spark: SparkSession,
    swaps: DataFrame,
    from_block: int,
    to_block: int,
    batch_origin: int | None = None,
    batch_step: int | None = None,
    chunk: int | None = None,
) -> DataFrame:
    """One batch of the derived pipeline (swap_prices.py:149-300).
    ``swaps`` must already include the 20-slot lookback rows.

    ``batch_origin``/``batch_step``/``chunk`` are the single-plan
    backfill knobs: the reference's batch loop only prices token swaps
    whose slot falls inside the CURRENT batch (lookback token rows have
    no price row to join, swap_prices.py:252-265), so token windows
    truncate at batch starts.  A full-range plan reproduces that exactly
    by partitioning the token window on the batch id; the sol leg has no
    such truncation (lookback sol swaps need no price join) and uses the
    chunked window to stay bounded per task."""
    data = _directional_swaps(
        swaps.filter((F.col("input_amount") != 0) & (F.col("output_amount") != 0))
    )

    # --- WSOL price from sol→usd swaps (swap_prices.py:185-219) ---
    out_usd = (F.col("output_mint") == F.lit(USD_COINS[0])) | (
        F.col("output_mint") == F.lit(USD_COINS[1])
    )
    sol_to_usd = data.filter((F.col("input_mint") == F.lit(WSOL)) & out_usd)
    sol_totals = _windowed_totals(sol_to_usd, from_block, (), chunk=chunk)
    sol_prices = (
        sol_totals.filter(F.col("total_output") > TOTAL_AMOUNT_THRESHOLD)
        .select(
            (
                (F.col("total_output") / F.col("total_input")).cast(DEC)
                * F.lit(USD_PRICE).cast(DEC)
            )
            .cast(DEC)
            .alias("price"),
            "block_slot",
            F.lit(WSOL).alias("mint"),
            "timestamp",
            (F.col("total_output") / 1000).cast(DEC).alias("window_total_amount"),
        )
        # consumed by BOTH the token price join and the final output
        # union — materialize (≤ |slots| rows) so the sol window chain
        # runs once, not twice
        .localCheckpoint(eager=False)
    )

    # --- constant USD prices for every slot in the batch (:221-250) ---
    usd_frames = None
    for coin in USD_COINS:
        f = spark.range(from_block, to_block + 1).select(
            F.lit(USD_PRICE).cast(DEC).alias("price"),
            F.col("id").alias("block_slot"),
            F.lit(coin).alias("mint"),
        )
        usd_frames = f if usd_frames is None else usd_frames.unionByName(f)
    prices = sol_prices.select("price", "block_slot", "mint").unionByName(usd_frames)

    # --- token prices vs priced outputs (:252-298) ---
    token_swaps = (
        data.filter(F.col("input_mint") != F.lit(WSOL))
        .join(
            prices.withColumnRenamed("mint", "output_mint").withColumnRenamed(
                "price", "out_price"
            ),
            on=["output_mint", "block_slot"],
            how="inner",
        )
        .withColumn(
            "output_price", (F.col("output_amount") * F.col("out_price")).cast(DEC)
        )
    )
    token_window_input = token_swaps.select(
        "block_slot",
        "timestamp",
        F.col("input_mint"),
        F.col("input_amount"),
        F.col("output_price").alias("output_amount"),  # reuse the window helper
    )
    token_partition: tuple[str, ...] = ("input_mint",)
    if batch_step is not None:
        # replicate the loop's per-batch token-window truncation: a
        # window partitioned on the batch id cannot see the previous
        # batch's (price-less in the loop) token rows
        token_window_input = token_window_input.withColumn(
            "_batch",
            F.floor(
                (F.col("block_slot") - F.lit(batch_origin)) / F.lit(batch_step)
            ),
        )
        token_partition = ("input_mint", "_batch")
    token_totals = _windowed_totals(token_window_input, from_block, token_partition)
    token_prices = token_totals.select(
        (F.col("total_output") / F.col("total_input")).cast(DEC).alias("price"),
        "block_slot",
        F.col("input_mint").alias("mint"),
        "timestamp",
        (F.col("total_output") / 1000).cast(DEC).alias("window_total_amount"),
    )

    return sol_prices.unionByName(token_prices)


def run(
    spark: SparkSession,
    raydium_swaps_path: str,
    sink_path: str,
    from_block: int = 0,
    mode: str = "incremental",
    batch_range: int = BATCH_RANGE,
) -> int:
    """Derived-pipeline driver (swap_prices.py:86-317): bounds from the
    source table's min/max, resume from the sink's max block.

    ``mode="incremental"`` is the reference's loop — ``batch_range``-slot
    batches with a ``WINDOW_RANGE``-slot lookback refetch, one Spark job
    per batch.  Right for tail-following a live table.

    ``mode="backfill"`` processes the whole remaining range in ONE plan:
    the trailing ``rangeBetween(-WINDOW_RANGE, 0)`` window plus the
    ``block_slot >= start`` anchor guard already make batch edges exact,
    so the loop adds nothing but per-batch driver/job overhead — at a
    100× history that is thousands of sequential Spark jobs.  Output is
    stamped with the same ``_batch_start`` partition each row would have
    landed in under the loop, so the on-disk layout (and per-batch
    replay idempotence) is identical.
    """
    src = spark.read.parquet(raydium_swaps_path)
    min_block = get_min_block(spark, raydium_swaps_path, "block_slot")
    end_block = get_next_block(spark, raydium_swaps_path, "block_slot")
    sink = ParquetSink(
        base_path=sink_path, anchor_table=TABLE_NAME, block_column="block_slot"
    )
    next_block = sink.next_block(spark)
    start = max(from_block, next_block)
    if min_block is not None:
        start = max(start, min_block)
    if start >= end_block:
        return 0
    start = start + WINDOW_RANGE
    step = batch_range + 1

    if mode == "backfill":
        last = end_block - 1
        if start > last:
            return 0
        # No cache: a full-history backfill cannot pin the source in
        # memory; each branch re-scans parquet with its own pushed
        # filters (input/output mint, block_slot range) instead.
        window_src = src.filter(
            (F.col("block_slot") >= max(0, start - WINDOW_RANGE))
            & (F.col("block_slot") <= last)
        )
        prices = compute_prices(
            spark,
            window_src,
            start,
            last,
            batch_origin=start,
            batch_step=step,
            chunk=BACKFILL_CHUNK,
        )
        batch_expr = F.lit(start) + F.floor(
            (F.col("block_slot") - F.lit(start)) / F.lit(step)
        ) * F.lit(step)
        sink.write(spark, {TABLE_NAME: prices}, start, last, batch_expr=batch_expr)
        return (last - start) // step + 1

    n_batches = 0
    cur = start
    while cur < end_block:
        batch_end = min(end_block - 1, cur + batch_range)
        window_src = src.filter(
            (F.col("block_slot") >= max(0, cur - WINDOW_RANGE))
            & (F.col("block_slot") <= batch_end)
        ).cache()
        # one batch is ≤ batch_range+WINDOW_RANGE slots — caching it
        # keeps the sol/token/flip branches (6 plan references) from
        # re-scanning the source per branch; released after the write
        try:
            prices = compute_prices(spark, window_src, cur, batch_end)
            sink.write(spark, {TABLE_NAME: prices}, cur, batch_end)
        finally:
            window_src.unpersist()
        cur += step
        n_batches += 1
    return n_batches
