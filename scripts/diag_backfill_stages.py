"""Stage attribution for the swap_prices BACKFILL number.

PIPEBENCH records one end-to-end figure (~5.2k slots/s over 500k
slots) with no attribution between scan / sol-leg chunked window /
token join+window / sink write — this script rebuilds the exact
PIPEBENCH synthetic source (scripts/pipeline_bench.py:100-122) and
times cumulative plan prefixes, so each stage's cost is the delta
between consecutive rows:

  1. scan+directional:  source scan, nonzero filter, directional swap
  2. + sol window:      chunked trailing-range window + totals + price
  3. + token chain:     USD frames union, price join, token window
  4. + sink write:      full run(mode="backfill") including the
                        _batch_start-partitioned parquet write

Each prefix is timed in the SAME JVM after one untimed warm-up of the
full plan (C2/codegen steady state — the discipline scaling_bench.py
documents).  Also reports the chunked window's partition utilization
at chunk=4096 (distinct chunk keys vs cores), the cheap-fix question
the round-9 verdict asked.

Usage: python scripts/diag_backfill_stages.py [n_slots=500000]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    n_price_slots = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000

    from cherry_pipelines_spark.pipelines.svm import swap_prices as sp
    from cherry_pipelines_spark.session import get_spark

    spark = get_spark("diag_backfill", wide_shuffles=True)
    work = tempfile.mkdtemp(prefix="diag_backfill_")
    try:
        token_hex = lambda c: F.lpad(F.hex(c), 64, "0")  # noqa: E731
        slots = spark.range(1, n_price_slots + 1).select(
            F.col("id").alias("block_slot"),
            (F.lit(1_700_000_000) + F.col("id")).alias("timestamp"),
        )
        sol_leg = slots.select(
            "block_slot", "timestamp",
            F.lit(sp.WSOL).alias("input_mint"),
            F.lit(sp.USDC).alias("output_mint"),
            (F.lit(10_000_000_000) + F.col("block_slot") % 997).alias("input_amount"),
            (F.lit(2_000_000_000) + F.col("block_slot") % 499).alias("output_amount"),
        )
        token_leg = slots.filter(F.col("block_slot") % 3 == 0).select(
            "block_slot", "timestamp",
            F.unhex(token_hex(F.lit(900) + F.col("block_slot") % 50)).alias(
                "input_mint"
            ),
            F.lit(sp.WSOL).alias("output_mint"),
            (F.lit(5_000_000_000) + F.col("block_slot")).alias("input_amount"),
            (F.lit(1_000_000_000) + F.col("block_slot") % 101).alias("output_amount"),
        )
        src_dir = os.path.join(work, "src")
        sol_leg.unionByName(token_leg).write.parquet(src_dir)

        src = spark.read.parquet(src_dir)
        start, last = 1 + sp.WINDOW_RANGE, n_price_slots
        step = sp.BATCH_RANGE + 1
        window_src = src.filter(
            (F.col("block_slot") >= max(0, start - sp.WINDOW_RANGE))
            & (F.col("block_slot") <= last)
        )

        def noop(df):
            df.write.mode("overwrite").format("noop").save()

        def full_prices():
            return sp.compute_prices(
                spark, window_src, start, last,
                batch_origin=start, batch_step=step, chunk=sp.BACKFILL_CHUNK,
            )

        # untimed warm-up of the deepest plan
        noop(full_prices())

        def timed(label, fn, runs=2):
            best = None
            for _ in range(runs):
                spark.catalog.clearCache()
                t = time.monotonic()
                fn()
                dt = time.monotonic() - t
                best = dt if best is None else min(best, dt)
            print(f"{label:28s} {best:7.2f} s", flush=True)
            return best

        # 1. scan + directional normalization
        from cherry_pipelines_spark.pipelines.svm.swap_prices import (
            _directional_swaps,
            _windowed_totals,
        )

        data = _directional_swaps(
            window_src.filter(
                (F.col("input_amount") != 0) & (F.col("output_amount") != 0)
            )
        )
        t_scan = timed("1 scan+directional", lambda: noop(data))

        # 2. + sol leg: chunked trailing window + totals + price select
        out_usd = (F.col("output_mint") == F.lit(sp.USD_COINS[0])) | (
            F.col("output_mint") == F.lit(sp.USD_COINS[1])
        )
        sol_to_usd = data.filter((F.col("input_mint") == F.lit(sp.WSOL)) & out_usd)
        sol_totals = _windowed_totals(
            sol_to_usd, start, (), chunk=sp.BACKFILL_CHUNK
        )
        t_sol = timed("2 +sol chunked window", lambda: noop(sol_totals))

        # 3. + token chain (full compute_prices, no write)
        t_prices = timed("3 +token join+window", lambda: noop(full_prices()))

        # 4. full run() incl. partitioned write (fresh sink per run)
        def run_full():
            sink = os.path.join(work, f"sink_{time.monotonic_ns()}")
            sp.run(spark, src_dir, sink, mode="backfill")
            shutil.rmtree(sink, ignore_errors=True)

        t_full = timed("4 full backfill+write", run_full)

        n_chunks = (
            data.select(
                F.floor(F.col("block_slot") / sp.BACKFILL_CHUNK).alias("c")
            )
            .distinct()
            .count()
        )
        print(
            f"\nattribution (deltas): scan {t_scan:.2f}, "
            f"sol-window +{t_sol - t_scan:.2f}, "
            f"token-chain +{t_prices - t_sol:.2f}, "
            f"write +{t_full - t_prices:.2f}  "
            f"(total {t_full:.2f} s, {n_price_slots / t_full:,.0f} slots/s)"
        )
        print(
            f"chunk utilization: {n_chunks} chunk keys at chunk="
            f"{sp.BACKFILL_CHUNK} over {n_price_slots} slots vs "
            f"{spark.sparkContext.defaultParallelism} cores"
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
