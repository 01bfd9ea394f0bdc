"""End-to-end pipeline throughput: generate an N-slot synthetic SVM
instruction stream (same generator as the gold-fixture tests) plus an
N-row EVM log stream, run each full pipeline (scan → decode → joins →
sink), and print rows-per-second per pipeline as one JSON line.

This measures what bench.py's per-operator queries don't: the composed
scan→decode→reshape→write path the reference runs in production, i.e.
the number to hold against the reference's single-node ingestion
throughput.

Usage:  python scripts/pipeline_bench.py [n_slots]   (default 20000)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cherry_pipelines_spark import get_spark


def main() -> None:
    n_slots = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    from tests.svm_fixtures_gen import gen_svm_fixtures

    work = tempfile.mkdtemp(prefix="pipe_bench_")
    spark = get_spark("pipeline_bench")
    results: dict[str, dict] = {}
    try:
        t0 = time.monotonic()
        _, paths = gen_svm_fixtures(os.path.join(work, "svm"), n_slots=n_slots)
        gen_s = time.monotonic() - t0

        import pyarrow.parquet as pq

        n_instructions = pq.read_metadata(paths["instructions"]).num_rows

        from cherry_pipelines_spark.pipelines.svm import (
            meteora_swaps as met,
            orca_metadata as meta,
            orca_swaps as orca,
            raydium_swaps as ray,
        )

        for mod, with_balances in (
            (orca, True), (ray, True), (met, True), (meta, False),
        ):
            sink = os.path.join(work, f"sink_{mod.TABLE_NAME}")
            if with_balances:
                pipe = mod.build_pipeline(
                    paths["instructions"], paths["transactions"], paths["blocks"],
                    paths["token_balances"], sink,
                )
            else:
                pipe = mod.build_pipeline(
                    paths["instructions"], paths["transactions"], paths["blocks"], sink
                )
            t0 = time.monotonic()
            pipe.run(spark, from_block=0, to_block=n_slots, batch_size=n_slots + 1)
            el = time.monotonic() - t0
            out_rows = pipe.sink.read_table(spark, mod.TABLE_NAME).count()
            results[mod.TABLE_NAME] = {
                "sec": round(el, 2),
                "in_rows": n_instructions,
                "out_rows": out_rows,
                "in_rows_per_sec": round(n_instructions / el),
            }

        print(
            json.dumps(
                {
                    "n_slots": n_slots,
                    "gen_sec": round(gen_s, 1),
                    "instructions": n_instructions,
                    "pipelines": results,
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
