"""End-to-end pipeline throughput: generate an N-slot synthetic SVM
instruction stream (same generator as the gold-fixture tests) plus an
N-row EVM log stream, run each full pipeline (scan → decode → joins →
sink), and print rows-per-second per pipeline as one JSON line.

This measures what bench.py's per-operator queries don't: the composed
scan→decode→reshape→write path the reference runs in production, i.e.
the number to hold against the reference's single-node ingestion
throughput.

Usage:  python scripts/pipeline_bench.py [n_slots] [out.json]
        (default 20000 slots; the JSON line is also written to
        PIPEBENCH.json at the repo root — pass an explicit second arg
        for the round-stamped PIPEBENCH_rN.json artifact so composed
        scan→decode→reshape→write regressions stay machine-visible
        round-over-round, not just prose in SCALE.md)
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


def _calibration_canary() -> dict:
    """Machine-speed calibration that touches NO repo code: a pinned
    numpy matmul and a pinned pure-Python loop, best-of-3 each.  If
    these move between runs, the machine moved — per-pipeline deltas
    smaller than the canary delta are environment, not code (the
    round-12 lesson: same-day PIPEBENCH runs spread ±25% on untouched
    pipelines from host load alone, and without an in-artifact
    calibration the numbers weren't round-comparable)."""
    import numpy as np

    rng = np.random.default_rng(7)
    a = rng.standard_normal((1024, 1024))
    b = rng.standard_normal((1024, 1024))
    mm = min(
        _timed(lambda: a @ b) for _ in range(3)
    )
    py = min(
        _timed(lambda: sum(i * i for i in range(2_000_000))) for _ in range(3)
    )
    return {"matmul_1024_sec": round(mm, 4), "pyloop_2m_sec": round(py, 4)}


def _timed(fn) -> float:
    t0 = time.monotonic()
    fn()
    return time.monotonic() - t0


def main() -> None:
    n_slots = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    from tests.svm_fixtures_gen import gen_svm_fixtures

    work = tempfile.mkdtemp(prefix="pipe_bench_")
    loadavg_start = os.getloadavg()
    canary_start = _calibration_canary()
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

        # warmup: the FIRST pipeline in a fresh session absorbs ~10+ s of
        # one-time cost (Python-worker pool spin-up, codegen, output
        # committer init) — measured to flip the pipeline ranking when
        # attributed to whichever ran first.  One small throwaway run
        # pays it outside the timed region.
        warm_sink = os.path.join(work, "sink_warmup")
        meta.build_pipeline(
            paths["instructions"], paths["transactions"], paths["blocks"], warm_sink
        ).run(spark, from_block=0, to_block=min(n_slots, 2000), batch_size=n_slots + 1)

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

        # derived pipeline with real window semantics: swap_prices
        # backfill (chunked trailing-range window, one plan over the
        # whole history).  Source: synthetic N-slot swap stream with the
        # unit tests' row shape/magnitudes (sol→usdc anchor per slot +
        # periodic token legs), large enough that the $1M rolling
        # threshold passes.
        from pyspark.sql import functions as F

        from cherry_pipelines_spark.pipelines.svm import swap_prices as sp

        n_price_slots = n_slots * 5
        token_hex = lambda c: F.lpad(F.hex(c), 64, "0")
        slots = spark.range(1, n_price_slots + 1).select(
            F.col("id").alias("block_slot"),
            (F.lit(1_700_000_000) + F.col("id")).alias("timestamp"),
        )
        sol_leg = slots.select(
            "block_slot", "timestamp",
            F.lit(sp.WSOL).alias("input_mint"), F.lit(sp.USDC).alias("output_mint"),
            (F.lit(10_000_000_000) + F.col("block_slot") % 997).alias("input_amount"),
            (F.lit(2_000_000_000) + F.col("block_slot") % 499).alias("output_amount"),
        )
        token_leg = slots.filter(F.col("block_slot") % 3 == 0).select(
            "block_slot", "timestamp",
            F.unhex(token_hex(F.lit(900) + F.col("block_slot") % 50)).alias("input_mint"),
            F.lit(sp.WSOL).alias("output_mint"),
            (F.lit(5_000_000_000) + F.col("block_slot")).alias("input_amount"),
            (F.lit(1_000_000_000) + F.col("block_slot") % 101).alias("output_amount"),
        )
        src_dir = os.path.join(work, "swap_prices_src")
        sol_leg.unionByName(token_leg).write.parquet(src_dir)
        sp_sink = os.path.join(work, "sink_swap_prices")
        t0 = time.monotonic()
        sp.run(spark, src_dir, sp_sink, mode="backfill")
        el = time.monotonic() - t0
        out_rows = (
            spark.read.parquet(os.path.join(sp_sink, sp.TABLE_NAME)).count()
        )
        results["swap_prices_backfill"] = {
            "sec": round(el, 2),
            "slots": n_price_slots,
            "out_rows": out_rows,
            "slots_per_sec": round(n_price_slots / el),
        }

        # bulk-media decode throughput: N baseline JPEGs encoded once
        # (distributed, deterministic per id) and written as a binary
        # column, then the full decode_image_stats path timed over them.
        # Records which engine decoded (PIL fast path when the env has
        # Pillow, the pure-numpy codec otherwise) so throughput numbers
        # are comparable across environments.
        import numpy as np
        import pandas as pd

        from cherry_pipelines_spark.operators.jpeg import _encode_jpeg
        from cherry_pipelines_spark.operators.multimodal import (
            _pil_available,
            decode_image_stats,
        )
        from pyspark.sql import types as T

        n_images = n_slots
        blob_schema = T.StructType(
            [
                T.StructField("media_id", T.LongType()),
                T.StructField("blob", T.BinaryType()),
            ]
        )

        def enc(batches):
            for pdf in batches:
                blobs = []
                for i in pdf["id"]:
                    rng = np.random.default_rng(int(i))
                    blobs.append(
                        _encode_jpeg(
                            rng.integers(0, 256, (32, 32, 3)).astype(np.uint8)
                        )
                    )
                yield pd.DataFrame({"media_id": pdf["id"], "blob": blobs})

        media_dir = os.path.join(work, "media_blobs")
        spark.range(n_images).repartition(32).mapInPandas(
            enc, blob_schema
        ).write.parquet(media_dir)
        blobs_df = spark.read.parquet(media_dir)
        media_mb = sum(
            os.path.getsize(os.path.join(media_dir, f))
            for f in os.listdir(media_dir)
            if f.endswith(".parquet")
        ) / 1e6
        t0 = time.monotonic()
        decode_image_stats(blobs_df).write.mode("overwrite").format("noop").save()
        el = time.monotonic() - t0
        results["media_decode_jpeg"] = {
            "sec": round(el, 2),
            "images": n_images,
            "input_mb": round(media_mb, 1),
            "images_per_sec": round(n_images / el),
            "engine": "pil" if _pil_available() else "pure-numpy",
        }

        # streaming near-dedup throughput: an N-doc corpus with ~25%
        # near-dup families arrives as 4 micro-batches
        # (maxFilesPerTrigger=1); the full shingle→minhash→band→claim
        # stateful path is timed across all batches.  Survivor count is
        # reported so a semantics regression shows up next to the rate.
        from cherry_pipelines_spark.streaming.stateful import (
            streaming_near_dedup_claims,
        )

        n_docs = n_slots
        words = [f"w{j}" for j in range(50)]
        # Mixed corpus: ODD families draw every word from a shared
        # 50-word vocabulary, so they collapse into ~50 near-dup
        # super-groups (the merge path — a purely mod-V text measured
        # 28 survivors of 100k docs); EVEN families salt each word with
        # their base, giving them fully private shingle sets (the
        # distinct path — bucket STATE scales with families instead of
        # sitting at ~200 cells).  Both halves of the operator's cost
        # model are exercised: heavy collision merging AND wide state.
        salt = F.when(
            F.col("base") % 2 == 0, F.concat(F.lit("x"), F.col("base").cast("string"))
        ).otherwise(F.lit(""))
        doc_text = F.concat_ws(
            " ",
            *[
                F.concat(
                    F.element_at(
                        F.array(*[F.lit(w) for w in words]),
                        ((F.col("base") * (j + 7) + j * j) % 50 + 1).cast("int"),
                    ),
                    salt,
                )
                for j in range(30)
            ],
        )
        nd_src = os.path.join(work, "nd_docs")
        for part in range(4):
            lo, hi = part * n_docs // 4, (part + 1) * n_docs // 4
            (
                spark.range(lo, hi)
                .select(
                    F.col("id").alias("doc_id"),
                    # ~4 docs share each base -> near-dup families
                    (F.col("id") / 4).cast("long").alias("base"),
                )
                .select("doc_id", doc_text.alias("text"))
                .coalesce(1)
                .write.mode("append")
                .parquet(nd_src)
            )
        nd_schema = spark.read.parquet(nd_src).schema
        nd_stream = (
            spark.readStream.schema(nd_schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(nd_src)
        )
        claims = streaming_near_dedup_claims(nd_stream, k=8, bands=4)
        t0 = time.monotonic()
        q = (
            claims.writeStream.outputMode("append")
            .format("memory")
            .queryName("pipebench_nd")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        el = time.monotonic() - t0
        t = spark.table("pipebench_nd")
        survivors = (
            t.groupBy("doc_id")
            .agg(F.min(F.col("fresh").cast("int")).alias("af"))
            .filter("af = 1")
            .count()
        )
        results["stream_near_dedup"] = {
            "sec": round(el, 2),
            "docs": n_docs,
            "micro_batches": 4,
            "survivors": survivors,
            "docs_per_sec": round(n_docs / el),
        }

        payload = {
            "n_slots": n_slots,
            "gen_sec": round(gen_s, 1),
            "instructions": n_instructions,
            "pipelines": results,
            # measurement-health fields (round-12 verdict #4): loadavg
            # + a repo-code-free calibration canary at both ends of the
            # run, so a future reader can tell machine drift from code
            # drift INSIDE the artifact
            "loadavg_start": [round(x, 2) for x in loadavg_start],
            "loadavg_end": [round(x, 2) for x in os.getloadavg()],
            "canary_start": canary_start,
            "canary_end": _calibration_canary(),
        }
        print(json.dumps(payload))
        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        out_path = (
            sys.argv[2]
            if len(sys.argv) > 2
            else os.path.join(repo_root, "PIPEBENCH.json")
        )
        # best-of-N across sessions (same posture as bench.py --canary):
        # a loaded host can only make pipelines look SLOWER, so the
        # per-pipeline best across runs at the same n_slots is the
        # code-attributable number; the current run stays the payload
        prior_best, prior_runs = {}, 0
        if os.path.exists(out_path):
            try:
                with open(out_path) as fh:
                    prev = json.load(fh)
                if prev.get("n_slots") == n_slots:
                    prior_best = prev.get("best", {}).get("pipelines", {}) or prev.get(
                        "pipelines", {}
                    )
                    prior_runs = prev.get("best", {}).get("runs", 1)
            except Exception:
                prior_best, prior_runs = {}, 0
        best: dict[str, dict] = {}
        for name, cur in results.items():
            old = prior_best.get(name)
            best[name] = (
                cur if old is None or cur["sec"] <= old.get("sec", 1e9) else old
            )
        payload["best"] = {"runs": prior_runs + 1, "pipelines": best}
        with open(out_path, "w") as fh:
            json.dump(payload, fh, indent=1, sort_keys=True)
            fh.write("\n")
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
