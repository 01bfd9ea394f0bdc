"""Measure the incremental-append cost claim directly: appending a
FIXED-SIZE batch to a stored trained IVF-PQ index must cost O(|batch|)
— flat as the BASE corpus grows — while the day-0 build grows linearly
with the corpus.  (The scaling ladder can't show this: it times whole
queries, and the O(n) build dominates.)

For each harness scale: build the index from the scaled corpus minus a
pinned copy-0 batch (the same ~400 vectors at every scale), time the
frozen-metadata append of that batch, and time an nprobe=1 probe.
Writes APPEND_COST.json; the SCALE.md round-12 section holds the
interpreted table.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cherry_pipelines_spark.session import get_spark

KEY_OFFSET = 10**12  # scaling_bench copy-key offset


def many_appends_run(spark, sf_dir: str, n_appends: int) -> dict:
    """The compaction half of the lifecycle claim (round-12 verdict #1):
    after ``n_appends`` small frozen-metadata appends, files-per-cell is
    ~``n_appends`` and the DPP-pruned probe pays per-file open cost on
    every file of every probed dir; ``compact_stored_index`` must
    restore probe time AND leave results bit-identical.  Returns one
    artifact row with files-per-cell + probe seconds before/after and
    the parity verdict."""
    from cherry_pipelines_spark.operators.similarity import (
        append_stored_ivfpq_trained_index,
        build_stored_ivfpq_trained_index,
        compact_stored_index,
        query_stored_ivfpq_trained_index,
    )

    em = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    is_batch = F.col("vec_id") % 5 == 4
    base, batch = em.filter(~is_batch), em.filter(is_batch)
    path = os.path.join(
        tempfile.gettempdir(),
        "cherry_macompact_" + hashlib.sha256(sf_dir.encode()).hexdigest()[:12],
    )
    shutil.rmtree(path, ignore_errors=True)
    books, cents = build_stored_ivfpq_trained_index(
        base, path, m=8, dim=64, ksub=16, iters=2, n_cells=16, coarse_iters=1
    )
    # n_appends batches of ~|batch|/n each — hash-split so every append
    # touches most cells (the worst-case file-count growth pattern)
    for i in range(n_appends):
        append_stored_ivfpq_trained_index(
            batch.filter(F.pmod(F.xxhash64("vec_id"), F.lit(n_appends)) == i),
            path, books, cents, m=8, dim=64,
        )

    def files_per_cell() -> dict[str, int]:
        return {
            d: sum(f.endswith(".parquet") for f in os.listdir(os.path.join(path, d)))
            for d in os.listdir(path)
            if d.startswith("cell=")
        }

    def probe():
        # fresh query plan per timing; best-of-2 to shed codegen warmup
        qs = em.filter((F.col("vec_id") % 100 == 0) & (F.col("vec_id") < KEY_OFFSET))
        best, res = float("inf"), None
        for _ in range(2):
            t0 = time.monotonic()
            r = query_stored_ivfpq_trained_index(
                spark, path, books, cents, qs, k=3, m=8, dim=64, nprobe=1
            ).collect()
            best, res = min(best, time.monotonic() - t0), r
        return best, sorted(map(tuple, res))

    fpc_before = files_per_cell()
    probe_before_sec, res_before = probe()
    t0 = time.monotonic()
    report = compact_stored_index(spark, path)
    compact_sec = round(time.monotonic() - t0, 3)
    fpc_after = files_per_cell()
    probe_after_sec, res_after = probe()
    shutil.rmtree(path, ignore_errors=True)
    return {
        "sf_dir": sf_dir,
        "n_appends": n_appends,
        "files_per_cell_before": max(fpc_before.values()),
        "files_per_cell_after": max(fpc_after.values()),
        "files_total_before": report.files_before,
        "files_total_after": report.files_after,
        "partitions_compacted": report.partitions_compacted,
        "probe_before_sec": round(probe_before_sec, 3),
        "probe_after_sec": round(probe_after_sec, 3),
        "compact_sec": compact_sec,
        "probe_bit_identical": res_before == res_after,
        "probe_rows": len(res_after),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", default="/tmp/scaling")
    ap.add_argument("--scales", default="4,16,64,256")
    ap.add_argument("--out", default="APPEND_COST.json")
    ap.add_argument(
        "--many-appends", type=int, default=0,
        help="run ONLY the compaction ladder: N appends then compact, "
        "at --ma-scale; merges a 'many_appends' row into --out",
    )
    ap.add_argument("--ma-scale", type=int, default=64)
    args = ap.parse_args()

    from cherry_pipelines_spark.operators.similarity import (
        append_stored_ivfpq_trained_index,
        build_stored_ivfpq_trained_index,
        query_stored_ivfpq_trained_index,
    )

    spark = get_spark("append_cost")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_path = os.path.join(here, args.out)
    existing: dict = {}
    if os.path.exists(out_path):
        with open(out_path) as fh:
            existing = json.load(fh)

    if args.many_appends:
        row = many_appends_run(
            spark,
            os.path.join(args.data_root, f"x{args.ma_scale}"),
            args.many_appends,
        )
        print(json.dumps(row, separators=(",", ":")), flush=True)
        # MERGE into the artifact (same-mode rows keyed by (sf_dir, n));
        # never clobber the append-cost rows
        ma = [
            r
            for r in existing.get("many_appends", [])
            if (r["sf_dir"], r["n_appends"]) != (row["sf_dir"], row["n_appends"])
        ] + [row]
        existing["many_appends"] = sorted(
            ma, key=lambda r: (r["sf_dir"], r["n_appends"])
        )
        with open(out_path, "w") as fh:
            json.dump(existing, fh, indent=1)
            fh.write("\n")
        return 0

    rows = []
    for scale in [int(s) for s in args.scales.split(",")]:
        sf_dir = os.path.join(args.data_root, f"x{scale}")
        em = spark.read.parquet(
            os.path.join(sf_dir, "embeddings.parquet")
        ).select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        )
        # the batch is the SAME ~20% of copy-0 at every scale — pinned
        # size, so a flat append_sec curve is the O(|batch|) claim
        is_batch = (F.col("vec_id") < KEY_OFFSET) & (F.col("vec_id") % 5 == 4)
        base, batch = em.filter(~is_batch), em.filter(is_batch)
        n_base, n_batch = base.count(), batch.count()
        path = os.path.join(
            tempfile.gettempdir(),
            "cherry_appcost_"
            + hashlib.sha256(f"{sf_dir}".encode()).hexdigest()[:12],
        )
        shutil.rmtree(path, ignore_errors=True)
        t0 = time.monotonic()
        books, cents = build_stored_ivfpq_trained_index(
            base, path, m=8, dim=64, ksub=16, iters=2, n_cells=16,
            coarse_iters=1,
        )
        build_sec = round(time.monotonic() - t0, 3)
        # best-of-2: the first append pays one-off stage-codegen costs
        # that would read as super-constant growth
        append_secs = []
        for i in range(2):
            if i:
                shutil.rmtree(path + "_probe2", ignore_errors=True)
                target = path + "_probe2"
                shutil.copytree(path, target)
            else:
                target = path
            t0 = time.monotonic()
            append_stored_ivfpq_trained_index(
                batch, target, books, cents, m=8, dim=64
            )
            append_secs.append(time.monotonic() - t0)
        append_sec = round(min(append_secs), 3)
        t0 = time.monotonic()
        res = query_stored_ivfpq_trained_index(
            spark, path, books, cents,
            em.filter((F.col("vec_id") % 100 == 0) & (F.col("vec_id") < KEY_OFFSET)),
            k=3, m=8, dim=64, nprobe=1,
        ).collect()
        probe_sec = round(time.monotonic() - t0, 3)
        row = {
            "scale": scale,
            "n_base": n_base,
            "n_batch": n_batch,
            "build_sec": build_sec,
            "append_sec": append_sec,
            "probe_sec": probe_sec,
            "probe_rows": len(res),
        }
        rows.append(row)
        print(json.dumps(row, separators=(",", ":")), flush=True)
        shutil.rmtree(path, ignore_errors=True)
        shutil.rmtree(path + "_probe2", ignore_errors=True)
    existing["rows"] = rows
    with open(out_path, "w") as fh:
        json.dump(existing, fh, indent=1)
        fh.write("\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
