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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", default="/tmp/scaling")
    ap.add_argument("--scales", default="4,16,64,256")
    ap.add_argument("--out", default="APPEND_COST.json")
    args = ap.parse_args()

    from cherry_pipelines_spark.operators.similarity import (
        append_stored_ivfpq_trained_index,
        build_stored_ivfpq_trained_index,
        query_stored_ivfpq_trained_index,
    )

    spark = get_spark("append_cost")
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
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, args.out), "w") as fh:
        json.dump({"rows": rows}, fh, indent=1)
        fh.write("\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
