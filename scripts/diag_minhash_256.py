"""Stage-by-stage diagnosis of the 256x dedup_minhash_lsh curve
(SCALING_DEEP.json norm_hi 2.55, round-8 open finding).

Builds the same x64/x256 scaled inputs as scaling_bench.py, then times
and counts each stage of minhash_lsh_candidates independently:

  scan      -> input partitions + bytes (under-parallel Python stage?)
  sig       -> map-only signature producer (mapInPandas cost)
  banded    -> band-row explode
  buckets   -> (band,key) groupBy + bucket-size histogram (skew?)
  pairs     -> pre-distinct pair count (pair fan-out?)
  distinct  -> final pipeline (the measured number)

Run:  python scripts/diag_minhash_256.py [--scales 64,256]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="64,256")
    ap.add_argument("--data-root", default="/tmp/scaling")
    ap.add_argument(
        "--sf-src",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()
    scales = sorted({int(s) for s in args.scales.split(",")})

    from scripts.scaling_bench import _build_scale_dir  # noqa: E402
    from cherry_pipelines_spark.session import get_spark
    from cherry_pipelines_spark.operators.dedup import (
        minhash_signatures,
        _banded_from_sig,
        _pairs_from_banded,
    )

    spark = get_spark("diag_minhash", wide_shuffles=True)
    report: dict[str, dict] = {}
    for k in scales:
        d = _build_scale_dir(spark, args.sf_src, args.data_root, k)
        path = os.path.join(d, "documents.parquet")
        docs = spark.read.parquet(path)
        nbytes = sum(
            os.path.getsize(os.path.join(path, f))
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
        row: dict = {"files_mb": round(nbytes / 1e6, 1)}
        row["scan_partitions"] = docs.rdd.getNumPartitions()

        def t(name, fn):
            spark.catalog.clearCache()
            t0 = time.monotonic()
            out = fn()
            row[name] = {"sec": round(time.monotonic() - t0, 2), "out": out}
            print(f"x{k} {name}: {row[name]}", flush=True)

        sig = minhash_signatures(docs, k=8)
        t("sig_count", lambda: sig.count())
        banded = _banded_from_sig(sig, 8, 4)
        t("banded_count", lambda: banded.count())

        def bucket_stats():
            b = (
                banded.groupBy("band", "key")
                .agg(F.count("*").alias("n"))
                .filter(F.col("n") > 1)
            )
            r = b.agg(
                F.count("*").alias("buckets"),
                F.max("n").alias("max_bucket"),
                F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("pair_fanout"),
            ).collect()[0]
            return {
                "buckets": r["buckets"],
                "max_bucket": r["max_bucket"],
                "pair_fanout": int(r["pair_fanout"] or 0),
            }

        t("buckets", bucket_stats)
        pairs = _pairs_from_banded(banded, 10_000)
        t("pairs_distinct_count", lambda: pairs.count())

        def full():
            from cherry_pipelines_spark.operators.dedup import (
                minhash_lsh_candidates,
            )

            minhash_lsh_candidates(docs, k=8, bands=4).write.mode(
                "overwrite"
            ).format("noop").save()
            return None

        t("full_pipeline", full)
        report[f"x{k}"] = row

    print(json.dumps(report, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
