"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"<name>": sec, ...}, "sf": <sf>}

Each query is forced to full materialization with the noop sink (no
driver-side collection skew).  The set covers every operator family:
scans+aggs, multi-joins, window/adjacency, decode UDFs, dedup,
similarity, text analysis.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod
from cherry_pipelines_spark.session import get_spark

BENCH_QUERIES = [
    "pricing_summary",
    "topk_revenue",
    "local_supplier_volume",
    "left_join_null",
    "positional_adjacency",
    "trailing_window",
    "union_typed_null",
    "window_rownum_topk",
    "evm_decode",
    "borsh_decode",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "similarity_ivf_topk",
    "text_langid",
    "text_quality",
    "token_stats",
    "fingerprint",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    spark = get_spark("cherry_bench")
    qs = entry_mod.queries()

    # warm up the JVM / file listing with one tiny action (not timed)
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        df = qs[name](spark, sf_dir)
        t0 = time.monotonic()
        df.write.mode("overwrite").format("noop").save()
        timings[name] = round(time.monotonic() - t0, 3)
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total wall seconds, 18 headline queries (noop sink)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    main()
