"""Recall-vs-nprobe / candidate-count / numFiles measurement for the
AUTO-SIZED trained IVF-PQ (round-11 verdict #3).

For each requested scale dir (the scaling_bench synthesis layout under
--data-root), builds the stored trained index with ``n_cells=None``
(max(16, isqrt(n))) and sample-based coarse training, then for each
nprobe measures:

- recall@3 vs exact ``l2_topk`` ground truth on the pinned copy-0
  query set (skipped above --recall-max-scale, where the brute-force
  baseline's |Q|x|corpus| pair expansion stops being worth the wait);
- probe candidates: the summed population of every (query, probed
  cell) — the actual distance-work the ADC join performs — and its
  fraction of |Q|x|corpus| (the brute-force denominator);
- the stored leg's runtime scan metrics (numFiles vs staticFilesNum)
  so the DPP directory-pruning claim is measured at the auto cell
  count, not just at 16.

Writes AUTOSIZE_METRICS.json at the repo root and prints one JSON line
per (scale, nprobe).  The SCALE.md round-12 section holds the
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
from math import isqrt

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cherry_pipelines_spark.session import get_spark

KEY_OFFSET = 10**12  # scaling_bench copy-key offset


def _scan_metrics(df, col_fragments):
    """Runtime FileSourceScan metrics from the EXECUTED plan (same
    traversal as tests/test_plan_shapes.py — AQE final plans, query
    stages, DPP subqueries)."""
    plan = df._jdf.queryExecution().executedPlan()
    stack, out = [plan], []
    while stack:
        n = stack.pop()
        nm = n.getClass().getSimpleName()
        if "FileSourceScan" in nm and all(
            f in n.toString() for f in col_fragments
        ):
            m, vals = n.metrics(), {}
            it = m.iterator()
            while it.hasNext():
                kv = it.next()
                vals[kv._1()] = kv._2().value()
            out.append(vals)
        if nm == "AdaptiveSparkPlanExec":
            stack.append(n.executedPlan())
        elif nm.endswith("QueryStageExec"):
            stack.append(n.plan())
        it = n.children().iterator()
        while it.hasNext():
            stack.append(it.next())
        try:
            it = n.subqueries().iterator()
            while it.hasNext():
                stack.append(it.next())
        except Exception:
            pass
    return out


def drift_run(spark, em, label: str, fracs, nprobes) -> list[dict]:
    """Frozen-quantizer DRIFT curve (round-12 verdict #2): sweep the
    APPENDED FRACTION — the share of the corpus the frozen cells +
    codebooks never saw at train time — and measure recall@3 +
    candidate fraction per point.  Production shape exactly: the train
    subset goes through ``build_stored_ivfpq_trained_index`` (day-0
    build, auto-sized cells on what day 0 can see), the rest arrives
    via ``append_stored_ivfpq_trained_index`` with frozen metadata.
    The curve is the data behind the retrain trigger documented in
    ``similarity.append_stored_ivfpq_trained_index``."""
    from cherry_pipelines_spark.operators.clustering import assign_clusters
    from cherry_pipelines_spark.operators.similarity import (
        _trained_probe_lut,
        ann_recall,
        append_stored_ivfpq_trained_index,
        build_stored_ivfpq_trained_index,
        l2_topk,
        query_stored_ivfpq_trained_index,
    )

    n = em.count()
    queries = em.filter(
        (F.col("vec_id") % 100 == 0) & (F.col("vec_id") < KEY_OFFSET)
    )
    nq = queries.count()
    exact = l2_topk(em, queries, k=3).localCheckpoint(eager=True)
    rows = []
    for frac_pct in fracs:
        # appended = hash-tenths below the threshold (deterministic,
        # id-distribution independent); frac_pct=0 is the no-drift
        # baseline (train on everything, nothing appended)
        bucket = F.pmod(F.xxhash64("vec_id"), F.lit(10))
        appended_pred = bucket < int(round(frac_pct / 10))
        train = em.filter(~appended_pred)
        appended = em.filter(appended_pred)
        n_train = train.count()
        path = os.path.join(
            tempfile.gettempdir(),
            "cherry_drift_"
            + hashlib.sha256(f"{label}:{frac_pct}".encode()).hexdigest()[:12],
        )
        shutil.rmtree(path, ignore_errors=True)
        books, cents = build_stored_ivfpq_trained_index(
            train, path, m=8, dim=64, ksub=16, iters=2, n_cells=None,
            coarse_iters=1, coarse_sample_per_cell=64,
        )
        if n_train < n:
            append_stored_ivfpq_trained_index(
                appended, path, books, cents, m=8, dim=64
            )
        n_cells = cents.count()
        sizes = (
            assign_clusters(em, cents, "embedding", "vec_id", k_hint=n_cells)
            .groupBy("cluster_id")
            .agg(F.count("*").cast("long").alias("pop"))
            .withColumnRenamed("cluster_id", "cell")
            .localCheckpoint(eager=True)
        )
        for nprobe in nprobes:
            if nprobe > n_cells:
                continue
            lut = _trained_probe_lut(
                queries, cents, books, "embedding", "vec_id", 8, 64, nprobe
            )
            cand = (
                lut.select("query_id", "cell")
                .distinct()
                .join(sizes, "cell")
                .agg(F.sum("pop").cast("long").alias("c"))
                .collect()[0]["c"]
            )
            t0 = time.monotonic()
            res = query_stored_ivfpq_trained_index(
                spark, path, books, cents, queries, k=4, m=8, dim=64,
                nprobe=nprobe,
            ).collect()
            probe_sec = round(time.monotonic() - t0, 3)
            by_q: dict[int, list] = {}
            for r in sorted(res, key=lambda r: (r["query_id"], r["rank"])):
                if r["query_id"] != r["vec_id"]:
                    by_q.setdefault(r["query_id"], [])
                    if len(by_q[r["query_id"]]) < 3:
                        by_q[r["query_id"]].append(r["vec_id"])
            approx = spark.createDataFrame(
                [(q, v) for q, vs in by_q.items() for v in vs],
                "query_id long, neighbor_id long",
            )
            recs = [
                float(r["recall"]) for r in ann_recall(exact, approx, k=3).collect()
            ]
            rec = round(sum(recs) / len(recs), 4) if recs else None
            row = {
                "mode": "drift",
                "src": label,
                "appended_frac": frac_pct / 100,
                "n": n,
                "n_train": n_train,
                "n_cells": n_cells,
                "n_queries": nq,
                "nprobe": nprobe,
                "recall_at3": rec,
                "candidates": int(cand),
                "cand_frac": round(cand / (nq * n), 6) if nq and n else None,
                "probe_sec": probe_sec,
            }
            rows.append(row)
            print(json.dumps(row, separators=(",", ":")), flush=True)
        shutil.rmtree(path, ignore_errors=True)
    return rows


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", default="/tmp/scaling")
    ap.add_argument(
        "--corpus",
        default="family",
        choices=("family", "harness"),
        help="family: the clustered near-dup family fixture derived "
        "from an sf dir (the deployment-regime corpus the trained "
        "index is FOR); harness: the raw near-random scaling-dir "
        "embeddings (the adversarial worst case — cells carry no "
        "structure, recall is low BY CONSTRUCTION of the fixture)",
    )
    ap.add_argument(
        "--sf-dirs",
        default="/root/testdata/sf0.01,/root/testdata/sf0.1",
        help="family corpus sources (comma-separated sf dirs)",
    )
    ap.add_argument("--scales", default="1,16", help="harness scales")
    ap.add_argument("--nprobes", default="1,2,4,8")
    ap.add_argument(
        "--recall-max-n",
        type=int,
        default=200_000,
        help="largest corpus at which the exact brute-force baseline runs",
    )
    ap.add_argument("--out", default="AUTOSIZE_METRICS.json")
    ap.add_argument(
        "--drift",
        action="store_true",
        help="run ONLY the frozen-quantizer drift sweep (appended "
        "fraction 0/20/50/80%%) and merge 'drift' rows into --out, "
        "preserving the existing autosize rows",
    )
    ap.add_argument("--drift-fracs", default="0,20,50,80")
    args = ap.parse_args()

    from cherry_pipelines_spark.operators.similarity import (
        _trained_probe_lut,
        ann_recall,
        build_stored_ivfpq_trained_index,
        l2_topk,
        query_stored_ivfpq_trained_index,
    )
    from cherry_pipelines_spark.operators.clustering import assign_clusters

    spark = get_spark("autosize_metrics")
    if args.corpus == "family":
        import __spark_entry__ as entry_mod

        sources = [(d, None) for d in args.sf_dirs.split(",")]
    else:
        sources = [
            (os.path.join(args.data_root, f"x{s}"), int(s))
            for s in args.scales.split(",")
        ]
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_path = os.path.join(here, args.out)
    existing: dict = {}
    if os.path.exists(out_path):
        with open(out_path) as fh:
            existing = json.load(fh)

    if args.drift:
        import __spark_entry__ as entry_mod

        drift_rows = []
        for sf_dir, scale in sources:
            if args.corpus == "family":
                (raw,) = entry_mod._load(spark, sf_dir, "embeddings")
                em = (
                    entry_mod._family_corpus(raw)
                    .repartition(32, "vec_id")
                    .localCheckpoint(eager=True)
                )
                label = os.path.basename(sf_dir.rstrip("/"))
            else:
                em = (
                    spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
                    .select(
                        "vec_id",
                        F.col("embedding").cast("array<double>").alias("embedding"),
                    )
                    .localCheckpoint(eager=True)
                )
                label = f"x{scale}"
            drift_rows.extend(
                drift_run(
                    spark,
                    em,
                    f"{args.corpus}:{label}",
                    [int(x) for x in args.drift_fracs.split(",")],
                    [int(x) for x in args.nprobes.split(",")],
                )
            )
        # MERGE: replace only same-labeled drift rows, keep the rest
        labels = {r["src"] for r in drift_rows}
        kept = [r for r in existing.get("drift", []) if r["src"] not in labels]
        existing["drift"] = kept + drift_rows
        with open(out_path, "w") as fh:
            json.dump(existing, fh, indent=1)
            fh.write("\n")
        return 0

    rows = []
    for sf_dir, scale in sources:
        if args.corpus == "family":
            (raw,) = entry_mod._load(spark, sf_dir, "embeddings")
            # repartition BEFORE the checkpoint: a single-partition
            # corpus writes one tiny file per cell dir, and Spark's
            # cost-based DPP insertion correctly decides pruning a
            # ~22-footer table isn't worth a subquery — the realistic
            # multi-file-per-dir layout is what the 100 TB claim is
            # about, so measure that one
            em = (
                entry_mod._family_corpus(raw)
                .repartition(32, "vec_id")
                .localCheckpoint(eager=True)
            )
            label = os.path.basename(sf_dir.rstrip("/"))
        else:
            em = (
                spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
                .select(
                    "vec_id",
                    F.col("embedding").cast("array<double>").alias("embedding"),
                )
                .localCheckpoint(eager=True)
            )
            label = f"x{scale}"
        n = em.count()
        n_cells = max(16, isqrt(n))
        # The query batch stays a FILTER over the corpus, not a
        # checkpoint: Spark only inserts a dynamic-partition-pruning
        # subquery when the probe side carries a plan-visible
        # selective predicate (PartitionPruning's isLikelySelective
        # heuristic) — a pre-materialized query frame has no Filter
        # node and silently defeats DPP (measured: same build, same
        # session — filter query dpp=True, checkpointed/LocalRelation
        # query dpp=False).
        queries = em.filter(
            (F.col("vec_id") % 100 == 0) & (F.col("vec_id") < KEY_OFFSET)
        )
        nq = queries.count()
        path = os.path.join(
            tempfile.gettempdir(),
            "cherry_autosize_"
            + hashlib.sha256(f"{sf_dir}:{scale}".encode()).hexdigest()[:12],
        )
        shutil.rmtree(path, ignore_errors=True)
        t0 = time.monotonic()
        books, cents = build_stored_ivfpq_trained_index(
            em, path, m=8, dim=64, ksub=16, iters=2, n_cells=None,
            coarse_iters=1, coarse_sample_per_cell=64,
        )
        build_sec = round(time.monotonic() - t0, 3)
        # per-cell population for the candidate count
        sizes = (
            assign_clusters(em, cents, "embedding", "vec_id", k_hint=n_cells)
            .groupBy("cluster_id")
            .agg(F.count("*").cast("long").alias("pop"))
            .withColumnRenamed("cluster_id", "cell")
            .localCheckpoint(eager=True)
        )
        exact = None
        if n <= args.recall_max_n:
            exact = l2_topk(em, queries, k=3).localCheckpoint(eager=True)
        for nprobe in [int(x) for x in args.nprobes.split(",")]:
            if nprobe > n_cells:
                continue
            lut = _trained_probe_lut(
                queries, cents, books, "embedding", "vec_id", 8, 64, nprobe
            )
            cand = (
                lut.select("query_id", "cell")
                .distinct()
                .join(sizes, "cell")
                .agg(F.sum("pop").cast("long").alias("c"))
                .collect()[0]["c"]
            )
            # k=4 so that dropping the self row still leaves a full
            # top-3 per query (exclude-self parity with l2_topk)
            t0 = time.monotonic()
            out = query_stored_ivfpq_trained_index(
                spark, path, books, cents, queries, k=4, m=8, dim=64,
                nprobe=nprobe,
            )
            res = out.collect()
            probe_sec = round(time.monotonic() - t0, 3)
            sm = _scan_metrics(out, ("code#", "cell#"))
            m0 = sm[0] if sm else {}
            rec = None
            if exact is not None:
                by_q: dict[int, list] = {}
                for r in sorted(res, key=lambda r: (r["query_id"], r["rank"])):
                    if r["query_id"] != r["vec_id"]:
                        by_q.setdefault(r["query_id"], [])
                        if len(by_q[r["query_id"]]) < 3:
                            by_q[r["query_id"]].append(r["vec_id"])
                approx = spark.createDataFrame(
                    [(q, v) for q, vs in by_q.items() for v in vs],
                    "query_id long, neighbor_id long",
                )
                recs = [
                    float(r["recall"])
                    for r in ann_recall(exact, approx, k=3).collect()
                ]
                rec = round(sum(recs) / len(recs), 4) if recs else None
            row = {
                "corpus": args.corpus,
                "src": label,
                "n": n,
                "n_cells": n_cells,
                "n_queries": nq,
                "nprobe": nprobe,
                "recall_at3": rec,
                "candidates": int(cand),
                "cand_frac": round(cand / (nq * n), 6) if nq and n else None,
                "batch_numFiles": m0.get("numFiles"),
                "batch_staticFilesNum": m0.get("staticFilesNum"),
                "probe_sec": probe_sec,
                "build_sec": build_sec,
            }
            rows.append(row)
            print(json.dumps(row, separators=(",", ":")), flush=True)

        # DPP gate at the auto cell count: a SINGLE query's nprobe=1
        # probe must directory-prune.  (A 20+-query batch legitimately
        # probes most cells — its union of dirs is the correct read
        # set, and Spark may even skip inserting DPP when the estimated
        # benefit is low — so pruning is a per-query/low-fanout claim,
        # measured as such.)
        first_qid = queries.agg(F.min("vec_id")).collect()[0][0]
        # equality filter over the corpus — the plan-visible selective
        # predicate DPP's insertion heuristic requires (see above)
        one_q = em.filter(F.col("vec_id") == first_qid)
        out1 = query_stored_ivfpq_trained_index(
            spark, path, books, cents, one_q, k=3, m=8, dim=64, nprobe=1
        )
        out1.collect()
        sm1 = _scan_metrics(out1, ("code#", "cell#"))
        m1 = sm1[0] if sm1 else {}
        dpp_row = {
            "corpus": args.corpus,
            "src": label,
            "n": n,
            "n_cells": n_cells,
            "single_query_numFiles": m1.get("numFiles"),
            "single_query_staticFilesNum": m1.get("staticFilesNum"),
            "dpp": "dynamicpruning"
            in out1._jdf.queryExecution().executedPlan().toString().lower(),
        }
        rows.append(dpp_row)
        print(json.dumps(dpp_row, separators=(",", ":")), flush=True)
        shutil.rmtree(path, ignore_errors=True)
    existing["rows"] = rows  # merge: never clobber the drift rows
    with open(out_path, "w") as fh:
        json.dump(existing, fh, indent=1)
        fh.write("\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
