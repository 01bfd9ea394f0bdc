"""Small-file compaction for partitioned parquet sinks.

The incremental batch loop (engine/pipeline.py, swap_prices.run) writes
one ``_batch_start=N`` partition per block-range batch — correct for
idempotent replay, but at 100 TB the tail of a long-running pipeline is
millions of small files, and small files are the classic scan killer
(per-file open cost, tiny row groups, starved vectorized readers).

``compact_partitions`` is the maintenance job: per partition directory,
if the data is spread over more files than its byte size warrants,
rewrite that partition to ``ceil(bytes / target_file_bytes)`` files.
Partition values (and therefore replay granularity and the checkpoint
watermark) are preserved — only the file layout inside each partition
changes.

Job shape (round-14): partitions whose target is ONE file — the
overwhelmingly common case, and all of a fresh append swamp — are
rewritten by a SINGLE Spark job: one multi-directory scan (partition
columns recovered via ``basePath``), one hash exchange on the
partition keys (each partition's rows land wholly in one task), one
dynamic-``partitionBy`` write into a hidden staging dir under the
table root, then per-partition atomic rename swaps.  The previous
shape issued one read→coalesce→write job PER partition (threaded), so
a 16-cell index compaction was 32 driver-sequenced jobs of ~0.15 s
scheduling latency each — at a million-partition table that job chain,
not the data, is the cost (guide §2.4/§6).  Partitions that need
MULTIPLE output files (bytes > target) keep the per-partition
coalesce path — their rewrite is data-bound, not latency-bound.

Portability: listing, sizing, and the atomic directory swap go through
the Hadoop FileSystem API (works on local fs, HDFS, S3A — wherever the
table lives), not ``os`` calls.  Each partition is rewritten into a
staging dir and swapped in with two renames, so a crash leaves either
the old layout, a stale temp dir (cleaned on the next run), or the new
layout — never a half-written partition in place.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import SparkSession

_TMP_SUFFIX = "._compact_tmp"
_OLD_SUFFIX = "._compact_old"
# hidden (leading dot ⇒ invisible to parquet readers) single-job
# staging dir under the table root; ends with _TMP_SUFFIX so a crashed
# run's leftover is swept by the next run's walk like any stale temp
_BULK_STAGING = ".bulk" + _TMP_SUFFIX


def _fs_for(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return jvm, fs, hpath


@dataclass
class CompactionReport:
    partitions_seen: int
    partitions_compacted: int
    files_before: int
    files_after: int


def _parquet_files(fs, d):
    return [
        f
        for f in fs.listStatus(d)
        if f.isFile() and f.getPath().getName().endswith(".parquet")
    ]


def _swap_in(fs, Path, part_dir, new_dir) -> None:
    """Atomically replace ``part_dir``'s contents with ``new_dir`` via
    the two-rename protocol (old layout | stale temp | new layout —
    never a torn partition)."""
    part_str = part_dir.toString()
    old = Path(part_str + _OLD_SUFFIX)
    if not fs.rename(part_dir, old):
        raise IOError(f"compaction swap failed for {part_str}")
    if not fs.rename(new_dir, part_dir):
        fs.rename(old, part_dir)  # roll back
        raise IOError(f"compaction swap-in failed for {part_str}")
    fs.delete(old, True)


def compact_partitions(
    spark: SparkSession,
    table_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files: int = 2,
) -> CompactionReport:
    """Compact every LEAF ``key=value`` partition directory under
    ``table_path`` (nested chains like ``c0=…/c1=…`` are walked to
    their leaves; a flat layout's dirs are their own leaves) whose
    parquet files outnumber ``ceil(partition_bytes / target_file_bytes)``.

    Returns a :class:`CompactionReport`; idempotent (a second run is a
    no-op) and safe to run while readers are active on filesystems with
    atomic rename (local/HDFS; on S3 schedule it against a quiescent
    table).
    """
    jvm, fs, root = _fs_for(spark, table_path)
    Path = jvm.org.apache.hadoop.fs.Path
    if not fs.exists(root):
        return CompactionReport(0, 0, 0, 0)

    # Walk down NESTED key=value partition chains (e.g. the lattice
    # index's c0=…/c1=… two-level layout) and compact the LEAF dirs —
    # the ones that actually hold parquet files.  A single-level
    # layout's dirs are their own leaves, so the flat behavior is
    # unchanged.
    leaf_dirs = []
    stack = [(root, True)]
    while stack:
        d, is_root = stack.pop()
        has_kv_child = False
        for st in fs.listStatus(d):
            name = st.getPath().getName()
            if not st.isDirectory():
                continue
            if name.endswith(_TMP_SUFFIX) or name.endswith(_OLD_SUFFIX):
                fs.delete(st.getPath(), True)  # leftover from a crashed run
                continue
            if "=" not in name:
                continue
            has_kv_child = True
            stack.append((st.getPath(), False))
        if not is_root and not has_kv_child:
            leaf_dirs.append(d)

    seen = len(leaf_dirs)
    compacted = files_before_total = files_after_total = 0

    # Size every leaf ONCE on the driver and split the rewrites:
    #   bulk      — target is 1 file: rewritten together in ONE job
    #   per_dir   — target > 1 file: per-partition coalesce (data-bound)
    # leaf paths from listStatus come back fully qualified
    # (``file:/…``); qualify root the same way so rel-path slicing and
    # staging-path construction line up on any filesystem
    root_str = fs.makeQualified(root).toString().rstrip("/")
    bulk: list[tuple] = []  # (part_dir, rel_path, part_keys, n_files)
    per_dir: list[tuple] = []  # (part_dir, n_files, n_target)
    for d in leaf_dirs:
        files = _parquet_files(fs, d)
        n_files = len(files)
        size = sum(f.getLen() for f in files)
        n_target = max(1, math.ceil(size / target_file_bytes))
        if n_files < min_files or n_files <= n_target:
            files_before_total += n_files
            files_after_total += n_files
            continue
        if n_target == 1:
            rel = d.toString()[len(root_str) :].strip("/")
            keys = [seg.split("=", 1)[0] for seg in rel.split("/")]
            bulk.append((d, rel, tuple(keys), n_files))
        else:
            per_dir.append((d, n_files, n_target))

    # all bulk dirs must agree on the partition-key chain for one
    # partitionBy write; stragglers (shouldn't happen in practice)
    # take the per-dir path
    if bulk:
        key_seq = bulk[0][2]
        mismatched = [b for b in bulk if b[2] != key_seq]
        bulk = [b for b in bulk if b[2] == key_seq]
        per_dir.extend((b[0], b[3], 1) for b in mismatched)

    if bulk:
        staging = Path(root_str + "/" + _BULK_STAGING)
        if fs.exists(staging):
            fs.delete(staging, True)
        key_seq = bulk[0][2]
        infer_key = "spark.sql.sources.partitionColumnTypeInference.enabled"
        infer_prev = spark.conf.get(infer_key, "true")
        # partition values as VERBATIM strings: inference-off makes the
        # read→partitionBy round trip reproduce every dir name exactly
        # (no int/date re-formatting ambiguity)
        spark.conf.set(infer_key, "false")
        try:
            df = (
                spark.read.option("basePath", root_str)
                .parquet(*[b[0].toString() for b in bulk])
            )
            # one exchange on the partition keys: each partition's rows
            # land wholly in one task ⇒ exactly one output file per dir
            (
                df.repartition(*[k for k in key_seq])
                .write.partitionBy(*key_seq)
                .parquet(staging.toString())
            )
        finally:
            spark.conf.set(infer_key, infer_prev)
        for d, rel, _keys, n_files in bulk:
            new_dir = Path(staging.toString() + "/" + rel)
            if not fs.exists(new_dir):
                # no rows materialized for this dir (e.g. all-empty
                # files) — leave it for the per-dir path
                per_dir.append((d, n_files, 1))
                continue
            written = len(_parquet_files(fs, new_dir))
            _swap_in(fs, Path, d, new_dir)
            files_before_total += n_files
            files_after_total += written
            compacted += 1
        fs.delete(staging, True)

    # Partition rewrites needing multiple output files are independent
    # (each swaps behind its own rename pair), so they run CONCURRENTLY
    # from a thread pool: each rewrite is a read→coalesce→write Spark
    # job whose wall time at small sizes is dominated by per-job
    # scheduling latency; overlapping them keeps the scheduler busy and
    # bounds the wall time near the slowest single partition.  Crash
    # semantics are unchanged — per-partition atomicity never depended
    # on ordering.
    def _compact_one(entry) -> tuple[int, int]:
        part_dir, n_files, n_target = entry
        # rewrite this partition at the target file count: coalesce is
        # a NARROW merge (no shuffle — guide §2.4); the scan plans at
        # most one partition per file, so coalesce(n_target) always
        # reaches the target when it matters (n_files > n_target)
        part_str = part_dir.toString()
        tmp = Path(part_str + _TMP_SUFFIX)
        (
            spark.read.parquet(part_str)
            .coalesce(n_target)
            .write.mode("overwrite")
            .parquet(tmp.toString())
        )
        written = len(_parquet_files(fs, tmp))
        _swap_in(fs, Path, part_dir, tmp)
        return n_files, written

    if per_dir:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(16, len(per_dir))) as pool:
            for before_n, after_n in pool.map(_compact_one, per_dir):
                files_before_total += before_n
                files_after_total += after_n
                compacted += 1
    return CompactionReport(seen, compacted, files_before_total, files_after_total)
