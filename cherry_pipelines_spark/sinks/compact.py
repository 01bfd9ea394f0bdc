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

Portability: listing, sizing, and the atomic directory swap go through
the Hadoop FileSystem API (works on local fs, HDFS, S3A — wherever the
table lives), not ``os`` calls.  Each partition is rewritten into a
sibling temp dir and swapped in with two renames, so a crash leaves
either the old layout, a stale temp dir (cleaned on the next run), or
the new layout — never a half-written partition in place.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import SparkSession

_TMP_SUFFIX = "._compact_tmp"
_OLD_SUFFIX = "._compact_old"


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
    seen = compacted = files_before_total = files_after_total = 0
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

    # Partition rewrites are independent (each swaps behind its own
    # rename pair), so they run CONCURRENTLY from a thread pool: each
    # rewrite is a tiny read→coalesce→write Spark job whose wall time
    # is dominated by per-job scheduling latency, and a serial
    # driver loop pays that latency once per partition (a
    # 16-cell index compaction was ~16 sequential sub-second jobs).
    # Overlapping them keeps the scheduler busy and bounds the wall
    # time near the slowest single partition.  Crash semantics are
    # unchanged — per-partition atomicity never depended on ordering.
    def _compact_one(part_dir) -> tuple[int, int, bool]:
        """Returns (files_before, files_after, rewrote)."""
        files = [
            f
            for f in fs.listStatus(part_dir)
            if f.isFile() and f.getPath().getName().endswith(".parquet")
        ]
        n_files = len(files)
        size = sum(f.getLen() for f in files)
        n_target = max(1, math.ceil(size / target_file_bytes))
        if n_files < min_files or n_files <= n_target:
            return n_files, n_files, False
        # rewrite this partition at the target file count: coalesce is
        # a NARROW merge (no shuffle — guide §2.4); the scan plans at
        # most one partition per file, so coalesce(n_target) always
        # reaches the target when it matters (n_files > n_target)
        part_str = part_dir.toString()
        tmp = Path(part_str + _TMP_SUFFIX)
        old = Path(part_str + _OLD_SUFFIX)
        (
            spark.read.parquet(part_str)
            .coalesce(n_target)
            .write.mode("overwrite")
            .parquet(tmp.toString())
        )
        written = sum(
            1
            for f in fs.listStatus(tmp)
            if f.isFile() and f.getPath().getName().endswith(".parquet")
        )
        if not fs.rename(part_dir, old):
            raise IOError(f"compaction swap failed for {part_str}")
        if not fs.rename(tmp, part_dir):
            fs.rename(old, part_dir)  # roll back
            raise IOError(f"compaction swap-in failed for {part_str}")
        fs.delete(old, True)
        return n_files, written, True

    from concurrent.futures import ThreadPoolExecutor

    seen = len(leaf_dirs)
    if leaf_dirs:
        with ThreadPoolExecutor(
            max_workers=min(16, len(leaf_dirs))
        ) as pool:
            for before_n, after_n, rewrote in pool.map(
                _compact_one, leaf_dirs
            ):
                files_before_total += before_n
                files_after_total += after_n
                compacted += int(rewrote)
    return CompactionReport(seen, compacted, files_before_total, files_after_total)
