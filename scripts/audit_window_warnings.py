"""Count ``WindowExec: No Partition Defined`` warnings per registry
query: runs every ``queries()`` entry at sf0.001 with driver stderr
redirected to a file and attributes each warning to the query that was
executing when it was emitted (byte-offset bookkeeping).

Usage: python scripts/audit_window_warnings.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

NEEDLE = b"No Partition Defined for Window operation"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    log_path = "/tmp/window_warn_audit.stderr"
    log_fd = os.open(log_path, os.O_WRONLY | os.O_CREAT | os.O_TRUNC)
    os.dup2(log_fd, 2)  # JVM inherits fd 2 at session launch

    import __spark_entry__ as entry_mod
    from cherry_pipelines_spark.session import get_spark

    spark = get_spark("warn_audit")
    qs = entry_mod.queries()
    results = {}
    with open(log_path, "rb") as log:
        log.seek(0, os.SEEK_END)
        for name, fn in qs.items():
            if only and name not in only:
                continue
            start = log.tell()
            try:
                fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            except Exception as ex:  # noqa: BLE001
                print(f"{name}: ERROR {type(ex).__name__}: {ex}", flush=True)
            log.seek(0, os.SEEK_END)
            log.seek(start)
            n = log.read().count(NEEDLE)
            if n:
                results[name] = n
                print(f"{name}: {n} unpartitioned-window warning(s)", flush=True)
            spark.catalog.clearCache()
    total = sum(results.values())
    print(f"\nTOTAL: {total} warnings across {len(results)} queries", flush=True)
    return 1 if total else 0


if __name__ == "__main__":
    raise SystemExit(main())
