"""Stamp the live registry size into every ``<!--NQ-->N<!--/NQ-->``
marker in the docs, so README/SCALE/COVERAGE counts can never drift
from ``len(queries())`` again (the class of failure behind the round-5
pytest red).  ``tests/test_coverage_complete.py`` asserts the stamped
values match; run this script after adding/removing registry queries.

Usage: python scripts/sync_docs.py
"""

from __future__ import annotations

import os
import re
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

DOCS = ["README.md", "SCALE.md", "COVERAGE.md", "SURVEY.md"]
_MARKER = re.compile(r"<!--NQ-->\d+<!--/NQ-->")


def main() -> int:
    import __spark_entry__ as entry_mod

    n = len(entry_mod.queries())
    stamp = f"<!--NQ-->{n}<!--/NQ-->"
    changed = 0
    for doc in DOCS:
        path = os.path.join(_ROOT, doc)
        if not os.path.exists(path):
            continue
        with open(path) as f:
            text = f.read()
        new = _MARKER.sub(stamp, text)
        if new != text:
            with open(path, "w") as f:
                f.write(new)
            changed += 1
            print(f"stamped {doc} -> {n}")
    print(f"registry={n}, {changed} doc(s) updated")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
