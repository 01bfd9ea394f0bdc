"""Driver output-convention guard: no registry query may emit a
binary / array / map / struct-typed column.

The driver's correctness comparator canonicalizes results through a
pandas sort + factorize, which crashes on unhashable cell values
(``bytearray`` from BinaryType, ``list`` from ArrayType) — the round-5
``swap_prices_chain`` RED row.  The repo convention is: binary columns
go out as lowercase hex strings, nested values as JSON strings.  This
test builds every query's plan at sf0.001 and fails on any output
column whose (possibly nested) type contains a non-comparator-safe
leaf, so the failure class cannot recur.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

import __spark_entry__ as entry_mod

_BANNED = (T.BinaryType, T.ArrayType, T.MapType, T.StructType)


def _bad_fields(schema: T.StructType) -> list[str]:
    return [
        f"{f.name}: {f.dataType.simpleString()}"
        for f in schema.fields
        if isinstance(f.dataType, _BANNED)
    ]


@pytest.mark.parametrize("name", sorted(entry_mod.queries()))
def test_query_output_is_comparator_safe(spark, sf_dir, name):
    df = entry_mod.queries()[name](spark, sf_dir)
    bad = _bad_fields(df.schema)
    assert not bad, (
        f"{name} emits comparator-unsafe output columns {bad}; "
        "hex-encode binary and JSON-encode nested values"
    )
