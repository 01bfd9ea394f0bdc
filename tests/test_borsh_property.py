"""Property-based roundtrip tests for the borsh decoder: generate a
random DynType tree and a random value of that type, encode it with an
independent test-side borsh writer, decode through
``decode_instruction_data``, and compare against the expected Spark-side
representation (incl. the U64/U128 overflow→NULL policy).

No Spark session needed — the decode kernel is a pure function; the
Spark plumbing around it is covered in test_decode_svm.py.
"""

from __future__ import annotations

from decimal import Decimal

from hypothesis import given, settings
from hypothesis import strategies as st

from cherry_pipelines_spark.functions import borsh as B

_DEC38_MAX = 10**38 - 1
_I64_MAX = 2**63 - 1

_INT_RANGES = {
    B.U8: (0, 2**8 - 1),
    B.U16: (0, 2**16 - 1),
    B.U32: (0, 2**32 - 1),
    B.U64: (0, 2**64 - 1),
    B.U128: (0, 2**128 - 1),
    B.I8: (-(2**7), 2**7 - 1),
    B.I16: (-(2**15), 2**15 - 1),
    B.I32: (-(2**31), 2**31 - 1),
    B.I64: (-(2**63), 2**63 - 1),
    B.I128: (-(2**127), 2**127 - 1),
}


def dyn_types(depth: int = 2) -> st.SearchStrategy[B.DynType]:
    scalars = st.sampled_from(
        [B.U8(), B.U16(), B.U32(), B.U64(), B.U128(),
         B.I8(), B.I16(), B.I32(), B.I64(), B.I128(), B.Bool(),
         B.Enum(("a", "b", "c"))]
    )
    if depth == 0:
        return scalars
    inner = dyn_types(depth - 1)
    return st.one_of(
        scalars,
        inner.map(B.Option),
        st.tuples(inner, st.integers(0, 4)).map(lambda t: B.FixedArray(*t)),
        inner.map(B.Array),
        st.lists(inner, min_size=1, max_size=3).map(
            lambda ts: B.Struct(tuple((f"f{i}", t) for i, t in enumerate(ts)))
        ),
    )


def values_for(t: B.DynType) -> st.SearchStrategy:
    spec = _INT_RANGES.get(type(t))
    if spec is not None:
        return st.integers(spec[0], spec[1])
    if isinstance(t, B.Bool):
        return st.booleans()
    if isinstance(t, B.Enum):
        return st.integers(0, len(t.variants) - 1)
    if isinstance(t, B.Option):
        return st.none() | values_for(t.inner)
    if isinstance(t, B.FixedArray):
        return st.lists(values_for(t.inner), min_size=t.size, max_size=t.size)
    if isinstance(t, B.Array):
        return st.lists(values_for(t.inner), min_size=0, max_size=4)
    if isinstance(t, B.Struct):
        return st.tuples(*[values_for(ft) for _, ft in t.fields])
    raise AssertionError(t)


def encode(t: B.DynType, v) -> bytes:
    spec = B._INT_SPEC.get(type(t))
    if spec is not None:
        n, signed = spec
        return int(v).to_bytes(n, "little", signed=signed)
    if isinstance(t, B.Bool):
        return b"\x01" if v else b"\x00"
    if isinstance(t, B.Enum):
        return bytes([v])
    if isinstance(t, B.Option):
        return b"\x00" if v is None else b"\x01" + encode(t.inner, v)
    if isinstance(t, B.FixedArray):
        return b"".join(encode(t.inner, x) for x in v)
    if isinstance(t, B.Array):
        return len(v).to_bytes(4, "little") + b"".join(encode(t.inner, x) for x in v)
    if isinstance(t, B.Struct):
        return b"".join(encode(ft, x) for (_, ft), x in zip(t.fields, v))
    raise AssertionError(t)


def expected(t: B.DynType, v):
    """The decoder's documented representation of value v."""
    if type(t) is B.U64:
        return v if v <= _I64_MAX else None
    if type(t) in (B.U128, B.I128):
        return Decimal(v) if abs(v) <= _DEC38_MAX else None
    if isinstance(t, B.Enum):
        return t.variants[v]
    if isinstance(t, B.Option):
        return None if v is None else expected(t.inner, v)
    if isinstance(t, (B.FixedArray, B.Array)):
        if isinstance(t.inner, B.U8):
            return bytes(v)
        return [expected(t.inner, x) for x in v]
    if isinstance(t, B.Struct):
        return {name: expected(ft, x) for (name, ft), x in zip(t.fields, v)}
    return v


@st.composite
def typed_values(draw):
    t = draw(dyn_types())
    v = draw(values_for(t))
    return t, v


@settings(max_examples=300, deadline=None)
@given(typed_values())
def test_roundtrip(tv):
    t, v = tv
    sig = B.InstructionSignature(
        discriminator=b"\xAA\xBB", params=(B.ParamInput("x", t),), accounts_names=()
    )
    data = b"\xAA\xBB" + encode(t, v)
    out = B.decode_instruction_data(sig, data)
    assert out is not None
    assert out["x"] == expected(t, v)


@settings(max_examples=100, deadline=None)
@given(typed_values(), st.binary(min_size=0, max_size=3))
def test_trailing_garbage_is_ignored_and_short_buffer_rejected(tv, extra):
    t, v = tv
    sig = B.InstructionSignature(
        discriminator=b"\x01", params=(B.ParamInput("x", t),), accounts_names=()
    )
    payload = encode(t, v)
    # trailing bytes after the declared params are tolerated (Solana
    # instructions may append fields; the reference decodes a prefix)
    assert B.decode_instruction_data(sig, b"\x01" + payload + extra) is not None
    # a truncated buffer must be rejected, never mis-decoded (every
    # payload byte is consumed by the sequential reader, so dropping the
    # final byte always leaves some read short)
    if len(payload) > 0:
        assert B.decode_instruction_data(sig, b"\x01" + payload[:-1]) is None


@settings(max_examples=100, deadline=None)
@given(typed_values())
def test_wrong_discriminator_rejected(tv):
    t, v = tv
    sig = B.InstructionSignature(
        discriminator=b"\x01\x02", params=(B.ParamInput("x", t),), accounts_names=()
    )
    assert B.decode_instruction_data(sig, b"\x09\x02" + encode(t, v)) is None
