"""Unit tests for the EVM ABI event decoder (SURVEY §2.6 D1) against
hand-computed byte strings."""

from decimal import Decimal

from pyspark.sql import types as T

from cherry_pipelines_spark.functions.abi import (
    decode_event_row,
    decode_events_df,
    parse_event_signature,
)

SIG = "Transfer(address indexed from, address indexed to, uint256 amount)"


def _addr_topic(addr20: bytes) -> bytes:
    return b"\x00" * 12 + addr20


def _u256(v: int) -> bytes:
    return v.to_bytes(32, "big")


def test_parse_signature():
    sig = parse_event_signature(SIG)
    assert [p.name for p in sig.params] == ["from", "to", "amount"]
    assert [p.indexed for p in sig.params] == [True, True, False]
    assert sig.canonical == "Transfer(address,address,uint256)"


def test_decode_row_ok():
    sig = parse_event_signature(SIG)
    a, b = b"\x11" * 20, b"\x22" * 20
    row = decode_event_row(sig, [None, _addr_topic(a), _addr_topic(b), None], _u256(12345))
    assert row["from"] == a
    assert row["to"] == b
    assert row["amount"] == Decimal(12345)
    assert row["amount_raw"] == _u256(12345)


def test_decode_row_erc721_fails():
    """ERC-721 Transfer shares topic0 but has tokenId in topic3 and empty
    data — must decode to NULL, not error (allow_decode_fail)."""
    sig = parse_event_signature(SIG)
    a, b = b"\x11" * 20, b"\x22" * 20
    row = decode_event_row(
        sig, [None, _addr_topic(a), _addr_topic(b), _u256(7)], b""
    )
    assert row is None


def test_decode_row_uint256_overflow_null():
    sig = parse_event_signature(SIG)
    a, b = b"\x11" * 20, b"\x22" * 20
    big = 10**38  # > Decimal(38,0) max
    row = decode_event_row(sig, [None, _addr_topic(a), _addr_topic(b), None], _u256(big))
    assert row["amount"] is None
    assert row["amount_raw"] == _u256(big)  # lossless raw survives


def test_decode_events_df(spark):
    a, b = b"\x11" * 20, b"\x22" * 20
    rows = [
        (1, 0, _addr_topic(a), _addr_topic(b), None, _u256(500)),
        (1, 1, _addr_topic(a), _addr_topic(b), _u256(9), b""),  # ERC-721 → NULLs
    ]
    schema = T.StructType(
        [
            T.StructField("block_number", T.LongType()),
            T.StructField("log_index", T.LongType()),
            T.StructField("topic1", T.BinaryType()),
            T.StructField("topic2", T.BinaryType()),
            T.StructField("topic3", T.BinaryType()),
            T.StructField("data", T.BinaryType()),
        ]
    )
    logs = spark.createDataFrame(rows, schema)
    out = decode_events_df(logs, SIG).orderBy("log_index").collect()
    assert len(out) == 2
    assert bytes(out[0]["from"]) == a and out[0]["amount"] == Decimal(500)
    assert out[1]["amount"] is None and out[1]["from"] is None

    strict = decode_events_df(logs, SIG, allow_decode_fail=False)
    assert strict.count() == 1


def test_four_indexed_params_all_null(spark):
    """More indexed params than topic columns: every row fails decode
    (missing topic) -> NULL columns, never an executor error."""
    from cherry_pipelines_spark.functions.abi import decode_events_df

    df = spark.createDataFrame(
        [(1, b"\x00" * 32, b"\x00" * 32, b"\x00" * 32, b"")],
        "log_index long, topic1 binary, topic2 binary, topic3 binary, data binary",
    )
    out = decode_events_df(
        df,
        "Weird(address indexed a, address indexed b, address indexed c, address indexed d)",
    ).collect()
    assert len(out) == 1
    assert all(out[0][c] is None for c in ("a", "b", "c", "d"))


def test_decode_events_df_wide_uint_overflow(spark):
    """SURVEY §7.3 overflow policy through the VECTORIZED Spark path
    (abi.py wide-uint branch), not just decode_event_row: a full 78-digit
    uint256 (2^256-1) and the 10^38 boundary decode to NULL Decimal(38,0)
    with the lossless 32-byte raw preserved; 10^38-1 stays numeric.
    Mirrors reference erc20_transfers.py:41 Decimal256 semantics."""
    a, b = b"\x11" * 20, b"\x22" * 20
    max_dec = 10**38 - 1
    over = 10**38
    full = 2**256 - 1  # 78 decimal digits
    rows = [
        (0, _addr_topic(a), _addr_topic(b), None, _u256(max_dec)),
        (1, _addr_topic(a), _addr_topic(b), None, _u256(over)),
        (2, _addr_topic(a), _addr_topic(b), None, _u256(full)),
    ]
    schema = T.StructType(
        [
            T.StructField("log_index", T.LongType()),
            T.StructField("topic1", T.BinaryType()),
            T.StructField("topic2", T.BinaryType()),
            T.StructField("topic3", T.BinaryType()),
            T.StructField("data", T.BinaryType()),
        ]
    )
    out = decode_events_df(spark.createDataFrame(rows, schema), SIG).orderBy(
        "log_index"
    ).collect()
    assert out[0]["amount"] == Decimal(max_dec)
    assert out[1]["amount"] is None
    assert out[2]["amount"] is None
    # amount_raw is lossless for all three, overflowed or not
    assert [bytes(r["amount_raw"]) for r in out] == [
        _u256(max_dec),
        _u256(over),
        _u256(full),
    ]
    # the schema itself must carry Decimal(38,0), not double/long
    decoded_schema = decode_events_df(spark.createDataFrame(rows, schema), SIG).schema
    assert decoded_schema["amount"].dataType == T.DecimalType(38, 0)


def _w(v: int) -> bytes:
    return v.to_bytes(32, "big")


def test_dynamic_array_decode(spark):
    """ERC-1155 TransferBatch shape: two uint256[] params via the
    standard head-offset/tail layout."""
    sig = (
        "TransferBatch(address indexed operator, address indexed from, "
        "address indexed to, uint256[] ids, uint256[] values)"
    )
    ids, values = [7, 8, 9], [100, 200, 300]
    data = (
        _w(0x40)                                  # offset of ids
        + _w(0x40 + 32 * (1 + len(ids)))          # offset of values
        + _w(len(ids)) + b"".join(_w(i) for i in ids)
        + _w(len(values)) + b"".join(_w(v) for v in values)
    )
    addr = lambda tag: bytes(12) + bytes([tag]) * 20
    rows = [(1, addr(1), addr(2), addr(3), data),
            (2, addr(1), addr(2), addr(3), data[:-32])]  # truncated tail
    schema = T.StructType(
        [
            T.StructField("log_index", T.LongType()),
            T.StructField("topic1", T.BinaryType()),
            T.StructField("topic2", T.BinaryType()),
            T.StructField("topic3", T.BinaryType()),
            T.StructField("data", T.BinaryType()),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    out = {r["log_index"]: r for r in
           decode_events_df(df, sig).orderBy("log_index").collect()}
    assert [int(x) for x in out[1]["ids"]] == ids
    assert [int(x) for x in out[1]["values"]] == values
    assert bytes(out[1]["operator"]) == bytes([1]) * 20
    # truncated tail -> allow_decode_fail NULLs, row preserved
    assert out[2]["ids"] is None and out[2]["values"] is None


def test_dynamic_bytes_and_string_decode(spark):
    sig = "LogNote(bytes payload, string memo)"
    payload, memo = b"\xde\xad\xbe\xef\x01", "hello spark"
    pad = lambda b: b + bytes((32 - len(b) % 32) % 32)
    mb = memo.encode()
    data = (
        _w(0x40)
        + _w(0x40 + 32 + len(pad(payload)))
        + _w(len(payload)) + pad(payload)
        + _w(len(mb)) + pad(mb)
    )
    schema = T.StructType(
        [
            T.StructField("log_index", T.LongType()),
            T.StructField("topic1", T.BinaryType()),
            T.StructField("topic2", T.BinaryType()),
            T.StructField("topic3", T.BinaryType()),
            T.StructField("data", T.BinaryType()),
        ]
    )
    df = spark.createDataFrame([(1, None, None, None, data)], schema)
    (row,) = decode_events_df(df, sig).collect()
    assert bytes(row["payload"]) == payload
    assert row["memo"] == memo


def test_indexed_dynamic_rejected():
    import pytest

    from cherry_pipelines_spark.functions.abi import parse_event_signature

    with pytest.raises(ValueError):
        parse_event_signature("Bad(uint256[] indexed ids)")


def test_non_canonical_shared_tail_rejected():
    """Two dynamic heads pointing at the SAME tail, padded so the total
    consumed-length check alone would pass (each head counts the shared
    tail once: 2*32 consumed == 128-64 data after heads) — the
    canonical-offset check must reject it."""
    sig = parse_event_signature("LogNote(bytes a, bytes b)")
    data = (
        _w(0x40) + _w(0x40)   # both heads -> offset 64 (shared tail)
        + _w(0)               # shared tail: empty bytes
        + b"\x00" * 32        # garbage sized to fool the sum check
    )
    assert decode_event_row(sig, [None], data) is None
    # canonical two-empty-bytes layout still decodes
    good = _w(0x40) + _w(0x60) + _w(0) + _w(0)
    out = decode_event_row(sig, [None], good)
    assert out == {"a": b"", "b": b""}


def test_non_canonical_gapped_tail_rejected():
    sig = parse_event_signature("LogNote(bytes a)")
    # head says tail starts at 64, canonical start is 32 -> gap
    data = _w(0x40) + _w(0) + _w(0)
    assert decode_event_row(sig, [None], data) is None


def test_uint256_boundary_straddle():
    """Exact 10^38-1 / 10^38 boundary of the Decimal(38,0) policy."""
    sig = parse_event_signature("Mint(uint256 amount)")
    fits = decode_event_row(sig, [None], _u256(10**38 - 1))
    assert fits["amount"] == Decimal(10**38 - 1)
    assert fits["amount_raw"] == _u256(10**38 - 1)
    over = decode_event_row(sig, [None], _u256(10**38))
    assert over["amount"] is None
    assert over["amount_raw"] == _u256(10**38)


def test_dirty_int_padding_rejected(spark):
    """A non-sign-extended intN word is an invalid encoding: the row
    must decode to NULL on the per-row path AND on the static matrix
    path — without this check the out-of-range python int crashed the
    whole job at the Arrow long conversion (allow_decode_fail broken
    for hostile payloads)."""
    sig = parse_event_signature("S(int32 a, int64 b)")
    ok = (-5).to_bytes(32, "big", signed=True) + (9).to_bytes(32, "big", signed=True)
    # a = 2^40: fits int64 but not int32 -> dirty
    dirty_a = (2**40).to_bytes(32, "big") + (9).to_bytes(32, "big", signed=True)
    # b = 2^64: top bytes not a sign extension of the low word -> dirty
    dirty_b = (-5).to_bytes(32, "big", signed=True) + (2**64).to_bytes(32, "big")
    assert decode_event_row(sig, [None], ok) == {"a": -5, "b": 9}
    assert decode_event_row(sig, [None], dirty_a) is None
    assert decode_event_row(sig, [None], dirty_b) is None
    # static matrix path agrees
    schema = T.StructType(
        [
            T.StructField("i", T.LongType()),
            T.StructField("topic1", T.BinaryType()),
            T.StructField("topic2", T.BinaryType()),
            T.StructField("topic3", T.BinaryType()),
            T.StructField("data", T.BinaryType()),
        ]
    )
    df = spark.createDataFrame(
        [(0, None, None, None, ok), (1, None, None, None, dirty_a),
         (2, None, None, None, dirty_b)],
        schema,
    )
    out = {r["i"]: (r["a"], r["b"]) for r in
           decode_events_df(df, "S(int32 a, int64 b)").collect()}
    assert out == {0: (-5, 9), 1: (None, None), 2: (None, None)}
