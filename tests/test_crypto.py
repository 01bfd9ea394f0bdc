from cherry_pipelines_spark.functions.crypto import (
    anchor_discriminator,
    base58_decode,
    base58_encode,
    canonical_signature,
    evm_signature_to_topic0,
    keccak256,
)

TRANSFER_TOPIC0 = "ddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef"


def test_keccak_empty():
    assert keccak256(b"").hex() == (
        "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    )


def test_keccak_multi_block():
    # > one 136-byte rate block
    assert len(keccak256(b"x" * 500)) == 32


def test_topic0_canonicalization():
    plain = evm_signature_to_topic0("Transfer(address,address,uint256)")
    annotated = evm_signature_to_topic0(
        "Transfer(address indexed from, address indexed to, uint256 amount)"
    )
    assert plain == annotated
    assert plain.hex() == TRANSFER_TOPIC0


def test_canonical_signature():
    assert (
        canonical_signature("Transfer(address indexed from, address indexed to, uint256 amount)")
        == "Transfer(address,address,uint256)"
    )


def test_anchor_discriminator():
    # public Anchor convention: sha256("global:swap")[:8]
    assert anchor_discriminator("swap").hex() == "f8c69e91e17587c8"
    assert anchor_discriminator("swap_v2").hex() == "2b04ed0b1ac91e62"


def test_base58_roundtrip():
    wsol = base58_decode("So11111111111111111111111111111111111111112")
    assert len(wsol) == 32
    assert base58_encode(wsol) == "So11111111111111111111111111111111111111112"
    assert base58_decode("1") == b"\x00"
