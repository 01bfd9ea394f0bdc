from cherry_pipelines_spark.functions.crypto import (  # noqa: F401
    anchor_discriminator,
    base58_decode,
    base58_encode,
    evm_signature_to_topic0,
    keccak256,
)
