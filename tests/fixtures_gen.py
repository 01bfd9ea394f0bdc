"""Deterministic synthetic fixtures per FIXTURES.md (seed fixed).

Each generator writes one parquet file and returns its path.  Fixture
tables carry hidden ground-truth columns (``gt_*``) that the pipelines
never read (their source field-selection drops them) but the test
oracles join against — decode correctness is checked against values the
decoder never saw.
"""

from __future__ import annotations

import os
import random
import struct

import pyarrow as pa
import pyarrow.parquet as pq

from cherry_pipelines_spark.functions.crypto import (
    anchor_discriminator,
    base58_decode,
    evm_signature_to_topic0,
)

TRANSFER_TOPIC0 = evm_signature_to_topic0("Transfer(address,address,uint256)")
SEED = 42


def _addr(i: int) -> bytes:
    return i.to_bytes(20, "big")


def _topic_addr(i: int) -> bytes:
    return b"\x00" * 12 + _addr(i)


def _u256(v: int) -> bytes:
    return v.to_bytes(32, "big")


def gen_evm_fixtures(out_dir: str, n_blocks: int = 50, logs_per_block: int = 6) -> dict[str, str]:
    rng = random.Random(SEED)
    os.makedirs(out_dir, exist_ok=True)

    blocks = {
        "number": list(range(1, n_blocks + 1)),
        "timestamp": [1_700_000_000 + 12 * b for b in range(1, n_blocks + 1)],
    }
    # one orphan log block (block 0 never appears in blocks): NULL timestamp path
    cols = {
        k: []
        for k in (
            "block_number block_hash transaction_index log_index transaction_hash "
            "address topic0 topic1 topic2 topic3 data "
            "gt_valid gt_from gt_to gt_amount"
        ).split()
    }

    def add_log(bn, tx, li, kind):
        cols["block_number"].append(bn)
        cols["block_hash"].append(bn.to_bytes(32, "big"))
        cols["transaction_index"].append(tx)
        cols["log_index"].append(li)
        cols["transaction_hash"].append((bn * 1000 + tx).to_bytes(32, "big"))
        f, t = rng.randrange(1, 500), rng.randrange(1, 500)
        if kind == "erc20":
            amount = rng.randrange(0, 10**12) * (10 ** rng.randrange(0, 18))
            cols["address"].append(_addr(9000 + rng.randrange(5)))
            cols["topic0"].append(TRANSFER_TOPIC0)
            cols["topic1"].append(_topic_addr(f))
            cols["topic2"].append(_topic_addr(t))
            cols["topic3"].append(None)
            cols["data"].append(_u256(amount))
            cols["gt_valid"].append(True)
            cols["gt_from"].append(_addr(f))
            cols["gt_to"].append(_addr(t))
            cols["gt_amount"].append(str(amount))
        elif kind == "erc721":  # shares topic0, tokenId in topic3, empty data
            cols["address"].append(_addr(9900))
            cols["topic0"].append(TRANSFER_TOPIC0)
            cols["topic1"].append(_topic_addr(f))
            cols["topic2"].append(_topic_addr(t))
            cols["topic3"].append(_u256(rng.randrange(10_000)))
            cols["data"].append(b"")
            cols["gt_valid"].append(False)
            cols["gt_from"].append(None)
            cols["gt_to"].append(None)
            cols["gt_amount"].append(None)
        else:  # unrelated event — filtered by topic0 at the source
            cols["address"].append(_addr(9990))
            cols["topic0"].append(b"\xee" * 32)
            cols["topic1"].append(_topic_addr(f))
            cols["topic2"].append(None)
            cols["topic3"].append(None)
            cols["data"].append(_u256(1))
            cols["gt_valid"].append(None)
            cols["gt_from"].append(None)
            cols["gt_to"].append(None)
            cols["gt_amount"].append(None)

    for bn in range(1, n_blocks + 1):
        for li in range(logs_per_block):
            r = rng.random()
            kind = "erc20" if r < 0.7 else ("erc721" if r < 0.85 else "other")
            add_log(bn, li // 2, li, kind)
    add_log(0, 0, 0, "erc20")  # orphan block → NULL timestamp must survive

    schema = pa.schema(
        [
            ("block_number", pa.int64()),
            ("block_hash", pa.binary()),
            ("transaction_index", pa.int64()),
            ("log_index", pa.int64()),
            ("transaction_hash", pa.binary()),
            ("address", pa.binary()),
            ("topic0", pa.binary()),
            ("topic1", pa.binary()),
            ("topic2", pa.binary()),
            ("topic3", pa.binary()),
            ("data", pa.binary()),
            ("gt_valid", pa.bool_()),
            ("gt_from", pa.binary()),
            ("gt_to", pa.binary()),
            ("gt_amount", pa.string()),
        ]
    )
    logs_path = os.path.join(out_dir, "evm_logs.parquet")
    blocks_path = os.path.join(out_dir, "evm_blocks.parquet")
    pq.write_table(pa.table(cols, schema=schema), logs_path)
    pq.write_table(pa.table(blocks), blocks_path)
    return {"logs": logs_path, "blocks": blocks_path}
