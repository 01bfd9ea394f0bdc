"""Deterministic SVM fixtures per FIXTURES.md §2 + gold expected outputs.

One instruction stream contains interleaved orca / raydium / meteora /
metadata / SPL-transfer / memo / unrelated instructions across slots and
transactions.  The generator simulates the reference semantics in plain
Python (adjacency over the memo-filtered per-tx sequence, vault→mint
lookup, direction swap) to produce gold rows the pipeline outputs are
compared against.
"""

from __future__ import annotations

import os
import random
import struct

import pyarrow as pa
import pyarrow.parquet as pq

from cherry_pipelines_spark.functions.crypto import anchor_discriminator, base58_decode
from cherry_pipelines_spark.pipelines.svm import common as C
from cherry_pipelines_spark.pipelines.svm import meteora_swaps as MET
from cherry_pipelines_spark.pipelines.svm import orca_swaps as ORCA
from cherry_pipelines_spark.pipelines.svm import raydium_swaps as RAY

SEED = 1234


def key(n: int) -> bytes:
    return n.to_bytes(32, "big")


def u64(v: int) -> bytes:
    return struct.pack("<Q", v)


def u128(v: int) -> bytes:
    return v.to_bytes(16, "little")


def b(v: bool) -> bytes:
    return b"\x01" if v else b"\x00"


MEMO = C.MEMO_PROGRAM_ID_V1
TOKEN = C.TOKEN_PROGRAM_ID
OTHER_PROGRAM = key(999999)


class Gen:
    def __init__(self, n_slots: int = 40):
        self.rng = random.Random(SEED)
        self.n_slots = n_slots
        self.instructions: list[dict] = []
        self.transactions: list[tuple] = []
        self.blocks: list[tuple] = []
        self.balances: list[tuple] = []
        self.gold_orca: list[dict] = []
        self.gold_raydium: list[dict] = []
        self.gold_meteora: list[dict] = []
        self.gold_metadata: list[dict] = []
        self._vault_mint: dict[tuple, bytes] = {}

    def _emit(self, slot, tx, addr, program, accounts, data, committed=True):
        row = {
            "block_slot": slot,
            "block_hash": key(slot)[:32],
            "transaction_index": tx,
            "instruction_address": addr,
            "program_id": program,
            "data": data,
            "is_committed": committed,
        }
        for i in range(10):
            row[f"a{i}"] = accounts[i] if i < len(accounts) else None
        row["rest_of_accounts"] = list(accounts[10:]) if len(accounts) > 10 else []
        self.instructions.append(row)

    def _balance(self, slot, tx, account, mint, decimals=6):
        k = (slot, tx, account)
        if k not in self._vault_mint:
            self._vault_mint[k] = mint
            self.balances.append((slot, tx, account, mint, decimals))

    # ------------------------------------------------------------- orca
    def add_orca_tx(self, slot, tx, version, with_memo, missing_output, a_to_b):
        rng = self.rng
        amt, thr, spl = rng.randrange(1, 10**9), rng.randrange(1, 10**6), 2**70 + rng.randrange(100)
        in_amt, out_amt = rng.randrange(1, 10**9), rng.randrange(1, 10**9)
        vault_a, vault_b = key(10000 + slot * 10 + tx), key(20000 + slot * 10 + tx)
        mint_a, mint_b = key(31), key(32)
        owner_a, owner_b = key(41), key(42)
        auth, pool = key(51), key(60 + tx)
        addr = 0

        def nxt():
            nonlocal addr
            a = [addr]
            addr += 1
            return a

        if version == 1:
            accounts = [TOKEN, auth, pool, owner_a, vault_a, owner_b, vault_b]
            data = ORCA.DISCRIMINATOR_V1 + u64(amt) + u64(thr) + u128(spl) + b(True) + b(a_to_b)
        else:
            accounts = [TOKEN, TOKEN, None, auth, pool, mint_a, mint_b, owner_a, vault_a, owner_b, vault_b]
            # remaining_accounts_info = Some({slices: [{accounts_type: 3, length: 2}]})
            rai = b"\x01" + struct.pack("<I", 1) + b"\x03" + b"\x02"
            data = ORCA.DISCRIMINATOR_V2 + u64(amt) + u64(thr) + u128(spl) + b(True) + b(a_to_b) + rai
        self._emit(slot, tx, nxt(), ORCA.PROGRAM_ID, accounts, data)
        if with_memo:
            self._emit(slot, tx, nxt(), MEMO, [key(1)], b"memo")
        # input transfer (immediately next non-memo row)
        self._emit(slot, tx, nxt(), TOKEN, [key(71), key(72), key(73)], b"\x03" + u64(in_amt))
        if not missing_output:
            # checked transfer as the output leg
            self._emit(
                slot, tx, nxt(), TOKEN, [key(74), key(75), key(76), key(77)],
                b"\x0c" + u64(out_amt) + b"\x06",
            )
        in_vault = vault_a if a_to_b else vault_b
        out_vault = vault_b if a_to_b else vault_a
        self._balance(slot, tx, in_vault, key(81))
        # leave output vault unmapped sometimes to exercise NULL mint
        map_out = self.rng.random() < 0.7
        if map_out:
            self._balance(slot, tx, out_vault, key(82))
        self.gold_orca.append(
            dict(
                block_slot=slot,
                transaction_index=tx,
                version=version,
                amount=amt,
                a_to_b=a_to_b,
                input_vault=in_vault,
                output_vault=out_vault,
                input_amount=in_amt,
                output_amount=None if missing_output else out_amt,
                found_input=True,
                found_output=None if missing_output else True,
                input_mint=key(81),
                output_mint=key(82) if map_out else None,
                whirlpool=pool,
                sqrt_price_limit=spl,
            )
        )

    # ---------------------------------------------------------- raydium
    def add_raydium_tx(self, slot, tx, kind):
        rng = self.rng
        a1, a2 = rng.randrange(1, 10**9), rng.randrange(1, 10**9)
        in_amt, out_amt = rng.randrange(1, 10**9), rng.randrange(1, 10**9)
        src_acct, dst_acct = key(7000 + slot * 10 + tx), key(8000 + slot * 10 + tx)
        pool = key(90 + tx)
        payer = key(95)
        addr = 0

        def nxt():
            nonlocal addr
            a = [addr]
            addr += 1
            return a

        if kind == "amm_base_in":
            accounts = [TOKEN, pool] + [key(200 + i) for i in range(12)] + [key(301), key(302), payer]
            data = b"\x09" + u64(a1) + u64(a2)
        elif kind == "amm_base_out":
            accounts = [TOKEN, pool] + [key(200 + i) for i in range(12)] + [key(301), key(302), payer]
            data = b"\x0b" + u64(a1) + u64(a2)
        elif kind == "clmm_v1":
            accounts = [payer, key(401), pool, key(403), key(404), key(405), key(406), key(407), TOKEN, key(409)]
            data = RAY.SWAP_V1_DISCRIMINATOR + u64(a1) + u64(a2) + u128(2**65) + b(True)
        elif kind == "clmm_v2":
            accounts = [payer, key(401), pool, key(403), key(404), key(405), key(406), key(407), TOKEN, TOKEN, None, key(411), key(412)]
            data = RAY.SWAP_V2_DISCRIMINATOR + u64(a1) + u64(a2) + u128(2**65) + b(False)
        elif kind == "cp_swap_base_input":
            accounts = [payer, key(501), key(502), pool, key(504), key(505), key(506), key(507), TOKEN, TOKEN, key(510), key(511), key(512)]
            data = RAY.SWAP_BASE_INPUT_DISCRIMINATOR + u64(a1) + u64(a2)
        else:  # cp_swap_base_output
            accounts = [payer, key(501), key(502), pool, key(504), key(505), key(506), key(507), TOKEN, TOKEN, key(510), key(511), key(512)]
            data = RAY.SWAP_BASE_OUTPUT_DISCRIMINATOR + u64(a1) + u64(a2)
        self._emit(slot, tx, nxt(), RAY.AMM_PROGRAM_ID if kind.startswith("amm") else (RAY.CLMM_PROGRAM_ID if kind.startswith("clmm") else RAY.CP_SWAP_PROGRAM_ID), accounts, data)
        # input transfer: destination = input_vault; output: source = output_vault
        self._emit(slot, tx, nxt(), TOKEN, [key(601), dst_acct, key(603)], b"\x03" + u64(in_amt))
        self._emit(slot, tx, nxt(), TOKEN, [src_acct, key(605), key(606)], b"\x03" + u64(out_amt))
        self._balance(slot, tx, dst_acct, key(86))
        self._balance(slot, tx, src_acct, key(87))
        self.gold_raydium.append(
            dict(
                block_slot=slot,
                transaction_index=tx,
                swap_kind=kind,
                pool=pool,
                input_amount=in_amt,
                output_amount=out_amt,
                input_vault=dst_acct,
                output_vault=src_acct,
                input_mint=key(86),
                output_mint=key(87),
                amount_in=a1 if kind in ("amm_base_in", "cp_swap_base_input") else None,
                max_amount_in=a1 if kind in ("amm_base_out", "cp_swap_base_output") else None,
                amount=a1 if kind.startswith("clmm") else None,
            )
        )

    # ---------------------------------------------------------- meteora
    def add_meteora_tx(self, slot, tx, b_to_a, missing_cpi):
        rng = self.rng
        amt_in, min_out = rng.randrange(1, 10**9), rng.randrange(1, 10**6)
        out_amt, actual_in = rng.randrange(1, 10**9), rng.randrange(1, 10**9)
        pool = key(70 + tx)
        vault_a, vault_b = key(761), key(762)
        mint_a, mint_b = key(763), key(764)
        accounts = [key(751), pool, key(753), key(754), vault_a, vault_b, mint_a, mint_b, key(759), TOKEN, TOKEN, key(758)]
        data = MET.SWAP_DISCRIMINATOR + u64(amt_in) + u64(min_out)
        self._emit(slot, tx, [0], MET.CP_AMM_PROGRAM_ID, accounts, data)
        if not missing_cpi:
            cpi_data = (
                MET.CPI_DISCRIMINATOR
                + pool
                + b(b_to_a)
                + b(False)
                + u64(amt_in)
                + u64(min_out)
                + u64(out_amt)
                + u128(2**80)
                + u64(10)
                + u64(11)
                + u64(12)
                + u64(13)
                + u64(actual_in)
                + u64(1_700_000_000)
            )
            self._emit(slot, tx, [0, 0], MET.CP_AMM_PROGRAM_ID, [], cpi_data)
            self.gold_meteora.append(
                dict(
                    block_slot=slot,
                    transaction_index=tx,
                    pool=pool,
                    b_to_a=b_to_a,
                    output_amount=out_amt,
                    input_amount=actual_in,
                    input_mint=mint_b if b_to_a else mint_a,
                    output_mint=mint_a if b_to_a else mint_b,
                    input_vault=vault_b if b_to_a else vault_a,
                    output_vault=vault_a if b_to_a else vault_b,
                )
            )
        # missing CPI → row dropped by the reference's direction split

    # --------------------------------------------------------- metadata
    def add_metadata_tx(self, slot, tx, version):
        rng = self.rng
        tick, isp = rng.randrange(1, 500), 2**75 + rng.randrange(1000)
        pool = key(3000 + slot)
        if version == 1:
            accounts = [key(901), key(902), key(903), key(904), pool, key(906), key(907), key(908), TOKEN, key(910), key(911)]
            data = (
                anchor_discriminator("initialize_pool")
                + struct.pack("<B", 7)
                + struct.pack("<H", tick)
                + u128(isp)
            )
        else:
            accounts = [key(901), key(902), key(903), key(912), key(913), key(904), pool, key(906), key(907), key(908), TOKEN, TOKEN, key(910), key(911)]
            data = (
                anchor_discriminator("initialize_pool_v2")
                + struct.pack("<H", tick)
                + u128(isp)
            )
        self._emit(slot, tx, [0], ORCA.PROGRAM_ID, accounts, data)
        self.gold_metadata.append(
            dict(block_slot=slot, transaction_index=tx, version=version,
                 whirlpool=pool, tick_spacing=tick, initial_sqrt_price=isp)
        )

    def build(self):
        rng = self.rng
        for slot in range(1, self.n_slots + 1):
            self.blocks.append((slot, slot + 1000, 1_700_000_000 + slot * 2))
            n_tx = rng.randrange(1, 4)
            for tx in range(n_tx):
                choice = rng.random()
                if choice < 0.35:
                    self.add_orca_tx(
                        slot, tx,
                        version=rng.choice([1, 2]),
                        with_memo=rng.random() < 0.3,
                        missing_output=rng.random() < 0.2,
                        a_to_b=rng.random() < 0.5,
                    )
                elif choice < 0.6:
                    self.add_raydium_tx(
                        slot, tx,
                        kind=rng.choice([
                            "amm_base_in", "amm_base_out", "clmm_v1",
                            "clmm_v2", "cp_swap_base_input", "cp_swap_base_output",
                        ]),
                    )
                elif choice < 0.8:
                    self.add_meteora_tx(
                        slot, tx, b_to_a=rng.random() < 0.5, missing_cpi=rng.random() < 0.2
                    )
                elif choice < 0.9:
                    self.add_metadata_tx(slot, tx, version=rng.choice([1, 2]))
                else:
                    # unrelated program noise (indexed, never matched)
                    self._emit(slot, tx, [0], OTHER_PROGRAM, [key(1)], b"\xff\xfe")
                self.transactions.append((slot, tx, key(5_000_000 + slot * 10 + tx)))
            # one non-committed orca swap that must be filtered out
            if slot % 10 == 0:
                self._emit(
                    slot, 99, [0], ORCA.PROGRAM_ID,
                    [TOKEN, key(51), key(52), key(41), key(10001), key(42), key(20001)],
                    ORCA.DISCRIMINATOR_V1 + u64(1) + u64(1) + u128(1) + b(True) + b(True),
                    committed=False,
                )

    def write(self, out_dir: str) -> dict[str, str]:
        os.makedirs(out_dir, exist_ok=True)
        acct_fields = [(f"a{i}", pa.binary()) for i in range(10)]
        ins_schema = pa.schema(
            [
                ("block_slot", pa.int64()),
                ("block_hash", pa.binary()),
                ("transaction_index", pa.int64()),
                ("instruction_address", pa.list_(pa.int32())),
                ("program_id", pa.binary()),
                *acct_fields,
                ("rest_of_accounts", pa.list_(pa.binary())),
                ("data", pa.binary()),
                ("is_committed", pa.bool_()),
            ]
        )
        cols = {name: [row.get(name) for row in self.instructions] for name in ins_schema.names}
        paths = {}
        paths["instructions"] = os.path.join(out_dir, "svm_instructions.parquet")
        pq.write_table(pa.table(cols, schema=ins_schema), paths["instructions"])
        paths["transactions"] = os.path.join(out_dir, "svm_transactions.parquet")
        pq.write_table(
            pa.table(
                dict(zip(("block_slot", "transaction_index", "signature"), zip(*self.transactions))),
                schema=pa.schema([("block_slot", pa.int64()), ("transaction_index", pa.int64()), ("signature", pa.binary())]),
            ),
            paths["transactions"],
        )
        paths["blocks"] = os.path.join(out_dir, "svm_blocks.parquet")
        pq.write_table(
            pa.table(
                dict(zip(("slot", "height", "timestamp"), zip(*self.blocks))),
                schema=pa.schema([("slot", pa.int64()), ("height", pa.int64()), ("timestamp", pa.int64())]),
            ),
            paths["blocks"],
        )
        paths["token_balances"] = os.path.join(out_dir, "svm_token_balances.parquet")
        pq.write_table(
            pa.table(
                dict(zip(("block_slot", "transaction_index", "account", "post_mint", "post_decimals"), zip(*self.balances))),
                schema=pa.schema([
                    ("block_slot", pa.int64()), ("transaction_index", pa.int64()),
                    ("account", pa.binary()), ("post_mint", pa.binary()), ("post_decimals", pa.int32()),
                ]),
            ),
            paths["token_balances"],
        )
        return paths


def gen_svm_fixtures(out_dir: str, n_slots: int = 40):
    g = Gen(n_slots)
    g.build()
    paths = g.write(out_dir)
    return g, paths
