"""End-to-end erc20_transfers pipeline test against a DuckDB oracle
(SURVEY §5 items 2-3, §7.4 minimum slice)."""

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from cherry_pipelines_spark.pipelines.evm import erc20_transfers as p
from tests.fixtures_gen import gen_evm_fixtures


@pytest.fixture(scope="module")
def evm_paths(tmp_path_factory):
    d = tmp_path_factory.mktemp("evm_fixtures")
    return gen_evm_fixtures(str(d))


def _run(spark, evm_paths, tmp_path_factory):
    sink_dir = str(tmp_path_factory.mktemp("erc20_sink"))
    pipe = p.build_pipeline(
        logs_path=evm_paths["logs"],
        blocks_path=evm_paths["blocks"],
        sink_path=sink_dir,
        chain_id=1,
    )
    n = pipe.run(spark, from_block=0, to_block=50, batch_size=20)
    return pipe, sink_dir, n


def test_erc20_end_to_end(spark, evm_paths, tmp_path_factory):
    pipe, sink_dir, n_batches = _run(spark, evm_paths, tmp_path_factory)
    assert n_batches == 3  # blocks 0-50 in batches of 20

    out = pipe.sink.read_table(spark, p.TABLE_NAME)
    got = {
        (r["block_number"], r["log_index"]): r
        for r in out.collect()
    }

    con = duckdb.connect()
    oracle = con.execute(
        f"""
        SELECT l.block_number, l.log_index, l.gt_valid, l.gt_from, l.gt_to,
               l.gt_amount, b.timestamp
        FROM read_parquet('{evm_paths["logs"]}') l
        LEFT JOIN read_parquet('{evm_paths["blocks"]}') b ON b.number = l.block_number
        WHERE l.gt_valid IS NOT NULL  -- topic0-matching rows only
        """
    ).fetchall()

    assert len(got) == len(oracle)
    for bn, li, valid, gfrom, gto, gamount, ts in oracle:
        row = got[(bn, li)]
        assert row["chain_id"] == 1
        assert row["timestamp"] == ts  # NULL for the orphan block
        if valid:
            assert bytes(row["from"]) == gfrom
            assert bytes(row["to"]) == gto
            assert str(row["amount"]) == gamount
        else:  # ERC-721: decode-fail → NULL columns, row kept
            assert row["from"] is None and row["amount"] is None


def test_erc20_checkpoint_resume(spark, evm_paths, tmp_path_factory):
    pipe, sink_dir, _ = _run(spark, evm_paths, tmp_path_factory)
    before = pipe.sink.read_table(spark, p.TABLE_NAME).count()
    # resume: checkpoint at max block 50 → zero new batches
    assert pipe.run(spark, from_block=0, to_block=50, batch_size=20) == 0
    assert pipe.sink.read_table(spark, p.TABLE_NAME).count() == before


def test_scan_pushdown_plan(spark, evm_paths):
    """The topic0 filter and column selection must reach the Parquet scan
    (SURVEY §4.1-4.2): PushedFilters on block_number, pruned ReadSchema."""
    src = p.build_pipeline(evm_paths["logs"], evm_paths["blocks"], "/tmp/x", 1).source
    logs = src.read(spark, 1, 20)["logs"]
    plan = logs._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "IsNotNull(block_number)" in plan or "GreaterThanOrEqual(block_number" in plan
    assert "gt_amount" not in plan  # ground-truth cols pruned from ReadSchema
