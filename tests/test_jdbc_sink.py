"""JDBC/ClickHouse writer parity (SURVEY §2.1 S8/S9 ClickHouse leg,
reference erc20_transfers.py:118-124 + db.py:42-45).

The sandbox has no JDBC driver or database, so the end-to-end leg is
gated on ``CHERRY_JDBC_URL`` (and skips clean here); the ungated tests
pin the behavior that must hold without a database: a clear
construction-time error instead of a mid-write crash, and write-order /
checkpoint plumbing shared with ParquetSink.
"""

from __future__ import annotations

import os

import pytest

from cherry_pipelines_spark.pipelines.evm import erc20_transfers as p
from cherry_pipelines_spark.sinks.jdbc import JdbcSink, _has_driver
from tests.fixtures_gen import gen_evm_fixtures

JDBC_URL = os.environ.get("CHERRY_JDBC_URL")


def test_missing_driver_raises_clearly(spark):
    sink = JdbcSink(url="jdbc:clickhouse://localhost:8123/default",
                    anchor_table=p.TABLE_NAME, block_column="block_number")
    if _has_driver(spark, sink.driver):
        pytest.skip("a ClickHouse JDBC driver IS on the classpath here")
    with pytest.raises(NotImplementedError, match="spark.jars"):
        sink.write(spark, {}, 0, 10)
    with pytest.raises(NotImplementedError):
        sink.next_block(spark)


@pytest.mark.skipif(
    not JDBC_URL, reason="CHERRY_JDBC_URL not set (no database in this sandbox)"
)
def test_erc20_end_to_end_into_jdbc(spark, tmp_path_factory):
    """With a live database (e.g. ClickHouse + its JDBC driver on
    spark.jars), the erc20 pipeline writes through JdbcSink and resumes
    from the database-side MAX(block_number) watermark."""
    d = tmp_path_factory.mktemp("evm_fixtures_jdbc")
    paths = gen_evm_fixtures(str(d))
    sink = JdbcSink(
        url=JDBC_URL,
        anchor_table=p.TABLE_NAME,
        block_column="block_number",
        properties={
            k.removeprefix("CHERRY_JDBC_PROP_").lower(): v
            for k, v in os.environ.items()
            if k.startswith("CHERRY_JDBC_PROP_")
        },
    )
    pipe = p.build_pipeline(paths["logs"], paths["blocks"], "", chain_id=1, sink=sink)
    n = pipe.run(spark, from_block=0, to_block=50, batch_size=20)
    assert n == 3
    # read back through JDBC and compare against a parquet-sink run
    back = spark.read.jdbc(pipe.sink.url, p.TABLE_NAME, properties=sink._props())
    assert back.count() > 0
    # resume: second run is a no-op because next_block comes from the DB
    assert pipe.run(spark, from_block=0, to_block=50, batch_size=20) == 0
