"""End-to-end document-curation pipeline (pipelines/docs/curate.py)
against a DuckDB replication of the full funnel: quality gate → in-batch
exact dedup → decontamination → deterministic stratified sampling, run
in id-range batches with checkpoint resume."""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from cherry_pipelines_spark.pipelines.docs import curate
from cherry_pipelines_spark.sinks.parquet import BATCH_COL

DOCS = "/root/testdata/sf0.001/documents.parquet"

RATES_SQL = "CASE lang WHEN 'en' THEN 5000 ELSE 10000 END"
RATES = {"en": 0.5, "de": 1.0, "es": 1.0, "fr": 1.0, "zh": 1.0}


def _expected_doc_ids(batches, bench_pred="doc_id % 97 = 0"):
    """Replicate the funnel in DuckDB, independently of the Spark code."""
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{DOCS}')")
    out = set()
    for lo, hi in batches:
        rows = con.execute(f"""
WITH batch AS (SELECT * FROM documents WHERE doc_id BETWEEN {lo} AND {hi}),
tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM batch),
w AS (SELECT doc_id, unnest(t) AS w FROM tok),
wc AS (SELECT doc_id, w, count(*) AS c FROM w GROUP BY 1, 2),
ws AS (SELECT doc_id, count(*) AS nu, sum(c) AS nw, max(c) AS tw FROM wc GROUP BY 1),
quality AS (
  SELECT b.* FROM batch b JOIN ws USING (doc_id)
  WHERE nw >= 20 AND nu / nw::DOUBLE >= 0.3 AND tw / nw::DOUBLE <= 0.2),
dedup AS (
  SELECT q.* FROM quality q
  JOIN (SELECT sha256(text) AS h, min(doc_id) AS doc_id
        FROM quality GROUP BY 1) c USING (doc_id)),
dtok AS (SELECT doc_id, string_split(text, ' ') AS t FROM dedup),
sh0 AS (SELECT doc_id,
               [concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3], t[i+4])
                for i in generate_series(1, greatest(len(t)-4, 1))] AS ss
        FROM dtok),
sh AS (SELECT DISTINCT doc_id, unnest(ss) AS shingle FROM sh0),
btok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
         WHERE {bench_pred}),
bs0 AS (SELECT doc_id,
               [concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3], t[i+4])
                for i in generate_series(1, greatest(len(t)-4, 1))] AS ss
        FROM btok),
bench AS (SELECT DISTINCT unnest(ss) AS shingle FROM bs0),
contaminated AS (SELECT DISTINCT doc_id FROM sh JOIN bench USING (shingle)),
clean AS (SELECT * FROM dedup WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)),
sampled AS (
  SELECT doc_id FROM clean
  WHERE ('0x' || substr(sha256(doc_id::VARCHAR), 1, 8))::BIGINT % 10000 < {RATES_SQL})
SELECT doc_id FROM sampled""").fetchall()
        out |= {r[0] for r in rows}
    return out


@pytest.fixture(scope="module")
def bench_path(tmp_path_factory, spark):
    d = str(tmp_path_factory.mktemp("bench_docs"))
    p = os.path.join(d, "benchmark.parquet")
    (
        spark.read.parquet(DOCS)
        .filter(F.col("doc_id") % 97 == 0)
        .toPandas()
        .to_parquet(p)
    )
    return p


def test_curation_pipeline_end_to_end(spark, bench_path, tmp_path_factory):
    sink_dir = str(tmp_path_factory.mktemp("curated"))
    pipe = curate.build_pipeline(DOCS, bench_path, sink_dir, rates=RATES)
    n = pipe.run(spark, from_block=0, to_block=499, batch_size=200)
    assert n == 3  # [0,199] [200,399] [400,499]

    got = spark.read.parquet(os.path.join(sink_dir, curate.TABLE_NAME))
    got_ids = {r["doc_id"] for r in got.select("doc_id").collect()}
    expected = _expected_doc_ids([(0, 199), (200, 399), (400, 499)])
    assert got_ids == expected and len(expected) > 50

    # curated rows keep the full document row
    assert set(got.columns) >= {"doc_id", "text", "lang", "source", BATCH_COL}

    # per-stage stats: monotone funnel, one row set per batch
    stats = spark.read.parquet(os.path.join(sink_dir, curate.STATS_TABLE))
    for b in (0, 200, 400):
        per = {r["stage"]: r["n"] for r in stats.filter(F.col(BATCH_COL) == b).collect()}
        assert set(per) == {"input", "quality", "dedup", "decontaminated", "sampled"}
        assert per["input"] >= per["quality"] >= per["dedup"] >= per["decontaminated"] >= per["sampled"]
    assert stats.filter(F.col("stage") == "sampled").agg(
        F.sum("n")
    ).collect()[0][0] == len(expected)

    # checkpoint resume: a second run is a no-op
    assert pipe.run(spark, from_block=0, to_block=499, batch_size=200) == 0
