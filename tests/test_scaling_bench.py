"""The scaling harness's synthesis model (scripts/scaling_bench.py).

The 1x/4x/16x curves in SCALING.json are only meaningful if the
synthesized corpora model GROWTH, not replication — these tests pin
the invariants the docstring promises: K-times rows, disjoint keys per
copy, cross-copy-distinct shingles, copy-0 byte identity, consistent
n_chars, and referential integrity across scaled fact tables.
"""

from __future__ import annotations

import importlib.util
import os

import pytest
from pyspark.sql import functions as F

_SCRIPT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scripts",
    "scaling_bench.py",
)
spec = importlib.util.spec_from_file_location("scaling_bench", _SCRIPT)
sb = importlib.util.module_from_spec(spec)
spec.loader.exec_module(sb)


@pytest.fixture(scope="module")
def scaled4(spark, sf_dir, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("scaling"))
    out = sb._build_scale_dir(spark, sf_dir, root, 4)
    return out


def test_registry_query_names_resolve():
    import __spark_entry__ as entry_mod

    qs = dict(entry_mod.queries())
    qs.update(sb.EXTRA_WORKLOADS)
    missing = [n for n in sb.DEFAULT_QUERIES if n not in qs]
    assert not missing, missing
    assert sb.EXPECTED_SUPERLINEAR <= set(sb.DEFAULT_QUERIES)


def test_fact_tables_scale_k_times_with_disjoint_keys(spark, sf_dir, scaled4):
    for name, keys in sb.FACT_KEYS.items():
        src = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        dst = spark.read.parquet(os.path.join(scaled4, f"{name}.parquet"))
        n_src, n_dst = src.count(), dst.count()
        assert n_dst == 4 * n_src, (name, n_src, n_dst)
        # each copy's offset block contributes a disjoint key range, so
        # the distinct-key count scales exactly 4x (keys like l_orderkey
        # repeat WITHIN a copy, never across copies)
        key = keys[0]
        n_keys_src = src.select(key).distinct().count()
        assert dst.select(key).distinct().count() == 4 * n_keys_src, name
        # every row lands in exactly one copy block
        blocks = (
            dst.select((F.col(key) / sb.KEY_OFFSET).cast("long").alias("b"))
            .groupBy("b")
            .count()
            .collect()
        )
        assert sorted(r["b"] for r in blocks) == [0, 1, 2, 3], (name, blocks)
        assert all(r["count"] == n_src for r in blocks), (name, blocks)


def test_documents_copy0_identical_and_copies_shingle_disjoint(
    spark, sf_dir, scaled4
):
    src = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    dst = spark.read.parquet(os.path.join(scaled4, "documents.parquet"))
    # copy 0 is byte-identical to the source corpus
    copy0 = dst.filter(F.col("doc_id") < sb.KEY_OFFSET)
    assert copy0.exceptAll(src).count() == 0
    assert src.exceptAll(copy0).count() == 0
    # a copy-k word never equals any copy-0 word (the ~k suffix), so no
    # shingle can collide across copies and near-dup pair counts scale
    # linearly instead of quadratically
    words = dst.select(
        (F.col("doc_id") / sb.KEY_OFFSET).cast("long").alias("b"),
        F.explode(F.split("text", " ")).alias("w"),
    )
    overlap = (
        words.filter(F.col("b") == 0)
        .select("w")
        .intersect(words.filter(F.col("b") == 3).select("w"))
        .count()
    )
    assert overlap == 0
    # n_chars stays consistent with the rewritten text
    bad = dst.filter(F.col("n_chars") != F.length("text")).count()
    assert bad == 0


def test_embeddings_perturbed_only_in_element_zero(spark, sf_dir, scaled4):
    src = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    dst = spark.read.parquet(os.path.join(scaled4, "embeddings.parquet"))
    one = dst.filter(
        (F.col("vec_id") >= sb.KEY_OFFSET) & (F.col("vec_id") < 2 * sb.KEY_OFFSET)
    ).select(
        (F.col("vec_id") - sb.KEY_OFFSET).alias("vec_id"),
        F.col("embedding").alias("e1"),
    )
    joined = src.join(one, "vec_id").select(
        F.expr("slice(embedding, 2, size(embedding) - 1)").alias("tail0"),
        F.expr("slice(e1, 2, size(e1) - 1)").alias("tail1"),
        (F.element_at("e1", 1) - F.element_at("embedding", 1)).alias("d0"),
    )
    assert joined.count() == src.count()
    assert joined.filter(F.col("tail0") != F.col("tail1")).count() == 0
    # element 0 moved by ~1e-4 for copy 1 (float32 rounding tolerance)
    assert (
        joined.filter((F.col("d0") < 5e-5) | (F.col("d0") > 2e-4)).count() == 0
    )


def test_embedding_labels_disjoint_across_copies(spark, sf_dir, scaled4):
    """label is a blocking key (cosine_near_dup_pairs groups on it) —
    copies must land in NEW groups, or blocked self-joins measure the
    K^2 pair blowup of a degenerate corpus instead of the operator."""
    src = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    dst = spark.read.parquet(os.path.join(scaled4, "embeddings.parquet"))
    n_labels = src.select("label").distinct().count()
    per_copy = (
        dst.select(
            F.floor(F.col("vec_id") / sb.KEY_OFFSET).alias("copy"), "label"
        )
        .distinct()
        .groupBy("copy")
        .count()
        .collect()
    )
    assert len(per_copy) == 4
    assert all(r["count"] == n_labels for r in per_copy)
    # and the label sets themselves are disjoint: total distinct = 4x
    assert dst.select("label").distinct().count() == 4 * n_labels


def test_orders_lineitem_referential_integrity_preserved(spark, scaled4):
    o = spark.read.parquet(os.path.join(scaled4, "orders.parquet"))
    l = spark.read.parquet(os.path.join(scaled4, "lineitem.parquet"))
    orphans = l.join(o, l.l_orderkey == o.o_orderkey, "left_anti").count()
    assert orphans == 0


def test_dims_are_symlinked_unscaled(sf_dir, scaled4):
    for name in sb.DIMS:
        p = os.path.join(scaled4, f"{name}.parquet")
        assert os.path.islink(p)
        assert os.path.realpath(p) == os.path.realpath(
            os.path.join(sf_dir, f"{name}.parquet")
        )
