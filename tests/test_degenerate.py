"""Degenerate-input hardening: every declared query must DEGRADE, not
crash, when the corpus is drained.

At 100 TB an upstream filter, a bad date predicate, or an empty daily
partition routinely hands an operator zero rows; a pipeline that throws
``IndexError`` from a driver-side ``collect()[0]`` at 2 a.m. is a page.
The sweep runs all 50 declared queries against 0-row schema-preserving
copies of the test tables and asserts each returns an empty result with
its normal schema.

Found-by-this-sweep (fixed in round 6): ivf_centroids on an empty
corpus returned [] and _assign_scored crashed on ``centroids[0][0]``;
pq_codebooks_from_codes' (correct) refusal to train on nothing
propagated out of q_similarity_topk instead of emptying the PQ arm.
"""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as se

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="session")
def empty_sf_dir(spark, tmp_path_factory) -> str:
    """0-row copies of every test table, schemas intact."""
    out = str(tmp_path_factory.mktemp("empty_sf"))
    for t in TABLES:
        df = spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet")
        df.limit(0).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out, f"{t}.parquet")
        )
    return out


@pytest.mark.parametrize("name", sorted(se.queries()))
def test_declared_query_survives_empty_input(name, spark, empty_sf_dir):
    df = se.queries()[name](spark, empty_sf_dir)
    assert df.count() == 0
    assert df.columns  # schema survives the drained corpus


def test_ivf_empty_codebook_yields_empty_index(spark):
    """Both assignment kernels honor the empty-codebook contract."""
    from pyspark.sql import functions as F

    from meta_morph_etl_databricks_spark.operators.similarity import ivf_index

    emb = spark.range(4).select(
        F.col("id").alias("vec_id"),
        F.array(F.rand(seed=1), F.rand(seed=2)).alias("embedding"),
    )
    for method in ("scored", "numpy"):
        idx = ivf_index(emb, [], method=method)
        assert idx.count() == 0
        assert set(idx.columns) >= {"vec_id", "embedding", "centroid_id"}


def test_pq_trainer_still_refuses_empty(spark):
    """The graceful query layer must NOT relax the trainer's contract:
    an explicit build step on an empty corpus is a configuration error."""
    from meta_morph_etl_databricks_spark.operators.quantize import (
        pq_codebooks_from_codes,
    )

    empty = spark.createDataFrame([], "vec_id long, q_vec array<bigint>")
    with pytest.raises(ValueError, match="no non-NULL codes"):
        pq_codebooks_from_codes(empty, m=4, ksub=16)
