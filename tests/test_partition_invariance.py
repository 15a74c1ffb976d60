"""Partition-invariance: operator results must be a pure function of the
DATA, not of the physical layout that happens to deliver it.

On a real cluster the same table arrives as 1 file or 10,000, pre-sorted
or shuffled, through 32 cores or 1,000 — an operator whose output shifts
with any of that is nondeterministic at scale even if every small test
passes.  Each case here runs the operator over the same rows under
adversarial layouts — many small partitions, a single partition, and a
DESCENDING pre-sort (catches windows that lean on incidental input
order) — and requires bit-identical results.

Ops that are layout-pure by construction (row-local projections) are not
re-tested here; the suite targets the ones with a window, a global
aggregate probe, a sketch, or a shuffle in the middle, where layout
dependence is a real failure mode (e.g. ``df.sample`` is seed-stable
only per-partitioning — the trap ``sampling.py`` exists to avoid).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from meta_morph_etl_databricks_spark.operators.asof import asof_join
from meta_morph_etl_databricks_spark.operators.bucketing import quantile_cutoffs
from meta_morph_etl_databricks_spark.operators.dedup import (
    decontaminate,
    exact_dedup,
    minhash_lsh_candidates,
    simhash_hamming_pairs,
)
from meta_morph_etl_databricks_spark.operators.packing import (
    chunk_documents,
    pack_sequences,
)
from meta_morph_etl_databricks_spark.operators.quantize import quantize_int8
from meta_morph_etl_databricks_spark.operators.rangejoin import range_join
from meta_morph_etl_databricks_spark.operators.sampling import mix_corpus
from meta_morph_etl_databricks_spark.operators.sketches import heavy_hitters


def layouts(df, order_col):
    """The same rows under three adversarial physical layouts."""
    return [
        df.repartition(13),
        df.coalesce(1),
        df.orderBy(F.col(order_col).desc()).repartition(7),
    ]


def rowset(df):
    return {tuple(r) for r in df.collect()}


def assert_layout_invariant(make_df, op, order_col="doc_id"):
    base = make_df()
    expected = rowset(op(base))
    for i, layout in enumerate(layouts(base, order_col)):
        got = rowset(op(layout))
        assert got == expected, f"layout {i} changed the result"
    assert expected  # the case must exercise something


@pytest.fixture(scope="module")
def corpus(spark):
    # Mixed-length docs with exact dups, near-dups, and unique tails;
    # non-contiguous ids so id-derived shards have ragged occupancy.
    rows = []
    for i in range(120):
        did = i * 7 + (i % 3)  # non-contiguous, non-monotone-gap ids
        if i % 10 == 0:
            text = "the quick brown fox jumps over the lazy dog " * 3
        elif i % 10 == 1:
            text = "the quick brown fox jumps over the lazy dog " * 3 + f"tail{i}"
        else:
            text = " ".join(f"tok{i}w{j}" for j in range(5 + (i % 37)))
        rows.append((did, text, f"src{i % 4}"))
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    df.createOrReplaceTempView("_pinv_corpus")
    return df


def test_pack_sequences_layout_invariant(corpus):
    assert_layout_invariant(
        lambda: corpus,
        lambda df: pack_sequences(df, budget_tokens=64, shard_span=100),
    )


def test_chunk_documents_layout_invariant(corpus):
    assert_layout_invariant(
        lambda: corpus,
        lambda df: chunk_documents(df, chunk_tokens=16, overlap=4),
    )


def test_exact_dedup_layout_invariant(corpus):
    assert_layout_invariant(lambda: corpus, exact_dedup)


def test_minhash_lsh_candidates_layout_invariant(corpus):
    assert_layout_invariant(
        lambda: corpus,
        lambda df: minhash_lsh_candidates(df, num_hashes=16, bands=4, with_estimate=True),
    )


def test_simhash_pairs_layout_invariant(corpus):
    assert_layout_invariant(
        lambda: corpus,
        lambda df: simhash_hamming_pairs(df, bits=24, max_hamming=2),
    )


def test_decontaminate_layout_invariant(corpus, spark):
    eval_docs = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog " * 2)],
        "doc_id long, text string",
    )
    assert_layout_invariant(
        lambda: corpus,
        lambda df: decontaminate(df, eval_docs, shingle_n=5),
    )


def test_mix_corpus_layout_invariant(corpus):
    weights = {"src0": 2.5, "src1": 0.4, "src2": 1.0, "src3": 0.0}
    assert_layout_invariant(
        lambda: corpus,
        lambda df: mix_corpus(df, weights, seed=11).select("doc_id", "source", "copy_idx"),
    )


def test_heavy_hitters_layout_invariant(spark):
    rows = (
        [("hot",)] * 400
        + [("warm",)] * 150
        + [(f"cold{i % 97}",) for i in range(450)]
    )
    df = spark.createDataFrame(rows, "k string")
    assert_layout_invariant(
        lambda: df,
        lambda d: heavy_hitters(d, "k", support=0.1),
        order_col="k",
    )


def test_quantize_int8_layout_invariant(spark):
    # The max-|v| scale probe is a row-local array_max, but pin it anyway:
    # codes must not depend on which partition a vector landed in.
    rows = [
        (i, [float((i * 31 + j * 7) % 19) - 9.0 for j in range(8)]) for i in range(200)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    assert_layout_invariant(
        lambda: df,
        lambda d: quantize_int8(d).select(
            "vec_id", "q_scale", F.col("q_vec").cast("string").alias("q_vec")
        ),
        order_col="vec_id",
    )


def test_exact_quantile_cutoffs_layout_invariant(spark):
    rows = [(i, float((i * 137) % 1000) / 7.0) for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, v double")
    probs = [0.1, 0.5, 0.9]
    expected = quantile_cutoffs(df, "v", probs, exact=True)
    for layout in layouts(df, "id"):
        assert quantile_cutoffs(layout, "v", probs, exact=True) == expected


def test_asof_join_layout_invariant(spark):
    # Right side deduplicated per (key, ts): with duplicates the matched
    # payload is contractually unspecified (asof.py docstring), so a
    # layout-invariance claim only holds on the deduplicated contract.
    left = spark.createDataFrame(
        [(i % 5, float(i), i) for i in range(300)], "k int, ts double, lid int"
    )
    right = spark.createDataFrame(
        [(i % 5, float(i * 3) + 0.5, i * 10) for i in range(60)],
        "k int, ts double, payload int",
    )

    def run(lf):
        return asof_join(lf, right, on=["k"], payload=["payload"])

    expected = rowset(run(left))
    for layout in layouts(left, "lid"):
        assert rowset(run(layout)) == expected
    for rlayout in layouts(right, "payload"):
        assert rowset(asof_join(left, rlayout, on=["k"], payload=["payload"])) == expected


def test_range_join_layout_invariant(spark):
    left = spark.createDataFrame(
        [(i % 4, i * 13 % 500, i) for i in range(400)], "k int, v long, lid int"
    )
    right = spark.createDataFrame(
        [(i % 4, i * 40, i * 40 + 55, i) for i in range(12)],
        "k int, s long, e long, rid int",
    )

    def run(lf, rf):
        return range_join(lf, rf, "v", "s", "e", bucket_width=64, on=["k"])

    expected = rowset(run(left, right))
    for layout in layouts(left, "lid"):
        assert rowset(run(layout, right)) == expected
    for rlayout in layouts(right, "rid"):
        assert rowset(run(left, rlayout)) == expected
