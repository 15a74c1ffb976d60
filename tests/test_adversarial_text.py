"""Adversarial text-content hardening: NULL, empty, whitespace-only,
single-token, emoji/CJK/RTL unicode, and pathological repeated/huge
tokens through the text-analysis and dedup operator families.

A web-scale corpus contains ALL of these (binary-sniffed pages decode
to emoji soup; boilerplate is one token repeated 10k times; CJK text
has no ASCII word boundaries).  The operators must neither crash nor
emit rows that poison downstream joins (NULL keys fanning out, NaN
scores ordering unpredictably).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

ADVERSARIAL = [
    (0, None),
    (1, ""),
    (2, "   \t\n  "),
    (3, "one"),
    (4, "🎉🎊✨ 🎉🎊✨ 🎉🎊✨"),
    (5, "日本語のテキストです 中文文本 한국어"),
    (6, "مرحبا بالعالم שלום עולם"),
    (7, "tok " * 5000),  # one token repeated — degenerate shingle set
    (8, "x" * 20000),  # one huge unbroken token
    (9, "normal english text with several distinct words here"),
    (10, "normal english text with several distinct words here"),  # dup of 9
]


@pytest.fixture(scope="module")
def adv_docs(spark):
    return spark.createDataFrame(ADVERSARIAL, "doc_id long, text string")


def test_profile_handles_adversarial_text(spark, adv_docs):
    from meta_morph_etl_databricks_spark.operators.text import profile_documents

    rows = {r["doc_id"]: r for r in profile_documents(adv_docs).collect()}
    assert len(rows) == len(ADVERSARIAL)  # nothing dropped, nothing fanned out
    for r in rows.values():
        # scores stay bounded and non-NaN so downstream ORDER BY is total
        assert r["quality"] is not None and 0.0 <= r["quality"] <= 1.0
        assert r["n_tokens"] is not None and r["n_tokens"] >= 0
    assert rows[0]["n_tokens"] == 0  # NULL text profiles as empty, not NULL
    assert rows[2]["n_tokens"] == 0  # whitespace-only has no tokens
    assert rows[7]["n_tokens"] == 5000


def test_exact_dedup_normalization_classes(spark, adv_docs):
    from meta_morph_etl_databricks_spark.operators.dedup import exact_dedup

    kept = {r["doc_id"]: r["dup_count"] for r in exact_dedup(adv_docs).collect()}
    # (9, 10) are true dups; whitespace-only NORMALIZES to '' so (1, 2)
    # share a fingerprint (the documented trim+collapse contract); NULL
    # must stay its own class, never merged with ''
    assert sorted(kept) == [0, 1, 3, 4, 5, 6, 7, 8, 9]
    assert kept[9] == 2 and kept[1] == 2 and kept[0] == 1


def test_minhash_lsh_survives_adversarial_text(spark, adv_docs):
    from meta_morph_etl_databricks_spark.operators.dedup import (
        minhash_lsh_candidates,
        ngram_jaccard_pairs,
    )

    cands = minhash_lsh_candidates(adv_docs)
    pairs = {(r["id_a"], r["id_b"]) for r in cands.collect()}
    assert (9, 10) in pairs  # the genuine dup is found
    verified = ngram_jaccard_pairs(adv_docs, threshold=0.8, candidates=cands)
    vpairs = {(r["id_a"], r["id_b"]) for r in verified.collect()}
    assert (9, 10) in vpairs
    # shingle-less docs (NULL/empty/whitespace/single-token) never verify
    # against each other at jaccard >= 0.8 — no NULL-key mega-bucket
    assert all(a >= 3 and b >= 3 for a, b in vpairs)


def test_simhash_codes_adversarial(spark, adv_docs):
    from meta_morph_etl_databricks_spark.operators.dedup import simhash_codes

    rows = {r["doc_id"]: r["simhash"] for r in simhash_codes(adv_docs).collect()}
    assert len(rows) == len(ADVERSARIAL)
    for v in rows.values():
        assert v is not None  # a NULL code would vanish from band joins
    assert rows[9] == rows[10]  # identical text → identical code


def test_fingerprint_and_chunking_adversarial(spark, adv_docs):
    from meta_morph_etl_databricks_spark.operators.packing import chunk_documents
    from meta_morph_etl_databricks_spark.operators.text import fingerprint

    fps = adv_docs.select("doc_id", fingerprint(F.col("text")).alias("fp")).collect()
    assert len(fps) == len(ADVERSARIAL)
    chunks = chunk_documents(adv_docs, chunk_tokens=128, overlap=16)
    by_id = {r["doc_id"]: r["count"] for r in chunks.groupBy("doc_id").count().collect()}
    # token-less docs produce no chunks; the 5000-token doc produces many
    assert 0 not in by_id and 1 not in by_id and 2 not in by_id
    # starts step by stride=112 while any tokens remain: floor((n-1)/112)+1
    assert by_id[7] == (5000 - 1) // 112 + 1
    assert by_id[3] == 1 and by_id[8] == 1


def test_decontaminate_adversarial_eval_set(spark, adv_docs):
    """An eval set containing NULL/empty text must not nuke the corpus
    (a NULL shingle matching everything would flag every doc)."""
    from meta_morph_etl_databricks_spark.operators.dedup import decontaminate

    eval_docs = spark.createDataFrame(
        [(100, None), (101, ""), (102, "normal english text with several distinct words here")],
        "doc_id long, text string",
    )
    flags = decontaminate(adv_docs, eval_docs, shingle_n=5)
    contaminated = {r["doc_id"] for r in flags.collect() if r["contaminated"]}
    # only the docs sharing a real 5-gram with eval text are flagged
    assert contaminated == {9, 10}
