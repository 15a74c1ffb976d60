"""Property-based tests (hypothesis): invariants of the reconciliation
engine and the MERGE upsert that hold for ALL inputs, not just the
testdata distributions.

Spark jobs are expensive per example, so examples are few but each
drives a full multi-row dataset through the engine.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from meta_morph_etl_databricks_spark.quality.reconcile import reconcile
from meta_morph_etl_databricks_spark.sources.sinks import merge_upsert

_slow = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

# values chosen to stress normalization: NULL vs '' sentinel collision,
# unicode, the reference's old unsafe separator char, numbers-as-strings
_VALS = st.one_of(
    st.none(),
    st.sampled_from(["", " ", "x", "§", "a\x01b", "0", "1.50"]),
    st.text(alphabet="ab ", max_size=4),
)
_ROWS = st.dictionaries(st.integers(0, 9), st.tuples(_VALS, _VALS), min_size=0, max_size=8)


def _df(spark, rows: dict):
    data = [(k, v[0], v[1]) for k, v in rows.items()]
    return spark.createDataFrame(data, "pk int, a string, b string") if data else spark.createDataFrame(
        [], "pk int, a string, b string"
    )


@_slow
@given(rows=_ROWS)
def test_reconcile_self_is_clean(spark, rows):
    """reconcile(df, df) finds nothing, for any df."""
    df = _df(spark, rows)
    r = reconcile(df, df, keys=["pk"])
    assert r.cells.count() == 0
    assert r.extra_source.count() == 0 and r.extra_target.count() == 0
    assert r.summary.count() == 0


@_slow
@given(rows=_ROWS, tweak=st.dictionaries(st.integers(0, 9), st.sampled_from(["zz", None, ""]), max_size=4))
def test_reconcile_detects_exactly_the_perturbed_cells(spark, rows, tweak):
    """Perturbing column 'a' of some shared keys is reported cell-exactly
    — except NULL↔'' flips, which the reference's na.fill('')
    normalization deliberately treats as equal."""
    if not rows:
        return
    df = _df(spark, rows)
    changed = {k: (tweak[k], v[1]) for k, v in rows.items() if k in tweak}
    target = _df(spark, {**rows, **changed})

    def norm(x):
        return "" if x is None else x

    expect = {
        k for k, v in rows.items() if k in tweak and norm(v[0]) != norm(tweak[k])
    }
    r = reconcile(df, target, keys=["pk"])
    got = {row.pk for row in r.cells.collect()}
    assert got == expect
    assert all(row.column_name == "a" for row in r.cells.collect())


@_slow
@given(
    base=st.dictionaries(st.integers(0, 9), st.text(alphabet="xy", max_size=3), min_size=1, max_size=6),
    update=st.dictionaries(st.integers(5, 14), st.text(alphabet="yz", max_size=3), min_size=1, max_size=6),
)
def test_merge_upsert_key_algebra(spark, tmp_path_factory, base, update):
    """After upsert: keys = base ∪ update; updated keys carry the update
    values, untouched keys keep base values; run twice → same state
    (idempotent)."""
    path = str(tmp_path_factory.mktemp("merge") / "t")
    bdf = spark.createDataFrame(list(base.items()), "pk int, v string")
    udf_ = spark.createDataFrame(list(update.items()), "pk int, v string")
    bdf.write.parquet(path)

    merge_upsert(spark, path, udf_, keys=["pk"])
    got = {r.pk: r.v for r in spark.read.parquet(path).collect()}
    assert got == {**base, **update}

    merge_upsert(spark, path, udf_, keys=["pk"])  # idempotent re-apply
    got2 = {r.pk: r.v for r in spark.read.parquet(path).collect()}
    assert got2 == got


def test_reconcile_separator_injection_safe(spark):
    """Rows engineered to collide under naive concat fingerprinting
    (value boundaries shifted across columns) MUST be reported as
    mismatches — xxhash64 hashes columns separately."""
    src = spark.createDataFrame([(1, "ab", "c")], "pk int, a string, b string")
    tgt = spark.createDataFrame([(1, "a", "bc")], "pk int, a string, b string")
    r = reconcile(src, tgt, keys=["pk"])
    assert r.cells.count() == 2  # both columns differ


@_slow
@given(edges=st.lists(st.tuples(st.integers(0, 19), st.integers(0, 19)), max_size=30))
def test_connected_components_matches_union_find(spark, edges):
    """The distributed alternating-star result equals a sequential
    union-find ground truth for ANY small graph — including self-loops
    (no connectivity), duplicate and reversed edges, and multiple
    components."""
    from meta_morph_etl_databricks_spark.operators.components import connected_components

    pairs = spark.createDataFrame(edges, "id_a long, id_b long") if edges else (
        spark.createDataFrame([], "id_a long, id_b long")
    )
    got = {(r.node, r.component) for r in connected_components(pairs).collect()}

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    nodes: set[int] = set()
    for a, b in edges:
        # self-loops carry no connectivity but DO mention the node —
        # it must appear (as a singleton unless other edges connect it)
        for n in (a, b):
            if n not in parent:
                parent[n] = n
                nodes.add(n)
        if a == b:
            continue
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp_min: dict[int, int] = {}
    for n in nodes:
        r = find(n)
        comp_min[r] = min(comp_min.get(r, n), n)
    want = {(n, comp_min[find(n)]) for n in nodes}
    assert got == want


@_slow
@given(
    docs=st.lists(
        st.tuples(st.integers(-50, 50), st.integers(0, 12)), max_size=20, unique_by=lambda t: t[0]
    ),
    budget=st.integers(1, 30),
    span=st.sampled_from([3, 7, 100]),
)
def test_pack_sequences_matches_sequential_packer(spark, docs, budget, span):
    """The sharded window packer equals a sequential start-fit packer
    run per shard: same shard assignment (floor division, negatives
    included), same pack index from the running token count."""
    from meta_morph_etl_databricks_spark.operators.packing import pack_sequences

    rows = [(i, " ".join(["w"] * n)) for i, n in docs]
    df = spark.createDataFrame(rows, "doc_id long, text string") if rows else (
        spark.createDataFrame([], "doc_id long, text string")
    )
    got = {
        r.doc_id: (r.shard, r.pack_in_shard, r.pack_id)
        for r in pack_sequences(df, budget_tokens=budget, shard_span=span).collect()
    }

    want = {}
    by_shard: dict[int, list[tuple[int, int]]] = {}
    for i, n in docs:
        by_shard.setdefault(i // span, []).append((i, n))
    for shard, members in by_shard.items():
        tokens_before = 0
        for i, n in sorted(members):
            pack = tokens_before // budget
            want[i] = (shard, pack, shard * (1 << 32) + pack)
            tokens_before += n
    assert got == want


@_slow
@given(
    vals=st.lists(
        st.tuples(st.integers(0, 255), st.integers(0, 255)), min_size=1, max_size=16
    ),
    bits=st.sampled_from([4, 8]),
)
def test_zorder_key_matches_python_morton(spark, vals, bits):
    """The codegen'd Morton key equals a pure-Python bit interleave for
    any 2-column input when quantization is the identity (range [0,
    2^bits) with in-range values clamped only by construction)."""
    from meta_morph_etl_databricks_spark.sources.layout import zorder_key

    top = (1 << bits) - 1
    df = spark.createDataFrame(vals, "x long, y long")
    got = [
        r.z
        for r in df.select(
            zorder_key([("x", 0.0, float(1 << bits)), ("y", 0.0, float(1 << bits))], bits=bits).alias("z")
        ).collect()
    ]

    def morton(x: int, y: int) -> int:
        x, y = min(x, top), min(y, top)
        out = 0
        for i in range(bits):
            out |= ((x >> i) & 1) << (2 * i)
            out |= ((y >> i) & 1) << (2 * i + 1)
        return out

    assert got == [morton(x, y) for x, y in vals]


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from(
                # \x0b: Java \s vs RE2 \s; İ/Σ/ı: locale-sensitive case
                # mappings where the engines' lower() disagree
                list("abAB \t\n\r\x0b\x0c") + ["é", "Ö", "İ", "ı", "Σ", "ς"]
            ),
            max_size=12,
        ),
        min_size=1,
        max_size=12,
    )
)
def test_fingerprint_classes_match_oracle_normalization(spark, texts):
    """The exact-dedup oracle groups on DuckDB's
    lower(trim(regexp_replace(text,'\\s+',' ','g'))) while the engine
    groups on xxhash64 of fingerprint()'s normalization — the two class
    algebras must coincide on EVERY input or q_dedup_exact's hash gate
    breaks on the first corpus with edge whitespace (the round-6
    trim-order bug was exactly such a divergence: Spark's trim strips
    only spaces, so trim-before-collapse left "\\thello" != "hello")."""
    import duckdb

    from meta_morph_etl_databricks_spark.operators.text import fingerprint
    from meta_morph_etl_databricks_spark.plans.ml_queries import _NORM_TEXT

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = df.select("doc_id", fingerprint(F.col("text")).alias("fp")).collect()
    spark_class: dict[int, list[int]] = {}
    for r in got:
        spark_class.setdefault(r["fp"], []).append(r["doc_id"])

    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    oracle = con.execute(
        f"SELECT list(doc_id ORDER BY doc_id) FROM t GROUP BY {_NORM_TEXT}"
    ).fetchall()
    con.close()

    spark_groups = sorted(sorted(v) for v in spark_class.values())
    oracle_groups = sorted(sorted(g[0]) for g in oracle)
    assert spark_groups == oracle_groups


_ASOF_LEFT = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 15)), min_size=0, max_size=12
)
_ASOF_RIGHT = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 15)), min_size=0, max_size=12
)


@_slow
@given(lrows=_ASOF_LEFT, rrows=_ASOF_RIGHT, tol=st.sampled_from([None, 0, 3]))
def test_asof_join_matches_pandas_merge_asof(spark, lrows, rrows, tol):
    """asof_join implements the pandas merge_asof contract (backward,
    allow_exact_matches, tolerance) for ALL inputs — dense timestamp
    ties, equal-ts left/right collisions, empty sides, zero tolerance.
    The right side is deduplicated per (key, ts) first: with duplicates
    the matched payload is contractually unspecified on both engines."""
    import pandas as pd

    from meta_morph_etl_databricks_spark.operators.asof import asof_join

    rdedup = {}
    for i, (k, ts) in enumerate(rrows):
        rdedup[(k, ts)] = i * 10
    left = spark.createDataFrame(
        [(k, ts, i) for i, (k, ts) in enumerate(lrows)] or [],
        "k int, ts long, lid int",
    )
    right = spark.createDataFrame(
        [(k, ts, p) for (k, ts), p in rdedup.items()] or [],
        "k int, ts long, payload int",
    )
    got = sorted(
        (r.k, r.ts, r.lid, r.payload, r.matched_ts)
        for r in asof_join(
            left, right, on=["k"], payload=["payload"], tolerance_seconds=tol
        ).collect()
    )

    if not rdedup:
        expected = sorted((k, ts, i, None, None) for i, (k, ts) in enumerate(lrows))
    else:
        lpd = (
            pd.DataFrame(
                [(k, ts, i) for i, (k, ts) in enumerate(lrows)],
                columns=["k", "ts", "lid"],
            )
            .astype("int64")  # empty frames default to object dtype
            .sort_values(["ts", "lid"], kind="stable")
        )
        rpd = (
            pd.DataFrame(
                [(k, ts, p, ts) for (k, ts), p in rdedup.items()],
                columns=["k", "ts", "payload", "matched_ts"],
            )
            .astype("int64")
            .sort_values("ts", kind="stable")
        )
        merged = pd.merge_asof(
            lpd, rpd, on="ts", by="k", direction="backward",
            allow_exact_matches=True, tolerance=tol,
        )
        expected = sorted(
            (
                int(r.k), int(r.ts), int(r.lid),
                None if pd.isna(r.payload) else int(r.payload),
                None if pd.isna(r.matched_ts) else int(r.matched_ts),
            )
            for r in merged.itertuples()
        )
    assert got == expected


@_slow
@given(
    toks=st.lists(st.integers(0, 9), min_size=0, max_size=40),
    chunk_tokens=st.integers(1, 12),
    overlap_frac=st.floats(0.0, 0.99),
)
def test_chunk_documents_covers_and_reconstructs(spark, toks, chunk_tokens, overlap_frac):
    """Chunking invariants for ALL (doc, chunk_tokens, overlap):
    chunk i is EXACTLY tokens[i*stride : i*stride + chunk_tokens] (so
    several trailing chunks may be partial when the doc is shorter than
    one window — the documented contract); stitching chunk i's first
    `stride` tokens plus the last chunk whole reconstructs the document
    exactly; chunk_idx is dense from 0."""
    from meta_morph_etl_databricks_spark.operators.packing import chunk_documents

    overlap = min(int(overlap_frac * chunk_tokens), chunk_tokens - 1)
    stride = chunk_tokens - overlap
    text = " ".join(f"t{t}" for t in toks)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    chunks = sorted(
        (r.chunk_idx, r.n_tokens, r.chunk_text.split(" ") if r.chunk_text else [])
        for r in chunk_documents(df, chunk_tokens, overlap).collect()
    )
    if not toks:
        assert chunks == []
        return
    assert [c[0] for c in chunks] == list(range(len(chunks)))
    expected_toks = [f"t{t}" for t in toks]
    rebuilt = []
    for idx, n_tok, words in chunks:
        assert n_tok == len(words)
        start = idx * stride
        assert words == expected_toks[start : start + chunk_tokens]
        rebuilt.extend(words[:stride] if idx < len(chunks) - 1 else words)
    assert rebuilt == expected_toks
