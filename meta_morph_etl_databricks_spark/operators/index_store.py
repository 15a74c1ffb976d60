"""Persisted incremental-dedup index storage: partitioned layout +
metadata sidecar + pruned serve.

operators/incremental.py defines the *join shapes* (band-key /
bucket equi-joins, O(increment) shuffle); this module supplies the
*storage contract* those shapes need to stay O(increment) end to end:

- **Partitioned layout.** Index rows are written
  ``partitionBy("pfx")`` where ``pfx = pmod(xxhash64(join keys),
  n_buckets)``.  A serve computes the increment's touched pfx values
  (a bounded ``distinct().collect()`` — at most ``n_buckets``
  integers) and reads the index with ``pfx.isin(touched)``: directory-
  level partition pruning skips every untouched bucket, so the
  per-increment index SCAN is O(touched buckets · rows-per-bucket) =
  O(increment · target_rows_per_bucket), not O(corpus).  Without this,
  an unpartitioned append-only index makes every daily batch re-read
  the whole corpus (measured: serve grew 1.39→3.7 s as the corpus grew
  4.9k→490k docs, BENCH_SCALE.json r6) — at 100 TB that is the
  difference between a dedup service and a daily full table scan.
  Size ``n_buckets`` to the CORPUS (``auto_index_buckets``): constant
  rows per bucket keeps serve cost flat as the corpus grows.
- **Metadata sidecar.** The build parameters are part of the index's
  identity — a ``num_hashes``/``bands`` mismatch makes band keys never
  align, and a ``dims``/``n_planes``/``center`` mismatch re-buckets
  the increment; both silently empty every join and ADMIT every
  duplicate.  ``create_*`` persists ``_index_meta.json`` next to the
  data (the underscore prefix keeps parquet readers from treating it
  as data, like ``_SUCCESS``); ``open_*``/``serve_*`` validate every
  axis against it and raise loudly on mismatch.  This replaces the
  old per-call signature-width probe (one driver action per
  micro-batch in the streaming sink) with a single tiny FS read.
- **Default-safe centering.** ``create_embedding_index`` computes the
  corpus mean by default (``center="auto"``) — real embedding corpora
  are anisotropic and uncentered sign buckets collapse onto the two
  all-same-sign codes (measured 20% of a 200k corpus in one bucket,
  BENCH_SCALE.md) — and persists it in the sidecar so every increment
  buckets with the build-time value without the caller re-supplying it.

Reference parity note: the reference has no incremental-dedup surface;
this extends its batch ETL model (ETL-Airflow full-reload DAGs) with
the production increment shape a 100 TB corpus forces.
"""

from __future__ import annotations

import json
import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .incremental import (
    IncrementalDedupResult,
    embedding_bucket_index,
    incremental_dedup,
    incremental_embed_near_dup,
    minhash_band_index,
)

META_FILE = "_index_meta.json"

BAND_KIND = "minhash_band"
EMBED_KIND = "embedding_bucket"


# ------------------------------------------------------------ sidecar
def write_index_meta(spark: SparkSession, path: str, meta: dict) -> None:
    """Persist ``meta`` as ``<path>/_index_meta.json`` via the Hadoop FS
    API (works on any supported filesystem, not just local — same
    rationale as sources.sinks.path_exists)."""
    from ..sources.sinks import _hadoop_fs

    fs, path_cls, _ = _hadoop_fs(spark, path)
    p = path_cls(f"{path.rstrip('/')}/{META_FILE}")
    out = fs.create(p, True)  # overwrite
    try:
        out.write(bytearray(json.dumps(meta, sort_keys=True).encode("utf-8")))
    finally:
        out.close()


def read_index_meta(spark: SparkSession, path: str) -> dict | None:
    """Read the sidecar, or None when the path has no index yet."""
    from ..sources.sinks import _hadoop_fs

    fs, path_cls, _ = _hadoop_fs(spark, path)
    p = path_cls(f"{path.rstrip('/')}/{META_FILE}")
    if not fs.exists(p):
        return None
    stream = fs.open(p)
    try:
        # read on the JVM side — py4j passes byte[] by value, so a
        # Python-side readFully(buf) would never see the bytes
        text = spark.sparkContext._jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
        return json.loads(text)
    finally:
        stream.close()


def _require_meta(meta: dict, expected: dict, path: str) -> None:
    """Loud error on ANY build-param mismatch — the alternative is a
    silently empty bucket join that admits every duplicate."""
    bad = {k: (meta.get(k), v) for k, v in expected.items() if meta.get(k) != v}
    if bad:
        detail = ", ".join(
            f"{k}: index={stored!r} caller={want!r}" for k, (stored, want) in bad.items()
        )
        raise ValueError(
            f"index at {path} was built with different parameters ({detail}) — "
            "use the stored values (open_* returns them) or rebuild the index"
        )


def auto_index_buckets(
    n_rows: int, target_rows_per_bucket: int = 500, floor: int = 32, cap: int = 1 << 20
) -> int:
    """Partition-count dial: buckets = rows / target, clamped.  Constant
    rows-per-bucket is the whole flat-serve argument — as the corpus
    grows 10×, buckets grow 10× and a fixed-size increment touches the
    same NUMBER of buckets, so its pruned scan reads the same number of
    ROWS.  ``cap`` bounds the directory count (object-store listing)."""
    return max(floor, min(cap, math.ceil(max(n_rows, 1) / target_rows_per_bucket)))


def _band_pfx(n_buckets: int) -> Column:
    return F.pmod(F.xxhash64("band_idx", "band_key"), F.lit(n_buckets)).cast("int")


def _bucket_pfx(n_buckets: int) -> Column:
    # NULL bucket (corrupt vectors) → NULL pfx → the Hive default
    # partition: never in any serve's touched set, so corrupt history
    # costs zero IO per increment.
    return F.when(
        F.col("bucket").isNotNull(),
        F.pmod(F.xxhash64("bucket"), F.lit(n_buckets)),
    ).cast("int")


def _band_schema(id_col: str) -> str:
    return f"{id_col} long, band_idx int, band_key long, sig array<bigint>, pfx int"


def _embed_schema(id_col: str) -> str:
    return f"{id_col} long, bucket bigint, q_vec array<tinyint>, q_norm double, pfx int"


def pruned_read(
    spark: SparkSession, path: str, schema: str, touched: list, prefix: str = "pfx"
):
    """Read ONLY the touched pfx buckets by constructing their directory
    paths outright (``basePath`` keeps the partition column).  This is
    the piece that makes serve cost independent of the corpus: handing
    the root path to ``spark.read`` triggers partition DISCOVERY over
    every bucket directory before pruning can apply — a per-serve
    listing job that grows with n_buckets (measured: +6 s per serve at
    4000 buckets).  Buckets with no directory yet (nothing hashed
    there) are skipped via per-bucket existence probes — O(touched) FS
    calls, deliberately NOT one listStatus of the root: pulling
    n_buckets FileStatus objects through py4j is O(corpus/bucket_size)
    driver work per serve (measured ~2 s at 4000 dirs), the exact
    dependence this function exists to remove."""
    from ..sources.sinks import _hadoop_fs

    fs, path_cls, _ = _hadoop_fs(spark, path)
    root = path.rstrip("/")
    want = []
    for t in touched:
        if t is None:
            continue
        d = f"{root}/{prefix}={t}"
        if fs.exists(path_cls(d)):
            want.append(d)
    if not want:
        return spark.createDataFrame([], schema)
    return spark.read.option("basePath", root).schema(schema).parquet(*want)


# --------------------------------------------------------- band index
def create_band_index(
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    n_buckets: int | None = None,
) -> dict:
    """Bootstrap the persisted MinHash band index over the accepted
    corpus: band rows + ``pfx`` partition column, written
    ``partitionBy("pfx")`` (repartitioned on pfx first so each bucket
    directory gets ONE file per write, not one per upstream task), plus
    the metadata sidecar.  Returns the meta dict.

    ``n_buckets`` defaults to ``auto_index_buckets`` over the corpus's
    band-row count (one count() action at build time — build is the
    amortized one-time cost, serves never pay it)."""
    rows = minhash_band_index(docs, text_col, id_col, num_hashes, bands)
    if n_buckets is None:
        n_buckets = auto_index_buckets(rows.count())
    meta = {
        "kind": BAND_KIND,
        "id_col": id_col,
        "num_hashes": num_hashes,
        "bands": bands,
        "n_buckets": n_buckets,
    }
    (
        rows.withColumn("pfx", _band_pfx(n_buckets))
        .repartition("pfx")
        .write.mode("overwrite")
        .partitionBy("pfx")
        .parquet(path)
    )
    write_index_meta(docs.sparkSession, path, meta)
    return meta


def append_band_rows(rows: DataFrame, path: str, meta: dict) -> None:
    """Append an increment's band rows (``IncrementalDedupResult
    .index_rows``) into the partitioned layout."""
    (
        rows.withColumn("pfx", _band_pfx(meta["n_buckets"]))
        .write.mode("append")
        .partitionBy("pfx")
        .parquet(path)
    )


def open_band_index(
    spark: SparkSession,
    path: str,
    num_hashes: int | None = None,
    bands: int | None = None,
) -> tuple[DataFrame, dict]:
    """Open a persisted band index: validate the sidecar against any
    caller-expected params (None = accept the stored value) and return
    ``(index_df, meta)``.  The explicit schema makes a meta-only path
    (crash between sidecar write and first row write) read as empty
    instead of failing schema inference."""
    meta = read_index_meta(spark, path)
    if meta is None:
        raise ValueError(f"no {META_FILE} at {path} — create_band_index first")
    if meta.get("kind") != BAND_KIND:
        raise ValueError(f"index at {path} is kind={meta.get('kind')!r}, not {BAND_KIND}")
    expected = {}
    if num_hashes is not None:
        expected["num_hashes"] = num_hashes
    if bands is not None:
        expected["bands"] = bands
    _require_meta(meta, expected, path)
    df = spark.read.schema(_band_schema(meta["id_col"])).parquet(path)
    return df, meta


def serve_incremental_dedup(
    new_docs: DataFrame,
    path: str,
    text_col: str = "text",
    est_threshold: float = 0.8,
    append: bool = True,
) -> IncrementalDedupResult:
    """One increment against the persisted band index, with pruning:

    1. band the increment once (persisted — it feeds the touched-pfx
       probe, the dedup joins, and the append);
    2. collect its touched pfx values (≤ n_buckets integers);
    3. read the index pruned to those partitions;
    4. run the :func:`~.incremental.incremental_dedup` policy (build
       params come from the sidecar — validated there, no data probe);
    5. optionally append the increment's band rows (ALL docs, accepted
       or not — the policy's index-grows-by-everything rule).

    The pruned read is the flat-serve mechanism: with ``n_buckets``
    sized to the corpus, a fixed-size increment touches a fixed number
    of buckets holding a fixed number of rows — serve cost stops
    growing with the corpus (BENCH_SCALE ``incremental_partitioned``
    measures it across a 10× corpus step)."""
    spark = new_docs.sparkSession
    meta = read_index_meta(spark, path)
    if meta is None:
        raise ValueError(f"no {META_FILE} at {path} — create_band_index first")
    if meta.get("kind") != BAND_KIND:
        raise ValueError(f"index at {path} is kind={meta.get('kind')!r}, not {BAND_KIND}")
    id_col, num_hashes, bands = meta["id_col"], meta["num_hashes"], meta["bands"]
    n_buckets = meta["n_buckets"]

    banded = (
        minhash_band_index(new_docs, text_col, id_col, num_hashes, bands)
        .withColumn("pfx", _band_pfx(n_buckets))
        .persist()
    )
    try:
        touched = [r.pfx for r in banded.select("pfx").distinct().collect()]
        index = pruned_read(spark, path, _band_schema(id_col), touched)
        res = incremental_dedup(
            new_docs,
            index.drop("pfx"),
            text_col,
            id_col,
            num_hashes,
            bands,
            est_threshold,
            index_meta=meta,
            _banded=banded.drop("pfx"),
        )
        if append:
            # pfx already on the cached rows — write them directly
            banded.write.mode("append").partitionBy("pfx").parquet(path)
        return res
    finally:
        banded.unpersist()


def _compact_paths(root: str) -> tuple[str, str]:
    return f"{root}__compact_tmp", f"{root}__compact_trash"


def recover_compaction(spark: SparkSession, path: str) -> str:
    """Restore a consistent index after a :func:`compact_index` crash.
    Idempotent; returns what it did:

    - ``"clean"`` — no compaction debris, nothing to do;
    - ``"restored"`` — a crash landed between the two renames (live dir
      missing, old index sitting in the trash dir): the old index is
      renamed back into place, complete — the seen-id store was COPIED
      into tmp before the swap, never moved out of the old tree;
    - ``"finished"`` — a crash landed after the new layout went live but
      before cleanup: the leftover trash (old layout) is deleted.

    In every case a leftover tmp dir is deleted — tmp is never the live
    index, so discarding it only costs re-running the compaction.
    :func:`compact_index` calls this first, which also prevents the
    Hadoop rename-into-existing-directory nesting a stale tmp/trash
    would otherwise cause."""
    from ..sources.sinks import _hadoop_fs

    root = path.rstrip("/")
    tmp, trash = _compact_paths(root)
    fs, path_cls, _ = _hadoop_fs(spark, root)
    state = "clean"
    if fs.exists(path_cls(trash)):
        if fs.exists(path_cls(root)):
            fs.delete(path_cls(trash), True)
            state = "finished"
        else:
            if not fs.rename(path_cls(trash), path_cls(root)):
                raise IOError(f"recover_compaction: could not restore {trash} → {root}")
            state = "restored"
    if fs.exists(path_cls(tmp)):
        fs.delete(path_cls(tmp), True)
    return state


def compact_index(spark: SparkSession, path: str) -> None:
    """Rewrite an index into one file per bucket, dropping duplicate
    rows.  Appends add O(touched) small files per increment and
    crash-replayed streaming batches can append the same band rows
    twice (both documented, both correctness-neutral — duplicate rows
    only produce duplicate candidates that the rejected-set distinct
    collapses); periodic compaction bounds the file count and the
    replay bloat.  Distinct is row-level-safe here because index rows
    are pure functions of the document (identical on re-derivation).

    Crash-safety contract: the rewrite goes through a sibling temp
    directory; the metadata sidecar AND the streaming seen-id store
    (``_seen_ids``, itself deduplicated and re-packed — it accumulates
    per-batch small files like the index does) are written into tmp
    BEFORE the swap, so every directory that can become live is
    complete on its own.  The swap is
    two renames (live → trash, tmp → live) — not atomic together, so a
    crash exactly between them leaves no live directory; the old index
    survives intact in the trash dir and :func:`recover_compaction`
    (run automatically at the start of every compaction, or standalone)
    renames it back.  Leftover tmp/trash dirs from a crashed run are
    likewise recovered/cleaned first — they never nest into the new
    layout.  Not safe under concurrent WRITERS — run it where the
    appender runs (e.g. between streaming triggers)."""
    from ..sources.sinks import _hadoop_fs

    recover_compaction(spark, path)
    meta = read_index_meta(spark, path)
    if meta is None:
        raise ValueError(f"no {META_FILE} at {path} — nothing to compact")
    schema = (
        _band_schema(meta["id_col"])
        if meta.get("kind") == BAND_KIND
        else _embed_schema(meta["id_col"])
    )
    root = path.rstrip("/")
    tmp, trash = _compact_paths(root)
    (
        spark.read.schema(schema)
        .parquet(root)
        .distinct()
        .repartition("pfx")
        .write.mode("overwrite")
        .partitionBy("pfx")
        .parquet(tmp)
    )
    write_index_meta(spark, tmp, meta)
    fs, path_cls, _ = _hadoop_fs(spark, root)
    # REWRITE (not move) the seen store into tmp pre-swap — it is never
    # outside a live-capable tree, whichever side a crash leaves live —
    # and compact it on the way: each streaming batch appends one file
    # per touched prefix, so the sidecar accumulates small files exactly
    # like the index does, and replayed batches can duplicate its rows
    # (harmless to the anti-join, pure bloat).  Distinct is safe: rows
    # are (id, prefix-of-id) — pure functions of the id.
    if fs.exists(path_cls(f"{root}/_seen_ids")):
        (
            spark.read.schema(f"{meta['id_col']} long, spfx int")
            .parquet(f"{root}/_seen_ids")
            .distinct()
            .repartition("spfx")
            .write.mode("overwrite")
            .partitionBy("spfx")
            .parquet(f"{tmp}/_seen_ids")
        )
    if not fs.rename(path_cls(root), path_cls(trash)):
        raise IOError(f"compact_index: could not move {root} aside")
    if not fs.rename(path_cls(tmp), path_cls(root)):
        fs.rename(path_cls(trash), path_cls(root))  # roll back
        raise IOError(f"compact_index: could not install {tmp}")
    fs.delete(path_cls(trash), True)


# ---------------------------------------------------- embedding index
def create_embedding_index(
    embeddings: DataFrame,
    path: str,
    dims: int = 64,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    center: list[float] | str | None = "auto",
    n_buckets: int | None = None,
) -> dict:
    """Bootstrap the persisted embedding bucket index.  ``center="auto"``
    (the default) computes the bootstrap corpus mean
    (:func:`~.similarity.embedding_center`) — the safe default for real
    anisotropic corpora — and persists it in the sidecar so increments
    bucket with the build-time value forever; pass an explicit list to
    pin it, or None for the raw uncentered function (isotropic/test
    data)."""
    from .similarity import embedding_center

    if center == "auto":
        center = embedding_center(embeddings, dims, vec_col)
    rows = embedding_bucket_index(embeddings, dims, n_planes, id_col, vec_col, center)
    if n_buckets is None:
        n_buckets = auto_index_buckets(rows.count())
    meta = {
        "kind": EMBED_KIND,
        "id_col": id_col,
        "dims": dims,
        "n_planes": n_planes,
        "center": center,
        "n_buckets": n_buckets,
    }
    (
        rows.withColumn("pfx", _bucket_pfx(n_buckets))
        .repartition("pfx")
        .write.mode("overwrite")
        .partitionBy("pfx")
        .parquet(path)
    )
    write_index_meta(embeddings.sparkSession, path, meta)
    return meta


def append_embed_rows(rows: DataFrame, path: str, meta: dict) -> None:
    (
        rows.withColumn("pfx", _bucket_pfx(meta["n_buckets"]))
        .write.mode("append")
        .partitionBy("pfx")
        .parquet(path)
    )


def open_embedding_index(
    spark: SparkSession,
    path: str,
    dims: int | None = None,
    n_planes: int | None = None,
    center: list[float] | None = None,
    check_center: bool = False,
) -> tuple[DataFrame, dict]:
    """Open a persisted embedding index; validate dims/n_planes (and the
    center when ``check_center``) against the sidecar.  The center is a
    float list — validation is exact equality, which is the point: the
    bucket function is bit-deterministic in it, so "almost the same
    center" is a DIFFERENT bucket function."""
    meta = read_index_meta(spark, path)
    if meta is None:
        raise ValueError(f"no {META_FILE} at {path} — create_embedding_index first")
    if meta.get("kind") != EMBED_KIND:
        raise ValueError(f"index at {path} is kind={meta.get('kind')!r}, not {EMBED_KIND}")
    expected: dict = {}
    if dims is not None:
        expected["dims"] = dims
    if n_planes is not None:
        expected["n_planes"] = n_planes
    if check_center:
        expected["center"] = center
    _require_meta(meta, expected, path)
    df = spark.read.schema(_embed_schema(meta["id_col"])).parquet(path)
    return df, meta


def serve_incremental_embed_near_dup(
    new_embeddings: DataFrame,
    path: str,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    append: bool = True,
) -> IncrementalDedupResult:
    """Embedding sibling of :func:`serve_incremental_dedup`: dims /
    n_planes / center ALL come from the sidecar (the caller cannot
    drift them), the index read is pruned to the increment's touched
    pfx buckets, and the increment's rows (corrupt ones included, with
    their NULL buckets) append back."""
    spark = new_embeddings.sparkSession
    meta = read_index_meta(spark, path)
    if meta is None:
        raise ValueError(f"no {META_FILE} at {path} — create_embedding_index first")
    if meta.get("kind") != EMBED_KIND:
        raise ValueError(f"index at {path} is kind={meta.get('kind')!r}, not {EMBED_KIND}")
    id_col, dims, n_planes = meta["id_col"], meta["dims"], meta["n_planes"]
    center, n_buckets = meta["center"], meta["n_buckets"]

    new_rows = (
        embedding_bucket_index(new_embeddings, dims, n_planes, id_col, vec_col, center)
        .withColumn("pfx", _bucket_pfx(n_buckets))
        .persist()
    )
    try:
        touched = [
            r.pfx
            for r in new_rows.select("pfx").where(F.col("pfx").isNotNull()).distinct().collect()
        ]
        index = pruned_read(spark, path, _embed_schema(id_col), touched)
        res = incremental_embed_near_dup(
            new_embeddings,
            index.drop("pfx"),
            threshold,
            dims,
            n_planes,
            id_col,
            vec_col,
            center,
            index_meta=meta,
            _new_rows=new_rows.drop("pfx"),
        )
        if append:
            new_rows.write.mode("append").partitionBy("pfx").parquet(path)
        return res
    finally:
        new_rows.unpersist()
