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
import numbers
import time
from contextlib import contextmanager

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .incremental import (
    IncrementalDedupResult,
    embedding_bucket_index,
    incremental_dedup,
    incremental_embed_near_dup,
    incremental_semantic_near_dup,
    minhash_band_index,
    semantic_cell_index,
)

META_FILE = "_index_meta.json"
ROWS_FILE = "_rows"
APPENDS_FILE = "_appends"
# default compact_due threshold — priced by BENCH_SCALE.compact_serve:
# one compaction costs about one grown-store serve after ~8 increments
COMPACT_MAX_APPENDS = 8
TOMBSTONES_FILE = "_tombstones.json"

BAND_KIND = "minhash_band"
EMBED_KIND = "embedding_bucket"
SEM_KIND = "semantic_cell"
IVF_KIND = "ivf_lists"


# ------------------------------------------------------------ sidecar
def _write_small_file(spark: SparkSession, path: str, text: str) -> None:
    from ..sources.sinks import _hadoop_fs

    fs, path_cls, _ = _hadoop_fs(spark, path)
    out = fs.create(path_cls(path), True)  # overwrite
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def _replace_small_file(spark: SparkSession, path: str, text: str) -> None:
    """Atomically REPLACE a small file that readers may be watching:
    write a tmp sibling, rename over the destination (the
    :func:`_install_pointer` protocol, factored out in round 11 —
    round-10 advice: the live generation's running row counter was
    rewritten with the plain truncate-and-write ``fs.create``, so a
    crash or concurrent read mid-write observed an EMPTY/partial file).
    On filesystems whose rename refuses an existing destination the
    delete+rename fallback leaves a momentary NO-FILE window instead of
    a torn one — every reader of these files treats "missing" as "fall
    back" (:func:`live_root` → highest complete generation,
    :func:`live_index` → the meta sidecar's build-time count), so no
    reader ever observes a partial write."""
    from ..sources.sinks import _hadoop_fs

    fs, path_cls, _ = _hadoop_fs(spark, path)
    tmp = f"{path}.tmp"
    _write_small_file(spark, tmp, text)
    if not fs.rename(path_cls(tmp), path_cls(path)):
        fs.delete(path_cls(path), False)
        if not fs.rename(path_cls(tmp), path_cls(path)):
            raise IOError(f"could not replace {path}")


def _read_small_file(spark: SparkSession, path: str) -> str | None:
    from ..sources.sinks import _hadoop_fs

    fs, path_cls, _ = _hadoop_fs(spark, path)
    p = path_cls(path)
    if not fs.exists(p):
        return None
    try:
        stream = fs.open(p)
    except Exception as e:  # TOCTOU: exists() raced a delete+rename flip
        # Hadoop's local rename refuses an existing destination, so
        # every pointer flip takes the delete+rename fallback — a
        # concurrent reader can see exists()=true then open()=FNFE.
        # Treat it as "missing": live_root's highest-complete-gen
        # fallback already covers a momentarily absent pointer.
        if "FileNotFoundException" in str(e):
            return None
        raise
    try:
        # read on the JVM side — py4j passes byte[] by value, so a
        # Python-side readFully(buf) would never see the bytes
        return spark.sparkContext._jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
    finally:
        stream.close()


def write_index_meta(spark: SparkSession, path: str, meta: dict) -> None:
    """Persist ``meta`` as ``<path>/_index_meta.json`` via the Hadoop FS
    API (works on any supported filesystem, not just local — same
    rationale as sources.sinks.path_exists).  ``path`` is a DATA dir
    (a generation dir, or a legacy flat root) — no pointer resolution;
    the generation protocol relies on writing meta into a specific gen
    (and writing it LAST, see :func:`compact_index`)."""
    _write_small_file(
        spark, f"{path.rstrip('/')}/{META_FILE}", json.dumps(meta, sort_keys=True)
    )


def read_index_meta(spark: SparkSession, path: str) -> dict | None:
    """Read the sidecar of the index at ``path`` (pointer-resolved —
    callers hand the index ROOT), or None when the path has no index
    yet.  Callers that also read DATA must use :func:`live_index`
    instead — resolving the pointer here and again for the data opens a
    flip window that pairs one generation's meta with another's rows."""
    return live_index(spark, path)[1]


def live_index(spark: SparkSession, path: str) -> tuple[str, dict | None]:
    """Resolve the pointer ONCE and read the sidecar from that resolved
    generation: ``(live_dir, meta-or-None)``.  The single resolution is
    the point (round-9 advice): a serve that called read_index_meta()
    then live_root() separately could race a pointer flip between the
    two calls and pair generation N's meta with generation N+1's data —
    benign under compaction (meta is preserved) but a rebuild that
    changes ``n_buckets`` or the assigner tree would mis-route the pfx
    pruning with stale meta.  Every open/serve path goes through here.

    Counter overlay: for kinds that maintain the running row counter
    (``rows`` in the sidecar — SEM since r10, IVF since r11), the LIVE
    value lives in a separate ``_rows`` file so the meta sidecar stays
    WRITE-ONCE after its generation completes (round-10 advice: the old
    in-place meta rewrite left a truncation window on the completeness
    marker itself).  The overlay is read here — callers see one merged
    dict; a missing/torn ``_rows`` degrades to the sidecar's build-time
    count (a late drift dial, never a broken index)."""
    live = live_root(spark, path)
    text = _read_small_file(spark, f"{live.rstrip('/')}/{META_FILE}")
    if text is None:
        return live, None
    meta = json.loads(text)
    if "rows" in meta:
        counted = _read_small_file(spark, f"{live.rstrip('/')}/{ROWS_FILE}")
        if counted is not None:
            try:
                meta["rows"] = int(counted.strip())
            except ValueError:  # torn legacy write — build-time count stands
                pass
    return live, meta


# ----------------------------------------------------- generation layout
# An index root contains a one-line pointer file and generation dirs:
#
#   <root>/_current          →  "gen-0000003"   (the LIVE generation)
#   <root>/gen-0000003/      →  pfx=* partitions, _index_meta.json,
#                                _seen_ids/ (streaming sidecar)
#
# Every read resolves through the pointer, so REPLACING the index
# (compaction, re-cluster rebuild) is: build the next generation dir
# completely — data, seen store, and the meta sidecar LAST, so "has
# meta" = "complete" — then atomically rewrite the pointer.  A reader
# can never observe a half-swapped index: it either still resolves the
# old generation or already the new one (the round-8 two-rename swap
# had a between-renames window with NO live directory — a concurrent
# reader errored; the pointer closes it).  Readers are PASSIVE (resolve
# only, never delete), so they are safe DURING a live compaction;
# debris cleanup (stale generations, pointer tmp) belongs to writers
# via :func:`recover_compaction`.
#
# Legacy flat indexes (data directly under root, pre-pointer) resolve
# to the root itself and stay readable/servable; :func:`compact_index`
# on one raises with a :func:`migrate_index` hint.
CURRENT_FILE = "_current"
_GEN_PREFIX = "gen-"


def _gen_dir_names(spark: SparkSession, root: str) -> list[str]:
    """Names of generation dirs under root (empty when root missing)."""
    from ..sources.sinks import _hadoop_fs

    fs, path_cls, _ = _hadoop_fs(spark, root)
    p = path_cls(root)
    if not fs.exists(p):
        return []
    out = []
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith(_GEN_PREFIX):
            out.append(name)
    return sorted(out)


def _complete_gens(spark: SparkSession, root: str) -> list[str]:
    """Generation dirs that finished their build (meta written last)."""
    from ..sources.sinks import _hadoop_fs

    fs, path_cls, _ = _hadoop_fs(spark, root)
    return [
        g
        for g in _gen_dir_names(spark, root)
        if fs.exists(path_cls(f"{root}/{g}/{META_FILE}"))
    ]


def _install_pointer(spark: SparkSession, root: str, gen: str) -> None:
    """Atomically point ``_current`` at ``gen`` — tmp + rename-over
    (:func:`_replace_small_file`); on filesystems whose rename refuses
    an existing destination the delete+rename fallback leaves a window
    with no pointer, which readers survive via the highest-complete-
    generation fallback in :func:`live_root`."""
    _replace_small_file(spark, f"{root}/{CURRENT_FILE}", gen)


def live_root(spark: SparkSession, path: str) -> str:
    """The index's LIVE data dir: the pointed-to generation, else (no
    pointer — an HDFS-style delete+rename window, or a crash before the
    first pointer landed) the highest COMPLETE generation, else the
    root itself (legacy flat layout, or nothing there yet).  Read-only —
    never mutates, so it is safe under a concurrently-running
    compaction."""
    from ..sources.sinks import _hadoop_fs

    root = path.rstrip("/")
    fs, path_cls, _ = _hadoop_fs(spark, root)
    gen = _read_small_file(spark, f"{root}/{CURRENT_FILE}")
    if gen is not None:
        gen = gen.strip()
        if gen and fs.exists(path_cls(f"{root}/{gen}")):
            return f"{root}/{gen}"
    # legacy flat layout: meta at the root itself — checked BEFORE the
    # generation listing, because a flat root holds n_buckets child dirs
    # and listing it per serve is exactly the O(corpus/bucket) driver
    # cost pruned_read exists to avoid
    if fs.exists(path_cls(f"{root}/{META_FILE}")):
        return root
    done = _complete_gens(spark, root)
    if done:
        return f"{root}/{done[-1]}"
    return root


def _new_generation(spark: SparkSession, root: str) -> str:
    """Next generation dir name (not yet created)."""
    gens = _gen_dir_names(spark, root)
    nxt = 0 if not gens else max(int(g[len(_GEN_PREFIX):]) for g in gens) + 1
    return f"{_GEN_PREFIX}{nxt:07d}"


WRITER_LOCK_SUFFIX = "__writer_lock"

# roots whose writer lock THIS thread currently holds — makes the lock
# REENTRANT per thread (r11 review): a streaming batch body holds the
# slot for its whole append sequence, and the maintenance ops it calls
# in-line (compact/recluster/rebucket, recover, clear_tombstones)
# re-enter instead of deadlocking.  Thread-LOCAL on purpose: two
# threads of one process are two writers and must still serialize
# through the marker file (pinned by the concurrent compact+retract
# test).
import threading as _threading

_lock_holders = _threading.local()


@contextmanager
def writer_lock(
    spark: SparkSession,
    path: str,
    op: str,
    retries: int = 0,
    retry_interval_sec: float = 1.0,
    owner: str | None = None,
):
    """ENFORCE the single-writer index slot (round-10 verdict task 3).

    Every generation-writing op (create/init/migrate, compact, retract,
    recluster, retrain, tombstone) runs its whole body — including its
    leading :func:`recover_compaction` — inside this lock; before it,
    the single-writer rule was docstring convention only, and two
    concurrent writers could both pass recovery and race
    :func:`_new_generation` into interleaved half-generations.  Readers
    stay lock-free (the pointer protocol already gives them atomic
    snapshots); plain appends stay lock-free too — they are the
    streaming sink's per-trigger hot path and the sink IS the single
    appender by contract (``append_ivf_vectors`` docstring).

    Mechanics: the lock is an atomically-created marker file at
    ``<root>__writer_lock`` — a SIBLING of the index root, not inside
    it, so :func:`migrate_index`'s rename-the-root-aside and the debris
    reaper never touch it (same placement as ``merge_upsert``'s
    ``__lock``, sources/sinks.py).  The marker body records the op name
    and acquire time for operators staring at a stuck slot.  Release is
    in ``finally`` — an exception inside the op frees the slot (its
    half-built generation is debris the next writer's recovery reaps);
    only a hard process kill leaves the lock behind, and then the next
    writer FAILS LOUDLY naming :func:`break_writer_lock` rather than
    corrupting the slot.  ``retries``: the loser polls and re-tries, so
    concurrent maintenance ops serialize instead of failing.

    ``owner`` (r12 — stranded-stream self-heal): a stable identity
    token for the writer, recorded in the breadcrumb.  A hard-killed
    holder (kill -9/OOM — routine for long-running streams) strands the
    marker; without a token the restarted stream polled out its retries
    and died even though its own replay is safe.  When the acquire
    fails AND the stranded breadcrumb names the SAME owner, the lock is
    reclaimed (deleted and re-acquired): the only writer that can carry
    this token is a prior incarnation of the same logical job — the
    streaming sinks pass their CHECKPOINT path, and Structured
    Streaming's one-active-query-per-checkpoint contract means a
    same-token holder is necessarily dead.  Distinct owners (or a
    crumbless marker — a holder mid-acquire) never reclaim; the marker
    is rename-CAPTURED and re-verified before removal so a concurrent
    replacement is restored, not deleted (see
    :func:`_reclaim_own_lock` for the capture protocol and the honest
    non-claim about two LIVE drivers sharing a checkpoint)."""
    from ..sources.sinks import _hadoop_fs, _try_acquire_lock

    root = path.rstrip("/")
    held = getattr(_lock_holders, "roots", None)
    if held is None:
        held = _lock_holders.roots = set()
    if root in held:  # same-spelling re-entry: zero JVM calls (hot path)
        yield
        return
    fs, path_cls, _ = _hadoop_fs(spark, root)
    # reentrancy keys on the CANONICAL root (r11 verdict nit: keying the
    # raw string alone meant `/x/idx` vs `file:/x/idx` in one call chain
    # self-deadlocked instead of re-entering — both spell the same
    # marker file, so the inner acquire saw "exists" forever).  Built
    # from URI components, not toString(): Hadoop renders a scheme-less
    # input as `file:///x` but a schemed one as `file:/x` (empty vs
    # null authority — same filesystem, different strings).  The holder
    # set carries BOTH spellings so the common same-spelling re-entry
    # above never pays the makeQualified round-trip (r12 review); the
    # two namespaces cannot collide (canonicals always carry
    # `scheme://`, and a raw `file:/x` spelling differs from the
    # canonical `file:///x`).
    uri = fs.makeQualified(path_cls(root)).toUri()
    key = f"{uri.getScheme()}://{uri.getAuthority() or ''}{uri.getPath()}"
    if key in held:  # cross-spelling re-entry
        yield
        return
    lock_path = f"{root}{WRITER_LOCK_SUFFIX}"
    lock = path_cls(lock_path)
    acquired = False
    for attempt in range(retries + 1):
        if _try_acquire_lock(fs, lock):
            acquired = True
            break
        if owner is not None and _reclaim_own_lock(
            spark, fs, path_cls, lock, lock_path, owner
        ):
            if _try_acquire_lock(fs, lock):
                acquired = True
                break
        if attempt < retries:
            time.sleep(retry_interval_sec)
    if not acquired:
        raise IOError(
            f"{op}: {lock_path} exists — another writer holds the index's "
            "single-writer slot (or a previous writer was hard-killed; run "
            "break_writer_lock() after confirming it is dead, or pass "
            "lock_retries to wait for the holder)"
        )
    try:
        # best-effort breadcrumb for operators; losing it to a crash
        # costs nothing (the empty marker still locks)
        try:
            crumb = {"op": op, "acquired_unix": time.time()}
            if owner is not None:
                crumb["owner"] = owner
            _write_small_file(spark, lock_path, json.dumps(crumb))
        except Exception:
            pass
        held.add(root)
        held.add(key)
        yield
    finally:
        held.discard(root)
        held.discard(key)
        fs.delete(lock, False)


def _reclaim_own_lock(spark, fs, path_cls, lock, lock_path: str, owner: str) -> bool:
    """True when the stranded marker's breadcrumb names ``owner`` and
    the marker was removed — see :func:`writer_lock`'s owner contract.
    A missing, empty, or torn breadcrumb never reclaims (a live holder
    that just won the marker has not written its crumb yet).

    TOCTOU hardening (r12 review): a peek-then-delete could remove a
    DIFFERENT writer's marker that replaced the stranded one between
    the two calls (requires a manual :func:`break_writer_lock` racing
    this reclaim — out of its documented "only after confirming the
    holder is dead" contract, but cheap to defend).  The marker is
    therefore CAPTURED by an atomic rename to a sidecar name first;
    the captured file is then exactly the marker that was removed, so
    the owner check re-runs against it — a foreign capture is renamed
    back (restored) instead of deleted.

    What this deliberately does NOT defend: two LIVE drivers sharing
    one checkpoint (split-brain / double-submission).  Spark's own
    offset log, commit log and state store are already unsafe under
    that deployment — the index lock is not the last line of defense
    for a violated one-active-query-per-checkpoint contract, and a
    lease/fencing protocol cannot be built from plain filesystem
    renames anyway.  Keep one live query per checkpoint."""
    try:
        text = _read_small_file(spark, lock_path)
        if not text or not text.strip():
            return False
        crumb = json.loads(text)
        if not isinstance(crumb, dict) or crumb.get("owner") != owner:
            return False
        # capture: rename the marker aside, then judge the captured file
        cap_path = f"{lock_path}.reclaim"
        cap = path_cls(cap_path)
        fs.delete(cap, False)  # stale capture from a crashed reclaim
        if not fs.rename(lock, cap):
            return False  # marker vanished or contended — retry loop decides
        text2 = _read_small_file(spark, cap_path)
        crumb2 = json.loads(text2) if text2 and text2.strip() else None
        if isinstance(crumb2, dict) and crumb2.get("owner") == owner:
            fs.delete(cap, False)
            return True
        # captured an innocent replacement — restore it; if yet another
        # writer acquired during the capture window, the restore fails
        # and the capture is dropped (that writer now owns the slot)
        if not fs.rename(cap, lock):
            fs.delete(cap, False)
        return False
    except Exception:
        return False


def _locked_writer(fn):
    """Decorator enforcing :func:`writer_lock` around a generation-
    writing op.  The op's first parameter supplies the SparkSession
    (directly, or via ``.sparkSession`` on a DataFrame for the
    ``create_*`` builders), its second is the index root.  Every
    decorated op gains keyword-only ``lock_retries`` /
    ``lock_retry_interval_sec`` so concurrent maintenance can choose to
    serialize instead of failing fast."""
    import functools

    @functools.wraps(fn)
    def wrapper(
        *args,
        lock_retries: int = 0,
        lock_retry_interval_sec: float = 1.0,
        **kwargs,
    ):
        first = args[0]
        spark = first if isinstance(first, SparkSession) else first.sparkSession
        path = args[1] if len(args) > 1 else kwargs["path"]
        with writer_lock(
            spark, path, fn.__name__, lock_retries, lock_retry_interval_sec
        ):
            return fn(*args, **kwargs)

    return wrapper


def break_writer_lock(spark: SparkSession, path: str) -> bool:
    """Operator-grade recovery from a hard-killed writer: remove the
    ``__writer_lock`` marker so the next writer can take the slot.
    Returns whether a lock existed.  ONLY safe after confirming the
    previous holder is dead — the half-built generation it left behind
    is reaped by the next writer's :func:`recover_compaction`, so no
    further cleanup is needed.  Also drops a ``.reclaim`` capture
    sidecar a crashed :func:`_reclaim_own_lock` may have orphaned
    (harmless debris — it locks nothing — but this is the tidy-up
    point)."""
    from ..sources.sinks import _hadoop_fs

    root = path.rstrip("/")
    fs, path_cls, _ = _hadoop_fs(spark, root)
    fs.delete(path_cls(f"{root}{WRITER_LOCK_SUFFIX}.reclaim"), False)
    return bool(fs.delete(path_cls(f"{root}{WRITER_LOCK_SUFFIX}"), False))


def _reject_legacy_for_write(spark: SparkSession, root: str) -> None:
    """create_* over a LEGACY flat index must not interleave generation
    dirs with the flat data (the stale root sidecar would hijack the
    pointer-loss fallback later) — migrate or pick a fresh path.  Also
    the shared create-path spot for the glob-literal root guard (r12 —
    see :func:`_reject_glob_root`): every builder calls here before
    writing anything."""
    _reject_glob_root(root)
    if _read_small_file(spark, f"{root}/{CURRENT_FILE}") is None and _read_small_file(
        spark, f"{root}/{META_FILE}"
    ) is not None:
        raise ValueError(
            f"{root} holds a legacy flat index — run migrate_index first, or "
            "create the new index at a fresh path"
        )


@_locked_writer
def init_index(spark: SparkSession, path: str, meta: dict) -> str:
    """Bootstrap an EMPTY index at ``path`` in the generation layout:
    create the first generation with only the meta sidecar and point
    ``_current`` at it.  Returns the live data dir.  (The streaming
    sinks use this on their first batch; batch ``create_*`` builders
    write data first and call :func:`_finish_generation` instead.)"""
    root = path.rstrip("/")
    _reject_glob_root(root)
    gen = _new_generation(spark, root)
    write_index_meta(spark, f"{root}/{gen}", meta)
    _install_pointer(spark, root, gen)
    return f"{root}/{gen}"


def _finish_generation(spark: SparkSession, root: str, gen: str, meta: dict) -> None:
    """Complete a freshly-built generation: meta LAST (completeness
    marker), then flip the pointer.  The now-stale previous generation
    is deliberately NOT deleted here — an in-flight reader that
    resolved it just before the flip may still be scanning its files.
    Stale generations are reaped at the START of the next writer cycle
    (:func:`recover_compaction`, which every compaction, create and
    streaming batch runs first), so readers get a full writer cycle of
    grace — the standard MVCC retire-on-next-checkpoint trade."""
    write_index_meta(spark, f"{root}/{gen}", meta)
    _install_pointer(spark, root, gen)


@_locked_writer
def migrate_index(spark: SparkSession, path: str) -> str:
    """Move a legacy FLAT index (data directly under root) into the
    generation layout so compaction/rebuild get the reader-atomic
    pointer swap.  Steps (each idempotent, resumed by
    :func:`recover_compaction` after a crash): rename root aside to
    ``<root>__migrate``, recreate root, rename the sidelined tree in as
    generation 0, install the pointer.  Returns the live dir."""
    from ..sources.sinks import _hadoop_fs

    root = path.rstrip("/")
    _reject_glob_root(root)  # the migrated index must be pruned-servable
    fs, path_cls, _ = _hadoop_fs(spark, root)
    if _read_small_file(spark, f"{root}/{CURRENT_FILE}") is not None:
        return live_root(spark, root)  # already pointer layout
    side = f"{root}__migrate"
    if not fs.exists(path_cls(side)):
        if read_index_meta(spark, root) is None:
            raise ValueError(f"no index at {root} to migrate")
        if not fs.rename(path_cls(root), path_cls(side)):
            raise IOError(f"migrate_index: could not move {root} aside")
    gen = f"{_GEN_PREFIX}{0:07d}"
    fs.mkdirs(path_cls(root))
    if not fs.rename(path_cls(side), path_cls(f"{root}/{gen}")):
        raise IOError(f"migrate_index: could not install {side} as {gen}")
    _install_pointer(spark, root, gen)
    return f"{root}/{gen}"


def _open_live(spark: SparkSession, path: str, kind: str, hint: str) -> tuple[str, dict]:
    """One pointer resolution → ``(live_dir, meta)`` with the kind
    checked; raises when no index exists yet.  The open/serve entry
    gate shared by all index kinds."""
    live, meta = live_index(spark, path)
    if meta is None:
        raise ValueError(f"no {META_FILE} at {path} — {hint} first")
    if meta.get("kind") != kind:
        raise ValueError(f"index at {path} is kind={meta.get('kind')!r}, not {kind}")
    return live, meta


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


# The id column's TYPE is part of the index's identity: every read
# goes through an explicit schema, and a wrong id type is silently
# read as all-NULL (round-8 advice: the seen-store rewrite hardcoded
# long in two modules).  ``create_*`` records it once in the sidecar
# (from the bootstrap frame's dtype); every schema below derives from
# the meta, and serves validate the increment's dtype against it.
def _id_type(meta: dict) -> str:
    return meta.get("id_type", "bigint")


def _band_schema(meta: dict) -> str:
    return f"{meta['id_col']} {_id_type(meta)}, band_idx int, band_key long, sig array<bigint>, pfx int"


def _embed_schema(meta: dict) -> str:
    return f"{meta['id_col']} {_id_type(meta)}, bucket bigint, q_vec array<tinyint>, q_norm double, pfx int"


def _sem_schema(meta: dict) -> str:
    return f"{meta['id_col']} {_id_type(meta)}, cell int, q_vec array<tinyint>, q_norm double, pfx int"


def _seen_schema(meta: dict) -> str:
    return f"{meta['id_col']} {_id_type(meta)}, spfx int"


def _ivf_schema(meta: dict) -> str:
    idc, idt = meta["id_col"], _id_type(meta)
    if meta["codec"] == "pq":
        return f"{idc} {idt}, centroid_id long, pq_code array<tinyint>, pq_norm_sq long, pfx int"
    return f"{idc} {idt}, {meta['vec_col']} array<double>, centroid_id long, _n double, pfx int"


def _kind_schema(meta: dict) -> str:
    """Row schema for an index's kind — one registry so compaction,
    retraction and every open path read the same shape."""
    by_kind = {
        BAND_KIND: _band_schema,
        EMBED_KIND: _embed_schema,
        SEM_KIND: _sem_schema,
        IVF_KIND: _ivf_schema,
    }
    return by_kind[meta["kind"]](meta)


def _check_id_type(df: DataFrame, meta: dict, path: str) -> None:
    """Raise when an increment's id dtype differs from the index's —
    the explicit-schema reads would otherwise NULL every stored id."""
    got = dict(df.dtypes).get(meta["id_col"])
    if got is not None and got != _id_type(meta):
        raise ValueError(
            f"index at {path} stores {meta['id_col']} as {_id_type(meta)}, "
            f"increment carries {got} — rebuild the index or align the id type"
        )


def _bump_rows(spark: SparkSession, live: str, meta: dict, delta: int) -> dict:
    """Maintain the running row count — the O(1) feed for the drift
    dials (:func:`semantic_recluster_due`, :func:`ivf_retrain_due`;
    round-9 verdict task: the dial previously LISTED every bucket's
    parquet footers per poll, O(files) in the corpus).  Only kinds
    whose meta carries ``rows`` (SEM since r10, IVF since r11; older
    sidecars fall back to the footer count) pay it — one atomic
    small-file replace per committed append.

    The counter lives in its own ``_rows`` file, NOT the meta sidecar
    (round-10 advice): rewriting ``_index_meta.json`` in the LIVE
    generation used a truncate-and-write, and because a generation
    counts as complete once its meta EXISTS, a crash mid-write left an
    empty completeness marker that broke every subsequent open — and
    concurrent passive readers could transiently read the truncated
    sidecar during every committed streaming append.  The split keeps
    the meta write-once after completion; ``_rows`` is replaced via
    tmp+rename (:func:`_replace_small_file`) and its loss merely
    degrades the dial to the build-time count (:func:`live_index`
    overlays it back into ``meta['rows']`` on every resolution).

    The delta is applied to the LIVE counter file, not the caller's
    snapshot (r11 review): two appends that both carried the same
    stale ``meta`` dict would otherwise write base+delta twice and
    clobber the first bump.  Single-writer by the appender contract,
    so the read-add-replace needs no lock."""
    if "rows" not in meta or not delta:
        return meta
    cur = _read_small_file(spark, f"{live.rstrip('/')}/{ROWS_FILE}")
    try:
        base = int(cur.strip()) if cur is not None else int(meta["rows"])
    except ValueError:  # torn legacy write — meta snapshot stands
        base = int(meta["rows"])
    meta = dict(meta, rows=base + int(delta))
    _replace_small_file(spark, f"{live.rstrip('/')}/{ROWS_FILE}", str(meta["rows"]))
    # r14: the committed-append counter feeds compact_due the same way
    # rows feeds the growth dials.  It lives in the live generation, so
    # ANY generational rewrite (compact/rebucket/recluster/retrain/
    # retract) resets it for free — new generations start without the
    # file.  Loss degrades the dial to "not due", never worse.
    _replace_small_file(
        spark,
        f"{live.rstrip('/')}/{APPENDS_FILE}",
        str(_appends_count(spark, live) + 1),
    )
    return meta


def _appends_count(spark: SparkSession, live: str) -> int:
    cur = _read_small_file(spark, f"{live.rstrip('/')}/{APPENDS_FILE}")
    try:
        return int(cur.strip()) if cur is not None else 0
    except ValueError:  # torn legacy write — counter restarts
        return 0


def _cell_pfx(n_buckets: int) -> Column:
    # NULL cell (corrupt vectors) → NULL pfx → the Hive default
    # partition, same convention as _bucket_pfx
    return F.when(
        F.col("cell").isNotNull(), F.pmod(F.xxhash64("cell"), F.lit(n_buckets))
    ).cast("int")


# ------------------------------------------------------- seen-id store
def _seen_pfx(id_col: str, n_buckets: int) -> Column:
    """THE seen-store partition convention — ``pmod(xxhash64(id),
    n_buckets)`` — defined ONCE next to its siblings (_band/_bucket/
    _cell/_list_pfx) and used by every writer and reader of a
    ``_seen_ids`` sidecar: the streaming sinks' fresh-filter and
    commit-marker append, and :func:`recluster_semantic_index`'s seen
    re-pack (round-10 advice: the recluster inlined the expression; a
    future change to the convention would have silently diverged and
    misrouted seen pruning after a recluster)."""
    return F.pmod(F.xxhash64(id_col), F.lit(n_buckets)).cast("int")


def _seen_dir(live: str) -> str:
    # underscore prefix: parquet partition discovery over the live index
    # dir ignores it, like _SUCCESS / _index_meta.json.  ``live`` is the
    # RESOLVED generation dir — the seen store travels with its
    # generation (compaction re-packs it into the next one).
    return f"{live.rstrip('/')}/_seen_ids"


def seen_filter_fresh(batch_df: DataFrame, live: str, meta: dict) -> DataFrame:
    """Drop ids already processed by a committed batch.  The seen store
    is an 8-bytes/doc sidecar partitioned by the :func:`_seen_pfx`
    id-hash prefix: the batch's touched prefixes are collected (bounded
    by n_buckets) and the anti-join reads ONLY those partitions —
    O(batch) per batch, vs the old design's full-index distinct()
    scan+shuffle every trigger.  The id's type comes from the sidecar
    meta (round-8 advice: it was hardcoded long in two modules).

    Tombstone interaction (r11): a tombstoned id's seen entry must not
    drop its redelivery — takedown means the id is RE-PROCESSABLE, same
    consequence the physical :func:`retract_ids` gives by purging the
    entry — so the seen frame is first thinned by the live tombstone
    set (broadcast anti-join over a driver-side legal-list, O(ids))."""
    from ..sources.sinks import path_exists

    spark = batch_df.sparkSession
    id_col, n_buckets = meta["id_col"], meta["n_buckets"]
    sd = _seen_dir(live)
    if not path_exists(spark, sd):
        return batch_df
    touched = [
        r.p
        for r in batch_df.select(_seen_pfx(id_col, n_buckets).alias("p"))
        .distinct()
        .collect()
    ]
    seen = pruned_read(spark, sd, _seen_schema(meta), touched, prefix="spfx")
    tombs = _typed_stored_tombstones(meta, _tombstone_list(spark, live))
    if tombs:
        seen = seen.join(F.broadcast(_ids_df(spark, meta, tombs)), id_col, "left_anti")
    return batch_df.join(seen.select(id_col), id_col, "left_anti")


def append_seen_ids(ids_df: DataFrame, live: str, meta: dict) -> None:
    """Record a committed batch's ids in the seen sidecar (the sinks'
    per-batch commit marker — written LAST, after the data appends)."""
    id_col, n_buckets = meta["id_col"], meta["n_buckets"]
    (
        ids_df.select(F.col(id_col), _seen_pfx(id_col, n_buckets).alias("spfx"))
        .write.mode("append")
        .partitionBy("spfx")
        .parquet(_seen_dir(live))
    )


# ----------------------------------------------------------- tombstones
# O(ids) takedown (round-10 verdict design note): retract_ids is
# correct and crash-safe but rewrites EVERY bucket of the live
# generation even when the takedown touches three rows — at 100 TB
# that is a full index rewrite per legal takedown.  The tombstone path
# splits the cost: tombstone_ids appends the ids to a tiny JSON
# sidecar in the live generation (one atomic small-file replace —
# takedown lists are legal artifacts, driver-side by construction,
# exactly like retract_ids' ``ids``), every serve/open hides the ids
# with a broadcast anti-join (map-side, O(ids) extra work), and the
# next ALREADY-SCHEDULED generational rewrite — compaction, recluster,
# retrain, or a physical retract — reaps the rows for free and drops
# the sidecar.  Policy equivalence with retract_ids is immediate for
# serves (rows invisible either way) and for streaming redelivery
# (seen_filter_fresh thins the seen frame by the tombstone set, so a
# redelivered tombstoned id is re-processed; the sink then CLEARS its
# tombstone when it re-ingests the id, so the re-accepted content is
# servable again — the same end state the physical purge reaches).
def _tombstone_list(spark: SparkSession, live: str) -> list:
    """The live generation's pending-takedown ids (empty when none).
    One tiny-file read — serves already read the meta sidecar, this is
    the same class of cost.

    Missing-file fallback (r11 review): :func:`_replace_small_file`'s
    delete+rename path (the one Hadoop's local/HDFS rename-refuses-
    existing forces) has a no-file window, and for THIS sidecar
    "missing" must not read as "no takedowns" — that would transiently
    serve taken-down rows.  The tmp sibling holds the complete NEW
    list for the whole window, so a reader that finds the final name
    missing reads the tmp instead; the drain path deletes both (see
    :func:`clear_tombstones`), and an orphaned tmp from a CRASHED
    update is only ever consulted while the final name is absent —
    i.e. during a later drain, whose both-files delete clears it.

    Torn-tmp retry (r12 advice): while the final name is absent, the
    NEXT update's :func:`_write_small_file` truncate-rewrites the tmp
    in place, so a lock-free reader can observe it mid-write — a torn
    json.loads is retried (the writer finishes in milliseconds), and a
    tmp that vanished between the two reads (the update's rename just
    completed) re-reads the final name instead of reporting "no
    tombstones" — this sidecar must never transiently under-report.
    The retry budget backs off to ~3 s total (takedown lists are
    legal-artifact-scale JSON, written in milliseconds even on a slow
    store — a window outliving the budget is corruption, not load),
    and exhausting it RAISES rather than serving without the sidecar."""
    base = f"{live.rstrip('/')}/{TOMBSTONES_FILE}"
    for attempt in range(8):
        text = _read_small_file(spark, base)
        if text is None:
            text = _read_small_file(spark, f"{base}.tmp")
            if text is None:
                # tmp raced away under us — one more final read settles
                # whether a replace just completed or nothing exists
                text = _read_small_file(spark, base)
        if text is None:
            return []
        try:
            return json.loads(text)
        except ValueError:  # torn tmp mid-rewrite — re-read
            if attempt == 7:
                raise IOError(
                    f"{base}(.tmp) persistently unparseable — takedown "
                    "sidecar corrupt; refusing to serve without it"
                )
            time.sleep(0.05 * (attempt + 1))


def _ids_df(spark: SparkSession, meta: dict, ids: list) -> DataFrame:
    return spark.createDataFrame(
        [(i,) for i in ids], f"{meta['id_col']} {_id_type(meta)}"
    )


# id classes a takedown/retraction request may carry, per sidecar id
# type.  bool is excluded from the integer class deliberately: True
# would silently tombstone id 1.  Integer classes use numbers.Integral
# (r13 advice): pandas-sourced pipelines hand over numpy.int64 ids,
# which createDataFrame accepts — exact `int` isinstance would reject
# previously-working callers.
_ID_PYTYPES: dict[str, tuple[type, ...]] = {
    "bigint": (numbers.Integral,),
    "long": (numbers.Integral,),
    "int": (numbers.Integral,),
    "integer": (numbers.Integral,),
    "smallint": (numbers.Integral,),
    "tinyint": (numbers.Integral,),
    "string": (str,),
}


def _check_request_ids(meta: dict, ids: list, path: str) -> list:
    """Reject takedown/retraction ids whose PYTHON type cannot be a key
    of this index (r13 review): a wrong-type id written to the
    tombstone sidecar poisons every later serve — ``_ids_df`` raises
    ``LongType can not accept object 'x'`` on each append/seen-thinning
    batch until the sidecar is hand-edited.  Fail the REQUEST instead,
    before anything persists.  Unknown sidecar types skip the check
    (forward compatibility beats a false reject).

    Returns the CANONICALIZED id list: integral ids are coerced to
    plain ``int`` (r13 advice — numpy.int64 from pandas-sourced
    pipelines is a valid key but json.dumps rejects it when the
    tombstone sidecar persists)."""
    allowed = _ID_PYTYPES.get(_id_type(meta).lower())
    if allowed is None:
        return list(ids)
    bad = [
        i for i in ids
        if not isinstance(i, allowed) or isinstance(i, bool)
    ]
    if bad:
        raise TypeError(
            f"index at {path} keys {meta.get('id_col')!r} as "
            f"{_id_type(meta)}; request contains incompatible id(s) "
            f"{bad[:5]!r} — a persisted wrong-type id would crash every "
            "subsequent serve"
        )
    if allowed == (numbers.Integral,):
        return [int(i) for i in ids]
    return list(ids)


def _typed_stored_tombstones(meta: dict, stored: list) -> list:
    """Filter a STORED tombstone list down to ids type-compatible with
    the sidecar's id column (r14 review): a pre-r13-guard sidecar can
    hold wrong-typed junk (e.g. a stringified int under a bigint
    index), and feeding it onward crashes ``_ids_df``/``createDataFrame``
    — blocking valid retractions.  Dropping the junk is semantically a
    no-op: a wrong-typed id can never equal any id the index's column
    type can store, so it was hiding nothing; the generational rewrite
    (or the next takedown's sidecar rewrite) then heals it out of the
    persisted list.  Unknown sidecar types keep everything (forward
    compatibility, same rule as the request guard)."""
    allowed = _ID_PYTYPES.get(_id_type(meta).lower())
    if allowed is None:
        return list(stored)
    kept = [
        i for i in stored
        if isinstance(i, allowed) and not isinstance(i, bool)
    ]
    if allowed == (numbers.Integral,):
        kept = [int(i) for i in kept]
    return kept


_TOMBSTONE_ISIN_MAX = 1024


def _minus_tombstones(
    spark: SparkSession, live: str, meta: dict, df: DataFrame, tombs: list | None = None
) -> DataFrame:
    """Hide pending-takedown ids from an index read.  Zero plan change
    when the set is empty.  Small sets (≤ ``_TOMBSTONE_ISIN_MAX`` — the
    normal shape: takedown lists are legal artifacts, not data-scale)
    become a NOT-isin FILTER: no join stage at all, and the predicate
    pushes into the parquet scan (measured on the BENCH_SCALE takedown
    row: the 16-id pending-serve overhead was ~0.6 s of broadcast-join
    stage setup per serve, the filter reads flat).  Larger backlogs
    fall back to the broadcast anti-join — an isin over tens of
    thousands of literals bloats the codegen'd predicate, and a backlog
    that size should be compacted anyway.

    The list passes through :func:`_typed_stored_tombstones` (r14
    review): legacy pre-guard sidecars can hold wrong-typed junk that
    would crash the isin predicate or ``_ids_df`` on every serve; the
    junk hides nothing (wrong type can't match the id column), so
    serves stay resilient and the next sidecar rewrite heals it."""
    if tombs is None:
        tombs = _tombstone_list(spark, live)
    tombs = _typed_stored_tombstones(meta, tombs)
    if not tombs:
        return df
    if len(tombs) <= _TOMBSTONE_ISIN_MAX:
        c = F.col(meta["id_col"])
        return df.where(~c.isin(tombs) | c.isNull())
    return df.join(F.broadcast(_ids_df(spark, meta, tombs)), meta["id_col"], "left_anti")


@_locked_writer
def tombstone_ids(spark: SparkSession, path: str, ids: list) -> int:
    """O(ids) takedown: hide ``ids`` from every serve/open NOW (the
    legal requirement), defer the physical rewrite to the next
    compaction / recluster / retrain / retract — any generational
    rewrite reaps tombstoned rows and their seen entries, then drops
    the sidecar (the new generation starts clean).  Returns the number
    of ids newly tombstoned (already-pending ids are idempotent).

    Same policy consequence as :func:`retract_ids`, immediately: a
    near-duplicate previously rejected against tombstoned content is
    accepted on redelivery, and a streaming redelivery of a tombstoned
    id is re-processed (its seen entry is masked) — re-ingest then
    clears the id's tombstone, making the re-accepted content servable
    again — note resurrection un-hides EVERY stored row of the id, old
    content's included, so a takedown-and-REPLACE flow (same id,
    sanitized new content) must use :func:`retract_ids` instead (see
    :func:`clear_tombstones`).  Crash-safe: the sidecar is replaced atomically
    (:func:`_replace_small_file`); a crash loses at worst the
    in-flight update, never yields a torn list.  Single-writer slot
    ENFORCED via :func:`writer_lock` (r11), shared with compaction."""
    recover_compaction(spark, path)  # writer entry point
    root = path.rstrip("/")
    live, meta = live_index(spark, root)
    if meta is None:
        raise ValueError(f"no {META_FILE} at {path} — nothing to retract from")
    if live == root:
        raise ValueError(
            f"index at {path} uses the legacy flat layout — run migrate_index "
            "first to get the reader-atomic pointer swap"
        )
    ids = _check_request_ids(meta, ids, path)  # fail BEFORE persisting
    stored = _tombstone_list(spark, live)
    cur = set(stored)
    # dedupe the request (r12 review: [5, 5] returned 2 "newly
    # tombstoned" for one id) but preserve INPUT order rather than
    # sorting (r12 advice: sorted() raised TypeError where the write
    # itself was fine).  The sidecar keeps file order + appended
    # arrivals; nothing downstream relies on it being sorted (readers
    # treat it as a set).
    fresh = [i for i in dict.fromkeys(ids) if i not in cur]
    if fresh:
        # persist through the type filter (r14 review): rewriting the
        # sidecar is the cheap chance to heal legacy wrong-typed junk
        # out of it (junk can never match a stored row, see
        # _typed_stored_tombstones) instead of carrying it forward to
        # crash a later _ids_df/serve
        _replace_small_file(
            spark,
            f"{live}/{TOMBSTONES_FILE}",
            json.dumps(_typed_stored_tombstones(meta, stored) + fresh),
        )
    return len(fresh)


def _root_of_live(live: str) -> str:
    """The index ROOT a live data dir belongs to: the parent for a
    ``gen-N`` dir, the dir itself for the legacy flat layout."""
    live = live.rstrip("/")
    head, _, tail = live.rpartition("/")
    return head if tail.startswith(_GEN_PREFIX) else live


def clear_tombstones(
    spark: SparkSession, live: str, ids: list, lock_retries: int = 60
) -> None:
    """Un-tombstone ``ids`` (the re-ingest resurrection path): rewrite
    the sidecar without them — atomic replace, BOTH names (final and
    tmp) deleted when the set drains, so a crash-orphaned tmp can never
    resurrect a stale list through :func:`_tombstone_list`'s window
    fallback.  Writer-side only (the sinks call it in their committed-
    batch sequence).

    Takes the index writer lock (r11 review): this is a read-modify-
    write of the same sidecar :func:`tombstone_ids` updates under the
    lock — lock-free, a concurrent takedown landing between this
    function's read and its replace would be silently erased, losing a
    legal takedown.  ``lock_retries`` defaults to polling (the sinks
    must serialize behind a concurrent takedown, not die).

    Resurrection contract: clearing an id un-hides EVERY stored row of
    that id, including rows derived from the previously taken-down
    content — correct for the redelivery/replay case this path exists
    for (same content re-delivered under the same id).  A takedown-
    and-REPLACE flow (same id, sanitized new content) must use
    :func:`retract_ids` for the takedown instead: the physical purge is
    what guarantees the old content's rows are gone before the
    replacement is ingested."""
    from ..sources.sinks import _hadoop_fs

    root = _root_of_live(live)
    with writer_lock(spark, root, "clear_tombstones", retries=lock_retries):
        stored = _tombstone_list(spark, live)
        drop = set(ids)
        # order-preserving, NOT sorted() (r14 review: same legacy
        # mixed-type hazard as retract_ids' purge union — a resurrection
        # must not crash on unrelated junk in a pre-guard sidecar)
        keep = [i for i in stored if i not in drop]
        if len(keep) == len(stored):
            return
        tf = f"{live.rstrip('/')}/{TOMBSTONES_FILE}"
        if keep:
            _replace_small_file(spark, tf, json.dumps(keep))
        else:
            fs, path_cls, _ = _hadoop_fs(spark, live)
            fs.delete(path_cls(tf), False)
            fs.delete(path_cls(f"{tf}.tmp"), False)


def _reingested_tombstones(
    spark: SparkSession, meta: dict, increment: DataFrame, tombs: list
) -> list:
    """Ids of ``increment`` that are currently tombstoned — the ones a
    committed ingest must resurrect (:func:`clear_tombstones`).  A
    broadcast semi-join collected to the driver: bounded by the
    tombstone list, never by the increment."""
    tombs = _typed_stored_tombstones(meta, tombs)  # r14: legacy junk
    if not tombs:
        return []
    id_col = meta["id_col"]
    return [
        r[0]
        for r in increment.select(id_col)
        .join(F.broadcast(_ids_df(spark, meta, tombs)), id_col, "left_semi")
        .distinct()
        .collect()
    ]


# Brace-alternation cap per pruned_read glob — ~7 chars/value keeps each
# path string under ~8 KB and Hadoop's expansion linear; past it the
# read chunks into several globs and unions.
_PRUNED_GLOB_MAX = 1000

_GLOB_CHARS = frozenset("*?[]{}")


def _reject_glob_root(root: str) -> None:
    """Index roots must be glob-LITERAL (r12 review): every pruned
    serve hands ``root/pfx={..}`` to Hadoop's glob resolver, where a
    metacharacter in the root (``corpus[2024]``, a braced tenant dir)
    makes the whole pattern match nothing — the PATH_NOT_FOUND maps to
    an empty index read, and an empty index ADMITS every duplicate,
    the module's documented worst failure class.  Writers don't glob,
    so the index would CREATE fine and fail only silently at serve
    time; rejected loudly at create/init/migrate AND at every pruned
    read (covering indexes created before this guard)."""
    bad = _GLOB_CHARS.intersection(root)
    if bad:
        raise ValueError(
            f"index path {root!r} contains glob metacharacter(s) "
            f"{' '.join(sorted(bad))} — pruned serves glob-expand the "
            "root and would silently read an EMPTY index; use a "
            "glob-literal path"
        )


def _is_path_missing_error(e: Exception) -> bool:
    """Whether an AnalysisException means "the glob matched no path":
    error CLASS first (stable across backends/locales — the path_exists
    lesson about message matching); message substrings only as the
    fallback for engines predating error classes, which spell it
    'Path does not exist' or wrap a FileNotFoundException (r12 advice:
    the old fallback matched only the class NAME, which those engines
    never emit, so the promised fallback could not fire).

    Scope: callers hand this ANALYSIS-time exceptions only (path
    resolution during ``spark.read``).  Data loss mid-scan (a parquet
    footer vanishing under a running job) surfaces as a runtime task
    failure (Py4JJavaError/SparkException), is NOT caught by the
    callers' ``except AnalysisException``, and so cannot be mapped to
    an empty read by the substring fallback here."""
    cond = getattr(e, "getCondition", None) or getattr(e, "getErrorClass", None)
    name = cond() if callable(cond) else None
    if name is not None:
        return name == "PATH_NOT_FOUND"
    msg = str(e)
    return (
        "PATH_NOT_FOUND" in msg
        or "Path does not exist" in msg
        or "FileNotFoundException" in msg
    )


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
    there) are skipped by handing Spark ONE brace-glob path
    (``root/pfx={3,17,41}``): the alternation expands and resolves
    inside the JVM's file listing, so the driver pays ZERO py4j
    round-trips however many buckets the increment touches.  This
    replaces the r7–r10 per-bucket ``fs.exists`` loop — O(touched)
    serial py4j calls, which the retrained-IVF serve shape exposed
    (nprobe lists × |queries| distinct buckets ⇒ ~160 probes/serve,
    measured 1.7 s of pure driver round-trips at 4000 buckets; the
    glob reads the same serve in one call).  Still deliberately NOT a
    listStatus of the root: pulling n_buckets FileStatus objects
    through py4j is O(corpus/bucket_size) driver work per serve
    (measured ~2 s at 4000 dirs), the exact dependence this function
    exists to remove.  A glob that matches NOTHING (empty or
    meta-only index) raises PATH_NOT_FOUND — mapped to the empty
    DataFrame the callers already expect.

    The glob is BOUNDED (r12 verdict nit): one brace alternation per
    touched bucket means a pathological increment touching tens of
    thousands of buckets builds an unbounded path string (and Hadoop's
    glob expansion is quadratic-ish in alternation count).  Past
    ``_PRUNED_GLOB_MAX`` values the read splits into per-chunk globs
    unioned back together — same pruning, same zero-py4j listing per
    chunk; below it nothing changes."""
    from functools import reduce

    from pyspark.errors import AnalysisException

    root = path.rstrip("/")
    _reject_glob_root(root)
    vals = sorted({int(t) for t in touched if t is not None})
    if not vals:
        return spark.createDataFrame([], schema)

    def one_glob(chunk: list[int]):
        if len(chunk) == 1:  # Hadoop's glob treats {x} fine, but stay literal
            pattern = f"{root}/{prefix}={chunk[0]}"
        else:
            pattern = f"{root}/{prefix}={{{','.join(str(v) for v in chunk)}}}"
        try:
            return spark.read.option("basePath", root).schema(schema).parquet(pattern)
        except AnalysisException as e:
            if _is_path_missing_error(e):
                return spark.createDataFrame([], schema)
            raise

    chunks = [
        vals[i : i + _PRUNED_GLOB_MAX] for i in range(0, len(vals), _PRUNED_GLOB_MAX)
    ]
    return reduce(lambda a, b: a.unionByName(b), (one_glob(c) for c in chunks))


# --------------------------------------------------------- band index
@_locked_writer
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
    spark = docs.sparkSession
    # writer entry point: reap stale/half-built generations first
    # (round-8 advice: create over crash debris must not strand state)
    recover_compaction(spark, path)
    _reject_legacy_for_write(spark, path.rstrip("/"))
    rows = minhash_band_index(docs, text_col, id_col, num_hashes, bands)
    n_rows = None
    if n_buckets is None:
        # the band generator cannot be pruned out of a count() (row
        # multiplicity depends on it), so auto-sizing would evaluate the
        # full minhash chain TWICE — once for this count, once for the
        # write.  Materialize once (measured at 490k docs, r10: count
        # 44.6 s + write 40.1 s raw vs ~45 s materialization + 0.5 s
        # write).  Explicit-n_buckets callers skip both the count and
        # the checkpoint copy.
        rows = rows.localCheckpoint()
        n_rows = rows.count()
        n_buckets = auto_index_buckets(n_rows)
    meta = {
        "kind": BAND_KIND,
        "id_col": id_col,
        "id_type": dict(docs.dtypes)[id_col],
        "num_hashes": num_hashes,
        "bands": bands,
        "n_buckets": n_buckets,
    }
    root = path.rstrip("/")
    gen = _new_generation(spark, root)
    (
        rows.withColumn("pfx", _band_pfx(n_buckets))
        .repartition("pfx")
        .write.mode("overwrite")
        .partitionBy("pfx")
        .parquet(f"{root}/{gen}")
    )
    if n_rows is None:  # explicit-n_buckets path: footer-only count
        n_rows = spark.read.schema(_band_schema(meta)).parquet(f"{root}/{gen}").count()
    # running row counter (r11, extending the SEM/IVF convention to the
    # band kind): feeds rebucket_due's O(1) growth dial
    meta["rows"] = n_rows
    _finish_generation(spark, root, gen, meta)
    return meta


def append_band_rows(rows: DataFrame, path: str, meta: dict) -> None:
    """Append an increment's band rows (``IncrementalDedupResult
    .index_rows``) into the live generation's partitioned layout and
    bump the growth counter (no-op for pre-r11 sidecars without
    ``rows``).  The frame is materialized once when the counter needs a
    count — the band generator cannot be pruned out of a count(), so
    write-then-count on the raw frame would evaluate the minhash chain
    twice (the create-path lesson, r10)."""
    spark = rows.sparkSession
    live = live_root(spark, path)
    if "rows" in meta:
        rows = rows.localCheckpoint()
    (
        rows.withColumn("pfx", _band_pfx(meta["n_buckets"]))
        .write.mode("append")
        .partitionBy("pfx")
        .parquet(live)
    )
    if "rows" in meta:
        _bump_rows(spark, live, meta, rows.count())


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
    live, meta = _open_live(spark, path, BAND_KIND, "create_band_index")
    expected = {}
    if num_hashes is not None:
        expected["num_hashes"] = num_hashes
    if bands is not None:
        expected["bands"] = bands
    _require_meta(meta, expected, path)
    df = spark.read.schema(_band_schema(meta)).parquet(live)
    return _minus_tombstones(spark, live, meta, df), meta


def serve_incremental_dedup(
    new_docs: DataFrame,
    path: str,
    text_col: str = "text",
    est_threshold: float = 0.8,
    append: bool = True,
    trace: dict | None = None,
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
    measures it across a 10× corpus step).

    ``trace``: when a dict is passed, per-phase wall seconds are
    recorded into it (keys ``open_live / band_plan / band_touch /
    tombstones / pruned_plan / policy_plan / append``) — the r13
    serve-floor profiler's hook (tools/profile_serve.py); zero cost
    when None."""
    t = time.time if trace is not None else None
    spark = new_docs.sparkSession
    t0 = t and t()
    live, meta = _open_live(spark, path, BAND_KIND, "create_band_index")
    if t:
        trace["open_live"] = t() - t0
    _check_id_type(new_docs, meta, path)
    id_col, num_hashes, bands = meta["id_col"], meta["num_hashes"], meta["bands"]
    n_buckets = meta["n_buckets"]

    t0 = t and t()
    banded = (
        minhash_band_index(new_docs, text_col, id_col, num_hashes, bands)
        .withColumn("pfx", _band_pfx(n_buckets))
        .persist()
    )
    if t:
        trace["band_plan"] = t() - t0
    try:
        t0 = t and t()
        touched = [r.pfx for r in banded.select("pfx").distinct().collect()]
        if t:
            trace["band_touch"] = t() - t0
            t0 = t()
        tombs = _tombstone_list(spark, live)
        if t:
            trace["tombstones"] = t() - t0
            t0 = t()
        index = _minus_tombstones(
            spark, live, meta, pruned_read(spark, live, _band_schema(meta), touched), tombs
        )
        if t:
            trace["pruned_plan"] = t() - t0
            t0 = t()
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
        if t:
            trace["policy_plan"] = t() - t0
            t0 = t()
        if append:
            # pfx already on the cached rows; locked + swap-aware
            _locked_serve_append(spark, path, live, meta, banded, new_docs, tombs)
        if t and append:
            trace["append"] = t() - t0
        return res
    finally:
        banded.unpersist()


def recover_compaction(
    spark: SparkSession,
    path: str,
    lock_retries: int = 0,
    lock_retry_interval_sec: float = 1.0,
) -> str:
    """Writer-side self-heal + debris cleanup for the generation
    layout.  Idempotent; returns what it did:

    - ``"clean"`` — nothing to do (also: legacy flat layout / fresh path);
    - ``"migrated"`` — a crashed :func:`migrate_index` was resumed (the
      sidelined legacy tree installed as generation 0);
    - ``"restored"`` — the pointer was missing or dangled (the
      delete+rename fallback window, or a crash before the first flip):
      re-pointed at the highest COMPLETE generation;
    - ``"finished"`` — stale debris deleted: non-live generations (a
      crashed compaction's half-built gen — no meta, never pointed-to —
      or a finished compaction's old gen that outlived its cleanup) and
      pointer tmp files.

    WRITER-side only: readers resolve passively through
    :func:`live_root` and never delete, so a reader is safe while a
    compaction is mid-build; run this where the appender runs (the
    streaming sinks call it per batch).

    Takes the (reentrant) writer lock (r11 review): the debris reap
    deletes meta-less generations, and lock-free it could delete the
    half-built generation a CONCURRENT lock-holding writer is mid-way
    through building.  Callers already inside a writer op re-enter for
    free; a standalone call while maintenance runs fails loudly like
    any other writer (pass ``lock_retries`` to wait instead)."""
    with writer_lock(
        spark, path, "recover_compaction", lock_retries, lock_retry_interval_sec
    ):
        return _recover_compaction_unlocked(spark, path)


def _recover_compaction_unlocked(spark: SparkSession, path: str) -> str:
    from ..sources.sinks import _hadoop_fs

    root = path.rstrip("/")
    fs, path_cls, _ = _hadoop_fs(spark, root)
    state = "clean"
    # Pre-r9 two-rename compaction debris (round-9 advice): the old
    # scheme renamed the FLAT index aside to <root>__compact_trash and
    # installed <root>__compact_tmp as the new root.  A crash between
    # the two renames leaves the ONLY copy of the index in the trash
    # with root missing — the generation-layout logic below would see a
    # bare root, return "clean", and the next streaming batch would
    # silently bootstrap a fresh EMPTY index over it (the duplicate-
    # readmission mode the old recovery existed to prevent, reopened
    # across the layout upgrade).  Restore the sidelined tree as
    # generation 0.  A root that already holds an index (crash AFTER
    # the install, or post-upgrade layouts) keeps it and the trash is
    # dropped.  The tmp copy is always dropped, even when complete —
    # compaction is re-runnable, the pre-compaction tree is the
    # conservative restore.
    trash, ctmp = f"{root}__compact_trash", f"{root}__compact_tmp"
    if fs.exists(path_cls(trash)):
        has_index = bool(
            _read_small_file(spark, f"{root}/{CURRENT_FILE}") is not None
            or _read_small_file(spark, f"{root}/{META_FILE}") is not None
            or _complete_gens(spark, root)
        )
        if has_index:
            fs.delete(path_cls(trash), True)
        else:
            for g in _gen_dir_names(spark, root):  # half-built debris only
                fs.delete(path_cls(f"{root}/{g}"), True)
            gen0 = f"{_GEN_PREFIX}{0:07d}"
            fs.mkdirs(path_cls(root))
            if not fs.rename(path_cls(trash), path_cls(f"{root}/{gen0}")):
                raise IOError(
                    f"recover_compaction: could not restore legacy trash {trash}"
                )
            _install_pointer(spark, root, gen0)
            state = "restored"
    if fs.exists(path_cls(ctmp)):
        fs.delete(path_cls(ctmp), True)
    side = f"{root}__migrate"
    if fs.exists(path_cls(side)):
        gen0 = f"{_GEN_PREFIX}{0:07d}"
        fs.mkdirs(path_cls(root))
        if not fs.rename(path_cls(side), path_cls(f"{root}/{gen0}")):
            raise IOError(f"recover_compaction: could not resume migration of {side}")
        _install_pointer(spark, root, gen0)
        state = "migrated"
    cur = _read_small_file(spark, f"{root}/{CURRENT_FILE}")
    cur = cur.strip() if cur is not None else None
    if cur is None or not fs.exists(path_cls(f"{root}/{cur}")):
        done = _complete_gens(spark, root)
        if not done:
            # no pointer, no complete generation: a legacy flat index, a
            # fresh path, or the debris of a crashed FIRST build — drop
            # any half-built gens, the flat root (if any) stays live
            for g in _gen_dir_names(spark, root):
                fs.delete(path_cls(f"{root}/{g}"), True)
            return state
        cur = done[-1]
        _install_pointer(spark, root, cur)
        state = "restored"
    # Reap debris, RETAINING the live gen's immediate predecessor: a
    # reader that resolved the old gen just before the last flip may
    # still be mid-scan, and deleting it at the very next writer entry
    # (back-to-back compactions) would yank its files (measured: the
    # reader-during-compaction test hit FILE_NOT_EXIST under
    # delete-at-next-entry).  Keeping exactly one predecessor gives
    # every reader at least one full writer cycle of grace — the
    # snapshot-retention trade every MVCC table format makes.
    # Incomplete gens (no meta: a crashed build, never pointed at) and
    # anything older than the predecessor go.
    complete = set(_complete_gens(spark, root))
    pred = max((g for g in complete if g < cur), default=None)
    removed = False
    for g in _gen_dir_names(spark, root):
        if g != cur and g != pred:
            fs.delete(path_cls(f"{root}/{g}"), True)
            removed = True
    tmp_ptr = path_cls(f"{root}/{CURRENT_FILE}.tmp")
    if fs.exists(tmp_ptr):
        fs.delete(tmp_ptr, False)
    return "finished" if removed else state


@_locked_writer
def compact_index(spark: SparkSession, path: str) -> None:
    """Rewrite an index into one file per bucket, dropping duplicate
    rows.  Appends add O(touched) small files per increment and
    crash-replayed streaming batches can append the same band rows
    twice (both documented, both correctness-neutral — duplicate rows
    only produce duplicate candidates that the rejected-set distinct
    collapses); periodic compaction bounds the file count and the
    replay bloat.  Distinct is row-level-safe here because index rows
    are pure functions of the document (identical on re-derivation).

    Crash-safety AND reader-atomicity contract (generation layout): the
    compacted rows and the re-packed seen-id store (``_seen_ids`` —
    it accumulates per-batch small files and replay duplicates exactly
    like the index) are written into the NEXT generation dir, the meta
    sidecar goes in LAST (completeness marker), and the swap is ONE
    atomic pointer write — a concurrent reader resolves either the old
    generation or the new one, never a half-state (the round-8
    two-rename swap had a no-live-directory window).  A crash at any
    point leaves the pointer on a complete generation;
    :func:`recover_compaction` (run first, and by every streaming batch)
    deletes the debris.  Concurrent MAINTENANCE writers are serialized
    by :func:`writer_lock` (r11 — before it, single-writer was
    convention only); plain appends stay lock-free, so still run
    compaction where the appender runs (e.g. between streaming
    triggers) or rely on the in-sink ``compact_every`` path.

    Legacy flat indexes must :func:`migrate_index` first — the pointer
    protocol needs the generation layout."""
    from ..sources.sinks import _hadoop_fs

    recover_compaction(spark, path)
    root = path.rstrip("/")
    live, meta = live_index(spark, root)
    if meta is None:
        raise ValueError(f"no {META_FILE} at {path} — nothing to compact")
    if live == root:
        raise ValueError(
            f"index at {path} uses the legacy flat layout — run migrate_index "
            "first to get the reader-atomic pointer swap"
        )
    schema = _kind_schema(meta)
    gen = _new_generation(spark, root)
    new_dir = f"{root}/{gen}"
    # tombstone reap: pending takedowns ride the rewrite for free — the
    # new generation is born without their rows, seen entries, or the
    # sidecar itself (the physical half of the O(ids) takedown path)
    tombs = _tombstone_list(spark, live)
    (
        _minus_tombstones(
            spark, live, meta, spark.read.schema(schema).parquet(live), tombs
        )
        .distinct()
        .repartition("pfx")
        .write.mode("overwrite")
        .partitionBy("pfx")
        .parquet(new_dir)
    )
    fs, path_cls, _ = _hadoop_fs(spark, root)
    if fs.exists(path_cls(f"{live}/_seen_ids")):
        (
            _minus_tombstones(
                spark,
                live,
                meta,
                spark.read.schema(_seen_schema(meta)).parquet(f"{live}/_seen_ids"),
                tombs,
            )
            .distinct()
            .repartition("spfx")
            .write.mode("overwrite")
            .partitionBy("spfx")
            .parquet(f"{new_dir}/_seen_ids")
        )
    if "rows" in meta:  # distinct() dropped replay dupes — recount (footer-only)
        meta = dict(
            meta, rows=spark.read.schema(schema).parquet(new_dir).count()
        )
    _finish_generation(spark, root, gen, meta)


def rebucket_due(
    spark: SparkSession,
    path: str,
    drift_factor: float = 4.0,
    target_rows_per_bucket: int = 500,
    resolved: tuple[str, dict | None] | None = None,
) -> bool:
    """Growth dial for the PARTITION layout itself (r11) — the sibling
    of :func:`semantic_recluster_due` / :func:`ivf_retrain_due` for the
    band/embed kinds, which have no quantizer to retrain but the same
    frozen-at-bootstrap problem: ``n_buckets`` is sized to the create
    corpus, so a corpus that grows 100× under appends carries 100× the
    target rows per bucket and every serve's pruned read degrades
    linearly with it.  Fires when mean bucket population exceeds
    ``drift_factor × target_rows_per_bucket`` (the ``auto_index_buckets``
    target).  O(1): reads the ``rows`` counter maintained by every
    committed append/serve-append/compact (pre-r11 sidecars fall back
    to one footer count).  Applies to any kind, but the SEM/IVF kinds
    normally re-size buckets through their own rebuilds
    (:func:`recluster_semantic_index` / :func:`retrain_ivf_index`);
    :func:`rebucket_index` is the cheap rewrite that fixes layout alone
    (no Lloyd, no codebook retrain).

    Fires only when the rewrite can actually GROW the layout (r12
    review): occupancy alone used to fire even when
    :func:`rebucket_index` would re-pick the same ``n_buckets`` — an
    IVF index whose bucket count is nlist-capped, or a band/embed
    index at the ``auto_index_buckets`` directory cap — so a
    fire-and-rewrite loop re-ran a full-index rewrite on every poll
    forever without ever satisfying the dial.  An over-occupancy,
    nlist-bound IVF layout is :func:`ivf_retrain_due`'s problem (the
    retrain grows nlist AND buckets), not this dial's.

    ``resolved``: optionally the ``live_index`` pair the caller already
    holds — :func:`index_info` passes it so its one console snapshot is
    not torn across a concurrent pointer flip."""
    live, meta = resolved if resolved is not None else live_index(spark, path)
    if meta is None:
        raise ValueError(f"no index at {path}")
    rows = meta.get("rows")
    if rows is None:  # pre-r11 sidecar — footer-only count, O(files)
        rows = spark.read.schema(_kind_schema(meta)).parquet(live).count()
    target = auto_index_buckets(rows, target_rows_per_bucket)
    if meta.get("kind") == IVF_KIND:  # same cap rule as rebucket_index
        target = min(target, max(meta.get("nlist", 1), 1))
    over = rows / max(meta["n_buckets"], 1) > drift_factor * target_rows_per_bucket
    return over and target > meta["n_buckets"]


def compact_due(
    spark: SparkSession,
    path: str,
    max_appends: int = COMPACT_MAX_APPENDS,
    resolved: tuple[str, dict | None] | None = None,
) -> bool:
    """O(1) small-file dial (r14) — the scheduling side of
    :func:`compact_index`, completing the dial family
    (:func:`rebucket_due` owns layout growth, :func:`ivf_retrain_due` /
    :func:`semantic_recluster_due` own quantizer drift; this one owns
    APPEND-FILE ACCUMULATION, which degrades serve latency through
    glob listing + footer reads without any row growth at all).

    Fires when the live generation has absorbed ``max_appends``
    committed appends since it was built: each append adds one file
    per touched bucket, so the appends count is an O(1) proxy for the
    per-bucket file count the serve's pruned read must list.  The
    counter (``_appends``, maintained by :func:`_bump_rows` on every
    committed append) lives in the live generation dir, so any
    generational rewrite — compact, rebucket, recluster, retrain,
    retract — resets it for free; loss degrades the dial to "not due".

    Default 8: ``BENCH_SCALE.json compact_serve`` prices one compaction
    at about one grown-store serve after 8 increments (at 100×:
    8 appends → 174,759 files → 75.5 s serve; the 82.7 s compaction
    collapses both to 3,600 files / 13.7 s) — compact whenever the
    accumulated appends cost more than one compaction.  Streaming
    sinks' ``compact_every=N`` is the same policy counted per batch;
    batch daily-serve loops poll this instead:

        if compact_due(spark, path):
            compact_index(spark, path)

    ``resolved``: optionally the ``live_index`` pair the caller already
    holds (same no-torn-snapshot contract as the other dials)."""
    live, meta = resolved if resolved is not None else live_index(spark, path)
    if meta is None:
        raise ValueError(f"no index at {path}")
    return _appends_count(spark, live) >= max_appends


def _kind_pfx(meta: dict) -> Column:
    """The kind's partition expression at the meta's CURRENT bucket
    count — the single registry the generational rewrites use so a new
    kind cannot silently miss re-partitioning."""
    builders = {
        BAND_KIND: _band_pfx,
        EMBED_KIND: _bucket_pfx,
        SEM_KIND: _cell_pfx,
        IVF_KIND: _list_pfx,
    }
    return builders[meta["kind"]](meta["n_buckets"])


def _locked_serve_append(
    spark: SparkSession,
    path: str,
    live: str,
    meta: dict,
    rows_with_pfx: DataFrame,
    increment: DataFrame,
    tombs: list,
) -> None:
    """The serve functions' append section, under the (reentrant) slot
    lock — r11 review: lock-free, the append could race a concurrent
    maintenance op's generation swap and land rows in a retired
    generation (silently reaped a cycle later).  Inside the lock the
    pointer is re-checked: unchanged (the common case, and always when
    the caller is a streaming batch already holding the lock) appends
    as computed; moved by a LAYOUT-ONLY rewrite (rebucket/compact —
    same kind params, only ``n_buckets``/``rows`` may differ) re-keys
    the pfx column against the new layout and appends there; moved by
    a REBUILD that changed the kind's parameters (recluster/retrain —
    the increment's cell/centroid assignments are stale) raises
    loudly rather than corrupt routing — re-run the serve against the
    new generation."""
    with writer_lock(spark, path, "serve_append", retries=60):
        live2, meta2 = live_index(spark, path)
        if live2 != live:
            same_params = {
                k: v for k, v in (meta2 or {}).items() if k not in ("n_buckets", "rows")
            } == {k: v for k, v in meta.items() if k not in ("n_buckets", "rows")}
            if not same_params:
                raise RuntimeError(
                    f"index at {path} was rebuilt mid-serve (recluster/retrain "
                    "swapped the live generation's parameters) — re-run the "
                    "serve against the new generation"
                )
            rows_with_pfx = rows_with_pfx.drop("pfx").withColumn(
                "pfx", _kind_pfx(meta2)
            )
            live, meta = live2, meta2
            tombs = _tombstone_list(spark, live)
        rows_with_pfx.write.mode("append").partitionBy("pfx").parquet(live)
        _bump_rows(spark, live, meta, rows_with_pfx.count())
        back = _reingested_tombstones(spark, meta, increment, tombs)
        if back:  # re-ingested takedown ids become servable again
            clear_tombstones(spark, live, back)


@_locked_writer
def rebucket_index(
    spark: SparkSession,
    path: str,
    n_buckets: int | None = None,
    target_rows_per_bucket: int = 500,
) -> dict:
    """Re-partition an index into ``n_buckets`` (default:
    ``auto_index_buckets`` over the current row count at
    ``target_rows_per_bucket`` — the SAME dial :func:`rebucket_due`
    fires on; r12 advice: the rewrite previously re-sized at the fixed
    500-rows/bucket default, so a caller whose dial targeted <125
    rows/bucket got a rewrite that still exceeded its own threshold and
    re-fired forever) — the layout-only
    generational rewrite :func:`rebucket_due` asks for.  Everything
    else is preserved: band/bucket/cell/codebook parameters, serve
    decisions, seen history (re-packed under the new ``spfx``).  Like
    every rewrite it also collapses replay-duplicate rows and reaps
    pending tombstones, and it swaps in with one atomic pointer flip
    (crash debris reaped by :func:`recover_compaction`; single-writer
    slot enforced via :func:`writer_lock`).

    Cost: one pruned-shuffle pass over the index (repartition on the
    NEW pfx) — no Lloyd, no codebook retrain, no corpus re-read; the
    cheap maintenance op for the band/embed kinds whose only drift is
    occupancy.  Returns the new meta dict."""
    from ..sources.sinks import _hadoop_fs

    recover_compaction(spark, path)  # writer entry point
    root = path.rstrip("/")
    live, meta = live_index(spark, root)
    if meta is None:
        raise ValueError(f"no {META_FILE} at {path} — nothing to rebucket")
    if live == root:
        raise ValueError(
            f"index at {path} uses the legacy flat layout — run migrate_index "
            "first to get the reader-atomic pointer swap"
        )
    schema = _kind_schema(meta)
    tombs = _tombstone_list(spark, live)
    stored = (
        _minus_tombstones(
            spark, live, meta, spark.read.schema(schema).parquet(live), tombs
        )
        .drop("pfx")
        .distinct()
    )
    if n_buckets is None:
        rows = meta.get("rows")
        if rows is None:
            stored = stored.localCheckpoint()  # reused by count + write
            rows = stored.count()
        n_buckets = auto_index_buckets(rows, target_rows_per_bucket)
        if meta["kind"] == IVF_KIND:  # same cap rule as create/retrain:
            n_buckets = min(n_buckets, max(meta.get("nlist", 1), 1))
    new_meta = dict(meta, n_buckets=n_buckets)
    gen = _new_generation(spark, root)
    new_dir = f"{root}/{gen}"
    (
        stored.withColumn("pfx", _kind_pfx(new_meta))
        .repartition("pfx")
        .write.mode("overwrite")
        .partitionBy("pfx")
        .parquet(new_dir)
    )
    fs, path_cls, _ = _hadoop_fs(spark, root)
    if fs.exists(path_cls(f"{live}/_seen_ids")):
        id_col = meta["id_col"]
        (
            _minus_tombstones(
                spark, live, meta,
                spark.read.schema(_seen_schema(meta)).parquet(f"{live}/_seen_ids"),
                tombs,
            )
            .select(id_col)
            .distinct()
            .withColumn("spfx", _seen_pfx(id_col, n_buckets))
            .repartition("spfx")
            .write.mode("overwrite")
            .partitionBy("spfx")
            .parquet(f"{new_dir}/_seen_ids")
        )
    if "rows" in new_meta:  # distinct() dropped replay dupes — recount
        new_meta = dict(
            new_meta, rows=spark.read.schema(schema).parquet(new_dir).count()
        )
    _finish_generation(spark, root, gen, new_meta)
    return new_meta


# ---------------------------------------------------- embedding index
@_locked_writer
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
    spark = embeddings.sparkSession
    recover_compaction(spark, path)  # writer entry point — reap debris first
    _reject_legacy_for_write(spark, path.rstrip("/"))
    rows = embedding_bucket_index(embeddings, dims, n_planes, id_col, vec_col, center)
    n_rows = None
    if n_buckets is None:
        n_rows = rows.count()
        n_buckets = auto_index_buckets(n_rows)
    meta = {
        "kind": EMBED_KIND,
        "id_col": id_col,
        "id_type": dict(embeddings.dtypes)[id_col],
        "dims": dims,
        "n_planes": n_planes,
        "center": center,
        "n_buckets": n_buckets,
    }
    root = path.rstrip("/")
    gen = _new_generation(spark, root)
    (
        rows.withColumn("pfx", _bucket_pfx(n_buckets))
        .repartition("pfx")
        .write.mode("overwrite")
        .partitionBy("pfx")
        .parquet(f"{root}/{gen}")
    )
    if n_rows is None:  # explicit-n_buckets path: footer-only count
        n_rows = spark.read.schema(_embed_schema(meta)).parquet(f"{root}/{gen}").count()
    meta["rows"] = n_rows  # growth counter (r11) — feeds rebucket_due
    _finish_generation(spark, root, gen, meta)
    return meta


def append_embed_rows(rows: DataFrame, path: str, meta: dict) -> None:
    spark = rows.sparkSession
    live = live_root(spark, path)
    if "rows" in meta:  # single evaluation for the counter's count
        rows = rows.localCheckpoint()
    (
        rows.withColumn("pfx", _bucket_pfx(meta["n_buckets"]))
        .write.mode("append")
        .partitionBy("pfx")
        .parquet(live)
    )
    if "rows" in meta:
        _bump_rows(spark, live, meta, rows.count())


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
    live, meta = _open_live(spark, path, EMBED_KIND, "create_embedding_index")
    expected: dict = {}
    if dims is not None:
        expected["dims"] = dims
    if n_planes is not None:
        expected["n_planes"] = n_planes
    if check_center:
        expected["center"] = center
    _require_meta(meta, expected, path)
    df = spark.read.schema(_embed_schema(meta)).parquet(live)
    return _minus_tombstones(spark, live, meta, df), meta


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
    live, meta = _open_live(spark, path, EMBED_KIND, "create_embedding_index")
    _check_id_type(new_embeddings, meta, path)
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
        tombs = _tombstone_list(spark, live)
        index = _minus_tombstones(
            spark, live, meta, pruned_read(spark, live, _embed_schema(meta), touched), tombs
        )
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
            _locked_serve_append(
                spark, path, live, meta, new_rows, new_embeddings, tombs
            )
        return res
    finally:
        new_rows.unpersist()


# ----------------------------------------------------- semantic index
@_locked_writer
def create_semantic_index(
    embeddings: DataFrame,
    path: str,
    k: int | None = None,
    iters: int = 1,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_buckets: int | None = None,
    target_cell_size: int = 300,
    flat_k_max: int | None = None,
) -> dict:
    """Bootstrap the persisted SemDeDup cell index: run the
    integer-exact Lloyd over the bootstrap corpus ONCE, persist

    - the index rows ``(id, cell, q_vec, q_norm)`` partitioned by
      ``pfx = hash(cell) % n_buckets`` (same pruned-serve layout as the
      band/embed kinds), and
    - the ASSIGNER TREE in the metadata sidecar — the O(k·d)-int
      routing structure that places every future increment into these
      cells in O(d·64·⌈log₆₄ k⌉) per vector, NO Lloyd re-run.

    ``k=None`` auto-sizes to ``target_cell_size`` members per cell
    (operators/semantic.auto_k).  The bootstrap's own rows are indexed
    from the Lloyd run's final assignment directly (no re-routing
    pass).  ``flat_k_max`` overrides the flat-kernel knee (tests force
    the two-level tree at oracle-friendly k; the tree itself is the
    persisted artifact, so the knee is not part of the sidecar).
    Returns the meta dict.

    This is the amortized one-time cost of the semantic family — the
    piece that was missing while lexical and embedding near-dup already
    served increments off persisted indexes (round-8 verdict task 1):
    without it, every increment re-paid the full clustering."""
    from .semantic import auto_k, kmeans_int8_tree, tree_to_json

    spark = embeddings.sparkSession
    recover_compaction(spark, path)  # writer entry point — reap debris first
    _reject_legacy_for_write(spark, path.rstrip("/"))
    n = embeddings.count()
    if k is None:
        k = auto_k(n, target_cell_size)
    assign, _, tree = kmeans_int8_tree(
        embeddings, k, iters, dims, id_col, vec_col, n_docs=n, flat_k_max=flat_k_max
    )
    if tree is None:
        raise ValueError("create_semantic_index: no valid vectors to cluster")
    cells = assign.withColumnRenamed("cluster", "cell")
    rows = semantic_cell_index(embeddings, tree, dims, id_col, vec_col, _cells=cells)
    if n_buckets is None:
        n_buckets = auto_index_buckets(n)
    meta = {
        "kind": SEM_KIND,
        "id_col": id_col,
        "id_type": dict(embeddings.dtypes)[id_col],
        "dims": dims,
        "k": k,
        "iters": iters,
        "n_buckets": n_buckets,
        "target_cell_size": target_cell_size,
        "bootstrap_rows": n,
        "rows": n,
        "tree": tree_to_json(tree),
    }
    root = path.rstrip("/")
    gen = _new_generation(spark, root)
    (
        rows.withColumn("pfx", _cell_pfx(n_buckets))
        .repartition("pfx")
        .write.mode("overwrite")
        .partitionBy("pfx")
        .parquet(f"{root}/{gen}")
    )
    _finish_generation(spark, root, gen, meta)
    return meta


def append_sem_rows(rows: DataFrame, path: str, meta: dict) -> None:
    """Append coded semantic rows into the live generation and bump the
    growth counter, exactly like :func:`append_band_rows` /
    :func:`append_embed_rows` (r12 review: this was the one append
    helper that skipped the bump, so a batch caller growing the corpus
    through it froze ``semantic_recluster_due`` at the bootstrap count
    and the drift dial never fired).  Materialized once when the
    counter needs a count — same double-evaluation guard as the band
    helper."""
    spark = rows.sparkSession
    live = live_root(spark, path)
    if "rows" in meta:
        rows = rows.localCheckpoint()
    (
        rows.withColumn("pfx", _cell_pfx(meta["n_buckets"]))
        .write.mode("append")
        .partitionBy("pfx")
        .parquet(live)
    )
    if "rows" in meta:
        _bump_rows(spark, live, meta, rows.count())


def open_semantic_index(
    spark: SparkSession,
    path: str,
    dims: int | None = None,
    k: int | None = None,
) -> tuple[DataFrame, dict]:
    """Open a persisted semantic cell index: validate dims/k against
    the sidecar (None = accept stored) and return ``(index_df, meta)``.
    ``meta['tree']`` is the JSON assigner tree —
    ``semantic.tree_from_json`` rehydrates it."""
    live, meta = _open_live(spark, path, SEM_KIND, "create_semantic_index")
    expected: dict = {}
    if dims is not None:
        expected["dims"] = dims
    if k is not None:
        expected["k"] = k
    _require_meta(meta, expected, path)
    df = spark.read.schema(_sem_schema(meta)).parquet(live)
    return _minus_tombstones(spark, live, meta, df), meta


def serve_incremental_semantic_dedup(
    new_embeddings: DataFrame,
    path: str,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    append: bool = True,
) -> IncrementalDedupResult:
    """One increment against the persisted semantic cell index — the
    SemDeDup sibling of :func:`serve_incremental_dedup` /
    :func:`serve_incremental_embed_near_dup`:

    1. route the increment into the bootstrap cells through the
       sidecar's assigner tree (no Lloyd re-run) and code it;
    2. collect its touched pfx values (≤ n_buckets ints, NULL cells
       excluded — corrupt history costs zero IO);
    3. read the index pruned to those partitions;
    4. apply the triad policy (reject vs index or vs lower-id increment
       row, deterministic int8 cosine over stored codes);
    5. optionally append the increment's rows (ALL docs — rejected
       duplicates must keep disqualifying their future copies).

    Flat-serve posture: fixed increment → fixed touched-bucket count →
    fixed pruned-scan rows (buckets sized to the corpus), and the
    assigner pass is corpus-size-free up to the ⌈log₆₄ k⌉ tree depth —
    measured across a 100× corpus in BENCH_SCALE ``semantic_partitioned``."""
    from .semantic import tree_from_json

    spark = new_embeddings.sparkSession
    live, meta = _open_live(spark, path, SEM_KIND, "create_semantic_index")
    _check_id_type(new_embeddings, meta, path)
    id_col, dims, n_buckets = meta["id_col"], meta["dims"], meta["n_buckets"]
    tree = tree_from_json(meta["tree"])

    new_rows = (
        semantic_cell_index(new_embeddings, tree, dims, id_col, vec_col)
        .withColumn("pfx", _cell_pfx(n_buckets))
        .persist()
    )
    try:
        touched = [
            r.pfx
            for r in new_rows.select("pfx")
            .where(F.col("pfx").isNotNull())
            .distinct()
            .collect()
        ]
        tombs = _tombstone_list(spark, live)
        index = _minus_tombstones(
            spark, live, meta, pruned_read(spark, live, _sem_schema(meta), touched), tombs
        )
        res = incremental_semantic_near_dup(
            new_embeddings,
            index.drop("pfx"),
            tree,
            threshold,
            dims,
            id_col,
            vec_col,
            index_meta=meta,
            _new_rows=new_rows.drop("pfx"),
        )
        if append:
            _locked_serve_append(
                spark, path, live, meta, new_rows, new_embeddings, tombs
            )
        return res
    finally:
        new_rows.unpersist()


def semantic_recluster_due(
    spark: SparkSession,
    path: str,
    drift_factor: float = 4.0,
    resolved: tuple[str, dict | None] | None = None,
) -> bool:
    """Occupancy drift dial: True when the mean cell population has
    grown past ``drift_factor × target_cell_size`` — the signal that
    the bootstrap partition no longer fits the corpus and the
    within-cell quadratic term is drifting up (cells only GROW under
    incremental serve; k is fixed by the tree).  O(1): the row count
    comes from the sidecar's running ``rows`` counter (maintained by
    every committed append/compact/retract/recluster — round-9 verdict
    task 5; pre-r10 sidecars without it fall back to one
    parquet-footer count).  Rebuild-and-swap:
    :func:`recluster_semantic_index`.  ``resolved``: see
    :func:`rebucket_due` (the console's no-torn-snapshot hook)."""
    live, meta = resolved if resolved is not None else live_index(spark, path)
    if meta is None or meta.get("kind") != SEM_KIND:
        raise ValueError(f"no semantic index at {path}")
    rows = meta.get("rows")
    if rows is None:  # pre-r10 sidecar — footer-only count, O(files)
        rows = spark.read.schema(_sem_schema(meta)).parquet(live).count()
    return rows / max(meta["k"], 1) > drift_factor * meta["target_cell_size"]


@_locked_writer
def recluster_semantic_index(
    spark: SparkSession,
    path: str,
    k: int | None = None,
    iters: int | None = None,
    target_cell_size: int | None = None,
    flat_k_max: int | None = None,
) -> dict:
    """Automated rebuild-and-swap for a drifted semantic index — what
    :func:`semantic_recluster_due` firing asks for (round-9 verdict
    task 1: the dial existed, rebuild was a manual create-at-a-fresh-
    path-then-swap).  One writer-side call:

    1. re-run the integer-exact Lloyd over the index's own STORED int8
       codes — the rows already carry ``q_vec``, so no corpus re-read
       and no caller-supplied frame; replay-duplicate rows are
       ``distinct()``-collapsed first (same row-purity argument as
       :func:`compact_index`);
    2. re-size the dials to the CURRENT corpus: ``k`` via ``auto_k``
       and ``n_buckets`` via ``auto_index_buckets`` over the stored row
       count (pass explicit values to pin them; ``iters``/
       ``target_cell_size`` default to the build-time sidecar values);
    3. write the re-celled rows + the re-packed seen sidecar (spfx
       RECOMPUTED — n_buckets changed) into generation N+1, the new
       assigner tree + meta LAST, then ONE atomic pointer flip.

    Parity contract (pinned by test_recluster_matches_fresh_bootstrap):
    the stored codes ARE ``quantize_int8(corpus)`` and the seed rule is
    the k lowest-id valid codes, so the rebuilt cells, tree and serve
    decisions are bit-identical to ``create_semantic_index`` over the
    full corpus at the same dials.  Crash-safe like compaction: a crash
    anywhere leaves the pointer on the old complete generation and
    :func:`recover_compaction` reaps the debris.  Single-writer slot
    ENFORCED via :func:`writer_lock` (r11; the semantic streaming
    sink's ``recluster_when_due`` runs it between triggers with
    ``lock_retries`` so it serializes behind external maintenance).

    Corrupt history (NULL-cell rows: NULL / wrong-length / null-element
    codes) is carried over unchanged — still NULL cell, NULL pfx, zero
    serve IO — exactly as a fresh bootstrap over the same corpus would
    place it.  Returns the new meta dict."""
    from .semantic import _kmeans_dispatch, _FLAT_K_MAX, tree_to_json

    recover_compaction(spark, path)  # writer entry point
    root = path.rstrip("/")
    live, meta = _open_live(spark, root, SEM_KIND, "create_semantic_index")
    if live == root:
        raise ValueError(
            f"index at {path} uses the legacy flat layout — run migrate_index "
            "first to get the reader-atomic pointer swap"
        )
    id_col, dims = meta["id_col"], meta["dims"]
    iters = meta["iters"] if iters is None else iters
    tcs = meta["target_cell_size"] if target_cell_size is None else target_cell_size

    tombs = _tombstone_list(spark, live)  # reaped by the rebuild, like compaction
    stored = (
        _minus_tombstones(
            spark, live, meta, spark.read.schema(_sem_schema(meta)).parquet(live), tombs
        )
        .distinct()
        .localCheckpoint()
    )
    n = stored.count()
    if k is None:
        from .semantic import auto_k

        k = auto_k(n, tcs)
    # valid codes only — the same exclusions _shifted_codes applies to
    # raw embeddings (NULL code, wrong width, interior NULL element)
    valid = (
        F.col("q_vec").isNotNull()
        & (F.size("q_vec") == dims)
        & ~F.exists("q_vec", lambda x: x.isNull())
    )
    # lazy checkpoint: the Lloyd jobs explode ``_u`` and would re-run
    # the shift transform per exploded element (the generator-inlining
    # trap measured in semantic.kmeans_int8_tree — 68.5 s → 17.9 s at
    # 196k×64); stored is already materialized, this pins the projection
    codes = stored.where(valid).select(
        id_col, F.transform("q_vec", lambda x: x.cast("long") + F.lit(127)).alias("_u")
    ).localCheckpoint(eager=False)
    final, _, tree = _kmeans_dispatch(
        codes, k, iters, id_col, _FLAT_K_MAX if flat_k_max is None else flat_k_max
    )
    if tree is None:
        raise ValueError(f"recluster_semantic_index: no valid codes in {path}")
    n_buckets = auto_index_buckets(n)
    new_rows = (
        stored.select(id_col, "q_vec", "q_norm")
        .join(final.withColumnRenamed("_cl", "cell"), id_col, "left")
        .select(id_col, F.col("cell").cast("int").alias("cell"), "q_vec", "q_norm")
    )
    new_meta = dict(
        meta,
        k=k,
        iters=iters,
        n_buckets=n_buckets,
        target_cell_size=tcs,
        bootstrap_rows=n,
        rows=n,
        tree=tree_to_json(tree),
    )
    gen = _new_generation(spark, root)
    new_dir = f"{root}/{gen}"
    (
        new_rows.withColumn("pfx", _cell_pfx(n_buckets))
        .repartition("pfx")
        .write.mode("overwrite")
        .partitionBy("pfx")
        .parquet(new_dir)
    )
    from ..sources.sinks import _hadoop_fs

    fs, path_cls, _ = _hadoop_fs(spark, root)
    if fs.exists(path_cls(f"{live}/_seen_ids")):
        (
            _minus_tombstones(
                spark,
                live,
                meta,
                spark.read.schema(_seen_schema(meta)).parquet(f"{live}/_seen_ids"),
                tombs,
            )
            .select(id_col)
            .distinct()
            # spfx recomputed under the SHARED convention (_seen_pfx —
            # round-10 advice: this site inlined the expression):
            # n_buckets just changed, so every entry re-buckets
            .withColumn("spfx", _seen_pfx(id_col, n_buckets))
            .repartition("spfx")
            .write.mode("overwrite")
            .partitionBy("spfx")
            .parquet(f"{new_dir}/_seen_ids")
        )
    _finish_generation(spark, root, gen, new_meta)
    return new_meta


@_locked_writer
def retract_ids(spark: SparkSession, path: str, ids: list) -> int:
    """Takedown across every index kind: remove ALL trace of ``ids`` —
    index rows AND seen-sidecar entries — by writing generation N+1
    without them and flipping the pointer atomically (round-9 verdict
    task 3).  Returns the number of index rows removed.

    Policy consequence (the point of takedown, pinned by
    test_retraction_*): a retracted document no longer disqualifies
    future content — a near-duplicate that was previously REJECTED
    against it is ACCEPTED on redelivery, and a streaming redelivery of
    a retracted id is re-processed rather than dropped by the seen
    filter.  Note the rejected copies of retracted content are
    themselves in the index (the index-grows-by-everything rule), so a
    takedown that means "this content must stop matching" must retract
    the whole near-dup group — pass every id the reconcile/dedup
    reports listed for it.

    ``ids`` is a driver-side list (takedown lists are legal artifacts,
    not data-scale) broadcast into one anti-join per store; the rewrite
    is one pruned-shuffle-free pass over the index (repartition on the
    EXISTING pfx — rows keep their buckets, only membership changes).
    Crash-safe exactly like compaction: meta lands last, the flip is
    atomic, :func:`recover_compaction` reaps a half-built generation.
    Single-writer slot ENFORCED via :func:`writer_lock` (r11), shared
    with compaction."""
    from ..sources.sinks import _hadoop_fs

    recover_compaction(spark, path)  # writer entry point
    root = path.rstrip("/")
    live, meta = live_index(spark, root)
    if meta is None:
        raise ValueError(f"no {META_FILE} at {path} — nothing to retract from")
    if live == root:
        raise ValueError(
            f"index at {path} uses the legacy flat layout — run migrate_index "
            "first to get the reader-atomic pointer swap"
        )
    ids = _check_request_ids(meta, list(ids), path)  # r13 review: same hazard
    id_col = meta["id_col"]
    ids_df = F.broadcast(_ids_df(spark, meta, ids))
    # fold pending tombstones into the purge: any generational rewrite
    # reaps them (same rule as compaction/recluster), so the new
    # generation starts with an empty takedown backlog.  Order-preserving
    # dedup, NOT sorted() (r13 advice), and the STORED list is filtered
    # through the sidecar's id type (r14 review): a legacy pre-guard
    # sidecar holding mixed-type junk must neither crash sorted() NOR
    # crash _ids_df below — either way the valid retraction would be
    # blocked.  The dropped junk could never match a stored row (wrong
    # type), and this rewrite drops the sidecar entirely, healing it.
    stored_tombs = _typed_stored_tombstones(meta, _tombstone_list(spark, live))
    purge = list(dict.fromkeys(list(ids) + stored_tombs))
    purge_df = F.broadcast(_ids_df(spark, meta, purge))
    schema = _kind_schema(meta)
    stored = spark.read.schema(schema).parquet(live)
    removed = stored.join(ids_df, id_col, "left_semi").count()
    gen = _new_generation(spark, root)
    new_dir = f"{root}/{gen}"
    (
        stored.join(purge_df, id_col, "left_anti")
        .repartition("pfx")
        .write.mode("overwrite")
        .partitionBy("pfx")
        .parquet(new_dir)
    )
    fs, path_cls, _ = _hadoop_fs(spark, root)
    if fs.exists(path_cls(f"{live}/_seen_ids")):
        (
            spark.read.schema(_seen_schema(meta))
            .parquet(f"{live}/_seen_ids")
            .join(purge_df, id_col, "left_anti")
            .repartition("spfx")
            .write.mode("overwrite")
            .partitionBy("spfx")
            .parquet(f"{new_dir}/_seen_ids")
        )
    if "rows" in meta:  # exact recount (footer-only) — the rewrite is rare
        meta = dict(meta, rows=spark.read.schema(schema).parquet(new_dir).count())
    _finish_generation(spark, root, gen, meta)
    return removed


# ----------------------------------------------------------- IVF kind
def _list_pfx(n_buckets: int) -> Column:
    # NULL centroid_id (the empty-codebook degenerate) → NULL pfx → the
    # Hive default partition, same convention as _bucket_pfx/_cell_pfx
    return F.when(
        F.col("centroid_id").isNotNull(),
        F.pmod(F.xxhash64("centroid_id"), F.lit(n_buckets)),
    ).cast("int")


def _ivf_centroids_from_meta(meta: dict) -> list[tuple[int, list[float]]]:
    return [(int(cid), [float(x) for x in mv]) for cid, mv in meta["centroids"]]


@_locked_writer
def create_ivf_index(
    embeddings: DataFrame,
    path: str,
    nlist: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codec: str = "float",
    m: int = 4,
    ksub: int = 16,
    n_buckets: int | None = None,
    centroids: list[tuple[int, list[float]]] | None = None,
) -> dict:
    """Bootstrap a persisted IVF index — the ANN sibling of the three
    dedup kinds, closing the round-9 verdict's lifecycle gap (ivf_index
    / ivf_pq_index returned DataFrames the caller persisted ad hoc: no
    sidecar param pinning, no id-type check, no reader-atomic swap).

    - inverted lists written ``partitionBy("pfx")`` with
      ``pfx = hash(centroid_id) % n_buckets`` — a serve reads ONLY the
      buckets its probed lists hash into, so per-query scan cost is
      O(n·nprobe/nlist) in ROWS **and** in files/IO, corpus-growth-flat
      under the √n dials;
    - the coarse codebook (and for ``codec="pq"`` the per-subspace
      codebooks) lives in the metadata sidecar: serves can never drift
      the quantizer the lists were built with, the exact failure class
      the dedup sidecars close;
    - same generation-pointer layout: compaction/:func:`retract_ids`
      rebuild into gen-N+1 with one atomic flip, crash windows handled
      by :func:`recover_compaction`.

    ``codec="float"`` stores (id, vector, centroid_id, norm) — exact
    re-scoring of probed rows (similarity.ivf_topk_indexed plan).
    ``codec="pq"`` stores (id, centroid_id, pq_code, pq_norm_sq) — m
    bytes per vector, ADC scoring (quantize.ivf_pq_topk plan); codebooks
    are trained from the corpus's own codes (deterministic lowest-id
    seed rule, the oracle-checkable quantizer).  ``nlist=None`` sizes by
    ``auto_nlist`` (√n); ``centroids`` overrides the deterministic
    codebook (e.g. ivf_centroids_kmeans).  Returns the meta dict."""
    from .quantize import pq_codebooks_from_codes, pq_encode, quantize_int8
    from .similarity import auto_nlist, ivf_centroids, ivf_index

    if codec not in ("float", "pq"):
        raise ValueError(f"unknown codec {codec!r} — 'float' or 'pq'")
    spark = embeddings.sparkSession
    recover_compaction(spark, path)  # writer entry point
    _reject_legacy_for_write(spark, path.rstrip("/"))
    n = embeddings.count()
    if nlist is None:
        nlist = auto_nlist(n)
    if centroids is None:
        centroids = ivf_centroids(embeddings, nlist, id_col, vec_col)
    assign = ivf_index(embeddings, centroids, id_col, vec_col, method="auto")
    meta = {
        "kind": IVF_KIND,
        "id_col": id_col,
        "id_type": dict(embeddings.dtypes)[id_col],
        "vec_col": vec_col,
        "dims": len(centroids[0][1]) if centroids else 0,
        "nlist": len(centroids),
        "codec": codec,
        "centroids": [[cid, mv] for cid, mv in centroids],
        # drift-dial feed (r11): running counter in the _rows sidecar
        # past bootstrap, same machinery as the SEM kind
        "bootstrap_rows": n,
        "rows": n,
    }
    if codec == "pq":
        codes = quantize_int8(assign, vec_col).select(id_col, "centroid_id", "q_vec")
        codebooks = pq_codebooks_from_codes(codes, m=m, ksub=ksub, id_col=id_col)
        rows = pq_encode(codes, codebooks, id_col=id_col, carry_cols=["centroid_id"])
        meta["pq"] = {"m": m, "ksub": ksub, "codebooks": codebooks}
    else:
        rows = assign
    if n_buckets is None:
        # more buckets than lists is pointless (at most nlist non-empty
        # directories); fewer co-locates several lists per bucket, which
        # only coarsens pruning — cap at nlist
        n_buckets = min(auto_index_buckets(n), max(len(centroids), 1))
    meta["n_buckets"] = n_buckets
    root = path.rstrip("/")
    gen = _new_generation(spark, root)
    (
        rows.withColumn("pfx", _list_pfx(n_buckets))
        .repartition("pfx")
        .write.mode("overwrite")
        .partitionBy("pfx")
        .parquet(f"{root}/{gen}")
    )
    _finish_generation(spark, root, gen, meta)
    return meta


def open_ivf_index(
    spark: SparkSession,
    path: str,
    nlist: int | None = None,
    codec: str | None = None,
) -> tuple[DataFrame, dict]:
    """Open a persisted IVF index: validate nlist/codec against the
    sidecar (None = accept stored) and return ``(index_df, meta)``;
    ``meta['centroids']`` (and ``meta['pq']['codebooks']`` for the pq
    codec) are the pinned quantizers."""
    live, meta = _open_live(spark, path, IVF_KIND, "create_ivf_index")
    expected: dict = {}
    if nlist is not None:
        expected["nlist"] = nlist
    if codec is not None:
        expected["codec"] = codec
    _require_meta(meta, expected, path)
    df = spark.read.schema(_ivf_schema(meta)).parquet(live)
    return _minus_tombstones(spark, live, meta, df), meta


def append_ivf_vectors(
    new_embeddings: DataFrame, path: str, dedupe_redelivery: bool = False
) -> None:
    """Ingest an increment into the persisted IVF lists: assign to the
    STORED coarse codebook (no retraining — the standard IVF add path),
    encode with the STORED PQ codebooks when the index is pq-codec, and
    append into the live generation's bucket partitions.  Growth bumps
    the ``_rows`` counter feeding :func:`ivf_retrain_due`; when the
    dial fires, :func:`retrain_ivf_index` re-sizes nlist to the grown
    corpus — until then added vectors are exactly as servable as
    bootstrap ones.

    Delivery contract (round-10 advice — it was previously implicit):
    the default path is SINGLE-WRITER / EXACTLY-ONCE-SOURCE — a
    retried ingest double-appends its vectors, and duplicate rows can
    then occupy multiple top-k slots in :func:`serve_ivf_topk`,
    displacing true neighbors (compaction's ``distinct()`` collapses
    them, but only when it runs).  For redelivery-prone sources set
    ``dedupe_redelivery=True``: already-ingested ids are dropped
    through the same pruned seen-id sidecar the streaming dedup sinks
    use (O(increment) reads), and the increment's ids are recorded
    AFTER the data append — a crash between the two replays the batch
    as full-row duplicates (at-least-once, collapsed by the next
    compaction), never as lost vectors.  Appends racing a concurrent
    compact/retract/retrain generation swap remain out of contract
    either way: run ingest in the single-writer slot."""
    from .quantize import pq_encode, quantize_int8
    from .similarity import ivf_index

    spark = new_embeddings.sparkSession
    live, meta = _open_live(spark, path, IVF_KIND, "create_ivf_index")
    _check_id_type(new_embeddings, meta, path)
    id_col, vec_col = meta["id_col"], meta["vec_col"]
    tombs = _tombstone_list(spark, live)
    if dedupe_redelivery:
        new_embeddings = seen_filter_fresh(new_embeddings, live, meta).persist()
        if new_embeddings.isEmpty():
            new_embeddings.unpersist()
            return
    else:
        # single evaluation (r11 review): the write, the counter bump's
        # count() and the tombstone probe would otherwise re-run the
        # increment's upstream plan up to three times — and a
        # nondeterministic source could make the counted rows disagree
        # with the written ones
        new_embeddings = new_embeddings.localCheckpoint()
    try:
        if not meta["centroids"] and meta["codec"] == "float":
            # EMPTY bootstrap codebook: the assignment kernel returns
            # zero rows for it, which would silently DROP the ingest.
            # Park the vectors in the NULL list instead (NULL pfx —
            # never probed, zero serve IO) so they are retained but
            # unservable until the first retrain_ivf_index gives the
            # index a codebook (ivf_retrain_due reports due).
            assign = new_embeddings.select(
                F.col(id_col),
                F.col(vec_col),
                F.lit(None).cast("long").alias("centroid_id"),
                F.lit(0.0).alias("_n"),
            )
        else:
            assign = ivf_index(
                new_embeddings, _ivf_centroids_from_meta(meta), id_col, vec_col, method="auto"
            )
        if meta["codec"] == "pq":
            codes = quantize_int8(assign, vec_col).select(id_col, "centroid_id", "q_vec")
            rows = pq_encode(
                codes, meta["pq"]["codebooks"], id_col=id_col, carry_cols=["centroid_id"]
            )
        else:
            rows = assign
        (
            rows.withColumn("pfx", _list_pfx(meta["n_buckets"]))
            .write.mode("append")
            .partitionBy("pfx")
            .parquet(live)
        )
        _bump_rows(spark, live, meta, new_embeddings.count())
        back = _reingested_tombstones(spark, meta, new_embeddings, tombs)
        if back:  # re-ingested takedown ids become servable again
            clear_tombstones(spark, live, back)
        if dedupe_redelivery:  # commit marker — written last (see docstring)
            append_seen_ids(new_embeddings, live, meta)
    finally:
        if dedupe_redelivery:
            new_embeddings.unpersist()


def serve_ivf_topk(
    queries: DataFrame,
    path: str,
    k: int = 10,
    nprobe: int | None = None,
    query_id_col: str = "query_id",
    exclude_self: bool = False,
    rerank_embeddings: DataFrame | None = None,
) -> DataFrame:
    """Top-k serve off the persisted IVF index with bucket pruning:

    1. rank the sidecar codebook per query, keep ``nprobe`` lists;
    2. collect the probed lists' pfx values (≤ n_buckets ints) and read
       ONLY those bucket directories (:func:`pruned_read` — the scan is
       O(probed lists), never O(corpus), in IO as well as rows);
    3. score with the codec's kernel — exact cosine for ``float``
       (similarity.ivf_topk_indexed), integer ADC for ``pq``
       (quantize.ivf_pq_topk), ADC + exact re-rank when
       ``rerank_embeddings`` (the full-precision source) is given
       (quantize.ivf_pq_topk_rerank — the production recall recovery).

    All quantizers come from the sidecar — a caller cannot drift them.
    ``nprobe=None`` sizes by ``auto_nprobe`` (a fixed fraction of the
    list space).  The centroid ranking runs twice (touched-bucket probe
    here + inside the serve kernel): |queries|·nlist tiny rows, noise
    next to the list scan it prunes."""
    from .quantize import ivf_pq_topk, ivf_pq_topk_rerank
    from .similarity import (
        _codebook_df,
        _rank_centroids,
        auto_nprobe,
        ivf_topk_indexed,
    )

    spark = queries.sparkSession
    live, meta = _open_live(spark, path, IVF_KIND, "create_ivf_index")
    centroids = _ivf_centroids_from_meta(meta)
    id_col, vec_col, nb = meta["id_col"], meta["vec_col"], meta["n_buckets"]
    if nprobe is None:
        nprobe = auto_nprobe(meta["nlist"])
    codebook = _codebook_df(queries, centroids)
    probes = _rank_centroids(
        queries.select(query_id_col, F.col(vec_col).alias("_qvec")),
        codebook,
        "_qvec",
        keep=nprobe,
        key_cols=[query_id_col],
    )
    touched = [
        r.p
        for r in probes.select(_list_pfx(nb).alias("p"))
        .where(F.col("p").isNotNull())
        .distinct()
        .collect()
    ]
    index = _minus_tombstones(
        spark, live, meta, pruned_read(spark, live, _ivf_schema(meta), touched)
    ).drop("pfx")
    if meta["codec"] == "pq":
        codebooks = meta["pq"]["codebooks"]
        if rerank_embeddings is not None:
            _check_id_type(rerank_embeddings, meta, path)
            return ivf_pq_topk_rerank(
                index,
                queries,
                centroids,
                codebooks,
                rerank_embeddings,
                k=k,
                nprobe=nprobe,
                id_col=id_col,
                vec_col=vec_col,
                query_id_col=query_id_col,
                exclude_self=exclude_self,
            )
        return ivf_pq_topk(
            index,
            queries,
            centroids,
            codebooks,
            k=k,
            nprobe=nprobe,
            id_col=id_col,
            vec_col=vec_col,
            query_id_col=query_id_col,
            exclude_self=exclude_self,
        )
    return ivf_topk_indexed(
        index,
        queries,
        centroids,
        k=k,
        nprobe=nprobe,
        id_col=id_col,
        vec_col=vec_col,
        query_id_col=query_id_col,
        exclude_self=exclude_self,
    )


def _pq_decode_sql(codebooks: list[list[list[int]]], code_col: str = "pq_code") -> str:
    """Reconstruct the int8-space vector from a PQ code: concatenate
    each subspace's looked-up codebook entry (``element_at`` is
    1-based; a NULL code NULLs the whole reconstruction, matching the
    corrupt-row convention).  One SQL string per call, same rationale
    as the quantize kernels: nested Column trees cost thousands of
    py4j round-trips at m·ksub scale, the parser takes the string in
    one."""
    # the encode side's renderer, not a local copy (r12 review: a
    # byte-identical duplicate here could silently diverge from
    # pq_encode's rendering under a future change)
    from .quantize import _int_array_sql

    parts = []
    for s, book in enumerate(codebooks):
        arr = (
            "array("
            + ", ".join(_int_array_sql(c) for c in book)
            + ")"
        )
        parts.append(f"element_at({arr}, cast({code_col}[{s}] AS int) + 1)")
    return "transform(concat(" + ", ".join(parts) + "), t -> cast(t AS double))"


def ivf_retrain_due(
    spark: SparkSession,
    path: str,
    drift_factor: float = 2.0,
    resolved: tuple[str, dict | None] | None = None,
) -> bool:
    """Growth drift dial for the IVF kind — the sibling of
    :func:`semantic_recluster_due`, closing the round-10 verdict note
    ("the IVF kind has no drift dial or retrain").  Appends assign to
    the FROZEN bootstrap codebook, so after heavy growth nlist is too
    small for the corpus and per-query list-scan cost creeps up: under
    the ``auto_nlist`` √n rule the ideal list count is √rows, so the
    dial fires when ``√rows > drift_factor × nlist`` — i.e. the corpus
    outgrew the codebook by ``drift_factor²`` (default 2.0 → fire at
    4× the bootstrap corpus, when per-list scan cost is 2× ideal).
    Explicitly-sized codebooks get the same reading relative to the
    √ rule; operators who pinned nlist own their own schedule.

    O(1): rows come from the ``_rows`` sidecar counter maintained by
    every committed append/compact/retract/retrain (pre-r11 sidecars
    fall back to one parquet-footer count).  An EMPTY bootstrap
    codebook (zero-row create) reports due as soon as any rows exist —
    the first retrain is what gives it lists at all.  ``resolved``:
    see :func:`rebucket_due` (the console's no-torn-snapshot hook)."""
    live, meta = resolved if resolved is not None else live_index(spark, path)
    if meta is None or meta.get("kind") != IVF_KIND:
        raise ValueError(f"no IVF index at {path}")
    rows = meta.get("rows")
    if rows is None:  # pre-r11 sidecar — footer-only count, O(files)
        rows = spark.read.schema(_ivf_schema(meta)).parquet(live).count()
    nlist = meta.get("nlist", 0)
    if nlist <= 0:
        return rows > 0
    return rows > (drift_factor * nlist) ** 2


@_locked_writer
def retrain_ivf_index(
    spark: SparkSession,
    path: str,
    nlist: int | None = None,
    n_buckets: int | None = None,
    embeddings: DataFrame | None = None,
) -> dict:
    """Rebuild-and-swap for a grown IVF index — what
    :func:`ivf_retrain_due` firing asks for; the IVF sibling of
    :func:`recluster_semantic_index`, built on the same generation
    protocol (new codebook + rows into gen N+1, meta LAST, one atomic
    pointer flip; crash debris reaped by :func:`recover_compaction`;
    single-writer slot enforced via :func:`writer_lock`, r11).
    Re-sizes ``nlist`` via
    ``auto_nlist`` (√n) and ``n_buckets`` via ``auto_index_buckets``
    over the CURRENT row count (pass explicit values to pin); pending
    tombstones and replay-duplicate rows are reaped by the rewrite.

    Vector source per codec:

    - ``codec='float'`` — the stored rows carry the exact vectors, so
      the retrain needs NO corpus re-read and is BIT-EXACT with
      ``create_ivf_index`` over the same corpus at the same dials
      (same deterministic lowest-id seed rule, same assignment
      kernel) — pinned by test_retrain_matches_fresh_bootstrap.
    - ``codec='pq'`` — PQ codes are lossy, so by default the coarse
      codebook is retrained over the RECONSTRUCTED vectors
      (:func:`_pq_decode_sql` — concatenated codebook entries).  The
      stored ``pq_code``/``pq_norm_sq`` encode the vector itself (not
      a residual), so they stay VALID under any re-assignment: only
      list membership changes, i.e. recall geometry, never scoring —
      no re-encode, PQ codebooks unchanged.  Pass ``embeddings`` (the
      full-precision source, covering the stored ids) to train/assign
      on exact vectors instead; ids it does not cover keep a NULL
      centroid (NULL pfx — unservable until re-ingested).

    Returns the new meta dict."""
    from ..sources.sinks import _hadoop_fs
    from .similarity import auto_nlist, ivf_centroids, ivf_index

    recover_compaction(spark, path)  # writer entry point
    root = path.rstrip("/")
    live, meta = _open_live(spark, root, IVF_KIND, "create_ivf_index")
    if live == root:
        raise ValueError(
            f"index at {path} uses the legacy flat layout — run migrate_index "
            "first to get the reader-atomic pointer swap"
        )
    id_col, vec_col = meta["id_col"], meta["vec_col"]
    tombs = _tombstone_list(spark, live)  # reaped by the rebuild
    stored = (
        _minus_tombstones(
            spark, live, meta, spark.read.schema(_ivf_schema(meta)).parquet(live), tombs
        )
        .distinct()
        .localCheckpoint()  # reused by count + seed collect + rewrite
    )
    n = stored.count()
    if nlist is None:
        nlist = auto_nlist(n)
    if meta["codec"] == "pq":
        if embeddings is not None:
            _check_id_type(embeddings, meta, path)
            vecs = embeddings.select(id_col, vec_col)
        else:
            vecs = stored.select(
                id_col, F.expr(_pq_decode_sql(meta["pq"]["codebooks"])).alias(vec_col)
            )
    else:
        # float codec stores the exact vectors — an external source
        # could only disagree with them, so it is ignored by design
        vecs = stored.select(id_col, vec_col)
    centroids = ivf_centroids(vecs, nlist, id_col, vec_col)
    if meta["codec"] == "pq":
        assign = ivf_index(vecs, centroids, id_col, vec_col, method="auto").select(
            id_col, "centroid_id"
        )
        new_rows = (
            stored.drop("centroid_id", "pfx")
            .join(assign, id_col, "left")
            .select(id_col, "centroid_id", "pq_code", "pq_norm_sq")
        )
    else:
        new_rows = ivf_index(
            stored.select(id_col, vec_col), centroids, id_col, vec_col, method="auto"
        )
    if n_buckets is None:
        # same cap rule as create: more buckets than lists is pointless
        n_buckets = min(auto_index_buckets(n), max(len(centroids), 1))
    new_meta = dict(
        meta,
        nlist=len(centroids),
        centroids=[[cid, mv] for cid, mv in centroids],
        n_buckets=n_buckets,
        bootstrap_rows=n,
        rows=n,
    )
    gen = _new_generation(spark, root)
    new_dir = f"{root}/{gen}"
    (
        new_rows.withColumn("pfx", _list_pfx(n_buckets))
        .repartition("pfx")
        .write.mode("overwrite")
        .partitionBy("pfx")
        .parquet(new_dir)
    )
    fs, path_cls, _ = _hadoop_fs(spark, root)
    if fs.exists(path_cls(f"{live}/_seen_ids")):
        (
            _minus_tombstones(
                spark,
                live,
                meta,
                spark.read.schema(_seen_schema(meta)).parquet(f"{live}/_seen_ids"),
                tombs,
            )
            .select(id_col)
            .distinct()
            # spfx recomputed under the shared convention — n_buckets changed
            .withColumn("spfx", _seen_pfx(id_col, n_buckets))
            .repartition("spfx")
            .write.mode("overwrite")
            .partitionBy("spfx")
            .parquet(f"{new_dir}/_seen_ids")
        )
    _finish_generation(spark, root, gen, new_meta)
    return new_meta


def index_info(spark: SparkSession, path: str) -> dict:
    """Read-only operator console for one index slot (r11) — the
    lifecycle grew enough moving parts (generations, row counter,
    tombstone backlog, drift dials, writer lock) that "what state is
    this index in?" deserves one cheap call instead of five sidecar
    reads.  Lock-free and passive (safe during a live writer): small-
    file reads plus one bounded generation listing; the only data-scale
    work is the footer-count fallback for pre-counter sidecars, and
    only when a dial needs it.

    Returns ``{path, live, kind, meta, rows, generations,
    pending_tombstones, maintenance_due, appends_since_rewrite,
    compact_due, writer_lock}`` where

    - ``rows`` is the counter-overlaid live count (None for kinds that
      do not maintain one);
    - ``maintenance_due`` is the kind-appropriate REBUILD dial at
      default factors (:func:`semantic_recluster_due` /
      :func:`ivf_retrain_due`; None for the band/embed kinds, which
      have no quantizer to rebuild);
    - ``appends_since_rewrite`` / ``compact_due`` report the
      small-file dial (r14, every kind): committed appends absorbed by
      the live generation and whether :func:`compact_due` fires at the
      default threshold;
    - ``writer_lock`` is the holder breadcrumb (op + acquire time) when
      a writer currently holds the slot, "held" when the marker exists
      but the breadcrumb was lost to a crash, and None when free."""
    root = path.rstrip("/")
    live, meta = live_index(spark, root)
    info: dict = {
        "path": root,
        "live": live,
        "kind": None if meta is None else meta.get("kind"),
        "meta": meta,
        "rows": None if meta is None else meta.get("rows"),
        "generations": _gen_dir_names(spark, root),
        "pending_tombstones": len(_tombstone_list(spark, live)),
        "maintenance_due": None,
        "writer_lock": None,
    }
    # ONE counter read derives both fields (r14 review): a committed
    # append landing between two reads would report appends=7 next to
    # compact_due computed from 8 — the torn-snapshot class the
    # resolved= plumbing below exists to prevent
    n_appends = _appends_count(spark, live)
    info["appends_since_rewrite"] = n_appends
    info["compact_due"] = None if meta is None else n_appends >= COMPACT_MAX_APPENDS
    if meta is not None:
        # the dials receive THIS resolution (r12 review): re-resolving
        # inside them could race a concurrent rebuild's pointer flip and
        # pair gen-N meta/rows with a gen-N+1 dial reading — the exact
        # torn-snapshot class live_index's docstring forbids
        if meta.get("kind") == SEM_KIND:
            info["maintenance_due"] = semantic_recluster_due(
                spark, root, resolved=(live, meta)
            )
        elif meta.get("kind") == IVF_KIND:
            info["maintenance_due"] = ivf_retrain_due(
                spark, root, resolved=(live, meta)
            )
    lock_text = _read_small_file(spark, f"{root}{WRITER_LOCK_SUFFIX}")
    if lock_text is not None:  # "" = marker exists, breadcrumb not yet/lost
        try:
            info["writer_lock"] = json.loads(lock_text) if lock_text.strip() else "held"
        except ValueError:
            info["writer_lock"] = "held"
    return info
