"""Skew-handling operators: salting for hot keys.

AQE's skew-join splitting (on in session.py) handles most runtime skew,
but two shapes still need explicit salting at 100 TB:

- a grouped aggregate where one key holds a large share of all rows
  (AQE can't split a hash-aggregate partition mid-group), and
- a shuffle join against a hot key when the build side is too big to
  broadcast (AQE splits sort-merge partitions, but salting bounds the
  worst case deterministically).

Both helpers keep exact semantics: salting only changes WHERE partial
results are computed, the final reduce removes the salt.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def with_salt(df: DataFrame, buckets: int, salt_from: list[str] | None = None) -> DataFrame:
    """Salt in [0, buckets) — spreads a hot key over ``buckets`` reducers.

    ``salt_from`` names columns whose hash derives the salt
    deterministically (pick fine-grained columns — a row id, line
    number, timestamp — NOT the group key, which would map the whole
    hot key to one salt).  Prefer it whenever such columns exist:
    rand() is only per-partition-deterministic, so if ``df`` is itself
    shuffle output (nondeterministic row order), a map task recomputed
    after a fetch failure re-deals different salts and downstream
    aggregates can double-count or drop rows.  The rand() fallback is
    safe only when salting deterministic scan output."""
    if salt_from:
        salt = F.pmod(F.xxhash64(*[F.col(c) for c in salt_from]), F.lit(buckets))
        return df.withColumn(SALT_COL, salt.cast("int"))
    return df.withColumn(SALT_COL, (F.rand() * buckets).cast("int"))


_PARTIAL_FN = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
_MERGE_FN = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list[tuple[str, str, Column]],
    buckets: int = 16,
    salt_from: list[str] | None = None,
) -> DataFrame:
    """Two-stage skew-proof aggregation for ALGEBRAIC aggregates:
    stage 1 reduces (key, salt) partials — the hot key's rows spread
    over ``buckets`` reducers — stage 2 merges the ≤buckets partial rows
    per key (count merges by summing partial counts).

    ``aggs`` entries are (output_name, fn, input_column) with fn one of
    sum/count/min/max — the algebraic set whose merge rule is known.
    """
    for _, fn, _c in aggs:
        if fn not in _PARTIAL_FN:
            raise ValueError(f"salted_agg supports {sorted(_PARTIAL_FN)} only, got {fn!r}")
    partial = (
        with_salt(df, buckets, salt_from)
        .groupBy(*keys, SALT_COL)
        .agg(*[_PARTIAL_FN[fn](col).alias(f"_p_{name}") for name, fn, col in aggs])
    )
    return partial.groupBy(*keys).agg(
        *[_MERGE_FN[fn](F.col(f"_p_{name}")).alias(name) for name, fn, _ in aggs]
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    buckets: int = 16,
    how: str = "inner",
    salt_from: list[str] | None = None,
    max_replicated_rows: int | None = 100_000_000,
) -> DataFrame:
    """Skew-proof equi join when the dim side is too big to broadcast:
    salt the fact rows, replicate each dim row across all ``buckets`` salt
    values (explode), join on keys + salt.  The hot key's fact rows land
    on ``buckets`` different reducers, each holding one dim replica.

    Replication factor = buckets × |dim| — use only when |dim| ≪ |fact|
    but above the broadcast threshold, and keep buckets modest.

    ``max_replicated_rows`` guards that blowup: a bounded ``limit(n+1)``
    probe (same style as ``collect_small``) raises if buckets × |dim|
    would exceed it, instead of OOMing executors mid-shuffle at scale.
    Pass ``None`` to skip the probe (it costs one short job on dim).
    """
    if max_replicated_rows is not None:
        if buckets > max_replicated_rows:
            raise ValueError(
                f"salted_join: buckets={buckets} alone exceeds "
                f"max_replicated_rows={max_replicated_rows}"
            )
        dim_cap = max_replicated_rows // buckets
        probe = dim.limit(dim_cap + 1).count()
        if probe > dim_cap:
            raise ValueError(
                f"salted_join would replicate the dim side to more than "
                f"{max_replicated_rows:,} rows (>{dim_cap:,} dim rows x "
                f"{buckets} buckets). Lower `buckets`, pre-filter/pre-aggregate "
                f"the dim side, broadcast it if it fits, or raise/disable "
                f"`max_replicated_rows` if the blowup is intended."
            )
    salted_fact = with_salt(fact, buckets, salt_from)
    replicated = dim.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    return salted_fact.join(replicated, [*on, SALT_COL], how).drop(SALT_COL)
