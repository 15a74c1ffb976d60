"""Z-order (Morton-curve) data layout — multi-dimensional file skipping
for selective scans, the plain-parquet analog of Databricks'
``OPTIMIZE ... ZORDER BY``.

Parquet readers prune whole files/row-groups from min/max footer stats.
A layout sorted linearly on one column prunes THAT column's predicates
only: a filter on any other column overlaps every file.  Interleaving
the bits of k quantized columns into one Morton key and range-
partitioning on it gives every file a small hyper-rectangle of the
k-dim space, so a selective predicate on ANY of the k columns skips
most files (~n^((k-1)/k) of n files touched per single-column slice,
vs all n under a foreign sort order).

This complements, not replaces, the other layout levers here:
``write_bucketed`` (sinks.py) co-locates JOINS on one key set;
partitionBy("day_dt") prunes the time dimension exactly; z-order
serves multi-column RANGE/point predicates where neither applies.
All three are write-once costs paid at ingest — the 100 TB principle
that a byte shuffled at write time is repaid on every later scan.

No reference analog (the reference's only layout lever is the DAY_DT
partition convention, m_push_data_to_gcs_reporting.py:26-28); this is
part of the lakehouse-scale extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def zorder_key(
    ranges: list[tuple[Column | str, float, float]],
    bits: int = 12,
) -> Column:
    """Morton key: quantize each column to ``bits`` bits over its
    [lo, hi] range, interleave the bits (column j's bit i lands at
    position ``i·k + j``), return one bigint.

    Pure integer expression — codegen'd per row, no shuffle, no UDF.
    NULLs and values above ``hi`` clamp to the top code, values below
    ``lo`` clamp to 0 (out-of-range data degrades pruning for its file,
    never correctness — the key orders data, it is not read back).
    A degenerate range (lo == hi) contributes constant 0 bits.
    ``bits · k`` must stay within a signed long (≤ 62).
    """
    k = len(ranges)
    if k == 0:
        raise ValueError("zorder_key needs at least one column")
    if bits * k > 62:
        raise ValueError(f"bits*cols = {bits * k} exceeds the 62-bit Morton budget")
    top = (1 << bits) - 1
    quantized: list[Column] = []
    for col, lo, hi in ranges:
        c = F.col(col) if isinstance(col, str) else col
        if hi <= lo:
            quantized.append(F.lit(0).cast("bigint"))
            continue
        q = F.floor((c.cast("double") - F.lit(float(lo))) / F.lit(hi - lo) * (top + 1))
        # NULL must be decided BEFORE clamping: greatest/least skip
        # NULL operands, so a NULL q would silently clamp to 0
        q = F.when(
            c.isNull(), F.lit(top).cast("bigint")
        ).otherwise(F.least(F.greatest(q, F.lit(0)), F.lit(top)).cast("bigint"))
        quantized.append(q)
    parts = [
        F.shiftleft(F.shiftright(q, i).bitwiseAND(F.lit(1)), i * k + j)
        for j, q in enumerate(quantized)
        for i in range(bits)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.bitwiseOR(p)
    return out


def zorder_frame(
    df: DataFrame,
    cols: list[str],
    bits: int = 12,
    num_files: int = 32,
) -> DataFrame:
    """Cluster ``df`` along the Morton curve of ``cols`` — the
    write-agnostic half of :func:`write_zordered`, reused by any sink
    that wants the layout (e.g. sinks.publish_partition's
    ``zorder_by``).

    One tiny min/max aggregate fixes the quantization ranges, then a
    single range-partitioning shuffle on the Morton key (sampled
    boundaries → equal-size files regardless of data skew in any one
    column) with a within-partition sort tightens every file's per-
    column min/max envelope.  The key is dropped before returning —
    the layout is carried by partition boundaries and row order, not a
    stored column."""
    stats = df.agg(
        *[F.min(c).cast("double").alias(f"_lo_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"_hi_{c}") for c in cols],
    ).first()
    ranges = [
        (c, stats[f"_lo_{c}"] or 0.0, stats[f"_hi_{c}"] or 0.0) for c in cols
    ]
    return (
        df.withColumn("_z", zorder_key(ranges, bits=bits))
        .repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 12,
    num_files: int = 32,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet clustered along the Morton curve of
    ``cols`` (see :func:`zorder_frame` for the mechanics).

    Pick ``num_files`` so each file is 100 MB–1 GB at the target scale;
    skipping granularity is per file (and per row-group within).
    """
    zorder_frame(df, cols, bits=bits, num_files=num_files).write.mode(mode).parquet(path)


def file_pruning_fraction(
    spark: SparkSession,
    path: str,
    predicates: dict[str, tuple[float, float]],
) -> float:
    """Diagnostic: the fraction of files a conjunctive range predicate
    can SKIP from per-file min/max alone — exactly the decision a
    parquet reader makes from footer stats, measured from the data so
    tests (and capacity planning) don't depend on engine internals.

    ``predicates`` maps column → (lo, hi); a file survives only if
    every column's [min, max] envelope overlaps its range."""
    df = spark.read.parquet(path)
    cols = list(predicates)
    per_file = df.groupBy(F.input_file_name().alias("_f")).agg(
        *[F.min(c).alias(f"_lo_{c}") for c in cols],
        *[F.max(c).alias(f"_hi_{c}") for c in cols],
    )
    overlap = None
    for c, (lo, hi) in predicates.items():
        cond = (F.col(f"_hi_{c}") >= F.lit(lo)) & (F.col(f"_lo_{c}") <= F.lit(hi))
        overlap = cond if overlap is None else (overlap & cond)
    counts = per_file.agg(
        F.count("*").alias("n"),
        F.sum(overlap.cast("int")).alias("hit"),
    ).first()
    if not counts["n"]:
        return 0.0
    return 1.0 - counts["hit"] / counts["n"]
