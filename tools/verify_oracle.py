"""Local stand-in for the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB over the same parquet tables, then compares row count, column
names, and an order-insensitive value comparison (sorted columns, sorted
rows, NaN-safe, 1e-9 relative tolerance for floats — stricter than the
driver's hash in that it localizes WHICH cells differ).

Usage: python tools/verify_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
    return df.sort_values(list(df.columns), na_position="last").reset_index(drop=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    errs: list[str] = []
    if len(spark_pdf) != len(duck_pdf):
        errs.append(f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}")
    scols, dcols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if scols != dcols:
        errs.append(f"columns spark={scols} duck={dcols}")
        return errs
    if errs:
        return errs
    s, d = normalize(spark_pdf), normalize(duck_pdf)
    for c in s.columns:
        sv, dv = s[c], d[c]
        if sv.dtype.kind != dv.dtype.kind:
            errs.append(
                f"col {c}: dtype kind mismatch spark={sv.dtype} duck={dv.dtype} (driver hash may FAIL)"
            )
        try:
            if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(dv):
                sv_f = pd.to_numeric(sv, errors="coerce").astype(float)
                dv_f = pd.to_numeric(dv, errors="coerce").astype(float)
                close = ((sv_f - dv_f).abs() <= (1e-9 * dv_f.abs().clip(lower=1.0))) | (
                    sv_f.isna() & dv_f.isna()
                )
                bad = (~close).to_numpy().nonzero()[0]
                exact = (sv_f != dv_f) & ~(sv_f.isna() & dv_f.isna())
                n_inexact = int(exact.sum())
            else:
                eq = (sv == dv) | (sv.isna() & dv.isna())
                bad = (~eq).to_numpy().nonzero()[0]
                n_inexact = len(bad)
            if len(bad):
                i = int(bad[0])
                errs.append(f"col {c}: {len(bad)} diffs, first row {i}: spark={s[c][i]!r} duck={d[c][i]!r}")
            elif n_inexact:
                errs.append(f"col {c}: OK within tol but {n_inexact} not bit-exact (hash would FAIL)")
        except Exception as e:
            errs.append(f"col {c}: compare error {e}")
    return errs


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as se
    from meta_morph_etl_databricks_spark.session import get_spark

    spark = get_spark("verify-oracle")
    qs, oracles = se.queries(), se.oracle_sql()
    names = sys.argv[2:] or list(qs)
    con = duck_connection(sf_dir)
    failed = []
    for name in names:
        t0 = time.time()
        try:
            spdf = qs[name](spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL {name}: spark raised\n{traceback.format_exc()}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"SKIP-ORACLE {name}: rows={len(spdf)} ({time.time()-t0:.1f}s)")
            continue
        try:
            dpdf = con.execute(oracles[name]).fetchdf()
        except Exception:
            print(f"FAIL {name}: duckdb raised\n{traceback.format_exc()}")
            failed.append(name)
            continue
        errs = compare(name, spdf, dpdf)
        if errs:
            print(f"FAIL {name} ({time.time()-t0:.1f}s):")
            for e in errs:
                print(f"   {e}")
            failed.append(name)
        else:
            print(f"OK   {name}: rows={len(spdf)} ({time.time()-t0:.1f}s)")
    print(f"\n{len(names)-len(failed)}/{len(names)} passed")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
