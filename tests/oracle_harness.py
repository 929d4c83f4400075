"""Local oracle harness — mirrors the driver's correctness compare:
run each declared query in Spark AND its DuckDB oracle SQL at a
given SF, sort columns by name, compare row multisets exactly
(doubles compared bitwise after the queries' own determinism
conventions; a tolerance report is printed on mismatch for
debugging).

Usage: python3 tests/oracle_harness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Cross-engine dtype canonicalization: ints → int64 (float64 if
    nullable), floats → float64, datetimes → tz-naive ns."""
    import numpy as np

    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        dt = str(df[c].dtype)
        if dt.startswith("datetime64"):
            s = pd.to_datetime(df[c])
            if getattr(s.dt, "tz", None) is not None:
                s = s.dt.tz_localize(None)
            df[c] = s.astype("datetime64[ns]")
        elif dt.startswith(("int", "uint", "Int", "UInt")):
            df[c] = df[c].astype("int64") if not df[c].isna().any() else df[c].astype("float64")
        elif dt.startswith(("float", "Float")):
            df[c] = df[c].astype("float64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(name: str, spark_df, oracle_pdf: pd.DataFrame) -> tuple[bool, str]:
    raw_s = spark_df.toPandas()
    # STRICT dtype-kind gate, mirroring the driver: a DuckDB HUGEINT
    # (SUM over ints) arrives as float64 while Spark returns int64 —
    # numerically equal but hash-different ("99111.0" vs "99111").
    # canon() would mask this, so check kinds on the RAW frames first.
    kind_probs = []
    for c in sorted(set(raw_s.columns) & set(oracle_pdf.columns)):
        ks, ko = raw_s[c].dtype.kind, oracle_pdf[c].dtype.kind
        num = {"i", "u", "f"}
        if ks != ko and not (ks in num and ko in num and ("f" not in (ks, ko))):
            kind_probs.append(f"{c}: spark dtype {raw_s[c].dtype} vs oracle {oracle_pdf[c].dtype}")
    s = canon(raw_s)
    o = canon(oracle_pdf)
    if kind_probs:
        return False, "dtype-kind mismatch (driver hash would differ): " + "; ".join(kind_probs)
    if s.shape[0] != o.shape[0]:
        return False, f"rowcount spark={s.shape[0]} oracle={o.shape[0]}"
    if list(s.columns) != list(o.columns):
        return False, f"columns spark={list(s.columns)} oracle={list(o.columns)}"
    problems = []
    for c in s.columns:
        a, b = s[c], o[c]
        try:
            if str(a.dtype).startswith("float") or str(b.dtype).startswith("float"):
                import numpy as np

                av, bv = a.astype(float).values, b.astype(float).values
                nan_ok = (pd.isna(av) == pd.isna(bv)).all()
                eq = nan_ok and ((av == bv) | (pd.isna(av) & pd.isna(bv))).all()
                if not eq:
                    mx = float(pd.Series(abs(av - bv)).max())
                    problems.append(f"{c}: max|Δ|={mx:.3e}")
            else:
                if not a.reset_index(drop=True).equals(b.reset_index(drop=True)):
                    neq = (a.astype(str).values != b.astype(str).values)
                    problems.append(f"{c}: {neq.sum()} diffs, e.g. "
                                    f"{a.values[neq][:2]} vs {b.values[neq][:2]}")
        except Exception as exc:  # noqa: BLE001
            problems.append(f"{c}: compare error {exc}")
    return (not problems), "; ".join(problems)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from tidb_cdc_spark import get_spark
    from tidb_cdc_spark.queries import ORACLE, QUERIES

    spark = get_spark("oracle_harness")
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_con(sf_dir)

    failures = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {exc}")
            failures += 1
            continue
        if name not in ORACLE:
            n = sdf.count()
            print(f"ROWS  {name}: {n} rows (no oracle)")
            continue
        try:
            opdf = con.sql(ORACLE[name]).df()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: oracle error: {exc}")
            failures += 1
            continue
        ok, msg = compare(name, sdf, opdf)
        if ok:
            print(f"OK    {name} ({opdf.shape[0]} rows)")
        else:
            print(f"FAIL  {name}: {msg}")
            failures += 1
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
