"""Local stand-in for the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at sf0.01, compare
row-count, column names, and (order-insensitively) values.

Usage: python tools/check_oracles.py [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def duck_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object and len(df) and isinstance(df[c].iloc[0], (list, np.ndarray)):
            df[c] = df[c].map(lambda v: tuple(np.asarray(v).tolist()))
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(sdf.columns) != sorted(odf.columns):
        problems.append(f"columns differ: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        return problems
    if len(sdf) != len(odf):
        problems.append(f"row count differs: spark={len(sdf)} oracle={len(odf)}")
    a, b = canon(sdf), canon(odf)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c], b[c]
            # Driver hashes raw value representations: a dtype mismatch
            # (e.g. DuckDB HUGEINT/DECIMAL -> float64/object vs Spark
            # int64/float64) hash-fails even when values coerce equal.
            # Exception: datetime64 unit differences (ns vs us) are
            # normalized by the driver (lineitem/events were hash-green
            # in round 1 with exactly this mismatch).
            if av.dtype != bv.dtype and not (av.dtype.kind == "M" and bv.dtype.kind == "M"):
                problems.append(
                    f"dtype col {c}: spark={av.dtype} oracle={bv.dtype} (driver hash-fails on this)"
                )
            if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
                aa = av.to_numpy(dtype=np.float64)
                bb = bv.to_numpy(dtype=np.float64)
                both_nan = np.isnan(aa) & np.isnan(bb)
                diff = np.abs(aa - bb)
                diff[both_nan] = 0
                mx = float(np.nanmax(diff)) if len(diff) else 0.0
                if mx > 0:
                    problems.append(f"float col {c}: max abs diff {mx:.3e}" + (" EXACT-FAIL" if mx > 0 else ""))
            else:
                eq = (av.astype(str).to_numpy() == bv.astype(str).to_numpy())
                if not eq.all():
                    i = int(np.flatnonzero(~eq)[0])
                    problems.append(f"col {c} differs at sorted-row {i}: spark={av.iloc[i]!r} oracle={bv.iloc[i]!r}")
    return problems


def main():
    import __spark_entry__ as entrymod
    from wills_columnar_format_spark.session import get_spark

    only = set(sys.argv[1:])
    spark = get_spark(app="check-oracles", cores=8, shuffle_partitions=8, driver_memory="16g")
    con = duck_con()
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {str(e).splitlines()[0][:200]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"okNO {name}: rows={len(sdf)} (no oracle, rows-only) [{time.time()-t0:.1f}s]")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e).splitlines()[0][:200]}")
            n_fail += 1
            continue
        problems = compare(name, sdf, odf)
        if problems:
            n_fail += 1
            print(f"FAIL {name}: rows spark={len(sdf)} oracle={len(odf)} [{time.time()-t0:.1f}s]")
            for p in problems[:5]:
                print(f"     - {p}")
        else:
            print(f"ok   {name}: rows={len(sdf)} match [{time.time()-t0:.1f}s]")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
