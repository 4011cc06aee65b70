"""Local replica of the driver's correctness gate: run every entry in
``__spark_entry__.queries()`` and its ``oracle_sql()`` side by side,
compare row count, column names, and order-insensitive values.

Usage:  python tests/oracle_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from phaser_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return round(float(v), 9)
    except ImportError:
        pass
    import datetime

    if isinstance(v, (datetime.datetime, datetime.date)):
        return str(v)
    return v


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm_cell(r[i]) for i in order))
    return sorted(cols), sorted(out, key=lambda t: tuple(str(x) for x in t))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    n_pass, n_fail, n_noracle = run(sf_dir, only)
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    return 1 if n_fail else 0


def run(sf_dir: str = "/root/testdata/sf0.001", only=()) -> tuple[int, int, int]:
    """Run the parity comparison; importable so pytest can gate subsets
    (the past-cap queries() entries are never hash-checked by the driver
    — tests/test_driver_contract.py keeps their parity mandatory here)."""
    only = set(only)
    spark = get_spark(app_name="oracle_parity")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_noracle = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"SKIP  {name}: no oracle (rows-only) — {len(srows)} rows "
                  f"[{time.time()-t0:.1f}s]")
            n_noracle += 1
            continue
        try:
            res = con.sql(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
            # Driver-harness realism: the driver compares pandas frames, so a
            # DuckDB HUGEINT (-> float64) vs Spark bigint (-> int64) mismatch
            # breaks its value hash even when fetchall() values are identical.
            # Compare numpy dtype *kinds* per column to catch that class here.
            odf = con.sql(oracles[name]).df()
            pdf = sdf.toPandas()
            kind_bad = []
            for c in ocols:
                if c not in pdf.columns:
                    continue
                ok, sk = odf[c].dtype.kind, pdf[c].dtype.kind
                norm = lambda k: "i" if k in "iu" else k
                if norm(ok) != norm(sk):
                    kind_bad.append((c, sk, ok))
            if kind_bad:
                print(f"FAIL  {name}: pandas dtype-kind mismatch "
                      f"(col, spark, oracle): {kind_bad}")
                n_fail += 1
                continue
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            n_fail += 1
            continue
        sc, sr = norm_rows(scols, srows)
        oc, orr = norm_rows(ocols, orows)
        if sc != oc:
            print(f"FAIL  {name}: columns differ spark={sc} oracle={oc}")
            n_fail += 1
            continue
        if len(sr) != len(orr):
            print(f"FAIL  {name}: row count spark={len(sr)} oracle={len(orr)}")
            n_fail += 1
            continue
        bad = [(a, b) for a, b in zip(sr, orr) if a != b]
        if bad:
            print(f"FAIL  {name}: {len(bad)}/{len(sr)} rows differ; first: "
                  f"spark={bad[0][0]} oracle={bad[0][1]}")
            n_fail += 1
            continue
        print(f"PASS  {name}: {len(sr)} rows [{time.time()-t0:.1f}s]")
        n_pass += 1
    return n_pass, n_fail, n_noracle


if __name__ == "__main__":
    raise SystemExit(main())
