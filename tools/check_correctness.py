"""Local replica of the driver's correctness gate.

Runs each ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet tables, then
compares row count, sorted column names, and an order-insensitive
canonical value listing.  Exits nonzero on any mismatch.

Deliberately emulates the driver harness:

* the SparkSession is a PLAIN builder session — no kgnorm executor
  PYTHONPATH — so queries must ship their own code (the r01 failure mode);
* both result sets go through pandas (Spark ``toPandas``, DuckDB ``df()``)
  and values are canonicalized type-sensitively, so a DuckDB HUGEINT that
  pandas renders as float64 mismatches a Spark BIGINT (the r01
  ``token_stats`` hash-fail mechanism).

Also emits per-query wall-time telemetry (spark seconds, oracle
seconds) to ``TIMINGS.json`` at the repo root (override with
``KGNORM_TIMINGS_OUT``; set it empty to skip) so the driver's
~50-query/round sweep cap can be diagnosed and the registry order
tuned empirically (r3 verdict item #9).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "src"))

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon_val(v):
    if v is None:
        return "\0NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "\0NULL"
        return "f:" + repr(v)
    if isinstance(v, bool):
        return "b:" + ("true" if v else "false")
    if isinstance(v, int):
        return "i:" + str(v)
    if isinstance(v, bytes):
        return "x:" + v.hex()
    return "s:" + str(v)


def _pandas_rows(df):
    import numpy as np
    import pandas as pd

    rows = []
    for tup in df.itertuples(index=False, name=None):
        row = []
        for v in tup:
            if v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NaT:
                row.append(None)
            elif isinstance(v, np.integer):
                row.append(int(v))
            elif isinstance(v, np.floating):
                row.append(float(v))
            elif isinstance(v, np.bool_):
                row.append(bool(v))
            else:
                row.append(v)
        rows.append(row)
    return rows


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = ["\x01".join(canon_val(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def main() -> None:
    import __spark_entry__ as entrymod
    from pyspark.sql import SparkSession

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    # plain session, like the driver harness: no kgnorm on executor path
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("check-correctness")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    timings: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
        except Exception as e:
            print(f"{name}: SPARK ERROR {type(e).__name__}: {str(e)[:500]}")
            failures += 1
            timings[name] = {"spark_sec": round(time.monotonic() - t0, 3),
                             "oracle_sec": None, "err": type(e).__name__}
            continue
        timings[name] = {"spark_sec": round(time.monotonic() - t0, 3),
                         "oracle_sec": None, "err": None}
        scols = list(spdf.columns)
        if name not in oracles:
            print(f"{name}: rows-only check — {len(spdf)} rows")
            continue
        t1 = time.monotonic()
        try:
            opdf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"{name}: ORACLE ERROR {e}")
            failures += 1
            timings[name]["err"] = "oracle"
            continue
        finally:
            timings[name]["oracle_sec"] = round(time.monotonic() - t1, 3)
        ocols = list(opdf.columns)
        ok = True
        if sorted(scols) != sorted(ocols):
            print(f"{name}: SCHEMA MISMATCH spark={sorted(scols)} oracle={sorted(ocols)}")
            ok = False
        if len(spdf) != len(opdf):
            print(f"{name}: ROWCOUNT MISMATCH spark={len(spdf)} oracle={len(opdf)}")
            ok = False
        if ok:
            sc = canon_rows(scols, _pandas_rows(spdf))
            oc = canon_rows(ocols, _pandas_rows(opdf))
            if sc != oc:
                oset, sset = set(oc), set(sc)
                diff_s = [x for x in sc if x not in oset][:3]
                diff_o = [x for x in oc if x not in sset][:3]
                print(f"{name}: VALUE MISMATCH\n  spark-only: {diff_s}\n  oracle-only: {diff_o}")
                ok = False
        if ok:
            print(f"{name}: OK ({len(spdf)} rows)")
        else:
            failures += 1
    spark.stop()
    print(f"SUMMARY: {len(timings) - failures}/{len(timings)} green, {failures} failures")
    out = os.environ.get("KGNORM_TIMINGS_OUT", os.path.join(REPO, "TIMINGS.json"))
    if out and timings:
        with open(out, "w") as fh:
            json.dump({"sf_dir": sf_dir, "queries": timings,
                       "total_sec": round(sum(t["spark_sec"] + (t["oracle_sec"] or 0)
                                              for t in timings.values()), 3)},
                      fh, indent=1, sort_keys=True)
        print(f"timings -> {out}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
