"""Adversarial replica of the EXTERNAL correctness harness: a BARE
SparkSession (none of session.py's configs) under a non-UTC process
timezone, every registered query compared to its DuckDB oracle.

Round 1 failed 15/50 driver checks because load_table assumed a
builder-applied config (nanosAsLong); this gate exists so any new
session-default dependency fails HERE, not in the external harness.

Usage: TZ=America/Chicago python tools/driver_sim.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    # distinguish -0.0 from 0.0 like the driver's repr-level value hash
    if isinstance(v, float) and v == 0.0 and math.copysign(1.0, v) < 0:
        return "-0.0"
    return v


def multiset(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out: dict = {}
    for row in rows:
        key = tuple(norm(row[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


def main() -> int:
    from pyspark.sql import SparkSession

    # deliberately NOT get_spark(): no nanosAsLong, no UTC pin, no AQE
    # tuning — whatever the engine needs it must set itself at read time
    spark = SparkSession.builder.master("local[8]").appName("driver-sim").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from mongo_analyser_spark.queries import ORACLE_GENERATORS, ORACLES, QUERIES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    failures = []
    for name, fn in QUERIES.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            if name not in ORACLES:  # rows-only sketch queries
                status = "OK" if srows else "FAIL"
                print(f"  {name}: {status} rows={len(srows)} (rows-only) [{time.time()-t0:.1f}s]")
                if not srows:
                    failures.append(name)
                continue
            osql = (ORACLE_GENERATORS[name](SF_DIR)
                    if name in ORACLE_GENERATORS else ORACLES[name])
            ores = con.execute(osql)
            ocols = [d[0] for d in ores.description]
            orows = [tuple(r) for r in ores.fetchall()]
            ok = (
                sorted(scols) == sorted(ocols)
                and len(srows) == len(orows)
                and multiset(srows, scols) == multiset(orows, ocols)
            )
            if not ok:
                failures.append(name)
                print(f"  {name}: FAIL rows={len(srows)}/{len(orows)}")
            else:
                print(f"  {name}: OK rows={len(srows)} [{time.time()-t0:.1f}s]")
        except Exception as e:
            failures.append(name)
            print(f"  {name}: ERR {str(e).splitlines()[0][:140]}")
    checked = len(ONLY) if ONLY else len(QUERIES)
    print(f"\n{checked - len(failures)}/{checked} OK under bare session (TZ={os.environ.get('TZ', 'system')})")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
