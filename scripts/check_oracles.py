"""Emulate the driver's correctness gate: run every queries() entry on
Spark and its oracle_sql() on DuckDB at sf0.01; compare row count, column
names, and an order-insensitive value hash. Usage:

    python scripts/check_oracles.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        if v != v:
            return "nan"
        return f"{v:.6f}".rstrip("0").rstrip(".") or "0"
    return str(v)


def value_hash(rows, cols):
    lines = sorted("|".join(norm_cell(v) for v in row) for row in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    ok = fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {str(e)[:300]}")
            fail += 1
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(rows)} rows ({time.time()-t0:.1f}s)")
            ok += 1
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            fail += 1
            continue
        problems = []
        if len(rows) != len(orows):
            problems.append(f"rowcount spark={len(rows)} oracle={len(orows)}")
        if [c.lower() for c in cols] != [c.lower() for c in ocols]:
            problems.append(f"schema spark={cols} oracle={ocols}")
        hs, ho = value_hash(rows, cols), value_hash(orows, ocols)
        if hs != ho:
            problems.append(f"valuehash spark={hs} oracle={ho}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            ss = set("|".join(norm_cell(v) for v in r) for r in rows)
            so = set("|".join(norm_cell(v) for v in r) for r in orows)
            d1, d2 = list(ss - so)[:3], list(so - ss)[:3]
            if d1:
                print(f"   only-spark: {d1}")
            if d2:
                print(f"   only-oracle: {d2}")
            fail += 1
        else:
            print(f"OK   {name}: {len(rows)} rows, hash {hs} ({time.time()-t0:.1f}s)")
            ok += 1
    print(f"\n{ok} ok, {fail} fail")
    spark.stop()
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main())
