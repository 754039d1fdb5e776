"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() twin on DuckDB over the same parquet tables,
compare row count + column names + order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(rows, cols):
    out = []
    for row in rows:
        vals = []
        for c in cols:
            v = row[c]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "nan"
                else:
                    v = f"{v:.9g}"
            elif hasattr(v, "isoformat"):
                v = v.isoformat().replace("+00:00", "")
            elif isinstance(v, (bytes, bytearray)):
                v = v.hex()
            vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .appName("oracle_check")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    fails = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = [r.asDict() for r in sdf.collect()]
            scols = sorted(sdf.columns)
        except Exception as e:
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            fails.append(name)
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (no oracle)")
            continue
        try:
            ddf = con.sql(oracles[name])
            dcols = sorted(ddf.columns)
            drows = [dict(zip(ddf.columns, row)) for row in ddf.fetchall()]
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {str(e)[:300]}")
            fails.append(name)
            continue
        if scols != dcols:
            print(f"FAIL  {name}: columns {scols} vs {dcols}")
            fails.append(name)
            continue
        if len(srows) != len(drows):
            print(f"FAIL  {name}: rowcount {len(srows)} vs {len(drows)}")
            fails.append(name)
            continue
        a = normalize(srows, scols)
        b = normalize(drows, scols)
        if a != b:
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            print(f"FAIL  {name}: value mismatch, e.g. {diff}")
            fails.append(name)
            continue
        print(f"OK    {name}: {len(srows)} rows")
    print()
    if fails:
        print("FAILED:", ", ".join(fails))
        sys.exit(1)
    print("all oracle checks passed")


if __name__ == "__main__":
    main()
