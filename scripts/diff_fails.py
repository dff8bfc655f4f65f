#!/usr/bin/env python
"""Focused diff of the round-1 hash-fail queries: print the first
mismatching normalized rows (and value types) side by side."""

from __future__ import annotations

import importlib.util
import math
import sys

sys.path.insert(0, "/root/repo")

import duckdb

SF = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)
FAILS = sys.argv[1:] or [
    "multi_filter_counts",
    "ann_lsh_buckets",
    "fingerprints",
    "events_sessionize",
    "events_user_rates",
]


def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else f"{v:.6g}"
    return str(v)


def main() -> int:
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("diff-fails")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF}/{t}.parquet')"
        )

    qs, oracles = m.queries(), m.oracle_sql()
    rc = 0
    for name in FAILS:
        sdf = qs[name](spark, SF)
        scols = [c.lower() for c in sdf.columns]
        srows = [tuple(r) for r in sdf.collect()]
        res = con.execute(oracles[name])
        dcols = [d[0].lower() for d in res.description]
        drows = res.fetchall()
        so = sorted(range(len(scols)), key=lambda i: scols[i])
        do = sorted(range(len(dcols)), key=lambda i: dcols[i])
        sset = sorted("|".join(norm(r[i]) for i in so) for r in srows)
        dset = sorted("|".join(norm(r[i]) for i in do) for r in drows)
        diffs = [(a, b) for a, b in zip(sset, dset) if a != b]
        print(f"\n=== {name}: {len(diffs)} differing rows of {len(sset)}")
        for a, b in diffs[:5]:
            print(f"  spark: {a}")
            print(f"  duck : {b}")
        if srows and drows:
            print("  spark types:", [type(v).__name__ for v in srows[0]])
            print("  duck  types:", [type(v).__name__ for v in drows[0]])
        rc |= bool(diffs)
    spark.stop()
    return rc


if __name__ == "__main__":
    sys.exit(main())
