#!/usr/bin/env python
"""Dump .explain('formatted') for named registered queries to
plans/r06/<query>_<tag>.txt (round-6 optimization evidence).

Usage: python scripts/explain_dump.py <tag> <query> [<query> ...]
Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF_DIR = os.environ["SPARK_GRAFT_SF_DIR"]
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> int:
    tag = sys.argv[1]
    names = sys.argv[2:]
    from seo_crawler_spark.session import get_spark

    spark = get_spark(
        "explain-dump", master=f"local[{CPUS}]", shuffle_partitions=int(CPUS)
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r06",
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = qs[name](spark, SF_DIR)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        n_ex = txt.count("Exchange")
        print(f"{name}: {len(txt)} chars, {n_ex} Exchange -> {path}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
