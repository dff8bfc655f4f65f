#!/usr/bin/env python
"""Evidence for the IVF scale claim: an index written PARTITIONED BY
cell lets a query's probe set prune to n_probe/n_cells of the files.

Writes the sf0.1 embeddings index partitioned by coarse cell, then
reads it back with a probe-cell filter and reports (a) the partition
count actually scanned (from the plan's partition pruning) and (b) the
wall-time ratio vs a full scan. At 10^10 vectors with k ∝ √N cells the
same layout means a query touches ~n_probe/√N of the data files.

Usage: python scripts/demo_ivf_partition_pruning.py
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from seo_crawler_spark.operators.simsearch import (  # noqa: E402
    N_CELLS,
    N_PROBE,
    cell_assign_udf,
    pivot_centroids,
)
from seo_crawler_spark.session import get_spark  # noqa: E402
from seo_crawler_spark.sources.tables import load  # noqa: E402

SF = "/root/testdata/sf0.1"


def main() -> int:
    spark = get_spark("ivf-prune", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    emb = load(spark, "embeddings", SF)
    cents = pivot_centroids(emb, N_CELLS)
    assign1 = cell_assign_udf(cents, 1)

    out = tempfile.mkdtemp(prefix="ivf_index_")
    try:
        (
            emb.select(
                "vec_id",
                "embedding",
                assign1(F.col("embedding")).getItem(0).alias("cell"),
            )
            .repartition("cell")
            .write.partitionBy("cell")
            .mode("overwrite")
            .parquet(out)
        )
        idx = spark.read.parquet(out)
        probes = list(range(N_PROBE))  # any n_probe cells

        pruned = idx.filter(F.col("cell").isin(probes))
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        # FileSourceScanExec prints PartitionFilters once pruning applies
        marker = []
        for ln in plan.splitlines():
            if "PartitionFilters" in ln:
                i = ln.index("PartitionFilters")
                marker.append(ln[i : i + 90])

        def timed(df):
            t0 = time.monotonic()
            n = df.count()
            return n, time.monotonic() - t0

        # warm
        timed(idx)
        n_all, t_all = timed(idx)
        n_pr, t_pr = timed(pruned)
        print(f"index rows: {n_all} over {N_CELLS} cell partitions")
        print(f"probe scan: {n_pr} rows ({n_pr / n_all:.1%}) "
              f"in {t_pr:.3f}s vs full {t_all:.3f}s")
        print("plan pruning markers:")
        for ln in marker:
            print("  ", ln)
        ok = n_pr < n_all and any("cell" in ln for ln in marker)
        print("PRUNED" if ok else "NOT PRUNED")
        return 0 if ok else 1
    finally:
        shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
