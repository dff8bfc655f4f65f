#!/usr/bin/env python
"""Scale evidence for hyperball_centrality's per-iteration claim.

The operator's contract: per hop exactly two bounded exchanges — one
edge⋈state equi-join (≤ 64 register rows shipped per edge) and one
map-side-combined groupBy(node, register).max — with state pinned at
≤ 64 rows/node REGARDLESS of ball size. So per-iteration wall time
should track |E| ~linearly while an exact per-node BFS would carry
O(reachable-set) state per node (quadratic blowup on a dense-core web
graph).

Measured on the same generator-graph shape the registered operator
uses (3 out-edges/node: quadratic, mod-37 hub, affine) at 100k and 1M
nodes, T=4 hops, local[32]. Reports per-run wall seconds, final state
rows (must equal the distinct (node, register) support, ≤ 64·V), and
the sec ratio at 10× nodes.

Prints one JSON line + a markdown row block for BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

SIZES = [100_000, 1_000_000]
ITERS = 4


def run_hyperball(spark, n: int) -> dict:
    from pyspark.sql import functions as F

    from seo_crawler_spark.operators.sketches import HLL_M, _rho_sql

    docs = spark.range(n).select(F.col("id").alias("doc_id"))
    parts = [
        docs.select(
            F.col("doc_id").alias("src"),
            F.expr(f"(doc_id * doc_id + 1) % {n}").alias("dst"),
        ),
        docs.select(
            F.col("doc_id").alias("src"), F.expr("doc_id % 37").alias("dst")
        ),
        docs.select(
            F.col("doc_id").alias("src"),
            F.expr(f"(doc_id * 13 + 3) % {n}").alias("dst"),
        ),
    ]
    e = parts[0]
    for p in parts[1:]:
        e = e.unionByName(p)
    e = e.filter(F.col("src") != F.col("dst")).localCheckpoint(eager=True)
    n_edges = e.count()

    hsql = (
        "cast(conv(substr(md5(cast(doc_id as string)), 1, 15), 16, 10)"
        " as bigint)"
    )
    st = docs.select(
        "doc_id",
        F.expr(f"({hsql}) % {HLL_M}").alias("j"),
        F.expr(_rho_sql(f"(({hsql}) div {HLL_M})")).alias("m"),
    ).localCheckpoint(eager=True)

    t0 = time.monotonic()
    per_iter = []
    for _ in range(ITERS):
        ti = time.monotonic()
        gathered = e.join(st, e.src == st.doc_id).select(
            F.col("dst").alias("doc_id"), "j", "m"
        )
        st = (
            st.unionByName(gathered)
            .groupBy("doc_id", "j")
            .agg(F.max("m").alias("m"))
            .localCheckpoint(eager=True)
        )
        per_iter.append(round(time.monotonic() - ti, 2))
    total = time.monotonic() - t0
    state_rows = st.count()
    assert state_rows <= 64 * n
    return {
        "nodes": n,
        "edges": n_edges,
        "iters": ITERS,
        "sec": round(total, 2),
        "sec_per_iter": per_iter,
        "state_rows": state_rows,
        "state_rows_per_node": round(state_rows / n, 2),
    }


def main() -> int:
    from seo_crawler_spark.session import get_spark

    spark = get_spark(
        "hyperball-scale", master="local[32]", shuffle_partitions=64
    )
    spark.sparkContext.setLogLevel("ERROR")
    rows = [run_hyperball(spark, n) for n in SIZES]
    print(json.dumps({"bench": "hyperball_scale", "rows": rows}))
    print()
    print("| nodes | edges | 4-hop sec | state rows | rows/node |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['nodes']:,} | {r['edges']:,} | {r['sec']} "
            f"| {r['state_rows']:,} | {r['state_rows_per_node']} |"
        )
    if len(rows) == 2:
        print(
            f"\n10x nodes -> {rows[1]['sec'] / rows[0]['sec']:.1f}x time, "
            f"state stays {rows[1]['state_rows_per_node']} rows/node"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
