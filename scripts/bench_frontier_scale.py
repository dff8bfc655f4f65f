#!/usr/bin/env python
"""Frontier-scheduling linearity: same pipeline, 10× the URLs.

The north rule's frontier is 10^10 URLs — far beyond what one box holds
— so the local evidence that the scheduling plan SCALES (as opposed to
merely being fast at one size) is throughput flatness as the frontier
grows: canonicalize → xxhash → seen anti-join → salted politeness rank
at 2M and at 20M URLs on the same local[32]. A plan with a hidden
super-linear term (driver collect, single-partition window, quadratic
join) shows up immediately as a throughput cliff at 10×.

Appends a '## Frontier scale linearity' section to BENCH/BASELINE.md
(preserved by scripts/bench_scaling.py's section-aware rewrite).
Run: python scripts/bench_frontier_scale.py  (env: FRONTIER_SIZES)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

SIZES = [
    int(s) for s in os.environ.get("FRONTIER_SIZES", "2000000,20000000").split(",")
]


def run_at(spark, n: int) -> dict:
    # the pipeline under test IS bench.sched_pipeline — shared code, so
    # the linearity evidence and the headline frontier number can never
    # silently measure different plans
    import bench

    raw = bench.synth_raw_frontier(spark, n).localCheckpoint(eager=True)
    seen = bench.build_seen(raw)

    best = float("inf")
    counts0 = None
    for _ in range(3):
        dt, counts = bench.sched_pipeline(raw, seen)
        if counts0 is None:
            counts0 = counts
        assert counts == counts0  # determinism across repeats
        best = min(best, dt)
    raw.unpersist()
    seen.unpersist()
    return {
        "n": n,
        "sec": round(best, 3),
        "urls_per_sec": round(n / best),
        "admitted": counts0.get(True, 0),
        "deferred": counts0.get(False, 0),
    }


def main() -> int:
    from seo_crawler_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "frontier-scale", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")

    results = [run_at(spark, n) for n in SIZES]
    spark.stop()

    base = results[0]
    rows = "\n".join(
        f"| {r['n']:,} | {r['sec']} | {r['urls_per_sec']:,} | "
        f"{r['urls_per_sec'] / base['urls_per_sec']:.2f}× |"
        for r in results
    )
    ratio = results[-1]["urls_per_sec"] / base["urls_per_sec"]
    md = f"""
## Frontier scale linearity ({base['n'] // 1_000_000}M vs {results[-1]['n'] // 1_000_000}M URLs)

Same scheduling pipeline (canonicalize → xxhash → exact seen anti-join
→ salted politeness rank, best-of-3, local[{os.environ.get("SPARK_GRAFT_CPUS", "32")}]),
frontier grown 10×; flat throughput = no hidden super-linear term
(driver collects, single-partition windows, quadratic joins would all
cliff here):

| frontier URLs | sec | URLs/sec | throughput vs 2M |
|---|---|---|---|
{rows}

Throughput retention at 10× input: **{ratio:.2f}×** of the 2M-URL rate.
Admitted/deferred counts identical across repeats (determinism).
"""
    out_path = "/root/repo/BENCH/BASELINE.md"
    old = open(out_path).read() if os.path.exists(out_path) else ""
    marker = "## Frontier scale linearity"
    if marker in old:
        head, rest = old.split(marker, 1)
        tail_idx = rest.find("\n## ")
        tail = rest[tail_idx + 1:] if tail_idx != -1 else ""
        old = head + tail
    with open(out_path, "w") as f:
        f.write(old.rstrip() + "\n" + md)
    import json

    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
