#!/usr/bin/env python
"""Scale evidence for streaming incremental dedup (dedup_stream.py).

Three claims, measured:

1. Per-batch cost as the standing state GROWS (12 batches of 5k docs
   against a base starting at 60k docs that absorbs every batch,
   compact_every=4): per-batch wall seconds stay ~flat. The input has
   CONSTANT dup density (5% dup-of-base, 15% dup-of-id-neighborhood,
   80% novel) so per-batch semantic work is constant by construction —
   any growth would be state-scan overhead, the thing the bucket
   pruning + compaction are there to remove.

2. Trickle batches (200 docs) against the full grown state: the shape
   a continuously-running dedup sees. Near-constant small cost.

3. Bucket pruning pays at production shape: with N_SIG_BUCKETS=512 and
   a 20-doc probe, the touched-bucket isin filter cuts the band-join
   wall time vs an unpruned scan of the same state.

Prints one JSON line + markdown rows for BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

BASE_N = 60_000
BATCH_N = 5_000
N_BATCHES = 12
COMPACT_EVERY = 4
WORK = "/tmp/bench_stream_dedup"

# --long: 50 batches of 2k docs (state grows 60k -> 160k, 12 compaction
# cycles) — the flatness claim at 4x the batch depth, plus skipping the
# pruning A/B (unchanged). Overrides via argv.
if "--long" in sys.argv:
    BATCH_N, N_BATCHES = 2_000, 50


def synth_docs(spark, lo: int, hi: int):
    """Deterministic docs [lo, hi) with CONSTANT dup density: by id%20,
    one slot (5%) duplicates a base doc (key = xxhash(id) % BASE_N —
    base docs are key=id there), three slots (15%) share a key with
    their 5-id neighborhood, the rest are novel (key=id). ~60-token
    text is a pure function of the key."""
    from pyspark.sql import functions as F

    slot = F.col("id") % 20
    key = (
        F.when(slot == 0, F.pmod(F.xxhash64(F.col("id")), F.lit(BASE_N)))
        .when(slot <= 3, F.col("id") - (F.col("id") % 5))
        .otherwise(F.col("id"))
    )
    word = lambda j: F.concat(
        F.lit("w"),
        F.xxhash64(
            F.concat(key.cast("string"), F.lit(":"), j.cast("string"))
        ).cast("string"),
    )
    text = F.concat_ws(" ", F.transform(F.sequence(F.lit(1), F.lit(60)), word))
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"), text.alias("text")
    )


def main() -> int:
    from pyspark.sql import functions as F

    from seo_crawler_spark.session import get_spark
    from seo_crawler_spark.streaming import dedup_stream as DS

    spark = get_spark(
        "stream_dedup_scale", master="local[32]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(WORK, ignore_errors=True)
    state = f"{WORK}/state"

    # --- 1. per-batch cost vs growing state, constant dup density -------
    DS.prepare_dedup_base(synth_docs(spark, 0, BASE_N), state)
    process = DS._process_batch(spark, state, 0.5, COMPACT_EVERY)
    rows = []
    for b in range(N_BATCHES):
        lo = BASE_N + b * BATCH_N
        batch = synth_docs(spark, lo, lo + BATCH_N)
        t0 = time.monotonic()
        process(batch, b)
        sec = round(time.monotonic() - t0, 2)
        rows.append({"batch": b, "state_docs": lo, "sec": sec})
    # --- 2. trickle batches (200 docs) against the now-2x state ---------
    trickle = []
    for b in range(N_BATCHES, N_BATCHES + 5):
        lo = BASE_N + N_BATCHES * BATCH_N + (b - N_BATCHES) * 200
        t0 = time.monotonic()
        process(synth_docs(spark, lo, lo + 200), b)
        trickle.append(
            {
                "batch": b,
                "state_docs": lo,
                "sec": round(time.monotonic() - t0, 2),
            }
        )
    kept = spark.read.parquet(f"{state}/verdicts").filter("is_kept").count()
    total = spark.read.parquet(f"{state}/verdicts").count()
    import subprocess

    n_files = int(
        subprocess.run(
            ["sh", "-c", f"find {state} -name '*.parquet' | wc -l"],
            capture_output=True,
            text=True,
        ).stdout
    )

    if "--long" in sys.argv:
        out = {
            "per_batch": rows,
            "trickle": trickle,
            "verdicts": total,
            "kept": kept,
            "state_parquet_files": n_files,
            "compact_every": COMPACT_EVERY,
        }
        print(json.dumps(out))
        q = lambda i: rows[i]["sec"]
        early = sorted(q(i) for i in range(2, 10))
        late = sorted(q(i) for i in range(N_BATCHES - 8, N_BATCHES))
        med = lambda xs: xs[len(xs) // 2]
        print(
            f"\nlong-run: {N_BATCHES} batches x {BATCH_N}, early median "
            f"{med(early)}s vs late median {med(late)}s, files {n_files}"
        )
        spark.stop()
        return 0

    # --- 3. pruning A/B at production bucket count ----------------------
    from seo_crawler_spark.operators.dedup import _hashed_shingles, _minhash_bands

    old = DS.N_SIG_BUCKETS
    DS.N_SIG_BUCKETS = 512
    state2 = f"{WORK}/state512"
    DS.prepare_dedup_base(synth_docs(spark, 0, 200_000), state2)
    probe = synth_docs(spark, 500_000, 500_020)  # 20-doc trickle batch
    hashed = _hashed_shingles(probe).localCheckpoint(eager=True)
    bands = DS._with_sig_bucket(_minhash_bands(hashed), 512).localCheckpoint(
        eager=True
    )
    touched = [
        r["sig_bucket"] for r in bands.select("sig_bucket").distinct().collect()
    ]
    da = bands.select(F.col("doc_id").alias("a"), "sig_bucket", "band", "sig")

    def join_count(state_df) -> float:
        j = da.join(
            state_df.select(
                F.col("doc_id").alias("b"), "sig_bucket", "band", "sig"
            ),
            ["sig_bucket", "band", "sig"],
        )
        t0 = time.monotonic()
        j.count()
        return time.monotonic() - t0

    full = DS._read_state(spark, state2, "bands", 0)
    pruned = full.filter(F.col("sig_bucket").isin(touched))
    join_count(pruned), join_count(full)  # warm both paths
    t_pruned = round(min(join_count(pruned) for _ in range(3)), 3)
    t_full = round(min(join_count(full) for _ in range(3)), 3)
    DS.N_SIG_BUCKETS = old

    out = {
        "per_batch": rows,
        "trickle": trickle,
        "verdicts": total,
        "kept": kept,
        "state_parquet_files": n_files,
        "compact_every": COMPACT_EVERY,
        "prune_ab": {
            "state_docs": 200_000,
            "probe_docs": 20,
            "touched_buckets": len(touched),
            "total_buckets": 512,
            "sec_pruned": t_pruned,
            "sec_full": t_full,
        },
    }
    print(json.dumps(out))
    print("\n| batch | state docs | sec |")
    print("|---|---|---|")
    for r in rows:
        print(f"| {r['batch']} | {r['state_docs']:,} | {r['sec']} |")
    print("\n| trickle batch | state docs | sec |")
    print("|---|---|---|")
    for r in trickle:
        print(f"| {r['batch']} | {r['state_docs']:,} | {r['sec']} |")
    print(
        f"\npruning A/B: 20-doc probe vs 200k-doc state, 512 buckets, "
        f"{len(touched)} touched → pruned {t_pruned}s vs full {t_full}s; "
        f"state files after run: {n_files}"
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
