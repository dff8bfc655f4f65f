"""Shard-assignment balance audit — the placement decision every
distributed index/store makes, measured instead of assumed.

A 1000-executor deployment must route documents to shards. The two
textbook policies trade off against each other:

* ``doc_hash`` — hash every doc_id independently. Near-perfect load
  balance, but a host's pages scatter across ALL shards, so any
  host-local operator (politeness accounting, per-site boilerplate df,
  mirror detection, robots state) becomes an all-shard shuffle.
* ``host`` — hash the host. Host-local operators run shard-local
  (zero shuffle), but shard load is a balls-into-bins draw over hosts
  whose sizes vary — with few-or-skewed hosts the max shard runs hot
  (the mega-host problem this repo's politeness salting already
  handles on the frontier side).
* ``host_salted`` — hash (host, salt) with salt = doc-hash mod
  SHARD_SALT: each host spreads over at most SHARD_SALT shards.
  The standard middle ground: bounded locality loss (a host-local op
  becomes a ≤SHARD_SALT-way partial merge, not an all-shard one)
  while the max-shard load drops toward the doc_hash floor.

The audit emits, per (strategy, shard): doc count, byte load, distinct
hosts placed there, and per-mille load factors (1000 = perfectly
balanced), so the balance-vs-locality tradeoff is a readable 3×K
table. On the shipped 20-host corpus the host strategy's hottest
shard carries ~2× the balanced load while doc_hash stays within a few
percent — and host_salted recovers most of the gap while touching ≤
SHARD_SALT shards per host (all three pinned in tests).

Determinism: shard keys are md5int (functions/text.py) — identical in
Spark and DuckDB; load factors are exact integer per-mille `div`s
against window totals computed over the ALREADY-AGGREGATED 3·K-row
frame (no driver round-trip, no scalar collect).

Plan shape: row-local key construction + ONE map-side-combined
aggregate over (strategy, shard) after a bounded 3× explode; the
per-mille windows run on 3·K rows. At 10^10 docs this is exactly one
shuffle of partial aggregates — the audit costs less than any single
mis-sharded query it prevents.

Reference parity: the reference is single-node SQLite and never
shards (database.py); this is the scale-out placement layer SURVEY §7
scopes for the Spark build.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import MD5INT_SQL, md5int
from ..sources.tables import load

N_SHARDS = 8
SHARD_SALT = 4  # max shards a single host may spread over


def shard_balance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir).select(
        "doc_id", "source", "n_chars"
    )
    dochash = md5int(F.concat(F.lit("shard:"), F.col("doc_id").cast("string")))
    salt = F.pmod(dochash, F.lit(SHARD_SALT))
    keyed = docs.select(
        "n_chars",
        "source",
        F.pmod(dochash, F.lit(N_SHARDS)).alias("doc_hash"),
        F.pmod(md5int(F.concat(F.lit("shard:"), F.col("source"))), F.lit(N_SHARDS)).alias(
            "host"
        ),
        F.pmod(
            md5int(
                F.concat(
                    F.lit("shard:"),
                    F.col("source"),
                    F.lit(":"),
                    salt.cast("string"),
                )
            ),
            F.lit(N_SHARDS),
        ).alias("host_salted"),
    )
    strat = keyed.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("strategy"), F.col(s).alias("shard")
                    )
                    for s in ("doc_hash", "host", "host_salted")
                ]
            )
        ).alias("sx"),
        "n_chars",
        "source",
    ).select("sx.strategy", "sx.shard", "n_chars", "source")
    g = strat.groupBy("strategy", "shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("n_bytes"),
        F.countDistinct("source").alias("n_hosts"),
    )
    return (
        g.withColumn(
            "load_pm",
            F.expr(f"(n_docs * {N_SHARDS} * 1000) div sum(n_docs) over (partition by strategy)"),
        )
        .withColumn(
            "bytes_pm",
            F.expr(f"(n_bytes * {N_SHARDS} * 1000) div sum(n_bytes) over (partition by strategy)"),
        )
        .select(
            "strategy", "shard", "n_docs", "n_bytes", "n_hosts",
            "load_pm", "bytes_pm",
        )
        .orderBy("strategy", "shard")
    )


def shard_balance_sql() -> str:
    h_doc = MD5INT_SQL.format(c="'shard:' || CAST(doc_id AS VARCHAR)")
    h_host = MD5INT_SQL.format(c="'shard:' || source")
    h_salted = MD5INT_SQL.format(
        c=f"'shard:' || source || ':' || CAST({h_doc} % {SHARD_SALT} AS VARCHAR)"
    )
    return f"""
WITH keyed AS (
  SELECT n_chars, source,
         {h_doc} % {N_SHARDS} AS doc_hash,
         {h_host} % {N_SHARDS} AS host,
         {h_salted} % {N_SHARDS} AS host_salted
  FROM documents
),
strat AS (
  SELECT 'doc_hash' AS strategy, doc_hash AS shard, n_chars, source FROM keyed
  UNION ALL
  SELECT 'host', host, n_chars, source FROM keyed
  UNION ALL
  SELECT 'host_salted', host_salted, n_chars, source FROM keyed
),
g AS (
  SELECT strategy, shard,
         count(*) AS n_docs,
         sum(n_chars)::BIGINT AS n_bytes,
         count(DISTINCT source) AS n_hosts
  FROM strat GROUP BY strategy, shard
)
SELECT strategy, shard, n_docs, n_bytes, n_hosts,
       ((n_docs * {N_SHARDS} * 1000) // sum(n_docs) OVER (PARTITION BY strategy))::BIGINT AS load_pm,
       ((n_bytes * {N_SHARDS} * 1000) // sum(n_bytes) OVER (PARTITION BY strategy))::BIGINT AS bytes_pm
FROM g ORDER BY strategy, shard
"""


# ---------------------------------------------------------------------------
# Resize-rebalance audit — consistent-hash ring vs mod rehash
# ---------------------------------------------------------------------------
RB_N = 8              # baseline cluster size (the north rule's N)
RB_VNODES = 16        # virtual nodes per shard on the ring
RB_SPACE = 1 << 60    # ring position space (md5int's 15-hex range)
# audited transitions: +1 executor (the elasticity case consistent
# hashing exists for) and N -> 4N (the north rule's scaling pair)
RB_TRANSITIONS = ((RB_N, RB_N + 1), (RB_N, 4 * RB_N))


def shard_rebalance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(policy, transition, n_docs, n_moved, moved_pm): how much data a
    cluster RESIZE forces each placement policy to move — the second
    half of the placement story: :func:`shard_balance_audit` measures
    steady-state balance, this measures the cost of CHANGING size.

    * ``mod`` — shard = hash % n. Resizing n -> n' strands every key
      whose residue changes: ~n/(n+1) of the corpus for +1 (a near-full
      reshuffle to add ONE executor), ~3/4 for 8 -> 32.
    * ``ring`` — consistent hashing (Karger et al., STOC 1997) with
      RB_VNODES md5-derived virtual nodes per shard: a key belongs to
      the shard owning the first ring point clockwise of its position.
      Adding shards moves ONLY keys whose arc a new point splits:
      ~1/(n+1) for +1. For 8 -> 32 the expected move is the same ~3/4
      as mod (new shards own 3/4 of the ring) — measured here rather
      than assumed: the ring's advantage is ELASTICITY, not bulk
      growth, and the audit shows exactly that split.

    Plan shape at 10^10 keys: key positions are row-local md5
    arithmetic; ring ownership is one BROADCAST join against the
    (n'·RB_VNODES)-row ring dimension + a map-side min_by — the
    standard argmin-over-dim pattern (a production ring would binary-
    search a sorted broadcast array; the equi-free join is the honest
    declarative form and AQE keeps it map-side). Mod ownership is pure
    row arithmetic. Output: 4 exact-integer rows."""
    # distinct KEY POSITIONS (not docs): the oracle's ring CTE groups
    # by p, so an md5 collision (two doc_ids, one p — ~n²/2⁶¹, nonzero
    # at corpus scale) would otherwise count once there and twice here.
    # Colliding keys place identically under every policy, so distinct
    # is also the honest unit ("keys moved").
    docs = (
        load(spark, "documents", sf_dir)
        .select(
            md5int(
                F.concat(F.lit("rb:"), F.col("doc_id").cast("string"))
            ).alias("p")
        )
        .distinct()
    )

    def ring_owner(df: DataFrame, n: int, col: str) -> DataFrame:
        # per-size vnode dim join: measured FASTER than a single
        # n-tagged dim with conditional min_bys (the CASE-gated agg
        # costs more than the extra joins at every tested scale)
        pts = df.sparkSession.createDataFrame(
            [
                (s, _ring_point(s, v))
                for s in range(n)
                for v in range(RB_VNODES)
            ],
            "shard int, point long",
        )
        return (
            df.crossJoin(F.broadcast(pts))
            .groupBy("p")
            .agg(
                F.expr(
                    f"min_by(shard, pmod(point - p, {RB_SPACE}))"
                ).alias(col)
            )
        )

    sizes = sorted({n for t in RB_TRANSITIONS for n in t})
    owned = docs
    for n in sizes:
        owned = owned.join(ring_owner(docs, n, f"ring_{n}"), "p")
    for n in sizes:
        owned = owned.withColumn(f"mod_{n}", F.pmod(F.col("p"), F.lit(n)))

    # ONE pass: melt (policy, transition, moved) row-locally — a
    # bounded 4× explode — then a single map-side-combined aggregate.
    # (The first cut ran 4 separate agg branches; without plan reuse
    # each branch recomputed the full ring lineage: 64 exchanges and
    # ~4 s where one shuffle of 4-key partials suffices.)
    cells = owned.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(policy).alias("policy"),
                        F.lit(f"{a}->{b}").alias("transition"),
                        (
                            F.col(f"{policy}_{a}") != F.col(f"{policy}_{b}")
                        )
                        .cast("long")
                        .alias("moved"),
                    )
                    for policy in ("mod", "ring")
                    for a, b in RB_TRANSITIONS
                ]
            )
        ).alias("c")
    ).select("c.policy", "c.transition", "c.moved")
    return (
        cells.groupBy("policy", "transition")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("moved").alias("n_moved"),
        )
        .withColumn("moved_pm", F.expr("(n_moved * 1000) div n_docs"))
        .orderBy("policy", "transition")
    )


def _ring_point(shard: int, vnode: int) -> int:
    import hashlib

    return (
        int(
            hashlib.md5(f"ring:{shard}:{vnode}".encode()).hexdigest()[:15],
            16,
        )
        % RB_SPACE
    )


def shard_rebalance_sql() -> str:
    h = MD5INT_SQL.format(c="'rb:' || CAST(doc_id AS VARCHAR)")
    sizes = sorted({n for t in RB_TRANSITIONS for n in t})
    ring_rows = ", ".join(
        f"({s}, {_ring_point(s, v)}, {n})"
        for n in sizes
        for s in range(n)
        for v in range(RB_VNODES)
    )
    ring_cols = ", ".join(
        f"min_by(r.shard, ((r.point - k.p) % {RB_SPACE} + {RB_SPACE}) "
        f"% {RB_SPACE}) FILTER (WHERE r.n = {n}) AS ring_{n}"
        for n in sizes
    )
    mod_cols = ", ".join(f"p % {n} AS mod_{n}" for n in sizes)
    blocks = []
    for policy in ("mod", "ring"):
        for a, b in RB_TRANSITIONS:
            blocks.append(f"""
SELECT '{policy}' AS policy, '{a}->{b}' AS transition,
       count(*) AS n_docs,
       sum(CASE WHEN {policy}_{a} <> {policy}_{b} THEN 1 ELSE 0 END)::BIGINT AS n_moved,
       ((sum(CASE WHEN {policy}_{a} <> {policy}_{b} THEN 1 ELSE 0 END) * 1000)
        // count(*))::BIGINT AS moved_pm
FROM owned""")
    union = "\nUNION ALL\n".join(blocks)
    return f"""
WITH keys AS (SELECT {h} AS p FROM documents),
ring(shard, point, n) AS (VALUES {ring_rows}),
ringed AS (
  SELECT k.p, {ring_cols}
  FROM keys k CROSS JOIN ring r GROUP BY k.p
),
owned AS (SELECT p, {mod_cols}, {', '.join(f'ring_{n}' for n in sizes)}
          FROM ringed)
{union}
ORDER BY policy, transition
"""
