"""Temporal joins the reference computes imperatively and Spark lacks
as built-ins: as-of join (latest prior event) and bounded range join
(events within a trailing time window).

Reference parity: the crawler's recrawl scheduler walks each host's
fetch history to find "the most recent fetch before now" and "fetches
in the last hour" with dict loops (crawler.py recrawl/stats paths);
these are the same temporal shapes over the events table, expressed as
distributed plans.

Scale notes (the whole point of these formulations):

* ``events_asof_join`` is the **union + partitioned window** as-of:
  zero joins, ONE shuffle on the partition key (user_id), and the
  window is per-user so no single-partition sort exists. This is the
  canonical distributed as-of (Flink temporal join / QuestDB ASOF
  reformulated for shuffle engines); a naive formulation is an
  inequality self-join (O(n·m) per user) or a global sort.
* ``events_range_join`` is the **time-bucket equi-join** range join:
  the probe side explodes to ceil(W/bucket)+1 buckets, the join is a
  plain equi-join on the bucket key (shuffle-hash/sort-merge, AQE
  skew-splittable), and the exact range predicate filters after the
  join. A naive range join is a BroadcastNestedLoop/cartesian — the
  plan-quality tests forbid those. Bucket width == window width keeps
  the blow-up factor at exactly 2 probe rows.

Both follow this package's epoch-double convention (cast ts to double
seconds) so the DuckDB oracles are bit-comparable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load

RANGE_W_S = 3600.0  # trailing window for the range join (1 h)


def events_asof_join(
    spark: SparkSession,
    sf_dir: str,
    left_type: str = "purchase",
    right_type: str = "view",
) -> DataFrame:
    """For every *left_type* event, the latest *right_type* event by the
    same user with ``ts <= left.ts`` (ties on ts broken by the larger
    event_id): the as-of join.

    Implementation: tag rights side=0 / lefts side=1, union, and take
    ``last(right_cols, ignorenulls=True)`` over a per-user window
    ordered by ``(e, side, event_id)`` — a right row at the exact same
    timestamp sorts before the left row (inclusive as-of), and equal-ts
    rights sort by event_id so the last one seen is the max-event_id
    tiebreak. One shuffle, no join, no global sort.
    """
    ev = load(spark, "events", sf_dir)
    e = F.col("ts").cast("timestamp").cast("double")
    is_r = F.col("event_type") == right_type
    u = ev.where(F.col("event_type").isin([left_type, right_type])).select(
        "event_id",
        "user_id",
        e.alias("e"),
        F.when(is_r, 0).otherwise(1).alias("side"),
        F.when(is_r, F.col("event_id")).alias("r_id"),
        F.when(is_r, F.col("value")).alias("r_value"),
        F.when(is_r, e).alias("r_e"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("e", "side", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = u.select(
        "event_id",
        "user_id",
        "e",
        "side",
        F.last("r_id", ignorenulls=True).over(w).alias("prior_id"),
        F.last("r_value", ignorenulls=True).over(w).alias("prior_value"),
        F.last("r_e", ignorenulls=True).over(w).alias("prior_e"),
    )
    return (
        d.where(F.col("side") == 1)
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("prior_id").alias("view_event_id"),
            F.round("prior_value", 2).alias("view_value"),
            F.round(F.col("e") - F.col("prior_e"), 3).alias("gap_s"),
        )
        .orderBy("purchase_id")
    )


def events_asof_join_sql(
    left_type: str = "purchase", right_type: str = "view"
) -> str:
    """DuckDB twin of :func:`events_asof_join` — the identical
    union-window formulation (not DuckDB's ASOF JOIN, whose equal-ts
    tiebreak is unspecified), so both engines run the same double sums
    and the same (e, side, event_id) total order."""
    return f"""
WITH u AS (
  SELECT event_id, user_id, epoch(ts) AS e,
         CASE WHEN event_type = '{right_type}' THEN 0 ELSE 1 END AS side,
         CASE WHEN event_type = '{right_type}' THEN event_id END AS r_id,
         CASE WHEN event_type = '{right_type}' THEN value END AS r_value,
         CASE WHEN event_type = '{right_type}' THEN epoch(ts) END AS r_e
  FROM events
  WHERE event_type IN ('{left_type}', '{right_type}')
),
w AS (
  SELECT event_id, user_id, e, side,
         last_value(r_id IGNORE NULLS) OVER win AS prior_id,
         last_value(r_value IGNORE NULLS) OVER win AS prior_value,
         last_value(r_e IGNORE NULLS) OVER win AS prior_e
  FROM u
  WINDOW win AS (PARTITION BY user_id ORDER BY e, side, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_id AS purchase_id, user_id,
       prior_id AS view_event_id,
       round(prior_value, 2) AS view_value,
       round(e - prior_e, 3) AS gap_s
FROM w WHERE side = 1 ORDER BY purchase_id
"""


def events_range_join(
    spark: SparkSession,
    sf_dir: str,
    left_type: str = "purchase",
    right_type: str = "view",
    window_s: float = RANGE_W_S,
) -> DataFrame:
    """For every *left_type* event, how many *right_type* events (by
    ANY user — cross-user, so no partition key exists) fell in the
    trailing window ``[ts - window_s, ts)``.

    Implementation: bucket rights by ``floor(e / window_s)``, explode
    each left to buckets ``{b-1, b}`` (a trailing window of width W
    can only intersect those two W-wide buckets), equi-join on the
    bucket, apply the exact range predicate, then count — with a final
    left join back so zero-hit lefts keep ``n_views = 0``.
    """
    ev = load(spark, "events", sf_dir)
    e = F.col("ts").cast("timestamp").cast("double")
    lefts = ev.where(F.col("event_type") == left_type).select(
        F.col("event_id").alias("purchase_id"), e.alias("p_e")
    )
    rights = ev.where(F.col("event_type") == right_type).select(
        e.alias("v_e"), F.floor(e / window_s).alias("bucket")
    )
    probe = lefts.withColumn(
        "bucket",
        F.explode(
            F.array(
                F.floor(F.col("p_e") / window_s) - 1,
                F.floor(F.col("p_e") / window_s),
            )
        ),
    )
    hits = (
        probe.join(rights, "bucket")
        .where(
            (F.col("v_e") >= F.col("p_e") - window_s) & (F.col("v_e") < F.col("p_e"))
        )
        .groupBy("purchase_id")
        .agg(F.count(F.lit(1)).alias("n_views"))
    )
    return (
        lefts.select("purchase_id")
        .join(hits, "purchase_id", "left")
        .select(
            "purchase_id", F.coalesce("n_views", F.lit(0)).alias("n_views")
        )
        .orderBy("purchase_id")
    )


def events_range_join_sql(
    left_type: str = "purchase",
    right_type: str = "view",
    window_s: float = RANGE_W_S,
) -> str:
    """DuckDB twin: the plain inequality formulation (fine at oracle
    scale; the Spark side's bucketing exists precisely because this
    shape is a nested-loop at 100 TB)."""
    return f"""
WITH l AS (
  SELECT event_id AS purchase_id, epoch(ts) AS p_e
  FROM events WHERE event_type = '{left_type}'
),
r AS (
  SELECT epoch(ts) AS v_e FROM events WHERE event_type = '{right_type}'
)
SELECT l.purchase_id,
       (SELECT count(*) FROM r
        WHERE r.v_e >= l.p_e - {window_s} AND r.v_e < l.p_e)::BIGINT AS n_views
FROM l ORDER BY purchase_id
"""
