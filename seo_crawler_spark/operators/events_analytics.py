"""Event-sequence analytics over the events table — funnel completion,
cohort retention, and transition structure.

The reference exposes a live event feed (status polling, dashboard
charts — web/app.js) but never asks sequence questions of it; these
are the three standard ones every event pipeline grows (they are the
reason MATCH_RECOGNIZE / funnel engines exist), each restated as a
shuffle-disciplined DataFrame plan:

* ``funnel_analysis`` — ordered step completion (view → click →
  signup → purchase) with a per-step max gap, greedy-earliest
  semantics: t_{k+1} = min event of step k+1 with t_k < ts ≤ t_k+GAP.
  "min within the gap" ≡ "first after t_k, if within the gap" (if the
  first is beyond the gap, no event is within it) — so one bounded
  aggregate per step replaces per-user trajectory walking. Each step
  is ONE equi-join on user_id + ONE map-side min-agg; K steps = K
  such stages, no windows, no per-user sort.
* ``cohort_retention`` — weekly cohorts (calendar-anchored at
  COHORT_ANCHOR — cohort weeks are calendar facts, not data-derived,
  which also keeps the plan free of a global-min scalar stage) ×
  week offsets, retention per mille against the offset-0 cohort size.
  Two map-side aggs + one dimension-sized join.
* ``event_transitions`` — the first-order Markov structure: per-user
  next-event via ``lead`` over a user-partitioned window (bounded
  partitions, no global sort), then ONE count agg and row-per-mille
  normalization via a window over the |types|²-row aggregate.

All follow temporal.py's epoch-double convention (Spark
``ts.cast(timestamp).cast(double)`` ≡ DuckDB ``epoch(ts)``) and emit
exact integers elsewhere, so the oracles hash bit-identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load

FUNNEL_STEPS = ("view", "click", "signup", "purchase")
FUNNEL_MAX_GAP_S = 86_400.0  # 24 h per step
COHORT_ANCHOR = "2024-01-01"  # calendar week-0 anchor (epoch 1704067200)
_ANCHOR_EPOCH = 1_704_067_200
WEEK_S = 604_800
COHORT_VALUE_MIN = 100.0  # qualifying-purchase floor (see cohort_retention)


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, "events", sf_dir)
    return ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.col("ts").cast("timestamp").cast("double").alias("e"),
    )


def funnel_analysis(
    spark: SparkSession, sf_dir: str, max_gap: float = FUNNEL_MAX_GAP_S
) -> DataFrame:
    ev = _events(spark, sf_dir).localCheckpoint(eager=True)
    users = ev.select("user_id").distinct()
    prev = ev.filter(F.col("event_type") == FUNNEL_STEPS[0]).groupBy(
        "user_id"
    ).agg(F.min("e").alias("t1"))
    stages = [prev]
    for k, step in enumerate(FUNNEL_STEPS[1:], start=2):
        tk_prev = f"t{k - 1}"
        nxt = (
            ev.filter(F.col("event_type") == step)
            .join(stages[-1].select("user_id", tk_prev), "user_id")
            .filter(
                (F.col("e") > F.col(tk_prev))
                & (F.col("e") <= F.col(tk_prev) + max_gap)
            )
            .groupBy("user_id")
            .agg(F.min("e").alias(f"t{k}"))
        )
        stages.append(nxt)
    out = users
    for k, st in enumerate(stages, start=1):
        out = out.join(st.select("user_id", f"t{k}"), "user_id", "left")
    steps_done = (
        F.when(F.col("t4").isNotNull(), 4)
        .when(F.col("t3").isNotNull(), 3)
        .when(F.col("t2").isNotNull(), 2)
        .when(F.col("t1").isNotNull(), 1)
        .otherwise(0)
    )
    return out.select(
        "user_id", "t1", "t2", "t3", "t4",
        steps_done.cast("int").alias("steps_completed"),
    ).orderBy("user_id")


def funnel_sql(max_gap: float = FUNNEL_MAX_GAP_S) -> str:
    ctes = [
        f"s1 AS (SELECT user_id, min(epoch(ts)) AS t1 FROM events "
        f"WHERE event_type = '{FUNNEL_STEPS[0]}' GROUP BY user_id)"
    ]
    for k, step in enumerate(FUNNEL_STEPS[1:], start=2):
        ctes.append(
            f"s{k} AS (SELECT e.user_id, min(epoch(e.ts)) AS t{k} "
            f"FROM events e JOIN s{k - 1} p ON e.user_id = p.user_id "
            f"WHERE e.event_type = '{step}' AND epoch(e.ts) > p.t{k - 1} "
            f"AND epoch(e.ts) <= p.t{k - 1} + {max_gap} GROUP BY e.user_id)"
        )
    return f"""
WITH {', '.join(ctes)},
u AS (SELECT DISTINCT user_id FROM events)
SELECT u.user_id, s1.t1, s2.t2, s3.t3, s4.t4,
       (CASE WHEN s4.t4 IS NOT NULL THEN 4
             WHEN s3.t3 IS NOT NULL THEN 3
             WHEN s2.t2 IS NOT NULL THEN 2
             WHEN s1.t1 IS NOT NULL THEN 1
             ELSE 0 END)::INT AS steps_completed
FROM u
LEFT JOIN s1 USING (user_id)
LEFT JOIN s2 USING (user_id)
LEFT JOIN s3 USING (user_id)
LEFT JOIN s4 USING (user_id)
ORDER BY u.user_id
"""


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention triangle of HIGH-VALUE purchasers (activity =
    a purchase with value ≥ COHORT_VALUE_MIN). The qualifying event
    matters: cohorting on raw activity is VACUOUS on this data (every
    user fires ~16 events/week, so there is one cohort and flat 1000‰
    retention — measured before this predicate was chosen); the
    high-value predicate thins activity to ~0.4/user/week, producing
    five cohorts with genuine decay — the same reason real retention
    analyses cohort on a conversion event, not on pageviews."""
    ev = load(spark, "events", sf_dir).select(
        "user_id",
        "event_type",
        "value",
        F.col("ts").cast("timestamp").cast("double").alias("e"),
    )
    qual = ev.filter(
        (F.col("event_type") == "purchase")
        & (F.col("value") >= COHORT_VALUE_MIN)
    )
    wk = F.floor((F.col("e") - _ANCHOR_EPOCH) / WEEK_S).cast("long")
    active = qual.select("user_id", wk.alias("week")).distinct()
    cohort = active.groupBy("user_id").agg(
        F.min("week").alias("cohort_week")
    )
    g = (
        active.join(cohort, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )
    w0 = Window.partitionBy("cohort_week")
    return (
        g.withColumn(
            "cohort_size",
            F.max(F.when(F.col("offset") == 0, F.col("n_users"))).over(w0),
        )
        .select(
            "cohort_week",
            "offset",
            "n_users",
            F.expr("(n_users * 1000) div cohort_size").alias(
                "retention_pm"
            ),
        )
        .orderBy("cohort_week", "offset")
    )


def cohort_sql() -> str:
    return f"""
WITH active AS (
  SELECT DISTINCT user_id,
         CAST(floor((epoch(ts) - {_ANCHOR_EPOCH}) / {WEEK_S}) AS BIGINT) AS week
  FROM events
  WHERE event_type = 'purchase' AND value >= {COHORT_VALUE_MIN}),
cohort AS (
  SELECT user_id, min(week) AS cohort_week FROM active GROUP BY user_id),
g AS (
  SELECT c.cohort_week, (a.week - c.cohort_week) AS "offset",
         count(DISTINCT a.user_id) AS n_users
  FROM active a JOIN cohort c USING (user_id)
  GROUP BY 1, 2)
SELECT cohort_week, "offset", n_users,
       (n_users * 1000) // max(CASE WHEN "offset" = 0 THEN n_users END)
         OVER (PARTITION BY cohort_week) AS retention_pm
FROM g ORDER BY cohort_week, "offset"
"""


def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("e", "event_id")
    pairs = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    g = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    wf = Window.partitionBy("from_type")
    return (
        g.withColumn(
            "prob_pm", F.expr("(n * 1000) div sum(n) over (partition by from_type)")
        )
        .select("from_type", "to_type", "n", "prob_pm")
        .orderBy("from_type", "to_type")
    )


def transitions_sql() -> str:
    return """
WITH seq AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY epoch(ts), event_id
         ) AS to_type
  FROM events),
g AS (
  SELECT from_type, to_type, count(*) AS n
  FROM seq WHERE to_type IS NOT NULL GROUP BY from_type, to_type)
SELECT from_type, to_type, n,
       ((n * 1000) // sum(n) OVER (PARTITION BY from_type))::BIGINT AS prob_pm
FROM g ORDER BY from_type, to_type
"""


# ---------------------------------------------------------------------------
# EWMA control chart — statistical process control for pipeline health
# ---------------------------------------------------------------------------

DAY_S = 86_400
# EWMA λ = 1/4 as the exact geometric weight table (λ(1-λ)^k scaled by
# 4^(k+1) → integer numerators 1·4^k·3^0? stated directly: w_k numerator
# = 3^k, denominator 4^(k+1), truncated at EWMA_DEPTH with the tail mass
# folded into the oldest term so weights sum to exactly 1)
EWMA_DEPTH = 12
EWMA_SCALE = 1_000_000


def _ewma_weights() -> list[int]:
    """w_k·1e6 for k = 0..DEPTH-1: λ(1−λ)^k with λ=1/4, tail mass folded
    into the last term — integers, Σ = EWMA_SCALE exactly."""
    ws = []
    acc = 0
    for k in range(EWMA_DEPTH - 1):
        w = (EWMA_SCALE * (3**k)) // (4 ** (k + 1))
        ws.append(w)
        acc += w
    ws.append(EWMA_SCALE - acc)
    return ws


def error_rate_control(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA control chart (Roberts 1959 / NIST e-handbook §6.3.2.4)
    over the DAILY error-event rate — the statistical-process-control
    readout a pipeline owner watches: is today's error rate drifting
    beyond its own smoothed history, or is it binomial noise? A 100 TB
    ingest emits exactly this per wave (fetch-error rate, parse-error
    rate); the chart is what separates "page us" from "Poisson".

    The EWMA recursion s_t = λx_t + (1−λ)s_{t−1} is SEQUENTIAL — a
    per-row loop in the naive form. It unrolls exactly: s_t =
    Σ_k λ(1−λ)^k x_{t−k}, a fixed-depth weighted window sum with
    PRECOMPUTED integer weights (λ=1/4 ⇒ numerators 3^k/4^{k+1} on the
    1e6 grid, tail mass folded so weights sum to exactly 1e6 — the
    sketches ln-table discipline applied to geometric decay). So the
    plan is ONE map-side daily aggregate (corpus-scale) + one
    fixed-depth window over the ~30-row day frame. Control limits are
    binomial 3σ around the prior-day EWMA, compared in SQUARED integer
    form (no sqrt): alarm ⇔ n·(x−s)² > 9·s·(1e6−s) with x,s per-mille
    rates on the 1e6 grid — both engines evaluate the identical
    integer inequality. The shipped event stream is stationary, so
    zero alarms IS the correct verdict here (pinned); the alarm branch
    is pinned by an injected-spike corpus in tests (the classifier
    separable-data precedent)."""
    ev = load(spark, "events", sf_dir).select(
        "event_type",
        F.col("ts").cast("timestamp").cast("double").alias("e"),
    )
    return control_chart(ev)


def control_chart(ev: DataFrame) -> DataFrame:
    """Chart core over an (event_type, e) frame — split out so tests
    can feed an injected-spike stream (the alarm branch never fires on
    the stationary shipped data, by design)."""
    return chart_from_daily(daily_counts(ev))


def daily_counts(ev: DataFrame) -> DataFrame:
    """(day, n, n_err) partial counts — the ONLY corpus-scale stage,
    and an associative SUM-mergeable state (the streaming twin folds
    per-batch partials into it; streaming/control_stream.py)."""
    day = F.floor((F.col("e") - _ANCHOR_EPOCH) / DAY_S).cast("long")
    return ev.groupBy(day.alias("day")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col("event_type") == "error", 1).otherwise(0)
        ).alias("n_err"),
    )


def chart_from_daily(counts: DataFrame) -> DataFrame:
    daily = counts.withColumn(
        "x", F.expr(f"(n_err * {EWMA_SCALE}) div n")
    )
    ws = _ewma_weights()
    w = Window.orderBy("day")  # ~30-row frame
    terms = [
        (F.coalesce(F.lag("x", k).over(w), F.col("x")) * F.lit(wk))
        for k, wk in enumerate(ws)
    ]
    s = sum(terms[1:], terms[0])
    chart = daily.withColumn("__ewma_num", s).withColumn(
        "ewma", F.expr(f"__ewma_num div {EWMA_SCALE}")
    )
    prior = F.lag("ewma").over(w)
    alarm = F.when(
        prior.isNull(), F.lit(False)
    ).otherwise(
        F.col("n") * (F.col("x") - prior) * (F.col("x") - prior)
        > F.lit(9) * prior * (F.lit(EWMA_SCALE) - prior)
    )
    return chart.withColumn("alarm", alarm).select(
        "day", "n", "n_err", "x", "ewma", "alarm"
    ).orderBy("day")


def error_rate_control_sql() -> str:
    ws = _ewma_weights()
    terms = " + ".join(
        f"coalesce(lag(x, {k}) OVER (ORDER BY day), x) * {wk}"
        for k, wk in enumerate(ws)
    )
    return f"""
WITH daily AS (
  SELECT CAST(floor((epoch(ts) - {_ANCHOR_EPOCH}) / {DAY_S}) AS BIGINT) AS day,
         count(*) AS n,
         sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT AS n_err
  FROM events GROUP BY 1),
rated AS (
  SELECT day, n, n_err, (n_err * {EWMA_SCALE}) // n AS x FROM daily),
sm AS (
  SELECT day, n, n_err, x,
         (({terms}) // {EWMA_SCALE})::BIGINT AS ewma
  FROM rated),
ch AS (
  SELECT *, lag(ewma) OVER (ORDER BY day) AS prior FROM sm)
SELECT day, n, n_err, x, ewma,
       CASE WHEN prior IS NULL THEN FALSE
            ELSE n * (x - prior) * (x - prior)
                 > 9 * prior * ({EWMA_SCALE} - prior) END AS alarm
FROM ch ORDER BY day
"""


# ---------------------------------------------------------------------------
# Frequent k-step paths — higher-order sequence mining
# ---------------------------------------------------------------------------

PATH_TOPK = 20


def topk_paths(
    spark: SparkSession, sf_dir: str, k: int = PATH_TOPK
) -> DataFrame:
    """Most frequent 3-step event paths — the higher-order complement
    to event_transitions (order-1 Markov says error→view is common;
    the trigram table says whether view→error→view loops dominate or
    errors terminate sessions — the question funnel designers and
    anomaly hunts actually ask). Sliding trigrams per user via two
    ``lead``s over the user-partitioned window (bounded partitions),
    ONE map-side count agg over ≤|types|³ keys, global top-k by
    orderBy+limit with the rank window on the k-row result — the
    per-group-top-k discipline used everywhere in this repo."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("e", "event_id")
    tri = ev.select(
        F.col("event_type").alias("t0"),
        F.lead("event_type", 1).over(w).alias("t1"),
        F.lead("event_type", 2).over(w).alias("t2"),
    ).filter(F.col("t1").isNotNull() & F.col("t2").isNotNull())
    g = tri.groupBy(
        F.concat_ws(">", "t0", "t1", "t2").alias("path")
    ).agg(F.count(F.lit(1)).alias("n"))
    top = g.orderBy(F.desc("n"), F.asc("path")).limit(k)
    wr = Window.orderBy(F.desc("n"), F.asc("path"))
    return (
        top.withColumn("rnk", F.row_number().over(wr))
        .select("path", "n", "rnk")
        .orderBy("rnk")
    )


def topk_paths_sql(k: int = PATH_TOPK) -> str:
    return f"""
WITH seq AS (
  SELECT event_type AS t0,
         lead(event_type, 1) OVER w AS t1,
         lead(event_type, 2) OVER w AS t2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch(ts), event_id)),
g AS (
  SELECT t0 || '>' || t1 || '>' || t2 AS path, count(*) AS n
  FROM seq WHERE t1 IS NOT NULL AND t2 IS NOT NULL
  GROUP BY 1),
top AS (
  SELECT * FROM g ORDER BY n DESC, path ASC LIMIT {k})
SELECT path, n, row_number() OVER (ORDER BY n DESC, path ASC) AS rnk
FROM top ORDER BY rnk
"""
