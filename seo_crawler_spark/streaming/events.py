"""Event-stream operators: windowed aggregation, sessionization, and
Structured Streaming equivalents.

The reference's streaming traits (continuous worker loop, periodic
flush, incremental offset feed — SURVEY.md §2.8) map to:

  * batch-over-seq incremental feeds (sources/exports.status_feed)
  * micro-batch wave jobs (operators/frontier.py)
  * true Structured Streaming where event-time semantics matter —
    this module: tumbling windows with watermarks for late data, and
    applyInPandasWithState for custom stateful accumulation (the
    crawl-stats counters of crawler.py:64-70 as streaming state).

Batch variants compute on epoch-double arithmetic (cast(ts as double))
so the DuckDB oracle is bit-comparable without timezone/format games.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.tables import load

SESSION_GAP_S = 1800.0  # 30 min


def tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-hour × event_type counts + value sums (tumbling window)."""
    ev = load(spark, "events", sf_dir)
    # ts is TIMESTAMP_NTZ: route through TIMESTAMP (UTC session) to epoch
    e = F.col("ts").cast("timestamp").cast("double")
    bucket = (F.floor(e / 3600) * 3600).cast("long")
    return (
        ev.groupBy(bucket.alias("hour_bucket"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .orderBy("hour_bucket", "event_type")
    )


TUMBLING_COUNTS_SQL = """
SELECT (floor(epoch(ts) / 3600) * 3600)::BIGINT AS hour_bucket,
       event_type,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY hour_bucket, event_type
"""


def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) per user via
    lag + running sum — the classic sessionize-in-SQL shape."""
    ev = load(spark, "events", sf_dir)
    e = F.col("ts").cast("timestamp").cast("double")
    w = Window.partitionBy("user_id").orderBy("e")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d = (
        ev.select("user_id", e.alias("e"))
        .withColumn("prev", F.lag("e").over(w))
        .withColumn(
            "new_sess",
            F.when(
                F.col("prev").isNull() | (F.col("e") - F.col("prev") > SESSION_GAP_S), 1
            ).otherwise(0),
        )
        .withColumn("session_id", F.sum("new_sess").over(wrun))
    )
    return (
        d.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.floor(F.min("e")).cast("long").alias("start_s"),
            F.floor(F.max("e")).cast("long").alias("end_s"),
            F.round(F.max("e") - F.min("e"), 3).alias("duration_s"),
        )
        .orderBy("user_id", "session_id")
    )


SESSIONIZE_SQL = f"""
WITH e AS (SELECT user_id, epoch(ts) AS e FROM events),
lagged AS (
  SELECT user_id, e,
         lag(e) OVER (PARTITION BY user_id ORDER BY e) AS prev
  FROM e
),
flagged AS (
  SELECT user_id, e,
         CASE WHEN prev IS NULL OR e - prev > {SESSION_GAP_S} THEN 1 ELSE 0 END
           AS new_sess
  FROM lagged
),
sess AS (
  -- ::BIGINT: DuckDB's integer sum yields HUGEINT, Spark yields bigint
  SELECT user_id, e,
         (sum(new_sess) OVER (PARTITION BY user_id ORDER BY e
                              ROWS UNBOUNDED PRECEDING))::BIGINT AS session_id
  FROM flagged
)
SELECT user_id, session_id, count(*) AS n_events,
       floor(min(e))::BIGINT AS start_s,
       floor(max(e))::BIGINT AS end_s,
       round(max(e) - min(e), 3) AS duration_s
FROM sess GROUP BY user_id, session_id
ORDER BY user_id, session_id
"""


def sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 min: each event lands in exactly
    two windows (the hopping-window shape; streaming twin =
    stream_sliding_counts via native F.window). Batch form generates
    the two window starts arithmetically so the DuckDB oracle is exact."""
    ev = load(spark, "events", sf_dir)
    e = F.col("ts").cast("timestamp").cast("double")
    # window starts: (floor(e/1800) - k) * 1800 for k in {0, 1}
    k = F.explode(F.array(F.lit(0), F.lit(1)))
    d = ev.select(e.alias("e"), "event_type").withColumn("k", k)
    start = ((F.floor(F.col("e") / 1800) - F.col("k")) * 1800).cast("long")
    return (
        d.groupBy(start.alias("win_start"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy("win_start", "event_type")
    )


SLIDING_COUNTS_SQL = """
WITH d AS (
  SELECT epoch(ts) AS e, event_type, unnest([0, 1]) AS k
  FROM events
)
SELECT ((floor(e / 1800) - k) * 1800)::BIGINT AS win_start,
       event_type,
       count(*) AS n_events
FROM d
GROUP BY 1, 2
ORDER BY win_start, event_type
"""


def stream_sliding_counts(
    spark: SparkSession,
    input_dir: str,
    schema: T.StructType,
    watermark: str = "1 hour",
):
    """Native sliding window (readStream → F.window(size=1h, slide=30m))
    — the Structured Streaming twin of :func:`sliding_counts`."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"),
            F.col("event_type"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").cast("double").cast("long").alias("win_start"),
            "event_type",
            "n_events",
        )
    )


def user_event_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user activity profile: counts per type pivoted in one agg
    (the multi-counter single-pass pattern, app.js:1241-1283)."""
    ev = load(spark, "events", sf_dir)
    return (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("n_click"),
            F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("n_view"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("n_purchase"),
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("n_error"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("user_id")
    )


USER_EVENT_RATES_SQL = """
SELECT user_id, count(*) AS n_events,
       sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS n_click,
       sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT AS n_view,
       sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS n_purchase,
       sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT AS n_error,
       round(sum(value), 2) AS total_value
FROM events GROUP BY user_id ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# Structured Streaming variants
# ---------------------------------------------------------------------------


def stream_tumbling_counts(
    spark: SparkSession,
    input_dir: str,
    schema: T.StructType,
    watermark: str = "1 hour",
):
    """readStream → watermark → tumbling window agg. Late rows beyond the
    watermark are dropped — the event-time analogue of the crawl
    engine's 'first wave wins' dedupe (SURVEY.md §2.8)."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    # testdata ts is TIMESTAMP_NTZ; watermarks need TIMESTAMP (session
    # TZ is pinned to UTC, so the cast is value-preserving)
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").cast("double").cast("long").alias("hour_bucket"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def run_stream_to_memory(
    sdf, query_name: str, output_mode: str = "complete"
) -> None:
    """Drive a streaming DF with Trigger.AvailableNow into a memory sink
    (processes all available input as micro-batches, then stops)."""
    q = (
        sdf.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)

_RUNNING_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def stream_running_user_totals(
    spark: SparkSession,
    input_dir: str,
    schema: T.StructType,
    max_files_per_trigger: int | None = None,
):
    """Custom stateful operator via applyInPandasWithState: per-user
    running (count, value-sum) across micro-batches — the reference's
    crawl-stats counters (crawler.py:64-70) as managed state."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, round(total, 6)))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
        )

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_dir)
    return (
        stream.groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=_RUNNING_OUT,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stream_sessionize(
    spark: SparkSession,
    input_dir: str,
    schema: T.StructType,
    watermark: str = "1 hour",
):
    """Native session windows (F.session_window, 30-min gap) over the
    event stream — the streaming twin of the batch lag+running-sum
    sessionize. Boundary semantics differ by one epsilon: the batch rule
    keeps a gap of EXACTLY 1800.0s in-session (gap > 1800 splits) while
    session_window's half-open [start, last+gap) splits it; with
    microsecond event times an exact-1800.000000s gap does not occur, so
    the parity test compares (user, session-start, n_events) directly."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    gap = f"{int(SESSION_GAP_S)} seconds"
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.floor(F.col("w.start").cast("double")).cast("long").alias("start_s"),
            "n_events",
        )
    )
