"""Per-wave metrics + per-partition lineage (north rule: "per-partition
lineage + fetch metrics written each micro-batch").

Two surfaces:
  * ``observe()`` named metrics on the extraction output — collected by
    a QueryExecution observation without a separate job;
  * a per-partition lineage table (wave, stage, partition_id, rows) so
    skew is visible per micro-batch — the Spark-native replacement for
    the reference's memory profiler (src/core/memory_profiler.py:66-100).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

FETCH_METRICS = (
    "n_pages",
    "n_ok",
    "n_errors",
    "bytes_fetched",
    "avg_response_ms",
)


def observe_fetch(extracted: DataFrame) -> tuple[DataFrame, Observation]:
    """Attach fetch metrics to the extraction output; values materialize
    with the wave's first action — no extra job."""
    obs = Observation("fetch")
    out = extracted.observe(
        obs,
        F.count(F.lit(1)).alias("n_pages"),
        F.sum(F.when(F.col("status_code") == 200, 1).otherwise(0)).alias("n_ok"),
        F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias("n_errors"),
        F.sum("size").alias("bytes_fetched"),
        F.round(F.avg("response_time"), 2).alias("avg_response_ms"),
    )
    return out, obs


def partition_lineage(df: DataFrame, wave: int, stage: str) -> DataFrame:
    """(wave, stage, partition_id, rows) — one row per partition."""
    return (
        df.select(F.spark_partition_id().alias("partition_id"))
        .groupBy("partition_id")
        .agg(F.count(F.lit(1)).alias("rows"))
        .select(
            F.lit(wave).alias("wave"),
            F.lit(stage).alias("stage"),
            "partition_id",
            "rows",
        )
    )
