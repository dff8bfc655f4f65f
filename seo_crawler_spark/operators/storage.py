"""Storage-layout audit — sort-key selection for columnar scan
efficiency, measured as run counts.

Parquet/ORC encode columns with run-length + dictionary encoding, so
the bytes a 100 TB table occupies — and the bytes every scan decodes —
depend on the ROW ORDER the writer chose: sorting by a low-cardinality
column collapses it to one run per value (and co-sorts correlated
columns), while a high-cardinality column never compresses no matter
the order. Lakehouse writers expose exactly this knob (Iceberg
``sort_order``, Delta ``OPTIMIZE ZORDER``); choosing it well is a
standing 100 TB lever. This audit measures, for each candidate layout
× column, the number of value RUNS the layout produces — the direct
proxy for RLE size and predicate-skipping effectiveness (fewer runs ⇒
tighter min/max per page ⇒ more row groups pruned).

Distributed run counting (the part worth doing right): a naive
``lag`` over the full table is a single-partition window — the exact
anti-pattern ordering.py's two-phase seq exists to avoid. Runs
decompose instead: with the table range-partitioned by the layout's
leading key, total_runs = Σ within-partition runs − (boundary pairs
whose adjacent values match across consecutive partitions). So the
plan is ONE partitioned window (per-partition lag, arbitrary
parallelism) + a boundary merge over the #partitions-row edge frame
(first/last value per partition via min_by/max_by on the in-partition
position, then one tiny window in partition order). Nothing global
ever sorts the corpus on one executor.

Layouts audited: ``arrival`` (doc_id blocks — crawl order), by_lang,
by_source, by_lang_source; measured columns: lang, source, n_chars
(the high-cardinality control that shows order cannot compress
entropy). All counts are exact integers; runs_pm = runs·1000 div n.

Reference parity: the reference persists to SQLite row pages
(database.py) where row order is a no-op; this operator belongs to
the Spark build's physical-layout layer (SURVEY §7 scale notes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load

ARRIVAL_BLOCK = 64  # rows per range block of the arrival layout

# layout name -> (partition-key Spark expr, partition-key SQL expr).
# The audited global order is (partition key, doc_id); the partition
# key doubles as the boundary-merge order.
_LAYOUTS = (
    ("arrival", f"lpad(cast(doc_id div {ARRIVAL_BLOCK} as string), 12, '0')",
     f"lpad(cast(doc_id // {ARRIVAL_BLOCK} as varchar), 12, '0')"),
    ("by_lang", "lang", "lang"),
    ("by_source", "source", "source"),
    ("by_lang_source", "concat(lang, '|', source)", "lang || '|' || source"),
)
_COLUMNS = ("lang", "source", "n_chars")


def storage_layout_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir).select(
        "doc_id", "lang", "source", "n_chars"
    )
    parts = []
    for layout, pk_spark, _ in _LAYOUTS:
        base = docs.select(
            F.expr(pk_spark).alias("pk"),
            "doc_id",
            *[F.col(c).cast("string").alias(c) for c in _COLUMNS],
        )
        w = Window.partitionBy("pk").orderBy("doc_id")
        for col in _COLUMNS:
            inpart = base.select(
                "pk",
                "doc_id",
                F.col(col).alias("v"),
                F.when(
                    F.lag(col).over(w).isNull()
                    | (F.col(col) != F.lag(col).over(w)),
                    F.lit(1),
                )
                .otherwise(F.lit(0))
                .alias("is_new"),
            )
            edges = inpart.groupBy("pk").agg(
                F.sum("is_new").alias("runs"),
                F.expr("min_by(v, doc_id)").alias("firstv"),
                F.expr("max_by(v, doc_id)").alias("lastv"),
                F.count(F.lit(1)).alias("n"),
            )
            we = Window.orderBy("pk")  # #partitions rows only
            merged = edges.select(
                "runs",
                "n",
                F.when(
                    F.lag("lastv").over(we) == F.col("firstv"), F.lit(1)
                )
                .otherwise(F.lit(0))
                .alias("dup_boundary"),
            ).agg(
                F.sum("runs").alias("r"),
                F.sum("dup_boundary").alias("d"),
                F.sum("n").alias("nt"),
            )
            parts.append(
                merged.select(
                    F.lit(layout).alias("layout"),
                    F.lit(col).alias("column_name"),
                    (F.col("r") - F.col("d")).alias("n_runs"),
                    F.expr("((r - d) * 1000) div nt").alias("runs_pm"),
                )
            )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("layout", "column_name")


def storage_layout_sql() -> str:
    blocks = []
    for layout, _, pk_sql in _LAYOUTS:
        for col in _COLUMNS:
            blocks.append(f"""
SELECT '{layout}' AS layout, '{col}' AS column_name,
       (sum(runs) - sum(dup_boundary))::BIGINT AS n_runs,
       ((sum(runs) - sum(dup_boundary)) * 1000) // sum(n) AS runs_pm
FROM (
  SELECT pk, runs, firstv, lastv, n,
         CASE WHEN lag(lastv) OVER (ORDER BY pk) = firstv
              THEN 1 ELSE 0 END AS dup_boundary
  FROM (
    SELECT pk,
           sum(is_new)::BIGINT AS runs,
           min_by(v, doc_id) AS firstv,
           max_by(v, doc_id) AS lastv,
           count(*) AS n
    FROM (
      SELECT pk, doc_id, v,
             CASE WHEN lag(v) OVER (PARTITION BY pk ORDER BY doc_id)
                       IS DISTINCT FROM v
                  THEN 1 ELSE 0 END AS is_new
      FROM (
        SELECT {pk_sql} AS pk, doc_id,
               CAST({col} AS VARCHAR) AS v
        FROM documents)
    ) GROUP BY pk
  )
)""")
    body = "\nUNION ALL\n".join(blocks)
    return f"SELECT * FROM (\n{body}\n) ORDER BY layout, column_name"
