"""SCD2 history maintenance — MERGE INTO semantics as one full-outer
join, the lakehouse upsert every warehouse table eventually needs.

A recrawl produces a delta batch (changed pages, vanished pages, newly
discovered pages) against the current snapshot; a training/analytics
store wants the slowly-changing-dimension type-2 answer — every
version of every row with validity ranges — not a blind overwrite
(reproducibility: "train on the corpus as of batch k"). Delta Lake's
MERGE and Iceberg's copy-on-write both lower to exactly the plan used
here: ONE full-outer equi-join of base vs delta on the business key,
then row-local classification into insert / update / delete /
unchanged and a bounded explode of the update rows into (closed old
version, open new version). No windows, no second pass over either
input; at 10^10 rows the join is the only shuffle and AQE handles the
delta side being orders of magnitude smaller.

Delta synthesis (deterministic, md5-derived, both engines identical):
~20% of docs update (text re-hashed with a batch marker), ~10%
delete, and one brand-new doc appears per deleted one (id offset past
the key space) — all four MERGE outcomes populated at every scale.

Validity is expressed in batch numbers (valid_from/valid_to; NULL
valid_to = current) — the production variant substitutes commit
timestamps without touching the plan.

Reference parity: the reference overwrites its SQLite pages table per
recrawl (database.py update path) and keeps no history; SCD2 is the
engine-side upgrade, sharing snapshots.py's merge-on-read tombstone
philosophy (state/snapshots.py:238+) at row granularity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import MD5INT_SQL, md5int
from ..sources.tables import load

SCD_UPD_MOD = 10  # md5 % 10 ∈ {0,1} → update, {2} → delete+insert-new


def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir).select("doc_id", "text")
    n = docs.count()
    h = F.pmod(
        md5int(F.concat(F.lit("chg:"), F.col("doc_id").cast("string"))),
        F.lit(SCD_UPD_MOD),
    )
    base = docs.select(
        "doc_id", F.md5("text").alias("content"), h.alias("hmod")
    )
    updates = base.filter(F.col("hmod") < 2).select(
        "doc_id",
        F.md5(F.concat(F.lit("batch2:"), F.col("content"))).alias(
            "new_content"
        ),
    )
    deletes = base.filter(F.col("hmod") == 2).select(
        "doc_id", F.lit(None).cast("string").alias("new_content")
    )
    inserts = base.filter(F.col("hmod") == 2).select(
        (F.col("doc_id") + F.lit(n)).alias("doc_id"),
        F.md5(
            F.concat(
                F.lit("new2:"),
                (F.col("doc_id") + F.lit(n)).cast("string"),
            )
        ).alias("new_content"),
    )
    delta = updates.unionByName(deletes).unionByName(inserts).withColumn(
        "is_delete", F.col("new_content").isNull()
    )
    j = base.select("doc_id", "content").join(delta, "doc_id", "full_outer")
    op = (
        F.when(F.col("content").isNull(), "insert")
        .when(F.col("is_delete") == True, "delete")  # noqa: E712
        .when(F.col("new_content").isNotNull(), "update")
        .otherwise("unchanged")
    )
    c = j.withColumn("op", op)
    # bounded explode: ≤2 history rows per key
    hist = c.select(
        "doc_id",
        "op",
        F.explode(
            F.when(
                F.col("op") == "unchanged",
                F.array(
                    F.struct(
                        F.col("content").alias("content"),
                        F.lit(1).alias("valid_from"),
                        F.lit(None).cast("int").alias("valid_to"),
                    )
                ),
            )
            .when(
                F.col("op") == "insert",
                F.array(
                    F.struct(
                        F.col("new_content").alias("content"),
                        F.lit(2).alias("valid_from"),
                        F.lit(None).cast("int").alias("valid_to"),
                    )
                ),
            )
            .when(
                F.col("op") == "delete",
                F.array(
                    F.struct(
                        F.col("content").alias("content"),
                        F.lit(1).alias("valid_from"),
                        F.lit(2).alias("valid_to"),
                    )
                ),
            )
            .otherwise(  # update: close v1, open v2
                F.array(
                    F.struct(
                        F.col("content").alias("content"),
                        F.lit(1).alias("valid_from"),
                        F.lit(2).alias("valid_to"),
                    ),
                    F.struct(
                        F.col("new_content").alias("content"),
                        F.lit(2).alias("valid_from"),
                        F.lit(None).cast("int").alias("valid_to"),
                    ),
                )
            )
        ).alias("v"),
    )
    return hist.select(
        "doc_id",
        "op",
        F.col("v.content").alias("content"),
        F.col("v.valid_from").alias("valid_from"),
        F.col("v.valid_to").alias("valid_to"),
        F.col("v.valid_to").isNull().alias("is_current"),
    ).orderBy("doc_id", "valid_from")


def scd2_sql() -> str:
    h = MD5INT_SQL.format(c="'chg:' || CAST(doc_id AS VARCHAR)")
    return f"""
WITH n AS (SELECT count(*) AS c FROM documents),
base AS MATERIALIZED (
  SELECT doc_id, md5(text) AS content, {h} % {SCD_UPD_MOD} AS hmod
  FROM documents),
delta AS MATERIALIZED (
  SELECT doc_id, md5('batch2:' || content) AS new_content, FALSE AS is_delete
  FROM base WHERE hmod < 2
  UNION ALL
  SELECT doc_id, NULL, TRUE FROM base WHERE hmod = 2
  UNION ALL
  SELECT doc_id + (SELECT c FROM n),
         md5('new2:' || CAST(doc_id + (SELECT c FROM n) AS VARCHAR)),
         FALSE
  FROM base WHERE hmod = 2),
j AS (
  SELECT coalesce(b.doc_id, d.doc_id) AS doc_id,
         b.content, d.new_content, d.is_delete,
         CASE WHEN b.content IS NULL THEN 'insert'
              WHEN d.is_delete THEN 'delete'
              WHEN d.new_content IS NOT NULL THEN 'update'
              ELSE 'unchanged' END AS op
  FROM base b FULL OUTER JOIN delta d ON b.doc_id = d.doc_id),
hist AS (
  SELECT doc_id, op, content, 1 AS valid_from,
         CASE WHEN op IN ('delete', 'update') THEN 2 END AS valid_to
  FROM j WHERE op <> 'insert'
  UNION ALL
  SELECT doc_id, op, new_content, 2, NULL
  FROM j WHERE op IN ('insert', 'update'))
SELECT doc_id, op, content, valid_from::INT AS valid_from,
       valid_to::INT AS valid_to,
       valid_to IS NULL AS is_current
FROM hist ORDER BY doc_id, valid_from
"""
