"""Core relational operator plans over the driver testdata tables.

Each function takes (spark, sf_dir) and returns a DataFrame; each has a
DuckDB oracle twin in __spark_entry__.oracle_sql(). These exercise the
operator families the reference engine needs (SURVEY.md §2.2-2.6):
filter/project, hash joins (broadcast + shuffle), partial+final hash
aggregation, window ranking / top-k, anti/semi joins, set ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style partial+final hash aggregation over lineitem.

    Filter pushes to the parquet scan; aggregation is map-side partial —
    at 100 TB this is a scan + one shuffle of ~|groups| rows per partition.
    """
    li = load(spark, "lineitem", sf_dir)
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            # rounded in BOTH engines: double accumulation order differs
            # across engines/partitionings, a strict value-hash needs a
            # fixed-point surface
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                           AS sum_qty,
       round(sum(l_extendedprice), 2)                      AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)   AS sum_disc_price,
       round(avg(l_quantity), 6)                           AS avg_qty,
       round(avg(l_extendedprice), 6)                      AS avg_price,
       round(avg(l_discount), 6)                           AS avg_disc,
       count(*)                                            AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join (customer ⋈ orders ⋈ lineitem) + agg + top-k.

    customer is broadcast (small dim); orders⋈lineitem shuffles on
    orderkey. TakeOrderedAndProject caps the result driver-side.
    """
    cust = load(spark, "customer", sf_dir).filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, "orders", sf_dir).filter(
        F.col("o_orderdate") < F.lit("1995-03-15")
    )
    li = load(spark, "lineitem", sf_dir).filter(
        F.col("l_shipdate") > F.lit("1995-03-15")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


Q3_SQL = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15'
  AND l_shipdate  > TIMESTAMP '1995-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


def top_orders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window ranking / per-group top-k (reference analogue: top pages by
    E-E-A-T score, web/static/plugins/e-e-a-t.js:372)."""
    cust = load(spark, "customer", sf_dir)
    orders = load(spark, "orders", sf_dir)
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("c_mktsegment", "o_orderkey", "o_totalprice", "rnk")
        .orderBy("c_mktsegment", "rnk")
    )


TOP_ORDERS_SQL = """
SELECT c_mktsegment, o_orderkey, o_totalprice, rnk
FROM (
  SELECT c_mktsegment, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
  FROM orders JOIN customer ON o_custkey = c_custkey
) t
WHERE rnk <= 3
ORDER BY c_mktsegment, rnk
"""


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join — the seen-set membership pattern
    (reference: src/core/link_manager.py:48-55 set-membership gate)."""
    cust = load(spark, "customer", sf_dir)
    orders = load(spark, "orders", sf_dir)
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


CUSTOMERS_WITHOUT_ORDERS_SQL = """
SELECT c_custkey, c_name
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
ORDER BY c_custkey
"""


def nations_with_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (membership keep-side)."""
    nation = load(spark, "nation", sf_dir)
    cust = load(spark, "customer", sf_dir)
    return (
        nation.join(cust, nation.n_nationkey == cust.c_nationkey, "left_semi")
        .select("n_nationkey", "n_name")
        .orderBy("n_nationkey")
    )


NATIONS_WITH_CUSTOMERS_SQL = """
SELECT n_nationkey, n_name
FROM nation
WHERE n_nationkey IN (SELECT c_nationkey FROM customer)
ORDER BY n_nationkey
"""


def order_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram + share-of-total via window over aggregate — the
    status-code histogram semantics (reference: web/static/js/app.js:
    1285-1355: count per code, pct of total, sorted ascending)."""
    orders = load(spark, "orders", sf_dir)
    agg = orders.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("cnt"))
    total = Window.partitionBy()
    return (
        agg.withColumn(
            "pct", F.round(F.col("cnt") * 100.0 / F.sum("cnt").over(total), 2)
        )
        .orderBy("o_orderpriority")
    )


ORDER_PRIORITY_COUNTS_SQL = """
SELECT o_orderpriority, count(*) AS cnt,
       round(count(*) * 100.0 / sum(count(*)) OVER (), 2) AS pct
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def multi_filter_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Many conditional counts in ONE pass (reference: app.js:1241-1283
    computes internal/external/2xx..5xx/html/css/js/image counters in a
    single scan) — here over orders: one agg, no re-scans."""
    orders = load(spark, "orders", sf_dir)
    return orders.agg(
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("n_f"),
        F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).alias("n_o"),
        F.sum(F.when(F.col("o_orderstatus") == "P", 1).otherwise(0)).alias("n_p"),
        F.sum(F.when(F.col("o_totalprice") > 100000.0, 1).otherwise(0)).alias("n_big"),
        F.count(F.lit(1)).alias("n_total"),
    )


# DuckDB promotes sum(INTEGER) to HUGEINT (int128); cast back to BIGINT
# so the driver's value-hash sees the same arrow type Spark emits.
MULTI_FILTER_COUNTS_SQL = """
SELECT sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)::BIGINT AS n_f,
       sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)::BIGINT AS n_o,
       sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END)::BIGINT AS n_p,
       sum(CASE WHEN o_totalprice > 100000.0 THEN 1 ELSE 0 END)::BIGINT AS n_big,
       count(*) AS n_total
FROM orders
"""


def part_cooccurrence(spark: SparkSession, sf_dir: str, k: int = 20) -> DataFrame:
    """Top-k co-occurring part pairs by order support — the
    market-basket self-join, the same shape a training pipeline uses
    for co-occurrence graphs (e.g. document/url co-citation for graph
    dedup). Scale plan: dedupe to distinct (order, part), self-join on
    the order key with a < b (pair work bounded by max basket size
    squared, like the Jaccard posting-list cap), map-side-combined
    support counts, TakeOrdered top-k — no global sort."""
    li = load(spark, "lineitem", sf_dir).select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    ).distinct()
    a = li.select("ok", F.col("pk").alias("a"))
    b = li.select("ok", F.col("pk").alias("b"))
    pairs = a.join(b, "ok").filter(F.col("a") < F.col("b"))
    return (
        pairs.groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("support"))
        .orderBy(F.desc("support"), "a", "b")
        .limit(k)
    )


PART_COOCCURRENCE_SQL = """
WITH d AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
pairs AS (
  SELECT x.pk AS a, y.pk AS b, count(*) AS support
  FROM d x JOIN d y ON x.ok = y.ok AND x.pk < y.pk
  GROUP BY x.pk, y.pk
)
SELECT a, b, support FROM pairs
ORDER BY support DESC, a, b LIMIT 20
"""
