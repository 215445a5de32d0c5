"""Extended OLAP surface: cumulative windows, ROLLUP, set operations,
exact percentiles, native pivot, grouped COUNT(DISTINCT), CDC upsert.

These widen the catalog beyond the reference's own operator rows
(SURVEY.md §2) to the standard warehouse operations a lake deployment
of the same pipeline runs daily. Output policy follows
queries/relational.py: dates as 'yyyy-MM-dd' strings, money sums in
DECIMAL cast to DOUBLE, counts as BIGINT on both engines.

Scale notes per query are in each docstring; nothing here collects to
the driver, and every shuffle is keyed on the grouping/window keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_export_tool_spark.catalog import Catalog
from data_export_tool_spark.operators.sketch import exact_quantiles
from data_export_tool_spark.operators.upsert import merge_upsert
from data_export_tool_spark.queries import QuerySpec

DEC = "decimal(18,2)"


def _dstr(col) -> F.Column:
    return F.date_format(col, "yyyy-MM-dd")


# --------------------------------------------------------------------------
# q17 — running revenue per customer (cumulative window frame + LAG).
# One shuffle on o_custkey; both window functions share the single
# Exchange+Sort (same partitioning and ordering).
# --------------------------------------------------------------------------
def q17_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = Catalog(spark, sf_dir).load("orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        _dstr("o_orderdate").alias("o_orderdate"),
        F.sum(F.col("o_totalprice").cast(DEC))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double")
        .alias("running_total"),
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.row_number().over(w).alias("order_seq"),
    ).orderBy("o_custkey", "o_orderkey")


Q17_ORACLE = """
SELECT
  o_custkey,
  o_orderkey,
  STRFTIME(o_orderdate, '%Y-%m-%d') AS o_orderdate,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
         OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
               ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_total,
  LAG(o_totalprice) OVER (PARTITION BY o_custkey
                          ORDER BY o_orderdate ASC, o_orderkey ASC) AS prev_price,
  CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                          ORDER BY o_orderdate ASC, o_orderkey ASC) AS INT
  ) AS order_seq
FROM orders
ORDER BY o_custkey, o_orderkey
"""


# --------------------------------------------------------------------------
# q18 — ROLLUP revenue by region/nation with GROUPING flags. Spark
# evaluates rollup as one Expand + single hash aggregate — one shuffle,
# all three grouping levels in the same pass.
# --------------------------------------------------------------------------
def q18_rollup_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    joined = (
        cat.load("orders")
        .join(F.broadcast(cat.load("customer")), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cat.load("nation")), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(cat.load("region")), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
            F.grouping("r_name").cast("int").alias("g_region"),
            F.grouping("n_name").cast("int").alias("g_nation"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("r_name"),
            F.coalesce("n_name", F.lit("ALL")).alias("n_name"),
            "revenue",
            "n_orders",
            "g_region",
            "g_nation",
        )
        .orderBy("g_region", "g_nation", "r_name", "n_name")
    )


Q18_ORACLE = """
SELECT
  COALESCE(r_name, 'ALL') AS r_name,
  COALESCE(n_name, 'ALL') AS n_name,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
  COUNT(*) AS n_orders,
  CAST(GROUPING(r_name) AS INT) AS g_region,
  CAST(GROUPING(n_name) AS INT) AS g_nation
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
ORDER BY g_region, g_nation, r_name, n_name
"""


# --------------------------------------------------------------------------
# q19 — set operations on customer key sets:
# ((BUILDING ∪ ordered-in-1995) ∩ has-any-order) − negative-balance.
# Spark plans set-distinct ops as aggregates/joins on the key only —
# narrow shuffles of bigints.
# --------------------------------------------------------------------------
def q19_customer_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    cust = cat.load("customer")
    orders = cat.load("orders")
    a = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = (
        orders.filter(F.year("o_orderdate") == 1995)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    d = orders.select(F.col("o_custkey").alias("c_custkey"))
    c = cust.filter(F.col("c_acctbal") < 0).select("c_custkey")
    return a.union(b).distinct().intersect(d).subtract(c).orderBy("c_custkey")


Q19_ORACLE = """
SELECT c_custkey FROM (
  (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
   UNION
   SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1995)
  INTERSECT
  SELECT o_custkey FROM orders
  EXCEPT
  SELECT c_custkey FROM customer WHERE c_acctbal < 0
)
ORDER BY c_custkey
"""


# --------------------------------------------------------------------------
# q20 — exact interpolated percentiles per group (PERCENTILE_CONT
# semantics; DuckDB twin is quantile_cont). The exact tier: per-group
# sort of one double column — use the sketch tier
# (operators/sketch.approx_quantiles) when the column is 100 TB wide.
# --------------------------------------------------------------------------
def q20_price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).load("lineitem")
    q = exact_quantiles("l_extendedprice", (0.25, 0.5, 0.75, 0.9))
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(q[0], 4).alias("p25"),
            F.round(q[1], 4).alias("p50"),
            F.round(q[2], 4).alias("p75"),
            F.round(q[3], 4).alias("p90"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


Q20_ORACLE = """
SELECT
  l_returnflag,
  ROUND(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
  ROUND(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
  ROUND(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
  ROUND(quantile_cont(l_extendedprice, 0.90), 4) AS p90,
  COUNT(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# --------------------------------------------------------------------------
# q21 — daily active users: grouped exact COUNT(DISTINCT). Spark plans
# this as a two-phase aggregate (partial distinct per mapper, merge on
# the group key). The HLL tier for the 100 TB form is
# operators/sketch.approx_distinct — same plan shape, sketch-sized
# shuffle.
# --------------------------------------------------------------------------
def q21_daily_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).load("events")
    return (
        ev.groupBy(_dstr(F.col("ts")).alias("day"))
        .agg(
            F.count_distinct(F.col("user_id")).alias("dau"),
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct(F.col("event_type")).alias("n_types"),
        )
        .orderBy("day")
    )


Q21_ORACLE = """
SELECT STRFTIME(ts, '%Y-%m-%d') AS day,
       COUNT(DISTINCT user_id) AS dau,
       COUNT(*) AS n_events,
       COUNT(DISTINCT event_type) AS n_types
FROM events
GROUP BY 1
ORDER BY day
"""


# --------------------------------------------------------------------------
# q22 — native pivot (groupBy().pivot() with PINNED values — never let
# pivot scan for distinct values at 100 TB; an unpinned pivot runs an
# extra distinct job over the full table).
# --------------------------------------------------------------------------
_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_PRIORITY_ALIASES = ["p1_urgent", "p2_high", "p3_medium", "p4_not_specified", "p5_low"]


def q22_priority_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = Catalog(spark, sf_dir).load("orders")
    pv = (
        orders.groupBy("o_orderstatus")
        .pivot("o_orderpriority", _PRIORITIES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, subset=_PRIORITIES)
    )
    return pv.select(
        "o_orderstatus",
        *[
            F.col(f"`{v}`").alias(a)
            for v, a in zip(_PRIORITIES, _PRIORITY_ALIASES)
        ],
    ).orderBy("o_orderstatus")


Q22_ORACLE = """
SELECT
  o_orderstatus,
  CAST(COUNT(*) FILTER (o_orderpriority = '1-URGENT') AS BIGINT) AS p1_urgent,
  CAST(COUNT(*) FILTER (o_orderpriority = '2-HIGH') AS BIGINT) AS p2_high,
  CAST(COUNT(*) FILTER (o_orderpriority = '3-MEDIUM') AS BIGINT) AS p3_medium,
  CAST(COUNT(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS BIGINT)
      AS p4_not_specified,
  CAST(COUNT(*) FILTER (o_orderpriority = '5-LOW') AS BIGINT) AS p5_low
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


# --------------------------------------------------------------------------
# c01 — CDC merge (operators/upsert.merge_upsert): a deterministic
# changeset (price corrections for o_orderkey%7, new rows for %13) is
# merged into the orders snapshot; updates win, inserts append.
# --------------------------------------------------------------------------
def c01_orders_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = Catalog(spark, sf_dir).load("orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"
    )
    corrections = orders.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        F.lit("U").alias("o_orderstatus"),
        (F.col("o_totalprice") * F.lit(1.1)).alias("o_totalprice"),
        "o_orderdate",
    )
    inserts = orders.filter(F.col("o_orderkey") % 13 == 0).select(
        (F.col("o_orderkey") + F.lit(10_000_000)).alias("o_orderkey"),
        F.lit("N").alias("o_orderstatus"),
        "o_totalprice",
        "o_orderdate",
    )
    merged = merge_upsert(
        orders, corrections.unionByName(inserts), keys=["o_orderkey"]
    )
    return merged.select(
        "o_orderkey",
        "o_orderstatus",
        F.round("o_totalprice", 4).alias("o_totalprice"),
        _dstr("o_orderdate").alias("o_orderdate"),
    ).orderBy("o_orderkey")


C01_ORACLE = """
WITH changeset AS (
  SELECT o_orderkey, 'U' AS o_orderstatus, o_totalprice * 1.1 AS o_totalprice,
         o_orderdate
  FROM orders WHERE o_orderkey % 7 = 0
  UNION ALL
  SELECT o_orderkey + 10000000, 'N', o_totalprice, o_orderdate
  FROM orders WHERE o_orderkey % 13 = 0
),
unioned AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate, 0 AS is_upd
  FROM orders
  UNION ALL
  SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate, 1 AS is_upd
  FROM changeset
),
picked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey
                               ORDER BY is_upd DESC) AS rn
  FROM unioned
)
SELECT o_orderkey, o_orderstatus,
       ROUND(o_totalprice, 4) AS o_totalprice,
       STRFTIME(o_orderdate, '%Y-%m-%d') AS o_orderdate
FROM picked WHERE rn = 1
ORDER BY o_orderkey
"""


# q17 is folded into relational.q12_date_window_battery in the
# 50-entry consolidated catalog; the builder stays importable.
QUERIES = [
    QuerySpec("q18_rollup_sales", q18_rollup_sales, Q18_ORACLE, "A:rollup/grouping"),
    QuerySpec("q19_customer_set_ops", q19_customer_set_ops, Q19_ORACLE, "set-ops"),
    QuerySpec(
        "q20_price_percentiles", q20_price_percentiles, Q20_ORACLE, "A:percentile_cont"
    ),
    QuerySpec(
        "q21_daily_active_users", q21_daily_active_users, Q21_ORACLE, "A:count-distinct"
    ),
    QuerySpec("q22_priority_pivot", q22_priority_pivot, Q22_ORACLE, "A:native-pivot"),
    QuerySpec("c01_orders_upsert", c01_orders_upsert, C01_ORACLE, "cdc:merge-upsert"),
]
