"""Relational operator coverage — the reference's explicit negative space
(SURVEY.md §2.9: joins, grouping sets, windows, sorts/top-k, set ops),
built from stock PySpark primitives as the north star requires.

Decimal discipline: every money aggregate casts per-term to
DECIMAL(18,2) before SUM so results are associativity-exact and engine-
independent (double sums are not).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logfowd2_spark.plans.catalog import _sql, register


# --- TPC-H Q1-style aggregation (HashAggregate partial+final) ---------------

# Integer-domain money math: stored values have exactly 2 decimals, so
# ROUND(x*100) → exact cents; the discount product stays integral
# (cents × basis points).  Never CAST a *computed* double to DECIMAL:
# Spark rounds the double's shortest string repr (HALF_UP) while DuckDB
# rounds the exact binary value — one-cent divergence.
_Q1 = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_cents,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_price_cents,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS BIGINT) AS sum_disc_price_cbp,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", _Q1)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-aggregate groupBy; Spark does map-side partial aggregation so
    the shuffle carries (flag,status) cells, not rows."""
    return _sql(spark, sf_dir, _Q1, ["lineitem"])


# --- 3-way join + top-k ------------------------------------------------------

_Q3_BODY = """
SELECT o_orderkey,
       CAST(CAST(o_orderdate AS DATE) AS {str_t}) AS order_date,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_cbp
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY o_orderkey, o_orderdate
ORDER BY revenue_cbp DESC, o_orderkey
LIMIT 10
"""


@register("q3_topk_revenue", _Q3_BODY.format(str_t="VARCHAR"))
def q3_topk_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + agg + global top-k.  Spark's TakeOrderedAndProject keeps the
    'sort' at k rows per partition — no global sort materializes."""
    return _sql(spark, sf_dir, _Q3_BODY.format(str_t="STRING"),
                ["customer", "orders", "lineitem"])


# --- broadcast dimension join -----------------------------------------------

_ENRICH_ORACLE = """
SELECT r_name AS region_name, n_name AS nation_name,
       count(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) * 100 AS BIGINT) AS acctbal_total_cents
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY 1, 2
"""


@register("enrich_broadcast_join", _ENRICH_ORACLE)
def enrich_broadcast_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast hash join of two dimension tables onto the fact
    side — the same shape as the pipeline's pod-metadata enrichment
    (no shuffle of the big side; dims ship to every executor)."""
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    dim = F.broadcast(
        nation.join(F.broadcast(region),
                    nation["n_regionkey"] == region["r_regionkey"])
    )
    joined = customer.join(dim, customer["c_nationkey"] == dim["n_nationkey"])
    return joined.groupBy(
        F.col("r_name").alias("region_name"),
        F.col("n_name").alias("nation_name"),
    ).agg(
        F.count("*").alias("n_customers"),
        (F.sum(F.col("c_acctbal").cast("decimal(18,2)")) * 100)
        .cast("bigint")
        .alias("acctbal_total_cents"),
    )


# --- window functions ---------------------------------------------------------

_TOP3 = """
WITH ranked AS (
  SELECT o_orderpriority, o_orderkey,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_cents,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey) AS rnk
  FROM orders)
SELECT o_orderpriority, o_orderkey, price_cents, rnk
FROM ranked WHERE rnk <= 3
"""


@register("window_top3_per_group", _TOP3)
def window_top3_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window with deterministic tiebreak; partitioned window so
    no single-task funnel."""
    return _sql(spark, sf_dir, _TOP3, ["orders"])


_SESSIONIZE = """
WITH g AS (
  SELECT user_id, ts, event_id,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events)
SELECT user_id,
       count(*) AS n_events,
       CAST(1 + SUM(CASE WHEN prev IS NOT NULL
                     AND ({epoch_ts} - {epoch_prev}) > 1800
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
FROM g GROUP BY user_id
"""


@register(
    "window_sessionize",
    _SESSIONIZE.format(epoch_ts="CAST(floor(epoch(ts)) AS BIGINT)",
                       epoch_prev="CAST(floor(epoch(prev)) AS BIGINT)"),
)
def window_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via lag(): a 30-min-gap session counter per user —
    the batch analogue of a streaming session window."""
    return _sql(
        spark, sf_dir,
        _SESSIONIZE.format(
            epoch_ts="unix_timestamp(ts)", epoch_prev="unix_timestamp(prev)"
        ),
        ["events"],
    )


# --- semi / anti joins ---------------------------------------------------------

_SEMI_ANTI_ORACLE = """
WITH s AS (
  SELECT c_nationkey, count(*) AS customers_with_orders
  FROM customer
  WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
  GROUP BY c_nationkey),
a AS (
  SELECT c_nationkey, count(*) AS customers_without_urgent_orders
  FROM customer
  WHERE NOT EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey
                      AND o_orderpriority = '1-URGENT')
  GROUP BY c_nationkey)
SELECT COALESCE(s.c_nationkey, a.c_nationkey) AS c_nationkey,
       COALESCE(customers_with_orders, 0) AS customers_with_orders,
       COALESCE(customers_without_urgent_orders, 0)
         AS customers_without_urgent_orders
FROM s FULL OUTER JOIN a ON s.c_nationkey = a.c_nationkey
"""


@register("join_semi_anti_customers", _SEMI_ANTI_ORACLE)
def join_semi_anti_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI (customers with any order) and LEFT ANTI (customers
    with no urgent order) joins, their per-nation counts stitched with a
    FULL OUTER join — three join strategies, one oracle-checked result."""
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    semi = (
        customer.join(
            orders, customer["c_custkey"] == orders["o_custkey"], "left_semi"
        )
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("customers_with_orders"))
    )
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    anti = (
        customer.join(
            urgent, customer["c_custkey"] == urgent["o_custkey"], "left_anti"
        )
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("customers_without_urgent_orders"))
    )
    return (
        semi.withColumnRenamed("c_nationkey", "nk_s")
        .join(anti.withColumnRenamed("c_nationkey", "nk_a"),
              F.col("nk_s") == F.col("nk_a"), "full_outer")
        .select(
            F.coalesce("nk_s", "nk_a").alias("c_nationkey"),
            F.coalesce("customers_with_orders", F.lit(0))
            .alias("customers_with_orders"),
            F.coalesce("customers_without_urgent_orders", F.lit(0))
            .alias("customers_without_urgent_orders"),
        )
    )


# --- set operations --------------------------------------------------------------

_SET_OPS = """
SELECT 'except' AS op, custkey FROM (
  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
  EXCEPT
  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
) e
UNION ALL
SELECT 'intersect' AS op, custkey FROM (
  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
  INTERSECT
  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
) i
"""


@register("set_ops_custkeys", _SET_OPS)
def set_ops_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT and INTERSECT over the same operand pair, tag-unioned —
    one oracle row-set covering both set operators."""
    return _sql(spark, sf_dir, _SET_OPS, ["orders"])


# --- grouping sets / rollup --------------------------------------------------------

_ROLLUP = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS price_total_cents
FROM orders
GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
"""


@register("rollup_order_stats", _ROLLUP)
def rollup_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, _ROLLUP, ["orders"])


_CUBE = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n
FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)
"""


@register("cube_order_counts", _CUBE)
def cube_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, _CUBE, ["orders"])


# --- as-of join (via ordered window; the operator Spark lacks natively) -------

_ASOF = """
WITH u AS (
  SELECT user_id, ts, event_id, event_type FROM events
  WHERE event_type IN ('error', 'purchase')),
w AS (
  SELECT user_id, ts, event_id, event_type,
         max(CASE WHEN event_type = 'purchase' THEN ts END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS last_purchase_ts
  FROM u)
SELECT event_id, user_id,
       (last_purchase_ts IS NOT NULL) AS has_prior_purchase,
       CAST({epoch_ts} - {epoch_lp} AS BIGINT) AS secs_since_purchase
FROM w WHERE event_type = 'error'
"""


@register(
    "asof_join_last_purchase",
    _ASOF.format(epoch_ts="CAST(floor(epoch(ts)) AS BIGINT)",
                 epoch_lp="CAST(floor(epoch(last_purchase_ts)) AS BIGINT)"),
)
def asof_join_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (each error matched to the latest preceding purchase of
    the same user), composed from an ordered window over the union — the
    standard Spark formulation for an operator it lacks natively.  The
    window is keyed per user, so no global sort; at scale this is one
    shuffle on user_id."""
    return _sql(
        spark, sf_dir,
        _ASOF.format(epoch_ts="unix_timestamp(ts)",
                     epoch_lp="unix_timestamp(last_purchase_ts)"),
        ["events"],
    )


_GROUPING_SETS = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS price_cents
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


@register("grouping_sets_orders", _GROUPING_SETS)
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, _GROUPING_SETS, ["orders"])
