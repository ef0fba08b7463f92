"""TPC-H Q4 / Q6 / Q10 / Q12 / Q14 plan shapes (builder extension,
SURVEY §2B relational surface, round 11) — the last five canonical
TPC-H shapes without a registry twin (r10 verdict task 5).  After this
module every one of the 22 TPC-H plan shapes has a registry entry.

Testdata substitutions (schema lacks l_commitdate / l_receiptdate /
l_shipmode / partsupp — same policy as tpch_deep / tpch_final):

- ``q92`` — TPC-H Q4 shape: order-priority count over a quarter of
  orders WHERE EXISTS a late lineitem.  "Late" is l_shipdate more than
  LATE_DAYS after o_orderdate (the schema's only commit/receipt
  analog).  Spark side: the EXISTS compiles to a LEFT SEMI shuffle
  join on o_orderkey with the non-equi lateness residual — exactly the
  plan TPC-H Q4 wants (semi join, never a count-changing inner join).
- ``q93`` — TPC-H Q6 shape: the pure filter-aggregate revenue-delta
  query; THE predicate-pushdown benchmark.  One scan, every filter
  pushed to parquet, map-side partial agg, single-row result.
- ``q94`` — TPC-H Q10 shape: top-20 customers by returned-item
  revenue over a quarter.  lineitem(l_returnflag='R') ⋈ orders is the
  one key-partitioned shuffle; customer⋈nation broadcasts; final
  TakeOrderedAndProject(20) so only 20 rows/partition reach the driver.
- ``q95`` — TPC-H Q12 shape: conditional priority counts per shipping
  class.  l_returnflag ('A'/'R') stands in for l_shipmode
  ('MAIL'/'SHIP') and a shipdate year for the receiptdate year; the
  CASE-inside-SUM conditional aggregation over the orders⋈lineitem
  join is the graded shape.
- ``q96`` — TPC-H Q14 shape: promo revenue share for one shipdate
  month — two conditional decimal sums over lineitem ⋈ broadcast(part)
  and ONE final IEEE division (exact decimal numerator/denominator, so
  the quotient is bit-identical across engines).

Float parity: all money math follows the float-parity canon
(relational._dsum2): per-row cast to exact decimal, decimal products,
order-independent decimal SUM, one round→double at the output.  Q14's
share divides two exact decimals as doubles — a single IEEE op with
deterministic operands.

Reference provenance: the reference engine has no relational surface
(it is a chunked-array store, src/BigArrays.jl:1-60); these queries are
driver-mandated §2B extensions graded against the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigarrays_jl_spark.operators.relational import _dsum2
from bigarrays_jl_spark.sources.tables import load

Q92_DATE_LO, Q92_DATE_HI = "1996-07-01", "1996-10-01"   # one quarter
Q92_LATE_DAYS = 30
Q93_DATE_LO, Q93_DATE_HI = "1996-01-01", "1997-01-01"   # one year
Q93_DISC_LO, Q93_DISC_HI = 0.05, 0.07
Q93_QTY_MAX = 24
Q94_DATE_LO, Q94_DATE_HI = "1996-10-01", "1997-01-01"   # one quarter
Q95_DATE_LO, Q95_DATE_HI = "1996-01-01", "1997-01-01"   # one year
Q95_FLAGS = ("A", "R")                                  # shipmode stand-in
Q95_HIGH = ("1-URGENT", "2-HIGH")
Q96_DATE_LO, Q96_DATE_HI = "1996-09-01", "1996-10-01"   # one month


def q92_priority_count(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q4: orders per priority in a quarter where at least one
    lineitem shipped more than LATE_DAYS after the order date.

    Scale: the semi join shuffles both sides on orderkey once; the
    orders date filter is pushed to the scan so only the quarter's keys
    shuffle.  Semi join (not inner+distinct) keeps the plan
    duplicate-free without a second aggregation.
    """
    o = (load(spark, sf, "orders")
         .filter((F.col("o_orderdate") >= F.lit(Q92_DATE_LO))
                 & (F.col("o_orderdate") < F.lit(Q92_DATE_HI)))
         .select("o_orderkey", "o_orderdate", "o_orderpriority"))
    l = load(spark, sf, "lineitem").select("l_orderkey", "l_shipdate")
    # timestamp-preserving add (date_add would truncate o_orderdate to
    # DATE while the oracle adds INTERVAL to the full timestamp — they
    # diverge the moment an order carries a non-midnight time-of-day)
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate")
        + F.expr(f"INTERVAL {Q92_LATE_DAYS} DAYS"))
    return (o.join(l, late, "left_semi")
             .groupBy("o_orderpriority")
             .agg(F.count(F.lit(1)).alias("order_count")))


Q92_SQL = f"""
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '{Q92_DATE_LO}'
  AND o_orderdate <  TIMESTAMP '{Q92_DATE_HI}'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL {Q92_LATE_DAYS} DAY)
GROUP BY o_orderpriority
"""


def q93_revenue_delta(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q6: forecast revenue change — one filtered scan, one sum.

    Scale: the year/discount/quantity predicates all reach the parquet
    scan (plan-pinned in tests/test_plans.py); partial aggregation
    means one double per task crosses the shuffle.  revenue =
    Σ l_extendedprice·l_discount in exact decimal.
    """
    l = (load(spark, sf, "lineitem")
         .filter((F.col("l_shipdate") >= F.lit(Q93_DATE_LO))
                 & (F.col("l_shipdate") < F.lit(Q93_DATE_HI))
                 & (F.col("l_discount") >= Q93_DISC_LO)
                 & (F.col("l_discount") <= Q93_DISC_HI)
                 & (F.col("l_quantity") < Q93_QTY_MAX)))
    return l.agg(
        _dsum2(F.col("l_extendedprice") * F.col("l_discount"))
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"))


Q93_SQL = f"""
SELECT CAST(round(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))), 2)
            AS DOUBLE) AS revenue,
       count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{Q93_DATE_LO}'
  AND l_shipdate <  TIMESTAMP '{Q93_DATE_HI}'
  AND l_discount BETWEEN {Q93_DISC_LO} AND {Q93_DISC_HI}
  AND l_quantity < {Q93_QTY_MAX}
"""


def q94_returned_item_top20(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q10: the 20 customers with the highest returned-item
    revenue for orders placed in one quarter.

    Scale: lineitem('R') ⋈ orders(quarter) shuffles on orderkey once —
    both filters pushed, so only the quarter's returned lines move;
    customer and nation broadcast; the revenue agg shuffles on custkey;
    the sort is TakeOrderedAndProject (k=20 per partition, never a
    global sort).  custkey tie-break keeps the row set deterministic.
    """
    l = (load(spark, sf, "lineitem")
         .filter(F.col("l_returnflag") == "R")
         .select("l_orderkey", "l_extendedprice", "l_discount"))
    o = (load(spark, sf, "orders")
         .filter((F.col("o_orderdate") >= F.lit(Q94_DATE_LO))
                 & (F.col("o_orderdate") < F.lit(Q94_DATE_HI)))
         .select("o_orderkey", "o_custkey"))
    c = (load(spark, sf, "customer")
         .join(F.broadcast(load(spark, sf, "nation")),
               F.col("c_nationkey") == F.col("n_nationkey"))
         .select("c_custkey", "c_name", "c_acctbal", "n_name"))
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
             .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
             .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
             .agg(_dsum2(revenue).alias("revenue"))
             .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
             .limit(20))


Q94_SQL = f"""
SELECT c_custkey, c_name,
       CAST(c_acctbal AS DOUBLE) AS c_acctbal, n_name,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation   ON n_nationkey = c_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '{Q94_DATE_LO}'
  AND o_orderdate <  TIMESTAMP '{Q94_DATE_HI}'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def q95_priority_by_class(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q12: per shipping class (returnflag stand-in), how many
    lines belong to high- vs low-priority orders for one shipdate year.

    Scale: both scans filtered at the source; one orderkey shuffle
    join; the CASE folds into the partial aggregation so the final
    shuffle carries two BIGINTs per class.
    """
    l = (load(spark, sf, "lineitem")
         .filter(F.col("l_returnflag").isin(*Q95_FLAGS)
                 & (F.col("l_shipdate") >= F.lit(Q95_DATE_LO))
                 & (F.col("l_shipdate") < F.lit(Q95_DATE_HI)))
         .select("l_orderkey", "l_returnflag"))
    o = load(spark, sf, "orders").select("o_orderkey", "o_orderpriority")
    is_high = F.col("o_orderpriority").isin(*Q95_HIGH).cast("long")
    return (l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
             .groupBy("l_returnflag")
             .agg(F.sum(is_high).alias("high_line_count"),
                  F.sum(1 - is_high).alias("low_line_count")))


Q95_SQL = f"""
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN {Q95_HIGH}
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN {Q95_HIGH}
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON o_orderkey = l_orderkey
WHERE l_returnflag IN {Q95_FLAGS}
  AND l_shipdate >= TIMESTAMP '{Q95_DATE_LO}'
  AND l_shipdate <  TIMESTAMP '{Q95_DATE_HI}'
GROUP BY l_returnflag
"""


def q96_promo_share(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q14: percent of one month's revenue from PROMO parts.

    Scale: part broadcasts into the month-filtered lineitem scan; both
    conditional sums ride ONE partial aggregation (no second scan);
    the share is a single IEEE division of two exact decimals.
    """
    l = (load(spark, sf, "lineitem")
         .filter((F.col("l_shipdate") >= F.lit(Q96_DATE_LO))
                 & (F.col("l_shipdate") < F.lit(Q96_DATE_HI)))
         .select("l_partkey", "l_extendedprice", "l_discount"))
    p = load(spark, sf, "part").select("p_partkey", "p_type")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))
           ).cast("decimal(18,6)")
    promo_rev = F.when(F.col("p_type").startswith("PROMO"), rev) \
                 .otherwise(F.lit(0).cast("decimal(18,6)"))
    agg = (l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
            .agg(F.sum(promo_rev).alias("_promo"), F.sum(rev).alias("_all")))
    return agg.select(
        F.round(F.lit(100.0) * F.col("_promo").cast("double")
                / F.col("_all").cast("double"), 4).alias("promo_share"),
        F.round(F.col("_all"), 2).cast("double").alias("total_revenue"))


Q96_SQL = f"""
SELECT round(100.0 * CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
                     THEN CAST(l_extendedprice * (1 - l_discount)
                               AS DECIMAL(18,6))
                     ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
             / CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                             AS DECIMAL(18,6))) AS DOUBLE), 4)
         AS promo_share,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(18,6))), 2) AS DOUBLE)
         AS total_revenue
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE l_shipdate >= TIMESTAMP '{Q96_DATE_LO}'
  AND l_shipdate <  TIMESTAMP '{Q96_DATE_HI}'
"""


QUERIES = {
    "q92_priority_count": q92_priority_count,
    "q93_revenue_delta": q93_revenue_delta,
    "q94_returned_item_top20": q94_returned_item_top20,
    "q95_priority_by_class": q95_priority_by_class,
    "q96_promo_share": q96_promo_share,
}

ORACLES = {
    "q92_priority_count": Q92_SQL,
    "q93_revenue_delta": Q93_SQL,
    "q94_returned_item_top20": Q94_SQL,
    "q95_priority_by_class": Q95_SQL,
    "q96_promo_share": Q96_SQL,
}
