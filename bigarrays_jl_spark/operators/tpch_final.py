"""TPC-H Q9 / Q16 plan shapes (builder extension, SURVEY §2B relational
surface, round 10) — the last two canonical TPC-H plan shapes without a
registry twin (r9 verdict task 5).

- ``q60_profit_by_nation_year`` — TPC-H Q9 shape: profit per
  (nation, order year) over the 5-table chain
  lineitem ⋈ part ⋈ supplier ⋈ nation ⋈ orders with a LIKE-filtered
  part — the classic join-order stressor.  The testdata has no
  partsupp, so supply cost derives from the part table
  (``COST_FACTOR × p_retailprice`` — deterministic, rides the same
  part join Q9's ps_supplycost rides via partsupp; same topology,
  same LIKE pushdown).  Spark side: the filtered part (with its cost
  column) and the supplier→nation dim broadcast into the lineitem
  scan; lineitem ⋈ orders is the one key-partitioned shuffle join;
  one final tiny hash agg on (nation, year).
- ``q61_supplier_part_counts`` — TPC-H Q16 shape: per
  (p_brand, p_type, p_size) the number of DISTINCT suppliers able to
  supply the part, with a brand/type/size cross-filter and a NOT IN
  subquery excluding blacklisted suppliers (TPC-H uses
  s_comment LIKE '%Complaints%'; the testdata has no s_comment, so
  negative account balance is the blacklist — same null-free NOT IN
  → broadcast anti-join plan).  The part↔supplier relation derives
  from lineitem (the repo's standing partsupp substitution,
  tpch_deep._elig_costs).

Float parity: Q9's profit is computed ENTIRELY in exact decimal
arithmetic on both engines — prices/discounts are 2-dec, quantities
integral, so every cast is exact, the per-row products are exact
decimals, and the sum is order-independent; one round(2)→double at the
output.  No IEEE op anywhere, so no ulp/tie risk (see
float-parity canon, relational._dsum2).  Q16 emits only counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigarrays_jl_spark.sources.tables import load

Q60_NAME_LIKE = "red"      # p_name token filter (testdata has no 'green')
Q60_COST_FACTOR = "0.6"    # supply cost = factor × p_retailprice

Q61_BRAND_NOT = "Brand#13"
Q61_TYPE_NOT = "PROMO"
Q61_SIZES = (1, 4, 9, 14, 19, 23, 36, 45)


def q60_profit_by_nation_year(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q9: profit by supplier nation × order year for parts whose
    name contains Q60_NAME_LIKE.

    profit = l_extendedprice·(1−l_discount) − cost_factor·p_retailprice·l_quantity,
    exact decimal per row: (12,2)×(3,2) and (12,2)×(2,1)×(3,0) products
    stay well inside both engines' 38-digit width with zero rounding.
    """
    p = (load(spark, sf, "part")
         .filter(F.col("p_name").contains(Q60_NAME_LIKE))
         .select("p_partkey",
                 (F.col("p_retailprice").cast("decimal(12,2)")
                  * F.lit(Q60_COST_FACTOR).cast("decimal(2,1)"))
                 .alias("supply_cost")))
    s = (load(spark, sf, "supplier")
         .join(F.broadcast(load(spark, sf, "nation")),
               F.col("s_nationkey") == F.col("n_nationkey"))
         .select("s_suppkey", "n_name"))
    o = load(spark, sf, "orders").select(
        "o_orderkey", F.year("o_orderdate").alias("o_year"))
    l = load(spark, sf, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_discount")
    profit = (
        F.col("l_extendedprice").cast("decimal(12,2)")
        * (F.lit("1.00").cast("decimal(3,2)")
           - F.col("l_discount").cast("decimal(3,2)"))
        - F.col("supply_cost") * F.col("l_quantity").cast("decimal(3,0)"))
    return (l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
             .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
             .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
             .groupBy("n_name", "o_year")
             .agg(F.round(F.sum(profit), 2).cast("double").alias("profit")))


Q60_SQL = f"""
SELECT n_name, CAST(year(o_orderdate) AS INT) AS o_year,
       CAST(round(sum(
         CAST(l_extendedprice AS DECIMAL(12,2))
           * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))
         - CAST(p_retailprice AS DECIMAL(12,2)) * CAST({Q60_COST_FACTOR} AS DECIMAL(2,1))
           * CAST(l_quantity AS DECIMAL(3,0))
       ), 2) AS DOUBLE) AS profit
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
JOIN orders ON o_orderkey = l_orderkey
WHERE p_name LIKE '%{Q60_NAME_LIKE}%'
GROUP BY n_name, year(o_orderdate)
"""


def q61_supplier_part_counts(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q16: distinct supplier count per (brand, type, size) for a
    brand/type/size cross-filter, excluding blacklisted suppliers via
    the NOT IN subquery — expressed as the broadcast anti-join Catalyst
    rewrites a null-free NOT IN into."""
    blacklist = (load(spark, sf, "supplier")
                 .filter(F.col("s_acctbal") < 0)
                 .select("s_suppkey"))
    ps = (load(spark, sf, "lineitem")
          .select("l_partkey", "l_suppkey").distinct()
          .join(F.broadcast(blacklist),
                F.col("l_suppkey") == F.col("s_suppkey"), "left_anti"))
    p = (load(spark, sf, "part")
         .filter((F.col("p_brand") != Q61_BRAND_NOT)
                 & (~F.col("p_type").startswith(Q61_TYPE_NOT))
                 & (F.col("p_size").isin(*Q61_SIZES)))
         .select("p_partkey", "p_brand", "p_type", "p_size"))
    return (ps.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
              .groupBy("p_brand", "p_type", "p_size")
              .agg(F.countDistinct("l_suppkey").alias("supplier_cnt")))


Q61_SQL = f"""
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> '{Q61_BRAND_NOT}'
  AND p_type NOT LIKE '{Q61_TYPE_NOT}%'
  AND p_size IN {Q61_SIZES}
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


QUERIES = {
    "q60_profit_by_nation_year": q60_profit_by_nation_year,
    "q61_supplier_part_counts": q61_supplier_part_counts,
}

ORACLES = {
    "q60_profit_by_nation_year": Q60_SQL,
    "q61_supplier_part_counts": Q61_SQL,
}
