"""Deep multi-join TPC-H shapes (builder extension, SURVEY §2B
relational surface, round 8).

Three classic plan stress-tests the registry didn't yet cover:

- ``q47_region_supplier_volume`` — TPC-H Q5 shape: the six-table join
  chain lineitem ⋈ orders ⋈ customer ⋈ supplier ⋈ nation ⋈ region with
  the *local-supplier* equi-condition (customer and supplier in the
  same nation), a date-range filter on the fact scan, and per-nation
  revenue.  The dims (customer-side nation chain + supplier) broadcast;
  the only big shuffle is lineitem ⋈ orders.
- ``q48_nation_trade_flows`` — TPC-H Q7 shape: bilateral shipping
  volume between two fixed nations by year, via two separate nation
  aliases (supp_nation ≠ cust_nation in either direction).
- ``q49_market_share`` — TPC-H Q8 shape: the subject nation's supplier
  market share of one region's order volume by year (conditional
  decimal aggregation, unrounded share division).

Money sums go through the shared decimal-partials → double canon
(`relational._dsum2`): per-row cast to DECIMAL(18,6), exact decimal
accumulation (order-independent at any partitioning), round 2, double
output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigarrays_jl_spark.operators.relational import _dsum2
from bigarrays_jl_spark.sources.tables import load

Q47_REGION = "ASIA"
Q47_DATE_LO = "1996-01-01"
Q47_DATE_HI = "1998-01-01"

Q48_NATION_A = "NATION_18"
Q48_NATION_B = "NATION_19"


def q47_region_supplier_volume(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q5: revenue by nation from orders where the customer and
    the line's supplier share a nation inside one region."""
    r = load(spark, sf, "region").filter(F.col("r_name") == Q47_REGION)
    n = (load(spark, sf, "nation")
         .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
         .select("n_nationkey", "n_name"))
    c = (load(spark, sf, "customer")
         .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
         .select("c_custkey", "c_nationkey", "n_name"))
    s = load(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    o = (load(spark, sf, "orders")
         .filter((F.col("o_orderdate") >= Q47_DATE_LO)
                 & (F.col("o_orderdate") < Q47_DATE_HI))
         .select("o_orderkey", "o_custkey"))
    l = load(spark, sf, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    return (l.join(o, l.l_orderkey == o.o_orderkey)
             .join(F.broadcast(c), o.o_custkey == c.c_custkey)
             .join(F.broadcast(s), (l.l_suppkey == s.s_suppkey)
                   & (c.c_nationkey == s.s_nationkey))
             .groupBy("n_name")
             .agg(_dsum2(F.col("l_extendedprice")
                         * (1 - F.col("l_discount"))).alias("revenue"),
                  F.count("*").alias("n_lineitems")))


Q47_SQL = f"""
SELECT n_name,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
       count(*) AS n_lineitems
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = '{Q47_REGION}'
  AND o_orderdate >= TIMESTAMP '{Q47_DATE_LO}'
  AND o_orderdate <  TIMESTAMP '{Q47_DATE_HI}'
GROUP BY n_name
"""


def q48_nation_trade_flows(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q7: bilateral supplier→customer shipping volume between
    two nations, by ship year, both directions."""
    # pre-filter both nation dims to the two trading partners so the
    # inner joins PRUNE non-participating suppliers/customers before the
    # fact join (the post-join filter only removes the A→A / B→B pairs)
    pair = (Q48_NATION_A, Q48_NATION_B)
    n1 = (load(spark, sf, "nation").filter(F.col("n_name").isin(*pair))
          .select(F.col("n_nationkey").alias("sn_key"),
                  F.col("n_name").alias("supp_nation")))
    n2 = (load(spark, sf, "nation").filter(F.col("n_name").isin(*pair))
          .select(F.col("n_nationkey").alias("cn_key"),
                  F.col("n_name").alias("cust_nation")))
    s = load(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    c = load(spark, sf, "customer").select("c_custkey", "c_nationkey")
    o = load(spark, sf, "orders").select("o_orderkey", "o_custkey")
    l = load(spark, sf, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate",
        "l_extendedprice", "l_discount")
    both = (
        (F.col("supp_nation") == Q48_NATION_A)
        & (F.col("cust_nation") == Q48_NATION_B)
    ) | (
        (F.col("supp_nation") == Q48_NATION_B)
        & (F.col("cust_nation") == Q48_NATION_A)
    )
    s = s.join(F.broadcast(n1), s.s_nationkey == F.col("sn_key"))
    c = c.join(F.broadcast(n2), c.c_nationkey == F.col("cn_key"))
    return (l.join(o, l.l_orderkey == o.o_orderkey)
             .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
             .join(F.broadcast(c), o.o_custkey == c.c_custkey)
             .filter(both)
             .groupBy("supp_nation", "cust_nation",
                      F.year("l_shipdate").alias("ship_year"))
             .agg(_dsum2(F.col("l_extendedprice")
                         * (1 - F.col("l_discount"))).alias("volume"),
                  F.count("*").alias("n_lineitems")))


Q48_SQL = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INT) AS ship_year,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(18,6))), 2) AS DOUBLE) AS volume,
       count(*) AS n_lineitems
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = '{Q48_NATION_A}' AND n2.n_name = '{Q48_NATION_B}')
   OR (n1.n_name = '{Q48_NATION_B}' AND n2.n_name = '{Q48_NATION_A}')
GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
"""


Q49_NATION = "NATION_9"   # market-share subject (an ASIA nation)


def q49_market_share(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q8 shape: the subject nation's supplier market share of
    ASIA-customer order volume, by order year — conditional aggregation
    over the Q5-style join (share = subject revenue / all revenue,
    computed from decimal partials with ONE unrounded double division;
    a rounded share is the exact-tie class the parity canon forbids)."""
    r = load(spark, sf, "region").filter(F.col("r_name") == Q47_REGION)
    n = (load(spark, sf, "nation")
         .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
         .select("n_nationkey"))
    c = (load(spark, sf, "customer")
         .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
         .select("c_custkey"))
    sn = load(spark, sf, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    s = (load(spark, sf, "supplier")
         .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
         .select("s_suppkey", "supp_nation"))
    o = load(spark, sf, "orders").select("o_orderkey", "o_custkey",
                                         "o_orderdate")
    l = load(spark, sf, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))) \
        .cast("decimal(18,6)")
    subject = F.when(F.col("supp_nation") == Q49_NATION, rev) \
               .otherwise(F.lit(0).cast("decimal(18,6)"))
    return (l.join(o, l.l_orderkey == o.o_orderkey)
             .join(F.broadcast(c), o.o_custkey == c.c_custkey)
             .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
             .groupBy(F.year("o_orderdate").alias("order_year"))
             .agg(F.round(F.sum(rev), 2).cast("double").alias("total_rev"),
                  F.round(F.sum(subject), 2).cast("double")
                   .alias("subject_rev"),
                  (F.sum(subject).cast("double")
                   / F.sum(rev).cast("double")).alias("mkt_share")))


Q49_SQL = f"""
SELECT CAST(year(o_orderdate) AS INT) AS order_year,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_rev,
       CAST(round(sum(CASE WHEN n2.n_name = '{Q49_NATION}'
                           THEN CAST(l_extendedprice * (1 - l_discount)
                                     AS DECIMAL(18,6))
                           ELSE CAST(0 AS DECIMAL(18,6)) END), 2) AS DOUBLE)
         AS subject_rev,
       CAST(sum(CASE WHEN n2.n_name = '{Q49_NATION}'
                     THEN CAST(l_extendedprice * (1 - l_discount)
                               AS DECIMAL(18,6))
                     ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
         / CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(18,6))) AS DOUBLE) AS mkt_share
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region   ON n1.n_regionkey = r_regionkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE r_name = '{Q47_REGION}'
GROUP BY year(o_orderdate)
"""


QUERIES = {
    "q47_region_supplier_volume": q47_region_supplier_volume,
    "q48_nation_trade_flows": q48_nation_trade_flows,
    "q49_market_share": q49_market_share,
}

ORACLES = {
    "q47_region_supplier_volume": Q47_SQL,
    "q48_nation_trade_flows": Q48_SQL,
    "q49_market_share": Q49_SQL,
}
