"""TPC-H Q13 / Q19 / Q20 plan shapes (builder extension, SURVEY §2B
relational surface, round 9).

The three classic stressors still unrepresented after tpch_deep
(Q2/Q15/Q18) and tpch_more (Q11/Q22):

- ``q55_order_count_dist`` — TPC-H Q13 shape: the OUTER-join
  aggregation.  Customers LEFT-joined to a filtered order class (the
  filter lives in the JOIN condition, not a WHERE — pushing it to
  WHERE would silently turn the outer join inner and drop the
  zero-order customers Q13 exists to count), per-customer
  ``count(o_orderkey)`` (NULL-skipping, so no-match customers count
  0), then the distribution of those counts.  Exact integers
  throughout — no float canon needed.
- ``q56_bracket_revenue`` — TPC-H Q19 shape: the DISJUNCTIVE
  predicate join.  part ⋈ lineitem under an OR of three
  (brand, size-range, quantity-range) brackets.  The planner test:
  Catalyst must extract the common ``p_partkey = l_partkey`` equi
  conjunct from the disjunction so the join stays hash-based with the
  brackets as a post-join residual — a naive planner nests loops.
  ``tests/test_round9_ops.py::test_tpch_shapes_plans`` pins no
  nested-loop/cartesian and that the part side broadcasts.
- ``q57_excess_stock_suppliers`` — TPC-H Q20 shape: the nested
  SEMI-join chain.  Suppliers semi-joined against per-(supplier, part)
  shipment aggregates that (a) semi-join a name-filtered part class
  and (b) exceed a correlated per-part threshold (window-period
  shipments > Q57_SHARE of the part's all-supplier total — the
  SF-invariant stand-in for Q20's ``ps_availqty > 0.5 * sum(qty)``;
  the testdata has no partsupp table, as in q50).  Two aggregates of
  the same fact slice joined per-part, then the supplier semi join.

Scale shape: q55 shuffles fact+dim on custkey once (both sides large —
no broadcast assumption), the count-distribution re-agg is
|customers|-bounded then type-cardinality-bounded.  q56 broadcasts the
filtered part dim into the fact scan.  q57's two aggregates share one
key-partitioned shuffle of the filtered fact; the supplier semi join
broadcasts the (small, thresholded) eligible-supplier set.

Float parity: q56 revenue via the _dsum2 decimal canon; q57's share
threshold compares double casts of exact decimal sums with the factor
multiplied on the SAME side in both engines (never rounded — a
tie-prone quotient never feeds round(), repo canon).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigarrays_jl_spark.operators.relational import _dsum2
from bigarrays_jl_spark.sources.tables import load

# q55: the order class whose absence Q13 counts (urgent orders only,
# so "customers with zero urgent orders" is a populated bucket)
Q55_PRIORITY = "1-URGENT"

# q56: three (brand, max size, quantity window) brackets — OR'd
Q56_BRACKETS = (("Brand#1", 5, 1, 11),
                ("Brand#2", 10, 10, 20),
                ("Brand#3", 15, 20, 30))

# q57: the part class and the correlated threshold share
Q57_NAME_PREFIX = "small"
Q57_FROM, Q57_TO = "1998-01-01", "2000-01-01"
# chosen against the testdata's win/total ratio distribution (p99 at
# sf0.01 ≈ 0.095, max ≈ 0.15) so the threshold prunes hard yet stays
# non-vacuous at every SF
Q57_SHARE = 0.09


def q55_order_count_dist(spark: SparkSession, sf: str) -> DataFrame:
    c = load(spark, sf, "customer").select("c_custkey")
    o = load(spark, sf, "orders").select("o_custkey", "o_orderkey",
                                         "o_orderpriority")
    per_cust = (c.join(o, (F.col("c_custkey") == F.col("o_custkey"))
                       & (F.col("o_orderpriority") == Q55_PRIORITY),
                       "left")
                 .groupBy("c_custkey")
                 .agg(F.count("o_orderkey").alias("c_count")))
    return (per_cust.groupBy("c_count")
            .agg(F.count("*").alias("custdist")))


Q55_SQL = f"""
WITH oc AS (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON o.o_custkey = c.c_custkey
   AND o.o_orderpriority = '{Q55_PRIORITY}'
  GROUP BY c.c_custkey)
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM oc GROUP BY c_count
"""


def _bracket_cond(qty_col, brand_col, size_col):
    cond = None
    for brand, max_size, qlo, qhi in Q56_BRACKETS:
        leg = ((brand_col == brand)
               & size_col.between(1, max_size)
               & qty_col.between(qlo, qhi))
        cond = leg if cond is None else (cond | leg)
    return cond


def q56_bracket_revenue(spark: SparkSession, sf: str) -> DataFrame:
    p = load(spark, sf, "part").select("p_partkey", "p_brand", "p_size")
    li = load(spark, sf, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    # the disjunction goes INTO the join condition, reference-style:
    # Catalyst extracts the common equi conjunct, the brackets become
    # the hash join's residual filter (plan-pinned)
    cond = (F.col("p_partkey") == F.col("l_partkey")) & _bracket_cond(
        F.col("l_quantity"), F.col("p_brand"), F.col("p_size"))
    return (li.join(F.broadcast(p), cond)
            .groupBy("p_brand")
            .agg(F.count("*").alias("n_lines"),
                 _dsum2(F.col("l_extendedprice")
                        * (1 - F.col("l_discount"))).alias("revenue")))


def _bracket_sql():
    legs = [f"(p_brand = '{b}' AND p_size BETWEEN 1 AND {s}"
            f" AND l_quantity BETWEEN {lo} AND {hi})"
            for b, s, lo, hi in Q56_BRACKETS]
    return "\n    OR ".join(legs)


Q56_SQL = f"""
SELECT p_brand, count(*) AS n_lines,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE {_bracket_sql()}
GROUP BY p_brand
"""


def q57_excess_stock_suppliers(spark: SparkSession, sf: str) -> DataFrame:
    parts = (load(spark, sf, "part")
             .filter(F.col("p_name").startswith(Q57_NAME_PREFIX))
             .select("p_partkey"))
    li = (load(spark, sf, "lineitem")
          .join(F.broadcast(parts),
                F.col("l_partkey") == F.col("p_partkey"))
          .select("l_partkey", "l_suppkey", "l_quantity", "l_shipdate"))
    # window-period shipments per (supplier, part) — exact decimal qty
    sp = (li.filter((F.col("l_shipdate") >= Q57_FROM)
                    & (F.col("l_shipdate") < Q57_TO))
          .groupBy("l_suppkey", "l_partkey")
          .agg(F.sum(F.col("l_quantity").cast("decimal(18,6)"))
               .alias("win_qty")))
    # correlated threshold: the part's ALL-supplier, all-time total
    tot = (li.groupBy("l_partkey")
           .agg(F.sum(F.col("l_quantity").cast("decimal(18,6)"))
                .alias("tot_qty"))
           .withColumnRenamed("l_partkey", "t_partkey"))
    elig = (sp.join(tot, sp.l_partkey == tot.t_partkey)
            .filter(F.col("win_qty").cast("double")
                    > Q57_SHARE * F.col("tot_qty").cast("double"))
            .select("l_suppkey").distinct())
    s = load(spark, sf, "supplier").select("s_suppkey", "s_name",
                                           "s_nationkey")
    return (s.join(F.broadcast(elig),
                   s.s_suppkey == elig.l_suppkey, "left_semi")
             .select("s_suppkey", "s_name", "s_nationkey"))


Q57_SQL = f"""
WITH li AS (
  SELECT l_partkey, l_suppkey, l_quantity, l_shipdate
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part
                      WHERE p_name LIKE '{Q57_NAME_PREFIX}%')),
sp AS (
  SELECT l_suppkey, l_partkey,
         sum(CAST(l_quantity AS DECIMAL(18,6))) AS win_qty
  FROM li
  WHERE l_shipdate >= '{Q57_FROM}' AND l_shipdate < '{Q57_TO}'
  GROUP BY l_suppkey, l_partkey),
tot AS (
  SELECT l_partkey, sum(CAST(l_quantity AS DECIMAL(18,6))) AS tot_qty
  FROM li GROUP BY l_partkey)
SELECT s_suppkey, s_name, s_nationkey
FROM supplier
WHERE s_suppkey IN (
  SELECT sp.l_suppkey FROM sp JOIN tot ON sp.l_partkey = tot.l_partkey
  WHERE CAST(sp.win_qty AS DOUBLE)
        > {Q57_SHARE} * CAST(tot.tot_qty AS DOUBLE))
"""


QUERIES = {
    "q55_order_count_dist": q55_order_count_dist,
    "q56_bracket_revenue": q56_bracket_revenue,
    "q57_excess_stock_suppliers": q57_excess_stock_suppliers,
}

ORACLES = {
    "q55_order_count_dist": Q55_SQL,
    "q56_bracket_revenue": Q56_SQL,
    "q57_excess_stock_suppliers": Q57_SQL,
}
