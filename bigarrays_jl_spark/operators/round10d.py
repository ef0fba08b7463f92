"""Round-10 fourth batch: Pareto frontier (skyline), largest-remainder
allocation, and CUSUM change-point detection.

- q65_pareto_frontier: the 2D skyline query (minimize price, maximize
  size over ``part``).  The naive relational form is a NOT EXISTS
  dominance self-join — O(n²).  Here the value domain is compressed
  FIRST (groupBy price-cents → max size, map-side combinable), the
  frontier test is ONE running-max window over *distinct prices*
  (bounded domain, same trick as q64's weighted median), and the
  surviving (price, size) pairs broadcast back into the part scan.
- q66_allocation: largest-remainder (Hamilton) proration — each
  order's total is split across its lineitems proportionally in exact
  integer cents, flooring quotients and bumping the largest
  fractional remainders by 1 cent so every order's allocations sum to
  its total EXACTLY.  The financial-ledger shape: all windows are
  per-order (key-partitioned), all arithmetic integer.
- q68_cusum: change-point detection — per user, the running CUSUM of
  deviations from the global mean, flagging the first time |S| breaches
  a threshold.  Global mean is a broadcast scalar; the running sum
  accumulates in DECIMAL per the float canon so partitioned and
  windowed evaluation agree bit-for-bit with the oracle.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from bigarrays_jl_spark.operators.ordering import bucketed_running
from bigarrays_jl_spark.sources.tables import load

# --------------------------------------------------------------------------
# q65_pareto_frontier — parts Pareto-optimal on (price min, size max).
# A part is dominated iff another part is ≤ price AND ≥ size with at
# least one strict.  Equivalent domain-compressed test: let smax(c) be
# the max size at price c; a part (c, s) is on the frontier iff
# s == smax(c) AND smax(c) > max(smax(c') for all c' < c).
#
# Scale shape: the frontier scan runs over DISTINCT price points via
# bucketed_running (r13 — no single-partition window at all); the part
# table is touched by two scans, one map-side aggregate and one
# broadcast-join filter.  No self-join, no cartesian.
# --------------------------------------------------------------------------


def q65_pareto_frontier(spark: SparkSession, sf: str) -> DataFrame:
    p = load(spark, sf, "part").select(
        "p_partkey", "p_brand", "p_size",
        F.round(F.col("p_retailprice") * 100).cast("bigint")
         .alias("price_cents"))
    px = p.groupBy("price_cents").agg(F.max("p_size").alias("smax"))
    # r13 de-funnel: the running max over the distinct-price domain was
    # a whole-domain ORDER BY window (allowlisted) — now the two-level
    # bucketed running max; max is order-independent, so bit-identical
    fr = (bucketed_running(px, "price_cents",
                           [("m_lt", "smax", "max", False)])
          .filter(F.col("smax") > F.coalesce(F.col("m_lt"), F.lit(-1)))
          .select(F.col("price_cents").alias("f_cents"),
                  F.col("smax").alias("f_smax")))
    return (p.join(F.broadcast(fr),
                   (F.col("price_cents") == F.col("f_cents"))
                   & (F.col("p_size") == F.col("f_smax")))
            .select("p_partkey", "p_brand", "price_cents", "p_size"))


Q65_SQL = """
WITH px AS (
  SELECT CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents,
         max(p_size) AS smax
  FROM part GROUP BY 1),
fr AS (
  SELECT price_cents, smax,
         max(smax) OVER (ORDER BY price_cents
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING) AS m_lt
  FROM px)
SELECT p.p_partkey, p.p_brand, f.price_cents, p.p_size
FROM part p
JOIN (SELECT price_cents, smax FROM fr
      WHERE smax > coalesce(m_lt, -1)) f
  ON CAST(round(p.p_retailprice * 100) AS BIGINT) = f.price_cents
 AND p.p_size = f.smax
"""


# --------------------------------------------------------------------------
# q66_allocation — largest-remainder proration.  For order total T
# (cents) and item weights e_i (cents, sum S): base_i = floor(T*e_i/S),
# deficit R = T - Σ base_i (0 ≤ R < n by construction), and the R
# items with the largest remainder (T*e_i) mod S — ties broken by line
# number — get one extra cent.  Σ alloc_i == T exactly, per order.
#
# Scale shape: one orderkey shuffle join + three per-order windows
# (weight sum, base sum, remainder rank) — every window key-partitioned,
# all arithmetic on BIGINTs (T ≤ ~6e7 cents × e ≤ ~1e7 cents < 2^63).
# --------------------------------------------------------------------------


def q66_allocation(spark: SparkSession, sf: str) -> DataFrame:
    # (l_orderkey, l_linenumber) is NOT unique in the synthetic data;
    # (orderkey, linenumber, partkey, suppkey, price, flag) is — the
    # remainder rank orders by the full tuple so the 1-cent bumps are a
    # deterministic total order on both engines.
    li = load(spark, sf, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("bigint")
         .alias("e"))
    o = load(spark, sf, "orders").select(
        F.col("o_orderkey"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("t"))
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"]).drop("o_orderkey")
    ws = Window.partitionBy("l_orderkey")
    j = (j.withColumn("s", F.sum("e").over(ws))
         .withColumn("num", F.col("t") * F.col("e"))
         .withColumn("base", F.expr("num div s"))
         .withColumn("rem", F.expr("num % s")))
    wr = (Window.partitionBy("l_orderkey")
          .orderBy(F.desc("rem"), "l_linenumber", "l_partkey",
                   "l_suppkey", "e", "l_returnflag"))
    j = (j.withColumn("rn", F.row_number().over(wr))
         .withColumn("deficit", F.col("t") - F.sum("base").over(ws))
         .withColumn("alloc", F.col("base")
                     + F.when(F.col("rn") <= F.col("deficit"), 1)
                        .otherwise(0)))
    return (j.groupBy("l_returnflag")
            .agg(F.sum("alloc").alias("allocated_cents"),
                 F.sum(F.when(F.col("rn") <= F.col("deficit"), 1)
                        .otherwise(0)).alias("n_bumped"),
                 F.count("*").alias("n_items")))


Q66_SQL = """
WITH j AS (
  SELECT l.l_orderkey, l.l_linenumber, l.l_partkey, l.l_suppkey,
         l.l_returnflag,
         CAST(round(l.l_extendedprice * 100) AS BIGINT) AS e,
         CAST(round(o.o_totalprice * 100) AS BIGINT) AS t
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
b AS (
  SELECT *, sum(e) OVER (PARTITION BY l_orderkey) AS s,
         t * e AS num
  FROM j),
c AS (
  SELECT *, num // s AS base, num % s AS rem FROM b),
d AS (
  SELECT *,
         row_number() OVER (PARTITION BY l_orderkey
                            ORDER BY rem DESC, l_linenumber, l_partkey,
                                     l_suppkey, e, l_returnflag) AS rn,
         t - sum(base) OVER (PARTITION BY l_orderkey) AS deficit
  FROM c)
SELECT l_returnflag,
       sum(base + CASE WHEN rn <= deficit THEN 1 ELSE 0 END)
         AS allocated_cents,
       sum(CASE WHEN rn <= deficit THEN 1 ELSE 0 END) AS n_bumped,
       count(*) AS n_items
FROM d GROUP BY 1
"""


# --------------------------------------------------------------------------
# q68_cusum — control-chart change-point detection.  Per user, the
# running sum S_i of deviations (value − global mean) in event order;
# a user "breaches" at the first event where |S_i| > 500.  Output per
# user-id bucket: breaching-user count and exact total seconds from
# the user's first event to the breach.
#
# Scale shape: the global mean is one map-side-combined aggregate
# broadcast into the scan (no shuffle of the fact side for it); the
# running sum is a per-user rows-frame window (one user-keyed
# shuffle); deviations accumulate in DECIMAL(28,12) so the windowed
# running sum is exact — partitioning and engine cannot change it.
# --------------------------------------------------------------------------

CUSUM_THRESHOLD = 500


def q68_cusum(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events").filter(F.col("value").isNotNull()).select(
        "user_id", F.col("ts").cast("long").alias("t"), "event_id", "value")
    g = ev.agg(
        (F.sum(F.col("value").cast("decimal(28,12)")).cast("double")
         / F.count("*")).alias("mu"))
    w = (Window.partitionBy("user_id")
         .orderBy("t", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    dev = (ev.crossJoin(F.broadcast(g))
           .withColumn("d", (F.col("value") - F.col("mu"))
                       .cast("decimal(28,12)"))
           .withColumn("cusum", F.sum("d").over(w)))
    breach = (dev.filter(F.abs(F.col("cusum")) > CUSUM_THRESHOLD)
              .groupBy("user_id").agg(F.min("t").alias("bt")))
    first = ev.groupBy("user_id").agg(F.min("t").alias("t0"))
    return (breach.join(first, "user_id")
            .groupBy((F.col("user_id") % 10).alias("bucket"))
            .agg(F.count("*").alias("n_breached"),
                 F.sum(F.col("bt") - F.col("t0")).alias("sum_secs_to_breach")))


Q68_SQL = """
WITH ev AS (
  SELECT user_id, CAST(floor(epoch_us(ts)/1000000) AS BIGINT) AS t,
         event_id, value
  FROM events WHERE value IS NOT NULL),
g AS (
  SELECT CAST(sum(CAST(value AS DECIMAL(28,12))) AS DOUBLE) / count(*)
           AS mu
  FROM ev),
dev AS (
  SELECT ev.*, CAST(ev.value - g.mu AS DECIMAL(28,12)) AS d
  FROM ev CROSS JOIN g),
cs AS (
  SELECT *, sum(d) OVER (PARTITION BY user_id ORDER BY t, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS cusum
  FROM dev),
breach AS (
  SELECT user_id, min(t) AS bt FROM cs WHERE abs(cusum) > 500
  GROUP BY 1),
first AS (
  SELECT user_id, min(t) AS t0 FROM ev GROUP BY 1)
SELECT b.user_id % 10 AS bucket,
       count(*) AS n_breached,
       sum(b.bt - f.t0) AS sum_secs_to_breach
FROM breach b JOIN first f ON b.user_id = f.user_id
GROUP BY 1
"""


QUERIES = {
    "q65_pareto_frontier": q65_pareto_frontier,
    "q66_allocation": q66_allocation,
    "q68_cusum": q68_cusum,
}

ORACLES = {
    "q65_pareto_frontier": Q65_SQL,
    "q66_allocation": Q66_SQL,
    "q68_cusum": Q68_SQL,
}
