"""Relational operator inventory (SURVEY §2B) over the TPC-H-ish testdata.

Every query here exists twice: a DataFrame-API implementation in
``QUERIES`` and an ANSI-SQL oracle in ``ORACLES`` that DuckDB runs on the
same parquet — the driver's t2 correctness gate.  Conventions that make
the hash-compare deterministic:

- every computed column is aliased identically on both sides;
- floating aggregates are ``round(CAST(… AS DOUBLE), n)`` on both sides
  (same fold order where order matters, e.g. running windows);
- integer sums are cast to BIGINT (DuckDB's SUM(int) is HUGEINT);
- top-k queries carry a unique tie-break key so row sets are stable.

Scale notes are attached per query: which side broadcasts, where the
shuffle lands, why the plan survives 100×.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from bigarrays_jl_spark.sources.tables import fan_out, load, register_views


def _r2(c):  # round-to-2 canonical double
    return F.round(c.cast("double"), 2)


def _dsum2(c):
    """Order-independent money sum: per-row cast to decimal(18,6) (the
    double→decimal rounding is deterministic and engine-identical), then
    EXACT decimal accumulation — immune to the fold-order half-cent
    flips a double sum hits at scale — rounded to 2 and returned as
    double for the output schema.  SQL twin:
    CAST(round(sum(CAST(x AS DECIMAL(18,6))), 2) AS DOUBLE)."""
    return F.round(F.sum(c.cast("decimal(18,6)")), 2).cast("double")


def _davg2(c):
    """Order-independent mean: exact decimal sum → double, one IEEE
    division by the count, round 2.  SQL twin:
    round(CAST(sum(CAST(x AS DECIMAL(18,6))) AS DOUBLE) / count(x), 2)."""
    return F.round(F.sum(c.cast("decimal(18,6)")).cast("double") / F.count(c), 2)


# --------------------------------------------------------------------------
# q01 — TPC-H Q1 pricing summary: the canonical wide aggregation.
# Scale: single hash-agg shuffle on 2 low-cardinality keys; partial
# (map-side) aggregation makes the shuffle O(groups × partitions).
# --------------------------------------------------------------------------

def q01_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    # fan_out: the testdata arrives as ONE split (single row group), so
    # the 8-way decimal partial aggregation — q01's dominant cost —
    # ran single-threaded (guide §2.5 "input skew: one unsplittable
    # file").  The guard repartition parallelizes it; decimal sums are
    # order-independent so partitioning is value-invisible.  A/B at
    # sf0.1: 2.67 → 1.72 s; the sibling scan-light queries (q03, q07,
    # q13, q22) A/B-measured SLOWER with the same treatment (their map
    # stages are cheap scans — the shuffle would cost more than it
    # buys) and deliberately keep the plain scan.  On a multi-split
    # cluster source fan_out is a no-op guard.
    l = fan_out(spark, load(spark, sf, "lineitem")
                .filter(F.col("l_shipdate") <= F.lit("1998-09-02")))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (l.groupBy("l_returnflag", "l_linestatus").agg(
        _dsum2(F.col("l_quantity")).alias("sum_qty"),
        _dsum2(F.col("l_extendedprice")).alias("sum_base_price"),
        _dsum2(disc_price).alias("sum_disc_price"),
        _dsum2(charge).alias("sum_charge"),
        _davg2(F.col("l_quantity")).alias("avg_qty"),
        _davg2(F.col("l_extendedprice")).alias("avg_price"),
        _davg2(F.col("l_discount")).alias("avg_disc"),
        F.count("*").alias("count_order")))


Q01_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(round(sum(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE)      AS sum_qty,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_base_price,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_disc_price,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_charge,
       round(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / count(l_quantity), 2)      AS avg_qty,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / count(l_extendedprice), 2) AS avg_price,
       round(CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / count(l_discount), 2)      AS avg_disc,
       count(*)                                                              AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# q02 — projection + predicate pushdown: both the filter and the 4-column
# projection reach the parquet scan (check .explain → PushedFilters).
# --------------------------------------------------------------------------

def q02_filter_project(spark: SparkSession, sf: str) -> DataFrame:
    p = load(spark, sf, "part")
    return (p.filter((F.col("p_size").between(5, 20)) & (F.col("p_type") == "ECONOMY"))
            .select("p_partkey", F.upper("p_name").alias("p_name_up"),
                    "p_size", _r2(F.col("p_retailprice") * 1.1).alias("price_up")))


Q02_SQL = """
SELECT p_partkey, upper(p_name) AS p_name_up, p_size,
       round(CAST(p_retailprice * 1.1 AS DOUBLE), 2) AS price_up
FROM part WHERE p_size BETWEEN 5 AND 20 AND p_type = 'ECONOMY'
"""


# --------------------------------------------------------------------------
# q03 — 3-way join + aggregation (TPC-H Q3 family).
# Scale: customer is the small side at any SF ratio → broadcast; the
# orders⋈lineitem equi-join shuffles on l_orderkey (the natural key,
# uniform) and AQE coalesces post-shuffle partitions.
# --------------------------------------------------------------------------

def q03_join_revenue(spark: SparkSession, sf: str) -> DataFrame:
    c = load(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf, "orders")
    l = load(spark, sf, "lineitem")
    return (l.join(o, l.l_orderkey == o.o_orderkey)
             .join(F.broadcast(c), o.o_custkey == c.c_custkey)
             .groupBy("c_custkey", "c_name")
             .agg(_dsum2(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                  .alias("revenue"),
                  F.count("*").alias("n_items")))


Q03_SQL = """
SELECT c_custkey, c_name,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY c_custkey, c_name
"""


# --------------------------------------------------------------------------
# q04 — star-schema dim chain: supplier→nation→region, both dims broadcast
# (classic map-side star join; zero shuffle until the final tiny agg).
# --------------------------------------------------------------------------

def q04_star_dims(spark: SparkSession, sf: str) -> DataFrame:
    s = load(spark, sf, "supplier")
    n = load(spark, sf, "nation")
    r = load(spark, sf, "region")
    return (s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
             .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
             .groupBy("r_name")
             .agg(F.count("*").alias("n_suppliers"),
                  _dsum2(F.col("s_acctbal")).alias("total_bal")))


Q04_SQL = """
SELECT r_name, count(*) AS n_suppliers,
       CAST(round(sum(CAST(s_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_bal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


# --------------------------------------------------------------------------
# q05 — left-semi join (EXISTS): customers that placed a high-value order.
# Scale: semi-join short-circuits — only the key column of orders shuffles.
# --------------------------------------------------------------------------

def q05_semi_join(spark: SparkSession, sf: str) -> DataFrame:
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders").filter(F.col("o_totalprice") > 400000)
    return (c.join(o, c.c_custkey == o.o_custkey, "left_semi")
             .groupBy("c_mktsegment")
             .agg(F.count("*").alias("n_customers"),
                  _davg2(F.col("c_acctbal")).alias("avg_bal")))


Q05_SQL = """
SELECT c_mktsegment, count(*) AS n_customers,
       round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) / count(c_acctbal), 2) AS avg_bal
FROM customer WHERE EXISTS (
  SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)
GROUP BY c_mktsegment
"""


# --------------------------------------------------------------------------
# q06 — left-anti join (NOT EXISTS): customers with no orders at all.
# --------------------------------------------------------------------------

def q06_anti_join(spark: SparkSession, sf: str) -> DataFrame:
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders")
    return (c.join(o, c.c_custkey == o.o_custkey, "left_anti")
             .select("c_custkey", "c_name", "c_mktsegment"))


Q06_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer WHERE NOT EXISTS (
  SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


# --------------------------------------------------------------------------
# q07 — window rank: top-3 orders per customer by price (rank, so ties
# are value-determined on both engines).
# Scale: one shuffle on o_custkey; skew-safe (custkey near-uniform).
# --------------------------------------------------------------------------

def q07_window_rank(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(),
                                           F.col("o_orderkey"))
    return (o.withColumn("rk", F.row_number().over(w))
             .filter(F.col("rk") <= 3)
             .select("o_custkey", "o_orderkey", _r2(F.col("o_totalprice")).alias("price"), "rk"))


Q07_SQL = """
SELECT o_custkey, o_orderkey, round(CAST(o_totalprice AS DOUBLE), 2) AS price, rk
FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
                                   ORDER BY o_totalprice DESC, o_orderkey) AS rk
      FROM orders) WHERE rk <= 3
"""


# --------------------------------------------------------------------------
# q08 — running window frame over the events table: per-user running sum.
# Fold order is fixed by (ts, event_id) so doubles match bit-for-bit.
# --------------------------------------------------------------------------

def q08_window_running(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "events").filter(F.col("user_id") < 50)
    w = (W.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(W.unboundedPreceding, W.currentRow))
    return (e.select("user_id", "event_id",
                     _r2(F.sum("value").over(w)).alias("running_value"),
                     F.lag("event_type", 1).over(
                         W.partitionBy("user_id").orderBy("ts", "event_id"))
                     .alias("prev_type")))


Q08_SQL = """
SELECT user_id, event_id,
       round(CAST(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 2)
         AS running_value,
       lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
         AS prev_type
FROM events WHERE user_id < 50
"""


# --------------------------------------------------------------------------
# q09 — ROLLUP over the dim hierarchy region→nation.
# --------------------------------------------------------------------------

def q09_rollup(spark: SparkSession, sf: str) -> DataFrame:
    c = load(spark, sf, "customer")
    n = load(spark, sf, "nation")
    r = load(spark, sf, "region")
    joined = (c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
               .join(F.broadcast(r), n.n_regionkey == r.r_regionkey))
    return (joined.rollup("r_name", "n_name")
            .agg(F.count("*").alias("n_customers"),
                 _dsum2(F.col("c_acctbal")).alias("total_bal")))


Q09_SQL = """
SELECT r_name, n_name, count(*) AS n_customers,
       CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_bal
FROM customer JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


# --------------------------------------------------------------------------
# q10 — CUBE over orders status × priority.
# --------------------------------------------------------------------------

def q10_cube(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders")
    return (o.cube("o_orderstatus", "o_orderpriority")
             .agg(F.count("*").alias("n_orders"),
                  _dsum2(F.col("o_totalprice")).alias("total_price")))


Q10_SQL = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_price
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


# --------------------------------------------------------------------------
# q11 — global top-k with deterministic tie-break.
# Scale: Spark's TakeOrderedAndProject — per-partition heap + driver merge
# of k rows; no full sort, no full shuffle.
# --------------------------------------------------------------------------

def q11_topk(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders")
    return (o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
             .limit(10)
             .select("o_orderkey", "o_custkey", _r2(F.col("o_totalprice")).alias("price")))


Q11_SQL = """
SELECT o_orderkey, o_custkey, round(CAST(o_totalprice AS DOUBLE), 2) AS price
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


# --------------------------------------------------------------------------
# q12 — set operations: (BUILDING ∪ MACHINERY) \ (negative balance).
# --------------------------------------------------------------------------

def q12_setops(spark: SparkSession, sf: str) -> DataFrame:
    c = load(spark, sf, "customer")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    machinery = c.filter(F.col("c_mktsegment") == "MACHINERY").select("c_custkey")
    negative = c.filter(F.col("c_acctbal") < 0).select("c_custkey")
    return building.union(machinery).distinct().subtract(negative)


Q12_SQL = """
(SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
 UNION
 SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
EXCEPT
SELECT c_custkey FROM customer WHERE c_acctbal < 0
"""


# --------------------------------------------------------------------------
# q41 — bag-semantics set ops: EXCEPT ALL / INTERSECT ALL preserve
# multiplicities (q12 covers the DISTINCT forms).  Spark plans both as
# a hash aggregation on the value carrying per-side counts, then
# re-generates min/difference copies — one shuffle per operand pair,
# no sort, same shape DuckDB uses.
# Scale shape: cost is O(distinct values) after the map-side partial
# count, not O(rows); skew on a hot value lands on one reducer only
# for that value's count row, never its raw rows.
# --------------------------------------------------------------------------

def q41_setops_all(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    ex = a.exceptAll(b).withColumn("op", F.lit("except_all"))
    ix = a.intersectAll(b).withColumn("op", F.lit("intersect_all"))
    return ex.unionByName(ix).select("op", "o_custkey")


Q41_SQL = """
SELECT 'except_all' AS op, o_custkey FROM (
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
  EXCEPT ALL
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
UNION ALL
SELECT 'intersect_all' AS op, o_custkey FROM (
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
  INTERSECT ALL
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
"""


# --------------------------------------------------------------------------
# q13 — distinct aggregates (exact; the approx variant is q24).
# --------------------------------------------------------------------------

def q13_distinct_agg(spark: SparkSession, sf: str) -> DataFrame:
    l = load(spark, sf, "lineitem")
    return (l.groupBy("l_returnflag")
             .agg(F.countDistinct("l_partkey").alias("n_parts"),
                  F.countDistinct("l_suppkey").alias("n_supps"),
                  F.count("*").alias("n_rows")))


Q13_SQL = """
SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
       count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
FROM lineitem GROUP BY l_returnflag
"""


# --------------------------------------------------------------------------
# q14 — scalar string functions (JVM-side, whole-stage-codegen'd).
# --------------------------------------------------------------------------

def q14_string_funcs(spark: SparkSession, sf: str) -> DataFrame:
    p = load(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("up_name"),
        F.length("p_name").alias("name_len"),
        F.substring("p_type", 1, 3).alias("type3"),
        F.concat(F.col("p_brand"), F.lit("/"), F.col("p_type")).alias("brand_type"),
        F.regexp_extract("p_brand", r"Brand#(\d+)", 1).cast("int").alias("brand_num"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("snake_name"),
    )


Q14_SQL = r"""
SELECT p_partkey, upper(p_name) AS up_name, length(p_name) AS name_len,
       substring(p_type, 1, 3) AS type3,
       concat(p_brand, '/', p_type) AS brand_type,
       CAST(regexp_extract(p_brand, 'Brand#(\d+)', 1) AS INT) AS brand_num,
       replace(p_name, ' ', '_') AS snake_name
FROM part
"""


# --------------------------------------------------------------------------
# q15 — date/time functions + truncation grouping.
# --------------------------------------------------------------------------

def q15_date_funcs(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders")
    return (o.groupBy(F.year("o_orderdate").alias("o_year"),
                      F.quarter("o_orderdate").alias("o_quarter"))
             .agg(F.count("*").alias("n_orders"),
                  _dsum2(F.col("o_totalprice")).alias("total_price"),
                  F.min(F.date_trunc("month", F.col("o_orderdate"))).alias("first_month")))


Q15_SQL = """
SELECT CAST(year(o_orderdate) AS INT) AS o_year,
       CAST(quarter(o_orderdate) AS INT) AS o_quarter,
       count(*) AS n_orders,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_price,
       CAST(min(date_trunc('month', o_orderdate)) AS TIMESTAMP) AS first_month
FROM orders GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# q16 — CASE bucketing + conditional aggregation.
# --------------------------------------------------------------------------

def q16_case_buckets(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders")
    bucket = (F.when(F.col("o_totalprice") < 100000, "small")
               .when(F.col("o_totalprice") < 300000, "medium")
               .otherwise("large"))
    return (o.groupBy(bucket.alias("price_bucket"))
             .agg(F.count("*").alias("n_orders"),
                  F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
                   .cast("bigint").alias("n_finished")))


Q16_SQL = """
SELECT CASE WHEN o_totalprice < 100000 THEN 'small'
            WHEN o_totalprice < 300000 THEN 'medium'
            ELSE 'large' END AS price_bucket,
       count(*) AS n_orders,
       CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished
FROM orders GROUP BY 1
"""


# --------------------------------------------------------------------------
# q17 — correlated EXISTS re-expressed as a semi-join on a filtered build
# side (Catalyst does the same rewrite for the SQL form).
# --------------------------------------------------------------------------

def q17_exists(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders")
    big = load(spark, sf, "lineitem").filter(F.col("l_quantity") >= 45)
    return (o.join(big, o.o_orderkey == big.l_orderkey, "left_semi")
             .select("o_orderkey", "o_orderpriority",
                     _r2(F.col("o_totalprice")).alias("price")))


Q17_SQL = """
SELECT o_orderkey, o_orderpriority, round(CAST(o_totalprice AS DOUBLE), 2) AS price
FROM orders WHERE EXISTS (
  SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity >= 45)
"""


# --------------------------------------------------------------------------
# q18 — GROUP BY + HAVING.
# --------------------------------------------------------------------------

def q18_having(spark: SparkSession, sf: str) -> DataFrame:
    l = load(spark, sf, "lineitem")
    return (l.groupBy("l_suppkey")
             .agg(_r2(F.sum("l_quantity")).alias("total_qty"),
                  F.count("*").alias("n_items"))
             .filter(F.col("total_qty") > 100))


Q18_SQL = """
SELECT l_suppkey, round(CAST(sum(l_quantity) AS DOUBLE), 2) AS total_qty,
       count(*) AS n_items
FROM lineitem GROUP BY l_suppkey
HAVING round(CAST(sum(l_quantity) AS DOUBLE), 2) > 100
"""


# --------------------------------------------------------------------------
# q19 — GROUPING SETS (SQL-first: Catalyst expands to an Expand node).
# --------------------------------------------------------------------------

def q19_grouping_sets(spark: SparkSession, sf: str) -> DataFrame:
    register_views(spark, sf, tables=["lineitem"])
    return spark.sql("""
        SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
               round(CAST(sum(l_quantity) AS DOUBLE), 2) AS total_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """)


Q19_SQL = """
SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
       round(CAST(sum(l_quantity) AS DOUBLE), 2) AS total_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
"""


# --------------------------------------------------------------------------
# q20 — pivot (DataFrame API) == conditional aggregation (SQL oracle).
# --------------------------------------------------------------------------

def q20_pivot(spark: SparkSession, sf: str) -> DataFrame:
    l = load(spark, sf, "lineitem")
    return (l.groupBy("l_returnflag")
             .pivot("l_linestatus", ["O", "F"])
             .agg(_r2(F.sum("l_quantity")))
             .withColumnRenamed("O", "qty_open")
             .withColumnRenamed("F", "qty_finished"))


Q20_SQL = """
SELECT l_returnflag,
       round(CAST(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END) AS DOUBLE), 2) AS qty_open,
       round(CAST(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS DOUBLE), 2) AS qty_finished
FROM lineitem GROUP BY l_returnflag
"""


# --------------------------------------------------------------------------
# q21 — array/higher-order functions over the embeddings table: element
# count, L2 norm via aggregate-fold (same left-to-right fold both engines).
# --------------------------------------------------------------------------

def q21_array_funcs(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "embeddings")
    sq = F.transform("embedding", lambda x: x.cast("double") * x.cast("double"))
    norm = F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x))
    # "+ 0.0" collapses IEEE -0.0 to +0.0 (engines disagree on the sign
    # of a negative value rounded to zero); identity for everything else
    return e.select("vec_id", "label",
                    F.size("embedding").alias("dim"),
                    F.round(norm, 4).alias("l2_norm"),
                    (F.round(F.element_at("embedding", 1).cast("double"), 4)
                     + F.lit(0.0)).alias("e_first"))


Q21_SQL = """
SELECT vec_id, label, CAST(len(embedding) AS INT) AS dim,
       round(sqrt(list_sum(list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2_norm,
       round(CAST(embedding[1] AS DOUBLE), 4) + 0.0 AS e_first
FROM embeddings
"""


# --------------------------------------------------------------------------
# q22 — non-equi (range) join: lineitems shipped within 30 days of the
# order date.  Scale: the equi part (orderkey) drives the shuffle; the
# range predicate is evaluated post-join, so no O(n²) blowup.
# --------------------------------------------------------------------------

def q22_range_join(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders")
    l = load(spark, sf, "lineitem")
    cond = ((l.l_orderkey == o.o_orderkey)
            & (l.l_shipdate >= o.o_orderdate)
            & (l.l_shipdate < o.o_orderdate + F.expr("INTERVAL 30 DAYS")))
    return (l.join(o, cond)
             .groupBy("o_orderpriority")
             .agg(F.count("*").alias("n_fast_items"),
                  _dsum2(F.col("l_extendedprice")).alias("fast_revenue")))


Q22_SQL = """
SELECT o_orderpriority, count(*) AS n_fast_items,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS fast_revenue
FROM lineitem JOIN orders
  ON l_orderkey = o_orderkey
 AND l_shipdate >= o_orderdate
 AND l_shipdate < o_orderdate + INTERVAL 30 DAY
GROUP BY o_orderpriority
"""


# --------------------------------------------------------------------------
# q23 — JSON extraction from the events props column.
# --------------------------------------------------------------------------

def q23_json_extract(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (e.groupBy("event_type")
             .agg(F.count("*").alias("n_events"),
                  F.sum(k).cast("bigint").alias("sum_k"),
                  _r2(F.avg(k)).alias("avg_k")))


Q23_SQL = """
SELECT event_type, count(*) AS n_events,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
       round(CAST(avg(CAST(json_extract_string(props, '$.k') AS INT)) AS DOUBLE), 2) AS avg_k
FROM events GROUP BY event_type
"""



# --------------------------------------------------------------------------
# q43 — fixed-width histogram: the profiling primitive behind every
# "distribution of X" dashboard.  Bucket id is a pure map-side floor
# division, so the plan is one partial-agg shuffle of (buckets) rows —
# the cheapest possible full-table profile at any scale.
# --------------------------------------------------------------------------

HIST_WIDTH = 50_000


def q43_histogram(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders")
    bucket = F.floor(F.col("o_totalprice") / HIST_WIDTH).cast("bigint")
    return (o.groupBy(bucket.alias("bucket"))
             .agg(F.count("*").alias("n"),
                  _dsum2(F.col("o_totalprice")).alias("total"),
                  F.min("o_totalprice").alias("lo"),
                  F.max("o_totalprice").alias("hi")))


Q43_SQL = f"""
SELECT CAST(floor(o_totalprice / {HIST_WIDTH}) AS BIGINT) AS bucket,
       count(*) AS n,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)
         AS total,
       min(o_totalprice) AS lo, max(o_totalprice) AS hi
FROM orders GROUP BY 1
"""


QUERIES = {
    "q01_pricing_summary": q01_pricing_summary,
    "q02_filter_project": q02_filter_project,
    "q03_join_revenue": q03_join_revenue,
    "q04_star_dims": q04_star_dims,
    "q05_semi_join": q05_semi_join,
    "q06_anti_join": q06_anti_join,
    "q07_window_rank": q07_window_rank,
    "q08_window_running": q08_window_running,
    "q09_rollup": q09_rollup,
    "q10_cube": q10_cube,
    "q11_topk": q11_topk,
    "q12_setops": q12_setops,
    "q41_setops_all": q41_setops_all,
    "q43_histogram": q43_histogram,
    "q13_distinct_agg": q13_distinct_agg,
    "q14_string_funcs": q14_string_funcs,
    "q15_date_funcs": q15_date_funcs,
    "q16_case_buckets": q16_case_buckets,
    "q17_exists": q17_exists,
    "q18_having": q18_having,
    "q19_grouping_sets": q19_grouping_sets,
    "q20_pivot": q20_pivot,
    "q21_array_funcs": q21_array_funcs,
    "q22_range_join": q22_range_join,
    "q23_json_extract": q23_json_extract,
}

ORACLES = {
    "q01_pricing_summary": Q01_SQL,
    "q02_filter_project": Q02_SQL,
    "q03_join_revenue": Q03_SQL,
    "q04_star_dims": Q04_SQL,
    "q05_semi_join": Q05_SQL,
    "q06_anti_join": Q06_SQL,
    "q07_window_rank": Q07_SQL,
    "q08_window_running": Q08_SQL,
    "q09_rollup": Q09_SQL,
    "q10_cube": Q10_SQL,
    "q11_topk": Q11_SQL,
    "q12_setops": Q12_SQL,
    "q41_setops_all": Q41_SQL,
    "q43_histogram": Q43_SQL,
    "q13_distinct_agg": Q13_SQL,
    "q14_string_funcs": Q14_SQL,
    "q15_date_funcs": Q15_SQL,
    "q16_case_buckets": Q16_SQL,
    "q17_exists": Q17_SQL,
    "q18_having": Q18_SQL,
    "q19_grouping_sets": Q19_SQL,
    "q20_pivot": Q20_SQL,
    "q21_array_funcs": Q21_SQL,
    "q22_range_join": Q22_SQL,
    "q23_json_extract": Q23_SQL,
}
