"""Round-11 batch 5 (builder extension, SURVEY §2C):

- ``type_corr_matrix`` — full pairwise Pearson correlation matrix of
  the five event types' daily revenue series (q87's lag-1 self-corr
  generalized to the cross-type matrix): the (type, day) rollup joins
  itself on day, and each of the C(5,2) pairs reduces to five exact
  DECIMAL(38,0) moments; r closes in doubles once per pair.  The
  feature-correlation screen every metrics warehouse ships.
- ``fk_reconciliation`` — referential-integrity audit across the star
  schema's four foreign keys (lineitem→orders, lineitem→part,
  lineitem→supplier, orders→customer): orphan counts in both
  directions (child rows without a parent; parent rows never
  referenced) via LEFT ANTI joins.  The data-reconciliation class
  that complements dq_audit's domain checks.  One summary row per
  relation, so output is O(relations).
- ``q97_share_of_parent`` — hierarchical share-of-parent at two
  levels: each nation's revenue share of its region AND each region's
  share of the total, from ONE fact aggregation rolled up twice (tiny
  rollups broadcast back).  Distinct from q09's rollup (which emits
  subtotal rows, not parent-ratio columns).

Scale: corr joins the (type, day) series (days × 5 rows at any corpus
size) with itself on day; the FK audit is four key-projected LEFT ANTI
joins, each shuffling only the key column (count-only aggregates);
share-of-parent broadcasts two sub-thousand-row rollups back into the
nation-level aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigarrays_jl_spark.sources.tables import load

VQ = 1_000_000
D38 = "decimal(38,0)"


def type_corr_matrix(spark: SparkSession, sf: str) -> DataFrame:
    """Pearson r of daily revenue between every pair of event types
    (t1 < t2), from exact integer moments over the shared days."""
    e = load(spark, sf, "events").select(
        "event_type",
        (F.floor(F.col("ts").cast("long") / 86400)).cast("bigint")
        .alias("day"),
        F.round(F.col("value").cast("double") * VQ).cast("bigint")
        .alias("vi"))
    daily = e.groupBy("event_type", "day").agg(F.sum("vi").alias("rev"))
    a = daily.select(F.col("event_type").alias("t1"), "day",
                     F.col("rev").alias("x"))
    b = daily.select(F.col("event_type").alias("t2"),
                     F.col("day").alias("day2"), F.col("rev").alias("y"))
    p = (a.join(b, (F.col("day") == F.col("day2"))
                & (F.col("t1") < F.col("t2")))
         .select("t1", "t2", F.col("x").cast(D38).alias("x"),
                 F.col("y").cast(D38).alias("y")))
    m = p.groupBy("t1", "t2").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"))
    n = F.col("n").cast("double")
    cov = n * F.col("sxy").cast("double") \
        - F.col("sx").cast("double") * F.col("sy").cast("double")
    vx = n * F.col("sxx").cast("double") \
        - F.col("sx").cast("double") * F.col("sx").cast("double")
    vy = n * F.col("syy").cast("double") \
        - F.col("sy").cast("double") * F.col("sy").cast("double")
    return m.select("t1", "t2", F.col("n").cast("bigint").alias("n_days"),
                    F.round(cov / F.sqrt(vx * vy), 6).alias("pearson_r"))


TYPE_CORR_SQL = f"""
WITH e AS (
  SELECT event_type,
         CAST(floor(epoch_us(ts) / 1000000) AS BIGINT) // 86400 AS day,
         CAST(round(CAST(value AS DOUBLE) * {VQ}) AS BIGINT) AS vi
  FROM events),
daily AS (
  SELECT event_type, day, CAST(sum(vi) AS HUGEINT) AS rev
  FROM e GROUP BY 1, 2),
m AS (
  SELECT a.event_type AS t1, b.event_type AS t2, count(*) AS n,
         sum(a.rev) AS sx, sum(b.rev) AS sy,
         sum(a.rev * b.rev) AS sxy,
         sum(a.rev * a.rev) AS sxx, sum(b.rev * b.rev) AS syy
  FROM daily a JOIN daily b
    ON a.day = b.day AND a.event_type < b.event_type
  GROUP BY 1, 2)
SELECT t1, t2, CAST(n AS BIGINT) AS n_days,
       round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
         AS pearson_r
FROM m
"""


def fk_reconciliation(spark: SparkSession, sf: str) -> DataFrame:
    """Orphan census per star-schema relation: child keys without a
    parent and parent keys never referenced (LEFT ANTI both ways)."""
    li = load(spark, sf, "lineitem")
    o = load(spark, sf, "orders")
    p = load(spark, sf, "part")
    s = load(spark, sf, "supplier")
    c = load(spark, sf, "customer")

    def audit(rel, child, ckey, parent, pkey):
        ck = child.select(F.col(ckey).alias("k"))
        pk = parent.select(F.col(pkey).alias("k"))
        orphans = ck.join(pk.distinct(), "k", "left_anti") \
                    .agg(F.count("*").alias("c")) \
                    .select(F.lit(rel).alias("relation"),
                            F.col("c").alias("orphan_children"))
        unref = pk.join(ck.distinct(), "k", "left_anti") \
                  .agg(F.count("*").alias("c")) \
                  .select(F.lit(rel).alias("relation"),
                          F.col("c").alias("unreferenced_parents"))
        return orphans.join(unref, "relation")

    out = audit("lineitem->orders", li, "l_orderkey", o, "o_orderkey")
    for args in (("lineitem->part", li, "l_partkey", p, "p_partkey"),
                 ("lineitem->supplier", li, "l_suppkey", s, "s_suppkey"),
                 ("orders->customer", o, "o_custkey", c, "c_custkey")):
        out = out.unionByName(audit(*args))
    return out.select("relation",
                      F.col("orphan_children").cast("bigint")
                      .alias("orphan_children"),
                      F.col("unreferenced_parents").cast("bigint")
                      .alias("unreferenced_parents"))


# NOT EXISTS (not NOT IN): a referential-integrity audit exists to
# survive dirty keys, and NOT IN returns zero rows the moment the
# subquery holds a single NULL — diverging from the Spark side's
# LEFT ANTI join, which counts NULL-key children as orphans exactly
# like NOT EXISTS does.
FK_SQL = """
WITH rel AS (
  SELECT 'lineitem->orders' AS relation,
         (SELECT count(*) FROM lineitem l
          WHERE NOT EXISTS (SELECT 1 FROM orders o
                            WHERE o.o_orderkey = l.l_orderkey))
           AS orphan_children,
         (SELECT count(*) FROM orders o
          WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                            WHERE l.l_orderkey = o.o_orderkey))
           AS unreferenced_parents
  UNION ALL
  SELECT 'lineitem->part',
         (SELECT count(*) FROM lineitem l
          WHERE NOT EXISTS (SELECT 1 FROM part p
                            WHERE p.p_partkey = l.l_partkey)),
         (SELECT count(*) FROM part p
          WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                            WHERE l.l_partkey = p.p_partkey))
  UNION ALL
  SELECT 'lineitem->supplier',
         (SELECT count(*) FROM lineitem l
          WHERE NOT EXISTS (SELECT 1 FROM supplier s
                            WHERE s.s_suppkey = l.l_suppkey)),
         (SELECT count(*) FROM supplier s
          WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                            WHERE l.l_suppkey = s.s_suppkey))
  UNION ALL
  SELECT 'orders->customer',
         (SELECT count(*) FROM orders o
          WHERE NOT EXISTS (SELECT 1 FROM customer c
                            WHERE c.c_custkey = o.o_custkey)),
         (SELECT count(*) FROM customer c
          WHERE NOT EXISTS (SELECT 1 FROM orders o
                            WHERE o.o_custkey = c.c_custkey)))
SELECT relation, CAST(orphan_children AS BIGINT) AS orphan_children,
       CAST(unreferenced_parents AS BIGINT) AS unreferenced_parents
FROM rel
"""


def q97_share_of_parent(spark: SparkSession, sf: str) -> DataFrame:
    """Per nation: revenue, its share of the nation's region, and the
    region's share of the grand total — one fact aggregation, two tiny
    rollups broadcast back."""
    rev = F.col("o_totalprice").cast("decimal(18,2)")
    o = (load(spark, sf, "orders")
         .join(load(spark, sf, "customer"),
               F.col("o_custkey") == F.col("c_custkey"))
         .join(F.broadcast(load(spark, sf, "nation")),
               F.col("c_nationkey") == F.col("n_nationkey"))
         .join(F.broadcast(load(spark, sf, "region")),
               F.col("n_regionkey") == F.col("r_regionkey"))
         .groupBy("r_name", "n_name")
         .agg(F.sum(rev).alias("nrev")))
    by_region = o.groupBy("r_name").agg(F.sum("nrev").alias("rrev"))
    total = by_region.agg(F.sum("rrev").alias("trev"))
    return (o.join(F.broadcast(by_region), "r_name")
            .crossJoin(F.broadcast(total))
            .select("r_name", "n_name",
                    F.col("nrev").cast("double").alias("nation_revenue"),
                    F.round(F.col("nrev").cast("double")
                            / F.col("rrev").cast("double"), 6)
                    .alias("share_of_region"),
                    F.round(F.col("rrev").cast("double")
                            / F.col("trev").cast("double"), 6)
                    .alias("region_share_of_total")))


Q97_SQL = """
WITH n AS (
  SELECT r_name, n_name,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS nrev
  FROM orders
  JOIN customer ON c_custkey = o_custkey
  JOIN nation ON n_nationkey = c_nationkey
  JOIN region ON r_regionkey = n_regionkey
  GROUP BY 1, 2),
r AS (SELECT r_name, sum(nrev) AS rrev FROM n GROUP BY 1),
t AS (SELECT sum(rrev) AS trev FROM r)
SELECT n.r_name, n_name, CAST(nrev AS DOUBLE) AS nation_revenue,
       round(CAST(nrev AS DOUBLE) / CAST(rrev AS DOUBLE), 6)
         AS share_of_region,
       round(CAST(rrev AS DOUBLE) / CAST(trev AS DOUBLE), 6)
         AS region_share_of_total
FROM n JOIN r ON n.r_name = r.r_name CROSS JOIN t
"""


QUERIES = {
    "type_corr_matrix": type_corr_matrix,
    "fk_reconciliation": fk_reconciliation,
    "q97_share_of_parent": q97_share_of_parent,
}

ORACLES = {
    "type_corr_matrix": TYPE_CORR_SQL,
    "fk_reconciliation": FK_SQL,
    "q97_share_of_parent": Q97_SQL,
}
