"""Synthetic scale-up data generator (r10 verdict task 4).

Generates an sfN-shaped dataset with the SAME schemas, value domains,
key-cardinality ratios, and dup/cluster structure as the driver's
`/root/testdata/sf*` tables (sampled, not copied — seed discipline per
TESTDATA.md), at any multiple of sf0.1, into a scratch directory.
Everything is generated WITH Spark (`spark.range` + column functions +
one orders join for lineitem dates) — no driver-side arrays — so the
generator itself demonstrates the 1000-executor posture.

Distributions mirrored from /root/testdata/sf0.1 (duckdb-sampled):
  customer 15e4·m   acctbal U(-1000,10000) 2-dec, 5 mktsegments
  supplier 1e4·m    acctbal U(-1000,10000)
  part     2e5·m    name = 8 adj × 8 noun, Brand#1-25, 6 types,
                    size 1-50, retail U(900,1000)
  orders   1.5e6·m  status F/O/P, priority 5, dates 1995→2001-08,
                    totalprice U(1000,500000)
  lineitem 6e6·m    ~4.07 lines/order (uniform orderkey draw),
                    qty 1-50, extprice U(900,105000), disc 0-0.10
                    step .01, tax 0-0.08 step .01, shipdate =
                    o_orderdate + U(1,120) days, returnflag A/N/R,
                    linestatus F/O
  events   1e6·m    5 types, users = customers/10, ts U(Jan 2024),
                    value Exp(mean 50) 2-dec, props {"k": 0-99}
  documents 5e4·m   8-120 words over a Heaps-law vocab (31·√mult
                    words — 31 at mult=1, matching the driver; 98 at
                    mult=10), ~2% near-dup
                    chains (copy of doc_id−37 with one word replaced)
                    + ~0.15% exact dups, ~6% carrying one of 4 shared
                    8-word boilerplate headers, lang en 40% / 4×15%,
                    source src0-19
  embeddings 2e4·m  64-dim float32, 10 labels, gaussian cluster per
                    label (center 3·e_{label mod 64} idiom)

Usage:
    python tools/gen_scale_data.py [mult] [out_dir]
    # default: mult=10 (sf1), out_dir=/tmp/sparkgraft_sf1
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SEED = 42
ADJ = ["large", "hot", "blue", "red", "cold", "new", "old", "small"]
NOUN = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
SEGMENTS = ["MACHINERY", "BUILDING", "AUTOMOBILE", "HOUSEHOLD", "FURNITURE"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
VOCAB = ["spark", "batch", "line", "column", "order", "small", "sort",
         "fast", "value", "scan", "hash", "slow", "group", "query",
         "table", "stream", "filter", "customer", "window", "join",
         "part", "vector", "key", "agg", "the", "a", "big", "shuffle",
         "plan", "read", "write"]
LANGS = ["en", "zh", "es", "fr", "de"]

# shared boilerplate header templates (r13 verdict task 2): a real
# crawl's headers/footers collide on ≥8-word prefixes by construction,
# so ~6% of docs get one of these four 8-word headers prepended —
# giving the boilerplate detector production-scale collision groups to
# find (BOILER_K = 8) instead of the demo-scale 2-word accidents.
# Applied BEFORE the dup-chain copy so exact dups still share full
# text, and first-word-mutation near-dups keep matching ``^[a-z]+ ``.
BOILER_HEADERS = [
    "terms of service apply to all content below",
    "subscribe to our newsletter for weekly updates today",
    "copyright all rights reserved by the site owner",
    "cookie policy this site uses cookies for analytics",
]


def heaps_vocab(mult: int) -> list[str]:
    """Vocabulary under Heaps' law: V(n) ∝ n^0.5 anchored at the
    driver's 31 words for mult=1 (sf0.1), so the sf0.1 → sf1 proof legs
    sit on one realistic vocabulary-growth trajectory instead of a
    frozen 31-word vocab (r12 verdict task 3: with the vocab frozen,
    postings density — every doc hitting every term — dominated the
    text-operator ratios and capped what the proof could measure).

    Extra words are the base words with letter suffixes (purely
    alphabetic — the near-dup mutation regexp ``^[a-z]+ `` must keep
    matching the first token of a document)."""
    import math

    def sfx(q: int) -> str:
        # bijective base-26: 0->'a', 25->'z', 26->'aa' — suffixes stay
        # purely alphabetic at ANY multiplier (a single chr() walked
        # past 'z' into punctuation above mult ~729, where the '^[a-z]+ '
        # near-dup mutation regexp would silently stop matching)
        out = ""
        q += 1
        while q:
            q, r = divmod(q - 1, 26)
            out = chr(ord("a") + r) + out
        return out

    v = max(len(VOCAB), int(round(len(VOCAB) * math.sqrt(mult))))
    words = list(VOCAB)
    i = 0
    while len(words) < v:
        words.append(VOCAB[i % len(VOCAB)] + sfx(i // len(VOCAB)))
        i += 1
    return words


def _money(col, lo, hi, seed):
    return F.round(F.lit(lo) + F.rand(seed) * (hi - lo), 2)


def _pick(options, seed):
    arr = F.array(*[F.lit(o) for o in options])
    return F.element_at(arr, (F.rand(seed) * len(options)).cast("int") + 1)


def gen(spark: SparkSession, mult: int, out: str) -> None:
    n_cust = 15_000 * mult
    n_supp = 1_000 * mult
    n_part = 20_000 * mult
    n_ord = 150_000 * mult
    n_li = 600_000 * mult
    n_ev = 100_000 * mult
    n_doc = 5_000 * mult
    n_emb = 2_000 * mult
    par = spark.sparkContext.defaultParallelism

    def w(df, name):
        df.write.mode("overwrite").parquet(f"{out}/{name}.parquet")
        print(f"wrote {name}")

    w(spark.range(5).select(
        F.col("id").cast("int").alias("r_regionkey"),
        F.element_at(F.array(*[F.lit(r) for r in REGIONS]),
                     F.col("id").cast("int") + 1).alias("r_name")), "region")

    w(spark.range(25).select(
        F.col("id").cast("int").alias("n_nationkey"),
        F.concat(F.lit("NATION_"), F.col("id")).alias("n_name"),
        (F.col("id") % 5).cast("int").alias("n_regionkey")), "nation")

    w(spark.range(0, n_cust, 1, par).select(
        F.col("id").alias("c_custkey"),
        F.concat(F.lit("Customer#"), F.lpad(F.col("id").cast("string"),
                                            9, "0")).alias("c_name"),
        (F.rand(SEED + 1) * 25).cast("int").alias("c_nationkey"),
        _money(None, -1000, 10000, SEED + 2).alias("c_acctbal"),
        _pick(SEGMENTS, SEED + 3).alias("c_mktsegment")), "customer")

    w(spark.range(0, n_supp, 1, par).select(
        F.col("id").alias("s_suppkey"),
        F.concat(F.lit("Supplier#"), F.lpad(F.col("id").cast("string"),
                                            9, "0")).alias("s_name"),
        (F.rand(SEED + 4) * 25).cast("int").alias("s_nationkey"),
        _money(None, -1000, 10000, SEED + 5).alias("s_acctbal")), "supplier")

    w(spark.range(0, n_part, 1, par).select(
        F.col("id").alias("p_partkey"),
        F.concat(_pick(ADJ, SEED + 6), F.lit(" "),
                 _pick(NOUN, SEED + 7)).alias("p_name"),
        F.concat(F.lit("Brand#"),
                 ((F.rand(SEED + 8) * 25).cast("int") + 1)).alias("p_brand"),
        _pick(TYPES, SEED + 9).alias("p_type"),
        ((F.rand(SEED + 10) * 50).cast("int") + 1).alias("p_size"),
        _money(None, 900, 1000, SEED + 11).alias("p_retailprice")), "part")

    orders = spark.range(0, n_ord, 1, par).select(
        F.col("id").alias("o_orderkey"),
        (F.rand(SEED + 12) * n_cust).cast("long").alias("o_custkey"),
        _pick(["F", "O", "P"], SEED + 13).alias("o_orderstatus"),
        _money(None, 1000, 500000, SEED + 14).alias("o_totalprice"),
        (F.lit("1995-01-01").cast("timestamp")
         + F.make_dt_interval(days=(F.rand(SEED + 15) * 2404).cast("int"))
         ).alias("o_orderdate"),
        _pick(PRIORITIES, SEED + 16).alias("o_orderpriority"))
    orders.cache()
    w(orders, "orders")

    li = spark.range(0, n_li, 1, par).select(
        F.col("id"),
        (F.rand(SEED + 17) * n_ord).cast("long").alias("l_orderkey"),
        (F.rand(SEED + 18) * n_part).cast("long").alias("l_partkey"),
        (F.rand(SEED + 19) * n_supp).cast("long").alias("l_suppkey"),
        ((F.rand(SEED + 20) * 7).cast("int") + 1).alias("l_linenumber"),
        F.floor(F.rand(SEED + 21) * 50 + 1).cast("double")
        .alias("l_quantity"),
        _money(None, 900, 105000, SEED + 22).alias("l_extendedprice"),
        ((F.rand(SEED + 23) * 11).cast("int") / 100.0)
        .cast("double").alias("l_discount"),
        ((F.rand(SEED + 24) * 9).cast("int") / 100.0)
        .cast("double").alias("l_tax"),
        _pick(["A", "N", "R"], SEED + 25).alias("l_returnflag"),
        _pick(["F", "O"], SEED + 26).alias("l_linestatus"),
        (F.rand(SEED + 27) * 120 + 1).cast("int").alias("_ship_lag"))
    w(li.join(orders.select("o_orderkey", "o_orderdate"),
              li.l_orderkey == F.col("o_orderkey"))
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
                "l_quantity", "l_extendedprice", "l_discount", "l_tax",
                "l_returnflag", "l_linestatus",
                (F.col("o_orderdate")
                 + F.make_dt_interval(days=F.col("_ship_lag")))
                .alias("l_shipdate")), "lineitem")
    orders.unpersist()

    w(spark.range(0, n_ev, 1, par).select(
        F.col("id").alias("event_id"),
        (F.lit("2024-01-01").cast("timestamp")
         + F.make_dt_interval(secs=F.rand(SEED + 28) * 30 * 86400)
         ).alias("ts"),
        (F.rand(SEED + 29) * (n_cust // 10)).cast("long").alias("user_id"),
        _pick(EVENT_TYPES, SEED + 30).alias("event_type"),
        F.round(-50.0 * F.log(F.lit(1.0) - F.rand(SEED + 31)), 2)
        .alias("value"),
        F.concat(F.lit('{"k": '),
                 (F.rand(SEED + 32) * 100).cast("int"),
                 F.lit("}")).alias("props")), "events")

    # documents: base word salad, then ~2% near-dup chains (one word
    # mutated copy of doc_id−37) and ~0.15% exact dups — the structure
    # the minhash/jaccard/fingerprint operators grade against
    words = heaps_vocab(mult)
    vocab = F.array(*[F.lit(v) for v in words])
    salad = F.array_join(F.transform(
        F.sequence(F.lit(1), (F.rand(SEED + 33) * 112 + 8).cast("int")),
        lambda i: F.element_at(
            vocab, (F.pmod(F.hash(F.col("id") * 1000 + i,
                                  F.lit(SEED)), len(words)) + 1)
            .cast("int"))), " ")
    header = F.element_at(
        F.array(*[F.lit(h) for h in BOILER_HEADERS]),
        (F.pmod(F.hash(F.col("id"), F.lit(SEED + 41)),
                len(BOILER_HEADERS)) + 1).cast("int"))
    base = spark.range(0, n_doc, 1, par).select(
        F.col("id").alias("doc_id"),
        F.when(F.pmod(F.hash(F.col("id"), F.lit(SEED + 40)), 100) < 6,
               F.concat(header, F.lit(" "), salad))
        .otherwise(salad).alias("text"),
        F.when(F.rand(SEED + 34) < 0.4, "en")
        .otherwise(_pick(LANGS[1:], SEED + 35)).alias("lang"),
        F.concat(F.lit("src"),
                 (F.rand(SEED + 36) * 20).cast("int")).alias("source"),
        F.rand(SEED + 37).alias("_dup_roll"))
    src = base.select((F.col("doc_id") + 37).alias("_src_of"),
                      F.col("text").alias("_src_text"))
    docs = (base.join(src, base.doc_id == F.col("_src_of"), "left")
            .select(
                "doc_id",
                F.when((F.col("_dup_roll") < 0.0015)
                       & F.col("_src_text").isNotNull(),
                       F.col("_src_text"))
                .when((F.col("_dup_roll") < 0.02)
                      & F.col("_src_text").isNotNull(),
                      F.regexp_replace(F.col("_src_text"),
                                       "^[a-z]+ ", "mutated "))
                .otherwise(F.col("text")).alias("text"),
                "lang", "source"))
    w(docs.select("doc_id", "text", "lang", "source",
                  F.length("text").alias("n_chars")), "documents")

    # embeddings mirror the REAL corpus structure (measured at sf0.1):
    # isotropic unit-norm vectors with NO label-cosine clustering
    # (labels are arbitrary there: same-label mean cosine 0.0) and no
    # exact near-dups (zero pairs ≥ 0.9) — cosine between vectors is
    # ~N(0, 1/64), giving the same ~0.75 % pair density at the 0.3
    # demo threshold.  Noise must be HASH-mixed per (id, dim): a sin of
    # a linear phase aliases into thousands of accidental
    # near-identical pairs (three-distance theorem), which made the
    # first sf1 corpus near-dup-saturated and OOM'd every pair operator
    raw = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda j: (F.pmod(F.hash(F.col("id") * 64 + j, F.lit(SEED)),
                          F.lit(1_000_003)).cast("double")
                   / 500001.5 - 1.0))
    norm = F.sqrt(F.aggregate(raw, F.lit(0.0),
                              lambda acc, x: acc + x * x))
    w(spark.range(0, n_emb, 1, par).select(
        F.col("id").alias("vec_id"),
        F.transform(raw, lambda x: (x / norm).cast("float"))
        .alias("embedding"),
        (F.col("id") % 10).cast("int").alias("label")), "embeddings")


def main():
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sparkgraft_sf1"
    from bigarrays_jl_spark.session import get_spark
    spark = get_spark("gen-scale-data")
    gen(spark, mult, out)
    print(f"done: {out} (mult={mult})")


if __name__ == "__main__":
    main()
