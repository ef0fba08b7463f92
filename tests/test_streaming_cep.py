"""Streaming CEP (applyInPandasWithState) vs the batch pattern match.

The streaming operator's correctness hinges on watermark-driven
finalization: an event is only provably ADJACENT to its successor once
the watermark passes it.  These tests drive real multi-batch feeds
(one file per trigger) and pin exact equivalence with the
oracle-checked batch operator, plus the consecutive/gap predicate and
the timeout path (users that go quiet finalize without new rows).
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from bigarrays_jl_spark.operators.events_cep import (PATTERN_GAP_S,
                                                     events_pattern_match)
from bigarrays_jl_spark.sources.tables import load
from bigarrays_jl_spark.streaming.cep import streaming_pattern_match

EVENT_SCHEMA = "user_id long, event_id long, event_type string, ts timestamp"


def _feed(spark, src, ckpt, files):
    """One query per appended file => one micro-batch per file."""
    import os
    os.makedirs(src, exist_ok=True)
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    q = (streaming_pattern_match(stream).writeStream
         .outputMode("append").format("memory")
         .queryName("t_cep").option("checkpointLocation", ckpt).start())
    try:
        for df in files:
            df.coalesce(1).write.mode("append").parquet(src)
            q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql("SELECT * FROM t_cep")


def _sentinels(spark, n=2):
    # two far-future batches: the first advances the watermark past
    # every real event, the second fires the armed event-time timeouts
    # (timeouts evaluate against the PREVIOUS batch's watermark)
    return [spark.createDataFrame(
        [(-1, -1 - i, "noop", dt.datetime(2030, 1, 1 + i))], EVENT_SCHEMA)
        for i in range(n)]


def test_streaming_cep_matches_batch_on_real_events(spark, sf_dir, tmp_path):
    e = (load(spark, sf_dir, "events")
         .select("user_id", "event_id", "event_type", "ts",
                 F.col("ts").cast("long").alias("sec")))
    lo, hi = e.agg(F.min("sec"), F.max("sec")).first()
    mid = (lo + hi) // 2
    batches = [e.filter(F.col("sec") <= mid).drop("sec"),
               e.filter(F.col("sec") > mid).drop("sec")]
    got = _feed(spark, str(tmp_path / "src"), str(tmp_path / "ckpt"),
                batches + _sentinels(spark))
    agg = {r["user_id"]: (r["n"], r["first"])
           for r in got.groupBy("user_id")
           .agg(F.count("*").alias("n"),
                F.min("first_event_id").alias("first")).collect()}
    want = {r["user_id"]: (r["n_matches"], r["first_match_event"])
            for r in events_pattern_match(spark, sf_dir).collect()}
    assert want, "testdata must contain pattern instances"
    assert agg == want


def test_streaming_cep_consecutive_and_gap_semantics(spark, tmp_path):
    t0 = dt.datetime(2020, 1, 1)

    def ts(h):
        return t0 + dt.timedelta(hours=h)

    rows = [
        # user 1: clean triple within gaps -> one match at event 10
        (1, 10, "view", ts(0)), (1, 11, "view", ts(1)),
        (1, 12, "click", ts(2)),
        # user 2: an interloper between the views — NOT consecutive
        (2, 20, "view", ts(0)), (2, 21, "purchase", ts(1)),
        (2, 22, "view", ts(2)), (2, 23, "click", ts(3)),
        # user 3: second step exceeds the gap bound
        (3, 30, "view", ts(0)), (3, 31, "view", ts(1)),
        (3, 32, "click", ts(1 + PATTERN_GAP_S / 3600 + 1)),
        # user 4: overlapping triples v v v c -> matches at 40 is NOT a
        # triple (v v v), 41 is (v v c): exactly one match, first=41
        (4, 40, "view", ts(0)), (4, 41, "view", ts(1)),
        (4, 42, "view", ts(2)), (4, 43, "click", ts(3)),
    ]
    batch = spark.createDataFrame(rows, EVENT_SCHEMA)
    got = _feed(spark, str(tmp_path / "src"), str(tmp_path / "ckpt"),
                [batch] + _sentinels(spark))
    hits = {(r["user_id"], r["first_event_id"]) for r in got.collect()}
    assert hits == {(1, 10), (4, 41)}


def test_streaming_cep_split_triple_across_batches(spark, tmp_path):
    # the triple's prefix finalizes in batch 1; the click arrives two
    # batches later — the finalized-suffix state must complete it
    t0 = dt.datetime(2020, 1, 1)

    def ts(h):
        return t0 + dt.timedelta(hours=h)

    b1 = spark.createDataFrame([(7, 70, "view", ts(0)),
                                (7, 71, "view", ts(1))], EVENT_SCHEMA)
    b2 = spark.createDataFrame([(8, 80, "view", ts(2))], EVENT_SCHEMA)
    b3 = spark.createDataFrame([(7, 72, "click", ts(3))], EVENT_SCHEMA)
    got = _feed(spark, str(tmp_path / "src"), str(tmp_path / "ckpt"),
                [b1, b2, b3] + _sentinels(spark))
    hits = {(r["user_id"], r["first_event_id"]) for r in got.collect()}
    assert hits == {(7, 70)}


def test_streaming_absence_matches_batch_on_real_events(spark, sf_dir,
                                                        tmp_path):
    from bigarrays_jl_spark.operators.events_cep import events_absence_match
    from bigarrays_jl_spark.streaming.cep import streaming_absence_match

    e = (load(spark, sf_dir, "events")
         .select("user_id", "event_id", "event_type", "ts",
                 F.col("ts").cast("long").alias("sec")))
    lo, hi = e.agg(F.min("sec"), F.max("sec")).first()
    mid = (lo + hi) // 2
    files = [e.filter(F.col("sec") <= mid).drop("sec"),
             e.filter(F.col("sec") > mid).drop("sec")] + _sentinels(spark)
    import os
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    os.makedirs(src)
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    q = (streaming_absence_match(stream).writeStream
         .outputMode("append").format("memory")
         .queryName("t_abs").option("checkpointLocation", ckpt).start())
    try:
        for df in files:
            df.coalesce(1).write.mode("append").parquet(src)
            q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT * FROM t_abs")
    agg = {r["user_id"]: (r["n"], r["first"])
           for r in got.groupBy("user_id")
           .agg(F.count("*").alias("n"), F.min("view_id").alias("first"))
           .collect()}
    want = {r["user_id"]: (r["n_abandoned"], r["first_abandoned"])
            for r in events_absence_match(spark, sf_dir).collect()}
    assert want
    assert agg == want


def test_streaming_absence_purchase_rescues_pending_view(spark, tmp_path):
    from bigarrays_jl_spark.streaming.cep import streaming_absence_match
    t0 = dt.datetime(2020, 1, 1)

    def ts(s):
        return t0 + dt.timedelta(seconds=s)

    # user 1: view rescued by a purchase arriving TWO batches later
    # (still inside the window); user 2: purchase outside the window
    b1 = spark.createDataFrame([(1, 10, "view", ts(0)),
                                (2, 20, "view", ts(0))], EVENT_SCHEMA)
    b2 = spark.createDataFrame([(9, 90, "noop", ts(50))], EVENT_SCHEMA)
    b3 = spark.createDataFrame(
        [(1, 11, "purchase", ts(100)),
         (2, 21, "purchase", ts(86401))], EVENT_SCHEMA)
    import os
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    os.makedirs(src)
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    q = (streaming_absence_match(stream).writeStream
         .outputMode("append").format("memory")
         .queryName("t_abs2").option("checkpointLocation", ckpt).start())
    try:
        for df in [b1, b2, b3] + _sentinels(spark):
            df.coalesce(1).write.mode("append").parquet(src)
            q.processAllAvailable()
    finally:
        q.stop()
    hits = {(r["user_id"], r["view_id"])
            for r in spark.sql("SELECT * FROM t_abs2").collect()}
    assert hits == {(2, 20)}


def test_streaming_cep_idle_state_expires(spark, tmp_path):
    # r9 ADVICE: a user's ≤2-event finalized suffix must NOT persist
    # forever — once the watermark passes last_finalized + PATTERN_GAP_S
    # no admissible event can chain to it, so the idle-TTL timer drops
    # the key and state tracks ACTIVE users, not every user ever seen
    import os
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    users = [(u, 100 * u + i, et, t0 + dt.timedelta(seconds=5 * i))
             for u in range(1, 6)
             for i, et in enumerate(["view", "view", "click"])]
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    q = (streaming_pattern_match(stream).writeStream
         .outputMode("append").format("memory")
         .queryName("t_cep_ttl").option("checkpointLocation", ckpt).start())
    state_rows = []
    try:
        feeds = [spark.createDataFrame(users, EVENT_SCHEMA)] + \
            _sentinels(spark, 3)
        for df in feeds:
            df.coalesce(1).write.mode("append").parquet(src)
            q.processAllAvailable()
            ops = (q.lastProgress or {}).get("stateOperators") or []
            state_rows.append(ops[0]["numRowsTotal"] if ops else None)
    finally:
        q.stop()
    got = spark.sql("SELECT * FROM t_cep_ttl")
    assert got.count() == 5                    # every user's triple emitted once
    # after the far-future sentinels fire the TTL timers, the 5 real
    # users' suffixes are gone — only the sentinel key itself survives
    assert state_rows[0] == 5
    assert state_rows[-1] <= 1, state_rows
