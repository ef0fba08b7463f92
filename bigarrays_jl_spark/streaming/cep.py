"""Streaming CEP: the stateful twin of ``operators.events_cep.
events_pattern_match`` (builder extension, SURVEY §2C round 9).

The batch operator detects every CONSECUTIVE view → view → click
triple (per-step gap ≤ PATTERN_GAP_S) with a user-partitioned
double-lead window.  A window over an unbounded stream does not exist,
and "consecutive" is exactly the property a naive incremental
formulation gets wrong: an event is only provably adjacent to its
successor once the watermark guarantees nothing can still arrive
between them.  So this is the textbook ``applyInPandasWithState``
shape (Flink CEP keeps the same per-key NFA state):

Per user key the state holds
  - up to 2 FINALIZED events (sec ≤ watermark) — the suffix of the
    settled stream, the prefix context future triples may start in;
  - the PENDING events (sec > watermark at last trigger) whose order
    is not yet settled.

Each trigger (new rows, or an event-time timeout when only the
watermark moved): merge new rows into pending, sort by the repo's
(sec, event_id) total-order canon, split at the current watermark —
events at or below it are FINAL, because rows later than the watermark
are dropped by the engine, so nothing can ever sort between them
anymore.  Scan ``finalized-suffix + newly-final`` for pattern triples
and emit each exactly once (every emitted triple ends in a newly-final
event; triples wholly inside the 2-event suffix were emitted by an
earlier trigger).  Keep the last 2 finalized events, re-arm the
timeout one second past the oldest still-pending event so pendings
finalize even if the user never produces another event.

State is bounded per key by (watermark horizon × event rate) + 2 —
the same bound every watermarked stateful operator in this package
carries — and bounded ACROSS keys by an idle TTL (r10): once the
watermark passes last_finalized + PATTERN_GAP_S, no admissible future
event can chain to the suffix, so the key is dropped and the store
tracks active users, not every user ever seen.  RocksDB state
(``use_rocksdb_state``) lifts it off-heap at 100 TB key cardinality.

Emission contract: one row per match ``(user_id, first_event_id,
first_sec)`` in append mode; the batch twin's per-user aggregate is
``groupBy(user_id).agg(count, min(first_event_id))`` over these rows
— ``tests/test_streaming_cep.py`` pins exact equivalence on the real
events table, single- and multi-batch, plus watermark-boundary and
timeout-finalization cases.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bigarrays_jl_spark.operators.events_cep import PATTERN, PATTERN_GAP_S

OUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("first_event_id", T.LongType()),
    T.StructField("first_sec", T.LongType()),
])

# parallel arrays: (sec, event_id, event_type) for the ≤2-event
# finalized suffix and the pending tail
STATE_SCHEMA = T.StructType([
    T.StructField("fin_sec", T.ArrayType(T.LongType())),
    T.StructField("fin_id", T.ArrayType(T.LongType())),
    T.StructField("fin_type", T.ArrayType(T.StringType())),
    T.StructField("pend_sec", T.ArrayType(T.LongType())),
    T.StructField("pend_id", T.ArrayType(T.LongType())),
    T.StructField("pend_type", T.ArrayType(T.StringType())),
])


def _scan_triples(full):
    """Yield (first_id, first_sec) for every consecutive pattern
    triple in the (sec, id, type)-tuple list ``full`` — identical
    predicate to the batch double-lead window.  Callers pass at most 2
    previously-finalized prefix events, so every triple found here
    (third index ≥ 2) ends in a newly-final event: exactly-once."""
    for i in range(len(full) - 2):
        a, b, c = full[i], full[i + 1], full[i + 2]
        if (a[2] == PATTERN[0] and b[2] == PATTERN[1]
                and c[2] == PATTERN[2]
                and b[0] - a[0] <= PATTERN_GAP_S
                and c[0] - b[0] <= PATTERN_GAP_S):
            yield a[1], a[0]


def _update(key, pdfs, state):
    import pandas as pd

    if state.exists:
        fin_sec, fin_id, fin_type, pend_sec, pend_id, pend_type = state.get
        fin = list(zip(fin_sec, fin_id, fin_type))
        pend = list(zip(pend_sec, pend_id, pend_type))
    else:
        fin, pend = [], []

    for pdf in pdfs:
        secs = pdf["ts"].astype("int64") // 1_000_000_000
        pend.extend(zip(secs.tolist(), pdf["event_id"].tolist(),
                        pdf["event_type"].tolist()))

    wm_sec = state.getCurrentWatermarkMs() // 1000
    pend.sort()                       # (sec, event_id) total-order canon
    n_final = 0
    while n_final < len(pend) and pend[n_final][0] <= wm_sec:
        n_final += 1
    newly, pend = pend[:n_final], pend[n_final:]

    out = []
    if newly:
        full = fin + newly
        out = [(key[0], eid, sec) for eid, sec in _scan_triples(full)]
        fin = full[-2:]

    if pend:
        # finalize the rest when the watermark passes the oldest
        # pending event, even if the user goes quiet
        state.setTimeoutTimestamp((pend[0][0] + 1) * 1000)
    elif fin:
        # idle TTL: any future event the engine still admits arrives
        # with sec > watermark, so once the watermark passes
        # last_finalized + PATTERN_GAP_S no admissible event can ever
        # chain to the suffix (the gap would exceed PATTERN_GAP_S) —
        # drop the state so it tracks ACTIVE users, not every user
        # ever seen
        ttl_ms = (fin[-1][0] + PATTERN_GAP_S + 1) * 1000
        if ttl_ms <= state.getCurrentWatermarkMs():
            state.remove()
            if out:
                yield pd.DataFrame(out, columns=[f.name for f in OUT_SCHEMA])
            return
        state.setTimeoutTimestamp(ttl_ms)
    else:
        state.remove()
        if out:
            yield pd.DataFrame(out, columns=[f.name for f in OUT_SCHEMA])
        return
    state.update(([e[0] for e in fin], [e[1] for e in fin],
                  [e[2] for e in fin],
                  [e[0] for e in pend], [e[1] for e in pend],
                  [e[2] for e in pend]))
    if out:
        yield pd.DataFrame(out, columns=[f.name for f in OUT_SCHEMA])


def streaming_pattern_match(events: DataFrame,
                            watermark: str = "0 seconds") -> DataFrame:
    """Detect view → view → click pattern instances on the live events
    stream.  ``events`` must carry (user_id, event_id, event_type, ts);
    the watermark delay is the reordering horizon the source needs
    (rows later than it are dropped, exactly as every other
    watermarked operator here)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (events
            .select("user_id", "event_id", "event_type", "ts")
            .withWatermark("ts", watermark)
            .groupBy("user_id")
            .applyInPandasWithState(_update, OUT_SCHEMA, STATE_SCHEMA,
                                    "append",
                                    GroupStateTimeout.EventTimeTimeout))


# --------------------------------------------------------------------------
# absence / timeout pattern — streaming twin of events_absence_match
# --------------------------------------------------------------------------

ABS_OUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("view_id", T.LongType()),
    T.StructField("view_sec", T.LongType()),
])

ABS_STATE_SCHEMA = T.StructType([
    T.StructField("v_sec", T.ArrayType(T.LongType())),
    T.StructField("v_id", T.ArrayType(T.LongType())),
    T.StructField("p_sec", T.ArrayType(T.LongType())),
])


def _abs_update_factory(timeout_s):
    def update(key, pdfs, state):
        import pandas as pd

        if state.exists:
            v_sec, v_id, p_sec = state.get
            views = list(zip(v_sec, v_id))
            purch = list(p_sec)
        else:
            views, purch = [], []

        for pdf in pdfs:
            secs = pdf["ts"].astype("int64") // 1_000_000_000
            for sec, eid, etype in zip(secs.tolist(),
                                       pdf["event_id"].tolist(),
                                       pdf["event_type"].tolist()):
                if etype == "view":
                    views.append((sec, eid))
                elif etype == "purchase":
                    purch.append(sec)

        # a purchase in (v, v+T] resolves the view as NOT abandoned
        views = [(vs, vid) for vs, vid in views
                 if not any(vs < ps <= vs + timeout_s for ps in purch)]

        wm = state.getCurrentWatermarkMs() // 1000
        # wm >= v+T makes absence FINAL: every future row has sec > wm,
        # so no purchase can still land inside (v, v+T]
        done = sorted((vs, vid) for vs, vid in views if vs + timeout_s <= wm)
        views = [(vs, vid) for vs, vid in views if vs + timeout_s > wm]
        # a retained purchase can only matter to a FUTURE view (sec >
        # wm), which it resolves iff p > v — keep those with p_sec > wm?
        # No: future views have v > wm and need p in (v, v+T], i.e.
        # p > v > wm — purchases at or below the watermark are dead.
        purch = [ps for ps in purch if ps > wm]

        if views:
            state.setTimeoutTimestamp((min(vs for vs, _ in views)
                                       + timeout_s + 1) * 1000)
            state.update(([vs for vs, _ in views], [vid for _, vid in views],
                          purch))
        elif purch:
            # purchases-only state: self-destruct once the watermark
            # passes the last one (no future view can need it then)
            state.setTimeoutTimestamp((max(purch) + 1) * 1000)
            state.update(([], [], purch))
        else:
            state.remove()
        if done:
            yield pd.DataFrame(
                [(key[0], vid, vs) for vs, vid in done],
                columns=[f.name for f in ABS_OUT_SCHEMA])
    return update


def streaming_absence_match(events: DataFrame,
                            timeout_s: int | None = None,
                            watermark: str = "0 seconds") -> DataFrame:
    """Emit each view with NO purchase within ``timeout_s`` seconds —
    the streaming twin of ``events_cep.events_absence_match`` and the
    canonical event-time-TIMER pattern (cart abandonment): the absence
    of an event is only decidable once the watermark passes the
    window's end, so the detector is a per-user timer, not a join.

    State per user: unresolved views (live ≤ timeout horizon past the
    watermark) + purchases above the watermark (only those can resolve
    a still-unseen view).  Both bounds are watermark-horizon × rate —
    the package's standard stateful budget."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from bigarrays_jl_spark.operators.events_cep import ABSENCE_T_S
    if timeout_s is None:
        timeout_s = ABSENCE_T_S
    return (events
            .select("user_id", "event_id", "event_type", "ts")
            .withWatermark("ts", watermark)
            .groupBy("user_id")
            .applyInPandasWithState(_abs_update_factory(timeout_s),
                                    ABS_OUT_SCHEMA, ABS_STATE_SCHEMA,
                                    "append",
                                    GroupStateTimeout.EventTimeTimeout))
