"""Streaming clamped-inventory maintenance: the stateful twin of
``operators.round10g.q75_stock_runout`` (builder extension, SURVEY §2C
round 10).

The batch operator is a NON-associative per-user scan — b_n =
max(0, b_{n-1} + delta_n) — which is exactly the computation an
unbounded stream cannot re-derive from scratch each trigger: the
balance depends on every move ever seen, in order.  So the state IS
the answer: per user key ``applyInPandasWithState`` carries
(balance, n_moves, n_stockouts) plus the PENDING moves whose order the
watermark has not yet settled (the cep.py finalization discipline —
a move is only provably next once no earlier-timestamped move can
still arrive).

Each trigger: merge new click/purchase rows into pending, sort by the
(sec, event_id) total-order canon, split at the watermark, fold the
newly-final moves through the clamp recurrence, emit one snapshot row
(user_id, n_moves, n_stockouts, final_balance) when anything changed.
``n_moves`` is monotone, so the consumer's current view is the max-n
row per user — and after any prefix of the stream the snapshot equals
the batch operator run over the same prefix (pytest-pinned).

State bound: the rolled-up scalars are O(1) per user FOREVER — unlike
the CEP suffix there is no idle TTL, because an inventory balance is
permanent business state (the operator's contract; at 100 TB the key
cardinality is the SKU/user catalogue, which is what RocksDB state
via ``session.use_rocksdb_state`` is for).  Pending moves are bounded
by (watermark horizon × per-user event rate), the package-wide bound.
An event-time timeout one second past the oldest pending move
finalizes quiet users without requiring new rows.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from bigarrays_jl_spark.operators.round10g import VQ

OUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("n_moves", T.LongType()),
    T.StructField("n_stockouts", T.LongType()),
    T.StructField("final_balance", T.LongType()),
])

STATE_SCHEMA = T.StructType([
    T.StructField("bal", T.LongType()),
    T.StructField("so", T.LongType()),
    T.StructField("n", T.LongType()),
    T.StructField("pend_sec", T.ArrayType(T.LongType())),
    T.StructField("pend_id", T.ArrayType(T.LongType())),
    T.StructField("pend_d", T.ArrayType(T.LongType())),
])

_MOVE_TYPES = ("click", "purchase")


def _update(key, pdfs, state):
    import numpy as np
    import pandas as pd

    if state.exists:
        bal, so, n, pend_sec, pend_id, pend_d = state.get
        pend = list(zip(pend_sec, pend_id, pend_d))
    else:
        bal, so, n, pend = 0, 0, 0, []

    for pdf in pdfs:
        m = pdf["event_type"].isin(_MOVE_TYPES)
        if not m.any():
            continue
        pdf = pdf[m]
        secs = pdf["ts"].astype("int64") // 1_000_000_000
        # tie-free 1e-6 fixed point (dyadic double * 10^6 can't land
        # on .5): np.rint == the batch side's F.round here
        d = np.rint(pdf["value"].to_numpy(dtype="float64") * VQ) \
              .astype("int64")
        d = np.where(pdf["event_type"].to_numpy() == "purchase", -d, d)
        pend.extend(zip(secs.tolist(), pdf["event_id"].tolist(),
                        d.tolist()))

    wm_sec = state.getCurrentWatermarkMs() // 1000
    pend.sort()
    n_final = 0
    while n_final < len(pend) and pend[n_final][0] <= wm_sec:
        n_final += 1
    newly, pend = pend[:n_final], pend[n_final:]

    for _, _, d in newly:
        nb = bal + d
        if nb < 0:
            so += 1
            nb = 0
        bal = nb
    n += len(newly)

    if pend:
        state.setTimeoutTimestamp((pend[0][0] + 1) * 1000)
    if not pend and not newly and not state.exists:
        # sentinel/noop-only key: nothing to carry
        return
    state.update((bal, so, n,
                  [p[0] for p in pend], [p[1] for p in pend],
                  [p[2] for p in pend]))
    if newly:
        yield pd.DataFrame([(key[0], n, so, bal)],
                           columns=[f.name for f in OUT_SCHEMA])


def streaming_stock_runout(events: DataFrame,
                           watermark: str = "0 seconds") -> DataFrame:
    """Maintain per-user clamped inventory balances on the live events
    stream.  ``events`` must carry (user_id, event_id, event_type, ts,
    value); emits a monotone snapshot row per user per trigger that
    changed it — max(n_moves) per user is the current state and equals
    the batch ``q75_stock_runout`` over the same event prefix."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (events
            .select("user_id", "event_id", "event_type", "ts", "value")
            .withWatermark("ts", watermark)
            .groupBy("user_id")
            .applyInPandasWithState(_update, OUT_SCHEMA, STATE_SCHEMA,
                                    "append",
                                    GroupStateTimeout.EventTimeTimeout))
