"""Materialization switch: executor-local vs reliable checkpointing.

Every global-ordering primitive (``operators/ordering.py``), the LSH
signature table and the connected-components loop (``operators/
dedup.py``) truncate lineage with ``localCheckpoint`` — the right
default on a stable cluster because it costs no storage write.  But
``localCheckpoint`` blocks live ON the executors that computed them:
with dynamic allocation (or any executor loss) the blocks vanish and,
lineage having been truncated, the job dies with no way to recompute.
On a long-lived 1000-executor cluster that is not a corner case — it is
the steady state.

``materialize(df)`` is the one switch point.  Default: executor-local
(``localCheckpoint``).  Opt in to reliable checkpointing with

    spark.sparkContext.setCheckpointDir("hdfs://.../ckpt")
    spark.conf.set("sparkgraft.checkpoint.reliable", "true")

and every call site writes its materialized blocks to the checkpoint
directory (``DataFrame.checkpoint`` — one extra write, survives any
executor loss).  Results are bit-identical in both modes — the switch
changes WHERE the truncated-lineage blocks live, never their content —
and ``tests/test_reliable_checkpoint.py`` pins that for the primitives'
consumers.

``eager`` semantics are preserved across both modes: ``eager=True``
materializes at construction (the ordering primitives need this — they
run driver-side probes immediately after), ``eager=False`` defers to
the first action (signature tables consumed by later self-joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

RELIABLE_CONF = "sparkgraft.checkpoint.reliable"


def reliable_enabled(spark) -> bool:
    return str(spark.conf.get(RELIABLE_CONF, "false")).lower() == "true"


def materialize(df: DataFrame, eager: bool = True) -> DataFrame:
    """Truncate ``df``'s lineage by materializing it — executor-local by
    default, reliable storage when ``sparkgraft.checkpoint.reliable`` is
    true (requires ``setCheckpointDir``; raises a clear error instead of
    Spark's late NPE if the directory is missing)."""
    spark = df.sparkSession
    if reliable_enabled(spark):
        if spark.sparkContext.getCheckpointDir() is None:
            raise RuntimeError(
                f"{RELIABLE_CONF}=true but no checkpoint directory is "
                "set; call spark.sparkContext.setCheckpointDir(...) with "
                "a fault-tolerant path (HDFS/S3) before running queries")
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
