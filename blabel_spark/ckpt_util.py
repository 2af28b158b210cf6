"""Checkpoint-block bookkeeping shared by the iterative engines.

A loop that localCheckpoints per-round state retains O(rounds)
corpus-scale tables in the block manager unless superseded blocks are
released the moment their last consumer has materialized (the
ContextCleaner only frees them after a driver full-GC, which a large heap
may not run for hours).  ``ckpt_rdd`` fetches the JVM handle backing a
checkpointed DataFrame; ``release`` unpersists tracked handles.

Previously private helpers of canon.distributed; ops.dedup's cluster loop
uses the same discipline, so they live in a neutral module (ADVICE r5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ckpt_rdd(df: DataFrame):
    """JVM handle of the RDD backing a local-checkpointed DataFrame (its
    analyzed plan is a ``LogicalRDD``); None for any other plan."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        # a checkpointed df wrapped in narrow projections (e.g. a .drop)
        # still rides the same blocks — descend to the scan, but only
        # through nodes that cannot hide a DIFFERENT checkpoint
        while (plan.getClass().getSimpleName() in ("Project", "Filter")
               and plan.children().size() == 1):
            plan = plan.children().apply(0)
        if plan.getClass().getSimpleName() != "LogicalRDD":
            return None
        return plan.rdd()
    except Exception:  # pragma: no cover — py4j surface drift
        return None


def release(handles) -> None:
    """Non-blocking unpersist of tracked checkpoint RDD handles.  Only
    sound once every downstream consumer of the blocks has materialized
    (checkpoint lineage is truncated — a late consumer could not
    recompute them)."""
    for h in handles:
        if h is None:
            continue
        try:
            h.unpersist(False)
        except Exception:  # pragma: no cover — context already stopped
            pass
