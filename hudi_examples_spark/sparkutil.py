"""Small Spark-side utilities shared by the table and streaming layers."""

from __future__ import annotations

from pyspark.sql import DataFrame


def free_local_checkpoint(df: DataFrame | None) -> None:
    """Release the RDD blocks behind ``df.localCheckpoint()``.

    ``DataFrame.unpersist`` only talks to the SQL cache manager and ignores
    checkpoint blocks; without this, a long-running writer (streaming sink,
    IVM refresh loop, many-commit batch schedule) accumulates block-manager
    entries until the driver GC happens to drop the JVM Dataset and the
    ContextCleaner notices (ADVICE r10). The checkpointed RDD rides the
    analyzed plan's ``LogicalRDD`` leaf; unpersisting it frees the blocks
    immediately.

    MUST only be called once the DataFrame is completely consumed: a
    localCheckpoint truncates lineage, so freed blocks cannot be recomputed.
    Best-effort — any reflection surprise degrades to the old GC behavior.
    """
    if df is None:
        return
    try:
        leaves = df._jdf.queryExecution().analyzed().collectLeaves()
        for i in range(leaves.size()):
            leaf = leaves.apply(i)
            if leaf.getClass().getSimpleName() == "LogicalRDD":
                leaf.rdd().unpersist(False)
    except Exception:
        pass
