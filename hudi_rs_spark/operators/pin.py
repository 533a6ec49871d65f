"""Lineage pinning for iterative operators.

Connected-components, k-means, and the banded dedup operators iterate:
round k+1 must read round k's RESULT, not its recipe, or the logical
plan doubles every round and Catalyst re-analysis dominates.  The pin
has two backends with different fault-tolerance at cluster scale:

- ``df.localCheckpoint(eager=True)`` — materializes to executor
  memory/disk blocks.  Fast (no external FS round-trip) and correct,
  but the blocks are NOT replicated: on a multi-executor cluster,
  losing one executor mid-iteration fails the whole job, because Spark
  cannot recompute past a localCheckpoint.  The right call on
  local[32], the wrong one for a 1000-executor run.
- ``df.checkpoint(eager=True)`` — materializes to the context's
  checkpoint directory (HDFS/object store).  Survives executor loss;
  costs one write+read of the pinned frame.

``pin`` picks per-session:

1. ``spark.hudi_py.checkpoint.dir`` conf, when set non-empty, forces
   the reliable backend (and installs the dir on the SparkContext);
   set to ``""`` it forces the local backend even if the context has a
   checkpoint dir.
2. otherwise, a checkpoint dir already configured on the SparkContext
   (``sc.setCheckpointDir``) selects the reliable backend — a user who
   configured one wants durable checkpoints.
3. otherwise ``localCheckpoint``.

Reference analog: apache/hudi-rs is single-process and keeps
intermediate state in Arrow batches in memory; the equivalent
durability decision there is the OS page cache.  This knob exists
because Spark's recovery model makes the trade explicit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

CHECKPOINT_DIR_CONF = "spark.hudi_py.checkpoint.dir"


def _reliable_dir(df: DataFrame) -> str | None:
    """The effective reliable-checkpoint dir for this frame's session,
    or None when the local backend should be used."""
    spark = df.sparkSession
    conf_dir = spark.conf.get(CHECKPOINT_DIR_CONF, None)
    if conf_dir is not None:
        return conf_dir or None  # "" -> explicit local override
    ctx_dir = spark.sparkContext.getCheckpointDir()
    return ctx_dir or None


def pin(df: DataFrame, eager: bool = True) -> DataFrame:
    """Materialize ``df`` and cut its lineage (see module docstring)."""
    target = _reliable_dir(df)
    if target is None:
        return df.localCheckpoint(eager=eager)
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() != target:
        sc.setCheckpointDir(target)
    return df.checkpoint(eager=eager)
