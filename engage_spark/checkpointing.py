"""Lineage cutting for iterative operators (connected components,
distributed BPE rounds, SemDeDup's shared materialization).

Every loop that feeds a DataFrame back into itself must cut lineage
each round or the plan grows unboundedly. Two ways to cut it:

  - ``localCheckpoint()`` (the default): blocks live in executor
    storage — no filesystem round-trip, but the truncated lineage means
    an executor loss makes the blocks UNRECOVERABLE and fails the job.
    Fine for short interactive runs and for this harness's single-JVM
    local mode, where "executor loss" is process death anyway.
  - ``checkpoint()`` (reliable): blocks are written to the configured
    checkpoint directory (HDFS / object store) and re-read — one
    write+read per round, but iteration state survives executor loss.
    The right choice for long iterative jobs on a real cluster: at
    100 TB a multi-hour connected-components run should not restart
    because one of 1000 executors was preempted.

``iter_checkpoint`` picks between them per call or globally via the
``spark.engage_spark.checkpoint.reliable`` conf (so a production job
can flip every iterative operator to the fault-tolerant variant
without touching call sites). The reliable path requires
``spark.sparkContext.setCheckpointDir(...)``; a missing dir raises a
clear error instead of Spark's generic one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

RELIABLE_CONF = "spark.engage_spark.checkpoint.reliable"


def iter_checkpoint(df: DataFrame, reliable: bool | None = None) -> DataFrame:
    """Cut lineage between iterative rounds; see module docstring.

    reliable=None (default) reads the ``spark.engage_spark.checkpoint.
    reliable`` conf (default false → localCheckpoint). Both variants
    materialize eagerly — iterative loops rely on each round being
    computed exactly once."""
    spark = df.sparkSession
    if reliable is None:
        reliable = (
            spark.conf.get(RELIABLE_CONF, "false").lower() == "true"
        )
    if not reliable:
        return df.localCheckpoint()
    if spark.sparkContext.getCheckpointDir() is None:
        raise ValueError(
            f"{RELIABLE_CONF}=true needs a checkpoint directory: call "
            "spark.sparkContext.setCheckpointDir('<hdfs/s3a/gs path>') "
            "before running iterative operators"
        )
    return df.checkpoint(eager=True)
