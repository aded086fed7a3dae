"""Lineage-truncation barriers with a reliable-storage switch.

Iterative operators (connected components, Lloyd rounds, BFS/SSSP,
ExactSubstr's shared candidate set) MUST truncate lineage each round or
the logical plan doubles per iteration and Catalyst analysis time
explodes. Locally (and by default) that barrier is
``DataFrame.localCheckpoint``: fast, executor-local block storage — but
NON-replicated, so on a real cluster a lost executor aborts the job
instead of recomputing.

``SPARK_GRAFT_CHECKPOINT_DIR`` flips every barrier in the engine to
reliable ``DataFrame.checkpoint`` against that directory (HDFS/object
store on a cluster), restoring executor-loss recovery at the cost of a
write per barrier — the same posture switch the streaming side gets from
``SPARK_GRAFT_STATE_STORE=rocksdb``. Call sites chain
``.transform(barrier_eager)`` / ``.transform(barrier_lazy)`` so the
choice stays central; results are identical either way (the barrier only
changes storage, never semantics), which
``tests/test_reliable_checkpoint.py`` asserts by running representative
iterative operators under both modes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def _reliable_dir() -> str | None:
    return os.environ.get("SPARK_GRAFT_CHECKPOINT_DIR") or None


def _barrier(df: DataFrame, eager: bool) -> DataFrame:
    d = _reliable_dir()
    if d is None:
        return df.localCheckpoint(eager=eager)
    sc = df.sparkSession.sparkContext
    if not sc.getCheckpointDir():
        sc.setCheckpointDir(d)
    return df.checkpoint(eager=eager)


def barrier_eager(df: DataFrame) -> DataFrame:
    """Materialize now; truncate lineage. ``df.transform(barrier_eager)``."""
    return _barrier(df, eager=True)


def barrier_lazy(df: DataFrame) -> DataFrame:
    """Truncate lineage; materialize on first use. ``df.transform(barrier_lazy)``."""
    return _barrier(df, eager=False)
