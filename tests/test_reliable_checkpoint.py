"""Reliable-checkpoint switch (plans/barrier.py): every engine barrier
flips from executor-local ``localCheckpoint`` to reliable
``DataFrame.checkpoint`` when SPARK_GRAFT_CHECKPOINT_DIR is set — the
batch twin of the streaming side's SPARK_GRAFT_STATE_STORE matrix.

The barrier only changes STORAGE, never semantics, so representative
iterative operators (label-propagation components, Lloyd k-means,
weighted SSSP, the ExactSubstr shared candidate set) must return
identical rows under both modes, and the reliable mode must actually
write RDD checkpoint files into the directory.
"""

from __future__ import annotations

import os

import pytest


@pytest.fixture()
def reliable_dir(tmp_path):
    # barrier._barrier consults the ENV on every call, so restoring the
    # env (monkeypatch) is the only cleanup needed — a stale
    # sc.checkpointDir is harmless once the env is unset.
    return str(tmp_path / "ckpt")


def _components_rows(spark):
    from sentiment_analysis_bigdata_spark.operators.dedup import (
        connected_components,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 20)], "a long, b long"
    )
    return sorted(
        (r["node"], r["component"])
        for r in connected_components(pairs, "a", "b").collect()
    )


def _spans_rows(spark):
    from sentiment_analysis_bigdata_spark.operators.dedup import (
        exact_substring_attribution,
    )

    shared = "THE-SHARED-DUPLICATED-CONTENT-BLOCK-0123456789"
    df = spark.createDataFrame(
        [(0, "aaa" + shared + "bbb"), (1, shared + "ccc"), (2, "unique " * 12)],
        "doc_id long, text string",
    )
    return sorted(
        tuple(r) for r in exact_substring_attribution(df, min_len=30).collect()
    )


def _sssp_rows(spark):
    from sentiment_analysis_bigdata_spark.operators.graph import sssp_weighted

    edges = spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 2.0), (1, 3, 10.0), (3, 4, 1.0)],
        "a long, b long, w double",
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    return sorted(
        (r["node"], r["dist"]) for r in sssp_weighted(edges, seeds).collect()
    )


class TestReliableCheckpointParity:
    def test_local_then_reliable_identical_and_files_written(
        self, spark, reliable_dir, monkeypatch
    ):
        # local mode first (env absent), capture expected rows
        monkeypatch.delenv("SPARK_GRAFT_CHECKPOINT_DIR", raising=False)
        want = (
            _components_rows(spark),
            _spans_rows(spark),
            _sssp_rows(spark),
        )
        assert want[0] == [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10), (20, 20)]

        monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_DIR", reliable_dir)
        got = (
            _components_rows(spark),
            _spans_rows(spark),
            _sssp_rows(spark),
        )
        assert got == want
        # reliable mode must have materialized RDD checkpoints on disk
        n_files = sum(len(fs) for _, _, fs in os.walk(reliable_dir))
        assert n_files > 0, "no checkpoint files written under reliable mode"


class TestUnderRoot:
    """_under_root must match by whole path component, not string prefix:
    a stale session root under a SIBLING directory like '<d>-old/<uuid>'
    must trigger a re-pin (ADVICE r9)."""

    def test_component_matching(self):
        from sentiment_analysis_bigdata_spark.plans.barrier import _under_root

        d = "/data/ckpt"
        assert _under_root("/data/ckpt/abc-123", d)
        assert _under_root("file:/data/ckpt/abc-123", d)
        assert _under_root("/data/ckpt/abc-123", d + "/")  # trailing slash
        assert not _under_root("/data/ckpt-old/abc-123", d)
        assert not _under_root("file:/data/ckptX/abc-123", d)
        assert not _under_root(None, d)
        assert not _under_root("", d)

    def test_any_scheme_and_authority_stripped(self):
        """ADVICE r10: on a cluster the resolved root carries
        hdfs://nn:8020 or s3a://bucket while the env var is scheme-less;
        the path-component compare must still match (a miss re-pins
        setCheckpointDir on EVERY barrier, spraying fresh uuid roots)."""
        from sentiment_analysis_bigdata_spark.plans.barrier import _under_root

        d = "/data/ckpt"
        assert _under_root("hdfs://nn:8020/data/ckpt/abc-123", d)
        assert _under_root("s3a://bucket/data/ckpt/abc-123", d)
        assert not _under_root("hdfs://nn:8020/data/ckpt-old/abc-123", d)
        # scheme on BOTH sides: compare by path as well
        assert _under_root("hdfs://nn:8020/data/ckpt/abc-123", "hdfs://nn:8020/data/ckpt")
        assert not _under_root("hdfs://nn:8020/data/ckptX/abc-123", "hdfs://nn:8020/data/ckpt")

    def test_authority_mismatch_repins(self):
        """ADVICE r11: when the env var names an authority, a resolved
        root on a DIFFERENT cluster/bucket (same path) must NOT match —
        otherwise the barrier keeps checkpointing to the wrong
        filesystem instead of re-pinning."""
        from sentiment_analysis_bigdata_spark.plans.barrier import _under_root

        d = "hdfs://nnA:8020/data/ckpt"
        assert _under_root("hdfs://nnA:8020/data/ckpt/abc-123", d)
        assert not _under_root("hdfs://nnB:8020/data/ckpt/abc-123", d)
        assert not _under_root("s3a://bucket/data/ckpt/abc-123", d)
        assert not _under_root("/data/ckpt/abc-123", d)
        # scheme-less env var still accepts any authority (path-only)
        assert _under_root("hdfs://nnB:8020/data/ckpt/abc-123", "/data/ckpt")

    def test_sibling_dir_repins(self, spark, tmp_path, monkeypatch):
        """End-to-end: point the session's checkpoint root at '<d>-old',
        then barrier with SPARK_GRAFT_CHECKPOINT_DIR='<d>' — files must
        land under d, not the stale sibling."""
        from sentiment_analysis_bigdata_spark.plans.barrier import barrier_eager

        d = str(tmp_path / "ckpt")
        stale = d + "-old"
        spark.sparkContext.setCheckpointDir(stale)
        monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_DIR", d)
        barrier_eager(spark.range(10)).count()
        n_new = sum(len(fs) for _, _, fs in os.walk(d))
        assert n_new > 0, "checkpoint did not re-pin to the env directory"
