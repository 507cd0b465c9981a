"""The round-13 materialization seam (VERDICT r12 #4/#7).

Every eager intermediate materialization in query paths routes through
``eventsourcing_spark.io.materialize``: localCheckpoint by default (the
single-box / preemption-free primitive), durable ``checkpoint()`` when
``$SPARK_GRAFT_RELIABLE_CHECKPOINT`` names a checkpoint directory — the
fault-tolerant mode for real-cluster deployments where executor loss
must not kill a lineage-truncated job.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from eventsourcing_spark.io import _RELIABLE_CKPT_ENV, materialize


def test_default_mode_is_local_checkpoint(spark):
    assert not os.environ.get(_RELIABLE_CKPT_ENV)
    df = spark.range(100).withColumn("v", F.col("id") * 2)
    out = materialize(df)
    # lineage is truncated: the materialized frame plans as an RDD scan
    assert "LogicalRDD" in out._jdf.queryExecution().optimizedPlan().toString()
    assert [r.v for r in out.orderBy("id").collect()] == [
        2 * i for i in range(100)
    ]


def test_reliable_mode_writes_checkpoint_dir(spark, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    os.environ[_RELIABLE_CKPT_ENV] = ckpt
    try:
        df = spark.range(50).withColumn("v", F.col("id") + 7)
        out = materialize(df)
        assert "LogicalRDD" in out._jdf.queryExecution().optimizedPlan().toString()
        # blocks live in the durable dir, not executor storage
        found = [
            os.path.join(r, f)
            for r, _d, fs in os.walk(ckpt)
            for f in fs
        ]
        assert found, "reliable checkpoint wrote no files"
        assert [r.v for r in out.orderBy("id").collect()] == [
            i + 7 for i in range(50)
        ]
    finally:
        del os.environ[_RELIABLE_CKPT_ENV]


def test_reliable_mode_plan_shape_matches_default(spark, tmp_path):
    """The seam changes durability, never the logical result or the
    one-materialization plan shape consumers rely on."""
    df = spark.range(20).withColumn("g", F.col("id") % 3)
    base = materialize(df).groupBy("g").count().orderBy("g").collect()
    os.environ[_RELIABLE_CKPT_ENV] = str(tmp_path / "ckpt2")
    try:
        rel = materialize(df).groupBy("g").count().orderBy("g").collect()
    finally:
        del os.environ[_RELIABLE_CKPT_ENV]
    assert base == rel
