"""Resumable ledger job: skip-completed semantics, crash recovery,
per-partition lineage + metrics (north-rule resumability)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from orthority_spark.functions import checksum
from orthority_spark.plans.ledger import LedgerJob


@pytest.fixture()
def work(spark, tmp_path):
    df = (
        spark.range(1000)
        .withColumn("cell", F.col("id") % 7)
        .withColumn("payload", F.col("id") * 3)
    )
    return df, str(tmp_path / "job")


def _hash():
    return checksum.row_hash_fast(F.col("id"), F.col("payload"))


def test_full_run_then_noop_resume(spark, work):
    df, root = work
    job = LedgerJob(spark, root, part_col="cell")
    r1 = job.run(df, _hash())
    assert r1["partitions_processed"] == 7
    assert r1["rows_processed"] == 1000
    # resume: nothing to do
    r2 = job.run(df, _hash())
    assert r2["partitions_processed"] == 0
    # output complete and partitioned by cell
    out = spark.read.parquet(f"{root}/out")
    assert out.count() == 1000
    assert out.select("cell").distinct().count() == 7


def test_crash_recovery_completes_remainder(spark, work):
    df, root = work
    job = LedgerJob(spark, root, part_col="cell")
    r1 = job.run(df, _hash(), max_partitions=3)  # simulated crash
    assert r1["partitions_processed"] == 3
    r2 = job.run(df, _hash())
    assert r2["partitions_processed"] == 4
    out = spark.read.parquet(f"{root}/out")
    assert out.count() == 1000
    # ledger has exactly one row per partition, from two distinct runs
    led = job.metrics().toPandas()
    assert len(led) == 7
    assert led.part_key.is_unique
    assert led.run_id.nunique() == 2
    # metrics recorded
    assert (led.n_rows > 0).all() and (led.wall_ms >= 0).all()


def test_checksums_stable_across_resume_paths(spark, work):
    df, root = work
    j1 = LedgerJob(spark, root + "_a", part_col="cell")
    j1.run(df, _hash())
    j2 = LedgerJob(spark, root + "_b", part_col="cell")
    j2.run(df, _hash(), max_partitions=2)
    j2.run(df, _hash())
    a = {r.part_key: (r.n_rows, r.checksum) for r in j1.ledger().collect()}
    b = {r.part_key: (r.n_rows, r.checksum) for r in j2.ledger().collect()}
    assert a == b


def test_many_partitions_no_plan_blowup(spark, tmp_path):
    """10^4 partitions: no completed-key list may enter a plan as literals
    and no per-partition driver collect may run — the run must complete
    and resume must skip everything (scale contract from the 10^6-tile
    deployment shape)."""
    df = (
        spark.range(40_000)
        .withColumn("cell", F.col("id") % 10_000)
        .withColumn("payload", F.col("id") * 3)
    )
    root = str(tmp_path / "wide")
    job = LedgerJob(spark, root, part_col="cell")
    r1 = job.run(df, _hash())
    assert r1["partitions_processed"] == 10_000
    assert r1["rows_processed"] == 40_000
    r2 = job.run(df, _hash())
    assert r2["partitions_processed"] == 0
    # the resume plan must stay small: anti-join, not a 10^4-literal isin
    plan = df.join(
        job.completed_keys(), "cell", "left_anti"
    )._jdf.queryExecution().optimizedPlan().toString()
    assert len(plan) < 20_000


def test_incremental_run_reads_only_new_partitions(spark, tmp_path):
    """The ledger derivation re-read is partition-pruned to THIS run's
    keys (directory-listing candidates), so incremental runs stay O(run),
    and a widened input only ledgers the new keys."""
    root = str(tmp_path / "inc")
    df1 = (
        spark.range(700)
        .withColumn("cell", F.col("id") % 7)
        .withColumn("payload", F.col("id") * 3)
    )
    job = LedgerJob(spark, root, part_col="cell")
    assert job.run(df1, _hash())["partitions_processed"] == 7
    df2 = (
        spark.range(1000)
        .withColumn("cell", F.col("id") % 10)
        .withColumn("payload", F.col("id") * 3)
    )
    r2 = job.run(df2, _hash())
    assert r2["partitions_processed"] == 3  # only cells 7, 8, 9
    led = job.metrics().toPandas()
    assert sorted(led.part_key) == list(range(10))
    assert led.part_key.is_unique
    assert sorted(job._disk_keys()) == list(range(10))
