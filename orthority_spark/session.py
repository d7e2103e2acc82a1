"""SparkSession builder tuned for the engine.

Local sandbox runs use ``local[N]``; the same settings (AQE, Arrow,
shuffle-partition sizing) are what we would submit to a real cluster via
``spark-submit --py-files`` (see BASELINE.md submission mode).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from . import config


def get_spark(
    master: str = "local[*]",
    app_name: str = "orthority-spark",
    shuffle_partitions: int = config.SHUFFLE_PARTITIONS,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build a SparkSession with engine defaults.

    AQE is enabled so skew-join splitting and partition coalescing apply at
    runtime on a real cluster; Arrow is enabled for the vectorized pandas
    UDF kernels (the mandated execution path for the camera math).
    """
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # guide §9/§3.1: let the planner pick shuffled-hash over
        # sort-merge when its size conditions hold (skip both sorts),
        # and let AQE rewrite SMJ->SHJ at runtime when every post-
        # shuffle build partition is under 64 MB — size-gated by
        # Spark's own planner/runtime stats, not a local[32] constant
        # (big build partitions still fall back to sort-merge, so the
        # OOM risk SHJ trades for speed stays bounded). Measured r6:
        # ann_ivf -42%, tf_idf -22%, jaccard -16%, no regressions
        # beyond window noise.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            "67108864",
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
