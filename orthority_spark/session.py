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
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
