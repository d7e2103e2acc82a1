"""Central query registry: merges all driver-gate query modules.

Each entry: name -> (spark_fn(spark, sf_dir) -> DataFrame,
oracle_builder() -> SQL str | None). ``None`` oracle => driver records a
rows-only check (genuinely non-SQL-expressible ops).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def all_queries() -> dict:
    from . import queries_geo

    merged: dict = {}
    merged.update(queries_geo.QUERIES)
    for mod_name in (
        "queries_text", "queries_vec", "queries_rel", "queries_extra",
        "queries_extra2",
    ):
        try:
            mod = __import__(f"orthority_spark.{mod_name}", fromlist=["QUERIES"])
            merged.update(mod.QUERIES)
        except ImportError:
            pass
    return merged


def _wrap(fn: Callable) -> Callable:
    """Ship the package zip to executors before running (the --py-files
    mechanism; UDF closures import orthority_spark on workers)."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from .pyfiles import ensure_on_executors

        ensure_on_executors(spark)
        return fn(spark, sf_dir)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _wrap(fn) for name, (fn, _) in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    out = {}
    for name, (_, oracle) in all_queries().items():
        if oracle is not None:
            out[name] = oracle()
    return out
