"""Scalar-function surface queries (SURVEY §2.7): date/time handling of
``warc_ts``-style event time, JSON extraction from string props, EXCEPT
set op, exact percentiles — all oracle-gated."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .queries_geo import pages_cells, pages_cte, _pip_oracle


def q_events_by_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time handling (the warc_ts surface): hourly truncation +
    per-type counts (date_trunc / hour / dayofweek built-ins)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.withColumn("hour_ts", F.date_trunc("hour", F.col("ts")))
        .withColumn("dow", F.dayofweek("ts"))
        .groupBy("hour_ts", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("dow").alias("dow"),
        )
    )


def o_events_by_hour() -> str:
    # DuckDB dayofweek: 0=Sunday; Spark dayofweek: 1=Sunday -> +1 aligns
    return """
SELECT date_trunc('hour', ts) AS hour_ts, event_type, COUNT(*) AS n,
       CAST(MIN(dayofweek(ts) + 1) AS INT) AS dow
FROM events GROUP BY 1, 2"""


def q_json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar extraction from the props string column."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )


def o_json_extract_props() -> str:
    return (
        "SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT)"
        " AS k FROM events"
    )


def q_except_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set op EXCEPT: pages inside img_0000 but NOT img_0001."""
    from .operators import tile_join
    from .sources import footprints as fp

    recs = fp.footprint_records()
    j = tile_join.pip_join_broadcast(
        pages_cells(spark, sf_dir),
        fp.footprint_catalog_flat_df(spark, recs),
        fp.footprint_edges_df(spark, recs),
    )
    a = j.where(F.col("filename") == "img_0000").select("url")
    b = j.where(F.col("filename") == "img_0001").select("url")
    return a.exceptAll(b).distinct()


def o_except_pages() -> str:
    base = _pip_oracle(select="url, filename")
    with_part, _, _ = base.rpartition(
        "SELECT url, filename FROM votes WHERE n % 2 = 1"
    )
    return f"""{with_part}
SELECT url FROM votes WHERE n % 2 = 1 AND filename = 'img_0000'
EXCEPT
SELECT url FROM votes WHERE n % 2 = 1 AND filename = 'img_0001'"""


def q_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per event type (A3 median analogue,
    exact at gate scale per SURVEY §2.4)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("p50"),
        F.expr("percentile(value, 0.9)").alias("p90"),
        F.count(F.lit(1)).alias("n"),
    )


def o_value_percentiles() -> str:
    return """
SELECT event_type, quantile_cont(value, 0.5) AS p50,
       quantile_cont(value, 0.9) AS p90, COUNT(*) AS n
FROM events GROUP BY event_type"""


QUERIES = {
    "events_by_hour": (q_events_by_hour, o_events_by_hour),
    "json_extract_props": (q_json_extract_props, o_json_extract_props),
    "except_pages": (q_except_pages, o_except_pages),
    "value_percentiles": (q_value_percentiles, o_value_percentiles),
}


def q_rpc_pip_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIP join against the RPC camera's footprint (P7 in the distributed
    path): the satellite-style polygon comes from RpcModel.pixel_to_world_z
    at the ground plane, runs through the identical broadcast PIP plan."""
    from .operators import tile_join
    from .sources import footprints as fp

    recs = fp.rpc_footprint_records()
    return tile_join.pip_join_broadcast(
        pages_cells(spark, sf_dir),
        fp.footprint_catalog_flat_df(spark, recs),
        fp.footprint_edges_df(spark, recs),
    )


def o_rpc_pip_join() -> str:
    from .oracle import dlit
    from .operators.tile_join import pip_crossing_sql
    from .sources import footprints as fp

    recs = fp.rpc_footprint_records()
    rows = ", ".join(
        f"('{n}', {dlit(x1)}, {dlit(y1)}, {dlit(x2)}, {dlit(y2)})"
        for n, x1, y1, x2, y2 in recs["edges"]
    )
    cross = pip_crossing_sql("c.px", "c.py", e="e.")
    return f"""{pages_cte()},
edges(filename, x1, y1, x2, y2) AS (VALUES {rows}),
votes AS (
  SELECT c.url, e.filename, SUM({cross}) AS n
  FROM cells c, edges e GROUP BY ALL
)
SELECT url, filename FROM votes WHERE n % 2 = 1"""


QUERIES["rpc_pip_join"] = (q_rpc_pip_join, o_rpc_pip_join)
