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


def q_events_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style dense rollup (time_bucket_gapfill + LOCF recast):
    per event type, daily integer-cent sums densified over the type's
    own [min_day, max_day] range; missing days are emitted with the
    last-observed value carried forward and flagged.

    100 TB shape: the sparse rollup is one partial-aggregated groupBy;
    the generated day spine is per-type metadata (explode of a sequence,
    never a data-sized join); LOCF is a single ordered window per type."""
    from pyspark.sql import Window

    from .queries_rel import _CENTS

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    b = (
        ev.groupBy(
            "event_type",
            F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"),
        )
        .agg(F.sum(F.expr(_CENTS.format(col="value"))).alias("s"))
    )
    spine = (
        b.groupBy("event_type")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "event_type",
            F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        spine.join(b, ["event_type", "day"], "left")
        .select(
            "event_type",
            # TIMESTAMP output: DATE maps to pandas object vs datetime64
            # differently across the two engines' toPandas paths
            F.col("day").cast("timestamp").alias("day"),
            F.last("s", ignorenulls=True).over(w).alias("sum_value_c"),
            F.col("s").isNull().alias("gap_filled"),
        )
    )


def o_events_gapfill() -> str:
    from .queries_rel import _CENTS

    cents = _CENTS.format(col="value")
    return f"""
WITH b AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(SUM({cents}) AS BIGINT) AS s
  FROM events GROUP BY 1, 2
), rng AS (
  SELECT event_type,
         CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                                     CAST(d1 AS TIMESTAMP),
                                     INTERVAL 1 DAY)) AS DATE) AS day
  FROM (SELECT event_type, MIN(day) AS d0, MAX(day) AS d1 FROM b GROUP BY 1)
), j AS (
  SELECT r.event_type, r.day, b.s
  FROM rng r LEFT JOIN b ON r.event_type = b.event_type AND r.day = b.day
)
SELECT event_type, CAST(day AS TIMESTAMP) AS day,
       LAST_VALUE(s IGNORE NULLS) OVER (
         PARTITION BY event_type ORDER BY day ROWS UNBOUNDED PRECEDING
       ) AS sum_value_c,
       s IS NULL AS gap_filled
FROM j"""


QUERIES = {
    "events_by_hour": (q_events_by_hour, o_events_by_hour),
    "events_gapfill": (q_events_gapfill, o_events_gapfill),
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
