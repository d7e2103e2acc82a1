"""Additional driver-gate queries: grouping sets / set ops / semi joins
(SURVEY §2.4/2.6 gaps) and rows-only entries for the Arrow-kernel
operators whose semantics are not ANSI-SQL-expressible (remap gather,
ray-DEM intersection, multimodal decode, pan-sharpen) — the driver
records a weaker rows-only check for those, and pytest holds their exact
oracles (numpy single-process twins)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession, functions as F

from .oracle import dlit
from .queries_geo import pages_cte, pages_cells, _pip_oracle
from .queries_rel import _CENTS
from .sources import footprints as fp


# ---------------------------------------------------------------------------
# oracle-gated
# ---------------------------------------------------------------------------

def q_rollup_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets over (returnflag, linestatus) with exact
    integer-cents sums (grouping-sets coverage, SURVEY §2.4)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.withColumn("qty_c", F.expr(_CENTS.format(col="l_quantity")))
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.sum("qty_c").alias("sum_qty_c"), F.count(F.lit(1)).alias("n"))
    )


def o_rollup_pricing() -> str:
    qty = _CENTS.format(col="l_quantity")
    return f"""
SELECT l_returnflag, l_linestatus, CAST(SUM({qty}) AS BIGINT) AS sum_qty_c,
       COUNT(*) AS n
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)"""


def q_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation per group."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


def o_distinct_customers() -> str:
    return (
        "SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS n_customers, "
        "COUNT(*) AS n_orders FROM orders GROUP BY o_orderpriority"
    )


def q_semi_join_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: customers holding at least one high-value order."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").where(
        F.col("o_totalprice") > 400000
    )
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


def o_semi_join_active() -> str:
    return (
        "SELECT c_custkey, c_name FROM customer WHERE c_custkey IN "
        "(SELECT o_custkey FROM orders WHERE o_totalprice > 400000)"
    )


def q_overlap_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set op: pages inside BOTH img_0000 and img_0001 footprints
    (INTERSECT) — the cross-image overlap-consistency construct
    (/root/reference/tests/test_ortho.py:44-80 recast)."""
    recs = fp.footprint_records()
    from .operators import tile_join

    j = tile_join.pip_join_broadcast(
        pages_cells(spark, sf_dir),
        fp.footprint_catalog_flat_df(spark, recs),
        fp.footprint_edges_df(spark, recs),
    )
    a = j.where(F.col("filename") == "img_0000").select("url")
    b = j.where(F.col("filename") == "img_0001").select("url")
    return a.intersect(b)


def o_overlap_pages() -> str:
    # one WITH chain, two filtered selects joined by INTERSECT
    base = _pip_oracle(select="url, filename")
    with_part, _sep, _final = base.rpartition("SELECT url, filename FROM votes WHERE n % 2 = 1")
    return f"""{with_part}
SELECT url FROM votes WHERE n % 2 = 1 AND filename = 'img_0000'
INTERSECT
SELECT url FROM votes WHERE n % 2 = 1 AND filename = 'img_0001'"""


def q_dem_tile_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raster<->vector key derivation: owning DEM tile per page (the
    equi-key that makes the raster join shuffle-free)."""
    from .sources.dem_tiles import dem_transform, TILE

    a, _, c, _, e, f0 = dem_transform(18000.0, 31500.0)
    pc = pages_cells(spark, sf_dir)
    col = F.floor((F.col("px") - F.lit(c)) / F.lit(a)).cast("long")
    row = F.floor((F.col("py") - F.lit(f0)) / F.lit(e)).cast("long")
    return pc.select(
        "url",
        F.concat_ws(
            ":",
            (row - row % F.lit(TILE)).cast("string"),
            (col - col % F.lit(TILE)).cast("string"),
        ).alias("dem_tile_id"),
    )


def o_dem_tile_assign() -> str:
    from .sources.dem_tiles import dem_transform, TILE

    a, _, c, _, e, f0 = dem_transform(18000.0, 31500.0)
    col = f"CAST(FLOOR((px - {dlit(c)}) / {dlit(a)}) AS BIGINT)"
    row = f"CAST(FLOOR((py - {dlit(f0)}) / {dlit(e)}) AS BIGINT)"
    return f"""{pages_cte()}
SELECT url,
       CAST({row} - {row} % {TILE} AS VARCHAR) || ':' ||
       CAST({col} - {col} % {TILE} AS VARCHAR) AS dem_tile_id
FROM cells"""


# ---------------------------------------------------------------------------
# rows-only (Arrow-kernel ops; exact oracles live in pytest)
# ---------------------------------------------------------------------------

def q_remap_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tiled remap (J6) per-tile block sums — deterministic; exact
    whole-image parity is pytest-asserted (tests/test_remap.py)."""
    from .geom.dem import dem_plane
    from .operators.remap import remap_tiles, tile_windows

    model = fp.fixture_models()["img_0000"]
    rng = np.random.RandomState(3)
    src = ((np.indices((150, 200)).sum(axis=0) % 2) * 100.0) + rng.rand(150, 200)
    transform = (2.0, 0.0, 19900.0, 0.0, -2.0, 30080.0)
    tiles = tile_windows(spark, 96, 80, tile=64)
    out = remap_tiles(tiles, model, src, transform, dem_plane)
    return out.select(
        "tile_id",
        F.expr(
            "aggregate(filter(block, v -> NOT isnan(v)), CAST(0.0 AS DOUBLE),"
            " (acc, v) -> acc + v)"
        ).alias("block_sum"),
        F.expr("size(filter(block, v -> NOT isnan(v)))").alias("n_valid"),
    )


def q_ray_dem_footprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ray–DEM intersection (the orthorectification core) as an Arrow
    kernel: per-image boundary points intersected with the sinusoid DEM;
    returns per-image mean ground z + footprint area at the surface."""
    import pandas as pd

    from .geom.boundary import pixel_boundary, polygon_area
    from .geom.dem import dem_sinusoid, ray_dem_intersect

    models = fp.fixture_models()
    names = sorted(models)
    ndf = spark.createDataFrame([(n,) for n in names], "filename string")

    def march(it):
        for pdf in it:
            rows = []
            for name in pdf["filename"]:
                m = models[name]
                ji = pixel_boundary(m.im_size, num_pts=32)
                xyz = ray_dem_intersect(m, ji, dem_sinusoid, 750.0, 900.0)
                rows.append(
                    (name, float(xyz[2].mean()), polygon_area(xyz[:2]))
                )
            yield pd.DataFrame(
                rows, columns=["filename", "mean_ground_z", "surface_area"]
            )

    return ndf.mapInPandas(
        march, schema="filename string, mean_ground_z double, surface_area double"
    )


def q_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode plumbing over a binary column (stubbed codec,
    deterministic features; exact oracle pytest-held)."""
    from .multimodal.binary import image_decode
    from .queries_geo import derived_pages

    pages = derived_pages(spark, sf_dir).withColumn(
        "html", F.encode(F.col("text"), "utf-8")
    )
    return image_decode(pages, fake=True).select(
        "url", "width", "height", "n_channels"
    )


def q_dem_z_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-point bilinear DEM z sample (J6 gather / A3 recast): pages
    equi-joined to their owning DEM tile, Arrow kernel interpolates. The
    oracle recomputes the float32 sinusoid block values analytically and
    blends with identical arithmetic."""
    from .operators.raster_join import sample_dem_z
    from .sources.dem_tiles import fixture_dem

    pc = pages_cells(spark, sf_dir).select("url", "px", "py")
    return sample_dem_z(pc, fixture_dem(spark), band=1)


def o_dem_z_sample() -> str:
    from .geom.dem import DEM_GAIN, DEM_OFFSET, DEM_RES
    from .sources.dem_tiles import TILE

    a, c0, e, f0 = DEM_RES, 18000.0, -DEM_RES, 31500.0
    ncols, nrows = 160, 128
    den = 20.0 * DEM_RES

    def zval(r: str, cc: str) -> str:
        # float32 block value at global cell (r, cc), pixel-center sampled
        x = f"({dlit(a)} * (({cc}) + 0.5) + {dlit(c0)})"
        y = f"({dlit(e)} * (({r}) + 0.5) + {dlit(f0)})"
        return (
            f"CAST({dlit(DEM_OFFSET)} + {dlit(DEM_GAIN)} * "
            f"(SIN({x} / {dlit(den)}) * COS({y} / {dlit(den)})) AS REAL)"
        )

    z00 = zval("row_off + r0", "col_off + cc0")
    z01 = zval("row_off + r0", "col_off + cc0 + 1")
    z10 = zval("row_off + r0 + 1", "col_off + cc0")
    z11 = zval("row_off + r0 + 1", "col_off + cc0 + 1")
    znn = zval(
        "row_off + LEAST(GREATEST(CAST(FLOOR(fr + 0.5) AS BIGINT), 0), h - 1)",
        "col_off + LEAST(GREATEST(CAST(FLOOR(fc + 0.5) AS BIGINT), 0), w - 1)",
    )
    return f"""{pages_cte()}, dem_pts AS (
  SELECT url, px, py,
         CAST(FLOOR((px - {dlit(c0)}) / {dlit(a)}) AS BIGINT) AS gcol,
         CAST(FLOOR((py - {dlit(f0)}) / {dlit(e)}) AS BIGINT) AS grow
  FROM cells
), own AS (
  SELECT url, px, py, gcol - gcol % {TILE} AS col_off,
         grow - grow % {TILE} AS row_off
  FROM dem_pts
  WHERE gcol >= 0 AND gcol < {ncols} AND grow >= 0 AND grow < {nrows}
), geom AS (
  SELECT url, px, py, col_off, row_off,
         LEAST({TILE}, {ncols} - col_off) AS w,
         LEAST({TILE}, {nrows} - row_off) AS h,
         (px - {dlit(c0)}) / {dlit(a)} - 0.5 - col_off AS fc,
         (py - {dlit(f0)}) / {dlit(e)} - 0.5 - row_off AS fr
  FROM own
), st AS (
  SELECT *, CAST(FLOOR(fc) AS BIGINT) AS r_c0, CAST(FLOOR(fr) AS BIGINT) AS r_r0
  FROM geom
), cl AS (
  SELECT *, LEAST(GREATEST(r_c0, 0), w - 2) AS cc0,
         LEAST(GREATEST(r_r0, 0), h - 2) AS r0,
         fc - r_c0 AS wc, fr - r_r0 AS wr
  FROM st
)
SELECT url,
  CASE WHEN r_c0 >= 0 AND r_c0 < w - 1 AND r_r0 >= 0 AND r_r0 < h - 1 THEN
    {z00} * (1 - wr) * (1 - wc) + {z01} * (1 - wr) * wc
    + {z10} * wr * (1 - wc) + {z11} * wr * wc
  ELSE {znn} END AS z
FROM cl"""


def q_pan_sharpen_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pan-sharpen pass-1 stats (A1) over lineitem numeric 'bands' —
    float covariances (partition-invariance pytest-held to 1e-9)."""
    from .operators.stats import band_stats

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_quantity").alias("b1"),
        F.col("l_extendedprice").alias("b2"),
        F.col("l_discount").alias("b3"),
    )
    return band_stats(li, ["b1", "b2", "b3"])


QUERIES = {
    "rollup_pricing": (q_rollup_pricing, o_rollup_pricing),
    "distinct_customers": (q_distinct_customers, o_distinct_customers),
    "semi_join_active": (q_semi_join_active, o_semi_join_active),
    "overlap_pages": (q_overlap_pages, o_overlap_pages),
    "dem_tile_assign": (q_dem_tile_assign, o_dem_tile_assign),
    "dem_z_sample": (q_dem_z_sample, o_dem_z_sample),
    "remap_checksums": (q_remap_checksums, None),
    "ray_dem_footprints": (q_ray_dem_footprints, None),
    "image_features": (q_image_features, None),
    "pan_sharpen_stats": (q_pan_sharpen_stats, None),
}
