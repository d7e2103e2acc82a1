"""Geotag extraction from page text — the engine's EXIF-reader analogue.

The reference extracts camera geometry from image metadata tags
(/root/reference/orthority/exif.py:101-363, param_io.py:317-329); here the
per-page geometry comes from a geotag token embedded in extracted ``text``.
Extraction is a JVM-side regexp (codegen; no UDF): at 100 TB this runs in
the scan stage and never materialises an intermediate.

The source text itself is carried through untouched — per-url byte-identity
is a hard invariant (BASELINE.json:15) — extraction derives NEW columns and
never rewrites ``text``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# float-token form: geo:<lat:.6f>,<lon:.6f> (synthetic_pages)
GEO_FLOAT_RE = r"geo:(-?\d+\.\d+),(-?\d+\.\d+)"
# integer-microdegree form: geo:<lat_udeg>,<lon_udeg> (derived pages)
GEO_INT_RE = r"geo:(-?\d+),(-?\d+)"


def geotag_float(text: Column) -> tuple[Column, Column]:
    """(lat, lon) doubles parsed from the float geotag token."""
    lat = F.regexp_extract(text, GEO_FLOAT_RE, 1).cast("double")
    lon = F.regexp_extract(text, GEO_FLOAT_RE, 2).cast("double")
    return lat, lon


def geotag_udeg(text: Column) -> tuple[Column, Column]:
    """(lat_udeg, lon_udeg) bigints parsed from the integer geotag token."""
    lat = F.regexp_extract(text, GEO_INT_RE, 1).cast("long")
    lon = F.regexp_extract(text, GEO_INT_RE, 2).cast("long")
    return lat, lon


def with_geotag(pages: DataFrame, token: str = "float") -> DataFrame:
    """pages + (lat, lon) columns parsed from text."""
    fn = geotag_float if token == "float" else None
    if fn is not None:
        lat, lon = fn(F.col("text"))
        return pages.withColumn("lat", lat).withColumn("lon", lon)
    lat_u, lon_u = geotag_udeg(F.col("text"))
    return pages.withColumn(
        "lat", lat_u.cast("double") / F.lit(1000000.0)
    ).withColumn("lon", lon_u.cast("double") / F.lit(1000000.0))
