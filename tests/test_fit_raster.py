"""RPC refine (A9) recovers a known shift analytically; raster<->vector
joins: J2 range join, O1 two-phase pruning, A4 coverage, z-sampling."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from orthority_spark.geom.dem import DEM_OFFSET, DEM_GAIN, dem_sinusoid
from orthority_spark.operators.fit import (
    refine_per_image,
    refine_shift_oracle,
    unmatched_images,
)
from orthority_spark.operators.raster_join import (
    OutsideDemError,
    bbox_range_join,
    check_dem_coverage,
    two_phase_prune,
    sample_dem_z,
)
from orthority_spark.sources.dem_tiles import fixture_dem
from orthority_spark.sources import footprints as fp


# --- fit -------------------------------------------------------------------

def _gcps_with_shift(spark, shift=(1.5, -2.25), n=20):
    rng = np.random.RandomState(5)
    rows = []
    for name in ("img_0000", "img_0001"):
        pred = rng.rand(2, n) * 100
        obs = pred + np.array(shift).reshape(2, 1)
        for k in range(n):
            rows.append((name, float(obs[0, k]), float(obs[1, k]),
                         float(pred[0, k]), float(pred[1, k])))
    return spark.createDataFrame(
        rows, "filename string, j_obs double, i_obs double, "
              "j_pred double, i_pred double")


def test_refine_shift_recovers_known_shift(spark):
    gcps = _gcps_with_shift(spark)
    out = {r.filename: (r.dj, r.di) for r in refine_per_image(gcps, "shift").collect()}
    for name in ("img_0000", "img_0001"):
        assert out[name][0] == pytest.approx(1.5, abs=1e-9)
        assert out[name][1] == pytest.approx(-2.25, abs=1e-9)


def test_refine_shift_drift_identity_plus_shift(spark):
    gcps = _gcps_with_shift(spark)
    out = {r.filename: r for r in refine_per_image(gcps, "shift-drift").collect()}
    r = out["img_0000"]
    assert r.aj == pytest.approx(1.0, abs=1e-9) and r.bj == pytest.approx(1.5, abs=1e-6)
    assert r.ai == pytest.approx(1.0, abs=1e-9) and r.bi == pytest.approx(-2.25, abs=1e-6)


def test_unmatched_images_anti_join(spark):
    gcps = _gcps_with_shift(spark)
    images = spark.createDataFrame(
        [("img_0000",), ("img_0001",), ("img_9999",)], "filename string")
    missing = [r.filename for r in unmatched_images(images, gcps).collect()]
    assert missing == ["img_9999"]


# --- raster joins ----------------------------------------------------------

def test_bbox_range_join_and_coverage(spark):
    dem = fixture_dem(spark)
    fps = fp.footprint_summary_df(spark)
    joined = bbox_range_join(fps, dem.where(F.col("band") == 1))
    per_fp = {r.filename: r.n for r in
              joined.groupBy("filename").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(per_fp) == {"img_0000", "img_0001", "img_0002", "img_0003"}
    assert all(n >= 1 for n in per_fp.values())
    cov = check_dem_coverage(fps, dem)
    assert all(r.full_coverage for r in cov.collect())


def test_partial_dem_flags_coverage(spark):
    dem = fixture_dem(spark, partial=True)
    cov = check_dem_coverage(fp.footprint_summary_df(spark), dem)
    rows = cov.collect()
    assert any(not r.full_coverage for r in rows) or all(
        r.n_valid_cells < r.n_cells for r in rows
    )


def test_outside_dem_raises(spark):
    dem = fixture_dem(spark)
    far = spark.createDataFrame(
        [("ghost", 9e6, 9e6, 9.1e6, 9.1e6)],
        "filename string, xmin double, ymin double, xmax double, ymax double")
    with pytest.raises(OutsideDemError, match="ghost"):
        check_dem_coverage(far, dem)


def test_two_phase_prune_shrinks(spark):
    dem = fixture_dem(spark)
    base = fp.footprint_summary_df(spark).select(
        "filename", "xmin", "ymin", "xmax", "ymax")

    def footprints_at_z(z_min, z_max):
        # footprint bbox grows with z range (stand-in for re-projected
        # boundary at z): pad by (z_max - z_min) / 10
        pad = (z_max - z_min) / 10.0
        return base.select(
            "filename",
            (F.col("xmin") - pad).alias("xmin"),
            (F.col("ymin") - pad).alias("ymin"),
            (F.col("xmax") + pad).alias("xmax"),
            (F.col("ymax") + pad).alias("ymax"),
        )

    pruned, z_min, z_max = two_phase_prune(footprints_at_z, dem)
    assert DEM_OFFSET - DEM_GAIN <= z_min <= z_max <= DEM_OFFSET + DEM_GAIN
    coarse = bbox_range_join(
        footprints_at_z(-106.71, 8932.28), dem.where(F.col("band") == 1))
    assert pruned.count() < coarse.count()


def test_sample_dem_z_matches_surface(spark):
    dem = fixture_dem(spark)
    rng = np.random.RandomState(9)
    px = rng.uniform(19900, 20200, 100)
    py = rng.uniform(29950, 30150, 100)
    pts = spark.createDataFrame(
        [(f"p{i}", float(x), float(y)) for i, (x, y) in enumerate(zip(px, py))],
        "url string, px double, py double")
    got = {r.url: r.z for r in sample_dem_z(pts, dem, band=1).collect()}
    exact = dem_sinusoid(px, py)
    assert len(got) == 100
    err = np.array([abs(got[f"p{i}"] - exact[i]) for i in range(100)])
    # bilinear on a 30 m grid of a smooth sinusoid: small interpolation err
    assert np.median(err) < 0.2 and err.max() < 2.0
    # plane band is exact
    got2 = {r.url: r.z for r in sample_dem_z(pts, dem, band=2).collect()}
    assert all(abs(v - DEM_OFFSET) < 1e-6 for v in got2.values())


def test_sample_dem_z_matches_scalar_twin(spark):
    """Vectorized per-tile gather == per-point scalar arithmetic (bit
    parity), including border points that take the nearest-cell fallback."""
    from orthority_spark.sources.dem_tiles import dem_transform, TILE

    dem = fixture_dem(spark)
    a, _, c, _, e, f0 = dem_transform(18000.0, 31500.0)
    rng = np.random.RandomState(11)
    # cluster points NEAR tile borders so the fallback path is exercised
    base_x = 18000.0 + 64 * 30.0  # border between col tiles 0 and 64
    px = np.concatenate([
        rng.uniform(19900, 20200, 60),
        base_x + rng.uniform(-45, 45, 40),
    ])
    py = np.concatenate([
        rng.uniform(29950, 30150, 60),
        31500.0 - 64 * 30.0 + rng.uniform(-45, 45, 40),
    ])
    pts = spark.createDataFrame(
        [(f"p{i}", float(x), float(y)) for i, (x, y) in enumerate(zip(px, py))],
        "url string, px double, py double")
    got = {r.url: r.z for r in sample_dem_z(pts, dem, band=1).collect()}

    blocks = {
        (r.dem_tile_id, r.band): r
        for r in dem.where("band = 1").collect()
    }
    n_border = 0
    for i, (x, y) in enumerate(zip(px, py)):
        gc = int(np.floor((x - c) / a))
        gr = int(np.floor((y - f0) / e))
        t = blocks[(f"{gr - gr % TILE}:{gc - gc % TILE}", 1)]
        blk = np.asarray(t.block, dtype="float64").reshape(t.height, t.width)
        fc = (x - c) / a - 0.5 - t.col_off
        fr = (y - f0) / e - 0.5 - t.row_off
        c0, r0 = int(np.floor(fc)), int(np.floor(fr))
        if 0 <= c0 < t.width - 1 and 0 <= r0 < t.height - 1:
            wc, wr = fc - c0, fr - r0
            z = (blk[r0, c0] * (1 - wr) * (1 - wc)
                 + blk[r0, c0 + 1] * (1 - wr) * wc
                 + blk[r0 + 1, c0] * wr * (1 - wc)
                 + blk[r0 + 1, c0 + 1] * wr * wc)
        else:
            n_border += 1
            ci = min(max(int(np.floor(fc + 0.5)), 0), t.width - 1)
            ri = min(max(int(np.floor(fr + 0.5)), 0), t.height - 1)
            z = blk[ri, ci]
        assert got[f"p{i}"] == z, (i, got[f"p{i}"], z)
    assert n_border > 0  # the fixture really exercised the fallback
