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


def test_sample_dem_z_drops_out_of_extent(spark):
    """A point just outside the DEM grid must be DROPPED, not aliased to
    tile 0 by sign-keeping % and given a clamped-border z (the reference
    errors on outside-DEM sources, ortho.py:120; the SQL oracle drops)."""
    dem = fixture_dem(spark)
    # extent: x in [18000, 22800], y in [27660, 31500]
    pts = spark.createDataFrame(
        [
            ("in", 19000.0, 30000.0),
            ("left", 17990.0, 30000.0),    # gcol = -1 -> would hit tile 0
            ("above", 19000.0, 31710.0),   # grow = -7
            ("right", 22810.0, 30000.0),
            ("below", 19000.0, 27650.0),
        ],
        "url string, px double, py double",
    )
    got = {r.url for r in sample_dem_z(pts, dem, band=1).collect()}
    assert got == {"in"}


def test_sample_dem_z_rejects_mixed_transforms(spark):
    """sample_dem_z derives the (single) affine with first() in an
    unordered agg — sound only because every tile of a band shares one
    transform. A DEM whose tiles carry different affines must fail
    loudly instead of sampling against an arbitrary tile's transform
    (ADVICE r4)."""
    import pytest
    from pyspark.sql import functions as F

    dem = fixture_dem(spark)
    skewed = dem.withColumn(
        "transform",
        F.when(
            F.col("col_off") == 0,
            F.expr("transform(transform, v -> v * 2.0)"),
        ).otherwise(F.col("transform")),
    )
    pts = spark.createDataFrame(
        [("p", 19000.0, 30000.0)], "url string, px double, py double"
    )
    with pytest.raises(ValueError, match="distinct transforms"):
        sample_dem_z(pts, skewed, band=1).collect()


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


# ---------------------------------------------------------------------------
# frame pose / calibration solvers (cv2.solvePnP / calibrateCamera recast)
# ---------------------------------------------------------------------------


def _int_params(m):
    return dict(cam_type=m.cam_type, im_size=m.im_size, focal_len=m.focal_len,
                sensor_size=m.sensor_size, cx=m.cx, cy=m.cy, dist=m.dist)


def test_solve_pnp_recovers_fixture_poses():
    """Reference exterior-fit tolerances (test_fit.py:343,392-393):
    xyz abs 1e-3, opk abs 1e-5 — across pinhole/brown/opencv/fisheye."""
    from orthority_spark.operators.fit import solve_pnp
    from orthority_spark.sources.footprints import fixture_models

    rng = np.random.RandomState(3)
    for name, m in fixture_models().items():
        ji = np.vstack([rng.uniform(10, m.im_size[0] - 10, 16),
                        rng.uniform(10, m.im_size[1] - 10, 16)])
        xyz = m.pixel_to_world_z(ji, 800.0)
        s = solve_pnp(_int_params(m), ji, xyz)
        np.testing.assert_allclose(s["xyz"], m.xyz, atol=1e-3)
        np.testing.assert_allclose(s["opk"], m.opk, atol=1e-5)
        assert s["rms"] < 1e-4


def test_solve_pnp_min_gcps():
    """The planar-homography init needs 4 points; 3 would give a
    degenerate DLT nullspace and a silently wrong pose."""
    from orthority_spark.operators.fit import solve_pnp
    from orthority_spark.sources.footprints import fixture_models

    m = fixture_models()["img_0000"]
    with pytest.raises(ValueError, match="four"):
        solve_pnp(_int_params(m), np.zeros((2, 3)), np.zeros((3, 3)))


def test_fit_frame_multiple_images_brown():
    """Interior + exterior fit from 3 diverse poses (the reference's
    multi-image scenario, test_fit.py:233-265): reprojection within
    0.1 px, ground round-trip within 1 m."""
    from orthority_spark.geom.camera import FrameModel
    from orthority_spark.operators.fit import _model_with_pose, fit_frame

    base = dict(cam_type="brown", im_size=(200, 150), focal_len=5.0,
                sensor_size=(6.0, 4.5), cx=-0.01, cy=0.02,
                dist=dict(k1=-0.1, k2=0.05, p1=0.005, p2=-0.003, k3=0.0))
    j, i = np.arange(25, 200, 35.0), np.arange(20, 150, 30.0)
    jg, ig = np.meshgrid(j, i)
    grid_ji = np.vstack([jg.ravel(), ig.ravel()])
    gcps, truth = {}, {}
    for k, (exyz, eopk_deg) in enumerate(zip(
        [(2e4, 3e4, 1e3), (3e4, 3e4, 1e3), (3e4, 3e4, 2e3)],
        [(-3.0, 2.0, 10.0), (-15.0, 2.0, 10.0), (-30.0, 20.0, 10.0)],
    )):
        cam = FrameModel(**base, xyz=exyz, opk=tuple(np.radians(eopk_deg)))
        xyz = cam.pixel_to_world_z(grid_ji, 0.0)
        gcps[f"file{k}"] = (grid_ji, xyz)
        truth[f"file{k}"] = xyz
    int_p, ext = fit_frame("brown", (200, 150), gcps)
    for name, e in ext.items():
        test_cam = _model_with_pose(int_p, e["xyz"], e["opk"])
        np.testing.assert_allclose(
            test_cam.world_to_pixel(truth[name]), grid_ji, atol=0.1
        )
        np.testing.assert_allclose(
            test_cam.pixel_to_world_z(grid_ji, 0.0), truth[name], atol=1.0
        )


def test_fit_frame_requires_coplanar():
    from orthority_spark.operators.fit import fit_frame
    from orthority_spark.sources.footprints import fixture_models

    m = fixture_models()["img_0000"]
    rng = np.random.RandomState(5)
    ji = np.vstack([rng.uniform(10, 190, 8), rng.uniform(10, 140, 8)])
    xyz = m.pixel_to_world_z(ji, 800.0)
    xyz[2] += rng.uniform(-5, 5, 8)  # break co-planarity
    with pytest.raises(ValueError, match="co-planar"):
        fit_frame("pinhole", m.im_size, {"f": (ji, xyz)})
    with pytest.raises(ValueError, match="four"):
        fit_frame("pinhole", m.im_size,
                  {"f": (ji[:, :3], np.vstack([xyz[:2, :3], np.zeros(3)]))})


def test_fit_exterior_per_image_spark(spark):
    """Distributed PnP == driver-side solve_pnp per image."""
    from orthority_spark.operators.fit import fit_exterior_per_image, solve_pnp
    from orthority_spark.sources.footprints import fixture_models

    models = fixture_models()
    m0 = models["img_0000"]
    rng = np.random.RandomState(7)
    rows = []
    for name in ["img_0000", "img_0002"]:
        m = models[name]
        ji = np.vstack([rng.uniform(10, m.im_size[0] - 10, 10),
                        rng.uniform(10, m.im_size[1] - 10, 10)])
        xyz = m.pixel_to_world_z(ji, 810.0)
        for k in range(10):
            rows.append((name, float(ji[0, k]), float(ji[1, k]),
                         float(xyz[0, k]), float(xyz[1, k]), float(xyz[2, k])))
    # both fixture cameras share interior params with img_0000? no — use
    # per-run interior of img_0000 only for img_0000; solve img_0002 with
    # its own params via a second call
    for name in ["img_0000", "img_0002"]:
        m = models[name]
        df = spark.createDataFrame(
            [r for r in rows if r[0] == name],
            "filename string, j double, i double, x double, y double, z double",
        )
        got = fit_exterior_per_image(df, _int_params(m)).collect()[0]
        np.testing.assert_allclose((got.x, got.y, got.z), m.xyz, atol=1e-3)
        np.testing.assert_allclose(
            (got.omega, got.phi, got.kappa), m.opk, atol=1e-5
        )
        assert got.rms_px < 1e-4


@pytest.mark.parametrize("cam_type,dist", [
    ("pinhole", {}),
    ("opencv", dict(k1=-0.08, k2=0.03, p1=0.002, p2=-0.001,
                    k3=0.0, k4=0.0, k5=0.0, k6=0.0)),
    ("fisheye", dict(k1=-0.05, k2=0.01, k3=0.0, k4=0.0)),
])
def test_fit_frame_multiple_images_other_models(cam_type, dist):
    """The multi-image interior fit meets the reference contract for the
    other frame models too (brown is covered separately)."""
    from orthority_spark.geom.camera import FrameModel
    from orthority_spark.operators.fit import _model_with_pose, fit_frame

    base = dict(cam_type=cam_type, im_size=(200, 150), focal_len=5.0,
                sensor_size=(6.0, 4.5), cx=-0.01, cy=0.02, dist=dist)
    j, i = np.arange(25, 200, 35.0), np.arange(20, 150, 30.0)
    jg, ig = np.meshgrid(j, i)
    grid_ji = np.vstack([jg.ravel(), ig.ravel()])
    gcps, truth = {}, {}
    for k, (exyz, eopk_deg) in enumerate(zip(
        [(2e4, 3e4, 1e3), (3e4, 3e4, 1e3), (3e4, 3e4, 2e3)],
        [(-3.0, 2.0, 10.0), (-15.0, 2.0, 10.0), (-30.0, 20.0, 10.0)],
    )):
        cam = FrameModel(**base, xyz=exyz, opk=tuple(np.radians(eopk_deg)))
        xyz = cam.pixel_to_world_z(grid_ji, 0.0)
        gcps[f"file{k}"] = (grid_ji, xyz)
        truth[f"file{k}"] = xyz
    int_p, ext = fit_frame(cam_type, (200, 150), gcps)
    for name, e in ext.items():
        test_cam = _model_with_pose(int_p, e["xyz"], e["opk"])
        np.testing.assert_allclose(
            test_cam.world_to_pixel(truth[name]), grid_ji, atol=0.1
        )
        np.testing.assert_allclose(
            test_cam.pixel_to_world_z(grid_ji, 0.0), truth[name], atol=1.0
        )


def test_sample_dem_z_broadcast_equals_cogroup(spark):
    """r6: the broadcast-gather default and the cogroup fallback (forced
    via max_broadcast_bytes=0) must return the identical point->z map,
    bit for bit — including border-stencil fallback and out-of-extent
    drops."""
    dem = fixture_dem(spark)
    rng = np.random.RandomState(11)
    # mix of interior, tile-border-straddling and out-of-extent points
    px = np.concatenate([
        rng.uniform(18000, 23000, 200), [17999.0, 22800.5, 19919.99]
    ])
    py = np.concatenate([
        rng.uniform(27500, 31500, 200), [31501.0, 27600.5, 29579.99]
    ])
    pts = spark.createDataFrame(
        [(f"p{i}", float(x), float(y)) for i, (x, y) in enumerate(zip(px, py))],
        "url string, px double, py double")
    fast = {r.url: r.z for r in sample_dem_z(pts, dem, band=1).collect()}
    slow = {
        r.url: r.z
        for r in sample_dem_z(
            pts, dem, band=1, max_broadcast_bytes=0
        ).collect()
    }
    assert fast == slow
    assert len(fast) > 100  # in-extent points actually sampled
