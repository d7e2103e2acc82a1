"""kNN: k-ring candidate path must equal brute force when the ring covers
the catalog spacing (the scale path's correctness contract)."""

from __future__ import annotations

import numpy as np
import pytest

from orthority_spark import grid
from orthority_spark.functions.geotag import with_geotag
from orthority_spark.operators import tile_join
from orthority_spark.operators.knn import knn_bruteforce, knn_kring
from orthority_spark.sources import footprints as fp
from orthority_spark.sources.pages import synthetic_pages

N = 1500


@pytest.fixture(scope="module")
def inputs(spark):
    recs = fp.footprint_records()
    pages = tile_join.assign_cells(
        with_geotag(synthetic_pages(spark, N), token="float")
    ).where("lon < 24.3")  # keep points near the catalog (ring must reach)
    return pages, fp.footprint_cells_df(spark, recs), fp.footprint_summary_df(spark)


def _rows(df):
    return {(r.url, r.rank, r.filename) for r in df.select("url", "rank", "filename").collect()}


def test_kring_equals_bruteforce(spark, inputs):
    pages, cells, summary = inputs
    brute = _rows(knn_bruteforce(pages, summary, k=2))
    # footprints span ~25 cells across; ring 40 guarantees coverage of the
    # in-block pages for k=2 nearest of 4 centers
    ring = _rows(knn_kring(pages, cells, summary, k=2, ring=40))
    assert ring == brute
    assert len(brute) > 0


def test_kring_ring_too_small_never_invents_candidates(spark, inputs):
    pages, cells, summary = inputs
    # ranks renumber when candidates are missing, so compare pair sets:
    # every (url, filename) the small ring emits must be a real candidate
    # pair from the full catalog scoring (k=4 = all footprints)
    brute_pairs = {
        (u, f) for u, _r, f in _rows(knn_bruteforce(pages, summary, k=4))
    }
    small_pairs = {
        (u, f) for u, _r, f in _rows(knn_kring(pages, cells, summary, k=2, ring=1))
    }
    assert small_pairs <= brute_pairs
