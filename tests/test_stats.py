"""Parallel stats: partition-count invariance to 1e-6 (the reference's
block-wise == whole-image covariance check, test_pan_sharp.py:285-311)
and the Gram-Schmidt pan-sharpen round trip."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from orthority_spark.operators.stats import (
    band_stats,
    stats_to_cov,
    gs_weights,
    gs_coefficients,
    pan_sharpen,
)

BANDS = ["b1", "b2", "b3"]


@pytest.fixture(scope="module")
def band_df(spark):
    rng = np.random.RandomState(11)
    base = rng.rand(5000)
    pdf = pd.DataFrame(
        {
            "b1": base + rng.rand(5000) * 0.1,
            "b2": 2 * base + rng.rand(5000) * 0.2,
            "b3": 0.5 * base + rng.rand(5000) * 0.05,
        }
    )
    pdf["pan"] = pdf[BANDS].mean(axis=1) + rng.rand(5000) * 0.01
    return pdf


def _cov_from_spark(spark, pdf, parts):
    df = spark.createDataFrame(pdf).repartition(parts)
    row = band_stats(df, BANDS).collect()[0]
    return stats_to_cov(row, BANDS)


def test_partition_count_invariance(spark, band_df):
    m2, c2 = _cov_from_spark(spark, band_df, 2)
    m16, c16 = _cov_from_spark(spark, band_df, 16)
    np.testing.assert_allclose(m2, m16, atol=1e-9)
    np.testing.assert_allclose(c2, c16, atol=1e-9)
    # vs numpy whole-data covariance (reference tolerance 1e-6)
    np_cov = np.cov(band_df[BANDS].to_numpy().T, ddof=1)
    np.testing.assert_allclose(c2, np_cov, rtol=1e-6)
    np.testing.assert_allclose(m2, band_df[BANDS].mean().to_numpy(), rtol=1e-9)


def test_gs_weights_properties(band_df):
    cov = np.cov(band_df[BANDS].to_numpy().T, ddof=1)
    w = gs_weights(cov)
    assert w.shape == (3,)
    assert w.sum() == pytest.approx(1.0)
    assert (w >= 0).all()
    g = gs_coefficients(cov, w)
    # coefficient of the simulated pan against itself is 1 under w
    assert float(w @ g) == pytest.approx(1.0, rel=1e-9)


def test_pan_sharpen_end_to_end(spark, band_df):
    df = spark.createDataFrame(band_df)
    out = pan_sharpen(df, BANDS, "pan").toPandas()
    assert {f"sharp_{b}" for b in BANDS} <= set(out.columns)
    # sharpened bands stay correlated with the originals
    for b in BANDS:
        corr = np.corrcoef(out[b], out[f"sharp_{b}"])[0, 1]
        assert corr > 0.95
