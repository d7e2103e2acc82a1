"""Parallel statistics: the pan-sharpening stats/transform pipeline
re-expressed as Spark aggregation (SURVEY §2.4 A1, §3.3).

The reference computes per-tile count/mean/deviation-product partials and
merges them with the Schubert–Gertz numerically-stable parallel
(co)variance merge across a thread pool
(/root/reference/orthority/pan_sharp.py:228-309), then solves
Gram–Schmidt weights/coefficients driver-side (pan_sharp.py:319-403) and
applies the transform tile-by-tile (pan_sharp.py:418-478).

Spark restatement — "this is structurally a Spark job already"
(SURVEY §3.3): the partial+merge is EXACTLY Spark's partial aggregation;
we express it with built-in ``count/avg/covar_samp`` so Catalyst plans
map-side partials automatically, and verify partition-count invariance to
1e-6 (the reference's own tolerance, test_pan_sharp.py:310-311). The
finalize step (weights solve) is driver-side numpy on the tiny covariance
matrix; the pass-2 transform is a vectorized Arrow UDF.
"""

from __future__ import annotations

from itertools import combinations_with_replacement
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


def band_stats(df: DataFrame, band_cols: list[str]) -> DataFrame:
    """count + mean per band + full (co)variance matrix via built-ins.

    One shuffle-free partial aggregation; Catalyst emits the same
    partial/merge/finish scheme the reference hand-rolls.
    """
    aggs = [F.count(F.lit(1)).alias("n")]
    aggs += [F.avg(c).alias(f"mean_{c}") for c in band_cols]
    aggs += [
        F.covar_samp(a, b).alias(f"cov_{a}_{b}")
        for a, b in combinations_with_replacement(band_cols, 2)
    ]
    return df.agg(*aggs)


def stats_to_cov(row, band_cols: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Collect a band_stats row into (means, covariance matrix)."""
    k = len(band_cols)
    means = np.array([row[f"mean_{c}"] for c in band_cols])
    cov = np.zeros((k, k))
    for i, a in enumerate(band_cols):
        for j, b in enumerate(band_cols):
            key = f"cov_{a}_{b}" if i <= j else f"cov_{b}_{a}"
            cov[i, j] = row[key]
    return means, cov


def gs_weights(cov: np.ndarray) -> np.ndarray:
    """Least-squares solve of simulated-pan band weights from the MS
    covariance (pan_sharp.py:319-356 semantics): minimise
    ||cov @ w - mean-band-cov|| with a fallback to uniform weights when
    any weight goes negative (the reference re-fits; we clamp+renorm)."""
    k = cov.shape[0]
    target = cov.mean(axis=1)
    w, *_ = np.linalg.lstsq(cov, target, rcond=None)
    if np.any(w < 0):
        w = np.clip(w, 0.0, None)
        if w.sum() == 0:
            w = np.ones(k)
    return w / w.sum()


def gs_coefficients(cov: np.ndarray, w: np.ndarray) -> np.ndarray:
    """Gram–Schmidt orthogonalisation coefficients from the covariance
    (pan_sharp.py:358-379): g_k = cov(band_k, sim_pan) / var(sim_pan)."""
    var_sim = float(w @ cov @ w)
    return (cov @ w) / var_sim


def gs_transform(
    df: DataFrame,
    band_cols: list[str],
    pan_col: str,
    means: np.ndarray,
    w: np.ndarray,
    coeffs: np.ndarray,
    pan_gain: float,
    pan_bias: float,
) -> DataFrame:
    """Pass 2: per-row Gram–Schmidt pan-sharpen as an Arrow batch kernel:
    sharpened_k = band_k + g_k * (gain*pan + bias - sim_pan)."""
    cols = list(df.columns)
    out_schema = ", ".join(
        [f"{c} double" for c in cols] + [f"sharp_{c} double" for c in band_cols]
    )

    def transform(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            bands = np.column_stack(
                [pdf[c].to_numpy(dtype="float64") for c in band_cols]
            )
            sim = (bands - means) @ w
            pan = pdf[pan_col].to_numpy(dtype="float64") * pan_gain + pan_bias
            delta = pan - sim
            sharp = bands + np.outer(delta, coeffs)
            out = pdf.copy()
            for i, c in enumerate(band_cols):
                out[f"sharp_{c}"] = sharp[:, i]
            yield out

    return df.mapInPandas(transform, schema=out_schema)


def pan_sharpen(df: DataFrame, band_cols: list[str], pan_col: str) -> DataFrame:
    """Full two-pass pipeline: agg -> collect tiny stats -> broadcast
    params -> mapInPandas (the reference's pass1/finalize/pass2,
    pan_sharp.py:517-670)."""
    row = band_stats(df, band_cols).collect()[0]
    means, cov = stats_to_cov(row, band_cols)
    w = gs_weights(cov)
    coeffs = gs_coefficients(cov, w)
    # gain/bias match simulated-pan stats to the pan band's stats
    pan_row = df.agg(
        F.avg(pan_col).alias("m"), F.stddev_samp(pan_col).alias("s")
    ).collect()[0]
    sim_std = float(np.sqrt(w @ cov @ w))
    gain = sim_std / pan_row["s"] if pan_row["s"] else 1.0
    bias = -pan_row["m"] * gain  # sim-pan is mean-centred
    return gs_transform(df, band_cols, pan_col, means, w, coeffs, gain, bias)
