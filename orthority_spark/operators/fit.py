"""Model refinement: RPC shift / shift-drift fitting from GCPs (A9/J5).

The reference refines each image's RPC model against its GCPs with a
per-image least squares ('shift' = mean pixel offset, 'shift-drift' =
per-axis 1D linear fit, /root/reference/orthority/fit.py:49-130), joining
images to GCPs on filename with a warning for unmatched images
(/root/reference/orthority/factory.py:352-362).

Spark restatement: GCP residuals are computed by the camera UDF, then
``groupBy(filename).applyInPandas`` solves the per-image least squares —
the cogrouped-solver shape from SURVEY §2.9. Unmatched images fall out of
a left-anti join (the J5 anti-join construct).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


def refine_shift_oracle(ji_obs: np.ndarray, ji_pred: np.ndarray) -> np.ndarray:
    """'shift': mean (dj, di) offset between observed and predicted pixels."""
    return (ji_obs - ji_pred).mean(axis=1)


def refine_shift_drift_oracle(
    ji_obs: np.ndarray, ji_pred: np.ndarray
) -> np.ndarray:
    """'shift-drift': per-axis 1D least squares obs = a * pred + b;
    returns [[a_j, b_j], [a_i, b_i]] (fit.py:103-107 semantics)."""
    out = np.zeros((2, 2))
    for ax in range(2):
        A = np.vstack([ji_pred[ax], np.ones_like(ji_pred[ax])]).T
        out[ax], *_ = np.linalg.lstsq(A, ji_obs[ax], rcond=None)
    return out


def refine_per_image(
    gcps: DataFrame, method: str = "shift"
) -> DataFrame:
    """gcps(filename, j_obs, i_obs, j_pred, i_pred) -> per-image params.

    shift:       (filename, dj, di)
    shift-drift: (filename, aj, bj, ai, bi)
    """
    if method == "shift":
        schema = "filename string, dj double, di double"

        def solve(pdf: pd.DataFrame) -> pd.DataFrame:
            d = refine_shift_oracle(
                np.vstack([pdf.j_obs, pdf.i_obs]),
                np.vstack([pdf.j_pred, pdf.i_pred]),
            )
            return pd.DataFrame(
                {"filename": [pdf.filename.iloc[0]], "dj": [d[0]], "di": [d[1]]}
            )

    elif method == "shift-drift":
        schema = "filename string, aj double, bj double, ai double, bi double"

        def solve(pdf: pd.DataFrame) -> pd.DataFrame:
            p = refine_shift_drift_oracle(
                np.vstack([pdf.j_obs, pdf.i_obs]),
                np.vstack([pdf.j_pred, pdf.i_pred]),
            )
            return pd.DataFrame(
                {
                    "filename": [pdf.filename.iloc[0]],
                    "aj": [p[0, 0]], "bj": [p[0, 1]],
                    "ai": [p[1, 0]], "bi": [p[1, 1]],
                }
            )

    else:
        raise ValueError(method)

    return gcps.groupBy("filename").applyInPandas(solve, schema=schema)


def unmatched_images(images: DataFrame, gcps: DataFrame) -> DataFrame:
    """Images with no GCPs (the J5 warning set) — left-anti join."""
    return images.join(gcps.select("filename").distinct(), "filename", "left_anti")
