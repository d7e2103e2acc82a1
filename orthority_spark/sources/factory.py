"""Camera factory: parameter files -> FrameModel per image.

The reference's ``FrameCameras`` factory resolves each exterior record's
camera id against the interior-parameter dict — with a single-camera
shortcut when the file defines exactly one interior set, and an error on
a miss (/root/reference/orthority/factory.py:205-234). Same contract
here over the oty YAML/CSV/GeoJSON readers in param_io; at cluster scale
the resulting filename -> model mapping is broadcast metadata (SURVEY
J1), never a data-sized join.
"""

from __future__ import annotations

from pathlib import Path

from ..geom.camera import FrameModel
from .param_io import (
    ParamFileError,
    ext_records_to_poses,
    read_ext_param_csv_poses,
    read_ext_param_geojson,
    read_int_param,
)

#: interior YAML keys that are NOT distortion coefficients
_NON_DIST_KEYS = {"type", "im_size", "focal_len", "sensor_size", "cx", "cy"}


def model_from_int(p: dict, xyz, opk) -> FrameModel:
    """One oty interior-parameter dict (flat coefficients) + pose ->
    FrameModel."""
    dist = {k: float(v) for k, v in p.items() if k not in _NON_DIST_KEYS}
    return FrameModel(
        cam_type=p["type"],
        im_size=tuple(p["im_size"]),
        focal_len=p["focal_len"],
        sensor_size=(
            tuple(p["sensor_size"]) if p.get("sensor_size") is not None else None
        ),
        cx=float(p.get("cx", 0.0)),
        cy=float(p.get("cy", 0.0)),
        dist=dist,
        xyz=tuple(float(v) for v in xyz),
        opk=tuple(float(v) for v in opk),
    )


def models_from_params(
    int_params: dict, poses: list[dict]
) -> dict[str, FrameModel]:
    """(interior dict, world poses) -> filename -> FrameModel.

    Camera-id resolution mirrors factory.py:205-234: a pose without a
    ``camera`` id binds to the single interior set when exactly one
    exists, else raises; an unknown id raises."""
    cam_ids = list(int_params)
    out: dict[str, FrameModel] = {}
    for pose in poses:
        cam = pose.get("camera")
        if cam is None:
            if len(cam_ids) != 1:
                raise ParamFileError(
                    f"{pose['filename']}: no camera id and "
                    f"{len(cam_ids)} interior parameter sets"
                )
            cam = cam_ids[0]
        if cam not in int_params:
            raise ParamFileError(
                f"{pose['filename']}: unknown camera id '{cam}'"
            )
        out[pose["filename"]] = model_from_int(
            int_params[cam], pose["xyz"], pose["opk"]
        )
    return out


def models_from_files(
    int_file: str | Path, ext_file: str | Path
) -> dict[str, FrameModel]:
    """oty interior YAML + exterior CSV/GeoJSON files -> models (the
    ``FrameCameras(int_param_file, ext_param_file)`` analogue)."""
    int_params = read_int_param(int_file)
    ext = str(ext_file)
    if ext.endswith(".csv"):
        poses = read_ext_param_csv_poses(ext_file)
    else:
        records, _crs = read_ext_param_geojson(ext_file)
        for r in records:
            r.setdefault("latitude", r.pop("lat", None))
            r.setdefault("longitude", r.pop("lon", None))
            r.setdefault("altitude", r.pop("z", None))
            missing = [
                k for k in ("latitude", "longitude", "altitude")
                if r.get(k) is None
            ]
            if missing:
                # fail with the module's contract (not a later TypeError
                # in float(None)) and name the offending record
                raise ParamFileError(
                    f"{r.get('filename', '<unknown>')}: GeoJSON exterior "
                    f"record missing {', '.join(missing)}"
                )
        poses = ext_records_to_poses(records, "lla_opk")
    return models_from_params(int_params, poses)
