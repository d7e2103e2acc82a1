"""Pure-numpy geometry kernels (no Spark, no cv2, no GDAL).

These are the batched math kernels that run inside vectorized pandas/Arrow
UDFs on executors, re-derived from the reference's semantics (cited per
function). All geometry is float64 (the reference requires float64 for
world/pixel grids, /root/reference/orthority/camera.py:68,
/root/reference/orthority/ortho.py:416-417).
"""

from .rotation import (  # noqa: F401
    opk_to_rotation,
    rpy_to_rotation,
    rotation_to_opk,
    aa_to_rotation,
    aa_to_opk,
)
from .camera import (  # noqa: F401
    FrameModel,
    RpcModel,
    intrinsic_matrix,
    extrinsic,
)
from .boundary import (  # noqa: F401
    pixel_boundary,
    polygon_area,
    gsd,
    point_in_polygon,
    polygon_bbox,
)
