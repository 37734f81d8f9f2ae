from libcml_tpu.core.lie import (
    SE3,
    se3_exp,
    se3_log,
    se3_retract,
    skew,
    so3_exp,
    so3_log,
    quat_to_matrix,
    matrix_to_quat,
    slerp,
)
from libcml_tpu.core.camera import PinholeCamera, Calibration

__all__ = [
    "SE3",
    "se3_exp",
    "se3_log",
    "se3_retract",
    "skew",
    "so3_exp",
    "so3_log",
    "quat_to_matrix",
    "matrix_to_quat",
    "slerp",
    "PinholeCamera",
    "Calibration",
]
