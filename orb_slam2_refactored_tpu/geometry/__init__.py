from . import se3, sim3, projection
from .projection import CameraIntrinsics, DistCoeffs

__all__ = ["se3", "sim3", "projection", "CameraIntrinsics", "DistCoeffs"]
