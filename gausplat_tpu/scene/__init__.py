"""Scene representation: Gaussian scenes, point clouds, PLY I/O."""

from .gaussian_3d import GaussianScene
from .point import Points
from .ply import decode_polygon, encode_polygon

__all__ = ["GaussianScene", "Points", "decode_polygon", "encode_polygon"]
