"""Error types.

Mirrors the reference error surface (/root/reference/src/error/mod.rs:9-40)
with Python exceptions.
"""

from .constants import SH_DEGREE_MAX


class GausplatError(Exception):
    """Base class for all gausplat_tpu errors."""


class InvalidPixelCountError(GausplatError):
    def __init__(self, pixel_count: int):
        self.pixel_count = pixel_count
        super().__init__(
            f"Invalid pixel count: {pixel_count}. "
            "It should not be zero or excessively large."
        )


class MismatchedPolygonHeaderError(GausplatError):
    def __init__(self, header: str):
        self.header = header
        super().__init__(
            "Mismatched polygon header (3DGS PLY). "
            f"Please check the file again:\n--------\n{header}--------\n"
        )


class MismatchedPointCountError(GausplatError):
    def __init__(self, got, expected):
        super().__init__(f"Mismatched point count: {got}. It should be {expected}.")


class MismatchedTensorShapeError(GausplatError):
    def __init__(self, got, expected):
        super().__init__(f"Mismatched tensor shape: {got}. It should be {expected}.")


class UnsupportedSphericalHarmonicsDegreeError(GausplatError):
    def __init__(self, degree: int):
        super().__init__(
            f"Unsupported spherical harmonics degree: {degree}. "
            f"It should be no more than {SH_DEGREE_MAX}."
        )
