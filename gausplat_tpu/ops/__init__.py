"""Compute ops: projection, binning, sorting, rasterization kernels."""

from . import binning, blend, projection, rasterize

__all__ = ["binning", "blend", "projection", "rasterize"]
