"""gausplat_tpu — a TPU-native differentiable 3D Gaussian Splatting engine.

A ground-up JAX/Pallas re-design of the capabilities of
``AsherJingkongChen/gausplat-renderer`` (a Rust/WGSL wgpu renderer):
forward rendering and the analytic training backward pass for 3DGS scenes,
plus scene I/O (3DGS PLY), camera views, point-cloud initialisation, a
training loop with densification, and multi-chip rendering via
``jax.sharding``.
"""

from . import constants, errors, ops, parallel, scene, train, utils
from .constants import SH_COUNT_MAX, SH_DEGREE_MAX
from .render.pipeline import (
    calibrate_options,
    count_tile_entries,
    render,
    render_views,
    RenderOptions,
    RenderOutput,
)
from .render.view import View, Views
from .scene.gaussian_3d import GaussianScene
from .scene.point import Points
from .scene.ply import decode_polygon, encode_polygon

__version__ = "0.1.0"

__all__ = [
    "GaussianScene",
    "Points",
    "RenderOptions",
    "RenderOutput",
    "SH_COUNT_MAX",
    "SH_DEGREE_MAX",
    "View",
    "Views",
    "constants",
    "decode_polygon",
    "encode_polygon",
    "errors",
    "ops",
    "parallel",
    "calibrate_options",
    "count_tile_entries",
    "render",
    "render_views",
    "scene",
    "train",
    "utils",
]
