"""Gaussian projection (the reference "transform" stage), TPU-native.

Parity target: /root/reference/src/render/gaussian_3d/jit/kernel/transform/
kernel.wgsl:117-418 (forward math) and transform_backward/kernel.wgsl (its
analytic backward).

Design: instead of a per-point WGSL kernel + a hand-derived 600-line backward
kernel, this is a *pure differentiable jnp function* vectorized over points.
XLA fuses the whole stage into a few elementwise kernels, and the training
backward is obtained with ``jax.vjp`` — which reproduces the reference's
analytic gradients exactly because every clamp/cull is expressed with
gradient-correct ``where`` masking:

- the EWA normalized-coordinate clamp masks its gradient like
  ``is_position_3d_in_normalized_not_clamped`` (transform_backward:229-249);
- the RGB clamp at zero masks like ``is_colors_rgb_3d_not_clamped``;
- culled points contribute zero gradient (``radii == 0`` skip).

All math is float32, matching the reference kernels.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import (
    DEPTH_MAX,
    DEPTH_MIN,
    FACTOR_RADIUS,
    FILTER_LOW_PASS,
    SH_COEF,
    TILE_SIZE_X,
    TILE_SIZE_Y,
)

_SH_C0 = tuple(float(c) for c in SH_COEF[0])
_SH_C1 = tuple(float(c) for c in SH_COEF[1])
_SH_C2 = tuple(float(c) for c in SH_COEF[2])
_SH_C3 = tuple(float(c) for c in SH_COEF[3])


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Camera:
    """Dynamic (traced) per-view camera quantities, all float32.

    Derived on the host from a :class:`~gausplat_tpu.render.view.View`
    exactly as the reference orchestrator does (jit/mod.rs:42-76).
    """

    focal_length: jax.Array  # [2]  I / (2 tan(fov/2))
    image_size_half: jax.Array  # [2]  I / 2
    view_bound: jax.Array  # [2]  tan(fov/2) * (C_f + 1)
    view_position: jax.Array  # [3]
    view_rotation: jax.Array  # [3, 3] row-major operator: p_v = R @ p + t
    view_translation: jax.Array  # [3]

    @classmethod
    def from_view(cls, view) -> "Camera":
        tan_x = np.tan(view.field_of_view_x / 2.0)
        tan_y = np.tan(view.field_of_view_y / 2.0)
        focal = np.array(
            [
                view.image_width / tan_x / 2.0,
                view.image_height / tan_y / 2.0,
            ],
            np.float32,
        )
        half = np.array(
            [view.image_width / 2.0, view.image_height / 2.0], np.float32
        )
        bound = np.array(
            [tan_x * (FILTER_LOW_PASS + 1.0), tan_y * (FILTER_LOW_PASS + 1.0)],
            np.float32,
        )
        return cls(
            focal_length=jnp.asarray(focal),
            image_size_half=jnp.asarray(half),
            view_bound=jnp.asarray(bound),
            view_position=jnp.asarray(view.view_position, jnp.float32),
            view_rotation=jnp.asarray(view.view_rotation(), jnp.float32),
            view_translation=jnp.asarray(view.view_translation(), jnp.float32),
        )


class ProjectionOutput(NamedTuple):
    """Per-point projection results ([P]-shaped, masked by ``visible``)."""

    colors_rgb_3d: jax.Array  # [P, 3] clamped >= 0 (differentiable)
    conics: jax.Array  # [P, 3] inverse 2D covariance (xx, xy, yy) (diff.)
    positions_2d: jax.Array  # [P, 2] screen positions (differentiable)
    depths: jax.Array  # [P] view depths
    radii: jax.Array  # [P] int32, 0 for culled points
    tile_bounds: jax.Array  # [P, 4] int32 (x_max, x_min, y_max, y_min)
    tile_counts: jax.Array  # [P] int32 touched-tile counts (0 if culled)
    visible: jax.Array  # [P] bool


def quat_to_rotmat(q: jax.Array) -> jax.Array:
    """Normalized quaternion (x, y, z, w) [..., 4] -> rotation [..., 3, 3]."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    half = jnp.float32(0.5)
    rows = jnp.stack(
        [
            jnp.stack([(half - yy - zz), (xy - wz), (xz + wy)], axis=-1),
            jnp.stack([(xy + wz), (half - xx - zz), (yz - wx)], axis=-1),
            jnp.stack([(xz - wy), (yz + wx), (half - xx - yy)], axis=-1),
        ],
        axis=-2,
    )
    return rows * jnp.float32(2.0)


def eval_sh(colors_sh: jax.Array, view_dir: jax.Array, degree: int) -> jax.Array:
    """Evaluate real SH (degree 0..3) toward ``view_dir``.

    ``colors_sh``: [P, 48] ([P, M, 3] flattened); ``view_dir``: [P, 3] unit.
    Returns raw RGB (before the +0.5 offset), [P, 3].
    """
    p = colors_sh.shape[0]
    sh = colors_sh.reshape(p, 16, 3)
    out = sh[:, 0] * jnp.float32(_SH_C0[0])
    if degree >= 1:
        vx, vy, vz = view_dir[:, 0:1], view_dir[:, 1:2], view_dir[:, 2:3]
        out = out + sh[:, 1] * (jnp.float32(_SH_C1[0]) * vy)
        out = out + sh[:, 2] * (jnp.float32(_SH_C1[1]) * vz)
        out = out + sh[:, 3] * (jnp.float32(_SH_C1[2]) * vx)
    if degree >= 2:
        xy, yz, xz = vx * vy, vy * vz, vx * vz
        xx, yy, zz = vx * vx, vy * vy, vz * vz
        out = out + sh[:, 4] * (jnp.float32(_SH_C2[0]) * xy)
        out = out + sh[:, 5] * (jnp.float32(_SH_C2[1]) * yz)
        out = out + sh[:, 6] * (jnp.float32(_SH_C2[2]) * (zz * 3.0 - 1.0))
        out = out + sh[:, 7] * (jnp.float32(_SH_C2[3]) * xz)
        out = out + sh[:, 8] * (jnp.float32(_SH_C2[4]) * (xx - yy))
    if degree >= 3:
        zz_5_1 = zz * 5.0 - 1.0
        out = out + sh[:, 9] * (jnp.float32(_SH_C3[0]) * (vy * (xx * 3.0 - yy)))
        out = out + sh[:, 10] * (jnp.float32(_SH_C3[1]) * (vz * xy))
        out = out + sh[:, 11] * (jnp.float32(_SH_C3[2]) * (vy * zz_5_1))
        out = out + sh[:, 12] * (jnp.float32(_SH_C3[3]) * (vz * (zz_5_1 - 2.0)))
        out = out + sh[:, 13] * (jnp.float32(_SH_C3[4]) * (vx * zz_5_1))
        out = out + sh[:, 14] * (jnp.float32(_SH_C3[5]) * (vz * (xx - yy)))
        out = out + sh[:, 15] * (jnp.float32(_SH_C3[6]) * (vx * (xx - yy * 3.0)))
    return out


def project_gaussians(
    colors_sh: jax.Array,
    positions: jax.Array,
    rotations: jax.Array,
    scalings: jax.Array,
    camera: Camera,
    *,
    sh_degree: int,
    tile_count_x: int,
    tile_count_y: int,
) -> ProjectionOutput:
    """Project all Gaussians into screen space (fully vectorized over P).

    Differentiable in ``colors_sh``, ``positions``, ``rotations``,
    ``scalings`` (the inner parameterization: scalings are logs, rotations
    unnormalized quaternions). Opacity does not enter projection.
    """
    f32 = jnp.float32
    one = f32(1.0)
    # The 3x3 contractions below must run at full f32 (TPU default matmul
    # precision is bf16; these are tiny and parity-critical).
    mm = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)

    # World -> view (transform/kernel.wgsl:134-146).
    p_view = mm(positions, camera.view_rotation.T) + camera.view_translation
    depth = p_view[:, 2]
    depth_ok = (depth >= f32(DEPTH_MIN)) & (depth < f32(DEPTH_MAX))
    depth_safe = jnp.where(depth_ok, depth, one)

    # Quaternion -> rotation matrix, with zero-quaternion cull (:148-169).
    quat_norm_sq = jnp.sum(rotations * rotations, axis=-1)
    quat_ok = quat_norm_sq > f32(0.0)
    quat_safe = jnp.where(
        quat_ok[:, None], rotations, jnp.array([0, 0, 0, 1], f32)
    )
    quat = quat_safe / jnp.sqrt(jnp.sum(quat_safe * quat_safe, -1, keepdims=True))
    rot_mat = quat_to_rotmat(quat)  # [P, 3, 3]

    # 3D covariance from rotation and (log-)scaling (:171-199).
    scale = jnp.exp(scalings)  # outer scaling
    rs = rot_mat * scale[:, None, :]  # R @ diag(s)
    cov3d = mm(rs, jnp.swapaxes(rs, -1, -2))  # [P, 3, 3]

    # Perspective projection with half-pixel center offset (:201-212).
    normalized = p_view[:, 0:2] / depth_safe[:, None]
    position_2d = (
        normalized * camera.focal_length + camera.image_size_half - f32(0.5)
    )

    # EWA: T = J @ Rv with clamped normalized coords; Sigma' = T S T^t + C
    # (:214-241). The clamp's gradient is masked, as in the reference.
    focal_norm = camera.focal_length / depth_safe[:, None]  # [P, 2]
    not_clamped = (normalized >= -camera.view_bound) & (
        normalized <= camera.view_bound
    )
    norm_clamped = jnp.where(
        not_clamped,
        normalized,
        jnp.clip(normalized, -camera.view_bound, camera.view_bound),
    )
    zeros = jnp.zeros_like(focal_norm[:, 0])
    # J rows: [fx/z, 0, -fx/z * cx], [0, fy/z, -fy/z * cy]
    j = jnp.stack(
        [
            jnp.stack([focal_norm[:, 0], zeros, -focal_norm[:, 0] * norm_clamped[:, 0]], -1),
            jnp.stack([zeros, focal_norm[:, 1], -focal_norm[:, 1] * norm_clamped[:, 1]], -1),
        ],
        axis=-2,
    )  # [P, 2, 3]
    t = mm(j, camera.view_rotation)  # [P, 2, 3]
    cov2d = mm(mm(t, cov3d), jnp.swapaxes(t, -1, -2))
    cov2d = cov2d + f32(FILTER_LOW_PASS) * jnp.eye(2, dtype=jnp.float32)

    # Conic = inverse 2D covariance; det == 0 culls (:243-252).
    c_xx, c_xy, c_yy = cov2d[:, 0, 0], cov2d[:, 0, 1], cov2d[:, 1, 1]
    det = c_xx * c_yy - c_xy * c_xy
    det_ok = det != f32(0.0)
    det_safe = jnp.where(det_ok, det, one)
    conic = jnp.stack([c_yy, -c_xy, c_xx], axis=-1) / det_safe[:, None]

    # Radius from the max eigenvalue (:254-284).
    mid = (c_xx + c_yy) / f32(2.0)
    eig_diff = jnp.sqrt(jnp.maximum(mid * mid - det, f32(0.0)))
    eig_max = jnp.maximum(mid + eig_diff, mid - eig_diff)
    radius = jnp.ceil(jnp.sqrt(jnp.maximum(eig_max, f32(0.0))) * f32(FACTOR_RADIUS))

    # Touched-tile AABB, truncated toward zero then clamped (:286-306).
    px, py = position_2d[:, 0], position_2d[:, 1]
    tsx, tsy = f32(TILE_SIZE_X), f32(TILE_SIZE_Y)
    x_max = jnp.clip(((px + radius + (tsx - 1.0)) / tsx).astype(jnp.int32), 0, tile_count_x)
    x_min = jnp.clip(((px - radius) / tsx).astype(jnp.int32), 0, tile_count_x)
    y_max = jnp.clip(((py + radius + (tsy - 1.0)) / tsy).astype(jnp.int32), 0, tile_count_y)
    y_min = jnp.clip(((py - radius) / tsy).astype(jnp.int32), 0, tile_count_y)
    tile_count = (x_max - x_min) * (y_max - y_min)
    tiles_ok = tile_count > 0

    # View direction for SH (:314-323); zero-offset cull.
    view_offset = positions - camera.view_position
    offset_norm_sq = jnp.sum(view_offset * view_offset, axis=-1)
    offset_ok = offset_norm_sq > f32(0.0)
    offset_safe = jnp.where(
        offset_ok[:, None], view_offset, jnp.array([0, 0, 1], f32)
    )
    view_dir = offset_safe / jnp.sqrt(
        jnp.sum(offset_safe * offset_safe, -1, keepdims=True)
    )

    # SH -> RGB, +0.5 offset, clamp at zero with gradient mask (:336-392).
    color = eval_sh(colors_sh, view_dir, sh_degree) + f32(0.5)
    color_not_clamped = color >= f32(0.0)
    color = jnp.where(color_not_clamped, color, f32(0.0))

    visible = depth_ok & quat_ok & det_ok & tiles_ok & offset_ok
    vis_f = visible.astype(jnp.float32)[:, None]

    # Mask culled points: zero gradients, radii == 0, tile counts == 0.
    colors_rgb_3d = color * vis_f
    conics = conic * vis_f
    positions_2d = position_2d * vis_f
    radii = jnp.where(visible, radius.astype(jnp.int32), 0)
    tile_counts = jnp.where(visible, tile_count, 0)
    tile_bounds = jnp.stack([x_max, x_min, y_max, y_min], axis=-1) * visible[
        :, None
    ].astype(jnp.int32)
    depths = jnp.where(visible, depth, f32(0.0))

    return ProjectionOutput(
        colors_rgb_3d=colors_rgb_3d,
        conics=conics,
        positions_2d=positions_2d,
        depths=depths,
        radii=radii,
        tile_bounds=tile_bounds,
        tile_counts=tile_counts,
        visible=visible,
    )
