"""Gaussian projection (the reference "transform" stage), TPU-native.

Parity target: /root/reference/src/render/gaussian_3d/jit/kernel/transform/
kernel.wgsl:117-418 (forward math) and transform_backward/kernel.wgsl (its
analytic backward).

Design: instead of a per-point WGSL kernel + a hand-derived 600-line backward
kernel, this is a *pure differentiable jnp function* vectorized over points,
and the training backward is obtained with ``jax.vjp`` — which reproduces the
reference's analytic gradients exactly because every clamp/cull is expressed
with gradient-correct ``where`` masking:

- the EWA normalized-coordinate clamp masks its gradient like
  ``is_position_3d_in_normalized_not_clamped`` (transform_backward:229-249);
- the RGB clamp at zero masks like ``is_colors_rgb_3d_not_clamped``;
- culled points contribute zero gradient (``radii == 0`` skip).

Layout: **structure-of-arrays**. All per-point quantities are 1-D ``[P]``
component arrays and every operation is elementwise — the 3x3/2x3 matrix
algebra (quaternion -> rotation, RS RS^T, EWA J Rv Sigma (J Rv)^T) is
expanded into scalar component formulas. This matters twice on TPU: XLA
fuses the whole stage into a few VPU kernels with *no materialized
intermediates*, and nothing ever takes the (8, 128)-tile padding hit that
``[P, 3]``/``[P, 3, 3]`` arrays suffer in HBM (a 14x-57x memory blowup at
production point counts). All math is float32, matching the reference.
"""

from __future__ import annotations

import dataclasses
import os as _os
from typing import NamedTuple, Optional

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

#: SH coefficient layout experiment (GAUSPLAT_SH_T=1): transpose
#: ``colors_sh`` to ``[48, P]`` once at projection entry and evaluate SH
#: over [P] rows. The ``[P, 48]`` input pads its 48-wide lane dimension to
#: 128 on TPU (2.7x HBM read blowup at production point counts; this
#: module's docstring calls out exactly this class) and every per-m
#: ``[P, 3]`` slice is a strided access; rows make every SH op a full-lane
#: [P] elementwise op at the cost of one exact transpose. Same math
#: bit-for-bit per coefficient; opt-in pending an on-chip stage A/B.
SH_TRANSPOSED = int(_os.environ.get("GAUSPLAT_SH_T", "0"))

#: Companion experiment (GAUSPLAT_POS_T=1): transpose the narrow [P, 3/4]
#: projection inputs (positions, rotations, scalings, opacities) to
#: component rows at entry. Their lane padding is proportionally worse
#: (3 -> 128), but the absolute volume is 16x smaller than colors_sh —
#: a separate flag so the on-chip A/B can attribute the effect.
POS_TRANSPOSED = int(_os.environ.get("GAUSPLAT_POS_T", "0"))


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
    #: Optional [2] screen-space origin shift (tile sharding: the slab's
    #: pixel offset). Applied by *subtracting from the globally-computed*
    #: pos2d — integer pixel offsets subtract exactly in f32, so a slab
    #: render is bitwise identical to the matching rows of the full frame
    #: (shifting the principal point instead would reassociate the fp sum
    #: and jitter tile assignment for borderline Gaussians).
    pos2d_shift: Optional[jax.Array] = None

    @classmethod
    def from_view(cls, view) -> "Camera":
        tan_x = np.tan(view.field_of_view_x / 2.0)
        tan_y = np.tan(view.field_of_view_y / 2.0)
        focal = np.array(
            [view.image_width / tan_x / 2.0, view.image_height / tan_y / 2.0],
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
    """Per-point projection results, structure-of-arrays ([P] components)."""

    color_r: jax.Array  # [P] clamped >= 0 (differentiable)
    color_g: jax.Array
    color_b: jax.Array
    conic_xx: jax.Array  # [P] inverse 2D covariance (differentiable)
    conic_xy: jax.Array
    conic_yy: jax.Array
    pos2d_x: jax.Array  # [P] screen position (differentiable)
    pos2d_y: jax.Array
    depths: jax.Array  # [P] view depths
    radii: jax.Array  # [P] int32, 0 for culled points
    tile_x_max: jax.Array  # [P] int32 touched-tile AABB
    tile_x_min: jax.Array
    tile_y_max: jax.Array
    tile_y_min: jax.Array
    tile_counts: jax.Array  # [P] int32 touched-tile counts (0 if culled)
    visible: jax.Array  # [P] bool

    # Convenience AoS views (materialize padded [P, k] arrays — tests /
    # small scenes only; the pipeline consumes the components directly).
    @property
    def colors_rgb_3d(self) -> jax.Array:
        return jnp.stack([self.color_r, self.color_g, self.color_b], -1)

    @property
    def conics(self) -> jax.Array:
        return jnp.stack([self.conic_xx, self.conic_xy, self.conic_yy], -1)

    @property
    def positions_2d(self) -> jax.Array:
        return jnp.stack([self.pos2d_x, self.pos2d_y], -1)

    @property
    def tile_bounds(self) -> jax.Array:
        return jnp.stack(
            [self.tile_x_max, self.tile_x_min, self.tile_y_max, self.tile_y_min],
            -1,
        )


def quat_to_rotmat_components(qx, qy, qz, qw):
    """Normalized quaternion components -> the 9 rotation-matrix entries
    (row-major r[i][j]), all elementwise."""
    xx, yy, zz = qx * qx, qy * qy, qz * qz
    xy, xz, yz = qx * qy, qx * qz, qy * qz
    wx, wy, wz = qw * qx, qw * qy, qw * qz
    two = jnp.float32(2.0)
    half = jnp.float32(0.5)
    return (
        two * (half - yy - zz), two * (xy - wz), two * (xz + wy),
        two * (xy + wz), two * (half - xx - zz), two * (yz - wx),
        two * (xz - wy), two * (yz + wx), two * (half - xx - yy),
    )


def quat_to_rotmat(q: jax.Array) -> jax.Array:
    """Normalized quaternion (x, y, z, w) [..., 4] -> rotation [..., 3, 3]."""
    r = quat_to_rotmat_components(q[..., 0], q[..., 1], q[..., 2], q[..., 3])
    rows = jnp.stack(
        [jnp.stack(r[0:3], -1), jnp.stack(r[3:6], -1), jnp.stack(r[6:9], -1)],
        axis=-2,
    )
    return rows


def eval_sh(colors_sh: jax.Array, vx, vy, vz, degree: int):
    """Evaluate real SH (degree 0..3) toward the unit view direction.

    ``colors_sh``: [P, 48] ([P, M, 3] flattened); ``vx/vy/vz``: [P].
    Returns (r, g, b) raw components (before the +0.5 offset).
    """

    def coef(m):  # [P, 3] slice of coefficient m
        return colors_sh[:, 3 * m : 3 * m + 3]

    def accum(out, m, basis):  # out: [P, 3]; basis: [P]
        return out + coef(m) * basis[:, None]

    out = coef(0) * jnp.float32(_SH_C0[0])
    if degree >= 1:
        out = accum(out, 1, jnp.float32(_SH_C1[0]) * vy)
        out = accum(out, 2, jnp.float32(_SH_C1[1]) * vz)
        out = accum(out, 3, jnp.float32(_SH_C1[2]) * vx)
    if degree >= 2:
        xx, yy, zz = vx * vx, vy * vy, vz * vz
        out = accum(out, 4, jnp.float32(_SH_C2[0]) * (vx * vy))
        out = accum(out, 5, jnp.float32(_SH_C2[1]) * (vy * vz))
        out = accum(out, 6, jnp.float32(_SH_C2[2]) * (zz * 3.0 - 1.0))
        out = accum(out, 7, jnp.float32(_SH_C2[3]) * (vx * vz))
        out = accum(out, 8, jnp.float32(_SH_C2[4]) * (xx - yy))
    if degree >= 3:
        zz_5_1 = zz * 5.0 - 1.0
        out = accum(out, 9, jnp.float32(_SH_C3[0]) * (vy * (xx * 3.0 - yy)))
        out = accum(out, 10, jnp.float32(_SH_C3[1]) * (vz * vx * vy))
        out = accum(out, 11, jnp.float32(_SH_C3[2]) * (vy * zz_5_1))
        out = accum(out, 12, jnp.float32(_SH_C3[3]) * (vz * (zz_5_1 - 2.0)))
        out = accum(out, 13, jnp.float32(_SH_C3[4]) * (vx * zz_5_1))
        out = accum(out, 14, jnp.float32(_SH_C3[5]) * (vz * (xx - yy)))
        out = accum(out, 15, jnp.float32(_SH_C3[6]) * (vx * (xx - yy * 3.0)))
    return out[:, 0], out[:, 1], out[:, 2]


def eval_sh_rows(rows: jax.Array, vx, vy, vz, degree: int):
    """`eval_sh` over a ``[48, P]`` coefficient-row layout (GAUSPLAT_SH_T).

    Channel-wise accumulation order matches :func:`eval_sh` exactly; only
    the memory layout differs (full-lane [P] rows instead of strided
    slices of a 48-wide padded array). Results agree to ULP level (XLA's
    FMA fusion choices may differ between the two graphs).
    """
    f32 = jnp.float32
    bases = []
    if degree >= 1:
        bases += [
            (1, f32(_SH_C1[0]) * vy),
            (2, f32(_SH_C1[1]) * vz),
            (3, f32(_SH_C1[2]) * vx),
        ]
    if degree >= 2:
        xx, yy, zz = vx * vx, vy * vy, vz * vz
        bases += [
            (4, f32(_SH_C2[0]) * (vx * vy)),
            (5, f32(_SH_C2[1]) * (vy * vz)),
            (6, f32(_SH_C2[2]) * (zz * 3.0 - 1.0)),
            (7, f32(_SH_C2[3]) * (vx * vz)),
            (8, f32(_SH_C2[4]) * (xx - yy)),
        ]
    if degree >= 3:
        zz_5_1 = zz * 5.0 - 1.0
        bases += [
            (9, f32(_SH_C3[0]) * (vy * (xx * 3.0 - yy))),
            (10, f32(_SH_C3[1]) * (vz * vx * vy)),
            (11, f32(_SH_C3[2]) * (vy * zz_5_1)),
            (12, f32(_SH_C3[3]) * (vz * (zz_5_1 - 2.0))),
            (13, f32(_SH_C3[4]) * (vx * zz_5_1)),
            (14, f32(_SH_C3[5]) * (vz * (xx - yy))),
            (15, f32(_SH_C3[6]) * (vx * (xx - yy * 3.0))),
        ]
    out = []
    for c in range(3):
        acc = rows[c] * f32(_SH_C0[0])
        for m, basis in bases:
            acc = acc + rows[3 * m + c] * basis
        out.append(acc)
    return out[0], out[1], out[2]


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
    opacities: Optional[jax.Array] = None,
    tight_culling: bool = False,
) -> ProjectionOutput:
    """Project all Gaussians into screen space (fully vectorized over P).

    Differentiable in ``colors_sh``, ``positions``, ``rotations``,
    ``scalings`` (the inner parameterization: scalings are logs, rotations
    unnormalized quaternions). Opacity does not enter projection — except
    the optional alpha-aware tile culling below, which is non-differentiable
    (stop_gradient) integer bookkeeping.

    ``tight_culling``: shrink each point's touched-tile AABB to the exact
    bounding box of its *blendable* region. The rasterizer blends an entry
    at a pixel only when ``alpha = opacity * exp(-q/2) >= 1/255``
    (rasterize/kernel.wgsl:163-172), i.e. inside the ellipse
    ``q(d) <= 2 ln(255 * opacity)``; the ellipse's axis-aligned half-extents
    are ``sqrt(2L * Sigma'_xx)`` / ``sqrt(2L * Sigma'_yy)`` (the 2D
    covariance diagonal — available pre-inversion). Intersected with the
    reference's eigenvalue-radius AABB this only drops (tile, point)
    entries that blend into nothing, so the image and gradients are
    unchanged up to blend-batch regrouping rounding (a few f32 ULPs)
    while the entry stream (and every sort/gather/blend pair
    downstream) shrinks — strongly for anisotropic or low-opacity
    Gaussians, for which the isotropic ``3 sigma_max`` circle is a gross
    over-cover. ``radii``/``visible`` keep the reference semantics
    (densification parity) regardless of this flag.
    """
    f32 = jnp.float32
    one = f32(1.0)

    # Camera scalars/rows (tiny; broadcast against [P] columns).
    rv = camera.view_rotation  # [3, 3] row-major
    tv = camera.view_translation
    fx, fy = camera.focal_length[0], camera.focal_length[1]
    bx, by = camera.view_bound[0], camera.view_bound[1]

    if POS_TRANSPOSED:
        # One exact transpose each to component rows (see POS_TRANSPOSED);
        # barriers keep the transposes materialized.
        positions = jax.lax.optimization_barrier(positions.T)
        rotations = jax.lax.optimization_barrier(rotations.T)
        scalings = jax.lax.optimization_barrier(scalings.T)
        if opacities is not None:
            opacities = jax.lax.optimization_barrier(opacities.T)
        comp = lambda a, k: a[k]  # noqa: E731
    else:
        comp = lambda a, k: a[:, k]  # noqa: E731

    px, py, pz = comp(positions, 0), comp(positions, 1), comp(positions, 2)

    # World -> view (transform/kernel.wgsl:134-146).
    pv_x = rv[0, 0] * px + rv[0, 1] * py + rv[0, 2] * pz + tv[0]
    pv_y = rv[1, 0] * px + rv[1, 1] * py + rv[1, 2] * pz + tv[1]
    depth = rv[2, 0] * px + rv[2, 1] * py + rv[2, 2] * pz + tv[2]
    depth_ok = (depth >= f32(DEPTH_MIN)) & (depth < f32(DEPTH_MAX))
    depth_safe = jnp.where(depth_ok, depth, one)

    # Quaternion -> rotation matrix, with zero-quaternion cull (:148-169).
    qx, qy, qz, qw = (
        comp(rotations, 0), comp(rotations, 1),
        comp(rotations, 2), comp(rotations, 3),
    )
    quat_norm_sq = qx * qx + qy * qy + qz * qz + qw * qw
    quat_ok = quat_norm_sq > f32(0.0)
    inv_norm = jax.lax.rsqrt(jnp.where(quat_ok, quat_norm_sq, one))
    qx, qy, qz = qx * inv_norm, qy * inv_norm, qz * inv_norm
    qw = jnp.where(quat_ok, qw * inv_norm, one)
    r = quat_to_rotmat_components(qx, qy, qz, qw)  # 9 x [P], row-major

    # 3D covariance Sigma = R diag(s^2) R^T, symmetric 6 components
    # (:171-199). s = exp(inner scaling).
    s0 = jnp.exp(comp(scalings, 0))
    s1 = jnp.exp(comp(scalings, 1))
    s2 = jnp.exp(comp(scalings, 2))
    v0, v1, v2 = s0 * s0, s1 * s1, s2 * s2

    def sigma(i, j):
        return (
            v0 * r[3 * i + 0] * r[3 * j + 0]
            + v1 * r[3 * i + 1] * r[3 * j + 1]
            + v2 * r[3 * i + 2] * r[3 * j + 2]
        )

    s_xx, s_yy, s_zz = sigma(0, 0), sigma(1, 1), sigma(2, 2)
    s_xy, s_xz, s_yz = sigma(0, 1), sigma(0, 2), sigma(1, 2)

    # Perspective projection with half-pixel center offset (:201-212).
    norm_x = pv_x / depth_safe
    norm_y = pv_y / depth_safe
    pos2d_x = norm_x * fx + camera.image_size_half[0] - f32(0.5)
    pos2d_y = norm_y * fy + camera.image_size_half[1] - f32(0.5)
    if camera.pos2d_shift is not None:
        # Slab-local coordinates (tile sharding). Subtracting the integer
        # pixel offset from the full-frame value is exact in f32, keeping
        # tile assignment and blend weights bitwise equal to the
        # single-device render (see Camera.pos2d_shift).
        pos2d_x = pos2d_x - camera.pos2d_shift[0]
        pos2d_y = pos2d_y - camera.pos2d_shift[1]

    # EWA: T = J @ Rv with clamped normalized coords (:214-241). The clamp's
    # gradient is masked exactly as in the reference.
    fz_x = fx / depth_safe
    fz_y = fy / depth_safe
    cx = jnp.where(norm_x < -bx, -bx, jnp.where(norm_x > bx, bx, norm_x))
    cy = jnp.where(norm_y < -by, -by, jnp.where(norm_y > by, by, norm_y))
    # T rows (2x3): t0k = fz_x (R[0,k] - cx R[2,k]); t1k = fz_y (R[1,k] - cy R[2,k])
    t00 = fz_x * (rv[0, 0] - cx * rv[2, 0])
    t01 = fz_x * (rv[0, 1] - cx * rv[2, 1])
    t02 = fz_x * (rv[0, 2] - cx * rv[2, 2])
    t10 = fz_y * (rv[1, 0] - cy * rv[2, 0])
    t11 = fz_y * (rv[1, 1] - cy * rv[2, 1])
    t12 = fz_y * (rv[1, 2] - cy * rv[2, 2])

    # Sigma' = T Sigma T^T + C_f I, symmetric 3 components.
    def quad(a0, a1, a2, b0, b1, b2):
        return (
            a0 * b0 * s_xx + a1 * b1 * s_yy + a2 * b2 * s_zz
            + (a0 * b1 + a1 * b0) * s_xy
            + (a0 * b2 + a2 * b0) * s_xz
            + (a1 * b2 + a2 * b1) * s_yz
        )

    c_xx = quad(t00, t01, t02, t00, t01, t02) + f32(FILTER_LOW_PASS)
    c_yy = quad(t10, t11, t12, t10, t11, t12) + f32(FILTER_LOW_PASS)
    c_xy = quad(t00, t01, t02, t10, t11, t12)

    # Conic = inverse 2D covariance; det == 0 culls (:243-252).
    det = c_xx * c_yy - c_xy * c_xy
    det_ok = det != f32(0.0)
    det_safe = jnp.where(det_ok, det, one)
    conic_xx = c_yy / det_safe
    conic_xy = -c_xy / det_safe
    conic_yy = c_xx / det_safe

    # Radius from the max eigenvalue (:254-284).
    mid = (c_xx + c_yy) * f32(0.5)
    eig_diff = jnp.sqrt(jnp.maximum(mid * mid - det, f32(0.0)))
    eig_max = jnp.maximum(mid + eig_diff, mid - eig_diff)
    radius = jnp.ceil(jnp.sqrt(jnp.maximum(eig_max, f32(0.0))) * f32(FACTOR_RADIUS))

    # Touched-tile AABB, truncated toward zero then clamped (:286-306).
    tsx, tsy = f32(TILE_SIZE_X), f32(TILE_SIZE_Y)

    def tile_bounds(rx, ry):
        x_max = jnp.clip(
            ((pos2d_x + rx + (tsx - 1.0)) / tsx).astype(jnp.int32), 0, tile_count_x
        )
        x_min = jnp.clip(((pos2d_x - rx) / tsx).astype(jnp.int32), 0, tile_count_x)
        y_max = jnp.clip(
            ((pos2d_y + ry + (tsy - 1.0)) / tsy).astype(jnp.int32), 0, tile_count_y
        )
        y_min = jnp.clip(((pos2d_y - ry) / tsy).astype(jnp.int32), 0, tile_count_y)
        return x_max, x_min, y_max, y_min

    x_max, x_min, y_max, y_min = tile_bounds(radius, radius)
    # `visible` / `radii` always use the reference AABB (densify parity).
    tiles_ok = (x_max - x_min) * (y_max - y_min) > 0

    if tight_culling and opacities is not None:
        sg = jax.lax.stop_gradient
        op = jax.nn.sigmoid(sg(comp(opacities, 0)))
        # 2L = 2 ln(255 * opacity); <= 0 means alpha < 1/255 everywhere.
        ll2 = f32(2.0) * jnp.log(jnp.maximum(op, f32(1e-12)) * f32(255.0))
        alive = ll2 > f32(0.0)
        ll2 = jnp.maximum(ll2, f32(0.0))
        # Half-extents of the blendable ellipse's AABB (+ margin against
        # f32 rounding at the alpha threshold; tile granularity makes the
        # margin nearly free). The reference's ``trunc((pos + r + 15)/16)``
        # idiom is a true ceil only for the reference's *integer* radii —
        # for fractional extents it would drop the last tile whenever
        # ``(pos + extent) mod 16 < 1`` — so the tight box uses proper
        # floor bounds and is intersected with the reference box
        # explicitly.
        margin = f32(0.01)
        ex = jnp.sqrt(ll2 * jnp.maximum(sg(c_xx), f32(0.0))) + margin
        ey = jnp.sqrt(ll2 * jnp.maximum(sg(c_yy), f32(0.0))) + margin

        def tight_lo(pos, e, ts, hi_clip):
            return jnp.clip(
                jnp.floor((sg(pos) - e) / ts).astype(jnp.int32), 0, hi_clip
            )

        def tight_hi(pos, e, ts, hi_clip):
            return jnp.clip(
                jnp.floor((sg(pos) + e) / ts).astype(jnp.int32) + 1, 0, hi_clip
            )

        x_min = jnp.maximum(x_min, tight_lo(pos2d_x, ex, tsx, tile_count_x))
        x_max = jnp.minimum(x_max, tight_hi(pos2d_x, ex, tsx, tile_count_x))
        y_min = jnp.maximum(y_min, tight_lo(pos2d_y, ey, tsy, tile_count_y))
        y_max = jnp.minimum(y_max, tight_hi(pos2d_y, ey, tsy, tile_count_y))
        empty = jnp.logical_not(alive) | (x_max < x_min) | (y_max < y_min)
        x_max = jnp.where(empty, x_min, x_max)
        y_max = jnp.where(empty, y_min, y_max)

    tile_count = (x_max - x_min) * (y_max - y_min)

    # View direction for SH (:314-323); zero-offset cull.
    ox = px - camera.view_position[0]
    oy = py - camera.view_position[1]
    oz = pz - camera.view_position[2]
    offset_norm_sq = ox * ox + oy * oy + oz * oz
    offset_ok = offset_norm_sq > f32(0.0)
    inv_off = jax.lax.rsqrt(jnp.where(offset_ok, offset_norm_sq, one))
    vx = jnp.where(offset_ok, ox * inv_off, f32(0.0))
    vy = jnp.where(offset_ok, oy * inv_off, f32(0.0))
    vz = jnp.where(offset_ok, oz * inv_off, one)

    # SH -> RGB, +0.5 offset, clamp at zero with gradient mask (:336-392).
    if SH_TRANSPOSED:
        # One exact transpose to [48, P]; the barrier keeps XLA from
        # fusing it away into 48 strided reads of the padded [P, 48].
        sh_rows = jax.lax.optimization_barrier(colors_sh.T)
        raw_r, raw_g, raw_b = eval_sh_rows(sh_rows, vx, vy, vz, sh_degree)
    else:
        raw_r, raw_g, raw_b = eval_sh(colors_sh, vx, vy, vz, sh_degree)
    visible = depth_ok & quat_ok & det_ok & tiles_ok & offset_ok
    vis_f = visible.astype(jnp.float32)

    def clamp_color(c):
        c = c + f32(0.5)
        return jnp.where(c >= f32(0.0), c, f32(0.0)) * vis_f

    return ProjectionOutput(
        color_r=clamp_color(raw_r),
        color_g=clamp_color(raw_g),
        color_b=clamp_color(raw_b),
        conic_xx=conic_xx * vis_f,
        conic_xy=conic_xy * vis_f,
        conic_yy=conic_yy * vis_f,
        pos2d_x=pos2d_x * vis_f,
        pos2d_y=pos2d_y * vis_f,
        depths=jnp.where(visible, depth, f32(0.0)),
        radii=jnp.where(visible, radius.astype(jnp.int32), 0),
        tile_x_max=jnp.where(visible, x_max, 0),
        tile_x_min=jnp.where(visible, x_min, 0),
        tile_y_max=jnp.where(visible, y_max, 0),
        tile_y_min=jnp.where(visible, y_min, 0),
        tile_counts=jnp.where(visible, tile_count, 0),
        visible=visible,
    )
