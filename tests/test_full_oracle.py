"""End-to-end f64 oracle: an independent NumPy implementation of the FULL
pipeline (projection -> expansion -> (tile, depth16) stable sort ->
sequential blend), compared against the compiled render.

This closes the second-oracle gap for the composed pipeline: the f64 EWA
check (test_projection.py) covers projection alone and the sequential
blend oracle (tests/oracle.py) covers rasterization alone; here the
*composition* is checked — in particular the binning/sort tie semantics
(the tie-sensitive key is ``tile << 16 | depth16``,
/root/reference/src/render/gaussian_3d/jit/kernel/rank/kernel.wgsl:112-114;
entries with equal keys must blend in point-id order, the stable pre-sort
order). The scene deliberately includes a cluster of overlapping Gaussians
at *identical depth* so any tie-order divergence changes the image.

Projection here is f64 full-matrix EWA (np.linalg.inv); the pipeline is
f32 — pixels where an entry's alpha sits near the 1/255 blend threshold
can legitimately flip, so the comparison bounds the mismatch *fraction*,
not just the max.
"""

import numpy as np
import jax.numpy as jnp

from gausplat_tpu import GaussianScene, RenderOptions, View, render
from gausplat_tpu.constants import (
    DEPTH_MAX,
    DEPTH_MIN,
    DEPTH_ORDER_OFFSET,
    FACTOR_RADIUS,
    FILTER_LOW_PASS,
    SH_COEF,
)
from tests.oracle import rasterize_forward

W, H = 64, 48
TCX, TCY = 4, 3
TILE = 16


def _depth16(depth_f32: np.float32) -> int:
    """The reference's depth bit trick, restated independently in NumPy."""
    bits = int(np.float32(depth_f32).view(np.uint32))
    return ((bits + DEPTH_ORDER_OFFSET) & 0xFFFFFFFF) >> 11  # wrapping u32 add


def _oracle_project(scene, cam_view, cam_rot, cam_trans, focal, half, bound):
    """f64 projection of every point; returns per-point dicts or None."""
    p = scene.point_count
    csh = np.asarray(scene.colors_sh, np.float64).reshape(p, 16, 3)
    positions = np.asarray(scene.positions, np.float64)
    rotations = np.asarray(scene.rotations, np.float64)
    scalings = np.asarray(scene.scalings, np.float64)
    opacities = 1.0 / (1.0 + np.exp(-np.asarray(scene.opacities, np.float64)[:, 0]))

    out = []
    for i in range(p):
        p_view = cam_rot @ positions[i] + cam_trans
        depth = p_view[2]
        if not (DEPTH_MIN <= depth < DEPTH_MAX):
            out.append(None)
            continue
        q = rotations[i]
        n = np.linalg.norm(q)
        if n == 0.0:
            out.append(None)
            continue
        x, y, z, w = q / n
        rot = np.array(
            [
                [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
                [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
                [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
            ]
        )
        s = np.exp(scalings[i])
        cov3d = rot @ np.diag(s * s) @ rot.T
        norm = p_view[:2] / depth
        pos2d = norm * focal + half - 0.5
        c = np.clip(norm, -bound, bound)
        j = np.array(
            [
                [focal[0] / depth, 0, -focal[0] / depth * c[0]],
                [0, focal[1] / depth, -focal[1] / depth * c[1]],
            ]
        )
        t = j @ cam_rot
        cov2d = t @ cov3d @ t.T + FILTER_LOW_PASS * np.eye(2)
        det = np.linalg.det(cov2d)
        if det == 0.0:
            out.append(None)
            continue
        conic = np.linalg.inv(cov2d)
        radius = np.ceil(FACTOR_RADIUS * np.sqrt(np.linalg.eigvalsh(cov2d).max()))
        x_max = int(np.clip(np.trunc((pos2d[0] + radius + TILE - 1) / TILE), 0, TCX))
        x_min = int(np.clip(np.trunc((pos2d[0] - radius) / TILE), 0, TCX))
        y_max = int(np.clip(np.trunc((pos2d[1] + radius + TILE - 1) / TILE), 0, TCY))
        y_min = int(np.clip(np.trunc((pos2d[1] - radius) / TILE), 0, TCY))
        if (x_max - x_min) * (y_max - y_min) <= 0:
            out.append(None)
            continue
        offset = positions[i] - cam_view
        off_n = np.linalg.norm(offset)
        if off_n == 0.0:
            out.append(None)
            continue
        # Degree-0 SH color (+0.5, clamp at 0).
        color = np.maximum(SH_COEF[0][0] * csh[i, 0] + 0.5, 0.0)
        out.append(
            dict(
                color=color, conic=conic, opacity=opacities[i], pos2d=pos2d,
                depth=depth, aabb=(x_min, x_max, y_min, y_max),
            )
        )
    return out


def test_full_pipeline_matches_f64_oracle():
    rng = np.random.default_rng(11)
    p = 80
    positions = rng.standard_normal((p, 3)).astype(np.float32) * 0.6
    # A cluster of 6 overlapping Gaussians at IDENTICAL view depth (the
    # camera looks down -z from (0,0,-4): equal z => equal depth), with
    # distinct colors: blend order is tie-order-sensitive by construction.
    positions[:6, 2] = 0.125
    positions[:6, 0] = 0.05 * np.arange(6) - 0.12
    positions[:6, 1] = 0.0

    from gausplat_tpu import Points

    scene = GaussianScene.from_points(Points.default(p))
    scene = scene.set_positions(jnp.asarray(positions))
    scene = scene.set_rotations(
        jnp.asarray(rng.standard_normal((p, 4)).astype(np.float32))
    )
    scene = scene.set_scalings(
        jnp.asarray((0.05 + 0.15 * rng.random((p, 3))).astype(np.float32))
    )
    scene = scene.set_opacities(
        jnp.asarray((0.35 + 0.6 * rng.random((p, 1))).astype(np.float32))
    )
    csh = np.zeros((p, 48), np.float32)
    csh[:, :3] = rng.random((p, 3)).astype(np.float32) * 2.0 - 0.5
    scene = scene.set_colors_sh(jnp.asarray(csh))

    view = View(
        field_of_view_x=1.0,
        field_of_view_y=0.8,
        image_height=H,
        image_width=W,
        view_position=[0.0, 0.0, -4.0],
        view_transform=View.transform(np.eye(3), [0.0, 0.0, 4.0]),
    )
    opts = RenderOptions(
        backend="xla",
        colors_sh_degree_max=0,
        tile_entry_capacity=1 << 16,
        # The f64 oracle expands with the reference AABB and the rendered
        # counts are index-compared; keep the reference semantics here.
        tight_culling=False,
    )
    out = render(scene, view, opts)
    img = np.asarray(out.colors_rgb_2d)

    # --- independent f64 oracle -------------------------------------------------
    tan_x, tan_y = np.tan(1.0 / 2.0), np.tan(0.8 / 2.0)
    focal = np.array([W / tan_x / 2.0, H / tan_y / 2.0])
    half = np.array([W / 2.0, H / 2.0])
    bound = np.array(
        [tan_x * (FILTER_LOW_PASS + 1.0), tan_y * (FILTER_LOW_PASS + 1.0)]
    )
    cam_rot = np.eye(3)
    cam_trans = np.array([0.0, 0.0, 4.0])
    cam_view = np.array([0.0, 0.0, -4.0])
    proj = _oracle_project(scene, cam_view, cam_rot, cam_trans, focal, half, bound)

    # Expansion in point-ascending, tile-row-major order (the stable
    # pre-sort order) -> stable sort by (tile << 16 | depth16).
    entries = []
    for i, pr in enumerate(proj):
        if pr is None:
            continue
        x_min, x_max, y_min, y_max = pr["aabb"]
        d16 = _depth16(np.float32(pr["depth"]))
        for ty in range(y_min, y_max):
            for tx in range(x_min, x_max):
                entries.append(((ty * TCX + tx) << 16 | d16, i))
    order = np.argsort([k for k, _ in entries], kind="stable")
    sorted_points = np.array([entries[j][1] for j in order], np.int32)
    sorted_tiles = np.array([entries[j][0] >> 16 for j in order], np.int32)

    num_tiles = TCX * TCY
    ranges = np.zeros((num_tiles, 2), np.int32)
    ranges[:, 1] = np.searchsorted(sorted_tiles, np.arange(num_tiles), "right")
    ranges[:, 0] = np.concatenate([[0], ranges[:-1, 1]])

    # The cluster must actually produce key ties (same tile, same depth16).
    keys = np.array([entries[j][0] for j in order])
    assert np.any(np.diff(keys) == 0), "tie construction failed"

    point_data = np.zeros((p, 9), np.float32)
    for i, pr in enumerate(proj):
        if pr is None:
            continue
        point_data[i, 0:3] = pr["color"]
        point_data[i, 3] = pr["conic"][0, 0]
        point_data[i, 4] = pr["conic"][0, 1]
        point_data[i, 5] = pr["conic"][1, 1]
        point_data[i, 6] = pr["opacity"]
        point_data[i, 7:9] = pr["pos2d"]

    oracle_img, _, oracle_counts = rasterize_forward(
        point_data, sorted_points, ranges, W, H, TCX
    )

    # f32 pipeline vs f64 oracle: tiny projection rounding everywhere,
    # plus possible alpha-threshold flips on isolated pixels.
    diff = np.abs(img - oracle_img).max(axis=-1)
    assert (diff > 5e-3).mean() < 2e-3, f"{(diff > 5e-3).sum()} bad pixels"
    assert np.median(diff) < 1e-4
    cnt = np.asarray(out.point_rendered_counts)
    assert (cnt != oracle_counts).mean() < 5e-3
