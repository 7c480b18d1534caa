"""Projection tests: analytic single-Gaussian checks against an independent
NumPy formulation (full-matrix EWA with np.linalg.inv), culling, SH eval.
"""

import numpy as np
import jax
import jax.numpy as jnp

from gausplat_tpu import View
from gausplat_tpu.constants import FACTOR_RADIUS, FILTER_LOW_PASS, SH_COEF
from gausplat_tpu.ops.projection import Camera, project_gaussians, quat_to_rotmat
import pytest

pytestmark = pytest.mark.quick


def _camera(width=64, height=48, fov_x=1.0, fov_y=0.8, origin=(0.0, 0.0, 4.0)):
    view = View(
        field_of_view_x=fov_x,
        field_of_view_y=fov_y,
        image_height=height,
        image_width=width,
        view_position=[-origin[0], -origin[1], -origin[2]],
        view_transform=View.transform(np.eye(3), list(origin)),
    )
    return Camera.from_view(view), view


def _numpy_reference_project(position, quat, log_scale, cam):
    """Independent EWA projection using full matrices and np.linalg.inv."""
    r_v = np.asarray(cam.view_rotation, np.float64)
    t_v = np.asarray(cam.view_translation, np.float64)
    f = np.asarray(cam.focal_length, np.float64)
    half = np.asarray(cam.image_size_half, np.float64)
    bound = np.asarray(cam.view_bound, np.float64)

    p_view = r_v @ position + t_v
    depth = p_view[2]
    q = np.asarray(quat, np.float64)
    q = q / np.linalg.norm(q)
    x, y, z, w = q
    rot = np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )
    s = np.exp(np.asarray(log_scale, np.float64))
    cov3d = rot @ np.diag(s * s) @ rot.T
    norm = p_view[:2] / depth
    pos2d = norm * f + half - 0.5
    c = np.clip(norm, -bound, bound)
    j = np.array(
        [
            [f[0] / depth, 0, -f[0] / depth * c[0]],
            [0, f[1] / depth, -f[1] / depth * c[1]],
        ]
    )
    t = j @ r_v
    cov2d = t @ cov3d @ t.T + FILTER_LOW_PASS * np.eye(2)
    conic_m = np.linalg.inv(cov2d)
    eig = np.linalg.eigvalsh(cov2d)
    radius = np.ceil(FACTOR_RADIUS * np.sqrt(eig.max()))
    return pos2d, np.array([conic_m[0, 0], conic_m[0, 1], conic_m[1, 1]]), radius, depth


def test_single_gaussian_analytic():
    cam, _ = _camera()
    rng = np.random.default_rng(5)
    for _ in range(8):
        position = rng.standard_normal(3) * 0.5
        quat = rng.standard_normal(4)
        log_scale = np.log(0.05 + 0.2 * rng.random(3))
        csh = np.zeros((1, 48), np.float32)

        out = project_gaussians(
            jnp.asarray(csh),
            jnp.asarray(position[None], jnp.float32),
            jnp.asarray(quat[None], jnp.float32),
            jnp.asarray(log_scale[None], jnp.float32),
            cam,
            sh_degree=0,
            tile_count_x=4,
            tile_count_y=3,
        )
        pos2d, conic, radius, depth = _numpy_reference_project(
            position, quat, log_scale, cam
        )
        assert bool(out.visible[0])
        np.testing.assert_allclose(out.positions_2d[0], pos2d, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(out.conics[0], conic, rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(out.depths[0], depth, rtol=1e-5)
        assert abs(int(out.radii[0]) - radius) <= 1  # f32 vs f64 ceil boundary


def test_culling():
    cam, _ = _camera()
    positions = np.array(
        [
            [0.0, 0.0, 0.0],  # visible (depth 4)
            [0.0, 0.0, -4.1],  # behind camera
            [0.0, 0.0, 1e5],  # beyond DEPTH_MAX
            [0.0, 0.0, -3.9],  # depth 0.1 < DEPTH_MIN
            [50.0, 0.0, 0.0],  # off-screen (no touched tiles)
        ],
        np.float32,
    )
    p = positions.shape[0]
    quats = np.tile(np.array([0, 0, 0, 1], np.float32), (p, 1))
    quats[1] = 0.0  # zero quaternion also culls
    out = project_gaussians(
        jnp.zeros((p, 48), jnp.float32),
        jnp.asarray(positions),
        jnp.asarray(quats),
        jnp.asarray(np.full((p, 3), np.log(0.05), np.float32)),
        cam,
        sh_degree=0,
        tile_count_x=4,
        tile_count_y=3,
    )
    np.testing.assert_array_equal(
        np.asarray(out.visible), [True, False, False, False, False]
    )
    assert np.all(np.asarray(out.radii)[1:] == 0)
    assert np.all(np.asarray(out.tile_counts)[1:] == 0)
    assert int(out.radii[0]) > 0


def test_sh_degree0_color():
    cam, _ = _camera()
    csh = np.zeros((1, 48), np.float32)
    csh[0, 0:3] = (np.array([0.8, 0.5, 0.2]) - 0.5) / SH_COEF[0][0]
    out = project_gaussians(
        jnp.asarray(csh),
        jnp.zeros((1, 3), jnp.float32),
        jnp.asarray([[0, 0, 0, 1]], jnp.float32),
        jnp.full((1, 3), np.log(0.05), jnp.float32),
        cam,
        sh_degree=0,
        tile_count_x=4,
        tile_count_y=3,
    )
    np.testing.assert_allclose(
        out.colors_rgb_3d[0], [0.8, 0.5, 0.2], rtol=1e-5, atol=1e-6
    )


def test_color_clamp_gradient_mask():
    """Negative SH colors clamp to zero and pass no gradient."""
    cam, _ = _camera()
    csh = np.zeros((1, 48), np.float32)
    csh[0, 0] = -10.0  # drives red far below zero
    csh[0, 1] = 0.0

    def red(csh_arr):
        out = project_gaussians(
            csh_arr,
            jnp.zeros((1, 3), jnp.float32),
            jnp.asarray([[0, 0, 0, 1]], jnp.float32),
            jnp.full((1, 3), np.log(0.05), jnp.float32),
            cam,
            sh_degree=0,
            tile_count_x=4,
            tile_count_y=3,
        )
        return out.colors_rgb_3d[0, 0]

    assert float(red(jnp.asarray(csh))) == 0.0
    g = jax.grad(red)(jnp.asarray(csh))
    assert float(jnp.abs(g).max()) == 0.0


def test_quat_to_rotmat_orthonormal():
    rng = np.random.default_rng(6)
    q = rng.standard_normal((10, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    r = np.asarray(quat_to_rotmat(jnp.asarray(q)))
    eye = np.einsum("pij,pkj->pik", r, r)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (10, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(r), 1.0, atol=1e-5)


def test_sh_transposed_bit_identical(monkeypatch):
    """GAUSPLAT_SH_T ([48, P] coefficient rows) matches the [P, 48] path
    forward AND backward to ULP level (the math and per-channel
    accumulation order are identical; XLA's FMA fusion choices differ
    between the two graphs, so exact bit-identity is not guaranteed)."""
    from gausplat_tpu.ops import projection

    cam, _ = _camera()
    rng = np.random.default_rng(11)
    p = 33
    args = (
        jnp.asarray(rng.standard_normal((p, 48)) * 0.3, jnp.float32),
        jnp.asarray(rng.random((p, 3)) * 2 - 1, jnp.float32),
        jnp.asarray(rng.standard_normal((p, 4)), jnp.float32),
        jnp.asarray(np.log(0.02 + 0.05 * rng.random((p, 3))), jnp.float32),
    )

    def run(csh, pos, quat, scal):
        out = project_gaussians(
            csh, pos, quat, scal, cam,
            sh_degree=3, tile_count_x=4, tile_count_y=3,
        )
        return out

    def loss(*a):
        o = run(*a)
        return (
            jnp.sum(o.colors_rgb_3d**2)
            + jnp.sum(o.conics)
            + jnp.sum(o.positions_2d)
        )

    base_out = jax.jit(run)(*args)
    base_grads = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))(*args)

    monkeypatch.setattr(projection, "SH_TRANSPOSED", 1)
    t_out = jax.jit(run)(*args)
    t_grads = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))(*args)

    for a, b in zip(base_out, t_out):
        np.testing.assert_allclose(
            np.asarray(a, np.float64), np.asarray(b, np.float64),
            rtol=1e-6, atol=1e-6,
        )
    for a, b in zip(base_grads, t_grads):
        np.testing.assert_allclose(
            np.asarray(a, np.float64), np.asarray(b, np.float64),
            rtol=1e-6, atol=1e-6,
        )


def test_pos_transposed_matches(monkeypatch):
    """GAUSPLAT_POS_T (component-row positions/rotations/scalings/opacities)
    matches the default path to ULP level, alone and combined with SH_T,
    including the tight-culling integer outputs (which must be exact)."""
    from gausplat_tpu.ops import projection

    cam, _ = _camera()
    rng = np.random.default_rng(12)
    p = 29
    csh = jnp.asarray(rng.standard_normal((p, 48)) * 0.3, jnp.float32)
    pos = jnp.asarray(rng.random((p, 3)) * 2 - 1, jnp.float32)
    quat = jnp.asarray(rng.standard_normal((p, 4)), jnp.float32)
    scal = jnp.asarray(np.log(0.02 + 0.05 * rng.random((p, 3))), jnp.float32)
    opac = jnp.asarray(rng.standard_normal((p, 1)), jnp.float32)

    def run():
        return project_gaussians(
            csh, pos, quat, scal, cam,
            sh_degree=3, tile_count_x=4, tile_count_y=3,
            opacities=opac, tight_culling=True,
        )

    base = jax.jit(run)()
    for flags in ({"POS_TRANSPOSED": 1},
                  {"POS_TRANSPOSED": 1, "SH_TRANSPOSED": 1}):
        for name, val in flags.items():
            monkeypatch.setattr(projection, name, val)
        out = jax.jit(run)()
        for a, b in zip(base, out):
            a, b = np.asarray(a), np.asarray(b)
            if a.dtype in (np.int32, np.bool_):
                np.testing.assert_array_equal(a, b)
            else:
                np.testing.assert_allclose(
                    a.astype(np.float64), b.astype(np.float64),
                    rtol=1e-6, atol=1e-6,
                )
        for name in flags:
            monkeypatch.setattr(projection, name, 0)
