"""Multi-chip tests on the 8-device virtual CPU mesh: data-parallel view
batching and tile-row-sharded rendering vs the single-device renderer."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gausplat_tpu import GaussianScene, Points, RenderOptions, View, render
from gausplat_tpu.parallel import (
    make_mesh,
    render_data_parallel,
    render_tile_sharded,
    render_views,
)
from gausplat_tpu.parallel.render import stack_cameras

OPTS = RenderOptions(backend="xla", tile_entry_capacity=2048, block_size=64)
W, H = 64, 64


def _scene(p=40, seed=2):
    rng = np.random.default_rng(seed)
    pts = Points(
        rng.random((p, 3)).astype(np.float32), rng.standard_normal((p, 3)) * 0.8
    )
    scene = GaussianScene.from_points(pts)
    scene = scene.set_scalings(
        jnp.asarray(0.03 + 0.1 * rng.random((p, 3)), jnp.float32)
    )
    scene = scene.set_opacities(
        jnp.asarray(0.2 + 0.6 * rng.random((p, 1)), jnp.float32)
    )
    return scene


def _views(n):
    out = []
    for i in range(n):
        angle = 0.15 * i
        c, s = np.cos(angle), np.sin(angle)
        rot = np.array([[c, 0, -s], [0, 1, 0], [s, 0, c]])
        # column-major [col][row] layout
        out.append(
            View(
                field_of_view_x=1.0,
                field_of_view_y=1.0,
                image_height=H,
                image_width=W,
                view_id=i,
                view_position=[4 * s, 0.0, -4 * c],
                view_transform=View.transform(rot.T, [0.0, 0.0, 4.0]),
            )
        )
    return out


def test_mesh_helper():
    assert len(jax.devices()) >= 8
    mesh = make_mesh((2, 4), ("data", "tiles"))
    assert mesh.shape == {"data": 2, "tiles": 4}


def test_data_parallel_matches_single():
    scene = _scene()
    views = _views(4)
    cams = stack_cameras(views)
    mesh = make_mesh((4,), ("data",))

    sharded = render_data_parallel(scene, cams, W, H, mesh, "data", OPTS)
    single = [np.asarray(render(scene, v, OPTS).colors_rgb_2d) for v in views]
    got = np.asarray(sharded.colors_rgb_2d)
    assert got.shape == (4, H, W, 3)
    for i in range(4):
        np.testing.assert_allclose(got[i], single[i], atol=1e-5)


def test_data_parallel_grads_sum_over_views():
    scene = _scene()
    views = _views(4)
    cams = stack_cameras(views)
    mesh = make_mesh((4,), ("data",))

    def loss_dp(s):
        out = render_data_parallel(scene=s, cameras=cams, image_width=W,
                                   image_height=H, mesh=mesh, options=OPTS)
        return jnp.mean(out.colors_rgb_2d**2)

    def loss_single(s):
        acc = 0.0
        for v in views:
            acc = acc + jnp.mean(render(s, v, OPTS).colors_rgb_2d ** 2)
        return acc / len(views)

    g_dp = jax.grad(loss_dp)(scene)
    g_ref = jax.grad(loss_single)(scene)
    for name in ("colors_sh", "opacities", "positions", "rotations", "scalings"):
        a, b = np.asarray(getattr(g_dp, name)), np.asarray(getattr(g_ref, name))
        scale = max(np.abs(b).max(), 1e-10)
        np.testing.assert_allclose(a / scale, b / scale, atol=1e-5, err_msg=name)


def test_tile_sharded_matches_single():
    scene = _scene()
    view = _views(1)[0]
    mesh = make_mesh((4,), ("tiles",))

    opts = RenderOptions(backend="xla", tile_entry_capacity=4096, block_size=64)
    sharded = render_tile_sharded(scene, view, mesh, "tiles", opts)
    single = render(scene, view, opts)

    np.testing.assert_allclose(
        np.asarray(sharded.colors_rgb_2d),
        np.asarray(single.colors_rgb_2d),
        atol=1e-5,
    )
    np.testing.assert_array_equal(
        np.asarray(sharded.radii) > 0, np.asarray(single.radii) > 0
    )


def test_tile_sharded_grads_match_single():
    scene = _scene()
    view = _views(1)[0]
    mesh = make_mesh((4,), ("tiles",))
    opts = RenderOptions(backend="xla", tile_entry_capacity=4096, block_size=64)

    def loss_sh(s):
        return jnp.mean(
            render_tile_sharded(s, view, mesh, "tiles", opts).colors_rgb_2d ** 2
        )

    def loss_single(s):
        return jnp.mean(render(s, view, opts).colors_rgb_2d ** 2)

    g_sh = jax.grad(loss_sh)(scene)
    g_ref = jax.grad(loss_single)(scene)
    for name in ("colors_sh", "opacities", "positions", "rotations", "scalings"):
        a, b = np.asarray(getattr(g_sh, name)), np.asarray(getattr(g_ref, name))
        scale = max(np.abs(b).max(), 1e-10)
        np.testing.assert_allclose(a / scale, b / scale, atol=1e-4, err_msg=name)
