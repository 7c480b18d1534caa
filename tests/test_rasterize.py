"""Rasterizer tests: differential tests of the vectorized TPU rasterizer
against the sequential NumPy oracle (reference semantics), and of the
custom-VJP backward against pure JAX autodiff of the forward.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gausplat_tpu import GaussianScene, View
from gausplat_tpu.ops.binning import bin_gaussians
from gausplat_tpu.ops.projection import Camera, project_gaussians
from gausplat_tpu.ops.rasterize import (
    build_tile_blocks,
    pack_point_data,
    rasterize_backward_xla,
    rasterize_forward_xla,
    tile_image,
    untile_image,
    untile_map,
)
from gausplat_tpu.render import pipeline as pipeline_mod

import oracle

W, H = 56, 40  # partial tiles on both axes (56 = 3.5 tiles, 40 = 2.5 tiles)
TCX, TCY = 4, 3
CAP, B = 1024, 64
P = 80


def _scene_arrays(seed=3):
    rng = np.random.default_rng(seed)
    csh = rng.standard_normal((P, 48)).astype(np.float32) * 0.4
    positions = (rng.standard_normal((P, 3)) * 0.8).astype(np.float32)
    rotations = rng.standard_normal((P, 4)).astype(np.float32)
    scalings = np.log(0.02 + 0.15 * rng.random((P, 3))).astype(np.float32)
    op_inner = (rng.standard_normal((P, 1)) * 2).astype(np.float32)
    return csh, positions, rotations, scalings, op_inner


def _view():
    return View(
        field_of_view_x=1.0,
        field_of_view_y=0.8,
        image_height=H,
        image_width=W,
        view_position=[0.0, 0.0, -4.0],
        view_transform=View.transform(np.eye(3), [0.0, 0.0, 4.0]),
    )


def _forward_pieces(seed=3):
    csh, positions, rotations, scalings, op_inner = _scene_arrays(seed)
    cam = Camera.from_view(_view())
    proj = project_gaussians(
        jnp.asarray(csh),
        jnp.asarray(positions),
        jnp.asarray(rotations),
        jnp.asarray(scalings),
        cam,
        sh_degree=3,
        tile_count_x=TCX,
        tile_count_y=TCY,
    )
    binning = bin_gaussians(
        proj.depths,
        proj.tile_x_max,
        proj.tile_x_min,
        proj.tile_y_min,
        proj.tile_counts,
        tile_count_x=TCX,
        tile_count_y=TCY,
        capacity=CAP,
    )
    pd_t = pack_point_data(proj, jax.nn.sigmoid(jnp.asarray(op_inner[:, 0])))
    blocks = build_tile_blocks(
        pd_t, binning.point_indices, binning.tile_ranges, block_size=B
    )
    # AoS [P, 9] view for the NumPy oracle.
    pd = np.asarray(pd_t).T[:P]
    return pd, binning, blocks


def test_forward_matches_oracle():
    pd, binning, blocks = _forward_pieces()
    it, tt, ct = rasterize_forward_xla(blocks, num_tiles=TCX * TCY, tile_count_x=TCX)
    img = np.asarray(untile_image(it, TCX, TCY, W, H))
    trans = np.asarray(untile_map(tt, TCX, TCY, W, H))
    cnt = np.asarray(untile_map(ct, TCX, TCY, W, H))

    oimg, otrans, ocnt = oracle.rasterize_forward(
        np.asarray(pd),
        np.asarray(binning.point_indices),
        np.asarray(binning.tile_ranges),
        W, H, TCX,
    )
    assert int(binning.total) > 100  # the scene actually covers tiles
    np.testing.assert_allclose(img, oimg, atol=5e-5)
    np.testing.assert_allclose(trans, otrans, atol=5e-5)
    np.testing.assert_array_equal(cnt, ocnt)


def test_backward_matches_oracle():
    pd, binning, blocks = _forward_pieces()
    it, tt, ct = rasterize_forward_xla(blocks, num_tiles=TCX * TCY, tile_count_x=TCX)

    rng = np.random.default_rng(11)
    gimg = rng.standard_normal((H, W, 3)).astype(np.float32)
    gt = tile_image(jnp.asarray(gimg), TCX, TCY)
    gdotc = jnp.sum(gt * it, axis=1)
    eg = rasterize_backward_xla(blocks, gt, gdotc, ct, tile_count_x=TCX)
    pp = jax.ops.segment_sum(eg.T, blocks.entry_point, num_segments=P + 1)[:P]

    ocnt = np.asarray(untile_map(ct, TCX, TCY, W, H))
    otr = np.asarray(untile_map(tt, TCX, TCY, W, H))
    ref = oracle.rasterize_backward(
        np.asarray(pd),
        np.asarray(binning.point_indices),
        np.asarray(binning.tile_ranges),
        gimg, ocnt, otr, W, H, TCX,
    )
    got = (pp[:, 0:3], pp[:, 3:6], pp[:, 6:7], pp[:, 7:9])
    for name, a, b in zip(("color", "conic", "opacity", "pos2d"), got, ref):
        a = np.asarray(a)
        scale = max(np.abs(b).max(), 1e-8)
        np.testing.assert_allclose(
            a / scale, b / scale, atol=2e-4, err_msg=name
        )


def test_custom_vjp_matches_autodiff():
    """The hand-written backward must equal autodiff of the pure forward."""
    csh, positions, rotations, scalings, op_inner = _scene_arrays(7)
    cam = Camera.from_view(_view())
    rng = np.random.default_rng(13)
    gimg = jnp.asarray(rng.standard_normal((H, W, 3)).astype(np.float32))

    fn = pipeline_mod._make_render_fn(W, H, P, 3, CAP, B, "xla", False)

    def pure_loss(csh, op, pos, rot, scal):
        proj = project_gaussians(
            csh, pos, rot, scal, cam, sh_degree=3, tile_count_x=TCX, tile_count_y=TCY
        )
        binning = bin_gaussians(
            proj.depths, proj.tile_x_max, proj.tile_x_min, proj.tile_y_min,
            proj.tile_counts,
            tile_count_x=TCX, tile_count_y=TCY, capacity=CAP,
        )
        pd_t = pack_point_data(proj, jax.nn.sigmoid(op[:, 0]))
        blocks = build_tile_blocks(
            pd_t, binning.point_indices, binning.tile_ranges, block_size=B
        )
        it, _, _ = rasterize_forward_xla(blocks, num_tiles=TCX * TCY, tile_count_x=TCX)
        return jnp.sum(untile_image(it, TCX, TCY, W, H) * gimg)

    def custom_loss(csh, op, pos, rot, scal):
        out = fn(csh, op, pos, rot, scal, jnp.zeros((P,)), cam)
        return jnp.sum(out.colors_rgb_2d * gimg)

    args = (
        jnp.asarray(csh), jnp.asarray(op_inner), jnp.asarray(positions),
        jnp.asarray(rotations), jnp.asarray(scalings),
    )
    g_auto = jax.jit(jax.grad(pure_loss, argnums=(0, 1, 2, 3, 4)))(*args)
    g_custom = jax.grad(custom_loss, argnums=(0, 1, 2, 3, 4))(*args)
    for name, a, b in zip(
        ("colors_sh", "opacities", "positions", "rotations", "scalings"),
        g_auto, g_custom,
    ):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-8)
        np.testing.assert_allclose(b / scale, a / scale, atol=1e-5, err_msg=name)


def test_pallas_interpret_matches_xla():
    """Pallas kernels (interpreter mode on CPU) vs the XLA fallback."""
    pytest.importorskip("jax.experimental.pallas")
    from gausplat_tpu.ops.rasterize import (
        rasterize_backward_pallas,
        rasterize_forward_pallas,
    )

    pd, binning, blocks = _forward_pieces()
    it_x, tt_x, ct_x = rasterize_forward_xla(
        blocks, num_tiles=TCX * TCY, tile_count_x=TCX
    )
    it_p, tt_p, ct_p = rasterize_forward_pallas(
        blocks, num_tiles=TCX * TCY, tile_count_x=TCX, interpret=True
    )
    np.testing.assert_allclose(np.asarray(it_p), np.asarray(it_x), atol=1e-6)
    np.testing.assert_allclose(np.asarray(tt_p), np.asarray(tt_x), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(ct_p), np.asarray(ct_x))

    rng = np.random.default_rng(17)
    gimg = rng.standard_normal((H, W, 3)).astype(np.float32)
    gt = tile_image(jnp.asarray(gimg), TCX, TCY)
    gdotc = jnp.sum(gt * it_x, axis=1)
    eg_x = rasterize_backward_xla(blocks, gt, gdotc, ct_x, tile_count_x=TCX)
    eg_p = rasterize_backward_pallas(
        blocks, gt, gdotc, ct_x, tile_count_x=TCX, interpret=True
    )
    np.testing.assert_allclose(np.asarray(eg_p), np.asarray(eg_x), atol=1e-5)
