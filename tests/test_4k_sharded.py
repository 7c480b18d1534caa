"""4K tile-sharded render smoke (BASELINE config 5 analogue on the virtual
8-device mesh): a 3840x2176 frame sharded by tile rows across 8 devices,
checked against the single-device render on a downsampled row band."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from gausplat_tpu import GaussianScene, Points, RenderOptions, View, render
from gausplat_tpu.parallel import make_mesh, render_tile_sharded

W, H = 3840, 2176  # 240 x 136 tiles = 32640 (within the 2^16 tile ceiling)


def _scene(p=400, seed=0):
    rng = np.random.default_rng(seed)
    pts = Points(
        rng.random((p, 3)).astype(np.float32), rng.standard_normal((p, 3)) * 1.2
    )
    scene = GaussianScene.from_points(pts)
    scene = scene.set_scalings(
        jnp.asarray(0.02 + 0.05 * rng.random((p, 3)), jnp.float32)
    )
    scene = scene.set_opacities(
        jnp.asarray(0.3 + 0.6 * rng.random((p, 1)), jnp.float32)
    )
    return scene


@pytest.mark.skipif(
    not os.environ.get("GAUSPLAT_SLOW_TESTS"),
    reason="~10 min on the CPU mesh; set GAUSPLAT_SLOW_TESTS=1",
)
def test_4k_tile_sharded_smoke():
    scene = _scene()
    view = View(
        field_of_view_x=1.2,
        field_of_view_y=0.75,
        image_height=H,
        image_width=W,
        view_position=[0.0, 0.0, -5.0],
        view_transform=View.transform(np.eye(3), [0.0, 0.0, 5.0]),
    )
    mesh = make_mesh((8,), ("tiles",))
    opts = RenderOptions(
        backend="xla", tile_entry_capacity=1 << 17, block_size=128
    )
    out = render_tile_sharded(scene, view, mesh, "tiles", opts)
    img = np.asarray(out.colors_rgb_2d)
    assert img.shape == (H, W, 3)
    assert np.isfinite(img).all()
    assert img.max() > 0.01
    assert int((np.asarray(out.radii) > 0).sum()) > 100
    # No truncation anywhere (totals are per-slab maxima under sharding).
    assert int(out.tile_point_total) < (1 << 17) // 8

    # Spot-check one slab against the single-device renderer.
    single = render(scene, view, opts)
    band = slice(0, H // 8)
    np.testing.assert_allclose(
        img[band], np.asarray(single.colors_rgb_2d)[band], atol=1e-5
    )
