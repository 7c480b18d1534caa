"""End-to-end toy-scene render (BASELINE config 1 analogue): the golden
18-point sixstars fixture at 256x256, SH degree 0, forward-only, checked
pixel-for-pixel against the sequential reference-semantics oracle."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gausplat_tpu import RenderOptions, View, decode_polygon, render
from gausplat_tpu.ops.binning import bin_gaussians
from gausplat_tpu.ops.projection import Camera, project_gaussians
from gausplat_tpu.ops.rasterize import pack_point_data

import oracle

REFERENCE_FIXTURE = "/root/reference/examples/data/3dgs-ply/sixstars.3dgs.ply"


@pytest.mark.skipif(
    not os.path.exists(REFERENCE_FIXTURE), reason="reference fixture not present"
)
def test_sixstars_render_matches_oracle():
    with open(REFERENCE_FIXTURE, "rb") as fh:
        scene = decode_polygon(fh.read())

    size = 256
    view = View(
        field_of_view_x=1.2,
        field_of_view_y=1.2,
        image_height=size,
        image_width=size,
        view_position=[0.0, 0.0, -4.0],
        view_transform=View.transform(np.eye(3), [0.0, 0.0, 4.0]),
    )
    opts = RenderOptions(
        backend="xla",
        colors_sh_degree_max=0,
        tile_entry_capacity=1 << 14,
        block_size=64,
        # The oracle expansion below uses the reference AABB; rendered-count
        # indices are compared exactly, so disable the alpha-aware cull.
        tight_culling=False,
    )
    out = render(scene, view, opts)
    img = np.asarray(out.colors_rgb_2d)
    assert img.shape == (size, size, 3)
    assert np.isfinite(img).all()
    assert img.max() > 0.05  # the stars are actually visible

    # Pixel parity vs the sequential oracle on the same sorted entries.
    cam = Camera.from_view(view)
    tc = size // 16
    proj = project_gaussians(
        scene.colors_sh, scene.positions, scene.rotations, scene.scalings,
        cam, sh_degree=0, tile_count_x=tc, tile_count_y=tc,
    )
    binning = bin_gaussians(
        proj.depths, proj.tile_x_max, proj.tile_x_min, proj.tile_y_min,
        proj.tile_counts, tile_count_x=tc, tile_count_y=tc,
        capacity=1 << 14,
    )
    pd = np.asarray(
        pack_point_data(proj, jax.nn.sigmoid(scene.opacities[:, 0]))
    ).T[:18]
    oimg, otrans, ocnt = oracle.rasterize_forward(
        pd,
        np.asarray(binning.point_indices),
        np.asarray(binning.tile_ranges),
        size, size, tc,
    )
    np.testing.assert_allclose(img, oimg, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out.transmittances), otrans, atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(out.point_rendered_counts), ocnt
    )
