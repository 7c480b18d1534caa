"""End-to-end pipeline tests (the reference's smoke tests + more:
gradient flow, the densification side channel, overflow detection,
validation errors)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gausplat_tpu import (
    GaussianScene,
    Points,
    RenderOptions,
    View,
    render,
)
from gausplat_tpu.errors import (
    InvalidPixelCountError,
    MismatchedPointCountError,
    UnsupportedSphericalHarmonicsDegreeError,
)

OPTS = RenderOptions(backend="xla", tile_entry_capacity=2048, block_size=64)


def _scene(p=50, seed=42):
    rng = np.random.default_rng(seed)
    pts = Points(
        rng.random((p, 3)).astype(np.float32),
        rng.standard_normal((p, 3)) * 0.8,
    )
    scene = GaussianScene.from_points(pts)
    scene = scene.set_scalings(jnp.asarray(0.02 + 0.1 * rng.random((p, 3)), jnp.float32))
    scene = scene.set_opacities(jnp.asarray(0.1 + 0.8 * rng.random((p, 1)), jnp.float32))
    return scene


def _view(w=64, h=48):
    return View(
        field_of_view_x=1.0,
        field_of_view_y=0.8,
        image_height=h,
        image_width=w,
        view_position=[0.0, 0.0, -4.0],
        view_transform=View.transform(np.eye(3), [0.0, 0.0, 4.0]),
    )


def test_default_render():
    """Reference smoke test (scene/gaussian_3d/mod.rs:370-385), small image."""
    out = render(GaussianScene.default(), _view(), OPTS)
    img = np.asarray(out.colors_rgb_2d)
    assert img.shape == (48, 64, 3)
    assert np.isfinite(img).all()


def test_render_and_backward():
    scene = _scene()
    view = _view()

    def loss(s, ref):
        out = render(s, view, OPTS, positions_2d_grad_norm_ref=ref)
        return jnp.mean(out.colors_rgb_2d**2)

    ref = jnp.zeros((scene.point_count,))
    val, (grads, grad_norm) = jax.value_and_grad(loss, argnums=(0, 1))(scene, ref)
    assert float(val) > 0
    for name in ("colors_sh", "opacities", "positions", "scalings"):
        g = np.asarray(getattr(grads, name))
        assert np.isfinite(g).all()
        assert np.abs(g).max() > 0, name
    # Densification side channel: per-point grad norms, nonnegative.
    grad_norm = np.asarray(grad_norm)
    assert grad_norm.shape == (scene.point_count,)
    assert (grad_norm >= 0).all() and grad_norm.max() > 0

    out = render(scene, view, OPTS)
    radii = np.asarray(out.radii)
    assert (radii > 0).sum() > 0
    # Culled points get zero grad norm.
    assert np.all(grad_norm[radii == 0] == 0)


def test_visibility_consistency():
    """Invisible points receive zero gradients."""
    scene = _scene(30)
    # Push half the points behind the camera.
    positions = np.array(scene.positions)
    positions[15:, 2] = -100.0
    scene = GaussianScene(
        scene.colors_sh, scene.opacities, jnp.asarray(positions),
        scene.rotations, scene.scalings,
    )
    view = _view()

    def loss(s):
        return jnp.mean(render(s, view, OPTS).colors_rgb_2d ** 2)

    grads = jax.grad(loss)(scene)
    assert np.abs(np.asarray(grads.colors_sh)[15:]).max() == 0
    assert np.abs(np.asarray(grads.scalings)[15:]).max() == 0


def test_overflow_reported():
    scene = _scene(200)
    small = RenderOptions(backend="xla", tile_entry_capacity=64, block_size=64)
    out = render(scene, _view(), small)
    # Total reflects the true entry count even though capacity truncates.
    assert int(out.tile_point_total) >= 0


def test_validation_errors():
    scene = _scene(10)
    with pytest.raises(UnsupportedSphericalHarmonicsDegreeError):
        render(scene, _view(), RenderOptions(colors_sh_degree_max=4))
    with pytest.raises(InvalidPixelCountError):
        render(scene, _view(w=0, h=0), OPTS)
    empty = GaussianScene(
        jnp.zeros((0, 48)), jnp.zeros((0, 1)), jnp.zeros((0, 3)),
        jnp.zeros((0, 4)), jnp.zeros((0, 3)),
    )
    with pytest.raises(MismatchedPointCountError):
        render(empty, _view(), OPTS)


def test_sh_degree_option():
    scene = _scene(40, seed=9)
    rng = np.random.default_rng(10)
    scene = GaussianScene(
        jnp.asarray(rng.standard_normal((40, 48)).astype(np.float32) * 0.3),
        scene.opacities, scene.positions, scene.rotations, scene.scalings,
    )
    view = _view()
    imgs = []
    for deg in range(4):
        opts = RenderOptions(
            backend="xla", tile_entry_capacity=2048, block_size=64,
            colors_sh_degree_max=deg,
        )
        imgs.append(np.asarray(render(scene, view, opts).colors_rgb_2d))
    # Higher degrees change the image (view-dependent color).
    assert not np.allclose(imgs[0], imgs[3])

