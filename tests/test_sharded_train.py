"""Sharded train step vs single-device reference: one step over a
(data=2, tiles=2) mesh must produce the same updated parameters as the
equivalent single-device step on the full view batch (L1 loss)."""

import numpy as np
import jax
import jax.numpy as jnp

from gausplat_tpu import GaussianScene, Points, RenderOptions, View, render
from gausplat_tpu.parallel import make_mesh
from gausplat_tpu.parallel.render import stack_cameras
from gausplat_tpu.parallel.train_step import make_sharded_train_step
from gausplat_tpu.train.optimizer import OptimizerConfig, make_optimizer

W = H = 64
OPTS = RenderOptions(backend="xla", tile_entry_capacity=4096, block_size=64)


def _scene(p=30, seed=3):
    rng = np.random.default_rng(seed)
    pts = Points(
        rng.random((p, 3)).astype(np.float32), rng.standard_normal((p, 3)) * 0.6
    )
    scene = GaussianScene.from_points(pts)
    scene = scene.set_scalings(jnp.asarray(0.05 + 0.1 * rng.random((p, 3)), jnp.float32))
    scene = scene.set_opacities(jnp.asarray(0.3 + 0.5 * rng.random((p, 1)), jnp.float32))
    return scene


def _views(n):
    out = []
    for i in range(n):
        a = 0.2 * i
        c, s = np.cos(a), np.sin(a)
        rot = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        pos = np.array([4 * s, 0.0, -4 * c])
        out.append(
            View(
                field_of_view_x=1.0, field_of_view_y=1.0,
                image_height=H, image_width=W, view_id=i,
                view_position=pos,
                view_transform=View.transform(rot.T, -rot @ pos),
            )
        )
    return out


def test_sharded_step_matches_single_device():
    scene = _scene()
    views = _views(2)
    targets = [np.asarray(render(_scene(seed=9), v, OPTS).colors_rgb_2d) for v in views]

    mesh = make_mesh((2, 2), ("data", "tiles"))
    step, optimizer, h_pad = make_sharded_train_step(
        mesh, W, H, scene.point_count, OPTS
    )
    cams = stack_cameras(views)
    tgt = jnp.asarray(
        np.stack([np.pad(t, ((0, h_pad - H), (0, 0), (0, 0))) for t in targets])
    )
    opt_state = optimizer.init(scene)
    new_scene, _, loss_sh = step(scene, opt_state, cams, tgt)

    # Single-device reference: same L1-sum loss over both views.
    from gausplat_tpu.render.pipeline import (
        _build_render_fn, _capacity, _resolve_backend,
    )
    from gausplat_tpu.ops.projection import Camera

    fn = _build_render_fn(
        W, H, scene.point_count, OPTS.colors_sh_degree_max,
        _capacity(scene.point_count, OPTS),
        OPTS.block_size, _resolve_backend(OPTS.backend), False,
    )

    def loss_fn(s):
        acc = 0.0
        for v, t in zip(views, targets):
            out = fn(
                s.colors_sh, s.opacities, s.positions, s.rotations, s.scalings,
                jnp.zeros((s.point_count,)), Camera.from_view(v),
            )
            acc = acc + jnp.sum(jnp.abs(out.colors_rgb_2d - jnp.asarray(t)))
        return acc

    loss_ref, grads = jax.value_and_grad(loss_fn)(scene)
    updates, _ = optimizer.update(grads, optimizer.init(scene), scene)
    ref_scene = jax.tree_util.tree_map(lambda p, u: p + u, scene, updates)

    np.testing.assert_allclose(
        float(loss_sh), float(loss_ref) / (H * W * 3 * 2), rtol=1e-4
    )
    for name in ("colors_sh", "opacities", "positions", "rotations", "scalings"):
        a = np.asarray(getattr(new_scene, name))
        b = np.asarray(getattr(ref_scene, name))
        np.testing.assert_allclose(a, b, atol=2e-5, err_msg=name)
