"""Sharded train step vs single-device reference: one step over a
(data=2, tiles=2) mesh must produce the same loss and updated parameters
as the equivalent single-device step on the full view batch — for L1-only,
for the full L1 + D-SSIM objective (halo exchange across slab boundaries),
and for an image height that does not divide evenly across the slabs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gausplat_tpu import GaussianScene, Points, RenderOptions, View, render
from gausplat_tpu.parallel import make_mesh
from gausplat_tpu.parallel.render import stack_cameras
from gausplat_tpu.parallel.train_step import make_sharded_train_step
from gausplat_tpu.train.losses import photometric_loss
from gausplat_tpu.train.optimizer import make_optimizer

W = 64
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


def _views(n, h):
    out = []
    for i in range(n):
        a = 0.2 * i
        c, s = np.cos(a), np.sin(a)
        rot = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        pos = np.array([4 * s, 0.0, -4 * c])
        out.append(
            View(
                field_of_view_x=1.0, field_of_view_y=1.0,
                image_height=h, image_width=W, view_id=i,
                view_position=pos,
                view_transform=View.transform(rot.T, -rot @ pos),
            )
        )
    return out


def _run_pair(h, ssim_weight):
    """Returns (sharded scene, metrics, reference scene, reference loss)."""
    scene = _scene()
    views = _views(2, h)
    targets = [
        np.asarray(render(_scene(seed=9), v, OPTS).colors_rgb_2d) for v in views
    ]

    mesh = make_mesh((2, 2), ("data", "tiles"))
    step, optimizer, h_pad, _ = make_sharded_train_step(
        mesh, W, h, scene.point_count, OPTS, ssim_weight=ssim_weight
    )
    cams = stack_cameras(views)
    # Pad rows are filled with a poison value: the step must mask them out.
    tgt = jnp.asarray(
        np.stack([
            np.pad(t, ((0, h_pad - h), (0, 0), (0, 0)), constant_values=7.7)
            for t in targets
        ])
    )
    from gausplat_tpu.train.densify import zero_densify_acc

    opt_state = optimizer.init(scene)
    acc = zero_densify_acc(scene.point_count)
    new_scene, _, acc, metrics = step(scene, opt_state, acc, cams, tgt)

    # Single-device reference: mean photometric loss over both views,
    # with the densify signal via the dummy-ref side channel.
    def loss_fn(s, ref):
        acc = 0.0
        for v, t in zip(views, targets):
            out = render(s, v, OPTS, positions_2d_grad_norm_ref=ref)
            acc = acc + photometric_loss(
                out.colors_rgb_2d, jnp.asarray(t), ssim_weight
            )
        return acc / len(views)

    ref0 = jnp.zeros((scene.point_count,), jnp.float32)
    loss_ref, (grads, grad_norm_ref) = jax.value_and_grad(
        loss_fn, argnums=(0, 1)
    )(scene, ref0)
    updates, _ = optimizer.update(grads, optimizer.init(scene), scene)
    ref_scene = jax.tree_util.tree_map(lambda p, u: p + u, scene, updates)
    return new_scene, metrics, ref_scene, loss_ref, acc, grad_norm_ref


@pytest.mark.parametrize(
    "h,ssim_weight",
    [(64, 0.0), (64, 0.2), (48, 0.2)],
    ids=["l1", "l1+dssim", "non-divisible-height"],
)
def test_sharded_step_matches_single_device(h, ssim_weight):
    new_scene, metrics, ref_scene, loss_ref, acc, grad_norm_ref = _run_pair(
        h, ssim_weight
    )
    np.testing.assert_allclose(
        float(metrics["loss"]), float(loss_ref), rtol=2e-4
    )
    assert int(metrics["tile_point_total"]) > 0
    for name in ("colors_sh", "opacities", "positions", "rotations", "scalings"):
        a = np.asarray(getattr(new_scene, name))
        b = np.asarray(getattr(ref_scene, name))
        np.testing.assert_allclose(a, b, atol=2e-5, err_msg=name)
    # Densification signal: the tile shards' pos-2d grads are summed before
    # the norm, so slab-spanning Gaussians get the exact single-chip value.
    got = np.asarray(acc["grad_norm_sum"])
    want = np.asarray(grad_norm_ref)
    scale = max(want.max(), 1e-12)
    np.testing.assert_allclose(got / scale, want / scale, atol=5e-5)


def test_sharded_fit_with_densify_event():
    """ShardedTrainer: a densify event reshapes the (replicated) scene
    mid-fit and training continues on the mesh (VERDICT round-1 item 6)."""
    from gausplat_tpu.parallel.train_step import ShardedTrainer
    from gausplat_tpu.train.trainer import TrainConfig
    from gausplat_tpu.train.densify import DensifyConfig

    h = 64
    scene = _scene(p=24, seed=4)
    views = _views(2, h)
    targets = np.stack([
        np.asarray(render(_scene(seed=9), v, OPTS).colors_rgb_2d)
        for v in views
    ])
    mesh = make_mesh((2, 2), ("data", "tiles"))
    cfg = TrainConfig(
        render=OPTS,
        ssim_weight=0.0,  # keep the CPU-mesh test fast
        densify_from=1,
        densify_until=10,
        densify_interval=2,
        # Thresholds tuned so the toy scene actually clones/splits.
        densify=DensifyConfig(grad_threshold=1e-7, percent_dense=0.05),
        opacity_reset_interval=10**9,
    )
    trainer = ShardedTrainer(scene, mesh, W, h, cfg)
    cams = stack_cameras(views)
    p0 = scene.point_count
    history = trainer.fit(cams, targets, iterations=4)
    assert len(history) == 4
    assert all(np.isfinite(m["loss"]) for m in history)
    stats = [m for m in history if "point_count" in m]
    assert stats, "no densify event ran"
    assert trainer.scene.point_count != p0
    # The step after the reshape ran (losses exist past the event).
    assert np.isfinite(history[-1]["loss"])


def test_sharded_fit_scan_matches_fit():
    """ShardedTrainer.fit_scan (lax.scan chunks around the shard_map'd
    step, one dispatch per chunk) must follow the identical schedule and
    trajectory as the per-step fit — the multi-chip counterpart of
    Trainer's test_fit_scan_matches_fit."""
    from gausplat_tpu.parallel.train_step import ShardedTrainer
    from gausplat_tpu.train.trainer import TrainConfig
    from gausplat_tpu.train.densify import DensifyConfig

    h = 64
    views = _views(2, h)
    targets = np.stack([
        np.asarray(render(_scene(seed=9), v, OPTS).colors_rgb_2d)
        for v in views
    ])
    mesh = make_mesh((2, 2), ("data", "tiles"))
    cfg = TrainConfig(
        render=OPTS,
        ssim_weight=0.0,  # keep the CPU-mesh test fast
        densify_from=3,
        densify_until=9,
        densify_interval=4,
        densify=DensifyConfig(grad_threshold=1e-7, percent_dense=0.05),
        sh_warmup_interval=5,
        opacity_reset_interval=10**9,
        overflow_check_interval=6,
    )
    tr_a = ShardedTrainer(_scene(p=24, seed=4), mesh, W, h, cfg)
    tr_b = ShardedTrainer(_scene(p=24, seed=4), mesh, W, h, cfg)
    cams = stack_cameras(views)
    hist_a = tr_a.fit(cams, targets, iterations=11)
    hist_b = tr_b.fit_scan(cams, targets, iterations=11, max_chunk=3)
    assert tr_a.step_count == tr_b.step_count == 11
    assert tr_a.scene.point_count == tr_b.scene.point_count
    np.testing.assert_allclose(
        np.asarray(tr_a.scene.positions),
        np.asarray(tr_b.scene.positions),
        atol=5e-4,
    )
    la = [m["loss"] for m in hist_a]
    lb = [m["loss"] for m in hist_b]
    np.testing.assert_allclose(la, lb, rtol=1e-4, atol=1e-6)
