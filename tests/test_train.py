"""Training tests: loss sanity, a short overfit run (loss decreases, PSNR
rises), densify/prune mechanics, opacity reset."""

import numpy as np
import jax.numpy as jnp

from gausplat_tpu import GaussianScene, Points, RenderOptions, View, render
from gausplat_tpu.train import (
    DensifyConfig,
    DensifyState,
    TrainConfig,
    Trainer,
    densify_and_prune,
    photometric_loss,
    psnr,
    reset_opacity,
    ssim,
)

OPTS = RenderOptions(backend="xla", tile_entry_capacity=2048, block_size=64)
W = H = 48


def _view():
    return View(
        field_of_view_x=1.0, field_of_view_y=1.0,
        image_height=H, image_width=W,
        view_position=[0.0, 0.0, -4.0],
        view_transform=View.transform(np.eye(3), [0.0, 0.0, 4.0]),
    )


def _scene(p, seed):
    rng = np.random.default_rng(seed)
    pts = Points(
        rng.random((p, 3)).astype(np.float32), rng.standard_normal((p, 3)) * 0.6
    )
    scene = GaussianScene.from_points(pts)
    scene = scene.set_scalings(jnp.full((p, 3), 0.15))
    scene = scene.set_opacities(jnp.full((p, 1), 0.7))
    return scene


def test_losses():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.random((32, 32, 3)).astype(np.float32))
    assert abs(float(ssim(a, a)) - 1.0) < 1e-5
    assert float(photometric_loss(a, a)) < 1e-6
    assert float(psnr(a, a)) > 100
    b = jnp.clip(a + 0.1, 0, 1)
    assert float(ssim(a, b)) < 1.0
    assert float(photometric_loss(a, b)) > 0


def test_overfit_short():
    target_scene = _scene(25, seed=5)
    view = _view()
    target = render(target_scene, view, OPTS).colors_rgb_2d

    start = _scene(25, seed=9)
    cfg = TrainConfig(
        render=OPTS,
        densify_from=10**9,  # no densification in this short run
        sh_warmup_interval=1,
        ssim_weight=0.2,
    )
    trainer = Trainer(start, W, H, cfg)
    first = trainer.train_step(view, target)
    for _ in range(60):
        last = trainer.train_step(view, target)
    assert last["loss"] < first["loss"] * 0.7
    assert last["psnr"] > first["psnr"] + 1.0


def test_densify_and_prune():
    scene = _scene(30, seed=1)
    state = DensifyState.zeros(30)
    # Fake accumulated stats: strong gradients on the first 10 points.
    grad_norm = np.zeros(30, np.float32)
    grad_norm[:10] = 1.0
    radii = np.ones(30, np.int32)
    state.accumulate(grad_norm, radii)

    # Small scales -> clone (first 5); large scales -> split (next 5).
    scalings = np.full((30, 3), np.log(0.001), np.float32)
    scalings[5:10] = np.log(0.5)
    scene = GaussianScene(
        scene.colors_sh, scene.opacities, scene.positions, scene.rotations,
        jnp.asarray(scalings),
    )
    cfg = DensifyConfig(grad_threshold=0.5, percent_dense=0.01, scene_extent=1.0)
    new_scene, new_state, stats = densify_and_prune(scene, state, cfg)
    assert stats["cloned"] == 5
    assert stats["split"] == 5
    # 30 - 5 split originals + 5 clones + 10 split samples = 40.
    assert stats["point_count"] == 40
    assert new_state.grad_norm_sum.shape == (40,)


def test_prune_transparent():
    scene = _scene(20, seed=3)
    opacities = np.full((20, 1), 0.5, np.float32)
    opacities[:8] = 1e-4  # nearly transparent -> pruned
    scene = scene.set_opacities(jnp.asarray(opacities))
    state = DensifyState.zeros(20)
    state.accumulate(np.zeros(20, np.float32), np.ones(20, np.int32))
    new_scene, _, stats = densify_and_prune(scene, state, DensifyConfig())
    assert stats["pruned"] == 8
    assert new_scene.point_count == 12


def test_reset_opacity():
    scene = _scene(10, seed=4)
    reset = reset_opacity(scene, DensifyConfig(opacity_reset_value=0.01))
    outer = np.asarray(reset.get_opacities())
    assert outer.max() <= 0.0101


def test_multiview_batched_step_matches_mean_loss():
    """The vmap'd multi-view step: loss equals the mean of per-view
    losses, and the update uses the mean-loss gradient."""
    import jax
    from gausplat_tpu.train.trainer import _make_train_step
    from gausplat_tpu.train.densify import zero_densify_acc
    from gausplat_tpu.train.losses import photometric_loss
    from gausplat_tpu.parallel.render import stack_cameras
    from gausplat_tpu.ops.projection import Camera

    scene = _scene(20, seed=2)
    views = [_view(), _view()]
    tgt_scene = _scene(20, seed=7)
    targets = np.stack(
        [np.asarray(render(tgt_scene, v, OPTS).colors_rgb_2d) for v in views]
    )
    step, optimizer, step_batch, _ = _make_train_step(
        W, H, scene.point_count, 3,
        OPTS.tile_entry_capacity, OPTS.block_size, "xla", False,
        0.2, __import__("gausplat_tpu").train.OptimizerConfig(),
    )
    opt_state = optimizer.init(scene)
    acc = zero_densify_acc(scene.point_count)
    cams = stack_cameras(views)
    new_scene, _, acc2, metrics = step_batch(
        scene, opt_state, acc, cams, jnp.asarray(targets)
    )
    # Loss equals the mean of the per-view photometric losses.
    per_view = [
        float(photometric_loss(
            render(scene, v, OPTS).colors_rgb_2d, jnp.asarray(t), 0.2
        ))
        for v, t in zip(views, targets)
    ]
    np.testing.assert_allclose(
        float(metrics["loss"]), np.mean(per_view), rtol=1e-5
    )
    assert np.isfinite(np.asarray(new_scene.positions)).all()
    # Two identical views -> visible_count counts both.
    assert int(np.asarray(acc2["visible_count"]).max()) == 2


def test_fit_scan_matches_fit():
    """Chunked lax.scan fit must follow the identical schedule and produce
    the same training trajectory as the per-step fit (same view order,
    densify/reset/warmup boundaries respected)."""
    target_scene = _scene(25, seed=5)
    views = [_view(), _view()]
    targets = [render(target_scene, v, OPTS).colors_rgb_2d for v in views]
    cfg = TrainConfig(
        render=OPTS,
        densify_from=4,
        densify_until=11,
        densify_interval=5,
        sh_warmup_interval=6,
        opacity_reset_interval=10**9,
        overflow_check_interval=7,
    )
    tr_a = Trainer(_scene(25, seed=9), W, H, cfg)
    tr_b = Trainer(_scene(25, seed=9), W, H, cfg)
    hist_a = tr_a.fit(views, targets, 13)
    hist_b = tr_b.fit_scan(views, targets, 13, max_chunk=4)
    assert tr_a.step_count == tr_b.step_count == 13
    assert tr_a.scene.point_count == tr_b.scene.point_count
    # Scanned vs per-step programs fuse differently; fp reassociation
    # compounds over the 13 Adam steps — structural parity, not bitwise.
    np.testing.assert_allclose(
        np.asarray(tr_a.scene.positions),
        np.asarray(tr_b.scene.positions),
        atol=5e-4,
    )
    la = [h["loss"] for h in hist_a]
    lb = [h["loss"] for h in hist_b]
    np.testing.assert_allclose(la, lb, rtol=1e-4, atol=1e-6)
