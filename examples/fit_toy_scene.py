"""End-to-end demo: fit a toy 3DGS scene to target renders, then export.

Creates a ground-truth scene, renders target views, initialises a fresh
scene from a noisy point cloud, trains it (with densification enabled),
and round-trips the result through the 3DGS PLY codec.

    python examples/fit_toy_scene.py [iterations]
"""

import sys

sys.path.insert(0, ".")

import numpy as np
import jax.numpy as jnp

from gausplat_tpu import (
    GaussianScene,
    Points,
    RenderOptions,
    View,
    decode_polygon,
    encode_polygon,
    render,
)
import dataclasses

from gausplat_tpu.train import TrainConfig, Trainer, psnr
from gausplat_tpu.train.densify import camera_extent


def make_views(n, size=128):
    views = []
    for i in range(n):
        angle = 2 * np.pi * i / n
        c, s = np.cos(angle), np.sin(angle)
        # Look-at-origin world->view rotation (rows: right, up, forward).
        rotation = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        position = np.array([4 * s, 0.0, -4 * c])
        views.append(
            View(
                field_of_view_x=1.0,
                field_of_view_y=1.0,
                image_height=size,
                image_width=size,
                view_id=i,
                view_position=position,
                view_transform=View.transform(rotation.T, -rotation @ position),
            )
        )
    return views


def main(iterations=400):
    rng = np.random.default_rng(0)
    size = 128
    opts = RenderOptions(tile_entry_capacity=1 << 15, block_size=128)

    # Ground truth: 120 colorful Gaussians in a ball.
    p = 120
    truth = GaussianScene.from_points(
        Points(rng.random((p, 3)).astype(np.float32), rng.standard_normal((p, 3)) * 0.6)
    )
    truth = truth.set_scalings(jnp.asarray(0.05 + 0.1 * rng.random((p, 3)), jnp.float32))
    truth = truth.set_opacities(jnp.asarray(0.3 + 0.6 * rng.random((p, 1)), jnp.float32))

    views = make_views(6, size)
    targets = [render(truth, v, opts).colors_rgb_2d for v in views]

    # Start from a noisy sparse cloud.
    q = 60
    start = GaussianScene.from_points(
        Points(rng.random((q, 3)).astype(np.float32), rng.standard_normal((q, 3)) * 0.6)
    )

    config = TrainConfig(
        render=opts,
        densify_from=100,
        densify_until=max(iterations - 100, 101),
        densify_interval=100,
        sh_warmup_interval=100,
        opacity_reset_interval=10**9,
    )
    # The densify size thresholds and the position lr both key to the
    # camera extent (standard 3DGS spatial_lr_scale).
    extent = camera_extent(views)
    config = dataclasses.replace(
        config,
        densify=dataclasses.replace(config.densify, scene_extent=extent),
        optimizer=dataclasses.replace(config.optimizer, scene_extent=extent),
    )
    trainer = Trainer(start, size, size, config)

    history = trainer.fit(views, targets, iterations)
    first, last = history[0], history[-1]
    print(
        f"step 1:   loss={first['loss']:.4f} psnr={first['psnr']:.2f} dB "
        f"points={start.point_count}"
    )
    print(
        f"step {len(history)}: loss={last['loss']:.4f} psnr={last['psnr']:.2f} dB "
        f"points={trainer.scene.point_count}"
    )

    # Checkpoint round trip through the 3DGS PLY format.
    blob = encode_polygon(trainer.scene)
    restored = decode_polygon(blob)
    check = render(restored, views[0], opts).colors_rgb_2d
    print(f"PLY round trip: {len(blob)} bytes, "
          f"psnr vs target {float(psnr(check, targets[0])):.2f} dB")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 400)
