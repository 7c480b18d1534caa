"""Sharded-vs-single-device training parity at scale: run the same batched
fit with the fully-sharded (data x tiles) step on the virtual 8-device CPU
mesh and with the single-device vmap'd batch step; final PSNR must agree
within 0.5 dB (config-4/5 composition evidence).

Usage: python scripts/train_sharded_compare.py [iters]
(Self-provisions the 8-device virtual CPU mesh; run WITHOUT JAX_PLATFORMS.)
"""
import json
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
)
import numpy as np
import jax.numpy as jnp

from gausplat_tpu import GaussianScene, Points, RenderOptions, View, render
from gausplat_tpu.parallel import make_mesh
from gausplat_tpu.parallel.train_step import ShardedTrainer
from gausplat_tpu.train import TrainConfig, Trainer
from gausplat_tpu.train.losses import psnr

iters = int(sys.argv[1]) if len(sys.argv) > 1 else 600
size = 128
opts = RenderOptions(backend="xla", tile_entry_capacity=1 << 16, block_size=128)
rng = np.random.default_rng(0)

p = 300
truth = GaussianScene.from_points(
    Points(rng.random((p, 3)).astype(np.float32), rng.standard_normal((p, 3)) * 0.7)
)
truth = truth.set_scalings(jnp.asarray(0.04 + 0.1 * rng.random((p, 3)), jnp.float32))
truth = truth.set_opacities(jnp.asarray(0.3 + 0.6 * rng.random((p, 1)), jnp.float32))

views = []
for i in range(4):
    a = 2 * np.pi * i / 4
    c, s = np.cos(a), np.sin(a)
    rot = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    pos = np.array([4 * s, 0.0, -4 * c])
    views.append(
        View(
            field_of_view_x=1.0, field_of_view_y=1.0,
            image_height=size, image_width=size, view_id=i,
            view_position=pos,
            view_transform=View.transform(rot.T, -rot @ pos),
        )
    )
targets = [render(truth, v, opts).colors_rgb_2d for v in views]
print("targets rendered", flush=True)

q = 120


def fresh():
    r = np.random.default_rng(7)
    return GaussianScene.from_points(
        Points(r.random((q, 3)).astype(np.float32), r.standard_normal((q, 3)) * 0.7)
    )


def eval_psnr(scene):
    vals = [
        float(psnr(render(scene, v, opts).colors_rgb_2d, t))
        for v, t in zip(views, targets)
    ]
    return sum(vals) / len(vals)


# No densification here: the two trainers advance step_count differently
# per batched call (4 vs 1), so event schedules would diverge; densify
# parity is covered by tests/test_sharded_train. This compares the
# sharded optimization trajectory itself.
cfg = TrainConfig(
    render=opts,
    densify_from=10**9,
    # Warmup 1: both trainers reach SH degree 3 after three steps (the
    # sharded step always renders at the options' max degree).
    sh_warmup_interval=1,
    opacity_reset_interval=10**9,
)

# Single device: batched (vmap) steps, same batch-loss dynamics as sharded.
tr1 = Trainer(fresh(), size, size, cfg)
for i in range(iters):
    tr1.train_step_batch(views, targets)
    if (i + 1) % 50 == 0:
        print(f"single {i + 1}/{iters}", flush=True)
p1 = eval_psnr(tr1.scene)
print(json.dumps({"single_batched_psnr": p1, "points": tr1.scene.point_count}), flush=True)

# Fully sharded (data=2 x tiles=4).
mesh = make_mesh((2, 4), ("data", "tiles"))
tr2 = ShardedTrainer(fresh(), mesh, size, size, cfg)
padded = tr2.pad_targets(targets)
from gausplat_tpu.parallel.render import stack_cameras

cams = stack_cameras(views)
for i in range(iters):
    tr2.train_step(cams, padded)
    if (i + 1) % 50 == 0:
        print(f"sharded {i + 1}/{iters}", flush=True)
p2 = eval_psnr(tr2.scene)
print(json.dumps({"sharded_psnr": p2, "points": tr2.scene.point_count}), flush=True)
print(json.dumps({"delta_db": abs(p1 - p2)}), flush=True)
