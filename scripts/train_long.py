"""Long training run (config-4 analogue, scaled): >=10k iterations fitting a
synthetic multi-view scene on the live device, with densification; emits the
PSNR curve as JSON lines.

The setup is reproducible (fixed seeds): a 500-Gaussian ground-truth scene
rendered from 10 orbit views at 256x256 provides the targets; training
starts from a fresh 150-point cloud. Round-robin single-view steps
(Trainer.fit), exactly the downstream 3DGS recipe the reference feeds
(SURVEY.md section 5 training loop; the reference crate itself contains no
trainer — gausplat-trainer's loop is the parity target).

Usage: python scripts/train_long.py [iters] [out.json]
"""
import json
import sys

sys.path.insert(0, "/root/repo")
import numpy as np
import jax.numpy as jnp

from gausplat_tpu import GaussianScene, Points, RenderOptions, View, render
from gausplat_tpu.train import TrainConfig, Trainer

iters = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/train_long.json"
size = 256
opts = RenderOptions(tile_entry_capacity=1 << 17, block_size=256)
rng = np.random.default_rng(0)

p = 500
truth = GaussianScene.from_points(
    Points(rng.random((p, 3)).astype(np.float32), rng.standard_normal((p, 3)) * 0.7)
)
truth = truth.set_scalings(jnp.asarray(0.03 + 0.08 * rng.random((p, 3)), jnp.float32))
truth = truth.set_opacities(jnp.asarray(0.3 + 0.6 * rng.random((p, 1)), jnp.float32))

views = []
for i in range(10):
    a = 2 * np.pi * i / 10
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

q = 150
start = GaussianScene.from_points(
    Points(rng.random((q, 3)).astype(np.float32), rng.standard_normal((q, 3)) * 0.7)
)

cfg = TrainConfig(
    render=opts,
    densify_from=500,
    densify_until=min(iters - 500, 6000),
    densify_interval=300,
    sh_warmup_interval=500,
    opacity_reset_interval=10**9,
)
tr = Trainer(start, size, size, cfg)

curve = []
chunk = 200
step = 0
while step < iters:
    k = min(chunk, iters - step)
    # Scanned fit: one device dispatch per sub-chunk (tunnel-RPC-proof).
    hist = tr.fit_scan(views, targets, k)
    step += k
    h = hist[-1]
    rec = {
        "step": tr.step_count,
        "loss": float(h["loss"]),
        "psnr": float(h["psnr"]),
        "points": tr.scene.point_count,
    }
    curve.append(rec)
    print(json.dumps(rec), flush=True)

with open(out_path, "w") as f:
    json.dump(curve, f)
print("done; final points:", tr.scene.point_count, flush=True)
